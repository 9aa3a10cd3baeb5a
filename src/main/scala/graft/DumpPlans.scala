package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev utility for the optimization rounds: dump `.explain("formatted")`
  * for named declared queries into plans/<tag>/<query>_<suffix>.txt —
  * the before/after plan evidence the optimization report cites.
  *
  * Usage: sbt "runMain graft.DumpPlans <tag> <suffix> q1 q2 ..."
  * e.g.   sbt "runMain graft.DumpPlans r18 before a26_trimmed_stats"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 8).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.streaming.EventStream.ReplayPartitionsKey, "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        graft.queries.BenchOps.ops.toMap.apply(name))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plans] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
