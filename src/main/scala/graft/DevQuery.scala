package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev utility: run a SUBSET of SparkEntry.queries against a sf dir and
  * dump results + the matching oracle_sql.json in the same layout
  * Verify uses, so `tools/compare_oracle.py` can check just the queries
  * under iteration instead of the full 2-minute sweep.
  *
  * Usage: `sbt "runMain graft.DevQuery <sfDir> <outDir> <name> [name…]"`
  */
object DevQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DevQuery <sfDir> <outDir> <name> [name…]")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[devquery] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(names.contains).toMap
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
