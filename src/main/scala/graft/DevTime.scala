package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: time one registered query N times. args: name sfDir [n] [--explain] */
object DevTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (args.contains("--explain")) fn(spark, sfDir).explain("formatted")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      graft.Bench.exec(fn(spark, sfDir))
      println(f"[devtime] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
