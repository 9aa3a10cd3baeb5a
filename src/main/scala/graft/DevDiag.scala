package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch diagnostic for the a2/a20 bench anomaly (round 3). */
object DevDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"[diag] input partitions: ${li.rdd.getNumPartitions}")
    println(s"[diag] schema: ${li.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[diag] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val sums = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c => sum(col(c).cast(DecimalType(27, 6))).cast(DoubleType).as(c))
    val agg = li.agg(sums.head, sums.tail: _*)
    println("[diag] ---- agg.count() plan ----")
    agg.groupBy().count().explain("formatted")
    time("agg4.head") { agg.head() }
    // NB: .count() on a groupBy-less agg lets Spark PRUNE the decimal sum
    // expressions (scan + empty agg only) — kept as the control that
    // isolates scan cost from sum cost, not comparable to .head()
    time("agg4.count[sums-pruned]") { agg.count() }
    val sums2 = Seq("l_quantity", "l_extendedprice")
      .map(c => sum(col(c).cast(DecimalType(27, 6))).cast(DoubleType).as(c))
    time("agg2.head(s3-shape)") { li.agg(count(lit(1)).as("n"), sums2: _*).head() }
    time("agg4.double.head") {
      li.agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
        sum(col("l_discount")).as("c"), sum(col("l_tax")).as("d")).head()
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
    val liSplit = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"[diag] split partitions: ${liSplit.rdd.getNumPartitions}")
    val sumsS = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c => sum(col(c).cast(DecimalType(27, 6))).cast(DoubleType).as(c))
    time("agg4.head.split4MB") { liSplit.agg(sumsS.head, sumsS.tail: _*).head() }
    spark.stop()
  }
}
