package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Dev utility: stage-attributed timing of the d12 incremental probe
  * (batch signature pass vs candidate generation vs the full library
  * probe) against a prebuilt at-rest index. The round-11 measurement
  * this drove: `incrementalCandidates` re-executed its index semi-join
  * per pair branch (≈6×) and the verify re-shingled the corpus per
  * consumer (3×) — fixed by the members/sized checkpoints and the shAll
  * persist in Dedup. args: [sfDir] [nRuns] */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[devprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val idxPath = java.nio.file.Files.createTempDirectory("devprobe_idx").toString
    t("index build+write") {
      Dedup.nearDupIndex(corpus, "doc_id", "text", w = 5, k = 64, bands = 32)
        .write.mode("overwrite").parquet(idxPath)
    }
    (1 to n).foreach { i =>
      val index = spark.read.parquet(idxPath)
      val bandedB = t(s"run$i batch shingle+sig+band persist+count") {
        val b0 = Dedup.nearDupIndex(batch, "doc_id", "text", w = 5, k = 64, bands = 32)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b0.count(); b0
      }
      t(s"run$i incrementalCandidates (count)") {
        println(s"[devprobe]   n_cands = ${Dedup.incrementalCandidates(index, bandedB).count()}")
      }
      bandedB.unpersist(blocking = false)
      t(s"run$i full incrementalNearDup") {
        Bench.exec(Dedup.incrementalNearDup(corpus, index, batch,
          "doc_id", "text", w = 5, k = 64, bands = 32, minJaccard = 0.5))
      }
    }
    spark.stop()
  }
}
