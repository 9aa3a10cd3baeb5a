package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** The CROSS-INVOCATION contract of the RunIngest CLI: state persists on
  * disk between runs, and after ingesting N batches the accumulated
  * pairs equal the full-corpus LSH pair set — the property that makes
  * incremental daily ingest a safe substitute for periodic full re-runs. */
class IngestSpec extends SparkSpec {

  test("RunIngest accumulates state across invocations; pairs equal the full run") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val work = java.nio.file.Files.createTempDirectory("graft_run_ingest")
    val state = work.resolve("state").toString
    // three daily drops
    (0 until 3).foreach { i =>
      val bp = work.resolve(s"batch_$i").toString
      docs.where(pmod(col("doc_id"), lit(3)) === i).write.parquet(bp)
      val summary = RunIngest.ingestOnce(spark, bp, state)
      assert(summary.contains("\"batch_docs\""), summary)
    }
    val accumulated = spark.read.parquet(s"$state/pairs")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    val full = Dedup.minHashNearDup(docs, "doc_id", "text",
        w = 5, k = 64, bands = 32, minJaccard = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(accumulated.nonEmpty && accumulated.keySet === full.keySet,
      s"missing=${(full.keySet diff accumulated.keySet).take(3)} " +
        s"extra=${(accumulated.keySet diff full.keySet).take(3)}")
    accumulated.foreach { case (p, j) => assert(math.abs(j - full(p)) < 1e-12) }
    // the persisted index covers every ingested doc × band
    assert(spark.read.parquet(s"$state/index").count() === docs.count() * 32)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(work).iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
