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

  test("ingest → delete → compact equals a fresh index over the surviving corpus") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val work = java.nio.file.Files.createTempDirectory("graft_compact")
    val state = work.resolve("state").toString
    // two drops into state; hold the third back as the post-compact probe
    (0 until 2).foreach { i =>
      val bp = work.resolve(s"batch_$i").toString
      docs.where(pmod(col("doc_id"), lit(3)) === i).write.parquet(bp)
      RunIngest.ingestOnce(spark, bp, state)
    }
    // delete every 5th ingested doc — including members of emitted pairs
    val deleted = docs.where(pmod(col("doc_id"), lit(3)) < 2 &&
      pmod(col("doc_id"), lit(5)) === 0).select("doc_id")
    val deletedIds = deleted.collect().map(_.getLong(0)).toSet
    assert(deletedIds.nonEmpty)
    val report = RunIngest.compactOnce(spark, state, deleted, targetRowsPerFile = 1000000L)
    assert(report.contains("\"index_rows\""), report)
    // compacted state: no deleted id anywhere, files coalesced to 1 gen
    val idx = spark.read.parquet(s"$state/index")
    assert(idx.where(col("id").isin(deletedIds.toSeq: _*)).count() === 0L)
    val survivors = docs.where(pmod(col("doc_id"), lit(3)) < 2)
      .join(deleted, Seq("doc_id"), "left_anti")
    assert(spark.read.parquet(s"$state/docs").count() === survivors.count())
    // the compacted index IS the fresh index over the surviving corpus
    val fresh = graft.llm.Dedup.nearDupIndex(survivors, "doc_id", "text",
      w = 5, k = 64, bands = 32)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("id"), r.getAs[Int]("band"), r.getAs[Long]("band_hash"))
    assert(idx.collect().map(key).toSet === fresh.collect().map(key).toSet)
    // probing the compacted state with the held-back third drop equals
    // probing a freshly-built state over the survivors
    val bp = work.resolve("batch_probe").toString
    docs.where(pmod(col("doc_id"), lit(3)) === 2).write.parquet(bp)
    RunIngest.ingestOnce(spark, bp, state)
    val freshState = work.resolve("fresh_state").toString
    val sp = work.resolve("survivors_batch").toString
    survivors.write.parquet(sp)
    RunIngest.ingestOnce(spark, sp, freshState)
    RunIngest.ingestOnce(spark, bp, freshState)
    def pairsTouching(dir: String, probeIds: Set[Long]) =
      spark.read.parquet(s"$dir/pairs")
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
        .filter(p => probeIds.contains(p._1) || probeIds.contains(p._2)).toSet
    val probeIds = docs.where(pmod(col("doc_id"), lit(3)) === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pairsTouching(state, probeIds) === pairsTouching(freshState, probeIds))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(work).iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
