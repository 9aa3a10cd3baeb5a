package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.llm.Dedup

/** The rolling-ingestion NEAR-dup loop: a document stream probes a
  * persisted banded-signature index ([[Dedup.nearDupIndex]]) batch by
  * batch via `foreachBatch`, emits the verified near-dup pairs each
  * batch touches, and rolls the index forward with the batch's own
  * banded rows — the maintenance cycle a daily-ingest training-data
  * pipeline runs (the streaming twin of query d12, composed with the
  * st9 ingest-merge scaffolding).
  *
  * Why this is oracle-checkable: a pair is emitted exactly once, by the
  * batch its LATER member arrives in (earlier member is in the index by
  * then; same-batch pairs come from the batch's internal self-join), so
  * the union of per-batch emissions equals the FULL-corpus LSH pair set
  * regardless of batch count or arrival order — stream ≡ batch ≡ the
  * exhaustive exact-Jaccard oracle (d3's total-recall argument).
  *
  * State lives in alternating parquet generations like
  * [[EventStream.runMergeOnce]]; at scale the index is a bucketed table
  * on (band, band_hash) appended per batch (never rewritten), and the
  * emitted pairs feed the cluster-resolution job (d6/mm8 shape). */
object IngestStream {

  /** Schema of a slim [[Dedup.nearDupIndex]] frame — the empty gen-0
    * index (three longs per (doc, band) row; signatures never persist). */
  private[graft] val IndexSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("band_hash",
      org.apache.spark.sql.types.LongType)))

  def runNearDupIngestOnce(spark: SparkSession, docsPath: String, nChunks: Int = 3,
      w: Int = 5, k: Int = 64, bands: Int = 32, minJaccard: Double = 0.5): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_neardup_ingest")
    val out = runNearDupIngestAt(spark, work, docsPath, nChunks, w, k, bands, minJaccard)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(work).iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    out
  }

  /** [[runNearDupIngestOnce]] against a CALLER-OWNED work dir, left on
    * disk afterwards — the crash-recovery spec plants a garbage
    * index generation there before the replay and inspects the rolled
    * index after it (StreamingSpec's planted-crash pattern). */
  private[graft] def runNearDupIngestAt(spark: SparkSession,
      work: java.nio.file.Path, docsPath: String, nChunks: Int = 3,
      w: Int = 5, k: Int = 64, bands: Int = 32, minJaccard: Double = 0.5): DataFrame = {
    val srcDir = work.resolve("src").toString
    val pairsDir = work.resolve("pairs").toString
    val docs = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    docs.repartitionByRange(nChunks, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    // Every per-batch write is KEYED BY batchId and mode-overwrite, so a
    // retried micro-batch (at-least-once foreachBatch) redoes identical
    // work instead of double-appending: pairs land in pairs/batch=<id>
    // (partition-discovered on read), and index generation b+1 is an
    // overwrite derived from the immutable generation b. No driver-side
    // counter participates in state addressing — `maxGen` only records
    // the last generation for the final read.
    @volatile var maxGen = 0L
    val q = stream.writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val index =
          if (batchId == 0L)
            spark.createDataFrame(spark.sparkContext
              .emptyRDD[org.apache.spark.sql.Row], IndexSchema)
          else spark.read.parquet(work.resolve(s"index_$batchId").toString)
        // corpus text for the exact-Jaccard verify: everything EXCEPT
        // the current batch (ids not yet indexed can never be
        // candidates, so the anti join is the only exclusion needed)
        val corpus = docs.join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
        // one signature pass per batch serves both the probe and the roll
        val (pairs, batchIdx) = Dedup.incrementalNearDupRoll(
          corpus, index, batch, "doc_id", "text", w, k, bands, minJaccard)
        EventStream.probeBatchPlan(pairs)
        pairs.write.mode("overwrite")
          .parquet(java.nio.file.Paths.get(pairsDir, s"batch=$batchId").toString)
        // roll the index forward (at scale: append to the bucketed
        // index table; the generation rewrite is fixture-scale only)
        index.unionByName(batchIdx)
          .write.mode("overwrite").parquet(work.resolve(s"index_${batchId + 1}").toString)
        maxGen = math.max(maxGen, batchId + 1)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(maxGen >= 2, s"near-dup ingest replay must run multiple micro-batches, ran $maxGen")
    spark.read.parquet(pairsDir)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
      .localCheckpoint(true)
  }

  /** The rolling-ingestion loop for the EMBEDDING near-dup index — the
    * vector twin of [[runNearDupIngestOnce]]: an embedding stream probes
    * a persisted [[Dedup.cosineIndex]] batch by batch, emits the
    * exact-cosine-verified pairs each batch touches, and rolls the index
    * forward with the batch's sign-band rows (one signature pass per
    * batch serves both, [[Dedup.incrementalCosineNearDupRoll]]).
    *
    * Seeded hyperplanes make the banding batch-invariant, so the union
    * of per-batch emissions equals the full-corpus
    * [[Dedup.cosinePairsLsh]] pair set regardless of chunking — the
    * stream ≡ batch equality query st11 pins in-query (DuckDB cannot
    * replay the seeded planes; the SQL oracle contributes the brute
    * all-pairs truth). Same batchId-keyed idempotent state layout as the
    * text loop. */
  def runEmbedIngestOnce(spark: SparkSession, embPath: String, nChunks: Int = 3,
      minCos: Double = 0.45, dim: Int = 64,
      nPlanes: Int = 16, nBands: Int = 8): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_embed_ingest")
    val out = runEmbedIngestAt(spark, work, embPath, nChunks, minCos, dim, nPlanes, nBands)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(work).iterator().asScala.toSeq.reverseIterator
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    out
  }

  /** [[runEmbedIngestOnce]] against a caller-owned work dir (see
    * [[runNearDupIngestAt]]). */
  private[graft] def runEmbedIngestAt(spark: SparkSession,
      work: java.nio.file.Path, embPath: String, nChunks: Int = 3,
      minCos: Double = 0.45, dim: Int = 64,
      nPlanes: Int = 16, nBands: Int = 8): DataFrame = {
    val srcDir = work.resolve("src").toString
    val pairsDir = work.resolve("pairs").toString
    val emb = spark.read.parquet(embPath).select(col("vec_id"), col("embedding"))
    emb.repartitionByRange(nChunks, col("vec_id"))
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    @volatile var maxGen = 0L
    val q = stream.writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val index =
          if (batchId == 0L)
            spark.createDataFrame(spark.sparkContext
              .emptyRDD[org.apache.spark.sql.Row], IndexSchema)
          else spark.read.parquet(work.resolve(s"index_$batchId").toString)
        val corpus = emb.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
        val (pairs, batchIdx) = Dedup.incrementalCosineNearDupRoll(
          corpus, index, batch, "vec_id", "embedding", minCos, dim, nPlanes, nBands)
        EventStream.probeBatchPlan(pairs)
        pairs.write.mode("overwrite")
          .parquet(java.nio.file.Paths.get(pairsDir, s"batch=$batchId").toString)
        index.unionByName(batchIdx)
          .write.mode("overwrite").parquet(work.resolve(s"index_${batchId + 1}").toString)
        maxGen = math.max(maxGen, batchId + 1)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(maxGen >= 2, s"embed ingest replay must run multiple micro-batches, ran $maxGen")
    spark.read.parquet(pairsDir)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
      .localCheckpoint(true)
  }
}
