package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.llm.Dedup
import graft.streaming.IngestStream

/** CLI: ONE step of the rolling near-dup ingest loop, with state that
  * persists ACROSS invocations — run it once per arriving batch (the
  * daily-ingest shape the d12/st10 queries verify):
  *
  *   <stateDir>/index  — slim banded-signature index (id, band, band_hash)
  *   <stateDir>/docs   — accepted documents (text kept for exact verify)
  *   <stateDir>/pairs  — verified near-dup pairs emitted so far
  *
  * Each invocation probes the index with the batch, appends the verified
  * pairs (exactly the pairs a full-corpus re-run would add — see
  * [[Dedup.incrementalNearDup]]), and appends the batch's banded rows +
  * docs to the state. Invariant after N batches: `pairs` equals the
  * full-corpus LSH pair set over everything ingested (IngestSpec replays
  * this via the CLI). Batch ids must be new (dedup ingest runs exact d7
  * first in a real pipeline).
  *
  * Usage: runMain graft.RunIngest <batch.parquet> <stateDir>
  *        [minJaccard] [w] [k] [bands]
  */
object RunIngest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunIngest <batch.parquet> <stateDir> [minJaccard] [w] [k] [bands]")
    val (in, state) = (args(0), args(1))
    val minJ = if (args.length > 2) args(2).toDouble else 0.5
    val w = if (args.length > 3) args(3).toInt else 5
    val k = if (args.length > 4) args(4).toInt else 64
    val bands = if (args.length > 5) args(5).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val summary = ingestOnce(spark, in, state, minJ, w, k, bands)
    println(summary)
  }

  /** The ingest step, spark-session-injected for specs. Returns the
    * one-line JSON summary it also prints. */
  def ingestOnce(spark: SparkSession, in: String, state: String,
      minJ: Double = 0.5, w: Int = 5, k: Int = 64, bands: Int = 32): String = {
    val indexPath = s"$state/index"
    val docsPath = s"$state/docs"
    val pairsPath = s"$state/pairs"
    val batch = spark.read.parquet(in).select(col("doc_id"), col("text"))
    val hasState = new java.io.File(indexPath).exists()
    val index =
      if (hasState) spark.read.parquet(indexPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IngestStream.IndexSchema)
    val corpus =
      if (hasState) spark.read.parquet(docsPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val (pairs, batchIdx) = Dedup.incrementalNearDupRoll(
      corpus, index, batch, "doc_id", "text", w, k, bands, minJ)
    pairs.write.mode("append").parquet(pairsPath)
    // at scale these appends are bucketed-table commits; the state dir
    // here is the same layout minus the manifest
    batchIdx.write.mode("append").parquet(indexPath)
    batch.write.mode("append").parquet(docsPath)
    val nBatch = batch.count()
    val nNew = pairs.count()
    val nTotal = spark.read.parquet(pairsPath).count()
    val nIndex = spark.read.parquet(indexPath).count()
    s"""{"batch_docs":$nBatch,"new_pairs":$nNew,"total_pairs":$nTotal,"index_rows":$nIndex}"""
  }
}
