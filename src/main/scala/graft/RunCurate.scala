package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Sinks
import graft.llm.Curation

/** CLI: end-to-end training-data curation over a documents parquet —
  * quality/language gate → exact + near-dup dedup → sequence packing —
  * writing curated docs, packed sequences, and a stats summary.
  *
  * Usage: runMain graft.RunCurate <documents.parquet> <outDir>
  *        [minQuality] [budget]
  */
object RunCurate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunCurate <documents.parquet> <outDir> [minQuality] [budget]")
    val (in, out) = (args(0), args(1))
    val minQ = if (args.length > 2) args(2).toDouble else 0.4
    val budget = if (args.length > 3) args(3).toInt else 512
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    val docs = spark.read.parquet(in)
    val nInput = docs.count()
    val gated = Curation.qualityFilter(docs, "text", Seq("en"), minQ, 8, 1 << 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = Curation.curateGated(gated, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kept.write.mode("overwrite").parquet(s"$out/curated.parquet")
    val packs = Curation.packSequences(kept, "doc_id", "n_tokens", budget)
    packs.write.mode("overwrite").parquet(s"$out/packs.parquet")

    val nGated = gated.count()
    val nKept = kept.count()
    val packStats = packs.agg(
      count(lit(1)).as("n_packs"),
      sum(col("total_tokens")).as("total_tokens"),
      avg(col("total_tokens")).as("avg_fill")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    Sinks.writeJson(Seq(
      "input_docs" -> nInput, "gated_docs" -> nGated, "curated_docs" -> nKept,
      "drop_rate" -> (1.0 - nKept.toDouble / math.max(1, nInput)),
      "n_packs" -> packStats.getLong(0),
      "total_tokens" -> packStats.getLong(1),
      "avg_pack_fill" -> packStats.getDouble(2) / budget,
      "token_budget" -> budget, "seconds" -> secs), s"$out/curation_stats.json")
    println(f"[curate] $nInput%d -> $nGated%d gated -> $nKept%d kept; " +
      f"${packStats.getLong(0)}%d packs, fill ${packStats.getDouble(2) / budget}%.2f, $secs%.1f s")
    spark.stop()
  }
}
