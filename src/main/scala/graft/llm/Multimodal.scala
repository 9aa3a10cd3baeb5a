package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus the
  * decode/feature/frame-sample operators a training-data pipeline runs
  * over them.
  *
  * The DECODE step is a clearly-marked STUB (this container has no
  * image/audio codecs): `decodeStub` produces a deterministic fake
  * "decoded" feature — a normalized 16-bin byte histogram — so the
  * Spark-side plumbing (schema, batch iteration via mapPartitions,
  * partition preservation, fixed-width feature output) is real and
  * tested while the codec call is swappable.
  *
  * Scale stance: payloads never pass through a shuffle — all operators
  * are map-only (mapPartitions / projections); metadata-only queries
  * prune the binary column at the parquet reader (columnar), so stats
  * over metadata read none of the payload bytes.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = true),   // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Build a media table from the documents fixture: utf-8 text bytes
    * stand in for an encoded payload; metadata is derived
    * deterministically (the real pipeline would carry true
    * width/height/sample_rate from ingestion). */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        when(col("kind") === "image", (pmod(col("media_id"), lit(64)) + 1).cast("int") * 16)
          .otherwise(lit(null).cast("int")).as("width"),
        when(col("kind") === "image", (pmod(col("media_id"), lit(48)) + 1).cast("int") * 16)
          .otherwise(lit(null).cast("int")).as("height"),
        when(col("kind") =!= "image", lit(16000)).otherwise(lit(null).cast("int"))
          .as("sample_rate"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  val FeatureDim = 16

  /** STUB DECODER — stands in for a real image/audio decode + feature
    * extraction (e.g. JPEG decode → CNN embed). Deterministic fake:
    * normalized 16-bin histogram of payload bytes. The mapPartitions
    * shape (iterator-in/iterator-out, no per-row setup, fixed-width
    * float output) is exactly what a real codec UDF needs. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xFF) / (256 / FeatureDim)) += 1f
      i += 1
    }
    val n = payload.length.toFloat
    var j = 0
    while (j < FeatureDim) { bins(j) /= n; j += 1 }
    bins
  }

  /** Decode/feature-extract over the media table: map-only, partition-
    * preserving, batched per partition (the real-codec slot). Output:
    * (media_id, kind, features array<float>[16]). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      // per-partition (not per-row) setup slot for a real codec context
      it.map { r =>
        Row(r.getLong(0), r.getString(1), decodeStub(r.getAs[Array[Byte]]("payload")).toSeq)
      }
    }(enc)
  }

  /** Frame-sample: slice the payload into `n` evenly-spaced fixed-width
    * binary frames (video keyframe-sampling shape). Pure projection. */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    require(n >= 2, "frameSample needs n >= 2 frames")
    media.select(col("media_id"), col("kind"),
      posexplode(transform(
        sequence(lit(0), lit(n - 1)),
        i => substring(col("payload"),
          (i * greatest((octet_length(col("payload")) - frameBytes) / (n - 1), lit(0)) + 1)
            .cast("int"), lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
      .where(octet_length(col("frame")) > 0)
  }

  /** Metadata-only stats — reads no payload bytes (parquet column
    * pruning keeps the binary column unscanned). */
  def metaStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n_media"),
      sum(col("meta.n_bytes")).as("total_bytes"),
      min(col("meta.n_bytes")).as("min_bytes"),
      max(col("meta.n_bytes")).as("max_bytes"))
      .orderBy(col("kind"))
}
