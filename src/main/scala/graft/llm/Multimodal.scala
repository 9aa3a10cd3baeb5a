package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus the
  * decode/feature/frame-sample operators a training-data pipeline runs
  * over them.
  *
  * All three modalities run a REAL JDK codec end-to-end — no external
  * dependency: IMAGE via `javax.imageio` PNG/GIF (`decodeImage`,
  * resize, perceptual hash), VIDEO via the animated-GIF container
  * (`gifFrameStats` — frame count from the container's image
  * descriptors, keyframe decode), AUDIO via the `javax.sound.sampled`
  * WAV/RIFF parser (`decodeWavs` — header rate/frames + PCM stats).
  * `decodeStub` (a deterministic byte histogram) remains only for the
  * opaque stand-in payloads of the generic mm1/mm2 fixture, marking
  * where a production pipeline would plug a heavier codec (JPEG2000,
  * H.264, …) into the same mapPartitions plumbing.
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

  /** Deterministic grayscale gradient PNG — the ingestion stand-in that
    * produces REAL encoded image bytes: pixel (x, y) has gray level
    * `x + y` (callers keep width + height ≤ 257 so the level never wraps,
    * which gives every per-image statistic a closed form:
    * mean luminance = (width + height − 2) / 2). */
  def syntheticPng(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, x + y); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class ImageFeatures(
      width: Int, height: Int, meanLum: Double, lumHist: Array[Float])

  /** REAL image decode (JDK `javax.imageio`, PNG/BMP/GIF/JPEG): true
    * header width/height plus mean and normalized 16-bin histogram of
    * per-pixel luminance (ITU-R BT.601 weights for color rasters; the
    * raw sample for grayscale). Returns None when the bytes are not a
    * decodable image — callers fall back to [[decodeStub]]. */
  /** One codec pass: bytes → BufferedImage, or None when undecodable.
    * Shared by [[decodeImage]] / [[resizeImage]] / [[resizeImages]] so
    * no caller pays the codec twice for one payload. */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (payload == null || payload.isEmpty) return None
    javax.imageio.ImageIO.setUseCache(false)
    Option(
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null })
  }

  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] = {
    val img = readImage(payload).getOrElse(return None)
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = img.getColorModel.getNumComponents == 1
    val hist = new Array[Float](FeatureDim)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val lum =
          if (gray) img.getRaster.getSample(x, y, 0).toDouble
          else {
            val rgb = img.getRGB(x, y)
            0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          }
        sum += lum
        hist(math.min(lum.toInt, 255) / (256 / FeatureDim)) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var j = 0
    while (j < FeatureDim) { hist(j) /= n; j += 1 }
    Some(ImageFeatures(w, h, sum / n, hist))
  }

  /** Media table with REAL PNG payloads: every document becomes an image
    * row whose payload is a [[syntheticPng]] gradient sized by a closed
    * form of the id (width = id%32+4, height = id%24+4 — bounded so the
    * gradient never wraps), so decoded statistics are SQL-expressible.
    * Map-only; the encode runs on executors (the ingestion shape). */
  def fromDocumentsPng(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (Math.floorMod(id, 32) + 4).toInt
        val h = (Math.floorMod(id, 24) + 4).toInt
        Row(id, "image", syntheticPng(w, h))
      }
    }(enc)
  }

  /** Decode the PNG media table: real `javax.imageio` decode per row →
    * (media_id, width, height, mean_lum). Map-only, payloads never
    * shuffle; rows that fail to decode THROW (a corrupt synthesized
    * payload is a bug, not data). */
  def decodeImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        // positional getter: upstream mapPartitions rows carry no schema
        val f = decodeImage(r.getAs[Array[Byte]](1))
          .getOrElse(sys.error(s"media_id=$id: payload is not a decodable image"))
        Row(id, f.width, f.height, f.meanLum)
      }
    }(enc)
  }

  /** REAL nearest-neighbor image resize through the JDK codec: decode,
    * sample dst(x, y) = src(x·srcW/dstW, y·srcH/dstH) (integer floor —
    * the standard NN mapping, exact and engine-independent), re-encode as
    * PNG. Grayscale rasters copy the raw sample; color collapses to
    * BT.601 luminance first (same convention as [[decodeImage]]).
    * Returns None for undecodable payloads. */
  def resizeImage(payload: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] =
    readImage(payload).map(resizeDecoded(_, dstW, dstH))

  /** The resize kernel over an already-decoded raster — callers that
    * need both source dims and the resize decode ONCE and reuse. */
  private def resizeDecoded(
      img: java.awt.image.BufferedImage, dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW >= 1 && dstH >= 1, s"resize target must be positive, got ${dstW}x$dstH")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = img.getColorModel.getNumComponents == 1
    val out = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = out.getRaster
    var y = 0
    while (y < dstH) {
      val sy = y * h / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * w / dstW
        val lum =
          if (gray) img.getRaster.getSample(sx, sy, 0)
          else {
            val rgb = img.getRGB(sx, sy)
            math.round(0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF)
              + 0.114 * (rgb & 0xFF)).toInt
          }
        raster.setSample(x, y, 0, lum)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Resize the media table and re-decode the RESIZED payloads — the
    * whole decode → resize → encode → decode loop runs through the real
    * codec, proving the resized bytes are themselves valid images.
    * Map-only like [[decodeImages]]; payloads never shuffle. Output:
    * (media_id, src_w, src_h, dst_w, dst_h, mean_lum of the resize). */
  def resizeImages(media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("src_w", IntegerType, nullable = false),
      StructField("src_h", IntegerType, nullable = false),
      StructField("dst_w", IntegerType, nullable = false),
      StructField("dst_h", IntegerType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        // ONE decode of the source payload: src dims and the resize both
        // come from the same BufferedImage (the codec is the cost here)
        val src = readImage(r.getAs[Array[Byte]](1))
          .getOrElse(sys.error(s"media_id=$id: payload is not a decodable image"))
        val resized = resizeDecoded(src, dstW, dstH)
        val f = decodeImage(resized)
          .getOrElse(sys.error(s"media_id=$id: resized payload failed to decode"))
        Row(id, src.getWidth, src.getHeight, f.width, f.height, f.meanLum)
      }
    }(enc)
  }

  /** Decode/feature-extract over the media table: map-only, partition-
    * preserving, batched per partition. Image payloads that the JDK codec
    * can decode get the REAL luminance histogram; everything else (audio/
    * video, or opaque stand-in bytes) gets the stub byte histogram.
    * Output: (media_id, kind, features array<float>[16]). */
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
        val payload = r.getAs[Array[Byte]](2) // positional: schema-less upstream rows
        val feats =
          if (r.getString(1) == "image") decodeImage(payload).map(_.lumHist)
          else None
        Row(r.getLong(0), r.getString(1), feats.getOrElse(decodeStub(payload)).toSeq)
      }
    }(enc)
  }

  /** 64-bit perceptual average-hash (aHash) of a decoded image:
    * nearest-neighbor resample to 8×8 luminance, bit = pixel > mean,
    * emitted as a 64-char '0'/'1' string (row-major y-outer) — a string
    * so the hash is sign-free and engine-portable for the oracle.
    * Shares the NN convention with [[resizeDecoded]] (src pixel
    * (x·w/8, y·h/8), integer floor). */
  def aHash(img: java.awt.image.BufferedImage): String = {
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = img.getColorModel.getNumComponents == 1
    val px = new Array[Int](64)
    var i = 0
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val sx = x * w / 8
        px(i) =
          if (gray) img.getRaster.getSample(sx, sy, 0)
          else {
            val rgb = img.getRGB(sx, sy)
            math.round(0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF)
              + 0.114 * (rgb & 0xFF)).toInt
          }
        i += 1; x += 1
      }
      y += 1
    }
    val mean = px.sum / 64.0
    val sb = new java.lang.StringBuilder(64)
    px.foreach(v => sb.append(if (v > mean) '1' else '0'))
    sb.toString
  }

  /** Decode + aHash, map-only: (media_id, ahash). Payloads never
    * shuffle — only the 64-char hash and the id leave the scan stage.
    * Shared front half of [[imageDedup]] / [[imageNearDupClasses]]. */
  private def aHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
          .getOrElse(sys.error(s"media_id=$id: payload is not a decodable image"))
        Row(id, aHash(img))
      }
    }(enc)
  }

  /** Image dedup by perceptual hash (the LAION-style image-dedup shape:
    * decode → aHash → group — images that are perceptually identical
    * collapse to one representative). Decode + hash run map-only in
    * `mapPartitions` (payloads never shuffle — only the 64-char hash and
    * the id ride the exchange); the group step is ONE hash shuffle, and
    * the representative is deterministic (min media_id). Near-dup
    * (Hamming ≤ r) is [[imageNearDupClasses]].
    *
    * Output: (ahash, n_images, rep_id) ordered by (n_images DESC,
    * ahash) — the dup-cluster inventory. */
  def imageDedup(media: DataFrame): DataFrame =
    aHashes(media).groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("rep_id"))
      .orderBy(col("n_images").desc, col("ahash"))

  /** Image NEAR-dup by perceptual hash: pairs of distinct aHash classes
    * within Hamming ≤ `maxHamming`, found by banding the 64 bits into
    * `nBands` equal substrings and equi-joining on any matching band —
    * the same blocking [[Dedup.simHashPairs]] uses for text, applied to
    * the image hash. By pigeonhole the blocking is EXACT for
    * maxHamming ≤ nBands−1 (a pair differing in ≤ nBands−1 bits must
    * agree on some band), which the `require` pins, so the result
    * equals the all-pairs filter without ever forming all pairs.
    *
    * Scale stance: the join runs over DISTINCT hash classes, not
    * images — exact dedup collapses the corpus first (one hash
    * shuffle, same as [[imageDedup]]), so a billion images with 10M
    * distinct hashes band-join 10M rows of (hash, band, key), and the
    * verify is a codegen'd conv/xor/bit_count on the 64-bit hash —
    * no payloads, no decode, no quadratic candidate set (hot bands
    * are bounded by the class-frequency histogram, not corpus size).
    *
    * Output: (hash_a, hash_b, hamming, n_a, n_b) with hash_a < hash_b,
    * n_* = image counts of each class, ordered by (hash_a, hash_b). */
  def imageNearDupClasses(
      media: DataFrame, maxHamming: Int = 3, nBands: Int = 4): DataFrame =
    nearDupClassPairs(classCounts(media), maxHamming, nBands)
      .select("hash_a", "hash_b", "hamming", "n_a", "n_b")
      .orderBy("hash_a", "hash_b")

  /** Distinct aHash classes with image count and min-id representative —
    * the collapsed frame every image near-dup stage joins over (one hash
    * shuffle; payloads/decodes never repeat downstream). */
  private def classCounts(media: DataFrame): DataFrame =
    aHashes(media).groupBy(col("ahash"))
      .agg(count(lit(1)).as("n"), min(col("media_id")).as("rep_id"))

  /** Banded Hamming pairs over an existing (ahash, n, rep_id) class frame
    * — the back half of [[imageNearDupClasses]], split out so
    * [[imageNearDupResolve]] can reuse one decode+hash pass for both the
    * pair generation and the cluster inventory. Output additionally
    * carries each side's class representative (rep_a/rep_b). */
  private def requireBands(maxHamming: Int, nBands: Int): Unit = {
    require(nBands >= 1 && 64 % nBands == 0, s"nBands $nBands must divide 64")
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"band blocking is exact only for maxHamming <= nBands-1 " +
        s"(got maxHamming=$maxHamming, nBands=$nBands)")
  }

  /** Band split of a class frame: one (ahash, n, rep_id, band, key) row
    * per band — the blocking key the within-snapshot pair join (mm7)
    * and the cross-snapshot probe (mm13) both meet on. */
  private def bandedClasses(classes: DataFrame, nBands: Int): DataFrame = {
    val r = 64 / nBands
    val bandArr = array((0 until nBands).map { b =>
      struct(lit(b).as("band"), substring(col("ahash"), b * r + 1, r).as("key"))
    }: _*)
    classes
      .select(col("ahash"), col("n"), col("rep_id"), explode(bandArr).as("bk"))
      .select(col("ahash"), col("n"), col("rep_id"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Hamming over the '0'/'1' hash strings: four 16-bit chunks through
    * conv(·,2,10) → xor → bit_count, all codegen'd builtins. */
  private def hamming64(a: Column, b: Column): Column =
    (0 until 4).map { c =>
      bit_count(conv(substring(a, c * 16 + 1, 16), 2, 10).cast("long")
        .bitwiseXOR(conv(substring(b, c * 16 + 1, 16), 2, 10).cast("long")))
    }.reduce(_ + _)

  private def nearDupClassPairs(
      classes: DataFrame, maxHamming: Int, nBands: Int): DataFrame = {
    requireBands(maxHamming, nBands)
    val banded = bandedClasses(classes, nBands)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.ahash") < col("b.ahash"))
      .select(col("a.ahash").as("hash_a"), col("b.ahash").as("hash_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.rep_id").as("rep_a"), col("b.rep_id").as("rep_b"))
      .dropDuplicates("hash_a", "hash_b")
      .withColumn("hamming", hamming64(col("hash_a"), col("hash_b")).cast("int"))
      .where(col("hamming") <= maxHamming)
  }

  /** Incremental image near-dup PROBE (mm13 — the d12 at-rest-index
    * pattern applied to images): the new batch's aHash classes meet the
    * AT-REST class index on (band, key) only — pigeonhole-exact recall
    * for maxHamming ≤ nBands−1, mm7's blocking guarantee — then
    * candidates pass the exact Hamming gate. Per ingest batch the work
    * is O(batch decode+hash + banded candidates); at rest the class
    * index would live band-partitioned, so the equi join prunes to the
    * batch's band keys (n7's partition-pruning shape). Cross-snapshot
    * EXACT dups (hamming 0) are deliberately included — a probe must
    * flag a re-upload as loudly as a near-dup. Output: one row per
    * (old, new) class pair within the radius. */
  def imageNearDupProbe(atRest: DataFrame, batch: DataFrame,
      maxHamming: Int = 3, nBands: Int = 4): DataFrame = {
    requireBands(maxHamming, nBands)
    val old = bandedClasses(classCounts(atRest), nBands)
    val neu = bandedClasses(classCounts(batch), nBands)
    old.as("a").join(neu.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.ahash").as("hash_old"), col("b.ahash").as("hash_new"),
        col("a.n").as("n_old"), col("b.n").as("n_new"))
      .dropDuplicates("hash_old", "hash_new")
      .withColumn("hamming",
        hamming64(col("hash_old"), col("hash_new")).cast("int"))
      .where(col("hamming") <= maxHamming)
  }

  /** Image near-dup RESOLUTION: the composition step mm7 stops short of —
    * near-class pairs become connected components ([[Dedup.dupClusters]]
    * over class representatives) and every class lands in a cluster
    * (classes with no near pair are their own singleton). One row per
    * cluster: `cluster` = the min media_id across the cluster's images
    * (representative ids are per-class minima and CC labels by min
    * reachable id), which IS the keep-first representative — a dedup
    * keeps `cluster`, drops the other `n_dropped` images.
    *
    * Scale stance: clustering runs over CLASS representatives (≤ distinct
    * hashes, not images), the inventory join is class-count sized, and
    * the only image-cardinality stage is the single decode+hash pass
    * shared with the pair generation. */
  def imageNearDupResolve(
      media: DataFrame, maxHamming: Int = 3, nBands: Int = 4): DataFrame = {
    val classes = classCounts(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val edges = nearDupClassPairs(classes, maxHamming, nBands)
        .select(col("rep_a").as("id_a"), col("rep_b").as("id_b"))
      val clusters = Dedup.dupClusters(edges)
        .withColumnRenamed("id", "rep_id")
      classes.join(clusters, Seq("rep_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("rep_id")))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_images"))
        .withColumn("n_dropped", col("n_images") - 1L)
        .orderBy(col("cluster"))
    } finally classes.unpersist(blocking = false)
  }

  /** Deterministic multi-frame animated GIF — the ingestion stand-in for a
    * real VIDEO container: `levels(f)` becomes frame f as a constant-gray
    * `width`×`height` image, written through the JDK's own GIF sequence
    * writer (`ImageWriter.writeToSequence` — a genuine container format
    * with per-frame image descriptors, not concatenated bytes). Constant
    * frames round-trip exactly through the GIF palette, so every decoded
    * per-frame statistic has a closed form (mean luminance = the level). */
  def syntheticGif(width: Int, height: Int, levels: Seq[Int]): Array[Byte] = {
    require(levels.nonEmpty, "syntheticGif needs at least one frame")
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      levels.foreach { level =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { raster.setSample(x, y, 0, level); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Media table with REAL animated-GIF payloads: every document becomes a
    * video row of `doc_id % 5 + 2` constant-gray frames at 16×12, frame f
    * at level `(id·17 + f·29) % 256` — closed forms of the id, so decoded
    * frame statistics are SQL-expressible. Map-only executor-side encode,
    * like [[fromDocumentsPng]]. */
  def fromDocumentsGif(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nFrames = (Math.floorMod(id, 5) + 2).toInt
        val levels = (0 until nFrames).map(f => Math.floorMod(id * 17 + f * 29, 256).toInt)
        Row(id, "video", syntheticGif(16, 12, levels))
      }
    }(enc)
  }

  /** REAL container frame parse + sample: open the payload with the JDK
    * image reader, discover the TRUE frame count from the container
    * (`ImageReader.getNumImages` walks the GIF image descriptors), decode
    * `n` evenly-spaced frames (slot j → frame ⌊j·(F−1)/(n−1)⌋ — first and
    * last always included), and emit per-frame stats. This is the video
    * keyframe-sampling shape with the codec REAL end-to-end; payloads
    * never shuffle (map-only, one reader per payload, only scalars leave
    * the scan stage).
    *
    * Output: (media_id, n_frames, slot, frame_idx, width, height,
    * mean_lum) — one row per sampled slot. Undecodable payloads THROW
    * (like [[decodeImages]]: a corrupt synthesized payload is a bug). */
  def gifFrameStats(media: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "gifFrameStats needs n >= 2 sampled frames")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("slot", IntegerType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) sys.error(s"media_id=$id: payload is not a decodable container")
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val nFrames = reader.getNumImages(true)
          // distinct sampled indices: slot j -> floor(j*(F-1)/(n-1));
          // duplicates collapse when F < n (every frame already sampled)
          val idxBySlot = (0 until n).map(j => j -> (j.toLong * (nFrames - 1) / (n - 1)).toInt)
          val firstSlotOfIdx = idxBySlot.groupBy(_._2).map { case (idx, ss) => idx -> ss.head._1 }
          idxBySlot.collect { case (slot, idx) if firstSlotOfIdx(idx) == slot =>
            val img = reader.read(idx)
            val (w, h) = (img.getWidth, img.getHeight)
            val gray = img.getColorModel.getNumComponents == 1
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sum +=
                  (if (gray) img.getRaster.getSample(x, y, 0).toDouble
                   else {
                     val rgb = img.getRGB(x, y)
                     0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                   })
                x += 1
              }
              y += 1
            }
            Row(id, nFrames, slot, idx, w, h, sum / (w * h))
          }
        } finally { reader.dispose(); iis.close() }
      }
    }(enc)
  }

  /** Deterministic PCM WAV — the ingestion stand-in for a real AUDIO
    * payload: `n` constant 16-bit mono samples at `level`, written
    * through the JDK's own WAV encoder (`javax.sound.sampled` — a
    * genuine RIFF container, no external dependency). Constant samples
    * give every decoded statistic a closed form (mean = level,
    * RMS = |level|). */
  def syntheticWav(sampleRate: Int, n: Int, level: Short): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) { // 16-bit little-endian PCM
      pcm(2 * i) = (level & 0xFF).toByte
      pcm(2 * i + 1) = ((level >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Media table with REAL WAV payloads: every document becomes an audio
    * row of `doc_id%400+100` constant samples at level
    * `(id·37) % 30000 − 15000`, 8 kHz mono 16-bit — closed forms of the
    * id, so decoded statistics are SQL-expressible. Map-only
    * executor-side encode like [[fromDocumentsPng]]/[[fromDocumentsGif]]. */
  def fromDocumentsWav(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = (Math.floorMod(id, 400) + 100).toInt
        val level = (Math.floorMod(id * 37, 30000) - 15000).toShort
        Row(id, "audio", syntheticWav(8000, n, level))
      }
    }(enc)
  }

  /** REAL audio decode (JDK `javax.sound.sampled` WAV/RIFF parser):
    * true header sample-rate + frame count, plus mean sample and RMS
    * over the decoded 16-bit PCM. Map-only, payloads never shuffle;
    * undecodable payloads THROW (like [[decodeImages]]). With this the
    * three modalities all run a REAL JDK codec end-to-end: PNG/GIF
    * images ([[decodeImages]]), GIF video containers
    * ([[gifFrameStats]]), WAV audio here. */
  def decodeWavs(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("mean_sample", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              sys.error(s"media_id=$id: payload is not a decodable audio container ($e)")
          }
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"media_id=$id: expected 16-bit mono PCM, got $fmt")
          val buf = in.readAllBytes()
          val n = buf.length / 2
          var (sum, sumSq) = (0.0, 0.0)
          var i = 0
          while (i < n) {
            val s = ((buf(2 * i) & 0xFF) | (buf(2 * i + 1) << 8)).toShort.toDouble
            sum += s; sumSq += s * s
            i += 1
          }
          Row(id, fmt.getSampleRate.toInt, n.toLong, sum / n, math.sqrt(sumSq / n))
        } finally in.close()
      }
    }(enc)
  }

  /** Media table with REAL WAV payloads carrying a voiced/silence
    * SEGMENT pattern (the VAD fixture): doc `id` becomes `id%20+10`
    * blocks of `blockSamples` 16-bit samples each — block `b` is
    * "voiced" (constant amplitude 12000) iff `(b + id) % 4 < 2`, else
    * silent (0). The pattern is a closed form of the id, so the
    * segmentation a VAD recovers (segment count, lengths, voiced
    * fraction) is SQL-expressible without an oracle-side codec. Encoded
    * through the JDK's own RIFF writer like [[fromDocumentsWav]];
    * map-only executor-side encode. */
  def fromDocumentsWavVad(docs: DataFrame, idCol: String = "doc_id",
      blockSamples: Int = 160): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol).cast(LongType)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nBlocks = (Math.floorMod(id, 20) + 10).toInt
        val amp: Short = 12000
        val pcm = new Array[Byte](nBlocks * blockSamples * 2)
        var b = 0
        while (b < nBlocks) {
          if (Math.floorMod(b + id, 4) < 2) {
            var i = 0
            while (i < blockSamples) {
              val off = (b * blockSamples + i) * 2
              pcm(off) = (amp & 0xFF).toByte
              pcm(off + 1) = ((amp >> 8) & 0xFF).toByte
              i += 1
            }
          } // silent blocks stay zero-initialized
          b += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, (nBlocks * blockSamples).toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, "audio", bos.toByteArray)
      }
    }(enc)
  }

  /** Energy-based voice-activity segmentation over REAL decoded WAV
    * audio (the speech-data curation step between decode and ASR: how
    * much of each clip is speech, in how many segments): decode the
    * RIFF payload with the JDK parser, compute per-block RMS energy
    * over `blockSamples`-sample windows, threshold into voiced/silent,
    * and run-length the voiced blocks into segments.
    *
    * The segmentation runs INSIDE the decode loop — per-file PCM is
    * local to its executor task and a VAD walk over one clip is
    * inherently sequential, so streaming the run-length state through
    * the sample loop is the distributed-correct shape (the parallelism
    * axis is files, never samples). Map-only; payloads never shuffle.
    * Undecodable payloads THROW ([[decodeImages]]'s stance).
    *
    * Output per clip: (media_id, n_blocks, n_voiced, n_segments,
    * longest_run, voiced_frac). Trailing samples short of a full block
    * are ignored (standard frame-aligned VAD). */
  def vadSegments(media: DataFrame, blockSamples: Int = 160,
      threshold: Double = 500.0): DataFrame = {
    require(blockSamples >= 1, s"blockSamples must be >= 1, got $blockSamples")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_blocks", LongType, nullable = false),
      StructField("n_voiced", LongType, nullable = false),
      StructField("n_segments", LongType, nullable = false),
      StructField("longest_run", LongType, nullable = false),
      StructField("voiced_frac", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              sys.error(s"media_id=$id: payload is not a decodable audio container ($e)")
          }
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"media_id=$id: expected 16-bit mono PCM, got $fmt")
          val buf = in.readAllBytes()
          val nBlocks = (buf.length / 2) / blockSamples
          var (nVoiced, nSegments, longest, run) = (0L, 0L, 0L, 0L)
          var b = 0
          while (b < nBlocks) {
            var sumSq = 0.0
            var i = 0
            while (i < blockSamples) {
              val off = (b * blockSamples + i) * 2
              val s = ((buf(off) & 0xFF) | (buf(off + 1) << 8)).toShort.toDouble
              sumSq += s * s
              i += 1
            }
            val voiced = math.sqrt(sumSq / blockSamples) > threshold
            if (voiced) {
              nVoiced += 1
              if (run == 0) nSegments += 1
              run += 1
              if (run > longest) longest = run
            } else run = 0
            b += 1
          }
          Row(id, nBlocks.toLong, nVoiced, nSegments, longest,
            if (nBlocks == 0) 0.0 else nVoiced.toDouble / nBlocks)
        } finally in.close()
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
