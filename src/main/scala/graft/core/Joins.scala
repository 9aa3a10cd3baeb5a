package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join strategies for the 100-TB path: bucketed co-located joins (no
  * shuffle at query time) and salted joins for skewed keys.
  *
  * Bucketing: for repeatedly-joined fact tables, paying one write-side
  * shuffle (`bucketBy`) removes the per-query Exchange on both sides —
  * the sort-merge join reads co-located buckets directly. Salting: a hot
  * key that overwhelms one reducer is spread over `salts` subkeys; the
  * small side is replicated per salt (classic skew mitigation when AQE's
  * skew-join split isn't available, e.g. non-AQE plans or stream-static
  * joins).
  */
object Joins {

  /** Write `df` as a bucketed+sorted managed table. One-time shuffle so
    * every later equi-join/aggregation on `keyCol` is exchange-free.
    * Drops any previous table AND its on-disk location first: with the
    * in-memory catalog a location can survive from an earlier session
    * while the catalog entry did not, and `saveAsTable` refuses to reuse
    * such an orphaned directory. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both Exchanges (verified by `JoinsSpec`). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(keyCol))

  /** Bloom-pruned join: build a Bloom filter over the small side's keys
    * and pre-filter the big side BEFORE its shuffle — semi-join
    * reduction. At 100 TB this is the difference between shuffling every
    * big-side row and shuffling only candidate matches (false-positive
    * rate `fpp` controls the leak; correctness is unaffected since the
    * join re-checks keys). */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // probe with the SAME representation the filter is built on — a
    // mismatched probe (e.g. casting a string key to long) turns the
    // false-positive-only contract into silent false negatives; validate
    // the key type up front so unsupported types fail fast
    val keyType = big.schema(key).dataType
    val supported = Seq(ByteType, ShortType, IntegerType, LongType, StringType)
    if (!supported.contains(keyType)) {
      throw new IllegalArgumentException(
        s"bloomPrunedJoin: unsupported key type $keyType for '$key' (integral or string only)")
    }
    val bloom = small.stat.bloomFilter(key, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    val keep = keyType match {
      case StringType =>
        val f = udf((k: String) => k != null && bc.value.mightContainString(k))
        f(col(key))
      case _ =>
        val f = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        f(col(key).cast("long"))
    }
    big.where(keep).join(small, Seq(key))
  }

  /** Salted inner equi-join: big side gets a per-row salt in [0, salts);
    * small side is replicated across all salts (explode of a static
    * array — `salts`× small-side rows). The salt only spreads rows of a
    * hot key across reducers; since the small side carries every salt,
    * the join result equals a plain inner join on `key` for ANY salt
    * assignment (so the per-row id source needn't be retry-stable). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Backward as-of join (point-in-time enrichment): every `left` row is
    * matched to the `right` row with the LARGEST `tsCol` ≤ the left row's
    * `tsCol` on the same `keys` (inclusive; left outer — unmatched rows
    * keep null `valueCols`), optionally only when the match is within
    * `toleranceMs` of the left timestamp.
    *
    * Spark has no native as-of join; the naive formulation
    * (`l.ts >= r.ts` non-equi join + keep-latest) plans as a
    * BroadcastNestedLoopJoin — O(|L|·|R|) per key and excluded from
    * codegen. This instead UNIONS the two sides and runs ONE window over
    * (`keys`, ts): right rows sort before left rows at equal ts, and
    * `last(value, ignoreNulls)` over the unbounded-preceding frame fills
    * each left row with the most recent right value — a single shuffle on
    * `keys`, linear work, the merge-scan shape an as-of join compiles to
    * in columnar engines (cf. DuckDB ASOF JOIN, which oracles this).
    *
    * `valueCols` are right-side columns to attach; their names must not
    * collide with left columns (alias on the right frame first — also the
    * way to expose the matched right timestamp: duplicate it as a value
    * column). Right rows should be unique per (keys, tsCol): collapse
    * duplicates first, or the attached value among equal timestamps is
    * tie-order dependent.
    *
    * `direction`: "backward" (default) matches the LATEST right row
    * at-or-before the left timestamp; "forward" the EARLIEST right row
    * at-or-after it (same single-shuffle shape with the scan order
    * reversed).
    *
    * Skew note: like any per-key ordered window, one key's full history
    * lands on one task. A key hot enough to overwhelm a task needs a
    * coarse time-bucket added to `keys` (per-epoch as-of with carry-in of
    * each bucket's last right row) — the standard windowed-merge split. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      valueCols: Seq[String], toleranceMs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got '$direction'")
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"asofJoin: value columns ${valueCols.intersect(leftCols)} collide with left columns")
    val lOthers = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    val rTsType = right.schema(tsCol).dataType
    val lPart = left.select(
      keys.map(col) ++ Seq(col(tsCol)) ++ lOthers.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(rTsType).as("__asof_rts")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rPart = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        lOthers.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(tsCol).as("__asof_rts")) ++
        valueCols.map(col): _*)
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all last() calls share one window spec → a single WindowExec pass
    val filled = (valueCols :+ "__asof_rts").foldLeft(lPart.unionByName(rPart)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val gated = toleranceMs match {
      case None => filled
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_millis(col(tsCol)) - unix_millis(col("__asof_rts"))
          else unix_millis(col("__asof_rts")) - unix_millis(col(tsCol))
        val inTol = col("__asof_rts").isNotNull && (gap <= tol)
        valueCols.foldLeft(filled)((df, c) =>
          df.withColumn(c, when(inTol, col(c))))
    }
    gated.where(col("__side") === 1).select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** NEAREST as-of join (pandas `merge_asof direction='nearest'`): each
    * left row takes the right row with the smallest ABSOLUTE time gap —
    * ties break backward (the at-or-before match), matching pandas.
    * `toleranceMs` bounds the gap on BOTH sides.
    *
    * Built as one backward + one forward [[asofJoin]] pass (the matched
    * right timestamp rides along as a smuggled value column so the gap
    * is computable), then a per-row pick. Two key-keyed window shuffles
    * — one per scan direction; a single-pass nearest would need a
    * bidirectional running-last, which no ordered window provides.
    * Emits `valueCols` plus `__asof_dir` ('b'/'f'/null — which side
    * won; null when nothing matched within tolerance). */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    def tagged(sfx: String): (DataFrame, Seq[String], String) = {
      val rts = s"__asof_ts$sfx"
      val vals = valueCols.map(_ + sfx) :+ rts
      val r = right.select(
        keys.map(col) ++ Seq(col(tsCol), col(tsCol).as(rts)) ++
          valueCols.map(c => col(c).as(c + sfx)): _*)
      (r, vals, rts)
    }
    val (rb, valsB, rtsB) = tagged("__b")
    val (rf, valsF, rtsF) = tagged("__f")
    val bwd = asofJoin(left, rb, keys, tsCol, valsB, toleranceMs, "backward")
    val both = asofJoin(bwd, rf, keys, tsCol, valsF, toleranceMs, "forward")
    val gapB = unix_millis(col(tsCol)) - unix_millis(col(rtsB))
    val gapF = unix_millis(col(rtsF)) - unix_millis(col(tsCol))
    val useB = col(rtsB).isNotNull && (col(rtsF).isNull || gapB <= gapF)
    val picked = valueCols.map(c =>
      when(useB, col(c + "__b")).otherwise(col(c + "__f")).as(c)) :+
      when(useB, lit("b")).when(col(rtsF).isNotNull, lit("f"))
        .otherwise(lit(null).cast("string")).as("__asof_dir")
    both.select(leftCols.map(col) ++ picked: _*)
  }

  /** Range (band) join: inner-join rows of `fact` to rows of `bands`
    * where `fact.pointCol ∈ [bands.loCol, bands.hiCol)`. The naive form
    * is a non-equi BroadcastNestedLoopJoin (O(|F|·|B|), no codegen); this
    * rewrites it as an EQUI join on a bucket id: every band is exploded
    * to the `bucketWidth`-sized buckets it overlaps, each fact row maps
    * to exactly one bucket, and the residual `[lo, hi)` predicate runs
    * AFTER the hash join — shuffle-hash/SMJ on the bucket key, linear
    * work when bands are narrow relative to `bucketWidth`. Bands may
    * overlap (a fact row then matches several bands — true join
    * semantics, no dedup). */
  /** Interval-overlap join: inner-join rows of `a` to rows of `b` where
    * the CLOSED intervals [aLo, aHi] and [bLo, bHi] overlap
    * (aLo ≤ bHi ∧ bLo ≤ aHi). The naive form is a non-equi
    * BroadcastNestedLoopJoin — O(|A|·|B|); this rewrites it as an EQUI
    * join on a bucket id: each interval explodes to every
    * `bucketWidth`-sized bucket it touches, the join runs on the bucket
    * key, and the residual overlap predicate runs after. An overlapping
    * pair shares every bucket containing max(aLo, bLo), so pairs are
    * emitted EXACTLY ONCE by keeping only the bucket holding that point
    * — no dropDuplicates shuffle (the standard dedup-free interval-join
    * trick; cf. the bucketed range joins in Spark's own
    * RangeJoin literature and DuckDB's IEJoin).
    *
    * Column names must be disjoint across the two frames. Work scales
    * as Σ(interval length / bucketWidth) per side: pick `bucketWidth`
    * near the typical interval length so each interval explodes to O(1)
    * buckets; a side with rare very-long intervals explodes linearly in
    * their length (split such outliers or raise the width). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "intervalOverlapJoin: bucketWidth must be positive")
    def expand(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bucket", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        // closed hi: an interval ending on a bucket edge touches that bucket
        greatest(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long")))))
    expand(a, aLo, aHi).join(expand(b, bLo, bHi), Seq("__bucket"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      // emit-once: keep only the bucket containing max(aLo, bLo) — a
      // point inside both intervals, so that bucket exists on both sides
      .where(col("__bucket") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }

  def rangeJoinBuckets(fact: DataFrame, bands: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "rangeJoinBuckets: bucketWidth must be positive")
    val f = fact.withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val b = bands.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive: a band ending exactly on a bucket edge does not
        // reach into that bucket
        greatest(
          floor(col(loCol) / bucketWidth).cast("long"),
          ceil(col(hiCol) / bucketWidth).cast("long") - 1))))
    f.join(b, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
