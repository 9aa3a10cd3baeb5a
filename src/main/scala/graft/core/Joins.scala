package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * every later equi-join/aggregation on `keyCol` is exchange-free. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

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
}
