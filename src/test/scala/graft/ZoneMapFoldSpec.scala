package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the zone-map MIN/MAX fold (u12 / st22): per-bucket (min, max)
  * folded by keyed MIN/MAX must equal the one-shot GROUP BY under any
  * decomposition — disjoint, overlapping (idempotence — the redelivery
  * case), or arbitrarily ordered — and the serve-side candidate set
  * must be a SUPERSET of the buckets with actual matches (the zone-map
  * contract: overlap without membership is the only false-positive
  * class, false negatives are impossible). */
class ZoneMapFoldSpec extends SparkSpec {

  private def rows(seed: Int, n: Int): Seq[(Long, Double)] =
    (0 until n).map { i =>
      val id = ((i.toLong * 48271 + seed) % 10007L).abs
      (id, ((id * 31 + seed) % 997).toDouble / 3.0)
    }

  private def zm(df: DataFrame): DataFrame = df
    .groupBy(expr("id div 100").as("bucket"))
    .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))

  private def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket"))
      .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  private def toMap(df: DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("fold equals one-shot under disjoint, overlapping, and shuffled splits") {
    val s = spark; import s.implicits._
    val data = rows(3, 900)
    val oneShot = toMap(zm(data.toDF("id", "v")))
    val splits = Seq(
      data.grouped(300).toSeq,                                  // disjoint
      Seq(data.take(600), data.drop(300), data.filter(_._1 % 3 == 0)), // overlapping
      data.reverse.grouped(450).toSeq)                          // order-shuffled
    for (parts <- splits) {
      val folded = toMap(parts.map(p => zm(p.toDF("id", "v"))).reduce(merge))
      assert(folded === oneShot)
    }
  }

  test("candidate buckets are a superset of buckets with actual matches") {
    val s = spark; import s.implicits._
    val data = rows(11, 900)
    val (lo, hi) = (50.0, 70.0)
    val map = toMap(zm(data.toDF("id", "v")))
    val candidates = map.collect { case (b, (mn, mx)) if mx >= lo && mn <= hi => b }.toSet
    val actual = data.filter { case (_, v) => v >= lo && v <= hi }
      .map(_._1 / 100).toSet
    assert(actual.subsetOf(candidates),
      s"zone map missed buckets with matches: ${actual -- candidates}")
    assert(actual.nonEmpty, "fixture produced no matches — predicate dead")
  }
}
