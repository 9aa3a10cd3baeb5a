package graft

import org.apache.spark.sql.functions._
import graft.llm.Frequency.Bloom

/** Pins Frequency.Bloom (u11 / st21): the explicit-universal-hash Bloom
  * filter whose state is (idx, word) rows folded by keyed BIT_OR.
  * Three properties carry the operator:
  *   1. NO FALSE NEGATIVES — every inserted key must probe present.
  *   2. fold ≡ one-shot — any split of the key set (including
  *      overlapping splits: BIT_OR is idempotent, the redelivery case)
  *      folds to the bit-identical state.
  *   3. memberHits ≡ a driver-side reference of the same hash family —
  *      the distributed plumbing adds nothing to the math. */
class BloomFoldSpec extends SparkSpec {

  private def keys(seed: Int, n: Int): Seq[Long] =
    (0 until n).map(i => ((i.toLong * 2654435761L + seed) % 1000000L).abs)

  private def refBits(ks: Seq[Long]): Set[Long] =
    ks.flatMap(u => Bloom.Params.map { case (a, b) =>
      ((a * u + b) % Bloom.P) % Bloom.MBits
    }).toSet

  private def stateOf(ks: Seq[Long]) = {
    val s = spark; import s.implicits._
    Bloom.build(ks.toDF("u"), "u")
  }

  test("no false negatives: every inserted key probes present") {
    val s = spark; import s.implicits._
    val ks = keys(7, 400).distinct
    val state = stateOf(ks)
    val hits = Bloom.memberHits(ks.toDF("u"), state, "u")
      .where(!col("bloom_hit")).count()
    assert(hits === 0L, s"$hits inserted keys probed ABSENT")
  }

  test("fold equals one-shot over random disjoint AND overlapping splits (idempotence)") {
    val s = spark; import s.implicits._
    val ks = keys(13, 300).distinct
    val oneShot = stateOf(ks).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // disjoint 3-way split, then an overlapping split (each key appears
    // 1–2 times — the at-least-once redelivery shape BIT_OR absorbs)
    val splits = Seq(
      ks.grouped((ks.size + 2) / 3).toSeq,
      Seq(ks.take(200), ks.drop(100), ks.filter(_ % 2 == 0)))
    for (parts <- splits) {
      val folded = parts.map(stateOf).reduce(Bloom.merge)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(folded === oneShot)
    }
  }

  test("memberHits matches the driver-side reference hash family exactly") {
    val s = spark; import s.implicits._
    val ks = keys(29, 250).distinct
    // half the probes are inserted keys (true hits), half are fresh
    // (absent at this fill level with overwhelming probability)
    val probes = (ks.take(125) ++ keys(31, 150)).distinct
    val bits = refBits(ks)
    val expect = probes.map { u =>
      u -> Bloom.Params.forall { case (a, b) =>
        bits(((a * u + b) % Bloom.P) % Bloom.MBits)
      }
    }.toMap
    val got = Bloom.memberHits(probes.toDF("u"), stateOf(ks), "u")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === expect)
    // and the reference itself contains both outcomes, so the test bites
    assert(expect.values.exists(identity) && expect.values.exists(!_))
  }
}
