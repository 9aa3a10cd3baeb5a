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

  // Mirrors the PRODUCTION hash exactly: the key is reduced mod p
  // BEFORE the multiply (a·(x mod p) ≡ a·x (mod p)), which is what
  // keeps a·x from overflowing Long for keys above ~Long.Max/a
  // (~8.4e9). floorMod = Spark's pmod for the non-negative-key
  // contract this family documents (Frequency.scala).
  private def refBits(ks: Seq[Long]): Set[Long] =
    ks.flatMap(u => Bloom.Params.map { case (a, b) =>
      ((a * Math.floorMod(u, Bloom.P) + b) % Bloom.P) % Bloom.MBits
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

  test("overflow regime: keys above Long.Max/a agree with the reduced reference") {
    val s = spark; import s.implicits._
    // a_max ≈ 1.23e9 → a·x overflows Long for x ≳ 7.5e9. These keys
    // live squarely in the regime the pre-reduction exists for: the
    // naive ((a*u + b) % P) model silently wraps here, the reduced one
    // does not — so this case pins that the PRODUCTION hash is the
    // reduced one, end to end through build + memberHits.
    val big = Seq(7500000000L, 8400000001L, 9007199254740993L,
      Long.MaxValue - 7L, Long.MaxValue, 123456789012345L)
    val bits = refBits(big)
    val state = stateOf(big)
    // every inserted big key must probe present...
    val miss = Bloom.memberHits(big.toDF("u"), state, "u")
      .where(!col("bloom_hit")).count()
    assert(miss === 0L, s"$miss overflow-regime keys probed ABSENT")
    // ...and the state's set bits are exactly the reduced model's bits
    val stateBits = state.collect().flatMap { r =>
      val idx = r.getInt(0); val w = r.getLong(1)
      (0 until 64).filter(i => (w >>> i & 1L) == 1L).map(i => idx * 64L + i)
    }.toSet
    assert(stateBits === bits,
      "distributed bitset diverges from the reduced-hash reference in the overflow regime")
    // the naive (un-reduced) model DOES diverge on these keys, so the
    // case distinguishes the two hash definitions (guards test vacuity)
    val naive = big.flatMap(u => Bloom.Params.map { case (a, b) =>
      ((a * u + b) % Bloom.P) % Bloom.MBits
    }).toSet
    assert(naive !== bits, "fixture failed to reach the overflow regime")
  }
}
