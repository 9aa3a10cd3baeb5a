package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the reference's main cost-reduction device
  * (`eda_workspace/public_eda_pipeline.py:42-43`: `(col.hash(seed) % 100) <
  * pct`, used with pct ∈ {10,12,20,30} at `P:332,418,472,604`).
  *
  * Semantics note (SURVEY.md E2): Polars' `hash(seed)` and Spark's `xxhash64`
  * are different hash functions, so the sampled row *sets* differ; the
  * contract is distributional (stable, uniform, key-deterministic), not
  * row-identical. The predicate is a plain expression on the key column, so
  * Catalyst keeps it pushed below downstream joins — both sides of a sampled
  * join shrink before the shuffle, exactly like the reference's plan.
  *
  * Scale note: hash sampling is embarrassingly parallel (no shuffle, no
  * state); at 100 TB it costs one scan pass and nothing else.
  */
object Sampling {
  val Seed = 42

  /** Stable bucket in [0,100) from a key column. */
  def hashBucket(key: Column, seed: Int = Seed): Column =
    pmod(xxhash64(key, lit(seed)), lit(100L))

  /** Keep ~pct% of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int, seed: Int = Seed): DataFrame =
    df.filter(hashBucket(col(keyCol), seed) < lit(pct.toLong))

  /** Modulo sampler on an integral key — used for oracle-parity queries
    * (DuckDB has no xxhash64; `k % 100` is engine-portable). Same shape,
    * weaker mixing; only for keys that are already ~uniform. */
  def modSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(100L)) < lit(pct.toLong))

  /** Domain-mixture sampler: per-stratum keep percentages (source →
    * pct) — the knob a pretraining mix uses to up/down-weight domains
    * deterministically. Strata missing from the map keep `defaultPct`.
    * Same engine-portable modulo contract as [[modSample]]; a when-chain
    * over the (small) strata map, embarrassingly parallel, no shuffle,
    * predicate pushes below downstream joins. */
  def stratifiedModSample(df: DataFrame, keyCol: String, strataCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(pmod(col(keyCol), lit(100L)) < pct.cast("long"))
  }
}
