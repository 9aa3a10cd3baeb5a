package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for the DuckDB-oracle contract.
  *
  * The driver hash-compares our parquet output against DuckDB evaluating
  * `SparkEntry.oracleSql` on the same tables. Double-precision SUM/AVG are
  * accumulation-order dependent, so a naive `sum(double)` will not match
  * bitwise across engines (or even across Spark runs with AQE). The fix:
  * route every many-row floating aggregate through an exact DECIMAL
  * accumulation and cast the final (exact) value back to DOUBLE — both
  * engines round a double to DECIMAL(p,s) identically (half away from
  * zero; verified empirically for Spark HALF_UP vs DuckDB), and the same
  * exact decimal converts to the same double.
  *
  * O(1)-magnitude statistics whose math is not decimal-expressible
  * (corr, stddev, quantile interpolation, AUC) instead get `round(x, 6)`
  * on BOTH sides: their cross-engine fp error is ~1e-12 relative, so a
  * 1e-6 grid misses a rounding boundary with overwhelming probability.
  *
  * Each Spark-side helper has a string twin that emits the equivalent
  * ANSI SQL for the oracle, so the two sides cannot drift.
  */
object Det {
  val Prec = 27
  val Scale = 6

  /** Binary half-up 6-decimal round — DuckDB's ROUND(double, 6)
    * semantics reproduced op-for-op (std::round(x·10⁶)/10⁶, half away
    * from zero on the PRODUCT double; valid for the non-negative
    * bounded-magnitude scores this is used on). Spark's own `round`
    * rounds the value's SHORTEST DECIMAL REPR instead
    * (BigDecimal(Double.toString)), so the two engines disagree
    * exactly when a double's shortest repr lands on a …5 tie at the
    * 7th significant decimal — found by the r16 sf0.1 full-Verify
    * sweep (x31 doc 2240: quality repr '0.5203125', Spark .520313 vs
    * DuckDB .520312; the binary value is BELOW the boundary). Rule:
    * ratio/score doubles that feed a plain-ROUND oracle use THIS
    * helper; decimal-exact aggregates keep `round` (a DECIMAL(…,6)
    * value cannot tie at the 6th decimal). */
  def round6Bin(c: Column): Column =
    floor(c * lit(1.0e6) + lit(0.5)).cast(DoubleType) / lit(1.0e6)

  /** Sign-aware sibling of [[round6Bin]] for SIGNED statistics (z, t):
    * `floor(x·10⁶+0.5)` is half-away-from-zero only for x ≥ 0 (on a
    * negative tie it rounds toward +∞), so signed values route through
    * |x| and reattach the sign by multiplication. `signum` (not a
    * `when`) so that a negative value rounding to zero yields −0.0 —
    * exactly what DuckDB's ROUND emits there (verified:
    * ROUND(-1e-7::DOUBLE, 6) → -0.0); sign-multiplication is IEEE-exact,
    * so nonzero magnitudes are bit-identical to round6Bin's. */
  def round6BinSigned(c: Column): Column =
    round6Bin(abs(c)) * signum(c)

  /** Exact sum of a double column: decimal-accumulate, emit double. */
  def sumExact(c: Column): Column =
    sum(c.cast(DecimalType(Prec, Scale))).cast(DoubleType)

  def sumExactSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL($Prec,$Scale))) AS DOUBLE)"

  /** Exact avg (null-skipping, like SQL AVG): exact sum / non-null count. */
  def avgExact(c: Column): Column =
    (sum(c.cast(DecimalType(Prec, Scale))).cast(DoubleType) / count(c))

  def avgExactSql(expr: String): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL($Prec,$Scale))) AS DOUBLE) / COUNT($expr))"

  /** Population stddev from exact decimal sums: all inputs to the final
    * double arithmetic are bit-identical across engines, so the result
    * is too (no rounding needed). */
  def stdExact(c: Column): Column = {
    val sx = sum(c.cast(DecimalType(Prec, Scale))).cast(DoubleType)
    val sxx = sum((c * c).cast(DecimalType(Prec, Scale))).cast(DoubleType)
    val n = count(c).cast(DoubleType)
    sqrt(sxx / n - (sx / n) * (sx / n))
  }

  def stdExactSql(x: String): String = {
    val sx = s"CAST(SUM(CAST(($x) AS DECIMAL($Prec,$Scale))) AS DOUBLE)"
    val sxx = s"CAST(SUM(CAST(($x)*($x) AS DECIMAL($Prec,$Scale))) AS DOUBLE)"
    val n = s"CAST(COUNT($x) AS DOUBLE)"
    s"SQRT($sxx/$n - ($sx/$n)*($sx/$n))"
  }

  /** Long sum (exact by construction). */
  def sumLong(c: Column): Column = sum(c.cast(LongType))

  def sumLongSql(expr: String): String = s"CAST(SUM($expr) AS BIGINT)"

  /** Conditional count as BIGINT. */
  def countIf(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  def countIfSql(cond: String): String =
    s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)"
}
