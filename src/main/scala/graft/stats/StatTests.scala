package graft.stats

/** Driver-side statistical tests over already-aggregated counts.
  *
  * The reference calls SciPy on tiny inputs: one-sided Fisher exact per
  * whale (feature,target) pair (`eda_workspace/public_eda_pipeline.py:641`)
  * and the point-biserial p-value (`P:303`, via `scipy.stats
  * .pointbiserialr`). Both consume a handful of scalars produced by Spark
  * aggregations, so plain Scala functions (not Catalyst expressions) are the
  * right altitude (SURVEY.md §2.8): the distributed engine reduces 100 TB to
  * four counts; the p-value math runs in nanoseconds on the driver.
  */
object StatTests {

  /** Lanczos log-gamma (g=7, n=9), |err| < 1e-13 for x > 0. */
  def logGamma(x: Double): Double = {
    val g = 7.0
    val coef = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = coef(0)
      val t = z + g + 0.5
      var i = 1
      while (i < 9) { a += coef(i) / (z + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  private def logChoose(n: Long, k: Long): Double =
    if (k < 0 || k > n) Double.NegativeInfinity
    else logGamma(n + 1.0) - logGamma(k + 1.0) - logGamma(n - k + 1.0)

  /** Hypergeometric PMF: P(X = k) drawing n from N with K successes. */
  def hypergeomPmf(k: Long, N: Long, K: Long, n: Long): Double = {
    val lp = logChoose(K, k) + logChoose(N - K, n - k) - logChoose(N, n)
    if (lp.isNegInfinity) 0.0 else math.exp(lp)
  }

  /** One-sided (alternative="greater") Fisher exact test on the 2×2 table
    * [[a, b], [c, d]] — P(X >= a) under the hypergeometric null. Matches
    * `scipy.stats.fisher_exact(..., alternative="greater")` as used for
    * whale pairs (`public_eda_pipeline.py:641`). */
  def fisherExactGreater(a: Long, b: Long, c: Long, d: Long): Double = {
    val N = a + b + c + d
    val K = a + b // row-1 total
    val n = a + c // col-1 total
    val kMin = math.max(0L, K + n - N)
    val kMax = math.min(K, n)
    // PMF mode — terms decay monotonically beyond it, enabling early exit.
    val mode = ((K + 1.0) * (n + 1.0) / (N + 2.0)).toLong
    // Sum whichever tail is shorter: P(X>=a) directly, or 1 − P(X<=a−1).
    if (kMax - a <= a - kMin) {
      var k = a
      var p = 0.0
      var stop = false
      while (k <= kMax && !stop) {
        val t = hypergeomPmf(k, N, K, n)
        p += t
        if (k >= mode && t < p * 1e-18) stop = true // underflowed tail
        k += 1
      }
      math.min(1.0, p)
    } else {
      var k = kMin
      var p = 0.0
      while (k < a) { p += hypergeomPmf(k, N, K, n); k += 1 }
      math.min(1.0, math.max(0.0, 1.0 - p))
    }
  }

  /** Regularized incomplete beta I_x(a,b) by continued fraction (Lentz),
    * standard NR form; used for the Student-t CDF. */
  def incompleteBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = logGamma(a + b) - logGamma(a) - logGamma(b) +
      a * math.log(x) + b * math.log(1.0 - x)
    val front = math.exp(lbeta)
    def cf(a: Double, b: Double, x: Double): Double = {
      val eps = 1e-15
      val fpmin = 1e-300
      val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
      var c = 1.0
      var d = 1.0 - qab * x / qap
      if (math.abs(d) < fpmin) d = fpmin
      d = 1.0 / d
      var h = d
      var m = 1
      while (m <= 300) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < eps) return h
        m += 1
      }
      h
    }
    if (x < (a + 1.0) / (a + b + 2.0)) front * cf(a, b, x) / a
    else 1.0 - math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
      b * math.log(1.0 - x) + a * math.log(x)) * cf(b, a, 1.0 - x) / b
  }

  /** Student-t CDF with `df` degrees of freedom. */
  def studentTCdf(t: Double, df: Double): Double = {
    val x = df / (df + t * t)
    val p = 0.5 * incompleteBeta(df / 2.0, 0.5, x)
    if (t > 0) 1.0 - p else p
  }

  /** Two-sided p-value for a Pearson / point-biserial correlation r on n
    * samples, via the exact t-transform t = r·√((n−2)/(1−r²)) — the same
    * statistic SciPy's `pointbiserialr` reports (`public_eda_pipeline
    * .py:303`). */
  def corrPValue(r: Double, n: Long): Double = {
    if (n < 3 || r.isNaN) return Double.NaN
    val rr = math.max(-0.9999999999, math.min(0.9999999999, r))
    val t = rr * math.sqrt((n - 2).toDouble / (1.0 - rr * rr))
    2.0 * (1.0 - studentTCdf(math.abs(t), (n - 2).toDouble))
  }
}
