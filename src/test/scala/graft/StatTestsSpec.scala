package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.StatTests._

class StatTestsSpec extends AnyFunSuite {

  test("logGamma matches known values") {
    assert(math.abs(logGamma(5.0) - math.log(24.0)) < 1e-12)      // Γ(5)=24
    assert(math.abs(logGamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-12) // Γ(½)=√π
    assert(math.abs(logGamma(1.0)) < 1e-12)                        // Γ(1)=1
    assert(math.abs(logGamma(10.0) - math.log(362880.0)) < 1e-10)  // Γ(10)=9!
  }

  test("hypergeomPmf sums to 1 over support and matches hand counts") {
    // N=8 draws n=4 with K=4 successes (tea tasting): P(k)=C(4,k)C(4,4-k)/C(8,4)
    val total = (0L to 4L).map(k => hypergeomPmf(k, 8, 4, 4)).sum
    assert(math.abs(total - 1.0) < 1e-12)
    assert(math.abs(hypergeomPmf(3, 8, 4, 4) - 16.0 / 70.0) < 1e-12)
    assert(math.abs(hypergeomPmf(4, 8, 4, 4) - 1.0 / 70.0) < 1e-12)
  }

  test("fisherExactGreater matches hand-computed tables") {
    // Fisher's tea test [[3,1],[1,3]]: P(X>=3) = (16+1)/70
    assert(math.abs(fisherExactGreater(3, 1, 1, 3) - 17.0 / 70.0) < 1e-12)
    // perfect separation [[5,0],[0,5]]: P(X>=5) = 1/C(10,5) = 1/252
    assert(math.abs(fisherExactGreater(5, 0, 0, 5) - 1.0 / 252.0) < 1e-12)
    // a at the minimum of its support → p = 1
    assert(math.abs(fisherExactGreater(0, 5, 5, 0) - 1.0) < 1e-12)
    // short-tail path (large counts) stays in [0,1] and is monotone in a
    val p1 = fisherExactGreater(60, 940, 40, 8960)
    val p2 = fisherExactGreater(80, 920, 40, 8960)
    assert(p1 > 0 && p1 < 1 && p2 < p1)
  }

  test("fisherExactGreater long-tail and short-tail paths agree") {
    // same table evaluated both ways must agree: compare against direct
    // full-support summation
    def brute(a: Long, b: Long, c: Long, d: Long): Double = {
      val N = a + b + c + d; val K = a + b; val n = a + c
      (a to math.min(K, n)).map(k => hypergeomPmf(k, N, K, n)).sum
    }
    for ((a, b, c, d) <- Seq((10L, 40L, 30L, 120L), (2L, 8L, 20L, 70L), (15L, 5L, 10L, 20L))) {
      assert(math.abs(fisherExactGreater(a, b, c, d) - math.min(1.0, brute(a, b, c, d))) < 1e-10,
        s"table ($a,$b,$c,$d)")
    }
  }

  test("studentTCdf matches closed forms") {
    assert(math.abs(studentTCdf(0.0, 5) - 0.5) < 1e-12)
    // df=1 is Cauchy: F(1) = 3/4
    assert(math.abs(studentTCdf(1.0, 1) - 0.75) < 1e-10)
    // df=2 closed form: F(t) = 1/2 + t / (2*sqrt(2+t^2))
    assert(math.abs(studentTCdf(1.0, 2) - (0.5 + 1.0 / (2.0 * math.sqrt(3.0)))) < 1e-10)
    // symmetry
    assert(math.abs(studentTCdf(-1.3, 7) + studentTCdf(1.3, 7) - 1.0) < 1e-12)
  }

  test("corrPValue behaves like the t-transform p-value") {
    assert(math.abs(corrPValue(0.0, 100) - 1.0) < 1e-9)
    assert(corrPValue(0.9999, 1000) < 1e-12)
    assert(corrPValue(0.3, 10) > corrPValue(0.3, 1000)) // more data, smaller p
    assert(corrPValue(0.1, 2).isNaN)                    // n < 3 undefined
    // r=0.5, n=10 → t = 0.5*sqrt(8/0.75) ≈ 1.63299, df=8 → p ≈ 0.141
    assert(math.abs(corrPValue(0.5, 10) - 0.141) < 2e-3)
  }

  test("incompleteBeta basic identities") {
    assert(math.abs(incompleteBeta(2.0, 3.0, 0.0)) < 1e-15)
    assert(math.abs(incompleteBeta(2.0, 3.0, 1.0) - 1.0) < 1e-15)
    // I_x(1,1) = x
    assert(math.abs(incompleteBeta(1.0, 1.0, 0.42) - 0.42) < 1e-12)
    // symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    assert(math.abs(incompleteBeta(2.5, 4.0, 0.3) - (1.0 - incompleteBeta(4.0, 2.5, 0.7))) < 1e-12)
  }
}
