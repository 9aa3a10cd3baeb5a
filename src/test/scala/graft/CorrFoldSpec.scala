package graft

import graft.core.Merge
import org.apache.spark.sql.DataFrame

/** Pins Merge.corrPartials/mergeCorrState: decimal co-moment partials
  * folded over ANY batch split/order equal a one-shot build EXACTLY
  * (bit-equal decimals, not approximately), and the derived Pearson r
  * matches a driver-side double-precision reference within rounding.
  * u9 verifies the same identity against the DuckDB oracle on real
  * lineitem. */
class CorrFoldSpec extends SparkSpec {

  private def df(rows: Seq[(String, Double, Double)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("g", "x", "y")
  }

  private def snap(d: DataFrame): Map[String, (Long, BigDecimal, BigDecimal, BigDecimal, BigDecimal, BigDecimal)] = {
    val s = spark; import s.implicits._
    d.select("g", "cnt", "sx", "sy", "sxx", "syy", "sxy")
      .as[(String, Long, BigDecimal, BigDecimal, BigDecimal, BigDecimal, BigDecimal)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
  }

  test("fold ≡ one-shot build bit-exactly over random splits and shuffled batch order") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(300)((if (rnd.nextBoolean()) "a" else "b",
      rnd.nextInt(10000) / 100.0, rnd.nextInt(1000) / 100.0))
    val oneShot = snap(Merge.corrPartials(df(data), Seq("g"), "x", "y"))
    for (trial <- 0 until 4) {
      val nb = 2 + rnd.nextInt(3)
      val batches = rnd.shuffle(data.groupBy(_ => rnd.nextInt(nb)).values.toSeq)
      val folded = batches.tail.foldLeft(
        Merge.corrPartials(df(batches.head), Seq("g"), "x", "y")) { (st, b) =>
        Merge.mergeCorrState(st, Merge.corrPartials(df(b), Seq("g"), "x", "y"), Seq("g"))
      }
      assert(snap(folded) == oneShot, s"trial $trial partials diverged from one-shot")
    }
  }

  test("derived Pearson r matches the driver-side reference") {
    val rnd = new scala.util.Random(13)
    // y correlated with x plus noise so r is well away from 0 and 1
    val data = (0 until 200).map { _ =>
      val x = rnd.nextInt(10000) / 100.0
      ("a", x, 0.5 * x + rnd.nextInt(2000) / 100.0)
    }
    val p = snap(Merge.corrPartials(df(data), Seq("g"), "x", "y"))("a")
    val (n, sx, sy, sxx, syy, sxy) =
      (p._1.toDouble, p._2.toDouble, p._3.toDouble, p._4.toDouble, p._5.toDouble, p._6.toDouble)
    val r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val xs = data.map(_._2); val ys = data.map(_._3)
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val ref = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(r - ref) < 1e-9, s"derived r=$r vs reference $ref")
    assert(r > 0.3 && r < 0.99, s"fixture must exercise a non-degenerate r, got $r")
  }
}
