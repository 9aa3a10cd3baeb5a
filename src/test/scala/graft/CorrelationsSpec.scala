package graft

import org.apache.spark.sql.functions._
import graft.stats.Correlations

class CorrelationsSpec extends SparkSpec {

  private def flagFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    Seq.fill(500)((rnd.nextInt(2), rnd.nextInt(2), rnd.nextInt(2), rnd.nextInt(2)))
      .toDF("a", "b", "c", "d")
  }

  test("pairLift agg path and Gramian path agree exactly") {
    val df = flagFrame
    val cols = Seq("a", "b", "c", "d")
    def toMap(r: org.apache.spark.sql.DataFrame) = r.collect().map { row =>
      (row.getString(0), row.getString(1)) ->
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
    }.toMap
    val agg = toMap(Correlations.pairLift(df, cols))
    val gram = toMap(Correlations.pairLiftGramian(df, cols))
    assert(agg.keySet === gram.keySet)
    agg.foreach { case (k, (ca, cb, co, lift)) =>
      val (ga, gb, gco, glift) = gram(k)
      assert(ca === ga && cb === gb && co === gco, s"pair $k")
      assert(math.abs(lift - glift) < 1e-12 || (lift.isNaN && glift.isNaN), s"lift $k")
    }
  }

  test("pairLift on >64 columns routes through the Gramian without error") {
    import spark.implicits._
    val n = 70
    val base = spark.range(200).toDF("id")
    val wide = (0 until n).foldLeft(base) { (d, i) =>
      d.withColumn(s"f$i", (pmod(col("id") + i, lit(3)) === 0).cast("int"))
    }
    val out = Correlations.pairLift(wide, (0 until n).map(i => s"f$i"))
    assert(out.count() === n.toLong * (n - 1) / 2)
  }

  test("small-k corrMatrix agg path matches df.stat.corr pairwise") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val m = Correlations.corrMatrix(li, cols)
    for (i <- cols.indices; j <- cols.indices) {
      if (i == j) assert(math.abs(m(i, j) - 1.0) < 1e-12)
      else {
        val truth = li.stat.corr(cols(i), cols(j))
        assert(math.abs(m(i, j) - truth) < 1e-9, s"(${cols(i)},${cols(j)}): ${m(i, j)} vs $truth")
      }
    }
  }

  test("imputeMeans fills nulls with the column mean, all-null with 0") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)]((1.0, null), (3.0, null), (null, null))
      .toDF("x", "allnull")
    val out = Correlations.imputeMeans(df, Seq("x", "allnull")).collect()
    val xs = out.map(_.getDouble(0)).sorted
    assert(xs.toSeq === Seq(1.0, 2.0, 3.0)) // null → mean(1,3)=2
    assert(out.map(_.getDouble(1)).forall(_ == 0.0))
  }
}
