package graft

import graft.core.Merge
import org.apache.spark.sql.DataFrame

/** Pins Merge.firstSeenNew's contract: appending each batch's returned
  * new-rows to the state reconstructs exactly distinct(∪ batches) — in
  * ANY batch order — and every returned row is genuinely unseen
  * (disjoint from the state it was folded against). u6 verifies the
  * same identity against the DuckDB oracle on real events. */
class FirstSeenFoldSpec extends SparkSpec {

  private val cols = Seq("t", "u")

  private def df(rows: Seq[(String, Long)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("t", "u")
  }

  private def rows(d: DataFrame): Set[(String, Long)] = {
    val s = spark; import s.implicits._
    d.select("t", "u").as[(String, Long)].collect().toSet
  }

  test("fold reconstructs distinct(∪ batches) over random splits and orders, new rows always unseen") {
    val rnd = new scala.util.Random(7)
    val types = Array("a", "b", "c")
    // heavy duplication: 300 draws over a 3×20 key space
    val data = Seq.fill(300)((types(rnd.nextInt(3)), rnd.nextInt(20).toLong))
    for (trial <- 0 until 5) {
      val nb = 2 + rnd.nextInt(4)
      val batches = rnd.shuffle(data.groupBy(_ => rnd.nextInt(nb)).values.toSeq)
      var state = rows(df(batches.head).distinct())
      batches.tail.foreach { b =>
        val fresh = rows(Merge.firstSeenNew(df(state.toSeq), df(b), cols))
        assert(fresh.intersect(state).isEmpty, s"trial $trial returned an already-seen row")
        assert(fresh.subsetOf(b.toSet), s"trial $trial invented a row not in the batch")
        state = state ++ fresh
      }
      assert(state == data.toSet, s"trial $trial state ≠ distinct of all batches")
    }
  }

  test("batch fully contained in state yields zero new rows") {
    val st = Seq(("a", 1L), ("b", 2L))
    assert(rows(Merge.firstSeenNew(df(st), df(st ++ st), cols)).isEmpty)
  }
}
