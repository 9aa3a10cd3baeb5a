package graft

import graft.core.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins Merge.topKFold's advertised contract: the maintained top-k state
  * equals a one-shot recompute REGARDLESS of how the input is split into
  * batches or in what ORDER the batches arrive (top-k under a total
  * order is a commutative fold over row sets). Property-tested over
  * seeded random data, random split counts, and shuffled batch order —
  * including rank-boundary ties on the value column (broken by the
  * unique id) and groups smaller than k. u7/st18 verify the same
  * identity against the DuckDB oracle on real tables. */
class TopKFoldSpec extends SparkSpec {

  private val groups = Seq("g")
  private def ord = Seq(col("v").desc, col("id").asc)

  private def df(rows: Seq[(Int, Long, Int)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("g", "id", "v")
  }

  private def rows(d: DataFrame): Set[(Int, Long, Int)] = {
    val s = spark; import s.implicits._
    d.select("g", "id", "v").as[(Int, Long, Int)].collect().toSet
  }

  private def foldAll(batches: Seq[Seq[(Int, Long, Int)]], k: Int): DataFrame =
    batches.tail.foldLeft(
      Merge.topKFold(df(batches.head).limit(0), df(batches.head), groups, ord, k)) {
      (state, b) => Merge.topKFold(state, df(b), groups, ord, k)
    }

  test("fold ≡ recompute over random splits and shuffled batch order") {
    val rnd = new scala.util.Random(42)
    // small value domain (0..9) forces heavy rank-boundary ties; the
    // unique id is the tie-break, so the surviving SET is still unique
    val data = (0L until 200L).map(i => (rnd.nextInt(4), i, rnd.nextInt(10)))
    for (trial <- 0 until 5) {
      val k = 1 + rnd.nextInt(7)
      val nb = 2 + rnd.nextInt(4)
      val batches = rnd.shuffle(data.groupBy(_ => rnd.nextInt(nb)).values.toSeq)
      val oneShot = Merge.topKFold(df(data).limit(0), df(data), groups, ord, k)
      assert(rows(foldAll(batches, k)) == rows(oneShot),
        s"trial $trial (k=$k, ${batches.size} batches) diverged from recompute")
    }
  }

  test("groups smaller than k keep all their rows") {
    val data = Seq((0, 1L, 5), (0, 2L, 3), (1, 3L, 9))
    val out = rows(foldAll(Seq(data.take(1), data.drop(1)), k = 5))
    assert(out == data.toSet)
  }

  test("rank-boundary tie is broken by id, not arrival order") {
    // three rows tie on v=7 at k=2: ids 1 and 2 must survive whichever
    // batch they arrive in
    val a = Seq((0, 3L, 7))
    val b = Seq((0, 1L, 7), (0, 2L, 7))
    val expected = Set((0, 1L, 7), (0, 2L, 7))
    assert(rows(foldAll(Seq(a, b), 2)) == expected)
    assert(rows(foldAll(Seq(b, a), 2)) == expected)
  }
}
