package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Pins Similarity.assignToCentroids (n24's incremental-IVF fold):
  * Euclidean argmin against the frozen centroid table, lowest cell
  * index on exact ties — the determinism that makes the incremental
  * fold and a recompute against the same centroids agree row-exactly. */
class AssignCentroidsSpec extends SparkSpec {

  private val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0), Array(0.0, 10.0))

  private def assign(rows: Seq[(Long, Seq[Double])]): Map[Long, Int] = {
    val s = spark; import s.implicits._
    Similarity.assignToCentroids(
        rows.toDF("vec_id", "embedding"), cents, "vec_id", "embedding")
      .select(col("corpus_id"), col("cell"))
      .as[(Long, Int)].collect().toMap
  }

  test("nearest centroid wins; exact ties break to the lowest cell index") {
    val out = assign(Seq(
      (1L, Seq(1.0, 1.0)),    // nearest (0,0) → cell 0
      (2L, Seq(9.0, 9.0)),    // nearest (10,10) → cell 1
      (3L, Seq(1.0, 9.0)),    // nearest (0,10) → cell 2
      (4L, Seq(5.0, 5.0)),    // equidistant to ALL three? (0,0):50, (10,10):50, (0,10):50 → tie → cell 0
      (5L, Seq(0.0, 5.0))))   // tie between (0,0) and (0,10) at 25 → cell 0
    assert(out(1L) == 0 && out(2L) == 1 && out(3L) == 2)
    assert(out(4L) == 0, s"three-way tie must take the lowest index, got ${out(4L)}")
    assert(out(5L) == 0, s"two-way tie must take the lowest index, got ${out(5L)}")
  }

  test("dimension mismatch fails fast with a clear message, never a wrong cell") {
    // A longer vector used to throw ArrayIndexOutOfBounds mid-kernel; a
    // SHORTER one silently scored a prefix distance and returned a wrong
    // assignment — the worse failure. Both must now fail the job with
    // the explicit dim-mismatch message.
    for (bad <- Seq(Seq(1.0), Seq(1.0, 2.0, 3.0))) {
      val e = intercept[Exception] { assign(Seq((1L, bad))) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("vector dim")), e.toString)
    }
  }

  test("assignment is invariant to partitioning (map-only, no order dependence)") {
    val s = spark; import s.implicits._
    val rows = (0L until 60L).map(i => (i, Seq((i % 11).toDouble, (i % 7).toDouble)))
    val base = assign(rows)
    val repart = Similarity.assignToCentroids(
        rows.toDF("vec_id", "embedding").repartition(7), cents, "vec_id", "embedding")
      .select(col("corpus_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(repart == base)
  }
}
