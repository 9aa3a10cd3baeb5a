package graft

import org.apache.spark.sql.functions._
import graft.core.Layout

class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave in plain Scala. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on corners and random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L)) ++
      Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === zRef(x, y, 8), s"($x,$y)") }
    // the named corners pin the bit convention (x even bits, y odd bits)
    val corner = got.take(4).map(_._3)
    assert(corner === Array(0L, 1L, 2L, 65535L))
  }

  test("zValueSql is the same function (Spark evaluates the SQL twin identically)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(300)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)).toDF("x", "y")
    df.createOrReplaceTempView("zpts")
    val mismatches = spark.sql(
      s"SELECT x, y, ${Layout.zValueSql("x", "y", 8)} AS zsql FROM zpts")
      .withColumn("zcol", Layout.zValue(col("x"), col("y"), 8))
      .where(col("zsql") =!= col("zcol")).count()
    assert(mismatches === 0)
  }

  test("zorderBy yields disjoint sorted z-runs (the file-skipping precondition)") {
    import spark.implicits._
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), floor(col("id") / 64).cast("long").as("y"))
    val parts = 16
    val bounds = Layout.partitionBounds(
      Layout.zorderBy(df, "x", "y", bits = 6, numPartitions = parts)
        .withColumn("z", Layout.zValue(col("x"), col("y"), 6)),
      Seq("z"))
      .orderBy(col("min_z")).collect()
    assert(bounds.map(_.getLong(bounds.head.fieldIndex("n_rows"))).sum === 4096L)
    // consecutive partitions cover disjoint z-ranges
    bounds.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_z") < b.getAs[Long]("min_z"),
          s"overlapping z-ranges: $a vs $b")
      case _ =>
    }
  }

  test("z-layout prunes 2-D box queries that a 1-D sort cannot") {
    import spark.implicits._
    // uniform 64x64 grid, 16 output partitions
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), floor(col("id") / 64).cast("long").as("y"))
    val parts = 16

    def touchedFraction(layout: org.apache.spark.sql.DataFrame): Double = {
      val b = Layout.partitionBounds(layout, Seq("x", "y")).collect()
      // 16 query boxes of 16x16 cells tiling the grid diagonal-ish
      val boxes = for (i <- 0 until 4; j <- 0 until 4)
        yield (i * 16L, i * 16L + 15L, j * 16L, j * 16L + 15L)
      val touched = boxes.map { case (x0, x1, y0, y1) =>
        b.count { r =>
          val (mnx, mxx) = (r.getAs[Long]("min_x"), r.getAs[Long]("max_x"))
          val (mny, mxy) = (r.getAs[Long]("min_y"), r.getAs[Long]("max_y"))
          mxx >= x0 && mnx <= x1 && mxy >= y0 && mny <= y1
        }
      }.sum
      touched.toDouble / (boxes.size * parts)
    }

    val zFrac = touchedFraction(
      Layout.zorderBy(df, "x", "y", bits = 6, numPartitions = parts))
    val xFrac = touchedFraction(
      df.repartitionByRange(parts, col("x")).sortWithinPartitions("x"))

    // x-sort: an x-box hits ~1/4 of partitions but EVERY y-range spans all
    // of them -> ~25% touched. z-order: each partition is a small
    // rectangle, a 16x16 box overlaps only a few -> must beat the 1-D
    // sort by a clear margin.
    assert(zFrac < xFrac * 0.75,
      f"z-layout should prune better: z=$zFrac%.3f vs x-sort=$xFrac%.3f")
    assert(zFrac < 0.25, f"z-layout touched fraction too high: $zFrac%.3f")
  }
}
