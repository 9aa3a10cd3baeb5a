package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the properties that matter at 100 TB —
  * pushdown reaching the scan, broadcast for small dims, partial
  * aggregation, no single-partition stages on data paths. Asserted
  * against Spark 4.1.2 plan strings (pinned by build.sbt). */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.queryExecution.executedPlan.toString
  }

  test("s1: filter and projection reach the parquet scan") {
    val p = plan("s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,3.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("j5: small dimension tables broadcast, never shuffled") {
    val p = plan("j5_left_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j2: the hash-sample filter sits below the join, not above it") {
    val df = SparkEntry.queries("j2_join_two")(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the pmod sample predicate must appear in a Filter directly over the
    // relation (pushed through both joins), not post-join
    val lines = optimized.linesIterator.toSeq
    val filterIdx = lines.indexWhere(l => l.contains("pmod") && l.contains("Filter"))
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(filterIdx > joinIdx, s"sample filter should be below the join:\n$optimized")
  }

  test("a6: aggregation is map-side partial then final") {
    val p = plan("a6_groupby_stats")
    assert(p.contains("partial_count"), p)
    assert(p.split("HashAggregate").length >= 3, p) // partial + final
  }

  test("w4/a19: decile and whale rank have no single-partition stage on the data path") {
    for (name <- Seq("w4_decile", "a19_whale_contingency")) {
      val p = plan(name)
      // the data path ranks via one range shuffle (explicit count)...
      assert(p.contains("REPARTITION_BY_NUM"), s"$name missing range shuffle:\n$p")
      // ...and the old global ntile/row_number windows are gone: any
      // remaining SinglePartition exchange must sit directly above a
      // HashAggregate (the ≤ nPart-row offset partials / final agg), never
      // above a scan or sort of the data
      val lines = p.linesIterator.toSeq
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).foreach {
        case (_, i) =>
          val child = lines.drop(i + 1).headOption.getOrElse("")
          assert(child.contains("HashAggregate"),
            s"$name single-partition exchange over non-aggregate data:\n$p")
      }
      // no unpartitioned window over anything but the tiny offset frame
      assert(!p.contains("ntile"), s"$name still uses a global ntile:\n$p")
    }
  }

  test("x12: the mixture-sampling predicate reaches the parquet scan") {
    val p = plan("x12_domain_mix")
    // the when-chain over strata compiles to a single pushable filter —
    // at 100 TB this is scan-time row pruning, not a post-scan filter stage
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(p.contains("PushedFilters:"), p)
    assert(p.linesIterator.exists(l => l.contains("Filter") && l.contains("CASE")), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(scanLine.nonEmpty)
  }

  test("x11: decontamination joins by shingle, eval dictionary broadcast") {
    val p = plan("x11_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("a17: AUC has no unpartitioned window over the data path") {
    val df = SparkEntry.queries("a17_auc")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // windows exist only over pid-partitioned or tiny offset frames
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(l => l.contains("pid") || l.contains("windowspecdefinition(pid")
      || !l.contains("windowspecdefinition()")), p)
  }
}
