package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the physical-plan skeleton (exchanges, joins,
  * scans, windows, codegen spans) of named declared queries and flag
  * plan smells (nested-loop joins, cartesian products) — the
  * ".explain and iterate" loop as a one-liner. DevPlans dumps the full
  * curated PLANS.md evidence; this audits ad-hoc sets during development.
  *
  * Usage: `sbt "runMain graft.PlanAudit q1 q2 ..."` (no args = the
  * queries added most recently, see default list). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val picks =
      if (args.nonEmpty) args.toSeq
      else Seq("x7b_pack_per_stratum", "x39_leakage_safe_split", "t2b_asof_tolerance",
        "dq7_functional_deps", "dq8_referential_integrity", "w14_distribution_windows",
        "st12_stream_anomaly")
    picks.foreach { q =>
      println(s"\n===== $q =====")
      try {
        val df = SparkEntry.queries(q)(spark, d)
        val plan = df.queryExecution.executedPlan.toString
        val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
          .filter(plan.contains)
        println(plan.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Join") || l.contains("Scan parquet") ||
          l.contains("Window") || l.contains("WholeStageCodegen")).take(40).mkString("\n"))
        println(s"-- flags: ${if (bad.isEmpty) "clean" else bad.mkString(",")}")
      } catch { case e: Throwable => println(s"ERR ${e.getMessage.take(200)}") }
    }
    spark.stop()
  }
}
