package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile

/** Structural guard for the exact-percentile OOM class (the shape that
  * has now appeared three times: a21, h7, a26): Spark's built-in exact
  * `percentile`/`median` collects EVERY input value into its aggregation
  * buffer, so feeding it an unaggregated (row-scale) frame with few
  * groups concentrates the whole table into a handful of buffers —
  * measured heap-dead at 60M rows / 3 groups (DevScale gates12b). The
  * scale-safe alternatives are Relational.weightedQuantiles (histogram-
  * compressed, spillable-sort state) or approx_percentile/KLL.
  *
  * This spec walks every declared query's OPTIMIZED logical plan and
  * fails on any exact-Percentile aggregate whose input is not already an
  * aggregated frame (an Aggregate in the child subtree means the buffer
  * holds group-count-scale data, not row-scale data — e.g. percentiles
  * over per-key counts of a groupBy output are fine). Built-in `median`
  * optimizes to Percentile(0.5), so it is covered by the same match.
  *
  * A query may ONLY appear in the allowlist with a written justification
  * — the point of the guard is that the fourth recurrence of this class
  * becomes a red test, not a judge finding. */
class PercentileGuardSpec extends SparkSpec {

  /** Documented exact-parity pins, each with its reason to exist. */
  private val allow: Map[String, String] = Map(
    // deliberate global exact-percentile pin for cross-engine
    // interpolated-percentile parity on the bounded orders table; the
    // approx twins h3/h4 are the 100 TB path (see a12's scale caveat)
    "a12_quantile" -> "documented exact-parity pin, approx twins h3/h4")

  // Streaming queries replay real micro-batch streams inside their
  // constructors (seconds each) and their DECLARED frames are scans of
  // the stream's output — there is no percentile visible to this walk;
  // excluded for suite-time, not for safety.
  private def walkable(name: String): Boolean = !name.startsWith("st")

  private def offendingAggs(plan: LogicalPlan): Seq[Aggregate] =
    plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
            case _: Percentile => true
            case e => e.getClass.getSimpleName == "Median"
          }) && a.child.collectFirst { case c: Aggregate => c }.isEmpty =>
        a
    }

  test("no declared query feeds an unaggregated frame into exact percentile/median") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val broken = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries if walkable(name) && !allow.contains(name)) {
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        if (offendingAggs(plan).nonEmpty) offenders += name
      } catch {
        case e: Throwable => broken += s"$name (${e.getClass.getSimpleName})"
      }
    }
    assert(broken.isEmpty,
      s"queries failed to build at sf0.001 — guard could not inspect them: $broken")
    assert(offenders.isEmpty,
      s"exact percentile/median over an unaggregated frame (the a21/h7/a26 " +
        s"OOM class) in: ${offenders.mkString(", ")} — rewrite on " +
        "Relational.weightedQuantiles or add a justified allowlist entry")
  }

  test("the allowlisted pin still exists and still uses exact percentile (allowlist stays honest)") {
    for ((name, _) <- allow) {
      assert(SparkEntry.queries.contains(name), s"allowlisted query $name no longer declared")
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
      assert(offendingAggs(plan).nonEmpty,
        s"$name no longer trips the guard — remove its allowlist entry")
    }
  }
}
