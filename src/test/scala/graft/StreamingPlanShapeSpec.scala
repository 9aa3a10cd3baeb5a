package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.streaming.EventStream

/** Closes the streaming blind spot in the join-shape audit: the
  * `st*` queries replay real micro-batch streams inside their
  * constructors, and their DECLARED frames are scans of the replay's
  * output — so JoinShapeGuardSpec's walk over declared plans never sees
  * the joins that actually run per micro-batch (the fold-vs-state join
  * in every MV runner, the probe-vs-index join in the ingest runners).
  *
  * This spec hooks [[EventStream.batchPlanProbe]] — a test-only
  * callback every `foreachBatch` runner offers its per-batch derived
  * frame's PHYSICAL plan before writing — runs every declared streaming
  * query once, and fails on BroadcastNestedLoopJoin / CartesianProduct
  * in ANY captured micro-batch plan or in the declared (post-replay)
  * frame itself. Memory-sink streams (windowed aggs, sessionization)
  * have no foreachBatch side; their incremental plans contain only
  * stateful aggs over one input — the declared-frame check still runs
  * for them.
  *
  * A floor on the number of probed plans keeps the hook honest: if a
  * refactor drops the probeBatchPlan call, this spec goes red rather
  * than silently auditing nothing. */
class StreamingPlanShapeSpec extends SparkSpec {

  private def banned(plan: SparkPlan): Seq[String] =
    plan.collect {
      case j: BroadcastNestedLoopJoinExec => j.nodeName
      case j: CartesianProductExec => j.nodeName
    }

  test("no streaming micro-batch plan contains a BroadcastNestedLoopJoin or CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val broken = scala.collection.mutable.ArrayBuffer[String]()
    var probedQueries = 0
    var probedPlans = 0
    for ((name, fn) <- SparkEntry.queries if name.startsWith("st")) {
      val captured = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
      EventStream.batchPlanProbe.set(p => { captured.add(p); () })
      try {
        val declared = fn(spark, dir)
        val declaredHits = banned(declared.queryExecution.sparkPlan)
        import scala.jdk.CollectionConverters._
        val batchHits = captured.asScala.toSeq.flatMap(banned)
        if (captured.size() > 0) { probedQueries += 1; probedPlans += captured.size() }
        val hits = (declaredHits ++ batchHits).distinct
        if (hits.nonEmpty)
          offenders += s"$name (${hits.mkString("/")}; ${captured.size()} batch plans audited)"
      } catch {
        case e: Throwable => broken += s"$name (${e.getClass.getSimpleName})"
      } finally {
        EventStream.batchPlanProbe.set(null)
      }
    }
    assert(broken.isEmpty,
      s"streaming queries failed to replay at sf0.001 — audit could not inspect them: $broken")
    assert(offenders.isEmpty,
      s"banned join shape in streaming micro-batch or declared plans: ${offenders.mkString(", ")}")
    // the foldMvReplay family (st9, st15, st17–st24) and the two ingest
    // runners (st10, st11) all route through the probe; each replays
    // >= 2 micro-batches. If fewer than 12 queries or 24 plans were
    // captured, the hook has been disconnected from a runner.
    assert(probedQueries >= 12 && probedPlans >= 24,
      s"only $probedQueries streaming queries / $probedPlans micro-batch plans were " +
        "probed — a foreachBatch runner no longer calls EventStream.probeBatchPlan")
  }
}
