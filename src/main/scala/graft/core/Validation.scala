package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality validation (the pre-training gate a 100-TB
  * pipeline runs before touching a new drop): every constraint is an
  * aggregate metric plus a pass predicate over it, and ALL metrics
  * evaluate in a SINGLE scan/aggregate of the frame — adding a check
  * costs one expression, not one job. The wide one-row result is melted
  * to the long (check, metric, passed) report shape.
  *
  * Referential checks need a second frame by nature (an anti-join), so
  * they are separate helpers unioned into the same report.
  */
object Validation {

  /** One constraint: an aggregate `metric` (any single-value aggregate
    * expression) and a `pass` predicate applied to the computed value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Ready-made checks mirroring the common Deequ-style suite. */
  def completeness(c: String, atLeast: Double = 1.0): Check =
    Check(s"completeness_$c",
      avg(when(col(c).isNotNull, 1.0).otherwise(0.0)), _ >= atLeast)

  def uniqueness(c: String): Check =
    Check(s"uniqueness_$c",
      countDistinct(col(c)).cast("double") / count(col(c)), _ === 1.0)

  def minBound(c: String, bound: Double): Check =
    Check(s"min_$c", min(col(c)).cast("double"), _ >= bound)

  def maxBound(c: String, bound: Double): Check =
    Check(s"max_$c", max(col(c)).cast("double"), _ <= bound)

  def inDomain(c: String, domain: Seq[String]): Check =
    Check(s"domain_$c",
      sum(when(col(c).isInCollection(domain) || col(c).isNull, 0L).otherwise(1L))
        .cast("double"),
      _ === 0.0)

  /** Evaluate all checks in ONE aggregate pass and melt to
    * (check, metric, passed) — one row per constraint. */
  def constraintReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "constraintReport: no checks given")
    val aggs = checks.map(c => c.metric.cast("double").as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val melted = checks.map(c => struct(
      lit(c.name).as("check"),
      col(c.name).as("metric"),
      c.pass(col(c.name)).as("passed")))
    one.select(explode(array(melted: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity row: count of child keys with no parent
    * (anti-join — the one check that inherently needs a second frame);
    * unioned into the [[constraintReport]] output. */
  def referentialCheck(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String, name: String): DataFrame =
    child.join(parent, col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).cast("double").as("metric"))
      .select(lit(name).as("check"), col("metric"), (col("metric") === 0.0).as("passed"))
}
