package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan,
  Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** One detected scale hazard in a logical plan. */
final case class GuardViolation(rule: String, detail: String) {
  override def toString: String = s"[$rule] $detail"
}

/** The repo's scale-conformance rules (PlanGuardSpec) shipped as a
  * LIBRARY feature: an optimizer-injected audit that flags the silent
  * 100 TB scale-killers in ANY user query on a session built with
  * `spark.sql.extensions=graft.GraftExtensions`, not just the queries
  * this repo registers. Two structural rules, both provable from the
  * plan alone (no data luck):
  *
  *  1. **Unpartitioned window** — an empty-partition-spec window sorts
  *     the entire input through ONE task ("WindowExec: No Partition
  *     Defined"): invisible at test SF, fatal at scale. Allowed when
  *     the plan itself proves the input is bounded (global aggregate →
  *     1 row, limit k → k rows).
  *  2. **Unbounded cartesian** — a condition-less join where NEITHER
  *     side carries a plan-proven row ceiling is quadratic; the
  *     legitimate shape (broadcasting a grand-total/one-row aggregate)
  *     passes the same `maxRows` proof.
  *
  * The audit is injected pre-CBO (injectPreCBORule): it runs exactly
  * once per query, AFTER the fixed-point operator-optimization batches
  * — predicate pushdown has extracted join conditions by then, so a
  * `a.join(b).where(a.x === b.y)` equi-join is never a false positive
  * (an analysis-time check would misfire on exactly that shape).
  *
  * Modes (`spark.graft.guard.mode`): `warn` (default — log and
  * continue), `error` (fail the query), `off`. The bound proof
  * threshold is `spark.graft.guard.boundedRows` (default 1000 — the
  * scale at which a broadcast cross product is still free).
  *
  * `ScaleGuard.validate(df)` exposes the same audit as a callable for
  * CI pipelines that want the violations list rather than log lines —
  * PlanGuardSpec pins this repo's own 200+ queries through the
  * identical logic.
  */
object ScaleGuard {
  val ModeKey = "spark.graft.guard.mode"
  val BoundedKey = "spark.graft.guard.boundedRows"
  val DefaultBounded = 1000L

  def violations(plan: LogicalPlan,
                 boundedMax: Long = DefaultBounded): Seq[GuardViolation] = {
    def bounded(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= boundedMax)
    val out = Seq.newBuilder[GuardViolation]
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
        out += GuardViolation("unpartitioned-window",
          s"window [${w.windowExpressions.map(_.name).mkString(", ")}] " +
            "has no PARTITION BY and its input has no plan-proven row " +
            "bound: the whole input funnels through one task's sort. " +
            "Partition the window, or bound the input (aggregate/limit).")
      case w: WindowGroupLimit if w.partitionSpec.isEmpty &&
          !bounded(w.child) =>
        out += GuardViolation("unpartitioned-window",
          "rank-limit window (WindowGroupLimit) has no PARTITION BY " +
            "and its input has no plan-proven row bound.")
      case j: Join if j.condition.isEmpty &&
          !bounded(j.left) && !bounded(j.right) =>
        out += GuardViolation("unbounded-cartesian",
          s"condition-less ${j.joinType} join with neither side " +
            s"plan-bounded to <= $boundedMax rows: quadratic work. " +
            "Add a join condition or bound one side (aggregate/limit).")
      case _ => ()
    }
    out.result()
  }

  /** Audit a DataFrame/Dataset's OPTIMIZED plan (join conditions
    * already extracted from trailing filters). Empty result = clean.
    */
  def validate(df: Dataset[_]): Seq[GuardViolation] =
    violations(df.queryExecution.optimizedPlan)
}

/** The injectable rule — returns the plan unchanged, throwing or
  * logging per the session's `spark.graft.guard.mode`.
  */
case class ScaleGuardRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = session.conf.get(ScaleGuard.ModeKey, "warn")
    if (mode != "off") {
      val boundedMax =
        session.conf.get(ScaleGuard.BoundedKey,
          ScaleGuard.DefaultBounded.toString).toLong
      val vs = ScaleGuard.violations(plan, boundedMax)
      if (vs.nonEmpty) {
        val msg = s"graft scale guard: ${vs.mkString("; ")}"
        if (mode == "error") throw new SparkException(msg)
        else logWarning(msg)
      }
    }
    plan
  }
}
