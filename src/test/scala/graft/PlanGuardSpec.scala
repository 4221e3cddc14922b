package graft

import org.apache.spark.sql.catalyst.expressions.{Rand, Randn, Uuid}
import org.apache.spark.sql.catalyst.expressions.Shuffle
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window,
  WindowGroupLimit}

/** Repo-wide scale-conformance sweeps over EVERY registered query's
  * optimized plan (built once, shared by all checks):
  *
  *  1. **No unpartitioned windows.** An empty-partition-spec window
  *     ("WindowExec: No Partition Defined" at runtime) funnels the
  *     entire input through one task's sort — the canonical silent
  *     100 TB scale-killer, invisible at gate SF. The two historical
  *     offenders were restructured instead of allowlisted: text_colloc
  *     ranks via TakeOrderedAndProject + a bounded pack-sort-explode
  *     (operators/Corpus.collocations), layout_zorder buckets via
  *     GlobalRank.withNtile (distributed two-phase ranking).
  *  2. **Every condition-less join is bounded.** A cross join (plans
  *     as CartesianProduct/BroadcastNestedLoopJoin) is quadratic
  *     unless one side is provably tiny; the only legitimate shape in
  *     this repo is broadcasting a grand-total/one-row aggregate
  *     (text_colloc's nb/nu, perplexity's total). Enforced
  *     structurally via `LogicalPlan.maxRows` — a global aggregate or
  *     limit proves the bound, data luck doesn't.
  *  3. **No rand()-family expressions.** The repo rule is
  *     content-hash determinism (Sampling.contentHash) so task
  *     retries and repartitioning can never change results; a stray
  *     rand()/uuid()/shuffle() silently breaks that and every oracle.
  *
  * Allowlists below must stay empty or carry an inline justification.
  *
  * Relationship to the LIBRARY guard (graft.plans.ScaleGuard, injected
  * by GraftExtensions): rules 1-2 here are the same hazards, but this
  * repo-internal sweep is deliberately STRICTER — it flags EVERY
  * partitionless window regardless of a plan-proven input bound
  * (registered queries must model the distributed shape even when the
  * data happens to be small), where the library guard permits a
  * bounded input so user code over genuinely tiny frames isn't
  * nagged. Keep the two in sync on hazard COVERAGE (ScaleGuardRuleSpec
  * pins the library side), not on leniency.
  */
class PlanGuardSpec extends SparkFunSuite {

  private val windowAllowlist: Set[String] = Set.empty
  private val crossJoinAllowlist: Set[String] = Set.empty
  private val nondetAllowlist: Set[String] = Set.empty

  // a condition-less join side is "bounded" when the plan itself proves
  // a row ceiling (global aggregate → 1, limit k → k); 1000 rows ≈ the
  // scale at which a broadcast cross product is still free
  private val BoundedSideMax = 1000L

  // Build every plan ONCE, collecting failures instead of failing fast:
  // a shared-loader bug (e.g. the round-6 events ts-type drift) breaks
  // dozens of queries at analysis time, and the blast radius must be
  // visible in ONE spec failure, not discovered one query per run.
  private lazy val (planErrors: Seq[(String, String)],
                    plans: Seq[(String, LogicalPlan)]) = {
    val built = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try Right((name, fn(spark, sfDir).queryExecution.optimizedPlan))
      catch { case e: Throwable => Left((name, e.toString)) }
    }
    (built.collect { case Left(e) => e }, built.collect { case Right(p) => p })
  }

  test("every registered query builds an optimized plan against real data") {
    assert(planErrors.isEmpty,
      s"${planErrors.size}/${SparkEntry.queries.size} queries fail to " +
        s"build/plan at $sfDir:\n" +
        planErrors.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }

  test("no registered query plans an unpartitioned window") {
    val offenders = plans.flatMap { case (name, plan) =>
      if (windowAllowlist(name)) None
      else {
        val bad = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w.nodeName
          case w: WindowGroupLimit if w.partitionSpec.isEmpty => w.nodeName
        }
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned windows (ONE task sorts the full input at scale):\n" +
        offenders.mkString("\n"))
  }

  test("every condition-less join proves a bounded side (maxRows)") {
    val offenders = plans.flatMap { case (name, plan) =>
      if (crossJoinAllowlist(name)) None
      else {
        val bad = plan.collect {
          case j: Join if j.condition.isEmpty &&
            !Seq(j.left, j.right)
              .exists(_.maxRows.exists(_ <= BoundedSideMax)) =>
            s"${j.joinType} join, maxRows " +
              s"${j.left.maxRows}/${j.right.maxRows}"
        }
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString("; ")}") else None
      }
    }
    assert(offenders.isEmpty,
      "unbounded cross joins (quadratic blowup at scale):\n" +
        offenders.mkString("\n"))
  }

  test("full ScaleGuard audit: every registered query is clean") {
    // the library-facing guard (graft.plans.ScaleGuard) over the whole
    // registry — strictly wider than the two structural tests above
    // since round 9: equality-free join conditions (nested-loop plans)
    // and record-retaining (flat)mapGroupsWithState state are flagged
    // too. Allowlist entries carry their justification:
    //  - doc_neardup family: per-LSH-bucket state retains (id,
    //    signature) pairs BY DESIGN — bucket occupancy is bounded by
    //    the banding spread, and the retained payload is the 16-long
    //    signature, not the document (DocStreams.scala scaladoc).
    val guardAllowlist: Map[String, String] = Map(
      "stream_neardup" -> "record-retaining-stream-state")
    val offenders = plans.flatMap { case (name, plan) =>
      val vs = graft.plans.ScaleGuard.violations(plan)
        .filterNot(v => guardAllowlist.get(name).contains(v.rule))
      if (vs.nonEmpty) Some(s"$name: ${vs.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      "ScaleGuard violations in registered queries:\n" +
        offenders.mkString("\n"))
  }

  test("no registered query trips a scale advisory") {
    // heuristic advisories: hot-key-window (agg-only window partitioned
    // on a raw scan column — the round-10 Dedup `count(1) OVER
    // (PARTITION BY sh)` shape whose hot key was an exact-clone group)
    // and quadratic-window (aggregate over a shrinking frame — the
    // round-11 ts_interp `first(v) OVER (.. UNBOUNDED FOLLOWING)` shape
    // that recomputed per row). Warn-only in the library; this repo's
    // own registry must be CLEAN of them, the same posture as the
    // unpartitioned-window sweep. An intentional future use must be
    // restructured or allowlisted here with its bound written down.
    val advisoryAllowlist: Map[String, String] = Map.empty
    val offenders = plans.flatMap { case (name, plan) =>
      val as = graft.plans.ScaleGuard.advisories(plan)
        .filterNot(a => advisoryAllowlist.get(name).contains(a.rule))
      if (as.nonEmpty) Some(s"$name: ${as.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      "scale advisories in registered queries:\n" +
        offenders.mkString("\n"))
  }

  test("no registered query plans a rand()-family expression") {
    val offenders = plans.flatMap { case (name, plan) =>
      if (nondetAllowlist(name)) None
      else {
        val bad = plan.flatMap(_.expressions.flatMap(_.collect {
          case e: Rand => e.prettyName
          case e: Randn => e.prettyName
          case e: Uuid => e.prettyName
          case e: Shuffle => e.prettyName
        })).distinct
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
      }
    }
    assert(offenders.isEmpty,
      "nondeterministic sampling (breaks retry/repartition stability " +
        "and every oracle):\n" + offenders.mkString("\n"))
  }
}
