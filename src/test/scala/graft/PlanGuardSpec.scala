package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}

/** Repo-wide scale guard: NO registered query may plan a window with an
  * empty partition spec. An unpartitioned window ("WindowExec: No
  * Partition Defined" at runtime) funnels the ENTIRE input through one
  * task's sort — the canonical silent 100 TB scale-killer, invisible at
  * gate SF. The two historical offenders were restructured instead of
  * allowlisted: text_colloc now ranks via TakeOrderedAndProject + a
  * bounded pack-sort-explode (operators/Corpus.collocations), and
  * layout_zorder buckets via GlobalRank.withNtile (distributed
  * two-phase ranking). The allowlist below must stay empty or carry an
  * inline justification proving the window's input is bounded
  * independent of data scale.
  */
class PlanGuardSpec extends SparkFunSuite {

  private val allowlist: Set[String] = Set.empty

  test("no registered query plans an unpartitioned window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (allowlist(name)) None
        else {
          val plan =
            try fn(spark, sfDir).queryExecution.optimizedPlan
            catch {
              case e: Throwable =>
                fail(s"$name failed to build/plan at $sfDir: $e")
            }
          val bad = plan.collect {
            case w: Window if w.partitionSpec.isEmpty =>
              w.nodeName
            case w: WindowGroupLimit if w.partitionSpec.isEmpty =>
              w.nodeName
          }
          if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
        }
    }
    assert(offenders.isEmpty,
      "unpartitioned windows (ONE task sorts the full input at scale):\n" +
        offenders.mkString("\n"))
  }
}
