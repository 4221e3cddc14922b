package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.operators.{Skyline, Stage}

/** The Stage disk-lifecycle contract as a CHECKED invariant (round-9
  * scaladoc guidance, round-10 task): stage directories are one-off per
  * invocation, so a long-lived session's scratch disk grows with
  * invocation count — but `Stage.purge` between logically-independent
  * jobs must hold it steady, and purge must leave later invocations
  * fully functional.
  */
class StageLifecycleSpec extends SparkFunSuite {
  import spark.implicits._

  private def stageDirCount(): Long = {
    val tmp = Path.of(System.getProperty("java.io.tmpdir"))
    val s = Files.list(tmp)
    try s.filter(p => p.getFileName.toString.startsWith("graft_stage_"))
      .count()
    finally s.close()
  }

  test("a purge-between-invocations loop holds scratch disk steady") {
    // drain anything earlier suites staged, then loop a staging
    // operator (frontierSweep materializes its ranged level frame)
    Stage.purge(spark)
    val base = stageDirCount()
    val df = spark.range(2000)
      .select((col("id") % 50).as("mx"), (col("id") % 13).as("mn"))
    var lastRows = -1L
    for (i <- 1 to 6) {
      lastRows = Skyline.frontierSweep(df, "mx", "mn").count()
      assert(stageDirCount() > base,
        s"iteration $i: materialize should have staged a directory")
      Stage.purge(spark)
      assert(stageDirCount() === base,
        s"iteration $i: purge left stage directories behind — a long " +
          "loop would grow disk linearly with invocation count")
    }
    assert(lastRows > 0) // the post-purge invocations still compute
  }

  test("purge clears fit-once caches: cached frames never outlive their stages") {
    // plantedDocs/ANN-model caches hold frames scanning staged parquet;
    // purge must clear them (Stage.onPurge) or the next hit reads a
    // deleted directory — this is the exact cross-suite failure a purge
    // mid-session caused before the listener wiring
    val q = SparkEntry.queries("dedup_minhash")
    val before = q(spark, sfDir).count()
    Stage.purge(spark)
    val after = q(spark, sfDir).count()
    assert(after === before)
  }

  test("sim_ann_incr: purge clears the persisted ANN index and the next probe refits") {
    // the incremental-probe contract (r17): the IVF-PQ index persists
    // across probes within a session (fit-once), but a purge deletes
    // its staged (vec_id, cell, code) table — the cache listener must
    // drop the model so the next batch probe refits instead of
    // scanning a deleted directory, and the refit must reproduce the
    // identical (seeded) result
    val q = SparkEntry.queries("sim_ann_incr")
    val before = q(spark, sfDir).collect().map(_.toString).sorted
    assert(before.nonEmpty)
    Stage.purge(spark)
    val after = q(spark, sfDir).collect().map(_.toString).sorted
    assert(after === before,
      "post-purge refit must reproduce the seeded index's probe output")
  }

  test("purge drains caller-tracked local scratch dirs too") {
    Stage.purge(spark)
    val d = Files.createTempDirectory("graft_stage_probe")
    Files.writeString(d.resolve("f.txt"), "x")
    Stage.trackLocal(d.toString)
    Stage.purge(spark)
    assert(!Files.exists(d), "trackLocal dir must be removed by purge")
  }
}
