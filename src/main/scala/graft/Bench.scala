package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line.
  *
  * Measurement discipline (round-3):
  *  - each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and
  *    reports the MEDIAN — for even rep counts the two middle values are
  *    averaged (round-2 reported the MAX of two reps, which booked
  *    first-run JIT/codegen as a "regression");
  *  - one untimed global warmup action first so session startup doesn't
  *    land on whichever query runs first;
  *  - queries run in sorted name order for run-to-run comparability;
  *  - NO cache clearing between queries: operators own their cache
  *    lifecycle (persist → materialize → unpersist inside the operator),
  *    so nothing squats on executor memory across queries;
  *  - the JSON line is kept compact (times rounded to 4 decimals, no
  *    per-query spread map) so it survives the driver's bounded tail
  *    capture intact — round-2's line was truncated mid-JSON and the
  *    driver recorded parsed:null.
  *
  * SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run (local iteration).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = only match {
      case Some(keep) => SparkEntry.queries.filter(kv => keep(kv._1))
      case None => SparkEntry.queries
    }
    try { SparkEntry.queries("q1_agg")(spark, sfDir).count() }
    catch { case _: Throwable => }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed += name }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median: average the two middle values for even rep counts
      val median =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      (name, median)
    }
    def r4(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qJson = results.map { case (k, v) => s"\"$k\":${r4(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a failing query must not hide inside a fast-looking timing
    val errJson = failed.distinct.sorted
      .map(n => "\"" + n + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${r4(total)},"unit":"sec","reps":$reps,"failed":$errJson,"queries":$qJson,"sf":"$sfDir"}"""
    println(line)
    // the driver's bounded tail capture truncated round-2/3 runs
    // mid-JSON (alphabetically-first queries and the total were lost);
    // the full artifact also lands on disk so every round is comparable
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Exception => () } // bench result > artifact write
    spark.stop()
  }
}
