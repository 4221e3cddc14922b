package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line.
  *
  * Measurement discipline (round-2): each query runs
  * SPARK_GRAFT_BENCH_REPS times (default 3) and reports the MEDIAN, so
  * a single GC pause or JIT warm-up can't masquerade as a regression;
  * per-query spread (max-min) is emitted alongside. One untimed global
  * warmup action first so session/codegen startup (~5 s) doesn't land
  * on whichever query runs first; queries run in sorted name order for
  * run-to-run comparability; the cache is cleared after each query so
  * persisted frames (LSH bucket frames etc.) can't squat on executor
  * memory and distort later queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    try { qs("q1_agg")(spark, sfDir).count() } catch { case _: Throwable => }
    spark.catalog.clearCache()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed += name }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.sorted
      val median = times(times.size / 2)
      (name, median, times.last - times.head)
    }
    def m(f: ((String, Double, Double)) => (String, Double)) =
      results.map(f).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val qJson = m { case (k, v, _) => (k, v) }
    val sJson = m { case (k, _, s) => (k, s) }
    val total = results.map(_._2).sum
    // a failing query must not hide inside a fast-looking timing
    val errJson = failed.distinct.sorted
      .map(n => "\"" + n + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"failed":$errJson,"queries":$qJson,"spread":$sJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
