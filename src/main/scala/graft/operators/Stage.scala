package graft.operators

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame

/** Stage materialization for multi-branch operator plans.
  *
  * Sketch operators (MinHash/SimHash/LSH) compute a narrow scalar frame
  * that feeds several plan branches (banding + signature join-backs);
  * without materialization every branch re-scans and re-hashes the full
  * corpus. Round 1/2 used `persist()`, which leaks cached blocks into the
  * caller's session until the GC-driven ContextCleaner gets around to
  * them — the round-1 "84 s anomaly" and a standing hazard in any
  * long-lived session.
  *
  * Round 3 replaces the cache with a **stage checkpoint**: write the
  * scalar frame once to parquet, hand every branch a fresh scan of that
  * file. This is exactly the production shape at 100 TB (checkpoint the
  * signatures, not the text), costs no executor memory, keeps each
  * invocation self-contained (no cross-query or cross-rep cache reuse),
  * and the columnar scans are column-pruned per branch for free.
  *
  * The stage directory defaults to `java.io.tmpdir` and is deleted on
  * JVM exit; on a cluster set `spark.graft.stageDir` to a shared
  * filesystem path (HDFS/S3) via the Spark conf.
  */
object Stage {

  private val cleanup = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  sys.addShutdownHook {
    cleanup.forEach { p =>
      try {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { val _ = Files.deleteIfExists(f) })
      } catch { case _: Throwable => }
    }
  }

  /** Materialize `df` to a one-off parquet stage and return a scan of it.
    * The write is the only pass over `df`'s lineage; every downstream
    * branch reads the (small, scalar-only) staged file instead.
    */
  def materialize(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val base = spark.conf.getOption("spark.graft.stageDir")
    val dir = base match {
      case Some(b) =>
        s"$b/graft_stage_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
      case None =>
        val p = Files.createTempDirectory(s"graft_stage_$tag")
        cleanup.add(p)
        p.resolve("data").toString
    }
    df.write.mode("overwrite").parquet(dir)
    // the schema is already known — passing it skips the footer-sniffing
    // schema-inference job a bare spark.read.parquet would run
    spark.read.schema(df.schema).parquet(dir)
  }
}
