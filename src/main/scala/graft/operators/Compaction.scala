package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance twin of sink_parquet's
  * write-time repartition discipline (sources/Sinks side of SURVEY §2.1).
  *
  * Why it exists at 100 TB: streaming and incremental ingest land
  * thousands of KB-scale parquet files per partition; every downstream
  * scan then pays one task + one footer read per file, and the
  * NameNode/object-store listing dominates planning. Compaction
  * rewrites a directory into ~`targetBytes` files sized for
  * `spark.sql.files.maxPartitionBytes` (one task ≈ one file ≈ one
  * row-group run), restoring scan parallelism chosen by DATA size
  * rather than arrival history.
  *
  * Mechanics: file count is decided from the LISTED byte size (no data
  * read; the listing is recursive, so hive-partitioned layouts size
  * correctly), the rewrite is one `repartition(n)` pass — a single
  * round-robin shuffle, no driver-side row handling — and the write
  * goes to a fresh directory (atomic swap is the caller's rename; an
  * in-place overwrite that fails mid-write would lose the input).
  * The OUTPUT is a flat directory: partition columns inferred from a
  * hive layout survive as data columns, but the directory structure
  * does not — to keep a partitioned layout, compact each leaf
  * directory (the usual maintenance-job loop) or follow with
  * `.partitionBy` at the cost of a second shuffle.
  */
object Compaction {

  final case class Stats(filesBefore: Long, bytes: Long, filesAfter: Long)

  /** Rewrite parquet dir `in` as ~`targetBytes`-sized files in `out`
    * (fresh directory). Returns before/after file stats.
    */
  /** RECURSIVE parquet file census (count, bytes) — a hive-partitioned
    * layout keeps its data under date=/lang= subdirectories, where a
    * top-level listStatus sees only directories and would size the
    * rewrite from bytes=0 (one-task funnel of the whole table).
    */
  private def census(fs: org.apache.hadoop.fs.FileSystem,
                     dir: Path): (Long, Long) = {
    var nFiles = 0L
    var bytes = 0L
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        nFiles += 1; bytes += f.getLen
      }
    }
    (nFiles, bytes)
  }

  def compact(spark: SparkSession, in: String, out: String,
              targetBytes: Long = 128L * 1024 * 1024): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(in).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (nBefore, bytes) = census(fs, new Path(in))
    require(nBefore > 0, s"no parquet files under $in")
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).repartition(n)
      .write.mode("errorifexists").parquet(out)
    val (nAfter, _) = census(fs, new Path(out))
    Stats(nBefore, bytes, nAfter)
  }
}
