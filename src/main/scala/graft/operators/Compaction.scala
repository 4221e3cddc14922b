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
  * read), the rewrite is one `repartition(n)` pass — a single
  * round-robin shuffle, no driver-side row handling — and the write
  * goes to a fresh directory (atomic swap is the caller's rename; an
  * in-place overwrite that fails mid-write would lose the input).
  */
object Compaction {

  final case class Stats(filesBefore: Long, bytes: Long, filesAfter: Long)

  /** Rewrite parquet dir `in` as ~`targetBytes`-sized files in `out`
    * (fresh directory). Returns before/after file stats.
    */
  def compact(spark: SparkSession, in: String, out: String,
              targetBytes: Long = 128L * 1024 * 1024): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(in).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(in))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).repartition(n)
      .write.mode("errorifexists").parquet(out)
    val after = fs.listStatus(new Path(out))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Stats(files.length.toLong, bytes, after.toLong)
  }
}
