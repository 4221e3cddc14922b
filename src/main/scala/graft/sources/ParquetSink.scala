package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioned parquet writes with small-file discipline
  * (SURVEY.md §2 sink_parquet [EXT]).
  *
  * The two failure modes of `partitionBy` at scale:
  *  - no repartition → every task writes a file into every partition
  *    directory (tasks × values small files);
  *  - `repartition(partitionCol)` → one task per partition VALUE — a
  *    parallelism cliff and a skew magnet (one task writes all of "en").
  *
  * `writePartitioned` takes the middle road: repartition on
  * (partitionCol, hash(fileKey) % filesPerValue), so each value writes
  * through up to `filesPerValue` parallel tasks and each directory ends
  * up with at most `filesPerValue` files. Size `filesPerValue` to
  * bytes_per_value / target_file_size (e.g. 128 MB–1 GB parquet files).
  */
object ParquetSink {

  def writePartitioned(df: DataFrame, out: String, partitionCol: String,
                       fileKey: Column, filesPerValue: Int): DataFrame = {
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    df.repartition(parallelism, col(partitionCol),
        pmod(hash(fileKey), lit(filesPerValue)))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(out)
    spark.read.parquet(out)
  }
}
