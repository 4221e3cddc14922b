package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One registry entry: a named DataFrame query over the driver's
    * parquet tables plus (optionally) the DuckDB oracle SQL the harness
    * hash-compares it against. Column names/aliases MUST match between
    * the two (the driver sorts columns by name before hashing).
    */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Read one driver table from a scale-factor directory.
    *
    * `events.parquet` has shipped with two different physical types for
    * `ts` across test-data generations: parquet INT64 TIMESTAMP(MICROS)
    * (reads natively as a timestamp) and INT64 TIMESTAMP(NANOS) (which
    * Spark 4 rejects outright — PARQUET_TYPE_ILLEGAL — unless the
    * `nanosAsLong` legacy conf maps it to a plain long). We branch on the
    * OBSERVED schema rather than assuming either contract: a timestamp-
    * typed `ts` passes through untouched; a long-typed `ts` (legacy nanos
    * read) is rebuilt as a microsecond-precision timestamp — the engine's
    * documented precision floor; every oracle comparison truncates to
    * ≥ms anyway (see StreamQ scaladoc). Any other type fails loudly,
    * naming what was found, so a future data-contract drift surfaces as
    * one clear message instead of 22 downstream analysis errors.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val path = s"$dir/$name.parquet"
      val raw =
        try spark.read.parquet(path)
        catch {
          // TIMESTAMP(NANOS) footer without the legacy flag: enable the
          // flag (needed at execution time too, so it must stay set for
          // this session's nanos-era reads) and re-read as long.
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
                e.getMessage.toLowerCase.contains("nanos") =>
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(path)
        }
      raw.schema("ts").dataType match {
        case TimestampType => raw
        case TimestampNTZType =>
          // Epoch-identical under the engine's mandated UTC session; keeps
          // every downstream query seeing the same TimestampType the
          // nanos-era loader produced (window/unix_timestamp/etc. parity).
          raw.withColumn("ts", raw("ts").cast(TimestampType))
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case other =>
          throw new IllegalStateException(
            s"events.ts at $path read as unsupported type $other; " +
              "expected a timestamp (TIMESTAMP(MICROS) data) or long " +
              "(TIMESTAMP(NANOS) data under nanosAsLong). Update " +
              "graft.queries.t for the new data contract.")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Create a local scratch directory that is TRACKED for shutdown-hook
    * deletion (the [[graft.operators.Stage]] lifecycle). Every query
    * that writes fixture or sink output to disk uses this instead of a
    * bare `Files.createTempDirectory` — gate runs invoke each query 3×
    * and the bench `reps`×, so untracked dirs would accumulate one
    * orphan parquet copy per invocation.
    */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    graft.operators.Stage.trackLocal(p.toString)
    p
  }
}
