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
    * `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos as a
    * plain long (legacy conf) and rebuild a microsecond-precision
    * timestamp — the engine's documented precision floor; every oracle
    * comparison truncates to ≥ms anyway (see StreamQ scaladoc).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
