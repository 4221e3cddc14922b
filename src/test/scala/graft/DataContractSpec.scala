package graft

import org.apache.spark.sql.types._

/** Guards the loader against driver test-data contract drift.
  *
  * Round 6 regression: the driver regenerated `events.parquet` with
  * `ts` as TIMESTAMP(MICROS) while the loader assumed TIMESTAMP(NANOS),
  * erroring 22 queries at analysis time. `graft.queries.t` now branches
  * on the OBSERVED physical type; this spec pins that behavior:
  *
  *  - every driver table loads, and `events.ts` surfaces as
  *    TimestampType regardless of which physical generation is on disk
  *    (micros reads natively; legacy nanos reads as long and is
  *    rebuilt);
  *  - a deliberately re-typed events fixture (ts as neither timestamp
  *    nor long) fails FAST with one clear message naming the type
  *    found — not 22 downstream analysis errors.
  */
class DataContractSpec extends SparkFunSuite {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every driver table loads from the gate SF directory") {
    val failures = tables.flatMap { name =>
      try { queries.t(spark, sfDir, name).schema; None }
      catch { case e: Throwable => Some(s"$name: $e") }
    }
    assert(failures.isEmpty,
      s"driver tables failed to load from $sfDir:\n" +
        failures.mkString("\n"))
  }

  test("events.ts surfaces as TimestampType under either physical generation") {
    val df = queries.t(spark, sfDir, "events")
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must normalize events.ts to TimestampType; got " +
        s"${df.schema("ts").dataType}")
    // and rows actually read (the type branch must not drop data)
    assert(df.limit(1).count() === 1L)
  }

  test("a re-typed events.ts fails fast, naming the observed type") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evbad").toString
    import spark.implicits._
    // string-typed ts: matches neither the timestamp nor the legacy
    // nanos-long contract
    Seq(("e1", "2024-01-01T00:00:00", "u1", 1.0))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException] {
      queries.t(spark, dir, "events")
    }
    assert(ex.getMessage.contains("StringType"),
      s"failure must name the observed type; was: ${ex.getMessage}")
    assert(ex.getMessage.contains("events.ts"),
      s"failure must name the drifted column; was: ${ex.getMessage}")
  }
}
