package graft.streaming

import org.apache.spark.sql.SparkSession

/** Selects the per-key state implementation for the custom stateful
  * operators (funnel, anomaly, CUSUM, running totals, streaming
  * near-dup) — `spark.graft.stateApi`:
  *
  *  - `fmgws` (default): `flatMapGroupsWithState` — in-memory batch
  *    execution with no state-store spin-up, supported on every Spark
  *    line this library targets. The correctness gate and bench run
  *    this path.
  *  - `tws`: `transformWithState`, the Spark 4.x arbitrary-state API
  *    (`StatefulProcessor` + typed Value/List state with per-state TTL
  *    and composite state). Version-guarded: requires Spark >= 4.0. In
  *    BATCH it forces a RocksDB store per task — measurable fixed cost
  *    per partition, which is why it is not the batch default — while
  *    in streaming it is the forward path (TTL-bounded state, state
  *    data source for inspection, schema evolution across restarts)
  *    and needs `spark.sql.streaming.stateStore.providerClass =
  *    ...RocksDBStateStoreProvider` on the session.
  *
  * Both paths execute the SAME per-group step functions (EventStreams'
  * `*Step` cores), so their outputs are identical by construction
  * modulo state plumbing; StreamingSpec asserts the equivalence
  * operator by operator and drives the TWS streaming path through
  * MemoryStream with the RocksDB provider.
  */
object StateApi {
  def useTws(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.stateApi") match {
      case Some("tws") =>
        val major = spark.version.takeWhile(_ != '.')
        require(major.nonEmpty && major.toInt >= 4,
          s"spark.graft.stateApi=tws requires Spark 4.x (running ${spark.version})")
        // Batch transformWithState loads a state store whose provider
        // resolves the StateStoreCoordinator RPC endpoint; the endpoint
        // is created by the StreamingQueryManager, which nothing else
        // touches in a pure-batch session — poke it here or the first
        // batch run dies with RpcEndpointNotFoundException.
        spark.streams
        true
      case Some("fmgws") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.stateApi must be tws|fmgws (got $other)")
    }
}
