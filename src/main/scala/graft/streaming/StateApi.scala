package graft.streaming

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.streaming.{ListState, StatefulProcessorHandle,
  TTLConfig, ValueState}

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

  /** Handle-registration twin of [[graft.plans.ScaleGuard]]'s
    * record-retaining-stream-state rule. `transformWithState` declares
    * its state through runtime handles the logical plan cannot show,
    * so the plan-level guard that sweeps `(flat)mapGroupsWithState`
    * state encoders is blind to this path — these wrappers enforce the
    * same bounded-state contract at the only choke point the tws path
    * has: handle registration inside `StatefulProcessor.init`.
    *
    * A VALUE state must be scalar/sketch-shaped (no collection of
    * records anywhere in its schema — the exact [[graft.plans
    * .ScaleGuard.retainsRecords]] predicate). A LIST state is
    * record-retaining *by construction* (one entry per element kept),
    * so registering one requires a written `boundedBy` justification
    * naming the bound — the same document-at-the-call-site discipline
    * PlanGuardSpec's allowlist imposes on the fmgws path.
    */
  /** The bounded-state predicate [[valueState]] enforces, visible on
    * its own so specs can assert the guard's accept path directly
    * (instead of inferring acceptance from a downstream handle error).
    * Throws IllegalArgumentException when the schema retains records.
    */
  def requireScalarShaped[T](name: String, enc: Encoder[T]): Unit =
    require(!graft.plans.ScaleGuard.retainsRecords(enc.schema),
      s"tws value state '$name' schema [${enc.schema.simpleString}] holds " +
        "a collection of records: per-key state grows with events seen, " +
        "not with a scalar/sketch bound. Fold events into scalars or " +
        "sketches, or use listState() with a written bound.")

  def valueState[T](h: StatefulProcessorHandle, name: String,
                    enc: Encoder[T],
                    ttl: TTLConfig = TTLConfig.NONE): ValueState[T] = {
    requireScalarShaped(name, enc)
    h.getValueState(name, enc, ttl)
  }

  /** See [[valueState]]. `boundedBy` must state WHAT bounds the list's
    * length (e.g. "LSH bucket capped at maxBucketSize entries by the
    * eviction in bucketScan") — an empty justification is refused.
    */
  def listState[T](h: StatefulProcessorHandle, name: String,
                   enc: Encoder[T], boundedBy: String,
                   ttl: TTLConfig = TTLConfig.NONE): ListState[T] = {
    require(boundedBy != null && boundedBy.trim.length >= 20,
      s"tws list state '$name' retains one entry per element kept — " +
        "registration requires a written justification (>= 20 chars) " +
        "naming the bound on its length.")
    h.getListState(name, enc, ttl)
  }
}
