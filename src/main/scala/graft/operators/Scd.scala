package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the versioned-upsert step a
  * warehouse runs when a new source snapshot arrives. The reference's
  * whole pipeline is a version-over-version comparison of trade-data
  * releases (assess_changes.qmd:97-179 joins two releases full-outer
  * and classifies added/removed/changed); SCD type 2 is that same
  * comparison PERSISTED: instead of a report, each change closes the
  * old row's validity interval and opens a new one, so every
  * historical state stays queryable ("as of" queries).
  */
object Scd {

  /** Type-2 merge of a full `updates` snapshot into a versioned
    * `current` table. `current` carries `valid_from`/`valid_to`
    * (valid_to NULL = open row); `updates` is the new complete
    * snapshot of `keys ++ attrs`. Snapshot semantics:
    *
    *  - key in both, any attr differs (null-safely) → old row closes
    *    at `effective`, new open row inserted
    *  - key in both, attrs equal → open row kept as-is
    *  - key only in current → soft delete: row closes at `effective`
    *  - key only in updates → new open row inserted
    *  - closed history rows pass through untouched
    *
    * Plan shape at scale: ONE key-keyed shuffle join (open rows ⋈
    * snapshot, full-outer — broadcastable when the snapshot is a small
    * dimension) staged once because it feeds both output branches;
    * history is a pure union pass-through. Keys must be non-null on
    * both sides (enforced by the full-outer classification).
    *
    * @return the new versioned table, same schema as `current`
    */
  def merge2(current: DataFrame, updates: DataFrame, keys: Seq[String],
             attrs: Seq[String], effective: Column): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs required")
    val cols = keys ++ attrs
    val history = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val joined = Stage.materialize(
      open.select((cols :+ "valid_from").map(col): _*).as("c")
        .join(updates.select(cols.map(col): _*).as("u"),
          keys.map(k => col(s"c.$k") === col(s"u.$k")).reduce(_ && _),
          "full_outer")
        .select(
          keys.map(k => col(s"c.$k").as(s"ck_$k")) ++
          attrs.map(a => col(s"c.$a").as(s"ca_$a")) ++
          Seq(col("c.valid_from").as("c_valid_from")) ++
          keys.map(k => col(s"u.$k").as(s"uk_$k")) ++
          attrs.map(a => col(s"u.$a").as(s"ua_$a")): _*),
      "scd2_join")
    val inCur = col(s"ck_${keys.head}").isNotNull
    val inUpd = col(s"uk_${keys.head}").isNotNull
    val changed = attrs.map(a => !(col(s"ca_$a") <=> col(s"ua_$a")))
      .reduce(_ || _)
    // current-side rows: keep open if unchanged, else close
    val fromCur = joined.filter(inCur).select(
      keys.map(k => col(s"ck_$k").as(k)) ++
      attrs.map(a => col(s"ca_$a").as(a)) ++
      Seq(col("c_valid_from").as("valid_from"),
        when(!inUpd || changed, effective).as("valid_to")): _*)
    // update-side rows needing a fresh open version
    val fromUpd = joined.filter(inUpd && (!inCur || changed)).select(
      keys.map(k => col(s"uk_$k").as(k)) ++
      attrs.map(a => col(s"ua_$a").as(a)) ++
      Seq(effective.as("valid_from"),
        lit(null).cast(current.schema("valid_to").dataType)
          .as("valid_to")): _*)
    history.select((cols ++ Seq("valid_from", "valid_to")).map(col): _*)
      .unionByName(fromCur)
      .unionByName(fromUpd)
  }

  /** Time-travel read over an SCD2 history: the rows valid AT `asOf`
    * under the half-open [valid_from, valid_to) convention [[merge2]]
    * writes (NULL valid_to = still open). A narrow codegen'd filter —
    * at 100 TB the win comes from partitioning the history table by
    * valid_from range so the scan prunes, which this predicate shape
    * permits (both bounds are simple column comparisons).
    */
  def snapshotAt(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
}
