package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.time <= left.time` per key (market-data "latest quote",
  * feature-store "latest feature value", checkpoint lookup). Spark has
  * no built-in; the naive formulation (range join + per-left-row
  * ranking) explodes quadratically inside hot keys.
  *
  * Spark-first shape: union the two sides tagged, sort each key's
  * timeline once (`Window.partitionBy(keys).orderBy(time, side)`), and
  * carry the right side's payload forward — then keep only left rows.
  * ONE shuffle of (keys, time, payload), no range join, no per-key
  * blowup: cost is the sort of each key's merged timeline, exactly what
  * a 1000-executor cluster distributes well. Ties (equal timestamps)
  * match the right row (right sorts first at the same instant), the
  * same rule as DuckDB/QuestDB ASOF JOIN.
  *
  * The carried value is ONE struct per right row (a constant marker
  * field ++ the payload columns), filled with
  * `last(_, ignoreNulls = true)`: the struct itself is never null for a
  * right row, so a matched row whose payload VALUE is NULL yields NULL
  * (true ASOF semantics) instead of leaking an older non-null value —
  * per-column fill would skip it. Multiple right rows at the same
  * (key, time) are tie-broken deterministically by the payload struct
  * itself (greatest wins), so output doesn't depend on partition order.
  *
  * Left rows with no prior right row keep NULL payloads (ASOF LEFT
  * JOIN semantics); filter them for inner behavior.
  */
object AsofJoin {

  /** @param left      probe side; all its columns survive
    * @param right     reference side: `keyCols` ++ `timeCol` ++ payload
    * @param keyCols   equality keys present on both sides
    * @param timeCol   ordering column name present on both sides
    * @param payload   right-side columns to carry to the matched left row
    * @param tolerance max staleness (same units as `timeCol`'s
    *                  subtraction): a match older than
    *                  `left.time − tolerance` nulls out instead of
    *                  leaking an arbitrarily stale value — the
    *                  feature-store staleness bound. None (default) =
    *                  unbounded lookback. Same plan either way: the
    *                  carried struct already rides the fill window, the
    *                  bound is one codegen'd filter on its `_t` field.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, payload: Seq[String],
               tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = payload.intersect(leftCols)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} already exist on the " +
        "left side — alias them on the right frame first")
    require(!leftCols.contains("_side") && !right.columns.contains("_side"),
      "_side is reserved by asofJoin")
    // _m (match marker) and _t (match time, the tolerance bound's
    // field) live INSIDE the carried struct — a payload column of the
    // same name would make getField ambiguous or silently wrong
    require(!payload.contains("_m") && !payload.contains("_t"),
      "_m and _t are reserved struct fields inside asofJoin's payload")
    // side: right=0 sorts before left=1 at the same (key, time) → a left
    // row at time t sees a right row at exactly t (<= semantics)
    val l = left.withColumn("_side", lit(1))
    // r15 null contract: a RIGHT row with a null time cannot be "as
    // of" anything (ANSI ASOF `l.t >= r.t` can never match it) — drop
    // it before the union, or Spark's nulls-first sort would carry it
    // as the phantom "earliest checkpoint" into every probe. A LEFT
    // row with a null time keeps LEFT-join semantics: nulls sort
    // first, so it sees an empty carry → null payload, exactly the
    // no-match row ASOF produces.
    val r = right.filter(col(timeCol).isNotNull).select(
      (keyCols :+ timeCol).map(col) :+
        struct(lit(1).as("_m") +: (col(timeCol).as("_t") +:
          payload.map(col)): _*).as("_pay"): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // deterministic tie-break among same-(key,time) right rows orders by
    // the payload struct — possible only when every payload type is
    // orderable (a map column would fail analysis); non-orderable
    // payloads keep the documented arbitrary tie-break
    val payOrderable = right.schema.fields
      .filter(f => payload.contains(f.name))
      .forall(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
    val ordering =
      if (payOrderable)
        Seq(col(timeCol).asc, col("_side").asc, col("_pay").asc)
      else Seq(col(timeCol).asc, col("_side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_pay",
      last(col("_pay"), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case Some(tol) => filled.withColumn("_pay",
        when(col(timeCol) - col("_pay").getField("_t") <= tol, col("_pay")))
      case None => filled
    }
    bounded.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("_pay").getField(c).as(c)): _*)
  }
}
