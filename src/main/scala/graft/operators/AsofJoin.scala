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
  * carry the right side's payload forward with
  * `last(col, ignoreNulls = true)` — then keep only left rows. ONE
  * shuffle of (keys, time, payload), no range join, no per-key blowup:
  * cost is the sort of each key's merged timeline, exactly what a
  * 1000-executor cluster distributes well. Ties (equal timestamps)
  * match the right row (right sorts first at the same instant), the
  * same rule as DuckDB/QuestDB ASOF JOIN.
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
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = payload.intersect(leftCols)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} already exist on the " +
        "left side — alias them on the right frame first")
    require(!leftCols.contains("_side") && !right.columns.contains("_side"),
      "_side is reserved by asofJoin")
    // side: right=0 sorts before left=1 at the same (key, time) → a left
    // row at time t sees a right row at exactly t (<= semantics)
    val l = left.withColumn("_side", lit(1))
    val r = right.select(
      (keyCols :+ timeCol).map(col) ++ payload.map(col): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
