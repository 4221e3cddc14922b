package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast,
  Expression, Literal, ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) layout for multi-dimensional data skipping.
  *
  * At 100 TB the scan is won or lost at WRITE time: parquet row-group
  * min/max pruning only helps when rows with nearby key values land in
  * the same files. A single-column sort clusters one dimension and
  * scatters the rest; interleaving the bits of d columns into one sort
  * key (Morton order) bounds every file to a small hyper-rectangle in
  * ALL d dimensions, so selective predicates on ANY of them prune files
  * (the technique behind Delta/Iceberg Z-ORDER clustering; the curve
  * itself is Morton 1966, public domain).
  *
  * The sort is an ordinary `repartitionByRange(zval) +
  * sortWithinPartitions` — a distributed range sort, no global-order
  * single task — and the z-value is a pure bit expression that
  * whole-stage-codegens (composed from shift/and/or built-ins, no UDF).
  *
  * `zvalueSql` emits the IDENTICAL formula as ANSI SQL so an external
  * engine (the DuckDB oracle) can replay the layout bit-for-bit.
  */
object ZOrder {

  /** Morton code of `dims`: bit i of dimension j lands at position
    * i·d + j. Each dimension is masked to `bits` low bits (callers
    * normalize to that range first — rank, scale, or modulo; whatever
    * preserves the locality they want). d·bits must fit a positive
    * long.
    *
    * The catalyst tree below is THE formula; `zvalue` wraps it for the
    * Column API, GraftExtensions registers it for SQL, and `zvalueSql`
    * prints the same loop as ANSI text — one shape, three surfaces.
    */
  def zvalueExpr(dims: Seq[Expression], bits: Int): Expression = {
    val d = dims.size
    require(d >= 1 && bits >= 1 && d * bits <= 63,
      s"need 1 <= d*bits <= 63, got d=$d bits=$bits")
    val terms = for {
      (c, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield ShiftLeft(
      BitwiseAnd(ShiftRight(Cast(c, LongType), Literal(i)), Literal(1L)),
      Literal(i * d + j)): Expression
    terms.reduce(Add(_, _))
  }

  def zvalue(dims: Seq[Column], bits: Int = 16): Column =
    Shim.column(zvalueExpr(dims.map(Shim.expression), bits))

  /** The same formula as SQL over the given column expressions. */
  def zvalueSql(dims: Seq[String], bits: Int = 16): String = {
    val d = dims.size
    require(d >= 1 && bits >= 1 && d * bits <= 63,
      s"need 1 <= d*bits <= 63, got d=$d bits=$bits")
    val terms = for {
      (c, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * d + j})"
    terms.mkString("(", " + ", ")")
  }

  /** Range-partition `df` into `numFiles` z-ordered shards (each output
    * file covers one contiguous z-range = one small hyper-rectangle per
    * dimension). This is the write-side operator; pair with a plain
    * `.write.parquet` so row-group stats do the pruning at read time.
    */
  def layoutBy(df: DataFrame, dims: Seq[Column], numFiles: Int,
               bits: Int = 16): DataFrame = {
    val z = zvalue(dims, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
