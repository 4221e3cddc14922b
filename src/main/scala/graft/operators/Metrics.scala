package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed evaluation metrics.
  *
  * The textbook AUC is a global rank over scores — a single-partition
  * sort at scale. Here it reduces to grouped score counts plus ONE
  * running total of negatives over the distinct-score groups
  * (GlobalRank's two-phase range ranking: the exchange is bounded by
  * |distinct scores|, never |rows|), with the standard ½-tie
  * correction carried as INTEGERS — 2U = Σ p·(2·neg_below + neg_tied)
  * — so the only float operation is the final division and the value
  * is bit-identical across engines and partitionings. The ScaleQ
  * class_auc gate replays the identical integer walk in DuckDB;
  * R8FuzzSpec pins randomized parity against the O(n²) pair-counting
  * definition (ties at ½ credit).
  */
object Metrics {

  /** @param scored frame with an integral `score` column and a `pos`
    *               column in {0, 1}
    * @return one row: (n_pos, n_neg, auc); auc is null when either
    *         class is empty
    */
  def exactAuc(scored: DataFrame): DataFrame = {
    val g = scored.groupBy("score")
      .agg(sum(col("pos")).as("p"),
        sum(lit(1L) - col("pos")).as("ng"))
    GlobalRank
      .withRunningTotal(g, Seq(col("score")), col("ng"),
        rankCol = "r", totalCol = "cum_ng")
      .agg(sum("p").as("n_pos"), sum("ng").as("n_neg"),
        sum(col("p") * (lit(2L) * (col("cum_ng") - col("ng"))
          + col("ng"))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Theil-Sen robust slope per series — the median of all pairwise
    * slopes (29% breakdown point). Pairs are bounded by series
    * LENGTH², not row count; for multi-year series sample pairs
    * upstream, same shape. Median = explicit two-middle-rank selection
    * inside a key-partitioned window, averaging the middle slope
    * VALUES, so rank-tie ordering cannot change the result; each slope
    * is one integer-diff IEEE division, and the rank + count ride the
    * SAME key exchange (a separate count aggregate would re-evaluate
    * the O(len²) join in a second plan branch).
    *
    * @param series frame with `key`, integral `x`, integral `y`
    * @return (key, n_pairs, slope); series with < 2 distinct x yield
    *         no row
    */
  def theilSen(series: DataFrame): DataFrame = {
    val pairs = series.select(col("key"), col("x").as("x1"),
        col("y").as("y1"))
      .join(series.select(col("key"), col("x").as("x2"),
        col("y").as("y2")), Seq("key"))
      .filter(col("x2") > col("x1"))
      .select(col("key"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("sl"))
    val w = Window.partitionBy("key").orderBy("sl")
    pairs.withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("rn") === expr("(n_pairs + 1) div 2") ||
        col("rn") === expr("n_pairs div 2 + 1"))
      .groupBy("key", "n_pairs")
      .agg(avg("sl").as("slope"))
      .select(col("key"), col("n_pairs"), col("slope"))
  }
}
