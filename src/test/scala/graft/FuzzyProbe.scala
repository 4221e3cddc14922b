package graft
import org.apache.spark.sql.functions._

/** Fuzzy-linkage scale probe: grow the corpus (and with it the block
  * sizes) and watch whether wall time stays governed by candidate
  * volume rather than by the single hottest block — the property the
  * asymmetric sub-salting exists to provide. Each replica suffixes a
  * distinct token, so replicas of one name are at distance 2-3 from
  * each other and pair volume grows quadratically in mult while the
  * corpus grows linearly (the Dedup-probe stress shape).
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
      .select($"p_partkey", $"p_name")
    // mult=1 is excluded: within one replica every same-block name is
    // IDENTICAL (64-name vocabulary) so no 1..3-distance pairs exist;
    // cross-replica suffix pairs are what the probe measures
    for (mult <- Seq(2, 4, 8)) {
      val corpus = (0 until mult).map(m =>
          base.select(($"p_partkey" + lit(m * 10000000L)).as("k"),
            concat($"p_name", lit(" v" + m)).as("txt")))
        .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = graft.operators.FuzzyJoin.selfPairs(corpus,
          col("k"), col("txt"),
          concat_ws("|", split(col("txt"), " ").getItem(1),
            substring(col("txt"), 1, 1)),
          maxDist = 3).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"FUZZY mult=$mult%2d names=${20000 * mult}%7d pairs=$n%10d time=$dt%7.1fs")
    }
    spark.stop()
  }
}
