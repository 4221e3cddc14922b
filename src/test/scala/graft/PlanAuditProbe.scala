package graft

/** One-off plan audit (manual: sbt "Test/runMain graft.PlanAuditProbe"):
  * prints exchange/scan/join counts per round-7 query so accidental
  * re-scans or surprise sort-merge joins are visible at a glance.
  */
object PlanAuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("dq_outlier", "graph_jaccard", "ts_holt", "rank_ndcg",
      "corpus_gini", "corpus_budget", "agg_mode", "sim_recall", "ts_mad",
      "scd1_latest", "corpus_interleave", "embed_quant", "src_pruned",
      "multimodal_phash", "multimodal_neardup", "win_streak",
      "agg_skew_kurt", "ts_changepoint")
    qs.foreach { name =>
      val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val ex = p.linesIterator.count(_.trim.startsWith("Exchange"))
      val scans = p.linesIterator.count(_.contains("FileScan"))
      val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      println(f"$name%-20s exchanges=$ex scans=$scans smj=$smj bhj=$bhj bnlj=$bnl")
    }
    spark.stop()
  }
}
