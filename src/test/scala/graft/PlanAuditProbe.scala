package graft

/** One-off plan audit (manual: sbt "Test/runMain graft.PlanAuditProbe"):
  * prints exchange/scan/join counts for EVERY registered query, sorted
  * by scan count, so accidental re-scans of wide sources or surprise
  * join strategies are visible at a glance.
  */
object PlanAuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          def c(s: String) = p.linesIterator.count(_.contains(s))
          Some((name, c("FileScan"),
            p.linesIterator.count(_.trim.startsWith("Exchange")),
            c("SortMergeJoin"), c("BroadcastNestedLoopJoin"),
            c("CartesianProduct")))
        } catch { case e: Throwable =>
          println(s"$name BUILD-FAIL: $e"); None
        }
    }
    rows.sortBy(-_._2).foreach { case (n, sc, ex, smj, bnl, cp) =>
      println(f"$n%-22s scans=$sc%-3d exchanges=$ex%-3d smj=$smj bnlj=$bnl cart=$cp")
    }
    spark.stop()
  }
}
