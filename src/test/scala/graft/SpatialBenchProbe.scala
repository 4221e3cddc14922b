package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B timer for the 100× join_spatial regression hunt
  * (`Test/runMain graft.SpatialBenchProbe <sfDir> [reps]`): times the
  * bare `radiusJoin` (the r12 registration shape) against the planned
  * form on join_spatial's exact frames, printing per-rep wall seconds
  * and the row counts (must match).
  */
object SpatialBenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfrep100")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Sampling.contentHash
    def coord(c: org.apache.spark.sql.Column, seed: Long) =
      pmod(contentHash(c, seed, portable = true), lit(1000000L))
        .cast("double") / 10000.0
    val cust = queries.t(spark, dir, "customer").select(col("c_custkey"),
      coord(col("c_custkey"), 7).as("cx"),
      coord(col("c_custkey"), 8).as("cy"))
    val supp = queries.t(spark, dir, "supplier").select(col("s_suppkey"),
      coord(col("s_suppkey"), 9).as("sx"),
      coord(col("s_suppkey"), 10).as("sy"))
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("c_custkey")
        .agg(count(lit(1)).as("n_near"),
          round(sqrt(min((col("cx") - col("sx")) * (col("cx") - col("sx"))
            + (col("cy") - col("sy")) * (col("cy") - col("sy")))), 6)
            .as("min_d"))
    val plan = graft.operators.Spatial.radiusPlan(
      cust, supp, "cx", "cy", "sx", "sy", r = 5.0)
    println(s"[spatial] plan=$plan")
    for (form <- Seq("bare", "planned"); rep <- 1 to reps) {
      val j = form match {
        case "bare" => graft.operators.Spatial.radiusJoin(
          cust, supp, "cx", "cy", "sx", "sy", r = 5.0)
        case _ => graft.operators.Spatial.radiusJoinPlanned(
          cust, supp, "cx", "cy", "sx", "sy", r = 5.0, plan)
      }
      val t0 = System.nanoTime()
      val n = agg(j).count()
      println(f"[spatial] $form%-8s rep=$rep rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
