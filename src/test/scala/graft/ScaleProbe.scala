package graft
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    for (mult <- Seq(1, 5, 20)) {
      // replicate with perturbed ids and slightly perturbed text so
      // replicas are near-dups (stress candidate generation)
      val corpus = (0 until mult).map { m =>
        base.select(($"doc_id" + lit(m * 10000000L)).as("doc_id"),
          concat($"text", lit(" v" + m)).as("text"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE mult=$mult%2d docs=${5000 * mult}%7d pairs=$n%9d time=$dt%7.1fs")
    }
    spark.stop()
  }
}
