package graft
import org.apache.spark.sql.functions._
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val mult = 20
    val corpus = (0 until mult).map { m =>
      emb.select(($"vec_id" + lit(m * 10000000L)).as("vec_id"),
        transform($"embedding",
          (x, i) => when(i === 0, x + lit(0.001f * m)).otherwise(x))
          .as("embedding"))
    }.reduce(_ unionByName _).persist()
    corpus.count()
    val b = corpus.select($"vec_id",
      posexplode(graft.functions.VecFns.hyperplaneBucketsAll($"embedding", 64, 10, 6, 42L)))
      .select($"vec_id", $"pos".as("table"), $"col".as("bucket"))
    val sizes = b.groupBy("table", "bucket").count()
    sizes.groupBy("table").agg(count(lit(1)).as("n_buckets"),
      max("count").as("max_sz"), expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(expr("count*count")).as("sum_n2")).orderBy("table").show()
    spark.stop()
  }
}
