package graft
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Parameter probe for the PQ index on the synthetic embeddings:
  * recall@5 and code-collision structure vs (m, kSub, rerank).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteTopK(emb, q, k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    for (m <- Seq(8, 16); kSub <- Seq(16, 64, 256); rerank <- Seq(32, 128)) {
      val model = Similarity.fitPq(emb, dim = 64, m = m, kSub = kSub)
      val codes = model.codes.select(concat_ws(",", $"code").as("c"))
        .groupBy("c").count()
      val distinct = codes.count()
      val maxTie = codes.agg(max("count")).as[Long].head()
      val pq = Similarity.probePq(model, emb, q, k = 5, rerank = rerank)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      val recall = (brute & pq).size.toDouble / brute.size
      println(f"PQ m=$m%2d k=$kSub%3d rerank=$rerank%3d distinctCodes=$distinct%5d maxTie=$maxTie%4d recall=$recall%.2f")
    }
    spark.stop()
  }
}
