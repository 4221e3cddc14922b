package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: the Morton code is a bijection on the masked bits,
  * the SQL twin emits identical values, and the distributed writer
  * produces shards whose per-dimension bounding boxes are dramatically
  * tighter than a random layout — the property parquet min/max pruning
  * feeds on.
  */
class ZOrderSpec extends SparkFunSuite {
  import spark.implicits._

  test("zvalue bijective on the masked domain; matches the SQL twin") {
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(Seq(col("x"), col("y")), 5))
      .withColumn("z_sql", expr(ZOrder.zvalueSql(Seq("x", "y"), 5)))
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(2) === r.getLong(3)),
      "Scala and SQL z-values diverge")
    val zs = rows.map(_.getLong(2))
    assert(zs.distinct.length === 1024, "Morton code not bijective")
    assert(zs.min === 0L && zs.max === 1023L)
  }

  test("bit placement: dimension j bit i lands at i*d + j") {
    val one = Seq((1L, 0L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 4).as("z"))
      .head().getLong(0)
    val two = Seq((0L, 1L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 4).as("z"))
      .head().getLong(0)
    assert(one === 1L && two === 2L)
  }

  test("layoutBy shards bound both dimensions tighter than arrival order") {
    // uniform 2-d grid: any contiguous z-range of 1/8th of the points
    // covers ~a quadrant-ish rectangle, not the full square
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(pts), 8))
      .toDF("x", "y")
    val sharded = ZOrder.layoutBy(df, Seq(col("x"), col("y")), numFiles = 8,
      bits = 6)
      .withColumn("part", spark_partition_id())
    val spans = sharded.groupBy("part")
      .agg(count(lit(1)).as("n"),
        (max("x") - min("x") + 1).as("sx"), (max("y") - min("y") + 1).as("sy"))
      .collect()
    assert(spans.map(_.getAs[Long]("n")).sum === 4096L, "writer dropped rows")
    // average shard bounding-box area must be far below the full square;
    // a random 8-way split gives ~64×64 per shard (area ratio ~1.0)
    val avgArea = spans.map(r =>
      r.getAs[Long]("sx") * r.getAs[Long]("sy")).sum.toDouble / spans.length
    assert(avgArea <= 64 * 64 / 2.5,
      s"z-layout not clustering: avg shard area $avgArea of ${64 * 64}")
    // and no single-task global sort: multiple non-empty shards exist
    assert(spans.length >= 6)
  }
}
