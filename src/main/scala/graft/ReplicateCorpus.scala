package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus replication for next-decade scale sweeps:
  * `runMain graft.ReplicateCorpus <srcSfDir> <dstDir> [mult]` writes a
  * mult× copy of every driver table, suitable for running the FULL
  * CORRECTNESS gate (graft.Verify + the DuckDB oracle) at a scale the
  * per-round driver gate never reaches — the round-8 sf0.1 sweep
  * caught two real scale-dependent gate weaknesses; this tool makes
  * the next decade (sf0.1 × 10 ≈ sf1) a one-command sweep.
  *
  * Replication contract (everything below is deterministic — no
  * rand(), no timestamps of "now"):
  *
  *  - **Key offsets, not row copies.** Replica m adds `m × 10^9` to
  *    every entity key (customer/supplier/part/order/lineitem-FK/
  *    event/user/doc/vec). Foreign keys offset together, so each
  *    replica is internally join-consistent and the corpus-wide graph
  *    is `mult` disjoint copies — row-scale tables grow mult×, while
  *    per-key series, per-order baskets, and per-node degrees keep
  *    their sf-calibrated shape (the property that makes gate
  *    thresholds meaningful at the bigger scale). Replica 0 is the
  *    source verbatim, so oracle literals (specific keys/dates) still
  *    match.
  *  - **Dimensions stay.** region/nation copy once — customers and
  *    suppliers of every replica reference the original 25 nations,
  *    so dimension-grouped aggregates see mult× fan-in (the realistic
  *    growth mode: data grows, the world's regions don't).
  *  - **Embeddings nudge.** Replica m shifts `embedding[0]` by
  *    `0.001 × m` (float) — replicas stay near-duplicates (stressing
  *    ANN candidate generation like ScaleProbe's cosine probe) but
  *    exact score TIES across replicas are broken, so top-k orderings
  *    remain totally determined on both engines.
  *  - **Documents clone verbatim** (new ids, same text): every doc
  *    gains mult-1 exact duplicates — dedup/near-dup operators face
  *    mult× clusters, the honest adversarial shape for them.
  *
  * Each table lands as a SINGLE parquet file `<dstDir>/<table>.parquet`
  * (µs timestamps), byte-compatible with the driver layout, so
  * `graft.Verify <dstDir> ...` and `tools/local_check.py <dstDir> ...`
  * run unchanged.
  */
object ReplicateCorpus {
  val Off = 1000000000L // > any source key at any shipped SF

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ReplicateCorpus <srcSfDir> <dstDir> [mult=10]")
    val (src, dst) = (args(0), args(1))
    val mult = if (args.length > 2) args(2).toInt else 10
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dst))

    // key columns to offset per table; everything else passes through
    val keyCols: Map[String, Seq[String]] = Map(
      "region" -> Nil,
      "nation" -> Nil,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    def writeSingleFile(df: DataFrame, table: String): Unit = {
      val tmp = s"$dst/__tmp_$table"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      require(part.length == 1, s"expected 1 part file for $table")
      Files.move(Paths.get(part.head), Paths.get(s"$dst/$table.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // drop the scratch dir (part file already moved out)
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }

    keyCols.foreach { case (table, keys) =>
      val base = queries.t(spark, src, table)
      val out =
        if (keys.isEmpty) base
        else (0 until mult).map { m =>
          val shifted = keys.foldLeft(base) { (df, k) =>
            // offset keys must be 64-bit: an int key would overflow at
            // m >= 3 and silently corrupt the join graph. Every shipped
            // key column is bigint; fail loudly if a future data
            // generation changes that.
            require(base.schema(k).dataType ==
              org.apache.spark.sql.types.LongType,
              s"$table.$k is ${base.schema(k).dataType}, expected bigint")
            df.withColumn(k, col(k) + lit(m * Off))
          }
          if (table == "embeddings" && m > 0)
            shifted.withColumn("embedding",
              transform(col("embedding"),
                (x, i) => when(i === 0, x + lit(0.001f * m)).otherwise(x)))
          else shifted
        }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      writeSingleFile(out, table)
      println(f"[replicate] $table%-10s x$mult -> $dst/$table.parquet " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}
