package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, Dedup}

/** Same-session alternating A/B harness for optimization-round
  * candidates (the host is bursty, so cross-run medians are not
  * comparable; alternating in ONE session gives both variants the same
  * window). Not part of the driver contract — local iteration only.
  */
object AbScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.lift(0).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def planted(): DataFrame = {
      val docs = queries.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      docs.unionByName(
        docs.filter(col("doc_id") % 50 === 0).select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text")))
    }

    // OLD r12-r16 path: CC over rep pairs + corpus-sized star edges,
    // label join-back keyed on doc id.
    def oldClusters(df: DataFrame): DataFrame = {
      val (membership, reps) = Dedup.textGroups(df, "doc_id", "text")
      val repPairs = Dedup.minhashPairs(reps, "rep", "text",
        threshold = 0.35).select("id_a", "id_b")
      val star = membership.filter(col("id") =!= col("rep"))
        .select(col("id").as("id_a"), col("rep").as("id_b"))
      val labels = ConnectedComponents.labels(
        repPairs.unionByName(star), "id_a", "id_b")
      membership.select(col("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    }

    def newClusters(df: DataFrame): DataFrame =
      Dedup.minhashClusters(df, "doc_id", "text", threshold = 0.35)

    // OLD pagerank rounds (stage every 4th even in the broadcast
    // regime — quadratic chain replay through per-round broadcasts)
    def oldRanks(edgesIn: DataFrame, iters: Int = 5,
                 damping: Double = 0.85): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Stage
      val base = edgesIn.select(col("src"), col("dst"))
      val dir = base.unionByName(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val ew = Stage.materialize(
        dir.repartition(col("src")).distinct()
          .withColumn("outdeg",
            count(lit(1)).over(Window.partitionBy("src")).cast("long")),
        "ab_pr_edges")
      val n = ew.agg(countDistinct("src")).head().getLong(0)
      val teleport = lit(1.0 - damping) / lit(n.toDouble)
      val r0term = lit(1.0) / lit(n.toDouble)
      def contract(ranked: DataFrame): DataFrame =
        ranked.groupBy(col("dst").as("id2"))
          .agg((teleport +
            lit(damping) * sum(col("r") / col("outdeg"))).as("r2"))
          .select(col("id2").as("id"), col("r2").as("r"))
      var r: DataFrame = contract(ew.withColumn("r", r0term))
      var i = 1
      while (i < iters) {
        val next = contract(ew.join(broadcast(r), ew("src") === r("id")))
        r = if ((i + 1) % 4 == 0 && i + 1 < iters)
          Stage.materialize(next, s"ab_pr_r$i")
        else next
        i += 1
      }
      r.select(col("id"), round(col("r") * lit(n.toDouble), 4).as("rank"))
    }

    def time(tag: String, f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag $s%.3f")
      s
    }
    val _ = (oldClusters _, newClusters _) // minhash A/B retired (kept above)

    // tokenization micro-A/B: regex split vs native NormalizeAlnum
    def tokRegex(): DataFrame = {
      val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= "")
      queries.t(spark, sfDir, "documents")
        .select(size(toks).as("n"),
          size(filter(toks, t => t === "the" || t === "a")).as("s"))
        .agg(sum("n").as("a"), sum("s").as("b"))
    }
    def tokNative(): DataFrame = {
      val toks = filter(
        split(graft.functions.TextFns.normalizedBytes(col("text"))
          .cast("string"), " "), t => t =!= "")
      queries.t(spark, sfDir, "documents")
        .select(size(toks).as("n"),
          size(filter(toks, t => t === "the" || t === "a")).as("s"))
        .agg(sum("n").as("a"), sum("s").as("b"))
    }
    println("[ab] parity: " + tokRegex().collect().toSeq + " vs " +
      tokNative().collect().toSeq)

    // layout_zorder step isolation: where does the bucketed GlobalRank
    // spend its time — boundary quantile, counts pass, or main query?
    def zbase(): DataFrame = queries.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")),
          to_date(lit("1992-01-01"))).cast("long").as("d"))
      .withColumn("zval",
        graft.operators.ZOrder.zvalue(Seq(col("o_custkey"), col("d")), 16))
    def zsteps(): Unit = {
      var t0 = System.nanoTime()
      val bs = zbase().select(col("zval").cast("double").as("q"))
        .where(col("q").isNotNull)
        .stat.approxQuantile("q", (1 until 32).map(_ / 32.0).toArray,
          1.0 / 1000)
      println(f"[ab] z_quantile ${(System.nanoTime() - t0) / 1e9}%.3f (k=${bs.distinct.length})")
      t0 = System.nanoTime()
      val bs2 = zbase().select(col("zval").cast("double").as("q"))
        .where(col("q").isNotNull && !isnan(col("q")))
        .stat.approxQuantile("q", (1 until 32).map(_ / 32.0).toArray,
          1.0 / 1000)
      println(f"[ab] z_quantile_nan ${(System.nanoTime() - t0) / 1e9}%.3f (k=${bs2.distinct.length})")
      t0 = System.nanoTime()
      val bs3 = zbase().select(col("zval").cast("double").as("q"))
        .where(col("q").isNotNull)
        .stat.approxQuantile("q", (1 until 32).map(_ / 32.0).toArray,
          1.0 / 128)
      println(f"[ab] z_quantile_err ${(System.nanoTime() - t0) / 1e9}%.3f (k=${bs3.distinct.length})")
      t0 = System.nanoTime()
      val c = zbase().groupBy((col("zval") / lit(1L << 27)).cast("int")
        .as("b")).count().collect().length
      println(f"[ab] z_counts ${(System.nanoTime() - t0) / 1e9}%.3f (rows=$c)")
      // counts pass with the REAL binary-search tree over the sampled
      // boundaries (vs the cheap div bucket above)
      def tr(lo: Int, hi: Int): org.apache.spark.sql.Column =
        if (lo == hi) lit(lo)
        else {
          val mid = (lo + hi) / 2
          when(col("__d") > lit(bs(mid)), tr(mid + 1, hi))
            .otherwise(tr(lo, mid))
        }
      t0 = System.nanoTime()
      val ctree = zbase().withColumn("__d", col("zval").cast("double"))
        .withColumn("__b",
          when(col("__d").isNull, lit(0))
            .when(isnan(col("__d")), lit(bs.length))
            .otherwise(tr(0, bs.length)))
        .groupBy("__b").count().collect().length
      println(f"[ab] z_counts_tree ${(System.nanoTime() - t0) / 1e9}%.3f (rows=$ctree)")
      t0 = System.nanoTime()
      val rdf = graft.operators.GlobalRank.withNtile(zbase(),
        Seq(col("zval").asc_nulls_first, col("o_orderkey")), 32,
        "bucket")
      println(f"[ab] z_build ${(System.nanoTime() - t0) / 1e9}%.3f")
      t0 = System.nanoTime()
      val r = rdf.count()
      println(f"[ab] z_main ${(System.nanoTime() - t0) / 1e9}%.3f (rows=$r)")
      t0 = System.nanoTime()
      val r2 = rdf.groupBy("bucket").agg(count(lit(1)).as("n"),
        min("o_custkey"), max("o_custkey"), min("d"), max("d")).count()
      println(f"[ab] z_agg ${(System.nanoTime() - t0) / 1e9}%.3f (rows=$r2)")
      t0 = System.nanoTime()
      val wdf = graft.operators.GlobalRank.withGlobalRank(
        queries.t(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), "rnk")
      println(f"[ab] w_build ${(System.nanoTime() - t0) / 1e9}%.3f")
      t0 = System.nanoTime()
      val w = wdf.count()
      println(f"[ab] w_main ${(System.nanoTime() - t0) / 1e9}%.3f (rows=$w)")
    }

    def prEdges(): DataFrame =
      queries.t(spark, sfDir, "lineitem")
        .join(queries.t(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))

    def newRanks(e: DataFrame): DataFrame =
      graft.operators.PageRank.ranks(e, "src", "dst", iters = 5)

    val __ = (oldRanks _, newRanks _, tokRegex _, tokNative _, zsteps _)

    // r18: theilSen windowed-vs-histogram A/B — the registered input
    // (typeHourly-shaped: 5 keys x ~720 h) and a FAT series (2 keys x
    // 6000 points = 18M pairs/key) where the window form must exchange
    // and sort 36M pair rows and the histogram form shuffles only
    // keys x 2048 partials per pass.
    def tsSeries(): DataFrame =
      queries.t(spark, sfDir, "events")
        .select(expr("unix_micros(ts) div 3600000000").as("hb"),
          col("event_type"))
        .groupBy("event_type", "hb").agg(count(lit(1)).as("v"))
        .select(col("event_type").as("key"), col("hb").as("x"),
          col("v").as("y"))
    def fatSeries(n: Int): DataFrame = {
      import spark.implicits._
      (0 until 2).flatMap { k =>
        (0 until n).map(x =>
          (k.toLong, x.toLong, 3L * x + (x * 2654435761L % 13) - 6))
      }.toDF("key", "x", "y")
    }
    val fat = graft.operators.Stage.materialize(fatSeries(6000), "ab_fat_series")
    val sf = graft.operators.Stage.materialize(tsSeries(), "ab_sf_series")
    (1 to reps).foreach { _ =>
      Seq(("sf", sf), ("fat", fat)).foreach { case (tag, s) =>
        val _ = time(s"theil_windowed_$tag",
          () => graft.operators.Metrics.theilSenWindowed(s))
        val __ = time(s"theil_histogram_$tag",
          () => graft.operators.Metrics.theilSen(s))
      }
    }
    spark.stop()
  }
}
