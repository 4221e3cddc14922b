package graft

import org.apache.spark.sql.functions._

/** The replicator's fan-out contract (graft.ReplicateCorpus.fanOut) —
  * the transform every 10×/30×/100× audit corpus is built from, now
  * spec-pinned since round 12 adds the skew mode.
  */
class ReplicateSpec extends SparkFunSuite {
  import spark.implicits._

  private val mult = 5
  private def events = queries.t(spark, "/root/testdata/sf0.001", "events")

  test("uniform fan-out: mult x rows, disjoint replicas, unique ids") {
    val base = events
    val n0 = base.count()
    val out = ReplicateCorpus.fanOut(spark, base, "events",
      Seq("event_id", "user_id"), mult, skew = 0)
    assert(out.count() === n0 * mult)
    assert(out.select("event_id").distinct().count() === n0 * mult)
    // every user appears with exactly its original row count — no
    // group grows with mult (the property skew mode exists to break)
    val grp = out.groupBy("user_id").count()
      .agg(max("count")).as[Long].first()
    val orig = base.groupBy("user_id").count()
      .agg(max("count")).as[Long].first()
    assert(grp === orig)
  }

  test("skew fan-out: hot users fold to mult x groups, cold users stay " +
       "disjoint, row ids stay unique") {
    val base = events
    val skew = 2
    val out = ReplicateCorpus.fanOut(spark, base, "events",
      Seq("event_id", "user_id"), mult, skew)
    // row identity never folds: ids unique at full mult x cardinality
    assert(out.select("event_id").distinct().count() ===
      base.count() * mult)
    val origCounts = base.groupBy("user_id").count()
      .withColumnRenamed("count", "n0")
    val hot = origCounts
      .filter(pmod(xxhash64(col("user_id")), lit(skew.toLong)) === 0L)
    assert(hot.count() > 0, "fixture must contain at least one hot user")
    // hot: the ORIGINAL key carries mult x its original rows — the
    // straggler group uniform replication can never produce
    val hotOut = out.join(hot, "user_id")
      .groupBy("user_id", "n0").count()
      .filter(col("count") =!= col("n0") * mult)
    assert(hotOut.isEmpty, s"hot groups must be exactly mult x original")
    // cold: no group anywhere exceeds its source count (replicas are
    // offset-disjoint), and each cold key yields mult offset copies
    val cold = origCounts.filter(
      pmod(xxhash64(col("user_id")), lit(skew.toLong)) =!= 0L)
    val coldBad = out
      .withColumn("orig_key", pmod(col("user_id"), lit(ReplicateCorpus.Off)))
      .join(cold.withColumnRenamed("user_id", "orig_key"), "orig_key")
      .groupBy("orig_key", "n0")
      .agg(countDistinct("user_id").as("copies"), count(lit(1)).as("rows"))
      .filter(col("copies") =!= mult || col("rows") =!= col("n0") * mult)
    assert(coldBad.isEmpty,
      "cold keys must appear as exactly mult disjoint offset copies")
  }

  test("skew fold is deterministic and referentially consistent") {
    val base = events
    val a = ReplicateCorpus.fanOut(spark, base, "events",
      Seq("event_id", "user_id"), 3, 2)
    val b = ReplicateCorpus.fanOut(spark, base, "events",
      Seq("event_id", "user_id"), 3, 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // folded keys are a subset of the ORIGINAL key domain (they join
    // back to replica 0 of any dimension — integrity preserved)
    val folded = a.filter(col("user_id") < ReplicateCorpus.Off)
      .select("user_id").distinct()
    val origKeys = base.select("user_id").distinct()
    assert(folded.exceptAll(origKeys).isEmpty)
  }

  test("fat mode: 64 MB giant + 1 MB band with 5 exact-clone triples, " +
       "deterministic, schema-compatible, ids above every replica range") {
    import ReplicateCorpus._
    val fat = fatDocs(spark)
    val rows = fat.select(col("doc_id"), length(col("text")).as("len"),
      col("lang"), col("source"), col("n_chars")).collect()
    assert(rows.length === 1 + FatBandCount)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // the giant: ~64 MB (generation overshoots by < one token)
    val giant = byId(FatGiantId)
    assert(giant.getInt(1) >= 64 * 1024 * 1024 &&
           giant.getInt(1) < 64 * 1024 * 1024 + 64)
    assert(giant.getLong(4) === giant.getInt(1).toLong) // n_chars = length
    // the band: 100 docs at ~1 MB each
    val band = (0 until FatBandCount).map(i => byId(FatBandBase + i))
    assert(band.forall(r => r.getInt(1) >= 1024 * 1024 &&
                            r.getInt(1) < 1024 * 1024 + 64))
    // ids sit above any replica's key range (mult <= 800 at Off = 1e9)
    assert(rows.forall(_.getLong(0) > 800L * Off))
    // clone structure: first 15 band docs = 5 triples of IDENTICAL
    // text, everything else (incl. the giant) pairwise distinct
    val texts = fat.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tripleHashes = (0 until 3 * FatCloneGroups).map(i =>
      texts(FatBandBase + i)).grouped(3).toSeq
    assert(tripleHashes.forall(g => g.distinct.size == 1))
    val allHashes = texts.values.toSeq
    assert(allHashes.distinct.size ===
      1 + FatCloneGroups + (FatBandCount - 3 * FatCloneGroups))
    // deterministic: a second generation is byte-identical
    val again = fatDocs(spark).select(col("doc_id"), md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === texts)
    // text namespace shares no token with the regular corpus text
    assert(fat.filter(col("text").rlike("[^f0-9w\\s]")).count() === 0L)
  }

  test("fat mode rejects mult > 800 (replica ids would collide with " +
       "the fat-doc id range)") {
    // FatGiantId sits just above 800 * Off; a mult past 800 would put
    // replica doc_ids inside the fat range and silently corrupt the
    // corpus — main must refuse loudly (r13 ADVICE)
    val e = intercept[IllegalArgumentException] {
      ReplicateCorpus.main(Array("/nonexistent-src", "/nonexistent-dst",
        "801", "1", "0", "1"))
    }
    assert(e.getMessage.contains("mult <= 800"))
    // and the boundary itself is structurally safe
    import ReplicateCorpus._
    assert(FatGiantId > 800L * Off && FatBandBase > 800L * Off)
  }

  test("null mode: per-(row,column) deterministic nulling at ~pct, " +
       "keys never null, patterns independent across columns") {
    val base = events
    val pct = 20
    val out = ReplicateCorpus.withNulls(
      ReplicateCorpus.fanOut(spark, base, "events",
        Seq("event_id", "user_id"), mult, skew = 0),
      "events", Seq("event_id", "user_id"), pct)
    val n = out.count()
    assert(n === base.count() * mult)
    // keys stay non-null and unique
    assert(out.filter(col("event_id").isNull ||
      col("user_id").isNull).count() === 0L)
    assert(out.select("event_id").distinct().count() === n)
    // each listed column nulls at ~pct (binomial tolerance, n = 5000)
    for (c <- Seq("ts", "event_type", "value", "props")) {
      val frac = out.filter(col(c).isNull).count().toDouble / n
      assert(math.abs(frac - pct / 100.0) < 0.05,
        s"$c null fraction $frac vs expected ${pct / 100.0}")
    }
    // per-column independence: rows null in ONE of (ts, value) only
    // must exist — a shared per-row coin would null both together
    assert(out.filter(col("ts").isNull && col("value").isNotNull)
      .count() > 0L)
    assert(out.filter(col("ts").isNotNull && col("value").isNull)
      .count() > 0L)
    // determinism: a second application is bit-identical
    val again = ReplicateCorpus.withNulls(
      ReplicateCorpus.fanOut(spark, base, "events",
        Seq("event_id", "user_id"), mult, skew = 0),
      "events", Seq("event_id", "user_id"), pct)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // pct=0 is the identity
    val id0 = ReplicateCorpus.withNulls(base, "events",
      Seq("event_id", "user_id"), 0)
    assert(id0.exceptAll(base).isEmpty && base.exceptAll(id0).isEmpty)
  }
}
