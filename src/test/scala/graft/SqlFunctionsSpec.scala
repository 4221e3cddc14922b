package graft

/** SQL surface of the native kernels: graft_* functions registered on the
  * session and called from pure spark.sql text.
  */
class SqlFunctionsSpec extends SparkFunSuite {
  import spark.implicits._

  test("graft_* functions are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos_same,
        graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        graft_simhash64(array('hello', 'world')) AS sh,
        graft_sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
        size(graft_minhash_sig(array(5L, 9L), 64, 42L)) AS klen,
        graft_first_agree(array(1, 2, 3), array(9, 2, 3)) AS fa
      """).as[(Double, Double, Long, Double, Int, Int)].head()
    assert(math.abs(r._1 - 1.0) < 1e-9)
    assert(math.abs(r._2 - 11.0) < 1e-9)
    assert(r._3 !== 0L)
    assert(math.abs(r._4 - 0.5) < 1e-9) // |{2,3}| / |{1,2,3,4}|
    assert(r._5 === 64)
    assert(r._6 === 1)
  }

  test("SQL and DataFrame paths produce identical minhash signatures") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("sql_docs")
    val viaSql = spark.sql(
      """SELECT graft_minhash_sig(graft_shingle_hashes(
           split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '),
           3), 64, 42L) AS sig FROM sql_docs""")
      .as[Seq[Long]].head()
    val viaDf = docs.select(
      graft.operators.Dedup.minhashSignature($"text").as("sig"))
      .as[Seq[Long]].head()
    assert(viaSql === viaDf)
  }
}
