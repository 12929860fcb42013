package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The custom expressions are callable from SQL after registration. */
class GraftExtensionsSpec extends SparkSpec {

  test("register() exposes the functions to spark.sql") {
    GraftExtensions.register(spark)
    val sh = spark.sql(
      "SELECT graft_simhash60(split('a b a', ' ')) AS sh").head.getLong(0)
    assert(sh >= 0 && sh < (1L << 60))
    val dot = spark.sql(
      """SELECT graft_fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                      array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d"""
        .stripMargin).head.getDouble(0)
    assert(dot == 11.0)
    val jac = spark.sql(
      "SELECT graft_jaccard_fp6(array('a','b'), array('b','c')) AS j")
      .head.getLong(0)
    assert(jac == math.floor(1.0 / 3.0 * 1e6).toLong)
    val sig = spark.sql(
      "SELECT graft_minhash_sig(array('x','y'), 4) AS s").head.getSeq[Long](0)
    assert(sig.length == 4)
    val bucket = spark.sql(
      """SELECT graft_lsh_bucket(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)),
        |                        4, 2) AS b""".stripMargin).head.getLong(0)
    assert(bucket >= 0 && bucket < 16) // 4 planes → 16 buckets
  }

  test("the extensions class wires the same builders without throwing") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("SQL aggregate functions: graft_kmv_sketch and graft_top_k_pair") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("g", 5L, 10L), ("g", 3L, 11L), ("g", 5L, 12L), ("g", 9L, 13L))
      .toDF("g", "h", "id").createOrReplaceTempView("agg_ext")
    val sk = spark.sql(
      "SELECT graft_kmv_sketch(h, 2) AS sk FROM agg_ext GROUP BY g")
      .head.getSeq[Long](0)
    assert(sk == Seq(3L, 5L)) // bottom-2 DISTINCT
    val tk = spark.sql(
      """SELECT graft_top_k_pair(h, id, 2) AS tk FROM agg_ext GROUP BY g""")
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(tk == Seq((9L, 13L), (5L, 10L))) // score desc, id asc
  }

  test("SQL simhash matches the Column API on real docs") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash60(split(lower(text), ' ')) AS sh
        |FROM docs_ext""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Tables.documents(spark, sf("sf0.001"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextDedup.simhash(
          org.apache.spark.sql.functions.col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }
}
