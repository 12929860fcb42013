package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash60, tokens, wordNgrams}

/** Properties of the round-4 training-data queries that the hash oracle
  * alone doesn't pin: q86's integer-rational BM25 must rank exactly like
  * the float formula it derives from, q87's quotas must respect the
  * binding stratum, q88's hash-keyed contamination join must never
  * under-flag relative to an exact string-keyed join.
  */
class TrainingQueriesSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("q86: integer-rational BM25 ranks exactly like the float formula") {
    val docs = Tables.documents(spark, d)
    val terms = Seq("dup", "vector", "join")
    val dl = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_total"))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // float BM25, k1 = 1.2, b = 0.75, idf = N/df (the same monotone
    // surrogate q86 uses, un-quantized)
    val contribF = {
      val avgdl = col("t_total").cast("double") / col("n_docs")
      val idf = col("n_docs").cast("double") / col("df")
      idf * (col("tf") * 2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    }
    val floatScores = tf.join(df, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id").agg(sum(contribF).as("fscore"))
      .orderBy(col("fscore").desc, col("doc_id").asc)
      .select("doc_id").collect().map(_.getLong(0)).take(10)
    val intScores = SparkEntry.queries("q86_bm25_topk")(spark, d)
      .orderBy("rank").select("doc_id").collect().map(_.getLong(0))
    // idf quantization to 1e3 and per-term floor can perturb near-exact
    // ties only; on this corpus the orders agree outright
    assert(intScores.toSeq == floatScores.toSeq,
      s"integer BM25 ranking diverged: ${intScores.toSeq} vs ${floatScores.toSeq}")
  }

  test("q87: quotas respect the binding stratum and never exceed supply") {
    val rows = SparkEntry.queries("q87_corpus_mixture")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, nTotal, quota, nSampled) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(quota <= nTotal, s"quota $quota exceeds supply $nTotal")
      // the threshold hits the quota in expectation, never over supply
      assert(nSampled <= nTotal, s"sampled $nSampled > supply $nTotal")
      assert(w > 0)
    }
    // the binding stratum is sampled (near-)whole: its quota is within
    // one integer step of its full count
    assert(rows.exists(r => r.getLong(2) - r.getLong(3) <= r.getLong(1)),
      "some stratum must bind the feasible total")
  }

  test("q88: hash-keyed contamination never under-flags vs exact grams") {
    val base = Tables.documents(spark, d).withColumn("is_eval",
      hash60(col("doc_id").cast("string")) % 20 === 3)
    val grams = base.select(col("doc_id"), col("is_eval"),
      explode(array_distinct(wordNgrams(tokens(col("text")), 8))).as("gram"))
    val exact = grams.filter(!col("is_eval"))
      .join(grams.filter(col("is_eval")).select("gram").distinct(), "gram")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val flagged = SparkEntry.queries("q88_ngram_decontaminate")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"under-flagged docs: ${exact -- flagged}")
  }

  test("q166: OOV is zero when the vocab cut covers every distinct token") {
    // run the query shape with K >= |vocabulary|: every occurrence is
    // in-vocab, so n_oov and oov_fp must be identically 0
    val docs = Tables.documents(spark, d)
    val st = docs
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val nVocab = st.select("tok").distinct().count().toInt
    val vocab = st.groupBy("tok").agg(sum("c").as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(nVocab)
      .select(col("tok"), lit(1).as("in_vocab"))
    val oov = st.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L)))
        .as("n_oov"))
    assert(oov.agg(sum("n_oov")).head.getLong(0) == 0L)
  }

  test("q169: pair-count mass equals the token-length identity") {
    // every token of length L >= 2 contributes exactly L-1 adjacent
    // pairs, so sum(cnt) over ALL pairs must equal sum(L-1)
    val toks = Tables.documents(spark, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
    val expected = toks
      .agg(sum(length(col("tok")) - 1)).head.getLong(0)
    val pairMass = toks
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1)," +
          " i -> substring(tok, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .agg(sum("cnt")).head.getLong(0)
    assert(pairMass == expected)
  }

  test("q174: bootstrap weights hit the Poisson ladder and means stay bracketed") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.TextFunctions.fp6(
          size(array_distinct(tokens(col("text")))).cast("double") /
            size(tokens(col("text")))).as("m_fp6"))
    val contrib = docs
      .select(col("doc_id"), col("m_fp6"),
        explode(expr("sequence(0, 31)")).as("b"))
      .withColumn("hm", hash60(concat(lit("boot1:"),
        col("doc_id").cast("string"), lit(":"),
        col("b").cast("string"))) % 1000L)
      .withColumn("w",
        when(col("hm") < 368, 0L).when(col("hm") < 736, 1L)
          .when(col("hm") < 920, 2L).otherwise(3L))
    // weight distribution ≈ Poisson(1) mass on {0,1,2,3+}: each class
    // within a loose band of its ladder share
    val n = contrib.count().toDouble
    val byW = contrib.groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(byW(0L) / n - 0.368) < 0.03, byW)
    assert(math.abs(byW(1L) / n - 0.368) < 0.03, byW)
    assert(math.abs(byW(2L) / n - 0.184) < 0.03, byW)
    // every replica mean must sit inside the metric's [min, max]
    val (lo, hi) = {
      val r = docs.agg(min("m_fp6"), max("m_fp6")).head
      (r.getLong(0), r.getLong(1))
    }
    val reps = contrib.groupBy("b")
      .agg(sum(col("w") * col("m_fp6")).as("swm"), sum("w").as("sw"))
      .select(expr("swm div sw").as("m")).collect().map(_.getLong(0))
    assert(reps.length == 32 && reps.forall(m => m >= lo && m <= hi))
  }
}
