package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions.tokens
import graft.operators.TextDedup

/** The native Catalyst expressions must be BIT-IDENTICAL to their HOF
  * reference implementations on real data — that is what keeps the DuckDB
  * oracles valid after the performance swap.
  */
class NativeExpressionsSpec extends SparkSpec {

  test("SimHash60 == HOF simhash on the whole corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val mismatches = docs.select(
        NativeExpressions.simhash60(tokens(col("text"))).as("native"),
        TextDedup.simhashHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("FloatVecDot == HOF dot, bit-exact, including cross products") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") % 13 === col("ib") % 13) // sample pairs
    val mism = pairs.select(
        NativeExpressions.floatVecDot(col("va"), col("vb")).as("native"),
        VectorFunctions.dotHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("MinHashSig == aggregate minhash signatures on the whole corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val native = TextDedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val agg = TextDedup.minhashSignaturesAgg(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(native == agg)
  }

  test("WordNgrams == HOF n-grams on the corpus and edge cases") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("text")).union(Seq("", "one", "a b", "a b c").toDF("text"))
    val mism = docs.select(
        TextFunctions.wordNgrams(tokens(col("text")), 3).as("native"),
        TextFunctions.wordNgramsHof(tokens(col("text")), 3).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("MinHash60 == array_min(transform(grams, hash60)) HOF") {
    import org.apache.spark.sql.functions.{array_distinct, array_min, transform}
    val docs = Tables.documents(spark, sf("sf0.001"))
    val grams = array_distinct(
      TextFunctions.wordNgrams(tokens(col("text")), 3))
    val mism = docs.select(
        NativeExpressions.minHash60(grams).as("native"),
        array_min(transform(grams, g => TextFunctions.hash60(g))).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("LshBucket == HOF bucket tower on the whole embeddings table") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val mism = emb.select(
        NativeExpressions.lshBucket(col("embedding"), 6, 64).as("native"),
        graft.operators.Similarity.lshBucketHof(col("embedding"), 6, 64).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("TokenStats == the four-walk HOF chain on the whole corpus") {
    val stops = Seq("the", "a", "of", "and", "to", "in")
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(tokens(col("text")).as("ts"))
    val mism = docs.select(
        NativeExpressions.tokenStats(col("ts"), stops).as("st"),
        size(col("ts")).cast("long").as("n"),
        size(array_distinct(col("ts"))).cast("long").as("nd"),
        aggregate(transform(col("ts"), t => length(t)), lit(0), (a, x) => a + x)
          .cast("long").as("sl"),
        size(filter(col("ts"), t => t.isin(stops: _*))).cast("long").as("ns"))
      .filter(element_at(col("st"), 1) =!= col("n") ||
        element_at(col("st"), 2) =!= col("nd") ||
        element_at(col("st"), 3) =!= col("sl") ||
        element_at(col("st"), 4) =!= col("ns"))
      .count()
    assert(mism == 0)
  }

  test("FloatVecDot yields NULL on length mismatch, like the zip_with HOF") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val out = df.select(
      NativeExpressions.floatVecDot(col("a"), col("b")).as("n"),
      VectorFunctions.dotHof(col("a"), col("b")).as("h")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("DoubleVecDot on cast arrays == FloatVecDot on float arrays") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val mism = emb.select(
        NativeExpressions.floatVecDot(col("embedding"), col("embedding")).as("f"),
        NativeExpressions.doubleVecDot(
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).as("d"))
      .filter(col("f") =!= col("d")).count()
    assert(mism == 0)
  }

  test("SimHash60 handles empty and single-token inputs") {
    import spark.implicits._
    val df = Seq("", "one", "a b").toDF("text")
    val out = df.select(
      NativeExpressions.simhash60(tokens(col("text"))).as("n"),
      TextDedup.simhashHof(col("text")).as("h")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
