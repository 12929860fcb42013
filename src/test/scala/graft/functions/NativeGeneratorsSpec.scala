package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.NativeGenerators.wordNgramGen
import graft.functions.NativeExpressions.wordNgrams
import graft.functions.TextFunctions.tokens

/** WordNgramGen must be row-for-row identical to the scalar
  * explode(wordNgrams(...)) path, and must plan as a Generate.
  */
class NativeGeneratorsSpec extends SparkSpec {
  import spark.implicits._

  test("generator output equals explode(wordNgrams) on the corpus") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
    val viaExplode = docs
      .select(col("doc_id"), explode(wordNgrams(col("ts"), 3)).as("gram"))
      .groupBy("doc_id", "gram").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaGen = docs
      .select(col("doc_id"), wordNgramGen(col("ts"), 3).as("gram"))
      .groupBy("doc_id", "gram").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaGen === viaExplode)
    assert(viaGen.nonEmpty)
  }

  test("short, empty and null token arrays emit nothing") {
    val df = Seq(
      (1L, Some(Seq("a", "b"))), // shorter than n=3
      (2L, Some(Seq.empty[String])),
      (3L, None)
    ).toDF("id", "ts")
    assert(df.select(col("id"), wordNgramGen(col("ts"), 3).as("g"))
      .count() == 0)
  }

  test("plans as Generate (the explode machinery, no array materialization)") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(tokens(col("text")).as("ts"))
    val plan = docs.select(wordNgramGen(col("ts"), 3).as("gram"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"))
    assert(plan.contains("wordngramgen") || plan.contains("WordNgramGen"))
  }
}
