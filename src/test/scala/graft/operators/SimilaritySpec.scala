package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

/** Similarity-search operators: brute-force top-k sanity (self-similarity,
  * ranking), LSH bucket determinism, and LSH results ⊆ brute-force scores.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf("sf0.001"))

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
  private def cands = emb
    .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))

  test("cosine: self-similarity is 1 within fp rounding") {
    // sqrt(n)*sqrt(n) != n exactly in fp, so floor(cos*1e6) of a vector
    // with itself can land on 999999
    val self = emb.select(
      VectorFunctions.cosineFp6(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).head
    assert(self.getLong(0) >= 999999L && self.getLong(1) <= 1000000L)
  }

  test("brute-force top-k: k rows per query, ranks 1..k, descending cos") {
    val k = 5
    val top = Similarity.bruteForceTopK(queries, cands, k).cache()
    val perQuery = top.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) == k))
    val badOrder = top.as("t").groupBy("query_id")
      .agg(min(when(col("rank") === 1, col("cos_fp"))).as("first"),
        max(when(col("rank") === k, col("cos_fp"))).as("last"))
      .filter(col("first") < col("last")).count()
    assert(badOrder == 0, "rank-1 cos must be >= rank-k cos")
  }

  test("LSH top-k is a subset of same-bucket brute-force pairs") {
    val lsh = Similarity.lshTopK(queries, cands, numPlanes = 6, dim = 64, k = 3)
    val brute = Similarity.bruteForceTopK(queries, cands, k = cands.count().toInt - 1)
    val lshPairs = lsh.select("query_id", "neighbor_id", "cos_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brutePairs = brute.select("query_id", "neighbor_id", "cos_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(lshPairs.forall { case (k2, c) => brutePairs.get(k2).contains(c) },
      "LSH cos scores must agree with brute-force for the same pair")
  }

  test("lsh bucket is deterministic and uses exactly numPlanes bits") {
    val b = emb.select(Similarity.lshBucket(col("embedding"), 6, 64).as("b"))
      .agg(min("b"), max("b")).head
    assert(b.getLong(0) >= 0 && b.getLong(1) < 64)
  }
}
