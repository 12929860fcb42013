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

  test("multi-probe ladder: candidate coverage grows monotonically lsh ⊆ mp ⊆ mp2") {
    // recall@3 against brute-force truth must not DECREASE as probes widen;
    // mp2's probe set is a strict superset of mp's, which is a superset of
    // the single bucket — so hits can only grow
    def hits(df: org.apache.spark.sql.DataFrame, truth: Set[(Long, Long)]): Int =
      df.select("query_id", "neighbor_id").collect()
        .count(r => truth.contains((r.getLong(0), r.getLong(1))))
    val truth = Similarity.bruteForceTopK(queries, cands, 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val h1 = hits(Similarity.lshTopK(queries, cands, 6, 64, 3), truth)
    val h2 = hits(Similarity.lshTopKMultiProbe(queries, cands, 6, 64, 3), truth)
    val h3 = hits(Similarity.lshTopKMultiProbe2(queries, cands, 6, 64, 3), truth)
    assert(h1 <= h2 && h2 <= h3, s"recall ladder violated: $h1, $h2, $h3")
  }

  test("lsh bucket is deterministic and uses exactly numPlanes bits") {
    val b = emb.select(Similarity.lshBucket(col("embedding"), 6, 64).as("b"))
      .agg(min("b"), max("b")).head
    assert(b.getLong(0) >= 0 && b.getLong(1) < 64)
  }

  test("multi-table LSH top-k is a subset of brute-force with identical scores") {
    val mt = Similarity.lshTopKMultiTable(queries, cands,
      numPlanes = 6, dim = 64, numTables = 2, k = 3)
    val brute = Similarity.bruteForceTopK(queries, cands, k = cands.count().toInt - 1)
    val mtPairs = mt.select("query_id", "neighbor_id", "cos_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brutePairs = brute.select("query_id", "neighbor_id", "cos_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mtPairs.nonEmpty)
    assert(mtPairs.forall { case (k2, c) => brutePairs.get(k2).contains(c) },
      "multi-table cos scores must agree with brute-force for the same pair")
  }

  test("kmeans centroids: k cells, dim-length double vectors, 1e-6 grid") {
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val cent = Similarity.kmeansCentroids(vecs, k = 8, iters = 2).cache()
    val rows = cent.collect()
    assert(rows.length == 8, "no cell should empty out on this corpus")
    rows.foreach { r =>
      val cv = r.getSeq[Double](1)
      assert(cv.length == 64)
      // quantized means land on the 1e-6 grid (each is exactly some
      // long/1e6, so x*1e6 rounds back within double error) — the
      // property that makes the update order-independent and replayable
      cv.foreach(x =>
        assert(math.abs(x * 1e6 - math.round(x * 1e6)) < 1e-3,
          s"$x is not a quantized mean"))
    }
  }

  test("kmeans seeds the k smallest ids even for sparse, non-zero-based id spaces") {
    val vecs = emb.select((col("vec_id") * 7 + 1000).as("id"),
      col("embedding").as("v"))
    val cent = Similarity.kmeansCentroids(vecs, k = 8, iters = 1)
    assert(cent.count() == 8, "a filter(id < k) seed would return 0 centroids here")
  }

  test("kmeans iterations strictly reassign: iter-2 centroids differ from seeds") {
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val seeds = vecs.filter(col("id") < 8)
      .select(col("id"), col("v").cast("array<double>").as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cent = Similarity.kmeansCentroids(vecs, k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cent.keySet == seeds.keySet)
    assert(cent.exists { case (cid, cv) => cv != seeds(cid) },
      "means should move off the raw data-subset seeds")
  }

  test("ivfTopK with kmeans centroids returns k ranked rows per query") {
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val cent = Similarity.kmeansCentroids(vecs, k = 8, iters = 2)
    val top = Similarity.ivfTopK(queries, cands, cent, nprobe = 2, k = 3,
      Similarity.centScoreD)
    val perQuery = top.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L))
  }

  test("semantic dedup pairs = all-pairs near-dups restricted to shared cells") {
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val cent = Similarity.kmeansCentroids(vecs, k = 8, iters = 2).cache()
    val thr = 300000L
    val sem = Similarity.semanticNearDupPairs(vecs, cent, thr)
      .select("id_a", "id_b", "cos_fp").cache()
    assert(sem.count() > 0, "threshold should yield within-cell pairs here")
    // exactly the q21 all-pairs set ∩ same-cell pairs, scores identical
    val asg = Similarity.ivfAssign(vecs, cent, Similarity.centScoreD)
      .select(col("id"), col("cid"))
    val allPairs = Similarity
      .nearDupPairs(emb, "vec_id", "embedding", thr)
      .join(asg.select(col("id").as("id_a"), col("cid").as("ca")), "id_a")
      .join(asg.select(col("id").as("id_b"), col("cid").as("cb")), "id_b")
      .filter(col("ca") === col("cb"))
      .select("id_a", "id_b", "cos_fp")
    assert(sem.exceptAll(allPairs).isEmpty && allPairs.exceptAll(sem).isEmpty,
      "within-cell restriction of the all-pairs scan must match exactly")
  }
}
