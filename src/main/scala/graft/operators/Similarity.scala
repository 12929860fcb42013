package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search and embedding near-dup detection
  * over `array<float>` embedding columns.
  *
  * Scale design (100 TB / billions of vectors):
  *   - [[bruteForceTopK]]: broadcast the (small) query set, score every
  *     candidate partition-locally, then rank. The candidate scan is
  *     embarrassingly parallel; only the (|Q| × k)-bounded ranked rows
  *     shuffle. The correctness reference.
  *   - [[lshBucket]] + [[lshTopK]]: random-hyperplane LSH — vectors hash
  *     to a bucket from the signs of `numPlanes` deterministic projections;
  *     candidates are only same-bucket pairs, so the join is equi-key and
  *     shuffle-partitioned by bucket (the 100 TB path; recall is tunable
  *     via numPlanes / multi-probe).
  *   - [[nearDupPairs]]: all-pairs cosine ≥ threshold; quadratic — use the
  *     LSH bucket join as the prefilter at scale.
  *
  * Plane weights are derived from hash60("plane:dim") — computed once on
  * the driver and shipped as a literal matrix (the broadcast-plane-matrix
  * production shape) — so the DuckDB oracle reproduces the exact same
  * signatures by hashing in SQL.
  */
object Similarity {

  private val pow2: Column = array((0 until 60).map(b => lit(1L << b)): _*)

  /** ±1 weight of hyperplane `p` at dimension `j`: bit 0 of hash60("p:j"),
    * precomputed on the driver (same value the oracle derives in SQL) and
    * shipped as a literal — the "broadcast plane matrix" production shape;
    * no per-row hashing.
    */
  private[operators] def planeWeight(p: Int, j: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$j".getBytes("UTF-8"))
    val hex = dig.map(b => f"$b%02x").mkString.substring(0, 15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucket id (one long from numPlanes sign bits),
    * computed with sequential-fold HOFs over a literal plane matrix —
    * bit-reproducible in DuckDB.
    */
  def lshBucket(emb: Column, numPlanes: Int, dim: Int): Column = {
    val planes: Column = array((0 until numPlanes).map(p =>
      array((0 until dim).map(j => lit(planeWeight(p, j))): _*)): _*)
    aggregate(
      transform(sequence(lit(0), lit(numPlanes - 1)), p => {
        val row = element_at(planes, p + 1)
        val proj = aggregate(
          sequence(lit(0), lit(dim - 1)),
          lit(0.0),
          (acc, j) => acc + element_at(row, j + 1) * element_at(emb, j + 1).cast("double"))
        when(proj > 0, element_at(pow2, p + 1)).otherwise(lit(0L))
      }),
      lit(0L),
      (acc, v) => acc + v)
  }

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * Output: (query_id, neighbor_id, cos_fp, rank), rank 1..k by
    * (cos_fp desc, neighbor_id asc).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // norms once per row, not once per pair — same arithmetic, 3× fewer flops
    val q = queries.select(col("query_id"), col("qv"), norm(col("qv")).as("qn"))
    val c = candidates.select(col("neighbor_id"), col("cv"), norm(col("cv")).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_fp").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_fp",
        cosineFp6PreNorm(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_fp", "rank")
  }

  /** LSH-bucketed top-k: like [[bruteForceTopK]] but candidates are
    * restricted to the query's bucket (equi-join on bucket id).
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, numPlanes: Int,
      dim: Int, k: Int): DataFrame = {
    val q = queries.select(col("query_id"), col("qv"), norm(col("qv")).as("qn"),
      lshBucket(col("qv"), numPlanes, dim).as("bucket"))
    val c = candidates.select(col("neighbor_id"), col("cv"), norm(col("cv")).as("cn"),
      lshBucket(col("cv"), numPlanes, dim).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_fp").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_fp",
        cosineFp6PreNorm(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_fp", "rank")
  }

  /** IVF cell assignment: each vector goes to its best centroid by
    * (cos_fp desc, centroid_id asc) — a broadcast join against the (small)
    * centroid set plus one partial-aggregating argmax per vector; at scale
    * this is the standard IVF build shuffle (O(N) rows).
    *
    * Input: df(id, v), centroids(cid, cv). Output: (id, v, cid).
    */
  def ivfAssign(df: DataFrame, centroids: DataFrame): DataFrame =
    df.join(broadcast(centroids))
      .withColumn("cos_fp", cosineFp6(col("v"), col("cv")))
      .groupBy("id")
      .agg(
        first(col("v")).as("v"), // id → v is functional
        max_by(col("cid"), struct(col("cos_fp"), -col("cid"))).as("cid"))

  /** IVF top-k search: queries probe their `nprobe` best centroids and
    * score only vectors assigned to those cells — the candidate set (and
    * the shuffle) shrinks by ~|cells|/nprobe vs brute force. Centroids
    * here are a deterministic data subset; production would k-means
    * iterate, the probe/partition plumbing is identical.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      centroids: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(
      candidates.select(col("neighbor_id").as("id"), col("cv").as("v")),
      centroids)
      .select(col("id").as("neighbor_id"), col("v").as("cv"), col("cid"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cos_fp").desc, col("cid").asc)
    val probes = queries.join(broadcast(centroids))
      .withColumn("cos_fp", cosineFp6(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cos_fp").desc, col("neighbor_id").asc)
    assigned.join(probes, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_fp", cosineFp6(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_fp", "rank")
  }

  /** All-pairs embedding near-dups: (id_a < id_b, cos_fp ≥ threshold). */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String,
      minCosFp: Long): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).as("va"),
      norm(col(embCol)).as("na"))
    val b = df.select(col(idCol).as("id_b"), col(embCol).as("vb"),
      norm(col(embCol)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_fp",
        cosineFp6PreNorm(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos_fp") >= minCosFp)
      .select("id_a", "id_b", "cos_fp")
  }
}
