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
    * shipped with the plan — the "broadcast plane matrix" production
    * shape; no per-row hashing.
    */
  private[operators] def planeWeight(p: Int, j: Int): Double =
    graft.functions.NativeExpressions.LshBucket.planeWeight(p, j)

  /** Random-hyperplane LSH bucket id (one long from numPlanes sign bits),
    * evaluated by the native codegen'd
    * [[graft.functions.NativeExpressions.LshBucket]] Catalyst expression;
    * [[lshBucketHof]] is the bit-identical HOF reference it is tested
    * against (interpreted, measured 4× slower end-to-end on q20).
    */
  def lshBucket(emb: Column, numPlanes: Int, dim: Int,
      planeOffset: Int = 0): Column =
    graft.functions.NativeExpressions.lshBucket(emb, numPlanes, dim, planeOffset)

  /** HOF reference implementation of [[lshBucket]]: sequential-fold HOFs
    * over a literal plane matrix — bit-reproducible in DuckDB, kept for
    * cross-checking the native expression.
    */
  def lshBucketHof(emb: Column, numPlanes: Int, dim: Int): Column = {
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

  /** [[bruteForceTopK]] with the ranking done by the custom
    * [[graft.functions.NativeAggregates.TopKPairAgg]] bounded-heap
    * aggregate instead of a row_number window: same scoring, same
    * (cos_fp desc, neighbor_id asc) order, BIT-IDENTICAL output — but
    * the shuffle after scoring carries ≤ k pairs per (query ×
    * partition) rather than every scored pair, and there is no sort.
    * At 100 TB this is the only viable brute-force shape: scored pairs
    * are |queries|·|corpus| and must never be shuffled wholesale.
    */
  def bruteForceTopKAgg(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import graft.functions.NativeAggregates.topKPair
    val q = queries.select(col("query_id"), col("qv"), norm(col("qv")).as("qn"))
    val c = candidates.select(col("neighbor_id"), col("cv"), norm(col("cv")).as("cn"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_fp",
        cosineFp6PreNorm(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .groupBy("query_id")
      .agg(topKPair(col("cos_fp"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        col("s.score").as("cos_fp"),
        (col("pos") + 1).cast("long").as("rank"))
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

  /** Multi-probe variant of [[lshTopK]]: each query probes its own bucket
    * PLUS every bucket at Hamming distance 1 (one flipped plane sign) —
    * numPlanes+1 probes. Rationale: a near neighbor that lands on the
    * wrong side of ONE hyperplane is the dominant LSH miss mode; probing
    * the adjacent buckets recovers those at (numPlanes+1)/2^numPlanes of
    * the corpus scanned instead of growing tables. Candidates still come
    * from ONE bucket table (no extra hashing); only the tiny query side
    * expands, so the join stays equi-key on bucket — the scale shape is
    * unchanged.
    */
  def lshTopKMultiProbe(queries: DataFrame, candidates: DataFrame,
      numPlanes: Int, dim: Int, k: Int): DataFrame = {
    val qb = queries.select(col("query_id"), col("qv"), norm(col("qv")).as("qn"),
      lshBucket(col("qv"), numPlanes, dim).as("bucket0"))
    // bucket0 plus its numPlanes Hamming-1 neighbors; all distinct, so a
    // (query, candidate) pair can match at most one probe — no dedup
    val probes = array(col("bucket0") +:
      (0 until numPlanes).map(p => col("bucket0").bitwiseXOR(lit(1L << p))): _*)
    val q = qb.withColumn("bucket", explode(probes)).drop("bucket0")
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

  /** Hamming-≤2 multi-probe: own bucket, every 1-flip bucket, and every
    * 2-flip bucket — 1 + P + P(P−1)/2 probes for P planes. The next rung
    * after [[lshTopKMultiProbe]] on the probes-vs-recall curve: two
    * misjudged hyperplanes is the second-largest miss mode, and probing
    * pairs of flips recovers it while still scanning only the query-side
    * expansion (candidates hash once; the join stays equi-key on bucket).
    * All probe buckets are distinct (distinct XOR masks), so a
    * (query, candidate) pair matches at most one probe — no dedup needed.
    */
  def lshTopKMultiProbe2(queries: DataFrame, candidates: DataFrame,
      numPlanes: Int, dim: Int, k: Int): DataFrame = {
    val qb = queries.select(col("query_id"), col("qv"), norm(col("qv")).as("qn"),
      lshBucket(col("qv"), numPlanes, dim).as("bucket0"))
    val flips1 = (0 until numPlanes)
      .map(p => col("bucket0").bitwiseXOR(lit(1L << p)))
    val flips2 = for {
      p <- 0 until numPlanes
      r <- (p + 1) until numPlanes
    } yield col("bucket0").bitwiseXOR(lit((1L << p) | (1L << r)))
    val q = qb.withColumn("bucket",
        explode(array((col("bucket0") +: flips1) ++ flips2: _*)))
      .drop("bucket0")
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

  /** Full OR-amplified LSH: `numTables` independent plane families
    * (plane offsets t·numPlanes), each probed multi-probe style (own
    * bucket + all Hamming-1 flips). A pair is a candidate if it
    * collides in ANY (table, bucket) — the textbook recall amplifier:
    * P(miss) = Π_t P(miss_t). Candidates hash L times row-locally (the
    * native expression, no shuffle) and the bucket table grows ×L; the
    * join stays a single equi-join on (table, bucket). Collisions in
    * several tables are deduplicated by the per-query rank, which
    * scores each distinct neighbor once via max — candidates carry no
    * duplicate scoring work into the ranking.
    */
  def lshTopKMultiTable(queries: DataFrame, candidates: DataFrame,
      numPlanes: Int, dim: Int, numTables: Int, k: Int): DataFrame = {
    def withBuckets(df: DataFrame, vec: String, probe: Boolean): DataFrame = {
      val tb = (0 until numTables).flatMap { t =>
        val b = lshBucket(col(vec), numPlanes, dim, t * numPlanes)
        val probes =
          if (probe) b +: (0 until numPlanes).map(p => b.bitwiseXOR(lit(1L << p)))
          else Seq(b)
        probes.map(pb => struct(lit(t).as("t"), pb.as("b")))
      }
      df.withColumn("tb", explode(array(tb: _*)))
        .withColumn("tbl", col("tb.t")).withColumn("bucket", col("tb.b"))
        .drop("tb")
    }
    val q = withBuckets(
      queries.select(col("query_id"), col("qv"), norm(col("qv")).as("qn")),
      "qv", probe = true)
    val c = withBuckets(
      candidates.select(col("neighbor_id"), col("cv"), norm(col("cv")).as("cn")),
      "cv", probe = false)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_fp").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // a pair colliding in several tables scores once: group to distinct
      // pairs first (cos is pair-functional, max = the single value)
      .groupBy("query_id", "neighbor_id")
      .agg(max(cosineFp6PreNorm(dot(col("qv"), col("cv")), col("qn"), col("cn")))
        .as("cos_fp"))
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
    * `centScore` scores a vector against a centroid — the default is the
    * float-vector cosine; pass a double-path scorer when centroids are
    * `array<double>` (k-means means).
    */
  def ivfAssign(df: DataFrame, centroids: DataFrame,
      centScore: (Column, Column) => Column = cosineFp6): DataFrame =
    df.join(broadcast(centroids))
      .withColumn("cos_fp", centScore(col("v"), col("cv")))
      .groupBy("id")
      .agg(
        first(col("v")).as("v"), // id → v is functional
        max_by(col("cid"), struct(col("cos_fp"), -col("cid"))).as("cid"))

  /** IVF top-k search: queries probe their `nprobe` best centroids and
    * score only vectors assigned to those cells — the candidate set (and
    * the shuffle) shrinks by ~|cells|/nprobe vs brute force. Centroids
    * can be a deterministic data subset (cheap build) or
    * [[kmeansCentroids]] means (better-balanced cells); `centScore` must
    * match the centroid representation. Final candidate ranking is always
    * the exact float-vector cosine.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      centroids: DataFrame, nprobe: Int, k: Int,
      centScore: (Column, Column) => Column = cosineFp6): DataFrame = {
    val assigned = ivfAssign(
      candidates.select(col("neighbor_id").as("id"), col("cv").as("v")),
      centroids, centScore)
      .select(col("id").as("neighbor_id"), col("v").as("cv"), col("cid"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cos_fp").desc, col("cid").asc)
    val probes = queries.join(broadcast(centroids))
      .withColumn("cos_fp", centScore(col("qv"), col("cv")))
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

  /** Scores a FLOAT vector against an `array<double>` k-means centroid:
    * cast the floats to double (exact) and run the double-path cosine —
    * bit-identical to scoring the same values through the float path.
    */
  val centScoreD: (Column, Column) => Column =
    (v, cv) => cosineFp6D(v.cast("array<double>"), cv)

  /** Lloyd's-iterated k-means centroids as pure DataFrame ops — the IVF
    * build step production systems run before [[ivfTopK]]. Deterministic
    * and DuckDB-replayable by construction:
    *   - init: the first k vectors (cid = id), cast to `array<double>`;
    *   - assign: argmax cosine by (cos_fp desc, cid asc) — the same
    *     broadcast + partial-agg `max_by` shuffle as [[ivfAssign]];
    *   - update: QUANTIZED means — each component is
    *     `floor(sum(floor(x*1e6)) / n) / 1e6`. Integer sums are exact and
    *     order-independent, so the result is identical regardless of
    *     partition order or engine (a raw double mean would depend on
    *     fp addition order and could never hash-match the oracle).
    *
    * Each iteration's centroid table is k rows — cached so the lazily
    * composed plan doesn't re-derive iteration i-1 once per downstream
    * reference (callers clear the session cache between queries).
    *
    * Input: vecs(id, v: array<float>). Output: (cid, cv: array<double>).
    */
  def kmeansCentroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    // seed = the k SMALLEST ids (TakeOrderedAndProject, deterministic for
    // any id space — a `filter(id < k)` would silently under-seed sparse
    // or non-zero-based ids)
    var cent = vecs.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("v").cast("array<double>").as("cv"))
    for (_ <- 1 to iters) {
      val prev = cent
      val assigned = ivfAssign(vecs, cent, centScoreD)
      val comps = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("j", "x")))
        .withColumn("fpx",
          floor(col("x").cast("double") * lit(1000000.0)).cast("long"))
        .groupBy("cid", "j")
        .agg((floor(sum(col("fpx")) / count(lit(1))).cast("long") /
          lit(1000000.0)).as("comp"))
      cent = comps.groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("j"), col("comp")))),
          s => s.getField("comp")).as("cv"))
        .cache()
      // materialize the k-row result BEFORE releasing iteration i-1:
      // cent's lineage reads prev's cache, so dropping prev first would
      // force a full recompute back to the seed on first downstream use
      cent.count()
      prev.unpersist(blocking = false) // no-op on the uncached seed
    }
    cent
  }

  /** SemDeDup-style semantic dedup: restrict the near-dup search to
    * pairs that share a k-means cell (cluster-then-compare). At scale
    * this is THE way all-pairs cosine dedup (q21 / [[nearDupPairs]])
    * survives a 100× corpus: the quadratic blowup happens per cell
    * (Σ|cell|² ≪ N² for balanced cells, and cell count grows with the
    * corpus), the pair join is an equi-join keyed by cell id, and the
    * assignment is the same broadcast-centroid argmax shuffle as
    * [[ivfAssign]]. Like IVF search vs brute force, the cell restriction
    * trades recall for cost: only same-cell pairs are found — pairs the
    * q21 all-pairs scan confirms (the oracle checks the within-cell set
    * exactly, not approximately).
    *
    * Input: vecs(id, v), centroids(cid, cv). Output: (cid, id_a, id_b,
    * cos_fp ≥ minCosFp).
    */
  def semanticNearDupPairs(vecs: DataFrame, centroids: DataFrame,
      minCosFp: Long,
      centScore: (Column, Column) => Column = centScoreD): DataFrame = {
    // cached: BOTH sides of the within-cell self-join read the
    // assignment — uncached, the broadcast-centroid argmax (the
    // dominant scan) runs twice (plan-audit finding, round 4)
    val assigned = ivfAssign(vecs, centroids, centScore).cache()
    val a = assigned.select(col("cid"), col("id").as("id_a"),
      col("v").as("va"), norm(col("v")).as("na"))
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("v").as("vb"), norm(col("v")).as("nb"))
    a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_fp",
        cosineFp6PreNorm(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos_fp") >= minCosFp)
      .select("cid", "id_a", "id_b", "cos_fp")
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
