package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}
import graft.operators.Similarity

/** Similarity search over the `embeddings` table (array<float> × 64).
  * Oracles rebuild the exact same sequential-fold float arithmetic with
  * DuckDB list functions, so even cosine values hash-match bit-for-bit
  * (verified: list_sum == left fold); ranking goes through floor(cos*1e6)
  * longs with id tiebreaks everywhere.
  */
object VectorQueries {

  /** DuckDB SQL for floor(cosine(a,b)*1e6) with the same op order as
    * [[graft.functions.VectorFunctions.cosineFp6]].
    */
  private[queries] def cosFpSql(a: String, b: String): String =
    s"""CAST(floor(
       |  list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
       |     * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
       |  * 1000000.0) AS BIGINT)""".stripMargin

  /** DuckDB SQL for the random-hyperplane LSH bucket of `e`, mirroring
    * [[graft.operators.Similarity.lshBucket]].
    */
  private def bucketSql(e: String, numPlanes: Int): String =
    s"""list_sum(list_transform(range(0, $numPlanes), p ->
       |  CASE WHEN list_sum(list_transform(range(0, len($e)), j ->
       |    (CASE WHEN (('0x'||substring(md5(p||':'||j),1,15))::BIGINT & 1) = 1
       |          THEN 1.0 ELSE -1.0 END) * CAST($e[j+1] AS DOUBLE))) > 0
       |  THEN (1::BIGINT << p) ELSE 0 END))""".stripMargin

  val q19KnnBruteForce = NamedQuery(
    "q19_knn_bruteforce",
    "Exact cosine top-5 for 10 query vectors over all embeddings: broadcast " +
      "query set, partition-local scoring, rank by (cos_fp desc, id).",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            |pairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q, c WHERE query_id <> neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM pairs)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  // 6 planes = 64 buckets: enough collisions at sf0.01-0.1 for real
  // candidate sets (16 planes left every query in a singleton bucket).
  // At billion-vector scale you'd raise planes and multi-probe instead.
  private val NumPlanes = 6

  val q20AnnLsh = NamedQuery(
    "q20_ann_lsh",
    "LSH-bucketed ANN (6 random hyperplanes → sign-bit bucket, equi-join " +
      "on bucket, cosine top-3 within bucket) — the billions-of-vectors " +
      "path: candidates bounded by bucket collisions, shuffle keyed by " +
      "bucket id.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          numPlanes = NumPlanes, dim = 64, k = 3)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding", NumPlanes)} AS bucket FROM embeddings),
            |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
            |pairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM pairs)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  val q21EmbeddingNearDup = NamedQuery(
    "q21_embedding_neardup",
    "Embedding-cosine near-dup pairs (cos ≥ 0.45 on this corpus): all-pairs " +
      "correctness reference; at scale the q20 LSH bucket join is the " +
      "prefilter.",
    (s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          minCosFp = 450000L)
        .orderBy("id_a", "id_b"),
    Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            |  ${cosFpSql("a.embedding", "b.embedding")} AS cos_fp
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE ${cosFpSql("a.embedding", "b.embedding")} >= 450000
            |ORDER BY id_a, id_b""".stripMargin))

  private val NCentroids = 16
  private val NProbe     = 2

  val q26AnnIvf = NamedQuery(
    "q26_ann_ivf",
    "IVF ANN: 16 deterministic centroid cells, vectors argmax-assigned, " +
      "queries probe their 2 best cells, cosine top-3 within probed " +
      "cells — candidate set shrinks ~|cells|/nprobe vs brute force.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          emb.filter(col("vec_id") < NCentroids)
            .select(col("vec_id").as("cid"), col("embedding").as("cv")),
          nprobe = NProbe, k = 3)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < $NCentroids),
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS ncv, cid FROM (
            |  SELECT e.vec_id, e.embedding, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent c) WHERE rn = 1),
            |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |probes AS (SELECT query_id, qv, cid FROM (
            |  SELECT q.query_id, q.qv, c.cid,
            |    row_number() OVER (PARTITION BY q.query_id
            |      ORDER BY ${cosFpSql("q.qv", "c.cv")} DESC, c.cid ASC) AS prn
            |  FROM q, cent c) WHERE prn <= $NProbe),
            |scored AS (SELECT p.query_id, a.neighbor_id,
            |    ${cosFpSql("p.qv", "a.ncv")} AS cos_fp
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  WHERE p.query_id <> a.neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM scored)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** DuckDB SQL for the mixed-representation cosine: a FLOAT list scored
    * against a DOUBLE list (k-means centroid) — floats cast to double
    * before multiplying, mirroring
    * [[graft.operators.Similarity.centScoreD]].
    */
  private def cosFpDSql(a: String, c: String): String =
    s"""CAST(floor(
       |  list_sum(list_transform(list_zip($a, $c), p -> CAST(p[1] AS DOUBLE)*p[2]))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
       |     * sqrt(list_sum(list_transform($c, x -> x*x))))
       |  * 1000000.0) AS BIGINT)""".stripMargin

  private val Dim = 64
  private val KmIters = 3
  private val NumTables = 2

  /** The q33 ANN quality harness: recall@3 of the LSH (q20) and IVF (q26)
    * candidate top-k against the brute-force ground truth (q19's method at
    * k=3). This is THE number an LLM-dedup/retrieval user tunes
    * bands/planes/nprobe by — here it is an oracle-checked query, so a
    * tuning change that silently craters recall fails CI.
    */
  val q33AnnRecall = NamedQuery(
    "q33_ann_recall",
    "recall@3 of LSH and IVF ANN vs exact brute-force top-3 per query: " +
      "hits = |approx ∩ truth|, recall_fp = floor(hits/3*1e6).",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val qdf = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val cdf = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val truth = Similarity.bruteForceTopK(qdf, cdf, 3)
        .select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(qdf, cdf, NumPlanes, Dim, 3)
        .select("query_id", "neighbor_id")
      val mp = Similarity.lshTopKMultiProbe(qdf, cdf, NumPlanes, Dim, 3)
        .select("query_id", "neighbor_id")
      val mt = Similarity.lshTopKMultiTable(qdf, cdf, NumPlanes, Dim, NumTables, 3)
        .select("query_id", "neighbor_id")
      val ivf = Similarity.ivfTopK(qdf, cdf, cent, NProbe, 3)
        .select("query_id", "neighbor_id")
      val base = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      val lh = truth.join(lsh, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("lsh_hits"))
      val mh = truth.join(mp, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("mp_hits"))
      val th = truth.join(mt, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("mt_hits"))
      val ih = truth.join(ivf, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("ivf_hits"))
      base.join(lh, Seq("query_id"), "left_outer")
        .join(mh, Seq("query_id"), "left_outer")
        .join(th, Seq("query_id"), "left_outer")
        .join(ih, Seq("query_id"), "left_outer")
        .select(col("query_id"), col("n_truth"),
          coalesce(col("lsh_hits"), lit(0L)).as("lsh_hits"),
          coalesce(col("mp_hits"), lit(0L)).as("mp_hits"),
          coalesce(col("mt_hits"), lit(0L)).as("mt_hits"),
          coalesce(col("ivf_hits"), lit(0L)).as("ivf_hits"),
          floor(coalesce(col("lsh_hits"), lit(0L)) * lit(1000000.0) / col("n_truth"))
            .cast("long").as("lsh_recall_fp"),
          floor(coalesce(col("mp_hits"), lit(0L)) * lit(1000000.0) / col("n_truth"))
            .cast("long").as("mp_recall_fp"),
          floor(coalesce(col("mt_hits"), lit(0L)) * lit(1000000.0) / col("n_truth"))
            .cast("long").as("mt_recall_fp"),
          floor(coalesce(col("ivf_hits"), lit(0L)) * lit(1000000.0) / col("n_truth"))
            .cast("long").as("ivf_recall_fp"))
        .orderBy("query_id")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            |tpairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q, c WHERE query_id <> neighbor_id),
            |truth AS (SELECT query_id, neighbor_id FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank FROM tpairs) WHERE rank <= 3),
            |b AS (SELECT vec_id, embedding, ${bucketSql("embedding", NumPlanes)} AS bucket FROM embeddings),
            |lq AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
            |lc AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
            |lpairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM lq JOIN lc USING (bucket) WHERE query_id <> neighbor_id),
            |lsh AS (SELECT query_id, neighbor_id FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank FROM lpairs) WHERE rank <= 3),
            |mq AS (SELECT query_id, qv, unnest(${probeListSql("bucket")}) AS bucket FROM lq),
            |mpairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM mq JOIN lc USING (bucket) WHERE query_id <> neighbor_id),
            |mp AS (SELECT query_id, neighbor_id FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank FROM mpairs) WHERE rank <= 3),
            |mtb AS (SELECT vec_id, embedding, tbl,
            |    ${bucketTblSql("embedding", NumPlanes, "tbl")} AS bucket
            |  FROM embeddings, (SELECT unnest(range(0, $NumTables)) AS tbl)),
            |mtq AS (SELECT query_id, qv, tbl, unnest(${probeListSql("bucket")}) AS bucket
            |  FROM (SELECT vec_id AS query_id, embedding AS qv, tbl, bucket
            |        FROM mtb WHERE vec_id < 10)),
            |mtc AS (SELECT vec_id AS neighbor_id, embedding AS cv, tbl, bucket FROM mtb),
            |mtpairs AS (SELECT query_id, neighbor_id, MAX(${cosFpSql("qv", "cv")}) AS cos_fp
            |  FROM mtq JOIN mtc USING (tbl, bucket) WHERE query_id <> neighbor_id
            |  GROUP BY query_id, neighbor_id),
            |mt AS (SELECT query_id, neighbor_id FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank FROM mtpairs) WHERE rank <= 3),
            |cent AS (SELECT vec_id AS cid, embedding AS ccv FROM embeddings WHERE vec_id < $NCentroids),
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS ncv, cid FROM (
            |  SELECT e.vec_id, e.embedding, c2.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c2.ccv")} DESC, c2.cid ASC) AS rn
            |  FROM embeddings e, cent c2) WHERE rn = 1),
            |probes AS (SELECT query_id, qv, cid FROM (
            |  SELECT q.query_id, q.qv, c2.cid,
            |    row_number() OVER (PARTITION BY q.query_id
            |      ORDER BY ${cosFpSql("q.qv", "c2.ccv")} DESC, c2.cid ASC) AS prn
            |  FROM q, cent c2) WHERE prn <= $NProbe),
            |scored AS (SELECT p.query_id, a.neighbor_id,
            |    ${cosFpSql("p.qv", "a.ncv")} AS cos_fp
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  WHERE p.query_id <> a.neighbor_id),
            |ivf AS (SELECT query_id, neighbor_id FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank FROM scored) WHERE rank <= 3),
            |base AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
            |lh AS (SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS lsh_hits FROM truth t
            |  JOIN lsh l ON t.query_id = l.query_id AND t.neighbor_id = l.neighbor_id
            |  GROUP BY t.query_id),
            |mh AS (SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS mp_hits FROM truth t
            |  JOIN mp m ON t.query_id = m.query_id AND t.neighbor_id = m.neighbor_id
            |  GROUP BY t.query_id),
            |th AS (SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS mt_hits FROM truth t
            |  JOIN mt m ON t.query_id = m.query_id AND t.neighbor_id = m.neighbor_id
            |  GROUP BY t.query_id),
            |ih AS (SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS ivf_hits FROM truth t
            |  JOIN ivf i ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
            |  GROUP BY t.query_id)
            |SELECT base.query_id, n_truth,
            |  COALESCE(lsh_hits, 0) AS lsh_hits, COALESCE(mp_hits, 0) AS mp_hits,
            |  COALESCE(mt_hits, 0) AS mt_hits, COALESCE(ivf_hits, 0) AS ivf_hits,
            |  CAST(floor(COALESCE(lsh_hits, 0)*1000000.0/n_truth) AS BIGINT) AS lsh_recall_fp,
            |  CAST(floor(COALESCE(mp_hits, 0)*1000000.0/n_truth) AS BIGINT) AS mp_recall_fp,
            |  CAST(floor(COALESCE(mt_hits, 0)*1000000.0/n_truth) AS BIGINT) AS mt_recall_fp,
            |  CAST(floor(COALESCE(ivf_hits, 0)*1000000.0/n_truth) AS BIGINT) AS ivf_recall_fp
            |FROM base LEFT JOIN lh ON base.query_id = lh.query_id
            |LEFT JOIN mh ON base.query_id = mh.query_id
            |LEFT JOIN th ON base.query_id = th.query_id
            |LEFT JOIN ih ON base.query_id = ih.query_id
            |ORDER BY base.query_id""".stripMargin))

  /** DuckDB list of a query bucket's multi-probe set: itself plus each
    * single-plane flip (Hamming-1 neighbors) — mirrors
    * [[graft.operators.Similarity.lshTopKMultiProbe]].
    */
  private def probeListSql(bucket: String): String =
    s"""list_concat([$bucket],
       |  list_transform(range(0, $NumPlanes), p -> xor($bucket, 1::BIGINT << p)))""".stripMargin

  val q36AnnLshMultiProbe = NamedQuery(
    "q36_ann_lsh_multiprobe",
    "Multi-probe LSH ANN: queries probe their own bucket plus all " +
      "Hamming-1 buckets (one flipped hyperplane) — recovers the " +
      "dominant single-plane miss mode; q33 quantifies the recall gain " +
      "over single-probe q20.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKMultiProbe(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          numPlanes = NumPlanes, dim = Dim, k = 3)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding", NumPlanes)} AS bucket FROM embeddings),
            |q0 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
            |q AS (SELECT query_id, qv,
            |    unnest(${probeListSql("bucket")}) AS bucket FROM q0),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
            |pairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM pairs)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** DuckDB list of a query bucket's Hamming-≤2 probe set: itself, each
    * 1-flip, and each 2-flip pair — mirrors
    * [[graft.operators.Similarity.lshTopKMultiProbe2]].
    */
  private def probe2ListSql(bucket: String): String =
    s"""list_concat(list_concat([$bucket],
       |  list_transform(range(0, $NumPlanes), p -> xor($bucket, 1::BIGINT << p))),
       |  flatten(list_transform(range(0, $NumPlanes), p ->
       |    list_transform(range(p + 1, $NumPlanes), r ->
       |      xor($bucket, (1::BIGINT << p) | (1::BIGINT << r))))))""".stripMargin

  val q57AnnLshMultiProbe2 = NamedQuery(
    "q57_ann_lsh_mp2",
    "Hamming-2 multi-probe LSH ANN: queries probe their bucket, all " +
      "1-flip buckets, and all 2-flip buckets (22 probes of 64) — the " +
      "next recall rung after q36 at ~1/3 of the corpus scanned, still " +
      "one equi-join on bucket.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKMultiProbe2(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          numPlanes = NumPlanes, dim = Dim, k = 3)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding", NumPlanes)} AS bucket FROM embeddings),
            |q0 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
            |q AS (SELECT query_id, qv,
            |    unnest(${probe2ListSql("bucket")}) AS bucket FROM q0),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
            |pairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM pairs)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** DuckDB bucket of table `tbl` (a column): plane family offset
    * tbl·numPlanes — mirrors the `planeOffset` of
    * [[graft.functions.NativeExpressions.LshBucket]].
    */
  private def bucketTblSql(e: String, numPlanes: Int, tbl: String): String =
    s"""list_sum(list_transform(range(0, $numPlanes), p ->
       |  CASE WHEN list_sum(list_transform(range(0, len($e)), j ->
       |    (CASE WHEN (('0x'||substring(md5(($tbl*$numPlanes + p)||':'||j),1,15))::BIGINT & 1) = 1
       |          THEN 1.0 ELSE -1.0 END) * CAST($e[j+1] AS DOUBLE))) > 0
       |  THEN (1::BIGINT << p) ELSE 0 END))""".stripMargin

  val q42AnnLshMultiTable = NamedQuery(
    "q42_ann_lsh_multitable",
    s"OR-amplified LSH ANN: $NumTables independent plane families, each " +
      "multi-probed (own bucket + Hamming-1 flips); candidate if " +
      "colliding in ANY table — P(miss) multiplies across tables. The " +
      "top recall rung of the q33 ladder.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKMultiTable(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          numPlanes = NumPlanes, dim = Dim, numTables = NumTables, k = 3)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH bt AS (SELECT vec_id, embedding, tbl
            |  FROM embeddings, (SELECT unnest(range(0, $NumTables)) AS tbl)),
            |b AS (SELECT vec_id, embedding, tbl,
            |    ${bucketTblSql("embedding", NumPlanes, "tbl")} AS bucket FROM bt),
            |q AS (SELECT query_id, qv, tbl, unnest(${probeListSql("bucket")}) AS bucket
            |  FROM (SELECT vec_id AS query_id, embedding AS qv, tbl, bucket
            |        FROM b WHERE vec_id < 10)),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, tbl, bucket FROM b),
            |pairs AS (SELECT query_id, neighbor_id, MAX(${cosFpSql("qv", "cv")}) AS cos_fp
            |  FROM q JOIN c USING (tbl, bucket) WHERE query_id <> neighbor_id
            |  GROUP BY query_id, neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM pairs)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** One k-means iteration's worth of DuckDB CTEs (assignment vs cent{i-1},
    * quantized component means, centroid rebuild) — mirrors one loop body
    * of [[graft.operators.Similarity.kmeansCentroids]].
    */
  private def kmIterSql(i: Int): String =
    s"""asg$i AS (SELECT vec_id, embedding, cid FROM (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosFpDSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
       |  FROM embeddings e, cent${i - 1} c) WHERE rn = 1),
       |comp$i AS (SELECT cid, j,
       |    CAST(floor(CAST(SUM(fpx) AS DOUBLE)/COUNT(*)) AS BIGINT)/1000000.0 AS comp
       |  FROM (SELECT a.cid, js.j,
       |      CAST(floor(CAST(a.embedding[js.j + 1] AS DOUBLE)*1000000.0) AS BIGINT) AS fpx
       |    FROM asg$i a, (SELECT unnest(range(0, $Dim)) AS j) js)
       |  GROUP BY cid, j),
       |cent$i AS (SELECT cid, list(comp ORDER BY j) AS cv FROM comp$i GROUP BY cid)""".stripMargin

  val q34AnnIvfKmeans = NamedQuery(
    "q34_ann_ivf_kmeans",
    s"IVF ANN with $KmIters Lloyd's-iterated k-means centroids (quantized " +
      "deterministic means), then the q26 probe/search: better-balanced " +
      "cells than the raw data-subset seeds, same shuffle shape.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val cent = Similarity.kmeansCentroids(vecs, NCentroids, KmIters)
      Similarity.ivfTopK(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          cent, nprobe = NProbe, k = 3, Similarity.centScoreD)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH cent0 AS (SELECT vec_id AS cid,
            |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            |  FROM embeddings WHERE vec_id < $NCentroids),
            |${(1 to KmIters).map(kmIterSql).mkString(",\n")},
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS ncv, cid FROM (
            |  SELECT e.vec_id, e.embedding, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpDSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent$KmIters c) WHERE rn = 1),
            |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |probes AS (SELECT query_id, qv, cid FROM (
            |  SELECT q.query_id, q.qv, c.cid,
            |    row_number() OVER (PARTITION BY q.query_id
            |      ORDER BY ${cosFpDSql("q.qv", "c.cv")} DESC, c.cid ASC) AS prn
            |  FROM q, cent$KmIters c) WHERE prn <= $NProbe),
            |scored AS (SELECT p.query_id, a.neighbor_id,
            |    ${cosFpSql("p.qv", "a.ncv")} AS cos_fp
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  WHERE p.query_id <> a.neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM scored)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** q85: SemDeDup — semantic (embedding-space) dedup done the way it
    * scales: cluster with the q34 k-means centroids, then search for
    * near-dup pairs ONLY within each cell. The q21 all-pairs join is
    * O(N²) in one monolithic join; here the quadratic work happens per
    * cell and the pair search is an equi-join keyed by cell id, so a
    * 100× corpus spreads across ~100× more cells instead of 10,000×
    * more comparisons. Oracle replays the full chain — 3 Lloyd's
    * iterations, final assignment, within-cell pairs — so the exact
    * pair set (a subset of q21's, restricted to same-cell) is
    * hash-checked cross-engine.
    */
  val q85SemanticDedup = NamedQuery(
    "q85_semantic_dedup",
    s"SemDeDup: $KmIters-iteration k-means cells, then within-cell " +
      "cosine near-dup pairs (cos_fp >= 450000) via a cell-keyed " +
      "equi-join — the cluster-then-compare scale path for q21.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val cent = Similarity.kmeansCentroids(vecs, NCentroids, KmIters)
      Similarity.semanticNearDupPairs(vecs, cent, minCosFp = 450000L)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH cent0 AS (SELECT vec_id AS cid,
            |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            |  FROM embeddings WHERE vec_id < $NCentroids),
            |${(1 to KmIters).map(kmIterSql).mkString(",\n")},
            |asg AS (SELECT vec_id, embedding, cid FROM (
            |  SELECT e.vec_id, e.embedding, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpDSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent$KmIters c) WHERE rn = 1)
            |SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
            |  ${cosFpSql("a.embedding", "b.embedding")} AS cos_fp
            |FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
            |WHERE ${cosFpSql("a.embedding", "b.embedding")} >= 450000
            |ORDER BY id_a, id_b""".stripMargin))

  /** q102: cross-label semantic pair mining — the bitext-mining /
    * cross-source-duplicate shape: same cluster-then-compare plan as
    * SemDeDup (q85), but the pair filter keeps only pairs whose LABELS
    * DIFFER — mining near-identical content across corpora (translation
    * pairs across languages, syndicated articles across sources,
    * re-posts across crawls). Plan shape is q85's: broadcast-centroid
    * argmax assignment, cell-keyed equi-join, row-local cosine on
    * candidates; the label constraint is a residual predicate on the
    * joined pair, and labels ride the assignment row (no extra join
    * against the corpus). Deterministic-subset centroids (q26's
    * discipline) keep the oracle replayable.
    */
  val q102CrossLabelPairs = NamedQuery(
    "q102_cross_label_pairs",
    s"Cross-label semantic pairs: $NCentroids deterministic cells, " +
      "within-cell cosine >= 0.40 pairs whose labels differ — the " +
      "bitext/cross-source mining shape.",
    (s, d) => {
      import graft.functions.VectorFunctions.cosineFp6
      val emb = Tables.embeddings(s, d)
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
        col("label").cast("long").as("lbl"))
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.ivfAssign(
          vecs.select(col("id"), col("v")), cent, cosineFp6)
        .join(vecs.select(col("id"), col("lbl")), Seq("id"))
        .cache() // both sides of the pair self-join read it
      val a = assigned.select(col("cid"), col("id").as("id_a"),
        col("v").as("va"), col("lbl").as("label_a"))
      val b = assigned.select(col("cid"), col("id").as("id_b"),
        col("v").as("vb"), col("lbl").as("label_b"))
      a.join(b, Seq("cid"))
        .filter(col("id_a") < col("id_b") &&
          col("label_a") =!= col("label_b"))
        .withColumn("cos_fp", cosineFp6(col("va"), col("vb")))
        .filter(col("cos_fp") >= 400000L)
        .select("id_a", "id_b", "label_a", "label_b", "cos_fp")
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv
            |  FROM embeddings WHERE vec_id < $NCentroids),
            |asg AS (SELECT vec_id, embedding, label, cid FROM (
            |  SELECT e.vec_id, e.embedding, e.label, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent c) WHERE rn = 1)
            |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            |  CAST(a.label AS BIGINT) AS label_a,
            |  CAST(b.label AS BIGINT) AS label_b,
            |  ${cosFpSql("a.embedding", "b.embedding")} AS cos_fp
            |FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
            |WHERE a.label <> b.label
            |  AND ${cosFpSql("a.embedding", "b.embedding")} >= 400000
            |ORDER BY id_a, id_b""".stripMargin))

  // 1e6/log2(pos+1) for pos 1..3, floored — shared LITERALS on both
  // engines, so the usual cross-engine log() drift cannot exist
  private val NdcgW = Seq(1000000L, 630929L, 500000L)
  private val IdcgFp6 = 3 * NdcgW(0) + 2 * NdcgW(1) + 1 * NdcgW(2) // rel 3,2,1

  /** q109: ranked-retrieval QUALITY metrics — q33 measures set recall;
    * this scores the ORDER: per query, MRR (reciprocal rank of the true
    * nearest neighbor in the IVF result) and NDCG@3 (graded relevance
    * rel = 4 − truth_rank, discounts 1/log2(pos+1) as shared fp6
    * literal constants) of IVF top-3 vs brute-force truth. All integer
    * math: rr = 1e6 div rank, dcg = Σ rel·w exact products,
    * ndcg = (dcg·1e6) div idcg — the eval numbers an ANN user tunes
    * nprobe by, as hash-checked outputs rather than offline scripts.
    */
  val q109RetrievalMetrics = NamedQuery(
    "q109_retrieval_metrics",
    "MRR and NDCG@3 of IVF ANN vs brute-force truth per query, " +
      "integer-exact (shared fp6 discount literals).",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val qdf = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val cdf = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val truth = Similarity.bruteForceTopK(qdf, cdf, 3)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_t"))
      val ivf = Similarity.ivfTopK(qdf, cdf, cent, NProbe, 3)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_a"))
      val w = when(col("rank_a") === 1, NdcgW(0))
        .when(col("rank_a") === 2, NdcgW(1))
        .otherwise(NdcgW(2))
      val scored = ivf
        .join(truth, Seq("query_id", "neighbor_id"), "left_outer")
        .withColumn("rel",
          coalesce(lit(4L) - col("rank_t"), lit(0L)))
        .withColumn("w", w)
      scored.groupBy("query_id")
        .agg(sum(col("rel") * col("w")).as("dcg_fp6"),
          max(when(col("rank_t") === 1,
            expr("1000000 div rank_a")).otherwise(0L)).as("rr_fp6"))
        .withColumn("ndcg_fp6",
          expr(s"CAST((dcg_fp6 * 1000000) div $IdcgFp6 AS BIGINT)"))
        .select(col("query_id"), col("rr_fp6"),
          col("dcg_fp6").cast("long").as("dcg_fp6"), col("ndcg_fp6"))
        .orderBy("query_id")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            |tpairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q, c WHERE query_id <> neighbor_id),
            |truth AS (SELECT query_id, neighbor_id,
            |    CAST(rank_t AS BIGINT) AS rank_t FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank_t FROM tpairs)
            |  WHERE rank_t <= 3),
            |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
            |  WHERE vec_id < $NCentroids),
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS ncv, cid FROM (
            |  SELECT e.vec_id, e.embedding, cc.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "cc.cv")} DESC, cc.cid ASC) AS rn
            |  FROM embeddings e, cent cc) WHERE rn = 1),
            |probes AS (SELECT query_id, qv, cid FROM (
            |  SELECT q.query_id, q.qv, cc.cid,
            |    row_number() OVER (PARTITION BY q.query_id
            |      ORDER BY ${cosFpSql("q.qv", "cc.cv")} DESC, cc.cid ASC) AS prn
            |  FROM q, cent cc) WHERE prn <= $NProbe),
            |iscored AS (SELECT p.query_id, a.neighbor_id,
            |    ${cosFpSql("p.qv", "a.ncv")} AS cos_fp
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  WHERE p.query_id <> a.neighbor_id),
            |ivf AS (SELECT query_id, neighbor_id,
            |    CAST(rank_a AS BIGINT) AS rank_a FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS rank_a FROM iscored)
            |  WHERE rank_a <= 3),
            |j AS (SELECT i.query_id, i.rank_a,
            |    COALESCE(4 - t.rank_t, 0) AS rel, t.rank_t,
            |    CASE WHEN i.rank_a = 1 THEN ${NdcgW(0)}
            |         WHEN i.rank_a = 2 THEN ${NdcgW(1)}
            |         ELSE ${NdcgW(2)} END AS w
            |  FROM ivf i LEFT JOIN truth t
            |    ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id)
            |SELECT query_id,
            |  MAX(CASE WHEN rank_t = 1 THEN 1000000 // rank_a ELSE 0 END)
            |    AS rr_fp6,
            |  CAST(SUM(rel * w) AS BIGINT) AS dcg_fp6,
            |  CAST((CAST(SUM(rel * w) AS BIGINT) * 1000000) // $IdcgFp6
            |    AS BIGINT) AS ndcg_fp6
            |FROM j GROUP BY query_id ORDER BY query_id""".stripMargin))

  /** q75: distributed per-label centroids — the k-means UPDATE step
    * (and the class-prototype computation behind nearest-centroid
    * classifiers) as a hash-checked oracle query, over the first 8
    * dimensions. Determinism discipline: each component is floored to
    * fp6 BEFORE summation (float→double widening is exact, one
    * correctly-rounded multiply, floor → long), so the per-(label,dim)
    * sums are exact integer math — order-independent across any
    * partitioning, which raw float sums are not. The dim fan-out is a
    * row-local 8-way explode; one hash-agg with map-side partials
    * carries |labels|·8 rows through the shuffle. The mean does ONE
    * double divide of exact longs (floor semantics, not integral
    * `div`, whose truncation-toward-zero would diverge from floor on
    * negative sums).
    */
  val q75LabelCentroids = NamedQuery(
    "q75_label_centroids",
    "Per-label embedding centroids over dims 1-8: counts, exact " +
      "fp6-component sums, and floored fp6 means.",
    (s, d) => {
      val dims = explode(array((1 to 8).map(i =>
        struct(lit(i.toLong).as("dim"),
          element_at(col("embedding"), i).as("v"))): _*))
      Tables.embeddings(s, d)
        .select(col("label"), dims.as("p"))
        .select(col("label"), col("p.dim").as("dim"),
          floor(col("p.v").cast("double") * lit(1000000.0)).cast("long")
            .as("v_fp6"))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum("v_fp6").as("sum_fp6"))
        .withColumn("mean_fp6",
          floor(col("sum_fp6").cast("double") / col("n")).cast("long"))
        .orderBy("label", "dim")
    },
    Some("""SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(v_fp6) AS BIGINT) AS sum_fp6,
           |  CAST(floor(CAST(SUM(v_fp6) AS DOUBLE) / COUNT(*)) AS BIGINT)
           |    AS mean_fp6
           |FROM (SELECT label, dim,
           |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000.0)
           |      AS BIGINT) AS v_fp6
           |  FROM embeddings, (SELECT unnest(range(1, 9)) AS dim) d)
           |GROUP BY label, dim ORDER BY label, dim""".stripMargin))

  private val PqM = 8 // subspaces
  private val PqD = 8 // dims per subspace (8×8 = the 64-dim embedding)
  private val PqK = 16 // centroids per subspace

  /** q83: Product Quantization — the memory side of large-scale ANN
    * (FAISS IVF-PQ): each 64-dim float vector compresses to M=8
    * codebook indices (one byte-scale code per 8-dim subvector), a
    * 32× memory reduction that is what actually lets 100 TB of
    * embeddings fit an index. Codebooks are the subvectors of the
    * first K vec_ids (the deterministic-seed discipline of q26, so
    * DuckDB replays them; q34 shows the Lloyd's upgrade path).
    * Scale shape: the codebook is M·K rows — broadcast — and
    * assignment is row-local: per (vector, subspace), the argmin over
    * K squared-L2 distances, each a SEQUENTIAL in-row fold in double
    * (floats widened before subtracting; cross-row SUM of doubles
    * would be partition-order-dependent, so the per-vector error
    * folds over the m-sorted collected list instead). Ties break on
    * centroid id. Output: the code word as a string and the total
    * quantization error, fp6-floored.
    */
  val q83ProductQuantization = NamedQuery(
    "q83_product_quantization",
    s"PQ codes ($PqM×$PqK codebook from the first $PqK vectors): " +
      "per-vector code string + fp6 quantization error, argmin by " +
      "(distance, centroid id).",
    (s, d) => {
      def subspaces(v: org.apache.spark.sql.Column) = explode(array(
        (0 until PqM).map(m => struct(lit(m.toLong).as("m"),
          slice(v, m * PqD + 1, PqD).as("sub"))): _*))
      val emb = Tables.embeddings(s, d)
      val subs = emb.select(col("vec_id"), subspaces(col("embedding")).as("p"))
        .select(col("vec_id"), col("p.m").as("m"), col("p.sub").as("sub"))
      val cb = emb.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("k"), subspaces(col("embedding")).as("p"))
        .select(col("k"), col("p.m").as("m"), col("p.sub").as("cent"))
      val dists = subs.join(broadcast(cb), Seq("m"))
        .withColumn("dist", aggregate(
          zip_with(col("sub"), col("cent"), (x, y) => {
            val dx = x.cast("double") - y.cast("double")
            dx * dx
          }),
          lit(0.0), (acc, x) => acc + x))
      val codes = dists.groupBy("vec_id", "m")
        .agg(min(struct(col("dist"), col("k"))).as("s"))
        .select(col("vec_id"), col("m"), col("s.k").as("k"),
          col("s.dist").as("dist"))
      codes.groupBy("vec_id")
        .agg(sort_array(collect_list(struct(col("m"), col("k"), col("dist"))))
          .as("arr"))
        .select(col("vec_id"),
          concat_ws("-", transform(col("arr"), a => a.getField("k"))).as("code"),
          floor(aggregate(transform(col("arr"), a => a.getField("dist")),
            lit(0.0), (acc, x) => acc + x) * lit(1000000.0)).cast("long")
            .as("err_fp6"))
        .orderBy("vec_id")
    },
    Some(s"""WITH ms AS (SELECT unnest(range($PqM)) AS m),
            |subs AS (SELECT vec_id, m,
            |    embedding[m*$PqD+1 : m*$PqD+$PqD] AS sub
            |  FROM embeddings, ms),
            |cb AS (SELECT vec_id AS k, m,
            |    embedding[m*$PqD+1 : m*$PqD+$PqD] AS cent
            |  FROM embeddings, ms WHERE vec_id < $PqK),
            |dists AS (SELECT s.vec_id, s.m, c.k,
            |    list_sum(list_transform(range(1, $PqD+1), i ->
            |      (CAST(s.sub[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)) *
            |      (CAST(s.sub[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))))
            |      AS dist
            |  FROM subs s JOIN cb c USING (m)),
            |codes AS (SELECT vec_id, m, k, dist FROM (
            |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
            |      ORDER BY dist, k) AS rn FROM dists) WHERE rn = 1)
            |SELECT vec_id,
            |  array_to_string(list(k ORDER BY m), '-') AS code,
            |  CAST(floor(list_sum(list(dist ORDER BY m)) * 1000000.0)
            |    AS BIGINT) AS err_fp6
            |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin))

  private val RerankPool = 10 // ADC candidates re-ranked exactly per query

  /** q93: IVF-PQ search — the complete FAISS-style ANN read path,
    * composing q26's coarse cells with q83's PQ codes: (1) queries probe
    * their `NProbe` best cells; (2) candidates in probed cells are scored
    * by Asymmetric Distance Computation — the query's per-subspace
    * distance TABLE (query-sub vs each of the K codebook centroids,
    * 10×8×16 rows, broadcast) summed via each candidate's stored code,
    * never touching the candidate's float vector; (3) the best
    * `RerankPool` ADC candidates per query are re-ranked by exact cosine.
    * This is what makes 100 TB of embeddings searchable: the scan reads
    * M bytes of code per vector instead of 4·dim bytes (32× less I/O),
    * and the float vectors are fetched only for the tiny re-rank pool.
    * Determinism: ADC sums fold in subspace order (m-sorted collected
    * list, as q83), are fp6-floored before ranking, and every rank
    * tie-breaks on id — so DuckDB replays the identical pool and the
    * final top-3 hash-matches.
    */
  val q93IvfPqSearch = NamedQuery(
    "q93_ivfpq_search",
    s"IVF-PQ ANN: probe $NProbe of $NCentroids cells, ADC-score " +
      s"candidates through $PqM×$PqK PQ codes, exact-cosine re-rank of " +
      s"the top-$RerankPool pool to cosine top-3.",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.cosineFp6
      def subspaces(v: org.apache.spark.sql.Column) = explode(array(
        (0 until PqM).map(m => struct(lit(m.toLong).as("m"),
          slice(v, m * PqD + 1, PqD).as("sub"))): _*))
      def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(
          zip_with(a, b, (x, y) => {
            val dx = x.cast("double") - y.cast("double")
            dx * dx
          }),
          lit(0.0), (acc, x) => acc + x)
      val emb = Tables.embeddings(s, d)
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.ivfAssign(
          emb.select(col("vec_id").as("id"), col("embedding").as("v")), cent)
        .select(col("id").as("neighbor_id"), col("v").as("nv"), col("cid"))
      val cb = emb.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("k"), subspaces(col("embedding")).as("p"))
        .select(col("k"), col("p.m").as("m"), col("p.sub").as("cent"))
      val codes = emb
        .select(col("vec_id").as("neighbor_id"), subspaces(col("embedding")).as("p"))
        .select(col("neighbor_id"), col("p.m").as("m"), col("p.sub").as("sub"))
        .join(broadcast(cb), Seq("m"))
        .withColumn("dist", sqDist(col("sub"), col("cent")))
        .groupBy("neighbor_id", "m")
        .agg(min(struct(col("dist"), col("k"))).as("s"))
        .select(col("neighbor_id"), col("m"), col("s.k").as("code"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val wProbe = Window.partitionBy("query_id")
        .orderBy(col("cos_fp").desc, col("cid").asc)
      val probes = q.join(broadcast(cent))
        .withColumn("cos_fp", cosineFp6(col("qv"), col("cv")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= NProbe)
        .select(col("query_id"), col("cid"))
      val dtab = q.select(col("query_id"), subspaces(col("qv")).as("p"))
        .select(col("query_id"), col("p.m").as("m"), col("p.sub").as("qsub"))
        .join(broadcast(cb), Seq("m"))
        .withColumn("qd", sqDist(col("qsub"), col("cent")))
        .select(col("query_id"), col("m"), col("k").as("code"), col("qd"))
      val adc = probes.join(assigned.select("neighbor_id", "cid"), Seq("cid"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .join(codes, Seq("neighbor_id"))
        .join(broadcast(dtab), Seq("query_id", "m", "code"))
        .groupBy("query_id", "neighbor_id")
        .agg(floor(aggregate(
          transform(sort_array(collect_list(struct(col("m"), col("qd")))),
            x => x.getField("qd")),
          lit(0.0), (acc, x) => acc + x) * lit(1000000.0)).cast("long")
          .as("adc_fp6"))
      val wPool = Window.partitionBy("query_id")
        .orderBy(col("adc_fp6").asc, col("neighbor_id").asc)
      val wRank = Window.partitionBy("query_id")
        .orderBy(col("cos_fp").desc, col("neighbor_id").asc)
      adc.withColumn("arn", row_number().over(wPool))
        .filter(col("arn") <= RerankPool)
        .join(q, Seq("query_id"))
        .join(assigned.select("neighbor_id", "nv"), Seq("neighbor_id"))
        .withColumn("cos_fp", cosineFp6(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(wRank).cast("long"))
        .filter(col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_fp", "rank")
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH ms AS (SELECT unnest(range($PqM)) AS m),
            |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
            |  WHERE vec_id < $NCentroids),
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS nv, cid FROM (
            |  SELECT e.vec_id, e.embedding, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent c) WHERE rn = 1),
            |cb AS (SELECT vec_id AS k, m,
            |    embedding[m*$PqD+1 : m*$PqD+$PqD] AS cent
            |  FROM embeddings, ms WHERE vec_id < $PqK),
            |subs AS (SELECT vec_id AS neighbor_id, m,
            |    embedding[m*$PqD+1 : m*$PqD+$PqD] AS sub
            |  FROM embeddings, ms),
            |codes AS (SELECT neighbor_id, m, k AS code FROM (
            |  SELECT s.neighbor_id, s.m, c.k,
            |    row_number() OVER (PARTITION BY s.neighbor_id, s.m ORDER BY
            |      list_sum(list_transform(range(1, $PqD+1), i ->
            |        (CAST(s.sub[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)) *
            |        (CAST(s.sub[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)))),
            |      c.k) AS rn
            |  FROM subs s JOIN cb c USING (m)) WHERE rn = 1),
            |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            |  WHERE vec_id < 10),
            |probes AS (SELECT query_id, cid FROM (
            |  SELECT q.query_id, c.cid,
            |    row_number() OVER (PARTITION BY q.query_id
            |      ORDER BY ${cosFpSql("q.qv", "c.cv")} DESC, c.cid ASC) AS prn
            |  FROM q, cent c) WHERE prn <= $NProbe),
            |qsubs AS (SELECT query_id, m, qv[m*$PqD+1 : m*$PqD+$PqD] AS qsub
            |  FROM q, ms),
            |dtab AS (SELECT query_id, qs.m, c.k AS code,
            |    list_sum(list_transform(range(1, $PqD+1), i ->
            |      (CAST(qs.qsub[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)) *
            |      (CAST(qs.qsub[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)))) AS qd
            |  FROM qsubs qs JOIN cb c ON qs.m = c.m),
            |adc AS (SELECT p.query_id, a.neighbor_id,
            |    CAST(floor(list_sum(list(d.qd ORDER BY d.m)) * 1000000.0)
            |      AS BIGINT) AS adc_fp6
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  JOIN codes co ON co.neighbor_id = a.neighbor_id
            |  JOIN dtab d ON d.query_id = p.query_id AND d.m = co.m
            |    AND d.code = co.code
            |  WHERE p.query_id <> a.neighbor_id
            |  GROUP BY p.query_id, a.neighbor_id),
            |pool AS (SELECT query_id, neighbor_id FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY adc_fp6 ASC, neighbor_id ASC) AS arn FROM adc)
            |  WHERE arn <= $RerankPool),
            |scored AS (SELECT pool.query_id, pool.neighbor_id,
            |    ${cosFpSql("q.qv", "a.nv")} AS cos_fp
            |  FROM pool JOIN q USING (query_id)
            |  JOIN assigned a ON a.neighbor_id = pool.neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank
            |  FROM scored)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** q94: q19's exact brute-force KNN re-ranked by the custom
    * [[graft.functions.NativeAggregates.TopKPairAgg]] bounded-heap
    * aggregate — same scoring, same order, bit-identical rows (the
    * oracle IS q19's), but no window sort: the map side keeps a k-entry
    * heap per query, so the post-scoring exchange carries
    * |queries|·k·partitions pairs instead of |queries|·|corpus|. The
    * two queries cross-check each other — and the aggregate is the
    * shape that survives a 100× corpus.
    */
  val q94KnnTopKAgg = NamedQuery(
    "q94_knn_topk_agg",
    "Exact cosine top-5 for 10 query vectors via the bounded-heap " +
      "top-k aggregate (no window sort); bit-identical to q19.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopKAgg(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            |pairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q, c WHERE query_id <> neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM pairs)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  private val IndexCut = 400L // vec_id < cut = the built index; rest = new batch

  /** q110: INCREMENTAL ANN index maintenance — the q60-for-vectors: a
    * new embedding batch joins an already-built IVF index by assigning
    * ONLY the batch to the frozen coarse centroids (broadcast argmax,
    * cost O(|batch|), the index itself is never rescanned), and the
    * query PROVES the incremental posting counts equal a full rebuild
    * (`agree` = 1 per cell) — the invariant that lets production append
    * to an IVF index nightly instead of rebuilding it, and exactly what
    * breaks if someone lets the batch move the centroids. The rebuild
    * branch exists here as the in-query oracle; production drops it.
    */
  val q110IncrementalIvf = NamedQuery(
    "q110_incremental_ivf",
    s"Incremental IVF maintenance: batch (vec_id >= $IndexCut) " +
      "assigned to frozen cells; per-cell old/new/total postings, " +
      "proven equal to a full rebuild.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      def counts(df: org.apache.spark.sql.DataFrame, name: String) =
        Similarity.ivfAssign(
            df.select(col("vec_id").as("id"), col("embedding").as("v")), cent)
          .groupBy("cid").agg(count(lit(1)).as(name))
      val old = counts(emb.filter(col("vec_id") < IndexCut), "n_old")
      val add = counts(emb.filter(col("vec_id") >= IndexCut), "n_new")
      val rebuild = counts(emb, "n_rebuild")
      old.join(add, Seq("cid"), "full_outer")
        .join(rebuild, Seq("cid"), "full_outer")
        .select(col("cid"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_rebuild"), lit(0L)).as("n_rebuild"))
        .withColumn("n_total", col("n_old") + col("n_new"))
        .withColumn("agree",
          when(col("n_total") === col("n_rebuild"), 1L).otherwise(0L))
        .orderBy("cid")
    },
    Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv
            |  FROM embeddings WHERE vec_id < $NCentroids),
            |asg AS (SELECT vec_id, cid FROM (
            |  SELECT e.vec_id, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent c) WHERE rn = 1),
            |o AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_old FROM asg
            |  WHERE vec_id < $IndexCut GROUP BY cid),
            |a AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_new FROM asg
            |  WHERE vec_id >= $IndexCut GROUP BY cid),
            |r AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_rebuild FROM asg
            |  GROUP BY cid)
            |SELECT r.cid, COALESCE(o.n_old, 0) AS n_old,
            |  COALESCE(a.n_new, 0) AS n_new, r.n_rebuild,
            |  COALESCE(o.n_old, 0) + COALESCE(a.n_new, 0) AS n_total,
            |  CAST(CASE WHEN COALESCE(o.n_old, 0) + COALESCE(a.n_new, 0)
            |    = r.n_rebuild THEN 1 ELSE 0 END AS BIGINT) AS agree
            |FROM r
            |LEFT JOIN o ON o.cid = r.cid
            |LEFT JOIN a ON a.cid = r.cid
            |ORDER BY r.cid""".stripMargin))

  // declared LAST: object vals initialize in source order, so the
  // registry must come after every query it references
  private val JlInDims = 64
  private val JlOutDims = 16

  /** q125: Johnson–Lindenstrauss random projection, 64 → 16 dims — the
    * cheap dimensionality reduction that runs BEFORE the expensive ANN
    * machinery (JL preserves pairwise distances to 1±ε with random ±1
    * signs; Achlioptas 2003 shows sign matrices suffice). The "random"
    * matrix is md5-derived (sign(j,i) = parity of hash60(j·64+i)), and
    * the components are fp6-floored BEFORE summation (the q75
    * discipline), so each projected coordinate is an exact integer sum
    * both engines reproduce bit-for-bit.
    * Scale shape: entirely row-local — a transform over the 16 output
    * dims with an inner 64-term integer aggregate per row, then one
    * posexplode; no shuffle until the output sort. The sign matrix is
    * CONSTANT, so it is evaluated once on the driver (same md5
    * derivation the oracle uses) and shipped as a 1024-element int
    * literal — inlining the md5 into the lambda instead re-hashed
    * 16×64 times per row and made the projection 5× slower at sf0.1.
    * At 100 TB this is the pattern for any fixed linear map over an
    * embedding column: broadcast the (tiny, constant) matrix, fuse the
    * product into the scan, never materialize it as a join.
    */
  val q125JlProjection = NamedQuery(
    "q125_jl_projection",
    s"JL sign-projection $JlInDims->$JlOutDims dims: md5-derived +-1 " +
      "matrix over fp6-floored components; exact integer sums, " +
      "row-local.",
    (s, d) => {
      // the constant +-1 matrix, row-major (j*64 + i), from the same
      // md5-parity derivation the oracle replays in SQL
      val md = java.security.MessageDigest.getInstance("MD5")
      val signs = (0 until JlOutDims * JlInDims).map { k =>
        val hex = md.digest(k.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
      }
      val signsSql = signs.mkString("array(", "L, ", "L)")
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(expr(
          s"""transform(sequence(0, ${JlOutDims - 1}), j ->
             |  aggregate(sequence(0, ${JlInDims - 1}), CAST(0 AS BIGINT),
             |    (acc, i) -> acc +
             |      element_at($signsSql, j * $JlInDims + i + 1)
             |      * CAST(floor(CAST(element_at(embedding, i + 1) AS DOUBLE)
             |          * 1000000) AS BIGINT)))""".stripMargin))
          .as(Seq("j", "proj_fp6")))
        .select(col("vec_id"), col("j").cast("long").as("dim"),
          col("proj_fp6"))
        .orderBy("vec_id", "dim")
    },
    Some(s"""SELECT vec_id, j AS dim,
            |  CAST(list_sum(list_transform(range(0, $JlInDims), i ->
            |    (CASE WHEN ('0x'||substring(md5(CAST(j*$JlInDims + i
            |            AS VARCHAR)),1,15))::BIGINT % 2 = 0
            |        THEN 1 ELSE -1 END)
            |    * CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
            |        AS BIGINT))) AS BIGINT) AS proj_fp6
            |FROM embeddings, unnest(range(0, $JlOutDims)) AS t(j)
            |ORDER BY vec_id, dim""".stripMargin))

  /** q149: FILTERED vector search — ANN under a metadata predicate
    * (label = 3), the retrieval shape every production vector store
    * must serve ("nearest neighbors among documents matching X"). The
    * scale decision is WHERE the filter runs: POST-filtering a top-k
    * list loses recall whenever the filter is selective (the true
    * label-3 neighbors may all rank below k globally); here the
    * predicate is applied to the candidate side BEFORE IVF assignment
    * and scoring, so it pushes to the parquet scan
    * (`PushedFilters: EqualTo(label,3)`) and the probe scores ONLY
    * matching vectors — exact top-k over the filtered universe, cost
    * ∝ |matching| / |cells| · nprobe. Composition, not a new operator:
    * `ivfTopK(queries, candidates.filter(...), centroids)` — the
    * declarative win of building ANN on DataFrames.
    */
  val q149FilteredAnn = NamedQuery(
    "q149_filtered_ann",
    "Label-constrained IVF ANN: the predicate prunes the candidate " +
      "side before assignment/scoring (pushed to the scan), giving " +
      "exact top-3 over the filtered universe — never post-filtered.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.filter(col("label") === 3)
            .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          emb.filter(col("vec_id") < NCentroids)
            .select(col("vec_id").as("cid"), col("embedding").as("cv")),
          nprobe = NProbe, k = 3)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < $NCentroids),
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS ncv, cid FROM (
            |  SELECT e.vec_id, e.embedding, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c.cv")} DESC, c.cid ASC) AS rn
            |  FROM embeddings e, cent c WHERE e.label = 3) WHERE rn = 1),
            |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |probes AS (SELECT query_id, qv, cid FROM (
            |  SELECT q.query_id, q.qv, c.cid,
            |    row_number() OVER (PARTITION BY q.query_id
            |      ORDER BY ${cosFpSql("q.qv", "c.cv")} DESC, c.cid ASC) AS prn
            |  FROM q, cent c) WHERE prn <= $NProbe),
            |scored AS (SELECT p.query_id, a.neighbor_id,
            |    ${cosFpSql("p.qv", "a.ncv")} AS cos_fp
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  WHERE p.query_id <> a.neighbor_id),
            |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank FROM scored)
            |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
            |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** q150: HYBRID RETRIEVAL by reciprocal-rank fusion — the modern
    * search stack's lexical + dense combination (RRF, Cormack et al.:
    * score = Σ 1/(60 + rank_m)), with documents and embeddings joined
    * by the harness convention vec_id = doc_id. Each modality produces
    * an independent bounded top-20 ranking — lexical = word-3-gram
    * Jaccard overlap (one cached gram scan feeds both the query and
    * candidate sides), dense = broadcast brute-force cosine — and the
    * fusion is a FULL OUTER join of two |Q|·20-row lists: at 100 TB
    * the expensive parts stay the modality engines (each already has
    * its sub-quadratic scale sibling: q82 prefix-filter, q26 IVF);
    * fusion cost is negligible by construction. RRF contributions are
    * exact integers (1e6 div (60+rank)), so fused scores and the final
    * top-5 cut are engine-identical.
    */
  val q150HybridRrf = NamedQuery(
    "q150_hybrid_rrf",
    "Lexical (3-gram Jaccard) + dense (cosine) top-20 rankings fused " +
      "by integer reciprocal-rank fusion; full-outer join of bounded " +
      "lists, top-5 fused results per query.",
    (s, d) => {
      import graft.operators.TextDedup
      val docs = Tables.documents(s, d)
      val cg = TextDedup.gramSets(docs, "doc_id", "text", n = 3).cache()
      val qg = cg.filter(col("gs_id") < 10)
        .select(col("gs_id").as("query_id"), col("gram"))
      val sizes = cg.groupBy(col("gs_id")).agg(count(lit(1)).as("n_grams"))
      val inter = qg
        .join(cg.select(col("gs_id").as("cand_id"), col("gram")), "gram")
        .filter(col("query_id") =!= col("cand_id"))
        .groupBy("query_id", "cand_id").agg(count(lit(1)).as("n_inter"))
      val jac = inter
        .join(sizes.select(col("gs_id").as("query_id"), col("n_grams").as("na")), "query_id")
        .join(sizes.select(col("gs_id").as("cand_id"), col("n_grams").as("nb")), "cand_id")
        .select(col("query_id"), col("cand_id"),
          floor(col("n_inter") / (col("na") + col("nb") - col("n_inter")) * 1e6)
            .cast("long").as("jaccard_fp"))
      val wLex = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("jaccard_fp").desc, col("cand_id").asc)
      val lex = jac.withColumn("lex_rank", row_number().over(wLex).cast("long"))
        .filter(col("lex_rank") <= 20)
        .select("query_id", "cand_id", "lex_rank")
      val emb = Tables.embeddings(s, d)
      val den = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          k = 20)
        .select(col("query_id"), col("neighbor_id").as("cand_id"),
          col("rank").as("vec_rank"))
      val fused = lex.join(den, Seq("query_id", "cand_id"), "full_outer")
        .withColumn("rrf_fp6",
          coalesce(expr("CAST(1000000 div (60 + lex_rank) AS BIGINT)"), lit(0L)) +
            coalesce(expr("CAST(1000000 div (60 + vec_rank) AS BIGINT)"), lit(0L)))
      val wF = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("rrf_fp6").desc, col("cand_id").asc)
      fused.withColumn("fused_rank", row_number().over(wF).cast("long"))
        .filter(col("fused_rank") <= 5)
        .select("query_id", "cand_id", "rrf_fp6", "fused_rank")
        .orderBy("query_id", "fused_rank")
    },
    Some(s"""WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
            |grams AS (SELECT DISTINCT doc_id, g FROM toks,
            |  unnest(list_transform(range(1, len(ts)-1),
            |    i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
            |  WHERE len(ts) >= 3),
            |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
            |inter AS (SELECT a.doc_id AS query_id, b.doc_id AS cand_id,
            |    COUNT(*) AS n_inter
            |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
            |  WHERE a.doc_id < 10 GROUP BY 1, 2),
            |jac AS (SELECT query_id, cand_id,
            |    CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) AS jaccard_fp
            |  FROM inter JOIN sizes sa ON sa.doc_id = query_id
            |  JOIN sizes sb ON sb.doc_id = cand_id),
            |lex AS (SELECT query_id, cand_id,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY jaccard_fp DESC, cand_id ASC) AS BIGINT) AS lex_rank
            |  FROM jac QUALIFY lex_rank <= 20),
            |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            |pairs AS (SELECT query_id, neighbor_id, ${cosFpSql("qv", "cv")} AS cos_fp
            |  FROM q, c WHERE query_id <> neighbor_id),
            |den AS (SELECT query_id, neighbor_id AS cand_id,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS vec_rank
            |  FROM pairs QUALIFY vec_rank <= 20),
            |fused AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
            |    COALESCE(l.cand_id, v.cand_id) AS cand_id,
            |    COALESCE(1000000 // (60 + l.lex_rank), 0) +
            |      COALESCE(1000000 // (60 + v.vec_rank), 0) AS rrf_fp6
            |  FROM lex l FULL OUTER JOIN den v
            |    ON l.query_id = v.query_id AND l.cand_id = v.cand_id)
            |SELECT query_id, cand_id, CAST(rrf_fp6 AS BIGINT) AS rrf_fp6,
            |  CAST(row_number() OVER (PARTITION BY query_id
            |    ORDER BY rrf_fp6 DESC, cand_id ASC) AS BIGINT) AS fused_rank
            |FROM fused QUALIFY fused_rank <= 5
            |ORDER BY query_id, fused_rank""".stripMargin))

  /** q157: EMBEDDING TRUNCATION ABLATION (matryoshka-style) — the dim
    * budget sweep that decides how many leading components an index
    * actually needs to store: for every adjacent vector pair, cosine at
    * dim ∈ {8,16,32,64} vs the full-dim cosine, aggregated as exact
    * integer SUMS (no division — engine-exact regardless of sign).
    * Reading the curve: sum_abs_err falls toward 0 as dim → 64; the
    * knee is the storage budget. The q154 analogue for ANN storage:
    * cost/quality measured, not assumed. Scale shape: pairs are a
    * 1-off self equi-join on vec_id, everything after is row-local
    * sliced-fold arithmetic, one global agg per budget over ONE scan.
    */
  val q157TruncationAblation = NamedQuery(
    "q157_truncation_ablation",
    "Matryoshka sweep: per dim budget {8,16,32,64}, exact integer sums " +
      "of truncated-vs-full cosine and |error| over adjacent vector " +
      "pairs — the measured storage/quality curve for ANN indexes.",
    (s, d) => {
      import graft.functions.VectorFunctions.cosineFp6
      val emb = Tables.embeddings(s, d)
      val a = emb.select(col("vec_id").as("pid"), col("embedding").as("va"))
      val b = emb.select((col("vec_id") - 1).as("pid"),
        col("embedding").as("vb"))
      val pairs = a.join(b, "pid")
        .select(cosineFp6(col("va"), col("vb")).as("cf"),
          col("va"), col("vb"))
        .cache() // one scan feeds all four budgets
      Seq(8, 16, 32, 64).map { m =>
        pairs.select(col("cf"),
            cosineFp6(slice(col("va"), 1, m), slice(col("vb"), 1, m)).as("c"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("c")).as("sum_cos_fp6"),
            sum(abs(col("c") - col("cf"))).as("sum_abs_err_fp6"))
          .withColumn("dim_budget", lit(m.toLong))
      }.reduce(_ unionByName _)
        .select("dim_budget", "n_pairs", "sum_cos_fp6", "sum_abs_err_fp6")
        .orderBy("dim_budget")
    },
    Some {
      val budgets = Seq(8, 16, 32, 64)
      val cols = budgets.map(m =>
        s"${cosFpSql(s"va[1:$m]", s"vb[1:$m]")} AS c$m").mkString(",\n")
      val rows = budgets.map(m =>
        s"""SELECT $m AS dim_budget, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(c$m) AS BIGINT) AS sum_cos_fp6,
           |  CAST(SUM(ABS(c$m - cf)) AS BIGINT) AS sum_abs_err_fp6
           |FROM c""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH p AS (SELECT a.embedding AS va, b.embedding AS vb
         |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
         |c AS (SELECT ${cosFpSql("va", "vb")} AS cf,
         |$cols
         |FROM p)
         |SELECT CAST(dim_budget AS BIGINT) AS dim_budget, n_pairs,
         |  sum_cos_fp6, sum_abs_err_fp6
         |FROM ($rows) ORDER BY dim_budget""".stripMargin
    })

  /** q170: k-NN LABEL TRANSFER through the IVF index — the
    * weak-supervision/auto-labeling step of a training pipeline:
    * propagate labels from a labeled store to an unlabeled batch by
    * majority vote over each point's 5 nearest LABELED neighbors,
    * where "nearest" is resolved through the SAME IVF index the
    * retrieval tier uses (q26's cells, nprobe=2) — at 100 TB the
    * labeled store is indexed ONCE and every unlabeled batch probes 2
    * cells, so the scoring join is cell-keyed and the candidate
    * shuffle shrinks ~|cells|/nprobe vs brute force; the vote is a
    * per-query `max_by` partial agg (no window sort), total-ordered by
    * (votes desc, label asc) so the prediction is hash-exact. Holdout
    * = vec_id % 5 == 0 (labels masked), base = the rest; centroids =
    * the base's 16 smallest ids. Output: per true label, n / correct /
    * accuracy fp6 — the harness number that catches an index or vote
    * regression as a hash mismatch.
    */
  val q170KnnLabelTransfer = NamedQuery(
    "q170_knn_label_transfer",
    "ANN-index label transfer: 5-NN majority vote through IVF " +
      "(nprobe=2) from labeled base to masked holdout; per-label " +
      "accuracy fp6, vote via max_by partial agg.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val holdout = emb.filter(col("vec_id") % 5 === 0)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val ranked = Similarity.ivfTopK(
        holdout.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")),
        base.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv")),
        base.filter(col("vec_id") < 20)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")),
        nprobe = NProbe, k = 5)
      val votes = ranked
        .join(base.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("neighbor_id"))
        .groupBy("query_id", "label").agg(count(lit(1)).as("c"))
      val pred = votes.groupBy("query_id")
        .agg(max_by(col("label"),
          struct(col("c"), -col("label"))).as("pred_label"))
      pred.join(holdout.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
        .groupBy("true_label")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_label") === col("true_label"), 1L)
            .otherwise(0L)).as("n_correct"))
        .withColumn("acc_fp", expr("(n_correct * 1000000) div n"))
        .orderBy("true_label")
    },
    Some(s"""WITH base AS (SELECT vec_id, embedding, label FROM embeddings
            |  WHERE vec_id % 5 <> 0),
            |holdout AS (SELECT vec_id AS query_id, embedding AS qv, label
            |  FROM embeddings WHERE vec_id % 5 = 0),
            |cent AS (SELECT vec_id AS cid, embedding AS cv FROM base
            |  WHERE vec_id < 20),
            |assigned AS (SELECT vec_id AS neighbor_id, embedding AS ncv,
            |    label, cid FROM (
            |  SELECT b.vec_id, b.embedding, b.label, c.cid,
            |    row_number() OVER (PARTITION BY b.vec_id
            |      ORDER BY ${cosFpSql("b.embedding", "c.cv")} DESC,
            |        c.cid ASC) AS rn
            |  FROM base b, cent c) WHERE rn = 1),
            |probes AS (SELECT query_id, qv, cid FROM (
            |  SELECT h.query_id, h.qv, c.cid,
            |    row_number() OVER (PARTITION BY h.query_id
            |      ORDER BY ${cosFpSql("h.qv", "c.cv")} DESC, c.cid ASC)
            |      AS prn
            |  FROM holdout h, cent c) WHERE prn <= $NProbe),
            |ranked AS (SELECT query_id, neighbor_id, label FROM (
            |  SELECT p.query_id, a.neighbor_id, a.label,
            |    row_number() OVER (PARTITION BY p.query_id
            |      ORDER BY ${cosFpSql("p.qv", "a.ncv")} DESC,
            |        a.neighbor_id ASC) AS rank
            |  FROM probes p JOIN assigned a ON p.cid = a.cid
            |  WHERE p.query_id <> a.neighbor_id) WHERE rank <= 5),
            |votes AS (SELECT query_id, label, COUNT(*) AS c
            |  FROM ranked GROUP BY 1, 2),
            |pred AS (SELECT query_id, label AS pred_label FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY c DESC, label ASC) AS vr FROM votes)
            |  WHERE vr = 1)
            |SELECT h.label AS true_label, COUNT(*) AS n,
            |  CAST(SUM(CASE WHEN p.pred_label = h.label THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_correct,
            |  CAST(SUM(CASE WHEN p.pred_label = h.label THEN 1 ELSE 0 END)
            |    * 1000000 // COUNT(*) AS BIGINT) AS acc_fp
            |FROM pred p JOIN holdout h USING (query_id)
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q171: DETERMINISTIC NEGATIVE SAMPLING — the contrastive-training
    * batch-construction primitive: for each anchor, draw 4 uniform
    * negatives as `hash60('neg1:'‖anchor‖':'‖j) mod N` (q55's
    * hash-mod discipline — reprocessing-stable, no RNG state to
    * shard), drop the rare self-collision rather than resample
    * (deterministic in one pass), fetch the negative vectors by
    * equi-join, and report per anchor the drawn count, the summed and
    * the max negative cosine — the "are my negatives accidentally
    * positives" QA numbers. Scale shape: the draw is a row-local
    * 4-way generate off the anchor scan (the corpus is never crossed),
    * the only corpus-sized move is the id-keyed fetch join, and the
    * stats are partial aggs. Exact longs end-to-end, so the sampled
    * batch is hash-identical across engines and re-runs.
    */
  val q171NegativeSampling = NamedQuery(
    "q171_negative_sampling",
    "Contrastive negative sampling: 4 hash-mod uniform negatives per " +
      "anchor, self-collisions dropped, id-keyed vector fetch; " +
      "count/sum/max negative cosine per anchor, exact fp6.",
    (s, d) => {
      import graft.functions.TextFunctions.hash60
      import graft.functions.VectorFunctions.cosineFp6
      val emb = Tables.embeddings(s, d)
      val n = emb.agg(count(lit(1)).as("n_total"))
      val draws = emb.filter(col("vec_id") < 64)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("av"))
        .crossJoin(broadcast(n))
        .select(col("anchor_id"), col("av"),
          explode(expr("sequence(1, 4)")).as("j"), col("n_total"))
        .withColumn("neg_id",
          hash60(concat(lit("neg1:"), col("anchor_id").cast("string"),
            lit(":"), col("j").cast("string"))) % col("n_total"))
        .filter(col("neg_id") =!= col("anchor_id"))
      draws
        .join(emb.select(col("vec_id").as("neg_id"),
          col("embedding").as("nv")), Seq("neg_id"))
        .withColumn("cos_fp", cosineFp6(col("av"), col("nv")))
        .groupBy("anchor_id")
        .agg(count(lit(1)).as("n_negs"),
          sum("cos_fp").as("sum_neg_cos_fp"),
          max("cos_fp").as("max_neg_cos_fp"))
        .orderBy("anchor_id")
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n_total FROM embeddings),
            |draws AS (SELECT a.vec_id AS anchor_id, a.embedding AS av,
            |    ('0x'||substring(md5('neg1:'||CAST(a.vec_id AS VARCHAR)
            |      ||':'||CAST(j AS VARCHAR)),1,15))::BIGINT % n_total
            |      AS neg_id
            |  FROM embeddings a, n, unnest(range(1, 5)) AS r(j)
            |  WHERE a.vec_id < 64),
            |fetched AS (SELECT d.anchor_id,
            |    ${cosFpSql("d.av", "e.embedding")} AS cos_fp
            |  FROM draws d JOIN embeddings e ON d.neg_id = e.vec_id
            |  WHERE d.neg_id <> d.anchor_id)
            |SELECT anchor_id, COUNT(*) AS n_negs,
            |  CAST(SUM(cos_fp) AS BIGINT) AS sum_neg_cos_fp,
            |  CAST(MAX(cos_fp) AS BIGINT) AS max_neg_cos_fp
            |FROM fetched GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q175: IVF CELL-BALANCE CENSUS — the index-health number that
    * decides when to re-cluster: IVF probe latency is gated by the
    * LARGEST probed cell (a 10× hot cell = 10× tail latency and a
    * 10× shuffle skew in every batched ANN job), so the census
    * reports each cell's population, its share, and its imbalance
    * ratio vs the uniform mean (fp6; 1e6 = perfectly balanced). Runs
    * on the same assignment the search tier uses ([[Similarity
    * .ivfAssign]] — broadcast centroids + partial-agg argmax), one
    * |cells|-row agg on top; at 100 TB this is a scan-cost health
    * check on a structure that serves every retrieval query.
    */
  val q175IvfCellBalance = NamedQuery(
    "q175_ivf_cell_balance",
    "IVF index health: per-cell population, share, and imbalance vs " +
      "uniform (fp6) from the same broadcast-argmax assignment the " +
      "search path uses.",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val cells = Similarity.ivfAssign(
          emb.select(col("vec_id").as("id"), col("embedding").as("v")),
          cent)
        .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
      val tot = cells.agg(sum("n_vecs").as("n_tot"),
        count(lit(1)).as("n_cells"))
      cells.crossJoin(broadcast(tot))
        .select(col("cid"), col("n_vecs"),
          expr("(n_vecs * 1000000) div n_tot").as("share_fp6"),
          // DECIMAL(38,0): n_vecs*n_cells*1e6 clears BIGINT once cells
          // reach production counts (65k cells x 1e10 vectors)
          expr("CAST((CAST(n_vecs AS DECIMAL(38,0)) * n_cells * 1000000)" +
            " div n_tot AS BIGINT)").as("imbalance_fp6"))
        .orderBy("cid")
    },
    Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv
            |  FROM embeddings WHERE vec_id < $NCentroids),
            |assigned AS (SELECT vec_id, cid FROM (
            |  SELECT e.vec_id, c.cid,
            |    row_number() OVER (PARTITION BY e.vec_id
            |      ORDER BY ${cosFpSql("e.embedding", "c.cv")} DESC,
            |        c.cid ASC) AS rn
            |  FROM embeddings e, cent c) WHERE rn = 1),
            |cells AS (SELECT cid, COUNT(*) AS n_vecs FROM assigned
            |  GROUP BY 1),
            |tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_tot,
            |    COUNT(*) AS n_cells FROM cells)
            |SELECT cid, n_vecs,
            |  CAST((n_vecs * 1000000) // n_tot AS BIGINT) AS share_fp6,
            |  CAST((n_vecs::HUGEINT * n_cells * 1000000) // n_tot
            |    AS BIGINT) AS imbalance_fp6
            |FROM cells, tot ORDER BY cid""".stripMargin))

  /** q178: FEATURE-HASHING EMBEDDINGS (the hashing trick) — vectorize
    * text with NO model: each term deterministically owns a dimension
    * `hash60('fh:'‖term) mod 16` and a sign (next hash bit), a doc's
    * vector is the signed tf sum per dimension — the classic
    * Weinberger et al. feature-hashing construction, which at 100 TB
    * is just ONE (doc, dim) hash-agg over the token scan (no
    * vocabulary table, no model service, reprocessing-stable). The
    * harness then runs the retrieval tier over these vectors: top-3
    * cosine neighbors for the first 5 docs, scored COMPONENTWISE (the
    * 16-dim query components broadcast, dot products accumulate via
    * the dim-keyed join — vectors are never materialized as arrays),
    * norms exact integer, cosine the one fp6 double step in the
    * identical op order both engines. Completes the pipeline story:
    * docs → chunks → hash-embeddings → ANN without leaving the engine.
    */
  val q178HashEmbedding = NamedQuery(
    "q178_hash_embedding",
    "Feature-hashing 16-dim embeddings (signed tf per hashed dim, no " +
      "model), then top-3 cosine neighbors for 5 query docs via " +
      "dim-keyed dot products; integer norms, fp6 cosine.",
    (s, d) => {
      import graft.functions.TextFunctions.{hash60, tokens}
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("h", hash60(concat(lit("fh:"), col("term"))))
        .withColumn("j", col("h") % 16)
        .withColumn("s",
          when(expr("(h div 16) % 2") === 0, 1L).otherwise(-1L))
      val comp = tf.groupBy("doc_id", "j")
        .agg(sum(col("s") * col("tf")).as("v"))
        .filter(col("v") =!= 0)
      val norms = comp.groupBy("doc_id")
        .agg(sum(col("v") * col("v")).as("nn"))
      val q = comp.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("j"),
          col("v").as("qv"))
      val qn = norms.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("nn").as("nq"))
      val dots = comp.join(broadcast(q), Seq("j"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(sum(col("v") * col("qv")).as("dot"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_fp").desc, col("doc_id").asc)
      dots.join(norms, "doc_id").join(broadcast(qn), "query_id")
        .withColumn("cos_fp", expr(
          "CAST(floor(dot / (sqrt(CAST(nq AS DOUBLE)) * " +
            "sqrt(CAST(nn AS DOUBLE))) * 1000000.0) AS LONG)"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("doc_id").as("neighbor_id"),
          col("cos_fp"), col("rank"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM
           |    (SELECT doc_id, unnest(string_split(lower(text),' '))
           |       AS term FROM documents) GROUP BY 1, 2),
           |hx AS (SELECT doc_id, tf,
           |    ('0x'||substring(md5('fh:'||term),1,15))::BIGINT AS h
           |  FROM tf),
           |comp AS (SELECT doc_id, h % 16 AS j,
           |    CAST(SUM(CASE WHEN (h // 16) % 2 = 0 THEN tf
           |      ELSE -tf END) AS BIGINT) AS v
           |  FROM hx GROUP BY 1, 2 HAVING SUM(CASE WHEN (h // 16) % 2 = 0
           |    THEN tf ELSE -tf END) <> 0),
           |norms AS (SELECT doc_id, CAST(SUM(v*v) AS BIGINT) AS nn
           |  FROM comp GROUP BY 1),
           |dots AS (SELECT q.doc_id AS query_id, c.doc_id,
           |    CAST(SUM(c.v * q.v) AS BIGINT) AS dot
           |  FROM comp c JOIN comp q ON c.j = q.j
           |  WHERE q.doc_id < 5 AND c.doc_id <> q.doc_id
           |  GROUP BY 1, 2),
           |scored AS (SELECT query_id, d.doc_id AS neighbor_id,
           |    CAST(floor(dot / (sqrt(CAST(nq.nn AS DOUBLE)) *
           |      sqrt(CAST(nc.nn AS DOUBLE))) * 1000000.0) AS BIGINT)
           |      AS cos_fp
           |  FROM dots d JOIN norms nc ON d.doc_id = nc.doc_id
           |    JOIN norms nq ON d.query_id = nq.doc_id),
           |ranked AS (SELECT *, CAST(row_number() OVER (
           |    PARTITION BY query_id
           |    ORDER BY cos_fp DESC, neighbor_id ASC) AS BIGINT) AS rank
           |  FROM scored)
           |SELECT query_id, neighbor_id, cos_fp, rank FROM ranked
           |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))

  /** q184: DENSE CHUNK RETRIEVAL — the dense sibling of q161's BM25
    * chunk read path, composed end-to-end from shipped pieces: chunk
    * every document (64/16, [[graft.operators.Chunker]] = q159's
    * table), hash-embed each CHUNK into 16 dims (q178's
    * feature-hashing construction at chunk granularity), assign chunks
    * to frozen coarse centroids (doc-level hash embeddings of docs
    * 0-7 — [[Similarity.ivfAssign]]'s broadcast-argmax shape on
    * dim-keyed components), probe the query's best 2 cells, and score
    * ONLY chunks in probed cells against the query — top-10 WITH
    * PROVENANCE (doc_id, chunk_idx, first_token_offset), what a RAG
    * system feeds a context window when the index is dense rather
    * than lexical. Query vector = hash-embedding of the same three
    * q161 terms, so the lexical and dense paths are comparable.
    * Scale shape: chunking + hashing are row-local on the scan; the
    * component table is ONE (chunk, dim) hash-agg, cached (assignment
    * and scoring both read it — one corpus scan); centroid components
    * (≤128 rows), probes (2 rows) and query components (≤16 rows) are
    * all broadcast, so nothing quadratic ever shuffles; candidate
    * scoring touches only probed cells (the IVF point — ~nprobe/cells
    * of the corpus); the top-10 is TakeOrderedAndProject with the
    * rank window AFTER the take (plan-guarded).
    */
  val q184DenseChunkRetrieval = NamedQuery(
    "q184_dense_chunk_retrieval",
    "Dense RAG read path: 64/16 chunks -> 16-dim hash embeddings -> " +
      "IVF assign to doc-centroids -> probe 2 cells -> cosine top-10 " +
      "chunks with provenance; integer components, fp6 cosine.",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = DenseChunks.parts(s, d)
      val cand = DenseChunks.probedCandidates(p, nprobe = 2)
      val wRank = graft.BoundedWindow.orderBy(col("cos_fp").desc,
        col("doc_id").asc, col("chunk_idx").asc)
      DenseChunks.scoredVsQuery(p, Some(cand))
        .orderBy(col("cos_fp").desc, col("doc_id").asc, col("chunk_idx").asc)
        .limit(10)
        .withColumn("rank", row_number().over(wRank).cast("long"))
        .select("doc_id", "chunk_idx", "first_token_offset", "cos_fp", "rank")
    },
    Some(s"""WITH ${TextQueries.ChunkCtesSql},
            |${DenseChunks.ctesSql},
            |${DenseChunks.candScoredCtesSql}
            |SELECT doc_id, chunk_idx, first_token_offset, cos_fp,
            |  CAST(row_number() OVER (ORDER BY cos_fp DESC, doc_id ASC,
            |    chunk_idx ASC) AS BIGINT) AS rank
            |FROM dscored
            |ORDER BY cos_fp DESC, doc_id ASC, chunk_idx ASC LIMIT 10""".stripMargin))

  /** q185: CHANGE-FEED-DRIVEN INDEX MAINTENANCE — the 100 TB answer to
    * "my corpus got a backfill, now fix the ANN index without
    * rebuilding it": a merge-maintained vector table commits two
    * versions; [[graft.sources.ManagedTable.changes]] derives the
    * row-level feed BETWEEN them (planned from manifest file diffs —
    * O(changed data), never a table scan); and the IVF index is
    * updated INCREMENTALLY from the feed alone — delete/update_preimage
    * rows retract their cell postings, insert/update_postimage rows
    * add theirs, each via the same frozen-centroid broadcast argmax as
    * [[Similarity.ivfAssign]], cost O(|changeset|). The query PROVES
    * the invariant production relies on: per cell,
    * `n_v1 − removed + added == full rebuild at v2` (`agree` = 1) —
    * assignment is functional on the vector and the centroids are
    * frozen, so the incremental index is exact, not approximate. The
    * in-query v1/v2 rebuild branches exist as the oracle; production
    * keeps only the stored postings and the feed. Composes q152 (CDF)
    * with q110 (incremental IVF); the deleteWhere/replaceWhere
    * round-trip is spec-covered (CdfIndexMaintenanceSpec).
    */
  val q185CdfIndexMaintenance = NamedQuery(
    "q185_cdf_index_maintenance",
    "Incremental IVF from the change feed: merge v1->v2 CDF retracts/" +
      "adds exactly the changed keys' postings (frozen-centroid " +
      "argmax, O(changeset)); per-cell proof vs full rebuild.",
    (s, d) => {
      val dir = graft.Scratch.dir("cdfivf", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val emb = Tables.embeddings(s, d)
      // CDC history over a small key space: every key updated across
      // the two batches, some tombstoned ('d'), some resurrected
      val hist = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") % 15L).as("k"), col("vec_id").as("seq"),
          col("embedding"),
          when(col("vec_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
      (0 until 2).foreach { i =>
        M.merge(hist.filter(
            col("seq") >= i * 20 && col("seq") < (i + 1) * 20),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")), tag = s"m$i")
      }
      val cent = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      def counts(df: org.apache.spark.sql.DataFrame, name: String) =
        Similarity.ivfAssign(
            df.select(col("k").as("id"), col("embedding").as("v")), cent)
          .groupBy("cid").agg(count(lit(1)).as(name))
      val del = col("op") === "d"
      val drop = Seq("seq", "op")
      val cdf = M.changes(s, dir, 1, 2, Seq("k"),
        deleteExpr = del, exceptColumns = drop)
      val nV1 = counts(M.readCurrent(s, dir, del, drop, Some(1)), "n_v1")
      val nRem = counts(cdf.filter(
        col("_change_type").isin("delete", "update_preimage")), "n_removed")
      val nAdd = counts(cdf.filter(
        col("_change_type").isin("insert", "update_postimage")), "n_added")
      val nV2 = counts(M.readCurrent(s, dir, del, drop, Some(2)), "n_v2")
      nV1.join(nRem, Seq("cid"), "full_outer")
        .join(nAdd, Seq("cid"), "full_outer")
        .join(nV2, Seq("cid"), "full_outer")
        .select(col("cid"),
          coalesce(col("n_v1"), lit(0L)).as("n_v1"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          coalesce(col("n_added"), lit(0L)).as("n_added"),
          coalesce(col("n_v2"), lit(0L)).as("n_v2"))
        .withColumn("n_incr",
          col("n_v1") - col("n_removed") + col("n_added"))
        .withColumn("agree",
          when(col("n_incr") === col("n_v2"), 1L).otherwise(0L))
        .select("cid", "n_v1", "n_removed", "n_added", "n_incr",
          "n_v2", "agree")
        .orderBy("cid")
    },
    Some(s"""WITH h AS (SELECT vec_id % 15 AS k, vec_id AS seq, embedding,
            |    CASE WHEN vec_id % 7 = 0 THEN 'd' ELSE 'u' END op
            |  FROM embeddings WHERE vec_id < 40),
            |s1 AS (SELECT k, embedding FROM (
            |    SELECT *, row_number() OVER (PARTITION BY k
            |      ORDER BY seq DESC) rn FROM h WHERE seq < 20)
            |  WHERE rn = 1 AND op <> 'd'),
            |s2 AS (SELECT k, embedding FROM (
            |    SELECT *, row_number() OVER (PARTITION BY k
            |      ORDER BY seq DESC) rn FROM h WHERE seq < 40)
            |  WHERE rn = 1 AND op <> 'd'),
            |cent AS (SELECT vec_id AS cid, embedding AS cv
            |  FROM embeddings WHERE vec_id < 8),
            |j AS (SELECT coalesce(s1.k, s2.k) AS k,
            |    s1.embedding AS e1, s2.embedding AS e2,
            |    s1.k IS NOT NULL AS has1, s2.k IS NOT NULL AS has2
            |  FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k),
            |rem0 AS (SELECT k, e1 AS embedding FROM j
            |  WHERE has1 AND (NOT has2 OR e1 IS DISTINCT FROM e2)),
            |add0 AS (SELECT k, e2 AS embedding FROM j
            |  WHERE has2 AND (NOT has1 OR e1 IS DISTINCT FROM e2)),
            |a1 AS (SELECT k, cid FROM (SELECT s.k, c.cid,
            |    row_number() OVER (PARTITION BY s.k
            |      ORDER BY ${cosFpSql("s.embedding", "c.cv")} DESC,
            |        c.cid ASC) rn FROM s1 s, cent c) WHERE rn = 1),
            |a2 AS (SELECT k, cid FROM (SELECT s.k, c.cid,
            |    row_number() OVER (PARTITION BY s.k
            |      ORDER BY ${cosFpSql("s.embedding", "c.cv")} DESC,
            |        c.cid ASC) rn FROM s2 s, cent c) WHERE rn = 1),
            |ar AS (SELECT k, cid FROM (SELECT s.k, c.cid,
            |    row_number() OVER (PARTITION BY s.k
            |      ORDER BY ${cosFpSql("s.embedding", "c.cv")} DESC,
            |        c.cid ASC) rn FROM rem0 s, cent c) WHERE rn = 1),
            |aa AS (SELECT k, cid FROM (SELECT s.k, c.cid,
            |    row_number() OVER (PARTITION BY s.k
            |      ORDER BY ${cosFpSql("s.embedding", "c.cv")} DESC,
            |        c.cid ASC) rn FROM add0 s, cent c) WHERE rn = 1),
            |n1 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_v1
            |  FROM a1 GROUP BY 1),
            |nr AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_removed
            |  FROM ar GROUP BY 1),
            |na AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_added
            |  FROM aa GROUP BY 1),
            |n2 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_v2
            |  FROM a2 GROUP BY 1),
            |cells AS (SELECT cid FROM n1 UNION SELECT cid FROM nr
            |  UNION SELECT cid FROM na UNION SELECT cid FROM n2)
            |SELECT c.cid, coalesce(n1.n_v1, 0) AS n_v1,
            |  coalesce(nr.n_removed, 0) AS n_removed,
            |  coalesce(na.n_added, 0) AS n_added,
            |  coalesce(n1.n_v1, 0) - coalesce(nr.n_removed, 0)
            |    + coalesce(na.n_added, 0) AS n_incr,
            |  coalesce(n2.n_v2, 0) AS n_v2,
            |  CAST(CASE WHEN coalesce(n1.n_v1, 0)
            |      - coalesce(nr.n_removed, 0) + coalesce(na.n_added, 0)
            |      = coalesce(n2.n_v2, 0) THEN 1 ELSE 0 END AS BIGINT)
            |    AS agree
            |FROM cells c
            |LEFT JOIN n1 ON n1.cid = c.cid
            |LEFT JOIN nr ON nr.cid = c.cid
            |LEFT JOIN na ON na.cid = c.cid
            |LEFT JOIN n2 ON n2.cid = c.cid
            |ORDER BY c.cid""".stripMargin))

  /** q186: DENSE-PATH RECALL EVALUATION — the q33-for-chunks: before a
    * RAG system trusts the probed index (q184), it must know what the
    * probe loses. Exact truth = brute-force cosine top-10 over ALL
    * chunks in the same hash-embedding space; approx = q184's 2-of-8
    * probed top-10; the output is the one row an index-tuning loop
    * watches — recall@10 plus the candidate fraction the probe
    * actually scanned (the cost side of the recall/cost trade; nprobe
    * tuning moves both). Scale shape: everything reuses the cached
    * (chunk, dim) component pass; the "brute force" side is still a
    * dim-keyed hash-agg (never |chunks|² — brute force here means
    * no candidate pruning, not pairwise blowup); both top-10s are
    * bounded takes and the final row is a cross of four 1-row aggs.
    */
  val q186DenseRecall = NamedQuery(
    "q186_dense_recall",
    "recall@10 of the probed dense chunk path (q184) vs exact " +
      "brute-force over all chunks, plus the scanned candidate " +
      "fraction — the IVF recall/cost trade as one audit row.",
    (s, d) => {
      val p = DenseChunks.parts(s, d)
      def top10(df: org.apache.spark.sql.DataFrame) = df
        .orderBy(col("cos_fp").desc, col("doc_id").asc, col("chunk_idx").asc)
        .limit(10).select("doc_id", "chunk_idx")
      val exact = top10(DenseChunks.scoredVsQuery(p, None)).cache()
      val cand = DenseChunks.probedCandidates(p, nprobe = 2).cache()
      val approx = top10(DenseChunks.scoredVsQuery(p, Some(cand)))
      val tn = exact.agg(count(lit(1)).as("n_truth"))
      val hn = exact.join(approx, Seq("doc_id", "chunk_idx"))
        .agg(count(lit(1)).as("n_hit"))
      val cn = cand.agg(count(lit(1)).as("n_candidates"))
      val kn = p.cnorm.agg(count(lit(1)).as("n_chunks"))
      tn.crossJoin(hn).crossJoin(cn).crossJoin(kn)
        .withColumn("recall_fp", expr("(n_hit * 1000000) div n_truth"))
        .withColumn("cand_frac_fp",
          expr("(n_candidates * 1000000) div n_chunks"))
        .select("n_truth", "n_hit", "recall_fp", "n_candidates",
          "n_chunks", "cand_frac_fp")
    },
    Some(s"""WITH ${TextQueries.ChunkCtesSql},
            |${DenseChunks.ctesSql},
            |${DenseChunks.candScoredCtesSql},
            |eall AS (SELECT c.doc_id, c.chunk_idx,
            |    CAST(SUM(c.v * q.qv) AS BIGINT) AS dot
            |  FROM ccomp c JOIN qcomp q USING (j) GROUP BY 1, 2),
            |escored AS (SELECT e.doc_id, e.chunk_idx,
            |    ${DenseChunks.intCosFpSql("e.dot", "qn.nq", "n.nn")} AS cos_fp
            |  FROM eall e JOIN cnorm n USING (doc_id, chunk_idx), qnorm qn),
            |exact AS (SELECT doc_id, chunk_idx FROM escored
            |  ORDER BY cos_fp DESC, doc_id ASC, chunk_idx ASC LIMIT 10),
            |approx AS (SELECT doc_id, chunk_idx FROM dscored
            |  ORDER BY cos_fp DESC, doc_id ASC, chunk_idx ASC LIMIT 10),
            |tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM exact),
            |hn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
            |  FROM exact JOIN approx USING (doc_id, chunk_idx)),
            |cn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
            |kn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks FROM cnorm)
            |SELECT n_truth, n_hit,
            |  CAST((n_hit * 1000000) // n_truth AS BIGINT) AS recall_fp,
            |  n_candidates, n_chunks,
            |  CAST((n_candidates * 1000000) // n_chunks AS BIGINT)
            |    AS cand_frac_fp
            |FROM tn, hn, cn, kn""".stripMargin))

  /** q187's fused top-10 (shared with q190's context packing):
    * lexical (q161) and dense (q184) chunk top-10s RRF-fused, ranked.
    */
  private def hybridTop10(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    hybridTop10From(s, d, graft.operators.Chunker
      .chunk(Tables.documents(s, d), "doc_id", "text", 64, 16))

  /** [[hybridTop10]] against an already-materialized chunk table —
    * both retrieval pipelines (BM25 and probed dense) read the given
    * chunks instead of re-chunking the corpus, which is how a serving
    * system actually runs: retrieval hits the maintained index, not
    * the raw corpus (q198 feeds the stream-maintained chunk table in
    * here).
    */
  private[queries] def hybridTop10From(s: org.apache.spark.sql.SparkSession,
      d: String, chunks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rankW(sc: org.apache.spark.sql.Column) =
      graft.BoundedWindow.orderBy(sc.desc, col("doc_id").asc,
        col("chunk_idx").asc)
    val lex = TextQueries.chunkBm25ScoredFrom(chunks)
      .orderBy(col("score_fp").desc, col("doc_id").asc,
        col("chunk_idx").asc)
      .limit(10)
      .withColumn("lex_rank",
        row_number().over(rankW(col("score_fp"))).cast("long"))
      .select("doc_id", "chunk_idx", "lex_rank")
    val p = DenseChunks.partsFrom(s, d, chunks)
    val den = DenseChunks
      .scoredVsQuery(p, Some(DenseChunks.probedCandidates(p, nprobe = 2)))
      .orderBy(col("cos_fp").desc, col("doc_id").asc, col("chunk_idx").asc)
      .limit(10)
      .withColumn("den_rank",
        row_number().over(rankW(col("cos_fp"))).cast("long"))
      .select("doc_id", "chunk_idx", "den_rank")
    lex.join(den, Seq("doc_id", "chunk_idx"), "full_outer")
      .withColumn("rrf_fp6",
        coalesce(expr("CAST(1000000 div (60 + lex_rank) AS BIGINT)"), lit(0L)) +
          coalesce(expr("CAST(1000000 div (60 + den_rank) AS BIGINT)"), lit(0L)))
      .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
      .withColumn("den_rank", coalesce(col("den_rank"), lit(0L)))
      .orderBy(col("rrf_fp6").desc, col("doc_id").asc, col("chunk_idx").asc)
      .limit(10)
      .withColumn("fused_rank",
        row_number().over(rankW(col("rrf_fp6"))).cast("long"))
      .select("doc_id", "chunk_idx", "lex_rank", "den_rank",
        "rrf_fp6", "fused_rank")
  }

  /** The DuckDB WITH-fragment for [[hybridTop10]] (`lex`, `den`,
    * `fused`, `hybrid` CTEs) — assumes the chunk + BM25 + dense CTEs
    * are already in scope.
    */
  private def hybridCtesSql: String =
    s"""lex AS (SELECT doc_id, chunk_idx,
       |    CAST(row_number() OVER (ORDER BY score_fp DESC,
       |      doc_id ASC, chunk_idx ASC) AS BIGINT) AS lex_rank
       |  FROM (SELECT * FROM lscored ORDER BY score_fp DESC,
       |    doc_id ASC, chunk_idx ASC LIMIT 10)),
       |den AS (SELECT doc_id, chunk_idx,
       |    CAST(row_number() OVER (ORDER BY cos_fp DESC,
       |      doc_id ASC, chunk_idx ASC) AS BIGINT) AS den_rank
       |  FROM (SELECT * FROM dscored ORDER BY cos_fp DESC,
       |    doc_id ASC, chunk_idx ASC LIMIT 10)),
       |fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(l.chunk_idx, v.chunk_idx) AS chunk_idx,
       |    COALESCE(l.lex_rank, 0) AS lex_rank,
       |    COALESCE(v.den_rank, 0) AS den_rank,
       |    CAST(COALESCE(1000000 // (60 + l.lex_rank), 0)
       |      + COALESCE(1000000 // (60 + v.den_rank), 0) AS BIGINT)
       |      AS rrf_fp6
       |  FROM lex l FULL OUTER JOIN den v
       |    ON l.doc_id = v.doc_id AND l.chunk_idx = v.chunk_idx),
       |hybrid AS (SELECT doc_id, chunk_idx, lex_rank, den_rank, rrf_fp6,
       |    CAST(row_number() OVER (ORDER BY rrf_fp6 DESC, doc_id ASC,
       |      chunk_idx ASC) AS BIGINT) AS fused_rank
       |  FROM fused
       |  ORDER BY rrf_fp6 DESC, doc_id ASC, chunk_idx ASC LIMIT 10)""".stripMargin

  /** q187: HYBRID CHUNK RETRIEVAL — reciprocal-rank fusion of the two
    * RAG read paths over the SAME query and the SAME chunk table:
    * q161's lexical BM25 top-10 and q184's probed dense top-10, fused
    * by integer RRF (Σ 1e6 div (60 + rank), the q150 discipline at
    * chunk granularity). Hybrid is what production retrieval actually
    * ships — lexical nails exact-term matches, dense recalls
    * paraphrases, and RRF needs no score calibration between the two
    * scales (ranks only). Scale shape: both inputs are bounded
    * 10-row takes over pipelines whose shapes are already guarded
    * (q161/q184); the fusion is a full-outer join of two 10-row
    * frames and every window runs post-limit.
    */
  val q187HybridChunkRrf = NamedQuery(
    "q187_hybrid_chunk_rrf",
    "Hybrid RAG: BM25 (q161) + probed dense (q184) chunk top-10s " +
      "fused by integer reciprocal-rank fusion; ranks-only, no score " +
      "calibration; top-10 with both source ranks.",
    (s, d) => hybridTop10(s, d),
    Some(s"""WITH ${TextQueries.ChunkCtesSql},
            |${TextQueries.chunkBm25CtesSql},
            |${DenseChunks.ctesSql},
            |${DenseChunks.candScoredCtesSql},
            |$hybridCtesSql
            |SELECT doc_id, chunk_idx, lex_rank, den_rank, rrf_fp6,
            |  fused_rank
            |FROM hybrid
            |ORDER BY rrf_fp6 DESC, doc_id ASC, chunk_idx ASC""".stripMargin))

  private val ContextBudget = 256L // tokens the assembled context may hold

  /** q190: CONTEXT-WINDOW ASSEMBLY — the last mile of the RAG read
    * path: take the fused ranking (q187) and PACK it into a
    * token-budgeted context greedily by rank — a chunk enters the
    * context while the running token total stays ≤ $ContextBudget
    * (whole chunks only, the standard prompt-builder rule). Output is
    * the assembly manifest a serving system logs: every candidate
    * with its token count, running total, provenance offsets (for
    * citation), and whether it made the context. Scale shape: the
    * expensive work is the two retrieval pipelines, whose shapes are
    * already guarded (q161/q184); packing itself is a 10-row join
    * against the chunk table (broadcast the 10-row side) and one
    * 10-row running-sum window — serving-path cheap by construction.
    */
  val q190ContextPack = NamedQuery(
    "q190_context_pack",
    s"RAG context assembly: greedy rank-order packing of the hybrid " +
      s"top-10 into a $ContextBudget-token budget; manifest with " +
      "running totals, provenance offsets, in/out flag.",
    (s, d) => contextPackFrom(s, d, graft.operators.Chunker
      .chunk(Tables.documents(s, d), "doc_id", "text", 64, 16)),
    Some(ContextPackOracleSql))

  /** q190's greedy budgeted packing over an already-materialized chunk
    * table: hybrid retrieval ([[hybridTop10From]]) + the 10-row
    * stats join + running-sum window. The q198 streaming RAG loop
    * runs THIS against a stream-maintained chunk index; the shared
    * oracle ([[ContextPackOracleSql]]) derives everything from the
    * raw corpus, so any streamed-index divergence (lost/duplicated
    * chunk, wrong stats) breaks the hash.
    */
  private[graft] def contextPackFrom(s: org.apache.spark.sql.SparkSession,
      d: String, chunks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = chunks
      .select("doc_id", "chunk_idx", "first_token_offset",
        "n_chunk_tokens")
    val wCum = graft.BoundedWindow.orderBy(col("fused_rank").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hybridTop10From(s, d, chunks)
      .join(toks, Seq("doc_id", "chunk_idx"))
      .withColumn("cum_tokens",
        sum(col("n_chunk_tokens")).over(wCum).cast("long"))
      .withColumn("in_context", col("cum_tokens") <= ContextBudget)
      .select("fused_rank", "doc_id", "chunk_idx",
        "first_token_offset", "n_chunk_tokens", "cum_tokens",
        "in_context")
      .orderBy("fused_rank")
  }

  // lazy: q190's declaration precedes this val and captures it at init
  private[queries] lazy val ContextPackOracleSql: String =
    s"""WITH ${TextQueries.ChunkCtesSql},
       |${TextQueries.chunkBm25CtesSql},
       |${DenseChunks.ctesSql},
       |${DenseChunks.candScoredCtesSql},
       |$hybridCtesSql
       |SELECT fused_rank, h.doc_id, h.chunk_idx,
       |  c.first_token_offset, c.dl AS n_chunk_tokens,
       |  CAST(SUM(c.dl) OVER (ORDER BY fused_rank ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cum_tokens,
       |  CAST(SUM(c.dl) OVER (ORDER BY fused_rank ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) <= $ContextBudget AS in_context
       |FROM hybrid h JOIN chunks c
       |  ON h.doc_id = c.doc_id AND h.chunk_idx = c.chunk_idx
       |ORDER BY fused_rank""".stripMargin

  /** q193: INDEX STALENESS AUDIT — the detect-side companion to
    * q185's repair: production serving reads "corpus at v2, index
    * built at v1" whenever re-indexing lags ingestion, and this query
    * quantifies exactly what that skew costs. Against the live v2
    * snapshot, the v1-built IVF index has three defect classes:
    * MISSING keys (inserted since v1 — unanswerable until re-index),
    * DANGLING postings (deleted since v1 — ghost results), and
    * STALE vectors (updated since v1), split into value-stale vs
    * CELL-stale (the fresh vector would land in a different IVF cell
    * — the subset that actually mis-routes probes; a value change
    * that keeps its cell still ranks correctly at the exact-rerank
    * stage). `staleness_fp` = (missing+dangling+cell_stale)/live is
    * the one number a re-index scheduler alarms on. Scale shape: two
    * latest-per-key snapshot reads (manifest-planned), two frozen-
    * centroid broadcast argmax passes, one key-equi full-outer join —
    * O(|keys|), never O(corpus²).
    */
  val q193IndexStaleness = NamedQuery(
    "q193_index_staleness",
    "Serving-skew audit: v1-built IVF index vs live v2 corpus — " +
      "missing/dangling/value-stale/cell-stale counts and the " +
      "staleness rate a re-index scheduler alarms on.",
    (s, d) => {
      val dir = graft.Scratch.dir("stale", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val emb = Tables.embeddings(s, d)
      val hist = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") % 15L).as("k"), col("vec_id").as("seq"),
          col("embedding"),
          when(col("vec_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
      (0 until 2).foreach { i =>
        M.merge(hist.filter(
            col("seq") >= i * 20 && col("seq") < (i + 1) * 20),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")), tag = s"m$i")
      }
      val cent = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val del = col("op") === "d"
      val drop = Seq("seq", "op")
      def assigned(v: Int, cidName: String, vName: String) =
        Similarity.ivfAssign(
            M.readCurrent(s, dir, del, drop, Some(v))
              .select(col("k").as("id"), col("embedding").as("v")), cent)
          .select(col("id").as("k"), col("cid").as(cidName),
            col("v").as(vName))
      val idx = assigned(1, "cid_idx", "v_old")
      val live = assigned(2, "cid_fresh", "v_new")
      idx.join(live, Seq("k"), "full_outer")
        .agg(
          sum(when(col("cid_idx").isNotNull, 1L).otherwise(0L))
            .as("n_index"),
          sum(when(col("cid_fresh").isNotNull, 1L).otherwise(0L))
            .as("n_live"),
          sum(when(col("cid_idx").isNull, 1L).otherwise(0L))
            .as("n_missing"),
          sum(when(col("cid_fresh").isNull, 1L).otherwise(0L))
            .as("n_dangling"),
          sum(when(col("cid_idx").isNotNull && col("cid_fresh").isNotNull &&
            !(col("v_old") <=> col("v_new")), 1L).otherwise(0L))
            .as("n_stale_value"),
          sum(when(col("cid_idx").isNotNull && col("cid_fresh").isNotNull &&
            !(col("v_old") <=> col("v_new")) &&
            col("cid_idx") =!= col("cid_fresh"), 1L).otherwise(0L))
            .as("n_stale_cell"))
        .withColumn("staleness_fp", expr(
          "((n_missing + n_dangling + n_stale_cell) * 1000000) div n_live"))
    },
    Some(s"""WITH h AS (SELECT vec_id % 15 AS k, vec_id AS seq, embedding,
            |    CASE WHEN vec_id % 7 = 0 THEN 'd' ELSE 'u' END op
            |  FROM embeddings WHERE vec_id < 40),
            |s1 AS (SELECT k, embedding FROM (
            |    SELECT *, row_number() OVER (PARTITION BY k
            |      ORDER BY seq DESC) rn FROM h WHERE seq < 20)
            |  WHERE rn = 1 AND op <> 'd'),
            |s2 AS (SELECT k, embedding FROM (
            |    SELECT *, row_number() OVER (PARTITION BY k
            |      ORDER BY seq DESC) rn FROM h WHERE seq < 40)
            |  WHERE rn = 1 AND op <> 'd'),
            |cent AS (SELECT vec_id AS cid, embedding AS cv
            |  FROM embeddings WHERE vec_id < 8),
            |a1 AS (SELECT k, cid AS cid_idx, embedding AS v_old FROM (
            |    SELECT s.k, c.cid, s.embedding,
            |      row_number() OVER (PARTITION BY s.k
            |        ORDER BY ${cosFpSql("s.embedding", "c.cv")} DESC,
            |          c.cid ASC) rn FROM s1 s, cent c) WHERE rn = 1),
            |a2 AS (SELECT k, cid AS cid_fresh, embedding AS v_new FROM (
            |    SELECT s.k, c.cid, s.embedding,
            |      row_number() OVER (PARTITION BY s.k
            |        ORDER BY ${cosFpSql("s.embedding", "c.cv")} DESC,
            |          c.cid ASC) rn FROM s2 s, cent c) WHERE rn = 1)
            |SELECT
            |  CAST(SUM(CASE WHEN cid_idx IS NOT NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_index,
            |  CAST(SUM(CASE WHEN cid_fresh IS NOT NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_live,
            |  CAST(SUM(CASE WHEN cid_idx IS NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_missing,
            |  CAST(SUM(CASE WHEN cid_fresh IS NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_dangling,
            |  CAST(SUM(CASE WHEN cid_idx IS NOT NULL AND cid_fresh IS NOT
            |    NULL AND v_old IS DISTINCT FROM v_new THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_stale_value,
            |  CAST(SUM(CASE WHEN cid_idx IS NOT NULL AND cid_fresh IS NOT
            |    NULL AND v_old IS DISTINCT FROM v_new
            |    AND cid_idx <> cid_fresh THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_stale_cell,
            |  CAST(((SUM(CASE WHEN cid_idx IS NULL THEN 1 ELSE 0 END)
            |    + SUM(CASE WHEN cid_fresh IS NULL THEN 1 ELSE 0 END)
            |    + SUM(CASE WHEN cid_idx IS NOT NULL AND cid_fresh IS NOT
            |        NULL AND v_old IS DISTINCT FROM v_new
            |        AND cid_idx <> cid_fresh THEN 1 ELSE 0 END))
            |    * 1000000) // SUM(CASE WHEN cid_fresh IS NOT NULL
            |      THEN 1 ELSE 0 END) AS BIGINT) AS staleness_fp
            |FROM a1 FULL OUTER JOIN a2 USING (k)""".stripMargin))

  /** q194: NPROBE SWEEP — the full recall/cost curve q186 samples one
    * point of: for every probe budget p in 1..4, recall@10 of the
    * p-probed dense path vs the exact chunk ranking, next to the
    * candidate fraction p forces the engine to scan. THIS table is
    * how an index operator actually picks nprobe (find the knee:
    * where another probe buys recall slower than it costs scan). The
    * trick that keeps it one pass: score every chunk against the
    * query ONCE and attach each chunk's centroid PROBE RANK — the
    * p-probed top-10 is then just `rank ≤ p` filtered from the one
    * scored frame, so the sweep costs one extra broadcast join over
    * q186, not four re-scorings. Both scored frames are cached 10-row
    * lineages over the shared cached component pass.
    */
  val q194NprobeSweep = NamedQuery(
    "q194_nprobe_sweep",
    "IVF tuning curve: recall@10 + scanned candidate fraction for " +
      "nprobe 1..4 from ONE scored pass (probe-rank filter, no " +
      "re-scoring) — pick the knee.",
    (s, d) => {
      val p = DenseChunks.parts(s, d)
      // every centroid's probe rank for the query (|centroids| rows)
      val probeRank = p.dcomp.join(broadcast(p.qcomp), Seq("j"))
        .groupBy("cid").agg(sum(col("cv") * col("qv")).as("dot"))
        .join(p.dnorm, Seq("cid"))
        .withColumn("cos_fp",
          DenseChunks.intCosFp(col("dot"), lit(p.nq), col("ncc")))
        .withColumn("prn", row_number().over(graft.BoundedWindow
          .orderBy(col("cos_fp").desc, col("cid").asc)).cast("long"))
        .select("cid", "prn")
      // one scored pass over ALL chunks, each carrying its cell's rank
      val scored = DenseChunks.scoredVsQuery(p, None)
        .join(DenseChunks.assigned(p), Seq("doc_id", "chunk_idx"))
        .join(broadcast(probeRank), Seq("cid"))
        .cache()
      val exact = scored
        .orderBy(col("cos_fp").desc, col("doc_id").asc, col("chunk_idx").asc)
        .limit(10).select("doc_id", "chunk_idx").cache()
      // total chunk count as a JOINED 1-row agg (the oracle's `nt`
      // CTE), not a driver-side count — the build phase stays lazy
      val nt = scored.agg(count(lit(1)).as("n_chunks"))
      val rows = (1 to 4).map { np =>
        val cand = scored.filter(col("prn") <= np)
        val top = cand
          .orderBy(col("cos_fp").desc, col("doc_id").asc,
            col("chunk_idx").asc)
          .limit(10).select("doc_id", "chunk_idx")
        cand.agg(count(lit(1)).as("n_candidates"))
          .crossJoin(broadcast(
            exact.join(top, Seq("doc_id", "chunk_idx"))
              .agg(count(lit(1)).as("n_hit"))))
          .crossJoin(broadcast(nt))
          .select(lit(np.toLong).as("nprobe"), col("n_candidates"),
            col("n_hit"),
            expr("(n_hit * 1000000) div 10").as("recall_fp"),
            expr("(n_candidates * 1000000) div n_chunks")
              .as("cand_frac_fp"))
      }
      rows.reduce(_ unionByName _).orderBy("nprobe")
    },
    Some {
      def branch(np: Int): String =
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM swept
           |   WHERE prn <= $np) AS n_candidates,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM exact e JOIN (
           |      SELECT doc_id, chunk_idx FROM swept WHERE prn <= $np
           |      ORDER BY cos_fp DESC, doc_id ASC, chunk_idx ASC
           |      LIMIT 10) t USING (doc_id, chunk_idx)) AS n_hit""".stripMargin
      s"""WITH ${TextQueries.ChunkCtesSql},
         |${DenseChunks.ctesSql},
         |prank AS (SELECT cid, CAST(row_number() OVER (
         |      ORDER BY ${DenseChunks.intCosFpSql("c.dot", "qn.nq", "dn.ncc")}
         |        DESC, c.cid ASC) AS BIGINT) AS prn
         |  FROM qcdot c JOIN dnorm dn USING (cid), qnorm qn),
         |eall AS (SELECT c.doc_id, c.chunk_idx,
         |    CAST(SUM(c.v * q.qv) AS BIGINT) AS dot
         |  FROM ccomp c JOIN qcomp q USING (j) GROUP BY 1, 2),
         |swept AS (SELECT e.doc_id, e.chunk_idx,
         |    ${DenseChunks.intCosFpSql("e.dot", "qn.nq", "n.nn")} AS cos_fp,
         |    pr.prn
         |  FROM eall e JOIN cnorm n USING (doc_id, chunk_idx)
         |    JOIN assigned a USING (doc_id, chunk_idx)
         |    JOIN prank pr ON pr.cid = a.cid, qnorm qn),
         |exact AS (SELECT doc_id, chunk_idx FROM swept
         |  ORDER BY cos_fp DESC, doc_id ASC, chunk_idx ASC LIMIT 10),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks FROM swept),
         |curve AS (${(1 to 4).map(branch).mkString("\n UNION ALL\n")})
         |SELECT nprobe, n_candidates, n_hit,
         |  CAST((n_hit * 1000000) // 10 AS BIGINT) AS recall_fp,
         |  CAST((n_candidates * 1000000) // n_chunks AS BIGINT)
         |    AS cand_frac_fp
         |FROM curve, nt ORDER BY nprobe""".stripMargin
    })

  val all: Seq[NamedQuery] = Seq(
    q19KnnBruteForce, q20AnnLsh, q21EmbeddingNearDup, q26AnnIvf,
    q33AnnRecall, q34AnnIvfKmeans, q36AnnLshMultiProbe,
    q42AnnLshMultiTable, q57AnnLshMultiProbe2, q75LabelCentroids,
    q83ProductQuantization, q85SemanticDedup, q93IvfPqSearch,
    q94KnnTopKAgg, q102CrossLabelPairs, q109RetrievalMetrics,
    q110IncrementalIvf, q125JlProjection, q149FilteredAnn, q150HybridRrf,
    q157TruncationAblation, q170KnnLabelTransfer, q171NegativeSampling,
    q175IvfCellBalance, q178HashEmbedding, q184DenseChunkRetrieval,
    q185CdfIndexMaintenance, q186DenseRecall, q187HybridChunkRrf,
    q190ContextPack, q193IndexStaleness, q194NprobeSweep)
}

/** The dense chunk-retrieval tier shared by q184 (read path), q186
  * (recall eval) and q187 (hybrid fusion): 64/16 token chunks
  * ([[graft.operators.Chunker]]) hash-embedded into 16 integer dims
  * (q178's feature-hashing construction at chunk granularity), with
  * frozen doc-level coarse centroids and a driver-literal query vector
  * over [[TextQueries.Bm25Terms]] — the same three terms as the
  * lexical path, so the two read paths are directly comparable.
  *
  * Scale shape (the part every consumer inherits): the (chunk, dim)
  * component table is ONE hash-agg over the chunk scan, cached because
  * assignment and query scoring both read it; centroid components
  * (≤128 rows), probes and query components are all broadcast; dot
  * products accumulate through dim-keyed joins — vectors never
  * materialize as arrays and nothing quadratic shuffles.
  *
  * SQL mirrors: [[ctesSql]] (components → assignment → probes) and
  * [[candScoredCtesSql]] (probed-candidate scoring → `dscored`) are
  * WITH-fragments over [[TextQueries.ChunkCtesSql]]'s `chunks` CTE.
  */
private[queries] object DenseChunks {
  import org.apache.spark.sql.{Column, DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import graft.Tables
  import graft.functions.TextFunctions.{hash60, tokens}

  final case class Parts(ccomp: DataFrame, cnorm: DataFrame,
    dcomp: DataFrame, dnorm: DataFrame, qcomp: DataFrame, nq: Long)

  /** floor(dot/(‖a‖·‖b‖)·1e6) with integer dot and integer squared
    * norms — the one double step, in the identical op order as q178's
    * oracle (divide, then scale, then floor).
    */
  def intCosFp(dot: Column, nn1: Column, nn2: Column): Column =
    floor(dot.cast("double") /
      (sqrt(nn1.cast("double")) * sqrt(nn2.cast("double"))) *
      lit(1000000.0)).cast("long")

  def intCosFpSql(dot: String, nn1: String, nn2: String): String =
    s"CAST(floor($dot / (sqrt(CAST($nn1 AS DOUBLE)) * " +
      s"sqrt(CAST($nn2 AS DOUBLE))) * 1000000.0) AS BIGINT)"

  private def signedOne: Column =
    when(expr("(h div 16) % 2") === 0, 1L).otherwise(-1L)

  def parts(s: SparkSession, d: String): Parts =
    partsFrom(s, d, graft.operators.Chunker
      .chunk(Tables.documents(s, d), "doc_id", "text", 64, 16))

  /** [[parts]] over an already-materialized chunk table (the q198
    * streaming RAG loop retrieves against a stream-maintained chunk
    * index); centroids/query derivation unchanged.
    */
  def partsFrom(s: SparkSession, d: String, chunks: DataFrame): Parts = {
    // chunk-level feature-hash components: one (chunk, dim) hash-agg,
    // cached — cell assignment AND query scoring both read it
    val ccomp = chunks
      .select(col("doc_id"), col("chunk_idx"), col("first_token_offset"),
        explode(tokens(col("chunk_text"))).as("term"))
      .withColumn("h", hash60(concat(lit("fh:"), col("term"))))
      .groupBy(col("doc_id"), col("chunk_idx"),
        col("first_token_offset"), (col("h") % 16).as("j"))
      .agg(sum(signedOne).as("v"))
      .filter(col("v") =!= 0)
      .cache()
    val cnorm = ccomp.groupBy("doc_id", "chunk_idx")
      .agg(sum(col("v") * col("v")).as("nn"))
    // frozen coarse centroids: doc-level hash embeddings of docs 0-7
    val dcomp = Tables.documents(s, d).filter(col("doc_id") < 8)
      .select(col("doc_id").as("cid"), explode(tokens(col("text"))).as("term"))
      .withColumn("h", hash60(concat(lit("fh:"), col("term"))))
      .groupBy(col("cid"), (col("h") % 16).as("j"))
      .agg(sum(signedOne).as("cv"))
      .filter(col("cv") =!= 0)
    val dnorm = dcomp.groupBy("cid").agg(sum(col("cv") * col("cv")).as("ncc"))
    // query components: md5-derived on the driver (the oracle replays
    // the same derivation in SQL), shipped as a <=16-row literal frame
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = java.lang.Long.parseLong(
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val qcomp0 = TextQueries.Bm25Terms.map(t => h60("fh:" + t))
      .groupBy(_ % 16).view
      .mapValues(_.map(h => if ((h / 16) % 2 == 0) 1L else -1L).sum)
      .toSeq.filter(_._2 != 0L)
    val nq = qcomp0.map { case (_, v) => v * v }.sum
    import s.implicits._
    Parts(ccomp, cnorm, dcomp, dnorm, qcomp0.toDF("j", "qv"), nq)
  }

  /** (doc_id, chunk_idx, cid): every chunk's best frozen centroid by
    * (cos_fp desc, cid asc) — broadcast components, dim-keyed dots,
    * partial-agg argmax ([[graft.operators.Similarity.ivfAssign]]'s
    * shape on component tables).
    */
  def assigned(p: Parts): DataFrame =
    p.ccomp.join(broadcast(p.dcomp), Seq("j"))
      .groupBy("doc_id", "chunk_idx", "cid")
      .agg(sum(col("v") * col("cv")).as("dot"))
      .join(p.cnorm, Seq("doc_id", "chunk_idx"))
      .join(broadcast(p.dnorm), Seq("cid"))
      .withColumn("cos_fp", intCosFp(col("dot"), col("nn"), col("ncc")))
      .groupBy("doc_id", "chunk_idx")
      .agg(max_by(col("cid"), struct(col("cos_fp"), -col("cid"))).as("cid"))

  /** The query's `nprobe` best cells (tiny — |centroids| rows in). */
  def probes(p: Parts, nprobe: Int): DataFrame =
    p.dcomp.join(broadcast(p.qcomp), Seq("j"))
      .groupBy("cid").agg(sum(col("cv") * col("qv")).as("dot"))
      .join(p.dnorm, Seq("cid"))
      .withColumn("cos_fp", intCosFp(col("dot"), lit(p.nq), col("ncc")))
      .orderBy(col("cos_fp").desc, col("cid").asc).limit(nprobe)
      .select("cid")

  /** (doc_id, chunk_idx) of every chunk assigned to a probed cell. */
  def probedCandidates(p: Parts, nprobe: Int): DataFrame =
    assigned(p).join(broadcast(probes(p, nprobe)), Seq("cid"))
      .select("doc_id", "chunk_idx")

  /** Chunks scored against the query vector — all of them, or only
    * `only`'s (doc_id, chunk_idx) set (the IVF-probed path). Output:
    * (doc_id, chunk_idx, first_token_offset, cos_fp).
    */
  def scoredVsQuery(p: Parts, only: Option[DataFrame]): DataFrame = {
    val base = only match {
      case Some(cand) => p.ccomp.join(cand, Seq("doc_id", "chunk_idx"), "left_semi")
      case None => p.ccomp
    }
    base.join(broadcast(p.qcomp), Seq("j"))
      .groupBy("doc_id", "chunk_idx", "first_token_offset")
      .agg(sum(col("v") * col("qv")).as("dot"))
      .join(p.cnorm, Seq("doc_id", "chunk_idx"))
      .withColumn("cos_fp", intCosFp(col("dot"), lit(p.nq), col("nn")))
      .select("doc_id", "chunk_idx", "first_token_offset", "cos_fp")
  }

  /** Components → assignment → probes, as DuckDB WITH-fragments over
    * [[TextQueries.ChunkCtesSql]]'s `chunks`.
    */
  def ctesSql: String = {
    val values = TextQueries.Bm25Terms.map(t => s"('$t')").mkString(", ")
    s"""chx AS (SELECT doc_id, chunk_idx, first_token_offset,
       |    ('0x'||substring(md5('fh:'||term),1,15))::BIGINT AS h
       |  FROM (SELECT doc_id, chunk_idx, first_token_offset,
       |        unnest(ct) AS term FROM chunks)),
       |ccomp AS (SELECT doc_id, chunk_idx, first_token_offset,
       |    h % 16 AS j,
       |    CAST(SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END)
       |      AS BIGINT) AS v
       |  FROM chx GROUP BY 1, 2, 3, 4
       |  HAVING SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) <> 0),
       |cnorm AS (SELECT doc_id, chunk_idx, CAST(SUM(v*v) AS BIGINT) AS nn
       |  FROM ccomp GROUP BY 1, 2),
       |dhx AS (SELECT doc_id AS cid,
       |    ('0x'||substring(md5('fh:'||term),1,15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(string_split(lower(text),' '))
       |        AS term FROM documents WHERE doc_id < 8)),
       |dcomp AS (SELECT cid, h % 16 AS j,
       |    CAST(SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END)
       |      AS BIGINT) AS cv
       |  FROM dhx GROUP BY 1, 2
       |  HAVING SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) <> 0),
       |dnorm AS (SELECT cid, CAST(SUM(cv*cv) AS BIGINT) AS ncc
       |  FROM dcomp GROUP BY 1),
       |qhx AS (SELECT ('0x'||substring(md5('fh:'||t),1,15))::BIGINT AS h
       |  FROM (VALUES $values) AS v(t)),
       |qcomp AS (SELECT h % 16 AS j,
       |    CAST(SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END)
       |      AS BIGINT) AS qv
       |  FROM qhx GROUP BY 1
       |  HAVING SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) <> 0),
       |qnorm AS (SELECT CAST(SUM(qv*qv) AS BIGINT) AS nq FROM qcomp),
       |pairdot AS (SELECT c.doc_id, c.chunk_idx, d.cid,
       |    CAST(SUM(c.v * d.cv) AS BIGINT) AS dot
       |  FROM ccomp c JOIN dcomp d USING (j) GROUP BY 1, 2, 3),
       |assigned AS (SELECT doc_id, chunk_idx, cid FROM (
       |    SELECT p.doc_id, p.chunk_idx, p.cid,
       |      row_number() OVER (PARTITION BY p.doc_id, p.chunk_idx
       |        ORDER BY ${intCosFpSql("p.dot", "n.nn", "dn.ncc")} DESC,
       |          p.cid ASC) AS rn
       |    FROM pairdot p JOIN cnorm n USING (doc_id, chunk_idx)
       |      JOIN dnorm dn USING (cid)) WHERE rn = 1),
       |qcdot AS (SELECT d.cid, CAST(SUM(d.cv * q.qv) AS BIGINT) AS dot
       |  FROM dcomp d JOIN qcomp q USING (j) GROUP BY 1),
       |probes AS (SELECT cid FROM (SELECT c.cid,
       |      ${intCosFpSql("c.dot", "qn.nq", "dn.ncc")} AS cos_fp
       |    FROM qcdot c JOIN dnorm dn USING (cid), qnorm qn)
       |  ORDER BY cos_fp DESC, cid ASC LIMIT 2)""".stripMargin
  }

  /** Probed-candidate scoring (`cand` → `cdot` → `dscored`). */
  def candScoredCtesSql: String =
    s"""cand AS (SELECT a.doc_id, a.chunk_idx FROM assigned a
       |  JOIN probes USING (cid)),
       |cdot AS (SELECT c.doc_id, c.chunk_idx, c.first_token_offset,
       |    CAST(SUM(c.v * q.qv) AS BIGINT) AS dot
       |  FROM ccomp c JOIN qcomp q USING (j)
       |    JOIN cand USING (doc_id, chunk_idx)
       |  GROUP BY 1, 2, 3),
       |dscored AS (SELECT s.doc_id, s.chunk_idx, s.first_token_offset,
       |    ${intCosFpSql("s.dot", "qn.nq", "n.nn")} AS cos_fp
       |  FROM cdot s JOIN cnorm n USING (doc_id, chunk_idx), qnorm qn)""".stripMargin
}
