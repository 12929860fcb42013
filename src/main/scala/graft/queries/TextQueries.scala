package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions._
import graft.operators.TextDedup

/** Training-data text pipeline over the `documents` table: exact dedup,
  * n-gram Jaccard near-dup, MinHash+LSH, SimHash+hamming banding, quality
  * scoring, language ID, and fingerprinting. Every query has a full DuckDB
  * oracle — the md5-derived [[graft.functions.TextFunctions.hash60]] makes
  * the hashes reproducible across engines, so even the MinHash/SimHash
  * pipelines are checked end-to-end, not just row counts.
  */
object TextQueries {

  /** DuckDB rendering of hash60(expr). */
  private def h60(e: String): String =
    s"('0x'||substring(md5($e),1,15))::BIGINT"

  /** Shared CTEs: lower-cased tokens and distinct word 3-gram sets. */
  private val gramsCte =
    """toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
      |grams AS (SELECT DISTINCT doc_id, g FROM toks,
      |  unnest(list_transform(range(1, len(ts)-1),
      |    i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
      |  WHERE len(ts) >= 3)""".stripMargin

  val q12ExactDupGroups = NamedQuery(
    "q12_exact_dup_groups",
    "Exact text dedup: one hash-aggregate keyed by md5(lower(text)) with " +
      "map-side partial aggregation; emits group size + canonical min id.",
    (s, d) =>
      TextDedup.exactDupGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy("text_hash"),
    Some("""SELECT md5(lower(text)) AS text_hash, COUNT(*) AS n_dups,
           |  MIN(doc_id) AS canonical_id
           |FROM documents GROUP BY md5(lower(text))
           |ORDER BY text_hash""".stripMargin))

  val q13JaccardPairs = NamedQuery(
    "q13_ngram_jaccard_pairs",
    "Exact word-3-gram Jaccard near-dup pairs (j ≥ 0.5) via shared-gram " +
      "join — the correctness reference for q14's MinHash+LSH scale path.",
    (s, d) =>
      TextDedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, minJaccard = 0.5)
        .orderBy("id_a", "id_b"),
    Some(s"""WITH $gramsCte,
            |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
            |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            |  GROUP BY a.doc_id, b.doc_id)
            |SELECT id_a, id_b,
            |  CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) AS jaccard_fp
            |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            |WHERE CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) >= 500000
            |ORDER BY id_a, id_b""".stripMargin))

  private val NumHashes = 16
  private val Bands     = 4

  /** All CTEs up through `pairs` = the verified MinHash+LSH near-dup pair
    * set (id_a, id_b, jaccard_fp ≥ 0.5) — shared by q14 (the pairs
    * themselves) and q53 (connected-component clusters over them).
    */
  private def minhashPairsCtes: String = {
    val rows = NumHashes / Bands
    val sigCols = (0 until NumHashes)
      .map(i => s"min(${h60(s"'$i:'||g")}) AS h$i").mkString(", ")
    val bandSel = (0 until Bands).map { b =>
      val hs = (0 until rows).map(r => s"h${b * rows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $hs)) AS band_key FROM sig"
    }.mkString(" UNION ALL ")
    s"""$gramsCte,
       |sig AS (SELECT doc_id, $sigCols FROM grams GROUP BY doc_id),
       |bands AS ($bandSel),
       |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, COUNT(*) AS n_inter FROM cands
       |  JOIN grams ga ON ga.doc_id = id_a
       |  JOIN grams gb ON gb.doc_id = id_b AND gb.g = ga.g
       |  GROUP BY id_a, id_b),
       |pairs AS (SELECT id_a, id_b,
       |    CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) AS jaccard_fp
       |  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) >= 500000)""".stripMargin
  }

  val q14MinhashLsh = NamedQuery(
    "q14_minhash_lsh",
    "MinHash(16)+LSH(4 bands×4 rows) near-dup detection, candidates " +
      "verified with exact Jaccard — the 100 TB dedup path: signature " +
      "aggregation is one partial-min shuffle, candidates are bounded by " +
      "band collisions instead of shared-gram joins.",
    (s, d) =>
      TextDedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
        .orderBy("id_a", "id_b"),
    Some(s"""WITH $minhashPairsCtes
            |SELECT id_a, id_b, jaccard_fp FROM pairs
            |ORDER BY id_a, id_b""".stripMargin))

  /** q53: near-dup pairs → dedup CLUSTERS. The oracle replays the label
    * propagation as a DuckDB recursive CTE (UNION-deduplicated walk =
    * fixed-point reachability), so the cluster assignment — not just the
    * pair set — is hash-checked cross-engine.
    */
  val q53DedupClusters = NamedQuery(
    "q53_dedup_clusters",
    "Dedup clusters from the q14 MinHash+LSH pair set via distributed " +
      "min-label connected components: cluster id = min member doc_id, " +
      "member count + sorted member list — the step that turns near-dup " +
      "pairs into per-cluster canonical survivors.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
        n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
      // star variant: O(log n) rounds vs min-label's O(diameter) — the
      // same component labels (spec-proven equal), chosen for the hot
      // path so a long-chain dup graph at 100 TB can't stall the round
      // count (round-4 verdict item)
      val comp = graft.operators.GraphOps.connectedComponentsStar(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      comp.groupBy(col("component").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          concat_ws(",", array_sort(collect_list(col("id")))).as("member_ids"))
        .filter(col("n_members") >= 2)
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE $minhashPairsCtes,
            |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            |  UNION ALL SELECT id_b, id_a FROM pairs),
            |reach(id, label) AS (
            |  SELECT doc_id, doc_id FROM documents
            |  UNION
            |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
            |comp AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id)
            |SELECT cluster_id, COUNT(*) AS n_members,
            |  array_to_string(list_sort(list(id)), ',') AS member_ids
            |FROM comp GROUP BY cluster_id HAVING COUNT(*) >= 2
            |ORDER BY cluster_id""".stripMargin))

  /** q96: canonical survivor selection — the step AFTER clustering that
    * actually deduplicates a corpus: per q53 cluster, keep the member
    * with the best quality (here: distinct-token count, an integer) and
    * list the members dropped. Tie-breaks on doc_id asc, so survivor
    * choice is deterministic and engine-exact. Scale shape: quality is
    * one (doc, term) hash-agg; survivor is `max_by` over the cluster
    * (partial-agg, no per-cluster sort); the dropped list reuses the
    * same collected members q53 already carries. At 100 TB the cluster
    * table is tiny relative to the corpus (only docs in ≥2-member
    * clusters), so every join here is on the small side.
    */
  val q96CanonicalSurvivors = NamedQuery(
    "q96_canonical_survivors",
    "Per dedup cluster (q53), pick the survivor by (distinct-token " +
      "quality desc, doc_id asc); emit survivor, quality, dropped ids.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
        n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
      // star variant: O(log n) rounds vs min-label's O(diameter) — the
      // same component labels (spec-proven equal), chosen for the hot
      // path so a long-chain dup graph at 100 TB can't stall the round
      // count (round-4 verdict item)
      val comp = graft.operators.GraphOps.connectedComponentsStar(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      // quality is only consulted for docs in ≥2-member clusters — a
      // tiny fraction of the corpus — so tokenize ONLY those members
      // (semi-join first): at 100 TB, scoring the whole corpus to rank
      // 0.1% of it is the waste this avoids. Result is unchanged: the
      // dropped quality rows belonged to singletons the final filter
      // discards anyway.
      val inCluster = comp.groupBy("component")
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      val members = comp.join(broadcast(inCluster.select("component")),
        Seq("component"), "left_semi")
      val qual = docs
        .join(members.select(col("id").as("doc_id")), Seq("doc_id"),
          "left_semi")
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .groupBy("doc_id").agg(countDistinct(col("t")).as("quality"))
      members.join(qual, members("id") === qual("doc_id"))
        .groupBy(col("component").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max_by(col("id"), struct(col("quality"), -col("id"))).as("survivor_id"),
          max(struct(col("quality"), -col("id"))).getField("quality")
            .as("survivor_quality"),
          array_sort(collect_list(col("id"))).as("members"))
        .filter(col("n_members") >= 2)
        .withColumn("dropped_ids",
          concat_ws(",", array_remove(col("members"), col("survivor_id"))))
        .select("cluster_id", "n_members", "survivor_id",
          "survivor_quality", "dropped_ids")
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE $minhashPairsCtes,
            |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            |  UNION ALL SELECT id_b, id_a FROM pairs),
            |reach(id, label) AS (
            |  SELECT doc_id, doc_id FROM documents
            |  UNION
            |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
            |comp AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
            |qual AS (SELECT doc_id, CAST(COUNT(DISTINCT u) AS BIGINT) AS quality
            |  FROM toks, unnest(ts) AS t(u) GROUP BY doc_id),
            |cl AS (SELECT c.cluster_id, c.id, q.quality
            |  FROM comp c JOIN qual q ON q.doc_id = c.id),
            |surv AS (SELECT cluster_id, id AS survivor_id,
            |    quality AS survivor_quality FROM (
            |  SELECT *, row_number() OVER (PARTITION BY cluster_id
            |    ORDER BY quality DESC, id ASC) AS rn FROM cl) WHERE rn = 1)
            |SELECT cl.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
            |  s.survivor_id, s.survivor_quality,
            |  array_to_string(list_sort(list(cl.id) FILTER (WHERE cl.id <> s.survivor_id)),
            |    ',') AS dropped_ids
            |FROM cl JOIN surv s USING (cluster_id)
            |GROUP BY cl.cluster_id, s.survivor_id, s.survivor_quality
            |HAVING COUNT(*) >= 2
            |ORDER BY cluster_id""".stripMargin))

  /** q105: LEAKAGE-SAFE dataset split — q39 splits by doc hash, which
    * silently puts near-duplicate docs on both sides of the train/test
    * wall (the eval-contamination mode n-gram decontamination (q88)
    * then has to mop up). The correct unit of assignment is the DEDUP
    * CLUSTER: hash the q53 component id, so every near-dup family
    * lands in exactly one split by construction — and the query
    * HASH-CHECKS that invariant (`n_leaky_clusters` = clusters
    * spanning >1 split = 0) instead of assuming it. Scale shape: the
    * cluster table is the q53 plan (LSH pairs + O(diameter) CC rounds
    * on the tiny near-dup subgraph); assignment and accounting are one
    * hash-agg each.
    */
  val q105ClusterSplit = NamedQuery(
    "q105_cluster_split",
    "80/10/10 split assigned per dedup CLUSTER (q53 components), not " +
      "per doc: per-split doc/cluster counts + the leakage invariant " +
      "(0 clusters span splits), hash-checked.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
        n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
      // star variant: O(log n) rounds vs min-label's O(diameter) — the
      // same component labels (spec-proven equal), chosen for the hot
      // path so a long-chain dup graph at 100 TB can't stall the round
      // count (round-4 verdict item)
      val comp = graft.operators.GraphOps.connectedComponentsStar(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      val h = hash60(col("component").cast("string")) % 100
      val asg = comp.withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      val leak = asg.groupBy("component")
        .agg(countDistinct("split").as("ns"))
        .agg(count(when(col("ns") > 1, 1)).as("n_leaky_clusters"))
      asg.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("component").as("n_clusters"))
        .crossJoin(broadcast(leak))
        .orderBy("split")
    },
    Some(s"""WITH RECURSIVE $minhashPairsCtes,
            |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            |  UNION ALL SELECT id_b, id_a FROM pairs),
            |reach(id, label) AS (
            |  SELECT doc_id, doc_id FROM documents
            |  UNION
            |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
            |comp AS (SELECT id, MIN(label) AS cluster FROM reach GROUP BY id),
            |asg AS (SELECT id, cluster,
            |    CASE WHEN hm < 80 THEN 'train' WHEN hm < 90 THEN 'val'
            |      ELSE 'test' END AS split
            |  FROM (SELECT *,
            |    ('0x'||substring(md5(CAST(cluster AS VARCHAR)),1,15))::BIGINT
            |      % 100 AS hm
            |  FROM comp)),
            |leak AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_clusters
            |  FROM (SELECT cluster FROM asg GROUP BY cluster
            |    HAVING COUNT(DISTINCT split) > 1))
            |SELECT split, COUNT(*) AS n_docs,
            |  CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters,
            |  n_leaky_clusters
            |FROM asg, leak
            |GROUP BY split, n_leaky_clusters
            |ORDER BY split""".stripMargin))

  val q15SimhashHamming = NamedQuery(
    "q15_simhash_hamming",
    "60-bit tf-weighted SimHash per doc (array HOFs, zero shuffle) + " +
      "banded hamming join: 6 chunks × 10 bits find all pairs with " +
      "hamming ≤ 5 by pigeonhole, verified with bit_count(xor).",
    (s, d) =>
      TextDedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 5)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id_a", "id_b"),
    Some(s"""WITH toksd AS (SELECT doc_id, u AS tok FROM
            |    (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
            |    unnest(ts) AS t(u)),
            |bits AS (SELECT doc_id, b,
            |    sum(CASE WHEN (${h60("tok")} >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
            |  FROM toksd, unnest(range(0,60)) AS t(b) GROUP BY doc_id, b),
            |sim AS (SELECT doc_id,
            |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
            |  FROM bits GROUP BY doc_id),
            |chunks AS (SELECT doc_id, sh, c, (sh >> (c*10)) & 1023 AS cv
            |  FROM sim, unnest(range(0,6)) AS t(c)),
            |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            |  FROM chunks a JOIN chunks b
            |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
            |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 5
            |ORDER BY id_a, id_b""".stripMargin))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  val q16TextQuality = NamedQuery(
    "q16_text_quality",
    "Per-document quality metrics computed row-local (no shuffle): " +
      "whitespace + BPE-ish regex token counts, distinct-token ratio, mean " +
      "token length, stopword ratio, punctuation ratio.",
    (s, d) => {
      // token-derived counts come from ONE native pass
      // (NativeExpressions.TokenStats: [n, n_distinct, sum_len, n_stop])
      // instead of four interpreted HOF walks — bit-identical values,
      // cross-checked in NativeExpressionsSpec; the two regex metrics
      // keep their regex contract
      val st = graft.functions.NativeExpressions.tokenStats(
        tokens(col("text")), Stopwords)
      val nTok = element_at(st, 1)
      Tables.documents(s, d).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_bpe_tokens"),
        fp6(element_at(st, 2).cast("double") / nTok).as("distinct_ratio_fp"),
        fp6(element_at(st, 3).cast("double") / nTok).as("mean_token_len_fp"),
        fp6(element_at(st, 4).cast("double") / nTok).as("stopword_ratio_fp"),
        fp6(punctCount(col("text")).cast("double") / length(col("text")))
          .as("punct_ratio_fp"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
            |  CAST(len(ts) AS BIGINT) AS n_tokens,
            |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
            |  CAST(floor(CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts)*1000000.0) AS BIGINT) AS distinct_ratio_fp,
            |  CAST(floor(CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE)/len(ts)*1000000.0) AS BIGINT) AS mean_token_len_fp,
            |  CAST(floor(CAST(len(list_filter(ts, x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)/len(ts)*1000000.0) AS BIGINT) AS stopword_ratio_fp,
            |  CAST(floor(CAST(len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)/len(text)*1000000.0) AS BIGINT) AS punct_ratio_fp
            |FROM (SELECT *, string_split(lower(text),' ') AS ts FROM documents)
            |ORDER BY doc_id""".stripMargin))

  private val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "is",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "y", "es" -> "es",
    "fr" -> "le", "fr" -> "la", "fr" -> "de", "fr" -> "et", "fr" -> "est",
    "zh" -> "的", "zh" -> "是", "zh" -> "了")

  val q17LangId = NamedQuery(
    "q17_lang_id",
    "Heuristic language ID: token-occurrence scoring against a broadcast " +
      "marker-word table, argmax per doc (score desc, lang asc tiebreak), " +
      "compared to the labeled lang.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val markers = s.createDataFrame(LangMarkers).toDF("m_lang", "m_word")
      val toks = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("tok"))
      val scores = toks
        .join(broadcast(markers), col("tok") === col("m_word"))
        .groupBy("doc_id", "m_lang")
        .agg(count(lit(1)).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("m_lang").asc)
      val best = scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("doc_id"), col("m_lang"))
      docs.join(best, Seq("doc_id"), "left_outer")
        .select(
          col("doc_id"),
          coalesce(col("m_lang"), lit("und")).as("predicted_lang"),
          col("lang").as("actual_lang"),
          when(coalesce(col("m_lang"), lit("und")) === col("lang"), 1L)
            .otherwise(0L).as("is_match"))
        .orderBy("doc_id")
    },
    Some {
      val vals = LangMarkers.map { case (l, w) => s"('$l','$w')" }.mkString(", ")
      s"""WITH m(m_lang, m_word) AS (SELECT * FROM (VALUES $vals)),
         |toks AS (SELECT doc_id, u AS tok FROM
         |  (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
         |  unnest(ts) AS t(u)),
         |scores AS (SELECT doc_id, m_lang, COUNT(*) AS score
         |  FROM toks JOIN m ON tok = m_word GROUP BY doc_id, m_lang),
         |best AS (SELECT doc_id, m_lang, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY score DESC, m_lang ASC) AS rn
         |  FROM scores)
         |SELECT d.doc_id, COALESCE(b.m_lang, 'und') AS predicted_lang,
         |  d.lang AS actual_lang,
         |  CASE WHEN COALESCE(b.m_lang, 'und') = d.lang THEN 1 ELSE 0 END::BIGINT AS is_match
         |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    })

  val q18Fingerprint = NamedQuery(
    "q18_fingerprint",
    "Document fingerprinting: min word-3-gram hash60 (a 1-hash MinHash / " +
      "rolling-hash sketch) + full-text digest, row-local computation.",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        fingerprint(col("text")).as("fingerprint"),
        TextDedup.textDigest(col("text")).as("text_hash"))
        .orderBy("doc_id"),
    Some(s"""WITH $gramsCte,
            |mins AS (SELECT doc_id, min(${h60("g")}) AS mg FROM grams GROUP BY doc_id)
            |SELECT d.doc_id,
            |  COALESCE(m.mg, ${h60("lower(d.text)")}) AS fingerprint,
            |  md5(lower(d.text)) AS text_hash
            |FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id
            |ORDER BY d.doc_id""".stripMargin))

  private val MinCleanTokens = 20

  /** q41: the whole cleaning pipeline COMPOSED — what a training-data
    * user actually runs: exact dedup survivors → MinHash+LSH near-dup
    * removal (drop the larger id of every confirmed pair) → minimum-
    * length quality gate → per-language corpus accounting. Exercises
    * that the operators chain as DataFrames (each stage consumes the
    * previous stage's frame, Catalyst plans the whole thing as one DAG)
    * and that the composed result — not just each stage — hash-matches
    * the oracle.
    */
  val q41CleanCorpus = NamedQuery(
    "q41_clean_corpus",
    "Composed cleaning pipeline: exact-dup survivors, LSH near-dup " +
      s"removal (j ≥ 0.5), ≥ $MinCleanTokens-token gate, per-lang " +
      "doc/token accounting.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val survivors = TextDedup.dropExactDups(docs, "doc_id", "text")
      val nearDups = TextDedup.minhashNearDups(survivors, "doc_id", "text",
        n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
      val clean = survivors
        .join(nearDups.select(col("id_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .filter(size(tokens(col("text"))) >= MinCleanTokens)
      clean.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text"))).cast("long")).as("total_tokens"))
        .orderBy("lang")
    },
    Some {
      val rows = NumHashes / Bands
      val sigCols = (0 until NumHashes)
        .map(i => s"min(${h60(s"'$i:'||g")}) AS h$i").mkString(", ")
      val bandSel = (0 until Bands).map { b =>
        val hs = (0 until rows).map(r => s"h${b * rows + r}").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws(',', $hs)) AS band_key FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH surv_ids AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(lower(text))),
         |surv AS (SELECT d.* FROM documents d
         |  JOIN surv_ids si ON d.doc_id = si.doc_id),
         |toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM surv),
         |grams AS (SELECT DISTINCT doc_id, g FROM toks,
         |  unnest(list_transform(range(1, len(ts)-1),
         |    i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
         |  WHERE len(ts) >= 3),
         |sig AS (SELECT doc_id, $sigCols FROM grams GROUP BY doc_id),
         |bands AS ($bandSel),
         |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, COUNT(*) AS n_inter FROM cands
         |  JOIN grams ga ON ga.doc_id = id_a
         |  JOIN grams gb ON gb.doc_id = id_b AND gb.g = ga.g
         |  GROUP BY id_a, id_b),
         |nd AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) >= 500000),
         |dropped AS (SELECT DISTINCT id_b AS doc_id FROM nd),
         |clean AS (SELECT s.* FROM surv s
         |  LEFT JOIN dropped dr ON s.doc_id = dr.doc_id
         |  WHERE dr.doc_id IS NULL
         |    AND len(string_split(lower(s.text),' ')) >= $MinCleanTokens)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(len(string_split(lower(text),' ')) AS BIGINT)) AS BIGINT) AS total_tokens
         |FROM clean GROUP BY lang ORDER BY lang""".stripMargin
    })

  /** q54: Gopher-style within-document repetition signals. Two keyed
    * count aggregations (token and 2-gram occurrence counts per doc) —
    * no all-pairs work, shuffles keyed by (doc_id, term); at corpus
    * scale this is linear in total tokens, the same shape a quality
    * filter stage runs before training.
    */
  val q54RepetitionMetrics = NamedQuery(
    "q54_repetition_metrics",
    "Within-document repetition: duplicate-token fraction, duplicate " +
      "2-gram fraction, and top-2-gram mass per doc — the Gopher " +
      "repetition quality signals, as keyed count aggregations.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tstats = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct_tokens"))
      val gstats = docs
        .select(col("doc_id"),
          explode(wordNgrams(tokens(col("text")), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_2grams"), count(lit(1)).as("n_distinct_2grams"),
          max("c").as("top_2gram_count"))
      tstats.join(gstats, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
          fp6((col("n_tokens") - col("n_distinct_tokens")).cast("double")
            / col("n_tokens")).as("dup_token_frac_fp"),
          col("n_2grams"), col("top_2gram_count"),
          fp6((col("n_2grams") - col("n_distinct_2grams")).cast("double")
            / col("n_2grams")).as("dup_2gram_frac_fp"),
          fp6(col("top_2gram_count").cast("double") / col("n_2grams"))
            .as("top_2gram_frac_fp"))
        .orderBy("doc_id")
    },
    Some("""WITH toksd AS (SELECT doc_id, u AS tok FROM
           |    (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |    unnest(ts) AS t(u)),
           |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toksd GROUP BY doc_id, tok),
           |tstats AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           |    COUNT(*) AS n_distinct_tokens FROM tc GROUP BY doc_id),
           |g2 AS (SELECT doc_id, g FROM
           |    (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |    unnest(list_transform(range(1, len(ts)), i -> ts[i]||' '||ts[i+1])) AS t(g)
           |  WHERE len(ts) >= 2),
           |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
           |gstats AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
           |    COUNT(*) AS n_distinct_2grams, CAST(MAX(c) AS BIGINT) AS top_2gram_count
           |  FROM gc GROUP BY doc_id)
           |SELECT t.doc_id, n_tokens, n_distinct_tokens,
           |  CAST(floor(CAST(n_tokens - n_distinct_tokens AS DOUBLE)/n_tokens*1000000.0) AS BIGINT) AS dup_token_frac_fp,
           |  n_2grams, top_2gram_count,
           |  CAST(floor(CAST(n_2grams - n_distinct_2grams AS DOUBLE)/n_2grams*1000000.0) AS BIGINT) AS dup_2gram_frac_fp,
           |  CAST(floor(CAST(top_2gram_count AS DOUBLE)/n_2grams*1000000.0) AS BIGINT) AS top_2gram_frac_fp
           |FROM tstats t JOIN gstats g ON t.doc_id = g.doc_id
           |ORDER BY t.doc_id""".stripMargin))

  /** q56: fixed-point TF-IDF. idf is the exact integer floor(1e6·N/df)
    * instead of a logarithm — cross-engine `ln` is not guaranteed
    * bit-identical (same reason q37 omits linear counting), and rank
    * order within a doc is preserved for any monotone transform of
    * N/df. df is one distinct + one count aggregation over the corpus;
    * the per-doc ranking only materializes for the queried docs.
    */
  val q56TfidfTopK = NamedQuery(
    "q56_tfidf_topk",
    "Top-3 TF-IDF terms per document (docs 0-19): corpus document " +
      "frequency, integer fixed-point idf = floor(1e6·N/df), rank by " +
      "(score desc, term asc).",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val idf = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .select(col("term"),
          floor(lit(1000000.0) * col("n_docs") / col("df")).cast("long")
            .as("idf_fp"))
      val tf = toks.filter(col("doc_id") < 20)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_fp").desc, col("term").asc)
      tf.join(idf, "term")
        .withColumn("score_fp", col("tf") * col("idf_fp"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "tf", "score_fp", "rank")
        .orderBy("doc_id", "rank")
    },
    Some("""WITH toks AS (SELECT doc_id, u AS term FROM
           |    (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |    unnest(ts) AS t(u)),
           |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
           |dfreq AS (SELECT term, COUNT(*) AS df FROM
           |    (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
           |idf AS (SELECT term, CAST(floor(1000000.0*n_docs/df) AS BIGINT) AS idf_fp
           |  FROM dfreq, nd),
           |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           |  WHERE doc_id < 20 GROUP BY doc_id, term),
           |scored AS (SELECT t.doc_id, t.term, t.tf, t.tf * i.idf_fp AS score_fp
           |  FROM tf t JOIN idf i ON t.term = i.term),
           |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score_fp DESC, term ASC) AS BIGINT) AS rank FROM scored)
           |SELECT doc_id, term, tf, score_fp, rank FROM ranked
           |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin))

  /** q60: incremental dedup — a new batch (a deterministic ~10% slice)
    * checked against the HISTORICAL corpus by exact digest and by
    * near-dup fingerprint, with per-language survivor accounting. This
    * is the daily-increment production shape: the historical side
    * contributes only its distinct digest/fingerprint sets (two keyed
    * semi-join-style lookups), never a re-scan of historical pairs — at
    * 100 TB the increment joins against digest tables (or their
    * [[graft.operators.BloomFilter]] prefilter, q58), not the corpus.
    */
  val q60IncrementalDedup = NamedQuery(
    "q60_incremental_dedup",
    "Incremental-batch dedup vs the historical corpus: per language, " +
      "new-doc count, exact-digest dups, fingerprint near-dups (among " +
      "non-exact), and survivors.",
    (s, d) => {
      // digest + fingerprint computed in ONE scan and cached: the
      // history side needs both identity columns and the new side needs
      // both — three uncached branches re-tokenized the corpus once per
      // identity (round-4 plan audit)
      val base = Tables.documents(s, d)
        .select(col("lang"),
          (hash60(col("doc_id").cast("string")) % 10 === 7).as("is_new"),
          TextDedup.textDigest(col("text")).as("dg"),
          fingerprint(col("text")).as("fp"))
        .cache()
      val hist = base.filter(!col("is_new"))
      val histDg = hist.select(col("dg"))
        .distinct().withColumn("exact_hit", lit(1L))
      val histFp = hist.select(col("fp"))
        .distinct().withColumn("near_hit", lit(1L))
      base.filter(col("is_new"))
        .select(col("lang"), col("dg"), col("fp"))
        .join(histDg, Seq("dg"), "left_outer")
        .join(histFp, Seq("fp"), "left_outer")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_new"),
          sum(coalesce(col("exact_hit"), lit(0L))).as("n_exact_dup"),
          sum(when(col("exact_hit").isNull && col("near_hit") === 1L, 1L)
            .otherwise(0L)).as("n_near_dup"),
          sum(when(col("exact_hit").isNull && col("near_hit").isNull, 1L)
            .otherwise(0L)).as("n_surviving"))
        .orderBy("lang")
    },
    Some("""WITH allfp AS (SELECT d.doc_id, d.lang, md5(lower(d.text)) AS dg,
           |    COALESCE(m.mg, ('0x'||substring(md5(lower(d.text)),1,15))::BIGINT) AS fp,
           |    ('0x'||substring(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 10 = 7 AS is_new
           |  FROM documents d LEFT JOIN (
           |    SELECT doc_id, min(('0x'||substring(md5(g),1,15))::BIGINT) AS mg
           |    FROM (SELECT DISTINCT doc_id, g FROM
           |      (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |      unnest(list_transform(range(1, len(ts)-1),
           |        i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
           |      WHERE len(ts) >= 3)
           |    GROUP BY doc_id) m ON d.doc_id = m.doc_id),
           |hist_dg AS (SELECT DISTINCT dg FROM allfp WHERE NOT is_new),
           |hist_fp AS (SELECT DISTINCT fp FROM allfp WHERE NOT is_new),
           |flagged AS (SELECT lang,
           |    CASE WHEN dg IN (SELECT dg FROM hist_dg) THEN 1 ELSE 0 END AS e,
           |    CASE WHEN fp IN (SELECT fp FROM hist_fp) THEN 1 ELSE 0 END AS nh
           |  FROM allfp WHERE is_new)
           |SELECT lang, COUNT(*) AS n_new,
           |  CAST(SUM(e) AS BIGINT) AS n_exact_dup,
           |  CAST(SUM(CASE WHEN e = 0 AND nh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
           |  CAST(SUM(CASE WHEN e = 0 AND nh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving
           |FROM flagged GROUP BY lang ORDER BY lang""".stripMargin))

  /** q63: corpus-statistics outlier detection — flag documents whose
    * token count is more than 2σ from the corpus mean, the standard
    * length-based quality filter that runs after per-doc metrics (q16)
    * and before sampling. Parity discipline: mean/variance come from
    * EXACT integer moments (n, Σx, Σx² as decimal(38,0) so the products
    * survive 100-TB row counts without long overflow), and the 2σ test
    * is done entirely in integer arithmetic —
    *   (n·x − S)² > 4·(n·Q − S²)  ⇔  (x − μ)² > 4σ²
    * — so the boolean never depends on cross-engine float rounding. The
    * reported z_fp6 = floor(1e6·(n·x−S)/√(n·Q−S²)) does one IEEE sqrt +
    * divide, both correctly-rounded ops, identical in Spark and DuckDB.
    * Scale shape: one global partial-agg to a SINGLE stats row,
    * broadcast back (crossJoin of a 1-row side), then a row-local
    * projection — the corpus is scanned once and never shuffled.
    */
  val q63LengthOutliers = NamedQuery(
    "q63_length_outliers",
    "Token-count z-score per document from exact integer moments " +
      "(decimal(38,0) sums, broadcast 1-row stats), with an " +
      "integer-exact |z|>2 outlier flag.",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
      val stats = base.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("n_tokens").cast("decimal(38,0)")).cast("decimal(38,0)").as("sx"),
        sum((col("n_tokens") * col("n_tokens")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sxx"))
      base.crossJoin(broadcast(stats))
        .withColumn("num", (col("n") * col("n_tokens") - col("sx"))
          .cast("decimal(38,0)"))
        .withColumn("varnum", (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("decimal(38,0)"))
        .select(col("doc_id"), col("n_tokens"),
          // varnum = 0 ⇔ every doc has the same length ⇒ z ≡ 0 (the
          // unguarded 0/0 would NaN and throw under ANSI cast)
          when(col("varnum") === 0, lit(0L)).otherwise(
            floor(col("num").cast("double") * lit(1000000.0) /
              sqrt(col("varnum").cast("double"))).cast("long")).as("z_fp6"),
          (col("num") * col("num") > col("varnum") * lit(4)).as("is_outlier"))
        .orderBy("doc_id")
    },
    Some("""WITH base AS (SELECT doc_id,
           |    CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           |    CAST(SUM(n_tokens) AS HUGEINT) AS sx,
           |    CAST(SUM(n_tokens*n_tokens) AS HUGEINT) AS sxx FROM base)
           |SELECT doc_id, n_tokens,
           |  CASE WHEN n*sxx - sx*sx = 0 THEN 0
           |    ELSE CAST(floor(CAST(n*n_tokens - sx AS DOUBLE) * 1000000.0 /
           |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE))) AS BIGINT)
           |  END AS z_fp6,
           |  (n*n_tokens - sx)*(n*n_tokens - sx) > 4*(n*sxx - sx*sx)
           |    AS is_outlier
           |FROM base, st ORDER BY doc_id""".stripMargin))

  /** q68: the composed corpus-preparation pipeline — the end-to-end flow
    * a training-data user actually runs, as ONE query: quality gate
    * (token count + distinct ratio, q16's fp6 math) → exact dedup
    * (min-doc_id survivor per md5 digest, q12) → near-dup removal
    * (min-doc_id survivor per 3-gram fingerprint, q18/q60) → balanced
    * per-language sampling (q55's hash-mod thresholding). Built as a
    * SINGLE scan with survivorship flags: each stage is a boolean
    * column, stage k's survivor rule is `flag(k−1) AND doc_id =
    * min(doc_id) FILTER flag(k−1) OVER (PARTITION BY stage-key)` — so
    * the corpus is read once, shuffled once per dedup key (the same
    * shuffles the standalone operators do), and never materialized
    * between stages. Sampling rates come from one tiny aggregate
    * broadcast back. Per-language funnel counts make every stage's
    * attrition visible and hash-checked.
    */
  val q68CorpusPipeline = NamedQuery(
    "q68_corpus_pipeline",
    "End-to-end corpus prep funnel per language: total → quality gate " +
      "→ exact-dedup survivors → fingerprint near-dup survivors → " +
      "balanced sample, plus sampled token sum.",
    (s, d) => {
      val ts = tokens(col("text"))
      val wDg = Window.partitionBy("dg")
      val wFp = Window.partitionBy("fp")
      val flags = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(ts).cast("long").as("n_tokens"),
          (size(ts) >= 5 &&
            fp6(size(array_distinct(ts)).cast("double") / size(ts))
              >= 200000L).as("qg"),
          TextDedup.textDigest(col("text")).as("dg"),
          fingerprint(col("text")).as("fp"))
        .withColumn("ue", col("qg") &&
          col("doc_id") === min(when(col("qg"), col("doc_id"))).over(wDg))
        .withColumn("un", col("ue") &&
          col("doc_id") === min(when(col("ue"), col("doc_id"))).over(wFp))
        // the flag table fans out to the rate aggregation AND the final
        // funnel — without materialization each branch re-runs the whole
        // scan+dedup lineage (PlanGuardsSpec counts the scans). cache =
        // MEMORY_AND_DISK, the checkpoint-between-mega-stages production
        // pattern; Verify/Bench clearCache() per query
        .cache()
      // per-lang clean counts over ALL langs (a lang whose docs all fail
      // the funnel must still appear with n_clean = 0, not vanish from
      // the rates table and take its funnel rows with it through the
      // inner join below); min is over the POSITIVE strata and a zero
      // stratum samples nothing
      val clean = flags.groupBy("lang")
        .agg(sum(when(col("un"), 1L).otherwise(0L)).as("n_clean"))
      val rates = clean
        .crossJoin(broadcast(clean.filter(col("n_clean") > 0)
          .agg(min("n_clean").as("min_clean"))))
        .select(col("lang"),
          when(col("n_clean") === 0, 0L).otherwise(
            floor(col("min_clean") * lit(1000000.0) / col("n_clean"))
              .cast("long")).as("rate_fp"))
      flags.join(broadcast(rates), Seq("lang"))
        .withColumn("smp", col("un") &&
          hash60(col("doc_id").cast("string")) % 1000000L < col("rate_fp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("qg"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("ue"), 1L).otherwise(0L)).as("n_unique"),
          sum(when(col("un"), 1L).otherwise(0L)).as("n_clean"),
          sum(when(col("smp"), 1L).otherwise(0L)).as("n_sampled"),
          coalesce(sum(when(col("smp"), col("n_tokens"))), lit(0L))
            .as("sampled_tokens"))
        .orderBy("lang")
    },
    Some("""WITH base AS (SELECT doc_id, lang, lower(text) AS lt,
           |    string_split(lower(text),' ') AS ts FROM documents),
           |f AS (SELECT b.doc_id, b.lang,
           |    CAST(len(ts) AS BIGINT) AS n_tokens,
           |    len(ts) >= 5 AND floor(CAST(len(list_distinct(ts)) AS DOUBLE)
           |      / len(ts) * 1000000.0) >= 200000 AS qg,
           |    md5(lt) AS dg,
           |    COALESCE(m.mg, ('0x'||substring(md5(lt),1,15))::BIGINT) AS fp
           |  FROM base b LEFT JOIN (
           |    SELECT doc_id, min(('0x'||substring(md5(g),1,15))::BIGINT) AS mg
           |    FROM (SELECT DISTINCT doc_id, g FROM base,
           |      unnest(list_transform(range(1, len(ts)-1),
           |        i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
           |      WHERE len(ts) >= 3)
           |    GROUP BY doc_id) m ON b.doc_id = m.doc_id),
           |u AS (SELECT *, qg AND doc_id = min(CASE WHEN qg THEN doc_id END)
           |    OVER (PARTITION BY dg) AS ue FROM f),
           |n AS (SELECT *, ue AND doc_id = min(CASE WHEN ue THEN doc_id END)
           |    OVER (PARTITION BY fp) AS un FROM u),
           |cl AS (SELECT lang, COUNT(*) FILTER (WHERE un) AS n_clean
           |  FROM n GROUP BY lang),
           |rt AS (SELECT lang, CASE WHEN n_clean = 0 THEN 0
           |    ELSE CAST(floor(min_clean * 1000000.0 / n_clean) AS BIGINT)
           |    END AS rate_fp
           |  FROM cl, (SELECT MIN(n_clean) AS min_clean FROM cl
           |    WHERE n_clean > 0)),
           |s AS (SELECT n.*, un AND
           |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
           |      % 1000000 < rt.rate_fp AS smp
           |  FROM n JOIN rt USING (lang))
           |SELECT lang, COUNT(*) AS n_total,
           |  CAST(COUNT(*) FILTER (WHERE qg) AS BIGINT) AS n_quality,
           |  CAST(COUNT(*) FILTER (WHERE ue) AS BIGINT) AS n_unique,
           |  CAST(COUNT(*) FILTER (WHERE un) AS BIGINT) AS n_clean,
           |  CAST(COUNT(*) FILTER (WHERE smp) AS BIGINT) AS n_sampled,
           |  CAST(COALESCE(SUM(n_tokens) FILTER (WHERE smp), 0) AS BIGINT)
           |    AS sampled_tokens
           |FROM s GROUP BY lang ORDER BY lang""".stripMargin))

  /** q69: collocation mining — rank bigrams by the Dice coefficient
    * 2·c(xy)/(c(x)+c(y)), the association score that separates real
    * multi-word expressions from frequent-word coincidences (the
    * integer-exact stand-in for PMI, whose log is not cross-engine
    * bit-stable). Two corpus-wide histograms (unigram + bigram, both
    * map-side partial aggs over native `wordNgrams` output), a support
    * floor on the bigram table BEFORE the joins (so rare pairs never
    * reach the shuffle), then two equi-joins token→count and one
    * fp6-floored ratio. Top-k is the usual total-order
    * TakeOrderedAndProject.
    */
  val q69BigramDice = NamedQuery(
    "q69_bigram_dice",
    "Top-20 bigram collocations by Dice coefficient (fp6-floored), " +
      "support >= 3, with bigram and unigram counts.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val uni = docs.select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val bi = docs
        .select(explode(wordNgrams(tokens(col("text")), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 3)
      bi.withColumn("x", element_at(split(col("bg"), " "), 1))
        .withColumn("y", element_at(split(col("bg"), " "), 2))
        .join(uni.withColumnRenamed("tok", "x").withColumnRenamed("c", "c_x"),
          Seq("x"))
        .join(uni.withColumnRenamed("tok", "y").withColumnRenamed("c", "c_y"),
          Seq("y"))
        .select(col("bg"), col("c_xy"), col("c_x"), col("c_y"),
          floor(col("c_xy") * lit(2000000.0) / (col("c_x") + col("c_y")))
            .cast("long").as("dice_fp"))
        .orderBy(col("dice_fp").desc, col("bg").asc)
        .limit(20)
    },
    Some("""WITH t AS (SELECT string_split(lower(text),' ') AS ts
           |    FROM documents),
           |uni AS (SELECT u AS tok, COUNT(*) AS c
           |  FROM t, unnest(ts) AS x(u) GROUP BY u),
           |bi AS (SELECT g AS bg, COUNT(*) AS c_xy
           |  FROM t, unnest(list_transform(range(1, len(ts)),
           |    i -> ts[i]||' '||ts[i+1])) AS b(g)
           |  GROUP BY g HAVING COUNT(*) >= 3)
           |SELECT bg, c_xy, ux.c AS c_x, uy.c AS c_y,
           |  CAST(floor(c_xy * 2000000.0 / (ux.c + uy.c)) AS BIGINT)
           |    AS dice_fp
           |FROM bi
           |JOIN uni ux ON string_split(bg,' ')[1] = ux.tok
           |JOIN uni uy ON string_split(bg,' ')[2] = uy.tok
           |ORDER BY dice_fp DESC, bg LIMIT 20""".stripMargin))

  /** q76: edit-distance fuzzy matching — the character-level member of
    * the dedup family (exact q12, token-Jaccard q13/q14, bit-level
    * q15, embedding q21), catching OCR noise and typo variants the
    * token methods miss. Levenshtein is O(len²) per pair, so the
    * blocking discipline is non-negotiable: candidates come from an
    * equi-join on a cheap blocking key (the first two tokens), and the
    * quadratic comparator runs only inside blocks and only on 64-char
    * prefixes — the LSH-candidates-then-exact-check shape (q14) with
    * edit distance as the verifier. Distances are integers: no float
    * parity risk at all.
    */
  val q76FuzzyMatch = NamedQuery(
    "q76_fuzzy_match",
    "Levenshtein fuzzy pairs: block on the first two tokens, edit " +
      "distance of lowercased 64-char prefixes, keep dist <= 20.",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(" ", slice(tokens(col("text")), 1, 2)).as("bk"),
          substring(lower(col("text")), 1, 64).as("pfx"))
      val a = docs.select(col("doc_id").as("id_a"), col("bk"),
        col("pfx").as("pfx_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("bk"),
        col("pfx").as("pfx_b"))
      a.join(b, Seq("bk"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("pfx_a"), col("pfx_b")).cast("long").as("dist"))
        .filter(col("dist") <= 20)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH d AS (SELECT doc_id,
           |    array_to_string(string_split(lower(text),' ')[1:2], ' ') AS bk,
           |    substring(lower(text), 1, 64) AS pfx
           |  FROM documents)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
           |FROM d a JOIN d b ON a.bk = b.bk AND a.doc_id < b.doc_id
           |WHERE levenshtein(a.pfx, b.pfx) <= 20
           |ORDER BY id_a, id_b""".stripMargin))

  /** q131: END-TO-END ENTITY RESOLUTION — the three-stage pipeline
    * (block → match → merge) composed from pieces each already proven
    * alone: q76's blocking + edit-distance matcher produces candidate
    * MATCHES, the star connected components fold transitive matches
    * into ENTITIES (A≈B, B≈C ⇒ one entity even when A≉C — the step a
    * pairwise matcher cannot do), and a `max_by` pick (best n_chars,
    * tie → lowest id) nominates each entity's CANONICAL record. Scale
    * shape: candidates only inside blocking buckets (never all-pairs),
    * CC is O(log n) rounds, canonical pick is a partial-agg max_by;
    * the blocked doc table is cached once and feeds both join sides
    * and the member metadata.
    */
  val q131EntityResolution = NamedQuery(
    "q131_entity_resolution",
    "Entity resolution: blocked levenshtein matches -> transitive " +
      "closure -> canonical record per multi-member entity.",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          concat_ws(" ", slice(tokens(col("text")), 1, 2)).as("bk"),
          substring(lower(col("text")), 1, 64).as("pfx"))
        .cache() // both match sides + the member metadata read it
      val a = docs.select(col("doc_id").as("id_a"), col("bk"),
        col("pfx").as("pfx_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("bk"),
        col("pfx").as("pfx_b"))
      val pairs = a.join(b, Seq("bk"))
        .filter(col("id_a") < col("id_b"))
        .filter(levenshtein(col("pfx_a"), col("pfx_b")) <= 20)
        .select(col("id_a"), col("id_b"))
      val comp = graft.operators.GraphOps.connectedComponentsStar(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      comp.join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
        .groupBy(col("component").as("entity_id"))
        .agg(count(lit(1)).as("n_members"),
          max_by(col("id"), struct(col("n_chars"), -col("id")))
            .as("canonical_id"),
          concat_ws(",", array_sort(collect_list(col("id"))))
            .as("member_ids"))
        .filter(col("n_members") >= 2)
        .orderBy("entity_id")
    },
    Some("""WITH RECURSIVE d AS (SELECT doc_id, n_chars,
           |    array_to_string(string_split(lower(text),' ')[1:2], ' ') AS bk,
           |    substring(lower(text), 1, 64) AS pfx
           |  FROM documents),
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM d a JOIN d b ON a.bk = b.bk AND a.doc_id < b.doc_id
           |  WHERE levenshtein(a.pfx, b.pfx) <= 20),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |reach(id, label) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
           |comp AS (SELECT id, MIN(label) AS entity_id FROM reach GROUP BY id),
           |m AS (SELECT comp.id, entity_id, n_chars
           |  FROM comp JOIN d ON d.doc_id = comp.id),
           |canon AS (SELECT entity_id, id AS canonical_id FROM (
           |  SELECT *, row_number() OVER (PARTITION BY entity_id
           |    ORDER BY n_chars DESC, id ASC) AS rn FROM m) WHERE rn = 1)
           |SELECT m.entity_id, COUNT(*) AS n_members,
           |  MIN(canon.canonical_id) AS canonical_id,
           |  array_to_string(list_sort(list(m.id)), ',') AS member_ids
           |FROM m JOIN canon ON m.entity_id = canon.entity_id
           |GROUP BY m.entity_id HAVING COUNT(*) >= 2
           |ORDER BY m.entity_id""".stripMargin))

  /** q80: asymmetric CONTAINMENT scoring — |g(A)∩g(B)| / |g(A)| in both
    * directions, the measure that catches partial copies and quotes
    * which symmetric resemblance (Jaccard, q13/q14) dilutes away: a
    * paragraph fully embedded in a much longer doc has low Jaccard but
    * containment ≈ 1 in one direction. Candidates come from the
    * fingerprint equi-join (same min-3-gram hash, the q18/q60
    * blocking key) so the exact intersection runs only inside buckets;
    * the gram intersection itself is row-local array math. fp6 floors
    * on both sides keep the ratios hash-exact.
    */
  val q80Containment = NamedQuery(
    "q80_containment",
    "Directional containment of 3-gram sets for fingerprint-bucketed " +
      "candidate pairs: |A∩B|/|A| and |A∩B|/|B| as fp6.",
    (s, d) => {
      val g = Tables.documents(s, d)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"),
          array_distinct(wordNgrams(tokens(col("text")), 3)).as("gs"))
        .filter(size(col("gs")) > 0)
      val a = g.select(col("doc_id").as("id_a"), col("fp"),
        col("gs").as("gs_a"))
      val b = g.select(col("doc_id").as("id_b"), col("fp"),
        col("gs").as("gs_b"))
      a.join(b, Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("long")
            .as("n_common"),
          fp6(size(array_intersect(col("gs_a"), col("gs_b"))).cast("double")
            / size(col("gs_a"))).as("cont_ab_fp6"),
          fp6(size(array_intersect(col("gs_a"), col("gs_b"))).cast("double")
            / size(col("gs_b"))).as("cont_ba_fp6"))
        .orderBy("id_a", "id_b")
    },
    Some("""WITH g AS (SELECT d.doc_id, m.fp, m.gs
           |  FROM documents d JOIN (
           |    SELECT doc_id, min(('0x'||substring(md5(g),1,15))::BIGINT) AS fp,
           |      list_distinct(list(g)) AS gs
           |    FROM (SELECT DISTINCT doc_id, g FROM
           |      (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |      unnest(list_transform(range(1, len(ts)-1),
           |        i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
           |      WHERE len(ts) >= 3)
           |    GROUP BY doc_id) m ON d.doc_id = m.doc_id)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(len(list_filter(a.gs, x -> list_contains(b.gs, x)))
           |    AS BIGINT) AS n_common,
           |  CAST(floor(CAST(len(list_filter(a.gs, x -> list_contains(b.gs, x)))
           |    AS DOUBLE) / len(a.gs) * 1000000.0) AS BIGINT) AS cont_ab_fp6,
           |  CAST(floor(CAST(len(list_filter(a.gs, x -> list_contains(b.gs, x)))
           |    AS DOUBLE) / len(b.gs) * 1000000.0) AS BIGINT) AS cont_ba_fp6
           |FROM g a JOIN g b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |ORDER BY id_a, id_b""".stripMargin))

  /** q82: EXACT set-similarity self-join via prefix filtering (the
    * ppjoin family) — the third sub-quadratic dedup strategy next to
    * MinHash-LSH (q14, probabilistic) and SimHash banding (q15,
    * bit-level): unlike both, prefix filtering has NO false negatives.
    * Pigeonhole: two gram sets with Jaccard ≥ t MUST share a token
    * within each one's (|g| − ⌈t·|g|⌉ + 1)-prefix when grams are
    * sorted by a global order; sorting by ascending document frequency
    * puts the RAREST grams in the prefix, so the candidate equi-join's
    * postings are short — precisely the frequent-gram explosion that
    * makes the naive shared-gram join (q13) quadratic. All threshold
    * math is integer-exact for t = 3/5: ⌈3n/5⌉ = (3n+4) div 5 (a
    * float 0.6·n would round differently across engines at n = 5),
    * and the verify filter is 5·|∩| ≥ 3·|∪|, no float boundary.
    *
    * Candidate pruning (all lossless, so the oracle is unchanged):
    *   - length filter: Jaccard ≥ 3/5 forces 3·|larger| ≤ 5·|smaller|;
    *   - ppjoin positional filter: for the FIRST shared prefix gram at
    *     sorted positions (pa, pb), overlap ≤ 1 + min(na−pa, nb−pb);
    *     a true pair's first-match row always passes, and `distinct`
    *     keeps a pair if ANY of its match rows passes, so no false
    *     negatives;
    *   - the equi-join runs on xxhash64(gram) (8-byte shuffle key, not a
    *     ~25-char string); a hash collision can only ADD a candidate,
    *     which exact verification then rejects.
    * The prefix build shuffles only (doc_id, n, gram) — the gram ARRAY
    * never enters a shuffle — and `prefixes` is cached because both
    * sides of the self-join read it.
    */
  val q82PrefixFilterJoin = NamedQuery(
    "q82_prefix_filter_join",
    "Exact Jaccard >= 0.6 pairs via df-ordered prefix filtering: " +
      "rare-gram prefixes -> candidate equi-join -> integer-exact " +
      "verification; no false negatives by construction.",
    (s, d) => {
      val wDoc = Window.partitionBy("doc_id")
        .orderBy(col("df").asc, col("gram").asc)
      val g = Tables.documents(s, d)
        .select(col("doc_id"),
          array_distinct(wordNgrams(tokens(col("text")), 3)).as("gs"))
        .filter(size(col("gs")) > 0)
        .cache() // fans out to prefix build and verification
      val exploded = g.select(col("doc_id"), size(col("gs")).as("n"),
        explode(col("gs")).as("gram"))
      val df = exploded.groupBy("gram").agg(count(lit(1)).as("df"))
      val prefixes = exploded.join(df, Seq("gram"))
        .withColumn("rn", row_number().over(wDoc))
        // prefix length n − ⌈3n/5⌉ + 1, all-integer (`div`, not `/`:
        // Spark's / on ints returns DOUBLE)
        .filter(col("rn") <= expr("n - (n * 3 + 4) div 5 + 1"))
        .select(col("doc_id"), col("n"), col("rn"),
          xxhash64(col("gram")).as("gk"))
        .cache() // both sides of the self-join below read this
      val cand = prefixes.as("a")
        .join(prefixes.as("b"), col("a.gk") === col("b.gk") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(3) <= col("b.n") * lit(5) &&
          col("b.n") * lit(3) <= col("a.n") * lit(5) &&
          // 1 + min(na−pa, nb−pb) ≥ ⌈3(na+nb)/8⌉, integer form
          (least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn"))
            + lit(1)) * lit(8) >= (col("a.n") + col("b.n")) * lit(3))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      cand
        .join(g.select(col("doc_id").as("id_a"), col("gs").as("gs_a")),
          Seq("id_a"))
        .join(g.select(col("doc_id").as("id_b"), col("gs").as("gs_b")),
          Seq("id_b"))
        .withColumn("n_int",
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
        .withColumn("n_uni",
          (size(col("gs_a")) + size(col("gs_b"))).cast("long") - col("n_int"))
        .filter(col("n_int") * 5 >= col("n_uni") * 3)
        .select(col("id_a"), col("id_b"),
          fp6(col("n_int").cast("double") / col("n_uni")).as("jaccard_fp6"))
        .orderBy("id_a", "id_b")
    },
    Some("""WITH g AS (SELECT doc_id, gs FROM (
           |    SELECT doc_id, list_distinct(list(gr)) AS gs FROM (
           |      SELECT DISTINCT doc_id, gr FROM
           |        (SELECT doc_id, string_split(lower(text),' ') AS ts
           |         FROM documents),
           |        unnest(list_transform(range(1, len(ts)-1),
           |          i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(gr)
           |      WHERE len(ts) >= 3)
           |    GROUP BY doc_id) WHERE len(gs) > 0),
           |ex AS (SELECT doc_id, len(gs) AS n, u AS gram
           |  FROM g, unnest(gs) AS t(u)),
           |df AS (SELECT gram, COUNT(*) AS df FROM ex GROUP BY gram),
           |pfx AS (SELECT doc_id, gram FROM (
           |    SELECT ex.doc_id, ex.gram, ex.n,
           |      row_number() OVER (PARTITION BY ex.doc_id
           |        ORDER BY df.df ASC, ex.gram ASC) AS rn
           |    FROM ex JOIN df USING (gram))
           |  WHERE rn <= n - (n * 3 + 4) // 5 + 1),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM pfx a JOIN pfx b ON a.gram = b.gram
           |    AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b,
           |  CAST(floor(CAST(n_int AS DOUBLE) / n_uni * 1000000.0) AS BIGINT)
           |    AS jaccard_fp6
           |FROM (SELECT id_a, id_b,
           |    CAST(len(list_filter(ga.gs, x -> list_contains(gb.gs, x)))
           |      AS BIGINT) AS n_int,
           |    CAST(len(ga.gs) + len(gb.gs) AS BIGINT) -
           |      CAST(len(list_filter(ga.gs, x -> list_contains(gb.gs, x)))
           |      AS BIGINT) AS n_uni
           |  FROM cand JOIN g ga ON cand.id_a = ga.doc_id
           |    JOIN g gb ON cand.id_b = gb.doc_id)
           |WHERE n_int * 5 >= n_uni * 3
           |ORDER BY id_a, id_b""".stripMargin))

  /** q95: unigram-LM surprisal quality score — the CCNet/perplexity
    * family of quality filters, reduced to integer-exact math: a
    * document's mean token surprisal under the corpus's own unigram
    * distribution. True surprisal −log2(cnt/N) is float; the
    * floor-log2 surrogate FL2(x) = length(bin(x)) − 1 (both engines
    * have bin()) gives sup(t) = FL2(N) − FL2(cnt(t)) ∈ [0, 63] — a
    * monotone, integer step function of frequency: rare tokens score
    * high, and a doc full of rare/garbage tokens scores high overall
    * (the filter-out signal), with NO float boundary anywhere — even
    * the mean is `(sum·1e6) div n`, pure integer.
    * Scale shape (the q56 discipline): per-doc term counts first (ONE
    * (doc, term) hash-agg collapses occurrences), vocab = re-agg of
    * those counts by term, then an equi-join on term — the corpus
    * token stream is never joined row-per-occurrence — and the 1-row
    * total is broadcast.
    */
  val q95UnigramSurprisal = NamedQuery(
    "q95_unigram_surprisal",
    "Mean unigram surprisal per doc under the corpus's own unigram " +
      "LM, floor-log2 integer surrogate: rare-token-heavy docs score " +
      "high; all-integer, no float boundary.",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val vocab = tf.groupBy("term").agg(sum("c").as("cnt"))
      val tot = vocab.agg(sum("cnt").as("n_total"))
      def fl2(c: org.apache.spark.sql.Column) =
        (length(bin(c)) - 1).cast("long")
      tf.join(vocab, "term")
        .crossJoin(broadcast(tot))
        .withColumn("sup", fl2(col("n_total")) - fl2(col("cnt")))
        .groupBy("doc_id")
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          sum(col("c") * col("sup")).cast("long").as("sum_sup"))
        .withColumn("mean_sup_fp6",
          expr("CAST((sum_sup * 1000000) div n_tokens AS BIGINT)"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id, u AS term FROM
           |    (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |    unnest(ts) AS t(u)),
           |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM toks GROUP BY doc_id, term),
           |vocab AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cnt
           |  FROM tf GROUP BY term),
           |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
           |sup AS (SELECT doc_id, c,
           |    (length(bin(n_total)) - 1) - (length(bin(cnt)) - 1) AS sup
           |  FROM tf JOIN vocab USING (term), tot)
           |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           |  CAST(SUM(c * sup) AS BIGINT) AS sum_sup,
           |  CAST((CAST(SUM(c * sup) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT)
           |    AS BIGINT) AS mean_sup_fp6
           |FROM sup GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  private val BoilerGram = 6 // leading tokens that define a doc's header

  /** q103: per-source boilerplate detection — the CommonCrawl-style
    * cleaning step that strips the shared header/footer a SOURCE stamps
    * on every document (cookie banners, feed preambles): the most
    * common leading token 6-gram per source is declared boilerplate
    * when it opens a non-trivial share of the source's docs, and
    * matching docs are accounted with their post-strip length.
    * Scale shape: the leading gram is row-local (slice of the token
    * array, no explode of full text); the per-(source, gram) histogram
    * is one hash-agg; the winner per source is `max_by` (partial-agg,
    * no sort); and the verdict joins back by source against a
    * broadcast-sized winners table (|sources| rows).
    */
  val q103Boilerplate = NamedQuery(
    "q103_boilerplate",
    s"Per-source boilerplate: most common leading $BoilerGram-gram " +
      "per source (share >= 2 docs), docs opening with it counted and " +
      "re-measured post-strip.",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          tokens(col("text")).as("ts"))
        .withColumn("n_tokens", size(col("ts")).cast("long"))
        .filter(col("n_tokens") >= BoilerGram)
        .withColumn("head_gram",
          concat_ws(" ", slice(col("ts"), 1, BoilerGram)))
      val hist = docs.groupBy("source", "head_gram")
        .agg(count(lit(1)).as("n_docs"))
      val winners = hist.groupBy("source")
        .agg(max_by(struct(col("head_gram"), col("n_docs")),
          struct(col("n_docs"), col("head_gram"))).as("w"))
        .select(col("source"), col("w.head_gram").as("boiler_gram"),
          col("w.n_docs").as("n_matching"))
        .filter(col("n_matching") >= 2)
      docs.join(broadcast(winners), Seq("source"))
        .filter(col("head_gram") === col("boiler_gram"))
        .groupBy(col("source"), col("boiler_gram"), col("n_matching"))
        .agg(count(lit(1)).as("n_stripped"),
          sum(col("n_tokens") - lit(BoilerGram.toLong)).as("tokens_after"),
          min("doc_id").as("first_doc"))
        .orderBy("source")
    },
    Some(s"""WITH t AS (SELECT doc_id, source,
            |    string_split(lower(text),' ') AS ts FROM documents),
            |docs AS (SELECT doc_id, source,
            |    CAST(len(ts) AS BIGINT) AS n_tokens,
            |    array_to_string(ts[1:$BoilerGram], ' ') AS head_gram
            |  FROM t WHERE len(ts) >= $BoilerGram),
            |hist AS (SELECT source, head_gram, COUNT(*) AS n_docs
            |  FROM docs GROUP BY source, head_gram),
            |winners AS (SELECT source, head_gram AS boiler_gram,
            |    n_docs AS n_matching FROM (
            |  SELECT *, row_number() OVER (PARTITION BY source
            |    ORDER BY n_docs DESC, head_gram DESC) AS rn FROM hist)
            |  WHERE rn = 1 AND n_docs >= 2)
            |SELECT d.source, w.boiler_gram, w.n_matching,
            |  COUNT(*) AS n_stripped,
            |  CAST(SUM(d.n_tokens - $BoilerGram) AS BIGINT) AS tokens_after,
            |  MIN(d.doc_id) AS first_doc
            |FROM docs d JOIN winners w
            |  ON d.source = w.source AND d.head_gram = w.boiler_gram
            |GROUP BY d.source, w.boiler_gram, w.n_matching
            |ORDER BY d.source""".stripMargin))

  /** q104: within-doc consecutive-duplicate token collapse ("the the
    * the" → "the") — the cheapest of the within-doc cleaning passes
    * (q54 measures repetition; this one REWRITES): a row-local HOF
    * filter keeping token i only when it differs from token i−1, with
    * before/after counts and the cleaned text's digest as the
    * hash-checked identity. Zero shuffle until the output sort.
    */
  val q104CollapseRuns = NamedQuery(
    "q104_collapse_runs",
    "Collapse consecutive duplicate tokens per doc: before/after " +
      "token counts and md5 of the cleaned text (docs 0-99).",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), tokens(col("text")).as("ts"))
        .withColumn("cleaned",
          filter(col("ts"), (t, i) =>
            i === 0 || t =!= element_at(col("ts"), i)))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_before"),
          size(col("cleaned")).cast("long").as("n_after"),
          md5(concat_ws(" ", col("cleaned"))).as("clean_digest"))
        .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS ts
           |  FROM documents WHERE doc_id < 100),
           |c AS (SELECT doc_id, ts,
           |    list_filter(ts, (x, i) -> i = 1 OR x <> ts[i - 1]) AS cleaned
           |  FROM t)
           |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_before,
           |  CAST(len(cleaned) AS BIGINT) AS n_after,
           |  md5(array_to_string(cleaned, ' ')) AS clean_digest
           |FROM c ORDER BY doc_id""".stripMargin))

  /** q108: corpus 3-gram histogram through the custom GENERATOR
    * ([[graft.functions.NativeGenerators.WordNgramGen]]) — one row per
    * gram emitted directly, never materializing the per-doc gram array
    * the scalar `explode(wordNgrams(...))` path allocates (the biggest
    * transient the dedup stack creates at 100 TB). Spec-proven
    * row-identical to the scalar path; this query hash-checks it
    * end-to-end. Plan: Generate → one hash-agg with map-side partials
    * → TakeOrderedAndProject.
    */
  val q108NgramGenerator = NamedQuery(
    "q108_ngram_generator",
    "Top-20 word 3-grams by occurrence via the explode-free custom " +
      "generator; (count desc, gram asc) order.",
    (s, d) => {
      import graft.functions.NativeGenerators.wordNgramGen
      Tables.documents(s, d)
        .select(tokens(col("text")).as("ts"))
        .select(wordNgramGen(col("ts"), 3).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram").asc)
        .limit(20)
    },
    Some("""SELECT g AS gram, COUNT(*) AS n FROM
           |  (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
           |  unnest(list_transform(range(1, len(ts)-1),
           |    i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
           |WHERE len(ts) >= 3
           |GROUP BY g ORDER BY n DESC, gram ASC LIMIT 20""".stripMargin))

  // shared with VectorQueries' dense chunk tier (q184/q186/q187): the
  // lexical and dense RAG read paths run the SAME query for direct
  // comparison and fusion
  private[queries] val Bm25Terms = Seq("dup", "vector", "join")

  /** q86: BM25 retrieval scoring, integer-exact. The BM25 term weight
    * with k1 = 6/5, b = 3/4 and avgdl = T/N reduces to pure integer
    * arithmetic:
    *
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *     = 44·tf·T / (20·tf·T + 6·T + 18·N·dl)
    *
    * so each term's contribution is the exact long
    * `(idf_fp3 · 44 · tf · T) div (20·tf·T + 6·T + 18·N·dl)` — no float
    * boundary anywhere (a double BM25 could rank-flip across engines at
    * ties). idf is the q56 monotone surrogate floor(1e3·N/df) (ln is not
    * cross-engine bit-stable); scaled to 1e3 so the worst-case product
    * stays far below 2^63. Scale shape: df is one distinct+count agg
    * over toks FILTERED to the |Q|=3 query terms (the corpus-wide df
    * table never materializes), corpus stats N/T are one 1-row agg
    * broadcast everywhere, and the ranking is a rank-pushdown window
    * over docs that contain ≥1 query term.
    */
  val q86Bm25TopK = NamedQuery(
    "q86_bm25_topk",
    "BM25 top-10 docs for a 3-term query (k1=6/5, b=3/4), all-integer " +
      "rational arithmetic: contribution = idf_fp3*44*tf*T div " +
      "(20*tf*T + 6*T + 18*N*dl); rank by (score desc, doc_id).",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val dl = docs.select(col("doc_id"), size(tokens(col("text")))
        .cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_total"))
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(col("term").isin(Bm25Terms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .select(col("term"),
          expr("(1000 * n_docs) div df").as("idf_fp3"))
      val w = graft.BoundedWindow.orderBy(col("score_fp").desc, col("doc_id").asc)
      tf.join(broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("contrib", expr(
          "(idf_fp3 * 44 * tf * t_total) div " +
            "(20 * tf * t_total + 6 * t_total + 18 * n_docs * dl)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_fp"))
        .join(dl, "doc_id")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select("doc_id", "dl", "n_terms", "score_fp", "rank")
        .orderBy("rank")
    },
    Some {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH dl AS (SELECT doc_id,
         |    CAST(len(string_split(lower(text),' ')) AS BIGINT) AS dl
         |  FROM documents),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS t_total FROM dl),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM
         |    (SELECT doc_id, unnest(string_split(lower(text),' ')) AS term
         |     FROM documents)
         |  WHERE term IN ($terms) GROUP BY doc_id, term),
         |idf AS (SELECT term, (1000 * n_docs) // df AS idf_fp3 FROM
         |    (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |    stats),
         |scored AS (SELECT tf.doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM((idf_fp3 * 44 * tf * t_total) //
         |      (20 * tf * t_total + 6 * t_total + 18 * n_docs * dl)) AS BIGINT)
         |      AS score_fp
         |  FROM tf JOIN idf USING (term) JOIN dl ON tf.doc_id = dl.doc_id,
         |    stats
         |  GROUP BY tf.doc_id),
         |ranked AS (SELECT s.doc_id, dl.dl, s.n_terms, s.score_fp,
         |    CAST(row_number() OVER (ORDER BY s.score_fp DESC, s.doc_id ASC)
         |      AS BIGINT) AS rank
         |  FROM scored s JOIN dl ON s.doc_id = dl.doc_id)
         |SELECT doc_id, dl, n_terms, score_fp, rank FROM ranked
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    })

  /** q118: EXACT grouped quantiles without a corpus sort — the
    * length-threshold calibration every quality-filter pipeline runs
    * (cut below p50, flag above p99). percentile_disc semantics (the
    * smallest value whose cumulative count reaches ceil(q·n)) via the
    * grouped-histogram method: aggregate the corpus to (lang, value,
    * count) — partial-agg, the only full-data pass — then window-cumsum
    * over the DISTINCT VALUES only. At 100 TB the sort that hurts is
    * over |distinct lengths| rows (thousands), not documents; integer
    * math end-to-end, so the quantiles are engine-exact (a float
    * interpolation à la percentile_cont would never hash-match across
    * engines).
    */
  val q118GroupedQuantiles = NamedQuery(
    "q118_grouped_quantiles",
    "Exact per-language p50/p90/p99 of n_chars via the grouped-" +
      "histogram method: value-level counts + cumsum over distinct " +
      "values, never a corpus sort.",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
      // running count and stratum total over the SAME lang partitioning
      // (one exchange; the unbounded total adds no second sort) — a
      // separate groupBy+join would recompute the counts subtree
      val wCum = Window.partitionBy("lang").orderBy("n_chars")
      val wAll = Window.partitionBy("lang")
      val cum = counts
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
      def pick(pct: Int) = min(when(
        col("cum") * 100 >= col("n") * pct, col("n_chars"))).as(s"p$pct")
      cum.groupBy("lang")
        .agg(first(col("n")).as("n_docs"), pick(50), pick(90), pick(99))
        .orderBy("lang")
    },
    Some("""WITH counts AS (SELECT lang, n_chars, COUNT(*) AS c
           |  FROM documents GROUP BY lang, n_chars),
           |tot AS (SELECT lang, SUM(c) AS n FROM counts GROUP BY lang),
           |cum AS (SELECT counts.lang, n_chars, n,
           |    SUM(c) OVER (PARTITION BY counts.lang ORDER BY n_chars)
           |      AS cum
           |  FROM counts JOIN tot ON counts.lang = tot.lang)
           |SELECT lang, CAST(MIN(n) AS BIGINT) AS n_docs,
           |  MIN(CASE WHEN cum * 100 >= n * 50 THEN n_chars END) AS p50,
           |  MIN(CASE WHEN cum * 100 >= n * 90 THEN n_chars END) AS p90,
           |  MIN(CASE WHEN cum * 100 >= n * 99 THEN n_chars END) AS p99
           |FROM cum GROUP BY lang ORDER BY lang""".stripMargin))

  /** q119: INVERTED INDEX build — word 3-gram → sorted posting list,
    * the exact-match search structure behind dedup forensics ("which
    * docs contain this eval answer?") and decontamination debugging
    * (q88 flags overlap; the index answers WHERE). Derived from the
    * same shared gram stage as q13/q14 ([[TextDedup.gramSets]]). Two
    * aggregations, both gram-keyed: document frequency first (a cheap
    * count partial-agg), then posting-list collection ONLY for grams
    * surviving the df band — the giant boilerplate lists are filtered
    * out BEFORE any list is materialized, so the heavy collect_list
    * never sees them. The df band [2, 20] is the classic rare-term
    * index; postings are sorted and comma-joined so the list itself is
    * hash-checked, not just its size.
    */
  val q119InvertedIndex = NamedQuery(
    "q119_inverted_index",
    "Rare 3-gram inverted index over documents: grams with df in " +
      "[2,20]; df + the sorted posting list per gram.",
    (s, d) => {
      val grams = TextDedup.gramSets(
        Tables.documents(s, d), "doc_id", "text", n = 3)
        .select(col("gs_id").as("doc_id"), col("gram"))
      // df as an unbounded count over the gram partition, NOT a
      // groupBy+join-back: the gram stage (tokenize + n-gram + distinct,
      // the dominant cost) runs once, the window shuffles it once, and
      // the final groupBy reuses the same hash partitioning (subset of
      // the grouping keys) — zero extra exchanges. The window carries
      // counts only; posting lists are materialized strictly AFTER the
      // df-band filter, so boilerplate grams never build a list.
      grams
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy("gram")))
        .filter(col("df").between(2, 20))
        .groupBy("gram", "df")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(col("doc_id"))),
            _.cast("string"))).as("postings"))
        .orderBy("gram")
    },
    Some(s"""WITH $gramsCte,
            |band AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g
            |  HAVING COUNT(*) BETWEEN 2 AND 20)
            |SELECT band.g AS gram, df,
            |  array_to_string(list_sort(list(doc_id)), ',') AS postings
            |FROM grams JOIN band ON grams.g = band.g
            |GROUP BY band.g, df ORDER BY band.g""".stripMargin))

  private val SpanN = 8 // span width for cross-doc repeated-span detection

  /** q121: cross-document repeated-span coverage — the span-granular
    * form of exact substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): a token span is
    * duplicated when its $SpanN-gram hash occurs in MORE THAN ONE
    * document, and a doc's signal is the fraction of its tokens
    * covered by some duplicated span. Where q12 scores whole-text
    * identity and q13/q14 score whole-doc similarity, this finds the
    * COPIED PASSAGES inside otherwise-distinct documents — the quote/
    * license-header/syndication case doc-level dedup misses.
    * Scale shape: ONE corpus scan; grams carry (doc, n_tokens, pos,
    * hash60) — never the gram string — through ONE shuffle keyed by
    * gram hash, where a whole-partition min/max window marks cross-doc
    * hashes (min(doc) ≠ max(doc) over the gk partition — no distinct
    * pre-agg, no join-back, and unlike a collect_set the state per
    * gram is two longs no matter how hot the gram); the flagged
    * stream is cached and feeds both the per-doc span counts and the
    * coverage count (row-local ±$SpanN position fan-out on DUP spans
    * only + per-doc distinct). At 100 TB the gram stream is the big
    * intermediate, and it stays fixed-width longs end to end.
    */
  val q121RepeatedSpans = NamedQuery(
    "q121_repeated_spans",
    s"Cross-doc repeated-span coverage: $SpanN-gram hashes in >1 doc " +
      "mark duplicated spans; per-doc covered-token fraction.",
    (s, d) => {
      val flagged = TextDedup.spanFlags(
        Tables.documents(s, d), "doc_id", "text", SpanN)
      val perDoc = flagged.groupBy(col("id").as("doc_id"), col("n_tokens"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_spans"))
      val covered = TextDedup.spanCoverage(flagged, SpanN)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("covered_tokens"))
      perDoc
        .join(covered, Seq("doc_id"), "left")
        .na.fill(0L, Seq("covered_tokens"))
        .withColumn("coverage_fp6",
          expr("CAST((covered_tokens * 1000000) div n_tokens AS BIGINT)"))
        .select("doc_id", "n_tokens", "n_spans", "n_dup_spans",
          "covered_tokens", "coverage_fp6")
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS ts
            |    FROM documents),
            |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts
            |  FROM t WHERE len(ts) >= $SpanN),
            |g AS (SELECT doc_id, i AS pos,
            |    ('0x'||substring(md5(list_aggregate(ts[i:i+${SpanN - 1}],
            |      'string_agg', ' ')),1,15))::BIGINT AS gk
            |  FROM b, unnest(range(1, len(ts) - ${SpanN - 2})) AS r(i)),
            |dup AS (SELECT gk FROM (SELECT gk, COUNT(DISTINCT doc_id) AS nd
            |    FROM g GROUP BY gk) WHERE nd > 1),
            |ds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gk)),
            |spans AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM ds
            |  GROUP BY doc_id),
            |cov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
            |    AS covered_tokens FROM (SELECT DISTINCT doc_id, p
            |    FROM ds, unnest(range(pos, pos + $SpanN)) AS c(p))
            |  GROUP BY doc_id)
            |SELECT b.doc_id, b.n_tokens,
            |  b.n_tokens - ${SpanN - 1} AS n_spans,
            |  COALESCE(spans.n_dup_spans, 0) AS n_dup_spans,
            |  COALESCE(cov.covered_tokens, 0) AS covered_tokens,
            |  CAST((COALESCE(cov.covered_tokens, 0) * 1000000)
            |    // b.n_tokens AS BIGINT) AS coverage_fp6
            |FROM b LEFT JOIN spans ON b.doc_id = spans.doc_id
            |LEFT JOIN cov ON b.doc_id = cov.doc_id
            |ORDER BY b.doc_id""".stripMargin))

  /** q129: repeated-span STRIP — the rewrite step on top of q121's
    * detection (the q104-for-spans: q121 measures, this one deletes):
    * tokens covered by any cross-doc duplicated $SpanN-gram are removed
    * and the cleaned text is re-identified by digest, ready for
    * re-tokenization downstream. Covered positions collect into a
    * per-doc set (bounded by the doc's own length) and the strip is a
    * row-local indexed `filter` over the token array — the corpus
    * never materializes a per-position row stream beyond the q121 gram
    * pipeline it already pays for.
    */
  val q129SpanStrip = NamedQuery(
    "q129_span_strip",
    s"Strip tokens covered by cross-doc duplicated $SpanN-grams; " +
      "kept-token counts + digest of the cleaned text.",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("ts"))
        .withColumn("n_tokens", size(col("ts")).cast("long"))
        .filter(col("n_tokens") >= SpanN)
        .cache() // gram build + final strip both read it
      val cov = TextDedup.spanCoverage(
          TextDedup.spanFlags(base.select(
            col("doc_id"), concat_ws(" ", col("ts")).as("text")),
            "doc_id", "text", SpanN), SpanN)
        .groupBy(col("id").as("doc_id"))
        .agg(collect_set(col("p")).as("cov"))
      base.join(cov, Seq("doc_id"), "left")
        .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
        .withColumn("kept",
          expr("filter(ts, (t, i) -> NOT array_contains(cov, i))"))
        .select(col("doc_id"), col("n_tokens"),
          size(col("kept")).cast("long").as("kept_tokens"),
          md5(concat_ws(" ", col("kept"))).as("clean_hash"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS ts
            |    FROM documents),
            |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts
            |  FROM t WHERE len(ts) >= $SpanN),
            |g AS (SELECT doc_id, i AS pos,
            |    ('0x'||substring(md5(list_aggregate(ts[i:i+${SpanN - 1}],
            |      'string_agg', ' ')),1,15))::BIGINT AS gk
            |  FROM b, unnest(range(1, len(ts) - ${SpanN - 2})) AS r(i)),
            |dup AS (SELECT gk FROM (SELECT gk, COUNT(DISTINCT doc_id) AS nd
            |    FROM g GROUP BY gk) WHERE nd > 1),
            |cov AS (SELECT doc_id, list(DISTINCT p) AS cov
            |  FROM (SELECT g.doc_id, p FROM g JOIN dup USING (gk),
            |    unnest(range(pos, pos + $SpanN)) AS c(p))
            |  GROUP BY doc_id)
            |SELECT b.doc_id, b.n_tokens,
            |  CAST(len(list_filter(b.ts, (t, i) ->
            |    NOT list_contains(COALESCE(cov.cov, []), i))) AS BIGINT)
            |    AS kept_tokens,
            |  md5(COALESCE(array_to_string(list_filter(b.ts, (t, i) ->
            |    NOT list_contains(COALESCE(cov.cov, []), i)), ' '), ''))
            |    AS clean_hash
            |FROM b LEFT JOIN cov ON b.doc_id = cov.doc_id
            |ORDER BY b.doc_id""".stripMargin))

  /** q123: PageRank centrality over the q14 near-dup graph — the
    * canonical-selection signal that beats q96's per-doc quality when
    * clusters chain (A≈B≈C but A≉C): the member most linked within its
    * duplicate neighborhood is the natural survivor. 3 iterations of
    * [[graft.operators.GraphOps.pageRankFp]] in all-integer fixed
    * point (S = 1e12, damping 85/100), so the scores are bit-exact
    * across engines — the oracle replays the same iterations as
    * unrolled CTEs over the shared verified pair set. Scale shape:
    * per-iteration cost is one edge⋈rank shuffle + one partial-agg
    * sum (the Pregel round); edges+outdeg are computed once and
    * cached; the constants row is a 1-row broadcast.
    */
  val q123PageRank = NamedQuery(
    "q123_pagerank",
    "Integer fixed-point PageRank (3 iterations, damping 85/100) over " +
      "the MinHash+LSH near-dup graph; (doc, out_degree, pr_fp).",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
          n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
        .cache() // both edge directions read it
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      graft.operators.GraphOps.pageRankFp(
          docs.select(col("doc_id").as("id")), edges, iterations = 3)
        .select(col("id").as("doc_id"), col("out_degree"), col("pr_fp"))
        .orderBy("doc_id")
    },
    Some {
      val S = "1000000000000"
      def iter(k: Int): String =
        s"""c$k AS (SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
           |  FROM edges e JOIN pr${k - 1} p ON p.id = e.src
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |pr$k AS (SELECT n.doc_id AS id,
           |    CAST(base_fp + (85 * COALESCE(c$k.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM documents n LEFT JOIN c$k ON c$k.id = n.doc_id, consts)""".stripMargin
      s"""WITH $minhashPairsCtes,
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges
         |  GROUP BY src),
         |consts AS (SELECT CAST($S // COUNT(*) AS BIGINT) AS init_fp,
         |    CAST((15 * $S) // (100 * COUNT(*)) AS BIGINT) AS base_fp
         |  FROM documents),
         |pr0 AS (SELECT doc_id AS id, init_fp AS pr FROM documents, consts),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT pr3.id AS doc_id, COALESCE(dg.d, 0) AS out_degree,
         |  pr3.pr AS pr_fp
         |FROM pr3 LEFT JOIN deg dg ON dg.src = pr3.id
         |ORDER BY doc_id""".stripMargin
    })

  /** q134: QUALITY-FILTER CASCADE — the FineWeb/C4-style keep/drop
    * gate every pretraining corpus passes through: ordered rules, the
    * FIRST failing rule is the document's reason code. All three
    * signals (token count, distinct-token ratio, stopword ratio) come
    * from the ONE native [[graft.functions.NativeExpressions.TokenStats]]
    * pass — entirely row-local, so the plan is scan → project → sort
    * with zero shuffles before the output order. At 100 TB the cascade
    * is a free rider on whatever scan already reads `text`; the reason
    * code (not just a boolean) is what makes the funnel auditable —
    * `GROUP BY reason` gives the per-rule survival report without
    * re-running the rules.
    */
  val q134FilterCascade = NamedQuery(
    "q134_filter_cascade",
    "Quality-filter cascade with reason codes: too_short -> " +
      "low_distinct -> en_stop_low -> pass, one native TokenStats " +
      "pass, row-local.",
    (s, d) => {
      val st = graft.functions.NativeExpressions.tokenStats(
        tokens(col("text")), Stopwords)
      val nTok = element_at(st, 1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          nTok.as("n_tok"),
          fp6(element_at(st, 2).cast("double") / nTok).as("dr_fp"),
          fp6(element_at(st, 4).cast("double") / nTok).as("sr_fp"))
        .select(col("doc_id"),
          when(col("n_tok") < 20, "too_short")
            .when(col("dr_fp") < 350000, "low_distinct")
            .when(col("lang") === "en" && col("sr_fp") < 20000,
              "en_stop_low")
            .otherwise("pass").as("reason"))
        .withColumn("keep",
          when(col("reason") === "pass", 1L).otherwise(0L))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, lang,
           |    string_split(lower(text),' ') AS ts FROM documents),
           |s AS (SELECT doc_id, lang,
           |    CAST(len(ts) AS BIGINT) AS n_tok,
           |    CAST(floor(CAST(len(list_distinct(ts)) AS DOUBLE)
           |      /len(ts)*1000000.0) AS BIGINT) AS dr_fp,
           |    CAST(floor(CAST(len(list_filter(ts, x ->
           |      list_contains(['the','a','of','and','to','in'], x)))
           |      AS DOUBLE)/len(ts)*1000000.0) AS BIGINT) AS sr_fp
           |  FROM t),
           |r AS (SELECT doc_id,
           |    CASE WHEN n_tok < 20 THEN 'too_short'
           |      WHEN dr_fp < 350000 THEN 'low_distinct'
           |      WHEN lang = 'en' AND sr_fp < 20000 THEN 'en_stop_low'
           |      ELSE 'pass' END AS reason FROM s)
           |SELECT doc_id, reason,
           |  CAST(CASE WHEN reason = 'pass' THEN 1 ELSE 0 END AS BIGINT) AS keep
           |FROM r ORDER BY doc_id""".stripMargin))

  /** q148: LSH DEDUP RECALL HARNESS — what q33 is to ANN, this is to
    * near-dup detection: the banding approximation's quality becomes a
    * hash-checked number instead of a tuning anecdote. Exact word-3-gram
    * Jaccard pairs (the q13 reference, quadratic BY DESIGN — harness
    * only, never the default path) left-join the MinHash+LSH pairs
    * (the q14 scale path, a strict subset since LSH candidates are
    * verified at the same threshold): recall = found/exact in exact
    * fp6, plus the count of HIGH-similarity (≥0.7) pairs the banding
    * missed — the S-curve's promise is that this number stays near 0
    * while near-threshold misses are tolerated. Changing
    * (numHashes, bands) now shows up as a hash mismatch, so banding
    * tuning is regression-tested at the query level.
    */
  val q148LshRecall = NamedQuery(
    "q148_lsh_dedup_recall",
    "Recall of MinHash+LSH (q14) against exact n-gram Jaccard (q13) " +
      "at j ≥ 0.5, with the high-similarity (≥ 0.7) miss count — the " +
      "banding S-curve as a hash-checked contract.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val exact = TextDedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      val found = TextDedup.minhashNearDups(docs, "doc_id", "text",
          n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), lit(1L).as("found"))
      exact.join(found, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          count(col("found")).as("n_found"),
          sum(when(col("found").isNull && col("jaccard_fp") >= 700000L, 1L)
            .otherwise(0L)).as("n_missed_hi"))
        .select(col("n_exact"), col("n_found"),
          expr("CAST((n_found * 1000000) div n_exact AS BIGINT)")
            .as("recall_fp6"),
          col("n_missed_hi"))
    },
    Some(s"""WITH $minhashPairsCtes,
            |inter_all AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |    COUNT(*) AS n_inter
            |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |exact AS (SELECT id_a, id_b,
            |    CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) AS jf
            |  FROM inter_all JOIN sizes sa ON sa.doc_id = id_a
            |  JOIN sizes sb ON sb.doc_id = id_b
            |  WHERE CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) >= 500000)
            |SELECT COUNT(*) AS n_exact,
            |  COUNT(p.id_a) AS n_found,
            |  CAST((COUNT(p.id_a) * 1000000) // COUNT(*) AS BIGINT) AS recall_fp6,
            |  CAST(SUM(CASE WHEN p.id_a IS NULL AND e.jf >= 700000
            |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missed_hi
            |FROM exact e LEFT JOIN pairs p
            |  ON p.id_a = e.id_a AND p.id_b = e.id_b""".stripMargin))

  /** q154: LSH BANDING S-CURVE SWEEP — the tuning harness that picks
    * (bands, rows-per-band) for a 100 TB dedup deployment. One shared
    * 16-hash signature table (cached — the expensive stage runs ONCE)
    * is re-banded at b ∈ {2, 4, 8, 16}; per config the sweep measures
    * the three numbers the S-curve trades: candidate count (join cost),
    * recall vs the exact Jaccard ≥ 0.5 reference, and candidate
    * precision. More bands / fewer rows ⇒ recall↑, candidates↑,
    * precision↓ — this query turns that curve from a formula into
    * hash-checked MEASUREMENTS on the actual corpus. Scale shape: ALL
    * four configs band in ONE posexploded (bands, band, band_key) pass
    * over the cached signature table and resolve in ONE self-join
    * ([[TextDedup.lshCandidatesMulti]] — the same one-array move the
    * SimHash chunk join documents as a 12× win), then one left join to
    * the (tiny) exact pair set + one grouped agg. The exact reference
    * shares the SAME cached gram arrays as the signatures
    * ([[TextDedup.jaccardPairsFromGrams]]) so tokenize+gram runs once;
    * its quadratic gram self-join is harness-only (same status as
    * q13/q148 — at 100 TB you'd score recall on a sample).
    */
  val q154LshBandSweep = NamedQuery(
    "q154_lsh_band_sweep",
    "LSH band-config sweep over one shared MinHash table: candidates, " +
      "recall and precision vs exact Jaccard (>=0.5) for bands in " +
      "{2,4,8,16} x 16 hashes — the dedup tuning S-curve, measured.",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val grams = TextDedup.docGramArrays(docs, "doc_id", "text", 3).cache()
      val sigs = TextDedup.signaturesFromGrams(grams, NumHashes).cache()
      val exact = TextDedup.jaccardPairsFromGrams(grams, 0.5)
        .select(col("id_a"), col("id_b"), lit(1L).as("hit")).cache()
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      // a config that produced zero candidates must still emit its row
      // (the per-config agg used to guarantee that); left-join the agg
      // back onto the literal config list
      val configs = Seq(2L, 4L, 8L, 16L).toDF("bands")
      val perConfig = TextDedup
        .lshCandidatesMulti(sigs, NumHashes, Seq(2, 4, 8, 16))
        .join(exact, Seq("id_a", "id_b"), "left")
        .groupBy("bands")
        .agg(count(lit(1)).as("n_candidates"), count(col("hit")).as("n_true"))
      configs.join(broadcast(perConfig), Seq("bands"), "left")
        .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
        .withColumn("n_true", coalesce(col("n_true"), lit(0L)))
        .withColumn("rows_per_band",
          expr(s"CAST($NumHashes div bands AS BIGINT)"))
        .crossJoin(broadcast(nExact))
        .select(col("bands"), col("rows_per_band"), col("n_candidates"),
          col("n_true"), col("n_exact"),
          expr("CAST((n_true * 1000000) div n_exact AS BIGINT)")
            .as("recall_fp6"),
          expr("CAST((n_true * 1000000) div n_candidates AS BIGINT)")
            .as("precision_fp6"))
        .orderBy("bands")
    },
    Some {
      val sigCols = (0 until NumHashes)
        .map(i => s"min(${h60(s"'$i:'||g")}) AS h$i").mkString(", ")
      val perConfig = Seq(2, 4, 8, 16).map { b =>
        val rows = NumHashes / b
        val bandSel = (0 until b).map { bi =>
          val hs = (0 until rows).map(r => s"h${bi * rows + r}").mkString(", ")
          s"SELECT doc_id, $bi AS band, md5(concat_ws(',', $hs)) AS band_key FROM sig"
        }.mkString(" UNION ALL ")
        s"""cands_$b AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM ($bandSel) a JOIN ($bandSel) b
           |    ON a.band = b.band AND a.band_key = b.band_key
           |    AND a.doc_id < b.doc_id),
           |row_$b AS (SELECT $b AS bands, $rows AS rows_per_band,
           |    CAST(COUNT(*) AS BIGINT) AS n_candidates,
           |    CAST(COUNT(e.id_a) AS BIGINT) AS n_true
           |  FROM cands_$b c LEFT JOIN exact e
           |    ON e.id_a = c.id_a AND e.id_b = c.id_b)""".stripMargin
      }.mkString(",\n")
      s"""WITH $gramsCte,
         |sig AS (SELECT doc_id, $sigCols FROM grams GROUP BY doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter_all AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    COUNT(*) AS n_inter
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |exact AS (SELECT id_a, id_b
         |  FROM inter_all JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT) >= 500000),
         |$perConfig,
         |allrows AS (SELECT * FROM row_2 UNION ALL SELECT * FROM row_4
         |  UNION ALL SELECT * FROM row_8 UNION ALL SELECT * FROM row_16)
         |SELECT CAST(bands AS BIGINT) AS bands,
         |  CAST(rows_per_band AS BIGINT) AS rows_per_band,
         |  n_candidates, n_true,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
         |  CAST(n_true * 1000000 // (SELECT COUNT(*) FROM exact) AS BIGINT)
         |    AS recall_fp6,
         |  CAST(n_true * 1000000 // n_candidates AS BIGINT) AS precision_fp6
         |FROM allrows ORDER BY bands""".stripMargin
    })

  /** q155: CROSS-SOURCE DUPLICATION MATRIX — corpus governance at
    * ingest: which sources copy each other, before any of them is
    * admitted. Per doc, the q18 fingerprint (min word-3-gram hash60 —
    * a 1-hash MinHash, so a shared fingerprint ⇒ likely near-dup);
    * per ordered source pair, the count of DISTINCT shared
    * fingerprints plus both directional containments (shared/|a|,
    * shared/|b| — asymmetric on purpose: a small source wholly
    * contained in a big one is the governance signal symmetric overlap
    * dilutes; same rationale as q80 at doc level). Scale shape: the
    * fingerprint is row-local, the pair table is an equi-join KEYED BY
    * FINGERPRINT (never sources × sources over docs), and the
    * per-source size table is tiny — at 100 TB this is one scan + one
    * hash-keyed join, and the output is |sources|² small.
    */
  val q155SourceOverlap = NamedQuery(
    "q155_source_overlap",
    "Cross-source duplication matrix: distinct shared q18 fingerprints " +
      "per source pair + directional containments (fp6) — which " +
      "sources copy each other, measured at ingest.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.select(col("source"),
          fingerprint(col("text")).as("h")).distinct().cache()
      val sizes = fp.groupBy("source").agg(count(lit(1)).as("n"))
      fp.as("a").join(fp.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(countDistinct(col("a.h")).as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          expr("CAST((n_shared * 1000000) div na AS BIGINT)")
            .as("containment_a_fp6"),
          expr("CAST((n_shared * 1000000) div nb AS BIGINT)")
            .as("containment_b_fp6"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH $gramsCte,
            |mins AS (SELECT doc_id, min(${h60("g")}) AS mg FROM grams GROUP BY doc_id),
            |fpd AS (SELECT d.source, COALESCE(m.mg, ${h60("lower(d.text)")}) AS h
            |  FROM documents d LEFT JOIN mins m ON d.doc_id = m.doc_id),
            |fp AS (SELECT DISTINCT source, h FROM fpd),
            |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
            |  FROM fp GROUP BY source),
            |shared AS (SELECT a.source AS src_a, b.source AS src_b,
            |    CAST(COUNT(DISTINCT a.h) AS BIGINT) AS n_shared
            |  FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
            |  GROUP BY 1, 2)
            |SELECT src_a, src_b, n_shared,
            |  CAST(n_shared * 1000000 // sa.n AS BIGINT) AS containment_a_fp6,
            |  CAST(n_shared * 1000000 // sb.n AS BIGINT) AS containment_b_fp6
            |FROM shared JOIN sizes sa ON sa.source = src_a
            |JOIN sizes sb ON sb.source = src_b
            |ORDER BY src_a, src_b""".stripMargin))

  /** q156: DEDUP-AWARE REWEIGHTING (soft dedup) — instead of dropping
    * near-dup docs (q96's survivor pick), keep them all but weight each
    * doc 1/|its dedup cluster| so every near-dup FAMILY contributes one
    * unit of training mass. This is the curation move when dropping is
    * too blunt (the family's variants may differ in useful ways) and
    * the metric that quantifies how inflated each source is: per
    * source, raw doc count vs effective (weighted) doc count — a
    * source that copy-pastes heavily shrinks. All integer math:
    * weight_fp6 = 1e6 div cluster_size, summed exactly. Scale shape:
    * the q53 CC runs on the (tiny) near-dup subgraph, the weight table
    * is one hash-agg over components, and the per-source rollup is one
    * more — the corpus is scanned once.
    */
  val q156DedupReweight = NamedQuery(
    "q156_dedup_reweight",
    "Soft dedup: weight each doc 1e6 div |near-dup cluster| (q53 " +
      "components); per source, raw vs effective doc mass + docs in " +
      "multi-member clusters — how inflated each source is.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
        n = 3, numHashes = NumHashes, bands = Bands, minJaccard = 0.5)
      val comp = graft.operators.GraphOps.connectedComponentsStar(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      val weights = comp
        .join(comp.groupBy("component").agg(count(lit(1)).as("csize")),
          "component")
        .select(col("id").as("doc_id"), col("csize"),
          expr("CAST(1000000 div csize AS BIGINT)").as("weight_fp6"))
      docs.select(col("doc_id"), col("source"))
        .join(weights, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("csize") >= 2, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(col("weight_fp6")).as("effective_docs_fp6"))
        .orderBy("source")
    },
    Some(s"""WITH RECURSIVE $minhashPairsCtes,
            |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            |  UNION ALL SELECT id_b, id_a FROM pairs),
            |reach(id, label) AS (
            |  SELECT doc_id, doc_id FROM documents
            |  UNION
            |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
            |comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id),
            |csizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
            |  FROM comp GROUP BY component),
            |w AS (SELECT comp.id AS doc_id, csize,
            |    CAST(1000000 // csize AS BIGINT) AS weight_fp6
            |  FROM comp JOIN csizes ON comp.component = csizes.component)
            |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(CASE WHEN csize >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_dup_docs,
            |  CAST(SUM(weight_fp6) AS BIGINT) AS effective_docs_fp6
            |FROM documents d JOIN w ON w.doc_id = d.doc_id
            |GROUP BY d.source ORDER BY d.source""".stripMargin))

  /** q158: PER-SOURCE QUALITY-THRESHOLD CALIBRATION — a single global
    * quality cutoff over-filters some sources and under-filters others
    * (their score distributions differ); the calibrated move is a
    * per-source cutoff chosen to hit a target acceptance rate. Per doc,
    * quality = distinct-token ratio in exact integer fp6; per source,
    * the cutoff is the discrete 20th-percentile value (ascending rank
    * ⌈n/5⌉ with doc_id tie-break — a window pick, NOT an engine
    * `percentile_disc`, whose index conventions differ across engines)
    * and the acceptance that cutoff actually yields (≥ cutoff keeps
    * ~80%, more when the cutoff value is tied). Scale shape: quality is
    * row-local; the rank is ONE window sort per source (sources
    * parallelize across executors, per-key cost linear); the rollup
    * reuses the same partitioning.
    */
  val q158QualityCalibration = NamedQuery(
    "q158_quality_calibration",
    "Per-source quality cutoff at the discrete 20th percentile " +
      "(integer fp6, window pick) + the acceptance it yields — " +
      "calibrated filtering instead of one global threshold.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val q = docs
        .select(col("doc_id"), col("source"), tokens(col("text")).as("ts"))
        .filter(size(col("ts")) > 0)
        .select(col("doc_id"), col("source"),
          expr("CAST(CAST(size(array_distinct(ts)) AS BIGINT) * 1000000 " +
            "div size(ts) AS BIGINT)").as("q_fp6"))
      val w = Window.partitionBy("source")
        .orderBy(col("q_fp6").asc, col("doc_id").asc)
      val ranked = q
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("source")).cast("long"))
      val cutoff = ranked
        .filter(col("rn") === expr("(n + 4) div 5"))
        .select(col("source"), col("q_fp6").as("cutoff_fp6"))
      q.join(broadcast(cutoff), "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          first(col("cutoff_fp6")).as("cutoff_fp6"),
          sum(when(col("q_fp6") >= col("cutoff_fp6"), 1L).otherwise(0L))
            .as("n_accepted"))
        .withColumn("accept_fp6",
          expr("CAST(n_accepted * 1000000 div n_docs AS BIGINT)"))
        .orderBy("source")
    },
    Some("""WITH q AS (SELECT doc_id, source,
           |    CAST(len(list_distinct(ts)) * 1000000 // len(ts) AS BIGINT) AS q_fp6
           |  FROM (SELECT doc_id, source, string_split(lower(text),' ') AS ts
           |        FROM documents) WHERE len(ts) > 0),
           |ranked AS (SELECT source, q_fp6,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY q_fp6 ASC, doc_id ASC) AS rn,
           |    COUNT(*) OVER (PARTITION BY source) AS n
           |  FROM q),
           |cutoff AS (SELECT source, q_fp6 AS cutoff_fp6 FROM ranked
           |  WHERE rn = (n + 4) // 5)
           |SELECT q.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  MIN(cutoff_fp6) AS cutoff_fp6,
           |  CAST(SUM(CASE WHEN q_fp6 >= cutoff_fp6 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_accepted,
           |  CAST(SUM(CASE WHEN q_fp6 >= cutoff_fp6 THEN 1 ELSE 0 END) * 1000000
           |    // COUNT(*) AS BIGINT) AS accept_fp6
           |FROM q JOIN cutoff ON q.source = cutoff.source
           |GROUP BY q.source ORDER BY q.source""".stripMargin))

  /** q159: DOCUMENT CHUNKING — the missing primitive between q38's
    * sequence packing and the ANN tier: split every document into
    * 64-token windows overlapping by 16 (stride 48), with provenance
    * (doc_id, chunk_idx, first_token_offset) so chunks map back to
    * source spans. The last chunk is short, never dropped. Scale
    * shape: entirely row-local (tokenize → sequence of starts →
    * posexplode → slice), NO shuffle below the generate (plan-guarded)
    * — chunking 100 TB is a single scan-bandwidth pass. Chunk text is
    * hash-checked byte-for-byte against the oracle's list-slice
    * rendering.
    */
  val q159DocChunks = NamedQuery(
    "q159_doc_chunks",
    "Overlapping token-window chunking (64 tokens, overlap 16) with " +
      "provenance — row-local posexplode+slice, zero shuffle; the " +
      "RAG/pretraining chunk table.",
    (s, d) =>
      graft.operators.Chunker
        .chunk(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 64, overlapTokens = 16)
        .orderBy("doc_id", "chunk_idx"),
    Some("""WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts
           |  FROM documents),
           |starts AS (SELECT doc_id, ts, len(ts) AS n,
           |    unnest(range(0, ((len(ts)-1)//48)+1)) AS k
           |  FROM toks WHERE len(ts) > 0)
           |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
           |  CAST(k*48 AS BIGINT) AS first_token_offset,
           |  CAST(least(64, n - k*48) AS BIGINT) AS n_chunk_tokens,
           |  array_to_string(ts[k*48+1 : k*48+64], ' ') AS chunk_text
           |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin))

  /** q161: CHUNK-GRANULARITY RETRIEVAL — the RAG read path composed
    * end-to-end from this round's chunker: chunk every document
    * (64/16, q159's table), score CHUNKS (not docs) against the q86
    * query with the same all-integer rational BM25, and return the
    * top-10 chunks WITH PROVENANCE (doc_id, chunk_idx,
    * first_token_offset) — what a RAG system actually feeds a context
    * window, and the offsets let it cite the source span. Chunk-level
    * dl/df make short focused chunks beat long diluted documents —
    * the reason RAG indexes chunk, not docs. Scale shape: chunking is
    * row-local on the scan; tf/df are two hash-aggs over (chunk, term)
    * pairs FILTERED to query terms before any shuffle; the top-k is
    * TakeOrderedAndProject (no global sort), with rank assigned by a
    * 10-row window after the take.
    */
  /** BM25-scored 64/16 chunks against [[Bm25Terms]] (q161's pre-top-k
    * derivation), shared with the hybrid fusion (q187): one row per
    * query-term-matching chunk, `(doc_id, chunk_idx,
    * first_token_offset, dl, n_terms, score_fp)`.
    */
  private[queries] def chunkBm25Scored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    chunkBm25ScoredFrom(graft.operators.Chunker
      .chunk(Tables.documents(s, d), "doc_id", "text", 64, 16))

  /** [[chunkBm25Scored]] over an ALREADY-MATERIALIZED chunk table
    * (same schema as [[graft.operators.Chunker.chunk]]) — the entry
    * point the streaming RAG loop (q198) uses to retrieve against a
    * stream-maintained chunk index instead of re-chunking the corpus.
    */
  private[queries] def chunkBm25ScoredFrom(
      chunks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stats = chunks.agg(count(lit(1)).as("n_chunks"),
      sum("n_chunk_tokens").as("t_total"))
    val tf = chunks
      .select(col("doc_id"), col("chunk_idx"), col("first_token_offset"),
        col("n_chunk_tokens").as("dl"),
        explode(tokens(col("chunk_text"))).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy("doc_id", "chunk_idx", "first_token_offset", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), expr("(1000 * n_chunks) div df").as("idf_fp3"))
    tf.join(broadcast(idf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(
        "(idf_fp3 * 44 * tf * t_total) div " +
          "(20 * tf * t_total + 6 * t_total + 18 * n_chunks * dl)"))
      .groupBy("doc_id", "chunk_idx", "first_token_offset", "dl")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_fp"))
  }

  /** DuckDB CTE bodies shared by the chunk-retrieval oracles
    * (q161/q184/q186/q187): `ChunkCtesSql` derives the 64/16 chunk
    * table (`chunks(doc_id, chunk_idx, first_token_offset, dl, ct)`);
    * `chunkBm25CtesSql` scores it against [[Bm25Terms]] into
    * `lscored` (q161's `scored`, renamed to coexist with the dense
    * CTEs). Both are WITH-clause fragments, not full statements.
    */
  private[queries] val ChunkCtesSql: String =
    """toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts
      |  FROM documents),
      |chunks AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |    CAST(k*48 AS BIGINT) AS first_token_offset,
      |    CAST(least(64, n - k*48) AS BIGINT) AS dl,
      |    ts[k*48+1 : k*48+64] AS ct
      |  FROM (SELECT doc_id, ts, len(ts) AS n,
      |      unnest(range(0, ((len(ts)-1)//48)+1)) AS k
      |    FROM toks WHERE len(ts) > 0))""".stripMargin

  private[queries] def chunkBm25CtesSql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |    CAST(SUM(dl) AS BIGINT) AS t_total FROM chunks),
       |tf AS (SELECT doc_id, chunk_idx, first_token_offset, dl, term,
       |    CAST(COUNT(*) AS BIGINT) AS tf FROM
       |    (SELECT doc_id, chunk_idx, first_token_offset, dl,
       |       unnest(ct) AS term FROM chunks)
       |  WHERE term IN ($terms)
       |  GROUP BY doc_id, chunk_idx, first_token_offset, dl, term),
       |idf AS (SELECT term, (1000 * n_chunks) // df AS idf_fp3 FROM
       |    (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
       |     GROUP BY term), stats),
       |lscored AS (SELECT tf.doc_id, tf.chunk_idx,
       |    tf.first_token_offset, tf.dl,
       |    CAST(COUNT(*) AS BIGINT) AS n_terms,
       |    CAST(SUM((idf_fp3 * 44 * tf * t_total) //
       |      (20 * tf * t_total + 6 * t_total + 18 * n_chunks * dl))
       |      AS BIGINT) AS score_fp
       |  FROM tf JOIN idf USING (term), stats
       |  GROUP BY tf.doc_id, tf.chunk_idx, tf.first_token_offset, tf.dl)""".stripMargin
  }

  val q161ChunkRetrieval = NamedQuery(
    "q161_chunk_retrieval",
    "RAG retrieval: BM25 top-10 over 64/16 token chunks with " +
      "(doc_id, chunk_idx, offset) provenance — chunk-level dl/df, " +
      "integer rational scoring, TakeOrderedAndProject top-k.",
    (s, d) =>
      chunkBm25Scored(s, d)
        .orderBy(col("score_fp").desc, col("doc_id").asc,
          col("chunk_idx").asc)
        .limit(10)
        .withColumn("rank", row_number().over(
          graft.BoundedWindow.orderBy(col("score_fp").desc,
            col("doc_id").asc, col("chunk_idx").asc)).cast("long"))
        .select("doc_id", "chunk_idx", "first_token_offset", "dl",
          "n_terms", "score_fp", "rank"),
    Some(s"""WITH $ChunkCtesSql,
            |$chunkBm25CtesSql
            |SELECT doc_id, chunk_idx, first_token_offset, dl, n_terms,
            |  score_fp,
            |  CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id ASC,
            |    chunk_idx ASC) AS BIGINT) AS rank
            |FROM lscored
            |ORDER BY score_fp DESC, doc_id ASC, chunk_idx ASC LIMIT 10""".stripMargin))

  /** q162: N-GRAM NOVELTY CURVE — how much genuinely new content each
    * document adds when the corpus is ingested in doc_id order: a
    * gram is NOVEL in the first (min-doc_id) document containing it;
    * per doc, the fraction of its distinct 3-grams that are novel.
    * The declining tail of this curve is THE diminishing-returns
    * signal data curation watches (near-zero novelty ⇒ the source is
    * exhausted / duplicative — deduplicate or stop ingesting).
    * Scale shape: one shuffle keyed by gram hash where a
    * whole-partition min window marks first-containers (two longs of
    * state per gram, same discipline as [[TextDedup.spanFlags]] —
    * hot boilerplate grams cost no more than rare ones), then one
    * per-doc hash-agg. Output is per-doc (doc_id-ordered), exact
    * integer fp6.
    */
  val q162NoveltyCurve = NamedQuery(
    "q162_novelty_curve",
    "Per-doc novel-gram fraction in doc_id ingest order (gram is novel " +
      "in its min-doc_id container): the diminishing-returns curve — " +
      "one gram-keyed window shuffle + one per-doc agg.",
    (s, d) => {
      val wGk = Window.partitionBy("gk")
      TextDedup.gramSets(Tables.documents(s, d), "doc_id", "text", 3)
        .select(col("gs_id").as("doc_id"), hash60(col("gram")).as("gk"))
        .withColumn("novel",
          (min("doc_id").over(wGk) === col("doc_id")).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), sum("novel").as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          expr("CAST((n_novel * 1000000) div n_grams AS BIGINT)")
            .as("novelty_fp6"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $gramsCte,
            |gk AS (SELECT doc_id, ${h60("g")} AS gk FROM grams),
            |flagged AS (SELECT doc_id,
            |    CASE WHEN MIN(doc_id) OVER (PARTITION BY gk) = doc_id
            |      THEN 1 ELSE 0 END AS novel
            |  FROM gk)
            |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
            |  CAST(SUM(novel) AS BIGINT) AS n_novel,
            |  CAST((SUM(novel) * 1000000) // COUNT(*) AS BIGINT)
            |    AS novelty_fp6
            |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** q177: PSEUDO-RELEVANCE-FEEDBACK QUERY EXPANSION — the classic
    * query-side retrieval upgrade (Rocchio/RM-style, the "expand the
    * query from its own top hits" trick RAG pipelines use when the
    * user query undershoots the corpus vocabulary): (1) score the
    * 3-term seed query with q86's all-integer BM25, (2) take its top-3
    * docs as the feedback set, (3) mine expansion candidates from ONLY
    * those docs (a 3-doc-bounded term table), weight each candidate by
    * feedback-tf × the q56 integer idf surrogate (df computed via a
    * candidate-semi-joined distinct — the corpus-wide df table never
    * materializes), keep the top-5, and (4) rescore the corpus with
    * seed ∪ expansion (8 terms), flagging which top-10 docs the seed
    * query alone would NOT have surfaced. Scale shape: the (doc,term)
    * explode is ONE cached pass feeding all four stages; every term
    * table is semi-join-filtered BEFORE its shuffle (seed: 3 terms,
    * feedback: 3 docs, candidates: their vocabulary, round 2: 8
    * terms); doc selections are orderBy+limit bounded heaps; the same
    * integer-rational BM25 keeps every score an exact long, so the
    * whole feedback loop is hash-stable.
    */
  val q177PrfExpansion = NamedQuery(
    "q177_prf_expansion",
    "Pseudo-relevance feedback: BM25 seed round, top-3 feedback docs, " +
      "top-5 fb_tf*idf expansion terms, rescore with seed+expansion; " +
      "top-10 with in_seed_top10 flags, all-integer.",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val toks = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .cache() // seed tf, feedback mining, candidate df, rescoring
      val dl = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum("dl").as("t_total"))
      def score(tf: org.apache.spark.sql.DataFrame) = {
        val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(stats))
          .select(col("term"), expr("(1000 * n_docs) div df").as("idf_fp3"))
        tf.join(broadcast(idf), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("contrib", expr(
            "(idf_fp3 * 44 * tf * t_total) div " +
              "(20 * tf * t_total + 6 * t_total + 18 * n_docs * dl)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_fp"))
      }
      val tf1 = toks.filter(col("term").isin(Bm25Terms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val r1 = score(tf1).cache() // feedback set + seed top-10 both read it
      val fbDocs = r1.orderBy(col("score_fp").desc, col("doc_id"))
        .limit(3).select("doc_id")
      val seedTop = r1.orderBy(col("score_fp").desc, col("doc_id"))
        .limit(10).select(col("doc_id"), lit(true).as("in_seed_top10"))
      val fbTf = toks.join(broadcast(fbDocs), "doc_id")
        .filter(!col("term").isin(Bm25Terms: _*))
        .groupBy("term").agg(count(lit(1)).as("fb_tf"))
      val dfCand = toks.join(broadcast(fbTf.select("term")), "term")
        .select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val expTerms = fbTf.join(dfCand, "term")
        .crossJoin(broadcast(stats))
        .select(col("term"),
          (col("fb_tf") * expr("(1000 * n_docs) div df")).as("es"))
        .orderBy(col("es").desc, col("term")).limit(5).select("term")
      val allTerms = expTerms
        .unionByName(Bm25Terms.toDF("term")).distinct()
      val tf2 = toks.join(broadcast(allTerms), "term")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val w = graft.BoundedWindow.orderBy(col("score_fp").desc, col("doc_id").asc)
      score(tf2)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .join(seedTop, Seq("doc_id"), "left")
        .select(col("rank"), col("doc_id"), col("n_terms"),
          col("score_fp"),
          coalesce(col("in_seed_top10"), lit(false)).as("in_seed_top10"))
        .orderBy("rank")
    },
    Some {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val termList = Bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")
      def contrib =
        """(idf_fp3 * 44 * tf * t_total) //
          |      (20 * tf * t_total + 6 * t_total + 18 * n_docs * dl)""".stripMargin
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(string_split(lower(text),' ')) AS term FROM documents),
         |dl AS (SELECT doc_id,
         |    CAST(len(string_split(lower(text),' ')) AS BIGINT) AS dl
         |  FROM documents),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS t_total FROM dl),
         |tf1 AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks WHERE term IN ($terms) GROUP BY 1, 2),
         |idf1 AS (SELECT term, (1000 * n_docs) // df AS idf_fp3 FROM
         |    (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf1
         |     GROUP BY 1), stats),
         |r1 AS (SELECT tf1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM($contrib) AS BIGINT) AS score_fp
         |  FROM tf1 JOIN idf1 USING (term)
         |    JOIN dl ON tf1.doc_id = dl.doc_id, stats
         |  GROUP BY tf1.doc_id),
         |fb AS (SELECT doc_id FROM r1
         |  ORDER BY score_fp DESC, doc_id LIMIT 3),
         |seedtop AS (SELECT doc_id FROM r1
         |  ORDER BY score_fp DESC, doc_id LIMIT 10),
         |fbtf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS fb_tf
         |  FROM toks JOIN fb USING (doc_id)
         |  WHERE term NOT IN ($terms) GROUP BY 1),
         |dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM
         |    (SELECT DISTINCT doc_id, term FROM toks
         |     WHERE term IN (SELECT term FROM fbtf)) GROUP BY 1),
         |exp AS (SELECT fbtf.term FROM fbtf JOIN dfc USING (term), stats
         |  ORDER BY fb_tf * ((1000 * n_docs) // df) DESC, fbtf.term
         |  LIMIT 5),
         |allt AS (SELECT DISTINCT term FROM
         |    (SELECT term FROM exp
         |     UNION ALL SELECT unnest($termList) AS term)),
         |tf2 AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks WHERE term IN (SELECT term FROM allt) GROUP BY 1, 2),
         |idf2 AS (SELECT term, (1000 * n_docs) // df AS idf_fp3 FROM
         |    (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf2
         |     GROUP BY 1), stats),
         |r2 AS (SELECT tf2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM($contrib) AS BIGINT) AS score_fp
         |  FROM tf2 JOIN idf2 USING (term)
         |    JOIN dl ON tf2.doc_id = dl.doc_id, stats
         |  GROUP BY tf2.doc_id),
         |ranked AS (SELECT doc_id, n_terms, score_fp,
         |    CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id ASC)
         |      AS BIGINT) AS rank FROM r2)
         |SELECT rank, r.doc_id, n_terms, score_fp,
         |  (s.doc_id IS NOT NULL) AS in_seed_top10
         |FROM ranked r LEFT JOIN seedtop s ON r.doc_id = s.doc_id
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    })

  /** q192: CDF-DRIVEN LEXICAL INDEX MAINTENANCE — q185's sibling for
    * the OTHER retrieval mode: the BM25 statistics a lexical index
    * serves (per-term document frequency and total term frequency)
    * maintained incrementally from a merge-maintained corpus's change
    * feed. delete/update_preimage docs RETRACT their per-term
    * contributions (df −1 per distinct term, tf −tf), insert/
    * update_postimage docs add theirs — cost O(changed docs' tokens),
    * never a corpus re-tokenize; [[graft.sources.ManagedTable
    * .changes]] plans the feed from manifest file diffs, so the whole
    * maintenance pass is O(changeset) end-to-end. The output row is
    * the PROOF an index server needs before trusting the shortcut:
    * term-set and per-term df/tf equality between the incrementally-
    * maintained index and a full rebuild of the new snapshot (four
    * mismatch counters, all zero ⇒ agree). Unlike the dense case
    * (q185, where assignment is per-row independent), lexical df is a
    * CROSS-DOC aggregate — this query is what shows the retraction
    * algebra still closes exactly.
    */
  val q192CdfLexicalIndex = NamedQuery(
    "q192_cdf_lexical_index",
    "Incremental BM25 index stats from the change feed: per-term " +
      "df/tf retractions+additions at O(changeset), proven equal to " +
      "a full rebuild (term set + both stats, zero mismatches).",
    (s, d) => {
      val dir = graft.Scratch.dir("cdflex", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val hist = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("text"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
      (0 until 2).foreach { i =>
        M.merge(hist.filter(
            col("seq") >= i * 200 && col("seq") < (i + 1) * 200),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")), tag = s"m$i")
      }
      val del = col("op") === "d"
      val drop = Seq("seq", "op")
      // per-term (df, tf_total) of a doc set — the index's statistics
      def stats(df: org.apache.spark.sql.DataFrame, dfC: String, tfC: String) =
        df.select(col("k"), explode(tokens(col("text"))).as("term"))
          .groupBy("k", "term").agg(count(lit(1)).as("tf"))
          .groupBy("term")
          .agg(count(lit(1)).as(dfC), sum("tf").as(tfC))
      val cdf = M.changes(s, dir, 1, 2, Seq("k"),
        deleteExpr = del, exceptColumns = drop)
      val v1 = stats(M.readCurrent(s, dir, del, drop, Some(1)), "df1", "tf1")
      val rem = stats(cdf.filter(
        col("_change_type").isin("delete", "update_preimage")), "dfr", "tfr")
      val add = stats(cdf.filter(
        col("_change_type").isin("insert", "update_postimage")), "dfa", "tfa")
      val incr = v1.join(rem, Seq("term"), "full_outer")
        .join(add, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df1"), lit(0L)) - coalesce(col("dfr"), lit(0L)) +
            coalesce(col("dfa"), lit(0L))).as("df_incr"),
          (coalesce(col("tf1"), lit(0L)) - coalesce(col("tfr"), lit(0L)) +
            coalesce(col("tfa"), lit(0L))).as("tf_incr"))
        .filter(col("df_incr") > 0)
      val rebuild = stats(
        M.readCurrent(s, dir, del, drop, Some(2)), "df2", "tf2")
      incr.join(rebuild, Seq("term"), "full_outer")
        .agg(
          sum(when(col("df2").isNotNull, 1L).otherwise(0L)).as("n_terms"),
          sum(when(col("df_incr").isNull, 1L).otherwise(0L))
            .as("n_missing_incr"),
          sum(when(col("df2").isNull, 1L).otherwise(0L)).as("n_extra_incr"),
          sum(when(col("df_incr").isNotNull && col("df2").isNotNull &&
            col("df_incr") =!= col("df2"), 1L).otherwise(0L))
            .as("n_df_mismatch"),
          sum(when(col("tf_incr").isNotNull && col("tf2").isNotNull &&
            col("tf_incr") =!= col("tf2"), 1L).otherwise(0L))
            .as("n_tf_mismatch"))
        .withColumn("agree", when(
          col("n_missing_incr") + col("n_extra_incr") +
            col("n_df_mismatch") + col("n_tf_mismatch") === 0, 1L)
          .otherwise(0L))
    },
    Some("""WITH h AS (SELECT doc_id % 150 AS k, doc_id AS seq, text,
           |    CASE WHEN doc_id % 7 = 0 THEN 'd' ELSE 'u' END op
           |  FROM documents WHERE doc_id < 400),
           |s1 AS (SELECT k, text FROM (
           |    SELECT *, row_number() OVER (PARTITION BY k
           |      ORDER BY seq DESC) rn FROM h WHERE seq < 200)
           |  WHERE rn = 1 AND op <> 'd'),
           |s2 AS (SELECT k, text FROM (
           |    SELECT *, row_number() OVER (PARTITION BY k
           |      ORDER BY seq DESC) rn FROM h WHERE seq < 400)
           |  WHERE rn = 1 AND op <> 'd'),
           |j AS (SELECT coalesce(s1.k, s2.k) AS k,
           |    s1.text AS t1, s2.text AS t2,
           |    s1.k IS NOT NULL AS has1, s2.k IS NOT NULL AS has2
           |  FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k),
           |rem0 AS (SELECT k, t1 AS text FROM j
           |  WHERE has1 AND (NOT has2 OR t1 IS DISTINCT FROM t2)),
           |add0 AS (SELECT k, t2 AS text FROM j
           |  WHERE has2 AND (NOT has1 OR t1 IS DISTINCT FROM t2)),
           |v1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df1,
           |    CAST(SUM(tf) AS BIGINT) AS tf1 FROM (
           |    SELECT k, term, COUNT(*) AS tf FROM (
           |      SELECT k, unnest(string_split(lower(text),' ')) AS term
           |      FROM s1) GROUP BY 1, 2) GROUP BY 1),
           |rem AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfr,
           |    CAST(SUM(tf) AS BIGINT) AS tfr FROM (
           |    SELECT k, term, COUNT(*) AS tf FROM (
           |      SELECT k, unnest(string_split(lower(text),' ')) AS term
           |      FROM rem0) GROUP BY 1, 2) GROUP BY 1),
           |ad AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfa,
           |    CAST(SUM(tf) AS BIGINT) AS tfa FROM (
           |    SELECT k, term, COUNT(*) AS tf FROM (
           |      SELECT k, unnest(string_split(lower(text),' ')) AS term
           |      FROM add0) GROUP BY 1, 2) GROUP BY 1),
           |incr AS (SELECT term,
           |    COALESCE(df1, 0) - COALESCE(dfr, 0) + COALESCE(dfa, 0)
           |      AS df_incr,
           |    COALESCE(tf1, 0) - COALESCE(tfr, 0) + COALESCE(tfa, 0)
           |      AS tf_incr
           |  FROM v1 FULL OUTER JOIN rem USING (term)
           |    FULL OUTER JOIN ad USING (term)
           |  WHERE COALESCE(df1, 0) - COALESCE(dfr, 0) + COALESCE(dfa, 0)
           |    > 0),
           |rebuild AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df2,
           |    CAST(SUM(tf) AS BIGINT) AS tf2 FROM (
           |    SELECT k, term, COUNT(*) AS tf FROM (
           |      SELECT k, unnest(string_split(lower(text),' ')) AS term
           |      FROM s2) GROUP BY 1, 2) GROUP BY 1)
           |SELECT
           |  CAST(SUM(CASE WHEN df2 IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_terms,
           |  CAST(SUM(CASE WHEN df_incr IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_missing_incr,
           |  CAST(SUM(CASE WHEN df2 IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_extra_incr,
           |  CAST(SUM(CASE WHEN df_incr IS NOT NULL AND df2 IS NOT NULL
           |    AND df_incr <> df2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_df_mismatch,
           |  CAST(SUM(CASE WHEN tf_incr IS NOT NULL AND tf2 IS NOT NULL
           |    AND tf_incr <> tf2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_tf_mismatch,
           |  CAST(CASE WHEN SUM(CASE WHEN df_incr IS NULL THEN 1 ELSE 0 END)
           |    + SUM(CASE WHEN df2 IS NULL THEN 1 ELSE 0 END)
           |    + SUM(CASE WHEN df_incr IS NOT NULL AND df2 IS NOT NULL
           |        AND df_incr <> df2 THEN 1 ELSE 0 END)
           |    + SUM(CASE WHEN tf_incr IS NOT NULL AND tf2 IS NOT NULL
           |        AND tf_incr <> tf2 THEN 1 ELSE 0 END) = 0
           |    THEN 1 ELSE 0 END AS BIGINT) AS agree
           |FROM incr FULL OUTER JOIN rebuild USING (term)""".stripMargin))

  /** q228: DEDUP CLUSTERING THROUGH RELIABLE CHECKPOINTS — the same
    * connected-components loop the dedup path runs (q53/q96), but
    * with `spark.graft.graph.checkpointDir` set, so every round's
    * lineage truncation is a RELIABLE checkpoint on the configured
    * filesystem instead of an executor-local one. This is the
    * cluster-scale posture: localCheckpoint data dies with an
    * executor and the truncated lineage cannot be recomputed (the
    * job FAILS); reliable checkpoints survive executor loss, which
    * is the difference between a 40-round component loop on 1000
    * executors finishing or dying to one preemption. The graph is a
    * deterministic chain forest (doc_id → doc_id+1 within buckets of
    * 20), deep enough that the star loop actually iterates; the flag
    * column proves checkpoint bytes landed under the configured
    * root.
    */
  val q228ReliableCkptClusters = NamedQuery(
    "q228_reliable_ckpt_clusters",
    "Connected components through spark.graft.graph.checkpointDir: " +
      "reliable (executor-loss-safe) lineage truncation drives the " +
      "same cluster labels; chain-forest components vs recursive " +
      "oracle arithmetic.",
    (s, d) => {
      val root = graft.Scratch.dir("gckpt", d)
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      s.conf.set(graft.operators.GraphOps.CheckpointDirConf, root)
      try {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 400)
        val verts = docs.select(col("doc_id").as("id"))
        // chain forest: doc_id → doc_id+1 except across bucket walls
        val edges = docs.filter(col("doc_id") % 20 =!= 19)
          .select(col("doc_id").as("src"),
            (col("doc_id") + 1).as("dst"))
        val comp = graft.operators.GraphOps.connectedComponentsStar(
          verts, edges)
        val ckptLanded = fs.exists(p) &&
          fs.listStatus(p).nonEmpty
        comp.groupBy(col("component").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"),
            max(col("id")).as("max_member"))
          .withColumn("reliable_ckpt_used", lit(ckptLanded))
          .orderBy("cluster_id")
      } finally s.conf.unset(
        graft.operators.GraphOps.CheckpointDirConf)
    },
    Some("""SELECT MIN(doc_id) AS cluster_id,
           |  COUNT(*) AS n_members, MAX(doc_id) AS max_member,
           |  true AS reliable_ckpt_used
           |FROM documents WHERE doc_id < 400
           |GROUP BY (doc_id // 20)
           |ORDER BY cluster_id""".stripMargin))

  /** q230: BENCHMARK DECONTAMINATION — the training-data hygiene step
    * every serious pretraining pipeline runs: drop (or here, REPORT)
    * train documents that share any word 5-gram with the held-out
    * eval set, so benchmark answers cannot leak into the corpus
    * (the n-gram-overlap rule GPT-3/PaLM/Llama report using; 5-grams
    * are this corpus's scale-appropriate analogue of their 8–13-gram
    * windows). Scale shape: the eval side is benchmarks — thousands
    * of docs against a 100 TB corpus — so its distinct gram set
    * BROADCASTS; the train side streams through one projection +
    * explode with NO shuffle before the hash join, and the only
    * shuffle is the per-doc aggregation of matches, keyed by doc_id.
    * Gram extraction is the codegen'd [[graft.functions
    * .NativeExpressions.WordNgrams]] expression on both sides.
    */
  val q230Decontamination = NamedQuery(
    "q230_decontamination",
    "Benchmark decontamination: train docs sharing any word 5-gram " +
      "with the (broadcast) eval slice, with shared-gram and " +
      "eval-doc match counts — n-gram overlap vs DuckDB oracle.",
    (s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("g", explode(wordNgrams(
          split(lower(col("text")), " "), 5)))
        .select(col("doc_id"), col("lang"), col("g")).distinct()
      val ev = grams(docs.filter(col("doc_id") % 7 === 0))
        .select(col("doc_id").as("eval_id"), col("g"))
      val tr = grams(docs.filter(col("doc_id") % 7 =!= 0))
      tr.join(broadcast(ev), "g")
        .groupBy("doc_id", "lang")
        .agg(countDistinct(col("g")).as("n_shared_grams"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id, lang,
           |    string_split(lower(text),' ') AS ts FROM documents),
           |g5 AS (SELECT DISTINCT doc_id, lang, g FROM toks,
           |  unnest(list_transform(range(1, len(ts)-3),
           |    i -> ts[i]||' '||ts[i+1]||' '||ts[i+2]||' '||
           |      ts[i+3]||' '||ts[i+4])) AS t(g)
           |  WHERE len(ts) >= 5),
           |ev AS (SELECT doc_id AS eval_id, g FROM g5
           |  WHERE doc_id % 7 = 0),
           |tr AS (SELECT doc_id, lang, g FROM g5 WHERE doc_id % 7 <> 0)
           |SELECT tr.doc_id, tr.lang,
           |  COUNT(DISTINCT tr.g) AS n_shared_grams,
           |  COUNT(DISTINCT ev.eval_id) AS n_eval_docs
           |FROM tr JOIN ev USING (g)
           |GROUP BY tr.doc_id, tr.lang
           |ORDER BY tr.doc_id""".stripMargin))

  /** q233: STREAMING ADMISSION GATE — the online form of the dedup
    * tier: new documents arrive as a STREAM (one micro-batch per
    * corpus version) and each batch is admitted or rejected against a
    * GROWING index of everything admitted so far. A doc is rejected
    * iff some already-admitted doc OR a smaller-id batch-mate is an
    * exact duplicate (text digest) or a verified near-duplicate
    * (MinHash 16 / LSH 4-band candidate with exact word-3-gram
    * Jaccard ≥ 0.5 — q14's exact semantics). Rejected docs never
    * enter the index, so they do not shadow later arrivals; admitted
    * docs immediately do.
    *
    * Scale shape (what makes this the 100 TB admission path): the
    * admitted corpus is NEVER re-scanned. Per batch: grams/signatures
    * are row-local native expressions over the batch; candidates come
    * from ONE (band, band_key)-keyed equi-join of the batch's bands
    * against the maintained BANDS INDEX table (index-scale,
    * manifest-planned); exact-Jaccard verification joins only the
    * candidate docs' texts (candidate-bounded); exact dedup joins the
    * admitted table's digest COLUMN (column-pruned scan); admission
    * is one append commit per table, tag-idempotent per batch. The
    * ORACLE unrolls the three batches in SQL over the same hash
    * conventions, so the greedy admitted SET itself — order effects
    * included — is hash-checked cross-engine.
    */
  val q233StreamingAdmission = NamedQuery(
    "q233_streaming_admission",
    "Streaming corpus admission: per micro-batch, reject exact and " +
      "verified MinHash+LSH near-dups of the admitted index or of " +
      "smaller-id batch-mates; admitted docs extend the index for " +
      "later batches; final admitted set vs a 3-stage unrolled oracle.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = graft.sources.ManagedTable
      val root = graft.Scratch.dir("admit", d) + "/" +
        java.util.UUID.randomUUID().toString.take(8)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val (src, accDir, bandsDir) =
        (s"$root/src", s"$root/acc", s"$root/bands")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "text")
      val hist = docs.filter(col("doc_id") < 200)
      // arrivals: two appended versions = two deterministic
      // micro-batches under maxVersionsPerTrigger=1 (two suffice to
      // prove the growing-index order effects; each extra batch pays
      // the full fixed per-tick job cost — suite-leanness discipline)
      M.appendCommit(docs.filter(
        col("doc_id") >= 200 && col("doc_id") < 350), src)
      M.appendCommit(docs.filter(col("doc_id") >= 350), src)
      def withDg(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("text"),
          TextDedup.textDigest(col("text")).as("dg"))
      def bandsOf(df: org.apache.spark.sql.DataFrame) =
        TextDedup.lshBands(TextDedup.minhashSignatures(
          df, "doc_id", "text", n = 3, numHashes = NumHashes),
          NumHashes, Bands)
      // the index starts as the historical corpus. Appends are
      // single-file at this scale (a post-join frame otherwise lands
      // one tiny file PER shuffle partition, and every later tick
      // re-plans all of them); a 100 TB deployment size-targets here
      M.appendCommit(withDg(hist).coalesce(1), accDir)
      M.appendCommit(bandsOf(hist).coalesce(1), bandsDir)
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", 1).load(src)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, bid: Long) =>
            val bs = b.sparkSession
            val batch = b.select("doc_id", "text").cache()
            val acc = M.read(bs, accDir).cache() // ONE index read/batch
            val batchBands = bandsOf(batch).cache()
            // candidates: batch bands vs (index ∪ batch) bands, the
            // smaller id always on the a-side (history < earlier
            // arrivals < this batch's ids, and within-batch a < b)
            val allBands = M.read(bs, bandsDir).unionByName(batchBands)
            val cands = allBands.as("a").join(batchBands.as("b"),
                col("a.band") === col("b.band") &&
                  col("a.band_key") === col("b.band_key") &&
                  col("a.mh_id") < col("b.mh_id"))
              .select(col("a.mh_id").as("id_a"), col("b.mh_id").as("id_b"))
              .distinct().cache()
            val candIds = cands.select(col("id_a").as("doc_id"))
              .unionByName(cands.select(col("id_b").as("doc_id")))
              .distinct()
            val candTexts = acc.select("doc_id", "text")
              .unionByName(batch)
              .join(candIds, Seq("doc_id"), "left_semi")
            val nearRej = TextDedup.jaccardPairsFromGrams(
                TextDedup.docGramArrays(candTexts, "doc_id", "text", 3),
                minJaccard = 0.5)
              .join(cands, Seq("id_a", "id_b"), "left_semi")
              .select(col("id_b").as("doc_id"))
            val dgBatch = withDg(batch).select("doc_id", "dg")
            val dgAll = acc.select("doc_id", "dg").unionByName(dgBatch)
            val exactRej = dgBatch.as("b").join(dgAll.as("a"),
                col("a.dg") === col("b.dg") &&
                  col("a.doc_id") < col("b.doc_id"))
              .select(col("b.doc_id").as("doc_id"))
            val rejected = nearRej.unionByName(exactRej).distinct()
            val accepted = batch
              .join(rejected, Seq("doc_id"), "left_anti").cache()
            if (!accepted.isEmpty) {
              // tag-idempotent per batch, per table ledger
              if (!M.committedTagSet(bs, accDir).contains(s"b$bid"))
                M.appendCommit(withDg(accepted).coalesce(1), accDir,
                  tag = s"b$bid")
              val accBands = batchBands.join(
                accepted.select(col("doc_id").as("mh_id")),
                Seq("mh_id"), "left_semi")
              if (!accBands.isEmpty &&
                  !M.committedTagSet(bs, bandsDir).contains(s"b$bid"))
                M.appendCommit(accBands.coalesce(1), bandsDir,
                  tag = s"b$bid")
            }
            Seq(batch, acc, batchBands, cands, accepted)
              .foreach(_.unpersist())
            ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      M.read(s, accDir).filter(col("doc_id") >= 200)
        .select("doc_id").orderBy("doc_id")
    },
    Some {
      val rows = NumHashes / Bands
      val sigCols = (0 until NumHashes)
        .map(i => s"min(${h60(s"'$i:'||g")}) AS h$i").mkString(", ")
      val bandSel = (0 until Bands).map { b =>
        val hs = (0 until rows).map(r => s"h${b * rows + r}")
          .mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws(',', $hs)) AS band_key FROM sig"
      }.mkString(" UNION ALL ")
      def stage(k: Int, lo: Int, hi: Int): String =
        s"""b$k AS (SELECT doc_id FROM corpus
           |  WHERE doc_id >= $lo AND doc_id < $hi),
           |rej$k AS (SELECT DISTINCT r.id_b AS doc_id FROM rel r
           |  JOIN b$k t ON t.doc_id = r.id_b
           |  WHERE r.id_a IN (SELECT doc_id FROM adm${k - 1})
           |     OR r.id_a IN (SELECT doc_id FROM b$k)),
           |adm$k AS (SELECT doc_id FROM adm${k - 1}
           |  UNION ALL SELECT doc_id FROM b$k
           |  WHERE doc_id NOT IN (SELECT doc_id FROM rej$k))""".stripMargin
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id < 500),
         |toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts
         |  FROM corpus),
         |grams AS (SELECT DISTINCT doc_id, g FROM toks,
         |  unnest(list_transform(range(1, len(ts)-1),
         |    i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
         |  WHERE len(ts) >= 3),
         |sig AS (SELECT doc_id, $sigCols FROM grams GROUP BY doc_id),
         |bands AS ($bandSel),
         |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |      AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, COUNT(*) AS n_inter FROM cands
         |  JOIN grams ga ON ga.doc_id = id_a
         |  JOIN grams gb ON gb.doc_id = id_b AND gb.g = ga.g
         |  GROUP BY id_a, id_b),
         |near AS (SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE CAST(floor(n_inter/(sa.n+sb.n-n_inter)*1000000.0) AS BIGINT)
         |    >= 500000),
         |dg AS (SELECT doc_id, md5(lower(text)) AS dg FROM corpus),
         |exacts AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM dg a JOIN dg b
         |    ON a.dg = b.dg AND a.doc_id < b.doc_id),
         |rel AS (SELECT id_a, id_b FROM near
         |  UNION SELECT id_a, id_b FROM exacts),
         |adm0 AS (SELECT doc_id FROM corpus WHERE doc_id < 200),
         |${stage(1, 200, 350)},
         |${stage(2, 350, 500)}
         |SELECT doc_id FROM adm2 WHERE doc_id >= 200
         |ORDER BY doc_id""".stripMargin
    })

  val all: Seq[NamedQuery] = Seq(
    q12ExactDupGroups, q13JaccardPairs, q14MinhashLsh, q15SimhashHamming,
    q16TextQuality, q17LangId, q18Fingerprint, q41CleanCorpus,
    q53DedupClusters, q54RepetitionMetrics, q56TfidfTopK,
    q60IncrementalDedup, q63LengthOutliers, q68CorpusPipeline,
    q69BigramDice, q76FuzzyMatch, q80Containment, q82PrefixFilterJoin,
    q86Bm25TopK, q95UnigramSurprisal, q96CanonicalSurvivors,
    q103Boilerplate, q104CollapseRuns, q105ClusterSplit,
    q108NgramGenerator, q118GroupedQuantiles, q119InvertedIndex,
    q121RepeatedSpans, q123PageRank, q129SpanStrip,
    q131EntityResolution, q134FilterCascade, q148LshRecall,
    q154LshBandSweep, q155SourceOverlap, q156DedupReweight,
    q158QualityCalibration, q159DocChunks, q161ChunkRetrieval,
    q162NoveltyCurve, q177PrfExpansion, q192CdfLexicalIndex,
    q228ReliableCkptClusters, q230Decontamination,
    q233StreamingAdmission)
}
