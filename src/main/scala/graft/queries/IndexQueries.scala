package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Scratch, Tables}
import graft.functions.TextFunctions.tokens
import graft.operators.IndexMaintenance
import graft.sources.ManagedTable

/** The unified feed-maintained index tier ([[graft.operators
  * .IndexMaintenance]]): the composition proof that ONE change feed,
  * derived once, keeps ALL THREE derived index families (dense IVF
  * postings, lexical BM25 df/tf, content-addressed chunk refcounts)
  * exactly consistent through one transactional tick — the production
  * shape of q185 + q192 + q196, which each proved one family from its
  * own independently-derived feed.
  */
object IndexQueries {

  /** q197: TRANSACTIONAL TRI-INDEX MAINTENANCE — what a production
    * ingest tick actually runs at 100 TB: a merge-maintained corpus
    * (text + embedding per key) commits two versions; [[graft
    * .operators.IndexMaintenance.maintainTick]] derives the change
    * feed BETWEEN them ONCE (manifest-planned, O(changed data)) and
    * commits the dense-IVF postings, lexical df/tf stats, and chunk
    * refcounts as ONE merge into ONE `(family, key)`-keyed index
    * table — either every family reflects the corpus change or none
    * does. The query then reads the committed index state back and
    * proves EVERY family equal to a full rebuild of the new snapshot:
    * per family, rebuild key count, missing/extra keys, and both
    * stat mismatches, all zero ⇒ agree. This is the gap q185/q192/
    * q196 left open: they each re-derived their own feed and ran
    * their own pass; here one cached feed and one commit maintain the
    * whole index surface, so a reader at any index version sees
    * mutually consistent families. Scale shape: one cached changeset
    * scan feeds three keyed hash-aggs (broadcast-argmax / row-local
    * tokenize / row-local native chunker); the apply join is
    * restricted to touched keys; the commit rewrites O(affected index
    * files) — nothing corpus-sized anywhere (the rebuild branch
    * exists only as this query's oracle).
    */
  val q197TriIndexMaintenance = NamedQuery(
    "q197_tri_index_maintenance",
    "One CDF -> one transactional index commit maintaining dense " +
      "IVF + lexical BM25 + chunk-store refcounts together; per-" +
      "family proof vs full rebuild (keys + both stats, zero " +
      "mismatches).",
    (s, d) => {
      val dir = Scratch.dir("triidx-corpus", d)
      val idx = Scratch.dir("triidx-index", d)
      val fsconf = s.sparkContext.hadoopConfiguration
      Seq(dir, idx).foreach { p0 =>
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(fsconf).delete(p, true)
      }
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val hist = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("text"), (col("doc_id") % 77L).as("vec_id"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
        .join(broadcast(emb), Seq("vec_id")).drop("vec_id")
      (0 until 2).foreach { i =>
        ManagedTable.merge(hist.filter(
            col("seq") >= i * 200 && col("seq") < (i + 1) * 200),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")),
          tag = s"m$i")
      }
      val spec = IndexMaintenance.CorpusSpec(
        keyCol = "k", textCol = "text", embCol = "embedding",
        centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")),
        deleteExpr = col("op") === "d",
        exceptColumns = Seq("seq", "op"))
      IndexMaintenance.bootstrap(s, dir, 1, spec, idx)
      IndexMaintenance.maintainTick(s, dir, 1, 2, spec, idx)
      val incr = IndexMaintenance.indexState(s, idx)
        .withColumnRenamed("a", "ia").withColumnRenamed("b", "ib")
      val reb = IndexMaintenance.buildAll(
          ManagedTable.readCurrent(s, dir, spec.deleteExpr,
            spec.exceptColumns, Some(2)), spec)
        .withColumnRenamed("a", "ra").withColumnRenamed("b", "rb")
      incr.join(reb, Seq("family", "key"), "full_outer")
        .groupBy("family")
        .agg(
          sum(when(col("ra").isNotNull, 1L).otherwise(0L)).as("n_keys"),
          sum(when(col("ia").isNull, 1L).otherwise(0L))
            .as("n_missing_incr"),
          sum(when(col("ra").isNull, 1L).otherwise(0L))
            .as("n_extra_incr"),
          sum(when(col("ia").isNotNull && col("ra").isNotNull &&
            col("ia") =!= col("ra"), 1L).otherwise(0L))
            .as("n_a_mismatch"),
          sum(when(col("ib").isNotNull && col("rb").isNotNull &&
            col("ib") =!= col("rb"), 1L).otherwise(0L))
            .as("n_b_mismatch"))
        .withColumn("agree", when(
          col("n_missing_incr") + col("n_extra_incr") +
            col("n_a_mismatch") + col("n_b_mismatch") === 0, 1L)
          .otherwise(0L))
        .orderBy("family")
    },
    Some(q197OracleSql))

  /** q199: STREAMING INDEX MAINTENANCE — q197's transactional tick
    * driven by the PRODUCTION transport: the same corpus changelog
    * arrives as a STREAM (file source, one merge-batch per micro-batch)
    * through [[graft.operators.IndexMaintenance.cdcStreamingSink]],
    * which merges each batch into the corpus and advances all three
    * index families in the same foreachBatch — bootstrap on the first
    * batch, O(changeset) ticks after, every step tag-idempotent across
    * crash replays. The query then proves the STREAMED index equal to
    * a full rebuild of the corpus head, per family — same output
    * contract and same oracle as q197, because the maintenance algebra
    * is transport-independent: if the streaming path dropped,
    * duplicated, or re-ordered a delta, a mismatch counter goes
    * non-zero and the hash breaks. Batch-vs-stream arrival order is
    * immaterial by construction (merge sequences by `seq`; ticks are
    * proven equal to rebuilds at every intermediate version), which is
    * exactly the property a production pipeline relies on when a
    * backfill races live traffic.
    */
  val q199StreamingIndexMaintenance = NamedQuery(
    "q199_streaming_index_maintenance",
    "q197's tri-index tick driven through the streaming CDC sink " +
      "(merge + bootstrap/tick per micro-batch, tag-idempotent); " +
      "streamed index proven equal to a full rebuild, per family.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = ManagedTable
      val root = Scratch.dir("stridx", d) + "/" +
        java.util.UUID.randomUUID().toString.take(8)
      val fsconf = s.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(fsconf).delete(p, true)
      val (corpus, idx) = (s"$root/corpus", s"$root/idx")
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val hist = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("text"), (col("doc_id") % 77L).as("vec_id"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
        .join(broadcast(emb), Seq("vec_id")).drop("vec_id")
      (0 until 2).foreach { i =>
        hist.filter(col("seq") >= i * 200 && col("seq") < (i + 1) * 200)
          .coalesce(1).write.mode("append").parquet(s"$root/in")
      }
      val spec = IndexMaintenance.CorpusSpec(
        keyCol = "k", textCol = "text", embCol = "embedding",
        centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")),
        deleteExpr = col("op") === "d",
        exceptColumns = Seq("seq", "op"))
      val q = IndexMaintenance.cdcStreamingSink(
          s.readStream.schema(hist.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
          corpus, idx, spec, keys = Seq("k"),
          sequenceBy = Seq(col("seq")))
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val head = M.versions(s, corpus).last
      val incr = IndexMaintenance.indexState(s, idx)
        .withColumnRenamed("a", "ia").withColumnRenamed("b", "ib")
      val reb = IndexMaintenance.buildAll(
          M.readCurrent(s, corpus, spec.deleteExpr,
            spec.exceptColumns, Some(head)), spec)
        .withColumnRenamed("a", "ra").withColumnRenamed("b", "rb")
      incr.join(reb, Seq("family", "key"), "full_outer")
        .groupBy("family")
        .agg(
          sum(when(col("ra").isNotNull, 1L).otherwise(0L)).as("n_keys"),
          sum(when(col("ia").isNull, 1L).otherwise(0L))
            .as("n_missing_incr"),
          sum(when(col("ra").isNull, 1L).otherwise(0L))
            .as("n_extra_incr"),
          sum(when(col("ia").isNotNull && col("ra").isNotNull &&
            col("ia") =!= col("ra"), 1L).otherwise(0L))
            .as("n_a_mismatch"),
          sum(when(col("ib").isNotNull && col("rb").isNotNull &&
            col("ib") =!= col("rb"), 1L).otherwise(0L))
            .as("n_b_mismatch"))
        .withColumn("agree", when(
          col("n_missing_incr") + col("n_extra_incr") +
            col("n_a_mismatch") + col("n_b_mismatch") === 0, 1L)
          .otherwise(0L))
        .orderBy("family")
    },
    Some(q197OracleSql))

  /** q200: CONSISTENT SERVING READS — the reader-side counterpart of
    * the transactional tick ([[graft.operators.IndexMaintenance
    * .consistentSnapshot]]). A serving system that separately grabs
    * "latest corpus" and "latest index" can straddle an in-flight
    * ingest step: the corpus head has advanced to v3 but the index
    * last ticked at v2, so retrieved documents and index stats
    * disagree. The query stages exactly that straddle (three merges,
    * ticks only through v2), pins the pair via the index head's own
    * tick-tag history, and proves per family that (a) the PINNED pair
    * is exactly consistent — index state equals a full rebuild of the
    * time-traveled corpus snapshot, zero mismatches — while (b) the
    * NAIVE head read diverges (non-zero diverging keys vs a rebuild of
    * the corpus head), i.e. the pin is not vacuous. Scale shape: the
    * pin itself is manifest-metadata work (one O(versions) driver-side
    * log scan per served query, never per row); the consistency proof
    * is this query's oracle branch, not the serving path.
    */
  val q200ConsistentRead = NamedQuery(
    "q200_consistent_read",
    "Reader pins a mutually consistent (corpus, index) snapshot pair " +
      "from the index tick-tag history mid-ingest; pinned pair proven " +
      "exactly consistent per family while the naive head read " +
      "diverges.",
    (s, d) => {
      val dir = Scratch.dir("consread-corpus", d)
      val idx = Scratch.dir("consread-index", d)
      val fsconf = s.sparkContext.hadoopConfiguration
      Seq(dir, idx).foreach { p0 =>
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(fsconf).delete(p, true)
      }
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val hist = Tables.documents(s, d).filter(col("doc_id") < 450)
        .select((col("doc_id") % 110L).as("k"), col("doc_id").as("seq"),
          col("text"), (col("doc_id") % 77L).as("vec_id"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
        .join(broadcast(emb), Seq("vec_id")).drop("vec_id")
      (0 until 3).foreach { i =>
        ManagedTable.merge(hist.filter(
            col("seq") >= i * 150 && col("seq") < (i + 1) * 150),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")),
          tag = s"m$i")
      }
      val spec = IndexMaintenance.CorpusSpec(
        keyCol = "k", textCol = "text", embCol = "embedding",
        centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")),
        deleteExpr = col("op") === "d",
        exceptColumns = Seq("seq", "op"))
      // ticks stop at v2 — version 3 is the in-flight ingest the
      // reader must NOT observe half-applied
      IndexMaintenance.bootstrap(s, dir, 1, spec, idx)
      IndexMaintenance.maintainTick(s, dir, 1, 2, spec, idx)
      val (snap, state, pv, _) =
        IndexMaintenance.consistentSnapshot(s, dir, idx, spec)
      val headV = ManagedTable.versions(s, dir).last
      val incr = state.select(col("family"), col("key"),
        col("a").as("ia"), col("b").as("ib"))
      val rebP = IndexMaintenance.buildAll(snap, spec)
        .select(col("family"), col("key"),
          col("a").as("ra"), col("b").as("rb"))
      val rebH = IndexMaintenance.buildAll(
          ManagedTable.readCurrent(s, dir, spec.deleteExpr,
            spec.exceptColumns, Some(headV)), spec)
        .select(col("family"), col("key"),
          col("a").as("ha"), col("b").as("hb"))
      incr.join(rebP, Seq("family", "key"), "full_outer")
        .join(rebH, Seq("family", "key"), "full_outer")
        .groupBy("family")
        .agg(
          sum(when(col("ra").isNotNull, 1L).otherwise(0L)).as("n_keys"),
          sum(when(
            coalesce(col("ia"), lit(-1L)) =!= coalesce(col("ra"), lit(-1L)) ||
            coalesce(col("ib"), lit(-1L)) =!= coalesce(col("rb"), lit(-1L)),
            1L).otherwise(0L)).as("n_pin_mismatch"),
          sum(when(
            coalesce(col("ia"), lit(-1L)) =!= coalesce(col("ha"), lit(-1L)) ||
            coalesce(col("ib"), lit(-1L)) =!= coalesce(col("hb"), lit(-1L)),
            1L).otherwise(0L)).as("n_naive_diverge"))
        .withColumn("consistent",
          when(col("n_pin_mismatch") === 0, 1L).otherwise(0L))
        .withColumn("pinned_v", lit(pv.toLong))
        .withColumn("head_v", lit(headV.toLong))
        .select("family", "n_keys", "n_pin_mismatch", "consistent",
          "n_naive_diverge", "pinned_v", "head_v")
        .orderBy("family")
    },
    Some(q200OracleSql))

  /** Dense-family SQL: frozen-centroid argmax of `src(k, embedding)`. */
  private def assignSql(src: String, out: String): String =
    s"""$out AS (SELECT k, cid FROM (SELECT s.k, c.cid,
       |    row_number() OVER (PARTITION BY s.k
       |      ORDER BY ${VectorQueries.cosFpSql("s.embedding", "c.cv")} DESC,
       |        c.cid ASC) rn FROM $src s, cent c) WHERE rn = 1)""".stripMargin

  /** Lexical-family SQL: per-term (df, total tf) of `src(k, text)`. */
  private def lexSql(src: String, out: String, dfC: String,
      tfC: String): String =
    s"""$out AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS $dfC,
       |    CAST(SUM(tf) AS BIGINT) AS $tfC FROM (
       |    SELECT k, term, COUNT(*) AS tf FROM (
       |      SELECT k, unnest(string_split(lower(text),' ')) AS term
       |      FROM $src) GROUP BY 1, 2) GROUP BY 1)""".stripMargin

  /** Chunk-family SQL: per-chunk refcounts of `src(doc_id, text)`. */
  private def refsSql(src: String, p: String, c: String): String =
    s"""${MultimodalQueries.cdcCtesSql(src, p)},
       |${p}refs AS (SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS $c
       |  FROM (SELECT DISTINCT doc_id, chunk_md5 FROM ${p}payload)
       |  GROUP BY 1)""".stripMargin

  /** One output row comparing `inc(key, ia, ib)` vs `reb(key, ra, rb)`. */
  private def cmpSql(family: String, inc: String, reb: String): String =
    s"""SELECT '$family' AS family,
       |  CAST(SUM(CASE WHEN ra IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_keys,
       |  CAST(SUM(CASE WHEN ia IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_missing_incr,
       |  CAST(SUM(CASE WHEN ra IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_extra_incr,
       |  CAST(SUM(CASE WHEN ia IS NOT NULL AND ra IS NOT NULL AND ia <> ra
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_a_mismatch,
       |  CAST(SUM(CASE WHEN ib IS NOT NULL AND rb IS NOT NULL AND ib <> rb
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_b_mismatch,
       |  CAST(CASE WHEN
       |      SUM(CASE WHEN ia IS NULL THEN 1 ELSE 0 END)
       |    + SUM(CASE WHEN ra IS NULL THEN 1 ELSE 0 END)
       |    + SUM(CASE WHEN ia IS NOT NULL AND ra IS NOT NULL AND ia <> ra
       |        THEN 1 ELSE 0 END)
       |    + SUM(CASE WHEN ib IS NOT NULL AND rb IS NOT NULL AND ib <> rb
       |        THEN 1 ELSE 0 END) = 0
       |    THEN 1 ELSE 0 END AS BIGINT) AS agree
       |FROM $inc FULL OUTER JOIN $reb USING (key)""".stripMargin

  private def q197OracleSql: String =
    s"""WITH h AS (SELECT d.doc_id % 150 AS k, d.doc_id AS seq, d.text,
       |    CASE WHEN d.doc_id % 7 = 0 THEN 'd' ELSE 'u' END op,
       |    e.embedding
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id % 77
       |  WHERE d.doc_id < 400),
       |s1 AS (SELECT k, text, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k
       |      ORDER BY seq DESC) rn FROM h WHERE seq < 200)
       |  WHERE rn = 1 AND op <> 'd'),
       |s2 AS (SELECT k, text, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k
       |      ORDER BY seq DESC) rn FROM h WHERE seq < 400)
       |  WHERE rn = 1 AND op <> 'd'),
       |j AS (SELECT coalesce(s1.k, s2.k) AS k,
       |    s1.text AS t1, s2.text AS t2,
       |    s1.embedding AS e1, s2.embedding AS e2,
       |    s1.k IS NOT NULL AS has1, s2.k IS NOT NULL AS has2
       |  FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k),
       |rem0 AS (SELECT k, t1 AS text, e1 AS embedding FROM j
       |  WHERE has1 AND (NOT has2 OR t1 IS DISTINCT FROM t2
       |    OR e1 IS DISTINCT FROM e2)),
       |add0 AS (SELECT k, t2 AS text, e2 AS embedding FROM j
       |  WHERE has2 AND (NOT has1 OR t1 IS DISTINCT FROM t2
       |    OR e1 IS DISTINCT FROM e2)),
       |cent AS (SELECT vec_id AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |${assignSql("s1", "da1")},
       |${assignSql("rem0", "dar")},
       |${assignSql("add0", "daa")},
       |${assignSql("s2", "da2")},
       |dn1 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS x1
       |  FROM da1 GROUP BY 1),
       |dnr AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS xr
       |  FROM dar GROUP BY 1),
       |dna AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS xa
       |  FROM daa GROUP BY 1),
       |dinc AS (SELECT CAST(cid AS VARCHAR) AS key,
       |    CAST(COALESCE(x1, 0) - COALESCE(xr, 0) + COALESCE(xa, 0)
       |      AS BIGINT) AS ia,
       |    CAST(0 AS BIGINT) AS ib
       |  FROM dn1 FULL OUTER JOIN dnr USING (cid)
       |    FULL OUTER JOIN dna USING (cid)
       |  WHERE COALESCE(x1, 0) - COALESCE(xr, 0) + COALESCE(xa, 0) > 0),
       |dreb AS (SELECT CAST(cid AS VARCHAR) AS key,
       |    CAST(COUNT(*) AS BIGINT) AS ra, CAST(0 AS BIGINT) AS rb
       |  FROM da2 GROUP BY 1),
       |${lexSql("s1", "lv1", "df1", "tf1")},
       |${lexSql("rem0", "lrm", "dfr", "tfr")},
       |${lexSql("add0", "lad", "dfa", "tfa")},
       |${lexSql("s2", "lrb", "df2", "tf2")},
       |linc AS (SELECT term AS key,
       |    CAST(COALESCE(df1, 0) - COALESCE(dfr, 0) + COALESCE(dfa, 0)
       |      AS BIGINT) AS ia,
       |    CAST(COALESCE(tf1, 0) - COALESCE(tfr, 0) + COALESCE(tfa, 0)
       |      AS BIGINT) AS ib
       |  FROM lv1 FULL OUTER JOIN lrm USING (term)
       |    FULL OUTER JOIN lad USING (term)
       |  WHERE COALESCE(df1, 0) - COALESCE(dfr, 0) + COALESCE(dfa, 0)
       |    > 0),
       |lreb AS (SELECT term AS key, df2 AS ra, tf2 AS rb FROM lrb),
       |cs1 AS (SELECT k AS doc_id, text FROM s1),
       |crm AS (SELECT k AS doc_id, text FROM rem0),
       |cad AS (SELECT k AS doc_id, text FROM add0),
       |cs2 AS (SELECT k AS doc_id, text FROM s2),
       |${refsSql("cs1", "v", "r1")},
       |${refsSql("crm", "r", "rr")},
       |${refsSql("cad", "a", "ra_")},
       |${refsSql("cs2", "b", "r2")},
       |cinc AS (SELECT chunk_md5 AS key,
       |    CAST(COALESCE(r1, 0) - COALESCE(rr, 0) + COALESCE(ra_, 0)
       |      AS BIGINT) AS ia,
       |    CAST(0 AS BIGINT) AS ib
       |  FROM vrefs FULL OUTER JOIN rrefs USING (chunk_md5)
       |    FULL OUTER JOIN arefs USING (chunk_md5)
       |  WHERE COALESCE(r1, 0) - COALESCE(rr, 0) + COALESCE(ra_, 0) > 0),
       |creb AS (SELECT chunk_md5 AS key, r2 AS ra,
       |    CAST(0 AS BIGINT) AS rb FROM brefs)
       |SELECT * FROM (
       |${cmpSql("chunk", "cinc", "creb")}
       |UNION ALL
       |${cmpSql("dense", "dinc", "dreb")}
       |UNION ALL
       |${cmpSql("lex", "linc", "lreb")})
       |ORDER BY family""".stripMargin

  /** One q200 output row: pinned-pair mismatches + naive-head
    * divergence for `inc(key, ia, ib)` vs `rebP(key, ra, rb)` vs
    * `rebH(key, ha, hb)`.
    */
  private def consRowSql(family: String, inc: String, rebP: String,
      rebH: String): String =
    s"""SELECT '$family' AS family,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $rebP) AS n_keys,
       |  (SELECT CAST(COUNT(*) AS BIGINT)
       |    FROM $inc i FULL OUTER JOIN $rebP r USING (key)
       |    WHERE COALESCE(i.ia, -1) <> COALESCE(r.ra, -1)
       |       OR COALESCE(i.ib, -1) <> COALESCE(r.rb, -1))
       |    AS n_pin_mismatch,
       |  (SELECT CAST(COUNT(*) AS BIGINT)
       |    FROM $inc i FULL OUTER JOIN $rebH hh USING (key)
       |    WHERE COALESCE(i.ia, -1) <> COALESCE(hh.ha, -1)
       |       OR COALESCE(i.ib, -1) <> COALESCE(hh.hb, -1))
       |    AS n_naive_diverge,
       |  CAST(2 AS BIGINT) AS pinned_v, CAST(3 AS BIGINT) AS head_v"""
      .stripMargin

  private def q200OracleSql: String =
    s"""WITH h AS (SELECT d.doc_id % 110 AS k, d.doc_id AS seq, d.text,
       |    CASE WHEN d.doc_id % 7 = 0 THEN 'd' ELSE 'u' END op,
       |    e.embedding
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id % 77
       |  WHERE d.doc_id < 450),
       |s1 AS (SELECT k, text, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k
       |      ORDER BY seq DESC) rn FROM h WHERE seq < 150)
       |  WHERE rn = 1 AND op <> 'd'),
       |s2 AS (SELECT k, text, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k
       |      ORDER BY seq DESC) rn FROM h WHERE seq < 300)
       |  WHERE rn = 1 AND op <> 'd'),
       |s3 AS (SELECT k, text, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k
       |      ORDER BY seq DESC) rn FROM h WHERE seq < 450)
       |  WHERE rn = 1 AND op <> 'd'),
       |j AS (SELECT coalesce(s1.k, s2.k) AS k,
       |    s1.text AS t1, s2.text AS t2,
       |    s1.embedding AS e1, s2.embedding AS e2,
       |    s1.k IS NOT NULL AS has1, s2.k IS NOT NULL AS has2
       |  FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k),
       |rem0 AS (SELECT k, t1 AS text, e1 AS embedding FROM j
       |  WHERE has1 AND (NOT has2 OR t1 IS DISTINCT FROM t2
       |    OR e1 IS DISTINCT FROM e2)),
       |add0 AS (SELECT k, t2 AS text, e2 AS embedding FROM j
       |  WHERE has2 AND (NOT has1 OR t1 IS DISTINCT FROM t2
       |    OR e1 IS DISTINCT FROM e2)),
       |cent AS (SELECT vec_id AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |${assignSql("s1", "da1")},
       |${assignSql("rem0", "dar")},
       |${assignSql("add0", "daa")},
       |${assignSql("s2", "da2")},
       |${assignSql("s3", "da3")},
       |dn1 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS x1
       |  FROM da1 GROUP BY 1),
       |dnr AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS xr
       |  FROM dar GROUP BY 1),
       |dna AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS xa
       |  FROM daa GROUP BY 1),
       |dinc AS (SELECT CAST(cid AS VARCHAR) AS key,
       |    CAST(COALESCE(x1, 0) - COALESCE(xr, 0) + COALESCE(xa, 0)
       |      AS BIGINT) AS ia,
       |    CAST(0 AS BIGINT) AS ib
       |  FROM dn1 FULL OUTER JOIN dnr USING (cid)
       |    FULL OUTER JOIN dna USING (cid)
       |  WHERE COALESCE(x1, 0) - COALESCE(xr, 0) + COALESCE(xa, 0) > 0),
       |drebp AS (SELECT CAST(cid AS VARCHAR) AS key,
       |    CAST(COUNT(*) AS BIGINT) AS ra, CAST(0 AS BIGINT) AS rb
       |  FROM da2 GROUP BY 1),
       |drebh AS (SELECT CAST(cid AS VARCHAR) AS key,
       |    CAST(COUNT(*) AS BIGINT) AS ha, CAST(0 AS BIGINT) AS hb
       |  FROM da3 GROUP BY 1),
       |${lexSql("s1", "lv1", "df1", "tf1")},
       |${lexSql("rem0", "lrm", "dfr", "tfr")},
       |${lexSql("add0", "lad", "dfa", "tfa")},
       |${lexSql("s2", "lp", "dfp", "tfp")},
       |${lexSql("s3", "lh", "dfh", "tfh")},
       |linc AS (SELECT term AS key,
       |    CAST(COALESCE(df1, 0) - COALESCE(dfr, 0) + COALESCE(dfa, 0)
       |      AS BIGINT) AS ia,
       |    CAST(COALESCE(tf1, 0) - COALESCE(tfr, 0) + COALESCE(tfa, 0)
       |      AS BIGINT) AS ib
       |  FROM lv1 FULL OUTER JOIN lrm USING (term)
       |    FULL OUTER JOIN lad USING (term)
       |  WHERE COALESCE(df1, 0) - COALESCE(dfr, 0) + COALESCE(dfa, 0)
       |    > 0),
       |lrebp AS (SELECT term AS key, dfp AS ra, tfp AS rb FROM lp),
       |lrebh AS (SELECT term AS key, dfh AS ha, tfh AS hb FROM lh),
       |cs1 AS (SELECT k AS doc_id, text FROM s1),
       |crm AS (SELECT k AS doc_id, text FROM rem0),
       |cad AS (SELECT k AS doc_id, text FROM add0),
       |cs2 AS (SELECT k AS doc_id, text FROM s2),
       |cs3 AS (SELECT k AS doc_id, text FROM s3),
       |${refsSql("cs1", "v", "r1")},
       |${refsSql("crm", "r", "rr")},
       |${refsSql("cad", "a", "ra_")},
       |${refsSql("cs2", "b", "r2")},
       |${refsSql("cs3", "w", "rh")},
       |cinc AS (SELECT chunk_md5 AS key,
       |    CAST(COALESCE(r1, 0) - COALESCE(rr, 0) + COALESCE(ra_, 0)
       |      AS BIGINT) AS ia,
       |    CAST(0 AS BIGINT) AS ib
       |  FROM vrefs FULL OUTER JOIN rrefs USING (chunk_md5)
       |    FULL OUTER JOIN arefs USING (chunk_md5)
       |  WHERE COALESCE(r1, 0) - COALESCE(rr, 0) + COALESCE(ra_, 0) > 0),
       |crebp AS (SELECT chunk_md5 AS key, r2 AS ra,
       |    CAST(0 AS BIGINT) AS rb FROM brefs),
       |crebh AS (SELECT chunk_md5 AS key, rh AS ha,
       |    CAST(0 AS BIGINT) AS hb FROM wrefs)
       |SELECT family, n_keys, n_pin_mismatch,
       |  CAST(CASE WHEN n_pin_mismatch = 0 THEN 1 ELSE 0 END AS BIGINT)
       |    AS consistent,
       |  n_naive_diverge, pinned_v, head_v
       |FROM (
       |${consRowSql("chunk", "cinc", "crebp", "crebh")}
       |UNION ALL
       |${consRowSql("dense", "dinc", "drebp", "drebh")}
       |UNION ALL
       |${consRowSql("lex", "linc", "lrebp", "lrebh")})
       |ORDER BY family""".stripMargin

  /** q232: LIVE-FEED LEXICAL INDEX MAINTENANCE — the consumer the
    * streaming change feed (q231) exists FOR. q192/q197/q199 maintain
    * indexes from the BATCH change feed (re-derived per tick between
    * two pinned versions); here the maintainer is a standing
    * `readStream.option("readChangeFeed")` subscription: each
    * micro-batch (one corpus version, `maxVersionsPerTrigger 1`)
    * retracts the delete preimages' per-term contributions and adds
    * the inserts', then merges the touched terms into a
    * merge-maintained index table — tag-idempotent per batch, state
    * restricted to touched keys so each tick shuffles O(changeset
    * tokens), never the index or the corpus. The corpus history
    * exercises every feed-representable op: two appends, a bulk
    * deleteWhere (DV preimages through the positional reader), and a
    * replaceWhere (delete+insert under one version — the signed
    * algebra nets it to an update). The ORACLE is the strongest form
    * of "incremental equals rebuild": the final index STATE itself,
    * hash-compared against an independent engine's full rebuild of
    * the final corpus text.
    */
  val q232LiveFeedLexicalIndex = NamedQuery(
    "q232_live_feed_lexical_index",
    "readChangeFeed-driven incremental lexical index: per-batch " +
      "term retractions/additions merged per version; final df/tf " +
      "state hash-equal to an independent full rebuild.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = ManagedTable
      val root = Scratch.dir("livelex", d) + "/" +
        java.util.UUID.randomUUID().toString.take(8)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val (corpus, idx) = (s"$root/corpus", s"$root/idx")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        .select("doc_id", "text")
      M.appendCommit(docs.filter(col("doc_id") < 150), corpus)  // v1
      M.appendCommit(docs.filter(col("doc_id") >= 150), corpus) // v2
      M.deleteWhere(s, corpus, col("doc_id") % 6 === 0)         // v3
      M.replaceWhere(s, corpus,                                 // v4
        col("doc_id") >= 210 && col("doc_id") < 230,
        docs.filter(col("doc_id") >= 210 && col("doc_id") < 230 &&
            col("doc_id") % 6 =!= 0)
          .withColumn("text", concat(col("text"), lit(" graftmark"))))
      // per-term (df, total tf) contribution of a doc set
      def stats(rows: org.apache.spark.sql.DataFrame, dfC: String,
          tfC: String) = rows
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .groupBy("term")
        .agg(count(lit(1)).as(dfC), sum("tf").as(tfC))
      val q = s.readStream.format("graft")
        .option("readChangeFeed", "true")
        // 2 versions per tick: still a genuinely incremental two-tick
        // run (appends tick, then delete+replace tick) at half the
        // merge-commit overhead of one-tick-per-version
        .option("maxVersionsPerTrigger", 2)
        .load(corpus)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val bs = b.sparkSession
            val add = stats(
              b.filter(col("_change_type") === "insert"), "adf", "atf")
            val sub = stats(
              b.filter(col("_change_type") === "delete"), "sdf", "stf")
            val delta = add.join(sub, Seq("term"), "full_outer")
              .select(col("term"),
                (coalesce(col("adf"), lit(0L)) -
                  coalesce(col("sdf"), lit(0L))).as("ddf"),
                (coalesce(col("atf"), lit(0L)) -
                  coalesce(col("stf"), lit(0L))).as("dtf"))
              .filter(col("ddf") =!= 0L || col("dtf") =!= 0L)
            // state restricted to touched terms BEFORE the apply join:
            // the tick shuffles O(changeset), never the index
            val cur =
              if (M.versions(bs, idx).isEmpty) null
              else M.readCurrent(bs, idx, col("op") === "d",
                  Seq("seq", "op"))
                .join(delta.select("term"), Seq("term"), "left_semi")
                .withColumnRenamed("df", "cdf")
                .withColumnRenamed("tf", "ctf")
            val applied =
              if (cur == null) delta.select(col("term"),
                col("ddf").as("df"), col("dtf").as("tf"))
              else delta.join(cur, Seq("term"), "left_outer")
                .select(col("term"),
                  (coalesce(col("cdf"), lit(0L)) + col("ddf")).as("df"),
                  (coalesce(col("ctf"), lit(0L)) + col("dtf")).as("tf"))
            val changes = applied
              .withColumn("seq", lit(batchId))
              .withColumn("op",
                when(col("df") <= 0L, lit("d")).otherwise(lit("u")))
            M.merge(changes, idx, keys = Seq("term"),
              sequenceBy = Seq(col("seq")), tag = s"b$batchId")
            ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      M.readCurrent(s, idx, col("op") === "d", Seq("seq", "op"))
        .orderBy("term")
    },
    Some("""WITH corpus AS (SELECT doc_id,
           |    CASE WHEN doc_id >= 210 AND doc_id < 230
           |      THEN text || ' graftmark' ELSE text END AS text
           |  FROM documents WHERE doc_id < 300 AND doc_id % 6 <> 0),
           |g AS (SELECT doc_id, term, COUNT(*) AS tf FROM (
           |    SELECT doc_id,
           |      unnest(string_split(lower(text), ' ')) AS term
           |    FROM corpus) GROUP BY 1, 2)
           |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           |  CAST(SUM(tf) AS BIGINT) AS tf
           |FROM g GROUP BY term ORDER BY term""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(q197TriIndexMaintenance, q199StreamingIndexMaintenance,
      q200ConsistentRead, q232LiveFeedLexicalIndex)
}
