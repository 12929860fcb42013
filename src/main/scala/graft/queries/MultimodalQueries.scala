package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}

/** Binary-column (multimodal) plumbing exercised through the oracle: the
  * documents' text bytes stand in for media blobs. The codegen'd relational
  * features (byte length, head bytes hex, digest) are oracle-checked; the
  * decoder path (mapPartitions + stubbed codec) is exercised in ScalaTest
  * (see MultimodalSpec) since a partition-mapped JVM function has no ANSI
  * SQL equivalent.
  */
object MultimodalQueries {

  val q25BinaryFeatures = NamedQuery(
    "q25_binary_features",
    "Opaque-binary column feature extraction: cast text→blob, byte length, " +
      "head-bytes hex fingerprint, digest — all row-local, pushdown-safe.",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .select(
          col("doc_id"),
          octet_length(col("blob")).cast("long").as("n_bytes"),
          lower(hex(substring(col("text"), 1, 8))).as("head_hex"),
          md5(col("text")).as("digest"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
           |  lower(hex(substring(text, 1, 8))) AS head_hex,
           |  md5(text) AS digest
           |FROM documents
           |ORDER BY doc_id""".stripMargin))

  private val FrameBytes = 32 // bytes per sampled "frame"
  private val StrideBytes = 64 // sampling stride (every 2nd frame-width)

  /** q97: strided frame sampling over opaque binary blobs — the Spark
    * side of video/audio frame extraction: slice fixed-width byte
    * windows at a stride from a `binary` column, emit per-frame
    * identity (digest) and bytes, all row-local (`transform(sequence)`
    * + `posexplode`, zero shuffle until the output sort). The real
    * decoder stays a stubbed `mapPartitions` codec (MultimodalSpec) —
    * THIS query pins the sampling math and the blob-slicing plumbing
    * that feeds it, oracle-checked: the blobs are ASCII text bytes, so
    * DuckDB replays the same slices as string windows. Frame count =
    * (n − frame) div stride + 1 — integer math, no boundary drift.
    */
  val q97FrameSample = NamedQuery(
    "q97_frame_sample",
    s"Strided frame sampling over binary blobs ($FrameBytes-byte " +
      s"frames every $StrideBytes bytes): per-frame digest + bytes, " +
      "row-local slicing.",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .withColumn("n_bytes", octet_length(col("blob")).cast("long"))
        .filter(col("n_bytes") >= FrameBytes)
        .withColumn("frame",
          expr(s"""explode(transform(
            sequence(0L, (n_bytes - $FrameBytes) div $StrideBytes),
            i -> struct(i AS frame_idx,
              substring(blob, cast(i * $StrideBytes + 1 AS int),
                $FrameBytes) AS fb)))"""))
        .select(col("doc_id"), col("frame.frame_idx").as("frame_idx"),
          md5(col("frame.fb")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx"),
    Some(s"""SELECT doc_id, i AS frame_idx,
            |  md5(substring(text, CAST(i * $StrideBytes + 1 AS INT),
            |    $FrameBytes)) AS frame_md5
            |FROM (SELECT doc_id, text,
            |    CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes
            |  FROM documents WHERE octet_length(text::BLOB) >= $FrameBytes),
            |  unnest(range(0, (n_bytes - $FrameBytes) // $StrideBytes + 1))
            |    AS t(i)
            |ORDER BY doc_id, frame_idx""".stripMargin))

  /** DuckDB rendering of hash60(expr) (same as TextQueries.h60). */
  private def h60(e: String): String =
    s"('0x'||substring(md5($e),1,15))::BIGINT"

  private[graft] val CdcWin = 8 // rolling-window width for boundary detection
  private[graft] val CdcMod = 64 // boundary divisor ⇒ ~64-byte expected chunks

  /** The per-byte rolling-boundary cut array, HOF reference form: the
    * DEFINITION of the CDC boundary rule (bit-identical to the oracle
    * SQL), kept for cross-checking the native expression that actually
    * runs ([[graft.functions.NativeExpressions.CdcCuts]] — an
    * interpreted per-byte expression tree made q188/q189 the two most
    * expensive non-iterative queries; the one-digest-loop-per-row
    * kernel is the same ~100× class of win as SimHash's). Expects
    * columns `text` and `n`; MultimodalSpec asserts equality on the
    * real corpus.
    */
  private[graft] def cdcCutsHof: org.apache.spark.sql.Column = {
    // BYTE-domain reference, matching the native kernel for all
    // inputs: the window is sliced from the UTF-8 bytes (substring
    // over the binary cast), never from the character-indexed string
    val h = s"CAST(conv(substring(md5(substring(CAST(text AS BINARY), " +
      s"CAST(e - ${CdcWin - 1} AS INT), $CdcWin)), 1, 15), 16, 10) AS BIGINT)"
    expr(s"""array_sort(array_distinct(concat(
      filter(transform(sequence(CAST($CdcWin AS BIGINT), n),
        e -> CASE WHEN $h % $CdcMod = 0 THEN e END),
        x -> x IS NOT NULL),
      array(n))))""")
  }

  /** Content-defined chunk table of `df(doc_id, text, …)`: one row per
    * chunk, `(doc_id, len, chunk_md5)` — q188's derivation, shared
    * with the q189 delta-sync experiment and q191 near-dup. Boundaries
    * after byte `e` whenever hash60 of the [[CdcWin]]-byte window
    * ending at `e` ≡ 0 mod [[CdcMod]]; entirely row-local (the native
    * [[graft.functions.NativeExpressions.CdcCuts]] boundary pass +
    * one posexplode).
    */
  private[graft] def cdcChunkTable(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.operators.Chunker.cdcChunks(df, "doc_id", "text", CdcWin, CdcMod)

  /** Fixed-size chunk table (64-byte blocks) of `df(doc_id, text, …)`:
    * the strawman q189 compares CDC against — block k covers bytes
    * [k·64+1, k·64+64], last block short.
    */
  private def fixedChunkTable(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.withColumn("n", octet_length(col("text").cast("binary")).cast("long"))
      .filter(col("n") >= CdcWin)
      .select(col("text"),
        posexplode(expr("sequence(CAST(0 AS BIGINT), (n - 1) div 64)"))
          .as(Seq("p", "k")),
        col("n"))
      .select(least(lit(64L), col("n") - col("k") * 64).as("len"),
        md5(expr("substring(text, CAST(k * 64 + 1 AS INT), 64)"))
          .as("chunk_md5"))

  /** DuckDB CTEs for [[cdcChunkTable]] over a source CTE
    * `src(doc_id, text)`: emits `<p>base`, `<p>bounds`, `<p>cuts`,
    * `<p>payload(doc_id, len, chunk_md5)` with the given prefix.
    *
    * ASCII-exact only: the Spark side is byte-domain end to end, but
    * DuckDB 1.0 has no BLOB substring/md5, so this fragment slices the
    * VARCHAR — identical digests whenever byte index == character
    * index, i.e. pure-ASCII text, which the synthetic corpora are. The
    * byte-domain definition is cross-checked for non-ASCII inputs by
    * the Spark-side property specs instead (CdcCutsPropertySpec /
    * ChunkerSpec).
    */
  private[queries] def cdcCtesSql(src: String, p: String): String =
    s"""${p}base AS (SELECT doc_id, text,
       |    CAST(octet_length(text::BLOB) AS BIGINT) AS n
       |  FROM $src WHERE octet_length(text::BLOB) >= $CdcWin),
       |${p}bounds AS (SELECT doc_id, e FROM ${p}base,
       |    unnest(range($CdcWin, n + 1)) AS t(e)
       |  WHERE ${h60(s"substring(text, CAST(e - ${CdcWin - 1} AS INT), $CdcWin)")}
       |    % $CdcMod = 0
       |  UNION SELECT doc_id, n FROM ${p}base),
       |${p}cuts AS (SELECT doc_id,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0)
       |      AS prev, e AS cut
       |  FROM ${p}bounds),
       |${p}payload AS (SELECT c.doc_id, cut - prev AS len,
       |    md5(substring(t.text, CAST(prev + 1 AS INT),
       |      CAST(cut - prev AS INT))) AS chunk_md5
       |  FROM ${p}cuts c JOIN ${p}base t USING (doc_id))""".stripMargin

  /** DuckDB CTEs for [[fixedChunkTable]] over `src(doc_id, text)`. */
  private def fixedCtesSql(src: String, p: String): String =
    s"""${p}payload AS (SELECT doc_id,
       |    CAST(least(64, n - k * 64) AS BIGINT) AS len,
       |    md5(substring(text, CAST(k * 64 + 1 AS INT), 64)) AS chunk_md5
       |  FROM (SELECT doc_id, text,
       |      CAST(octet_length(text::BLOB) AS BIGINT) AS n
       |    FROM $src WHERE octet_length(text::BLOB) >= $CdcWin),
       |    unnest(range(0, (n - 1) // 64 + 1)) AS t(k))""".stripMargin

  /** q188: CONTENT-DEFINED CHUNKING + storage dedup — the rsync/LBFS
    * primitive object stores and artifact caches use to deduplicate
    * binary payloads WITHOUT any format knowledge: a chunk boundary
    * falls after byte `e` whenever hash60 of the $CdcWin-byte window
    * ending at `e` ≡ 0 (mod $CdcMod), so boundaries are a pure
    * function of LOCAL content — an insertion re-chunks only its
    * neighborhood while every downstream chunk's identity survives
    * (fixed-size blocks would shift-invalidate all of them; Muthitacharoen
    * et al., LBFS SOSP'01). The query chunks every blob, then audits
    * the corpus-level dedup win: distinct-chunk bytes vs total bytes.
    * Scale shape: the per-byte rolling hash and the chunk slicing are
    * entirely row-local (transform/filter HOFs + one posexplode — the
    * blob never leaves its scan task); only (chunk_md5, len) pairs
    * shuffle into the two keyed aggs, so network cost is metadata-
    * scale, never payload-scale. Blobs are the documents' text bytes
    * (q97's convention) so the oracle replays identical windows as
    * string slices.
    */
  val q188ContentChunks = NamedQuery(
    "q188_content_chunks",
    s"Content-defined chunking (hash60 of $CdcWin-byte windows mod " +
      s"$CdcMod) + corpus dedup audit: distinct-chunk bytes vs total, " +
      "row-local boundaries, metadata-scale shuffles.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val chunks = cdcChunkTable(docs)
      val nm = docs
        .filter(octet_length(col("text").cast("binary")) >= CdcWin)
        .agg(count(lit(1)).as("n_media"))
      val tot = chunks.agg(count(lit(1)).as("n_chunks"),
        sum("len").as("total_bytes"))
      val dst = chunks.groupBy("chunk_md5").agg(max("len").as("len"))
        .agg(count(lit(1)).as("n_distinct"),
          sum("len").as("distinct_bytes"))
      nm.crossJoin(broadcast(tot)).crossJoin(broadcast(dst))
        // DECIMAL(38,0): corpus bytes (1e14 at 100 TB) * 1e6 clears
        // BIGINT — the q167 discipline for every byte-sum fp6 ratio
        .withColumn("dedup_fp",
          expr("CAST((CAST(distinct_bytes AS DECIMAL(38,0)) * 1000000)" +
            " div total_bytes AS BIGINT)"))
        .withColumn("mean_chunk_bytes", expr("total_bytes div n_chunks"))
        .select("n_media", "n_chunks", "total_bytes", "n_distinct",
          "distinct_bytes", "dedup_fp", "mean_chunk_bytes")
    },
    Some(s"""WITH ${cdcCtesSql("documents", "")},
            |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_media FROM base),
            |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
            |    CAST(SUM(len) AS BIGINT) AS total_bytes FROM payload),
            |dst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
            |    CAST(SUM(len) AS BIGINT) AS distinct_bytes FROM
            |    (SELECT chunk_md5, MAX(len) AS len FROM payload
            |     GROUP BY 1))
            |SELECT n_media, n_chunks, total_bytes, n_distinct,
            |  distinct_bytes,
            |  CAST((distinct_bytes::HUGEINT * 1000000) // total_bytes
            |    AS BIGINT) AS dedup_fp,
            |  CAST(total_bytes // n_chunks AS BIGINT) AS mean_chunk_bytes
            |FROM nm, tot, dst""".stripMargin))

  private val Win = 8 // signature byte-window width
  private val Stp = 4 // window stride (overlapping: each byte in 2 windows)

  /** q160: CODEC-FREE MULTIMODAL NEAR-DUP — perceptual-hash-style
    * dedup over the binary payload ITSELF, no decoder: 60-bit SimHash
    * of overlapping byte windows ([[graft.multimodal.Multimodal
    * .byteSimhash]], window 8 stride 4 — a localized byte edit
    * perturbs ≤2 windows, so re-encoded/trivially-edited media stays
    * within a few Hamming bits), then the SAME banded Hamming join the
    * text tier uses ([[graft.operators.TextDedup.hammingNearDups]],
    * 6 chunks × 10 bits ⇒ all pairs with hamming ≤ 5 by pigeonhole).
    * Scale shape: signature extraction is row-local on the scan; the
    * join shuffles only (chunk, chunk_val) longs — the blobs
    * themselves never shuffle. Blobs are ASCII text bytes here so the
    * oracle replays the identical windows as string slices (q97's
    * convention).
    */
  val q160MediaNearDup = NamedQuery(
    "q160_media_neardup",
    "Codec-free media near-dup: byte-window SimHash signature + banded " +
      "Hamming self-join (≤5 bits) over opaque binary blobs — " +
      "perceptual dedup with no decoder dependency.",
    (s, d) => {
      val sigs = Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .filter(octet_length(col("blob")) >= Win)
        .select(col("doc_id"),
          graft.multimodal.Multimodal.byteSimhash(col("blob"), Win, Stp)
            .as("sig"))
      graft.operators.TextDedup.hammingNearDups(sigs, "doc_id", "sig", 5)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH wins AS (SELECT doc_id,
            |    substring(text, CAST(i*$Stp+1 AS INT), $Win) AS tok
            |  FROM (SELECT doc_id, text,
            |      CAST(octet_length(text::BLOB) AS BIGINT) AS n
            |    FROM documents WHERE octet_length(text::BLOB) >= $Win),
            |    unnest(range(0, (n-$Win)//$Stp + 1)) AS t(i)),
            |bits AS (SELECT doc_id, b,
            |    sum(CASE WHEN (${h60("tok")} >> b) & 1 = 1
            |      THEN 1 ELSE -1 END) AS s
            |  FROM wins, unnest(range(0,60)) AS t(b) GROUP BY doc_id, b),
            |sim AS (SELECT doc_id,
            |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
            |      AS BIGINT) AS sh
            |  FROM bits GROUP BY doc_id),
            |chunks AS (SELECT doc_id, sh, c, (sh >> (c*10)) & 1023 AS cv
            |  FROM sim, unnest(range(0,6)) AS t(c)),
            |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            |  FROM chunks a JOIN chunks b
            |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
            |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 5
            |ORDER BY id_a, id_b""".stripMargin))

  /** q173: MEDIA INTEGRITY AUDIT — the ingest-time QA sweep a media
    * corpus runs before any decode is attempted: sniff the container
    * MAGIC BYTES against the declared format and reconcile payload
    * size against the manifest's declared size, emitting a per-(format,
    * status) census. The fixture synthesizes a deterministic manifest
    * from `documents` (declared format = doc_id mod 3; every 17th doc
    * gets the WRONG container's header — a transcoding mixup; every
    * 23rd a size drift — a truncated upload), so statuses VARY and the
    * oracle checks detection, not a constant. All checks are row-local
    * codegen'd byte/string ops on the blob head (`hex` + prefix
    * compare — the blob itself is never shuffled, and at 100 TB the
    * magic check reads only parquet pages of the head slice);
    * the census is one hash-agg. `bad_magic` outranks `bad_size`
    * (a mislabeled container makes its size reconciliation moot).
    */
  val q173MediaIntegrity = NamedQuery(
    "q173_media_integrity",
    "Media integrity audit: magic-byte sniff vs declared format + " +
      "size reconciliation over opaque blobs, per-(format,status) " +
      "census — row-local checks, one hash-agg.",
    (s, d) => {
      val hdr = Map(0 -> "89504e470d0a1a0a", 1 -> "ffd8ffe0",
        2 -> "52494646") // png / jpeg / riff-wav container magics
      val name = Map(0 -> "png", 1 -> "jpeg", 2 -> "wav")
      val m = Tables.documents(s, d)
        .withColumn("fmt_id", (col("doc_id") % 3).cast("int"))
        .withColumn("written_id", // every 17th doc: wrong container
          when(col("doc_id") % 17 === 0, (col("fmt_id") + 1) % 3)
            .otherwise(col("fmt_id")))
        .withColumn("declared_format",
          element_at(map(name.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }.toSeq: _*), col("fmt_id")))
        .withColumn("hdr_hex",
          element_at(map(hdr.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }.toSeq: _*), col("written_id")))
        .withColumn("expected_hex",
          element_at(map(hdr.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }.toSeq: _*), col("fmt_id")))
        .withColumn("blob",
          concat(unhex(col("hdr_hex")), col("text").cast("binary")))
        .withColumn("declared_bytes", // every 23rd doc: size drift
          octet_length(col("blob")).cast("long") +
            when(col("doc_id") % 23 === 0, 7L).otherwise(0L))
      m.withColumn("status",
          when(substring(lower(hex(col("blob"))), lit(1),
            length(col("expected_hex")).cast("int")) =!=
            col("expected_hex"), "bad_magic")
            .when(octet_length(col("blob")).cast("long") =!=
              col("declared_bytes"), "bad_size")
            .otherwise("ok"))
        .groupBy("declared_format", "status")
        .agg(count(lit(1)).as("n"),
          sum(octet_length(col("blob")).cast("long")).as("sum_bytes"))
        .orderBy("declared_format", "status")
    },
    Some("""WITH m AS (SELECT doc_id, text,
           |    CAST(doc_id % 3 AS INT) AS fmt_id,
           |    CAST(CASE WHEN doc_id % 17 = 0 THEN (doc_id % 3 + 1) % 3
           |      ELSE doc_id % 3 END AS INT) AS written_id
           |  FROM documents),
           |h AS (SELECT *,
           |    CASE fmt_id WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
           |      ELSE 'wav' END AS declared_format,
           |    CASE written_id WHEN 0 THEN '89504e470d0a1a0a'
           |      WHEN 1 THEN 'ffd8ffe0' ELSE '52494646' END AS hdr_hex,
           |    CASE fmt_id WHEN 0 THEN '89504e470d0a1a0a'
           |      WHEN 1 THEN 'ffd8ffe0' ELSE '52494646' END
           |      AS expected_hex
           |  FROM m),
           |b AS (SELECT *, unhex(hdr_hex) || text::BLOB AS blob FROM h),
           |c AS (SELECT *,
           |    CAST(octet_length(blob) AS BIGINT) +
           |      CASE WHEN doc_id % 23 = 0 THEN 7 ELSE 0 END
           |      AS declared_bytes
           |  FROM b),
           |st AS (SELECT declared_format,
           |    CASE
           |      WHEN substring(lower(hex(blob)), 1,
           |        CAST(length(expected_hex) AS INT)) <> expected_hex
           |        THEN 'bad_magic'
           |      WHEN CAST(octet_length(blob) AS BIGINT) <> declared_bytes
           |        THEN 'bad_size'
           |      ELSE 'ok' END AS status,
           |    CAST(octet_length(blob) AS BIGINT) AS nb
           |  FROM c)
           |SELECT declared_format, status, COUNT(*) AS n,
           |  CAST(SUM(nb) AS BIGINT) AS sum_bytes
           |FROM st GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** q189: DELTA-SYNC EXPERIMENT — measures the property q188's
    * chunker exists for: after a small INSERTION edit (5 bytes spliced
    * into every 5th blob at offset 10), how many bytes must a chunk
    * store actually ingest? Content-defined boundaries re-synchronize
    * at the next boundary after the edit, so only the edited
    * neighborhood's chunks are new; fixed 64-byte blocks shift-
    * invalidate EVERY block downstream of the splice, so nearly the
    * whole edited blob re-uploads. `advantage_fp` = fixed-delta bytes
    * / CDC-delta bytes (fp6) — the rsync/LBFS win, quantified on this
    * corpus. Scale shape: both chunkers are row-local; the old-store
    * anti-joins are equi-joins on chunk_md5 carrying (md5, len) pairs
    * only — at 100 TB this is exactly an incremental backup planner's
    * shape (metadata joins, no payload movement).
    */
  val q189ChunkDeltaSync = NamedQuery(
    "q189_chunk_delta_sync",
    "Delta-sync audit: bytes a chunk store ingests after 5-byte " +
      "insertions — content-defined boundaries resync (local damage) " +
      "vs fixed blocks (shift-invalidated tails); advantage_fp wins.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val edited = docs.withColumn("text", expr(
        "CASE WHEN doc_id % 5 = 0 THEN substring(text, 1, 10) || " +
          "'edit ' || substring(text, 11) ELSE text END"))
      def delta(neu: org.apache.spark.sql.DataFrame,
          old: org.apache.spark.sql.DataFrame, p: String) =
        neu.join(old.select("chunk_md5").distinct(),
            Seq("chunk_md5"), "left_anti")
          .agg(count(lit(1)).as(s"${p}_delta_chunks"),
            coalesce(sum("len"), lit(0L)).as(s"${p}_delta_bytes"))
      val cd = delta(cdcChunkTable(edited), cdcChunkTable(docs), "cdc")
      val fd = delta(fixedChunkTable(edited), fixedChunkTable(docs), "fixed")
      val ne = docs.filter(col("doc_id") % 5 === 0 &&
          octet_length(col("text").cast("binary")) >= CdcWin)
        .agg(count(lit(1)).as("n_edited"))
      ne.crossJoin(broadcast(cd)).crossJoin(broadcast(fd))
        .withColumn("advantage_fp", expr( // delta bytes are corpus-scaled
          "CAST((CAST(fixed_delta_bytes AS DECIMAL(38,0)) * 1000000) div " +
            "greatest(cdc_delta_bytes, 1) AS BIGINT)"))
        .select("n_edited", "cdc_delta_chunks", "cdc_delta_bytes",
          "fixed_delta_chunks", "fixed_delta_bytes", "advantage_fp")
    },
    Some(s"""WITH ed AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
            |    THEN substring(text, 1, 10) || 'edit ' || substring(text, 11)
            |    ELSE text END AS text FROM documents),
            |${cdcCtesSql("documents", "o")},
            |${cdcCtesSql("ed", "e")},
            |${fixedCtesSql("documents", "fo")},
            |${fixedCtesSql("ed", "fe")},
            |cd AS (SELECT CAST(COUNT(*) AS BIGINT) AS cdc_delta_chunks,
            |    CAST(COALESCE(SUM(len), 0) AS BIGINT) AS cdc_delta_bytes
            |  FROM epayload ep WHERE NOT EXISTS (SELECT 1 FROM
            |    (SELECT DISTINCT chunk_md5 FROM opayload) o
            |    WHERE o.chunk_md5 = ep.chunk_md5)),
            |fd AS (SELECT CAST(COUNT(*) AS BIGINT) AS fixed_delta_chunks,
            |    CAST(COALESCE(SUM(len), 0) AS BIGINT) AS fixed_delta_bytes
            |  FROM fepayload fp WHERE NOT EXISTS (SELECT 1 FROM
            |    (SELECT DISTINCT chunk_md5 FROM fopayload) o
            |    WHERE o.chunk_md5 = fp.chunk_md5)),
            |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edited
            |  FROM documents WHERE doc_id % 5 = 0
            |    AND octet_length(text::BLOB) >= $CdcWin)
            |SELECT n_edited, cdc_delta_chunks, cdc_delta_bytes,
            |  fixed_delta_chunks, fixed_delta_bytes,
            |  CAST((fixed_delta_bytes::HUGEINT * 1000000)
            |    // greatest(cdc_delta_bytes, 1) AS BIGINT) AS advantage_fp
            |FROM ne, cd, fd""".stripMargin))

  private val MaxChunkDf = 16 // boilerplate cap: chunks in > this many docs don't pair

  /** q191: CDC-CHUNK NEAR-DUP — a THIRD near-dup modality alongside
    * token shingles (q14 MinHash) and byte SimHash (q160): two blobs
    * are near-dups when they SHARE content-defined chunks — shared
    * distinct-chunk bytes ≥ 50% of the smaller blob. Because CDC
    * boundaries survive insertions (q189), an edited copy still
    * shares most of its chunks with the original, so this catches
    * appended/prepended/patched copies that fixed-offset methods
    * miss — with NO tokenizer and NO signature tuning. Scale shape:
    * the pair join is an equi-join on chunk_md5 carrying (md5, doc,
    * len) triples; chunks appearing in > $MaxChunkDf docs are dropped
    * first (the hot-key/boilerplate cap — same discipline as q13's
    * common-gram filter), bounding per-chunk pair fan-out at
    * $MaxChunkDf², so no boilerplate chunk can go quadratic.
    */
  val q191CdcNearDup = NamedQuery(
    "q191_cdc_neardup",
    "Near-dup via shared content-defined chunks (>=50% of the smaller " +
      "blob's bytes): tokenizer-free, insertion-robust; boilerplate " +
      s"chunks (df > $MaxChunkDf) capped out of the pair join.",
    (s, d) => {
      // distinct within doc: a chunk repeated inside one blob counts once
      val pay = cdcChunkTable(Tables.documents(s, d))
        .select("doc_id", "chunk_md5", "len").distinct().cache()
      val docBytes = pay.groupBy("doc_id").agg(sum("len").as("bytes"))
      val rare = pay.groupBy("chunk_md5")
        .agg(countDistinct("doc_id").as("df"))
        .filter(col("df") <= MaxChunkDf)
        .select("chunk_md5")
      val filtered = pay.join(rare, Seq("chunk_md5"))
      val shared = filtered.select(col("chunk_md5"),
          col("doc_id").as("doc_id_a"), col("len"))
        .join(filtered.select(col("chunk_md5"),
          col("doc_id").as("doc_id_b")), Seq("chunk_md5"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(sum("len").as("shared_bytes"))
      shared
        .join(docBytes.select(col("doc_id").as("doc_id_a"),
          col("bytes").as("ba")), Seq("doc_id_a"))
        .join(docBytes.select(col("doc_id").as("doc_id_b"),
          col("bytes").as("bb")), Seq("doc_id_b"))
        .withColumn("frac_fp",
          expr("(shared_bytes * 1000000) div least(ba, bb)"))
        .filter(col("frac_fp") >= 500000)
        .select("doc_id_a", "doc_id_b", "shared_bytes", "frac_fp")
        .orderBy(col("frac_fp").desc, col("doc_id_a").asc,
          col("doc_id_b").asc)
        .limit(50)
    },
    Some(s"""WITH ${cdcCtesSql("documents", "")},
            |pay AS (SELECT DISTINCT doc_id, chunk_md5, len FROM payload),
            |db AS (SELECT doc_id, CAST(SUM(len) AS BIGINT) AS bytes
            |  FROM pay GROUP BY 1),
            |rare AS (SELECT chunk_md5 FROM
            |    (SELECT chunk_md5, COUNT(DISTINCT doc_id) AS df
            |     FROM pay GROUP BY 1)
            |  WHERE df <= $MaxChunkDf),
            |f AS (SELECT pay.* FROM pay JOIN rare USING (chunk_md5)),
            |shared AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
            |    CAST(SUM(a.len) AS BIGINT) AS shared_bytes
            |  FROM f a JOIN f b ON a.chunk_md5 = b.chunk_md5
            |    AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT doc_id_a, doc_id_b, shared_bytes,
            |  CAST((shared_bytes * 1000000) // least(da.bytes, db2.bytes)
            |    AS BIGINT) AS frac_fp
            |FROM shared
            |JOIN db da ON da.doc_id = doc_id_a
            |JOIN db db2 ON db2.doc_id = doc_id_b
            |WHERE (shared_bytes * 1000000) // least(da.bytes, db2.bytes)
            |  >= 500000
            |ORDER BY frac_fp DESC, doc_id_a ASC, doc_id_b ASC
            |LIMIT 50""".stripMargin))

  /** q195: CHUNK-STORE GC PLANNING — the flip side of q188's dedup
    * win: once chunks are shared across blobs, deleting a blob does
    * NOT free its bytes — only chunks whose LAST referencing blob
    * died are reclaimable. This query plans a GC pass after a
    * retention delete (every 5th blob leaves): per-chunk reference
    * counts before/after, splitting the departed blobs' footprint
    * into reclaimable bytes (refcount hit 0) vs retained bytes
    * (still referenced by a survivor — the dedup tax on deletion).
    * `retained_fp` is why content-addressed stores run refcounted GC
    * instead of deleting by owner. Scale shape: two (chunk_md5)
    * hash-aggs over the row-local chunker and one metadata-only
    * anti-join — GC planning never touches payload bytes.
    */
  val q195ChunkGc = NamedQuery(
    "q195_chunk_gc",
    "Chunk-store GC audit after a retention delete: reclaimable vs " +
      "still-referenced bytes of the departed blobs' chunks " +
      "(refcount algebra) — deletion under dedup needs refcounts.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pay = cdcChunkTable(docs)
        .select("doc_id", "chunk_md5", "len").distinct().cache()
      val store = pay.groupBy("chunk_md5")
        .agg(max("len").as("len"), count(lit(1)).as("refs_before"))
      val after = pay.filter(col("doc_id") % 5 =!= 0)
        .groupBy("chunk_md5").agg(count(lit(1)).as("refs_after"))
      store.join(after, Seq("chunk_md5"), "left_outer")
        .select(col("len"), col("refs_before"),
          coalesce(col("refs_after"), lit(0L)).as("refs_after"))
        .agg(
          count(lit(1)).as("n_chunks_store"),
          sum("len").as("store_bytes"),
          sum(when(col("refs_after") === 0, 1L).otherwise(0L))
            .as("n_reclaimable"),
          sum(when(col("refs_after") === 0, col("len")).otherwise(0L))
            .as("reclaimable_bytes"),
          sum(when(col("refs_after") > 0 &&
            col("refs_after") < col("refs_before"), col("len"))
            .otherwise(0L)).as("retained_bytes"))
        .withColumn("retained_fp", expr( // store bytes are corpus-scaled
          "CAST((CAST(retained_bytes AS DECIMAL(38,0)) * 1000000) div " +
            "greatest(reclaimable_bytes + retained_bytes, 1) AS BIGINT)"))
    },
    Some(s"""WITH ${cdcCtesSql("documents", "")},
            |pay AS (SELECT DISTINCT doc_id, chunk_md5, len FROM payload),
            |store AS (SELECT chunk_md5, MAX(len) AS len,
            |    CAST(COUNT(*) AS BIGINT) AS refs_before
            |  FROM pay GROUP BY 1),
            |aft AS (SELECT chunk_md5, CAST(COUNT(*) AS BIGINT)
            |    AS refs_after
            |  FROM pay WHERE doc_id % 5 <> 0 GROUP BY 1),
            |j AS (SELECT s.len, s.refs_before,
            |    COALESCE(a.refs_after, 0) AS refs_after
            |  FROM store s LEFT JOIN aft a USING (chunk_md5))
            |SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks_store,
            |  CAST(SUM(len) AS BIGINT) AS store_bytes,
            |  CAST(SUM(CASE WHEN refs_after = 0 THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_reclaimable,
            |  CAST(SUM(CASE WHEN refs_after = 0 THEN len ELSE 0 END)
            |    AS BIGINT) AS reclaimable_bytes,
            |  CAST(SUM(CASE WHEN refs_after > 0 AND refs_after <
            |    refs_before THEN len ELSE 0 END) AS BIGINT)
            |    AS retained_bytes,
            |  CAST((SUM(CASE WHEN refs_after = 0 THEN len ELSE 0 END) * 0
            |    + SUM(CASE WHEN refs_after > 0 AND refs_after <
            |        refs_before THEN len ELSE 0 END)::HUGEINT * 1000000)
            |    // greatest(SUM(CASE WHEN refs_after = 0 THEN len
            |        ELSE 0 END)
            |      + SUM(CASE WHEN refs_after > 0 AND refs_after <
            |          refs_before THEN len ELSE 0 END), 1) AS BIGINT)
            |    AS retained_fp
            |FROM j""".stripMargin))

  /** q196: CDF-DRIVEN CHUNK-STORE MAINTENANCE — the third index
    * family maintained from the change feed, completing the trio
    * (dense IVF q185, lexical BM25 q192, content-addressed chunk
    * store here): a merge-maintained blob corpus commits two
    * versions, and the store's per-chunk REFERENCE COUNTS (q195's GC
    * currency) update incrementally — delete/update_preimage blobs
    * retract their distinct chunks' refs, insert/update_postimage
    * blobs add theirs, cost O(changed blobs' bytes) through the
    * row-local native chunker, never a corpus re-chunk. The output
    * row proves the refcount algebra closes exactly against a full
    * re-chunk of the new snapshot: chunk-set equality plus per-chunk
    * refcount equality, zero mismatches ⇒ agree. At 100 TB this is
    * how a dedup store stays consistent under a backfill without
    * re-reading the corpus.
    */
  val q196CdfChunkStore = NamedQuery(
    "q196_cdf_chunk_store",
    "Incremental chunk-store refcounts from the change feed: " +
      "retract/add changed blobs' distinct chunks at O(changeset), " +
      "proven equal to a full re-chunk (set + refcounts).",
    (s, d) => {
      val dir = graft.Scratch.dir("cdfstore", d)
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
      // per-chunk refcounts of a blob set (distinct within blob)
      def refs(df: org.apache.spark.sql.DataFrame, c: String) =
        cdcChunkTable(df.withColumnRenamed("k", "doc_id"))
          .select("doc_id", "chunk_md5").distinct()
          .groupBy("chunk_md5").agg(count(lit(1)).as(c))
      val cdf = M.changes(s, dir, 1, 2, Seq("k"),
        deleteExpr = del, exceptColumns = drop)
      val v1 = refs(M.readCurrent(s, dir, del, drop, Some(1)), "r1")
      val rem = refs(cdf.filter(
        col("_change_type").isin("delete", "update_preimage")), "rr")
      val add = refs(cdf.filter(
        col("_change_type").isin("insert", "update_postimage")), "ra")
      val incr = v1.join(rem, Seq("chunk_md5"), "full_outer")
        .join(add, Seq("chunk_md5"), "full_outer")
        .select(col("chunk_md5"),
          (coalesce(col("r1"), lit(0L)) - coalesce(col("rr"), lit(0L)) +
            coalesce(col("ra"), lit(0L))).as("r_incr"))
        .filter(col("r_incr") > 0)
      val rebuild = refs(M.readCurrent(s, dir, del, drop, Some(2)), "r2")
      incr.join(rebuild, Seq("chunk_md5"), "full_outer")
        .agg(
          sum(when(col("r2").isNotNull, 1L).otherwise(0L))
            .as("n_store"),
          sum(when(col("r_incr").isNull, 1L).otherwise(0L))
            .as("n_missing_incr"),
          sum(when(col("r2").isNull, 1L).otherwise(0L))
            .as("n_extra_incr"),
          sum(when(col("r_incr").isNotNull && col("r2").isNotNull &&
            col("r_incr") =!= col("r2"), 1L).otherwise(0L))
            .as("n_ref_mismatch"))
        .withColumn("agree", when(
          col("n_missing_incr") + col("n_extra_incr") +
            col("n_ref_mismatch") === 0, 1L).otherwise(0L))
    },
    Some {
      def refsSql(src: String, p: String, c: String): String =
        s"""${cdcCtesSql(src, p)},
           |${p}refs AS (SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS $c
           |  FROM (SELECT DISTINCT doc_id, chunk_md5 FROM ${p}payload)
           |  GROUP BY 1)""".stripMargin
      s"""WITH h AS (SELECT doc_id % 150 AS k, doc_id AS seq, text,
         |    CASE WHEN doc_id % 7 = 0 THEN 'd' ELSE 'u' END op
         |  FROM documents WHERE doc_id < 400),
         |s1 AS (SELECT k AS doc_id, text FROM (
         |    SELECT *, row_number() OVER (PARTITION BY k
         |      ORDER BY seq DESC) rn FROM h WHERE seq < 200)
         |  WHERE rn = 1 AND op <> 'd'),
         |s2 AS (SELECT k AS doc_id, text FROM (
         |    SELECT *, row_number() OVER (PARTITION BY k
         |      ORDER BY seq DESC) rn FROM h WHERE seq < 400)
         |  WHERE rn = 1 AND op <> 'd'),
         |j AS (SELECT coalesce(s1.doc_id, s2.doc_id) AS doc_id,
         |    s1.text AS t1, s2.text AS t2,
         |    s1.doc_id IS NOT NULL AS has1, s2.doc_id IS NOT NULL AS has2
         |  FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id),
         |rem0 AS (SELECT doc_id, t1 AS text FROM j
         |  WHERE has1 AND (NOT has2 OR t1 IS DISTINCT FROM t2)),
         |add0 AS (SELECT doc_id, t2 AS text FROM j
         |  WHERE has2 AND (NOT has1 OR t1 IS DISTINCT FROM t2)),
         |${refsSql("s1", "v", "r1")},
         |${refsSql("rem0", "r", "rr")},
         |${refsSql("add0", "a", "ra")},
         |${refsSql("s2", "b", "r2")},
         |incr AS (SELECT chunk_md5,
         |    COALESCE(r1, 0) - COALESCE(rr, 0) + COALESCE(ra, 0)
         |      AS r_incr
         |  FROM vrefs FULL OUTER JOIN rrefs USING (chunk_md5)
         |    FULL OUTER JOIN arefs USING (chunk_md5)
         |  WHERE COALESCE(r1, 0) - COALESCE(rr, 0) + COALESCE(ra, 0) > 0)
         |SELECT
         |  CAST(SUM(CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_store,
         |  CAST(SUM(CASE WHEN r_incr IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_missing_incr,
         |  CAST(SUM(CASE WHEN r2 IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_extra_incr,
         |  CAST(SUM(CASE WHEN r_incr IS NOT NULL AND r2 IS NOT NULL
         |    AND r_incr <> r2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_ref_mismatch,
         |  CAST(CASE WHEN SUM(CASE WHEN r_incr IS NULL THEN 1 ELSE 0 END)
         |    + SUM(CASE WHEN r2 IS NULL THEN 1 ELSE 0 END)
         |    + SUM(CASE WHEN r_incr IS NOT NULL AND r2 IS NOT NULL
         |        AND r_incr <> r2 THEN 1 ELSE 0 END) = 0
         |    THEN 1 ELSE 0 END AS BIGINT) AS agree
         |FROM incr FULL OUTER JOIN brefs USING (chunk_md5)""".stripMargin
    })

  val all: Seq[NamedQuery] =
    Seq(q25BinaryFeatures, q97FrameSample, q160MediaNearDup,
      q173MediaIntegrity, q188ContentChunks, q189ChunkDeltaSync,
      q191CdcNearDup, q195ChunkGc, q196CdfChunkStore)
}
