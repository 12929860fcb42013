package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Document chunking — the primitive between a raw corpus and both
  * RAG indexing and context-window training: split each document into
  * fixed-size token windows with configurable overlap, carrying full
  * provenance (doc id, chunk ordinal, first-token offset) so any chunk
  * maps back to its source span. chunk → embed → ANN-index (the
  * [[Similarity]] tier) is the standard retrieval path; chunk → pack
  * (q38) the standard pretraining one.
  *
  * Scale shape: pure row-local work — tokenize, one `sequence` of
  * chunk starts, one `posexplode`, one `slice` per chunk — so the
  * operator has NO shuffle (plan-guarded): it scales with scan
  * bandwidth and parallelizes per-document with zero skew sensitivity
  * beyond single-document length. Chunk text is re-joined from the
  * token slice (not substring'd from the raw text), which makes the
  * output engine-reproducible: the DuckDB oracle hash-checks every
  * chunk string byte-for-byte.
  */
object Chunker {

  /** One row per (doc, chunk): `(doc_id, chunk_idx, first_token_offset,
    * n_chunk_tokens, chunk_text)`. Chunks start every
    * `chunkTokens - overlapTokens` tokens; the last chunk may be short
    * (it is never dropped — a truncating chunker silently loses the
    * document tail, the classic RAG-index bug). Documents tokenize by
    * the same whitespace rule as every other text operator
    * ([[graft.functions.TextFunctions.tokens]]).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__ts"), col("__n"),
        // chunk starts: 0, stride, 2·stride, … ≤ n-1 (count = ⌊(n-1)/stride⌋+1)
        posexplode(sequence(lit(0), expr(s"(__n - 1) div $stride")))
          .as(Seq("__pos", "chunk_idx")))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("first_token_offset"),
        least(lit(chunkTokens),
          col("__n") - col("chunk_idx") * stride).cast("long")
          .as("n_chunk_tokens"),
        array_join(
          slice(col("__ts"), col("chunk_idx") * stride + 1, lit(chunkTokens)),
          " ").as("chunk_text"))
  }

  /** Content-defined chunk table — the rsync/LBFS boundary rule as an
    * operator: one row per chunk, `(doc_id, len, chunk_md5)`, with a
    * boundary after byte `e` whenever hash60 of the `win`-byte window
    * ending at `e` ≡ 0 (mod `mod`), so chunk identity is a pure
    * function of LOCAL content (an insertion re-chunks only its
    * neighborhood). Texts shorter than `win` bytes produce no chunks.
    * Entirely row-local (the native
    * [[graft.functions.NativeExpressions.CdcCuts]] boundary pass plus
    * one posexplode) — the payload never leaves its scan task; only
    * `(chunk_md5, len)` metadata shuffles downstream. The `doc_id`
    * column keeps whatever type `idCol` has (struct ids compose — the
    * change-feed index maintenance rides sign-tagged keys through
    * here).
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      win: Int, mod: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      // the whole operator lives in the BYTE domain: boundaries come
      // from hash60 over UTF-8 byte windows (CdcCuts), so the chunk
      // slice must be taken from the SAME bytes — substring over the
      // binary cast, md5 over the sliced bytes. Slicing the STRING
      // (character-indexed) would disagree with the cut positions on
      // any multi-byte text: chunk_md5/len drift off the
      // content-defined boundaries (identical digests for pure-ASCII
      // corpora, where byte index == character index).
      .withColumn("__bytes", col("__text").cast("binary"))
      .withColumn("__n", octet_length(col("__bytes")).cast("long"))
      .filter(col("__n") >= win)
      .select(col("doc_id"), col("__bytes"),
        graft.functions.NativeExpressions
          .cdcCuts(col("__text"), win, mod).as("__cuts"))
      .select(col("doc_id"), col("__bytes"), col("__cuts"),
        posexplode(col("__cuts")).as(Seq("__k", "__cut")))
      .withColumn("__prev", expr(
        "CASE WHEN __k = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE element_at(__cuts, __k) END"))
      .select(col("doc_id"), (col("__cut") - col("__prev")).as("len"),
        md5(expr("substring(__bytes, CAST(__prev + 1 AS INT), " +
          "CAST(__cut - __prev AS INT))")).as("chunk_md5"))

  /** Chunk statistics per document — the sizing signal a pipeline uses
    * to pick (chunkTokens, overlap) before committing to an index
    * build: chunk count, mean chunk length, and the token-duplication
    * factor the overlap costs (total chunk tokens / document tokens).
    */
  def chunkStats(chunks: DataFrame): DataFrame =
    chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_chunk_tokens").as("total_chunk_tokens"),
        max(col("first_token_offset") + col("n_chunk_tokens"))
          .as("last_token_covered"))
}
