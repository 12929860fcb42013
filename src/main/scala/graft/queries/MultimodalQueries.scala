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

  val all: Seq[NamedQuery] = Seq(q25BinaryFeatures, q97FrameSample)
}
