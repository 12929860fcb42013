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

  val all: Seq[NamedQuery] = Seq(q25BinaryFeatures)
}
