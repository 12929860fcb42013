package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.operators.Chunker
import graft.sources.ManagedTable

/** The streaming half of the RAG indexing story (q159/q184's batch
  * path): documents arriving as a stream are chunked IN the stream
  * (Chunker is a stateless row-local generate, so it composes with
  * Structured Streaming with no watermark or state) and accumulated
  * into a managed chunk table exactly-once via per-batch idempotence
  * tags — the table a downstream embed/index stage reads. Proves the
  * streamed table equals a batch chunking of the same corpus after a
  * multi-batch replay, and that a crash-replayed batch cannot land
  * twice (also exercising the round-9 incremental tag index across
  * consecutive micro-batches).
  */
class StreamingChunkIngestSpec extends SparkSpec {

  test("streamed chunking accumulates exactly-once and equals the batch chunk table") {
    val root = java.nio.file.Files.createTempDirectory("graft-chunk-ing").toString
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") < 30).select("doc_id", "text")
    // three separate files + maxFilesPerTrigger=1 ⇒ at least 3 micro-batches
    (0 until 3).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    }
    val tbl = s"$root/chunks"
    val q = Chunker.chunk(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
        "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        ManagedTable.idempotentAppend(b, tbl, id); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(ManagedTable.versions(spark, tbl).size >= 3,
      "maxFilesPerTrigger=1 must split the replay into >=3 batches")
    val streamed = ManagedTable.read(spark, tbl)
    val batch = Chunker.chunk(docs, "doc_id", "text", 64, 16)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed chunk table must equal the batch chunking row-for-row")
    // a crash-replayed batch id is a no-op — the exactly-once contract
    val before = streamed.count()
    assert(!ManagedTable.idempotentAppend(batch.limit(5), tbl, 0L))
    assert(ManagedTable.read(spark, tbl).count() == before,
      "replaying an already-landed batch must not duplicate rows")
  }

  test("streaming RAG loop: assembly over the streamed index equals the batch read path") {
    // q198 = stream-ingested chunk index + q190's hybrid retrieval and
    // context packing AGAINST that index; q190 = the same read path
    // over a fresh batch chunking. Row-for-row equality closes the
    // loop: the maintained index is indistinguishable from a rebuild
    // at the serving query's level, not just at the chunk-table level.
    val a = graft.queries.StreamingQueries.q198StreamingRagLoop
      .fn(spark, sf("sf0.001")).collect().toSeq
    val b = graft.queries.VectorQueries.q190ContextPack
      .fn(spark, sf("sf0.001")).collect().toSeq
    assert(a == b,
      "streamed-index assembly must equal the batch read path")
  }
}
