package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal.{MediaDecoder, MediaRow}

/** Multimodal plumbing: partition-mapped decode (stubbed codec) keeps
  * schema/batch shape; frame sampling explodes deterministically.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = (0L until 20L).map { i =>
    MediaRow(i, if (i % 2 == 0) "jpg" else "wav", 64, 64,
      Array.fill((i + 1).toInt * 10)((i % 251).toByte))
  }.toDS().repartition(4)

  test("decodeFeatures: fixed dim, deterministic, byte counts correct") {
    val feats = Multimodal.decodeFeatures(media, MediaDecoder.DeterministicFake, dim = 8)
      .collect().sortBy(_.media_id)
    assert(feats.length == 20)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => f.n_bytes == (f.media_id + 1) * 10))
    val again = Multimodal.decodeFeatures(media, MediaDecoder.DeterministicFake, dim = 8)
      .collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.feature.sameElements(b.feature) })
  }

  test("the real-codec stub fails loudly, not silently") {
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(media, MediaDecoder.RealCodec, dim = 8).collect()
    }
    assert(ex.getMessage != null)
  }

  test("sampleFrames: one row per stride window, offset column correct") {
    val df = media.toDF()
    val frames = Multimodal.sampleFrames(df, stride = 25)
    val counts = frames.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // media i has (i+1)*10 bytes → max(1, floor(bytes/25)) frames
    (0L until 20L).foreach { i =>
      val expected = math.max(1, (i + 1) * 10 / 25)
      assert(counts(i) == expected, s"media $i")
    }
    assert(frames.filter(col("frame_off") =!= col("frame_idx") * 25).count() == 0)
  }

  test("metadata-only queries never read the blob column from parquet") {
    // THE scale property of opaque binary columns: a stats/metadata query
    // over a 100 TB media table must scan kilobytes of metadata, not the
    // blobs — column pruning has to reach the parquet scan
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum(col("width")).as("w"))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("blob"),
      s"blob column must be pruned from the scan:\n$plan")
  }
}
