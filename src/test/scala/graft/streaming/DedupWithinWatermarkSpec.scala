package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StreamingOps.EventRow

/** `dropDuplicatesWithinWatermark` vs classic `dropDuplicates`: the
  * classic form keys state on the EXACT event time too (a re-send with a
  * different timestamp is "new"), while the WithinWatermark form dedups
  * any re-send of the same business key arriving within the watermark
  * delay — the semantics a Kafka at-least-once producer actually needs
  * (retries carry fresh broker timestamps). State for both is
  * watermark-bounded; WithinWatermark keeps one entry per KEY rather
  * than per (key, ts), so its state is strictly smaller under retries.
  */
class DedupWithinWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, uid: Long, et: String, tsUs: Long) =
    EventRow(id, uid, et, 1.0, "{}", tsUs)

  private val H = 3600L * 1000000L // one hour in µs

  test("retry with a different timestamp dedups WithinWatermark, not classic") {
    implicit val sqlCtx = spark.sqlContext

    def run(name: String, within: Boolean): Seq[Long] = {
      val mem = MemoryStream[EventRow]
      val stream = mem.toDS().toDF()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "1 hour")
      val dedup =
        if (within) stream.dropDuplicatesWithinWatermark("event_id")
        else stream.dropDuplicates("event_id", "ts")
      val q = dedup.select("event_id", "user_id")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckptDir(s"spec-$name"))
        .start()
      // original event, then an at-least-once retry 1 minute later
      // (same event_id, FRESH timestamp — the Kafka producer-retry shape)
      mem.addData(ev(1, 1, "click", 10 * H))
      q.processAllAvailable()
      mem.addData(ev(1, 1, "click", 10 * H + 60L * 1000000L))
      q.processAllAvailable()
      // advance the watermark far enough to flush append-mode results
      mem.addData(ev(99, 9, "flush", 20 * H))
      q.processAllAvailable()
      q.stop()
      spark.table(name).select("event_id").as[Long].collect().toSeq.sorted
    }

    // classic (key includes ts): the retry row survives as a duplicate
    assert(run("dd_classic", within = false) === Seq(1L, 1L, 99L))
    // WithinWatermark: the retry is recognized as the same event
    assert(run("dd_within", within = true) === Seq(1L, 99L))
  }
}
