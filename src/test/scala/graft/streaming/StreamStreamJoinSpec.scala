package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StreamingOps.EventRow

/** Stream-stream inner join with watermarks and a time-bound condition —
  * the remaining Structured Streaming operator family (the reference has
  * none; SURVEY §2.7 notes its absence). State on both sides is bounded
  * by the watermark + range condition, the 100 TB requirement for any
  * stream-stream join.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in µs

  private def ev(id: Long, uid: Long, et: String, tsUs: Long) =
    EventRow(id, uid, et, 1.0, "{}", tsUs)

  test("watermarked stream-stream join matches the batch time-bound join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val buys   = MemoryStream[EventRow]
    val clickDf = clicks.toDS().toDF()
      .withColumn("c_ts", timestamp_micros(col("ts_us")))
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("c_ts"), col("ts_us").as("c_us"))
      .withWatermark("c_ts", "1 hour")
    val buyDf = buys.toDS().toDF()
      .withColumn("b_ts", timestamp_micros(col("ts_us")))
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("b_ts"), col("ts_us").as("b_us"))
      .withWatermark("b_ts", "1 hour")
    // purchase attributed to a click within the preceding 2 hours
    val joined = clickDf.join(buyDf,
      col("c_user") === col("b_user") &&
        col("b_ts") >= col("c_ts") &&
        col("b_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS"))
      .select("c_user", "click_id", "buy_id")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckptDir("ssjoin"))
      .start()
    clicks.addData(ev(1, 7, "click", 10 * H), ev(2, 7, "click", 20 * H),
      ev(3, 8, "click", 10 * H))
    buys.addData(ev(100, 7, "purchase", 11 * H), // joins click 1 (within 2h)
      ev(101, 7, "purchase", 21 * H),            // joins click 2
      ev(102, 7, "purchase", 15 * H),            // no click within window
      ev(103, 9, "purchase", 11 * H))            // no such user clicked
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 1L, 100L), (7L, 2L, 101L)))
  }
}
