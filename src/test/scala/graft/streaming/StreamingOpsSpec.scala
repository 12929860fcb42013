package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec
import graft.operators.ApplyChanges
import graft.pos.Medallion
import graft.streaming.StreamingOps.{EventRow, LatestOut}

/** Streaming semantics under out-of-order and duplicate input
  * (SURVEY §5.4): MemoryStream-fed dedup and streaming apply-changes,
  * checked against the batch operators.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, uid: Long, et: String, v: Double, tsUs: Long) =
    EventRow(id, uid, et, v, "{}", tsUs)

  private val H = 3600L * 1000000L // one hour in µs

  test("streaming latest-per-key matches batch applyChanges on out-of-order input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val out = StreamingOps.latestPerKeyStream(mem.toDS())
    val q = out.toDF().writeStream.format("memory").queryName("s_latest")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckptDir("spec-latest"))
      .start()
    // batch 1: initial values; batch 2: one late (stale) + one newer row
    mem.addData(ev(1, 1, "click", 1.0, 10 * H), ev(2, 1, "click", 2.0, 12 * H))
    q.processAllAvailable()
    mem.addData(ev(3, 1, "click", 9.9, 5 * H),  // late: must NOT win
      ev(4, 1, "click", 4.0, 13 * H),           // newer: must win
      ev(5, 2, "view", 7.0, 1 * H))
    q.processAllAvailable()
    q.stop()
    // Update-mode memory sink keeps every emitted update; latest per key
    // is the last row emitted — recover it with the batch operator itself.
    val finalState = ApplyChanges.latestByKey(
      spark.table("s_latest"), Seq("user_id", "event_type"),
      Seq(col("last_ts_us"), col("last_event_id")))
      .as[LatestOut].collect().map(o => (o.user_id, o.event_type) -> o).toMap
    assert(finalState((1L, "click")).last_event_id == 4L)
    assert(finalState((1L, "click")).last_value == 4.0)
    assert(finalState((2L, "view")).last_event_id == 5L)
  }

  test("watermarked dedup drops in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val stream = mem.toDS().toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val dedup = StreamingOps.watermarkDedup(stream, "ts", "1 hour",
      Seq("user_id", "event_type"))
    val q = dedup.select("user_id", "event_type", "event_id")
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckptDir("spec-dedup"))
      .start()
    mem.addData(ev(1, 1, "click", 1.0, 10 * H), ev(2, 1, "click", 1.0, 10 * H + 1),
      ev(3, 2, "click", 1.0, 10 * H))
    q.processAllAvailable()
    mem.addData(ev(4, 1, "click", 1.0, 10 * H + 2)) // still duplicate
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("s_dedup").collect()
    assert(rows.length == 2, s"expected 2 unique keys, got ${rows.length}")
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "click"), (2L, "click")))
  }

  test("transformWithState latest-per-key equals batch over file input") {
    // transformWithState needs RocksDB state; set by the query builder
    // (here), not inside the operator — see StreamingOps.RocksDbProvider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StreamingOps.RocksDbProvider)
    val batch = ApplyChanges.latestByKey(
      graft.Tables.events(spark, sf("sf0.001")),
      Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
      .select(col("user_id"), col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val events = StreamingOps.eventsStream(spark, sf("sf0.001"))
      .selectExpr("event_id", "user_id", "event_type", "value", "props", "ts_us")
      .as[EventRow]
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.latestPerKeyTws(events).toDF(),
      s"spec_tws_${System.nanoTime()}", OutputMode.Update())
      .select(col("user_id"), col("event_type"), col("last_event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("gold windowed agg advances across ≥2 ProcessingTime micro-batches") {
    // the reference's 5-min gold recompute cadence
    // (04_Current_Inventory.sql:3) maps to Trigger.ProcessingTime; this
    // drives the windowed-agg shape through multiple real micro-batches
    // with input arriving BETWEEN triggers, not a single AvailableNow pass
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val agg = mem.toDS().toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sv"))
    val q = agg.writeStream.format("memory").queryName("pt_gold")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckptDir("pt-gold"))
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    mem.addData(ev(1, 1, "click", 2.0, 10 * H), ev(2, 1, "click", 3.0, 10 * H + 1))
    q.processAllAvailable()
    val afterB1 = spark.table("pt_gold").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(afterB1 == Map("click" -> (2L, 5.0)))
    mem.addData(ev(3, 2, "view", 1.5, 11 * H)) // arrives between triggers
    q.processAllAvailable()
    q.stop()
    val afterB2 = spark.table("pt_gold").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(afterB2 == Map("click" -> (2L, 5.0), "view" -> (1L, 1.5)))
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "the new rows must have been picked up by a second micro-batch")
  }

  test("TTL-configured state (ProcessingTime mode) matches batch within the TTL window") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StreamingOps.RocksDbProvider)
    val batch = ApplyChanges.latestByKey(
      graft.Tables.events(spark, sf("sf0.001")),
      Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
      .select(col("user_id"), col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val events = StreamingOps.eventsStream(spark, sf("sf0.001"))
      .selectExpr("event_id", "user_id", "event_type", "value", "props", "ts_us")
      .as[EventRow]
    // 1h TTL: state cannot expire within this bounded run, so results
    // must equal the un-TTL'd (and batch) answer — what's exercised is
    // the TTL + ProcessingTime TimeMode code path itself. NOTE: under
    // the ProcessingTime TimeMode the runtime keeps scheduling batches
    // for processing-time progress, so neither Trigger.AvailableNow nor
    // processAllAvailable ever reaches "idle" — the sink is POLLED until
    // it converges to the batch answer, then the query is stopped.
    val name = s"spec_ttl_${System.nanoTime()}"
    val out = StreamingOps.latestPerKeyTws(events,
      org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckptDir(name))
      .start()
    def current(): Set[(Long, String, Long)] = ApplyChanges.latestByKey(
      spark.table(name), Seq("user_id", "event_type"),
      Seq(col("last_ts_us"), col("last_event_id")))
      .select(col("user_id"), col("event_type"), col("last_event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val deadline = System.currentTimeMillis() + 120000
    var got = current()
    while (got != batch && System.currentTimeMillis() < deadline) {
      Thread.sleep(250)
      got = current()
    }
    q.stop()
    assert(got == batch)
  }

  test("event-time timers close sessions once the watermark passes the gap") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StreamingOps.RocksDbProvider)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val Gap = 30L * 60L * 1000000L // 30 min in µs
    val T = 100 * H
    val withWm = mem.toDS().toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .selectExpr("event_id", "user_id", "event_type", "value", "props", "ts_us")
      .as[EventRow]
    val name = s"sess_close_${System.nanoTime()}"
    val q = StreamingOps.sessionCloses(withWm, Gap).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckptDir(name))
      .start()
    // batch 1: user 1 has a 2-event session; user 2 a single event
    mem.addData(ev(1, 1, "click", 1.0, T),
      ev(2, 1, "click", 1.0, T + 10 * 60 * 1000000L),
      ev(3, 2, "view", 1.0, T))
    q.processAllAvailable()
    // batch 2: user 1's event is 2h after the open session's last event —
    // an EVENT-TIME gap, so the stale session closes immediately (even
    // though its timer has not fired yet) and a new one opens; the split
    // must not depend on which batch the event lands in. User 3 opens.
    mem.addData(ev(4, 1, "click", 1.0, T + 2 * H), ev(5, 3, "view", 1.0, T + 2 * H))
    q.processAllAvailable()
    // batch 3 pushes the watermark far past every pending timer
    mem.addData(ev(6, 9, "view", 1.0, T + 10 * H))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1: FIRST session (2 events, last at T+10min) closed by the
    // event-time gap; its second session (1 event at T+2h) closed by the
    // batch-3 watermark, like users 2 and 3; user 9's session stays open
    assert(got == Set(
      (1L, 2L, T + 10 * 60 * 1000000L),
      (1L, 1L, T + 2 * H),
      (2L, 1L, T),
      (3L, 1L, T + 2 * H)))
  }

  test("foreachBatch upsert folds every micro-batch into the parquet target") {
    implicit val sqlCtx = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft-upsert").toString + "/latest"
    val mem = MemoryStream[EventRow]
    val q = StreamingOps.foreachBatchUpsert(mem.toDS().toDF(), target,
        Seq("user_id", "event_type"), Seq("ts_us", "event_id"))
      .option("checkpointLocation", ckptDir("upsert"))
      .start()
    mem.addData(ev(1, 1, "click", 1.0, 10 * H), ev(2, 2, "view", 7.0, 10 * H))
    q.processAllAvailable()
    mem.addData(ev(3, 1, "click", 9.9, 5 * H),  // stale: must NOT win
      ev(4, 1, "click", 4.0, 12 * H),           // newer: must win
      ev(5, 3, "buy", 2.0, 10 * H))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(target)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toMap
    assert(got == Map(
      (1L, "click") -> (4L, 4.0),
      (2L, "view") -> (2L, 7.0),
      (3L, "buy") -> (5L, 2.0)))
  }

  test("bounded streaming run equals batch over the same file input") {
    val batch = ApplyChanges.latestByKey(
      graft.Tables.events(spark, sf("sf0.001")),
      Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
      .select(col("user_id"), col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val events = StreamingOps.eventsStream(spark, sf("sf0.001"))
      .selectExpr("event_id", "user_id", "event_type", "value", "props", "ts_us")
      .as[EventRow]
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.latestPerKeyStream(events).toDF(),
      s"spec_bounded_${System.nanoTime()}", OutputMode.Update())
      .select(col("user_id"), col("event_type"), col("last_event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("PII scrub composes with the watermarked medallion silver stage") {
    // the trust-boundary placement: scrub INSIDE the checkpointed
    // silver stream, downstream of the watermark + stateful dedup —
    // a pure row-local projection must not disturb either
    val root = java.nio.file.Files.createTempDirectory("graft-scrub").toString
    def rec(trans: String, item: Int) =
      s"""{"trans_id":"$trans","store_id":1,""" +
        s""""date_time":"2024-01-01 10:00:00","change_type_id":1,""" +
        s""""items":[{"item_id":$item,"quantity":5}]}"""
    val pii1 = "t1 reach alice@example.com"
    val pii2 = "t2 from 10.0.0.1"
    val pii3 = "t3 call +1-555-1234"
    Seq(rec(pii1, 1), rec(pii1, 1), // duplicate: dedup state must drop it
      rec(pii2, 2), rec(pii3, 3))
      .toDF("value").write.parquet(s"$root/bronze")
    Medallion.runSilver(spark, root, scrubColumns = Seq("trans_id"))
    val silver = spark.read.parquet(s"$root/silver")
    val ids = silver.select("trans_id").collect().map(_.getString(0)).toSet
    assert(silver.count() == 3, "watermarked dedup dropped the duplicate")
    assert(ids == Set("t1 reach [EMAIL]", "t2 from [IP]", "t3 call [PHONE]"),
      s"typed placeholders expected, got $ids")
  }

  test("streamed expectation metrics equal the batch observe numbers on the same replay") {
    // expect_or_drop composed INTO the checkpointed silver stream:
    // the per-micro-batch named-observe violation counts, summed,
    // must equal one batch observedGate pass over the same bronze
    // replay — and only all-rules-passing rows may land in silver
    import graft.operators.Expectations
    import graft.pos.PosPipeline
    val root = java.nio.file.Files.createTempDirectory("graft-expect").toString
    def rec(trans: String, item: Int, qty: String) =
      s"""{"trans_id":"$trans","store_id":1,""" +
        s""""date_time":"2024-01-01 10:00:00","change_type_id":1,""" +
        s""""items":[{"item_id":$item,"quantity":$qty}]}"""
    Seq(rec("t1", 1, "5"), rec("t1", 1, "5"), // duplicate: not an input twice
      rec("t2", 2, "-3"), // violates qty_positive
      rec("t3", 3, "null"), // violates qty_present
      rec("t4", 4, "2"))
      .toDF("value").write.parquet(s"$root/bronze")
    val rules = Seq(
      Expectations.Rule("qty_present", col("quantity").isNotNull),
      Expectations.Rule("qty_positive", col("quantity") > 0))
    val streamed = Medallion.runSilver(spark, root, expectations = rules)
    val batch = PosPipeline.parseEvents(
      spark.read.parquet(s"$root/bronze")
        .withColumn("value", col("value").cast("string")))
      .dropDuplicates("trans_id", "item_id")
    val (gated, obs) = Expectations.observedGate(batch, rules)
    val nPass = gated.count()
    val expected = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(streamed == expected,
      s"streamed metrics $streamed must equal batch observe $expected")
    // a null quantity fails BOTH rules (a rule that cannot evaluate
    // did not pass — DLT semantics), so qty_positive counts t2 and t3
    assert(streamed("n_input") == 4 && streamed("viol_qty_present") == 1 &&
      streamed("viol_qty_positive") == 2)
    val silver = spark.read.parquet(s"$root/silver")
    assert(silver.count() == nPass,
      "only all-rules-passing rows may land in silver")
    assert(silver.select("trans_id").collect().map(_.getString(0)).toSet
      == Set("t1", "t4"), "gated rows are exactly the passing ones")
  }
}
