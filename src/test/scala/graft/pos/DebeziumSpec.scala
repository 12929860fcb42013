package graft.pos

import java.sql.Timestamp
import graft.SparkSpec

/** Debezium envelope parsing + CDC apply on synthetic Kafka byte pairs
  * shaped like the reference's documented example payloads
  * (03_Data_Ingestion.py:256-300): out-of-order ts_ms, upserts, and a
  * tombstone, through to the materialized snapshot.
  */
class DebeziumSpec extends SparkSpec {
  import spark.implicits._

  private def rec(item: Int, store: Int, op: String, tsMs: Long,
      dtUs: Long, qty: Int): (Array[Byte], Array[Byte]) = {
    val key = s"""{"item_id": $item, "store_id": $store}"""
    val after =
      if (op == "d") "null"
      else s"""{"item_id": $item, "store_id": $store, "employee_id": 1,
               | "date_time": $dtUs, "quantity": $qty}""".stripMargin
    val value =
      s"""{"before": null, "after": $after,
         | "source": {"version": "1.7.0.Final", "connector": "postgresql"},
         | "op": "$op", "ts_ms": $tsMs, "transaction": null}""".stripMargin
    (key.getBytes("UTF-8"), value.getBytes("UTF-8"))
  }

  // epoch µs for 2021-01-06 00:00:00 UTC
  private val T0 = 1609891200000000L

  test("envelope parse: 2-level nesting, empty structs discarded, µs→ts") {
    val kafka = Seq(rec(100001, 1, "c", 1000L, T0, 42)).toDF("key", "value")
    val row = Debezium.parse(kafka).collect().head
    assert(row.getAs[Long]("item_id") == 100001L)
    assert(row.getAs[Long]("store_id") == 1L)
    assert(row.getAs[Long]("ts_ms") == 1000L)
    assert(row.getAs[String]("op") == "c")
    assert(row.getAs[Int]("quantity") == 42)
    assert(row.getAs[Timestamp]("date_time_ts") ==
      Timestamp.valueOf("2021-01-06 00:00:00"))
  }

  test("CDC apply: out-of-order upserts + tombstones materialize correctly") {
    val kafka = Seq(
      rec(1, 0, "c", 100L, T0, 10),
      rec(1, 0, "u", 300L, T0 + 2, 30), // latest for (1,0)
      rec(1, 0, "u", 200L, T0 + 1, 20), // late arrival, must lose
      rec(2, 0, "c", 100L, T0, 5),
      rec(2, 0, "d", 400L, T0 + 3, 0),  // live tombstone: key gone
      rec(3, 1, "d", 100L, T0, 0),
      rec(3, 1, "u", 250L, T0 + 1, 7)   // reinsert after stale delete
    ).toDF("key", "value")
    val snap = Debezium.inventorySnapshot(Debezium.parse(kafka))
      .collect().map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("store_id")) ->
        r.getAs[Int]("quantity")).toMap
    assert(snap == Map((1L, 0L) -> 30, (3L, 1L) -> 7))
  }

  test("snapshot schema drops the excepted bookkeeping columns") {
    val kafka = Seq(rec(1, 0, "c", 100L, T0, 10)).toDF("key", "value")
    val cols = Debezium.inventorySnapshot(Debezium.parse(kafka)).columns.toSet
    assert(!cols.contains("op") && !cols.contains("ts_ms") &&
      !cols.contains("date_time"))
    // employee_id is absent too: the reference's extracted-CDC projection
    // never selects it, so the snapshot schema is reference-identical
    assert(cols == Set("item_id", "store_id", "quantity", "date_time_ts"))
  }

  test("streamed expectations gate quarantines malformed envelopes; counts match batch observe") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    // a replay with every malformation class the gate names, mixed
    // into valid traffic: (a) garbage value JSON → null op,
    // (b) corrupt op code, (c) missing ts_ms, (d) upsert without an
    // after-image, plus a LEGITIMATE tombstone (op='d', null after)
    // that must NOT be quarantined
    def raw(key: String, value: String) =
      (key.getBytes("UTF-8"), value.getBytes("UTF-8"))
    val rows = Seq(
      rec(1, 0, "c", 100L, T0, 10),
      rec(1, 0, "u", 300L, T0 + 2, 30),
      rec(2, 0, "c", 100L, T0, 5),
      rec(2, 0, "d", 400L, T0 + 3, 0), // valid tombstone — keep
      raw("""{"item_id": 9, "store_id": 0}""", "not json at all"), // (a)
      raw("""{"item_id": 8, "store_id": 0}""",
        """{"before": null, "after": null, "source": {},
          | "op": "x", "ts_ms": 50, "transaction": null}""".stripMargin), // (b)
      raw("""{"item_id": 7, "store_id": 0}""",
        """{"before": null, "after": {"item_id": 7, "store_id": 0,
          | "employee_id": 1, "date_time": 1, "quantity": 3},
          | "op": "u", "ts_ms": null, "transaction": null}""".stripMargin), // (c)
      raw("""{"item_id": 6, "store_id": 0}""",
        """{"before": null, "after": null, "source": {},
          | "op": "u", "ts_ms": 60, "transaction": null}""".stripMargin)) // (d)
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-gate").toString
    val df = rows.zipWithIndex
      .map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("key", "value", "idx")
    // three files + maxFilesPerTrigger=1 ⇒ a multi-batch replay
    (0 until 3).foreach { i =>
      df.filter(col("idx") % 3 === i).drop("idx")
        .coalesce(1).write.mode("append").parquet(s"$root/in")
    }
    val written = spark.read.parquet(s"$root/in")
    // batch truth: same gate, batch observe
    val (gatedBatch, obs) = graft.operators.Expectations
      .observedGate(Debezium.parse(written), Debezium.envelopeRules)
    val batchSurvivors = gatedBatch.collect()
    val batchMetrics = obs.get.map { case (k, v) =>
      k -> v.asInstanceOf[Long] }
    // streamed: gate in the stream, accumulate observed metrics across
    // micro-batches, land survivors in memory
    val acc = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val gated = Debezium.gatedParse(
      spark.readStream.schema(written.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in"))
    val q = gated.writeStream.format("memory")
      .queryName("cdc_gate_out")
      .option("checkpointLocation", ckptDir("cdc-gate"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      Option(p.observedMetrics.get("cdc_expectations")).foreach { row =>
        row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
          val v = Option(row.get(i)).map(_.asInstanceOf[Long]).getOrElse(0L)
          acc.merge(f, v, (a, b) => a + b)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val streamedMetrics = acc.asScala.map { case (k, v) =>
      k -> v.longValue() }.toMap
    assert(streamedMetrics == batchMetrics,
      s"streamed violation counts must equal batch observe: " +
        s"$streamedMetrics vs $batchMetrics")
    assert(streamedMetrics("n_input") == 8L)
    assert(streamedMetrics("viol_valid_op") >= 1L &&
      streamedMetrics("viol_sequenced") >= 1L &&
      streamedMetrics("viol_upsert_has_image") >= 1L)
    // the survivors are exactly the batch gate's survivors (4 valid
    // envelopes incl. the legitimate tombstone), so apply_changes
    // downstream sees identical input either way
    val streamed = spark.table("cdc_gate_out").collect()
    assert(streamed.length == batchSurvivors.length &&
      streamed.map(_.toString).sorted
        .sameElements(batchSurvivors.map(_.toString).sorted))
    val snap = Debezium.inventorySnapshot(spark.table("cdc_gate_out"))
      .collect().map(r => (r.getAs[Long]("item_id"),
        r.getAs[Long]("store_id")) -> r.getAs[Int]("quantity")).toMap
    assert(snap == Map((1L, 0L) -> 30),
      "the gated stream materializes only the clean upserts " +
        "(key 2 tombstoned, malformed envelopes quarantined)")
  }
}
