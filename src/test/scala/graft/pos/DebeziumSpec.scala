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
}
