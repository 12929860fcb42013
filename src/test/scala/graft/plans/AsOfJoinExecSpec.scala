package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOfJoin

/** The custom sorted-merge AsOfJoinExec must be bit-identical to the
  * union + window-fill formulation on every partition layout, and must
  * actually plan as the custom exec (no union, no window).
  */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def buysClicks = {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("c_ts"))
      .agg(max("event_id").as("click_id"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"), col("ts_us"))
    (buys, clicks)
  }

  test("exec as-of equals union+window as-of on harness data") {
    val (buys, clicks) = buysClicks
    val expect = AsOfJoin.asOf(buys, clicks, Seq("user_id"), "ts_us", "c_ts")
      .orderBy("buy_id").collect().toSeq
    val got = AsOfJoin.asOfExec(buys, clicks, Seq("user_id"), "ts_us", "c_ts")
      .orderBy("buy_id").collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("exec as-of is robust to input partition layout") {
    val (buys, clicks) = buysClicks
    val expect = AsOfJoin.asOf(buys, clicks, Seq("user_id"), "ts_us", "c_ts")
      .orderBy("buy_id").collect().toSeq
    for (parts <- Seq(1, 7)) {
      val got = AsOfJoin.asOfExec(buys.repartition(parts),
          clicks.repartition(parts + 2), Seq("user_id"), "ts_us", "c_ts")
        .orderBy("buy_id").collect().toSeq
      assert(got === expect, s"parts=$parts")
    }
  }

  test("left rows with no prior right row get NULL payload; inclusive <=") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10L), (1L, 150L, 11L), (3L, 1L, 12L))
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.asOfExec(left, right, Seq("k"), "t", "rt")
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 100L, "a", 10L), // exactly-at: inclusive
      (1L, 200L, "b", 11L), // latest of the two prior rows
      (2L, 50L, "c", -1L))) // no right rows for key 2
  }

  test("timestamp-typed time columns order at microsecond precision") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("c_ts"))
      .agg(max("event_id").as("click_id"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"), col("ts"))
    val expect = AsOfJoin.asOf(buys, clicks, Seq("user_id"), "ts", "c_ts")
      .orderBy("buy_id").collect().toSeq
    val got = AsOfJoin.asOfExec(buys, clicks, Seq("user_id"), "ts", "c_ts")
      .orderBy("buy_id").collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty)
    // the raw right timestamp column must NOT leak into the payload
    assert(AsOfJoin.asOfExec(buys, clicks, Seq("user_id"), "ts", "c_ts")
      .columns.toSeq === Seq("user_id", "buy_id", "ts", "click_id"))
  }

  test("exec is time-type-agnostic: NTZ, TIMESTAMP and epoch-long frames agree") {
    // The harness has shipped events.ts as INT64-nanos and as µs-NTZ across
    // regenerations; the exec declares ordering/distribution over the time
    // column and must work for ANY orderable time type, not just what
    // Tables.events happens to normalize to today.
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    def run(cast: String): Seq[(Long, Long, Long)] = {
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").cast(cast).as("c_ts"))
        .agg(max("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          col("ts").cast(cast).as("t"))
      val got = AsOfJoin.asOfExec(buys, clicks, Seq("user_id"), "t", "c_ts")
      val expect = AsOfJoin.asOf(buys, clicks, Seq("user_id"), "t", "c_ts")
      assert(got.orderBy("buy_id").drop("t").collect().toSeq ===
        expect.orderBy("buy_id").drop("t").collect().toSeq, s"cast=$cast")
      got.orderBy("buy_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    }
    val ntz = run("timestamp_ntz")
    val tz = run("timestamp")
    val lng = run("long") // epoch-seconds: coarser, still must self-agree
    assert(ntz === tz, "NTZ and TIMESTAMP frames must join identically (UTC session)")
    assert(ntz.nonEmpty && lng.nonEmpty)
  }

  test("plan is AsOfJoinExec: no Union, no Window, sorted-merge shape") {
    val (buys, clicks) = buysClicks
    val df = AsOfJoin.asOfExec(buys, clicks, Seq("user_id"), "ts_us", "c_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window"))
    assert(!plan.contains("Union"))
  }
}
