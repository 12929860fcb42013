package graft.operators

import graft.SparkSpec

/** Interval-overlap join on a hand-checked fixture: overlaps across
  * bucket boundaries, touching endpoints (inclusive), non-overlaps in a
  * shared bucket, and dedup of pairs sharing several buckets.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("overlapJoin finds exactly the overlapping pairs, once each") {
    val B = 100L // bucket width
    val a = Seq( // (id, start, end)
      ("a1", 50L, 250L),  // spans buckets 0-2
      ("a2", 400L, 410L), // inside bucket 4
      ("a3", 700L, 700L)) // a point
      .toDF("a_id", "a_start", "a_end")
    val b = Seq(
      ("b1", 200L, 600L), // overlaps a1 (a1.end 250 >= 200) and a2
      ("b2", 0L, 49L),    // same bucket as a1's start but NO overlap
      ("b3", 700L, 800L)) // touches a3 exactly at 700 → inclusive match
      .toDF("b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, b, bucketUs = B)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a1", "b1"), ("a2", "b1"), ("a3", "b3")))
    // dedup: a1×b1 share buckets 2,3... the pair must appear exactly once
    val n = IntervalJoin.overlapJoin(a, b, bucketUs = B).count()
    assert(n == 3)
  }

  test("overlapJoin is time-type-agnostic: NTZ and TIMESTAMP bounds match epoch-µs longs") {
    import org.apache.spark.sql.functions._
    // same harness data three ways: epoch-µs long, TIMESTAMP, TIMESTAMP_NTZ
    // (the harness has shipped events.ts as each of these across testdata
    // regenerations — bucketing must be µs-exact for all of them)
    val ev = graft.Tables.events(spark, sf("sf0.001")).limit(200)
      .select(col("event_id"), col("ts"), col("ts_us"))
    // intervals: [ts, ts + 2h] expressed in each type
    def run(s: String, e: String, df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      IntervalJoin.overlapJoin(
        df.select(col("event_id").as("a_id"), col(s).as("a_start"), col(e).as("a_end")),
        df.select(col("event_id").as("b_id"), col(s).as("b_start"), col(e).as("b_end")),
        bucketUs = 3600000000L)
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val asLong = run("s", "e", ev
      .withColumn("s", col("ts_us")).withColumn("e", col("ts_us") + 7200000000L))
    val asTs = run("s", "e", ev
      .withColumn("s", col("ts"))
      .withColumn("e", timestamp_micros(col("ts_us") + 7200000000L)))
    val asNtz = run("s", "e", ev
      .withColumn("s", col("ts").cast("timestamp_ntz"))
      .withColumn("e", timestamp_micros(col("ts_us") + 7200000000L).cast("timestamp_ntz")))
    assert(asLong.nonEmpty)
    assert(asTs == asLong, "TIMESTAMP bounds must bucket µs-exactly like epoch-µs longs")
    assert(asNtz == asLong, "NTZ bounds must bucket µs-exactly like epoch-µs longs")
  }
}
