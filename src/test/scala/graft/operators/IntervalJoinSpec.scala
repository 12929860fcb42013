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
}
