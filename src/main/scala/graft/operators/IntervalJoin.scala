package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — all pairs (a, b) with
  * `a.start <= b.end AND b.start <= a.end` — without the
  * BroadcastNestedLoopJoin the naive inequality-only join plans to
  * (quadratic in rows per key, the classic range-join scale killer).
  *
  * The scalable shape: each interval explodes into the fixed-width time
  * BUCKETS it covers; candidates come from a bucket equi-join (two
  * overlapping intervals must share ≥1 bucket); the exact overlap
  * predicate then filters candidates, and pairs sharing several buckets
  * are deduplicated. Shuffle is keyed by bucket — overlap work is
  * proportional to actual temporal locality, not |A|×|B|.
  *
  * Bucket-width tuning (the knob SCALE.md documents for every banded
  * join here): ~the median interval length — too fine explodes long
  * intervals into many buckets, too coarse degrades candidates toward
  * all-pairs within a bucket. Long-interval skew at 100 TB is handled
  * like any hot key: AQE skew split or a coarser width for a flagged
  * minority.
  */
object IntervalJoin {

  /** a(aId, aStart, aEnd) ⋈overlap b(bId, bStart, bEnd) →
    * (aId, bId, aStart, aEnd, bStart, bEnd); bounds are inclusive
    * longs (e.g. epoch-µs).
    */
  def overlapJoin(a: DataFrame, b: DataFrame, bucketUs: Long): DataFrame = {
    // `div` = integer floor division (Column./ would be double division)
    def bucketed(df: DataFrame, s: String, e: String) =
      df.withColumn("__bucket",
        explode(sequence(expr(s"CAST($s AS BIGINT) div $bucketUs"),
          expr(s"CAST($e AS BIGINT) div $bucketUs"))))
    bucketed(a, "a_start", "a_end").as("a")
      .join(bucketed(b, "b_start", "b_end").as("b"), Seq("__bucket"))
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id", "a_start", "a_end", "b_start", "b_end")
      .distinct() // a pair overlapping across several buckets counts once
  }
}
