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
    * (aId, bId, aStart, aEnd, bStart, bEnd); bounds are inclusive and
    * any orderable time type: epoch-µs longs pass through, TIMESTAMP /
    * TIMESTAMP_NTZ bucket at µs precision (a bare long cast would
    * truncate timestamps to whole seconds; NTZ routes through
    * TimestampType — instant-preserving under the pinned UTC session TZ).
    */
  def overlapJoin(a: DataFrame, b: DataFrame, bucketUs: Long): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def us(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case _ => col(c).cast("long")
    }
    // `div` = integral division truncating toward zero (NOT floor: for
    // negative pre-1970 epoch-µs the bucket ids differ from a floor).
    // Correctness only needs monotonicity — truncation is monotonic, so
    // overlapping intervals always share at least one bucket; Column./
    // would be double division, whose rounding could shift a boundary.
    def bucketed(df: DataFrame, s: String, e: String) =
      df.withColumn("__s_us", us(df, s)).withColumn("__e_us", us(df, e))
        .withColumn("__bucket",
          explode(sequence(expr(s"__s_us div $bucketUs"),
            expr(s"__e_us div $bucketUs"))))
        .drop("__s_us", "__e_us")
    bucketed(a, "a_start", "a_end").as("a")
      .join(bucketed(b, "b_start", "b_end").as("b"), Seq("__bucket"))
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id", "a_start", "a_end", "b_start", "b_end")
      .distinct() // a pair overlapping across several buckets counts once
  }
}
