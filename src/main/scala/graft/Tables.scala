package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All reads are plain `spark.read.parquet` so Catalyst's datasource V2
  * scan handles column pruning + predicate pushdown; callers must keep
  * their `select`/`filter` declarative so the pushdown reaches the scan.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Loads `events.parquet` and normalizes its timestamp column to a single
    * contract regardless of how the harness encoded it. Observed encodings
    * across testdata regenerations:
    *   - parquet INT64 TIMESTAMP(NANOS)  → Spark reads as raw long under
    *     `nanosAsLong` (Spark has no nanosecond timestamp type);
    *   - parquet timestamp[us] with isAdjustedToUTC=false → Spark reads as
    *     TIMESTAMP_NTZ;
    *   - parquet timestamp[us] UTC-adjusted → Spark reads as TIMESTAMP.
    * All three normalize to:
    *   - `ts`:    TimestampType at microsecond precision — use for
    *              event-time semantics (watermarks, `window(ts, …)`, as-of
    *              ordering). The NTZ→Timestamp cast is instant-preserving
    *              because the session timezone is pinned to UTC.
    *   - `ts_us`: epoch microseconds as a long — use in query OUTPUT columns
    *              so the DuckDB oracle (`epoch_us(ts)`, also a floor to µs)
    *              hash-matches bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→Timestamp cast below is instant-preserving ONLY under a UTC
    // session timezone; a caller-supplied session (Bench, the driver's
    // SparkEntry harness) may carry the host zone, which would silently
    // shift ts_us and break the DuckDB hash-match for every NTZ-encoded
    // regeneration of this table. Pin it here, where the cast lives.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
      case _ =>
        raw.withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
