package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark cannot read as a timestamp (only DuckDB/arrow can). We read it as
    * a raw long (`nanosAsLong`) and expose two normalized columns:
    *   - `ts`:    TimestampType truncated to microseconds (Spark's native
    *              precision) — use for event-time semantics (watermarks).
    *   - `ts_us`: epoch microseconds as a long — use in query OUTPUT columns
    *              so the DuckDB oracle (`epoch_us(ts)`, also a floor to µs)
    *              hash-matches bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        raw.withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
