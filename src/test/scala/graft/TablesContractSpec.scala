package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Harness-data contract: one loud, named failure point for testdata drift.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed physical encodings once (round 6: `events.ts` went from parquet
  * INT64 TIMESTAMP(NANOS) to timestamp[us] `isAdjustedToUTC=false`, which
  * Spark reads as TIMESTAMP_NTZ — that single change broke 39 queries).
  * This spec asserts, per table: (a) the exact schema our loaders expose
  * after normalization, and (b) one known value, so a future regeneration
  * fails HERE with a named cause instead of as dozens of opaque query
  * failures.
  */
class TablesContractSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def fieldTypes(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: loader normalizes ts to TimestampType + ts_us epoch-µs long, any parquet encoding") {
    val ev = Tables.events(spark, d)
    val ft = fieldTypes(ev)
    assert(ft("event_id") == LongType, s"events.event_id type drifted: ${ft("event_id")}")
    assert(ft("ts") == TimestampType,
      s"events.ts must normalize to TimestampType (watermarks/window/as-of depend on it); got ${ft("ts")} — " +
        "check Tables.events for a new parquet encoding of /root/testdata events.parquet")
    assert(ft("ts_us") == LongType, s"events.ts_us must be epoch-µs long; got ${ft("ts_us")}")
    assert(ft("user_id") == LongType && ft("event_type") == StringType &&
      ft("value") == DoubleType && ft("props") == StringType,
      s"events payload columns drifted: $ft")

    // ts and ts_us must encode the same instant (UTC session TZ is pinned in SparkSpec).
    val mismatch = ev.filter(unix_micros(col("ts")) =!= col("ts_us")).count()
    assert(mismatch == 0, s"$mismatch rows where ts_us != unix_micros(ts) — normalization is not instant-preserving")

    // Known values (sf0.001, harness seed as of round 7). DuckDB cross-check:
    //   SELECT min(epoch_us(ts)), max(epoch_us(ts)), count(*) FROM events.parquet
    val r = ev.agg(min("ts_us"), max("ts_us"), count(lit(1))).head()
    assert(r.getLong(0) == 1704067798778549L,
      s"events min(ts_us) drifted: ${r.getLong(0)} != 1704067798778549 — testdata regenerated with a new seed?")
    assert(r.getLong(1) == 1706657176220708L, s"events max(ts_us) drifted: ${r.getLong(1)}")
    assert(r.getLong(2) == 1000L, s"events row count drifted: ${r.getLong(2)}")
  }

  test("orders/lineitem: timestamp columns readable and instant-stable") {
    // These are currently parquet timestamp[us] isAdjustedToUTC=false (Spark: TIMESTAMP_NTZ).
    // Queries compare them against string literals and emit them as output columns — both
    // work for NTZ and TIMESTAMP alike, so no normalization is applied. This test exists to
    // scream if the encoding changes to something query-visible (e.g. raw INT64 nanos).
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(fieldTypes(o)("o_orderdate")),
      s"orders.o_orderdate no longer reads as a timestamp: ${fieldTypes(o)("o_orderdate")}")
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(fieldTypes(l)("l_shipdate")),
      s"lineitem.l_shipdate no longer reads as a timestamp: ${fieldTypes(l)("l_shipdate")}")
    assert(o.count() == 1500L && l.count() == 6000L, "orders/lineitem sf0.001 row counts drifted")
  }

  test("dimension + document + embedding tables: schema and one known value each") {
    val checks: Seq[(String, Map[String, DataType], Long)] = Seq(
      ("region", Map("r_regionkey" -> IntegerType, "r_name" -> StringType), 5L),
      ("nation", Map("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType), 25L),
      ("customer", Map("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType), 150L),
      ("supplier", Map("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
        "s_acctbal" -> DoubleType), 10L),
      ("part", Map("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
        "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType), 200L),
      ("documents", Map("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType), 500L),
      ("embeddings", Map("vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType), 500L)
    )
    checks.foreach { case (name, expected, rows) =>
      val df = Tables.table(spark, d, name)
      val ft = fieldTypes(df)
      expected.foreach { case (c, t) =>
        assert(ft.get(c).contains(t), s"$name.$c drifted: expected $t, got ${ft.get(c)} — full schema $ft")
      }
      assert(df.count() == rows, s"$name sf0.001 row count drifted: ${df.count()} != $rows")
    }
    // Spot values.
    assert(Tables.region(spark, d).filter(col("r_regionkey") === 0).select("r_name").head().getString(0).nonEmpty)
    val dim = Tables.embeddings(spark, d).select(size(col("embedding")).as("dim")).agg(min("dim"), max("dim")).head()
    assert(dim.getInt(0) == dim.getInt(1), "embeddings must be fixed-dimension")
  }
}
