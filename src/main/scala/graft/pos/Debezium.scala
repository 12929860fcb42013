package graft.pos

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope handling (reference: notebooks/03_Data_Ingestion
  * .py:256-316): parse the Kafka (key, value) byte pair into the typed
  * change row the apply-changes operator consumes.
  *
  * The reference declares `before`/`source` as EMPTY StructTypes — parsed
  * and discarded (03:294,296); we reproduce that trick verbatim: from_json
  * tolerates the fields and prunes them at projection.
  */
object Debezium {

  /** Key schema (03_Data_Ingestion.py:288-291). */
  val keySchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("store_id", LongType)))

  /** Value schema (03_Data_Ingestion.py:293-300): op c/u/d, ts_ms
    * sequencing, `after` carrying the row image with an epoch-µs
    * `date_time`.
    */
  val valueSchema: StructType = StructType(Seq(
    StructField("before", StructType(Nil)),
    StructField("after", StructType(Seq(
      StructField("item_id", IntegerType),
      StructField("store_id", IntegerType),
      StructField("employee_id", IntegerType),
      StructField("date_time", LongType),
      StructField("quantity", IntegerType)))),
    StructField("source", StructType(Nil)),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("transaction", StringType)))

  /** Kafka wire → typed CDC rows (03_Data_Ingestion.py:304-316): cast the
    * byte columns to strings, from_json both, extract the 2-level nested
    * fields, convert the epoch-µs long to a timestamp (F8).
    */
  def parse(kafka: DataFrame, keyCol: Column = col("key"),
      valueCol: Column = col("value")): DataFrame =
    kafka
      .withColumn("key_json", from_json(keyCol.cast("string"), keySchema))
      .withColumn("value_json", from_json(valueCol.cast("string"), valueSchema))
      .select(
        col("key_json.item_id").as("item_id"),
        col("key_json.store_id").as("store_id"),
        col("value_json.ts_ms").as("ts_ms"),
        col("value_json.op").as("op"),
        // NOTE: after.employee_id is parsed but NOT selected — the
        // reference's kafka_data_extracted_cdc (03:304-316) projects only
        // these fields, so the materialized snapshot schema matches its
        // inventory_snapshot target table exactly
        col("value_json.after.date_time").as("date_time"),
        col("value_json.after.quantity").as("quantity"))
      .withColumn("date_time_ts",
        (col("date_time") / lit(1000000.0)).cast("timestamp"))

  /** Envelope expectations for the CDC stream — the quarantine gate a
    * consumer applies BEFORE [[inventorySnapshot]]'s apply_changes
    * (the reference pipeline trusts its envelopes; a production one
    * cannot): unparseable JSON surfaces as null key/op (from_json is
    * permissive by design), op codes outside Debezium's c/u/d/r are
    * corrupt, a row without ts_ms cannot be sequenced (feeding it to
    * apply_changes would make "latest" nondeterministic), and a
    * non-delete without an after-image would upsert nulls over live
    * data. Violation counts ride the observe channel exactly like the
    * silver-stream gate ([[Medallion.runSilver]]); DebeziumSpec proves
    * streamed counts equal a batch observe over the same replay.
    */
  val envelopeRules: Seq[graft.operators.Expectations.Rule] = Seq(
    graft.operators.Expectations.Rule("valid_key",
      col("item_id").isNotNull && col("store_id").isNotNull),
    graft.operators.Expectations.Rule("valid_op",
      col("op").isin("c", "u", "d", "r")),
    graft.operators.Expectations.Rule("sequenced",
      col("ts_ms").isNotNull),
    graft.operators.Expectations.Rule("upsert_has_image",
      col("op") === "d" ||
        (col("quantity").isNotNull && col("date_time").isNotNull)))

  /** [[parse]] + expectations gate, streaming: malformed envelopes are
    * dropped before they can reach apply_changes, with per-rule
    * violation counts observed under `name` on every micro-batch.
    */
  def gatedParse(kafka: DataFrame,
      name: String = "cdc_expectations"): DataFrame =
    graft.operators.Expectations.streamingGate(
      parse(kafka), envelopeRules, name)

  /** The reference's full CDC materialization (03:318-326): parsed stream →
    * apply_changes keyed by (item_id, store_id), sequenced by ts_ms,
    * deletes on op='d', bookkeeping columns dropped.
    */
  def inventorySnapshot(parsed: DataFrame): DataFrame =
    graft.operators.ApplyChanges.applyChanges(
      parsed,
      keys = Seq("item_id", "store_id"),
      sequenceBy = Seq(col("ts_ms")),
      deleteExpr = col("op") === "d",
      exceptColumns = Seq("op", "ts_ms", "date_time"))
}
