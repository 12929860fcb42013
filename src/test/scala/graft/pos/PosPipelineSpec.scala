package graft.pos

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end replay of the reference pipeline on its own simulated POS
  * data (SURVEY §5.3 / §7.2), asserting the gold-table invariants and that
  * the DataFrame and literal-SQL gold queries agree.
  */
class PosPipelineSpec extends SparkSpec {

  private lazy val changes  = PosPipeline.dedupChanges(PosPipeline.readChanges(spark))
  private lazy val snapshot = PosPipeline.inventorySnapshot(PosPipeline.readSnapshots(spark))
  private lazy val store    = PosPipeline.readStore(spark)
  private lazy val ctype    = PosPipeline.readChangeType(spark)
  private lazy val gold     = PosPipeline.inventoryCurrent(snapshot, changes, store, ctype).cache()

  test("ingestion: row counts and BOPIS dedup match the fixture contract") {
    val raw = PosPipeline.readChanges(spark)
    assert(raw.count() == 3735 + 3538, "both change feeds")
    val deduped = changes.count()
    assert(deduped < raw.count(), "BOPIS double-reports collapsed")
    assert(deduped == raw.dropDuplicates("trans_id", "item_id").count())
    // BOPIS rows appear in both feeds with identical (trans_id, item_id)
    val dupKeys = raw.groupBy("trans_id", "item_id").count().filter(col("count") > 1)
    val bopis = raw.join(dupKeys.select("trans_id", "item_id"), Seq("trans_id", "item_id"))
    assert(bopis.select("change_type_id").distinct().collect().map(_.getInt(0)).toSet == Set(4),
      "all duplicated keys are BOPIS (change_type_id=4)")
  }

  test("snapshot CDC apply: exactly one latest row per (item, store)") {
    assert(snapshot.count() == 999 * 2)
    assert(snapshot.groupBy("item_id", "store_id").count()
      .filter(col("count") > 1).count() == 0)
    // latest == max snapshot time per key
    val maxTs = PosPipeline.readSnapshots(spark)
      .groupBy("item_id", "store_id").agg(max("date_time").as("m"))
    val joined = snapshot.join(maxTs, Seq("item_id", "store_id"))
      .filter(col("date_time_ts") =!= col("m"))
    assert(joined.count() == 0, "applyChanges kept a non-latest snapshot")
    assert(!snapshot.columns.contains("employee_id"), "except column dropped")
  }

  test("gold: current_inventory = snapshot + changes, one row per key") {
    assert(gold.count() == 999 * 2)
    assert(gold.filter(
      col("current_inventory") =!= col("snapshot_quantity") + col("change_quantity"))
      .count() == 0)
    // gold date_time can never precede the snapshot it is built on
    val snapTs = snapshot.select(col("item_id"), col("store_id"),
      col("date_time_ts"))
    assert(gold.join(snapTs, Seq("item_id", "store_id"))
      .filter(col("date_time") < col("date_time_ts")).count() == 0)
  }

  test("gold DataFrame chain and literal SQL agree row-for-row") {
    val sqlGold = PosPipeline.inventoryCurrentSql(spark, snapshot, changes, store, ctype)
    val a = gold.select("store_id", "item_id", "snapshot_quantity",
      "change_quantity", "current_inventory", "date_time")
      .collect().map((r: Row) => r.toSeq).toSet
    val b = sqlGold.collect().map((r: Row) => r.toSeq).toSet
    assert(a == b)
  }

  test("streaming replay (rate-limited file source) dedups like batch") {
    import graft.streaming.StreamingOps
    // one file per micro-batch = the reference's maxOffsetsPerTrigger idea;
    // the BOPIS duplicate pairs arrive in DIFFERENT batches this way
    val stream = PosPipeline.changesStream(spark, maxFilesPerTrigger = 1)
    val deduped = StreamingOps.watermarkDedup(stream, "date_time", "1 hour",
      Seq("trans_id", "item_id"))
    val got = StreamingOps.runToMemory(spark,
      deduped.select("trans_id", "item_id"),
      s"pos_stream_${System.nanoTime()}",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .distinct().count()
    val batch = changes.select("trans_id", "item_id").distinct().count()
    assert(got == batch,
      "streaming dedup key set must equal the batch dropDuplicates key set")
  }

  test("gold from streaming-parsed JSON events equals gold from CSV path") {
    import graft.operators.ApplyChanges
    // dropDuplicates picks an ARBITRARY BOPIS survivor (their timestamps
    // differ 2-14h), which can flip gold's date_time/range join — use a
    // deterministic earliest-report-wins dedup on BOTH paths to compare
    def dedupDet(df: org.apache.spark.sql.DataFrame) =
      ApplyChanges.latestByKey(df, Seq("trans_id", "item_id"),
        Seq(-unix_timestamp(col("date_time"))))
    // full wire round-trip: changes → transactions → JSON bytes →
    // parseEvents (from_json + explode) → dedup → gold, vs the direct path
    val viaWire = dedupDet(
      PosPipeline.parseEvents(
        PosPipeline.transactions(PosPipeline.readChanges(spark))
          .select(to_json(struct(
            col("trans_id"), col("store_id"), col("date_time"),
            col("change_type_id"), col("items"))).as("value")))
        // transactions() strips the {} braces; restore comparability by
        // deduping on the stripped id on both sides
      )
    val direct = dedupDet(
      PosPipeline.readChanges(spark).withColumn("trans_id",
        expr("substring(trans_id, 2, length(trans_id) - 2)")))
    val goldWire = PosPipeline.inventoryCurrent(snapshot, viaWire, store, ctype)
      .collect().map((r: Row) => r.toSeq).toSet
    val goldDirect = PosPipeline.inventoryCurrent(snapshot, direct, store, ctype)
      .collect().map((r: Row) => r.toSeq).toSet
    assert(goldWire == goldDirect)
  }

  test("transaction re-nesting round-trips through JSON parse + explode") {
    val tx = PosPipeline.transactions(PosPipeline.readChanges(spark))
    // one transaction per (date_time, trans_id); items re-nested
    assert(tx.groupBy("date_time", "trans_id").count().filter(col("count") > 1).count() == 0)
    val asJson = tx.select(to_json(struct(
      col("trans_id"), col("store_id"), col("date_time"),
      col("change_type_id"), col("items"))).as("value"))
    val parsed = PosPipeline.parseEvents(asJson)
    // explode returns one row per (trans, item): same row count as the
    // deduped-by-(trans,item,store,ct,ts) original pre-nesting input
    val exploded = parsed.count()
    val renested = tx.select(explode(col("items"))).count()
    assert(exploded == renested)
    assert(parsed.filter(col("item_id").isNull).count() == 0)
  }
}
