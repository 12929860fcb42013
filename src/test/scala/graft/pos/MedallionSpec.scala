package graft.pos

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The persistent medallion: bronze/silver/gold parquet tables with
  * checkpointed streaming stages. Gold must equal a batch recompute over
  * the same bronze data, and re-running the whole pipeline must be a
  * no-op (restart safety without data loss or duplication).
  */
class MedallionSpec extends SparkSpec {

  test("medallion gold equals the batch recompute; re-run is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-medallion").toString

    val gold = Medallion.runAll(spark, root)
      .orderBy("store_id", "item_id").collect().toSeq

    // batch reference over the SAME bronze table: identical parse, then a
    // deterministic earliest-first dedup — the same winner the streaming
    // dropDuplicates picks, because replay arrival order is sorted by
    // (date_time, trans_id) and same-timestamp duplicates merge into one
    // doc with items sorted by (item_id, quantity)
    val parsed = PosPipeline.parseEvents(
      spark.read.parquet(s"$root/bronze")
        .withColumn("value", col("value").cast("string")))
    val w = Window.partitionBy("trans_id", "item_id")
      .orderBy(col("date_time").asc, col("store_id").asc,
        col("quantity").asc, col("change_type_id").asc)
    val detDedup = parsed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val batchGold = PosPipeline.inventoryCurrent(
        PosPipeline.inventorySnapshot(PosPipeline.readSnapshots(spark)),
        detDedup, PosPipeline.readStore(spark), PosPipeline.readChangeType(spark))
      .orderBy("store_id", "item_id").collect().toSeq
    assert(gold.nonEmpty && gold == batchGold)

    // restart with nothing new to process: checkpoints make every stage
    // resume-and-finish without appending — tables stay byte-identical
    val bronzeCount = spark.read.parquet(s"$root/bronze").count()
    val silverCount = spark.read.parquet(s"$root/silver").count()
    val goldAgain = Medallion.runAll(spark, root)
      .orderBy("store_id", "item_id").collect().toSeq
    assert(goldAgain == gold)
    assert(spark.read.parquet(s"$root/bronze").count() == bronzeCount)
    assert(spark.read.parquet(s"$root/silver").count() == silverCount)

    // silver respects the dedup contract: unique (trans_id, item_id)
    val silver = spark.read.parquet(s"$root/silver")
    assert(silver.count() ==
      silver.select("trans_id", "item_id").distinct().count())
  }
}
