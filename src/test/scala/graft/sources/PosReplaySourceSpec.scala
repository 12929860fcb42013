package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.pos.PosPipeline
import graft.streaming.StreamingOps

/** The DataSource V2 replay source must honor the Kafka wire contract,
  * rate-limit per micro-batch, and feed the standard silver parse to the
  * same result as the batch path.
  */
class PosReplaySourceSpec extends SparkSpec {

  test("batch read: wire schema, one doc per transaction, ordered offsets") {
    val df = spark.read.format("graft.sources.PosReplaySource").load()
    assert(df.schema == PosReplaySource.wireSchema)
    val n = df.count()
    val txCount = PosPipeline.transactions(PosPipeline.readChanges(spark)).count()
    assert(n == txCount, "one wire doc per re-nested transaction")
    assert(df.agg(min("offset"), max("offset")).head.toSeq == Seq(0L, n - 1))
  }

  test("rate limiting: maxRecordsPerTrigger bounds each micro-batch") {
    val stream = spark.readStream.format("graft.sources.PosReplaySource")
      .option("maxRecordsPerTrigger", 500).load()
    val counted = stream
      .withColumn("batch", spark_partition_id()) // not batch id; just force eval
    val q = counted.writeStream.format("memory")
      .queryName("replay_rate")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckptDir("replay"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress
    assert(progress.forall(p => p.numInputRows <= 500),
      s"micro-batches over the cap: ${progress.map(_.numInputRows).mkString(",")}")
    assert(spark.table("replay_rate").count() ==
      spark.read.format("graft.sources.PosReplaySource").load().count())
  }

  test("streamed replay through silver parse equals batch transactions") {
    val stream = spark.readStream.format("graft.sources.PosReplaySource")
      .option("maxRecordsPerTrigger", 1000).load()
    val silver = PosPipeline.parseEvents(
      stream.select(col("value").cast("string").as("value")))
    val got = StreamingOps.runToMemory(spark, silver,
        s"replay_silver_${System.nanoTime()}", OutputMode.Append())
      .select("trans_id", "item_id", "store_id", "quantity")
      .collect().map(_.toSeq).toSet
    val want = PosPipeline.parseEvents(
        PosPipeline.transactions(PosPipeline.readChanges(spark))
          .select(to_json(struct(col("trans_id"), col("store_id"),
            col("date_time"), col("change_type_id"), col("items"))).as("value")))
      .select("trans_id", "item_id", "store_id", "quantity")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
