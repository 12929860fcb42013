package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.sources.ManagedTable

/** dedupAgainstStore: in-batch survivors are deterministic (smallest
  * id per fingerprint), cross-batch duplicates are dropped against the
  * PERSISTENT store (not stream state), and a full restart replays
  * nothing — both tables are idempotent under the b<batchId> tags.
  */
class StoreDedupSpec extends SparkSpec {
  import spark.implicits._

  private def writeInputFile(dir: String, name: String,
      rows: Seq[(Long, String)], mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-sd-tmp").toString
    rows.toDF("id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = new java.io.File(dir, name)
    assert(part.renameTo(dest))
    assert(dest.setLastModified(mtime)) // file source processes oldest first
  }

  test("cross-batch dedup against the persistent store, exactly-once") {
    val root = Files.createTempDirectory("graft-sd").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    // batch 1: id 3 duplicates id 1 in-batch → survivors 1(aa), 2(bb)
    writeInputFile(in, "a.parquet",
      Seq((1L, "aa"), (2L, "bb"), (3L, "aa")), t0)
    // batch 2: id 4 duplicates batch 1's bb (cross-batch, via the
    // STORE); 5/6 duplicate each other in-batch → survivor 5(cc)
    writeInputFile(in, "b.parquet",
      Seq((4L, "bb"), (5L, "cc"), (6L, "cc")), t0 + 10000)
    def run(): Unit = {
      val stream = spark.readStream
        .schema("id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(in)
      val q = StreamingOps.dedupAgainstStore(stream, md5(col("text")),
          "id", s"$root/store", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val out = ManagedTable.read(spark, s"$root/out")
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 5L),
      s"expected survivors 1/2/5 (smallest id per fp, store-dedup'd), got $out")
    val store = ManagedTable.read(spark, s"$root/store").count()
    assert(store == 3, "one fingerprint per distinct text")
    // full restart: checkpointed offsets + tagged commits replay nothing
    run()
    assert(ManagedTable.read(spark, s"$root/out")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
    assert(ManagedTable.read(spark, s"$root/store").count() == 3)
    // a later batch with only known fingerprints adds no new rows
    writeInputFile(in, "c.parquet", Seq((7L, "aa"), (8L, "cc")),
      t0 + 20000)
    run()
    assert(ManagedTable.read(spark, s"$root/out").count() == 3,
      "all-duplicate batch must contribute nothing")
  }
}
