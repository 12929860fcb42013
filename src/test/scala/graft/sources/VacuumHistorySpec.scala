package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Retention GC for table history ([[ManagedTable.vacuumHistory]]):
  * manifests below the horizon drop, their private segments' bytes
  * come back, retained versions stay fully readable, time travel
  * below the horizon fails cleanly, streaming replay idempotence
  * survives through the retired-tags ledger, and streams interact
  * with the horizon exactly as documented (resume above it, fresh
  * snapshot start, fail-fast below it).
  */
class VacuumHistorySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-vh-$name").toString + "/t"

  private def kv(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"),
      (col("id") * 2).as("v")).coalesce(1)

  test("drops manifests, reclaims dead segments' bytes, keeps " +
      "retained versions readable; below-horizon reads fail cleanly") {
    val dir = tmp("basic")
    // v1..v3 are FULL-REPLACE commits: each makes its predecessor's
    // segment dead weight only that manifest still protects
    (0 until 3).foreach(i => ManagedTable.commit(kv(0, 100 + i), dir))
    ManagedTable.appendCommit(kv(1000, 1010), dir) // v4 appends
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3, 4))
    val dataDirs = new java.io.File(dir, "data").listFiles().length
    assert(dataDirs == 4)

    val stats = ManagedTable.vacuumHistory(spark, dir,
      retainVersions = 2, retentionMs = 0)
    assert(stats.droppedVersions == Seq(1, 2))
    // v1 and v2's full-replace segments are unreferenced once their
    // manifests die (v3 re-wrote everything, v4 appended on top)
    assert(stats.sweptSegments.size == 2, s"swept=${stats.sweptSegments}")
    assert(stats.reclaimedBytes > 0L)
    assert(new java.io.File(dir, "data").listFiles().length == 2)

    assert(ManagedTable.versions(spark, dir) == Seq(3, 4))
    assert(ManagedTable.read(spark, dir).count() == 112) // 102 + 10
    assert(ManagedTable.read(spark, dir, Some(3)).count() == 102)
    val e = intercept[IllegalArgumentException] {
      ManagedTable.read(spark, dir, Some(2))
    }
    assert(e.getMessage.contains("not in"))
    intercept[Exception] { ManagedTable.restore(spark, dir, 1) }
    // idempotent: nothing left below the horizon
    val again = ManagedTable.vacuumHistory(spark, dir, 2, 0)
    assert(again.droppedVersions.isEmpty && again.reclaimedBytes == 0L)
    // history() reports exactly the survivors
    assert(ManagedTable.history(spark, dir)
      .select("version").as[Int].collect().sorted.toSeq == Seq(3, 4))
  }

  test("retention window protects young segments from the sweep") {
    val dir = tmp("retain")
    (0 until 3).foreach(i => ManagedTable.commit(kv(0, 50 + i), dir))
    val stats = ManagedTable.vacuumHistory(spark, dir,
      retainVersions = 1) // default retention: minutes
    assert(stats.droppedVersions == Seq(1, 2))
    assert(stats.sweptSegments.isEmpty,
      "segments younger than the retention window must survive")
    // the next plain vacuum (or vacuumHistory) sweeps them once aged
    assert(ManagedTable.vacuum(spark, dir, retentionMs = 0).size == 2)
  }

  test("streaming replay idempotence survives the horizon: retired " +
      "tags stay committed") {
    val dir = tmp("tags")
    assert(ManagedTable.idempotentAppend(kv(0, 10), dir, batchId = 7L))
    assert(ManagedTable.idempotentAppend(kv(10, 20), dir, batchId = 8L))
    assert(ManagedTable.idempotentAppend(kv(20, 30), dir, batchId = 9L))
    ManagedTable.vacuumHistory(spark, dir, retainVersions = 1,
      retentionMs = 0)
    assert(ManagedTable.versions(spark, dir) == Seq(3))
    // replayed batches whose tags lived in DROPPED manifests must
    // still be recognized — the retired-tags ledger is the memory
    assert(!ManagedTable.idempotentAppend(kv(0, 10), dir, 7L),
      "a retired batch tag must still dedupe a replay")
    assert(!ManagedTable.idempotentAppend(kv(10, 20), dir, 8L))
    // a genuinely NEW batch still lands
    assert(ManagedTable.idempotentAppend(kv(30, 40), dir, 10L))
    assert(ManagedTable.read(spark, dir).count() == 40)
    // a second vacuum accumulates the ledger (union, newest file wins)
    ManagedTable.vacuumHistory(spark, dir, retainVersions = 1,
      retentionMs = 0)
    assert(!ManagedTable.idempotentAppend(kv(0, 10), dir, 7L))
    assert(!ManagedTable.idempotentAppend(kv(30, 40), dir, 10L))
  }

  test("a stream resumed from a retained offset is unaffected; a " +
      "fresh stream emits the oldest retained version as a snapshot; " +
      "a below-horizon checkpoint fails fast") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp("stream")

    def drain(ckpt: String, seen: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("k").collect().map(_.getLong(0)) }; ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // checkpoint B consumes only v1 (offset 1 — BELOW the horizon soon)
    ManagedTable.appendCommit(kv(0, 10), dir)
    val ckptB = Files.createTempDirectory("graft-vh-ckB").toString
    val seenB = scala.collection.mutable.ArrayBuffer.empty[Long]
    drain(ckptB, seenB)
    assert(seenB.sorted.toSeq == (0L until 10L))

    (1 until 4).foreach(i =>
      ManagedTable.appendCommit(kv(i * 10, (i + 1) * 10), dir))

    // checkpoint A consumes everything (offset = 4, above any horizon)
    val ckptA = Files.createTempDirectory("graft-vh-ckA").toString
    val seenA = scala.collection.mutable.ArrayBuffer.empty[Long]
    drain(ckptA, seenA)
    assert(seenA.sorted.toSeq == (0L until 40L))

    ManagedTable.vacuumHistory(spark, dir, retainVersions = 2,
      retentionMs = 0) // keep v3, v4
    ManagedTable.appendCommit(kv(40, 50), dir) // v5 after the vacuum

    // A resumes above the horizon: only the new version arrives
    drain(ckptA, seenA)
    assert(seenA.sorted.toSeq == (0L until 50L),
      "a retained-offset resume must continue exactly-once")

    // B's offset predates the horizon: fail fast, name the remedy
    val seenB2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val eB = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(ckptB, seenB2)
    }
    assert(eB.getMessage.contains("vacuumHistory") ||
      eB.getCause.getMessage.contains("vacuumHistory"),
      s"expected the vacuumed-offset error, got: ${eB.getMessage}")

    // a FRESH stream starts from the oldest retained version as a
    // full snapshot (v3 = rows 0..29) and tails v4, v5
    val ckptC = Files.createTempDirectory("graft-vh-ckC").toString
    val seenC = scala.collection.mutable.ArrayBuffer.empty[Long]
    drain(ckptC, seenC)
    assert(seenC.sorted.toSeq == (0L until 50L),
      "fresh stream = snapshot of oldest retained version + tail")
    // and its checkpoint resumes cleanly across new commits
    ManagedTable.appendCommit(kv(50, 60), dir)
    drain(ckptC, seenC)
    assert(seenC.sorted.toSeq == (0L until 60L))
  }

  test("losing the retired-tags ledger create race is SUCCESS: a " +
      "racing maintenance writer's identical ledger doesn't fail the " +
      "vacuum") {
    val dir = tmp("race")
    (0 until 3).foreach(i => ManagedTable.appendCommit(
      kv(i * 10, (i + 1) * 10), dir))
    // simulate the racing winner: retainVersions=2 drops exactly {1},
    // so the loser will try to create retired-v1.json with these
    // deterministic bytes — which already exist
    val conf = spark.sparkContext.hadoopConfiguration
    val ledger = new org.apache.hadoop.fs.Path(dir, "_manifest/retired-v1.json")
    val fs = ledger.getFileSystem(conf)
    val out = fs.create(ledger, false)
    try out.write("""{"upto":1,"tags":[]}""".getBytes("UTF-8"))
    finally out.close()
    val stats = ManagedTable.vacuumHistory(spark, dir,
      retainVersions = 2, retentionMs = 0) // must NOT throw
    assert(ManagedTable.versions(spark, dir) == Seq(2, 3),
      "the losing racer still completes the manifest drop")
    assert(spark.read.format("graft").load(dir).count() == 30L)
    // the ledger survives with the winner's (identical) content
    val in = fs.open(ledger)
    val body = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    assert(body.contains("\"upto\":1"))
  }
}
