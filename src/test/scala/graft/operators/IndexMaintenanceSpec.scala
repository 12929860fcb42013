package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.ManagedTable

/** Unit contract of the unified tri-index maintenance tier: multi-tick
  * incremental maintenance equals a full rebuild after EVERY tick, the
  * index commit is one transaction (one version per tick), empty
  * changesets are no-op-safe, and emptied keys are tombstoned rather
  * than left at zero. (The end-to-end single-tick proof with the
  * DuckDB oracle is q197; the adversarial lifecycle interleavings are
  * LifecycleFuzzSpec's tri-index invariant.)
  */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus rows: text has a small vocabulary
  // (term collisions across docs exercise the cross-doc df algebra)
  // and enough bytes to chunk; embeddings are 4-dim float arrays
  // (array<float> is the vector contract — NativeKernels.floatVecDot)
  private def row(k: Long, v: Long): (Long, String, Array[Float], Long) = {
    val text = (0 until 10)
      .map(i => s"w${(v >> i) % 13}").mkString(" ") + s" tail$v"
    val emb = Array.tabulate(4)(i => (((v >> (2 * i)) % 7) - 3).toFloat + 1)
    (k, text, emb, v)
  }

  private def df(rows: Seq[(Long, Long)]): DataFrame =
    rows.map { case (k, v) => row(k, v) }.toDF("k", "text", "embedding", "seq")

  private val cent = Seq(
    (0L, Array(3f, 1f, 0f, -1f)), (1L, Array(-2f, 2f, 1f, 0f)),
    (2L, Array(0f, -1f, 3f, 2f)), (3L, Array(1f, 1f, 1f, 1f)))

  private def spec = IndexMaintenance.CorpusSpec(
    keyCol = "k", textCol = "text", embCol = "embedding",
    centroids = cent.toDF("cid", "cv"),
    deleteExpr = lit(false), exceptColumns = Seq("seq"))

  private def assertStateEqualsRebuild(corpus: String, idx: String,
      v: Int, clue: String): Unit = {
    val state = IndexMaintenance.indexState(spark, idx)
    val rebuild = IndexMaintenance.buildAll(
      ManagedTable.readCurrent(spark, corpus, lit(false), Seq("seq"),
        Some(v)), spec)
    assert(state.exceptAll(rebuild).isEmpty &&
      rebuild.exceptAll(state).isEmpty,
      s"$clue: incremental tri-index must equal the v$v full rebuild")
  }

  test("multi-tick maintenance tracks rebuilds; one index version per tick") {
    val corpus = Files.createTempDirectory("graft-im-corpus").toString
    val idx = Files.createTempDirectory("graft-im-idx").toString + "/t"
    val rnd = new scala.util.Random(7)
    var model = (0L until 25L).map(k => k -> rnd.nextLong(1 << 20)).toMap
    ManagedTable.merge(df(model.toSeq), corpus, Seq("k"), Seq(col("seq")))
    IndexMaintenance.bootstrap(spark, corpus, 1, spec, idx)
    assertStateEqualsRebuild(corpus, idx, 1, "bootstrap")
    for (tick <- 2 to 5) {
      // each tick: update a few keys, insert one, leave the rest alone
      val ups = model.keys.toSeq.sorted.take(3 + rnd.nextInt(5))
        .map(_ -> rnd.nextLong(1 << 20))
      val fresh = (100L + tick) -> rnd.nextLong(1 << 20)
      model = model ++ ups + fresh
      ManagedTable.merge(df(ups :+ fresh), corpus, Seq("k"),
        Seq(col("seq")))
      val before = ManagedTable.versions(spark, idx).size
      IndexMaintenance.maintainTick(spark, corpus, tick - 1, tick, spec, idx)
      assert(ManagedTable.versions(spark, idx).size == before + 1,
        "a tick must commit exactly one index version (one transaction)")
      assertStateEqualsRebuild(corpus, idx, tick, s"tick $tick")
    }
    // the index table maintains ITSELF too: after many per-tick merge
    // segments, compaction moves bytes without changing state, and
    // later ticks keep working across the compaction commit (files
    // carry by reference; the tick tag history survives)
    ManagedTable.compact(spark, idx, smallFileBytes = 64L * 1024 * 1024)
    assertStateEqualsRebuild(corpus, idx, 5, "post-compact")
    val ups = Seq(0L -> 999999L, 200L -> 123456L)
    ManagedTable.merge(df(ups), corpus, Seq("k"), Seq(col("seq")))
    IndexMaintenance.maintainTick(spark, corpus, 5, 6, spec, idx)
    assertStateEqualsRebuild(corpus, idx, 6, "tick after index compaction")
  }

  test("no-op changeset ticks cleanly; emptied keys are tombstoned not zeroed") {
    val corpus = Files.createTempDirectory("graft-im2-corpus").toString
    val idx = Files.createTempDirectory("graft-im2-idx").toString + "/t"
    // two docs sharing no content: k=1 only ever contributes its own keys
    ManagedTable.merge(df(Seq(1L -> 11L, 2L -> 222222L)), corpus,
      Seq("k"), Seq(col("seq")))
    IndexMaintenance.bootstrap(spark, corpus, 1, spec, idx)
    // v2: merge an UNCHANGED row — CDF is empty, tick must still work
    ManagedTable.merge(df(Seq(1L -> 11L)), corpus, Seq("k"),
      Seq(col("seq")))
    IndexMaintenance.maintainTick(spark, corpus, 1, 2, spec, idx)
    assertStateEqualsRebuild(corpus, idx, 2, "empty changeset")
    // v3: physically delete k=2 (deleteWhere — a DV-only commit) and
    // tick; every key only k=2 referenced must LEAVE the index
    ManagedTable.deleteWhere(spark, corpus, col("k") === 2)
    val v3 = ManagedTable.versions(spark, corpus).last
    IndexMaintenance.maintainTick(spark, corpus, 2, v3, spec, idx)
    assertStateEqualsRebuild(corpus, idx, v3, "post-delete")
    val only2 = IndexMaintenance.indexState(spark, idx)
      .filter(col("family") === "lex" && col("key") === "tail222222")
    assert(only2.isEmpty,
      "a term only the deleted doc contained must be gone from the index")
    // the tombstone is physical in the read view: raw table rows with
    // op='d' exist, readCurrent filters them
    val raw = ManagedTable.read(spark, idx)
      .filter(col("key") === "tail222222")
    assert(raw.count() == 1 &&
      raw.select("op").as[String].collect().head == "d",
      "emptied keys must be tombstoned (op='d'), not dropped silently")
  }

  test("cdcStreamingSink: corpus + tri-index advance together, exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-im3").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/idx"
    // changelog replay: three micro-batches of upserts over a shared
    // key space (later batches overwrite earlier keys)
    val batches = Seq(
      Seq(1L -> 10L, 2L -> 20L, 3L -> 30L),
      Seq(2L -> 220L, 4L -> 40L),
      Seq(1L -> 110L, 5L -> 50L, 3L -> 330L))
    batches.zipWithIndex.foreach { case (b, i) =>
      df(b.map { case (k, v) => k -> (v + i * 1000L) })
        .coalesce(1).write.mode("append").parquet(s"$root/in")
    }
    val schema = df(Seq(1L -> 1L)).schema
    val q = IndexMaintenance.cdcStreamingSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
        corpus, idx, spec, keys = Seq("k"),
        sequenceBy = Seq(col("seq")))
      .option("checkpointLocation", ckptDir("im3"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val corpusVs = ManagedTable.versions(spark, corpus)
    assert(corpusVs.size >= 3,
      "each micro-batch must commit one corpus merge version")
    assertStateEqualsRebuild(corpus, idx, corpusVs.last,
      "streamed maintenance")
    assert(IndexMaintenance.lastIndexedVersion(spark, idx) == corpusVs.last,
      "the index's tick-tag history must record the corpus head")
    // crash-replay: re-running the last tick (same from→to) is a no-op —
    // the tick tag is already in the index manifest log
    val nv = ManagedTable.versions(spark, idx).size
    IndexMaintenance.maintainTick(spark, corpus,
      corpusVs.last - 1, corpusVs.last, spec, idx)
    assert(ManagedTable.versions(spark, idx).size == nv,
      "a replayed tick must not double-apply its delta")
    // ...and a crash BETWEEN corpus commit and index tick recovers: a
    // fresh merge lands (simulating the batch's first half), then the
    // sink's resume logic (lastIndexedVersion < current) completes it
    ManagedTable.merge(df(Seq(9L -> 90L)), corpus, Seq("k"),
      Seq(col("seq")), tag = "m99")
    val cur = ManagedTable.versions(spark, corpus).last
    val resume = IndexMaintenance.lastIndexedVersion(spark, idx)
    assert(resume < cur)
    IndexMaintenance.maintainTick(spark, corpus, resume, cur, spec, idx)
    assertStateEqualsRebuild(corpus, idx, cur, "post-crash resume")
  }

  test("consistentSnapshot: a reader never straddles an in-flight tick") {
    val corpus = Files.createTempDirectory("graft-im4-corpus").toString
    val idx = Files.createTempDirectory("graft-im4-idx").toString + "/t"
    def pairConsistent(clue: String): Int = {
      val (snap, state, v, _) =
        IndexMaintenance.consistentSnapshot(spark, corpus, idx, spec)
      val rebuild = IndexMaintenance.buildAll(snap, spec)
      assert(state.exceptAll(rebuild).isEmpty &&
        rebuild.exceptAll(state).isEmpty,
        s"$clue: the pinned pair must satisfy index == buildAll(corpus)")
      v
    }
    ManagedTable.merge(df(Seq(1L -> 10L, 2L -> 20L)), corpus,
      Seq("k"), Seq(col("seq")))
    IndexMaintenance.bootstrap(spark, corpus, 1, spec, idx)
    ManagedTable.merge(df(Seq(2L -> 220L, 3L -> 30L)), corpus,
      Seq("k"), Seq(col("seq")))
    IndexMaintenance.maintainTick(spark, corpus, 1, 2, spec, idx)
    assert(pairConsistent("at the head") == 2)
    // the corpus head advances with NO tick — the straddle window a
    // naive "latest corpus + latest index" reader falls into
    ManagedTable.merge(df(Seq(1L -> 110L, 4L -> 40L)), corpus,
      Seq("k"), Seq(col("seq")))
    assert(ManagedTable.versions(spark, corpus).last == 3)
    assert(pairConsistent("mid-ingest") == 2,
      "the pinned corpus version must be the last TICKED one, not the head")
    // once the tick lands, the pair re-pins at the new head
    IndexMaintenance.maintainTick(spark, corpus, 2, 3, spec, idx)
    assert(pairConsistent("post-tick") == 3)
  }

  test("cdcStreamingSink crash fuzz: every (batch, point) crash recovers exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val batches = Seq(
      Seq(1L -> 10L, 2L -> 20L, 3L -> 30L),
      Seq(2L -> 220L, 4L -> 40L),
      Seq(1L -> 110L, 5L -> 50L, 3L -> 330L))
    // crash through the REAL micro-batch machinery at every boundary the
    // two-ledger recovery argument names: after the corpus merge but
    // before the index tick ("merged" — the window where the ledgers
    // disagree), and after both commits but before the batch completes
    // ("ticked" — a replayed fully-committed batch), for EVERY batch
    val points = for {
      b <- batches.indices; p <- Seq("merged", "ticked")
    } yield (p, b)
    points.foreach { case (pt, pb) =>
      val root = Files.createTempDirectory(s"graft-imf-$pt$pb").toString
      val (corpus, idx) = (s"$root/corpus", s"$root/idx")
      batches.zipWithIndex.foreach { case (b, i) =>
        df(b.map { case (k, v) => k -> (v + i * 1000L) })
          .coalesce(1).write.mode("append").parquet(s"$root/in")
      }
      val schema = df(Seq(1L -> 1L)).schema
      def sink(fault: (String, Long) => Unit) =
        IndexMaintenance.cdcStreamingSink(
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
            corpus, idx, spec, keys = Seq("k"),
            sequenceBy = Seq(col("seq")), faultPoint = fault)
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow())
      val crashed = sink((p, b) =>
        if (p == pt && b == pb)
          throw new RuntimeException(s"injected crash $pt b$b")).start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        crashed.awaitTermination()
      }
      // restart on the same checkpoint with no fault: the crashed batch
      // replays, finds whatever it already committed by tag, and
      // completes; the remaining batches then drain
      val resumed = sink((_, _) => ()).start()
      resumed.awaitTermination()
      val head = ManagedTable.versions(spark, corpus).last
      assert(ManagedTable.versions(spark, corpus).size == batches.size,
        s"$pt b$pb: a replayed merge must not commit a second version")
      assert(IndexMaintenance.lastIndexedVersion(spark, idx) == head,
        s"$pt b$pb: the index tick history must reach the corpus head")
      assertStateEqualsRebuild(corpus, idx, head, s"crash at $pt b$pb")
    }
  }
}
