package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom-filter file skipping ([[BloomSkipping]]): point lookups on a
  * high-cardinality UNCLUSTERED column — the shape where every file's
  * [min, max] spans the whole domain and zone maps prune nothing.
  */
class BloomSkippingSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-bloom-$name").toString + "/t"

  /** Three single-file segments whose `u` values INTERLEAVE across the
    * full domain (file i holds u ≡ i mod 6, i ∈ {0,1,2}), so every
    * file's [min, max] covers nearly everything — min/max pruning is
    * useless by construction and only the digest can exclude a file.
    * Residues 3–5 never occur: in-range values provably in NO file.
    * `s` is a string twin (`v<u>`) of the same interleaving.
    */
  private def threeInterleaved(dir: String): Unit = {
    ManagedTable.commit(
      spark.range(0).select(col("id").as("k"), col("id").as("u"),
        col("id").cast("string").as("s")), dir)
    ManagedTable.setTableProperties(spark, dir,
      Map(BloomSkipping.ColumnsProp -> "u,s"))
    (0 until 3).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(100).select(
          (col("id") * 6 + i).as("k"),
          (col("id") * 6 + i).as("u"),
          concat(lit("v"), (col("id") * 6 + i).cast("string")).as("s"))
          .coalesce(1), dir)
    }
  }

  private def planString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** Planned file count from the scan description (`files=k/n`). */
  private def filesPlanned(plan: String): Int = {
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no GraftScan files= marker in:\n$plan")
    m.get.group(1).toInt
  }

  test("equality on an interleaved column prunes to the one holding file") {
    val dir = tmp("eq")
    threeInterleaved(dir)
    val t = spark.read.format("graft").load(dir)

    // u=151 ≡ 1 (mod 6) → only file 1 can hold it; its [min, max] =
    // [1, 595] contains 151, so only the digest prunes
    val q = t.filter(col("u") === 151L)
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(151L))
    assert(filesPlanned(planString(q)) == 1)

    // string digest: same interleaving, same pruning
    val qs = t.filter(col("s") === "v152")
    assert(qs.collect().map(_.getString(2)).toSeq == Seq("v152"))
    assert(filesPlanned(planString(qs)) == 1)

    // IN across two residue classes keeps exactly the two holders
    val qin = t.filter(col("u").isin(151L, 152L))
    assert(qin.collect().map(_.getLong(1)).sorted.toSeq == Seq(151L, 152L))
    assert(filesPlanned(planString(qin)) == 2)

    // an in-range value with residue 4 exists in NO file: min/max
    // keeps everything, every digest answers definitely-absent
    val qmiss = t.filter(col("u") === 100L)
    assert(qmiss.collect().isEmpty)
    assert(filesPlanned(planString(qmiss)) == 0)

    // range probes never consult digests (shape mismatch): kept wide.
    // [100, 110] holds 102,103,104,108,109,110 (residues 0,1,2 mod 6)
    val qr = t.filter(col("u") >= 100L && col("u") <= 110L)
    assert(qr.count() == 6)
    assert(filesPlanned(planString(qr)) == 3)
  }

  test("probe budget: a candidate set exceeding the cache cap stops " +
      "loading sidecars after one cache-full (fail-open, no thrash)") {
    val dir = tmp("budget")
    threeInterleaved(dir)
    val t = spark.read.format("graft").load(dir)
    // cap so small one sidecar load (~192 B payload+overhead for 100
    // distinct values) exhausts the pass budget: the first candidate
    // is probed and excluded, the remaining two are kept fail-open
    // instead of loading (what would be) a thrashing re-read each pass
    spark.conf.set(BloomSkipping.CacheBytesConf, "100")
    try {
      val skipsBefore = BloomSkipping.budgetSkips.get()
      val q = t.filter(col("u") === 100L) // residue 4: in NO file
      assert(q.collect().isEmpty, "fail-open may weaken pruning, " +
        "never correctness")
      val planned = filesPlanned(planString(q))
      assert(planned == 2,
        s"expected 1 probed+excluded, 2 kept fail-open; got $planned")
      assert(BloomSkipping.budgetSkips.get() > skipsBefore,
        "budget skips should have been recorded")
    } finally spark.conf.unset(BloomSkipping.CacheBytesConf)
    // with the default cap the same probe prunes everything again
    val q2 = spark.read.format("graft").load(dir)
      .filter(col("u") === 100L)
    assert(q2.collect().isEmpty)
    assert(filesPlanned(planString(q2)) == 0)
  }

  test("no false negatives: every stored value still found after digesting") {
    val dir = tmp("sweep")
    threeInterleaved(dir)
    val t = spark.read.format("graft").load(dir)
    (0 until 100 by 5).foreach { i =>
      (0 until 3).foreach { f =>
        val v = i * 6 + f
        val hit = t.filter(col("u") === v.toLong).collect()
        assert(hit.length == 1 && hit.head.getLong(1) == v.toLong,
          s"digest false negative at u=$v")
        val hs = t.filter(col("s") === s"v$v").collect()
        assert(hs.length == 1, s"digest false negative at s=v$v")
      }
    }
  }

  test("fail-open: a deleted sidecar keeps the file (correct, just unpruned)") {
    val dir = tmp("failopen")
    threeInterleaved(dir)
    // destroy every sidecar under data/
    def rmBf(f: java.io.File): Unit =
      if (f.isDirectory) {
        if (f.getName == "_bf") { f.listFiles().foreach(_.delete()); f.delete(); () }
        else Option(f.listFiles()).foreach(_.foreach(rmBf))
      }
    rmBf(new java.io.File(dir, "data"))
    val t = spark.read.format("graft").load(dir)
    val q = t.filter(col("u") === 151L)
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(151L))
    assert(filesPlanned(planString(q)) == 3,
      "missing sidecars must keep files, never drop them")
  }

  test("join-driven runtime pruning probes the digest per build-side key") {
    val dir = tmp("runtime")
    threeInterleaved(dir)
    val meta = GraftTableMeta.resolve(dir, None)
    def freshScan(): GraftScan =
      new GraftScanBuilder(meta).build().asInstanceOf[GraftScan]

    // both keys ≡ 1 (mod 6) — every [min, max] contains them, but only
    // file 1's digest can: runtime pruning lands on one file
    val scan = freshScan()
    val before = scan.planInputPartitions().length
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("u"),
      Expressions.literal(151L), Expressions.literal(157L)))))
    assert(scan.planInputPartitions().length == 1,
      s"expected 1 of $before files after digest-backed runtime pruning")

    // a key no file holds: zero files survive
    val s2 = freshScan()
    s2.filter(Array(new Predicate("=", Array(
      Expressions.column("u"), Expressions.literal(100L)))))
    assert(s2.planInputPartitions().isEmpty)
  }

  test("a real star join's dynamic pruning reaches the digests: the " +
      "executed fact scan reads only the holder file") {
    val dir = tmp("dpp")
    ManagedTable.commit(
      spark.range(0).select(col("id").as("k"), col("id").as("v")), dir)
    ManagedTable.setTableProperties(spark, dir,
      Map(BloomSkipping.ColumnsProp -> "k"))
    // UNCLUSTERED interleave: file i holds k ≡ i (mod 3) — min/max
    // spans everything, only the digest can prune the join's key set
    (0 until 3).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(1000).select((col("id") * 3 + i).as("k"),
          (col("id") * 2).as("v")).coalesce(1), dir)
    }
    val fact = spark.read.format("graft").load(dir)
    // dim: parquet-backed with a SELECTIVE filter (what makes Spark's
    // dynamic pruning consider the join); keys 1500/1503/1506/1509
    // are all ≡ 0 (mod 3) → one holder file
    val dimPath = Files.createTempDirectory("graft-bloom-dim").toString
    spark.range(0, 3000).select(col("id").as("dk"),
      (col("id") % 7).as("band"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("dk") >= 1500 && col("dk") < 1510 &&
        col("dk") % 3 === 0)
    val q = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "v", "band")
    // the DESCRIPTION string renders a pre-filter plan copy, so the
    // honest observation is the EXECUTED work: total records read
    // across all tasks = dim's 3000 + the fact files actually opened
    // (1000/file). 1 holder file → 4000; unpruned → 6000.
    val read = new java.util.concurrent.atomic.LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.add(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1500L, 1503L, 1506L, 1509L))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected Spark to plan dynamic pruning into the scan:\n$plan")
      // listener delivery is async — poll to quiescence
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = read.sum()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      assert(last > 0L, "listener saw no input metrics")
      assert(last <= 4500L,
        s"expected ~4000 records read (3000 dim + 1 fact file), got " +
          s"$last — runtime digest pruning did not reach the scan")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("compaction rebuilds digests for the packed files") {
    val dir = tmp("compact")
    threeInterleaved(dir)
    ManagedTable.compact(spark, dir)
    val t = spark.read.format("graft").load(dir)
    assert(t.count() == 300)
    val q = t.filter(col("u") === 151L)
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(151L))
    val head = ManagedTable.readManifest(spark, dir,
      ManagedTable.versions(spark, dir).last)
    val dataStats = head._4.filter { case (k, st) =>
      k.startsWith("data/") &&
        st.get(ManagedTable.RowsStat).exists(_._1 != "0")
    }
    assert(dataStats.nonEmpty && dataStats.values.forall(m =>
      m.contains(BloomSkipping.statKey("u")) &&
        m.contains(BloomSkipping.statKey("s"))),
      s"compacted files must carry digests: ${dataStats.keySet}")
  }

  test("replaceWhere keeps digests on the fresh replacement segment") {
    val dir = tmp("cow")
    threeInterleaved(dir)
    ManagedTable.replaceWhere(spark, dir, col("u") <= 2L,
      spark.range(3).select(col("id").as("k"), col("id").as("u"),
        concat(lit("v"), col("id").cast("string")).as("s")))
    val t = spark.read.format("graft").load(dir)
    assert(t.count() == 300)
    val q = t.filter(col("u") === 1L)
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(1L))
    // the original holder's digest is stale-but-sound (it still
    // CONTAINS 1 — the row is tombstoned, not un-hashed) and the
    // replacement's digest holds 1: two files survive, the digest
    // still drops the other two original files
    assert(filesPlanned(planString(q)) == 2)
  }

  test("ineligible types and absent columns REFUSE at SET — typo " +
      "feedback, not a silently-inert digest list") {
    val dir = tmp("types")
    ManagedTable.commit(
      spark.range(0).select(col("id").as("k"),
        col("id").cast("double").as("d")), dir)
    val eMissing = intercept[IllegalArgumentException] {
      ManagedTable.setTableProperties(spark, dir,
        Map(BloomSkipping.ColumnsProp -> "missing"))
    }
    assert(eMissing.getMessage.contains("not in the table schema"))
    val eType = intercept[IllegalArgumentException] {
      ManagedTable.setTableProperties(spark, dir,
        Map(BloomSkipping.ColumnsProp -> "d"))
    }
    assert(eType.getMessage.contains("integral, string, date and " +
      "timestamp"))
    val eCluster = intercept[IllegalArgumentException] {
      ManagedTable.setTableProperties(spark, dir,
        Map(ManagedTable.ClusterByProp -> "nope"))
    }
    assert(eCluster.getMessage.contains("not in the table schema"))
    // a valid declaration passes, and the write side still guards
    // independently (absent/ineligible names are skipped, fail-open)
    ManagedTable.setTableProperties(spark, dir,
      Map(BloomSkipping.ColumnsProp -> "k"))
    ManagedTable.appendCommit(
      spark.range(10).select(col("id").as("k"),
        col("id").cast("double").as("d")).coalesce(1), dir)
    val head = ManagedTable.readManifest(spark, dir,
      ManagedTable.versions(spark, dir).last)
    assert(head._4.exists(_._2.contains(BloomSkipping.statKey("k"))))
    assert(head._4.values.forall(m =>
      !m.contains(BloomSkipping.statKey("d"))))
    assert(spark.read.format("graft").load(dir).count() == 10)
  }

  test("compact(rewriteDvFraction) purges a tombstoned file and " +
      "rebuilds its digest from survivors only") {
    val dir = tmp("purge")
    threeInterleaved(dir) // v1 props, v2..v4 = one file per residue
    // tombstone a MID-RANGE slice of residue-1's file (u ≡ 1 mod 6,
    // 100 ≤ u ≤ 400 → 50 of its 100 rows, ids 17..66) — mid-range so
    // the packed survivor file's [min, max] still SPANS the purged
    // values and only the digest can prove their absence
    ManagedTable.deleteWhere(spark, dir,
      col("u") % 6 === 1 && col("u").between(100, 400))
    val preVs = ManagedTable.versions(spark, dir)
    val (_, preAll, _, _) = ManagedTable.readManifest(spark, dir, preVs.last)
    assert(ManagedTable.splitDv(preAll)._2.nonEmpty, "delete left a DV")

    // size trigger disabled (nothing is < 1 byte): only the DV
    // fraction selects the rewrite set — exactly the 50%-tombstoned
    // file, regardless of its size
    val v = ManagedTable.compact(spark, dir, smallFileBytes = 1L,
      rewriteDvFraction = Some(0.4))
    assert(v == preVs.last + 1)
    val (_, all, _, stats) = ManagedTable.readManifest(spark, dir, v)
    val (files, dvFiles) = ManagedTable.splitDv(all)
    assert(files.size == 4,
      "the empty create part + two kept + one packed")
    assert(dvFiles.isEmpty,
      "the only tombstoned file was rewritten — DV reference dropped")
    // every row-bearing file carries a digest (the packed one was
    // rebuilt in the compaction commit's stats pass); the zero-row
    // create part legitimately has none
    assert(files.count(f => stats.get(f).exists(
      _.contains(BloomSkipping.statKey("u")))) == 3)

    val t = spark.read.format("graft").load(dir)
    assert(t.count() == 250, "300 minus the 50 tombstoned")
    // a SURVIVOR of the rewritten file still probes to exactly one
    // file (no false negatives, by construction)
    val qLive = t.filter(col("u") === 61L)
    assert(qLive.collect().map(_.getLong(1)).toSeq == Seq(61L))
    assert(filesPlanned(planString(qLive)) == 1)
    // a PURGED value probes to zero files: the kept residues' digests
    // never held it, and the packed file's [min, max] = [1, 595]
    // still spans 307 — only its REBUILT digest (survivors only)
    // proves the absence; a stale carried digest would keep the file
    val qDead = t.filter(col("u") === 307L)
    assert(qDead.collect().isEmpty)
    assert(filesPlanned(planString(qDead)) == 0,
      "rebuilt digest must not contain purged values")
  }

  test("a recorded zero-row file is pruned under any pushed filter") {
    val dir = tmp("zerorow")
    // the empty CREATE part: no min/max, no digest — but its recorded
    // __rows=0 proves it can never match, so filtered scans skip it
    ManagedTable.commit(
      spark.range(0).select(col("id").as("k")), dir)
    ManagedTable.appendCommit(
      spark.range(10).select(col("id").as("k")).coalesce(1), dir)
    val t = spark.read.format("graft").load(dir)
    val q = t.filter(col("k") === 5L)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(5L))
    assert(filesPlanned(planString(q)) == 1,
      "the zero-row create part must not be planned under a filter")
  }
}
