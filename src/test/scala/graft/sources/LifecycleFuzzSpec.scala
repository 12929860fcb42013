package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Model-based lifecycle fuzz: a random interleaving of append /
  * merge-upsert / deleteWhere / replaceWhere / restore / compact is
  * applied both to a ManagedTable and to an in-memory reference model
  * (Map[key -> value] plus per-version snapshots). After EVERY
  * operation the live read must equal the model, and a randomly
  * chosen time-travel read must equal that version's snapshot — the
  * single invariant that subsumes "no op loses, resurrects, or
  * double-applies rows, in any order".
  */
class LifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def liveState(dir: String): Map[Long, Long] =
    ManagedTable.read(spark, dir).select("k", "v")
      .as[(Long, Long)].collect().toMap

  private def versionState(dir: String, v: Int): Map[Long, Long] =
    ManagedTable.read(spark, dir, Some(v)).select("k", "v")
      .as[(Long, Long)].collect().toMap

  private def df(rows: Seq[(Long, Long)], seq: Long) =
    rows.map { case (k, v) => (k, v, seq) }.toDF("k", "v", "seq")

  for (seed <- Seq(11, 42, 97)) {
    test(s"random lifecycle interleaving matches the model (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-fuzz$seed").toString
      var opSeq = 0L
      def nextSeq(): Long = { opSeq += 1; opSeq }
      // v1: initial commit
      var model: Map[Long, Long] =
        (0L until 30L).map(k => k -> rnd.nextLong(1000)).toMap
      ManagedTable.commit(df(model.toSeq, nextSeq()), dir)
      // digest the key column: every subsequent write builds per-file
      // blooms, and the per-step point probes below go through the
      // connector's digest-consulting filtered path — a false negative
      // anywhere in the lifecycle would drop a live row from a probe.
      // (v1's segment predates the property: fail-open, never pruned.)
      ManagedTable.setTableProperties(spark, dir,
        Map(BloomSkipping.ColumnsProp -> "k"))
      val snapshots = scala.collection.mutable.Map[Int, Map[Long, Long]]()
      snapshots(ManagedTable.versions(spark, dir).last) = model
      var nextKey = 100L

      for (step <- 1 to 12) {
        rnd.nextInt(6) match {
          case 0 => // append fresh keys
            val fresh = (0 until 1 + rnd.nextInt(4)).map { _ =>
              nextKey += 1; nextKey -> rnd.nextLong(1000)
            }
            ManagedTable.appendCommit(df(fresh, nextSeq()), dir)
            model = model ++ fresh
          case 1 => // merge upsert over a random key subset + one new key
            val keys = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(5)
            nextKey += 1
            val changes = (keys :+ nextKey).map(_ -> rnd.nextLong(1000))
            ManagedTable.merge(df(changes, nextSeq()), dir,
              keys = Seq("k"), sequenceBy = Seq(col("seq")))
            model = model ++ changes
          case 2 => // deleteWhere k % m == r
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            ManagedTable.deleteWhere(spark, dir,
              col("k") % m === r)
            model = model.filter { case (k, _) => k % m != r }
          case 3 => // replaceWhere: correct every row in a slice
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val corrected = model.collect {
              case (k, _) if k % m == r => k -> rnd.nextLong(1000)
            }.toSeq
            ManagedTable.replaceWhere(spark, dir, col("k") % m === r,
              df(corrected, nextSeq()))
            model = model ++ corrected
          case 4 => // restore to a random recorded version
            val vs = snapshots.keys.toSeq.sorted
            val target = vs(rnd.nextInt(vs.size))
            ManagedTable.restore(spark, dir, target)
            model = snapshots(target)
          case 5 => // compact: never changes the live view
            ManagedTable.compact(spark, dir,
              smallFileBytes = 64L * 1024 * 1024)
        }
        val current = ManagedTable.versions(spark, dir).last
        snapshots(current) = model
        assert(liveState(dir) == model,
          s"step $step: live view diverged from the model")
        // time travel to a random recorded version must match too
        val vs = snapshots.keys.toSeq.sorted
        val probe = vs(rnd.nextInt(vs.size))
        assert(versionState(dir, probe) == snapshots(probe),
          s"step $step: time travel to v$probe diverged")
        // digest-backed point probes through the connector: a live key
        // must always be found, an absent key must return nothing
        if (model.nonEmpty) {
          val ks = model.keys.toSeq.sorted
          val k0 = ks(rnd.nextInt(ks.size))
          val got = spark.read.format("graft").load(dir)
            .filter(col("k") === k0).select("v").as[Long].collect().toSeq
          assert(got == Seq(model(k0)),
            s"step $step: digest point read k=$k0 got $got")
          assert(spark.read.format("graft").load(dir)
            .filter(col("k") === (nextKey + 1000L)).isEmpty,
            s"step $step: absent-key probe must be empty")
        }
      }
    }
  }

  // ---- tri-index maintenance under the same adversarial lifecycle ----
  //
  // The unified index tier ([[graft.operators.IndexMaintenance]]) claims
  // `state(v2) = state(v1) − contrib(pre) + contrib(post)` holds for ANY
  // version step — not just merge upserts but DV-only deletes,
  // replaceWhere slice rewrites, restores (which can resurrect rows),
  // and compactions (which move bytes but change nothing). This fuzz
  // drives a text+embedding corpus through random interleavings of all
  // of those, runs ONE maintenance tick per committed version, and
  // after EVERY tick asserts the incrementally-maintained dense/lex/
  // chunk index equals a full rebuild of the live snapshot.

  private def corpusRow(k: Long, v: Long): (Long, String, Array[Float], Long) = {
    val text = (0 until 10)
      .map(i => s"w${(v >> i) % 13}").mkString(" ") + s" tail$v"
    val emb = Array.tabulate(4)(i => (((v >> (2 * i)) % 7) - 3).toFloat + 1)
    (k, text, emb, v)
  }

  private def corpusDf(rows: Seq[(Long, Long)]) =
    rows.map { case (k, v) => corpusRow(k, v) }
      .toDF("k", "text", "embedding", "seq")
      // parquet reads arrays back containsNull=true; replaceWhere
      // checks schema equality, so align the in-memory side up front
      .withColumn("embedding", col("embedding").cast("array<float>"))

  private val triSpec = graft.operators.IndexMaintenance.CorpusSpec(
    keyCol = "k", textCol = "text", embCol = "embedding",
    centroids = Seq(
      (0L, Array(3f, 1f, 0f, -1f)), (1L, Array(-2f, 2f, 1f, 0f)),
      (2L, Array(0f, -1f, 3f, 2f)), (3L, Array(1f, 1f, 1f, 1f)))
      .toDF("cid", "cv"),
    deleteExpr = lit(false), exceptColumns = Seq("seq"))

  for (seed <- Seq(13, 71)) {
    test(s"tri-index stays consistent under random lifecycle interleaving (seed $seed)") {
      val I = graft.operators.IndexMaintenance
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-trifuzz$seed").toString
      val idx = Files.createTempDirectory(s"graft-trifuzzidx$seed").toString + "/t"
      var opSeq = 0L
      def nextSeq(): Long = { opSeq += 1; opSeq }
      var model: Map[Long, Long] =
        (0L until 20L).map(k => k -> rnd.nextLong(1 << 20)).toMap
      ManagedTable.merge(corpusDf(model.toSeq), dir,
        keys = Seq("k"), sequenceBy = Seq(col("seq")))
      var indexedV = ManagedTable.versions(spark, dir).last
      I.bootstrap(spark, dir, indexedV, triSpec, idx)
      // per-version models so a restore re-aligns the op generator
      val snapshots = scala.collection.mutable.Map(indexedV -> model)
      var nextKey = 100L
      for (step <- 1 to 8) {
        rnd.nextInt(5) match {
          case 0 => // merge upsert + one fresh key
            val keys = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(4)
            nextKey += 1
            val changes = (keys :+ nextKey)
              .map(_ -> (rnd.nextLong(1 << 20) + (nextSeq() << 40)))
            ManagedTable.merge(corpusDf(changes), dir,
              keys = Seq("k"), sequenceBy = Seq(col("seq")))
            model = model ++ changes
          case 1 => // deleteWhere: DV-only commit
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            ManagedTable.deleteWhere(spark, dir, col("k") % m === r)
            model = model.filter { case (k, _) => k % m != r }
          case 2 => // replaceWhere a slice
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val corrected = model.collect {
              case (k, _) if k % m == r =>
                k -> (rnd.nextLong(1 << 20) + (nextSeq() << 40))
            }.toSeq
            ManagedTable.replaceWhere(spark, dir, col("k") % m === r,
              corpusDf(corrected))
            model = model ++ corrected
          case 3 => // restore to a random earlier version
            val vs = snapshots.keys.toSeq.sorted
            val target = vs(rnd.nextInt(vs.size))
            ManagedTable.restore(spark, dir, target)
            model = snapshots(target)
          case 4 => // compact: byte moves only — the CDF must say nothing
            ManagedTable.compact(spark, dir,
              smallFileBytes = 64L * 1024 * 1024)
        }
        val current = ManagedTable.versions(spark, dir).last
        snapshots(current) = model
        I.maintainTick(spark, dir, indexedV, current, triSpec, idx)
        indexedV = current
        val state = I.indexState(spark, idx)
        val rebuild = I.buildAll(
          ManagedTable.readCurrent(spark, dir, lit(false), Seq("seq"),
            Some(current)), triSpec)
        assert(state.exceptAll(rebuild).isEmpty &&
          rebuild.exceptAll(state).isEmpty,
          s"step $step: tri-index diverged from the v$current rebuild")
      }
    }
  }
}
