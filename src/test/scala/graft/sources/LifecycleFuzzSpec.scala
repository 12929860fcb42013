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
      }
    }
  }
}
