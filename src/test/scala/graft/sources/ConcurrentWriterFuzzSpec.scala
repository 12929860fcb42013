package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RACING-WRITER extension of the lifecycle fuzz: N threads hammer ONE
  * table with the full DML matrix — SQL UPDATE (copy-on-write),
  * merge-upsert, deleteWhere (DV-only), replaceWhere, append — with
  * per-statement retry on conflict, and the suite then proves the
  * optimistic-commit discipline end to end:
  *
  *   - EVERY commit either landed atomically or threw — no version is
  *     ever torn (all manifests parse; version numbers stay dense);
  *   - ZERO lost updates: each thread's effects are designed to be
  *     order-independent (counter increments, latest-per-key merges,
  *     thread-disjoint replace regions, unique appends, idempotent
  *     victim deletes), so "final state equals SOME serial order of
  *     the successful operations" reduces to exact closed-form
  *     expectations per key;
  *   - conflicts REFUSE rather than lose: the DV-tombstone check on
  *     the COW swap, the subset check on replaced files, and the
  *     create-if-absent manifest claim are all exercised under real
  *     thread interleavings (the seed file holds every key family, so
  *     every operation contends on it).
  *
  * 4 threads × 26 rounds = 104 seeded racing operations per seed.
  */
class ConcurrentWriterFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def seedRows: Seq[(Long, Long, Long)] =
    // counters 0..3, merge keys 100..103, victims 300..319,
    // replace regions [400+10t, 400+10t+5)
    (0L until 4L).map(k => (k, 0L, 0L)) ++
      (100L until 104L).map(k => (k, 0L, 0L)) ++
      (300L until 320L).map(k => (k, 7L, 0L)) ++
      (0 until 4).flatMap(t =>
        (0 until 5).map(i => (400L + 10 * t + i, -1L, 0L)))

  private def retry[T](label: String)(op: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    var last: Throwable = null
    while (out.isEmpty && attempt < 30) {
      attempt += 1
      try out = Some(op)
      catch {
        case t: Throwable =>
          last = t
          Thread.sleep(5 + scala.util.Random.nextInt(20))
      }
    }
    out.getOrElse(throw new AssertionError(
      s"$label failed after $attempt attempts", last))
  }

  for (seed <- Seq(23, 77)) {
    test(s"4 racing writers, full DML matrix: zero lost updates, no " +
        s"torn version (seed $seed)") {
      val wh = Files.createTempDirectory(s"graft-race$seed").toString + "/wh"
      val cat = s"gfz$seed"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE $cat.ns")
      val dir = s"$wh/ns/t"
      ManagedTable.commit(
        seedRows.toDF("k", "v", "seq").coalesce(1), dir)
      // digest the key column: every racing writer's commit builds
      // sidecars inside its own segment, so the digest build rides
      // the same contention the manifest claims race under (losers'
      // orphan sidecars die with their orphan segments at vacuum)
      ManagedTable.setTableProperties(spark, dir,
        Map(BloomSkipping.ColumnsProp -> "k"))

      val threads = 4
      val rounds = 26
      // per-thread effect ledgers (only the owning thread writes them)
      val incr = Array.fill(threads)(0L)
      val lastMerge = Array.fill(threads)(0L)
      val lastReplace = Array.fill(threads)(-1L)
      val appended = Array.fill(threads)(
        scala.collection.mutable.ArrayBuffer.empty[Long])
      val deleted = Array.fill(threads)(
        scala.collection.mutable.ArrayBuffer.empty[Long])
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

      for (round <- 1 to rounds) {
        val barrier = new java.util.concurrent.CyclicBarrier(threads)
        val ts = (0 until threads).map { tid =>
          val rnd = new scala.util.Random(seed * 10007 + round * 101 + tid)
          new Thread(() => {
            try {
              barrier.await()
              rnd.nextInt(5) match {
                case 0 => // COW counter increment — the lost-update probe
                  retry(s"update t$tid r$round") {
                    spark.sql(s"UPDATE $cat.ns.t SET v = v + 1 " +
                      s"WHERE k = $tid")
                  }
                  incr(tid) += 1
                case 1 => // latest-per-key merge on the thread's key
                  retry(s"merge t$tid r$round") {
                    ManagedTable.merge(
                      Seq((100L + tid, round.toLong, round.toLong))
                        .toDF("k", "v", "seq"),
                      dir, keys = Seq("k"),
                      sequenceBy = Seq(col("seq")))
                  }
                  lastMerge(tid) = round.toLong
                case 2 => // unique-key append
                  val key = 1000L + round * 10 + tid
                  retry(s"append t$tid r$round") {
                    ManagedTable.appendCommit(
                      Seq((key, round.toLong, round.toLong))
                        .toDF("k", "v", "seq").coalesce(1), dir)
                  }
                  appended(tid) += key
                case 3 => // idempotent victim delete (DV-only commit)
                  val victim = 300L + (round * threads + tid) % 20
                  retry(s"delete t$tid r$round") {
                    ManagedTable.deleteWhere(spark, dir,
                      col("k") === victim)
                  }
                  deleted(tid) += victim
                case 4 => // thread-disjoint replaceWhere region
                  val lo = 400L + 10 * tid
                  retry(s"replace t$tid r$round") {
                    ManagedTable.replaceWhere(spark, dir,
                      col("k") >= lo && col("k") < lo + 5,
                      (0 until 5).map(i =>
                        (lo + i, round.toLong, round.toLong))
                        .toDF("k", "v", "seq"),
                      maxAttempts = 8)
                  }
                  lastReplace(tid) = round.toLong
              }
            } catch { case t: Throwable => failures.add(t) }
          })
        }
        ts.foreach(_.start())
        ts.foreach(_.join())
        assert(failures.isEmpty, s"round $round: ${failures.peek()}")
      }

      // no torn version: versions dense from 1, every manifest parses
      val vs = ManagedTable.versions(spark, dir)
      assert(vs == (1 to vs.last), s"non-dense version chain: $vs")
      ManagedTable.tags(spark, dir) // reads EVERY manifest; throws on torn

      val state = ManagedTable.read(spark, dir)
        .select("k", "v").as[(Long, Long)].collect().toMap

      // zero lost updates, key family by key family
      (0 until threads).foreach { t =>
        assert(state(t.toLong) == incr(t),
          s"counter $t: ${state(t.toLong)} != ${incr(t)} increments")
        assert(state(100L + t) == lastMerge(t),
          s"merge key ${100 + t}: lost the latest merge")
        (0 until 5).foreach { i =>
          assert(state(400L + 10 * t + i) == lastReplace(t),
            s"replace region of t$t: stale slice")
        }
        appended(t).foreach { k =>
          assert(state.contains(k), s"append $k was lost")
        }
      }
      val allDeleted = deleted.flatten.toSet
      allDeleted.foreach { k =>
        assert(!state.contains(k), s"deleted victim $k resurrected")
      }
      (300L until 320L).filterNot(allDeleted).foreach { k =>
        assert(state(k) == 7L, s"untouched victim $k corrupted")
      }
      // appends are exactly-once: row count closes the books
      val expected = 4 + 4 + (20 - allDeleted.size) + 20 +
        appended.map(_.size).sum
      assert(state.size == expected,
        s"row count ${state.size} != $expected")
    }
  }
}
