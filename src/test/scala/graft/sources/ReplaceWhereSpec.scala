package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** replaceWhere (backfill) invariants: the swap is atomic (one
  * version), rewrites no existing data segment, is idempotent when
  * re-run, enforces Delta's replacement-matches-predicate constraint,
  * and degrades to delete / constrained append at the edges.
  */
class ReplaceWhereSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))
    .select("doc_id", "lang", "n_chars")

  private def segDirs(dir: String): Set[String] = {
    val f = new java.io.File(s"$dir/data")
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  test("backfill swaps exactly the predicate's rows in one version") {
    val dir = Files.createTempDirectory("graft-rw").toString
    val base = docs.filter(col("doc_id") < 40)
    ManagedTable.commit(base.repartition(3), dir)
    val before = segDirs(dir)
    val corrected = base.filter(col("doc_id") % 4 === 0)
      .withColumn("n_chars", col("n_chars") + 1000L)
    val v = ManagedTable.replaceWhere(spark, dir,
      col("doc_id") % 4 === 0, corrected, tag = "backfill")
    assert(v == 2 && ManagedTable.versions(spark, dir) == Seq(1, 2))
    assert(before.subsetOf(segDirs(dir)),
      "existing data segments must survive a backfill")
    val live = ManagedTable.read(spark, dir)
    assert(live.count() == 40)
    assert(live.filter(col("doc_id") % 4 === 0)
      .filter(col("n_chars") <= 1000).count() == 0,
      "matching rows must all be the corrected copies")
    val untouched = live.filter(col("doc_id") % 4 =!= 0)
      .orderBy("doc_id").collect()
    assert(untouched === base.filter(col("doc_id") % 4 =!= 0)
      .orderBy("doc_id").collect(), "non-matching rows untouched")
    // time travel still sees the pre-backfill bytes
    assert(ManagedTable.read(spark, dir, Some(1))
      .filter(col("n_chars") > 1000).count() == 0)
  }

  test("re-running the same backfill is idempotent") {
    val dir = Files.createTempDirectory("graft-rw-i").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 30), dir)
    val fix = docs.filter(col("doc_id") < 30 && col("doc_id") % 5 === 0)
      .withColumn("n_chars", lit(7L))
    ManagedTable.replaceWhere(spark, dir, col("doc_id") % 5 === 0, fix)
    val once = ManagedTable.read(spark, dir).orderBy("doc_id").collect()
    ManagedTable.replaceWhere(spark, dir, col("doc_id") % 5 === 0, fix)
    val twice = ManagedTable.read(spark, dir).orderBy("doc_id").collect()
    assert(twice === once, "backfill must replace its own output")
  }

  test("concurrent disjoint backfills: the race loser retries and both land") {
    val dir = Files.createTempDirectory("graft-rw-race").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 20), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val futures = (0 until 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          val pred = col("doc_id") % 2 === i
          val fix = docs.filter(col("doc_id") < 20 && pred)
            .withColumn("n_chars", col("n_chars") + (1000L * (i + 1)))
          barrier.await() // both plan against the same current version
          ManagedTable.replaceWhere(spark, dir, pred, fix)
        }
      })
    }
    val claimed = futures.map(_.get())
    pool.shutdown()
    assert(claimed.toSet.size == 2, "loser must retry onto a new version")
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3))
    val live = ManagedTable.read(spark, dir)
    assert(live.count() == 20)
    assert(live.filter(col("n_chars") <= 1000).count() == 0,
      "neither backfill's correction may be lost to the race")
  }

  test("replacement rows outside the predicate are rejected") {
    val dir = Files.createTempDirectory("graft-rw-c").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 10), dir)
    intercept[IllegalArgumentException] {
      ManagedTable.replaceWhere(spark, dir, col("doc_id") < 5,
        docs.filter(col("doc_id") >= 5 && col("doc_id") < 8))
    }
  }

  test("empty replacement deletes; no-match predicate appends") {
    val dir = Files.createTempDirectory("graft-rw-e").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 20), dir)
    ManagedTable.replaceWhere(spark, dir, col("doc_id") >= 15,
      docs.filter(lit(false)))
    assert(ManagedTable.read(spark, dir).count() == 15)
    ManagedTable.replaceWhere(spark, dir, col("doc_id") >= 100,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 103))
    assert(ManagedTable.read(spark, dir).count() == 18)
  }
}
