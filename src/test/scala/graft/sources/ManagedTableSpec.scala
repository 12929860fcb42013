package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Manifest-versioned table invariants: atomic visibility (a crash
  * between data write and manifest leaves the table unchanged), dense
  * version history with time travel, and vacuum that only removes
  * unreferenced segments.
  */
class ManagedTableSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))

  test("commit/read round trip; overwrite creates a new version; time travel") {
    val dir = Files.createTempDirectory("graft-mt").toString
    val v1Data = docs.filter(col("doc_id") < 20)
    val v2Data = docs.filter(col("doc_id") < 35)
    assert(ManagedTable.commit(v1Data, dir) == 1)
    assert(ManagedTable.commit(v2Data, dir) == 2)
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2))
    // latest = v2
    assert(ManagedTable.read(spark, dir).count() == 35)
    // time travel = v1, bit-exact
    val v1 = ManagedTable.read(spark, dir, Some(1)).orderBy("doc_id").collect()
    assert(v1 === v1Data.orderBy("doc_id").collect())
  }

  test("crashed writer (data without manifest) is invisible; vacuum removes it") {
    val dir = Files.createTempDirectory("graft-mt2").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 10), dir)
    // simulate a writer that died after writing data, before the manifest
    docs.filter(col("doc_id") >= 10)
      .write.parquet(s"$dir/data/v2-deadbeef-crashed")
    assert(ManagedTable.versions(spark, dir) == Seq(1))
    assert(ManagedTable.read(spark, dir).count() == 10)
    val removed = ManagedTable.vacuum(spark, dir)
    assert(removed == Seq("v2-deadbeef-crashed"))
    // the committed version is untouched
    assert(ManagedTable.read(spark, dir).count() == 10)
  }

  test("streaming sink: batch-tagged commits are idempotent under replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-mt4").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = ManagedTable.streamingSink(mem.toDS().toDF("v"), dir)
      .option("checkpointLocation", ckptDir("mt-sink"))
      .start()
    mem.addData(1L, 2L)
    q.processAllAvailable()
    mem.addData(3L)
    q.processAllAvailable()
    q.stop()
    val vs = ManagedTable.versions(spark, dir)
    assert(vs.size == 2)
    assert(ManagedTable.tags(spark, dir).map(_._2) == Seq("b0", "b1"))
    // replaying an already-committed batch id must be a no-op — the
    // foreachBatch body is re-entered with the same id after a crash
    val replay = Seq(1L, 2L).toDF("v")
    val before = vs
    // simulate the sink body for a replayed id
    if (!ManagedTable.tags(spark, dir).exists(_._2 == "b0"))
      ManagedTable.commit(replay, dir, "b0")
    assert(ManagedTable.versions(spark, dir) == before)
    // full table = union of all batch versions
    val all = ManagedTable.versions(spark, dir)
      .map(v => ManagedTable.read(spark, dir, Some(v)))
      .reduce(_.unionByName(_))
      .as[Long].collect().sorted.toSeq
    assert(all == Seq(1L, 2L, 3L))
  }

  test("schema evolution: a version with an added column reads back; time travel keeps the old schema") {
    val dir = Files.createTempDirectory("graft-mt5").toString
    ManagedTable.commit(docs.select("doc_id", "lang"), dir)
    ManagedTable.commit(
      docs.select(col("doc_id"), col("lang"),
        col("n_chars").as("added_later")), dir)
    val v1 = ManagedTable.read(spark, dir, Some(1))
    val v2 = ManagedTable.read(spark, dir, Some(2))
    assert(v1.columns.toSeq == Seq("doc_id", "lang"))
    assert(v2.columns.toSeq == Seq("doc_id", "lang", "added_later"))
    assert(v2.filter(col("added_later").isNull).count() == 0)
  }

  test("concurrent committers conflict on the version file instead of interleaving") {
    val dir = Files.createTempDirectory("graft-mt3").toString
    ManagedTable.commit(docs.limit(5), dir)
    // racing committer claims v2 first
    ManagedTable.commit(docs.limit(7), dir)
    // a stale writer that also computed next=2 must fail its manifest
    // create — simulate by creating the claim directly
    val p = new org.apache.hadoop.fs.Path(s"$dir/_manifest/v2.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertThrows[java.io.IOException] {
      fs.create(p, false).close()
    }
  }
}
