package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RESTORE invariants: the rollback is metadata-only (no data segment
  * written), the restored view bit-equals the target version, a restore
  * TO a DV version re-applies that version's deletion vectors, history
  * stays time-travelable, schema evolution rolls back with the
  * manifest, and vacuum keeps protecting restored-referenced segments.
  */
class RestoreSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))

  private def segDirs(dir: String): Set[String] = {
    val f = new java.io.File(s"$dir/data")
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  test("restore is metadata-only and bit-equals the target version") {
    val dir = Files.createTempDirectory("graft-restore").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 40), dir)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") % 4 === 0)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") === 1)
    val before = segDirs(dir)
    val v1Rows = ManagedTable.read(spark, dir, Some(1))
      .orderBy("doc_id").collect()
    val v4 = ManagedTable.restore(spark, dir, 1)
    assert(v4 == 4)
    assert(segDirs(dir) == before, "restore must write NO data segment")
    assert(ManagedTable.tags(spark, dir).last == (4 -> "restore:v1"))
    val restored = ManagedTable.read(spark, dir).orderBy("doc_id").collect()
    assert(restored === v1Rows, "restored view must bit-equal v1")
    // history preserved: the undone versions still time-travel
    assert(ManagedTable.read(spark, dir, Some(3)).count() == v1Rows.length - 11)
  }

  test("restore TO a DV version re-applies its deletion vectors") {
    val dir = Files.createTempDirectory("graft-restore-dv").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 30), dir)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") < 10) // v2: 20 rows
    ManagedTable.deleteWhere(spark, dir, col("doc_id") < 20) // v3: 10 rows
    ManagedTable.restore(spark, dir, 2)
    assert(ManagedTable.read(spark, dir).count() == 20,
      "restore to v2 must re-apply exactly v2's DV")
    assert(ManagedTable.read(spark, dir)
      .filter(col("doc_id") < 10).count() == 0)
  }

  test("restore rolls back schema evolution with the manifest") {
    val dir = Files.createTempDirectory("graft-restore-se").toString
    val base = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("k"), col("n_chars"), lit(0L).as("seq"))
    ManagedTable.merge(base, dir, keys = Seq("k"), sequenceBy = Seq(col("seq")))
    val widened = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("k"), col("n_chars"), lit(1L).as("seq"),
        col("lang")) // schema evolution: new column
    ManagedTable.merge(widened, dir, keys = Seq("k"),
      sequenceBy = Seq(col("seq")))
    assert(ManagedTable.read(spark, dir).columns.contains("lang"))
    ManagedTable.restore(spark, dir, 1)
    assert(!ManagedTable.read(spark, dir).columns.contains("lang"),
      "restore must publish the PRE-evolution schema")
    assert(ManagedTable.read(spark, dir).count() == 20)
  }

  test("CDF across a restore boundary reports the resurrections as inserts") {
    val dir = Files.createTempDirectory("graft-restore-cdf").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 20), dir)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") >= 17) // v2
    ManagedTable.restore(spark, dir, 1) // v3: 17,18,19 come back
    val got = ManagedTable.changes(spark, dir, 2, 3, keys = Seq("doc_id"))
      .select("_change_type", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("insert", 17L), ("insert", 18L), ("insert", 19L)),
      s"restore must read as inserts of the resurrected keys, got $got")
  }

  test("history and timestamp time travel read pure manifest metadata") {
    val dir = Files.createTempDirectory("graft-hist").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 10), dir, tag = "base")
    Thread.sleep(20) // distinct manifest mtimes
    val tMid = System.currentTimeMillis()
    Thread.sleep(20)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") < 3, tag = "gdpr")
    val h = ManagedTable.history(spark, dir)
      .orderBy("version").collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(h.map(_.getString(1)).toSeq == Seq("base", "gdpr"))
    assert(h(0).getInt(4) == 0 && h(1).getInt(4) == 1,
      "v2 must show exactly the DV segment file")
    assert(h.forall(_.getInt(5) == docs.columns.length))
    // timestamp between the two commits resolves to v1
    assert(ManagedTable.readAsOf(spark, dir, tMid).count() == 10)
    assert(ManagedTable
      .readAsOf(spark, dir, System.currentTimeMillis()).count() == 7)
    intercept[IllegalArgumentException] {
      ManagedTable.readAsOf(spark, dir, 0L)
    }
  }

  test("vacuum never sweeps restored-referenced segments; bad version rejected") {
    val dir = Files.createTempDirectory("graft-restore-v").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 10), dir)
    ManagedTable.commit(docs.filter(col("doc_id") < 25), dir)
    ManagedTable.restore(spark, dir, 1)
    assert(ManagedTable.vacuum(spark, dir, retentionMs = 0) == Seq.empty)
    assert(ManagedTable.read(spark, dir).count() == 10)
    intercept[IllegalArgumentException] {
      ManagedTable.restore(spark, dir, 99)
    }
  }
}
