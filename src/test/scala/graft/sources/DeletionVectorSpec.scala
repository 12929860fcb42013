package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deletion-vector invariants: a delete rewrites NO data segment (the
  * 100 TB property), every read path applies the DV, time travel sees
  * pre-delete rows, deletes accumulate, merge and compaction never
  * resurrect tombstoned rows (compaction materializes them), the CDF
  * reports DV deletes, and vacuum protects DV segments.
  */
class DeletionVectorSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))

  private def dataFiles(dir: String): Set[String] = {
    // segment dirs under data/ that hold DATA for the LATEST version =
    // distinct file_path parents of a raw manifest-listed scan; easier:
    // list the physical segment dirs (DV segs included) — used only to
    // assert "no new DATA bytes", so compare counts before/after
    val f = new java.io.File(s"$dir/data")
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  test("deleteWhere rewrites no data segment; reads, time travel, accumulation") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val base = docs.filter(col("doc_id") < 40)
    ManagedTable.commit(base, dir)
    val segsBefore = dataFiles(dir)
    val v2 = ManagedTable.deleteWhere(spark, dir, col("doc_id") % 10 === 0)
    assert(v2 == 2)
    // ONE new segment dir (the DV itself) — no data segment rewritten
    val segsAfter = dataFiles(dir)
    assert(segsBefore.subsetOf(segsAfter), "data segments must survive")
    assert((segsAfter -- segsBefore).size == 1, "exactly the DV segment")
    // read excludes the 4 deleted rows (0,10,20,30)
    assert(ManagedTable.read(spark, dir).count() == 36)
    assert(ManagedTable.read(spark, dir)
      .filter(col("doc_id") % 10 === 0).count() == 0)
    // time travel still sees them
    assert(ManagedTable.read(spark, dir, Some(1)).count() == 40)
    // second delete accumulates
    ManagedTable.deleteWhere(spark, dir, col("doc_id") === 7)
    assert(ManagedTable.read(spark, dir).count() == 35)
    assert(ManagedTable.read(spark, dir, Some(2)).count() == 36)
    // no-match delete is a no-op, not an empty commit
    val v = ManagedTable.deleteWhere(spark, dir, col("doc_id") === 99999)
    assert(v == 3 && ManagedTable.versions(spark, dir) == Seq(1, 2, 3))
  }

  test("merge after delete does not resurrect tombstoned rows") {
    val dir = Files.createTempDirectory("graft-dv-m").toString
    val base = docs.filter(col("doc_id") < 30)
      .select(col("doc_id").as("k"), col("lang"), col("n_chars"),
        lit(0L).as("seq"))
    ManagedTable.merge(base, dir, keys = Seq("k"), sequenceBy = Seq(col("seq")))
    ManagedTable.deleteWhere(spark, dir, col("k") < 5)
    assert(ManagedTable.read(spark, dir).count() == 25)
    // merge a changeset touching OTHER keys in the same (only) file:
    // the file is rewritten DV-aware, so k∈[0,5) must stay gone
    val upd = docs.filter(col("doc_id") >= 10 && col("doc_id") < 12)
      .select(col("doc_id").as("k"), col("lang"),
        (col("n_chars") + 1).as("n_chars"), lit(1L).as("seq"))
    ManagedTable.merge(upd, dir, keys = Seq("k"), sequenceBy = Seq(col("seq")))
    val after = ManagedTable.read(spark, dir)
    assert(after.count() == 25, "tombstoned rows must not resurrect")
    assert(after.filter(col("k") < 5).count() == 0)
    assert(after.filter(col("k") === 10).select("n_chars").head.getLong(0) ==
      docs.filter(col("doc_id") === 10).select("n_chars").head.getLong(0) + 1)
  }

  test("compaction materializes deletes and drops the DV when nothing is kept") {
    val dir = Files.createTempDirectory("graft-dv-c").toString
    // two small commits → two small files, then delete across both
    ManagedTable.commit(docs.filter(col("doc_id") < 15), dir)
    val all = ManagedTable.read(spark, dir)
      .unionByName(docs.filter(col("doc_id") >= 15 && col("doc_id") < 30))
    ManagedTable.commit(all, dir) // v2: full table as several files
    ManagedTable.deleteWhere(spark, dir, col("doc_id") % 3 === 0)
    val live = ManagedTable.read(spark, dir).orderBy("doc_id").collect()
    val v4 = ManagedTable.compact(spark, dir, smallFileBytes = 64L * 1024 * 1024)
    assert(v4 > 3, "tiny files must compact")
    val packed = ManagedTable.read(spark, dir).orderBy("doc_id").collect()
    assert(packed === live, "compaction must preserve the live view")
    // everything was rewritten → a RAW scan of the packed segment (no
    // DV applied) must hold no tombstoned row: the deletes became bytes
    val seg4 = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith(s"v$v4-"))
    assert(seg4.nonEmpty, "compacted segment must exist")
    val raw = spark.read.parquet(seg4.map(_.getAbsolutePath).toSeq: _*)
    assert(raw.filter(col("doc_id") % 3 === 0).count() == 0,
      "compaction must materialize DV deletes into the packed bytes")
  }

  test("change data feed reports DV deletes; vacuum protects DV segments") {
    val dir = Files.createTempDirectory("graft-dv-cdf").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 20), dir)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") >= 17)
    val cdf = ManagedTable.changes(spark, dir, 1, 2, keys = Seq("doc_id"))
    val got = cdf.select("_change_type", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("delete", 17L), ("delete", 18L), ("delete", 19L)),
      s"CDF must report exactly the DV-deleted keys, got $got")
    // vacuum with zero retention must NOT sweep the referenced DV
    assert(ManagedTable.vacuum(spark, dir, retentionMs = 0) == Seq.empty)
    assert(ManagedTable.read(spark, dir).count() == 17,
      "deletes must survive vacuum")
  }

  test("readWhere (stats-pruned scan) applies the DV") {
    val dir = Files.createTempDirectory("graft-dv-rw").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 50), dir)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") === 25)
    val got = ManagedTable.readWhere(spark, dir, "doc_id", 20, 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == (20L to 30L).toSet - 25L)
  }
}
