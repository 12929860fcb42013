package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** appendCommit: versions accumulate (vs commit's full-snapshot
  * replace), deletion vectors carry over so appends never resurrect
  * tombstoned rows, column order is normalized, and schema mismatch is
  * rejected.
  */
class AppendCommitSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))
    .select("doc_id", "lang", "n_chars")

  test("appends accumulate and never resurrect DV-deleted rows") {
    val dir = Files.createTempDirectory("graft-ap").toString
    ManagedTable.appendCommit(docs.filter(col("doc_id") < 10), dir)
    ManagedTable.appendCommit(
      docs.filter(col("doc_id") >= 10 && col("doc_id") < 15), dir)
    assert(ManagedTable.read(spark, dir).count() == 15)
    ManagedTable.deleteWhere(spark, dir, col("doc_id") < 3)
    ManagedTable.appendCommit(
      docs.filter(col("doc_id") >= 15 && col("doc_id") < 18), dir)
    val live = ManagedTable.read(spark, dir)
    assert(live.count() == 15, "12 surviving + 3 appended")
    assert(live.filter(col("doc_id") < 3).count() == 0,
      "the carried-over DV must keep tombstoned rows out")
    // column order normalized: reversed-column append reads back fine
    ManagedTable.appendCommit(
      docs.filter(col("doc_id") === 99)
        .select("n_chars", "lang", "doc_id"), dir)
    assert(ManagedTable.read(spark, dir)
      .filter(col("doc_id") === 99).select("n_chars").head.getLong(0) ==
      docs.filter(col("doc_id") === 99).select("n_chars").head.getLong(0))
    intercept[IllegalArgumentException] {
      ManagedTable.appendCommit(
        docs.withColumnRenamed("lang", "language"), dir)
    }
  }

  test("tag-index cache survives a table deleted and re-created at the same path") {
    // the round-9 incremental tag index is driver-local state keyed by
    // dir; a table torn down and rebuilt at the same path mid-session
    // must NOT leave a stale replay verdict behind — a stale positive
    // would silently DROP a live micro-batch. The validity probe
    // (cached newest version's tag re-read) catches the rebuild.
    val dir = java.nio.file.Files.createTempDirectory("graft-tagidx").toString
    val df = graft.Tables.documents(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("doc_id") < 5)
      .select("doc_id", "lang")
    assert(ManagedTable.idempotentAppend(df, dir, 0L))
    assert(ManagedTable.idempotentAppend(df, dir, 1L))
    assert(!ManagedTable.idempotentAppend(df, dir, 0L),
      "replay of a landed batch must be skipped (cached path)")
    // tear the table down and re-create a DIFFERENT one at the same path
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ManagedTable.commit(df, dir, tag = "fresh-table")
    assert(ManagedTable.idempotentAppend(df, dir, 0L),
      "batch 0 never landed in the NEW table — a stale cached verdict " +
        "here silently drops the batch")
    assert(ManagedTable.read(spark, dir).count() == 10,
      "the fresh commit plus the re-landed batch")
  }

  test("tag-index probe rejects a re-created table that mimics the newest version") {
    // the adversarial variant the round-9 probe missed: the rebuilt
    // table reaches the SAME max version with the SAME newest tag as
    // the cached history (e.g. a replayed tail batch) while the
    // earlier versions differ. The strengthened probe also checks
    // history length and the first version's tag, so the stale cache
    // cannot validate and mark the old table's b0/b1 as committed.
    val dir = java.nio.file.Files.createTempDirectory("graft-tagidx2").toString
    val df = graft.Tables.documents(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("doc_id") < 5)
      .select("doc_id", "lang")
    assert(ManagedTable.idempotentAppend(df, dir, 0L)) // v1 tag b0
    assert(ManagedTable.idempotentAppend(df, dir, 1L)) // v2 tag b1
    assert(ManagedTable.idempotentAppend(df, dir, 2L)) // v3 tag b2
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    // rebuild OUTSIDE the cached path (another driver's commits):
    // v1 tag b5, v2 tag b7, v3 tag b2 — same maxV, same newest tag
    ManagedTable.commit(df, dir, tag = "b5")
    ManagedTable.appendCommit(df, dir, tag = "b7")
    ManagedTable.appendCommit(df, dir, tag = "b2")
    assert(ManagedTable.idempotentAppend(df, dir, 0L),
      "batch 0 never landed in the NEW table — the mimicking history " +
        "must not validate the stale cache")
    assert(!ManagedTable.idempotentAppend(df, dir, 2L),
      "batch 2 DID land in the new table (tag b2) and must stay skipped")
  }

  test("exportManifest pins a version for external readers; refuses DVs") {
    val dir = Files.createTempDirectory("graft-em").toString
    ManagedTable.commit(docs.filter(col("doc_id") < 10).repartition(2), dir)
    ManagedTable.appendCommit(
      docs.filter(col("doc_id") >= 10 && col("doc_id") < 15), dir)
    val mf = s"$dir/_export/manifest.txt"
    // exporting v1 pins the OLD version even after v2 landed
    val v1Paths = ManagedTable.exportManifest(spark, dir, mf, Some(1))
    val external = spark.read.parquet(v1Paths: _*)
    assert(external.count() == 10, "external scan must see exactly v1")
    // the file on disk holds the same list, newline-separated
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mf)), "UTF-8").trim.split("\n").toSeq
    assert(lines.sorted == v1Paths.sorted)
    // latest export sees both segments
    assert(spark.read.parquet(
      ManagedTable.exportManifest(spark, dir, mf): _*).count() == 15)
    // a DV version must be refused, not silently resurrected
    ManagedTable.deleteWhere(spark, dir, col("doc_id") === 0)
    intercept[IllegalArgumentException] {
      ManagedTable.exportManifest(spark, dir, mf)
    }
    // compaction materializes the delete; export works again
    ManagedTable.compact(spark, dir, smallFileBytes = 64L * 1024 * 1024)
    assert(spark.read.parquet(
      ManagedTable.exportManifest(spark, dir, mf): _*).count() == 14)
  }
}
