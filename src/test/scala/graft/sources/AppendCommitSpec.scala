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
}
