package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL UPDATE / MERGE INTO / untranslatable DELETE as group-based
  * copy-on-write ([[GraftRowLevelOperation]]): the `_file` metadata
  * column identifies affected segments, the rewrite re-reads only
  * those, and the commit swaps scanned-out/staged-in atomically.
  */
class GraftRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-cow").toString + "/wh"
    spark.conf.set("spark.sql.catalog.gcow",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcow.warehouse", wh)
    spark.sql("CREATE NAMESPACE gcow.ns")
    wh
  }

  private def sql(q: String): DataFrame = { warehouse; spark.sql(q) }

  /** Four single-file segments with disjoint k ranges 0-99 … 300-399. */
  private def fourSegments(name: String): String = {
    val dir = s"$warehouse/ns/$name"
    sql(s"CREATE TABLE gcow.ns.$name (k BIGINT, v BIGINT)")
    (0 until 4).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(i * 100, (i + 1) * 100)
          .select(col("id").as("k"), (col("id") * 2).as("v"))
          .coalesce(1), dir)
    }
    dir
  }

  private def dataFiles(dir: String): Set[String] = {
    val v = ManagedTable.versions(spark, dir).last
    ManagedTable.planFiles(spark, dir, "k",
      Long.MinValue, Long.MaxValue, Some(v))._2.toSet
  }

  test("UPDATE rewrites ONLY the files holding matching rows") {
    val dir = fourSegments("upd")
    val before = dataFiles(dir)
    sql("UPDATE gcow.ns.upd SET v = v * 10 WHERE k < 10")
    val after = dataFiles(dir)
    // every untouched segment survives by identity; EXACTLY the one
    // segment holding k<10 is swapped (the runtime `_file IN` group
    // filter is exact, so even the stats-less empty CREATE-TABLE file
    // is carried, not rewritten)
    assert((before -- after).size == 1,
      s"expected exactly 1 swapped file, got ${before -- after}")
    assert((before & after).size == before.size - 1)
    assert(sql("SELECT sum(v) AS s FROM gcow.ns.upd WHERE k < 10")
      .head().getLong(0) == (0 until 10).map(_ * 20).sum)
    assert(sql("SELECT sum(v) AS s FROM gcow.ns.upd WHERE k >= 10")
      .head().getLong(0) == (10 until 400).map(_ * 2L).sum)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.upd")
      .head().getLong(0) == 400L)
  }

  test("the runtime group filter prunes a COW rewrite to matching " +
      "files even when the predicate is NOT stats-prunable") {
    val dir = fourSegments("updrt")
    val before = dataFiles(dir)
    // v % 1000 = 10 matches only v=10 (k=5, segment 0) but has no
    // min/max translation — planning-time stats pruning keeps all 4
    // files, so ONLY Spark's runtime group filter (`_file IN
    // (subquery)` via filterAttributes -> filter()) can shrink the
    // rewrite; before the single-key filterAttributes fix this
    // rewrote the whole table
    sql("UPDATE gcow.ns.updrt SET v = 0 WHERE v % 1000 = 10")
    val after = dataFiles(dir)
    assert((before -- after).size == 1,
      s"expected exactly 1 swapped file (runtime-pruned rewrite), " +
        s"got ${before -- after}")
    assert((before & after).size == before.size - 1)
    assert(sql("SELECT v FROM gcow.ns.updrt WHERE k = 5")
      .head().getLong(0) == 0L)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.updrt " +
      "WHERE v = k * 2").head().getLong(0) == 399L)
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    fourSegments("mrg")
    Seq((5L, 999L, "u"), (105L, 0L, "d"), (1000L, 42L, "i"))
      .toDF("k", "v", "op").createOrReplaceTempView("mrg_src")
    sql("""MERGE INTO gcow.ns.mrg t USING mrg_src s ON t.k = s.k
          |WHEN MATCHED AND s.op = 'd' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
          |""".stripMargin)
    assert(sql("SELECT v FROM gcow.ns.mrg WHERE k = 5")
      .head().getLong(0) == 999L)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.mrg WHERE k = 105")
      .head().getLong(0) == 0L)
    assert(sql("SELECT v FROM gcow.ns.mrg WHERE k = 1000")
      .head().getLong(0) == 42L)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.mrg")
      .head().getLong(0) == 400L) // 400 - 1 delete + 1 insert
    // row images the merge never touched are bit-identical
    assert(sql(
      "SELECT count(*) AS n FROM gcow.ns.mrg WHERE v = k * 2 " +
        "AND k NOT IN (5, 105, 1000)").head().getLong(0) == 398L)
  }

  test("DELETE whose predicate the exact tier refuses runs as copy-on-write") {
    val dir = fourSegments("moddel")
    // k % 2 = 0 has no exact Filter translation -> row-level path
    sql("DELETE FROM gcow.ns.moddel WHERE k % 2 = 0 AND k < 100")
    assert(sql("SELECT count(*) AS n FROM gcow.ns.moddel")
      .head().getLong(0) == 350L)
    assert(sql(
      "SELECT count(*) AS n FROM gcow.ns.moddel WHERE k < 100")
      .head().getLong(0) == 50L)
    assert(ManagedTable.read(spark, dir).count() == 350L)
  }

  test("UPDATE through existing deletion vectors never resurrects rows") {
    val dir = fourSegments("upddv")
    ManagedTable.deleteWhere(spark, dir, col("k") === 3L || col("k") === 7L)
    sql("UPDATE gcow.ns.upddv SET v = -1 WHERE k < 10")
    // 8 live rows updated; the two tombstoned ones stay gone
    assert(sql("SELECT count(*) AS n FROM gcow.ns.upddv WHERE v = -1")
      .head().getLong(0) == 8L)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.upddv " +
      "WHERE k IN (3, 7)").head().getLong(0) == 0L)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.upddv")
      .head().getLong(0) == 398L)
    // the rewritten segment materialized its tombstones; untouched
    // segments keep reading through the carried DV reference
    assert(ManagedTable.read(spark, dir).count() == 398L)
  }

  test("a concurrent DV-only delete between scan and commit fails " +
      "the COW swap (deleted rows never resurrect)") {
    val dir = fourSegments("dvrace")
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
      RowLevelOperation}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val op = new GraftRowLevelOperation(dir,
      RowLevelOperation.Command.UPDATE)
    // the operation resolves its snapshot and builds its scan...
    op.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    // ...then a concurrent deleteWhere lands: DV-ONLY — the data-file
    // list is unchanged, so the old subset-only check passed and the
    // COW swap silently dropped the tombstones (advisor finding)
    ManagedTable.deleteWhere(spark, dir, col("k") === 5L)
    val tblSchema = ManagedTable.read(spark, dir).schema
    val info = new LogicalWriteInfo {
      override def queryId(): String = "dvrace"
      override def schema(): org.apache.spark.sql.types.StructType =
        tblSchema
      override def options(): CaseInsensitiveStringMap =
        CaseInsensitiveStringMap.empty()
    }
    val write = op.newWriteBuilder(info).build().toBatch
    val e = intercept[IllegalArgumentException] {
      write.commit(Array.empty)
    }
    assert(e.getMessage.contains("tombstones"),
      s"expected a DV-conflict refusal, got: ${e.getMessage}")
    // the concurrent delete survives, untouched
    assert(ManagedTable.read(spark, dir)
      .filter(col("k") === 5L).count() == 0L)
    assert(ManagedTable.read(spark, dir).count() == 399L)
  }

  test("a serial UPDATE after a delete still works (DV check only " +
      "fires on a genuine race)") {
    val dir = fourSegments("dvser")
    ManagedTable.deleteWhere(spark, dir, col("k") === 5L)
    sql("UPDATE gcow.ns.dvser SET v = -1 WHERE k < 10")
    assert(sql("SELECT count(*) AS n FROM gcow.ns.dvser WHERE v = -1")
      .head().getLong(0) == 9L)
    assert(sql("SELECT count(*) AS n FROM gcow.ns.dvser")
      .head().getLong(0) == 399L)
  }

  test("the _file metadata column is queryable and file-accurate") {
    val dir = fourSegments("meta")
    val byFile = spark.read.format("graft").load(dir)
      .select(col("_file"), col("k"))
      .groupBy("_file").agg(count(lit(1)).as("n"),
        min("k").as("mn"), max("k").as("mx"))
      .collect()
    assert(byFile.length == 4)
    assert(byFile.forall(_.getLong(1) == 100L))
    assert(byFile.forall(r => r.getLong(3) - r.getLong(2) == 99L))
    assert(byFile.forall(_.getString(0).startsWith(dir)))
  }
}
