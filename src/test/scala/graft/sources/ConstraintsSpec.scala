package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Table properties (`__table` ledger `prop:` tier — the reference's
  * DLT `table_properties`, 03_Data_Ingestion.py:62) and CHECK
  * constraints (`graft.constraints.<name>` → SQL expr, the DLT
  * `expect_or_fail` tier / Delta's ADD CONSTRAINT): one metadata-only
  * commit to SET/UNSET, enforced by every row-adding writer at
  * new-rows scale, validated against the schema at SET time and
  * re-validated by the schema DDLs.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-ct-$name").toString + "/t"

  private def kv(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit("s"), col("id")).as("s")).coalesce(1)

  test("properties round-trip as ONE metadata-only commit and carry " +
      "through appends, deletes and compaction") {
    val dir = tmp("props")
    ManagedTable.commit(kv(0, 10), dir)
    val (_, files1, _, _) = ManagedTable.readManifest(spark, dir, 1)
    val v = ManagedTable.setTableProperties(spark, dir,
      Map("quality" -> "silver", "owner.team" -> "ingest"))
    assert(v == 2)
    val (_, files2, _, _) = ManagedTable.readManifest(spark, dir, 2)
    assert(files2 == files1, "SET TBLPROPERTIES must move zero bytes")
    assert(ManagedTable.tableProperties(spark, dir) ==
      Map("quality" -> "silver", "owner.team" -> "ingest"))
    ManagedTable.appendCommit(kv(10, 20), dir)
    ManagedTable.deleteWhere(spark, dir, col("k") === 0)
    ManagedTable.compact(spark, dir, smallFileBytes = 64L * 1024 * 1024)
    assert(ManagedTable.tableProperties(spark, dir)("quality") == "silver",
      "properties must survive append/delete/compact")
    ManagedTable.setTableProperties(spark, dir,
      Map("quality" -> "gold"), unset = Seq("owner.team"))
    assert(ManagedTable.tableProperties(spark, dir) ==
      Map("quality" -> "gold"))
  }

  test("CHECK constraints: validated at SET, enforced by append/" +
      "replaceWhere/merge, NULL passes, violations commit NOTHING") {
    val dir = tmp("check")
    ManagedTable.commit(
      Seq((1L, Some(10L)), (2L, Some(20L))).toDF("k", "v"), dir)
    // an unresolvable expression fails at SET time, not first write
    val bad = intercept[IllegalArgumentException] {
      ManagedTable.setTableProperties(spark, dir,
        Map(ManagedTable.ConstraintPrefix + "ghost" -> "no_such_col > 0"))
    }
    assert(bad.getMessage.contains("does not resolve"))
    ManagedTable.setTableProperties(spark, dir,
      Map(ManagedTable.ConstraintPrefix + "positive" -> "v > 0"))
    // valid append passes; NULL passes (SQL CHECK three-valued logic)
    ManagedTable.appendCommit(
      Seq((3L, Some(30L)), (4L, None: Option[Long])).toDF("k", "v"), dir)
    assert(ManagedTable.read(spark, dir).count() == 4)
    // violating append refuses and lands NO version
    val before = ManagedTable.versions(spark, dir)
    val e = intercept[IllegalArgumentException] {
      ManagedTable.appendCommit(Seq((5L, Some(-1L))).toDF("k", "v"), dir)
    }
    assert(e.getMessage.contains("positive") && e.getMessage.contains("v > 0"))
    assert(ManagedTable.versions(spark, dir) == before)
    assert(ManagedTable.read(spark, dir).count() == 4)
    // replaceWhere enforces on the replacement rows
    intercept[IllegalArgumentException] {
      ManagedTable.replaceWhere(spark, dir, col("k") === 1,
        Seq((1L, Some(-5L))).toDF("k", "v"))
    }
    // merge enforces on the merged image (an upsert INTO violation)
    intercept[IllegalArgumentException] {
      ManagedTable.merge(Seq((2L, Some(-7L), 9L)).toDF("k", "v", "seq"),
        dir, keys = Seq("k"), sequenceBy = Seq(col("seq")))
    }
    assert(ManagedTable.read(spark, dir)
      .filter(col("v") < 0).count() == 0)
  }

  test("schema DDLs defend constraints: rename/drop of a referenced " +
      "column refuses; unrelated DDL passes and enforcement follows " +
      "the NEW name") {
    val dir = tmp("ddl")
    ManagedTable.commit(Seq((1L, 10L, "a")).toDF("k", "v", "s"), dir)
    ManagedTable.setTableProperties(spark, dir,
      Map(ManagedTable.ConstraintPrefix + "positive" -> "v > 0"))
    intercept[IllegalArgumentException] {
      ManagedTable.renameColumn(spark, dir, "v", "value")
    }
    intercept[IllegalArgumentException] {
      ManagedTable.dropColumn(spark, dir, "v")
    }
    // unrelated rename is fine, and enforcement still fires after it
    ManagedTable.renameColumn(spark, dir, "s", "label")
    intercept[IllegalArgumentException] {
      ManagedTable.appendCommit(
        Seq((2L, -1L, "b")).toDF("k", "v", "label"), dir)
    }
    // dropping the constraint releases the column
    ManagedTable.setTableProperties(spark, dir, Map.empty,
      unset = Seq(ManagedTable.ConstraintPrefix + "positive"))
    ManagedTable.renameColumn(spark, dir, "v", "value")
    ManagedTable.appendCommit(
      Seq((2L, -1L, "b")).toDF("k", "value", "label"), dir)
    assert(ManagedTable.read(spark, dir).count() == 2)
  }

  test("SQL surface: CREATE ... TBLPROPERTIES, SHOW TBLPROPERTIES, " +
      "ALTER SET/UNSET, INSERT + UPDATE enforcement through the " +
      "connector writers") {
    val wh = Files.createTempDirectory("graft-ct-cat").toString
    val cat = s"gct${Integer.toHexString(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('quality' = 'silver')")
    val shown = spark.sql(s"SHOW TBLPROPERTIES $cat.ns.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("quality").contains("silver"))
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 10), (2, 20)")
    spark.sql(s"ALTER TABLE $cat.ns.t SET TBLPROPERTIES " +
      s"('${ManagedTable.ConstraintPrefix}positive' = 'v > 0')")
    // INSERT violating the constraint fails and lands nothing
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, -1)")
    }
    assert(e.getMessage.contains("positive") ||
      e.getCause.getMessage.contains("positive"))
    assert(spark.table(s"$cat.ns.t").count() == 2)
    // UPDATE rewriting a row INTO violation fails too (COW writer)
    val u = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET v = -5 WHERE k = 1")
    }
    assert(u.getMessage.contains("positive") ||
      u.getCause.getMessage.contains("positive"))
    assert(spark.table(s"$cat.ns.t").filter(col("v") < 0).count() == 0)
    // valid writes still flow; UNSET releases the gate
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 30)")
    spark.sql(s"ALTER TABLE $cat.ns.t UNSET TBLPROPERTIES " +
      s"('${ManagedTable.ConstraintPrefix}positive')")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (4, -4)")
    assert(spark.table(s"$cat.ns.t").count() == 4)
  }

  test("the native streaming sink refuses a violating epoch before " +
      "any manifest write") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp("stream")
    ManagedTable.commit(Seq((1L, 10L)).toDF("k", "v"), dir)
    ManagedTable.setTableProperties(spark, dir,
      Map(ManagedTable.ConstraintPrefix + "positive" -> "v > 0"))
    val src = tmp("streamsrc")
    ManagedTable.commit(Seq((2L, -2L)).toDF("k", "v"), src)
    val before = ManagedTable.versions(spark, dir)
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", ckptDir("ctstream"))
      .trigger(Trigger.AvailableNow()).start(dir)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.getMessage.contains("positive") ||
      Option(err.getCause).exists(_.getMessage.contains("positive")))
    assert(ManagedTable.versions(spark, dir) == before,
      "a refused epoch must land NO version")
  }

  test("the table's contracts survive INSERT OVERWRITE: constraints " +
      "enforce on the overwrite rows, layout lists follow the schema") {
    val dir = tmp("overwrite")
    ManagedTable.commit(kv(0, 10), dir)
    ManagedTable.setTableProperties(spark, dir, Map(
      ManagedTable.ConstraintPrefix + "k_nonneg" -> "k >= 0",
      "quality" -> "gold",
      ManagedTable.ClusterByProp -> "k",
      BloomSkipping.ColumnsProp -> "k,s"))

    // a clean overwrite: contracts carry verbatim
    kv(100, 120).write.format("graft").mode("overwrite").save(dir)
    val props = ManagedTable.tableProperties(spark, dir)
    assert(props("quality") == "gold")
    assert(props(ManagedTable.ConstraintPrefix + "k_nonneg") == "k >= 0")
    assert(props(ManagedTable.ClusterByProp) == "k")
    assert(props(BloomSkipping.ColumnsProp) == "k,s")
    assert(ManagedTable.read(spark, dir).count() == 20)

    // the carried constraint ENFORCES on overwrite rows
    val bad = spark.range(-5, 0).select(col("id").as("k"),
      concat(lit("s"), col("id")).as("s"))
    val err = intercept[Exception] {
      bad.write.format("graft").mode("overwrite").save(dir)
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage)
      .getOrElse("")).contains("k_nonneg"))
    assert(ManagedTable.read(spark, dir).count() == 20,
      "a refused overwrite must not land")

    // an overwrite missing a column NULL-FILLS it (Spark's byName
    // output resolution against the table schema) and NULL passes
    // CHECK — the overwrite lands with the table schema intact and
    // every contract still in place
    val narrower = spark.range(3).select(
      concat(lit("s"), col("id")).as("s"))
    narrower.write.format("graft").mode("overwrite").save(dir)
    assert(ManagedTable.read(spark, dir).columns.toSeq == Seq("k", "s"))
    assert(ManagedTable.read(spark, dir).count() == 3)
    val props2 = ManagedTable.tableProperties(spark, dir)
    assert(props2("quality") == "gold")
    assert(props2(ManagedTable.ClusterByProp) == "k")

    // the ledger-carry schema filter itself (the defense for direct
    // API truncates that CAN change schema): layout lists keep only
    // surviving columns, everything else carries verbatim
    val head = ManagedTable.readManifest(spark, dir,
      ManagedTable.versions(spark, dir).last)._4
    val carried = ManagedTable.carryLedgerForSchema(head,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val carriedProps = ManagedTable.propertiesOf(carried)
    assert(carriedProps("quality") == "gold")
    assert(carriedProps(
      ManagedTable.ConstraintPrefix + "k_nonneg") == "k >= 0")
    assert(!carriedProps.contains(ManagedTable.ClusterByProp),
      "clusterBy on a vanished column must not linger")
    assert(carriedProps(BloomSkipping.ColumnsProp) == "s")
  }
}
