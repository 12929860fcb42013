package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Logical→physical column mapping ([[ColumnMapping]] +
  * [[ManagedTable.renameColumn]]/[[ManagedTable.dropColumn]]): rename
  * and drop are metadata-only, every read/write/DML/maintenance path
  * translates at the parquet seam, stats keep pruning across a rename,
  * and a re-added name NEVER resurrects the dropped column's bytes.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-cm-$name").toString + "/t"

  private def kv(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit("s"), col("id")).as("s")).coalesce(1)

  test("renameColumn is METADATA-ONLY: same files, old data under the " +
      "new name, stats keep pruning, time travel sees the old name") {
    val dir = tmp("rename")
    ManagedTable.commit(kv(0, 10), dir)
    ManagedTable.appendCommit(kv(10, 20), dir)
    ManagedTable.appendCommit(kv(20, 30), dir)
    val (_, filesBefore, _, _) = ManagedTable.readManifest(spark, dir, 3)
    val (keptBefore, _) = ManagedTable.planFiles(spark, dir, "k", 5, 5)
    val v = ManagedTable.renameColumn(spark, dir, "k", "key")
    assert(v == 4)
    val (_, filesAfter, _, _) = ManagedTable.readManifest(spark, dir, 4)
    assert(filesAfter == filesBefore, "rename must move ZERO data bytes")
    val t = ManagedTable.read(spark, dir)
    assert(t.schema.fieldNames.toSeq == Seq("key", "s"))
    assert(t.schema.forall(_.metadata.json == "{}"),
      "mapping metadata must not leak into the user-facing schema")
    assert(t.orderBy("key").select("key", "s").as[(Long, String)]
      .collect().toSeq == (0L until 30L).map(i => (i, s"s$i")))
    // stats written pre-rename still prune under the NEW logical name
    val (keptAfter, all) = ManagedTable.planFiles(spark, dir, "key", 5, 5)
    assert(keptAfter == keptBefore && keptAfter.size < all.size,
      s"pre-rename stats must keep pruning: $keptAfter vs $keptBefore")
    // time travel below the rename sees the old name
    assert(ManagedTable.read(spark, dir, Some(3))
      .schema.fieldNames.toSeq == Seq("k", "s"))
    // renaming BACK to the physical name fully un-maps
    ManagedTable.renameColumn(spark, dir, "key", "k")
    val (_, _, sj, _) = ManagedTable.readManifest(spark, dir, 5)
    assert(!ColumnMapping.isMapped(ManagedTable.schemaOf(sj.get)))
  }

  test("writes and DML after a rename: append, deleteWhere, " +
      "replaceWhere, merge and compact all translate at the seam") {
    val dir = tmp("dml")
    ManagedTable.commit(kv(0, 10), dir)
    ManagedTable.renameColumn(spark, dir, "k", "key")
    // append with the NEW logical name: lands under the physical name
    ManagedTable.appendCommit(
      spark.range(10, 20).select(col("id").as("key"),
        concat(lit("s"), col("id")).as("s")).coalesce(1), dir)
    assert(ManagedTable.read(spark, dir).count() == 20)
    // deleteWhere on the renamed column
    ManagedTable.deleteWhere(spark, dir, col("key") < 3)
    assert(ManagedTable.read(spark, dir).agg(min("key")).head.getLong(0) == 3)
    // replaceWhere backfill on the renamed column
    ManagedTable.replaceWhere(spark, dir, col("key").between(10, 14),
      spark.range(10, 15).select(col("id").as("key"),
        lit("fresh").as("s")).coalesce(1))
    val after = ManagedTable.read(spark, dir)
    assert(after.filter(col("s") === "fresh").count() == 5)
    assert(after.count() == 17) // 20 - 3 deleted, replacement 1:1
    // merge (CDC upsert) through the mapped schema
    ManagedTable.merge(
      Seq((5L, "merged", 99L)).toDF("key", "s", "seq"),
      dir, keys = Seq("key"), sequenceBy = Seq(col("seq")))
    val merged = ManagedTable.read(spark, dir)
    assert(merged.filter(col("key") === 5).select("s").head.getString(0)
      == "merged")
    // the merge widened the schema with `seq` — old rows read null
    assert(merged.filter(col("key") === 6).select("seq").head.isNullAt(0))
    // compact rewrites under physical names and carries the mapping
    ManagedTable.compact(spark, dir, smallFileBytes = 64L * 1024 * 1024)
    val packed = ManagedTable.read(spark, dir)
    assert(packed.count() == 17)
    assert(packed.filter(col("key") === 5).select("s").head.getString(0)
      == "merged")
  }

  test("dropColumn is metadata-only and a RE-ADDED name never " +
      "resurrects the dropped column's bytes (retired ledger)") {
    val dir = tmp("dropreadd")
    ManagedTable.commit(
      spark.range(0, 10).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"),
        lit("keep").as("s")).coalesce(1), dir)
    val (_, files1, _, _) = ManagedTable.readManifest(spark, dir, 1)
    ManagedTable.dropColumn(spark, dir, "v")
    val (_, files2, _, _) = ManagedTable.readManifest(spark, dir, 2)
    assert(files2 == files1, "drop must move ZERO data bytes")
    val dropped = ManagedTable.read(spark, dir)
    assert(dropped.schema.fieldNames.toSeq == Seq("k", "s"))
    // time travel below the drop still sees the column and its data
    assert(ManagedTable.read(spark, dir, Some(1))
      .filter(col("k") === 3).select("v").head.getString(0) == "old3")
    // re-ADD the same name: fresh physical column — old bytes stay dead
    val wide = org.apache.spark.sql.types.StructType(
      dropped.schema.fields :+ org.apache.spark.sql.types.StructField(
        "v", org.apache.spark.sql.types.StringType, nullable = true))
    ManagedTable.evolveSchema(spark, dir, wide)
    val readded = ManagedTable.read(spark, dir)
    assert(readded.schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(readded.filter(col("v").isNotNull).count() == 0,
      "re-added column must read NULL on pre-drop rows, never the " +
        "dead column's values")
    // new writes land in the fresh physical column and read back
    ManagedTable.appendCommit(
      spark.range(10, 12).select(col("id").as("k"),
        lit("keep").as("s"),
        concat(lit("new"), col("id")).as("v")).coalesce(1), dir)
    val mixed = ManagedTable.read(spark, dir)
    assert(mixed.filter(col("v").isNotNull).count() == 2)
    assert(mixed.filter(col("k") === 10).select("v").head.getString(0)
      == "new10")
    // and the manifest maps the re-added field away from the dead name
    val (_, _, sj, stats) =
      ManagedTable.readManifest(spark, dir,
        ManagedTable.versions(spark, dir).last)
    val f = ManagedTable.schemaOf(sj.get).fields.find(_.name == "v").get
    assert(ColumnMapping.phys(f) != "v",
      s"re-added 'v' must map to a fresh physical name, got " +
        ColumnMapping.phys(f))
    assert(ManagedTable.retiredPhysical(stats) == Set("v"),
      "the retired ledger must carry the dropped physical name forward")
  }

  test("the connector reads/writes/streams a mapped table: logical " +
      "names outside, physical at the parquet seam, pruning intact") {
    val dir = tmp("conn")
    ManagedTable.commit(kv(0, 100), dir)
    ManagedTable.appendCommit(kv(100, 200), dir)
    ManagedTable.renameColumn(spark, dir, "k", "key")
    val t = spark.read.format("graft").load(dir)
    assert(t.schema.fieldNames.toSeq == Seq("key", "s"))
    assert(t.schema.forall(_.metadata.json == "{}"))
    // values through both the columnar (DV-free) and filtered paths
    assert(t.orderBy("key").select("key").as[Long].collect().toSeq
      == (0L until 200L))
    assert(t.filter(col("key") === 150).select("s").head.getString(0)
      == "s150")
    // agg pushdown consults physical-keyed stats correctly
    val aggd = t.agg(count(lit(1)).as("n"), min("key").as("lo"),
      max("key").as("hi")).head
    assert(aggd.getLong(0) == 200 && aggd.getLong(1) == 0 &&
      aggd.getLong(2) == 199)
    // DSv2 append with logical names
    spark.range(200, 210).select(col("id").as("key"),
        concat(lit("s"), col("id")).as("s"))
      .write.format("graft").mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 210)
    assert(spark.read.format("graft").load(dir)
      .filter(col("key") === 205).select("s").head.getString(0) == "s205")
    // streaming read of the mapped table (fresh stream, AvailableNow)
    import org.apache.spark.sql.streaming.Trigger
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.select("key").collect().map(_.getLong(0)) }; ()
      }
      .option("checkpointLocation", ckptDir("cmconn"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.sorted.toSeq == (0L until 210L))
  }

  test("SQL lifecycle: ALTER TABLE RENAME COLUMN / DROP COLUMN / " +
      "re-ADD through the catalog, with INSERT and SELECT between") {
    val wh = Files.createTempDirectory("graft-cm-cat").toString
    val cat = s"gcm${Integer.toHexString(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (k BIGINT, v STRING) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN v TO label")
    assert(spark.table(s"$cat.ns.t").schema.fieldNames.toSeq
      == Seq("k", "label"))
    assert(spark.sql(s"SELECT label FROM $cat.ns.t WHERE k = 2")
      .head.getString(0) == "b")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 'c')")
    // row-level UPDATE (COW) rewrites under the mapped physical names
    spark.sql(s"UPDATE $cat.ns.t SET label = 'B' WHERE k = 2")
    assert(spark.sql(s"SELECT label FROM $cat.ns.t WHERE k = 2")
      .head.getString(0) == "B")
    spark.sql(s"ALTER TABLE $cat.ns.t DROP COLUMN label")
    assert(spark.table(s"$cat.ns.t").schema.fieldNames.toSeq == Seq("k"))
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMNS (label STRING)")
    val rows = spark.sql(
      s"SELECT k, label FROM $cat.ns.t ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(_.isNullAt(1)),
      "the re-added column must be NULL everywhere, not the old values")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (4, 'fresh')")
    assert(spark.sql(s"SELECT label FROM $cat.ns.t WHERE k = 4")
      .head.getString(0) == "fresh")
    // unsupported retype still refuses with the metadata-only story
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("not supported") ||
      e.getMessage.contains("NOT_SUPPORTED"))
  }

  test("CDC changes() across a rename uses the to-version's names; " +
      "vacuum keeps mapped segments; export refuses mapped layouts") {
    val dir = tmp("cdc")
    ManagedTable.commit(kv(0, 5), dir)
    ManagedTable.renameColumn(spark, dir, "s", "text")
    ManagedTable.appendCommit(
      spark.range(5, 8).select(col("id").as("k"),
        concat(lit("s"), col("id")).as("text")).coalesce(1), dir)
    val diff = ManagedTable.changes(spark, dir, 2, 3, keys = Seq("k"))
    assert(diff.schema.fieldNames.toSeq ==
      Seq("_change_type", "k", "text"))
    assert(diff.filter(col("_change_type") === "insert").count() == 3)
    // vacuum must not sweep live mapped segments
    val swept = ManagedTable.vacuum(spark, dir, retentionMs = 0)
    assert(ManagedTable.read(spark, dir).count() == 8)
    val e = intercept[Exception] {
      ManagedTable.exportManifest(spark, dir, s"$dir/_export.txt")
    }
    assert(e.getMessage.contains("column mapping") ||
      e.getMessage.contains("PHYSICAL"))
  }

  test("layout contracts follow a rename; dropping a clustering " +
      "column is refused") {
    val dir = tmp("layout")
    ManagedTable.commit(kv(0, 10), dir)
    ManagedTable.setTableProperties(spark, dir, Map(
      ManagedTable.ClusterByProp -> "k",
      BloomSkipping.ColumnsProp -> "k,s"))
    // rename the clustered+digested column: both property lists must
    // now name the NEW logical column, or every later write silently
    // stops clustering/digesting (clusterFrame skips absent names)
    ManagedTable.renameColumn(spark, dir, "k", "key")
    val props = ManagedTable.tableProperties(spark, dir)
    assert(props(ManagedTable.ClusterByProp) == "key")
    assert(props(BloomSkipping.ColumnsProp) == "key,s")
    // and a post-rename append still builds digests under the new name
    ManagedTable.appendCommit(
      spark.range(10, 20).select(col("id").as("key"),
        concat(lit("s"), col("id")).as("s")).coalesce(1), dir)
    val head = ManagedTable.readManifest(spark, dir,
      ManagedTable.versions(spark, dir).last)
    assert(head._4.exists(_._2.keys.exists(
      _.startsWith(BloomSkipping.StatPrefix))),
      "post-rename appends must keep digesting")

    // dropping the clustering column: refused, names the contract
    val e = intercept[IllegalArgumentException] {
      ManagedTable.dropColumn(spark, dir, "key")
    }
    assert(e.getMessage.contains("clustering column"))
    // dropping a digest-only column: allowed, list updated
    ManagedTable.dropColumn(spark, dir, "s")
    assert(ManagedTable.tableProperties(spark, dir)(
      BloomSkipping.ColumnsProp) == "key")
    assert(ManagedTable.read(spark, dir).columns.toSeq == Seq("key"))
  }
}
