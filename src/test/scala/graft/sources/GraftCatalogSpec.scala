package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Name-based SQL over managed tables through [[GraftCatalog]]. One
  * catalog instance (`gcat`) on a per-suite warehouse.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-cat").toString + "/wh"
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    wh
  }

  private def sql(q: String): DataFrame = { warehouse; spark.sql(q) }

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("DDL + DML round trip: create, insert, select, overwrite, drop") {
    sql("CREATE NAMESPACE gcat.corpus")
    sql("CREATE TABLE gcat.corpus.docs (doc_id BIGINT, lang STRING)")
    // an empty created table reads back typed
    assert(sql("SELECT * FROM gcat.corpus.docs").collect().isEmpty)
    sql("INSERT INTO gcat.corpus.docs VALUES (1, 'en'), (2, 'de')")
    sql("INSERT INTO gcat.corpus.docs VALUES (3, 'en')")
    assert(sortedRows(sql(
      "SELECT lang, count(*) AS n FROM gcat.corpus.docs GROUP BY lang")) ==
      Seq(Row("de", 1L), Row("en", 2L)))
    // versions: 1=create, 2+3=the inserts; the path API sees the same
    val dir = s"$warehouse/corpus/docs"
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3))
    assert(ManagedTable.read(spark, dir).count() == 3)
    sql("INSERT OVERWRITE gcat.corpus.docs VALUES (9, 'fr')")
    assert(sortedRows(sql("SELECT * FROM gcat.corpus.docs")) ==
      Seq(Row(9L, "fr")))
    sql("DROP TABLE gcat.corpus.docs")
    assert(ManagedTable.versions(spark, dir).isEmpty)
    sql("DROP NAMESPACE gcat.corpus")
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the manifest log") {
    sql("CREATE NAMESPACE gcat.tt")
    sql("CREATE TABLE gcat.tt.t (k BIGINT)")
    sql("INSERT INTO gcat.tt.t VALUES (1)")
    val afterV2 = System.currentTimeMillis()
    Thread.sleep(1100) // mtime resolution is a full second on some fs
    sql("INSERT INTO gcat.tt.t VALUES (2)")
    assert(sql("SELECT * FROM gcat.tt.t").count() == 2)
    assert(sql("SELECT * FROM gcat.tt.t VERSION AS OF 2").count() == 1)
    assert(sql("SELECT * FROM gcat.tt.t VERSION AS OF 1").count() == 0)
    val tsLit = new java.sql.Timestamp(afterV2).toString
    assert(sql(
      s"SELECT * FROM gcat.tt.t TIMESTAMP AS OF '$tsLit'").count() == 1)
    sql("DROP TABLE gcat.tt.t"); sql("DROP NAMESPACE gcat.tt")
  }

  test("CTAS, SHOW TABLES/NAMESPACES, rename") {
    sql("CREATE NAMESPACE gcat.ctas")
    sql("CREATE TABLE gcat.ctas.squares AS " +
      "SELECT id AS k, id * id AS sq FROM range(5)")
    assert(sql("SELECT sum(sq) AS s FROM gcat.ctas.squares")
      .collect().head.getLong(0) == 30L)
    assert(sql("SHOW TABLES IN gcat.ctas").collect()
      .map(_.getString(1)).toSeq == Seq("squares"))
    assert(sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).toSeq.contains("ctas"))
    sql("ALTER TABLE gcat.ctas.squares RENAME TO ctas.sq2")
    assert(sql("SELECT count(*) FROM gcat.ctas.sq2")
      .collect().head.getLong(0) == 5L)
    assert(!spark.catalog.tableExists("gcat.ctas.squares"))
    sql("DROP TABLE gcat.ctas.sq2"); sql("DROP NAMESPACE gcat.ctas")
  }

  test("catalog tables get the connector's optimizer tier: manifest-only count") {
    sql("CREATE NAMESPACE gcat.opt")
    sql("CREATE TABLE gcat.opt.t AS SELECT id AS k FROM range(1000)")
    val q = sql("SELECT count(*) AS n, max(k) AS mx FROM gcat.opt.t")
    assert(q.collect().toSeq == Seq(Row(1000L, 999L)))
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    sql("DROP TABLE gcat.opt.t"); sql("DROP NAMESPACE gcat.opt")
  }

  test("guard rails: missing table/namespace, ALTER, illegal names, partitioning") {
    sql("CREATE NAMESPACE gcat.g")
    intercept[Exception](sql("SELECT * FROM gcat.g.nope").collect())
    intercept[Exception](sql("CREATE TABLE gcat.missing.t (k BIGINT)"))
    intercept[Exception](
      sql("CREATE TABLE gcat.g.p (k BIGINT) PARTITIONED BY (k)"))
    sql("CREATE TABLE gcat.g.t (k BIGINT)")
    // ALTER: only ADD COLUMNS is supported (covered in its own test);
    // destructive shapes refuse
    intercept[Exception](sql("ALTER TABLE gcat.g.t DROP COLUMN k"))
    intercept[Exception](sql("CREATE TABLE gcat.g.t (k BIGINT)"))
    // non-cascade drop of a non-empty namespace refuses
    intercept[Exception](sql("DROP NAMESPACE gcat.g"))
    sql("DROP NAMESPACE gcat.g CASCADE")
    assert(!sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).toSeq.contains("g"))
  }

  test("CREATE TABLE CLUSTER BY: inserts land range-disjoint sorted " +
      "files and a selective probe prunes immediately") {
    sql("CREATE NAMESPACE gcat.cl")
    sql("CREATE TABLE gcat.cl.t (k BIGINT, s STRING) CLUSTER BY (k) " +
      s"TBLPROPERTIES ('${ManagedTable.TargetFileSizeProp}' = '2048')")
    val dir = s"$warehouse/cl/t"
    assert(ManagedTable.tableProperties(spark, dir)
      .get(ManagedTable.ClusterByProp).contains("k"))
    // a full-range unsorted insert: only the declared clustering can
    // make the landed files range-disjoint
    spark.range(2000).select(
      (col("id") * 977 % 2000).as("k"),
      concat(lit("pad-pad-pad-"), col("id")).as("s"))
      .createOrReplaceTempView("cl_src")
    // AQE's parallelism-first coalescing ignores sub-MB advisory
    // sizes; pin it down so the 2 KB targetFileSize is honored at
    // test scale (at real scale the default 64 MB advisory is fine)
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024")
    try {
      sql("INSERT INTO gcat.cl.t SELECT k, s FROM cl_src")
    } finally {
      spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst")
      spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    }
    val (kept, total) = ManagedTable.planFiles(spark, dir, "k", 10L, 20L)
    assert(total.size > 1,
      s"expected the clustered insert to split into multiple files, " +
        s"got ${total.size}")
    assert(kept.size < total.size,
      s"expected a selective range probe to prune: ${kept.size}/" +
        s"${total.size}")
    // correctness: every row survives the clustered landing
    assert(sql("SELECT count(*) AS n FROM gcat.cl.t").head.getLong(0)
      == 2000L)
    assert(sql("SELECT count(DISTINCT k) AS n FROM gcat.cl.t")
      .head.getLong(0) == 2000L)
    // a second insert stays clustered and pruning still holds
    sql("INSERT INTO gcat.cl.t SELECT k + 2000, s FROM cl_src")
    val (kept2, total2) = ManagedTable.planFiles(spark, dir, "k", 10L, 20L)
    assert(kept2.size < total2.size)
    // a CLUSTER BY column missing from the schema refuses at CREATE
    intercept[Exception](
      sql("CREATE TABLE gcat.cl.bad (k BIGINT) CLUSTER BY (nope)"))
    // COW UPDATE preserves clustering (runs the declared sort)
    sql("UPDATE gcat.cl.t SET s = 'x' WHERE k % 1009 = 5")
    assert(sql("SELECT count(*) AS n FROM gcat.cl.t WHERE s = 'x'")
      .head.getLong(0) > 0L)
    val (kept3, total3) = ManagedTable.planFiles(spark, dir, "k", 10L, 20L)
    assert(kept3.size < total3.size)
    // ALTER TABLE re-declares / drops the contract (property move only)
    sql("ALTER TABLE gcat.cl.t CLUSTER BY NONE")
    assert(!ManagedTable.tableProperties(spark, dir)
      .contains(ManagedTable.ClusterByProp))
    sql("ALTER TABLE gcat.cl.t CLUSTER BY (k)")
    assert(ManagedTable.tableProperties(spark, dir)
      .get(ManagedTable.ClusterByProp).contains("k"))
    intercept[Exception](sql("ALTER TABLE gcat.cl.t CLUSTER BY (nope)"))
    // the declaration surfaces through catalog introspection (Spark
    // renders the ClusterByTransform generically as cluster_by(k))
    val create = sql("SHOW CREATE TABLE gcat.cl.t").head.getString(0)
    assert(create.contains("cluster_by(k)"),
      s"expected the clustering transform in SHOW CREATE TABLE:\n$create")
  }

  test("a streaming write to a CLUSTERED table lands sorted epochs") {
    import org.apache.spark.sql.streaming.Trigger
    sql("CREATE NAMESPACE gcat.scl")
    sql("CREATE TABLE gcat.scl.t (k BIGINT, s STRING) CLUSTER BY (k)")
    val dir = s"$warehouse/scl/t"
    val src = java.nio.file.Files.createTempDirectory("sclsrc").toString
    // one unsorted source version -> one micro-batch epoch
    ManagedTable.appendCommit(spark.range(500)
      .select((col("id") * 877 % 500).as("k"),
        concat(lit("s"), col("id")).as("s")).coalesce(1), src)
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sclck").toString)
      .trigger(Trigger.AvailableNow()).toTable("gcat.scl.t")
    q.awaitTermination()
    assert(sql("SELECT count(*) AS n FROM gcat.scl.t")
      .head.getLong(0) == 500L)
    // the epoch's files: each internally sorted on the cluster key
    // (the declared write ordering applies to micro-batches too)
    val files = ManagedTable.read(spark, dir).inputFiles.toSet
    files.foreach { f =>
      val ks = spark.read.parquet(f).select("k")
        .collect().map(_.getLong(0)).toSeq
      assert(ks == ks.sorted,
        s"expected cluster-key-sorted file, got unsorted $f")
    }
  }

  test("column DEFAULT values: declared at CREATE, filled into " +
      "INSERTs that omit the column; rejected on ALTER ADD") {
    sql("CREATE NAMESPACE gcat.dft")
    sql("CREATE TABLE gcat.dft.t (k BIGINT, " +
      "lang STRING DEFAULT 'en', score BIGINT DEFAULT 100)")
    sql("INSERT INTO gcat.dft.t (k) VALUES (1)")
    sql("INSERT INTO gcat.dft.t (k, lang) VALUES (2, 'de')")
    sql("INSERT INTO gcat.dft.t VALUES (3, 'fr', 7)")
    sql("INSERT INTO gcat.dft.t (k, score) VALUES (4, DEFAULT)")
    assert(sortedRows(sql("SELECT * FROM gcat.dft.t")) ==
      Seq(Row(1L, "en", 100L), Row(2L, "de", 100L),
        Row(3L, "fr", 7L), Row(4L, "en", 100L)))
    // a default on ALTER ADD COLUMNS refuses: old segments read null
    // for added columns, which would contradict the declared default
    val e = intercept[Exception](
      sql("ALTER TABLE gcat.dft.t ADD COLUMNS (w BIGINT DEFAULT 5)"))
    assert(e.getMessage.contains("DEFAULT"))
    // plain ALTER ADD still works alongside declared defaults
    sql("ALTER TABLE gcat.dft.t ADD COLUMNS (w BIGINT)")
    sql("INSERT INTO gcat.dft.t (k) VALUES (5)")
    assert(sql("SELECT lang FROM gcat.dft.t WHERE k = 5")
      .head.getString(0) == "en")
  }

  test("CREATE OR REPLACE TABLE swaps schema and contents atomically " +
      "from the reader's view") {
    sql("CREATE NAMESPACE gcat.cor")
    sql("CREATE TABLE gcat.cor.t (k BIGINT)")
    sql("INSERT INTO gcat.cor.t VALUES (1), (2)")
    sql("CREATE OR REPLACE TABLE gcat.cor.t (k BIGINT, s STRING)")
    assert(sql("SELECT * FROM gcat.cor.t").schema.fieldNames.toSeq ==
      Seq("k", "s"))
    assert(sql("SELECT * FROM gcat.cor.t").collect().isEmpty)
    sql("INSERT INTO gcat.cor.t VALUES (9, 'x')")
    assert(sql("SELECT s FROM gcat.cor.t").head.getString(0) == "x")
    // plain CREATE still refuses to clobber
    intercept[Exception](sql("CREATE TABLE gcat.cor.t (z BIGINT)"))
  }

  test("MERGE INTO ... WITH SCHEMA EVOLUTION widens the target " +
      "through the catalog's ADD COLUMNS path") {
    sql("CREATE NAMESPACE gcat.se")
    sql("CREATE TABLE gcat.se.t (k BIGINT, v BIGINT)")
    sql("INSERT INTO gcat.se.t VALUES (1, 10), (2, 20)")
    Seq((2L, 99L, "upd"), (3L, 30L, "new"))
      .toDF("k", "v", "note").createOrReplaceTempView("se_src")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO gcat.se.t t
          |USING se_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |""".stripMargin)
    assert(sql("SELECT * FROM gcat.se.t").schema.fieldNames.toSeq ==
      Seq("k", "v", "note"))
    assert(sortedRows(sql("SELECT k, v, note FROM gcat.se.t")) ==
      Seq(Row(1L, 10L, null), Row(2L, 99L, "upd"), Row(3L, 30L, "new")))
  }

  test("SQL DELETE FROM lands as a deletion-vector version; TRUNCATE empties") {
    sql("CREATE NAMESPACE gcat.del")
    sql("CREATE TABLE gcat.del.t AS " +
      "SELECT id AS k, CAST(id % 3 AS STRING) AS s FROM range(30)")
    val dir = s"$warehouse/del/t"
    sql("DELETE FROM gcat.del.t WHERE k < 5 OR k >= 25")
    assert(sql("SELECT count(*) AS n FROM gcat.del.t")
      .collect().head.getLong(0) == 20L)
    assert(sql("SELECT min(k) AS mn, max(k) AS mx FROM gcat.del.t")
      .collect().toSeq == Seq(Row(5L, 24L)))
    // no data rewrite: the DELETE version carries a DV reference
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3))
    assert(ManagedTable.read(spark, dir).count() == 20)
    sql("DELETE FROM gcat.del.t WHERE s IN ('0')")
    assert(sql("SELECT count(*) AS n FROM gcat.del.t")
      .collect().head.getLong(0) == 13L)
    // a condition with no exact filter translation falls through to
    // the copy-on-write row-level path (GraftRowLevelSpec) and works
    sql("DELETE FROM gcat.del.t WHERE k % 2 = 0")
    assert(ManagedTable.read(spark, dir).count() == 7)
    sql("TRUNCATE TABLE gcat.del.t")
    assert(sql("SELECT * FROM gcat.del.t").collect().isEmpty)
    sql("DROP TABLE gcat.del.t"); sql("DROP NAMESPACE gcat.del")
  }

  test("INSERT INTO ... REPLACE WHERE swaps exactly the matching slice") {
    sql("CREATE NAMESPACE gcat.rw")
    sql("CREATE TABLE gcat.rw.t AS " +
      "SELECT id AS k, id * 2 AS v FROM range(30)")
    val dir = s"$warehouse/rw/t"
    // replace the k<10 slice with 5 corrected rows (all satisfy k<10)
    sql("INSERT INTO gcat.rw.t REPLACE WHERE k < 10 " +
      "SELECT id AS k, id * 100 AS v FROM range(5)")
    assert(sql("SELECT count(*) AS n FROM gcat.rw.t")
      .collect().head.getLong(0) == 25L) // 30 - 10 + 5
    assert(sql("SELECT sum(v) AS s FROM gcat.rw.t WHERE k < 10")
      .collect().head.getLong(0) == 1000L) // 0+100+...+400
    assert(sql("SELECT sum(v) AS s FROM gcat.rw.t WHERE k >= 10")
      .collect().head.getLong(0) == (10 until 30).map(_ * 2).sum)
    // one version: create + CTAS + the replace commit
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3))
    // the replaceWhere constraint: a row OUTSIDE the predicate refuses
    intercept[Exception](
      sql("INSERT INTO gcat.rw.t REPLACE WHERE k < 10 " +
        "SELECT 50L AS k, 0L AS v"))
    assert(ManagedTable.read(spark, dir).count() == 25)
    sql("DROP TABLE gcat.rw.t"); sql("DROP NAMESPACE gcat.rw")
  }

  test("streaming reads work by catalog name: readStream.table drains versions") {
    import org.apache.spark.sql.streaming.Trigger
    sql("CREATE NAMESPACE gcat.st")
    val dir = s"$warehouse/st/t"
    (0 until 3).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(i * 10, (i + 1) * 10).select(col("id").as("k"))
          .coalesce(1), dir)
    }
    val ckpt = Files.createTempDirectory("graft-cat-st").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("maxVersionsPerTrigger", 1)
      .table("gcat.st.t")
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.getLong(0)) }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.sorted == (0L until 30L),
      "three appended versions must drain as version-offset batches")
    sql("DROP TABLE gcat.st.t"); sql("DROP NAMESPACE gcat.st")
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema as one " +
      "metadata-only commit; old segments null-fill") {
    sql("CREATE NAMESPACE gcat.ev")
    sql("CREATE TABLE gcat.ev.t (k BIGINT, s STRING)")
    sql("INSERT INTO gcat.ev.t VALUES (1, 'a'), (2, 'b')")
    val dir = s"$warehouse/ev/t"
    val filesBefore = ManagedTable.read(spark, dir).inputFiles.toSet
    sql("ALTER TABLE gcat.ev.t ADD COLUMNS (w BIGINT, note STRING)")
    // metadata-only: same data files, one new version, widened schema
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3))
    assert(ManagedTable.read(spark, dir).inputFiles.toSet == filesBefore,
      "evolution must not touch a single data byte")
    // pre-evolution rows read back null-filled — by SQL name
    assert(sortedRows(sql("SELECT k, s, w, note FROM gcat.ev.t")) ==
      Seq(Row(1L, "a", null, null), Row(2L, "b", null, null)))
    // post-evolution INSERT provides the full schema
    sql("INSERT INTO gcat.ev.t VALUES (3, 'c', 30, 'n3')")
    assert(sortedRows(sql(
      "SELECT k, w FROM gcat.ev.t WHERE w IS NOT NULL")) ==
      Seq(Row(3L, 30L)))
    assert(sql("SELECT count(*) AS n FROM gcat.ev.t")
      .head().getLong(0) == 3L)
    // time travel below the evolution sees the NARROW schema
    assert(sql("SELECT * FROM gcat.ev.t VERSION AS OF 2")
      .schema.fieldNames.toSeq == Seq("k", "s"))
    // guarded shapes: duplicate column and retype stay rejected
    // (RENAME/DROP are now metadata-only features — ColumnMappingSpec)
    intercept[Exception] {
      sql("ALTER TABLE gcat.ev.t ADD COLUMNS (k BIGINT)") }
    intercept[Exception] {
      sql("ALTER TABLE gcat.ev.t ALTER COLUMN w TYPE STRING") }
    // nothing above may have landed a version
    assert(ManagedTable.versions(spark, dir) == Seq(1, 2, 3, 4))
    sql("DROP TABLE gcat.ev.t"); sql("DROP NAMESPACE gcat.ev")
  }

  test("writeStream.toTable lands tagged exactly-once epochs by " +
      "catalog name; resume re-emits nothing") {
    import org.apache.spark.sql.streaming.Trigger
    sql("CREATE NAMESPACE gcat.stw")
    val srcDir = s"$warehouse/stw/src"
    (0 until 3).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(i * 10, (i + 1) * 10).select(col("id").as("k"))
          .coalesce(1), srcDir)
    }
    sql("CREATE TABLE gcat.stw.tgt (k BIGINT)")
    val ckpt = Files.createTempDirectory("graft-cat-stw").toString
    def run(): Unit = {
      val q = spark.readStream.option("maxVersionsPerTrigger", 1)
        .table("gcat.stw.src")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gcat.stw.tgt")
      q.awaitTermination()
    }
    run()
    assert(sql("SELECT k FROM gcat.stw.tgt").collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 30L))
    val tgtDir = s"$warehouse/stw/tgt"
    val afterFirst = ManagedTable.versions(spark, tgtDir).size
    // idle re-run: the checkpoint says everything is consumed —
    // nothing lands, no empty versions pile up
    run()
    assert(ManagedTable.versions(spark, tgtDir).size == afterFirst,
      "an idle resume must commit nothing")
    // new source data: exactly the delta arrives, once
    ManagedTable.appendCommit(
      spark.range(30, 40).select(col("id").as("k")).coalesce(1), srcDir)
    run()
    assert(sql("SELECT k FROM gcat.stw.tgt").collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 40L))
    // epochs committed under their b<epochId> idempotence tags — the
    // same two-ledger discipline as the path-based streaming sink
    val tags = ManagedTable.tags(spark, tgtDir).map(_._2)
    assert(tags.count(_.startsWith("b")) >= 2, s"tags: $tags")
    sql("DROP TABLE gcat.stw.tgt"); sql("DROP TABLE gcat.stw.src")
    sql("DROP NAMESPACE gcat.stw")
  }

  test("CALL maintenance procedures: history, restore, compact, " +
      "vacuum_history — table lifecycle by pure SQL") {
    sql("CREATE NAMESPACE gcat.mt")
    sql("CREATE TABLE gcat.mt.t (k BIGINT, v BIGINT)")
    sql("INSERT INTO gcat.mt.t SELECT id, id * 2 FROM range(100)")
    sql("INSERT INTO gcat.mt.t SELECT id, id * 2 FROM range(100, 200)")
    val dir = s"$warehouse/mt/t"

    // history: one row per version, straight off the manifest log
    val hist = sql("CALL gcat.system.history(`table` => 'mt.t')")
    assert(hist.select("version").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2, 3))
    assert(hist.schema.fieldNames.contains("n_data_files"))

    // restore: metadata-only re-publish of v2's state as v4
    assert(sql("CALL gcat.system.restore(`table` => 'mt.t', " +
      "version => 2)").head().getInt(0) == 4)
    assert(sql("SELECT count(*) AS n FROM gcat.mt.t")
      .head().getLong(0) == 100L)
    sql("INSERT INTO gcat.mt.t SELECT id, id * 2 FROM range(100, 200)")

    // compact: bins the small insert segments into one
    val v = sql("CALL gcat.system.compact(`table` => 'mt.t')")
      .head().getInt(0)
    assert(v == 6)
    assert(sql("SELECT count(*) AS n FROM gcat.mt.t")
      .head().getLong(0) == 200L)

    // vacuum_history: keep 2, sweep the stranded segments (positional
    // argument syntax also works)
    val st = sql(
      "CALL gcat.system.vacuum_history('mt.t', 2, 0)").head()
    assert(st.getInt(0) == 4, "dropped versions") // v1..v4 dropped
    assert(st.getInt(1) >= 1, "swept segments")
    assert(st.getLong(2) > 0L, "reclaimed bytes")
    assert(ManagedTable.versions(spark, dir) == Seq(5, 6))
    assert(sql("SELECT count(*) AS n FROM gcat.mt.t")
      .head().getLong(0) == 200L)

    // plain vacuum is callable too (nothing left to sweep)
    assert(sql("CALL gcat.system.vacuum(`table` => 'mt.t', " +
      "retention_ms => 0)").head().getInt(0) == 0)

    // clustered compaction (OPTIMIZE ZORDER BY) through CALL: new
    // small segments land, then pack ordered by k
    sql("INSERT INTO gcat.mt.t SELECT id, id * 2 FROM range(200, 300)")
    assert(sql("CALL gcat.system.compact(`table` => 'mt.t', " +
      "cluster_by => 'k')").head().getInt(0) == 8)
    assert(sql("SELECT count(*) AS n FROM gcat.mt.t")
      .head().getLong(0) == 300L)

    // guard rails: unknown procedure, missing table
    intercept[Exception](sql("CALL gcat.system.nope('mt.t')"))
    intercept[Exception](
      sql("CALL gcat.system.compact(`table` => 'mt.gone')").collect())
    sql("DROP TABLE gcat.mt.t"); sql("DROP NAMESPACE gcat.mt")
  }

  test("CALL system.changes and system.detail: CDF diff and DESCRIBE " +
      "DETAIL parity by pure SQL") {
    sql("CREATE NAMESPACE gcat.cd")
    sql("CREATE TABLE gcat.cd.t (k BIGINT, v BIGINT)")           // v1
    sql("INSERT INTO gcat.cd.t SELECT id, id * 2 FROM range(100)") // v2
    sql("UPDATE gcat.cd.t SET v = v + 1 WHERE k < 10")           // v3
    sql("DELETE FROM gcat.cd.t WHERE k >= 90")                   // v4

    // changes: a table-shaped result (_change_type + the table's own
    // columns), exactly the update image pairs and the DV deletes
    val ch = sql("CALL gcat.system.changes(`table` => 'cd.t', " +
      "from_version => 2, to_version => 4, keys => 'k')")
    assert(ch.schema.fieldNames.toSeq ==
      Seq("_change_type", "k", "v"))
    val byType = ch.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq).toMap
    assert(byType("update_preimage") ==
      (0L until 10L).map(k => (k, k * 2)))
    assert(byType("update_postimage") ==
      (0L until 10L).map(k => (k, k * 2 + 1)))
    assert(byType("delete") == (90L until 100L).map(k => (k, k * 2)))
    assert(byType.keySet == Set("update_preimage", "update_postimage",
      "delete"), "no spurious inserts from carried files")

    // detail: one metadata-only row off the manifest
    val det = sql("CALL gcat.system.detail(`table` => 'cd.t')").head()
    assert(det.getAs[Int]("version") == 4)
    assert(det.getAs[Int]("num_versions") == 4)
    assert(det.getAs[Int]("num_data_files") > 0)
    assert(det.getAs[Int]("num_dv_files") > 0, "DELETE left a DV")
    assert(det.getAs[Long]("size_bytes") > 0L)
    // live rows are unprovable under DVs without a scan — null, never
    // a wrong number
    assert(det.isNullAt(det.fieldIndex("live_rows")))
    assert(det.getAs[String]("location").nonEmpty)

    // compact away the DVs: live_rows becomes provable from counts
    sql("CALL gcat.system.compact(`table` => 'cd.t', " +
      "small_file_bytes => 1073741824)")
    val det2 = sql("CALL gcat.system.detail(`table` => 'cd.t')").head()
    assert(det2.getAs[Int]("num_dv_files") == 0)
    assert(!det2.isNullAt(det2.fieldIndex("live_rows")) &&
      det2.getAs[Long]("live_rows") == 90L)
    sql("DROP TABLE gcat.cd.t"); sql("DROP NAMESPACE gcat.cd")
  }

  test("system.changes max_rows guard; system.detail digest staleness; " +
      "compact rewrite_dv_fraction purge — by pure SQL") {
    sql("CREATE NAMESPACE gcat.st")
    sql("CREATE TABLE gcat.st.t (k BIGINT, v BIGINT)")               // v1
    sql("ALTER TABLE gcat.st.t SET TBLPROPERTIES (" +
      s"'${BloomSkipping.ColumnsProp}' = 'k')")                      // v2
    sql("INSERT INTO gcat.st.t SELECT id, id * 2 FROM range(1000)")  // v3

    // the CALL materializes its diff on the driver — an over-cap diff
    // must FAIL FAST naming the distributed remedy, never OOM
    val e = intercept[Exception](
      sql("CALL gcat.system.changes(`table` => 'st.t', " +
        "from_version => 2, to_version => 3, keys => 'k', " +
        "max_rows => 100)").collect())
    assert(e.getMessage.contains("max_rows") &&
      e.getMessage.contains("ManagedTable.changes"))
    // under the cap the same diff returns in full
    assert(sql("CALL gcat.system.changes(`table` => 'st.t', " +
      "from_version => 2, to_version => 3, keys => 'k', " +
      "max_rows => 2000)").count() == 1000L)

    // pre-delete: the insert's files are digested, nothing stale
    val d0 = sql("CALL gcat.system.detail(`table` => 'st.t')").head()
    assert(d0.getAs[Int]("num_digested_files") > 0)
    assert(d0.getAs[Int]("num_stale_digests") == 0)
    assert(d0.isNullAt(d0.fieldIndex("max_digest_staleness")))

    // DV delete of 40%: digests now carry dead values — detail says
    // so (max staleness ≥ the overall deleted fraction by pigeonhole,
    // whatever the file layout)
    sql("DELETE FROM gcat.st.t WHERE k < 400")                       // v4
    val d1 = sql("CALL gcat.system.detail(`table` => 'st.t')").head()
    assert(d1.getAs[Int]("num_dv_files") > 0)
    assert(d1.getAs[Int]("num_stale_digests") > 0)
    val frac = d1.getAs[Double]("max_digest_staleness")
    assert(frac >= 0.4 && frac <= 1.0, s"≥ 0.4 expected, got $frac")

    // the remedy detail points at: compaction's DV-fraction purge —
    // size trigger off (small_file_bytes => 1), fraction selects the
    // tombstoned file(s), deletes materialize, digests rebuild
    sql("CALL gcat.system.compact(`table` => 'st.t', " +
      "small_file_bytes => 1, rewrite_dv_fraction => 0.05)")         // v5
    val d2 = sql("CALL gcat.system.detail(`table` => 'st.t')").head()
    assert(d2.getAs[Int]("num_dv_files") == 0, "DV purged")
    assert(d2.getAs[Int]("num_stale_digests") == 0)
    assert(d2.isNullAt(d2.fieldIndex("max_digest_staleness")))
    assert(d2.getAs[Long]("live_rows") == 600L)
    assert(sql("SELECT count(*) AS n FROM gcat.st.t")
      .head().getLong(0) == 600L)
    sql("DROP TABLE gcat.st.t"); sql("DROP NAMESPACE gcat.st")
  }

  test("a catalog table is the SAME table the path API maintains: merge then SQL read") {
    sql("CREATE NAMESPACE gcat.mx")
    sql("CREATE TABLE gcat.mx.kv (k BIGINT, s STRING, seq BIGINT, op STRING)")
    sql("INSERT INTO gcat.mx.kv VALUES (1, 'a', 1, 'u'), (2, 'b', 1, 'u')")
    val dir = s"$warehouse/mx/kv"
    ManagedTable.merge(
      Seq((1L, "a2", 2L, "u"), (2L, "b", 2L, "d"))
        .toDF("k", "s", "seq", "op"),
      dir, keys = Seq("k"), sequenceBy = Seq(col("seq")))
    assert(sortedRows(sql(
      "SELECT k, s FROM gcat.mx.kv WHERE op <> 'd'")) ==
      Seq(Row(1L, "a2")))
    sql("DROP TABLE gcat.mx.kv"); sql("DROP NAMESPACE gcat.mx")
  }
}
