package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.SparkSpec

/** The change-feed delete path's physical cost contract:
  *
  *   - [[GraftDvReader]] resolves ONE file's tombstoned positions
  *     executor-side from the DV sidecar (pushed `__file` predicate),
  *     so bulk-delete positions never ride through the driver;
  *   - [[GraftPositionalReader]] skips row groups holding no wanted
  *     position wholesale and stops after the last one — a sparse
  *     late-file delete reads a bounded prefix, not the whole file;
  *   - the executor-side cumulativity check still fails the stream
  *     when a version REMOVES tombstones without a file swap.
  */
class PositionalReaderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  /** One parquet file of (k, s) rows 0..n-1 written with tiny row
    * groups; returns (absolute file path, per-group row counts).
    */
  private def multiGroupFile(n: Int): (String, Seq[Long]) = {
    val dir = Files.createTempDirectory("graft-posread").toString
    spark.range(n).select(col("id").as("k"),
        concat(lit("row-"), col("id")).as("s"))
      .coalesce(1)
      .write.option("parquet.block.size", "4096")
      .mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f),
        new org.apache.hadoop.conf.Configuration()))
    val counts =
      try {
        import scala.jdk.CollectionConverters._
        fr.getFooter.getBlocks.asScala.map(_.getRowCount).toSeq
      } finally fr.close()
    (f, counts)
  }

  private def readAll(r: GraftPositionalReader): Seq[(Long, String)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    while (r.next()) {
      val row = r.get()
      buf += ((row.getLong(0), row.getString(1)))
    }
    buf.toSeq
  }

  test("positional reader emits exactly the listed positions with " +
      "correct values") {
    val (f, groups) = multiGroupFile(20000)
    assert(groups.size >= 3, s"need multiple row groups, got $groups")
    val emit = Array(0L, 7L, 9999L, 19999L)
    val r = new GraftPositionalReader(f, schema, emit)
    try assert(readAll(r) ===
      emit.toSeq.map(i => (i, s"row-$i")))
    finally r.close()
  }

  test("row groups without a wanted position are never fetched, and " +
      "reading stops after the last position") {
    val (f, groups) = multiGroupFile(20000)
    assert(groups.size >= 4, s"need >=4 row groups, got $groups")
    // positions only inside the SECOND row group
    val g1Start = groups.head
    val emit = Array(g1Start + 1, g1Start + 5)
    val r = new GraftPositionalReader(f, schema, emit)
    try {
      assert(readAll(r) === emit.toSeq.map(i => (i, s"row-$i")))
      assert(r.groupsRead == 1,
        s"expected exactly 1 row group fetched, got ${r.groupsRead}")
      // sequential walk within the group stops at its last target:
      // group positions 0..5 are assembled (0,2,3,4 discarded; 1 and
      // 5 emitted), nothing past position 5 is read
      assert(r.rowsDecoded == 6,
        s"expected 6 rows decoded, got ${r.rowsDecoded}")
    } finally r.close()
  }

  test("a late-position sparse delete reads a bounded prefix of ONE " +
      "group, not the file") {
    val (f, groups) = multiGroupFile(20000)
    val total = groups.sum
    // one tombstone near the END of the file: the old sequential
    // emit-only reader walked every prior row; the positional reader
    // reads only the last group's prefix
    val emit = Array(total - 2)
    val r = new GraftPositionalReader(f, schema, emit)
    try {
      assert(readAll(r) === Seq((total - 2, s"row-${total - 2}")))
      assert(r.groupsRead == 1)
      assert(r.rowsDecoded <= groups.last,
        s"decoded ${r.rowsDecoded} rows — more than the last group")
      assert(r.rowsDecoded < total / 2,
        "positional read degenerated to a near-full-file walk")
    } finally r.close()
  }

  test("GraftDvReader resolves one file's sorted positions from " +
      "multi-file DV sidecars via the pushed __file predicate") {
    val dir = Files.createTempDirectory("graft-dvread").toString
    Seq(("data/a/f1.parquet", 7L), ("data/a/f1.parquet", 3L),
        ("data/b/f2.parquet", 1L))
      .toDF("__file", "__pos").coalesce(1)
      .write.parquet(s"$dir/dv1")
    Seq(("data/a/f1.parquet", 11L), ("data/c/f3.parquet", 2L))
      .toDF("__file", "__pos").coalesce(1)
      .write.parquet(s"$dir/dv2")
    def dvParts(sub: String): Array[String] =
      new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
    val refs = dvParts("dv1") ++ dvParts("dv2")
    assert(GraftDvReader.positions(refs, "data/a/f1.parquet").toSeq ===
      Seq(3L, 7L, 11L))
    assert(GraftDvReader.positions(refs, "data/b/f2.parquet").toSeq ===
      Seq(1L))
    assert(GraftDvReader.positions(refs, "data/zzz.parquet").isEmpty)
    assert(GraftDvReader.positions(null, "x").isEmpty)
  }

  test("executor-side cumulativity check: a delete partition whose " +
      "old DV holds a position missing from the new DV fails the read") {
    val dir = Files.createTempDirectory("graft-dvviol").toString
    Seq(("data/a/f1.parquet", 3L)).toDF("__file", "__pos").coalesce(1)
      .write.parquet(s"$dir/old")
    Seq(("data/a/f1.parquet", 9L)).toDF("__file", "__pos").coalesce(1)
      .write.parquet(s"$dir/new") // 3 LEFT the DV — not representable
    def refs(sub: String): Array[String] =
      new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
    val (dataFile, _) = multiGroupFile(100)
    val p = GraftInputPartition(dataFile,
      relPath = "data/a/f1.parquet", dvRefs = refs("new"),
      changeType = "delete", commitVersion = 2, commitMs = 0L,
      oldDvRefs = refs("old"))
    val factory = new GraftCdfReaderFactory(schema.json)
    val ex = intercept[IllegalArgumentException] {
      factory.createReader(p)
    }
    assert(ex.getMessage.contains("REMOVES deletion-vector tombstones"))
  }

  test("change feed end-to-end over a LARGE delete: positions resolve " +
      "executor-side and the feed matches the batch diff") {
    import org.apache.spark.sql.streaming.Trigger
    // force the REFS tier (inline cap 0) so this drives the
    // executor-side resolution path a real bulk delete would take
    spark.conf.set(GraftDvReader.InlineMaxRowsConf, "0")
    try bulkFeedBody()
    finally spark.conf.unset(GraftDvReader.InlineMaxRowsConf)
  }

  test("change feed end-to-end over the same delete on the INLINE " +
      "tier (default cap) is identical") {
    bulkFeedBody()
  }

  private def bulkFeedBody(): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-cdfbulk").toString + "/t"
    val n = 5000L
    ManagedTable.appendCommit(
      spark.range(n).select(col("id").as("k"),
        (col("id") * 2).as("v")), dir)                        // v1
    ManagedTable.deleteWhere(spark, dir, col("k") % 5 =!= 0L) // v2: 80%
    val buf = scala.collection.mutable
      .ArrayBuffer.empty[(String, Long, Long)]
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= b.collect().map(r => (
            r.getAs[String]("_change_type"),
            r.getAs[Long]("_commit_version"),
            r.getAs[Long]("k"))) }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdfbulk-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = buf.synchronized { buf.toVector }
    assert(got.count(_._1 == "insert") == n)
    val deleted = got.filter(_._1 == "delete")
    assert(deleted.size == (0L until n).count(_ % 5 != 0))
    assert(deleted.forall(t => t._2 == 2L && t._3 % 5 != 0))
  }
}
