package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Metadata-only TYPE WIDENING ([[ManagedTable.widenColumn]] /
  * `ALTER COLUMN … TYPE`): the manifest records the wider type, every
  * reader upcasts narrower committed segments at decode time (Spark's
  * parquet promotion on the path API; file-footer-keyed upcast in the
  * connector's row reader; a zero-copy widening vector in the
  * columnar reader), stats keep pruning, and anything lossy refuses.
  */
class WideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-w-$name").toString + "/t"

  private def narrow(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id").cast("int").as("k"),
      (col("id") * 2).cast("float").as("f"),
      concat(lit("s"), col("id")).as("s")).coalesce(1)

  test("widenColumn is METADATA-ONLY: same files, mixed-generation " +
      "reads upcast, post-widen writes land wide, stats keep pruning") {
    val dir = tmp("base")
    ManagedTable.commit(narrow(0, 10), dir)
    ManagedTable.appendCommit(narrow(10, 20), dir)
    val (_, filesBefore, _, _) = ManagedTable.readManifest(spark, dir, 2)
    ManagedTable.widenColumn(spark, dir, "k", LongType)
    ManagedTable.widenColumn(spark, dir, "f", DoubleType)
    val (_, filesAfter, _, _) = ManagedTable.readManifest(spark, dir, 4)
    assert(filesAfter == filesBefore, "widening must move ZERO bytes")
    val t = ManagedTable.read(spark, dir)
    assert(t.schema("k").dataType == LongType &&
      t.schema("f").dataType == DoubleType)
    assert(t.agg(sum("k")).head.getLong(0) == (0 until 20).sum)
    // post-widen appends carry the wide type; both generations mix
    ManagedTable.appendCommit(
      spark.range(20, 25).select(col("id").as("k"),
        (col("id") * 2.0).as("f"),
        concat(lit("s"), col("id")).as("s")).coalesce(1), dir)
    val mixed = ManagedTable.read(spark, dir)
    assert(mixed.count() == 25 &&
      mixed.agg(sum("f")).head.getDouble(0) == (0 until 25).map(_ * 2.0).sum)
    // stats written under INT parse identically under BIGINT
    val (kept, all) = ManagedTable.planFiles(spark, dir, "k", 3, 3)
    assert(kept.size < all.size, s"widened stats must prune: $kept / $all")
    // time travel below the widening sees the narrow type
    assert(ManagedTable.read(spark, dir, Some(2))
      .schema("k").dataType == IntegerType)
  }

  test("lossy or cross-family retypes refuse") {
    val dir = tmp("refuse")
    ManagedTable.commit(narrow(0, 5), dir)
    Seq[(String, DataType)](
      ("k", IntegerType),   // identity-or-narrower
      ("k", StringType),    // cross-family
      ("k", DoubleType),    // integral → fp (not order/loss-safe)
      ("f", FloatType),     // identity
      ("s", BinaryType)     // string → binary
    ).foreach { case (c, to) =>
      val e = intercept[IllegalArgumentException] {
        ManagedTable.widenColumn(spark, dir, c, to)
      }
      assert(e.getMessage.contains("not a supported widening"), s"$c→$to")
    }
  }

  test("the connector upcasts through BOTH decode paths: the " +
      "columnar widening vector (DV-free) and the row reader (DV'd)") {
    val dir = tmp("conn")
    ManagedTable.commit(narrow(0, 100), dir)
    ManagedTable.widenColumn(spark, dir, "k", LongType)
    ManagedTable.widenColumn(spark, dir, "f", DoubleType)
    // columnar path: DV-free version decodes vectorized through the
    // widening view
    val t = spark.read.format("graft").load(dir)
    assert(t.schema("k").dataType == LongType)
    assert(t.orderBy("k").select("k").as[Long].collect().toSeq
      == (0L until 100L))
    assert(t.agg(sum("f")).head.getDouble(0)
      == (0 until 100).map(_ * 2.0).sum)
    assert(t.filter(col("k") === 42).select("s").head.getString(0)
      == "s42")
    // agg pushdown endpoints parse under the wide type
    val a = t.agg(min("k").as("lo"), max("k").as("hi")).head
    assert(a.getLong(0) == 0L && a.getLong(1) == 99L)
    // row path: a DV demotes decode to the row reader, which upcasts
    // by file footer
    ManagedTable.deleteWhere(spark, dir, col("k") < 10)
    val dv = spark.read.format("graft").load(dir)
    assert(dv.orderBy("k").select("k").as[Long].collect().toSeq
      == (10L until 100L))
    assert(dv.agg(sum("f")).head.getDouble(0)
      == (10 until 100).map(_ * 2.0).sum)
  }

  test("SQL ALTER COLUMN TYPE through the catalog; CDC across the " +
      "widening aligns both sides to the wide type") {
    val wh = Files.createTempDirectory("graft-w-cat").toString
    val cat = s"gw${Integer.toHexString(wh.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (k INT, s STRING) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN k TYPE BIGINT")
    assert(spark.table(s"$cat.ns.t").schema("k").dataType == LongType)
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (${Int.MaxValue.toLong + 7}, 'c')")
    assert(spark.sql(s"SELECT sum(k) FROM $cat.ns.t").head.getLong(0)
      == 3L + Int.MaxValue.toLong + 7)
    // narrowing refuses — Spark's analyzer catches it before the
    // catalog; the catalog's own gate covers the path API (see above)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("not a supported widening") ||
      e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    // CDC across the widen+insert versions: pre-widen rows align wide
    val dir = s"$wh/ns/t"
    val diff = ManagedTable.changes(spark, dir, 1, 4, keys = Seq("k"))
    assert(diff.schema("k").dataType == LongType)
    assert(diff.filter(col("_change_type") === "insert").count() == 3)
  }
}
