package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The connector's optimizer tier: manifest-only aggregates
  * ([[SupportsPushDownAggregates]]) and join-driven runtime file
  * pruning ([[SupportsRuntimeV2Filtering]]).
  */
class GraftPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-push-$name").toString + "/t"

  /** Three single-file segments with disjoint k ranges. */
  private def threeSegments(dir: String): Unit =
    (0 until 3).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(i * 100, (i + 1) * 100).select(
          col("id").as("k"),
          concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"),
          when(col("id") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("id") * 2).as("m")).coalesce(1),
        dir)
    }

  private def planString(df: DataFrame): String = {
    df.collect() // finalize any adaptive plan before reading it
    df.queryExecution.executedPlan.toString
  }

  test("global count/min/max answer from the manifest: GraftAggScan, zero files read") {
    val dir = tmp("agg")
    threeSegments(dir)
    val t = spark.read.format("graft").load(dir)
    val q = t.agg(count(lit(1)).as("n"), min("k").as("mn"),
      max("k").as("mx"), min("s").as("smn"), max("s").as("smx"),
      min("m").as("mmn"), max("m").as("mmx"))
    assert(q.collect().toSeq ==
      Seq(Row(300L, 0L, 299L, "s0000", "s0299", 2L, 598L)))
    val plan = planString(q)
    assert(plan.contains("GraftAggScan"), s"expected GraftAggScan in:\n$plan")
    assert(plan.contains("filesRead=0"))
    // complete pushdown: no aggregate node survives in the plan
    assert(!plan.contains("HashAggregate"),
      s"aggregate should be fully pushed:\n$plan")
  }

  test("count over an all-null stats column still pushes; min/max of it is null") {
    val dir = tmp("allnull")
    ManagedTable.commit(
      spark.range(10).select(col("id").as("k"),
        lit(null).cast("long").as("gone")).coalesce(1), dir)
    val t = spark.read.format("graft").load(dir)
    val q = t.agg(count(lit(1)).as("n"), min("gone").as("mn"),
      max("gone").as("mx"))
    assert(q.collect().toSeq == Seq(Row(10L, null, null)))
    assert(planString(q).contains("GraftAggScan"))
  }

  test("filters, group-by, DVs and count(DISTINCT) all fall back to the real scan") {
    val dir = tmp("fallback")
    threeSegments(dir)
    val t = spark.read.format("graft").load(dir)

    val filtered = t.filter(col("k") >= 100).agg(count(lit(1)).as("n"))
    assert(filtered.collect().toSeq == Seq(Row(200L)))
    assert(!planString(filtered).contains("GraftAggScan"))

    val grouped = t.groupBy(col("k") % 2).agg(count(lit(1)).as("n"))
    assert(grouped.collect().map(_.getLong(1)).sum == 300L)
    assert(!planString(grouped).contains("GraftAggScan"))

    // count(col) skips nulls — answered from the per-file non-null
    // counts the stats pass records next to min/max
    val countCol = t.agg(count(col("m")).as("n"))
    assert(countCol.collect().toSeq == Seq(Row(257L)))
    assert(planString(countCol).contains("GraftAggScan"))

    val distinctCol = t.agg(countDistinct(col("m")).as("n"))
    assert(distinctCol.collect().toSeq == Seq(Row(257L)))
    assert(!planString(distinctCol).contains("GraftAggScan"),
      "COUNT(DISTINCT) is not derivable from per-file counts")

    ManagedTable.deleteWhere(spark, dir, col("k") === 299)
    val t2 = spark.read.format("graft").load(dir)
    val dv = t2.agg(count(lit(1)).as("n"), max("k").as("mx"))
    assert(dv.collect().toSeq == Seq(Row(299L, 298L)),
      "a DV'd row must vanish from count AND max")
    assert(!planString(dv).contains("GraftAggScan"),
      "stats are stale under DVs — must not push")
  }

  test("LIMIT plans a live-row-sufficient file prefix, not every file") {
    val dir = tmp("limit")
    threeSegments(dir) // 3 files × 100 rows, manifest order 1,2,3
    val t = spark.read.format("graft").load(dir)
    val q = t.limit(120)
    assert(q.count() == 120)
    val plan = planString(q)
    assert(plan.contains("pushedLimit=120"), s"limit not pushed:\n$plan")
    assert(plan.contains("files=2/3"),
      s"expected 2-file prefix (100+100 >= 120):\n$plan")
    // limit past the table keeps every file and returns what exists
    val all = t.limit(5000)
    assert(all.count() == 300)
    assert(planString(all).contains("files=3/3"))
    // a filter between limit and scan blocks the pushdown (all graft
    // filters stay post-scan, so correctness never depends on this)
    val filtered = t.filter(col("k") >= 250).limit(10)
    assert(filtered.count() == 10)
    assert(!planString(filtered).contains("pushedLimit"))
  }

  test("ORDER BY k LIMIT n plans only the files that can hold a top-n row") {
    val dir = tmp("topn")
    threeSegments(dir) // disjoint k ranges [0,99] [100,199] [200,299]
    val t = spark.read.format("graft").load(dir)

    // DESC: top-10 can only live in the [200,299] file
    val hi = t.orderBy(col("k").desc).limit(10)
    assert(hi.collect().map(_.getLong(0)).toSeq == (290L to 299L).reverse)
    val hiPlan = planString(hi)
    assert(hiPlan.contains("pushedTopN=k:desc:10"), s"not pushed:\n$hiPlan")
    assert(hiPlan.contains("files=1/3"), s"expected 1 file:\n$hiPlan")

    // ASC (NULLS FIRST default): k has no nulls recorded, so the
    // null-free proof allows the same single-file plan
    val lo = t.orderBy(col("k")).limit(10)
    assert(lo.collect().map(_.getLong(0)).toSeq == (0L to 9L).toSeq)
    assert(planString(lo).contains("files=1/3"))

    // top-n spanning a boundary keeps exactly the two needed files
    val span = t.orderBy(col("k").desc).limit(150)
    assert(span.collect().map(_.getLong(0)).min == 150L)
    assert(planString(span).contains("files=2/3"))

    // n past the table keeps everything
    assert(planString(t.orderBy(col("k")).limit(500))
      .contains("files=3/3"))
  }

  test("top-n null handling: NULLS FIRST force-keeps possibly-null files") {
    val dir = tmp("topnnull")
    threeSegments(dir) // m is null where k % 7 == 0, in EVERY file
    val t = spark.read.format("graft").load(dir)

    // ASC NULLS FIRST on m: every file may hold a null — no pruning
    val first = t.orderBy(col("m").asc_nulls_first).limit(5)
    assert(first.collect().forall(_.isNullAt(2)))
    assert(planString(first).contains("files=3/3"),
      "a possibly-null file must never be discarded under NULLS FIRST")

    // ASC NULLS LAST: nulls rank behind, so the [0,99] file's 85
    // non-nulls cover n=5 and the rest prune
    val last = t.orderBy(col("m").asc_nulls_last).limit(5)
    assert(last.collect().map(_.getLong(2)).toSeq ==
      Seq(2L, 4L, 6L, 8L, 10L)) // k=1..5 minus the k=0 null, doubled
    assert(planString(last).contains("files=1/3"))
  }

  test("top-n is DV-conservative: tombstones can't fake coverage") {
    val dir = tmp("topndv")
    threeSegments(dir)
    // kill 95 of the top file's 100 rows: its provable live non-nulls
    // (100-95=5) no longer cover n=10, so the next file stays planned
    ManagedTable.deleteWhere(spark, dir, col("k") >= 205)
    val t = spark.read.format("graft").load(dir)
    val q = t.orderBy(col("k").desc).limit(10)
    assert(q.collect().map(_.getLong(0)).toSeq ==
      ((200L to 204L).reverse ++ (195L to 199L).reverse))
    assert(planString(q).contains("files=2/3"))
  }

  test("LIMIT truncation counts LIVE rows: DV'd positions don't satisfy it") {
    val dir = tmp("limitdv")
    threeSegments(dir)
    // kill 90 of the first file's 100 rows — a prefix of 1 file has
    // only 10 live rows, so LIMIT 60 must plan 2 files
    ManagedTable.deleteWhere(spark, dir, col("k") < 90)
    val t = spark.read.format("graft").load(dir)
    val q = t.limit(60)
    assert(q.count() == 60)
    val plan = planString(q)
    assert(plan.contains("pushedLimit=60"))
    assert(plan.contains("files=2/3"),
      s"10 live + 100 live covers 60 only with 2 files:\n$plan")
  }

  test("aggregate pushdown across append, overwrite and time travel") {
    val dir = tmp("life")
    ManagedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    ManagedTable.appendCommit(Seq((10L, "c")).toDF("k", "s"), dir)
    val q = spark.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"), max("k").as("mx"))
    assert(q.collect().toSeq == Seq(Row(3L, 10L)))
    assert(planString(q).contains("GraftAggScan"))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(dir)
      .agg(count(lit(1)).as("n"), max("k").as("mx"))
    assert(v1.collect().toSeq == Seq(Row(2L, 2L)))
    assert(planString(v1).contains("GraftAggScan"))
  }

  test("runtime IN/= predicates prune files by stats, conservatively") {
    val dir = tmp("runtime")
    threeSegments(dir)
    val meta = GraftTableMeta.resolve(dir, None)
    def freshScan(): GraftScan =
      new GraftScanBuilder(meta).build().asInstanceOf[GraftScan]

    val scan = freshScan()
    assert(scan.filterAttributes().map(_.toString).toSet ==
      Set("k", "s", "m"))
    assert(scan.planInputPartitions().length == 3)

    // IN over k values all in the middle segment
    val in = new Predicate("IN", Array(
      Expressions.column("k"),
      Expressions.literal(150L), Expressions.literal(199L)))
    scan.filter(Array(in))
    assert(scan.planInputPartitions().length == 1)

    // equality on a value NO segment contains
    val s2 = freshScan()
    s2.filter(Array(new Predicate("=", Array(
      Expressions.column("k"), Expressions.literal(1000L)))))
    assert(s2.planInputPartitions().length == 0)

    // untranslatable predicate: prunes nothing
    val s3 = freshScan()
    s3.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(s3.planInputPartitions().length == 3)

    // string column uses UTF8 order
    val s4 = freshScan()
    s4.filter(Array(new Predicate("=", Array(
      Expressions.column("s"),
      Expressions.literal(org.apache.spark.unsafe.types.UTF8String
        .fromString("s0250"))))))
    assert(s4.planInputPartitions().length == 1)
  }

  test("planning-time IN and OR filters prune files like the " +
      "equality probes they union") {
    val dir = tmp("inor")
    threeSegments(dir) // disjoint k ranges [0,99] [100,199] [200,299]
    val t = spark.read.format("graft").load(dir)

    // selective IN: both values live in the middle segment
    val in = t.filter(col("k").isin(150L, 199L))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(150L, 199L))
    val inPlan = planString(in)
    assert(inPlan.contains("files=1/3"),
      s"IN probe must prune to the one matching file:\n$inPlan")

    // IN spanning two segments keeps exactly those two
    val span = t.filter(col("k").isin(10L, 250L))
    assert(span.count() == 2)
    assert(planString(span).contains("files=2/3"))

    // IN with no containable value prunes everything
    val none = t.filter(col("k").isin(1000L, 2000L))
    assert(none.count() == 0)
    assert(planString(none).contains("files=0/3"))

    // OR of two ranges keeps the union of their files
    val or = t.filter(col("k") < 50 || col("k") > 250)
    assert(or.count() == 50 + 49)
    assert(planString(or).contains("files=2/3"))

    // OR where one side is unsupported keeps everything (it can
    // never exclude), but stays correct
    val mixed = t.filter(col("k") < 50 || col("k") % 97 === 3)
    assert(mixed.count() ==
      (0L until 300L).count(k => k < 50 || k % 97 == 3))
    assert(planString(mixed).contains("files=3/3"))

    // AND composes with IN: intersection of the prunable sides
    val and = t.filter(col("k").isin(10L, 250L) && col("k") >= 200)
    assert(and.collect().map(_.getLong(0)).toSeq == Seq(250L))
    assert(planString(and).contains("files=1/3"))

    // string IN uses UTF8 order against string stats
    val sIn = t.filter(col("s").isin("s0150", "s0199"))
    assert(sIn.count() == 2)
    assert(planString(sIn).contains("files=1/3"))
  }

  test("a selective dim join injects runtime filters and drops fact files") {
    val dir = tmp("dpp")
    threeSegments(dir)
    val fact = spark.read.format("graft").load(dir)
    val dim = spark.range(0, 300).select(col("id").as("dk"),
      (col("id") % 100).as("bucket"))
    val joined = fact.join(dim.filter(col("dk").between(110, 120)),
      col("k") === col("dk"))
    val rows = joined.collect()
    assert(rows.length == 11)
    val plan = joined.queryExecution.executedPlan.toString
    // whether Spark chose DPP here is planner-dependent; what must
    // hold is correctness above plus: IF a runtime filter fired, the
    // scan read fewer files (description reflects post-filter state)
    if (plan.contains("dynamicpruning") || plan.contains("files=1/3"))
      assert(plan.contains("files=1/3"), s"runtime prune missing:\n$plan")
  }
}
