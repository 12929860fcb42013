package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Date/timestamp columns in the stats tier: per-file min/max and
  * digests are recorded as epoch-day / epoch-micro NUMERIC strings
  * (`unix_date`/`unix_micros` — no calendar render ever touches the
  * manifest, so no timezone or format hazard), probed by
  * planning-time pruning, runtime filters, digests, and manifest-only
  * MIN/MAX pushdown; the connector decodes every encoding Spark's
  * writer produces (INT96 default, INT64 micros/millis, INT32 date).
  */
class DateTimeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-dts-$name").toString + "/t"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Three single-file segments with DISJOINT ts days (a time-series
    * layout) and an INTERLEAVED `d` date (file i holds days ≡ i mod 3
    * — min/max spans everything, only a digest can prune d).
    */
  private def threeDays(dir: String): Unit = {
    ManagedTable.commit(
      spark.range(0).select(col("id").as("k"),
        lit(null).cast("timestamp").as("ts"),
        lit(null).cast("date").as("d")), dir)
    ManagedTable.setTableProperties(spark, dir,
      Map(BloomSkipping.ColumnsProp -> "d"))
    (0 until 3).foreach { i =>
      ManagedTable.appendCommit(
        spark.range(100).select(
          (col("id") + i * 100).as("k"),
          (to_timestamp(lit(s"2024-03-0${i + 1} 00:00:00")) +
            make_dt_interval(lit(0), lit(0), lit(0),
              col("id").cast("double"))).as("ts"),
          date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            (col("id") * 3 + i).cast("int")).as("d"))
          .coalesce(1), dir)
    }
  }

  private def planString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def filesPlanned(plan: String): Int = {
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no GraftScan files= marker in:\n$plan")
    m.get.group(1).toInt
  }

  test("connector round-trips timestamp/date (INT96 default encoding), " +
      "columnar and row decode agree") {
    val dir = tmp("roundtrip")
    threeDays(dir)
    val t = spark.read.format("graft").load(dir)
    val viaManaged = ManagedTable.read(spark, dir)
      .orderBy("k").collect().toSeq
    val viaConnector = t.orderBy("k").collect().toSeq
    assert(viaConnector == viaManaged,
      "connector decode must equal the file-source decode")
    assert(viaConnector.size == 300)
    assert(viaConnector.head.getTimestamp(1) ==
      ts("2024-03-01 00:00:00"))
    // the ROW reader decodes identically (INT96 path) — drive it
    // directly, it only runs for empty projections otherwise
    val rel = ManagedTable.readManifest(spark, dir, 3)._2
      .filterNot(_.startsWith("dv:")).last
    val rr = new GraftPartitionReader(s"$dir/$rel", t.schema,
      Array.empty)
    val first = { assert(rr.next()); rr.get() }
    assert(first.getLong(1) == org.apache.spark.sql.catalyst.util
      .DateTimeUtils.fromJavaTimestamp(ts("2024-03-01 00:00:00")),
      "row reader INT96 decode must yield instant micros")
  }

  test("a timestamp range probe prunes to the day's segment") {
    val dir = tmp("tsrange")
    threeDays(dir)
    val t = spark.read.format("graft").load(dir)
    val q = t.filter(col("ts") >= ts("2024-03-02 00:00:00") &&
      col("ts") < ts("2024-03-02 12:00:00"))
    assert(q.count() == 100)
    assert(filesPlanned(planString(q)) == 1,
      "disjoint-day segments must prune on a ts range")
    // an out-of-range day: zero files
    val none = t.filter(col("ts") >= ts("2024-04-01 00:00:00"))
    assert(none.collect().isEmpty)
    assert(filesPlanned(planString(none)) == 0)
  }

  test("runtime filters and digests prune date/timestamp keys") {
    val dir = tmp("runtime")
    threeDays(dir)
    val meta = GraftTableMeta.resolve(dir, None)
    assert(new GraftScanBuilder(meta).build().asInstanceOf[GraftScan]
      .filterAttributes().map(_.toString).toSet
      .intersect(Set("ts", "d")) == Set("ts", "d"),
      "date/timestamp columns must be runtime-filterable")
    // runtime ts equality arrives as internal MICROS (what DPP hands
    // over): prunes to the one holding segment
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .fromJavaTimestamp(ts("2024-03-02 00:00:30"))
    val scan = new GraftScanBuilder(meta).build().asInstanceOf[GraftScan]
    scan.filter(Array(new Predicate("=", Array(
      Expressions.column("ts"), Expressions.literal(micros)))))
    assert(scan.planInputPartitions().length == 1)

    // planning-time equality on the INTERLEAVED date: min/max keeps
    // every segment, the digest prunes to the holder (day ≡ 1 mod 3)
    val t = spark.read.format("graft").load(dir)
    val q = t.filter(col("d") ===
      java.sql.Date.valueOf("2024-05-15")) // epochday diff ≡ ? — just assert correctness + ≤ pruning
    val rows = q.collect()
    val plan = filesPlanned(planString(q))
    if (rows.nonEmpty) assert(plan == 1,
      s"digest should isolate the holder, planned $plan")
    else assert(plan == 0,
      s"digest should drop every file for an absent date, planned $plan")
  }

  test("MIN/MAX over timestamp/date answers from the manifest; " +
      "ambiguous pre-tier stats block the push") {
    val dir = tmp("agg")
    threeDays(dir)
    val t = spark.read.format("graft").load(dir)
    val q = t.agg(min("ts").as("mn"), max("ts").as("mx"),
      min("d").as("dmn"), max("d").as("dmx"))
    assert(q.collect().toSeq == Seq(Row(
      ts("2024-03-01 00:00:00"), ts("2024-03-03 00:01:39"),
      java.sql.Date.valueOf("2024-01-01"),
      java.sql.Date.valueOf("2024-10-26")))) // 2024-01-01 + 299 days
    val plan = planString(q)
    assert(plan.contains("GraftAggScan"),
      s"ts/date min/max must push to the manifest:\n$plan")

    // simulate a PRE-TIER manifest: strip one file's ts entries (but
    // keep its stats map) — ambiguous with all-null, so no push
    val vs = ManagedTable.versions(spark, dir)
    val (_, all, schemaJson, stats) =
      ManagedTable.readManifest(spark, dir, vs.last)
    val victim = stats.collectFirst { case (k, st)
      if k.startsWith("data/") && st.contains("ts") => k }.get
    val stripped = stats + (victim -> stats(victim).view.filterKeys(k =>
      k != "ts" && k != ManagedTable.nnStat("ts")).toMap)
    ManagedTable.writeManifest(spark, dir, vs.last + 1, "strip", all,
      schemaJson.getOrElse(""), stripped)
    val q2 = spark.read.format("graft").load(dir)
      .agg(min("ts").as("mn"))
    assert(q2.collect().head.getTimestamp(0) == ts("2024-03-01 00:00:00"))
    assert(!planString(q2).contains("GraftAggScan"),
      "a file without ts entries is ambiguous — must not push")
  }

  test("the DSv2 writer lands timestamp/date as standard annotations " +
      "and the round-trip is exact") {
    val dir = tmp("write")
    spark.range(10).select(col("id").as("k"),
      (to_timestamp(lit("2024-06-01 12:00:00")) +
        make_dt_interval(lit(0), lit(0), lit(0),
          col("id").cast("double"))).as("ts"),
      date_add(lit(java.sql.Date.valueOf("2024-06-01")),
        col("id").cast("int")).as("d"))
      .write.format("graft").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir).orderBy("k")
      .collect()
    assert(back.length == 10)
    assert(back.head.getTimestamp(1) == ts("2024-06-01 12:00:00"))
    assert(back.last.getDate(2) == java.sql.Date.valueOf("2024-06-10"))
    // the staged file carries INT64 micros (standard annotation,
    // never INT96) — the same file-source read agrees
    assert(ManagedTable.read(spark, dir).orderBy("k").collect().toSeq ==
      back.toSeq)
  }

  test("readWhere prunes on timestamp bounds through planFilesMulti") {
    val dir = tmp("readwhere")
    threeDays(dir)
    val (kept, total) = ManagedTable.planFiles(spark, dir, "ts",
      ts("2024-03-03 00:00:00"), ts("2024-03-03 23:59:59"))
    assert(total.size == 4 && kept.size == 1, // 3 days + empty create
      s"expected 1/4 files for one day, got ${kept.size}/${total.size}")
    val rows = ManagedTable.readWhere(spark, dir, "ts",
      ts("2024-03-03 00:00:00"), ts("2024-03-03 23:59:59")).count()
    assert(rows == 100)
  }
}
