package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.Expectations.Rule

/** Expectations semantics: the gate drops exactly the violating rows,
  * batch metrics ride the caller's action via Observation (no second
  * scan), streaming metrics surface per micro-batch through the named
  * observe channel, null predicates count as violations, and
  * expect_or_fail throws with rule names and counts.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  private val rules = Seq(
    Rule("min_tokens", size(split(lower(col("text")), " ")) >= 24),
    Rule("max_chars", col("n_chars") <= 480))

  test("dropFailed keeps exactly the all-rules-pass rows") {
    val kept = Expectations.dropFailed(docs, rules)
    val expected = docs.filter(
      size(split(lower(col("text")), " ")) >= 24 && col("n_chars") <= 480)
    assert(kept.count() == expected.count())
    assert(kept.exceptAll(expected).isEmpty && expected.exceptAll(kept).isEmpty)
    assert(kept.count() < docs.count(), "rules must actually drop rows")
  }

  test("batch Observation metrics match a direct recount, no extra scan") {
    val (gated, obs) = Expectations.observedGate(docs, rules)
    val nKept = gated.count() // the caller's own action resolves metrics
    val m = obs.get
    assert(m("n_input") == docs.count())
    val v1 = docs.filter(size(split(lower(col("text")), " ")) < 24).count()
    val v2 = docs.filter(col("n_chars") > 480).count()
    assert(m("viol_min_tokens") == v1, m)
    assert(m("viol_max_chars") == v2, m)
    assert(nKept <= docs.count() - math.max(v1, v2))
  }

  test("streaming gate publishes per-micro-batch metrics via observe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    docs.write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(docs.schema).parquet(s"$dir/in")
    val gated = Expectations.streamingGate(stream, rules, "gate")
    var observed: Map[String, Long] = Map.empty
    val q = gated.writeStream.format("noop")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // AvailableNow: the last progress with rows carries the gate metrics
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("gate")))
    assert(metrics.nonEmpty, "observe metrics must surface in progress")
    val total = metrics.map(_.getAs[Long]("n_input")).sum
    val viol = metrics.map(_.getAs[Long]("viol_min_tokens")).sum
    assert(total == docs.count())
    assert(viol ==
      docs.filter(size(split(lower(col("text")), " ")) < 24).count())
  }

  test("quarantine splits losslessly and names every failed rule") {
    val (valid, quarantined) = Expectations.quarantine(docs, rules)
    assert(valid.count() + quarantined.count() == docs.count(),
      "the split must be a partition of the input")
    assert(valid.columns.toSeq == docs.columns.toSeq,
      "valid rows keep the caller's schema")
    val kept = Expectations.dropFailed(docs, rules)
    assert(valid.exceptAll(kept).isEmpty && kept.exceptAll(valid).isEmpty)
    // every quarantined row names exactly its failing rules, sorted
    val both = quarantined.filter(
      size(split(lower(col("text")), " ")) < 24 && col("n_chars") > 480)
    if (both.count() > 0)
      assert(both.select("_violations").head.getSeq[String](0) ==
        Seq("max_chars", "min_tokens"))
    val onlyLen = quarantined.filter(
      size(split(lower(col("text")), " ")) >= 24)
    assert(onlyLen.filter(col("_violations") =!=
      array(lit("max_chars"))).count() == 0)
  }

  test("streaming quarantine routes each batch exactly once per table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-expq").toString
    // several input files + maxFilesPerTrigger=1 => several micro-batches:
    // the tables must ACCUMULATE across batches (append, not replace)
    docs.repartition(3).write.parquet(s"$dir/in")
    val M = graft.sources.ManagedTable
    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      val q = Expectations
        .quarantineStreamingSink(stream, rules, s"$dir/valid", s"$dir/quar")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val nValid = M.read(spark, s"$dir/valid").count()
    val nQuar = M.read(spark, s"$dir/quar").count()
    assert(nValid == Expectations.dropFailed(docs, rules).count())
    assert(nValid + nQuar == docs.count(), "split must be lossless")
    assert(M.read(spark, s"$dir/quar").columns.contains("_violations"),
      "quarantined rows must carry provenance")
    // restart replays nothing: the b<id> tags make both sinks idempotent
    run()
    assert(M.read(spark, s"$dir/valid").count() == nValid)
    assert(M.read(spark, s"$dir/quar").count() == nQuar)
  }

  test("null predicate results are violations, not passes") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(900L)))
      .toDF("id", "v")
    val r = Seq(Rule("v_small", col("v") <= 480))
    val kept = Expectations.dropFailed(df, r)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), "null must not slip through the gate")
    val report = Expectations.ruleReport(df, r).collect()
    assert(report.find(_.getString(0) == "v_small").get.getLong(1) == 2,
      "null row counts as failed")
  }

  test("validate throws naming the violated rules and counts") {
    val ex = intercept[IllegalStateException] {
      Expectations.validate(docs, rules)
    }
    assert(ex.getMessage.contains("min_tokens") ||
      ex.getMessage.contains("max_chars"))
    // a satisfiable rule set validates silently
    Expectations.validate(docs, Seq(Rule("nonempty", col("n_chars") >= 0)))
  }
}
