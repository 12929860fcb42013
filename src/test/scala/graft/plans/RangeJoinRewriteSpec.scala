package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The range-join rewrite must (1) actually change the physical plan from
  * a nested-loop shape to an equi-join, and (2) be lossless — bit-equal
  * results with the rule on and off, including every boundary the binning
  * math could get wrong: points exactly on bin edges, points exactly on
  * interval bounds (inclusive vs exclusive), negative domains (trunc-vs-
  * floor division), intervals spanning many bins, and NULLs.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def physical(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  // points: every value in a window around zero so bin edges, interval
  // bounds and negative values are all hit; intervals: varied widths,
  // including multi-bin spans and a NULL bound
  private lazy val points = (-500L to 500L).toDF("p")
  private lazy val intervals = Seq(
    (1L, -490L, -450L), (2L, -100L, 100L), (3L, -3L, 3L), (4L, 0L, 0L),
    (5L, 7L, 347L), (6L, -321L, -320L), (7L, 100L, 200L), (8L, 499L, 600L),
    (9L, -600L, -500L), (10L, 64L, 64L), (11L, -64L, 63L), (12L, 1L, 499L))
    .toDF("id", "lo", "hi")
    .union(Seq((13L, Option.empty[Long], Option(5L)),
      (14L, Option(5L), Option.empty[Long])).toDF("id", "lo", "hi"))

  private def bandJoin(): DataFrame =
    points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))

  private def run(binSize: Option[Long])(q: => DataFrame): Seq[(Long, Long, Long, Long)] = {
    binSize match {
      case Some(w) => RangeJoinRewrite.enable(spark, w)
      case None => spark.conf.set(RangeJoinRewrite.BinSizeKey, "0")
    }
    try q.select("p", "id", "lo", "hi").as[(Long, Long, Long, Long)]
      .collect().toSeq.sorted
    finally spark.conf.set(RangeJoinRewrite.BinSizeKey, "0")
  }

  test("without the rule a pure band join plans a nested-loop join") {
    spark.conf.set(RangeJoinRewrite.BinSizeKey, "0")
    assert(physical(bandJoin()).contains("BroadcastNestedLoopJoin"))
  }

  test("with the rule the plan is an equi-join on the bin, no nested loop") {
    RangeJoinRewrite.enable(spark, 64L)
    try {
      val p = physical(bandJoin())
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("__graft_bin"), p)
      assert(p.contains("Generate") || p.contains("explode"), p)
    } finally spark.conf.set(RangeJoinRewrite.BinSizeKey, "0")
  }

  test("rewrite is lossless across bin edges, bounds, negatives and NULLs") {
    val off = run(None)(bandJoin())
    assert(off.nonEmpty)
    // strict upper bound respected: no row with p == hi
    assert(off.forall { case (p, _, _, hi) => p < hi })
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L))
      assert(run(Some(w))(bandJoin()) === off, s"binSize=$w")
  }

  test("joins that already have an equi key are left untouched") {
    RangeJoinRewrite.enable(spark, 64L)
    try {
      val ptsK = points.withColumn("k", pmod(col("p"), lit(3)))
      val ivK = intervals.withColumn("k", pmod(col("id"), lit(3)))
      val q = ptsK.join(ivK,
        ptsK("k") === ivK("k") && col("p") >= col("lo") && col("p") < col("hi"))
      assert(!physical(q).contains("__graft_bin"))
    } finally spark.conf.set(RangeJoinRewrite.BinSizeKey, "0")
  }

  test("inclusive-upper band (BETWEEN shape) is rewritten and lossless") {
    val q = () => points.join(intervals,
      col("p").between(col("lo"), col("hi")))
    val off = run(None)(q())
    assert(off.exists { case (p, _, _, hi) => p == hi }, "inclusive bound must match")
    assert(run(Some(64L))(q()) === off)
  }
}
