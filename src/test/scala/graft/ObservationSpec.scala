package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability without extra passes: `observe()` attaches
  * aggregate metrics (row counts, null counts, quality tallies) that are
  * computed DURING the action — the data-quality counters a production
  * corpus pipeline exports per run, for free, instead of re-scanning.
  */
class ObservationSpec extends SparkSpec {

  test("observe() collects quality metrics in the same pass as the action") {
    val obs = Observation("docs_quality")
    val docs = Tables.documents(spark, sf("sf0.001"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("text").isNull || length(col("text")) === 0, 1))
          .as("n_empty"),
        sum(col("n_chars")).as("total_chars"))
    // one action drives both the result and the metrics
    val n = docs.filter(col("lang") === "en").count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] > 0)
    assert(m("n_empty").asInstanceOf[Long] == 0L)
    assert(m("total_chars").asInstanceOf[Long] > 0L)
    assert(n <= m("n_rows").asInstanceOf[Long])
  }

  test("observe() metrics match an explicit aggregation") {
    val obs = Observation("events_obs")
    // DISTINCT aggregates are rejected in observed metrics
    // (INVALID_OBSERVED_METRICS) — use approx_count_distinct, the
    // sketch-backed form observability pipelines use anyway
    val ev = Tables.events(spark, sf("sf0.001"))
      .observe(obs, count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
    ev.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val expect = Tables.events(spark, sf("sf0.001"))
      .agg(count(lit(1)), countDistinct(col("user_id"))).head
    assert(m("n") == expect.getLong(0))
    val approx = m("n_users_approx").asInstanceOf[Long].toDouble
    val exact = expect.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1)
  }
}
