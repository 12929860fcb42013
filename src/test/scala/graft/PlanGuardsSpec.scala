package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape guards: the scale-critical physical-plan properties that
  * SCALE.md documents must stay true — a change that silently regresses
  * one of them (an interpreted fallback, a lost broadcast, a full sort
  * where top-k pushdown belongs, an unpushed filter) fails here instead
  * of only showing up as a bench delta.
  */
class PlanGuardsSpec extends SparkSpec {

  private def plan(name: String): String = {
    val fn = SparkEntry.queries(name)
    fn(spark, sf("sf0.001")).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
  }

  test("q02 pushes the equality + range filters into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "the dynamic equality filter must reach the scan")
  }

  test("q05 CDC latest-per-key is a partial-aggregating max_by, not a window sort") {
    val p = plan("q05_latest_per_key")
    assert(p.contains("partial_max_by"),
      "map-side partial aggregation is the 100 TB property")
    assert(!p.contains("WindowExec"), "no window sort in the CDC path")
  }

  test("q09 top-k is TakeOrderedAndProject, not a global sort") {
    assert(plan("q09_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q20 hashes buckets with the native expression and broadcasts the query side") {
    val p = plan("q20_ann_lsh")
    assert(p.contains("lshbucket"),
      "bucket hashing must stay the native codegen'd expression")
    assert(p.contains("BroadcastHashJoin"),
      "the bucket join must broadcast the small query side")
  }

  test("q03 dims are broadcast, never shuffled") {
    val p = plan("q03_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }
}
