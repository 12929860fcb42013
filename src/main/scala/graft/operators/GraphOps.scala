package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators for dedup pipelines.
  *
  * [[connectedComponents]] turns near-dup PAIRS (the q13/q14/q15/q21
  * operators' output) into dedup CLUSTERS — the step that makes pair
  * output actionable: pick one canonical document per component, drop the
  * rest. Implemented as iterative min-label propagation in pure DataFrame
  * ops:
  *
  *   label(v) ← min(label(v), min over neighbors u of label(u))
  *
  * Each round is one equi-join (edges × labels, shuffle keyed by vertex
  * id) plus one min-aggregation with map-side partial aggregation; rounds
  * needed = component diameter. Near-dup components are small and dense
  * (duplicates of a common source document), so the loop converges in a
  * handful of rounds. Convergence is detected with the label SUM: labels
  * only ever decrease, so an unchanged Σlabel certifies the fixed point —
  * one scalar aggregate per round instead of a row-level change join.
  *
  * 100 TB notes: every round is partition-parallel and keyed by vertex
  * id — nothing is collected to the driver; the per-round result is
  * cached (and the previous round unpersisted) so lineage doesn't
  * re-derive earlier rounds. For adversarial long-chain graphs production
  * systems switch to alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), which converges in
  * O(log n) rounds using the SAME per-round plan shape (equi-join +
  * min-agg) — near-dup graphs never need it because their diameter is
  * bounded by the dedup cluster size.
  */
object GraphOps {

  /** Connected components of an undirected graph.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst`; interpreted as undirected
    * @param maxIter  safety bound on propagation rounds
    * @return (id, component) with component = min reachable vertex id
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    // cached: every propagation round joins against the edge set — an
    // uncached `sym` re-derives the caller's whole edge pipeline (for
    // q53 that is the full MinHash+LSH candidate/verify chain) once per
    // round per reference. Session caches are cleared between harness
    // queries (TextDedup's caching contract).
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    // Only edge-touched vertices can ever change label — iterate over
    // that (typically tiny) set and union the untouched rest back as
    // singletons at the end. For near-dup graphs this shrinks each
    // round from |corpus| to |docs with a near-dup|. Seeds are
    // restricted to the caller's vertex set so component ids are always
    // member vertex ids, even when edges mention ids outside `vertices`
    // (such endpoints still act as connectivity conduits, but never
    // label a component or appear in the output).
    val touched = sym.select(col("src").as("id")).distinct()
      .join(vertices.select(col("id")), Seq("id"), "left_semi")
    var labels = touched.select(col("id"), col("id").as("label")).cache()
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val fromNeighbors = sym
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      // localCheckpoint (eager) TRUNCATES LINEAGE, not just caches: the
      // round's plan references `labels` twice (union + join), so without
      // truncation the logical plan doubles per round and explodes on
      // deep graphs. At cluster scale, swap for reliable checkpointing
      // (spark.sparkContext.setCheckpointDir + .checkpoint()) to also
      // survive executor loss.
      val next = labels.unionByName(fromNeighbors)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      round += 1
    }
    // silent truncation would return split clusters that diverge from
    // any exact oracle with nothing pointing at the round budget
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds the budget); raise maxIter or " +
          "switch to large-star/small-star for long-chain graphs")
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }

  /** Σlabel — strictly decreasing while any label changes (labels are
    * monotone non-increasing), so equality across rounds ⟺ fixed point.
    */
  private def labelSum(labels: DataFrame): Long =
    labels.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
}
