package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties of the all-integer fixed-point PageRank
  * ([[GraphOps.pageRankFp]]): structural ordering on a known graph,
  * mass conservation, partitioning invariance (the determinism claim the
  * q123 oracle relies on), and the isolated-vertex fixed point.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  private def graph(pairs: (Long, Long)*) = {
    val edges = pairs.toDF("src", "dst")
      .union(pairs.map(_.swap).toDF("src", "dst"))
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    (verts, edges)
  }

  test("path graph ranks the middle vertex highest; ends tie by symmetry") {
    val (v, e) = graph((1L, 2L), (2L, 3L))
    val pr = GraphOps.pageRankFp(v, e, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr(2L) > pr(1L), "degree-2 center must outrank the ends")
    assert(pr(1L) == pr(3L), "symmetric ends must tie exactly")
  }

  test("isolated vertices settle at the damping base; total mass never exceeds S") {
    val verts = (1L to 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = GraphOps.pageRankFp(verts, edges, iterations = 3)
    val rows = pr.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // no in-edges => pr = (15*S) div (100*N) exactly, from iteration 1 on
    val base = (15L * S) / (100L * 10L)
    (3L to 10L).foreach(id => assert(rows(id) == base, s"vertex $id"))
    // floor divisions only ever LOSE mass relative to the float model
    assert(rows.values.sum <= S)
    // the 1<->2 pair feeds each other and must sit above the base
    assert(rows(1L) > base && rows(2L) == rows(1L))
  }

  test("result is invariant to edge partitioning and input order") {
    val (v, e) = graph((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = GraphOps.pageRankFp(v, e, iterations = 4)
      .orderBy("id").collect().toSeq
    val b = GraphOps.pageRankFp(
        v.repartition(7), e.orderBy(col("dst")).repartition(3),
        iterations = 4)
      .orderBy("id").collect().toSeq
    assert(a == b, "integer PageRank must be bit-stable across layouts")
  }
}
