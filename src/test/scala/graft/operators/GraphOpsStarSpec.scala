package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** large-star/small-star CC must agree with min-label propagation on
  * arbitrary graphs, and must converge in O(log n) rounds on the long
  * chains that blow past label propagation's diameter budget.
  */
class GraphOpsStarSpec extends SparkSpec {
  import spark.implicits._

  private def comps(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star CC equals label-propagation CC on a deterministic random graph") {
    val n = 100
    // deterministic pseudo-random edges (LCG), some self-loops and dups
    var x = 42L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) }
    val es = (1 to 150).map(_ => (next() % n, next() % n))
    val vertices = (0L until n.toLong).toDF("id")
    val edges = es.toDF("src", "dst")
    val expect = comps(GraphOps.connectedComponents(vertices, edges))
    val got = comps(GraphOps.connectedComponentsStar(vertices, edges))
    assert(got === expect)
  }

  test("star CC handles a 200-node chain in O(log n) rounds") {
    val n = 200L
    val vertices = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    // label propagation needs `diameter` rounds and must refuse here
    assertThrows[IllegalStateException] {
      GraphOps.connectedComponents(vertices, edges, maxIter = 25).collect()
    }
    val got = comps(GraphOps.connectedComponentsStar(vertices, edges))
    assert(got.size == n)
    assert(got.values.forall(_ == 0L))
  }

  test("star CC: empty edge set yields singletons; isolated ids survive") {
    val vertices = Seq(7L, 9L, 11L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(comps(GraphOps.connectedComponentsStar(vertices, empty)) ===
      Map(7L -> 7L, 9L -> 9L, 11L -> 11L))
    // two components + one isolate
    val edges = Seq((7L, 9L)).toDF("src", "dst")
    assert(comps(GraphOps.connectedComponentsStar(vertices, edges)) ===
      Map(7L -> 7L, 9L -> 7L, 11L -> 11L))
  }
}
