package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def components(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(
        vs.toDF("id"), es.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("isolated vertices are their own singleton components") {
    assert(components(Seq(1L, 2L, 3L), Seq.empty) ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("a chain collapses to the min id (propagation crosses the diameter)") {
    // 9-hop chain: the min label must walk the full diameter, which
    // exercises the convergence loop well past one round
    val vs = (0L to 9L)
    val es = vs.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = components(vs, es)
    assert(got.values.toSet === Set(0L))
  }

  test("disjoint clusters + direction-agnostic edges + an isolated vertex") {
    val got = components(
      Seq(1L, 2L, 3L, 10L, 11L, 99L),
      // edges deliberately in mixed orientation: (high, low) too
      Seq((2L, 1L), (2L, 3L), (11L, 10L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("a cycle converges (no infinite propagation)") {
    val got = components(Seq(5L, 6L, 7L), Seq((5L, 6L), (6L, 7L), (7L, 5L)))
    assert(got.values.toSet === Set(5L))
  }

  test("edge endpoints outside the vertex set never label components") {
    // id 0 appears only in edges: it must not become a component id nor
    // an output row, but it still connects 5 and 6 as a conduit
    val got = components(Seq(5L, 6L), Seq((0L, 5L), (0L, 6L)))
    assert(got === Map(5L -> 5L, 6L -> 5L))
  }

  test("spark.graft.graph.checkpointDir routes the loop through " +
      "RELIABLE checkpoints (survives executor loss at cluster scale)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-graph-ckpt").toString
    spark.conf.set(GraphOps.CheckpointDirConf, root)
    try {
      // multi-round case (chain) so the loop actually checkpoints
      val vs = (0L to 9L)
      val es = vs.sliding(2).map(p => (p(0), p(1))).toSeq
      assert(components(vs, es).values.toSet === Set(0L))
      // the star variant takes the same seam
      val star = GraphOps.connectedComponentsStar(
        vs.toDF("id"), es.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star.values.toSet === Set(0L))
      // checkpoint data actually landed under the configured root —
      // the proof the truncation is reliable, not executor-local
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(root)),
        "no checkpoint files under the configured reliable root")
    } finally spark.conf.unset(GraphOps.CheckpointDirConf)
  }

  test("checkpoint cleanup: each round deletes the previous round's " +
      "reliable checkpoint; an app dir containing the root as a " +
      "substring is not mistaken for it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-graph-ckpt2").toString
    // adversarial pre-existing app checkpoint dir that CONTAINS the
    // configured root as a substring — ownership is decided by exact
    // equality with the dir graft itself minted, never by substring
    spark.sparkContext.setCheckpointDir(root + "-app")
    spark.conf.set(GraphOps.CheckpointDirConf, root)
    try {
      val vs = (0L to 9L)
      val es = vs.sliding(2).map(p => (p(0), p(1))).toSeq
      assert(components(vs, es).values.toSet === Set(0L))
      def rddDirs(base: java.io.File): Seq[java.io.File] =
        Option(base.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.getName.startsWith("rdd-")) Seq(f)
          else if (f.isDirectory) rddDirs(f) else Nil)
      // the chain needs ~9 checkpointed rounds; every round's files
      // were deleted as soon as its successor materialized, so only
      // the FINAL round's checkpoint survives the loop
      val kept = rddDirs(new java.io.File(root))
      assert(kept.size == 1,
        s"expected exactly 1 surviving checkpoint dir, got: $kept")
      // and nothing leaked into the substring-colliding app dir
      assert(rddDirs(new java.io.File(root + "-app")).isEmpty,
        "checkpoints written outside the configured root")
    } finally spark.conf.unset(GraphOps.CheckpointDirConf)
  }

  test("an exhausted round budget throws instead of returning split clusters") {
    val vs = (0L to 9L)
    val es = vs.sliding(2).map(p => (p(0), p(1))).toSeq
    val ex = intercept[IllegalStateException] {
      GraphOps.connectedComponents(vs.toDF("id"), es.toDF("src", "dst"),
        maxIter = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
