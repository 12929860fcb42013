package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Degenerate-input behavior: a library operator must return the
  * correct EMPTY or identity result, never throw, when handed an empty
  * table, an edgeless graph, or a right side with no rows — the shapes
  * that show up constantly in incremental pipelines (first run, quiet
  * partition, new tenant).
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("exact dedup on an empty corpus") {
    assert(TextDedup.exactDupGroups(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("minhash near-dups on an empty corpus and on a single doc") {
    assert(TextDedup.minhashNearDups(emptyDocs, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, minJaccard = 0.5).count() == 0)
    val one = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(TextDedup.minhashNearDups(one, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, minJaccard = 0.5).count() == 0)
  }

  test("as-of join with an empty right side null-extends every left row") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "rt", "p")
    for (df <- Seq(
        AsOfJoin.asOf(left, right, Seq("k"), "t", "rt"),
        AsOfJoin.asOfExec(left, right, Seq("k"), "t", "rt"))) {
      val rows = df.collect()
      assert(rows.length == 1 && rows.head.isNullAt(3))
    }
  }

  test("as-of join with an empty left side is empty") {
    val left = Seq.empty[(Long, Long, String)].toDF("k", "t", "v")
    val right = Seq((1L, 5L, 9L)).toDF("k", "rt", "p")
    assert(AsOfJoin.asOf(left, right, Seq("k"), "t", "rt").count() == 0)
    assert(AsOfJoin.asOfExec(left, right, Seq("k"), "t", "rt").count() == 0)
  }

  test("connected components with empty vertex set") {
    val vs = Seq.empty[Long].toDF("id")
    val es = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.connectedComponents(vs, es).count() == 0)
    assert(GraphOps.connectedComponentsStar(vs, es).count() == 0)
  }

  test("apply-changes on an empty changelog") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "seq", "v")
    assert(ApplyChanges.latestByKey(empty, Seq("k"), Seq(col("seq")))
      .count() == 0)
  }

  test("brute-force KNN with an empty candidate set") {
    val q = Seq((1L, Array(1.0f, 0.0f)))
      .toDF("query_id", "qv")
    val c = Seq.empty[(Long, Array[Float])].toDF("neighbor_id", "cv")
    assert(Similarity.bruteForceTopK(q, c, k = 3).count() == 0)
    assert(Similarity.bruteForceTopKAgg(q, c, k = 3).count() == 0)
  }
}
