package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** TextDedup operators on the harness corpus: MinHash+LSH must recover the
  * exact-Jaccard near-dup set (planted dups sit at j ≥ 0.9, far above the
  * 0.5 threshold, so all their bands collide), and simhash must be
  * deterministic and collision-banded correctly.
  */
class TextDedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("exact dedup: groups partition the corpus; canonical id is min") {
    val groups = TextDedup.exactDupGroups(docs, "doc_id", "text")
    assert(groups.agg(sum("n_dups")).head.getLong(0) == docs.count())
    val survivors = TextDedup.dropExactDups(docs, "doc_id", "text")
    assert(survivors.count() == groups.count())
  }

  test("minhash LSH recovers the exact jaccard near-dup pairs") {
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).size} / found ${lsh.size} of ${exact.size}")
  }

  test("simhash near-dups recover most high-jaccard planted pairs") {
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = TextDedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash is lossy by design: a j≥0.9 pair can still flip >5 bits, so
    // assert high recall rather than containment (observed 25/27 here)
    val recall = (exact & sim).size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.8,
      s"recall $recall: missed ${(exact -- sim).size} of ${exact.size}")
  }

  test("multi-config LSH candidates equal the per-config candidate sets") {
    val grams = TextDedup.docGramArrays(docs, "doc_id", "text", 3)
    val sigs = TextDedup.signaturesFromGrams(grams, 16).cache()
    val multi = TextDedup.lshCandidatesMulti(sigs, 16, Seq(2, 4, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (b, rows) =>
        b -> rows.map(r => (r._2, r._3)).toSet
      }
    Seq(2, 4, 8).foreach { b =>
      val single = TextDedup.lshCandidates(sigs, 16, b)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(multi.getOrElse(b.toLong, Set.empty) == single,
        s"bands=$b: one-pass sweep diverged from the per-config join")
    }
    // more bands (fewer rows per band) can only ADD collisions
    assert(multi(2L).subsetOf(multi(4L)) && multi(4L).subsetOf(multi(8L)),
      "candidate sets must be monotone in band count")
  }

  test("jaccardPairsFromGrams equals the from-text formulation") {
    val viaText = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaGrams = TextDedup.jaccardPairsFromGrams(
        TextDedup.docGramArrays(docs, "doc_id", "text", 3), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaText == viaGrams)
  }

  test("simhash is deterministic and within 60 bits") {
    val twice = (1 to 2).map { _ =>
      docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(twice(0) == twice(1))
    assert(twice(0).values.forall(v => v >= 0 && v < (1L << 60)))
  }
}
