package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Constructed-case semantics of the cross-document repeated-span
  * operator ([[TextDedup.spanFlags]]/[[TextDedup.spanCoverage]]) — the
  * properties q121/q129's corpus-level oracles can't isolate:
  * cross-doc-only flagging, exact coverage extents, and full coverage
  * on exact duplicates.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val N = 4 // narrow spans so cases stay readable

  private def flags(rows: (Long, String)*) =
    TextDedup.spanFlags(rows.toDF("doc_id", "text"), "doc_id", "text", N)

  test("a span shared by two docs flags exactly its positions in both") {
    val shared = "w x y z" // the one 4-gram both docs contain
    val f = flags(
      1L -> s"a b c $shared d e",
      2L -> s"p q $shared r s t u")
    // doc 1: tokens a b c w x y z d e; the shared gram starts at pos 3
    // doc 2: tokens p q w x y z r s t u; it starts at pos 2
    val dup = f.filter(col("dup")).select("id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(dup == Set((1L, 3), (2L, 2)))
    val cov = TextDedup.spanCoverage(f, N)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cov == Set(3, 4, 5, 6).map((1L, _)) ++ Set(2, 3, 4, 5).map((2L, _)))
  }

  test("a span repeated WITHIN one doc only never flags") {
    val f = flags(
      1L -> "m n o p j j m n o p", // "m n o p" twice, same doc
      2L -> "entirely different words here")
    assert(f.filter(col("dup")).count() == 0)
  }

  test("exact duplicate docs are fully covered; unique doc untouched") {
    val f = flags(
      1L -> "one two three four five six",
      2L -> "one two three four five six",
      3L -> "seven eight nine ten eleven twelve")
    val cov = TextDedup.spanCoverage(f, N)
      .groupBy("id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cov == Map(1L -> 6L, 2L -> 6L), s"got $cov")
  }

  test("overlapping shared spans merge in coverage (distinct positions)") {
    // docs share a 5-token run => two overlapping 4-grams, 5 covered
    val run = "v w x y z"
    val f = flags(1L -> s"a $run", 2L -> s"$run b")
    val cov = TextDedup.spanCoverage(f, N)
      .groupBy("id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cov == Map(1L -> 5L, 2L -> 5L), s"got $cov")
  }
}
