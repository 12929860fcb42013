package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Distributed Bloom filter as pure DataFrame ops — the membership
  * prefilter that replaces "join the whole reference set" with "join a
  * fixed-size bit digest" in contamination checks, incremental-dedup
  * probes, and anti-join pruning.
  *
  * Layout: `words` 60-bit words (bit masks stay positive longs — no
  * sign-bit edge cases in either Spark or the SQL oracle), k bit
  * positions per key from the md5-derived [[hash60]], so the filter is
  * bit-identical in any engine.
  *
  * 100 TB notes:
  *   - [[build]] is explode(k) + one groupBy(word) with map-side partial
  *     `bit_or`: the shuffle carries at most `words × partitions` rows
  *     regardless of key count, and the result is a `words`-row table.
  *   - [[probe]] broadcasts that digest (a few KB), so membership tests
  *     never shuffle the REFERENCE set — the asymmetry that matters when
  *     the reference corpus is the 100 TB side. Probe-side work is one
  *     broadcast join plus a k-row-per-key regroup keyed by the probe id.
  *   - No false negatives by construction; false-positive rate ≈
  *     (1 − e^(−k·n/m))^k is tuned via `words` — callers that need
  *     exactness re-verify bloom hits with the exact join, now shrunk to
  *     the hit set.
  */
object BloomFilter {

  private val BitsPerWord = 60

  private val pow2: Column =
    array((0 until BitsPerWord).map(b => lit(1L << b)): _*)

  /** The k bit positions of `key`: hash60("j:" || key) mod (words·60). */
  private def positions(key: Column, k: Int, words: Int): Column =
    array((0 until k).map(j =>
      hash60(concat(lit(s"$j:"), key.cast("string")))
        % lit(words.toLong * BitsPerWord)): _*)

  /** Build the digest: (word, bits) rows, word ∈ [0, words), bits = OR of
    * the member keys' masks. Words no key maps to are absent (treated as
    * all-zero by [[probe]]).
    */
  def build(keys: DataFrame, keyCol: String, k: Int, words: Int): DataFrame =
    keys.select(explode(positions(col(keyCol), k, words)).as("pos"))
      .select(expr(s"pos div $BitsPerWord").as("word"),
        element_at(pow2, (col("pos") % BitsPerWord).cast("int") + 1).as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))

  /** Adds `bloom_hit` (1L iff all k bits are set) to `df`. `idCols` must
    * uniquely identify df's rows (they key the per-row bit regroup).
    */
  def probe(df: DataFrame, keyCol: String, idCols: Seq[String],
      bloom: DataFrame, k: Int, words: Int): DataFrame = {
    val pr = df.select(idCols.map(col) :+
        explode(positions(col(keyCol), k, words)).as("pos"): _*)
      .select(idCols.map(col) :+ expr(s"pos div $BitsPerWord").as("word") :+
        element_at(pow2, (col("pos") % BitsPerWord).cast("int") + 1).as("mask"): _*)
    val checked = pr.join(broadcast(bloom), Seq("word"), "left_outer")
      .withColumn("set",
        when(col("bits").isNotNull &&
          (col("bits").bitwiseAND(col("mask")) =!= 0), 1L).otherwise(0L))
      .groupBy(idCols.map(col): _*)
      .agg((sum("set") === k).cast("long").as("bloom_hit"))
    df.join(checked, idCols)
  }
}
