package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val Words = 16 // deliberately small: forces some false positives

  test("no false negatives: every inserted key probes as a hit") {
    val keys = (0L until 200L).toDF("k")
    val bloom = BloomFilter.build(keys, "k", K, Words)
    val probed = BloomFilter.probe(keys, "k", Seq("k"), bloom, K, Words)
    assert(probed.filter(col("bloom_hit") === 0L).count() === 0)
  }

  test("digest is bounded by `words` rows with positive 60-bit masks") {
    val bloom = BloomFilter.build((0L until 1000L).toDF("k"), "k", K, Words)
    assert(bloom.count() <= Words)
    val r = bloom.agg(min("bits"), max("bits")).head
    assert(r.getLong(0) > 0L && r.getLong(1) < (1L << 60))
  }

  test("disjoint probe keys mostly miss, and misses are never exact members") {
    val members = (0L until 100L).toDF("k")
    val bloom = BloomFilter.build(members, "k", K, Words)
    val foreign = (10000L until 10100L).toDF("k")
    val hits = BloomFilter.probe(foreign, "k", Seq("k"), bloom, K, Words)
      .filter(col("bloom_hit") === 1L).count()
    // 960 bits, ~400 set: fp rate well under 50% even in this tiny config
    assert(hits < 50, s"false-positive rate implausibly high: $hits/100")
  }

  test("build is deterministic") {
    val keys = (0L until 50L).toDF("k")
    val a = BloomFilter.build(keys, "k", K, Words).orderBy("word").collect()
    val b = BloomFilter.build(keys, "k", K, Words).orderBy("word").collect()
    assert(a.toSeq === b.toSeq)
  }
}
