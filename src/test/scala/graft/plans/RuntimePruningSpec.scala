package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Runtime-pruning proofs for the SCALE.md claims that Catalyst's
  * dynamic filters fire on our layouts — the two mechanisms that cut a
  * 100 TB fact scan down to the fraction a selective dim filter implies,
  * without any static predicate on the fact side:
  *
  *   - Dynamic partition pruning (DPP): a hive-partitioned fact joined
  *     on its partition column reads only the partitions the filtered
  *     dim side selects, discovered AT RUNTIME from the dim's build.
  *   - Runtime bloom-filter injection: for a non-partition join key,
  *     the optimizer builds a bloom filter from the small (creation)
  *     side and pushes a might-contain probe into the large side's
  *     scan stage, shrinking the shuffle before the join.
  *
  * Both are plan-shape guards in the BucketingSpec mold: the feature is
  * asserted on the executed/physical plan, and result equality against
  * the unoptimized formulation keeps the guard honest.
  */
class RuntimePruningSpec extends SparkSpec {

  test("DPP: partitioned fact scan is pruned by the filtered dim at runtime") {
    val dir = s"/tmp/graft-dpp-${System.nanoTime()}"
    val docs = Tables.documents(spark, sf("sf0.001"))
    docs.write.partitionBy("lang").parquet(dir)
    try {
      val fact = spark.read.parquet(dir)
      // dim: one row per lang, filtered to a single lang — only the
      // join reveals which fact partitions matter
      val dim = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 0) // keep it a derived, non-literal dim
        .filter(hash60(col("lang")) % 5 === 0)
      val joined = fact.join(dim, "lang")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"fact scan must carry a dynamicpruning partition filter:\n$plan")
      // and the pruned plan returns exactly the statically-filtered rows
      val langs = dim.select("lang").collect().map(_.getString(0)).toSet
      val expect = docs.filter(col("lang").isin(langs.toSeq: _*)).count()
      assert(joined.count() == expect)
    } finally {
      val d = new java.io.File(dir)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(d)
    }
  }

  private def hash60(c: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.hash60(c)

  test("runtime bloom filter from the selective side prunes the probe side") {
    val confs = Seq(
      // the injection rule gates on byte-size estimates tuned for
      // clusters; open them up so sf0.001 tables qualify
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, sf("sf0.001"))
      val orders = Tables.orders(spark, sf("sf0.001"))
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"probe side must carry an injected bloom-filter predicate:\n$plan")
      assert(joined.count() ==
        li.join(orders.hint("broadcast"),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
