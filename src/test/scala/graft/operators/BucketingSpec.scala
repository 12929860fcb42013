package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketing proof for the SCALE.md co-located-join claim: two tables
  * bucketed+sorted on the join key join with NO Exchange (and no sort) in
  * the physical plan — the shuffle the gold query would otherwise pay is
  * eliminated at write time. Broadcast is disabled for the check so the
  * exchange-free plan is attributable to bucketing, not to join-size
  * heuristics.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join without Exchange") {
    val suffix = System.nanoTime()
    val ordersT = s"b_orders_$suffix"
    val liT     = s"b_lineitem_$suffix"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(spark, sf("sf0.001")).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordersT)
      Tables.lineitem(spark, sf("sf0.001")).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
      val joined = spark.table(ordersT)
        .join(spark.table(liT), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and the result is still correct
      val expect = Tables.orders(spark, sf("sf0.001"))
        .join(Tables.lineitem(spark, sf("sf0.001")),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $ordersT")
      spark.sql(s"DROP TABLE IF EXISTS $liT")
    }
  }
}
