package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Salted two-phase aggregation and replicated skew joins must equal
  * their unsalted equivalents exactly.
  */
class SaltingSpec extends SparkSpec {

  test("saltedAggregate == plain aggregate (decimal-exact sums)") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val salted = Salting.saltedAggregate(
      ev, keys = Seq("event_type"), idCols = Seq(col("event_id")),
      saltBuckets = 8,
      phase1 = Seq(
        sum(col("value").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("c")),
      phase2 = Seq(
        sum(col("s")).cast("double").as("sum_value"),
        sum(col("c")).as("n")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("replicateForSkewJoin == plain join") {
    val ev = Tables.events(spark, sf("sf0.001")).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sf("sf0.001"))
      .select("user_id").distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val salted = Salting.replicateForSkewJoin(ev, dim, Seq("user_id"),
        idCols = Seq(col("event_id")), saltBuckets = 8)
      .select("event_id", "user_tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = ev.join(dim, Seq("user_id"))
      .select("event_id", "user_tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(salted == plain)
  }
}
