package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler: times the sub-stages of one query shape in
  * isolation (SPARK_GRAFT_SF_DIR selects the scale). Not part of the
  * driver contract; see Bench for the graded harness.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val li = graft.Tables.lineitem(spark, d)
    li.select("l_orderkey").write.format("noop").mode("overwrite").save() // warm IO
    val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    t("distinct-count")(println(op.count()))
    val opc = op.cache()
    t("cache-materialize")(opc.write.format("noop").mode("overwrite").save())
    val sup = opc.groupBy("p").agg(count(lit(1)).as("s")).filter(col("s") >= 35)
    t("supports")(println(sup.count()))
    val nOrders = opc.agg(countDistinct(col("o")).as("n_orders"))
    t("norders")(nOrders.write.format("noop").mode("overwrite").save())
    val fop = opc.join(sup, "p")
    t("fop-count")(println(fop.count()))
    val pairs = fop.select(col("o"), col("p").as("pa"), col("s").as("sa"))
      .join(fop.select(col("o"), col("p").as("pb"), col("s").as("sb")), "o")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("sp"),
        min(col("sa")).as("sa"), min(col("sb")).as("sb"))
      .filter(col("sp") >= 2)
    t("pair-join-agg")(println(pairs.count()))
    spark.catalog.clearCache()
    t("cold-total-current")(
      graft.queries.AnalyticsQueries.q124FrequentPairs.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
