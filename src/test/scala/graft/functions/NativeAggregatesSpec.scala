package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.NativeAggregates.kmvSketch
import graft.functions.TextFunctions.hash60

/** KmvSketchAgg: the mergeable bottom-k sketch must be bit-identical to
  * the window-based bottom-k (q64's formulation) on the same hashes, for
  * every partition layout — merge associativity is exactly what a
  * multi-executor shuffle exercises.
  */
class NativeAggregatesSpec extends SparkSpec {

  private val K = 8

  private def hashes = {
    import spark.implicits._
    graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), hash60(col("user_id").cast("string")).as("h"))
  }

  private def windowBottomK = {
    val w = Window.partitionBy("event_type").orderBy(col("h").asc)
    hashes.distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .groupBy("event_type")
      .agg(sort_array(collect_list("h")).as("expect"))
  }

  test("sketch equals window bottom-k on every partition layout") {
    val expect = windowBottomK.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (parts <- Seq(1, 3, 32)) {
      val got = hashes.repartition(parts)
        .groupBy("event_type").agg(kmvSketch(col("h"), K).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got === expect, s"parts=$parts")
    }
  }

  test("sketch dedups: duplicate hashes count once") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 5L), ("a", 7L), ("a", 3L))
      .toDF("g", "h")
    val sk = df.groupBy("g").agg(kmvSketch(col("h"), K).as("sk"))
      .collect().head.getSeq[Long](1)
    assert(sk === Seq(3L, 5L, 7L))
  }

  test("sketch keeps only k smallest and stays sorted ascending") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("g", 101L - i)).toDF("g", "h")
      .repartition(7)
    val sk = df.groupBy("g").agg(kmvSketch(col("h"), K).as("sk"))
      .collect().head.getSeq[Long](1)
    assert(sk === (1L to K.toLong))
  }

  test("null inputs are skipped, empty group yields empty array") {
    import spark.implicits._
    val df = Seq(("a", Some(4L)), ("a", None), ("b", None))
      .toDF("g", "h")
    val got = df.groupBy("g").agg(kmvSketch(col("h"), K).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(4L))
    assert(got("b") === Seq.empty[Long])
  }

  test("partial aggregation: plan is ObjectHashAggregate with a partial pass") {
    val plan = hashes.groupBy("event_type")
      .agg(kmvSketch(col("h"), K).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_graft_kmv_sketch") ||
      plan.contains("partial graft_kmv_sketch") ||
      plan.toLowerCase.contains("partial"))
  }

  test("top-k pair agg equals window top-k on every partition layout") {
    import NativeAggregates.topKPair
    val w = Window.partitionBy("event_type")
      .orderBy(col("h").desc, col("uid").asc)
    // distinct pairs: the aggregate dedups equal (score, id) pairs (its
    // KNN call sites score each pair once), so compare on unique pairs
    val base = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("user_id").cast("long").as("uid"),
        hash60(col("user_id").cast("string")).as("h"))
      .distinct()
    val expect = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("event_type"), col("h"), col("uid"), col("rn").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    for (parts <- Seq(1, 32)) {
      val got = base.repartition(parts)
        .groupBy("event_type").agg(topKPair(col("h"), col("uid"), K).as("tk"))
        .select(col("event_type"), posexplode(col("tk")).as(Seq("pos", "s")))
        .select(col("event_type"), col("s.score"), col("s.id"),
          (col("pos") + 1).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expect, s"parts=$parts")
    }
  }

  test("top-k pair agg tie-breaks on id ascending") {
    import NativeAggregates.topKPair
    import spark.implicits._
    val df = Seq(("g", 10L, 3L), ("g", 10L, 1L), ("g", 10L, 2L), ("g", 9L, 0L))
      .toDF("g", "s", "i").repartition(3)
    val got = df.groupBy("g").agg(topKPair(col("s"), col("i"), 3).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.score"), col("e.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((10L, 1L), (10L, 2L), (10L, 3L)))
  }

  test("randomized model check: both aggregates match plain-Scala references") {
    import NativeAggregates.{kmvSketch, topKPair}
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(400)((s"g${rnd.nextInt(4)}",
        rnd.nextInt(50).toLong, rnd.nextLong().abs % 1000L))
      val parts = 1 + rnd.nextInt(16)
      val df = rows.toDF("g", "h", "id").repartition(parts)
      // KMV reference: sorted distinct h, first K
      val kmvExpect = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(_._2).distinct.sorted.take(K)
      }
      val kmvGot = df.groupBy("g").agg(kmvSketch(col("h"), K).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(kmvGot === kmvExpect, s"kmv seed=$seed parts=$parts")
      // top-k reference: distinct (score, id) pairs by (score desc, id asc)
      val tkExpect = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).distinct
          .sortBy { case (s, i) => (-s, i) }.take(K)
      }
      val tkGot = df.groupBy("g").agg(topKPair(col("h"), col("id"), K).as("tk"))
        .select(col("g"), explode(col("tk")).as("e"))
        .select(col("g"), col("e.score"), col("e.id"))
        .collect().groupBy(_.getString(0))
        .map { case (g, rs) => g -> rs.map(r => (r.getLong(1), r.getLong(2))).toSeq }
      assert(tkGot === tkExpect, s"topk seed=$seed parts=$parts")
    }
  }

  test("SQL surface: graft_kmv_sketch via GraftExtensions.register") {
    graft.GraftExtensions.register(spark)
    hashes.createOrReplaceTempView("kmv_hashes")
    val got = spark.sql(
      s"SELECT event_type, graft_kmv_sketch(h, $K) AS sk FROM kmv_hashes GROUP BY event_type")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val expect = windowBottomK.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got === expect)
  }
}
