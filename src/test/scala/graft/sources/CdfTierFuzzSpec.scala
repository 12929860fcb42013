package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TIER-EQUIVALENCE fuzz for the streaming change feed: the two DV
  * shipping tiers ([[GraftDvReader.DvPlan]] — positions INLINED at
  * plan time vs DV file REFS resolved executor-side per task) must
  * produce bit-identical feeds over ANY feed-representable lifecycle.
  * Each seed drives a randomized interleaving of appends, bulk
  * deleteWheres, and replaceWheres, then drains the WHOLE feed twice
  * — once at the default inline cap and once with the cap forced to 0
  * (pure executor-side) — and asserts both drains equal each other
  * AND the value-level model of every commit's row changes.
  */
class CdfTierFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")

  private type Change = (String, Long, Long, Long) // type, version, k, v

  private def drain(dir: String): Seq[Change] = {
    import org.apache.spark.sql.streaming.Trigger
    val buf = scala.collection.mutable.ArrayBuffer.empty[Change]
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= b.collect().map(r => (
            r.getAs[String]("_change_type"),
            r.getAs[Long]("_commit_version"),
            r.getAs[Long]("k"), r.getAs[Long]("v"))) }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdf-fuzz-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    buf.synchronized { buf.sorted.toVector }
  }

  for (seed <- Seq(7, 23)) {
    test("change feed: inline and executor-resolved tiers are " +
        s"bit-identical and model-exact (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val dir =
        Files.createTempDirectory(s"graft-cdf-fuzz$seed").toString + "/t"
      val expected = scala.collection.mutable.ArrayBuffer.empty[Change]
      var model = Map.empty[Long, Long]
      val init = (0L until 25L).map(k => k -> rnd.nextLong(1000))
      ManagedTable.appendCommit(df(init), dir) // v1
      model = init.toMap
      expected ++= init.map { case (k, x) => ("insert", 1L, k, x) }
      var nextKey = 100L
      for (_ <- 1 to 10) {
        rnd.nextInt(3) match {
          case 0 => // append fresh keys
            val fresh = (0 until 1 + rnd.nextInt(4)).map { _ =>
              nextKey += 1; nextKey -> rnd.nextLong(1000)
            }
            val v = ManagedTable.appendCommit(df(fresh), dir)
            expected ++= fresh.map { case (k, x) =>
              ("insert", v.toLong, k, x) }
            model ++= fresh
          case 1 => // bulk delete of live keys (DV growth)
            val keys = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(4))
            if (keys.nonEmpty) {
              val v = ManagedTable.deleteWhere(spark, dir,
                col("k").isin(keys: _*))
              expected ++= keys.map(k => ("delete", v.toLong, k, model(k)))
              model --= keys
            }
          case 2 => // replaceWhere: delete + insert under ONE version
            val keys = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(3))
            if (keys.nonEmpty) {
              val repl = keys.map(k => k -> rnd.nextLong(1000))
              val v = ManagedTable.replaceWhere(spark, dir,
                col("k").isin(keys: _*), df(repl))
              expected ++= keys.map(k => ("delete", v.toLong, k, model(k)))
              expected ++= repl.map { case (k, x) =>
                ("insert", v.toLong, k, x) }
              model = model ++ repl
            }
        }
      }
      val inlineTier = drain(dir) // default cap: positions inline
      spark.conf.set(GraftDvReader.InlineMaxRowsConf, "0")
      val refsTier =
        try drain(dir) // forced executor-side resolution
        finally spark.conf.unset(GraftDvReader.InlineMaxRowsConf)
      assert(inlineTier == refsTier,
        "DV shipping tiers diverged on the same lifecycle")
      assert(inlineTier == expected.sorted.toVector,
        "change feed diverged from the value-level model")
    }
  }
}
