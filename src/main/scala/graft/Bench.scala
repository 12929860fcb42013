package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stale checkpoints from earlier harness runs sit on the same disk and
    // measurably inflate stateful-query times; start from a clean slate
    streaming.StreamingOps.deleteCheckpoint(spark, "/tmp/graft-ckpt")
    // JIT/codegen warmup on the smallest SF so the first measured query
    // doesn't absorb JVM startup cost; not reported
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces FULL evaluation of every output column —
      // count() would let Spark skip projected expressions (e.g. cosine
      // values) and under-report query cost
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // operators may cache intermediates (e.g. LSH band tables); clear
      // between queries so earlier caches don't distort later timings
      spark.catalog.clearCache()
      // -1 marks a failed query: a throw must never look like a fast pass
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
