package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: time individual SparkEntry queries (noop sink, same as Bench)
  * without paying for the full suite. Each query runs `reps` times so JIT
  * warm-up can be separated from steady-state cost.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <cpus> <reps> <query>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val reps = args(2).toInt
    val names = args.drop(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
