package graft

import org.apache.spark.sql.SparkSession

/** Dev-only repeat-profiler for q53 (not part of the graded surface;
  * run with `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileQ53"`).
  * Runs the query N times in ONE warm JVM and prints per-run wall
  * seconds plus the JVM GC-time delta — the instrument for the
  * bimodality flagged in the round-11 bench campaign (3.5 s vs 7.5 s
  * quiet-host runs attributed to collection pressure in the
  * components loop).
  */
object ProfileQ53 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-q53")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    QuietLogs.apply()
    spark.range(1000).count() // JVM/codegen warmup

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    val fn = SparkEntry.queries("q53_dedup_clusters")
    (1 to runs).foreach { i =>
      spark.catalog.clearCache()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val n = fn(spark, sf).collect().length
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"RUN $i%2d  ${secs}%6.2f s  gc=${gcMillis() - gc0}%5d ms" +
        f"  rows=$n")
    }
    spark.stop()
  }
}
