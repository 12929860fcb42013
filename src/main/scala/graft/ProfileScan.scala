package graft

import org.apache.spark.sql.SparkSession

/** Profiling tool (not part of the graded surface): times a WIDE bulk
  * scan of one managed table through the two read paths —
  * `ManagedTable.read` (Spark's file-source vectorized parquet scan)
  * vs `spark.read.format("graft")` (the DSv2 connector, vectorized
  * since round 11) — to pin the connector's per-byte decode parity.
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.ProfileScan [reps]"
  */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    QuietLogs()

    val dir = Scratch.dir("profscan", sfDir)
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    // a wide table: full documents (text payload) + embeddings joined —
    // the q201 bulk-scan shape, several segments
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCAN_REP", "1").toInt
    val wide0 = docs.join(emb, docs("doc_id") === emb("vec_id"), "left")
      .drop("vec_id")
    // optional replication so decode cost dominates fixed overheads
    val wide =
      if (rep <= 1) wide0
      else wide0.crossJoin(
          spark.range(rep).select(col("id").as("__rep")))
        .withColumn("doc_id",
          col("doc_id") * rep + col("__rep")).drop("__rep")
    (0 until 4).foreach { i =>
      graft.sources.ManagedTable.appendCommit(
        wide.filter(pmod(col("doc_id"), lit(4)) === i).coalesce(2), dir)
    }

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(runs.size / 2)
      println(f"[profscan] $label%-12s median $med%.3f s  (runs: " +
        runs.map(r => f"$r%.2f").mkString(" ") + ")")
      med
    }

    // warm both paths once
    graft.sources.ManagedTable.read(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.read.format("graft").load(dir)
      .write.format("noop").mode("overwrite").save()

    val path = time("path-read") {
      graft.sources.ManagedTable.read(spark, dir) }
    val conn = time("connector") {
      spark.read.format("graft").load(dir) }
    println(f"[profscan] connector/path ratio: ${conn / path}%.3f")

    // trickle-delete leg: a DV'd version must stay on the vectorized
    // reader (round-12 selection-view decode) at near-parity cost —
    // before, one tombstone dropped the whole scan to the row reader
    graft.sources.ManagedTable.deleteWhere(spark, dir,
      pmod(col("doc_id"), lit(97)) === 3)
    val dvDf = spark.read.format("graft").load(dir)
    dvDf.write.format("noop").mode("overwrite").save() // warm
    println("[profscan] DV'd scan columnar: " +
      dvDf.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val dv = time("connector+dv") {
      spark.read.format("graft").load(dir) }
    println(f"[profscan] connector+dv/path ratio: ${dv / path}%.3f")
    spark.stop()
  }
}
