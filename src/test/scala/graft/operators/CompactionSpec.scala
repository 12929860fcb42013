package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The small-files problem: a table written under high parallelism
  * fragments into one file per task; every later scan pays per-file
  * open/footer cost. Compaction = deterministic repartition + sorted
  * rewrite with a file-size cap — content must be bit-exact, file count
  * bounded, and sort order preserved within files (zone-map friendly).
  */
class CompactionSpec extends SparkSpec {

  test("compaction: 32-file fragmented table rewrites to <= 4 sorted files, content bit-exact") {
    val src = graft.Tables.documents(spark, sf("sf0.001"))
    val frag = Files.createTempDirectory("graft-frag").toString
    val comp = Files.createTempDirectory("graft-comp").toString
    // fragment: one file per task at width 32
    src.repartition(32).write.mode("overwrite").parquet(frag)
    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles > 16, s"expected fragmentation, got $fragFiles files")
    // compact: 4 output tasks, doc_id-sorted within files, size-capped
    spark.read.parquet(frag)
      .repartition(4)
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000000)
      .parquet(comp)
    val compFiles = new java.io.File(comp).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(compFiles <= 4, s"expected <= 4 files, got $compFiles")
    // content bit-exact (set equality on every column)
    val a = src.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(comp).orderBy("doc_id").collect().toSeq
    assert(b === a)
    // within-file ordering: each file's doc_ids are sorted (parquet
    // zone maps only help when writes are sorted)
    val perFile = spark.read.parquet(comp)
      .select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rows =>
      val ids = rows.map(_.getLong(1)).toSeq
      assert(ids == ids.sorted)
    }
  }
}
