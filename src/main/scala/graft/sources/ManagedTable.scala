package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest-versioned table over plain parquet — the atomic-
  * visibility core of the lakehouse formats (Delta/Iceberg/Hudi) the
  * reference gets from its managed runtime
  * (notebooks/pipeline.json:28 materializes every DLT table as Delta),
  * re-expressed openly:
  *
  *   dir/
  *     data/v<N>-<uuid>/part-*.parquet   (immutable data segments)
  *     _manifest/v<N>.json               (THE commit: file list per version)
  *
  * Invariants:
  *   - readers resolve the LATEST manifest and read ONLY files it lists
  *     — data files landing without a manifest are invisible, so a
  *     writer crashing mid-write leaves the table bit-identical to the
  *     previous version (crash-safety spec kills the write between data
  *     and manifest);
  *   - the manifest write is a single create of a small file — the
  *     rename-based atomic primitive every object store / HDFS offers;
  *     version numbers are dense, so concurrent committers conflict on
  *     the same v<N> name instead of silently interleaving
  *     (create-if-absent = optimistic concurrency, as Delta's
  *     transaction log);
  *   - every version's file list is retained: `read(dir, Some(v))` is
  *     time travel, `versions` is the history, `vacuum` deletes
  *     segments unreferenced by any retained manifest.
  *
  * At 100 TB: the manifest holds file PATHS (one small JSON per
  * commit), readers plan directly from it (no directory listing of the
  * data tree — the object-store listing cost Delta removes), and
  * overwrite never touches old segments, so concurrent readers of v
  * N−1 are unaffected by the v N writer.
  */
object ManagedTable {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(dir, "_manifest")

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  /** Write `df` as the table's next version. The data lands in a fresh
    * immutable segment directory first; the version becomes VISIBLE
    * only when the manifest file is created (create-fails-if-exists —
    * a concurrent committer racing to the same version number loses
    * cleanly and must retry on top of the new state).
    */
  def commit(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val next = versions(spark, dir).lastOption.getOrElse(0) + 1
    val segment = s"data/v$next-${java.util.UUID.randomUUID()}"
    df.write.mode("error").parquet(s"$dir/$segment")
    val files = f.listStatus(new Path(s"$dir/$segment")).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .sorted
      .map(n => s"$segment/$n")
    val manifest = files.map(p => "\"" + p + "\"").mkString("[", ",", "]")
    f.mkdirs(manifestDir(dir))
    // create(..., overwrite = false): atomic claim of version `next`
    val out = f.create(new Path(manifestDir(dir), s"v$next.json"), false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    next
  }

  /** Read a version (default: latest). Only manifest-listed files are
    * read — never a directory listing of `data/`.
    */
  def read(spark: SparkSession, dir: String,
      version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"ManagedTable.read: no committed versions in $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"ManagedTable.read: version $v not in $vs")
    val f = fs(spark, dir)
    val in = f.open(new Path(manifestDir(dir), s"v$v.json"))
    val raw = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
    val files = raw.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .filter(_.nonEmpty).map(_.trim.stripPrefix("\"").stripSuffix("\""))
    spark.read.parquet(files.map(p => s"$dir/$p"): _*)
  }

  /** Delete data segments unreferenced by ANY committed manifest (e.g.
    * segments from writers that crashed before their manifest landed).
    * Never touches referenced segments, so every retained version stays
    * readable.
    */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val dataDir = new Path(dir, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val referenced = versions(spark, dir).flatMap { v =>
      read(spark, dir, Some(v)) // validates the manifest parses
      val in = f.open(new Path(manifestDir(dir), s"v$v.json"))
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      raw.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .filter(_.nonEmpty)
        .map(_.trim.stripPrefix("\"").stripSuffix("\"").split("/")(1))
    }.toSet
    val orphans = f.listStatus(dataDir).toSeq
      .map(_.getPath.getName)
      .filterNot(referenced)
    orphans.foreach(seg => f.delete(new Path(dataDir, seg), true))
    orphans.sorted
  }
}
