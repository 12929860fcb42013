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

  /** Manifest content: first line the committer tag (may be empty),
    * second line the JSON file list. The tag lives INSIDE the file —
    * the manifest NAME is always `v<N>.json`, so create-if-absent
    * arbitrates every committer regardless of tag.
    */
  private def readManifest(spark: SparkSession, dir: String,
      v: Int): (String, Seq[String]) = {
    val f = fs(spark, dir)
    val in = f.open(new Path(manifestDir(dir), s"v$v.json"))
    val raw = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
    val (tag, list) = raw.split("\n", 2) match {
      case Array(t, l) => (t, l)
      case Array(l) => ("", l)
    }
    val files = list.trim.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .filter(_.nonEmpty).map(_.trim.stripPrefix("\"").stripSuffix("\""))
    (tag, files)
  }

  /** Write `df` as the table's next version. The data lands in a fresh
    * immutable segment directory first; the version becomes VISIBLE
    * only when the manifest file is created (create-fails-if-exists —
    * a concurrent committer racing to the same version number loses
    * cleanly and must retry on top of the new state).
    *
    * `tag`: opaque committer metadata recorded in the manifest name
    * (`v<N>.<tag>.json`) — the streaming sink stores the micro-batch id
    * there to make replayed batches detectable.
    */
  def commit(df: DataFrame, dir: String, tag: String = ""): Int = {
    require(!tag.contains("\n"), s"ManagedTable.commit: invalid tag '$tag'")
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
    val manifest = tag + "\n" +
      files.map(p => "\"" + p + "\"").mkString("[", ",", "]")
    f.mkdirs(manifestDir(dir))
    // create(..., overwrite = false): atomic claim of version `next`
    val out = f.create(new Path(manifestDir(dir), s"v$next.json"), false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    next
  }

  /** Committer tags in version order (empty string where untagged). */
  def tags(spark: SparkSession, dir: String): Seq[(Int, String)] =
    versions(spark, dir).map(v => v -> readManifest(spark, dir, v)._1)

  /** Streaming append sink: each micro-batch commits as one table
    * version tagged `b<batchId>`. EXACTLY-ONCE across restarts by
    * idempotence: foreachBatch can replay a batch after a crash, but a
    * replayed id is already present in the manifest tags and is
    * skipped — the pair (checkpointed source offsets, tagged manifest
    * log) is precisely the two-ledger design of the reference's Delta
    * streaming sink. Start with `.option("checkpointLocation", …)` and
    * any trigger.
    */
  def streamingSink(stream: DataFrame, dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val done = tags(spark, dir).exists(_._2 == s"b$batchId")
      if (!done) { commit(batch, dir, s"b$batchId"); () }
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
    val files = readManifest(spark, dir, v)._2
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
      readManifest(spark, dir, v)._2.map(_.split("/")(1))
    }.toSet
    val orphans = f.listStatus(dataDir).toSeq
      .map(_.getPath.getName)
      .filterNot(referenced)
    orphans.foreach(seg => f.delete(new Path(dataDir, seg), true))
    orphans.sorted
  }
}
