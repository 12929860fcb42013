package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.util.{Collections, LinkedHashMap => JLinkedHashMap, Map => JMap}

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions.{col, lit, xxhash64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BLOOM-FILTER FILE SKIPPING — per-file membership digests for the
  * columns a table declares under `graft.bloomFilterColumns`, probed
  * by equality/IN planning-time pruning and by join-driven runtime
  * file pruning wherever the min/max zone maps cannot help.
  *
  * Why this exists at 100 TB: min/max stats prune RANGE-clustered
  * layouts, but a point lookup on a HIGH-CARDINALITY, UNCLUSTERED
  * column (a trace id, a user id on a time-clustered fact table) sees
  * every file's [min, max] span the whole domain — zone maps keep
  * everything and the probe scans the table. A per-file Bloom filter
  * answers "definitely not in this file" for exactly that shape, the
  * same role Delta's Bloom-filter index and Parquet's optional bloom
  * pages play. Design properties:
  *
  *   - SIDECAR, not inline: digests are sized ~1.2 bytes per distinct
  *     value (fpp 1%), far too big for a JSON manifest at 100 TB, so
  *     each (file, column) digest lives in the segment directory
  *     (`<segment>/_bf/<file>.<col>.bf`) and the manifest stats carry
  *     only its relative path under the pseudo-column
  *     `__bf:<physical col>` — the same sidecar discipline as
  *     deletion vectors. Segments are immutable and swept whole, so
  *     vacuum/compaction GC the digests with their segment for free.
  *   - BUILT DISTRIBUTED: one pass over the freshly written segment
  *     hashes values to 64-bit on the executors (`xxhash64` — seed 42,
  *     Spark's codegen'd expression), shuffles ONLY (file, column,
  *     hash) longs, and each group builds + writes its own sidecar
  *     from the task. No driver collect of values, ever; the driver
  *     sees one tiny (file, column, path) row per digest.
  *   - PROBE PARITY BY CONSTRUCTION: the probe hashes the SAME
  *     canonical string render through the SAME function
  *     ([[XXH64.hashUTF8String]], seed 42) that `xxhash64(cast(c as
  *     string))` applied at build, so a present value can never be
  *     missed (false negatives impossible, false positives only make
  *     pruning weaker). Eligible columns are restricted to the types
  *     whose string render is canonical on both sides: integrals and
  *     strings.
  *   - FAIL-OPEN: a missing/corrupt/foreign-versioned sidecar, an
  *     ineligible type, or any IO error keeps the file — identical to
  *     the absent-stats contract everywhere else in the manifest tier.
  *
  * Old segments written before the property was set simply lack the
  * entries (never pruned); a later rename of a digested column leaves
  * existing digests valid (stats key on the PHYSICAL name) but stops
  * new builds until the property names the new logical column.
  */
object BloomSkipping {
  /** Comma-separated LOGICAL column names to digest on every write. */
  val ColumnsProp = "graft.bloomFilterColumns"

  /** Target false-positive rate per digest (default 0.01). */
  val FppProp = "graft.bloomFilterFpp"

  /** Stats pseudo-column prefix: `__bf:<physical col>` →
    * `(sidecar relative path, scheme)`. Invisible to min/max pruning
    * (lookups key on pushed column names) like `__rows`/`__nn:`.
    */
  private[sources] val StatPrefix = "__bf:"

  /** Digest scheme tag — a probe ignores entries it doesn't speak. */
  private[sources] val Scheme = "xx42km"

  private[sources] def statKey(physCol: String): String =
    StatPrefix + physCol

  /** The digest columns recorded in `props` (logical names). */
  private[sources] def bloomColsOf(props: Map[String, String]): Seq[String] =
    props.get(ColumnsProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Types whose string render is canonical and identical between the
    * build side (`cast(c as string)`) and the probe side
    * (`String.valueOf(filter literal)`): integrals and strings.
    * Floats/decimals are excluded — `5.10` vs `5.1` would silently
    * break the no-false-negative contract.
    */
  private[sources] def eligible(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def fppOf(props: Map[String, String]): Double =
    props.get(FppProp).flatMap(s => scala.util.Try(s.toDouble).toOption)
      .filter(p => p > 0 && p < 1).getOrElse(0.01)

  /** Build sidecar digests for freshly written `relFiles` and return
    * the stats entries to merge into the segment's stats map:
    * `rel → (__bf:col → (sidecar rel path, scheme))`. `physCols` are
    * already translated to PHYSICAL names (what the files carry);
    * names absent from the files or of ineligible type are skipped.
    */
  private[sources] def build(spark: SparkSession, dir: String,
      relFiles: Seq[String], physCols: Seq[String],
      props: Map[String, String])
      : Map[String, Map[String, (String, String)]] = {
    if (relFiles.isEmpty || physCols.isEmpty) return Map.empty
    val df = spark.read.parquet(relFiles.map(p => s"$dir/$p"): _*)
    // a user column in the pseudo namespace would collide in the stats
    // map — skip digest recording for that table (same discipline as
    // __rows/__nn:)
    if (df.schema.fieldNames.exists(_.startsWith(StatPrefix)))
      return Map.empty
    val present = physCols.distinct.filter(c =>
      df.schema.fields.exists(f => f.name == c && eligible(f.dataType)))
    if (present.isEmpty) return Map.empty
    val fpp = fppOf(props)
    import spark.implicits._
    // hash to 64-bit ON THE EXECUTORS; the shuffle moves longs, not
    // values — the only per-row payload is (file, column, hash)
    val hashed = present.map { c =>
      df.filter(col(c).isNotNull)
        .select(col("_metadata.file_path").as("_1"), lit(c).as("_2"),
          xxhash64(col(c).cast("string")).as("_3"))
    }.reduce(_ union _).as[(String, String, Long)]
    val dirStr = dir
    val rels = relFiles
    val rows = hashed.groupByKey(r => (r._1, r._2)).mapGroups {
      (key: (String, String), it: Iterator[(String, String, Long)]) =>
        val (abs, c) = key
        // distinct hashes first, then size the digest to the distinct
        // count — duplicates cost a set insert, never digest bits
        val set = new java.util.HashSet[java.lang.Long]()
        it.foreach(r => set.add(r._3))
        val rel = rels.find(abs.endsWith(_)).getOrElse(abs)
        val (k, mBits) = sizeFor(set.size, fpp)
        val words = new Array[Long]((mBits >>> 6).toInt)
        val iter = set.iterator()
        while (iter.hasNext) insert(words, mBits, k, iter.next())
        val sidecar = sidecarRel(rel, c)
        writeSidecar(s"$dirStr/$sidecar", k, mBits, words)
        (rel, c, sidecar)
    }.collect()
    rows.groupBy(_._1).map { case (rel, rs) =>
      rel -> rs.map(r => statKey(r._2) -> (r._3, Scheme)).toMap
    }
  }

  /** May the digested (file, column) contain `value`? TRUE on any
    * uncertainty — foreign scheme, unreadable sidecar, IO error.
    */
  private[sources] def mightContain(dir: String, sidecarRel: String,
      scheme: String, value: String): Boolean = {
    if (scheme != Scheme) return true
    try {
      val (k, mBits, words) = cached(s"$dir/$sidecarRel")
      // EXACTLY the build side's hash: XxHash64(seed 42) over the
      // value's UTF-8 bytes — what xxhash64(cast(c as string)) ran
      val h1 = XXH64.hashUTF8String(UTF8String.fromString(value), 42L)
      val h2 = XXH64.hashLong(h1, 42L)
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
        if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
          return false
        i += 1
      }
      true
    } catch { case NonFatal(_) => true }
  }

  /** Kirsch–Mitzenmacher double hashing: bit_i = (h1 + i·h2) mod m. */
  private def insert(words: Array[Long], mBits: Long, k: Int,
      h1: Long): Unit = {
    val h2 = XXH64.hashLong(h1, 42L)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** (k hashes, m bits — multiple of 64) for `n` distinct values at
    * false-positive rate `p`: the standard m = −n·ln p / ln²2,
    * k = (m/n)·ln 2, floored at one 64-bit word.
    */
  private def sizeFor(n: Int, p: Double): (Int, Long) = {
    val ln2 = math.log(2)
    val m0 = math.ceil(-n.max(1) * math.log(p) / (ln2 * ln2)).toLong
    val mBits = ((m0 + 63) >>> 6) << 6
    val k = math.round(mBits.toDouble / n.max(1) * ln2)
      .max(1L).min(16L).toInt
    (k, mBits)
  }

  /** `data/v7-u/part-0.parquet` + col → `data/v7-u/_bf/part-0.parquet
    * .<enc col>.bf` — inside the segment (underscore-prefixed dirs are
    * invisible to parquet file listing), swept with it.
    */
  private def sidecarRel(rel: String, c: String): String = {
    val enc = java.net.URLEncoder.encode(c, "UTF-8")
    val i = rel.lastIndexOf('/')
    if (i < 0) s"_bf/$rel.$enc.bf"
    else s"${rel.take(i)}/_bf/${rel.drop(i + 1)}.$enc.bf"
  }

  private val Magic = 0x47424631 // "GBF1"

  /** Executor-side sidecar write; overwrite=true makes task retries
    * idempotent (content is deterministic for a given file+column).
    */
  private def writeSidecar(abs: String, k: Int, mBits: Long,
      words: Array[Long]): Unit = {
    val p = new Path(abs)
    val fs = p.getFileSystem(new Configuration())
    val out = new DataOutputStream(fs.create(p, true))
    try {
      out.writeInt(Magic); out.writeInt(k); out.writeLong(mBits)
      var i = 0
      while (i < words.length) { out.writeLong(words(i)); i += 1 }
    } finally out.close()
  }

  private def readSidecar(abs: String): (Int, Long, Array[Long]) = {
    val p = new Path(abs)
    val fs = p.getFileSystem(new Configuration())
    val in = new DataInputStream(fs.open(p))
    try {
      require(in.readInt() == Magic, s"not a graft bloom sidecar: $abs")
      val k = in.readInt()
      val mBits = in.readLong()
      val words = new Array[Long]((mBits >>> 6).toInt)
      var i = 0
      while (i < words.length) { words(i) = in.readLong(); i += 1 }
      (k, mBits, words)
    } finally in.close()
  }

  /** Driver-side digest cache (planning probes run on the driver):
    * LRU over absolute sidecar paths. Segments are immutable, so an
    * entry can never go stale — eviction is purely a size bound.
    */
  private val cache: JMap[String, (Int, Long, Array[Long])] =
    Collections.synchronizedMap(
      new JLinkedHashMap[String, (Int, Long, Array[Long])](64, 0.75f, true) {
        override def removeEldestEntry(
            e: JMap.Entry[String, (Int, Long, Array[Long])]): Boolean =
          size() > 1024
      })

  private def cached(abs: String): (Int, Long, Array[Long]) = {
    val hit = cache.get(abs)
    if (hit != null) hit
    else {
      val loaded = readSidecar(abs)
      cache.put(abs, loaded)
      loaded
    }
  }
}
