package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions.tokens

/** Data-layout management: the write side of the 100-TB contract. A
  * corpus that will be read thousands of times must be WRITTEN so reads
  * prune — hive-partitioned by the dominant filter column, sorted within
  * partitions so parquet zone maps (min/max stats) skip row groups on
  * the secondary key. PlanGuardsSpec proves the pruning (PartitionFilters
  * + numFiles); the query here makes the layout operator itself a
  * first-class, hash-checked inventory item: values must survive the
  * write→read round trip bit-exactly.
  */
object LayoutQueries {

  /** Deterministic scratch dir per input dataset (sf dirs differ). */
  private def layoutDir(d: String): String =
    "/tmp/graft-layout/" + d.replaceAll("[^A-Za-z0-9.]", "_")

  /** q67: write documents hive-partitioned by `lang` (the dominant
    * filter column: splits, per-language sampling, contamination checks
    * all filter on it), sorted within partitions by `doc_id` for
    * zone-map locality, then read back with a partition filter and
    * aggregate. The read lists only the en/de directories — the scan
    * never touches the other languages' files — and the aggregate must
    * reproduce the source values exactly, proving the layout op is
    * lossless. At 100 TB this is the difference between scanning the
    * whole corpus and scanning 2/|langs| of it on every downstream read.
    */
  val q67PartitionedLayout = NamedQuery(
    "q67_partitioned_layout",
    "Hive-partitioned write of documents by lang (sorted by doc_id " +
      "within partitions), partition-pruned read back of en+de, " +
      "per-lang doc counts and exact token sums.",
    (s, d) => {
      val out = layoutDir(d)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        // lang FIRST: the partitionBy(lang) writer requires ordering on
        // the partition column — with doc_id alone it injects its own
        // lang-only sort and the doc_id order is discarded; with the
        // required column as prefix this sort is used as-is and doc_id
        // order survives into the row groups (the zone-map contract)
        .sortWithinPartitions("lang", "doc_id")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(len(string_split(lower(text),' '))) AS BIGINT)
           |    AS sum_tokens
           |FROM documents WHERE lang IN ('en','de')
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val ZBits = 12

  /** 24-bit Morton (Z-order) interleave of two 12-bit dims — a static
    * sum of 24 shift/mask terms, fully inside whole-stage codegen (no
    * HOF, no UDF).
    */
  private def morton12(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until ZBits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** q90: Z-order curve layout key — multi-dimensional data skipping,
    * the layout complement to q67's single-column hive partitioning.
    * Writing sorted by the Morton interleave of (custkey, order-day)
    * makes every file/row-group's min/max z-range a BOUNDING BOX in
    * BOTH dims, so a 2-D range predicate (customer range × date range)
    * prunes row groups on zone maps alone — one sort key serves two
    * filter columns, where sorting by either column alone leaves the
    * other unclustered. The query materializes the curve's locality
    * contract as checkable numbers: per z-bucket (top-8 z-bits), the
    * per-dim extents stay within the 2^(ZBits-4)-wide quadrant the
    * prefix pins, corpus-wide extents would be 2^ZBits. The interleave
    * itself is integer bit math — bit-identical in any engine.
    */
  val q90ZorderCurve = NamedQuery(
    "q90_zorder_curve",
    "Z-order (Morton) layout key over orders (custkey × order-day, " +
      "12 bits each): per z-bucket row counts and per-dim bounding " +
      "extents — the 2-D zone-map pruning contract.",
    (s, d) => {
      // date-diff in whole days: timezone-free (o_orderdate is NTZ —
      // unix_micros would shift with the session timezone)
      val day = datediff(col("o_orderdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
      Tables.orders(s, d)
        .select((col("o_custkey") % 4096L).as("x"), (day % 4096L).as("y"))
        .withColumn("z", morton12(col("x"), col("y")))
        .withColumn("z_bucket", shiftright(col("z"), 16))
        .groupBy("z_bucket")
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .withColumn("bbox_area",
          (col("max_x") - col("min_x") + 1L) *
            (col("max_y") - col("min_y") + 1L))
        .orderBy("z_bucket")
    },
    Some(s"""WITH pts AS (SELECT o_custkey % 4096 AS x,
            |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
            |      % 4096 AS y
            |  FROM orders),
            |zs AS (SELECT x, y,
            |    list_sum(list_transform(range(0, $ZBits), b ->
            |      (((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b+1))))
            |      AS z
            |  FROM pts)
            |SELECT CAST(z >> 16 AS BIGINT) AS z_bucket, COUNT(*) AS n,
            |  MIN(x) AS min_x, MAX(x) AS max_x,
            |  MIN(y) AS min_y, MAX(y) AS max_y,
            |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS bbox_area
            |FROM zs GROUP BY z >> 16 ORDER BY z_bucket""".stripMargin))

  /** q100: the manifest-versioned managed table
    * ([[graft.sources.ManagedTable]] — the atomic-visibility /
    * time-travel core of the Delta tables the reference materializes
    * into) exercised through the oracle: commit v1, overwrite-commit
    * v2, then read BOTH versions back through their manifests (v1 via
    * time travel after v2 has landed) and aggregate. Values must match
    * the source-table aggregates exactly, proving the manifest read
    * path is lossless and old versions stay intact under overwrite.
    * The crash-safety and concurrency invariants are spec-checked
    * (ManagedTableSpec); this query makes the happy path a
    * hash-checked inventory item.
    */
  val q100ManagedTable = NamedQuery(
    "q100_managed_table",
    "Manifest-versioned table: commit v1 (doc_id<200), commit v2 " +
      "(doc_id<350), read latest + time-travel v1; per-version doc " +
      "counts and exact n_chars sums.",
    (s, d) => {
      val dir = "/tmp/graft-managed/" + d.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // fresh per run: versions are per-run state
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      graft.sources.ManagedTable.commit(docs.filter(col("doc_id") < 200), dir)
      graft.sources.ManagedTable.commit(docs.filter(col("doc_id") < 350), dir)
      Seq(1, 2).map { v =>
        graft.sources.ManagedTable.read(s, dir, Some(v))
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .select(lit(v.toLong).as("version"), col("n_docs"),
            col("sum_chars"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },
    Some("""SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
           |FROM documents WHERE doc_id < 200
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), COUNT(*), CAST(SUM(n_chars) AS BIGINT)
           |FROM documents WHERE doc_id < 350
           |ORDER BY version""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(q67PartitionedLayout, q90ZorderCurve, q100ManagedTable)
}
