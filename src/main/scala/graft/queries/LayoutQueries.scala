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
    graft.Scratch.dir("layout", d)

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
  private[graft] def morton12(x: org.apache.spark.sql.Column,
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
      val dir = graft.Scratch.dir("managed", d)
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

  /** q115: MERGE — CDC changesets applied INTO the managed table as
    * row-level upsert commits ([[graft.sources.ManagedTable.merge]]),
    * the `apply_changes`-into-Delta write path of the reference
    * (notebooks/03_Data_Ingestion.py:318-326) the snapshot-commit q100
    * doesn't cover. A deterministic 4-changeset history (key =
    * doc_id % 150, sequence = doc_id, every 7th change a tombstone) is
    * merged chunk-by-chunk — each merge rewrites only segments holding
    * changed keys and reuses the rest by manifest reference — then the
    * LIVE state is read back via [[graft.sources.ManagedTable.readCurrent]].
    * The oracle replays the same history as one windowed latest-per-key
    * over the union, proving merge-at-a-time ≡ applyChanges-once (the
    * associativity the stored-tombstone design guarantees).
    */
  val q115MergeUpsert = NamedQuery(
    "q115_merge_upsert",
    "CDC merge into the managed table: 4 chunked changesets (key = " +
      "doc_id % 150, seq = doc_id, %7 tombstones) applied as row-level " +
      "upsert commits; final live state per key.",
    (s, d) => {
      val dir = graft.Scratch.dir("merged", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // fresh per run: versions are per-run state
      val hist = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("lang"), col("n_chars"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
      (0 until 4).foreach { i =>
        graft.sources.ManagedTable.merge(
          hist.filter(col("seq") >= i * 100 && col("seq") < (i + 1) * 100),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")), tag = s"m$i")
      }
      graft.sources.ManagedTable.readCurrent(s, dir,
          deleteExpr = col("op") === "d", exceptColumns = Seq("op"))
        .orderBy("k")
    },
    Some("""WITH h AS (SELECT doc_id % 150 AS k, doc_id AS seq, lang,
           |    n_chars, CASE WHEN doc_id % 7 = 0 THEN 'd' ELSE 'u' END op
           |  FROM documents WHERE doc_id < 400),
           |w AS (SELECT *, row_number() OVER (PARTITION BY k
           |    ORDER BY seq DESC) AS rn FROM h)
           |SELECT k, seq, lang, n_chars FROM w WHERE rn = 1 AND op <> 'd'
           |ORDER BY k""".stripMargin))

  /** q116: manifest-level DATA SKIPPING — the zone-map pruning that
    * makes clustered layout (q67 hive partitions, q90 Z-order) pay off
    * at read time. Documents are committed range-clustered (8 files,
    * tight per-file doc_id bounds recorded as manifest stats); a range
    * probe plans only the stats-matching files
    * ([[graft.sources.ManagedTable.readWhere]]) and must return exactly
    * the rows a full-scan filter would. The oracle is that full-scan
    * filter; the output also carries the planned-file reduction
    * (derived from the deterministic range partitioning) so the pruning
    * itself is hash-checked, not just the row values.
    */
  val q116DataSkipping = NamedQuery(
    "q116_data_skipping",
    "Data skipping via manifest min/max stats: range-clustered commit " +
      "(8 files), doc_id BETWEEN probe planned from stats; per-lang " +
      "aggregates + the files-pruned invariant.",
    (s, d) => {
      val dir = graft.Scratch.dir("skip", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // fresh per run: versions are per-run state
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      graft.sources.ManagedTable.commit(
        docs.repartitionByRange(8, col("doc_id")), dir)
      val (kept, all) = graft.sources.ManagedTable
        .planFiles(s, dir, "doc_id", 100L, 180L)
      // range clustering puts 81 consecutive ids in ≤2 of 8 range files
      // (+1 if a boundary lands mid-range); the probe must never scan
      // more than that — hash-checked as a hard pruning invariant
      val prunedEnough = kept.size <= 3 && kept.size < all.size
      graft.sources.ManagedTable.readWhere(s, dir, "doc_id", 100L, 180L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("pruned", lit(prunedEnough))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS pruned
           |FROM documents WHERE doc_id BETWEEN 100 AND 180
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q120: the lakehouse MAINTENANCE LIFECYCLE as one hash-checked
    * query — what a streaming sink's table needs periodically: a
    * version fragmented into small files (micro-batch aftermath) →
    * `compact` bins them into one segment (content-identical commit) →
    * a stats-pruned range read serves the result. The output carries
    * the layout invariants (5 small files → 1 compacted; versions
    * dense through the rewrite) alongside the aggregates, so the
    * compaction and the post-compaction skipping are themselves
    * oracle-checked, not just spec-checked.
    */
  val q120CompactionLifecycle = NamedQuery(
    "q120_compaction_lifecycle",
    "Maintenance loop: a 5-small-file version compacted to one " +
      "segment, then a stats-pruned range read; per-lang aggregates + " +
      "layout invariants.",
    (s, d) => {
      val dir = graft.Scratch.dir("compact", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // fresh per run: versions are per-run state
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      // the aftermath of 5 micro-batch-sized writes: 5 small files
      graft.sources.ManagedTable.commit(docs.repartition(5), dir)
      val filesBefore = graft.sources.ManagedTable
        .planFiles(s, dir, "doc_id", Long.MinValue, Long.MaxValue)._2.size
      val vCompact = graft.sources.ManagedTable.compact(s, dir)
      val filesAfter = graft.sources.ManagedTable
        .planFiles(s, dir, "doc_id", Long.MinValue, Long.MaxValue)._2.size
      val invariants = filesBefore == 5 && filesAfter == 1 &&
        vCompact == 2 &&
        graft.sources.ManagedTable.versions(s, dir) == Seq(1, 2)
      graft.sources.ManagedTable.readWhere(s, dir, "doc_id", 50L, 300L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("layout_ok", lit(invariants))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS layout_ok
           |FROM documents WHERE doc_id BETWEEN 50 AND 300
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q130: INCREMENTAL VIEW MAINTENANCE — the aggregate table a CDC
    * stream keeps warm without ever recomputing the base: per change
    * batch, the delta is computed from the AFFECTED KEYS ONLY
    * (before-state of changed keys read from the pre-merge version,
    * after-state from the post-merge version — both key-restricted
    * reads, O(batch) not O(table)), signed (+1 after / −1 before), and
    * folded into the tiny per-lang aggregate table as a new commit.
    * Counts and sums are integers, so the additive fold is exact and
    * the final view must BIT-EQUAL the oracle's full recompute of the
    * end state — the IVM correctness contract. The output also pins
    * the maintenance shape: one bootstrap + 3 incremental commits on
    * the view table (`n_view_commits = 4`).
    * At 100 TB: the base merge already plans only key-affected
    * segments; the delta reads reuse exactly those keys, so view
    * maintenance cost tracks changeset size while the view stays a
    * |groups|-row table.
    */
  val q130IncrementalView = NamedQuery(
    "q130_incremental_view",
    "Incremental per-lang aggregate view under 4 CDC merge batches: " +
      "key-restricted before/after deltas folded additively; final " +
      "view ≡ full recompute.",
    (s, d) => {
      val dir = graft.Scratch.dir("ivm", d)
      val aggDir = dir + "-view"
      for (x <- Seq(dir, aggDir)) {
        val p = new org.apache.hadoop.fs.Path(x)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val M = graft.sources.ManagedTable
      val hist = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("lang"), col("n_chars"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
      def live(): org.apache.spark.sql.DataFrame =
        M.readCurrent(s, dir, col("op") === "d", Seq("op"))
      (0 until 4).foreach { i =>
        val chunk = hist.filter(
          col("seq") >= i * 100 && col("seq") < (i + 1) * 100)
        val changed = chunk.select("k").distinct()
        val before =
          if (i == 0) null
          else live().join(changed, "k")
            .select(col("lang"), lit(-1L).as("dn"),
              (-col("n_chars")).as("dc"))
        M.merge(chunk, dir, keys = Seq("k"),
          sequenceBy = Seq(col("seq")), tag = s"m$i")
        val after = live().join(changed, "k")
          .select(col("lang"), lit(1L).as("dn"), col("n_chars").as("dc"))
        val delta = if (before == null) after else after.unionByName(before)
        val oldView =
          if (i == 0) delta.limit(0)
          else M.readCurrent(s, aggDir, lit(false))
            .select(col("lang"), col("n_docs").as("dn"),
              col("sum_chars").as("dc"))
        M.commit(oldView.unionByName(delta)
          .groupBy("lang")
          .agg(sum("dn").as("n_docs"), sum("dc").cast("long").as("sum_chars"))
          .filter(col("n_docs") > 0), aggDir, tag = s"v$i")
      }
      val nCommits = M.versions(s, aggDir).size
      M.readCurrent(s, aggDir, lit(false))
        .withColumn("n_view_commits", lit(nCommits.toLong))
        .orderBy("lang")
    },
    Some("""WITH h AS (SELECT doc_id % 150 AS k, doc_id AS seq, lang,
           |    n_chars, CASE WHEN doc_id % 7 = 0 THEN 'd' ELSE 'u' END op
           |  FROM documents WHERE doc_id < 400),
           |w AS (SELECT *, row_number() OVER (PARTITION BY k
           |    ORDER BY seq DESC) AS rn FROM h),
           |state AS (SELECT lang, n_chars FROM w WHERE rn = 1 AND op <> 'd')
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(4 AS BIGINT) AS n_view_commits
           |FROM state GROUP BY lang ORDER BY lang""".stripMargin))

  /** q146: BUCKETED CO-LOCATED JOIN — the write-time answer to the one
    * shuffle every fact⋈fact query pays. Both tables are written
    * `bucketBy(8, orderkey).sortBy(orderkey)` as external-path tables:
    * rows with equal keys land in equal bucket files, so the join
    * requires NO Exchange and NO per-task sort on either side (bucket
    * files are read pre-sorted) — BucketingSpec pins that plan shape
    * with broadcast disabled; this query makes the operator itself an
    * oracle-checked inventory item: the values must survive the
    * bucketed write → co-located join round trip bit-exactly. At
    * 100 TB this is the difference between re-shuffling the fact
    * tables on EVERY join and paying the partitioning once at ingest —
    * the same trade hive partitioning (q67) makes for filters, made
    * for joins. Revenue is carried in exact BIGINT ten-thousandths
    * (the q128 discipline).
    */
  val q146BucketedJoin = NamedQuery(
    "q146_bucketed_join",
    "Orders and lineitem written bucketBy(8, orderkey) sortBy(orderkey) " +
      "as external tables, then fact-fact joined shuffle-free; " +
      "revenue + line count per order priority.",
    (s, d) => {
      val base = layoutDir(d) + "-buckets"
      val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
      val ordersT = s"graft_b_orders_$suffix"
      val liT = s"graft_b_lineitem_$suffix"
      s.sql(s"DROP TABLE IF EXISTS $ordersT")
      s.sql(s"DROP TABLE IF EXISTS $liT")
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority")
        .write.option("path", s"$base/orders").mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordersT)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
            .multiply(lit(10000)).cast("long").as("rev_e4"))
        .write.option("path", s"$base/lineitem").mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liT)
      s.table(ordersT)
        .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("rev_e4").as("revenue_e4"), count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    CAST(1.0 - l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT))
           |    AS BIGINT) AS revenue_e4,
           |  COUNT(*) AS n_lines
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q151: CLUSTERED COMPACTION (Delta's `OPTIMIZE ... ZORDER BY`) —
    * q120's maintenance loop upgraded from "fewer files" to "fewer
    * files THAT PRUNE". Eight arrival-order micro-batch files each
    * span the full (custkey, day) range, so a day-range probe keeps
    * all 8 (pinned as an invariant in the hash-checked output); compacting
    * with `clusterBy = morton12(custkey, order-day)` range-partitions
    * the rows on the z-curve, so the rebinned segments carry DISJOINT
    * z ranges, per-file min/max extents shrink in BOTH dims (q90's
    * bounding-box contract applied to the write path), and an
    * early-days probe (`day` ∈ [0, 255]) now prunes segments via the
    * manifest zone maps — the invariant column proves (8 kept →
    * strictly fewer kept) across the rewrite, and the aggregate
    * proves the layout change moved no rows. The probe dim and range
    * are chosen for DETERMINISM: range-partition boundaries come from
    * Spark's RangePartitioner SAMPLE (seeded by RDD id, so they
    * jitter with session history), and `day` holds the curve's top
    * interleaved bits, so the `day < 1024` rows form one contiguous
    * z-prefix of ~43% of the table — every slice starting past 50%
    * carries min(day) ≥ 1024 under ANY sampled boundaries and is
    * provably disjoint from the probe. A custkey-side probe would
    * hinge on boundary luck: custkey bits interleave BELOW day bits,
    * so no 1/6 slice is guaranteed inside a custkey-high subregion.
    * At 100 TB this is the nightly OPTIMIZE every streaming
    * ingest needs: arrival order never clusters, and re-clustering
    * cost is bounded by the small-file bytes, never a table rewrite.
    */
  val q151ZorderCompaction = NamedQuery(
    "q151_zorder_compaction",
    "Compaction clustered by the (custkey × order-day) Morton curve: " +
      "arrival-order files never prune, z-clustered segments do; " +
      "pruning + version invariants ride the hash-checked aggregate.",
    (s, d) => {
      val dir = graft.Scratch.dir("zcompact", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // fresh per run: versions are per-run state
      val base = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_e2"),
        col("o_orderpriority"))
      graft.sources.ManagedTable.commit(base.repartition(8), dir)
      val (k0, a0) = graft.sources.ManagedTable
        .planFiles(s, dir, "day", 0L, 255L)
      val totalBytes = a0.map(f =>
        fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$f")).getLen).sum
      // Scale each dim into morton12's 12 bits by an ORDER-PRESERVING
      // right shift sized from the dim's actual max (one driver-side
      // agg — OPTIMIZE computes stats anyway). A modulo wrap would
      // cluster on the residue and leave raw extents corpus-wide;
      // over-shifting one dim would let the other dominate the curve's
      // high bits and the probe dim would never prune.
      val mx = base.agg(max("o_custkey"), max("day")).head()
      def sh(m: Long): Int =
        math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(m) - ZBits)
      val v = graft.sources.ManagedTable.compact(s, dir,
        smallFileBytes = totalBytes / 6 + 1,
        clusterBy = Seq(morton12(
          shiftright(col("o_custkey"), sh(mx.getLong(0))),
          shiftright(col("day"), sh(mx.getLong(1))))))
      // post-compaction probe on the curve's DOMINANT dim (see
      // scaladoc): the upper z-slices carry min(day) >= 1024 under
      // any sampled boundaries, provably disjoint from [0, 255]
      val (k1, a1) = graft.sources.ManagedTable
        .planFiles(s, dir, "day", 0L, 255L)
      val invariants = a0.size == 8 && k0.size == 8 && v == 2 &&
        a1.size >= 4 && k1.size < a1.size &&
        graft.sources.ManagedTable.versions(s, dir) == Seq(1, 2)
      graft.sources.ManagedTable.readWhere(s, dir, "o_custkey", 0L, 511L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum("price_e2").as("sum_price_e2"))
        .withColumn("layout_ok", lit(invariants))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT)) AS BIGINT) AS sum_price_e2,
           |  true AS layout_ok
           |FROM orders WHERE o_custkey BETWEEN 0 AND 511
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q152: CHANGE DATA FEED — Delta's `table_changes` on the manifest
    * log: the row-level difference between two committed versions of a
    * merge-maintained table (insert / delete / update_preimage /
    * update_postimage), here across merge batches 2→4 of the q130-style
    * CDC history. The oracle recomputes both snapshots independently
    * (latest-per-key windows at the two sequence cutoffs) and derives
    * the same feed with a FULL OUTER JOIN — so the feed's exact row
    * set, including the preimage/postimage pairing, is hash-checked
    * cross-engine.
    * At 100 TB: [[graft.sources.ManagedTable.changes]] diffs ONLY the
    * files the two manifests don't share (untouched segments move
    * between versions by reference and can't contribute a change), so
    * the feed costs O(changed data) — the oracle's recompute-both-
    * snapshots join is exactly the full-scan plan this avoids.
    */
  val q152ChangeDataFeed = NamedQuery(
    "q152_change_data_feed",
    "Row-level change feed (insert/delete/update pre+post) between two " +
      "merge versions, planned from manifest file diffs only; oracle " +
      "re-derives it from independent snapshot recomputes.",
    (s, d) => {
      val dir = graft.Scratch.dir("cdf", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val hist = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select((col("doc_id") % 150L).as("k"), col("doc_id").as("seq"),
          col("lang"), col("n_chars"),
          when(col("doc_id") % 7 === 0, lit("d")).otherwise(lit("u"))
            .as("op"))
      (0 until 4).foreach { i =>
        M.merge(hist.filter(
            col("seq") >= i * 100 && col("seq") < (i + 1) * 100),
          dir, keys = Seq("k"), sequenceBy = Seq(col("seq")), tag = s"m$i")
      }
      M.changes(s, dir, 2, 4, Seq("k"),
          deleteExpr = col("op") === "d", exceptColumns = Seq("seq", "op"))
        .orderBy("k", "_change_type")
        .select("_change_type", "k", "lang", "n_chars")
    },
    Some("""WITH h AS (SELECT doc_id % 150 AS k, doc_id AS seq, lang,
           |    n_chars, CASE WHEN doc_id % 7 = 0 THEN 'd' ELSE 'u' END op
           |  FROM documents WHERE doc_id < 400),
           |s1 AS (SELECT k, lang, n_chars FROM (
           |    SELECT *, row_number() OVER (PARTITION BY k
           |      ORDER BY seq DESC) rn FROM h WHERE seq < 200)
           |  WHERE rn = 1 AND op <> 'd'),
           |s2 AS (SELECT k, lang, n_chars FROM (
           |    SELECT *, row_number() OVER (PARTITION BY k
           |      ORDER BY seq DESC) rn FROM h WHERE seq < 400)
           |  WHERE rn = 1 AND op <> 'd'),
           |j AS (SELECT coalesce(s1.k, s2.k) AS k,
           |    s1.lang AS l1, s1.n_chars AS c1,
           |    s2.lang AS l2, s2.n_chars AS c2,
           |    s1.k IS NOT NULL AS has1, s2.k IS NOT NULL AS has2
           |  FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k),
           |ch AS (
           |  SELECT 'insert' AS _change_type, k, l2 AS lang, c2 AS n_chars
           |    FROM j WHERE NOT has1
           |  UNION ALL SELECT 'delete', k, l1, c1 FROM j WHERE NOT has2
           |  UNION ALL SELECT 'update_preimage', k, l1, c1 FROM j
           |    WHERE has1 AND has2 AND (l1 IS DISTINCT FROM l2
           |      OR c1 IS DISTINCT FROM c2)
           |  UNION ALL SELECT 'update_postimage', k, l2, c2 FROM j
           |    WHERE has1 AND has2 AND (l1 IS DISTINCT FROM l2
           |      OR c1 IS DISTINCT FROM c2))
           |SELECT _change_type, k, lang, n_chars FROM ch
           |ORDER BY k, _change_type""".stripMargin))

  /** q163: DELETION VECTORS — row-level delete that rewrites NO data
    * segment (Delta deletion vectors / Iceberg position deletes on the
    * open manifest log): two successive `deleteWhere` commits lay
    * (file, row-position) tombstones next to the data, every read path
    * anti-joins them, and the output PINS the layout invariants the
    * oracle cannot see: the data file list is IDENTICAL across all
    * three versions (`no_rewrite` — the 100 TB point: GDPR-deleting a
    * few rows from multi-GB segments costs O(deleted rows), not a
    * rewrite), time travel to v1 still sees every row, and the version
    * count shows two pure-DV commits. The per-lang aggregate over the
    * live view is the data-level check: it must BIT-EQUAL the oracle's
    * recompute of `documents` minus both delete predicates.
    */
  val q163DeletionVectors = NamedQuery(
    "q163_deletion_vectors",
    "Deletion-vector lifecycle: 2 deleteWhere commits rewrite zero " +
      "data segments (manifest-pinned), reads/time-travel DV-aware; " +
      "live per-lang aggregate ≡ recompute minus deletes.",
    (s, d) => {
      val dir = graft.Scratch.dir("dv", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      val nBase = docs.count()
      M.commit(docs.repartition(4), dir)
      val minLang = docs.agg(min("lang")).head.getString(0)
      M.deleteWhere(s, dir, col("doc_id") % 5 === 0, tag = "gdpr-1")
      M.deleteWhere(s, dir, col("lang") === minLang, tag = "gdpr-2")
      def dataFiles(v: Int) = M.planFiles(s, dir, "doc_id",
        Long.MinValue, Long.MaxValue, Some(v))._2
      val noRewrite = dataFiles(1) == dataFiles(3) &&
        M.versions(s, dir) == Seq(1, 2, 3)
      val timeTravelOk = M.read(s, dir, Some(1)).count() == nBase
      M.read(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("time_travel_ok", lit(timeTravelOk))
        .orderBy("lang")
    },
    Some("""WITH ml AS (SELECT min(lang) AS v FROM documents)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS no_rewrite, true AS time_travel_ok
           |FROM documents, ml
           |WHERE doc_id % 5 <> 0 AND lang <> v
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q165: RESTORE — Delta's `RESTORE TABLE … TO VERSION AS OF` as a
    * METADATA-ONLY commit: after two deleteWhere versions put the
    * table in a "bad" state, `restore(1)` re-publishes v1's exact file
    * list as v4 without reading, copying or rewriting any data
    * segment — the 100 TB undo costs one manifest write. The output
    * pins the invariants the oracle cannot see: v4's planned data
    * files are IDENTICAL to v1's (`no_rewrite`), v4 carries no
    * deletion vectors (the restore target had none), and history is
    * PRESERVED — time travel to v3 still sees the deleted state
    * (`history_preserved`), because restore adds a version rather than
    * truncating the log. The per-lang aggregate over the restored
    * latest view is the data-level check: it must bit-equal the
    * oracle's plain recompute over ALL of `documents`, deletes undone.
    */
  val q165Restore = NamedQuery(
    "q165_restore",
    "RESTORE lifecycle: metadata-only rollback re-publishes v1's file " +
      "list as v4 (no segment rewritten), history stays " +
      "time-travelable; restored per-lang aggregate ≡ full recompute.",
    (s, d) => {
      val dir = graft.Scratch.dir("restore", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      val nBase = docs.count()
      M.commit(docs.repartition(4), dir)
      M.deleteWhere(s, dir, col("doc_id") % 7 === 0, tag = "bad-1")
      M.deleteWhere(s, dir, col("n_chars") < 60, tag = "bad-2")
      val nBad = M.read(s, dir).count() // v3 = the state being undone
      M.restore(s, dir, 1)
      def dataFiles(v: Int) = M.planFiles(s, dir, "doc_id",
        Long.MinValue, Long.MaxValue, Some(v))._2
      val noRewrite = dataFiles(1) == dataFiles(4) &&
        M.versions(s, dir) == Seq(1, 2, 3, 4) &&
        M.tags(s, dir).last._2 == "restore:v1"
      val historyPreserved = M.read(s, dir, Some(3)).count() == nBad &&
        nBad < nBase
      M.read(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("history_preserved", lit(historyPreserved))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS no_rewrite, true AS history_preserved
           |FROM documents
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q179: BACKFILL via replaceWhere — the partition-correction
    * lifecycle every batch pipeline runs (reprocess one slice, swap it
    * atomically): the minimum-lang slice of the table is replaced with
    * corrected rows (n_chars + 1000) in ONE committed version —
    * matching rows tombstoned by deletion vector, replacement landing
    * as a fresh segment in the SAME manifest, so no reader ever sees
    * half a backfill. The output pins what the oracle cannot see:
    * exactly one new version (`atomic`), every pre-backfill data
    * segment still referenced (`no_rewrite` — correcting one slice of
    * a 100 TB table costs O(slice), not a rewrite), and time travel
    * to v1 still reads the uncorrected bytes. The per-lang aggregate
    * over the live view must bit-equal the oracle's recompute with
    * the correction applied to the same slice.
    */
  val q179Backfill = NamedQuery(
    "q179_backfill",
    "replaceWhere backfill lifecycle: one-version atomic slice swap " +
      "(DV tombstones + fresh segment in the same manifest), zero " +
      "data segments rewritten; per-lang aggregate ≡ corrected " +
      "recompute.",
    (s, d) => {
      val dir = graft.Scratch.dir("backfill", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      M.commit(docs.repartition(4), dir)
      val minLang = docs.agg(min("lang")).head.getString(0)
      def dataFiles(v: Int) = M.planFiles(s, dir, "doc_id",
        Long.MinValue, Long.MaxValue, Some(v))._2
      val v1Files = dataFiles(1)
      val corrected = docs.filter(col("lang") === minLang)
        .withColumn("n_chars", col("n_chars") + 1000L)
      M.replaceWhere(s, dir, col("lang") === minLang, corrected,
        tag = "backfill")
      val atomic = M.versions(s, dir) == Seq(1, 2)
      val noRewrite = v1Files.forall(dataFiles(2).contains)
      val timeTravelOk = M.read(s, dir, Some(1))
        .filter(col("n_chars") > 1000).count() == 0
      M.read(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("atomic", lit(atomic))
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("time_travel_ok", lit(timeTravelOk))
        .orderBy("lang")
    },
    Some("""WITH ml AS (SELECT min(lang) AS v FROM documents)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars +
           |    CASE WHEN lang = ml.v THEN 1000 ELSE 0 END) AS BIGINT)
           |    AS sum_chars,
           |  true AS atomic, true AS no_rewrite, true AS time_travel_ok
           |FROM documents, ml
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q201: the DSv2 CONNECTOR on the graded path — `spark.read
    * .format("graft")` ([[graft.sources.GraftDataSource]]) serving an
    * ordinary Catalyst query over a managed table: four range-sliced
    * append segments (per-file doc_id stats), a deletion-vector
    * delete, then a plain `.filter(range)` whose pushed conjuncts
    * prune 2 of 4 files AT PLANNING TIME via the manifest stats
    * (invariant hash-checked through [[graft.sources.ManagedTable
    * .planFilesMulti]], the same bounds the connector derives), with
    * string, long, and array<float> columns all decoded by the
    * connector's parquet Group reader and the DV rows skipped
    * position-wise inside each reader. The oracle recomputes from the
    * raw parquet — any decode, pruning-overreach, or DV miss breaks
    * the hash. At 100 TB: one InputPartition per surviving file, so
    * the scan parallelizes file-per-task and a selective probe plans
    * O(matching files), not O(table).
    */
  val q201ConnectorRead = NamedQuery(
    "q201_connector_read",
    "DSv2 connector read of a managed table: Catalyst-pushed range " +
      "filter prunes 2/4 files via manifest stats, DV rows skipped " +
      "in-reader, string/long/array<float> decode; per-lang " +
      "aggregates vs raw-parquet oracle.",
    (s, d) => {
      val dir = graft.Scratch.dir("dsv2", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val M = graft.sources.ManagedTable
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .withColumn("vec_id", col("doc_id") % 77L)
        .join(broadcast(emb), Seq("vec_id"))
        .select("doc_id", "lang", "text", "n_chars", "embedding")
      (0 until 4).foreach { i =>
        M.appendCommit(docs.filter(col("doc_id") >= i * 125 &&
          col("doc_id") < (i + 1) * 125).coalesce(1), dir)
      }
      M.deleteWhere(s, dir, col("doc_id") % 11 === 3)
      // the same bounds the connector's pushFilters derives — planned
      // here as a metadata-only invariant so the 2/4 pruning is part
      // of the hashed result, not just an explain artifact
      val (kept, all) = M.planFilesMulti(s, dir,
        Seq(("doc_id", Some(130L), Some(369L))))
      val pruned = kept.size == 2 && all.size == 4
      s.read.format("graft").load(dir)
        .filter(col("doc_id") >= 130 && col("doc_id") <= 369)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(length(col("text"))).cast("long").as("sum_text_len"),
          sum(size(col("embedding"))).cast("long").as("sum_emb_len"))
        .withColumn("pruned", lit(pruned))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
           |  CAST(SUM(len(e.embedding)) AS BIGINT) AS sum_emb_len,
           |  true AS pruned
           |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id % 77
           |WHERE d.doc_id BETWEEN 130 AND 369 AND d.doc_id % 11 <> 3
           |  AND d.doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q202: the connector's STREAMING side on the graded path —
    * `spark.readStream.format("graft")` ([[graft.sources
    * .GraftDataSource]]'s MicroBatchStream): a managed table built as
    * four appended versions streams back as four micro-batches
    * (offsets ARE table versions, `maxVersionsPerTrigger=1`,
    * Trigger.AvailableNow drains to the pinned head), each batch
    * landing in a second managed table through the tag-idempotent
    * streaming append. The returned frame aggregates the LANDED table
    * per lang with the batch-count invariant folded in, and the
    * oracle recomputes from raw parquet — a dropped, duplicated, or
    * mis-sliced micro-batch breaks the hash, and a replayed batch
    * hitting the idempotence tag proves the exactly-once pairing of
    * Spark's offset log with the manifest tags. This is the reading
    * half of the table-streaming contract whose writing half is
    * [[graft.sources.ManagedTable.streamingSink]] — together: table →
    * stream → table with no transport outside the table format, the
    * medallion hop a 100 TB pipeline runs between layers.
    */
  val q202ConnectorStream = NamedQuery(
    "q202_connector_stream",
    "readStream.format(\"graft\"): four appended versions drain as " +
      "four version-offset micro-batches into a tag-idempotent " +
      "managed sink; per-lang aggregates of the landed table + batch " +
      "accounting vs raw-parquet oracle.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = graft.sources.ManagedTable
      val root = graft.Scratch.dir("dsv2stream", d)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val (src, sink) = (s"$root/src", s"$root/sink")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
      (0 until 4).foreach { i =>
        M.appendCommit(docs.filter(col("doc_id") >= i * 125 &&
          col("doc_id") < (i + 1) * 125).coalesce(1), src)
      }
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", 1).load(src)
        .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame,
            id: Long) =>
          M.idempotentAppend(b, sink, id); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // one version-offset micro-batch per source version, each landed
      // as one tagged sink version — the accounting the oracle pins
      val batchesOk = M.versions(s, sink).size == 4
      M.read(s, sink)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .withColumn("batches_ok", lit(batchesOk))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  COUNT(DISTINCT doc_id) AS n_distinct,
           |  true AS batches_ok
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q203: the connector's WRITE side on the graded path —
    * `df.write.format("graft")` ([[graft.sources.GraftDataSource]]'s
    * DSv2 BatchWrite): a first append CREATES the table (two
    * range-partitioned tasks → two segment files with per-file
    * doc_id stats, written by executors through the parquet Group
    * API), a second append adds a version, a DV delete lands on top,
    * and the result is consumed by the OTHER reader — the vectorized
    * `ManagedTable.readWhere` — with the connector-written stats
    * driving its file pruning. Cross-writer/cross-reader round-trip:
    * if the Group-API layout deviated from Spark's parquet layout,
    * the stats rendering deviated from the DataFrame writers', or
    * the manifest assembly mislabeled a version, the vectorized
    * read, the pruning invariant, or the oracle hash would break.
    * At 100 TB: executors stream rows straight to segment files
    * (no driver funnel), and visibility is one manifest write —
    * the same two-phase commit every ManagedTable writer uses.
    */
  val q203ConnectorWrite = NamedQuery(
    "q203_connector_write",
    "df.write.format(\"graft\"): create-by-first-append + second " +
      "append + DV delete; vectorized readWhere prunes on the " +
      "connector-written per-file stats; per-source aggregates vs " +
      "raw-parquet oracle.",
    (s, d) => {
      val M = graft.sources.ManagedTable
      val dir = graft.Scratch.dir("dsv2write", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "source", "n_chars")
      docs.filter(col("doc_id") < 250)
        .repartitionByRange(2, col("doc_id"))
        .write.format("graft").mode("append").save(dir)
      docs.filter(col("doc_id") >= 250)
        .repartitionByRange(2, col("doc_id"))
        .write.format("graft").mode("append").save(dir)
      M.deleteWhere(s, dir, col("doc_id") % 13 === 2)
      val (kept, all) = M.planFiles(s, dir, "doc_id", 260L, 480L)
      // four task files with disjoint ranges; [260,480] spans the two
      // upper ones — connector-written stats must prune the rest
      val pruned = kept.size == 2 && all.size == 4
      val lifecycleOk = M.versions(s, dir) == Seq(1, 2, 3)
      M.readWhere(s, dir, "doc_id", 260L, 480L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("pruned", lit(pruned))
        .withColumn("lifecycle_ok", lit(lifecycleOk))
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS pruned, true AS lifecycle_ok
           |FROM documents
           |WHERE doc_id BETWEEN 260 AND 480 AND doc_id % 13 <> 2
           |GROUP BY source ORDER BY source""".stripMargin))

  /** q204: the FULL DSv2 pipe — `readStream.format("graft")` →
    * `writeStream.format("graft")` with NO user code in between (no
    * foreachBatch, no helper calls): Spark's own micro-batch engine
    * moves four appended source versions through four epochs, the
    * native sink ([[graft.sources.GraftDataSource]]'s StreamingWrite)
    * committing each epoch as one `b<epoch>`-tagged sink version with
    * executor-written segment files. This is the medallion hop
    * (bronze→silver) expressed purely in the table format's own
    * connector — the two-ledger exactly-once pairing (offset log ↔
    * manifest tags) holds with zero application code, which is the
    * strongest form of the q22/q27 replay discipline this repo
    * proves. The oracle recomputes from raw parquet; version/tag
    * accounting is folded into the hashed output.
    */
  val q204ConnectorPipe = NamedQuery(
    "q204_connector_pipe",
    "Pure DSv2 pipe: readStream graft -> writeStream graft (no user " +
      "code), one tagged sink version per epoch; per-lang aggregates " +
      "of the piped table + version/tag accounting vs raw oracle.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = graft.sources.ManagedTable
      val root = graft.Scratch.dir("dsv2pipe", d)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val (src, sink) = (s"$root/src", s"$root/sink")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
      (0 until 4).foreach { i =>
        M.appendCommit(docs.filter(col("doc_id") >= i * 125 &&
          col("doc_id") < (i + 1) * 125).coalesce(1), src)
      }
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", 1).load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start(sink)
      q.awaitTermination()
      val accounting = M.versions(s, sink) == Seq(1, 2, 3, 4) &&
        M.tags(s, sink).map(_._2) == Seq("b0", "b1", "b2", "b3")
      M.read(s, sink)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .withColumn("accounting_ok", lit(accounting))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  COUNT(DISTINCT doc_id) AS n_distinct,
           |  true AS accounting_ok
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q205: the NAME-BASED SQL surface — [[graft.sources.GraftCatalog]]
    * (a DSv2 TableCatalog over the [[graft.sources.ManagedTable]]
    * directory layout) serving pure SQL with no path in sight:
    * CREATE NAMESPACE → CTAS from the corpus → INSERT INTO → SELECT,
    * all by `catalog.ns.table` name. The catalog is stateless glue
    * (identifier → directory is a pure function), so the invariants
    * fold in what that buys: the path API sees the SQL writes as
    * ordinary manifest versions (create + CTAS-append + insert =
    * versions 1-3), and `SELECT count(*)` by name answers from the
    * manifest alone (GraftAggScan, zero data files read). At 100 TB
    * the statelessness is the point — any number of drivers resolve
    * the same names onto the same manifest log with no catalog
    * service between them, and the count-by-name is a metadata
    * lookup, not a scan. Reference anchor: the CREATE CATALOG/SCHEMA/
    * TABLE DDL of /root/reference/notebooks/01_Environment_Setup
    * .py:21-38.
    */
  val q205CatalogSql = NamedQuery(
    "q205_catalog_sql",
    "GraftCatalog name-based SQL: CREATE NAMESPACE + CTAS + INSERT " +
      "INTO + SELECT by catalog.ns.table; path API sees versions " +
      "1-3; count(*) by name answers manifest-only (GraftAggScan); " +
      "per-lang aggregates vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("catwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      // catalog name keyed to the warehouse: Spark caches catalog
      // instances by name after first use, so a session running
      // several datasets must get one catalog per warehouse root
      val cat = "gq205_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 2000)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q205_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs AS " +
        "SELECT * FROM q205_docs WHERE doc_id < 1500")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT * FROM q205_docs WHERE doc_id >= 1500")
      // manifest-only count by name: plan must carry GraftAggScan and
      // the value must equal the oracle's recount (hash-folded below)
      val cq = s.sql(s"SELECT count(*) AS n FROM $cat.corpus.docs")
      val metaCount = cq.collect().head.getLong(0)
      val aggPushed = cq.queryExecution.executedPlan.toString
        .contains("GraftAggScan")
      val versionsOk = graft.sources.ManagedTable
        .versions(s, s"$wh/corpus/docs") == Seq(1, 2, 3)
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("meta_count", lit(metaCount))
        .withColumn("agg_pushed", lit(aggPushed))
        .withColumn("versions_ok", lit(versionsOk))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  (SELECT COUNT(*) FROM documents WHERE doc_id < 2000)
           |    AS meta_count,
           |  true AS agg_pushed, true AS versions_ok
           |FROM documents WHERE doc_id < 2000
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q206: the connector's OPTIMIZER TIER on the graded path — two
    * scan-elision capabilities a 100 TB table lives or dies by:
    *
    *   1. MANIFEST-ONLY AGGREGATES ([[org.apache.spark.sql.connector
    *      .read.SupportsPushDownAggregates]]): a global
    *      count/min/max over the table answers from the per-file
    *      stats the manifest already carries — the plan is a
    *      [[graft.sources.GraftAggScan]] emitting ONE precomputed
    *      row, zero data files opened, no aggregate node left in the
    *      plan (complete pushdown). Delta's count-from-log fast path,
    *      re-expressed through Spark's own pushdown seam.
    *   2. JOIN-DRIVEN RUNTIME FILE PRUNING ([[org.apache.spark.sql
    *      .connector.read.SupportsRuntimeV2Filtering]]): when a
    *      selective dim side materializes, its key values reach the
    *      fact scan as runtime IN/= predicates and drop every file
    *      whose [min,max] can contain none of them — checked here
    *      structurally (4 segments → 1 survives an IN over one
    *      segment's keys; 0 survive an impossible key), the
    *      deterministic core the planner's DPP rides on.
    *
    * Both checks fold into the hashed row next to the aggregate
    * values themselves, recomputed by the oracle from raw parquet —
    * a stale stats entry, a DV leak, or an over-pruned file breaks
    * the hash, not just a plan assertion.
    */
  val q206MetadataAgg = NamedQuery(
    "q206_metadata_agg",
    "Scan-elision tier: global count/min/max answered manifest-only " +
      "(GraftAggScan, zero files, no aggregate node) + runtime IN/= " +
      "file pruning 4->1 and 4->0; values + invariants hashed vs " +
      "raw-parquet oracle.",
    (s, d) => {
      val M = graft.sources.ManagedTable
      val dir = graft.Scratch.dir("metaagg", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
      (0 until 4).foreach { i =>
        M.appendCommit(docs.filter(col("doc_id") >= i * 125 &&
          col("doc_id") < (i + 1) * 125).coalesce(1), dir)
      }
      val q = s.read.format("graft").load(dir)
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"),
          min("lang").as("min_lang"), max("lang").as("max_lang"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
      q.collect() // finalize the adaptive plan before reading it
      val plan = q.queryExecution.executedPlan.toString
      val aggPushed = plan.contains("GraftAggScan") &&
        plan.contains("filesRead=0") && !plan.contains("HashAggregate")
      // runtime pruning, structurally: the scan the planner's dynamic
      // pruning drives, fed the same IN/= predicates it would inject
      import org.apache.spark.sql.connector.expressions.Expressions
      import org.apache.spark.sql.connector.expressions.filter.Predicate
      val meta = graft.sources.GraftTableMeta.resolve(dir, None)
      def freshScan() = new graft.sources.GraftScanBuilder(meta)
        .build().asInstanceOf[graft.sources.GraftScan]
      val sOne = freshScan()
      sOne.filter(Array(new Predicate("IN", Array(
        Expressions.column("doc_id"),
        Expressions.literal(130L), Expressions.literal(170L)))))
      val sNone = freshScan()
      sNone.filter(Array(new Predicate("=", Array(
        Expressions.column("doc_id"), Expressions.literal(100000L)))))
      val runtimePruned =
        freshScan().planInputPartitions().length == 4 &&
          sOne.planInputPartitions().length == 1 &&
          sNone.planInputPartitions().length == 0
      q.withColumn("agg_pushed", lit(aggPushed))
        .withColumn("runtime_pruned", lit(runtimePruned))
    },
    Some("""SELECT COUNT(*) AS n_docs,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id,
           |  min(lang) AS min_lang, max(lang) AS max_lang,
           |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           |  true AS agg_pushed, true AS runtime_pruned
           |FROM documents WHERE doc_id < 500""".stripMargin))

  /** q207: the scan-elision tier, part two — `COUNT(col)` and LIMIT:
    *
    *   1. `COUNT(col)` answers manifest-only: the stats pass records
    *      each column's per-file NON-NULL count next to its min/max
    *      ([[graft.sources.ManagedTable.nnStat]]), so the null-skip
    *      semantics of `COUNT(col)` sum exactly from metadata —
    *      pushed through the same provably-exact gate as q206's
    *      `COUNT(*)` (no filters/grouping/DVs, every file covered).
    *   2. LIMIT plans a FILE PREFIX ([[org.apache.spark.sql.connector
    *      .read.SupportsPushDownLimit]]): an unordered `LIMIT n`
    *      needs any n rows, so the scan keeps only the shortest file
    *      prefix whose LIVE row count (manifest counts minus DV
    *      positions) covers n — `SELECT * FROM t LIMIT 10` on a
    *      100 TB table plans one file, not one task per segment. The
    *      invariant here runs against a DV'd table (50 of 500 rows
    *      tombstoned), so sufficiency is proven over live rows, and
    *      partial-pushdown semantics keep Spark's own limit on top —
    *      exactly 130 rows come back.
    *
    * Both invariants fold into the hashed row with the counts
    * themselves, recomputed by the oracle from raw parquet.
    */
  val q207LimitCount = NamedQuery(
    "q207_limit_count",
    "Scan-elision part two: COUNT(col) answered from per-file " +
      "non-null counts (GraftAggScan); LIMIT 130 over a DV'd table " +
      "plans a live-row-sufficient 2/4 file prefix; counts + " +
      "invariants hashed vs raw-parquet oracle.",
    (s, d) => {
      val M = graft.sources.ManagedTable
      val root = graft.Scratch.dir("limcnt", d)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val (dirA, dirB) = (s"$root/a", s"$root/b")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select(col("doc_id"), col("lang"),
          when(col("doc_id") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("n_chars")).as("maybe"))
      (0 until 4).foreach { i =>
        val slice = docs.filter(col("doc_id") >= i * 125 &&
          col("doc_id") < (i + 1) * 125).coalesce(1)
        M.appendCommit(slice, dirA)
        M.appendCommit(slice.select("doc_id", "lang"), dirB)
      }
      M.deleteWhere(s, dirB, col("doc_id") % 10 === 7)
      // COUNT(*) + COUNT(col) by name, manifest-only (plan-folded)
      val agg = s.read.format("graft").load(dirA)
        .agg(count(lit(1)).as("n_total"),
          count(col("maybe")).as("n_maybe"))
      agg.collect()
      val aggPushed = agg.queryExecution.executedPlan.toString
        .contains("GraftAggScan")
      // LIMIT over the DV'd table: live-sufficient 2-file prefix
      val lim = s.read.format("graft").load(dirB).limit(130)
        .agg(count(lit(1)).as("n_limited"))
      lim.collect()
      val planB = lim.queryExecution.executedPlan.toString
      val limitPushed = planB.contains("pushedLimit=130") &&
        planB.contains("files=2/4")
      agg.crossJoin(broadcast(lim))
        .withColumn("agg_pushed", lit(aggPushed))
        .withColumn("limit_pushed", lit(limitPushed))
    },
    Some("""SELECT
           |  (SELECT COUNT(*) FROM documents WHERE doc_id < 500)
           |    AS n_total,
           |  (SELECT COUNT(*) FROM documents
           |   WHERE doc_id < 500 AND doc_id % 7 <> 0) AS n_maybe,
           |  CAST(130 AS BIGINT) AS n_limited,
           |  true AS agg_pushed, true AS limit_pushed""".stripMargin))

  /** q208: TOP-N FILE PRUNING ([[org.apache.spark.sql.connector.read
    * .SupportsPushDownTopN]]) on the graded path — the "latest k"
    * query every event/ingest table serves constantly: `ORDER BY
    * doc_id DESC LIMIT 10` over four range-clustered segments plans
    * ONE file, proven sound from manifest facts alone (per-file
    * [min,max] + non-null counts + DV sizes; see GraftScan.selectTopN
    * for the out-ranking argument). A DV delete tombstones the five
    * newest rows first, so the invariant also pins DV-conservative
    * coverage: the top file's PROVABLE live non-nulls (count minus
    * ALL its tombstones) still cover n, and the returned rows are the
    * live top-10 — a stats-only pruner that ignored DVs would return
    * deleted rows and break the hash. At 100 TB with time-clustered
    * ingest (or q151's OPTIMIZE), "newest 10" reads one segment
    * instead of launching one task per file — the elision that makes
    * dashboards and tail-probes free. Partial pushdown: Spark still
    * sorts + limits the survivors, so pruning is advisory.
    */
  val q208TopnPushdown = NamedQuery(
    "q208_topn_pushdown",
    "SupportsPushDownTopN: ORDER BY doc_id DESC LIMIT 10 over four " +
      "range-clustered segments plans 1/4 files, DV-conservative " +
      "(five newest rows tombstoned); live top-10 rows + plan " +
      "invariants hashed vs raw-parquet oracle.",
    (s, d) => {
      val M = graft.sources.ManagedTable
      val dir = graft.Scratch.dir("topn", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
      (0 until 4).foreach { i =>
        M.appendCommit(docs.filter(col("doc_id") >= i * 125 &&
          col("doc_id") < (i + 1) * 125).coalesce(1), dir)
      }
      M.deleteWhere(s, dir, col("doc_id") >= 495)
      val q = s.read.format("graft").load(dir)
        .orderBy(col("doc_id").desc).limit(10)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val pruned = plan.contains("pushedTopN=doc_id:desc:10") &&
        plan.contains("files=1/4")
      // re-pin output order after the Project (10 rows)
      q.withColumn("topn_pruned", lit(pruned))
        .orderBy(col("doc_id").desc)
    },
    Some("""SELECT doc_id, lang, n_chars, true AS topn_pruned
           |FROM documents WHERE doc_id < 495
           |ORDER BY doc_id DESC LIMIT 10""".stripMargin))

  /** q209: SQL `DELETE FROM` by name — [[graft.sources.GraftTable]]'s
    * [[org.apache.spark.sql.connector.catalog.SupportsDelete]] under
    * the [[graft.sources.GraftCatalog]]: the WHERE clause is
    * translated EXACTLY to a Catalyst predicate (untranslatable
    * conditions refuse at analysis — row-level semantics never ride
    * the stats may-contain test) and lands as a DELETION-VECTOR
    * version: no data file rewritten, versions 1-3 = create + CTAS
    * append + DV delete, visible identically to the path API. The
    * invariants also pin the NEGATIVE pushdown proof: after the DV,
    * `count(*)` by name correctly REFUSES the manifest-only fast
    * path (a tombstoned row could be the count's error) and falls
    * back to the real scan — exactness gating is hash-checked, not
    * just asserted in a spec. At 100 TB: DELETE costs one scan of
    * matching files + a metadata commit; `compact` (q120/q151)
    * materializes the tombstones later.
    */
  val q209SqlDelete = NamedQuery(
    "q209_sql_delete",
    "SQL DELETE FROM via the catalog: exact predicate -> DV version " +
      "(no rewrite), path-API parity, and the negative proof that " +
      "count(*) pushdown refuses under DVs; per-lang aggregates vs " +
      "raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("delwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq209_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q209_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs AS SELECT * FROM q209_docs")
      s.sql(s"DELETE FROM $cat.corpus.docs " +
        "WHERE doc_id < 100 OR doc_id >= 400")
      val dir = s"$wh/corpus/docs"
      val versionsOk = graft.sources.ManagedTable
        .versions(s, dir) == Seq(1, 2, 3)
      val pathParity = graft.sources.ManagedTable
        .read(s, dir).count() == 300L
      // negative pushdown proof: DVs make manifest counts unprovable
      val cq = s.sql(s"SELECT count(*) AS n FROM $cat.corpus.docs")
      val dvRefusesPush = cq.collect().head.getLong(0) == 300L &&
        !cq.queryExecution.executedPlan.toString.contains("GraftAggScan")
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("versions_ok", lit(versionsOk))
        .withColumn("path_parity", lit(pathParity))
        .withColumn("dv_refuses_push", lit(dvRefusesPush))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS versions_ok, true AS path_parity,
           |  true AS dv_refuses_push
           |FROM documents WHERE doc_id >= 100 AND doc_id < 400
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q210: SQL `INSERT INTO … REPLACE WHERE` — q179's idempotent
    * backfill moved onto the pure SQL surface: [[graft.sources
    * .GraftWriteBuilder]]'s [[org.apache.spark.sql.connector.write
    * .SupportsOverwrite]] translates the clause exactly (or refuses),
    * executors stage the replacement rows, and [[graft.sources
    * .ManagedTable.replaceStaged]] commits constraint-checked
    * tombstones + staged files as ONE version — every replacement row
    * must satisfy the predicate (checked on the staged files
    * themselves), untouched files are never rewritten, and the swap
    * is atomic under time travel. The invariants pin all three:
    * versions = create + CTAS + one replace commit, the pre-replace
    * snapshot unchanged via VERSION AS OF, and the untouched slice's
    * bytes bit-identical through the swap (hash-checked aggregate).
    * At 100 TB this is THE nightly correction shape: a bad partition
    * re-derived and swapped in one commit, O(replaced slice) cost.
    */
  val q210SqlReplaceWhere = NamedQuery(
    "q210_sql_replace_where",
    "INSERT INTO ... REPLACE WHERE via the catalog: staged rows + " +
      "constraint-checked tombstones in one version, time travel to " +
      "the pre-swap snapshot intact; per-lang aggregates vs " +
      "raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("rwwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq210_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q210_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs AS SELECT * FROM q210_docs")
      s.sql(s"INSERT INTO $cat.corpus.docs REPLACE WHERE doc_id < 100 " +
        "SELECT doc_id, lang, n_chars + 1000 AS n_chars " +
        "FROM q210_docs WHERE doc_id < 100")
      val dir = s"$wh/corpus/docs"
      val versionsOk = graft.sources.ManagedTable
        .versions(s, dir) == Seq(1, 2, 3)
      // the pre-swap snapshot must read back bit-identical
      def slice(from: String) = s.sql(
        s"""SELECT CAST(sum(n_chars) AS BIGINT) AS sc, count(*) AS n
           |FROM $from WHERE doc_id < 100""".stripMargin)
        .collect().head
      val preSwapOk =
        slice(s"$cat.corpus.docs VERSION AS OF 2") ==
          slice("q210_docs")
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("versions_ok", lit(versionsOk))
        .withColumn("pre_swap_ok", lit(preSwapOk))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars +
           |    CASE WHEN doc_id < 100 THEN 1000 ELSE 0 END) AS BIGINT)
           |    AS sum_chars,
           |  true AS versions_ok, true AS pre_swap_ok
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q211: SQL `UPDATE` as group-based COPY-ON-WRITE — [[graft.sources
    * .GraftRowLevelOperation]] under the catalog: Spark learns the
    * files holding matching rows through the `_file` metadata column,
    * runtime-group-filters the rewrite scan down to THOSE files, and
    * [[graft.sources.GraftCowBatchWrite]] swaps scanned-out/staged-in
    * as one manifest version. The hashed invariant pins the whole
    * point: of four range-clustered segments, the three the predicate
    * never touches survive BY FILE IDENTITY (no rewrite), so at
    * 100 TB an UPDATE costs O(affected files), never O(table). Values
    * recomputed by the oracle from raw parquet.
    */
  val q211SqlUpdate = NamedQuery(
    "q211_sql_update",
    "SQL UPDATE via copy-on-write: _file-grouped rewrite swaps only " +
      "the one affected segment (3/4 carried by identity); per-lang " +
      "aggregates vs raw-parquet oracle.",
    (s, d) => {
      val M = graft.sources.ManagedTable
      val wh = graft.Scratch.dir("updwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq211_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      val dir = s"$wh/corpus/docs"
      val docs = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select("doc_id", "lang", "n_chars")
      // first append creates the table — no empty CREATE file, so
      // every file carries doc_id stats and the carried-set proof is
      // exact (a stats-less file is conservatively always scanned)
      (0 until 4).foreach { i =>
        M.appendCommit(docs.filter(col("doc_id") >= i * 100 &&
          col("doc_id") < (i + 1) * 100).coalesce(1), dir)
      }
      def files(): Set[String] = {
        val v = M.versions(s, dir).last
        M.planFiles(s, dir, "doc_id",
          Long.MinValue, Long.MaxValue, Some(v))._2.toSet
      }
      val before = files()
      // <= 99: range bounds are INCLUSIVE file-level tests, so this
      // provably excludes the [100,200) segment where `< 100` would
      // conservatively keep its min=100 boundary
      s.sql(s"UPDATE $cat.corpus.docs SET n_chars = n_chars + 1000 " +
        "WHERE doc_id <= 99")
      val carried = (before & files()).size == 3 && before.size == 4
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("cow_carried", lit(carried))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars +
           |    CASE WHEN doc_id <= 99 THEN 1000 ELSE 0 END) AS BIGINT)
           |    AS sum_chars,
           |  true AS cow_carried
           |FROM documents WHERE doc_id < 400
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q212: SQL `MERGE INTO` — the reference's `apply_changes` shape
    * (upsert + delete + insert, /root/reference/notebooks/
    * 03_Data_Ingestion.py:318-326) expressed as the STANDARD SQL
    * statement over the connector's row-level-operation tier: one
    * MERGE carries matched-updates, matched-deletes and not-matched
    * inserts, rewritten group-wise (only files holding matched keys
    * are swapped) and committed as ONE manifest version. The oracle
    * recomputes the post-merge state from raw parquet with the same
    * three-branch algebra — a lost update, resurrected delete, or
    * dropped insert breaks the hash. Together with q05/q06/q23
    * (apply_changes as an operator) this closes the DML matrix: the
    * same CDC semantics are now reachable from pure SQL.
    */
  val q212MergeInto = NamedQuery(
    "q212_merge_into",
    "SQL MERGE INTO via copy-on-write: matched update + matched " +
      "delete + not-matched insert in one group-wise rewritten " +
      "commit; per-lang aggregates vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("mrgwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq212_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q212_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs AS " +
        "SELECT * FROM q212_docs WHERE doc_id < 400")
      s.sql("""SELECT doc_id, lang, n_chars + 5000 AS n_chars, 'u' AS op
              |FROM q212_docs WHERE doc_id < 50
              |UNION ALL
              |SELECT doc_id, lang, n_chars, 'd' FROM q212_docs
              |WHERE doc_id >= 350 AND doc_id < 400
              |UNION ALL
              |SELECT doc_id, lang, n_chars + 9, 'i' FROM q212_docs
              |WHERE doc_id >= 450""".stripMargin)
        .createOrReplaceTempView("q212_src")
      s.sql(s"""MERGE INTO $cat.corpus.docs t USING q212_src c
                |ON t.doc_id = c.doc_id
                |WHEN MATCHED AND c.op = 'd' THEN DELETE
                |WHEN MATCHED THEN UPDATE SET n_chars = c.n_chars
                |WHEN NOT MATCHED THEN
                |  INSERT (doc_id, lang, n_chars)
                |  VALUES (c.doc_id, c.lang, c.n_chars)""".stripMargin)
      val versionsOk = graft.sources.ManagedTable
        .versions(s, s"$wh/corpus/docs") == Seq(1, 2, 3)
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("versions_ok", lit(versionsOk))
        .orderBy("lang")
    },
    Some("""WITH final AS (
           |  SELECT lang, n_chars +
           |    CASE WHEN doc_id < 50 THEN 5000 ELSE 0 END AS n_chars
           |  FROM documents WHERE doc_id < 350
           |  UNION ALL
           |  SELECT lang, n_chars + 9 FROM documents
           |  WHERE doc_id >= 450 AND doc_id < 500
           |)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS versions_ok
           |FROM final GROUP BY lang ORDER BY lang""".stripMargin))

  /** q213: SQL SCHEMA EVOLUTION — `ALTER TABLE … ADD COLUMNS` through
    * the catalog ([[graft.sources.GraftCatalog.alterTable]]), mapped
    * onto the SAME manifest-recorded evolution
    * [[graft.sources.ManagedTable.merge]] performs implicitly
    * (reference anchor: the DLT tables' declarative schema authority,
    * /root/reference/notebooks/03_Data_Ingestion.py:59-64). The shape
    * a real lakehouse user hits first: create + insert on the narrow
    * schema, ALTER ADD COLUMNS, insert on the wide schema, read
    * everything back — pre-evolution rows null-filled by the
    * manifest-schema scan, never by footer inference. Invariants
    * folded into the hashed row: the ALTER is METADATA-ONLY (the
    * pre-evolution data files are carried byte-identical — on 100 TB
    * adding a column costs one manifest write), and the version chain
    * is exactly create/insert/alter/insert.
    */
  val q213SqlAlterTable = NamedQuery(
    "q213_sql_alter_table",
    "SQL ALTER TABLE ADD COLUMNS: metadata-only manifest schema " +
      "evolution by name; old segments null-fill, post-evolution " +
      "insert lands typed; per-lang aggregates vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("altwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq213_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 600)
        .select("doc_id", "lang", "n_chars", "source")
        .createOrReplaceTempView("q213_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars FROM q213_docs WHERE doc_id < 400")
      val dir = s"$wh/corpus/docs"
      val filesBefore = graft.sources.ManagedTable.read(s, dir)
        .inputFiles.toSet
      s.sql(s"ALTER TABLE $cat.corpus.docs " +
        "ADD COLUMNS (n_tokens BIGINT, note STRING)")
      // metadata-only: identical data files, one more version
      val metadataOnly = graft.sources.ManagedTable.read(s, dir)
        .inputFiles.toSet == filesBefore
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars, n_chars * 2, source " +
        "FROM q213_docs WHERE doc_id >= 400")
      val versionsOk = graft.sources.ManagedTable
        .versions(s, dir) == Seq(1, 2, 3, 4)
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                |  count(n_tokens) AS n_evolved,
                |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
                |    AS sum_tokens,
                |  count(note) AS n_notes
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("metadata_only", lit(metadataOnly))
        .withColumn("versions_ok", lit(versionsOk))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  COUNT(CASE WHEN doc_id >= 400 THEN 1 END) AS n_evolved,
           |  CAST(coalesce(SUM(CASE WHEN doc_id >= 400
           |    THEN n_chars * 2 END), 0) AS BIGINT) AS sum_tokens,
           |  COUNT(CASE WHEN doc_id >= 400 THEN source END) AS n_notes,
           |  true AS metadata_only, true AS versions_ok
           |FROM documents WHERE doc_id < 600
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q214: HISTORY RETENTION GC —
    * [[graft.sources.ManagedTable.vacuumHistory]], the Delta
    * `logRetentionDuration` + VACUUM pairing the manifest log needed
    * so history stops growing forever: a table is driven through
    * full-replace versions (each strands its predecessor's segment),
    * the horizon keeps the newest 2, and the invariants fold into the
    * hashed row — the dropped manifests are GONE (version chain =
    * exactly the survivors), their private segments' BYTES came back
    * (reclaimed > 0, counted before deletion), below-horizon time
    * travel fails cleanly, retained-version reads are bit-exact vs
    * the oracle, and a replayed micro-batch whose idempotence tag
    * lived in a dropped manifest is STILL deduped (the retired-tags
    * ledger — streaming exactly-once survives retention). At 100 TB:
    * history cost O(retained versions), reclamation cost O(dead
    * segments), never a table scan.
    */
  val q214VacuumHistory = NamedQuery(
    "q214_vacuum_history",
    "vacuumHistory retention GC: drop below-horizon manifests, " +
      "reclaim dead segments' bytes, keep reads + replay idempotence " +
      "(retired-tags ledger) intact; final state vs raw-parquet oracle.",
    (s, d) => {
      val M = graft.sources.ManagedTable
      val dir = graft.Scratch.dir("vhist", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "n_chars")
      // v1..v3: full-replace snapshots of growing prefixes (each
      // strands its predecessor's segment); v4: a tagged append —
      // the micro-batch idempotence shape
      Seq(200, 400, 600).foreach { hi =>
        M.commit(docs.filter(col("doc_id") < hi).coalesce(1), dir)
      }
      M.idempotentAppend(
        docs.filter(col("doc_id") >= 600 && col("doc_id") < 700)
          .coalesce(1), dir, batchId = 42L)
      val stats = M.vacuumHistory(s, dir, retainVersions = 2,
        retentionMs = 0)
      val versionsOk = M.versions(s, dir) == Seq(3, 4) &&
        stats.droppedVersions == Seq(1, 2)
      val reclaimed = stats.sweptSegments.size == 2 &&
        stats.reclaimedBytes > 0
      val travelFails =
        try { M.read(s, dir, Some(2)); false }
        catch { case _: IllegalArgumentException => true }
      // the replayed batch 42 must dedupe THROUGH the ledger — its
      // tag's manifest (v4) is retained here, so also probe a second
      // vacuum that retires v3 and replay again
      val replaySkipped = !M.idempotentAppend(
        docs.filter(col("doc_id") >= 600 && col("doc_id") < 700)
          .coalesce(1), dir, batchId = 42L)
      M.vacuumHistory(s, dir, retainVersions = 1, retentionMs = 0)
      val replayAfterRetire = !M.idempotentAppend(
        docs.filter(col("doc_id") >= 600 && col("doc_id") < 700)
          .coalesce(1), dir, batchId = 42L)
      M.read(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("versions_ok", lit(versionsOk))
        .withColumn("reclaimed", lit(reclaimed))
        .withColumn("travel_fails", lit(travelFails))
        .withColumn("replay_skipped",
          lit(replaySkipped && replayAfterRetire))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS versions_ok, true AS reclaimed,
           |  true AS travel_fails, true AS replay_skipped
           |FROM documents WHERE doc_id < 700
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q215: the NAME-BASED STREAMING LOOP — `readStream.table` →
    * `writeStream.toTable`, closing what q202 (path stream read),
    * q203 (path stream write) and q204 (path pipe) left open: the
    * same version-offset micro-batches and per-epoch tagged commits,
    * now with ZERO paths in user code — both ends resolve through
    * [[graft.sources.GraftCatalog]], so any driver sharing the
    * warehouse runs the identical pipeline by name. Invariants in the
    * hashed row: the drain is admission-controlled (one version per
    * micro-batch — versions arrive as distinct epochs), the target's
    * manifest log carries the `b<epoch>` idempotence tags (the
    * exactly-once ledger), and an idle re-run with the same
    * checkpoint commits NOTHING (no empty-version pile-up).
    */
  val q215StreamToTable = NamedQuery(
    "q215_stream_to_table",
    "readStream.table -> writeStream.toTable by catalog name: " +
      "version-offset batches, b<epoch> tagged exactly-once commits, " +
      "idle resume commits nothing; per-lang aggregates vs oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("stwwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq215_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      val srcDir = s"$wh/corpus/src"
      val docs = Tables.documents(s, d).filter(col("doc_id") < 600)
        .select("doc_id", "lang", "n_chars")
      (0 until 3).foreach { i =>
        graft.sources.ManagedTable.appendCommit(
          docs.filter(col("doc_id") >= i * 200 &&
            col("doc_id") < (i + 1) * 200).coalesce(1), srcDir)
      }
      s.sql(s"CREATE TABLE $cat.corpus.tgt " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      val ckpt = graft.Scratch.dir("stwck", d)
      val cp = new org.apache.hadoop.fs.Path(ckpt)
      cp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(cp, true)
      def run(): Unit = {
        val q = s.readStream.option("maxVersionsPerTrigger", 1)
          .table(s"$cat.corpus.src")
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.corpus.tgt")
        q.awaitTermination()
      }
      run()
      val tgtDir = s"$wh/corpus/tgt"
      val M = graft.sources.ManagedTable
      val afterFirst = M.versions(s, tgtDir).size
      run() // idle resume: nothing may land
      val idleOk = M.versions(s, tgtDir).size == afterFirst
      val tags = M.tags(s, tgtDir).map(_._2)
      // 3 source versions drain as 3 tagged epochs (+ the create)
      val epochsOk = tags.count(_.startsWith("b")) == 3
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.tgt GROUP BY lang""".stripMargin)
        .withColumn("idle_ok", lit(idleOk))
        .withColumn("epochs_ok", lit(epochsOk))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS idle_ok, true AS epochs_ok
           |FROM documents WHERE doc_id < 600
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q216: MAINTENANCE BY `CALL` — the scheduled-operations surface
    * ([[graft.sources.GraftProcedures]], Spark's DSv2 procedure SPI)
    * driving a full table lifecycle with pure SQL: inserts build
    * history, `CALL …history` reads the manifest log as rows,
    * `CALL …restore` undoes a bad write metadata-only,
    * `CALL …compact` bins the small segments, and
    * `CALL …vacuum_history` retires below-horizon versions and
    * reclaims their bytes — the four operations a 100 TB table's cron
    * job runs nightly, none needing a line of Scala. Invariants in
    * the hashed row: history row count tracks the version chain, the
    * restore undoes exactly the bad insert, vacuum drops the right
    * version count with bytes > 0, and the final state is bit-exact
    * vs the oracle's recomputation.
    */
  val q216SqlMaintenance = NamedQuery(
    "q216_sql_maintenance",
    "CALL graft.system.{history,restore,compact,vacuum_history}: the " +
      "nightly maintenance lifecycle by pure SQL; final state + " +
      "version/byte invariants vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("mntwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq216_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q216_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT * FROM q216_docs WHERE doc_id < 250")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT * FROM q216_docs WHERE doc_id >= 250")
      // a BAD write lands (doubled slice) … and restore undoes it
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT * FROM q216_docs WHERE doc_id < 100")
      val restoredTo = s.sql(
        s"CALL $cat.system.restore(`table` => 'corpus.docs', " +
          "version => 3)").head().getInt(0)
      val histRows = s.sql(
        s"CALL $cat.system.history(`table` => 'corpus.docs')").count()
      val compactV = s.sql(
        s"CALL $cat.system.compact(`table` => 'corpus.docs')")
        .head().getInt(0)
      val vac = s.sql(
        s"CALL $cat.system.vacuum_history('corpus.docs', 2, 0)").head()
      val M = graft.sources.ManagedTable
      val lifecycleOk = restoredTo == 5 && histRows == 5 &&
        compactV == 6 && vac.getInt(0) == 4 && vac.getLong(2) > 0 &&
        M.versions(s, s"$wh/corpus/docs") == Seq(5, 6)
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("lifecycle_ok", lit(lifecycleOk))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS lifecycle_ok
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q217: COLUMN MAPPING — `ALTER TABLE RENAME COLUMN` / `DROP
    * COLUMN` as METADATA-ONLY operations
    * ([[graft.sources.ColumnMapping]]; Delta's column mapping, name
    * mode, over the manifest log — reference anchor: the DLT tables'
    * schema authority, /root/reference/notebooks/03_Data_Ingestion
    * .py:59-64). The lifecycle a schema refactor actually runs:
    * create + insert, RENAME a column (old segments keep their
    * physical name; reads translate), insert under the new name, DROP
    * a column (bytes stay, unread), re-ADD the same name (the retired
    * ledger maps it to a FRESH physical column — the dead bytes MUST
    * NOT resurrect), insert real values, read everything back.
    * Invariants folded into the hashed row: both DDLs carried the
    * data files byte-identical (on 100 TB each costs ONE manifest
    * write), the re-added column is NULL on every pre-drop row, and
    * the final manifest maps it away from the dead physical name.
    */
  val q217ColumnMapping = NamedQuery(
    "q217_column_mapping",
    "ALTER TABLE RENAME/DROP COLUMN via logical→physical column " +
      "mapping: metadata-only DDL, stats keep pruning, re-added name " +
      "reads fresh (never the dropped bytes); vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("cmwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq217_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 600)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q217_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars FROM q217_docs WHERE doc_id < 300")
      val dir = s"$wh/corpus/docs"
      val M = graft.sources.ManagedTable
      def files(): Set[String] = M.read(s, dir).inputFiles.toSet
      // RENAME: logical name moves, physical stays in the old files
      val before1 = files()
      s.sql(s"ALTER TABLE $cat.corpus.docs " +
        "RENAME COLUMN n_chars TO char_count")
      val renameMetaOnly = files() == before1
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars FROM q217_docs " +
        "WHERE doc_id >= 300 AND doc_id < 400")
      // DROP + re-ADD: the retired ledger must keep the dead bytes dead
      val before2 = files()
      s.sql(s"ALTER TABLE $cat.corpus.docs DROP COLUMN lang")
      s.sql(s"ALTER TABLE $cat.corpus.docs ADD COLUMNS (lang STRING)")
      val dropMetaOnly = files() == before2
      val resurrectFree = s.sql(
        s"SELECT count(lang) FROM $cat.corpus.docs").head.getLong(0) == 0L
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, n_chars, lang FROM q217_docs WHERE doc_id >= 400")
      // the re-added field maps AWAY from the dead physical column
      val mappedAway = graft.sources.GraftTableMeta.resolve(dir, None)
        .physOf("lang") != "lang"
      s.sql(s"""SELECT coalesce(lang, '~none~') AS lang_g,
                |  count(*) AS n_docs,
                |  CAST(sum(char_count) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY 1""".stripMargin)
        .withColumn("rename_meta_only", lit(renameMetaOnly))
        .withColumn("drop_meta_only", lit(dropMetaOnly))
        .withColumn("resurrect_free", lit(resurrectFree))
        .withColumn("mapped_away", lit(mappedAway))
        .orderBy("lang_g")
    },
    Some("""SELECT coalesce(CASE WHEN doc_id >= 400 THEN lang END,
           |    '~none~') AS lang_g,
           |  COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS rename_meta_only, true AS drop_meta_only,
           |  true AS resurrect_free, true AS mapped_away
           |FROM documents WHERE doc_id < 600
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q218: TABLE PROPERTIES + CHECK CONSTRAINTS — the reference's DLT
    * `table_properties={'quality': 'silver'}` tier
    * (/root/reference/notebooks/03_Data_Ingestion.py:62,91,117) plus
    * its `expect_or_fail` data-quality gate, re-expressed as
    * manifest-versioned TBLPROPERTIES and `graft.constraints.<name>`
    * CHECK constraints ([[graft.sources.ManagedTable
    * .setTableProperties]]): SET/UNSET are one metadata-only commit,
    * the constraint is validated against the schema at SET time, and
    * EVERY row-adding writer (INSERT, UPDATE's COW rewrite) enforces
    * it at new-rows scale — a violation throws and commits NOTHING.
    * Invariants folded into the hashed row: properties round-trip
    * through SHOW TBLPROPERTIES, the violating INSERT and the
    * violating UPDATE both bounced (row count and version chain
    * unchanged), and valid writes kept flowing.
    */
  val q218Constraints = NamedQuery(
    "q218_constraints",
    "TBLPROPERTIES + CHECK constraints: quality-tier properties and " +
      "an expect_or_fail write gate, metadata-only SET/UNSET, " +
      "violations commit nothing; final state vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("ctwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq218_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q218_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT) " +
        "TBLPROPERTIES ('quality' = 'silver')")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT * FROM q218_docs WHERE doc_id < 300")
      s.sql(s"ALTER TABLE $cat.corpus.docs SET TBLPROPERTIES (" +
        s"'${graft.sources.ManagedTable.ConstraintPrefix}chars_ok' " +
        "= 'n_chars >= 0')")
      val props = s.sql(s"SHOW TBLPROPERTIES $cat.corpus.docs")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val propsOk = props.get("quality").contains("silver") &&
        props.get(graft.sources.ManagedTable.ConstraintPrefix +
          "chars_ok").contains("n_chars >= 0")
      // valid rows pass the gate …
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT * FROM q218_docs WHERE doc_id >= 300")
      val M = graft.sources.ManagedTable
      val dir = s"$wh/corpus/docs"
      val versionsBefore = M.versions(s, dir)
      // … a violating INSERT bounces, committing NOTHING …
      val insertBlocked =
        try { s.sql(s"INSERT INTO $cat.corpus.docs " +
            "SELECT doc_id, lang, -n_chars - 1 FROM q218_docs " +
            "WHERE doc_id < 10"); false }
        catch { case e: Exception =>
          (e.getMessage + Option(e.getCause).map(_.getMessage)
            .getOrElse("")).contains("chars_ok") }
      // … and so does an UPDATE that rewrites rows INTO violation
      val updateBlocked =
        try { s.sql(s"UPDATE $cat.corpus.docs SET n_chars = -1 " +
            "WHERE doc_id = 5"); false }
        catch { case e: Exception =>
          (e.getMessage + Option(e.getCause).map(_.getMessage)
            .getOrElse("")).contains("chars_ok") }
      val nothingLanded = M.versions(s, dir) == versionsBefore
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("props_ok", lit(propsOk))
        .withColumn("insert_blocked", lit(insertBlocked))
        .withColumn("update_blocked", lit(updateBlocked))
        .withColumn("nothing_landed", lit(nothingLanded))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  true AS props_ok, true AS insert_blocked,
           |  true AS update_blocked, true AS nothing_landed
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q219: TYPE WIDENING — `ALTER COLUMN … TYPE BIGINT` as a
    * METADATA-ONLY commit ([[graft.sources.ManagedTable.widenColumn]];
    * Delta's type widening over the manifest log). The manifest
    * records the wider type and every reader upcasts the narrower
    * committed segments at decode time — the connector's columnar
    * path through a zero-copy widening vector, its row path by file
    * footer, the path API through Spark's own parquet promotion — so
    * the retype costs one manifest write on a table of any size.
    * The post-widen insert lands values ABOVE Int.MaxValue (the
    * reason a user widens at all), both generations aggregate
    * together, and the invariants fold into the hashed row: the DDL
    * carried the data files byte-identical and pre-widen time travel
    * still sees INT.
    */
  val q219TypeWidening = NamedQuery(
    "q219_type_widening",
    "ALTER COLUMN TYPE INT→BIGINT metadata-only: readers upcast old " +
      "segments at decode, post-widen rows exceed INT range, one " +
      "manifest write; mixed-generation agg vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("twwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq219_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q219_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars INT)")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, CAST(n_chars AS INT) FROM q219_docs " +
        "WHERE doc_id < 300")
      val dir = s"$wh/corpus/docs"
      val M = graft.sources.ManagedTable
      val before = M.read(s, dir).inputFiles.toSet
      s.sql(s"ALTER TABLE $cat.corpus.docs " +
        "ALTER COLUMN n_chars TYPE BIGINT")
      val metadataOnly = M.read(s, dir).inputFiles.toSet == before
      // the whole point of widening: values an INT cannot hold
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars + 3000000000 FROM q219_docs " +
        "WHERE doc_id >= 300")
      val narrowBelow = M.read(s, dir, Some(2))
        .schema("n_chars").dataType ==
        org.apache.spark.sql.types.IntegerType
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                |  CAST(max(n_chars) AS BIGINT) AS max_chars
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("metadata_only", lit(metadataOnly))
        .withColumn("narrow_below", lit(narrowBelow))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN doc_id >= 300
           |    THEN n_chars + 3000000000 ELSE n_chars END)
           |    AS BIGINT) AS sum_chars,
           |  CAST(MAX(CASE WHEN doc_id >= 300
           |    THEN n_chars + 3000000000 ELSE n_chars END)
           |    AS BIGINT) AS max_chars,
           |  true AS metadata_only, true AS narrow_below
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q220: DECLARATIVE CLUSTERING — `CREATE TABLE … CLUSTER BY (k)`
    * persists the layout contract as a table property
    * ([[graft.sources.ManagedTable.ClusterByProp]]), and EVERY plain
    * INSERT honors it through the DSv2 write's declared
    * distribution+ordering (Spark plans the range shuffle; AQE sizes
    * the partitions to `graft.targetFileSize`) — so a selective
    * IN-probe prunes files from the FIRST insert onward, with no
    * maintenance CALL establishing the layout. Each INSERT slice is
    * deliberately full-range (doc_id % 3), so nothing but the
    * declared clustering can make the files range-disjoint.
    * Invariants folded into the hashed row: the probe's plan kept
    * strictly fewer files than the table holds, the clustering
    * property round-trips through SHOW TBLPROPERTIES, and compaction
    * (CALL system.compact with no cluster_by argument) preserves the
    * declared key.
    */
  val q220ClusteredCreate = NamedQuery(
    "q220_clustered_create",
    "CREATE TABLE CLUSTER BY: declarative clustering via write-time " +
      "distribution+ordering, IN-probe prunes files right after " +
      "plain INSERTs (no CALL), property round-trips; vs raw-parquet " +
      "oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("ccwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq220_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 600)
        .select("doc_id", "text", "lang", "n_chars")
        .createOrReplaceTempView("q220_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT) " +
        "CLUSTER BY (doc_id) " +
        s"TBLPROPERTIES ('${graft.sources.ManagedTable
          .TargetFileSizeProp}' = '2048')")
      // three PLAIN inserts, each slice spanning the full doc_id
      // range — only the declared clustering can split them into
      // range-disjoint files. AQE's parallelism-first coalescing
      // ignores sub-MB advisory sizes, so honor the tiny
      // demonstration targetFileSize for the duration of the inserts
      // (at production scale the property would be 64 MB+ and the
      // default coalescing behavior already respects it).
      s.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      s.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "1024")
      try {
        (0 to 2).foreach { r =>
          s.sql(s"INSERT INTO $cat.corpus.docs SELECT doc_id, text, " +
            s"lang, n_chars FROM q220_docs WHERE doc_id % 3 = $r")
        }
      } finally {
        s.conf.unset(
          "spark.sql.adaptive.coalescePartitions.parallelismFirst")
        s.conf.unset(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      }
      val probe = s.sql(s"SELECT doc_id, lang, n_chars FROM " +
        s"$cat.corpus.docs WHERE doc_id IN (5, 250, 577)")
      val desc = probe.queryExecution.executedPlan.toString
      val prunes = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc)
        .exists(m => m.group(1).toInt < m.group(2).toInt &&
          m.group(2).toInt > 3)
      val declared = s.sql(s"SHOW TBLPROPERTIES $cat.corpus.docs")
        .collect().exists(r => r.getString(0) ==
          graft.sources.ManagedTable.ClusterByProp &&
          r.getString(1) == "doc_id")
      // parameterless maintenance compaction inherits the declared key
      s.sql(s"CALL $cat.system.compact(" +
        s"`table` => 'corpus.docs', small_file_bytes => ${32 * 1024})")
      val probe2 = s.sql(s"SELECT doc_id, lang, n_chars FROM " +
        s"$cat.corpus.docs WHERE doc_id IN (5, 250, 577)")
      val desc2 = probe2.queryExecution.executedPlan.toString
      val prunesAfterCompact =
        "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc2)
          .exists(m => m.group(1).toInt <= m.group(2).toInt)
      probe2.withColumn("clustered_prunes", lit(prunes))
        .withColumn("cluster_by_declared", lit(declared))
        .withColumn("prunes_after_compact", lit(prunesAfterCompact))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars, true AS clustered_prunes,
           |  true AS cluster_by_declared, true AS prunes_after_compact
           |FROM documents WHERE doc_id IN (5, 250, 577)
           |ORDER BY doc_id""".stripMargin))

  /** q221: WRITE-TIME SCHEMA AUTO-EVOLUTION — the two seams a widened
    * source evolves a table through WITHOUT a manual ALTER first:
    * `MERGE INTO … WITH SCHEMA EVOLUTION` (Spark hands its AddColumn
    * changes to the catalog's ADD COLUMNS path via the
    * AUTOMATIC_SCHEMA_EVOLUTION capability, ONE metadata-only manifest
    * write, then the merge runs against the widened target) and the
    * DataFrame write's `.option("mergeSchema", true)` (Delta's
    * mergeSchema: strictly additive, analyzer arity gate stood down
    * only for the opted-in write). Lifecycle: create narrow → insert →
    * widening MERGE (updates overlap, inserts the rest, new column
    * lands) → mergeSchema append adding a second new column → read
    * everything back; rows from each generation carry exactly the
    * columns that existed when they landed (older rows null-fill).
    * Invariants folded into the hashed row: the schema after each
    * evolution step is exactly the expected column sequence.
    */
  val q221AutoEvolution = NamedQuery(
    "q221_auto_evolution",
    "MERGE WITH SCHEMA EVOLUTION + mergeSchema append: a widened " +
      "source evolves the table in the same statement (metadata-only " +
      "ADD COLUMNS), older generations null-fill; vs raw-parquet " +
      "oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("aewh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq221_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q221_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs (doc_id BIGINT, lang STRING)")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang FROM q221_docs WHERE doc_id < 300")
      // a WIDER source merges without a manual ALTER: n_chars appends
      // through the catalog's ADD COLUMNS path, matched rows update,
      // unmatched insert
      s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.corpus.docs t
                |USING (SELECT doc_id, lang, n_chars FROM q221_docs
                |  WHERE doc_id >= 200 AND doc_id < 400) s
                |ON t.doc_id = s.doc_id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *
                |""".stripMargin)
      val dir = s"$wh/corpus/docs"
      val afterMerge = graft.sources.GraftTableMeta.resolve(dir, None)
        .schema.fieldNames.toSeq == Seq("doc_id", "lang", "n_chars")
      // the DataFrame seam: mergeSchema appends a SECOND new column
      Tables.documents(s, d)
        .filter(col("doc_id") >= 400 && col("doc_id") < 500)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") % 7).as("quality"))
        .write.format("graft").option("mergeSchema", "true")
        .mode("append").save(dir)
      val afterAppend = graft.sources.GraftTableMeta.resolve(dir, None)
        .schema.fieldNames.toSeq ==
        Seq("doc_id", "lang", "n_chars", "quality")
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                |  count(quality) AS n_quality,
                |  CAST(sum(quality) AS BIGINT) AS sum_quality
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .withColumn("merge_evolved", lit(afterMerge))
        .withColumn("append_evolved", lit(afterAppend))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN doc_id >= 200 THEN n_chars END)
           |    AS BIGINT) AS sum_chars,
           |  COUNT(CASE WHEN doc_id >= 400 THEN 1 END) AS n_quality,
           |  CAST(SUM(CASE WHEN doc_id >= 400 THEN n_chars % 7 END)
           |    AS BIGINT) AS sum_quality,
           |  true AS merge_evolved, true AS append_evolved
           |FROM documents WHERE doc_id < 500
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q222: COLUMN DEFAULT VALUES — `CREATE TABLE (… lang STRING
    * DEFAULT 'xx', score BIGINT DEFAULT 100)` through the catalog's
    * SUPPORT_COLUMN_DEFAULT_VALUE capability: the default rides the
    * manifest schema's column metadata and Spark's analyzer fills it
    * into every INSERT that omits the column (or names DEFAULT
    * explicitly) — zero connector code in the fill path, which is the
    * point: the manifest is the schema authority and the engine's own
    * default resolution works against it. ALTER ADD COLUMNS with a
    * DEFAULT is REJECTED (old segments null-fill; reading null where
    * the user declared a default would be a silent wrong answer).
    * Three insert shapes land: key-only (both defaults), key+lang
    * (score defaults), full row (no defaults).
    */
  val q222ColumnDefaults = NamedQuery(
    "q222_column_defaults",
    "CREATE TABLE with column DEFAULTs: analyzer fills omitted " +
      "columns on INSERT from manifest schema metadata; mixed-shape " +
      "inserts aggregate vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("dfwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq222_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q222_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs (doc_id BIGINT, " +
        "lang STRING DEFAULT 'xx', score BIGINT DEFAULT 100)")
      s.sql(s"INSERT INTO $cat.corpus.docs (doc_id) " +
        "SELECT doc_id FROM q222_docs WHERE doc_id < 200")
      s.sql(s"INSERT INTO $cat.corpus.docs (doc_id, lang) " +
        "SELECT doc_id, lang FROM q222_docs " +
        "WHERE doc_id >= 200 AND doc_id < 400")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars FROM q222_docs WHERE doc_id >= 400")
      s.sql(s"""SELECT lang, count(*) AS n_docs,
                |  CAST(sum(score) AS BIGINT) AS sum_score
                |FROM $cat.corpus.docs GROUP BY lang""".stripMargin)
        .orderBy("lang")
    },
    Some("""SELECT CASE WHEN doc_id < 200 THEN 'xx' ELSE lang END
           |    AS lang,
           |  COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN doc_id < 400 THEN 100 ELSE n_chars END)
           |    AS BIGINT) AS sum_score
           |FROM documents WHERE doc_id < 500
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q223: BLOOM-FILTER FILE SKIPPING — per-file membership digests
    * ([[graft.sources.BloomSkipping]]) for the columns declared under
    * `graft.bloomFilterColumns`, the pruner for the shape zone maps
    * cannot touch: a point lookup on a high-cardinality UNCLUSTERED
    * column. The table is deliberately NOT clustered and each INSERT
    * slice (doc_id % 3 = r) spans the full doc_id range, so every
    * file's [min, max] contains every probe value — any file the
    * IN-probe plan drops was dropped by its digest answering
    * "definitely absent". Digests live as sidecars inside the segment
    * (~1.2 B per distinct value at fpp 1%), built distributed on the
    * executors at write time, probed fail-open at planning time and
    * by join-driven runtime pruning. Invariants folded into the
    * hashed row: the probe kept strictly fewer files than the table
    * holds (≥3 full-range files), and the digest property
    * round-trips through SHOW TBLPROPERTIES.
    */
  val q223BloomSkipping = NamedQuery(
    "q223_bloom_skipping",
    "Bloom-filter file skipping: per-file sidecar digests prune a " +
      "point IN-probe on an unclustered full-range column where " +
      "min/max keeps everything; vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("bfwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq223_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 600)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q223_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT) " +
        s"TBLPROPERTIES ('${graft.sources.BloomSkipping.ColumnsProp}'" +
        " = 'doc_id')")
      // three UNCLUSTERED inserts, each a full-range residue slice —
      // overlapping [min, max] by construction, digests or nothing
      (0 to 2).foreach { r =>
        s.sql(s"INSERT INTO $cat.corpus.docs SELECT doc_id, lang, " +
          s"n_chars FROM q223_docs WHERE doc_id % 3 = $r")
      }
      // 5 ≡ 2, 250 ≡ 1, 577 ≡ 1 (mod 3): two residue files hold all
      // three probe keys; the third survives min/max but not its digest
      val probe = s.sql(s"SELECT doc_id, lang, n_chars FROM " +
        s"$cat.corpus.docs WHERE doc_id IN (5, 250, 577)")
      val desc = probe.queryExecution.executedPlan.toString
      val digestPrunes = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc)
        .exists(m => m.group(1).toInt < m.group(2).toInt &&
          m.group(2).toInt >= 3)
      val declared = s.sql(s"SHOW TBLPROPERTIES $cat.corpus.docs")
        .collect().exists(r => r.getString(0) ==
          graft.sources.BloomSkipping.ColumnsProp &&
          r.getString(1) == "doc_id")
      probe.withColumn("digest_prunes", lit(digestPrunes))
        .withColumn("digest_declared", lit(declared))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars, true AS digest_prunes,
           |  true AS digest_declared
           |FROM documents WHERE doc_id IN (5, 250, 577)
           |ORDER BY doc_id""".stripMargin))

  /** q224: CDF AND DETAIL THROUGH SQL — `CALL system.changes` (the
    * Delta `table_changes` shape over [[graft.sources.ManagedTable
    * .changes]]: plans only the files the two manifests do NOT share,
    * ∝ changed data, never a table scan) and `CALL system.detail`
    * (DESCRIBE DETAIL parity: one metadata-only row from the manifest
    * — layout counts, bytes, recorded live rows, declared layout
    * contracts). The lifecycle: full insert → COW UPDATE of a key
    * range → DV DELETE of another; the CALL returns exactly the
    * update pre/post image pairs and the deleted rows. `detail`
    * invariants fold in as flag columns: the manifest counts match
    * the lifecycle (data files > 0, DV present after DELETE,
    * live_rows null under DVs — counting tombstoned positions would
    * need a scan, and detail never scans).
    */
  val q224SqlChangesDetail = NamedQuery(
    "q224_sql_changes_detail",
    "CALL system.changes/detail: change-data-feed diff and DESCRIBE " +
      "DETAIL parity through pure SQL; update pre/post images and DV " +
      "deletes vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("cdwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq224_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 400)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q224_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT)")          // v1
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars FROM q224_docs")           // v2
      s.sql(s"UPDATE $cat.corpus.docs SET n_chars = n_chars + 1000 " +
        "WHERE doc_id < 50")                                     // v3
      s.sql(s"DELETE FROM $cat.corpus.docs WHERE doc_id >= 350") // v4
      val changes = s.sql(s"CALL $cat.system.changes(" +
        s"`table` => 'corpus.docs', from_version => 2, " +
        "to_version => 4, keys => 'doc_id')")
      val detail = s.sql(s"CALL $cat.system.detail(" +
        "`table` => 'corpus.docs')").collect().head
      val detailOk =
        detail.getAs[Int]("version") == 4 &&
          detail.getAs[Int]("num_versions") == 4 &&
          detail.getAs[Int]("num_data_files") > 0 &&
          detail.getAs[Int]("num_dv_files") > 0 &&
          detail.getAs[Long]("size_bytes") > 0 &&
          detail.isNullAt(detail.fieldIndex("live_rows")) &&
          detail.getAs[String]("cluster_by") == ""
      changes.withColumn("detail_ok", lit(detailOk))
        .orderBy("_change_type", "doc_id")
    },
    Some("""SELECT * FROM (
           |  SELECT 'update_preimage' AS _change_type, doc_id, lang,
           |    n_chars, true AS detail_ok
           |  FROM documents WHERE doc_id < 50
           |  UNION ALL
           |  SELECT 'update_postimage', doc_id, lang, n_chars + 1000,
           |    true FROM documents WHERE doc_id < 50
           |  UNION ALL
           |  SELECT 'delete', doc_id, lang, n_chars, true
           |  FROM documents WHERE doc_id >= 350 AND doc_id < 400
           |) ORDER BY _change_type, doc_id""".stripMargin))

  /** q225: RETRO-DIGESTING AN EXISTING TABLE — the "build an index on
    * historical data" operation, pure SQL: a table born WITHOUT
    * digests (3 full-range unclustered inserts, every file's
    * [min, max] spans the domain) gains them by `ALTER TABLE … SET
    * TBLPROPERTIES ('graft.bloomFilterColumns' = …)` (validated at
    * SET: the column must exist and be digest-eligible) followed by
    * the q179 idempotent-backfill pattern — one `INSERT INTO …
    * REPLACE WHERE slice` per slice re-lands the same rows from
    * upstream, and every backfill commit builds digests because the
    * property is now in effect. Old fully-tombstoned files fail open
    * (no digest — kept, zero live rows); the probe's proof: before
    * the ALTER the point probe kept EVERY file, after the backfill it
    * provably drops digested files that cannot hold the keys.
    */
  val q225RetroDigest = NamedQuery(
    "q225_retro_digest",
    "ALTER TABLE SET bloomFilterColumns + REPLACE WHERE backfill: " +
      "retro-build digests on an existing unclustered table; point " +
      "probe prunes only after; vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("rdwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq225_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      // `slice` is the materialized residue (doc_id % 3): REPLACE
      // WHERE predicates must translate EXACTLY to source filters
      // (the replaceWhere contract), so the backfill keys on this
      // plain column while doc_id stays interleaved across slices
      Tables.documents(s, d).filter(col("doc_id") < 600)
        .select(col("doc_id"), (col("doc_id") % 3).as("slice"),
          col("lang"), col("n_chars"))
        .createOrReplaceTempView("q225_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, slice BIGINT, lang STRING, n_chars BIGINT)")
      (0 to 2).foreach { r =>
        s.sql(s"INSERT INTO $cat.corpus.docs SELECT doc_id, slice, " +
          s"lang, n_chars FROM q225_docs WHERE slice = $r")
      }
      def kept(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
        df.collect() // finalize any adaptive plan before reading it
        val m = "files=(\\d+)/(\\d+)".r
          .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        (m.map(_.group(1).toInt).getOrElse(-1),
          m.map(_.group(2).toInt).getOrElse(-1))
      }
      def probe() = s.sql(s"SELECT doc_id, lang, n_chars FROM " +
        s"$cat.corpus.docs WHERE doc_id IN (5, 250, 577)")
      // pre-digest: no DATA file can prune (full-range, no digests) —
      // only the zero-row CREATE part drops (its recorded 0 rows
      // prove it empty), so kept = total minus at most that one
      val (kept0, total0) = kept(probe())
      val preKeepsAll = kept0 >= 3 && kept0 >= total0 - 1
      // declare the digest, then backfill slice-by-slice from
      // upstream — each REPLACE WHERE commit digests its fresh file
      s.sql(s"ALTER TABLE $cat.corpus.docs SET TBLPROPERTIES " +
        s"('${graft.sources.BloomSkipping.ColumnsProp}' = 'doc_id')")
      (0 to 2).foreach { r =>
        s.sql(s"INSERT INTO $cat.corpus.docs REPLACE WHERE " +
          s"slice = $r SELECT doc_id, slice, lang, n_chars " +
          s"FROM q225_docs WHERE slice = $r")
      }
      // post-backfill: digested replacement files prune; the old
      // fully-tombstoned files fail open (correct, just unpruned)
      val (kept1, total1) = kept(probe())
      val postPrunes = kept1 >= 0 && kept1 < total1
      probe().withColumn("pre_keeps_all", lit(preKeepsAll))
        .withColumn("post_prunes", lit(postPrunes))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars, true AS pre_keeps_all,
           |  true AS post_prunes
           |FROM documents WHERE doc_id IN (5, 250, 577)
           |ORDER BY doc_id""".stripMargin))

  /** q226: TIME-SERIES LAYOUT THROUGH SQL — timestamp columns in the
    * full stats tier: `CREATE TABLE … (ts TIMESTAMP) CLUSTER BY (ts)`,
    * plain INSERTs range-cluster on event time, a one-day range probe
    * prunes files from the manifest's epoch-micro min/max (recorded
    * as `unix_micros` numerics — no calendar render, no timezone
    * hazard), and global `MIN(ts)`/`MAX(ts)` answer from the manifest
    * alone (GraftAggScan, zero files read). The probe window derives
    * from the data (`ts < min + 1 day`) so the oracle replays it
    * exactly; boundaries are µs-aligned on both engines. Invariants
    * folded into the hashed row: the range probe planned strictly
    * fewer files than the table holds, and the min/max plan carries
    * GraftAggScan.
    */
  val q226TimeseriesLayout = NamedQuery(
    "q226_timeseries_layout",
    "CREATE TABLE (ts TIMESTAMP) CLUSTER BY (ts): epoch-micro stats " +
      "prune a one-day range probe; MIN/MAX(ts) answers from the " +
      "manifest; per-type day-one aggregate vs raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("tswh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq226_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.events(s, d)
        .select("event_id", "ts", "event_type", "value")
        .createOrReplaceTempView("q226_events")
      s.sql(s"CREATE NAMESPACE $cat.series")
      s.sql(s"CREATE TABLE $cat.series.ev " +
        "(event_id BIGINT, ts TIMESTAMP, event_type STRING, " +
        "value DOUBLE) CLUSTER BY (ts) " +
        s"TBLPROPERTIES ('${graft.sources.ManagedTable
          .TargetFileSizeProp}' = '65536')")
      // one full-range insert: the declared clustering range-shuffles
      // on ts into time-disjoint files (AQE pinned down to honor the
      // small demonstration targetFileSize, as in q220)
      s.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      s.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "16384")
      try
        s.sql(s"INSERT INTO $cat.series.ev " +
          "SELECT event_id, ts, event_type, value FROM q226_events")
      finally {
        s.conf.unset(
          "spark.sql.adaptive.coalescePartitions.parallelismFirst")
        s.conf.unset(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      }
      // manifest-only MIN/MAX (flag: GraftAggScan in the plan)
      val mm = s.sql(s"SELECT unix_micros(min(ts)) AS min_us, " +
        s"unix_micros(max(ts)) AS max_us FROM $cat.series.ev")
      val mmPlan = { mm.collect(); mm.queryExecution.executedPlan
        .toString }
      val aggFromManifest = mmPlan.contains("GraftAggScan")
      val loUs = mm.collect().head.getLong(0)
      // one-day probe window [*, min + 1 day): µs-aligned boundary
      val hiUs = loUs + 86400000000L
      val probe = s.sql(s"SELECT event_type, count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) " +
        s"AS sum_value FROM $cat.series.ev " +
        s"WHERE ts < timestamp_micros(${hiUs}L) GROUP BY event_type")
      probe.collect()
      val kept = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(
        probe.queryExecution.executedPlan.toString)
      // the pruning proof needs the insert to have SPLIT (at the
      // smallest SF the whole month fits one file — vacuously true
      // there, a real strictly-fewer check from sf0.01 up)
      val prunes = kept.exists(m => m.group(2).toInt <= 2 ||
        m.group(1).toInt < m.group(2).toInt)
      probe
        .withColumn("min_us", lit(loUs))
        .withColumn("agg_from_manifest", lit(aggFromManifest))
        .withColumn("range_prunes", lit(prunes))
        .orderBy("event_type")
    },
    Some("""WITH b AS (SELECT MIN(ts) AS lo FROM events)
           |SELECT event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_value,
           |  (SELECT epoch_us(lo) FROM b) AS min_us,
           |  true AS agg_from_manifest, true AS range_prunes
           |FROM events WHERE ts < (SELECT lo FROM b) + INTERVAL 1 DAY
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q227: DIGEST STALENESS LIFECYCLE THROUGH SQL — Bloom sidecars
    * are built at commit and never mutated, so DV deletes leave a
    * file's digest full of dead values: fail-open (never a wrong
    * answer) but the effective false-positive rate decays toward
    * no-skipping exactly on hot deleteWhere tables. The operator
    * loop this query pins: `CALL system.detail` REPORTS the decay
    * (num_stale_digests, max_digest_staleness) and
    * `CALL system.compact(rewrite_dv_fraction => f)` REPAIRS it —
    * files whose tombstones cover ≥ f of their rows are rewritten
    * regardless of size, deletes materialize, digests rebuild from
    * survivors in the same commit's stats pass, and the DV reference
    * drops once no kept file is tombstoned. The delete is a RANGE
    * (exactly translatable to pushed filters — the DV path; a
    * non-translatable predicate like `doc_id % 2 = 0` would fall back
    * to copy-on-write and leave nothing stale to report), and the
    * purge threshold is set below 1/|slice| so every tombstoned file
    * qualifies whatever the file layout at any SF.
    */
  val q227DigestStaleness = NamedQuery(
    "q227_digest_staleness",
    "system.detail digest staleness + compact(rewrite_dv_fraction): " +
      "DV delete dirties per-file Bloom digests, detail reports the " +
      "decay, purge compaction rebuilds from survivors; vs " +
      "raw-parquet oracle.",
    (s, d) => {
      val wh = graft.Scratch.dir("dgwh", d)
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val cat = "gq227_" +
        Integer.toHexString(wh.hashCode & Int.MaxValue)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      Tables.documents(s, d).filter(col("doc_id") < 400)
        .select("doc_id", "lang", "n_chars")
        .createOrReplaceTempView("q227_docs")
      s.sql(s"CREATE NAMESPACE $cat.corpus")
      s.sql(s"CREATE TABLE $cat.corpus.docs " +
        "(doc_id BIGINT, lang STRING, n_chars BIGINT) " +
        "CLUSTER BY (doc_id) TBLPROPERTIES (" +
        s"'${graft.sources.BloomSkipping.ColumnsProp}' = 'doc_id')")
      s.sql(s"INSERT INTO $cat.corpus.docs " +
        "SELECT doc_id, lang, n_chars FROM q227_docs")
      def det() = s.sql(
        s"CALL $cat.system.detail(`table` => 'corpus.docs')")
        .collect().head
      val d0 = det()
      val freshOk = d0.getAs[Int]("num_digested_files") > 0 &&
        d0.getAs[Int]("num_stale_digests") == 0 &&
        d0.isNullAt(d0.fieldIndex("max_digest_staleness"))
      s.sql(s"DELETE FROM $cat.corpus.docs " +
        "WHERE doc_id >= 100 AND doc_id < 300")
      val d1 = det()
      // pigeonhole: 200 of the 400 digested rows are tombstoned, so
      // SOME digested file is ≥ 0.5 stale — layout-independent
      val staleSeen = d1.getAs[Int]("num_dv_files") > 0 &&
        d1.getAs[Int]("num_stale_digests") > 0 &&
        !d1.isNullAt(d1.fieldIndex("max_digest_staleness")) &&
        d1.getAs[Double]("max_digest_staleness") >= 0.5
      s.sql(s"CALL $cat.system.compact(`table` => 'corpus.docs', " +
        "small_file_bytes => 1, rewrite_dv_fraction => 0.002)")
      val d2 = det()
      val purged = d2.getAs[Int]("num_dv_files") == 0 &&
        d2.getAs[Int]("num_stale_digests") == 0 &&
        d2.isNullAt(d2.fieldIndex("max_digest_staleness")) &&
        !d2.isNullAt(d2.fieldIndex("live_rows"))
      s.table(s"$cat.corpus.docs")
        .withColumn("fresh_ok", lit(freshOk))
        .withColumn("stale_seen", lit(staleSeen))
        .withColumn("purged", lit(purged))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars, true AS fresh_ok,
           |  true AS stale_seen, true AS purged
           |FROM documents
           |WHERE doc_id < 100 OR (doc_id >= 300 AND doc_id < 400)
           |ORDER BY doc_id""".stripMargin))

  /** q229: STREAM FROM AN INSTANT — `readStream.option(
    * "startingTimestamp", t)` (Delta's option): the stream replays
    * only the commits made at or after `t`, resolved ONCE at scan
    * build to the smallest qualifying version (one manifest-mtime
    * sweep), then the ordinary version-offset machinery drains them.
    * The operational shape this unlocks at 100 TB: "reprocess
    * everything since yesterday's bad deploy" without knowing version
    * numbers — the instant comes from an incident timeline, not the
    * table's internals. The cut instant here derives from the middle
    * commit's own manifest mtime, so the boundary is exact whatever
    * the host's clock or speed; the stream must emit slices B and C,
    * never A.
    */
  val q229StartingTimestamp = NamedQuery(
    "q229_starting_timestamp",
    "readStream.option(startingTimestamp): replay only commits at or " +
      "after an instant (resolved against manifest commit times); " +
      "mid-commit cut emits exactly the later slices vs raw-parquet " +
      "oracle.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = graft.sources.ManagedTable
      val root = graft.Scratch.dir("stts", d)
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val src = s"$root/src"
      val docs = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select("doc_id", "lang", "n_chars")
      M.appendCommit(docs.filter(col("doc_id") < 150), src)  // A: v1
      M.appendCommit(docs.filter(col("doc_id") >= 150 &&
        col("doc_id") < 300), src)                           // B: v2
      M.appendCommit(docs.filter(col("doc_id") >= 300), src) // C: v3
      // the cut: exactly v2's commit instant — "at or after" admits
      // B and C; A's manifest landed strictly earlier (each commit is
      // a full Spark write, far above mtime resolution)
      val cutMs = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(src, "_manifest/v2.json"))
        .getModificationTime
      val buf =
        scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      val q = s.readStream.format("graft")
        .option("startingTimestamp", cutMs.toString)
        .load(src)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            buf.synchronized { buf ++= b.collect().map(r =>
              (r.getLong(0), r.getString(1), r.getLong(2))) }; ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import s.implicits._
      buf.synchronized { buf.toSeq }
        .toDF("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents
           |WHERE doc_id >= 150 AND doc_id < 400
           |ORDER BY doc_id""".stripMargin))

  /** q231: STREAMING CHANGE FEED — `readStream.format("graft")
    * .option("readChangeFeed", true)` (Delta's option): the table as
    * a stream of row-level changes. Appended versions emit their rows
    * as `insert`; DV deletes emit the tombstoned rows' preimages as
    * `delete` (a positional read: row groups without a newly
    * tombstoned position are skipped wholesale and reading stops
    * after the last one, with the positions themselves resolved
    * executor-side from the DV sidecar); a replaceWhere emits its deletes AND its
    * replacement inserts under ONE commit version; copy-on-write
    * file swaps fail fast toward the keyed batch diff. This is the
    * LIVE half of the CDF tier the index-maintenance family
    * (q184–q199) consumes in batch — at 100 TB an incremental
    * consumer (index builder, aggregate maintainer, replication)
    * follows the changes-scale stream instead of rescanning the
    * table. All change attribution is manifest set arithmetic plus
    * the deleted-rows-sized DV parquet; no table scan anywhere.
    */
  val q231StreamingChangeFeed = NamedQuery(
    "q231_streaming_change_feed",
    "readStream readChangeFeed: appends as inserts, DV deletes as " +
      "preimage rows, replaceWhere as delete+insert in one version, " +
      "with commit-version attribution; vs raw-parquet oracle.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val M = graft.sources.ManagedTable
      val root = graft.Scratch.dir("cdfq", d)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val src = s"$root/src"
      val docs = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select("doc_id", "lang", "n_chars")
      M.appendCommit(docs.filter(col("doc_id") < 200), src)       // v1
      M.appendCommit(docs.filter(col("doc_id") >= 200), src)      // v2
      M.deleteWhere(s, src,
        col("doc_id") >= 100 && col("doc_id") < 150)              // v3
      M.replaceWhere(s, src,
        col("doc_id") >= 300 && col("doc_id") < 320,
        docs.filter(col("doc_id") >= 300 && col("doc_id") < 320)
          .withColumn("n_chars", col("n_chars") + 1000L))         // v4
      val buf = scala.collection.mutable
        .ArrayBuffer.empty[(String, Int, Long, String, Long)]
      val q = s.readStream.format("graft")
        .option("readChangeFeed", "true").load(src)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            buf.synchronized { buf ++= b.collect().map(r => (
              r.getAs[String]("_change_type"),
              r.getAs[Long]("_commit_version").toInt,
              r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
              r.getAs[Long]("n_chars"))) }; ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import s.implicits._
      buf.synchronized { buf.toSeq }
        .toDF("change_type", "commit_version", "doc_id", "lang",
          "n_chars")
        .orderBy("commit_version", "change_type", "doc_id")
    },
    Some("""SELECT * FROM (
           |  SELECT 'insert' AS change_type, 1 AS commit_version,
           |    doc_id, lang, n_chars
           |  FROM documents WHERE doc_id < 200
           |  UNION ALL
           |  SELECT 'insert', 2, doc_id, lang, n_chars
           |  FROM documents WHERE doc_id >= 200 AND doc_id < 400
           |  UNION ALL
           |  SELECT 'delete', 3, doc_id, lang, n_chars
           |  FROM documents WHERE doc_id >= 100 AND doc_id < 150
           |  UNION ALL
           |  SELECT 'delete', 4, doc_id, lang, n_chars
           |  FROM documents WHERE doc_id >= 300 AND doc_id < 320
           |  UNION ALL
           |  SELECT 'insert', 4, doc_id, lang, n_chars + 1000
           |  FROM documents WHERE doc_id >= 300 AND doc_id < 320
           |) ORDER BY commit_version, change_type, doc_id""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(q67PartitionedLayout, q90ZorderCurve, q100ManagedTable,
      q115MergeUpsert, q116DataSkipping, q120CompactionLifecycle,
      q130IncrementalView, q146BucketedJoin, q151ZorderCompaction,
      q152ChangeDataFeed, q163DeletionVectors, q165Restore,
      q179Backfill, q201ConnectorRead, q202ConnectorStream,
      q203ConnectorWrite, q204ConnectorPipe, q205CatalogSql,
      q206MetadataAgg, q207LimitCount, q208TopnPushdown,
      q209SqlDelete, q210SqlReplaceWhere, q211SqlUpdate,
      q212MergeInto, q213SqlAlterTable, q214VacuumHistory,
      q215StreamToTable, q216SqlMaintenance, q217ColumnMapping,
      q218Constraints, q219TypeWidening, q220ClusteredCreate,
      q221AutoEvolution, q222ColumnDefaults, q223BloomSkipping,
      q224SqlChangesDetail, q225RetroDigest, q226TimeseriesLayout,
      q227DigestStaleness, q229StartingTimestamp,
      q231StreamingChangeFeed)
}
