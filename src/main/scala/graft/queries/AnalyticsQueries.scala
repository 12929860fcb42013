package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}

/** Analytics-surface completeness beyond the reference's own operators:
  * distinct aggregates, ROLLUP grouping sets, semi/anti joins, and exact
  * interpolated percentiles — each with a full DuckDB oracle.
  */
object AnalyticsQueries {

  val q29DistinctAggs = NamedQuery(
    "q29_distinct_aggs",
    "COUNT(DISTINCT) alongside plain aggregates (Expand-based distinct " +
      "aggregation; partial aggregation still applies to the plain ones).",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
           |  COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  val q30Rollup = NamedQuery(
    "q30_rollup",
    "ROLLUP grouping sets over the region→nation hierarchy with " +
      "GROUPING() flags disambiguating subtotal rows from real NULLs.",
    (s, d) => {
      // DataFrame rollup path. The STRING varargs overload
      // `rollup("a", "b")` trips DetectAmbiguousSelfJoin in Spark 4.1.2
      // when the child is a join (the Expand duplicates dataset-id-tagged
      // grouping attrs; QueriesSmokeSpec pins the repro) — the COLUMN
      // overload `rollup(col("a"), col("b"))` resolves fine, including
      // per-column GROUPING() flags and the NULLS FIRST ordering.
      val base = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region_name"),
          col("n_name").as("nation_name"), col("c_acctbal"))
      base.rollup(col("region_name"), col("nation_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_acctbal"),
          (grouping(col("region_name")) * 2 + grouping(col("nation_name")))
            .cast("long").as("grouping_flags"))
        .orderBy(col("grouping_flags"),
          col("region_name").asc_nulls_first,
          col("nation_name").asc_nulls_first)
    },
    Some("""SELECT r_name AS region_name, n_name AS nation_name,
           |  COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
           |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS grouping_flags
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP(r_name, n_name)
           |ORDER BY grouping_flags, region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST"""
      .stripMargin))

  val q31SemiAnti = NamedQuery(
    "q31_semi_anti_join",
    "left_semi / left_anti joins (EXISTS / NOT EXISTS): customers with " +
      "and without orders, unioned with a cohort tag.",
    (s, d) => {
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d).select("o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .withColumn("cohort", lit("with_orders"))
        .unionByName(
          c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
            .withColumn("cohort", lit("no_orders")))
        .orderBy("cohort", "c_custkey")
    },
    Some("""SELECT c_custkey, 'with_orders' AS cohort FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |UNION ALL
           |SELECT c_custkey, 'no_orders' AS cohort FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY cohort, c_custkey""".stripMargin))

  val q32Percentiles = NamedQuery(
    "q32_percentiles",
    "Exact interpolated percentiles (p50/p90) per event_type, " +
      "floor-scaled for cross-engine fp stability (Spark percentile() and " +
      "DuckDB quantile_cont share the linear-interpolation definition).",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          floor(expr("percentile(value, 0.5)") * lit(1000000.0)).cast("long")
            .as("p50_fp"),
          floor(expr("percentile(value, 0.9)") * lit(1000000.0)).cast("long")
            .as("p90_fp"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
           |  CAST(floor(quantile_cont(value, 0.5) * 1000000.0) AS BIGINT) AS p50_fp,
           |  CAST(floor(quantile_cont(value, 0.9) * 1000000.0) AS BIGINT) AS p90_fp,
           |  COUNT(*) AS n
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q44: approximate quantiles from a MERGEABLE bucket histogram — the
    * 100 TB alternative to q32's exact `percentile()` (which must gather
    * and sort every group's values): one hash-aggregate over
    * (group, bucket) with map-side partial counts, a cumulative window
    * over ≤ |buckets| rows per group, then "smallest bucket whose
    * cumulative count reaches ceil(q·n)". Error is bounded by the bucket
    * width (0.01 here); everything is integer math, so the sketch is
    * deterministic and engine-independent — unlike approx_percentile's
    * internal digest.
    */
  val q44HistogramQuantiles = NamedQuery(
    "q44_histogram_quantiles",
    "Approximate p50/p90 per event_type from a 0.01-wide bucket " +
      "histogram (mergeable counts + cumulative window), next to the " +
      "group sizes; bucket lower edge emitted as an fp6 long.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("bucket"))
      val counts = ev.groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("bucket")
      val cum = counts.withColumn("cum", sum(col("c")).over(w))
        .join(counts.groupBy("event_type").agg(sum(col("c")).as("n")), "event_type")
      def q(p: Double, name: String) = cum
        .filter(col("cum") >= ceil(lit(p) * col("n")))
        .groupBy("event_type")
        // bucket/100 scaled by 1e6 = bucket*10000: pure integer, exact
        .agg((min(col("bucket")) * 10000).as(name))
      q(0.5, "p50_approx_fp")
        .join(q(0.9, "p90_approx_fp"), "event_type")
        .join(cum.groupBy("event_type").agg(max(col("n")).as("n")), "event_type")
        .orderBy("event_type")
    },
    Some("""WITH b AS (SELECT event_type,
           |    CAST(floor(value * 100) AS BIGINT) AS bucket FROM events),
           |counts AS (SELECT event_type, bucket, COUNT(*) AS c
           |  FROM b GROUP BY event_type, bucket),
           |cum AS (SELECT event_type, bucket, c,
           |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum
           |  FROM counts),
           |tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
           |  FROM counts GROUP BY event_type),
           |j AS (SELECT cum.*, tot.n FROM cum JOIN tot ON cum.event_type = tot.event_type),
           |p50 AS (SELECT event_type, MIN(bucket) * 10000 AS p50_approx_fp
           |  FROM j WHERE cum >= ceil(0.5 * n) GROUP BY event_type),
           |p90 AS (SELECT event_type, MIN(bucket) * 10000 AS p90_approx_fp
           |  FROM j WHERE cum >= ceil(0.9 * n) GROUP BY event_type)
           |SELECT p50.event_type, p50_approx_fp, p90_approx_fp, tot.n
           |FROM p50 JOIN p90 ON p50.event_type = p90.event_type
           |JOIN tot ON p50.event_type = tot.event_type
           |ORDER BY p50.event_type""".stripMargin))

  /** q47: skew-salted two-phase aggregation under the oracle gate — the
    * explicit hot-key mitigation: phase 1 aggregates on
    * (key, deterministic salt), spreading a hot key over 8 reducers;
    * phase 2 merges per key. Decimal sums make both phases exact, so
    * the result is value-identical to the direct single-phase GROUP BY
    * the oracle runs — which is precisely the property that makes
    * salting safe to apply.
    */
  val q47SaltedAgg = NamedQuery(
    "q47_salted_agg",
    "Two-phase salted aggregation over events (8 salt buckets) equals " +
      "the plain per-event_type aggregate: count + decimal-exact sum.",
    (s, d) =>
      graft.operators.Salting.saltedAggregate(
          Tables.events(s, d),
          keys = Seq("event_type"),
          idCols = Seq(col("event_id")),
          saltBuckets = 8,
          phase1 = Seq(count(lit(1)).as("c"),
            sum(col("value").cast("decimal(18,2)")).as("sv")),
          phase2 = Seq(sum(col("c")).as("n_events"),
            sum(col("sv")).cast("double").as("sum_value")))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q48: PIVOT — `groupBy().pivot(col, values)` with explicit pivot
    * values (never value-discovery at scale: that is a full extra scan
    * plus a driver collect). Compiles to one hash aggregation with a
    * conditional-aggregate column per pivot value — exactly the CASE
    * formulation the oracle writes out, so the shapes are provably the
    * same plan.
    */
  val q48Pivot = NamedQuery(
    "q48_pivot",
    "Event counts per user pivoted into one column per event_type " +
      "(explicit pivot values; single hash aggregation).",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
    Some("""SELECT user_id,
           |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
           |  CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
           |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           |  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
           |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** q49: INTERSECT / EXCEPT set algebra (distinct semantics) over two
    * customer cohorts — the remaining set operators after q10's UNION:
    * both plan as aggregations/joins on the full row, no sort needed.
    */
  val q49SetAlgebra = NamedQuery(
    "q49_set_algebra",
    "INTERSECT and EXCEPT of two order-derived customer cohorts " +
      "(high-value vs recent), unioned with a tag column.",
    (s, d) => {
      val o = Tables.orders(s, d)
      val highValue = o.filter(col("o_totalprice") > 150000.0)
        .select("o_custkey").distinct()
      val recent = o.filter(col("o_orderdate") >=
          lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .select("o_custkey").distinct()
      highValue.intersect(recent).withColumn("cohort", lit("both"))
        .unionByName(
          highValue.except(recent).withColumn("cohort", lit("high_only")))
        .orderBy("cohort", "o_custkey")
    },
    Some("""WITH hv AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0),
           |rc AS (SELECT DISTINCT o_custkey FROM orders
           |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
           |SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM hv INTERSECT SELECT * FROM rc)
           |UNION ALL
           |SELECT o_custkey, 'high_only' AS cohort FROM (SELECT * FROM hv EXCEPT SELECT * FROM rc)
           |ORDER BY cohort, o_custkey""".stripMargin))

  /** q50: correlated scalar subquery — customers above their own
    * nation's average balance. Catalyst decorrelates this into an
    * aggregate + join (visible in the plan), which is why it scales:
    * the subquery runs once per nation, not once per customer row.
    */
  val q50ScalarSubquery = NamedQuery(
    "q50_scalar_subquery",
    "Correlated scalar subquery (decorrelated to agg+join by Catalyst): " +
      "customers with above-nation-average account balance.",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("q50_customer")
      // avg as exact-decimal-sum / count: AVG(DECIMAL) has different
      // result types across engines (Spark: wider decimal; DuckDB:
      // double), which could flip boundary rows — this formulation is
      // bit-identical on both
      s.sql("""SELECT c_custkey, c_nationkey,
              |  CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_fp2
              |FROM q50_customer c
              |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              |                   FROM q50_customer c2
              |                   WHERE c2.c_nationkey = c.c_nationkey)
              |ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT c_custkey, c_nationkey,
           |  CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_fp2
           |FROM customer c
           |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           |                   FROM customer c2
           |                   WHERE c2.c_nationkey = c.c_nationkey)
           |ORDER BY c_custkey""".stripMargin))

  /** q70: NTILE bucketing — equal-count quartiles of document length
    * WITHIN each language, the binning step behind length-balanced
    * batch construction and per-stratum curriculum schedules. NTILE is
    * inherently a per-partition total order, so the partition key is
    * the language (parallel across strata, one sort per stratum — the
    * q52 per-group shape, never a single global sort), and the order
    * is made total with the doc_id tiebreak so both engines assign the
    * remainder rows of uneven buckets identically.
    */
  val q70NtileQuartiles = NamedQuery(
    "q70_ntile_quartiles",
    "Per-language token-count quartiles via NTILE(4) (doc_id-total " +
      "order): bucket row counts and min/max token bounds.",
    (s, d) => {
      import graft.functions.TextFunctions.tokens
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n_tokens").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("q", ntile(4).over(w).cast("long"))
        .groupBy("lang", "q")
        .agg(count(lit(1)).as("n_docs"),
          min("n_tokens").as("min_tokens"),
          max("n_tokens").as("max_tokens"))
        .orderBy("lang", "q")
    },
    Some("""SELECT lang, q, COUNT(*) AS n_docs,
           |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
           |FROM (SELECT lang, doc_id,
           |    CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tokens,
           |    CAST(ntile(4) OVER (PARTITION BY lang
           |      ORDER BY len(string_split(lower(text),' ')), doc_id)
           |      AS BIGINT) AS q
           |  FROM documents)
           |GROUP BY lang, q ORDER BY lang, q""".stripMargin))

  /** q73: CUBE grouping sets — all 2² margins of (region, segment) in
    * one pass, completing the grouping-sets surface next to q30's
    * hierarchical ROLLUP. Same Column-overload discipline as q30 (the
    * String overload trips DetectAmbiguousSelfJoin after a join in
    * Spark 4.1.2), same GROUPING() flags to separate subtotal rows
    * from real NULLs. One Expand (4× rows, row-local) + one hash-agg;
    * partial aggregation applies per grouping set, so the shuffle
    * carries at most 4·|groups| rows.
    */
  val q73Cube = NamedQuery(
    "q73_cube",
    "CUBE over (region, market segment): counts + exact decimal " +
      "acctbal sums for every margin, GROUPING() flags disambiguating " +
      "subtotals.",
    (s, d) => {
      val base = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region_name"),
          col("c_mktsegment").as("segment"), col("c_acctbal"))
      base.cube(col("region_name"), col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_acctbal"),
          (grouping(col("region_name")) * 2 + grouping(col("segment")))
            .cast("long").as("grouping_flags"))
        .orderBy(col("grouping_flags"),
          col("region_name").asc_nulls_first, col("segment").asc_nulls_first)
    },
    Some("""SELECT r_name AS region_name, c_mktsegment AS segment,
           |  COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_acctbal,
           |  CAST(GROUPING(r_name) * 2 + GROUPING(c_mktsegment) AS BIGINT)
           |    AS grouping_flags
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY CUBE(r_name, c_mktsegment)
           |ORDER BY grouping_flags, region_name ASC NULLS FIRST,
           |  segment ASC NULLS FIRST""".stripMargin))

  /** q74: the ranking-window completeness suite — rank, dense_rank,
    * percent_rank, cume_dist, and nth_value in one pass over a single
    * per-type window sort (all five share the one partition+order, so
    * Spark evaluates them in a single Window operator — one shuffle,
    * one sort). percent_rank/cume_dist are floor-scaled to fp6: both
    * engines compute the same (rank−1)/(n−1) and rows≤current/n
    * doubles from exact longs, and one correctly-rounded divide is
    * bit-stable cross-engine. nth_value uses the explicit full frame
    * (frame-independent), and a partition with fewer than 3 rows —
    * where nth_value is NULL in both engines — is resolved to -1 so
    * the output stays null-free for the driver compare.
    */
  val q74RankingSuite = NamedQuery(
    "q74_ranking_suite",
    "rank/dense_rank/percent_rank/cume_dist/nth_value(3) per event " +
      "type over (value, event_id) for users 0-2, fp6-scaled ratios.",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("value").asc, col("event_id").asc)
      val wFull = w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") < 3)
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("pr_fp6",
          floor(percent_rank().over(w) * lit(1000000.0)).cast("long"))
        .withColumn("cd_fp6",
          floor(cume_dist().over(w) * lit(1000000.0)).cast("long"))
        .withColumn("third_value",
          coalesce(nth_value(col("value"), 3).over(wFull), lit(-1.0)))
        .orderBy("event_type", "rnk", "event_id")
    },
    Some("""SELECT event_id, event_type, value,
           |  CAST(rank() OVER w AS BIGINT) AS rnk,
           |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           |  CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT)
           |    AS pr_fp6,
           |  CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT)
           |    AS cd_fp6,
           |  COALESCE(nth_value(value, 3) OVER (PARTITION BY event_type
           |    ORDER BY value, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           |    -1.0) AS third_value
           |FROM events WHERE user_id < 3
           |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
           |ORDER BY event_type, rnk, event_id""".stripMargin))

  /** q106: map-typed columns end-to-end — `props` parsed as
    * `map<string,string>` (`from_json` with a MapType, the schema-free
    * path for ragged JSON where q11's struct extraction needs fixed
    * fields), the map EXPLODED to (key, value) rows, and per
    * (event_type, key) stats aggregated. Scale shape: the explode is
    * row-local fan-out by map size; one hash-agg after it.
    */
  val q106PropsMap = NamedQuery(
    "q106_props_map",
    "props as map<string,string>: explode entries, per (event_type, " +
      "key) counts, distinct values, min/max numeric value.",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)))
            .as(Seq("key", "val")))
        .groupBy("event_type", "key")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val").cast("long")).as("min_v"),
          max(col("val").cast("long")).as("max_v"))
        .orderBy("event_type", "key"),
    Some("""WITH kv AS (SELECT event_type, u AS key,
           |    json_extract_string(props, '$.' || u) AS val
           |  FROM events, unnest(json_keys(props)) AS t(u))
           |SELECT event_type, key, COUNT(*) AS n,
           |  CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           |  MIN(CAST(val AS BIGINT)) AS min_v,
           |  MAX(CAST(val AS BIGINT)) AS max_v
           |FROM kv GROUP BY event_type, key
           |ORDER BY event_type, key""".stripMargin))

  /** q107: UNPIVOT/melt — the inverse of q48's PIVOT and the reshape
    * every per-metric analysis starts from: lineitem's three rate
    * columns melt into (metric, value) rows via the native
    * `Dataset.unpivot` (wide→long without N self-unions), then
    * decimal-exact per-(returnflag, metric) aggregation.
    */
  val q107UnpivotMelt = NamedQuery(
    "q107_unpivot_melt",
    "Melt (l_tax, l_discount, l_quantity) to long form with " +
      "Dataset.unpivot; per (returnflag, metric) count + exact sum.",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_tax"), col("l_discount"),
          col("l_quantity"))
        .unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("l_tax"), col("l_discount"), col("l_quantity")),
          variableColumnName = "metric",
          valueColumnName = "v")
        .groupBy("l_returnflag", "metric")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_v"))
        .orderBy("l_returnflag", "metric"),
    Some("""SELECT l_returnflag, metric, COUNT(*) AS n,
           |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
           |FROM (
           |  SELECT l_returnflag, 'l_tax' AS metric, l_tax AS v FROM lineitem
           |  UNION ALL
           |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
           |  UNION ALL
           |  SELECT l_returnflag, 'l_quantity', l_quantity FROM lineitem)
           |GROUP BY l_returnflag, metric
           |ORDER BY l_returnflag, metric""".stripMargin))

  /** q111: MAD robust outliers — the median-based complement to q63's
    * z-score (a mean/stddev pair is itself dragged by the outliers it
    * hunts; median absolute deviation is not): per event_type,
    * med = p50(value), mad = p50(|value − med|), outlier ⟺
    * |value − med| > 3·mad. Percentiles ride the q32-proven
    * percentile()↔quantile_cont parity; the per-row deviation is one
    * IEEE subtract in both engines, so the boundary comparison cannot
    * drift. Two-pass shape (q63's): a broadcast 1-row-per-group stats
    * table probes the narrow value column twice — no corpus shuffle.
    */
  val q111MadOutliers = NamedQuery(
    "q111_mad_outliers",
    "MAD-based robust outliers per event_type: median, median absolute " +
      "deviation, |v - med| > 3*mad counts and fp6 ratio.",
    (s, d) => {
      val ev = Tables.events(s, d).select("event_type", "value")
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad.select("event_type", "mad")), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          floor(first("med") * lit(1000000.0)).cast("long").as("med_fp"),
          floor(first("mad") * lit(1000000.0)).cast("long").as("mad_fp"),
          count(when(col("dev") > lit(3.0) * col("mad"), 1)).as("n_outliers"))
        .withColumn("outlier_ratio_fp",
          floor(col("n_outliers") * lit(1000000.0) / col("n")).cast("long"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           |  FROM events GROUP BY event_type),
           |dev AS (SELECT e.event_type, e.value, m.med,
           |    abs(e.value - m.med) AS dev
           |  FROM events e JOIN med m USING (event_type)),
           |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
           |  FROM dev GROUP BY event_type)
           |SELECT d.event_type, COUNT(*) AS n,
           |  CAST(floor(ANY_VALUE(d.med) * 1000000.0) AS BIGINT) AS med_fp,
           |  CAST(floor(ANY_VALUE(m.mad) * 1000000.0) AS BIGINT) AS mad_fp,
           |  CAST(COUNT(CASE WHEN d.dev > 3.0 * m.mad THEN 1 END) AS BIGINT)
           |    AS n_outliers,
           |  CAST(floor(CAST(COUNT(CASE WHEN d.dev > 3.0 * m.mad THEN 1 END)
           |    AS DOUBLE) * 1000000.0 / COUNT(*)) AS BIGINT)
           |    AS outlier_ratio_fp
           |FROM dev d JOIN mad m USING (event_type)
           |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin))

  private val MinItemSupport = 35L // orders containing the item
  private val MinPairSupport = 2L  // orders containing both items

  /** q124: A-priori frequent-pair mining (market basket) — the
    * combinatorial-explosion-control pattern: raw per-basket pair
    * expansion is Σ C(k,2), quadratic in basket width, but by the
    * a-priori property a pair can only be frequent if BOTH items are,
    * so baskets are first filtered down to frequent items
    * ($MinItemSupport+ orders) and only then expanded. Lift is exact
    * integer fp6: support(a,b)·N·1e6 div (support(a)·support(b)).
    * Scale shape: the only corpus-wide shuffle is the basket build's
    * groupBy(order) — collect_set fuses the (order,item) dedup into
    * that same exchange. Supports come off the cached baskets by
    * row-local explode + hash-agg (map-side partials shrink it to
    * |items| per partition); the frequent-item filter+support carry is
    * a BROADCAST join (the frequent set is support-thresholded, tiny
    * by construction), never a shuffled join; the per-order re-collect
    * after it exchanges only the a-priori-filtered (order, freq-item)
    * rows. Pair expansion is row-local over each basket's sorted
    * frequent-item array (transform×slice, codegen'd collection ops),
    * so the pair agg's shuffle is ∝ surviving pairs, never raw C(k,2);
    * the 1-row order count broadcasts. Plan-guarded: one parquet scan,
    * no SortMergeJoin, no CartesianProduct.
    */
  val q124FrequentPairs = NamedQuery(
    "q124_frequent_pairs",
    s"A-priori market-basket pairs: items in >=$MinItemSupport orders, " +
      s"pairs co-occurring in >=$MinPairSupport; support + exact fp6 lift.",
    (s, d) => {
      val baskets = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .groupBy("o").agg(collect_set(col("p")).as("items"))
        .cache() // N, supports and the frequent-filter all read it
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      val sup = baskets.select(explode(col("items")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("s"))
        .filter(col("s") >= MinItemSupport)
      val fb = baskets
        .select(col("o"), explode(col("items")).as("p"))
        .join(broadcast(sup), "p")
        .groupBy("o") // narrow: reuses the baskets exchange
        .agg(sort_array(collect_list(struct(col("p"), col("s")))).as("ia"))
      fb.select(explode(expr(
          """flatten(transform(ia, (x, i) ->
            |  transform(slice(ia, i + 2, size(ia)), y ->
            |    struct(x.p AS pa, y.p AS pb, x.s AS sa, y.s AS sb))))"""
            .stripMargin)).as("pr"))
        .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"),
          col("pr.sa").as("sa"), col("pr.sb").as("sb"))
        .groupBy("pa", "pb")
        .agg(count(lit(1)).as("sp"),
          min(col("sa")).as("sa"), min(col("sb")).as("sb"))
        .filter(col("sp") >= MinPairSupport)
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("sp").as("pair_support"),
          // DECIMAL(38,0) BOTH sides: sp*n_orders*1e6 (and sa*sb) clear
          // BIGINT at ~1.5e11 orders (100 TB lineitem); headroom to 1e38
          expr("CAST((CAST(sp AS DECIMAL(38,0)) * n_orders * 1000000) div " +
            "(CAST(sa AS DECIMAL(38,0)) * sb) AS BIGINT)")
            .as("lift_fp6"))
        .orderBy("pa", "pb")
    },
    Some(s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            |    FROM lineitem),
            |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders
            |  FROM op),
            |sup AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS s FROM op
            |  GROUP BY p HAVING COUNT(*) >= $MinItemSupport),
            |fop AS (SELECT o, p, s FROM op JOIN sup USING (p)),
            |pairs AS (SELECT a.p AS pa, b.p AS pb,
            |    CAST(COUNT(*) AS BIGINT) AS sp,
            |    MIN(a.s) AS sa, MIN(b.s) AS sb
            |  FROM fop a JOIN fop b ON a.o = b.o AND a.p < b.p
            |  GROUP BY a.p, b.p HAVING COUNT(*) >= $MinPairSupport)
            |SELECT pa, pb, sp AS pair_support,
            |  CAST((sp::HUGEINT * n_orders * 1000000)
            |    // (sa::HUGEINT * sb) AS BIGINT)
            |    AS lift_fp6
            |FROM pairs, n ORDER BY pa, pb""".stripMargin))

  /** q168: JOIN-SIZE ESTIMATION BY COORDINATED KEY SAMPLING — the
    * planning-time question "how big would this self-join blow up?"
    * answered WITHOUT running it. |events ⋈ events on user_id| =
    * Σ_u c_u² (the second frequency moment — the skew/blow-up number).
    * The estimator samples KEYS, not rows (row sampling biases joins:
    * it thins both sides of every group quadratically; key sampling
    * keeps each sampled group's multiplicity INTACT): a key is in the
    * 1/16 sample iff the first hex char of md5('jse1:'‖user_id) is
    * '0', and in the nested 1/256 sample iff the first TWO chars are
    * '00' — coordinated (nested) samples, both engines md5 the same
    * decimal string (q147's discipline), so the estimate is
    * hash-exact, not just statistically close. Scale shape: ONE
    * per-key hash-agg over events feeds exact AND both estimates; at
    * 100 TB the estimate path alone filters the scan by the row-local
    * hash prefix FIRST and aggregates 1/16 (1/256) of the keys — scan
    * cost, no join executed. Output pins both estimates against the
    * exact F2 with an unsigned fp6 relative error plus its sign
    * (Spark `div` truncates, DuckDB `//` floors — they agree only on
    * non-negative numerators).
    */
  val q168JoinSizeEstimate = NamedQuery(
    "q168_join_size_estimate",
    "Self-join size (F2) estimation by coordinated md5 key sampling " +
      "at 1/16 and 1/256: scaled estimates vs exact, fp6 relative " +
      "error, one per-key hash-agg.",
    (s, d) => {
      val perKey = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("c"))
        .withColumn("hx", md5(concat(lit("jse1:"),
          col("user_id").cast("string"))))
        .cache() // exact + both sampled estimates: one events scan
      def f2(df: org.apache.spark.sql.DataFrame) =
        df.agg(coalesce(sum(col("c") * col("c")), lit(0L)).as("f2"))
      val exact = f2(perKey).select(col("f2").as("exact_f2"))
      val e16 = f2(perKey.filter(substring(col("hx"), 1, 1) === "0"))
        .select((col("f2") * 16).as("est_f2"), lit(16L).as("rate_denom"))
      val e256 = f2(perKey.filter(substring(col("hx"), 1, 2) === "00"))
        .select((col("f2") * 256).as("est_f2"), lit(256L).as("rate_denom"))
      // abs + explicit sign: Spark's `div` truncates toward zero while
      // DuckDB's `//` floors, so a SIGNED fp ratio would hash-diverge
      // on negative errors — the unsigned magnitude is engine-identical
      e16.unionByName(e256)
        .crossJoin(broadcast(exact))
        .select(col("rate_denom"), col("exact_f2"), col("est_f2"),
          // DECIMAL(38,0): f2 sums reach ~1e16 on skewed keys, so the
          // *1e6 clears BIGINT long before the sums themselves do
          expr("CAST((CAST(abs(est_f2 - exact_f2) AS DECIMAL(38,0)) * " +
            "1000000) div exact_f2 AS BIGINT)").as("abs_rel_err_fp"),
          signum((col("est_f2") - col("exact_f2")).cast("double"))
            .cast("long").as("err_sign"))
        .orderBy("rate_denom")
    },
    Some("""WITH pk AS (SELECT user_id, COUNT(*) AS c,
           |    md5('jse1:' || CAST(user_id AS VARCHAR)) AS hx
           |  FROM events GROUP BY 1),
           |ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM pk),
           |est AS (
           |  SELECT 16 AS rate_denom,
           |    CAST(COALESCE(SUM(c * c), 0) * 16 AS BIGINT) AS est_f2
           |  FROM pk WHERE substring(hx, 1, 1) = '0'
           |  UNION ALL
           |  SELECT 256,
           |    CAST(COALESCE(SUM(c * c), 0) * 256 AS BIGINT)
           |  FROM pk WHERE substring(hx, 1, 2) = '00')
           |SELECT CAST(rate_denom AS BIGINT) AS rate_denom, exact_f2,
           |  est_f2,
           |  CAST((abs(est_f2 - exact_f2)::HUGEINT * 1000000) // exact_f2
           |    AS BIGINT) AS abs_rel_err_fp,
           |  CAST(sign(est_f2 - exact_f2) AS BIGINT) AS err_sign
           |FROM est, ex ORDER BY rate_denom""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q29DistinctAggs, q30Rollup, q31SemiAnti, q32Percentiles,
    q44HistogramQuantiles, q47SaltedAgg, q48Pivot, q49SetAlgebra,
    q50ScalarSubquery, q70NtileQuartiles, q73Cube, q74RankingSuite,
    q106PropsMap, q107UnpivotMelt, q111MadOutliers, q124FrequentPairs,
    q168JoinSizeEstimate)
}
