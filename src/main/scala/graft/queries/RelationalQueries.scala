package graft.queries

import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}

/** Reference-parity relational operators over the TPC-H-ish harness tables.
  *
  * Covers SURVEY.md §2 items: S1-S3 (explicit-schema scans), O1-O7
  * (project/filter), J1-J3 (broadcast dim joins + mixed equi/range left
  * outer), A1/A2 (re-nesting agg, gold aggregate with COALESCE/GREATEST),
  * T1/T2 (multi-key sort), U1 (union), and the gold query shape of
  * notebooks/04_Current_Inventory.sql:5-38 re-expressed over orders×lineitem.
  */
object RelationalQueries {

  /** Exact decimal sum of a 2-dp double column, emitted as double. */
  private def decSum(c: String) =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val q45SupplierPartProfit = NamedQuery(
    "q45_supplier_part_profit",
    "TPC-H Q9-style profit rollup: lineitem ⋈ part ⋈ supplier ⋈ nation, " +
      "revenue per (nation, brand) with decimal-exact sums. supplier and " +
      "nation are explicit broadcasts; the part join is left to " +
      "Catalyst/AQE — at 100 TB part outgrows the broadcast threshold " +
      "and becomes a shuffle join on l_partkey, which AQE decides at " +
      "runtime.",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "p_brand")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
            .cast("double").as("revenue"),
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy("n_name", "p_brand"),
    Some("""SELECT n_name, p_brand,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |  SUM(l_quantity) AS sum_qty,
           |  COUNT(*) AS n_lines
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |GROUP BY n_name, p_brand
           |ORDER BY n_name, p_brand""".stripMargin))

  val q01PricingSummary = NamedQuery(
    "q01_pricing_summary",
    "TPC-H Q1-style scan+filter+hash-aggregate with decimal-exact sums " +
      "(SURVEY §2.4 A2 analog; pushdown: shipdate filter reaches the scan).",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          decSum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
           |  SUM(l_quantity) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  val q02FilterProject = NamedQuery(
    "q02_filter_project",
    "Predicate + projection pushdown: returnflag/shipdate filter and 5-col " +
      "projection reach the parquet scan (SURVEY §2.2 O1-O5).",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
           |FROM lineitem
           |WHERE l_returnflag = 'R'
           |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  val q03BroadcastDims = NamedQuery(
    "q03_broadcast_dims",
    "Fact×dim×dim star join — nation/region explicitly broadcast like the " +
      "reference's store/change_type dims (SURVEY §2.3 J1/J2, " +
      "04_Current_Inventory.sql:26-27).",
    (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_customers"),
          decSum("c_acctbal").as("sum_acctbal"))
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name,
           |  COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name
           |ORDER BY r_name, n_name""".stripMargin))

  val q04GoldCurrentInventory = NamedQuery(
    "q04_gold_current_inventory",
    "The reference gold query shape (04_Current_Inventory.sql:11-38): " +
      "snapshot LEFT OUTER JOIN changes on equi keys + `<=` range residual, " +
      "then GROUP BY key with COALESCE(SUM)/GREATEST and a negated-conjunction " +
      "filter (O6). orders=snapshot, lineitem=changes.",
    (s, d) => {
      val o  = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      o.filter(!(col("o_orderstatus") === "F" && col("o_orderpriority").startsWith("1")))
        .join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("o_orderdate") <= col("l_shipdate"),
          "left_outer")
        .groupBy("o_orderkey")
        .agg(
          min("o_totalprice").as("snapshot_total"),
          coalesce(sum("l_quantity"), lit(0.0)).as("change_qty"),
          (min("o_totalprice") + coalesce(sum("l_quantity"), lit(0.0))).as("current_val"),
          date_format(
            greatest(min("o_orderdate"),
              coalesce(max("l_shipdate"), min("o_orderdate"))),
            "yyyy-MM-dd HH:mm:ss").as("last_ts"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT a.o_orderkey AS o_orderkey,
           |  MIN(a.o_totalprice) AS snapshot_total,
           |  COALESCE(SUM(b.l_quantity), 0) AS change_qty,
           |  MIN(a.o_totalprice) + COALESCE(SUM(b.l_quantity), 0) AS current_val,
           |  strftime(GREATEST(MIN(a.o_orderdate),
           |    COALESCE(MAX(b.l_shipdate), MIN(a.o_orderdate))), '%Y-%m-%d %H:%M:%S') AS last_ts
           |FROM orders a
           |LEFT OUTER JOIN lineitem b
           |  ON a.o_orderkey = b.l_orderkey AND a.o_orderdate <= b.l_shipdate
           |WHERE NOT (a.o_orderstatus = 'F' AND a.o_orderpriority LIKE '1%')
           |GROUP BY a.o_orderkey
           |ORDER BY a.o_orderkey""".stripMargin))

  val q09TopK = NamedQuery(
    "q09_topk_orders",
    "Global top-k: ORDER BY value DESC (key tiebreak) LIMIT 100 — Spark " +
      "plans TakeOrderedAndProject (per-partition top-k, no full sort/shuffle " +
      "of the data; SURVEY §2.5 T2).",
    (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin))

  val q10SetOps = NamedQuery(
    "q10_set_ops",
    "DISTINCT / EXCEPT / INTERSECT / UNION ALL cohort analysis over the " +
      "events stream table (SURVEY §2.5 U1, §2.2 O7).",
    (s, d) => {
      val ev = Tables.events(s, d)
      val signup   = ev.filter(col("event_type") === "signup").select("user_id").distinct()
      val purchase = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      signup.except(purchase).withColumn("cohort", lit("signup_no_purchase"))
        .unionByName(signup.intersect(purchase).withColumn("cohort", lit("both")))
        .orderBy("cohort", "user_id")
    },
    Some("""WITH signup AS (SELECT DISTINCT user_id FROM events WHERE event_type='signup'),
           |purchase AS (SELECT DISTINCT user_id FROM events WHERE event_type='purchase')
           |SELECT user_id, 'signup_no_purchase' AS cohort FROM (SELECT * FROM signup EXCEPT SELECT * FROM purchase)
           |UNION ALL
           |SELECT user_id, 'both' AS cohort FROM (SELECT * FROM signup INTERSECT SELECT * FROM purchase)
           |ORDER BY cohort, user_id""".stripMargin))

  /** q72: FULL OUTER join — the reconciliation shape (which side is
    * missing?) that inner/left/semi/anti (q03/q04/q31) don't cover.
    * Both inputs are pre-aggregated to one row per nation BEFORE the
    * join, so the full-outer exchange carries |nations| rows, not the
    * base tables; the acctbal > 9000 filters make each side genuinely
    * sparse so all three match cases occur. Nulls from the unmatched
    * sides are resolved in-query (coalesce + a side tag) — the output
    * is null-free, which keeps the driver's pandas compare trivially
    * stable while the full-outer semantics stay observable via the
    * `side` column.
    */
  val q72FullOuterReconcile = NamedQuery(
    "q72_full_outer_reconcile",
    "FULL OUTER reconciliation of high-balance customer vs supplier " +
      "counts per nation: coalesced counts plus a both/customer_only/" +
      "supplier_only side tag.",
    (s, d) => {
      val cust = graft.Tables.customer(s, d)
        .filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("n_key"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = graft.Tables.supplier(s, d)
        .filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("n_key"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, Seq("n_key"), "full_outer")
        .select(col("n_key").cast("long").as("n_key"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          when(col("n_cust").isNotNull && col("n_supp").isNotNull, "both")
            .when(col("n_cust").isNotNull, "customer_only")
            .otherwise("supplier_only").as("side"))
        .orderBy("n_key")
    },
    Some("""WITH c AS (SELECT c_nationkey AS n_key, COUNT(*) AS n_cust
           |  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
           |s AS (SELECT s_nationkey AS n_key, COUNT(*) AS n_supp
           |  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
           |SELECT CAST(n_key AS BIGINT) AS n_key,
           |  COALESCE(n_cust, 0) AS n_cust,
           |  COALESCE(n_supp, 0) AS n_supp,
           |  CASE WHEN n_cust IS NOT NULL AND n_supp IS NOT NULL THEN 'both'
           |    WHEN n_cust IS NOT NULL THEN 'customer_only'
           |    ELSE 'supplier_only' END AS side
           |FROM c FULL JOIN s USING (n_key)
           |ORDER BY n_key""".stripMargin))

  /** q113: TPC-H Q5's shape — "local supplier volume": revenue by
    * nation for orders in one region and one year where the CUSTOMER'S
    * nation equals the SUPPLIER'S nation (the cross-table residual that
    * makes Q5 the classic join-order test). Six tables: region and
    * nation broadcast (tiny dims), customer broadcast-joined into
    * orders, the orders×lineitem join shuffles on orderkey (the only
    * big-big join), supplier broadcast at the end with the
    * nation-equality residual. Revenue is the exact decimal sum.
    */
  val q113LocalSupplierVolume = NamedQuery(
    "q113_local_supplier_volume",
    "TPC-H Q5 shape: per-nation revenue for EUROPE 1996 orders where " +
      "customer and supplier share the nation; decimal-exact revenue.",
    (s, d) => {
      val nations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d)
            .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           |    AS revenue,
           |  COUNT(*) AS n_items
           |FROM region
           |JOIN nation ON n_regionkey = r_regionkey
           |JOIN customer ON c_nationkey = n_nationkey
           |JOIN orders ON o_custkey = c_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |  AND s_nationkey = c_nationkey
           |WHERE r_name = 'EUROPE'
           |  AND o_orderdate >= DATE '1996-01-01'
           |  AND o_orderdate < DATE '1997-01-01'
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** q114: TPC-H Q4's shape — "order priority checking": per priority,
    * how many orders in a quarter have AT LEAST ONE line item shipped
    * after the order date. The EXISTS is a LEFT SEMI join (each order
    * counted once however many late items it has — a plain inner join
    * would double-count), shuffling only orderkeys; the priority
    * rollup is one small hash-agg.
    */
  val q114PriorityChecking = NamedQuery(
    "q114_priority_checking",
    "TPC-H Q4 shape: orders per priority in 1996Q1 with >= 1 line " +
      "item shipped after the order date (left-semi EXISTS).",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(late,
          ord("o_orderkey") === late("l_orderkey") &&
            late("l_shipdate") > ord("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
           |FROM orders o
           |WHERE o_orderdate >= DATE '1996-01-01'
           |  AND o_orderdate < DATE '1996-04-01'
           |  AND EXISTS (SELECT 1 FROM lineitem l
           |    WHERE l.l_orderkey = o.o_orderkey
           |      AND l.l_shipdate > o.o_orderdate)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** q127: TPC-H Q7's shape — "volume shipping": directional trade
    * volume between two nations by ship year. The scale move is
    * filtering BOTH nation copies to the two names BEFORE any join, so
    * the supplier and customer sides shrink to the two nations'
    * members at the dim joins (semi-join pushdown by construction)
    * instead of carrying the whole fact join to a post-hoc OR filter;
    * the cross-pair restriction then reduces to supp ≠ cust. lineitem
    * ⋈ orders stays the one big-big shuffle; supplier/customer join
    * through broadcast nation-filtered dims (q45's posture: at 100 TB
    * AQE demotes outgrown broadcasts to shuffles at runtime).
    */
  val q127VolumeShipping = NamedQuery(
    "q127_volume_shipping",
    "TPC-H Q7 shape: directional NATION_1<->NATION_2 revenue by ship " +
      "year; nation filters pushed ahead of every join.",
    (s, d) => {
      val picked = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(picked
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(broadcast(picked
            .select(col("n_nationkey").as("c_nk"),
              col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           |    AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
           |  AND n2.n_name IN ('NATION_1', 'NATION_2')
           |  AND n1.n_name <> n2.n_name
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** q128: TPC-H Q8's shape — "national market share": one nation's
    * slice of a region's revenue per order year, as a CONDITIONAL
    * aggregate over one join tree (never two scans): share =
    * Σ(rev | supp_nation = target) / Σ(rev), with the ratio carried in
    * exact integer basis points — both sums are decimal-exact
    * ten-thousandths, so (nat·10000) div total is pure BIGINT math and
    * engine-identical. Region restriction prunes the customer side
    * through broadcast dims before the fact joins.
    */
  val q128MarketShare = NamedQuery(
    "q128_market_share",
    "TPC-H Q8 shape: NATION_3's basis-point share of EUROPE-customer " +
      "revenue by order year; conditional decimal aggregate, one pass.",
    (s, d) => {
      val euroNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.customer(s, d)
        .join(broadcast(euroNations),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nk"),
              col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      // decimal(18,2) × decimal(18,2) has scale 4, so ×10000 is an
      // exact integral — carried as a per-row BIGINT so the sums are
      // order-independent long adds
      val revE4 = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
        .multiply(lit(10000)).cast("long")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, d)
            .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(revE4).as("total_e4"),
          sum(when(col("supp_nation") === "NATION_3", revE4)
            .otherwise(lit(0L))).as("nat_e4"))
        .select(col("o_year"), col("total_e4"), col("nat_e4"),
          expr("CAST((nat_e4 * 10000) div total_e4 AS BIGINT)")
            .as("share_bp"))
        .orderBy("o_year")
    },
    Some("""WITH j AS (SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
           |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |      CAST(1.0 - l_discount AS DECIMAL(18,2)) * 10000
           |      AS BIGINT) AS rev_e4
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
           |  JOIN region ON n1.n_regionkey = r_regionkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
           |  WHERE r_name = 'EUROPE')
           |SELECT CAST(o_year AS BIGINT) AS o_year,
           |  CAST(SUM(rev_e4) AS BIGINT) AS total_e4,
           |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4
           |    ELSE 0 END) AS BIGINT) AS nat_e4,
           |  CAST((CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4
           |      ELSE 0 END) AS BIGINT) * 10000)
           |    // CAST(SUM(rev_e4) AS BIGINT) AS BIGINT) AS share_bp
           |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin))

  /** q132: TPC-H Q21's shape — "suppliers who kept orders waiting":
    * late line items of the supplier who was the ONLY late supplier on
    * a multi-supplier finished order. The classic form is a double
    * correlated EXISTS / NOT EXISTS self-join on lineitem (the oracle
    * keeps that form, proving equivalence); executing it that way
    * re-shuffles the fact table three times. Here it is two CASCADED
    * hash-aggs instead: per (order, supplier) collapse line items
    * (carrying the late flag and the late-item count), then per order
    * count suppliers and late suppliers — "another supplier exists" =
    * n_supp > 1, "no other supplier was late" = n_late = 1. No
    * self-join, no Expand (the two distinct counts become plain counts
    * after the first collapse), and the second agg reshuffles rows
    * already collapsed to ~|suppliers per order|. The one big-big
    * shuffle is lineitem ⋈ orders on orderkey.
    */
  val q132WaitingSuppliers = NamedQuery(
    "q132_waiting_suppliers",
    "TPC-H Q21 shape: late items of the only-late supplier on " +
      "multi-supplier 'F' orders; EXISTS/NOT EXISTS self-joins " +
      "rewritten as two cascaded hash-aggs.",
    (s, d) => {
      val j = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      val perSupp = j.groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("late")).as("late"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late_items"))
      val perOrder = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          max(when(col("late"), col("l_suppkey"))).as("late_supp"),
          max(when(col("late"), col("n_late_items"))).as("late_items"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
      perOrder
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("late_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(sum("late_items").cast("long").as("n_waits"))
        .orderBy(col("n_waits").desc, col("s_name"))
        .limit(10)
    },
    Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS n_waits
           |FROM supplier s, lineitem l1, orders o
           |WHERE s.s_suppkey = l1.l_suppkey
           |  AND o.o_orderkey = l1.l_orderkey
           |  AND o.o_orderstatus = 'F'
           |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           |  AND EXISTS (SELECT 1 FROM lineitem l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           |GROUP BY s_name
           |ORDER BY n_waits DESC, s_name LIMIT 10""".stripMargin))

  /** q133: TPC-H Q18's shape — "large volume customers": orders whose
    * total quantity exceeds a threshold, joined back to orders and
    * customer. The IN-(HAVING-subquery) is the aggregate itself: one
    * shuffle (lineitem grouped on orderkey), a HAVING cut that shrinks
    * the qualifying set by ~100× (here 46 of 15k orders), and the
    * shrunken set is explicitly broadcast through the orders and
    * customer joins — neither big table reshuffles. At 100 TB the
    * qualifying-set size is data-dependent; the broadcast hint is
    * advisory and AQE demotes an outgrown build side to a shuffle join
    * at runtime.
    */
  val q133LargeVolumeCustomers = NamedQuery(
    "q133_large_volume_customers",
    "TPC-H Q18 shape: customers behind orders with total quantity " +
      "> 300; HAVING-cut agg broadcast through both dim joins.",
    (s, d) => {
      // the HAVING cut compares the RAW double sum (like the oracle's
      // HAVING) and only then floors to BIGINT — cutting on a
      // truncated long would disagree with the oracle on any
      // fractional quantity, and Spark's long cast truncates where
      // DuckDB's CAST rounds, so the floor is explicit on both sides
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum("l_quantity").as("qty_raw"))
        .filter(col("qty_raw") > 300)
        .select(col("l_orderkey"),
          floor(col("qty_raw")).cast("long").as("sum_qty"))
      val ord = Tables.orders(s, d)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
      Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
        .join(broadcast(ord), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (
           |  SELECT l_orderkey,
           |    CAST(FLOOR(SUM(l_quantity)) AS BIGINT) AS sum_qty
           |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300)
           |SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
           |FROM big
           |JOIN orders ON o_orderkey = l_orderkey
           |JOIN customer ON c_custkey = o_custkey
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin))

  /** q137: TPC-H Q2's shape — "minimum cost supplier": for every part
    * that shipped, the cheapest supplier who shipped it (min acctbal
    * standing in for min supplycost — no partsupp table in the
    * fixture). The classic form is a CORRELATED SCALAR SUBQUERY
    * (`WHERE s_acctbal = (SELECT min(...) ... WHERE partkey = outer)`,
    * the oracle keeps it); executed literally that's a re-evaluation
    * per outer row. Here it is the standard DECORRELATION: dedup
    * (part, supplier) pairs, aggregate the per-part minimum once, and
    * join the aggregate back on the SAME key — the groupBy output is
    * already hash-partitioned by partkey, so the join-back adds no
    * extra shuffle of the aggregated side. Ties on the minimum break
    * by smallest suppkey (a second tiny agg), keeping the result
    * deterministic on both engines. supplier and part are broadcast
    * dims.
    */
  val q137MinCostSupplier = NamedQuery(
    "q137_min_cost_supplier",
    "TPC-H Q2 shape: cheapest supplier per shipped part; correlated " +
      "scalar subquery decorrelated into agg + same-key join-back.",
    (s, d) => {
      val shipped = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_acctbal"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("s_acctbal"))
        .cache() // min-agg + join-back both read it: one lineitem scan
      val minBal = shipped.groupBy(col("l_partkey").as("mp"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      val winner = shipped
        .join(minBal, col("l_partkey") === col("mp") &&
          col("s_acctbal") === col("min_bal"))
        .groupBy(col("l_partkey"))
        .agg(min(col("l_suppkey")).as("supp"), first(col("min_bal"))
          .as("min_bal"))
      winner
        .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey").as("wk"), col("s_name"))),
          col("supp") === col("wk"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"),
          col("min_bal"))
        .orderBy("p_partkey")
    },
    Some("""WITH shipped AS (
           |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           |SELECT p_partkey, p_brand, s_name, s_acctbal AS min_bal
           |FROM part, supplier s, shipped
           |WHERE p_partkey = l_partkey AND s.s_suppkey = l_suppkey
           |  AND s_acctbal = (SELECT min(s2.s_acctbal)
           |    FROM shipped sh2, supplier s2
           |    WHERE sh2.l_partkey = shipped.l_partkey
           |      AND s2.s_suppkey = sh2.l_suppkey)
           |  AND l_suppkey = (SELECT min(sh3.l_suppkey)
           |    FROM shipped sh3, supplier s3
           |    WHERE sh3.l_partkey = shipped.l_partkey
           |      AND s3.s_suppkey = sh3.l_suppkey
           |      AND s3.s_acctbal = s.s_acctbal)
           |ORDER BY p_partkey""".stripMargin))

  /** Per-row revenue `extendedprice·(1−discount)` in exact BIGINT
    * ten-thousandths (decimal(18,2) × decimal(18,2) has scale 4, so
    * ×10000 is an exact integral): sums become order-independent long
    * adds and ratios/maxima/top-k orderings are engine-identical —
    * the q128 discipline, shared by the q138+ TPC-H shapes.
    */
  private def revE4: org.apache.spark.sql.Column =
    (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
      .multiply(lit(10000)).cast("long")

  private val revE4Sql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(1.0 - l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT)""".stripMargin

  /** q138: TPC-H Q3's shape — "shipping priority": top-10 unshipped
    * orders of one market segment by revenue. The segment filter
    * shrinks customer BEFORE its join (broadcast semi-join by
    * construction), the date filters push to both fact scans, lineitem
    * ⋈ orders is the one big-big shuffle, and the final top-10 is a
    * TakeOrderedAndProject (per-partition heaps, never a full sort).
    * Revenue is ordered in exact BIGINT e4 so the top-k cut is
    * engine-identical — a double-ordered top-k can disagree across
    * engines on near-ties.
    */
  val q138ShippingPriority = NamedQuery(
    "q138_shipping_priority",
    "TPC-H Q3 shape: top-10 BUILDING-segment orders still unshipped " +
      "at the cutoff, by exact integer revenue; filters pushed, top-k " +
      "as TakeOrderedAndProject.",
    (s, d) => {
      val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), revE4.as("rev_e4"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") < cutoff)
            .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum("rev_e4").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
           |  CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4
           |FROM (SELECT l_orderkey, $revE4Sql AS rev_e4
           |      FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01') l
           |JOIN orders ON l_orderkey = o_orderkey
           |  AND o_orderdate < TIMESTAMP '1998-01-01'
           |JOIN customer ON o_custkey = c_custkey
           |  AND c_mktsegment = 'BUILDING'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
           |LIMIT 10""".stripMargin))

  /** q139: TPC-H Q10's shape — "returned item reporting": customers
    * ranked by revenue lost to returns in one quarter. The quarter
    * filter pushes to the orders scan and the returnflag filter to the
    * lineitem scan (both reach parquet as pushed predicates), lineitem
    * ⋈ orders is the one big shuffle, customer joins the ALREADY
    * per-customer-aggregated result — at 100 TB the agg output is
    * |customers-with-returns| rows, so aggregating before the customer
    * join (instead of joining then aggregating) keeps the second
    * shuffle small; nation is a broadcast dim. Top-20 in exact e4.
    */
  val q139ReturnedItems = NamedQuery(
    "q139_returned_items",
    "TPC-H Q10 shape: top-20 customers by returned-item revenue in " +
      "1996Q1; agg before the customer join, nation broadcast.",
    (s, d) => {
      val lost = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revE4.as("rev_e4"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
            .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum("rev_e4").as("revenue_e4"))
      lost
        .join(Tables.customer(s, d)
            .select("c_custkey", "c_name", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
            .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name,
           |  CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4
           |FROM (SELECT l_orderkey, $revE4Sql AS rev_e4
           |      FROM lineitem WHERE l_returnflag = 'R') l
           |JOIN orders ON l_orderkey = o_orderkey
           |  AND o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o_orderdate < TIMESTAMP '1996-04-01'
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY 1, 2, 3
           |ORDER BY revenue_e4 DESC, c_custkey
           |LIMIT 20""".stripMargin))

  /** q140: TPC-H Q13's shape — "customer order distribution": the
    * histogram of orders-per-customer including zero-order customers.
    * The LEFT OUTER join (customer keeps rows with no orders) shuffles
    * both sides on custkey; the per-customer count then groups on the
    * SAME key, so it reuses the join's hash partitioning with no new
    * exchange (EnsureRequirements sees the child already distributed),
    * and the second agg's input is |distinct counts| — tiny by
    * construction. The priority filter stands in for the classic
    * comment NOT LIKE (no comment column in the fixture) and lives in
    * the JOIN condition, not a WHERE — on an outer join those are
    * different queries.
    */
  val q140OrderDistribution = NamedQuery(
    "q140_order_distribution",
    "TPC-H Q13 shape: histogram of non-urgent orders per customer " +
      "incl. zero-order customers; per-customer agg reuses the outer " +
      "join's partitioning.",
    (s, d) => {
      val perCust = Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""WITH per_cust AS (
           |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
           |  FROM customer LEFT JOIN orders
           |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           |  GROUP BY 1)
           |SELECT CAST(c_count AS BIGINT) AS c_count,
           |  COUNT(*) AS custdist
           |FROM per_cust GROUP BY 1
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** q141: TPC-H Q14's shape — "promotion effect": the PROMO-typed
    * share of one month's revenue as a CONDITIONAL aggregate over a
    * single scan (q128's one-pass discipline — never promo and total
    * as two scans), with the share in exact integer basis points. The
    * month filter pushes to the lineitem scan; part is a broadcast dim
    * pruned to (p_partkey, p_type).
    */
  val q141PromoEffect = NamedQuery(
    "q141_promo_effect",
    "TPC-H Q14 shape: PROMO share of 1997-09 revenue in exact basis " +
      "points; conditional aggregate, one scan, broadcast part dim.",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-09-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-10-01 00:00:00")))
        .select(col("l_partkey"), revE4.as("rev_e4"))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_e4"))
            .otherwise(lit(0L))).as("promo_e4"),
          sum("rev_e4").as("total_e4"))
        .select(col("promo_e4"), col("total_e4"),
          expr("CAST((promo_e4 * 10000) div total_e4 AS BIGINT)")
            .as("promo_bp")),
    Some(s"""WITH j AS (
           |  SELECT p_type, $revE4Sql AS rev_e4
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
           |    AND l_shipdate < TIMESTAMP '1997-10-01')
           |SELECT
           |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT) AS promo_e4,
           |  CAST(SUM(rev_e4) AS BIGINT) AS total_e4,
           |  CAST((CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT) * 10000)
           |    // CAST(SUM(rev_e4) AS BIGINT) AS BIGINT) AS promo_bp
           |FROM j""".stripMargin))

  /** q142: TPC-H Q15's shape — "top supplier": the supplier(s) whose
    * quarter revenue equals the GLOBAL maximum. The classic form is a
    * view used twice (once aggregated to max, once filtered against
    * it); here the per-supplier aggregate is computed ONCE and cached,
    * its 1-row max crossJoin-broadcast back — the second "scan" of the
    * view is a broadcast-hash probe of |suppliers| rows, and lineitem
    * is read exactly once. Revenue in exact e4 so the max-equality
    * probe is engine-identical (a double-equality against an
    * aggregated max is the textbook float trap).
    */
  val q142TopSupplier = NamedQuery(
    "q142_top_supplier",
    "TPC-H Q15 shape: supplier(s) with the max 1997Q1 revenue; " +
      "cached per-supplier agg + 1-row max broadcast, one fact scan.",
    (s, d) => {
      val perSupp = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
        .select(col("l_suppkey"), revE4.as("rev_e4"))
        .groupBy(col("l_suppkey"))
        .agg(sum("rev_e4").as("total_rev_e4"))
        .cache() // max + probe both read it: one lineitem scan
      val maxRev = perSupp.agg(max(col("total_rev_e4")).as("max_rev"))
      perSupp
        .join(broadcast(maxRev), col("total_rev_e4") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH rev AS (
           |  SELECT l_suppkey, CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4
           |  FROM (SELECT l_suppkey, $revE4Sql AS rev_e4
           |        FROM lineitem
           |        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |          AND l_shipdate < TIMESTAMP '1997-04-01') l
           |  GROUP BY 1)
           |SELECT s_suppkey, s_name, total_rev_e4
           |FROM rev JOIN supplier ON l_suppkey = s_suppkey
           |WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
           |ORDER BY s_suppkey""".stripMargin))

  /** q143: TPC-H Q17's shape — "small-quantity-order revenue": revenue
    * from order lines under 20% of the part's average quantity, for
    * one brand. The classic correlated `l_quantity < (SELECT 0.2 *
    * avg(..) WHERE partkey = outer)` decorrelates into a per-part agg
    * joined back on the SAME key (q137's pattern: the agg output is
    * already partitioned by partkey, so the join-back adds no exchange
    * on that side), and the brand filter semi-joins lineitem down via
    * the broadcast part dim BEFORE the agg — at 100 TB the agg runs
    * over one brand's lines, not the corpus. The cached filtered scan
    * feeds both the aggregate and the probe: one lineitem read. The
    * 20% cut is integer-exact: qty < sum/(5·cnt) ⟺ 5·cnt·qty_e2 <
    * sum_e2 — no float division on either engine.
    */
  val q143SmallQtyRevenue = NamedQuery(
    "q143_small_qty_revenue",
    "TPC-H Q17 shape: Brand#1 revenue from lines under 0.2× the " +
      "part's avg quantity; decorrelated same-key join-back, " +
      "integer-exact threshold.",
    (s, d) => {
      val brandLines = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") === "Brand#1")
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
            .as("qty_e2"),
          revE4.as("rev_e4"))
        .cache() // agg + probe both read it: one lineitem scan
      val perPart = brandLines.groupBy(col("l_partkey").as("ap"))
        .agg(sum("qty_e2").as("sum_qty_e2"), count(lit(1)).as("cnt"))
      brandLines
        .join(perPart, col("l_partkey") === col("ap"))
        .filter(col("qty_e2") * 5 * col("cnt") < col("sum_qty_e2"))
        .agg(sum("rev_e4").as("small_rev_e4"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""WITH brand_lines AS (
           |  SELECT l_partkey,
           |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_e2,
           |    $revE4Sql AS rev_e4
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE p_brand = 'Brand#1'),
           |per_part AS (
           |  SELECT l_partkey AS ap, CAST(SUM(qty_e2) AS BIGINT) AS sum_qty_e2,
           |    COUNT(*) AS cnt
           |  FROM brand_lines GROUP BY 1)
           |SELECT CAST(SUM(rev_e4) AS BIGINT) AS small_rev_e4,
           |  COUNT(*) AS n_lines
           |FROM brand_lines JOIN per_part ON l_partkey = ap
           |WHERE qty_e2 * 5 * cnt < sum_qty_e2""".stripMargin))

  /** q144: TPC-H Q19's shape — "discounted revenue" with DISJUNCTIVE
    * bracket predicates: three (brand × size-range × quantity-range)
    * brackets OR'd together. The scale move: the brackets' UNION of
    * brands prunes the part dim BEFORE broadcast (the common conjunct
    * of a disjunction is factorable and pushable even when the full
    * OR is not), the join stays a single broadcast-hash equi-join on
    * partkey with the OR as a cheap residual — never a union of three
    * scans, never a nested-loop. Catalyst keeps the residual inside
    * whole-stage codegen.
    */
  val q144BracketPredicates = NamedQuery(
    "q144_bracket_predicates",
    "TPC-H Q19 shape: revenue under three OR'd brand/size/quantity " +
      "brackets; factored brand pushdown, single equi-join with " +
      "codegen residual.",
    (s, d) => {
      val dim = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), revE4.as("rev_e4"))
        .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 40)))
        .agg(sum("rev_e4").as("revenue_e4"), count(lit(1)).as("n_lines"))
    },
    Some(s"""SELECT CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4,
           |  COUNT(*) AS n_lines
           |FROM (SELECT l_partkey, l_quantity, $revE4Sql AS rev_e4
           |      FROM lineitem) l
           |JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           |    AND l_quantity BETWEEN 1 AND 20)
           |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           |    AND l_quantity BETWEEN 10 AND 30)
           |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           |    AND l_quantity BETWEEN 20 AND 40)""".stripMargin))

  /** q145: TPC-H Q22's shape — "global sales opportunity": DORMANT
    * customers (no order since 1999) with above-average positive
    * balance, by nation (nationkey stands in for the phone
    * country-code prefix; the dormancy window stands in for "never
    * ordered", which is empty on this fixture's dense order
    * coverage). Two classic decorrelations in one query: the
    * global-average scalar subquery becomes a 1-row aggregate
    * crossJoin-broadcast (every partition compares locally — no
    * shuffle), and NOT EXISTS becomes a LEFT ANTI join whose build
    * side is orders WITH THE DATE FILTER PUSHED TO ITS SCAN and
    * projected to the join key only — at 100 TB the anti-join carries
    * |recent orders| keys, not the order history.
    */
  val q145GlobalOpportunity = NamedQuery(
    "q145_global_opportunity",
    "TPC-H Q22 shape: dormant customers with above-avg positive " +
      "balance per nation; 1-row scalar broadcast + left-anti join, " +
      "integer-exact threshold.",
    (s, d) => {
      val custE2 = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("bal_e2"))
      val avgPos = custE2.filter(col("bal_e2") > 0)
        .agg(sum("bal_e2").as("sum_e2"), count(lit(1)).as("cnt"))
      custE2
        .crossJoin(broadcast(avgPos))
        .filter(col("bal_e2") * col("cnt") > col("sum_e2"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), sum("bal_e2").as("totacctbal_e2"))
        .orderBy("cntrycode")
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey, c_nationkey,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_e2
           |  FROM customer),
           |avg_pos AS (
           |  SELECT CAST(SUM(bal_e2) AS BIGINT) AS sum_e2, COUNT(*) AS cnt
           |  FROM cust WHERE bal_e2 > 0)
           |SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           |  COUNT(*) AS numcust,
           |  CAST(SUM(bal_e2) AS BIGINT) AS totacctbal_e2
           |FROM cust, avg_pos
           |WHERE bal_e2 * cnt > sum_e2
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |    WHERE o_custkey = c_custkey
           |      AND o_orderdate >= TIMESTAMP '1999-01-01')
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q01PricingSummary, q02FilterProject, q03BroadcastDims,
    q04GoldCurrentInventory, q09TopK, q10SetOps, q45SupplierPartProfit,
    q72FullOuterReconcile, q113LocalSupplierVolume, q114PriorityChecking,
    q127VolumeShipping, q128MarketShare, q132WaitingSuppliers,
    q133LargeVolumeCustomers, q137MinCostSupplier, q138ShippingPriority,
    q139ReturnedItems, q140OrderDistribution, q141PromoEffect,
    q142TopSupplier, q143SmallQtyRevenue, q144BracketPredicates,
    q145GlobalOpportunity)
}
