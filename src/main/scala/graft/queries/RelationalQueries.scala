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

  val all: Seq[NamedQuery] = Seq(
    q01PricingSummary, q02FilterProject, q03BroadcastDims,
    q04GoldCurrentInventory, q09TopK, q10SetOps, q45SupplierPartProfit,
    q72FullOuterReconcile, q113LocalSupplierVolume, q114PriorityChecking,
    q127VolumeShipping, q128MarketShare, q132WaitingSuppliers,
    q133LargeVolumeCustomers, q137MinCostSupplier)
}
