package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}
import graft.{NamedQuery, Tables}
import graft.operators.ApplyChanges

/** Event-stream operators run in batch over the `events` table: CDC
  * latest-per-key (the reference's `apply_changes`, SURVEY §2.7 O22),
  * keyed deduplication (O21 batch semantics), the re-nest/explode
  * round-trip (A1 + F6), window functions, and `from_json` parsing (F5).
  *
  * `ts_us` (epoch microseconds, see [[graft.Tables.events]]) is the
  * sequencing column everywhere — bit-identical to DuckDB `epoch_us(ts)`.
  */
object EventQueries {

  val q05LatestPerKey = NamedQuery(
    "q05_latest_per_key",
    "CDC latest-row-per-key via max_by(struct(payload), struct(seq)) — one " +
      "partial+final hash aggregation, no window sort; shuffle carries at " +
      "most one candidate row per key per map task (SURVEY §2.4 A3).",
    (s, d) =>
      ApplyChanges.latestByKey(
          // prune the payload BEFORE the aggregation: the shuffle carries
          // struct(payload) per key, so unused columns cost shuffle bytes
          Tables.events(s, d)
            .select("user_id", "event_type", "event_id", "value", "ts_us"),
          Seq("user_id", "event_type"),
          Seq(col("ts_us"), col("event_id")))
        .select(
          col("user_id"), col("event_type"),
          col("event_id").as("last_event_id"),
          col("value").as("last_value"),
          col("ts_us").as("last_ts_us"))
        .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, event_id AS last_event_id,
           |  value AS last_value, epoch_us(ts) AS last_ts_us
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
           |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
           |WHERE rn = 1
           |ORDER BY user_id, event_type""".stripMargin))

  val q06ApplyChanges = NamedQuery(
    "q06_apply_changes",
    "Full DLT apply_changes semantics (03_Data_Ingestion.py:318-326): events " +
      "as a changelog keyed by user_id, sequenced by (ts_us, event_id), " +
      "'error' rows as delete tombstones, props column excluded. A tombstone " +
      "deletes only when it is the key's latest change.",
    (s, d) =>
      ApplyChanges.applyChanges(
          Tables.events(s, d).drop("ts"),
          keys = Seq("user_id"),
          sequenceBy = Seq(col("ts_us"), col("event_id")),
          deleteExpr = col("event_type") === "error",
          exceptColumns = Seq("props"))
        .select("user_id", "event_id", "event_type", "value", "ts_us")
        .orderBy("user_id"),
    Some("""SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
           |WHERE rn = 1 AND event_type <> 'error'
           |ORDER BY user_id""".stripMargin))

  val q07RenestExplode = NamedQuery(
    "q07_renest_explode",
    "The reference's transaction re-nesting then item explode, round-tripped " +
      "(02_Data_Generation.py:64-70 A1 + 03_Data_Ingestion.py:213 F6): " +
      "groupBy→collect_list(struct)→sort_array→explode reproduces the input.",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(
          col("event_id"), col("event_type"), col("value")))).as("evs"))
        .select(col("user_id"), explode(col("evs")).as("ev"))
        .select(col("user_id"), col("ev.event_id").as("event_id"),
          col("ev.event_type").as("event_type"), col("ev.value").as("value"))
        .orderBy("event_id"),
    Some("""SELECT user_id, event_id, event_type, value
           |FROM events ORDER BY event_id""".stripMargin))

  val q08WindowRunning = NamedQuery(
    "q08_window_running",
    "Window functions per user ordered by event time: row_number, exact " +
      "decimal running sum, and LAG-based inter-event gap (SURVEY §2.5 W1).",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .select(
          col("user_id"), col("event_id"),
          row_number().over(w).as("rn"),
          sum(col("value").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"),
          (col("ts_us") - lag("ts_us", 1).over(w)).as("gap_us"))
        .orderBy("user_id", "rn")
    },
    Some("""SELECT user_id, event_id,
           |  row_number() OVER w AS rn,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
           |    ORDER BY epoch_us(ts), event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           |  epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           |ORDER BY user_id, rn""".stripMargin))

  val q11JsonExtract = NamedQuery(
    "q11_json_extract",
    "from_json over the JSON props column (03_Data_Ingestion.py:206 F5) with " +
      "a filter on the extracted field; oracle uses DuckDB json_extract.",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k",
          from_json(col("props"), new StructType().add("k", IntegerType)).getField("k"))
        .filter(col("k") >= 90)
        .select("event_id", "user_id", "event_type", "k")
        .orderBy("event_id"),
    Some("""SELECT event_id, user_id, event_type,
           |  CAST(json_extract(props, '$.k') AS INT) AS k
           |FROM events
           |WHERE CAST(json_extract(props, '$.k') AS INT) >= 90
           |ORDER BY event_id""".stripMargin))

  val q28Sessionize = NamedQuery(
    "q28_sessionize",
    "Sessionization: session_window(ts, 30 min) per user — Spark's native " +
      "session windows (merge-on-overlap, end = last event + gap); the " +
      "oracle rebuilds the same sessions with gaps-and-islands SQL " +
      "(new session iff gap ≥ 30 min).",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_us"),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
           |marked AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
           |      OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
           |sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
           |    ROWS UNBOUNDED PRECEDING) AS sid FROM marked)
           |SELECT user_id, MIN(us) AS session_start_us,
           |  MAX(us) + 1800000000 AS session_end_us,
           |  COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM sess GROUP BY user_id, sid
           |ORDER BY user_id, session_start_us""".stripMargin))

  val q46AsOfJoin = NamedQuery(
    "q46_asof_join",
    "AS-OF join (an operator Spark lacks): each purchase attributed to " +
      "the user's LATEST click at-or-before it, via the union + " +
      "window-forward-fill plan — one sort-shuffle of |L|+|R| rows, no " +
      "range-join blowup. Oracle is DuckDB's native ASOF LEFT JOIN.",
    (s, d) => {
      val ev = Tables.events(s, d)
      // clicks deduped to one per (user, ts) — max event_id — so "the"
      // latest prior click is total-ordered on both engines
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("c_ts"))
        .agg(max("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"), col("ts_us"))
      graft.operators.AsOfJoin.asOf(buys, clicks, Seq("user_id"),
          leftTs = "ts_us", rightTs = "c_ts")
        .orderBy("buy_id")
    },
    Some("""WITH clicks AS (SELECT user_id, epoch_us(ts) AS c_ts,
           |    MAX(event_id) AS click_id
           |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
           |buys AS (SELECT user_id, event_id AS buy_id, epoch_us(ts) AS ts_us
           |  FROM events WHERE event_type = 'purchase')
           |SELECT b.user_id, b.buy_id, b.ts_us, c.click_id
           |FROM buys b ASOF LEFT JOIN clicks c
           |  ON b.user_id = c.user_id AND b.ts_us >= c.c_ts
           |ORDER BY buy_id""".stripMargin))

  /** q99: q46's as-of join planned through the engine's CUSTOM PHYSICAL
    * OPERATOR ([[graft.plans.AsOfJoinExec]]: logical node → planner
    * strategy → sorted-merge exec) instead of the union + window-fill
    * formulation. Same semantics, same oracle (DuckDB native ASOF LEFT
    * JOIN), so the full custom-operator stack — including
    * EnsureRequirements inserting the key Exchange+Sort the exec
    * declares — is hash-checked end-to-end, not just spec-checked. The
    * exec's per-partition pass streams with one buffered right row; no
    * window frame, no union.
    */
  val q99AsOfExec = NamedQuery(
    "q99_asof_exec",
    "AS-OF join via the custom AsOfJoinExec physical operator " +
      "(sorted-merge, streaming one-pass merge); bit-identical to q46.",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("c_ts"))
        .agg(max("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"), col("ts_us"))
      graft.operators.AsOfJoin.asOfExec(buys, clicks, Seq("user_id"),
          leftTs = "ts_us", rightTs = "c_ts")
        .orderBy("buy_id")
    },
    Some("""WITH clicks AS (SELECT user_id, epoch_us(ts) AS c_ts,
           |    MAX(event_id) AS click_id
           |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
           |buys AS (SELECT user_id, event_id AS buy_id, epoch_us(ts) AS ts_us
           |  FROM events WHERE event_type = 'purchase')
           |SELECT b.user_id, b.buy_id, b.ts_us, c.click_id
           |FROM buys b ASOF LEFT JOIN clicks c
           |  ON b.user_id = c.user_id AND b.ts_us >= c.c_ts
           |ORDER BY buy_id""".stripMargin))

  val q51IntervalJoin = NamedQuery(
    "q51_interval_join",
    "Interval-overlap join via time bucketing (1h buckets): per-user-day " +
      "activity intervals × daily error-incident windows that overlap " +
      "them — candidates from a bucket equi-join (shared bucket ⟸ " +
      "overlap), exact predicate on candidates; no nested-loop range " +
      "join. Oracle is the direct inequality join.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val activity = ev.groupBy("user_id", "day")
        .agg(min("ts_us").as("a_start"), max("ts_us").as("a_end"))
        .select(concat_ws("#", col("user_id"), col("day")).as("a_id"),
          col("a_start"), col("a_end"))
      val incidents = ev.filter(col("event_type") === "error")
        .groupBy("day")
        .agg(min("ts_us").as("b_start"), max("ts_us").as("b_end"))
        .select(col("day").as("b_id"), col("b_start"), col("b_end"))
      graft.operators.IntervalJoin
        .overlapJoin(activity, incidents, bucketUs = 3600L * 1000000L)
        .orderBy("a_id", "b_id")
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
           |    strftime(ts, '%Y-%m-%d') AS day FROM events),
           |activity AS (SELECT CAST(user_id AS VARCHAR) || '#' || day AS a_id,
           |    MIN(ts_us) AS a_start, MAX(ts_us) AS a_end
           |  FROM ev GROUP BY user_id, day),
           |incidents AS (SELECT day AS b_id,
           |    MIN(ts_us) AS b_start, MAX(ts_us) AS b_end
           |  FROM ev WHERE event_type = 'error' GROUP BY day)
           |SELECT a_id, b_id, a_start, a_end, b_start, b_end
           |FROM activity a JOIN incidents b
           |  ON a.a_start <= b.b_end AND b.b_start <= a.a_end
           |ORDER BY a_id, b_id""".stripMargin))

  /** q59: time-RANGE window frames — the per-entity rolling-feature shape
    * (trailing counts/sums over a time horizon) every feature-engineering
    * pipeline runs. `rangeBetween` on the epoch-µs long orders ONE
    * sort-shuffle per user partition and slides the frame by value, not
    * row position — peers with equal timestamps land in the same frame
    * on both engines. The sum stays decimal-exact so the sliding
    * accumulator (add/evict order differs per engine) cannot drift.
    */
  val q59RollingFeatures = NamedQuery(
    "q59_rolling_features",
    "Per-user rolling 10-minute features at every event (trailing event " +
      "count + decimal-exact value sum) via a RANGE window frame over " +
      "epoch-µs time.",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-600L * 1000000L, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          count(lit(1)).over(w).cast("long").as("n_10m"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_10m"))
        .orderBy("event_id")
    },
    Some("""SELECT user_id, event_id, ts_us,
           |  COUNT(*) OVER w AS n_10m,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_10m
           |FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
           |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin))

  private val HourUs = 3600000000L

  /** q66: regular-grid resampling with forward fill — the gap-fill /
    * last-observation-carried-forward step that turns an irregular
    * event stream into the fixed-cadence series feature pipelines and
    * model inputs expect. Three scale-safe stages: (1) hourly bucketing
    * is pure integer math on `ts_us` (one hash-agg, `max_by` picks the
    * in-hour last observation without a sort); (2) the hour spine is
    * `sequence()`-exploded from each key's min/max bucket — row-local,
    * |keys|·|hours| output rows, never a cross join; (3) LOCF is
    * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY hour)`,
    * the same per-key window sort as sessionization — state is one row
    * per key however long the series. Restricted to user_id < 5 to
    * bound the dumped grid; the shape is per-key-parallel at any fan-out.
    */
  val q66GapfillLocf = NamedQuery(
    "q66_gapfill_locf",
    "Hourly resample of events for users 0-4 over each user's own " +
      "min→max hour spine: in-hour event count + last value, gaps " +
      "forward-filled (LOCF) and flagged.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id") < 5)
        .select(col("user_id"), col("event_id"), col("value"), col("ts_us"),
          (col("ts_us") - col("ts_us") % HourUs).as("hr_us"))
      val hourly = ev.groupBy("user_id", "hr_us").agg(
        count(lit(1)).as("n_events"),
        max_by(col("value"), struct(col("ts_us"), col("event_id")))
          .as("hour_last"))
      val spine = ev.groupBy("user_id")
        .agg(min("hr_us").as("h0"), max("hr_us").as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), lit(HourUs))).as("hr_us"))
      val w = Window.partitionBy("user_id").orderBy("hr_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("user_id", "hr_us"), "left_outer")
        .select(col("user_id"), col("hr_us"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("hour_last"), ignoreNulls = true).over(w)
            .as("filled_value"),
          col("n_events").isNull.as("is_gap"))
        .orderBy("user_id", "hr_us")
    },
    Some(s"""WITH ev AS (SELECT user_id, event_id, value,
            |    epoch_us(ts) AS ts_us,
            |    epoch_us(ts) - epoch_us(ts) % $HourUs AS hr_us
            |  FROM events WHERE user_id < 5),
            |h AS (SELECT user_id, hr_us, n_events, value AS hour_last FROM (
            |    SELECT user_id, hr_us, value,
            |      COUNT(*) OVER (PARTITION BY user_id, hr_us) AS n_events,
            |      row_number() OVER (PARTITION BY user_id, hr_us
            |        ORDER BY ts_us DESC, event_id DESC) AS rn
            |    FROM ev) WHERE rn = 1),
            |spine AS (SELECT user_id, u AS hr_us
            |  FROM (SELECT user_id, generate_series(MIN(hr_us), MAX(hr_us),
            |      $HourUs) AS gs FROM ev GROUP BY user_id),
            |    unnest(gs) AS g(u))
            |SELECT s.user_id, s.hr_us,
            |  COALESCE(h.n_events, 0) AS n_events,
            |  last_value(h.hour_last IGNORE NULLS) OVER (
            |    PARTITION BY s.user_id ORDER BY s.hr_us
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            |    AS filled_value,
            |  h.n_events IS NULL AS is_gap
            |FROM spine s LEFT JOIN h ON s.user_id = h.user_id
            |  AND s.hr_us = h.hr_us
            |ORDER BY s.user_id, s.hr_us""".stripMargin))

  private val SlideUs = 43200000000L // 12 h hop; window = 24 h = 2 hops

  /** q71: hopping (sliding) time-window aggregation — `window(ts,
    * '1 day', '12 hours')`, the overlapping-window counterpart to
    * q24's streaming tumbling windows. Spark assigns each row to
    * size/slide = 2 windows; the oracle reproduces the assignment as
    * pure integer math (starts s = floor12h(ts) − k·12h, k ∈ {0,1}),
    * which doubles as documentation of the epoch-aligned window
    * semantics. One Expand (2× rows, row-local) + one hash-agg — the
    * shuffle carries |windows|·|event_types| aggregated rows only.
    */
  val q71HoppingWindow = NamedQuery(
    "q71_hopping_window",
    "24h windows hopping every 12h per event_type: event count and " +
      "exact decimal value sum, window starts as epoch-us.",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(unix_micros(col("window.start")).as("ws_us"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("ws_us", "event_type"),
    Some(s"""SELECT epoch_us(ts) - epoch_us(ts) % $SlideUs - k * $SlideUs
            |    AS ws_us,
            |  event_type, COUNT(*) AS n_events,
            |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            |FROM events, unnest([0, 1]) AS u(k)
            |GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin))

  /** q78: behavioral transition matrix — per-user event sequences
    * (ordered by time, event_id tiebreak) reduced to global
    * (from_type → to_type) Markov counts and row-normalized fp6
    * probabilities. The sequence step is ONE per-user window sort (the
    * sessionization shape: parallel across users, state = one previous
    * row); after the lag the data collapses to a |types|² matrix, so
    * the normalization window runs on a table of a few dozen rows.
    * Both ratios go through CAST-to-double then one correctly-rounded
    * multiply+divide, identical in DuckDB.
    */
  val q78TransitionMatrix = NamedQuery(
    "q78_transition_matrix",
    "Event-type transition counts + row-normalized fp6 probabilities " +
      "from per-user time-ordered sequences (lag window).",
    (s, d) => {
      val wSeq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wFrom = Window.partitionBy("from_type")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"))
        .withColumn("from_type", lag("event_type", 1).over(wSeq))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p_fp6",
          floor(col("n").cast("double") * lit(1000000.0) /
            sum("n").over(wFrom)).cast("long"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH seq AS (SELECT user_id, event_type,
           |    lag(event_type, 1) OVER (PARTITION BY user_id
           |      ORDER BY epoch_us(ts), event_id) AS from_type
           |  FROM events),
           |m AS (SELECT from_type, event_type AS to_type, COUNT(*) AS n
           |  FROM seq WHERE from_type IS NOT NULL
           |  GROUP BY from_type, event_type)
           |SELECT from_type, to_type, n,
           |  CAST(floor(CAST(n AS DOUBLE) * 1000000.0 /
           |    SUM(n) OVER (PARTITION BY from_type)) AS BIGINT) AS p_fp6
           |FROM m ORDER BY from_type, to_type""".stripMargin))

  private val DayUs = 86400000000L

  /** q79: cohort retention — users grouped by first-seen day, activity
    * tracked as (cohort_day, age) counts with retention rates against
    * the cohort size. Three hash aggregations, all map-side-combining:
    * first-seen (min per user), distinct active days per user, and the
    * (cohort, age) rollup; the cohort-size join is a broadcast of
    * |days| rows. Day arithmetic is integer epoch-µs division — no
    * calendar/timezone dependence to diverge on.
    */
  val q79CohortRetention = NamedQuery(
    "q79_cohort_retention",
    "Cohort retention matrix: users by first-seen day, distinct-day " +
      "activity as (cohort_day, age) counts + fp6 retention rates.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val act = ev.distinct()
      val mat = act.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = first.groupBy("cohort_day")
        .agg(count(lit(1)).as("cohort_size"))
      mat.join(broadcast(sizes), Seq("cohort_day"))
        .select(col("cohort_day"), col("age"), col("n_active"),
          col("cohort_size"),
          floor(col("n_active").cast("double") * lit(1000000.0) /
            col("cohort_size")).cast("long").as("retention_fp6"))
        .orderBy("cohort_day", "age")
    },
    Some(s"""WITH ev AS (SELECT DISTINCT user_id,
            |    epoch_us(ts) // $DayUs AS day FROM events),
            |first AS (SELECT user_id, MIN(day) AS cohort_day
            |  FROM ev GROUP BY user_id),
            |mat AS (SELECT cohort_day, day - cohort_day AS age,
            |    COUNT(*) AS n_active
            |  FROM ev JOIN first USING (user_id)
            |  GROUP BY cohort_day, day - cohort_day),
            |sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size
            |  FROM first GROUP BY cohort_day)
            |SELECT cohort_day, age, n_active, cohort_size,
            |  CAST(floor(CAST(n_active AS DOUBLE) * 1000000.0 /
            |    cohort_size) AS BIGINT) AS retention_fp6
            |FROM mat JOIN sizes USING (cohort_day)
            |ORDER BY cohort_day, age""".stripMargin))

  /** q84: concurrent-session load curve through a PURE range join (no
    * equi key) — the surface the [[graft.plans.RangeJoinRewrite]]
    * optimizer rule exists for. The query is written as the natural
    * inequality join (`start <= t AND t < end`); without the rule Spark
    * plans a BroadcastNestedLoopJoin (|spine|·|sessions| comparisons —
    * the classic range-join scale killer); with it, a binned equi-join
    * whose shuffle key is `t div 1h`. Correctness is independent of the
    * rewrite (spec-proven lossless); the oracle is DuckDB's native
    * IEJoin over the same predicate.
    *
    * Spine stride 10 min, snapped DOWN to the stride grid from the
    * corpus min — integer division, reproducible in any engine; bin
    * width 1 h ≈ session length (sessions span ≤ 3 bins).
    */
  val q84RangeJoinSpine = NamedQuery(
    "q84_range_join_spine",
    "Concurrent sessions at 10-min spine marks via a pure range join " +
      "(point-in-interval, no equi key), auto-rewritten to a binned " +
      "equi-join by the RangeJoinRewrite optimizer rule.",
    (s, d) => {
      graft.plans.RangeJoinRewrite.enable(s, 3600L * 1000000L)
      val sessions = Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("n_events"))
      val step = 600L * 1000000L // 10 minutes in µs
      val spine = Tables.events(s, d)
        .agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
        .select(explode(sequence(expr(s"(lo div $step) * $step"),
          col("hi"), lit(step))).as("t_us"))
      spine
        .join(sessions,
          col("t_us") >= col("start_us") && col("t_us") < col("end_us"))
        .groupBy("t_us")
        .agg(count(lit(1)).as("n_active"),
          sum("n_events").as("events_in_active"))
        .orderBy("t_us")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
           |marked AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
           |      OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
           |sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
           |    ROWS UNBOUNDED PRECEDING) AS sid FROM marked),
           |sessions AS (SELECT MIN(us) AS start_us,
           |    MAX(us) + 1800000000 AS end_us, COUNT(*) AS n_events
           |  FROM sess GROUP BY user_id, sid),
           |bounds AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
           |  FROM events),
           |spine AS (SELECT unnest(generate_series(
           |    (lo // 600000000) * 600000000, hi, 600000000)) AS t_us
           |  FROM bounds)
           |SELECT t_us, COUNT(*) AS n_active,
           |  CAST(SUM(n_events) AS BIGINT) AS events_in_active
           |FROM spine JOIN sessions
           |  ON t_us >= start_us AND t_us < end_us
           |GROUP BY t_us ORDER BY t_us""".stripMargin))

  /** q89: SCD2 history build — turn a change stream into validity
    * INTERVALS (the slowly-changing-dimension type-2 table every
    * point-in-time feature join needs: q05/q06 give the CURRENT
    * snapshot; this gives "what was the value at time t" without label
    * leakage, the thing [[graft.operators.AsOfJoin]] then probes).
    * Classic gaps-and-islands: mark value changes with one lag, running
    * sum → version id, collapse runs to [valid_from, valid_to) with
    * valid_to = the next version's start (NULL = still open). One
    * window sort per key (the sessionization shape — linear per key,
    * parallel across keys), one keyed agg; ties broken by event_id so
    * the versioning is total-order deterministic.
    */
  val q89Scd2History = NamedQuery(
    "q89_scd2_history",
    "SCD2 validity intervals per user from the event_type change " +
      "stream: version id, [valid_from, valid_to) epoch-us bounds " +
      "(open interval = NULL), events per version.",
    (s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("version")
      val prev = lag(col("event_type"), 1).over(wOrd)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"))
        .withColumn("chg",
          when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("version", sum("chg").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "version")
        .agg(min("event_type").as("event_type"),
          min("ts_us").as("valid_from_us"),
          count(lit(1)).as("n_events"))
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
        .select("user_id", "version", "event_type", "valid_from_us",
          "valid_to_us", "n_events")
        .orderBy("user_id", "version")
    },
    Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
           |    event_type FROM events),
           |m AS (SELECT *, CASE WHEN LAG(event_type) OVER w IS NULL
           |      OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END
           |      AS chg
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
           |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |    AS version FROM m),
           |runs AS (SELECT user_id, version, MIN(event_type) AS event_type,
           |    MIN(us) AS valid_from_us, COUNT(*) AS n_events
           |  FROM v GROUP BY user_id, version)
           |SELECT user_id, version, event_type, valid_from_us,
           |  LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
           |    AS valid_to_us,
           |  n_events
           |FROM runs ORDER BY user_id, version""".stripMargin))

  /** q101: POINT-IN-TIME lookup against the SCD2 history — the
    * feature-store join: each purchase reads the dimension state that
    * was valid AT ITS OWN EVENT TIME, never a later version (the
    * training-serving-skew bug this join shape exists to prevent).
    * Composes q89's validity intervals with the custom as-of physical
    * operator (q99): history versions collapse to one row per (user,
    * valid_from) — max version wins a same-timestamp change cluster,
    * making the as-of pick total-ordered on both engines — then
    * [[graft.operators.AsOfJoin.asOfExec]] matches each purchase to
    * the latest version starting at-or-before it. `in_interval`
    * re-checks `ts < valid_to` on the result (all 1 by construction —
    * intervals tile the timeline), making the interval contract a
    * hash-checked output, not an assumption.
    */
  val q101PointInTime = NamedQuery(
    "q101_point_in_time",
    "Point-in-time SCD2 lookup: each purchase joined to the user state " +
      "version valid at its event time, via the custom as-of exec; " +
      "interval containment verified in the output.",
    (s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("version")
      val prev = lag(col("event_type"), 1).over(wOrd)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"))
      val hist = ev
        .withColumn("chg",
          when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("version", sum("chg").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "version")
        .agg(min("event_type").as("state"),
          min("ts_us").as("valid_from_us"))
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
      val h = hist
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "valid_from_us")
            .orderBy(col("version").desc)))
        .filter(col("rn") === 1)
        .select("user_id", "valid_from_us", "version", "state",
          "valid_to_us")
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"), col("ts_us"))
      graft.operators.AsOfJoin.asOfExec(buys, h, Seq("user_id"),
          leftTs = "ts_us", rightTs = "valid_from_us")
        .withColumn("in_interval",
          when(col("valid_to_us").isNull || col("ts_us") < col("valid_to_us"),
            1L).otherwise(0L))
        .select("user_id", "buy_id", "ts_us", "version", "state",
          "in_interval")
        .orderBy("buy_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
           |    event_type FROM events),
           |m AS (SELECT *, CASE WHEN LAG(event_type) OVER w IS NULL
           |      OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END
           |      AS chg
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
           |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |    AS version FROM m),
           |runs AS (SELECT user_id, version, MIN(event_type) AS state,
           |    MIN(us) AS valid_from_us
           |  FROM v GROUP BY user_id, version),
           |hist AS (SELECT *, LEAD(valid_from_us) OVER (PARTITION BY user_id
           |    ORDER BY version) AS valid_to_us FROM runs),
           |h AS (SELECT user_id, valid_from_us, version, state, valid_to_us
           |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id,
           |      valid_from_us ORDER BY version DESC) AS rn FROM hist)
           |  WHERE rn = 1),
           |buys AS (SELECT user_id, event_id AS buy_id, epoch_us(ts) AS ts_us
           |  FROM events WHERE event_type = 'purchase')
           |SELECT b.user_id, b.buy_id, b.ts_us, h.version, h.state,
           |  CAST(CASE WHEN h.valid_to_us IS NULL OR b.ts_us < h.valid_to_us
           |    THEN 1 ELSE 0 END AS BIGINT) AS in_interval
           |FROM buys b ASOF LEFT JOIN h
           |  ON b.user_id = h.user_id AND b.ts_us >= h.valid_from_us
           |ORDER BY buy_id""".stripMargin))

  /** q112: ORDERED funnel conversion — the product-analytics staple the
    * cohort (q79) and transition-matrix (q78) queries don't cover: how
    * many users did view → click → purchase IN THAT ORDER, where each
    * stage must happen strictly AFTER the previous stage's first
    * occurrence (a click before the first view does not count). Three
    * conditional first-occurrence passes: min(view ts) per user, then
    * min(click ts > that), then min(purchase ts > that) — each one
    * hash-agg + a broadcast-sized per-user join (|users| rows), never
    * a window over the event stream. Output: stage counts + fp6
    * conversion ratios, engine-exact (mins of epoch-µs longs).
    */
  val q112FunnelConversion = NamedQuery(
    "q112_funnel_conversion",
    "Ordered view->click->purchase funnel: per-stage user counts and " +
      "fp6 conversion ratios; each stage strictly after the previous " +
      "stage's first occurrence.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts_us") > col("v_ts"))
        .groupBy("user_id").agg(min("ts_us").as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts_us") > col("c_ts"))
        .groupBy("user_id").agg(min("ts_us").as("p_ts"))
      // fully declarative: three 1-row counts cross-joined, stages
      // exploded from an inline struct array — no driver-side math
      v.agg(count(lit(1)).as("nv"))
        .crossJoin(c.agg(count(lit(1)).as("nc")))
        .crossJoin(p.agg(count(lit(1)).as("np")))
        .select(explode(array(
          struct(lit("1_view").as("stage"), col("nv").as("n_users"),
            lit(1000000L).as("conv_from_top_fp")),
          struct(lit("2_view_click").as("stage"), col("nc").as("n_users"),
            floor(col("nc") * lit(1000000.0) / col("nv")).cast("long")
              .as("conv_from_top_fp")),
          struct(lit("3_view_click_purchase").as("stage"),
            col("np").as("n_users"),
            floor(col("np") * lit(1000000.0) / col("nv")).cast("long")
              .as("conv_from_top_fp")))).as("r"))
        .select("r.*")
        .orderBy("stage")
    },
    Some("""WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS v_ts FROM events
           |  WHERE event_type = 'view' GROUP BY user_id),
           |c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_ts
           |  FROM events e JOIN v USING (user_id)
           |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_ts
           |  GROUP BY e.user_id),
           |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_ts
           |  FROM events e JOIN c USING (user_id)
           |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_ts
           |  GROUP BY e.user_id),
           |n AS (SELECT (SELECT COUNT(*) FROM v) AS nv,
           |  (SELECT COUNT(*) FROM c) AS nc,
           |  (SELECT COUNT(*) FROM p) AS np)
           |SELECT stage, n_users, conv_from_top_fp FROM (
           |  SELECT '1_view' AS stage, CAST(nv AS BIGINT) AS n_users,
           |    CAST(1000000 AS BIGINT) AS conv_from_top_fp FROM n
           |  UNION ALL
           |  SELECT '2_view_click', CAST(nc AS BIGINT),
           |    CAST(floor(nc * 1000000.0 / nv) AS BIGINT) FROM n
           |  UNION ALL
           |  SELECT '3_view_click_purchase', CAST(np AS BIGINT),
           |    CAST(floor(np * 1000000.0 / nv) AS BIGINT) FROM n)
           |ORDER BY stage""".stripMargin))

  /** q91: SCD TYPE-2 apply-changes — the `stored_as_scd_type = 2` half
    * of the DLT API whose type-1 half is q06
    * (reference: notebooks/03_Data_Ingestion.py:320-326 uses type 1;
    * the same public API carries both). Where q89 versions a plain
    * event stream, this runs the full CDC contract through
    * [[graft.operators.ApplyChanges.applyChangesScd2]]: delete
    * tombstones ('error' rows) CLOSE the open version without opening
    * one, consecutive changes with an identical tracked payload
    * collapse instead of bumping the version, and the sequence is the
    * total (ts_us, event_id) order, so out-of-order arrival cannot
    * change the history.
    */
  val q91Scd2ApplyChanges = NamedQuery(
    "q91_scd2_apply_changes",
    "DLT-style SCD2 apply_changes over the events changelog: per-user " +
      "event_type version history with (ts_us, event_id) validity " +
      "bounds; 'error' tombstones close versions, identical payloads " +
      "collapse.",
    (s, d) => {
      val hist = ApplyChanges.applyChangesScd2(
        Tables.events(s, d).drop("ts", "props"),
        keys = Seq("user_id"),
        sequenceBy = Seq(col("ts_us"), col("event_id")),
        deleteExpr = col("event_type") === "error",
        exceptColumns = Seq("event_id", "value", "ts_us"))
      hist.select(col("user_id"), col("event_type"),
          col("__start.__seq0").as("start_ts_us"),
          col("__start.__seq1").as("start_event_id"),
          col("__end.__seq0").as("end_ts_us"),
          col("__end.__seq1").as("end_event_id"))
        .orderBy("user_id", "start_ts_us", "start_event_id")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
           |    event_id, event_type = 'error' AS is_del FROM events),
           |m AS (SELECT *, LAG(is_del) OVER w AS pd,
           |    LAG(event_type) OVER w AS pp
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |c AS (SELECT *, (pd IS NULL OR (is_del AND NOT pd)
           |    OR (NOT is_del AND (pd OR event_type IS DISTINCT FROM pp)))
           |    AS chg FROM m),
           |f AS (SELECT * FROM c WHERE chg),
           |v AS (SELECT user_id, event_type, is_del,
           |    us AS start_ts_us, event_id AS start_event_id,
           |    LEAD(us) OVER w2 AS end_ts_us,
           |    LEAD(event_id) OVER w2 AS end_event_id
           |  FROM f WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id))
           |SELECT user_id, event_type, start_ts_us, start_event_id,
           |  end_ts_us, end_event_id
           |FROM v WHERE NOT is_del
           |ORDER BY user_id, start_ts_us, start_event_id""".stripMargin))

  /** q172: RECENCY-DECAYED AGGREGATES — half-life weighting of
    * interaction data (the "recent data matters more" curation rule
    * for behavioral training corpora), kept EXACT: weight =
    * 2^20 >> (age_days div halflife), i.e. the decay curve is stepped
    * per half-life and each step is an exact power-of-two fixed-point
    * long (`1048576 >> k` is bit-identical in any engine — no
    * pow/exp double whose rounding could hash-diverge). Age anchors to
    * the corpus max timestamp (1-row broadcast), the weight is
    * row-local arithmetic on ts_us, and the per-type decayed mass is
    * one hash-agg — so the whole recency profile costs a scan.
    * `share_fp6` ranks types by decayed mass; comparing it with the
    * unweighted share exposes which event types are fading vs fresh.
    */
  val q172RecencyDecay = NamedQuery(
    "q172_recency_decay",
    "Half-life-decayed event mass per type: exact power-of-two fp20 " +
      "weights (1048576 >> age div halflife), anchored to max ts; " +
      "decayed vs raw share fp6, one scan + one hash-agg.",
    (s, d) => {
      val ev = Tables.events(s, d)
      val anchor = ev.agg(max("ts_us").as("max_ts_us"))
      val weighted = ev.crossJoin(broadcast(anchor))
        .withColumn("k", least(
          expr("(max_ts_us - ts_us) div 86400000000 div 7"), lit(20L)))
        .withColumn("w_fp20",
          expr("shiftright(1048576L, cast(k as int))"))
      val perType = weighted.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("w_fp20").as("decayed_mass_fp20"))
      val tot = perType.agg(sum("n_events").as("n_tot"),
        sum("decayed_mass_fp20").as("m_tot"))
      perType.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_events"),
          col("decayed_mass_fp20"),
          expr("(n_events * 1000000) div n_tot").as("raw_share_fp6"),
          // DECIMAL(38,0): mass ~ n_events*2^20, so the *1e6 clears
          // BIGINT at ~1e12 events (q167 discipline, headroom to 1e38)
          expr("CAST((CAST(decayed_mass_fp20 AS DECIMAL(38,0)) * 1000000)" +
            " div m_tot AS BIGINT)").as("decayed_share_fp6"))
        .orderBy("event_type")
    },
    Some("""WITH a AS (SELECT MAX(epoch_us(ts)) AS max_ts_us FROM events),
           |w AS (SELECT event_type,
           |    1048576 >> CAST(LEAST(
           |      (a.max_ts_us - epoch_us(ts)) // 86400000000 // 7, 20)
           |      AS INT) AS w_fp20
           |  FROM events, a),
           |pt AS (SELECT event_type, COUNT(*) AS n_events,
           |    CAST(SUM(w_fp20) AS BIGINT) AS decayed_mass_fp20
           |  FROM w GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_tot,
           |    CAST(SUM(decayed_mass_fp20) AS BIGINT) AS m_tot FROM pt)
           |SELECT event_type, n_events, decayed_mass_fp20,
           |  CAST((n_events * 1000000) // n_tot AS BIGINT)
           |    AS raw_share_fp6,
           |  CAST((decayed_mass_fp20::HUGEINT * 1000000) // m_tot AS BIGINT)
           |    AS decayed_share_fp6
           |FROM pt, tot ORDER BY event_type""".stripMargin))

  /** q181: AS-OF JOIN DIRECTIONS — the full pandas `merge_asof`
    * surface on the single-shuffle union+fill operator
    * ([[graft.operators.AsOfJoin.asOf]]): for each min-type event,
    * match the max-type event stream per user backward (latest ≤),
    * forward (earliest ≥ — the same fill under a descending window
    * order) and nearest (smaller |gap|, ties → backward). One summary
    * row per direction pins n_matched, the total |ts gap| and the
    * matched-value checksum — numbers that flip if inclusivity, tie
    * order, or either fill direction regresses. Scale shape per
    * direction: ONE keyed sort-shuffle of |L|+|R| rows (nearest runs
    * two sorts over the one exchange); no pairwise range-join blowup.
    * The right side is pre-aggregated per (user, ts) — the operator's
    * uniqueness contract.
    */
  val q181AsOfDirections = NamedQuery(
    "q181_asof_directions",
    "merge_asof backward/forward/nearest on one union+fill shuffle: " +
      "per direction, matches, total |gap| and matched-value " +
      "checksum (cents, exact).",
    (s, d) => {
      import graft.operators.AsOfJoin
      val ev = Tables.events(s, d)
      val tb = ev.agg(min("event_type").as("lt"),
        max("event_type").as("rt")).head
      val (lt, rt) = (tb.getString(0), tb.getString(1))
      val left = ev.filter(col("event_type") === lt)
        .select(col("user_id"), col("ts_us").as("l_ts"), col("event_id"))
      val right = ev.filter(col("event_type") === rt)
        .groupBy(col("user_id"), col("ts_us").as("r_ts"))
        .agg(expr("CAST(max(floor(value * 100)) AS LONG)").as("cents"))
        .withColumn("matched_ts", col("r_ts"))
      val frames = Seq("backward", "forward", "nearest").map { dir =>
        AsOfJoin.asOf(left, right, Seq("user_id"), "l_ts", "r_ts", dir)
          .agg(count(lit(1)).as("n_left"),
            count(col("cents")).as("n_matched"),
            coalesce(sum(abs(col("l_ts") - col("matched_ts"))), lit(0L))
              .as("sum_gap_us"),
            coalesce(sum(col("cents")), lit(0L)).as("sum_cents"))
          .select(lit(dir).as("direction"), col("n_left"),
            col("n_matched"), col("sum_gap_us"), col("sum_cents"))
      }
      frames.reduce(_ unionByName _).orderBy("direction")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us,
           |    event_type, value FROM events),
           |tb AS (SELECT min(event_type) AS lt, max(event_type) AS rt
           |  FROM ev),
           |l AS (SELECT user_id, ts_us AS l_ts FROM ev, tb
           |  WHERE event_type = lt),
           |r AS (SELECT user_id, ts_us AS r_ts,
           |    CAST(max(floor(value * 100)) AS BIGINT) AS cents
           |  FROM ev, tb WHERE event_type = rt GROUP BY 1, 2),
           |u AS (SELECT user_id, l_ts AS ts, 1 AS side,
           |    NULL::BIGINT AS rts, NULL::BIGINT AS cents FROM l
           |  UNION ALL SELECT user_id, r_ts, 0, r_ts, cents FROM r),
           |f AS (SELECT *,
           |    last_value(rts IGNORE NULLS) OVER wb AS b_ts,
           |    last_value(cents IGNORE NULLS) OVER wb AS b_cents,
           |    last_value(rts IGNORE NULLS) OVER wf AS f_ts,
           |    last_value(cents IGNORE NULLS) OVER wf AS f_cents
           |  FROM u WINDOW
           |    wb AS (PARTITION BY user_id ORDER BY ts ASC, side ASC
           |      ROWS UNBOUNDED PRECEDING),
           |    wf AS (PARTITION BY user_id ORDER BY ts DESC, side ASC
           |      ROWS UNBOUNDED PRECEDING)),
           |lf AS (SELECT *,
           |    CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL
           |      THEN b_ts WHEN ts - b_ts <= f_ts - ts THEN b_ts
           |      ELSE f_ts END AS n_ts,
           |    CASE WHEN b_ts IS NULL THEN f_cents WHEN f_ts IS NULL
           |      THEN b_cents WHEN ts - b_ts <= f_ts - ts THEN b_cents
           |      ELSE f_cents END AS n_cents
           |  FROM f WHERE side = 1)
           |SELECT 'backward' AS direction, COUNT(*) AS n_left,
           |  COUNT(b_cents) AS n_matched,
           |  CAST(COALESCE(SUM(abs(ts - b_ts)), 0) AS BIGINT)
           |    AS sum_gap_us,
           |  CAST(COALESCE(SUM(b_cents), 0) AS BIGINT) AS sum_cents
           |FROM lf
           |UNION ALL SELECT 'forward', COUNT(*), COUNT(f_cents),
           |  CAST(COALESCE(SUM(abs(ts - f_ts)), 0) AS BIGINT),
           |  CAST(COALESCE(SUM(f_cents), 0) AS BIGINT) FROM lf
           |UNION ALL SELECT 'nearest', COUNT(*), COUNT(n_cents),
           |  CAST(COALESCE(SUM(abs(ts - n_ts)), 0) AS BIGINT),
           |  CAST(COALESCE(SUM(n_cents), 0) AS BIGINT) FROM lf
           |ORDER BY direction""".stripMargin))

  /** q182: ALLEN-RELATION CENSUS — temporal-logic classification of
    * every overlapping interval pair from q51's fixture (per-user-day
    * activity × daily incident windows): one bucketed candidate join
    * ([[graft.operators.IntervalJoin.overlapJoin]] — every
    * non-`disjoint` Allen relation implies overlap, so ONE candidate
    * pass serves all classes), then a row-local CASE ladder assigns
    * the pair its relation — equal / a-contains-b (`contains`) /
    * b-contains-a (`during`) / boundary touch (`meets`/`met_by`) /
    * proper overlap (`overlaps`/`overlapped_by`). The census (n pairs
    * + summed overlap length per class, µs-exact) is the shape
    * temporal QA runs at scale: bucket equi-join + hash-agg, no
    * nested-loop range join, and a classification change (an off-by-
    * one on any boundary) flips a hash-checked count.
    */
  val q182AllenRelations = NamedQuery(
    "q182_allen_relations",
    "Allen-relation census over interval pairs: one bucketed overlap " +
      "join feeds a row-local relation ladder; pairs + overlap-µs per " +
      "class, exact.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val activity = ev.groupBy("user_id", "day")
        .agg(min("ts_us").as("a_start"), max("ts_us").as("a_end"))
        .select(concat_ws("#", col("user_id"), col("day")).as("a_id"),
          col("a_start"), col("a_end"))
      val incidents = ev.filter(col("event_type") === "error")
        .groupBy("day")
        .agg(min("ts_us").as("b_start"), max("ts_us").as("b_end"))
        .select(col("day").as("b_id"), col("b_start"), col("b_end"))
      graft.operators.IntervalJoin
        .overlapJoin(activity, incidents, bucketUs = 3600L * 1000000L)
        .withColumn("relation",
          when(col("a_start") === col("b_start") &&
            col("a_end") === col("b_end"), "equal")
            .when(col("a_start") <= col("b_start") &&
              col("b_end") <= col("a_end"), "contains")
            .when(col("b_start") <= col("a_start") &&
              col("a_end") <= col("b_end"), "during")
            .when(col("a_end") === col("b_start"), "meets")
            .when(col("b_end") === col("a_start"), "met_by")
            .when(col("a_start") < col("b_start"), "overlaps")
            .otherwise("overlapped_by"))
        .withColumn("overlap_us",
          least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start")))
        .groupBy("relation")
        .agg(count(lit(1)).as("n_pairs"),
          sum("overlap_us").as("sum_overlap_us"))
        .orderBy("relation")
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
           |    strftime(ts, '%Y-%m-%d') AS day FROM events),
           |activity AS (SELECT CAST(user_id AS VARCHAR) || '#' || day
           |      AS a_id,
           |    MIN(ts_us) AS a_start, MAX(ts_us) AS a_end
           |  FROM ev GROUP BY user_id, day),
           |incidents AS (SELECT day AS b_id,
           |    MIN(ts_us) AS b_start, MAX(ts_us) AS b_end
           |  FROM ev WHERE event_type = 'error' GROUP BY day),
           |pairs AS (SELECT a_start, a_end, b_start, b_end
           |  FROM activity a JOIN incidents b
           |    ON a.a_start <= b.b_end AND b.b_start <= a.a_end),
           |cls AS (SELECT
           |    CASE WHEN a_start = b_start AND a_end = b_end THEN 'equal'
           |      WHEN a_start <= b_start AND b_end <= a_end
           |        THEN 'contains'
           |      WHEN b_start <= a_start AND a_end <= b_end THEN 'during'
           |      WHEN a_end = b_start THEN 'meets'
           |      WHEN b_end = a_start THEN 'met_by'
           |      WHEN a_start < b_start THEN 'overlaps'
           |      ELSE 'overlapped_by' END AS relation,
           |    LEAST(a_end, b_end) - GREATEST(a_start, b_start)
           |      AS overlap_us
           |  FROM pairs)
           |SELECT relation, COUNT(*) AS n_pairs,
           |  CAST(SUM(overlap_us) AS BIGINT) AS sum_overlap_us
           |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q181AsOfDirections, q182AllenRelations,
    q172RecencyDecay,
    q05LatestPerKey, q06ApplyChanges, q07RenestExplode, q08WindowRunning,
    q11JsonExtract, q28Sessionize, q46AsOfJoin, q51IntervalJoin, q99AsOfExec,
    q59RollingFeatures, q66GapfillLocf, q71HoppingWindow,
    q78TransitionMatrix, q79CohortRetention, q84RangeJoinSpine,
    q89Scd2History, q91Scd2ApplyChanges, q101PointInTime,
    q112FunnelConversion)
}
