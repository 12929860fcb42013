package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.NamedQuery
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.EventRow

/** Real Structured Streaming plans driven to completion on bounded input
  * (file source + Trigger.AvailableNow + memory sink), so the driver's
  * batch harness exercises the streaming operators end-to-end and the
  * DuckDB oracle can still check the result.
  *
  * Unique memory-sink names per invocation keep Verify/Bench reruns safe.
  */
object StreamingQueries {

  private val runId = new java.util.concurrent.atomic.AtomicLong()
  private def qname(base: String) = s"${base}_${runId.incrementAndGet()}"

  val q22StreamDedup = NamedQuery(
    "q22_stream_dedup",
    "The reference's watermarked streaming dedup (O20/O21, " +
      "03_Data_Ingestion.py:218-219): withWatermark(1h) + dropDuplicates " +
      "on the key, projected to the key set (which physical duplicate " +
      "survives is arrival-order-dependent, as in the reference — the key " +
      "set is the deterministic contract).",
    (s, d) => {
      val deduped = StreamingOps.watermarkDedup(
        StreamingOps.eventsStream(s, d), "ts", "1 hour",
        Seq("user_id", "event_type"))
      StreamingOps.runToMemory(s, deduped.select("user_id", "event_type"),
          qname("stream_dedup"), OutputMode.Append)
        .distinct() // late dupes past the watermark may re-emit, like O26
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT DISTINCT user_id, event_type FROM events
           |ORDER BY user_id, event_type""".stripMargin))

  val q23StreamApplyChanges = NamedQuery(
    "q23_stream_apply_changes",
    "Streaming CDC apply-changes (O22) via mapGroupsWithState: per-key " +
      "state keeps the max (ts_us, event_id) row, so the final table " +
      "equals the batch latestByKey regardless of arrival order; matches " +
      "q05's oracle.",
    (s, d) => {
      import s.implicits._
      val events = StreamingOps.eventsStream(s, d)
        .selectExpr("event_id", "user_id", "event_type", "value", "props", "ts_us")
        .as[EventRow]
      val latest = StreamingOps.latestPerKeyStream(events)
      // Update mode + AvailableNow(single batch) ⇒ one current row per key.
      StreamingOps.runToMemory(s, latest.toDF(), qname("stream_apply"),
          OutputMode.Update)
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id AS last_event_id,
           |  value AS last_value, epoch_us(ts) AS last_ts_us
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
           |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
           |WHERE rn = 1
           |ORDER BY user_id, event_type""".stripMargin))

  val q24StreamWindowAgg = NamedQuery(
    "q24_stream_window_agg",
    "Event-time tumbling-window aggregation with watermark (the streaming " +
      "agg shape the reference's gold cadence implies): 1h windows × " +
      "event_type, count + exact decimal sum, Complete mode.",
    (s, d) => {
      val agg = StreamingOps.eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      StreamingOps.runToMemory(s,
          agg.select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type"), col("n_events"), col("sum_value")),
          qname("stream_window"), OutputMode.Complete)
        .orderBy("window_start", "event_type")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           |  event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events
           |GROUP BY date_trunc('hour', ts), event_type
           |ORDER BY window_start, event_type""".stripMargin))

  val q35StreamStreamJoin = NamedQuery(
    "q35_stream_stream_join",
    "Watermarked stream-stream inner join (purchase attributed to a click " +
      "by the same user within the preceding 2 hours): both sides " +
      "watermarked 1h, time-range join condition bounds the state store — " +
      "the 100 TB requirement for any stream-stream join. Single " +
      "AvailableNow batch ⇒ result set equals the batch time-bound join.",
    (s, d) => {
      // both sides derive from ONE streaming source (a stream self-join):
      // the file source is scanned once per micro-batch, not once per
      // side — measurably cheaper and the 100 TB-right shape when both
      // sides come from the same topic
      val src = StreamingOps.eventsStream(s, d)
      val clicks = src
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val buys = src
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("b_ts"))
        .withWatermark("b_ts", "1 hour")
      val joined = clicks.join(buys,
          col("c_user") === col("b_user") &&
            col("b_ts") >= col("c_ts") &&
            col("b_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS"))
        .select(col("c_user").as("user_id"), col("click_id"), col("buy_id"))
      StreamingOps.runToMemory(s, joined, qname("stream_ss_join"),
          OutputMode.Append)
        .orderBy("user_id", "click_id", "buy_id")
    },
    // µs-exact batch equivalent: b within [c, c + 2h] (7_200_000_000 µs)
    Some("""SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id
           |FROM events c JOIN events b
           |ON c.user_id = b.user_id
           |AND c.event_type = 'click' AND b.event_type = 'purchase'
           |AND epoch_us(b.ts) >= epoch_us(c.ts)
           |AND epoch_us(b.ts) <= epoch_us(c.ts) + 7200000000
           |ORDER BY c.user_id, click_id, buy_id""".stripMargin))

  /** q61: the stream-STATIC join — the enrichment shape every streaming
    * pipeline runs (fact stream × slowly-changing dim). The static side
    * is explicitly `broadcast()`: no state store, no watermark needed
    * (unlike q35's stream-stream join), each micro-batch hash-joins
    * against the broadcast dim locally — at 100 TB/day of stream this is
    * the only join shape that never shuffles the stream.
    */
  val q61StreamStaticEnrich = NamedQuery(
    "q61_stream_static_enrich",
    "Stream-static broadcast enrichment: the events stream joined to the " +
      "static customer dim (user_id = c_custkey), aggregated to market " +
      "segment (count + exact decimal sum), Complete mode.",
    (s, d) => {
      val cust = graft.Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val agg = StreamingOps.eventsStream(s, d)
        .join(broadcast(cust), Seq("user_id"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
      StreamingOps.runToMemory(s, agg, qname("stream_enrich"),
          OutputMode.Complete)
        .orderBy("segment")
    },
    Some("""SELECT c_mktsegment AS segment, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events e JOIN customer c ON e.user_id = c.c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY segment""".stripMargin))

  /** q77: watermarked stream-stream LEFT OUTER join — the attribution
    * query that also reports clicks that never converted, which is the
    * semantically hard streaming case: a null-extended row may only be
    * emitted once the watermark PROVES no matching purchase can still
    * arrive (inner results stream immediately; outer results are
    * watermark-gated). State stays bounded exactly as in q35 (both
    * sides watermarked + a time-range condition). The left side is
    * restricted to clicks ≥ 3 days before stream end so every join
    * window closes inside the run — AvailableNow's final no-data batch
    * advances the watermark past them and flushes the null-extensions;
    * unbounded tails would stay in state and be dropped at shutdown
    * (the documented reason outer stream joins need a closing
    * watermark). Unmatched rows surface as buy_id = -1 (null-free
    * output for the driver compare).
    */
  val q77StreamOuterJoin = NamedQuery(
    "q77_stream_outer_join",
    "Stream-stream LEFT OUTER click→purchase attribution (2h window, " +
      "1h watermarks, clicks bounded off the stream tail): unmatched " +
      "clicks emit buy_id = -1 via the closing watermark batch.",
    (s, d) => {
      // watermark BEFORE the click filter: computed on the filtered
      // stream it would stall at cutoff−1h and the last joinWindow+delay
      // of retained clicks could never prove themselves unmatched (10
      // rows stuck in state when this was first built). On the full
      // stream it advances to streamEnd−1h, past every retained click.
      val src = StreamingOps.eventsStream(s, d)
        .withWatermark("ts", "1 hour")
      val clicks = src
        .filter(col("event_type") === "click" &&
          col("ts") < lit("2024-01-28 00:00:00").cast("timestamp"))
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      val buys = src
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("b_ts"))
      val joined = clicks.join(buys,
          col("c_user") === col("b_user") &&
            col("b_ts") >= col("c_ts") &&
            col("b_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS"),
          "left_outer")
        .select(col("c_user").as("user_id"), col("click_id"),
          coalesce(col("buy_id"), lit(-1L)).as("buy_id"))
      StreamingOps.runToMemory(s, joined, qname("stream_oj"),
          OutputMode.Append)
        .orderBy("user_id", "click_id", "buy_id")
    },
    Some("""SELECT c.user_id, c.event_id AS click_id,
           |  COALESCE(b.event_id, -1) AS buy_id
           |FROM (SELECT * FROM events WHERE event_type = 'click'
           |      AND ts < TIMESTAMP '2024-01-28 00:00:00') c
           |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
           |ON c.user_id = b.user_id
           |AND epoch_us(b.ts) >= epoch_us(c.ts)
           |AND epoch_us(b.ts) <= epoch_us(c.ts) + 7200000000
           |ORDER BY c.user_id, click_id, buy_id""".stripMargin))

  /** q81: STREAMING session windows — q28's sessionization through the
    * stateful streaming path (`session_window` + watermark, Append
    * mode), where sessions live in the state store, merge on overlap,
    * and only emit once the watermark proves no event can extend them.
    * Same tail discipline as q77: the input is bounded 3 days off the
    * stream end so the closing no-data batch flushes every session
    * (an unbounded tail would leave the last sessions un-emitted in
    * state at shutdown). The result is bit-matched to the batch
    * gaps-and-islands oracle over the same bounded slice — streaming
    * and batch sessionization provably agree.
    */
  val q81StreamSessions = NamedQuery(
    "q81_stream_sessions",
    "Streaming session_window(30 min) per user with 1h watermark, " +
      "Append mode, input bounded off the stream tail: session " +
      "bounds, counts, exact decimal sums — equals batch sessions.",
    (s, d) => {
      val agg = StreamingOps.eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .filter(col("ts") < lit("2024-01-28 00:00:00").cast("timestamp"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
      StreamingOps.runToMemory(s, agg, qname("stream_sessions"),
          OutputMode.Append)
        .orderBy("user_id", "session_start_us")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events
           |  WHERE ts < TIMESTAMP '2024-01-28 00:00:00'),
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

  /** q198: STREAMING RAG LOOP, closed end-to-end — the serving-path
    * composition the streaming ingest (StreamingChunkIngestSpec) and
    * the batch read path (q190) each proved half of: documents arrive
    * as a STREAM (file source, ≥3 micro-batches), are chunked IN the
    * stream ([[graft.operators.Chunker.chunk]] is a stateless
    * row-local generate), and accumulate exactly-once into a managed
    * chunk table via per-batch idempotence tags — the maintained
    * index. Retrieval then runs AGAINST THAT INDEX, not the raw
    * corpus: q190's full hybrid read path (BM25 + probed dense + RRF
    * + budgeted context packing) over the streamed chunk table. The
    * oracle derives everything from the raw corpus in SQL, so a
    * single lost, duplicated, or mutated chunk anywhere in the
    * streaming path changes the corpus-wide stats (n_chunks, df,
    * t_total, IVF cells) and breaks the hash — the q22/q27
    * streamed-equals-batch discipline applied to the whole RAG tier.
    * Scale shape: ingest is the idempotent streaming-sink path
    * (per-batch manifest commits); retrieval inherits q190's guarded
    * shapes unchanged, just rooted at an index scan instead of a
    * corpus re-chunk — which is ALSO the production win: the serving
    * query no longer pays the chunk+tokenize pass, the stream
    * already did.
    */
  val q198StreamingRagLoop = NamedQuery(
    "q198_streaming_rag_loop",
    "Streamed chunk ingest (exactly-once, >=3 micro-batches) into a " +
      "managed chunk index, then q190's hybrid retrieval + context " +
      "packing against the STREAMED index; oracle from the raw corpus.",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val root = graft.Scratch.dir("ragloop", d) + "/" +
        runId.incrementAndGet()
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = graft.Tables.documents(s, d).select("doc_id", "text")
      (0 until 3).foreach { i =>
        docs.filter(col("doc_id") % 3 === i).coalesce(1)
          .write.mode("append").parquet(s"$root/in")
      }
      val tbl = s"$root/chunks"
      val q = graft.operators.Chunker.chunk(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
          "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.sources.ManagedTable.idempotentAppend(b, tbl, id); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      VectorQueries.contextPackFrom(s, d,
        graft.sources.ManagedTable.read(s, tbl))
    },
    Some(VectorQueries.ContextPackOracleSql))

  val all: Seq[NamedQuery] = Seq(
    q22StreamDedup, q23StreamApplyChanges, q24StreamWindowAgg,
    q35StreamStreamJoin, q61StreamStaticEnrich, q77StreamOuterJoin,
    q81StreamSessions, q198StreamingRagLoop)
}
