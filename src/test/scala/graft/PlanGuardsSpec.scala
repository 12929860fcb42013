package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape guards: the scale-critical physical-plan properties that
  * SCALE.md documents must stay true — a change that silently regresses
  * one of them (an interpreted fallback, a lost broadcast, a full sort
  * where top-k pushdown belongs, an unpushed filter) fails here instead
  * of only showing up as a bench delta.
  */
class PlanGuardsSpec extends SparkSpec {

  private def plan(name: String): String = {
    val fn = SparkEntry.queries(name)
    fn(spark, sf("sf0.001")).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
  }

  test("q02 pushes the equality + range filters into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "the dynamic equality filter must reach the scan")
  }

  test("q05 CDC latest-per-key is a partial-aggregating max_by, not a window sort") {
    val p = plan("q05_latest_per_key")
    assert(p.contains("partial_max_by"),
      "map-side partial aggregation is the 100 TB property")
    assert(!p.contains("WindowExec"), "no window sort in the CDC path")
  }

  test("q09 top-k is TakeOrderedAndProject, not a global sort") {
    assert(plan("q09_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q20 hashes buckets with the native expression and broadcasts the query side") {
    val p = plan("q20_ann_lsh")
    assert(p.contains("lshbucket"),
      "bucket hashing must stay the native codegen'd expression")
    assert(p.contains("BroadcastHashJoin"),
      "the bucket join must broadcast the small query side")
  }

  test("q03 dims are broadcast, never shuffled") {
    val p = plan("q03_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // The skew remedy SCALE.md leans on: one hot key must not pin a
    // single reducer — AQE's OptimizeSkewedJoin splits the oversized
    // partition into parallel sub-joins (the plan's SMJ carries
    // `skew=true`). Thresholds are lowered so local-mode data sizes
    // qualify; salting (q47) remains the static alternative.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~95% of the left side lands on key 0; pad makes the hot
      // partition exceed the lowered skew threshold
      val left = spark.range(0, 200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 97)
            .as("k"),
          concat(lit("x" * 64), col("id")).as("pad"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        col("id").as("dim"))
      val joined = left.join(right, "k")
      // execute THIS dataset's plan: AQE finalizes (and skew-splits) the
      // adaptive plan only for the query that actually ran — count()
      // would execute a different QueryExecution
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ in:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hive-partitioned write + equality filter prunes partitions at the scan") {
    // The 100 TB layout contract: a corpus written partitionBy(date/lang/
    // split) must serve a partition-filtered query by LISTING only the
    // matching directories — the filter shows up as PartitionFilters on
    // the scan (metadata-only) rather than as a row-level PushedFilter.
    import org.apache.spark.sql.functions._
    val dir = s"/tmp/graft-partitioned-${System.nanoTime()}"
    try {
      Tables.documents(spark, sf("sf0.001"))
        .write.partitionBy("lang").mode("overwrite").parquet(dir)
      val q = spark.read.parquet(dir).filter(col("lang") === "en")
        .select("doc_id", "n_chars")
      val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("PartitionFilters") && p.contains("lang"),
        s"lang filter must prune partitions, not scan rows:\n${p.take(800)}")
      // pruning is metadata-only: the executed scan must READ fewer files
      // than an unpruned scan of the same table (the numFiles SQL metric)
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        assert(df.collect().nonEmpty)
        df.queryExecution.executedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numFiles").value
        }.sum
      }
      val pruned = filesRead(q)
      val full = filesRead(spark.read.parquet(dir).select("doc_id", "n_chars"))
      assert(pruned > 0 && pruned < full,
        s"expected a pruned scan, read $pruned of $full files")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      ()
    }
  }

  test("q63 stats join is a 1-row broadcast, not a shuffle of the corpus") {
    val p = plan("q63_length_outliers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the single stats row must be broadcast")
    assert(!p.contains("SortMergeJoin"), "no corpus-wide join for one row")
  }

  test("q64 bottom-k uses WindowGroupLimit rank pushdown") {
    val p = plan("q64_kmv_distinct")
    assert(p.contains("WindowGroupLimit"),
      "each map task must keep only k rows per group before the exchange")
  }

  test("q65 top-k is TakeOrderedAndProject and the sketch is broadcast") {
    val p = plan("q65_cms_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"),
      "the fixed-size CMS table must broadcast to the probe side")
  }

  test("q68 funnel materializes the flag table once and broadcasts rates") {
    val p = plan("q68_corpus_pipeline")
    // the flag table fans out to the rate aggregation and the final
    // funnel; without the cache each branch re-runs the whole
    // scan+window lineage (6 parquet scans when this guard was written).
    // The cached plan prints once per InMemoryTableScan, so count the
    // REUSE nodes, not the scans inside them.
    assert(p.contains("InMemoryTableScan"),
      "flag table must be materialized, not recomputed per branch")
    assert(!p.contains("SortMergeJoin"),
      "the rates join must broadcast |langs| rows")
  }

  test("q84 pure range join is rewritten to a binned equi-join, no nested loop") {
    val p = plan("q84_range_join_spine")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "RangeJoinRewrite must replace the nested-loop range join")
    assert(p.contains("__graft_bin"),
      "the binned equi-join key must be present in the plan")
  }

  test("q117 exact-k sample aggregates map-side heaps, no window sort") {
    val p = plan("q117_exact_k_sample")
    assert(p.contains("partial_graft_top_k_pair"),
      "the bounded heap must partial-aggregate before the exchange")
    assert(!p.contains("WindowExec") && !p.contains("row_number"),
      "no corpus-wide window sort in the exact-k path")
  }

  test("q118 quantiles: one corpus pass, windows share one sort, agg reuses the partitioning") {
    val p = plan("q118_grouped_quantiles")
    // "(n) Scan parquet" detail headers — one per physical scan node
    assert(p.split("\\) Scan parquet").length - 1 == 1,
      "the corpus must be scanned once (value-level counts), not per branch")
    // cum + total stack as two Window nodes over ONE Sort/Exchange, and
    // the final per-lang aggregate reuses the lang hash partitioning:
    // exactly 3 exchanges (counts agg, window partition, final orderBy)
    assert(p.split("\\) Exchange").length - 1 == 3,
      "quantile assembly must not add exchanges beyond counts/window/order")
  }

  test("q119 inverted index: df window and posting agg share one gram shuffle") {
    val p = plan("q119_inverted_index")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "df must come from a window over the gram partition, not a join-back")
    // one exchange partitions by gram (window + agg both use it), one
    // is the final orderBy: the gram stage is never computed twice
    assert(p.split("\\) Exchange").length - 1 == 2,
      "posting aggregation must reuse the window's gram partitioning")
  }

  test("q121 repeated spans: one corpus scan, dup flag is a window, no join-back") {
    val p = plan("q121_repeated_spans")
    // the flagged gram stream is cached; both the span-count and the
    // coverage branches must read the cache, not re-scan the corpus
    assert(p.split("\\) Scan parquet").length - 1 == 1,
      "the corpus must be scanned once; branches read the cached grams")
    // cross-doc detection is min≠max over the gk partition — a second
    // corpus-wide join (beyond the final per-doc assembly) would mean
    // a distinct+join-back crept back in
    assert(p.split("SortMergeJoin").length - 1 <= 1
      && !p.contains("CartesianProduct"),
      "dup flag must come from the gk window, not a dup-set join-back")
  }

  test("q123 PageRank: cached vertex/edge tables bound the scans; no cartesian") {
    val p = plan("q123_pagerank")
    // one scan builds the minhash pair cache, one feeds the cached
    // vertex projection — the 3-iteration rank loop must not re-derive
    // either (uncached this plan showed NINE corpus scans)
    assert(p.split("\\) Scan parquet").length - 1 <= 2,
      "rank iterations must read the caches, not re-scan the corpus")
    assert(!p.contains("CartesianProduct"),
      "only 1-row broadcast const joins are allowed")
  }

  test("q124 frequent pairs: one scan; broadcast a-priori filter; row-local expansion") {
    val p = plan("q124_frequent_pairs")
    assert(p.split("\\) Scan parquet").length - 1 == 1,
      "supports, basket filter and order count must share the cached basket scan")
    assert(!p.contains("CartesianProduct"),
      "pair expansion must be row-local over per-basket arrays")
    assert(!p.contains("SortMergeJoin"),
      "the frequent-item filter must broadcast, never shuffle-join the baskets")
  }

  test("q125 JL projection is row-local: no shuffle before the output sort") {
    val p = plan("q125_jl_projection")
    assert(p.split("\\) Scan parquet").length - 1 == 1)
    assert(p.split("\\) Exchange").length - 1 == 1,
      "the projection must fuse into the scan; only the orderBy exchanges")
  }

  test("q126 weighted sample aggregates map-side heaps, no window sort") {
    val p = plan("q126_weighted_sample")
    assert(p.contains("partial_graft_top_k"),
      "selection must be the bounded-heap aggregate with a partial pass")
    assert(!p.contains("Window"), "no per-stratum window sort")
  }

  test("q132 waiting suppliers: no self-join, no Expand, top-k pushdown") {
    val p = plan("q132_waiting_suppliers")
    assert(p.split("\\) Scan parquet").length - 1 == 3,
      "lineitem, orders and supplier each scan exactly once — the " +
        "EXISTS/NOT EXISTS pair must not re-scan lineitem")
    assert(!p.contains("Expand"),
      "the two distinct counts must collapse in the per-supplier agg, " +
        "not expand the fact table")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must push down")
  }

  test("q133 large-volume customers: HAVING cut broadcasts through both joins") {
    val p = plan("q133_large_volume_customers")
    assert(p.split("\\) Scan parquet").length - 1 == 3)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "the qualifying-order set must broadcast; neither big table reshuffles")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must push down")
  }

  test("q134 filter cascade is one scan, native token stats, no shuffle before the sort") {
    val p = plan("q134_filter_cascade")
    assert(p.split("\\) Scan parquet").length - 1 == 1)
    assert(p.contains("tokenstats"),
      "signals must come from the one-pass native TokenStats expression")
    assert(!p.contains("Join") && !p.contains("Window"),
      "the cascade is row-local: no join, no window")
  }

  test("q135 water filling scans the corpus once; lambda is a broadcast scalar") {
    val p = plan("q135_token_budget")
    assert(p.split("\\) Scan parquet").length - 1 == 1,
      "the per-source table must be cached: lambda search and final " +
        "allocation share one corpus scan")
    assert(p.contains("BroadcastNestedLoop") || p.contains("BroadcastHashJoin"),
      "the 1-row water level joins back as a broadcast, never a shuffle")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q136 drift: one token scan, conditional agg (no self-join), top-k pushdown") {
    val p = plan("q136_distribution_drift")
    assert(p.split("\\) Scan parquet").length - 1 == 1,
      "the cached count table must feed totals and drift from one scan")
    assert(!p.contains("SortMergeJoin") && !p.contains("Expand"),
      "halves align by conditional aggregation, not a full-outer self-join")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must push down")
  }

  test("q137 min-cost supplier: one lineitem scan, decorrelated agg join-back") {
    val p = plan("q137_min_cost_supplier")
    assert(p.split("\\) Scan parquet").length - 1 <= 4,
      "lineitem once (cached shipped feeds agg + join-back) + dims")
    assert(p.contains("BroadcastHashJoin"),
      "part/supplier dims must broadcast")
  }

  test("q122 DSIR: one corpus scan, window term-counts, broadcast totals, top-k pushdown") {
    val p = plan("q122_dsir_importance")
    assert(p.split("\\) Scan parquet").length - 1 == 1,
      "the corpus must be scanned once; totals and weights share the cached tf")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "term counts must come from the term window, not a vocab join-back")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 selection must push down, not globally sort")
  }

  test("q138 shipping priority: pushed date filters, broadcast segment, top-k pushdown") {
    val p = plan("q138_shipping_priority")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      "the shipdate cutoff must reach the lineitem parquet scan")
    assert(p.contains("BroadcastHashJoin"),
      "the segment-filtered customer side must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must push down")
  }

  test("q139 returned items: agg before the customer join; returnflag pushed") {
    val p = plan("q139_returned_items")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "the returnflag filter must reach the lineitem scan")
    // the per-customer aggregate must appear BELOW the customer join:
    // after the final agg there is no further join in the plan walk
    assert(p.contains("TakeOrderedAndProject"), "top-20 must push down")
  }

  test("q141/q144 single-scan conditional aggregates with broadcast part dim") {
    for (name <- Seq("q141_promo_effect", "q144_bracket_predicates")) {
      val p = plan(name)
      assert(p.split("\\) Scan parquet").length - 1 == 2,
        s"$name: exactly lineitem + part, never two fact scans")
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
        s"$name: part is a broadcast dim")
    }
  }

  test("q142 top supplier: one lineitem scan; the max probes back as a broadcast") {
    val p = plan("q142_top_supplier")
    assert(p.contains("InMemoryTableScan"),
      "the per-supplier aggregate must be cached and reused, not recomputed")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "the 1-row max and the supplier dim both broadcast")
  }

  test("q145 dormant customers: anti-join with the date filter pushed to its build side") {
    val p = plan("q145_global_opportunity")
    assert(p.contains("LeftAnti"), "NOT EXISTS must execute as a left-anti join")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "the dormancy window must reach the orders scan, not filter post-join")
    assert(p.contains("BroadcastNestedLoop") || p.contains("BroadcastHashJoin"),
      "the global-average scalar joins as a 1-row broadcast")
  }

  test("q149 filtered ANN: the label predicate reaches the candidate scan") {
    val p = plan("q149_filtered_ann")
    assert(p.contains("EqualTo(label,3)"),
      "the metadata filter must push to the parquet scan — post-filtering " +
        "a top-k list loses recall under selective predicates")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      "centroids and queries stay broadcast")
  }

  test("q150 hybrid RRF: one cached gram scan; fusion joins bounded lists") {
    val p = plan("q150_hybrid_rrf")
    assert(p.contains("InMemoryTableScan"),
      "the gram table must be cached: query and candidate sides share one tokenize")
    assert(p.contains("SortMergeJoin FullOuter") || p.contains("FullOuter"),
      "fusion is a full-outer join of the two modality rankings")
  }

  test("q153 PII scrub is row-local codegen'd regex: no exchange except the output sort, no UDF") {
    val p = plan("q153_pii_redact")
    assert(p.contains("BroadcastHashJoin"),
      "the nation dim must broadcast, never shuffle")
    // exactly ONE data exchange: the rangepartitioning for the final
    // ORDER BY (counts + redaction are projections over the scan) plus
    // the broadcast exchange of the dim. Count plan NODES — the
    // formatted string repeats each node in its detail section.
    val exchanges = """\(\d+\) (Exchange|BroadcastExchange)""".r
      .findAllIn(p).size
    assert(exchanges <= 2,
      s"PII scrub must not introduce data shuffles beyond sort+broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"),
      "no shuffle join, no aggregation — the scrub is pure projection")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "regex scrub must stay codegen'd — no UDF fallback")
  }

  test("q154 band sweep: one posexploded banding pass, shared cached stages") {
    val p = plan("q154_lsh_band_sweep")
    assert(p.contains("InMemoryTableScan"),
      "the 16-hash signature table must be cached: 4 band configs share one " +
        "signature computation — recomputing it per config is the scale bug")
    // all 4 band configs flow through ONE (bands, band, band_key) explode
    // and ONE self-join (lshCandidatesMulti) — a per-config union would
    // show 4 candidate joins. The plan has exactly: 1 banded self-join,
    // 1 exact-pair gram self-join, 2 size joins, 1 left join to exact,
    // 1 configs join, 1 nExact cross join ⇒ well under the 4-way fan-out's
    // 4+ candidate joins alone.
    // count operator headers only — the formatted detail section repeats
    // each node name (same trick as the PII guard above)
    val joins = """\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)""".r
      .findAllIn(p).size
    assert(joins <= 8,
      s"band sweep must be ONE multi-config self-join, not 4 sequential " +
        s"per-config jobs (found $joins joins):\n${p.take(2000)}")
  }

  test("q159 chunking: row-local generate, no exchange below it") {
    val p = plan("q159_doc_chunks")
    assert(p.contains("Generate"), "chunking is a posexplode Generate")
    // the ONLY exchange is the final presentation sort's range
    // partitioning — tokenize/sequence/posexplode/slice all run inside
    // the scan's partitions (chunking 100 TB = one scan-bandwidth pass)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"chunking must not shuffle below the generate:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"),
      "no join, no aggregation — chunking is pure per-row expansion")
  }

  test("q161 chunk retrieval: top-k is TakeOrderedAndProject, rank window is post-limit") {
    val p = plan("q161_chunk_retrieval")
    assert(p.contains("TakeOrderedAndProject"),
      "chunk top-10 must be a bounded-heap take, not a global sort")
    // the rank window runs AFTER the limit (10 rows) — a pre-limit
    // global window would move the whole scored chunk table to one task
    val winIdx = p.indexOf("Window")
    val takeIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && winIdx < takeIdx,
      s"rank window must sit above the take in the plan:\n${p.take(1200)}")
  }

  test("q166 vocab cut is a bounded-heap take; coverage join broadcasts the vocab") {
    val p = plan("q166_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-512 vocabulary cut must be a bounded-heap take, " +
        "never a single-partition rank window")
    assert(p.contains("BroadcastHashJoin"),
      "the 512-row vocab must broadcast back onto the (source,token) table")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q168 estimate path: hash filters are row-local, no join is executed") {
    val p = plan("q168_join_size_estimate")
    assert(!p.contains("SortMergeJoin"),
      "F2 estimation must never execute the join it is sizing")
    assert(p.contains("partial_sum"),
      "per-key counts and c^2 sums must partial-aggregate map-side")
  }

  test("q169 BPE pairs: row-local generate into one hash-agg and a bounded take") {
    val p = plan("q169_bpe_pair_stats")
    assert(p.contains("Generate"), "pair slide is a row-local generate")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 merge candidates via bounded heaps, not a global sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("WindowExec"),
      "no join, no window — one keyed shuffle of (pair,count) partials")
  }

  test("q170 label transfer: vote is max_by partial agg, centroids broadcast") {
    val p = plan("q170_knn_label_transfer")
    assert(p.contains("partial_max_by"),
      "the majority vote must partial-aggregate, not window-sort")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the 16-row centroid table must broadcast")
  }

  test("q177 PRF: cached token pass reused, doc cuts are bounded heaps") {
    val p = plan("q177_prf_expansion")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "the (doc,term) explode must be cached, not recomputed per stage")
    assert(p.contains("TakeOrderedAndProject"),
      "feedback-doc and expansion-term cuts must be bounded-heap takes")
  }

  test("q178 hash embeddings: query components broadcast into the dot join") {
    val p = plan("q178_hash_embedding")
    assert(p.contains("BroadcastHashJoin"),
      "the 16-dim query components must broadcast — the corpus side " +
        "never shuffles for the dot products")
    assert(p.contains("partial_sum"),
      "dot products and norms must partial-aggregate map-side")
  }

  test("q184 dense retrieval: cached components, broadcast probes, post-limit rank") {
    val p = plan("q184_dense_chunk_retrieval")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "the (chunk,dim) component table must be cached: assignment and " +
        "query scoring both read it — twice would be two corpus scans")
    assert(p.contains("BroadcastHashJoin"),
      "centroid components, probes and query components are all tiny " +
        "and must broadcast — the chunk side never shuffles for them")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-10 must be a bounded-heap take, not a global sort")
    // the rank window runs AFTER the 10-row limit (q161's discipline) —
    // a pre-limit global window would single-task the scored candidates
    val winIdx = p.indexOf("Window")
    val takeIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && winIdx < takeIdx,
      s"rank window must sit above the take in the plan:\n${p.take(1200)}")
  }

  test("q188 CDC chunking: row-local boundaries, metadata-scale shuffles only") {
    val p = plan("q188_content_chunks")
    assert(p.contains("Generate"),
      "chunk slicing is a posexplode Generate inside the scan task")
    assert(!p.contains("SortMergeJoin"),
      "nothing payload-scale may join — only (md5,len) pairs aggregate")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "chunk stats must partial-aggregate map-side")
  }

  test("q189 delta-sync: chunk-store anti-joins carry hashes, blobs never shuffle") {
    val p = plan("q189_chunk_delta_sync")
    assert(p.contains("Generate"))
    // the anti-joins key on chunk_md5 (32-char strings + a long) —
    // whatever join strategy is picked, the blobs themselves must stay
    // in their scan tasks: no exchange may carry the text column
    val exchanges = """\(\d+\) Exchange hashpartitioning\(chunk_md5""".r
      .findAllIn(p).size
    val badExchange = """\(\d+\) Exchange[^\n]*\btext\b""".r.findAllIn(p).size
    assert(badExchange == 0,
      s"an exchange carries the raw blob column:\n${p.take(1500)}")
    assert(exchanges > 0 || p.contains("BroadcastHashJoin"),
      "store membership is an equi-join on chunk_md5")
  }

  test("q146 bucketed join: co-located scans, no exchange below the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q146_bucketed_join")(spark, sf("sf0.001"))
      val p = df.queryExecution.executedPlan.toString
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"bucketed fact-fact join should sort-merge:\n$p")
      // everything BELOW the join (scans + filters) must be exchange-free:
      // bucket pruning replaced the shuffle. The aggregate above it may
      // (and does) exchange on the group key.
      val below = p.substring(joinIdx)
      assert(!below.contains("Exchange"),
        s"no shuffle below the co-located join:\n$below")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tri-index deltas: broadcast centroids, map-side partials, no raw cartesian") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pg-tri").toString
    def corpus(rows: Seq[(Long, Long)]) = rows
      .map { case (k, v) => (k, s"w${v % 7} w${v % 5} w${v % 3} tail$v",
        Array.tabulate(4)(i => (v >> i).toFloat % 3), v) }
      .toDF("k", "text", "embedding", "seq")
    graft.sources.ManagedTable.merge(
      corpus(Seq(1L -> 1L, 2L -> 2L, 3L -> 3L)), dir,
      Seq("k"), Seq(col("seq")))
    graft.sources.ManagedTable.merge(
      corpus(Seq(2L -> 12L, 4L -> 14L)), dir, Seq("k"), Seq(col("seq")))
    val spec = graft.operators.IndexMaintenance.CorpusSpec(
      "k", "text", "embedding",
      Seq((0L, Array(1f, 0f, 1f, 0f)), (1L, Array(0f, 1f, 0f, 1f)))
        .toDF("cid", "cv"),
      lit(false), Seq("seq"))
    val cdf = graft.sources.ManagedTable
      .changes(spark, dir, 1, 2, Seq("k"), lit(false), Seq("seq"))
    val p = graft.operators.IndexMaintenance.deltas(cdf, spec)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the dense family's centroid join must broadcast the (tiny)
    // centroid side — the changeset side never shuffles for it
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"centroids must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"),
      "no non-broadcast cartesian anywhere in the delta pass")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "family stats must partial-aggregate map-side — at 100 TB the " +
        "(cell/term/md5) aggs shuffle combiner output, not rows")
  }

  test("q198 retrieval serves from the chunk index: no corpus re-chunk in the plan") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pg-ragidx").toString + "/chunks"
    graft.sources.ManagedTable.commit(
      graft.operators.Chunker.chunk(docs, "doc_id", "text", 64, 16), idx)
    val p = graft.queries.VectorQueries.contextPackFrom(spark,
        sf("sf0.001"), graft.sources.ManagedTable.read(spark, idx))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the serving plan must read CHUNK ROWS from the maintained index —
    // Chunker.chunk's posexplode(sequence(...)) generate is the corpus
    // re-chunk signature and must be absent (the stream already paid it)
    assert(!p.contains("posexplode(sequence"),
      s"retrieval re-chunks the corpus instead of reading the index:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"),
      "both retrieval top-10s stay bounded-heap takes")
    assert(p.contains("BroadcastHashJoin"),
      "centroid/query components and probes stay broadcast")
  }
}
