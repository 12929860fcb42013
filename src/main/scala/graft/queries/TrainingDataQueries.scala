package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions.{hash60, tokens}

/** Training-data pipeline operators beyond dedup/similarity: cardinality
  * sketching, context-window sequence packing, deterministic dataset
  * splits, and embedding quantization. All deterministic by construction
  * (integer/decimal math, md5-derived hashes, floor-scaled ratios) so
  * every query is hash-checked against DuckDB.
  */
object TrainingDataQueries {

  private val HllBuckets = 64 // 6-bit stochastic averaging
  private val PackCapacity = 512L // tokens per packed context window
  private val Q = 127.0 // int8 symmetric quantization range

  /** q37: distributed cardinality sketch — an HLL-shaped estimator built
    * from two hash aggregations, both with map-side partial aggregation:
    *   register(b) = max over keys in bucket b of (#leading zeros of the
    *   54-bit hash remainder + 1); estimate = α·m²/Σ2^(−reg).
    * Unlike approx_count_distinct (whose HLL++ internals an external
    * oracle cannot replay), every step here is md5-derived and
    * bit-reproducible in SQL — the 2^(−reg) sum is integer-scaled by
    * 2^55 so it is EXACT and order-independent across partitions.
    * At 100 TB: shuffle carries ≤ |groups|×64 register rows.
    *
    * This is the RAW estimator: accurate once registers are populated
    * (sf0.01: 151 est vs 150 exact, 0.7% — pinned in QueriesSmokeSpec)
    * but biased high when n ≪ buckets. Production HLL adds linear
    * counting (m·ln(m/V)) below 2.5m — deliberately omitted here
    * because cross-engine `ln` is not guaranteed bit-identical, which
    * would break the hash oracle; the sketch's target regime is large n.
    */
  val q37ApproxDistinct = NamedQuery(
    "q37_approx_distinct",
    "Deterministic HLL-lite distinct-user sketch per event_type (64 " +
      "buckets, exact integer-scaled register sum) next to the exact " +
      "COUNT(DISTINCT) it approximates.",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          col("user_id"),
          hash60(col("user_id").cast("string")).as("h"))
      val regs = ev
        .select(col("event_type"), (col("h") % HllBuckets).as("bucket"),
          shiftright(col("h"), 6).as("rem"))
        .withColumn("reg",
          when(col("rem") === 0, lit(55))
            .otherwise(lit(55) - length(bin(col("rem")))))
        .groupBy("event_type", "bucket").agg(max("reg").as("reg"))
      // every (event_type, bucket) slot: empty registers count as 0
      val slots = ev.select("event_type").distinct()
        .select(col("event_type"),
          explode(sequence(lit(0), lit(HllBuckets - 1))).as("bucket"))
      val est = slots.join(regs, Seq("event_type", "bucket"), "left_outer")
        .withColumn("reg", coalesce(col("reg"), lit(0)))
        // 2^55 / 2^reg is an exact long; the sum is exact integer math
        .withColumn("w", expr("CAST(pow(2.0, 55 - reg) AS BIGINT)"))
        .groupBy("event_type")
        .agg(floor(lit(0.709) * lit(HllBuckets) * lit(HllBuckets) *
            pow(lit(2.0), lit(55)) / sum(col("w")).cast("double"))
          .cast("long").as("hll_est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(est, Seq("event_type")).orderBy("event_type")
    },
    Some(s"""WITH ev AS (SELECT event_type, user_id,
            |    ('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
            |  FROM events),
            |regs AS (SELECT event_type, h % $HllBuckets AS bucket,
            |    MAX(CASE WHEN (h >> 6) = 0 THEN 55
            |        ELSE 55 - length(bin(h >> 6)) END) AS reg
            |  FROM ev GROUP BY event_type, h % $HllBuckets),
            |slots AS (SELECT event_type, js.bucket
            |  FROM (SELECT DISTINCT event_type FROM ev),
            |    (SELECT unnest(range(0, $HllBuckets)) AS bucket) js),
            |est AS (SELECT event_type,
            |    CAST(floor(0.709::DOUBLE * $HllBuckets * $HllBuckets * pow(2.0, 55)
            |      / CAST(SUM(CAST(pow(2.0, 55 - reg) AS BIGINT)) AS DOUBLE)) AS BIGINT) AS hll_est
            |  FROM (SELECT s.event_type, COALESCE(r.reg, 0) AS reg
            |    FROM slots s LEFT JOIN regs r
            |    ON s.event_type = r.event_type AND s.bucket = r.bucket)
            |  GROUP BY event_type),
            |exact AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
            |  FROM ev GROUP BY event_type)
            |SELECT exact.event_type, n_exact, hll_est
            |FROM exact JOIN est ON exact.event_type = est.event_type
            |ORDER BY exact.event_type""".stripMargin))

  /** q38: sequence packing — greedy fixed-capacity packing of documents
    * into context windows by cumulative token count, computed with ONE
    * window function per language partition: pack_id =
    * floor((cumsum(tokens) − tokens) / capacity) (start-offset binning —
    * a doc opens a new pack when its predecessor crossed the boundary).
    * At scale the sort is range-partitioned per language; no driver
    * loop, no per-doc state.
    */
  val q38SequencePacking = NamedQuery(
    "q38_sequence_packing",
    s"Pack documents into $PackCapacity-token context windows per " +
      "language (deterministic doc_id order): window cumulative sum → " +
      "pack id → per-pack doc count and token total.",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
      toks
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tokens")) / lit(PackCapacity.toDouble))
            .cast("long"))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
        .orderBy("lang", "pack_id")
    },
    Some(s"""WITH toks AS (SELECT lang, doc_id,
            |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
            |  FROM documents),
            |packed AS (SELECT lang, doc_id, n_tokens,
            |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
            |  FROM toks)
            |SELECT lang, CAST(floor((cum - n_tokens) / ${PackCapacity}.0) AS BIGINT) AS pack_id,
            |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
            |FROM packed GROUP BY lang, pack_id
            |ORDER BY lang, pack_id""".stripMargin))

  /** q39: deterministic stratified train/val/test split — the standard
    * hash-mod split (no RNG, stable under reprocessing and joinable from
    * any engine), with per-split corpus accounting. Row-local hash →
    * one aggregation; embarrassingly parallel.
    */
  val q39DatasetSplit = NamedQuery(
    "q39_dataset_split",
    "80/10/10 hash-mod split of the documents corpus with per-split " +
      "doc/token/char accounting.",
    (s, d) => {
      val h = hash60(col("doc_id").cast("string")) % 100
      Tables.documents(s, d)
        .select(
          when(h < 80, "train").when(h < 90, "val").otherwise("test")
            .as("split"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          col("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split")
    },
    Some("""SELECT CASE WHEN hm < 80 THEN 'train' WHEN hm < 90 THEN 'val'
           |    ELSE 'test' END AS split,
           |  COUNT(*) AS n_docs,
           |  CAST(SUM(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
           |FROM (SELECT *,
           |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 AS hm
           |  FROM documents)
           |GROUP BY 1 ORDER BY split""".stripMargin))

  /** q40: int8 symmetric embedding quantization — per-vector scale =
    * max|x|, q = clamp(floor(x·127/scale)) — entirely row-local (zero
    * shuffle), with the reconstruction L1 error as a floor-scaled long.
    * The storage shape production vector stores use (4× smaller than
    * float32); dequantization is q·scale/127.
    *
    * The quantized vector is emitted as a comma-joined STRING, not an
    * array: the driver's compare harness sorts result rows with pandas,
    * which cannot order array cells (r2 failure). The string is a
    * lossless rendering of every int8 element, so the oracle check is
    * still bit-exact over the full vector.
    */
  val q40QuantizeEmbeddings = NamedQuery(
    "q40_quantize_embeddings",
    "Int8 symmetric quantization of the embedding column: per-vector " +
      "scale, quantized int array, checksum, and L1 reconstruction error.",
    (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("maxabs",
          array_max(transform(col("embedding"), x => abs(x.cast("double")))))
        .withColumn("qvec",
          transform(col("embedding"), x =>
            greatest(lit(-127), least(lit(127),
              floor(x.cast("double") * lit(Q) / col("maxabs")))).cast("int")))
        .select(
          col("vec_id"),
          floor(col("maxabs") * lit(1000000.0)).cast("long").as("scale_fp"),
          concat_ws(",", col("qvec")).as("qvec_str"),
          aggregate(col("qvec"), lit(0L), (a, v) => a + v.cast("long"))
            .as("q_sum"),
          floor(aggregate(
              zip_with(col("embedding"), col("qvec"), (x, q) =>
                abs(x.cast("double") - q.cast("double") * col("maxabs") / lit(Q))),
              lit(0.0), (a, v) => a + v) * lit(1000000.0))
            .cast("long").as("recon_err_fp"))
        .orderBy("vec_id"),
    Some(s"""WITH base AS (SELECT vec_id, embedding,
            |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
            |  FROM embeddings),
            |qq AS (SELECT vec_id, embedding, maxabs,
            |    list_transform(embedding, x -> CAST(GREATEST(-127, LEAST(127,
            |      floor(CAST(x AS DOUBLE) * $Q / maxabs))) AS INTEGER)) AS qvec
            |  FROM base)
            |SELECT vec_id,
            |  CAST(floor(maxabs * 1000000.0) AS BIGINT) AS scale_fp,
            |  array_to_string(qvec, ',') AS qvec_str,
            |  CAST(list_sum(qvec) AS BIGINT) AS q_sum,
            |  CAST(floor(list_sum(list_transform(list_zip(embedding, qvec),
            |    p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * maxabs / $Q)))
            |    * 1000000.0) AS BIGINT) AS recon_err_fp
            |FROM qq ORDER BY vec_id""".stripMargin))

  /** q43: train/test contamination detection — the eval-integrity check
    * every training-data pipeline needs: after the deterministic q39
    * split, count documents in each non-train split whose near-dup
    * FINGERPRINT (min word-3-gram hash, q18's kernel) collides with any
    * training document. One fingerprint per doc (row-local native
    * MinHash60), one equi-join on the fingerprint — no all-pairs text
    * comparison, so the check costs two scans + a hash join at any
    * corpus size.
    */
  /** CTE `fp(split, doc_id, fp)`: the q39 hash-mod split plus each doc's
    * MinHash fingerprint ([[graft.functions.TextFunctions.fingerprint]]) —
    * shared by q43 (exact contamination) and q58 (bloom prefilter).
    */
  private def fpSplitCte: String =
    """fp AS (SELECT
      |    CASE WHEN hm < 80 THEN 'train' WHEN hm < 90 THEN 'val'
      |      ELSE 'test' END AS split,
      |    doc_id,
      |    COALESCE(mg, ('0x'||substring(md5(lower(text)),1,15))::BIGINT) AS fp
      |  FROM (SELECT d.*, m.mg,
      |      ('0x'||substring(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 100 AS hm
      |    FROM documents d LEFT JOIN (
      |      SELECT doc_id, min(('0x'||substring(md5(g),1,15))::BIGINT) AS mg
      |      FROM (SELECT DISTINCT doc_id, g FROM
      |        (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
      |        unnest(list_transform(range(1, len(ts)-1),
      |          i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) AS t(g)
      |        WHERE len(ts) >= 3)
      |      GROUP BY doc_id) m ON d.doc_id = m.doc_id))""".stripMargin

  val q43Contamination = NamedQuery(
    "q43_split_contamination",
    "Fingerprint-collision contamination of val/test against train " +
      "after the q39 hash-mod split: contaminated doc counts per split.",
    (s, d) => {
      val h = hash60(col("doc_id").cast("string")) % 100
      // cached: three branches (train set, contamination probe, totals)
      // otherwise re-run the fingerprint scan each (round-4 plan audit)
      val fp = Tables.documents(s, d).select(
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"),
        col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .cache()
      val trainFps = fp.filter(col("split") === "train")
        .select(col("fp")).distinct()
      val holdout = fp.filter(col("split") =!= "train")
      holdout
        .join(trainFps, Seq("fp"), "left_semi")
        .groupBy("split").agg(count(lit(1)).as("n_contaminated"))
        .join(holdout.groupBy("split").agg(count(lit(1)).as("n_docs")),
          Seq("split"), "right_outer")
        .select(col("split"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          col("n_docs"))
        .orderBy("split")
    },
    Some(s"""WITH $fpSplitCte,
           |train_fp AS (SELECT DISTINCT fp FROM fp WHERE split = 'train'),
           |holdout AS (SELECT * FROM fp WHERE split <> 'train'),
           |cont AS (SELECT split, COUNT(*) AS n_contaminated FROM holdout
           |  WHERE fp IN (SELECT fp FROM train_fp) GROUP BY split),
           |tot AS (SELECT split, COUNT(*) AS n_docs FROM holdout GROUP BY split)
           |SELECT tot.split, COALESCE(n_contaminated, 0) AS n_contaminated, n_docs
           |FROM tot LEFT JOIN cont ON tot.split = cont.split
           |ORDER BY tot.split""".stripMargin))

  /** q52: per-language vocabulary head — the corpus-analysis staple
    * (stopword candidates, tokenizer QA): token frequencies then top-10
    * per language. Two hash aggregations (map-side combined) plus a
    * per-group top-k that Spark plans as WindowGroupLimit (rank pushed
    * below the full window sort), so no group ever sorts its whole
    * vocabulary.
    */
  val q52VocabTopK = NamedQuery(
    "q52_vocab_topk",
    "Top-10 tokens per language by frequency (ties broken by token), " +
      "with counts — WindowGroupLimit per-group top-k.",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("tok").asc)
      Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .orderBy("lang", "rank")
    },
    Some("""SELECT lang, tok, n, rank FROM (
           |  SELECT lang, tok, n, CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY n DESC, tok ASC) AS BIGINT) AS rank
           |  FROM (SELECT lang, u AS tok, COUNT(*) AS n
           |    FROM (SELECT lang, string_split(lower(text), ' ') AS ts FROM documents),
           |      unnest(ts) AS t(u)
           |    GROUP BY lang, u))
           |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin))

  /** q55: deterministic balanced per-language sampling — downsample every
    * stratum to the size of the smallest one with a hash-mod threshold
    * (no RNG: reprocessing-stable, joinable from any engine, same as the
    * q39 split discipline). rate_fp = floor(1e6·min_count/count): a doc
    * is kept iff hash60(doc_id) mod 1e6 < rate_fp. One aggregation for
    * the stratum sizes (broadcast back — the rate table is |strata|
    * rows), one row-local filter: no extra shuffle of the corpus.
    */
  val q55StratifiedSample = NamedQuery(
    "q55_stratified_sample",
    "Balanced per-language sample via hash-mod thresholding at " +
      "rate = min(stratum)/stratum: totals, fixed-point rates, and " +
      "sampled counts per language.",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"),
          (hash60(col("doc_id").cast("string")) % 1000000L).as("hm"))
      val tot = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
      val mn = tot.agg(min(col("n_total")).as("min_total"))
      val rates = tot.crossJoin(broadcast(mn))
        .select(col("lang"), col("n_total"),
          floor(col("min_total") * lit(1000000.0) / col("n_total"))
            .cast("long").as("rate_fp"))
      val sampled = docs
        .join(broadcast(rates.select("lang", "rate_fp")), "lang")
        .filter(col("hm") < col("rate_fp"))
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, Seq("lang"), "left_outer")
        .select(col("lang"), col("n_total"), col("rate_fp"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("lang")
    },
    Some("""WITH d AS (SELECT lang,
           |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 1000000 AS hm
           |  FROM documents),
           |tot AS (SELECT lang, COUNT(*) AS n_total FROM d GROUP BY lang),
           |mn AS (SELECT MIN(n_total) AS min_total FROM tot),
           |rates AS (SELECT lang, n_total,
           |    CAST(floor(min_total*1000000.0/n_total) AS BIGINT) AS rate_fp
           |  FROM tot, mn),
           |sampled AS (SELECT d.lang, COUNT(*) AS n_sampled
           |  FROM d JOIN rates r ON d.lang = r.lang
           |  WHERE d.hm < r.rate_fp GROUP BY d.lang)
           |SELECT r.lang, n_total, rate_fp, COALESCE(n_sampled, 0) AS n_sampled
           |FROM rates r LEFT JOIN sampled s ON r.lang = s.lang
           |ORDER BY r.lang""".stripMargin))

  private val BloomK = 4
  private val BloomWords = 256 // 15360 bits

  /** q58: the q43 contamination check behind a distributed Bloom
    * prefilter ([[graft.operators.BloomFilter]]): build the digest over
    * train fingerprints, probe every holdout doc, and report bloom hits
    * next to exact hits — n_false_pos is the price of never shuffling
    * the train set at probe time (the digest is a broadcast `words`-row
    * table), and no-false-negatives means n_bloom_hits ≥ n_exact_hits
    * always. Every bit is md5-derived, so the DuckDB oracle rebuilds the
    * identical filter.
    */
  val q58BloomContamination = NamedQuery(
    "q58_bloom_contamination",
    "Bloom-prefiltered split contamination: per holdout split, doc " +
      "count, bloom-filter hits (k=4, 15360 bits over train " +
      "fingerprints), exact fingerprint hits, and false positives.",
    (s, d) => {
      val h = hash60(col("doc_id").cast("string")) % 100
      // cached: the tokenize+3-gram+minhash fingerprint stage feeds five
      // consumers (bloom build, probe explode + re-join, both sides of
      // the exact join) — TextDedup's caching contract; Verify/Bench
      // clear the session cache between queries
      val fp = Tables.documents(s, d).select(
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"),
        col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .cache()
      val train = fp.filter(col("split") === "train").select("fp").distinct()
      val bloom = graft.operators.BloomFilter.build(train, "fp", BloomK, BloomWords)
      val holdout = fp.filter(col("split") =!= "train")
      val probed = graft.operators.BloomFilter.probe(
        holdout, "fp", Seq("split", "doc_id"), bloom, BloomK, BloomWords)
      val exact = holdout.join(train, Seq("fp"), "left_semi")
        .groupBy("split").agg(count(lit(1)).as("n_exact_hits"))
      probed.groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("bloom_hit").as("n_bloom_hits"))
        .join(exact, Seq("split"), "left_outer")
        .select(col("split"), col("n_docs"), col("n_bloom_hits"),
          coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"),
          (col("n_bloom_hits") - coalesce(col("n_exact_hits"), lit(0L)))
            .as("n_false_pos"))
        .orderBy("split")
    },
    Some {
      val m = BloomWords * 60
      def posList(key: String) =
        s"""list_transform(range(0, $BloomK), j ->
           |  ('0x'||substring(md5(j||':'||CAST($key AS VARCHAR)),1,15))::BIGINT % $m)""".stripMargin
      s"""WITH $fpSplitCte,
         |train AS (SELECT DISTINCT fp FROM fp WHERE split = 'train'),
         |bloom AS (SELECT pos // 60 AS word,
         |    bit_or(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS bits
         |  FROM (SELECT unnest(${posList("fp")}) AS pos FROM train)
         |  GROUP BY pos // 60),
         |holdout AS (SELECT split, doc_id, fp FROM fp WHERE split <> 'train'),
         |hpos AS (SELECT split, doc_id, u AS pos FROM
         |  (SELECT split, doc_id, ${posList("fp")} AS pl FROM holdout),
         |  unnest(pl) AS t(u)),
         |hbits AS (SELECT split, doc_id,
         |    CASE WHEN b.bits IS NOT NULL
         |      AND (b.bits & (1::BIGINT << CAST(h.pos % 60 AS INTEGER))) <> 0
         |    THEN 1 ELSE 0 END AS s
         |  FROM hpos h LEFT JOIN bloom b ON h.pos // 60 = b.word),
         |hits AS (SELECT split, doc_id,
         |    CASE WHEN SUM(s) = $BloomK THEN 1 ELSE 0 END AS bloom_hit
         |  FROM hbits GROUP BY split, doc_id),
         |exact AS (SELECT split, COUNT(*) AS n_exact_hits FROM holdout
         |  WHERE fp IN (SELECT fp FROM train) GROUP BY split),
         |agg AS (SELECT split, COUNT(*) AS n_docs,
         |    CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_hits
         |  FROM hits GROUP BY split)
         |SELECT a.split, n_docs, n_bloom_hits,
         |  COALESCE(n_exact_hits, 0) AS n_exact_hits,
         |  n_bloom_hits - COALESCE(n_exact_hits, 0) AS n_false_pos
         |FROM agg a LEFT JOIN exact e ON a.split = e.split
         |ORDER BY a.split""".stripMargin
    })

  private val ChunkSize = 32
  private val Stride = 16

  /** q62: overlapping token-window chunking (size 32, stride 16) — the
    * retrieval/context-window prep step that turns documents into
    * fixed-size overlapping pieces. Entirely row-local (one
    * `transform(sequence)` + `posexplode` per doc, no shuffle until the
    * output sort); chunk identity is a hash60 of the joined tokens so
    * chunk-level dedup can run downstream with the same machinery as
    * doc-level (q12).
    */
  val q62DocChunking = NamedQuery(
    "q62_doc_chunking",
    s"Chunk documents 0-19 into $ChunkSize-token windows at stride " +
      s"$Stride: per chunk, token count and content hash.",
    (s, d) => {
      val ts = tokens(col("text"))
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), ts.as("ts"))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), size(col("ts")) - 1, lit(Stride)),
            s0 => slice(col("ts"), s0 + 1, lit(ChunkSize))))
            .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("chunk")).cast("long").as("n_tokens"),
          hash60(concat_ws(" ", col("chunk"))).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS ts
            |  FROM documents WHERE doc_id < 20),
            |ch AS (SELECT doc_id, s0 // $Stride AS chunk_idx,
            |    ts[s0+1 : s0+$ChunkSize] AS chunk
            |  FROM (SELECT doc_id, ts, u AS s0 FROM t,
            |    unnest(range(0, len(ts), $Stride)) AS r(u)))
            |SELECT doc_id, chunk_idx,
            |  CAST(len(chunk) AS BIGINT) AS n_tokens,
            |  ('0x'||substring(md5(array_to_string(chunk, ' ')),1,15))::BIGINT AS chunk_hash
            |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin))

  private val KmvK = 32

  /** q64: KMV (k-minimum-values) bottom-k sketch per event_type — the
    * other classic distinct estimator next to q37's HLL-lite, and the
    * one that doubles as a DETERMINISTIC uniform sample (the k kept
    * hashes are a reprocessing-stable random subset of the keys).
    * est = (k−1)·2⁶⁰ / h_k where h_k is the k-th smallest distinct
    * hash; when a group has fewer than k distinct keys the sketch is
    * exhaustive and exact. The (k−1)·2⁶⁰ product overflows a long, so
    * it runs as decimal(38,0) with the exact integral `div` — no
    * float rounding for the oracle hash to trip on.
    * Scale shape: distinct is one hash-agg shuffle; bottom-k per group
    * is WindowGroupLimit (rank pushdown keeps only k rows per group
    * per partition before the sort); the sketch output is |groups|·k
    * rows however large the input.
    */
  val q64KmvDistinct = NamedQuery(
    "q64_kmv_distinct",
    s"KMV bottom-$KmvK distinct-user sketch per event_type: k-th " +
      "smallest hash, exact-integral estimate, vs the exact count.",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("h").asc)
      // dh fans out to the bottom-k branch AND the exact count —
      // materialize the (small, post-distinct) hash set once instead of
      // re-running the scan+distinct lineage per branch
      val dh = Tables.events(s, d)
        .select(col("event_type"),
          hash60(col("user_id").cast("string")).as("h"))
        .distinct()
        .cache()
      val topk = dh.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= KmvK)
        .groupBy("event_type")
        .agg(max("h").as("h_k"), count(lit(1)).as("k"))
      val exact = dh.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      topk.join(exact, Seq("event_type"))
        .withColumn("est", when(col("k") < KmvK, col("k")).otherwise(
          expr(s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * " +
            "CAST(1152921504606846976 AS DECIMAL(38,0))) div " +
            "CAST(h_k AS DECIMAL(38,0)) AS BIGINT)")))
        .select(col("event_type"), col("k"), col("h_k"), col("n_exact"),
          col("est"))
        .orderBy("event_type")
    },
    Some(s"""WITH dh AS (SELECT DISTINCT event_type,
            |    ('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
            |  FROM events),
            |r AS (SELECT event_type, h,
            |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            |  FROM dh),
            |t AS (SELECT event_type, MAX(h) AS h_k,
            |    CAST(COUNT(*) AS BIGINT) AS k
            |  FROM r WHERE rn <= $KmvK GROUP BY event_type),
            |e AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
            |  FROM dh GROUP BY event_type)
            |SELECT t.event_type, k, h_k, n_exact,
            |  CAST(CASE WHEN k < $KmvK THEN k
            |    ELSE (CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976) // h_k
            |    END AS BIGINT) AS est
            |FROM t JOIN e USING (event_type) ORDER BY event_type""".stripMargin))

  /** q92: the SAME KMV sketch as q64, but computed by the custom
    * [[graft.functions.NativeAggregates.KmvSketchAgg]]
    * `TypedImperativeAggregate` in ONE pass over the raw events — no
    * pre-distinct, no window sort. q64's shape shuffles every distinct
    * hash and sorts it per group (WindowGroupLimit prunes to k per
    * partition, but the distinct itself is a full-width exchange); the
    * aggregate form ships ≤ k longs per (group × partition) and merges
    * sketches associatively — at 100 TB the exchange carries
    * |groups|·k·8 bytes total. The estimate math is identical to q64
    * (exact-integral (k−1)·2^60 div h_k in decimal(38,0)), and the
    * oracle is q64's minus the n_exact column, so the two queries
    * cross-check each other row-for-row.
    */
  val q92KmvSketchAgg = NamedQuery(
    "q92_kmv_sketch_agg",
    s"KMV bottom-$KmvK sketch per event_type via a custom " +
      "TypedImperativeAggregate: one partial-aggregable pass, no " +
      "distinct, no window sort; estimates match q64 exactly.",
    (s, d) => {
      import graft.functions.NativeAggregates.kmvSketch
      Tables.events(s, d)
        .select(col("event_type"),
          hash60(col("user_id").cast("string")).as("h"))
        .groupBy("event_type")
        .agg(kmvSketch(col("h"), KmvK).as("sk"))
        .select(col("event_type"),
          size(col("sk")).cast("long").as("k"),
          element_at(col("sk"), -1).as("h_k"))
        .withColumn("est", when(col("k") < KmvK, col("k")).otherwise(
          expr(s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * " +
            "CAST(1152921504606846976 AS DECIMAL(38,0))) div " +
            "CAST(h_k AS DECIMAL(38,0)) AS BIGINT)")))
        .orderBy("event_type")
    },
    Some(s"""WITH dh AS (SELECT DISTINCT event_type,
            |    ('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
            |  FROM events),
            |r AS (SELECT event_type, h,
            |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            |  FROM dh),
            |t AS (SELECT event_type, MAX(h) AS h_k,
            |    CAST(COUNT(*) AS BIGINT) AS k
            |  FROM r WHERE rn <= $KmvK GROUP BY event_type)
            |SELECT event_type, k, h_k,
            |  CAST(CASE WHEN k < $KmvK THEN k
            |    ELSE (CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976) // h_k
            |    END AS BIGINT) AS est
            |FROM t ORDER BY event_type""".stripMargin))

  /** q98: KMV sketch ALGEBRA — estimating the overlap of two key sets
    * from their bottom-k sketches alone, never revisiting the raw data:
    * the 100 TB pattern where per-partition/per-day sketches are tiny
    * mergeable summaries and cross-set questions (shared users between
    * event types here; shared n-grams between corpora in a dedup
    * planner) are answered in sketch space.
    *   - union sketch = bottom-k of the merged hash sets (array_union +
    *     sort + slice — pure array math on two k-arrays);
    *   - est_union   = the q64/q92 estimator on the union sketch;
    *   - est_inter   = est_union · |{x ∈ union sketch: x ∈ A ∧ x ∈ B}|
    *     div k_u (the fraction of the union sample present in both — the
    *     standard KMV Jaccard estimator), all exact-integral;
    *   - n_exact     = the true distinct-user intersection, computed
    *     next to it so the estimation error is visible and hash-checked.
    * Sketches come from the q92 `TypedImperativeAggregate`; everything
    * after the (tiny) |types|² pair join is row-local array math.
    */
  val q98KmvOverlap = NamedQuery(
    "q98_kmv_overlap",
    s"KMV set algebra: pairwise distinct-user overlap between event " +
      s"types estimated from bottom-$KmvK sketches (union + Jaccard " +
      "estimators, exact-integral), vs the true intersection.",
    (s, d) => {
      import graft.functions.NativeAggregates.kmvSketch
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          hash60(col("user_id").cast("string")).as("h"))
      val sk = ev.groupBy("event_type")
        .agg(kmvSketch(col("h"), KmvK).as("sk"))
      val a = sk.select(col("event_type").as("et_a"), col("sk").as("sk_a"))
      val b = sk.select(col("event_type").as("et_b"), col("sk").as("sk_b"))
      val du = ev.distinct()
      val exact = du.as("x").join(du.as("y"),
          col("x.h") === col("y.h") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("et_a"),
          col("y.event_type").as("et_b"))
        .agg(count(lit(1)).as("n_exact"))
      a.join(b, col("et_a") < col("et_b"))
        .withColumn("usk",
          slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, KmvK))
        .withColumn("k_u", size(col("usk")).cast("long"))
        .withColumn("h_k", element_at(col("usk"), -1))
        .withColumn("n_both",
          size(filter(col("usk"), x =>
            array_contains(col("sk_a"), x) && array_contains(col("sk_b"), x)))
            .cast("long"))
        .withColumn("est_union", when(col("k_u") < KmvK, col("k_u")).otherwise(
          expr(s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * " +
            "CAST(1152921504606846976 AS DECIMAL(38,0))) div " +
            "CAST(h_k AS DECIMAL(38,0)) AS BIGINT)")))
        .withColumn("est_inter",
          expr("CAST((n_both * est_union) div k_u AS BIGINT)"))
        .join(exact, Seq("et_a", "et_b"), "left_outer")
        .select(col("et_a"), col("et_b"), col("k_u"), col("n_both"),
          col("est_union"), col("est_inter"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
        .orderBy("et_a", "et_b")
    },
    Some(s"""WITH dh AS (SELECT DISTINCT event_type,
            |    ('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
            |  FROM events),
            |r AS (SELECT event_type, h,
            |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            |  FROM dh),
            |sk AS (SELECT event_type, list_sort(list(h)) AS sk
            |  FROM r WHERE rn <= $KmvK GROUP BY event_type),
            |ex AS (SELECT x.event_type AS et_a, y.event_type AS et_b,
            |    CAST(COUNT(*) AS BIGINT) AS n_exact
            |  FROM dh x JOIN dh y ON x.h = y.h AND x.event_type < y.event_type
            |  GROUP BY 1, 2),
            |pairs AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
            |    a.sk AS sk_a, b.sk AS sk_b,
            |    list_sort(list_distinct(a.sk || b.sk))[1 : $KmvK] AS usk
            |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
            |m AS (SELECT et_a, et_b,
            |    CAST(len(usk) AS BIGINT) AS k_u,
            |    usk[-1] AS h_k,
            |    CAST(len(list_filter(usk, x -> list_contains(sk_a, x)
            |      AND list_contains(sk_b, x))) AS BIGINT) AS n_both
            |  FROM pairs)
            |SELECT m.et_a, m.et_b, k_u, n_both,
            |  CAST(CASE WHEN k_u < $KmvK THEN k_u
            |    ELSE (CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976) // h_k
            |    END AS BIGINT) AS est_union,
            |  CAST((n_both * (CASE WHEN k_u < $KmvK THEN k_u
            |    ELSE (CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976) // h_k
            |    END)) // k_u AS BIGINT) AS est_inter,
            |  COALESCE(ex.n_exact, 0) AS n_exact
            |FROM m LEFT JOIN ex ON m.et_a = ex.et_a AND m.et_b = ex.et_b
            |ORDER BY m.et_a, m.et_b""".stripMargin))

  private val CmsDepth = 4
  private val CmsWidth = 512L

  /** q65: Count-Min-sketch heavy hitters — the fixed-memory frequency
    * estimator every streaming/vocab pipeline uses when the exact
    * token histogram (q52) no longer fits. The sketch is d×w counters
    * (4×512 here) built with ONE hash-agg over (row, bucket) pairs —
    * map-side partial agg collapses each partition to ≤ d·w rows, so
    * the shuffle carries a fixed 2048-row table no matter the corpus
    * size. Estimates (min over the d buckets a token hashes into) are
    * computed for the exact top-20 tokens next to their true counts,
    * so the one-sided error (est ≥ exact, inflated by collisions) is
    * visible and hash-checked. Every hash is md5-derived (`hash60`),
    * so DuckDB replays the identical sketch — no RNG, no seed drift.
    */
  val q65CmsHeavyHitters = NamedQuery(
    "q65_cms_heavy_hitters",
    s"Count-Min sketch ($CmsDepth×$CmsWidth, md5-derived buckets) " +
      "frequency estimates for the exact top-20 tokens, est ≥ exact " +
      "by construction.",
    (s, d) => {
      def buckets(tok: org.apache.spark.sql.Column) = explode(array(
        (0 until CmsDepth).map(j => struct(
          lit(j.toLong).as("j"),
          (hash60(concat(lit(j.toString), lit(":"), tok)) % CmsWidth)
            .as("b"))): _*))
      // one occurrence-level aggregation to the vocab histogram; the
      // sketch is then built from PER-TOKEN counts (Σ counts per bucket
      // ≡ per-occurrence bucket counts, at 4·|vocab| exploded rows
      // instead of 4·|occurrences| — the second explode-the-corpus pass
      // this query originally paid)
      // vocab fans out to the sketch build AND the exact top-k —
      // materialize the (vocab-sized) histogram once so the corpus
      // tokenize+explode+agg lineage runs a single time
      val vocab = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .cache()
      val cms = vocab.select(buckets(col("tok")).as("p"), col("n_exact"))
        .groupBy(col("p.j").as("j"), col("p.b").as("b"))
        .agg(sum("n_exact").as("n_bucket"))
      val top = vocab.orderBy(col("n_exact").desc, col("tok").asc).limit(20)
      top.select(col("tok"), col("n_exact"), buckets(col("tok")).as("p"))
        .select(col("tok"), col("n_exact"), col("p.j").as("j"),
          col("p.b").as("b"))
        .join(broadcast(cms), Seq("j", "b"))
        .groupBy("tok", "n_exact").agg(min("n_bucket").as("n_cms"))
        .orderBy(col("n_exact").desc, col("tok").asc)
    },
    Some(s"""WITH toks AS (SELECT u AS tok
            |  FROM (SELECT string_split(lower(text),' ') AS ts FROM documents),
            |    unnest(ts) AS t(u)),
            |js AS (SELECT unnest(range($CmsDepth)) AS j),
            |pairs AS (SELECT tok, j,
            |    ('0x'||substring(md5(CAST(j AS VARCHAR)||':'||tok),1,15))::BIGINT
            |      % $CmsWidth AS b
            |  FROM toks, js),
            |cms AS (SELECT j, b, COUNT(*) AS n_bucket FROM pairs GROUP BY j, b),
            |ex AS (SELECT tok, COUNT(*) AS n_exact FROM toks GROUP BY tok
            |  ORDER BY n_exact DESC, tok LIMIT 20),
            |ep AS (SELECT tok, n_exact, j,
            |    ('0x'||substring(md5(CAST(j AS VARCHAR)||':'||tok),1,15))::BIGINT
            |      % $CmsWidth AS b
            |  FROM ex, js)
            |SELECT ep.tok, ep.n_exact, MIN(cms.n_bucket) AS n_cms
            |FROM ep JOIN cms USING (j, b)
            |GROUP BY ep.tok, ep.n_exact
            |ORDER BY n_exact DESC, tok""".stripMargin))

  /** Target training-mixture weights per language (percent, sums to
    * 100). Literal — in production this is the experiment config.
    */
  private val MixWeights: Seq[(String, Long)] = Seq(
    "de" -> 15L, "en" -> 40L, "es" -> 15L, "fr" -> 15L, "zh" -> 15L)

  /** q87: weighted corpus-mixture sampling — the "data recipe" step of
    * training-set assembly: given target per-language weights, find the
    * LARGEST total size the corpus can serve at exactly those weights
    * (the binding stratum: S = min over l of ⌊n_l·100/w_l⌋), derive each
    * language's quota, and draw it with the q39/q55 hash-mod-threshold
    * discipline (deterministic, reprocessing-stable, no RNG). All
    * arithmetic is integer `div` — no float rate whose rounding could
    * admit a different doc set across engines. Scale shape: one keyed
    * count agg, a 5-row quota table broadcast back, one row-local
    * filter — the corpus shuffles zero times.
    */
  val q87CorpusMixture = NamedQuery(
    "q87_corpus_mixture",
    "Weighted training-mixture sampling: feasible total from the " +
      "binding stratum, integer quotas + hash-mod thresholds per " +
      "language, sampled counts and achieved shares.",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("lang"),
        (hash60(col("doc_id").cast("string")) % 1000000L).as("hm"))
      val wdf = s.createDataFrame(MixWeights).toDF("lang", "w")
      val tot = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
        .join(broadcast(wdf), "lang")
      val feas = tot.agg(min(expr("(n_total * 100) div w")).as("s_total"))
      val quotas = tot.crossJoin(broadcast(feas))
        .select(col("lang"), col("w"), col("n_total"),
          expr("(w * s_total) div 100").as("quota"))
        .withColumn("thr_fp", expr("(quota * 1000000) div n_total"))
      val sampled = docs
        .join(broadcast(quotas.select("lang", "thr_fp")), "lang")
        .filter(col("hm") < col("thr_fp"))
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
      val out = quotas.join(sampled, Seq("lang"), "left_outer")
        .select(col("lang"), col("w"), col("n_total"), col("quota"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      out.crossJoin(broadcast(out.agg(sum("n_sampled").as("tot_sampled"))))
        .withColumn("share_fp6", expr("(n_sampled * 1000000) div tot_sampled"))
        .select("lang", "w", "n_total", "quota", "n_sampled", "share_fp6")
        .orderBy("lang")
    },
    Some {
      val vals = MixWeights
        .map { case (l, w) => s"('$l',${w}::BIGINT)" }.mkString(", ")
      s"""WITH w(lang, w) AS (SELECT * FROM (VALUES $vals)),
         |d AS (SELECT lang,
         |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
         |      % 1000000 AS hm
         |  FROM documents),
         |tot AS (SELECT lang, COUNT(*) AS n_total FROM d GROUP BY lang),
         |t2 AS (SELECT tot.lang, w.w, n_total FROM tot JOIN w USING (lang)),
         |feas AS (SELECT MIN((n_total * 100) // w) AS s_total FROM t2),
         |q AS (SELECT lang, w, n_total, (w * s_total) // 100 AS quota,
         |    (((w * s_total) // 100) * 1000000) // n_total AS thr_fp
         |  FROM t2, feas),
         |samp AS (SELECT d.lang, COUNT(*) AS n_sampled
         |  FROM d JOIN q ON d.lang = q.lang WHERE d.hm < q.thr_fp
         |  GROUP BY d.lang),
         |o AS (SELECT q.lang, w, n_total, quota,
         |    COALESCE(n_sampled, 0) AS n_sampled
         |  FROM q LEFT JOIN samp ON q.lang = samp.lang),
         |ts AS (SELECT SUM(n_sampled) AS tot_sampled FROM o)
         |SELECT lang, w, n_total, quota, n_sampled,
         |  CAST((n_sampled * 1000000) // tot_sampled AS BIGINT) AS share_fp6
         |FROM o, ts ORDER BY lang""".stripMargin
    })

  private val DecontamN = 8 // benchmark-overlap n-gram width

  /** q88: n-gram-level decontamination — the GPT-3/PaLM-style eval-set
    * scrub. q43/q58 catch whole-document collisions (fingerprint
    * equality); this catches PARTIAL containment of benchmark text: any
    * training doc sharing an 8-gram with the eval slice is flagged with
    * its overlap fraction. Eval set = the hash-mod slice
    * hash60(doc_id) % 20 = 3 (deterministic stand-in for a benchmark
    * suite). Scale shape: grams shuffle as 8-byte hash60 keys — the
    * gram STRING never enters the join — the eval side is distinct-
    * deduped (and small: eval suites are MBs, so at production scale it
    * broadcasts or becomes a q58 Bloom digest), and the per-doc overlap
    * is one keyed count agg. A hash60 collision can only ADD a flagged
    * gram; both engines hash identically, so the oracle is exact — and
    * production decontamination accepts that one-sidedness (over-flag,
    * never under-flag).
    */
  val q88NgramDecontaminate = NamedQuery(
    "q88_ngram_decontaminate",
    s"Eval-overlap decontamination: training docs sharing any " +
      s"$DecontamN-gram (as hash60 keys) with the eval slice; distinct " +
      "gram counts, hits, and overlap fraction per flagged doc.",
    (s, d) => {
      val base = Tables.documents(s, d).withColumn("is_eval",
        hash60(col("doc_id").cast("string")) % 20 === 3)
      val grams = base.select(col("doc_id"), col("lang"), col("is_eval"),
        explode(array_distinct(
          graft.functions.TextFunctions.wordNgrams(
            tokens(col("text")), DecontamN))).as("gram"))
        .withColumn("gk", hash60(col("gram")))
      val evalGrams = grams.filter(col("is_eval"))
        .select(col("gk")).distinct()
      val train = grams.filter(!col("is_eval"))
      val stats = train.groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_grams"))
      val hits = train.join(evalGrams, "gk")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      stats.join(hits, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_grams"), col("n_hit"),
          graft.functions.TextFunctions.fp6(
            col("n_hit").cast("double") / col("n_grams")).as("overlap_fp6"))
        .orderBy("doc_id")
    },
    Some(s"""WITH g AS (SELECT doc_id, lang,
            |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
            |      % 20 = 3 AS is_eval,
            |    unnest(list_distinct(list_transform(
            |      range(1, len(ts) - ${DecontamN - 2}),
            |      i -> list_aggregate(ts[i:i+${DecontamN - 1}],
            |        'string_agg', ' ')))) AS gram
            |  FROM (SELECT doc_id, lang, string_split(lower(text),' ') AS ts
            |    FROM documents)
            |  WHERE len(ts) >= $DecontamN),
            |gh AS (SELECT doc_id, lang, is_eval,
            |    ('0x'||substring(md5(gram),1,15))::BIGINT AS gk FROM g),
            |ev AS (SELECT DISTINCT gk FROM gh WHERE is_eval),
            |tr AS (SELECT doc_id, lang, gk FROM gh WHERE NOT is_eval),
            |st AS (SELECT doc_id, lang, COUNT(*) AS n_grams FROM tr
            |  GROUP BY doc_id, lang),
            |hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM tr
            |  JOIN ev USING (gk) GROUP BY doc_id)
            |SELECT st.doc_id, lang, n_grams, n_hit,
            |  CAST(floor(CAST(n_hit AS DOUBLE) / n_grams * 1000000.0)
            |    AS BIGINT) AS overlap_fp6
            |FROM st JOIN hits ON st.doc_id = hits.doc_id
            |ORDER BY st.doc_id""".stripMargin))

  /** q117: EXACT-k per-stratum sampling — the complement of q55's
    * rate-based thresholding when the contract is "exactly k docs per
    * language", not "approximately rate·n". Selection key is the
    * deterministic hash60(doc_id) (uniform, reprocessing-stable, no
    * RNG); the k smallest keys per stratum are found by the bounded-heap
    * [[graft.functions.NativeAggregates.TopKPairAgg]] — map-side k-entry
    * heaps, so the exchange carries ≤ k pairs per (lang × partition)
    * instead of a window sort shuffling the whole corpus. At 100 TB
    * this is how per-stratum eval slices get drawn: one partial-agg
    * pass, output size |strata|·k.
    */
  val q117ExactKSample = NamedQuery(
    "q117_exact_k_sample",
    "Exactly-25-per-language sample: k smallest hash60(doc_id) per " +
      "stratum via the bounded-heap top-k aggregate (no window sort).",
    (s, d) => {
      val k = 25
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          hash60(col("doc_id").cast("string")).as("h"))
      docs.groupBy("lang")
        // heap keeps score DESC; negate the hash for ascending order
        .agg(graft.functions.NativeAggregates
          .topKPair(-col("h"), col("doc_id"), k).as("tk"))
        .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
          col("e.id").as("doc_id"), (-col("e.score")).as("h"))
        .orderBy("lang", "rank")
    },
    Some("""WITH d AS (SELECT lang, doc_id,
            |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
            |      AS h FROM documents),
            |r AS (SELECT lang, doc_id, h,
            |    CAST(row_number() OVER (PARTITION BY lang
            |      ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rank FROM d)
            |SELECT lang, rank, doc_id, h FROM r WHERE rank <= 25
            |ORDER BY lang, rank""".stripMargin))

  /** Integer log2 with 1/16 resolution, identical in Spark and DuckDB:
    * `16·floor(log2 x) + (16x >> floor(log2 x)) − 16` — the floor-log2
    * backbone q95 uses plus a 4-bit linear-mantissa correction, so
    * nearby counts stop collapsing onto the same power of two (the
    * plain fl2 form left every q122 importance weight at exactly 0).
    * Monotone, all-integer, defined for x ≥ 1.
    */
  private def lg16Sql(e: String): String =
    s"(16*(length(bin($e))-1)" +
      s" + (16*($e)) div shiftleft(CAST(1 AS BIGINT), length(bin($e))-1)" +
      " - 16)"

  private def lg16DuckSql(e: String): String =
    s"(16*(length(bin($e))-1)" +
      s" + (16*($e)) // (1::BIGINT << (length(bin($e))-1)) - 16)"

  /** q122: DSIR-shaped data selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") with an integer
    * unigram-LM surrogate: each token scores
    * (target-slice log-prob − raw-corpus log-prob) under [[lg16Sql]]
    * fixed-point log2 — positive when the token is relatively MORE
    * likely in the target distribution (here the `lang = 'en'` slice) —
    * add-1 smoothed against the raw vocabulary so unseen-in-target
    * tokens stay finite; a doc's importance weight is the
    * count-weighted sum and the top-50 by (weight, doc_id) are the
    * resampled selection. All-integer, so the selection boundary is
    * engine-exact.
    * Scale shape: ONE corpus scan into a cached (doc, lang, term, c)
    * table; the corpus-wide and target-slice term counts are
    * whole-partition window sums over the term partition (no vocab
    * join-back), the three global totals are a 1-row broadcast
    * crossJoin, the per-doc weight is one hash-agg, and top-50 is
    * TakeOrderedAndProject (no global sort). The corpus is never
    * shuffled by anything wider than (doc, term).
    */
  val q122DsirImportance = NamedQuery(
    "q122_dsir_importance",
    "DSIR importance weights: fixed-point-log2 (target − raw) " +
      "log-prob per token, add-1 smoothed, summed per doc; top-50 " +
      "selection.",
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "lang", "term").agg(count(lit(1)).as("c"))
        .cache() // feeds the totals row and the weighted stream
      val totals = tf.agg(sum("c").as("tot_raw"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L))
          .as("tot_tgt"),
        countDistinct(col("term")).as("v"))
      val wTerm = Window.partitionBy("term")
      tf
        .withColumn("c_raw", sum("c").over(wTerm))
        .withColumn("c_tgt",
          sum(when(col("lang") === "en", col("c")).otherwise(0L))
            .over(wTerm))
        .crossJoin(broadcast(totals))
        .withColumn("w", expr(
          s"(${lg16Sql("c_tgt + 1")} - ${lg16Sql("tot_tgt + v")})" +
            s" - (${lg16Sql("c_raw + 1")} - ${lg16Sql("tot_raw + v")})"))
        .groupBy("doc_id", "lang")
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          sum(col("c") * col("w")).cast("long").as("weight"))
        .orderBy(col("weight").desc, col("doc_id"))
        .limit(50)
    },
    Some(s"""WITH toks AS (SELECT doc_id, lang, u AS term FROM
            |    (SELECT doc_id, lang, string_split(lower(text),' ') AS ts
            |     FROM documents), unnest(ts) AS t(u)),
            |tf AS (SELECT doc_id, lang, term, CAST(COUNT(*) AS BIGINT) AS c
            |  FROM toks GROUP BY doc_id, lang, term),
            |raw AS (SELECT term, CAST(SUM(c) AS BIGINT) AS c_raw
            |  FROM tf GROUP BY term),
            |tgt AS (SELECT term, CAST(SUM(c) AS BIGINT) AS c_tgt
            |  FROM tf WHERE lang = 'en' GROUP BY term),
            |vocab AS (SELECT raw.term, c_raw, COALESCE(c_tgt, 0) AS c_tgt
            |  FROM raw LEFT JOIN tgt ON raw.term = tgt.term),
            |tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS tot_raw,
            |    CAST(SUM(c_tgt) AS BIGINT) AS tot_tgt,
            |    CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
            |w AS (SELECT doc_id, lang, c,
            |    (${lg16DuckSql("c_tgt + 1")} - ${lg16DuckSql("tot_tgt + v")})
            |    - (${lg16DuckSql("c_raw + 1")} - ${lg16DuckSql("tot_raw + v")})
            |      AS w
            |  FROM tf JOIN vocab USING (term), tot)
            |SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
            |  CAST(SUM(c * w) AS BIGINT) AS weight
            |FROM w GROUP BY doc_id, lang
            |ORDER BY weight DESC, doc_id LIMIT 50""".stripMargin))

  /** q126: weight-biased deterministic sampling — the data-mixing draw
    * where selection probability should scale with a per-doc weight
    * (here `n_chars`, standing in for a quality score): selection key
    * is hash60(doc_id) div weight, so heavier docs get systematically
    * smaller keys and the k smallest keys per language approximate a
    * weighted draw (the integer surrogate of exponential-race /
    * A-ES sampling — approximate in distribution, but byte-exact and
    * reprocessing-stable, which is what a training pipeline needs to
    * reproduce a mix). Same bounded-heap shape as q117: map-side
    * k-entry heaps, exchange ≤ k·partitions per stratum, no corpus
    * window sort.
    */
  val q126WeightedSample = NamedQuery(
    "q126_weighted_sample",
    "Weight-biased top-10-per-language sample: k smallest " +
      "hash60(doc_id) div n_chars keys via the bounded-heap aggregate.",
    (s, d) => {
      val k = 10
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          hash60(col("doc_id").cast("string")).as("h"), col("n_chars"))
        .select(col("doc_id"), col("lang"), expr("h div n_chars").as("wkey"))
      docs.groupBy("lang")
        .agg(graft.functions.NativeAggregates
          .topKPair(-col("wkey"), col("doc_id"), k).as("tk"))
        .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
          col("e.id").as("doc_id"), (-col("e.score")).as("wkey"))
        .orderBy("lang", "rank")
    },
    Some("""WITH d AS (SELECT lang, doc_id,
           |    ('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
           |      // n_chars AS wkey FROM documents),
           |r AS (SELECT lang, doc_id, wkey,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY wkey ASC, doc_id ASC) AS BIGINT) AS rank FROM d)
           |SELECT lang, rank, doc_id, wkey FROM r WHERE rank <= 10
           |ORDER BY lang, rank""".stripMargin))


  /** q135: WATER-FILLING TOKEN-BUDGET ALLOCATION — distribute a total
    * token budget across sources so no source exceeds what it has:
    * alloc_s = min(avail_s, λ) with the water level λ chosen so
    * Σ alloc = budget (up to floor slack). The classic algorithm
    * (sort by avail, walk until the candidate level fits) runs as
    * window functions over the per-source table, which is TINY by
    * construction — the corpus contributes exactly one grouped
    * aggregation (token counts per source), and everything after
    * operates on |sources| rows, so the single-partition window is a
    * driver-scale triviality, not a shuffle of data. λ is integer
    * floor division end-to-end — engine-exact, no fixed point needed.
    * The 1-row λ broadcast-joins back (the scalar-broadcast pattern of
    * q63). This is the "how much of each domain can I actually take"
    * step that precedes any mixture sampling (q87) when targets
    * overshoot small domains.
    */
  val q135TokenBudget = NamedQuery(
    "q135_token_budget",
    "Water-filling allocation of a 24k-token budget across sources: " +
      "min(avail, lambda) with integer water level; saturated sources " +
      "flagged.",
    (s, d) => {
      val avail = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(size(tokens(col("text"))).cast("long")).as("avail"))
      graft.operators.CorpusBudget
        .waterFill(avail, "source", "avail", budget = 24000L)
        .orderBy("source")
    },
    Some("""WITH avail AS (
           |  SELECT source,
           |    CAST(sum(len(string_split(lower(text),' '))) AS BIGINT) AS avail
           |  FROM documents GROUP BY 1),
           |ranked AS (
           |  SELECT source, avail,
           |    row_number() OVER (ORDER BY avail, source) AS rn,
           |    count(*) OVER () AS n,
           |    COALESCE(sum(avail) OVER (ORDER BY avail, source
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pa
           |  FROM avail),
           |cand AS (
           |  SELECT *, (24000 - pa) // (n - rn + 1) AS lam_i FROM ranked),
           |lam AS (
           |  SELECT min_by(lam_i, rn) FILTER (lam_i <= avail) AS lam FROM cand)
           |SELECT source, avail,
           |  CAST(CASE WHEN lam IS NULL OR avail <= lam
           |    THEN avail ELSE lam END AS BIGINT) AS alloc,
           |  CAST(CASE WHEN lam IS NULL OR avail <= lam
           |    THEN 1 ELSE 0 END AS BIGINT) AS saturated
           |FROM cand, lam ORDER BY source""".stripMargin))

  /** q136: TOKEN-DISTRIBUTION DRIFT between two corpus snapshots —
    * the monitoring query a training pipeline runs when a new crawl
    * lands: have token frequencies shifted? The two "snapshots" are
    * the deterministic doc_id-parity halves of the corpus; the
    * statistic is each token's |freq_A − freq_B| in exact fp6
    * (count·1e6 div total), i.e. the per-token contribution to total
    * variation distance — all-integer, engine-exact, no log needed.
    * Scale shape: ONE token scan; the two sides align by CONDITIONAL
    * AGGREGATION on the half flag (`sum(case when half…)`) instead of
    * a full-outer self-join — absent-in-one-half tokens fall out as
    * count 0 with no join at all; the two per-half totals ride a
    * 1-row broadcast; top-20 via TakeOrderedAndProject.
    */
  val q136DistributionDrift = NamedQuery(
    "q136_distribution_drift",
    "Top-20 drifting tokens between doc_id-parity corpus halves: " +
      "|freq_A - freq_B| in exact fp6, conditional agg (no self-join).",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select((col("doc_id") % 2).cast("long").as("half"),
          explode(tokens(col("text"))).as("tok"))
      val counts = toks.groupBy("tok")
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
        .cache() // totals + drift both read it: one token scan
      val totals = counts.agg(sum("ca").as("ta"), sum("cb").as("tb"))
      counts.crossJoin(broadcast(totals))
        .select(col("tok"),
          // DECIMAL(38,0): a stopword's count approaches corpus tokens
          // (~2.5e13 at 100 TB), so ca*1e6 clears BIGINT (q167 discipline)
          expr("CAST((CAST(ca AS DECIMAL(38,0)) * 1000000) div ta" +
            " AS BIGINT)").as("fa_fp"),
          expr("CAST((CAST(cb AS DECIMAL(38,0)) * 1000000) div tb" +
            " AS BIGINT)").as("fb_fp"))
        .withColumn("drift_fp",
          abs(col("fa_fp") - col("fb_fp")))
        .orderBy(col("drift_fp").desc, col("tok"))
        .limit(20)
    },
    Some("""WITH toks AS (SELECT doc_id % 2 AS half, u AS tok FROM
           |  (SELECT doc_id, string_split(lower(text),' ') AS ts
           |   FROM documents), unnest(ts) AS t(u)),
           |counts AS (SELECT tok,
           |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           |  FROM toks GROUP BY 1),
           |totals AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
           |    CAST(sum(cb) AS BIGINT) AS tb FROM counts)
           |SELECT tok,
           |  CAST((ca::HUGEINT * 1000000) // ta AS BIGINT) AS fa_fp,
           |  CAST((cb::HUGEINT * 1000000) // tb AS BIGINT) AS fb_fp,
           |  CAST(abs((ca::HUGEINT * 1000000) // ta
           |    - (cb::HUGEINT * 1000000) // tb) AS BIGINT) AS drift_fp
           |FROM counts, totals
           |ORDER BY drift_fp DESC, tok LIMIT 20""".stripMargin))

  /** q147: EPOCH-SEEDED DETERMINISTIC SHARD ASSIGNMENT — the export
    * shuffle of a training pipeline. Training wants each epoch to read
    * the corpus in a different pseudo-random order; at 100 TB that
    * order is realized as hash-sharded output files (shard =
    * hex-prefix of md5(seed ‖ doc_id)), written per shard in key
    * order — NOT as a global sort of the corpus. The shard key is
    * row-local (one exchange total, the stats agg), re-seeding an
    * epoch re-keys with zero data movement until the re-write, and
    * md5's uniformity makes the 16 shards byte-balanced — which is the
    * property this query pins as hash-checked numbers (docs AND bytes
    * per shard). Engine-identical because both engines md5 the same
    * decimal string.
    */
  val q147ShardAssignment = NamedQuery(
    "q147_shard_assignment",
    "Epoch-seeded deterministic 16-way shard assignment (hex prefix " +
      "of md5(seed||doc_id)): docs + bytes per shard pin the balance " +
      "contract of hash-sharded training export.",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          substring(md5(concat(lit("epoch7:"),
            col("doc_id").cast("string"))), 1, 1).as("shard"),
          col("n_chars"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("shard"),
    Some("""SELECT substring(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 1)
           |    AS shard,
           |  COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** q153: PII detect + redact ([[graft.operators.PiiScrub]]) — the
    * scrub pass a corpus runs before text leaves the trust boundary.
    * The harness corpus is synthetic word soup with no PII, so the
    * fixture builds deterministic contact cards from customer×nation
    * (email present for 2/3 of keys, phone for 1/2, an IP always —
    * counts VARY per row, so the oracle checks detection, not a
    * constant), then counts each PII class on the raw text and
    * substitutes typed placeholders. Scale shape: one broadcast dim
    * join + row-local codegen'd regex work — no shuffle beyond the
    * output sort, embarrassingly parallel at 100 TB. Patterns are the
    * Java-regex ∩ RE2 common subset so redacted text hash-matches
    * DuckDB byte-for-byte.
    */
  val q153PiiRedact = NamedQuery(
    "q153_pii_redact",
    "PII scrub: per-row email/phone/IP counts on raw text + typed " +
      "placeholder redaction (regex common subset, hash-exact).",
    (s, d) => {
      import graft.operators.PiiScrub
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      val recs = cust.join(broadcast(nat),
          cust("c_nationkey") === nat("n_nationkey"))
        .select(col("c_custkey"), concat_ws(" ",
          lit("contact"), col("c_name"),
          when(col("c_custkey") % 3 =!= 0,
            concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ".")),
              lit("@"),
              regexp_replace(lower(col("n_name")), "[^a-z0-9]", ""),
              lit(".example.com")))
            .otherwise(lit("no-email")),
          when(col("c_custkey") % 2 === 0,
            concat(lit("+1-"),
              lpad((col("c_custkey") % 900 + 100).cast("string"), 3, "0"),
              lit("-"),
              lpad((col("c_custkey") * 7 % 10000).cast("string"), 4, "0")))
            .otherwise(lit("no-phone")),
          concat(lit("10."), (col("c_custkey") % 200).cast("string"),
            lit("."), (col("c_custkey") * 3 % 250).cast("string"),
            lit("."), (col("c_custkey") % 100 + 1).cast("string"))).as("text"))
      recs.select(col("c_custkey"),
          PiiScrub.countEmails(col("text")).cast("long").as("n_emails"),
          PiiScrub.countPhones(col("text")).cast("long").as("n_phones"),
          PiiScrub.countIps(col("text")).cast("long").as("n_ips"),
          PiiScrub.redact(col("text")).as("redacted"))
        .orderBy("c_custkey")
    },
    Some("""WITH recs AS (SELECT c_custkey, concat_ws(' ',
           |    'contact', c_name,
           |    CASE WHEN c_custkey % 3 <> 0 THEN
           |      lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g'))
           |        || '@' || regexp_replace(lower(n_name), '[^a-z0-9]', '', 'g')
           |        || '.example.com'
           |    ELSE 'no-email' END,
           |    CASE WHEN c_custkey % 2 = 0 THEN
           |      '+1-' || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0')
           |        || '-' || lpad(CAST(c_custkey * 7 % 10000 AS VARCHAR), 4, '0')
           |    ELSE 'no-phone' END,
           |    '10.' || CAST(c_custkey % 200 AS VARCHAR)
           |      || '.' || CAST(c_custkey * 3 % 250 AS VARCHAR)
           |      || '.' || CAST(c_custkey % 100 + 1 AS VARCHAR)) AS text
           |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
           |SELECT c_custkey,
           |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9.]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(text, '[+]1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           |  CAST(len(regexp_extract_all(text, '([0-9]{1,3}[.]){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '[EMAIL]', 'g'),
           |    '[+]1-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
           |    '([0-9]{1,3}[.]){3}[0-9]{1,3}', '[IP]', 'g') AS redacted
           |FROM recs ORDER BY c_custkey""".stripMargin))

  /** q164: DATA-QUALITY EXPECTATIONS — the DLT `expect_or_drop` gate
    * as a first-class operator ([[graft.operators.Expectations]]):
    * three named row-local rules over the corpus (token floor, char
    * ceiling, distinct-token-ratio floor), reported in the DLT
    * event-log shape — one row per rule (n_failed / n_passed /
    * pass_fp6) plus the all-pass row — computed in ONE aggregate pass.
    * The operator's production surface publishes the same counts over
    * Spark's `observe` channel (batch `Observation` / streaming
    * per-micro-batch metrics, ExpectationsSpec) so gating a 100 TB
    * table audits itself with zero extra scans; this query pins the
    * counting semantics cross-engine.
    */
  val q164QualityGate = NamedQuery(
    "q164_quality_gate",
    "DLT-style expectations over documents: per-rule pass/fail counts " +
      "+ all-pass row in one aggregate pass (min_tokens>=24, " +
      "n_chars<=480, distinct_ratio>=0.3).",
    (s, d) => {
      import graft.operators.Expectations.{Rule, ruleReport}
      val toks = tokens(col("text"))
      ruleReport(Tables.documents(s, d), Seq(
        Rule("min_tokens", size(toks) >= 24),
        Rule("max_chars", col("n_chars") <= 480),
        Rule("distinct_ratio",
          graft.functions.TextFunctions.fp6(
            size(array_distinct(toks)).cast("double") / size(toks))
            >= 300000L)))
    },
    Some("""WITH t AS (SELECT n_chars,
           |    string_split(lower(text),' ') AS ts FROM documents),
           |f AS (SELECT
           |    CASE WHEN len(ts) >= 24 THEN 1 ELSE 0 END AS ok_min,
           |    CASE WHEN n_chars <= 480 THEN 1 ELSE 0 END AS ok_max,
           |    CASE WHEN floor(CAST(len(list_distinct(ts)) AS DOUBLE)
           |        / len(ts) * 1000000.0) >= 300000 THEN 1 ELSE 0 END
           |      AS ok_dr
           |  FROM t),
           |a AS (SELECT COUNT(*) AS n,
           |    SUM(ok_min) AS ok_min, SUM(ok_max) AS ok_max,
           |    SUM(ok_dr) AS ok_dr,
           |    SUM(CASE WHEN ok_min + ok_max + ok_dr = 3 THEN 1 ELSE 0 END)
           |      AS all_ok
           |  FROM f)
           |SELECT rule, CAST(n_failed AS BIGINT) AS n_failed,
           |  CAST(n_passed AS BIGINT) AS n_passed,
           |  CAST((n_passed * 1000000) // n AS BIGINT) AS pass_fp6
           |FROM (
           |  SELECT 'min_tokens' AS rule, n - ok_min AS n_failed,
           |    ok_min AS n_passed, n FROM a
           |  UNION ALL SELECT 'max_chars', n - ok_max, ok_max, n FROM a
           |  UNION ALL SELECT 'distinct_ratio', n - ok_dr, ok_dr, n FROM a
           |  UNION ALL SELECT 'zz_all_pass', n - all_ok, all_ok, n FROM a)
           |ORDER BY rule""".stripMargin))

  /** q166: FIXED-VOCABULARY COVERAGE / OOV RATE — the tokenizer-QA
    * number a training pipeline checks per source before committing to
    * a vocab: build the top-512 corpus vocabulary (frequency desc,
    * token asc tie-break — a TOTAL order, so the cut is deterministic)
    * and measure, per source, the fraction of token OCCURRENCES that
    * fall outside it. Scale shape: ONE (source, token) hash-agg over
    * the exploded corpus (map-side combined — the only corpus-sized
    * shuffle), the global vocab derived by RE-AGGREGATING that table
    * (q95's discipline: never a second corpus scan), its top-512 via
    * orderBy+limit (TakeOrderedAndProject — bounded heaps, NOT a
    * single-partition rank window), broadcast back, and a |sources|-row
    * final agg. OOV fraction is integer fp6 — hash-exact cross-engine.
    */
  val q166VocabCoverage = NamedQuery(
    "q166_vocab_coverage",
    "Per-source OOV rate under the deterministic top-512 corpus " +
      "vocabulary: occurrence coverage via one (source,token) " +
      "hash-agg re-aggregated for the vocab cut, fp6-exact.",
    (s, d) => {
      val st = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .cache() // vocab cut + coverage both read it: one corpus scan
      val vocab = st.groupBy("tok").agg(sum("c").as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(512)
        .select(col("tok"), lit(1).as("in_vocab"))
      st.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("source")
        .agg(sum("c").cast("long").as("n_occurrences"),
          sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L)))
            .cast("long").as("n_oov"))
        .withColumn("oov_fp", // corpus-token-scaled numerator: widen
          expr("CAST((CAST(n_oov AS DECIMAL(38,0)) * 1000000)" +
            " div n_occurrences AS BIGINT)"))
        .orderBy("source")
    },
    Some("""WITH st AS (SELECT source, u AS tok FROM
           |    (SELECT source, string_split(lower(text),' ') AS ts
           |     FROM documents), unnest(ts) AS t(u)),
           |sc AS (SELECT source, tok, COUNT(*) AS c FROM st GROUP BY 1, 2),
           |vocab AS (SELECT tok FROM
           |    (SELECT tok, SUM(c) AS cnt FROM sc GROUP BY 1)
           |  ORDER BY cnt DESC, tok LIMIT 512)
           |SELECT source, CAST(SUM(c) AS BIGINT) AS n_occurrences,
           |  CAST(SUM(CASE WHEN v.tok IS NULL THEN c ELSE 0 END)
           |    AS BIGINT) AS n_oov,
           |  CAST(SUM(CASE WHEN v.tok IS NULL THEN c ELSE 0 END)::HUGEINT
           |    * 1000000 // SUM(c) AS BIGINT) AS oov_fp
           |FROM sc LEFT JOIN vocab v USING (tok)
           |GROUP BY source ORDER BY source""".stripMargin))

  /** q167: TEMPERATURE-SCALED SOURCE MIXING (α = 1/2) — the standard
    * multilingual/multi-source rebalancing (mT5/XLM-R style): sampling
    * weight w_i = n_i^α flattens the natural size distribution so small
    * sources are up-sampled without letting any source dominate. α=1/2
    * is computed EXACTLY as isqrt: `floor(sqrt(x))` of a BIGINT that
    * fits in a double's 52-bit mantissa is bit-identical in any
    * IEEE-754 engine (sqrt is correctly rounded; perfect squares hit
    * exact doubles), so the whole schedule stays hash-checkable —
    * p_fp6 (share of the mix) and rel_rate_fp6 (up/down-sampling factor
    * vs natural share, >1e6 = up-sampled) are integer div chains
    * evaluated in the SAME association in both engines. rel_rate's
    * numerator (w·1e6·c_total) would overflow BIGINT once corpus chars
    * exceed ~9.2e12 — i.e. exactly at the claimed scale — so it runs
    * through a 128-bit intermediate (Spark DECIMAL(38,0) `div` ≡ DuckDB
    * HUGEINT `//`, both floor for non-negative operands): headroom to
    * 1e38, one division instead of two (strictly more precise than the
    * old early-truncating chain). Scale shape: one |sources|-row agg
    * off the documents scan, a 1-row totals broadcast — the corpus
    * shuffles zero times.
    */
  val q167TemperatureMix = NamedQuery(
    "q167_temperature_mix",
    "Temperature-scaled mixing schedule (alpha=1/2 via exact isqrt): " +
      "per-source sampling share + up/down-sampling factor vs natural " +
      "share, integer-exact off one keyed agg.",
    (s, d) => {
      val per = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum("n_chars").cast("long").as("n_chars_total"))
        .withColumn("w", floor(sqrt(col("n_chars_total"))).cast("long"))
      val tot = per.agg(sum("w").as("w_total"),
        sum("n_chars_total").as("c_total"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_chars_total"), col("w"),
          expr("(w * 1000000) div w_total").as("p_fp"),
          expr("CAST((CAST(w AS DECIMAL(38,0)) * 1000000 * c_total) div " +
            "(CAST(w_total AS DECIMAL(38,0)) * n_chars_total) AS BIGINT)")
            .as("rel_rate_fp"))
        .orderBy("source")
    },
    Some("""WITH per AS (SELECT source,
           |    CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           |    CAST(floor(sqrt(CAST(SUM(n_chars) AS BIGINT))) AS BIGINT)
           |      AS w
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total,
           |    CAST(SUM(n_chars_total) AS BIGINT) AS c_total FROM per)
           |SELECT source, n_chars_total, w,
           |  CAST((w * 1000000) // w_total AS BIGINT) AS p_fp,
           |  CAST((w::HUGEINT * 1000000 * c_total) //
           |    (w_total::HUGEINT * n_chars_total) AS BIGINT) AS rel_rate_fp
           |FROM per, tot ORDER BY source""".stripMargin))

  /** q169: BPE FIRST-MERGE PAIR STATISTICS — the inner loop of
    * byte-pair-encoding tokenizer training, iteration one: over the
    * initial character vocabulary, count every ADJACENT SYMBOL PAIR
    * occurrence inside tokens (occurrence-weighted, which is exactly
    * BPE's word-frequency weighting) and rank the merge candidates.
    * Scale shape: pair generation is a row-local nested generate
    * (token explode, then a transform/sequence slide over each token —
    * no join, no pre-shuffle blowup materialized), followed by ONE
    * (pair) hash-agg and a TakeOrderedAndProject top-20; ties broken
    * by pair text so the cut is total-ordered and hash-exact. At
    * 100 TB each BPE iteration stays one keyed shuffle of (pair,count)
    * partials — the property that makes distributed tokenizer
    * training feasible.
    */
  val q169BpePairStats = NamedQuery(
    "q169_bpe_pair_stats",
    "BPE merge-candidate statistics: occurrence-weighted adjacent " +
      "character-pair counts via row-local slide + one hash-agg; " +
      "top-20 by (count desc, pair).",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(tok) - 1)," +
            " i -> substring(tok, i, 2))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(20),
    Some("""WITH toks AS (SELECT u AS tok FROM
           |    (SELECT string_split(lower(text),' ') AS ts FROM documents),
           |    unnest(ts) AS t(u) WHERE length(u) >= 2),
           |pairs AS (SELECT substring(tok, CAST(i AS INT), 2) AS pair
           |  FROM toks, unnest(range(1, length(tok))) AS r(i))
           |SELECT pair, COUNT(*) AS cnt FROM pairs
           |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin))

  /** q174: DETERMINISTIC BOOTSTRAP CONFIDENCE INTERVAL — the error bar
    * a corpus metric needs before a go/no-go call (is source A's
    * quality REALLY above source B's, or is that noise?): 32 bootstrap
    * replicas of the mean distinct-token-ratio, each resample drawn
    * with PSEUDO-POISSON(1) weights from `hash60(doc_id‖replica) mod
    * 1000` thresholded at the e^-1 ladder (368/736/920 ⇒ w ∈
    * {0,1,2,3} with Poisson-approximate mass) — the classic
    * Poisson-bootstrap surrogate that needs NO per-replica global
    * count, which is exactly what makes bootstrap distributable: at
    * 100 TB each row emits its 32 (replica, w) contributions row-local
    * and ONE (replica)-keyed agg of 32 rows computes every replica
    * mean; no resample is ever materialized. CI = 2nd/31st order
    * statistic of the 32 replica means (≈94% coverage), reduced via a
    * tiny sort of a 32-row table. Integer fp6 end-to-end.
    */
  val q174BootstrapCi = NamedQuery(
    "q174_bootstrap_ci",
    "Poisson-bootstrap CI for mean distinct-token ratio: 32 replicas " +
      "via hash-thresholded row-local weights, replica means from one " +
      "keyed agg, CI = 2nd/31st order statistics, fp6-exact.",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextFunctions.fp6(
            size(array_distinct(tokens(col("text")))).cast("double") /
              size(tokens(col("text")))).as("m_fp6"))
      val contrib = docs
        .select(col("doc_id"), col("m_fp6"),
          explode(expr("sequence(0, 31)")).as("b"))
        .withColumn("hm", hash60(concat(lit("boot1:"),
          col("doc_id").cast("string"), lit(":"),
          col("b").cast("string"))) % 1000L)
        .withColumn("w",
          when(col("hm") < 368, 0L).when(col("hm") < 736, 1L)
            .when(col("hm") < 920, 2L).otherwise(3L))
      // integer div both sides: DuckDB CAST(double AS BIGINT) ROUNDS
      // while Spark's truncates — a float mean could hash-diverge
      val replicas = contrib.groupBy("b")
        .agg(sum(col("w") * col("m_fp6")).as("swm"), sum("w").as("sw"))
        .select(col("b"), expr("swm div sw").as("rep_mean_fp6"))
      // 32-row table: the unpartitioned rank window is a deliberate
      // single-task reduce of replica-count (not data-sized) input
      val ranked = replicas
        .select(col("rep_mean_fp6"),
          row_number().over(graft.BoundedWindow
            .orderBy(col("rep_mean_fp6"), col("b"))).as("r"))
      val point = docs
        .agg(sum("m_fp6").as("sm"), count(lit(1)).as("n"))
        .select(expr("sm div n").as("point_fp6"))
      ranked.filter(col("r") === 2 || col("r") === 31)
        .groupBy()
        .agg(min("rep_mean_fp6").as("ci_lo_fp6"),
          max("rep_mean_fp6").as("ci_hi_fp6"))
        .crossJoin(broadcast(point))
        .select("point_fp6", "ci_lo_fp6", "ci_hi_fp6")
    },
    Some("""WITH docs AS (SELECT doc_id,
           |    CAST(floor(CAST(len(list_distinct(string_split(lower(text),
           |      ' '))) AS DOUBLE) / len(string_split(lower(text), ' '))
           |      * 1000000.0) AS BIGINT) AS m_fp6
           |  FROM documents),
           |contrib AS (SELECT doc_id, m_fp6, b,
           |    ('0x'||substring(md5('boot1:'||CAST(doc_id AS VARCHAR)
           |      ||':'||CAST(b AS VARCHAR)),1,15))::BIGINT % 1000 AS hm
           |  FROM docs, unnest(range(0, 32)) AS t(b)),
           |wts AS (SELECT *, CASE WHEN hm < 368 THEN 0
           |    WHEN hm < 736 THEN 1 WHEN hm < 920 THEN 2 ELSE 3 END AS w
           |  FROM contrib),
           |reps AS (SELECT b, CAST(SUM(w * m_fp6) // SUM(w) AS BIGINT)
           |    AS rep_mean_fp6 FROM wts GROUP BY b),
           |ranked AS (SELECT rep_mean_fp6, row_number()
           |    OVER (ORDER BY rep_mean_fp6, b) AS r FROM reps),
           |pt AS (SELECT CAST(SUM(m_fp6) // COUNT(*) AS BIGINT)
           |    AS point_fp6 FROM docs)
           |SELECT point_fp6,
           |  MIN(rep_mean_fp6) AS ci_lo_fp6,
           |  MAX(rep_mean_fp6) AS ci_hi_fp6
           |FROM ranked, pt WHERE r = 2 OR r = 31
           |GROUP BY point_fp6""".stripMargin))

  /** q176: DATASET CARD — the per-source one-row summary a curation
    * team publishes with a corpus release (HuggingFace dataset-card
    * numbers), composed from the suite's own primitives in ONE doc
    * scan: volume (docs, tokens, mean chars), quality (mean
    * distinct-token ratio, integer-div fp6), exact-duplicate exposure
    * (docs whose text digest repeats — q12's digest discipline), and
    * the dominant language with its share. Scale shape: per-doc
    * features are row-local off the cached scan; the dup mark is one
    * (digest) hash-agg joined back by digest; language dominance is a
    * (source, lang) hash-agg reduced by min_by (partial agg — no
    * window sort); the final card is a 3-way join of |sources|-row
    * tables. At 100 TB: one corpus scan + three keyed shuffles, and
    * the output is |sources| rows.
    */
  val q176DatasetCard = NamedQuery(
    "q176_dataset_card",
    "Per-source dataset card: docs/tokens/mean-chars, mean quality " +
      "fp6, exact-dup docs, dominant lang + share — one cached scan, " +
      "three keyed aggs, |sources| output rows.",
    (s, d) => {
      val feat = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"),
          size(tokens(col("text"))).cast("long").as("n_toks"),
          graft.functions.TextFunctions.fp6(
            size(array_distinct(tokens(col("text")))).cast("double") /
              size(tokens(col("text")))).as("q_fp6"),
          md5(col("text")).as("digest"))
        .cache() // volume/quality/dup/lang panels: one corpus scan
      val dupDigests = feat.groupBy("digest")
        .agg(count(lit(1)).as("dc")).filter(col("dc") > 1)
      val vol = feat.join(dupDigests, Seq("digest"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"),
          sum("n_chars").as("sum_chars"),
          sum("q_fp6").as("sum_q"),
          sum(when(col("dc").isNotNull, 1L).otherwise(0L))
            .as("n_exact_dup"))
      val langTop = feat.groupBy("source", "lang")
        .agg(count(lit(1)).as("lc"))
        .groupBy("source")
        .agg(min_by(col("lang"), struct(-col("lc"), col("lang")))
          .as("top_lang"),
          max("lc").as("top_lang_docs"))
      vol.join(langTop, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("sum_chars div n_docs").as("mean_chars"),
          expr("sum_q div n_docs").as("mean_quality_fp6"),
          col("n_exact_dup"), col("top_lang"),
          expr("(top_lang_docs * 1000000) div n_docs")
            .as("top_lang_share_fp6"))
        .orderBy("source")
    },
    Some("""WITH feat AS (SELECT source, lang, n_chars,
           |    CAST(len(string_split(lower(text),' ')) AS BIGINT)
           |      AS n_toks,
           |    CAST(floor(CAST(len(list_distinct(string_split(lower(text),
           |      ' '))) AS DOUBLE) / len(string_split(lower(text), ' '))
           |      * 1000000.0) AS BIGINT) AS q_fp6,
           |    md5(text) AS digest
           |  FROM documents),
           |dupd AS (SELECT digest, COUNT(*) AS dc FROM feat
           |  GROUP BY 1 HAVING COUNT(*) > 1),
           |vol AS (SELECT source, COUNT(*) AS n_docs,
           |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |    CAST(SUM(q_fp6) AS BIGINT) AS sum_q,
           |    CAST(SUM(CASE WHEN dc IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_exact_dup
           |  FROM feat LEFT JOIN dupd USING (digest) GROUP BY 1),
           |lt AS (SELECT source, lang AS top_lang, lc AS top_lang_docs
           |  FROM (SELECT source, lang, COUNT(*) AS lc,
           |      row_number() OVER (PARTITION BY source
           |        ORDER BY COUNT(*) DESC, lang ASC) AS rn
           |    FROM feat GROUP BY 1, 2) WHERE rn = 1)
           |SELECT source, n_docs, n_tokens,
           |  CAST(sum_chars // n_docs AS BIGINT) AS mean_chars,
           |  CAST(sum_q // n_docs AS BIGINT) AS mean_quality_fp6,
           |  n_exact_dup, top_lang,
           |  CAST((top_lang_docs * 1000000) // n_docs AS BIGINT)
           |    AS top_lang_share_fp6
           |FROM vol JOIN lt USING (source) ORDER BY source""".stripMargin))

  /** q180: K-ANONYMITY AUDIT — the re-identification check a corpus
    * runs before release (the governance sibling of q153's PII scrub):
    * under the quasi-identifier projection (source, lang,
    * length-decile), is every equivalence class at least k=5 strong?
    * Classes smaller than k are re-identification risk — the audit
    * reports, per class SIZE BAND, how many classes and how many rows
    * sit there, plus the overall at-risk row share. The
    * generalization (length → decile) is row-local integer math;
    * the class census is ONE (qid) hash-agg re-aggregated to the
    * band histogram — at 100 TB the audit is a scan plus two keyed
    * shuffles, and the output is a handful of rows. The k threshold
    * and the band edges are the release policy, pinned hash-exact.
    */
  val q180KAnonymity = NamedQuery(
    "q180_k_anonymity",
    "k-anonymity audit over (source, lang, length-decile): class-size " +
      "band histogram (classes + rows + at-risk share fp6, k=5) from " +
      "one hash-agg re-aggregated.",
    (s, d) => {
      val classes = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          least(expr("n_chars div 60"), lit(9L)).as("len_decile"))
        .groupBy("source", "lang", "len_decile")
        .agg(count(lit(1)).as("class_size"))
      val banded = classes
        .withColumn("band",
          when(col("class_size") < 5, "a_lt_k")
            .when(col("class_size") < 20, "b_k_to_20")
            .otherwise("c_ge_20"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_classes"),
          sum("class_size").as("n_rows"))
      val tot = banded.agg(sum("n_rows").as("n_total"))
      banded.crossJoin(broadcast(tot))
        .select(col("band"), col("n_classes"), col("n_rows"),
          expr("(n_rows * 1000000) div n_total").as("row_share_fp6"))
        .orderBy("band")
    },
    Some("""WITH classes AS (SELECT source, lang,
           |    LEAST(n_chars // 60, 9) AS len_decile,
           |    COUNT(*) AS class_size
           |  FROM documents GROUP BY 1, 2, 3),
           |banded AS (SELECT
           |    CASE WHEN class_size < 5 THEN 'a_lt_k'
           |      WHEN class_size < 20 THEN 'b_k_to_20'
           |      ELSE 'c_ge_20' END AS band,
           |    COUNT(*) AS n_classes,
           |    CAST(SUM(class_size) AS BIGINT) AS n_rows
           |  FROM classes GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total
           |  FROM banded)
           |SELECT band, n_classes, n_rows,
           |  CAST((n_rows * 1000000) // n_total AS BIGINT)
           |    AS row_share_fp6
           |FROM banded, tot ORDER BY band""".stripMargin))

  /** q183: HEAPS-LAW VOCABULARY GROWTH — the corpus-level "does more
    * data still buy new vocabulary" diagnostic (q162's novelty curve
    * is per-doc and 3-gram; THIS is the cumulative token-type curve
    * data-acquisition decisions read): V(n) at the 25/50/75/100%
    * checkpoints of ingest order, where "position" is the doc_id
    * VALUE inside [min, max] (ids are assigned sequentially at
    * ingest; value-quartiles need only a 1-row min/max broadcast —
    * NO global rank window, which would single-partition the corpus).
    * Scale shape: each token type's first-seen position is one
    * (token) hash-agg over the exploded corpus (`min(doc_id)`); the
    * four checkpoints are then ONE conditional agg over the
    * |vocabulary|-row table — the corpus is scanned once no matter
    * how many checkpoints. Output per checkpoint: docs and cumulative
    * vocab at the edge, NEW types in the quarter, and the marginal
    * rate (new types per 1e6 docs-worth of id span, fp) whose decay
    * is the Heaps-law signal.
    */
  val q183VocabGrowth = NamedQuery(
    "q183_vocab_growth",
    "Heaps-law curve: cumulative vocabulary at 25/50/75/100% of " +
      "ingest order from one (token)->first-seen-rank hash-agg; new " +
      "types + marginal types-per-1000-docs per quarter, exact.",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val b = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      val firstSeen = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(min("doc_id").as("first_id"))
      // one conditional agg over the |vocab|-row table + one over docs,
      // both against the broadcast [lo, hi] edges; edge_q = lo +
      // (hi-lo+1)*q div 4, checkpoint = ids in [lo, edge_q)
      def edge(q: Int) = expr(s"lo + ((hi - lo + 1) * $q) div 4")
      val vAggs = (1 to 4).map(q =>
        sum(when(col("first_id") < edge(q), 1L).otherwise(0L))
          .as(s"v$q"))
      val dAggs = (1 to 4).map(q =>
        sum(when(col("doc_id") < edge(q), 1L).otherwise(0L))
          .as(s"n$q"))
      val vRow = firstSeen.crossJoin(broadcast(b))
        .agg(vAggs.head, vAggs.tail: _*)
      val dRow = docs.crossJoin(broadcast(b))
        .agg(dAggs.head, dAggs.tail: _*)
      val parts = (1 to 4).map { q =>
        vRow.crossJoin(dRow)
          .select(lit(q.toLong).as("quarter"),
            col(s"n$q").as("n_docs"), col(s"v$q").as("vocab"),
            (col(s"v$q") -
              (if (q == 1) lit(0L) else col(s"v${q - 1}")))
              .as("new_types"),
            (col(s"n$q") -
              (if (q == 1) lit(0L) else col(s"n${q - 1}")))
              .as("docs_in_quarter"))
          .withColumn("rate_fp",
            expr("(new_types * 1000000) div " +
              "(CASE WHEN docs_in_quarter < 1 THEN 1 " +
              "ELSE docs_in_quarter END)"))
      }
      parts.reduce(_ unionByName _).orderBy("quarter")
    },
    Some("""WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
           |  FROM documents),
           |fs AS (SELECT tok, MIN(doc_id) AS first_id FROM
           |    (SELECT doc_id, unnest(string_split(lower(text),' '))
           |       AS tok FROM documents) GROUP BY 1),
           |v AS (SELECT
           |    CAST(SUM(CASE WHEN first_id < lo + ((hi-lo+1) * 1) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS v1,
           |    CAST(SUM(CASE WHEN first_id < lo + ((hi-lo+1) * 2) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS v2,
           |    CAST(SUM(CASE WHEN first_id < lo + ((hi-lo+1) * 3) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
           |    CAST(SUM(CASE WHEN first_id < lo + ((hi-lo+1) * 4) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS v4
           |  FROM fs, b),
           |dn AS (SELECT
           |    CAST(SUM(CASE WHEN doc_id < lo + ((hi-lo+1) * 1) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |    CAST(SUM(CASE WHEN doc_id < lo + ((hi-lo+1) * 2) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           |    CAST(SUM(CASE WHEN doc_id < lo + ((hi-lo+1) * 3) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n3,
           |    CAST(SUM(CASE WHEN doc_id < lo + ((hi-lo+1) * 4) // 4
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n4
           |  FROM documents, b),
           |rows0 AS (
           |  SELECT 1 AS quarter, n1 AS n_docs, v1 AS vocab,
           |    v1 AS new_types, n1 AS docs_in_quarter FROM v, dn
           |  UNION ALL SELECT 2, n2, v2, v2 - v1, n2 - n1 FROM v, dn
           |  UNION ALL SELECT 3, n3, v3, v3 - v2, n3 - n2 FROM v, dn
           |  UNION ALL SELECT 4, n4, v4, v4 - v3, n4 - n3 FROM v, dn)
           |SELECT CAST(quarter AS BIGINT) AS quarter, n_docs, vocab,
           |  new_types, docs_in_quarter,
           |  CAST((new_types * 1000000) //
           |    (CASE WHEN docs_in_quarter < 1 THEN 1
           |     ELSE docs_in_quarter END) AS BIGINT) AS rate_fp
           |FROM rows0 ORDER BY quarter""".stripMargin))

  val all: Seq[NamedQuery] = Seq(
    q37ApproxDistinct, q38SequencePacking, q39DatasetSplit,
    q40QuantizeEmbeddings, q43Contamination, q52VocabTopK,
    q55StratifiedSample, q58BloomContamination, q62DocChunking,
    q64KmvDistinct, q65CmsHeavyHitters, q87CorpusMixture,
    q88NgramDecontaminate, q92KmvSketchAgg, q98KmvOverlap,
    q117ExactKSample, q122DsirImportance, q126WeightedSample,
    q135TokenBudget, q136DistributionDrift, q147ShardAssignment,
    q153PiiRedact, q164QualityGate, q166VocabCoverage,
    q167TemperatureMix, q169BpePairStats, q174BootstrapCi,
    q176DatasetCard, q180KAnonymity, q183VocabGrowth)
}
