package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Large-scale text deduplication operators: exact (hash groupBy), n-gram
  * Jaccard, MinHash+LSH, and SimHash. All pure DataFrame/HOF expressions —
  * no UDFs — so every step stays inside whole-stage codegen AND can be
  * mirrored exactly by the DuckDB oracle (hashes are md5-derived, see
  * [[graft.functions.TextFunctions.hash60]]).
  *
  * Scale notes (100 TB design):
  *   - [[exactDupGroups]]: one hash-aggregate shuffle keyed by text digest;
  *     map-side partial aggregation collapses per-partition dups first.
  *   - [[jaccardPairs]]: joins on shared n-grams — only pairs sharing ≥1
  *     gram are ever materialized, but frequent grams explode the join at
  *     corpus scale. It is the CORRECTNESS reference; [[minhashNearDups]]
  *     is the scale path (candidate count is bounded by LSH collisions,
  *     tunable via bands×rows).
  *   - [[simhash]]: computed per-row with array HOFs — zero shuffle; the
  *     banded hamming join ([[simhashNearDups]]) shuffles only
  *     (chunk, chunkValue) keys (pigeonhole: hamming ≤ k ⟹ equal in ≥1 of
  *     k+1 chunks).
  *
  * Caching contract: [[jaccardPairs]], [[lshCandidates]] and
  * [[simhashNearDups]] `.cache()` (MEMORY_AND_DISK) a small intermediate
  * that a self-join would otherwise re-derive per side. The cache lives
  * until the session drops it — callers running many operators in one
  * session (Verify/Bench do) should `spark.catalog.clearCache()` between
  * queries. At 100 TB the cached sets are the gram/band/chunk keys, not
  * the corpus: bounded by docs × grams-per-doc, spilling to disk.
  */
object TextDedup {

  /** Normalized text digest used for exact dedup. */
  def textDigest(text: Column): Column = md5(lower(text))

  /** One row per distinct text digest: group size + canonical (min) id. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(textDigest(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** Survivors of exact dedup: the canonical (min-id) row per digest. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ApplyChanges.latestByKey(
      df.withColumn("__digest", textDigest(col(textCol))),
      keys = Seq("__digest"),
      // max_by on negated id == min id; keeps the operator single-shuffle.
      sequenceBy = Seq(-col(idCol))
    ).drop("__digest")

  /** One row per doc with its DISTINCT word n-gram array — the shared
    * upstream stage every gram-based operator derives from (signatures,
    * gram joins, exploded gram sets), so a pipeline computes the
    * tokenize+n-gram work once instead of once per consumer.
    */
  def docGramArrays(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("dg_id"),
      array_distinct(wordNgrams(tokens(col(textCol)), n)).as("grams"))

  /** Distinct (id, gram) pairs of word n-grams. */
  def gramSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docGramArrays(df, idCol, textCol, n)
      .select(col("dg_id").as("gs_id"), explode(col("grams")).as("gram"))

  /** Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard ≥ minJaccard).
    * Output: (id_a, id_b, jaccard_fp) with jaccard_fp = floor(j*1e6).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double): DataFrame =
    jaccardPairsFromGrams(docGramArrays(df, idCol, textCol, n), minJaccard)

  /** [[jaccardPairs]] over a pre-computed (dg_id, grams) table — the
    * overload a pipeline that ALSO feeds [[signaturesFromGrams]] from the
    * same (cached) gram arrays should use, so tokenize+n-gram runs once
    * for both the exact reference and the LSH path instead of once per
    * consumer (q154's sweep previously re-grammed the corpus here).
    */
  def jaccardPairsFromGrams(gramArrays: DataFrame,
      minJaccard: Double): DataFrame = {
    val grams = gramArrays
      .select(col("dg_id").as("gs_id"), explode(col("grams")).as("gram"))
      .cache()
    val sizes = grams.groupBy("gs_id").agg(count(lit(1)).as("n_grams"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.gs_id") < col("b.gs_id"))
      .groupBy(col("a.gs_id").as("id_a"), col("b.gs_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("gs_id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(sizes.withColumnRenamed("gs_id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .withColumn("jaccard_fp",
        fp6(col("n_inter") / (col("na") + col("nb") - col("n_inter"))))
      .filter(col("jaccard_fp") >= math.floor(minJaccard * 1e6).toLong)
      .select("id_a", "id_b", "jaccard_fp")
  }

  /** Per-gram hash for MinHash function i: hash60(i || ':' || gram). */
  private def gramHash(i: Int, gram: Column): Column =
    hash60(concat(lit(s"$i:"), gram))

  /** MinHash signatures: (id, h0..h{k-1}), computed ROW-LOCALLY by the
    * native [[graft.functions.NativeExpressions.MinHashSig]] expression
    * over the doc's distinct gram array — no explode, no shuffle at all
    * (the aggregate formulation below shuffles one k-long row per doc;
    * this one shuffles nothing). Docs with no grams are dropped, matching
    * the aggregate semantics.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    signaturesFromGrams(docGramArrays(df, idCol, textCol, n), numHashes)

  /** [[minhashSignatures]] over a pre-computed (dg_id, grams) table —
    * lets a pipeline that also needs the gram arrays (e.g.
    * [[minhashNearDups]]' verification joins) reuse one shared stage.
    */
  def signaturesFromGrams(grams: DataFrame, numHashes: Int): DataFrame =
    grams.select(col("dg_id").as("mh_id"),
        graft.functions.NativeExpressions.minhashSig(col("grams"), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("mh_id") +:
        (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*)

  /** Aggregate reference implementation of [[minhashSignatures]]: min()
    * per hash over the exploded gram set (partial aggregation map-side).
    * Kept for cross-checking the native expression.
    */
  def minhashSignaturesAgg(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    gramSets(df, idCol, textCol, n)
      .groupBy(col("gs_id").as("mh_id"))
      .agg(
        min(gramHash(0, col("gram"))).as("h0"),
        (1 until numHashes).map(i => min(gramHash(i, col("gram"))).as(s"h$i")): _*)

  /** LSH band keys: (id, band, md5 of that band's signature slice). */
  def lshBands(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    // posexplode of one band-key array — a union of per-band selects would
    // recompute the signature aggregation once per band per join side
    sigs.select(col("mh_id"),
      posexplode(array((0 until bands).map(b =>
        md5(concat_ws(",", (0 until rows).map(r => col(s"h${b * rows + r}")): _*))): _*))
        .as(Seq("band", "band_key")))
  }

  /** Distinct candidate pairs (id_a < id_b) colliding in ≥1 LSH band.
    * The band table is cached: a self-join would otherwise re-evaluate
    * the whole signature pipeline (n-gram HOFs + k md5s per gram) once
    * per side.
    */
  def lshCandidates(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val bk = lshBands(sigs, numHashes, bands).cache()
    bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.mh_id") < col("b.mh_id"))
      .select(col("a.mh_id").as("id_a"), col("b.mh_id").as("id_b"))
      .distinct()
  }

  /** Candidate pairs for SEVERAL band configurations in ONE self-join.
    * All configs' band keys posexplode into a single (bands, band,
    * band_key) stream off the shared signature table — the same
    * one-array-instead-of-a-union move [[simhashNearDups]] documents as
    * a measured 12× win — so an S-curve sweep over k configs costs one
    * shuffled join instead of k sequential jobs. Output:
    * (bands, id_a, id_b), distinct per config (id_a < id_b).
    */
  def lshCandidatesMulti(sigs: DataFrame, numHashes: Int,
      bandConfigs: Seq[Int]): DataFrame = {
    val entries = bandConfigs.flatMap { b =>
      val rows = numHashes / b
      (0 until b).map { bi =>
        struct(lit(b.toLong).as("bands"), lit(bi).as("band"),
          md5(concat_ws(",",
            (0 until rows).map(r => col(s"h${bi * rows + r}")): _*))
            .as("band_key"))
      }
    }
    val banded = sigs
      .select(col("mh_id"), explode(array(entries: _*)).as("e"))
      .select(col("mh_id"), col("e.bands").as("bands"),
        col("e.band").as("band"), col("e.band_key").as("band_key"))
      .cache()
    banded.as("a").join(banded.as("b"),
        col("a.bands") === col("b.bands") && col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.mh_id") < col("b.mh_id"))
      .select(col("a.bands").as("bands"),
        col("a.mh_id").as("id_a"), col("b.mh_id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-dups, verified with exact n-gram Jaccard: candidates
    * from band collisions, then the true Jaccard only for those pairs —
    * computed by the native
    * [[graft.functions.NativeExpressions.ArrayJaccardFp6]] over the two
    * docs' gram ARRAYS (two small keyed joins), instead of re-exploding
    * the full gram set through a shuffle. Values are identical to the
    * count-based formulation the DuckDB oracle uses.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String, n: Int,
      numHashes: Int, bands: Int, minJaccard: Double): DataFrame = {
    // ONE shared gram-array stage feeds the signature pipeline AND both
    // verification joins (previously tokenized+grammed 3×); cached
    // because three consumers would otherwise re-derive it per branch
    val grams = docGramArrays(df, idCol, textCol, n).cache()
    val sigs  = signaturesFromGrams(grams, numHashes)
    val cands = lshCandidates(sigs, numHashes, bands)
    val docGrams = grams.filter(size(col("grams")) > 0)
    cands
      .join(docGrams.select(col("dg_id").as("id_a"), col("grams").as("ga")), "id_a")
      .join(docGrams.select(col("dg_id").as("id_b"), col("grams").as("gb")), "id_b")
      .withColumn("jaccard_fp",
        graft.functions.NativeExpressions.arrayJaccardFp6(col("ga"), col("gb")))
      .filter(col("jaccard_fp") >= math.floor(minJaccard * 1e6).toLong)
      .select("id_a", "id_b", "jaccard_fp")
  }

  /** Powers of two 2^0..2^59 as a literal array (bit tricks without
    * column-valued shift, which `functions.shiftleft` doesn't take).
    */
  private val pow2: Column = array((0 until 60).map(b => lit(1L << b)): _*)

  /** 60-bit SimHash over lower-cased token OCCURRENCES (term-frequency
    * weighted) — one pass per row, no explode, no shuffle. Occurrence
    * weighting matters: set-based simhash saturates on small vocabularies
    * (every long doc hashes alike), while tf-weighted bits discriminate by
    * token counts.
    *
    * Evaluated by the native [[graft.functions.NativeExpressions.SimHash60]]
    * Catalyst expression (tight JVM loop); [[simhashHof]] is the
    * bit-identical HOF reference it is tested against.
    */
  def simhash(text: Column): Column =
    graft.functions.NativeExpressions.simhash60(tokens(text))

  /** HOF reference implementation of [[simhash]] (interpreted, ~100×
    * slower; kept for cross-checking the native expression).
    */
  def simhashHof(text: Column): Column = {
    // Hash each token ONCE up front — referencing hash60(t) inside the
    // per-bit lambda would inline (and re-evaluate) the md5 60× per token.
    val hashes = transform(tokens(text), t => hash60(t))
    // counts[b] = #tokens with bit b set − #tokens with bit b clear
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), 60),
      (acc, h) =>
        zip_with(acc,
          transform(sequence(lit(0), lit(59)),
            // bit test via AND with 2^b — Column./ would be double division
            // and lose the low bits of a 60-bit hash
            b => when(h.bitwiseAND(element_at(pow2, b + 1)) =!= 0, 1)
              .otherwise(-1)),
          (x, y) => x + y))
    aggregate(
      transform(sequence(lit(0), lit(59)),
        b => when(element_at(counts, b + 1) > 0, element_at(pow2, b + 1))
          .otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc + v)
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming, found by banding the
    * 60-bit hash into (maxHamming+1) chunks and joining on equal chunks
    * (pigeonhole), then verifying with bit_count(xor).
    * Output: (id_a, id_b, hamming).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame =
    hammingNearDups(
      df.select(col(idCol).as("sh_id"), simhash(col(textCol)).as("sh")),
      "sh_id", "sh", maxHamming)

  /** Banded Hamming self-join over ANY precomputed 60-bit signature
    * column — the generic tail of [[simhashNearDups]], reused by the
    * codec-free multimodal near-dup (byte-window signatures,
    * [[graft.multimodal.Multimodal.byteSimhash]]). Pigeonhole: two
    * signatures with hamming ≤ k agree on ≥1 of the k+1 chunks.
    */
  def hammingNearDups(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 60 / chunks // requires chunks | 60 for full coverage of low bits
    val sh = sigs.select(col(idCol).as("sh_id"), col(sigCol).as("sh"))
    // posexplode ONE array of chunk values instead of a union of per-chunk
    // branches — a union would re-evaluate the whole simhash subtree once
    // per chunk per join side (measured 12× overcomputation)
    val banded = sh.select(col("sh_id"), col("sh"),
        posexplode(array((0 until chunks).map(c =>
          shiftright(col("sh"), c * bitsPer)
            .bitwiseAND(lit((1L << bitsPer) - 1))): _*))
          .as(Seq("chunk", "chunk_val")))
      .cache()
    banded.as("a").join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
          col("a.sh_id") < col("b.sh_id"))
      .select(col("a.sh_id").as("id_a"), col("b.sh_id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document repeated-span flags — the span-granular form of
    * exact substring dedup (q121 detects with it, q129 strips): every
    * word `n`-gram position of every doc (with ≥ n tokens), flagged
    * `dup` when the gram's hash occurs in MORE THAN ONE document.
    * Within-doc repeats alone never flag (that's repetition scoring's
    * business, not corpus duplication).
    *
    * Output: (id, n_tokens, pos, gk, dup) — pos 0-based, gk =
    * hash60(gram). The stream carries fixed-width longs only (never
    * the gram string) through ONE shuffle keyed by gram hash, where a
    * whole-partition min/max window marks cross-doc hashes: two longs
    * of state per gram no matter how hot the gram (a distinct+join-back
    * or collect_set formulation degrades on boilerplate grams). The
    * result is cached — both q121 consumers (span counts, coverage)
    * and the q129 strip read it more than once.
    */
  def spanFlags(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val wGk = org.apache.spark.sql.expressions.Window.partitionBy("gk")
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .withColumn("n_tokens", size(col("ts")).cast("long"))
      .filter(col("n_tokens") >= n)
      .select(col("id"), col("n_tokens"),
        posexplode(wordNgrams(col("ts"), n)).as(Seq("pos", "gram")))
      .select(col("id"), col("n_tokens"), col("pos"),
        hash60(col("gram")).as("gk"))
      .withColumn("dup", min("id").over(wGk) =!= max("id").over(wGk))
      .cache()
  }

  /** Distinct 0-based token positions of `id` covered by some
    * cross-doc duplicated span from [[spanFlags]] output. */
  def spanCoverage(flags: DataFrame, n: Int): DataFrame =
    flags.filter(col("dup"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
}
