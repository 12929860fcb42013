package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators for dedup pipelines.
  *
  * [[connectedComponents]] turns near-dup PAIRS (the q13/q14/q15/q21
  * operators' output) into dedup CLUSTERS — the step that makes pair
  * output actionable: pick one canonical document per component, drop the
  * rest. Implemented as iterative min-label propagation in pure DataFrame
  * ops:
  *
  *   label(v) ← min(label(v), min over neighbors u of label(u))
  *
  * Each round is one equi-join (edges × labels, shuffle keyed by vertex
  * id) plus one min-aggregation with map-side partial aggregation; rounds
  * needed = component diameter. Near-dup components are small and dense
  * (duplicates of a common source document), so the loop converges in a
  * handful of rounds. Convergence is detected with the label SUM: labels
  * only ever decrease, so an unchanged Σlabel certifies the fixed point —
  * one scalar aggregate per round instead of a row-level change join.
  *
  * 100 TB notes: every round is partition-parallel and keyed by vertex
  * id — nothing is collected to the driver; the per-round result is
  * cached (and the previous round unpersisted) so lineage doesn't
  * re-derive earlier rounds. For adversarial long-chain graphs use
  * [[connectedComponentsStar]] (alternating large-star/small-star),
  * which converges in O(log n) rounds with the same per-round plan
  * shape — near-dup graphs never need it because their diameter is
  * bounded by the dedup cluster size.
  */
object GraphOps {

  /** When set, iterative loops truncate lineage with RELIABLE
    * checkpoints written to this directory instead of eager
    * `localCheckpoint`. localCheckpoint stores the truncated lineage's
    * data in executor memory/disk — right for local mode and cheap on
    * a healthy cluster, but the truncated lineage is GONE, so losing
    * an executor mid-loop fails the job instead of recomputing. At
    * cluster scale point this at a reliable filesystem (HDFS/object
    * store).
    *
    * CONTRACT: configuring this TAKES OVER the SparkContext-global
    * checkpoint directory (`sc.setCheckpointDir`) for the session —
    * there is exactly one such dir per context, so an application
    * that sets its own must either share this root or leave the conf
    * unset. Each loop deletes the previous round's checkpoint files
    * as soon as the next round's are materialized (see [[Truncator]]),
    * so steady-state reliable-FS footprint is ~2 rounds of the loop's
    * working set, not rounds×size; only the FINAL round's files
    * outlive the loop (the returned DataFrame still reads them) —
    * give the root a job-scoped lifetime for those.
    */
  val CheckpointDirConf = "spark.graft.graph.checkpointDir"

  /** `(configured root, the exact UUID dir setCheckpointDir minted
    * for it)` — truncate() recognizes its own dir by EQUALITY against
    * the remembered value, never by substring matching (an
    * application dir that merely contains the root as a substring,
    * e.g. `/data/ckpt-app` vs root `/data/ckpt`, must not be mistaken
    * for ours).
    */
  @volatile private var ownedCkptDir: Option[(String, String)] = None

  private def ensureCheckpointDir(spark: org.apache.spark.sql.SparkSession,
      root: String): Unit = GraphOps.synchronized {
    val sc = spark.sparkContext
    val ok = ownedCkptDir.exists { case (r, minted) =>
      r == root && sc.getCheckpointDir.contains(minted) }
    if (!ok) {
      // setCheckpointDir mints a fresh UUID subdirectory per call —
      // set once per configured root, remember exactly what it minted
      sc.setCheckpointDir(root)
      ownedCkptDir = Some((root, sc.getCheckpointDir.get))
    }
  }

  /** Per-loop eager lineage truncation: reliable `checkpoint(true)`
    * into [[CheckpointDirConf]] when configured, else eager
    * localCheckpoint with serialized storage (see the storage-level
    * rationale at the call sites).
    *
    * On the reliable path each call, once the NEW checkpoint is
    * materialized (checkpoint(true) is eager), deletes the PREVIOUS
    * call's checkpoint files — their lineage is no longer referenced
    * by anything (each round's plan reads only its own checkpoint) —
    * mirroring GraphFrames' checkpoint-interval cleanup. Without this
    * a 40-round loop leaves ~40 dataset copies on the reliable FS
    * (ContextCleaner only helps with cleanCheckpoints=true and after
    * GC). The deleted path is read off the returned plan's own RDD
    * (`LogicalRDD.rdd.getCheckpointFile`), never a directory diff, so
    * concurrent loops sharing the root can't delete each other's
    * files; if the plan shape is unrecognized, cleanup is skipped
    * (safe, just unclean).
    */
  private final class Truncator(spark: org.apache.spark.sql.SparkSession) {
    private val root = spark.conf.get(CheckpointDirConf, "")
    private var prev: Option[org.apache.hadoop.fs.Path] = None

    private def ckptFileOf(df: DataFrame): Option[String] =
      df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.getCheckpointFile
        case _ => None
      }

    def apply(df: DataFrame): DataFrame =
      if (root.isEmpty) df.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      else {
        ensureCheckpointDir(spark, root)
        val out = df.checkpoint(true)
        prev.foreach { p =>
          try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
          catch { case _: java.io.IOException => () } // cleanup only
        }
        prev = ckptFileOf(out).map(new org.apache.hadoop.fs.Path(_))
        out
      }
  }

  /** Connected components of an undirected graph.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst`; interpreted as undirected
    * @param maxIter  safety bound on propagation rounds
    * @return (id, component) with component = min reachable vertex id
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    // cached: every propagation round joins against the edge set — an
    // uncached `sym` re-derives the caller's whole edge pipeline (for
    // q53 that is the full MinHash+LSH candidate/verify chain) once per
    // round per reference. Session caches are cleared between harness
    // queries (TextDedup's caching contract).
    // serialized storage: the loop's working set lives for many rounds
    // inside much larger suite/session working sets — serialized blocks
    // hold one object per partition instead of one per row, which keeps
    // the loop's GC and eviction footprint flat under outside pressure
    // (the round-11 bench campaign measured bimodal q53 runs whose
    // inflation tracked collection pressure, not plan changes)
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // Only edge-touched vertices can ever change label — iterate over
    // that (typically tiny) set and union the untouched rest back as
    // singletons at the end. For near-dup graphs this shrinks each
    // round from |corpus| to |docs with a near-dup|. Seeds are
    // restricted to the caller's vertex set so component ids are always
    // member vertex ids, even when edges mention ids outside `vertices`
    // (such endpoints still act as connectivity conduits, but never
    // label a component or appear in the output).
    val touched = sym.select(col("src").as("id")).distinct()
      .join(vertices.select(col("id")), Seq("id"), "left_semi")
    val truncate = new Truncator(vertices.sparkSession)
    var labels = touched.select(col("id"), col("id").as("label")).cache()
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val fromNeighbors = sym
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      // truncate (eager) CUTS LINEAGE, not just caches: the round's
      // plan references `labels` twice (union + join), so without
      // truncation the logical plan doubles per round and explodes on
      // deep graphs. Set [[CheckpointDirConf]] to make the truncation
      // RELIABLE (survives executor loss) at cluster scale.
      val next = truncate(labels.unionByName(fromNeighbors)
        .groupBy("id").agg(min("label").as("label")))
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      round += 1
    }
    // silent truncation would return split clusters that diverge from
    // any exact oracle with nothing pointing at the round budget
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds the budget); raise maxIter or " +
          "switch to large-star/small-star for long-chain graphs")
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }

  /** Σlabel — strictly decreasing while any label changes (labels are
    * monotone non-increasing), so equality across rounds ⟺ fixed point.
    */
  private def labelSum(labels: DataFrame): Long =
    labels.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)

  /** Connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log n)-round algorithm for graphs whose DIAMETER breaks
    * min-label propagation ([[connectedComponents]] needs diameter
    * rounds; a 200-node chain needs 200). Near-dup graphs never need
    * this (clusters are small and dense); long-chain graphs — entity
    * resolution, web-link components — do.
    *
    * Per round, both stars are one groupBy(min) + one equi-join over
    * the CURRENT edge set (which only shrinks toward stars), all
    * partition-parallel and keyed by vertex id:
    *   - large-star: every neighbor v > u links to m(u) = min(Γ(u)∪{u})
    *     — long chains halve;
    *   - small-star: with edges directed hi→lo, every lo-neighbor and u
    *     itself link to the smallest lo-neighbor — stars flatten onto
    *     the true minimum.
    * Both steps preserve connectivity and never create cross-component
    * edges, so the fixed point (edge-set signature unchanged: count +
    * order-independent hash sum) is exactly the star forest whose
    * centers are component minima. Output matches
    * [[connectedComponents]] row-for-row (spec-proven on random graphs
    * and on chains past label-propagation's budget).
    */
  def connectedComponentsStar(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 30): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    // order-independent signature: equal across rounds ⟺ identical set
    // (count + XOR-fold of per-edge hashes — XOR, not sum: ANSI mode
    // makes a long hash sum overflow. A collision would need two edge
    // SETS with equal size and equal 64-bit XOR — not a correctness
    // risk worth a full anti-join per round)
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(lo, hi))"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    val truncate = new Truncator(vertices.sparkSession)
    var e = truncate(
      canon(edges.select(col("src").as("a"), col("dst").as("b"))))
    var prev = sig(e)
    var converged = prev._1 == 0L
    var round = 0
    while (!converged && round < maxIter) {
      // large-star over the symmetric neighborhood
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))
      val mL = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val ls = canon(sym.join(mL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
      // small-star on the hi→lo orientation of the large-star output
      val inc = ls.select(col("hi").as("u"), col("lo").as("v"))
      val mS = inc.groupBy("u").agg(min(col("v")).as("m")) // m < u always
      val ss = inc.join(mS, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionByName(mS.select(col("u").as("a"), col("m").as("b")))
      val next = truncate(canon(ss))
      e.unpersist()
      val s = sig(next)
      converged = s == prev
      prev = s
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixed point = star forest: hi nodes link straight to their
    // component-min center; centers and singletons label themselves
    val labels = e.select(col("hi").as("id"), col("lo").as("label"))
      .groupBy("id").agg(min(col("label")).as("label"))
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }

  /** Fixed-iteration PageRank in all-integer fixed-point arithmetic —
    * centrality over the near-dup (or any) graph, engine-exact so the
    * scores themselves can be hash-checked against an external oracle.
    *
    * Per iteration, with `S = scaleFp` and damping 0.85 kept as the
    * rational 85/100:
    *
    *   pr'(v) = (15·S) div (100·N)  +  (85 · Σ_{(u,v)∈E} pr(u) div outdeg(u)) div 100
    *
    * All divisions are integer floor on non-negative longs, and every
    * per-vertex sum is order-independent, so the result is bit-identical
    * across engines and partitionings. Dangling mass (vertices with no
    * out-edges) simply evaporates — the standard simplification; with
    * S = 1e12 no intermediate exceeds 8.5e13, far inside long range.
    *
    * Scale shape: `edges ⋈ outdeg` is computed once and cached (the
    * static part); each iteration is one shuffle of the rank table keyed
    * by src plus one partial-aggregated sum keyed by dst — the standard
    * Pregel round, nothing driver-side. The constants row (N-derived)
    * rides a 1-row broadcast crossJoin. Lineage grows linearly with
    * `iterations`; callers running many rounds should localCheckpoint
    * every few iterations like [[connectedComponentsStar]] does.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst` — DIRECTED (union both
    *                 directions for an undirected graph)
    * @return (id, out_degree, pr_fp) — pr_fp on the scaleFp scale
    */
  def pageRankFp(vertices: DataFrame, edges: DataFrame, iterations: Int,
      scaleFp: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "pageRankFp: iterations must be >= 1")
    // the vertex set is read by pr0 AND by every iteration's left join
    // (the base term for rank-sink-free vertices); cached so the rank
    // loop never re-derives the upstream vertex scan
    val verts = vertices.select(col("id")).cache()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val ewd = edges.join(deg, "src").cache() // static across iterations
    val consts = verts.agg(count(lit(1)).as("n"))
      .select(expr(s"CAST($scaleFp div n AS BIGINT)").as("init_fp"),
        expr(s"CAST((15 * $scaleFp) div (100 * n) AS BIGINT)").as("base_fp"))
    var pr = verts.crossJoin(broadcast(consts))
      .select(col("id"), col("init_fp").as("pr_fp"))
    for (_ <- 1 to iterations) {
      val contribs = ewd
        .join(pr.select(col("id").as("src"), col("pr_fp")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("pr_fp div d")).as("s"))
      pr = verts.crossJoin(broadcast(consts))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          expr("CAST(base_fp + (85 * coalesce(s, CAST(0 AS BIGINT))) div 100 AS BIGINT)")
            .as("pr_fp"))
    }
    pr.join(deg.select(col("src").as("id"), col("d")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("d"), lit(0L)).as("out_degree"), col("pr_fp"))
  }
}
