package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the DLT
  * `@dlt.expect / expect_or_drop / expect_or_fail` contract
  * re-expressed on open Spark: named boolean rules evaluated row-local
  * in ONE pass, violation metrics published through Spark's native
  * `observe` channel so counting rides the caller's own action
  * (NO second scan of the data — the property that matters when the
  * gated table is 100 TB), and the gate itself is a plain filter that
  * fuses into whole-stage codegen with whatever else reads the rows.
  *
  * Metric surfaces per execution mode:
  *   - batch: [[observedGate]] returns an [[Observation]] — metrics
  *     block-resolve after the caller's first action;
  *   - streaming: [[streamingGate]] uses a NAMED observe — metrics
  *     arrive per micro-batch in `StreamingQueryProgress
  *     .observedMetrics` (spec-proven under AvailableNow);
  *   - oracle/batch-agg: [[ruleReport]] computes the same counts as a
  *     plain aggregate (one row per rule + the all-pass row) for
  *     hash-checkable reporting.
  */
object Expectations {

  /** A named expectation: rows where `predicate` is false VIOLATE the
    * rule. Null predicate results count as violations (a rule that
    * cannot evaluate did not pass — DLT's semantics).
    */
  final case class Rule(name: String, predicate: Column) {
    def passes: Column = coalesce(predicate, lit(false))
  }

  /** All-rules-pass predicate (true when `rules` is empty). */
  def allPass(rules: Seq[Rule]): Column =
    rules.map(_.passes).reduceOption(_ && _).getOrElse(lit(true))

  /** expect_or_drop: keep only rows passing EVERY rule. */
  def dropFailed(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(allPass(rules))

  /** The observe-channel metric columns: total rows plus one violation
    * count per rule (metric names: `n_input`, `viol_<rule>`).
    */
  def metricCols(rules: Seq[Rule]): Seq[Column] =
    count(lit(1)).as("n_input") +: rules.map(r =>
      sum(when(!r.passes, 1L).otherwise(0L)).as(s"viol_${r.name}"))

  /** expect_or_drop WITH metrics, batch: the returned [[Observation]]
    * resolves after the caller's first action on the gated frame —
    * violation counts cost no extra scan.
    */
  def observedGate(df: DataFrame,
      rules: Seq[Rule]): (DataFrame, Observation) = {
    val obs = Observation()
    val metered = df.observe(obs,
      metricCols(rules).head, metricCols(rules).tail: _*)
    (dropFailed(metered, rules), obs)
  }

  /** expect_or_drop WITH metrics, streaming: named observe — read
    * `progress.observedMetrics.get(name)` per micro-batch.
    */
  def streamingGate(df: DataFrame, rules: Seq[Rule],
      name: String): DataFrame =
    dropFailed(
      df.observe(name, metricCols(rules).head, metricCols(rules).tail: _*),
      rules)

  /** expect_or_fail: one validating aggregate; throws (naming the
    * first violated rules and their counts) when any row violates.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): Unit = {
    if (rules.isEmpty) return
    val row = df.agg(metricCols(rules).tail.head,
      metricCols(rules).tail.tail: _*).head
    val bad = rules.zipWithIndex
      .map { case (r, i) => r.name -> row.getLong(i) }
      .filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "Expectations violated: " +
          bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
  }

  /** Rule-violation provenance column: the sorted array of FAILED rule
    * names for each row (empty array = row passes every rule).
    * Row-local — array_sort over a handful of rule literals fuses into
    * codegen with the predicates themselves.
    */
  def violationsCol(rules: Seq[Rule]): Column =
    array_sort(filter(
      array(rules.map(r =>
        when(!r.passes, lit(r.name)).otherwise(lit(null))): _*),
      _.isNotNull))

  /** expect-or-quarantine: split into (passing, quarantined) frames —
    * quarantined rows carry `_violations`, the sorted failed-rule
    * names, so the quarantine table is debuggable without re-running
    * the rules. Both frames derive from one annotated plan; like DLT's
    * own quarantine pattern the two SINKS are two actions, so a caller
    * writing both should persist `df` (or route via foreachBatch) —
    * the split itself adds no shuffle.
    */
  def quarantine(df: DataFrame,
      rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = df.withColumn("_violations", violationsCol(rules))
    (annotated.filter(size(col("_violations")) === 0).drop("_violations"),
      annotated.filter(size(col("_violations")) > 0))
  }

  /** Streaming expect-or-quarantine: every micro-batch is split once
    * ([[quarantine]]) and routed to TWO managed tables — passing rows
    * to `validDir` (caller's schema), violating rows to
    * `quarantineDir` WITH the `_violations` provenance column. Both
    * tables ACCUMULATE across batches
    * ([[graft.sources.ManagedTable.idempotentAppend]]: append mode
    * under a per-table `b<batchId>` tag), so a replayed batch after a
    * crash — even one that died BETWEEN the two commits — lands
    * exactly once per table. The batch is persisted across the two
    * routed writes: the split is two filters over one cached
    * annotation pass, not two source re-reads.
    * Start with `.option("checkpointLocation", …)` and any trigger.
    */
  def quarantineStreamingSink(stream: DataFrame, rules: Seq[Rule],
      validDir: String, quarantineDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val M = graft.sources.ManagedTable
        val annotated = batch
          .withColumn("_violations", violationsCol(rules)).persist()
        try {
          M.idempotentAppend(annotated
            .filter(size(col("_violations")) === 0)
            .drop("_violations"), validDir, batchId)
          M.idempotentAppend(annotated
            .filter(size(col("_violations")) > 0), quarantineDir, batchId)
          ()
        } finally { annotated.unpersist(); () }
    }

  /** Hash-checkable audit report, ONE aggregate pass: a row per rule
    * (n_failed / n_passed / pass_fp6) plus the `zz_all_pass` row
    * counting rows passing every rule (named to sort last). The
    * DLT-event-log shape, as data.
    */
  def ruleReport(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      sum(when(allPass(rules), 1L).otherwise(0L)).as("all_ok") +:
      rules.map(r => sum(when(r.passes, 1L).otherwise(0L)).as(s"ok_${r.name}"))
    val entries = rules.map(r =>
      struct(lit(r.name).as("rule"),
        (col("n") - col(s"ok_${r.name}")).as("n_failed"),
        col(s"ok_${r.name}").as("n_passed"),
        expr(s"CAST((ok_${r.name} * 1000000) div n AS BIGINT)")
          .as("pass_fp6"))) :+
      struct(lit("zz_all_pass").as("rule"),
        (col("n") - col("all_ok")).as("n_failed"),
        col("all_ok").as("n_passed"),
        expr("CAST((all_ok * 1000000) div n AS BIGINT)").as("pass_fp6"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select("e.rule", "e.n_failed", "e.n_passed", "e.pass_fp6")
      .orderBy("rule")
  }
}
