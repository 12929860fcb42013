package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply-changes: maintain the latest row per key from a changelog,
  * honoring a sequencing column and delete tombstones.
  *
  * Re-expresses DLT `dlt.apply_changes(target=…, keys=…, sequence_by=…,
  * apply_as_deletes=…, except_column_list=…)` — the one operator in the
  * reference with no single Spark built-in
  * (reference: notebooks/03_Data_Ingestion.py:318-326).
  *
  * Two batch strategies, both pure DataFrame API so Catalyst plans them:
  *
  *   - [[latestByKey]] (default): `max_by(struct(payload), struct(seq))`
  *     hash aggregation. This does PARTIAL aggregation map-side before the
  *     shuffle, so at 100 TB each executor ships at most one candidate row
  *     per distinct key instead of every change row — strictly less shuffle
  *     IO than a window sort, and no per-partition full sort.
  *
  *   - [[latestByKeyWindow]]: `row_number() OVER (PARTITION BY keys ORDER BY
  *     seq DESC) = 1`. Shuffles every row and sorts per partition; kept as a
  *     cross-check implementation and for when the full ordered history per
  *     key is needed anyway.
  *
  * Determinism contract: callers must make the sequence total (append
  * tie-breakers, e.g. an offset/id column) — with duplicate sequence values
  * `max_by` picks an arbitrary winner, exactly like DLT's `sequence_by`.
  */
object ApplyChanges {

  /** Latest row per key as a single hash aggregation (partial+final). */
  def latestByKey(source: DataFrame, keys: Seq[String], sequenceBy: Seq[Column]): DataFrame = {
    val payload = struct(source.columns.map(col).toSeq: _*)
    val seq     = struct(sequenceBy: _*)
    source
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, seq).as("__latest"))
      .select(col("__latest.*"))
  }

  /** Window-based variant (row_number over keys ordered by seq desc). */
  def latestByKeyWindow(source: DataFrame, keys: Seq[String], sequenceBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(sequenceBy.map(_.desc): _*)
    source
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full apply-changes: latest per key, then drop tombstoned keys and
    * bookkeeping columns. `deleteExpr` is evaluated on the WINNING row per
    * key (same as DLT: a tombstone only deletes if it is the latest change).
    */
  def applyChanges(
      source: DataFrame,
      keys: Seq[String],
      sequenceBy: Seq[Column],
      deleteExpr: Column = lit(false),
      exceptColumns: Seq[String] = Nil): DataFrame =
    latestByKey(source, keys, sequenceBy)
      .filter(!coalesce(deleteExpr, lit(false)))
      .drop(exceptColumns: _*)

  /** SCD type-2 apply-changes: the `stored_as_scd_type = 2` half of the
    * DLT API [[applyChanges]] covers type 1 of — instead of keeping only
    * each key's latest row, emit the full VERSION HISTORY with
    * `__start_at` / `__end_at` validity bounds (end = null for the open
    * version), the table a point-in-time (AS-OF) feature join probes.
    *
    * Semantics (out-of-order safe — order comes from `sequenceBy`, not
    * arrival):
    *   - a change row opens a new version when its tracked payload
    *     differs from the key's previous surviving state (or the key was
    *     absent/deleted); consecutive changes with an IDENTICAL tracked
    *     payload collapse into the open version rather than bumping it;
    *   - a delete tombstone closes the open version at its sequence and
    *     opens nothing (consecutive tombstones collapse);
    *   - every opened version's `__end_at` is the NEXT change point's
    *     sequence, whatever its kind.
    *
    * Plan shape: two window passes over the same (keys × sequence) sort
    * order — Spark reuses the single sort-shuffle for both — then a
    * filter; nothing quadratic, state is never collected. Payload
    * comparison uses null-safe struct equality (`<=>`), which is exact
    * (no arithmetic), so the version boundaries are engine-reproducible.
    */
  def applyChangesScd2(
      source: DataFrame,
      keys: Seq[String],
      sequenceBy: Seq[Column],
      deleteExpr: Column = lit(false),
      exceptColumns: Seq[String] = Nil): DataFrame = {
    val seqCols = sequenceBy.zipWithIndex
      .map { case (c, i) => c.as(s"__seq$i") }
    val seqNames = sequenceBy.indices.map(i => s"__seq$i")
    val tracked = source.columns.toSeq
      .diff(keys).diff(exceptColumns)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqNames.map(col): _*)
    val payload = struct(tracked.map(col): _*)
    val rows = source
      .withColumn("__is_del", coalesce(deleteExpr, lit(false)))
      .select((keys.map(col) ++ tracked.map(col) ++ seqCols
        :+ col("__is_del")): _*)
      .withColumn("__prev_del", lag(col("__is_del"), 1).over(w))
      .withColumn("__prev_pay", lag(payload, 1).over(w))
      // change point: first row of the key, any delete after a live
      // version, or an upsert whose payload differs from the previous
      // ROW's (after a delete the payload check is moot — prev_del wins)
      .withColumn("__chg",
        col("__prev_del").isNull ||
          (col("__is_del") && !col("__prev_del")) ||
          (!col("__is_del") &&
            (col("__prev_del") || !(payload <=> col("__prev_pay")))))
      .filter(col("__chg"))
    val start = struct(seqNames.map(col): _*)
    rows
      .withColumn("__start", start)
      .withColumn("__end", lead(start, 1).over(w))
      .filter(!col("__is_del"))
      .select((keys.map(col) ++ tracked.map(col)
        :+ col("__start") :+ col("__end")): _*)
  }
}
