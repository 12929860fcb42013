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
}
