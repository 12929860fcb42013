package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus budget allocation: distribute a total token budget across
  * domains/sources so no domain exceeds what it has.
  *
  * This is the "how much of each domain can I actually take" step that
  * precedes mixture sampling when targets overshoot small domains —
  * the reference's corpus-mixture queries assume feasible targets;
  * this computes the feasible allocation.
  */
object CorpusBudget {

  /** WATER-FILLING allocation: `alloc = min(avail, λ)` with the water
    * level λ chosen so `Σ alloc = budget` (up to integer-floor slack);
    * if `budget ≥ Σ avail` every row is saturated at `avail`.
    *
    * The classic algorithm — sort by avail, walk until the candidate
    * level fits — runs as window functions over `avails`, which is
    * expected to be TINY (one row per domain: the output of a grouped
    * aggregation over the corpus, |domains| rows). The single-partition
    * window is a driver-scale triviality by construction, not a data
    * shuffle; λ is integer floor division end-to-end (engine-exact),
    * and the 1-row λ joins back as a broadcast.
    *
    * Input: `avails` with a string key column `keyCol` and a long
    * availability column `availCol`. Output columns:
    * `keyCol, availCol, alloc, saturated` (longs; saturated 1/0).
    */
  def waterFill(avails: DataFrame, keyCol: String, availCol: String,
      budget: Long): DataFrame = {
    val key: Column = col(keyCol)
    val avail: Column = col(availCol)
    val w = graft.BoundedWindow.orderBy(col(availCol), col(keyCol))
    val cand = avails.select(key, avail,
        row_number().over(w).as("rn"),
        count(lit(1)).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("n"),
        coalesce(sum(avail).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)).as("pa"))
      .withColumn("lam_i", expr(s"($budget - pa) div (n - rn + 1)"))
      .cache() // λ search + final allocation both read it: one input pass
    // the FIRST row (smallest rn) whose candidate level fits defines
    // the water level; no row fits iff budget >= total avail
    val lam = cand.filter(col("lam_i") <= avail)
      .agg(min_by(col("lam_i"), col("rn")).as("lam"))
    cand.crossJoin(broadcast(lam))
      .select(key, avail,
        when(col("lam").isNull || avail <= col("lam"), avail)
          .otherwise(col("lam")).as("alloc"),
        when(col("lam").isNull || avail <= col("lam"), 1L)
          .otherwise(0L).as("saturated"))
  }
}
