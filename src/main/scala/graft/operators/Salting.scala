package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are the
  * explicit, plan-level tools for when skew is KNOWN (a hot item_id, a
  * celebrity user) and deterministic two-phase aggregation or replicated
  * joins beat runtime re-planning:
  *
  *   - [[saltedAggregate]]: two-phase aggregation — rows get one of
  *     `saltBuckets` deterministic salts, phase 1 aggregates on
  *     (key, salt) spreading a hot key over `saltBuckets` reducers,
  *     phase 2 merges per key. Correct for decomposable aggregates
  *     (sum/count/min/max — the caller supplies both phases).
  *   - [[replicateForSkewJoin]]: salt the big skewed side, replicate the
  *     small side once per salt, join on (key, salt) — a hot key's rows
  *     land on `saltBuckets` tasks instead of one.
  *
  * The salt is `pmod(hash(idCols), saltBuckets)` — deterministic given
  * the row, so results are reproducible run to run (no rand()).
  */
object Salting {

  def withSalt(df: DataFrame, idCols: Seq[Column], saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(idCols: _*), lit(saltBuckets)))

  /** Two-phase salted aggregation.
    *
    * @param phase1 aggregates within (keys :+ salt) — e.g. partial sums
    * @param phase2 merges phase-1 rows per keys — e.g. sum of sums
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], idCols: Seq[Column],
      saltBuckets: Int, phase1: Seq[Column], phase2: Seq[Column]): DataFrame =
    withSalt(df, idCols, saltBuckets)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)

  /** Salt the (big, skewed) left side and replicate the (small) right
    * side across all salt values; join on keys + salt.
    */
  def replicateForSkewJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], idCols: Seq[Column], saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = withSalt(big, idCols, saltBuckets)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
