package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** AS-OF join — for each left row, the LATEST right row with
  * `right.ts <= left.ts` on the same key. Spark has no built-in for
  * this; the naive formulation is a range join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-pair max) whose
  * intermediate explodes with history length.
  *
  * This implementation is the scale-right single-shuffle shape:
  * UNION both sides tagged (right sorts before left at equal ts, so
  * the match is inclusive), ONE window sort per key, forward-fill the
  * right payload with `last(..., ignoreNulls)` over the running frame,
  * keep the left rows. Cost is sort-shuffle of |L|+|R| rows — linear,
  * no pairwise blowup, and the window frame is running (streaming
  * evaluation, no per-partition materialization of history).
  *
  * Contract: `right` must be unique per (keys, rightTs) — pre-aggregate
  * if it is not (ties would make "the" latest row ambiguous). Left rows
  * with no prior right row get NULL right columns (LEFT as-of).
  */
object AsOfJoin {

  /** left(keys…, leftTs, …) ⟕asof right(keys…, rightTs, payload…) →
    * left.* + right payload columns.
    *
    * `direction` (pandas `merge_asof` surface, all inclusive):
    *   - `"backward"` (default): latest right with ts <= left.ts;
    *   - `"forward"`: earliest right with ts >= left.ts — the SAME
    *     single-shuffle union+fill, with the window ordered
    *     descending (among "preceding" rows in a descending stream,
    *     the last right row seen is the smallest ts >= left.ts);
    *   - `"nearest"`: whichever of the two candidates has the smaller
    *     |ts gap|, ties → backward (both fills run over the one
    *     sorted union — still one shuffle).
    *
    * `toleranceUs` (pandas `tolerance`): when set, the selected match
    * is rejected (NULL payload) if its |ts gap| exceeds the bound —
    * applied AFTER direction selection, row-local, so under `nearest`
    * a too-far nearest candidate does not fall back to the farther
    * side (pandas semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"AsOfJoin.asOf: unknown direction '$direction'")
    toleranceUs.foreach(t => require(t >= 0,
      s"AsOfJoin.asOf: negative tolerance $t"))
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTs)
    // the union plan owns these names: keys surface alongside them in
    // the tagged select, and the right payload struct injects __rts —
    // a user column named __rts would duplicate the struct field and
    // fail far away as an ambiguous col("__filled.__rts") reference
    val reserved = Set("__ts", "__side", "__lp", "__rp",
      "__filled", "__fb", "__ff", "__rts")
    val clash = (keys ++ rPayload).filter(reserved)
    require(clash.isEmpty,
      s"AsOfJoin.asOf: column name(s) ${clash.mkString(", ")} collide " +
        s"with reserved internal names (${reserved.toSeq.sorted.mkString(", ")})" +
        " — rename them before the as-of join")
    val lpType = StructType(left.schema.fields.toSeq)

    // µs-exact ordering key: a bare cast("long") would truncate
    // TimestampType to whole SECONDS, letting a right row up to 999ms
    // AFTER the left row pass as "at-or-before"; NTZ routes through
    // TimestampType (instant-preserving — session TZ is pinned UTC)
    // because unix_micros rejects it directly
    def tsKey(df: DataFrame, ts: String): Column = df.schema(ts).dataType match {
      case TimestampType => unix_micros(col(ts))
      case TimestampNTZType => unix_micros(col(ts).cast(TimestampType))
      case _ => col(ts).cast("long")
    }

    // the right payload struct carries its own ts (`__rts`) so
    // `nearest` can compare gap sizes after the fills
    val rpType = StructType(
      org.apache.spark.sql.types.StructField("__rts",
        org.apache.spark.sql.types.LongType) +:
      right.schema.fields.filter(f => rPayload.contains(f.name)).toSeq)

    def side(df: DataFrame, ts: String, tag: Int, lp: Column, rp: Column) =
      df.select((keys.map(col) :+
        tsKey(df, ts).as("__ts") :+
        lit(tag).as("__side") :+
        lp.as("__lp") :+ rp.as("__rp")): _*)

    val lU = side(left, leftTs, 1,
      struct(lCols.map(col): _*), lit(null).cast(rpType))
    // tag 0 < 1: a right row at exactly left.ts sorts FIRST under
    // EITHER time ordering and is therefore visible to its fill — the
    // inclusive (<= / >=) semantics
    val rU = side(right, rightTs, 0,
      lit(null).cast(lpType),
      struct((tsKey(right, rightTs).as("__rts") +:
        rPayload.map(col)): _*))

    def w(o: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(o, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = lU.unionByName(rU)
    val filled = direction match {
      case "backward" =>
        u.withColumn("__filled",
          last(col("__rp"), ignoreNulls = true).over(w(col("__ts").asc)))
      case "forward" =>
        u.withColumn("__filled",
          last(col("__rp"), ignoreNulls = true).over(w(col("__ts").desc)))
      case "nearest" =>
        u.withColumn("__fb",
            last(col("__rp"), ignoreNulls = true).over(w(col("__ts").asc)))
          .withColumn("__ff",
            last(col("__rp"), ignoreNulls = true).over(w(col("__ts").desc)))
          .withColumn("__filled",
            when(col("__fb").isNull, col("__ff"))
              .when(col("__ff").isNull, col("__fb"))
              .when(col("__ts") - col("__fb.__rts") <=
                col("__ff.__rts") - col("__ts"), col("__fb"))
              .otherwise(col("__ff")))
    }
    // tolerance (pandas merge_asof `tolerance`): a candidate farther
    // than `toleranceUs` from the left row is no match at all — the
    // fill picked it, the row-local gap check rejects it
    val bounded = toleranceUs match {
      case None => filled
      case Some(t) => filled.withColumn("__filled",
        when(abs(col("__ts") - col("__filled.__rts")) <= t,
          col("__filled")))
    }
    bounded
      .filter(col("__side") === 1)
      .select((lCols.map(c => col(s"__lp.$c").as(c)) ++
        rPayload.map(c => col(s"__filled.$c").as(c))): _*)
  }

  /** [[asOf]] via the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]]): same semantics, same output
    * columns, but planned as a sorted-merge exec with a streaming
    * per-partition pass instead of union + window fill. Times must be
    * LongType (epoch-µs). Registers [[graft.plans.AsOfJoinStrategy]] on
    * the session's experimental strategies (idempotent) so it works
    * without `spark.sql.extensions` configuration.
    */
  def asOfExec(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    // fresh exprIds on the right side: both inputs often derive from the
    // same scan (self-as-of), and a duplicate attribute id in one binary
    // node corrupts resolution
    val r = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asOfExec: no column '$name'"))
    // same µs-exact rule as [[asOf]]'s tsKey: timestamps order by
    // unix_micros (a bare long cast would truncate to SECONDS), longs
    // pass through, other numerics cast
    def timeExpr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String): org.apache.spark.sql.catalyst.expressions.Expression = {
      val a = attr(plan, name)
      a.dataType match {
        case TimestampType =>
          org.apache.spark.sql.catalyst.expressions.UnixMicros(a)
        case TimestampNTZType =>
          // NTZ → TIMESTAMP → µs: unix_micros rejects NTZ directly; the
          // cast is instant-preserving under the pinned UTC session TZ
          org.apache.spark.sql.catalyst.expressions.UnixMicros(
            org.apache.spark.sql.catalyst.expressions.Cast(a, TimestampType))
        case org.apache.spark.sql.types.LongType => a
        case _ => org.apache.spark.sql.catalyst.expressions.Cast(a,
          org.apache.spark.sql.types.LongType)
      }
    }
    ColumnBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      timeExpr(lPlan, leftTs), timeExpr(rPlan, rightTs)))
  }
}
