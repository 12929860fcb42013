package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF join as a FIRST-CLASS operator: logical node + planner strategy
  * + physical sorted-merge exec — the full custom-operator stack
  * (preference tier (c) of the build guidelines), for the one relational
  * shape Spark's built-ins cannot express directly.
  *
  * Semantics: for each left row, append the payload of the LATEST right
  * row with the same key and `right.time <= left.time`; NULLs when no
  * such row (LEFT as-of). Identical to
  * [[graft.operators.AsOfJoin.asOf]] (the union + window-fill
  * formulation, kept as the cross-check and the no-extensions fallback),
  * but as a dedicated operator:
  *
  *   - both sides hash-partition by key and sort by (key, time) — the
  *     SAME Exchange+Sort a sort-merge equi-join pays, inserted by
  *     EnsureRequirements from the declared requirements;
  *   - the merge itself is a streaming single pass per partition: O(1)
  *     state (one buffered right row per key), no window-frame
  *     materialization, no union of the two sides;
  *   - at 100 TB: shuffle volume identical to the union trick, but the
  *     per-partition pass keeps ONE right payload in memory instead of
  *     a window buffer, and the probe side streams.
  *
  * Contract: time expressions are LongType (the engine's epoch-µs
  * currency); right must be unique per (key, time) — same as
  * [[graft.operators.AsOfJoin]].
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  /** left columns + right payload (right keys/time excluded), nullable. */
  override def output: Seq[Attribute] =
    left.output ++ AsOfJoinPlan.rightPayload(right.output, rightKeys, rightTime)
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  private[plans] def rightPayload(rightOutput: Seq[Attribute],
      rightKeys: Seq[Expression], rightTime: Expression): Seq[Attribute] =
    // reference-based, not semanticEquals: the time expression may wrap
    // the column (unix_micros over a timestamp) and the wrapped column
    // must still be excluded from the payload
    rightOutput.filterNot(a =>
      rightKeys.exists(_.references.contains(a)) ||
        rightTime.references.contains(a))
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Registered per-session
  * via `spark.experimental.extraStrategies` (see
  * [[graft.operators.AsOfJoin.asOfExec]]) or globally via
  * `GraftExtensions`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join. Children are required to be
  * co-partitioned by key and sorted by (key, time asc); the merge is one
  * streaming pass per partition holding a single buffered right row.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join times must be LongType (epoch-µs)")

  private val rightPayloadAttrs: Seq[Attribute] =
    AsOfJoinPlan.rightPayload(right.output, rightKeys, rightTime)

  override def output: Seq[Attribute] =
    left.output ++ rightPayloadAttrs.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  /** Left rows pass through in their sorted order. */
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val outAttrs = output
    val rPayload = rightPayloadAttrs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      // result = (left row ++ right PAYLOAD columns); the right INPUT
      // schema binds NULLABLE — BindReferences takes nullability from
      // the input attribute, and the null-extension row must project as
      // NULLs even when the source attribute was non-nullable
      val resultProj = UnsafeProjection.create(
        lOut.map(a => a: Expression) ++
          rPayload.map(a => a.withNullability(true): Expression),
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val rNulls = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // one-row lookahead over the right side
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: Long = 0L
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeProj(rRow).getLong(0)
          } else { rRow = null; rKey = null }
        advanceRight()

        // latest right row seen for the current key run
        private var matchRow: InternalRow = _
        private var matchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyProj(l)
          val t = lTimeProj(l).getLong(0)
          // consume right rows at-or-before (k, t); rows with key < k can
          // never match a later left row (left keys are ascending)
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKey, k)
          while (rRow != null && (cmp < 0 || (cmp == 0 && rTime <= t))) {
            if (cmp == 0) { matchRow = rRow.copy(); matchKey = rKey }
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKey, k)
          }
          val matched = matchKey != null && keyOrd.compare(matchKey, k) == 0
          resultProj(joined(l, if (matched) matchRow else rNulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
