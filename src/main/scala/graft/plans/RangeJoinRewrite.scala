package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite point-in-interval INNER joins into
  * binned equi-joins.
  *
  * A join whose only cross-side predicates are a band —
  * `lo <= p AND p < hi` with the point `p` from one child and both
  * bounds from the other — has no equi key, so Spark plans a
  * BroadcastNestedLoopJoin (every point row compared against every
  * interval row: |P|·|I| work, the classic range-join scale killer).
  *
  * With a bin width W configured, two rows can only satisfy the band if
  * `bin(p) ∈ [bin(lo), bin(hi)]` where `bin(x) = x div W` — integer
  * division is monotone, so this is implied by `lo <= p <= hi` for ANY
  * rounding mode as long as both sides use the same function. The rule
  * therefore:
  *   - explodes each interval row into the bins [bin(lo) .. bin(hi)]
  *     it covers (a `Generate`/`Explode(Sequence(...))` node);
  *   - projects `bin(p)` onto the point side;
  *   - joins on bin equality, keeping the ORIGINAL band predicates as
  *     the residual condition.
  * Each point belongs to exactly one bin, so no pair can match twice —
  * the rewrite is lossless with no dedup step. Rows with NULL point or
  * bounds produced no output before (three-valued logic) and produce
  * none after (`bin(null)` is null; a null sequence generates no rows).
  *
  * Scope guards (all conservative — when in doubt the join is left
  * untouched):
  *   - inner joins only, both children resolved;
  *   - fires only when NO cross-side equi conjunct exists: with an equi
  *     key the planner already has a shuffle key and per-key residual
  *     evaluation, and the guard also makes the rule a fixed point (the
  *     rewritten join HAS an equi conjunct);
  *   - point and bounds must be deterministic expressions of integral
  *     type (byte/short/int/long) — callers express timestamps as epoch
  *     micros (see `Tables.events.ts_us`);
  *   - bin width comes from `spark.graft.rangeJoin.binSize` (off when
  *     unset/≤0). Tune it like every banded join in this engine: ~the
  *     median interval length; too fine explodes long intervals into
  *     many bins, too coarse degrades toward all-pairs within a bin.
  *
  * Registration: session-build via `GraftExtensions`
  * (`injectOptimizerRule`), or on a live session via
  * [[RangeJoinRewrite.enable]] (`spark.experimental.extraOptimizations`,
  * Spark's documented post-hoc optimizer hook). Both run the rule after
  * the main optimizer batches, so single-side predicates have already
  * been pushed below the join and surviving conjuncts are genuinely
  * cross-side.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  /** Idempotently register on a running session and set the bin width. */
  def enable(spark: SparkSession, binSize: Long): Unit = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    spark.conf.set(BinSizeKey, binSize.toString)
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
  }

  private def binSize: Long =
    try conf.getConfString(BinSizeKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Read a comparison as "point ≥/> bound" in either written order. */
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, b) => Some((p, b))
    case GreaterThan(p, b)        => Some((p, b))
    case LessThanOrEqual(b, p)    => Some((p, b))
    case LessThan(b, p)           => Some((p, b))
    case _ => None
  }

  /** Read a comparison as "point ≤/< bound" in either written order. */
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(p, b)    => Some((p, b))
    case LessThan(p, b)           => Some((p, b))
    case GreaterThanOrEqual(b, p) => Some((p, b))
    case GreaterThan(b, p)        => Some((p, b))
    case _ => None
  }

  private def oppositeSides(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Boolean =
    (canEvaluate(a, l) && canEvaluate(b, r)) ||
      (canEvaluate(a, r) && canEvaluate(b, l))

  private case class Band(point: Expression, lo: Expression, hi: Expression)

  private def findBand(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Band] = {
    val bands = for {
      lc <- conjuncts
      uc <- conjuncts if lc ne uc
      (pl, lo) <- asLower(lc).toSeq
      (pu, hi) <- asUpper(uc).toSeq
      if pl.semanticEquals(pu)
      if integral(pl.dataType) && integral(lo.dataType) && integral(hi.dataType)
      if pl.deterministic && lo.deterministic && hi.deterministic
      if (canEvaluate(pl, left) && canEvaluate(lo, right) && canEvaluate(hi, right)) ||
        (canEvaluate(pl, right) && canEvaluate(lo, left) && canEvaluate(hi, left))
    } yield Band(pl, lo, hi)
    bands.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binSize
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b)       => oppositeSides(a, b, left, right)
          case EqualNullSafe(a, b) => oppositeSides(a, b, left, right)
          case _ => false
        }
        val band = if (hasEqui) None else findBand(conjuncts, left, right)
        band match {
          case None => j
          case Some(Band(point, lo, hi)) =>
            def bin(e: Expression): Expression =
              new IntegralDivide(Cast(e, LongType), Literal(w))
            val pointOnLeft = canEvaluate(point, left)
            val (pointPlan, intervalPlan) = if (pointOnLeft) (left, right) else (right, left)
            // interval side: one row per covered bin. Sequence step 1 over
            // longs; elementSchema is non-null long, matched exactly below.
            val binI = AttributeReference("__graft_bin_i", LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: without an explicit
            // timeZoneId it reports unresolved and fails plan validation
            val gen = Generate(
              Explode(new Sequence(bin(lo), bin(hi), Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binI), child = intervalPlan)
            // point side: its single bin
            val binP = Alias(bin(point), "__graft_bin_p")()
            val proj = Project(pointPlan.output :+ binP, pointPlan)
            val newCond = And(EqualTo(binI, binP.toAttribute), cond)
            val (nl, nr) = if (pointOnLeft) (proj, gen) else (gen, proj)
            // restore the original output (drop the helper bin columns)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
    }
  }
}
