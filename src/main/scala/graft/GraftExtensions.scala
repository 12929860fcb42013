package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.IntegerType
import graft.functions.NativeExpressions._

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Two registration routes:
  *   - `spark.sql.extensions=graft.GraftExtensions` (or
  *     `builder.withExtensions(new GraftExtensions)`) at session build;
  *   - [[GraftExtensions.register]] on an already-running session.
  *
  * After either, SQL users can call e.g.
  * `SELECT graft_simhash60(split(lower(text), ' ')) FROM docs`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // no-op until spark.graft.rangeJoin.binSize is set (see its scaladoc)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // plans AsOfJoinPlan nodes (built by AsOfJoin.asOfExec) into the
    // sorted-merge AsOfJoinExec
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.NativeExpressions", null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "", /* group */ "",
      /* since */ "", /* deprecated */ "", /* source */ "built-in")

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash60",
      info("graft_simhash60", "_FUNC_(tokens) - tf-weighted 60-bit simhash of a string array"),
      (es: Seq[Expression]) => SimHash60(es.head)),
    ("graft_fvec_dot",
      info("graft_fvec_dot", "_FUNC_(a, b) - double dot product of two float arrays"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    ("graft_jaccard_fp6",
      info("graft_jaccard_fp6", "_FUNC_(a, b) - floor(jaccard(a,b)*1e6) of two string arrays"),
      (es: Seq[Expression]) => ArrayJaccardFp6(es(0), es(1))),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "_FUNC_(grams, k) - k-hash MinHash signature of a string array"),
      (es: Seq[Expression]) => MinHashSig(es(0), intArg(es(1), "graft_minhash_sig"))),
    ("graft_lsh_bucket",
      info("graft_lsh_bucket", "_FUNC_(vec, numPlanes, dim) - random-hyperplane LSH bucket of a float vector"),
      (es: Seq[Expression]) => LshBucket(es(0), intArg(es(1), "graft_lsh_bucket"),
        intArg(es(2), "graft_lsh_bucket"))),
    ("graft_kmv_sketch",
      info("graft_kmv_sketch", "_FUNC_(h, k) - mergeable bottom-k distinct sketch of a long hash column"),
      (es: Seq[Expression]) => graft.functions.NativeAggregates.KmvSketchAgg(
        es(0), intArg(es(1), "graft_kmv_sketch"))),
    ("graft_top_k_pair",
      info("graft_top_k_pair", "_FUNC_(score, id, k) - best k (score DESC, id ASC) long pairs, rank-ordered"),
      (es: Seq[Expression]) => graft.functions.NativeAggregates.TopKPairAgg(
        es(0), es(1), intArg(es(2), "graft_top_k_pair"))),
    ("graft_cdc_cuts",
      info("graft_cdc_cuts", "_FUNC_(text, win, mod) - content-defined chunk cut positions (rolling hash60 of win-byte windows, boundary when % mod = 0)"),
      (es: Seq[Expression]) => CdcCuts(es(0), intArg(es(1), "graft_cdc_cuts"),
        intArg(es(2), "graft_cdc_cuts"))))

  /** Register all graft functions on an existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, b) =>
      ColumnBridge.registerFunction(spark, name, i, b)
    }
}
