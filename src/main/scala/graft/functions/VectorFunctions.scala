package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns using Spark's
  * higher-order array functions (codegen'd; no UDFs, no driver loops).
  *
  * Float discipline for oracle parity: every elementwise product casts the
  * float operands to double FIRST (float*float would round to float), and
  * sums are sequential left-folds — the same order DuckDB's `list_sum` /
  * explicit `list_transform` pipelines evaluate in, so dot products are
  * bit-identical across engines. Ranking/thresholding always goes through
  * `floor(cos * 1e6)` scaled longs, never raw doubles.
  */
object VectorFunctions {

  /** Sequential-fold dot product of two float vectors, accumulated in
    * double. Evaluated by the native
    * [[graft.functions.NativeExpressions.FloatVecDot]] Catalyst expression;
    * [[dotHof]] is the bit-identical HOF reference.
    */
  def dot(a: Column, b: Column): Column = NativeExpressions.floatVecDot(a, b)

  /** HOF reference implementation of [[dot]] (interpreted; kept for
    * cross-checking the native expression).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm, double accumulation. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine scaled to a deterministic long: floor(cos * 1e6). */
  def cosineFp6(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(1000000.0)).cast("long")

  /** [[cosineFp6]] with PRE-COMPUTED norms (sqrt of normSq): same
    * arithmetic — dot/(normA*normB) — so bit-identical to computing the
    * norms inline, but each vector's norm is evaluated once per row
    * instead of once per pair (3× fewer flops in all-pairs scoring).
    */
  def cosineFp6PreNorm(dotAB: Column, normA: Column, normB: Column): Column =
    floor(dotAB / (normA * normB) * lit(1000000.0)).cast("long")

  /** sqrt of the squared norm — the factor cosine divides by. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** [[dot]] over `array<double>` columns (e.g. k-means centroids) — the
    * native [[graft.functions.NativeExpressions.DoubleVecDot]], same
    * sequential fold.
    */
  def dotD(a: Column, b: Column): Column = NativeExpressions.doubleVecDot(a, b)

  /** [[cosineFp6]] where BOTH inputs are `array<double>`: identical
    * arithmetic order (dot / (sqrt·sqrt) × 1e6, floored). Callers with a
    * float vector cast it to `array<double>` first — the per-element
    * double values are the same ones [[dot]] multiplies, so a float
    * vector scored via this path is bit-identical to the float path.
    */
  def cosineFp6D(a: Column, b: Column): Column =
    floor(dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b))) * lit(1000000.0))
      .cast("long")
}
