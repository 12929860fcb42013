package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Custom Catalyst expressions for the hot inner loops the built-in HOFs
  * make interpretation-bound: tf-weighted SimHash, MinHash signatures,
  * vector dot products and LSH bucketing. All are drop-in replacements
  * for HOF formulations with BIT-IDENTICAL results (same md5-derived
  * hashes, same sequential double accumulation order), so the DuckDB
  * oracles are unchanged — only the evaluation strategy differs (one
  * tight JVM loop per row instead of an interpreted expression tree per
  * element; measured ~100× on the simhash query at sf0.1: 578s → ~6s).
  *
  * Every expression implements `doGenCode`, emitting a call to the shared
  * kernel in [[NativeKernels]] — the SAME code the interpreted
  * `nullSafeEval` path runs — so these are full codegen citizens, not
  * `CodegenFallback` boundaries: the surrounding stages keep one
  * WholeStageCodegen span and rows are never boxed around the call.
  *
  * Preference order per the build guidelines: compose built-ins first
  * (kept as the reference implementations in TextDedup/VectorFunctions
  * scaladoc), then a native `Expression` — never a Scala UDF (boxing,
  * no null semantics, opaque to Catalyst).
  */
object NativeExpressions {

  private val K = "graft.functions.NativeKernels"

  /** tf-weighted 60-bit SimHash over a string array (see
    * [[graft.operators.TextDedup.simhash]] for the semantics and the HOF
    * reference implementation).
    */
  case class SimHash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(NativeKernels.simhash60(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.simhash60($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash60 =
      copy(newChild)
  }

  /** MinHash signature over a string array: for each hash function i in
    * [0, numHashes), the min over grams of hash60("i:" + gram) — exactly
    * the per-gram family [[graft.operators.TextDedup]] aggregates with
    * min(), but computed row-locally in one pass (no explode, no shuffle).
    * Returns NULL for an empty gram set, mirroring the aggregate version
    * where a doc without grams simply has no rows to aggregate.
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true // NULL for an empty gram set
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.minhashSig(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        // freshName: with a NON-nullable child the block is inlined bare
        // (no enclosing if-scope), so a fixed local name would collide
        // when the same expression appears twice in one codegen scope
        val r = ctx.freshName("mhSig")
        s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r = $K.minhashSig($c, $numHashes);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """})
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** Space-joined word n-grams of a token array — the native form of
    * `transform(sequence(0, size-n), i -> concat_ws(' ', slice(toks,i+1,n)))`
    * with an empty array for inputs shorter than n. Null tokens render as
    * empty (concat_ws semantics).
    */
  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.wordNgrams(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordNgrams($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WordNgrams =
      copy(child = newChild)
  }

  /** min over a string array of hash60(element) — the 1-hash MinHash /
    * fingerprint kernel (`array_min(transform(grams, hash60))` HOF
    * equivalent). NULL for an empty array, matching array_min.
    */
  case class MinHash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // NULL for an empty array
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.minHash60(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val r = ctx.freshName("minHash")
        s"""
        java.lang.Long $r = $K.minHash60($c);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      """})
    override protected def withNewChildInternal(newChild: Expression): MinHash60 =
      copy(newChild)
  }

  /** floor(jaccard(a, b) * 1e6) over two string arrays (callers pass
    * distinct gram arrays): |∩| / (|a|+|b|-|∩|) with the same
    * double-division → ×1e6 → floor order as the relational
    * count-based formulation, so values match the DuckDB oracle exactly.
    */
  case class ArrayJaccardFp6(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // NULL when both arrays are empty
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.arrayJaccardFp6(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("jac")
        s"""
        java.lang.Long $r = $K.arrayJaccardFp6($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      """})
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): ArrayJaccardFp6 = copy(newLeft, newRight)
  }

  /** Sequential-fold dot product of two float arrays, accumulated in
    * double in index order — bit-identical to the zip_with/aggregate HOF
    * chain in [[graft.functions.VectorFunctions.dot]] and to DuckDB
    * `list_sum(list_transform(list_zip(a,b), ...))`. Mismatched lengths
    * yield NULL, matching the HOF (zip_with pads with null, and
    * `acc + null` is NULL) — surfacing malformed embeddings instead of
    * silently scoring a truncated prefix.
    */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // NULL on length mismatch
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.floatVecDot(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("fdot")
        s"""
        java.lang.Double $r = $K.floatVecDot($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      """})
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): FloatVecDot = copy(newLeft, newRight)
  }

  /** [[FloatVecDot]] for `array<double>` inputs (e.g. k-means centroids):
    * same sequential fold, same NULL-on-mismatch semantics.
    */
  case class DoubleVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // NULL on length mismatch
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.doubleVecDot(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("ddot")
        s"""
        java.lang.Double $r = $K.doubleVecDot($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      """})
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): DoubleVecDot = copy(newLeft, newRight)
  }

  /** Random-hyperplane LSH bucket id of a float vector: one long whose
    * bit p is the sign of the projection onto deterministic plane p. The
    * ±1 plane weights derive from hash60("p:j") — computed once at
    * expression construction on the driver and shipped as a referenced
    * flat matrix (the broadcast-plane-matrix production shape), exactly
    * the weights the DuckDB oracle re-derives in SQL. Bit-identical to
    * the HOF tower in [[graft.operators.Similarity.lshBucketHof]], which
    * hashed every vector through an interpreted
    * aggregate(transform(sequence)) — the shape that made q20 the
    * slowest non-streaming query before this expression.
    */
  case class LshBucket(child: Expression, numPlanes: Int, dim: Int,
      planeOffset: Int = 0)
      extends UnaryExpression {
    override def dataType: DataType = LongType

    /** Flat row-major numPlanes×dim ±1 matrix; deterministic, so equal
      * (numPlanes, dim, planeOffset) ⇒ equal planes and case-class
      * equality stays semantically correct without comparing the array.
      * `planeOffset` selects an independent plane family — table t of a
      * multi-table LSH index uses offset t·numPlanes.
      */
    @transient private lazy val planes: Array[Double] = {
      val m = new Array[Double](numPlanes * dim)
      var p = 0
      while (p < numPlanes) {
        var j = 0
        while (j < dim) {
          m(p * dim + j) = LshBucket.planeWeight(planeOffset + p, j)
          j += 1
        }
        p += 1
      }
      m
    }

    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(NativeKernels.lshBucket(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        planes, numPlanes, dim))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      defineCodeGen(ctx, ev, c => s"$K.lshBucket($c, $planesRef, $numPlanes, $dim)")
    }

    override protected def withNewChildInternal(newChild: Expression): LshBucket =
      copy(child = newChild)
  }

  object LshBucket {
    /** ±1 weight of hyperplane `p` at dimension `j`: bit 0 of
      * hash60("p:j") — the same value the oracle derives in SQL via
      * `('0x'||substring(md5(p||':'||j),1,15))::BIGINT & 1`.
      */
    def planeWeight(p: Int, j: Int): Double =
      if ((NativeKernels.md5Hash60(s"$p:$j".getBytes("UTF-8")) & 1L) == 1L) 1.0
      else -1.0
  }

  /** Content-defined chunk cut positions of a text blob (see
    * [[NativeKernels.cdcCuts]]): the native form of the per-byte
    * rolling-hash HOF in MultimodalQueries' CDC tier — one digest
    * loop per row. NULL for blobs shorter than `win`.
    */
  case class CdcCuts(child: Expression, win: Int, mod: Int)
      extends UnaryExpression {
    // parameter validation at CONSTRUCTION (covers both the Scala API
    // and the SQL registration): mod <= 0 would otherwise surface as a
    // per-row ArithmeticException deep in execution, win <= 0 as a
    // degenerate/out-of-bounds window walk
    require(win >= 1, s"graft_cdc_cuts: win must be >= 1, got $win")
    require(mod >= 1, s"graft_cdc_cuts: mod must be >= 1, got $mod")
    // a non-string child must fail at ANALYSIS, not as a runtime
    // ClassCastException inside the kernel
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cdc_cuts requires a STRING child, got ${child.dataType.sql}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true // NULL for blobs shorter than win
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.cdcCuts(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], win, mod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val r = ctx.freshName("cdcCuts")
        s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r = $K.cdcCuts($c, $win, $mod);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """})
    override protected def withNewChildInternal(newChild: Expression): CdcCuts =
      copy(child = newChild)
  }

  /** One-pass token statistics `[n_tokens, n_distinct, sum_char_len,
    * n_stopword_hits]` over a string array — the native form of the
    * four-walk HOF chain in the q16 quality metrics (see
    * [[graft.functions.NativeKernels.tokenStats]] for the exact
    * equivalences). Stopwords are fixed at construction and shipped as
    * a referenced UTF8String array.
    */
  case class TokenStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    @transient private lazy val stops: Array[org.apache.spark.unsafe.types.UTF8String] =
      stopwords.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.tokenStats(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], stops)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("tokStops", stops,
        "org.apache.spark.unsafe.types.UTF8String[]")
      defineCodeGen(ctx, ev, c => s"$K.tokenStats($c, $ref)")
    }

    override protected def withNewChildInternal(newChild: Expression): TokenStats =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  def simhash60(tokens: Column): Column = column(SimHash60(expression(tokens)))
  def floatVecDot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))
  def doubleVecDot(a: Column, b: Column): Column =
    column(DoubleVecDot(expression(a), expression(b)))
  def minhashSig(grams: Column, numHashes: Int): Column =
    column(MinHashSig(expression(grams), numHashes))
  def arrayJaccardFp6(a: Column, b: Column): Column =
    column(ArrayJaccardFp6(expression(a), expression(b)))
  def minHash60(arr: Column): Column = column(MinHash60(expression(arr)))
  def wordNgrams(toks: Column, n: Int): Column =
    column(WordNgrams(expression(toks), n))
  def lshBucket(vec: Column, numPlanes: Int, dim: Int,
      planeOffset: Int = 0): Column =
    column(LshBucket(expression(vec), numPlanes, dim, planeOffset))
  def tokenStats(toks: Column, stopwords: Seq[String]): Column =
    column(TokenStats(expression(toks), stopwords))
  def cdcCuts(text: Column, win: Int, mod: Int): Column =
    column(CdcCuts(expression(text), win, mod))

  /** Dot product dispatching on element type — [[FloatVecDot]] for
    * `array<float>`, [[DoubleVecDot]] for `array<double>` — so callers
    * like cosine work unchanged over either representation.
    */
  def vecDot(a: Column, b: Column, elem: DataType): Column = elem match {
    case FloatType  => floatVecDot(a, b)
    case DoubleType => doubleVecDot(a, b)
    case t => throw new IllegalArgumentException(s"vecDot: unsupported element type $t")
  }
}
