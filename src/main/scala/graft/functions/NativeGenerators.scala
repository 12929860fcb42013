package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR — the UDTF extension tier (one input row →
  * many output rows), completing the expression surface next to the
  * scalar expressions ([[NativeExpressions]]) and the typed-imperative
  * aggregates ([[NativeAggregates]]).
  *
  * [[WordNgramGen]] emits one row per word n-gram of a token array
  * DIRECTLY — the explode-free formulation of
  * `explode(wordNgrams(toks, n))`: the scalar path materializes the full
  * gram ARRAY per document (≈ text-size × n bytes of transient garbage
  * per row) only for GenerateExec to tear it apart again; the generator
  * streams each gram as it is assembled, so per-row transient memory is
  * one gram instead of all of them. On 100 TB of documents the gram
  * fan-out is the biggest intermediate the dedup stack creates — this is
  * the shape that keeps it off the heap.
  *
  * Emission order and values are bit-identical to the scalar+explode
  * path (same concatWs, same window walk), so the two formulations are
  * interchangeable under every downstream aggregate — spec-proven, and
  * hash-checked end-to-end by q108.
  */
object NativeGenerators {

  /** One output row `(gram: string)` per word n-gram; rows shorter than
    * `n` tokens emit nothing (matching the scalar path's empty array).
    */
  case class WordNgramGen(child: Expression, n: Int)
      extends UnaryExpression with Generator with CodegenFallback {

    require(n > 0, s"word_ngram_gen: n must be positive, got $n")

    override def elementSchema: StructType =
      StructType(Seq(StructField("gram", StringType, nullable = false)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input)
      if (arr == null) return Iterator.empty
      val toks = arr.asInstanceOf[ArrayData]
      val s = toks.numElements()
      if (s < n) return Iterator.empty
      val sep = UTF8String.fromString(" ")
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= s - n
        override def next(): InternalRow = {
          val window = new Array[UTF8String](n)
          var j = 0
          while (j < n) {
            window(j) =
              if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
            j += 1
          }
          i += 1
          InternalRow(UTF8String.concatWs(sep, window: _*))
        }
      }
    }

    override protected def withNewChildInternal(newChild: Expression): WordNgramGen =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Explode-free n-gram emission: one `gram` row per n-gram of `toks`.
    * Use with `select(cols, wordNgramGen(toks, n))` — Spark plans it as
    * a Generate, same as explode.
    */
  def wordNgramGen(toks: Column, n: Int): Column =
    column(WordNgramGen(expression(toks), n))
}
