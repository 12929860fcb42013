package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Custom Catalyst expressions for the two hot inner loops the built-in
  * HOFs make interpretation-bound: tf-weighted SimHash and float-vector
  * dot products. Both are drop-in replacements for HOF formulations with
  * BIT-IDENTICAL results (same md5-derived hashes, same sequential double
  * accumulation order), so the DuckDB oracles are unchanged — only the
  * evaluation strategy differs (one tight JVM loop per row instead of an
  * interpreted expression tree per element; measured ~100× on the simhash
  * query at sf0.1: 578s → ~6s).
  *
  * Preference order per the build guidelines: compose built-ins first
  * (kept as the reference implementations in TextDedup/VectorFunctions
  * scaladoc), then a native `Expression` — never a Scala UDF (boxing,
  * no null semantics, opaque to Catalyst).
  */
object NativeExpressions {

  /** First 60 bits of md5(bytes) — identical to
    * `conv(substring(md5(s),1,15),16,10)`: 15 hex chars = top 7.5 bytes.
    */
  private[functions] def md5Hash60(md: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    md.reset()
    val dig = md.digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
    v >>> 4
  }

  /** tf-weighted 60-bit SimHash over a string array (see
    * [[graft.operators.TextDedup.simhash]] for the semantics and the HOF
    * reference implementation).
    */
  case class SimHash60(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](60)
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = md5Hash60(md, arr.getUTF8String(i).getBytes)
          var b = 0
          while (b < 60) {
            counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        i += 1
      }
      var sh = 0L
      var b = 0
      while (b < 60) { if (counts(b) > 0) sh |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sh)
    }
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
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true // NULL for an empty gram set
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val md = java.security.MessageDigest.getInstance("MD5")
      val prefixes = Array.tabulate(numHashes)(i => s"$i:".getBytes("UTF-8"))
      var g = 0
      while (g < n) {
        if (!arr.isNullAt(g)) {
          val gramBytes = arr.getUTF8String(g).getBytes
          var i = 0
          while (i < numHashes) {
            val p = prefixes(i)
            val buf = new Array[Byte](p.length + gramBytes.length)
            System.arraycopy(p, 0, buf, 0, p.length)
            System.arraycopy(gramBytes, 0, buf, p.length, gramBytes.length)
            val h = md5Hash60(md, buf)
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        }
        g += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** Space-joined word n-grams of a token array — the native form of
    * `transform(sequence(0, size-n), i -> concat_ws(' ', slice(toks,i+1,n)))`
    * with an empty array for inputs shorter than n. Null tokens render as
    * empty (concat_ws semantics).
    */
  case class WordNgrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val s = arr.numElements()
      if (s < n)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val out = new Array[Any](s - n + 1)
      var i = 0
      while (i <= s - n) {
        val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j = 0
        while (j < n) {
          window(j) =
            if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, window: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): WordNgrams =
      copy(child = newChild)
  }

  /** min over a string array of hash60(element) — the 1-hash MinHash /
    * fingerprint kernel (`array_min(transform(grams, hash60))` HOF
    * equivalent). NULL for an empty array, matching array_min.
    */
  case class MinHash60(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // NULL for an empty array
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      val md = java.security.MessageDigest.getInstance("MD5")
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = md5Hash60(md, arr.getUTF8String(i).getBytes)
          if (h < best) best = h
        }
        i += 1
      }
      if (best == Long.MaxValue) null else java.lang.Long.valueOf(best)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHash60 =
      copy(newChild)
  }

  /** floor(jaccard(a, b) * 1e6) over two string arrays (callers pass
    * distinct gram arrays): |∩| / (|a|+|b|-|∩|) with the same
    * double-division → ×1e6 → floor order as the relational
    * count-based formulation, so values match the DuckDB oracle exactly.
    */
  case class ArrayJaccardFp6(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // NULL when both arrays are empty
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val na = x.numElements()
      val nb = y.numElements()
      if (na == 0 && nb == 0) return null
      val set = new java.util.HashSet[Any](na * 2)
      var i = 0
      while (i < na) { set.add(x.getUTF8String(i)); i += 1 }
      var inter = 0
      var j = 0
      while (j < nb) { if (set.contains(y.getUTF8String(j))) inter += 1; j += 1 }
      val jac = inter.toDouble / (na + nb - inter).toDouble
      java.lang.Long.valueOf(math.floor(jac * 1000000.0).toLong)
    }
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
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // NULL on length mismatch
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): FloatVecDot = copy(newLeft, newRight)
  }

  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  def simhash60(tokens: Column): Column = column(SimHash60(expression(tokens)))
  def floatVecDot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))
  def minhashSig(grams: Column, numHashes: Int): Column =
    column(MinHashSig(expression(grams), numHashes))
  def arrayJaccardFp6(a: Column, b: Column): Column =
    column(ArrayJaccardFp6(expression(a), expression(b)))
  def minHash60(arr: Column): Column = column(MinHash60(expression(arr)))
  def wordNgrams(toks: Column, n: Int): Column =
    column(WordNgrams(expression(toks), n))
}
