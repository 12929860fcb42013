package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The tight JVM inner loops behind the native Catalyst expressions in
  * [[NativeExpressions]]. One shared implementation serves BOTH execution
  * paths: the interpreted `nullSafeEval` and the generated code emitted by
  * `doGenCode` (whole-stage codegen calls these as static methods — a
  * top-level Scala object compiles to static forwarders, so the generated
  * Java references `graft.functions.NativeKernels.xxx(...)` directly).
  *
  * Keeping the kernels here means codegen and interpretation cannot
  * diverge, and the expressions stop being `CodegenFallback` boundaries:
  * the surrounding project/filter stages stay inside one
  * WholeStageCodegen span instead of boxing rows around each call.
  *
  * All hashes are the md5-derived `hash60` family (first 15 hex chars →
  * 60-bit long) so every kernel stays bit-reproducible in DuckDB SQL.
  */
object NativeKernels {

  /** Per-thread MD5 instance — one digest per executor thread instead of
    * one allocation per row (measurably cheaper in codegen'd loops).
    */
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 60 bits of md5(bytes) — identical to
    * `conv(substring(md5(s),1,15),16,10)`: 15 hex chars = top 7.5 bytes.
    */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val dig = md.digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
    v >>> 4
  }

  /** Content-defined chunk cut positions over a blob's bytes: a cut
    * after byte `e` (1-based) whenever hash60 of the `win`-byte window
    * ending at `e` ≡ 0 (mod `mod`); the final position `n` always
    * closes the last chunk. Returns the ascending distinct cut array —
    * exactly `array_sort(array_distinct(concat(filter(transform(...`
    * of the HOF reference in MultimodalQueries (spec-checked equal),
    * evaluated as ONE digest loop per row instead of an interpreted
    * expression tree per byte. NULL for blobs shorter than `win`
    * (the HOF path filters those rows). Byte-offset based — identical
    * to the character-based HOF/oracle under the ASCII blob
    * convention (q97/q160/q188 share it).
    */
  def cdcCuts(s: UTF8String, win: Int, mod: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < win) return null
    val md = md5Local.get()
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n / mod + 2)
    var e = win
    while (e <= n) {
      md.reset()
      md.update(bytes, e - win, win)
      val dig = md.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
      if (((v >>> 4) % mod) == 0 && e != n) buf += e.toLong
      e += 1
    }
    buf += n.toLong
    new GenericArrayData(buf.toArray)
  }

  /** tf-weighted 60-bit SimHash over a token array (never null). */
  def simhash60(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Hash60(arr.getUTF8String(i).getBytes)
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
    sh
  }

  /** MinHash signature (length numHashes) or null for an empty gram set. */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
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
          val h = md5Hash60(buf)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  /** Space-joined word n-grams; empty array for inputs shorter than n. */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val s = arr.numElements()
    if (s < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](s - n + 1)
    var i = 0
    while (i <= s - n) {
      val window = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** min over hash60(element), or null for empty/all-null arrays. */
  def minHash60(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    var best = Long.MaxValue
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Hash60(arr.getUTF8String(i).getBytes)
        if (h < best) best = h
      }
      i += 1
    }
    if (best == Long.MaxValue) null else java.lang.Long.valueOf(best)
  }

  /** floor(jaccard * 1e6) over two string arrays; null when both empty. */
  def arrayJaccardFp6(x: ArrayData, y: ArrayData): java.lang.Long = {
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

  /** One-pass token statistics: [n_tokens, n_distinct, sum_char_len,
    * n_stopword_hits]. Bit-identical to the HOF chain
    * `size(toks) / size(array_distinct(toks)) /
    * aggregate(transform(toks, length), 0, +) /
    * size(filter(toks, isin(stops)))` — which walks the array four
    * times through interpreted lambdas; this walks it once in a tight
    * loop. Null elements count toward n_tokens only (matching size()
    * vs the null-skipping of the other three).
    */
  def tokenStats(arr: ArrayData, stops: Array[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[Any](n * 2)
    var sumLen = 0L
    var nStop = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        seen.add(t)
        sumLen += t.numChars()
        var s = 0
        var isStop = false
        while (s < stops.length && !isStop) {
          if (stops(s).equals(t)) isStop = true
          s += 1
        }
        if (isStop) nStop += 1
      }
      i += 1
    }
    new GenericArrayData(Array(n.toLong, seen.size.toLong, sumLen, nStop))
  }

  /** Sequential-fold float dot in double; null on length mismatch. */
  def floatVecDot(x: ArrayData, y: ArrayData): java.lang.Double = {
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

  /** Sequential-fold double dot; null on length mismatch. Same fold order
    * as [[floatVecDot]] — used where vectors are already double (e.g.
    * k-means centroids).
    */
  def doubleVecDot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Random-hyperplane LSH bucket of a float vector: bit p is set iff the
    * sequential-fold projection onto plane p is > 0. `planes` is the flat
    * numPlanes×dim ±1 weight matrix (row-major). Bit-identical to the HOF
    * tower in [[graft.operators.Similarity.lshBucketHof]], including its
    * null semantics: any null element makes every projection NULL, and the
    * HOF's `when(proj > 0, ...).otherwise(0)` then yields bucket 0.
    */
  def lshBucket(v: ArrayData, planes: Array[Double], numPlanes: Int,
      dim: Int): Long = {
    // mirror the HOF for LONGER vectors (it folds the first dim
    // elements); too-short vectors cannot produce a projection — the
    // HOF's out-of-range element_at nulls every plane term → bucket 0
    if (v.numElements() < dim) return 0L
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return 0L; i += 1 }
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0
      val off = p * dim
      var j = 0
      while (j < dim) {
        proj += planes(off + j) * v.getFloat(j).toDouble
        j += 1
      }
      if (proj > 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }
}
