package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Custom Catalyst AGGREGATE functions — the third extension tier next to
  * the scalar expressions ([[NativeExpressions]]) and the optimizer rule
  * ([[graft.plans.RangeJoinRewrite]]). These are
  * `TypedImperativeAggregate`s, the same machinery Spark's own
  * `approx_percentile` / `hll_sketch_agg` use: an arbitrary JVM object as
  * the aggregation buffer, full partial-aggregation + merge support, so
  * map-side combine happens BEFORE the exchange and the shuffle carries
  * one small sketch per (partition × group) instead of the raw rows.
  *
  * Buffers ride in `ObjectHashAggregateExec` (object-typed hash agg); the
  * final sort the window formulation needs never happens.
  */
object NativeAggregates {

  /** KMV (k-minimum-values) sketch: the bottom `k` DISTINCT values of the
    * child LONG column, returned as an ascending `array<long>`.
    *
    * This is the mergeable-aggregate form of the q64 window formulation
    * (`row_number() over (order by h) <= k`): same bottom-k contract,
    * but update/merge keep only a k-entry tree per group, so
    *   - the map side emits ≤ k longs per group per partition (the window
    *     form shuffles EVERY distinct hash, then sorts);
    *   - sketches merge associatively — a 1000-executor cluster combines
    *     per-executor sketches in a tree, never re-seeing the data;
    *   - the same sketch doubles as a deterministic uniform sample of the
    *     keys (md5-hash order is reprocessing-stable).
    *
    * Distinctness is inherent (a TreeSet buffer), so callers do NOT need
    * a pre-distinct — `events.groupBy(g).agg(kmv_sketch(h, k))` is ONE
    * hash-agg pass over the raw table.
    *
    * Estimator contract (applied by the caller, kept out of the sketch so
    * the array stays reusable as a sample): with h uniform on [0, 2^60),
    * est = (k−1)·2^60 / h_k, exact-integral division; when |group| < k
    * the sketch is exhaustive and the estimate is exact.
    */
  case class KmvSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k > 0, s"kmv_sketch: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_kmv_sketch"

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
      // hash60 values are non-negative, so signed Long order == unsigned
      if (buf.size() < k) { buf.add(h); () }
      else if (h < buf.last()) {
        // TreeSet dedups; only shrink when the add actually grew the set
        if (buf.add(h) && buf.size() > k) { buf.pollLast(); () }
      }
    }

    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = other.iterator()
      while (it.hasNext) add(buf, it.next().longValue())
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size())
      var i = 0
      val it = buf.iterator()
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size())
      bb.putInt(buf.size())
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(bb.getLong()); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): KmvSketchAgg =
      copy(child = newChildren.head)
  }

  /** Bounded top-k aggregate over (score, id) LONG pairs: keeps the k
    * best by (score DESC, id ASC) and returns them rank-ordered as
    * `array<struct<score:long, id:long>>`.
    *
    * This is the aggregate form of the `row_number() OVER (PARTITION BY g
    * ORDER BY score DESC) <= k` pattern every top-k query pays: the
    * window shape sorts ALL scored rows per group (WindowGroupLimit
    * prunes to k per partition, but only after a full shuffle of the
    * scored pairs); the aggregate keeps a k-entry tree per group on the
    * map side, so the exchange carries ≤ k pairs per (group × partition)
    * and merges are associative. For brute-force KNN over 100 TB of
    * embeddings (score-everything-keep-k), this is the difference
    * between shuffling |queries|·|corpus| scored pairs and shuffling
    * |queries|·k·partitions.
    *
    * Scores here are fp6-floored cosines (longs) — the engine's ranking
    * currency — so signed long comparison is the exact ranking order.
    */
  case class TopKPairAgg(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

    require(k > 0, s"top_k_pair: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("score", LongType, nullable = false),
        StructField("id", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_top_k_pair"

    // best-first order: score DESC, id ASC
    private object BestFirst extends Ordering[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

    override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
      new java.util.TreeSet[(Long, Long)](BestFirst)

    private def add(buf: java.util.TreeSet[(Long, Long)], s: Long, i: Long): Unit = {
      if (buf.size() < k) { buf.add((s, i)); () }
      else if (BestFirst.compare((s, i), buf.last()) < 0) {
        if (buf.add((s, i)) && buf.size() > k) { buf.pollLast(); () }
      }
    }

    override def update(buf: java.util.TreeSet[(Long, Long)],
        input: InternalRow): java.util.TreeSet[(Long, Long)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        add(buf, s.asInstanceOf[Long], i.asInstanceOf[Long])
      buf
    }

    override def merge(buf: java.util.TreeSet[(Long, Long)],
        other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
      val it = other.iterator()
      while (it.hasNext) { val e = it.next(); add(buf, e._1, e._2) }
      buf
    }

    override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
      val out = new Array[Any](buf.size())
      var i = 0
      val it = buf.iterator()
      while (it.hasNext) {
        val e = it.next()
        out(i) = InternalRow(e._1, e._2)
        i += 1
      }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size())
      bb.putInt(buf.size())
      val it = buf.iterator()
      while (it.hasNext) { val e = it.next(); bb.putLong(e._1); bb.putLong(e._2) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add((bb.getLong(), bb.getLong())); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKPairAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKPairAgg =
      copy(score = newChildren(0), id = newChildren(1))
  }

  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Bottom-k distinct values of `h` (a LONG hash column) as an ascending
    * array — one partial-aggregable pass, no window sort.
    */
  def kmvSketch(h: Column, k: Int): Column =
    column(KmvSketchAgg(expression(h), k).toAggregateExpression())

  /** Best k (score, id) pairs by (score DESC, id ASC), rank-ordered —
    * one partial-aggregable pass, no window sort.
    */
  def topKPair(score: Column, id: Column, k: Int): Column =
    column(TopKPairAgg(expression(score), expression(id), k)
      .toAggregateExpression())
}
