package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property tests for the CDC apply-changes operator (SURVEY §7.4.1):
  * last-writer-wins per key with delete tombstones, checked against a
  * plain-Scala reference model over seeded random changelogs
  * (out-of-order sequence numbers, duplicate keys, delete-then-reinsert).
  */
case class Change(k: Int, seq: Long, tie: Long, v: String, op: String)

class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  /** Random changelog with narrow key/seq ranges to force collisions. */
  private def randomLog(seed: Long, n: Int): Seq[Change] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      Change(
        k = rnd.nextInt(6),
        seq = rnd.nextInt(9).toLong, // collisions resolved by tie
        tie = i.toLong,              // unique arrival index
        v = rnd.alphanumeric.take(4).mkString,
        op = if (rnd.nextInt(5) == 0) "d" else "u")
    }
  }

  private def model(rows: Seq[Change]): Map[Int, Change] =
    rows.groupBy(_.k).map { case (k, rs) => k -> rs.maxBy(r => (r.seq, r.tie)) }

  test("latestByKey == reference model, and both impls agree") {
    for (seed <- 1L to 12L) {
      val rows = randomLog(seed, 60)
      val df = rows.toDF()
      val seqCols = Seq(col("seq"), col("tie"))
      val a = ApplyChanges.latestByKey(df, Seq("k"), seqCols)
        .as[Change].collect().map(c => c.k -> c).toMap
      val b = ApplyChanges.latestByKeyWindow(df, Seq("k"), seqCols)
        .as[Change].collect().map(c => c.k -> c).toMap
      val m = model(rows)
      assert(a == m, s"max_by impl vs model (seed=$seed)")
      assert(b == m, s"window impl vs model (seed=$seed)")
    }
  }

  test("applyChanges honors delete tombstones and except columns") {
    for (seed <- 20L to 28L) {
      val rows = randomLog(seed, 60)
      val out = ApplyChanges.applyChanges(
        rows.toDF(), Seq("k"), Seq(col("seq"), col("tie")),
        deleteExpr = col("op") === "d",
        exceptColumns = Seq("op", "tie"))
      assert(out.columns.toSet == Set("k", "seq", "v"))
      val got = out.select("k", "seq", "v").as[(Int, Long, String)]
        .collect().map(t => t._1 -> ((t._2, t._3))).toMap
      val exp = model(rows).collect {
        case (k, c) if c.op != "d" => k -> ((c.seq, c.v))
      }
      assert(got == exp, s"seed=$seed")
    }
  }

  test("a tombstone only deletes when it is the latest change") {
    val rows = Seq(
      Change(1, 10, 0, "a", "u"), Change(1, 5, 1, "x", "d"), // stale delete
      Change(2, 5, 2, "y", "u"), Change(2, 10, 3, "z", "d")) // live delete
    val out = ApplyChanges.applyChanges(rows.toDF(), Seq("k"),
      Seq(col("seq"), col("tie")), deleteExpr = col("op") === "d")
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a"))
  }

  /** SCD2 reference model: per key, sorted changelog → change points
    * (payload change, delete after live, or first row) → versions with
    * [start, end) bounds; deletes close but never open.
    */
  private def scd2Model(rows: Seq[Change])
      : Set[(Int, String, (Long, Long), Option[(Long, Long)])] =
    rows.groupBy(_.k).toSeq.flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r.seq, r.tie))
      val cps = sorted.foldLeft(Vector.empty[Change]) { (acc, r) =>
        val chg = acc.lastOption match {
          case None    => true
          case Some(p) => if (r.op == "d") p.op != "d"
                          else p.op == "d" || p.v != r.v
        }
        if (chg) acc :+ r else acc
      }
      cps.zipAll(cps.drop(1).map(Some(_)), null, None).collect {
        case (c, next) if c.op != "d" =>
          (k, c.v, (c.seq, c.tie), next.map(n => (n.seq, n.tie)))
      }
    }.toSet

  private def runScd2(rows: Seq[Change]) =
    ApplyChanges.applyChangesScd2(rows.toDF(), Seq("k"),
        Seq(col("seq"), col("tie")), deleteExpr = col("op") === "d",
        exceptColumns = Seq("op", "seq", "tie"))
      .select(col("k"), col("v"),
        col("__start.__seq0"), col("__start.__seq1"),
        col("__end.__seq0"), col("__end.__seq1"))
      .collect().map { r =>
        val end = if (r.isNullAt(4)) None else Some((r.getLong(4), r.getLong(5)))
        (r.getInt(0), r.getString(1), (r.getLong(2), r.getLong(3)), end)
      }.toSet

  test("applyChangesScd2 == reference model on random changelogs") {
    for (seed <- 1L to 12L) {
      val rows = randomLog(seed, 60)
      assert(runScd2(rows) == scd2Model(rows), s"seed=$seed")
    }
  }

  test("SCD2 open versions equal the type-1 snapshot") {
    for (seed <- 1L to 12L) {
      val rows = randomLog(seed, 60)
      val open = runScd2(rows).collect {
        case (k, v, _, None) => k -> v
      }.toMap
      val snap = ApplyChanges.applyChanges(rows.toDF(), Seq("k"),
          Seq(col("seq"), col("tie")), deleteExpr = col("op") === "d")
        .select("k", "v").as[(Int, String)].collect().toMap
      assert(open == snap, s"seed=$seed")
    }
  }

  test("SCD2 collapses identical consecutive payloads, splits on change") {
    val rows = Seq(
      Change(1, 1, 0, "a", "u"), Change(1, 2, 1, "a", "u"), // collapse
      Change(1, 3, 2, "b", "u"),                            // new version
      Change(1, 4, 3, "b", "d"),                            // close
      Change(1, 5, 4, "b", "u"))                            // reopen
    assert(runScd2(rows) == Set(
      (1, "a", (1L, 0L), Some((3L, 2L))),
      (1, "b", (3L, 2L), Some((4L, 3L))),
      (1, "b", (5L, 4L), None)))
  }
}
