package graft.operators

import graft.SparkSpec

/** AS-OF join semantics on a hand-checked fixture: latest-at-or-before
  * match, inclusive equal-timestamp match, NULL when no prior right row,
  * keys never cross.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left row per key") {
    val quotes = Seq( // (key, ts, px)
      (1L, 10L, 100), (1L, 20L, 200), (2L, 5L, 500))
      .toDF("k", "q_ts", "px")
    val trades = Seq( // (key, ts, id)
      (1L, 15L, 7), // between quotes → px 100
      (1L, 25L, 8), // after both → px 200
      (1L, 20L, 9), // EXACTLY at a quote → inclusive → px 200
      (1L, 5L, 10), // before any quote → null
      (3L, 50L, 11) // key with no quotes at all → null
    ).toDF("k", "t_ts", "id")
    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts")
      .collect()
      .map(r => r.getAs[Int]("id") ->
        (if (r.isNullAt(r.fieldIndex("px"))) None else Some(r.getAs[Int]("px"))))
      .toMap
    assert(got == Map(
      7 -> Some(100), 8 -> Some(200), 9 -> Some(200),
      10 -> None, 11 -> None))
  }

  test("forward direction picks the earliest right row at-or-after") {
    val quotes = Seq((1L, 10L, 100), (1L, 20L, 200), (2L, 5L, 500))
      .toDF("k", "q_ts", "px")
    val trades = Seq(
      (1L, 15L, 7), // between quotes → forward px 200
      (1L, 25L, 8), // after both → null
      (1L, 10L, 9), // EXACTLY at a quote → inclusive → px 100
      (1L, 5L, 10), // before any → px 100
      (3L, 50L, 11) // no quotes for key → null
    ).toDF("k", "t_ts", "id")
    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts",
        direction = "forward")
      .collect()
      .map(r => r.getAs[Int]("id") ->
        (if (r.isNullAt(r.fieldIndex("px"))) None else Some(r.getAs[Int]("px"))))
      .toMap
    assert(got == Map(
      7 -> Some(200), 8 -> None, 9 -> Some(100),
      10 -> Some(100), 11 -> None))
  }

  test("nearest direction picks the smaller |gap|, ties go backward") {
    val quotes = Seq((1L, 10L, 100), (1L, 20L, 200))
      .toDF("k", "q_ts", "px")
    val trades = Seq(
      (1L, 12L, 7), // gaps 2 vs 8 → backward 100
      (1L, 18L, 8), // gaps 8 vs 2 → forward 200
      (1L, 15L, 9), // EQUAL gaps → backward wins → 100
      (1L, 3L, 10), // only forward exists → 100
      (1L, 99L, 11) // only backward exists → 200
    ).toDF("k", "t_ts", "id")
    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts",
        direction = "nearest")
      .collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[Int]("px")).toMap
    assert(got == Map(
      7 -> 100, 8 -> 200, 9 -> 100, 10 -> 100, 11 -> 200))
  }

  test("tolerance rejects too-far matches after direction selection") {
    val quotes = Seq((1L, 10L, 100), (1L, 50L, 500))
      .toDF("k", "q_ts", "px")
    val trades = Seq(
      (1L, 12L, 7), // backward gap 2 ≤ 5 → 100
      (1L, 30L, 8), // backward gap 20 > 5 → null (no fallback)
      (1L, 48L, 9) // nearest picks 50 (gap 2) → 500
    ).toDF("k", "t_ts", "id")
    def got(dir: String) =
      AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts", dir,
          toleranceUs = Some(5L))
        .collect()
        .map(r => r.getAs[Int]("id") ->
          (if (r.isNullAt(r.fieldIndex("px"))) None
           else Some(r.getAs[Int]("px")))).toMap
    assert(got("backward") ==
      Map(7 -> Some(100), 8 -> None, 9 -> None))
    assert(got("nearest") ==
      Map(7 -> Some(100), 8 -> None, 9 -> Some(500)),
      "a too-far nearest candidate must NOT fall back to the far side")
  }

  test("forward is backward's time-mirror (property on random data)") {
    val rnd = new scala.util.Random(7)
    val quotes = (1 to 60).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, i))
      .distinctBy(q => (q._1, q._2)) // contract: unique (key, ts)
      .toDF("k", "q_ts", "px")
    val trades = (1 to 80).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, 1000 + i))
      .toDF("k", "t_ts", "id")
    val fwd = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts",
        direction = "forward")
      .select("id", "px").collect()
      .map(r => r.getAs[Int]("id") ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Int]("px")))).toMap
    // mirror: negate both time axes and run backward
    val mirrored = AsOfJoin.asOf(
        trades.withColumn("t_ts", -$"t_ts"),
        quotes.withColumn("q_ts", -$"q_ts"),
        Seq("k"), "t_ts", "q_ts")
      .select("id", "px").collect()
      .map(r => r.getAs[Int]("id") ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Int]("px")))).toMap
    assert(fwd == mirrored)
  }

  test("TimestampType inputs keep sub-second precision") {
    // a quote 500ms AFTER the trade but within the same second must NOT
    // match (a seconds-truncating cast would wrongly fill it)
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val quotes = Seq((1L, ts("2024-01-01 10:00:00.7"), 100))
      .toDF("k", "q_ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00.2"), 7), // before the quote → null
      (1L, ts("2024-01-01 10:00:00.7"), 8), // exactly at it → 100
      (1L, ts("2024-01-01 10:00:01.0"), 9)) // after it → 100
      .toDF("k", "t_ts", "id")
    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts")
      .collect()
      .map(r => r.getAs[Int]("id") ->
        (if (r.isNullAt(r.fieldIndex("px"))) None else Some(r.getAs[Int]("px"))))
      .toMap
    assert(got == Map(7 -> None, 8 -> Some(100), 9 -> Some(100)))
  }

  test("output keeps every left row and all left columns") {
    val quotes = Seq((1L, 10L, 1.5)).toDF("k", "q_ts", "px")
    val trades = Seq((1L, 15L, 7, "x"), (1L, 16L, 8, "y"))
      .toDF("k", "t_ts", "id", "note")
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "q_ts")
    assert(out.columns.toSeq == Seq("k", "t_ts", "id", "note", "px"))
    assert(out.count() == 2)
  }
}
