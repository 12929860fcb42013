package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded random lifecycle fuzz for the DSv2 connector: at EVERY
  * version of a randomly evolved managed table (appends, full-replace
  * commits, DV deletes, merges — including a schema evolution), a
  * `format("graft")` read of that version must equal
  * [[ManagedTable.read]] row-for-row, and a random pushed range
  * filter must equal the full scan filtered after the fact — i.e.
  * stats pruning may only ever drop provably-empty files, under every
  * history the lifecycle can produce, not just the handcrafted specs.
  */
class GraftDataSourceFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  private def assertSameAsManaged(dir: String, v: Int, clue: String,
      probe: Option[(Long, Long)]): Unit = {
    val got = spark.read.format("graft").option("versionAsOf", v)
      .load(dir)
    val want = ManagedTable.read(spark, dir, Some(v))
    assert(sortedRows(got) == sortedRows(want), s"$clue: full scan @v$v")
    probe.foreach { case (lo, hi) =>
      val pred: Column = col("k") >= lo && col("k") <= hi
      assert(sortedRows(got.filter(pred)) ==
        sortedRows(want.filter(pred)),
        s"$clue: pruned range [$lo,$hi] @v$v")
    }
  }

  Seq(11, 23).foreach { seed =>
    test(s"random lifecycle: connector == ManagedTable.read at every version (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-dsvfuzz$seed")
        .toString + "/t"
      def rows(n: Int, wide: Boolean): DataFrame = {
        val base = (1 to n).map { _ =>
          val k = rnd.nextInt(40).toLong
          (k, s"s$k-${rnd.nextInt(1000)}", rnd.nextLong(1L << 40),
            rnd.nextInt(100))
        }
        val df = base.toDF("k", "s", "seq", "i")
          .withColumn("emb", when(col("i") % 3 === 0,
            lit(null).cast("array<float>"))
            .otherwise(array(col("i").cast("float"),
              col("k").cast("float"))))
        if (wide) df.withColumn("extra", concat(lit("x"), col("k")))
        else df
      }
      ManagedTable.commit(rows(30, wide = false), dir)
      var evolved = false
      (1 to 8).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => ManagedTable.appendCommit(
            rows(10 + rnd.nextInt(30), evolved).coalesce(
              1 + rnd.nextInt(3)), dir)
          case 1 => ManagedTable.commit(
            rows(20 + rnd.nextInt(30), evolved), dir)
          case 2 =>
            // DV delete; may be a no-op commit when nothing matches
            ManagedTable.deleteWhere(spark, dir,
              col("k") % (2 + rnd.nextInt(5)) === rnd.nextInt(3))
          case 3 =>
            evolved = true
            ManagedTable.merge(rows(15, wide = true), dir,
              keys = Seq("k"), sequenceBy = Seq(col("seq")))
        }
        val v = ManagedTable.versions(spark, dir).last
        val lo = rnd.nextInt(30).toLong
        assertSameAsManaged(dir, v, s"seed $seed step $step",
          Some((lo, lo + rnd.nextInt(15))))
      }
      // and the whole history stays readable after the churn
      ManagedTable.versions(spark, dir).foreach { v =>
        assertSameAsManaged(dir, v, s"seed $seed history", None)
      }
    }
  }
}
