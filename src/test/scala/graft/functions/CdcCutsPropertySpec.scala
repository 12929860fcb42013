package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized invariants for the native [[NativeExpressions.CdcCuts]]
  * kernel beyond the real-corpus cross-check in MultimodalSpec: over
  * seeded random ASCII blobs (including boundary-free, all-boundary
  * and window-edge lengths) the native cut arrays must equal the HOF
  * reference bit-for-bit, and every cut array must satisfy the
  * structural chunking contract — strictly ascending, ending exactly
  * at n, every interior cut a genuine boundary position.
  */
class CdcCutsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomBlobs(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(1337) // fixed seed: failures reproduce
    // a SMALL alphabet makes 8-byte windows repeat, exercising the
    // dedup/ordering edges (repeated boundaries, boundary at n)
    val alphabets = Vector("ab", "abc ", "abcdefgh",
      (' ' to '~').mkString,
      // non-ASCII: both native kernel and HOF reference live in the
      // UTF-8 BYTE domain, so multi-byte code points must agree too
      "aé€ 東ß")
    (1 to n).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.size))
      val len = rnd.nextInt(200)
      (1 to len).map(_ => a(rnd.nextInt(a.length))).mkString
    } ++ Seq("", "abcdefg", "abcdefgh", "a" * 64) // hard edges: n<8, n==8
  }

  test("native cuts equal the HOF reference on seeded random blobs") {
    val df = randomBlobs(400).toDF("text")
      .withColumn("n", octet_length(col("text").cast("binary")).cast("long"))
      .filter(col("n") >= 8)
      .select(col("text"), col("n"),
        NativeExpressions.cdcCuts(col("text"), 8, 64).as("native"),
        graft.queries.MultimodalQueries.cdcCutsHof.as("hof"))
    assert(df.count() > 100)
    assert(df.filter(!(col("native") === col("hof"))).count() == 0,
      "native and HOF cut arrays must be bit-identical")
  }

  test("cut arrays satisfy the structural chunking contract") {
    val rows = randomBlobs(200)
      .filter(_.getBytes("UTF-8").length >= 8)
      .toDF("text")
      .select(col("text"),
        NativeExpressions.cdcCuts(col("text"), 8, 64).as("cuts"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val cuts = r.getSeq[Long](1)
      // positions are BYTE offsets: the final cut closes the UTF-8
      // byte length, not the character count
      assert(cuts.nonEmpty &&
          cuts.last == text.getBytes("UTF-8").length,
        "the final cut must close the blob exactly")
      assert(cuts == cuts.sorted && cuts.distinct == cuts,
        "cuts must be strictly ascending")
      assert(cuts.head >= 8, "no chunk may end before one full window")
    }
  }

  test("blobs shorter than the window yield NULL, never a bogus cut array") {
    val df = Seq("", "a", "abcdefg").toDF("text")
      .select(NativeExpressions.cdcCuts(col("text"), 8, 64).as("cuts"))
    assert(df.filter(col("cuts").isNotNull).count() == 0)
  }

  test("bad parameters fail at construction; non-string child fails analysis") {
    // mod <= 0 / win <= 0 must throw when the expression is BUILT (both
    // the Scala API and the graft_cdc_cuts SQL registration construct
    // through here), not as per-row Arithmetic/IndexOutOfBounds deep in
    // execution
    intercept[IllegalArgumentException] {
      NativeExpressions.cdcCuts(col("text"), 0, 64)
    }
    intercept[IllegalArgumentException] {
      NativeExpressions.cdcCuts(col("text"), 8, 0)
    }
    graft.GraftExtensions.register(spark) // idempotent; SQL-path check
    intercept[IllegalArgumentException] {
      spark.sql("SELECT graft_cdc_cuts('abcdefgh', -1, 64)").collect()
    }
    // a LONG child must be rejected by the analyzer (checkInputDataTypes),
    // not surface as a runtime ClassCastException in the kernel
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("x")
        .select(NativeExpressions.cdcCuts(col("x"), 8, 64)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
