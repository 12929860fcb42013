package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized invariants for [[PiiScrub]]: over seeded adversarial
  * strings (PII fragments glued with noise from the patterns' own
  * alphabets), redaction must be IDEMPOTENT and COMPLETE — no pattern
  * may match the redacted output, ever. These are the properties that
  * make a scrub pass trustworthy at corpus scale, where eyeballing
  * output is impossible.
  */
class PiiScrubPropertySpec extends SparkSpec {
  import spark.implicits._

  private val fragments = Vector(
    "a.b@c.example.com", "x@y", "10.1.2.3", "1.2.3.4.5.6.7.8",
    "+1-555-0199", "+1-555-019", "a@b@c", "10.1.2.3@host.example",
    "+1-555-0199@x.com", "..@..", "@", ".", "+1-", "999.999.999.999",
    "word", "1234", "a b", "")

  private def randomTexts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42) // fixed seed: failures reproduce
    val glue = Vector(" ", "", ".", "@", "-", "+", " x ", "0")
    (1 to n).map { _ =>
      (1 to 1 + rnd.nextInt(6)).map { _ =>
        fragments(rnd.nextInt(fragments.size)) +
          glue(rnd.nextInt(glue.size))
      }.mkString
    }
  }

  test("redaction is idempotent and leaves no matchable PII, over 500 adversarial strings") {
    val df = randomTexts(500).toDF("text")
      .select(col("text"), PiiScrub.redact(col("text")).as("r1"))
      .select(col("text"), col("r1"), PiiScrub.redact(col("r1")).as("r2"),
        PiiScrub.countEmails(col("r1")).as("e"),
        PiiScrub.countPhones(col("r1")).as("p"),
        PiiScrub.countIps(col("r1")).as("i"))
      .cache()
    val notIdempotent = df.filter(col("r1") =!= col("r2"))
      .select("text", "r1", "r2").collect()
    assert(notIdempotent.isEmpty,
      s"redact must be a fixed point after one pass; counterexamples: " +
        notIdempotent.take(3).mkString("; "))
    val survivors = df.filter(col("e") + col("p") + col("i") > 0)
      .select("text", "r1").collect()
    assert(survivors.isEmpty,
      s"no pattern may match redacted output; counterexamples: " +
        survivors.take(3).mkString("; "))
  }
}
