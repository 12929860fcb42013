package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PiiScrub unit behavior on hand-checked strings: counts on raw text,
  * placeholder substitution order, and the no-PII identity path.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): (Int, Int, Int, String) = {
    val r = Seq(s).toDF("text")
      .select(PiiScrub.countEmails(col("text")).as("e"),
        PiiScrub.countPhones(col("text")).as("p"),
        PiiScrub.countIps(col("text")).as("i"),
        PiiScrub.redact(col("text")).as("r"))
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("each class detected and replaced with its typed placeholder") {
    val (e, p, i, r) =
      scrub("mail a.b@c.example.com call +1-555-0199 host 10.1.2.3 done")
    assert((e, p, i) == (1, 1, 1))
    assert(r == "mail [EMAIL] call [PHONE] host [IP] done")
  }

  test("text without PII passes through unchanged") {
    val s = "the fast key order sort table scan merge"
    assert(scrub(s) == (0, 0, 0, s))
  }

  test("multiple hits count separately; dotted quad inside an email is not double-redacted") {
    val (e, p, i, r) = scrub("x@y.example z@w.example 10.0.0.1 10.0.0.2")
    assert((e, p, i) == (2, 0, 2))
    assert(r == "[EMAIL] [EMAIL] [IP] [IP]")
    // a digits-and-dots local part is consumed by the email pass first,
    // so the later IP pass cannot match inside it
    val (e2, _, i2, r2) = scrub("10.1.2.3@host.example end")
    assert(e2 == 1 && i2 == 1) // counts are on RAW text: both patterns match
    assert(r2 == "[EMAIL] end") // redaction: email pass wins, no [IP] remnant
  }
}
