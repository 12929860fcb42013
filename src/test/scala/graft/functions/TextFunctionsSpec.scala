package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PII detection/redaction — the synthetic corpus contains no PII, so the
  * oracle harness can't exercise positives; this spec pins the behavior on
  * crafted examples instead.
  */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Int, Int, Int, String) = {
    val r = Seq(text).toDF("text")
      .select(TextFunctions.piiCounts(col("text")).as("c"),
        TextFunctions.redactPii(col("text")).as("red"))
      .select("c.n_emails", "c.n_ipv4", "c.n_phones", "red")
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("emails are counted and redacted") {
    val (e, i, p, red) = one("contact alice.smith+spam@sub.example.co for info")
    assert((e, i, p) === (1, 0, 0))
    assert(red === "contact <EMAIL> for info")
  }

  test("ipv4 addresses are counted and redacted") {
    val (e, i, p, red) = one("server at 192.168.0.1 and 10.0.0.255 down")
    assert((e, i, p) === (0, 2, 0))
    assert(red === "server at <IP> and <IP> down")
  }

  test("international phone numbers are counted and redacted") {
    val (e, i, p, red) = one("call +1 (415) 555-0199 now")
    assert((e, i, p) === (0, 0, 1))
    assert(red === "call <PHONE> now")
  }

  test("mixed PII: email host is not half-eaten by the IP pattern") {
    val (e, i, p, red) = one("bob@mail.example.com from 8.8.8.8 dials +44 20 7946 0958")
    assert((e, i, p) === (1, 1, 1))
    assert(red === "<EMAIL> from <IP> dials <PHONE>")
  }

  test("counts reconcile with redaction: PII embedded in an email counts once") {
    // "+12345678" inside the email local part and the IP-shaped host must
    // not double-count — piiCounts runs each pattern over the previous
    // pattern's redaction, mirroring redactPii's replacement order
    val (e, i, p, red) = one("mail alice+12345678@10.0.0.1.example.com now")
    assert((e, i, p) === (1, 0, 0))
    assert(red === "mail <EMAIL> now")
  }

  test("clean text is untouched") {
    val s = "the 3 quick files ran fast. version 1.2 shipped"
    val (e, i, p, red) = one(s)
    assert((e, i, p) === (0, 0, 0))
    assert(red === s)
  }
}
