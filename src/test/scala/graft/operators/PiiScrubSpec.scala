package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.PiiScrub

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "mail me at alice.smith+spam@sub.example.co.uk or bob@x.io thanks"),
    (2L, "server 192.168.001.1 and 10.0.0.255 replied"),
    (3L, "call +14155551234 or 0800123456 now"),
    (4L, "no pii here at all"),
    (5L, "combo a@b.org from 1.2.3.4 dialing 7654321")
  ).toDF("doc_id", "text")

  private lazy val red = docs.select(
    col("doc_id"), PiiScrub.redact(col("text")).as("r")).as[(Long, String)]
    .collect().toMap

  test("emails are detected and redacted, including subaddress and multi-label domains") {
    assert(red(1L) == "mail me at <EMAIL> or <EMAIL> thanks")
  }

  test("ipv4 addresses are redacted; digits inside them never count as phones") {
    assert(red(2L) == "server <IP> and <IP> replied")
    val r = PiiScrub.profile(docs.filter($"doc_id" === 2), col("text"), col("doc_id"))
      .select("n_emails", "n_ips", "n_phones").as[(Int, Int, Int)].head()
    assert(r == ((0, 2, 0)))
  }

  test("phone-like digit runs are redacted with and without +") {
    assert(red(3L) == "call <PHONE> or <PHONE> now")
  }

  test("clean text is untouched and flagged unchanged") {
    assert(red(4L) == "no pii here at all")
    val r = PiiScrub.profile(docs.filter($"doc_id" === 4), col("text"), col("doc_id"))
      .select("changed").as[Boolean].head()
    assert(!r)
  }

  test("staged counts match the staged redaction") {
    val r = PiiScrub.profile(docs.filter($"doc_id" === 5), col("text"), col("doc_id"))
      .select("n_emails", "n_ips", "n_phones", "changed")
      .as[(Int, Int, Int, Boolean)].head()
    assert(r == ((1, 1, 1, true)))
    assert(red(5L) == "combo <EMAIL> from <IP> dialing <PHONE>")
  }

  test("digit runs inside tokens and over-long runs are NOT phone numbers") {
    val tricky = Seq(
      (21L, "ISBN9780306406157 catalogued on 20260812"),
      (22L, "order ABC12345678 total 1234567890123456789"),
      (23L, "semver v1.2.3.4000 is not an address")
    ).toDF("doc_id", "text")
    val red = tricky.select(col("doc_id"), PiiScrub.redact(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    // embedded run (ISBN...) protected; standalone 8-digit date still
    // matches the envelope (dates are indistinguishable from IDs here)
    assert(red(21L) == "ISBN9780306406157 catalogued on <PHONE>")
    // embedded in alphanumeric token + >15-digit run: both protected
    assert(red(22L) == "order ABC12345678 total 1234567890123456789")
    // version-ish dotted quad inside a token is not an IP
    assert(red(23L) == "semver v1.2.3.4000 is not an address")
  }

  test("profile is a map-only plan — no shuffle, no UDFs") {
    val plan = PiiScrub.profile(docs, col("text"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
