package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training corpus
  * runs before anything else: find emails / IPv4 addresses / phone-like
  * digit runs, count them per document, and replace them with typed
  * placeholders. (No reference analog; part of the added LLM-pipeline
  * surface.)
  *
  * Everything here is a per-row chain of codegen'd `regexp_replace` /
  * `regexp_count` builtins — no UDFs, no shuffle, embarrassingly
  * parallel at any scale; the scan cost is the corpus read itself.
  *
  * The patterns deliberately use only the regex subset with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
  * classes, bounded/unbounded greedy repetition, group repetition —
  * no backreferences, no lookaround. Both engines scan
  * leftmost-first/greedy, so match sets (and therefore counts and
  * redactions) are identical.
  *
  * Redaction is staged — emails first, then IPs, then phone runs, each
  * on the PREVIOUS stage's output — and each count runs on the text the
  * corresponding stage saw, so a digit run inside an email is never
  * double-counted as a phone number and the counts always agree with
  * the redacted text.
  */
object PiiScrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Word-bounded so digits embedded in alphanumeric tokens
    * ("v1.2.3.4000", order ids) are never touched; `\b` is the ASCII
    * word boundary in BOTH Java regex and RE2. */
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** 7..15 digits, optional leading + — the E.164 envelope.
    * Word-bounded: a digit run INSIDE a token ("ISBN97803064061") is
    * an identifier, not a phone number, and runs longer than 15 digits
    * are not phone numbers at all. */
  val phoneRe = "\\+?\\b[0-9]{7,15}\\b"

  def redactEmails(c: Column): Column = regexp_replace(c, emailRe, "<EMAIL>")
  def redactIps(c: Column): Column = regexp_replace(c, ipv4Re, "<IP>")
  def redactPhones(c: Column): Column = regexp_replace(c, phoneRe, "<PHONE>")

  /** Fully scrubbed text: emails, then IPs, then phone runs. */
  def redact(c: Column): Column = redactPhones(redactIps(redactEmails(c)))

  /** Per-document PII profile over `text`:
    * (id, n_emails, n_ips, n_phones, redacted_fp, changed) — counts per
    * category, the md5 of the scrubbed text (the full text stays in the
    * row), and whether anything was redacted. */
  def profile(df: DataFrame, text: Column, id: Column): DataFrame = {
    val t1 = redactEmails(text)
    val t2 = redactIps(t1)
    val t3 = redactPhones(t2)
    df.select(
      id.as("id"),
      regexp_count(text, lit(emailRe)).as("n_emails"),
      regexp_count(t1, lit(ipv4Re)).as("n_ips"),
      regexp_count(t2, lit(phoneRe)).as("n_phones"),
      md5(t3).as("redacted_fp"),
      (t3 =!= text).as("changed"))
  }
}
