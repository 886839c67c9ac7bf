package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.HostDedup

class HostDedupSpec extends SparkSpec {
  import spark.implicits._

  test("hostOf strips scheme, userinfo, port, path, query, fragment") {
    val cases = Seq(
      "https://Example.COM/path?q=1#f" -> "example.com",
      "http://user:pw@host.net:8080/x" -> "host.net",
      "ftp://a.b.c" -> "a.b.c",
      "bare-host.org/path" -> "bare-host.org",
      "no-url-at-all" -> "no-url-at-all",
      "https://h.io?q" -> "h.io",
      "scheme+v1.2://H.DE#frag" -> "h.de",
      "" -> "",
      // round-15 hardening: real-crawl URL shapes
      "http://[::1]:8080/x" -> "[::1]", // bracketed IPv6 keeps its brackets
      "http://user@[2001:DB8::1]:80/y" -> "[2001:db8::1]",
      "[::1]:443/x" -> "[::1]", // scheme-less IPv6 literal
      "//example.com/path" -> "example.com", // scheme-relative
      "HTTPS://Example.COM/x" -> "example.com", // uppercase scheme
      "example.com:8080" -> "example.com", // bare host:port — ':' is no scheme
      "[abc" -> "[abc") // unclosed bracket falls back to the reg-name arm
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), HostDedup.hostOf(col("url")).as("host"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, h) =>
      assert(got(u) == h, s"hostOf($u) = ${got(u)}, wanted $h")
    }
  }

  test("dedupAndCap keeps the first crawl per (host, content) and caps hosts") {
    // host A: page "x" crawled 3 times (ids 1, 5, 9), page "y" once
    // (id 3), page "z" once (id 7); host B: one page. cap = 2 on a
    // quality that ranks z > y > x.
    val crawl = Seq(
      (1L, "https://a.com/p1", "x", 10L),
      (5L, "https://a.com/p1?again", "x", 10L),
      (9L, "http://crawler@A.COM/p1", "x", 10L),
      (3L, "https://a.com/p2", "y", 20L),
      (7L, "https://a.com/p3", "z", 30L),
      (4L, "https://b.com/p", "w", 5L))
      .toDF("doc_id", "url", "text", "quality")
    val got = HostDedup.dedupAndCap(
        crawl, col("url"), col("text"), "doc_id", col("quality"), cap = 2)
      .select("doc_id", "host", "rank", "keep")
      .as[(Long, String, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // dups of "x" collapse to the lowest id (1); 5 and 9 are gone
    assert(!got.contains(5L) && !got.contains(9L), s"re-crawls survived: $got")
    assert(got.keySet == Set(1L, 3L, 7L, 4L))
    // host a.com ranking: z(30) -> 1, y(20) -> 2, x(10) -> 3 (capped)
    assert(got(7L) == ("a.com", 1, true))
    assert(got(3L) == ("a.com", 2, true))
    assert(got(1L) == ("a.com", 3, false))
    assert(got(4L) == ("b.com", 1, true))
  }

  test("the decision frame is narrow: text never reaches the windows") {
    val crawl = Seq((1L, "https://a.com/p", "some text", 1L))
      .toDF("doc_id", "url", "text", "quality")
    val plan = HostDedup.dedupAndCap(
        crawl, col("url"), col("text"), "doc_id", col("quality"), cap = 2)
      .queryExecution.optimizedPlan
    // after the initial digest projection no plan node carries the
    // text column — the shuffled rows are (id, host, digest, quality)
    val above = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(above.nonEmpty)
    above.foreach(w => assert(
      !w.output.map(_.name).contains("text"),
      s"window carries text: ${w.output.map(_.name)}"))
  }
}
