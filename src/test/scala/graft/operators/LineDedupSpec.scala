package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.LineDedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("shared lines are cut from every doc, order preserved") {
    val banner = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"alpha body one\n$banner\nalpha body two"),
      (2L, s"$banner\nbeta body"),
      (3L, "gamma body only")).toDF("id", "text")
    val out = LineDedup.profile(docs, col("text"), col("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L)) // n_lines
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 0L)) // n_removed
    assert(out(0).getString(3) == md5Of("alpha body one\nalpha body two"))
    assert(out(1).getString(3) == md5Of("beta body"))
    assert(out(2).getString(3) == md5Of("gamma body only"))
  }

  test("a line repeated within ONE doc votes once and survives") {
    val docs = Seq(
      (1L, "echo echo line\necho echo line\nunique tail"),
      (2L, "other content")).toDF("id", "text")
    val out = LineDedup.profile(docs, col("text"), col("id"))
      .filter(col("id") === 1).head()
    // two copies + tail, nothing shared across docs -> nothing removed
    assert(out.getLong(1) == 3L && out.getLong(2) == 0L)
    assert(out.getString(3) ==
      md5Of("echo echo line\necho echo line\nunique tail"))
  }

  test("an all-boilerplate doc keeps its row with empty-string hash") {
    val docs = Seq(
      (1L, "the banner"),
      (2L, "the banner"),
      (3L, "real content")).toDF("id", "text")
    val out = LineDedup.profile(docs, col("text"), col("id"))
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(2) == 1L && out(0).getString(3) == md5Of(""))
    assert(out(1).getLong(2) == 1L && out(1).getString(3) == md5Of(""))
    assert(out(2).getLong(2) == 0L)
  }

  test("newline segmenter trims and drops blank lines") {
    val seg = Seq("  a line  \n\n   \nanother").toDF("t")
      .select(LineDedup.newlineSegmenter(col("t")).as("s"))
      .as[Seq[String]].head()
    assert(seg == Seq("a line", "another"))
  }

  test("token-window segmenter covers every token in disjoint windows") {
    val seg = Seq(("w1 " * 25).trim).toDF("t")
      .select(LineDedup.tokenWindowSegmenter(10)(col("t")).as("s"))
      .as[Seq[String]].head()
    assert(seg.length == 3)
    assert(seg(0) == ("w1 " * 10).trim && seg(2) == ("w1 " * 5).trim)
  }
}
