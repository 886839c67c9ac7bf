package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.RepetitionProfile

class RepetitionProfileSpec extends SparkSpec {
  import spark.implicits._

  private def ref(text: String): (Long, Long, Long, Long, Long) = {
    val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
    val toks = norm.split(" ", -1)
    val total = norm.length.toLong
    def grams(n: Int): Seq[String] =
      (1 to math.max(toks.length - n + 1, 1))
        .map(i => toks.slice(i - 1, i - 1 + n).mkString(" "))
    val c2 = grams(2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (topG, topC) = c2.toSeq.sortBy { case (g, c) => (-c, g) }.head
    val top2Mass = topC * topG.length
    val dup5 = grams(5).groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L)
      .map { case (g, c) => c * g.length }.sum
    def milli(m: Long) = if (total == 0L) 0L else m * 1000L / total
    (total, topC, milli(top2Mass), dup5, milli(dup5))
  }

  private val docs = Seq(
    (1L, "buy now buy now buy now buy now limited offer"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3L, "alpha beta gamma delta alpha beta gamma delta alpha beta gamma delta"),
    (4L, "word"),
    (5L, "  "))

  test("matches a driver-side re-derivation") {
    val got = RepetitionProfile.profile(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    docs.foreach { case (id, t) =>
      assert(got(id) == ref(t), s"doc $id: got ${got(id)}, want ${ref(t)}")
    }
  }

  test("spam repeats dominate, natural prose stays low") {
    val got = RepetitionProfile.profile(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .select("id", "top2_milli", "dup5_milli")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 > 500L, s"spam top-bigram ${got(1L)}")   // "buy now" x4
    assert(got(3L)._2 > 400L, s"template dup5 ${got(3L)}")
    assert(got(2L)._1 < 250L && got(2L)._2 == 0L, s"prose ${got(2L)}")
    // single token: the one "bigram" IS the whole doc (mass = chars,
    // milli = 1000) but occurs once — no duplication signal
    assert(got(4L) == ((1000L, 0L)))
  }
}
