package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.PerplexityFilter

class PerplexityFilterSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side re-derivation with the same conventions. */
  private def ref(
      texts: Seq[(Long, String)], v: Int): Map[Long, (Long, Double)] = {
    def r6(x: Double) = math.floor(x * 1e6) / 1e6
    def r4(x: Double) = math.floor(x * 1e4) / 1e4
    val toks = texts.map { case (id, t) =>
      id -> t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
    }
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cnt.values.sum.toDouble
    val voc = cnt.toSeq.sortBy { case (t, n) => (-n, t) }.take(v)
      .map { case (t, n) => t -> r6(math.log(n / total)) }.toMap
    val olp = r6(math.log(1.0 / total))
    toks.map { case (id, ts) =>
      val s = ts.foldLeft(0.0)((acc, t) => acc + voc.getOrElse(t, olp))
      id -> ((ts.size.toLong, r4(-s / ts.size)))
    }.toMap
  }

  test("matches a driver-side re-derivation, OOV floored") {
    val texts = Seq(
      (1L, "the quick fox and the lazy dog"),
      (2L, "the the the the"),
      (3L, "zyzzyva qwerty"))  // all OOV at v=3
    val got = PerplexityFilter.profile(
        texts.toDF("doc_id", "text"), col("text"), col("doc_id"),
        vocabSize = 3, tau = 3.6)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == ref(texts, 3))
  }

  test("repetitive text scores lower CE than rare-token text and gates") {
    val texts = Seq(
      (1L, "common common common common common"),
      (2L, "aa bb cc dd ee ff gg hh"))
    val got = PerplexityFilter.profile(
        texts.toDF("doc_id", "text"), col("text"), col("doc_id"),
        vocabSize = 1, tau = 1.0)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._3 < got(2L)._3)
    assert(got(1L)._4 && !got(2L)._4)
  }
}
