package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.Readability

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def ref(text: String): (Long, Long, Long, Option[Double]) = {
    val words = text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ", -1).count(_.nonEmpty).toLong
    val sentences = math.max(
      "[.!?]+".r.findAllIn(text.toLowerCase).size.toLong, 1L)
    val syllables = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong
    val fk = if (words == 0L) None
    else Some(math.floor((0.39 * (words.toDouble / sentences.toDouble) +
      11.8 * (syllables.toDouble / words.toDouble) - 15.59) * 1e3) / 1e3)
    (words, sentences, syllables, fk)
  }

  private val docs = Seq(
    (1L, "The cat sat on the mat. It was happy!"),
    (2L, "Incomprehensibility characterizes bureaucratic administration; " +
      "nevertheless, organizational particularities predominate."),
    (3L, "no terminal punctuation here"),
    (4L, "   "))

  test("matches a driver-side re-derivation") {
    val got = Readability.grade(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    docs.foreach { case (id, t) =>
      assert(got(id) == ref(t), s"doc $id")
    }
  }

  test("polysyllabic prose grades harder than simple prose") {
    val got = Readability.grade(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .select("id", "fk_milli").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(2L).get > got(1L).get + 5.0,
      s"bureaucratese ${got(2L)} vs cat ${got(1L)}")
    assert(got(4L).isEmpty, "blank doc must be NULL")
  }

  // the shuffle-free plan pin lives in PlanShapeSpec ("qt57: pure
  // projection"), against the parquet fixture where ensureMin no-ops
}
