package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{RollingMinHash, RollingMinHashImpl}
import graft.operators.text.TextAnalysis
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox, jumps over the lazy dog!"),
    (2L, "der hund und die katze ist ein tier mit fell"),
    (3L, "le chat est dans la maison et pas pour le chien"),
    (4L, "el perro y la casa es una cosa para los gatos"),
    (5L, "12345 !!! ??? 67890"),
    (6L, "")
  ).toDF("doc_id", "text")

  private def one[T](c: org.apache.spark.sql.Column, id: Long): T =
    docs.filter(col("doc_id") === id).select(c.as("v")).head().getAs[T]("v")

  test("token counts") {
    assert(one[Int](TextAnalysis.tokenCount(col("text")), 1L) == 9)
    assert(one[Int](TextAnalysis.tokenCount(col("text")), 5L) == 4)
    assert(one[Int](TextAnalysis.tokenCount(col("text")), 6L) == 1) // [""] convention
  }

  test("bpe-ish token count separates words, digits, marks") {
    // "12345 !!! ??? 67890" -> 2 digit runs + 6 marks
    assert(one[Int](TextAnalysis.bpeTokenCount(col("text")), 5L) == 8)
  }

  test("punct and digit counts") {
    assert(one[Int](TextAnalysis.punctCount(col("text")), 1L) == 2) // comma + bang
    assert(one[Int](TextAnalysis.digitCount(col("text")), 5L) == 10)
  }

  test("language guess picks the stopword-heavy language") {
    val preds = docs.filter(col("doc_id") <= 4)
      .select(col("doc_id"), TextAnalysis.langGuess(col("text")).as("p"))
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "fr")
    assert(preds(4L) == "es")
  }

  test("quality score is in [0,1] and penalizes digit/punct noise") {
    val q = docs.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(5L), "clean prose must outscore digit soup")
  }

  test("rolling min-hash fingerprint is shift-invariant for shared windows") {
    val base = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopqrstuvwxyz"
    val a = RollingMinHashImpl.compute(UTF8String.fromString(base), 16)
    val b = RollingMinHashImpl.compute(UTF8String.fromString("PREFIX " + base + " SUFFIX"), 16)
    // the minimizing 16-window of `base` is still present => min can only
    // get smaller or stay equal with extra windows; equality is expected
    // unless a prefix/suffix window hashes lower
    assert(RollingMinHashImpl.compute(UTF8String.fromString(base), 16) == a)
    assert(b <= a)
    // column API evaluates the same value
    val viaCol = docs.filter(col("doc_id") === 1)
      .select(RollingMinHash(lit(base), 16).as("h")).as[Long].head()
    assert(viaCol == a)
  }

  test("fingerprints: identical normalized text, identical hashes") {
    val df = Seq(("a  b", 1), ("A B", 2)).toDF("text", "i")
    val fps = df.select(TextAnalysis.md5Fingerprint(col("text")).as("f"))
      .as[String].collect()
    assert(fps(0) == fps(1))
  }
}
