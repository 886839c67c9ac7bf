package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnicodeExprsSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "Cafe\u0301 nai\u0308ve Zu\u0308rich"
  private val composed = "Caf\u00e9 na\u00efve Z\u00fcrich"

  test("nfc composes decomposed input to the canonical form") {
    val got = Seq(decomposed).toDF("t")
      .withColumn("n", UnicodeFns.nfc(col("t")))
      .select(col("n"), length(col("t")).as("raw_len"),
        length(col("n")).as("nfc_len"))
      .as[(String, Int, Int)].head()
    assert(got._1 == composed)
    assert(got._2 == decomposed.codePointCount(0, decomposed.length))
    assert(got._3 == got._2 - 3, "three combining marks must compose away")
  }

  test("nfc is idempotent and identity on normalized text") {
    val got = Seq(composed, "plain ascii", "").toDF("t")
      .select(col("t"), UnicodeFns.nfc(UnicodeFns.nfc(col("t"))).as("n"))
      .as[(String, String)].collect()
    got.foreach { case (t, n) => assert(n == t) }
  }

  test("foldAccents strips Latin diacritics to base letters") {
    val got = Seq(
      ("Caf\u00e9 na\u00efve Z\u00fcrich Sa\u0303o jalapen\u0303o A\u030Ase c\u030Cz\u030C",
        "Cafe naive Zurich Sao jalapeno Ase cz"),
      (decomposed, "Cafe naive Zurich"),   // decomposed input folds too
      ("no accents here", "no accents here")).toDF("t", "want")
      .select(UnicodeFns.foldAccents(col("t")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w, s"'$g' != '$w'") }
  }

  test("null propagates; dedup keys collide after normalization") {
    val df = Seq(Some(decomposed), Some(composed), None).toDF("t")
    val fps = df.select(md5(UnicodeFns.nfc(col("t"))).as("fp")).collect()
    assert(fps(0).getString(0) == fps(1).getString(0),
      "composed and decomposed spellings must share one dedup key")
    assert(fps(2).isNullAt(0))
  }
}
