package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.RuleClean

class RuleCleanSpec extends SparkSpec {
  import spark.implicits._

  private def profile(docs: Seq[(Long, String)]) =
    RuleClean.profile(docs.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .as[(Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("line rules: punctuation, min words, blacklist") {
    val got = profile(Seq(
      (1L, "this long sentence ends with a period.\nno terminal punct here\nshort line.\nplease enable javascript now ok.")))
    // 4 lines; only the first passes (2nd no punct, 3rd 2 words, 4th blacklist)
    assert(got(1L) == ((4L, 1L, true)))
  }

  test("doc gates: curly braces and lorem ipsum kill the document") {
    val got = profile(Seq(
      (1L, "a fine surviving sentence with many words here.\nvar x = { 1 }"),
      (2L, "a fine surviving sentence with many words here.\nLorem Ipsum dolor."),
      (3L, "a fine surviving sentence with many words here.")))
    assert(got(1L)._3 == false) // curly
    assert(got(2L)._3 == false) // lorem ipsum (case-insensitive)
    assert(got(3L) == ((1L, 1L, true)))
  }

  test("no surviving lines fails the minKeptLines gate; md5 is of empty") {
    val got = RuleClean.profile(
        Seq((7L, "word salad with no punctuation at all")).toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .select("doc_keep", "clean_md5").as[(Boolean, String)].head()
    assert(!got._1)
    assert(got._2 == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("clean keeps exactly the doc_keep=true rows") {
    val docs = Seq(
      (1L, "a fine surviving sentence with many words here."),
      (2L, "junk { junk }"),
      (3L, "too short.")).toDF("doc_id", "text")
    val kept = RuleClean.clean(docs, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("whole operator is one shuffle-free codegen stage") {
    val docs = Seq((1L, "x.")).toDF("doc_id", "text")
    val plan = RuleClean.profile(docs, col("text"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
