package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.ScriptProfile

class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(docs: Seq[(Long, String)]) =
    ScriptProfile.profile(docs.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long, Long, Long, Long, String, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("counts each script class and picks the dominant") {
    val got = profile(Seq(
      (1L, "hello мир"),        // 5 latin, 3 cyrillic
      (2L, "机器学习 ok"),       // 4 han, 2 latin
      (3L, "αλφα"),             // 4 greek
      (4L, "12 34")))           // digits only
    assert(got(1L)._2 == 5 && got(1L)._3 == 3 && got(1L)._8 == "latin")
    assert(got(2L)._4 == 4 && got(2L)._8 == "han")
    assert(got(3L)._5 == 4 && got(3L)._8 == "greek")
    assert(got(4L)._6 == 4 && got(4L)._8 == "han") // all-zero tie -> priority
  }

  test("tie priority is han > cyrillic > greek > latin") {
    val got = profile(Seq((1L, "ab яж 机机 αβ"))) // 2 of each
    assert(got(1L)._8 == "han")
  }

  test("ascii ratio is exact and empty text is 1.0") {
    val got = profile(Seq((1L, "abcd мир"), (2L, "")))
    // 8 chars, 5 ascii (abcd + space)
    assert(got(1L)._9 == BigDecimal(5.0 / 8.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L)._9 == 1.0)
  }

  test("profile is one shuffle-free codegen stage") {
    val plan = ScriptProfile.profile(
        Seq((1L, "x")).toDF("doc_id", "text"), col("text"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
