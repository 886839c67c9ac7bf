package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  test("repetition crushes below prose and noise; ratio is deterministic") {
    val docs = Seq(
      (1L, (1 to 100).map(_ => "spam").mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog while the cat watches " +
        "from a warm windowsill and considers the economics of effort"),
      (3L, (1 to 50).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"noise$i".getBytes).map("%02x".format(_)).mkString).mkString)
    ).toDF("id", "text")
    val r = docs.select(col("id"), DeflateRatioFn(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    // repetition crushes below both; short prose carries framing
    // overhead, so prose-vs-noise ordering is NOT asserted
    assert(r(1L) < r(2L) && r(1L) < r(3L), r.toString)
    assert(r(1L) < 0.2, s"repetition should crush: ${r(1L)}")
    assert(r(3L) > 0.4, s"hex noise should resist: ${r(3L)}")
    val again = docs.select(DeflateRatioFn(col("text"))).as[Double].collect()
    assert(again.sorted.sameElements(r.values.toArray.sorted))
  }

  test("degenerate inputs are total") {
    val r = Seq(("", 0), ("x", 1)).toDF("text", "i")
      .select(DeflateRatioFn(col("text"))).as[Double].collect()
    assert(r(0) == 1.0) // empty text: defined, no division by zero
    assert(r(1) > 1.0)  // one byte can only grow under deflate framing
  }
}
