package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashMergeSpec extends SparkSpec {
  import spark.implicits._

  test("group signature is the element-wise min of member signatures") {
    val k = 4
    val rows = Seq(
      ("a", Seq(5L, 1L, 9L, 7L)),
      ("a", Seq(3L, 8L, 2L, 7L)),
      ("b", Seq(6L, 6L, 6L, 6L)))
    val df = rows.toDF("g", "sig")
    val merge = udaf(new MinHashMerge(k), ExpressionEncoder[Seq[Long]]())
    val got = df.groupBy("g").agg(merge(col("sig")).as("m"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == Seq(3L, 1L, 2L, 7L))
    assert(got("b") == Seq(6L, 6L, 6L, 6L))
  }

  test("merge is order-insensitive (repartition shuffle)") {
    val k = 8
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      ("g" + (i % 3), Seq.fill(k)(rnd.nextLong().abs)))
    val df = rows.toDF("g", "sig")
    val merge = udaf(new MinHashMerge(k), ExpressionEncoder[Seq[Long]]())
    val a = df.repartition(13).groupBy("g").agg(merge(col("sig")).as("m"))
      .as[(String, Seq[Long])].collect().toMap
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((x, y) => x.zip(y).map(p => math.min(p._1, p._2)))).toMap
    assert(a == expected)
  }
}
