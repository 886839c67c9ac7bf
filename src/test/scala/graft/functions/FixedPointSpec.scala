package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** FixedPoint must be bit-equal to the plain decimal-cast aggregation
  * it replaces — checked on real fixture data, including the scale-8
  * product reduction. */
class FixedPointSpec extends SparkSpec {

  test("sumFixed equals sum(cast(decimal)) on lineitem") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val dec = "decimal(18,4)"
    val a = li.groupBy("l_returnflag").agg(
      FixedPoint.sumFixed(FixedPoint.scaled(col("l_quantity"), 4), 4).as("s1"),
      FixedPoint.sumFixed(
        FixedPoint.scaled(col("l_extendedprice"), 4) *
          (lit(10000L) - FixedPoint.scaled(col("l_discount"), 4)),
        4, inputScale = 8).as("s2"))
    val b = li.groupBy("l_returnflag").agg(
      sum(col("l_quantity").cast(dec)).cast(dec).as("s1"),
      sum(col("l_extendedprice").cast(dec) *
        (lit(1) - col("l_discount").cast(dec))).cast(dec).as("s2"))
    assert(a.schema == b.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("negative values round identically (half-up magnitude semantics)") {
    import spark.implicits._
    val df = Seq(-1.23, -0.07, 2.5001, 0.0, 99.99).toDF("x")
    val a = df.agg(FixedPoint.sumFixed(FixedPoint.scaled(col("x"), 4), 4).as("s"))
    val b = df.agg(sum(col("x").cast("decimal(18,4)")).cast("decimal(18,4)").as("s"))
    assert(a.collect().toSeq == b.collect().toSeq)
  }
}
