package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property (seeded-random, mirroring KeyRangeSlicerSpec style):
  * FixedPoint aggregation equals the decimal-cast formulation for any
  * data that is decimal-of-scale-≤4 rendered as double — the exactness
  * contract in the FixedPoint scaladoc. */
class FixedPointPropSpec extends SparkSpec {
  import spark.implicits._

  test("sumFixed equals sum(cast(decimal)) for random 2-decimal data incl. negatives") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(300)((rnd.nextLong() % 9999999L) / 100.0)
      val df = xs.toDF("x")
      val a = df.agg(FixedPoint.sumFixed(FixedPoint.scaled(col("x"), 4), 4).as("s"))
      val b = df.agg(sum(col("x").cast("decimal(18,4)")).cast("decimal(18,4)").as("s"))
      assert(a.collect().toSeq == b.collect().toSeq, s"seed $seed")
    }
  }

  test("scaled product reduction equals decimal product for random price/rate pairs") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(200)((
        (math.abs(rnd.nextLong()) % 99999999L + 1L) / 100.0, // price, 2 dec
        (math.abs(rnd.nextLong()) % 1001L) / 10000.0)) // rate, 4 dec
      val df = xs.toDF("p", "d")
      val a = df.agg(FixedPoint.sumFixed(
        FixedPoint.scaled(col("p"), 4) * (lit(10000L) - FixedPoint.scaled(col("d"), 4)),
        4, inputScale = 8).as("s"))
      val b = df.agg(
        sum(col("p").cast("decimal(18,4)") * (lit(1) - col("d").cast("decimal(18,4)")))
          .cast("decimal(18,4)").as("s"))
      assert(a.collect().toSeq == b.collect().toSeq, s"seed $seed")
    }
  }
}
