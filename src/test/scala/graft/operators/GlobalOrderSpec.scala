package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders =
    Tables.load(spark, sf0001, "orders").select("o_orderkey")

  /** The single-task formulation — correct, and the documented
    * anti-pattern GlobalOrder exists to replace: every row moves into
    * ONE window partition. Kept here as the semantic reference only. */
  private lazy val globalWindowReference = {
    val w = Window.orderBy("o_orderkey")
    orders.select(
      col("o_orderkey"),
      row_number().over(w).cast("long").as("rn"),
      ntile(4).over(w).as("quartile"))
  }

  test("row numbers match the global-window reference exactly") {
    val got = GlobalOrder
      .withRowNumber(orders, col("o_orderkey"))
      .select("o_orderkey", "rn")
      .as[(Long, Long)].collect().sortBy(_._1)
    val want = globalWindowReference
      .select("o_orderkey", "rn")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("ntile arithmetic matches the window ntile, remainder included") {
    val (numbered, total) = GlobalOrder.withRowNumberCounted(
      orders, col("o_orderkey"), rnName = "rn")
    val got = numbered
      .select(col("o_orderkey"),
        GlobalOrder.ntileFromRowNumber(col("rn"), total, 4).as("q"))
      .as[(Long, Int)].collect().sortBy(_._1)
    val want = globalWindowReference
      .select("o_orderkey", "quartile")
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(got.sameElements(want))
    assert(total == orders.count())
  }

  test("empty range partitions do not shift the numbering") {
    // more partitions than rows: most partitions are empty, offsets
    // must still prefix-sum correctly across the gaps
    val tiny = orders.limit(5)
    val got = GlobalOrder
      .withRowNumber(tiny, col("o_orderkey"), numPartitions = 16)
      .select("rn").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }

  test("ntile with fewer rows than buckets numbers rows into own buckets") {
    val (numbered, total) = GlobalOrder.withRowNumberCounted(
      orders.limit(3), col("o_orderkey"), rnName = "rn")
    assert(total == 3)
    val got = numbered
      .select(GlobalOrder.ntileFromRowNumber(col("rn"), total, 4).as("q"))
      .as[Int].collect().sorted
    assert(got.sameElements(Array(1, 2, 3)))
  }
}
