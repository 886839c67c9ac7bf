package graft.sync

import graft.{SparkSpec, Tables}

/** The co-located-join layout: joining two tables bucketed on the join
  * key must not shuffle either side (no hash-partitioning Exchange). */
class BucketingSpec extends SparkSpec {

  private def dropAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    val wh = new java.io.File("spark-warehouse")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    if (wh.exists()) rm(wh)
  }

  test("join of bucket-aligned tables runs without a shuffle") {
    dropAll()
    try {
      val li = Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = Tables.load(spark, sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
      Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(
        ord.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", "l_orderkey", 4)

      // force the merge join (broadcast would trivially avoid shuffles);
      // bucket alignment must make the SMJ itself Exchange-free
      val joined = spark.table("b_lineitem").hint("merge")
        .join(spark.table("b_orders").hint("merge"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket-aligned merge join should be shuffle-free:\n$plan")
      assert(joined.count() == li.count(), "inner join keeps every lineitem row")
    } finally dropAll()
  }
}
