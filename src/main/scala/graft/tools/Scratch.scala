package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.{FixedPoint => FP}

/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val li = Tables.load(spark, dir, "lineitem")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min match { case t => println(f"[scratch] $name%-28s ${t}%.3f s") }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    println(s"[scratch] rows=${li.count()}")
    time("count only") { li.count(); () }
    time("sum double x4") {
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity"), sum("l_extendedprice"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), count(lit(1))))
    }
    time("sumFixed decimal38 x3") {
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        FP.sumFixedDouble(FP.scaled(col("l_quantity"), 4), 4).as("a"),
        FP.sumFixedDouble(FP.scaled(col("l_extendedprice"), 4), 4).as("b"),
        FP.sumFixedDouble(FP.scaled(col("l_extendedprice"), 4) *
          (lit(10000L) - FP.scaled(col("l_discount"), 4)), 4, inputScale = 8).as("c"),
        count(lit(1)).as("n")))
    }
    time("sum long x3 (scaled)") {
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(FP.scaled(col("l_quantity"), 4)).as("a"),
        sum(FP.scaled(col("l_extendedprice"), 4)).as("b"),
        sum(FP.scaled(col("l_extendedprice"), 4) *
          (lit(10000L) - FP.scaled(col("l_discount"), 4))).as("c"),
        count(lit(1)).as("n")))
    }
    time("sum cast-decimal18 x3") {
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,4)")).as("a"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).as("b"),
        sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)"))).as("c"),
        count(lit(1)).as("n")))
    }
    spark.stop()
  }
}
