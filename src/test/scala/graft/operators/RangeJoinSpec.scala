package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naiveBand(
      l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      lower: Long,
      upper: Long) =
    l.join(r.toDF("user_id", "p_event_id", "p_tus"), Seq("user_id"))
      .where(col("p_tus").between(col("tus") + lower, col("tus") + upper))

  test("bucketed band join equals the naive inequality join, duplicate-free") {
    val ev = Tables.load(spark, sf0001, "events")
    val l = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val lower = 1L
    val upper = 4L * 3600L * 1000000L

    val ours = RangeJoin
      .bandJoin(l, r, Seq("user_id"), "tus", "tus", lower, upper, "p_")
      .select("user_id", "event_id", "p_event_id")
    val naive = naiveBand(l, r, lower, upper)
      .select(col("user_id"), col("event_id"), col("p_event_id"))

    assert(ours.count() > 0, "band should be non-empty at sf0.001")
    assert(ours.exceptAll(naive).isEmpty && naive.exceptAll(ours).isEmpty,
      "bucketed band join disagrees with naive inequality join")
  }

  test("boundary rows: both band edges are inclusive, outside excluded") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq(
      (1L, 109L), // below lower edge (t+10)
      (1L, 110L), // ON lower edge
      (1L, 150L), // inside
      (1L, 200L), // ON upper edge
      (1L, 201L) // above
    ).toDF("k", "t")
    val out = RangeJoin
      .bandJoin(l, r, Seq("k"), "t", "t", 10L, 100L, "r_")
      .select("r_t").as[Long].collect().sorted
    assert(out.toSeq == Seq(110L, 150L, 200L))
  }

  test("negative ordinates and negative lower bound bucket correctly") {
    val l = Seq((1L, -100L), (1L, 5L)).toDF("k", "t")
    val r = Seq((1L, -150L), (1L, -95L), (1L, -40L), (1L, 0L), (1L, 60L))
      .toDF("k", "t")
    // band [-50, 70]: for t=-100 matches [-150, -30] -> -150, -95, -40;
    // for t=5 matches [-45, 75] -> -40, 0, 60
    val got = RangeJoin
      .bandJoin(l, r, Seq("k"), "t", "t", -50L, 70L, "r_")
      .select("t", "r_t").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (-100L, -150L), (-100L, -95L), (-100L, -40L),
      (5L, -40L), (5L, 0L), (5L, 60L)))
  }

  test("interval overlap join equals the naive inequality join, duplicate-free") {
    val ev = Tables.load(spark, sf0001, "events")
    val l = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("vs"),
        (unix_micros(col("ts")) + lit(600000000L)).as("ve"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("ps"),
        (unix_micros(col("ts")) + lit(1800000000L)).as("pe"))
    val ours = IntervalJoin
      .overlapJoin(l, r, Seq("user_id"), "vs", "ve", "ps", "pe",
        bucketWidth = 1800000000L)
      .select("user_id", "view_id", "r_purchase_id", "overlap_us")
    val naive = l.join(
        r.toDF("user_id", "r_purchase_id", "r_ps", "r_pe"), Seq("user_id"))
      .where(col("vs") < col("r_pe") && col("r_ps") < col("ve"))
      .select(col("user_id"), col("view_id"), col("r_purchase_id"),
        (least(col("ve"), col("r_pe")) - greatest(col("vs"), col("r_ps")))
          .as("overlap_us"))
    assert(ours.count() > 0, "overlap should be non-empty at sf0.001")
    assert(ours.exceptAll(naive).isEmpty && naive.exceptAll(ours).isEmpty,
      "bucketed overlap join disagrees with naive inequality join")
  }

  test("interval overlap: negative starts and bucket-edge touches") {
    val l = Seq((1L, 10L, -100L, -50L), (1L, 11L, -10L, 40L))
      .toDF("k", "lid", "ls", "le")
    val r = Seq(
      (1L, 20L, -60L, -20L), // overlaps both: [-60,-50) with lid 10, [-10,-20)? no — [-60,-20) vs [-10,40) = [-10,-20) empty
      (1L, 21L, -50L, 0L),   // touches lid 10 at -50 exactly: half-open, NO overlap; overlaps lid 11 on [-10, 0)
      (1L, 22L, 40L, 90L))   // touches lid 11 at 40 exactly: no overlap
      .toDF("k", "rid", "rs", "re")
    val got = IntervalJoin
      .overlapJoin(l, r, Seq("k"), "ls", "le", "rs", "re", bucketWidth = 50L)
      .select("lid", "r_rid", "overlap_us").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((10L, 20L, 10L), (11L, 21L, 10L)), got.toString)
  }

  test("plans as an equi-join on (key, bucket), never nested-loop") {
    val ev = Tables.load(spark, sf0001, "events")
    val l = ev.select(col("user_id"), unix_micros(col("ts")).as("tus"))
    val r = ev.select(col("user_id"), unix_micros(col("ts")).as("tus"))
    val plan = RangeJoin
      .bandJoin(l, r, Seq("user_id"), "tus", "tus", 0L, 60000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(5).mkString("\n"))
  }
}
