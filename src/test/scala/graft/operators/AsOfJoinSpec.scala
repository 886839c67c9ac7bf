package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("strict/inclusive tie-break on handcrafted simultaneous rows") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2")).toDF("k", "ord", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15")).toDF("k", "ord", "rv")

    val strict = AsOfJoin
      .asofBackward(left, right, Seq("k"), "ord", strict = true)
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    // l1 at ord=10: the simultaneous r10 must NOT match strictly
    assert(strict("l1").isEmpty)
    assert(strict("l2").contains("r15"))

    val incl = AsOfJoin
      .asofBackward(left, right, Seq("k"), "ord", strict = false)
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    assert(incl("l1").contains("r10"))
    assert(incl("l2").contains("r15"))
  }

  test("unmatched left rows survive with null right payload") {
    val left = Seq((1L, 5L, "early"), (2L, 9L, "lonely_key")).toDF("k", "ord", "lv")
    val right = Seq((1L, 7L, "late")).toDF("k", "ord", "rv")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "ord")
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    assert(out("early").isEmpty && out("lonely_key").isEmpty)
  }

  test("tolerance nulls out stale matches but keeps the left row") {
    val left = Seq((1L, 100L, "fresh"), (1L, 500L, "stale"), (2L, 50L, "none"))
      .toDF("k", "ord", "lv")
    val right = Seq((1L, 90L, "r90")).toDF("k", "ord", "rv")
    val out = AsOfJoin
      .asofBackwardWithin(left, right, Seq("k"), "ord", maxGap = 50L)
      .select("lv", "r_rv", "r_ord")
      .as[(String, Option[String], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // gap 10 <= 50: matched; gap 410 > 50: nulled; no candidate: nulls
    assert(out("fresh") == (Some("r90"), Some(90L)))
    assert(out("stale") == (None, None), s"stale match survived: ${out("stale")}")
    assert(out("none") == (None, None))
    assert(out.size == 3, "tolerance must never drop left rows")
  }

  test("matches the naive join+argmax formulation on fixture events") {
    val ev = Tables.load(spark, sf0001, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val r = ev.filter(col("event_type") === "view")
      .select("user_id", "event_id", "ts", "value")

    val ours = AsOfJoin
      .asofBackward(l, r, Seq("user_id"), "event_id",
        rightPrefix = "prev_", strict = true)

    // naive reference: inequality join, then keep the max prior event_id
    val w = Window.partitionBy(col("l_eid")).orderBy(col("r_eid").desc)
    val naive = l.toDF("user_id", "l_eid", "l_ts")
      .join(
        r.toDF("user_id", "r_eid", "r_ts", "r_value"),
        Seq("user_id"), "left")
      .where(col("r_eid").isNull || col("r_eid") < col("l_eid"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("user_id"), col("l_eid").as("event_id"), col("l_ts").as("ts"),
        col("r_eid").as("prev_event_id"), col("r_ts").as("prev_ts"),
        col("r_value").as("prev_value"))
    // the naive left join drops left rows whose ONLY matches are
    // non-prior (filtered post-join) — re-add them as unmatched
    val naiveFull = naive.unionByName(
      l.select(col("user_id"), col("event_id"), col("ts"))
        .join(naive.select("event_id"), Seq("event_id"), "left_anti")
        .select(col("user_id"), col("event_id"), col("ts"),
          lit(null).cast("long").as("prev_event_id"),
          lit(null).cast("timestamp").as("prev_ts"),
          lit(null).cast("double").as("prev_value")))

    assert(ours.count() == l.count())
    assert(ours.exceptAll(naiveFull).isEmpty && naiveFull.exceptAll(ours).isEmpty,
      "asof window decomposition disagrees with naive join+argmax")
  }

  test("nearest picks the closer side; ties go backward") {
    val left = Seq((1L, 10L, "mid"), (1L, 100L, "high"), (2L, 5L, "solo"))
      .toDF("k", "ord", "lv")
    val right = Seq((1L, 7L, "b7"), (1L, 12L, "f12"), (1L, 90L, "b90"))
      .toDF("k", "ord", "rv")
    val out = AsOfJoin.asofNearest(left, right, Seq("k"), "ord")
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    assert(out("mid").contains("f12"))  // |12-10| < |10-7|
    assert(out("high").contains("b90")) // only backward exists nearby
    assert(out("solo").isEmpty)         // no right rows for key 2
    // exact tie: backward wins
    val tieR = Seq((1L, 8L, "back"), (1L, 12L, "fwd")).toDF("k", "ord", "rv")
    val tie = AsOfJoin.asofNearest(left.filter(col("lv") === "mid"),
        tieR, Seq("k"), "ord")
      .select("r_rv").as[Option[String]].head()
    assert(tie.contains("back"))
  }

  test("nearest: equal-ord right matches at distance zero; null ords inert") {
    val left = Seq[(Long, Option[Long], String)](
        (1L, Some(10L), "eq"), (1L, None, "nullL"))
      .toDF("k", "ord", "lv")
    val right = Seq((1L, 10L, "same"), (1L, 11L, "close"))
      .toDF("k", "ord", "rv")
    val out = AsOfJoin.asofNearest(left, right, Seq("k"), "ord")
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    assert(out("eq").contains("same"))
    assert(out("nullL").isEmpty)
    // null-ord RIGHT rows never match either
    val nullR = Seq[(Long, Option[Long], String)]((1L, None, "nr"))
      .toDF("k", "ord", "rv")
    val out2 = AsOfJoin.asofNearest(
        left.filter(col("lv") === "eq"), nullR, Seq("k"), "ord")
      .select("r_rv").as[Option[String]].head()
    assert(out2.isEmpty)
  }

  test("interpolate: between/exact/hold/backfill/null against hand arithmetic") {
    // right series on key 1: (10, 1.0), (20, 3.0)
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 3.0)).toDF("k", "ord", "value")
    val left = Seq[(Long, Option[Long], String)](
        (1L, Some(15L), "mid"),      // halfway: 1 + 2*0.5 = 2.0
        (1L, Some(12L), "fifth"),    // 1 + 2*0.2 = 1.4
        (1L, Some(10L), "exact"),    // verbatim 1.0 (no 0/0)
        (1L, Some(5L), "before"),    // backfill -> 1.0
        (1L, Some(25L), "after"),    // hold -> 3.0
        (1L, None, "nul"),           // null ordinate -> null
        (2L, Some(15L), "nokey"))    // no right series -> null
      .toDF("k", "ord", "lv")
    val out = AsOfJoin.asofInterpolate(left, right, Seq("k"), "ord", "value")
      .select("lv", "r_value").as[(String, Option[Double])].collect().toMap
    assert(out("mid").contains(2.0))
    assert(out("fifth").contains(1.0 + 2.0 * 0.2))
    assert(out("exact").contains(1.0))
    assert(out("before").contains(1.0))
    assert(out("after").contains(3.0))
    assert(out("nul").isEmpty)
    assert(out("nokey").isEmpty)
  }

  test("forward-within: next row strictly after, bounded, null ords inert") {
    val left = Seq(
      (1L, 10L, "hit"),      // next right at 15 (within 10)
      (1L, 20L, "tie"),      // right at 20 is simultaneous: strict, no match; next is 40, beyond bound
      (2L, 5L, "stale"),     // next right at 100: beyond bound -> nulled
      (3L, 7L, "nokey"),     // no right rows for key 3
      (4L, -1L, "nullord"))  // vs a key-4 right row; then a null-ord left below
      .toDF("k", "ord", "tag")
      .unionByName(Seq((4L, Option.empty[Long], "nullleft"))
        .toDF("k", "ord", "tag"))
    val right = Seq(
      (1L, 15L), (1L, 20L), (1L, 40L),
      (2L, 100L),
      (4L, 3L))
      .toDF("k", "ord")
    val got = AsOfJoin
      .asofForwardWithin(left, right, Seq("k"), "ord", maxGap = 10L)
      .select("tag", "r_ord").as[(String, Option[Long])]
      .collect().toMap
    assert(got("hit").contains(15L), got.toString)
    assert(got("tie").isEmpty, "simultaneous right row must not match (strict)")
    assert(got("stale").isEmpty, "match beyond maxGap must null out")
    assert(got("nokey").isEmpty)
    assert(got("nullord").contains(3L))
    assert(got("nullleft").isEmpty,
      "null-ord left row must match nothing in forward mode")
  }

  test("forward matches the naive join+argmin formulation on fixture events") {
    val ev = graft.Tables.load(spark, sf0001, "events")
    val l = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), col("event_id"),
        unix_micros(col("ts")).as("ord"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("ord"))
    val ours = AsOfJoin.asofForward(l, r, Seq("k"), "ord")
      .select(col("event_id"), col("r_ord"))
    val naive = l.join(r.toDF("k", "p_ord"), Seq("k"))
      .where(col("p_ord") > col("ord"))
      .groupBy("event_id").agg(min("p_ord").as("r_ord"))
    val joined = ours.join(naive.withColumnRenamed("r_ord", "naive_ord"),
      Seq("event_id"), "left")
    assert(joined.where(
      (col("r_ord").isNotNull || col("naive_ord").isNotNull) &&
        !(col("r_ord") <=> col("naive_ord"))).isEmpty,
      "forward as-of disagrees with the naive argmin join")
  }

  test("interpolate plans one shuffle: a single window sort, no join") {
    val right = Seq((1L, 10L, 1.0)).toDF("k", "ord", "value")
    val left = Seq((1L, 15L, "x")).toDF("k", "ord", "lv")
    val plan = AsOfJoin.asofInterpolate(left, right, Seq("k"), "ord", "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"interpolation should be join-free:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }
}
