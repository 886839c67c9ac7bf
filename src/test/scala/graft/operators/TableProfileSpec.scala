package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some(2.5), Some("ab"), Some(Timestamp.valueOf("2020-01-01 00:00:00"))),
    (2L, Some(-0.75), Some("xyz"), Some(Timestamp.valueOf("2020-01-02 12:00:00"))),
    (3L, None, Some("ab"), None),
    (4L, Some(2.5), None, Some(Timestamp.valueOf("2020-01-01 00:00:00"))))

  private def fixture = rows.toDF("id", "score", "tag", "seen")

  test("profile matches a driver-side re-derivation across all types") {
    val got = TableProfile.profile(fixture)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    def v(x: Long) = Some(x)
    assert(got(("_table", "rows")) == v(4L))
    assert(got(("id", "nulls")) == v(0L))
    assert(got(("id", "distinct")) == v(4L))
    assert(got(("id", "min")) == v(1L) && got(("id", "max")) == v(4L))
    assert(got(("score", "nulls")) == v(1L))
    assert(got(("score", "distinct")) == v(2L))
    assert(got(("score", "min_micro")) == v(-750000L))
    assert(got(("score", "max_micro")) == v(2500000L))
    assert(got(("tag", "nulls")) == v(1L))
    assert(got(("tag", "distinct")) == v(2L))
    assert(got(("tag", "len_max")) == v(3L))
    assert(got(("tag", "len_sum")) == v(7L))
    assert(got(("seen", "nulls")) == v(1L))
    assert(got(("seen", "distinct")) == v(2L))
    // session zone is UTC: 2020-01-01 = 1577836800s
    assert(got(("seen", "min_micro")) == v(1577836800000000L))
    assert(got(("seen", "max_micro")) == v(1577966400000000L))
  }

  test("an empty table yields null typed metrics, zero counts") {
    val got = TableProfile.profile(fixture.where(col("id") < 0L))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(("_table", "rows")) == Some(0L))
    assert(got(("id", "nulls")) == Some(0L))
    assert(got(("id", "distinct")) == Some(0L))
    assert(got(("id", "min")).isEmpty && got(("score", "max_micro")).isEmpty)
    assert(got(("tag", "len_sum")).isEmpty)
  }

  test("float distinct rides the bits encoding with count(DISTINCT) semantics") {
    // r20: float/double cells shuffle as IEEE bit patterns, not
    // strings — the encoding must keep count(DISTINCT)'s equivalences:
    // all NaNs one value (incl. a non-canonical payload), −0.0 = 0.0,
    // nulls ignored, everything else separated
    val payloadNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq(
      Some(Double.NaN), Some(payloadNaN), Some(-0.0), Some(0.0),
      Some(1.5), Some(-1.5), Some(Double.PositiveInfinity),
      Some(Double.MinPositiveValue), None)
      .toDF("x")
    val got = TableProfile.exactDistinct(df, Seq("x"))
      .select("distinct").as[Long].head()
    val ref = df.select(countDistinct(col("x"))).head().getLong(0)
    assert(got == ref, s"bits-encoded distinct $got != count(DISTINCT) $ref")
    assert(got == 6L) // {NaN, 0.0, 1.5, -1.5, +inf, minpos}
    // floats (not just doubles) take the same path
    val f = Seq(Some(1.5f), Some(-0.0f), Some(0.0f), Some(Float.NaN), None)
      .toDF("x")
    val gotF = TableProfile.exactDistinct(f, Seq("x"))
      .select("distinct").as[Long].head()
    assert(gotF == f.select(countDistinct(col("x"))).head().getLong(0))
    assert(gotF == 3L)
  }

  test("distinctSketch tracks exact cardinality within HLL error") {
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_returnflag", "l_quantity")
    val est = TableProfile.distinctSketch(df, cols)
      .select("col_name", "est").as[(String, Double)].collect().toMap
    assert(est.keySet == cols.toSet)
    cols.foreach { c =>
      val exact = df.select(countDistinct(col(c))).head().getLong(0).toDouble
      val rel = math.abs(est(c) - exact) / math.max(exact, 1.0)
      // p=9 registers: canonical error ~1.04/sqrt(512) ≈ 4.6%
      assert(rel < 0.15, s"$c est ${est(c)} vs exact $exact (rel $rel)")
    }
  }

  test("auto-tier: stats-large input routes distinct through the sketch") {
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
    val key = "spark.graft.profile.sketchBytes"
    spark.conf.set(key, "1") // every real input is "large" under 1 byte
    try {
      assert(TableProfile.sketchByStats(df), "stats should exceed 1 byte")
      val prof = TableProfile.profile(df)
      // the estimate tier is named distinct_est — never mistakable for
      // an exact count — and the exact tier is absent
      val metrics = prof.select("metric").distinct()
        .collect().map(_.getString(0)).toSet
      assert(metrics.contains("distinct_est") && !metrics.contains("distinct"))
      // no Expand (the multi-count-DISTINCT rewrite) and no exact
      // dedup: the only aggregations are the metrics pass and the
      // register fold — a full-column distinct shuffle would show as
      // a HashAggregate pair keyed on the value column
      val plan = prof.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("expand"), "sketch tier must not Expand")
      // exactDistinct's dedup shuffle aggregates on the (column-index,
      // value) key pair — its plan signature is a HashAggregate keyed
      // on `ci`; the sketch tier only ever groups on col_name/registers
      assert(!plan.contains("keys=[ci"),
        s"sketch tier must not run the exact value dedup:\n$plan")
      // estimates still track reality (same bound as the sketch spec)
      val est = prof.where(col("metric") === "distinct_est")
        .select("col_name", "value").as[(String, Long)].collect().toMap
      Seq("l_orderkey", "l_returnflag", "l_quantity").foreach { c =>
        val exact = df.select(countDistinct(col(c))).head().getLong(0).toDouble
        val rel = math.abs(est(c) - exact) / math.max(exact, 1.0)
        assert(rel < 0.15, s"$c est ${est(c)} vs exact $exact")
      }
    } finally spark.conf.unset(key)
    // back at the 4 GiB default, the same input profiles exactly
    assert(!TableProfile.sketchByStats(df))
    val exactMetrics = TableProfile.profile(df).select("metric").distinct()
      .collect().map(_.getString(0)).toSet
    assert(exactMetrics.contains("distinct") && !exactMetrics.contains("distinct_est"))
  }

  test("distinctSketch ignores nulls like count(DISTINCT)") {
    val est = TableProfile.distinctSketch(fixture, Seq("score", "tag"))
      .select("col_name", "est").as[(String, Double)].collect().toMap
    assert(math.round(est("score")) == 2L)
    assert(math.round(est("tag")) == 2L)
  }
}
