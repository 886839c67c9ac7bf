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

  test("distinctSketch ignores nulls like count(DISTINCT)") {
    val est = TableProfile.distinctSketch(fixture, Seq("score", "tag"))
      .select("col_name", "est").as[(String, Double)].collect().toMap
    assert(math.round(est("score")) == 2L)
    assert(math.round(est("tag")) == 2L)
  }
}
