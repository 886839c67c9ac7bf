package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PortableHistogramSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side re-derivation of the decimal bucketing. */
  private def refBucket(milli: Long, p: Int): Long = {
    val s = milli.toString
    (s.take(p) + "0" * math.max(0, s.length - p)).toLong
  }

  test("bucketLo keeps p leading digits and zeroes the rest") {
    val vals = Seq(0L, 7L, 99L, 100L, 123L, 1234L, 9999L, 1234567L, 999999999L)
    val got = vals.toDF("m")
      .select(col("m"), PortableHistogram.bucketLo(col("m"), 3).as("b"))
      .as[(Long, Long)].collect().toMap
    vals.foreach(v => assert(got(v) == refBucket(v, 3), s"v=$v"))
    // bucket lower bound never exceeds the value, and the relative
    // gap is strictly under 10^(1-p)
    vals.filter(_ >= 100).foreach { v =>
      assert(got(v) <= v)
      assert((v - got(v)).toDouble / v < 1e-2)
    }
  }

  test("quantileProfile is exact when every value fits p digits") {
    // values 1..100 milli-scaled: 3-digit buckets hold <=3-digit
    // integers exactly, so est == exact at every quantile
    val df = (1 to 100).map(i => i / 1000.0 + 1e-9).toDF("value")
    val got = PortableHistogram.quantileProfile(
        df, col("value"), p = 3, qsPerMille = Seq(500, 900, 990))
      .select("q_permille", "est_milli", "exact_milli", "rel_err")
      .as[(Long, Long, Long, Double)].collect()
    got.foreach { case (q, est, exact, err) =>
      assert(est == exact, s"q=$q")
      assert(err == 0.0)
    }
    val byQ = got.map(r => r._1 -> r._2).toMap
    assert(byQ(500L) == 50L)
    assert(byQ(900L) == 90L)
    assert(byQ(990L) == 99L)
  }

  test("estimates honor the structural error bound on wide-range data") {
    // deterministic multi-decade values: i^2 * 0.007
    val df = (1 to 2000).map(i => i.toLong * i * 0.007).toDF("value")
    val got = PortableHistogram.quantileProfile(
        df, col("value"), p = 3, qsPerMille = Seq(500, 900, 990, 999))
      .select("est_milli", "exact_milli", "rel_err", "in_bound")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.length == 4)
    got.foreach { case (est, exact, err, inBound) =>
      assert(est <= exact)
      assert(inBound, s"err=$err")
    }
  }

  test("rank is ceil(n*q/1000): boundary quantiles pick the right row") {
    // 4 rows: p50 of 4 = rank 2, p1000 = rank 4, p1 = rank 1
    val df = Seq(0.001, 0.002, 0.003, 0.004).toDF("value")
    val got = PortableHistogram.quantileProfile(
        df, col("value"), p = 3, qsPerMille = Seq(1, 500, 1000))
      .select("q_permille", "exact_milli").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L)
    assert(got(500L) == 2L)
    assert(got(1000L) == 4L)
  }

  test("grouped quantiles equal the per-slice global estimator") {
    val df = (1 to 600).map(i => (s"g${i % 3}", (i % 97) * 1.7 + 0.01))
      .toDF("grp", "value")
    val grouped = PortableHistogram.groupedQuantiles(
        df, col("value"), Seq(col("grp")), p = 3,
        qsPerMille = Seq(500, 900, 990))
      .select(col("g0"), col("q_permille"), col("est_milli"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(grouped.size == 9)
    Seq("g0", "g1", "g2").foreach { g =>
      val per = PortableHistogram.quantileProfile(
          df.where(col("grp") === g), col("value"), 3,
          Seq(500, 900, 990))
        .select("q_permille", "est_milli")
        .as[(Long, Long)].collect().toMap
      per.foreach { case (q, est) =>
        assert(grouped((g, q)) == est, s"$g q=$q")
      }
    }
  }

  test("a NULL group key gets real quantiles, not est_milli = null") {
    // the ranks-to-hist join must be null-safe (<=>) on the group
    // columns, or a null slice (e.g. a null ts hour) silently loses
    // its estimate (r11 advice)
    val df = (1 to 100).map(i =>
        (if (i % 2 == 0) "g0" else null, i * 1.0)).toDF("grp", "value")
    val got = PortableHistogram.groupedQuantiles(
        df, col("value"), Seq(col("grp")), p = 3, qsPerMille = Seq(500))
      .select("g0", "est_milli").collect()
      .map(r => Option(r.getString(0)) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(got.keySet == Set(Some("g0"), None))
    assert(got(None).nonEmpty, "null group must carry a quantile")
    assert(got(Some("g0")).nonEmpty)
    // the null slice holds the odd values 1..99: its p500 bucket must
    // sit at/under the true median 50, never above g0's
    assert(got(None).get <= 50000L && got(None).get > 0L)
  }

  test("shard sketches merge losslessly") {
    val df = (1 to 500).map(i => (i.toLong, (i % 37) * 1.5 + 0.01))
      .toDF("event_id", "value")
    val r = PortableHistogram.mergeProfile(
        df, col("value"), col("event_id"), p = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    val (bw, bm, mismatch, tw, tm) = r
    assert(bw == bm)
    assert(mismatch == 0L)
    assert(tw == 500L && tm == 500L)
  }
}
