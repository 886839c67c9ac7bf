package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.ZipfFit

class ZipfFitSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side OLS with the same milli-nat conventions. */
  private def ref(
      texts: Seq[(String, String)], topN: Int): Map[String, (Long, Double, Double)] = {
    def m(v: Double) = math.floor(math.log(v) * 1000.0).toLong
    texts.groupBy(_._1).map { case (g, docs) =>
      val cnt = docs.flatMap(_._2.toLowerCase.trim
          .replaceAll("\\s+", " ").split(" ", -1))
        .filter(_.nonEmpty).groupBy(identity)
        .view.mapValues(_.size.toLong).toSeq
      val ranked = cnt.sortBy { case (t, n) => (-n, t) }.take(topN)
        .zipWithIndex.map { case ((_, n), i) => (m(i + 1.0), m(n.toDouble)) }
      val mm = ranked.size.toLong
      val sx = ranked.map(_._1).sum
      val sy = ranked.map(_._2).sum
      val sxy = ranked.map(p => p._1 * p._2).sum
      val sxx = ranked.map(p => p._1 * p._1).sum
      val slope = (mm * sxy - sx * sy).toDouble / (mm * sxx - sx * sx).toDouble
      val icept = sy.toDouble / 1000.0 / mm - slope * (sx.toDouble / 1000.0 / mm)
      def f4(x: Double) = math.floor(x * 1e4) / 1e4
      g -> ((mm, f4(slope), f4(icept)))
    }
  }

  test("matches a driver-side OLS re-derivation") {
    val texts = Seq(
      ("a", "x x x x x y y y z z w v u t"),
      ("a", "x x y y z w s r q p"),
      ("b", "m m m m n n n o o k"))
    val got = ZipfFit.fit(
        texts.toDF("lang", "text"), col("text"), col("lang"), topN = 8)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == ref(texts, 8))
  }

  test("an exact power law recovers its own slope") {
    // term t_r appears round(1000 * r^-1) times: the fitted slope must
    // land near -1 (exactly -1 is unattainable after integer rounding
    // of counts and milli-nat projection)
    val docs = (1 to 40).flatMap { r =>
      val n = math.max(1, math.round(1000.0 * math.pow(r, -1.0)).toInt)
      Seq.fill(n)(s"term$r")
    }
    val df = Seq(("z", docs.mkString(" "))).toDF("lang", "text")
    val got = ZipfFit.fit(df, col("text"), col("lang"), topN = 40)
      .as[(String, Long, Double, Double)].head()
    assert(got._2 == 40L)
    assert(math.abs(got._3 - (-1.0)) < 0.02, s"slope ${got._3}")
  }

  test("a degenerate slice (single distinct term) yields NULL, not NaN") {
    // m·sxx − sx² = 0 here; floor(NaN) renders differently across
    // engines, so the fit must emit the NULL sentinel (r11 advice)
    val df = Seq(("d", "solo solo solo solo")).toDF("lang", "text")
    val row = ZipfFit.fit(df, col("text"), col("lang"), topN = 8)
      .select("grp", "n_terms", "slope", "intercept").head()
    assert(row.getString(0) == "d" && row.getLong(1) == 1L)
    assert(row.isNullAt(2), "slope must be null")
    assert(row.isNullAt(3), "intercept must be null")
  }

  test("a uniform distribution has slope ~ 0") {
    val docs = (1 to 30).flatMap(r => Seq.fill(10)(s"t$r"))
    val df = Seq(("u", docs.mkString(" "))).toDF("lang", "text")
    val got = ZipfFit.fit(df, col("text"), col("lang"), topN = 30)
      .as[(String, Long, Double, Double)].head()
    assert(math.abs(got._3) < 1e-3, s"slope ${got._3}")
  }
}
