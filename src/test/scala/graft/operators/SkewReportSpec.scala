package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  // one whale key (60 rows), one warm key (25), a tail of ten 1-row keys
  private val rows =
    Seq.fill(60)("whale") ++ Seq.fill(25)("warm") ++
      (1 to 10).map(i => s"tail$i")

  test("matches a driver-side re-derivation of every column") {
    val got = SkewReport.report(
        rows.toDF("k"), col("k"), topK = 3, targetPerTask = 20L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val nRows = 95L; val nKeys = 12L
    val avg = nRows / nKeys // FLOORED average — the overflow-safe heat base
    assert(got.length == 3)
    assert(got(0) == (("whale", 60L, nRows, nKeys,
      60L * 1000 / nRows, 60L * 1000 / avg, 3L)))
    assert(got(1) == (("warm", 25L, nRows, nKeys,
      25L * 1000 / nRows, 25L * 1000 / avg, 2L)))
    // the 1-row tail cuts on key order: tail1 first
    assert(got(2)._1 == "tail1" && got(2)._2 == 1L && got(2)._7 == 1L)
  }

  test("a NULL key counts as a key and sorts LAST on the tiebreak") {
    // null ties with "zz" at 2 rows; the cut keeps the non-null key
    // first (oracle parity: default NULLS LAST)
    val data = Seq(Some("hot"), Some("hot"), Some("hot"),
      Some("zz"), Some("zz"), None, None)
    val got = SkewReport.report(
        data.toDF("k"), col("k"), topK = 2, targetPerTask = 100L)
      .select("k", "cnt").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
    assert(got(0) == (Some("hot") -> 3L))
    assert(got(1) == (Some("zz") -> 2L), s"null must sort after zz: ${got.toSeq}")
    val all = SkewReport.report(
        data.toDF("k"), col("k"), topK = 3, targetPerTask = 100L)
      .select("k", "cnt", "n_keys").collect()
    assert(all.length == 3 && all(2).isNullAt(0) && all(2).getLong(1) == 2L)
    assert(all(0).getLong(2) == 3L, "null is a key in n_keys")
  }

  test("heat_milli is 1000 on a perfectly uniform table") {
    val uni = (1 to 8).flatMap(k => Seq.fill(5)(s"k$k"))
    val got = SkewReport.report(
        uni.toDF("k"), col("k"), topK = 8, targetPerTask = 1000000L)
      .select("heat_milli", "salt_factor").as[(Long, Long)].collect()
    assert(got.forall(_ == ((1000L, 1L))))
  }

  test("salt_factor is the exact ceil-div of the hottest key") {
    val got = SkewReport.report(
        rows.toDF("k"), col("k"), topK = 1, targetPerTask = 59L)
      .select("salt_factor").as[Long].head()
    assert(got == 2L) // 60 rows / 59-per-task => 2 splits
  }
}
