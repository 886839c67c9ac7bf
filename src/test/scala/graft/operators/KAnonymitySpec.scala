package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age) quasi-identifiers: class (a,1) has 3 rows, (b,1) has 2,
  // (c,9) is a singleton
  private val rows = Seq(
    (1L, "a", 1, "x"), (2L, "a", 1, "y"), (3L, "a", 1, "z"),
    (4L, "b", 1, "x"), (5L, "b", 1, "y"),
    (6L, "c", 9, "q"))
  private def df = rows.toDF("id", "zip", "age", "payload")

  test("audit reports the class-size histogram with violations flagged") {
    val got = KAnonymity.audit(df, Seq(col("zip"), col("age")), k = 3)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      3L -> ((1L, 3L, false)),
      2L -> ((1L, 2L, true)),
      1L -> ((1L, 1L, true))))
  }

  test("suppress keeps exactly the rows of classes with >= k members") {
    val kept = KAnonymity.suppress(df, Seq(col("zip"), col("age")), k = 3)
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 2L, 3L)))
    // k=2 also admits the (b,1) pair; the singleton never survives
    val kept2 = KAnonymity.suppress(df, Seq(col("zip"), col("age")), k = 2)
      .select("id").as[Long].collect().sorted
    assert(kept2.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    // the suppressed output keeps the original schema
    assert(KAnonymity.suppress(df, Seq(col("zip")), k = 2).columns
      .sameElements(df.columns))
  }

  test("l-diversity flags a homogeneous class that k-anonymity passes") {
    // class (a,1): 3 rows but ALL share sensitive value "x" — passes
    // k=3 anonymity, fails l=2 diversity (the homogeneity attack)
    val homo = Seq(
      (1L, "a", 1, "x"), (2L, "a", 1, "x"), (3L, "a", 1, "x"),
      (4L, "b", 1, "x"), (5L, "b", 1, "y"), (6L, "b", 1, "z"))
      .toDF("id", "zip", "age", "diag")
    val kPass = KAnonymity.audit(homo, Seq(col("zip"), col("age")), k = 3)
      .where(col("violating")).count()
    assert(kPass == 0L, "fixture must pass k-anonymity")
    val got = KAnonymity.diversityAudit(
        homo, Seq(col("zip"), col("age")), col("diag"), l = 2)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((1L, 3L, true)),
      3L -> ((1L, 3L, false))))
  }

  test("t-closeness flags a skewed class that passes both k-anonymity and l-diversity") {
    // globally balanced mix (6x, 6y): class a matches it exactly
    // (tv = 0); classes b and c are mirror-skewed (3:1) — diverse
    // (l=2) and large (k=4) yet each leaks direction
    val rows = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), (4L, "a", "y"),
      (5L, "b", "x"), (6L, "b", "x"), (7L, "b", "x"), (8L, "b", "y"),
      (9L, "c", "y"), (10L, "c", "y"), (11L, "c", "y"), (12L, "c", "x"))
      .toDF("id", "zip", "diag")
    assert(KAnonymity.audit(rows, Seq(col("zip")), k = 4)
      .where(col("violating")).count() == 0L)
    assert(KAnonymity.diversityAudit(rows, Seq(col("zip")), col("diag"), l = 2)
      .where(col("violating")).count() == 0L)
    val tv = KAnonymity.closenessAudit(
        rows, Seq(col("zip")), col("diag"), t = 0.2)
      .select("q0", "class_size", "tv", "violating")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // exact: a = 0; b = c = ½·(|3/4-1/2| + |1/4-1/2|) = 0.25
    assert(tv("a") == ((4L, 0.0, false)), tv("a").toString)
    assert(tv("b") == ((4L, 0.25, true)), tv("b").toString)
    assert(tv("c") == ((4L, 0.25, true)), tv("c").toString)
  }

  test("null quasi and sensitive values are first-class classes/values") {
    // a NULL zip class of size 3 must survive suppression at k=3, and
    // NULL diagnoses must count as a distinct sensitive value
    val withNulls = Seq(
      (1L, null.asInstanceOf[String], "x"), (2L, null.asInstanceOf[String], "x"),
      (3L, null.asInstanceOf[String], "y"),
      (4L, "b", "x"), (5L, "b", null.asInstanceOf[String]), (6L, "b", "y"))
      .toDF("id", "zip", "diag")
    val kept = KAnonymity.suppress(withNulls, Seq(col("zip")), k = 3)
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 2L, 3L, 4L, 5L, 6L)),
      s"null-quasi class dropped: ${kept.mkString(",")}")
    // class b holds {x, null, y}: l_distinct must be 3, not 2
    val ld = KAnonymity.diversityAudit(
        withNulls, Seq(col("zip")), col("diag"), l = 3)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(ld.contains(3L) && ld(3L) == 1L, ld.toString)
    // closeness: both classes exist in the grid with their null cells
    // matched (a null-unsafe join would zero them); the two classes
    // mirror each other around the global mix, so their tv agree
    val tv = KAnonymity.closenessAudit(
        withNulls, Seq(col("zip")), col("diag"), t = 0.5)
      .select("class_size", "tv").as[(Long, Double)].collect()
    assert(tv.length == 2)
    assert(tv.forall(_._1 == 3L))
  }

  test("the suppressed subset is itself k-anonymous (audit fixpoint)") {
    val anon = KAnonymity.suppress(df, Seq(col("zip"), col("age")), k = 2)
    val reaudit = KAnonymity.audit(anon, Seq(col("zip"), col("age")), k = 2)
      .where(col("violating")).count()
    assert(reaudit == 0L)
  }
}
