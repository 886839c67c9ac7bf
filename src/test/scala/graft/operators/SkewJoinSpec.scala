package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private lazy val fact = (
    Seq.fill(900)(7L) ++ (1L to 100L)
  ).zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
  private lazy val dim =
    (1L to 120L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("salted inner join equals the plain join row-for-row") {
    val plain = fact.join(dim, Seq("k"))
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(
      salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join changed the result")
  }

  test("salted left join preserves unmatched fact rows") {
    val factExtra = fact.unionAll(Seq((999L, -1L)).toDF("k", "payload"))
    val plain = factExtra.join(dim, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(factExtra, dim, "k", salt = 4, joinType = "left")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key spreads across salt values") {
    val spread = SkewJoin
      .saltedJoin(fact, dim, "k", salt = 8)
      .filter(col("k") === 7L)
      .withColumn("s", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)))
      .select("s").distinct().count()
    assert(spread >= 6, s"expected the hot key to use most salt values, got $spread")
  }
}
