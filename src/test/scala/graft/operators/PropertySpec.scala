package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.SparkSpec

/** Property-based invariants over randomized inputs — each property
  * runs a reduced trial count (Spark jobs per trial) but explores
  * shapes the handcrafted fixtures cannot. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)

  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("GraphRank mass conservation, exact, randomized") {
    val genEdges = Gen.listOfN(10,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    holds(Prop.forAll(genEdges, Gen.choose(1, 4)) { (edges, rounds) =>
      val nodes = (0L to 5L).map(i => s"n$i")
      val e = edges.map { case (a, b) => (s"n$a", s"n$b") }
      val total = GraphRank.rank(
          nodes.toDF("n"), "n", e.toDF("s", "d"), "s", "d", rounds)
        .as[(String, Long)].collect().map(_._2).sum
      total == 6L * 1000000L
    })
  }

  test("asofNearest matches a naive argmin join on random series") {
    val genRows = Gen.listOfN(14,
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    holds(Prop.forAll(genRows, genRows) { (ls, rs) =>
      // unique (key, ord) per side: the operator's documented
      // determinism precondition
      val l = ls.distinct.map { case (k, o) => (k, o, s"l$k-$o") }
      val r = rs.distinct.map { case (k, o) => (k, o, s"r$k-$o") }
      val got = AsOfJoin.asofNearest(
          l.toDF("k", "ord", "lv"), r.toDF("k", "ord", "rv"),
          Seq("k"), "ord")
        .select("k", "ord", "r_ord")
        .as[(Long, Long, Option[Long])].collect()
        .map(x => (x._1, x._2) -> x._3).toMap
      l.forall { case (k, o, _) =>
        val cands = r.filter(_._1 == k)
        val expect =
          if (cands.isEmpty) None
          else {
            val best = cands.minBy(c =>
              (math.abs(c._2 - o), if (c._2 <= o) 0 else 1))
            Some(best._2)
          }
        got((k, o)) == expect
      }
    })
  }

  test("BpeLearn merge table is prefix-stable in nMerges") {
    val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val genTexts = Gen.listOfN(4, Gen.listOfN(3, word).map(_.mkString(" ")))
    holds(Prop.forAll(genTexts) { texts =>
      val df = texts.toDF("text")
      val m3 = graft.operators.text.BpeLearn
        .learn(df, col("text"), 3)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      val m5 = graft.operators.text.BpeLearn
        .learn(df, col("text"), 5)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      m5.take(m3.length).startsWith(m3) && m3.length <= 3
    })
  }
}
