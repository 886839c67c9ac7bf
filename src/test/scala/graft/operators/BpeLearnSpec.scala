package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.BpeLearn

class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side reference trainer: same semantics
    * (frequency-weighted pair counts, count DESC then (a,b) ASC
    * argmax, leftmost non-overlapping fuse), different code shape. */
  private def refLearn(texts: Seq[String], nMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = texts.flatMap(
      _.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1))
    var vocab: Map[List[String], Long] = words
      .groupBy(_.map(_.toString).toList)
      .map { case (k, v) => (k, v.size.toLong) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var stop = false
    for (i <- 1 to nMerges if !stop) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), pn) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head
        out += ((i, a, b, pn))
        vocab = vocab.map { case (syms, n) =>
          val fused = List.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              fused += (a + b); j += 2
            } else { fused += syms(j); j += 1 }
          }
          (fused.result(), n)
        }
      }
    }
    out.result()
  }

  private def runLearn(texts: Seq[String], n: Int) =
    BpeLearn.learn(texts.toDF("text"), col("text"), n)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("matches the reference trainer on a corpus with overlap traps") {
    // "aaa" forces the non-overlapping leftmost fuse; ties exercised
    val texts = Seq("aaa aaa", "ab ab ab", "low lower lowest")
    assert(runLearn(texts, 5) == refLearn(texts, 5))
  }

  test("matches the reference trainer on the real fixture") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val texts = docs.select("text").as[String].collect().toSeq
    val got = BpeLearn.learn(docs, col("text"), nMerges = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == refLearn(texts, 4))
  }

  test("learned merges drive the apply-time tokenizer") {
    val texts = Seq("banana banana bandana")
    val merges = runLearn(texts, 3).map(m => (m._2, m._3))
    // the fused pairs must re-tokenize their own corpus consistently:
    // every learned symbol is a substring of some corpus word
    merges.foreach { case (a, b) =>
      assert(texts.exists(_.contains(a + b)), s"phantom merge $a+$b")
    }
  }

  test("degenerate corpora stop early instead of failing") {
    // single-char words only: no adjacent pairs anywhere
    assert(runLearn(Seq("a b c", "d e"), 3).isEmpty)
    intercept[IllegalArgumentException] {
      BpeLearn.learn(Seq("x").toDF("text"), col("text"), 0)
    }
  }
}
