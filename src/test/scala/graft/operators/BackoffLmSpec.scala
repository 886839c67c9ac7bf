package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.BackoffLm

class BackoffLmSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side re-derivation of the stupid-backoff scoring with the
    * same integer micro-nat conventions. */
  private def ref(
      texts: Seq[(Long, String)],
      alpha: Double,
      minCount: Long): Map[Long, (Long, Long, Long, Long, Double)] = {
    val lnA = math.floor(math.log(alpha) * 1e6).toLong
    def micro(num: Long, den: Double): Long =
      math.floor(math.log(num / den) * 1e6).toLong
    val toks = texts.map { case (id, t) =>
      id -> t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
    }
    val c1 = toks.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val total = c1.values.sum.toDouble
    def count2(p1: String, w: String): Long = toks.map { case (_, ts) =>
      ts.sliding(2).count(s => s.length == 2 && s(0) == p1 && s(1) == w).toLong
    }.sum
    def count3(p2: String, p1: String, w: String): Long = toks.map { case (_, ts) =>
      ts.sliding(3).count(s =>
        s.length == 3 && s(0) == p2 && s(1) == p1 && s(2) == w).toLong
    }.sum
    toks.map { case (id, ts) =>
      var (tri, bi, uni, sum) = (0L, 0L, 0L, 0L)
      ts.zipWithIndex.foreach { case (w, i) =>
        val p1 = if (i >= 1) Some(ts(i - 1)) else None
        val p2 = if (i >= 2) Some(ts(i - 2)) else None
        val n3 = (p2, p1) match {
          case (Some(a), Some(b)) =>
            Some(count3(a, b, w)).filter(_ >= minCount)
          case _ => None
        }
        val n2 = p1.map(count2(_, w)).filter(c => c >= minCount && c > 0)
          .filter(_ >= minCount)
        if (n3.exists(_ > 0)) {
          tri += 1; sum += micro(n3.get, count2(p2.get, p1.get).toDouble)
        } else if (n2.exists(_ > 0)) {
          bi += 1
          sum += micro(n2.get, c1(p1.get).toDouble) +
            (if (p2.isDefined) lnA else 0L)
        } else {
          uni += 1
          sum += micro(c1(w), total) +
            (if (p2.isDefined) 2 * lnA else if (p1.isDefined) lnA else 0L)
        }
      }
      val ce = math.floor(-sum / 1e6 / ts.size * 1e4) / 1e4
      id -> ((ts.size.toLong, tri, bi, uni, ce))
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (3L, "the dog sat on the mat"),
    (4L, "rare words appear once only here"))

  test("matches a driver-side re-derivation (minCount=1)") {
    val got = BackoffLm.score(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"),
        alpha = 0.4, tau = 10.0, minCount = 1)
      .select("id", "n_tokens", "tri_hits", "bi_hits", "uni_hits", "ce")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == ref(corpus, 0.4, 1))
  }

  test("matches a driver-side re-derivation (minCount=2 prunes singletons)") {
    val got = BackoffLm.score(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"),
        alpha = 0.4, tau = 10.0, minCount = 2)
      .select("id", "n_tokens", "tri_hits", "bi_hits", "uni_hits", "ce")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == ref(corpus, 0.4, 2))
    // the all-singleton doc backs off to unigrams past its first two
    // positions (pos0 is uni by definition, pos1 bi-or-uni)
    val (_, tri4, _, uni4, _) = got(4L)
    assert(tri4 == 0L)
    assert(uni4 >= 4L)
  }

  test("self-trained minCount=1 never backs off past the position floor") {
    // every trigram of the stream is in its own count table, so lvl
    // is decided purely by position: pos0 uni, pos1 bi, pos>=2 tri
    val got = BackoffLm.score(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"),
        alpha = 0.4, tau = 10.0, minCount = 1)
      .select("id", "n_tokens", "tri_hits", "bi_hits", "uni_hits")
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (_, n, tri, bi, uni) =>
      assert(uni == 1L && bi == 1L && tri == n - 2)
    }
  }

  test("sequence-shuffled text scores worse than natural text") {
    // same unigram distribution, broken sequences: a unigram model
    // (qt38) cannot see the difference; the trigram backoff must.
    val train = (0 until 8).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta"))
    val probe = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "zeta gamma alpha epsilon beta delta"))
    val got = BackoffLm.score(
        (train ++ probe).toDF("doc_id", "text"), col("text"), col("doc_id"),
        alpha = 0.4, tau = 10.0, minCount = 2)
      .select("id", "ce").as[(Long, Double)].collect().toMap
    assert(got(101L) > got(100L))
  }

  test("minCount curve: state shrinks and CE degrades monotonically") {
    val texts = (0 until 12).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat too " + s"tail$i"))
    val curve = BackoffLm.minCountCurve(
        texts.toDF("doc_id", "text"), col("text"), col("doc_id"),
        alpha = 0.4, minCounts = Seq(1L, 2L, 4L))
      .orderBy("min_count")
      .select("min_count", "tri_table_rows", "bi_table_rows", "tri_rate", "ce")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(curve.map(_._1).sameElements(Array(1L, 2L, 4L)))
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2, "trigram table must shrink with minCount")
      assert(hi._3 <= lo._3, "bigram table must shrink with minCount")
      assert(hi._4 <= lo._4, "tri coverage cannot grow under pruning")
      assert(hi._5 >= lo._5, "CE cannot improve under pruning")
    }
    // mc=1 on self-trained data: full trigram coverage past the
    // position floor, so the curve's top row anchors at the known CE
    assert(curve.head._4 > 0.5)
  }

  test("coverage rolls up by language with integer-exact ce") {
    val df = corpus.toDF("doc_id", "text")
      .withColumn("lang", when(col("doc_id") <= 2, "en").otherwise("de"))
    val cov = BackoffLm.coverage(
        df, col("text"), col("doc_id"), col("lang"),
        alpha = 0.4, minCount = 1)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(cov("en")._2 == 2L && cov("de")._2 == 2L)
    val r = ref(corpus, 0.4, 1)
    // per-lang token counts agree with the per-doc reference
    assert(cov("en")._3 == r(1L)._1 + r(2L)._1)
    assert(cov("de")._3 == r(3L)._1 + r(4L)._1)
    // rates sum to 1 within the floor projection
    Seq("en", "de").foreach { l =>
      val (_, _, _, tr, br, ur, _) = cov(l)
      assert(math.abs(tr + br + ur - 1.0) < 3e-4)
    }
  }
}
