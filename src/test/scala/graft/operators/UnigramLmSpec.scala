package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{MinSegVocab, SubwordSegment, UnigramVocab}
import graft.operators.text.UnigramLm
import org.apache.spark.unsafe.types.UTF8String

class UnigramLmSpec extends SparkSpec {

  private def toks(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  // ---- MinSegVocab kernel vs brute-force enumeration ----

  private def bruteMinSeg(
      w: String, vocab: Map[String, Long], maxLen: Int): Option[(Int, Long)] = {
    // all segmentations; optimum by (pieces asc, weight desc)
    def segs(i: Int): Seq[List[String]] =
      if (i == w.length) Seq(Nil)
      else
        (1 to math.min(maxLen, w.length - i)).flatMap { l =>
          val p = w.substring(i, i + l)
          if (vocab.contains(p)) segs(i + l).map(p :: _) else Nil
        }
    val all = segs(0)
    if (all.isEmpty) None
    else {
      val best = all.map(s => (s.size, s.map(vocab).sum)).minBy { case (n, c) => (n, -c) }
      Some(best)
    }
  }

  test("minseg DP matches brute-force optimum on random-ish vocab") {
    val vocab = Map(
      "a" -> 5L, "b" -> 4L, "c" -> 3L, "ab" -> 9L, "bc" -> 10L,
      "abc" -> 2L, "cab" -> 20L, "abca" -> 1L)
    val v = new MinSegVocab(vocab.toSeq, 4)
    for (w <- Seq("abc", "abcabc", "cababc", "aabbcc", "abcabca", "a", "cab")) {
      val got = toks(v.tokenize(UTF8String.fromString(w)))
      val Some((bn, bc)) = bruteMinSeg(w, vocab, 4)
      assert(got.mkString("") == w, s"roundtrip $w -> $got")
      assert(got.size == bn, s"$w: pieces ${got.size} != optimal $bn")
      assert(got.map(vocab).sum == bc, s"$w: weight != optimal")
    }
  }

  test("minseg skips uncoverable words but bridges uncovered chars") {
    val v = new MinSegVocab(Seq("a" -> 1L, "xy" -> 1L), 2)
    // 'x' alone is not in vocab, but 'xy' bridges over it
    assert(toks(v.tokenize(UTF8String.fromString("axya"))) == Seq("a", "xy", "a"))
    // 'z' is uncoverable -> the whole word contributes nothing
    assert(toks(v.tokenize(UTF8String.fromString("az a"))) == Seq("a"))
  }

  test("unigram viterbi prefers the higher-probability path") {
    // two pieces cover "ab": single chars (2 pieces, scores -1-1=-2)
    // vs "ab" (score -1.5) -> "ab" wins; flipping its score loses
    val v1 = new UnigramVocab(Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5), 2)
    assert(toks(v1.tokenize(UTF8String.fromString("ab"))) == Seq("ab"))
    val v2 = new UnigramVocab(Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -2.5), 2)
    assert(toks(v2.tokenize(UTF8String.fromString("ab"))) == Seq("a", "b"))
  }

  // ---- seeding and training on the fixture corpus ----

  test("seed is the top-N substring cut with total-order ties") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val seed = UnigramLm.seed(docs, col("text"), maxLen = 6, topN = 50).collect()
    assert(seed.length == 50)
    val cnts = seed.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)), "seed not count-descending")
    // single chars dominate any corpus's substring counts
    assert(seed.take(3).forall(_.getString(0).length == 1))
  }

  test("learn: objective monotone per phase, coverage holds, vocab pruned") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = UnigramLm.learn(docs, col("text"),
      UnigramLm.Config(seedSize = 100, targetVocab = 60,
        roundsPhase1 = 3, roundsPhase2 = 2))
    assert(r.rounds.size == 5)
    for (phase <- Seq(1, 2)) {
      val js = r.rounds.filter(_.phase == phase).sortBy(_.round).map(_.obj)
      js.zip(js.drop(1)).foreach { case (a, b) =>
        assert(b <= a + 1e-9, s"phase $phase objective increased: $a -> $b")
      }
    }
    assert(r.roundtripViolations == 0L)
    assert(r.vocab.size <= 100)
    assert(r.rounds.filter(_.phase == 2).forall(_.vocabSize <= 60 + 40))
    // scores are log-probs of a (smoothed) distribution: all negative
    assert(r.vocab.forall(_._2 < 0.0))
  }

  test("minseg tokens round-trip the corpus under the seeded vocab") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val vocab = UnigramLm.seedVocab(docs, col("text"), maxLen = 6, topN = 120)
    val norm = TextOps.normalized(col("text"))
    val bad = docs
      .select(
        // pieces concatenated with NO separator must equal the
        // normalized text minus its spaces (full coverage: the seed
        // includes every corpus character)
        when(
          concat_ws("", SubwordSegment.minsegTokens(norm, vocab, 6)) =!=
            regexp_replace(norm, " ", ""),
          lit(1)).otherwise(lit(0)).as("v"))
      .agg(sum("v")).head().getLong(0)
    assert(bad == 0L)
  }
}
