package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup._
import graft.operators.similarity.VectorOps

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "The  Quick  Brown  Fox jumps over the lazy dog"), // normalized dup of 1
    (4L, "the quick brown fox jumps over the sleepy dog"), // near dup (1 word)
    (5L, "completely different content about spark dataframes and shuffles"),
    (6L, "completely different content about spark dataframes and shuffles!") // near dup of 5
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id per identical text") {
    val ids = ExactDedup.dedup(docs, col("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("normalized exact dedup also collapses doc 3") {
    val key = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val ids = ExactDedup.dedup(docs, key, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("minhash finds the near-dup pairs and estimates high jaccard") {
    val pairs = MinHashLSH
      .candidatePairs(docs, col("text"), col("doc_id"),
        MinHashLSH.Params(shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.5))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 4L)) || pairs.contains((2L, 4L)), s"near dup missing: $pairs")
    assert(pairs.contains((5L, 6L)), s"punctuation near-dup missing: $pairs")
    assert(!pairs.exists(p => Set(1L, 2L, 3L, 4L).contains(p._1) && Set(5L, 6L).contains(p._2)),
      s"false positive across topics: $pairs")
  }

  test("minhash estimate equals 1.0 for identical docs") {
    val est = MinHashLSH
      .candidatePairs(docs.filter(col("doc_id").isin(1, 2)), col("text"), col("doc_id"),
        MinHashLSH.Params())
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash: identical docs have distance 0, near dups small, distinct large") {
    val fp = SimHashDedup.fingerprints(docs, col("text"), col("doc_id"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(4L)) <= 16, "one-word edit should be close")
    assert(ham(fp(1L), fp(5L)) > 16, "different topics should be far")
  }

  test("simhash pairs picks up token-identical docs at hamming 0") {
    // docs 1, 2, 3 all normalize to identical token streams
    val pairs = SimHashDedup.candidatePairs(docs, col("text"), col("doc_id"), maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("ngram jaccard is 1.0 for identical docs and sane for near dups") {
    val withBlock = docs.withColumn("src", lit("all"))
    val pairs = NGramJaccard
      .pairsWithinBlock(withBlock, col("text"), col("doc_id"), col("src"), n = 2, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 4L)) > 0.5 && pairs((1L, 4L)) < 1.0)
  }

  test("native sorted shingles equal the HOF formulation on real docs") {
    val real = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val both = real.select(
      graft.functions.ShingleExprs
        .sortedCharShingles(TextOps.normalized(col("text")), 5).as("nat_c"),
      array_sort(TextOps.charShingles(col("text"), 5)).as("hof_c"),
      graft.functions.ShingleExprs
        .sortedTokenShingles(TextOps.normalized(col("text")), 2).as("nat_t"),
      array_sort(TextOps.tokenShingles(col("text"), 2)).as("hof_t"))
    assert(both.filter(col("nat_c") =!= col("hof_c")).isEmpty,
      "char shingles diverge from HOF")
    assert(both.filter(col("nat_t") =!= col("hof_t")).isEmpty,
      "token shingles diverge from HOF")
    // short/degenerate inputs follow the same whole-stream convention
    val edge = Seq("", "ab", "one two").toDF("text")
    val e = edge.select(
      graft.functions.ShingleExprs
        .sortedCharShingles(TextOps.normalized(col("text")), 5).as("nat"),
      array_sort(TextOps.charShingles(col("text"), 5)).as("hof"))
    assert(e.filter(col("nat") =!= col("hof")).isEmpty)
  }

  test("inverted-index jaccard pairs equal the dense join for positive thresholds") {
    val withBlock = docs.withColumn("src", lit("all"))
    val inv = NGramJaccard
      .pairsWithinBlock(withBlock, col("text"), col("doc_id"), col("src"),
        n = 2, threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSet
    // dense path forced via threshold <= 0, filtered to the same bar
    val dense = NGramJaccard
      .pairsWithinBlock(withBlock, col("text"), col("doc_id"), col("src"),
        n = 2, threshold = 0.0)
      .filter(col("jaccard") >= 0.1)
      .as[(Long, Long, Double)].collect().toSet
    assert(inv == dense, s"inverted=$inv dense=$dense")
  }

  test("containment flags a short doc quoted inside a long one") {
    val quoted = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "intro words alpha beta gamma delta plus lots more trailing content here now okay"),
      (3L, "totally unrelated text about other things entirely different")
    ).toDF("doc_id", "text").withColumn("src", lit("all"))
    val cont = NGramJaccard
      .containmentPairs(quoted, col("text"), col("doc_id"), col("src"),
        n = 2, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cont == Map((1L, 2L) -> 1.0)) // subset -> containment 1.0
    // while symmetric Jaccard on the same pair is far below any dedup bar
    val jac = NGramJaccard
      .pairsWithinBlock(quoted, col("text"), col("doc_id"), col("src"),
        n = 2, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(jac((1L, 2L)) < 0.3)
  }

  test("sorted-merge jaccard kernel equals the hash-set builtins") {
    val pairs = Seq(
      (Seq("a b", "b c", "c d"), Seq("b c", "c d", "d e")),
      (Seq("x"), Seq("x")),
      (Seq("x"), Seq("y")),
      (Seq.empty[String], Seq("y")),
      (Seq("dup", "dup2", "zz"), Seq.empty[String])
    ).toDF("a", "b")
    val got = pairs.select(
      NGramJaccard.jaccard(col("a"), col("b")).as("hashset"),
      NGramJaccard.jaccardSorted(
        array_sort(col("a")), array_sort(col("b"))).as("merged"))
      .as[(Double, Double)].collect()
    got.foreach { case (h, m) => assert(h == m, s"$h != $m") }
  }

  test("embedding cosine dedup finds planted duplicate vector") {
    val base = Array.tabulate(8)(i => i.toFloat / 10f)
    val nearDup = base.clone(); nearDup(0) += 0.001f
    val other = Array.tabulate(8)(i => (8 - i).toFloat / 10f)
    val emb = Seq(
      (10L, base.toSeq), (11L, nearDup.toSeq), (12L, other.toSeq)
    ).toDF("vec_id", "embedding")
    val pairs = EmbeddingDedup
      .candidatePairs(emb, col("embedding"), col("vec_id"), dim = 8,
        threshold = 0.999, nbits = 2, numTables = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)))
    assert(!pairs.exists(p => p._2 == 12L || p._1 == 12L))
  }

  test("vector ops: cosine of orthogonal/identical vectors") {
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
    val c = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(math.abs(c) < 1e-9)
    val d = df.select(VectorOps.cosine(col("a"), col("a")).as("c")).as[Double].head()
    assert(math.abs(d - 1.0) < 1e-9)
  }

  test("inverted-index gram cap drops flood grams, bounding pair expansion") {
    import graft.operators.dedup.NGramJaccard
    // every doc shares the flood bigram "x x"; all other grams unique
    val docs = (1L to 10L).map(i => (i, s"x x u$i v$i")).toDF("doc_id", "text")
    // default cap (1000) never engages: the flood gram alone links all
    // 45 pairs at a small positive threshold
    val uncapped = NGramJaccard.pairsWithinBlock(
      docs, col("text"), col("doc_id"), lit("b"), n = 2, threshold = 0.01)
    assert(uncapped.count() === 45)
    // cap 2 < 10 drops the flood gram BEFORE the posting join; the
    // remaining grams are unique, so no pair survives at all
    val capped = NGramJaccard.pairsWithinBlock(
      docs, col("text"), col("doc_id"), lit("b"), n = 2, threshold = 0.01,
      maxGramFreq = 2)
    assert(capped.count() === 0)
    // non-flood similarity is untouched by the cap: two docs sharing a
    // below-cap gram still pair
    val mixed = docs.union(Seq((11L, "x x u1 v1")).toDF("doc_id", "text"))
    val still = NGramJaccard.pairsWithinBlock(
      mixed, col("text"), col("doc_id"), lit("b"), n = 2, threshold = 0.01,
      maxGramFreq = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(still === Set((1L, 11L)))
  }

  test("cap scores the FILTERED gram sets: no half-counted flood denominators") {
    import graft.operators.dedup.NGramJaccard
    // docs 1/2 identical; every doc shares the flood prefix "shared
    // header text"; docs 3..10 diverge after it. maxGramFreq=3 floods
    // the two prefix grams out.
    val docs = (
      Seq((1L, "shared header text alpha beta"),
          (2L, "shared header text alpha beta")) ++
      (3L to 10L).map(i => (i, s"shared header text uniq$i tail$i")))
      .toDF("doc_id", "text")
    val pairs = NGramJaccard.pairsWithinBlock(
      docs, col("text"), col("doc_id"), lit("b"), n = 2, threshold = 0.5,
      maxGramFreq = 3)
      .as[(Long, Long, Double)].collect().toSeq
    // sizes corrected for dropped grams: the identical pair scores 1.0
    // of its KEPT grams (the uncorrected form scored 2/(4+4-2) = 0.33
    // and fell below threshold)
    assert(pairs === Seq((1L, 2L, 1.0)),
      s"identical docs must score 1.0 under the cap: $pairs")
    // containment agrees: 1.0 of the filtered sets
    val cont = NGramJaccard.containmentPairs(
      docs, col("text"), col("doc_id"), lit("b"), n = 2, threshold = 0.5,
      maxGramFreq = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont === Seq((1L, 2L, 1.0)), cont.toString)
  }

  test("containment dedup drops the quoted excerpt, keeps the quoting page") {
    import graft.operators.dedup.NGramJaccard
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s", 46L),
      // doc 2 is doc 1's prefix — fully contained, shorter → dropped
      (2L, "alpha beta gamma delta", "s", 22L),
      // docs 3/4: identical text (mutual containment, equal size) →
      // keep-first: 3 survives, 4 dies
      (3L, "iota kappa lambda mu", "s", 20L),
      (4L, "iota kappa lambda mu", "s", 20L),
      // doc 5: unrelated, survives untouched
      (5L, "nu xi omicron pi rho sigma", "s", 26L))
      .toDF("doc_id", "text", "source", "n_chars")
    val kept = NGramJaccard
      .dropContained(docs, col("text"), "doc_id", col("source"),
        col("n_chars"), n = 2, threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 5L)), kept.mkString(","))
  }

  test("fuzzy decontamination flags the near-dup of an eval doc, not the rest") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark plans and shuffles"))
      .toDF("doc_id", "text")
    val ev = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again!"))
      .toDF("doc_id", "text")
    val prof = graft.operators.text.Decontaminate
      .fuzzyProfile(train, ev, col("text"), col("doc_id"), threshold = 0.5)
      .select("doc_id", "n_eval_matches", "contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(prof.toSeq == Seq((1L, 1L, true), (2L, 0L, false)), prof.mkString(","))
  }

  test("soft-dedup weights: 1/cluster_size in milli, singletons weigh 1000") {
    implicit val s = spark
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely different content about spark plans and shuffles"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val w = SoftDedup
      .weights(d, col("text"), col("doc_id"), col("n_chars"), threshold = 0.3)
      .select("doc_id", "component", "cluster_size", "weight_milli",
        "effective_chars_milli")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(w.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((1L, 1L, 2L, 500L), (2L, 1L, 2L, 500L), (3L, 3L, 1L, 1000L)),
      w.mkString(","))
    // effective chars = floor(n_chars * 1000 / size)
    val lens = d.select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    w.foreach { r =>
      assert(r._5 == lens(r._1) * 1000L / r._3, s"doc ${r._1}")
    }
  }

  test("banding recall curve: monotone in bands, 12-band row equals pairs()") {
    val fixture = graft.Tables.load(spark, sf0001, "documents")
    val curve = PortableMinHash
      .bandingCurve(fixture, col("text"), col("doc_id"), 0.3, Seq(6, 12, 24))
      .select("bands", "n_candidates", "n_pairs", "recall_milli")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(6, 12, 24))
    // more bands = more candidates and at least as many pairs
    assert(curve.map(_._2).toSeq == curve.map(_._2).sorted.toSeq)
    assert(curve.map(_._3).toSeq == curve.map(_._3).sorted.toSeq)
    assert(curve.last._4 == 1000L, "max banding defines recall = 1")
    // the 12-band row IS the production portable banding: same count
    val direct = PortableMinHash
      .pairs(fixture, col("text"), col("doc_id"), 0.3).count()
    assert(curve(1)._3 == direct, s"${curve(1)._3} != $direct")
  }

  test("banding curve at bMax=48 (band index ≥ 32) equals brute force") {
    // regression for the 32-bit shiftleft literal: first-colliding-band
    // selection must be exact for bands 32..47, or pairs whose first
    // collision lands there are silently dropped / double-kept
    val fixture = graft.Tables.load(spark, sf0001, "documents")
    val curve = PortableMinHash
      .bandingCurve(fixture, col("text"), col("doc_id"), 0.3, Seq(6, 48))
      .select("bands", "n_candidates", "n_pairs", "recall_milli")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val sigs = fixture
      .select(col("doc_id"), PortableMinHash.signature(
        graft.operators.TextOps.normalized(col("text"))).as("sig"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    val k = PortableMinHash.numHashes
    def legCounts(b: Int): (Long, Long) = {
      val rpb = k / b
      var cand = 0L
      var good = 0L
      for (i <- sigs.indices; j <- (i + 1) until sigs.length) {
        val (sa, sb) = (sigs(i)._2, sigs(j)._2)
        val collides = (0 until b).exists(f =>
          (f * rpb until (f + 1) * rpb).forall(x => sa(x) == sb(x)))
        if (collides) {
          cand += 1
          val matches = (0 until k).count(x => sa(x) == sb(x))
          if (matches.toDouble / k >= 0.3) good += 1
        }
      }
      (cand, good)
    }
    val want = Seq(6, 48).map { b =>
      val (c, g) = legCounts(b); (b, c, g)
    }
    assert(curve.map(r => (r._1, r._2, r._3)) == want,
      s"curve $curve vs brute $want")
    assert(curve.last._4 == 1000L)
    // the regression is only exercised if some pair's FIRST colliding
    // band lands in 31..47 (where a 32-bit shifted literal wraps)
    val lateFirst = (for {
      i <- sigs.indices.iterator
      j <- ((i + 1) until sigs.length).iterator
      first = (0 until k).find(f => sigs(i)._2(f) == sigs(j)._2(f))
      if first.exists(_ >= 31)
    } yield 1).size
    assert(lateFirst > 0, "no pair first-collides at band >= 31; " +
      "fixture does not exercise the 64-bit shift path")
  }

  test("LSH planner picks the grid-optimal banding per target threshold") {
    import graft.operators.dedup.MinHashLSH
    // hand-checked S-curve thresholds over divisors of 48:
    // (1/24)^(1/2)=0.204, (1/12)^(1/4)=0.537, (1/8)^(1/6)=0.707
    assert(MinHashLSH.planBands(48, 0.3).bands === 24)
    assert(MinHashLSH.planBands(48, 0.5).bands === 12)
    assert(MinHashLSH.planBands(48, 0.7).bands === 8)
    // the default Params banding is what the planner derives for 0.5
    assert(MinHashLSH.planBands(48, 0.5) ===
      MinHashLSH.Params(numHashes = 48, bands = 12, threshold = 0.5))
    // S-curve is monotone in s for any planned banding
    val p = MinHashLSH.planBands(48, 0.5)
    val probs = (1 to 9).map(i => MinHashLSH.collisionProb(i / 10.0, p.bands, p.rows))
    assert(probs === probs.sorted)
  }
}
