package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.text.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash split is deterministic, total, and roughly proportional") {
    val docs = Tables.load(spark, sf001, "documents")
    val counts = docs
      .groupBy(CorpusOps.splitAssign(col("doc_id")).as("split"))
      .count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "validation", "test")))
    assert(counts.values.sum == docs.count())
    // 80/10/10 within generous tolerance at n=500
    assert(counts("train") > 350 && counts("train") < 450, counts.toString)
    // determinism: recompute equals itself
    val again = docs
      .groupBy(CorpusOps.splitAssign(col("doc_id")).as("split"))
      .count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("packBins fills sequentially and only overfills at bin boundaries") {
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 500L),
      ("a", 4L, 700L), ("b", 1L, 2500L), ("b", 2L, 100L)
    ).toDF("src", "id", "toks")
    val got = df
      .withColumn("bin", CorpusOps.packBins(col("toks"), col("src"), col("id"), 2048L))
      .select("src", "id", "bin")
      .as[(String, Long, Long)].collect().toSet
    // a: cums 1000,2000,2500,3200 -> starts 0,1000,2000,2500 -> bins 0,0,0,1
    // b: cums 2500,2600 -> starts 0,2500 -> bins 0,1
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
  }

  test("hashSample: deterministic, proportional, and nested across rates") {
    val docs = Tables.load(spark, sf001, "documents").select("doc_id")
    val n = docs.count()
    val t30 = CorpusOps.sampleThreshold(0.3)
    val t60 = CorpusOps.sampleThreshold(0.6)
    val s30 = docs.where(CorpusOps.hashSample(col("doc_id"), t30))
    val s60 = docs.where(CorpusOps.hashSample(col("doc_id"), t60))
    val (n30, n60) = (s30.count(), s60.count())
    // proportional within generous tolerance at n=500
    assert(math.abs(n30 - 0.3 * n) < 0.1 * n, s"$n30 of $n at 30%")
    assert(math.abs(n60 - 0.6 * n) < 0.1 * n, s"$n60 of $n at 60%")
    // nested: the 30% sample is a subset of the 60% sample
    assert(s30.exceptAll(s60).isEmpty)
    // edge thresholds: 0 keeps nothing, 2^40 keeps everything
    assert(docs.where(CorpusOps.hashSample(col("doc_id"),
      CorpusOps.sampleThreshold(0.0))).isEmpty)
    assert(docs.where(CorpusOps.hashSample(col("doc_id"),
      CorpusOps.sampleThreshold(1.0))).count() == n)
  }

  test("split percentages validate") {
    intercept[IllegalArgumentException] {
      CorpusOps.splitAssign(col("x"), trainPct = 90, validPct = 20)
    }
  }

  test("chunkTokens windows cover every token with the requested stride") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "short doc")                               // 2 tokens
    ).toDF("doc_id", "text")
    val chunks = CorpusOps
      .chunkTokens(docs, col("text"), col("doc_id"), maxTokens = 8, stride = 4)
      .as[(Long, Int, Int, String)].collect().sortBy(c => (c._1, c._2))
    val d1 = chunks.filter(_._1 == 1L)
    // starts 1, 5, 9; lengths 8, 6, 2
    assert(d1.map(_._2).sameElements(Array(1, 5, 9)))
    assert(d1.map(_._3).sameElements(Array(8, 6, 2)))
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == 2)
    // overlapping windows: consecutive chunks share maxTokens - stride
    // tokens, so every token is covered at least once
    assert(d1.map(c => c._2 to (c._2 + c._3 - 1)).flatten.distinct.sorted
      .sameElements(1 to 10))
  }

  test("oovProfile: rate reflects the vocabulary cut deterministically") {
    val docs = Seq(
      (1L, "common common common rare1"),
      (2L, "common other other rare2 rare3")
    ).toDF("doc_id", "text")
    // vocab of size 2 = {common(4), other(2)}; rare* are OOV
    val p = CorpusOps.oovProfile(docs, col("text"), col("doc_id"), vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(p(1L) == ((1L, 4L, 3L, 0.25)))
    assert(p(2L) == ((2L, 5L, 3L, 0.4)))
    // a huge vocab means nothing is OOV
    val all = CorpusOps.oovProfile(docs, col("text"), col("doc_id"), vocabSize = 100)
      .select("oov_rate").as[Double].collect()
    assert(all.forall(_ == 0.0))
  }

  test("mixThreshold: clamp at/over target, fractional below, zero cases") {
    val full = 1L << 40
    assert(CorpusOps.mixThreshold(1000L, 2000L, 60) == full) // target 1200 >= 1000
    assert(CorpusOps.mixThreshold(1000L, 1000L, 100) == full) // exactly at target
    val t = CorpusOps.mixThreshold(2000L, 2000L, 50) // target 1000 of 2000
    assert(t == math.floor(0.5 * full.toDouble).toLong)
    assert(CorpusOps.mixThreshold(1000L, 2000L, 0) == 0L) // pct 0 keeps nothing
  }

  test("tokenMix downsamples heavy sources toward their token targets") {
    val docs = Tables.load(spark, sf001, "documents")
    val kept = CorpusOps.tokenMix(
      docs, col("text"), col("doc_id"), col("source"),
      budgetTokens = 2000L,
      pctBySource = Map("src0" -> 100), defaultPct = 10)
    val tokens = graft.operators.text.TextAnalysis.tokenCount(col("text")).cast("long")
    val by = kept.groupBy("source").agg(sum(tokens).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0All = docs.filter(col("source") === "src0")
      .agg(sum(tokens)).head().getLong(0)
    // src0 target (2000) exceeds its mass: kept in full
    assert(by("src0") == src0All)
    // a default source's kept mass lands near its 200-token target
    // (documents are ~60 tokens, so within a few docs of the target)
    val others = by.filter(_._1 != "src0").values
    assert(others.forall(_ < 600), s"default sources not downsampled: $by")
    // determinism: same inputs, same kept set
    val again = CorpusOps.tokenMix(
      docs, col("text"), col("doc_id"), col("source"),
      2000L, Map("src0" -> 100), 10)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }

  test("quarterPow is the exactly-rounded sqrt-chain family") {
    assert(CorpusOps.quarterPow(16.0, 1.0) == 16.0)
    assert(CorpusOps.quarterPow(16.0, 0.5) == 4.0)
    assert(CorpusOps.quarterPow(16.0, 0.25) == 2.0)
    assert(CorpusOps.quarterPow(16.0, 0.75) == 8.0)
    intercept[IllegalArgumentException](CorpusOps.quarterPow(16.0, 0.3))
  }

  test("temperature thresholds flatten the mixture as alpha drops") {
    val actual = Map("big" -> 90000L, "small" -> 10000L)
    def keepFrac(alpha: Double): (Double, Double) = {
      val thr = CorpusOps.temperatureThresholds(actual, 50000L, alpha)
      val full = (1L << 40).toDouble
      (thr("big") / full, thr("small") / full)
    }
    val (b1, s1) = keepFrac(1.0)
    val (b5, s5) = keepFrac(0.5)
    // alpha = 1 is proportional: equal keep fractions
    assert(math.abs(b1 - s1) < 1e-9, s"alpha=1 not proportional: $b1 vs $s1")
    // alpha = 0.5 upweights the small source at the big one's expense
    assert(s5 > s1 && b5 < b1, s"no flattening: big $b1->$b5 small $s1->$s5")
    // a source whose target exceeds its mass clamps to keep-everything
    val thr = CorpusOps.temperatureThresholds(
      Map("tiny" -> 100L, "huge" -> 1000000L), 500000L, 0.5)
    assert(thr("tiny") == (1L << 40))
  }

  test("temperatureThresholds handles zero-token sources without NaN") {
    // a zero-token source gets threshold 0 by the explicit guard, and
    // its zero a^alpha must not poison the other sources' shares
    val thr = CorpusOps.temperatureThresholds(
      Map("empty" -> 0L, "full" -> 1000L), 500L, 0.5)
    assert(thr("empty") == 0L)
    assert(thr("full") > 0L)
    // all sources empty: every threshold 0, no NaN/zero-division blowup
    val allEmpty = CorpusOps.temperatureThresholds(
      Map("a" -> 0L, "b" -> 0L), 500L, 0.5)
    assert(allEmpty.values.forall(_ == 0L))
  }

  test("temperatureMix keeps a deterministic hash subset per source") {
    val docs = Tables.load(spark, sf001, "documents")
    val kept = CorpusOps.temperatureMix(
      docs, col("text"), col("doc_id"), col("source"),
      budgetTokens = 2000L, alpha = 0.5)
    val again = CorpusOps.temperatureMix(
      docs, col("text"), col("doc_id"), col("source"),
      budgetTokens = 2000L, alpha = 0.5)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    assert(kept.count() > 0 && kept.count() < docs.count())
  }

  test("capPerSource keeps the cap best-scored docs per source") {
    val scored = Seq(
      (1L, "a", 0.9), (2L, "a", 0.5), (3L, "a", 0.7), (4L, "a", 0.5),
      (5L, "b", 0.1)
    ).toDF("doc_id", "source", "score")
    val out = CorpusOps
      .capPerSource(scored, "source", col("score"), "doc_id", cap = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getBoolean(4))).toMap
    // a: 1 (0.9) rank 1, 3 (0.7) rank 2 kept; score tie 2-vs-4 breaks
    // to the lower id for rank 3
    assert(out(1L) == (1, true) && out(3L) == (2, true))
    assert(out(2L) == (3, false) && out(4L) == (4, false))
    assert(out(5L) == (1, true)) // small sources keep everything
    intercept[IllegalArgumentException] {
      CorpusOps.capPerSource(scored, "source", col("score"), "doc_id", 0)
    }
  }

  test("quotaSample: exact per-stratum counts, stable, monotone under removal") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents").cache()
    // sf0.001 sources hold ~25 docs each; n=10 leaves real non-members
    val n = 10
    val sample = CorpusOps.quotaSample(docs, col("source"), col("doc_id"), n)
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sample.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, sz) =>
      assert(got(src) === math.min(n.toLong, sz), s"source $src")
    }
    // partitioning-invariant
    val again = CorpusOps
      .quotaSample(docs.repartition(7), col("source"), col("doc_id"), n)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val ids = sample.select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === ids)
    // removing a NON-member never churns the sample
    val nonMember = docs.select("doc_id").as[Long].collect()
      .find(id => !ids.contains(id)).get
    val without = CorpusOps
      .quotaSample(docs.filter(col("doc_id") =!= nonMember),
        col("source"), col("doc_id"), n)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(without === ids)
    // shared session: a lingering fixture cache poisons PlanShapeSpec's
    // column-pruning pins
    docs.unpersist()
  }

  test("water-fill: saturated source pins at its cap, share redistributes") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.operators.text.MixtureSolver
    // weights sqrt(raw): a=10, b=10, c=20 (W=40). Round 1 at B=300:
    // a gets 75 >= cap 5 -> saturates at 5; round 2 over W=30, B=295:
    // b = floor(295*10/30) = 98, c = floor(295*20/30) = 196; fixpoint.
    val per = Seq(("a", 100L, 5L), ("b", 100L, 1000L), ("c", 400L, 1000L))
      .toDF("source", "raw_tokens", "avail_tokens")
    val expect = Seq(("a", 5L, true), ("b", 98L, false), ("c", 196L, false))
    val got = MixtureSolver.waterFill(per, budget = 300L)
      .select("source", "target_tokens", "saturated")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == expect, got.mkString(","))
    // fixpoint: extra rounds change nothing
    val more = MixtureSolver.waterFill(per, budget = 300L, rounds = 12)
      .select("source", "target_tokens", "saturated")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(more == expect, more.mkString(","))
    // small budget: a's 25% share (10 of 40) still tops its cap of 5 —
    // saturates; b/c split the remaining 35 over W=30
    val small = MixtureSolver.waterFill(per, budget = 40L)
      .select("source", "target_tokens", "saturated")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(small == Seq(("a", 5L, true), ("b", 11L, false), ("c", 23L, false)),
      small.mkString(","))
  }

  test("effective tokens: dyadic epoch decay, clamped tails, zero unique") {
    val rows = Seq(
      (2500L, 1000L), // 2.5 epochs: 1000 + 500 + (500 >> 2) = 1625
      (800L, 1000L),  // partial first epoch: full value
      (0L, 1000L),    // no budget
      (2500L, 0L),    // fully-deduplicated-away source
      (100000L, 10L)  // horizon: sum over 20 epochs of 10 >> i = 10+5+2+1 = 18
    ).toDF("target", "unique")
    val got = rows
      .select(CorpusOps.effectiveTokens(col("target"), col("unique")).as("e"))
      .as[Long].collect().toSeq
    assert(got == Seq(1625L, 800L, 0L, 0L, 18L), got.mkString(","))
  }
}
