package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: reproducible
  * dataset splits and token-budget sequence packing. Both are pure
  * column expressions / windows — no collects, no nondeterminism — and
  * both are SQL-expressible, so they carry full DuckDB oracles.
  */
object CorpusOps {

  /** Deterministic 0..99 bucket from a record id: first 8 hex chars of
    * md5, mod 100. Hash-based (not rand(seed)) so the split is stable
    * across engines, runs, partitionings, and re-shards — the property
    * a train/test split must have in a pipeline that reprocesses data.
    */
  def splitBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("bigint") % 100

  /** train/validation/test label by cumulative bucket weights
    * (default 80/10/10). */
  def splitAssign(id: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100,
      "invalid split percentages")
    val b = splitBucket(id)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "validation")
      .otherwise("test")
  }

  /** 40-bit uniform hash key for deterministic sampling: first 10 hex
    * chars of md5 as a bigint in [0, 2^40). Engine-portable (DuckDB:
    * `CAST('0x'||substring(md5(x),1,10) AS BIGINT)`). */
  def hashKey40(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 10), 16, 10).cast("bigint")

  /** Deterministic Bernoulli sample: keep iff hashKey40(id) < threshold,
    * threshold = (fraction · 2^40) computed ONCE driver-side (see
    * [[sampleThreshold]]) and interpolated into both engines' queries as
    * the same integer — never compare against a float in-query, engines
    * round double→int differently. Unlike `df.sample`, membership is a
    * pure function of the id: stable across runs, partitionings, engines
    * and re-shards, and composable (a 10% sample is a subset of the 20%
    * sample). Per-stratum rates = CASE over strata picking thresholds. */
  def hashSample(id: Column, threshold: Long): Column = {
    require(threshold >= 0L && threshold <= (1L << 40), "threshold out of [0,2^40]")
    hashKey40(id) < lit(threshold)
  }

  /** fraction in [0,1] → integer keep-threshold on the 40-bit key. */
  def sampleThreshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    (BigDecimal(fraction) * BigDecimal(1L << 40)).toLong
  }

  /** Exact-quota deterministic sample: per stratum, the `n` rows with
    * the SMALLEST 40-bit hash keys (id tiebreak) — "exactly n
    * uniformly-chosen docs per source", where [[hashSample]]'s
    * rate-based cousin only hits n in expectation. Hash-rank order
    * makes membership a pure function of the ids present: stable
    * across runs/partitionings/engines, and MONOTONE under growth (a
    * new doc displaces at most the largest-keyed member; survivors
    * with smaller keys never churn). One window per stratum — the
    * same shuffle a per-stratum top-k already costs; quotas far above
    * stratum sizes degrade to identity. */
  def quotaSample(df: DataFrame, stratum: Column, id: Column, n: Int): DataFrame = {
    require(n > 0, s"bad quota $n")
    val w = Window.partitionBy(stratum).orderBy(hashKey40(id).asc, id.asc)
    df.withColumn("__hr", row_number().over(w))
      .filter(col("__hr") <= n)
      .drop("__hr")
  }

  /** Per-source keep-thresholds for token-proportional corpus mixing:
    * source s gets a token target of `budgetTokens · pct_s / 100`
    * (integer arithmetic — percent weights, not float fractions, so
    * both engines compute the same targets), and its keep-threshold on
    * the 40-bit hash key is `floor(target/actual · 2^40)`, clamped to
    * keep-everything when the source is already under target. The
    * division/multiply order is fixed (target→double / actual→double,
    * then · 2^40) so the thresholds are bit-identical wherever they are
    * recomputed — the portable-twin rule of [[sampleThreshold]] applied
    * to data-driven rates. */
  def mixThreshold(actualTokens: Long, budgetTokens: Long, pct: Int): Long = {
    require(actualTokens >= 0 && budgetTokens >= 0 && pct >= 0, "negative mix input")
    val target = budgetTokens * pct / 100
    if (target >= actualTokens) 1L << 40
    else math.floor((target.toDouble / actualTokens.toDouble) * (1L << 40).toDouble).toLong
  }

  /** Token-proportional downsampling across sources ("data mixing"):
    * keep a deterministic hash sample of each source sized so its kept
    * token mass approaches `budgetTokens · pct/100`. Two passes over
    * the corpus: one partial-aggregated token count per source (a
    * #sources-row collect — bounded, like the IVF fit), then the pure
    * hash filter. Membership is a function of (id, source counts)
    * only: stable across runs, engines, and partitionings, and
    * re-runnable incrementally. */
  def tokenMix(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      id: Column,
      source: Column,
      budgetTokens: Long,
      pctBySource: Map[String, Int],
      defaultPct: Int,
      // swap in a subword counter (graft.functions.WordPiece.count)
      // to budget in real tokenizer tokens instead of whitespace ones
      tokenCount: Option[Column] = None): org.apache.spark.sql.DataFrame = {
    val tokens = tokenCount.getOrElse(TextAnalysis.tokenCount(text)).cast("long")
    val actual = df
      .groupBy(source.as("__src"))
      .agg(sum(tokens).as("__tok"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val thr = actual.map { case (s, a) =>
      s -> mixThreshold(a, budgetTokens, pctBySource.getOrElse(s, defaultPct))
    }
    val thrCol = thr.foldLeft(lit(0L)) { case (acc, (s, t)) =>
      when(source === s, lit(t)).otherwise(acc)
    }
    df.where(hashKey40(id) < thrCol)
  }

  /** Exactly-rounded x^α for α ∈ {0.25, 0.5, 0.75, 1.0}: sqrt chains
    * plus at most one multiply — every step is correctly rounded under
    * IEEE 754, so ANY engine reproduces the value bit-identically.
    * General `pow()` is NOT correctly rounded (libm implementations
    * differ in the last ulp), which would make data-derived thresholds
    * engine-dependent — the same argument as [[sampleThreshold]]'s
    * integer-threshold rule, applied to the α family. */
  def quarterPow(x: Double, alpha: Double): Double = alpha match {
    case 1.0  => x
    case 0.5  => math.sqrt(x)
    case 0.25 => math.sqrt(math.sqrt(x))
    case 0.75 => math.sqrt(x) * math.sqrt(math.sqrt(x))
    case a =>
      throw new IllegalArgumentException(
        s"alpha must be one of 0.25, 0.5, 0.75, 1.0 (exactly-rounded sqrt chains); got $a")
  }

  /** Per-source keep-thresholds for TEMPERATURE-weighted mixing: source
    * s gets token target `budget · a_s^α / Σ a^α` — α < 1 upweights
    * small sources relative to proportional sampling (α = 1), the
    * standard multilingual/multi-domain mixture flattening. The α-power
    * sum folds over sources in NAME order with a 0.0 seed, mirrored
    * exactly by the oracle's ordered `list_reduce`, so the derived
    * integer thresholds are engine-identical. */
  def temperatureThresholds(
      actualBySource: Map[String, Long],
      budgetTokens: Long,
      alpha: Double): Map[String, Long] = {
    require(budgetTokens >= 0, "negative budget")
    val pows = actualBySource.toSeq.sortBy(_._1)
      .map { case (s, a) => (s, a, quarterPow(a.toDouble, alpha)) }
    val total = pows.foldLeft(0.0)(_ + _._3)
    pows.map { case (s, a, p) =>
      // a == 0 explicitly -> threshold 0 (a zero-token source has
      // nothing to keep; without the guard 0/0 = NaN would floor to 0
      // only by accident of NaN.toLong). total == 0 (ALL sources
      // empty) degenerates the same way through the a == 0 arm.
      if (a == 0L) s -> 0L
      else {
        val ratio = (budgetTokens.toDouble * (p / total)) / a.toDouble
        s -> math.floor(math.min(1.0, ratio) * (1L << 40).toDouble).toLong
      }
    }.toMap
  }

  /** Temperature mixing: [[tokenMix]]'s two-pass shape (bounded
    * #sources collect, then a pure hash filter) with targets derived
    * from the data itself via `a^α` instead of configured percentages. */
  def temperatureMix(
      df: DataFrame,
      text: Column,
      id: Column,
      source: Column,
      budgetTokens: Long,
      alpha: Double,
      tokenCount: Option[Column] = None): DataFrame = {
    val tokens = tokenCount.getOrElse(TextAnalysis.tokenCount(text)).cast("long")
    val actual = df
      .groupBy(source.as("__src"))
      .agg(sum(tokens).as("__tok"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val thr = temperatureThresholds(actual, budgetTokens, alpha)
    val thrCol = thr.foldLeft(lit(0L)) { case (acc, (s, t)) =>
      when(source === s, lit(t)).otherwise(acc)
    }
    df.where(hashKey40(id) < thrCol)
  }

  /** Fixed-window token chunking with stride — context-window prep:
    * each document yields chunks of up to `maxTokens` tokens starting
    * every `stride` tokens (stride < maxTokens → overlapping windows).
    * Output rows are (id, chunk_start [1-based token offset],
    * chunk_tokens, chunk_fp) — the md5 stands in for the chunk text so
    * downstream joins/dedup never carry the tokens. One narrow explode
    * per document; embarrassingly parallel. */
  def chunkTokens(
      df: DataFrame,
      text: Column,
      id: Column,
      maxTokens: Int,
      stride: Int,
      // swap in a subword stream (graft.functions.WordPiece.tokens) to
      // chunk on real tokenizer tokens instead of whitespace ones
      tokens: Option[Column] = None): DataFrame = {
    require(maxTokens > 0 && stride > 0, s"bad maxTokens=$maxTokens / stride=$stride")
    val toks = tokens.getOrElse(graft.operators.TextOps.tokens(text))
    df.select(id.as("id"), toks.as("__toks"))
      .withColumn("chunk_start",
        explode(sequence(lit(1), size(col("__toks")), lit(stride))))
      .select(
        col("id"),
        col("chunk_start"),
        size(slice(col("__toks"), col("chunk_start"), lit(maxTokens)))
          .as("chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("__toks"), col("chunk_start"), lit(maxTokens))))
          .as("chunk_fp"))
  }

  /** Per-document out-of-vocabulary profile against the corpus's own
    * top-`vocabSize` terms (the tokenizer-coverage signal): vocabulary
    * is the frequency-ranked term list (ties break by term — a total
    * order, so the cut is deterministic), and each document reports
    * its token count, in-vocabulary count, and OOV rate. Vocabulary is
    * small by construction → broadcast join against the token stream;
    * the per-doc rollup partial-aggregates map-side. */
  def oovProfile(
      df: DataFrame,
      text: Column,
      id: Column,
      vocabSize: Int,
      // swap in a subword stream (graft.functions.WordPiece.tokens) to
      // profile coverage in real tokenizer tokens
      tokens: Option[Column] = None): DataFrame = {
    // two consumers (vocabulary aggregation + the join) read the
    // exploded stream: materialize it once, or the join lineage
    // re-tokenizes the whole corpus (the SpanDedup Barrier pattern)
    val toks = graft.operators.Barrier(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"),
          explode(tokens.getOrElse(graft.operators.TextOps.tokens(text))).as("term")))
    val vocab = toks
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(1).as("iv"))
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("iv")).as("in_vocab"))
      .withColumn("oov_rate",
        graft.operators.PortableRound.floorTo(
          lit(1.0) - col("in_vocab").cast("double") / col("n_tokens").cast("double"), 4))
  }

  /** Greedy sequential packing: within each `part` (shard), walking in
    * `order`, a document's bin is where its token run begins —
    * `floor((cumsum(tokens) - tokens) / budget)`. A document crossing
    * the budget boundary overfills its bin rather than splitting (the
    * usual pre-tokenization pack). The window is per-shard, so at scale
    * the sort is bounded by shard size, not corpus size — pick `part`
    * (source, date, ...) so shards fit a task. */
  def packBins(
      tokens: Column,
      part: Column,
      order: Column,
      budgetTokens: Long): Column = {
    val w = Window.partitionBy(part).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, 0)
    floor((sum(tokens).over(w).cast("bigint") - tokens) / lit(budgetTokens))
      .cast("bigint")
  }

  /** Per-source quota cap — the guard against one crawl domain
    * dominating a mixture regardless of its quality scores: within
    * each source, rank by `quality` DESC (id ASC tiebreak — rank on an
    * engine-stable quality value for cross-engine determinism) and
    * keep at most `cap` rows. One keyed window over narrow rows; doc
    * text never moves. Complements [[tokenMix]]: that bounds a
    * source's TOKEN share by random thinning, this bounds its DOC
    * count keeping the best-scored ones. */
  def capPerSource(
      scored: DataFrame,
      source: String,
      quality: Column,
      idCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"bad cap $cap")
    val w = Window.partitionBy(source)
      .orderBy(quality.desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .withColumn("keep", col("rank") <= cap)
  }

  /** Effective tokens under repeated epochs with DYADIC diminishing
    * returns (the data-constrained-scaling discipline of Muennighoff
    * et al. 2023, "Scaling Data-Constrained Language Models", with the
    * decay pinned to r = 1/2 so every term is an integer shift): epoch
    * i over `unique` tokens is worth unique >> i, a partial final
    * epoch worth its consumed share at that epoch's rate —
    *
    *   effective = Σ_{i=0}^{19}  clamp(target − i·unique, 0, unique) >> i
    *
    * The 20-epoch horizon truncates terms below 2^-19 of an epoch
    * (immaterial); every operand is a plain BIGINT (i·unique ≤
    * 19·unique — no overflow at any corpus scale), every term a floor
    * shift both engines compute identically, and the SUM is
    * order-free, so the value oracles exactly. */
  def effectiveTokens(target: Column, unique: Column): Column =
    (0 until 20).map { i =>
      shiftright(
        least(greatest(target - lit(i.toLong) * unique, lit(0L)), unique), i)
    }.reduce(_ + _)

  /** DuckDB twin of [[effectiveTokens]] — `//` by 2^i equals the
    * shift for the non-negative clamped operand. */
  def effectiveTokensSql(target: String, unique: String): String =
    s"""CAST(list_sum(list_transform(range(0, 20), i ->
       |  LEAST(GREATEST($target - i * $unique, 0), $unique)
       |    // (1::BIGINT << CAST(i AS INT)))) AS BIGINT)""".stripMargin
}
