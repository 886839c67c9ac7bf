package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SubwordSegment
import graft.operators.{Barrier, TextOps}

/** Unigram-LM subword tokenizer TRAINING (the public SentencePiece
  * unigram algorithm, Kudo 2018) — the third member of the tokenizer
  * family next to [[graft.functions.WordPiece]] (greedy apply) and
  * [[BpeLearn]] (merge training): seed a candidate vocabulary from
  * frequent substrings, then alternate Viterbi segmentation (E-step)
  * with an add-alpha-smoothed multinomial re-estimate (M-step),
  * pruning to a target vocabulary between EM phases.
  *
  * Scale shape (same discipline as [[BpeLearn]]): the corpus collapses
  * ONCE into the word vocabulary (word, freq) — document text never
  * re-enters; seeding is one substring-explode aggregation bounded by
  * distinct-words × maxLen²; each EM round costs one vocab-sized count
  * aggregation over the segmented word vocabulary (map-side partial)
  * plus a vocab-sized driver collect (the bounded-collect class of the
  * k-means update — SentencePiece itself holds the piece table in
  * memory; ~1M pieces at any corpus size). Viterbi runs inside
  * whole-stage codegen via [[graft.functions.UnigramTokens]].
  *
  * Objective discipline: with add-alpha smoothing the M-step is the
  * exact minimizer of the penalized objective
  * `J(theta, seg) = sum_p c(p)(-ln theta_p) + alpha * sum_{p in V}(-ln theta_p)`
  * and hard-EM coordinate descent makes J monotonically non-increasing
  * across rounds of a fixed-vocab phase — the property the qt42 gate
  * pins. Every single-character piece of the corpus is seeded and never
  * pruned, so segmentation coverage (round-trip `concat(pieces) = word`)
  * holds by construction and is gate-verified.
  */
object UnigramLm {

  /** Training knobs; defaults sized for the fixture corpus. */
  final case class Config(
      maxLen: Int = 6,
      seedSize: Int = 120,
      targetVocab: Int = 80,
      roundsPhase1: Int = 2,
      roundsPhase2: Int = 2,
      alpha: Double = 0.1)

  /** One EM-round summary row. */
  final case class Round(
      phase: Int, round: Int, vocabSize: Int, nll: Double, obj: Double)

  /** (word, n) corpus word vocabulary — the only pass over text; also
    * the word-level frame qt47's fertility curve aggregates over. */
  def wordVocab(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextOps.tokens(text)).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** All substrings (length 1..maxLen) of a word column. */
  private def substrings(w: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(
        sequence(lit(1), least(lit(maxLen), length(w) - i + lit(1))),
        l => w.substr(i, l))))

  /** Candidate pieces with corpus frequency (weighted by word freq),
    * before the top-N cut. */
  private def candidates(words: DataFrame, maxLen: Int): DataFrame =
    words
      .select(explode(substrings(col("w"), maxLen)).as("piece"), col("n"))
      .groupBy("piece").agg(sum("n").cast("bigint").as("cnt"))

  /** qt40: the seed vocabulary — top `topN` substrings by
    * (cnt DESC, piece ASC), a total order, so the cut is deterministic
    * and engine-portable. TakeOrdered shape: no global sort shuffle. */
  def seed(df: DataFrame, text: Column, maxLen: Int, topN: Int): DataFrame =
    candidates(wordVocab(df, text), maxLen)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topN)

  /** Seed pieces UNION all single-character candidates (coverage), as
    * a driver-side weighted vocab — bounded by topN + |alphabet|. */
  def seedVocab(
      df: DataFrame, text: Column, maxLen: Int, topN: Int): Seq[(String, Long)] =
    seedVocabFromWords(wordVocab(df, text), maxLen, topN)

  private def seedVocabFromWords(
      words: DataFrame, maxLen: Int, topN: Int): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val cand = Barrier(candidates(words, maxLen))
    val top = cand.orderBy(col("cnt").desc, col("piece")).limit(topN)
    val chars = cand.where(length(col("piece")) === 1)
    top.union(chars).distinct().as[(String, Long)].collect()
      .sortBy { case (p, c) => (-c, p) }.toSeq
  }

  /** Result of [[learn]]: per-round summaries, the final scored vocab,
    * and the word-weighted round-trip violation count under it. */
  final case class LearnResult(
      rounds: Seq[Round],
      vocab: Seq[(String, Double)],
      roundtripViolations: Long)

  /** Train: seed → EM phase 1 → prune to target → EM phase 2. */
  def learn(df: DataFrame, text: Column, cfg: Config): LearnResult = {
    require(cfg.seedSize >= cfg.targetVocab, "seedSize must cover targetVocab")
    val spark = df.sparkSession
    import spark.implicits._

    val words = Barrier(wordVocab(df, text))
    val seeded = seedVocabFromWords(words, cfg.maxLen, cfg.seedSize)

    // M-step: add-alpha-smoothed scores over the FIXED vocab `pieces`
    def mStep(pieces: Seq[String], counts: Map[String, Long]): Seq[(String, Double)] = {
      val total = counts.values.sum.toDouble + cfg.alpha * pieces.size
      pieces.sorted.map { p =>
        (p, math.log((counts.getOrElse(p, 0L) + cfg.alpha) / total))
      }
    }

    // E-step: piece counts of the Viterbi segmentation, word-weighted
    def eStep(vocab: Seq[(String, Double)]): Map[String, Long] =
      words
        .select(
          explode(SubwordSegment.unigramTokens(col("w"), vocab, cfg.maxLen))
            .as("piece"),
          col("n"))
        .groupBy("piece").agg(sum("n").cast("bigint").as("c"))
        .as[(String, Long)].collect().toMap

    // J(theta, seg) summed in sorted-piece order (run-deterministic)
    def objective(vocab: Seq[(String, Double)], counts: Map[String, Long])
        : (Double, Double) = {
      var nll = 0.0
      var pen = 0.0
      vocab.foreach { case (p, s) =>
        nll += counts.getOrElse(p, 0L).toDouble * -s
        pen += cfg.alpha * -s
      }
      (nll, nll + pen)
    }

    val rounds = Seq.newBuilder[Round]
    def emPhase(phase: Int, nRounds: Int, vocab0: Seq[(String, Double)])
        : Seq[(String, Double)] = {
      var vocab = vocab0
      val pieces = vocab.map(_._1)
      var r = 1
      while (r <= nRounds) {
        val counts = eStep(vocab)          // seg_t = Viterbi(theta_{t-1})
        vocab = mStep(pieces, counts)      // theta_t from seg_t
        val (nll, obj) = objective(vocab, counts)
        rounds += Round(phase, r, pieces.size, nll, obj)
        r += 1
      }
      vocab
    }

    // theta_0 from the seed counts via the same smoothed M-step
    val vocab1 = emPhase(1, cfg.roundsPhase1,
      mStep(seeded.map(_._1), seeded.toMap))

    // prune: keep every single-char piece (coverage) + the most-used
    // multi-char pieces by (count DESC, piece ASC) — total order
    val lastCounts = eStep(vocab1)
    val (chars, multi) = vocab1.map(_._1).partition(_.length == 1)
    val kept = chars ++ multi
      .sortBy(p => (-lastCounts.getOrElse(p, 0L), p))
      .take(math.max(cfg.targetVocab - chars.size, 0))
    val keptSet = kept.toSet
    val vocab2 = emPhase(2, cfg.roundsPhase2,
      mStep(kept, lastCounts.filter { case (p, _) => keptSet.contains(p) }))

    val viol = words
      .select(
        when(
          concat_ws("", SubwordSegment.unigramTokens(col("w"), vocab2, cfg.maxLen))
            =!= col("w"),
          col("n")).otherwise(lit(0L)).as("v"))
      .agg(sum("v").cast("bigint")).as[Long].head()

    LearnResult(rounds.result(), vocab2, viol)
  }

  // ---- DuckDB oracles ----
  //
  // FULL-COVERAGE PRECONDITION (all min-seg DP oracles below): every
  // vocab these CTEs build unions in ALL single-char pieces of the
  // corpus (`len(piece) = 1`), so each DP position always has a
  // reachable predecessor and every word segments. The recursive DP
  // deliberately omits the kernel's unreachable-predecessor skip, and
  // the qt47 rollup INNER-joins seg to words — both correct ONLY
  // under that coverage. Reusing these builders with a user-supplied
  // vocab that misses a corpus character would make NULL np values
  // flow through list_sort and drop uncoverable words from
  // total_words while the Spark side counts them as 0 pieces —
  // silent divergence. If such reuse is ever needed, add a
  // reachability guard to the candidate filter (`m.l = pos + 1 OR
  // nps[pos + 1 - m.l] IS NOT NULL`) and LEFT-join the qt47 rollup.

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  private def wordsSql: String =
    s"""words AS (
       |  SELECT w, count(*)::BIGINT AS n
       |  FROM (SELECT unnest(string_split($normSql, ' ')) AS w
       |        FROM documents) t
       |  WHERE w <> ''
       |  GROUP BY w)""".stripMargin

  private def candSql(maxLen: Int): String =
    s"""cand AS (
       |  SELECT substring(w, i, l) AS piece, CAST(sum(n) AS BIGINT) AS cnt
       |  FROM words,
       |       unnest(range(1, len(w) + 1)) AS ti(i),
       |       unnest(range(1, ${maxLen + 1})) AS tl(l)
       |  WHERE i + l <= len(w) + 1
       |  GROUP BY 1)""".stripMargin

  /** qt40 oracle: the top-N substring seed. */
  def seedOracleSql(maxLen: Int, topN: Int): String =
    s"""WITH ${wordsSql},
       |${candSql(maxLen)}
       |SELECT piece, cnt FROM cand ORDER BY cnt DESC, piece LIMIT $topN""".stripMargin

  /** qt41 oracle: the identical integer DP as [[graft.functions.MinSegVocab]]
    * rendered as recursive CTEs — forward DP carries (min-pieces,
    * max-weight, chosen-length) lists position by position; candidate
    * choice is `list_sort` on (np, -cs, -l) structs, the same total
    * order as the kernel; the backward walk re-materializes the piece
    * stream. Runs over DISTINCT words, then joins back per document. */
  def minsegOracleSql(maxLen: Int, topN: Int): String =
    s"""${minsegCtes(maxLen, topN)}
       |SELECT t.doc_id,
       |       CAST(COALESCE(sum(s.np), 0) AS BIGINT) AS n_pieces,
       |       md5(COALESCE(string_agg(array_to_string(s.pieces, ' '), ' ' ORDER BY t.wi), '')) AS pieces_md5
       |FROM (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi, ws
       |      FROM (SELECT doc_id, string_split($normSql, ' ') AS ws
       |            FROM documents) q) t
       |LEFT JOIN seg s ON s.w = t.ws[t.wi]
       |GROUP BY t.doc_id""".stripMargin

  /** qt46 oracle: the vocabulary USAGE profile — per piece, total uses
    * and document frequency under the same min-seg segmentation. */
  def pieceProfileOracleSql(maxLen: Int, topN: Int): String =
    s"""${minsegCtes(maxLen, topN)},
       |pieces_flat AS (
       |  SELECT t.doc_id, unnest(s.pieces) AS piece
       |  FROM (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi, ws
       |        FROM (SELECT doc_id, string_split($normSql, ' ') AS ws
       |              FROM documents) q) t
       |  JOIN seg s ON s.w = t.ws[t.wi])
       |SELECT piece, count(*) AS n_uses,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
       |FROM pieces_flat GROUP BY piece""".stripMargin

  /** qt47 oracle: the vocab-size TUNING CURVE — min-seg fertility at
    * several top-N cuts in ONE chain: instead of duplicating the DP
    * CTEs per variant, `topn` rides every CTE as a key column (the cut
    * becomes a rank <= topn filter over the once-computed candidate
    * ranking; the recursion carries (topn, w) state). */
  def fertilityCurveOracleSql(maxLen: Int, topNs: Seq[Int]): String = {
    require(topNs.nonEmpty)
    val tns = topNs.map(n => s"($n)").mkString(", ")
    s"""WITH RECURSIVE ${wordsSql},
       |${candSql(maxLen)},
       |tns(topn) AS (VALUES $tns),
       |ranked AS (
       |  SELECT piece, cnt,
       |         rank() OVER (ORDER BY cnt DESC, piece) AS rnk
       |  FROM cand),
       |vocab AS (
       |  SELECT tns.topn, piece, cnt FROM ranked, tns
       |  WHERE rnk <= tns.topn OR len(piece) = 1),
       |wm AS (
       |  SELECT v.topn, t.w,
       |         list(struct_pack(e := t.i + t.l - 1, l := t.l, c := v.cnt)) AS ms
       |  FROM (SELECT w, i, l, substring(w, i, l) AS piece
       |        FROM (SELECT DISTINCT w FROM words) dw,
       |             unnest(range(1, len(w) + 1)) AS ti(i),
       |             unnest(range(1, ${maxLen + 1})) AS tl(l)
       |        WHERE i + l <= len(w) + 1) t
       |  JOIN vocab v ON v.piece = t.piece
       |  GROUP BY v.topn, t.w),
       |dp AS (
       |  SELECT topn, w, ms, 0 AS pos, CAST([] AS BIGINT[]) AS nps,
       |         CAST([] AS BIGINT[]) AS css, CAST([] AS BIGINT[]) AS bls
       |  FROM wm
       |  UNION ALL
       |  SELECT topn, w, ms, pos + 1,
       |         list_append(nps, best.np), list_append(css, -best.ncs),
       |         list_append(bls, -best.nl)
       |  FROM (
       |    SELECT topn, w, ms, pos, nps, css, bls,
       |           list_sort(list_transform(
       |             list_filter(ms, m -> m.e = pos + 1),
       |             m -> struct_pack(
       |               np := CASE WHEN m.l = pos + 1 THEN 1 ELSE nps[pos + 1 - m.l] + 1 END,
       |               ncs := -(CASE WHEN m.l = pos + 1 THEN 0 ELSE css[pos + 1 - m.l] END + m.c),
       |               nl := -m.l)))[1] AS best
       |    FROM dp WHERE pos < len(w)) z),
       |seg AS (
       |  -- fertility needs only the final-position piece COUNT, so the
       |  -- backward walk is skipped entirely: np = nps[last]
       |  SELECT topn, w, nps[len(nps)] AS np
       |  FROM dp WHERE pos = len(w))
       |SELECT CAST(seg.topn AS BIGINT) AS top_n,
       |       CAST(sum(seg.np * words.n) AS BIGINT) AS total_pieces,
       |       CAST(sum(words.n) AS BIGINT) AS total_words,
       |       CAST(sum(seg.np * words.n) AS DOUBLE) /
       |       CAST(sum(words.n) AS DOUBLE) AS pieces_per_word
       |FROM seg JOIN words ON words.w = seg.w
       |GROUP BY seg.topn""".stripMargin
  }

  private def minsegCtes(maxLen: Int, topN: Int): String =
    s"""WITH RECURSIVE ${wordsSql},
       |${candSql(maxLen)},
       |vocab AS (
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM cand ORDER BY cnt DESC, piece LIMIT $topN)
       |  UNION
       |  SELECT piece, cnt FROM cand WHERE len(piece) = 1),
       |wm AS (
       |  SELECT t.w, list(struct_pack(e := t.i + t.l - 1, l := t.l, c := v.cnt)) AS ms
       |  FROM (SELECT w, i, l, substring(w, i, l) AS piece
       |        FROM (SELECT DISTINCT w FROM words) dw,
       |             unnest(range(1, len(w) + 1)) AS ti(i),
       |             unnest(range(1, ${maxLen + 1})) AS tl(l)
       |        WHERE i + l <= len(w) + 1) t
       |  JOIN vocab v ON v.piece = t.piece
       |  GROUP BY t.w),
       |dp AS (
       |  SELECT w, ms, 0 AS pos, CAST([] AS BIGINT[]) AS nps,
       |         CAST([] AS BIGINT[]) AS css, CAST([] AS BIGINT[]) AS bls
       |  FROM wm
       |  UNION ALL
       |  SELECT w, ms, pos + 1,
       |         list_append(nps, best.np), list_append(css, -best.ncs),
       |         list_append(bls, -best.nl)
       |  FROM (
       |    SELECT w, ms, pos, nps, css, bls,
       |           list_sort(list_transform(
       |             list_filter(ms, m -> m.e = pos + 1),
       |             m -> struct_pack(
       |               np := CASE WHEN m.l = pos + 1 THEN 1 ELSE nps[pos + 1 - m.l] + 1 END,
       |               ncs := -(CASE WHEN m.l = pos + 1 THEN 0 ELSE css[pos + 1 - m.l] END + m.c),
       |               nl := -m.l)))[1] AS best
       |    FROM dp WHERE pos < len(w)) z),
       |dpf AS (SELECT w, bls FROM dp WHERE pos = len(w)),
       |walk AS (
       |  SELECT w, bls, len(w) AS i, CAST([] AS VARCHAR[]) AS pieces FROM dpf
       |  UNION ALL
       |  SELECT w, bls, i - bls[i], list_prepend(substring(w, i - bls[i] + 1, bls[i]), pieces)
       |  FROM walk WHERE i > 0),
       |seg AS (SELECT w, pieces, len(pieces) AS np FROM walk WHERE i = 0)""".stripMargin
}
