package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic cleaning — the rule-based line filter + document
  * gate every web-scale pre-training corpus starts with (Raffel et
  * al.'s C4 rules, made parametric): a LINE survives when it ends in
  * terminal punctuation, has at least `minWords` words and mentions no
  * line-blacklist phrase (cookie banners, "enable javascript"); a
  * DOCUMENT survives when no doc-blacklist phrase appears anywhere
  * (curly braces = leaked code/templates, "lorem ipsum" = placeholder
  * pages) and at least `minKeptLines` lines survive. Sits before
  * [[LineDedup]] (corpus-frequency boilerplate) and [[QualityClassifier]]
  * (model-scored quality) in the standard curation chain: rules are
  * the zero-training first pass.
  *
  * Scale shape: the ENTIRE operator is per-row expression work — split,
  * filter, hash — inside whole-stage codegen. Zero shuffles, zero
  * joins, zero state; it scales with scan bandwidth and nothing else.
  * That is the point of rule cleaning at 100 TB: it must run at read
  * speed so the expensive passes downstream see less data.
  *
  * Every rule is a deterministic string predicate, so counts, the
  * keep/drop verdict and the md5 of the reconstructed text are fully
  * value-oracled (qt29).
  *
  * (No reference analog — `cmd/root.go:423-424` copies rows
  * byte-for-byte; this is the LLM-corpus surface added on top.)
  */
object RuleClean {

  /** C4's terminal-punctuation rule: the line must end in . ! ? or a
    * closing quote. */
  private[text] val punctRe = "[.!?\"']$"

  /** qt29/qp08 shared in-query web-junk planting (the fixture corpus
    * is single-line punctuation-free word salad): per doc_id residue,
    * a rule-passing sentence (%3), a javascript banner (%4), a
    * too-short punct line (%5), and the two doc-killers (%11 lorem,
    * %13 curly) — newline-separated so the default segmenter sees
    * them as lines. One source of truth for both engines. */
  val plantedLines: Seq[(Int, String)] = Seq(
    3 -> "this cleaned sentence survives every rule today.",
    4 -> "please enable javascript and cookies to continue.",
    5 -> "home about contact.",
    11 -> "lorem ipsum dolor sit amet consectetur elit.",
    13 -> "function() { return 0; }")

  /** The planted text as a Spark column. */
  def plantText(id: Column, text: Column): Column =
    concat(text +: plantedLines.map { case (m, l) =>
      when(id % m === 0, lit("\n" + l)).otherwise(lit(""))
    }: _*)

  /** The planted text as a DuckDB expression over (doc_id, text).
    * NOTE: callers must keep '||' off line starts under stripMargin. */
  def plantSqlExpr: String =
    "text" + plantedLines.map { case (m, l) =>
      s" || CASE WHEN doc_id % $m = 0 THEN chr(10) || '${l.replace("'", "''")}' ELSE '' END"
    }.mkString

  private def lineOk(
      l: Column, minWords: Int, lineBlacklist: Seq[String]): Column = {
    val low = lower(l)
    val punctOk = low.rlike(punctRe)
    val wordsOk = size(split(trim(l), "\\s+")) >= minWords
    val blackOk = lineBlacklist
      .map(b => !low.contains(lit(b)))
      .reduce(_ && _)
    punctOk && wordsOk && blackOk
  }

  private def docBad(text: Column, docBlacklist: Seq[String]): Column =
    docBlacklist.map(b => lower(text).contains(lit(b))).reduce(_ || _)

  /** The keep/drop verdict as ONE per-row predicate — no join, no
    * state, so it composes directly with Structured Streaming sources
    * (a streaming curation chain filters on this before the stateful
    * dedup stages). */
  def keepPredicate(
      text: Column,
      minWords: Int = 5,
      lineBlacklist: Seq[String] = Seq("javascript", "cookie", "sign in"),
      docBlacklist: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 1,
      segmenter: Column => Column = LineDedup.newlineSegmenter): Column = {
    require(minWords >= 1 && minKeptLines >= 0, "bad rule thresholds")
    val kept = filter(segmenter(text), lineOk(_, minWords, lineBlacklist))
    !docBad(text, docBlacklist) && size(kept) >= minKeptLines
  }

  /** Per-document rule-cleaning profile + reconstruction:
    * (id, n_lines, n_kept, doc_keep, clean_md5) where `clean_md5`
    * hashes the surviving lines re-joined with '\n' (empty-string md5
    * when nothing survives — the row stays, as in [[LineDedup]]).
    * Blacklist matching is case-insensitive on the normalized line;
    * the word count splits on runs of whitespace. */
  def profile(
      df: DataFrame,
      text: Column,
      id: Column,
      minWords: Int = 5,
      lineBlacklist: Seq[String] = Seq("javascript", "cookie", "sign in"),
      docBlacklist: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 1,
      segmenter: Column => Column = LineDedup.newlineSegmenter): DataFrame = {
    require(minWords >= 1 && minKeptLines >= 0, "bad rule thresholds")
    val lines = segmenter(text)
    df.select(
        id.as("id"),
        lines.as("lines"),
        filter(lines, lineOk(_, minWords, lineBlacklist)).as("kept"),
        docBad(text, docBlacklist).as("doc_bad"))
      .select(
        col("id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        (!col("doc_bad") && size(col("kept")) >= minKeptLines)
          .as("doc_keep"),
        md5(concat_ws("\n", col("kept"))).as("clean_md5"))
  }

  /** The keep-side filter: a plain map-only `filter` on
    * [[keepPredicate]] — original schema preserved, batch or
    * streaming. */
  def clean(
      df: DataFrame,
      text: Column,
      minWords: Int = 5,
      lineBlacklist: Seq[String] = Seq("javascript", "cookie", "sign in"),
      docBlacklist: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 1,
      segmenter: Column => Column = LineDedup.newlineSegmenter): DataFrame =
    df.filter(keepPredicate(text, minWords, lineBlacklist, docBlacklist,
      minKeptLines, segmenter))

  /** Spliceable keep-verdict CTEs over a `from` relation exposing
    * (doc_id, text), ending in `rc_keep(doc_id)` — the composable twin
    * of [[keepPredicate]] for funnel oracles (qp08). */
  def keepCtes(
      from: String,
      minWords: Int = 5,
      lineBlacklist: Seq[String] = Seq("javascript", "cookie", "sign in"),
      docBlacklist: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 1): String = {
    val lineBad = lineBlacklist
      .map(b => s"contains(lower(l), '${b.replace("'", "''")}')")
      .mkString(" OR ")
    val docBadSql = docBlacklist
      .map(b => s"contains(lower(text), '${b.replace("'", "''")}')")
      .mkString(" OR ")
    s"""rc_seg AS (
       |  SELECT doc_id, text,
       |         list_filter(list_transform(string_split(text, chr(10)),
       |                                    l -> trim(l)),
       |                     l -> l <> '') AS lines
       |  FROM $from),
       |rc_k AS (
       |  SELECT doc_id, text,
       |         list_filter(lines, l ->
       |           regexp_matches(lower(l), '${punctRe.replace("'", "''")}')
       |           AND len(regexp_split_to_array(trim(l), '\\s+')) >= $minWords
       |           AND NOT ($lineBad)) AS kept
       |  FROM rc_seg),
       |rc_keep AS (
       |  SELECT doc_id FROM rc_k
       |  WHERE NOT ($docBadSql) AND len(kept) >= $minKeptLines)""".stripMargin
  }

  /** DuckDB formulation of [[profile]] over a planted `t(doc_id, tx)`
    * relation (the qt29 registration plants web-junk lines in-query —
    * the corpus itself is single-line word salad with no punctuation).
    * Same newline segmentation, same three line rules, same doc gate,
    * value-for-value. */
  def oracleSql(
      plantedFrom: String,
      minWords: Int = 5,
      lineBlacklist: Seq[String] = Seq("javascript", "cookie", "sign in"),
      docBlacklist: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 1): String = {
    val lineBad = lineBlacklist
      .map(b => s"contains(lower(l), '${b.replace("'", "''")}')")
      .mkString(" OR ")
    val docBad = docBlacklist
      .map(b => s"contains(lower(tx), '${b.replace("'", "''")}')")
      .mkString(" OR ")
    s"""WITH seg AS (
       |  SELECT doc_id, tx,
       |         list_filter(list_transform(string_split(tx, chr(10)),
       |                                    l -> trim(l)),
       |                     l -> l <> '') AS lines
       |  FROM $plantedFrom),
       |k AS (
       |  SELECT doc_id, tx, lines,
       |         list_filter(lines, l ->
       |           regexp_matches(lower(l), '${punctRe.replace("'", "''")}')
       |           AND len(regexp_split_to_array(trim(l), '\\s+')) >= $minWords
       |           AND NOT ($lineBad)) AS kept
       |  FROM seg)
       |SELECT doc_id AS id,
       |       len(lines)::BIGINT AS n_lines,
       |       len(kept)::BIGINT AS n_kept,
       |       (NOT ($docBad) AND len(kept) >= $minKeptLines) AS doc_keep,
       |       md5(coalesce(list_aggregate(kept, 'string_agg', chr(10)), ''))
       |         AS clean_md5
       |FROM k""".stripMargin
  }
}
