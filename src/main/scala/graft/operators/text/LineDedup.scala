package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Barrier, TextOps}

/** Corpus-wide line-level deduplication with document RECONSTRUCTION —
  * the CCNet/C4 cleaning step: a line (paragraph) occurring in at
  * least `minDocs` distinct documents is boilerplate (nav bars, cookie
  * banners, license headers) and is REMOVED from every document it
  * appears in, preserving the order of the surviving lines. Differs
  * from [[SpanDedup]] (which scores documents by overlapping-n-gram
  * ratio and drops whole documents): this rewrites each document's
  * text, the per-line complement of whole-doc dedup. The reference has
  * no analog (it copies rows byte-for-byte, `cmd/root.go:423-424`);
  * this is the LLM-corpus surface built on the same engine.
  *
  * Scale shape: line BYTES never shuffle. Documents explode to
  * (id, md5(line)) — one narrow row per line — deduplicated to one
  * vote per (doc, line) by a pair-keyed distinct (skew-safe: the hot
  * key is the PAIR, so a banner in millions of documents spreads
  * across reducers instead of funneling into one), then one hash
  * aggregation counts document occurrences. The shared keys join back
  * id-keyed as per-document doomed lists, and reconstruction is a
  * map-only array filter inside each document row. Nothing quadratic;
  * both shuffles move md5-width rows only.
  *
  * Portable by construction: md5 over normalized line text, so DuckDB
  * re-derives every count, every removal, and the reconstructed text
  * value-for-value.
  */
object LineDedup {

  /** Default segmenter: split on newlines, trimming blank lines. */
  def newlineSegmenter(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Fallback segmenter for single-line corpora (the driver fixture
    * has no newlines): disjoint `width`-token windows of the
    * normalized token stream, each window re-joined with single
    * spaces. A short document becomes one line. */
  def tokenWindowSegmenter(width: Int)(text: Column): Column = {
    val toks = TextOps.tokens(text)
    transform(
      sequence(lit(0),
        (greatest(size(toks) - 1, lit(0)) / lit(width)).cast("int")),
      i => concat_ws(" ", slice(toks, i * lit(width) + 1, lit(width))))
  }

  /** Per-document line-dedup profile + reconstruction:
    * (id, n_lines, n_removed, clean_md5) where `clean_md5` hashes the
    * surviving lines re-joined with '\n' (md5 of the empty string when
    * every line was boilerplate — the all-junk doc drops to zero
    * content but keeps its row, so downstream length filters see it).
    *
    * A line repeated WITHIN one document votes once toward the corpus
    * count (the pair-distinct above), and removal takes every copy —
    * within-doc repetition is [[graft.queries.TextQueries]] qt12's
    * domain, not a corpus-dedup signal. */
  def profile(
      df: DataFrame,
      text: Column,
      id: Column,
      minDocs: Int = 2,
      segmenter: Column => Column = newlineSegmenter): DataFrame = {
    val lined = Barrier(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), segmenter(text).as("lines")))
    val exploded = lined
      .select(col("id"), explode(col("lines")).as("l"))
      .select(col("id"), md5(col("l")).as("h"))
      .distinct()
    val shared = exploded.groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val doomed = exploded.join(shared, Seq("h"), "left_semi")
      .groupBy("id")
      .agg(collect_list(col("h")).as("doomed"))
    lined
      .join(doomed, Seq("id"), "left")
      .withColumn("doomed",
        coalesce(col("doomed"), typedLit(Seq.empty[String])))
      .withColumn("kept",
        filter(col("lines"), l => !array_contains(col("doomed"), md5(l))))
      .select(
        col("id"),
        size(col("lines")).cast("long").as("n_lines"),
        (size(col("lines")) - size(col("kept"))).cast("long")
          .as("n_removed"),
        md5(concat_ws("\n", col("kept"))).as("clean_md5"))
  }

  /** The DuckDB formulation of [[profile]] under the
    * [[tokenWindowSegmenter]] (the fixture is single-line): same
    * normalization, same disjoint windows, same one-vote-per-doc
    * counting, same '\n' re-join, value-for-value. */
  def oracleSql(width: Int = 10, minDocs: Int = 2): String =
    s"""WITH nrm AS (SELECT doc_id,
       |         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |       FROM documents),
       |seg AS (SELECT doc_id,
       |         list_transform(
       |           range(0, (greatest(len(toks) - 1, 0)) // $width + 1),
       |           i -> list_aggregate(toks[i*$width+1:i*$width+$width], 'string_agg', ' ')) AS lines
       |       FROM nrm),
       |e AS (SELECT DISTINCT doc_id, md5(unnest(lines)) AS h FROM seg),
       |sh AS (SELECT h FROM e GROUP BY h HAVING count(*) >= $minDocs),
       |d AS (SELECT e.doc_id, list(e.h) AS doomed
       |      FROM e JOIN sh USING (h) GROUP BY e.doc_id),
       |fin AS (SELECT seg.doc_id, lines,
       |          list_filter(lines, l ->
       |            NOT list_contains(coalesce(d.doomed, []), md5(l))) AS kept
       |        FROM seg LEFT JOIN d ON seg.doc_id = d.doc_id)
       |SELECT doc_id AS id,
       |       len(lines)::BIGINT AS n_lines,
       |       (len(lines) - len(kept))::BIGINT AS n_removed,
       |       md5(coalesce(list_aggregate(kept, 'string_agg', chr(10)), ''))
       |         AS clean_md5
       |FROM fin""".stripMargin
}
