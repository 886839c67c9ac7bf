package graft.operators.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Text-analysis primitives for a training-data pipeline: token
  * counting, quality metrics, stopword-based language ID, content
  * fingerprints. All row-local codegen'd expressions — no UDFs, no
  * shuffles; every metric distributes embarrassingly.
  *
  * Metric arithmetic stays in per-row IEEE doubles with a fixed
  * operation order, which is bit-identical across engines — the DuckDB
  * oracles mirror these expressions exactly.
  */
object TextAnalysis {

  /** whitespace token count (trim first; empty text counts 1 — the
    * regexp-split convention shared by Spark and DuckDB). */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** "BPE-ish" token count: letter runs, digit runs, and single
    * non-alphanumeric marks — the pre-tokenizer shape most BPE vocab
    * builders use. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def charCount(text: Column): Column = length(text)
  def byteCount(text: Column): Column = octet_length(text)

  /** characters remaining after stripping an explicit punctuation
    * class (explicit so the regex is engine-portable). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))

  /** Per-language stopword hit count over normalized whitespace tokens. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(TextOps.tokens(text), t => array_contains(typedLit(stopwords), t)))

  val stopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
  val stopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu")
  val stopFr: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans")
  val stopEs: Seq[String] = Seq("el", "la", "los", "las", "y", "es", "un", "una", "no", "para")

  /** Stopword-vote language guess with a fixed priority tie-break
    * (en > de > fr > es) — mirrored verbatim in the oracle SQL. */
  def langGuess(text: Column): Column = {
    val en = stopwordHits(text, stopEn)
    val de = stopwordHits(text, stopDe)
    val fr = stopwordHits(text, stopFr)
    val es = stopwordHits(text, stopEs)
    when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Heuristic quality score in [0,1]: long-enough docs with low
    * punctuation/digit noise and some stopword mass score high.
    * Fixed operation order — see class doc. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val chars = greatest(charCount(text), lit(1)).cast("double")
    val lengthTerm = least(toks / lit(100.0), lit(1.0))
    val punctTerm = lit(1.0) - least(
      punctCount(text).cast("double") / chars * lit(10.0), lit(1.0))
    val digitTerm = lit(1.0) - least(
      digitCount(text).cast("double") / chars * lit(10.0), lit(1.0))
    val stopTerm = least(
      stopwordHits(text, stopEn).cast("double") / greatest(toks, lit(1.0)) * lit(5.0),
      lit(1.0))
    lengthTerm * lit(0.4) + punctTerm * lit(0.2) + digitTerm * lit(0.2) +
      stopTerm * lit(0.2)
  }

  /** Content fingerprints (hex, lowercase — identical in DuckDB). */
  def md5Fingerprint(text: Column): Column = md5(TextOps.normalized(text))
  def sha256Fingerprint(text: Column): Column = sha2(TextOps.normalized(text), 256)
}
