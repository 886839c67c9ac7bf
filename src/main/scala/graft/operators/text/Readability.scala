package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Flesch–Kincaid readability grade with a deterministic
  * vowel-group syllable heuristic — the classic complexity signal a
  * quality-filtering funnel ranks prose by (Kincaid et al. 1975;
  * C4/Gopher-style pipelines gate on adjacent surface statistics):
  * grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59.
  * Syllables count as runs of [aeiouy] in the lowercased text — the
  * standard cheap proxy (exact for most English monosyllables,
  * biased but MONOTONE elsewhere, which is all a ranking gate needs);
  * sentences as runs of [.!?], floored at one.
  *
  * Scale shape: three regexp counters per row, zero shuffles,
  * whole-stage codegen end to end — the same embarrassingly-parallel
  * class as qt16's PII counters.
  *
  * Portability: counts are INTs from identical RE2/Java-regex-safe
  * character-class patterns; the grade is one per-row float
  * expression with identical operation order in both engines,
  * floor-projected at 3 dp; empty docs (0 words) emit NULL.
  */
object Readability {

  val syllableRe = "[aeiouy]+"
  val sentenceRe = "[.!?]+"

  /** Per-doc surface counts + FK grade: (id, words, sentences,
    * syllables, fk_milli). */
  def grade(df: DataFrame, text: Column, id: Column): DataFrame = {
    val lowered = lower(text)
    val words = size(filter(TextOps.tokens(text), t => t =!= ""))
      .cast("long")
    val sentences = greatest(
      regexp_count(lowered, lit(sentenceRe)).cast("long"), lit(1L))
    val syllables = regexp_count(lowered, lit(syllableRe)).cast("long")
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .withColumn("fk_milli",
        when(col("words") === 0L, lit(null).cast("double")).otherwise(
          PortableRound.floorTo(
            lit(0.39) * (col("words").cast("double") /
              col("sentences").cast("double")) +
              lit(11.8) * (col("syllables").cast("double") /
                col("words").cast("double")) -
              lit(15.59), 3)))
  }

  /** qt57 oracle — literal SQL twin of [[grade]] over `documents`. */
  def oracleSql(): String = {
    val fk = "0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)) + " +
      "11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)) - 15.59"
    s"""WITH c AS (
       |  SELECT doc_id AS id,
       |         length(list_filter(string_split(
       |           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
       |           t -> t <> ''))::BIGINT AS words,
       |         greatest(length(regexp_extract_all(lower(text),
       |           '$sentenceRe'))::BIGINT, 1) AS sentences,
       |         length(regexp_extract_all(lower(text),
       |           '$syllableRe'))::BIGINT AS syllables
       |  FROM documents)
       |SELECT id, words, sentences, syllables,
       |       CASE WHEN words = 0 THEN NULL
       |            ELSE ${PortableRound.floorToSql(fk, 3)} END AS fk_milli
       |FROM c""".stripMargin
  }
}
