package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script profiling — the multilingual-curation signal UNDER
  * [[TextAnalysis]]'s stopword language id: per-document counts of
  * Latin / Cyrillic / Han / Greek script characters, digits and
  * whitespace, the dominant script (fixed han > cyrillic > greek >
  * latin tie priority — deterministic on any engine), and the ASCII
  * ratio. Script mix catches what token-level language id cannot:
  * mixed-script spam, mojibake, transliteration artifacts, and the
  * CJK/Cyrillic documents a Latin-stopword model mislabels.
  *
  * Scale shape: pure per-row regex counting inside whole-stage codegen
  * — zero shuffles, scan-speed, the [[RuleClean]] class of operator.
  *
  * Counting convention: all targeted scripts are BMP, so Spark's
  * UTF-16 `length` and DuckDB's codepoint `length` agree; the regex
  * classes use each engine's script-property spelling
  * (`\\p{IsHan}` Java, `\\p{Han}` RE2) for the SAME character sets.
  */
object ScriptProfile {

  private def countClass(txt: Column, javaClass: String): Column =
    length(regexp_replace(txt, s"[^$javaClass]", "")).cast("long")

  /** (id, n_latin, n_cyrillic, n_han, n_greek, n_digit, n_space,
    * dominant, ascii_ratio): counts per script class, the dominant
    * script and the 4-dp ASCII ratio (1.0 for empty text — nothing
    * non-ASCII present). */
  def profile(df: DataFrame, text: Column, id: Column): DataFrame = {
    val nLat = countClass(text, "\\p{IsLatin}")
    val nCyr = countClass(text, "\\p{IsCyrillic}")
    val nHan = countClass(text, "\\p{IsHan}")
    val nGrk = countClass(text, "\\p{IsGreek}")
    val nDig = countClass(text, "0-9")
    val nSpc = countClass(text, "\\s")
    val nAscii = countClass(text, "\\x00-\\x7f")
    val len = length(text).cast("long")
    df.select(
        id.as("id"), text.as("t"),
        nLat.as("n_latin"), nCyr.as("n_cyrillic"), nHan.as("n_han"),
        nGrk.as("n_greek"), nDig.as("n_digit"), nSpc.as("n_space"),
        nAscii.as("na"), len.as("len"))
      .select(
        col("id"), col("n_latin"), col("n_cyrillic"), col("n_han"),
        col("n_greek"), col("n_digit"), col("n_space"),
        when(col("n_han") >= col("n_cyrillic") &&
             col("n_han") >= col("n_greek") &&
             col("n_han") >= col("n_latin"), lit("han"))
          .when(col("n_cyrillic") >= col("n_greek") &&
                col("n_cyrillic") >= col("n_latin"), lit("cyrillic"))
          .when(col("n_greek") >= col("n_latin"), lit("greek"))
          .otherwise(lit("latin")).as("dominant"),
        when(col("len") === 0, lit(1.0d))
          .otherwise(graft.operators.PortableRound.floorTo(
            col("na").cast("double") / col("len").cast("double"), 4))
          .as("ascii_ratio"))
  }

  /** DuckDB formulation over a planted `t(doc_id, tx)` relation (the
    * qt31 registration plants Cyrillic/Han/Greek snippets in-query —
    * the fixture corpus is pure ASCII): RE2 script classes, the same
    * priority chain, the same ratio arithmetic. */
  def oracleSql(plantedFrom: String): String = {
    def cnt(re2Class: String): String =
      s"length(regexp_replace(tx, '[^$re2Class]', '', 'g'))::BIGINT"
    s"""WITH c AS (
       |  SELECT doc_id,
       |         ${cnt("\\p{Latin}")} AS n_latin,
       |         ${cnt("\\p{Cyrillic}")} AS n_cyrillic,
       |         ${cnt("\\p{Han}")} AS n_han,
       |         ${cnt("\\p{Greek}")} AS n_greek,
       |         ${cnt("0-9")} AS n_digit,
       |         ${cnt("\\s")} AS n_space,
       |         ${cnt("\\x00-\\x7f")} AS na,
       |         length(tx)::BIGINT AS len
       |  FROM $plantedFrom)
       |SELECT doc_id AS id, n_latin, n_cyrillic, n_han, n_greek,
       |       n_digit, n_space,
       |       CASE WHEN n_han >= n_cyrillic AND n_han >= n_greek
       |                 AND n_han >= n_latin THEN 'han'
       |            WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_latin
       |                 THEN 'cyrillic'
       |            WHEN n_greek >= n_latin THEN 'greek'
       |            ELSE 'latin' END AS dominant,
       |       CASE WHEN len = 0 THEN 1.0
       |            ELSE ${graft.operators.PortableRound.floorToSql("na::DOUBLE / len::DOUBLE", 4)} END AS ascii_ratio
       |FROM c""".stripMargin
  }
}
