package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** The per-source DATASET CARD — the release artifact a curated corpus
  * ships with: volume (docs/tokens/chars), exact duplication rate,
  * mean quality, language spread and dominant-language share. One row
  * per source, recomputed in a single corpus pass (two aggregations +
  * a source-sized top-1 join), so refreshing the card after a `curate`
  * or `index append` costs one scan — cheap enough to run per release.
  *
  * Float discipline (the Registry contract): the per-row quality
  * double rides through a DECIMAL(18,9) cast so its SUM is order-exact
  * and engine-independent; every published rate is a single division
  * of exact integers/decimals. (No reference analog — the reference
  * replicates tables; this is LLM-pipeline surface.)
  */
object DatasetCard {

  /** One row per source:
    * (source, n_docs, total_tokens, total_chars, exact_dup_docs,
    *  dup_rate, avg_quality, n_langs, top_lang, top_lang_share). */
  def card(
      docs: DataFrame,
      text: Column,
      source: Column,
      lang: Column): DataFrame = {
    val base = docs.select(source.as("source"), lang.as("lang"),
      md5(TextOps.normalized(text)).as("fp"),
      TextAnalysis.tokenCount(text).cast("long").as("toks"),
      length(text).cast("long").as("chars"),
      TextAnalysis.qualityScore(text).cast("decimal(18,9)").as("q"))
    val perSource = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("toks").cast("bigint").as("total_tokens"),
      sum("chars").cast("bigint").as("total_chars"),
      (count(lit(1)) - countDistinct("fp")).cast("bigint").as("exact_dup_docs"),
      countDistinct("lang").cast("bigint").as("n_langs"),
      sum("q").as("qsum"))
    val topLang = docs.select(source.as("source"), lang.as("lang"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("ln"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("ln").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("ln").as("top_n"))
    perSource.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("total_chars"), col("exact_dup_docs"),
        (col("exact_dup_docs").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"),
        (col("qsum").cast("double") / col("n_docs").cast("double"))
          .as("avg_quality"),
        col("n_langs"), col("top_lang"),
        (col("top_n").cast("double") / col("n_docs").cast("double"))
          .as("top_lang_share"))
  }
}
