package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-local text primitives shared by dedup / text-analysis operators.
  * Everything here is built from codegen'd `functions._` (no UDFs), so
  * the expressions stay inside whole-stage codegen and distribute
  * trivially — each row is independent; no shuffle is introduced.
  */
object TextOps {

  /** lower-case, trim, collapse internal whitespace — the canonical
    * form used for near-dup work. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** whitespace tokens of the normalized text; empty string => [""]
    * (kept — matches SQL regexp_split semantics for oracle parity). */
  def tokens(c: Column): Column = split(normalized(c), " ")

  /** distinct character k-shingles of the normalized text. */
  def charShingles(c: Column, k: Int): Column = {
    val n = normalized(c)
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(n) - lit(k - 1), lit(1))),
        i => n.substr(i, lit(k))))
  }

  /** distinct token n-grams (word shingles). */
  def tokenShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }
}
