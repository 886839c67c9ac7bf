package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Unigram-LM perplexity (cross-entropy) filtering — the CCNet
  * quality gate: score every document by the mean negative
  * log-probability of its tokens under a language model trained on
  * the corpus itself (here the unigram MLE over a top-V vocabulary;
  * out-of-vocabulary tokens get the 1/total floor), and keep documents
  * whose cross-entropy stays under `tau`. Low CE = fluent, typical
  * text; high CE = noise, mojibake, word salad. Sits between
  * [[RuleClean]] (zero-training rules) and [[QualityClassifier]]
  * (supervised scorer) in the curation ladder.
  *
  * Scale shape: the model is V+1 numbers — top-V term log-probs
  * (TakeOrdered, never a global sort) plus the OOV floor — BROADCAST
  * to the token stream; the only shuffles are the term-count
  * aggregation (partial map-side, vocabulary-sized) and the per-doc
  * rollup of narrow (id, pos, logp) rows.
  *
  * Portable: log-probs floor-scale to 6 dp (one libm call per VOCAB
  * TERM, not per token; [[graft.operators.PortableRound]] — floor on
  * the shared double has no cross-engine tie semantics), per-doc
  * summation is an ORDERED fold over token position, and the final CE
  * floor-scales to 4 dp, so both engines rank and gate identically.
  */
object PerplexityFilter {

  /** (id, n_tokens, ce, keep): per-document token count, 4-dp
    * cross-entropy and the `ce <= tau` verdict. */
  def profile(
      df: DataFrame,
      text: Column,
      id: Column,
      vocabSize: Int = 20,
      tau: Double = 3.6): DataFrame = {
    require(vocabSize >= 1, s"bad vocabSize $vocabSize")
    val toks = graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"),
        posexplode(TextOps.tokens(text)).as(Seq("pos", "term")))
    val cnt = toks.groupBy("term").agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum("n").cast("double").as("total"))
    val voc = cnt.orderBy(col("n").desc, col("term")).limit(vocabSize)
      .crossJoin(broadcast(tot))
      .select(col("term"),
        graft.operators.PortableRound.floorTo(log(col("n").cast("double") / col("total")), 6).as("lp"))
    val oov = tot.select(graft.operators.PortableRound.floorTo(log(lit(1.0) / col("total")), 6).as("olp"))
    // the model is V+1 numbers — fold it into ONE broadcast row (a
    // term→lp map plus the OOV floor) and score each document by an
    // in-order array fold over its own token array: same values as the
    // former explode → broadcast-join → collect_list/sort/fold rollup
    // (the array IS the position order, element_at(map) IS the join),
    // but the scoring pass is now map-only — the per-doc shuffle of
    // the whole (id, pos, lp) token stream is gone (guide §2.4), and
    // so is the collect_list re-materialization of every document.
    val model = voc
      .agg(map_from_entries(collect_list(struct(col("term"), col("lp"))))
        .as("lpm"))
      .crossJoin(oov)
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), TextOps.tokens(text).as("__t"))
      .where(col("__t").isNotNull) // null text exploded to no rows before
      .crossJoin(broadcast(model))
      .select(
        col("id"),
        size(col("__t")).cast("long").as("n_tokens"),
        aggregate(
          transform(col("__t"),
            t => coalesce(element_at(col("lpm"), t), col("olp"))),
          lit(0.0),
          (acc, x) => acc + x).as("sumlp"))
      .select(
        col("id"), col("n_tokens"),
        graft.operators.PortableRound.floorTo(-col("sumlp") / col("n_tokens").cast("double"), 4).as("ce"))
      .withColumn("keep", col("ce") <= tau)
  }

  /** DuckDB formulation: same tokenization, same top-V vocabulary cut
    * (count DESC, term ASC), same rounded log-probs, same
    * position-ordered fold and 4-dp CE. */
  def oracleSql(vocabSize: Int = 20, tau: Double = 3.6): String =
    s"""WITH n AS (SELECT doc_id,
       |             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |           FROM documents),
       |tk AS (SELECT doc_id, CAST(i AS INT) AS pos, list_extract(toks, i) AS term
       |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
       |             FROM n) z),
       |cnt AS (SELECT term, count(*) AS n FROM tk GROUP BY term),
       |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM cnt),
       |voc AS (SELECT term, (floor((ln(CAST(n AS DOUBLE) / total)) * 1000000.0) / 1000000.0) AS lp
       |        FROM (SELECT term, n FROM cnt ORDER BY n DESC, term
       |              LIMIT $vocabSize) z, tot),
       |ov AS (SELECT (floor((ln(1.0 / total)) * 1000000.0) / 1000000.0) AS olp FROM tot),
       |j AS (SELECT tk.doc_id, tk.pos, coalesce(voc.lp, ov.olp) AS lp
       |      FROM tk LEFT JOIN voc USING (term), ov),
       |s AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |             (floor((-(list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
       |                                 (a, x) -> a + x))
       |                   / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS ce
       |      FROM j GROUP BY doc_id)
       |SELECT doc_id AS id, n_tokens, ce, ce <= $tau AS keep FROM s""".stripMargin
}
