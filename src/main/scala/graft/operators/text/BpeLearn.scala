package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Barrier, TextOps}

/** Distributed BPE vocabulary LEARNING — the training side of
  * [[graft.functions.Bpe]]'s apply-time tokenizer: start every word as
  * its character sequence, then repeat `nMerges` times: count adjacent
  * symbol pairs across the corpus (weighted by word frequency), adopt
  * the most frequent pair as the next merge (count DESC, then (a, b)
  * lexicographic — total order, engine-independent), and rewrite the
  * vocabulary with that pair fused left-to-right. The learned merge
  * table is exactly what [[graft.functions.Bpe]] consumes.
  *
  * Scale shape: the state is the VOCABULARY (word, freq) — corpus text
  * collapses to it in one aggregation and never re-enters; each round
  * costs one vocab-sized pair aggregation (map-side partial, ≤
  * |pairs| rows shuffle) plus ONE collected row (the argmax — the
  * bounded-collect class of the k-means update), and the rewrite is a
  * per-row fold over the word's own symbols. Rounds are sequential by
  * nature (merge i+1 depends on i) — the standard distributed BPE
  * trainer shape. State crosses a [[Barrier]] per round so lineage
  * does not replay all prior rounds.
  *
  * The left-to-right fused rewrite (non-overlapping, leftmost first)
  * and the pair count are plain string/list folds both engines
  * evaluate identically, so the WHOLE training run is value-oracled:
  * the oracle is `nMerges` mechanically-chained CTE stages re-deriving
  * every round's counts, argmax and rewrite.
  */
object BpeLearn {

  /** The last space-separated symbol of the accumulator. */
  private def lastSym(acc: Column): Column =
    regexp_extract(acc, "[^ ]+$", 0)

  /** Left-to-right fuse of pair (a, b) in a spaced symbol string:
    * fold symbols into a string accumulator; when the accumulator's
    * last symbol is `a` and the next is `b`, replace the tail with the
    * fused symbol (non-overlapping by construction — the fused symbol
    * no longer equals `a` unless a == ab, impossible for nonempty b). */
  private def fuse(w: Column, a: String, b: String): Column = {
    val syms = split(w, " ")
    val rest = slice(syms, lit(2), greatest(size(syms) - 1, lit(0)))
    aggregate(rest, element_at(syms, 1), (acc, x) =>
      when(lastSym(acc) === a && x === b,
        concat(
          acc.substr(lit(1), length(acc) - length(lastSym(acc))),
          lit(a + b)))
        .otherwise(concat(acc, lit(" "), x)))
  }

  /** Adjacent (a, b) symbol pairs of a spaced string, as an array of
    * structs (empty below 2 symbols; try_element_at keeps the lookup
    * ANSI-safe at the array tail). */
  private def adjacentPairs(w: Column): Column = {
    val syms = split(w, " ")
    filter(
      transform(syms, (x, i) =>
        struct(x.as("a"), try_element_at(syms, i + lit(2)).as("b"))),
      p => p.getField("b").isNotNull)
  }

  /** Learn `nMerges` merges from the corpus; returns one row per
    * round: (rank, sym_a, sym_b, pair_n). */
  def learn(df: DataFrame, text: Column, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"bad nMerges $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var state = Barrier(
      df.select(explode(TextOps.tokens(text)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .select(
          concat_ws(" ", expr("regexp_extract_all(word, '.', 0)")).as("w"),
          col("n")))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    while (i <= nMerges) {
      val best = state
        .select(col("n"), explode(adjacentPairs(col("w"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("pn"))
        .orderBy(col("pn").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (best.nonEmpty) {
        val (a, b, pn) = best.head
        merges += ((i, a, b, pn))
        state = Barrier(state.select(fuse(col("w"), a, b).as("w"), col("n")))
      } else i = nMerges // no pair anywhere (degenerate corpus): stop
      i += 1
    }
    merges.result().toDF("rank", "sym_a", "sym_b", "pair_n")
  }

  // ---- oracle SQL: nMerges mechanically-chained stages ----

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  // NOTE: this fragment is embedded into further stripMargin templates,
  // so no line may START with '|' (string concatenation stays mid-line)
  private def fuseSql(prev: String, m: String): String =
    s"""SELECT CASE WHEN s.w = '' THEN '' ELSE list_reduce(
       |    string_split(s.w, ' '), (acc, x) ->
       |    CASE WHEN regexp_extract(acc, '[^ ]+$$') = $m.a AND x = $m.b
       |         THEN left(acc, length(acc) - length(regexp_extract(acc, '[^ ]+$$'))) ||
       |              ($m.a || $m.b)
       |         ELSE acc || ' ' || x END) END AS w,
       |       s.n
       |FROM $prev s, $m""".stripMargin

  private def pairsSql(prev: String): String =
    s"""SELECT a, b, CAST(sum(n) AS BIGINT) AS pn FROM (
       |  SELECT list_extract(syms, i) AS a, list_extract(syms, i + 1) AS b, n
       |  FROM (SELECT syms, n, unnest(range(1, len(syms))) AS i
       |        FROM (SELECT string_split(w, ' ') AS syms, n FROM $prev) z) zz)
       |GROUP BY a, b""".stripMargin

  /** qt28: stage CTEs v0 (char vocab), then per round i: p_i (pair
    * counts over v_{i-1}), m_i (argmax), v_i (vocab rewritten by m_i);
    * output = the union of the m_i rows. */
  def oracleSql(nMerges: Int): String = {
    val v0 =
      s"""v0 AS (
         |  SELECT array_to_string(regexp_extract_all(word, '.'), ' ') AS w,
         |         count(*)::BIGINT AS n
         |  FROM (SELECT unnest(string_split($normSql, ' ')) AS word
         |        FROM documents) t
         |  GROUP BY 1)""".stripMargin
    val stages = (1 to nMerges).map { i =>
      s"""p_$i AS (${pairsSql(s"v${i - 1}")}),
         |m_$i AS (SELECT a, b, pn FROM p_$i ORDER BY pn DESC, a, b LIMIT 1),
         |v$i AS (${fuseSql(s"v${i - 1}", s"m_$i")})""".stripMargin
    }
    val finals = (1 to nMerges)
      .map(i => s"SELECT $i AS rank, a AS sym_a, b AS sym_b, pn AS pair_n FROM m_$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $v0,
       |${stages.mkString(",\n")}
       |$finals""".stripMargin
  }
}
