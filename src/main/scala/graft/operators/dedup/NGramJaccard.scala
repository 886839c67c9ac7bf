package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Exact n-gram Jaccard similarity — the verification stage behind
  * MinHash's estimate. Pair generation must come from a bounded
  * candidate source (LSH buckets, or a partition-key like `source`);
  * an unconstrained cross join is quadratic and is deliberately not
  * offered.
  */
object NGramJaccard {

  /** Cap on how many documents of one block may share a gram before
    * that gram is dropped from the inverted index — the same hazard
    * class `MinHashLSH.maxBucket` / `SpanDedup.maxDocs` /
    * `PerceptualHash` blocks cap: a boilerplate gram present in B
    * docs of a block emits B² posting-join rows, and one flood gram
    * (a shared header line, a license banner) makes the block
    * quadratic at corpus scale. A gram this common carries no
    * discriminative signal — it raises every pair's intersection by
    * the same 1 — so dropping it perturbs similarity marginally while
    * bounding the join at (#grams)·cap². Scores above the cap are the
    * jaccard/containment of the FILTERED gram sets (per-doc sizes are
    * corrected in [[invertedCounts]]), so the cap's effect is
    * one-sided — boilerplate is ignored, never half-counted — and the
    * uncapped DuckDB oracles (qd07/qd21/qd25) agree exactly as long
    * as no fixture gram crosses the cap, which this default
    * guarantees by two orders of magnitude. Lower it for
    * boilerplate-heavy corpora (and expect capped blocks to diverge
    * from a capless engine — documented on the oracle queries). */
  val DefaultMaxGramFreq = 1000

  /** |A ∩ B| / |A ∪ B| over two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_union(a, b))
    when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  /** [[jaccard]] over SORTED distinct arrays: the intersection size is
    * one allocation-free native merge walk
    * ([[graft.functions.SetExprs.sortedIntersectCount]]) and the union
    * size is |A| + |B| − |A∩B| — same values, none of
    * `array_intersect`/`array_union`'s per-pair hash sets and result
    * arrays. This is the pair-join hot loop: at sf0.1 the hash-set form
    * made qd07 a 28-second query; the merge walk is ~20× cheaper. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = graft.functions.SetExprs.sortedIntersectCount(a, b)
    val union = size(a).cast("long") + size(b).cast("long") - inter
    when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  /** Pairs within a blocking key (e.g. `source`) scored by exact
    * token-n-gram Jaccard, id_a < id_b, similarity >= threshold.
    *
    * Two formulations, same values for any positive threshold:
    *
    *   - threshold > 0 → INVERTED INDEX (the classic set-similarity
    *     join): explode to (block, gram, id) postings, self-join on
    *     gram equality, count co-occurrences per pair —
    *     |A∩B| arrives as an algebraic `count`, union by
    *     |A|+|B|−|A∩B|, and the gram ARRAYS never cross the pair
    *     join (the dense form materialized both ~n-gram arrays into
    *     every one of the B² candidate rows — the dominant cost at
    *     sf0.1). Pairs sharing no gram have similarity 0 and cannot
    *     pass a positive threshold, so never materializing them is
    *     exactly the point.
    *   - threshold <= 0 → dense within-block pair join (zero-overlap
    *     pairs included by contract), sorted-merge native kernel.
    *
    * Gram sets build through the native [[graft.functions.ShingleExprs]]
    * kernel (the interpreted HOF build cost more than the join). */
  def pairsWithinBlock(
      df: DataFrame,
      text: Column,
      id: Column,
      block: Column,
      n: Int = 3,
      threshold: Double = 0.2,
      maxGramFreq: Int = DefaultMaxGramFreq): DataFrame = {
    // materialized so gram arrays are built (and sorted) once per doc,
    // not once per pair through the join lineage; localCheckpoint so
    // the blocks are freed when the result is dropped (see MinHashLSH)
    val g = graft.operators.Parallelism.ensureMin(df).select(
      block.as("blk"),
      id.as("id"),
      graft.functions.ShingleExprs
        .sortedTokenShingles(TextOps.normalized(text), n).as("grams"))
      .transform(Barrier.apply)
    if (threshold > 0) invertedPairs(g, threshold, maxGramFreq)
    else densePairs(g, threshold)
  }

  /** The shared inverted-index stage: (id_a, id_b, sz_a, sz_b, inter)
    * for every gram-sharing pair — |A∩B| as an algebraic count, gram
    * arrays never crossing the pair join.
    *
    * Sizes are recomputed over the KEPT grams (per-doc flood count
    * subtracted; the correction join carries no broadcast hint — the
    * flood-doc side is corpus-sized on boilerplate-heavy data, so AQE
    * picks broadcast vs a uniform (blk, id)-keyed shuffle), which
    * makes every downstream
    * score exactly the jaccard/containment of the FILTERED gram sets:
    * self-consistent (a pair of identical docs scores 1.0 even when
    * they share flood grams) and one-sided (boilerplate is ignored,
    * never half-counted into the denominator). A pair whose overlap
    * is ONLY flood grams still never materializes — by design: pairing
    * docs on shared boilerplate is LineDedup/SpanDedup's job. */
  private def invertedCounts(g: DataFrame, maxGramFreq: Int): DataFrame = {
    require(maxGramFreq > 0, s"bad maxGramFreq=$maxGramFreq")
    val e = g.select(col("blk"), col("id"), size(col("grams")).as("sz"),
      explode(col("grams")).as("gram"))
    // flood grams out BEFORE the posting self-join (see DefaultMaxGramFreq):
    // one aggregate on the join's own keys, then an anti-join — the hot
    // list is tiny by construction (only grams over the cap)
    val hot = e.groupBy("blk", "gram")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxGramFreq)
      .select("blk", "gram")
    // per-doc flood-gram counts: one row per doc CONTAINING a flood
    // gram — on a boilerplate-heavy corpus that is close to EVERY doc,
    // so no broadcast hint (a forced broadcast would OOM the driver on
    // exactly the corpora the cap targets); AQE broadcasts when the
    // flood is genuinely rare and shuffles on the uniform (blk, id)
    // key when it is not
    val floodCnt = e.join(hot, Seq("blk", "gram"), "left_semi")
      .groupBy("blk", "id").agg(count(lit(1)).as("__fn"))
    val kept = e.join(hot, Seq("blk", "gram"), "left_anti")
      .join(floodCnt, Seq("blk", "id"), "left")
      .withColumn("sz", col("sz") - coalesce(col("__fn"), lit(0)))
    val a = kept.select(col("blk"), col("gram"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = kept.select(col("blk"), col("gram"), col("id").as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq("blk", "gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
  }

  private def invertedPairs(g: DataFrame, threshold: Double,
      maxGramFreq: Int = DefaultMaxGramFreq): DataFrame =
    invertedCounts(g, maxGramFreq)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a").cast("long") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Directional overlap instead of symmetric Jaccard: containment =
    * |A∩B| / min(|A|, |B|) — 1.0 when the smaller gram set is a
    * SUBSET of the larger. This is the quote/excerpt/superset-page
    * detector Jaccard structurally misses: a paragraph quoted inside
    * a 100× longer page has Jaccard ≈ 1%, containment 1.0. Same
    * inverted-index shape and cost as [[pairsWithinBlock]]; a
    * positive threshold is required (zero-overlap pairs are never
    * materialized, which is the point of the index). */
  def containmentPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      block: Column,
      n: Int = 3,
      threshold: Double = 0.8,
      maxGramFreq: Int = DefaultMaxGramFreq): DataFrame = {
    require(threshold > 0, "containment needs a positive threshold")
    val g = graft.operators.Parallelism.ensureMin(df).select(
      block.as("blk"),
      id.as("id"),
      graft.functions.ShingleExprs
        .sortedTokenShingles(TextOps.normalized(text), n).as("grams"))
      .transform(Barrier.apply)
    invertedCounts(g, maxGramFreq)
      .withColumn("containment",
        col("inter").cast("double") /
          least(col("sz_a"), col("sz_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Containment keep-policy: drop every document that appears as the
    * SMALLER side of a qualifying containment pair — the
    * quote/excerpt gets dropped, the page quoting it survives. Size
    * ties (mutual containment of equal-length docs) keep the lower
    * id, matching the keep-first convention everywhere else. The
    * policy is per-PAIR, deliberately not transitive: a doc contained
    * only in an itself-dropped doc is still dropped (its content
    * survives inside the survivor chain's top), which keeps the rule
    * oracle-expressible as one CASE over pairs rather than a
    * fixed-point. Victim set is (bounded pairs)-sized; the final
    * anti-join is the only corpus-wide operation. */
  def dropContained(
      df: DataFrame,
      text: Column,
      idCol: String,
      block: Column,
      size: Column,
      n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val pairs = containmentPairs(df, text, col(idCol), block, n, threshold)
    val sz = df.select(col(idCol).as("__cid"), size.as("__csz"))
    val victims = pairs
      .join(sz.select(col("__cid").as("id_a"), col("__csz").as("sz_a")), "id_a")
      .join(sz.select(col("__cid").as("id_b"), col("__csz").as("sz_b")), "id_b")
      .select(
        when(col("sz_a") < col("sz_b"), col("id_a"))
          .when(col("sz_b") < col("sz_a"), col("id_b"))
          .otherwise(greatest(col("id_a"), col("id_b")))
          .as("__victim"))
      .distinct()
    df.join(victims, col(idCol) === col("__victim"), "left_anti")
  }

  private def densePairs(g: DataFrame, threshold: Double): DataFrame = {
    val a = g.select(col("blk"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = g.select(col("blk"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardSorted(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
