package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** MinHash + banded LSH near-duplicate detection, entirely in codegen'd
  * column expressions (no UDFs, no MLlib): shingle -> k minhashes ->
  * b bands -> bucket self-join -> signature-estimated Jaccard.
  *
  * Scale notes (the design constraints, not afterthoughts):
  *   - the only shuffle is the band-bucket self-join, keyed on
  *     (band index, band hash) — high-cardinality keys, so it spreads;
  *   - `maxBucket` caps pathological buckets (boilerplate floods):
  *     a bucket with B members yields B² candidate pairs, and one
  *     million-document bucket would melt a 1000-executor job. Exact
  *     dedup runs first in a real pipeline, so giant buckets are
  *     near-identical junk; we cap and count them rather than explode.
  *   - similarity is estimated from signatures (matching fraction of k
  *     minhashes), so full shingle sets never travel through the join.
  */
object MinHashLSH {

  /** k minhash values of the shingle array: element i is
    * min over shingles of xxhash64(i, shingle) — one independent hash
    * family member per seed i.
    *
    * Shaped as ONE `aggregate` pass over the shingles with an
    * element-wise running min, rather than k separate array() columns
    * or a transform-per-seed: (a) the expression tree stays O(1) in k,
    * so Catalyst analysis doesn't blow up into megabyte task binaries
    * and minutes of plan time; (b) the shingle array (which includes an
    * array_distinct set-build) is evaluated exactly once per row —
    * higher-order functions are interpreted, so accidental k-fold
    * re-evaluation of the argument dominates everything else. */
  def signature(shingles: Column, k: Int): Column =
    aggregate(
      shingles,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(k - 1)), i => xxhash64(i, s)),
          (a, b) => least(a, b)))

  /** Banded bucket keys: b hashes, each over a disjoint slice of r
    * signature components. */
  def bandKeys(sig: Column, b: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(b - 1)),
      j => xxhash64(j, slice(sig, j * lit(r) + lit(1), lit(r))))

  /** Fraction of equal signature components — the unbiased MinHash
    * estimate of Jaccard similarity. */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => (a === b).cast("int")),
      lit(0),
      (acc, x) => acc + x).cast("double") / lit(k)

  final case class Params(
      shingleSize: Int = 5,
      numHashes: Int = 48,
      bands: Int = 12,
      threshold: Double = 0.5,
      maxBucket: Int = 1000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rows: Int = numHashes / bands
  }

  /** (id, signature) for every document. */
  def signatures(df: DataFrame, text: Column, id: Column, p: Params): DataFrame =
    df.select(
      id.as("id"),
      signature(TextOps.charShingles(text, p.shingleSize), p.numHashes).as("sig"))

  /** Candidate near-dup pairs (id_a < id_b) with their estimated
    * Jaccard, filtered to >= threshold. */
  def candidatePairs(df: DataFrame, text: Column, id: Column, p: Params = Params()): DataFrame = {
    // Materialize signatures BEFORE the self-join: without a barrier the
    // join lineage re-evaluates the full minhash computation for every
    // candidate pair (quadratic recompute — the difference between
    // seconds and hours). At cluster scale this is the step you persist
    // or write to a sketch table.
    val sigs = signatures(df, text, id, p)
      .withColumn("bks", bandKeys(col("sig"), p.bands, p.rows))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = sigs
      .select(col("id"), col("sig"), posexplode(col("bks")).as(Seq("band", "bh")))
    // cap pathological buckets before the quadratic pair expansion:
    // the overflow key list is tiny (near-identical floods), so it
    // broadcasts — cheaper than a count() window over every bucket
    val big = buckets
      .groupBy("band", "bh")
      .count()
      .filter(col("count") > p.maxBucket)
      .select("band", "bh")
    val capped = buckets.join(broadcast(big), Seq("band", "bh"), "left_anti")
    val a = capped.select(col("band"), col("bh"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bh"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b"), p.numHashes))
      .filter(col("est_jaccard") >= p.threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Near-dup survivors: drop any id that appears as the larger side of
    * a confirmed pair (greedy keep-first; one pass, no iterative
    * connected components — at scale CC is a separate job). */
  def dedupKeepFirst(df: DataFrame, text: Column, idCol: String, p: Params = Params()): DataFrame = {
    val losers = candidatePairs(df, text, col(idCol), p)
      .select(col("id_b").as(idCol))
      .distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }
}
