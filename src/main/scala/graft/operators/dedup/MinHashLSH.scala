package graft.operators.dedup

import graft.operators.Barrier
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

  /** k minhash values over character shingles of the normalized text —
    * the codegen'd [[graft.functions.MinHashSignature]] expression.
    * (An earlier higher-order-function formulation — `aggregate` over a
    * shingle array with zip_with running min — kept the expression tree
    * O(1) in k but ran interpreted at ~shingles×k evaluations per row;
    * the native expression is a plain JVM loop inside whole-stage
    * codegen, ~80× faster per document.) */
  def signature(normalizedText: Column, k: Int, shingleSize: Int): Column =
    graft.functions.MinHashSignature(normalizedText, k, shingleSize)

  /** Banded bucket keys: b hashes, each over a disjoint slice of r
    * signature components. */
  def bandKeys(sig: Column, b: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(b - 1)),
      j => xxhash64(j, slice(sig, j * lit(r) + lit(1), lit(r))))

  /** Fraction of equal signature components — the unbiased MinHash
    * estimate of Jaccard similarity. Native codegen (the interpreted
    * fold was the per-candidate-pair hot loop); `k` is implied by the
    * signature length. */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    graft.functions.SigMatchFraction(sigA, sigB)

  final case class Params(
      shingleSize: Int = 5,
      numHashes: Int = 48,
      bands: Int = 12,
      threshold: Double = 0.5,
      maxBucket: Int = 1000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rows: Int = numHashes / bands
  }

  /** S-curve collision probability of the banded scheme: a pair with
    * true Jaccard `s` shares at least one of `b` bands of `r` rows
    * with probability 1 − (1 − s^r)^b — the standard LSH analysis
    * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4). */
  def collisionProb(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** The similarity at which the S-curve crosses steepest ascent,
    * ≈ (1/b)^(1/r) — the effective threshold the banding enforces. */
  def bandThreshold(b: Int, r: Int): Double = math.pow(1.0 / b, 1.0 / r)

  /** Choose (bands, rows) for a TARGET threshold: over divisor pairs
    * b·r = numHashes, pick the banding whose S-curve threshold sits
    * closest to the target, breaking ties toward MORE bands (higher
    * recall at the target — the safer error side for dedup, where a
    * missed duplicate costs training quality and a false candidate
    * only costs one exact re-check). This makes recall/cost a
    * parameter instead of caller folklore: callers state the Jaccard
    * they care about, the planner picks the banding. */
  def planBands(numHashes: Int, threshold: Double): Params = {
    require(numHashes > 0 && threshold > 0.0 && threshold < 1.0,
      s"bad planner inputs ($numHashes, $threshold)")
    val candidates = (1 to numHashes).filter(numHashes % _ == 0)
    val bands = candidates.minBy { b =>
      (math.abs(bandThreshold(b, numHashes / b) - threshold), -b)
    }
    Params(numHashes = numHashes, bands = bands, threshold = threshold)
  }

  /** (id, signature) for every document. */
  def signatures(df: DataFrame, text: Column, id: Column, p: Params): DataFrame =
    graft.operators.Parallelism.ensureMin(df).select(
      id.as("id"),
      signature(TextOps.normalized(text), p.numHashes, p.shingleSize).as("sig"))

  /** Candidate near-dup pairs (id_a < id_b) with their estimated
    * Jaccard, filtered to >= threshold. */
  def candidatePairs(df: DataFrame, text: Column, id: Column, p: Params = Params()): DataFrame = {
    // Materialize signatures BEFORE the self-join: without a barrier the
    // join lineage re-evaluates the full minhash computation for every
    // candidate pair (quadratic recompute — the difference between
    // seconds and hours). Barrier picks the materialization: eager
    // localCheckpoint by default (blocks freed by the ContextCleaner once
    // the result plan is dropped), or a reliable checkpoint when
    // spark.graft.checkpointDir is set — the multi-node path, where
    // unreplicated local blocks die with a lost executor.
    val sigs = signatures(df, text, id, p)
      .withColumn("bks", bandKeys(col("sig"), p.bands, p.rows))
      .transform(Barrier.apply)
    // ids-only explode feeds ONLY the hot-bucket count (the pair join
    // below carries signatures inline — see its comment)
    val buckets = sigs
      .select(col("id"), posexplode(col("bks")).as(Seq("band", "bh")))
    // cap pathological buckets before the quadratic pair expansion:
    // the overflow key list is tiny (near-identical floods), so it
    // broadcasts — cheaper than a count() window over every bucket
    val big = buckets
      .groupBy("band", "bh")
      .count()
      .filter(col("count") > p.maxBucket)
      .select("band", "bh")
    // signatures ride the band join INLINE (r19; the shape
    // pairsAgainstIndex and the portable twins always had): the bucket
    // shuffle grows to rows × bands × sig, but the two signature
    // re-attach joins it replaces were PAIR-linear — candidate volume,
    // which the 1000× smokes measured at 1551× collision mass, is
    // unbounded by input size, so input-linear is the 100 TB-safe
    // side of the trade. Band-collision duplicates still survive
    // until after the similarity filter (identical estimates per
    // pair), so the only pair-shaped shuffle left is the dedup of the
    // small ≥threshold set. (The PortableMinHash.pairs first-band
    // mask trick is NOT safe here: the maxBucket cap can remove a
    // pair's first colliding band from the join, which would drop the
    // pair instead of deduping it.)
    val capped = sigs
      .select(col("id"), col("sig"), posexplode(col("bks")).as(Seq("band", "bh")))
      .join(broadcast(big), Seq("band", "bh"), "left_anti")
    capped.select(col("band"), col("bh"),
        col("id").as("id_a"), col("sig").as("sig_a"))
      .join(capped.select(col("band"), col("bh"),
        col("id").as("id_b"), col("sig").as("sig_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b"), p.numHashes))
      .filter(col("est_jaccard") >= p.threshold)
      .select("id_a", "id_b", "est_jaccard")
      .dropDuplicates("id_a", "id_b")
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

  /** A persisted-corpus LSH index: `docs` is one row per document
    * (id, sig, bks) — NOT band-exploded, so it is ~1/bands the size of
    * the bucket table — and `hot` is the tiny list of over-`maxBucket`
    * band buckets, precomputed at build time so incremental runs never
    * re-aggregate the corpus. */
  final case class LshIndex(docs: DataFrame, hot: DataFrame)

  /** Sign the corpus once. The hot-bucket list is the one corpus-wide
    * aggregation, paid at BUILD time; every later increment reuses it.
    * The signed rows cross a [[Barrier]] — at least two consumers read
    * them (the hot aggregation plus writeIndex/pairsAgainstIndex), and
    * without it each consumer's lineage would re-run the signing scan,
    * breaking the "signed once" contract this index exists for. */
  def buildIndex(df: DataFrame, text: Column, id: Column, p: Params = Params()): LshIndex = {
    val rows = Barrier(signatures(df, text, id, p)
      .withColumn("bks", bandKeys(col("sig"), p.bands, p.rows)))
    val hot = rows
      .select(posexplode(col("bks")).as(Seq("band", "bh")))
      .groupBy("band", "bh")
      .count()
      .filter(col("count") > p.maxBucket)
      .select("band", "bh")
    LshIndex(rows, hot)
  }

  def writeIndex(index: LshIndex, path: String): Unit = {
    index.docs.write.mode("overwrite").parquet(s"$path/docs")
    index.hot.write.mode("overwrite").parquet(s"$path/hot")
  }

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): LshIndex =
    LshIndex(spark.read.parquet(s"$path/docs"), spark.read.parquet(s"$path/hot"))

  /** Broadcast ceiling for the increment-vs-corpus join shape
    * ([[pairsAgainstIndex]], [[graft.operators.dedup.PortableMinHash
    * .incrementalPairs]]): the increment rides the hint only while its
    * PLAN-estimated raw size × [[IncrementPayloadExpansion]] fits
    * under this. Found by measurement (round-18 1000× smoke): the
    * unconditional hint collected a corpus-scale "increment" to the
    * driver and aborted on spark.driver.maxResultSize — at 100 TB a
    * real nightly crawl can be 100 GB, which must never be a
    * driver-and-every-executor object. */
  val IncrementBroadcastBytes: Long = 128L << 20

  /** Derived-payload multiplier for the gate: the broadcast relation
    * is the band-EXPLODED signature rows (`bands` rows per doc, each
    * carrying the numHashes-wide sig) — a FIXED per-document payload
    * of roughly `bands × (8·numHashes + rowOverhead)` bytes (~5 KB at
    * the 48/12 defaults), regardless of how short or well-compressed
    * the raw text row the plan estimate measures is. A constant
    * multiplier under-gated short documents (round-19 advice: an
    * increment of tweet-length rows passed the 128 MB gate yet
    * materialized a near-maxResultSize driver object), so the
    * expansion is DERIVED from the banding params against a
    * conservative floor on the raw row estimate: short rows get a
    * large multiplier, long-document rows keep the old small one. */
  def incrementPayloadExpansion(bands: Int, numHashes: Int): Int = {
    // per-band-row payload: the numHashes-wide long sig + id/band/bh
    // fields + Spark row overhead, ~48 bytes beyond the sig itself
    val perDocPayload = bands.toLong * (8L * numHashes + 48L)
    // plan estimates of parquet text land well above this only for
    // genuinely long documents; anything shorter must inflate
    val assumedMinRawRowBytes = 256L
    math.max(4L,
      (perDocPayload + assumedMinRawRowBytes - 1) / assumedMinRawRowBytes
    ).toInt
  }

  /** The derived expansion at the default banding (48 hashes / 12
    * bands ⇒ ~21×) — kept as a named value for the spec that pins the
    * gate's arithmetic. */
  val IncrementPayloadExpansion: Int = {
    val p = Params()
    incrementPayloadExpansion(p.bands, p.numHashes)
  }

  /** Near-dup pairs between a NEW batch and the persisted corpus —
    * the daily-increment shape: dedup today's crawl against the whole
    * corpus WITHOUT re-processing the corpus.
    *
    * Scale shape (the reason this is not just candidatePairs on the
    * union): a genuinely small increment's band buckets (and
    * signatures) ride a BROADCAST into one streaming scan of the
    * index — the 100 TB side is never shuffled, never re-signed,
    * never re-aggregated. The hint is GATED (round 18, found by the
    * 1000× smoke overflowing spark.driver.maxResultSize): "small
    * relative to the corpus" is not "small in absolute terms", so an
    * increment whose plan-estimated payload exceeds
    * [[IncrementBroadcastBytes]] joins unhinted — both sides shuffle
    * on (band, bh), which is what mining a corpus-scale batch costs
    * anyway (the [[graft.operators.similarity.ProbeBatch]] rule). Hot
    * corpus buckets were excluded at build time via the broadcast
    * `hot` anti-join on the new side (removing a bucket from one side
    * of an equi-join removes its pairs); `hot` is capped small by
    * construction and always rides the hint. A pair where the
    * increment re-sends an id already in the corpus (same id, est
    * 1.0) is kept — that is the re-ingest signal
    * [[dedupAgainstIndex]] must act on. */
  def pairsAgainstIndex(
      index: LshIndex, newDf: DataFrame, text: Column, id: Column,
      p: Params = Params(),
      broadcastBytes: Long = IncrementBroadcastBytes): DataFrame = {
    val small = graft.operators.similarity.ProbeBatch.fitsBroadcast(
      newDf, broadcastBytes,
      incrementPayloadExpansion(p.bands, p.numHashes))
    val newSigs = signatures(newDf, text, id, p)
      .withColumn("bks", bandKeys(col("sig"), p.bands, p.rows))
      .transform(Barrier.apply)
    val newB = newSigs
      .select(col("id").as("id_new"), col("sig").as("sig_new"),
        posexplode(col("bks")).as(Seq("band", "bh")))
      .join(broadcast(index.hot), Seq("band", "bh"), "left_anti")
    val idxB = index.docs.select(
      col("id").as("id_old"), col("sig").as("sig_old"),
      posexplode(col("bks")).as(Seq("band", "bh")))
    idxB.join(graft.operators.similarity.ProbeBatch.hinted(newB, small),
        Seq("band", "bh"))
      .withColumn("est_jaccard", estJaccard(col("sig_new"), col("sig_old"), p.numHashes))
      .filter(col("est_jaccard") >= p.threshold)
      .select("id_new", "id_old", "est_jaccard")
      .dropDuplicates("id_new", "id_old")
  }

  /** Increment rows with no near-dup in the corpus — the keep side of
    * an incremental ingest. */
  def dedupAgainstIndex(
      index: LshIndex, newDf: DataFrame, text: Column, idCol: String,
      p: Params = Params()): DataFrame = {
    val dup = pairsAgainstIndex(index, newDf, text, col(idCol), p)
      .select(col("id_new").as(idCol))
      .distinct()
    newDf.join(dup, Seq(idCol), "left_anti")
  }
}
