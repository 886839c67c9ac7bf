package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Cross-engine-verifiable MinHash-LSH: the same shingle → k-minhash →
  * band → bucket-join → estimated-Jaccard pipeline as [[MinHashLSH]],
  * built only from operations BOTH Spark and DuckDB evaluate
  * bit-identically — md5 window hashes (first 40 bits), an xor-multiply
  * hash family kept under 2^60 (no overflow on either engine, ANSI
  * included), and md5-of-joined-decimal band keys. This variant exists
  * so the LSH dedup path has a full value ORACLE (query qd10): the
  * production path ([[MinHashLSH]], qd03) uses the faster native
  * FNV/splitmix family, and DedupSpec ties the two together
  * behaviorally.
  *
  * Single source of truth: [[oracleSql]] interpolates the same seed
  * constants this object computes, so the two engines can never drift.
  */
object PortableMinHash {

  val shingleSize = 5
  val numHashes = 48
  val bands = 12
  val rowsPerBand = 4
  /** 20-bit prime: (40-bit hash ^ 40-bit seed) * prime < 2^60. */
  val prime = 1048573L

  /** splitmix64 finalizer, masked to 40 bits — mirrored in python/SQL
    * prototypes; stable by construction. */
  private def splitmix40(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & ((1L << 40) - 1)
  }

  val seeds: Seq[Long] = (0L until numHashes.toLong).map(splitmix40)

  /** k-element signature of the normalized text: element i =
    * min over 5-char windows of (md5_40(window) ^ seed_i) * prime.
    * Computed by the codegen'd [[graft.functions.PortableMinHashSig]]
    * expression — same values as the interpreted higher-order-function
    * formulation (md5 + long xor/multiply are engine-exact), ~100×
    * faster. */
  def signature(normText: Column): Column =
    graft.functions.PortableMinHashSig(normText)

  /** (id, sig, bks): signatures plus md5 band keys — the shared head of
    * [[pairs]] and [[incrementalPairs]]. */
  private def banded(df: DataFrame, text: Column, id: Column): DataFrame =
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), signature(TextOps.normalized(text)).as("sig"))
      .withColumn("bks", transform(
        sequence(lit(0), lit(bands - 1)),
        j => md5(array_join(
          transform(slice(col("sig"), j * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
            x => x.cast("string")),
          ","))))

  /** Near-dup pairs (doc_a < doc_b) with the signature-estimated
    * Jaccard, filtered to >= threshold. */
  def pairs(df: DataFrame, text: Column, id: Column, threshold: Double): DataFrame = {
    // r19 shape — the [[bandingCurve]] distinct-pair scan applied to
    // the plain pair mine: signatures ride the ONE bucket-join shuffle
    // inline (input-linear, rows × bands — the re-attach joins it
    // replaces were PAIR-linear, which the 1000× smokes measured at
    // 1551× collision mass), and a pair's full band-collision set
    // falls out of its two signatures as one bitmask
    // ([[graft.functions.BandCollisionMask]]), so keeping only the
    // FIRST colliding band's row makes the stream distinct by
    // construction: no signature re-attach joins, no dedup shuffle —
    // the whole mine is one exchange. (Band key = md5 of the sig
    // slice, so a row's own band always collides and mask ≠ 0 — the
    // same slice-equality⇔key-equality identity bandingCurve rests
    // on.) No bucket cap here, so unlike MinHashLSH.candidatePairs
    // the first-colliding-band row always survives to the join.
    val sigs = banded(df, text, id).transform(Barrier.apply)
    val fine = sigs.select(col("id"), col("sig"),
      posexplode(col("bks")).as(Seq("band", "bk")))
    fine.select(col("band"), col("bk"),
        col("id").as("doc_a"), col("sig").as("sig_a"))
      .join(fine.select(col("band"), col("bk"),
        col("id").as("doc_b"), col("sig").as("sig_b")), Seq("band", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("mask", graft.functions.BandCollisionMask(
        col("sig_a"), col("sig_b"), rowsPerBand))
      .filter(expr(
        "(mask & -mask) = shiftleft(cast(1 as bigint), band)"))
      .withColumn("est_jaccard",
        MinHashLSH.estJaccard(col("sig_a"), col("sig_b"), numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
      // size the RESULT's partitioning to its data (AQE rebalance),
      // not to the bucket join's task count: the filtered pair set is
      // orders of magnitude smaller than the collision stream, and
      // iterative consumers (ConnectedComponents re-reads the
      // materialized edges every round) pay the stale layout once per
      // round — measured 2× on qd37's base CC when the mine's 32
      // near-empty join partitions leaked into the checkpoint. Costs
      // one pair-set-sized exchange, exactly what the old shape's
      // dedup shuffle was.
      .hint("rebalance")
  }

  /** Portable twin of [[MinHashLSH.pairsAgainstIndex]]: (new, old)
    * near-dup pairs between an increment and a corpus — same
    * broadcast-the-increment join shape, md5 family, so the
    * incremental-dedup algorithm carries a full value oracle (qd19).
    * Same-id re-ingest pairs are kept, as in the production path.
    * The broadcast hint carries the production path's size gate
    * (round 18): an increment past [[MinHashLSH
    * .IncrementBroadcastBytes]] of plan-estimated payload joins
    * unhinted instead of collecting to the driver. */
  def incrementalPairs(
      corpus: DataFrame, inc: DataFrame, text: Column, id: Column,
      threshold: Double,
      broadcastBytes: Long = MinHashLSH.IncrementBroadcastBytes): DataFrame = {
    val small = graft.operators.similarity.ProbeBatch.fitsBroadcast(
      inc, broadcastBytes,
      MinHashLSH.incrementPayloadExpansion(bands, numHashes))
    val cb = banded(corpus, text, id).transform(Barrier.apply)
      .select(col("id").as("doc_old"), col("sig").as("sig_old"),
        posexplode(col("bks")).as(Seq("band", "bk")))
    val nb = banded(inc, text, id).transform(Barrier.apply)
      .select(col("id").as("doc_new"), col("sig").as("sig_new"),
        posexplode(col("bks")).as(Seq("band", "bk")))
    cb.join(graft.operators.similarity.ProbeBatch.hinted(nb, small),
        Seq("band", "bk"))
      .withColumn("est_jaccard",
        MinHashLSH.estJaccard(col("sig_new"), col("sig_old"), numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_new", "doc_old", "est_jaccard")
      .dropDuplicates("doc_new", "doc_old")
  }

  /** Oracle for [[incrementalPairs]] with corpus = even doc ids and
    * increment = odd doc ids (the split used by qd19): the same
    * signature/band CTEs, candidates joined ACROSS the two sides. */
  def oracleIncrementalSql(threshold: Double): String =
    s"""${pipelineCtes()},
       |candx AS (SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
       |          FROM bands n JOIN bands o ON n.j = o.j AND n.bk = o.bk
       |          WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0),
       |estx AS (SELECT doc_new, doc_old,
       |           CAST(length(list_filter(range(1, ${numHashes + 1}), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
       |             / $numHashes.0 AS est_jaccard
       |         FROM candx JOIN sig sa ON candx.doc_new = sa.doc_id
       |                    JOIN sig sb ON candx.doc_old = sb.doc_id)
       |SELECT doc_new, doc_old, est_jaccard FROM estx
       |WHERE est_jaccard >= $threshold""".stripMargin

  /** Near-dup survivors with the keep-first policy of
    * [[MinHashLSH.dedupKeepFirst]], over the portable pairs — so the
    * survivor semantics also carry a full oracle (qd15). */
  def dedupKeepFirst(df: DataFrame, text: Column, idCol: String, threshold: Double): DataFrame = {
    val losers = pairs(df, text, col(idCol), threshold)
      .select(col("doc_b").as(idCol))
      .distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Oracle for [[dedupKeepFirst]]: every doc id that never appears as
    * the larger side of a surviving pair. */
  def oracleDedupSql(threshold: Double): String =
    s"""${pipelineCtes()}
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_b FROM est WHERE est_jaccard >= $threshold)""".stripMargin

  /** The DuckDB rendition of the identical pipeline, interpolating the
    * same seeds/prime — runnable by the driver's oracle over the same
    * parquet `documents` table. */
  def oracleSql(threshold: Double): String =
    s"""${pipelineCtes()}
       |SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= $threshold""".stripMargin

  /** Oracle for qd16: connected components over the surviving pair
    * graph via a recursive transitive-closure CTE (an INDEPENDENT
    * formulation — set-recursion, not our iterative label
    * propagation), labeling each doc with the least reachable id. */
  /** Shared transitive-closure prefix of the component oracles: the
    * pipeline CTEs plus the symmetric-edge recursive reach set. */
  private def reachCtes(threshold: Double): String =
    s"""${pipelineCtes().replaceFirst("^WITH ", "WITH RECURSIVE ")},
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM est WHERE est_jaccard >= $threshold),
       |sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |reach AS (
       |  SELECT a AS node, b AS other FROM sym
       |  UNION
       |  SELECT r.node, s.b AS other FROM reach r JOIN sym s ON r.other = s.a
       |)""".stripMargin

  def oracleComponentsSql(threshold: Double): String =
    s"""${reachCtes(threshold)}
       |SELECT d.doc_id,
       |       least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
       |FROM documents d
       |LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |  ON d.doc_id = m.node""".stripMargin

  /** The LSH banding knob MEASURED (the qs36/qd33/qt50 tuning-curve
    * discipline applied to the banding itself): per band count b
    * (rows-per-band = 48/b), the candidate-pair volume the bucket join
    * pays vs the >= threshold near-dup pairs it recovers, with recall
    * relative to the most sensitive banding tested (more bands = fewer
    * rows per band = higher collision probability = strictly higher
    * recall along the S-curve — [[MinHashLSH.planBands]] predicts this
    * curve from theory; this query measures it on the corpus, which is
    * what an operator actually tunes from).
    *
    * 100 TB shape (round-16, second revision — the original form
    * materialized + deduped every candidate PAIR per leg, and the
    * loosest leg's legitimately-linear ~593 M distinct pairs cost an
    * ~80 GB shuffle at the 100× smoke, ENOSPC on one box; the first
    * revision's compound band-pair buckets fixed that but re-derived
    * distinctness through a C(bMax,2)-per-doc explode join that
    * sextupled the base cost): pair rows are never shuffled, and the
    * whole curve needs ONE bucket self-join. Band boundaries nest
    * (every b divides bMax — required below — so a coarse band
    * collides iff ALL its fine bands do, and any leg's colliding pair
    * collides at the finest leg too). The finest-leg bucket join
    * carries signatures inline, so at a collision row the pair's FULL
    * fine-band collision set is computable from the two signatures
    * alone; keeping only rows whose band is the pair's first colliding
    * band yields exactly one row per DISTINCT colliding pair with no
    * dedup shuffle. Everything aggregates from that one scan:
    *
    *   - `n_candidates` per leg = Σ_buckets C(m,2) (a pure group-by,
    *     collisions with multiplicity c(p)) minus the over-count
    *     Σ_p (c_leg(p)−1)⁺ summed on the distinct-pair scan;
    *   - `n_pairs` per leg = distinct-pair rows with est-Jaccard ≥
    *     threshold and ≥1 coarse-band collision at that leg — the
    *     estimate runs once per distinct pair, inline, before anything
    *     pair-shaped would shuffle (nothing does: the scan feeds a
    *     one-row aggregate).
    *
    * Signatures are computed once behind a Barrier and ride the
    * bucket-join shuffle (input-linear: rows × bMax, vs pair-linear
    * for any re-attach join). Counts are exact BIGINTs; the recall
    * ratio floors through the shared misround-free floor(a/b)
    * (n_pairs · 1000 < 2^52 at any realistic pair count). */
  def bandingCurve(
      df: DataFrame, text: Column, id: Column, threshold: Double,
      bandCounts: Seq[Int]): DataFrame = {
    require(bandCounts.nonEmpty &&
      bandCounts.forall(b => b > 0 && numHashes % b == 0),
      s"band counts must divide $numHashes: $bandCounts")
    val bMax = bandCounts.max
    require(bandCounts.forall(bMax % _ == 0),
      s"band counts must nest into the finest banding $bMax (each " +
        s"coarse band = consecutive fine bands): $bandCounts — the " +
        "curve scores candidates once at the finest leg and derives " +
        "the coarser legs from band nesting")
    val sigs = graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), signature(TextOps.normalized(text)).as("sig"))
      .transform(Barrier.apply)
    def bandKeys(b: Int): Column = {
      val rpb = numHashes / b
      transform(sequence(lit(0), lit(b - 1)),
        j => md5(array_join(
          transform(slice(col("sig"), j * lit(rpb) + lit(1), lit(rpb)),
            x => x.cast("string")), ",")))
    }
    // ---- the ONE distinct-pair scan: finest-leg bucket join with
    // signatures inline; at a collision row the pair's full fine-band
    // collision set falls out of the two signatures as ONE bitmask
    // ([[graft.functions.BandCollisionMask]], native codegen — the
    // interpreted higher-order formulation of the same logic measured
    // ~7× this query's wall), and keeping only the pair's FIRST
    // colliding band's row makes the stream distinct by construction —
    // no compound join, no dedup shuffle. Everything per-band
    // downstream is integer bit arithmetic on the mask.
    val rpbMax = numHashes / bMax
    // colliding band count at leg b (nesting: a coarse band collides
    // iff ALL its g consecutive fine bands do): AND the mask with its
    // own shifts, then count the surviving group-start bits
    def cLeg(b: Int): Column = {
      val g = bMax / b
      val allFine = (1 until g)
        .map(i => s"shiftright(mask, $i)")
        .foldLeft("mask")((acc, s) => s"($acc & $s)")
      val sel = (0 until b).map(bigJ => 1L << (g * bigJ)).reduce(_ | _)
      expr(s"cast(bit_count($allFine & ${sel}L) as bigint)")
    }
    val fineBuckets = sigs.select(col("id"), col("sig"),
      posexplode(bandKeys(bMax)).as(Seq("band", "bk")))
    val perPair = fineBuckets
      .select(col("band"), col("bk"),
        col("id").as("doc_a"), col("sig").as("sig_a"))
      .join(fineBuckets.select(col("band"), col("bk"),
        col("id").as("doc_b"), col("sig").as("sig_b")),
        Seq("band", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("mask", graft.functions.BandCollisionMask(
        col("sig_a"), col("sig_b"), rpbMax))
      // the row's own band always collides (bucket key = md5 of the
      // slice), so mask ≠ 0; keep the lowest-set-bit band's row only.
      // The shifted 1 must be a BIGINT: an INT literal wraps at
      // band ≥ 32, silently corrupting pair selection for bMax ≥ 32
      // (legal here — any divisor of numHashes, e.g. bMax=48/rpb=1).
      .filter(expr(
        "(mask & -mask) = shiftleft(cast(1 as bigint), band)"))
      .select(Seq(
        (MinHashLSH.estJaccard(col("sig_a"), col("sig_b"), numHashes)
          >= threshold).as("good")) ++
        bandCounts.map(b => cLeg(b).as(s"c_$b")): _*)
    // one row total: per-leg distinct-count correction + ≥-threshold
    // pair count, folded map-side straight out of the join stream —
    // Barrier'd, or every legRow below re-runs the whole scan
    val foldAggs = bandCounts.flatMap(b => Seq(
      coalesce(sum(greatest(col(s"c_$b") - lit(1L), lit(0L))), lit(0L))
        .as(s"excess_$b"),
      coalesce(sum(when(col("good") && col(s"c_$b") >= 1, lit(1L))
        .otherwise(lit(0L))), lit(0L)).as(s"pairs_$b")))
    val folded = Barrier(perPair.agg(foldAggs.head, foldAggs.tail: _*))
    def legRow(b: Int): DataFrame = {
      val tot = sigs
        .select(col("id"), posexplode(bandKeys(b)).as(Seq("band", "bk")))
        .groupBy("band", "bk").agg(count(lit(1)).as("m"))
        .agg(coalesce(sum(expr("m * (m - 1) div 2")), lit(0L))
          .as("total_coll"))
      tot.crossJoin(folded)
        .select(lit(b).as("bands"), lit(numHashes / b).as("rows_per_band"),
          (col("total_coll") - col(s"excess_$b")).as("n_candidates"),
          col(s"pairs_$b").as("n_pairs"))
    }
    // the curve is len(bandCounts) rows — Barrier it so the reference
    // row below reads the materialized counts instead of re-running
    // the scan through lineage (folded would otherwise re-run once per
    // leg AND once more for the reference row)
    val curve = Barrier(bandCounts.map(legRow).reduce(_ unionByName _))
    val ref = curve.filter(col("bands") === bMax)
      .select(col("n_pairs").as("ref_pairs"))
    curve.crossJoin(ref)
      .withColumn("recall_milli",
        when(col("ref_pairs") > 0,
          floor((col("n_pairs") * lit(1000L)).cast("double") /
            col("ref_pairs").cast("double")).cast("long")))
      .drop("ref_pairs")
  }

  /** qd36 oracle — the same sig CTE re-banded per band count, DISTINCT
    * candidate pairs, estimate filter, and the floored recall ratio
    * against the most sensitive banding. */
  def bandingCurveSql(threshold: Double, bandCounts: Seq[Int]): String = {
    val perB = bandCounts.map { b =>
      val rpb = numHashes / b
      s"""bands_$b AS (SELECT doc_id, j,
         |    md5(list_aggregate(list_transform(
         |          list_slice(sig, j*$rpb + 1, j*$rpb + $rpb),
         |          x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS bk
         |  FROM sig, (SELECT unnest(range(0, $b)) AS j)),
         |cand_$b AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands_$b a JOIN bands_$b b
         |    ON a.j = b.j AND a.bk = b.bk AND a.doc_id < b.doc_id),
         |np_$b AS (SELECT
         |    (SELECT count(*) FROM cand_$b)::BIGINT AS n_candidates,
         |    (SELECT count(*) FROM cand_$b c
         |       JOIN sig sa ON c.doc_a = sa.doc_id
         |       JOIN sig sb ON c.doc_b = sb.doc_id
         |      WHERE CAST(length(list_filter(range(1, ${numHashes + 1}),
         |              i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / $numHashes.0
         |            >= $threshold)::BIGINT AS n_pairs)""".stripMargin
    }.mkString(",\n")
    val bMax = bandCounts.max
    val rows = bandCounts.map { b =>
      s"""SELECT $b AS bands, ${numHashes / b} AS rows_per_band,
         |  n_candidates, n_pairs,
         |  CASE WHEN (SELECT n_pairs FROM np_$bMax) > 0 THEN
         |    CAST(floor(CAST(n_pairs * 1000 AS DOUBLE) /
         |               CAST((SELECT n_pairs FROM np_$bMax) AS DOUBLE)) AS BIGINT)
         |  END AS recall_milli
         |FROM np_$b""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${pipelineCtes()},
       |$perB
       |$rows""".stripMargin
  }

  /** Oracle for qd35 ([[SoftDedup.weights]]): the [[oracleComponentsSql]]
    * component frame extended with per-cluster sizes and the
    * floor-milli weight / effective-length columns — the same IEEE
    * floor(a/b) both engines evaluate identically (see SoftDedup's
    * exactness note). */
  def oracleSoftWeightsSql(threshold: Double): String =
    s"""${reachCtes(threshold)},
       |comp AS (
       |  SELECT d.doc_id, d.n_chars,
       |         least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
       |  FROM documents d
       |  LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |    ON d.doc_id = m.node),
       |sz AS (SELECT component, count(*)::BIGINT AS cluster_size
       |       FROM comp GROUP BY component)
       |SELECT c.doc_id, c.component, s.cluster_size,
       |       CAST(floor(1000.0 / CAST(s.cluster_size AS DOUBLE)) AS BIGINT)
       |         AS weight_milli,
       |       CAST(floor(CAST(c.n_chars * 1000 AS DOUBLE) /
       |                  CAST(s.cluster_size AS DOUBLE)) AS BIGINT)
       |         AS effective_chars_milli
       |FROM comp c JOIN sz s ON c.component = s.component""".stripMargin

  /** [[oracleComponentsSql]] extended with canonical selection
    * (CanonicalSelect.label): per component, the longest document wins
    * (n_chars DESC, doc_id ASC tiebreak) via the same
    * full-frame first_value both engines evaluate identically. */
  def oracleCanonicalSql(threshold: Double): String =
    s"""${reachCtes(threshold)},
       |comp AS (
       |  SELECT d.doc_id, d.n_chars,
       |         least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
       |  FROM documents d
       |  LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |    ON d.doc_id = m.node)
       |SELECT doc_id, component,
       |       first_value(doc_id) OVER (
       |         PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |         AS canonical_id,
       |       doc_id = first_value(doc_id) OVER (
       |         PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |         AS keep
       |FROM comp""".stripMargin

  /** [[oracleComponentsSql]] extended with duplicate-aware split
    * assignment (qp09): the split bucket hashes the COMPONENT label,
    * not the doc id, so an entire near-dup cluster lands in one split
    * and train/test leakage through near-duplicates is impossible by
    * construction. Same md5-bucket arithmetic as qt07's per-doc split
    * (CorpusOps.splitBucket), evaluated identically by both engines. */
  def oracleSplitSql(threshold: Double, trainPct: Int = 80, validPct: Int = 10): String =
    s"""${reachCtes(threshold)},
       |comp AS (
       |  SELECT d.doc_id,
       |         least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
       |  FROM documents d
       |  LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |    ON d.doc_id = m.node)
       |SELECT doc_id, component,
       |       CASE WHEN b < $trainPct THEN 'train'
       |            WHEN b < ${trainPct + validPct} THEN 'validation'
       |            ELSE 'test' END AS split
       |FROM (SELECT doc_id, component,
       |             CAST(('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
       |      FROM comp) x""".stripMargin

  /** qp11's oracle: over the ≥threshold pair graph, how many pairs
    * STRADDLE two splits under (a) the naive per-doc split (qt07) and
    * (b) the duplicate-aware per-component split (qp09)? (b) is zero
    * by construction — the count is the demonstration, computed by
    * the oracle rather than asserted. Sums CAST to BIGINT (DuckDB
    * sums integers into HUGEINT, which the driver's hash renders
    * engine-differently); zero-pair corpora coalesce to 0. */
  def oracleLeakageSql(threshold: Double, trainPct: Int = 80, validPct: Int = 10): String = {
    def splitCase(of: String): String =
      s"""CASE WHEN CAST(('0x' || substring(md5(CAST($of AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < $trainPct THEN 'train'
         |     WHEN CAST(('0x' || substring(md5(CAST($of AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < ${trainPct + validPct} THEN 'validation'
         |     ELSE 'test' END""".stripMargin
    s"""${reachCtes(threshold)},
       |comp AS (
       |  SELECT d.doc_id,
       |         least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
       |  FROM documents d
       |  LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |    ON d.doc_id = m.node),
       |naive AS (SELECT doc_id, ${splitCase("doc_id")} AS split FROM documents),
       |aware AS (SELECT doc_id, ${splitCase("component")} AS split FROM comp),
       |pairs AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= $threshold)
       |SELECT count(*) AS n_pairs,
       |       CAST(coalesce(sum(CASE WHEN na.split <> nb.split THEN 1 ELSE 0 END), 0) AS BIGINT)
       |         AS cross_naive,
       |       CAST(coalesce(sum(CASE WHEN aa.split <> ab.split THEN 1 ELSE 0 END), 0) AS BIGINT)
       |         AS cross_dup_aware
       |FROM pairs p
       |JOIN naive na ON na.doc_id = p.doc_a
       |JOIN naive nb ON nb.doc_id = p.doc_b
       |JOIN aware aa ON aa.doc_id = p.doc_a
       |JOIN aware ab ON ab.doc_id = p.doc_b""".stripMargin
  }

  /** The shared CTE chain (normalize -> shingle-hash -> signature ->
    * bands -> candidates -> estimates) over `from` — parametrized so
    * composite pipelines (CorpusPipeline) can run it on an intermediate
    * relation instead of the raw table. */
  private[graft] def pipelineCtes(from: String = "documents"): String = {
    val seedList = seeds.mkString("[", ",", "]")
    val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    s"""WITH n AS (SELECT doc_id, $norm AS nt FROM $from),
       |h AS (SELECT doc_id,
       |        list_transform(range(1, greatest(length(nt) - ${shingleSize - 1}, 1) + 1),
       |          i -> CAST(('0x' || substring(md5(substring(nt, i, $shingleSize)), 1, 10)) AS BIGINT)) AS hs
       |      FROM n),
       |sig AS (SELECT doc_id,
       |          list_transform($seedList,
       |            c -> list_min(list_transform(hs, x -> xor(x, c) * $prime))) AS sig
       |        FROM h),
       |bands AS (SELECT doc_id, sig, j,
       |            md5(list_aggregate(list_transform(
       |                  list_slice(sig, j*$rowsPerBand + 1, j*$rowsPerBand + $rowsPerBand),
       |                  x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS bk
       |          FROM sig, (SELECT unnest(range(0, $bands)) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.j = b.j AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |est AS (SELECT doc_a, doc_b,
       |          CAST(length(list_filter(range(1, ${numHashes + 1}), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
       |            / $numHashes.0 AS est_jaccard
       |        FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
       |                  JOIN sig sb ON cand.doc_b = sb.doc_id)""".stripMargin
  }
}
