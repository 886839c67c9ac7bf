package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.similarity.{HyperplaneOracle, IvfIndex, PortableIvf, Quantize, SimilaritySearch}

/** Similarity-search inventory over `embeddings`. The exact queries
  * (brute force, batch top-k) ARE oracled: both engines fold the dot
  * product sequentially in double (Spark `aggregate`/`zip_with`,
  * DuckDB `list_reduce`), so cosines are bit-identical and the ranked
  * top-k sets agree, with ids as deterministic tie-breaks. The
  * LSH/IVF variants are value-oracled too as of round 13: their seeded
  * driver-side constants (hyperplanes) are inlined into the oracle SQL
  * as exact double literals, and the IVF fit's sample/init run on md5
  * rank so the Lloyd iterations replay in SQL (HyperplaneOracle,
  * IvfOracle); SimilaritySpec additionally cross-checks recall against
  * the exact brute force.
  */
/** The qs39 probe batch — shared between the registry query, its
  * oracle, and the CLI `search --probe-file` MainSpec fixture. */
object HybridBatchFixture {
  val queries: Seq[(Long, String)] = Seq(
    0L -> "spark window shuffle partition",
    1L -> "vector index search",
    2L -> "data quality filter")
}

object SimilarityQueries {

  /** DuckDB sequential double dot product over the 64-dim embeddings —
    * operation-ordered to match VectorOps.dot exactly. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String = {
    val d = s"sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dotSql(a, b)} / ($d) END"
  }

  /** Deterministic probe: the corpus vector with vec_id = 0. */
  private def probe(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Float] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select("embedding")
      .head()
      .getSeq[Float](0)

  val all: Seq[Q] = Seq(
    Q(
      "qs01_label_profile",
      (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            min("vec_id").as("min_id"),
            max("vec_id").as("max_id")),
      Some("""SELECT label, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id
              FROM embeddings GROUP BY label""")),
    Q(
      "qs02_topk_bruteforce",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        SimilaritySearch
          .bruteForceTopK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10)
          .select(col("id").as("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      Some(s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
               scored AS (
                 SELECT vec_id, ${cosineSql("e.embedding", "p.pe")} AS c
                 FROM embeddings e, p)
               SELECT vec_id, (floor((c) * 10000.0) / 10000.0) AS cosine
               FROM scored ORDER BY c DESC, vec_id LIMIT 10"""),
      bench = true),
    Q(
      "qs03_topk_ann",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        SimilaritySearch
          .annTopK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10,
            dim = 64, nbits = 4, numTables = 4)
          .select(col("id").as("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      // PRODUCTION seeded-hyperplane LSH, value-oracled since r13 via
      // inlined exact plane literals (see HyperplaneOracle)
      Some(HyperplaneOracle.oracleAnnTopKSql(dim = 64, k = 10, nbits = 4, numTables = 4))),
    Q(
      "qs04_topk_ivf",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val index = IvfIndex.fit(emb, col("embedding"), col("vec_id"), numCells = 8)
        index
          .topK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10, nprobe = 3)
          .select(col("id").as("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      // FITTED IVF, value-oracled since r13: fit's sample + init moved
      // to md5 rank, so IvfOracle re-derives the whole pipeline in SQL
      // — Lloyd iterations, corpus assignment, probe cells, top-k
      Some(graft.operators.similarity.IvfOracle
        .oracleTopKSql(numCells = 8, k = 10, nprobe = 3))),
    Q(
      "qs06_topk_ann_portable",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        graft.operators.similarity.PortableAnn
          .topK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10)
          .select(col("id").as("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      Some(graft.operators.similarity.PortableAnn.oracleSql(10))),
    Q(
      "qs07_topk_ivf_portable",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        graft.operators.similarity.PortableIvf
          .topK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10, nprobe = 3)
          .select(col("id").as("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      Some(graft.operators.similarity.PortableIvf.oracleSql(10, 3))),
    Q(
      "qs08_ann_recall",
      (s, dir) => {
        // Driver-verifiable QUALITY gate for the two approximate ANN
        // paths (qs03 LSH, qs04 IVF) — value-oracled for correctness
        // since r13, but correctness says nothing about recall: compute the
        // quality measures INSIDE Spark against the exact brute force and
        // emit frozen-threshold booleans the constant oracle pins down.
        //   self_found   — the probe's own vector must be retrieved (a
        //                  probe-vs-corpus hashing asymmetry bug flips this)
        //   missed_le_6  — set recall vs exact top-10; random candidate
        //                  sets at these settings would miss ~7.5 (ann,
        //                  25% of corpus bucketed) / ~6.3 (ivf, 3/8 cells)
        //   mass_ge_085  — retrieved cosine mass >= 85% of the exact
        //                  top-10's (observed 0.91-0.96; random ~0.3) —
        //                  the measure that counts on near-orthogonal data,
        //                  where missing a top-10 member but returning the
        //                  rank-11 substitute is barely a loss
        import org.apache.spark.sql.DataFrame
        val emb = Tables.load(s, dir, "embeddings")
        val p = probe(s, dir)
        val bf = SimilaritySearch
          .bruteForceTopK(emb, col("embedding"), col("vec_id"), p, 10)
        def eval(name: String, approx: DataFrame): DataFrame = {
          val bfMass = bf.agg(sum("cosine").as("bf_mass"))
          val stats = approx.agg(
            sum("cosine").as("mass"),
            max(when(col("id") === 0, 1).otherwise(0)).as("self"))
          val missed = bf
            .join(approx.select("id"), Seq("id"), "left_anti")
            .agg(count(lit(1)).as("n_missed"))
          // three 1-row aggregates; the cross joins are trivial
          stats.crossJoin(bfMass).crossJoin(missed).select(
            lit(name).as("method"),
            lit(10).as("k"),
            (col("self") === 1).as("self_found"),
            (col("n_missed") <= 6).as("missed_le_6"),
            (col("mass") >= col("bf_mass") * 0.85).as("mass_ge_085"))
        }
        val ann = SimilaritySearch
          .annTopK(emb, col("embedding"), col("vec_id"), p, 10,
            dim = 64, nbits = 4, numTables = 4)
        val index = IvfIndex.fit(emb, col("embedding"), col("vec_id"), numCells = 8)
        val ivf = index
          .topK(emb, col("embedding"), col("vec_id"), p, 10, nprobe = 3)
        eval("ann", ann).unionAll(eval("ivf", ivf))
      },
      Some("""SELECT 'ann' AS method, 10 AS k,
                     true AS self_found, true AS missed_le_6, true AS mass_ge_085
              UNION ALL
              SELECT 'ivf', 10, true, true, true""")),
    Q(
      "qs09_quantize_profile",
      // int8 quantization witness: per-vector scale + exact integer
      // checksums of the codes; floor(x*scale + 0.5) is bit-identical
      // on both engines (see Quantize), so this is a full value oracle
      // for the storage-side quantization path
      (s, dir) =>
        Quantize.profile(
          Tables.load(s, dir, "embeddings"), col("embedding"), col("vec_id")),
      Some(Quantize.oracleSql)),
    Q(
      "qs10_kmeans_assign",
      // deterministic k-means (integer-lattice Lloyd's): md5-ordered
      // init, one exact-lattice update, final nearest-centroid
      // assignment — every row value-oracled (same sequential
      // squared-L2 fold, same 2^20 mean lattice in both engines)
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = graft.operators.similarity.KMeansCluster
          .fit(emb, col("embedding"), col("vec_id"), k = 8, iters = 1)
        graft.operators.similarity.KMeansCluster
          .assign(emb, col("embedding"), col("vec_id"), cents)
          .select(
            col("id").as("vec_id"), col("cluster"),
            graft.operators.PortableRound.floorTo(col("dist"), 4).as("dist"))
      },
      Some(graft.operators.similarity.KMeansCluster.oracleSql(8)),
      bench = true),
    Q(
      "qs11_semantic_prune",
      // SemDeDup-shaped composite: k-means cells (qs10 machinery) ->
      // exact within-cell cosine pairs -> keep-lowest-id prune. The
      // whole cluster->pair->prune chain is value-oracled: same
      // deterministic clustering, same bit-identical cosine fold.
      (s, dir) =>
        graft.operators.similarity.SemanticDedup.prune(
          Tables.load(s, dir, "embeddings"),
          col("embedding"), col("vec_id"), "vec_id",
          k = 8, iters = 1, threshold = 0.2)
          .select("vec_id", "label"),
      Some(graft.operators.similarity.SemanticDedup.oracleSql(8, 0.2)),
      bench = true),
    Q(
      "qs12_random_projection",
      // JL sign projection 64 -> 16 dims: the map-only width reducer
      // in front of ANN/clustering. The md5-parity sign matrix is a
      // pure function of (k', dim), so DuckDB re-derives it and the
      // whole projection is value-oracled row by row.
      (s, dir) =>
        graft.operators.similarity.RandomProjection.projectExploded(
          Tables.load(s, dir, "embeddings"),
          col("embedding"), col("vec_id"), kOut = 16, dim = 64)
          .select(col("id").as("vec_id"), col("j"), col("y")),
      Some(graft.operators.similarity.RandomProjection.oracleSql(16))),
    Q(
      "qs05_topk_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        SimilaritySearch
          .topKJoin(emb, col("embedding"), col("vec_id"),
            probes, col("embedding"), col("vec_id"), k = 5)
          .select(col("probe_id"), col("corpus_id"), col("rank"))
      },
      Some(s"""WITH scored AS (
                 SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id,
                        ${cosineSql("c.embedding", "p.embedding")} AS cosine
                 FROM embeddings c,
                      (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) p)
               SELECT probe_id, corpus_id, rank FROM (
                 SELECT probe_id, corpus_id,
                        row_number() OVER (PARTITION BY probe_id
                                           ORDER BY cosine DESC, corpus_id) AS rank
                 FROM scored) z
               WHERE rank <= 5""")),
    Q(
      "qs13_pq_codes",
      // product quantization encode: 64 floats -> one packed 32-bit
      // code (8 subspaces x 4-bit argmin codewords) against the
      // md5-derived codebook — the externally-trained-codebook mode.
      // Encode is argmin of sequential-fold sqdists with ties to the
      // lowest code on both engines: every code value-oracled.
      (s, dir) =>
        graft.operators.similarity.ProductQuantizer.encode(
          Tables.load(s, dir, "embeddings"), col("embedding"), col("vec_id"))
          .select(col("id").as("vec_id"), col("pq_code")),
      Some(graft.operators.similarity.ProductQuantizer.encodeOracleSql)),
    Q(
      "qs14_topk_pq",
      // ADC scan over the packed codes: the m·k lookup table rides in
      // as literals (driver-derived from the vec_id-0 probe with the
      // same sequential fold the oracle uses), each row costs m
      // lookups + a fixed-order add chain — the codes-only scan that
      // never touches the original vectors.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val p = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0)
        graft.operators.similarity.ProductQuantizer.adcTopK(
          graft.operators.similarity.ProductQuantizer.encode(
            emb, col("embedding"), col("vec_id")),
          p, topk = 10)
      },
      Some(graft.operators.similarity.ProductQuantizer.adcOracleSql(10))),
    Q(
      "qs15_topk_ivfpq",
      // the IVF x PQ serving composition: codes persist parquet-
      // partitioned by coarse cell (file-level pruning — a probe reads
      // nprobe/numCells of the corpus), each cell holding 32-bit PQ
      // codes (64x memory cut); the probed scan is map-only ADC +
      // TakeOrdered and never touches the original vectors. Both
      // codebooks are the md5 families, so the whole serving path is
      // the qs07 x qs14 composition, value-oracled.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files
          .createTempDirectory("graft_ivfpq").toString
        graft.operators.similarity.IvfPq.writeIndex(
          emb, col("embedding"), col("vec_id"), idx)
        graft.operators.similarity.IvfPq.topKIndexed(
          s, idx, probe(s, dir), topk = 10, nprobe = 3)
      },
      Some(graft.operators.similarity.IvfPq.oracleSql(10, 3)),
      bench = true),
    Q(
      "qs24_topk_ivfpq_append",
      // the serving index LIFECYCLE: build on half the corpus, append
      // the other half (new files inside existing cell partitions,
      // base files untouched), probe the combined index. The frozen
      // codebooks make append ≡ full rebuild, so qs15's full-corpus
      // oracle value-checks the appended index end-to-end — the ANN
      // twin of qd18/qd19's incremental-dedup contract.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_append").toString
        graft.operators.similarity.IvfPq.writeIndex(
          emb.filter(col("vec_id") % 2 === 0), col("embedding"), col("vec_id"), idx)
        graft.operators.similarity.IvfPq.appendIndex(
          emb.filter(col("vec_id") % 2 === 1), col("embedding"), col("vec_id"), idx)
        graft.operators.similarity.IvfPq.topKIndexed(
          s, idx, probe(s, dir), topk = 10, nprobe = 3)
      },
      Some(graft.operators.similarity.IvfPq.oracleSql(10, 3))),
    Q(
      "qs16_semantic_decontaminate",
      // embedding-space eval-leak detection (the semantic complement
      // of qt15's exact 8-grams): label 9 plays the benchmark, every
      // other vector the corpus; a corpus item is contaminated when
      // its max cosine against ANY benchmark vector reaches 0.40.
      // Benchmark broadcast, corpus map-only + partial max — the
      // corpus never shuffles its vectors.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        graft.operators.similarity.SemanticDecon.profile(
          emb.filter(col("label") =!= 9), col("embedding"), col("vec_id"),
          emb.filter(col("label") === 9), col("embedding"),
          tau = 0.40)
      },
      Some(graft.operators.similarity.SemanticDecon.oracleSql(9, 0.40))),
    Q(
      "qs17_topk_rerank",
      // two-stage serving: the qs14 ADC codes-only scan proposes 50
      // candidates (map-only + TakeOrdered, vectors untouched), then
      // ONLY those ids broadcast into one hash join against the
      // vector corpus for exact-cosine re-ranking — precision of the
      // exact pass at O(coarseK) cost, recall of the cheap scan. Both
      // stages were oracled alone (qs14, qs02); composed here.
      (s, dir) =>
        graft.operators.similarity.Rerank.topK(
          Tables.load(s, dir, "embeddings"), col("embedding"), col("vec_id"),
          probe(s, dir), topk = 10, coarseK = 50),
      Some(graft.operators.similarity.Rerank.oracleSql(10, 50))),
    Q(
      "qs18_diversity_prune",
      // SSL-prototypes/D4-style region thinning: qs10's deterministic
      // cells, then each cell drops its floor(25%) most-prototypical
      // members (closest to centroid — least marginal information) and
      // keeps the diverse tail. Assignment map-only; ranking one
      // narrow keyed window. The geometric complement of qs11.
      (s, dir) =>
        graft.operators.similarity.DiversityPrune.prune(
          Tables.load(s, dir, "embeddings"), col("embedding"), col("vec_id"),
          k = 8, iters = 1, dropFrac = 0.25)
          .select(
            col("id").as("vec_id"), col("cluster"),
            graft.operators.PortableRound.floorTo(col("dist"), 4).as("dist"), col("rank"), col("keep")),
      Some(graft.operators.similarity.DiversityPrune.oracleSql(8, 0.25))),
    Q(
      "qs19_topk_ivfpq_batch",
      // BATCH IVF x PQ serving: one file-pruned scan answers the whole
      // query batch — per-probe cells derive EXECUTOR-side (pure
      // probedCellsCol expression; constructing the plan runs no
      // driver job, and past the ProbeBatch size gate the probe side
      // is not even broadcast), each code row joins only the probes
      // that probed its cell, the
      // ADC distance runs probe-as-column (16-way CASE per subspace,
      // same fixed add chain as the literal-table scan), and the only
      // shuffle is the per-probe top-k window. qs27 is the same path
      // at mining batch size with the plan shape asserted.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_batch").toString
        graft.operators.similarity.IvfPq.writeIndex(
          emb, col("embedding"), col("vec_id"), idx)
        graft.operators.similarity.IvfPq.topKIndexedBatch(
          s, idx, emb.filter(col("vec_id") < 5),
          col("embedding"), col("vec_id"), topk = 5, nprobe = 3)
      },
      Some(graft.operators.similarity.IvfPq.oracleBatchSql(5, 5, 3))),
    Q(
      "qs20_balanced_sample",
      // cluster-balanced sampling: every k-means cell capped at 40
      // rows by a deterministic md5 draw — dense embedding regions
      // can't dominate the mixture. Assignment map-only (centroids as
      // literals); the cap is one keyed window over narrow rows; the
      // md5 rank is a scan-stable stand-in for ORDER BY rand().
      (s, dir) =>
        graft.operators.similarity.BalancedSample.sample(
          Tables.load(s, dir, "embeddings"),
          col("embedding"), col("vec_id"), k = 8, iters = 1, perCell = 40)
          .select(col("id").as("vec_id"), col("cluster"),
            col("rank"), col("keep")),
      Some(graft.operators.similarity.BalancedSample.oracleSql(8, 40))),
    Q(
      "qs21_topk_int8",
      // exact top-k over int8 codes: the memory tier between qs02
      // (full float) and qs14 (PQ/ADC) — integer dot products (exact,
      // no rounding conventions) with one final rescale; map-only
      // scan + TakeOrdered at a quarter of the bandwidth.
      (s, dir) =>
        Quantize.topKInt8(
          Tables.load(s, dir, "embeddings"),
          col("embedding"), col("vec_id"), queryId = 0L, k = 10),
      Some(Quantize.oracleTopKSql(0L, 10))),
    Q(
      "qs22_ivf_nprobe_sweep",
      // the IVF tuning CONTRACT as a gate (qs08 pattern): recall@10
      // must be monotone non-decreasing in nprobe, and probing every
      // cell must recover the exact brute-force top-10 (full probe ≡
      // full scan). The sweep is what an operator tuning nprobe for a
      // latency budget relies on; a cell-assignment asymmetry bug
      // breaks monotonicity long before it breaks single-point recall.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val p = probe(s, dir)
        val index = IvfIndex.fit(emb, col("embedding"), col("vec_id"), numCells = 8)
        val bf = SimilaritySearch
          .bruteForceTopK(emb, col("embedding"), col("vec_id"), p, 10)
        def missed(nprobe: Int) = bf.join(
            index.topK(emb, col("embedding"), col("vec_id"), p, 10, nprobe)
              .select("id"),
            Seq("id"), "left_anti")
          .agg(count(lit(1)).as(s"m$nprobe"))
        missed(1).crossJoin(missed(3)).crossJoin(missed(8))
          .select(
            (col("m1") >= col("m3") && col("m3") >= col("m8"))
              .as("monotone_recall"),
            (col("m8") === 0).as("full_probe_exact"))
      },
      Some("SELECT true AS monotone_recall, true AS full_probe_exact")),
    Q(
      "qs23_hard_negatives",
      // contrastive hard-negative mining: for each of 5 anchor vectors,
      // the 5 most-similar corpus vectors with a DIFFERENT label — the
      // boundary-hugging negatives contrastive training wants. Same
      // broadcast-probe batch shape and sequential-fold cosine contract
      // as qs05, so ranks are value-oracled end-to-end; the label
      // inequality runs before ranking on both engines.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        graft.operators.similarity.HardNegatives
          .mine(emb, col("embedding"), col("vec_id"), col("label"),
            probes, col("embedding"), col("vec_id"), col("label"), k = 5)
          .select(col("probe_id"), col("corpus_id"), col("corpus_label"), col("rank"))
      },
      Some(s"""WITH scored AS (
                 SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id,
                        c.label AS corpus_label,
                        ${cosineSql("c.embedding", "p.embedding")} AS cosine
                 FROM embeddings c,
                      (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 5) p
                 WHERE c.label <> p.label)
               SELECT probe_id, corpus_id, corpus_label, rank FROM (
                 SELECT probe_id, corpus_id, corpus_label,
                        row_number() OVER (PARTITION BY probe_id
                                           ORDER BY cosine DESC, corpus_id) AS rank
                 FROM scored) z
               WHERE rank <= 5""")),
    Q(
      "qs25_pq_quality",
      // the PQ lossiness CONTRACT as a gate (qs08's pattern for the
      // third approximate path), stated for PQ's real serving role --
      // CANDIDATE GENERATION before an exact rerank (qs17's shape):
      //   self_found  -- the probe's own code must rank into the
      //                  candidate set (a packing/endianness bug
      //                  kills this first);
      //   fit_helps   -- the data-FITTED codebook must recall at
      //                  least as well as the md5-random one (a
      //                  broken fit regresses to random and fails);
      //   fitted_le_5 -- fitted 100-candidate recall misses <= 5 of
      //                  the exact top-10 (observed 2-4 across SFs on
      //                  these isotropic fixtures; random 100-subsets
      //                  would miss ~9.8 of 10 at 100/5000).
      // qs13/qs14 value-oracle the ADC arithmetic; this gates that
      // the arithmetic is USEFUL.
      (s, dir) => {
        import graft.operators.similarity.ProductQuantizer
        val emb = Tables.load(s, dir, "embeddings")
        val p = probe(s, dir)
        val bf = SimilaritySearch
          .bruteForceTopK(emb, col("embedding"), col("vec_id"), p, 10)
        def candRecall(cb: ProductQuantizer.Codebook) = {
          val ids = ProductQuantizer
            .adcTopK(ProductQuantizer
              .encode(emb, col("embedding"), col("vec_id"), cb)
              .select("id", "pq_code"), p, 100, cb)
            .select(col("vec_id").as("id"))
          (bf.join(ids, Seq("id"), "left_anti").agg(count(lit(1)).as("n")),
           ids.agg(max(when(col("id") === 0, 1).otherwise(0)).as("self")))
        }
        val (mdMissed, _) = candRecall(ProductQuantizer.DefaultCodebook)
        val (fitMissed, fitSelf) = candRecall(
          ProductQuantizer.fitCodebook(emb, col("embedding"), col("vec_id")))
        fitMissed.select(col("n").as("fit_n"))
          .crossJoin(mdMissed.select(col("n").as("md_n")))
          .crossJoin(fitSelf)
          .select(
            (col("self") === 1).as("self_found"),
            (col("fit_n") <= col("md_n")).as("fit_helps"),
            (col("fit_n") <= 5).as("fitted_le_5"))
      },
      Some("SELECT true AS self_found, true AS fit_helps, true AS fitted_le_5")),
    Q(
      "qs26_hard_negatives_ivf",
      // qs23's mining on its SCALE path: candidates restricted to the
      // probe's nprobe IVF cells before the cross-label ranking — at
      // billion-vector scale the mining batch scans nprobe/numCells
      // of the corpus, not all of it. The portable codebook makes
      // cell assignment, restriction, label filter and ranking all
      // SQL-reproducible, so the restricted result value-oracles.
      (s, dir) => {
        import graft.operators.similarity.PortableIvf
        val emb = Tables.load(s, dir, "embeddings")
        val p = probe(s, dir)
        val probeLabel = emb.filter(col("vec_id") === 0)
          .select("label").head().getInt(0)
        val cand = emb
          .filter(PortableIvf.cell(col("embedding"))
            .isin(PortableIvf.probedCells(p, 3): _*))
          .filter(col("label") =!= probeLabel)
        SimilaritySearch
          .bruteForceTopK(cand, col("embedding"), col("vec_id"), p, 5)
          .select(col("id").as("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      Some(graft.operators.similarity.PortableIvf.oracleCrossLabelSql(5, 3))),
    Q(
      "qs29_ivf_balance",
      // index-health monitoring for the qs24 append lifecycle: per-cell
      // load factor (cell size × numCells / corpus — the skew signal
      // that schedules `ann compact`/recluster) and append DRIFT (the
      // increment's cell share minus the base's — frozen codebooks
      // mean drift here is data drift, the retrain trigger). Base =
      // even vec_ids, increment = odd (qs24's convention). One
      // map-only cell assignment + an 8-row histogram; totals via
      // window over the 8-row frame, never a second corpus pass.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val nc = PortableIvf.numCells
        val h = emb
          .select(
            PortableIvf.cell(col("embedding")).as("cell"),
            (col("vec_id") % 2 === 0).as("is_base"))
          .groupBy("cell")
          .agg(
            sum(when(col("is_base"), 1L).otherwise(0L)).cast("bigint").as("base_n"),
            sum(when(!col("is_base"), 1L).otherwise(0L)).cast("bigint").as("inc_n"))
        val frame = s.range(nc).select(col("id").as("cell"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        frame
          .join(broadcast(h), frame("cell") === h("cell").cast("bigint"), "left")
          .select(frame("cell"),
            coalesce(col("base_n"), lit(0L)).as("base_n"),
            coalesce(col("inc_n"), lit(0L)).as("inc_n"))
          .select(col("cell"), col("base_n"), col("inc_n"),
            (((col("base_n") + col("inc_n")) * nc).cast("double") /
              sum(col("base_n") + col("inc_n")).over(w).cast("double"))
              .as("load_factor"),
            ((col("inc_n") * nc).cast("double") /
              sum("inc_n").over(w).cast("double") -
              (col("base_n") * nc).cast("double") /
                sum("base_n").over(w).cast("double")).as("drift"))
      },
      Some(PortableIvf.balanceOracleSql)),
    Q(
      "qs27_topk_ivfpq_batch_distributed",
      // qs19 at MINING scale: a 1,000-probe batch served with the
      // probes kept distributed end to end — per-probe cells derive
      // executor-side from the pure probedCellsCol expression (no
      // driver collect; constructing the plan runs zero jobs,
      // PlanShapeSpec-asserted), the exploded (probe, cell) rows
      // broadcast into the partitioned codes scan (dynamic partition
      // pruning restricts the files read), and the only shuffle is
      // the per-probe top-k window. Same probe-as-column ADC chain as
      // qs19, so every distance value-oracles.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_dist").toString
        graft.operators.similarity.IvfPq.writeIndex(
          emb, col("embedding"), col("vec_id"), idx)
        graft.operators.similarity.IvfPq.topKIndexedBatch(
          s, idx, emb.filter(col("vec_id") < 1000),
          col("embedding"), col("vec_id"), topk = 3, nprobe = 3)
      },
      Some(graft.operators.similarity.IvfPq.oracleBatchSql(1000, 3, 3)),
      bench = true),
    Q(
      "qs28_hard_negatives_ivf_batch",
      // the PRODUCTION mining configuration: qs23's cross-label
      // ranking × qs26's IVF cell restriction × qs27's distributed
      // batch shape — a whole mining batch served by ONE map-only
      // cell-restricted corpus pass (cells derive executor-side on
      // both sides; probes broadcast; only shuffle is the per-probe
      // window), exact cosine on the restricted candidates. Every
      // stage was oracled alone; composed here value-exact.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        graft.operators.similarity.HardNegatives
          .mineIvfBatch(emb, col("embedding"), col("vec_id"), col("label"),
            emb.filter(col("vec_id") < 25),
            col("embedding"), col("vec_id"), col("label"),
            k = 5, nprobe = 3)
          .select(col("probe_id"), col("corpus_id"), col("corpus_label"),
            graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"), col("rank"))
      },
      Some(graft.operators.similarity.PortableIvf
        .oracleCrossLabelBatchSql(25, 5, 3))),
    Q(
      "qs30_hashed_embedding",
      // feature-hashing document embeddings (Weinberger et al. 2009):
      // every term occurrence adds ±1 (md5-derived index and sign)
      // into one of 64 dims — a dense INTEGER vector per doc with no
      // trained model and no vocabulary table. The text-only bridge
      // into the similarity family; vectors are exact BIGINTs, and
      // they ship as dense SCALAR rows (id, j, v) — the harness
      // cannot hash an array result column (r11 advice) — so the
      // whole embedding value-oracles cell by cell.
      (s, dir) =>
        graft.operators.text.HashedEmbedding.embedRows(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          dim = 64),
      Some(graft.operators.text.HashedEmbedding.oracleEmbedSql(64))),
    Q(
      "qs31_hashed_topk",
      // qs02-style retrieval over a corpus WITHOUT an embeddings
      // table: top-10 cosine neighbors of doc 0 under the hashed
      // embeddings — integer dots and norms (the sparse-dot identity:
      // zero dims contribute nothing), one floored IEEE cosine, ties
      // broken on id in both engines.
      (s, dir) =>
        graft.operators.text.HashedEmbedding.topK(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          probeId = 0L, dim = 64, k = 10),
      Some(graft.operators.text.HashedEmbedding.oracleTopKSql(0L, 64, 10))),
    Q(
      "qs32_hashed_query_topk",
      // free-text search with zero model: a literal query STRING
      // embeds through the identical md5 hashing and ranks the corpus
      // by cosine — the semantic-ish complement of qt30's exact-term
      // BM25 (a query term absent from a doc still contributes via
      // hash-bucket co-occupancy with the doc's terms).
      (s, dir) =>
        graft.operators.text.HashedEmbedding.queryTopK(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          query = "spark window shuffle partition", dim = 64, k = 10),
      Some(graft.operators.text.HashedEmbedding.oracleQueryTopKSql(
        "spark window shuffle partition", 64, 10))),
    Q(
      "qs39_hybrid_batch",
      // batch hybrid search (round-12 advice #4): THREE free-text
      // queries through both retrieval legs in one corpus pass each —
      // BM25 hits join one broadcast union-of-terms table, the hashed
      // dense leg broadcasts one (query_id, j, pv) probe table — and
      // every ranking/fusion window is grouped PARTITION BY query_id
      // (the qs27/qe16 batch discipline; PlanShapeSpec pins it), so
      // the single-probe path's single-task windows never reappear at
      // batch scale. Integer RRF per (query, doc); ≤ kOut per query.
      (s, dir) =>
        graft.operators.text.HybridRetrieval.textTopKBatch(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          queries = HybridBatchFixture.queries,
          kPerList = 20, kOut = 10),
      Some(graft.operators.text.HybridRetrieval.oracleBatchSql(
        HybridBatchFixture.queries, kPerList = 20, kOut = 10)),
      bench = true),
    Q(
      "qs33_centroid_drift",
      // embedding-space drift monitor: per-label centroid distance to
      // the global centroid -- the cheap continuous check that a
      // slice's embedding distribution is wandering (encoder
      // regression, content shift) BEFORE expensive reactions fire.
      // One corpus pass: the global centroid derives from the same
      // per-group sums. Micro-unit integer centroids (div truncates
      // toward zero in BOTH engines -- verified), one floored sqrt.
      (s, dir) =>
        graft.operators.similarity.CentroidDrift.profile(
          Tables.load(s, dir, "embeddings"), col("embedding"),
          col("label")),
      Some(graft.operators.similarity.CentroidDrift.oracleSql())),

    Q(
      "qs34_embedding_moments",
      // the anisotropy monitor's distributed half: exact micro-unit
      // first/second moments of the embedding cloud — one scan, one
      // shuffle bounded at d(d+1)/2 + d + 1 BIGINT rows regardless of
      // corpus size; the 64x64 eigen step (EmbeddingMoments.anisotropy,
      // spec-verified) runs driver-side on THIS table, never the corpus
      (s, dir) => graft.operators.similarity.EmbeddingMoments.moments(
        Tables.load(s, dir, "embeddings"), col("embedding"), dim = 64),
      Some(graft.operators.similarity.EmbeddingMoments
        .oracleMomentsSql(64)),
      bench = true),

    Q(
      "qs35_whitening_gate",
      // all-but-the-top (Mu & Viswanath 2018) as a verifiable gate —
      // eigen work is SQL-inexpressible, so like qs08 the invariants
      // compute IN Spark against frozen margins and a constant oracle
      // pins the booleans: the removed direction's residual projection
      // is numerically zero on every row, its variance leaves the
      // trace entirely, the mean is gone (micro-floor bias bound),
      // and the new top eigenvalue is the old second one
      (s, dir) => {
        val M = graft.operators.similarity.EmbeddingMoments
        val emb = Tables.load(s, dir, "embeddings")
        // ONE covariance scan serves the before-summary AND the
        // directions; the transform reuses them (no re-scan)
        val (before, mu, vs) = M.spectrum(emb, col("embedding"), 64, k = 1)
        val t = M.removeTopWith(emb, col("embedding"), col("vec_id"), mu, vs)
        val after = M.anisotropy(t, col("emb"), 64)
        val vLit = array(vs(0).map(lit(_)): _*)
        t.select(abs(aggregate(
            zip_with(col("emb"), vLit, (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)).as("p"))
          .agg(max("p").as("max_resid"))
          .select(
            lit(1).as("k"),
            (col("max_resid") < 1e-6).as("residual_zero"),
            lit(after.trace < before.trace - 0.9 * before.topEigenvalue)
              .as("trace_drops"),
            lit(after.topEigenvalue < before.topEigenvalue).as("eig_drops"),
            lit(after.meanNormSq < 100.0).as("mean_removed"))
      },
      Some("""SELECT 1 AS k, true AS residual_zero, true AS trace_drops,
                     true AS eig_drops, true AS mean_removed""")),

    Q(
      "qs36_nprobe_curve",
      // the ANN serving knob MEASURED, not assumed (the qt50/qt56
      // tuning-curve discipline): per nprobe ∈ {1,2,4,8}, scan cost
      // (vectors in the probed cells) vs quality bought (exact-top-10
      // hits, integer-mass cosine ratio) over the portable IVF —
      // scoring runs once behind a Barrier, each row is a filter +
      // TakeOrdered; every column value-oracles
      (s, dir) => graft.operators.similarity.PortableIvf.nprobeCurve(
        Tables.load(s, dir, "embeddings"), col("embedding"),
        col("vec_id"), probe(s, dir), k = 10, nprobes = Seq(1, 2, 4, 8)),
      Some(graft.operators.similarity.PortableIvf
        .nprobeCurveSql(10, Seq(1, 2, 4, 8)))),

    Q(
      "qs37_dim_truncation_curve",
      // the vector-scan BANDWIDTH knob measured (Matryoshka prefix
      // retrieval): per prefix dim d ∈ {8,16,32,64}, exact-top-10 hits
      // and full-dim cosine mass recovered when ranking by only the
      // first d components — one Barrier'd scan computes every prefix
      // score (the codegen cosine folds over min(len), so a truncated
      // probe literal scores the prefix with zero slicing); each row
      // is a TakeOrdered cut + integer-mass aggregates
      (s, dir) => graft.operators.similarity.DimTruncation.curve(
        Tables.load(s, dir, "embeddings"), col("embedding"),
        col("vec_id"), probe(s, dir), k = 10, dims = Seq(8, 16, 32, 64)),
      Some(graft.operators.similarity.DimTruncation
        .curveSql(10, Seq(8, 16, 32, 64))),
      bench = true),

    Q(
      "qs38_clip_calibration",
      // the int8 STORAGE knob measured, completing the knob family
      // (qs36 nprobe, qs37 prefix dim, qd36 banding): per clip rank
      // (threshold = r-th order statistic of |x|; 64 = max-abs =
      // qs09/qs21's scaling), exact-top-10 hits and full-precision
      // dot mass of the int8-ranked retrieval — one Barrier'd scan
      // computes every clip level's codes, curve rows are TakeOrdered
      // cuts
      (s, dir) => graft.operators.similarity.ClipCalibration.curve(
        Tables.load(s, dir, "embeddings"), col("embedding"),
        col("vec_id"), probe(s, dir), k = 10, ranks = Seq(52, 58, 62, 64)),
      Some(graft.operators.similarity.ClipCalibration
        .curveSql(10, Seq(52, 58, 62, 64))))
  )
}
