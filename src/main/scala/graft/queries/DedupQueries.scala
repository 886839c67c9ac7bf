package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.dedup._

/** Deduplication operator inventory over the `documents` /
  * `embeddings` corpora. As of round 13 EVERY query here is fully
  * value-oracled, production hash families included: the FNV SimHash
  * path (qd05/qd06) via HUGEINT limb arithmetic since round 10; the
  * FNV+splitmix64 MinHash family (qd03/qd04/qd09/qd18) via
  * [[graft.operators.dedup.MinHashOracle]]'s per-DISTINCT-shingle
  * vectorized re-derivation; the seeded hyperplane LSH (qd08) via
  * [[graft.operators.similarity.HyperplaneOracle]]'s inlined exact
  * plane literals. The md5-family portable twins (qd10-qd15, qd19)
  * remain as the simpler cross-engine pipelines they always were, and
  * qd17 keeps the in-Spark estimate-vs-exact quality gate.
  */
object DedupQueries {

  /** DuckDB sequential double dot product over 64-dim embeddings —
    * operation-ordered to match VectorOps.dot exactly. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String = {
    val d = s"sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dotSql(a, b)} / ($d) END"
  }

  val all: Seq[Q] = Seq(
    Q(
      "qd01_dedup_exact",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        ExactDedup.survivors(docs, col("text"), col("doc_id"))
          .select(col("__keep").as("doc_id"))
      },
      Some("SELECT min(doc_id) AS doc_id FROM documents GROUP BY text")),
    Q(
      "qd02_dedup_exact_normalized",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        ExactDedup
          .dedup(docs, regexp_replace(lower(trim(col("text"))), "\\s+", " "), "doc_id")
          .select("doc_id", "lang", "source")
      },
      Some("""SELECT doc_id, lang, source FROM documents
              WHERE doc_id IN (
                SELECT min(doc_id) FROM documents
                GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))""")),
    Q(
      "qd03_minhash_pairs",
      // PRODUCTION FNV+splitmix64 family, now fully value-oracled:
      // MinHashOracle re-derives the hash family once per DISTINCT
      // shingle in vectorized HUGEINT arithmetic (2.8 s at sf0.01 /
      // 7.5 s at sf0.1 — the round-10 "minutes per run" adjudication
      // was the per-occurrence lambda formulation, now obsolete)
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        MinHashLSH
          .candidatePairs(docs, col("text"), col("doc_id"),
            MinHashLSH.Params(shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3))
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            graft.operators.PortableRound.floorTo(col("est_jaccard"), 4).as("est_jaccard"))
      },
      Some(MinHashOracle.oraclePairsSql(
        MinHashLSH.Params(shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3))),
      bench = true),
    Q(
      "qd04_minhash_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        MinHashLSH
          .dedupKeepFirst(docs, col("text"), "doc_id",
            MinHashLSH.Params(shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3))
          .select("doc_id")
      },
      Some(MinHashOracle.oracleDedupSql(
        MinHashLSH.Params(shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3)))),
    Q(
      "qd05_simhash_fingerprints",
      // the PRODUCTION FNV-1a SimHash path, now fully value-oracled:
      // DuckDB re-derives the 64-bit wraparound FNV fold in HUGEINT
      // limb arithmetic (see SimHashDedup.oracleFingerprintsSql) — no
      // longer a rows-only check
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        SimHashDedup
          .fingerprints(docs, col("text"), col("doc_id"))
          .select(col("id").as("doc_id"), col("sh").as("simhash"))
      },
      Some(SimHashDedup.oracleFingerprintsSql)),
    Q(
      "qd06_simhash_pairs",
      // same banding, bucket join, pair dedup and popcount filter over
      // the FNV fingerprints — value-oracled end to end
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        SimHashDedup
          .candidatePairs(docs, col("text"), col("doc_id"), maxHamming = 16)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      },
      Some(SimHashDedup.oraclePairsSql(16))),
    Q(
      "qd07_ngram_jaccard_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        NGramJaccard
          .pairsWithinBlock(docs, col("text"), col("doc_id"), col("source"),
            n = 2, threshold = 0.12)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            graft.operators.PortableRound.floorTo(col("jaccard"), 4)
              .as("jaccard"))
      },
      // exact token-2-gram Jaccard is SQL-expressible: build the same
      // distinct-gram sets in DuckDB list functions; int/int division
      // through DOUBLE matches Spark's cast order bit-for-bit.
      // NOTE: this oracle (like qd21/qd25's) has NO flood-gram cap —
      // engines agree exactly because no fixture gram approaches
      // DefaultMaxGramFreq; on a corpus where a gram crosses the cap,
      // Spark scores the FILTERED gram sets (NGramJaccard scaladoc)
      // and a capless engine would diverge on those blocks by design
      Some {
        val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        val grams =
          s"""list_distinct(list_transform(
             |  range(1, greatest(len(string_split($norm, ' ')) - 1, 1) + 1),
             |  i -> list_aggregate(list_slice(string_split($norm, ' '), i, i + 1),
             |                      'string_agg', ' ')))""".stripMargin
        val union = "len(list_distinct(list_concat(a.grams, b.grams)))"
        val jac =
          s"""CASE WHEN $union = 0 THEN 1.0
             |     ELSE len(list_intersect(a.grams, b.grams))::DOUBLE / $union::DOUBLE
             |END""".stripMargin
        s"""WITH g AS (SELECT doc_id, source, $grams AS grams FROM documents)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |       ${graft.operators.PortableRound.floorToSql(jac, 4)} AS jaccard
           |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE $jac >= 0.12""".stripMargin
      }),
    Q(
      "qd21_containment_pairs",
      // directional overlap: containment = |A∩B| / min(|A|,|B|) — the
      // quote/excerpt/superset detector Jaccard structurally misses
      // (a paragraph quoted in a 100x longer page has Jaccard ~1%,
      // containment 1.0). Same inverted-index shape as qd07 — and the
      // same capless-oracle caveat (see qd07's note).
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        NGramJaccard
          .containmentPairs(docs, col("text"), col("doc_id"), col("source"),
            n = 2, threshold = 0.25)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            graft.operators.PortableRound.floorTo(col("containment"), 4)
              .as("containment"))
      },
      Some {
        val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        val grams =
          s"""list_distinct(list_transform(
             |  range(1, greatest(len(string_split($norm, ' ')) - 1, 1) + 1),
             |  i -> list_aggregate(list_slice(string_split($norm, ' '), i, i + 1),
             |                      'string_agg', ' ')))""".stripMargin
        val cont =
          "len(list_intersect(a.grams, b.grams))::DOUBLE / least(len(a.grams), len(b.grams))::DOUBLE"
        s"""WITH g AS (SELECT doc_id, source, $grams AS grams FROM documents)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |       ${graft.operators.PortableRound.floorToSql(cont, 4)} AS containment
           |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE $cont >= 0.25""".stripMargin
      }),
    Q(
      "qd09_source_signature",
      (s, dir) => {
        // corpus-level sketch: element-wise-min merge of per-doc MinHash
        // signatures per source (partial+final aggregation via the typed
        // Aggregator — the merged sig estimates Jaccard of shingle UNIONS).
        // Output is the merged signature EXPLODED to scalar rows
        // (source, i, sig_el) so the production family value-oracles:
        // element-wise min over doc signatures == min over the source's
        // (shingle, i) hash values, which MinHashOracle re-derives.
        val docs = Tables.load(s, dir, "documents")
        val sigs = MinHashLSH.signatures(docs, col("text"), col("doc_id"),
          MinHashLSH.Params())
        val merge = org.apache.spark.sql.functions.udaf(
          new graft.functions.MinHashMerge(48),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
        docs.select(col("doc_id").as("id"), col("source"))
          .join(sigs, "id")
          .groupBy("source")
          .agg(merge(col("sig")).as("group_sig"))
          .select(col("source"), posexplode(col("group_sig")).as(Seq("i", "sig_el")))
      },
      Some(MinHashOracle.oracleSourceSignatureSql(MinHashLSH.Params()))),
    Q(
      "qd10_minhash_portable_pairs",
      (s, dir) =>
        PortableMinHash.pairs(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          threshold = 0.3),
      // full value oracle: DuckDB runs the IDENTICAL pipeline (same
      // seeds, same hash family, same banding) — see PortableMinHash
      Some(PortableMinHash.oracleSql(0.3))),
    Q(
      "qd27_source_overlap_matrix",
      // provenance overlap: near-dup PAIR counts per ordered source
      // pair — the matrix that catches mirror sites and cross-licensed
      // re-publishes (qd09 compares corpus-level sketches; this counts
      // the actual duplicate mass between each source pair). The pair
      // set is usually leak-sized — but NOT bounded in code on a
      // dup-heavy corpus, so the joins carry no broadcast hint: AQE
      // broadcasts the pair side when it is small and falls back to a
      // uniform id-keyed shuffle when it is not (a forced broadcast
      // here would be a driver OOM on exactly the corpora this matrix
      // exists to diagnose). least/greatest canonicalizes the pair so
      // (A,B) and (B,A) accumulate together.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = PortableMinHash.pairs(docs, col("text"), col("doc_id"), 0.3)
          .select("doc_a", "doc_b")
        val src = docs.select(col("doc_id"), col("source"))
        val withA = src.join(pairs, src("doc_id") === pairs("doc_a"))
          .select(col("source").as("sa"), col("doc_b"))
        src.join(withA, src("doc_id") === withA("doc_b"))
          .select(
            least(col("sa"), col("source")).as("src_a"),
            greatest(col("sa"), col("source")).as("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""${PortableMinHash.pipelineCtes()},
              |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.3),
              |j AS (SELECT least(da.source, db.source) AS src_a,
              |             greatest(da.source, db.source) AS src_b
              |      FROM p
              |      JOIN documents da ON da.doc_id = p.doc_a
              |      JOIN documents db ON db.doc_id = p.doc_b)
              |SELECT src_a, src_b, count(*) AS n_pairs
              |FROM j GROUP BY src_a, src_b""".stripMargin)),
    Q(
      "qd18_incremental_pairs",
      // incremental ingest: even doc ids play the signed corpus index,
      // odd ids the daily increment; pairs come from ONE streaming scan
      // of the index against broadcast increment buckets. Production
      // FNV+splitmix64 family, value-oracled via MinHashOracle (hot
      // buckets on the oracle side come from the corpus half only,
      // exactly as buildIndex precomputes them).
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val p = MinHashLSH.Params(
          shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3)
        val index = MinHashLSH.buildIndex(
          docs.filter(col("doc_id") % 2 === 0), col("text"), col("doc_id"), p)
        MinHashLSH.pairsAgainstIndex(
          index, docs.filter(col("doc_id") % 2 === 1), col("text"), col("doc_id"), p)
          .select(col("id_new").as("doc_new"), col("id_old").as("doc_old"),
            graft.operators.PortableRound.floorTo(col("est_jaccard"), 4).as("est_jaccard"))
      },
      Some(MinHashOracle.oracleIncrementalSql(MinHashLSH.Params(
        shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3))),
      bench = true),
    Q(
      "qd19_incremental_portable",
      // portable twin of qd18: same increment-vs-corpus join shape on
      // the md5 family — DuckDB reproduces the whole incremental
      // pipeline, value-oracling the algorithm
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        PortableMinHash.incrementalPairs(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          col("text"), col("doc_id"), threshold = 0.3)
      },
      Some(PortableMinHash.oracleIncrementalSql(0.3))),
    Q(
      "qd15_minhash_portable_dedup",
      (s, dir) =>
        PortableMinHash.dedupKeepFirst(
          Tables.load(s, dir, "documents"), col("text"), "doc_id", 0.3)
          .select("doc_id"),
      Some(PortableMinHash.oracleDedupSql(0.3))),
    Q(
      "qd16_dup_components",
      (s, dir) => {
        // pair mining -> duplicate clusters: every doc labeled with the
        // least id reachable through the >=0.3 portable-minhash pair
        // graph (singletons label themselves)
        val docs = Tables.load(s, dir, "documents")
        val edges = PortableMinHash.pairs(docs, col("text"), col("doc_id"), 0.3)
        ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs, "doc_id")(s)
      },
      Some(PortableMinHash.oracleComponentsSql(0.3))),
    Q(
      "qd37_incremental_components",
      // qd16's labels, INCREMENTALLY (round-12 advice #6): even docs
      // are the persisted base labeling (the old graph = full pair
      // graph restricted to even-even, so union(base, increment) is
      // exactly the full graph at any scale, cap engagement included);
      // odd docs arrive as the increment with every pair touching an
      // odd endpoint. appendComponents seeds from the base, runs CC
      // only on the increment-touched REDUCED graph, and passes
      // untouched components through by anti-join — yet the result
      // must equal the full recompute, which is what the full-graph
      // transitive-closure oracle (qd16's) pins.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = graft.operators.Barrier(
          PortableMinHash.pairs(docs, col("text"), col("doc_id"), 0.3))
        val evens = docs.filter(col("doc_id") % 2 === 0)
        val odds = docs.filter(col("doc_id") % 2 === 1)
        val baseEdges = pairs
          .filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0)
        val incEdges = pairs
          .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
        val base = ConnectedComponents.components(
          baseEdges, "doc_a", "doc_b", evens, "doc_id")(s)
        ConnectedComponents.appendComponents(
          base, incEdges, "doc_a", "doc_b", odds, "doc_id")(s)
      },
      Some(PortableMinHash.oracleComponentsSql(0.3)),
      bench = true),
    Q(
      "qd11_simhash_portable",
      (s, dir) =>
        PortableSimHash.fingerprints(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id")),
      Some(PortableSimHash.oracleFingerprintSql)),
    Q(
      "qd12_simhash_portable_pairs",
      (s, dir) =>
        PortableSimHash.pairsWithinBlock(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          col("source"), maxHamming = 16),
      Some(PortableSimHash.oraclePairsSql(16))),
    Q(
      "qd13_embedding_blocked_pairs",
      (s, dir) => {
        // exact cosine within label blocks — the verification stage for
        // the LSH-bucketed qd08, and fully oracle-able (bit-identical
        // sequential double fold, see SimilarityQueries)
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), col("embedding"))
        val a = emb.select(col("label"), col("vec_id").as("vec_a"),
          col("embedding").as("e_a"))
        val b = emb.select(col("label"), col("vec_id").as("vec_b"),
          col("embedding").as("e_b"))
        a.join(b, Seq("label"))
          .filter(col("vec_a") < col("vec_b"))
          .withColumn("cosine",
            graft.operators.similarity.VectorOps.cosine(col("e_a"), col("e_b")))
          .filter(col("cosine") >= 0.2)
          .select(col("vec_a"), col("vec_b"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |       (floor((${cosineSql("a.embedding", "b.embedding")}) * 10000.0) / 10000.0) AS cosine
              |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
              |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.2""".stripMargin)),
    Q(
      "qd14_source_signature_portable",
      (s, dir) => {
        // corpus-level sketch with a full oracle: element-wise-min merge
        // of PORTABLE MinHash signatures per source via the typed
        // Aggregator (partial+final merge), exploded for comparison
        val docs = Tables.load(s, dir, "documents")
        val sigs = graft.operators.Parallelism.ensureMin(docs)
          .select(col("doc_id").as("id"), col("source"),
            PortableMinHash.signature(
              graft.operators.TextOps.normalized(col("text"))).as("sig"))
        val merge = org.apache.spark.sql.functions.udaf(
          new graft.functions.MinHashMerge(PortableMinHash.numHashes),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
        sigs.groupBy("source")
          .agg(merge(col("sig")).as("gsig"))
          .select(col("source"), posexplode(col("gsig")).as(Seq("pos", "sig_val")))
      },
      Some {
        val seedList = PortableMinHash.seeds.mkString("[", ",", "]")
        s"""WITH n AS (SELECT doc_id, source,
           |             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
           |           FROM documents),
           |h AS (SELECT doc_id, source,
           |        list_transform(range(1, greatest(length(nt) - 4, 1) + 1),
           |          i -> CAST(('0x' || substring(md5(substring(nt, i, 5)), 1, 10)) AS BIGINT)) AS hs
           |      FROM n),
           |sig AS (SELECT doc_id, source,
           |          list_transform($seedList,
           |            c -> list_min(list_transform(hs, x -> xor(x, c) * ${PortableMinHash.prime}))) AS sig
           |        FROM h)
           |SELECT source, CAST(i - 1 AS INT) AS pos, CAST(min(sig[i]) AS BIGINT) AS sig_val
           |FROM sig, (SELECT unnest(range(1, ${PortableMinHash.numHashes + 1})) AS i)
           |GROUP BY source, i""".stripMargin
      }),
    Q(
      "qd17_minhash_quality",
      (s, dir) => {
        // Driver-verifiable quality gate for the seeded FNV MinHash path
        // (qd03/qd04), the same pattern as qs08 for ANN: for every LSH
        // candidate pair, compare the 48-hash signature estimate to the
        // exact char-shingle Jaccard computed in-Spark, and emit
        // frozen-threshold booleans the constant oracle pins down.
        // Observed: mae 0.015-0.026, max err 0.03-0.30 (the max is
        // est>=threshold selection bias, not estimator spread; k=48 has
        // per-pair sigma ~0.07 at J=0.5). Bounds frozen at ~3x margin.
        val p = MinHashLSH.Params()
        val docs = Tables.load(s, dir, "documents")
        val pairs = MinHashLSH.candidatePairs(docs, col("text"), col("doc_id"), p)
        // shingle sets build through the native kernel and materialize
        // ONCE behind a Barrier (the interpreted-HOF build was ~15s of
        // this query's sf0.1 wall time), sorted so the exact Jaccard
        // is the native merge-count kernel
        val sh = graft.operators.Barrier(docs.select(col("doc_id"),
          graft.functions.ShingleExprs.sortedCharShingles(
            graft.operators.TextOps.normalized(col("text")), p.shingleSize).as("sh")))
        val joined = pairs
          .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("exact",
            graft.operators.dedup.NGramJaccard.jaccardSorted(col("sh_a"), col("sh_b")))
          .withColumn("abs_err", abs(col("est_jaccard") - col("exact")))
        joined
          .agg(
            count(lit(1)).as("n"),
            avg("abs_err").as("mae"),
            max("abs_err").as("maxe"))
          .select(
            (col("n") >= 1).as("found_pairs"),
            (col("mae") <= 0.08).as("mae_le_008"),
            (col("maxe") <= 0.40).as("maxe_le_040"))
      },
      Some("""SELECT true AS found_pairs, true AS mae_le_008,
                     true AS maxe_le_040""")),
    Q(
      "qd08_embedding_dup_pairs",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        // fixture embeddings are near-orthogonal (max pairwise cosine
        // ~0.48), so the "near-dup" threshold is set where pairs exist
        EmbeddingDedup
          .candidatePairs(emb, col("embedding"), col("vec_id"), dim = 64,
            threshold = 0.35, nbits = 4, numTables = 4)
          .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
            graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
      },
      // PRODUCTION seeded-hyperplane family, value-oracled since r13:
      // the planes are driver-side constants, so the oracle builder
      // regenerates them and inlines exact double literals
      Some(graft.operators.similarity.HyperplaneOracle
        .oracleEmbeddingPairsSql(dim = 64, threshold = 0.35, nbits = 4, numTables = 4))),
    Q(
      "qd20_bloom_guard",
      // the scalable exact-dup guard: a bloom over the corpus (even
      // doc ids) fingerprints probed by every document. Contract under
      // gate (the qd17/qt20 pattern — bloom bits aren't
      // SQL-reproducible, their GUARANTEES are): zero false negatives
      // (the filter's hard property — a miss here is a lost duplicate)
      // and a false-positive rate within 5x the configured 1% fpp.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val fp = md5(graft.operators.TextOps.normalized(col("text")))
        val corpusFps = docs.filter(col("doc_id") % 2 === 0).select(fp.as("fp"))
        val bf = corpusFps.stat.bloomFilter(
          "fp", math.max(corpusFps.count(), 1L), 0.01)
        // a TRUE member (an odd doc that exactly duplicates a corpus
        // doc — planted dups do this) is a correct hit, not a false
        // positive: the fp-rate denominator keeps only genuine
        // non-members, found by anti-joining the corpus fp set
        val probes = docs
          .filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), fp.as("fp"),
            graft.functions.BloomExprs.mightContain(bf, fp).as("hit"))
          .join(broadcast(corpusFps), Seq("fp"), "left_anti")
        val corpusChecked = docs
          .filter(col("doc_id") % 2 === 0)
          .select(graft.functions.BloomExprs.mightContain(bf, fp).as("hit"))
        corpusChecked.agg(
          (sum(when(!col("hit"), 1).otherwise(0)) === 0).as("no_false_negatives"))
          .crossJoin(probes.agg(
            (sum(when(col("hit"), 1).otherwise(0)).cast("double")
              / count(lit(1)).cast("double") <= 0.05).as("fp_rate_bounded")))
      },
      Some("SELECT true AS no_false_negatives, true AS fp_rate_bounded")),
    Q(
      "qd22_verified_pairs",
      // the candidate-VERIFICATION stage every production LSH pipeline
      // ends with: portable-MinHash candidates re-scored by EXACT
      // 5-char-shingle Jaccard (the same shingle universe the
      // signatures estimate), `confirmed` when the exact value clears
      // the threshold the estimate claimed. Shingle arrays join only
      // onto the CANDIDATE pairs (bounded by the banded join), never
      // all pairs; the intersect is the sorted-merge native kernel.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val cand = graft.operators.dedup.PortableMinHash.pairs(
          docs, col("text"), col("doc_id"), 0.25)
        val sh = docs.select(col("doc_id"),
          sort_array(graft.operators.TextOps.charShingles(col("text"), 5))
            .as("sh"))
        cand
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
          .withColumn("jaccard",
            graft.operators.PortableRound.floorTo(
              NGramJaccard.jaccardSorted(col("sha"), col("shb")), 4))
          .withColumn("confirmed", col("jaccard") >= 0.25)
          .select("doc_a", "doc_b", "est_jaccard", "jaccard", "confirmed")
      },
      Some {
        val mh = graft.operators.dedup.PortableMinHash.pipelineCtes()
        s"""$mh,
           |shg AS (SELECT doc_id,
           |          list_distinct(list_transform(
           |            range(1, greatest(length(nt) - 4, 1) + 1),
           |            i -> substring(nt, i, 5))) AS sh
           |        FROM n),
           |cd AS (SELECT doc_a, doc_b, est_jaccard FROM est
           |       WHERE est_jaccard >= 0.25),
           |jx AS (SELECT cd.doc_a, cd.doc_b, cd.est_jaccard,
           |              len(list_intersect(sa.sh, sb.sh))::BIGINT AS i,
           |              (len(sa.sh)::BIGINT + len(sb.sh)::BIGINT
           |               - len(list_intersect(sa.sh, sb.sh))::BIGINT) AS u
           |       FROM cd JOIN shg sa ON cd.doc_a = sa.doc_id
           |                 JOIN shg sb ON cd.doc_b = sb.doc_id)
           |SELECT doc_a, doc_b, est_jaccard,
           |       ${graft.operators.PortableRound.floorToSql(
                      "CASE WHEN u = 0 THEN 1.0 ELSE CAST(i AS DOUBLE) / CAST(u AS DOUBLE) END", 4)}
           |         AS jaccard,
           |       ${graft.operators.PortableRound.floorToSql(
                      "CASE WHEN u = 0 THEN 1.0 ELSE CAST(i AS DOUBLE) / CAST(u AS DOUBLE) END", 4)}
           |         >= 0.25 AS confirmed
           |FROM jx""".stripMargin
      }),
    Q(
      "qd23_dedup_dashboard",
      // per-source corpus health: doc counts, exact-dup rate (1 −
      // distinct-normalized-texts / docs) and within-source near-dup
      // pair counts — the dashboard a curation run reports per crawl
      // domain before anyone decides caps or mixing weights. Exact
      // side is two narrow aggregations; the pair side reuses the
      // banded portable-MinHash join, grouped where both endpoints
      // share the source.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val ex = docs
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(graft.operators.TextOps.normalized(col("text")))
              .as("n_unique"))
          .withColumn("exact_dup_rate",
            graft.operators.PortableRound.floorTo(
              lit(1.0) - col("n_unique").cast("double")
                / col("n_docs").cast("double"), 4))
        val src = docs.select(col("doc_id"), col("source"))
        val nd = graft.operators.dedup.PortableMinHash
          .pairs(docs, col("text"), col("doc_id"), 0.3)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .filter(col("sa") === col("sb"))
          .groupBy(col("sa").as("source"))
          .agg(count(lit(1)).as("near_dup_pairs"))
        ex.join(nd, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("n_unique"),
            col("exact_dup_rate"),
            coalesce(col("near_dup_pairs"), lit(0L)).as("near_dup_pairs"))
      },
      Some {
        val mh = graft.operators.dedup.PortableMinHash.pipelineCtes()
        s"""$mh,
           |ex AS (
           |  SELECT source, count(*) AS n_docs,
           |         count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           |           AS n_unique
           |  FROM documents GROUP BY source),
           |nd AS (
           |  SELECT da.source, count(*) AS near_dup_pairs
           |  FROM est JOIN documents da ON est.doc_a = da.doc_id
           |           JOIN documents db ON est.doc_b = db.doc_id
           |  WHERE est.est_jaccard >= 0.3 AND da.source = db.source
           |  GROUP BY da.source)
           |SELECT ex.source, n_docs, n_unique,
           |       ${graft.operators.PortableRound.floorToSql(
                      "1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE)", 4)} AS exact_dup_rate,
           |       coalesce(nd.near_dup_pairs, 0) AS near_dup_pairs
           |FROM ex LEFT JOIN nd ON ex.source = nd.source""".stripMargin
      }),
    Q(
      "qd24_lsh_planner",
      // the LSH tuning CONTRACT as a gate (qs22's pattern, for the
      // banding): for each target Jaccard the planner must (a) pick
      // the divisor pair whose S-curve threshold is the grid optimum,
      // and (b) yield a usable S-curve — collision probability
      // separating ±0.15 around the target by > 0.25, the property
      // that makes "threshold" a real knob rather than folklore. A
      // banding asymmetry bug (r and b swapped, off-by-one slice)
      // flattens the curve and fails (b) long before any fixture
      // query notices.
      (s, dir) => {
        import s.implicits._
        import graft.operators.dedup.MinHashLSH
        val nh = 48
        def ok(t: Double): Boolean = {
          val p = MinHashLSH.planBands(nh, t)
          val gridBest = (1 to nh).filter(nh % _ == 0)
            .map(b => math.abs(MinHashLSH.bandThreshold(b, nh / b) - t)).min
          val argminOk =
            math.abs(MinHashLSH.bandThreshold(p.bands, p.rows) - t) == gridBest
          val sep =
            MinHashLSH.collisionProb(math.min(t + 0.15, 0.99), p.bands, p.rows) -
              MinHashLSH.collisionProb(math.max(t - 0.15, 0.01), p.bands, p.rows)
          argminOk && sep > 0.25 && p.bands * p.rows == nh
        }
        Seq((ok(0.3), ok(0.5), ok(0.7))).toDF(
          "plan_03_ok", "plan_05_ok", "plan_07_ok")
      },
      Some("SELECT true AS plan_03_ok, true AS plan_05_ok, true AS plan_07_ok")),
    Q(
      "qd25_containment_dedup",
      // qd21's pairs turned into a retention policy: the SMALLER side
      // of every qualifying containment pair is dropped (the quoted
      // excerpt dies, the quoting page survives; equal sizes keep the
      // lower id). Per-pair, not transitive — oracle-expressible as
      // one CASE over pairs instead of a fixed point. Capless-oracle
      // caveat as qd07: above DefaultMaxGramFreq the Spark side scores
      // filtered gram sets, and a pure-boilerplate excerpt (ALL its
      // grams flooded) is retained — flood-text removal is
      // LineDedup/SpanDedup's job, not containment's.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        NGramJaccard
          .dropContained(docs, col("text"), "doc_id", col("source"),
            col("n_chars"), n = 2, threshold = 0.25)
          .select("doc_id")
      },
      Some {
        val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        val grams =
          s"""list_distinct(list_transform(
             |  range(1, greatest(len(string_split($norm, ' ')) - 1, 1) + 1),
             |  i -> list_aggregate(list_slice(string_split($norm, ' '), i, i + 1),
             |                      'string_agg', ' ')))""".stripMargin
        val cont =
          "len(list_intersect(a.grams, b.grams))::DOUBLE / least(len(a.grams), len(b.grams))::DOUBLE"
        s"""WITH g AS (SELECT doc_id, source, $grams AS grams FROM documents),
           |pairs AS (
           |  SELECT a.doc_id AS ia, b.doc_id AS ib,
           |         sa.n_chars AS za, sb.n_chars AS zb
           |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
           |  JOIN documents sa ON sa.doc_id = a.doc_id
           |  JOIN documents sb ON sb.doc_id = b.doc_id
           |  WHERE $cont >= 0.25),
           |victims AS (
           |  SELECT DISTINCT CASE WHEN za < zb THEN ia
           |                       WHEN zb < za THEN ib
           |                       ELSE ib END AS v
           |  FROM pairs)
           |SELECT doc_id FROM documents
           |WHERE doc_id NOT IN (SELECT v FROM victims)""".stripMargin
      }),
    Q(
      "qd26_cluster_size_histogram",
      // "how much duplication is there, and in what shape": the
      // distribution of near-dup cluster sizes — a corpus dominated
      // by size-1 components is clean, a fat tail of big clusters
      // means boilerplate floods. Two exact-count aggregates over
      // qd16's component labels; the transitive-closure oracle nests
      // as a subquery.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val edges = PortableMinHash.pairs(docs, col("text"), col("doc_id"), 0.3)
        ConnectedComponents.components(edges, "doc_a", "doc_b", docs, "doc_id")(s)
          .groupBy("component")
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_components"))
      },
      Some(s"""SELECT cluster_size, count(*) AS n_components
              |FROM (SELECT component, count(*) AS cluster_size
              |      FROM (${PortableMinHash.oracleComponentsSql(0.3)}) c
              |      GROUP BY component) s
              |GROUP BY cluster_size""".stripMargin)),
    Q(
      "qd28_source_overlap_sketch",
      // qd27's estimated sibling: pairwise source 3-gram overlap by
      // inclusion-exclusion on merged PortableHll sketches — at scale
      // the exact matrix shuffles every fingerprint, the sketch path
      // reads 20 tiny register tables and never joins corpus to
      // corpus. The exact side here is the verification gate (the
      // PortableCms.profile pattern); the contract is union-relative
      // error (the known inclusion-exclusion weakness on small true
      // intersections), every double value-oracled bit-for-bit.
      (s, dir) =>
        graft.operators.text.PortableHll.overlapProfile(
          Tables.load(s, dir, "documents"),
          col("text"), unionRelBound = 0.15),
      Some(graft.operators.text.PortableHll.oracleOverlapSql(0.15))),
    Q(
      "qd29_source_divergence",
      // qd27/qd28 measure how much two sources literally SHARE; this
      // measures how differently they WRITE: pairwise Jensen-Shannon
      // divergence between per-source hashed-unigram multinomials
      // (the DSIR model shape). Low-JS pairs are near-duplicate
      // sources, high-JS pairs the diversity a mixture design wants
      // balanced. Pair stage runs on (sources x buckets) tables whose
      // size is set by the SOURCE count, never the corpus. Per-bucket
      // JS terms are nano-nat-floored integer sums (value-oracled;
      // bias < B*1e-9 nats).
      (s, dir) =>
        graft.operators.text.SourceDivergence.jsMatrix(
          Tables.load(s, dir, "documents"), col("text"), col("source"),
          buckets = 512, smoothing = 1L),
      Some(graft.operators.text.SourceDivergence.oracleSql(512, 1L))),
    Q(
      "qd30_fuzzy_link",
      // cross-corpus fuzzy RECORD LINKAGE (the two-table face of the
      // near-dup machinery): corpus B is a perturbed twin of every
      // 5th document (suffix appended, ids offset by 1e6); the banded
      // portable-MinHash join links each perturbed record back to its
      // original WITHOUT ever comparing all pairs. Only cross-side
      // pairs are reported -- within-side duplicates are qd10's job.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        // the id offset derives from the DATA (max id + 1), so the
        // side split can never collide with real ids at any sf — a
        // hardcoded offset would silently misclassify originals once
        // the fixture outgrew it (one bounded driver value, the qs02
        // probe pattern)
        val off = docs.agg(max("doc_id")).head().getLong(0) + 1L
        val perturbed = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(off)).as("doc_id"),
            concat(col("text"), lit(" linkage probe suffix")).as("text"))
        graft.operators.dedup.PortableMinHash.pairs(
            docs.unionByName(perturbed), col("text"), col("doc_id"),
            threshold = 0.5)
          .where(col("doc_a") < lit(off) && col("doc_b") >= lit(off))
          .select(col("doc_a").as("id_a"),
            (col("doc_b") - lit(off)).as("id_b"),
            col("est_jaccard"))
      },
      Some {
        val lsh = graft.operators.dedup.PortableMinHash.pipelineCtes("u")
          .replaceFirst("^WITH ", "")
        s"""WITH offs AS (SELECT max(doc_id) + 1 AS o FROM documents),
           |pert AS (
           |  SELECT doc_id + offs.o AS doc_id,
           |         text || ' linkage probe suffix' AS text
           |  FROM documents, offs WHERE doc_id % 5 = 0),
           |u AS (SELECT doc_id, text FROM documents
           |      UNION ALL SELECT doc_id, text FROM pert),
           |$lsh
           |SELECT doc_a AS id_a,
           |       CAST(doc_b - offs.o AS BIGINT) AS id_b, est_jaccard
           |FROM est, offs
           |WHERE est_jaccard >= 0.5
           |  AND doc_a < offs.o AND doc_b >= offs.o""".stripMargin
      }),

    Q(
      "qd31_corpus_diff",
      // the release-to-release content diff (compare --content at
      // corpus scale): v1 = documents, v2 = the deterministic
      // drop/edit/re-ingest derivation, diffed by md5 digest — only
      // (id, digest, length) ever shuffles, payload bytes stay put;
      // output is the 4-status release summary
      (s, dir) => {
        val docs = graft.Tables.load(s, dir, "documents")
        graft.operators.dedup.CorpusDiff.diff(
          docs, graft.operators.dedup.CorpusDiff.syntheticV2(docs),
          col("doc_id"), col("text"))
      },
      Some(graft.operators.dedup.CorpusDiff.oracleDiffSql(
        graft.operators.dedup.CorpusDiff.syntheticV2Sql)),
      bench = true),

    Q(
      "qd32_unicode_dedup",
      // the leak qt60's expressions exist to close, end to end: every
      // doc_id % 5 doc re-enters under a fresh id with its suffix
      // respelled in DECOMPOSED Unicode (different bytes, identical
      // rendering) — byte-keyed qd01 would keep both; keying the group
      // by nfc() collapses each twin onto its original (n_spellings =
      // 2 exactly there), value-oracled against DuckDB nfc_normalize
      (s, dir) => {
        val docs = graft.Tables.load(s, dir, "documents")
        val a = docs.select(col("doc_id"),
          concat(col("text"), lit(" Caf\u00e9")).as("t2"))
        val b = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
            concat(col("text"), lit(" Cafe\u0301")).as("t2"))
        a.unionByName(b)
          .groupBy(graft.functions.UnicodeFns.nfc(col("t2")).as("k"))
          .agg(min("doc_id").as("doc_id"),
            count(lit(1)).as("n_spellings"))
          .select("doc_id", "n_spellings")
      },
      Some("""WITH a AS (
             |  SELECT doc_id, text || ' Caf' || chr(233) AS t2
             |  FROM documents),
             |b AS (
             |  SELECT doc_id + 1000000000 AS doc_id,
             |         text || ' Cafe' || chr(769) AS t2
             |  FROM documents WHERE doc_id % 5 = 0),
             |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
             |SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_spellings
             |FROM u GROUP BY nfc_normalize(t2)""".stripMargin)),

    Q(
      "qd33_threshold_curve",
      // the dedup THRESHOLD measured, not assumed (qs36's tuning-curve
      // discipline applied to near-dup): candidate pairs and affected
      // docs per Jaccard threshold over the portable MinHash — the
      // banded candidate set is threshold-independent, so the whole
      // curve derives from ONE pairs run behind a Barrier; each row
      // is a filter + two tiny aggregates. Thresholds compare exact
      // identical doubles (est = i/48) in both engines.
      (s, dir) => {
        val p = graft.operators.Barrier(
          graft.operators.dedup.PortableMinHash.pairs(
            Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
            threshold = 0.2))
        Seq(200, 400, 600, 800).map { tm =>
          val f = p.filter(col("est_jaccard") >= lit(tm / 1000.0))
          f.agg(count(lit(1)).as("n_pairs"))
            .crossJoin(
              f.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
                .agg(count_distinct(col("d")).as("n_docs")))
            .select(lit(tm).as("threshold_milli"),
              col("n_pairs"), col("n_docs"))
        }.reduce(_ unionByName _)
      },
      Some {
        val rows = Seq(200, 400, 600, 800).map { tm =>
          val t = tm / 1000.0
          s"""SELECT $tm AS threshold_milli,
             |  (SELECT count(*) FROM est WHERE est_jaccard >= $t)::BIGINT
             |    AS n_pairs,
             |  (SELECT count(DISTINCT d) FROM (
             |     SELECT doc_a AS d FROM est WHERE est_jaccard >= $t
             |     UNION ALL
             |     SELECT doc_b FROM est WHERE est_jaccard >= $t) z)::BIGINT
             |    AS n_docs""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""${graft.operators.dedup.PortableMinHash.pipelineCtes()}
           |$rows""".stripMargin
      }),

    Q(
      "qd34_fuzzy_decontaminate",
      // fuzzy (near-dup) benchmark decontamination — the MinHash leg
      // of the decon trio (qt15 exact 8-gram, qs16 embedding): a train
      // doc is contaminated when it's a near-duplicate (est Jaccard >=
      // 0.5 over the portable MinHash) of ANY test-bucket doc; the
      // eval side's banded signatures broadcast into ONE corpus band
      // scan (the qd19 incremental shape), per-train-doc rollup
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sp = graft.operators.text.CorpusOps.splitAssign(col("doc_id"))
        graft.operators.text.Decontaminate.fuzzyProfile(
          docs.filter(sp === "train"), docs.filter(sp === "test"),
          col("text"), col("doc_id"), threshold = 0.5)
      },
      Some(graft.operators.text.Decontaminate.oracleFuzzySql(0.5)),
      bench = true),

    Q(
      "qd35_soft_dedup_weights",
      // soft dedup: keep every doc, downweight duplicates — sampling
      // weight = 1/cluster_size over the qd16 near-dup components, as
      // order-free integer milli units (weight + effective chars); the
      // weighting adds ONE algebraic component-count aggregate + a join
      // back on top of the already-bounded pair mining / CC
      (s, dir) => SoftDedup.weights(
        Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
        col("n_chars"), threshold = 0.3)(s),
      Some(PortableMinHash.oracleSoftWeightsSql(0.3))),

    Q(
      "qd36_banding_recall_curve",
      // the LSH banding knob MEASURED (qd24 predicts it from the
      // S-curve; this measures it on the corpus): per band count,
      // candidate-join cost vs >= 0.3 near-dup pairs recovered, recall
      // relative to the most sensitive banding — signatures computed
      // once behind a Barrier, each row one ids-only bucket join
      (s, dir) => PortableMinHash.bandingCurve(
        Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
        threshold = 0.3, bandCounts = Seq(6, 12, 24)),
      Some(PortableMinHash.bandingCurveSql(0.3, Seq(6, 12, 24))))
  )
}
