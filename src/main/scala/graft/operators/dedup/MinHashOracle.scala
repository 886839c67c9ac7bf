package graft.operators.dedup

/** DuckDB oracle SQL for the PRODUCTION MinHash family
  * ([[graft.functions.MinHashSignature]]: FNV-1a 64 per byte shingle,
  * splitmix64(h + i·golden) per signature slot) — the re-derivation that
  * graduated qd03/qd04/qd09/qd18 off the rows-only list in round 13.
  *
  * Why this is affordable where the naive fold was "minutes per run"
  * (SURVEY.md round-10 adjudication): the hash family is evaluated once
  * per DISTINCT shingle in plain vectorized column arithmetic
  * (materialized CTEs, one splitmix64 stage per CTE), not per shingle
  * OCCURRENCE inside per-row list lambdas. Distinct shingles are
  * vocabulary-bounded, so the cost curve flattens with scale: 2.8 s at
  * sf0.01 and 7.5 s at sf0.1 for the full pair pipeline (measured),
  * against ~150 k / ~1.5 M shingle occurrences.
  *
  * 64-bit wraparound arithmetic rides the established HUGEINT limb
  * patterns (see [[SimHashDedup]]'s FNV fold):
  *   - mul64(a,c) = (a₀·c + ((a₁·c) mod 2³²)·2³²) mod 2⁶⁴ — no
  *     intermediate exceeds 2⁹⁷ < 2¹²⁷;
  *   - xor64 splits into two 32-bit limbs (BIGINT xor is exact there);
  *   - unsigned shift right = integer division by 2ˢ;
  *   - signed Long order (Spark's min) restored by the 2⁶⁴ two's-
  *     complement CASE before min().
  *
  * One DOCUMENTED divergence from the Spark plan: Spark bands by
  * xxhash64 over the 4-long signature slice; the oracle bands by the
  * slice VALUE itself (a string key). Equal slices collide in both
  * engines; they differ only if two UNEQUAL slices xxhash64-collide
  * (p ≈ 2⁻⁶⁴ per bucket pair) — the value key is the semantically
  * exact grouping, the hash is its 100 TB-side compression. The
  * maxBucket cap is replicated on the oracle side over the same
  * membership, so cap engagement stays engine-identical (the qm14
  * discipline: a capped operator never gets a capless oracle).
  *
  * ASCII-fixture assumption (the [[SimHashDedup]] contract, inherited
  * here): the oracle shingles by DuckDB substring/len — CHARACTERS —
  * and FNV-folds ord() CODEPOINTS, while the production kernel slides
  * a byte window over UTF-8 bytes and folds each byte. The two agree
  * exactly iff every character is single-byte (ord = UTF-8 byte), which
  * the ASCII fixture corpus guarantees; non-ASCII text would make this
  * gate report a false divergence, not a real one. A byte-exact oracle
  * would need encode()-derived byte lists per shingle — deliberately
  * not paid while the fixtures are ASCII (round-13 review).
  */
object MinHashOracle {

  private val M64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val H63 = "CAST('9223372036854775808' AS HUGEINT)"

  private def xor64(a: String, b: String): String =
    s"""(CAST(xor(CAST(($a) // 4294967296 AS BIGINT), CAST(($b) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       | + CAST(xor(CAST(($a) % 4294967296 AS BIGINT), CAST(($b) % 4294967296 AS BIGINT)) AS HUGEINT))""".stripMargin

  private def mul64(a: String, c: String): String =
    s"""(((($a) % 4294967296) * $c
       | + (((($a) // 4294967296) * $c) % 4294967296) * 4294967296) % $M64)""".stripMargin

  // FNV-1a step over HUGEINT state h and byte b — the SimHashDedup
  // pattern (xor touches only the low 8 bits; prime multiply in limbs)
  private def fnvStep: String = {
    val g = "(h - h % 256 + xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)))"
    s"""((($g) % 4294967296) * 1099511628211
       | + (((($g) // 4294967296) * 1099511628211) % 4294967296) * 4294967296) % $M64""".stripMargin
  }

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** CTEs ending in `mh_el(doc_id, i, v)` — signature element i of each
    * document under the production family (signed-Long convention).
    * splitmix64's five stages run as five materialized CTEs so each is
    * one vectorized projection over (distinct shingle × k) rows. */
  def signatureCtes(p: MinHashLSH.Params): String = {
    val sh = p.shingleSize
    s"""mh_norm AS (SELECT doc_id, $normSql AS t FROM documents),
       |mh_sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, substring(t, CAST(w AS INT), $sh) AS g
       |  FROM mh_norm, unnest(range(1, greatest(len(t) - ${sh - 1}, 1) + 1)) AS win(w)),
       |mh_g AS MATERIALIZED (SELECT DISTINCT g FROM mh_sh),
       |mh_gh AS MATERIALIZED (
       |  SELECT g, list_reduce(
       |    list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |      list_transform(range(1, len(g) + 1),
       |        i -> CAST(ord(substring(g, i, 1)) AS HUGEINT))),
       |    (h, b) -> $fnvStep) AS h
       |  FROM mh_g),
       |mh_seed AS MATERIALIZED (
       |  SELECT g, CAST(ii.i AS INT) AS i,
       |         (h + ii.i * CAST('11400714819323198485' AS HUGEINT)) % $M64 AS x
       |  FROM mh_gh, unnest(range(0, ${p.numHashes})) AS ii(i)),
       |mh_x1 AS MATERIALIZED (SELECT g, i, ${xor64("x", "x // 1073741824")} AS x FROM mh_seed),
       |mh_x2 AS MATERIALIZED (SELECT g, i, ${mul64("x", "CAST('13787848793156543929' AS HUGEINT)")} AS x FROM mh_x1),
       |mh_x3 AS MATERIALIZED (SELECT g, i, ${xor64("x", "x // 134217728")} AS x FROM mh_x2),
       |mh_x4 AS MATERIALIZED (SELECT g, i, ${mul64("x", "CAST('10723151780598845931' AS HUGEINT)")} AS x FROM mh_x3),
       |mh_hv AS MATERIALIZED (
       |  SELECT g, i,
       |         CAST(CASE WHEN x >= $H63 THEN x - $M64 ELSE x END AS BIGINT) AS v
       |  FROM (SELECT g, i, ${xor64("x", "x // 2147483648")} AS x FROM mh_x4)),
       |mh_el AS MATERIALIZED (
       |  SELECT doc_id, i, min(v) AS v
       |  FROM mh_sh JOIN mh_hv USING (g)
       |  GROUP BY doc_id, i)""".stripMargin
  }

  /** `mh_band(doc_id, band, bkey)` — the slice-valued band key. */
  private def bandCte(p: MinHashLSH.Params): String =
    s"""mh_band AS MATERIALIZED (
       |  SELECT doc_id, CAST(i // ${p.rows} AS INT) AS band,
       |         string_agg(v::VARCHAR, ',' ORDER BY i) AS bkey
       |  FROM mh_el GROUP BY doc_id, i // ${p.rows})""".stripMargin

  /** CTEs ending in `mh_est(doc_a, doc_b, ej)` — the full
    * candidate-pair pipeline (band join, hot-bucket cap, signature
    * match fraction), mirroring [[MinHashLSH.candidatePairs]]. */
  def pairCtes(p: MinHashLSH.Params): String =
    s"""${signatureCtes(p)},
       |${bandCte(p)},
       |mh_hot AS (SELECT band, bkey FROM mh_band
       |           GROUP BY band, bkey HAVING count(*) > ${p.maxBucket}),
       |mh_capped AS (SELECT b.* FROM mh_band b ANTI JOIN mh_hot h USING (band, bkey)),
       |mh_cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM mh_capped a JOIN mh_capped b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |mh_est AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b,
       |         (count(*) FILTER (WHERE ea.v = eb.v))::DOUBLE / ${p.numHashes}.0 AS ej
       |  FROM mh_cand c
       |  JOIN mh_el ea ON ea.doc_id = c.doc_a
       |  JOIN mh_el eb ON eb.doc_id = c.doc_b AND eb.i = ea.i
       |  GROUP BY c.doc_a, c.doc_b)""".stripMargin

  /** qd03: confirmed pairs at `threshold`, est floored to 4 places. */
  def oraclePairsSql(p: MinHashLSH.Params): String =
    s"""WITH ${pairCtes(p)}
       |SELECT doc_a, doc_b, floor(ej * 10000.0) / 10000.0 AS est_jaccard
       |FROM mh_est WHERE ej >= ${p.threshold}""".stripMargin

  /** qd04: keep-first survivors (drop every id_b of a confirmed pair). */
  def oracleDedupSql(p: MinHashLSH.Params): String =
    s"""WITH ${pairCtes(p)}
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_b FROM mh_est WHERE ej >= ${p.threshold})""".stripMargin

  /** qd18: increment (odd ids) vs persisted index (even ids) — hot
    * buckets computed from the CORPUS side only, exactly as
    * [[MinHashLSH.buildIndex]] precomputes them. */
  def oracleIncrementalSql(p: MinHashLSH.Params): String =
    s"""WITH ${signatureCtes(p)},
       |${bandCte(p)},
       |mh_hot AS (SELECT band, bkey FROM mh_band WHERE doc_id % 2 = 0
       |           GROUP BY band, bkey HAVING count(*) > ${p.maxBucket}),
       |mh_new AS (SELECT b.* FROM mh_band b ANTI JOIN mh_hot h USING (band, bkey)
       |           WHERE b.doc_id % 2 = 1),
       |mh_cand AS MATERIALIZED (
       |  SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
       |  FROM mh_band o JOIN mh_new n ON o.band = n.band AND o.bkey = n.bkey
       |  WHERE o.doc_id % 2 = 0),
       |mh_est AS (
       |  SELECT c.doc_new, c.doc_old,
       |         (count(*) FILTER (WHERE ea.v = eb.v))::DOUBLE / ${p.numHashes}.0 AS ej
       |  FROM mh_cand c
       |  JOIN mh_el ea ON ea.doc_id = c.doc_new
       |  JOIN mh_el eb ON eb.doc_id = c.doc_old AND eb.i = ea.i
       |  GROUP BY c.doc_new, c.doc_old)
       |SELECT doc_new, doc_old, floor(ej * 10000.0) / 10000.0 AS est_jaccard
       |FROM mh_est WHERE ej >= ${p.threshold}""".stripMargin

  /** qd09: per-source merged signature, exploded to (source, i, sig_el)
    * scalar rows. Element-wise min over per-doc signatures == min over
    * all the source's (shingle, i) hash values, which is what the
    * [[graft.functions.MinHashMerge]] Aggregator computes. */
  def oracleSourceSignatureSql(p: MinHashLSH.Params): String =
    s"""WITH ${signatureCtes(p)}
       |SELECT d.source, e.i, min(e.v) AS sig_el
       |FROM mh_el e JOIN documents d USING (doc_id)
       |GROUP BY d.source, e.i""".stripMargin
}
