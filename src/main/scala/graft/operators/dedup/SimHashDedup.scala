package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.simhash64
import graft.operators.TextOps

/** SimHash near-duplicate detection: one 64-bit fingerprint per
  * document (via the codegen'd [[graft.functions.SimHash64]]
  * expression), banded into 16-bit keys for the bucket join, candidate
  * pairs confirmed by Hamming distance (`bit_count(a ^ b)`).
  *
  * Why both MinHash and SimHash exist here: MinHash estimates set
  * (Jaccard) similarity and needs k hashes; SimHash is one long per
  * doc — 8 bytes of shuffle state — and catches small edits. With
  * maxHamming = h and 4 bands of 16 bits, any pair within h <= 3 bits
  * shares at least one identical band (pigeonhole), so recall is exact
  * for h <= 3.
  */
object SimHashDedup {

  def fingerprint(text: Column): Column = simhash64(TextOps.tokens(text))

  def fingerprints(df: DataFrame, text: Column, id: Column): DataFrame =
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), fingerprint(text).as("sh"))

  /** Pairs (id_a < id_b) with Hamming distance <= maxHamming. */
  def candidatePairs(df: DataFrame, text: Column, id: Column, maxHamming: Int = 3): DataFrame = {
    // materialized before the self-join so the per-doc fingerprint is
    // computed once, not once per candidate pair; localCheckpoint so the
    // blocks are freed when the result is dropped (see MinHashLSH)
    val fps = fingerprints(df, text, id).transform(Barrier.apply)
    val banded = fps.select(
      col("id"),
      col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---- DuckDB oracles: the PRODUCTION FNV-1a family, bit-exact ----
  //
  // FNV-1a's 64-bit wraparound arithmetic is re-derived in HUGEINT:
  // the state h stays in [0, 2^64); XOR-with-byte touches only the low
  // 8 bits (h - h%256 + xor(h%256, b)); the x1b3-prime multiply splits
  // into 32-bit limbs so no intermediate exceeds 2^127:
  //   h*p mod 2^64 = (h0*p + ((h1*p) mod 2^32)*2^32) mod 2^64.
  // The per-token fold seeds list_reduce by PREPENDING the offset
  // basis (no initial-value arg in DuckDB 1.0). ord() = UTF-8 byte for
  // the ASCII fixture corpus (the kernel hashes UTF-8 bytes; identical
  // on ASCII). Powers of two up to 2^63 are exact doubles, so
  // CAST(power(2, b) AS HUGEINT) is an exact bit mask.

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  private def fnvStep: String = {
    val g = "(h - h % 256 + xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)))"
    s"""(
       |        ($g % 4294967296) * 1099511628211
       |        + ((($g // 4294967296) * 1099511628211) % 4294967296) * 4294967296
       |      ) % 18446744073709551616""".stripMargin
  }

  /** CTEs ending in `shfp(doc_id, ufp)` — the unsigned 64-bit SimHash
    * per document under the production FNV-1a token hash. */
  private def fingerprintCtes: String =
    s"""shtoks AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
       |  FROM documents),
       |shth AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |      list_transform(range(1, len(tok) + 1),
       |        i -> CAST(ord(substring(tok, i, 1)) AS HUGEINT))),
       |    (h, b) -> ${fnvStep}) AS h
       |  FROM shtoks),
       |shvotes AS (
       |  SELECT doc_id, bt.bit AS bit,
       |         sum(CASE WHEN (h // CAST(power(2, bt.bit) AS HUGEINT)) % 2 = 1
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM shth, unnest(range(0, 64)) AS bt(bit)
       |  GROUP BY doc_id, bt.bit),
       |shfp AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN v > 0 THEN CAST(power(2, bit) AS HUGEINT)
       |                  ELSE CAST(0 AS HUGEINT) END) AS ufp
       |  FROM shvotes GROUP BY doc_id)""".stripMargin

  private val toSigned =
    """CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
      |          THEN ufp - CAST('18446744073709551616' AS HUGEINT)
      |          ELSE ufp END AS BIGINT)""".stripMargin

  /** qd05 oracle: (doc_id, simhash) with the signed-Long convention. */
  def oracleFingerprintsSql: String =
    s"""WITH ${fingerprintCtes}
       |SELECT doc_id, $toSigned AS simhash FROM shfp""".stripMargin

  /** qd06 oracle: the identical 4×16-bit banding, bucket self-join,
    * pair dedup and popcount filter over the FNV fingerprints. */
  def oraclePairsSql(maxHamming: Int): String =
    s"""WITH ${fingerprintCtes},
       |sgn AS (SELECT doc_id, $toSigned AS sh FROM shfp),
       |banded AS (
       |  SELECT doc_id, sh, bd.band AS band,
       |         CAST((ufp // CAST(power(2, 16 * bd.band) AS HUGEINT)) % 65536 AS BIGINT) AS bkey
       |  FROM shfp JOIN sgn USING (doc_id), unnest(range(0, 4)) AS bd(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                  a.sh AS sh_a, b.sh AS sh_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sh_a, sh_b)) <= $maxHamming""".stripMargin
}
