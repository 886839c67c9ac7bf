package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.dedup._

/** Deduplication operator inventory over the `documents` /
  * `embeddings` corpora. Exact variants are DuckDB-oracled; the
  * sketch-based ones (MinHash, SimHash, hyperplane LSH) are not
  * SQL-expressible and get the rows-only check, with value-level
  * assertions living in DedupSpec.
  */
object DedupQueries {

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
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        MinHashLSH
          .candidatePairs(docs, col("text"), col("doc_id"),
            MinHashLSH.Params(shingleSize = 5, numHashes = 48, bands = 12, threshold = 0.3))
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            round(col("est_jaccard"), 4).as("est_jaccard"))
      },
      None,
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
      None),
    Q(
      "qd05_simhash_fingerprints",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        SimHashDedup
          .fingerprints(docs, col("text"), col("doc_id"))
          .select(col("id").as("doc_id"), col("sh").as("simhash"))
      },
      None),
    Q(
      "qd06_simhash_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        SimHashDedup
          .candidatePairs(docs, col("text"), col("doc_id"), maxHamming = 16)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      },
      None),
    Q(
      "qd07_ngram_jaccard_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        NGramJaccard
          .pairsWithinBlock(docs, col("text"), col("doc_id"), col("source"),
            n = 2, threshold = 0.12)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            round(col("jaccard"), 4).as("jaccard"))
      },
      // exact token-2-gram Jaccard is SQL-expressible: build the same
      // distinct-gram sets in DuckDB list functions; int/int division
      // through DOUBLE matches Spark's cast order bit-for-bit
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
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, round($jac, 4) AS jaccard
           |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE $jac >= 0.12""".stripMargin
      }),
    Q(
      "qd09_source_signature",
      (s, dir) => {
        // corpus-level sketch: element-wise-min merge of per-doc MinHash
        // signatures per source (partial+final aggregation via the typed
        // Aggregator — the merged sig estimates Jaccard of shingle UNIONS)
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
          .select(col("source"), xxhash64(col("group_sig")).as("sig_hash"))
      },
      None),
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
      "qd08_embedding_dup_pairs",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        // fixture embeddings are near-orthogonal (max pairwise cosine
        // ~0.48), so the "near-dup" threshold is set where pairs exist
        EmbeddingDedup
          .candidatePairs(emb, col("embedding"), col("vec_id"), dim = 64,
            threshold = 0.35, nbits = 4, numTables = 4)
          .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
            round(col("cosine"), 4).as("cosine"))
      },
      None)
  )
}
