package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.RollingMinHash
import graft.operators.TextOps
import graft.operators.text.{CorpusOps, Decontaminate, PiiScrub, TextAnalysis, UnigramLm}

/** Text-analysis inventory over `documents`. These are all per-row
  * expressions, so (unlike aggregates over doubles) raw double outputs
  * are bit-identical to the oracle as long as the operation order
  * matches — the SQL strings below mirror the Scala expressions
  * operation for operation.
  */
object TextQueries {

  private def stops(l: Seq[String]): String =
    l.map(s => s"'$s'").mkString("[", ", ", "]")

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** qt02's per-row quality score, shared by the qt45 dataset card —
    * operation-ordered to match TextAnalysis.qualityScore exactly. */
  private def qualitySql: String =
    s"""least(CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.4
       |                      + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |                                     / CAST(greatest(length(text), 1) AS DOUBLE) * 10.0, 1.0)) * 0.2
       |                      + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |                                     / CAST(greatest(length(text), 1) AS DOUBLE) * 10.0, 1.0)) * 0.2
       |                      + least(CAST(${hitsSql(TextAnalysis.stopEn)} AS DOUBLE)
       |                              / greatest(CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.2""".stripMargin
  private def hitsSql(list: Seq[String]): String =
    s"length(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
      s"t -> list_contains(${stops(list)}, t)))"

  val all: Seq[Q] = Seq(
    Q(
      "qt01_token_stats",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_tokens_bpe"),
          TextAnalysis.charCount(col("text")).as("n_chars_calc"),
          TextAnalysis.byteCount(col("text")).as("n_bytes")),
      Some("""SELECT doc_id,
                     length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe,
                     length(text) AS n_chars_calc,
                     octet_length(encode(text)) AS n_bytes
              FROM documents"""),
      bench = true),
    Q(
      "qt02_quality_score",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.punctCount(col("text")).as("n_punct"),
          TextAnalysis.digitCount(col("text")).as("n_digit"),
          TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopEn).as("en_stop_hits"),
          TextAnalysis.qualityScore(col("text")).as("quality")),
      Some(s"""SELECT doc_id,
                      length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
                      length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                      ${hitsSql(TextAnalysis.stopEn)} AS en_stop_hits,
                      $qualitySql AS quality
               FROM documents""")),
    Q(
      "qt03_lang_id",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          col("lang").as("lang_label"),
          TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopEn).as("en_hits"),
          TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopDe).as("de_hits"),
          TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopFr).as("fr_hits"),
          TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopEs).as("es_hits"),
          TextAnalysis.langGuess(col("text")).as("lang_pred")),
      Some(s"""SELECT doc_id, lang AS lang_label, en_hits, de_hits, fr_hits, es_hits,
                      CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                           WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                           WHEN fr_hits >= es_hits THEN 'fr'
                           ELSE 'es' END AS lang_pred
               FROM (SELECT doc_id, lang,
                            ${hitsSql(TextAnalysis.stopEn)} AS en_hits,
                            ${hitsSql(TextAnalysis.stopDe)} AS de_hits,
                            ${hitsSql(TextAnalysis.stopFr)} AS fr_hits,
                            ${hitsSql(TextAnalysis.stopEs)} AS es_hits
                     FROM documents) x""")),
    Q(
      "qt04_fingerprints",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.md5Fingerprint(col("text")).as("fp_md5"),
          TextAnalysis.sha256Fingerprint(col("text")).as("fp_sha256")),
      Some(s"""SELECT doc_id, md5($normSql) AS fp_md5, sha256($normSql) AS fp_sha256
               FROM documents""")),
    Q(
      "qt05_rolling_fingerprint",
      // the PRODUCTION wraparound polynomial hash, now value-oracled:
      // DuckDB re-derives the mod-2^64 prefix-hash identity in HUGEINT
      // limb arithmetic (RollingMinHash.oracleSql) — no longer rows-only
      (s, dir) =>
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          RollingMinHash(TextOps.normalized(col("text")), 32).as("fp_rolling")),
      Some(RollingMinHash.oracleSql(32))),
    Q(
      "qt09_rolling_portable",
      (s, dir) =>
        // portable rolling fingerprint: min 5-char-window md5 hash —
        // the winnowing-style document fingerprint (qt05's wraparound
        // polynomial hash is ALSO value-oracled as of round 10 via the
        // HUGEINT prefix-hash identity; this md5 variant remains the
        // engine-portable primitive downstream composed oracles nest).
        // Native kernel: the interpreted HOF formulation
        // cost ~40 ms/doc (19.7 s verify at sf0.1)
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          graft.functions.MinWindowMd5(TextOps.normalized(col("text")))
            .as("fp_rolling")),
      Some("""SELECT doc_id,
                     CAST(list_min(list_transform(
                       range(1, greatest(length(nt) - 4, 1) + 1),
                       i -> CAST(('0x' || substring(md5(substring(nt, i, 5)), 1, 10)) AS BIGINT)))
                       AS BIGINT) AS fp_rolling
              FROM (SELECT doc_id,
                           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
                    FROM documents) x""")),
    Q(
      "qt06_lang_quality_agg",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
            sum(TextAnalysis.punctCount(col("text")).cast("long")).as("total_punct")),
      Some("""SELECT lang, count(*) AS n_docs,
                     CAST(sum(CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS total_tokens,
                     CAST(sum(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT)) AS BIGINT) AS total_punct
              FROM documents GROUP BY lang"""),
      bench = true),
    Q(
      "qt07_hash_split",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(CorpusOps.splitAssign(col("doc_id")).as("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text")).cast("long"))
              .cast("bigint").as("total_tokens")),
      Some("""SELECT CASE WHEN b < 80 THEN 'train'
                          WHEN b < 90 THEN 'validation'
                          ELSE 'test' END AS split,
                     count(*) AS n_docs,
                     CAST(sum(CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS total_tokens
              FROM (SELECT text,
                           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
                    FROM documents) x
              GROUP BY 1""")),
    Q(
      "qt08_token_binpack",
      (s, dir) => {
        val toks = TextAnalysis.tokenCount(col("text")).cast("long")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), toks.as("n_tokens"))
          .withColumn("bin",
            CorpusOps.packBins(col("n_tokens"), col("source"), col("doc_id"), 2048L))
          .groupBy("source", "bin")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("bigint").as("bin_tokens"))
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                       CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
                FROM documents
              ), b AS (
                SELECT source, n_tokens,
                       CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                                  / 2048) AS BIGINT) AS bin
                FROM t
              )
              SELECT source, bin, count(*) AS n_docs,
                     CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
              FROM b GROUP BY source, bin""")),
    Q(
      "qt10_stratified_sample", {
        // thresholds computed ONCE here and interpolated into both
        // engines' queries — single source of truth (portable-twin rule)
        (s, dir) => {
          val overThr = CorpusOps.sampleThreshold(1.0)
          val underThr = CorpusOps.sampleThreshold(0.05)
          val defThr = CorpusOps.sampleThreshold(0.3)
          val thr = when(col("source") === "src0", lit(overThr))
            .when(col("source") === "src1", lit(underThr))
            .otherwise(lit(defThr))
          Tables.load(s, dir, "documents")
            .where(CorpusOps.hashKey40(col("doc_id")) < thr)
            .select("doc_id", "source", "lang")
        }
      },
      Some {
        val overThr = CorpusOps.sampleThreshold(1.0)
        val underThr = CorpusOps.sampleThreshold(0.05)
        val defThr = CorpusOps.sampleThreshold(0.3)
        s"""SELECT doc_id, source, lang FROM documents
            WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
                  < CASE source WHEN 'src0' THEN $overThr
                                WHEN 'src1' THEN $underThr
                                ELSE $defThr END"""
      }),
    Q(
      "qt11_term_freq",
      // the canonical corpus word count: explode -> count -> top-k.
      // ORDER BY (n DESC, term) makes the limit deterministic under ties
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .groupBy("term")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term").asc)
          .limit(20),
      Some("""SELECT term, count(*) AS n
              FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
                    FROM documents) t
              GROUP BY term ORDER BY n DESC, term ASC LIMIT 20""")),
    Q(
      "qt12_repetition_ratio",
      // Gopher-style repetition quality signal: the most frequent
      // token's share of the document. Tie-break (n desc, term desc) is
      // a total order per doc, so the argmax row is deterministic; the
      // ratio is one int/int double division — bit-identical per row.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(
          col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("n").desc, col("term").desc)
        toks
          .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .join(
            docs.select(col("doc_id"),
              TextAnalysis.tokenCount(col("text")).as("n_tokens")),
            Seq("doc_id"))
          .select(
            col("doc_id"), col("term").as("top_term"), col("n").as("top_n"),
            col("n_tokens"),
            (col("n").cast("double") / col("n_tokens").cast("double"))
              .as("rep_ratio"))
      },
      Some("""WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
                FROM documents),
              c AS (SELECT doc_id, term, count(*) AS n FROM toks GROUP BY 1, 2),
              r AS (SELECT doc_id, term, n,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY n DESC, term DESC) AS rn
                    FROM c),
              l AS (SELECT doc_id,
                           CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
                    FROM documents)
              SELECT r.doc_id, term AS top_term, n AS top_n, n_tokens,
                     CAST(n AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS rep_ratio
              FROM r JOIN l ON r.doc_id = l.doc_id WHERE rn = 1""")),

    Q(
      "qt14_tfidf_top_terms",
      // TF-IDF signature terms per source: tf over the source's token
      // stream, idf = ln(N_docs / doc-frequency). The RANK runs on the
      // ROUNDED score, so a last-ulp ln() difference between engines
      // cannot reorder rows; rounded-score ties break by term. Corpus
      // size is computed in-plan (broadcast 1-row aggregate), not
      // driver-side.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val terms = docs.select(
          col("doc_id"), col("source"),
          explode(TextOps.tokens(col("text"))).as("term"))
        val tf = terms.groupBy("source", "term").agg(count(lit(1)).as("tf"))
        val dfd = terms.groupBy("term").agg(countDistinct("doc_id").as("dfd"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf
          .join(dfd, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            graft.operators.PortableRound.floorTo(col("tf") * log(col("n_docs").cast("double") / col("dfd")), 4))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("score").desc, col("term"))
        scored
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select("source", "term", "tf", "dfd", "score")
      },
      Some("""WITH nrm AS (SELECT doc_id, source,
                            regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
                          FROM documents),
              tk AS (SELECT doc_id, source, unnest(string_split(nt, ' ')) AS term
                     FROM nrm),
              tf AS (SELECT source, term, count(*) AS tf FROM tk GROUP BY 1, 2),
              dfd AS (SELECT term, count(DISTINCT doc_id) AS dfd FROM tk GROUP BY 1),
              n AS (SELECT count(*) AS n_docs FROM documents),
              sc AS (SELECT source, tf.term AS term, tf, dfd,
                            (floor((tf * ln(n_docs::DOUBLE / dfd)) * 10000.0) / 10000.0) AS score
                     FROM tf JOIN dfd ON tf.term = dfd.term, n),
              r AS (SELECT *, row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, term) AS rn
                    FROM sc)
              SELECT source, term, tf, dfd, score FROM r WHERE rn <= 5""")),

    Q(
      "qt17_token_mix",
      // data mixing: downsample each source so its kept token mass
      // approaches budget·pct/100 — thresholds are DERIVED FROM THE
      // DATA (per-source token counts) with fixed integer/double op
      // order, so DuckDB re-derives the identical thresholds and the
      // kept set is fully value-oracled. src2 exercises the
      // keep-everything clamp; src0/src1 the fractional branch.
      (s, dir) => {
        val kept = CorpusOps.tokenMix(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), col("source"),
          budgetTokens = 2000L,
          pctBySource = Map("src0" -> 60, "src1" -> 25, "src2" -> 100),
          defaultPct = 5)
        kept.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .cast("bigint").as("kept_tokens"))
      },
      Some("""WITH tok AS (
               |  SELECT doc_id, source,
               |         CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
               |  FROM documents),
               |tgt AS (
               |  SELECT source, sum(n_tokens) AS actual,
               |         2000 * (CASE source WHEN 'src0' THEN 60
               |                             WHEN 'src1' THEN 25
               |                             WHEN 'src2' THEN 100
               |                             ELSE 5 END) // 100 AS target
               |  FROM tok GROUP BY source),
               |thr AS (
               |  SELECT source,
               |         CASE WHEN target >= actual THEN 1099511627776
               |              ELSE CAST(floor((CAST(target AS DOUBLE) / CAST(actual AS DOUBLE))
               |                              * 1099511627776.0) AS BIGINT)
               |         END AS t
               |  FROM tgt)
               |SELECT tok.source, count(*) AS n_docs,
               |       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
               |FROM tok JOIN thr ON tok.source = thr.source
               |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT) < thr.t
               |GROUP BY tok.source""".stripMargin)),
    Q(
      "qt18_token_chunks",
      // context-window prep: 64-token chunks every 32 tokens
      // (overlapping); the md5 chunk fingerprint stands in for the
      // chunk text, so the output stays narrow
      (s, dir) =>
        CorpusOps.chunkTokens(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), maxTokens = 64, stride = 32),
      Some("""WITH nrm AS (SELECT doc_id,
               |              regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
               |            FROM documents),
               |tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM nrm),
               |st AS (SELECT doc_id, toks,
               |              unnest(range(1, len(toks) + 1, 32)) AS s
               |       FROM tk)
               |SELECT doc_id AS id, CAST(s AS INT) AS chunk_start,
               |       len(toks[s:s+63]) AS chunk_tokens,
               |       md5(list_aggregate(toks[s:s+63], 'string_agg', ' ')) AS chunk_fp
               |FROM st""".stripMargin)),
    Q(
      "qt19_oov_rate",
      // tokenizer-coverage signal: per-doc fraction of token
      // occurrences outside the corpus's own top-50 vocabulary
      // (frequency-ranked, ties by term — a deterministic cut)
      (s, dir) =>
        CorpusOps.oovProfile(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), vocabSize = 50),
      Some("""WITH nrm AS (SELECT doc_id,
               |              regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
               |            FROM documents),
               |tk AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM nrm),
               |voc AS (SELECT term FROM (
               |          SELECT term, count(*) AS n FROM tk GROUP BY term
               |          ORDER BY n DESC, term LIMIT 50) z)
               |SELECT tk.doc_id AS id, count(*) AS n_tokens,
               |       count(voc.term) AS in_vocab,
               |       (floor((1.0 - CAST(count(voc.term) AS DOUBLE)
               |                   / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS oov_rate
               |FROM tk LEFT JOIN voc ON tk.term = voc.term
               |GROUP BY tk.doc_id""".stripMargin)),
    Q(
      "qt15_decontaminate",
      // benchmark decontamination: the 'test' hash-split bucket plays
      // the eval set, the 'train' bucket the corpus; a train document
      // is contaminated when it shares any token 8-gram with the eval
      // set. Broadcast-join shape: the benchmark key set is the small
      // side; the corpus side never shuffles except the per-doc rollup.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val bench = docs.filter(CorpusOps.splitAssign(col("doc_id")) === "test")
        val train = docs.filter(CorpusOps.splitAssign(col("doc_id")) === "train")
        Decontaminate.profile(
          train, col("text"), col("doc_id"),
          Decontaminate.benchmarkKeys(bench, col("text")))
      },
      Some(Decontaminate.oracleSql()),
      bench = true),
    Q(
      "qt16_pii_scrub",
      // PII scrub witness. The synthetic corpus carries no PII, so a
      // deterministic fixture is injected IN-QUERY for every fifth
      // document (identically in both engines): an email, an IPv4 and
      // an E.164-ish phone derived from doc_id. The operator under
      // test is the staged regex scrub; counts and the redacted-text
      // md5 are value-oracled.
      (s, dir) => {
        val injected = when(
          col("doc_id") % 5 === 0,
          concat(
            col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via 10.20."), (col("doc_id") % 200).cast("string"),
            lit(".7 or +1415555"), (col("doc_id") % 10000).cast("string")))
          .otherwise(col("text"))
        PiiScrub.profile(
          Tables.load(s, dir, "documents"), injected, col("doc_id"))
      },
      Some(s"""WITH t AS (
               |  SELECT doc_id,
               |         CASE WHEN doc_id % 5 = 0
               |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
               |                   || '@example.com via 10.20.' || CAST(doc_id % 200 AS VARCHAR)
               |                   || '.7 or +1415555' || CAST(doc_id % 10000 AS VARCHAR)
               |              ELSE text END AS tx
               |  FROM documents),
               |r AS (
               |  SELECT doc_id, tx,
               |         regexp_replace(tx, '${PiiScrub.emailRe}', '<EMAIL>', 'g') AS t1
               |  FROM t),
               |r2 AS (
               |  SELECT doc_id, tx, t1,
               |         regexp_replace(t1, '${PiiScrub.ipv4Re}', '<IP>', 'g') AS t2
               |  FROM r),
               |r3 AS (
               |  SELECT doc_id, tx, t1, t2,
               |         regexp_replace(t2, '${PiiScrub.phoneRe}', '<PHONE>', 'g') AS t3
               |  FROM r2)
               |SELECT doc_id AS id,
               |       length(regexp_extract_all(tx, '${PiiScrub.emailRe}')) AS n_emails,
               |       length(regexp_extract_all(t1, '${PiiScrub.ipv4Re}')) AS n_ips,
               |       length(regexp_extract_all(t2, '${PiiScrub.phoneRe}')) AS n_phones,
               |       md5(t3) AS redacted_fp,
               |       t3 <> tx AS changed
               |FROM r3""".stripMargin)),
    Q(
      "qt20_compression_gate",
      // zlib-ratio quality signal (Gopher-style): no SQL engine can
      // reproduce deflate, so this is a GATE query like qs08/qd17 —
      // wide-margin booleans against a constant oracle. Two extreme
      // fixtures are injected in-query: a pathological repetition and
      // an incompressible hex blob; the corpus itself must sit between
      // them.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val boiler = (1 to 60).map(_ => "spam").mkString(" ")
        val noise = (1 to 40).map(i =>
          md5(concat(lit(i.toString), col("doc_id").cast("string"))))
        val injected = docs.limit(0)
          .unionByName(s.range(1).select(
            lit(-1L).as("doc_id"), lit(boiler).as("text")))
          .unionByName(docs.filter(col("doc_id") === 0)
            .select(lit(-2L).as("doc_id"),
              concat_ws("", noise: _*).as("text")))
        val scored = docs.unionByName(injected).select(
          col("doc_id"),
          graft.functions.DeflateRatioFn(col("text")).as("r"))
        // frozen ~3x-margin bounds (observed at sf0.01: corpus min/avg/
        // max 0.40/0.55/1.02 — short docs exceed 1.0 under deflate
        // framing; boiler ~0.06; hex noise ~0.55)
        scored.agg(
          avg(when(col("doc_id") >= 0, col("r"))).as("corpus_avg"),
          max(when(col("doc_id") >= 0, col("r"))).as("corpus_max"),
          min(when(col("doc_id") >= 0, col("r"))).as("corpus_min"),
          max(when(col("doc_id") === -1, col("r"))).as("boiler_r"),
          max(when(col("doc_id") === -2, col("r"))).as("noise_r"))
          .select(
            (col("corpus_avg") > 0.2 && col("corpus_avg") < 0.9).as("corpus_avg_in_band"),
            (col("corpus_max") < 1.5).as("corpus_overhead_bounded"),
            (col("boiler_r") < col("corpus_min")).as("boiler_below_corpus"),
            (col("noise_r") > col("boiler_r") * 2).as("noise_above_boiler"))
      },
      Some("""SELECT true AS corpus_avg_in_band, true AS corpus_overhead_bounded,
                     true AS boiler_below_corpus, true AS noise_above_boiler""")),
    Q(
      "qt13_dup_spans",
      // span-level exact dedup signal (the substring complement of
      // qd01/qd03): per document, the share of its distinct token
      // 8-grams that occur in >= 2 documents — md5 span keys on both
      // engines, fully value-oracled
      (s, dir) =>
        graft.operators.text.SpanDedup.spanProfile(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id")),
      Some(graft.operators.text.SpanDedup.oracleSql()),
      bench = true),
    Q(
      "qt21_wordpiece_tokens",
      // real subword tokenization: greedy longest-match WordPiece over
      // the demo vocab, as a native codegen expression (vocab rides in
      // as a codegen reference object). Longest-match is deterministic,
      // so DuckDB re-derives the identical piece stream with a
      // recursive CTE and the md5 of the joined stream value-oracles
      // every piece in order.
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("__p",
            graft.functions.WordPiece.tokens(TextOps.normalized(col("text"))))
          .select(
            col("doc_id"),
            size(col("__p")).cast("long").as("n_pieces"),
            size(filter(col("__p"), x => x === "[UNK]")).cast("long").as("n_unk"),
            md5(concat_ws(" ", col("__p"))).as("pieces_md5")),
      Some(graft.functions.WordPiece.oracleSql())),
    Q(
      "qt22_temperature_mix",
      // temperature-weighted mixing (α = 0.5): targets ∝ sqrt(source
      // token mass) — flattens the mixture toward small sources, the
      // standard multilingual upweighting. sqrt is exactly rounded (pow
      // is not), the α-power sum folds in source-name order with a 0.0
      // seed on both engines, so the data-derived integer thresholds
      // and therefore the kept set are fully value-oracled.
      (s, dir) => {
        val kept = CorpusOps.temperatureMix(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), col("source"),
          budgetTokens = 2000L, alpha = 0.5)
        kept.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .cast("bigint").as("kept_tokens"))
      },
      Some("""WITH tok AS (
               |  SELECT doc_id, source,
               |         CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
               |  FROM documents),
               |agg AS (SELECT source, sum(n_tokens) AS actual FROM tok GROUP BY source),
               |pw AS (SELECT source, actual, sqrt(CAST(actual AS DOUBLE)) AS p FROM agg),
               |tot AS (SELECT list_reduce(list(p ORDER BY source), (a, b) -> a + b) AS tp FROM pw),
               |thr AS (SELECT source,
               |         CAST(floor(LEAST(1.0, (2000.0 * (p / tp)) / CAST(actual AS DOUBLE))
               |                    * 1099511627776.0) AS BIGINT) AS t
               |        FROM pw, tot)
               |SELECT tok.source AS source, count(*) AS n_docs,
               |       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
               |FROM tok JOIN thr ON tok.source = thr.source
               |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT) < thr.t
               |GROUP BY tok.source""".stripMargin)),
    Q(
      "qt23_approx_distinct",
      // HLL++ approximate term cardinality per source — at 100 TB the
      // exact distinct is a full shuffle of every term; the sketch is
      // one partial-aggregated pass. HLL registers aren't
      // SQL-reproducible, so this is a GATE (qd17/qd20 pattern) on the
      // sketch's accuracy CONTRACT: every per-source estimate within
      // 3x the configured 2% rsd of the exact count, computed here
      // side by side.
      (s, dir) => {
        val terms = Tables.load(s, dir, "documents")
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
        terms.groupBy("source")
          .agg(
            countDistinct(col("term")).as("__exact"),
            approx_count_distinct(col("term"), rsd = 0.02).as("__approx"))
          .agg(
            (max(abs(col("__approx") - col("__exact")).cast("double")
              / col("__exact").cast("double")) <= 0.06).as("rel_err_bounded"),
            (min(col("__approx")) > 0).as("estimates_present"))
      },
      Some("SELECT true AS rel_err_bounded, true AS estimates_present")),
    Q(
      "qt24_bpe_tokens",
      // apply-time BPE (the GPT-family budget counter beside qt21's
      // WordPiece): per word, the leftmost lowest-rank adjacent pair
      // merges, one step at a time, until none applies — one
      // deterministic successor per state, so DuckDB re-derives the
      // identical token stream with a recursive CTE over LIST states
      // and the md5 of the joined stream value-oracles every token in
      // order.
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("__t",
            graft.functions.Bpe.tokens(TextOps.normalized(col("text"))))
          .select(
            col("doc_id"),
            size(col("__t")).cast("long").as("n_tokens"),
            md5(concat_ws(" ", col("__t"))).as("tokens_md5")),
      Some(graft.functions.Bpe.oracleSql()),
      bench = true),
    Q(
      "qt25_line_dedup",
      // CCNet/C4-style corpus line dedup WITH reconstruction: lines
      // (10-token windows — the fixture is single-line, so the
      // segmenter is the documented fallback) appearing in >= 2 docs
      // are boilerplate and are cut from every doc, order preserved;
      // clean_md5 value-oracles the rebuilt text line-for-line.
      (s, dir) =>
        graft.operators.text.LineDedup.profile(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), minDocs = 2,
          segmenter =
            graft.operators.text.LineDedup.tokenWindowSegmenter(10)),
      Some(graft.operators.text.LineDedup.oracleSql(10, 2))),
    Q(
      "qt26_quality_classifier",
      // fasttext-style model-based quality filter: word bigrams hash
      // into 4096 feature buckets (feature hashing — fixed parameter
      // count), md5-derived integer weights (the externally-trained
      // mode), score = mean bigram weight, keep = score >= 0. One
      // native codegen expression per row — map-only, no explode, no
      // shuffle; the integer sum is exact, so every score and keep
      // decision value-oracles.
      (s, dir) =>
        graft.operators.text.QualityClassifier.score(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          tau = 0.0),
      Some(graft.operators.text.QualityClassifier.oracleSql(0.0))),
    Q(
      "qt27_cms_heavy_hitters",
      // count-min sketch — the frequency member of the sketch family
      // (qt23 HLL = cardinality, qd20 bloom = membership): d=4 md5
      // hash rows x w=1024 buckets, estimates one-sided by
      // construction. The sketch build partial-aggregates to <= d*w
      // rows per task, so the shuffle is sketch-sized regardless of
      // corpus size; the exact side here is the verification gate.
      (s, dir) =>
        graft.operators.text.PortableCms.profile(
          Tables.load(s, dir, "documents"), col("text"), topK = 20),
      Some(graft.operators.text.PortableCms.oracleSql(20))),
    Q(
      "qt28_bpe_learn",
      // distributed BPE vocabulary LEARNING (the training side of
      // qt24's apply-time tokenizer): corpus collapses once into the
      // (word, freq) vocabulary, then each round is one vocab-sized
      // pair aggregation + a 1-row argmax collect + a per-row fuse.
      // The oracle re-derives all 6 rounds as mechanically-chained
      // CTE stages — counts, argmax and rewrite per round.
      (s, dir) =>
        graft.operators.text.BpeLearn.learn(
          Tables.load(s, dir, "documents"), col("text"), nMerges = 6),
      Some(graft.operators.text.BpeLearn.oracleSql(6))),
    Q(
      "qt29_rule_clean",
      // C4-style heuristic cleaning: terminal-punctuation + min-words
      // + blacklist line rules, '{'/'lorem ipsum' document gates. The
      // fixture is single-line word salad with no punctuation, so
      // deterministic web-junk lines are planted IN-QUERY (the qt16
      // trick, identically in both engines): a rule-passing sentence
      // (doc_id%3), a javascript banner (%4), a too-short punct line
      // (%5), and the two doc-killers (%11, %13). Entirely per-row
      // codegen work — zero shuffles; rule cleaning must run at scan
      // speed, that is its job at 100 TB.
      (s, dir) =>
        graft.operators.text.RuleClean.profile(
          Tables.load(s, dir, "documents"),
          graft.operators.text.RuleClean.plantText(col("doc_id"), col("text")),
          col("doc_id")),
      Some(graft.operators.text.RuleClean.oracleSql(
        s"(SELECT doc_id, ${graft.operators.text.RuleClean.plantSqlExpr} AS tx " +
          "FROM documents) t")),
      bench = true),
    Q(
      "qt30_bm25_topk",
      // BM25 ranked retrieval: lexical search over the corpus for a
      // literal query term set — the audit/dedup-probe primitive
      // beside embedding ANN. Hit rows (one per doc × query term) are
      // the only thing that shuffles; stats broadcast; top-k is
      // TakeOrdered. Ranking runs on the ROUNDED score (qt14's ln
      // convention) with an ordered per-term fold so addition order
      // cannot drift between engines.
      (s, dir) =>
        graft.operators.text.Bm25.topK(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          queryTerms = Seq("spark", "window", "vector"), k = 15),
      Some(graft.operators.text.Bm25.oracleSql(
        Seq("spark", "window", "vector"), k = 15))),
    Q(
      "qt31_script_profile",
      // Unicode script profiling: per-script char counts, dominant
      // script, ASCII ratio — the multilingual signal under qt03's
      // stopword lang-id. Pure ASCII fixture, so Cyrillic/Han/Greek
      // snippets are planted in-query (qt16 trick) by doc_id residue;
      // per-row regex counting only, zero shuffles.
      (s, dir) => {
        val tx = concat(
          col("text"),
          when(col("doc_id") % 6 === 1, lit(" привет мир данные"))
            .otherwise(lit("")),
          when(col("doc_id") % 6 === 2, lit(" 机器学习数据"))
            .otherwise(lit("")),
          when(col("doc_id") % 6 === 3, lit(" αλφα βητα γαμμα"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit(" version 2024 build 17"))
            .otherwise(lit("")))
        graft.operators.text.ScriptProfile.profile(
          Tables.load(s, dir, "documents"), tx, col("doc_id"))
      },
      Some {
        val planted =
          """(SELECT doc_id, text ||
            |   CASE WHEN doc_id % 6 = 1 THEN ' привет мир данные' ELSE '' END ||
            |   CASE WHEN doc_id % 6 = 2 THEN ' 机器学习数据' ELSE '' END ||
            |   CASE WHEN doc_id % 6 = 3 THEN ' αλφα βητα γαμμα' ELSE '' END ||
            |   CASE WHEN doc_id % 7 = 0 THEN ' version 2024 build 17' ELSE '' END
            |   AS tx FROM documents) t""".stripMargin
        graft.operators.text.ScriptProfile.oracleSql(planted)
      }),
    Q(
      "qt32_perplexity_filter",
      // CCNet-style unigram-LM cross-entropy gate: corpus-trained
      // top-20 vocabulary (+ OOV floor) broadcast to the token stream;
      // per-doc CE = mean negative log-prob, keep when <= 3.6. One
      // libm ln per VOCAB TERM (rounded, qt14 convention), ordered
      // position fold, 4-dp CE — engine-identical gating.
      (s, dir) =>
        graft.operators.text.PerplexityFilter.profile(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          vocabSize = 20, tau = 3.6),
      Some(graft.operators.text.PerplexityFilter.oracleSql(20, 3.6)),
      bench = true),
    Q(
      "qt33_dup_span_runs",
      // longest duplicated RUN (the ExactSubstr signal): how long is
      // the longest contiguous corpus-duplicated n-gram region per
      // doc — template pages score high here while staying low-ratio
      // in qt13's fraction view. Positional narrow rows, one-vote
      // corpus counts, gaps-and-islands integer windows.
      (s, dir) =>
        graft.operators.text.SpanDedup.longestRunProfile(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id")),
      Some(graft.operators.text.SpanDedup.oracleRunSql()),
      bench = true),
    Q(
      "qt34_length_distribution",
      // per-source token-length distribution: exact p25/p50/p90 (the
      // qe08 bit-exact quantile convention over integer token counts)
      // plus min/max — the length profile behind every chunking and
      // packing decision. One keyed aggregation of narrow rows.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"),
            graft.operators.text.TextAnalysis.tokenCount(col("text"))
              .cast("double").as("nt"))
        docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          min(col("nt").cast("long")).as("min_tokens"),
          expr("percentile(nt, 0.25D)").as("p25"),
          expr("percentile(nt, 0.5D)").as("p50"),
          expr("percentile(nt, 0.9D)").as("p90"),
          max(col("nt").cast("long")).as("max_tokens"))
      },
      Some("""WITH t AS (SELECT source,
                           CAST(length(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS nt
                         FROM documents)
              SELECT source, count(*) AS n_docs,
                     CAST(min(nt) AS BIGINT) AS min_tokens,
                     quantile_cont(nt, 0.25) AS p25,
                     quantile_cont(nt, 0.5) AS p50,
                     quantile_cont(nt, 0.9) AS p90,
                     CAST(max(nt) AS BIGINT) AS max_tokens
              FROM t GROUP BY source"""))
,
    Q(
      "qt40_unigram_seed",
      // unigram-LM tokenizer SEEDING (SentencePiece step 1): candidate
      // pieces = all substrings (len 1..6) of corpus words weighted by
      // word frequency, cut to the top 120 by (cnt DESC, piece ASC) —
      // a total order, so the cut is deterministic in both engines.
      // One word-vocab aggregation + one piece aggregation; TakeOrdered
      // (no global sort shuffle) for the cut.
      (s, dir) =>
        UnigramLm.seed(
          Tables.load(s, dir, "documents"), col("text"), maxLen = 6, topN = 120),
      Some(UnigramLm.seedOracleSql(maxLen = 6, topN = 120))),
    Q(
      "qt41_minseg_tokens",
      // optimal-path subword segmentation under the qt40 seed vocab ∪
      // all single chars: fewest pieces, ties to larger total piece
      // weight then longer piece — the integer-exact PORTABLE TWIN of
      // the unigram Viterbi (same DP kernel shape, BIGINT scores), so
      // the full piece stream value-oracles cross-engine where the
      // float-scored path (qt42) cannot: DuckDB re-runs the identical
      // DP as recursive CTEs. Per-doc piece count + md5 of the stream,
      // the qt21 WordPiece contract.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = UnigramLm.seedVocab(docs, col("text"), maxLen = 6, topN = 120)
        val toks = graft.functions.SubwordSegment
          .minsegTokens(TextOps.normalized(col("text")), vocab, 6)
        docs.select(col("doc_id"), toks.as("toks"))
          .select(
            col("doc_id"),
            size(col("toks")).cast("bigint").as("n_pieces"),
            md5(concat_ws(" ", col("toks"))).as("pieces_md5"))
      },
      Some(UnigramLm.minsegOracleSql(maxLen = 6, topN = 120)),
      bench = true),
    Q(
      "qt46_piece_profile",
      // the artifact shipped WITH a trained vocabulary: per-piece total
      // uses and document frequency under the qt41 segmentation — what
      // drives prune decisions and spots pieces that exist only inside
      // one boilerplate template (high uses, low doc_freq). One explode
      // over the codegen'd DP projection into one piece-keyed
      // aggregation; the full recursive DP oracle nests as the prefix.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = UnigramLm.seedVocab(docs, col("text"), maxLen = 6, topN = 120)
        docs.select(col("doc_id"),
            explode(graft.functions.SubwordSegment
              .minsegTokens(TextOps.normalized(col("text")), vocab, 6)).as("piece"))
          .groupBy("piece")
          .agg(
            count(lit(1)).as("n_uses"),
            countDistinct("doc_id").cast("bigint").as("doc_freq"))
      },
      Some(UnigramLm.pieceProfileOracleSql(maxLen = 6, topN = 120))),
    Q(
      "qt47_vocab_size_curve",
      // the vocab-size TUNING CURVE: min-seg fertility (pieces per
      // word) at three top-N cuts — the tradeoff table that picks a
      // vocabulary size before committing to a full unigram train.
      // Word-level: the corpus collapses once to (word, freq) and each
      // variant is one codegen'd DP projection over DISTINCT words —
      // cost scales with the vocabulary, never re-reading text. The
      // oracle runs ONE parameterized DP chain with topn as a key
      // column instead of three copied pipelines.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val words = UnigramLm.wordVocab(docs, col("text"))
          .transform(graft.operators.Barrier.apply)
        Seq(40, 80, 120).map { topN =>
          val vocab = UnigramLm.seedVocab(docs, col("text"), maxLen = 6, topN = topN)
          words.select(
            lit(topN.toLong).as("top_n"),
            (size(graft.functions.SubwordSegment.minsegTokens(col("w"), vocab, 6))
              .cast("long") * col("n")).as("wp"),
            col("n"))
        }.reduce(_ unionByName _)
          .groupBy("top_n")
          .agg(
            sum("wp").cast("bigint").as("total_pieces"),
            sum("n").cast("bigint").as("total_words"))
          .withColumn("pieces_per_word",
            col("total_pieces").cast("double") / col("total_words").cast("double"))
      },
      Some(UnigramLm.fertilityCurveOracleSql(6, Seq(40, 80, 120)))),
    Q(
      "qt42_unigram_learn",
      // unigram-LM TRAINING (hard-EM with add-alpha smoothing, prune
      // to target between phases) — float-scored, so gate-oracled like
      // qd17/qs08: the penalized objective J must be monotonically
      // non-increasing within each fixed-vocab EM phase (a theorem of
      // hard-EM coordinate descent the implementation must not break),
      // segmentation must round-trip every corpus word (coverage), and
      // the pruned vocab must meet its target. qt41 is the
      // value-oracled twin of the segmentation kernel itself.
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val r = UnigramLm.learn(
          Tables.load(s, dir, "documents"), col("text"), UnigramLm.Config())
        def monotone(phase: Int): Boolean = {
          val js = r.rounds.filter(_.phase == phase).sortBy(_.round).map(_.obj)
          js.zip(js.drop(1)).forall { case (a, b) => b <= a + 1e-9 }
        }
        // the REAL prune bound: all single-char pieces survive for
        // coverage, multi-char pieces fill up to targetVocab — so the
        // vocab must fit max(targetVocab, #single-char pieces); a
        // seedSize bound would be trivially true (vocab ⊆ seed)
        val singleChars = r.vocab.count(_._1.length == 1)
        Seq((
          monotone(1),
          monotone(2),
          r.roundtripViolations == 0L,
          r.vocab.size <= math.max(UnigramLm.Config().targetVocab, singleChars),
          r.rounds.size.toLong))
          .toDF("phase1_monotone", "phase2_monotone", "roundtrip_ok",
            "vocab_bounded", "rounds_run")
      },
      Some("""SELECT true AS phase1_monotone, true AS phase2_monotone,
                     true AS roundtrip_ok, true AS vocab_bounded,
                     CAST(4 AS BIGINT) AS rounds_run""")),
    Q(
      "qt43_vocab_growth",
      // Heaps-law vocabulary growth curve: cumulative distinct-type
      // count vs cumulative token count over 10 md5-stable corpus
      // slices (qt07's hash idiom, so the curve is reproducible and
      // monotone under re-runs) — the diagnostic that sizes tokenizer
      // vocabularies and detects template-heavy corpora (flat curve)
      // before training. Shape: types collapse to their FIRST bucket
      // (one vocab-sized aggregation), then cumulative sums run over
      // the 10-row bucket frame — never over tokens.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val b = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("bigint") % 10).as("b")
        val toks = docs.select(b,
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        val vh = toks.groupBy("tok").agg(min("b").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nv"))
        val th = toks.groupBy("b").agg(count(lit(1)).as("nt"))
        val frame = s.range(10).select(col("id").as("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("bucket").rowsBetween(Long.MinValue, 0)
        frame
          .join(broadcast(vh), frame("bucket") === vh("b"), "left")
          .join(broadcast(th), frame("bucket") === th("b"), "left")
          .select(col("bucket"),
            coalesce(col("nv"), lit(0L)).as("nv"),
            coalesce(col("nt"), lit(0L)).as("nt"))
          .select(col("bucket"),
            sum("nv").over(w).cast("bigint").as("cum_types"),
            sum("nt").over(w).cast("bigint").as("cum_tokens"))
          .withColumn("ttr",
            col("cum_types").cast("double") / col("cum_tokens").cast("double"))
      },
      Some("""WITH toks AS (
                SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b,
                       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
                FROM documents),
              vh AS (SELECT b, count(*)::BIGINT AS nv
                     FROM (SELECT tok, min(b) AS b FROM toks GROUP BY tok) m
                     GROUP BY b),
              th AS (SELECT b, count(*)::BIGINT AS nt FROM toks GROUP BY b),
              g AS (SELECT gs.bucket, COALESCE(vh.nv, 0) AS nv, COALESCE(th.nt, 0) AS nt
                    FROM range(0, 10) gs(bucket)
                    LEFT JOIN vh ON vh.b = gs.bucket
                    LEFT JOIN th ON th.b = gs.bucket)
              SELECT bucket,
                     CAST(sum(nv) OVER (ORDER BY bucket) AS BIGINT) AS cum_types,
                     CAST(sum(nt) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
                     CAST(sum(nv) OVER (ORDER BY bucket) AS DOUBLE) /
                     CAST(sum(nt) OVER (ORDER BY bucket) AS DOUBLE) AS ttr
              FROM g""")),
    Q(
      "qt44_contamination_report",
      // qt15 INVERTED — the eval-integrity half of decontamination:
      // per eval (test-bucket) document, how many of its 8-gram spans
      // are burned by the train bucket and how many train docs touch
      // it. qt15 drops train docs; this flags which EVAL items no
      // longer measure anything and must be re-drawn. The corpus span
      // stream broadcast-joins the eval keys, so only true leaks reach
      // the per-eval-doc rollup.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Decontaminate.benchmarkReport(
          docs.filter(CorpusOps.splitAssign(col("doc_id")) === "train"),
          docs.filter(CorpusOps.splitAssign(col("doc_id")) === "test"),
          col("text"), col("doc_id"))
      },
      Some(Decontaminate.benchmarkReportOracleSql())),
    Q(
      "qt45_dataset_card",
      // the per-source DATASET CARD — the release artifact every
      // curated corpus ships with: volume (docs/tokens/chars), exact
      // duplication rate, mean quality, language spread and dominance,
      // one row per source. Float discipline per the Registry rules:
      // the per-row quality double (qt02's oracled expression) rides
      // through a DECIMAL(18,9) cast so the SUM is order-exact; every
      // rate is a single division of exact integers/decimals. Two
      // aggregations (per-source, per source×lang top-1) + a tiny join.
      (s, dir) =>
        graft.operators.text.DatasetCard.card(
          Tables.load(s, dir, "documents"),
          col("text"), col("source"), col("lang")),
      Some(s"""WITH b AS (
                 SELECT source, lang,
                        md5($normSql) AS fp,
                        CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
                        CAST(length(text) AS BIGINT) AS chars,
                        CAST($qualitySql AS DECIMAL(18,9)) AS q
                 FROM documents),
               ps AS (
                 SELECT source, count(*) AS n_docs,
                        CAST(sum(toks) AS BIGINT) AS total_tokens,
                        CAST(sum(chars) AS BIGINT) AS total_chars,
                        CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS exact_dup_docs,
                        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                        sum(q) AS qsum
                 FROM b GROUP BY source),
               lt AS (
                 SELECT source, lang AS top_lang, ln AS top_n FROM (
                   SELECT source, lang, count(*) AS ln,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY count(*) DESC, lang) AS rn
                   FROM documents GROUP BY source, lang) z
                 WHERE rn = 1)
               SELECT ps.source, n_docs, total_tokens, total_chars, exact_dup_docs,
                      CAST(exact_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
                      CAST(qsum AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_quality,
                      n_langs, top_lang,
                      CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_share
               FROM ps JOIN lt ON lt.source = ps.source""")),
    Q(
      "qt39_type_token_ratio",
      // lexical diversity per source: distinct terms / total terms
      // (type-token ratio) — low TTR flags template/boilerplate-heavy
      // sources before any pair mining runs. Exact distinct + total
      // counts on qt11's tokenization contract, one BIGINT→DOUBLE
      // division.
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .groupBy("source")
          .agg(
            countDistinct("term").as("n_types"),
            count(lit(1)).as("n_tokens"))
          .withColumn("ttr",
            col("n_types").cast("double") / col("n_tokens").cast("double")),
      Some("""SELECT source,
                     count(DISTINCT term) AS n_types,
                     count(*) AS n_tokens,
                     CAST(count(DISTINCT term) AS DOUBLE) /
                     CAST(count(*) AS DOUBLE) AS ttr
              FROM (SELECT source,
                           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
                    FROM documents) t
              GROUP BY source""")),
    Q(
      "qt38_lang_confusion",
      // the quality report ON the lang-id heuristic itself: label ×
      // prediction confusion counts over the whole corpus — the
      // artifact that tells you WHERE the classifier errs (which
      // true language bleeds into which prediction) rather than just
      // that it errs. Pure composition of qt03's oracled predictor
      // with one exact-count aggregate.
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("lang").as("lang_label"),
            TextAnalysis.langGuess(col("text")).as("lang_pred"))
          .groupBy("lang_label", "lang_pred")
          .agg(count(lit(1)).as("n")),
      Some(s"""SELECT lang_label, lang_pred, count(*) AS n
               FROM (SELECT lang AS lang_label,
                            CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                                 WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                                 WHEN fr_hits >= es_hits THEN 'fr'
                                 ELSE 'es' END AS lang_pred
                     FROM (SELECT lang,
                                  ${hitsSql(TextAnalysis.stopEn)} AS en_hits,
                                  ${hitsSql(TextAnalysis.stopDe)} AS de_hits,
                                  ${hitsSql(TextAnalysis.stopFr)} AS fr_hits,
                                  ${hitsSql(TextAnalysis.stopEs)} AS es_hits
                           FROM documents) h) x
               GROUP BY lang_label, lang_pred""")),
    Q(
      "qt37_quota_sample",
      // exact-quota cousin of qt10: exactly 30 docs per source by
      // hash-rank (qt10's rate-based thresholds hit quotas only in
      // expectation) — membership is a pure function of the ids
      // present, stable and monotone under corpus growth.
      (s, dir) =>
        graft.operators.text.CorpusOps.quotaSample(
          Tables.load(s, dir, "documents"), col("source"), col("doc_id"), 30)
          .select("doc_id", "source"),
      Some("""SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                         ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT),
                                  doc_id) AS hr
                FROM documents) x
              WHERE hr <= 30""")),
    Q(
      "qt36_subword_fertility",
      // tokenizer fertility per language: subword pieces emitted per
      // whitespace word — THE budget diagnostic for multilingual
      // corpora (a fertility of 2–4× is why CJK/code corpora blow
      // token budgets computed from word counts). Composes qt21's
      // WordPiece recursive-CTE oracle with qt01's word counts; counts
      // are exact BIGINTs and fertility is one BIGINT→DOUBLE division,
      // bit-identical cross-engine.
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("lang"),
            graft.operators.text.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("nw"),
            size(graft.functions.WordPiece.tokens(
              graft.operators.TextOps.normalized(col("text"))))
              .cast("long").as("np"))
          .groupBy("lang")
          .agg(
            sum("nw").cast("bigint").as("n_words"),
            sum("np").cast("bigint").as("n_pieces"))
          .withColumn("fertility",
            col("n_pieces").cast("double") / col("n_words").cast("double")),
      Some(s"""WITH RECURSIVE ${graft.functions.WordPiece.oracleCtes()},
              |perdoc AS (
              |  SELECT doc_id, CAST(COALESCE(sum(npieces), 0) AS BIGINT) AS np
              |  FROM wp GROUP BY doc_id),
              |words AS (
              |  SELECT doc_id, lang,
              |         CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nw
              |  FROM documents)
              |SELECT w.lang,
              |       CAST(sum(w.nw) AS BIGINT) AS n_words,
              |       CAST(sum(p.np) AS BIGINT) AS n_pieces,
              |       CAST(sum(p.np) AS DOUBLE) / CAST(sum(w.nw) AS DOUBLE) AS fertility
              |FROM words w JOIN perdoc p USING (doc_id)
              |GROUP BY w.lang""".stripMargin)),
    Q(
      "qt35_discriminative_terms",
      // corpus comparison: the 20 terms most over-represented in the
      // English slice vs the rest, by add-one-smoothed rate ratio.
      // Deliberately log-free: counts are exact BIGINTs and each score
      // is two IEEE divisions, so every double is bit-identical across
      // engines (a log-likelihood variant would drift by libm ULPs).
      (s, dir) =>
        graft.operators.text.DiscriminativeTerms.topTerms(
          Tables.load(s, dir, "documents"),
          col("text"), col("lang") === "en", k = 20),
      Some(graft.operators.text.DiscriminativeTerms
        .oracleSql("lang = 'en'", 20))),
    Q(
      "qt48_portable_hll",
      // engine-reproducible HyperLogLog, per source: qt23 can only
      // GATE Spark's built-in HLL++ (xxHash64 registers), this one
      // VALUE-oracles the whole sketch — md5-derived registers, the
      // float-order problem solved by carrying the register sum as the
      // exact integer S = sum(2^(52-M_j)), and one identical float
      // expression for the raw estimate in both engines. rel bound
      // 0.15 ~ 3x the m=512 rsd (1.04/sqrt(512) = 4.6%).
      (s, dir) =>
        graft.operators.text.PortableHll.profile(
          Tables.load(s, dir, "documents"), col("text"), relErrBound = 0.15),
      Some(graft.operators.text.PortableHll.oracleProfileSql(0.15))),
    Q(
      "qt49_hll_merge",
      // the property that makes qt48 a 100 TB counter: shard sketches
      // merge by register-wise max with ZERO loss. Derived end to end
      // — terms split into two md5 half-streams, each half sketched
      // independently, merged, and compared register-sum-for-
      // register-sum against the whole-stream sketch; DuckDB re-walks
      // the same three sketches.
      (s, dir) =>
        graft.operators.text.PortableHll.mergeProfile(
          Tables.load(s, dir, "documents"), col("text")),
      Some(graft.operators.text.PortableHll.oracleMergeSql)),
    Q(
      "qt50_hll_size_curve",
      // the sketch-size tuning curve (qt47/qs22/qp19's sibling for
      // the cardinality sketch): accuracy vs register count m =
      // 128..2048 — worst per-source floor-scaled relative error and
      // how many sources sit inside 3x the theoretical rsd 1.04/sqrt(m).
      // The curve bites in BOTH directions on purpose: small m pays
      // variance (m=128: ~19% worst err), and m above ~cardinality/2.5
      // (1024+ on this corpus) collapses into the small-range regime
      // where the raw estimator needs linear counting — the fixture
      // rows show 0 sources in bound there. That inflection is exactly
      // why qt48 pins m=512 for ~1.4k-gram sources; at 100 TB
      // cardinalities the raw regime widens and m is picked off this
      // table.
      (s, dir) =>
        graft.operators.text.PortableHll.sizeCurve(
          Tables.load(s, dir, "documents"), col("text"),
          ps = Seq(7, 8, 9, 10, 11)),
      Some(graft.operators.text.PortableHll
        .oracleSizeCurveSql(Seq(7, 8, 9, 10, 11)))),
    Q(
      "qt51_hybrid_retrieval",
      // hybrid search: reciprocal-rank fusion of qt30's BM25 lexical
      // ranking and a qs02-style dense cosine ranking over the docs'
      // embeddings — fusing on RANKS (integer 10^6 div (60+rank))
      // sidesteps the incomparable score scales AND every float
      // portability question; each ranker takes its natural query
      // form (terms / a probe embedding). The fusion itself touches
      // <= 2k rows regardless of corpus size.
      (s, dir) =>
        graft.operators.text.HybridRetrieval.topK(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          Tables.load(s, dir, "embeddings"),
          queryTerms = Seq("spark", "window", "vector"),
          probeId = 0L, kPerList = 50, kOut = 15),
      Some(graft.operators.text.HybridRetrieval.oracleSql(
        Seq("spark", "window", "vector"), 0L, 50, 15))),
    Q(
      "qt52_backoff_lm_score",
      // distributed stupid-backoff trigram LM (the Brants et al. 2007
      // count-based web-scale LM): train uni/bi/trigram count tables
      // over the corpus, score every document by mean negative
      // log-score with alpha-per-level backoff. Context-aware sibling
      // of qt38's unigram CE gate — penalizes improbable SEQUENCES.
      // All arithmetic is BIGINT-ratio + integer micro-nats, so the
      // per-doc rollup is an order-free integer sum (value-oracled).
      // minCount=2 prunes singleton bi/trigrams (the Brants web-scale
      // discipline) — WITH the prune the backoff path actually
      // engages on self-trained data; minCount=1 would make c3 cover
      // every stream trigram by construction and never back off.
      (s, dir) =>
        graft.operators.text.BackoffLm.score(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          alpha = 0.4, tau = 3.2, minCount = 2),
      Some(graft.operators.text.BackoffLm.oracleScoreSql(0.4, 3.2, 2)),
      bench = true),
    Q(
      "qt53_backoff_coverage",
      // the trained model's coverage curve per language: what fraction
      // of each language's token stream scores at the trigram / bigram
      // / unigram level, plus the corpus-level cross-entropy — the
      // diagnostic that tells you whether minCount pruning (or a
      // domain shift) is starving the high-order tables.
      (s, dir) =>
        graft.operators.text.BackoffLm.coverage(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          col("lang"), alpha = 0.4, minCount = 2),
      Some(graft.operators.text.BackoffLm.oracleCoverageSql(0.4, 2))),
    Q(
      "qt56_backoff_prune_curve",
      // the LM's minCount tuning curve (qt47/qt50/qp19's sibling):
      // state size (surviving bi/trigram table rows -- what a 100 TB
      // deployment stores and joins) against quality (backoff hit
      // rates, corpus CE) at each candidate prune threshold. The
      // operating point is read off this table.
      (s, dir) =>
        graft.operators.text.BackoffLm.minCountCurve(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          alpha = 0.4, minCounts = Seq(1L, 2L, 4L, 8L)),
      Some(graft.operators.text.BackoffLm.oracleMinCountCurveSql(
        0.4, Seq(1L, 2L, 4L, 8L)))),
    Q(
      "qt54_zipf_slope",
      // Zipf-law fit per language (the classic rank-size regression,
      // slope ~ -1 for natural text): OLS of ln(freq) on ln(rank)
      // over each language's top-500 terms. Template floods and
      // synthetic spam bend the slope — a corpus-naturalness
      // diagnostic beside qt43's Heaps-law growth curve. Integer
      // milli-nat sums make the four OLS accumulators order-free
      // BIGINTs (value-oracled).
      (s, dir) =>
        graft.operators.text.ZipfFit.fit(
          Tables.load(s, dir, "documents"), col("text"), col("lang"),
          topN = 500),
      Some(graft.operators.text.ZipfFit.oracleSql(500))),
    Q(
      "qt55_chunk_retrieval",
      // the RAG retrieval unit: qt18's overlapping 64-token chunks
      // (stride 32) hash-embedded and ranked against a free-text
      // query -- retrieval returns the PASSAGE, not just the doc, and
      // the whole chain (chunking, hashing, cosine, k-cut) composes
      // under one oracle. Chunk ids pack as doc_id*100000 + start so
      // the tie ordering stays integer in both engines.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir, "documents")
        val chunks = docs
          .select(col("doc_id"),
            graft.operators.TextOps.tokens(col("text")).as("toks"))
          .withColumn("s",
            explode(sequence(lit(1), size(col("toks")), lit(32))))
          .select((col("doc_id") * 100000 + col("s")).as("cid"),
            concat_ws(" ", slice(col("toks"), col("s"), lit(64)))
              .as("ctext"))
        graft.operators.text.HashedEmbedding.queryTopK(
            chunks, col("ctext"), col("cid"),
            query = "spark window shuffle partition", dim = 64, k = 10)
          .select(expr("id div 100000").as("doc_id"),
            (col("id") % 100000).cast("bigint").as("chunk_start"),
            col("dot"), col("cos"))
      },
      Some(graft.operators.text.HashedEmbedding.oracleChunkQueryTopKSql(
        "spark window shuffle partition", maxTokens = 64, stride = 32,
        dim = 64, k = 10))),

    Q(
      "qt57_readability",
      // Flesch-Kincaid grade per doc (vowel-group syllable heuristic):
      // the classic prose-complexity score beside qt02's surface
      // quality ratios — three regexp counters, zero shuffles, one
      // per-row float expression floor-projected identically in both
      // engines; empty docs emit NULL
      (s, dir) => graft.operators.text.Readability.grade(
        Tables.load(s, dir, "documents"), col("text"), col("doc_id")),
      Some(graft.operators.text.Readability.oracleSql())),

    Q(
      "qt58_repetition_profile",
      // Gopher-family INTRA-doc repetition (Rae et al. 2021 A1.1):
      // top-bigram character mass + duplicate-5-gram mass per mille —
      // the boilerplate/keyword-stuffing gate qt13's cross-doc spans
      // can't see; all-integer, (id, gram)-keyed aggregations only
      (s, dir) => graft.operators.text.RepetitionProfile.profile(
        Tables.load(s, dir, "documents"), col("text"), col("doc_id")),
      Some(graft.operators.text.RepetitionProfile.oracleSql())),

    Q(
      "qt59_quality_calibration",
      // threshold calibration for the qt02 quality gate: per-lang
      // score quantiles — "cut at est_milli to keep the top
      // (1000 − q)‰ of this language" — so keep-rates are chosen from
      // the DISTRIBUTION instead of a global constant that over-prunes
      // one language and under-prunes another; the estimator is the
      // qe14/qe16 mergeable histogram (domain-bounded buckets, every
      // window partitioned by lang)
      (s, dir) =>
        graft.operators.PortableHistogram.groupedQuantiles(
            Tables.load(s, dir, "documents"),
            TextAnalysis.qualityScore(col("text")),
            groups = Seq(col("lang")),
            p = 3, qsPerMille = Seq(100, 250, 500, 750, 900))
          .withColumnRenamed("g0", "lang"),
      Some(graft.operators.PortableHistogram.oracleGroupedQuantileSqlFrom(
        "lang", "lang", qualitySql, "documents",
        3, Seq(100, 250, 500, 750, 900)))),

    Q(
      "qt60_unicode_normalize",
      // the canonicalization layer under every dedup key: visually
      // identical text in composed vs DECOMPOSED Unicode has different
      // bytes, md5s and shingles — qd01/qd03 leak such "duplicates"
      // unless keys normalize first. Decomposed diacritics are planted
      // IN-QUERY (the qt16 pattern; the fixture itself is
      // normalization-neutral, verified in DuckDB), then NFC composes
      // them (n_nfc < n_raw) and the accent fold produces the fuzzy
      // key. Codegen'd scalar expressions (JDK Normalizer implements
      // the versioned Unicode algorithm both engines share via
      // utf8proc) — zero shuffles, full value oracle.
      (s, dir) => {
        // decomposed on purpose: base letters + combining marks
        // (U+0301/0308/0303/030A/030C), composed by NFC below
        val planted = concat(col("text"), lit(
          " Cafe\u0301 nai\u0308ve Zu\u0308rich Sa\u0303o" +
            " jalapen\u0303o A\u030Ase c\u030Cz\u030C"))
        val nfc = graft.functions.UnicodeFns.nfc(planted)
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          length(planted).cast("long").as("n_raw"),
          length(nfc).cast("long").as("n_nfc"),
          md5(nfc).as("fp_nfc"),
          md5(graft.functions.UnicodeFns.foldAccents(nfc)).as("fp_fold"))
      },
      Some {
        val planted = "text || ' Cafe' || chr(769) || ' nai' || chr(776) ||" +
          " 've Zu' || chr(776) || 'rich Sa' || chr(771) || 'o jalapen' ||" +
          " chr(771) || 'o A' || chr(778) || 'se c' || chr(780) || 'z' || chr(780)"
        s"""WITH p AS (SELECT doc_id, $planted AS raw FROM documents)
           |SELECT doc_id,
           |       length(raw)::BIGINT AS n_raw,
           |       length(nfc_normalize(raw))::BIGINT AS n_nfc,
           |       md5(nfc_normalize(raw)) AS fp_nfc,
           |       md5(strip_accents(nfc_normalize(raw))) AS fp_fold
           |FROM p""".stripMargin
      }),

    Q(
      "qt61_host_dedup_cap",
      // CCNet's first stage, the one standard curation pass that had
      // no query yet (round-13 advice #7): URL/host-keyed exact dedup
      // + per-host caps. A re-crawl fetches the same page under a new
      // URL; dedup keys on (host, md5(content)) keeping the FIRST
      // crawl, then the per-host cap bounds any one domain's doc share
      // (n_chars as the engine-stable quality, id tiebreak). The
      // re-crawl fixture is derived IN-QUERY (the CorpusDiff
      // syntheticV2 discipline): every 5th page re-arrives under a
      // fresh id, same host, same bytes. Decision pipeline is narrow —
      // text never enters either window's shuffle (HostDedup projects
      // (id, host, digest, quality) at the scan).
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        val crawl = docs.unionByName(
          docs.where(col("doc_id") % 5 === 0)
            .withColumn("doc_id", col("doc_id") + lit(1000000L)))
        val urled = crawl.withColumn("url",
          concat(lit("https://crawl-"), col("source"),
            lit(".example.com/p/"), col("doc_id").cast("string")))
        graft.operators.text.HostDedup.dedupAndCap(
            urled, col("url"), col("text"), "doc_id", col("n_chars"),
            cap = 20)
          .select(col("doc_id"), col("host"), col("rank"), col("keep"))
      },
      Some(
        s"""WITH crawl AS (
           |  SELECT doc_id, text, source, n_chars FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, text, source, n_chars
           |  FROM documents WHERE doc_id % 5 = 0),
           |urled AS (
           |  SELECT doc_id, n_chars,
           |         'https://crawl-' || source || '.example.com/p/' ||
           |           CAST(doc_id AS VARCHAR) AS url,
           |         md5(text) AS digest
           |  FROM crawl),
           |hosted AS (
           |  SELECT doc_id, n_chars,
           |         ${graft.operators.text.HostDedup.hostOfSql("url")} AS host,
           |         digest
           |  FROM urled),
           |uniq AS (
           |  SELECT doc_id, host, n_chars FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY host, digest ORDER BY doc_id ASC) AS rn
           |    FROM hosted) WHERE rn = 1)
           |SELECT doc_id, host,
           |       row_number() OVER (PARTITION BY host
           |                          ORDER BY n_chars DESC, doc_id ASC) AS rank,
           |       row_number() OVER (PARTITION BY host
           |                          ORDER BY n_chars DESC, doc_id ASC) <= 20 AS keep
           |FROM uniq""".stripMargin),
      bench = true)
  )
}
