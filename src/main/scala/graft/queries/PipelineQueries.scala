package graft.queries

import graft.Tables
import graft.pipeline.CorpusPipeline

/** Composite end-to-end pipeline queries: several library operators
  * chained, verified against ONE DuckDB oracle built from the same
  * stage fragments. */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    Q(
      "qp01_corpus_curation",
      (s, dir) => CorpusPipeline.curateStats(Tables.load(s, dir, "documents")),
      Some(CorpusPipeline.oracleSql())),
    Q(
      "qp02_span_curation",
      (s, dir) => CorpusPipeline.spanCurateStats(Tables.load(s, dir, "documents")),
      Some(CorpusPipeline.spanOracleSql())),
    Q(
      "qp03_subword_curation",
      // WordPiece segmentation -> [UNK]-share quality filter ->
      // temperature mix budgeted in subword pieces — round 7's
      // tokenizer and mixer chained under ONE composed value oracle
      (s, dir) => CorpusPipeline.subwordCurateStats(Tables.load(s, dir, "documents")),
      Some(CorpusPipeline.subwordOracleSql())),
    Q(
      "qp04_canonical_select",
      // near-dup clusters -> retention policy: portable-MinHash pairs
      // (qd10's mining) feed connected components (qd16's labels),
      // then the LONGEST member of each cluster survives (doc_id
      // tiebreak) — "which copy do we train on", the step after
      // clustering every whole-doc dedup pipeline needs
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val edges = graft.operators.dedup.PortableMinHash.pairs(
          docs, org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.col("doc_id"), 0.3)
        val comp = graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs, "doc_id")(s)
        graft.operators.dedup.CanonicalSelect.label(
          docs.select("doc_id", "n_chars"), "doc_id",
          org.apache.spark.sql.functions.col("n_chars"), comp)
      },
      Some(graft.operators.dedup.PortableMinHash.oracleCanonicalSql(0.3))),
    Q(
      "qp05_source_cap",
      // model-scored domain caps: qt26's hashed linear scorer ranks
      // every doc, then each source keeps only its 30 best — the
      // standard guard against one crawl domain dominating a mixture.
      // Scoring is map-only; the cap is one keyed window over narrow
      // (id, source, score) rows.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val scored = graft.operators.text.QualityClassifier
          .score(docs, org.apache.spark.sql.functions.col("text"),
            org.apache.spark.sql.functions.col("doc_id"), tau = 0.0)
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
          .select(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("source"),
            org.apache.spark.sql.functions.col("score"))
        graft.operators.text.CorpusOps.capPerSource(
          scored, "source", org.apache.spark.sql.functions.col("score"),
          "doc_id", cap = 30)
      },
      Some {
        // the qt26 statement nests as a derived table; ranking is on
        // its ROUNDED score in both engines (id tiebreak), so ranks
        // agree exactly
        s"""WITH j AS (
           |  SELECT d.doc_id, d.source, sc.score
           |  FROM documents d JOIN (
           |    ${graft.operators.text.QualityClassifier.oracleSql(0.0)}
           |  ) sc ON d.doc_id = sc.doc_id)
           |SELECT doc_id, source, score,
           |       row_number() OVER (PARTITION BY source
           |                          ORDER BY score DESC, doc_id) AS rank,
           |       row_number() OVER (PARTITION BY source
           |                          ORDER BY score DESC, doc_id) <= 30 AS keep
           |FROM j""".stripMargin
      }),
    Q(
      "qp06_transitive_decon",
      // transitive decontamination: qt15's directly-contaminated train
      // docs (8-gram overlap with the test bucket) spread 2 hops over
      // the portable-MinHash near-dup graph of the train bucket — a
      // near-dup of a leak is a leak the exact n-gram pass misses.
      // Frontier BFS: one narrow ids-only join per hop, min-hop labels
      // by construction.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.load(s, dir, "documents")
        val split = graft.operators.text.CorpusOps.splitAssign(col("doc_id"))
        val bench = docs.filter(split === "test")
        val train = docs.filter(split === "train")
        val seeds = graft.operators.text.Decontaminate.contaminatedIds(
          train, col("text"), col("doc_id"),
          graft.operators.text.Decontaminate.benchmarkKeys(bench, col("text")))
        val edges = graft.operators.dedup.PortableMinHash.pairs(
          train, col("text"), col("doc_id"), 0.3)
        graft.operators.GraphExpand.expand(
          seeds, "id", edges, "doc_a", "doc_b", maxHops = 2)
      },
      Some(graft.operators.text.Decontaminate.oracleTransitiveSql(0.3, 2)),
      bench = true),
    Q(
      "qp07_domain_rank",
      // domain authority weighting: sources sharing near-dup documents
      // (the mirror signal) form an undirected domain graph; integer-
      // mass random-walk rounds (exact floor arithmetic — classic
      // double PageRank can't be value-oracled) concentrate mass on
      // the most-mirrored domains. Per round: one state-vs-edges join
      // + one sum-by-destination, narrow (node, long) rows only.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.load(s, dir, "documents")
        val pairs = graft.operators.dedup.PortableMinHash.pairs(
          docs, col("text"), col("doc_id"), 0.3)
        val src = docs.select(col("doc_id"), col("source"))
        val de = pairs
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .filter(col("sa") =!= col("sb"))
          .select(col("sa"), col("sb"))
        val sym = de.select(col("sa").as("src"), col("sb").as("dst"))
          .union(de.select(col("sb").as("src"), col("sa").as("dst")))
        graft.operators.GraphRank.rank(
          docs.select("source"), "source", sym, "src", "dst", rounds = 5)
      },
      Some {
        val mh = graft.operators.dedup.PortableMinHash.pipelineCtes()
        s"""$mh,
           |de AS (SELECT DISTINCT da.source AS sa, db.source AS sb
           |       FROM est JOIN documents da ON est.doc_a = da.doc_id
           |                JOIN documents db ON est.doc_b = db.doc_id
           |       WHERE est.est_jaccard >= 0.3 AND da.source <> db.source),
           |sym AS (SELECT sa AS src, sb AS dst FROM de
           |        UNION SELECT sb AS src, sa AS dst FROM de),
           |nodes AS (SELECT DISTINCT source AS node FROM documents),
           |${graft.operators.GraphRank.oracleRoundsSql(5)}""".stripMargin
      }),
    Q(
      "qp08_curate_funnel",
      // the CLI `curate --rules --bench` chain as ONE value-oracled
      // statement: C4 rule verdicts (on qt29's planted web-junk — the
      // rules need junk to bite) gate which ORIGINAL docs continue;
      // then exact dedup -> near-dup keep-first -> token gate (qp01's
      // chain) -> benchmark decontamination vs the test hash-bucket
      // (qt15's convention; test docs trivially self-match and drop,
      // so the final stats cover train/validation survivors). Four
      // operators, one composed oracle.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = Tables.load(s, dir, "documents")
        val planted = base.select(
          col("doc_id"),
          graft.operators.text.RuleClean
            .plantText(col("doc_id"), col("text")).as("text"))
        val keepIds = graft.operators.text.RuleClean
          .clean(planted, col("text")).select("doc_id")
        val cleaned = base.join(keepIds, Seq("doc_id"), "left_semi")
        val curated = CorpusPipeline.curate(cleaned)
        val bench = base.filter(
          graft.operators.text.CorpusOps.splitAssign(col("doc_id")) === "test")
        val fin = graft.operators.text.Decontaminate.dropContaminated(
          curated, col("text"), "doc_id",
          graft.operators.text.Decontaminate.benchmarkKeys(bench, col("text")))
        fin.groupBy(graft.operators.text.CorpusOps
            .splitAssign(col("doc_id")).as("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(graft.operators.text.TextAnalysis.tokenCount(col("text"))
              .cast("long")).cast("bigint").as("total_tokens"))
      },
      Some {
        val bucket =
          "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
        val toks = "length(regexp_split_to_array(trim(text), '\\s+'))"
        s"""WITH pl AS (SELECT doc_id,
           |              ${graft.operators.text.RuleClean.plantSqlExpr} AS text
           |            FROM documents),
           |${graft.operators.text.RuleClean.keepCtes("pl")},
           |d0 AS (SELECT d.* FROM documents d JOIN rc_keep USING (doc_id)),
           |${CorpusPipeline.curateCtes("d0")},
           |bn AS (SELECT doc_id,
           |         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt,
           |         $bucket AS b
           |       FROM documents),
           |bt AS (SELECT doc_id, string_split(nt, ' ') AS toks
           |       FROM bn WHERE b >= 90),
           |bg AS (SELECT DISTINCT
           |         md5(list_aggregate(toks[i:i+7], 'string_agg', ' ')) AS g
           |       FROM (SELECT toks,
           |               unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS i
           |             FROM bt) z),
           |dn AS (SELECT doc_id,
           |         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
           |       FROM d3),
           |dgg AS (SELECT DISTINCT doc_id,
           |          md5(list_aggregate(toks[i:i+7], 'string_agg', ' ')) AS g
           |        FROM (SELECT doc_id, toks,
           |                unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS i
           |              FROM dn) z),
           |dirty AS (SELECT DISTINCT doc_id FROM dgg JOIN bg USING (g)),
           |d4 AS (SELECT * FROM d3
           |       WHERE doc_id NOT IN (SELECT doc_id FROM dirty))
           |SELECT CASE WHEN b < 80 THEN 'train'
           |            WHEN b < 90 THEN 'validation'
           |            ELSE 'test' END AS split,
           |       count(*) AS n_docs,
           |       CAST(sum(CAST($toks AS BIGINT)) AS BIGINT) AS total_tokens
           |FROM (SELECT *, $bucket AS b FROM d4) x
           |GROUP BY 1""".stripMargin
      }),
    Q(
      "qp09_dup_aware_split",
      // duplicate-aware train/validation/test split: qd10's pair mining
      // feeds qd16's components, then the split bucket hashes the
      // COMPONENT (qt07's md5 arithmetic) — every near-dup cluster
      // lands whole in one split, so eval can't leak through a
      // paraphrase of a training doc. Hash-of-component keeps qt07's
      // stability guarantees (engine/run/reshard-invariant) and its
      // ~80/10/10 proportions, since components are dominated by
      // singletons.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val edges = graft.operators.dedup.PortableMinHash.pairs(
          docs, org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.col("doc_id"), 0.3)
        val comp = graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs, "doc_id")(s)
        comp.withColumn(
          "split",
          graft.operators.text.CorpusOps.splitAssign(
            org.apache.spark.sql.functions.col("component")))
      },
      Some(graft.operators.dedup.PortableMinHash.oracleSplitSql(0.3))),
    Q(
      "qp13_linearize_orders",
      // the lakehouse -> corpus bridge: render relational rows as
      // training text (structured-data pretraining / RAG corpus
      // generation). Fact-dim joins (customer keyed, nation broadcast)
      // feed one per-row codegen'd template concat — corpus generation
      // at scan speed, no shuffle beyond the key join. Float discipline:
      // the price rides through round+DECIMAL(12,2) so both engines
      // render the identical string; dates render via DATE cast.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        val joined = orders
          .join(customer, orders("o_custkey") === customer("c_custkey"))
          .join(broadcast(nation),
            customer("c_nationkey") === nation("n_nationkey"))
        val text = concat(
          lit("Customer "), col("c_name"),
          lit(" from "), col("n_name"),
          lit(" placed order "), col("o_orderkey").cast("string"),
          lit(" ("), col("o_orderpriority"),
          lit(") totaling $"),
          round(col("o_totalprice"), 2).cast("decimal(12,2)").cast("string"),
          lit(" on "), col("o_orderdate").cast("date").cast("string"),
          lit("."))
        joined.select(
          col("o_orderkey").as("doc_id"),
          text.as("text"),
          graft.operators.text.TextAnalysis.tokenCount(text)
            .cast("long").as("n_tokens"))
      },
      Some("""SELECT doc_id, text,
                     CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
              FROM (
                SELECT o_orderkey AS doc_id,
                       'Customer ' || c_name || ' from ' || n_name ||
                       ' placed order ' || CAST(o_orderkey AS VARCHAR) ||
                       ' (' || o_orderpriority || ') totaling $' ||
                       CAST(CAST(round(o_totalprice, 2) AS DECIMAL(12,2)) AS VARCHAR) ||
                       ' on ' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '.' AS text
                FROM orders
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey) t""")),
    Q(
      "qp14_dedup_adjusted_budget",
      // mixture planning on HONEST token budgets: per source, raw vs
      // dedup-adjusted doc/token totals (tokens surviving qd15's
      // portable keep-first near-dedup) and the retention ratio —
      // naive budgets overweight boilerplate-heavy sources; every
      // temperature/quota mix should consume the adjusted column.
      // Shape: the dedup survivors' ids join the (doc, source, tokens)
      // projection once; one grouped aggregation, exact BIGINTs, one
      // division.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir, "documents")
        val kept = graft.operators.dedup.PortableMinHash
          .dedupKeepFirst(docs, col("text"), "doc_id", 0.3)
          .select(col("doc_id"), lit(1L).as("kept"))
        docs.select(col("doc_id"), col("source"),
            graft.operators.text.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("nt"))
          .join(kept, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("nt").cast("bigint").as("raw_tokens"),
            count(col("kept")).as("kept_docs"),
            sum(when(col("kept").isNotNull, col("nt")).otherwise(lit(0L)))
              .cast("bigint").as("kept_tokens"))
          .withColumn("retention",
            col("kept_tokens").cast("double") / col("raw_tokens").cast("double"))
      },
      Some(s"""${graft.operators.dedup.PortableMinHash.pipelineCtes()},
              |kept AS (SELECT doc_id FROM documents
              |         WHERE doc_id NOT IN (SELECT doc_b FROM est WHERE est_jaccard >= 0.3)),
              |base AS (SELECT d.doc_id, d.source,
              |                CAST(length(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS nt,
              |                (d.doc_id IN (SELECT doc_id FROM kept)) AS is_kept
              |         FROM documents d)
              |SELECT source, count(*) AS n_docs,
              |       CAST(sum(nt) AS BIGINT) AS raw_tokens,
              |       CAST(count(*) FILTER (WHERE is_kept) AS BIGINT) AS kept_docs,
              |       CAST(sum(CASE WHEN is_kept THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens,
              |       CAST(sum(CASE WHEN is_kept THEN nt ELSE 0 END) AS DOUBLE) /
              |       CAST(sum(nt) AS DOUBLE) AS retention
              |FROM base GROUP BY source""".stripMargin)),
    Q(
      "qp10_training_manifest",
      // the artifact a training run actually consumes: per (split,
      // source) document and token totals plus each source's token
      // share WITHIN its split — qp09's leakage-proof split joined
      // back to provenance, aggregated, with one windowed BIGINT sum
      // for the denominators. Counts exact, share one BIGINT→DOUBLE
      // division; the qp09 oracle nests as a subquery.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir, "documents")
        val edges = graft.operators.dedup.PortableMinHash.pairs(
          docs, col("text"), col("doc_id"), 0.3)
        val labeled = graft.operators.dedup.ConnectedComponents
          .components(edges, "doc_a", "doc_b", docs, "doc_id")(s)
          .withColumn("split",
            graft.operators.text.CorpusOps.splitAssign(col("component")))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("split")
        labeled
          .join(docs.select(
            col("doc_id"),
            col("source"),
            graft.operators.text.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("nt")), "doc_id")
          .groupBy("split", "source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("nt").cast("bigint").as("n_tokens"))
          .withColumn("token_share",
            col("n_tokens").cast("double") /
              sum("n_tokens").over(w).cast("double"))
      },
      Some {
        val split = graft.operators.dedup.PortableMinHash.oracleSplitSql(0.3)
        s"""WITH msrc AS (
           |  SELECT m.split, d.source,
           |         CAST(length(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS nt
           |  FROM ($split) m JOIN documents d USING (doc_id)),
           |agg AS (
           |  SELECT split, source, count(*) AS n_docs,
           |         CAST(sum(nt) AS BIGINT) AS n_tokens
           |  FROM msrc GROUP BY 1, 2)
           |SELECT split, source, n_docs, n_tokens,
           |       CAST(n_tokens AS DOUBLE) /
           |       CAST(sum(n_tokens) OVER (PARTITION BY split) AS DOUBLE)
           |         AS token_share
           |FROM agg""".stripMargin
      }),
    Q(
      "qp11_split_leakage",
      // the audit that motivates qp09: over the same value-oracled
      // near-dup pair graph, count pairs STRADDLING two splits under
      // the naive per-doc split (qt07) vs the duplicate-aware
      // per-component split (qp09). The dup-aware column is zero by
      // construction; the naive column is the train/eval leakage a
      // per-doc split silently ships. Computed, not asserted — the
      // oracle derives the same three counts.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val split = graft.operators.text.CorpusOps.splitAssign(_: org.apache.spark.sql.Column)
        val docs = Tables.load(s, dir, "documents")
        val pairs = graft.operators.dedup.PortableMinHash
          .pairs(docs, col("text"), col("doc_id"), 0.3)
        val edges = pairs.select("doc_a", "doc_b")
        val comp = graft.operators.dedup.ConnectedComponents.components(
          pairs, "doc_a", "doc_b", docs, "doc_id")(s)
        val naive = docs.select(col("doc_id"), split(col("doc_id")).as("split"))
        val aware = comp.select(col("doc_id"), split(col("component")).as("split"))
        edges
          .join(naive.select(col("doc_id").as("doc_a"), col("split").as("na")), "doc_a")
          .join(naive.select(col("doc_id").as("doc_b"), col("split").as("nb")), "doc_b")
          .join(aware.select(col("doc_id").as("doc_a"), col("split").as("aa")), "doc_a")
          .join(aware.select(col("doc_id").as("doc_b"), col("split").as("ab")), "doc_b")
          .agg(
            count(lit(1)).as("n_pairs"),
            coalesce(sum(when(col("na") =!= col("nb"), 1L).otherwise(0L)), lit(0L))
              .cast("bigint").as("cross_naive"),
            coalesce(sum(when(col("aa") =!= col("ab"), 1L).otherwise(0L)), lit(0L))
              .cast("bigint").as("cross_dup_aware"))
      },
      Some(graft.operators.dedup.PortableMinHash.oracleLeakageSql(0.3))),
    Q(
      "qp15_sequence_packing",
      // next-fit packing of the corpus into 512-token training
      // sequences across 8 md5 shards — packs WHOLE documents (qt08's
      // cumsum-div-capacity bin is the doc-SPLITTING approximation;
      // this one never splits). The running (fill, bin) state
      // is a custom declarative window aggregate
      // (graft.functions.NextFitBin, the row_number pattern), so the
      // serial scan inside each shard is codegen'd; DuckDB re-walks
      // every shard with a recursive CTE and value-oracles each
      // document's sequence number.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.SequencePack.assign(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), capacity = 512, shards = 8)
      },
      Some(graft.operators.text.SequencePack.oracleAssignSql(512, 8)),
      bench = true),
    Q(
      "qp16_packing_efficiency",
      // the packing's report card: per shard, sequences used vs the
      // ceil(tokens/capacity) lower bound and utilization in basis
      // points (integer arithmetic) — the padding-waste number a
      // training-budget owner actually reads.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.SequencePack.stats(
          graft.operators.text.SequencePack.assign(
            Tables.load(s, dir, "documents"),
            col("text"), col("doc_id"), capacity = 512, shards = 8),
          capacity = 512)
      },
      Some(graft.operators.text.SequencePack.oracleStatsSql(512, 8))),
    Q(
      "qp17_packed_sequences",
      // the deliverable a trainer actually reads: each sequence's
      // documents concatenated in doc_id order, value-oracled
      // byte-for-byte through the per-sequence md5 — text moves
      // exactly once (the id-equi join), every group is
      // capacity-bounded by construction.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.load(s, dir, "documents")
        graft.operators.text.SequencePack.materialize(
          graft.operators.text.SequencePack.assign(
            docs, col("text"), col("doc_id"), capacity = 512, shards = 8),
          docs, col("text"), col("doc_id"))
      },
      Some(graft.operators.text.SequencePack.oracleMaterializeSql(512, 8))),
    Q(
      "qp18_curate_pack",
      // the full pre-training journey under ONE composed oracle:
      // curate (exact dedup -> near-dup keep-first -> token gate),
      // then sequence-pack the SURVIVORS -- per-shard packing
      // efficiency of the corpus a trainer actually sees. DuckDB
      // splices the curate CTE chain in front of the recursive pack
      // walk, re-rooted on the survivor set d3.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val curated = CorpusPipeline.curate(Tables.load(s, dir, "documents"))
        graft.operators.text.SequencePack.stats(
          graft.operators.text.SequencePack.assign(
            curated, col("text"), col("doc_id"), capacity = 512, shards = 8),
          capacity = 512)
      },
      Some {
        s"""WITH RECURSIVE ${CorpusPipeline.curateCtes("documents")},
           |${graft.operators.text.SequencePack.packCtesBody(512, 8, "d3")}
           |SELECT shard, count(*) AS n_docs, max(seq) AS n_seqs,
           |       CAST(sum(len) AS BIGINT) AS packed_tokens,
           |       (10000 * CAST(sum(len) AS BIGINT)) // (max(seq) * 512) AS util_bp,
           |       (CAST(sum(len) AS BIGINT) + 511) // 512 AS lower_bound_seqs
           |FROM pack GROUP BY shard""".stripMargin
      }),
    Q(
      "qp19_packing_shard_curve",
      // the shard-count tuning curve (qt47's sibling for the packer):
      // next-fit wastes at most one partial tail sequence PER SHARD,
      // so shard count trades packing parallelism against padding
      // waste -- the curve an operator reads before sizing a corpus's
      // packing job. DuckDB re-walks the full pack per candidate and
      // unions the rollups.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.SequencePack.shardCurve(
          Tables.load(s, dir, "documents"),
          col("text"), col("doc_id"), capacity = 512,
          shardCounts = Seq(1, 2, 4, 8, 16))
      },
      Some(graft.operators.text.SequencePack
        .oracleShardCurveSql(512, Seq(1, 2, 4, 8, 16)))),
    Q(
      "qp20_dsir_weights",
      // DSIR (Xie et al. 2023): per-document importance weight = the
      // log-likelihood ratio of the doc's hashed unigram+bigram
      // feature stream under a target-domain multinomial (here the
      // English slice) vs the raw-corpus multinomial, Laplace-
      // smoothed. The model is ONE broadcastable 1024-row bucket
      // table; weights are order-free integer micro-nat sums
      // (value-oracled).
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.ImportanceResample.weights(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          target = col("lang") === "en", buckets = 1024, smoothing = 1L)
      },
      Some(graft.operators.text.ImportanceResample
        .oracleWeightsSql("lang = 'en'", 1024, 1L)),
      bench = true),
    Q(
      "qp21_dsir_sample",
      // the resampling step: keep the top-100 docs by (weight DESC,
      // id) and report the selection rate per language -- the check
      // that distribution matching actually pulls toward the target
      // (en over-selected, the rest under-selected).
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.ImportanceResample.sampleSummary(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          strata = col("lang"), target = col("lang") === "en",
          buckets = 1024, smoothing = 1L, k = 100)
      },
      Some(graft.operators.text.ImportanceResample
        .oracleSampleSql("lang = 'en'", "lang", 1024, 1L, 100))),
    Q(
      "qp24_k_anonymity",
      // the release gate for relational data (Sweeney 2002): the
      // equivalence-class size histogram over the quasi-identifier
      // pair (nation, market segment) -- classes under k are
      // re-identifiable. One hash aggregation keyed by the quasi
      // tuple; the rollup is bounded by distinct class SIZES.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.KAnonymity.audit(
          Tables.load(s, dir, "customer"),
          quasi = Seq(col("c_nationkey"), col("c_mktsegment")), k = 10L)
      },
      Some(graft.operators.KAnonymity.oracleAuditSql(10L))),
    Q(
      "qp25_l_diversity",
      // k-anonymity's necessary companion (Machanavajjhala 2006): a
      // class can be large yet leak the SENSITIVE attribute when all
      // members share one value (homogeneity attack). Histogram of
      // per-class distinct-sensitive counts over quasi = nation,
      // sensitive = market segment.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.KAnonymity.diversityAudit(
          Tables.load(s, dir, "customer"),
          quasi = Seq(col("c_nationkey")),
          sensitive = col("c_mktsegment"), l = 3L)
      },
      Some(graft.operators.KAnonymity.oracleDiversitySql(3L))),
    Q(
      "qp26_t_closeness",
      // the third classic release gate (Li et al. 2007): a class can
      // be large AND diverse yet leak when its sensitive-value
      // DISTRIBUTION diverges from the global one (skewness attack).
      // Per-class total-variation distance, computed as an exact
      // integer sum over the classes x values grid (domain-bounded,
      // never the corpus) with ONE final float division.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.KAnonymity.closenessAudit(
          Tables.load(s, dir, "customer"),
          quasi = Seq(col("c_nationkey")),
          sensitive = col("c_mktsegment"), t = 0.2)
      },
      Some(graft.operators.KAnonymity.oracleClosenessSql(0.2))),
    Q(
      "qp27_diversity_budgets",
      // qd29's matrix put to work: each source's token budget is
      // proportional to its mean JS divergence from every other
      // source (+1 nano prior) -- "spend the budget on what's
      // actually distinct". Largest-remainder allocation over exact
      // integers, so the budgets sum to the total EXACTLY and the
      // whole chain value-oracles.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.SourceDivergence.diversityBudgets(
          Tables.load(s, dir, "documents"), col("text"), col("source"),
          totalTokens = 1000000L, buckets = 512, smoothing = 1L)
      },
      Some(graft.operators.text.SourceDivergence
        .oracleBudgetsSql(1000000L, 512, 1L))),
    Q(
      "qp23_dsir_gumbel",
      // DSIR's ACTUAL resampling step (the paper samples with
      // probability ~ exp(llr), i.e. Gumbel top-k on log weights),
      // made deterministic and portable: G = -ln(-ln u) with
      // u = (2*md5_52(id)+1)/2^53 -- the odd-numerator power-of-two
      // division is exact IEEE, so the noise is bit-identical in
      // both engines. Softer than qp21's argmax cut: off-target
      // languages keep a weight-proportional share.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.text.ImportanceResample.gumbelSampleSummary(
          Tables.load(s, dir, "documents"), col("text"), col("doc_id"),
          strata = col("lang"), target = col("lang") === "en",
          buckets = 1024, smoothing = 1L, k = 100, tau = 1.0)
      },
      Some(graft.operators.text.ImportanceResample
        .oracleGumbelSampleSql("lang = 'en'", "lang", 1024, 1L, 100, 1.0))),
    Q(
      "qp22_dsir_curate",
      // the new selector composed into the productized funnel: DSIR
      // top-200 toward the en target, then the FULL curation chain
      // (exact dedup -> near-dup keep-first -> token gate) re-rooted
      // on the selection, summarized per language -- one composed
      // DuckDB oracle re-derives selection AND curation end to end
      // (qp18's pattern with DSIR as the head stage).
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit, sum}
        val docs = Tables.load(s, dir, "documents")
        val sel = graft.operators.text.ImportanceResample.weights(
            docs, col("text"), col("doc_id"),
            target = col("lang") === "en", buckets = 1024, smoothing = 1L)
          .orderBy(col("lr_micro").desc, col("id")).limit(200)
          .select(col("id").as("doc_id"))
        val curated = CorpusPipeline.curate(
          docs.join(sel, Seq("doc_id")), minTokens = 20, simThreshold = 0.3)
        curated.groupBy("lang")
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(graft.operators.text.TextAnalysis.tokenCount(col("text"))
              .cast("long")).cast("bigint").as("total_tokens"))
      },
      Some {
        val toks = "length(regexp_split_to_array(trim(text), '\\s+'))"
        s"""WITH RECURSIVE ${graft.operators.text.ImportanceResample
            .selectionCtes("lang = 'en'", 1024, 1L, 200)},
           |${CorpusPipeline.curateCtes("dsel", 20, 0.3)}
           |SELECT lang, count(*)::BIGINT AS n_docs,
           |       CAST(sum(CAST($toks AS BIGINT)) AS BIGINT) AS total_tokens
           |FROM d3 GROUP BY lang""".stripMargin
      }),

    Q(
      "qp29_curriculum_buckets",
      // difficulty-ordered training schedule (curriculum learning,
      // Bengio et al. 2009): the corpus globally ordered by qt57's FK
      // grade (ungradeable docs last, id tiebreak) and cut into 10
      // equal ntile stages via GlobalOrder — N parallel window groups,
      // never a single-task global window (q34's machinery) — then a
      // per-stage rollup of doc/word mass and the grade range a
      // scheduler feeds from
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.operators.GlobalOrder
        val graded = graft.operators.text.Readability.grade(
            Tables.load(s, dir, "documents"), col("text"), col("doc_id"))
          .select(col("id"), col("words"), col("fk_milli"),
            coalesce(col("fk_milli"), lit(1.0e15)).as("fkk"))
        val (numbered, total) = GlobalOrder.withRowNumberCounted(
          graded, struct(col("fkk"), col("id")), rnName = "rn")
        numbered
          .withColumn("bucket",
            GlobalOrder.ntileFromRowNumber(col("rn"), total, 10))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("words").as("n_words"),
            min("fk_milli").as("fk_min"),
            max("fk_milli").as("fk_max"))
      },
      Some(s"""WITH g AS (${graft.operators.text.Readability.oracleSql()}),
              |r AS (SELECT *, ntile(10) OVER (
              |        ORDER BY coalesce(fk_milli, 1e15), id) AS bucket
              |      FROM g)
              |SELECT bucket, count(*)::BIGINT AS n_docs,
              |       CAST(sum(words) AS BIGINT) AS n_words,
              |       min(fk_milli) AS fk_min, max(fk_milli) AS fk_max
              |FROM r GROUP BY bucket""".stripMargin)),

    Q(
      "qp30_epoch_plan",
      // data-constrained training plan (Muennighoff et al. 2023): per
      // source, a natural-sampling token target from a fixed budget,
      // the epochs that target implies over the source's DEDUPED
      // (unique) tokens, and the effective tokens actually bought
      // under dyadic diminishing returns (every further epoch worth
      // half — CorpusOps.effectiveTokens, exact integer shifts). The
      // table that says "this budget re-reads source X 6 times but
      // only 1.9 epochs of it is worth anything". Shape: one token
      // scan + the bounded qd15 dedup feed one #sources-row rollup;
      // everything after is per-source scalar math. target floors are
      // misround-free for raw·B < 2^52 (fixture ~1e11).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val per = graft.operators.text.MixtureSolver
          .perSourceTokens(Tables.load(s, dir, "documents"), 0.3)
          .withColumnRenamed("avail_tokens", "unique_tokens")
        val B = 500000L
        per.crossJoin(per.agg(sum("raw_tokens").cast("bigint").as("tot")))
          .withColumn("target_tokens",
            floor((col("raw_tokens") * lit(B)).cast("double") /
              col("tot").cast("double")).cast("long"))
          .withColumn("epochs_milli",
            when(col("unique_tokens") > 0,
              floor((col("target_tokens") * lit(1000L)).cast("double") /
                col("unique_tokens").cast("double")).cast("long")))
          .withColumn("effective_tokens",
            graft.operators.text.CorpusOps.effectiveTokens(
              col("target_tokens"), col("unique_tokens")))
          .select("source", "raw_tokens", "unique_tokens", "target_tokens",
            "epochs_milli", "effective_tokens")
      },
      Some(s"""${graft.operators.dedup.PortableMinHash.pipelineCtes()},
              |kept AS (SELECT doc_id FROM documents
              |         WHERE doc_id NOT IN (SELECT doc_b FROM est WHERE est_jaccard >= 0.3)),
              |base AS (SELECT d.doc_id, d.source,
              |                CAST(length(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS nt,
              |                (d.doc_id IN (SELECT doc_id FROM kept)) AS is_kept
              |         FROM documents d),
              |per AS (SELECT source, CAST(sum(nt) AS BIGINT) AS raw_tokens,
              |               CAST(sum(CASE WHEN is_kept THEN nt ELSE 0 END) AS BIGINT)
              |                 AS unique_tokens
              |        FROM base GROUP BY source),
              |tot AS (SELECT CAST(sum(raw_tokens) AS BIGINT) AS tot FROM per),
              |t AS (SELECT source, raw_tokens, unique_tokens,
              |             CAST(floor(CAST(raw_tokens * 500000 AS DOUBLE) /
              |                        CAST(tot AS DOUBLE)) AS BIGINT) AS target_tokens
              |      FROM per, tot)
              |SELECT source, raw_tokens, unique_tokens, target_tokens,
              |       CASE WHEN unique_tokens > 0 THEN
              |         CAST(floor(CAST(target_tokens * 1000 AS DOUBLE) /
              |                    CAST(unique_tokens AS DOUBLE)) AS BIGINT) END
              |         AS epochs_milli,
              |       ${graft.operators.text.CorpusOps.effectiveTokensSql(
               "target_tokens", "unique_tokens")}
              |         AS effective_tokens
              |FROM t""".stripMargin)),

    Q(
      "qp31_capped_mixture",
      // the no-repeat mixture SOLVER between qt22 (targets ignore
      // availability) and qp30 (epochs repeat data): water-fill a
      // 30%-of-corpus token budget across sources ∝ sqrt(raw) with each
      // source capped at its DEDUPED tokens — saturated sources pin at
      // their cap, their unmet share re-distributes, fixed 5 rounds
      // (fixpoint asserted in spec). All data work is the one
      // per-source aggregation; the solver runs on the #sources-row
      // plan table.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val per = graft.operators.text.MixtureSolver
          .perSourceTokens(Tables.load(s, dir, "documents"), 0.3)
          .transform(graft.operators.Barrier.apply)
        val tot = per.agg(sum("raw_tokens")).head.getLong(0)
        graft.operators.text.MixtureSolver.waterFill(
          per, budget = tot * 3L / 10L, rounds = 5)
      },
      Some(s"""${graft.operators.dedup.PortableMinHash.pipelineCtes()},
              |kept AS (SELECT doc_id FROM documents
              |         WHERE doc_id NOT IN (SELECT doc_b FROM est WHERE est_jaccard >= 0.3)),
              |base AS (SELECT d.doc_id, d.source,
              |                CAST(length(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS nt,
              |                (d.doc_id IN (SELECT doc_id FROM kept)) AS is_kept
              |         FROM documents d),
              |per AS MATERIALIZED (SELECT source, CAST(sum(nt) AS BIGINT) AS raw_tokens,
              |               CAST(sum(CASE WHEN is_kept THEN nt ELSE 0 END) AS BIGINT)
              |                 AS avail_tokens
              |        FROM base GROUP BY source),
              |${graft.operators.text.MixtureSolver.waterFillSql(
               "SELECT (CAST(sum(raw_tokens) AS BIGINT) * 3) // 10 FROM per",
               rounds = 5)}""".stripMargin))
  )
}
