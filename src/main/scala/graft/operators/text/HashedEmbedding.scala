package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Feature-hashing document embeddings (the hashing trick, Weinberger
  * et al. 2009): each term occurrence adds ±1 into one of D
  * dimensions — index and sign both md5-derived — giving every
  * document a dense INTEGER vector whose inner products approximate
  * term-overlap similarity, with no trained model, no vocabulary
  * table, and no floats until the final cosine. The text-only bridge
  * into the similarity family: qs02-style retrieval over a corpus
  * that has no `embeddings` table.
  *
  * Scale shape: embedding is one explode + one (id, dim) rollup —
  * map-side combinable, output D longs per doc; retrieval against a
  * single probe broadcasts the probe's D values and reduces to a
  * TakeOrdered top-k, identical to the qs02 plan. Nothing is
  * quadratic; the sparse-dot oracle identity (zero dims contribute
  * nothing) is also what a 100 TB implementation exploits.
  *
  * Portability: vectors are exact BIGINTs (order-free sums of ±1),
  * dot/norms are exact integer arithmetic, and the one float — cosine
  * — is a single identical IEEE expression floor-projected at 4 dp;
  * ties in the top-k cut break on doc id. Value-oracled end to end.
  */
object HashedEmbedding {

  private def bucket(term: Column, dim: Int): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % dim

  /** +1 / −1 from an independent md5 slice. */
  private def sign(term: Column): Column =
    lit(1L) - lit(2L) * (conv(substring(md5(term), 9, 8), 16, 10)
      .cast("long") % 2)

  /** Sparse components: (id, j, v) — only nonzero dims. */
  def components(
      df: DataFrame, text: Column, id: Column, dim: Int): DataFrame =
    componentsTok(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), TextOps.tokens(text).as("toks")), dim)

  /** [[components]] over a PRE-TOKENIZED frame (id, toks, ...) — the
    * shared-scan entry (r20): a caller that already tokenized the
    * corpus (HybridRetrieval shares one tokenized barrier across both
    * retrieval legs) skips the second tokenize pass; the md5 hashing
    * and rollup are identical expressions, so components are
    * bit-identical to [[components]]. */
  private[text] def componentsTok(tok: DataFrame, dim: Int): DataFrame = {
    require(dim >= 2, s"bad dim $dim")
    tok
      .select(col("id"), explode(col("toks")).as("term"))
      .where(col("term") =!= "")
      .select(col("id"), bucket(col("term"), dim).as("j"),
        sign(col("term")).as("s"))
      .groupBy("id", "j").agg(sum("s").as("v"))
      .where(col("v") =!= 0L)
  }

  /** Dense embeddings: (id, emb array<bigint> of length dim). */
  def embed(
      df: DataFrame, text: Column, id: Column, dim: Int = 64): DataFrame =
    components(df, text, id, dim)
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("j"), col("v"))))
        .as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("m"), j.cast("long")), lit(0L)))
          .as("emb"))

  /** [[embed]] exploded back to dense SCALAR rows (id, j, v) — one
    * row per (doc, dim) incl. zeros. The oracle-comparison harness
    * cannot hash an array result column (pandas sort chokes on
    * ndarray cells), so the value-oracled query surface ships this
    * shape; the array shape stays for programmatic use. */
  def embedRows(
      df: DataFrame, text: Column, id: Column, dim: Int = 64): DataFrame =
    embed(df, text, id, dim)
      .select(col("id"), posexplode(col("emb")).as(Seq("j", "v")))
      .select(col("id"), col("j").cast("bigint").as("j"), col("v"))

  /** Text-only retrieval: top-k most cosine-similar documents to
    * `probeId`'s embedding — (id, dot, cos). Exact integer dots and
    * norms; the probe's sparse components broadcast. */
  def topK(
      df: DataFrame,
      text: Column,
      id: Column,
      probeId: Long,
      dim: Int = 64,
      k: Int = 10): DataFrame = {
    // three consumers (the probe row, norms, the hit join) — barrier
    // the component scan so it runs once (r19)
    val comp = graft.operators.Barrier(components(df, text, id, dim))
    val probe = comp.where(col("id") === probeId)
      .select(col("j"), col("v").as("pv"))
    rankAgainst(comp, probe, k, excludeId = Some(probeId))
  }

  /** Retrieval by QUERY STRING: the query text embeds through the
    * identical hashing, so free-text search needs no model and no
    * pre-built probe — (id, dot, cos). */
  def queryTopK(
      df: DataFrame,
      text: Column,
      id: Column,
      query: String,
      dim: Int = 64,
      k: Int = 10): DataFrame = {
    val ss = df.sparkSession
    import ss.implicits._
    // norms + the hit join both consume the component scan (r19)
    val comp = graft.operators.Barrier(components(df, text, id, dim))
    val probe = components(
        Seq((0L, query)).toDF("qid", "qtext"),
        col("qtext"), col("qid"), dim)
      .select(col("j"), col("v").as("pv"))
    rankAgainst(comp, probe, k, excludeId = None)
  }

  /** [[queryTopK]] for a BATCH of query strings in ONE corpus pass:
    * corpus components and norms are computed once, every query's
    * sparse probe broadcasts as one (query_id, j, pv) table into a
    * single hit join, and ranking is a per-query grouped window
    * (partitionBy query_id — the qs27/qe16 batch discipline). Scoring
    * is bit-identical to the solo path. Returns
    * (query_id, id, dot, cos, dense_rank ≤ k). */
  def queryTopKBatch(
      df: DataFrame,
      text: Column,
      id: Column,
      queries: Seq[(Long, String)],
      dim: Int = 64,
      k: Int = 10): DataFrame =
    queryTopKBatchTok(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), TextOps.tokens(text).as("toks")),
      df.sparkSession, queries, dim, k)

  /** [[queryTopKBatch]] over a PRE-TOKENIZED frame (id, toks, ...) —
    * see [[componentsTok]]. */
  private[text] def queryTopKBatchTok(
      tok: DataFrame,
      ss: org.apache.spark.sql.SparkSession,
      queries: Seq[(Long, String)],
      dim: Int,
      k: Int): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    import ss.implicits._
    // norms AND the probe hit-join both consume the corpus components,
    // whose lineage is a tokenize+md5 explode scan — barrier so the
    // scan runs once, not twice (r19)
    val comp = graft.operators.Barrier(componentsTok(tok, dim))
    val probes = components(
        queries.toDF("qid", "qtext"), col("qtext"), col("qid"), dim)
      .select(col("id").as("query_id"), col("j"), col("v").as("pv"))
    val norms = comp.groupBy("id").agg(sum(col("v") * col("v")).as("nn"))
    val pnorms = probes.groupBy("query_id")
      .agg(sum(col("pv") * col("pv")).as("pn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    comp
      .join(broadcast(probes), Seq("j"))
      .groupBy("query_id", "id").agg(sum(col("v") * col("pv")).as("dot"))
      .join(norms, Seq("id"))
      .join(broadcast(pnorms), Seq("query_id"))
      .select(col("query_id"), col("id"),
        col("dot").cast("bigint").as("dot"),
        PortableRound.floorTo(
          col("dot").cast("double") /
            sqrt(col("nn").cast("double") * col("pn").cast("double")),
          4).as("cos"))
      .withColumn("dense_rank", row_number().over(w).cast("long"))
      .filter(col("dense_rank") <= k)
  }

  private def rankAgainst(
      comp: DataFrame,
      probe: DataFrame,
      k: Int,
      excludeId: Option[Long]): DataFrame = {
    val norms = comp.groupBy("id").agg(sum(col("v") * col("v")).as("nn"))
    val pnorm = probe.agg(sum(col("pv") * col("pv")).as("pn"))
    val scored = comp
      .join(broadcast(probe), Seq("j"))
      .groupBy("id").agg(sum(col("v") * col("pv")).as("dot"))
      .join(norms, Seq("id"))
      .crossJoin(broadcast(pnorm))
    excludeId.fold(scored)(pid => scored.where(col("id") =!= pid))
      .select(col("id"), col("dot").cast("bigint").as("dot"),
        PortableRound.floorTo(
          col("dot").cast("double") /
            sqrt(col("nn").cast("double") * col("pn").cast("double")),
          4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  // ---- DuckDB oracles ----

  private val normSql =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  private def componentsCtes(dim: Int): String =
    s"""toks AS (SELECT doc_id AS id, unnest(string_split($normSql, ' ')) AS term
       |         FROM documents),
       |comp AS (
       |  SELECT id,
       |         CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % $dim AS j,
       |         CAST(sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) AS BIGINT) AS v
       |  FROM toks WHERE term <> ''
       |  GROUP BY 1, 2
       |  HAVING sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) <> 0)""".stripMargin

  /** qs30 oracle — literal SQL twin of [[embedRows]] (dense scalar
    * rows; the array shape is unhashable for the harness). */
  def oracleEmbedSql(dim: Int = 64): String =
    s"""WITH ${componentsCtes(dim)},
       |dims AS (SELECT unnest(range(0, $dim)) AS j)
       |SELECT d.id, CAST(dims.j AS BIGINT) AS j,
       |       CAST(coalesce(c.v, 0) AS BIGINT) AS v
       |FROM (SELECT DISTINCT id FROM comp) d
       |CROSS JOIN dims
       |LEFT JOIN comp c ON c.id = d.id AND c.j = dims.j""".stripMargin

  /** qs32 oracle — literal SQL twin of [[queryTopK]]: the query
    * string hashes through the identical md5 pipeline from a VALUES
    * row. */
  def oracleQueryTopKSql(query: String, dim: Int = 64, k: Int = 10): String = {
    val q = query.replace("'", "''")
    s"""WITH ${componentsCtes(dim)},
       |qprobe AS (
       |  SELECT CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % $dim AS j,
       |         CAST(sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) AS BIGINT) AS pv
       |  FROM (SELECT unnest(string_split($normSql, ' ')) AS term
       |        FROM (SELECT '$q' AS text) qq) z
       |  WHERE term <> ''
       |  GROUP BY 1
       |  HAVING sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) <> 0),
       |norms AS (SELECT id, CAST(sum(v * v) AS BIGINT) AS nn FROM comp GROUP BY id),
       |pn AS (SELECT CAST(sum(pv * pv) AS BIGINT) AS pn FROM qprobe),
       |dots AS (
       |  SELECT c.id, CAST(sum(c.v * qprobe.pv) AS BIGINT) AS dot
       |  FROM comp c JOIN qprobe ON qprobe.j = c.j
       |  GROUP BY c.id)
       |SELECT d.id, d.dot,
       |       ${PortableRound.floorToSql(
          "CAST(d.dot AS DOUBLE) / sqrt(CAST(norms.nn AS DOUBLE) * CAST(pn.pn AS DOUBLE))", 4)} AS cos
       |FROM dots d JOIN norms ON norms.id = d.id, pn
       |ORDER BY cos DESC, d.id
       |LIMIT $k""".stripMargin
  }

  /** qt55 oracle — [[queryTopK]] over OVERLAPPING TOKEN CHUNKS (the
    * RAG retrieval unit): chunks re-derive with the qt18 slice
    * conventions, chunk ids compose as doc_id·100000 + start. */
  def oracleChunkQueryTopKSql(
      query: String,
      maxTokens: Int,
      stride: Int,
      dim: Int = 64,
      k: Int = 10): String = {
    val q = query.replace("'", "''")
    s"""WITH nrm AS (SELECT doc_id, $normSql AS nt FROM documents),
       |tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM nrm),
       |st AS (SELECT doc_id, toks,
       |              unnest(range(1, len(toks) + 1, $stride)) AS s
       |       FROM tk),
       |ch AS (SELECT doc_id * 100000 + s AS cid,
       |              list_aggregate(toks[s:s+${maxTokens - 1}], 'string_agg', ' ') AS ctext
       |       FROM st),
       |comp AS (
       |  SELECT cid AS id,
       |         CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % $dim AS j,
       |         CAST(sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) AS BIGINT) AS v
       |  FROM (SELECT cid, unnest(string_split(ctext, ' ')) AS term FROM ch) z
       |  WHERE term <> ''
       |  GROUP BY 1, 2
       |  HAVING sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) <> 0),
       |qprobe AS (
       |  SELECT CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % $dim AS j,
       |         CAST(sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) AS BIGINT) AS pv
       |  FROM (SELECT unnest(string_split($normSql, ' ')) AS term
       |        FROM (SELECT '$q' AS text) qq) z
       |  WHERE term <> ''
       |  GROUP BY 1
       |  HAVING sum(1 - 2 * (CAST(('0x' || substring(md5(term), 9, 8)) AS BIGINT) % 2)) <> 0),
       |norms AS (SELECT id, CAST(sum(v * v) AS BIGINT) AS nn FROM comp GROUP BY id),
       |pn AS (SELECT CAST(sum(pv * pv) AS BIGINT) AS pn FROM qprobe),
       |dots AS (
       |  SELECT c.id, CAST(sum(c.v * qprobe.pv) AS BIGINT) AS dot
       |  FROM comp c JOIN qprobe ON qprobe.j = c.j
       |  GROUP BY c.id),
       |ranked AS (
       |  SELECT d.id, d.dot,
       |         ${PortableRound.floorToSql(
          "CAST(d.dot AS DOUBLE) / sqrt(CAST(norms.nn AS DOUBLE) * CAST(pn.pn AS DOUBLE))", 4)} AS cos
       |  FROM dots d JOIN norms ON norms.id = d.id, pn
       |  ORDER BY cos DESC, d.id
       |  LIMIT $k)
       |SELECT id // 100000 AS doc_id, CAST(id % 100000 AS BIGINT) AS chunk_start,
       |       dot, cos
       |FROM ranked""".stripMargin
  }

  /** qs31 oracle — literal SQL twin of [[topK]] (sparse-dot
    * identity: zero dims contribute nothing). */
  def oracleTopKSql(probeId: Long, dim: Int = 64, k: Int = 10): String =
    s"""WITH ${componentsCtes(dim)},
       |probe AS (SELECT j, v AS pv FROM comp WHERE id = $probeId),
       |norms AS (SELECT id, CAST(sum(v * v) AS BIGINT) AS nn FROM comp GROUP BY id),
       |pn AS (SELECT CAST(sum(pv * pv) AS BIGINT) AS pn FROM probe),
       |dots AS (
       |  SELECT c.id, CAST(sum(c.v * probe.pv) AS BIGINT) AS dot
       |  FROM comp c JOIN probe ON probe.j = c.j
       |  GROUP BY c.id)
       |SELECT d.id, d.dot,
       |       ${PortableRound.floorToSql(
          "CAST(d.dot AS DOUBLE) / sqrt(CAST(norms.nn AS DOUBLE) * CAST(pn.pn AS DOUBLE))", 4)} AS cos
       |FROM dots d JOIN norms ON norms.id = d.id, pn
       |WHERE d.id <> $probeId
       |ORDER BY cos DESC, d.id
       |LIMIT $k""".stripMargin
}
