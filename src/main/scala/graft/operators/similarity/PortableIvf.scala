package graft.operators.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-verifiable IVF (the portable twin of [[IvfIndex]]):
  * coarse centroids are md5-derived constants instead of k-means-fitted
  * — the externally-supplied-codebook mode every production IVF runs in
  * (train offline, apply online) — so cell assignment (argmax cosine
  * over the codebook), probe selection, and the in-cell exact top-k are
  * all reproducible in SQL and value-oracled (query qs07). The fitted
  * variant ([[IvfIndex]], qs04) keeps data-adapted centroids — and is
  * ALSO value-oracled since round 13 ([[IvfOracle]] replays the fit) —
  * plus cross-checked against brute force in SimilaritySpec.
  */
object PortableIvf {

  val dim = 64
  val numCells = 8

  private def md5_40(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** centroidInts(c)(j): integer seeds shared with the oracle SQL;
    * component value = int/2^39 - 1 (exact double both engines). */
  val centroidInts: IndexedSeq[IndexedSeq[Long]] =
    (0 until numCells).map(c => (0 until dim).map(j => md5_40(s"ivf_${c}_$j")))

  private val half = (1L << 39).toDouble

  private def centroidVals(c: Int): Seq[Double] =
    centroidInts(c).map(v => v.toDouble / half - 1.0)

  /** Cell id: argmax of cosine against the codebook (ties to the larger
    * index — vanishing probability on real data). */
  def cell(v: Column): Column = {
    val scored = (0 until numCells).map { c =>
      struct(
        VectorOps.cosine(v, typedLit(centroidVals(c))).as("sim"),
        lit(c).as("idx"))
    }
    greatest(scored: _*).getField("idx")
  }

  /** Exact top-k restricted to the `nprobe` codebook cells nearest the
    * probe. */
  def topK(df: DataFrame, vec: Column, id: Column, probe: Seq[Float],
      k: Int, nprobe: Int): DataFrame = {
    val best = probedCells(probe, nprobe)
    val q = typedLit(probe)
    df.select(id.as("id"), vec.as("v"))
      .filter(cell(col("v")).isin(best: _*))
      .select(col("id"), VectorOps.cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** The `nprobe` codebook cells nearest (by cosine) to the probe —
    * the driver-side probe selection shared by [[topK]] and the
    * IVF×PQ composition ([[IvfPq]]). Stable sort: ties keep the lower
    * cell index. */
  def probedCells(probe: Seq[Float], nprobe: Int): Seq[Int] = {
    val probeD = probe.map(_.toDouble).toArray
    (0 until numCells)
      .sortBy(c => -IvfIndex.cosine(probeD, centroidVals(c).toArray))
      .take(nprobe)
  }

  /** [[probedCells]] as a pure COLUMN over a probe-vector column —
    * what lets a probe BATCH stay distributed ([[IvfPq.adcTopKBatch]]):
    * each executor derives its probes' cells locally, no driver
    * collect. Bit-identical to the driver path: the cosine expression
    * is the same single-pass fold as [[IvfIndex.cosine]] (independent
    * accumulators, same index order), and descending sort on
    * (sim, -cell) reproduces the stable sort's lower-cell tie-break. */
  def probedCellsCol(v: Column, nprobe: Int): Column = {
    val scored = array((0 until numCells).map { c =>
      struct(
        VectorOps.cosine(v, typedLit(centroidVals(c))).as("sim"),
        lit(-c).as("ncell"))
    }: _*)
    transform(
      slice(sort_array(scored, asc = false), 1, nprobe),
      s => -s.getField("ncell"))
  }

  // ---- oracle SQL fragments (shared with IvfPq's composed oracle) ----

  private def centroidList(c: Int): String = centroidInts(c).mkString("[", ",", "]")
  private def dotC(vec: String, c: Int): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |  j -> $vec[j]::DOUBLE * ((${centroidList(c)})[j] / 549755813888.0 - 1.0)), (x, y) -> x + y)""".stripMargin
  private def normC(c: Int): String =
    s"""sqrt(list_reduce(list_transform(range(1, ${dim + 1}),
       |  j -> ((${centroidList(c)})[j] / 549755813888.0 - 1.0) * ((${centroidList(c)})[j] / 549755813888.0 - 1.0)), (x, y) -> x + y))""".stripMargin
  private[similarity] def normV(vec: String): String =
    s"""sqrt(list_reduce(list_transform(range(1, ${dim + 1}),
       |  j -> $vec[j]::DOUBLE * $vec[j]::DOUBLE), (x, y) -> x + y))""".stripMargin
  private def cosC(vec: String, c: Int): String = {
    val d = s"${normV(vec)} * ${normC(c)}"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE (${dotC(vec, c)}) / ($d) END"
  }
  // argmax by (sim, idx): lexicographic max over [sim, idx] pairs —
  // the same tie-break as Spark's greatest(struct(sim, idx))
  private[similarity] def scoredListSql(vec: String): String =
    (0 until numCells)
      .map(c => s"[${cosC(vec, c)}, $c.0]")
      .mkString("[", ", ", "]")
  private[similarity] def cellSql(vec: String): String =
    s"CAST((list_max(${scoredListSql(vec)}))[2] AS INT)"

  /** DuckDB rendition: same codebook integers, same fold order, same
    * argmax-by-(sim, idx) tie-break, same restriction and ranking. */
  def oracleSql(k: Int, nprobe: Int): String = {
    def scoredList(vec: String): String = scoredListSql(vec)
    def cellSql(vec: String): String = PortableIvf.cellSql(vec)
    val dot = s"""list_reduce(list_transform(range(1, ${dim + 1}),
                 |  j -> e.embedding[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |probed AS (SELECT unnest(list_transform(
       |             list_slice(list_reverse_sort(${scoredList("p.pe")}), 1, $nprobe),
       |             x -> CAST(x[2] AS INT))) AS cell
       |           FROM p),
       |scored AS (
       |  SELECT vec_id,
       |         CASE WHEN ${normV("e.embedding")} * ${normV("p.pe")} = 0 THEN 0.0
       |              ELSE ($dot) / (${normV("e.embedding")} * ${normV("p.pe")}) END AS c
       |  FROM embeddings e, p
       |  WHERE ${cellSql("e.embedding")} IN (SELECT cell FROM probed))
       |SELECT vec_id, (floor((c) * 10000.0) / 10000.0) AS cosine
       |FROM scored ORDER BY c DESC, vec_id LIMIT $k""".stripMargin
  }

  /** The nprobe TUNING CURVE (the qt50/qt56/qp19 discipline applied
    * to ANN serving): for each nprobe, the scan cost (vectors inside
    * the probed cells) against the quality bought (exact-top-k hits
    * recovered, integer-mass ratio of retrieved vs exact cosine) —
    * the recall-vs-cost tradeoff an operator picks nprobe FROM,
    * measured instead of assumed. Scoring runs ONCE behind a Barrier
    * (cell id + cosine per vector); each nprobe row is a filter +
    * TakeOrdered over that one table. Mass sums are order-free
    * BIGINT micro-cosines, so every column value-oracles. */
  def nprobeCurve(
      df: DataFrame, vec: Column, id: Column, probe: Seq[Float],
      k: Int, nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= numCells))
    val q = typedLit(probe) // float literal — widens like the oracle's FLOAT[] probe
    val scored = graft.operators.Barrier(
      graft.operators.Parallelism.ensureMin(df).select(
        id.as("id"), cell(vec).as("cl"),
        VectorOps.cosine(vec, q).as("c")))
    def topk(d: DataFrame) = d
      .orderBy(col("c").desc, col("id")).limit(k)
      .select(col("id"), floor(col("c") * lit(1000000.0)).cast("long").as("m"))
    val exact = topk(scored)
    val exactMass = exact.agg(sum("m").as("em"))
    nprobes.map { np =>
      val cells = probedCells(probe, np)
      val in = scored.filter(col("cl").isin(cells: _*))
      val approx = topk(in)
      in.agg(count(lit(1)).as("scanned"))
        .crossJoin(approx.join(exact.select("id"), Seq("id"), "semi")
          .agg(count(lit(1)).as("hits")))
        .crossJoin(approx.agg(sum("m").as("am")))
        .crossJoin(exactMass)
        .select(
          lit(np).as("nprobe"), col("scanned"), col("hits"),
          graft.operators.PortableRound.floorTo(
            col("am").cast("double") / col("em").cast("double"), 4)
            .as("mass_ratio"))
    }.reduce(_ unionByName _)
  }

  /** qs36 oracle — literal SQL twin of [[nprobeCurve]] (probe =
    * vec_id 0). */
  def nprobeCurveSql(k: Int, nprobes: Seq[Int]): String = {
    val dot = s"""list_reduce(list_transform(range(1, ${dim + 1}),
                 |  j -> e.embedding[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    val perNp = nprobes.map { np =>
      s"""probed_$np AS (SELECT unnest(list_transform(
         |  list_slice(list_reverse_sort(${scoredListSql("p.pe")}), 1, $np),
         |  x -> CAST(x[2] AS INT))) AS cell FROM p),
         |in_$np AS (SELECT * FROM scored
         |           WHERE cl IN (SELECT cell FROM probed_$np)),
         |ap_$np AS (SELECT vec_id, CAST(floor(c * 1000000.0) AS BIGINT) AS m
         |           FROM in_$np ORDER BY c DESC, vec_id LIMIT $k)""".stripMargin
    }.mkString(",\n")
    val rows = nprobes.map { np =>
      s"""SELECT $np AS nprobe,
         |  (SELECT count(*) FROM in_$np)::BIGINT AS scanned,
         |  (SELECT count(*) FROM ap_$np
         |   WHERE vec_id IN (SELECT vec_id FROM exact))::BIGINT AS hits,
         |  ${graft.operators.PortableRound.floorToSql(
          s"CAST((SELECT sum(m) FROM ap_$np) AS DOUBLE) / CAST(em AS DOUBLE)", 4)}
         |    AS mass_ratio
         |FROM em""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id, ${cellSql("e.embedding")} AS cl,
       |         CASE WHEN ${normV("e.embedding")} * ${normV("p.pe")} = 0 THEN 0.0
       |              ELSE ($dot) / (${normV("e.embedding")} * ${normV("p.pe")}) END AS c
       |  FROM embeddings e, p),
       |exact AS (SELECT vec_id, CAST(floor(c * 1000000.0) AS BIGINT) AS m
       |          FROM scored ORDER BY c DESC, vec_id LIMIT $k),
       |em AS (SELECT CAST(sum(m) AS BIGINT) AS em FROM exact),
       |$perNp
       |$rows""".stripMargin
  }

  /** qs29's oracle: per-cell load factor + append drift over the
    * portable codebook (base = even vec_ids, increment = odd — the
    * qs24 append convention); the cell frame densifies empty cells. */
  def balanceOracleSql: String =
    s"""WITH a AS (
       |  SELECT ${cellSql("embedding")} AS cell,
       |         (vec_id % 2 = 0) AS is_base
       |  FROM embeddings),
       |h AS (
       |  SELECT cell,
       |         count(*) FILTER (WHERE is_base)::BIGINT AS base_n,
       |         count(*) FILTER (WHERE NOT is_base)::BIGINT AS inc_n
       |  FROM a GROUP BY cell),
       |g AS (
       |  SELECT gs.cell, COALESCE(h.base_n, 0) AS base_n,
       |         COALESCE(h.inc_n, 0) AS inc_n
       |  FROM range(0, $numCells) gs(cell)
       |  LEFT JOIN h ON h.cell = gs.cell)
       |SELECT cell, base_n, inc_n,
       |       CAST((base_n + inc_n) * $numCells AS DOUBLE) /
       |       CAST(sum(base_n + inc_n) OVER () AS DOUBLE) AS load_factor,
       |       CAST(inc_n * $numCells AS DOUBLE) /
       |       CAST(sum(inc_n) OVER () AS DOUBLE) -
       |       CAST(base_n * $numCells AS DOUBLE) /
       |       CAST(sum(base_n) OVER () AS DOUBLE) AS drift
       |FROM g""".stripMargin

  /** qs28's oracle: the qs26 cross-label cell restriction generalized
    * to a probe TABLE (the qs19/qs27 batch structure) — per-probe
    * probed cells, exact cosine on the restricted candidates, label
    * inequality before ranking, per-probe window top-k. */
  def oracleCrossLabelBatchSql(maxProbeId: Int, k: Int, nprobe: Int): String = {
    val dot = s"""list_reduce(list_transform(range(1, ${dim + 1}),
                 |  j -> e.embedding[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label AS pl
       |           FROM embeddings WHERE vec_id < $maxProbeId),
       |probed AS (SELECT probe_id, unnest(list_transform(
       |             list_slice(list_reverse_sort(${scoredListSql("p.pe")}), 1, $nprobe),
       |             x -> CAST(x[2] AS INT))) AS cell
       |           FROM p),
       |cells AS (SELECT vec_id, label, embedding,
       |                 ${cellSql("embedding")} AS cell
       |          FROM embeddings),
       |scored AS (
       |  SELECT p.probe_id, e.vec_id AS corpus_id, e.label AS corpus_label,
       |         CASE WHEN ${normV("e.embedding")} * ${normV("p.pe")} = 0 THEN 0.0
       |              ELSE ($dot) / (${normV("e.embedding")} * ${normV("p.pe")}) END AS c
       |  FROM cells e
       |  JOIN probed q ON e.cell = q.cell
       |  JOIN p ON p.probe_id = q.probe_id
       |  WHERE e.label <> p.pl)
       |SELECT probe_id, corpus_id, corpus_label, (floor((c) * 10000.0) / 10000.0) AS cosine, rank FROM (
       |  SELECT probe_id, corpus_id, corpus_label, c,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY c DESC, corpus_id) AS rank
       |  FROM scored) z
       |WHERE rank <= $k""".stripMargin
  }

  /** qs26's oracle: [[oracleSql]]'s cell-restricted scan with the
    * cross-label filter of hard-negative mining — the scale path for
    * [[HardNegatives]] (scan nprobe cells, not the corpus), rendered
    * verbatim in SQL so the restricted ranking value-oracles. */
  def oracleCrossLabelSql(k: Int, nprobe: Int): String = {
    val dot = s"""list_reduce(list_transform(range(1, ${dim + 1}),
                 |  j -> e.embedding[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    s"""WITH p AS (SELECT embedding AS pe, label AS pl FROM embeddings WHERE vec_id = 0),
       |probed AS (SELECT unnest(list_transform(
       |             list_slice(list_reverse_sort(${scoredListSql("p.pe")}), 1, $nprobe),
       |             x -> CAST(x[2] AS INT))) AS cell
       |           FROM p),
       |scored AS (
       |  SELECT vec_id,
       |         CASE WHEN ${normV("e.embedding")} * ${normV("p.pe")} = 0 THEN 0.0
       |              ELSE ($dot) / (${normV("e.embedding")} * ${normV("p.pe")}) END AS c
       |  FROM embeddings e, p
       |  WHERE ${cellSql("e.embedding")} IN (SELECT cell FROM probed)
       |    AND e.label <> p.pl)
       |SELECT vec_id, (floor((c) * 10000.0) / 10000.0) AS cosine
       |FROM scored ORDER BY c DESC, vec_id LIMIT $k""".stripMargin
  }
}
