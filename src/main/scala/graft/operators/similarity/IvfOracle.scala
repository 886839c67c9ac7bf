package graft.operators.similarity

/** DuckDB oracle SQL for the FITTED IVF path ([[IvfIndex]]) — the last
  * query off round 12's rows-only list (qs04). The whole pipeline is
  * re-derived in SQL, Lloyd iterations included:
  *
  *   1. the training sample: rows ranked by `md5('ivf_sample_' || id)`
  *      (both engines hash the same string to the same hex, and hex
  *      strings compare identically), capped at `sampleSize`;
  *   2. init: deterministic farthest-point — start from the rank-1
  *      sample row, then `numCells − 1` greedy steps, each adding the
  *      sample vector with the smallest max-cosine to the chosen set
  *      (argmin with lower-rank tie-break, mirroring the fit loop's
  *      strict comparisons);
  *   3. `iterations` Lloyd rounds, one materialized CTE chain each:
  *      assignment is argmax cosine with FIRST-best tie-break
  *      (`list_max` over [sim, −cell] mirrors the fit loop's strict
  *      `>`), the centroid update sums members in RANK order
  *      (`list_reduce` over `list(x ORDER BY rnk)` — the fit loop
  *      iterates the collected sample in that same order, so the float
  *      sums are bit-identical), empty cells keep their center;
  *   4. serving: corpus cell assignment (argmax with HIGHER-index
  *      tie-break — `greatest(struct(sim, idx))` on the Spark side),
  *      probe-cell selection (stable sort, LOWER index on ties), and
  *      the exact-cosine top-k with id tie-break.
  *
  * All cosines are the established ordered-fold form (dot, |a|², |b|²
  * as independent sequential sums — bit-identical to the single-pass
  * kernels in [[graft.functions.VectorExprs]] and [[IvfIndex.cosine]]).
  * Cost is sample×cells×dim per iteration — vocabulary-free and
  * corpus-free beyond the sample cap, ~3 s at sf0.1.
  */
object IvfOracle {

  /** Ordered dot fold over two DOUBLE[] list expressions. */
  private def dotW(a: String, b: String, dim: Int): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |      j -> $a[j] * $b[j]), (x, y) -> x + y)""".stripMargin

  /** |v|² as the same ordered fold. */
  private def sq(a: String, dim: Int): String = dotW(a, a, dim)

  private def cosine(dot: String, na: String, nb: String): String =
    s"""CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN 0.0
       |     ELSE ($dot) / (sqrt($na) * sqrt($nb)) END""".stripMargin

  /** CTEs ending in `cent_<iterations>(cell, w, nb)` — the fitted
    * codebook — plus `smp` (the ranked sample) and `corp` (the corpus
    * as DOUBLE lists with |v|²). */
  def fitCtes(
      numCells: Int, dim: Int, sampleSize: Int, iterations: Int): String = {
    val header =
      s"""smp AS MATERIALIZED (
         |  SELECT row_number() OVER (
         |           ORDER BY md5('ivf_sample_' || CAST(vec_id AS VARCHAR))) AS rnk,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |  QUALIFY rnk <= $sampleSize),
         |smpn AS MATERIALIZED (
         |  SELECT rnk, v, ${sq("v", dim)} AS na FROM smp),
         |corp AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |corpn AS MATERIALIZED (
         |  SELECT vec_id, v, ${sq("v", dim)} AS na FROM corp),
         |ic_1 AS MATERIALIZED (
         |  SELECT CAST(0 AS INT) AS cell, v AS w, na AS nb
         |  FROM smpn WHERE rnk = 1)""".stripMargin
    // the WHERE guard mirrors the fit loop's stop condition
    // `centers.length < min(numCells, sample.length)`: the t-th center
    // is added only while t <= |sample| — without it, a corpus smaller
    // than numCells would re-pick already-chosen rows here (duplicate
    // centroids) while the Spark fit simply stops (round-13 review)
    val initSteps = (2 to numCells).map { t =>
      s"""icd_$t AS MATERIALIZED (
         |  SELECT s.rnk, max(${cosine(dotW("s.v", "c.w", dim), "s.na", "c.nb")}) AS d
         |  FROM smpn s CROSS JOIN ic_${t - 1} c GROUP BY s.rnk),
         |pick_$t AS (SELECT rnk FROM icd_$t ORDER BY d ASC, rnk ASC LIMIT 1),
         |ic_$t AS MATERIALIZED (
         |  SELECT * FROM ic_${t - 1}
         |  UNION ALL
         |  SELECT CAST(${t - 1} AS INT) AS cell, s.v AS w, s.na AS nb
         |  FROM smpn s JOIN pick_$t p ON s.rnk = p.rnk
         |  WHERE $t <= (SELECT count(*) FROM smpn))""".stripMargin
    }.mkString(",\n")
    val centInit =
      s"cent_0 AS MATERIALIZED (SELECT cell, w, nb FROM ic_$numCells)"
    val iters = (1 to iterations).map { t =>
      val prev = s"cent_${t - 1}"
      s"""sc_$t AS MATERIALIZED (
         |  SELECT s.rnk, c.cell,
         |         ${cosine(dotW("s.v", "c.w", dim), "s.na", "c.nb")} AS sim
         |  FROM smpn s CROSS JOIN $prev c),
         |asg_$t AS MATERIALIZED (
         |  SELECT rnk,
         |         CAST(-((list_max(list([sim, -CAST(cell AS DOUBLE)])))[2]) AS INT) AS cell
         |  FROM sc_$t GROUP BY rnk),
         |sums_$t AS MATERIALIZED (
         |  SELECT a.cell, jj.j AS j,
         |         list_reduce(list(s.v[jj.j] ORDER BY s.rnk), (x, y) -> x + y) AS sm,
         |         count(*) AS cnt
         |  FROM asg_$t a JOIN smp s USING (rnk)
         |  CROSS JOIN unnest(range(1, ${dim + 1})) AS jj(j)
         |  GROUP BY a.cell, jj.j),
         |newc_$t AS (
         |  SELECT cell, list(sm / CAST(cnt AS DOUBLE) ORDER BY j) AS w
         |  FROM sums_$t GROUP BY cell),
         |cent_$t AS MATERIALIZED (
         |  SELECT p.cell, COALESCE(n.w, p.w) AS w,
         |         ${sq("COALESCE(n.w, p.w)", dim)} AS nb
         |  FROM $prev p LEFT JOIN newc_$t n USING (cell))""".stripMargin
    }.mkString(",\n")
    s"$header,\n$initSteps,\n$centInit,\n$iters"
  }

  /** qs04 oracle: fit + serve (probe = the vec_id 0 embedding). */
  def oracleTopKSql(
      numCells: Int, k: Int, nprobe: Int,
      dim: Int = 64, sampleSize: Int = 10000, iterations: Int = 10): String = {
    val cent = s"cent_$iterations"
    s"""WITH ${fitCtes(numCells, dim, sampleSize, iterations)},
       |probe AS MATERIALIZED (
       |  SELECT v AS pe, na AS pna FROM corpn WHERE vec_id = 0),
       |psim AS (
       |  SELECT c.cell,
       |         ${cosine(dotW("p.pe", "c.w", dim), "p.pna", "c.nb")} AS sim
       |  FROM $cent c CROSS JOIN probe p),
       |probed AS (
       |  SELECT unnest(list_transform(
       |           list_slice(list_reverse_sort(
       |             (SELECT list([sim, -CAST(cell AS DOUBLE)]) FROM psim)), 1, $nprobe),
       |           x -> CAST(-x[2] AS INT))) AS cell),
       |csim AS MATERIALIZED (
       |  SELECT e.vec_id, c.cell,
       |         ${cosine(dotW("e.v", "c.w", dim), "e.na", "c.nb")} AS sim
       |  FROM corpn e CROSS JOIN $cent c),
       |ccell AS (
       |  SELECT vec_id,
       |         CAST((list_max(list([sim, CAST(cell AS DOUBLE)])))[2] AS INT) AS cell
       |  FROM csim GROUP BY vec_id),
       |scored AS (
       |  SELECT e.vec_id,
       |         ${cosine(dotW("e.v", "p.pe", dim), "e.na", "p.pna")} AS c
       |  FROM corpn e
       |  JOIN ccell u ON u.vec_id = e.vec_id
       |  CROSS JOIN probe p
       |  WHERE u.cell IN (SELECT cell FROM probed))
       |SELECT vec_id, floor(c * 10000.0) / 10000.0 AS cosine
       |FROM scored ORDER BY c DESC, vec_id LIMIT $k""".stripMargin
  }
}
