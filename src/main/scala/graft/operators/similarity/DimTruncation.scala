package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.PortableRound

/** Dimension-truncation retrieval tuning curve (the Matryoshka /
  * prefix-embedding discipline — Kusupati et al. 2022, "Matryoshka
  * Representation Learning"): score retrieval with only the FIRST `d`
  * components of each embedding and measure what that prefix buys —
  * exact-top-k hits recovered and the full-dimension cosine mass of the
  * retrieved set — per `d`. This is the bandwidth knob of a vector
  * scan: a 16-of-64 prefix reads 25% of the vector bytes (in a
  * columnar layout with prefix blocks stored separately, literally 25%
  * of the I/O), and the curve MEASURES the recall cost of that saving
  * instead of assuming it, exactly as [[PortableIvf.nprobeCurve]] does
  * for the nprobe knob (qs36) and qt50/qt56 do for sketch sizes.
  *
  * 100 TB shape: ONE corpus scan computes every prefix score (the
  * cosine expression folds over `min(len(a), len(b))`, so a truncated
  * probe literal scores the prefix with no per-row slice allocation —
  * all `len(dims)` cosines ride the same whole-stage-codegen pass),
  * Barrier'd so the per-dim rows never rescan; each curve row is then
  * a TakeOrdered(k) cut plus tiny aggregates — no global sort, no
  * shuffle proportional to the corpus. Mass sums are order-free BIGINT
  * micro-cosines, so every column value-oracles (qs37).
  */
object DimTruncation {

  val fullDim = 64

  /** For each d in `dims`: top-k by prefix-d cosine, reported as
    * (dim, hits = overlap with the exact full-dim top-k, mass_ratio =
    * full-dim micro-cosine mass of the retrieved set over the exact
    * top-k's mass). `dims` must include [[fullDim]] semantics via
    * d = fullDim if the exact row is wanted in the curve. */
  def curve(
      df: DataFrame, vec: Column, id: Column, probe: Seq[Float],
      k: Int, dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= fullDim),
      s"dims must be within [1, $fullDim]")
    def c(d: Int) = if (d == fullDim) "c_full" else s"c_$d"
    val prefixCols = dims.filter(_ < fullDim).map { d =>
      VectorOps.cosine(vec, typedLit(probe.take(d))).as(c(d))
    }
    val scored = graft.operators.Barrier(
      graft.operators.Parallelism.ensureMin(df).select(
        (id.as("id") +: VectorOps.cosine(vec, typedLit(probe)).as("c_full")
          +: prefixCols): _*))
    def topk(scoreCol: String) = scored
      .orderBy(col(scoreCol).desc, col("id")).limit(k)
      .select(col("id"), floor(col("c_full") * lit(1000000.0)).cast("long").as("m"))
    val exact = topk("c_full")
    val exactMass = exact.agg(sum("m").as("em"))
    dims.map { d =>
      val approx = topk(c(d))
      approx.join(exact.select("id"), Seq("id"), "semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(approx.agg(sum("m").as("am")))
        .crossJoin(exactMass)
        .select(
          lit(d).as("dim"), col("hits"),
          PortableRound.floorTo(
            col("am").cast("double") / col("em").cast("double"), 4)
            .as("mass_ratio"))
    }.reduce(_ unionByName _)
  }

  /** qs37 oracle — literal SQL twin of [[curve]] (probe = vec_id 0):
    * the same prefix folds (`range(1, d+1)`, sequential list_reduce —
    * bit-identical to the single-pass codegen cosine's independent
    * accumulators), the same (score desc, id) cut, the same BIGINT
    * micro-cosine masses. */
  def curveSql(k: Int, dims: Seq[Int]): String = {
    def dotD(d: Int) =
      s"""list_reduce(list_transform(range(1, ${d + 1}),
         |  j -> e.embedding[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    def normD(vec: String, d: Int) =
      s"""sqrt(list_reduce(list_transform(range(1, ${d + 1}),
         |  j -> $vec[j]::DOUBLE * $vec[j]::DOUBLE), (x, y) -> x + y))""".stripMargin
    def cosD(d: Int) =
      s"""CASE WHEN ${normD("e.embedding", d)} * ${normD("p.pe", d)} = 0 THEN 0.0
         |     ELSE (${dotD(d)}) / (${normD("e.embedding", d)} * ${normD("p.pe", d)}) END""".stripMargin
    def cName(d: Int) = if (d == fullDim) "c_full" else s"c_$d"
    val scoreCols = (s"${cosD(fullDim)} AS c_full" +:
      dims.filter(_ < fullDim).map(d => s"${cosD(d)} AS ${cName(d)}")).mkString(",\n")
    val perDim = dims.map { d =>
      s"""ap_$d AS (SELECT vec_id, CAST(floor(c_full * 1000000.0) AS BIGINT) AS m
         |          FROM scored ORDER BY ${cName(d)} DESC, vec_id LIMIT $k)""".stripMargin
    }.mkString(",\n")
    val rows = dims.map { d =>
      s"""SELECT $d AS dim,
         |  (SELECT count(*) FROM ap_$d
         |   WHERE vec_id IN (SELECT vec_id FROM exact))::BIGINT AS hits,
         |  ${PortableRound.floorToSql(
        s"CAST((SELECT sum(m) FROM ap_$d) AS DOUBLE) / CAST(em AS DOUBLE)", 4)}
         |    AS mass_ratio
         |FROM em""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id,
       |$scoreCols
       |  FROM embeddings e, p),
       |exact AS (SELECT vec_id, CAST(floor(c_full * 1000000.0) AS BIGINT) AS m
       |          FROM scored ORDER BY c_full DESC, vec_id LIMIT $k),
       |em AS (SELECT CAST(sum(m) AS BIGINT) AS em FROM exact),
       |$perDim
       |$rows""".stripMargin
  }
}
