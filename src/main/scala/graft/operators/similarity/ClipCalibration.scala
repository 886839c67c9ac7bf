package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.PortableRound

/** Int8 CLIP-threshold calibration curve — the storage knob measured,
  * completing the measured-knob family (qs36 nprobe = serving, qs37
  * prefix dim = bandwidth, qd36 banding = dedup recall): symmetric
  * int8 quantization ([[Quantize]]) scales by max|x|, so ONE outlier
  * component crushes every other component into a few code levels;
  * the standard fix clips at a lower rank of the |x| distribution and
  * saturates the tail. Per clip rank r (threshold = r-th smallest of
  * the vector's 64 |x| values; r = 64 is [[Quantize]]'s max-abs), this
  * curve reports exact-top-k hits and full-precision dot mass of the
  * int8-ranked retrieval — measuring what the clip buys instead of
  * assuming it.
  *
  * Determinism: thresholds are order statistics of IEEE abs values
  * (sorted once per row); scales are single divides; codes are
  * floor(x·s + 0.5) clamped to ±127 (exactly-rounded ops, no round()
  * ties); int8 dots are exact integers; the ranking divides by the
  * per-row scale product and ties break on id. The probe's clipped
  * codes are derived driver-side with the same IEEE ops the oracle
  * runs in SQL, so they are bit-identical literals.
  *
  * 100 TB shape: ONE corpus scan computes the sorted-abs array and
  * every clip level's codes per row (no re-scan per level), Barrier'd;
  * each curve row is a TakeOrdered(k) cut + integer-mass aggregates —
  * the qs37 plan. Mass sums are order-free BIGINT micro-dots.
  */
object ClipCalibration {

  val dim = 64

  /** Probe-side clipped quantization, driver-side (mirrors the oracle's
    * SQL ops 1:1): (scale, codes) at clip rank r. */
  private def quantizeProbe(probe: Seq[Float], r: Int): (Double, Seq[Long]) = {
    val abs = probe.map(x => math.abs(x.toDouble)).sorted
    val t = abs(r - 1)
    val s = if (t == 0.0) 0.0 else 127.0 / t
    val q = probe.map { x =>
      math.min(127.0, math.max(-127.0, math.floor(x.toDouble * s + 0.5))).toLong
    }
    (s, q)
  }

  /** For each clip rank r: top-k by the int8-rescaled dot at clip r,
    * reported as (clip_rank, hits vs the exact float-dot top-k,
    * mass_ratio of full-precision micro-dot mass). */
  def curve(
      df: DataFrame, vec: Column, id: Column, probe: Seq[Float],
      k: Int, ranks: Seq[Int]): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 1 && r <= dim),
      s"clip ranks must be within [1, $dim]")
    def cName(r: Int) = s"s_$r"
    val absSorted = array_sort(transform(vec, x => abs(x.cast("double"))))
    val scoreCols = ranks.map { r =>
      val (sp, qp) = quantizeProbe(probe, r)
      val t = element_at(col("__as"), r)
      val s = when(t === 0.0, lit(0.0)).otherwise(lit(127.0) / t)
      val q = transform(vec,
        x => least(greatest(floor(x.cast("double") * s + lit(0.5)),
          lit(-127.0)), lit(127.0)))
      val qdot = aggregate(
        zip_with(q, typedLit(qp), (a, b) => a.cast("long") * b),
        lit(0L), (acc, x) => acc + x)
      when(s * lit(sp) === 0.0, lit(0.0))
        .otherwise(qdot.cast("double") / (s * lit(sp)))
        .as(cName(r))
    }
    val scored = graft.operators.Barrier(
      graft.operators.Parallelism.ensureMin(df)
        .withColumn("__as", absSorted)
        .select((id.as("id") +:
          VectorOps.dot(vec, typedLit(probe)).as("d_full") +:
          scoreCols): _*))
    def topk(scoreCol: String) = scored
      .orderBy(col(scoreCol).desc, col("id")).limit(k)
      .select(col("id"), floor(col("d_full") * lit(1000000.0)).cast("long").as("m"))
    val exact = topk("d_full")
    val exactMass = exact.agg(sum("m").as("em"))
    ranks.map { r =>
      val approx = topk(cName(r))
      approx.join(exact.select("id"), Seq("id"), "semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(approx.agg(sum("m").as("am")))
        .crossJoin(exactMass)
        .select(
          lit(r).as("clip_rank"), col("hits"),
          PortableRound.floorTo(
            col("am").cast("double") / col("em").cast("double"), 4)
            .as("mass_ratio"))
    }.reduce(_ unionByName _)
  }

  /** qs38 oracle — literal SQL twin of [[curve]] (probe = vec_id 0):
    * the same order-statistic thresholds, clamped codes, integer dots,
    * rescaled ranking and micro-dot masses. */
  def curveSql(k: Int, ranks: Seq[Int]): String = {
    def cName(r: Int) = s"s_$r"
    val probeCols = ranks.map { r =>
      s"""CASE WHEN pas[$r] = 0 THEN 0.0 ELSE 127.0 / pas[$r] END AS ps_$r,
         |list_transform(pe, x -> LEAST(127.0, GREATEST(-127.0,
         |  floor(x::DOUBLE * (CASE WHEN pas[$r] = 0 THEN 0.0
         |                          ELSE 127.0 / pas[$r] END) + 0.5)))) AS pq_$r""".stripMargin
    }.mkString(",\n")
    val scoreCols = ranks.map { r =>
      s"""CASE WHEN (CASE WHEN eas[$r] = 0 THEN 0.0 ELSE 127.0 / eas[$r] END)
         |          * p.ps_$r = 0.0 THEN 0.0
         |     ELSE CAST(list_sum(list_transform(range(1, ${dim + 1}), i ->
         |            CAST(LEAST(127.0, GREATEST(-127.0,
         |              floor(e.embedding[i]::DOUBLE *
         |                (CASE WHEN eas[$r] = 0 THEN 0.0
         |                      ELSE 127.0 / eas[$r] END) + 0.5))) AS BIGINT)
         |            * CAST(p.pq_$r[i] AS BIGINT))) AS DOUBLE)
         |          / ((CASE WHEN eas[$r] = 0 THEN 0.0
         |                   ELSE 127.0 / eas[$r] END) * p.ps_$r)
         |END AS ${cName(r)}""".stripMargin
    }.mkString(",\n")
    val perRank = ranks.map { r =>
      s"""ap_$r AS (SELECT vec_id, CAST(floor(d_full * 1000000.0) AS BIGINT) AS m
         |          FROM scored ORDER BY ${cName(r)} DESC, vec_id LIMIT $k)""".stripMargin
    }.mkString(",\n")
    val rows = ranks.map { r =>
      s"""SELECT $r AS clip_rank,
         |  (SELECT count(*) FROM ap_$r
         |   WHERE vec_id IN (SELECT vec_id FROM exact))::BIGINT AS hits,
         |  ${PortableRound.floorToSql(
        s"CAST((SELECT sum(m) FROM ap_$r) AS DOUBLE) / CAST(em AS DOUBLE)", 4)}
         |    AS mass_ratio
         |FROM em""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH praw AS (SELECT embedding AS pe,
       |                list_sort(list_transform(embedding, x -> abs(x::DOUBLE))) AS pas
       |              FROM embeddings WHERE vec_id = 0),
       |p AS MATERIALIZED (SELECT pe,
       |$probeCols
       |  FROM praw),
       |eb AS (SELECT vec_id, embedding,
       |         list_sort(list_transform(embedding, x -> abs(x::DOUBLE))) AS eas
       |       FROM embeddings),
       |scored AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}),
       |      i -> e.embedding[i]::DOUBLE * p.pe[i]::DOUBLE)), (x, y) -> x + y)
       |      AS d_full,
       |$scoreCols
       |  FROM eb e, p),
       |exact AS (SELECT vec_id, CAST(floor(d_full * 1000000.0) AS BIGINT) AS m
       |          FROM scored ORDER BY d_full DESC, vec_id LIMIT $k),
       |em AS (SELECT CAST(sum(m) AS BIGINT) AS em FROM exact),
       |$perRank
       |$rows""".stripMargin
  }
}
