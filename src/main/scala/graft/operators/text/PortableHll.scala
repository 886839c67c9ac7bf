package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog — the CARDINALITY member of the
  * engine-reproducible sketch family ([[PortableCms]] = frequency,
  * qd20 bloom = membership, PortableMinHash = similarity). Spark's
  * built-in `approx_count_distinct` is a real HLL++ but its xxHash64
  * registers aren't SQL-derivable, so qt23 can only GATE its accuracy;
  * this variant derives every register from md5 — both engines compute
  * the identical 512-register sketch, so the register sum, the zero
  * count, the raw estimate DOUBLE, and the accuracy verdict all
  * value-oracle bit-for-bit.
  *
  * Construction (m = 512 registers): h = 60-bit md5 prefix of the
  * term; register j = h & 511; w = h >> 9 (51 payload bits);
  * rho(w) = 52 − bitlength(w) (w = 0 → 52) — the position of the
  * leading 1 from the top of the payload. M_j = max rho over the
  * register's stream. The estimate needs Σ 2^−M_j, a float sum whose
  * order the two engines would disagree on — so it is carried SCALED:
  * S = Σ_j 2^(52−M_j) as an exact BIGINT (≤ 512·2^52 < 2^63), empty
  * registers contributing 2^52, and the raw HLL estimate
  * α·m²·2^52 / S is ONE identical float expression both engines
  * evaluate from the same integer — bit-exact, no correction-branch
  * drift. (Small-range linear counting needs ln(), whose libm vs JVM
  * bits differ; the raw estimate is reported instead and the fixture
  * cardinalities sit in the raw regime.)
  *
  * 100 TB shape: the register table is an aggregation with ≤ m
  * distinct keys per group — map-side partial aggregation collapses
  * every task's term stream to ≤ 512 rows, the shuffle carries
  * sketch-sized data regardless of corpus size, and shard sketches
  * merge by register-wise MAX ([[mergeRegisters]] — the property
  * qt49 derives end-to-end), which is how a 1000-executor count
  * folds without ever shuffling terms.
  */
object PortableHll {

  /** registers */
  val m = 512
  /** payload bits above the register index (60 − 9) */
  val payloadBits = 51

  /** 60-bit md5 prefix — the engine-shared hash primitive. */
  private def h60(term: Column): Column =
    conv(substring(md5(term), 1, 15), 16, 10).cast("bigint")

  /** (register, rho) of a term for 2^p registers (payload = 60 − p
    * bits, rho ∈ [1, 61 − p]). */
  def registerRhoP(term: Column, p: Int): (Column, Column) = {
    val h = h60(term)
    val w = shiftright(h, p)
    val maxRho = 61 - p
    val rho = when(w === 0L, lit(maxRho).cast("long"))
      .otherwise(lit(maxRho) - length(bin(w)).cast("long"))
    (h.bitwiseAND(lit((1 << p) - 1).cast("long")), rho)
  }

  /** (register, rho) of a term at the default m = 512. */
  def registerRho(term: Column): (Column, Column) = registerRhoP(term, 9)

  /** Per-group register table: groupCols :+ (register, m_j), only
    * registers some term actually hit (≤ m rows per group). */
  def registers(terms: DataFrame, term: Column, groupCols: Seq[String]): DataFrame =
    registersP(terms, term, groupCols, 9)

  def registersP(
      terms: DataFrame, term: Column, groupCols: Seq[String], p: Int): DataFrame = {
    val (reg, rho) = registerRhoP(term, p)
    terms
      .withColumn("register", reg)
      .withColumn("__rho", rho)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("__rho")).as("m_j"))
  }

  /** Register-wise max across shard sketches — HLL's merge. */
  def mergeRegisters(shardRegs: DataFrame, groupCols: Seq[String]): DataFrame =
    shardRegs
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("m_j")).as("m_j"))

  /** Scaled register sum + zero count + raw estimate from a register
    * table (one row per group). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        (expr(s"CAST(sum(shiftleft(CAST(1 AS BIGINT), CAST(${payloadBits + 1} - m_j AS INT))) AS BIGINT)")
          + (lit(m.toLong) - count(lit(1))) * lit(1L << (payloadBits + 1)))
          .as("s_scaled"),
        (lit(m.toLong) - count(lit(1))).as("zero_registers"))
      .withColumn("raw_est", rawEstimate(col("s_scaled")))

  /** α_m · m² · 2^52 / S — literal-for-literal the oracle's float
    * expression (α for m = 512). */
  private def rawEstimate(sScaled: Column): Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
      lit(262144.0) * lit(4503599627370496.0) / sScaled.cast("double")

  /** qt50: the sketch-size tuning curve — accuracy vs register count
    * (the memory knob). For each m = 2^p, per-source raw estimates
    * against exact distincts, rolled up to the worst floor-scaled
    * relative error and the count of sources inside 3× the
    * theoretical rsd 1.04/√m. One row per m; err_bp integers keep
    * every value engine-exact. */
  def sizeCurve(docs: DataFrame, text: Column, ps: Seq[Int]): DataFrame = {
    val terms = docs.select(
      col("source"), explode(grams(text)).as("term"))
    val exact = terms.groupBy("source")
      .agg(countDistinct(col("term")).as("__exact"))
    ps.map { p =>
      val m = 1 << p
      val maxRho = 61 - p
      val mm = m.toDouble * m.toDouble
      val pow2 = math.pow(2.0, maxRho) // exact: power of two
      val regs = registersP(terms, col("term"), Seq("source"), p)
      val est = regs
        .groupBy("source")
        .agg(
          (expr(s"CAST(sum(shiftleft(CAST(1 AS BIGINT), CAST($maxRho - m_j AS INT))) AS BIGINT)")
            + (lit(m.toLong) - count(lit(1))) * lit(1L << maxRho))
            .as("__s"))
        .withColumn(
          "__est",
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
            lit(mm) * lit(pow2) / col("__s").cast("double"))
      val boundBp =
        math.floor(3.0 * 1.04 / math.sqrt(m.toDouble) * 10000.0).toLong
      est
        .join(exact, Seq("source"))
        .withColumn(
          "__err_bp",
          floor(
            abs(col("__est") - col("__exact").cast("double"))
              / col("__exact").cast("double") * lit(10000.0)).cast("bigint"))
        .agg(
          count(lit(1)).as("n_sources"),
          max(col("__err_bp")).as("max_err_bp"),
          sum(when(col("__err_bp") <= boundBp, 1L).otherwise(0L))
            .cast("bigint").as("sources_within_3sigma"))
        .select(
          lit(m.toLong).as("n_registers"),
          col("n_sources"), col("max_err_bp"), col("sources_within_3sigma"))
    }.reduce(_ unionByName _)
  }

  def oracleSizeCurveSql(ps: Seq[Int]): String =
    ps.map { p =>
      val m = 1 << p
      val maxRho = 61 - p
      val mm = m.toDouble * m.toDouble
      val pow2 = math.pow(2.0, maxRho)
      val boundBp =
        math.floor(3.0 * 1.04 / math.sqrt(m.toDouble) * 10000.0).toLong
      s"""SELECT * FROM (
         |WITH t AS ($termsSql),
         |ex AS (SELECT source, count(DISTINCT term) AS ex_d FROM t GROUP BY source),
         |regs AS (SELECT source,
         |                h & ${m - 1} AS register,
         |                max(CASE WHEN (h >> $p) = 0 THEN $maxRho
         |                         ELSE $maxRho - length(bin(h >> $p)) END) AS m_j
         |         FROM (SELECT source,
         |                      CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS h
         |               FROM t)
         |         GROUP BY source, register),
         |est AS (SELECT source,
         |               CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($m.0 AS DOUBLE))
         |                 * CAST($mm AS DOUBLE) * CAST($pow2 AS DOUBLE)
         |                 / CAST(CAST(sum(CAST(1 AS BIGINT) << CAST($maxRho - m_j AS INTEGER)) AS BIGINT)
         |                     + ($m - count(*)) * (CAST(1 AS BIGINT) << $maxRho) AS DOUBLE) AS e
         |        FROM regs GROUP BY source),
         |err AS (SELECT est.source,
         |               CAST(floor(abs(e - CAST(ex_d AS DOUBLE)) / CAST(ex_d AS DOUBLE) * 10000.0) AS BIGINT) AS err_bp
         |        FROM est JOIN ex ON est.source = ex.source)
         |SELECT CAST($m AS BIGINT) AS n_registers,
         |       count(*) AS n_sources,
         |       max(err_bp) AS max_err_bp,
         |       CAST(sum(CASE WHEN err_bp <= $boundBp THEN 1 ELSE 0 END) AS BIGINT) AS sources_within_3sigma
         |FROM err
         |) s$p""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** The sketched stream: token 5-grams (order-sensitive, NOT
    * deduped — HLL's max makes duplicates free). Distinct n-grams per
    * source is the diversity/novelty signal worth approximating at
    * scale; the fixture's whitespace-token vocabulary is only ~31
    * strings, far too small to exercise a cardinality sketch. */
  def grams(text: Column, n: Int = 5): Column = {
    val toks = graft.operators.TextOps.tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** qt48: per-source sketch vs exact distinct, fully value-oracled
    * (columns: source, exact_distinct, s_scaled, zero_registers,
    * raw_est, rel_err_ok). */
  def profile(docs: DataFrame, text: Column, relErrBound: Double): DataFrame = {
    val terms = docs.select(
      col("source"), explode(grams(text)).as("term"))
    val exact = terms.groupBy("source")
      .agg(countDistinct(col("term")).as("exact_distinct"))
    val est = estimate(registers(terms, col("term"), Seq("source")), Seq("source"))
    exact
      .join(est, Seq("source"))
      .withColumn(
        "rel_err_ok",
        abs(col("raw_est") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double") <= relErrBound)
      .select(
        "source", "exact_distinct", "s_scaled", "zero_registers",
        "raw_est", "rel_err_ok")
  }

  /** qt49: the merge path derived end-to-end — terms split into two
    * md5 half-streams, each half sketched independently, halves merged
    * register-wise, merged sketch compared against the whole-stream
    * sketch (columns: source, merged_s, whole_s, merged_zeros,
    * merge_exact). At cluster scale the halves are executors. */
  def mergeProfile(docs: DataFrame, text: Column): DataFrame = {
    val terms = docs.select(
      col("source"), col("doc_id"),
      explode(grams(text)).as("term"))
    val withHalf = terms.withColumn(
      "half",
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 2)
    val halves = registers(withHalf, col("term"), Seq("source", "half"))
    val merged = estimate(
      mergeRegisters(halves.drop("half"), Seq("source")), Seq("source"))
      .select(
        col("source"), col("s_scaled").as("merged_s"),
        col("zero_registers").as("merged_zeros"))
    val whole = estimate(registers(terms, col("term"), Seq("source")), Seq("source"))
      .select(col("source"), col("s_scaled").as("whole_s"))
    merged
      .join(whole, Seq("source"))
      .withColumn("merge_exact", col("merged_s") === col("whole_s"))
      .select("source", "merged_s", "whole_s", "merged_zeros", "merge_exact")
  }

  /** qd28: ESTIMATED pairwise source overlap by inclusion-exclusion on
    * merged sketches — the 100 TB path to "which crawl sources share
    * content": per-source sketches are ≤ m rows each, a pair's union
    * sketch is a register-wise max, and est(A∩B) = est(A) + est(B) −
    * est(A∪B) — no corpus ever joins corpus (qd27 computes the EXACT
    * matrix through a full fingerprint shuffle; this reads 20 tiny
    * sketches). The exact side here is the verification gate, exactly
    * the [[PortableCms.profile]] pattern: production reads the
    * sketches alone. Intersection error scales with the UNION (the
    * known inclusion-exclusion weakness — a small true overlap
    * between big sources drowns in sketch noise), so the contract is
    * |est − exact| ≤ bound·|A∪B|, not a ratio to the intersection.
    * Token 3-grams: the fixture's sources genuinely share 3-grams
    * while 5-grams are disjoint. */
  def overlapProfile(docs: DataFrame, text: Column, unionRelBound: Double): DataFrame = {
    val dt = docs
      .select(col("source"), explode(grams(text, 3)).as("term"))
      .distinct()
    val card = dt.groupBy("source").agg(count(lit(1)).as("c"))
    val s = estimate(registers(dt, col("term"), Seq("source")), Seq("source"))
      .select(col("source"), col("raw_est"))
    val pairs = card.select(col("source").as("source_a"), col("c").as("ca"))
      .crossJoin(card.select(col("source").as("source_b"), col("c").as("cb")))
      .where(col("source_a") < col("source_b"))
    val regs = registers(dt, col("term"), Seq("source"))
    val ur = pairs.select("source_a", "source_b")
      .join(regs.withColumnRenamed("source", "source_a"), Seq("source_a"))
      .unionByName(
        pairs.select("source_a", "source_b")
          .join(regs.withColumnRenamed("source", "source_b"), Seq("source_b"))
          .select("source_a", "source_b", "register", "m_j"))
      .groupBy("source_a", "source_b", "register")
      .agg(max(col("m_j")).as("m_j"))
    val us = estimate(ur, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("raw_est").as("est_u"))
    val inter = dt.select(col("source").as("source_a"), col("term"))
      .join(dt.select(col("source").as("source_b"), col("term")), Seq("term"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("exact_inter", coalesce(col("inter"), lit(0L)))
      .withColumn("exact_union", col("ca") + col("cb") - col("exact_inter"))
      .join(s.select(col("source").as("source_a"), col("raw_est").as("est_a")), Seq("source_a"))
      .join(s.select(col("source").as("source_b"), col("raw_est").as("est_b")), Seq("source_b"))
      .join(us, Seq("source_a", "source_b"))
      .withColumn("est_inter", col("est_a") + col("est_b") - col("est_u"))
      .withColumn(
        "within",
        abs(col("est_inter") - col("exact_inter").cast("double"))
          <= lit(unionRelBound) * col("exact_union").cast("double"))
      .select(
        "source_a", "source_b", "exact_inter", "exact_union",
        "est_inter", "within")
  }

  def oracleOverlapSql(unionRelBound: Double): String = {
    val est =
      "CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))" +
        " * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)"
    s"""WITH dt AS (
       |  SELECT DISTINCT source, array_to_string(toks[s:s+2], ' ') AS term
       |  FROM (SELECT source,
       |               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |        FROM documents),
       |       unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS x(s)),
       |card AS (SELECT source, count(*) AS c FROM dt GROUP BY source),
       |hh AS (SELECT source, CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS h FROM dt),
       |regs AS (SELECT source, h & 511 AS register,
       |                max(CASE WHEN (h >> 9) = 0 THEN 52
       |                         ELSE 52 - length(bin(h >> 9)) END) AS m_j
       |         FROM hh GROUP BY source, register),
       |sest AS (SELECT source,
       |                $est / CAST(CAST(sum(CAST(1 AS BIGINT) << CAST(52 - m_j AS INTEGER)) AS BIGINT)
       |                  + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS DOUBLE) AS raw_est
       |         FROM regs GROUP BY source),
       |pairs AS (SELECT a.source AS source_a, a.c AS ca, b.source AS source_b, b.c AS cb
       |          FROM card a JOIN card b ON a.source < b.source),
       |ur AS (SELECT p.source_a, p.source_b, r.register, max(r.m_j) AS m_j
       |       FROM pairs p JOIN regs r ON r.source = p.source_a OR r.source = p.source_b
       |       GROUP BY p.source_a, p.source_b, r.register),
       |uest AS (SELECT source_a, source_b,
       |                $est / CAST(CAST(sum(CAST(1 AS BIGINT) << CAST(52 - m_j AS INTEGER)) AS BIGINT)
       |                  + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS DOUBLE) AS est_u
       |         FROM ur GROUP BY source_a, source_b),
       |xi AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
       |       FROM dt a JOIN dt b ON a.term = b.term AND a.source < b.source
       |       GROUP BY a.source, b.source),
       |j AS (SELECT p.source_a, p.source_b,
       |             COALESCE(xi.inter, 0) AS exact_inter,
       |             p.ca + p.cb - COALESCE(xi.inter, 0) AS exact_union,
       |             (ea.raw_est + eb.raw_est) - u.est_u AS est_inter
       |      FROM pairs p
       |      LEFT JOIN xi ON xi.source_a = p.source_a AND xi.source_b = p.source_b
       |      JOIN sest ea ON ea.source = p.source_a
       |      JOIN sest eb ON eb.source = p.source_b
       |      JOIN uest u ON u.source_a = p.source_a AND u.source_b = p.source_b)
       |SELECT source_a, source_b, exact_inter, exact_union, est_inter,
       |       abs(est_inter - CAST(exact_inter AS DOUBLE))
       |         <= CAST($unionRelBound AS DOUBLE) * CAST(exact_union AS DOUBLE) AS within
       |FROM j""".stripMargin
  }

  private val termsSql =
    """SELECT source, doc_id, array_to_string(toks[s:s+4], ' ') AS term
      |FROM (SELECT source, doc_id,
      |             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |      FROM documents),
      |     unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS x(s)""".stripMargin

  /** Register-table SQL over a term CTE named `t`, grouped by `grp`. */
  private def regSql(grp: String): String =
    s"""SELECT $grp,
       |       h & 511 AS register,
       |       max(CASE WHEN (h >> 9) = 0 THEN 52
       |                ELSE 52 - length(bin(h >> 9)) END) AS m_j
       |FROM (SELECT $grp,
       |             CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS h
       |      FROM t)
       |GROUP BY $grp, register""".stripMargin

  private def estSql(grp: String, from: String): String =
    s"""SELECT $grp,
       |       CAST(sum(CAST(1 AS BIGINT) << CAST(52 - m_j AS INTEGER)) AS BIGINT)
       |         + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS s_scaled,
       |       512 - count(*) AS zero_registers
       |FROM $from
       |GROUP BY $grp""".stripMargin

  private val rawEstSql =
    "CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))" +
      " * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE) / CAST(s_scaled AS DOUBLE)"

  def oracleProfileSql(relErrBound: Double): String =
    s"""WITH t AS ($termsSql),
       |ex AS (SELECT source, count(DISTINCT term) AS exact_distinct FROM t GROUP BY source),
       |regs AS (${regSql("source")}),
       |est AS (${estSql("source", "regs")}),
       |je AS (SELECT est.source, exact_distinct, s_scaled, zero_registers,
       |              $rawEstSql AS raw_est
       |       FROM est JOIN ex ON est.source = ex.source)
       |SELECT source, exact_distinct, s_scaled, zero_registers, raw_est,
       |       abs(raw_est - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE) <= CAST($relErrBound AS DOUBLE) AS rel_err_ok
       |FROM je""".stripMargin

  def oracleMergeSql: String =
    s"""WITH t AS ($termsSql),
       |th AS (SELECT source, term,
       |              CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS half
       |       FROM t),
       |hreg AS (SELECT source, half,
       |                h & 511 AS register,
       |                max(CASE WHEN (h >> 9) = 0 THEN 52
       |                         ELSE 52 - length(bin(h >> 9)) END) AS m_j
       |         FROM (SELECT source, half,
       |                      CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS h
       |               FROM th)
       |         GROUP BY source, half, register),
       |mreg AS (SELECT source, register, max(m_j) AS m_j FROM hreg GROUP BY source, register),
       |mest AS (${estSql("source", "mreg")}),
       |wreg AS (${regSql("source")}),
       |west AS (${estSql("source", "wreg")})
       |SELECT mest.source,
       |       mest.s_scaled AS merged_s,
       |       west.s_scaled AS whole_s,
       |       mest.zero_registers AS merged_zeros,
       |       mest.s_scaled = west.s_scaled AS merge_exact
       |FROM mest JOIN west ON mest.source = west.source""".stripMargin
}
