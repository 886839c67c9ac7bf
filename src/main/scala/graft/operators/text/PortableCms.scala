package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Barrier, TextOps}

/** Count-min sketch over the corpus term stream — the FREQUENCY member
  * of the sketch family (HLL qt23 answers "how many distinct", bloom
  * qd20 answers "have I seen it", MinHash qd09 answers "how similar");
  * CMS answers "how often" in fixed memory with a one-sided error:
  * estimates never undercount, and overcount by at most the collision
  * mass of d independent hash rows. (Spark ships
  * `df.stat.countMinSketch` with Murmur hashing and a driver-side
  * sketch object; this variant is md5-derived and engine-reproducible
  * — the [[graft.operators.dedup.PortableMinHash]] argument — so every
  * estimate value-oracles in DuckDB.)
  *
  * Scale shape: the sketch TABLE is an aggregation of (row, bucket)
  * keys with at most d·w distinct values — map-side partial
  * aggregation collapses each task's term stream into ≤ d·w rows, so
  * the shuffle carries sketch-sized data per task regardless of corpus
  * size (the qt23 argument, frequency edition). The exact side in
  * [[profile]] exists as the verification gate; production reads the
  * sketch alone.
  */
object PortableCms {

  /** hash rows */
  val d = 4
  /** buckets per row */
  val w = 1024

  /** Bucket of `term` in hash row `j`: 60-bit md5 prefix of the
    * row-tagged term, mod w — shared verbatim with the oracle. */
  def bucket(term: Column, j: Int): Column =
    conv(substring(md5(concat(lit(s"cms${j}_"), term)), 1, 15), 16, 10)
      .cast("bigint") % w

  /** The d×w sketch table: (j, bucket, n) — at most d·w rows. */
  def table(terms: DataFrame, term: Column): DataFrame =
    terms
      .select(posexplode(array((0 until d).map(j => bucket(term, j)): _*))
        .as(Seq("j", "bucket")))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("n"))

  /** Verification profile: the `topK` exact-heaviest terms with their
    * CMS estimates — (term, exact_n, cms_est, overcount). CMS is
    * one-sided, so overcount = cms_est − exact_n >= 0 always; tight
    * buckets give 0. */
  def profile(df: DataFrame, text: Column, topK: Int): DataFrame = {
    // one narrow term stream feeds both the exact side and the sketch
    val terms = df
      .select(explode(TextOps.tokens(text)).as("term"))
      .transform(Barrier.apply)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("exact_n"))
    val top = exact
      .orderBy(col("exact_n").desc, col("term"))
      .limit(topK)
    val cms = table(terms, col("term"))
    val probes = top.select(
      col("term"), col("exact_n"),
      posexplode(array((0 until d).map(j => bucket(col("term"), j)): _*))
        .as(Seq("j", "bucket")))
    probes
      .join(cms, Seq("j", "bucket"))
      .groupBy("term", "exact_n")
      .agg(min(col("n")).as("cms_est"))
      .select(
        col("term"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overcount"))
  }

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** qt27: DuckDB re-derives the identical sketch and estimates. */
  def oracleSql(topK: Int): String = {
    val bucketSql =
      s"CAST(('0x' || substring(md5('cms' || j || '_' || term), 1, 15)) AS BIGINT) % $w"
    s"""WITH t AS (
       |  SELECT unnest(string_split($normSql, ' ')) AS term FROM documents),
       |exact AS (SELECT term, count(*) AS exact_n FROM t GROUP BY term),
       |top AS (SELECT term, exact_n FROM exact
       |        ORDER BY exact_n DESC, term LIMIT $topK),
       |rows_ AS (SELECT unnest(range(0, $d)) AS j),
       |buck AS (
       |  SELECT t.term, r.j, $bucketSql AS bucket
       |  FROM t CROSS JOIN rows_ r),
       |cms AS (SELECT j, bucket, count(*) AS n FROM buck GROUP BY j, bucket),
       |pb AS (
       |  SELECT top.term, top.exact_n, r.j,
       |         CAST(('0x' || substring(md5('cms' || r.j || '_' || top.term), 1, 15)) AS BIGINT) % $w AS bucket
       |  FROM top CROSS JOIN rows_ r)
       |SELECT pb.term, pb.exact_n, min(cms.n) AS cms_est,
       |       min(cms.n) - pb.exact_n AS overcount
       |FROM pb JOIN cms ON pb.j = cms.j AND pb.bucket = cms.bucket
       |GROUP BY pb.term, pb.exact_n""".stripMargin
  }
}
