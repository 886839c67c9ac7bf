package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Queries without an oracle get the driver's weaker rows-only
  * check — reserved for ops whose hash family or seeds SQL can't
  * reproduce within the oracle budget (FNV MinHash, seeded hyperplane
  * LSH, k-means IVF; the FNV SimHash and rolling-polynomial paths ARE
  * value-oracled via HUGEINT wraparound arithmetic as of round 10).
  * Each of those has a PORTABLE twin (qd10-qd15) running the same
  * pipeline on md5-based primitives both engines compute bit-identically,
  * so every algorithm is value-verified even where the production
  * variant is not.
  *
  * Determinism rules every entry follows (the driver hash-compares
  * values after sorting columns by name):
  *   - aggregate floating columns through DECIMAL casts (order-exact),
  *     or keep double arithmetic strictly per-row (bit-exact across
  *     engines for identical operation order);
  *   - NEVER `round()` a reported double — project through
  *     [[graft.operators.PortableRound.floorTo]] instead. Spark rounds
  *     the double's shortest DECIMAL repr (BigDecimal HALF_UP), DuckDB
  *     rounds the BINARY value; on an exact decimal tie they disagree
  *     (found live at sf0.1: quality score 1011/16000 = 0.0631875 →
  *     0.063188 vs 0.063187, qp05/qt26). floor over the shared double
  *     has no tie semantics at all;
  *   - alias every computed column identically in Spark and SQL;
  *   - no ordering dependence: results are compared as bags.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  lazy val all: Seq[Q] =
    ParityQueries.all ++ DedupQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ EventQueries.all ++ JoinQueries.all ++
      PipelineQueries.all

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
