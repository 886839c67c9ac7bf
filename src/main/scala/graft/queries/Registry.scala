package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. As of round 13 every registry entry carries a full value
  * oracle — the last rows-only holdouts graduated: FNV+splitmix64
  * MinHash via per-DISTINCT-shingle HUGEINT re-derivation
  * (MinHashOracle), seeded hyperplane LSH via inlined exact plane
  * literals (HyperplaneOracle), and fitted IVF via Lloyd-in-SQL over
  * an md5-ranked sample (IvfOracle). The md5-family portable twins
  * (qd10-qd15) predate those and remain as simpler cross-checks.
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
  *
  * New-query checklist additions from the round-14/15 adjudications:
  *   - CAPPED operators need their caps reconciled with the oracle: a
  *     capless brute-force oracle proves recall ONLY while no fixture
  *     bucket/block approaches the in-code cap — verify that headroom
  *     at sf0.1 AND at the 10x smoke scale, not just at sf0.01 (the
  *     qm14 lesson: a low-entropy fixture silently pushed buckets past
  *     the cap and the smoke measured fan-in, not the operator);
  *   - PLANTED fixtures must spread: before adding a planted-payload
  *     query, measure its derived key/hash entropy at 1x/10x/100x ids
  *     (distinct values, max dup group, max band-bucket) — constant
  *     per-group offsets cancel in comparison-based hashes, so put a
  *     group-dependent SLOPE in the plant (see
  *     [[graft.operators.multimodal.PerceptualAudio.plantedSample]])
  *     and, where a smoke times the query, assert the entropy in the
  *     smoke itself (ScaleSmoke.audioEntropy is the template);
  *   - fixture oracles over byte windows (MinHashOracle) assume
  *     single-byte chars — keep planted text ASCII or re-derive.
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
