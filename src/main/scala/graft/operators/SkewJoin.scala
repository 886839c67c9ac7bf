package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for equi-joins with heavy-hitter keys. AQE's
  * skew-join splitting handles sort-merge skew at runtime, but salting
  * is still the tool when (a) the plan isn't AQE-eligible (streaming-
  * static joins, some cached plans), or (b) one key is so hot that even
  * a split partition's build side won't fit. The fact table gets a
  * deterministic salt in [0, salt); the dimension side is replicated
  * `salt` times, so each fact row meets exactly one replica of its
  * matching dimension row — the join result is row-identical to the
  * unsalted join (spec-verified), while the hot key's rows spread over
  * `salt` shuffle partitions instead of one.
  *
  * Salt comes from a hash of the whole fact row (not `rand()`), so task
  * retries and stage recomputation reproduce the same placement —
  * nondeterministic salts break exactly-once shuffle semantics under
  * failure.
  */
object SkewJoin {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val saltedFact = fact.withColumn(
      "__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salt)).cast("int"))
    val replicatedDim = dim.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact
      .join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
