package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gating for the batch ANN / mining probe relations.
  *
  * A Spark `broadcast()` relation is BUILT by collecting to the driver
  * and re-sending to every executor — fine for a serving batch
  * (10³–10⁴ probes × ~0.5 KB vector ≈ single-digit MB), ruinous for a
  * mining batch (10⁶ probes × (vector + m×k ADC table) is a multi-GB
  * driver object). The batch paths therefore hint `broadcast` only
  * when the PLAN-estimated probe size fits under a threshold; above
  * it they leave the join unhinted, so the probes repartition by the
  * join key and AQE picks a shuffled join — the corpus scan widens
  * from file-pruned to full, which at mining scale is what a batch
  * touching every cell does anyway.
  *
  * The estimate comes from `optimizedPlan.stats.sizeInBytes` — pure
  * plan derivation (file footer totals × projection width ratios),
  * NO Spark job, preserving the zero-jobs-at-construction contract
  * asserted in PlanShapeSpec. The threshold compares against the RAW
  * probe relation estimate scaled by `expansion` — the factor by
  * which the derived broadcast payload (exploded ×nprobe cells, m×k
  * double ADC tables) outweighs the raw probe row.
  */
object ProbeBatch {

  /** Default gate: derived probe payload above ~32 MB plan-estimate
    * stops broadcasting. At ~2.5 KB of derived payload per probe
    * (nprobe=8 exploded cells + a 16×16 double ADC table) that is
    * ~10⁴–10⁵ probes — the serving/mining boundary. */
  val DefaultThresholdBytes: Long = 32L << 20

  /** Plan-only size estimate of `df` in bytes; triggers no job. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when `df`'s estimated size × `expansion` fits under
    * `thresholdBytes`, i.e. the derived relations are safe to
    * broadcast. */
  def fitsBroadcast(df: DataFrame, thresholdBytes: Long,
      expansion: Int = 1): Boolean =
    estimatedBytes(df) * expansion <= BigInt(thresholdBytes)

  /** `broadcast(df)` when gated small, `df` unhinted otherwise. */
  def hinted(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df
}
