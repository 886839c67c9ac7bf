package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical-document selection — the retention policy that turns
  * near-dup CLUSTERS into a kept corpus: within each duplicate
  * component, the highest-quality document survives and every other
  * member is dropped in its favor. Whole-doc near-dup pipelines
  * (MinHash/SimHash → [[ConnectedComponents]]) stop at cluster labels;
  * this is the step after — "which copy do we train on" — ranked by a
  * caller-supplied quality column (length, quality score, recency)
  * with doc id as the deterministic tiebreak.
  *
  * Scale shape: one window over `component` — a single hash shuffle of
  * (id, component, quality) rows, no doc text. Component sizes are
  * bounded by the upstream pair-mining caps (`MinHashLSH.maxBucket`
  * and siblings), so no window partition degenerates; the canonical id
  * rides along via first_value over the full frame, avoiding a second
  * self-join.
  */
object CanonicalSelect {

  /** Label every document with its component's canonical id:
    * (id, component, canonical_id, keep). `quality` ranks DESC within
    * the component; ties break to the LOWEST id, so the output is
    * deterministic and engine-independent. `components` is the
    * [[ConnectedComponents.components]] output (id column named as in
    * `docs`, plus `component`). */
  def label(
      docs: DataFrame,
      idCol: String,
      quality: Column,
      components: DataFrame): DataFrame = {
    val w = Window.partitionBy("component")
      .orderBy(quality.desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs.join(components, Seq(idCol))
      .withColumn("canonical_id", first(col(idCol)).over(w))
      .select(
        col(idCol),
        col("component"),
        col("canonical_id"),
        (col(idCol) === col("canonical_id")).as("keep"))
  }

  /** The keep-side corpus: one canonical document per component,
    * original schema preserved. */
  def select(
      docs: DataFrame,
      idCol: String,
      quality: Column,
      components: DataFrame): DataFrame =
    docs.join(
      label(docs, idCol, quality, components)
        .filter(col("keep")).select(idCol),
      Seq(idCol), "left_semi")
}
