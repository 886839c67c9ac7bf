package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive / embedding training: for each
  * probe (anchor) vector, the k most-similar corpus vectors carrying a
  * DIFFERENT label — the negatives that sit closest to the decision
  * boundary and teach a contrastive model the most per step. Random
  * negatives are mostly trivial (near-orthogonal); the hard ones are
  * exactly the top of the cross-label similarity ranking.
  *
  * Scale shape mirrors [[SimilaritySearch.topKJoin]]: the probe batch
  * broadcasts (anchors per mining round are bounded — thousands, not
  * the corpus), scoring is map-side over one corpus scan, and the
  * label-inequality filter runs BEFORE ranking so excluded pairs never
  * enter the per-probe window. No corpus shuffle: the only wide
  * operation is the per-probe rank over (|probes| · k)-bounded output
  * candidates. At billion-vector scale, compose with [[PortableIvf]] /
  * [[IvfPq]] cell pruning to restrict the scan exactly as search does.
  *
  * Reference scope: the reference engine has no vector surface at all
  * (BLOB passthrough, mysqlDataSyncTool cmd/root.go:423-424); this is
  * north-star LLM-pipeline surface, value-oracled via the same
  * sequential-fold cosine contract as qs02/qs05.
  */
object HardNegatives {

  /** Per-probe top-k cross-label neighbors. Output: (probe_id,
    * corpus_id, corpus_label, cosine, rank), rank 1 = hardest negative.
    * Ties broken by corpus id for cross-engine determinism. Self-pairs
    * are excluded by the label filter when probe and corpus share a
    * labeling; same-id different-label rows (distinct tables) are kept
    * deliberately — they ARE valid negatives. */
  def mine(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      corpusLabel: Column,
      probes: DataFrame,
      probeVec: Column,
      probeId: Column,
      probeLabel: Column,
      k: Int): DataFrame = {
    val c = corpus.select(
      corpusId.as("corpus_id"), corpusLabel.as("corpus_label"), corpusVec.as("cv"))
    val p = probes.select(
      probeId.as("probe_id"), probeLabel.as("probe_label"), probeVec.as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("corpus_id"))
    c.crossJoin(broadcast(p))
      .filter(col("corpus_label") =!= col("probe_label"))
      .select(
        col("probe_id"),
        col("corpus_id"),
        col("corpus_label"),
        VectorOps.cosine(col("cv"), col("pv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[mine]] on its SCALE path for a whole mining batch at once — the
    * production configuration: every probe's candidates restrict to
    * its `nprobe` IVF cells (qs26's restriction) AND the batch stays
    * distributed end to end (qs27's shape — per-probe cells derive
    * executor-side from [[PortableIvf.probedCellsCol]], no driver
    * collect at construction). Each corpus row computes its cell
    * map-only and joins the ids-only exploded (probe_id, cell) rows —
    * the probe VECTOR is NOT duplicated ×nprobe into that relation;
    * it attaches once per probe by probe_id after the cell join, the
    * same one-table-per-probe shape as [[IvfPq.adcTopKBatch]]. Both
    * probe-side joins are size-gated through [[ProbeBatch]]: a
    * serving-sized batch broadcasts (two back-to-back map-side
    * joins, no shuffle between); a mining-sized batch drops the hint
    * so the candidates shuffle by probe_id to meet their vectors
    * instead of collecting a multi-GB probe relation on the driver.
    * Label inequality runs before ranking, and the only other
    * shuffle is the per-probe top-k window. At a billion vectors a
    * mining batch therefore scans nprobe/numCells of the corpus
    * once — not |batch| passes and not the full corpus. Exact cosine
    * on the restricted candidates (the rerank-quality score
    * contrastive mining wants); same sequential fold as qs02, so
    * every value oracles. */
  def mineIvfBatch(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      corpusLabel: Column,
      probes: DataFrame,
      probeVec: Column,
      probeId: Column,
      probeLabel: Column,
      k: Int,
      nprobe: Int,
      thresholdBytes: Long = ProbeBatch.DefaultThresholdBytes): DataFrame = {
    val p = probes.select(
      probeId.cast("long").as("probe_id"),
      probeLabel.as("probe_label"),
      probeVec.cast("array<double>").as("pv"))
    val cells = p.select(col("probe_id"),
      explode(PortableIvf.probedCellsCol(col("pv"), nprobe)).as("cell"))
    val c = corpus.select(
      corpusId.as("corpus_id"), corpusLabel.as("corpus_label"),
      corpusVec.as("cv"), PortableIvf.cell(corpusVec).as("cell"))
    // gate once on the raw probe estimate: the exploded cells are
    // ids-only (≈ 12 B × nprobe) and pv rides once per probe, so the
    // derived payload is ≈ 2× the raw row
    val small = ProbeBatch.fitsBroadcast(p, thresholdBytes, expansion = 2)
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("corpus_id"))
    c.join(ProbeBatch.hinted(cells, small), Seq("cell"))
      .join(ProbeBatch.hinted(p, small), Seq("probe_id"))
      .filter(col("corpus_label") =!= col("probe_label"))
      .select(
        col("probe_id"),
        col("corpus_id"),
        col("corpus_label"),
        VectorOps.cosine(col("cv"), col("pv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
