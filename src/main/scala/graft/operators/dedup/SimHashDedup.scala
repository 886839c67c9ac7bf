package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.simhash64
import graft.operators.TextOps

/** SimHash near-duplicate detection: one 64-bit fingerprint per
  * document (via the codegen'd [[graft.functions.SimHash64]]
  * expression), banded into 16-bit keys for the bucket join, candidate
  * pairs confirmed by Hamming distance (`bit_count(a ^ b)`).
  *
  * Why both MinHash and SimHash exist here: MinHash estimates set
  * (Jaccard) similarity and needs k hashes; SimHash is one long per
  * doc — 8 bytes of shuffle state — and catches small edits. With
  * maxHamming = h and 4 bands of 16 bits, any pair within h <= 3 bits
  * shares at least one identical band (pigeonhole), so recall is exact
  * for h <= 3.
  */
object SimHashDedup {

  def fingerprint(text: Column): Column = simhash64(TextOps.tokens(text))

  def fingerprints(df: DataFrame, text: Column, id: Column): DataFrame =
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), fingerprint(text).as("sh"))

  /** Pairs (id_a < id_b) with Hamming distance <= maxHamming. */
  def candidatePairs(df: DataFrame, text: Column, id: Column, maxHamming: Int = 3): DataFrame = {
    // materialized before the self-join so the per-doc fingerprint is
    // computed once, not once per candidate pair; localCheckpoint so the
    // blocks are freed when the result is dropped (see MinHashLSH)
    val fps = fingerprints(df, text, id).transform(Barrier.apply)
    val banded = fps.select(
      col("id"),
      col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
