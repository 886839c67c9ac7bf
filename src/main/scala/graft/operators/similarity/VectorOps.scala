package graft.operators.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float|double>` columns, backed
  * by the native codegen expressions in [[graft.functions.VectorExprs]]
  * — single tight loops inside whole-stage codegen (higher-order
  * functions run interpreted, ~3 boxed evaluations per element), with
  * bit-identical sequential double sums so oracle parity is unchanged.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosine(a, b)

  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => when(n === 0, lit(0.0)).otherwise(x.cast("double") / n))
  }

  /** Signed random-hyperplane LSH bucket: bit i = sign(v · plane_i).
    * Planes are generated deterministically from `seed` on the driver
    * and inlined as literals — tiny (nbits × dim doubles), no
    * broadcast needed. Cosine-similar vectors collide with probability
    * 1 - theta/pi per bit (Charikar 2002). */
  /** The seeded Gaussian hyperplanes themselves — driver-side constants
    * shared by [[hyperplaneBucket]] and the oracle SQL builders
    * ([[HyperplaneOracle]]), which inline them as round-trip-exact
    * double literals so the PRODUCTION seeded-LSH paths value-oracle. */
  def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def hyperplaneBucket(v: Column, dim: Int, nbits: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, nbits, seed)
    (0 until nbits)
      .map { i =>
        val plane = typedLit(planes(i).toSeq)
        (dot(v, plane) >= 0).cast("long") * lit(1L << i)
      }
      .reduce(_ + _)
  }
}
