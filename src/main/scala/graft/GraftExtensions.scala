package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{MinHashSignature, RollingMinHash, SimHash64}

/** SparkSessionExtensions hook: registers graft's custom Catalyst
  * expressions as SQL functions, so the engine's sketching primitives
  * are usable from `spark.sql(...)` and from any SQL-speaking client,
  * not only the Column API. Activated by
  * `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession.builder]]; on a cluster, pass the same conf to
  * spark-submit).
  *
  *   - simhash64(tokens array<string>) -> bigint
  *   - minhash_signature(text string, k int, shingle int) -> array<bigint>
  *   - rolling_min_hash(text string, window int) -> bigint
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64(tokens)")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "minhash_signature(text, k, shingle)")
        MinHashSignature(
          children.head,
          intLit(children(1), "minhash_signature", "k"),
          intLit(children(2), "minhash_signature", "shingle"))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "rolling_min_hash(text, window)")
        RollingMinHash(
          children.head, intLit(children(1), "rolling_min_hash", "window"))
      }))
  }
}
