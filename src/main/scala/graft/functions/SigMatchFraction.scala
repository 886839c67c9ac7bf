package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fraction of equal components between two long-array signatures — the
  * unbiased MinHash Jaccard estimate, evaluated per CANDIDATE PAIR (the
  * multiplicative hot loop of LSH dedup: pairs × k). Native codegen
  * replaces the interpreted aggregate/zip_with fold; the value is the
  * identical integer-count-over-k division both the HOF formulation and
  * the DuckDB oracle compute.
  */
object SigMatchFractionImpl {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    val k = math.max(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    if (k == 0) 0.0 else eq.toDouble / k
  }
}

case class SigMatchFraction(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // pure + deterministic: literal-only calls constant-fold (e.g. a
  // probe's own bucket/norm), instead of re-evaluating per row
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_match_fraction needs two array<bigint>, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    SigMatchFractionImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigMatchFractionImpl.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchFraction =
    copy(left = l, right = r)
  override def prettyName: String = "sig_match_fraction"
}

object SigMatchFraction {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SigMatchFraction(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
