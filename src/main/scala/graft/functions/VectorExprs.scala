package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dense-vector kernels. The higher-order-function formulation
  * (`aggregate`/`zip_with`) runs interpreted — three boxed lambda
  * evaluations per element per cosine — and Catalyst does not
  * constant-fold folds over literal probe arrays, so a brute-force scan
  * re-derived the probe's own norm per corpus row. These expressions
  * are single tight JVM loops inside whole-stage codegen computing the
  * SAME sequential left-to-right double sums (each accumulator starts
  * at 0.0 and adds in index order), so results are bit-identical to the
  * HOF formulation and to the DuckDB oracle's list_reduce.
  */
object VectorExprsImpl {

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Sequential dot product. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(a, i, aF) * elem(b, i, bF)
      i += 1
    }
    acc
  }

  /** Sequential squared-L2 distance — same index-order double fold as
    * [[dot]], so it matches the oracle's list_reduce bit for bit. */
  def sqDist(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = elem(a, i, aF) - elem(b, i, bF)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Single-pass cosine: dot, |a|², |b|² accumulated together —
    * identical values to three separate sequential folds. */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aF)
      val y = elem(b, i, bF)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0) 0.0 else d / denom
  }
}

sealed abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // pure + deterministic: literal-only calls constant-fold (e.g. a
  // probe's own bucket/norm), instead of re-evaluating per row
  override def foldable: Boolean = children.forall(_.foldable)

  protected def isFloatArr(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> args, got " +
          s"(${left.dataType}, ${right.dataType})")
  }
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprsImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left.dataType), isFloatArr(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprsImpl.dot($a, $b, " +
        s"${isFloatArr(left.dataType)}, ${isFloatArr(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprsImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left.dataType), isFloatArr(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprsImpl.cosine($a, $b, " +
        s"${isFloatArr(left.dataType)}, ${isFloatArr(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

case class SquaredDistance(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprsImpl.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left.dataType), isFloatArr(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprsImpl.sqDist($a, $b, " +
        s"${isFloatArr(left.dataType)}, ${isFloatArr(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
