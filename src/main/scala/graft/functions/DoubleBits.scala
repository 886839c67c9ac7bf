package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** IEEE-754 bit pattern of a double as a long, via
  * `java.lang.Double.doubleToLongBits` — which canonicalizes EVERY NaN
  * (any payload, quiet or signaling) to the single pattern
  * 0x7ff8000000000000L, exactly the all-NaNs-are-one-value equivalence
  * `count(DISTINCT)` applies. All other doubles map injectively to
  * their bits, so `distinct` over the encoding equals `distinct` over
  * the doubles — PROVIDED the caller has already collapsed −0.0 to
  * 0.0 (`x + 0.0`), since the two zeros compare equal but carry
  * different bit patterns and doubleToLongBits preserves them.
  *
  * Purpose (r19 "not yet optimized" #3 / r20 verdict item 4): lets
  * float/double columns ride [[graft.operators.TableProfile]]'s typed
  * long distinct encoding instead of a per-cell `Double.toString`
  * render — toString of a double is the shortest-round-trip Ryū/Grisu
  * algorithm, far heavier than one static call, and the string rows
  * are wider through the dedup shuffle.
  */
case class DoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"double_bits needs a double, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"java.lang.Double.doubleToLongBits($v)")
  override protected def withNewChildInternal(newChild: Expression): DoubleBits =
    copy(child = newChild)
  override def prettyName: String = "double_bits"
}

object DoubleBits {
  def apply(c: Column): Column =
    ColumnBridge.column(DoubleBits(ColumnBridge.expression(c)))
}
