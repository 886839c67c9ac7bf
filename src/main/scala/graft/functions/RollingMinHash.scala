package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum
  * polynomial hash over every `window`-char substring (one O(n) rolling
  * pass). Two documents sharing any long-enough run of identical text
  * are likely to share the minimizing window — robust to prepends and
  * appends, unlike a whole-document hash. Native expression with
  * codegen (static call), same pattern as [[SimHash64]].
  */
object RollingMinHashImpl {
  private val B = 1000003L

  def compute(s: UTF8String, window: Int): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    var pow = 1L
    var i = 1
    while (i < w) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + str.charAt(i); i += 1 }
    var min = h
    while (i < n) {
      h = (h - str.charAt(i - w) * pow) * B + str.charAt(i)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

case class RollingMinHash(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  // pure + deterministic: literal-only calls constant-fold (e.g. a
  // probe's own bucket/norm), instead of re-evaluating per row
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && window > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash needs (string, window > 0), got (${child.dataType}, $window)")
  override def nullSafeEval(v: Any): Any =
    RollingMinHashImpl.compute(v.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingMinHashImpl.compute($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_min_hash"
}

object RollingMinHash {
  def apply(text: Column, window: Int): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(text), window))
}
