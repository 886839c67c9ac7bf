package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib compression ratio of the UTF-8 text: compressed/raw bytes.
  * The classic corpus-quality signal orthogonal to token statistics —
  * boilerplate and repetitive junk compress far below natural prose
  * (~0.1 vs ~0.5-0.7), and near-random noise compresses above 1.
  * Deterministic for a given JVM's bundled zlib at a fixed level, but
  * NOT an engine-portable value (no SQL oracle reproduces deflate), so
  * queries using it are gate-style: booleans with wide margins, like
  * qs08/qd17.
  */
object DeflateRatioImpl {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }

  def ratio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length.toDouble
  }
}

case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string arg, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    DeflateRatioImpl.ratio(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.DeflateRatioImpl.ratio($t)")

  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)

  override def prettyName: String = "deflate_ratio"
}

object DeflateRatioFn {
  def apply(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))
}
