package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-style rolling fingerprint: minimum over all 5-char
  * windows of the first 40 bits of md5(window) — the seedless core of
  * [[PortableMinHashSigImpl]], engine-exact against the DuckDB oracle
  * (`list_min(list_transform(range(...), i -> md5-prefix(substring)))`,
  * query qt09). The interpreted higher-order formulation re-ran md5
  * through two HOFs per row (~40 ms/doc at 300 chars, 19.7 s for the
  * 5000-doc verify at sf0.1); this kernel is one tight JVM loop.
  *
  * Windows are Java chars (UTF-16 units), identical to the engines'
  * codepoint substring for BMP text — same caveat as the signature
  * kernel.
  */
object MinWindowMd5Impl {
  private val window = 5

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — must stay public + static-shaped. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    val md = md5Local.get()
    var min = Long.MaxValue
    val windows = math.max(n - window + 1, 1)
    var i = 0
    while (i < windows) {
      val w = s.substring(i, math.min(i + window, n))
      md.reset()
      val d = md.digest(w.getBytes(StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

case class MinWindowMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    MinWindowMd5Impl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinWindowMd5Impl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): MinWindowMd5 =
    copy(child = newChild)
}

object MinWindowMd5 {
  def apply(text: Column): Column =
    ColumnBridge.column(MinWindowMd5(ColumnBridge.expression(text)))
}
