package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine SimHash: 60-bit fingerprint whose per-token hash is the
  * first 15 hex chars of md5(token) — an operation DuckDB reproduces
  * exactly (`CAST('0x'||substring(md5(t),1,15) AS BIGINT)`), unlike the
  * FNV family in [[SimHash64]]. Bit b of the result is set when more
  * than half the tokens have bit b set (2·#set > n — the standard
  * Charikar vote with the tie falling to 0). Tokens are the
  * space-separated pieces of the pre-normalized text, duplicates kept —
  * both engines see the identical multiset.
  */
object PortableSimHashSigImpl {
  final val bits = 60

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — must stay public + static-shaped. */
  def compute(normText: UTF8String): Long = {
    val tokens = normText.toString.split(" ", -1)
    val md = md5Local.get()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < tokens.length) {
      md.reset()
      val d = md.digest(tokens(i).getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = first 7 bytes + high nibble of the 8th
      val h = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    val n = tokens.length
    var res = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) res |= (1L << b)
      b += 1
    }
    res
  }
}

case class PortableSimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  // pure + deterministic: literal-only calls constant-fold (e.g. a
  // probe's own bucket/norm), instead of re-evaluating per row
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"portable_simhash needs string, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    PortableSimHashSigImpl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableSimHashSigImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): PortableSimHashSig =
    copy(child = newChild)
  override def prettyName: String = "portable_simhash"
}

object PortableSimHashSig {
  def apply(normText: Column): Column =
    ColumnBridge.column(PortableSimHashSig(ColumnBridge.expression(normText)))
}
