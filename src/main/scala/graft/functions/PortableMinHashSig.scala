package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluation of [[graft.operators.dedup.PortableMinHash]]'s
  * signature: per 5-char window, the first 40 bits of md5(window) mixed
  * per seed by (h ^ seed) * prime, element-wise min across windows.
  * Every operation is exactly what the DuckDB oracle SQL computes
  * (md5 hex prefix as integer, BIGINT xor/multiply below 2^60), so the
  * native expression and the SQL produce identical arrays; this class
  * only removes the interpreted higher-order-function overhead
  * (~50 ms/doc → ~0.2 ms/doc).
  *
  * Windows are taken over Java chars (UTF-16 units): identical to the
  * engines' codepoint substring for all BMP text (the fixtures are
  * ASCII); supplementary-plane text would need codepoint stepping.
  */
object PortableMinHashSigImpl {
  import graft.operators.dedup.PortableMinHash.{numHashes, prime, seeds, shingleSize}

  private val seedArr: Array[Long] = seeds.toArray

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — must stay public + static-shaped. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val md = md5Local.get()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val windows = math.max(n - shingleSize + 1, 1)
    var i = 0
    while (i < windows) {
      val w = s.substring(i, math.min(i + shingleSize, n))
      md.reset()
      val d = md.digest(w.getBytes(StandardCharsets.UTF_8))
      // first 10 hex chars = first 5 bytes, big-endian, unsigned
      val h = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      var k = 0
      while (k < numHashes) {
        val v = (h ^ seedArr(k)) * prime
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

case class PortableMinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
          s"portable_minhash_sig needs string, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    PortableMinHashSigImpl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableMinHashSigImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
  override def prettyName: String = "portable_minhash_sig"
}

object PortableMinHashSig {
  def apply(text: Column): Column =
    ColumnBridge.column(PortableMinHashSig(ColumnBridge.expression(text)))
}
