package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-element MinHash signature of a string's character shingles — a
  * native Catalyst expression with code generation, replacing the
  * earlier higher-order-function formulation (`aggregate` over a
  * shingle array with a `zip_with` running min). Higher-order functions
  * are interpreted, so that version cost ~shingles×k×2 boxed expression
  * evaluations per row (~4 ms/doc — 20 s for a 5k-doc partition); this
  * one is a tight JVM loop inside whole-stage codegen (~50 µs/doc).
  *
  * Algorithm: slide a `shingle`-byte window over the UTF-8 bytes of the
  * (pre-normalized) text; FNV-1a the window to one 64-bit value h; for
  * each of k hash-family members derive splitmix64(h + i·golden) and
  * keep the element-wise min. Duplicate shingles need no dedup — equal
  * shingles produce equal hashes and min() absorbs them, so the
  * signature is a true set-MinHash. Short texts (< shingle bytes) hash
  * as a single whole-string shingle, matching TextOps.charShingles'
  * `greatest(len-k+1, 1)` convention.
  */
object MinHashSignatureImpl {
  private final val GOLDEN = 0x9e3779b97f4a7c15L

  private def fnv1a64(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 30
    x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27
    x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    x
  }

  /** Called from generated code — must stay public + static-shaped. */
  def compute(text: UTF8String, k: Int, shingle: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val windows = math.max(n - shingle + 1, 1)
    var w = 0
    while (w < windows) {
      val len = math.min(shingle, n - w)
      val h = fnv1a64(bytes, w, math.max(len, 0))
      var i = 0
      var seed = h
      while (i < k) {
        val v = splitmix64(seed)
        if (v < sig(i)) sig(i) = v
        seed += GOLDEN
        i += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }
}

case class MinHashSignature(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression {
  require(k > 0 && shingle > 0, "k and shingle must be positive")
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
          s"minhash_signature needs string, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    MinHashSignatureImpl.compute(v.asInstanceOf[UTF8String], k, shingle)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignatureImpl.compute($c, $k, $shingle)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** Column API: minhash signature of (already normalized) text. */
  def apply(text: Column, k: Int, shingle: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(text), k, shingle))
}
