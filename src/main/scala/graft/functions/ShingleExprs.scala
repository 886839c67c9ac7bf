package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted-distinct shingle builders. The higher-order-function
  * formulations (`transform(sequence(...))` + `array_distinct` +
  * `array_sort`) run interpreted and re-scan the distinct set
  * quadratically — ~3 ms/document at 300-char docs, which made the
  * shingle BUILD (not the pair join) the dominant cost of exact-Jaccard
  * queries at sf0.1. These expressions produce the same values —
  * identical windows, identical `greatest(len-k+1, 1)` short-input
  * convention, binary UTF8 sort order (what `array_sort` uses) — in
  * one pass through a TreeSet (~50 µs/document).
  */
object ShingleExprsImpl {

  /** Sorted distinct character k-shingles of (already-normalized)
    * text: windows i = 0 .. max(len-k, 0), code-point semantics —
    * `substr(i+1, k)` clamped at the end, matching
    * TextOps.charShingles. */
  def charShingles(text: UTF8String, k: Int): ArrayData = {
    val len = text.numChars()
    val n = math.max(len - k + 1, 1)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      set.add(text.substringSQL(i + 1, k))
      i += 1
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size())))
  }

  /** Sorted distinct token n-grams of (already-normalized) text:
    * single-space tokenization, windows of n tokens joined by one
    * space, short streams contribute their whole token run — matching
    * TextOps.tokenShingles over TextOps.normalized output. */
  def tokenShingles(text: UTF8String, n: Int): ArrayData = {
    val space = UTF8String.fromString(" ")
    val toks = text.split(space, -1)
    val count = math.max(toks.length - n + 1, 1)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, toks.length)
      set.add(UTF8String.concatWs(
        space, java.util.Arrays.copyOfRange(toks, i, hi): _*))
      i += 1
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size())))
  }
}

sealed abstract class ShingleExpr extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string arg, got ${child.dataType}")
}

case class SortedCharShingles(child: Expression, k: Int) extends ShingleExpr {
  override def nullSafeEval(t: Any): Any =
    ShingleExprsImpl.charShingles(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.ShingleExprsImpl.charShingles($t, $k)")
  override protected def withNewChildInternal(c: Expression): SortedCharShingles =
    copy(child = c)
  override def prettyName: String = "sorted_char_shingles"
}

case class SortedTokenShingles(child: Expression, n: Int) extends ShingleExpr {
  override def nullSafeEval(t: Any): Any =
    ShingleExprsImpl.tokenShingles(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.ShingleExprsImpl.tokenShingles($t, $n)")
  override protected def withNewChildInternal(c: Expression): SortedTokenShingles =
    copy(child = c)
  override def prettyName: String = "sorted_token_shingles"
}

object ShingleExprs {
  def sortedCharShingles(text: Column, k: Int): Column =
    ColumnBridge.column(SortedCharShingles(ColumnBridge.expression(text), k))
  def sortedTokenShingles(text: Column, n: Int): Column =
    ColumnBridge.column(SortedTokenShingles(ColumnBridge.expression(text), n))
}
