package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization — the missing normalization layer under
  * every text-dedup operator here: "Café" typed as composed U+00E9
  * and as decomposed e + U+0301 are DIFFERENT byte strings (different
  * md5, different MinHash shingles, different exact-dup groups) that
  * render identically, so un-normalized corpora leak visually-equal
  * duplicates straight through qd01/qd03. Two codegen'd scalar
  * expressions, no UDFs:
  *
  *   - [[NfcNormalize]] — Unicode NFC (canonical composition), the
  *     form W3C/WHATWG mandate for the web and what parquet writers
  *     usually emit; idempotent.
  *   - [[FoldAccents]] — NFD → strip combining marks (Mn) → NFC:
  *     the accent-insensitive fold (é→e, ü→u, ç→c) matching
  *     DuckDB/utf8proc `strip_accents` on Latin diacritics — the
  *     aggressive key for fuzzy linkage (qd30) and search.
  *
  * Scale shape: per-row scalar work inside whole-stage codegen, zero
  * shuffles — the same embarrassingly-parallel class as qt01/qt16.
  * The JDK's Normalizer implements the Unicode-specified (stable,
  * versioned) NFC/NFD algorithms, so values are engine-portable and
  * the whole output value-oracles against DuckDB.
  */
object UnicodeNormImpl {

  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost
    // always true for real corpora — avoids allocating a copy per row
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) t
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  private val MnPattern = java.util.regex.Pattern.compile("\\p{Mn}+")

  def foldAccents(t: UTF8String): UTF8String = {
    val s = t.toString
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val stripped = MnPattern.matcher(nfd).replaceAll("")
    val out = Normalizer.normalize(stripped, Normalizer.Form.NFC)
    if (out == s) t else UTF8String.fromString(out)
  }
}

sealed abstract class UnicodeUnary extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string arg, got ${child.dataType}")
}

case class NfcNormalize(child: Expression) extends UnicodeUnary {
  override def nullSafeEval(t: Any): Any =
    UnicodeNormImpl.nfc(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.UnicodeNormImpl.nfc($t)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

case class FoldAccents(child: Expression) extends UnicodeUnary {
  override def nullSafeEval(t: Any): Any =
    UnicodeNormImpl.foldAccents(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.UnicodeNormImpl.foldAccents($t)")
  override protected def withNewChildInternal(c: Expression): FoldAccents =
    copy(child = c)
  override def prettyName: String = "fold_accents"
}

object UnicodeFns {
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  def foldAccents(c: Column): Column =
    ColumnBridge.column(FoldAccents(ColumnBridge.expression(c)))
}
