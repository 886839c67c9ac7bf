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

  // ---- DuckDB oracle: the wraparound polynomial hash, bit-exact ----
  //
  // The kernel's Long arithmetic is mod-2^64 on the bit pattern, so
  // DuckDB re-derives it in HUGEINT: prefix hashes p_i = p_{i-1}·B + c
  // (the list_reduce seeds by PREPENDING [0]; elements are singleton
  // lists so accumulator and element types unify), then each window
  // hash is the exact identity h_i = p_{i+w-1} − p_{i-1}·B^w (mod
  // 2^64) — one subtraction instead of re-folding w chars per
  // position — converted to the signed-Long view before the MIN
  // (the kernel compares SIGNED). Multiplies split into 32-bit limbs
  // so no intermediate exceeds 2^127. ord() = the kernel's charAt for
  // the ASCII corpus.

  private val M64 = "CAST('18446744073709551616' AS HUGEINT)"
  private def mulmod(x: String, c: String): String =
    s"""((($x) % 4294967296) * $c
       |          + (((($x) // 4294967296) * $c) % 4294967296) * 4294967296) % $M64""".stripMargin
  private val B = "1000003"

  /** qt05 oracle: (doc_id, fp_rolling) over normalized text. */
  def oracleSql(window: Int): String = {
    val hh = s"((pl[i + w] - ${mulmod("pl[i]", "bw")}) % $M64 + $M64) % $M64"
    s"""WITH nt AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
       |  FROM documents),
       |pre AS (
       |  SELECT doc_id, len(s) AS n, least($window, len(s)) AS w,
       |    list_reduce(
       |      list_prepend([CAST(0 AS HUGEINT)],
       |        list_transform(range(1, len(s) + 1),
       |          i -> [CAST(ord(substring(s, i, 1)) AS HUGEINT)])),
       |      (acc, x) -> list_append(acc,
       |        (${mulmod("acc[len(acc)]", B)} + x[1]) % $M64)) AS pl,
       |    list_reduce(
       |      list_prepend(CAST(1 AS HUGEINT),
       |        list_transform(range(1, least($window, len(s)) + 1),
       |          i -> CAST(1 AS HUGEINT))),
       |      (a, x) -> ${mulmod("a", B)}) AS bw
       |  FROM nt)
       |SELECT doc_id,
       |  list_min(list_transform(range(1, n - w + 2), i ->
       |    CAST(CASE WHEN (($hh)) >= CAST('9223372036854775808' AS HUGEINT)
       |              THEN (($hh)) - $M64 ELSE (($hh)) END AS BIGINT))) AS fp_rolling
       |FROM pre""".stripMargin
  }
}
