package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hot loop of the hashed-feature linear scorer
  * ([[graft.operators.text.QualityClassifier]]): word bigrams of the
  * pre-normalized text hash into `D` feature buckets (the standard
  * feature-hashing trick — fixed parameter count regardless of
  * vocabulary), each bucket carries an INTEGER weight in
  * [-1000, 1000], and the expression returns the exact integer sum of
  * the document's bigram weights. Integer weights make the fold
  * order-independent (the [[FixedPoint]] argument), so the same value
  * comes out of any partitioning — and out of DuckDB, which re-derives
  * every hash and weight from md5 (`qw_<bucket>`), keeping the scorer
  * fully value-oracled.
  *
  * Weights here are md5-derived — the externally-supplied-weights mode
  * (train offline, apply online) every production fasttext-style
  * quality filter runs in; a trained weight vector drops in by
  * replacing `weightOf`, with identical plan shape.
  */
object HashedScoreImpl {
  final val D = 4096

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s) as a 60-bit nonnegative long —
    * DuckDB's `CAST('0x'||substring(md5(s),1,15) AS BIGINT)`. */
  private def md5_60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Bucket weight in [-1000, 1000]; a pure function of the bucket
    * index shared verbatim with the oracle SQL. */
  def weightOf(md: MessageDigest, bucket: Long): Long =
    md5_60(md, "qw_" + bucket) % 2001 - 1000

  /** Called from generated code — exact integer sum of bigram weights. */
  def compute(normText: UTF8String): Long = {
    val tokens = normText.toString.split(" ", -1)
    val md = md5Local.get()
    var sum = 0L
    var i = 0
    while (i < tokens.length - 1) {
      val bucket = md5_60(md, tokens(i) + " " + tokens(i + 1)) % D
      sum += weightOf(md, bucket)
      i += 1
    }
    sum
  }
}

case class HashedScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_score needs string, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    HashedScoreImpl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashedScoreImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): HashedScore =
    copy(child = newChild)
  override def prettyName: String = "hashed_score"
}

object HashedScore {
  def apply(normText: Column): Column =
    ColumnBridge.column(HashedScore(ColumnBridge.expression(normText)))
}
