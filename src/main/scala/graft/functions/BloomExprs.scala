package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen expression — the
  * scalable form of the exact-dup guard: a billion corpus fingerprints
  * are ~1.2 GB of raw md5 strings (unbroadcastable) but ~170 MB of
  * bloom bits at 1% fpp, and the filter answers NO with certainty (no
  * false negatives), so rows it rejects skip the exact-confirmation
  * join entirely. Shipped into codegen as a reference object (the
  * [[WordPieceTokens]] pattern): one JVM-resident filter per executor,
  * zero per-row cost beyond the hash probes, no UDF.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string arg, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    bloom.mightContainString(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, s => s"$ref.mightContainString($s.toString())")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)

  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {
  def mightContain(bloom: BloomFilter, s: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(s), bloom))
}
