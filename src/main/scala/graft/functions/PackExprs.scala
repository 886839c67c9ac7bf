package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Next-fit bin number as a declarative WINDOW AGGREGATE — the running
  * state (current sequence fill, current bin) no built-in window
  * function can express: `sum() over` has no reset, and the classic
  * cumsum-div-capacity trick splits documents across bins instead of
  * packing whole ones. Implemented the way Spark builds `row_number`
  * itself ([[AggregateWindowFunction]]): a two-slot aggregation buffer
  * advanced by pure Catalyst expressions over the running
  * (UnboundedPreceding, CurrentRow) row frame, so WindowExec evaluates
  * it with code-generated projections — no UDAF object, no
  * per-row boxing.
  *
  * Semantics per partition, rows in frame order: starting from
  * (fill=0, bin=1), a row of length L (caller guarantees L <= capacity
  * and non-null) lands in the current bin when fill+L <= capacity,
  * else opens bin+1; the expression returns the 1-based bin of each
  * row. A row with L == capacity exactly fills a bin.
  */
case class NextFitBin(len: Expression, capacity: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(len, capacity)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "next_fit_bin"

  private lazy val fill =
    AttributeReference("fill", LongType, nullable = false)()
  private lazy val bin =
    AttributeReference("bin", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(fill, bin)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(1L))

  // KnownNotNull keeps the update expressions' nullability aligned with
  // the non-nullable buffer slots (the operator feeds a non-null
  // least(tokens, capacity) length).
  private lazy val lenNN = KnownNotNull(len)
  private lazy val capNN = KnownNotNull(capacity)
  private lazy val overflow = GreaterThan(Add(fill, lenNN), capNN)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(overflow, lenNN, Add(fill, lenNN)),
    If(overflow, Add(bin, Literal(1L)), bin))

  override lazy val evaluateExpression: Expression = bin

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NextFitBin =
    copy(len = newChildren(0), capacity = newChildren(1))
}

object PackExprs {

  /** `next_fit_bin(len, capacity) OVER (PARTITION BY .. ORDER BY ..
    * ROWS UNBOUNDED PRECEDING)` — assembled as a raw Catalyst
    * [[WindowExpression]] rather than `Column.over`: the Column API
    * wraps any [[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction]]
    * in an AggregateExpression, a shape CheckAnalysis rejects for
    * window functions (Spark's own row_number avoids it by resolving
    * through the function registry). */
  def nextFitBinOver(
      len: Column,
      capacity: Column,
      partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column = {
    val wf = NextFitBin(
      ColumnBridge.expression(len), ColumnBridge.expression(capacity))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c =>
        SortOrder(ColumnBridge.expression(c), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(wf, spec))
  }
}
