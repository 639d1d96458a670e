package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, AggregateWindowFunction, AttributeReference, Coalesce, ExpectsInputTypes, Expression, Greatest, Literal, ShiftRight, Subtract}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** `int_ewma(cents) OVER (PARTITION BY k ORDER BY t)`: integer EWMA
  * with decay 1/2 — the running recurrence `acc = x + (acc >> 1)` —
  * as a custom `AggregateWindowFunction` (the declarative window-
  * function tier: the same machinery `row_number`/`rank` are built
  * from, one step deeper than UDAFs because the state transition runs
  * INSIDE the window exec's running-frame loop).
  *
  * A linear recurrence is exactly what built-in window functions
  * cannot express: `sum() OVER (ROWS UNBOUNDED PRECEDING)` folds with
  * a fixed operator, and any lag()-based spelling needs one lag column
  * per history step. Here the whole history folds into ONE long of
  * state per partition, updated in event order.
  *
  * Everything is integer (inputs are pre-scaled cents; decay is a
  * right-shift), so the result is bit-exact and order-deterministic —
  * the DuckDB oracle re-derives it with a recursive CTE and matches
  * hash-for-hash. Null inputs count as 0 (Coalesce in the update), so
  * the accumulator never goes null. The frame is the class's fixed
  * ROWS UNBOUNDED PRECEDING..CURRENT ROW running frame.
  */
case class IntEwma(child: Expression)
    extends AggregateWindowFunction with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType)
  override def prettyName: String = "int_ewma"

  private lazy val acc = AttributeReference("acc", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  // acc = coalesce(x, 0) + (acc >> 1); non-negative inputs keep the
  // shift equal to floor-div-2 forever
  override lazy val updateExpressions: Seq[Expression] =
    Seq(Add(Coalesce(Seq(child, Literal(0L))), ShiftRight(acc, Literal(1))))
  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IntEwma =
    copy(child = newChildren.head)
}

/** `int_cusum(cents, drift) OVER (...)`: one-sided CUSUM change
  * detection — `acc = max(0, acc + (x − drift))` — the classic
  * sequential change-point statistic (Page 1954): the accumulator
  * climbs only while values run persistently above the `drift`
  * allowance and resets through the max(0, ·) floor otherwise.
  *
  * Same tier and same argument as [[IntEwma]]: a clamped recurrence is
  * inexpressible with built-in window functions (the reset makes it
  * non-linear, so not even a prefix-sum trick covers it), but it is
  * ONE long of declarative state inside the window exec's running
  * frame. All-integer ⇒ bit-exact ⇒ recursive-CTE oracle. */
case class IntCusum(child: Expression, drift: Long)
    extends AggregateWindowFunction with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType)
  override def prettyName: String = "int_cusum"

  private lazy val acc = AttributeReference("acc", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(Greatest(Seq(Literal(0L),
      Add(acc, Subtract(Coalesce(Seq(child, Literal(0L))), Literal(drift))))))
  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IntCusum =
    copy(child = newChildren.head)
}
