package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY.md §7.3
  * perf-tier option).
  *
  * The `zip_with`/`aggregate` higher-order-function formulation of a
  * dot product allocates an intermediate array and evaluates a lambda
  * per element — interpreted, per-pair garbage. These expressions
  * compile to a primitive double loop inside whole-stage codegen (and
  * a boxing-free primitive loop in interpreted eval), which is what
  * makes O(N·Q·dim) brute-force similarity and O(N²·dim) near-dup
  * joins feasible: ~100× less allocation on the hot path.
  *
  * Float inputs are upcast per element exactly like
  * `CAST(x AS DOUBLE)`, so results stay bit-identical to the HOF
  * formulation and the DuckDB oracle (left-to-right summation order).
  */
private[graft] object VecUtil {
  /** Per-element double accessor that avoids boxing for both float and
    * double array inputs. */
  def get(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** dot(a, b) = Σ a_i·b_i, left-to-right. NULL if either side is NULL;
  * arrays must have equal length (analysis-checked lengths are the
  * caller's contract; mismatch throws like zip_with would not — fail
  * fast beats silent truncation). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a  = l.asInstanceOf[ArrayData]
    val b  = r.asInstanceOf[ArrayData]
    val fa = isFloatArr(left)
    val fb = isFloatArr(right)
    val n  = a.numElements()
    require(n == b.numElements(), s"dot: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecUtil.get(a, i, fa) * VecUtil.get(b, i, fb)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloatArr(left)) "getFloat" else "getDouble"
    val getB = if (isFloatArr(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      // freshName: a fixed local would collide (Janino compile failure →
      // silent interpreted fallback) when two of these expressions land
      // in one codegen scope
      val acc = ctx.freshName("acc")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw new IllegalArgumentException("dot: length mismatch");
        }
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** l2norm(a) = sqrt(Σ a_i²) — same codegen shape as DotProduct. */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a  = v.asInstanceOf[ArrayData]
    val fa = isFloat
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = VecUtil.get(a, i, fa)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i   = ctx.freshName("i")
      val x   = ctx.freshName("x")
      // freshName: see DotProduct — a fixed `acc` local collides when two
      // such expressions share a codegen scope
      val acc = ctx.freshName("acc")
      s"""
        double $acc = 0.0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          final double $x = (double) $a.$get($i);
          $acc += $x * $x;
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Column-API face of the native expressions (Spark 4 Column↔Expression
  * bridging via the classic converter). */
object vec {
  import Bridge.{column, expr}

  def dot(a: Column, b: Column): Column = column(DotProduct(expr(a), expr(b)))
  def l2norm(a: Column): Column         = column(L2Norm(expr(a)))
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
