package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingling: `shingles(tokens, n)` → all length-n
  * sliding windows joined with spaces.
  *
  * The HOF spelling — `transform(sequence(0, size-n), i ->
  * concat_ws(' ', slice(toks, i+1, n)))` — evaluates three nested
  * interpreted lambdas and allocates a slice array per window (~30 µs
  * per shingle observed); this expression is one flat loop over the
  * token array reusing a window buffer. CodegenFallback is fine here:
  * the per-ROW work is chunky (a whole document's shingles), so the
  * fallback boundary cost is negligible, unlike per-element lambdas.
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m   = math.max(len - n + 1, 0)
    val out = new Array[AnyRef](m)
    val win = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { win(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object text {
  /** All length-n sliding token windows of `tokens` (array<string>). */
  def shingles(tokens: Column, n: Int): Column =
    Bridge.column(ShingleArray(Bridge.expr(tokens), n))
}
