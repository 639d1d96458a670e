package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native row-generating n-grams: `grams(tokens, n)` emits one
  * `(pos, gram)` row per length-n sliding window — the custom Catalyst
  * `Generator` tier (the row-EXPANDING analog of the scalar
  * `ShingleArray` expression; SURVEY §2.7 F3 names `explode` as the
  * only generator-class op in the reference, this is the extension
  * surface for custom ones).
  *
  * Versus `posexplode(shingles(toks, n))`: the array expression must
  * materialize every window up front (one `GenericArrayData` + all
  * grams resident per document before the explode), while a Generator
  * streams rows out of `GenerateExec` as they are produced and carries
  * the window ordinal for free. Same per-gram work, strictly less
  * allocation lifetime — the shape that matters when a document yields
  * thousands of windows.
  *
  * CodegenFallback is the right tier here for the same reason as
  * ShingleArray: the per-CALL work is an entire document's windows, so
  * the interpreted boundary amortizes; `GenerateExec` itself keeps
  * whole-stage codegen for the surrounding operators.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  require(n >= 1, s"gram size must be >= 1, got $n")

  // analysis-time typing: grams(1, 2) fails in the analyzer, and a
  // non-string array is rejected before execution
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val m   = math.max(len - n + 1, 0)
      val win = new Array[UTF8String](n)
      val out = new Array[InternalRow](m)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { win(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = new GenericInternalRow(
          Array[Any](i, UTF8String.concatWs(sep, win.toIndexedSeq: _*)))
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}

object generators {
  /** One (pos, gram) row per length-n sliding window of `tokens`. */
  def grams(tokens: Column, n: Int): Column =
    Bridge.column(NGramGenerator(Bridge.expr(tokens), n))
}
