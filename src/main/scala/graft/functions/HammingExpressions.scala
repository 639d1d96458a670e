package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** hamming(a, b): number of differing byte positions between two
  * equal-length strings — the SimHash near-dup distance (§2.9 native
  * Expression tier). The string spelling (16 substring compares + sum)
  * allocates per comparison; this compiles to one primitive byte loop
  * inside whole-stage codegen. Equal lengths are the caller's contract
  * (both sides are fixed-width fingerprints); mismatch fails fast.
  * Byte-wise compare is exact for the '0'/'1' (ASCII) fingerprint
  * alphabet this engine emits. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType

  // analysis-time typing: hamming(1, 2) is rejected (or implicitly cast)
  // by the analyzer instead of a runtime ClassCastException
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType, StringType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    require(a.length == b.length,
      s"hamming: length mismatch ${a.length} vs ${b.length}")
    var acc = 0
    var i = 0
    while (i < a.length) {
      if (a(i) != b(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ba  = ctx.freshName("ba")
      val bb  = ctx.freshName("bb")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        byte[] $ba = $a.getBytes();
        byte[] $bb = $b.getBytes();
        if ($ba.length != $bb.length) {
          throw new IllegalArgumentException("hamming: length mismatch");
        }
        int $acc = 0;
        for (int $i = 0; $i < $ba.length; $i++) {
          if ($ba[$i] != $bb[$i]) $acc++;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object hamming {
  def apply(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expr(a), Bridge.expr(b)))
}
