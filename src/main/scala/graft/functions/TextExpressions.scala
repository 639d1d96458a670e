package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** codepoint_char(cp): the Unicode code point `cp` as a one-character
  * string (surrogate-pair encoded above the BMP). Exists because
  * Spark's built-in `chr()` is the ASCII/Latin-1 function — it wraps
  * code points at 256 (`chr(955)` is byte 0xBB, not "λ"), which makes
  * it unusable for decoding HTML numeric character references
  * (`&#955;`, `&#x1F600;`) in the web-extraction chain (Web
  * .extractMainText). Callers guard range/surrogates; out-of-contract
  * input fails fast rather than emitting U+FFFD silently. */
case class CodePointChar(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(IntegerType)

  override def nullSafeEval(v: Any): Any = {
    val cp = v.asInstanceOf[Int]
    require(cp >= 0 && cp <= Character.MAX_CODE_POINT &&
      !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE),
      s"codepoint_char: invalid code point $cp")
    UTF8String.fromString(new String(Character.toChars(cp)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cpc", this, getClass.getName)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.unsafe.types.UTF8String) $self.nullSafeEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CodePointChar =
    copy(child = newChild)
}

object codepointChar {
  def apply(cp: Column): Column = Bridge.column(CodePointChar(Bridge.expr(cp)))
}
