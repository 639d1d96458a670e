package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf WIRE-FORMAT codec for fixed-schema payloads — the
  * protobuf sibling of [[AvroExpressions]]. Unlike Avro, NOTHING of
  * protobuf ships in this image (spark-sql-api carries only the three
  * always-throwing SQL stubs; no engine classes, no protobuf-java —
  * COVERAGE.md documents the check), so the Avro closure trick
  * (bridge to a bundled engine) is unavailable. The wire format
  * itself, however, is small, public, and stable
  * (https://protobuf.dev/programming-guides/encoding/): tag varints
  * `(fieldNumber << 3) | wireType`, unsigned LEB128 varints, fixed64
  * little-endian doubles, and length-delimited byte fields. These two
  * expressions implement that subset natively — enough to encode and
  * decode the flat records a Kafka payload pipeline actually carries —
  * with the schema declared as a catalyst struct whose i-th field is
  * protobuf field number i+1.
  *
  * Supported catalyst types: LongType / IntegerType (varint — plain,
  * NOT zigzag: these pipelines carry non-negative ids; a negative
  * value would cost 10 bytes, exactly as proto int64 does),
  * BooleanType (varint 0/1), DoubleType (fixed64 LE), StringType /
  * BinaryType (length-delimited). Encoding writes every non-null
  * field in field-number order and OMITS nulls (explicit presence);
  * decoding returns null for absent fields, tolerates fields arriving
  * in ANY order, and SKIPS unknown field numbers carried on the
  * varint / fixed64 / length-delimited / fixed32 wire types (fixed32
  * covers e.g. a float added in a newer schema generation) — the
  * proto compatibility behaviors that make the format useful across
  * schema generations. The deprecated group wire types (3/4) are NOT
  * skippable without a recursive END_GROUP scan and throw instead.
  * Truncated or malformed payloads throw loudly (FAILFAST, matching
  * [[FromAvroExpr]]), including tags whose field number is 0 or
  * exceeds the spec's 2^29-1 cap — a conforming encoder can emit
  * neither, so both mark corruption rather than schema drift.
  *
  * Scale: both are per-row codegen-fused expressions (the same
  * reference-object callback as the Avro pair) — map-only, no
  * shuffle, no driver involvement. */
object ProtoWire {

  private[functions] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** (value, nextPos); loud on truncation/overlong. */
  private[functions] def readVarint(bytes: Array[Byte], pos0: Int): (Long, Int) = {
    var pos = pos0
    var shift = 0
    var v = 0L
    while ({
      require(pos < bytes.length, s"truncated varint at $pos0")
      require(shift < 64, s"overlong varint at $pos0")
      val b = bytes(pos)
      v |= (b & 0x7fL) << shift
      pos += 1
      shift += 7
      (b & 0x80) != 0
    }) ()
    (v, pos)
  }

  private def wireType(dt: DataType): Int = dt match {
    case LongType | IntegerType | BooleanType => 0 // varint
    case DoubleType                           => 1 // fixed64
    case StringType | BinaryType              => 2 // length-delimited
    case other =>
      throw new IllegalArgumentException(
        s"proto codec: unsupported field type ${other.simpleString}")
  }

  /** struct InternalRow → wire bytes (field i ⇒ proto field i+1). */
  def encode(row: InternalRow, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val wt = wireType(f.dataType)
        writeVarint(out, ((i + 1).toLong << 3) | wt)
        f.dataType match {
          case LongType    => writeVarint(out, row.getLong(i))
          case IntegerType => writeVarint(out, row.getInt(i).toLong)
          case BooleanType => writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case DoubleType =>
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            (0 until 8).foreach(b => out.write(((bits >>> (8 * b)) & 0xff).toInt))
          case StringType =>
            val b = row.getUTF8String(i).getBytes
            writeVarint(out, b.length.toLong)
            out.write(b, 0, b.length)
          case BinaryType =>
            val b = row.getBinary(i)
            writeVarint(out, b.length.toLong)
            out.write(b, 0, b.length)
          case _ => throw new IllegalStateException("unreachable")
        }
      }
    }
    out.toByteArray
  }

  /** wire bytes → struct InternalRow under the declared schema:
    * absent → null, any field order, unknown fields skipped by wire
    * type. */
  def decode(bytes: Array[Byte], schema: StructType): InternalRow = {
    val values = new Array[Any](schema.length)
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = readVarint(bytes, pos)
      // compare the field number as a LONG before narrowing: a corrupt
      // tag whose low 32 bits happen to land in 1..schema.length must
      // not be silently misattributed to a declared field (conforming
      // encoders cap field numbers at 2^29-1, so anything above marks
      // corruption, as does the spec-invalid field number 0)
      val fieldL = tag >>> 3
      require(fieldL >= 1L && fieldL <= 536870911L,
        s"invalid field number $fieldL at $pos (spec range is 1..2^29-1)")
      val field = fieldL.toInt
      val wt = (tag & 0x7).toInt
      pos = p1
      val known = field >= 1 && field <= schema.length
      if (known)
        require(wt == wireType(schema(field - 1).dataType),
          s"field $field: wire type $wt does not match declared " +
            schema(field - 1).dataType.simpleString)
      wt match {
        case 0 =>
          val (v, p2) = readVarint(bytes, pos)
          pos = p2
          if (known) values(field - 1) = schema(field - 1).dataType match {
            case LongType    => v
            case IntegerType => v.toInt
            case BooleanType => v != 0L
            case _           => throw new IllegalStateException("unreachable")
          }
        case 1 =>
          require(pos + 8 <= bytes.length, s"truncated fixed64 at $pos")
          var bits = 0L
          (0 until 8).foreach(b => bits |= (bytes(pos + b) & 0xffL) << (8 * b))
          pos += 8
          if (known) values(field - 1) = java.lang.Double.longBitsToDouble(bits)
        case 2 =>
          val (len, p2) = readVarint(bytes, pos)
          require(len >= 0 && p2 + len <= bytes.length,
            s"truncated length-delimited field at $pos (len $len)")
          pos = p2 + len.toInt
          if (known) values(field - 1) = schema(field - 1).dataType match {
            case StringType => UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bytes, p2, p2 + len.toInt))
            case BinaryType =>
              java.util.Arrays.copyOfRange(bytes, p2, p2 + len.toInt)
            case _ => throw new IllegalStateException("unreachable")
          }
        case 5 =>
          // no declared type maps to fixed32, so a KNOWN field already
          // failed the wire-type require above; an unknown fixed32
          // (e.g. a float in a newer schema generation) is skipped
          require(pos + 4 <= bytes.length, s"truncated fixed32 at $pos")
          pos += 4
        case other =>
          throw new IllegalArgumentException(
            s"unsupported wire type $other at $pos (deprecated groups not skippable)")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
}

/** Catalyst struct → protobuf wire bytes (field i ⇒ proto field
  * number i+1). */
case class ToProtoExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val schema = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"to_proto needs a struct, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ProtoWire.encode(input.asInstanceOf[InternalRow], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("toProtoExpr", this)
    defineCodeGen(ctx, ev, input => s"(byte[]) $self.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Protobuf wire bytes → the struct the DDL string declares (i-th
  * field ⇒ proto field number i+1). */
case class FromProtoExpr(child: Expression, ddl: String) extends UnaryExpression {

  override lazy val dataType: DataType = StructType.fromDDL(ddl)

  override def nullable: Boolean = true

  @transient private lazy val schema = dataType.asInstanceOf[StructType]

  override def nullSafeEval(input: Any): Any =
    ProtoWire.decode(input.asInstanceOf[Array[Byte]], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fromProtoExpr", this)
    val dt = CodeGenerator.javaType(dataType)
    defineCodeGen(ctx, ev, input => s"($dt) $self.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProtoFunctions {
  /** struct column → protobuf wire bytes. */
  def toProto(data: Column): Column =
    Bridge.column(ToProtoExpr(Bridge.expr(data)))

  /** protobuf wire bytes → the struct `ddl` declares. */
  def fromProto(data: Column, ddl: String): Column =
    Bridge.column(FromProtoExpr(Bridge.expr(data), ddl))
}
