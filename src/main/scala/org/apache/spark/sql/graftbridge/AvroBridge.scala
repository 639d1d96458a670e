package org.apache.spark.sql.graftbridge

import org.apache.avro.Schema

import org.apache.spark.sql.avro.{AvroDeserializer, AvroSerializer, SchemaConverters}
import org.apache.spark.sql.types.DataType

/** In-package hop for the Avro engine bundled in spark-sql:
  * `AvroSerializer` / `AvroDeserializer` are `private[sql]` (the
  * public API was the separate spark-avro artifact's wrappers, absent
  * from this image), so `graft.functions.AvroExpressions` reaches them
  * through these three factory methods — the same pattern as
  * [[Bridge]]. */
object AvroBridge {

  /** Catalyst struct-schema → Avro schema derived by the engine's own
    * converter (used for tests/diagnostics; the board query supplies an
    * explicit writer schema). */
  def toSqlType(avroSchema: Schema): DataType =
    SchemaConverters.toSqlType(avroSchema).dataType

  /** catalyst value → Avro datum (feed a GenericDatumWriter). */
  def serializer(catalystType: DataType, avroSchema: Schema,
      nullable: Boolean): Any => Any = {
    val s = new AvroSerializer(catalystType, avroSchema, nullable)
    s.serialize _
  }

  /** Avro datum → catalyst value (None on a deserializer-level skip;
    * the graft wrappers surface that as null). */
  def deserializer(avroSchema: Schema, catalystType: DataType): Any => Option[Any] = {
    val d = new AvroDeserializer(avroSchema, catalystType,
      // no pre-1582 rebase ambiguity in per-row payloads we also wrote
      "CORRECTED",
      /* useStableIdForUnionType = */ false,
      /* stableIdPrefixForUnionType = */ "",
      /* recursiveFieldMaxDepth = */ -1)
    d.deserialize _
  }
}
