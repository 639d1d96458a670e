package graft.schemas

import org.apache.spark.sql.types._

/** Schemas for the logistics-telemetry pipeline.
  *
  * Mirrors the reference's declared contract: the telemetry StructType at
  * /root/reference/Glue/Glue_job.py:36-46 (truck_id/timestamp strings, a
  * nested lat/lon struct, nullable doubles, a status enum kept as
  * string). `timestamp` deliberately stays a string — the reference never
  * parses it (Producer.py:132; Snowflake/Curated_table.sql:4).
  */
object Schemas {

  val location: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true)))

  /** The one true telemetry record (Glue_job.py:36-46). */
  val telemetry: StructType = StructType(Seq(
    StructField("truck_id", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = true),
    StructField("location", location, nullable = true),
    StructField("fuel_level", DoubleType, nullable = true),
    StructField("temperature", DoubleType, nullable = true),
    StructField("delivery_status", StringType, nullable = true)))

  /** Lineage/governance record (Glue_job.py:131-140). */
  val lineage: StructType = StructType(Seq(
    StructField("layer", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("pipeline_name", StringType, nullable = false),
    StructField("run_timestamp", TimestampType, nullable = false)))

  /** Typed view of a telemetry record; boxed doubles because nulls are
    * semantically meaningful (they drive rejection). */
  final case class Location(lat: java.lang.Double, lon: java.lang.Double)
  final case class Telemetry(
      truck_id: String,
      timestamp: String,
      location: Location,
      fuel_level: java.lang.Double,
      temperature: java.lang.Double,
      delivery_status: String)
}
