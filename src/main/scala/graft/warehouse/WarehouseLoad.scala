package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse tail: the Snowpipe COPY projections re-expressed as a
  * Spark cast/extract projection
  * (/root/reference/Snowflake/Curated_pipe.sql:6-14,
  * Rejected_pipe.sql:6-14 — `$1:field::TYPE` per column over staged
  * parquet, `PATTERN => '.*parquet'`, `ON_ERROR='CONTINUE'`).
  *
  * Spark equivalents: parquet scan (+ `pathGlobFilter` for PATTERN),
  * `col.cast(...)` per field (ON_ERROR≈PERMISSIVE null-on-bad-cast),
  * struct-field access for the `$1:location` VARIANT extraction.
  */
object WarehouseLoad {

  /** Load a curated-layer parquet directory with the Curated_pipe.sql
    * column projection. */
  def curated(spark: SparkSession, path: String): DataFrame =
    spark.read.option("pathGlobFilter", "*.parquet").parquet(path)
      .select(
        col("truck_id").cast("string"),
        col("timestamp").cast("string"),
        col("location"),                       // VARIANT ≈ struct passthrough
        col("location.lat").cast("double").as("lat"),
        col("location.lon").cast("double").as("lon"),
        col("fuel_level").cast("double"),
        col("temperature").cast("double"),
        col("delivery_status").cast("string"),
        col("processed_at").cast("timestamp"),
        col("data_quality_flag").cast("string"),
        col("ge_validation_status").cast("string"))

  /** Date-partitioned curated layout: the warehouse-tail pattern for
    * 100 TB — `partitionBy` turns the date predicate every downstream
    * consumer uses into partition pruning (PartitionFilters in the
    * scan, untouched partitions never opened). */
  def writePartitionedByDate(df: DataFrame, dateCol: String, path: String): Unit =
    df.write.partitionBy(dateCol).mode("overwrite").parquet(path)

  /** Rejected_pipe.sql projection (reasons kept as array). */
  def rejected(spark: SparkSession, path: String): DataFrame =
    spark.read.option("pathGlobFilter", "*.parquet").parquet(path)
      .select(
        col("truck_id").cast("string"),
        col("timestamp").cast("string"),
        col("location"),
        col("fuel_level").cast("double"),
        col("temperature").cast("double"),
        col("delivery_status").cast("string"),
        col("processed_at").cast("timestamp"),
        col("rejection_reasons"))
}
