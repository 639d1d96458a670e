package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Raw-layer ingestion: each input file is one JSON *array* of telemetry
  * objects (the reference's consumer writes `json.dumps(messages)` of a
  * whole batch — /root/reference/Kafka/Consumer/consumer_etl.py:63-67).
  *
  * Faithful double-parse (Glue_job.py:31-48):
  *   text file → from_json(ArrayType(String)) → explode → from_json(schema)
  *   → select("parsed.*")
  *
  * All narrow transformations — parsing scales linearly with input
  * splits; no shuffle anywhere in ingest.
  */
object RawJsonReader {

  /** Read a directory of raw JSON-array files against `schema`.
    * Malformed fields become NULL (PERMISSIVE) and fall through to
    * validation, exactly like the reference. */
  def read(spark: SparkSession, rawPath: String, schema: StructType): DataFrame =
    parse(spark.read.text(rawPath), schema)

  /** The same parse as a pure DataFrame→DataFrame (reused by the
    * streaming pipeline's file source). Input: a `value: String` column. */
  def parse(raw: DataFrame, schema: StructType): DataFrame =
    raw
      .select(from_json(col("value"), ArrayType(StringType)).as("json_array"))
      .select(explode(col("json_array")).as("json_string"))
      .withColumn("parsed", from_json(col("json_string"), schema))
      .select(col("parsed.*"))
}
