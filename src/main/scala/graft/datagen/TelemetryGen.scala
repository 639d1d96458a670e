package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded, fully deterministic telemetry generator — the Spark-native
  * equivalent of the reference's producer + anomaly injector
  * (/root/reference/Kafka/Producer/Producer.py:125-140, 72-88): 15
  * trucks, lat≈17.38/lon≈78.48, fuel∈[50,100], temp∈[15,25], a 3-value
  * status enum, and a 15 % anomaly rate injecting nulls, "NaN" strings
  * and out-of-range numerics.
  *
  * Determinism comes from hash-mixing the row id (not `rand()`, whose
  * draw order depends on partitioning) so fixtures are reproducible
  * across any cluster layout. Output mimics the consumer's raw layer
  * (consumer_etl.py:63-67): each line is one JSON array of `batchSize`
  * records — exactly what ingest.RawJsonReader expects.
  */
object TelemetryGen {

  val anomalyRate = 0.15
  val statuses    = Seq("in_transit", "delivered", "delayed")

  /** Uniform [0,1) from (id, salt) — stable under repartitioning. */
  private def u(salt: Int): Column =
    pmod(hash(col("id"), lit(salt)), lit(1000000)).cast("double") / 1000000.0

  /** One JSON object string per record, anomalies included. */
  def recordJson(spark: SparkSession, n: Long, seed: Int = 42): DataFrame = {
    val truck  = format_string("TRUCK_%03d", (u(seed + 1) * 15).cast("int") + 1)
    val ts     = date_format(
      timestamp_seconds(lit(1700000000L) + col("id")), "yyyy-MM-dd'T'HH:mm:ss")
    val lat    = round(lit(17.38) + u(seed + 2) * 0.01, 6)
    val lon    = round(lit(78.48) + u(seed + 3) * 0.01, 6)
    val fuel   = round(lit(50.0) + u(seed + 4) * 50.0, 2)
    val temp   = round(lit(15.0) + u(seed + 5) * 10.0, 1)
    val status = element_at(
      array(statuses.map(lit): _*), (u(seed + 6) * 3).cast("int") + 1)

    val isAnom = u(seed + 7) < anomalyRate
    val target = (u(seed + 8) * 3).cast("int")  // 0=fuel 1=temp 2=location
    val mode   = (u(seed + 9) * 3).cast("int")  // 0=null 1="NaN" 2=out-of-range

    def numJson(clean: Column, outOfRange: String, tgt: Int): Column =
      when(isAnom && target === tgt,
        when(mode === 0, lit("null"))
          .when(mode === 1, lit("\"NaN\""))
          .otherwise(lit(outOfRange)))
        .otherwise(clean.cast("string"))

    val fuelJson = numJson(fuel, "9999", 0)
    val tempJson = numJson(temp, "200", 1)
    val locJson = when(isAnom && target === 2,
      when(mode === 0, lit("null"))
        .when(mode === 1, lit("""{"lat":"NaN","lon":"NaN"}"""))
        .otherwise(lit("""{"lat":-999,"lon":999}""")))
      .otherwise(concat(lit("""{"lat":"""), lat.cast("string"),
        lit(""","lon":"""), lon.cast("string"), lit("}")))

    spark.range(n).select(col("id"),
      concat(
        lit("""{"truck_id":""""), truck,
        lit("""","timestamp":""""), ts,
        lit("""","location":"""), locJson,
        lit(""","fuel_level":"""), fuelJson,
        lit(""","temperature":"""), tempJson,
        lit(""","delivery_status":""""), status, lit("\"}")
      ).as("json"))
  }

  /** Raw-layer lines: one JSON array of `batchSize` records per line
    * (one consumer batch per line). */
  def rawJsonLines(spark: SparkSession, n: Long, batchSize: Int = 100,
      seed: Int = 42): DataFrame =
    recordJson(spark, n, seed)
      .groupBy((col("id") / batchSize).cast("long").as("batch"))
      .agg(concat(lit("["), concat_ws(",", collect_list(col("json"))), lit("]"))
        .as("value"))
      .select("value")

  /** Write a raw fixture directory readable by RawJsonReader. */
  def writeRaw(spark: SparkSession, path: String, n: Long,
      batchSize: Int = 100, seed: Int = 42): Unit =
    rawJsonLines(spark, n, batchSize, seed).coalesce(1)
      .write.mode("overwrite").text(path)
}
