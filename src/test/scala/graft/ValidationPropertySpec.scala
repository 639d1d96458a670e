package graft

import graft.pipeline.LogisticsPipeline
import graft.rules.Validator
import graft.schemas.Schemas.{Location, Telemetry}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check (SURVEY.md §5): for arbitrary corrupted
  * telemetry, every record lands in exactly one of curated/rejected
  * (strict mode) and `rejection_reasons` names exactly the violated
  * rules, in rule order — verified against an independent Scala oracle
  * of the rule semantics. Generators mirror the reference's anomaly
  * injector domains (Producer.py:72-88). */
class ValidationPropertySpec extends SparkSpec {

  private val genDouble: Gen[java.lang.Double] = Gen.frequency(
    6 -> Gen.choose(-20.0, 120.0).map(Double.box),
    1 -> Gen.const(null.asInstanceOf[java.lang.Double]),
    1 -> Gen.const(Double.box(Double.NaN)),
    1 -> Gen.oneOf(Seq(-9999.0, 9999.0)).map(Double.box))

  private val genLoc: Gen[Location] = Gen.frequency(
    5 -> (for { a <- genDouble; b <- genDouble } yield Location(a, b)),
    1 -> Gen.const(null.asInstanceOf[Location]))

  private val genRecord: Gen[Telemetry] = for {
    truck  <- Gen.frequency(5 -> Gen.alphaStr.map("TRUCK_" + _),
      1 -> Gen.const(null.asInstanceOf[String]))
    status <- Gen.oneOf("in_transit", "delivered", "delayed", "bogus", "teleported")
    loc    <- genLoc
    fuel   <- genDouble
    temp   <- genDouble
  } yield Telemetry(truck, "2024-01-01T00:00:00", loc, fuel, temp, status)

  /** Independent oracle: strict-mode reasons per rule, in rule order
    * (null/NaN count as failure — the engine's documented fix). */
  private def expectedReasons(t: Telemetry): Seq[String] = {
    def bad(v: java.lang.Double, lo: Double, hi: Double): Boolean =
      v == null || v.isNaN || v < lo || v > hi
    Seq(
      Option.when(t.truck_id == null)("missing_truck_id"),
      Option.when(bad(t.fuel_level, 0, 100))("fuel_level_out_of_range"),
      Option.when(bad(t.temperature, -10, 60))("temperature_out_of_range"),
      Option.when(!Seq("in_transit", "delivered", "delayed")
        .contains(t.delivery_status))("invalid_delivery_status"),
      Option.when(t.location == null || t.location.lat == null)("missing_lat"),
      Option.when(t.location == null || t.location.lon == null)("missing_lon"),
    ).flatten
  }

  test("∀ corrupted record: exactly one split, reasons = violated rules in order") {
    import spark.implicits._
    val records = Gen.listOfN(400, genRecord)
      .pureApply(Gen.Parameters.default, Seed(42L))
    val df = Validator.cleanNanNull(
      records.toDF(), Seq("fuel_level", "temperature"))
    val validated = Validator.validate(df, LogisticsPipeline.rules)

    val got = validated
      .select(col("is_valid"), col("rejection_reasons"))
      .collect()
      .map(r => (r.getBoolean(0), r.getSeq[String](1)))

    records.zip(got).zipWithIndex.foreach { case ((t, (isValid, reasons)), i) =>
      val want = expectedReasons(t)
      assert(isValid === want.isEmpty, s"record $i: $t")
      assert(reasons === want, s"record $i: $t")
    }
    // conservation: strict mode never drops a record from both splits
    val cur = validated.filter(col("is_valid") === true).count()
    val rej = validated.filter(col("is_valid") === false).count()
    assert(cur + rej === records.size.toLong)
  }
}
