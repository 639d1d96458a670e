package graft.expect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectation-suite quality gate, Spark-native.
  *
  * The reference gates with Great Expectations over a 500-row sample
  * collected to the driver (`limit(500).toPandas()`,
  * /root/reference/Glue/Glue_job.py:98-110, suite at
  * great_expectations/Expectations/Validation_checks.json). That driver-
  * side sample cannot scale; we keep the same four expectation kinds and
  * the same all-or-nothing verdict, but evaluate them as ONE distributed
  * full-scan aggregate — every violation count in a single job, no
  * collect (documented semantic upgrade: full data, not a sample;
  * `sample(n)` reproduces the reference's sampling when wanted).
  */
final case class Expectation(name: String, violation: Column)

object Expectations {

  def notNull(c: String): Expectation =
    Expectation(s"${c}_not_null", when(col(c).isNull, 1).otherwise(0))

  def between(c: String, lo: Double, hi: Double): Expectation =
    Expectation(s"${c}_between", when(!col(c).between(lo, hi), 1).otherwise(0))

  def inSet(c: String, values: Seq[String]): Expectation =
    Expectation(s"${c}_in_set", when(!col(c).isin(values: _*), 1).otherwise(0))

  /** GE expect_column_values_to_match_regex — NULL does not match
    * (GE counts nulls as violations of a regex expectation; pair with
    * notNull to make the intent explicit). */
  def matchesRegex(c: String, regex: String): Expectation =
    Expectation(s"${c}_matches_regex",
      when(!coalesce(col(c).rlike(regex), lit(false)), 1).otherwise(0))

  /** GE expect_column_value_lengths_to_be_between (string length
    * bounds, inclusive; NULL violates — it has no length). */
  def lengthBetween(c: String, lo: Int, hi: Int): Expectation =
    Expectation(s"${c}_length_between",
      when(!coalesce(length(col(c)).between(lo, hi), lit(false)), 1)
        .otherwise(0))

  /** The reference's exact suite (Glue_job.py:105-108). */
  val referenceSuite: Seq[Expectation] = Seq(
    notNull("truck_id"),
    between("fuel_level", 0, 100),
    between("temperature", -10, 60),
    inSet("delivery_status", Seq("in_transit", "delivered", "delayed")))

  /** Single-pass violation counts + PASSED/FAILED verdict as a 1-row
    * DataFrame (plan-only; composes into oracle-checked queries). */
  def report(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val counts = suite.map(e => sum(e.violation).as(s"viol_${e.name}"))
    val total  = suite.map(e => s"viol_${e.name}").map(col).reduce(_ + _)
    df.agg(counts.head, counts.tail: _*)
      .withColumn("verdict", when(total === 0, "PASSED").otherwise("FAILED"))
  }

  /** Run the gate (one distributed job) and return the verdict string. */
  def verdict(df: DataFrame, suite: Seq[Expectation]): String =
    report(df, suite).select("verdict").first().getString(0)

  /** Reference's all-or-nothing outcome (Glue_job.py:110-121): stamp the
    * verdict; on FAILED, re-flag every curated row REJECTED_GE with
    * reasons ['ge_failed'], union into rejected, and empty curated. */
  def applyVerdict(
      curated: DataFrame,
      rejected: DataFrame,
      geStatus: String): (DataFrame, DataFrame) = {
    val stamped = curated.withColumn("ge_validation_status", lit(geStatus))
    if (geStatus == "PASSED" || geStatus == "SKIPPED") (stamped, rejected)
    else {
      val failed = stamped
        .withColumn("rejection_reasons", array(lit("ge_failed")))
        .withColumn("data_quality_flag", lit("REJECTED_GE"))
        .select(rejected.columns.map(col): _*)
      (stamped.limit(0), rejected.unionByName(failed, allowMissingColumns = true))
    }
  }
}
