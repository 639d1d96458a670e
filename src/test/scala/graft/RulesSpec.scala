package graft

import graft.rules._
import org.apache.spark.sql.functions._

/** Unit semantics of the rule engine: NaN/null cleaning, null-failing
  * conjunction, reasons compaction (SURVEY.md §7.4 hard parts). */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq[(String, java.lang.Double)](
    ("a", 50.0), ("b", Double.NaN), ("c", null), ("d", 150.0))
    .toDF("id", "fuel")

  test("cleanNanNull maps NaN and null both to null") {
    val out = Validator.cleanNanNull(df, Seq("fuel"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").contains(50.0))
    assert(out("b").isEmpty)   // NaN → null
    assert(out("c").isEmpty)
    assert(out("d").contains(150.0))
  }

  test("faithful mode: null fails validity silently (ref semantics incl. its leak)") {
    val rules = Seq(Between("fuel", 0, 100, "fuel_out_of_range"))
    val v = Validator.validate(Validator.cleanNanNull(df, Seq("fuel")), rules,
      nullStrict = false)
      .select(col("id"), col("is_valid"), col("rejection_reasons"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getSeq[String](2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(v("a") === (Some(true), Seq()))
    // NaN→null → between yields NULL: not valid, but CASE gives no reason
    assert(v("b")._1.isEmpty && v("b")._2 === Seq())
    assert(v("c")._1.isEmpty && v("c")._2 === Seq())
    assert(v("d") === (Some(false), Seq("fuel_out_of_range")))
  }

  test("faithful mode: is_valid==false filter drops NULL-validity rows both ways") {
    val rules = Seq(Between("fuel", 0, 100, "fuel_out_of_range"))
    val v = Validator.validate(Validator.cleanNanNull(df, Seq("fuel")), rules,
      nullStrict = false)
    assert(v.filter(col("is_valid") === true).count() === 1)  // a
    assert(v.filter(col("is_valid") === false).count() === 1) // d
    // b, c (null validity) fall in neither side — matches Glue_job.py:84,90
  }

  test("strict mode (default): null/NaN inputs are rejected with the rule's reason") {
    val rules = Seq(Between("fuel", 0, 100, "fuel_out_of_range"))
    val v = Validator.validate(Validator.cleanNanNull(df, Seq("fuel")), rules)
    assert(v.filter(col("is_valid") === true).count() === 1)   // a
    assert(v.filter(col("is_valid") === false).count() === 3)  // b, c, d
    val reasons = v.filter(col("is_valid") === false)
      .select("rejection_reasons").collect().map(_.getSeq[String](0))
    assert(reasons.forall(_ === Seq("fuel_out_of_range")))
  }

  test("multi-rule reasons accumulate in rule order") {
    val d2 = Seq(("x", -5.0, "bogus")).toDF("id", "fuel", "status")
    val rules = Seq(
      Between("fuel", 0, 100, "fuel_out_of_range"),
      InSet("status", Seq("ok"), "bad_status"))
    val r = Validator.validate(d2, rules)
      .select("rejection_reasons").first().getSeq[String](0)
    assert(r === Seq("fuel_out_of_range", "bad_status"))
  }

  test("NestedNotNull fails when parent struct or field is null") {
    val d = spark.sql(
      """SELECT * FROM VALUES
          ('a', named_struct('lat', 1.0d, 'lon', 2.0d)),
          ('b', named_struct('lat', CAST(NULL AS DOUBLE), 'lon', 2.0d)),
          ('c', CAST(NULL AS STRUCT<lat: DOUBLE, lon: DOUBLE>))
        AS t(id, location)""")
    val v = Validator.validate(d,
      Seq(NestedNotNull("location", "lat", "missing_lat")))
      .select("id", "is_valid").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(v === Map("a" -> true, "b" -> false, "c" -> false))
  }
}
