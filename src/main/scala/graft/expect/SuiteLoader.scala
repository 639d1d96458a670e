package graft.expect

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declarative expectation-suite loader for the reference's Great
  * Expectations JSON format
  * (/root/reference/great_expectations/Expectations/Validation_checks.json:1-36):
  * `{"expectations": [{"expectation_type": ..., "kwargs": {...}}, ...]}`.
  *
  * The reference drives its quality gate from that JSON file; until
  * round 7 this engine's suite was code-defined only, so a user editing
  * the JSON got nothing. This loader closes that declarative-surface
  * gap: the three expectation kinds the reference file uses map onto
  * the [[Expectations]] constructors, producing the same single-pass
  * distributed gate. Unknown expectation types are REJECTED loudly —
  * a silently dropped check is a quality gate that lies.
  *
  * json4s-jackson is Spark's own bundled JSON library
  * (/opt/spark/jars/json4s-jackson_2.13-4.0.7.jar) — no new
  * dependency.
  */
object SuiteLoader {

  private def str(kw: JValue, key: String, ctx: String): String =
    kw \ key match {
      case JString(v) => v
      case other => throw new IllegalArgumentException(
        s"$ctx: expected string kwarg '$key', got $other")
    }

  private def num(kw: JValue, key: String, ctx: String): Double =
    kw \ key match {
      case JInt(v)     => v.toDouble
      case JLong(v)    => v.toDouble
      case JDouble(v)  => v
      case JDecimal(v) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$ctx: expected numeric kwarg '$key', got $other")
    }

  private def strings(kw: JValue, key: String, ctx: String): Seq[String] =
    kw \ key match {
      case JArray(vs) => vs.map {
        case JString(v) => v
        case other => throw new IllegalArgumentException(
          s"$ctx: '$key' must contain only strings, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"$ctx: expected array kwarg '$key', got $other")
    }

  /** Parse one expectation object into the engine's representation. */
  private def one(j: JValue): Expectation = {
    val tpe = j \ "expectation_type" match {
      case JString(v) => v
      case other => throw new IllegalArgumentException(
        s"expectation missing string 'expectation_type' (got $other)")
    }
    val kw = j \ "kwargs"
    tpe match {
      case "expect_column_values_to_not_be_null" =>
        Expectations.notNull(str(kw, "column", tpe))
      case "expect_column_values_to_be_between" =>
        Expectations.between(str(kw, "column", tpe),
          num(kw, "min_value", tpe), num(kw, "max_value", tpe))
      case "expect_column_values_to_be_in_set" =>
        Expectations.inSet(str(kw, "column", tpe),
          strings(kw, "value_set", tpe))
      // two standard GE row-wise types beyond the reference file's
      // three — the common additions a user's edited suite reaches for
      case "expect_column_values_to_match_regex" =>
        Expectations.matchesRegex(str(kw, "column", tpe),
          str(kw, "regex", tpe))
      case "expect_column_value_lengths_to_be_between" =>
        Expectations.lengthBetween(str(kw, "column", tpe),
          num(kw, "min_value", tpe).toInt, num(kw, "max_value", tpe).toInt)
      case unknown =>
        throw new IllegalArgumentException(
          s"unsupported expectation_type '$unknown' — supported: " +
            "expect_column_values_to_not_be_null, " +
            "expect_column_values_to_be_between, " +
            "expect_column_values_to_be_in_set, " +
            "expect_column_values_to_match_regex, " +
            "expect_column_value_lengths_to_be_between")
    }
  }

  /** Parse a GE-format JSON document into a runnable suite. */
  def fromJson(json: String): Seq[Expectation] =
    JsonMethods.parse(json) \ "expectations" match {
      case JArray(es) =>
        if (es.isEmpty) throw new IllegalArgumentException(
          "suite has no expectations — an empty gate always passes")
        es.map(one)
      case other => throw new IllegalArgumentException(
        s"top-level 'expectations' must be an array, got $other")
    }

  /** Load a suite from a JSON file on local disk. */
  def fromFile(path: String): Seq[Expectation] =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
