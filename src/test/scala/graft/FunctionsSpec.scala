package graft

import graft.functions.vec
import org.apache.spark.sql.functions._

/** Native vector expressions: value parity with the HOF formulation
  * (bit-identical — same left-to-right order) and codegen viability. */
class FunctionsSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  test("DotProduct / L2Norm match the zip_with/aggregate HOFs bit-for-bit") {
    val both = e.select(
      vec.dot(col("v"), col("v")).as("native_dot"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof_dot"),
      vec.l2norm(col("v")).as("native_nrm"),
      sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)).as("hof_nrm"))
    val bad = both.filter(
      col("native_dot") =!= col("hof_dot") || col("native_nrm") =!= col("hof_nrm"))
    assert(bad.count() === 0)
  }

  test("dot works directly on float arrays (upcast per element)") {
    val f = Tables.embeddings(spark, sfDir)
      .select(vec.dot(col("embedding"), col("embedding")).as("d"),
        vec.dot(
          transform(col("embedding"), _.cast("double")),
          transform(col("embedding"), _.cast("double"))).as("dd"))
    assert(f.filter(col("d") =!= col("dd")).count() === 0)
  }

  test("expressions stay inside whole-stage codegen") {
    val plan = e.select(vec.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the '*' prefix marks operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l =>
      l.contains("dotproduct") && l.trim.startsWith("*")), plan)
  }

  test("null vector yields null, length mismatch fails fast") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Seq(3.0, 4.0)), (None, Seq(1.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(vec.dot(col("a"), col("b")).as("d")).collect()
    assert(got.map(r => Option(r.get(0))).toSeq === Seq(Some(11.0), None))
    val bad = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      bad.select(vec.dot(col("a"), col("b"))).collect()
    }
  }

  test("grams generator matches posexplode(shingles) row-for-row") {
    import spark.implicits._
    graft.functions.GraftExtensions.registerAll(spark)
    val df = Seq("a b c d e", "a b c", "a b", "x", "")
      .toDF("text").withColumn("toks", split(col("text"), " "))
    val native = df.selectExpr("text", "grams(toks, 3)")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val spelled = df
      .select(col("text"),
        posexplode(graft.functions.text.shingles(col("toks"), 3)))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(native === spelled)
    // docs shorter than n yield nothing; a null array yields nothing
    val nulls = Seq(Option.empty[Seq[String]]).toDF("toks")
      .selectExpr("grams(toks, 2)")
    assert(nulls.count() === 0)
  }

  test("grams rejects non-array input at analysis time") {
    graft.functions.GraftExtensions.registerAll(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT grams(1, 2)").queryExecution.analyzed
    }
  }

  test("int_cusum equals the clamped sequential fold (reset at 0)") {
    import spark.implicits._
    graft.functions.GraftExtensions.registerAll(spark)
    val rows = Seq(
      ("u1", 1L, 10L), ("u1", 2L, 3L), ("u1", 3L, 9L), ("u1", 4L, 0L),
      ("u1", 5L, 20L), ("u2", 1L, 4L), ("u2", 2L, 4L))
    val got = rows.toDF("k", "t", "v")
      .selectExpr("k", "t",
        "int_cusum(v, 5) OVER (PARTITION BY k ORDER BY t) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      rs.sortBy(_._2).scanLeft((0L, 0L)) { case ((_, acc), (_, t, v)) =>
        (t, math.max(0L, acc + v - 5L))
      }.tail.map { case (t, acc) => (k, t) -> acc }
    }
    assert(got === want)
  }

  test("int_ewma equals the per-key sequential fold, nulls count as 0") {
    import spark.implicits._
    graft.functions.GraftExtensions.registerAll(spark)
    val rows = Seq(
      ("u1", 1L, Some(100L)), ("u1", 2L, Some(50L)), ("u1", 3L, None),
      ("u1", 4L, Some(8L)), ("u2", 1L, Some(7L)), ("u2", 2L, Some(9L)))
    val got = rows.toDF("k", "t", "v")
      .selectExpr("k", "t",
        "int_ewma(v) OVER (PARTITION BY k ORDER BY t) AS e")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      rs.sortBy(_._2).scanLeft((0L, 0L)) { case ((_, acc), (_, t, v)) =>
        (t, v.getOrElse(0L) + (acc >> 1))
      }.tail.map { case (t, acc) => (k, t) -> acc }
    }
    assert(got === want)
  }
}
