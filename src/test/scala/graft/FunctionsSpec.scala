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
}
