package graft

import org.apache.spark.sql.functions._

/** The DataSource V2 connector's scan-efficiency contract
  * (graft.sources.SeqSource): pushdown must PRUNE, not post-filter.
  * Each mechanism is pinned through the physical plan / RDD, not just
  * through result correctness — a regression to produce-then-drop
  * would still return correct rows but fail here. */
class SourcesSpec extends SparkSpec {

  private def seq(rows: Int, parts: Int) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows).option("parts", parts).load()

  test("id-range filters push into the source and tighten the generation range") {
    val df = seq(100000, 8).filter(col("id") >= lit(500L) && col("id") < lit(600L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[500,600)"), plan)
    assert(df.count() === 100L)
  }

  test("non-id predicates stay residual and are re-applied by Spark") {
    val df = seq(1000, 2).filter(col("id") < lit(100L) && col("bucket") === 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,100)"), plan)
    // residual bucket filter survives as a Spark Filter above the scan
    assert(plan.contains("Filter"), plan)
    assert(df.select("id").collect().map(_.getLong(0)).toSet === Set(5L))
  }

  test("column pruning reaches the reader") {
    val df = seq(1000, 2).select(col("bucket"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=bucket"), plan)
    assert(df.distinct().count() === 97L)
  }

  test("the source plans its own parallelism: one partition per range slice") {
    assert(seq(100000, 8).rdd.getNumPartitions === 8)
    // a pushed range narrower than the slice count degenerates gracefully
    val tiny = seq(100000, 8).filter(col("id") >= lit(0L) && col("id") < lit(3L))
    assert(tiny.count() === 3L)
  }

  test("generated values match the documented multiplicative hash") {
    val r = seq(10, 1).filter(col("id") === lit(7L)).collect().head
    val mval = (7L * 2654435761L) % (1L << 32)
    assert(r.getAs[Long]("mval") === mval)
    assert(r.getAs[Int]("bucket") === 7)
    assert(r.getAs[Double]("uval") === mval.toDouble / (1L << 32))
  }
}
