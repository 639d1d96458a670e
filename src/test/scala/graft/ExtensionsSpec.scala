package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.functions._

/** SQL surface of the native expressions. */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT
          vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          vec_l2norm(array(3.0d, 4.0d)) AS n,
          shingles(array('a','b','c','d'), 3) AS sh,
          hamming('0110', '0011') AS hd""").first()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getSeq[String](2) === Seq("a b c", "b c d"))
    assert(r.getInt(3) === 2)
    // codegen path (per-row, non-literal inputs) agrees with eval
    val hd = spark.range(16).selectExpr(
      "hamming(lpad(bin(id), 4, '0'), '0000') AS h").collect().map(_.getInt(0))
    assert(hd.toSeq === (0 until 16).map(Integer.bitCount))
    val hh = spark.sql(
      """SELECT freq_items_sketch(t, 10) AS hh FROM (
          SELECT explode(array('x','x','x','y','z')) AS t)""")
      .first().getMap[String, Long](0)
    assert(hh.get("x").contains(3L))
    // the Avro codec pair from pure SQL (the built-in to_avro/from_avro
    // SQL names throw AVRO_NOT_LOADED in this image; the graft_ pair is
    // the working reimplementation over the bundled engine)
    val av = spark.sql(
      """SELECT graft_from_avro(
           graft_to_avro(named_struct('a', 7L),
             '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'),
           '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}').a
         AS a""").first()
    assert(av.getLong(0) === 7L)
  }

  test("optimizer rule vectorizes the HOF dot-product pattern") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      Seq(graft.plans.VectorizeDotProduct)
    try {
      // coalesce in the lambda → containsNull=false → provably no null
      // elements → the rewrite is semantics-preserving and fires
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          transform(col("embedding"), x => coalesce(x.cast("double"), lit(0.0))).as("v"))
      val hof = e.select(col("vec_id"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("d"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("dotproduct"),
        hof.queryExecution.optimizedPlan.toString)
      // rewrite is exact: bit-identical to the native spelling
      val native = e.select(col("vec_id"), graft.functions.vec.dot(col("v"), col("v")).as("d"))
      assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("optimizer rule leaves nullable-element arrays alone") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      Seq(graft.plans.VectorizeDotProduct)
    try {
      // array elements MAY be null → HOF returns NULL for a null slot,
      // DotProduct would read 0.0 — the rewrite must not fire
      val df = spark.sql(
        "SELECT array(1.0d, if(id % 2 = 0, 2.0d, cast(null AS DOUBLE))) AS v FROM range(4)")
      val hof = df.select(
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("d"))
      assert(!hof.queryExecution.optimizedPlan.toString.contains("dotproduct"),
        hof.queryExecution.optimizedPlan.toString)
      // null element → whole aggregate NULL (the semantics the guard keeps)
      assert(hof.collect().count(_.isNullAt(0)) === 2)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("shingles rejects a non-literal size") {
    GraftExtensions.registerAll(spark)
    intercept[Exception] {
      spark.sql("SELECT shingles(array('a','b'), cast(rand()*2 AS INT))").collect()
    }
  }

  test("custom top-k operator: two-phase plan, one exchange, window-identical rows") {
    import graft.plans.TopK
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val topk = TopK.perKey(ev, Seq(col("event_type")),
      Seq(col("value").desc, col("event_id")), k = 3)
    val plan = topk.queryExecution.executedPlan.toString
    // partial (pre-shuffle) + final (post-shuffle) bounded heaps
    assert("GraftTopK".r.findAllIn(plan).size === 2, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Window"), plan)
    // exact same result set as the window spelling
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val expected = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(topk.collect().map(_.toSeq).toSet === expected)
  }

  test("custom top-k partial phase bounds the shuffle to k rows per key per task") {
    import graft.plans.{GraftTopKExec, TopK}
    import spark.implicits._
    // row-based local input: the partial node is executed UNPREPARED
    // below (no columnar→row transition pass runs on a bare sparkPlan)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.toDF("event_type", "event_id", "value")
      .repartition(4) // multiple map tasks
    val topk = TopK.perKey(ev, Seq(col("event_type")),
      Seq(col("value").desc, col("event_id")), k = 3)
    // execute the partial phase alone and count what WOULD shuffle
    // (sparkPlan, not executedPlan: AQE wraps the latter opaquely; the
    // partial node needs no exchange so it runs standalone)
    val partial = topk.queryExecution.sparkPlan.collectFirst {
      case e: GraftTopKExec if e.partial => e
    }.get
    val shuffled = partial.execute().count()
    val nKeys = ev.select(col("event_type")).distinct().count()
    assert(shuffled <= nKeys * 3 * 4, s"partial emitted $shuffled rows")
    // and far fewer than the full input (the point of the operator)
    assert(shuffled < ev.count() / 10, s"partial emitted $shuffled rows")
  }
}
