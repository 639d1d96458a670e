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

  // ---- MemTable: the write-side connector's commit protocol ----

  private def memWrite(name: String, df: org.apache.spark.sql.DataFrame,
      mode: String): Unit =
    df.write.format("graft.sources.MemTable").option("name", name)
      .mode(mode).save()

  private def memRead(name: String) =
    spark.read.format("graft.sources.MemTable").option("name", name).load()

  test("mem table append/overwrite round-trip through the commit protocol") {
    graft.sources.MemTable.drop("t_rt")
    memWrite("t_rt", spark.range(0, 10, 1, 3).toDF("id"), "append")
    assert(memRead("t_rt").count() === 10L)
    memWrite("t_rt", spark.range(0, 5, 1, 2).toDF("id"), "append")
    assert(memRead("t_rt").count() === 15L)
    // overwrite truncates inside the same atomic commit
    memWrite("t_rt", spark.range(0, 3, 1, 2).toDF("id"), "overwrite")
    assert(memRead("t_rt").collect().map(_.getLong(0)).sorted === Array(0L, 1L, 2L))
  }

  test("a failed write aborts: no partial partition becomes visible") {
    graft.sources.MemTable.drop("t_abort")
    memWrite("t_abort", spark.range(0, 7, 1, 2).toDF("id"), "append")
    val bad = spark.range(0, 100, 1, 4).selectExpr(
      "id", "IF(id = 99, raise_error('boom'), 1) AS x")
    intercept[Exception] { memWrite("t_abort", bad, "append") }
    // partitions 0-2 wrote fine but their rows must NOT be installed
    assert(graft.sources.MemTable.committedRows("t_abort") === 7L)
    assert(memRead("t_abort").count() === 7L)
  }

  test("mem table preserves writer partitioning on read") {
    graft.sources.MemTable.drop("t_parts")
    memWrite("t_parts", spark.range(0, 100, 1, 5).toDF("id"), "append")
    assert(memRead("t_parts").rdd.getNumPartitions === 5)
  }

  test("streaming face drains via admission control: multiple bounded micro-batches") {
    val name = "seq_stream_spec"
    val q = spark.readStream.format("graft.sources.SeqSource")
      .option("rows", 50000).option("parts", 4).option("batchRows", 16384).load()
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val progress = q.recentProgress
      // ceil(50000 / 16384) = 4 data batches (a trailing empty batch may follow)
      assert(progress.count(_.numInputRows > 0) === 4, progress.map(_.numInputRows).mkString(","))
      assert(progress.map(_.numInputRows).sum === 50000L)
      assert(spark.table(name).agg(sum(col("cnt"))).first().getLong(0) === 50000L)
    } finally {
      if (q.isActive) q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("property: random range pushdowns match a local recomputation") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val rows  = 1 + rnd.nextInt(5000)
      val parts = 1 + rnd.nextInt(6)
      val a = rnd.nextInt(rows + 100) - 50
      val b = a + rnd.nextInt(rows + 50)
      val df = seq(rows, parts)
        .filter(col("id") >= lit(a.toLong) && col("id") < lit(b.toLong))
      val got = df.agg(count(lit(1)), sum(col("mval"))).first()
      val lo = math.max(0, a); val hi = math.min(rows, b)
      val ids = lo until hi
      val expectN = math.max(0, hi - lo).toLong
      val expectSum =
        if (ids.isEmpty) null
        else Long.box(ids.map(i => (i.toLong * 2654435761L) % (1L << 32)).sum)
      assert(got.getLong(0) === expectN, s"rows=$rows parts=$parts [$a,$b)")
      assert((if (got.isNullAt(1)) null else Long.box(got.getLong(1))) === expectSum,
        s"rows=$rows parts=$parts [$a,$b)")
    }
  }

  test("generated values match the documented multiplicative hash") {
    val r = seq(10, 1).filter(col("id") === lit(7L)).collect().head
    val mval = (7L * 2654435761L) % (1L << 32)
    assert(r.getAs[Long]("mval") === mval)
    assert(r.getAs[Int]("bucket") === 7)
    assert(r.getAs[Double]("uval") === mval.toDouble / (1L << 32))
  }

  private def withCatalog[A](f: => A): A = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.dir", sfDir)
    f
  }

  test("catalog resolves tables by name and the scan keeps full pushdown") {
    withCatalog {
      val df = spark.sql(
        "SELECT o_orderkey FROM graft.data.orders WHERE o_orderstatus = 'F'")
      val plan = df.queryExecution.executedPlan.toString
      // catalog-resolved parquet scan pushes the predicate like any
      // path-resolved one
      assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), " +
        "EqualTo(o_orderstatus,F)"), plan)
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("o_totalprice"), readSchema)
      assert(df.count() ===
        spark.read.parquet(s"$sfDir/orders.parquet")
          .filter(col("o_orderstatus") === "F").count())
    }
  }

  test("catalog lists the dataset's tables and SHOW TABLES sees them") {
    withCatalog {
      val names = spark.sql("SHOW TABLES IN graft.data")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(Set("lineitem", "orders", "customer", "events", "documents")
        .subsetOf(names), names)
    }
  }

  test("catalog dir is re-read from the session conf per lookup") {
    withCatalog {
      val n1 = spark.sql("SELECT count(*) AS n FROM graft.data.region")
        .first().getLong(0)
      spark.conf.set("spark.sql.catalog.graft.dir", "/root/testdata/sf0.01")
      try {
        val n2 = spark.table("graft.data.documents").count()
        assert(n2 > 0 && n1 > 0)
        assert(n2 === spark.read.parquet("/root/testdata/sf0.01/documents.parquet").count())
      } finally spark.conf.set("spark.sql.catalog.graft.dir", sfDir)
    }
  }

  test("catalog functions: bound at analysis time, bad arg types rejected") {
    withCatalog {
      val v = spark.sql(
        "SELECT graft.data.vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .first().getDouble(0)
      assert(v === 11.0)
      // SHOW FUNCTIONS resolves through the catalog
      val fns = spark.sql("SHOW FUNCTIONS IN graft.data")
        .collect().map(_.getString(0)).toSet
      assert(fns.exists(_.endsWith("vec_dot")), fns)
      // bind() rejects non-array args during ANALYSIS, not at runtime
      intercept[Exception] {
        spark.sql("SELECT graft.data.vec_dot(1, 2)").queryExecution.analyzed
      }
    }
  }

  test("catalog is read-only: DDL fails, missing tables raise analysis errors") {
    withCatalog {
      intercept[Exception] {
        spark.sql("DROP TABLE graft.data.orders")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM graft.data.no_such_table").collect()
      }
    }
  }
}
