package graft

import graft.analytics.{Curation, EventsPipeline, Stats}
import org.apache.spark.sql.functions._

/** Planted-data semantics for the statistical-test operators: the
  * oracle gate proves engine agreement on the synthetic corpus; these
  * specs prove the STATISTICS are right (χ² hits its closed-form value
  * on perfect dependence, Welch t is exact on hand-computable samples,
  * lift/EMD behave at their degenerate and extreme points). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000000L // ns

  test("chi2: perfect dependence hits the closed form chi2 = N, dof 1") {
    // type a only on day 0, type b only on day 1 — phi^2 = 1 so chi2 = N;
    // the two ZERO cells contribute half of that (the full-grid fix)
    val ev = (Seq.fill(100)(("a", 0L)) ++ Seq.fill(100)(("b", day)))
      .toDF("event_type", "ts_ns")
    val r = Stats.statsChi2Of(ev).collect().head
    assert(r.getAs[Long]("n") === 200L)
    assert(r.getAs[Long]("n_cells") === 4L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("chi2_centi") === 20000L) // chi2 = 200 = N
  }

  test("chi2: an independent (balanced) table scores exactly zero") {
    val ev = (for {
      t <- Seq("a", "b"); d <- Seq(0L, day); _ <- 1 to 50
    } yield (t, d)).toDF("event_type", "ts_ns")
    val r = Stats.statsChi2Of(ev).collect().head
    assert(r.getAs[Long]("chi2_centi") === 0L)
    assert(r.getAs[Long]("n_cells") === 4L)
  }

  test("welch t: identical samples give t = 0; a shift gives the hand value") {
    val same = Seq(("click", 1.0), ("click", 2.0), ("view", 1.0), ("view", 2.0))
      .toDF("event_type", "value")
    val r0 = Stats.statsTtestOf(same).collect().head
    assert(r0.getAs[Double]("t_stat") === 0.0)
    // click {10,11,12} vs view {1,2,3}: mean diff 900 cents, each
    // var 10000 cents^2 -> t = 900 / sqrt(20000/3) ~= 11.02, dof -> 4
    val shifted = (Seq(10.0, 11.0, 12.0).map(("click", _)) ++
      Seq(1.0, 2.0, 3.0).map(("view", _))).toDF("event_type", "value")
    val r1 = Stats.statsTtestOf(shifted).collect().head
    assert(math.abs(r1.getAs[Double]("t_stat") - 900.0 / math.sqrt(20000.0 / 3)) < 1e-9)
    assert(math.abs(r1.getAs[Double]("dof_welch") - 4.0) < 1e-9)
    assert(r1.getAs[Long]("q1") === 1000L * 1000 + 1100L * 1100 + 1200L * 1200)
  }

  test("cooccur: planted incidence pins n_ab and the multiply-through lift") {
    // users 1,2 do both a+b; 3 only a; 4 only b; 5 only c
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"), (5L, "c"), (1L, "a") /* dup event, same incid */)
      .toDF("user_id", "event_type")
    val rows = EventsPipeline.eventsCooccurOf(ev).collect()
    assert(rows.length === 1) // only (a,b) co-occurs
    val r = rows.head
    assert(r.getAs[String]("type_a") === "a" && r.getAs[String]("type_b") === "b")
    assert(r.getAs[Long]("n_ab") === 2L && r.getAs[Long]("n_a") === 3L &&
      r.getAs[Long]("n_b") === 3L && r.getAs[Long]("n_users") === 5L)
    assert(math.abs(r.getAs[Double]("lift") - 10.0 / 9.0) < 1e-12)
  }

  test("one-way ANOVA hits the hand-computed F on three planted groups") {
    // groups with cents {100,200,300}, {400,500,600}, {700,800,900}:
    // SSB = 3*(300^2 + 0 + 300^2) = 540000, SSW = 3*20000 = 60000,
    // F = (540000/2) / (60000/6) = 27
    val ev = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _)) ++
      Seq(7.0, 8.0, 9.0).map(("c", _))).toDF("event_type", "value")
    val r = Stats.statsAnovaOf(ev).collect().head
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 9L)
    assert(math.abs(r.getAs[Double]("ssb") - 540000.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ssw") - 60000.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_stat") - 27.0) < 1e-9)
  }

  test("seasonal decomposition: a pure 24h-periodic series has zero residual " +
    "and the seasonal-naive forecast scores MASE = 0 on it") {
    import org.apache.spark.sql.functions.{col, lit}
    // value(t) = f(hour-of-day) for 5 full days: every bucket matches
    // its hour-of-day mean exactly and lag-24 predicts perfectly
    val ev = (0 until 24 * 5).map { h =>
      (h.toLong * 3600000000000L, (1.0 + (h % 24).toDouble))
    }.toDF("ts_ns", "value")
    val dec = analytics.Relational.tsSeasonalOf(ev)
    assert(dec.count() === 120)
    assert(dec.filter(col("resid") =!= lit(0.0)).count() === 0)
    val fc = analytics.Relational.eventsForecastOf(ev).collect().head
    assert(fc.getAs[Long]("mae24_num") === 0L)
    assert(fc.getAs[Double]("mase") === 0.0)
    assert(fc.getAs[Long]("mae1_num") > 0L) // naive is NOT perfect
  }

  test("SQL-defined UDFs inline into the plan: no ScalaUDF, codegen intact") {
    val df = analytics.Relational.sqlUdf(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the function bodies must be expressions in the plan, not opaque
    // closures — ScalaUDF/BatchEvalPython would kill codegen+pushdown;
    // the bodies themselves must be visible as plain expressions
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"), plan)
    assert(plan.contains("CASE WHEN") && plan.contains("FLOOR"), plan)
    val tf = analytics.Relational.sqlUdtf(spark, "/root/testdata/sf0.001")
    assert(tf.count() === 24) // empty hours included by the spine join
  }

  test("volume gate flags a crashed day, abstains in warm-up, passes steady state") {
    import org.apache.spark.sql.functions.col
    val day = 86400000000000L
    // 10 steady days of 100 events, then day 10 crashes to 40 (-60%)
    val ev = ((0 until 10).flatMap(d => Seq.fill(100)(d.toLong * day)) ++
      Seq.fill(40)(10L * day)).toDF("ts_ns")
    val rows = analytics.EventsPipeline.expectVolumeOf(ev).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("flag")).toMap
    assert(rows(0L) === -1L && rows(1L) === -1L && rows(2L) === -1L) // warm-up
    assert((3L to 9L).forall(rows(_) === 0L)) // steady
    assert(rows(10L) === 1L) // the crash fires
  }

  test("gini: exactly 0 on a uniform distribution, (n-1)/n on one whale") {
    val uniform = Seq.fill(50)(2.5).toDF("value")
    val g0 = analytics.Relational.aggGiniOf(uniform).collect().head
    assert(g0.getAs[Double]("gini") === 0.0)
    // 49 zero-value rows + one whale: the discrete maximum (n-1)/n
    val whale = (Seq.fill(49)(0.0) ++ Seq(100.0)).toDF("value")
    val g1 = analytics.Relational.aggGiniOf(whale).collect().head
    assert(math.abs(g1.getAs[Double]("gini") - 49.0 / 50.0) < 1e-12)
  }

  test("balanced sample keeps exactly min-class rows per label") {
    import org.apache.spark.sql.functions.col
    val out = Curation.sampleBalanced(spark, "/root/testdata/sf0.01")
    val perLabel = out.groupBy(col("label")).count().collect()
      .map(r => r.getLong(1)).toSeq
    val minClass = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .groupBy(col("label")).count().collect().map(_.getLong(1)).min
    assert(perLabel.nonEmpty && perLabel.forall(_ === minClass))
  }

  test("t-closeness: one-group release is exactly t = 0; a fully " +
    "polarized split is exactly t = 0.5 on both sides") {
    def ev(rows: Seq[(String, Long, Double)]) = rows
      .toDF("event_type", "user_id", "value")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
    // every row in ONE QID group -> group distribution == global
    val one = ev((0 until 40).map(i => ("a", i.toLong, 1.0)))
    val r0 = Curation.privacyTclosenessOf(one).collect().head
    assert(r0.getAs[Double]("max_t") === 0.0)
    assert(r0.getAs[Long]("weak_groups") === 0L)
    // two value-band groups, one all cohort 0, the other all cohort 9:
    // EMD numerator = 9 n^2 against n*(2n)*9 -> t = 1/2 for each group
    val polar = ev((0 until 20).map(i => ("a", i * 10L, 1.0)) ++
      (0 until 20).map(i => ("a", i * 10L + 9L, 60.0)))
    val r1 = Curation.privacyTclosenessOf(polar).collect().head
    assert(r1.getAs[Double]("max_t") === 0.5)
    assert(r1.getAs[Long]("n_groups") === 2L)
    assert(r1.getAs[Long]("weak_groups") === 2L)
    assert(r1.getAs[Long]("weak_rows") === 40L)
  }

  test("mann-whitney: hand-planted ties pin the midrank algebra and z") {
    // clicks {0,0,1}, purchases {1,2,2} -> bins (0:2/0) (1:1/1) (2:0/2)
    // midrank2: 3, 7, 11; 2R1 = 2*3 + 7 = 13; 2U1 = 13 - 3*4 = 1
    // (U1 = 0.5 checked directly: one tied (click 1, purchase 1) pair)
    // ties3 = 3*(8-2) = 18; z = (0.5 - 4.5)/sqrt(0.75*(7 - 18/30))
    val ev = (Seq(0.0, 0.0, 1.0).map(("click", _)) ++
      Seq(1.0, 2.0, 2.0).map(("purchase", _)))
      .toDF("event_type", "value")
    val r = Stats.statsMannWhitneyOf(ev).collect().head
    assert(r.getAs[Long]("n1") === 3L && r.getAs[Long]("n2") === 3L)
    assert(r.getAs[Long]("r1_2") === 13L)
    assert(r.getAs[Long]("u1_2") === 1L)
    assert(r.getAs[Long]("ties3") === 18L)
    assert(math.abs(r.getAs[Double]("z")
      - (-4.0 / math.sqrt(0.75 * (7.0 - 0.6)))) < 1e-12)
  }

  test("mann-whitney: identical arms give U1 = n1*n2/2 and z = 0; " +
    "degenerate one-bin corpus NULLs the z guard") {
    val same = (Seq(1.0, 2.0).map(("click", _)) ++
      Seq(1.0, 2.0).map(("purchase", _))).toDF("event_type", "value")
    val r = Stats.statsMannWhitneyOf(same).collect().head
    assert(r.getAs[Long]("u1_2") === 4L) // 2*U1 = n1*n2 = 4
    assert(r.getAs[Double]("z") === 0.0)
    // every observation in one bin -> tie-corrected variance is 0 ->
    // the CASE guard must yield NULL, not a div-by-zero/NaN
    val onebin = (Seq(5.0, 5.1).map(("click", _)) ++
      Seq(5.2, 5.3).map(("purchase", _))).toDF("event_type", "value")
    val r1 = Stats.statsMannWhitneyOf(onebin).collect().head
    assert(r1.isNullAt(r1.fieldIndex("z")))
  }

  test("kruskal-wallis: singleton groups hit H = n-1; ties engage the " +
    "correction exactly") {
    // three singleton groups at distinct values: ranks 1,2,3 ->
    // H = 12/12 * (1+4+9) - 12 = 2 = n-1 (no ties, correction = 1)
    val distinct3 = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0))
      .toDF("event_type", "value")
    val r = Stats.statsKruskalOf(distinct3).collect().head
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("ties3") === 0L)
    assert(math.abs(r.getAs[Double]("h") - 2.0) < 1e-12)
    // a = {1,1} tied, b = {2}: midranks {1.5, 1.5, 3} -> R_a = 3,
    // R_b = 3; H_unc = (9/2 + 9) - 12 = 1.5; ties3 = 6 ->
    // correction 1 - 6/24 = 0.75 -> H = 2
    val tied = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0))
      .toDF("event_type", "value")
    val r1 = Stats.statsKruskalOf(tied).collect().head
    assert(r1.getAs[Long]("ties3") === 6L)
    assert(math.abs(r1.getAs[Double]("h") - 2.0) < 1e-12)
    // all values in ONE bin: tie correction denominator hits 0 ->
    // NULL guard, never NaN
    val onebin = Seq(("a", 1.0), ("b", 1.2), ("c", 1.7))
      .toDF("event_type", "value")
    val r2 = Stats.statsKruskalOf(onebin).collect().head
    assert(r2.isNullAt(r2.fieldIndex("h")))
  }

  test("dp counts: the threshold table IS the discrete-Laplace CDF and " +
    "the md5 draw reproduces its distribution") {
    val th = Curation.dpLaplaceThresholds
    assert(th.size === 41)
    assert(th.last === (1L << 48)) // both tails clamped into the ends
    assert(th === th.sorted && th.distinct.size === 41)
    // P(0) mass from the table itself: alpha = e^-1 ->
    // (1-alpha)/(1+alpha) = 0.46211715726...
    val space = (1L << 48).toDouble
    assert(math.abs((th(20) - th(19)) / space - 0.4621171572600097) < 1e-10)
    // symmetry of the pmf around 0 (table-level, exact within 1 ulp of
    // the floor rounding): P(k) == P(-k) for k = 1..19
    (1 to 19).foreach { k =>
      val pPos = th(20 + k) - th(20 + k - 1)
      val pNeg = th(20 - k) - th(19 - k)
      assert(math.abs(pPos - pNeg) <= 2L, s"pmf symmetry at k=$k")
    }
    // empirical draw through the SAME rule the query uses: 20k md5
    // uniforms land P(noise=0) within 1% absolute of the closed form
    val md = java.security.MessageDigest.getInstance("MD5")
    val draws = (0 until 20000).map { i =>
      md.reset()
      val h = md.digest(s"dp-key$i".getBytes("UTF-8"))
      val u = h.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      th.count(_ <= u) - 20
    }
    val p0 = draws.count(_ == 0).toDouble / draws.size
    assert(math.abs(p0 - 0.4621) < 0.01, s"p0 = $p0")
    assert(math.abs(draws.sum.toDouble / draws.size) < 0.05, "mean ~ 0")
    assert(draws.forall(n => n >= -20 && n <= 20))
  }

  test("dp counts: noised release is exact-count + bounded noise, " +
    "deterministic across runs") {
    val r = Curation.privacyDpCounts(spark, sfDir).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r.nonEmpty)
    r.values.foreach { row =>
      val noise = row.getAs[Long]("noise")
      assert(noise >= -20L && noise <= 20L)
      assert(row.getAs[Long]("n_noised")
        === row.getAs[Long]("n_true") + noise)
    }
    val again = Curation.privacyDpCounts(spark, sfDir).collect()
      .map(x => x.getAs[String]("event_type") -> x.getAs[Long]("n_noised"))
      .toMap
    r.foreach { case (k, row) =>
      assert(again(k) === row.getAs[Long]("n_noised"))
    }
  }
}
