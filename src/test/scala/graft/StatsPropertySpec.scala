package graft

import graft.analytics.{Curation, Relational, Stats}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the round-6 statistical operators —
  * the closed-form planted specs (StatsSpec) pin exact values; these
  * pin the mathematical BOUNDS on arbitrary generated data, where a
  * sign slip or an off-by-one in a multiply-through form would escape
  * a single hand-computed case. One generated dataset per property
  * (deterministic seed), asserted over every output row. */
class StatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def values(n: Int, seed: Long): List[Double] =
    Gen.listOfN(n, Gen.choose(0.0, 500.0))
      .pureApply(Gen.Parameters.default, Seed(seed))

  test("gini lies in [0, (n-1)/n] on arbitrary nonnegative data") {
    for (seed <- 1L to 5L) {
      val xs = values(200, seed)
      val g = Relational.aggGiniOf(xs.toDF("value")).collect().head
      val gini = g.getAs[Double]("gini")
      val n = g.getAs[Long]("n").toDouble
      // the discrete floor-div chain must never push the statistic
      // outside its mathematical range
      assert(gini >= -1e-9 && gini <= (n - 1) / n + 1e-9, s"seed $seed: $gini")
    }
  }

  test("chi2 is nonnegative and exactly 0 when one margin is degenerate") {
    for (seed <- 1L to 5L) {
      val days = Gen.listOfN(300, Gen.choose(0L, 6L))
        .pureApply(Gen.Parameters.default, Seed(seed))
      val types = Gen.listOfN(300, Gen.oneOf("a", "b", "c"))
        .pureApply(Gen.Parameters.default, Seed(seed + 100))
      val ev = types.zip(days).map { case (t, d) => (t, d * 86400000000000L) }
        .toDF("event_type", "ts_ns")
      val chi = Stats.statsChi2Of(ev).collect().head
      assert(chi.getAs[Long]("chi2_centi") >= 0L, s"seed $seed")
      // collapse to ONE type: every cell equals its expectation exactly
      val one = days.map(d => ("only", d * 86400000000000L))
        .toDF("event_type", "ts_ns")
      assert(Stats.statsChi2Of(one).collect().head
        .getAs[Long]("chi2_centi") === 0L, s"seed $seed degenerate")
    }
  }

  test("welch t is exactly antisymmetric under group swap") {
    for (seed <- 1L to 5L) {
      val a = values(40, seed).map(("click", _))
      val b = values(40, seed + 100).map(("view", _))
      val t1 = Stats.statsTtestOf((a ++ b).toDF("event_type", "value"))
        .collect().head.getAs[Double]("t_stat")
      val swapped = a.map { case (_, v) => ("view", v) } ++
        b.map { case (_, v) => ("click", v) }
      val t2 = Stats.statsTtestOf(swapped.toDF("event_type", "value"))
        .collect().head.getAs[Double]("t_stat")
      // identical sufficient statistics with roles exchanged: the
      // double tree is (m1-m2)/sqrt(v1/n1+v2/n2), so the swap flips
      // the sign BIT-exactly (no tolerance)
      assert(t1 === -t2, s"seed $seed: $t1 vs $t2")
    }
  }

  test("t-closeness max_t lies in [0, 1] on arbitrary cohort mixes") {
    for (seed <- 1L to 5L) {
      val rows = Gen.listOfN(300, for {
        u <- Gen.choose(0L, 99L); v <- Gen.choose(0.0, 500.0)
      } yield ("a", u, v)).pureApply(Gen.Parameters.default, Seed(seed))
      val ev = rows.toDF("event_type", "user_id", "value")
        .withColumn("ts",
          org.apache.spark.sql.functions.to_timestamp(
            org.apache.spark.sql.functions.lit("2026-01-01 00:00:00")))
      Curation.privacyTclosenessOf(ev).collect().foreach { r =>
        val t = r.getAs[Double]("max_t")
        assert(t >= 0.0 && t <= 1.0 + 1e-9, s"seed $seed: $t")
      }
    }
  }
}
