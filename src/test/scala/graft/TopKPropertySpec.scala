package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the custom two-phase top-k operator: for
  * arbitrary (key, value, id) datasets, partition layouts, and k, the
  * operator's result SET equals the window spelling's — including the
  * edge cases a heap implementation gets wrong (k ≥ group size, k = 1,
  * single-row groups, duplicate values resolved by the unique
  * tiebreaker, ascending AND descending orders). */
class TopKPropertySpec extends SparkSpec {

  private val genRow: Gen[(Int, Double, Long)] = for {
    key <- Gen.choose(0, 6)
    // duplicate values are likely (small domain) — exercises tie-break
    v   <- Gen.oneOf(Gen.choose(0, 9).map(_.toDouble), Gen.choose(-1e9, 1e9))
  } yield (key, v, 0L)

  private val genCase: Gen[(List[(Int, Double, Long)], Int, Int, Boolean)] = for {
    n     <- Gen.choose(0, 300)
    rows  <- Gen.listOfN(n, genRow)
    k     <- Gen.choose(1, 12)
    parts <- Gen.choose(1, 7)
    desc  <- Gen.oneOf(true, false)
  } yield (rows, k, parts, desc)

  test("top-k per key equals the window spelling for arbitrary data, k, and partitioning") {
    import spark.implicits._
    val params = Gen.listOfN(40, genCase)
      .apply(Gen.Parameters.default, Seed(42L)).get
    params.zipWithIndex.foreach { case ((rows, k, parts, desc), i) =>
      // unique id per row = the total-order tiebreaker
      val df = rows.zipWithIndex
        .map { case ((key, v, _), id) => (key, v, id.toLong) }
        .toDF("key", "v", "id")
        .repartition(parts)
      val ord =
        if (desc) Seq(col("v").desc, col("id")) else Seq(col("v"), col("id"))
      val got = TopK.perKey(df, Seq(col("key")), ord, k)
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy(col("key"))
        .orderBy(ord: _*)
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(got === expected,
        s"case $i: n=${rows.size} k=$k parts=$parts desc=$desc")
    }
  }

  test("top-k handles an empty input and k of one") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Double, Long)].toDF("key", "v", "id")
    assert(TopK.perKey(empty, Seq(col("key")), Seq(col("v")), 3).count() === 0)
    val one = Seq((1, 2.0, 1L), (1, 1.0, 2L), (2, 5.0, 3L)).toDF("key", "v", "id")
    val got = TopK.perKey(one, Seq(col("key")), Seq(col("v"), col("id")), 1)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(got === Set((1, 1.0), (2, 5.0)))
  }

  test("top-k supports composite keys and string order columns") {
    import spark.implicits._
    val df = Seq(
      ("a", 0, "x", 1L), ("a", 0, "y", 2L), ("a", 1, "z", 3L),
      ("b", 0, "w", 4L), ("b", 0, "v", 5L))
      .toDF("k1", "k2", "s", "id")
    val got = TopK.perKey(df, Seq(col("k1"), col("k2")),
      Seq(col("s"), col("id")), 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(("a", 0, "x"), ("a", 1, "z"), ("b", 0, "v")))
  }
}
