package graft

import graft.functions.GraftExtensions

/** SQL surface of the native expressions. */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT
          vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          vec_l2norm(array(3.0d, 4.0d)) AS n,
          shingles(array('a','b','c','d'), 3) AS sh""").first()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getSeq[String](2) === Seq("a b c", "b c d"))
  }

  test("shingles rejects a non-literal size") {
    GraftExtensions.registerAll(spark)
    intercept[Exception] {
      spark.sql("SELECT shingles(array('a','b'), cast(rand()*2 AS INT))").collect()
    }
  }
}
