package graft

import graft.analytics.Chunking
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the gaps-and-islands span detector: for
  * arbitrary token sequences over a small alphabet (so shared
  * substrings arise naturally), `dedupSpansOf`'s longest_span must
  * equal the brute-force token-level longest-common-substring — the
  * DP answer the distributed plan is a reformulation of. Covers the
  * edges a diagonal/island implementation gets wrong: spans at
  * sequence boundaries, repeated in-doc substrings (multiple equal
  * diagonals), and below-threshold near-misses. */
class SpanPropertySpec extends SparkSpec {

  /** O(|a|·|b|) rolling-row DP for longest common (contiguous)
    * substring in tokens. */
  private def lcsTokens(a: Seq[Int], b: Seq[Int]): Int = {
    val dp = Array.ofDim[Int](b.length + 1)
    var best = 0
    for (i <- 1 to a.length) {
      var prev = 0
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = if (a(i - 1) == b(j - 1)) prev + 1 else 0
        if (dp(j) > best) best = dp(j)
        prev = cur
      }
    }
    best
  }

  private val genDoc: Gen[List[Int]] = for {
    n    <- Gen.choose(0, 60)
    toks <- Gen.listOfN(n, Gen.choose(0, 5))
  } yield toks

  test("dedup_spans longest_span equals the brute-force LCS for arbitrary docs") {
    import spark.implicits._
    val k = 4
    val cases = Gen.listOfN(20, Gen.zip(genDoc, genDoc))
      .apply(Gen.Parameters.default, Seed(2026L)).get
    cases.zipWithIndex.foreach { case ((ta, tb), i) =>
      val docs = Seq(
        (1L, ta.map(t => s"w$t").mkString(" ")),
        (2L, tb.map(t => s"w$t").mkString(" "))
      ).toDF("doc_id", "text")
      val expected = lcsTokens(ta, tb)
      val rows = Chunking.dedupSpansOf(docs, k = k, dfCap = 1000, minSpan = k)
        .collect()
      if (expected >= k) {
        assert(rows.length === 1, s"case $i: expected one pair (lcs=$expected)")
        val got = rows.head.getAs[Long]("longest_span")
        assert(got === expected.toLong,
          s"case $i: longest_span=$got, DP lcs=$expected\n a=$ta\n b=$tb")
      } else {
        assert(rows.isEmpty,
          s"case $i: lcs=$expected < k but got ${rows.toList}")
      }
      spark.catalog.clearCache()
    }
  }
}
