package graft

import graft.analytics.Unigram
import org.apache.spark.sql.functions._

/** Pins the unigram-LM training semantics the oracles hash: Viterbi
  * parity against an INDEPENDENT reference implementation (recursive
  * JVM DP, no Spark), the longest-piece tie rule, EM monotonicity of
  * the MDL objective, seed/pruning order, and the bit-cost rule. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  /** Independent reference Viterbi: arrays + loops, ties to the
    * LONGEST piece (the engine contract). */
  private def refSeg(w: String, cost: Map[String, Long]): (Seq[String], Long) = {
    val n = w.length
    val best = Array.fill(n + 1)(Long.MaxValue / 2)
    val back = Array.fill(n + 1)(0)
    best(0) = 0
    for (j <- 1 to n; l <- 1 to math.min(Unigram.PieceMax, j)) {
      val c = best(j - l) + cost.getOrElse(w.substring(j - l, j), Unigram.BigM)
      if (c < best(j) || (c == best(j) && l > back(j))) {
        best(j) = c; back(j) = l
      }
    }
    var j = n
    var seg = List.empty[String]
    while (j > 0) { val l = back(j); seg = w.substring(j - l, j) :: seg; j -= l }
    (seg, best(n))
  }

  private lazy val model = Unigram.trainModel(spark, sfDir)

  test("engine segmentation == independent reference Viterbi (all rounds)") {
    val cost3 = model.costs.last
    val rows = Unigram.unigramSegment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (seg, bits) = refSeg(r.getString(0), cost3)
      assert(r.getString(2) === seg.mkString("|"), r.getString(0))
      assert(r.getLong(4) === bits, r.getString(0))
    }
    // and the round-1 training pass agrees with the reference under
    // the SEED costs (the path the EM counts ride on)
    val seg1 = model.segs.head
      .select(col("w"), array_join(col("seg"), "|"), col("wbits")).collect()
    seg1.foreach { r =>
      val (seg, bits) = refSeg(r.getString(0), model.costs.head)
      assert(r.getString(1) === seg.mkString("|"), r.getString(0))
      assert(r.getLong(2) === bits, r.getString(0))
    }
  }

  test("EM is monotone: total MDL bits never increase across rounds") {
    val rounds = Unigram.unigramRounds(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1).map(_._2)
    assert(rounds.length === Unigram.Rounds)
    rounds.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"round bits rose: $a -> $b")
      case _ => ()
    }
  }

  test("pruning: dead multi-char pieces leave the model, chars never do") {
    // round-1 usage decides the round-1 cost table
    val used1 = model.segs.head.select(explode(col("seg"))).distinct()
      .collect().map(_.getString(0)).toSet
    val cost1 = model.costs(1)
    val seedMulti = model.costs.head.keySet.filter(_.length >= 2)
    seedMulti.foreach { p =>
      assert(cost1.contains(p) === used1.contains(p), p)
    }
    model.chars.foreach(c => assert(cost1.contains(c), s"char $c pruned"))
    // dead chars carry the worst-case fallback cost of the table
    val deadChars = model.chars.filterNot(used1)
    deadChars.foreach(c => assert(cost1(c) === cost1.values.max, c))
  }

  test("the cost rule is the MDL bit length on a planted vocabulary") {
    // 'ababab'×8 and 'cd'×2: "ab" dominates the seed counts, so the
    // trained model must segment ababab as ab|ab|ab (12 chars of 'ab'
    // usage vs 'ba' straddles); every cost is bitlen(T div count)
    val vocab = Seq(("ababab", 8L), ("cd", 2L)).toDF("w", "wcnt")
    val m = Unigram.trainModelOf(vocab)
    val segs = m.segs.last.select(col("w"), array_join(col("seg"), "|"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // backward reconstruction resolves cost ties to the LONGEST piece
    // nearest the END first — ab|abab, not ab|ab|ab (reference agrees)
    assert(segs("ababab") === "ab|abab" || segs("ababab") === "abab|ab")
    assert(segs("cd") === "cd" || segs("cd") === "c|d")
    // reference parity on the planted corpus too
    Seq("ababab", "cd").foreach { w =>
      assert(segs(w) === refSeg(w, m.costs.last)._1.mkString("|"), w)
    }
    // bit-cost spelling: recompute one table by hand from usage
    val counts = m.segs.last
      .select(explode(col("seg")).as("p"), col("wcnt"))
      .groupBy("p").agg(sum("wcnt").cast("long").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = counts.values.sum
    counts.foreach { case (p, c) =>
      assert(m.costs.last(p) ===
        (64L - java.lang.Long.numberOfLeadingZeros(t / c)), p)
    }
  }
}
