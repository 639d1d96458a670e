package graft

import org.apache.spark.sql.functions._
import graft.analytics.Bpe

/** Pins the BPE training semantics that the DuckDB oracle then
  * re-checks at scale: greedy left-to-right merge application via the
  * island-parity windows, and the shape/invariants of the trained
  * artifacts on real test data. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Sequential reference fold — the semantics applyMerge must match. */
  private def greedy(toks: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def toksOf(words: Seq[String]) =
    words.toDF("w")
      .withColumn("wcnt", lit(1L))
      .select(col("w"), col("wcnt"),
        explode(sequence(lit(0), length(col("w")) - 1)).as("pos"))
      .withColumn("tok", col("w").substr(col("pos") + 1, lit(1)))

  test("applyMerge equals the sequential greedy fold, including same-symbol runs") {
    // runs of the merged pair are the hard case: "aaaa" -> [aa, aa],
    // "aaa" -> [aa, a], "aabaa" -> [aa, b, aa]; plus non-run words
    val words = Seq("aaaa", "aaa", "aabaa", "abab", "ba", "xyaay")
    val merged = Bpe.applyMerge(toksOf(words), "a", "a")
      .orderBy("w", "pos")
      .select("w", "tok").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (w <- words)
      assert(merged(w) == greedy(w.map(_.toString), "a", "a"),
        s"word $w: got ${merged(w)}")
  }

  test("applyMerge on a distinct-symbol pair merges every site at once") {
    val words = Seq("abab", "aab", "cab", "bab")
    val merged = Bpe.applyMerge(toksOf(words), "a", "b")
      .orderBy("w", "pos")
      .select("w", "tok").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (w <- words)
      assert(merged(w) == greedy(w.map(_.toString), "a", "b"),
        s"word $w: got ${merged(w)}")
  }

  test("applyMerge equals the sequential fold for ARBITRARY words and pairs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny alphabet makes same-symbol runs and dense candidate islands
    // likely — exactly the overlap cases the parity windows must get right
    val genWord = for {
      n  <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield cs.mkString
    val genCase = for {
      words <- Gen.listOfN(30, genWord).map(_.distinct)
      a     <- Gen.oneOf("a", "b", "c")
      b     <- Gen.oneOf("a", "b", "c")
    } yield (words, a, b)
    val cases = Gen.listOfN(25, genCase)
      .apply(Gen.Parameters.default, Seed(7L)).get
    cases.zipWithIndex.foreach { case ((words, a, b), i) =>
      val merged = Bpe.applyMerge(toksOf(words), a, b)
        .orderBy("w", "pos")
        .select("w", "tok").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      for (w <- words)
        assert(merged(w) == greedy(w.map(_.toString), a, b),
          s"case $i pair=($a,$b) word=$w: got ${merged.get(w)}")
    }
  }

  test("bpe_merges learns 5 distinct positive-count merges on the corpus") {
    val m = Bpe.bpeMerges(spark, sfDir).collect()
    assert(m.length == 5)
    assert(m.map(_.getInt(0)).toSeq == (1 to 5))
    val pairs = m.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == 5)
    assert(m.forall(_.getLong(3) > 0))
    assert(pairs.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
  }

  test("vocab curve: tokens strictly shrink, compression strictly " +
      "grows, and each delta is bounded by that round's merge count") {
    val curve = Bpe.bpeVocabCurve(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq === (0 to 5))
    curve.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 < a._2, s"round ${b._1} tokens did not shrink")
        assert(b._3 > a._3, s"round ${b._1} compression did not grow")
      case _ => ()
    }
    assert(curve.head._4 === 0L)
    // a merge saves one token per APPLIED site; applied sites never
    // exceed the winning pair count (overlaps only reduce them)
    val merges = Bpe.bpeMerges(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    curve.tail.foreach { case (r, _, _, delta) =>
      assert(delta > 0 && delta <= merges(r), s"round $r delta $delta")
    }
  }

  test("training degrades gracefully when the pair supply runs dry") {
    // all-single-symbol vocab: round 1 already finds no adjacent pair;
    // applyMerge on such a table is the identity
    val toks = toksOf(Seq("a", "b", "c"))
    val out = Bpe.applyMerge(toks, "a", "b")
      .select("w", "tok").as[(String, String)].collect().toSet
    assert(out == Set("a" -> "a", "b" -> "b", "c" -> "c"))
  }

  test("scan-speed fold segmentation equals the island-parity training path on every word") {
    // two independent implementations of greedy merge application:
    // chained aggregate() folds (inference) vs the windowed training
    // tables — must agree on the WHOLE vocab, not just the top-100
    val seg = Bpe.bpeSegment(spark, sfDir)
      .select("w", "toks_str").as[(String, String)].collect().toMap
    val merges = Bpe.bpeMerges(spark, sfDir)
      .orderBy("merge_rank")
      .select("lhs", "rhs").as[(String, String)].collect()
    for ((w, toksStr) <- seg) {
      var toks: Seq[String] = w.map(_.toString)
      for ((a, b) <- merges) toks = greedy(toks, a, b)
      assert(toksStr == toks.mkString("|"), s"word $w")
    }
    assert(seg.nonEmpty)
  }

  test("bpe_encode prices every document and never inflates token counts") {
    val docs = graft.Tables.documents(spark, sfDir).count()
    val e = Bpe.bpeEncode(spark, sfDir)
    assert(e.count() == docs)
    val bad = e.filter(col("n_tok_bpe") > col("n_tok_char") ||
      col("char_per_tok_ppm") < 1000000L)
    assert(bad.isEmpty)
    // training merged something: some doc compresses strictly
    assert(e.filter(col("n_tok_bpe") < col("n_tok_char")).count() > 0)
  }
}
