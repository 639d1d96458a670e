package graft

import graft.analytics.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantics of the retrieval-scoring family (tf-idf, BM25, vocab):
  * the DuckDB oracle pins cross-engine value equality; these pin the
  * *behavioral* guarantees a user relies on — rank shape, saturation,
  * and length normalization — on corpora built to exercise them. */
class RetrievalSpec extends SparkSpec {

  /** Tiny controlled corpus: doc 1 and 2 differ only in query-term
    * count; doc 3 is doc 1 padded with filler (same tf, longer);
    * doc 4 has no query terms at all. */
  private lazy val tinyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("retrieval").toString
    val rows = Seq(
      (1L, "spark is a fast engine for big data work today", "en", "web"),
      (2L, "spark spark is a fast engine for big data work", "en", "web"),
      (3L, "spark is a fast engine for big data work today and more and more and more filler tokens here", "en", "web"),
      (4L, "nothing relevant appears in this very plain document", "en", "web"))
    val df = spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25: higher tf wins at equal length, longer doc loses at equal tf, no-hit docs absent") {
    val scores = TextAnalysis.textBm25(spark, tinyDir, terms = Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scores.contains(4L), "doc without query terms must not appear")
    assert(scores(2L) > scores(1L), s"tf=2 must outscore tf=1: $scores")
    assert(scores(1L) > scores(3L), s"shorter doc must outscore padded doc at equal tf: $scores")
    assert(scores.values.forall(_ > 0))
  }

  test("bm25: tf saturation — doubling tf gains less than the first occurrence") {
    // k1-saturation: score(tf=2) - score(tf=1) < score(tf=1) - 0
    val scores = TextAnalysis.textBm25(spark, tinyDir, terms = Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(2L) - scores(1L) < scores(1L),
      s"second occurrence must add less than the first: $scores")
  }

  test("tfidf: per-doc ranks are contiguous from 1 and scores non-increasing") {
    val rows = TextAnalysis.textTfidf(spark, sfDir)
      .select("doc_id", "rn", "score").collect()
      .groupBy(_.getLong(0)).values
    rows.foreach { docRows =>
      val byRn = docRows.sortBy(_.getInt(1))
      assert(byRn.map(_.getInt(1)).toSeq == (1 to byRn.length),
        "ranks must be contiguous from 1")
      val scores = byRn.map(_.getDouble(2)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores must be non-increasing in rank: $scores")
      assert(byRn.length <= 5)
    }
  }

  test("tfidf: a corpus-rare term outranks a corpus-common term at equal tf") {
    // rank-1 term's df must be <= any same-tf term's df within the doc
    val rows = TextAnalysis.textTfidf(spark, sfDir)
      .select("doc_id", "rn", "tf", "df").collect()
      .groupBy(_.getLong(0)).values
    rows.foreach { docRows =>
      val byRn = docRows.sortBy(_.getInt(1))
      byRn.sliding(2).foreach {
        case Array(hi, lo) if hi.getLong(2) == lo.getLong(2) =>
          assert(hi.getLong(3) <= lo.getLong(3),
            "at equal tf the rarer term must rank higher")
        case _ =>
      }
    }
  }

  test("vocab: ids contiguous from 0, counts non-increasing, ties alphabetical") {
    val v = TextAnalysis.vocabBuild(spark, sfDir, topK = 50)
      .orderBy("token_id").collect()
    assert(v.map(_.getInt(0)).toSeq == v.indices.map(identity),
      "token ids must be contiguous from 0")
    val pairs = v.map(r => (r.getLong(2), r.getString(1)))
    pairs.sliding(2).foreach {
      case Array((c1, t1), (c2, t2)) =>
        assert(c1 > c2 || (c1 == c2 && t1 < t2),
          s"vocab order must be (count desc, token asc): ($c1,$t1) vs ($c2,$t2)")
      case _ =>
    }
  }
}
