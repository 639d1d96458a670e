package graft

import graft.analytics.{Bpe, BpeBytes}
import org.apache.spark.sql.functions._

/** Pins the byte-fallback closure the oracles can only hash:
  * decode(encode(x)) = x on scripts the char-lane tokenizers cannot
  * represent, and that a merge crosses a multi-byte character's
  * boundary when the statistics say so. */
class BpeBytesSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: every segmented word decodes back byte-exactly, " +
      "including the non-ASCII plants") {
    val rows = BpeBytes.bpeBytesSegment(spark, "/root/testdata/sf0.01")
      .collect()
    rows.foreach(r => assert(r.getString(5) === r.getString(0),
      s"round-trip broke for ${r.getString(0)}"))
    // the plants are present and genuinely multi-byte: scripts with
    // 2-byte (Latin-1 accent, Greek) and 3-byte (CJK) encodings
    val mb = rows.filter(r => r.getInt(2) > r.getString(0).length)
    assert(mb.nonEmpty)
    assert(mb.exists(_.getString(0) == "caf\u00e9"))
    assert(mb.exists(r => r.getInt(2) == 3 * r.getString(0).length))
  }

  test("a merge crosses a multi-byte character boundary: the byte pair " +
      "of a frequent accented char wins and re-decodes") {
    // planted vocab where the UTF-8 bytes of 'é' (C3 A9) dominate the
    // pair counts; the winner must be the cross-boundary pair and the
    // merged token must still decode
    val word = "\u00e9\u00e9\u00e9" // C3 A9 C3 A9 C3 A9
    val hx = word.getBytes("UTF-8").map("%02X".format(_))
    val toks = hx.zipWithIndex.map { case (t, i) => (word, 10L, i.toLong, t) }
      .toSeq.toDF("w", "wcnt", "pos", "tok")
    val top = Bpe.topPair(toks).collect()
    assert(top.head.getString(0) === "C3")
    assert(top.head.getString(1) === "A9")
    val merged = Bpe.applyMerge(toks, "C3", "A9")
      .orderBy(col("pos")).collect().map(_.getString(3))
    assert(merged.toSeq === Seq("C3A9", "C3A9", "C3A9"))
    // the merged token is the character: byte fallback never strands
    // a partial codepoint that the greedy fold wouldn't re-join
    assert(new String(
      merged.flatMap(t => t.grouped(2).map(Integer.parseInt(_, 16).toByte)),
      "UTF-8") === word)
  }

  test("no OOV by construction: every byte token of every word is a " +
      "2-hex-digit symbol (the 256-value alphabet)") {
    val toksStr = BpeBytes.bpeBytesSegment(spark, "/root/testdata/sf0.01")
      .select(col("toks_str")).collect().map(_.getString(0))
    toksStr.foreach { ts =>
      ts.split('|').foreach { t =>
        assert(t.length % 2 === 0 && t.matches("[0-9A-F]+"), t)
      }
    }
  }
}
