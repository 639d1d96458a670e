package graft

import graft.analytics.Multimodal

/** Pins the alignment gate's planted populations: faithful captions
  * score a perfect 64, noisy-but-correct captions exactly 60 (the 4
  * planted sign flips), mismatched captions stay far under the 52
  * gate — so keep ≡ (class ≠ mismatched) with measured margins, the
  * precision/recall contract of the filter. */
class MultimodalAlignSpec extends SparkSpec {

  test("planted pair classes separate cleanly at the 52-bit gate") {
    val rows = Multimodal.multimodalAlign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    // corpus docs + the 60 phash plants all get captions
    assert(rows.length > 100)
    rows.foreach { case (id, cls, agree, margin, keep) =>
      assert(cls === id % 3, s"pair $id")
      assert(margin === agree - 52, s"pair $id")
      cls match {
        case 0 => assert(agree === 64 && keep === 1, s"pair $id: $agree")
        case 1 => assert(agree === 60 && keep === 1, s"pair $id: $agree")
        case _ => assert(keep === 0 && agree < 52, s"pair $id: $agree")
      }
    }
    // both decisions actually occur (perfect precision AND recall on
    // the plants: every aligned pair kept, every mismatch dropped)
    assert(rows.count(_._5 == 1) === rows.count(r => r._2 != 2))
    // mismatched captions hover around the Binomial(64, 1/2) mean —
    // far from the gate (the margin that makes the threshold safe)
    val mm = rows.filter(_._2 == 2).map(_._3)
    assert(mm.nonEmpty && mm.max <= 48, s"mismatch max ${mm.max}")
  }

  test("interleaved docs strip exactly the mismatched slots") {
    val n = graft.Tables.documents(spark, sfDir).count()
    val rows = Multimodal.multimodalInterleaved(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.length === n)
    rows.foreach { case (i, nSlots, nKept, nStripped, docKeep) =>
      // ground truth from the slot mapping: slot s references pool
      // pair (i*53 + s*17) mod n, kept iff its class is not mismatch
      // (class-2 captions clear 52 bits with P ≈ 2.8e-7 — never at
      // any test SF, the align gate's own pinned argument)
      val slots = (0L to i % 4).map(s => (i * 53 + s * 17) % n)
      val expKept = slots.count(_ % 3 != 2)
      assert(nSlots === slots.length.toLong, s"doc $i")
      assert(nKept === expKept.toLong, s"doc $i")
      assert(nStripped === nSlots - nKept, s"doc $i")
      assert(docKeep === (if (expKept > 0) 1 else 0), s"doc $i")
    }
    // all three document fates occur: kept intact, kept-but-stripped,
    // dropped outright (the MMC4 keep-and-strip populations)
    assert(rows.exists(r => r._5 == 1 && r._4 == 0))
    assert(rows.exists(r => r._5 == 1 && r._4 > 0))
    assert(rows.exists(r => r._5 == 0))
  }
}
