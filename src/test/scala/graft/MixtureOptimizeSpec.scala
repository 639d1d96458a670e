package graft

import graft.analytics.MixtureOptimize

/** Pins the optimization semantics the oracles can only hash: the
  * cascade converges with the cap respected everywhere, the
  * allocation is exact Hamilton apportionment (re-derived by an
  * independent in-memory reference), and the receipt shows the
  * cascade doing real work at sf0.01. */
class MixtureOptimizeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Cap = 110000L

  private lazy val rounds = MixtureOptimize.mixtureOptRounds(spark, dir)
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).sortBy(_._1)
  private lazy val alloc = MixtureOptimize.mixtureOptimize(spark, dir)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4)))

  test("the cascade converges: capped set monotone, violation hits 0 " +
      "and stays, and at least two effective rounds ran") {
    rounds.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 >= a._2, s"round ${b._1} uncapped")
      case _ => ()
    }
    assert(rounds.last._4 === 0L, "unconverged after the depth bound")
    val firstZero = rounds.find(_._4 == 0L).get._1
    rounds.filter(_._1 >= firstZero).foreach(r => assert(r._4 === 0L))
    // the cascade is load-bearing at this SF: capping the first wave
    // pushed another source over (>= 2 distinct capped-set growths)
    assert(rounds.map(_._2).distinct.length >= 3)
  }

  test("the allocation is exact Hamilton apportionment under the cap") {
    assert(alloc.map(_._4).sum === 1000000L)
    alloc.foreach { case (src, _, _, opt, capped) =>
      assert(opt <= Cap, src)
      if (capped == 1) assert(opt === Cap, src)
    }
    // independent reference: run the cascade + largest-remainder in
    // plain Scala from the (source, b) masses and compare exactly
    val mass = alloc.map(a => a._1 -> a._2).toMap
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      val freeB = mass.filterNot(kv => capped(kv._1)).values.sum
      val m = 1000000L - capped.size * Cap
      val over = mass.keys.filterNot(capped).filter(s =>
        BigInt(mass(s)) * m / freeB > Cap).toSet
      changed = over.nonEmpty
      capped ++= over
    }
    val freeB = mass.filterNot(kv => capped(kv._1)).values.sum
    val m = 1000000L - capped.size * Cap
    val v = mass.collect { case (s, b) if !capped(s) =>
      s -> (BigInt(b) * m / freeB).toLong }
    val dust = m - v.values.sum
    val topRem = mass.keys.filterNot(capped).toSeq
      .sortBy(s => (-(BigInt(mass(s)) * m - BigInt(v(s)) * freeB), s))
      .take(dust.toInt).toSet
    val expected = mass.keys.map { s =>
      s -> (if (capped(s)) Cap else v(s) + (if (topRem(s)) 1L else 0L))
    }.toMap
    assert(alloc.map(a => a._1 -> a._4).toMap === expected)
    assert(alloc.filter(_._5 == 1).map(_._1).toSet === capped)
  }

  test("mixture_sample realizes the allocation: max-ratio source keeps " +
      "everything, capped sources are genuinely thinned, deterministic") {
    val rows = MixtureOptimize.mixtureSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // thresholds are 24-bit keep ratios; exactly the max-ratio
    // source(s) saturate and keep every document
    val sat = rows.filter(_._2 >= 16777216L)
    assert(sat.nonEmpty)
    sat.foreach(r => assert(r._4 === r._3, r._1))
    // every capped source from the allocation was downsampled
    val cappedSrcs = alloc.filter(_._5 == 1).map(_._1).toSet
    rows.filter(r => cappedSrcs(r._1)).foreach { r =>
      assert(r._2 < 16777216L, r._1)
    }
    assert(rows.exists(r => r._4 < r._3)) // sampling did real work
    // the md5 keep rule is deterministic: a second run is identical
    val again = MixtureOptimize.mixtureSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSet
    assert(again === rows.map(r => (r._1, r._4, r._5)).toSet)
    // achieved shares form the ppm simplex (up to truncation dust)
    val achieved = rows.map(_._7).sum
    assert(achieved > 1000000L - rows.length && achieved <= 1000000L)
  }
}
