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
}
