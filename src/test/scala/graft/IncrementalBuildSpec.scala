package graft

import graft.analytics.IncrementalBuild
import org.apache.spark.sql.functions._

/** Pins the snapshot-delta invariant the corpus_incr_equiv oracle can
  * only hash: EXACT set equality of incremental(old, delta) and
  * from-scratch(old ∪ delta) survivor ids, immutability of the old
  * snapshot's verdicts, and that both store gates (fingerprint,
  * shingle ownership) are load-bearing at this SF. */
class IncrementalBuildSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val st = IncrementalBuild.build(spark, dir)
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("incremental(old, delta) == from-scratch(old ∪ delta), exactly") {
    val incr = ids(st.oldSets.last) ++ ids(st.deltaSets.last)
    val scratch = ids(st.scratchSets.last)
    assert(incr === scratch)
    // and non-trivially: both snapshots contribute survivors
    assert(ids(st.oldSets.last).nonEmpty)
    assert(ids(st.deltaSets.last).nonEmpty)
  }

  test("the old snapshot's verdicts are immutable under the delta") {
    // first-arrival rules: nothing already shipped is ever revoked,
    // and the delta can never promote a previously-dropped old doc
    val oldFinal = ids(st.oldSets.last)
    val scratchOld = ids(st.scratchSets.last).filter(_ < IncrementalBuild.SnapMax)
    assert(oldFinal === scratchOld)
  }

  test("both store gates fire: re-crawls die at the fingerprint store, " +
      "remixes at the ownership store") {
    val ledger = IncrementalBuild.corpusBuildIncremental(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(ledger("exact_vs_store") > 0)
    assert(ledger("novelty_vs_store") > 0)
    // every planted re-crawl copy is gone before the novelty stage
    val postExact = ids(st.deltaSets(2))
    assert(postExact.forall(id =>
      id < IncrementalBuild.CopyBase || id >= IncrementalBuild.RemixBase))
    // every remix plant is gone after the ownership gate (its shingles
    // are old-owned except the seam): none may ever ship
    val shipped = ids(st.deltaSets.last)
    assert(shipped.forall(_ < IncrementalBuild.RemixBase))
    // and at least one remix plant existed to be dropped
    assert(ids(st.deltaSets(0)).exists(_ >= IncrementalBuild.RemixBase))
  }

  test("the delta ledger reconciles and covers exactly the batch") {
    val rows = IncrementalBuild.corpusBuildIncremental(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    rows.foreach { case (_, stg, nIn, nDrop, nOut) =>
      assert(nOut === nIn - nDrop, stg); assert(nDrop >= 0, stg)
    }
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 === b._3, s"${a._2} -> ${b._2}")
      case _ => ()
    }
    assert(rows.head._3 === ids(st.deltaSets(0)).size)
    assert(rows.last._5 === ids(st.deltaSets.last).size)
  }
}
