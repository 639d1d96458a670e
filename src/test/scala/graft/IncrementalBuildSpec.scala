package graft

import graft.analytics.IncrementalBuild
import org.apache.spark.sql.functions._

/** Pins the snapshot-delta invariant the corpus_incr_equiv oracle can
  * only hash: EXACT set equality of incremental(old, delta) and
  * from-scratch(old ∪ delta) survivor ids over the FULL v2 stage set,
  * immutability of the old snapshot's verdicts, and that all three
  * store gates (fingerprint, LSH band, paragraph hash) plus the
  * carried per-doc gates are load-bearing at this SF. */
class IncrementalBuildSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val st = IncrementalBuild.build(spark, dir)
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet
  private lazy val ledger = IncrementalBuild
    .corpusBuildIncremental(spark, dir)
    .collect().map(r => r.getString(1) -> r.getLong(3)).toMap

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

  test("all three store gates fire and no plant ever ships") {
    assert(ledger("exact_vs_store") > 0)
    assert(ledger("neardup_vs_store") > 0)
    assert(ledger("paragraph_vs_store") > 0)
    // every plant class entered the batch
    val inflow = ids(st.deltaSets(0))
    for (b <- Seq(IncrementalBuild.CopyBase, IncrementalBuild.RemixBase,
        IncrementalBuild.FrankenBase, IncrementalBuild.EvCopyBase))
      assert(inflow.exists(id => id >= b && id < b + 10000L), s"base $b")
    assert(inflow.exists(_ >= IncrementalBuild.ParaBase), "para arm")
    // a re-crawl copy shares its source page's ck, so it either dies
    // at unicode WITH the source or reaches the fp store and dies
    // there — structurally none may pass the exact stage
    val postExact = ids(st.deltaSets(3))
    assert(postExact.forall(id =>
      id < IncrementalBuild.CopyBase || id >= IncrementalBuild.RemixBase))
    // and no STORE-GATED plant class ever ships; the ParaBase
    // paraphrase arm is DESIGNED to ship here (no embedding row for
    // its ids, zero shared 5-grams — the leak the supplied-vector
    // stage cannot see), and the computed-edge test below stops it
    assert(ids(st.deltaSets.last).forall(id =>
      id < IncrementalBuild.CopyBase || id >= IncrementalBuild.ParaBase))
    assert(ids(st.deltaSets.last).exists(_ >= IncrementalBuild.ParaBase),
      "the paraphrase leak must ship under the supplied-vector stage")
  }

  test("computed stage 10 under pinned weights: equivalence holds and the leak dies") {
    val r = IncrementalBuild.corpusIncrEquivComputed(spark, dir)
      .collect().head
    val Seq(nOld, nApp, nIncr, nScr, onlyI, onlyS, nSem) =
      (0 until 7).map(r.getLong)
    assert(onlyI === 0L && onlyS === 0L) // incremental == from-scratch
    assert(nOld + nApp === nIncr)
    assert(nIncr === nScr)
    assert(nSem >= 1L, "the computed screen must stop a stage-9 survivor")
    // the computed stage partitions the stage-9 survivors exactly:
    // shipped + semantically dropped = the contamination output
    assert(nScr + nSem === ids(st.scratchSets(9)).size.toLong)
  }

  test("the carried per-doc gates fire on the delta at this SF") {
    assert(ledger("eval_holdout") === 0L) // structural: delta ids >= SnapMax
    assert(ledger("unicode") > 0)
    assert(ledger("gopher") > 0)
    assert(ledger("license") > 0)
    assert(ledger("contamination") > 0) // the re-crawled-eval-page leak
    assert(ledger("semantic") > 0)      // the paraphrase-embedding leak
  }

  test("the delta ledger reconciles and covers exactly the batch") {
    val rows = IncrementalBuild.corpusBuildIncremental(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.length === 10)
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

  test("the monthly re-ship is append-local at the shard level") {
    val rows = IncrementalBuild.shardExportIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (sid, old, nw, changed) =>
      // first-arrival append: a shard can only GAIN packs
      assert(nw >= old, s"shard $sid")
      // an unchanged fingerprint implies an unchanged pack count
      if (changed == 0) assert(nw === old, s"shard $sid")
    }
    // the delta actually shipped something AND locality holds: some
    // shard fingerprints moved, some survived untouched (the trainer
    // resume-cursor contract on the real monthly workflow)
    assert(rows.exists(_._4 == 1))
    assert(rows.exists(_._4 == 0))
  }

  test("streamed ingest == one-shot batch, and the replay appends nothing") {
    val rows = IncrementalBuild.streamIncrementalIngest(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows.keySet === Set(-1L, 0L, 1L, 2L, 3L))
    // the replay batch (a full re-delivery of batch 0) is entirely
    // suppressed by the fp store — at-least-once in, exactly-once out
    assert(rows(3L)._1 === rows(0L)._1)
    assert(rows(3L)._2 === 0L)
    // the final streamed survivor set IS the one-shot batch result,
    // id for id (two-level fold equality)
    val batchFold = IncrementalBuild.idFoldDf(st.deltaSets.last)
      .head.getString(0)
    assert(rows(-1L)._3 === batchFold)
    assert(rows(-1L)._2 === ids(st.deltaSets.last).size.toLong)
    // and the ledger reconciles: per-batch appends sum to the total
    assert(Seq(0L, 1L, 2L, 3L).map(rows(_)._2).sum === rows(-1L)._2)
  }

  test("corpus_diff reconciles: unchanged + added + every rejection") {
    val diff = IncrementalBuild.corpusDiff(spark, dir)
      .groupBy(col("status")).agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff("unchanged") === ids(st.oldSets.last).size.toLong)
    assert(diff("added") === ids(st.deltaSets.last).size.toLong)
    val removed = diff.collect { case (k, v) if k.startsWith("removed@") => v }.sum
    assert(removed + diff("added") === ids(st.deltaSets(0)).size.toLong)
    // the attribution plants: re-crawls at the fp store, remixes at
    // the band store, snippet pages at the paragraph store
    assert(diff.keySet.contains("removed@exact_vs_store"))
    assert(diff.keySet.contains("removed@neardup_vs_store"))
    assert(diff.keySet.contains("removed@paragraph_vs_store"))
  }
}
