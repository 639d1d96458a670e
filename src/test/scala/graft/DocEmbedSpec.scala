package graft

import graft.analytics.DocEmbed
import org.apache.spark.sql.functions._

/** Pins the computed-embedding pipeline's semantics beyond the hash
  * match: the embedding table is total and non-degenerate, the
  * computed-text screen rediscovers EVERY leak the supplied-vector
  * screen flags (recall exactly 10⁶ ppm), every planted paraphrase is
  * flagged with its true eval twin as the nearest item, and the
  * coverage receipt shows the computed edge closing the supplied
  * table's gap by construction. */
class DocEmbedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("doc_embed is total and non-degenerate") {
    val emb = DocEmbed.docEmbed(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
    assert(emb.count() === docs.count())
    assert(emb.filter(col("norm2") <= 0).count() === 0L)
    // the fingerprint pins all 64 dims: distinct docs get distinct fps
    // here (identical texts would legitimately share one)
    assert(emb.select(col("emb_fp")).distinct().count() > 1L)
  }

  test("the computed screen rediscovers every supplied-screen leak") {
    val r = DocEmbed.docEmbedRecall(spark, dir).collect().head
    assert(r.getAs[Long]("n_supplied") > 0)
    assert(r.getAs[Long]("n_both") === r.getAs[Long]("n_supplied"))
    assert(r.getAs[Long]("recall_ppm") === 1000000L)
    // and the computed screen may flag MORE (genuine near-dups of
    // eval pages the vector plant never marked) — but not wildly more
    val extra = r.getAs[Long]("n_computed") - r.getAs[Long]("n_supplied")
    assert(extra >= 0 && extra <= r.getAs[Long]("n_supplied") / 4)
  }

  test("every planted paraphrase is flagged with its true twin") {
    val flags = DocEmbed.contaminationSemanticComputed(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docsMax = graft.Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).head().getLong(0)
    val plants = (DocEmbed.EvalMax to docsMax)
      .filter(_ % DocEmbed.PlantMod == DocEmbed.PlantRes)
    assert(plants.nonEmpty)
    plants.foreach { p =>
      assert(flags.contains(p), s"plant $p unflagged")
      assert(flags(p) === p % DocEmbed.EvalMax, s"plant $p wrong twin")
    }
  }

  test("semdedup-from-text catches every planted copy and crop") {
    val verdicts = DocEmbed.dedupSemanticComputed(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val copies = verdicts.keys.filter(id =>
      id >= DocEmbed.DupCopyBase && id < DocEmbed.DupCropBase)
    val crops = verdicts.keys.filter(_ >= DocEmbed.DupCropBase)
    assert(copies.nonEmpty && crops.nonEmpty)
    // every plant is dropped, attributed to a smaller (first-arrival)
    // predecessor — for copies that predecessor is at most the source
    copies.foreach { id =>
      val (dupOf, kept) = verdicts(id)
      assert(kept === 0 && dupOf >= 0 && dupOf <= id - DocEmbed.DupCopyBase, s"$id")
    }
    crops.foreach { id =>
      val (dupOf, kept) = verdicts(id)
      assert(kept === 0 && dupOf >= 0, s"$id")
    }
    // and the natural corpus is NOT wiped out (the threshold margin)
    val naturals = verdicts.filter(_._1 < DocEmbed.DupCopyBase)
    assert(naturals.count(_._2._2 == 1) > naturals.size / 2)
  }

  test("the production banding loses nothing on the probe audit here") {
    val r = DocEmbed.dedupSemanticComputedRecall(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") > 0)
    assert(r.getAs[Long]("n_found") === r.getAs[Long]("n_exact"))
    assert(r.getAs[Long]("recall_ppm") === 1000000L)
  }

  test("pinned-artifact embeddings are population-independent") {
    // the r16 theorem's core: under the PINNED weight table, a doc's
    // vector cannot move when other docs arrive — exactly the property
    // frame-trained IDF lacks (df shifts with every delta batch), and
    // the reason the incremental release may gate on the computed edge
    val w = spark.range(0, 1024).selectExpr("id AS b", "1 + id % 7 AS w")
      .localCheckpoint(true)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % 3 === 1)
      .select((col("doc_id") + 7000000L).as("doc_id"),
        reverse(col("text")).as("text"))
    def fps(d: org.apache.spark.sql.DataFrame) =
      graft.analytics.DocEmbed.embedWith(d, w)
        .filter(col("doc_id") < 7000000L)
        .select(col("doc_id"),
          md5(concat_ws(",", col("v"))).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(docs) === fps(docs.unionByName(delta)))
  }

  test("coverage receipt: the computed edge is total per source") {
    val cov = DocEmbed.docEmbedCoverage(spark, dir).collect()
    assert(cov.nonEmpty)
    cov.foreach { r =>
      assert(r.getAs[Long]("n_computed") === r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("computed_ppm") === 1000000L)
      assert(r.getAs[Long]("n_supplied") <= r.getAs[Long]("n_docs"))
    }
  }
}
