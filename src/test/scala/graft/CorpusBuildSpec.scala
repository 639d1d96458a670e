package graft

import graft.analytics.CorpusBuild
import org.apache.spark.sql.functions._

/** Pins the composed-pipeline semantics the corpus_build oracles can
  * only hash: the ledger's lineage invariant, the planted re-crawl
  * behavior (train copies die at exact-dedup, the re-crawled EVAL page
  * dies at decontamination — never by accident at another stage), the
  * content-keyed decoration contract, and the release projections'
  * internal consistency. Runs at sf0.01: the smallest SF where the
  * doc_id % 50 = 3 plant yields TRAIN copies (sf0.001 only has the
  * eval copy). */
class CorpusBuildSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val ledger = CorpusBuild.corpusBuild(spark, dir).collect()
    .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).sortBy(_._1)
  private lazy val survivors =
    CorpusBuild.corpusBuildDocs(spark, dir).collect()
  private lazy val survivorIds = survivors.map(_.getLong(0)).toSet

  test("ledger reconciles exactly: input = survivors + per-stage drops") {
    assert(ledger.map(_._2) === Seq("eval_holdout", "unicode", "exact",
      "neardup", "paragraph", "gopher", "license", "classifier",
      "contamination", "semantic"))
    // within each row: n_out = n_in - n_dropped
    ledger.foreach { case (r, st, nIn, nDrop, nOut) =>
      assert(nOut === nIn - nDrop, s"stage $st"); assert(nDrop >= 0, st)
    }
    // chain: stage k feeds stage k+1
    ledger.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 === b._3, s"${a._2} -> ${b._2}")
    case _ => ()
    }
    // the global invariant, and the docs query agrees with the ledger
    assert(ledger.head._3 === ledger.map(_._4).sum + ledger.last._5)
    assert(ledger.last._5.toInt === survivors.length)
  }

  test("ledger input counts the corpus plus the re-crawl plants") {
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val plants = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 50 === 3).count()
    assert(ledger.head._3 === n + plants)
  }

  test("every stage can fire: dedup/holdout stages drop at sf0.01") {
    val drops = ledger.map(r => r._2 -> r._4).toMap
    // holdout, unicode, exact (the plants), neardup, paragraph,
    // gopher, license and semantic all provably fire at this SF;
    // classifier/contamination drops are pinned nonzero at sf0.1
    // (cross-SF sweep)
    Seq("eval_holdout", "unicode", "exact", "neardup", "paragraph",
      "gopher", "license", "semantic").foreach(
      st => assert(drops(st) > 0, st))
  }

  test("no restrictive-licensed page ever ships") {
    import graft.analytics.License
    val base = CorpusBuild.baseOf(
      spark.read.parquet(s"$dir/documents.parquet"))
    val restrictive = base
      .filter(License.restrictiveCol(
        CorpusBuild.licDecor(col("raw"), col("ck"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(restrictive.nonEmpty) // the plant produces restrictive pages
    assert(restrictive.intersect(survivorIds).isEmpty)
  }

  test("no surviving embedding sits above the semantic threshold") {
    // recompute the screen over the SURVIVORS' vectors from scratch:
    // every planted paraphrase of an eval item must be gone, and no
    // natural survivor may sit at cos >= tau either
    val vecs = CorpusBuild.vecsOf(spark, dir)
    val evv = vecs.filter(col("vec_id") < CorpusBuild.EvalMax)
      .select(col("v").as("ev"), col("nrm").as("en"))
    val hot = vecs.filter(col("vec_id") >= CorpusBuild.EvalMax)
      .filter(col("vec_id").isin(survivorIds.toSeq: _*))
      .crossJoin(evv)
      .filter(graft.functions.vec.dot(col("v"), col("ev")) /
        (col("nrm") * col("en")) >= 0.95)
    assert(hot.count() === 0)
    // and the stage was load-bearing: some planted doc reached stage 10
    val sem = ledger.find(_._2 == "semantic").get
    assert(sem._4 > 0)
  }

  test("datasheet: one row per surviving source, license mix is " +
      "permissive-or-unknown, quality margins positive") {
    val ds = CorpusBuild.corpusDatasheet(spark, dir).collect()
    val docsBySource = survivors.groupBy(_.getString(1))
      .view.mapValues(_.length).toMap
    assert(ds.map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      === docsBySource)
    // the license gate ran before release: no restrictive primary can
    // appear as a source's modal license
    val banned = Set("gpl-3.0", "cc-by-nc-4.0", "all-rights-reserved")
    ds.foreach { r =>
      assert(!banned.contains(r.getString(6)), r.getString(0))
      assert(r.getLong(7) > 0, s"${r.getString(0)} sum_margin") // gate 8
      assert(r.getLong(5) <= r.getLong(1))                      // n_licensed
    }
    // temperature shares are a simplex (same invariant as the mix)
    val shares = ds.map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("a train doc and its re-crawl copy never both survive") {
    val copyOriginals = survivorIds.filter(_ >= CorpusBuild.CopyBase)
      .map(_ - CorpusBuild.CopyBase)
    assert(copyOriginals.intersect(survivorIds).isEmpty)
  }

  test("the re-crawled EVAL page is always scrubbed from the release") {
    // doc 3 is eval (held out); its re-crawl copy 100003 is an exact
    // copy of eval text — dedup cannot catch it (the twin never enters
    // the pool), so if it reaches stage 8 the contamination screen
    // must kill it; whatever stage fires, it must never ship
    assert(!survivorIds.contains(CorpusBuild.CopyBase + 3))
  }

  test("content-keyed decoration: copies repair to identical text") {
    val base = CorpusBuild.baseOf(
      spark.read.parquet(s"$dir/documents.parquet"))
    val pairs = base.filter(col("doc_id") >= CorpusBuild.CopyBase)
      .select((col("doc_id") - CorpusBuild.CopyBase).as("doc_id"),
        col("ftext").as("copy_ftext"))
      .join(base, Seq("doc_id"))
    assert(pairs.count() === 10)
    assert(pairs.filter(col("ftext") =!= col("copy_ftext")).count() === 0)
  }

  test("survivors are scrubbed: fingerprints carry no raw PII and the " +
      "packing respects the running-budget rule") {
    // every pack holds < budget + its own last doc (first-fit running
    // rule: a pack closes only once its cumulative sum crosses 512)
    val byPack = survivors.groupBy(r => (r.getString(1), r.getLong(6)))
    byPack.foreach { case ((srcPack, _), rows) =>
      val toks = rows.map(_.getLong(2))
      assert(toks.sum < 512 + toks.max,
        s"pack $srcPack overfilled: ${toks.sum}")
    }
    // redaction counters: every doc whose id hits an injection class
    // reports at least one redaction of that kind
    survivors.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) assert(r.getLong(3) >= 1, s"doc $id n_emails")
      if (id % 5 == 0) assert(r.getLong(4) >= 1, s"doc $id n_phones")
    }
  }

  test("manifest: pack rows partition the release, the root folds " +
      "them, and any tamper is visible at both levels") {
    val rows = CorpusBuild.corpusManifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val (root, packs) = rows.partition(_._1 == "*")
    assert(root.length === 1 && root.head._2 === -1L)
    assert(root.head._3 === packs.map(_._3).sum)
    assert(root.head._4 === packs.map(_._4).sum)
    assert(packs.map(_._3).sum.toInt === survivors.length)
    // the root is exactly the ordered fold of the pack fingerprints
    val md = java.security.MessageDigest.getInstance("MD5")
    val folded = md.digest(packs.sortBy(p => (p._1, p._2))
      .map(_._5).mkString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(root.head._5 === folded)
    // tamper detection: flipping one pack fingerprint changes the root
    val tampered = packs.sortBy(p => (p._1, p._2)).map(_._5)
      .updated(0, "0" * 32).mkString
    val md2 = java.security.MessageDigest.getInstance("MD5")
    assert(md2.digest(tampered.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString !== root.head._5)
  }

  test("curriculum: dense global ranks follow the difficulty order and " +
      "cover exactly the release's packs") {
    val cur = CorpusBuild.curriculumOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(cur.map(_._1).toSeq === (1L to cur.length))
    // rank order == (mean_bits, source, pack) order, no single-
    // partition window involved (the globalRowNumber contract)
    assert(cur.map(c => (c._6, c._2, c._3)).toSeq ===
      cur.map(c => (c._6, c._2, c._3)).sortBy(identity).toSeq)
    val packs = survivors.map(r => (r.getString(1), r.getLong(6))).toSet
    assert(cur.map(c => (c._2, c._3)).toSet === packs)
    assert(cur.map(_._4).sum.toInt === survivors.length)
  }

  test("mix shares are a probability simplex over the survivors") {
    val mix = CorpusBuild.corpusBuildMix(spark, dir).collect()
    val docsBySource = survivors.groupBy(_.getString(1))
      .view.mapValues(_.length).toMap
    assert(mix.map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      === docsBySource)
    val shares = mix.map(_.getDouble(4))
    assert(shares.forall(s => s > 0 && s < 1))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }
}
