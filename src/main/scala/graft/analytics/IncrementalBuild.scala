package graft.analytics

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (snapshot-delta) corpus build — the production workflow
  * [[CorpusBuild]] deliberately does not model: a new crawl batch
  * arrives monthly, and at 100 TB you cannot re-gate the existing
  * corpus — the batch must be gated ALONE against the existing
  * corpus's persisted stage indexes (fingerprint set, shingle-owner
  * store), appending survivors. The whole design hangs on one
  * invariant, which this module both constructs and PROVES in data:
  *
  *   incremental(old, delta)  ≡  from-scratch(old ∪ delta)
  *
  * on survivor ids. The invariant does not hold for arbitrary gate
  * stacks — keep-BEST near-dup (corpus_build stage 4) lets a better
  * late arrival displace a shipped document, and cluster bridges can
  * merge old families — so the incremental stack is built exclusively
  * from FIRST-ARRIVAL rules, where an already-shipped document can
  * never be revoked (crawl ids increase monotonically, so "first" =
  * min doc_id, the dedup_exact / text_novelty ownership rule):
  *
  *   1. eval_holdout      — per-doc predicate (trivially incremental)
  *   2. exact_vs_store    — drop a delta doc whose fingerprint is in
  *                          the store; keep-first among the genuinely
  *                          new fingerprints (dedup_incremental's
  *                          anti-join shape; at scale the store is a
  *                          16-byte-key index, never text, and the
  *                          bloom prescreen of dedup_incremental_bloom
  *                          applies verbatim)
  *   3. novelty_vs_store  — text_novelty's first-arrival shingle
  *                          ownership as a gate: a doc owning fewer
  *                          than half its distinct 5-gram shingles is
  *                          boilerplate/recombination and drops. Old
  *                          docs always out-own the delta (smaller
  *                          ids), so old verdicts are immutable —
  *                          exactly why ownership composes
  *                          incrementally.
  *   4. gopher            — per-doc rule bundle (quality_gopher)
  *   5. classifier        — the averaged-perceptron margin under the
  *                          SNAPSHOT-PINNED model artifact: both
  *                          directions score under the SAME trained
  *                          weights, because retraining per delta
  *                          would silently reshuffle old verdicts —
  *                          the model is a versioned release input,
  *                          not a per-batch byproduct
  *
  * Plants (making both store gates provably fire): re-crawled old
  * pages re-enter the delta under doc_id + [[CopyBase]] (caught by
  * the fingerprint store), and self-concatenated "remix" pages under
  * doc_id + [[RemixBase]] (new fingerprint, but nearly all shingles
  * are old-owned — caught by the ownership gate and invisible to
  * exact dedup, which is the reason the shingle store exists).
  *
  * Declared queries:
  *   - `corpus_build_incremental` — the 5-row delta ledger (what the
  *     monthly batch run reports): stage, n_in, n_dropped, n_out over
  *     the DELTA ONLY
  *   - `corpus_incr_equiv` — the equivalence receipt: old survivors,
  *     appended delta survivors, the incremental union, the
  *     from-scratch union — and both set differences, which the
  *     oracle pins to ZERO by re-deriving both directions from
  *     scratch in SQL
  *
  * Scale shape: the delta batch never joins document text against the
  * corpus — the fingerprint store is a hashed-key anti-join, the
  * ownership store joins on shingle keys carrying (shingle, owner id)
  * only, and gates 4–5 are scan-side folds. Re-gating cost is
  * O(delta), not O(corpus): the invariant proven here is what makes
  * that legal. Stage sets are id-only eager checkpoints (the
  * corpus_build compile-severing rule); the three materialized runs
  * (old / delta-incremental / union) memoize per (session, corpus).
  */
object IncrementalBuild {

  /** Existing-corpus snapshot boundary (the dedup_incremental split):
    * doc_id < SnapMax is the already-ingested lake, the rest is the
    * arriving batch. */
  private[graft] val SnapMax = 400L

  /** Held-out eval slice bound (CorpusBuild.EvalMax). */
  private[graft] val HoldMax = CorpusBuild.EvalMax

  /** Re-crawled old pages re-enter the delta under id + CopyBase. */
  private[graft] val CopyBase = 10000L

  /** Remix plants (text = page ∥ page) enter under id + RemixBase. */
  private[graft] val RemixBase = 20000L

  private def toks = split(col("text"), " ")

  /** The planted corpus: naturals + delta-side re-crawl copies
    * (%37 = 5) and remix recombinations (%53 = 30) of old pages. */
  private[graft] def planted(docs: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "source", "lang", "text").map(col)
    val old = col("doc_id") >= HoldMax && col("doc_id") < SnapMax
    docs.select(cols: _*)
      .unionByName(docs.filter(old && col("doc_id") % 37 === 5)
        .select((col("doc_id") + CopyBase).as("doc_id"), col("source"),
          col("lang"), col("text")))
      .unionByName(docs.filter(old && col("doc_id") % 53 === 30)
        .select((col("doc_id") + RemixBase).as("doc_id"), col("source"),
          col("lang"), concat(col("text"), lit(" "), col("text")).as("text")))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
  }

  /** Distinct per-doc 5-gram shingles (the dedup shingle spelling). */
  private def shinglesDistinct(docs: DataFrame): DataFrame =
    docs.filter(size(toks) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.text.shingles(toks, 5)).as("shingle"))
      .distinct()

  /** Ownership-gate stats: per doc, distinct shingles and how many it
    * owns under the given (shingle → owner) table. */
  private def ownStats(sh: DataFrame, owner: DataFrame): DataFrame =
    sh.join(owner, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
          .as("n_own"))

  /** Keep rule: shingle-free docs pass; otherwise own ≥ half. */
  private def novKeep(pop: DataFrame, stat: DataFrame): DataFrame =
    pop.select(col("doc_id")).join(stat, Seq("doc_id"), "left")
      .filter(col("n_sh").isNull || col("n_own") * 2 >= col("n_sh"))
      .select(col("doc_id"))

  /** The FROM-SCRATCH first-arrival stack over an arbitrary planted
    * slice: 6 id-sets (input, holdout, exact, novelty, gopher,
    * classifier), each eagerly checkpointed. */
  private def batchStack(pop: DataFrame, wsum: Array[Long]): Seq[DataFrame] = {
    def sever(df: DataFrame) = df.localCheckpoint(true)
    val ids0 = sever(pop.select(col("doc_id")))
    val h = pop.filter(col("doc_id") >= HoldMax)
    val ids1 = sever(h.select(col("doc_id")))
    val ids2 = sever(h.select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")))
    val s2 = pop.join(ids2, Seq("doc_id"), "left_semi")
    val sh = shinglesDistinct(s2)
    val owner = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("owner"))
    val ids3 = sever(novKeep(s2, ownStats(sh, owner)))
    val s3 = pop.join(ids3, Seq("doc_id"), "left_semi")
    val ids4 = sever(TextAnalysis.qualityGopherOf(
        s3.select(col("doc_id"), col("text")))
      .filter(col("gopher_keep") === 1).select(col("doc_id")))
    val s4 = pop.join(ids4, Seq("doc_id"), "left_semi")
    val ids5 = sever(Curation.classifierScored(
        s4.select(col("doc_id"), col("text")), wsum)
      .filter(col("margin") > 0).select(col("doc_id")))
    Seq(ids0, ids1, ids2, ids3, ids4, ids5)
  }

  /** The INCREMENTAL delta path: gate the batch against the old run's
    * persisted indexes only. `oldE` is the old corpus's post-exact
    * survivor slice — the run that built the stores. */
  private def deltaStack(base: DataFrame, oldE: DataFrame,
      wsum: Array[Long]): Seq[DataFrame] = {
    def sever(df: DataFrame) = df.localCheckpoint(true)
    val dpop = base.filter(col("doc_id") >= SnapMax)
    val ids0 = sever(dpop.select(col("doc_id")))
    val dh = dpop.filter(col("doc_id") >= HoldMax)
    val ids1 = sever(dh.select(col("doc_id")))
    // the lake's fingerprint index: 16-byte keys, anti-joined (the
    // dedup_incremental shape; bloom-prescreenable at scale)
    val fpStore = oldE.select(md5(col("text")).as("fp")).distinct()
    val ids2 = sever(dh.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(fpStore, Seq("fp"), "left_anti")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")))
    val s2 = dpop.join(ids2, Seq("doc_id"), "left_semi")
    // the lake's shingle-owner store; a delta shingle falls back to
    // first-arrival WITHIN the batch when the lake has never seen it
    val ownerStore = shinglesDistinct(oldE)
      .groupBy(col("shingle")).agg(min(col("doc_id")).as("owner"))
    val shD = shinglesDistinct(s2)
    val dOwner = shD.groupBy(col("shingle")).agg(min(col("doc_id")).as("downer"))
    val ownerFinal = shD
      .join(ownerStore, Seq("shingle"), "left")
      .join(dOwner, Seq("shingle"))
      .select(col("doc_id"), col("shingle"),
        coalesce(col("owner"), col("downer")).as("owner"))
    val stat = ownerFinal.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
          .as("n_own"))
    val ids3 = sever(novKeep(s2, stat))
    val s3 = dpop.join(ids3, Seq("doc_id"), "left_semi")
    val ids4 = sever(TextAnalysis.qualityGopherOf(
        s3.select(col("doc_id"), col("text")))
      .filter(col("gopher_keep") === 1).select(col("doc_id")))
    val s4 = dpop.join(ids4, Seq("doc_id"), "left_semi")
    val ids5 = sever(Curation.classifierScored(
        s4.select(col("doc_id"), col("text")), wsum)
      .filter(col("margin") > 0).select(col("doc_id")))
    Seq(ids0, ids1, ids2, ids3, ids4, ids5)
  }

  private[graft] final case class IncrState(
    oldSets: Seq[DataFrame], deltaSets: Seq[DataFrame],
    scratchSets: Seq[DataFrame])

  private val memo = new Caches.SessionMemo[IncrState]

  /** Three materialized runs per (session, corpus): the old snapshot's
    * batch stack (whose post-exact slice feeds the stores), the
    * incremental delta gating, and the from-scratch union — the two
    * sides of the invariant plus the artifact they share. */
  private[graft] def build(s: SparkSession, d: String): IncrState =
    memo.getOrElseUpdate((s, d), {
      val base = planted(documents(s, d)).localCheckpoint(true)
      val wsum = Curation.trainQualityWeights(s, d)._2
      val oldSets = batchStack(base.filter(col("doc_id") < SnapMax), wsum)
      val oldE = base.join(oldSets(2), Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      val deltaSets = deltaStack(base, oldE, wsum)
      val scratchSets = batchStack(base, wsum)
      IncrState(oldSets, deltaSets, scratchSets)
    })

  private val StageNames = Seq("eval_holdout", "exact_vs_store",
    "novelty_vs_store", "gopher", "classifier")

  /** The monthly batch report: the delta-only drop ledger. */
  def corpusBuildIncremental(s: SparkSession, d: String): DataFrame = {
    val ids = build(s, d).deltaSets
    StageNames.zipWithIndex.map { case (name, i) =>
      ids(i).agg(count(lit(1)).as("n_in"))
        .crossJoin(ids(i + 1).agg(count(lit(1)).as("n_out")))
        .select(lit(i + 1).as("stage_rank"), lit(name).as("stage"),
          col("n_in"), (col("n_in") - col("n_out")).as("n_dropped"),
          col("n_out"))
    }.reduce(_ unionByName _)
  }

  /** The equivalence receipt: incremental(old, delta) vs
    * from-scratch(old ∪ delta), with both set differences as data —
    * the oracle re-derives BOTH directions and pins the differences
    * to zero. */
  def corpusIncrEquiv(s: SparkSession, d: String): DataFrame = {
    val st = build(s, d)
    val incr = st.oldSets.last.unionByName(st.deltaSets.last)
    val scratch = st.scratchSets.last
    st.oldSets.last.agg(count(lit(1)).as("n_old_surv"))
      .crossJoin(st.deltaSets.last.agg(count(lit(1)).as("n_appended")))
      .crossJoin(incr.agg(count(lit(1)).as("n_incremental")))
      .crossJoin(scratch.agg(count(lit(1)).as("n_scratch")))
      .crossJoin(incr.join(scratch, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_only_incremental")))
      .crossJoin(scratch.join(incr, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_only_scratch")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_build_incremental" -> corpusBuildIncremental _,
    "corpus_incr_equiv"        -> corpusIncrEquiv _)

  // ---------------------------------------------------------------
  // DuckDB oracle: plants, the old batch stack, the union batch
  // stack, and the incremental delta path ALL re-derived — so a hash
  // match proves the two directions agree under an independent
  // engine, not merely that Spark agrees with itself. Gopher and
  // classifier reuse the owning operators' SQL generators (nested
  // WITH per instance keeps their internal CTE names disjoint).
  // ---------------------------------------------------------------

  /** One from-scratch stack instance over slice predicate `pred`,
    * CTE-prefixed with `p`. Exposes ${p}h/${p}e/${p}nv/${p}g/${p}c. */
  private def stackCtes(p: String, pred: String): String = {
    val cls = Curation
      .classifierScoreSqlFrom(s"(SELECT doc_id, text FROM ${p}g)")
      .trim.stripPrefix(",")
    s"""${p}h AS MATERIALIZED (
          SELECT * FROM ipd WHERE ($pred) AND doc_id >= $HoldMax),
        ${p}e AS MATERIALIZED (
          SELECT ipd.* FROM ipd JOIN (
            SELECT min(doc_id) AS doc_id FROM ${p}h GROUP BY md5(text)) z
          USING (doc_id)),
        ${p}sh AS MATERIALIZED (${Dedup.shingleSqlFrom(s"${p}e", "text")}),
        ${p}ow AS (
          SELECT shingle, min(doc_id) AS owner FROM ${p}sh GROUP BY 1),
        ${p}st AS (
          SELECT s.doc_id, count(*) AS n_sh,
            sum(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END) AS n_own
          FROM ${p}sh s JOIN ${p}ow o USING (shingle) GROUP BY 1),
        ${p}nv AS MATERIALIZED (
          SELECT ${p}e.* FROM ${p}e LEFT JOIN ${p}st USING (doc_id)
          WHERE ${p}st.n_sh IS NULL OR 2 * ${p}st.n_own >= ${p}st.n_sh),
        ${p}gm AS MATERIALIZED (
          ${TextAnalysis.gopherSqlFrom(s"(SELECT doc_id, text FROM ${p}nv)")}),
        ${p}g AS MATERIALIZED (
          SELECT ${p}nv.* FROM ${p}nv JOIN ${p}gm USING (doc_id)
          WHERE ${p}gm.gopher_keep = 1),
        ${p}cm AS MATERIALIZED (WITH $cls),
        ${p}c AS MATERIALIZED (
          SELECT ${p}g.* FROM ${p}g JOIN ${p}cm USING (doc_id)
          WHERE ${p}cm.margin > 0)"""
  }

  /** The incremental delta path against the `o`-stack's stores. */
  private def deltaCtes: String = {
    val cls = Curation
      .classifierScoreSqlFrom("(SELECT doc_id, text FROM dg)")
      .trim.stripPrefix(",")
    s"""dpop AS (SELECT * FROM ipd WHERE doc_id >= $SnapMax),
        dh AS MATERIALIZED (SELECT * FROM dpop WHERE doc_id >= $HoldMax),
        fps AS (SELECT DISTINCT md5(text) AS fp FROM oe),
        de AS MATERIALIZED (
          SELECT ipd.* FROM ipd JOIN (
            SELECT min(doc_id) AS doc_id FROM (
              SELECT doc_id, md5(text) AS fp FROM dh) w
            WHERE fp NOT IN (SELECT fp FROM fps) GROUP BY fp) z
          USING (doc_id)),
        dsh AS MATERIALIZED (${Dedup.shingleSqlFrom("de", "text")}),
        ddo AS (SELECT shingle, min(doc_id) AS downer FROM dsh GROUP BY 1),
        dfn AS (
          SELECT s.doc_id, coalesce(o.owner, d.downer) AS owner
          FROM dsh s LEFT JOIN oow o USING (shingle) JOIN ddo d USING (shingle)),
        dst AS (
          SELECT doc_id, count(*) AS n_sh,
            sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS n_own
          FROM dfn GROUP BY 1),
        dnv AS MATERIALIZED (
          SELECT de.* FROM de LEFT JOIN dst USING (doc_id)
          WHERE dst.n_sh IS NULL OR 2 * dst.n_own >= dst.n_sh),
        dgm AS MATERIALIZED (
          ${TextAnalysis.gopherSqlFrom("(SELECT doc_id, text FROM dnv)")}),
        dg AS MATERIALIZED (
          SELECT dnv.* FROM dnv JOIN dgm USING (doc_id)
          WHERE dgm.gopher_keep = 1),
        dcm AS MATERIALIZED (WITH $cls),
        dc AS MATERIALIZED (
          SELECT dg.* FROM dg JOIN dcm USING (doc_id)
          WHERE dcm.margin > 0)"""
  }

  private def incrCtes: String =
    s"""WITH RECURSIVE ${Curation.qualityTrainCtes},
        ipd AS MATERIALIZED (
          SELECT doc_id, source, lang, text FROM documents
          UNION ALL
          SELECT doc_id + $CopyBase, source, lang, text FROM documents
          WHERE doc_id >= $HoldMax AND doc_id < $SnapMax AND doc_id % 37 = 5
          UNION ALL
          SELECT doc_id + $RemixBase, source, lang, text || ' ' || text
          FROM documents
          WHERE doc_id >= $HoldMax AND doc_id < $SnapMax AND doc_id % 53 = 30),
        ${stackCtes("o", s"doc_id < $SnapMax")},
        ${stackCtes("u", "TRUE")},
        $deltaCtes"""

  val oracle: Map[String, String] = Map(
    "corpus_build_incremental" ->
      s"""$incrCtes
        SELECT CAST(r AS INT) AS stage_rank, stage, n_in,
          n_in - n_out AS n_dropped, n_out
        FROM (
          SELECT 1 AS r, 'eval_holdout' AS stage,
            (SELECT count(*) FROM dpop) AS n_in,
            (SELECT count(*) FROM dh) AS n_out
          UNION ALL SELECT 2, 'exact_vs_store',
            (SELECT count(*) FROM dh), (SELECT count(*) FROM de)
          UNION ALL SELECT 3, 'novelty_vs_store',
            (SELECT count(*) FROM de), (SELECT count(*) FROM dnv)
          UNION ALL SELECT 4, 'gopher',
            (SELECT count(*) FROM dnv), (SELECT count(*) FROM dg)
          UNION ALL SELECT 5, 'classifier',
            (SELECT count(*) FROM dg), (SELECT count(*) FROM dc)) u""",
    "corpus_incr_equiv" ->
      s"""$incrCtes,
        incr AS (SELECT doc_id FROM oc UNION ALL SELECT doc_id FROM dc)
        SELECT
          (SELECT count(*) FROM oc) AS n_old_surv,
          (SELECT count(*) FROM dc) AS n_appended,
          (SELECT count(*) FROM incr) AS n_incremental,
          (SELECT count(*) FROM uc) AS n_scratch,
          (SELECT count(*) FROM
            (SELECT doc_id FROM incr EXCEPT SELECT doc_id FROM uc) a)
            AS n_only_incremental,
          (SELECT count(*) FROM
            (SELECT doc_id FROM uc EXCEPT SELECT doc_id FROM incr) b)
            AS n_only_scratch""")
}
