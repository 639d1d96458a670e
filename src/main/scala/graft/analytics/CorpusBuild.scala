package graft.analytics

import graft.analytics.Caches.TrackedPersist
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed end-to-end corpus build — the query a real LLM-data
  * user actually runs, chaining the FULL gate stack this engine owns
  * into ONE pipeline with an exactly-reconciling drop ledger (the
  * reference's own lineage invariant — valid + rejected = input,
  * `Glue_job.py:131-135` — elevated to the training-data pipeline:
  * every input document is either a survivor or attributed to exactly
  * one drop stage).
  *
  * Stage order is the CCNet/RefinedWeb shape (Wenzek et al. 2020;
  * Penedo et al. 2023), cheap scan gates first, set-dependent dedup in
  * the middle, model/eval gates last:
  *
  *   1. eval_holdout    — the held-out benchmark slice (doc_id <
  *                        [[EvalMax]]) never enters the training pool
  *   2. unicode         — ftfy repair (mojibake + NFC fold), then the
  *                        U+FFFD byte-damage gate (text_unicode_fix)
  *   3. exact           — keep each repaired-text fingerprint's min
  *                        doc_id (dedup_exact's rule, on FIXED text —
  *                        the fold's point: composed/decomposed
  *                        spellings of one document share a key)
  *   4. neardup         — MinHash-LSH clusters, keep-BEST member
  *                        (most tokens, ties min id — dedup_keep_best)
  *   5. paragraph       — drop documents that are ≥ half
  *                        already-seen paragraphs (dedup_paragraphs'
  *                        keep-first rule as a boilerplate-share gate)
  *   6. gopher          — the named Gopher rule bundle (Rae et al.
  *                        2021; quality_gopher's declarative suite)
  *   7. classifier      — the TRAINED averaged-perceptron quality
  *                        model (quality_train/quality_classifier)
  *   8. contamination   — drop documents sharing any 5-gram shingle
  *                        with the eval slice (the GPT-3 appendix-C
  *                        n-gram screen; `contamination`'s plan)
  *
  * then the surviving corpus is PII-scrubbed (pii_scrub), priced, and
  * packed into fixed token budgets per source (pack_sequences), with
  * per-source temperature mixture shares (mixture_temperature) — the
  * three declared queries:
  *
  *   - `corpus_build`      — the 8-row ledger (stage, n_in, n_dropped,
  *                           n_out); n_out(k) ≡ n_in(k+1) and
  *                           input = survivors + Σ drops BY
  *                           CONSTRUCTION, and the DuckDB oracle
  *                           re-derives every count from scratch
  *   - `corpus_build_docs` — the released documents: redaction counts,
  *                           scrubbed-text fingerprint, token price,
  *                           pack assignment
  *   - `corpus_build_mix`  — the per-source mixture table over the
  *                           CLEANED corpus (α=1/2 temperature)
  *
  * Plants (the calibration content that makes every gate provably
  * fire, the url_canon/pii_scrub discipline): re-crawl duplicates
  * (doc_id % 50 = 3 re-enters under doc_id + [[CopyBase]] — same
  * text, new id, the page crawled twice), and the unicode/boilerplate
  * decorations keyed on a CONTENT hash ([[contentKey]]) rather than
  * doc_id, so identical texts decorate identically and plants can
  * never split a duplicate family (a re-crawled EVAL page survives
  * dedup — its twin is held out — and is caught by stage 8, exactly
  * the leak decontamination exists for).
  *
  * Scale shape (the reason each stage is spelled the way it is):
  * stages 1–2 are scan-side predicates; stage 3 shuffles a 32-byte
  * fingerprint + id; stage 4 is the banded MinHash candidate join
  * (ids only); stage 5 shuffles paragraph hashes + bounded index
  * lists; stages 6–7 are scan-side folds (the classifier's 34 learned
  * longs ride in as literals); stage 8 broadcast-joins the
  * small-by-construction eval shingle set. Stage membership flows as
  * ID-ONLY cached sets semi-joined back to the one cached repaired
  * corpus — document text never shuffles in any stage, which is what
  * makes the composed pipeline the same 100 TB contract as its parts.
  */
object CorpusBuild {

  /** Documents below this id are the held-out eval slice. */
  private[graft] val EvalMax = 25L

  /** Planted re-crawl copies re-enter under doc_id + CopyBase. */
  private[graft] val CopyBase = 100000L

  private val PackBudget = 512

  private def toksF = split(col("ftext"), " ")

  /** 24-bit content key — the decoration-class selector. Content-keyed
    * (not doc_id-keyed) so exact duplicates decorate identically. */
  private def contentKey(text: Column): Column =
    conv(substring(md5(text), 1, 6), 16, 10).cast("long")

  private val ckSql = "('0x' || substr(md5(text), 1, 6))::BIGINT"

  /** The planted + decorated + repaired corpus:
    * (doc_id, source, lang, raw, ck, ftext). */
  private[graft] def baseOf(docs: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "source", "lang", "text").map(col)
    val planted = docs.select(cols: _*).unionByName(
      docs.filter(col("doc_id") % 50 === 3)
        .select((col("doc_id") + CopyBase).as("doc_id"),
          col("source"), col("lang"), col("text")))
    val ck = contentKey(col("text"))
    planted
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"), col("lang"),
        col("text").as("raw"), ck.as("ck"),
        TextAnalysis.unicodeFoldCol(
          TextAnalysis.unicodeDecoratedOf(col("text"), ck)).as("ftext"))
  }

  /** One run of the pipeline: the cached base, the per-stage survivor
    * id-sets (index 0 = all input ids), and the stage names.
    *
    * Every id-set is localCheckpoint'd EAGERLY (the dedup_clusters /
    * graph-loop precedent, here for a different reason): the ledger
    * declares 16 aggregates over these sets and each downstream stage
    * embeds its predecessors, so without severing, Catalyst re-compiles
    * the WHOLE accumulated plan (cluster loop + Gopher/classifier
    * expression trees) once per aggregate — measured 20+ s of pure
    * driver-side plan compilation at sf0.1 against ~3 s of actual
    * executor work. The sets are id-only (bounded width), so the
    * checkpoint is the cheap side of that trade at any scale. */
  private[graft] def build(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) =
    buildMemo.getOrElseUpdate((s, d), buildOnce(s, d))

  /** The pipeline materializes ONCE per (session, corpus directory) and
    * the report queries (ledger / released docs / mixture / datasheet)
    * read the same materialized stage sets — a user's workflow: one
    * pipeline job, then cheap reporting (the trainQualityWeights memo
    * precedent). The held state is the id-only checkpointed sets —
    * bounded width, one long per surviving document. Keyed by the
    * OWNING SparkSession too (r13 advice): checkpointed DataFrames are
    * bound to the session that materialized them, so a later session
    * in the same JVM must rebuild rather than receive dead plans. */
  private val buildMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, Seq[DataFrame])]

  private def buildOnce(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    def sever(df: DataFrame): DataFrame = df.localCheckpoint(true)
    // the repaired corpus is checkpointed too — it is what a real
    // pipeline writes back to storage after the repair pass, and every
    // stage (and the release projections) reads it
    val base = sever(baseOf(documents(s, d)))
    val ids0 = sever(base.select(col("doc_id")))

    // 1. eval holdout — scan predicate
    val ids1 = sever(base.filter(col("doc_id") >= EvalMax)
      .select(col("doc_id")))

    // 2. unicode damage gate — scan predicate on the repaired text
    val nBad = length(col("ftext")) -
      length(regexp_replace(col("ftext"), TextAnalysis.Replacement, ""))
    val ids2 = sever(base.join(ids1, Seq("doc_id"), "left_semi")
      .filter(nBad * 1000 <= length(col("ftext")))
      .select(col("doc_id")))
    val s2 = base.join(ids2, Seq("doc_id"), "left_semi")

    // 3. exact dedup on the REPAIRED text — 32-byte fp shuffle
    val ids3 = sever(s2.select(col("doc_id"), md5(col("ftext")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")))
    val s3 = base.join(ids3, Seq("doc_id"), "left_semi")

    // 4. near dedup: MinHash-LSH clusters, keep-best representative
    val sh3 = s3.filter(size(toksF) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.text.shingles(toksF, 5)).as("shingle"))
      .distinct()
    val clusters = Dedup.clustersOf(Dedup.minhashPairsOf(sh3))
    val wBest = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val losers = clusters
      .join(s3.select(col("doc_id"), size(toksF).cast("long").as("n_tokens")),
        Seq("doc_id"))
      .withColumn("rk", row_number().over(wBest))
      .filter(col("rk") =!= 1).select(col("doc_id"))
    val ids4 = sever(ids3.join(losers, Seq("doc_id"), "left_anti"))
    val s4 = base.join(ids4, Seq("doc_id"), "left_semi")

    // 5. boilerplate-share gate: ≥ half already-seen paragraphs drops
    val pa = s4.select(col("doc_id"),
      Chunking.paraArrayOf(col("ftext"), col("ck")).as("pa")).persistTracked()
    val ph = pa
      .select(col("doc_id"), posexplode(col("pa")).as(Seq("idx", "para")))
      .select(col("doc_id"), col("idx"), md5(col("para")).as("h"))
    val g = ph.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"),
        min(col("doc_id") * 1000 + col("idx")).as("first_key"))
    val removed = ph.join(g, Seq("h"))
      .filter(col("n_occ") > 1 &&
        col("doc_id") * 1000 + col("idx") =!= col("first_key"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_removed"))
    val ids5 = sever(pa.select(col("doc_id"), size(col("pa")).cast("long").as("n_paras"))
      .join(removed, Seq("doc_id"), "left")
      .filter(coalesce(col("n_removed"), lit(0L)) * 2 < col("n_paras"))
      .select(col("doc_id")))
    val s5 = base.join(ids5, Seq("doc_id"), "left_semi")

    // 6. Gopher rule bundle over the repaired text
    val ids6 = sever(TextAnalysis.qualityGopherOf(
        s5.select(col("doc_id"), col("ftext").as("text")))
      .filter(col("gopher_keep") === 1)
      .select(col("doc_id")))
    val s6 = base.join(ids6, Seq("doc_id"), "left_semi")

    // 7. trained quality classifier (averaged-perceptron vote)
    val (_, wsum) = Curation.trainQualityWeights(s, d)
    val ids7 = sever(Curation.classifierScored(
        s6.select(col("doc_id"), col("ftext").as("text")), wsum)
      .filter(col("margin") > 0)
      .select(col("doc_id")))
    val s7 = base.join(ids7, Seq("doc_id"), "left_semi")

    // 8. eval decontamination: any shared 5-gram with the raw eval
    // slice drops (the eval side is small by construction → broadcast)
    val rawToks = split(col("raw"), " ")
    val evsh = base.filter(col("doc_id") < EvalMax)
      .filter(size(rawToks) >= 5)
      .select(explode(graft.functions.text.shingles(rawToks, 5)).as("shingle"))
      .distinct()
    val sh7 = s7.filter(size(toksF) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.text.shingles(toksF, 5)).as("shingle"))
      .distinct()
    val contam = sh7.join(broadcast(evsh), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val ids8 = sever(ids7.join(contam, Seq("doc_id"), "left_anti"))

    (base, Seq(ids0, ids1, ids2, ids3, ids4, ids5, ids6, ids7, ids8))
  }

  private val StageNames = Seq("eval_holdout", "unicode", "exact",
    "neardup", "paragraph", "gopher", "classifier", "contamination")

  /** The drop ledger: 8 rows of (stage_rank, stage, n_in, n_dropped,
    * n_out). Reconciliation is structural — n_out(k) = n_in(k) −
    * n_dropped(k) and n_in(k+1) = n_out(k) because the stages consume
    * each other's id-sets; the oracle hash-pins every count. */
  def corpusBuild(s: SparkSession, d: String): DataFrame = {
    val (_, ids) = build(s, d)
    StageNames.zipWithIndex.map { case (name, i) =>
      ids(i).agg(count(lit(1)).as("n_in"))
        .crossJoin(ids(i + 1).agg(count(lit(1)).as("n_out")))
        .select(lit(i + 1).as("stage_rank"), lit(name).as("stage"),
          col("n_in"), (col("n_in") - col("n_out")).as("n_dropped"),
          col("n_out"))
    }.reduce(_ unionByName _)
  }

  /** The released corpus: survivors PII-scrubbed (redaction counts +
    * scrubbed-text fingerprint — the text that actually ships), priced
    * in scrubbed tokens, and packed into [[PackBudget]]-token training
    * packs per source (pack_sequences' per-shard running window). */
  def corpusBuildDocs(s: SparkSession, d: String): DataFrame = {
    val (base, ids) = build(s, d)
    val surv = base.join(ids.last, Seq("doc_id"), "left_semi")
    val scrubbed = Curation.piiScrubFull(
        surv.select(col("doc_id"), col("ftext").as("text")))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("scrubbed")).as("clean_fp"),
        size(split(col("scrubbed"), " ")).cast("long").as("n_tokens"))
    val wPack = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    surv.select(col("doc_id"), col("source"))
      .join(scrubbed, Seq("doc_id"))
      .withColumn("cum", sum(col("n_tokens")).over(wPack))
      .selectExpr("doc_id", "source", "n_tokens", "n_emails", "n_phones",
        "clean_fp", s"(cum - n_tokens) div $PackBudget AS pack_id")
  }

  /** The per-source mixture table over the CLEANED corpus: document
    * and scrubbed-token volumes, exact proportional ppm, and the
    * α = 1/2 temperature share (mixture_temperature's IEEE-sqrt lane
    * with the running-window sequential-sum trick). */
  def corpusBuildMix(s: SparkSession, d: String): DataFrame = {
    val (base, ids) = build(s, d)
    val surv = base.join(ids.last, Seq("doc_id"), "left_semi")
    val per = Curation.piiScrubFull(
        surv.select(col("doc_id"), col("ftext").as("text")))
      .select(col("doc_id"), size(split(col("scrubbed"), " "))
        .cast("long").as("n_tokens"))
      .join(surv.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val wRun = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sq = per
      .withColumn("sq", sqrt(col("n_tokens").cast("double")))
      .withColumn("run", sum(col("sq")).over(wRun))
    val tot = sq.agg(max(col("run")).as("sq_tot"),
      sum(col("n_tokens")).as("tot_n"))
    sq.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CAST(n_tokens AS DECIMAL(28,0)) * 1000000 div tot_n")
          .as("prop_ppm"),
        (col("sq") / col("sq_tot")).as("temp_share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_build"      -> corpusBuild _,
    "corpus_build_docs" -> corpusBuildDocs _,
    "corpus_build_mix"  -> corpusBuildMix _)

  // ---------------------------------------------------------------
  // DuckDB oracle — the ENTIRE pipeline re-derived from scratch:
  // plants, repair, all eight stage sets (each MATERIALIZED — the
  // ledger's count subqueries would otherwise re-inline the whole
  // upstream chain once per stage), the recursive connected
  // components, the unrolled classifier training, and the release
  // projections. Every stage reuses the owning operator's oracle
  // generator (one SQL spelling per operator across the board).
  // ---------------------------------------------------------------

  /** CTE chain from the planted corpus through the eight stage sets
    * (s1..s8), assuming `wavg` (classifier training) in scope. */
  private def stageCtes: String = {
    val classifierSelect = Curation
      .classifierScoreSqlFrom("(SELECT doc_id, ftext AS text FROM s6)")
      .trim.stripPrefix(",")
    s"""pdocs AS (
          SELECT doc_id, source, lang, text FROM documents
          UNION ALL
          SELECT doc_id + $CopyBase, source, lang, text FROM documents
          WHERE doc_id % 50 = 3),
        keyed AS (
          SELECT doc_id, source, lang, text, $ckSql AS ck FROM pdocs),
        fixd AS MATERIALIZED (
          SELECT doc_id, source, lang, text AS raw, ck,
            ${TextAnalysis.unicodeFoldSqlExpr(
              TextAnalysis.unicodeDecSqlExpr("text", "ck"))} AS ftext
          FROM keyed),
        s1 AS MATERIALIZED (SELECT * FROM fixd WHERE doc_id >= $EvalMax),
        s2 AS MATERIALIZED (
          SELECT * FROM s1
          WHERE (length(ftext) - length(replace(ftext, chr(65533), '')))
            * 1000 <= length(ftext)),
        canon AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(ftext)),
        s3 AS MATERIALIZED (SELECT s2.* FROM s2 JOIN canon USING (doc_id)),
        sh AS MATERIALIZED (${Dedup.shingleSqlFrom("s3", "ftext")}),
        ${Dedup.minhashCtes},
        ${Dedup.clusterCtes},
        reps AS (
          SELECT cluster_id, doc_id AS rep FROM (
            SELECT c.cluster_id, c.doc_id,
              row_number() OVER (PARTITION BY c.cluster_id
                ORDER BY len(string_split(s3.ftext, ' ')) DESC, c.doc_id) AS rk
            FROM clusters c JOIN s3 ON s3.doc_id = c.doc_id) z
          WHERE rk = 1),
        losers AS (
          SELECT c.doc_id FROM clusters c
          JOIN reps r ON r.cluster_id = c.cluster_id
          WHERE c.doc_id <> r.rep),
        s4 AS MATERIALIZED (
          SELECT * FROM s3
          WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        ${Chunking.paraCtesFrom("s4", "ftext", "ck")},
        prm AS (
          SELECT px.doc_id, count(*) AS n_removed
          FROM px JOIN g ON g.h = md5(px.para)
          WHERE g.n_occ > 1 AND px.doc_id * 1000 + px.idx <> g.first_key
          GROUP BY 1),
        pstat AS (
          SELECT pa.doc_id, len(pa.pa) AS n_paras,
            coalesce(prm.n_removed, 0) AS n_removed
          FROM pa LEFT JOIN prm USING (doc_id)),
        s5 AS MATERIALIZED (
          SELECT s4.* FROM s4 JOIN pstat USING (doc_id)
          WHERE 2 * pstat.n_removed < pstat.n_paras),
        gm AS MATERIALIZED (
          ${TextAnalysis.gopherSqlFrom("(SELECT doc_id, ftext AS text FROM s5)")}),
        s6 AS MATERIALIZED (
          SELECT s5.* FROM s5 JOIN gm USING (doc_id)
          WHERE gm.gopher_keep = 1),
        cm AS MATERIALIZED (WITH $classifierSelect),
        s7 AS MATERIALIZED (
          SELECT s6.* FROM s6 JOIN cm USING (doc_id) WHERE cm.margin > 0),
        evsh AS MATERIALIZED (
          SELECT DISTINCT shingle FROM (${Dedup.shingleSqlFrom(
            s"(SELECT doc_id, raw FROM fixd WHERE doc_id < $EvalMax)", "raw")}) ev),
        sh7 AS (${Dedup.shingleSqlFrom("s7", "ftext")}),
        contam AS (SELECT DISTINCT doc_id FROM sh7 JOIN evsh USING (shingle)),
        s8 AS MATERIALIZED (
          SELECT * FROM s7
          WHERE doc_id NOT IN (SELECT doc_id FROM contam))"""
  }

  private def withChain: String =
    s"WITH RECURSIVE ${Curation.qualityTrainCtes},\n        $stageCtes"

  /** PII + pricing + packing over the survivor set (the docs/mix
    * queries' shared tail; exposes packed). */
  private def releaseCtes: String =
    s""",
        ${Curation.piiCtesFrom("(SELECT doc_id, ftext AS text FROM s8)")},
        priced AS (
          SELECT s8.doc_id, s8.source, scrub.n_emails, scrub.n_phones,
            md5(scrub.st) AS clean_fp,
            CAST(len(string_split(scrub.st, ' ')) AS BIGINT) AS n_tokens
          FROM s8 JOIN scrub ON scrub.doc_id = s8.doc_id),
        packed AS (
          SELECT doc_id, source, n_tokens, n_emails, n_phones, clean_fp,
            (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tokens) // $PackBudget AS pack_id
          FROM priced)"""

  val oracle: Map[String, String] = Map(
    "corpus_build" ->
      s"""$withChain
        SELECT CAST(r AS INT) AS stage_rank, stage, n_in,
          n_in - n_out AS n_dropped, n_out
        FROM (
          SELECT 1 AS r, 'eval_holdout' AS stage,
            (SELECT count(*) FROM fixd) AS n_in,
            (SELECT count(*) FROM s1) AS n_out
          UNION ALL SELECT 2, 'unicode',
            (SELECT count(*) FROM s1), (SELECT count(*) FROM s2)
          UNION ALL SELECT 3, 'exact',
            (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
          UNION ALL SELECT 4, 'neardup',
            (SELECT count(*) FROM s3), (SELECT count(*) FROM s4)
          UNION ALL SELECT 5, 'paragraph',
            (SELECT count(*) FROM s4), (SELECT count(*) FROM s5)
          UNION ALL SELECT 6, 'gopher',
            (SELECT count(*) FROM s5), (SELECT count(*) FROM s6)
          UNION ALL SELECT 7, 'classifier',
            (SELECT count(*) FROM s6), (SELECT count(*) FROM s7)
          UNION ALL SELECT 8, 'contamination',
            (SELECT count(*) FROM s7), (SELECT count(*) FROM s8)) u""",
    "corpus_build_docs" ->
      s"""$withChain$releaseCtes
        SELECT doc_id, source, n_tokens, n_emails, n_phones, clean_fp,
          CAST(pack_id AS BIGINT) AS pack_id
        FROM packed""",
    "corpus_build_mix" ->
      s"""$withChain$releaseCtes,
        per AS (
          SELECT source, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM packed GROUP BY source),
        sq AS (
          SELECT source, n_docs, n_tokens,
            sqrt(CAST(n_tokens AS DOUBLE)) AS sq,
            sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER (ORDER BY source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM per),
        tot AS (SELECT max(run) AS sq_tot, sum(n_tokens) AS tot_n FROM sq)
        SELECT source, n_docs, n_tokens,
          CAST((CAST(n_tokens AS HUGEINT) * 1000000) // tot_n AS BIGINT)
            AS prop_ppm,
          sq / sq_tot AS temp_share
        FROM sq CROSS JOIN tot""")
}
