package graft.analytics

import graft.Tables._
import graft.functions.vec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>`,
  * 64-dim): brute-force cosine top-k as the exact baseline, and an
  * IVF-style (inverted-file) ANN variant as the scale path.
  *
  * Scale design: the query side is broadcast (it is small by
  * construction); the corpus never shuffles for brute force. IVF turns
  * the O(Q·N) scan into O(Q·N·nprobe/nlist) by probing only the nearest
  * coarse cells — the candidate join is an equi-join on cell id, which
  * Spark executes shuffle-free on the broadcast side. Dot products are
  * `zip_with`/`aggregate` higher-order functions — codegen'd, no UDF.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column = vec.dot(a, b)

  /** Corpus with double-cast vectors + L2 norms (computed once), spread
    * across all cores — the embeddings parquet is a handful of row
    * groups, which would otherwise serialize the whole O(N·Q) scan into
    * one or two tasks. */
  private def corpus(s: SparkSession, d: String): DataFrame = {
    val parts = s.sparkContext.defaultParallelism
    embeddings(s, d).repartition(parts)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", vec.l2norm(col("v")))
  }

  /** Exact brute-force cosine top-10 neighbors for query vectors
    * (vec_id < 50). Output is rank-only (ids + rank): float-tie-proof
    * across engines. */
  def simKnn(s: SparkSession, d: String): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id").as("nid"), col("rn"))
  }

  /** Unit-normalized centroids as a literal array-of-arrays column, so
    * cell assignment is a per-row argmax expression — NO join, NO
    * shuffle, NO window over a corpus×centroid product. Centroids are
    * index metadata (nlist·dim doubles), exactly what belongs on the
    * driver/broadcast side at any scale. */
  private def centroidsLit(cents: Array[Array[Double]]): Column =
    typedlit(cents.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => if (n == 0) 0.0 else x / n).toSeq
    }.toSeq)

  /** argmax cell: with unit centroids, nearest-by-cosine = argmax of
    * v·c (the |v| factor is common). array_position(sims, max) is
    * exact (the max IS an element, bit-identical) and breaks ties to
    * the first index — a pure expression per row, no join, no shuffle.
    * (struct-with-alias inside a lambda is not usable here: lambda
    * struct fields get auto-generated names.) */
  private def cellOf(cl: Column, v: Column): Column = {
    val sims = transform(cl, c => dot(v, c))
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** `iters` rounds of Lloyd refinement over the corpus: assign via the
    * literal-argmax expression, recompute per-cell means (posexplode →
    * one aggregation), collect nlist·dim cell means to the driver.
    * Collecting centroids is index METADATA, not data — the same
    * driver-side loop every k-means implementation (incl. Spark MLlib)
    * runs. Cells that lose all members keep their previous centroid.
    *
    * Means are fixed-point: floor(x·10⁶) longs summed exactly, one
    * double division at the end — so the refined centroids are
    * independent of partitioning/summation order AND cross-engine
    * exact, which is what lets the full IVF pipeline carry a DuckDB
    * oracle (a float `avg` here would make the index — and therefore
    * the result set — depend on shuffle order). */
  private def lloyd(e: DataFrame, init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    var cents = init
    for (_ <- 1 to iters) {
      val cl = centroidsLit(cents)
      val means = e
        .select(cellOf(cl, col("v")).as("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(floor(col("x") * 1e6).cast("long")).cast("double")
          / count(lit(1)) / 1e6).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      }
      cents = next
    }
    cents
  }

  /** IVF-style ANN: k-means-refined coarse quantizer (`nlist` cells,
    * seeded from the first `nlist` vectors + `lloydIters` Lloyd rounds),
    * probe the `nprobe` nearest cells per query, exact-rerank inside
    * them. Cell assignment is a shuffle-free argmax expression against
    * the literal centroids; the only joins are the small probe-list
    * equi-join on `cell` and the final per-query top-k. Approximate ⇒
    * no SQL oracle; recall@10 vs simKnn is spec-asserted ≥ 0.9. */
  /** Default nprobe is tuned for the driver's UNCLUSTERED (near-random)
    * test embeddings, where recall ≈ probed mass and no quantizer can
    * prune hard; production corpora with real cluster structure run the
    * same plan with nprobe ≪ nlist. */
  def simAnnIvf(s: SparkSession, d: String, nlist: Int = 16,
      nprobe: Int = 12, k: Int = 10, lloydIters: Int = 2): DataFrame = {
    // corpus feeds centroid training, assignment, and the query side
    val e = corpus(s, d).persist()
    // seed cell i with vector i: a pushed-down id filter (no global
    // sort/limit), and the id IS the cell index both here and in the
    // DuckDB oracle
    val init = e.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("v")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val cl = centroidsLit(lloyd(e, init, lloydIters))

    // shuffle-free assignment: argmax expression per corpus row
    val assigned = e.select(col("vec_id"), col("v"), col("nrm"),
      cellOf(cl, col("v")).as("cell"))

    // probe lists: nprobe nearest cells per query vector (query side is
    // small by construction — the nlist-row explode + window is trivial)
    val probes = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        posexplode(transform(cl, c => dot(col("v"), c)))
          .as(Seq("cell", "csim")))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cell"))
    val probed = probes
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cell"))

    // exact rerank inside probed cells only
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rn"))
  }

  /** Radius (range) search — the threshold sibling of top-k: every
    * corpus neighbor with cosine ≥ `radius` of each query vector. Same
    * broadcast-query / linear-corpus-scan shape as simKnn; the double
    * cosine is cross-engine exact (same left-to-right dot product). */
  def simRange(s: SparkSession, d: String, radius: Double = 0.3): DataFrame = {
    val e = corpus(s, d)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .filter(col("cos") >= radius)
      .select(col("qid"), col("vec_id").as("nid"), col("cos"))
  }

  /** Int8 quantization — the storage/serving form of an embedding
    * corpus (4× smaller, SIMD-dot-friendly): symmetric max-abs scaling
    * to [−127, 127]. Rounding is spelled floor(x·127/mx + 0.5) because
    * both engines' floor is IEEE-deterministic while round() is not
    * cross-engine stable; the all-zero vector maps to all-zero codes.
    * Output is the code csv + the scale (what a dequantizer needs). */
  def embQuantize(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .select(
        col("vec_id"),
        col("mx").as("scale"),
        concat_ws(",", transform(col("v"), x =>
          when(col("mx") === 0, lit(0L))
            .otherwise(floor(x / col("mx") * 127 + 0.5).cast("long"))))
          .as("codes"))

  /** Per-language class centroids: language-ID the documents, join to
    * their embeddings on id, and aggregate element-wise means. Floats
    * are fixed-point-scaled (floor(x·10⁶) — exact integers) before the
    * sum so the aggregation is order-independent and cross-engine
    * exact; the mean is recovered with one double division. This is
    * the fused modality join + vector aggregation a curation pipeline
    * runs (class prototypes, cluster seeds). Shuffles: one for the
    * id join, one for the (lang, dim) agg — the 64-dim explode rides
    * the same scan. */
  def embCentroid(s: SparkSession, d: String): DataFrame = {
    val lang = TextAnalysis.langId(s, d).select(col("doc_id"), col("pred_lang"))
    embeddings(s, d)
      .join(lang, col("vec_id") === col("doc_id"))
      .select(col("pred_lang"), posexplode(col("embedding")))
      .select(col("pred_lang"), col("pos").as("dim"),
        floor(col("col").cast("double") * 1e6).cast("long").as("q"))
      .groupBy(col("pred_lang"), col("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(col("q")).cast("double") / count(lit(1)) / 1e6).as("mean_q"))
  }

  /** Per-dimension corpus statistics of the embedding column — the
    * feature-scaling pass (dead-dim detection, whitening prep) before
    * any ANN indexing. Values are fixed-pointed to µ-units
    * (floor(x·10⁶)) so all sums are exact integers in any aggregation
    * order; the mean is one double division and the variance numerator
    * n·Σq² − (Σq)² is a nonnegative scale-0 decimal taken down with
    * integral division (floor == truncate for it in both engines).
    * One shuffle on the 64-value `dim` key; the explode rides the
    * scan. */
  def embDimStats(s: SparkSession, d: String): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    embeddings(s, d)
      .select(posexplode(col("embedding")))
      .select(col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * 1e6).cast("long").as("q"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_q"),
        sum(col("q").cast(big) * col("q")).cast(big).as("s2"))
      .select(col("dim"), col("n"), col("sum_q"),
        (col("sum_q").cast("double") / col("n").cast("double")).as("mean_q"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * s2
                 - CAST(sum_q AS DECIMAL(38,0)) * sum_q)
                div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("var_q2"))
  }

  /** Norm histogram over the corpus — the embedding-space sanity check
    * run before any similarity work (collapsed or exploded norms flag a
    * broken encoder). Norms come from the native codegen `L2Norm`
    * expression; buckets are floor(nrm·10) — sqrt is IEEE
    * correctly-rounded and floor is exact, so buckets are
    * cross-engine-identical. Scan + one tiny groupBy. */
  def embNormHist(s: SparkSession, d: String): DataFrame =
    corpus(s, d)
      .groupBy(floor(col("nrm") * 10).as("bucket"))
      .agg(count(lit(1)).as("n_vecs"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_norm_hist" -> embNormHist _,
    "emb_dim_stats" -> embDimStats _,
    "sim_knn" -> simKnn _,
    "sim_ann_ivf" -> ((s: SparkSession, d: String) => simAnnIvf(s, d)),
    "sim_range" -> ((s: SparkSession, d: String) => simRange(s, d)),
    "emb_quantize" -> embQuantize _,
    "emb_centroid" -> embCentroid _,
  )

  val oracle: Map[String, String] = Map(
    "emb_norm_hist" ->
      """SELECT CAST(floor(sqrt(list_dot_product(v, v)) * 10) AS BIGINT)
            AS bucket,
          count(*) AS n_vecs
        FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings)
        GROUP BY 1""",
    // HUGEINT = DuckDB's 128-bit exact lane, mirroring Spark's
    // DECIMAL(38,0); // on the nonnegative variance numerator is the
    // same floor division as Spark's `div`
    "emb_dim_stats" ->
      """WITH q AS (
          SELECT CAST(p.dim AS BIGINT) AS dim,
            CAST(floor(CAST(p.x AS DOUBLE) * 1000000) AS BIGINT) AS q
          FROM (
            SELECT unnest(list_transform(embedding,
              (x, i) -> struct_pack(dim := i - 1, x := x))) AS p
            FROM embeddings)),
        a AS (
          SELECT dim, count(*) AS n, sum(q) AS s1,
            sum(CAST(q AS HUGEINT) * q) AS s2
          FROM q GROUP BY dim)
        SELECT dim, n, CAST(s1 AS BIGINT) AS sum_q,
          CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
          CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_q2
        FROM a""",
    "sim_knn" ->
      """WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
            list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
          FROM n q JOIN n c ON q.vec_id < 50 AND q.vec_id <> c.vec_id)
        SELECT qid, nid, rn FROM (
          SELECT qid, nid,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
          FROM scored)
        WHERE rn <= 10""",
    // sim_ann_ivf is approximate vs the exhaustive scan, but fully
    // DETERMINISTIC: fixed-point Lloyd means make the trained quantizer
    // independent of summation order, so the whole pipeline — seed,
    // 2 Lloyd rounds, probe, rerank — unrolls as DuckDB CTEs and the
    // approximate result set itself is hash-checked. Recall vs sim_knn
    // is additionally asserted in AnalyticsSpec.
    "sim_ann_ivf" -> {
      // normalized list-form centroids from (cell, dim, val) rows; the
      // zero-norm guard mirrors centroidsLit
      def cn(cd: String): String =
        s"""SELECT cell, list_transform(c, x ->
             CASE WHEN sqrt(list_dot_product(c, c)) = 0 THEN 0
                  ELSE x / sqrt(list_dot_product(c, c)) END) AS c
           FROM (SELECT cell, list(val ORDER BY dim) AS c FROM $cd GROUP BY cell)"""
      // nearest-cell assignment (argmax dot, ties to the lowest cell)
      def assign(cnT: String): String =
        s"""SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.c) DESC, c.cell) AS rn
             FROM e CROSS JOIN $cnT c) WHERE rn = 1"""
      // fixed-point per-(cell, dim) means over an assignment
      def means(aT: String): String =
        s"""SELECT a.cell, d.i - 1 AS dim,
             CAST(sum(CAST(floor(e.v[d.i] * 1000000) AS BIGINT)) AS DOUBLE)
               / count(*) / 1000000 AS val
           FROM e JOIN $aT a USING (vec_id), dims d
           GROUP BY a.cell, d.i"""
      // lost cells keep the previous round's centroid
      def step(prevCd: String, mT: String): String =
        s"""SELECT $prevCd.cell, $prevCd.dim, coalesce($mT.val, $prevCd.val) AS val
           FROM $prevCd LEFT JOIN $mT
             ON $mT.cell = $prevCd.cell AND $mT.dim = $prevCd.dim"""
      s"""WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        cd0 AS (
          SELECT vec_id AS cell, i - 1 AS dim, v[i] AS val
          FROM e, dims WHERE vec_id < 16),
        cn0 AS (${cn("cd0")}),
        a1 AS (${assign("cn0")}),
        m1 AS (${means("a1")}),
        cd1 AS (${step("cd0", "m1")}),
        cn1 AS (${cn("cd1")}),
        a2 AS (${assign("cn1")}),
        m2 AS (${means("a2")}),
        cd2 AS (${step("cd1", "m2")}),
        cn2 AS (${cn("cd2")}),
        af AS (${assign("cn2")}),
        probes AS (
          SELECT qid, cell FROM (
            SELECT q.vec_id AS qid, c.cell,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.v, c.c) DESC, c.cell) AS prn
            FROM e q CROSS JOIN cn2 c WHERE q.vec_id < 50) WHERE prn <= 12),
        scored AS (
          SELECT p.qid, x.vec_id AS nid,
            list_dot_product(q.v, x.v) / (q.nrm * x.nrm) AS cos
          FROM probes p
          JOIN af ON af.cell = p.cell
          JOIN n x ON x.vec_id = af.vec_id
          JOIN n q ON q.vec_id = p.qid
          WHERE x.vec_id <> p.qid)
        SELECT qid, nid, rn FROM (
          SELECT qid, nid,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
          FROM scored) WHERE rn <= 10"""
    },
    "sim_range" ->
      """WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        SELECT q.vec_id AS qid, c.vec_id AS nid,
          list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
        WHERE list_dot_product(q.v, c.v) / (q.nrm * c.nrm) >= 0.3""",
    "emb_quantize" ->
      """WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
          FROM embeddings)
        SELECT vec_id, mx AS scale,
          array_to_string(list_transform(v, x ->
            CASE WHEN mx = 0 THEN 0
                 ELSE CAST(floor(x / mx * 127 + 0.5) AS BIGINT) END), ',') AS codes
        FROM e""",
    "emb_centroid" ->
      s"""WITH lang AS (
          SELECT doc_id, pred_lang FROM (${TextAnalysis.oracle("lang_id")})),
        q AS (
          SELECT l.pred_lang, CAST(p.dim AS INT) AS dim, p.q FROM (
            SELECT e.vec_id, unnest(list_transform(e.embedding,
              (x, i) -> struct_pack(dim := i - 1,
                q := CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))) AS p
            FROM embeddings e) e2
          JOIN lang l ON e2.vec_id = l.doc_id)
        SELECT pred_lang, dim, count(*) AS n,
          CAST(sum(q) AS DOUBLE) / count(*) / 1000000 AS mean_q
        FROM q GROUP BY pred_lang, dim""",
  )
}
