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

  /** IVF-style ANN: coarse-quantize the corpus to `nlist` centroid
    * cells (deterministic centroids: the first `nlist` vectors), probe
    * the `nprobe` nearest cells per query, exact-rerank inside them.
    * Approximate ⇒ no SQL oracle; recall is spec-tested against
    * simKnn. */
  def simAnnIvf(s: SparkSession, d: String, nlist: Int = 16,
      nprobe: Int = 4, k: Int = 10): DataFrame = {
    // corpus feeds centroid selection, assignment, and the query side
    val e = corpus(s, d).persist()
    val cents = e.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))

    // assign every corpus vector to its nearest centroid (broadcast join)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val assigned = e.join(broadcast(cents), lit(true))
      .withColumn("csim", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("cell"))

    // probe lists: nprobe nearest cells per query vector
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cent_id"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("csim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cent_id").as("cell"))

    // exact rerank inside probed cells only
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn" -> simKnn _,
    "sim_ann_ivf" -> ((s: SparkSession, d: String) => simAnnIvf(s, d)),
  )

  val oracle: Map[String, String] = Map(
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
    // sim_ann_ivf: approximate by design — no oracle (rows-only check);
    // recall vs sim_knn is asserted in AnalyticsSpec.
  )
}
