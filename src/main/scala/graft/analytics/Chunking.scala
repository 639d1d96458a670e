package graft.analytics

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document chunking + chunk-level corpus hygiene for LLM training-data
  * prep (north-star EXT surface): sliding-window chunking (the unit a
  * tokenizer/packing stage consumes), cross-document repeated-passage
  * detection (boilerplate at chunk granularity), and benchmark
  * contamination screening (n-gram overlap against a held-out eval set).
  *
  * Scale design: chunking is a per-row generator (sequence + posexplode
  * + slice — pure codegen'd expressions, no shuffle); chunk dedup
  * shuffles only 32-byte md5 keys, never chunk text; contamination
  * broadcast-joins the (small by construction) eval shingle set against
  * the corpus shingle stream, so the corpus side never shuffles at all.
  */
object Chunking {

  private val toks = split(col("text"), " ")

  /** Sliding-window chunks: starts at 1, 1+stride, ... while ≤ n_tokens
    * (the tail chunk may be shorter than `width`). One row per chunk
    * with its ordinal, token count, and content hash — the id a packing
    * or embedding stage keys on. */
  private[graft] def chunksOf(docs: DataFrame, width: Int,
      stride: Int): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(1), size(col("tk")), lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("tk"), col("start"), lit(width))).as("chunk_tokens"),
        md5(concat_ws(" ", slice(col("tk"), col("start"), lit(width))))
          .as("chunk_hash"))

  /** 32-token windows with 8-token overlap (stride 24) — the shape a
    * context-window packer consumes. */
  def textChunk(s: SparkSession, d: String): DataFrame =
    chunksOf(documents(s, d), width = 32, stride = 24)

  /** Cross-document repeated passages: non-overlapping 8-token chunks
    * that appear in more than one document — the chunk-granularity
    * boilerplate detector (doc-level dedup misses a shared paragraph
    * inside otherwise-distinct pages). Group key is the md5, so the
    * shuffle moves 32-byte hashes; countDistinct plans as a two-phase
    * partial aggregation. */
  def dedupChunks(s: SparkSession, d: String): DataFrame =
    chunksOf(documents(s, d), width = 8, stride = 8)
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") > 1)

  /** Benchmark-contamination screen: for every training document
    * (doc_id ≥ `evalMax`), the count of distinct 5-gram shingles it
    * shares with the held-out eval set (doc_id < `evalMax`). The eval
    * shingle set is small by construction → broadcast; the corpus
    * shingle stream left-joins it without shuffling and aggregates per
    * doc. This is the decontamination pass every eval-aware training
    * run needs (PaLM/GPT-style 8-gram screens are the same plan with a
    * different n). */
  def contamination(s: SparkSession, d: String, evalMax: Long = 25): DataFrame =
    contaminationOf(documents(s, d), evalMax)

  private[graft] def contaminationOf(docs: DataFrame, evalMax: Long): DataFrame = {
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .filter(size(toks) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.text.shingles(toks, 5)).as("shingle"))
      .distinct()
    val ev = sh.filter(col("doc_id") < evalMax)
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    sh.filter(col("doc_id") >= evalMax)
      .join(broadcast(ev), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contam_ratio"),
        // INT verdict, not BOOLEAN (driver-hash representation hazard)
        (col("n_shared") > 0).cast("int").as("contaminated"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * packs — the step between chunking and batch assembly. True
    * first-fit packing is inherently sequential; the distributed
    * spelling packs WITHIN each shard (source) by a running token sum
    * in deterministic doc_id order: pack = how many full budgets
    * precede the doc. One shuffle on the shard key; each shard's
    * window is independent, so the plan scales with shard count (a
    * global ORDER BY window would serialize into one task at 100 TB —
    * the per-shard partitionBy is the point). */
  def packSequences(s: SparkSession, d: String, budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, d)
      .select(col("doc_id"), col("source"), size(toks).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .selectExpr("doc_id", "source", "n_tokens",
        s"(cum - n_tokens) div $budget AS pack_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_chunk"    -> textChunk _,
    "dedup_chunks"  -> dedupChunks _,
    "contamination" -> ((s: SparkSession, d: String) => contamination(s, d)),
    "pack_sequences" -> ((s: SparkSession, d: String) => packSequences(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        SELECT doc_id, CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
          len(tk[start:start+31]) AS chunk_tokens,
          md5(array_to_string(tk[start:start+31], ' ')) AS chunk_hash
        FROM t, unnest(generate_series(1, len(tk), 24)) AS u(start)""",
    "dedup_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        ch AS (
          SELECT doc_id, md5(array_to_string(tk[start:start+7], ' ')) AS chunk_hash
          FROM t, unnest(generate_series(1, len(tk), 8)) AS u(start))
        SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1""",
    "contamination" ->
      """WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(string_split(text, ' ')) - 4),
            i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
          FROM documents WHERE len(string_split(text, ' ')) >= 5)),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25),
        tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 25)
        SELECT tr.doc_id, count(*) AS n_shingles, count(ev.shingle) AS n_shared,
          CAST(count(ev.shingle) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contam_ratio,
          (count(ev.shingle) > 0)::INT AS contaminated
        FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle
        GROUP BY tr.doc_id""",
    "pack_sequences" ->
      """SELECT doc_id, source, n_tokens,
          CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id
        FROM (
          SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
            sum(len(string_split(text, ' '))) OVER (PARTITION BY source
              ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents)""",
  )
}
