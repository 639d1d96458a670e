package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is an operator/query from SURVEY.md §2; the
  * matching `oracleSql` is ANSI SQL that DuckDB runs over the same
  * parquet tables for a hash-compare. Column names/aliases match
  * exactly on both sides (the driver sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The pipeline's defining computation: validate → reject
    * with machine-readable reasons (SURVEY.md §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    analytics.EventsPipeline.splitInvalid(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Relational.queries ++
      analytics.EventsPipeline.queries ++
      analytics.TextAnalysis.queries ++
      analytics.Dedup.queries ++
      analytics.Similarity.queries ++
      analytics.Multimodal.queries ++
      analytics.StreamingQueries.queries ++
      analytics.Curation.queries ++
      analytics.CorpusBuild.queries ++
      analytics.IncrementalBuild.queries ++
      analytics.MixtureOptimize.queries ++
      analytics.DocEmbed.queries ++
      analytics.ReleaseComputed.queries ++
      analytics.Chunking.queries ++
      analytics.Bpe.queries ++
      analytics.BpeBytes.queries ++
      analytics.Unigram.queries ++
      analytics.License.queries ++
      analytics.TokenizerEval.queries ++
      analytics.Stats.queries ++
      analytics.Geo.queries ++
      analytics.Web.queries ++
      analytics.Codecs.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.Relational.oracle ++
      analytics.EventsPipeline.oracle ++
      analytics.TextAnalysis.oracle ++
      analytics.Dedup.oracle ++
      analytics.Similarity.oracle ++
      analytics.Multimodal.oracle ++
      analytics.StreamingQueries.oracle ++
      analytics.Curation.oracle ++
      analytics.CorpusBuild.oracle ++
      analytics.IncrementalBuild.oracle ++
      analytics.MixtureOptimize.oracle ++
      analytics.DocEmbed.oracle ++
      analytics.ReleaseComputed.oracle ++
      analytics.Chunking.oracle ++
      analytics.Bpe.oracle ++
      analytics.BpeBytes.oracle ++
      analytics.Unigram.oracle ++
      analytics.License.oracle ++
      analytics.TokenizerEval.oracle ++
      analytics.Stats.oracle ++
      analytics.Geo.oracle ++
      analytics.Web.oracle ++
      analytics.Codecs.oracle
}
