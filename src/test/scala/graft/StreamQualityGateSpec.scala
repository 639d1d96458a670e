package graft

import graft.analytics.{Curation, StreamingQueries, TextAnalysis}
import org.apache.spark.sql.functions._

/** The streaming gate must produce EXACTLY the batch gate stack's
  * numbers — the engine-side parity check next to the DuckDB oracle
  * (which pins the streaming path against independent SQL). */
class StreamQualityGateSpec extends SparkSpec {

  test("streaming per-source gate counts == batch gate stack") {
    val streamed = StreamingQueries.streamQualityGate(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (_, wsum) = Curation.trainQualityWeights(spark, sfDir)
    val scored = Curation.classifierScored(
      docs.select(col("doc_id"), col("source"), col("text")), wsum,
      carry = Seq("source", "text"))
    val batch = TextAnalysis.qualityGopherOf(scored,
        carry = Seq("source", "accept"))
      .groupBy(col("source")).agg(
        count(lit(1)), sum(col("gopher_keep")).cast("long"),
        sum(col("accept")).cast("long"),
        sum(col("gopher_keep") * col("accept")).cast("long"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // both gates fire somewhere at this SF
    assert(streamed.values.map(_._2).sum > 0)
    assert(streamed.values.map(_._3).sum > 0)
  }
}
