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

  test("windowed append gate: emit-once across real micro-batch " +
      "boundaries, trailing window withheld") {
    // count DATA micro-batches via the listener bus while the query
    // runs (the stream_observe discipline — recentProgress is a capped
    // ring buffer)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0L) batches.incrementAndGet()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val rows =
      try StreamingQueries.streamQualityWindowed(spark, sfDir).collect()
      finally spark.streams.removeListener(listener)
    // the 4-file time-ordered source really ran as 4 data batches —
    // windows closed while later batches were still arriving
    assert(batches.get() === 4, "expected one data batch per file")
    // EMIT-ONCE: an append-only sink must never see a (window, source)
    // key twice — a re-emitted window would duplicate here
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.length === keys.distinct.length)
    assert(rows.nonEmpty)
    // the cutoff: every emitted window END precedes the final
    // watermark (max event time − 10 min), and the trailing open
    // window is withheld
    val maxId = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)
    val wmUs = (maxId + 1) * 10000000L - 600000000L
    rows.foreach(r => assert(r.getLong(0) + 3600000000L <= wmUs))
    val lastWinUs = ((maxId + 1) * 10 / 3600) * 3600000000L
    assert(!rows.exists(_.getLong(0) == lastWinUs),
      "the open trailing window must be withheld in append mode")
    // and the emitted windows partition the gated corpus exactly: the
    // per-window sums re-derive from the batch gate stack
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (_, wsum) = Curation.trainQualityWeights(spark, sfDir)
    val scored = Curation.classifierScored(
      docs.select(col("doc_id"), col("source"), col("text")), wsum,
      carry = Seq("source", "text"))
    val expected = TextAnalysis.qualityGopherOf(scored,
        carry = Seq("source", "accept"))
      .withColumn("win_us",
        expr("((doc_id + 1) * 10) div 3600 * 3600000000"))
      .filter(col("win_us") + 3600000000L <= wmUs)
      .groupBy(col("win_us"), col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("gopher_keep")).cast("long").as("n_gopher"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val got = rows.map(r => (r.getLong(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }
}
