package graft.analytics

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Declared queries whose results are produced by an ACTUAL
  * StreamingQuery — file source over the events parquet, AvailableNow
  * trigger, memory sink — then hash-checked against the DuckDB oracle
  * like any batch query. This closes the gap between "the streaming
  * logic is batch-oracled" (win_hourly) and "the streaming execution
  * path itself produces oracle-correct results" (T1/T6, SURVEY.md
  * §2.8).
  *
  * Scale notes: both aggregations keep state keyed by (window, type) /
  * (user, session) — bounded by key cardinality, not input size; with a
  * watermark in a live deployment, state is evicted as event time
  * advances. AvailableNow + memory sink is the test harness spelling;
  * a production run would write each epoch to a transactional sink.
  */
/** transformWithState processor: per-key (event_type) running count +
  * exact cent sum in a typed ValueState. State survives across
  * micro-batches; emits the running totals once per batch per key. */
class TypeAggProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long), (String, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var (n, sum) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { r => n += 1; sum += r._2 }
    st.update((n, sum))
    Iterator.single((key, n, sum))
  }
}

/** transformWithState processor exercising STATE TTL (r9) — the
  * state-growth bound a 100-TB streaming job actually relies on: at
  * that scale "state per key, forever" is the memory leak, and
  * `TTLConfig(Duration)` is the engine-level expiry that caps it
  * without hand-written timer bookkeeping. Two counters per key
  * side-by-side: `recent` carries the TTL, `total` is the
  * TTLConfig.NONE CONTROL — after an idle gap longer than the TTL the
  * recent counter restarts at the new batch's count while the control
  * keeps the lifetime total, so the spec's expiry assertion cannot be
  * satisfied by state being lost for any other reason (that would
  * reset BOTH). ProcessingTime mode: TTL expiry is wall-clock by
  * definition. */
class TtlCountProcessor(ttl: java.time.Duration)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var recent: ValueState[Long] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit = {
    recent = getHandle.getValueState[Long]("recent",
      Encoders.scalaLong, new TTLConfig(ttl))
    total = getHandle.getValueState[Long]("total",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val n = rows.size.toLong
    val r = (if (recent.exists()) recent.get() else 0L) + n
    val t = (if (total.exists()) total.get() else 0L) + n
    recent.update(r)
    total.update(t)
    Iterator.single((key, r, t))
  }
}

/** transformWithState processor WITH EVENT-TIME TIMERS: per-user
  * sessionization where closed sessions emit inline (gap detected
  * within the sorted batch buffer) and each user's OPEN session is
  * closed by a timer when the watermark passes its gap horizon — the
  * state-v2 pattern for "emit when the key goes quiet", which no
  * aggregation spelling expresses. State is one (start, end, n) triple
  * per user; exactly one timer per key is live at a time (the previous
  * one is deleted before re-registering). */
class SessionTimerProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def timerMsFor(endUs: Long): Long = (endUs + gapUs) / 1000

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val tss = rows.map(_._2).toArray.sorted
    var out = List.empty[(Long, Long, Long, Long)]
    var (start, end, n) =
      if (st.exists()) st.get() else (tss.head, tss.head, 0L)
    if (st.exists()) getHandle.deleteTimer(timerMsFor(end))
    tss.foreach { t =>
      if (n > 0 && t - end > gapUs) {
        out ::= (key, start, end, n)
        start = t; end = t; n = 1L
      } else { end = t; n += 1 }
    }
    st.update((start, end, n))
    getHandle.registerTimer(timerMsFor(end))
    out.reverseIterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    if (!st.exists()) Iterator.empty
    else {
      val (start, end, n) = st.get()
      st.clear()
      Iterator.single((key, start, end, n))
    }
  }
}

/** TypeAggProcessor variant that accepts INITIAL STATE — the
  * batch-bootstrap pattern: a backfill job computes per-key totals
  * once, the streaming job seeds its state from them and continues
  * incrementally. handleInitialState runs once per seeded key before
  * any input batch. */
class TypeAggInitProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      String, (String, Long), (String, Long, Long), (Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInitialState(key: String, initial: (Long, Long),
      timerValues: TimerValues): Unit =
    st.update(initial)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var (n, sum) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { r => n += 1; sum += r._2 }
    st.update((n, sum))
    Iterator.single((key, n, sum))
  }
}

/** transformWithState processor over a MAP state primitive: per-user
  * map of event_type → (count, exact cent sum). One map state per key
  * replaces type-count distinct ValueStates; emission is one row per
  * (user, type) per batch the pair was touched in — the per-key
  * sub-keyed rollup (feature-store per-entity counters) that a flat
  * keyed aggregation can't keep in one state row. */
class UserTypeMapProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String, Long), (Long, String, Long, Long)] {
  import org.apache.spark.sql.streaming.{MapState, OutputMode => OM, TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.Encoders

  @transient private var st: MapState[String, (Long, Long)] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[String, (Long, Long)]("per_type",
      Encoders.STRING,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { case (_, tpe, cents) =>
      val (n, sum) =
        if (st.containsKey(tpe)) st.getValue(tpe) else (0L, 0L)
      st.updateValue(tpe, (n + 1, sum + cents))
      touched += tpe
    }
    touched.iterator.map { tpe =>
      val (n, sum) = st.getValue(tpe)
      (key, tpe, n, sum)
    }
  }
}

/** transformWithState processor over a LIST state primitive: per-user
  * bounded recent-history buffer (last `maxN` cent values in event-time
  * order) — the online-feature buffer (recent purchases, recent
  * prompts) every serving pipeline keeps. The buffer is merged with
  * each batch's sorted rows and re-trimmed, so state is O(maxN) per
  * key forever. */
class RecentListProcessor(maxN: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long), (Long, String)] {
  import org.apache.spark.sql.streaming.{ListState, OutputMode => OM, TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.Encoders

  @transient private var st: ListState[(Long, Long)] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getListState[(Long, Long)]("recent",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, String)] = {
    val prev = if (st.exists()) st.get().toArray else Array.empty[(Long, Long)]
    val merged = (prev ++ rows.map(r => (r._2, r._3))).sorted
    val trimmed = merged.takeRight(maxN)
    st.put(trimmed)
    Iterator.single((key, trimmed.map(_._2).mkString(",")))
  }
}

object StreamingQueries {

  /** Streamed clone of Tables.events: same schema-adaptive `ts`/`ts_ns`
    * normalization (nanos-long or timestamp[us] encodings), but through
    * the file STREAM source. */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the source path must be a DIRECTORY; the glob filter narrows the
    // listing to the events table inside the shared sf dir
    graft.Tables.withEventTime(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d))
  }

  /** Run a streaming aggregation to completion via a uniquely-named
    * memory sink, COPY the final result out, and drop the sink's temp
    * view — otherwise every invocation retains its full result set in
    * driver memory for the session lifetime (Bench runs each streaming
    * query twice per pass). */
  private def runToMemory(s: SparkSession, df: DataFrame,
      mode: OutputMode, stateKeys: Long = 0L): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // state-store parallelism is pinned per-checkpoint at query start:
    // at test SF, 32 shuffle partitions mean 32 state-store tasks per
    // stateful operator PER MICRO-BATCH (task overhead dominates the
    // multi-batch queries). 8 is right-sized for the bounded-key
    // aggregations; queries whose keyed state is INPUT-sized (replay
    // dedup holds one key per event) pass their key estimate and get
    // Sizing-derived parallelism — at 100k keys the 8-partition state
    // commit was the measured batch bottleneck (0.45 s of a 0.7 s
    // batch), exactly the "size to state volume" rule this comment
    // always promised.
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      Sizing.statePartitions(stateKeys,
        s.sparkContext.defaultParallelism).toString)
    val q =
      try df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    // the finally block must run even when the query FAILS — otherwise
    // the sink's temp view (and its retained rows) leak for the session
    // lifetime and the stopped-query check below never happens
    try {
      // bounded wait: a wedged micro-batch (hung executor, sink fault)
      // fails loudly instead of hanging the whole bench/test harness
      require(q.awaitTermination(StreamTimeoutMs),
        s"streaming query $name still running after ${StreamTimeoutMs} ms")
      if (sys.env.contains("SPARK_GRAFT_STREAM_PROF"))
        q.recentProgress.foreach { pr =>
          System.err.println(s"[stream-prof] batch=${pr.batchId} " +
            s"rows=${pr.numInputRows} total=${pr.batchDuration}ms " +
            s"addBatch=${pr.durationMs.get("addBatch")} " +
            s"getBatch=${pr.durationMs.get("getBatch")} " +
            s"latestOffset=${pr.durationMs.get("latestOffset")} " +
            s"queryPlanning=${pr.durationMs.get("queryPlanning")} " +
            s"commitOffsets=${pr.durationMs.get("commitOffsets")} " +
            s"walCommit=${pr.durationMs.get("walCommit")} " +
            s"stateCommit=${Option(pr.stateOperators).map(_.map(o => o.commitTimeMs).sum)}")
        }
      val sink = s.table(name)
      s.createDataFrame(sink.collectAsList(), sink.schema)
    } finally {
      if (q.isActive) q.stop()
      s.catalog.dropTempView(name)
    }
  }

  /** Generous bound for AvailableNow queries that finish in seconds at
    * any test SF — awaitTermination without a timeout turns any wedged
    * batch into a harness hang (ADVICE r10). */
  private val StreamTimeoutMs = 600000L

  /** The 30-minute-gap session aggregation both session queries share. */
  private def sessionAgg(src: DataFrame): DataFrame =
    src
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("session_value"))

  /** The windowed-counts aggregation (StreamingPipeline.windowedCounts)
    * executed by a real StreamingQuery; oracle = the same date_trunc
    * aggregation that checks win_hourly. */
  def streamHourly(s: SparkSession, d: String): DataFrame =
    runToMemory(s,
      StreamingPipeline.windowedCounts(eventsStream(s, d)),
      OutputMode.Complete())

  /** Streaming Avro payload codec (r9) — the pair's real production
    * home: a Kafka consumer decoding per-record Avro datums. The
    * events stream is serialized row-by-row with [[graft.functions
    * .AvroFunctions.toAvro]] (the producer side), leaving ONLY the
    * binary payload column (as a Kafka `value` would arrive), then
    * decoded back with `fromAvro` and rolled up — executed by a real
    * StreamingQuery, so the expressions run inside streaming
    * micro-batch plans, not just batch codegen. The oracle is the
    * same arithmetic datum-layout replay as `avro_functions` (zigzag
    * varint width + utf8 length + fixed double), so the streamed
    * encoding is oracled byte-count-exactly. */
  def streamAvro(s: SparkSession, d: String): DataFrame = {
    import graft.functions.AvroFunctions.{fromAvro, toAvro}
    val schema = EventsPipeline.avroRecordSchema
    val payloads = eventsStream(s, d).select(
      toAvro(struct(col("event_id"), col("event_type"), col("value")),
        schema).as("payload"))
    val decoded = payloads.select(
      fromAvro(col("payload"), schema).as("r"),
      length(col("payload")).cast("long").as("nbytes"))
    runToMemory(s,
      decoded.groupBy(col("r.event_type").as("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(graft.Tables.dec2(col("r.value"))).cast("double").as("sum_value"),
          sum(col("nbytes")).as("sum_avro_bytes")),
      OutputMode.Complete())
  }

  /** Streaming observe() (r10) — the monitoring surface a production
    * streaming pipeline actually runs on: `df.observe` metrics arrive
    * per MICRO-BATCH in each QueryProgressEvent's `observedMetrics`,
    * and operator totals are the across-batch fold of the per-batch
    * rows (counts and DECIMAL sums add; min/max compose) — no second
    * pass over the stream, one accumulator update per row. The events
    * table is re-written as 4 files and streamed with
    * maxFilesPerTrigger=1 so the cross-batch fold is REAL (4 data
    * batches, pinned by the n_batches column); rows pass through the
    * SAME validation chain as the batch pipeline (withKOf +
    * Validator.validate) below the observe node, and the folded frame
    * must equal the corpus-total SQL — so streaming metric collection
    * is oracled against the same arithmetic as batch observe_metrics.
    * The DECIMAL sum is folded exactly across batches and cast to
    * double once at the edge (a per-batch double fold would be
    * batch-order-dependent).
    *
    * The fold reads a [[StreamingQueryListener]], NOT
    * `q.recentProgress` (the r10 spelling): recentProgress is a ring
    * buffer capped at `spark.sql.streaming.numRecentProgressUpdates`
    * (default 100), so a corpus arriving as >100 micro-batches would
    * silently DROP the earliest metric rows from a post-hoc read — the
    * listener accumulates each batch's row as its event arrives and is
    * exact at any batch count. StreamingSpec proves the difference by
    * running this query under numRecentProgressUpdates=2 over the
    * 4-batch corpus. */
  def streamObserve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = multiFileEventsStream(s, d, 4, "stream_observe_src", lit(true))
    val valid = graft.rules.Validator
      .validate(EventsPipeline.withKOf(src), EventsPipeline.rules)
      .filter(col("is_valid") === true)
    val observed = valid.observe("gate",
      count(lit(1)).as("n_valid"),
      sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
      max(col("value")).as("max_value"),
      min(col("k")).as("min_k"),
      max(col("k")).as("max_k"))
    // per-batch progress rows accumulate as events arrive; keyed by
    // query id so a concurrent stream's events can't bleed in. The
    // listener buffer holds one small Row per DATA batch — bounded by
    // batch count, not input size, and exact past the ring-buffer cap.
    val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val done = new java.util.concurrent.CountDownLatch(1)
    // the query is identified by a pre-chosen unique NAME, captured as
    // an id in onQueryStarted — matching on a post-start() q.id would
    // race the first progress event; all three callbacks run on the
    // one listener thread in event order, so qid is always set before
    // any progress event is examined
    val qname = "graft_observe_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      private var qid: java.util.UUID = null
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        if (e.name == qname) qid = e.id
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.id == qid && e.progress.numInputRows > 0L)
          Option(e.progress.observedMetrics.get("gate"))
            .foreach(r => acc.synchronized { acc += r })
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == qid) done.countDown()
    }
    s.streams.addListener(listener)
    // the zero-copy noop sink (the batch observe_metrics pattern): the
    // metrics live in the progress events, so buffering the full valid
    // split in a memory sink would be pure driver-heap waste — and a
    // driver OOM as SF grows
    val data =
      try {
        val q = observed.writeStream.format("noop")
          .queryName(qname)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .start()
        try {
          // bounded wait: a wedged batch fails loudly instead of
          // hanging the whole bench/test harness (ADVICE r10)
          require(q.awaitTermination(StreamTimeoutMs),
            s"stream_observe: query still running after ${StreamTimeoutMs} ms")
        } finally if (q.isActive) q.stop()
        // listener delivery is async but IN ORDER per query — the
        // terminated event lands after every progress event, so waiting
        // for it (not a sleep) makes the accumulator read race-free
        require(done.await(StreamTimeoutMs,
          java.util.concurrent.TimeUnit.MILLISECONDS),
          "stream_observe: listener bus did not drain")
        acc.synchronized { acc.toSeq }
      } finally s.streams.removeListener(listener)
    // a DATA batch is one that consumed input rows (the listener
    // filters on numInputRows > 0) — batches whose rows ALL failed
    // validation still count (they carried input and their metrics row
    // contributes n_valid = 0 with null min/max), so n_batches pins
    // the 4-file construction regardless of where the invalid rows land
    val nonEmpty = data.filter(_.getLong(0) > 0L)
    require(nonEmpty.nonEmpty, "stream_observe: no valid rows observed")
    val nBatches = data.size.toLong
    val nValid = data.map(_.getLong(0)).sum
    val sumDec = nonEmpty.map(r => BigDecimal(r.getDecimal(1))).sum
    val maxV = nonEmpty.map(_.getDouble(2)).max
    val minK = nonEmpty.map(_.getInt(3)).min
    val maxK = nonEmpty.map(_.getInt(4)).max
    Seq((nBatches, nValid, sumDec.toDouble, maxV, minK, maxK))
      .toDF("n_batches", "n_valid", "sum_value", "max_value",
        "min_k", "max_k")
  }

  /** session_window (native streaming sessionization) parity with the
    * batch lag/running-sum spelling in Relational.winSession: 30-minute
    * gap sessions per user, executed by a real StreamingQuery. Output
    * uses the session START (µs) as the session key — the
    * representation both engines agree on. */
  def streamSession(s: SparkSession, d: String): DataFrame =
    runToMemory(s, sessionAgg(eventsStream(s, d)), OutputMode.Complete())

  /** Cross-micro-batch stateful merging: the events table is re-written
    * as 4 parquet files into a per-invocation temp dir and streamed with
    * maxFilesPerTrigger=1, so the session aggregation runs over FOUR
    * micro-batches whose per-user sessions must merge in the state
    * store — the part of streaming sessionization a single-batch run
    * never exercises. Input is quartered (user_id % 4 = 0) to keep the
    * 4-epoch run cheap; the oracle applies the same filter. */
  /** Rewrite the (filtered) events table as `nFiles` parquet files in
    * a temp dir and stream them with maxFilesPerTrigger=1 — the
    * multi-micro-batch source construction shared by
    * streamSessionMultiBatch and streamObserve. The schema comes from
    * the pre-write frame (identical to what is written), avoiding a
    * redundant post-write listing + footer read. */
  private def multiFileEventsStream(s: SparkSession, d: String,
      nFiles: Int, prefix: String,
      rowFilter: org.apache.spark.sql.Column): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tmp = graft.Tables.tempOutDir(prefix)
    val base = s.read.parquet(s"$d/events.parquet").filter(rowFilter)
    base.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    s.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
  }

  def streamSessionMultiBatch(s: SparkSession, d: String): DataFrame = {
    val src = graft.Tables.withEventTime(
      multiFileEventsStream(s, d, 4, "stream_src", col("user_id") % 4 === 0))
    runToMemory(s, sessionAgg(src), OutputMode.Complete())
  }

  /** APPEND-mode watermark semantics, executed end-to-end: the same
    * hourly aggregation as stream_hourly, but each window is emitted
    * exactly once — when the 10-minute watermark passes its end — and
    * the trailing windows the watermark never clears are withheld.
    * AvailableNow runs the data batch, advances the watermark to
    * max(event time) − 10 min, and the closing no-data batch flushes
    * every closed window; the oracle applies the identical cutoff in
    * SQL. This is the production streaming contract (emit-once to an
    * append-only sink); Complete mode re-emitting the world each epoch
    * is the test-harness spelling. */
  /** Union of TWO independent file-stream sources feeding one windowed
    * aggregation — the multi-source ingestion shape (N kafka topics /
    * N landing dirs merging into one table). Each source tracks its own
    * offsets in the checkpoint and the operator watermark is the MIN
    * across sources, so one lagging source holds back state eviction
    * for all — exactly the production behavior worth pinning. The
    * events table is split by user parity into two temp dirs; the
    * unioned result must equal the single-source aggregation, which is
    * what the oracle (same SQL as stream_hourly) checks. */
  def streamUnion(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = s.read.parquet(s"$d/events.parquet")
    val dirs = Seq(0, 1).map { par =>
      val tmp = graft.Tables.tempOutDir(s"stream_union_$par")
      ev.filter(col("user_id") % 2 === par)
        .write.mode("overwrite").parquet(tmp)
      tmp
    }
    val schema = s.read.parquet(dirs.head).schema
    def src(p: String): DataFrame = graft.Tables.withEventTime(
      s.readStream.schema(schema).parquet(p))
    runToMemory(s,
      StreamingPipeline.windowedCounts(src(dirs(0)).unionByName(src(dirs(1)))),
      OutputMode.Complete())
  }

  def streamAppend(s: SparkSession, d: String): DataFrame =
    runToMemory(s,
      StreamingPipeline.windowedCounts(eventsStream(s, d)),
      OutputMode.Append())

  /** Session windows under APPEND mode — the emit-once contract for
    * sessions: a session is emitted only when the watermark passes its
    * end (last event + 30-min gap), i.e. once no late event could
    * still extend or merge it. Sessions whose close isn't final at the
    * last watermark (max event time − 10 min) are withheld — the
    * streaming-correctness edge Complete mode never exercises. The
    * oracle sessionizes in SQL and applies the identical cutoff. */
  def streamSessionAppend(s: SparkSession, d: String): DataFrame =
    runToMemory(s,
      eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          col("n_events")),
      OutputMode.Append())

  /** Streaming deduplication — the at-least-once → exactly-once
    * upgrade: the source is written TWICE (two identical files, i.e. a
    * full replay, the failure mode of every at-least-once bus) and
    * streamed one file per micro-batch; dropDuplicatesWithinWatermark
    * on event_id suppresses every replayed row — batch 2's copies are
    * either matched in the dedup state or dropped as older than the
    * advanced watermark. State is bounded by the watermark horizon
    * (keys older than max event time − delay are evicted), which is
    * what makes this runnable forever at 100 TB/day, unlike plain
    * dropDuplicates whose state only grows. */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = s.read.parquet(s"$d/events.parquet")
    // ONE write job for both copies (r16): the replay copy is a
    // unioned duplicate written under a partition column, and the two
    // files are MOVED into the source dir with explicitly pinned
    // mtimes — strictly stronger than the old two-sequential-jobs
    // spelling, which relied on job-commit order for file ordering
    val parts = graft.Tables.tempOutDir("stream_dup_parts")
    ev.withColumn("c", lit(0)).unionByName(ev.withColumn("c", lit(1)))
      .coalesce(1).write.partitionBy("c").parquet(parts)
    val tmp = graft.Tables.tempOutDir("stream_dup_src")
    val tmpDir = new java.io.File(tmp)
    require(tmpDir.mkdirs() || tmpDir.isDirectory, s"cannot create $tmp")
    (0 until 2).foreach { i =>
      val fs = Option(new java.io.File(s"$parts/c=$i").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
      require(fs.length == 1,
        s"expected one parquet file for copy $i, got ${fs.length}")
      val dst = new java.io.File(tmpDir, s"copy-$i.parquet")
      java.nio.file.Files.move(fs(0).toPath, dst.toPath)
      val want = 1000000000000L + i * 60000L
      dst.setLastModified(want)
      require(dst.lastModified == want,
        s"could not pin ${dst.getName} to mtime $want; the " +
          "FileStreamSource ordering invariant would be tie-break luck")
    }
    val schema = s.read.parquet(tmp).schema
    val src = graft.Tables.withEventTime(
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp))
    val deduped = src
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"), col("value"))
    // dedup state holds one key per event — input-sized, so state
    // parallelism derives from the event count (a parquet metadata
    // count), not the bounded-key default
    runToMemory(s, deduped, OutputMode.Append(), stateKeys = ev.count())
  }

  /** ARBITRARY custom state (flatMapGroupsWithState) through a real
    * StreamingQuery — the tier beyond built-in stateful operators
    * (T6): per-user event count, largest inter-event gap, and
    * 30-minute-gap session count, computed by a hand-written state
    * function over each user's timeline. The group's timestamps are
    * sorted in memory — bounded by events-per-user (the per-group
    * contract of this API), not by input size; state (running count)
    * is exercised through GroupState. Consecutive-difference facts are
    * sort-stable under timestamp ties, so the result is deterministic
    * and carries a full SQL oracle — unlike the usual
    * "custom state ⇒ spec-only" cop-out. */
  def streamStateful(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val src = eventsStream(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("tus"))
      .as[(Long, Long)]
    val stats = src.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val ts = rows.map(_._2).toArray
          java.util.Arrays.sort(ts)
          var maxGap = 0L
          var sessions = 1L
          var i = 1
          while (i < ts.length) {
            val g = ts(i) - ts(i - 1)
            if (g > maxGap) maxGap = g
            if (g > 1800000000L) sessions += 1
            i += 1
          }
          state.update(state.getOption.getOrElse(0L) + ts.length)
          Iterator((uid, ts.length.toLong, maxGap, sessions))
      }
    runToMemory(s,
      stats.toDF("user_id", "n_events", "max_gap_us", "n_sessions"),
      OutputMode.Append())
  }

  /** Spark 4's transformWithState — the successor arbitrary-state API
    * (typed ValueState handles, TimeMode, RocksDB-backed state store):
    * per-event-type running count + EXACT cent sum accumulated in a
    * ValueState and emitted once per batch. Runs on the production
    * state backend (RocksDBStateStoreProvider — changelog-checkpointed,
    * spill-to-disk state at 100 TB, vs the default in-memory HDFS
    * provider); the oracle is the plain grouped aggregate. */
  def streamTws(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = eventsStream(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[(String, Long)]
      val out = src.groupByKey(_._1)
        .transformWithState(new TypeAggProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      runToMemory(s, out.toDF("event_type", "n_events", "sum_cents"),
        OutputMode.Append())
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** transformWithState with EVENT-TIME TIMERS — the "emit when the
    * key goes quiet" pattern: per-user sessions close either inline
    * (next event arrives past the gap) or via a registered timer when
    * the watermark passes end+gap. The final no-data batch advances
    * the watermark to max(event time) − 10 min and fires exactly the
    * timers at or below it; each user's trailing open session inside
    * the horizon is withheld — the oracle applies the identical
    * cutoff. Runs on RocksDB (transformWithState's required state
    * backend). */
  def streamTimers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val gapUs = 30L * 60 * 1000000
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = eventsStream(s, d)
        .filter(col("user_id").isNotNull)
        .withWatermark("ts", "10 minutes")
        .select(col("user_id"), expr("ts_ns div 1000").as("tus"))
        .as[(Long, Long)]
      val out = src.groupByKey(_._1)
        .transformWithState(new SessionTimerProcessor(gapUs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
      runToMemory(s, out.toDF("user_id", "start_us", "end_us", "n_events"),
        OutputMode.Append())
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** transformWithState over a MapState — per-user map of event_type →
    * (count, exact cent sum), emitted once per touched pair per batch.
    * With AvailableNow's single data batch the emission IS the final
    * rollup, so the oracle is the plain (user, type) grouped aggregate;
    * the spec exercises the cross-batch accumulation path. */
  def streamMapState(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = eventsStream(s, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull &&
          !isnan(col("value")))
        .select(col("user_id"), col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[(Long, String, Long)]
      val out = src.groupByKey(_._1)
        .transformWithState(new UserTypeMapProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      runToMemory(s, out.toDF("user_id", "event_type", "n_events", "sum_cents"),
        OutputMode.Append())
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** transformWithState with INITIAL STATE — backfill + streaming
    * continuation: the per-type totals of the EVEN-id half are computed
    * by a plain batch aggregation and seeded into the processor's
    * state; the stream then delivers only the ODD-id half. The final
    * emission must equal the full-table aggregate — the invariant that
    * makes a batch-bootstrap migration safe (no double counting, no
    * gap). Oracle = the whole-table grouped aggregate. */
  def streamInitState(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val initState = graft.Tables.events(s, d)
        .filter(col("event_id") % 2 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
      val src = eventsStream(s, d)
        .filter(col("event_id") % 2 === 1)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[(String, Long)]
      val out = src.groupByKey(_._1)
        .transformWithState(new TypeAggInitProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append(), initState)
      runToMemory(s, out.toDF("event_type", "n_events", "sum_cents"),
        OutputMode.Append())
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** transformWithState over a ListState — each user's last-5 cent
    * values in event-time order (the bounded online-feature buffer).
    * With the single AvailableNow batch the emission IS the final
    * buffer, so the oracle is a per-user top-5-by-time rollup. */
  def streamListState(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = eventsStream(s, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull &&
          !isnan(col("value")))
        .select(col("user_id"), expr("ts_ns div 1000").as("tus"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[(Long, Long, Long)]
      val out = src.groupByKey(_._1)
        .transformWithState(new RecentListProcessor(5),
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      runToMemory(s, out.toDF("user_id", "recent"), OutputMode.Append())
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Stream–static join: the streaming side enriches against a batch
    * dimension (here a per-user cohort table built from the same
    * parquet). Stateless — each micro-batch joins against the static
    * relation as-of that batch; the planner broadcasts the small dim
    * exactly as in batch. */
  def streamStaticJoin(s: SparkSession, d: String): DataFrame = {
    val dim = graft.Tables.events(s, d)
      .select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(8)))
    val joined = eventsStream(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .join(dim, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("cohort"))
    runToMemory(s, joined, OutputMode.Append())
  }

  /** Stream–stream time-interval join: each click pairs with the SAME
    * user's purchases in the following 30 minutes — attribution as a
    * streaming join. Both sides carry watermarks (what bounds the join
    * state buffer in a live run: a click older than max event time −
    * 1 h can never match a new purchase and is evicted); the interval
    * condition turns the state lookup into a per-user time-range scan.
    * Exact µs timestamps make the pair set deterministic. */
  def streamStreamJoin(s: SparkSession, d: String): DataFrame = {
    val clicks = eventsStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""))
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
    // dual-side join state is input-sized (every in-horizon row of
    // both sides) — derive state parallelism from the event count
    runToMemory(s, joined, OutputMode.Append(),
      stateKeys = s.read.parquet(s"$d/events.parquet").count())
  }

  /** LEFT-OUTER stream-stream join — the append-mode semantics the
    * inner variant above cannot show: matches emit as they arrive, but
    * an UNMATCHED click may only emit null-extended once the watermark
    * PROVES no purchase can still land inside its 30-minute window
    * (emitting earlier would be wrong, never emitting would lose the
    * row — the exact bug class outer stream joins exist to prevent).
    * Under AvailableNow the final no-data batch advances the global
    * watermark to min(per-side max event time) − 1 h and flushes
    * exactly the expired unmatched clicks; younger unmatched clicks
    * stay withheld. The oracle applies the identical cutoff, so the
    * emit-once boundary itself is hash-checked. */
  def streamJoinLeft(s: SparkSession, d: String): DataFrame = {
    val clicks = eventsStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""),
      "left_outer")
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
    // dual-side join state is input-sized — see streamStreamJoin
    runToMemory(s, joined, OutputMode.Append(),
      stateKeys = s.read.parquet(s"$d/events.parquet").count())
  }

  /** FULL-OUTER stream-stream join — the asymmetric-expiry case: the
    * two sides evict on DIFFERENT bounds derived from the same time
    * condition. A click can match purchases in (c_ts, c_ts+30m], so
    * its state closes at wm − 30 min ON CLICK TIME (like the left
    * join); a purchase can only be matched by clicks in
    * [p_ts−30m, p_ts), all of which have already arrived once the
    * watermark reaches p_ts, so its state closes at wm ON PURCHASE
    * TIME. The oracle spells both bounds; a hash match pins the
    * per-side eviction math, not just the join condition. */
  def streamJoinFull(s: SparkSession, d: String): DataFrame = {
    val clicks = eventsStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""),
      "full_outer")
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
    // dual-side join state is input-sized — see streamStreamJoin
    runToMemory(s, joined, OutputMode.Append(),
      stateKeys = s.read.parquet(s"$d/events.parquet").count())
  }

  /** The custom DSv2 connector's STREAMING face (graft.sources
    * .SeqSource as a MicroBatchStream): 50k deterministic rows admitted
    * 16384 per micro-batch (4 batches under AvailableNow — admission
    * control + the pinned target offset, not a single drain), rolled up
    * per bucket in Complete mode, and hash-checked against a DuckDB
    * re-computation of the full range. StreamingSpec separately pins
    * that >1 micro-batch actually ran. */
  def streamDsv2(s: SparkSession, d: String): DataFrame =
    runToMemory(s,
      s.readStream.format("graft.sources.SeqSource")
        .option("rows", 50000).option("parts", 4)
        .option("batchRows", 16384).load()
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("mval")).as("sum_mval")),
      OutputMode.Complete())

  /** Streaming near-duplicate CANONICALIZATION at ingest — the
    * fingerprint-level upgrade of `stream_dedup` (which suppresses
    * exact replays by event_id): documents arrive on a synthetic
    * 1-doc-per-10-seconds clock, the 16-bit SimHash fingerprint is
    * computed SCAN-SIDE inside the micro-batch (the same per-row
    * expression batch `dedup_simhash` uses), and a windowed
    * (hour, fingerprint) aggregation emits each fingerprint's
    * canonical (min) doc id, latest member, and member count ONCE —
    * when the watermark passes the window end. This is dedup-before-
    * landing: at 100 TB/day the curation stack's fingerprint pass runs
    * in-flight and the lake only stores one copy per fingerprint per
    * window, with state bounded by the watermark horizon.
    *
    * Harness mechanics (the replay discipline of streamDedup, but
    * PARALLEL): the corpus is written TWICE as K files per copy plus
    * the far-future sentinel as its own strictly-last file, and the
    * stream admits K files per micro-batch — so each batch's scan-side
    * SimHash fans out over K tasks instead of serializing onto one
    * partition (the r7 slope flag: 6.5× at 10× data was the
    * coalesce(1) harness, not the operator). Batch 1 (copy A) builds
    * the aggregation state with watermark 0; batch 2 (copy B) is a
    * full replay — rows older than the now-advanced watermark are
    * late-dropped, the rest are suppressed by the chained
    * dropDuplicatesWithinWatermark, either way counted once; batch 3
    * (sentinel) pushes the watermark past every real window so
    * append mode flushes them all, while the sentinel's own window
    * stays open and is withheld. The only ordering the construction
    * relies on is write-job order (each job commits before the next
    * starts, so file mtimes put A before B before the sentinel —
    * the sentinel must be LAST or not-yet-seen rows would be
    * late-dropped and undercounted). */
  def streamFpDedup(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.Tables.tempOutDir("stream_fp_src")
    val filesPerBatch = 8
    val docs = s.read.parquet(s"$d/documents.parquet")
    // the sentinel must postdate EVERY real arrival or the watermark
    // flush silently stops closing windows — derive it from the max id
    // (1-row harness metadata; a fixed date broke past ~500k docs on
    // the 10 s/doc clock)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val stamped = docs
      // timestamp_seconds is pure epoch arithmetic — timezone-free on
      // both engines (a java.sql.Timestamp.valueOf literal would parse
      // in the JVM DEFAULT zone and break the oracle off-UTC). The +1
      // keeps doc 0 strictly ABOVE the initial watermark (epoch): an
      // event time equal to the watermark is dropped as late by the
      // dedup operator
      .select(col("doc_id"), col("text"),
        timestamp_seconds((col("doc_id") + 1) * 10).as("ts"))
    // sentinel seconds computed in SCALA Long: interpolating maxId
    // into SQL arithmetic types a ≤2³¹ id as INT32, and (9e8)·10
    // overflows it under ANSI mode at the 10× corpus
    val sentinelSec: Long = (maxId + 2L) * 10L + 172800L
    val sentinel = s.sql(
      s"""SELECT CAST(-1 AS BIGINT) AS doc_id, 'zz' AS text,
           timestamp_seconds(CAST($sentinelSec AS BIGINT)) AS ts""")
    // ONE write job for both data copies (r16): the replay copy is a
    // unioned duplicate under a partition column; repartition(8) on
    // the union makes each task write one file per copy, so each copy
    // dir holds exactly filesPerBatch files (the same K-way fan-out
    // the two sequential jobs produced). Files are MOVED into the
    // source dir with explicitly pinned mtimes: copy A strictly before
    // copy B strictly before the sentinel — stronger than the old
    // job-commit-order + sentinel-only pin (sentinel-LAST is
    // load-bearing: a not-yet-seen row behind the sentinel's watermark
    // would be late-dropped and undercounted; a silently failed pin
    // degrades ordering to path tie-break luck — re-stat, fail loudly).
    val parts = graft.Tables.tempOutDir("stream_fp_parts")
    // hash-partition on doc_id, not round-robin (r17, r16 advice):
    // both copies of a doc land in the SAME task, so every task holds
    // rows of both copies and each copy dir gets exactly filesPerBatch
    // files — round-robin only guaranteed that when every task drew
    // rows of both copies by luck, and it pays a local sort
    // (sortBeforeRepartition) this spelling skips
    stamped.withColumn("c", lit(0))
      .unionByName(stamped.withColumn("c", lit(1)))
      .repartition(filesPerBatch, col("doc_id"))
      .write.partitionBy("c").parquet(parts)
    val tmpDir = new java.io.File(tmp)
    require(tmpDir.mkdirs() || tmpDir.isDirectory, s"cannot create $tmp")
    (0 until 2).foreach { c =>
      val fs = Option(new java.io.File(s"$parts/c=$c").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      require(fs.length == filesPerBatch,
        s"expected $filesPerBatch parquet files for copy $c, got ${fs.length}")
      fs.zipWithIndex.foreach { case (f, k) =>
        val dst = new java.io.File(tmpDir, f"copy-$c-part-$k%03d.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        val want = 1000000000000L + c * 60000L
        dst.setLastModified(want)
        require(dst.lastModified == want,
          s"could not pin ${dst.getName} to mtime $want; the " +
            "FileStreamSource ordering invariant would be tie-break luck")
      }
    }
    sentinel.coalesce(1).write.mode("append").parquet(tmp)
    val sentinelWant = 1000000000000L + 2 * 60000L
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("copy-"))
      .foreach { f =>
        f.setLastModified(sentinelWant)
        require(f.lastModified == sentinelWant,
          s"could not pin sentinel file ${f.getName} to $sentinelWant; " +
            "the FileStreamSource ordering invariant would be tie-break luck")
      }
    val schema = s.read.parquet(tmp).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerBatch)
      .parquet(tmp)
    val agg = src
      // digest once per token in its own projection (CollapseProject
      // keeps it un-inlined) — simhash16Col expands its argument 16×,
      // and HOF subtrees get no subexpression elimination
      .withColumn("hashes", transform(split(col("text"), " "), t => md5(t)))
      .withColumn("fp", Dedup.simhash16Col(col("hashes")))
      .drop("hashes")
      .withWatermark("ts", "1 minute")
      // CHAINED stateful operators: exact-replay suppression by doc_id
      // (the at-least-once upgrade) feeding the fingerprint window agg
      // — replay-idempotent regardless of how the file source batches
      // the two copies (watermark propagation handles the handoff)
      .dropDuplicatesWithinWatermark("doc_id")
      .groupBy(window(col("ts"), "1 hour"), col("fp"))
      .agg(min(col("doc_id")).as("canon"),
        max(col("doc_id")).as("latest"),
        count(lit(1)).as("n_members"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("fp"), col("canon"), col("latest"), col("n_members"))
    // chained dedup state holds one key per document — input-sized
    runToMemory(s, agg, OutputMode.Append(), stateKeys = maxId + 2)
  }

  /** Streaming quality gating (r13) — the batch gate stack scored on
    * a REAL StreamingQuery: the ingest-time shape of corpus curation,
    * where documents arrive as a stream and the cheap gates run
    * scan-side before anything lands in the lake. Gopher metrics and
    * the TRAINED classifier margin are both pure per-row expression
    * stacks (the whole point of their batch spellings), so they ride
    * the micro-batch scan unchanged — train offline once (the batch
    * memo), score the stream forever. State is the bounded per-source
    * aggregation (Complete mode; a production job adds an event-time
    * window + watermark like stream_hourly). Oracle = the same gates
    * + rollup in batch SQL, so the STREAMING EXECUTION PATH is what
    * gets hash-checked. */
  def streamQualityGate(s: SparkSession, d: String): DataFrame = {
    val schema = s.read
      .option("pathGlobFilter", "documents.parquet").parquet(d).schema
    val src = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val (_, wsum) = Curation.trainQualityWeights(s, d)
    // the PlanSpec fan-out rule in streaming form: the single-split
    // file source would run the whole interpreted-HOF gate stack
    // (md5 per token in the classifier fold) on ONE task — measured
    // 28 s vs ~1 s at sf1
    val fanned = src.select(col("doc_id"), col("source"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
    val scored = Curation.classifierScored(fanned, wsum,
      carry = Seq("source", "text"))
    val gated = TextAnalysis.qualityGopherOf(
      scored, carry = Seq("source", "accept"))
    runToMemory(s,
      gated.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("gopher_keep")).cast("long").as("n_gopher"),
        sum(col("accept")).cast("long").as("n_classifier"),
        sum(col("gopher_keep") * col("accept")).cast("long").as("n_both")),
      OutputMode.Complete())
  }

  /** The append-mode production shape of [[streamQualityGate]] (r14 —
    * its own scaladoc named this upgrade): the gate stack rolled into
    * EVENT-TIME hour windows under a 10-minute watermark, emitted
    * exactly once when the watermark passes the window end, to an
    * append-only sink. State is bounded by window retention (open
    * windows within the watermark horizon), not by key cardinality —
    * the reason Complete mode is a demo and this is the deployment.
    *
    * Event time is the stream_fp_dedup synthetic ingest clock (doc k
    * arrives at (k+1)·10 s — the documents table carries no
    * timestamp). The source is the corpus rewritten as 4
    * TIME-ORDERED files streamed one per trigger, so windows close
    * across REAL micro-batch boundaries: the watermark advances batch
    * to batch, early windows flush while later batches are still
    * arriving, and the closing no-data batch drains everything up to
    * max(ts) − 10 min. Time-ordering the files is load-bearing — a
    * random split would race rows against a watermark advanced by
    * later-time rows in earlier batches and drop them as late (the
    * file-source ordering is modification time, which the writer
    * stamps explicitly).
    *
    * The oracle replays the gates + hour bucketing in batch SQL and
    * applies the identical cutoff (window end ≤ final watermark), so
    * both the STREAMING execution path and the append-mode emission
    * set are hash-checked; the withheld trailing window is the part a
    * Complete-mode oracle could never pin. */
  def streamQualityWindowed(s: SparkSession, d: String): DataFrame = {
    val docs = s.read
      .option("pathGlobFilter", "documents.parquet").parquet(d)
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val nFiles = 4
    // ONE write job for the four time-ordered files (r16): the old
    // spelling ran four sequential filtered coalesce(1) writes, each
    // scanning the documents table. The range predicate becomes a
    // partition column (b = doc_id·4 div (maxId+1) — identical row
    // assignment), one single-task job writes one file per range, and
    // the files are MOVED into the source dir with pinned mtimes.
    // Arrival order stays explicit: the file source replays files by
    // (modTime, path), and a silently rejected mtime pin would degrade
    // ordering to sub-second tie-break luck — later-time rows could
    // race into earlier batches and be late-dropped. Re-stat and fail
    // loudly (the sentinel-pinning rule, r9/r15 advisors).
    val parts = graft.Tables.tempOutDir("stream_qwin_parts")
    docs.withColumn("b",
        expr(s"CAST((doc_id * $nFiles) div ${maxId + 1} AS INT)"))
      .coalesce(1).write.partitionBy("b").parquet(parts)
    val tmp = graft.Tables.tempOutDir("stream_qwin")
    val tmpDir = new java.io.File(tmp)
    require(tmpDir.mkdirs() || tmpDir.isDirectory, s"cannot create $tmp")
    (0 until nFiles).foreach { i =>
      val fs = Option(new java.io.File(s"$parts/b=$i").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
      require(fs.length == 1,
        s"expected one parquet file for batch $i, got ${fs.length}")
      val dst = new java.io.File(tmpDir, s"batch-$i.parquet")
      java.nio.file.Files.move(fs(0).toPath, dst.toPath)
      val want = 1000000000000L + i * 60000L
      dst.setLastModified(want)
      require(dst.lastModified == want,
        s"could not pin ${dst.getName} to batch-$i mtime $want " +
          s"(got ${dst.lastModified}); the FileStreamSource " +
          "time-ordering invariant would be tie-break luck")
    }
    val src = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val (_, wsum) = Curation.trainQualityWeights(s, d)
    val fanned = src.repartition(s.sparkContext.defaultParallelism)
    val scored = Curation.classifierScored(fanned, wsum,
      carry = Seq("source", "text"))
    val gated = TextAnalysis.qualityGopherOf(
      scored, carry = Seq("source", "accept"))
    val windowed = gated
      .withColumn("ts", timestamp_seconds((col("doc_id") + 1) * 10))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("gopher_keep")).cast("long").as("n_gopher"),
        sum(col("accept")).cast("long").as("n_classifier"),
        sum(col("gopher_keep") * col("accept")).cast("long").as("n_both"))
      .select(unix_micros(col("window.start")).as("win_us"), col("source"),
        col("n_docs"), col("n_gopher"), col("n_classifier"), col("n_both"))
    runToMemory(s, windowed, OutputMode.Append())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_quality_gate" -> streamQualityGate _,
    "stream_quality_windowed" -> streamQualityWindowed _,
    "stream_fp_dedup" -> streamFpDedup _,
    "stream_dsv2"    -> streamDsv2 _,
    "stream_stateful" -> streamStateful _,
    "stream_tws"     -> streamTws _,
    "stream_timers"  -> streamTimers _,
    "stream_mapstate" -> streamMapState _,
    "stream_init_state" -> streamInitState _,
    "stream_list_state" -> streamListState _,
    "stream_static_join" -> streamStaticJoin _,
    "stream_stream_join" -> streamStreamJoin _,
    "stream_join_left" -> streamJoinLeft _,
    "stream_join_full" -> streamJoinFull _,
    "stream_hourly"  -> streamHourly _,
    "stream_avro"    -> streamAvro _,
    "stream_observe" -> streamObserve _,
    "stream_union"   -> streamUnion _,
    "stream_session" -> streamSession _,
    "stream_session_multibatch" -> streamSessionMultiBatch _,
    "stream_append"  -> streamAppend _,
    "stream_session_append" -> streamSessionAppend _,
    "stream_dedup"   -> streamDedup _,
  )

  val oracle: Map[String, String] = Map(
    // the gates replayed in batch SQL: the full classifier training
    // chain + scoring and the Gopher metric chain, rolled to source —
    // a hash match pins the STREAMING execution path's results
    "stream_quality_gate" -> {
      val cls = Curation.classifierScoreSqlFrom("documents")
        .trim.stripPrefix(",")
      s"""WITH ${Curation.qualityTrainCtes},
        cm AS MATERIALIZED (WITH $cls),
        gm AS MATERIALIZED (${TextAnalysis.gopherSqlFrom("documents")})
        SELECT d.source,
          count(*) AS n_docs,
          CAST(sum(gm.gopher_keep) AS BIGINT) AS n_gopher,
          CAST(sum(cm.accept) AS BIGINT) AS n_classifier,
          CAST(sum(gm.gopher_keep * cm.accept) AS BIGINT) AS n_both
        FROM documents d
        JOIN gm ON gm.doc_id = d.doc_id
        JOIN cm ON cm.doc_id = d.doc_id
        GROUP BY d.source"""
    },
    // the same gates bucketed on the synthetic ingest clock's hour
    // windows, with the append-mode cutoff applied in SQL: a window is
    // in the result iff its END ≤ the final watermark (max event time
    // − 10 min) — the trailing open window is withheld on both sides
    "stream_quality_windowed" -> {
      val cls = Curation.classifierScoreSqlFrom("documents")
        .trim.stripPrefix(",")
      s"""WITH ${Curation.qualityTrainCtes},
        cm AS MATERIALIZED (WITH $cls),
        gm AS MATERIALIZED (${TextAnalysis.gopherSqlFrom("documents")}),
        wm AS (SELECT (max(doc_id) + 1) * 10000000 - 600000000 AS wm_us
               FROM documents),
        b AS (
          SELECT CAST((((d.doc_id + 1) * 10) // 3600) * 3600000000 AS BIGINT)
              AS win_us,
            d.source, gm.gopher_keep, cm.accept
          FROM documents d
          JOIN gm ON gm.doc_id = d.doc_id
          JOIN cm ON cm.doc_id = d.doc_id)
        SELECT win_us, source,
          count(*) AS n_docs,
          CAST(sum(gopher_keep) AS BIGINT) AS n_gopher,
          CAST(sum(accept) AS BIGINT) AS n_classifier,
          CAST(sum(gopher_keep * accept) AS BIGINT) AS n_both
        FROM b CROSS JOIN wm
        WHERE win_us + 3600000000 <= wm.wm_us
        GROUP BY win_us, source"""
    },
    // the same 16-bit simhash spelling as dedup_simhash, bucketed on
    // the synthetic 10-s/doc clock's hour windows; the sentinel row is
    // not in `documents`, and its window is withheld by the final
    // watermark on the engine side — both sides see only real docs
    "stream_fp_dedup" ->
      s"""WITH f AS (${Dedup.simhashSql})
        SELECT CAST((((doc_id + 1) * 10) // 3600) * 3600000000 AS BIGINT)
            AS win_us,
          simhash AS fp,
          min(doc_id) AS canon, max(doc_id) AS latest,
          count(*) AS n_members
        FROM f GROUP BY 1, 2""",
    "stream_dsv2" ->
      """SELECT CAST(id % 97 AS INT) AS bucket, count(*) AS cnt,
          CAST(sum((id * 2654435761) % 4294967296) AS BIGINT) AS sum_mval
        FROM range(0, 50000) t(id)
        GROUP BY 1""",
    // manual sessionization (gap >= 30 min starts a new session, the
    // native session_window boundary) + the append-mode cutoff: emit
    // iff session end (last event + gap) <= final watermark
    "stream_session_append" ->
      """WITH x AS (
          SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events),
        l AS (
          SELECT user_id, event_id, tus,
            lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
          FROM x),
        st AS (
          SELECT user_id, event_id, tus,
            CASE WHEN prev IS NULL OR tus - prev >= 1800000000
              THEN 1 ELSE 0 END AS is_start
          FROM l),
        sess AS (
          SELECT user_id, tus,
            CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY tus, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
          FROM st),
        agg AS (
          SELECT user_id, CAST(min(tus) AS BIGINT) AS start_us,
            max(tus) AS end_tus, count(*) AS n_events
          FROM sess GROUP BY user_id, sid),
        wm AS (SELECT max(tus) - 600000000 AS cutoff FROM x)
        SELECT user_id, start_us, n_events
        FROM agg, wm
        WHERE end_tus + 1800000000 <= cutoff""",
    "stream_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
          event_type, count(*) AS cnt,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""",
    // the streamed Avro datum layout — the SAME shared oracle as
    // avro_functions (EventsPipeline.avroBytesOracle), so a streaming-
    // plan encoding difference would shift the byte sum while the two
    // spellings' oracles cannot drift apart
    "stream_avro" -> EventsPipeline.avroBytesOracle,
    // the across-batch fold of per-batch observed metrics must equal
    // the corpus-total aggregate over the SAME validation predicate;
    // n_batches pins that the fold genuinely spanned 4 data batches
    "stream_observe" ->
      """WITH v AS (
          SELECT *, json_extract(props, '$.k')::INT AS k FROM events),
        g AS (
          SELECT * FROM v
          WHERE user_id IS NOT NULL AND value BETWEEN 0 AND 450
            AND event_type IN ('click','view','purchase','signup')
            AND k BETWEEN 0 AND 89)
        SELECT CAST(4 AS BIGINT) AS n_batches,
          CAST(count(*) AS BIGINT) AS n_valid,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
          max(value) AS max_value,
          CAST(min(k) AS INT) AS min_k,
          CAST(max(k) AS INT) AS max_k
        FROM g""",
    // the two parity sources must merge into the identical result
    "stream_union" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
          event_type, count(*) AS cnt,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""",
    // same sessionization CTE as win_session, but keyed by the session
    // start time (µs) like session_window's output; the multibatch
    // variant only adds the input filter
    "stream_session"            -> sessionOracle(""),
    "stream_session_multibatch" -> sessionOracle(" WHERE user_id % 4 = 0"),
    // append mode = Complete-mode result MINUS windows still open at the
    // final watermark (max event time − 10 min); window end is start+1h
    "stream_append" ->
      """WITH m AS (SELECT max(epoch_ns(ts) // 1000) AS mx FROM events),
        h AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
            event_type, count(*) AS cnt,
            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          FROM events GROUP BY 1, 2)
        SELECT h.* FROM h, m
        WHERE epoch_us(h.window_start) + 3600000000 <= m.mx - 600000000""",
    // a full replay deduped on the unique event_id = the table itself
    "stream_dedup" ->
      "SELECT event_id, event_type, value FROM events",
    // the state function's sorted-timeline facts, spelled with lag():
    // consecutive-difference aggregates are identical for any stable
    // sort of tied timestamps
    "stream_stateful" ->
      """WITH x AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus FROM events),
        l AS (
          SELECT user_id, tus,
            lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
          FROM x)
        SELECT user_id, count(*) AS n_events,
          CAST(coalesce(max(tus - prev), 0) AS BIGINT) AS max_gap_us,
          CAST(1 + count(CASE WHEN tus - prev > 1800000000 THEN 1 END) AS BIGINT)
            AS n_sessions
        FROM l GROUP BY user_id""",
    // last-5 by (time, cents): asc takeRight(5) == desc-rank take 5
    "stream_list_state" ->
      """WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tus,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
          WHERE user_id IS NOT NULL AND value IS NOT NULL
            AND NOT isnan(value)),
        r AS (
          SELECT user_id, tus, cents,
            row_number() OVER (PARTITION BY user_id
              ORDER BY tus DESC, cents DESC) AS rn
          FROM e)
        SELECT user_id,
          string_agg(CAST(cents AS VARCHAR), ',' ORDER BY tus, cents) AS recent
        FROM r WHERE rn <= 5 GROUP BY user_id""",
    // backfill(even ids) + stream(odd ids) must equal the full table
    "stream_init_state" ->
      """SELECT event_type, count(*) AS n_events,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
            AS sum_cents
        FROM events GROUP BY event_type""",
    "stream_mapstate" ->
      """SELECT user_id, event_type,
          count(*) AS n_events,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
            AS sum_cents
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
        GROUP BY user_id, event_type""",
    // sessions (gap > 30 min) whose timer horizon (end+gap, in ms) the
    // final watermark (max event ms - 10 min) has passed; the boundary
    // comparison is pinned empirically like stream_append's
    "stream_timers" ->
      """WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tus
          FROM events WHERE user_id IS NOT NULL),
        l AS (
          SELECT user_id, tus,
            lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
          FROM e),
        st AS (
          SELECT user_id, tus,
            CASE WHEN prev IS NULL OR tus - prev > 1800000000
              THEN 1 ELSE 0 END AS is_start
          FROM l),
        sess AS (
          SELECT user_id, tus,
            sum(is_start) OVER (PARTITION BY user_id ORDER BY tus
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM st),
        agg AS (
          SELECT user_id, min(tus) AS start_us, max(tus) AS end_us,
            count(*) AS n_events
          FROM sess GROUP BY user_id, sid),
        wm AS (SELECT max(tus) // 1000 - 600000 AS wm_ms FROM e)
        SELECT user_id, start_us, end_us, CAST(n_events AS BIGINT) AS n_events
        FROM agg, wm
        WHERE (end_us + 1800000000) // 1000 < wm_ms""",
    "stream_tws" ->
      """SELECT event_type, count(*) AS n_events,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY event_type""",
    "stream_static_join" ->
      """SELECT e.event_id, e.user_id, e.event_type,
          CAST(e.user_id % 8 AS BIGINT) AS cohort
        FROM events e
        JOIN (SELECT DISTINCT user_id FROM events) d ON e.user_id = d.user_id""",
    // 30-minute attribution window in exact µs arithmetic; bounds
    // (p > c, p <= c + 30 min] mirror the streaming join condition
    "stream_stream_join" ->
      """WITH c AS (
          SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
          FROM events WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
          FROM events WHERE event_type = 'purchase')
        SELECT c.click_id, p.purchase_id, p.p_us - c.c_us AS lag_us
        FROM c JOIN p ON c.user_id = p.user_id
          AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000""",
    // the outer variant adds null-extended clicks whose 30-minute match
    // window closed strictly below the final global watermark
    // (min of the two sides' max event time − 1 h) — Spark evicts left
    // state when c_ts < valueWatermark = wm − 30 min, hence the strict <
    "stream_join_left" ->
      """WITH c AS (
          SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
          FROM events WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
          FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(c_us) FROM c),
                            (SELECT max(p_us) FROM p)) - 3600000000 AS wus)
        SELECT c.click_id, p.purchase_id, p.p_us - c.c_us AS lag_us
        FROM c JOIN p ON c.user_id = p.user_id
          AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000
        UNION ALL
        SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id,
          CAST(NULL AS BIGINT) AS lag_us
        FROM c, wm
        WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
            AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000)
          AND c.c_us + 1800000000 < wm.wus""",
    // full outer: left side expires at wm − 30 min on click time (as
    // above); right side expires at wm on purchase time (every click
    // that could still match it has already arrived by then)
    "stream_join_full" ->
      """WITH c AS (
          SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
          FROM events WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS purchase_id, user_id, epoch_ns(ts) // 1000 AS p_us
          FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(c_us) FROM c),
                            (SELECT max(p_us) FROM p)) - 3600000000 AS wus)
        SELECT c.click_id, p.purchase_id, p.p_us - c.c_us AS lag_us
        FROM c JOIN p ON c.user_id = p.user_id
          AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000
        UNION ALL
        SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id,
          CAST(NULL AS BIGINT) AS lag_us
        FROM c, wm
        WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
            AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000)
          AND c.c_us + 1800000000 < wm.wus
        UNION ALL
        SELECT CAST(NULL AS BIGINT) AS click_id, p.purchase_id,
          CAST(NULL AS BIGINT) AS lag_us
        FROM p, wm
        WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
            AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000)
          AND p.p_us < wm.wus""",
  )

  /** Batch (lag + running-sum) spelling of the 30-minute sessionization
    * over an optionally-filtered events table. */
  private def sessionOracle(where: String): String =
    s"""WITH x AS (
        SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus FROM events$where),
      l AS (
        SELECT user_id, event_id, value, tus,
          lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
        FROM x),
      st AS (
        SELECT user_id, event_id, value, tus,
          CASE WHEN prev IS NULL OR tus - prev > 1800000000
            THEN 1 ELSE 0 END AS is_start
        FROM l),
      sess AS (
        SELECT user_id, value, tus,
          CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY tus, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM st)
      SELECT user_id, min(tus) AS start_us, count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM sess GROUP BY user_id, sid"""
}
