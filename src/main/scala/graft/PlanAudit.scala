package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic harness (r16): replicate PlanSpec's plan-audit loop
  * outside sbt — same session shape (local[4], 4 shuffle partitions),
  * same sorted construction order (memo warmth matches the spec) —
  * and dump each non-streaming query's executedPlan string plus its
  * "Exchange hashpartitioning" count to a directory for offline diff.
  *
  * Usage: tools/run.sh graft.PlanAudit <sfDir> <outDir> [only,csv]
  */
object PlanAudit {
  private val streaming =
    Set("stream_hourly", "stream_session", "stream_session_multibatch",
      "stream_append", "stream_dedup", "stream_stateful", "stream_tws",
      "stream_static_join", "stream_stream_join", "stream_dsv2",
      "stream_session_append", "stream_timers", "stream_mapstate",
      "stream_init_state", "stream_list_state", "stream_join_left",
      "stream_join_full", "stream_union", "stream_fp_dedup",
      "stream_avro", "stream_observe", "stream_quality_gate",
      "stream_quality_windowed", "stream_incremental_ingest")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.lift(2).map(_.split(",").toSet)
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = new java.io.PrintWriter(s"$outDir/_exchanges.tsv", "UTF-8")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streaming(name)) {
        val t0 = System.nanoTime()
        val (p, fmt) =
          try {
            val qe = fn(spark, sfDir).queryExecution
            (qe.executedPlan.toString,
              qe.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          } catch {
            case e: Throwable =>
              val msg = s"(plan unavailable: ${e.getMessage})"
              (msg, msg)
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val ex = "Exchange hashpartitioning".r.findAllIn(p).size
        if (only.forall(_.contains(name))) {
          val w = new java.io.PrintWriter(s"$outDir/$name.txt", "UTF-8")
          // the deliverable format (explain "formatted") first, then the
          // executedPlan string the exchange counter runs over
          try {
            w.println(fmt)
            w.println()
            w.println("== executedPlan (exchange-count source) ==")
            w.println(p)
          } finally w.close()
        }
        counts.println(f"$name\t$ex\t$dt%.2f")
        counts.flush()
      }
    }
    counts.close()
    spark.stop()
  }
}
