package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** (steal, total) jiffies from /proc/stat — the contention marker:
    * this VM sees hypervisor CPU-steal spikes that can stall arbitrary
    * queries for tens of seconds, so each pass records how much steal
    * it absorbed and the bench JSON is self-diagnosing. */
  private def cpuJiffies(): (Long, Long) =
    try {
      val src  = scala.io.Source.fromFile("/proc/stat")
      val line = try src.getLines().next() finally src.close()
      val f    = line.trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    } catch { case _: Throwable => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // local-mode fix: Tungsten page size scales with heap; with a big
      // driver heap 32 tasks each zero multi-MB pages per operator and
      // page allocation dominates small-SF runs (113s -> 15s observed)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/shuffle machinery once so the first timed
    // query doesn't absorb ~4s of session start-up cost
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // optional comma-separated filter for profiling single queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def pass(tag: String, qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)]): (Map[String, Double], Double) = {
      val (st0, tot0) = cpuJiffies()
      val res = qs.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed query must not masquerade as a fast one: sentinel -1,
        // never the partial elapsed time
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench:$tag] $name FAILED: ${e.getMessage}")
            false
        }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // queries persist() intermediates for their own multi-consumer
        // plans; drop them so caches don't accumulate across 60 queries
        spark.catalog.clearCache()
        System.err.println(f"[bench:$tag] $name%-22s $dt%8.2f s")
        name -> dt
      }.toMap
      val (st1, tot1) = cpuJiffies()
      val stealPct =
        if (tot1 > tot0) 100.0 * (st1 - st0) / (tot1 - tot0) else -1.0
      (res, stealPct)
    }
    // two passes, min per query: this VM sees hypervisor CPU-steal
    // spikes that can stall arbitrary queries for tens of seconds.
    // Pass 2 runs in REVERSE order so one stall window cannot cover
    // both runs of the same query; the min is the reproducible number.
    val (p1, steal1) = pass("1", qs0)
    val (p2, steal2) = pass("2", qs0.reverse)
    val results = p1.map { case (k, v) =>
      k -> (if (v < 0 || p2(k) < 0) math.max(v, p2(k)) // one pass failed → use the other
            else math.min(v, p2(k)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.values.filter(_ >= 0).sum
    // Locale.ROOT: the f-interpolator uses the default locale, which can
    // emit a ',' decimal separator and corrupt the JSON
    def pct(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"steal_pct_pass1":${pct(steal1)},"steal_pct_pass2":${pct(steal2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
