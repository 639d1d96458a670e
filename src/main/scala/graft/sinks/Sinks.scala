package graft.sinks

import org.apache.spark.sql.DataFrame
import scala.util.Try

/** Layered-lake sinks (/root/reference/Glue/Glue_job.py:124-128,142).
  *
  * The reference writes Delta with mergeSchema; this environment may not
  * ship delta jars, so we feature-detect and fall back to plain parquet
  * (identical columnar bytes — the reference's own warehouse tail reads
  * the parquet inside Delta, Snowflake/Curated_pipe.sql:16-17).
  *
  * Empty-write guards use `isEmpty` (one-partition short-circuit), not
  * the reference's `count() > 0` (a full scan per guard,
  * Glue_job.py:124,127).
  */
object Sinks {

  lazy val deltaAvailable: Boolean =
    Try(Class.forName("io.delta.sql.DeltaSparkSessionExtension")).isSuccess

  private def fmt: String = if (deltaAvailable) "delta" else "parquet"

  /** Curated layer: overwrite world (the reference reprocesses the whole
    * raw prefix every run — Glue_job.py:25,31,125). */
  def writeCurated(df: DataFrame, path: String): Unit =
    if (!df.isEmpty)
      df.write.format(fmt).option("mergeSchema", "true").mode("overwrite").save(path)

  /** Rejected + lineage layers: append-only (Glue_job.py:128,142). */
  def writeAppend(df: DataFrame, path: String): Unit =
    if (!df.isEmpty)
      df.write.format(fmt).option("mergeSchema", "true").mode("append").save(path)
}
