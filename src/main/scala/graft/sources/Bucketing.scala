package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the cluster-scale strategy for join keys
  * that are hit repeatedly (SURVEY.md §4 / the 100 TB contract).
  *
  * Writing both fact tables bucketed AND sorted by the join key means
  * every subsequent join on that key is exchange-free and sort-free:
  * Spark's FileSourceScanExec reports the bucket spec as its output
  * partitioning, so SortMergeJoin requirements are already satisfied.
  * At 100 TB this converts the biggest recurring shuffle (lineitem ⋈
  * orders style) into a map-side merge — pay the shuffle once at write
  * time, never again.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (idempotent: drops
    * the table and any orphaned location from a previous JVM — the
    * in-memory catalog forgets tables but their directories persist). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(warehouse, true)
    // one file per bucket: Spark only trusts the per-bucket sort order
    // (and can elide the join-side Sort) when a bucket is a single
    // file; repartitioning on the key uses the same hash as bucketBy,
    // so each write task holds exactly one bucket's rows
    df.repartition(buckets, df.col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Prepare co-bucketed lineitem/orders tables from a test-data dir. */
  def prepare(spark: SparkSession, d: String, buckets: Int = 8): Unit = {
    writeBucketed(spark.read.parquet(s"$d/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", buckets)
    writeBucketed(spark.read.parquet(s"$d/orders.parquet")
      .withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", buckets)
  }

  /** Join the co-bucketed tables — with matching bucket specs this
    * plans as a SortMergeJoin with NO Exchange and NO Sort. */
  def joinBucketed(spark: SparkSession): DataFrame =
    spark.table("b_lineitem").join(spark.table("b_orders"), "okey")
}
