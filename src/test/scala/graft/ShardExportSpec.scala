package graft

import graft.analytics.CorpusBuild
import org.apache.spark.sql.functions._

/** Pins the shard export's two operational contracts beyond the hash
  * match: the shards PARTITION the pack table (no pack lost or
  * duplicated by the pseudo-shuffle), and a delta append is LOCAL —
  * re-exporting after new packs arrive changes only the fingerprints
  * of the shards that received them, which is what makes the monthly
  * incremental release cheap to re-ship (a trainer's resume cursor
  * (shard_id, hk) stays valid everywhere else). */
class ShardExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val docs = CorpusBuild.corpusBuildDocs(spark, dir)
    .select(col("doc_id"), col("source"), col("n_tokens"),
      col("clean_fp"), col("pack_id"))
    .localCheckpoint(true)

  private def fps(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getAs[Long]("shard_id") ->
      (r.getAs[Long]("n_packs"), r.getAs[String]("shard_fp"))).toMap

  test("shards partition the pack table exactly") {
    val out = fps(CorpusBuild.shardExportOf(docs))
    val nPacks = docs.select(col("source"), col("pack_id")).distinct().count()
    // the root row aggregates every data shard
    assert(out(-1L)._1 === nPacks)
    assert(out.filterKeys(_ >= 0).values.map(_._1).sum === nPacks)
    // the DERIVED shard count (Sizing.numShards) equals the historic
    // constant on driver-corpus pack tables — committed hashes frozen
    assert(graft.analytics.Sizing.numShards(nPacks) === 16)
    assert(out.keySet.filter(_ >= 0).forall(s => s < 16L))
  }

  test("numShards derivation: floor at driver scale, bounded folds at any") {
    import graft.analytics.Sizing
    assert(Sizing.numShards(1L) === 16)
    assert(Sizing.numShards(65536L) === 16)
    // above the floor the per-shard pack slice stays ~4096
    assert(Sizing.numShards(1 << 20) === (1 << 20) / 4096)
    // monotone, and capped at 2^20 shard files
    assert(Sizing.numShards(Long.MaxValue / 2) === 1048576)
  }

  test("curriculum cursor: segments partition shards, buckets realize rank quartiles") {
    val seg = CorpusBuild.shardExportCurriculum(spark, dir)
      .collect().map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_packs"))).toSeq
    val shards = fps(CorpusBuild.shardExportOf(docs)).filterKeys(_ >= 0)
    // every bucket value is a valid quantile id
    assert(seg.forall(s => s._2 >= 0 && s._2 < CorpusBuild.DifficultyBuckets))
    // segments partition each shard's pack set exactly (the shard fp
    // becomes the ordered fold of its segment folds)
    val bySh = seg.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySh === shards.view.mapValues(_._1).toMap)
    // the rank quantiles are populated end to end: easiest and hardest
    // buckets both occur, so cursor order genuinely schedules
    val buckets = seg.map(_._2).toSet
    assert(buckets.contains(0L) &&
      buckets.contains(CorpusBuild.DifficultyBuckets - 1))
  }

  test("append is shard-local: only the receiving shard's fp moves") {
    val before = fps(CorpusBuild.shardExportOf(docs))
    // a delta release appends one new pack of three documents
    val extra = spark.range(3).select(
      (col("id") + 900000L).as("doc_id"), lit("zzz_delta").as("source"),
      lit(100L).as("n_tokens"), md5(col("id").cast("string")).as("clean_fp"),
      lit(0L).as("pack_id"))
    val after = fps(CorpusBuild.shardExportOf(docs.unionByName(extra)))
    // the new pack lands in exactly one shard
    val moved = (before.keySet ++ after.keySet).filter(_ >= 0)
      .filter(s => before.get(s) != after.get(s))
    assert(moved.size === 1, s"moved=$moved")
    val s = moved.head
    assert(after(s)._1 === before.get(s).map(_._1).getOrElse(0L) + 1)
    // every other shard's fingerprint (and the cursor order behind
    // it) is untouched; the root records the change
    assert(before(-1L)._2 !== after(-1L)._2)
    assert(after(-1L)._1 === before(-1L)._1 + 1)
  }
}
