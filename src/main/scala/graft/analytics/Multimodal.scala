package graft.analytics

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star EXT): media as opaque
  * `binary` columns + typed metadata struct, with decode / feature-
  * extract / frame-sample stages. The actual media decode is STUBBED
  * (no image/audio libs in this container — deterministic fake
  * features derived from content bytes); everything Spark-side is real:
  * schema, batch shape, partitioning, and the per-partition processing
  * pattern (`mapPartitions` — the Scala analogue of `mapInPandas`
  * batch processing).
  *
  * Scale design: assets process partition-local (no shuffle); binary
  * payloads stay columnar in parquet; metadata projections prune the
  * binary column entirely when not selected (verify via ReadSchema in
  * the plan). Decoder stages process a whole partition iterator at a
  * time, amortizing model/codec init per partition exactly like a
  * Pandas-UDF batch would.
  */
object Multimodal {

  final case class Asset(asset_id: Long, content: Array[Byte], media_type: String)
  final case class AssetFeatures(asset_id: Long, n_bytes: Int, sha256: String,
      n_frames: Int, features: Array[Float])

  /** documents → asset table: text bytes standing in for media blobs. */
  def assets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("content"),
      lit("application/octet-stream").as("media_type"))

  /** STUB decoder: deterministic pseudo-features from content bytes.
    * A real deployment swaps `decodeBatch` for a codec/model call; the
    * per-partition batching, schema and plumbing stay identical. */
  def decodeBatch(batch: Iterator[Asset]): Iterator[AssetFeatures] =
    batch.map { a =>
      val md  = java.security.MessageDigest.getInstance("SHA-256")
      val dig = md.digest(a.content)
      val hex = dig.map("%02x".format(_)).mkString
      // fake 8-dim feature vector from digest bytes; fake frame count
      // ~ one "frame" per 256 bytes of payload
      val feats = dig.take(8).map(b => (b & 0xff) / 255.0f)
      AssetFeatures(a.asset_id, a.content.length, hex,
        a.content.length / 256 + 1, feats)
    }

  /** Full typed pipeline: binary assets → per-partition stub decode →
    * typed features Dataset (real partition-local batch processing). */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d).as[Asset].mapPartitions(decodeBatch).toDF()
  }

  /** Oracle-checkable projection of the decode metadata (sha/byte-len/
    * frame-sample count are engine-portable functions of the bytes). */
  def multimodalStub(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("content_sha"),
      (floor(octet_length(col("text")) / lit(256)) + 1).cast("int").as("n_frames"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_stub"     -> multimodalStub _,
    "multimodal_features" -> extractFeatures _,
  )

  val oracle: Map[String, String] = Map(
    "multimodal_stub" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
          sha256(text) AS content_sha,
          CAST(octet_length(encode(text)) // 256 AS INT) + 1 AS n_frames
        FROM documents""",
    // multimodal_features carries a float array + stub features — not
    // SQL-expressible; rows-only check, semantics spec-tested.
  )
}
