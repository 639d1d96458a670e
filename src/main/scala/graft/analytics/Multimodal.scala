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

  /** Driver-checkable face of `extractFeatures`: the float feature
    * vector is emitted as a csv of its source digest bytes
    * (round(f·255) inverts the stub's b/255 scaling exactly — float
    * error ≪ 0.5), so every column is a sortable scalar and the whole
    * row is DuckDB-expressible. The typed Dataset path itself stays the
    * library surface (spec-tested). */
  def featuresScalar(s: SparkSession, d: String): DataFrame =
    extractFeatures(s, d).select(
      col("asset_id"), col("n_bytes"), col("sha256"), col("n_frames"),
      concat_ws(",",
        transform(col("features"), f => round(f * 255).cast("int").cast("string")))
        .as("features_b"))

  /** Oracle-checkable projection of the decode metadata (sha/byte-len/
    * frame-sample count are engine-portable functions of the bytes). */
  def multimodalStub(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("content_sha"),
      (floor(octet_length(col("text")) / lit(256)) + 1).cast("int").as("n_frames"))

  /** Frame-sampling plan: every 4th frame index and its byte offset
    * per asset, derived from metadata alone — the binary column is
    * pruned from the scan entirely (ReadSchema shows only the length
    * source). This is the Spark shape of video frame sampling: a
    * generator (sequence + explode) fans each asset out to O(frames)
    * rows with no shuffle, and the downstream decoder consumes
    * (asset_id, frame_idx) batches partition-locally. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    val nFrames = (floor(octet_length(col("text")) / lit(256)) + 1).cast("int")
    documents(s, d)
      .select(col("doc_id").as("asset_id"), nFrames.as("n_frames"))
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("f"))
      .select(col("asset_id"), col("n_frames"),
        col("f").cast("long").as("frame_idx"),
        (col("f") * 256L).as("byte_off"))
  }

  /** Resize stage: stride-downsample the payload bytes (every 4th byte
    * — the nearest-neighbor-resize analog on the fake media), emitting
    * the resized size + content hash. Like the decoder, the byte work
    * runs partition-local in `mapPartitions` (a real resize swaps the
    * stride loop for a codec call; batch shape and schema stay
    * identical); no shuffle anywhere. The oracle recomputes the same
    * stride sample character-wise and hashes it. */
  def multimodalResize(s: SparkSession, d: String, stride: Int = 4): DataFrame = {
    import s.implicits._
    assets(s, d).as[Asset].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { a =>
        val resized = Array.tabulate((a.content.length + stride - 1) / stride)(
          i => a.content(i * stride))
        md.reset()
        val hex = md.digest(resized).map("%02x".format(_)).mkString
        (a.asset_id, a.content.length, resized.length, hex)
      }
    }.toDF("asset_id", "n_bytes", "resized_bytes", "resized_sha")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_stub"     -> multimodalStub _,
    "multimodal_features" -> featuresScalar _,
    "multimodal_frames"   -> multimodalFrames _,
    "multimodal_resize"   -> ((s: SparkSession, d: String) => multimodalResize(s, d)),
  )

  /** hex-pair → byte value, DuckDB spelling (strpos is 1-based). */
  private val byteExpr =
    """(strpos('0123456789abcdef', substr(sha, 2*i + 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(sha, 2*i + 2, 1)) - 1)"""

  val oracle: Map[String, String] = Map(
    "multimodal_stub" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
          sha256(text) AS content_sha,
          CAST(octet_length(encode(text)) // 256 AS INT) + 1 AS n_frames
        FROM documents""",
    // stub features are the first 8 sha256 digest bytes / 255 — the
    // oracle recomputes the bytes from the hex digest
    "multimodal_features" ->
      s"""SELECT doc_id AS asset_id, octet_length(encode(text)) AS n_bytes,
          sha AS sha256,
          CAST(octet_length(encode(text)) // 256 AS INT) + 1 AS n_frames,
          array_to_string(list_transform(generate_series(0, 7),
            i -> CAST($byteExpr AS VARCHAR)), ',') AS features_b
        FROM (SELECT *, sha256(text) AS sha FROM documents)""",
    // the same every-4th-byte sample, character-wise (ASCII corpus:
    // byte == char), hashed with the same sha256
    "multimodal_resize" ->
      """WITH r AS (
          SELECT doc_id AS asset_id, octet_length(encode(text)) AS n_bytes,
            array_to_string(list_transform(list_filter(
              list_transform(string_split(text, ''),
                (c, i) -> struct_pack(c := c, i := i)),
              s -> (s.i - 1) % 4 = 0), s -> s.c), '') AS resized
          FROM documents)
        SELECT asset_id, n_bytes,
          CAST(octet_length(encode(resized)) AS BIGINT) AS resized_bytes,
          sha256(resized) AS resized_sha
        FROM r""",
    "multimodal_frames" ->
      """WITH a AS (
          SELECT doc_id AS asset_id,
            CAST(octet_length(encode(text)) // 256 AS INT) + 1 AS n_frames
          FROM documents)
        SELECT asset_id, n_frames,
          CAST(u.f AS BIGINT) AS frame_idx,
          CAST(u.f * 256 AS BIGINT) AS byte_off
        FROM a, unnest(generate_series(0, n_frames - 1, 4)) AS u(f)""",
  )
}
