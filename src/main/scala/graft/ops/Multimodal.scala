package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The decode step itself (JPEG decode, audio resample, frame
  * sampling) is STUBBED — codec libraries are not in this container —
  * but everything Spark-side is real and tested: schema, batch shape,
  * partition-local processing via `mapPartitions` (the Scala analog of
  * `mapInPandas`: one iterator per partition, amortizing
  * per-batch decoder setup), and deterministic fake feature
  * extraction so downstream operators (dedup by content hash,
  * similarity over extracted features) can be exercised end-to-end.
  *
  * Scale notes: payload bytes never enter a shuffle — metadata is
  * extracted in the scan stage, and downstream joins/groupBys carry
  * only (id, meta, feature) columns. Partition sizing for ~MB payloads
  * is controlled by `spark.sql.files.maxPartitionBytes`, not row
  * count.
  */
object Multimodal {

  /** Typed per-asset metadata extracted partition-locally. */
  case class AssetMeta(asset_id: Long, byte_len: Long, sha: String,
                       width: Int, height: Int, format: String)

  /** Wrap a text corpus as a binary-payload asset table (the harness
    * has no real media files; UTF-8 bytes stand in for payloads). */
  def asBinaryAssets(docs: DataFrame, idCol: String = "doc_id",
                     payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("asset_id"),
      encode(col(payloadCol), "UTF-8").as("payload"))

  /** Columnar metadata extraction — the cheap path: length + content
    * hash via built-ins (codegen'd, no deserialization of the payload
    * into JVM objects beyond the expression). */
  def extractMetaColumnar(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      length(col("payload")).cast(LongType).as("byte_len"),
      sha2(col("payload"), 256).as("sha"))
      .orderBy("asset_id")

  /** Frame sampling for video-like payloads: explode each asset to
    * its sampled frame index rows WITHOUT the payload bytes entering
    * the explode (only (id, byte_len) fan out; a real decoder would
    * seek to frame_offset per row downstream). One frame per
    * `everyBytes` bytes, at least 1, capped at `maxFrames` — the cap
    * is the standard guard against a pathological asset exploding the
    * row count. */
  def frameSample(assets: DataFrame, everyBytes: Long = 997L,
                  maxFrames: Int = 16): DataFrame = {
    require(everyBytes > 0 && maxFrames > 0,
      "everyBytes and maxFrames must be positive")
    val nFrames = least(greatest(
      (length(col("payload")).cast(LongType) / lit(everyBytes))
        .cast(LongType), lit(1L)), lit(maxFrames.toLong))
    assets.select(col("asset_id"),
        length(col("payload")).cast(LongType).as("byte_len"),
        nFrames.as("n_frames"))
      .select(col("asset_id"), col("byte_len"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_offset", col("frame_idx") * lit(everyBytes))
  }

  /** Resize planning from the sha-derived stub dimensions: compute
    * target (out_w, out_h) bounded by `maxDim` with aspect preserved,
    * in pure integer arithmetic (`div`) so the plan is deterministic
    * and engine-portable. Columnar — a real implementation would hand
    * (payload, out_w, out_h) to the decoder in mapPartitions. */
  def resizePlan(assets: DataFrame, maxDim: Int = 512): DataFrame = {
    val sha = sha2(col("payload"), 256)
    def dim(from: Int) =
      (conv(substring(sha, from, 5), 16, 10).cast(LongType) % 1024 + 16)
        .cast("int")
    val w = dim(1); val h = dim(6)
    assets.select(col("asset_id"), w.as("width"), h.as("height"))
      .withColumn("out_w",
        when(greatest(col("width"), col("height")) <= maxDim, col("width"))
          .otherwise(expr(s"CAST((CAST(width AS BIGINT) * $maxDim) DIV " +
            s"greatest(width, height) AS INT)")))
      .withColumn("out_h",
        when(greatest(col("width"), col("height")) <= maxDim, col("height"))
          .otherwise(expr(s"CAST((CAST(height AS BIGINT) * $maxDim) DIV " +
            s"greatest(width, height) AS INT)")))
  }

  /** Near-duplicate ASSET dedup over blockhash signatures — the
    * image-near-dup shape for binary payload columns: one codegen'd
    * [[graft.functions.BlockHash64]] pass per asset (64-tile median
    * blockhash of the byte signal), then the exhaustive 4×16-bit
    * Hamming block index ([[Dedup.hammingDedupSig]] — the q65/q123
    * machinery) drops the higher asset_id of every pair within
    * `maxHamming` bits. Robust to VALUE perturbations (re-encode
    * jitter, noise, small in-place edits: planted ±1-byte jitter on
    * every 20th byte stays ≤ 4 bits on the harness corpus; closest
    * unrelated pair 17); alignment shifts are content-defined
    * chunking's job (q136), by design.
    *
    * Scale shape: payload bytes are consumed in the scan stage
    * (signature = one narrow projection); only (asset_id, 64-bit
    * signature) ever reaches a shuffle — the same
    * bodies-never-cross-the-exchange discipline as the text dedup
    * family. Returns surviving asset ids, ordered. */
  def blockHashDedup(assets: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.ops.Dedup.hammingDedupSig(
      assets.select(col("asset_id")),
      assets.select(col("asset_id"),
        graft.functions.BinaryExpressions.block_hash64(col("payload"))
          .as("simhash")),
      maxHamming, "asset_id")

  /** Partition-local "decode" — the mapPartitions batch shape a real
    * decoder plugs into. The decode body is a deterministic stub:
    * width/height derive from the payload hash (a real impl would
    * call the codec here); setup cost (`decoderSetup`) is paid once
    * per partition, not per row — the point of the batch shape. */
  def decodeAssets(assets: DataFrame): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup (stub): real code would
        // initialize the codec context once here. The digest is the
        // per-partition amortized resource this shape exists for.
        val decoderReady = true
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, payload) =>
          require(decoderReady)
          md.reset()
          val sha = md.digest(payload).map("%02x".format(_)).mkString
          // STUB decode: dimensions derived deterministically from the
          // content hash — stands in for actual pixel decode, and is
          // engine-portable (sha256 hex → int), so the whole decode
          // output is oracle-checkable.
          def dim(from: Int): Int =
            16 + (java.lang.Long.parseLong(sha.substring(from, from + 5), 16)
              % 1024).toInt
          AssetMeta(id, payload.length.toLong, sha,
            width = dim(0), height = dim(5), format = "stub")
        }
      }
  }
}
