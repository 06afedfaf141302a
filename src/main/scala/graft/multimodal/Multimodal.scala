package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north star): media payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as partition-wise batch transforms.
  *
  * The container has no image/audio codecs, so `decode` below is a
  * clearly-marked deterministic STUB (byte statistics instead of pixel
  * decoding) — but everything Spark-side is production-shaped: schema,
  * `Dataset[T]` encoders, `mapPartitions` batch iteration (one decoder init
  * per partition, the same shape a JNI/FFmpeg decoder needs), and explode
  * for frame sampling. Swapping the stub for a real codec changes no plan.
  */
object Multimodal {

  /** A media payload: opaque bytes + typed metadata. */
  final case class MediaBlob(
      doc_id: Long,
      media_type: String, // image | audio | video
      data: Array[Byte],
      meta_lang: String,
      meta_source: String)

  /** Fixed-width features extracted from a payload. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      mean_byte: Double,
      feature: Array[Float])

  /** One sampled "frame" of a video payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  val FeatureDim = 16

  /** documents → media blobs: text bytes stand in for encoded media; the
    * media type cycles deterministically so every branch is exercised.
    */
  def packBlobs(spark: SparkSession, docs: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(lit(Array("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("data"),
        col("lang").as("meta_lang"),
        col("source").as("meta_source"))
      .as[MediaBlob]
  }

  /** STUB decoder: real deployments decode pixels/samples here (this
    * container ships no codecs); the stand-in derives deterministic byte
    * statistics and a fixed-width "embedding" by bucket-averaging — the
    * Spark contract (partition-batched, one init per partition, fixed
    * output schema) is the real thing.
    */
  def decodeFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder init would go here (e.g. native lib handle)
      it.map { b =>
        // null payloads (failed fetches, tombstones) decode as empty —
        // real corpora contain them; a decoder must not NPE
        val bytes = if (b.data == null) Array.emptyByteArray else b.data
        val n = bytes.length
        var sum = 0L
        var i = 0
        while (i < n) { sum += bytes(i) & 0xff; i += 1 }
        val feat = new Array[Float](FeatureDim)
        if (n > 0) {
          val bucket = math.max(1, n / FeatureDim)
          var f = 0
          while (f < FeatureDim) {
            var s = 0L
            var c = 0
            var j = f * bucket
            // the final bucket extends to n so trailing bytes (when n is
            // not a multiple of FeatureDim) still influence the features
            val end = if (f == FeatureDim - 1) n else math.min(n, (f + 1) * bucket)
            while (j < end) { s += bytes(j) & 0xff; c += 1; j += 1 }
            feat(f) = if (c == 0) 0f else s.toFloat / c
            f += 1
          }
        }
        MediaFeatures(b.doc_id, b.media_type, n.toLong, if (n == 0) 0.0 else sum.toDouble / n, feat)
      }
    }
  }

  /** Resize STUB: nearest-neighbor byte-stride downsample (keep every
    * `factor`-th byte) — the thumbnail/resize shape: payload in, smaller
    * payload out, same blob schema, so it composes with [[decodeFeatures]]
    * exactly like a real scaler feeding an embedder. Swapping in a pixel-
    * aware scaler changes no plan.
    */
  def resize(blobs: Dataset[MediaBlob], factor: Int = 4): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    require(factor > 0)
    blobs.mapPartitions { it =>
      it.map { b =>
        val bytes = if (b.data == null) Array.emptyByteArray else b.data
        val out = new Array[Byte]((bytes.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
        b.copy(data = out)
      }
    }
  }

  /** Per-document audio VAD summary (see [[vadTrim]]). */
  final case class AudioVad(
      doc_id: Long,
      n_frames: Long,
      n_silent: Long,
      lead_silent: Long,
      trail_silent: Long,
      trimmed_frames: Long,
      total_energy: Long)

  /** Voice-activity-detection STUB over audio payloads: the payload is
    * treated as 8-bit PCM, sliced into `frameLen`-byte frames, and each
    * frame scored by the integer energy Σ(b−128)² — the real VAD shape
    * (frame, energy, threshold, lead/trail trim) with the codec stubbed to
    * byte arithmetic, like [[decodeFeatures]]. Frames below `threshold`
    * are silent; the summary reports the leading/trailing silent runs and
    * the trimmed active span, which is what a speech-corpus curation
    * pipeline keeps. Zero-byte payloads produce no frames and no row.
    * Pure integers throughout, so the DuckDB oracle replays it exactly.
    */
  def vadTrim(
      blobs: Dataset[MediaBlob],
      frameLen: Int = 32,
      threshold: Long = 55000L): Dataset[AudioVad] = {
    import blobs.sparkSession.implicits._
    require(frameLen > 0)
    blobs
      .filter(b => b.media_type == "audio" && b.data != null && b.data.length > 0)
      .mapPartitions { it =>
        // per-partition VAD model init would go here (real VADs load one)
        it.map { b =>
          val bytes = b.data
          val n = bytes.length
          val nf = (n + frameLen - 1) / frameLen
          var f = 0
          var nSilent = 0L
          var firstActive = -1L
          var lastActive = -1L
          var total = 0L
          while (f < nf) {
            var j = f * frameLen
            val end = math.min(n, j + frameLen)
            var e = 0L
            while (j < end) {
              val d = (bytes(j) & 0xff) - 128
              e += d.toLong * d
              j += 1
            }
            total += e
            if (e < threshold) nSilent += 1
            else {
              if (firstActive < 0) firstActive = f.toLong
              lastActive = f.toLong
            }
            f += 1
          }
          val lead = if (firstActive < 0) nf.toLong else firstActive
          val trail = if (lastActive < 0) nf.toLong else nf - 1L - lastActive
          val trimmed = if (firstActive < 0) 0L else lastActive - firstActive + 1L
          AudioVad(b.doc_id, nf.toLong, nSilent, lead, trail, trimmed, total)
        }
      }
  }

  /** Typed container-header metadata parsed from a payload (see
    * [[parseHeaders]]); malformed payloads report zeroed fields.
    */
  final case class MediaHeader(
      doc_id: Long,
      media_type: String,
      magic: String,
      version: Long,
      flags: Long,
      width: Long,
      height: Long,
      payload_len: Long,
      well_formed: Long)

  /** Container-header parse STUB: reads a fixed 8-byte header from the
    * payload WITHOUT decoding the body — the metadata-extraction pass
    * (dimensions, codec flags) ingestion runs on every container before
    * deciding whether to decode at all. Synthetic layout: bytes 0-1 magic,
    * byte 2 → version (mod 4), byte 3 → flags (mod 16), bytes 4-5 / 6-7
    * big-endian width / height, remainder the payload. Payloads shorter
    * than the header report `well_formed = 0` with zeroed fields instead
    * of throwing — real corpora contain truncated files. Pure byte
    * arithmetic, replayed exactly by the DuckDB oracle.
    */
  def parseHeaders(blobs: Dataset[MediaBlob]): Dataset[MediaHeader] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val bytes = if (b.data == null) Array.emptyByteArray else b.data
        val n = bytes.length
        if (n >= 8) {
          def u(i: Int): Long = (bytes(i) & 0xff).toLong
          MediaHeader(b.doc_id, b.media_type,
            new String(bytes, 0, 2, java.nio.charset.StandardCharsets.UTF_8),
            u(2) % 4, u(3) % 16, u(4) * 256 + u(5), u(6) * 256 + u(7),
            n.toLong - 8, 1L)
        } else MediaHeader(b.doc_id, b.media_type, "", 0L, 0L, 0L, 0L, 0L, 0L)
      }
    }
  }

  /** Per-image 64-bit average-hash, carried as four 16-bit band keys. */
  final case class ImageHash(doc_id: Long, h0: Long, h1: Long, h2: Long, h3: Long)

  /** Average-hash (aHash) STUB over image payloads: the perceptual-hash
    * shape image dedup pipelines run — resize to 8×8, threshold each cell
    * against the global mean, read the 64 bits — with the pixel decode
    * stubbed to byte arithmetic like [[decodeFeatures]]: the payload
    * (bytes after the 8-byte [[parseHeaders]] header) splits into 64
    * PROPORTIONAL blocks (block of byte i = (i−1)·64 div L — the resize
    * analog, so two payloads of different lengths still compare
    * position-for-position), and bit b = 1 iff block b's mean exceeds the
    * global mean, decided by the EXACT integer cross-multiply
    * sum_b·L > total·len_b — no division, no float, so the DuckDB oracle
    * replays every bit. The 64 bits ship as four 16-bit band keys
    * (blocks 16k..16k+15 → key k, bit j = block 16k+j) — the d04 banding
    * grain m15 joins on, and small positive ints that never touch the
    * BIGINT sign bit in either engine. Payloads under 64 bytes (after
    * the header) are out of the audit's domain — every block must own at
    * least one byte. Swapping the byte loop for a real decoder + resize
    * changes no plan.
    */
  def imageBandHashes(blobs: Dataset[MediaBlob]): Dataset[ImageHash] = {
    import blobs.sparkSession.implicits._
    blobs
      .filter(b => b.media_type == "image" && b.data != null && b.data.length >= 72)
      .mapPartitions { it =>
        // per-partition decoder/resizer init would go here
        it.map { b =>
          val bytes = b.data
          val l = bytes.length - 8
          val sums = new Array[Long](64)
          val lens = new Array[Long](64)
          var total = 0L
          var i = 1
          while (i <= l) {
            val v = (bytes(7 + i) & 0xff).toLong
            val blk = ((i - 1).toLong * 64 / l).toInt
            sums(blk) += v
            lens(blk) += 1
            total += v
            i += 1
          }
          def band(k: Int): Long = {
            var h = 0L
            var j = 0
            while (j < 16) {
              val blk = 16 * k + j
              // mean_blk > mean_global ⟺ sum_blk·L > total·len_blk
              if (sums(blk) * l > total * lens(blk)) h |= (1L << j)
              j += 1
            }
            h
          }
          ImageHash(b.doc_id, band(0), band(1), band(2), band(3))
        }
      }
  }

  /** Frame sampling STUB: slices the payload into `stride`-byte "frames"
    * and keeps every `every`-th one — the explode shape of real video
    * frame sampling.
    */
  def sampleFrames(blobs: Dataset[MediaBlob], stride: Int = 64, every: Int = 2): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.filter(b => b.media_type == "video" && b.data != null).flatMap { b =>
      b.data.grouped(stride).zipWithIndex.collect {
        case (chunk, idx) if idx % every == 0 => Frame(b.doc_id, idx, chunk)
      }
    }
  }
}
