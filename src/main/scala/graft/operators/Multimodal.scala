package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark side is real — schema, partition-batched execution boundary,
  * typed output — while the codec itself is a STUB (this container ships no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * width/height/frame-count from the payload bytes. Swapping in a real
  * decoder changes only the function body; the `mapPartitions` boundary is
  * exactly where a JNI/codec batch call belongs (per-partition init, batch
  * amortization — the Scala analog of a pandas-batched UDF).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      fake_width: Int,
      fake_height: Int,
      fake_frames: Int,
      digest: String)

  /** Fake frame count shared by [[decodeStub]], [[sampleFrames]] and the
    * q50/q50b SQL oracles (`1 + n_bytes % 10`) — one definition so the 1→1
    * and 1→N stubs can't drift apart on the same payload.
    */
  private[graft] def fakeFrameCount(nBytes: Long): Int = (1 + nBytes % 10).toInt

  /** STUB decoder — deterministic fake metadata from payload bytes.
    * Kept arithmetic-only so an external SQL oracle can replicate it.
    */
  def decodeStub(r: MediaRecord): MediaFeatures =
    decode(MessageDigest.getInstance("MD5"), r)

  private def decode(md: MessageDigest, r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = n,
      fake_width = (n % 640).toInt,
      fake_height = ((n * 31) % 480).toInt,
      fake_frames = fakeFrameCount(n),
      digest = md5Hex(md, r.payload))
  }

  /** Partition-batched feature extraction over a binary media column. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init: one digest instance reused across the batch
      val md = MessageDigest.getInstance("MD5")
      it.map(r => decode(md, r))
    }
  }

  /** Wrap a text corpus as fake media records (fixture adapter). */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("media_type")).as[MediaRecord]
  }

  final case class MediaHash(doc_id: Long, phash: Long)

  /** STUB perceptual hash — decode → canonicalize → 64-bit hash, per
    * partition. A real pHash downsamples pixels and keeps low-frequency
    * DCT signs so that resized/re-encoded/noised copies collide; the
    * stub "downsamples" the decoded byte stream to its sorted distinct
    * token set (robust to reordering/duplication noise the same way)
    * and packs the canonical form's md5 into 64 bits, low chunks first
    * — the identical canonicalization and chunk packing the q41/q44
    * oracles already replicate in SQL, so the q104 twin is exact. Like
    * [[decodeStub]], only the function body changes when a real codec
    * lands; the per-partition-init `mapPartitions` boundary and the
    * downstream hamming-band join ([[Dedup.simhashPairs]]) are the
    * production shape.
    */
  def phashStub(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init, reused across the batch
      val md = MessageDigest.getInstance("MD5")
      it.map { r =>
        val text = new String(r.payload, "UTF-8")
        val canon = text.trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).distinct.sorted.mkString(" ")
        val hex = md5Hex(md, canon.getBytes("UTF-8"))
        var h = 0L
        var j = 0
        while (j < 4) {
          h |= java.lang.Long.parseLong(hex.substring(4 * j, 4 * j + 4), 16) << (16 * j)
          j += 1
        }
        MediaHash(r.doc_id, h)
      }
    }
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_digest: String)

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of md5(bytes), reusing the caller's digest instance —
    * per-partition init, not per-record/per-frame (the hot 1→N path emits
    * one digest per frame).
    */
  private def md5Hex(md: MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** STUB frame sampler — the 1→N decode boundary (video pipelines spend
    * their budget here): emit every `stride`-th frame index of the fake
    * frame count, with a deterministic per-frame digest standing in for
    * the decoded frame tensor. Same honest-stub contract as [[decodeStub]]:
    * the arithmetic (`frames = 1 + n_bytes % 10`, digest =
    * `md5(md5(payload) || ':' || idx)`) is plain enough for a SQL oracle,
    * while the `mapPartitions` + iterator-flatMap structure — per-partition
    * codec init, no frame materialization beyond the emitted ones — is the
    * real production shape a demuxer drops into.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[FrameSample] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition demuxer/codec init: one digest instance for the batch
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val frames = fakeFrameCount(r.payload.length.toLong)
        val payloadDigest = md5Hex(md, r.payload)
        (0 until frames by stride).iterator.map { idx =>
          FrameSample(r.doc_id, idx,
            md5Hex(md, s"$payloadDigest:$idx".getBytes("UTF-8")))
        }
      }
    }
  }
}
