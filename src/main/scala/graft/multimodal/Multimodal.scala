package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** One media object: opaque bytes + typed metadata (SURVEY §2.8 U6
  * multimodal columns). `content` is a BinaryType column — Tungsten owns
  * the buffering; nothing is ever collected to the driver. */
final case class MediaRow(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    content: Array[Byte],
    width: Int,
    height: Int)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float])

final case class FrameSample(media_id: Long, frame_index: Int, offset: Int,
    frame_bytes: Array[Byte])

/** Multimodal column processing.
  *
  * The Spark-side plumbing is real and tested: schema, per-partition
  * batch iteration (`mapPartitions` — each task decodes its partition's
  * rows; no shuffle is introduced), output encoders. The *codec* step is
  * a STUB: this container has no image/audio libraries, so `decodeStub`
  * derives a deterministic fake feature vector from the bytes. Swapping
  * in a real decoder changes only the function body — the distributed
  * shape (schema in, partition-parallel map, schema out) is final.
  */
object Multimodal {

  implicit val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[FrameSample] = Encoders.product[FrameSample]

  /** STUB decode: deterministic pseudo-features from content bytes
    * (rolling FNV-1a over byte windows). Replace with a real codec. */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      out(i % dim) += ((h >>> 32).toInt / Int.MaxValue.toFloat)
      i += 1
    }
    out
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Feature extraction: partition-parallel decode of opaque media bytes. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length,
          checksum(m.content), decodeStub(m.content, dim))
      }
    }

  /** Frame sampling: every `stride` bytes becomes a "frame" (STUB for a
    * video frame-extractor; one input row fans out to many frame rows). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameSize: Int): Dataset[FrameSample] =
    media.flatMap { m =>
      Iterator.range(0, math.max(m.content.length - frameSize + 1, 0), stride)
        .zipWithIndex.map { case (off, idx) =>
          FrameSample(m.media_id, idx, off,
            java.util.Arrays.copyOfRange(m.content, off, off + frameSize))
        }
    }
}
