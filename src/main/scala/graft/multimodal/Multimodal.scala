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
    decoded_width: Int,      // -1 when the payload is not a decodable image
    decoded_height: Int,
    features: Array[Float])

final case class FrameSample(media_id: Long, frame_index: Int, offset: Int,
    frame_bytes: Array[Byte])

/** Multimodal column processing.
  *
  * The Spark-side plumbing is real and tested: schema, per-partition
  * batch iteration (`mapPartitions` — each task decodes its partition's
  * rows; no shuffle is introduced), output encoders.
  *
  * Codecs: `kind = "image"` rows go through a REAL decoder
  * ([[decodeImage]], JDK `javax.imageio` — PNG/BMP/GIF/JPEG, zero new
  * dependencies) producing true dimensions and a normalized RGB-histogram
  * feature vector. Audio/video remain a STUB ([[decodeStub]], labeled):
  * this container has no audio/video libraries, so features are
  * deterministic pseudo-features of the bytes. Swapping a real A/V codec
  * changes only that function body — the distributed shape (schema in,
  * partition-parallel map, schema out) is final.
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

  /** Real image decode via JDK `javax.imageio`: (width, height, features)
    * where features is a per-channel (R,G,B) histogram of `dim/3` bins
    * each, normalized to sum 1 per channel. Pixels are sampled on a grid
    * of at most 64×64 so decode cost is bounded for arbitrarily large
    * images. Returns None when the bytes are not a decodable image —
    * callers fall back to the stub rather than failing the task. */
  private[multimodal] def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val bins = math.max(dim / 3, 1)
        val out = new Array[Float](dim)
        // ceil division: a 127×127 image must step 2, not 1 — floor would
        // sample up to 127×127 pixels where ≤64×64 is the documented bound
        val stepX = math.max((w + 63) / 64, 1)
        val stepY = math.max((h + 63) / 64, 1)
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(math.min(((rgb >> 16) & 0xff) * bins / 256, bins - 1)) += 1f
            out(bins + math.min(((rgb >> 8) & 0xff) * bins / 256, bins - 1)) += 1f
            out(2 * bins + math.min((rgb & 0xff) * bins / 256, bins - 1)) += 1f
            n += 1
            x += stepX
          }
          y += stepY
        }
        if (n > 0) { var i = 0; while (i < out.length) { out(i) /= n; i += 1 } }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Feature extraction: partition-parallel decode of opaque media bytes.
    * Image rows decode for real (dimensions + RGB histogram); audio/video
    * and undecodable images take the labeled stub path with -1 dims. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      rows.map { m =>
        val decoded =
          if (m.kind == "image") decodeImage(m.content, dim) else None
        decoded match {
          case Some((w, h, feats)) =>
            MediaFeatures(m.media_id, m.kind, m.content.length,
              checksum(m.content), w, h, feats)
          case None =>
            MediaFeatures(m.media_id, m.kind, m.content.length,
              checksum(m.content), -1, -1, decodeStub(m.content, dim))
        }
      }
    }

  /** Frame sampling: every `stride` bytes becomes a "frame" (STUB for a
    * video frame-extractor; one input row fans out to many frame rows). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameSize: Int): Dataset[FrameSample] = {
    require(stride > 0, s"stride must be > 0, got $stride")
    require(frameSize > 0, s"frameSize must be > 0, got $frameSize")
    media.flatMap { m =>
      Iterator.range(0, math.max(m.content.length - frameSize + 1, 0), stride)
        .zipWithIndex.map { case (off, idx) =>
          FrameSample(m.media_id, idx, off,
            java.util.Arrays.copyOfRange(m.content, off, off + frameSize))
        }
    }
  }
}
