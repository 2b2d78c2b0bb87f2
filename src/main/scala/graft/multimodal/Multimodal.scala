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
    decoded_width: Int,      // image: pixel width; audio: sample rate (Hz);
    decoded_height: Int,     // image: pixel height; audio: channel count;
                             // -1/-1 when the payload is not decodable
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
  * feature vector. `kind = "audio"` rows decode for REAL too
  * ([[decodeAudio]], JDK `javax.sound.sampled` — WAV/AIFF/AU PCM):
  * true sample rate + channel count and a windowed-RMS-energy feature
  * vector. `kind = "video"` decodes for REAL when the payload is an
  * AVI carrying either an uncompressed (BI_RGB) or a Motion-JPEG
  * stream ([[decodeVideo]], hand-parsed RIFF container — true
  * dimensions + per-frame mean-luminance features; MJPEG frames are
  * standalone JPEGs routed through the same `javax.imageio` machinery
  * the image decoder uses, zero new dependencies). Only genuinely
  * codec-requiring video (H.264, VP9, …) falls back to the labeled
  * STUB ([[decodeStub]]) because this container ships no codec
  * libraries. Swapping a full codec in changes only that function
  * body — the distributed shape (schema in, partition-parallel map,
  * schema out) is final.
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

  /** Visit pixels on the shared ≤64×64 sampling grid and return the
    * visit count. Ceil-step division: a 127×127 image must step 2, not
    * 1 — floor would sample up to 127×127 pixels where ≤64×64 is the
    * documented bound. All three decoders (image histogram, BI_RGB
    * video, MJPEG video) sample through here so the bound and the step
    * arithmetic can never drift apart. */
  private def sampleGrid(w: Int, h: Int)(visit: (Int, Int) => Unit): Int = {
    val stepX = math.max((w + 63) / 64, 1)
    val stepY = math.max((h + 63) / 64, 1)
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { visit(x, y); n += 1; x += stepX }
      y += stepY
    }
    n
  }

  /** Rec-601 mean luminance in [0,1] of one frame sampled on
    * [[sampleGrid]]; `rgb` returns a packed 0xRRGGBB pixel. */
  private def gridMeanLum(w: Int, h: Int, rgb: (Int, Int) => Int): Float = {
    var sum = 0.0
    val n = sampleGrid(w, h) { (x, y) =>
      val p = rgb(x, y)
      sum += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
        114 * (p & 0xff)) / (1000.0 * 255.0)
    }
    if (n == 0) 0f else (sum / n).toFloat
  }

  /** Real image decode via JDK `javax.imageio`: (width, height, features)
    * where features is a per-channel (R,G,B) histogram of `dim/3` bins
    * each, normalized to sum 1 per channel. Pixels are sampled on the
    * shared ≤64×64 [[sampleGrid]] so decode cost is bounded for
    * arbitrarily large images. Returns None when the bytes are not a
    * decodable image — callers fall back to the stub rather than failing
    * the task. */
  private[multimodal] def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] = {
    // dim < 3 cannot hold one bin per channel: the G/B writes would
    // index past `out` and the AIOOBE would silently send every VALID
    // image to the stub via the NonFatal catch — fail the call instead
    require(dim >= 3, s"decodeImage needs dim >= 3 (one bin per RGB channel), got $dim")
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val bins = math.max(dim / 3, 1)
        val out = new Array[Float](dim)
        val n = sampleGrid(w, h) { (x, y) =>
          val rgb = img.getRGB(x, y)
          out(math.min(((rgb >> 16) & 0xff) * bins / 256, bins - 1)) += 1f
          out(bins + math.min(((rgb >> 8) & 0xff) * bins / 256, bins - 1)) += 1f
          out(2 * bins + math.min((rgb & 0xff) * bins / 256, bins - 1)) += 1f
        }
        if (n > 0) { var i = 0; while (i < out.length) { out(i) /= n; i += 1 } }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real audio decode via JDK `javax.sound.sampled`: (sampleRate,
    * channels, features) where features is `dim` windowed RMS energies of
    * the normalized PCM signal (channels mixed), each in [0,1]. Supports
    * the formats the JDK ships parsers for (WAV/AIFF/AU, 8/16-bit PCM).
    * At most 2^20 frames are read so decode cost is bounded for
    * arbitrarily long clips (mirroring the image decoder's 64×64 sampling
    * bound). Returns None when the bytes are not decodable audio —
    * callers fall back to the stub rather than failing the task. */
  private[multimodal] def decodeAudio(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) &&
          (bits == 8 || bits == 16)
        if (!ok) None
        else {
          val channels = fmt.getChannels
          val bytesPerFrame = fmt.getFrameSize
          val maxFrames = 1 << 20
          val raw = ais.readNBytes(maxFrames * bytesPerFrame)
          val nFrames = raw.length / bytesPerFrame
          if (nFrames == 0) None
          else {
            // mix channels to one normalized [-1,1] sample per frame
            val samples = new Array[Float](nFrames)
            val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val big = fmt.isBigEndian
            var f = 0
            while (f < nFrames) {
              var acc = 0f
              var c = 0
              while (c < channels) {
                val off = f * bytesPerFrame + c * (bits / 8)
                val v =
                  if (bits == 8) {
                    if (signed) bytes2f(raw(off).toInt, 0x80)
                    else bytes2f((raw(off) & 0xff) - 128, 0x80)
                  } else {
                    val lo = if (big) raw(off + 1) else raw(off)
                    val hi = if (big) raw(off) else raw(off + 1)
                    val s = ((hi.toInt << 8) | (lo & 0xff)).toShort.toInt
                    bytes2f(if (signed) s else ((s & 0xffff) - 32768), 0x8000)
                  }
                acc += v
                c += 1
              }
              samples(f) = acc / channels
              f += 1
            }
            // dim windowed RMS energies over the frame span. Clips shorter
            // than `dim` frames piecewise-constant-upsample (window = its
            // nearest sample) — a zero-filled window would be
            // indistinguishable from genuine silence downstream.
            val out = new Array[Float](dim)
            var w = 0
            while (w < dim) {
              val from = (w.toLong * nFrames / dim).toInt
              val until0 = ((w + 1).toLong * nFrames / dim).toInt
              val until = if (until0 > from) until0 else from + 1 // from < nFrames always
              var sum = 0.0
              var i = from
              while (i < until) { sum += samples(i).toDouble * samples(i); i += 1 }
              out(w) = math.sqrt(sum / (until - from)).toFloat
              w += 1
            }
            Some((fmt.getSampleRate.toInt, channels, out))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  @inline private def bytes2f(v: Int, scale: Int): Float = v.toFloat / scale

  @inline private def u32le(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  @inline private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** biCompression values of Motion-JPEG streams: each frame chunk is a
    * complete JPEG image, decodable by `javax.imageio` with no codec
    * library. "MJPG" is the canonical fourcc; some muxers write it
    * lowercase. */
  private val MjpgFourccs: Set[Long] =
    Set("MJPG", "mjpg").map(s => u32le(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0))

  /** Real video decode for AVI (RIFF container parsed with plain JDK byte
    * ops): (width, height, features) where features is `dim`
    * mean-luminance values over frames sampled across the clip (each in
    * [0,1]; piecewise-constant when the clip has fewer than `dim` frames,
    * mirroring the audio decoder). Two stream formats decode for REAL:
    *
    *  - **BI_RGB** (biCompression = 0, 24-bit): pixels straight from
    *    `00db`-style frame chunks in the `movi` list (bottom-up rows,
    *    4-byte padded), dims from the `avih` main header;
    *  - **MJPEG** (biCompression fourcc `MJPG`): each `00dc` frame chunk
    *    is a standalone JPEG decoded through the same `javax.imageio`
    *    path [[decodeImage]] uses, dims from the first decoded frame
    *    (the frames' own truth, not the header's claim).
    *
    * Both sample pixels on a ≤64×64 grid per frame like the image
    * decoder, and only the ≤`dim` distinct sampled frames are ever
    * decoded — cost is bounded regardless of clip length. Genuinely
    * codec-requiring formats (H.264, VP9, …) return None — this
    * container ships no codec libraries, so those stay on the labeled
    * stub path. */
  private[multimodal] def decodeVideo(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    try {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
      var width = 0
      var height = 0
      var bitCount = -1
      var compression = -1L
      var inVideoStream = false // last strh seen was fccType "vids"
      var strhSeen = 0          // strl order assigns stream numbers
      var videoStreamIdx = -1   // the first vids stream's number
      // frame chunks keyed by their 2-digit stream prefix ('00db' →
      // "00"): a second stream's chunks must not poison the video decode
      val dbFrames = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Int, Int)]]
      val dcFrames = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Int, Int)]]

      // chunk walk: (fourcc, size, payload); LISTs recurse, chunks are
      // even-padded per the RIFF spec. A legal AVI nests 3-4 LIST levels;
      // the depth cap keeps crafted deep-nest payloads from overflowing
      // the stack (StackOverflowError would escape the NonFatal catch and
      // kill the task instead of degrading to the stub).
      def walk(from: Int, until: Int, depth: Int): Unit = {
        if (depth > 16) return
        var p = from
        while (p + 8 <= until) {
          val id = fourcc(bytes, p)
          val sz = u32le(bytes, p + 4).toInt
          val payload = p + 8
          if (sz < 0 || payload + sz > until) return // truncated/corrupt
          if (id == "LIST" && sz >= 4) {
            walk(payload + 4, payload + sz, depth + 1) // skip the list-type fourcc
          } else if (id == "avih" && sz >= 40) {
            width = u32le(bytes, payload + 32).toInt
            height = u32le(bytes, payload + 36).toInt
          } else if (id == "strh" && sz >= 4) {
            // remember which stream the next strf describes — an AVI may
            // order its audio strl before the video strl, and reading a
            // WAVEFORMATEX as BITMAPINFOHEADER would mislabel the file
            inVideoStream = fourcc(bytes, payload) == "vids"
            if (inVideoStream && videoStreamIdx == -1) videoStreamIdx = strhSeen
            strhSeen += 1
          } else if (id == "strf" && sz >= 20 && inVideoStream &&
            compression == -1L) {
            bitCount = u16le(bytes, payload + 14)   // BITMAPINFOHEADER
            compression = u32le(bytes, payload + 16)
          } else if (id.endsWith("db")) { // uncompressed DIB frame chunk
            dbFrames.getOrElseUpdate(id.take(2),
              scala.collection.mutable.ArrayBuffer.empty) += ((payload, sz))
          } else if (id.endsWith("dc")) { // compressed frame (JPEG if MJPG)
            dcFrames.getOrElseUpdate(id.take(2),
              scala.collection.mutable.ArrayBuffer.empty) += ((payload, sz))
          }
          p = payload + sz + (sz & 1)
        }
      }
      walk(12, bytes.length, 0)

      // pick the VIDEO stream's frame chunks: the prefix matching the
      // vids strl's stream number when present — decimal per the AVI
      // spec, with the uppercase-hex spelling some muxers emit for
      // streams >= 10 accepted as a fallback (identical for 0-9); a
      // lone prefix otherwise (sloppy muxers number streams
      // inconsistently — a single stream is unambiguous regardless of
      // its label); ambiguous multi-stream files with no matching
      // prefix degrade to the stub rather than decoding some other
      // stream's frames as video
      def streamFrames(m: scala.collection.mutable.LinkedHashMap[String,
          scala.collection.mutable.ArrayBuffer[(Int, Int)]]) = {
        val dec = f"$videoStreamIdx%02d"
        val hex = f"$videoStreamIdx%02X"
        if (videoStreamIdx >= 0 && m.contains(dec)) m(dec)
        else if (videoStreamIdx >= 0 && m.contains(hex)) m(hex)
        else if (m.size == 1) m.head._2
        else scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      }
      val frames = streamFrames(dbFrames)
      val jpegFrames = streamFrames(dcFrames)

      if (MjpgFourccs.contains(compression) && jpegFrames.nonEmpty)
        return decodeMjpegFrames(bytes, jpegFrames, dim)
      if (width <= 0 || height <= 0 || compression != 0L || bitCount != 24 ||
        frames.isEmpty) return None
      val rowSize = ((width * 3 + 3) / 4) * 4
      val usable = frames.filter(_._2 >= rowSize * height)
      if (usable.isEmpty) return None

      def meanLum(off: Int): Float =
        gridMeanLum(width, height, (x, y) => {
          val p = off + (height - 1 - y) * rowSize + x * 3 // bottom-up BGR
          ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
            (bytes(p) & 0xff)
        })

      val out = new Array[Float](dim)
      val cache = scala.collection.mutable.HashMap.empty[Int, Float]
      var w = 0
      while (w < dim) {
        val fi = (w.toLong * usable.length / dim).toInt
        out(w) = cache.getOrElseUpdate(fi, meanLum(usable(fi)._1))
        w += 1
      }
      Some((width, height, out))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** MJPEG branch of [[decodeVideo]]: each `00dc` chunk is a complete
    * JPEG. Only the ≤`dim` distinct frames the luminance windows sample
    * are decoded (memoized), so a 10-minute clip costs the same as a
    * `dim`-frame one. Dimensions come from the first decoded frame.
    * Any sampled frame that `javax.imageio` cannot decode (e.g. the
    * table-less MJPEG variant some hardware muxers emit) fails the whole
    * clip to None → callers degrade to the labeled stub rather than
    * returning half-real features. */
  private def decodeMjpegFrames(bytes: Array[Byte], jpegFrames: scala.collection.mutable.ArrayBuffer[(Int, Int)],
      dim: Int): Option[(Int, Int, Array[Float])] = {
    def decodeFrame(off: Int, len: Int): Option[(Int, Int, Float)] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes, off, len))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some((img.getWidth, img.getHeight,
        gridMeanLum(img.getWidth, img.getHeight, img.getRGB)))
    }
    val cache = scala.collection.mutable.HashMap.empty[Int, Option[(Int, Int, Float)]]
    val out = new Array[Float](dim)
    var width = 0
    var height = 0
    var w = 0
    while (w < dim) {
      val fi = (w.toLong * jpegFrames.length / dim).toInt
      val (off, len) = jpegFrames(fi)
      cache.getOrElseUpdate(fi, decodeFrame(off, len)) match {
        case Some((fw, fh, lum)) =>
          if (width == 0) { width = fw; height = fh }
          out(w) = lum
        case None => return None
      }
      w += 1
    }
    if (width <= 0 || height <= 0) None else Some((width, height, out))
  }

  /** Feature extraction: partition-parallel decode of opaque media bytes.
    * Image, audio, and AVI video rows (BI_RGB or MJPEG streams) decode
    * for real (dimensions + RGB histogram / sample-rate + channels + RMS
    * windows / frame dims + luminance); codec-requiring video and
    * undecodable payloads take the labeled stub path with -1 dims. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    // validated on the DRIVER: the image decoder needs one bin per RGB
    // channel, and a per-task require would fail the job only after
    // tasks launch
    require(dim >= 3, s"extractFeatures needs dim >= 3, got $dim")
    media.mapPartitions { rows =>
      rows.map { m =>
        val decoded = m.kind match {
          case "image" => decodeImage(m.content, dim)
          case "audio" => decodeAudio(m.content, dim)
          case "video" => decodeVideo(m.content, dim)
          case _       => None
        }
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
