package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * Payloads are REAL container formats, built and parsed in pure JVM:
  *  - image: 8-bit grayscale BMP (BITMAPINFOHEADER + 256-entry gray palette,
  *    bottom-up rows, 4-byte row padding) — the standard uncompressed layout.
  *  - audio: WAV, PCM unsigned 8-bit mono (44-byte canonical header), decoded
  *    by walking the RIFF chunk list to the `data` chunk.
  *  - video: a frame-sequence container `"GFV0" + u32LE n_frames` followed by
  *    n_frames concatenated BMP frames (an MJPEG-style concatenation, with
  *    BMP standing in for JPEG since no lossy codecs ship with a stock JVM).
  *
  * The decode step is therefore a genuine bytes→samples parser (magic checks,
  * header offsets, padding, bottom-up row order); only the *codec zoo* is
  * reduced to the formats a bare JVM can honour. Features are
  * order-independent (histogram / sum over decoded content bytes) so the
  * correctness oracle can recompute them from the source bytes without
  * re-implementing the container layout.
  *
  * Scale notes: payloads stay opaque binary end-to-end (never exploded to
  * rows), `mapPartitions` processes one partition per task with O(item)
  * memory, and feature extraction emits fixed-width rows so downstream
  * operators are ordinary columnar aggregations. On a real cluster the media
  * table would be written with a small `maxRecordsPerFile` so tasks stay
  * payload-bound, not row-bound.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Long, // container size (payload bytes)
      content_len: Long, // decoded samples/pixels
      sum_bytes: Long,
      mean_byte: Double,
      hist8: Array[Long])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  // ── codecs ────────────────────────────────────────────────────────────────

  private val BmpHeaderSize = 14 + 40 + 256 * 4 // file header + info + palette

  private def rowStride(w: Int): Int = (w + 3) / 4 * 4

  def bmpSize(w: Int, h: Int): Int = BmpHeaderSize + rowStride(w) * h

  /** Encode top-down `w`×`h` 8-bit pixels as a grayscale BMP. */
  def encodeBmp8(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"need $w*$h pixels, got ${pixels.length}")
    val stride = rowStride(w)
    val buf = ByteBuffer.allocate(bmpSize(w, h)).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(bmpSize(w, h))
      .putShort(0).putShort(0).putInt(BmpHeaderSize) // reserved, pixel offset
    buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up rows
      .putShort(1).putShort(8).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(256).putInt(0)
    var i = 0
    while (i < 256) { // gray palette: (b, g, r, 0)
      buf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
    }
    var row = h - 1 // bottom-up
    while (row >= 0) {
      buf.put(pixels, row * w, w)
      var p = w
      while (p < stride) { buf.put(0.toByte); p += 1 }
      row -= 1
    }
    buf.array()
  }

  /** Parse a BMP at `off`; returns (top-down pixels, width, height, container
    * size) — honours the header's pixel-data offset, bottom-up row order and
    * row padding. */
  def decodeBmp8(bytes: Array[Byte], off: Int): (Array[Byte], Int, Int, Int) = {
    val buf = ByteBuffer.wrap(bytes, off, bytes.length - off).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes(off) == 'B' && bytes(off + 1) == 'M', "not a BMP payload")
    val fileSize = buf.getInt(off + 2)
    val dataOff = buf.getInt(off + 10)
    val w = buf.getInt(off + 18)
    val h = buf.getInt(off + 22)
    val bpp = buf.getShort(off + 28)
    require(bpp == 8, s"only 8-bit BMP supported, got $bpp")
    val stride = rowStride(w)
    val pixels = new Array[Byte](w * h)
    var row = 0
    while (row < h) {
      // stored bottom-up: file row `row` is image row `h - 1 - row`
      System.arraycopy(bytes, off + dataOff + row * stride, pixels, (h - 1 - row) * w, w)
      row += 1
    }
    (pixels, w, h, fileSize)
  }

  /** Encode unsigned-8-bit mono PCM samples as a canonical 44-byte-header WAV. */
  def encodeWavU8(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val buf = ByteBuffer.allocate(44 + samples.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate) // byte rate = rate × 1 × 1
      .putShort(1).putShort(8) // block align, bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(samples.length)
    buf.put(samples)
    buf.array()
  }

  /** Parse a WAV payload: verify RIFF/WAVE magic, walk the chunk list to
    * `data`, return the sample bytes. */
  def decodeWavU8(bytes: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV payload")
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val size = buf.getInt(off + 4)
      if (id == "data") return java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException("WAV payload has no data chunk")
  }

  private val VideoMagic = "GFV0".getBytes("US-ASCII")

  /** Encode a frame sequence: magic + u32LE frame count + concatenated BMPs. */
  def encodeVideo(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val encoded = frames.map(encodeBmp8(_, w, h))
    val buf = ByteBuffer.allocate(8 + encoded.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(VideoMagic).putInt(frames.length)
    encoded.foreach(buf.put)
    buf.array()
  }

  /** Parse the frame container into per-frame top-down pixel arrays. */
  def decodeVideo(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.take(4).sameElements(VideoMagic), "not a GFV0 video payload")
    val n = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
    var off = 8
    (0 until n).map { _ =>
      val (pixels, _, _, size) = decodeBmp8(bytes, off)
      off += size
      pixels
    }
  }

  /** Decoded content bytes of any payload, dispatched on magic. */
  def decodeContent(payload: Array[Byte]): Array[Byte] =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      decodeBmp8(payload, 0)._1
    else if (payload.length >= 4 && new String(payload, 0, 4, "US-ASCII") == "RIFF")
      decodeWavU8(payload)
    else if (payload.length >= 4 && payload.take(4).sameElements(VideoMagic))
      decodeVideo(payload).toArray.flatten
    else throw new IllegalArgumentException("unrecognized payload magic")

  // ── pipeline stages ───────────────────────────────────────────────────────

  /** First `n` bytes of `src`, zero-padded — the content rule for fixed-size
    * raster/frame targets. Mirrored by the oracle (`i <= len ? byte_i : 0`). */
  private def fitTo(src: Array[Byte], n: Int): Array[Byte] =
    java.util.Arrays.copyOf(src, n)

  /** Deterministic synthetic media table derived from `documents`: the
    * document's UTF-8 bytes become the pixels/samples, wrapped in a REAL
    * container per modality. Stands in for a binary ingest of encoded media
    * (e.g. parquet BYTE_ARRAY columns). */
  def synthesize(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val w = (id % 64 + 16).toInt
        val h = (id % 48 + 16).toInt
        val nf = (id % 8 + 1).toInt
        (id % 3) match {
          case 0 => MediaItem(id, "image", encodeBmp8(fitTo(bytes, w * h), w, h), w, h, 1)
          case 1 => MediaItem(id, "audio", encodeWavU8(bytes), w, h, 1)
          case _ =>
            val frames = (0 until nf).map { f =>
              fitTo(bytes.drop(f * w * h), w * h)
            }
            MediaItem(id, "video", encodeVideo(frames, w, h), w, h, nf)
        }
      }
  }

  /** Batch feature extraction over partitions: real container decode, then
    * byte length, content length, sum, mean and an 8-bucket value histogram
    * per item. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val content = decodeContent(m.payload)
        val hist = new Array[Long](8)
        var sum = 0L
        content.foreach { b => val v = b & 0xff; hist(v / 32) += 1; sum += v }
        MediaFeatures(m.media_id, m.modality, m.payload.length.toLong,
          content.length.toLong, sum,
          if (content.isEmpty) 0.0 else sum.toDouble / content.length, hist)
      }
    }
  }

  /** Nearest-neighbor resize for "image" payloads: decode the BMP, resample
    * `pixels[y·h/outH][x·w/outW]`, re-encode. Non-image rows pass through
    * untouched. Runs as a per-row map (O(item) memory, no shuffle) — the
    * standard preprocessing step before feature extraction in a training
    * pipeline; nearest-neighbor keeps it integer-exact and deterministic,
    * so the resized container round-trips bit-identically on every engine. */
  def resizeImages(media: Dataset[MediaItem], outW: Int, outH: Int): Dataset[MediaItem] = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.modality != "image") m
      else {
        val (px, w, h, _) = decodeBmp8(m.payload, 0)
        val dst = Array.ofDim[Byte](outW * outH)
        var y = 0
        while (y < outH) {
          val sy = y.toLong * h / outH
          var x = 0
          while (x < outW) {
            dst(y * outW + x) = px((sy * w + x.toLong * w / outW).toInt)
            x += 1
          }
          y += 1
        }
        m.copy(payload = encodeBmp8(dst, outW, outH), width = outW, height = outH)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th frame of the
    * container, decoded to its top-down pixel array. */
  def sampleFrames(media: Dataset[MediaItem], stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val frames = decodeVideo(m.payload)
      (0 until frames.length by stride).map(i => Frame(m.media_id, i, frames(i)))
    }
  }
}
