package graft.operators

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(Tables.load(spark, sfDir, "documents"))

  test("BMP codec round-trips pixels through padding and bottom-up rows") {
    // width 5 forces 3 pad bytes per row; values span the byte range
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => ((i * 37 + 200) % 256).toByte)
    val bmp = Multimodal.encodeBmp8(px, w, h)
    assert(bmp.length == Multimodal.bmpSize(w, h))
    val (decoded, dw, dh, size) = Multimodal.decodeBmp8(bmp, 0)
    assert((dw, dh, size) == ((w, h, bmp.length)))
    assert(decoded.sameElements(px))
  }

  test("WAV codec round-trips samples via RIFF chunk walk") {
    val samples = Array.tabulate(300)(i => (i % 256).toByte)
    val wav = Multimodal.encodeWavU8(samples)
    assert(wav.length == 44 + samples.length)
    assert(Multimodal.decodeWavU8(wav).sameElements(samples))
  }

  test("video container round-trips frames") {
    val w = 4; val h = 4
    val frames = (0 until 3).map(f => Array.fill(w * h)(f.toByte))
    val video = Multimodal.encodeVideo(frames, w, h)
    val decoded = Multimodal.decodeVideo(video)
    assert(decoded.length == 3)
    decoded.zip(frames).foreach { case (d, f) => assert(d.sameElements(f)) }
  }

  test("synthesized media covers all modalities with parseable payloads") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video"))
    rows.foreach { m =>
      assert(m.payload.nonEmpty && m.width >= 16 && m.height >= 16)
      val content = Multimodal.decodeContent(m.payload)
      m.modality match {
        case "image" => assert(content.length == m.width * m.height)
        case "audio" => assert(content.length > 0)
        case "video" => assert(content.length == m.n_frames * m.width * m.height)
      }
    }
  }

  test("feature extraction: histogram mass equals decoded content length") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.hist8.sum == f.content_len, "histogram mass must equal content bytes")
      assert(f.byte_len > f.content_len, "container must carry header overhead")
      assert(f.mean_byte >= 0.0 && f.mean_byte <= 255.0)
    }
  }

  test("frame sampling decodes every stride-th frame") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    val dims = media.filter(_.modality == "video").collect()
      .map(m => m.media_id -> (m.width * m.height)).toMap
    frames.foreach { fr =>
      assert(fr.frame_bytes.length == dims(fr.media_id))
      assert(fr.frame_idx % 2 == 0)
    }
  }

  test("resize: identity size is bit-identical; downscale picks expected pixels") {
    import spark.implicits._
    // 4x2 image with a known gradient; downscale to 2x1 must pick
    // nearest-neighbor sources (0,0) and (0,2): values 0 and 2
    val px = Array[Byte](0, 1, 2, 3, 10, 11, 12, 13)
    val item = Multimodal.MediaItem(1L, "image",
      Multimodal.encodeBmp8(px, 4, 2), 4, 2, 1)
    val ds = Seq(item).toDS()
    val same = Multimodal.resizeImages(ds, 4, 2).collect().head
    assert(java.util.Arrays.equals(same.payload, item.payload))
    val small = Multimodal.resizeImages(ds, 2, 1).collect().head
    val (spx, sw, sh, _) = Multimodal.decodeBmp8(small.payload, 0)
    assert((sw, sh) == (2, 1) && small.width == 2 && small.height == 1)
    assert(spx.toSeq == Seq[Byte](0, 2).toSeq)
    // non-image rows pass through untouched
    val wav = Multimodal.MediaItem(2L, "audio",
      Multimodal.encodeWavU8(Array[Byte](1, 2, 3)), 0, 0, 0)
    val out = Multimodal.resizeImages(Seq(wav).toDS(), 2, 1).collect().head
    assert(java.util.Arrays.equals(out.payload, wav.payload))
  }
}
