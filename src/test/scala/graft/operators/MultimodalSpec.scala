package graft.operators

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(Tables.load(spark, sfDir, "documents"))

  test("synthesized media covers all modalities with payloads") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video"))
    rows.foreach { m => assert(m.payload.nonEmpty && m.width >= 16 && m.height >= 16) }
  }

  test("feature extraction: histogram mass equals byte length, mean in range") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.hist8.sum == f.byte_len, "histogram mass must equal byte count")
      assert(f.mean_byte >= 0.0 && f.mean_byte <= 255.0)
    }
  }

  test("frame sampling slices video payloads deterministically") {
    val frames = Multimodal.sampleFrames(media, frameLen = 16, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { fr =>
      assert(fr.frame_bytes.length == 16)
      assert(fr.frame_idx % 2 == 0)
    }
  }
}
