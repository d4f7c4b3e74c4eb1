package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based roundtrips for the pure-JVM media codecs: any pixel/sample
  * content of any size must survive encode→decode bit-exactly, and container
  * sizes must match the documented layout formulas the DuckDB oracles
  * recompute. No SparkSession needed — these are the partition-local kernels.
  */
object MultimodalPropertySpec extends Properties("MultimodalCodecs") {

  private val dims: Gen[(Int, Int)] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
  } yield (w, h)

  property("bmpRoundtrip") = forAll(dims, Gen.long) { case ((w, h), seed) =>
    val rnd = new scala.util.Random(seed)
    val px = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val bmp = Multimodal.encodeBmp8(px, w, h)
    val (back, dw, dh, size) = Multimodal.decodeBmp8(bmp, 0)
    Prop.all(
      Prop(bmp.length == Multimodal.bmpSize(w, h)) :| "container size formula",
      Prop(dw == w && dh == h && size == bmp.length) :| "decoded header fields",
      Prop(back.sameElements(px)) :| "pixels bit-exact (bottom-up rows + padding)")
  }

  property("wavRoundtrip") = forAll(Gen.choose(0, 3000), Gen.long) { (n, seed) =>
    val rnd = new scala.util.Random(seed)
    val samples = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
    val wav = Multimodal.encodeWavU8(samples)
    Prop.all(
      Prop(wav.length == 44 + n) :| "canonical 44-byte header",
      Prop(Multimodal.decodeWavU8(wav).sameElements(samples)) :| "samples bit-exact")
  }

  property("videoRoundtrip") = forAll(dims, Gen.choose(1, 6), Gen.long) {
    case ((w, h), nf, seed) =>
      val rnd = new scala.util.Random(seed)
      val frames = Seq.fill(nf)(Array.fill[Byte](w * h)(rnd.nextInt(256).toByte))
      val vid = Multimodal.encodeVideo(frames, w, h)
      val back = Multimodal.decodeVideo(vid)
      Prop.all(
        Prop(back.length == nf) :| "frame count",
        Prop(frames.zip(back).forall { case (a, b) => b.sameElements(a) }) :| "frames bit-exact",
        Prop(Multimodal.decodeContent(vid).sameElements(Array.concat(frames: _*)))
          :| "decodeContent concatenates frames in order")
  }
}
