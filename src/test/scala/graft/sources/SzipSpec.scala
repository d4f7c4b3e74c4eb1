package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The szip codec (HDF5 filter 4, CCSDS 121.0-B extended-Rice): encoder ↔
  * decoder round-trips across sample widths, option sets, and block
  * geometries, plus hand-built bitstreams pinning the low-entropy paths
  * and the defilter wiring. */
class SzipSpec extends AnyFunSuite {

  private def client(mask: Int, bpp: Int, ppb: Int, pps: Int) =
    Seq(mask, bpp, ppb, pps)

  private def pack(vals: Seq[Long], bpp: Int, lsb: Boolean): Array[Byte] = {
    val bytesPer = (bpp + 7) / 8
    val out = new Array[Byte](vals.length * bytesPer)
    vals.zipWithIndex.foreach { case (v, i) =>
      (0 until bytesPer).foreach { b =>
        val shifted = ((v >>> ((bytesPer - 1 - b) * 8)) & 0xff).toByte
        out(i * bytesPer + (if (lsb) bytesPer - 1 - b else b)) = shifted
      }
    }
    out
  }

  private def roundTrip(vals: Seq[Long], mask: Int, bpp: Int, ppb: Int,
      pps: Int): Unit = {
    val lsb = (mask & Szip.LsbMask) != 0
    val raw = pack(vals, bpp, lsb)
    val comp = Szip.compress(raw, client(mask, bpp, ppb, pps))
    val back = Szip.decompress(comp, client(mask, bpp, ppb, pps), raw.length)
    assert(back.toSeq == raw.toSeq,
      s"round-trip mismatch (mask=$mask bpp=$bpp ppb=$ppb pps=$pps)")
  }

  test("smooth data round-trips and compresses (NN + MSB, 16-bit)") {
    val vals = (0 until 512).map(i => (1000 + 40 * math.sin(i * 0.1)).toLong)
    val mask = Szip.NnMask | Szip.EcMask | Szip.MsbMask | Szip.AllowK13Mask
    val raw = pack(vals, 16, lsb = false)
    val comp = Szip.compress(raw, client(mask, 16, 16, 128))
    assert(comp.length < raw.length / 2, "smooth data must actually compress")
    assert(Szip.decompress(comp, client(mask, 16, 16, 128), raw.length).toSeq
      == raw.toSeq)
  }

  test("round-trips across widths, orders, block sizes, and scanlines") {
    val rnd = new scala.util.Random(7)
    for {
      bpp <- Seq(8, 16, 24, 32)
      ppb <- Seq(8, 16, 32)
      nn <- Seq(0, Szip.NnMask)
      lsb <- Seq(Szip.MsbMask, Szip.LsbMask)
    } {
      val mask = nn | lsb | Szip.EcMask
      val xMax = (1L << bpp) - 1
      // mixed regimes: smooth, noisy, constant, zero
      val vals = (0 until 300).map { i =>
        if (i < 75) (i * 3) & xMax
        else if (i < 150) rnd.nextLong() & xMax
        else if (i < 225) 42L & xMax
        else 0L
      }
      roundTrip(vals, mask, bpp, ppb, pps = 100) // partial scanlines + padding
      roundTrip(vals, mask, bpp, ppb, pps = 300)
    }
  }

  test("all-zero and all-max extremes round-trip (zero-run + ROS paths)") {
    val mask = Szip.NnMask | Szip.MsbMask
    roundTrip(Seq.fill(2048)(0L), mask, 8, 8, 512) // long zero runs, 64-block segments
    roundTrip(Seq.fill(100)(255L), mask, 8, 8, 64)
    roundTrip(Seq.fill(130)(65535L), mask, 16, 16, 128)
    // alternating extremes: worst case for prediction, exercises uncomp
    roundTrip((0 until 64).map(i => if (i % 2 == 0) 0L else 255L), mask, 8, 8, 64)
  }

  test("scanline independence: one scanline per chunk row decodes in isolation") {
    // values chosen so each 10-pixel scanline has a different character
    val vals = (0 until 40).map {
      case i if i < 10 => 7L
      case i if i < 20 => (i * 11L) % 256
      case i if i < 30 => 0L
      case i => 255L - i
    }
    roundTrip(vals, Szip.NnMask | Szip.MsbMask, 8, 10, 10)
  }

  test("hand-built k-split stream decodes (no preprocessing)") {
    // bpp=8 → idLen=3; one block of 8 samples, k=2 (id=3):
    // FS MSBs then 2-bit LSBs, samples = 4*q + r
    val samples = Seq(0, 1, 2, 3, 4, 5, 6, 7).map(_.toLong)
    val q = samples.map(_ >> 2); val r = samples.map(_ & 3)
    val bits = new StringBuilder("011") // id=3 → k=2
    q.foreach(v => bits.append("0" * v.toInt).append("1"))
    r.foreach(v => bits.append(("00" + v.toBinaryString).takeRight(2)))
    val padded = bits.toString.padTo((bits.length + 7) / 8 * 8, '0')
    val data = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val got = Szip.decompress(data, client(Szip.MsbMask, 8, 8, 8), 8)
    assert(got.toSeq == samples.map(_.toByte))
  }

  test("hand-built zero-block + uncompressed stream decodes") {
    // two blocks: first zero-run of 1 (id=0, ext=0, fs=0), second
    // uncompressed (id=7), samples 8..15
    val bits = new StringBuilder("000" + "0" + "1") // zero block ×1
    bits.append("111")
    (8 until 16).foreach(v => bits.append(("0000000" + v.toBinaryString).takeRight(8)))
    val padded = bits.toString.padTo((bits.length + 7) / 8 * 8, '0')
    val data = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val got = Szip.decompress(data, client(Szip.MsbMask, 8, 8, 16), 16)
    assert(got.toSeq == (Seq.fill(8)(0) ++ (8 until 16)).map(_.toByte))
  }

  test("hand-built second-extension stream decodes") {
    // one block of 8 samples in pairs (a,b): γ = (a+b)(a+b+1)/2 + b
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2L, 1L))
    val bits = new StringBuilder("000" + "1") // id=0, ext=1 → SE
    pairs.foreach { case (a, b) =>
      val g = (a + b) * (a + b + 1) / 2 + b
      bits.append("0" * g.toInt).append("1")
    }
    val padded = bits.toString.padTo((bits.length + 7) / 8 * 8, '0')
    val data = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val got = Szip.decompress(data, client(Szip.MsbMask, 8, 8, 8), 8)
    assert(got.toSeq == pairs.flatMap(p => Seq(p._1, p._2)).map(_.toByte))
  }

  test("raw option passes the chunk through") {
    val raw = Array.tabulate(64)(i => (i * 7).toByte)
    val c = client(Szip.RawMask | Szip.MsbMask, 8, 8, 64)
    assert(Szip.compress(raw, c).toSeq == raw.toSeq)
    assert(Szip.decompress(raw, c, 64).toSeq == raw.toSeq)
  }

  test("defilter strips H5Z__filter_szip's 4-byte stored-size header") {
    val vals = (0 until 96).map(i => (i * 5L) % 251)
    val cvals = Seq(Szip.NnMask | Szip.EcMask | Szip.MsbMask, 8, 8, 32)
    val raw = pack(vals, 8, lsb = false)
    // the real filter UINT32ENCODEs the uncompressed byte count (LE) ahead
    // of the headerless Rice stream — build the chunk exactly as HDF5 does
    val body = Szip.compress(raw, cvals)
    val comp = Array[Byte](96, 0, 0, 0) ++ body
    val got = Hdf5.defilter(comp, Seq(Hdf5.Filter(4, cvals)), 0, expectedBytes = 96)
    assert(got.toSeq == raw.toSeq)
    // the stored size alone drives the decode when geometry is absent
    assert(Hdf5.defilter(comp, Seq(Hdf5.Filter(4, cvals)), 0).toSeq == raw.toSeq)
    // masked-out szip filter (failed on write) passes through untouched
    assert(Hdf5.defilter(raw, Seq(Hdf5.Filter(4, cvals)), 1, 96).toSeq == raw.toSeq)
    // a stored size that disagrees with the chunk geometry is a named error
    val e = intercept[IllegalArgumentException](
      Hdf5.defilter(Array[Byte](95, 0, 0, 0) ++ body,
        Seq(Hdf5.Filter(4, cvals)), 0, expectedBytes = 96))
    assert(e.getMessage.contains("szip"))
  }

  test("unsupported widths and geometries fail by name") {
    val e = intercept[IllegalArgumentException](
      Szip.decompress(Array[Byte](0), Seq(Szip.MsbMask, 64, 8, 64), 8))
    assert(e.getMessage.contains("1..32"))
    val e2 = intercept[IllegalArgumentException](
      Szip.decompress(Array[Byte](0), Seq(Szip.MsbMask, 8, 7, 64), 8))
    assert(e2.getMessage.contains("pixels_per_block"))
  }
}
