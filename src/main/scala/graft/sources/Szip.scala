package graft.sources

/** The HDF5 szip filter (pipeline id 4): extended-Rice entropy coding per
  * CCSDS 121.0-B ("Lossless Data Compression", the public Blue Book the
  * szip library implements — szip/libaec are the reference codecs HDF5
  * links; common in older NASA products, e.g. MODIS L1B).
  *
  * Filter client values, in the order H5Zszip.c stores them
  * (H5Z_SZIP_PARM_MASK/BPP/BPB/PPS):
  * `[options_mask, bits_per_pixel, pixels_per_block, pixels_per_scanline]`.
  *
  * Codec shape (CCSDS 121.0-B-3 §3–§5):
  *  - samples are unsigned `bits_per_pixel`-bit integers (≤ 32 — HDF5
  *    rejects szip for wider types, H5Zszip.c "datatype precision must be
  *    in the range 1..32"), laid out in the chunk buffer with the byte
  *    order the LSB/MSB option flag records;
  *  - each SCANLINE (`pixels_per_scanline` samples) is an independent
  *    reference-sample interval, padded to whole blocks of
  *    `pixels_per_block` samples by replicating its last sample;
  *  - with the nearest-neighbor option (SZ_NN_OPTION_MASK) each scanline
  *    opens with one raw reference sample and codes the standard
  *    unit-delay mapped prediction residuals (§4.2);
  *  - per block, a winner-take-all option id (3/4/5 bits for 8/16/32-bit
  *    samples): 0+'0' = zero-block run (segment = 64 blocks, ROS marker),
  *    0+'1' = second extension, 1..max−1 = k-split (k = id−1: fundamental-
  *    sequence MSBs then k raw LSBs per sample), max = uncompressed;
  *  - SZ_RAW_OPTION_MASK short-circuits the whole chunk as stored-raw.
  *
  * Documented limitation: a second-extension option on a block carrying
  * the reference sample is rejected by name (the encoder here never emits
  * that combination, and CCSDS leaves its pairing convention to the
  * implementation). */
object Szip {
  // szlib.h option flags
  val AllowK13Mask = 1
  val ChipMask = 2
  val EcMask = 4
  val LsbMask = 8
  val MsbMask = 16
  val NnMask = 32
  val RawMask = 128

  private val RosFs = 4 // FS value marking "remainder of segment" zero run
  private val SegmentBlocks = 64

  final case class Params(mask: Int, bpp: Int, ppb: Int, pps: Int) {
    require(bpp >= 1 && bpp <= 32,
      s"szip bits_per_pixel $bpp unsupported — HDF5 restricts szip to " +
        "1..32-bit samples (H5Zszip.c precision range check)")
    require(ppb >= 2 && ppb <= 32 && ppb % 2 == 0,
      s"szip pixels_per_block $ppb out of range (even, 2..32)")
    require(pps >= ppb, s"szip pixels_per_scanline $pps < pixels_per_block $ppb")
    val bytesPer: Int = (bpp + 7) / 8
    val lsbFirst: Boolean = (mask & LsbMask) != 0
    val nn: Boolean = (mask & NnMask) != 0
    val idLen: Int = if (bpp <= 8) 3 else if (bpp <= 16) 4 else 5
    val uncompId: Int = (1 << idLen) - 1
    val maxK: Int = math.min((1 << idLen) - 3, bpp - 1)
    val xMax: Long = (1L << bpp) - 1
  }

  def params(client: Seq[Int]): Params = {
    require(client.length >= 4,
      s"szip filter stores 4 client values (mask, bpp, ppb, pps), got ${client.length}")
    Params(client(0), client(1), client(2), client(3))
  }

  // ── bit I/O, MSB-first within and across bytes ─────────────────────────

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0 // bit position
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val byte = pos >>> 3
        require(byte < data.length, "szip stream truncated")
        v = (v << 1) | ((data(byte) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    /** Fundamental-sequence value: count of 0 bits before the next 1. */
    def fs(): Long = {
      var v = 0L
      while (bits(1) == 0L) {
        v += 1
        require(v <= (1L << 32), "szip fundamental sequence runaway (corrupt stream)")
      }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nCur = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nCur += 1
        if (nCur == 8) { out.write(cur); cur = 0; nCur = 0 }
        i -= 1
      }
    }
    def fs(v: Long): Unit = { var i = 0L; while (i < v) { bits(0, 1); i += 1 }; bits(1, 1) }
    def result(): Array[Byte] = {
      if (nCur > 0) { out.write(cur << (8 - nCur)); cur = 0; nCur = 0 }
      out.toByteArray
    }
  }

  // ── sample buffer I/O (LSB/MSB byte order) ─────────────────────────────

  private def readSample(data: Array[Byte], i: Int, p: Params): Long = {
    var v = 0L
    var b = 0
    while (b < p.bytesPer) {
      val idx = i * p.bytesPer + (if (p.lsbFirst) p.bytesPer - 1 - b else b)
      v = (v << 8) | (data(idx) & 0xffL)
      b += 1
    }
    v & p.xMax
  }

  private def writeSample(out: Array[Byte], i: Int, v: Long, p: Params): Unit = {
    var b = 0
    while (b < p.bytesPer) {
      val idx = i * p.bytesPer + (if (p.lsbFirst) p.bytesPer - 1 - b else b)
      out(idx) = ((v >>> ((p.bytesPer - 1 - b) * 8)) & 0xff).toByte
      b += 1
    }
  }

  // ── the standard unit-delay mapper and its inverse (CCSDS §4.2) ────────

  private def mapDelta(x: Long, prev: Long, xMax: Long): Long = {
    val theta = math.min(prev, xMax - prev)
    val d = x - prev
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) -2 * d - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(m: Long, prev: Long, xMax: Long): Long = {
    val theta = math.min(prev, xMax - prev)
    val d =
      if (m <= 2 * theta) { if (m % 2 == 0) m / 2 else -((m + 1) / 2) }
      else if (theta == prev) m - theta // downside clamped → overflow is upward
      else -(m - theta)
    prev + d
  }

  // ── decompress ─────────────────────────────────────────────────────────

  /** Decode one szip chunk into `expectedBytes` of sample data. */
  def decompress(data: Array[Byte], client: Seq[Int], expectedBytes: Int): Array[Byte] = {
    val p = params(client)
    if ((p.mask & RawMask) != 0) return java.util.Arrays.copyOf(data, expectedBytes)
    require(expectedBytes % p.bytesPer == 0,
      s"szip chunk of $expectedBytes bytes is not a multiple of ${p.bytesPer}-byte samples")
    val totalPixels = expectedBytes / p.bytesPer
    val out = new Array[Byte](expectedBytes)
    val r = new BitReader(data)
    var emitted = 0
    while (emitted < totalPixels) {
      val scanPixels = math.min(p.pps, totalPixels - emitted)
      val nBlocks = (scanPixels + p.ppb - 1) / p.ppb
      val padded = nBlocks * p.ppb
      val samples = new Array[Long](padded)
      var s = 0
      if (p.nn) { samples(0) = r.bits(p.bpp); s = 1 }
      var b = 0
      while (b < nBlocks) {
        val blockStart = b * p.ppb
        val blockEnd = blockStart + p.ppb
        // a zero-run may have already filled past this block
        if (s < blockEnd) {
          val id = r.bits(p.idLen).toInt
          if (id == p.uncompId) {
            while (s < blockEnd) { samples(s) = r.bits(p.bpp); s += 1 }
          } else if (id == 0) {
            if (r.bits(1) == 1L) {
              // second extension: pairs of samples from one FS value each
              require(s == blockStart,
                "szip: second-extension option on a reference-carrying block " +
                  "is not supported (documented limitation; the szip encoder " +
                  "here never emits it)")
              while (s < blockEnd) {
                val gamma = r.fs()
                var m = 0L
                while ((m + 1) * (m + 2) / 2 <= gamma) m += 1
                val bVal = gamma - m * (m + 1) / 2
                val aVal = m - bVal
                samples(s) = aVal; samples(s + 1) = bVal
                s += 2
              }
            } else {
              // zero-block run: FS+1 blocks; 5 = remainder-of-segment
              val fsv = r.fs()
              val segStart = (b / SegmentBlocks) * SegmentBlocks
              val run =
                if (fsv == RosFs) math.min(segStart + SegmentBlocks, nBlocks) - b
                else if (fsv + 1 > RosFs + 1) fsv.toInt // fs ≥ 5 → fs blocks
                else fsv.toInt + 1 // fs 0..3 → 1..4 blocks
              val runEnd = (b + run) * p.ppb
              require(run >= 1 && b + run <= nBlocks,
                s"szip zero-block run of $run blocks overruns the scanline")
              while (s < runEnd) { samples(s) = 0L; s += 1 }
              b += run - 1 // loop ++ lands on the block after the run
            }
          } else {
            // k-split: FS MSBs for the block, then k raw LSBs per sample
            val k = id - 1
            val from = s
            while (s < blockEnd) { samples(s) = r.fs() << k; s += 1 }
            if (k > 0) {
              var i = from
              while (i < blockEnd) { samples(i) |= r.bits(k); i += 1 }
            }
          }
        }
        b += 1
      }
      // un-preprocess + emit the real (non-padding) samples
      if (p.nn) {
        var prev = samples(0)
        var i = 1
        while (i < padded) {
          prev = unmapDelta(samples(i), prev, p.xMax)
          samples(i) = prev
          i += 1
        }
      }
      var i = 0
      while (i < scanPixels) {
        writeSample(out, emitted + i, samples(i), p)
        i += 1
      }
      emitted += scanPixels
    }
    out
  }

  // ── compress (the write/test dual) ─────────────────────────────────────

  def compress(data: Array[Byte], client: Seq[Int]): Array[Byte] = {
    val p = params(client)
    if ((p.mask & RawMask) != 0) return data.clone()
    require(data.length % p.bytesPer == 0,
      s"szip input of ${data.length} bytes is not a multiple of ${p.bytesPer}-byte samples")
    val totalPixels = data.length / p.bytesPer
    val w = new BitWriter
    var emitted = 0
    while (emitted < totalPixels) {
      val scanPixels = math.min(p.pps, totalPixels - emitted)
      val nBlocks = (scanPixels + p.ppb - 1) / p.ppb
      val padded = nBlocks * p.ppb
      // raw scanline samples, padded by replicating the last sample
      val xs = Array.tabulate(padded)(i =>
        readSample(data, emitted + math.min(i, scanPixels - 1), p))
      // mapped stream: with NN, position 0 is the raw reference and the
      // rest are mapped unit-delay residuals
      val ms = new Array[Long](padded)
      if (p.nn) {
        ms(0) = xs(0)
        var i = 1
        while (i < padded) { ms(i) = mapDelta(xs(i), xs(i - 1), p.xMax); i += 1 }
        w.bits(xs(0), p.bpp)
      } else System.arraycopy(xs, 0, ms, 0, padded)

      var b = 0
      while (b < nBlocks) {
        val from = b * p.ppb + (if (p.nn && b == 0) 1 else 0)
        val until = (b + 1) * p.ppb
        val n = until - from
        // zero-run: absorb consecutive all-zero blocks (within the segment)
        def blockZero(bi: Int): Boolean = {
          val f = bi * p.ppb + (if (p.nn && bi == 0) 1 else 0)
          var i = f
          while (i < (bi + 1) * p.ppb) { if (ms(i) != 0) return false; i += 1 }
          true
        }
        if (blockZero(b)) {
          val segEnd = math.min(((b / SegmentBlocks) + 1) * SegmentBlocks, nBlocks)
          var runEnd = b + 1
          while (runEnd < segEnd && blockZero(runEnd)) runEnd += 1
          val run = runEnd - b
          w.bits(0, p.idLen); w.bits(0, 1)
          if (runEnd == segEnd && run >= 5) w.fs(RosFs)
          else if (run <= 4) w.fs(run - 1)
          else w.fs(run)
          b = runEnd
        } else {
          // candidate costs: best k-split, uncompressed, second extension
          var bestK = -1
          var bestCost = Long.MaxValue
          var k = 0
          while (k <= p.maxK) {
            var c = p.idLen.toLong + n.toLong * (k + 1)
            var i = from
            while (i < until && c < bestCost) { c += ms(i) >>> k; i += 1 }
            if (c < bestCost) { bestCost = c; bestK = k }
            k += 1
          }
          val uncompCost = p.idLen.toLong + n.toLong * p.bpp
          var seCost = Long.MaxValue
          if (!(p.nn && b == 0)) {
            var c = p.idLen.toLong + 1
            var ok = true
            var i = from
            while (i < until && ok) {
              val sum = ms(i) + ms(i + 1)
              if (sum > (1L << 15)) ok = false
              else c += sum * (sum + 1) / 2 + ms(i + 1) + 1
              i += 2
            }
            if (ok) seCost = c
          }
          if (seCost < bestCost && seCost < uncompCost) {
            w.bits(0, p.idLen); w.bits(1, 1)
            var i = from
            while (i < until) {
              val sum = ms(i) + ms(i + 1)
              w.fs(sum * (sum + 1) / 2 + ms(i + 1))
              i += 2
            }
          } else if (uncompCost <= bestCost) {
            w.bits(p.uncompId, p.idLen)
            var i = from
            while (i < until) { w.bits(ms(i), p.bpp); i += 1 }
          } else {
            w.bits(bestK + 1, p.idLen)
            var i = from
            while (i < until) { w.fs(ms(i) >>> bestK); i += 1 }
            if (bestK > 0) {
              i = from
              while (i < until) { w.bits(ms(i), bestK); i += 1 }
            }
          }
          b += 1
        }
      }
      emitted += scanPixels
    }
    w.result()
  }
}
