package graft.sources

/** Pure-JVM decoder for the Blosc v1 container (c-blosc 1.x, the default
  * compressor of zarr-python's numcodecs) with LZ4 block payloads — enough to
  * read the reference's fixture zarrs directly (every array under marEx
  * tests/data is blosc-lz4 with byte shuffle).
  *
  * Container layout (public c-blosc format, verified byte-for-byte against
  * the fixtures):
  *  - 16-byte header: version, versionlz, flags, typesize, then u32LE
  *    nbytes / blocksize / cbytes.
  *  - flags: bit0 byte-shuffle, bit1 memcpy (payload stored raw at offset
  *    16), bit2 bit-shuffle (unsupported here), bit4 dont-split,
  *    bits5–7 codec id (1 = LZ4).
  *  - unless memcpy: u32LE bstarts[nblocks] at offset 16, each the offset of
  *    one block's compressed data. A non-leftover block whose
  *    blocksize/typesize ≥ 128 and typesize ≤ 16 is SPLIT into `typesize`
  *    streams (one per shuffled byte plane); each stream is a u32LE
  *    compressed-size prefix + LZ4 block data, with csize == streamlen
  *    meaning "stored uncompressed".
  *  - byte shuffle transposes each block: plane-major → element-major.
  */
object Blosc {

  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Raw LZ4 block decompression (the public LZ4 block format: token,
    * extended literal length, literals, u16LE match offset, extended match
    * length; match copies may overlap). */
  def lz4Decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    var d = dstOff
    val dEnd = dstOff + dstLen
    while (s < sEnd) {
      val token = src(s) & 0xff
      s += 1
      // literals
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 255
        while (x == 255) { x = src(s) & 0xff; s += 1; litLen += x }
      }
      if (litLen > 0) {
        if (s + litLen > sEnd || d + litLen > dEnd)
          throw new java.io.IOException("corrupt LZ4 stream: literal overrun")
        System.arraycopy(src, s, dst, d, litLen)
        s += litLen; d += litLen
      }
      if (s >= sEnd) {
        if (d != dEnd)
          throw new java.io.IOException(s"LZ4 stream ended at ${d - dstOff} of $dstLen bytes")
        return
      }
      // match
      val offset = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8)
      s += 2
      if (offset == 0 || d - offset < dstOff)
        throw new java.io.IOException("corrupt LZ4 stream: bad match offset")
      var matchLen = (token & 0xf) + 4
      if ((token & 0xf) == 15) {
        var x = 255
        while (x == 255) { x = src(s) & 0xff; s += 1; matchLen += x }
      }
      if (d + matchLen > dEnd)
        throw new java.io.IOException("corrupt LZ4 stream: match overrun")
      var m = d - offset // byte-at-a-time: matches may overlap themselves
      var i = 0
      while (i < matchLen) { dst(d) = dst(m); d += 1; m += 1; i += 1 }
    }
    if (d != dEnd)
      throw new java.io.IOException(s"LZ4 stream produced ${d - dstOff} of $dstLen bytes")
  }

  /** Byte unshuffle: src holds `elements` planes-major bytes (plane j then
    * plane j+1 …), dst receives element-major; the sub-typesize tail is
    * copied verbatim (c-blosc shuffles only whole elements). */
  private def unshuffle(typesize: Int, len: Int,
      src: Array[Byte], srcOff: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val elements = len / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < elements) {
        dst(dstOff + i * typesize + j) = src(srcOff + j * elements + i)
        i += 1
      }
      j += 1
    }
    val tail = len - elements * typesize
    if (tail > 0)
      System.arraycopy(src, srcOff + elements * typesize, dst, dstOff + elements * typesize, tail)
  }

  /** Decode one blosc frame to its uncompressed bytes. */
  def decompress(src: Array[Byte]): Array[Byte] = {
    require(src.length >= 16, "blosc frame shorter than its 16-byte header")
    val flags = src(2) & 0xff
    val typesize = src(3) & 0xff
    val nbytes = u32(src, 4)
    val blocksize = u32(src, 8)
    val cbytes = u32(src, 12)
    if (cbytes != src.length)
      throw new java.io.IOException(s"blosc cbytes=$cbytes but frame has ${src.length} bytes")
    val out = new Array[Byte](nbytes)
    if ((flags & 0x2) != 0) { // memcpy: payload stored raw (never shuffled)
      System.arraycopy(src, 16, out, 0, nbytes)
      return out
    }
    if ((flags & 0x4) != 0)
      throw new java.io.IOException("blosc bit-shuffle filter not supported")
    val codec = flags >>> 5
    if (codec != 1)
      throw new java.io.IOException(s"unsupported blosc codec id $codec (only LZ4=1)")
    val shuffled = (flags & 0x1) != 0 && typesize > 1
    val dontSplit = (flags & 0x10) != 0
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val tmp = if (shuffled) new Array[Byte](blocksize) else null
    var b = 0
    while (b < nblocks) {
      val bstart = u32(src, 16 + 4 * b)
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val leftover = bsize != blocksize
      val split = typesize > 1 && typesize <= 16 && !dontSplit && !leftover &&
        bsize / typesize >= 128
      val nstreams = if (split) typesize else 1
      if (split && bsize % typesize != 0)
        throw new java.io.IOException(s"split block size $bsize not a multiple of typesize $typesize")
      val neblock = bsize / nstreams
      val target = if (shuffled) tmp else out
      val targetOff = if (shuffled) 0 else b * blocksize
      var off = bstart
      var s = 0
      while (s < nstreams) {
        val csize = u32(src, off)
        off += 4
        if (csize == neblock) // stored uncompressed
          System.arraycopy(src, off, target, targetOff + s * neblock, neblock)
        else
          lz4Decompress(src, off, csize, target, targetOff + s * neblock, neblock)
        off += csize
        s += 1
      }
      if (shuffled) unshuffle(typesize, bsize, tmp, 0, out, b * blocksize)
      b += 1
    }
    out
  }
}
