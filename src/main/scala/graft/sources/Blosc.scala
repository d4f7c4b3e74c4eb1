package graft.sources

/** Pure-JVM codec for the Blosc v1 container (c-blosc 1.x, the default
  * compressor of zarr-python's numcodecs) with LZ4 block payloads — enough to
  * read the reference's fixture zarrs directly (every array under marEx
  * tests/data is blosc-lz4 with byte shuffle) and, since round 6, to WRITE
  * frames c-blosc decodes (zarr v2 groups the repo emits open in xarray with
  * the stock numcodecs blosc).
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

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }

  /** Byte shuffle (inverse of [[unshuffle]]): element-major → plane-major,
    * sub-typesize tail copied verbatim. */
  private def shuffleBytes(typesize: Int, len: Int,
      src: Array[Byte], srcOff: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val elements = len / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < elements) {
        dst(dstOff + j * elements + i) = src(srcOff + i * typesize + j)
        i += 1
      }
      j += 1
    }
    val tail = len - elements * typesize
    if (tail > 0)
      System.arraycopy(src, srcOff + elements * typesize, dst, dstOff + elements * typesize, tail)
  }

  /** Greedy LZ4 block compression (public block format). Honors the format's
    * interop end rules — the last 5 bytes are literals and no match starts
    * within 12 bytes of the end — so real lz4/c-blosc fast decoders accept
    * the stream, not just our own decoder. Returns the compressed length,
    * or -1 when the data does not fit in `dst` (caller stores raw). */
  def lz4Compress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstCap: Int): Int = {
    var d = dstOff
    val dEnd = dstOff + dstCap
    val sEnd = srcOff + srcLen
    var anchor = srcOff
    if (srcLen >= 13) { // below MFLIMIT the whole block is one literal run
      val hashLog = 13
      val table = new Array[Int](1 << hashLog) // 0 = empty (src index + 1)
      val matchStartLimit = sEnd - 12
      val matchEndLimit = sEnd - 5
      def read4(i: Int): Int =
        (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
          ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
      def hash(v: Int): Int = (v * -1640531535) >>> (32 - hashLog)
      var s = srcOff
      while (s < matchStartLimit) {
        val v = read4(s)
        val h = hash(v)
        val ref = table(h) - 1
        table(h) = s + 1
        if (ref >= srcOff && s - ref <= 0xffff && read4(ref) == v) {
          var mEnd = s + 4
          var r = ref + 4
          while (mEnd < matchEndLimit && src(mEnd) == src(r)) { mEnd += 1; r += 1 }
          val litLen = s - anchor
          val mExtra = mEnd - s - 4
          // worst-case size of this sequence
          val need = 1 + (litLen / 255 + 1) + litLen + 2 + (mExtra / 255 + 1)
          if (d + need > dEnd) return -1
          val t1 = math.min(litLen, 15)
          val t2 = math.min(mExtra, 15)
          dst(d) = ((t1 << 4) | t2).toByte; d += 1
          if (litLen >= 15) {
            var rem = litLen - 15
            while (rem >= 255) { dst(d) = -1; d += 1; rem -= 255 }
            dst(d) = rem.toByte; d += 1
          }
          System.arraycopy(src, anchor, dst, d, litLen); d += litLen
          val off = s - ref
          dst(d) = off.toByte; dst(d + 1) = (off >>> 8).toByte; d += 2
          if (mExtra >= 15) {
            var rem = mExtra - 15
            while (rem >= 255) { dst(d) = -1; d += 1; rem -= 255 }
            dst(d) = rem.toByte; d += 1
          }
          s = mEnd
          anchor = mEnd
        } else s += 1
      }
    }
    // trailing literal-only sequence
    val litLen = sEnd - anchor
    val need = 1 + (litLen / 255 + 1) + litLen
    if (d + need > dEnd) return -1
    val t1 = math.min(litLen, 15)
    dst(d) = (t1 << 4).toByte; d += 1
    if (litLen >= 15) {
      var rem = litLen - 15
      while (rem >= 255) { dst(d) = -1; d += 1; rem -= 255 }
      dst(d) = rem.toByte; d += 1
    }
    System.arraycopy(src, anchor, dst, d, litLen); d += litLen
    d - dstOff
  }

  /** Encode one blosc-lz4 frame (the container [[decompress]] reads and
    * c-blosc 1.x decodes): 16-byte header, u32LE block starts, per-block
    * one LZ4 stream (the dont-split flag is set, so streams never split
    * into byte planes) with the `csize == blocksize → stored` convention.
    * Falls back to a memcpy frame when compression does not pay. */
  def compress(data: Array[Byte], typesize: Int, shuffle: Boolean = true): Array[Byte] = {
    val nbytes = data.length
    val ts = math.max(typesize, 1)
    val doShuffle = shuffle && ts > 1 && nbytes >= ts
    def memcpyFrame(): Array[Byte] = {
      val out = new Array[Byte](16 + nbytes)
      out(0) = 2; out(1) = 1
      out(2) = 0x02 | (1 << 5) // memcpy, codec=lz4 (payload raw, unshuffled)
      out(3) = (ts & 0xff).toByte
      putU32(out, 4, nbytes); putU32(out, 8, math.max(nbytes, 1)); putU32(out, 12, 16 + nbytes)
      System.arraycopy(data, 0, out, 16, nbytes)
      out
    }
    if (nbytes == 0) return memcpyFrame()
    var blocksize = math.min(math.max(nbytes, ts), 1 << 18)
    blocksize -= blocksize % ts
    if (blocksize <= 0) blocksize = ts
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val headerLen = 16 + 4 * nblocks
    // worst case: every block stored raw behind its 4-byte csize prefix
    val out = new Array[Byte](headerLen + nbytes + 4 * nblocks)
    val tmp = new Array[Byte](blocksize)
    val cbuf = new Array[Byte](blocksize)
    var off = headerLen
    var b = 0
    while (b < nblocks) {
      val bOff = b * blocksize
      val bsize = math.min(blocksize, nbytes - bOff)
      val block = if (doShuffle) { shuffleBytes(ts, bsize, data, bOff, tmp, 0); tmp }
        else data
      val blockOff = if (doShuffle) 0 else bOff
      putU32(out, 16 + 4 * b, off)
      val csize = lz4Compress(block, blockOff, bsize, cbuf, 0, bsize - 1)
      if (csize > 0 && csize < bsize) {
        putU32(out, off, csize)
        System.arraycopy(cbuf, 0, out, off + 4, csize)
        off += 4 + csize
      } else { // stored (shuffled) bytes: csize == bsize convention
        putU32(out, off, bsize)
        System.arraycopy(block, blockOff, out, off + 4, bsize)
        off += 4 + bsize
      }
      b += 1
    }
    if (off >= 16 + nbytes) return memcpyFrame()
    out(0) = 2; out(1) = 1
    out(2) = ((if (doShuffle) 0x01 else 0) | 0x10 | (1 << 5)).toByte // shuffle?, dont-split, lz4
    out(3) = (ts & 0xff).toByte
    putU32(out, 4, nbytes); putU32(out, 8, blocksize); putU32(out, 12, off)
    java.util.Arrays.copyOf(out, off)
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
