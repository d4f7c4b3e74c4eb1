package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Dense (fractal-heap + v2-B-tree) group links and attributes, and the v2
  * B-tree chunk index — the `libver='latest'` / many-links storage forms.
  * Round-trips go through the writer; the hand-built fixtures exercise the
  * reader shapes the writer never emits (deep B-trees, multi-row heaps),
  * which is what files written by the HDF5 library itself use at scale
  * (reference ingest path: marEx detect.py:409 via xr.open_dataset). */
class Hdf5DenseSpec extends AnyFunSuite {

  private def src(bytes: Array[Byte]): Hdf5.ByteSource =
    (off: Long, len: Int) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)

  // ── lookup3 (the hash dense name indexes are keyed on) ──────────────────

  test("lookup3 matches the published hashlittle vectors") {
    val four = "Four score and seven years ago".getBytes("UTF-8")
    assert(Hdf5.lookup3(four, 0) == 0x17770551)
    assert(Hdf5.lookup3(four, 1) == 0xcd628161)
    assert(Hdf5.lookup3(Array.emptyByteArray, 0) == 0xdeadbeef)
  }

  // ── dense root group round-trip ──────────────────────────────────────────

  test("dense root group: 12 variables listed and read back exactly") {
    val vars = (0 until 12).map { i =>
      Hdf5.WriteVar(f"var_$i%02d", Seq(3, 4),
        Array.tabulate(12)(j => i * 100.0 + j),
        chunkDims = if (i % 2 == 0) Some(Seq(2, 3)) else None)
    }
    val bytes = Hdf5.assemble(vars, denseRoot = true)
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val listed = Hdf5.listDatasets(s, rootOh)
    assert(listed.map(_._1).sorted == vars.map(_.name).sorted)
    listed.foreach { case (nm, oh) =>
      val ds = Hdf5.readDataset(s, nm, oh)
      val i = nm.drop(4).toInt
      val got = ds.layout match {
        case Hdf5.Contiguous(addr, size) =>
          Hdf5.decode(s.read(addr, size.toInt), ds.dtype, 12)
        case ch: Hdf5.Chunked =>
          val acc = new Array[Double](12)
          Hdf5.listChunks(s, ds).foreach { c =>
            val vals = Hdf5.decode(
              Hdf5.defilter(s.read(c.addr, c.size), ds.filters, c.filterMask),
              ds.dtype, ch.chunkDims.product)
            var ci = 0
            while (ci < vals.length) {
              val cy = ci / ch.chunkDims(1); val cx = ci % ch.chunkDims(1)
              val y = c.offsets(0) + cy; val x = c.offsets(1) + cx
              if (y < 3 && x < 4) acc((y * 4 + x).toInt) = vals(ci)
              ci += 1
            }
          }
          acc
        case other => fail(s"unexpected layout $other")
      }
      assert(got.toSeq == Array.tabulate(12)(j => i * 100.0 + j).toSeq, nm)
    }
  }

  test("dense attributes: 11 attributes round-trip, CF decode unaffected") {
    val attrs = (0 until 9).map(i => s"attr_$i" -> i * 1.5) ++
      Seq("units" -> ("kelvin": Any), "scale_factor" -> 0.01)
    val v = Hdf5.WriteVar("t", Seq(4), Array(1.0, 2.0, 3.0, 4.0),
      attrs = attrs.map { case (k, x) => k -> (x: Any) }, denseAttrs = true)
    val bytes = Hdf5.assemble(Seq(v))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val (_, oh) = Hdf5.listDatasets(s, rootOh).head
    val got = Hdf5.attributes(s, oh)
    assert(got.size == 11)
    assert(got("units") == "kelvin")
    assert(got("scale_factor") == 0.01)
    assert(got("attr_7") == 10.5)
  }

  test("dense root group + dense attributes compose") {
    val vars = (0 until 10).map { i =>
      Hdf5.WriteVar(s"v$i", Seq(2), Array(i.toDouble, i + 0.5),
        attrs = (0 until 10).map(j => s"a$j" -> (j.toDouble: Any)),
        denseAttrs = true)
    }
    val bytes = Hdf5.assemble(vars, denseRoot = true)
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val listed = Hdf5.listDatasets(s, rootOh)
    assert(listed.size == 10)
    listed.foreach { case (_, oh) => assert(Hdf5.attributes(s, oh).size == 10) }
  }

  // ── reader generality beyond what the writer emits ───────────────────────

  test("v2 B-tree walker handles a depth-1 tree (internal + leaf nodes)") {
    // nodeSize 512, recordSize 4 → leaf max 125 → 1-byte record counts.
    // Root BTIN with one separator record and two BTLF children.
    def leaf(recs: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(6 + recs.size * 4 + 4).order(ByteOrder.LITTLE_ENDIAN)
      b.put("BTLF".getBytes).put(0.toByte).put(5.toByte)
      recs.foreach(b.putInt)
      b.putInt(0)
      b.array()
    }
    val left = leaf(Seq(10, 20)); val right = leaf(Seq(40, 50, 60))
    val hdrSize = 38
    val rootSize = 6 + 1 * 4 + 2 * (8 + 1) + 4 // one record, two child pointers
    val leftAddr = hdrSize + rootSize
    val rightAddr = leftAddr + left.length
    val root = {
      val b = ByteBuffer.allocate(rootSize).order(ByteOrder.LITTLE_ENDIAN)
      b.put("BTIN".getBytes).put(0.toByte).put(5.toByte)
      b.putInt(30) // separator record
      b.putLong(leftAddr.toLong).put(2.toByte)
      b.putLong(rightAddr.toLong).put(3.toByte)
      b.putInt(0)
      b.array()
    }
    val hdr = {
      val b = ByteBuffer.allocate(hdrSize).order(ByteOrder.LITTLE_ENDIAN)
      b.put("BTHD".getBytes).put(0.toByte).put(5.toByte)
      b.putInt(512).putShort(4).putShort(1) // node size, record size, depth 1
      b.put(100.toByte).put(40.toByte)
      b.putLong(hdrSize.toLong).putShort(1) // root node, 1 record in root
      b.putLong(6L).putInt(0)
      b.array()
    }
    val bytes = hdr ++ root ++ left ++ right
    val bt = Hdf5.readBtreeV2(src(bytes), 0L)
    assert(bt.typ == 5 && bt.recordSize == 4)
    val recs = bt.records.map(r =>
      ByteBuffer.wrap(r).order(ByteOrder.LITTLE_ENDIAN).getInt)
    assert(recs == Seq(10, 20, 30, 40, 50, 60)) // in-order traversal
  }

  test("fractal heap resolves offsets through a multi-row root indirect block") {
    // width 4, starting block size 64, max direct 256 → rows 0/1 are 64-byte
    // blocks, row 2 is 128-byte blocks. Objects in blocks (0,0), (1,2), (2,1).
    val W = 4; val S = 64L
    val frhpAddr = 0L; val fhibAddr = 146L
    val nRows = 3
    val entriesLen = nRows * W * 8
    val fhibLen = 13 + 4 + entriesLen
    var next = fhibAddr + fhibLen
    // allocate three direct blocks (headers 13 + 4 offset bytes = 17)
    def dblock(row: Int, col: Int, size: Long): (Long, Long) = {
      val at = next; next += size
      val heapOff = (if (row == 0) 0L else W * S << (row - 1)) +
        col * (if (row == 0) S else S << (row - 1))
      (at, heapOff)
    }
    val (b00, o00) = dblock(0, 0, S)
    val (b12, o12) = dblock(1, 2, S)
    val (b21, o21) = dblock(2, 1, 2 * S)
    val total = next
    val buf = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    // FRHP: only the fields the reader uses need real values
    buf.put("FRHP".getBytes).put(0.toByte)
    buf.putShort(8).putShort(0).put(0.toByte).putInt(64)
    (0 until 12).foreach(_ => buf.putLong(0L)) // stats the reader ignores
    buf.position(110)
    buf.putShort(W.toShort)
    buf.putLong(S).putLong(256L) // starting + max direct block size
    buf.putShort(32).putShort(0)
    buf.putLong(fhibAddr).putShort(nRows.toShort)
    buf.putInt(0)
    assert(buf.position() == 146)
    // FHIB with 12 direct-block entries (unallocated → UNDEF)
    buf.put("FHIB".getBytes).put(0.toByte).putLong(frhpAddr).putInt(0)
    val addrOf = Map((0, 0) -> b00, (1, 2) -> b12, (2, 1) -> b21)
    for (r <- 0 until nRows; c <- 0 until W)
      buf.putLong(addrOf.getOrElse((r, c), Hdf5.Undef))
    // direct blocks: header + payload; plant marker bytes at header end + 3
    def plant(at: Long, marker: Byte): Unit = {
      buf.position(at.toInt)
      buf.put("FHDB".getBytes).put(0.toByte).putLong(frhpAddr).putInt(0)
      buf.put(0.toByte).put(0.toByte).put(0.toByte).put(marker)
    }
    plant(b00, 11); plant(b12, 22); plant(b21, 33)
    val heap = new Hdf5.FractalHeap(src(buf.array()), frhpAddr)
    def id(heapOff: Long, len: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0.toByte).putInt(heapOff.toInt)
      b.put((len & 0xff).toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    // the marker sits 20 bytes into each block's heap range (17 header + 3)
    assert(heap.obj(id(o00 + 20, 1)).head == 11)
    assert(heap.obj(id(o12 + 20, 1)).head == 22)
    assert(heap.obj(id(o21 + 20, 1)).head == 33)
  }

  test("a >64-chunk dataset writes a TWO-LEVEL v1 chunk B-tree that reads back exactly") {
    // 6×6×8 at chunk (1,1,1) = 288 chunks = 5 leaves under a level-1 root
    // (round 11: the single-leaf 64-entry refusal became the two-level
    // layout libhdf5 itself grows into); values round-trip bit-exactly
    // through the ordinary multi-level btreeV1Chunks walk
    val dims = Seq(6, 6, 8)
    val vals = Array.tabulate(dims.product)(i => i * 0.5 - 100.0)
    val bytes = Hdf5.assemble(
      Seq(Hdf5.WriteVar("v", dims, vals, chunkDims = Some(Seq(1, 1, 1)))),
      denseRoot = true)
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val (nm, oh) = Hdf5.listDatasets(s, rootOh).head
    val ds = Hdf5.readDataset(s, nm, oh)
    assert(ds.dims == dims.map(_.toLong))
    val chunks = Hdf5.listChunks(s, ds)
    assert(chunks.length == 288, s"expected 288 chunk refs, got ${chunks.length}")
    // sibling-chained leaves: decode every chunk and rebuild the grid
    val got = new Array[Double](dims.product)
    chunks.foreach { c =>
      val v = Hdf5.decode(Hdf5.defilter(s.read(c.addr, c.size),
        ds.filters, c.filterMask), ds.dtype, 1)(0)
      val flat = ((c.offsets(0) * dims(1) + c.offsets(1)) * dims(2) + c.offsets(2)).toInt
      got(flat) = v
    }
    assert(got.toSeq == vals.toSeq, "two-level B-tree chunks must round-trip bit-exactly")
  }

}
