package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** String, vlen-string, and compound datatypes plus the registered zstd /
  * lz4 plugin filters — the "exotic" corners real-world `.nc` archives
  * occasionally carry beyond plain numeric data (reference entry:
  * `xr.open_dataset`, marEx detect.py:409). Round-trips go through the
  * writer duals; hand-built fixtures cover reader-only shapes (datatype
  * message versions the writer does not emit, foreign filter framing). */
class Hdf5TypedSpec extends AnyFunSuite {

  private def src(bytes: Array[Byte]): Hdf5.ByteSource =
    (off: Long, len: Int) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)

  private def readStrings(bytes: Array[Byte], name: String): Array[String] = {
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == name).get._2
    val ds = Hdf5.readDataset(s, name, oh)
    val n = ds.dims.product.toInt
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    Hdf5.decodeStrings(s.read(addr, size.toInt), ds.dtype, n, s)
  }

  // ── nested compound members + object references ─────────────────────────

  test("a nested compound member round-trips (record inside the record)") {
    val n = 4
    val members: Seq[(String, Hdf5.CompoundCol)] = Seq(
      "id" -> Hdf5.I64Col(Array.tabulate(n)(_.toLong * 10)),
      "pos" -> Hdf5.NestedCol(Seq(
        "lat" -> Hdf5.F64Col(Array.tabulate(n)(_ * 1.5)),
        "lon" -> Hdf5.F64Col(Array.tabulate(n)(_ * -2.5)),
        "label" -> Hdf5.StrCol(Seq("a", "bb", "ccc", ""), 4))),
      "score" -> Hdf5.F64Col(Array.tabulate(n)(_ + 0.25)))
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("obs", Seq(n), Array.empty,
      typed = Some(Hdf5.CompoundData(members)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "obs").get._2
    val ds = Hdf5.readDataset(s, "obs", oh)
    val ct = ds.dtype.asInstanceOf[Hdf5.CompoundType]
    assert(ct.members.map(_.name) == Seq("id", "pos", "score"))
    assert(ct.members(1).dtype.isInstanceOf[Hdf5.CompoundType])
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val cols = Hdf5.decodeCompound(s.read(addr, size.toInt), ct, n, s).toMap
    assert(cols("id").asInstanceOf[Array[Double]].toSeq == Seq(0.0, 10.0, 20.0, 30.0))
    assert(cols("score").asInstanceOf[Array[Double]].toSeq == Seq(0.25, 1.25, 2.25, 3.25))
    val pos = cols("pos").asInstanceOf[Array[Seq[Any]]]
    assert(pos(2) == Seq(3.0, -5.0, "ccc"))
    assert(pos(3) == Seq(4.5, -7.5, ""))
  }

  test("an object-reference dataset resolves to the referenced names") {
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("sst", Seq(2), Array(1.0, 2.0)),
      Hdf5.WriteVar("ice", Seq(2), Array(3.0, 4.0)),
      Hdf5.WriteVar("layers", Seq(3), Array.empty,
        typed = Some(Hdf5.RefData(Seq("sst", "ice", ""))))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "layers").get._2
    val ds = Hdf5.readDataset(s, "layers", oh)
    val rt = ds.dtype.asInstanceOf[Hdf5.RefType]
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val refs = Hdf5.decodeRefs(s.read(addr, size.toInt), rt, 3, s)
    assert(refs.toSeq == Seq("/sst", "/ice", ""))
  }

  test("an unknown reference target fails with the name; dangling address with the address") {
    val e = intercept[IllegalArgumentException](Hdf5.assemble(Seq(
      Hdf5.WriteVar("r", Seq(1), Array.empty,
        typed = Some(Hdf5.RefData(Seq("nope")))))))
    assert(e.getMessage.contains("nope"))
    val rt = Hdf5.RefType(8)
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(0xdeadL)
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("sst", Seq(1), Array(1.0))))
    val e2 = intercept[IllegalArgumentException](
      Hdf5.decodeRefs(b.array(), rt, 1, src(bytes)))
    assert(e2.getMessage.contains("dead"))
  }

  // ── fixed-length strings (class 3) ───────────────────────────────────────

  test("fixed-length string dataset round-trips, NUL padding trimmed") {
    val values = Seq("en", "de", "fr-CA", "", "pt")
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("lang", Seq(values.length), Array.empty,
        typed = Some(Hdf5.FixedStrData(values, 8)))))
    assert(readStrings(bytes, "lang").toSeq == values)
  }

  test("fixed-string cells at exactly the declared size survive (no NUL)") {
    val values = Seq("abcd", "wxyz")
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("tag", Seq(2), Array.empty,
        typed = Some(Hdf5.FixedStrData(values, 4)))))
    assert(readStrings(bytes, "tag").toSeq == values)
  }

  // ── vlen strings (class 9 + global heap) ─────────────────────────────────

  test("vlen string dataset round-trips through a GCOL global heap") {
    val values = Seq("short", "a considerably longer string value", "", "åéî-utf8",
      "x" * 200)
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("title", Seq(values.length), Array.empty,
        typed = Some(Hdf5.VlenStrData(values)))))
    assert(readStrings(bytes, "title").toSeq == values)
  }

  test("vlen strings coexist with numeric variables in one file") {
    val names = Seq("alpha", "beta", "gamma")
    val nums = Array(1.5, 2.5, 3.5)
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("name", Seq(3), Array.empty, typed = Some(Hdf5.VlenStrData(names))),
      Hdf5.WriteVar("score", Seq(3), nums)))
    assert(readStrings(bytes, "name").toSeq == names)
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "score").get._2
    val ds = Hdf5.readDataset(s, "score", oh)
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    assert(Hdf5.decode(s.read(addr, size.toInt), ds.dtype, 3).toSeq == nums.toSeq)
  }

  // ── vlen sequences (class 9 type 0, numeric base) ────────────────────────

  test("vlen f64-sequence dataset round-trips ragged arrays") {
    val values = Seq(
      Array(1.5, 2.5, 3.5),
      Array.emptyDoubleArray,
      Array(42.0),
      Array.tabulate(100)(_ * 0.25))
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("samples", Seq(values.length), Array.empty,
        typed = Some(Hdf5.VlenSeqData(values)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "samples").get._2
    val ds = Hdf5.readDataset(s, "samples", oh)
    assert(ds.dtype == Hdf5.VlenSeqType(Hdf5.NumType("float", 8, littleEndian = true)))
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val got = Hdf5.decodeVlenSeqs(s.read(addr, size.toInt), ds.dtype, 4, s)
    assert(got.map(_.toSeq).toSeq == values.map(_.toSeq))
  }

  test("vlen sequences of FIXED strings round-trip ragged tag lists") {
    val values = Seq(Seq("en", "news"), Seq.empty[String], Seq("code"),
      Seq("a", "bb", "ccc", "dd"))
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("tags", Seq(values.length), Array.empty,
        typed = Some(Hdf5.VlenStrSeqData(values, strSize = 4)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "tags").get._2
    val ds = Hdf5.readDataset(s, "tags", oh)
    assert(ds.dtype == Hdf5.VlenSeqType(Hdf5.StrType(4, utf8 = true)))
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val got = Hdf5.decodeVlenStrSeqs(s.read(addr, size.toInt), ds.dtype, 4, s)
    assert(got.toSeq == values)
    // the numeric decoder refuses string bases BY NAME (never misreads)
    val e = intercept[IllegalArgumentException](
      Hdf5.decodeVlenSeqs(s.read(addr, size.toInt), ds.dtype, 4, s))
    assert(e.getMessage.contains("decodeVlenStrSeqs"))
    // an oversized base string fails at construction
    val e2 = intercept[IllegalArgumentException](
      Hdf5.VlenStrSeqData(Seq(Seq("too-long")), strSize = 4))
    assert(e2.getMessage.contains("too-long"))
  }

  test("vlen sequences of VLEN strings decode through nested indirection") {
    // no writer for the nested form — hand-build the descriptors: a file
    // carrying the inner vlen strings' GCOL via a VlenStrData dataset,
    // then an outer heap object packing two of its 16-byte descriptors
    val inner = Seq("alpha", "beta-long-string", "c")
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("strs", Seq(inner.length), Array.empty,
        typed = Some(Hdf5.VlenStrData(inner)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "strs").get._2
    val ds = Hdf5.readDataset(s, "strs", oh)
    val Hdf5.Contiguous(addr, _) = ds.layout: @unchecked
    val innerDescs = s.read(addr, inner.length * 16)
    // outer heap object = descriptors of "alpha" and "c"
    val outerObj = new Array[Byte](32)
    System.arraycopy(innerDescs, 0, outerObj, 0, 16)
    System.arraycopy(innerDescs, 32, outerObj, 16, 16)
    val gcol = ByteBuffer.allocate(16 + 16 + 32 + 16).order(ByteOrder.LITTLE_ENDIAN)
    gcol.put("GCOL".getBytes).put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    gcol.putLong(gcol.capacity().toLong)
    gcol.putShort(1).putShort(1).putInt(0).putLong(32L).put(outerObj)
    val s2 = src(bytes ++ gcol.array())
    val el = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    el.putInt(2).putLong(bytes.length.toLong).putInt(1)
    val dt = Hdf5.VlenSeqType(Hdf5.VlenStrType(utf8 = true))
    val got = Hdf5.decodeVlenStrSeqs(el.array(), dt, 1, s2)
    assert(got.toSeq == Seq(Seq("alpha", "c")))
  }

  // ── compound datasets (class 6) ──────────────────────────────────────────

  test("compound dataset (f64 + fixed-string members) round-trips column-wise") {
    val langs = Seq("en", "de", "fr")
    val scores = Array(0.91, 0.72, 0.88)
    val counts = Array(120.0, 45.0, 300.0)
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("table", Seq(3), Array.empty,
        typed = Some(Hdf5.CompoundData(Seq(
          "lang" -> Hdf5.StrCol(langs, 4),
          "score" -> Hdf5.F64Col(scores),
          "count" -> Hdf5.F64Col(counts)))))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "table").get._2
    val ds = Hdf5.readDataset(s, "table", oh)
    val ct = ds.dtype.asInstanceOf[Hdf5.CompoundType]
    assert(ct.size == 4 + 8 + 8)
    assert(ct.members.map(m => (m.name, m.offset)) == Seq(("lang", 0), ("score", 4), ("count", 12)))
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val cols = Hdf5.decodeCompound(s.read(addr, size.toInt), ct, 3, s).toMap
    assert(cols("lang").toSeq == langs)
    assert(cols("score").toSeq == scores.toSeq)
    assert(cols("count").toSeq == counts.toSeq)
  }

  test("compound datatype message version 3 parses (reader-only shape)") {
    // v3: NUL-terminated names with NO padding, offsets in the fewest
    // bytes that hold the compound size — what libver='latest' writes.
    val f64 = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte).putInt(8)
      b.putShort(0).putShort(64)
      b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
      b.array()
    }
    def member(name: String, off: Int): Array[Byte] = {
      val nb = name.getBytes("UTF-8")
      val b = ByteBuffer.allocate(nb.length + 1 + 1 + f64.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(nb).put(0.toByte).put(off.toByte).put(f64) // size 16 → 1-byte offsets
      b.array()
    }
    val ms = member("x", 0) ++ member("yy", 8)
    val body = ByteBuffer.allocate(8 + ms.length).order(ByteOrder.LITTLE_ENDIAN)
    body.put(0x36.toByte).put(2.toByte).put(0.toByte).put(0.toByte).putInt(16).put(ms)
    val t = Hdf5.parseDatatype(body.array()).asInstanceOf[Hdf5.CompoundType]
    assert(t.size == 16)
    assert(t.members.map(m => (m.name, m.offset, m.dtype)) ==
      Seq(("x", 0, Hdf5.NumType("float", 8, true)), ("yy", 8, Hdf5.NumType("float", 8, true))))
  }

  test("unsupported datatype classes error with the class named") {
    // classes 8 (enum, round 10), 4/5 (bitfield/opaque, round 11) lifted —
    // class 2 (time) stays named (dead in practice, no writer emits it)
    val body = Array[Byte](0x12, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](Hdf5.parseDatatype(body))
    assert(e.getMessage.contains("class 2"))
    // reference types 0 (object) and 1 (dataset region) both parse;
    // anything else names the type
    val region = Array[Byte](0x17, 0x01, 0, 0, 12, 0, 0, 0)
    assert(Hdf5.parseDatatype(region) == Hdf5.RegionRefType(12))
    val refT2 = Array[Byte](0x17, 0x02, 0, 0, 12, 0, 0, 0)
    val e2 = intercept[IllegalArgumentException](Hdf5.parseDatatype(refT2))
    assert(e2.getMessage.contains("reference type 2"))
  }

  // ── dataset region references (class 7 type 1) ───────────────────────────

  test("region references round-trip: hyperslab, points, all, null") {
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("grid", Seq(4, 6), Array.tabulate(24)(_.toDouble)),
      Hdf5.WriteVar("axis", Seq(5), Array.tabulate(5)(_ * 2.0)),
      Hdf5.WriteVar("regions", Seq(4), Array.empty,
        typed = Some(Hdf5.RegionRefData(Seq(
          Some(("grid", Hdf5.HyperSel(Seq(
            (Seq(0, 2), Seq(1, 4)), (Seq(3, 0), Seq(3, 5)))))),
          Some(("axis", Hdf5.PointSel(Seq(Seq(1), Seq(3))))),
          Some(("grid", Hdf5.AllSel)),
          None))))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "regions").get._2
    val ds = Hdf5.readDataset(s, "regions", oh)
    val rr = ds.dtype.asInstanceOf[Hdf5.RegionRefType]
    assert(rr.size == 12)
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val refs = Hdf5.decodeRegionRefs(s.read(addr, size.toInt), rr, 4, s)
    assert(refs.toSeq == Seq(
      "/grid hyperslab (0,2)-(1,4);(3,0)-(3,5)",
      "/axis points (1);(3)",
      "/grid all",
      ""))
  }

  test("H5S v2 (64-bit) selections decode: regular hyperslab + wide points") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hyperslab v2: one regular (start/stride/count/block) tuple, u64 × rank
    // — start=(1,2), stride=(4,5), count=(2,2), block=(2,3) expands to the
    // 4-block list its v1 encoding would carry
    val hs = ByteBuffer.allocate(17 + 4 * 8 * 2).order(ByteOrder.LITTLE_ENDIAN)
    hs.putInt(2).putInt(2) // type, version
    hs.put(0.toByte).putInt(0).putInt(2) // flags, length, rank
    Seq(1L, 2L, 4L, 5L, 2L, 2L, 2L, 3L).foreach(hs.putLong) // start,stride,count,block
    assert(Hdf5.selectionString(hs.array(), 0) ==
      "hyperslab (1,2)-(2,4);(1,7)-(2,9);(5,2)-(6,4);(5,7)-(6,9)")
    // a LARGE regular selection renders compactly instead of exploding
    val big = ByteBuffer.allocate(17 + 4 * 8).order(ByteOrder.LITTLE_ENDIAN)
    big.putInt(2).putInt(2).put(0.toByte).putInt(0).putInt(1)
    Seq(0L, 10L, 1000000L, 5L).foreach(big.putLong)
    assert(Hdf5.selectionString(big.array(), 0).startsWith("hyperslab-regular "))
    // points v2: enc-size 8, coords past 2^32
    val pt = ByteBuffer.allocate(13 + 8 + 2 * 8).order(ByteOrder.LITTLE_ENDIAN)
    pt.putInt(1).putInt(2)
    pt.put(8.toByte).putInt(1).putLong(2L) // enc, rank, npoints
    pt.putLong(5000000000L).putLong(7L)
    assert(Hdf5.selectionString(pt.array(), 0) == "points (5000000000);(7)")
    // unknown versions still fail by name
    val bad = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bad.putInt(2).putInt(4)
    val e = intercept[IllegalArgumentException](Hdf5.selectionString(bad.array(), 0))
    assert(e.getMessage.contains("version 4"))
    // an UNTRUSTED u64 npoints whose byte-size product wraps negative must
    // fail the bound, not loop ~2^62 iterations rendering the selection
    val wrap = ByteBuffer.allocate(13 + 8).order(ByteOrder.LITTLE_ENDIAN)
    wrap.putInt(1).putInt(2)
    wrap.put(8.toByte).putInt(2).putLong(0x4000000000000000L) // enc, rank, np=2^62
    val e2 = intercept[IllegalArgumentException](Hdf5.selectionString(wrap.array(), 0))
    assert(e2.getMessage.contains("overruns"), e2.getMessage)
  }

  test("compound-base vlen sequences decode to ragged record lists") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built GCOL at "file offset" 1000: obj1 = 2 records of
    // {a f64, b f64}, obj2 = 1 record
    def rec(vs: Double*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); b.array()
    }
    val objs = Seq(rec(1.0, 2.0, 3.0, 4.0), rec(5.0, 6.0))
    val gcolSize = 16L + objs.map(o => 16 + (o.length + 7) / 8 * 8).sum + 16
    val g = ByteBuffer.allocate(gcolSize.toInt).order(ByteOrder.LITTLE_ENDIAN)
    g.put("GCOL".getBytes).put(1.toByte).put(0.toByte).putShort(0)
    g.putLong(gcolSize)
    objs.zipWithIndex.foreach { case (o, i) =>
      g.putShort((i + 1).toShort).putShort(1).putInt(0).putLong(o.length.toLong)
      g.put(o)
    }
    val fileImage = new Array[Byte](1000 + gcolSize.toInt)
    System.arraycopy(g.array(), 0, fileImage, 1000, gcolSize.toInt)
    val stub: Hdf5.ByteSource = (off: Long, len: Int) =>
      java.util.Arrays.copyOfRange(fileImage, off.toInt, off.toInt + len)
    // element descriptors: len u32, GCOL addr u64, object index u32
    val desc = ByteBuffer.allocate(3 * 16).order(ByteOrder.LITTLE_ENDIAN)
    desc.putInt(2).putLong(1000L).putInt(1) // 2 records
    desc.putInt(1).putLong(1000L).putInt(2) // 1 record
    desc.putInt(0).putLong(0L).putInt(0)    // null element
    val ct = Hdf5.CompoundType(16, Seq(
      Hdf5.CompoundMember("a", 0, Hdf5.NumType("float", 8, littleEndian = true)),
      Hdf5.CompoundMember("b", 8, Hdf5.NumType("float", 8, littleEndian = true))))
    val out = Hdf5.decodeVlenCompoundSeqs(desc.array(),
      Hdf5.VlenSeqType(ct), 3, stub)
    assert(out(0) == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    assert(out(1) == Seq(Seq(5.0, 6.0)))
    assert(out(2).isEmpty)
    // non-compound bases still name themselves
    val e = intercept[IllegalArgumentException](
      Hdf5.decodeVlenCompoundSeqs(desc.array(),
        Hdf5.VlenSeqType(Hdf5.NumType("float", 8, littleEndian = true)), 1, stub))
    assert(e.getMessage.contains("compound-base"))
  }

  test("region references inside compounds decode like any member; bad shapes name themselves") {
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("grid", Seq(2, 2), Array(1.0, 2.0, 3.0, 4.0)),
      Hdf5.WriteVar("roi", Seq(2), Array.empty,
        typed = Some(Hdf5.RegionRefData(Seq(
          Some(("grid", Hdf5.HyperSel(Seq((Seq(0, 0), Seq(0, 1)))))),
          Some(("grid", Hdf5.PointSel(Seq(Seq(1, 1)))))))))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "roi").get._2
    val ds = Hdf5.readDataset(s, "roi", oh)
    val rr = ds.dtype.asInstanceOf[Hdf5.RegionRefType]
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    assert(Hdf5.decodeRegionRefs(s.read(addr, size.toInt), rr, 2, s).toSeq ==
      Seq("/grid hyperslab (0,0)-(0,1)", "/grid points (1,1)"))
    // an unknown target fails at assembly with the name
    val e = intercept[IllegalArgumentException](Hdf5.assemble(Seq(
      Hdf5.WriteVar("r", Seq(1), Array.empty,
        typed = Some(Hdf5.RegionRefData(Seq(
          Some(("nope", Hdf5.AllSel)))))))))
    assert(e.getMessage.contains("nope"))
    // a v2 (64-bit) hyperslab serialization is a NAMED error, not a
    // misread: hand-build a GCOL holding (grid's header address, a
    // type-2/version-4 selection) appended past the file's end
    val gridOh = Hdf5.listDatasets(s, rootOh).find(_._1 == "grid").get._2
    val payload = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    payload.putLong(gridOh).putInt(2).putInt(4).putInt(0).putInt(0)
    val gcol = ByteBuffer.allocate(16 + 16 + 24 + 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    gcol.put("GCOL".getBytes).put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    gcol.putLong(gcol.capacity().toLong)
    gcol.putShort(1).putShort(1).putInt(0).putLong(24L)
    gcol.put(payload.array())
    val heapAddr = bytes.length.toLong
    val s2 = src(bytes ++ gcol.array())
    val el = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    el.putLong(heapAddr).putInt(1)
    val e2 = intercept[IllegalArgumentException](
      Hdf5.decodeRegionRefs(el.array(), Hdf5.RegionRefType(12), 1, s2))
    assert(e2.getMessage.contains("version 4"))
  }

  // ── registered plugin filters: zstd (32015) and lz4 (32004) ─────────────

  test("zstd-filtered chunks round-trip (writer emits, defilter decodes)") {
    val vals = Array.tabulate(48)(i => math.sin(i * 0.7) * 10)
    val bytes = Hdf5.assemble(Seq(
      Hdf5.WriteVar("z", Seq(6, 8), vals, chunkDims = Some(Seq(3, 4)),
        deflateLevel = 3, compressor = "zstd")))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "z").get._2
    val ds = Hdf5.readDataset(s, "z", oh)
    assert(ds.filters.map(_.id) == Seq(2, 32015))
    val acc = new Array[Double](48)
    Hdf5.listChunks(s, ds).foreach { c =>
      val got = Hdf5.decode(
        Hdf5.defilter(s.read(c.addr, c.size), ds.filters, c.filterMask), ds.dtype, 12)
      var ci = 0
      while (ci < 12) {
        val y = c.offsets(0) + ci / 4; val x = c.offsets(1) + ci % 4
        if (y < 6 && x < 8) acc((y * 8 + x).toInt) = got(ci)
        ci += 1
      }
    }
    assert(acc.toSeq == vals.toSeq)
  }

  test("lz4 plugin framing (BE sizes, blocked) defilters exactly") {
    // Build the registered HDF5 lz4 plugin layout by hand: u64 BE total,
    // u32 BE block size, then [u32 BE compressed len, block bytes]*.
    val raw = Array.tabulate(1000)(i => (i % 251).toByte)
    val blockSize = 256
    val comp = net.jpountz.lz4.LZ4Factory.fastestJavaInstance().fastCompressor()
    val out = new java.io.ByteArrayOutputStream()
    val head = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
    head.putLong(raw.length.toLong).putInt(blockSize)
    out.write(head.array())
    raw.grouped(blockSize).foreach { block =>
      val c = comp.compress(block)
      val stored = if (c.length >= block.length) block else c // raw when not smaller
      val lb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      lb.putInt(stored.length)
      out.write(lb.array()); out.write(stored)
    }
    val got = Hdf5.defilter(out.toByteArray, Seq(Hdf5.Filter(32004, Seq(0, blockSize))), 0)
    assert(got.toSeq == raw.toSeq)
  }

  test("unknown filter ids still error with the id named") {
    val e = intercept[IllegalArgumentException](
      Hdf5.defilter(Array[Byte](1, 2, 3), Seq(Hdf5.Filter(307, Seq.empty)), 0))
    assert(e.getMessage.contains("filter id 307"))
  }

  test("vlen STRING attributes resolve through their GCOL (h5py str attrs)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // h5py stores str attrs as VLEN strings; `_Unsigned = "true"` rides
    // one, so dropping the class would silently skip the reinterpretation.
    // GCOL at "file offset" 2000 holding object 1 = "true"
    val gcolSize = 16 + 16 + 8 + 16
    val g = ByteBuffer.allocate(gcolSize).order(ByteOrder.LITTLE_ENDIAN)
    g.put("GCOL".getBytes).put(1.toByte).put(0.toByte).putShort(0)
    g.putLong(gcolSize.toLong)
    g.putShort(1).putShort(1).putInt(0).putLong(4L).put("true".getBytes)
      .put(new Array[Byte](4))
    g.putShort(0).putShort(0).putInt(0).putLong(16L)
    val fileImage = new Array[Byte](2000 + gcolSize)
    System.arraycopy(g.array(), 0, fileImage, 2000, gcolSize)
    val stub: Hdf5.ByteSource = (off: Long, len: Int) =>
      java.util.Arrays.copyOfRange(fileImage, off.toInt, off.toInt + len)
    // v1 attribute message: header(8) + name(pad 8) + dt(pad 16) + ds(pad 8)
    // + one 16-byte vlen element (len, GCOL addr, index)
    val b = ByteBuffer.allocate(8 + 16 + 16 + 8 + 16).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte)
    b.putShort(10) // name size incl NUL ("_Unsigned\0")
    b.putShort(16).putShort(8)
    b.put("_Unsigned".getBytes).put(0.toByte).put(new Array[Byte](6)) // pad to 16
    // dt: v1 class 9, vlen type 1 (string), charset bits; size 16; base = 1-byte str
    b.put(0x19.toByte).put(0x01.toByte).put(0x01.toByte).put(0.toByte).putInt(16)
    b.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(1)
    // ds: v1 scalar (rank 0)
    b.put(1.toByte).put(0.toByte).put(0.toByte).put(new Array[Byte](5))
    // element: length 4, GCOL addr 2000, object index 1
    b.putInt(4).putLong(2000L).putInt(1)
    val parsed = Hdf5.parseAttribute(b.array(), Some(stub))
    assert(parsed.contains("_Unsigned" -> "true"), s"got: $parsed")
    // without a source the class is still skipped, not crashed
    assert(Hdf5.parseAttribute(b.array()).isEmpty)
  }
}
