package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based round-trips for the Hdf5 writer/reader pair across every
  * layout the reader supports: contiguous, chunked v3 (v1 B-tree), and the
  * chunked-v4 `libver='latest'` indexes (single chunk, implicit, fixed
  * array paged + unpaged). Random shapes, chunk grids (edge chunks
  * included), and values must survive assemble→parse→listChunks→decode
  * bit-exactly. No SparkSession needed — this is the file-format kernel. */
object Hdf5PropertySpec extends Properties("Hdf5Layouts") {

  private def byteSource(bytes: Array[Byte]): Hdf5.ByteSource =
    (off: Long, len: Int) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)

  /** Read back every cell of the single dataset in an assembled file. */
  private def readBack(bytes: Array[Byte]): (Seq[Long], Array[Double]) = {
    val src = byteSource(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(src)
    val (nm, oh) = Hdf5.listDatasets(src, rootOh).head
    val ds = Hdf5.readDataset(src, nm, oh)
    val n = ds.dims.product.toInt
    ds.layout match {
      case Hdf5.Contiguous(addr, size) =>
        (ds.dims, Hdf5.decode(src.read(addr, size.toInt), ds.dtype, n))
      case ch: Hdf5.Chunked =>
        val cd = ch.chunkDims
        val chunkN = cd.map(_.toLong).product.toInt
        val acc = new Array[Double](n)
        java.util.Arrays.fill(acc, Double.NaN)
        Hdf5.listChunks(src, ds).foreach { c =>
          val vals = Hdf5.decode(
            Hdf5.defilter(src.read(c.addr, c.size), ds.filters, c.filterMask),
            ds.dtype, chunkN)
          // row-major cell walk of the chunk, skipping out-of-range padding
          var ci = 0
          while (ci < chunkN) {
            var rem = ci
            val idx = new Array[Long](cd.length)
            var d = cd.length - 1
            while (d >= 0) { idx(d) = rem % cd(d); rem /= cd(d); d -= 1 }
            var ok = true; var flat = 0L; var e = 0
            while (e < cd.length) {
              val coord = c.offsets(e) + idx(e)
              if (coord >= ds.dims(e)) { ok = false; e = cd.length }
              else { flat = flat * ds.dims(e) + coord; e += 1 }
            }
            if (ok) acc(flat.toInt) = vals(ci)
            ci += 1
          }
        }
        (ds.dims, acc)
      case Hdf5.Compact(data) => (ds.dims, Hdf5.decode(data, ds.dtype, n))
    }
  }

  private val shapeGen: Gen[(Seq[Int], Seq[Int])] = for {
    rank <- Gen.choose(1, 3)
    dims <- Gen.listOfN(rank, Gen.choose(1, 9))
    cds <- Gen.sequence[Seq[Int], Int](dims.map(d => Gen.choose(1, d)))
  } yield (dims, cds)

  private def values(dims: Seq[Int], seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(dims.map(_.toLong).product.toInt)(rnd.nextDouble() * 200 - 100)
  }

  private def roundtrip(v: Hdf5.WriteVar): Prop = {
    val (dims, got) = readBack(Hdf5.assemble(Seq(v)))
    Prop.all(
      Prop(dims == v.dims.map(_.toLong)) :| "shape",
      Prop(got.toSeq == v.values.toSeq) :| "values bit-exact")
  }

  property("contiguous") = forAll(shapeGen, Gen.long) { case ((dims, _), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed)))
  }

  property("chunkedV3Btree") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed), chunkDims = Some(cds)))
  }

  property("v4SingleChunk") = forAll(shapeGen, Gen.long) { case ((dims, _), seed) =>
    // single-chunk index requires the chunk to cover the dataset
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(dims), v4Index = Some("single")))
  }

  property("v4Implicit") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("implicit")))
  }

  property("v4FixedArray") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("fa")))
  }

  property("v4FixedArrayPaged") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("fa-paged")))
  }

  property("v4ExtensibleArray") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("ea")))
  }

  property("v4ExtensibleArraySuperBlocks") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("ea-sblk")))
  }

  // deterministic deep EA: 500 single-element chunks push through many
  // super-block generations (u up to ~13) behind the EASB indirection
  property("v4ExtensibleArrayDeep") = {
    val dims = Seq(500)
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, 42L),
      chunkDims = Some(Seq(1)), v4Index = Some("ea-sblk")))
  }

  property("v4BTreeV2") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("bt2")))
  }

  property("v4ExtensibleArrayPagedBlocks") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, seed),
      chunkDims = Some(cds), v4Index = Some("ea-paged")))
  }

  // deterministic deep paged EA: 300 single-element chunks make data blocks
  // of 8..64 elements split into 4-element pages behind the super blocks
  property("v4ExtensibleArrayPagedDeep") = {
    val dims = Seq(300)
    roundtrip(Hdf5.WriteVar("v", dims, values(dims, 7L),
      chunkDims = Some(Seq(1)), v4Index = Some("ea-paged")))
  }

  // dense root group: every layout must also read back when the links live
  // in a fractal heap + v2 B-tree instead of a symbol table
  property("denseRootGroup") = forAll(shapeGen, Gen.long) { case ((dims, cds), seed) =>
    val (rdims, got) = readBack(Hdf5.assemble(
      Seq(Hdf5.WriteVar("v", dims, values(dims, seed), chunkDims = Some(cds))),
      denseRoot = true))
    Prop.all(
      Prop(rdims == dims.map(_.toLong)) :| "shape",
      Prop(got.toSeq != null && got.length == dims.product) :| "read")
  }

  // ── typed datatypes: random compound schemas + string/vlen payloads ─────

  private val strGen: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      9 -> Gen.alphaNumChar, 1 -> Gen.oneOf('å', 'ß', '中'))).map(_.mkString))

  property("typedFixedStrings") = forAll(Gen.nonEmptyListOf(strGen)) { vals =>
    val size = math.max(1, vals.map(_.getBytes("UTF-8").length).max)
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("s", Seq(vals.length), Array.empty,
      typed = Some(Hdf5.FixedStrData(vals, size)))))
    val src = byteSource(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(src)
    val (nm, oh) = Hdf5.listDatasets(src, rootOh).head
    val ds = Hdf5.readDataset(src, nm, oh)
    val Hdf5.Contiguous(addr, sz) = ds.layout: @unchecked
    val got = Hdf5.decodeStrings(src.read(addr, sz.toInt), ds.dtype, vals.length, src)
    // NUL-trim semantics: embedded content survives; values round-trip
    Prop(got.toSeq == vals) :| s"got ${got.toSeq} want $vals"
  }

  property("typedVlenStrings") = forAll(Gen.nonEmptyListOf(strGen)) { vals =>
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("s", Seq(vals.length), Array.empty,
      typed = Some(Hdf5.VlenStrData(vals)))))
    val src = byteSource(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(src)
    val (nm, oh) = Hdf5.listDatasets(src, rootOh).head
    val ds = Hdf5.readDataset(src, nm, oh)
    val Hdf5.Contiguous(addr, sz) = ds.layout: @unchecked
    val got = Hdf5.decodeStrings(src.read(addr, sz.toInt), ds.dtype, vals.length, src)
    Prop(got.toSeq == vals) :| s"got ${got.toSeq} want $vals"
  }

  property("typedCompoundRandomSchema") = forAll(
    Gen.chooseNum(1, 40), Gen.chooseNum(1, 6), Gen.long) { (n, nMembers, seed) =>
    val rnd = new scala.util.Random(seed)
    val members = (0 until nMembers).map { m =>
      if (rnd.nextBoolean()) {
        s"num_$m" -> Hdf5.F64Col(Array.fill(n)(rnd.nextDouble() * 100 - 50))
      } else {
        val size = 1 + rnd.nextInt(10)
        s"str_$m" -> Hdf5.StrCol(
          Seq.fill(n)(rnd.alphanumeric.take(rnd.nextInt(size + 1)).mkString), size)
      }
    }
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("t", Seq(n), Array.empty,
      typed = Some(Hdf5.CompoundData(members)))))
    val src = byteSource(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(src)
    val (nm, oh) = Hdf5.listDatasets(src, rootOh).head
    val ds = Hdf5.readDataset(src, nm, oh)
    val Hdf5.Contiguous(addr, sz) = ds.layout: @unchecked
    val cols = Hdf5.decodeCompound(src.read(addr, sz.toInt), ds.dtype, n, src).toMap
    Prop.all(members.map {
      case (name, Hdf5.F64Col(vs)) =>
        Prop(cols(name).asInstanceOf[Array[Double]].toSeq == vs.toSeq) :| name
      case (name, Hdf5.StrCol(vs, _)) =>
        Prop(cols(name).asInstanceOf[Array[String]].toSeq == vs) :| name
    }: _*)
  }

  property("typedVlenSeqs") = forAll(
    Gen.chooseNum(1, 20), Gen.long) { (n, seed) =>
    val rnd = new scala.util.Random(seed)
    val vals = Seq.fill(n)(Array.fill(rnd.nextInt(30))(rnd.nextDouble()))
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("v", Seq(n), Array.empty,
      typed = Some(Hdf5.VlenSeqData(vals)))))
    val src = byteSource(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(src)
    val (nm, oh) = Hdf5.listDatasets(src, rootOh).head
    val ds = Hdf5.readDataset(src, nm, oh)
    val Hdf5.Contiguous(addr, sz) = ds.layout: @unchecked
    val got = Hdf5.decodeVlenSeqs(src.read(addr, sz.toInt), ds.dtype, n, src)
    Prop(got.map(_.toSeq).toSeq == vals.map(_.toSeq)) :| "ragged arrays"
  }
}
