package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Minimal HDF5 file-format layer — just enough of the public "HDF5 File
  * Format Specification Version 3.0" (support.hdfgroup.org) to ingest
  * HDF5-backed NetCDF-4 archives, the format most modern `.nc` files use
  * (the reference opens them via `xr.open_dataset`, marEx detect.py:409).
  *
  * Read side (the part that must accept files written by other tools):
  *  - superblock v0/v1 (netcdf-c and h5py default) and v2/v3
  *  - object headers v1 and v2 ("OHDR"), with continuation blocks
  *  - old-style groups (symbol-table message → v1 B-tree + local heap +
  *    SNOD nodes), compact new-style groups (link messages), and DENSE
  *    new-style groups (Link Info → fractal heap + v2 B-tree name index) —
  *    the storage any netCDF-4 group with more than 8 links uses
  *  - attributes, both compact (attribute messages) and dense (Attribute
  *    Info → fractal heap + type-8 name index, > 8 attributes per object)
  *  - dataspace v1/v2, datatype classes 0 (fixed-point) and 1 (IEEE float)
  *    in either endianness, fill-value, filter pipeline v1/v2
  *  - data layouts: compact, contiguous, chunked v3 (v1 B-tree chunk
  *    index), and ALL FIVE chunked-v4 `libver='latest'` indexes: Single
  *    Chunk, Implicit, Fixed Array (paged + unpaged), Extensible Array,
  *    and v2 B-tree (multi-unlimited-dimension datasets)
  *  - filters: deflate (1), shuffle (2), fletcher32 (3, checksum stripped);
  *    anything else → error naming the filter id
  *
  * Write side (fixture + sink dual): superblock v0, v1 object headers,
  * an old-style or dense root group, f64 datasets with contiguous or
  * chunked+shuffle+deflate layout across the index types above — the same
  * structures the read side parses, so round-trips exercise both. Unknown
  * header messages are skipped by size, so attribute-bearing files
  * (netCDF-4 writes `DIMENSION_LIST`/`_Netcdf4Dimid` etc.) parse fine.
  *
  * All addresses/lengths are 8-byte (the library default); UNDEF = -1.
  */
private[graft] object Hdf5 {

  val Undef: Long = -1L
  val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a.toByte, '\n')

  /** Random-access byte source (local file, Hadoop FS stream, …). */
  trait ByteSource { def read(off: Long, len: Int): Array[Byte] }

  private def le(b: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)

  // ── parsed model ─────────────────────────────────────────────────────────

  /** Element datatype of a dataset; `size` is the stored bytes per element. */
  sealed trait DType { def size: Int }

  /** Numeric type: kind ∈ {int, uint, float}, size in bytes, littleEndian. */
  final case class NumType(kind: String, size: Int, littleEndian: Boolean) extends DType

  /** Fixed-length string (datatype class 3): `size`-byte cells, NUL-padded
    * or NUL-terminated (both trim the same way on read). */
  final case class StrType(size: Int, utf8: Boolean) extends DType

  /** Variable-length string (class 9, vlen type 1). Each stored element is
    * 16 bytes: byte length (4) + global-heap collection address (8) +
    * object index within the collection (4); the bytes live in a "GCOL"
    * global heap collection. */
  final case class VlenStrType(utf8: Boolean) extends DType { def size: Int = 16 }

  /** Variable-length SEQUENCE (class 9, vlen type 0) — ragged per-element
    * arrays (e.g. per-station sample lists, per-document tag lists). Same
    * 16-byte element encoding as vlen strings; the heap object holds
    * `length` packed base-type values. Numeric bases decode via
    * [[decodeVlenSeqs]], string bases (fixed or vlen) via
    * [[decodeVlenStrSeqs]]; compound bases stay a named error. */
  final case class VlenSeqType(base: DType) extends DType { def size: Int = 16 }

  final case class CompoundMember(name: String, offset: Int, dtype: DType)

  /** Compound type (class 6) — HDF5's record/struct type, what PyTables/
    * pandas `to_hdf` tables and netCDF-4 compound variables store.
    * Members may themselves be compound (nested records). */
  final case class CompoundType(size: Int, members: Seq[CompoundMember]) extends DType

  /** OBJECT reference (class 7, reference type 0): each element is the
    * file address of the referenced object's header. Reads resolve the
    * address back to the object's link name ("/<name>"). */
  final case class RefType(size: Int) extends DType

  /** DATASET REGION reference (class 7, reference type 1): each element is
    * a (global heap collection address, object index) pair; the GCOL
    * object holds the referenced dataset's object-header address followed
    * by the serialized dataspace selection (H5S v1: all / points /
    * hyperslab block list). Reads render the canonical string
    * `"/<name> hyperslab (s…)-(e…);…"` / `"… points (p…);…"` / `"… all"`
    * (`""` for a null reference). */
  final case class RegionRefType(size: Int) extends DType

  /** ENUMERATION (class 8): named codes over a fixed-point base — what
    * netCDF-4 writes for CF flag variables (the reference ingests such
    * files via `xr.open_dataset`, detect.py:409). Cells decode AS the
    * base integers; the name↔code map rides to readers as column
    * metadata (`enum_names`/`enum_values`), the enum analogue of CF
    * `flag_meanings`/`flag_values`. */
  final case class EnumType(base: NumType, names: Seq[String],
      values: Seq[Long]) extends DType { def size: Int = base.size }

  /** ARRAY compound member (class 10): a fixed-shape array inside a
    * record — PyTables' vector columns (`Float64Col(shape=(k,))`).
    * Numeric bases decode to one `Array[Double]` per record (Spark
    * `ArrayType(DoubleType)`). */
  final case class ArrayMemberType(base: NumType, dims: Seq[Int])
      extends DType { def size: Int = base.size * dims.product }

  /** OPAQUE (class 5): `size` uninterpreted bytes per element plus an
    * ASCII tag describing what they are (`H5Tset_tag`). Cells surface as
    * raw byte arrays (Spark BINARY) with the tag as column metadata —
    * the same opaque-bytes-plus-typed-metadata shape as the multimodal
    * columns. */
  final case class OpaqueType(size: Int, tag: String) extends DType

  final case class Filter(id: Int, clientValues: Seq[Int])

  sealed trait Layout
  final case class Compact(data: Array[Byte]) extends Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout

  /** How a chunked dataset's chunks are indexed. Layout v1–v3 always use a
    * v1 B-tree; layout v4 (written under `libver='latest'`) picks one of
    * five index types at create time. */
  sealed trait ChunkIndex
  /** v1 B-tree (layout v3, the netcdf-c / h5py default). */
  case object BTreeV1 extends ChunkIndex
  /** Exactly one chunk; the layout message holds its location directly.
    * `filteredSize` is set iff the chunk went through the filter pipeline
    * (layout flag 0x02), else the chunk is raw chunk-sized bytes. */
  final case class SingleChunk(filteredSize: Option[Long], filterMask: Int) extends ChunkIndex
  /** Unfiltered early-allocated chunks laid out consecutively, row-major. */
  case object ImplicitIndex extends ChunkIndex
  /** Fixed Array ("FAHD"/"FADB") — fixed-shape chunked datasets. */
  final case class FixedArray(pageBits: Int) extends ChunkIndex

  /** Extensible Array ("EAHD"/"EAIB"/"EASB"/"EADB") — single-unlimited-
    * dimension chunked datasets under `libver='latest'` (the typical
    * unlimited-time case). Creation parameters are read from the EAHD
    * header, so none are kept here. */
  case object ExtensibleArray extends ChunkIndex

  /** v2 B-tree chunk index — `libver='latest'` datasets with more than one
    * unlimited dimension. Record geometry comes from the BTHD header. */
  case object BTreeV2Index extends ChunkIndex

  /** chunkDims excludes the trailing element-size pseudo-dimension.
    * `indexAddr` is the chunk B-tree root (v1), the FA header, the implicit
    * base address, or the single chunk's data address. */
  final case class Chunked(indexAddr: Long, chunkDims: Seq[Int],
      index: ChunkIndex = BTreeV1) extends Layout

  final case class Dataset(name: String, dims: Seq[Long], dtype: DType,
      layout: Layout, filters: Seq[Filter], fillValue: Option[Double])

  /** One stored chunk: logical element offsets + file location. */
  final case class ChunkRef(offsets: Seq[Long], addr: Long, size: Int,
      filterMask: Int)

  // ── superblock ───────────────────────────────────────────────────────────

  /** @return (root object header address, symbol-table scratch B-tree/heap
    *         addresses if the root entry cached them — v0/v1 only) */
  def readSuperblock(src: ByteSource): (Long, Option[(Long, Long)]) = {
    val head = src.read(0L, 128)
    require(head.take(8).sameElements(Signature), "not an HDF5 file")
    val version = head(8) & 0xff
    version match {
      case 0 | 1 =>
        require((head(13) & 0xff) == 8 && (head(14) & 0xff) == 8,
          "only 8-byte offsets/lengths supported")
        val fixed = 24 + (if (version == 1) 4 else 0)
        val b = le(head)
        // base, free-space, EOF, driver-info addresses, then the root
        // group's 40-byte symbol table entry
        val entryOff = fixed + 32
        val ohAddr = b.getLong(entryOff + 8)
        val cacheType = b.getInt(entryOff + 16)
        val scratch =
          if (cacheType == 1)
            Some((b.getLong(entryOff + 24), b.getLong(entryOff + 32)))
          else None
        (ohAddr, scratch)
      case 2 | 3 =>
        require((head(9) & 0xff) == 8 && (head(10) & 0xff) == 8,
          "only 8-byte offsets/lengths supported")
        (le(head).getLong(36), None)
      case v => throw new IllegalArgumentException(s"unsupported superblock version $v")
    }
  }

  // ── object headers ───────────────────────────────────────────────────────

  final case class Message(typ: Int, body: Array[Byte])

  /** Parse all messages of the object header at `addr` (v1 or v2),
    * following continuation blocks. */
  def readMessages(src: ByteSource, addr: Long): Seq[Message] = {
    val probe = src.read(addr, 16)
    if (probe.take(4).sameElements("OHDR".getBytes)) readMessagesV2(src, addr)
    else readMessagesV1(src, addr, probe)
  }

  private def readMessagesV1(src: ByteSource, addr: Long,
      probe: Array[Byte]): Seq[Message] = {
    val b = le(probe)
    require((probe(0) & 0xff) == 1, s"unsupported object header version ${probe(0)} at $addr")
    val nMsgs = b.getShort(2) & 0xffff
    val headerSize = b.getInt(8)
    val out = Seq.newBuilder[Message]
    var remaining = nMsgs
    // (block offset, block length); messages start 16 bytes in (the 12-byte
    // prelude is padded to the 8-byte alignment the messages use)
    var blocks = List((addr + 16, headerSize.toLong))
    while (remaining > 0 && blocks.nonEmpty) {
      val (off, len) = blocks.head
      blocks = blocks.tail
      val block = src.read(off, len.toInt)
      val bb = le(block)
      var p = 0
      while (remaining > 0 && p + 8 <= len) {
        val typ = bb.getShort(p) & 0xffff
        val size = bb.getShort(p + 2) & 0xffff
        val body = java.util.Arrays.copyOfRange(block, p + 8, p + 8 + size)
        if (typ == 0x0010) { // continuation: offset + length
          val cb = le(body)
          blocks = blocks :+ ((cb.getLong(0), cb.getLong(8)))
        } else out += Message(typ, body)
        remaining -= 1
        p += 8 + size
      }
    }
    out.result()
  }

  private def readMessagesV2(src: ByteSource, addr: Long): Seq[Message] = {
    val h = src.read(addr, 16)
    val flags = h(5) & 0xff
    var p = 6
    if ((flags & 0x20) != 0) p += 16 // four timestamps
    if ((flags & 0x10) != 0) p += 4  // compact/dense phase-change limits
    val sizeWidth = 1 << (flags & 0x3)
    val chunkBytes = src.read(addr + p, sizeWidth)
    val chunk0 = le(java.util.Arrays.copyOf(chunkBytes, 8)).getLong(0)
    val msgStart = addr + p + sizeWidth
    val out = Seq.newBuilder[Message]
    // (block start, length, skipSignature) — continuation blocks repeat a
    // 4-byte "OCHK" signature; every block ends with a 4-byte checksum
    var blocks = List((msgStart, chunk0, false))
    while (blocks.nonEmpty) {
      val (off, len, sig) = blocks.head
      blocks = blocks.tail
      val block = src.read(off, len.toInt)
      val bb = le(block)
      var q = if (sig) 4 else 0
      val end = len.toInt - 4 // trailing checksum (not verified)
      while (q + 4 <= end) {
        val typ = block(q) & 0xff
        val size = bb.getShort(q + 1) & 0xffff
        var bodyOff = q + 4
        if ((flags & 0x04) != 0) bodyOff += 2 // creation-order field
        if (bodyOff + size > end) { q = end }
        else {
          val body = java.util.Arrays.copyOfRange(block, bodyOff, bodyOff + size)
          if (typ == 0x10) {
            val cb = le(body)
            blocks = blocks :+ ((cb.getLong(0) + 0L, cb.getLong(8), true))
          } else out += Message(typ, body)
          q = bodyOff + size
        }
      }
    }
    out.result()
  }

  // ── message decoders ─────────────────────────────────────────────────────

  def parseDataspace(body: Array[Byte]): Seq[Long] = {
    val version = body(0) & 0xff
    val rank = body(1) & 0xff
    val off = version match {
      case 1 => 8 // version, rank, flags, reserved(5)
      case 2 => 4 // version, rank, flags, type
      case v => throw new IllegalArgumentException(s"dataspace version $v")
    }
    val b = le(body)
    (0 until rank).map(i => b.getLong(off + i * 8))
  }

  def parseDatatype(body: Array[Byte]): DType = parseDatatypeAt(body, 0)._1

  /** Parse the datatype message starting at `off`; returns the type and the
    * number of bytes it occupies (8-byte header + class-specific
    * properties) — needed to walk nested types (compound members, vlen
    * base types), whose encoded length is not stored explicitly. */
  private def parseDatatypeAt(body: Array[Byte], off: Int): (DType, Int) = {
    val cls = body(off) & 0x0f
    val version = (body(off) & 0xf0) >> 4
    val bits0 = body(off + 1) & 0xff
    val bits1 = body(off + 2) & 0xff
    val b = le(body)
    val size = b.getInt(off + 4)
    val littleEndian = (bits0 & 0x01) == 0
    cls match {
      case 0 => (NumType(if ((bits0 & 0x08) != 0) "int" else "uint", size, littleEndian), 12)
      case 1 => (NumType("float", size, littleEndian), 20)
      case 3 => // fixed-length string: bits 0–3 padding, 4–7 charset
        (StrType(size, utf8 = ((bits0 >> 4) & 0x0f) == 1), 8)
      case 9 => // variable-length: bits 0–3 vlen type, 4–7 padding, 8–11 charset
        val (base, baseLen) = parseDatatypeAt(body, off + 8)
        if ((bits0 & 0x0f) == 1) (VlenStrType(utf8 = (bits1 & 0x0f) == 1), 8 + baseLen)
        else base match {
          case b @ (_: NumType | _: StrType | _: VlenStrType) =>
            (VlenSeqType(b), 8 + baseLen)
          case o => throw new IllegalArgumentException(
            s"unsupported vlen sequence base datatype $o — numeric and " +
              "string bases only")
        }
      case 4 => // bitfield: property layout IDENTICAL to fixed-point (bit
        // offset u16, bit precision u16). The stored bits ARE the value —
        // surfaces as the unsigned integer of its size (bitfields carry
        // flag masks; sign extension would corrupt the high bit).
        // Exotic widths fail HERE with the construct named, not later in
        // the cell-decode loop as a bare "unsupported type uintN"
        require(Seq(1, 2, 4, 8).contains(size),
          s"bitfield datatype of $size bytes — only 1/2/4/8-byte bitfields decode")
        (NumType("uint", size, littleEndian), 12)
      case 5 => // opaque: class bit field bits 0–7 = ASCII tag length
        // (multiple of 8, NUL-padded); elements are `size` raw bytes
        val tagLen = bits0
        require(off + 8 + tagLen <= body.length,
          s"opaque tag ($tagLen B) overruns the datatype message")
        var e = off + 8
        while (e < off + 8 + tagLen && body(e) != 0) e += 1
        (OpaqueType(size, new String(body, off + 8, e - (off + 8), "UTF-8")),
          8 + tagLen)
      case 6 => // compound: member count in class bit field bits 0–15
        val nMembers = bits0 | (bits1 << 8)
        var p = off + 8
        val members = (0 until nMembers).map { _ =>
          version match {
            case 1 | 2 =>
              var nameEnd = p
              while (body(nameEnd) != 0) nameEnd += 1
              val name = new String(body, p, nameEnd - p, "UTF-8")
              p += (nameEnd - p) / 8 * 8 + 8 // NUL-terminated, padded to ×8
              val memberOff = b.getInt(p)
              if (version == 1) {
                val dim = body(p + 4) & 0xff
                require(dim == 0, s"compound member $name: array members unsupported")
                p += 4 + 1 + 3 + 4 + 4 + 16 // offset, dim, reserved, perm, reserved, dims
              } else p += 4
              val (mt, mlen) = parseDatatypeAt(body, p)
              p += mlen
              CompoundMember(name, memberOff, mt)
            case 3 =>
              var nameEnd = p
              while (body(nameEnd) != 0) nameEnd += 1
              val name = new String(body, p, nameEnd - p, "UTF-8")
              p = nameEnd + 1 // no padding in v3
              val offBytes = // fewest bytes that can hold the compound size
                math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(
                  math.max(1L, size.toLong)) + 7) / 8).toInt
              val memberOff = leVar(body, p, offBytes).toInt
              p += offBytes
              val (mt, mlen) = parseDatatypeAt(body, p)
              p += mlen
              CompoundMember(name, memberOff, mt)
            case v => throw new IllegalArgumentException(s"compound datatype version $v")
          }
        }
        (CompoundType(size, members), p - off)
      case 7 => // reference: bits 0–3 = reference type
        (bits0 & 0x0f) match {
          case 0 => (RefType(size), 8)
          case 1 => (RegionRefType(size), 8)
          case t => throw new IllegalArgumentException(
            s"unsupported reference type $t (object and dataset-region " +
              "references only)")
        }
      case 8 => // enumeration: base type, then names + codes
        val nMembers = bits0 | (bits1 << 8)
        val (base, baseLen) = parseDatatypeAt(body, off + 8)
        val bt = base match {
          case nt @ NumType("int" | "uint", _, _) => nt
          case o => throw new IllegalArgumentException(
            s"enum base datatype must be fixed-point, got $o")
        }
        var p = off + 8 + baseLen
        val names = (0 until nMembers).map { _ =>
          var e = p
          // bound the NUL scan: a truncated foreign image must fail by
          // name, not with an index exception deep in the walk
          while (e < body.length && body(e) != 0) e += 1
          require(e < body.length,
            s"enum member name at $p overruns the datatype message " +
              s"(${body.length} bytes) — truncated enum datatype")
          val nm = new String(body, p, e - p, "UTF-8")
          // v1/v2 names are NUL-terminated padded to ×8; v3 unpadded
          p = if (version == 3) e + 1 else p + ((e - p) / 8 * 8 + 8)
          nm
        }
        require(p + nMembers.toLong * bt.size <= body.length,
          s"enum value table at $p ($nMembers × ${bt.size} B) overruns " +
            s"the datatype message (${body.length} bytes)")
        val values = (0 until nMembers).map { i =>
          decode(java.util.Arrays.copyOfRange(body,
            p + i * bt.size, p + (i + 1) * bt.size), bt, 1)(0).toLong
        }
        p += nMembers * bt.size
        (EnumType(bt, names, values), p - off)
      case 10 => // array: rank, [reserved ×3 v2], dims, [perm v2], base
        val rank = body(off + 8) & 0xff
        require(rank >= 1 && rank <= 32, s"array datatype rank $rank (want 1..32)")
        var p = off + 9
        if (version == 2) p += 3
        val dims = (0 until rank).map(i => b.getInt(p + i * 4))
        p += 4 * rank
        if (version == 2) p += 4 * rank // permutation indices (identity in practice)
        val (base, baseLen) = parseDatatypeAt(body, p)
        base match {
          case nt: NumType =>
            // dims are UNTRUSTED file u32s: reject non-positive or
            // size-field-inconsistent shapes by name, before any
            // Int-overflowing product reaches an array allocation
            require(dims.forall(_ > 0),
              s"array datatype dims ${dims.mkString("x")} must be positive")
            // saturating fold: a wrapped product must FAIL the size check,
            // not wrap back onto it (same hardening as the H5S v2 counts)
            val cells = dims.foldLeft(1L)((a, d) =>
              if (a > Int.MaxValue) a else a * d)
            require(cells <= Int.MaxValue && cells * nt.size == size.toLong,
              s"array datatype dims ${dims.mkString("x")} × ${nt.size} B " +
                s"disagree with the declared element size $size")
            (ArrayMemberType(nt, dims), p - off + baseLen)
          case o => throw new IllegalArgumentException(
            s"array datatype over non-numeric base $o — numeric bases only")
        }
      case c => throw new IllegalArgumentException(
        s"unsupported datatype class $c (fixed-point, float, string, vlen, " +
          "compound, reference, enum, array, bitfield, opaque; class 2 " +
          "time stays a named error — dead in practice, no writer emits it)")
    }
  }

  def parseLayout(src: ByteSource, body: Array[Byte]): Layout = {
    val version = body(0) & 0xff
    val b = le(body)
    version match {
      case 3 | 4 =>
        val cls = body(1) & 0xff
        cls match {
          case 0 =>
            val n = b.getShort(2) & 0xffff
            Compact(java.util.Arrays.copyOfRange(body, 4, 4 + n))
          case 1 => Contiguous(b.getLong(2), b.getLong(10))
          case 2 if version == 3 =>
            val dim = body(2) & 0xff // rank + 1 (element-size pseudo-dim)
            val btree = b.getLong(3)
            val dims = (0 until dim - 1).map(i => b.getInt(11 + i * 4))
            Chunked(btree, dims)
          case 2 => // version 4 (`libver='latest'`): typed chunk index
            val flags = body(2) & 0xff
            val dim = body(3) & 0xff // rank + 1, like v3
            val encLen = body(4) & 0xff
            def dimAt(i: Int): Long = {
              val raw = java.util.Arrays.copyOfRange(body, 5 + i * encLen, 5 + (i + 1) * encLen)
              le(java.util.Arrays.copyOf(raw, 8)).getLong(0)
            }
            val dims = (0 until dim - 1).map(i => dimAt(i).toInt)
            var p = 5 + dim * encLen
            val idxType = body(p) & 0xff
            p += 1
            val index = idxType match {
              case 1 =>
                if ((flags & 0x02) != 0) { // filtered single chunk: size + mask
                  val sz = b.getLong(p); val mask = b.getInt(p + 8); p += 12
                  SingleChunk(Some(sz), mask)
                } else SingleChunk(None, 0)
              case 2 => ImplicitIndex
              case 3 => val pb = body(p) & 0xff; p += 1; FixedArray(pb)
              case 4 =>
                // 5 creation params (also stored in the EAHD header, which
                // the walker reads): max-bits, index-elmts, min-ptrs,
                // min-elmts, page-bits
                p += 5
                ExtensibleArray
              case 5 =>
                // creation params: node size (4), split / merge percent (1+1)
                p += 6
                BTreeV2Index
              case t => throw new IllegalArgumentException(s"chunk index type $t")
            }
            Chunked(b.getLong(p), dims, index)
          case c => throw new IllegalArgumentException(s"layout class $c")
        }
      case 1 | 2 =>
        // old layout: version, dimensionality, class, reserved(5)
        val dim = body(1) & 0xff
        val cls = body(2) & 0xff
        cls match {
          case 1 =>
            val addr = b.getLong(8)
            var size = 1L
            (0 until dim).foreach(i => size *= b.getInt(16 + i * 4))
            Contiguous(addr, size)
          case 2 =>
            val btree = b.getLong(8)
            val dims = (0 until dim - 1).map(i => b.getInt(16 + i * 4))
            Chunked(btree, dims)
          case 0 =>
            val n = b.getInt(8 + dim * 4)
            Compact(java.util.Arrays.copyOfRange(body, 12 + dim * 4, 12 + dim * 4 + n))
          case c => throw new IllegalArgumentException(s"layout class $c")
        }
      case v => throw new IllegalArgumentException(s"layout version $v")
    }
  }

  def parseFilters(body: Array[Byte]): Seq[Filter] = {
    val version = body(0) & 0xff
    val n = body(1) & 0xff
    val b = le(body)
    val out = Seq.newBuilder[Filter]
    var p = if (version == 1) 8 else 2
    (0 until n).foreach { _ =>
      val id = b.getShort(p) & 0xffff
      val nameLen =
        if (version == 1 || id >= 256) { val v = b.getShort(p + 2) & 0xffff; p += 2; v }
        else 0
      val nValues = b.getShort(p + 4) & 0xffff
      p += 6
      p += (if (version == 1) (nameLen + 7) / 8 * 8 else nameLen)
      val values = (0 until nValues).map(i => b.getInt(p + i * 4))
      p += nValues * 4
      if (version == 1 && nValues % 2 == 1) p += 4
      out += Filter(id, values)
    }
    out.result()
  }

  /** Fill-value message (0x0005): the defined fill datum, if any — chunked
    * datasets elide all-fill chunks, so readers synthesize it. */
  def parseFillValue(body: Array[Byte], t: DType): Option[Double] = t match {
    case nt: NumType =>
      val version = body(0) & 0xff
      val (present, dataOff) = version match {
        case 1 | 2 => ((body(3) & 0xff) == 1 && body.length >= 8, 8)
        case 3 => ((body(1) & 0x20) != 0 && body.length >= 6, 6)
        case _ => (false, 0)
      }
      if (present && body.length >= dataOff + nt.size)
        Some(decode(java.util.Arrays.copyOfRange(body, dataOff, dataOff + nt.size), nt, 1)(0))
      else None
    case _ => None // string/compound fills are not meaningful as a Double
  }

  /** Raw DEFINED fill-value bytes of a dataset (message 0x0005) — the
    * record-typed fill compound tables need ([[parseFillValue]] surfaces
    * only scalar numerics). None when no fill is defined (the format's
    * default fill is then all-zero bytes). */
  def rawFillBytes(src: ByteSource, ohAddr: Long): Option[Array[Byte]] =
    readMessages(src, ohAddr).find(_.typ == 0x0005).flatMap { m =>
      val body = m.body
      val version = body(0) & 0xff
      val (present, sizeOff, dataOff) = version match {
        case 1 | 2 => ((body(3) & 0xff) == 1 && body.length >= 8, 4, 8)
        case 3 => ((body(1) & 0x20) != 0 && body.length >= 6, 2, 6)
        case _ => (false, 0, 0)
      }
      if (!present) None
      else {
        val size = le(body).getInt(sizeOff)
        if (size > 0 && body.length >= dataOff + size)
          Some(java.util.Arrays.copyOfRange(body, dataOff, dataOff + size))
        else None
      }
    }

  /** Attribute message (0x000C), versions 1–3. Returns name → value where
    * value is a String (fixed-length string type), Double (scalar numeric),
    * or Seq[Double]. Variable-length and shared-datatype attributes (global
    * heap machinery) are skipped — none of the CF-convention attributes the
    * ingest needs (`scale_factor`, `add_offset`, `_FillValue`, `units`) are
    * written that way by netcdf-c/h5py. */
  def parseAttribute(body: Array[Byte]): Option[(String, Any)] =
    parseAttribute(body, None)

  def parseAttribute(body: Array[Byte],
      srcOpt: Option[ByteSource]): Option[(String, Any)] = {
    val version = body(0) & 0xff
    val b = le(body)
    if (version < 1 || version > 3) return None
    if (version >= 2 && (body(1) & 0x01) != 0) return None // shared datatype
    val nameSize = b.getShort(2) & 0xffff
    val dtSize = b.getShort(4) & 0xffff
    val dsSize = b.getShort(6) & 0xffff
    val headerLen = if (version == 3) 9 else 8
    def padded(n: Int): Int = if (version == 1) (n + 7) / 8 * 8 else n
    var p = headerLen
    val rawName = new String(body, p, nameSize, "UTF-8")
    val name = rawName.takeWhile(_ != 0)
    p += padded(nameSize)
    val dtBody = java.util.Arrays.copyOfRange(body, p, p + dtSize)
    p += padded(dtSize)
    val dsBody = java.util.Arrays.copyOfRange(body, p, p + dsSize)
    p += padded(dsSize)
    val n = parseDataspace(dsBody).product.toInt // rank 0 → 1 (scalar)
    val cls = dtBody(0) & 0x0f
    val size = le(dtBody).getInt(4)
    cls match {
      case 3 => // fixed-length string
        val s = new String(body, p, n * size, "UTF-8").takeWhile(_ != 0)
        Some(name -> s)
      case 0 | 1 =>
        val t = parseDatatype(dtBody)
        val vals = decode(java.util.Arrays.copyOfRange(body, p, p + n * t.size), t, n)
        Some(name -> (if (n == 1) vals(0) else vals.toSeq))
      case 9 if (dtBody(1) & 0x0f) == 1 && srcOpt.isDefined =>
        // VLEN STRING attribute — h5py's default encoding for str attrs,
        // load-bearing since `_Unsigned = "true"` rides one; resolved
        // through its GCOL exactly like vlen string data
        val vt = parseDatatype(dtBody)
        val ss = decodeStrings(
          java.util.Arrays.copyOfRange(body, p, p + n * 16), vt, n, srcOpt.get)
        Some(name -> (if (n == 1) ss(0) else ss.toSeq))
      case _ => None // vlen seqs / compound / reference — not needed for ingest
    }
  }

  /** All parseable attributes of the object at `ohAddr`. Exotic or
    * malformed attributes are skipped, never fatal — ingest only needs the
    * CF numeric/string ones. */
  def attributes(src: ByteSource, ohAddr: Long): Map[String, Any] = {
    val msgs = readMessages(src, ohAddr)
    val compact = msgs.filter(_.typ == 0x000C)
      .flatMap(m => try parseAttribute(m.body, Some(src))
        catch { case _: Exception => None })
    // dense storage (Attribute Info message, > max_compact attributes):
    // attribute messages live in a fractal heap keyed by a name-hash B-tree
    val dense = msgs.filter(_.typ == 0x0015).flatMap { m =>
      try denseAttributes(src, m.body) catch { case _: Exception => Seq.empty }
    }
    (compact ++ dense).toMap
  }

  private def denseAttributes(src: ByteSource, body: Array[Byte]): Seq[(String, Any)] = {
    val flags = body(1) & 0xff
    val p = 2 + (if ((flags & 1) != 0) 2 else 0) // max creation index (2 bytes)
    val heapAddr = le(body).getLong(p)
    val nameBt = le(body).getLong(p + 8)
    if (heapAddr == Undef || nameBt == Undef) return Seq.empty
    val heap = new FractalHeap(src, heapAddr)
    val bt = readBtreeV2(src, nameBt)
    require(bt.typ == 8, s"attribute name index has record type ${bt.typ}")
    val idLen = bt.recordSize - 9 // heap ID + message flags (1) + order (4) + hash (4)
    bt.records.flatMap { r =>
      // type-8 record message flags use object-header message flag
      // semantics: bit 0 = constant (fine to read), bit 1 = shared (the
      // heap ID then points into the SOHM heap, not the attribute heap)
      if ((r(idLen) & 0x02) != 0) None // shared message — skip
      else try parseAttribute(heap.obj(java.util.Arrays.copyOf(r, idLen)), Some(src))
      catch { case _: Exception => None }
    }
  }

  // ── groups ───────────────────────────────────────────────────────────────

  /** Child links (name → object header address) of the group at `ohAddr`. */
  def groupLinks(src: ByteSource, ohAddr: Long): Seq[(String, Long)] = {
    val msgs = readMessages(src, ohAddr)
    msgs.find(_.typ == 0x0011) match {
      case Some(st) =>
        val b = le(st.body)
        symbolTableLinks(src, b.getLong(0), b.getLong(8))
      case None =>
        val dense = msgs.find(_.typ == 0x0002).toSeq.flatMap { li =>
          // Link Info: version, flags, [max creation index], fractal heap
          // address, name-index v2 B-tree address — dense storage iff the
          // heap address is defined (any group with > max_compact links)
          val flags = li.body(1) & 0xff
          val p = 2 + (if ((flags & 1) != 0) 8 else 0)
          val heapAddr = le(li.body).getLong(p)
          val nameBt = le(li.body).getLong(p + 8)
          if (heapAddr == Undef) Seq.empty
          else {
            require(nameBt != Undef, "dense group without a name index")
            val heap = new FractalHeap(src, heapAddr)
            val bt = readBtreeV2(src, nameBt)
            require(bt.typ == 5, s"group name index has record type ${bt.typ}")
            // type-5 record: name hash (4) + fractal heap ID of the link msg
            bt.records.flatMap(r =>
              parseLink(heap.obj(java.util.Arrays.copyOfRange(r, 4, bt.recordSize))))
          }
        }
        dense ++ msgs.filter(_.typ == 0x0006).flatMap(m => parseLink(m.body))
    }
  }

  private def parseLink(body: Array[Byte]): Option[(String, Long)] = {
    val flags = body(1) & 0xff
    var p = 2
    val linkType = if ((flags & 0x08) != 0) { val t = body(p) & 0xff; p += 1; t } else 0
    if ((flags & 0x04) != 0) p += 8 // creation order
    if ((flags & 0x10) != 0) p += 1 // charset
    val lenWidth = 1 << (flags & 0x3)
    val lenBytes = java.util.Arrays.copyOfRange(body, p, p + lenWidth)
    val nameLen = le(java.util.Arrays.copyOf(lenBytes, 8)).getLong(0).toInt
    p += lenWidth
    val name = new String(body, p, nameLen, "UTF-8")
    p += nameLen
    if (linkType == 0) Some(name -> le(body).getLong(p)) else None // hard links only
  }

  private def symbolTableLinks(src: ByteSource, btreeAddr: Long,
      heapAddr: Long): Seq[(String, Long)] = {
    val hh = src.read(heapAddr, 32)
    require(hh.take(4).sameElements("HEAP".getBytes), s"bad local heap at $heapAddr")
    val segSize = le(hh).getLong(8)
    val heapData = le(hh).getLong(24)
    val seg = src.read(heapData, segSize.toInt) // names live in one small segment
    def name(off: Long): String = {
      var end = off.toInt
      while (end < seg.length && seg(end) != 0) end += 1
      new String(seg, off.toInt, end - off.toInt, "UTF-8")
    }
    def walk(addr: Long): Seq[Long] = { // → SNOD addresses, left to right
      val h = src.read(addr, 24)
      require(h.take(4).sameElements("TREE".getBytes), s"bad B-tree node at $addr")
      val level = h(5) & 0xff
      val used = le(h).getShort(6) & 0xffff
      // group keys are heap offsets (8 bytes); children interleave keys
      val body = le(src.read(addr + 24, (2 * used + 1) * 8))
      val children = (0 until used).map(i => body.getLong(8 + i * 16))
      if (level == 0) children else children.flatMap(walk)
    }
    walk(btreeAddr).flatMap { snodAddr =>
      val sh = src.read(snodAddr, 8)
      require(sh.take(4).sameElements("SNOD".getBytes), s"bad SNOD at $snodAddr")
      val n = le(sh).getShort(6) & 0xffff
      val entries = le(src.read(snodAddr + 8, n * 40))
      (0 until n).map { i =>
        name(entries.getLong(i * 40)) -> entries.getLong(i * 40 + 8)
      }
    }
  }

  // ── fractal heaps + v2 B-trees (dense groups/attributes, chunk index 5) ──

  /** Minimum little-endian bytes needed to represent `n` (≥ 1 byte) — the
    * HDF5 "limit encode size" used to size v2-B-tree pointer fields and
    * fractal-heap ID length fields. */
  private def encSize(n: Long): Int =
    (63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))) / 8 + 1

  private def leVar(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = len - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  final case class BtreeV2(typ: Int, recordSize: Int, records: Seq[Array[Byte]])

  /** Walk a v2 B-tree ("BTHD" header, "BTIN" internal / "BTLF" leaf nodes)
    * and return every record left-to-right. Handles any depth; per-depth
    * pointer-field widths follow the header geometry the library derives
    * (node size, record size → max records per node → encoded sizes). */
  def readBtreeV2(src: ByteSource, addr: Long): BtreeV2 = {
    val hdr = src.read(addr, 38)
    require(hdr.take(4).sameElements("BTHD".getBytes), s"bad v2 B-tree header at $addr")
    val b = le(hdr)
    val typ = hdr(5) & 0xff
    val nodeSize = b.getInt(6)
    val recordSize = b.getShort(10) & 0xffff
    val depth = b.getShort(12) & 0xffff
    val rootAddr = b.getLong(16)
    val nRecRoot = b.getShort(24) & 0xffff
    if (rootAddr == Undef) return BtreeV2(typ, recordSize, Seq.empty)
    // geometry: leaf holds the most records (no pointers), so the per-node
    // record-count field is sized for it; cumulative subtree maxima size the
    // total-count fields present when the child is itself internal
    val leafMax = (nodeSize - 10) / recordSize
    val maxNrecSize = encSize(leafMax.toLong)
    val cumSize = new Array[Int](depth + 1)
    var cumMax = leafMax.toLong
    (1 to depth).foreach { u =>
      val ptr = 8 + maxNrecSize + (if (u > 1) cumSize(u - 1) else 0)
      val intMax = (nodeSize - (10 + ptr)) / (recordSize + ptr)
      cumMax = (intMax + 1).toLong * cumMax + intMax
      cumSize(u) = encSize(cumMax)
    }
    def node(at: Long, nrec: Int, d: Int): Seq[Array[Byte]] =
      if (d == 0) {
        val body = src.read(at, 6 + nrec * recordSize)
        require(body.take(4).sameElements("BTLF".getBytes), s"bad v2 B-tree leaf at $at")
        (0 until nrec).map(i =>
          java.util.Arrays.copyOfRange(body, 6 + i * recordSize, 6 + (i + 1) * recordSize))
      } else {
        val ptrSize = 8 + maxNrecSize + (if (d > 1) cumSize(d - 1) else 0)
        val body = src.read(at, 6 + nrec * recordSize + (nrec + 1) * ptrSize)
        require(body.take(4).sameElements("BTIN".getBytes), s"bad v2 B-tree node at $at")
        val ptrBase = 6 + nrec * recordSize
        def child(i: Int): Seq[Array[Byte]] = {
          val p = ptrBase + i * ptrSize
          node(le(body).getLong(p), leVar(body, p + 8, maxNrecSize).toInt, d - 1)
        }
        (0 until nrec).flatMap(i => child(i) :+
          java.util.Arrays.copyOfRange(body, 6 + i * recordSize, 6 + (i + 1) * recordSize)) ++
          child(nrec)
      }
    BtreeV2(typ, recordSize, node(rootAddr, nRecRoot, depth))
  }

  /** A fractal heap ("FRHP") holding managed objects — how dense group
    * links and dense attributes are stored. Resolves managed heap IDs via
    * the doubling-table geometry: rows 0 and 1 hold `width` blocks of the
    * starting block size, every later row doubles the block size. Huge/tiny
    * heap IDs and indirect sub-blocks (multi-GB heaps) are rejected with a
    * clear error — link/attribute heaps never reach them. */
  final class FractalHeap(src: ByteSource, addr: Long) {
    private val hdr = src.read(addr, 146)
    require(hdr.take(4).sameElements("FRHP".getBytes), s"bad fractal heap at $addr")
    private val b = le(hdr)
    val heapIdLen: Int = b.getShort(5) & 0xffff
    private val ioFilterLen = b.getShort(7) & 0xffff
    private val width = b.getShort(110) & 0xffff
    private val startBlockSize = b.getLong(112)
    private val maxDirectSize = b.getLong(120)
    private val maxHeapBits = b.getShort(128) & 0xffff
    private val rootBlockAddr = b.getLong(132)
    private val curRowsRoot = b.getShort(140) & 0xffff
    private val offSize = (maxHeapBits + 7) / 8
    private val lenSize = heapIdLen - 1 - offSize
    require(lenSize > 0, s"inconsistent fractal heap ID length $heapIdLen")
    private def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    private val maxDirectRows = log2(maxDirectSize) - log2(startBlockSize) + 2
    // root indirect block entries (direct-block addresses, row-major),
    // loaded lazily — a root that IS a direct block never reads them
    private lazy val rootEntries: ByteBuffer = {
      require(ioFilterLen == 0, "filtered fractal-heap blocks not supported")
      val head = src.read(rootBlockAddr, 4)
      require(head.sameElements("FHIB".getBytes), s"bad heap indirect block at $rootBlockAddr")
      val nDirect = math.min(curRowsRoot, maxDirectRows) * width
      le(src.read(rootBlockAddr + 13 + offSize, nDirect * 8))
    }

    /** Bytes of the managed object `id` points at. */
    def obj(id: Array[Byte]): Array[Byte] = {
      require((id(0) & 0xf0) == 0,
        s"unsupported fractal heap ID type/version ${id(0) & 0xff} (only managed v0)")
      val heapOff = leVar(id, 1, offSize)
      val objLen = leVar(id, 1 + offSize, lenSize).toInt
      src.read(fileAddr(heapOff), objLen)
    }

    private def fileAddr(heapOff: Long): Long =
      if (curRowsRoot == 0) rootBlockAddr + heapOff // root is the one direct block
      else {
        val rowSpan = width * startBlockSize // rows 0 and 1 each span this
        val row =
          if (heapOff < rowSpan) 0
          else log2(heapOff / rowSpan) + 1
        require(row < maxDirectRows,
          s"fractal heap offset $heapOff lands in an indirect sub-block — not supported")
        require(row < curRowsRoot, s"fractal heap offset $heapOff beyond allocated rows")
        val rowStart = if (row == 0) 0L else rowSpan << (row - 1)
        val blockSize = if (row == 0) startBlockSize else startBlockSize << (row - 1)
        val col = ((heapOff - rowStart) / blockSize).toInt
        val blockAddr = rootEntries.getLong((row * width + col) * 8)
        require(blockAddr != Undef, s"fractal heap offset $heapOff in unallocated block")
        blockAddr + (heapOff - (rowStart + col.toLong * blockSize))
      }
  }

  /** Recursively list all datasets under the root group as
    * path → object header address ("/"-joined for nested groups). */
  def listDatasets(src: ByteSource, rootOh: Long): Seq[(String, Long)] = {
    def visit(prefix: String, oh: Long): Seq[(String, Long)] =
      groupLinks(src, oh).flatMap { case (nm, child) =>
        val msgs = readMessages(src, child)
        val path = if (prefix.isEmpty) nm else s"$prefix/$nm"
        if (msgs.exists(_.typ == 0x0008)) Seq(path -> child)
        else if (msgs.exists(m => m.typ == 0x0011 || m.typ == 0x0002 || m.typ == 0x0006))
          visit(path, child)
        else Seq.empty
      }
    visit("", rootOh)
  }

  def readDataset(src: ByteSource, name: String, ohAddr: Long): Dataset = {
    val msgs = readMessages(src, ohAddr)
    def one(typ: Int, what: String): Array[Byte] =
      msgs.find(_.typ == typ).getOrElse(
        throw new IllegalArgumentException(s"$name: no $what message")).body
    val dtype = parseDatatype(one(0x0003, "datatype"))
    Dataset(name,
      parseDataspace(one(0x0001, "dataspace")),
      dtype,
      parseLayout(src, one(0x0008, "layout")),
      msgs.find(_.typ == 0x000B).map(m => parseFilters(m.body)).getOrElse(Seq.empty),
      msgs.find(_.typ == 0x0005).flatMap(m => parseFillValue(m.body, dtype)))
  }

  // ── chunk index ──────────────────────────────────────────────────────────

  /** List every stored chunk of a chunked dataset, whatever the index. */
  def listChunks(src: ByteSource, ds: Dataset): Seq[ChunkRef] = {
    val layout = ds.layout.asInstanceOf[Chunked]
    layout.index match {
      case BTreeV1 => btreeV1Chunks(src, layout)
      case SingleChunk(filteredSize, mask) =>
        val raw = layout.chunkDims.map(_.toLong).product * ds.dtype.size
        if (layout.indexAddr == Undef) Seq.empty // never allocated → all fill
        else Seq(ChunkRef(layout.chunkDims.map(_ => 0L), layout.indexAddr,
          filteredSize.getOrElse(raw).toInt, mask))
      case ImplicitIndex =>
        // early-allocated raw chunks, consecutive in row-major grid order
        val chunkBytes = layout.chunkDims.map(_.toLong).product * ds.dtype.size
        gridOrigins(ds.dims, layout.chunkDims).zipWithIndex.map { case (org, i) =>
          ChunkRef(org, layout.indexAddr + i * chunkBytes, chunkBytes.toInt, 0)
        }
      case FixedArray(_) => fixedArrayChunks(src, ds, layout)
      case ExtensibleArray => extensibleArrayChunks(src, ds, layout)
      case BTreeV2Index => btreeV2Chunks(src, ds, layout)
    }
  }

  /** Read a v2 B-tree chunk index: record type 10 (unfiltered — address +
    * per-dimension scaled offsets) or 11 (filtered — address + stored size
    * + filter mask + scaled offsets). Scaled offsets are chunk-grid
    * coordinates; multiply by the chunk shape to recover element offsets. */
  private def btreeV2Chunks(src: ByteSource, ds: Dataset, layout: Chunked): Seq[ChunkRef] = {
    if (layout.indexAddr == Undef) return Seq.empty
    val bt = readBtreeV2(src, layout.indexAddr)
    val rank = layout.chunkDims.length
    val rawChunkBytes = layout.chunkDims.map(_.toLong).product * ds.dtype.size
    bt.records.map { r =>
      val b = le(r)
      val addr = b.getLong(0)
      bt.typ match {
        case 10 =>
          val off = (0 until rank).map(d => b.getLong(8 + d * 8) * layout.chunkDims(d))
          ChunkRef(off, addr, rawChunkBytes.toInt, 0)
        case 11 =>
          val szLen = bt.recordSize - 12 - rank * 8
          val sz = leVar(r, 8, szLen)
          val mask = b.getInt(8 + szLen)
          val off = (0 until rank).map(d => b.getLong(12 + szLen + d * 8) * layout.chunkDims(d))
          ChunkRef(off, addr, sz.toInt, mask)
        case t => throw new IllegalArgumentException(
          s"v2 B-tree record type $t is not a chunk index")
      }
    }
  }

  /** Chunk-grid origins (element offsets) in row-major linear order — the
    * order Fixed Array / Implicit indexes number chunks in. */
  private def gridOrigins(dims: Seq[Long], cd: Seq[Int]): Seq[Seq[Long]] = {
    def loop(d: Int): Seq[Seq[Long]] =
      if (d == cd.length) Seq(Seq.empty)
      else (0L until dims(d) by cd(d).toLong).flatMap(o => loop(d + 1).map(o +: _))
    loop(0)
  }

  /** Walk the v1 chunk B-tree and list every stored chunk. */
  private def btreeV1Chunks(src: ByteSource, layout: Chunked): Seq[ChunkRef] = {
    val rank1 = layout.chunkDims.length + 1 // + element-size pseudo-dim
    val keySize = 8 + rank1 * 8
    def walk(addr: Long): Seq[ChunkRef] = {
      val h = src.read(addr, 24)
      require(h.take(4).sameElements("TREE".getBytes), s"bad chunk B-tree node at $addr")
      require((h(4) & 0xff) == 1, "not a chunk B-tree")
      val level = h(5) & 0xff
      val used = le(h).getShort(6) & 0xffff
      val body = le(src.read(addr + 24, used * (keySize + 8) + keySize))
      (0 until used).flatMap { i =>
        val k = i * (keySize + 8)
        val size = body.getInt(k)
        val mask = body.getInt(k + 4)
        val offsets = (0 until rank1 - 1).map(j => body.getLong(k + 8 + j * 8))
        val child = body.getLong(k + keySize)
        if (level == 0) Seq(ChunkRef(offsets, child, size, mask))
        else walk(child)
      }
    }
    walk(layout.indexAddr)
  }

  /** Read a Fixed Array chunk index ("FAHD" header + "FADB" data block,
    * paged or not). Client 0 elements are bare chunk addresses (unfiltered
    * datasets); client 1 adds the stored chunk size + filter mask.
    * Unallocated chunks (address UNDEF) are skipped — readers fill them. */
  private def fixedArrayChunks(src: ByteSource, ds: Dataset, layout: Chunked): Seq[ChunkRef] = {
    if (layout.indexAddr == Undef) return Seq.empty
    val hdr = src.read(layout.indexAddr, 28)
    require(hdr.take(4).sameElements("FAHD".getBytes),
      s"bad Fixed Array header at ${layout.indexAddr}")
    val client = hdr(5) & 0xff
    val entrySize = hdr(6) & 0xff
    val pageBits = hdr(7) & 0xff
    val hb = le(hdr)
    val maxEntries = hb.getLong(8)
    val dblkAddr = hb.getLong(16)
    if (dblkAddr == Undef) return Seq.empty
    val rawChunkBytes = layout.chunkDims.map(_.toLong).product * ds.dtype.size

    val pageElems = 1L << pageBits
    val paged = maxEntries > pageElems
    val nPages = if (paged) ((maxEntries + pageElems - 1) / pageElems).toInt else 0
    // FADB prelude: sig(4) version(1) client(1) header-addr(8)
    val preludeLen = 14
    val head = src.read(dblkAddr, preludeLen)
    require(head.take(4).sameElements("FADB".getBytes), s"bad Fixed Array data block at $dblkAddr")
    require((head(5) & 0xff) == client, "FADB client id mismatch")

    val elemBytes: Array[Byte] =
      if (!paged)
        src.read(dblkAddr + preludeLen, (maxEntries * entrySize).toInt)
      else {
        // bitmap + checksum, then pages each followed by a 4-byte checksum
        val bitmapLen = (nPages + 7) / 8
        var off = dblkAddr + preludeLen + bitmapLen + 4
        val out = new java.io.ByteArrayOutputStream((maxEntries * entrySize).toInt)
        var remaining = maxEntries
        while (remaining > 0) {
          val inPage = math.min(pageElems, remaining)
          out.write(src.read(off, (inPage * entrySize).toInt))
          off += inPage * entrySize + 4
          remaining -= inPage
        }
        out.toByteArray
      }
    val eb = le(elemBytes)
    val origins = gridOrigins(ds.dims, layout.chunkDims)
    require(origins.length <= maxEntries,
      s"Fixed Array smaller than chunk grid: $maxEntries < ${origins.length}")
    origins.zipWithIndex.flatMap { case (org, i) =>
      val p = i * entrySize
      val addr = eb.getLong(p)
      if (addr == Undef) None
      else if (client == 0) Some(ChunkRef(org, addr, rawChunkBytes.toInt, 0))
      else {
        // client 1: address(8) + stored size(entrySize-12) + filter mask(4)
        val szLen = entrySize - 12
        val szRaw = java.util.Arrays.copyOfRange(elemBytes, p + 8, p + 8 + szLen)
        val sz = le(java.util.Arrays.copyOf(szRaw, 8)).getLong(0)
        val mask = eb.getInt(p + 8 + szLen)
        Some(ChunkRef(org, addr, sz.toInt, mask))
      }
    }
  }

  /** Walk an Extensible Array chunk index — the `libver='latest'` index for
    * a single unlimited dimension (typically time).
    *
    * Structure (HDF5 spec III.A.2, mirrored by the public H5EA sources):
    * the "EAHD" header carries the creation parameters and the index-block
    * address; the "EAIB" index block stores the first `idxBlkElmts` elements
    * inline, then direct data-block addresses for the first
    * `2·log2(supBlkMinDataPtrs)` super blocks, then super-block addresses;
    * "EASB" super blocks hold further data-block addresses; "EADB" data
    * blocks hold the elements. Super block `u` has `2^(u/2)` data blocks of
    * `2^((u+1)/2)·dataBlkMinElmts` elements each — the doubling that makes
    * appends O(1) amortized. Elements are chunk addresses (client 0) or
    * address+size+mask triples (client 1, filtered).
    *
    * Data blocks above `2^maxDblkPageNelmtsBits` elements (reached past
    * ~131 k chunks at the library defaults — realistic for 100 TB archives)
    * are PAGED: the block keeps only its prefix and the elements live in
    * fixed-size pages, each with a trailing checksum. Handled. */
  private def extensibleArrayChunks(src: ByteSource, ds: Dataset, layout: Chunked): Seq[ChunkRef] = {
    if (layout.indexAddr == Undef) return Seq.empty
    val hdr = src.read(layout.indexAddr, 72)
    require(hdr.take(4).sameElements("EAHD".getBytes),
      s"bad Extensible Array header at ${layout.indexAddr}")
    val client = hdr(5) & 0xff
    val elemSize = hdr(6) & 0xff
    val maxBits = hdr(7) & 0xff
    val idxBlkElmts = hdr(8) & 0xff
    val minElmts = hdr(9) & 0xff
    val supMinPtrs = hdr(10) & 0xff
    val pageBits = hdr(11) & 0xff
    val iblkAddr = le(hdr).getLong(60)
    if (iblkAddr == Undef) return Seq.empty
    val arrOffSize = (maxBits + 7) / 8
    val rawChunkBytes = layout.chunkDims.map(_.toLong).product * ds.dtype.size

    def log2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)
    // super-block geometry (H5EA__hdr_init)
    val nsblks = 1 + (maxBits - log2(minElmts))
    val ndblksOf = (u: Int) => 1 << (u / 2)
    val dblkNelmtsOf = (u: Int) => (1 << ((u + 1) / 2)) * minElmts
    val startIdx = new Array[Long](nsblks); val startDblk = new Array[Long](nsblks)
    var si = 0L; var sd = 0L
    (0 until nsblks).foreach { u =>
      startIdx(u) = si; startDblk(u) = sd
      si += ndblksOf(u).toLong * dblkNelmtsOf(u); sd += ndblksOf(u)
    }
    // index-block geometry (H5EA__iblock_alloc)
    val nsblksIb = 2 * log2(supMinPtrs)
    val ndblkAddrsIb = (0 until nsblksIb).map(ndblksOf).sum
    val nsblkAddrs = nsblks - nsblksIb

    // index block: prelude(14) + inline elements + dblk addrs + sblk addrs
    val ibBody = le(src.read(iblkAddr + 14,
      idxBlkElmts * elemSize + (ndblkAddrsIb + nsblkAddrs) * 8))
    require(src.read(iblkAddr, 4).sameElements("EAIB".getBytes),
      s"bad Extensible Array index block at $iblkAddr")

    def decodeElem(b: ByteBuffer, p: Int, origin: Seq[Long]): Option[ChunkRef] = {
      val addr = b.getLong(p)
      if (addr == Undef) None
      else if (client == 0) Some(ChunkRef(origin, addr, rawChunkBytes.toInt, 0))
      else {
        val szLen = elemSize - 12
        val szRaw = new Array[Byte](8)
        (0 until szLen).foreach(i => szRaw(i) = b.get(p + 8 + i))
        val sz = le(szRaw).getLong(0)
        Some(ChunkRef(origin, addr, sz.toInt, b.getInt(p + 8 + szLen)))
      }
    }

    // cache data-block element buffers and super-block address buffers
    val dblkCache = scala.collection.mutable.HashMap.empty[Long, ByteBuffer]
    def dblkElems(addr: Long, nelmts: Int): ByteBuffer =
      dblkCache.getOrElseUpdate(addr, {
        require(src.read(addr, 4).sameElements("EADB".getBytes),
          s"bad Extensible Array data block at $addr")
        val pageElems = 1 << pageBits
        if (nelmts <= pageElems)
          le(src.read(addr + 14 + arrOffSize, nelmts * elemSize))
        else {
          // paged data block (> 2^pageBits elements): the block stores only
          // its prefix + checksum; pages of `pageElems` elements follow,
          // each with its own trailing checksum. Element counts are powers
          // of two × minElmts, so every page is full.
          val out = new java.io.ByteArrayOutputStream(nelmts * elemSize)
          var off = addr + 14 + arrOffSize + 4
          var remaining = nelmts
          while (remaining > 0) {
            out.write(src.read(off, pageElems * elemSize))
            off += pageElems * elemSize + 4
            remaining -= pageElems
          }
          le(out.toByteArray)
        }
      })
    val sblkCache = scala.collection.mutable.HashMap.empty[Long, ByteBuffer]
    def sblkAddrsOf(addr: Long, u: Int): ByteBuffer =
      sblkCache.getOrElseUpdate(addr, {
        require(src.read(addr, 4).sameElements("EASB".getBytes),
          s"bad Extensible Array super block at $addr")
        le(src.read(addr + 14 + arrOffSize, ndblksOf(u) * 8))
      })

    val origins = gridOrigins(ds.dims, layout.chunkDims)
    origins.zipWithIndex.flatMap { case (org, k) =>
      if (k < idxBlkElmts) decodeElem(ibBody, k * elemSize, org)
      else {
        val k1 = (k - idxBlkElmts).toLong
        val u = 63 - java.lang.Long.numberOfLeadingZeros(k1 / minElmts + 1)
        val dn = dblkNelmtsOf(u)
        val within = k1 - startIdx(u)
        val dblkIdx = (within / dn).toInt
        val elemIdx = (within % dn).toInt
        val dblkAddr =
          if (u < nsblksIb)
            ibBody.getLong(idxBlkElmts * elemSize + (startDblk(u) + dblkIdx).toInt * 8)
          else {
            val sAddr = ibBody.getLong(
              idxBlkElmts * elemSize + ndblkAddrsIb * 8 + (u - nsblksIb) * 8)
            if (sAddr == Undef) Undef else sblkAddrsOf(sAddr, u).getLong(dblkIdx * 8)
          }
        if (dblkAddr == Undef) None
        else decodeElem(dblkElems(dblkAddr, dn), elemIdx * elemSize, org)
      }
    }
  }

  // ── filters + decode ─────────────────────────────────────────────────────

  /** Reverse the filter pipeline on one raw chunk.
    *
    * @param expectedBytes the decoded chunk's byte size (cells × element
    *                      size) — required by headerless codecs (szip),
    *                      ignored by self-terminating ones. */
  def defilter(raw: Array[Byte], filters: Seq[Filter], filterMask: Int,
      expectedBytes: Int = -1): Array[Byte] = {
    var data = raw
    filters.zipWithIndex.reverse.foreach { case (f, i) =>
      if ((filterMask & (1 << i)) == 0) f.id match {
        case 1 => // deflate
          val inf = new Inflater()
          inf.setInput(data)
          val out = new java.io.ByteArrayOutputStream(data.length * 4)
          val buf = new Array[Byte](65536)
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate chunk")
            out.write(buf, 0, n)
          }
          inf.end()
          data = out.toByteArray
        case 2 => // shuffle: byte-plane transpose, element size in client[0]
          val es = f.clientValues.head
          if (es > 1 && data.length % es == 0) {
            val n = data.length / es
            val out = new Array[Byte](data.length)
            var b = 0
            while (b < es) {
              var i = 0
              while (i < n) { out(i * es + b) = data(b * n + i); i += 1 }
              b += 1
            }
            data = out
          }
        case 3 => // fletcher32: 4-byte checksum trailer (not verified)
          data = java.util.Arrays.copyOf(data, data.length - 4)
        case 32015 => // registered zstd plugin: the chunk is one zstd frame
          val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
            new java.io.ByteArrayInputStream(data))
          val out = new java.io.ByteArrayOutputStream(data.length * 4)
          val buf = new Array[Byte](65536)
          var nr = in.read(buf)
          while (nr >= 0) { out.write(buf, 0, nr); nr = in.read(buf) }
          in.close()
          data = out.toByteArray
        case 32004 => // registered lz4 plugin: BE total size + block size,
          // then per block a BE compressed length and the block bytes
          // (stored raw when compression did not shrink the block).
          // Header fields are UNTRUSTED file bytes: a non-positive block
          // size would stall the loop forever and an over-2-GiB total
          // would silently truncate — both are rejected up front, and
          // each block's declared length is bounds-checked.
          require(data.length >= 12,
            s"lz4 chunk header truncated (${data.length} bytes, need 12)")
          val bb = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
          val total = bb.getLong(0)
          val blockSize = bb.getInt(8)
          require(total > 0 && total <= Int.MaxValue,
            s"lz4 chunk declares invalid decompressed size $total")
          require(blockSize > 0,
            s"lz4 chunk declares invalid block size $blockSize")
          val out = new Array[Byte](total.toInt)
          val dec = net.jpountz.lz4.LZ4Factory.fastestJavaInstance().fastDecompressor()
          var p = 12; var o = 0
          while (o < total) {
            val origLen = math.min(blockSize.toLong, total - o).toInt
            require(p + 4 <= data.length,
              s"lz4 block header at $p overruns chunk of ${data.length} bytes")
            val compLen = bb.getInt(p); p += 4
            require(compLen > 0 && p + compLen <= data.length,
              s"lz4 block at $p declares $compLen bytes, chunk has ${data.length}")
            if (compLen == origLen) System.arraycopy(data, p, out, o, origLen)
            else dec.decompress(data, p, out, o, origLen)
            p += compLen; o += origLen
          }
          data = out
        case 4 => // szip: H5Z__filter_szip prefixes every compressed chunk
          // with the uncompressed byte count (UINT32ENCODE, little-endian);
          // the Rice stream after it is headerless (CCSDS 121.0-B)
          require(data.length >= 4,
            s"szip chunk of ${data.length} bytes lacks the 4-byte stored-size header")
          val stored = (data(0) & 0xff) | ((data(1) & 0xff) << 8) |
            ((data(2) & 0xff) << 16) | ((data(3) & 0xff) << 24)
          require(stored > 0 && (expectedBytes <= 0 || stored == expectedBytes),
            s"szip stored uncompressed size $stored != chunk geometry size " +
              s"$expectedBytes — refusing to guess (corrupt or unsupported layout)")
          // geometry absent → the untrusted header alone sizes the decode;
          // cap it so a corrupt field cannot drive a multi-GiB allocation
          // (HDF5 chunks are MBs; the lz4 branch bounds-checks likewise)
          require(expectedBytes > 0 || stored <= (1 << 28),
            s"szip stored uncompressed size $stored with no chunk geometry " +
              "to validate against exceeds the 256 MiB plausibility cap")
          data = Szip.decompress(
            java.util.Arrays.copyOfRange(data, 4, data.length), f.clientValues, stored)
        case id => throw new IllegalArgumentException(
          s"unsupported HDF5 filter id $id (deflate/shuffle/fletcher32/szip/zstd/lz4 only)")
      }
    }
    data
  }

  def decode(data: Array[Byte], dt: DType, n: Int): Array[Double] = {
    val t = dt match {
      case nt: NumType => nt
      case et: EnumType => et.base // enum cells ARE their base integers
      case o => throw new IllegalArgumentException(
        s"non-numeric dataset ($o) — use decodeStrings/decodeCompound")
    }
    val buf = ByteBuffer.wrap(data)
      .order(if (t.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = (t.kind, t.size) match {
        case ("float", 8) => buf.getDouble(i * 8)
        case ("float", 4) => buf.getFloat(i * 4).toDouble
        case ("int", 1) => buf.get(i).toDouble
        case ("int", 2) => buf.getShort(i * 2).toDouble
        case ("int", 4) => buf.getInt(i * 4).toDouble
        case ("int", 8) => buf.getLong(i * 8).toDouble
        case ("uint", 1) => (buf.get(i) & 0xff).toDouble
        case ("uint", 2) => (buf.getShort(i * 2) & 0xffff).toDouble
        case ("uint", 4) => (buf.getInt(i * 4) & 0xffffffffL).toDouble
        case ("uint", 8) =>
          val l = buf.getLong(i * 8)
          if (l >= 0) l.toDouble else l.toDouble + 1.8446744073709552E19
        case (k, s) => throw new IllegalArgumentException(s"unsupported type $k$s")
      }
      i += 1
    }
    out
  }

  // ── global heap + typed decode ───────────────────────────────────────────

  /** Objects of the global heap collection at `addr` ("GCOL"): object
    * index → bytes. Vlen data and region references store through these. */
  def globalHeapCollection(src: ByteSource, addr: Long): Map[Int, Array[Byte]] = {
    val head = src.read(addr, 16)
    require(head.take(4).sameElements("GCOL".getBytes), s"no GCOL signature at $addr")
    val size = le(head).getLong(8)
    val block = src.read(addr, size.toInt)
    val b = le(block)
    val out = Map.newBuilder[Int, Array[Byte]]
    var p = 16
    var done = false
    while (!done && p + 16 <= size) {
      val idx = b.getShort(p) & 0xffff
      val objSize = b.getLong(p + 8)
      if (idx == 0) done = true // free-space object terminates the walk
      else {
        out += idx -> java.util.Arrays.copyOfRange(block, p + 16, p + 16 + objSize.toInt)
        p += 16 + ((objSize + 7) / 8 * 8).toInt
      }
    }
    out.result()
  }

  /** Decode `n` string elements — fixed-length cells trimmed at NUL, or
    * vlen elements resolved through their global heap collections (one
    * positioned read per distinct collection, cached). */
  def decodeStrings(data: Array[Byte], dt: DType, n: Int, src: ByteSource): Array[String] =
    dt match {
      case StrType(size, _) =>
        Array.tabulate(n) { i =>
          var len = 0
          while (len < size && data(i * size + len) != 0) len += 1
          new String(data, i * size, len, "UTF-8")
        }
      case VlenStrType(_) =>
        vlenElements(data, n, src).map {
          case (len, Some(bytes)) =>
            new String(bytes, 0, math.min(len, bytes.length), "UTF-8")
          case _ => ""
        }
      case o => throw new IllegalArgumentException(s"not a string datatype: $o")
    }

  /** Walk `n` 16-byte vlen descriptors (length, GCOL address, object
    * index) to (declared length, heap object bytes) — `None` for a
    * null/empty element. ONE positioned read per distinct collection; a
    * descriptor naming a missing object fails with both ids. Shared by
    * the vlen string / numeric-sequence / string-sequence decoders. */
  private def vlenElements(data: Array[Byte], n: Int,
      src: ByteSource): Array[(Int, Option[Array[Byte]])] = {
    val cache = scala.collection.mutable.Map.empty[Long, Map[Int, Array[Byte]]]
    val b = le(data)
    Array.tabulate(n) { i =>
      val len = b.getInt(i * 16)
      val addr = b.getLong(i * 16 + 4)
      val idx = b.getInt(i * 16 + 12)
      if (addr == Undef || addr == 0L || len == 0) (0, None)
      else {
        val col = cache.getOrElseUpdate(addr, globalHeapCollection(src, addr))
        (len, Some(col.getOrElse(idx, throw new IllegalArgumentException(
          s"vlen element points at missing global heap object $idx@$addr"))))
      }
    }
  }

  /** Decode `n` vlen-sequence elements into ragged double arrays (the heap
    * object of element i holds its `length` packed base-type values). */
  def decodeVlenSeqs(data: Array[Byte], dt: DType, n: Int,
      src: ByteSource): Array[Array[Double]] = {
    val base = dt match {
      case VlenSeqType(b: NumType) => b
      case VlenSeqType(o) => throw new IllegalArgumentException(
        s"vlen sequence base $o is not numeric — string bases decode via " +
          "decodeVlenStrSeqs")
      case o => throw new IllegalArgumentException(s"not a vlen sequence datatype: $o")
    }
    vlenElements(data, n, src).map {
      case (len, Some(obj)) => decode(obj, base, len)
      case _ => Array.emptyDoubleArray
    }
  }

  /** Decode `n` vlen-sequence elements whose BASE is a string type into
    * ragged string lists (h5py's list-of-tags shapes): a fixed-string base
    * packs `length` size-byte cells in the heap object (NUL-trimmed); a
    * vlen-string base packs `length` 16-byte vlen descriptors that resolve
    * through their own collections (nested indirection). */
  def decodeVlenStrSeqs(data: Array[Byte], dt: DType, n: Int,
      src: ByteSource): Array[Seq[String]] = {
    val base = dt match {
      case VlenSeqType(b @ (_: StrType | _: VlenStrType)) => b
      case o => throw new IllegalArgumentException(
        s"not a string-base vlen sequence datatype: $o")
    }
    vlenElements(data, n, src).map {
      case (len, Some(obj)) =>
        require(obj.length >= len.toLong * base.size,
          s"vlen string sequence of $len × ${base.size}-byte cells overruns " +
            s"its ${obj.length}-byte heap object")
        decodeStrings(obj, base, len, src).toSeq
      case _ => Seq.empty[String]
    }
  }

  /** Decode `n` vlen-sequence elements whose BASE is a COMPOUND type into
    * ragged record lists (ragged tables-of-records, e.g. per-station event
    * logs): heap object i holds `length` packed base records; each record
    * surfaces as a Seq of member values in declaration order. */
  def decodeVlenCompoundSeqs(data: Array[Byte], dt: DType, n: Int,
      src: ByteSource): Array[Seq[Seq[Any]]] = {
    val base = dt match {
      case VlenSeqType(c: CompoundType) => c
      case o => throw new IllegalArgumentException(
        s"not a compound-base vlen sequence datatype: $o")
    }
    vlenElements(data, n, src).map {
      case (len, Some(obj)) =>
        require(obj.length >= len.toLong * base.size,
          s"vlen compound sequence of $len × ${base.size}-byte records " +
            s"overruns its ${obj.length}-byte heap object")
        val cols = decodeCompound(obj, base, len, src).map(_._2)
        (0 until len).map(i => cols.map {
          case ds: Array[Double] => ds(i)
          case ss: Array[String] => ss(i)
          case o: Array[_] => o(i)
        }: Seq[Any])
      case _ => Seq.empty[Seq[Any]]
    }
  }

  /** Column-wise decode of `n` compound records: member name → either
    * `Array[Double]` (numeric members), `Array[String]` (string AND
    * object-reference members — refs resolve to "/<name>"), or — NESTED
    * compound members — `Array[Seq[Any]]`, one inner value per nested
    * member in declaration order (recursively the same scalar kinds). */
  def decodeCompound(data: Array[Byte], dt: DType, n: Int,
      src: ByteSource): Seq[(String, Array[_])] = {
    val ct = dt match {
      case c: CompoundType => c
      case o => throw new IllegalArgumentException(s"not a compound datatype: $o")
    }
    ct.members.map { m =>
      m.dtype match {
        case t @ (_: NumType | _: EnumType) =>
          val nt = t match {
            case nm: NumType => nm
            case e: EnumType => e.base
          }
          val cell = new Array[Byte](nt.size)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            System.arraycopy(data, i * ct.size + m.offset, cell, 0, nt.size)
            out(i) = decode(cell, nt, 1)(0)
            i += 1
          }
          m.name -> out
        case at: ArrayMemberType =>
          // PyTables vector column: one fixed-shape numeric array per
          // record, flattened C-order (rank ≥ 2 keeps the flat order)
          val m2 = at.dims.product
          m.name -> Array.tabulate[Array[Double]](n) { i =>
            val cell = new Array[Byte](at.size)
            System.arraycopy(data, i * ct.size + m.offset, cell, 0, at.size)
            decode(cell, at.base, m2)
          }
        case st @ (_: StrType | _: VlenStrType) =>
          val es = st.size
          val cells = new Array[Byte](n * es)
          var i = 0
          while (i < n) {
            System.arraycopy(data, i * ct.size + m.offset, cells, i * es, es)
            i += 1
          }
          m.name -> decodeStrings(cells, st, n, src)
        case ot: OpaqueType =>
          // raw bytes per record, uninterpreted (the tag rides the schema).
          // Bound the UNTRUSTED member layout first: copyOfRange would
          // silently zero-pad an overrun for the last record — the one
          // silent-misread shape this layer otherwise rejects by name
          require(m.offset >= 0 && m.offset + ot.size <= ct.size,
            s"opaque member ${m.name} at offset ${m.offset} (+${ot.size} B) " +
              s"overruns the ${ct.size}-byte compound record")
          m.name -> Array.tabulate[Array[Byte]](n) { i =>
            java.util.Arrays.copyOfRange(data,
              i * ct.size + m.offset, i * ct.size + m.offset + ot.size)
          }
        case rt: RefType =>
          val cells = new Array[Byte](n * rt.size)
          var i = 0
          while (i < n) {
            System.arraycopy(data, i * ct.size + m.offset, cells, i * rt.size, rt.size)
            i += 1
          }
          m.name -> decodeRefs(cells, rt, n, src)
        case rr: RegionRefType =>
          val cells = new Array[Byte](n * rr.size)
          var i = 0
          while (i < n) {
            System.arraycopy(data, i * ct.size + m.offset, cells, i * rr.size, rr.size)
            i += 1
          }
          m.name -> decodeRegionRefs(cells, rr, n, src)
        case nc: CompoundType =>
          // nested record: re-pack the member's bytes densely, recurse,
          // then transpose to one Seq per record (declaration order)
          val inner = new Array[Byte](n * nc.size)
          var i = 0
          while (i < n) {
            System.arraycopy(data, i * ct.size + m.offset, inner, i * nc.size, nc.size)
            i += 1
          }
          val cols = decodeCompound(inner, nc, n, src).map(_._2)
          m.name -> Array.tabulate[Seq[Any]](n)(i => cols.map {
            case ds: Array[Double] => ds(i)
            case ss: Array[String] => ss(i)
            case o: Array[_] => o(i)
          })
        case o => throw new IllegalArgumentException(
          s"compound member ${m.name}: unsupported member type $o")
      }
    }
  }

  // object-address → link-name maps are immutable per file — memoize per
  // ByteSource so a chunked scan resolves refs with ONE superblock walk,
  // not one per chunk (weak keys: entries die with their source)
  private val refNamesCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[ByteSource, Map[Long, String]]())

  private def refNames(src: ByteSource): Map[Long, String] = {
    val cached = refNamesCache.get(src)
    if (cached != null) cached
    else {
      val (rootOh, _) = readSuperblock(src)
      val m = listDatasets(src, rootOh).map { case (name, oh) => oh -> s"/$name" }.toMap
      refNamesCache.put(src, m)
      m
    }
  }

  /** Decode `n` object references (file addresses of object headers) to
    * the referenced objects' root-group link names, "/<name>". An address
    * no root link points at fails with the address named. */
  def decodeRefs(data: Array[Byte], rt: RefType, n: Int,
      src: ByteSource): Array[String] = {
    val byAddr = refNames(src)
    Array.tabulate(n) { i =>
      val addr = leVar(data, i * rt.size, math.min(rt.size, 8)).toLong
      if (addr == Undef || addr == 0L) "" // unset/null reference
      else byAddr.getOrElse(addr, throw new IllegalArgumentException(
        f"object reference points at 0x$addr%x, which is not a root-group object"))
    }
  }

  /** Decode `n` DATASET REGION references to canonical strings
    * `"/<name> <selection>"` — the GCOL object behind each element holds
    * the target's object-header address + the serialized H5S selection.
    * `""` = null reference (heap address 0/undef). */
  def decodeRegionRefs(data: Array[Byte], rr: RegionRefType, n: Int,
      src: ByteSource): Array[String] = {
    val byAddr = refNames(src)
    val gcols = scala.collection.mutable.Map[Long, Map[Int, Array[Byte]]]()
    Array.tabulate(n) { i =>
      val heapAddr = leVar(data, i * rr.size, 8).toLong
      val idx = leVar(data, i * rr.size + 8, 4).toInt
      if (heapAddr == Undef || heapAddr == 0L) ""
      else {
        val objs = gcols.getOrElseUpdate(heapAddr, globalHeapCollection(src, heapAddr))
        val obj = objs.getOrElse(idx, throw new IllegalArgumentException(
          f"region reference names object $idx of the collection at 0x$heapAddr%x, " +
            s"which holds ${objs.size}"))
        require(obj.length >= 8 + 8,
          s"region-reference heap object of ${obj.length} bytes is shorter than " +
            "an object address + selection header")
        val ohAddr = leVar(obj, 0, 8).toLong
        val target = byAddr.getOrElse(ohAddr, throw new IllegalArgumentException(
          f"region reference points at 0x$ohAddr%x, which is not a root-group object"))
        s"$target ${selectionString(obj, 8)}"
      }
    }
  }

  /** Render a serialized H5S dataspace selection (the form region
    * references embed): `type(u32) version(u32)` then the version body —
    * v1 (32-bit coords) and v2 (64-bit: point lists with an encode-size
    * byte; hyperslabs as ONE regular start/stride/count/block tuple, which
    * libhdf5 writes for selections past 2^32 or under `libver='latest'`).
    * Small regular v2 hyperslabs render as the expanded block list so both
    * encodings of the same region read identically. */
  private[sources] def selectionString(b: Array[Byte], off: Int): String = {
    def u32(p: Int): Int = leVar(b, off + p, 4).toInt
    val selType = u32(0)
    val version = u32(4)
    selType match {
      case 0 => "none"
      case 3 => "all"
      case 1 if version == 1 => // points v1: pad, len, rank, npoints, u32 coords
        val rank = u32(16); val np = u32(20)
        require(rank >= 1 && rank <= 32 && np >= 0 &&
          off + 24 + 4L * rank * np <= b.length,
          s"point selection (rank $rank, $np points) overruns the heap object")
        "points " + (0 until np).map { p =>
          (0 until rank).map(d => u32(24 + (p * rank + d) * 4)).mkString("(", ",", ")")
        }.mkString(";")
      case 1 if version == 2 =>
        // points v2 (64-bit capable): enc-size(u8), rank(u32), then
        // num-points + coords in enc-size units
        val enc = b(off + 8) & 0xff
        require(enc == 2 || enc == 4 || enc == 8,
          s"point-selection v2 encode size $enc (want 2/4/8)")
        val rank = u32(9)
        val np = leVar(b, off + 13, enc)
        // np is an UNTRUSTED file u64: `enc*rank*np` can wrap negative and
        // pass a product-form bound while the render loop below runs ~2^62
        // iterations — use a division-form bound instead (same hardening
        // as the v2 hyperslab's saturating count fold)
        require(rank >= 1 && rank <= 32 && np >= 0 &&
          off + 13 + enc <= b.length &&
          np <= (b.length - off - 13 - enc) / (enc.toLong * rank),
          s"point selection v2 (rank $rank, $np points) overruns the heap object")
        "points " + (0L until np).map { p =>
          (0 until rank).map(d =>
            leVar(b, off + 13 + enc + ((p * rank + d) * enc).toInt, enc))
            .mkString("(", ",", ")")
        }.mkString(";")
      case 2 if version == 1 => // hyperslab v1: pad, len, rank, nblocks, u32 start+end
        val rank = u32(16); val nb = u32(20)
        require(rank >= 1 && rank <= 32 && nb >= 0 &&
          off + 24 + 8L * rank * nb <= b.length,
          s"hyperslab selection (rank $rank, $nb blocks) overruns the heap object")
        "hyperslab " + (0 until nb).map { k =>
          val base = 24 + k * 8 * rank
          val s0 = (0 until rank).map(d => u32(base + d * 4)).mkString("(", ",", ")")
          val e0 = (0 until rank).map(d => u32(base + (rank + d) * 4)).mkString("(", ",", ")")
          s"$s0-$e0"
        }.mkString(";")
      case 2 if version == 2 =>
        // hyperslab v2: ONE regular hyperslab — flags(u8), length(u32),
        // rank(u32), then start/stride/count/block, u64 × rank each
        val rank = u32(13)
        require(rank >= 1 && rank <= 32 &&
          off + 17 + 4L * 8 * rank <= b.length,
          s"hyperslab selection v2 (rank $rank) overruns the heap object")
        def arr(which: Int): Seq[Long] =
          (0 until rank).map(d => leVar(b, off + 17 + (which * rank + d) * 8, 8))
        val (start, stride, count, block) = (arr(0), arr(1), arr(2), arr(3))
        // counts are UNTRUSTED file u64s: an overflowing product could wrap
        // under the expand threshold and loop unboundedly — saturate the
        // fold itself (per-dim clamping alone still wraps at rank ≥ 11)
        val nBlocks = count.foldLeft(1L)((a, c) =>
          if (c < 0 || c > 64 || a > 64) 65L else a * c)
        if (nBlocks <= 64) {
          // expand to the v1-style block list so small regular selections
          // render identically to their v1 encoding
          def expand(d: Int, acc: Seq[(Seq[Long], Seq[Long])])
              : Seq[(Seq[Long], Seq[Long])] =
            if (d == rank) acc
            else expand(d + 1,
              acc.flatMap { case (ss, ee) =>
                (0L until count(d)).map { c =>
                  val st = start(d) + c * stride(d)
                  (ss :+ st, ee :+ (st + block(d) - 1))
                }
              })
          "hyperslab " + expand(0, Seq((Seq.empty[Long], Seq.empty[Long])))
            .map { case (ss, ee) =>
              ss.mkString("(", ",", ")") + "-" + ee.mkString("(", ",", ")")
            }.mkString(";")
        } else
          s"hyperslab-regular start=${start.mkString("(", ",", ")")} " +
            s"stride=${stride.mkString("(", ",", ")")} " +
            s"count=${count.mkString("(", ",", ")")} " +
            s"block=${block.mkString("(", ",", ")")}"
      case 1 | 2 => throw new IllegalArgumentException(
        s"dataspace selection type $selType version $version (v1/v2 only)")
      case t => throw new IllegalArgumentException(
        s"unknown dataspace selection type $t in region reference")
    }
  }

  // ── writer ───────────────────────────────────────────────────────────────

  /** One dataset to write: row-major f64 values of the given shape.
    * Attribute values may be String, Double, or Seq[Double].
    *
    * `v4Index` selects a layout-v4 chunk index instead of the default v3
    * v1-B-tree (requires `chunkDims`): "single" = one shuffle+deflate chunk
    * addressed from the layout message (flag 0x02); "implicit" = raw
    * early-allocated consecutive chunks; "fa" = unpaged Fixed Array;
    * "fa-paged" = Fixed Array with 4-element pages; "ea"/"ea-sblk"/
    * "ea-paged" = Extensible Array (inline, super-block indirected, paged
    * data blocks); "bt2" = v2 B-tree. Used to round-trip the
    * `libver='latest'` read paths. */
  final case class WriteVar(name: String, dims: Seq[Int], values: Array[Double],
      chunkDims: Option[Seq[Int]] = None, deflateLevel: Int = 4,
      attrs: Seq[(String, Any)] = Seq.empty, v4Index: Option[String] = None,
      denseAttrs: Boolean = false, typed: Option[TypedData] = None,
      compressor: String = "deflate", elideDefaultChunks: Boolean = false,
      fillBytes: Option[Array[Byte]] = None)

  /** Non-f64 payload for a [[WriteVar]] (contiguous layout only): the
    * write-side dual of the string/vlen/compound READ paths, so round-trip
    * tests exercise both. `values` is ignored when `typed` is set. */
  sealed trait TypedData { def n: Int; def elemSize: Int }
  /** Fixed-length string dataset (class 3): NUL-padded `size`-byte cells. */
  final case class FixedStrData(values: Seq[String], size: Int) extends TypedData {
    def n: Int = values.length; def elemSize: Int = size
  }
  /** Vlen string dataset (class 9): elements point into one GCOL written
    * right after the dataset's element array. */
  final case class VlenStrData(values: Seq[String]) extends TypedData {
    def n: Int = values.length; def elemSize: Int = 16
  }
  /** Vlen f64-sequence dataset (class 9 type 0): ragged arrays via GCOL. */
  final case class VlenSeqData(values: Seq[Array[Double]]) extends TypedData {
    def n: Int = values.length; def elemSize: Int = 16
  }
  /** Vlen sequence of FIXED strings (class 9 type 0 over a class-3 base):
    * ragged per-element string lists; each heap object packs the list's
    * strings in `strSize`-byte NUL-padded cells. */
  final case class VlenStrSeqData(values: Seq[Seq[String]], strSize: Int)
      extends TypedData {
    values.flatten.foreach(s => require(s.getBytes("UTF-8").length <= strSize,
      s"string '$s' exceeds the fixed base size $strSize"))
    def n: Int = values.length; def elemSize: Int = 16
  }
  /** CF-PACKED signed-i16 grid (class 0, LE): the layout real archives
    * actually ship — raw shorts + `scale_factor`/`add_offset`/`_FillValue`
    * attributes — 4× smaller than f64 before compression. Any rank;
    * chunked layouts gather per cell like the f64 path. */
  final case class PackedGridData(values: Array[Short]) extends TypedData {
    def n: Int = values.length; def elemSize: Int = 2
  }
  /** ENUM dataset (class 8 over i4 LE): named codes — the netCDF-4 CF
    * flag-variable shape. `codes` are the stored cells; `names`/`codeOf`
    * define the map (every stored code must be in it). */
  final case class EnumGridData(codes: Array[Int], names: Seq[String],
      codeOf: Seq[Long]) extends TypedData {
    require(names.length == codeOf.length && names.nonEmpty,
      "enum needs aligned, non-empty names/codes")
    codes.foreach(c => require(codeOf.contains(c.toLong),
      s"stored code $c is not in the enum map (${codeOf.mkString(", ")})"))
    def n: Int = codes.length; def elemSize: Int = 4
  }
  sealed trait CompoundCol { def n: Int; def elemSize: Int }
  final case class F64Col(values: Array[Double]) extends CompoundCol {
    def n: Int = values.length; def elemSize: Int = 8
  }
  /** ARRAY member (class 10 v2 over f64 LE): a fixed-shape vector per
    * record — PyTables `Float64Col(shape=(k,))`. Values are flat C-order,
    * `dims.product` doubles each. */
  final case class ArrayCol(values: Seq[Array[Double]], dims: Seq[Int])
      extends CompoundCol {
    require(dims.nonEmpty && dims.forall(_ > 0),
      s"array member dims must be positive (${dims.mkString("x")})")
    values.foreach(v => require(v.length == dims.product,
      s"array member cell holds ${v.length} values, dims say ${dims.product}"))
    def n: Int = values.length; def elemSize: Int = 8 * dims.product
  }
  final case class StrCol(values: Seq[String], size: Int) extends CompoundCol {
    def n: Int = values.length; def elemSize: Int = size
  }
  /** Signed 64-bit integer member — the dtype of a pandas `to_hdf`
    * table's `index` column. */
  final case class I64Col(values: Array[Long]) extends CompoundCol {
    def n: Int = values.length; def elemSize: Int = 8
  }
  /** NESTED compound member (a record inside the record). */
  final case class NestedCol(members: Seq[(String, CompoundCol)]) extends CompoundCol {
    require(members.nonEmpty && members.map(_._2.n).distinct.size == 1)
    def n: Int = members.head._2.n
    def elemSize: Int = members.map(_._2.elemSize).sum
  }
  /** Compound (record) dataset, class 6 v1 — packed members in order. */
  final case class CompoundData(members: Seq[(String, CompoundCol)]) extends TypedData {
    require(members.nonEmpty && members.map(_._2.n).distinct.size == 1)
    def n: Int = members.head._2.n
    def elemSize: Int = members.map(_._2.elemSize).sum
  }
  /** OBJECT-reference dataset (class 7): each element names a sibling
    * dataset in the same file; the writer resolves names to object-header
    * addresses at emission ("" writes a null reference). */
  final case class RefData(targets: Seq[String]) extends TypedData {
    def n: Int = targets.length; def elemSize: Int = 8
  }

  /** A dataspace selection for a region reference (serialized as H5S v1). */
  sealed trait RegionSel
  /** Block list: per block, inclusive start and opposite-corner coords. */
  final case class HyperSel(blocks: Seq[(Seq[Int], Seq[Int])]) extends RegionSel {
    require(blocks.nonEmpty, "hyperslab selection needs >= 1 block")
    require(blocks.map(_._1.length).distinct.size == 1,
      "hyperslab blocks must share one rank")
    blocks.foreach { case (s, e) =>
      require(s.nonEmpty && s.length == e.length,
        s"hyperslab block start/end ranks differ: $s vs $e")
    }
  }
  final case class PointSel(points: Seq[Seq[Int]]) extends RegionSel {
    require(points.nonEmpty && points.map(_.length).distinct == Seq(points.head.length)
      && points.head.nonEmpty,
      "point selection needs >= 1 point, all of one rank >= 1")
  }
  case object AllSel extends RegionSel

  /** DATASET-REGION-reference dataset (class 7 type 1): each element names
    * a sibling dataset plus a dataspace selection into it; `None` writes a
    * null reference. Elements are (GCOL address, object index) pairs; the
    * heap objects carry the target's header address + the serialized
    * selection. */
  final case class RegionRefData(targets: Seq[Option[(String, RegionSel)]])
      extends TypedData {
    def n: Int = targets.length; def elemSize: Int = 12
  }

  /** Serialize a selection in the v1 form [[selectionString]] reads back. */
  private def serializeSelection(sel: RegionSel): Array[Byte] = sel match {
    case AllSel =>
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(3).putInt(1).putInt(0).putInt(0)
      b.array()
    case PointSel(pts) =>
      val rank = pts.head.length
      val b = ByteBuffer.allocate(24 + 4 * rank * pts.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1).putInt(1).putInt(0).putInt(8 + 4 * rank * pts.length)
      b.putInt(rank).putInt(pts.length)
      pts.foreach(_.foreach(b.putInt))
      b.array()
    case HyperSel(blocks) =>
      val rank = blocks.head._1.length
      val b = ByteBuffer.allocate(24 + 8 * rank * blocks.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(2).putInt(1).putInt(0).putInt(8 + 8 * rank * blocks.length)
      b.putInt(rank).putInt(blocks.length)
      blocks.foreach { case (s, e) => s.foreach(b.putInt); e.foreach(b.putInt) }
      b.array()
  }

  /** Datatype message body for a typed payload (writer side). */
  private def typedDtBody(t: TypedData): Array[Byte] = t match {
    case FixedStrData(_, size) =>
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      // v1 class 3; padding = NUL-terminated (0), charset = UTF-8 (1)
      b.put(0x13.toByte).put(0x10.toByte).put(0.toByte).put(0.toByte).putInt(size)
      b.array()
    case _: VlenStrData =>
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      // v1 class 9; vlen type = string (bits 0–3), charset UTF-8 (bits 8–11)
      b.put(0x19.toByte).put(0x01.toByte).put(0x01.toByte).put(0.toByte).putInt(16)
      // base type: 1-byte ASCII string (libhdf5 convention for vlen str)
      b.put(0x13.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte).putInt(1)
      b.array()
    case _: VlenSeqData =>
      val b = ByteBuffer.allocate(8 + 24).order(ByteOrder.LITTLE_ENDIAN)
      // v1 class 9; vlen type = sequence (0); base = IEEE f64 LE
      b.put(0x19.toByte).put(0x00.toByte).put(0x00.toByte).put(0.toByte).putInt(16)
      b.put(f64TypeBody)
      b.array()
    case VlenStrSeqData(_, strSize) =>
      val b = ByteBuffer.allocate(8 + 8).order(ByteOrder.LITTLE_ENDIAN)
      // v1 class 9; vlen type = sequence (0); base = fixed UTF-8 string
      b.put(0x19.toByte).put(0x00.toByte).put(0x00.toByte).put(0.toByte).putInt(16)
      b.put(0x13.toByte).put(0x10.toByte).put(0.toByte).put(0.toByte).putInt(strSize)
      b.array()
    case _: PackedGridData =>
      // v1 class 0 fixed-point, signed LE, 2 bytes: bit offset 0, precision 16
      val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(2)
      b.putShort(0).putShort(16)
      b.array()
    case EnumGridData(_, names, codeOf) =>
      // v1 class 8 over signed i4 LE; names NUL-terminated padded ×8
      // (the v1/v2 layout), then the i4 codes
      val nameBlocks = names.map { nm =>
        val nb = nm.getBytes("UTF-8")
        java.util.Arrays.copyOf(nb, nb.length / 8 * 8 + 8)
      }
      val b = ByteBuffer.allocate(8 + 12 + nameBlocks.map(_.length).sum +
        4 * codeOf.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x18.toByte) // v1, class 8
        .put((names.length & 0xff).toByte)
        .put(((names.length >> 8) & 0xff).toByte)
        .put(0.toByte).putInt(4)
      // base: v1 class 0 fixed-point, signed LE, 4 bytes
      b.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(4)
      b.putShort(0).putShort(32)
      nameBlocks.foreach(b.put)
      codeOf.foreach(v => b.putInt(v.toInt))
      b.array()
    case cd: CompoundData => compoundTypeBody(cd.members, cd.elemSize)
    case _: RefData =>
      // v1 class 7; reference type 0 (object) — no extra properties
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x17.toByte).put(0x00.toByte).put(0.toByte).put(0.toByte).putInt(8)
      b.array()
    case _: RegionRefData =>
      // v1 class 7; reference type 1 (dataset region); 12-byte elements
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x17.toByte).put(0x01.toByte).put(0.toByte).put(0.toByte).putInt(12)
      b.array()
  }

  /** Class-6 v1 datatype body for a member list — recursive, so nested
    * compound members embed their own compound bodies. */
  private def compoundTypeBody(members: Seq[(String, CompoundCol)],
      elemSize: Int): Array[Byte] = {
    val memberRecs = {
      var off = 0
      members.map { case (name, col) =>
        val nb = name.getBytes("UTF-8")
        val namePad = nb.length / 8 * 8 + 8
        val mt = col match {
          case _: F64Col => f64TypeBody
          case _: I64Col =>
            // v1 class 0, signed LE, 8 bytes: bit offset 0, precision 64
            val sb = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
            sb.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(8)
            sb.putShort(0).putShort(64)
            sb.array()
          case StrCol(_, size) =>
            val sb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            sb.put(0x13.toByte).put(0x10.toByte).put(0.toByte).put(0.toByte).putInt(size)
            sb.array()
          case ac: ArrayCol =>
            // v2 class 10: rank, reserved ×3, dims u32, identity perm, f64 base
            val rank = ac.dims.length
            val sb = ByteBuffer.allocate(8 + 4 + 8 * rank + f64TypeBody.length)
              .order(ByteOrder.LITTLE_ENDIAN)
            sb.put(0x2A.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
              .putInt(ac.elemSize)
            sb.put((rank & 0xff).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
            ac.dims.foreach(sb.putInt)
            ac.dims.indices.foreach(sb.putInt) // permutation: identity
            sb.put(f64TypeBody)
            sb.array()
          case nc: NestedCol => compoundTypeBody(nc.members, nc.elemSize)
        }
        val r = ByteBuffer.allocate(namePad + 32 + mt.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        r.put(nb); r.position(namePad)
        r.putInt(off) // byte offset; dimensionality 0 + reserved + perm stay zero
        r.position(namePad + 32)
        r.put(mt)
        off += col.elemSize
        r.array()
      }
    }
    val b = ByteBuffer.allocate(8 + memberRecs.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x16.toByte) // v1 class 6
      .put((members.size & 0xff).toByte)
      .put(((members.size >> 8) & 0xff).toByte)
      .put(0.toByte).putInt(elemSize)
    memberRecs.foreach(b.put)
    b.array()
  }

  /** Element bytes of a typed payload; vlen elements reference `gcolAddr`. */
  private def typedDataBytes(t: TypedData, gcolAddr: Long): Array[Byte] = t match {
    case FixedStrData(values, size) =>
      val out = new Array[Byte](values.length * size)
      values.zipWithIndex.foreach { case (s, i) =>
        val sb = s.getBytes("UTF-8")
        require(sb.length <= size, s"string '$s' exceeds fixed size $size")
        System.arraycopy(sb, 0, out, i * size, math.min(sb.length, size))
      }
      out
    case VlenStrData(values) =>
      val b = ByteBuffer.allocate(values.length * 16).order(ByteOrder.LITTLE_ENDIAN)
      values.zipWithIndex.foreach { case (s, i) =>
        b.putInt(s.getBytes("UTF-8").length).putLong(gcolAddr).putInt(i + 1)
      }
      b.array()
    case t @ (_: VlenSeqData | _: VlenStrSeqData) =>
      // vlen descriptors: length in ELEMENTS, collection address, index
      val lens = t match {
        case VlenSeqData(vs) => vs.map(_.length)
        case VlenStrSeqData(vs, _) => vs.map(_.length)
        case _ => Seq.empty
      }
      val b = ByteBuffer.allocate(lens.length * 16).order(ByteOrder.LITTLE_ENDIAN)
      lens.zipWithIndex.foreach { case (len, i) =>
        b.putInt(len).putLong(gcolAddr).putInt(i + 1)
      }
      b.array()
    case PackedGridData(values) =>
      val b = ByteBuffer.allocate(values.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      values.foreach(b.putShort)
      b.array()
    case EnumGridData(codes, _, _) =>
      val b = ByteBuffer.allocate(codes.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      codes.foreach(b.putInt)
      b.array()
    case cd: CompoundData =>
      val out = new Array[Byte](cd.n * cd.elemSize)
      fillCompound(cd.members, out, 0, cd.elemSize)
      out
    case RegionRefData(targets) =>
      // non-null elements index the GCOL objects 1..k in order
      val b = ByteBuffer.allocate(targets.length * 12).order(ByteOrder.LITTLE_ENDIAN)
      var gi = 0
      targets.foreach {
        case None => b.putLong(0L).putInt(0)
        case Some(_) => gi += 1; b.putLong(gcolAddr).putInt(gi)
      }
      b.array()
    case _: RefData => throw new IllegalStateException(
      "RefData bytes need the object-address map — emitted via refDataBytes")
  }

  /** Pack member columns into `out` at record stride `es`, starting at
    * byte `base` within each record — recursive for nested members. */
  private def fillCompound(members: Seq[(String, CompoundCol)],
      out: Array[Byte], base: Int, es: Int): Unit = {
    var off = base
    members.foreach { case (_, col) =>
      col match {
        case F64Col(vs) =>
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          vs.zipWithIndex.foreach { case (v, i) =>
            b.clear(); b.putDouble(v)
            System.arraycopy(b.array(), 0, out, i * es + off, 8)
          }
        case I64Col(vs) =>
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          vs.zipWithIndex.foreach { case (v, i) =>
            b.clear(); b.putLong(v)
            System.arraycopy(b.array(), 0, out, i * es + off, 8)
          }
        case StrCol(vs, size) =>
          vs.zipWithIndex.foreach { case (s, i) =>
            val sb = s.getBytes("UTF-8")
            require(sb.length <= size, s"string '$s' exceeds fixed size $size")
            System.arraycopy(sb, 0, out, i * es + off, math.min(sb.length, size))
          }
        case ac: ArrayCol =>
          val b = ByteBuffer.allocate(ac.elemSize).order(ByteOrder.LITTLE_ENDIAN)
          ac.values.zipWithIndex.foreach { case (vs, i) =>
            b.clear(); vs.foreach(b.putDouble)
            System.arraycopy(b.array(), 0, out, i * es + off, ac.elemSize)
          }
        case nc: NestedCol => fillCompound(nc.members, out, off, es)
      }
      off += col.elemSize
    }
  }

  /** Reference-dataset bytes: resolve each target name to its object
    * header address ("" → null reference, written as 0). */
  private def refDataBytes(rd: RefData, ohAddrOf: String => Long): Array[Byte] = {
    val b = ByteBuffer.allocate(rd.n * 8).order(ByteOrder.LITTLE_ENDIAN)
    rd.targets.foreach { t => b.putLong(if (t.isEmpty) 0L else ohAddrOf(t)) }
    b.array()
  }

  /** Global heap collection holding the vlen payload bytes: "GCOL" header,
    * one object per string (index 1..n, 8-padded), free-space terminator. */
  private def buildGcol(objs: Seq[Array[Byte]]): Array[Byte] = {
    val padded = objs.map(o => (o, (o.length + 7) / 8 * 8))
    val size = 16L + padded.map(_._2 + 16).sum + 16
    val b = ByteBuffer.allocate(size.toInt).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GCOL".getBytes).put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putLong(size)
    padded.zipWithIndex.foreach { case ((o, pad), i) =>
      b.putShort((i + 1).toShort).putShort(1.toShort).putInt(0).putLong(o.length.toLong)
      b.put(o)
      (o.length until pad).foreach(_ => b.put(0.toByte))
    }
    b.putShort(0.toShort).putShort(0.toShort).putInt(0).putLong(16L) // free space
    b.array()
  }

  /** Bytes `buildGcol` will emit for these object sizes. */
  private def gcolTotal(objSizes: Seq[Int]): Long =
    16L + objSizes.map(s => (s + 7) / 8 * 8 + 16).sum + 16

  /** Bob Jenkins' lookup3 `hashlittle` — the hash HDF5 keys dense link /
    * attribute name indexes on (public-domain algorithm; H5_checksum_lookup3
    * is the same function). Implemented from the published algorithm. */
  private[sources] def lookup3(data: Array[Byte], init: Int = 0): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    def word(o: Int, n: Int): Int = {
      var v = 0; var i = n - 1
      while (i >= 0) { v = (v << 8) | (data(o + i) & 0xff); i -= 1 }
      v
    }
    var a = 0xdeadbeef + data.length + init
    var b = a; var c = a
    var p = 0; var len = data.length
    while (len > 12) {
      a += word(p, 4); b += word(p + 4, 4); c += word(p + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; len -= 12
    }
    if (len == 0) return c // only for empty input: no final mix
    a += word(p, math.min(len, 4))
    if (len > 4) b += word(p + 4, math.min(len - 4, 4))
    if (len > 8) c += word(p + 8, math.min(len - 8, 4))
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** Writer-side fractal heap: FRHP header + ONE direct block holding all
    * objects (the shape small link/attribute heaps take in practice).
    * 8-byte heap IDs (offset 4 + length 3). Returns (bytes, heap IDs). */
  private def buildFractalHeap(atAddr: Long, objs: Seq[Array[Byte]]): (Array[Byte], Seq[Array[Byte]]) = {
    val payload = objs.map(_.length).sum
    require(payload < (1 << 23), "writer fractal heap limited to 8 MB of objects")
    var block = 32L
    while (block < 17 + payload) block <<= 1
    val maxDirect = math.max(block, 65536L) // keeps the length field 3 bytes
    val out = ByteBuffer.allocate(146 + 17 + payload).order(ByteOrder.LITTLE_ENDIAN)
    out.put("FRHP".getBytes).put(0.toByte)
    out.putShort(8).putShort(0).put(0.toByte) // heap ID len, no filters, no checksums
    out.putInt(block.toInt) // max managed object size
    out.putLong(0L).putLong(Undef) // huge: next id, v2 B-tree
    out.putLong(0L).putLong(Undef) // free space, free-space manager
    out.putLong(block).putLong(block) // managed space, allocated
    out.putLong(17L + payload) // direct-block iterator offset
    out.putLong(objs.size.toLong)
    out.putLong(0L).putLong(0L).putLong(0L).putLong(0L) // huge/tiny sizes+counts
    out.putShort(4) // table width
    out.putLong(block).putLong(maxDirect)
    out.putShort(32) // max heap size (bits) → 4-byte offsets
    out.putShort(0).putLong(atAddr + 146).putShort(0) // direct-block root
    out.putInt(0) // checksum (readers don't verify)
    out.put("FHDB".getBytes).put(0.toByte).putLong(atAddr).putInt(0)
    var off = 17L
    val ids = objs.map { o =>
      val id = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      id.put(0.toByte).putInt(off.toInt)
      id.put((o.length & 0xff).toByte).put(((o.length >> 8) & 0xff).toByte)
        .put(((o.length >> 16) & 0xff).toByte)
      out.put(o)
      off += o.length
      id.array()
    }
    (out.array(), ids)
  }

  /** Writer-side v2 B-tree: header + a single root leaf (node size grown to
    * fit — the read side handles deep trees, the writer never needs them). */
  private def buildBtreeV2Leaf(atAddr: Long, typ: Int, recordSize: Int,
      records: Seq[Array[Byte]]): Array[Byte] = {
    val leafSize = 10 + records.size * recordSize
    var nodeSize = 512
    while (nodeSize < leafSize) nodeSize <<= 1
    val out = ByteBuffer.allocate(38 + leafSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put("BTHD".getBytes).put(0.toByte).put(typ.toByte)
    out.putInt(nodeSize).putShort(recordSize.toShort).putShort(0) // depth 0
    out.put(100.toByte).put(40.toByte) // split/merge percent (library defaults)
    out.putLong(atAddr + 38).putShort(records.size.toShort)
    out.putLong(records.size.toLong).putInt(0)
    out.put("BTLF".getBytes).put(0.toByte).put(typ.toByte)
    records.foreach(out.put)
    out.putInt(0)
    out.array()
  }

  /** Total bytes `buildFractalHeap` will emit for objects of these sizes. */
  private def heapTotal(objSizes: Seq[Int]): Long = 146L + 17 + objSizes.sum

  /** Total bytes `buildBtreeV2Leaf` will emit for `n` records. */
  private def btreeTotal(n: Int, recordSize: Int): Long = 38L + 10 + n.toLong * recordSize

  /** v2-B-tree chunk-index geometry: (record size, node size) for `n`
    * filtered chunk records of `rank` dimensions. The stored-size field
    * width follows the library formula from the unfiltered chunk size. */
  private def bt2ChunkGeom(n: Int, rank: Int, chunkRawBytes: Long): (Int, Int) = {
    val szLen = math.min(8, 1 + ((63 - java.lang.Long.numberOfLeadingZeros(chunkRawBytes)) + 8) / 8)
    val recSize = 12 + szLen + rank * 8
    var nodeSize = 512
    while (nodeSize < 10 + n * recSize) nodeSize <<= 1
    (recSize, nodeSize)
  }

  /** 20-byte IEEE f64 LE datatype message body (class 1, version 1). */
  private def f64TypeBody: Array[Byte] = {
    val dt = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    dt.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte).putInt(8)
    dt.putShort(0).putShort(64)
    dt.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
    dt.array()
  }

  /** v1 attribute message body (8-padded sub-blocks, as the spec requires). */
  private def attrMessage(name: String, value: Any): Array[Byte] = {
    def pad8(n: Int): Int = (n + 7) / 8 * 8
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    def scalarDs = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
    def vecDs(n: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(1.toByte).put(0.toByte).put(0.toByte).putInt(0).putLong(n.toLong)
      b.array()
    }
    def doubles(vs: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble)
      b.array()
    }
    val (dt, ds, data) = value match {
      case s: String =>
        val sb = s.getBytes("UTF-8") :+ 0.toByte
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        b.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(sb.length)
        (b.array(), scalarDs, sb)
      case d: Double => (f64TypeBody, scalarDs, doubles(Seq(d)))
      case vs: Seq[_] =>
        val dv = vs.map(_.asInstanceOf[Double])
        (f64TypeBody, vecDs(dv.length), doubles(dv))
      case other => throw new IllegalArgumentException(
        s"unsupported attribute type ${other.getClass.getName}")
    }
    val total = pad8(8 + pad8(nameB.length) + pad8(dt.length) + pad8(ds.length) + data.length)
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(1.toByte).put(0.toByte)
    out.putShort(nameB.length.toShort).putShort(dt.length.toShort).putShort(ds.length.toShort)
    out.put(nameB); out.position(8 + pad8(nameB.length))
    out.put(dt); out.position(8 + pad8(nameB.length) + pad8(dt.length))
    out.put(ds); out.position(8 + pad8(nameB.length) + pad8(dt.length) + pad8(ds.length))
    out.put(data)
    out.array()
  }

  /** Assemble a complete HDF5 file (superblock v0, old-style root group,
    * v1 object headers). Datasets with `chunkDims` are written
    * shuffle+deflate chunked (v1 B-tree index, one leaf node); others
    * contiguous. Returns the file bytes.
    *
    * `denseRoot` stores the root group's links densely (Link Info message →
    * fractal heap + v2 B-tree name index) instead of the old-style symbol
    * table — the storage every netCDF-4 group with more than 8 links uses —
    * so round-trips exercise the dense read path. `WriteVar.denseAttrs`
    * does the same for a variable's attributes (Attribute Info message). */
  /** [[ByteSource]] over an in-memory file image (append patching). */
  private final class ArraySource(bytes: Array[Byte]) extends ByteSource {
    def read(off: Long, len: Int): Array[Byte] = {
      require(off >= 0 && off + len <= bytes.length,
        s"read [$off, ${off + len}) outside file of ${bytes.length} bytes")
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)
    }
  }

  /** File offsets of each message BODY in a V1 object header (the format
    * this library writes), following continuation blocks — the lookup the
    * in-place append patches need: dataspace dims and the layout message's
    * B-tree address are fixed-width fields overwritten in place. */
  private def v1MessageOffsets(src: ByteSource, addr: Long): Seq[(Int, Long, Int)] = {
    val probe = src.read(addr, 16)
    require((probe(0) & 0xff) == 1,
      s"in-place append supports v1 object headers only (version ${probe(0)} at $addr)")
    val b = le(probe)
    val nMsgs = b.getShort(2) & 0xffff
    val headerSize = b.getInt(8)
    val out = Seq.newBuilder[(Int, Long, Int)]
    var remaining = nMsgs
    var blocks = List((addr + 16, headerSize.toLong))
    while (remaining > 0 && blocks.nonEmpty) {
      val (off, len) = blocks.head
      blocks = blocks.tail
      val block = src.read(off, len.toInt)
      val bb = le(block)
      var p = 0
      while (remaining > 0 && p + 8 <= len) {
        val typ = bb.getShort(p) & 0xffff
        val size = bb.getShort(p + 2) & 0xffff
        if (typ == 0x0010) {
          val cb = le(java.util.Arrays.copyOfRange(block, p + 8, p + 8 + size))
          blocks = blocks :+ ((cb.getLong(0), cb.getLong(8)))
        } else out += ((typ, off + p + 8, size))
        remaining -= 1
        p += 8 + size
      }
    }
    out.result()
  }

  /** Encode rows into stored compound records honoring the STORED member
    * offsets and types (not the writer's packed order) — each row aligns
    * positionally with `ct.members`, nested compounds recurse. */
  def encodeCompoundRecords(ct: CompoundType, rows: Seq[Seq[Any]]): Array[Byte] = {
    val out = new Array[Byte](rows.length * ct.size)
    def putMember(base: Int, m: CompoundMember, v: Any): Unit = m.dtype match {
      case NumType("float", 8, le0) =>
        val b = ByteBuffer.allocate(8)
          .order(if (le0) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        b.putDouble(v match {
          case null => Double.NaN
          case d: Double => d
          case f: Float => f.toDouble
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case o => throw new IllegalArgumentException(
            s"member '${m.name}': cannot encode ${o.getClass.getName} as f64")
        })
        System.arraycopy(b.array(), 0, out, base + m.offset, 8)
      case NumType(k, 8, le0) if k == "int" || k == "uint" =>
        val b = ByteBuffer.allocate(8)
          .order(if (le0) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        b.putLong(v match {
          case l: Long => l
          case i: Int => i.toLong
          case d: Double if d == d.floor => d.toLong
          case o => throw new IllegalArgumentException(
            s"member '${m.name}': cannot encode ${if (o == null) "null" else o.getClass.getName} as i64")
        })
        System.arraycopy(b.array(), 0, out, base + m.offset, 8)
      case StrType(size, _) =>
        val sb = Option(v).fold("")(_.toString).getBytes("UTF-8")
        require(sb.length <= size,
          s"member '${m.name}': string of ${sb.length} bytes exceeds the " +
            s"stored fixed size $size")
        System.arraycopy(sb, 0, out, base + m.offset, sb.length)
      case nc: CompoundType =>
        val inner: Seq[Any] = v match {
          case null => Seq.fill(nc.members.length)(null)
          case r: org.apache.spark.sql.Row => r.toSeq
          case s: scala.collection.Seq[_] => s.toSeq
          case o => throw new IllegalArgumentException(
            s"member '${m.name}': nested compound needs a Row/Seq, got ${o.getClass.getName}")
        }
        require(inner.length == nc.members.length,
          s"member '${m.name}': ${inner.length} values for ${nc.members.length} nested members")
        nc.members.zip(inner).foreach { case (im, iv) =>
          putMember(base + m.offset, im, iv)
        }
      case at @ ArrayMemberType(NumType("float", 8, le0), _) =>
        // vector member (PyTables Float64Col(shape)) — the embedding-table
        // append path; the cell must carry exactly the stored shape
        val cells: Seq[Double] = v match {
          case s: scala.collection.Seq[_] => s.map {
            case d: Double => d
            case f: Float => f.toDouble
            case l: Long => l.toDouble
            case i: Int => i.toDouble
            case null => Double.NaN
            case o => throw new IllegalArgumentException(
              s"member '${m.name}': cannot encode ${o.getClass.getName} " +
                "inside a vector member")
          }.toSeq
          case null => throw new IllegalArgumentException(
            s"member '${m.name}': null array cells are not representable " +
              "in a fixed-shape vector member")
          case o => throw new IllegalArgumentException(
            s"member '${m.name}': vector member needs a Seq, got ${o.getClass.getName}")
        }
        val n0 = at.dims.product
        require(cells.length == n0,
          s"member '${m.name}': ${cells.length} values for the stored " +
            s"${at.dims.mkString("x")} vector shape")
        val b = ByteBuffer.allocate(n0 * 8)
          .order(if (le0) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        cells.foreach(b.putDouble)
        System.arraycopy(b.array(), 0, out, base + m.offset, n0 * 8)
      case o => throw new IllegalArgumentException(
        s"member '${m.name}': appends support f64/i64/fixed-string/nested/" +
          s"f64-vector members (got $o)")
    }
    rows.zipWithIndex.foreach { case (row, i) =>
      require(row.length == ct.members.length,
        s"row $i has ${row.length} values for ${ct.members.length} members")
      ct.members.zip(row).foreach { case (m, v) => putMember(i * ct.size, m, v) }
    }
    out
  }

  /** Re-apply a parsed filter pipeline in WRITE order (the inverse of
    * [[defilter]]) for the pipelines this library writes on compound
    * tables: optional shuffle (2) + deflate (1) / zstd (32015), or none. */
  private def refilter(raw: Array[Byte], filters: Seq[Filter]): Array[Byte] = {
    var data = raw
    filters.foreach { f =>
      f.id match {
        case 2 =>
          val es = f.clientValues.head
          if (es > 1 && data.length % es == 0) {
            val n = data.length / es
            val sh = new Array[Byte](data.length)
            var b = 0
            while (b < es) {
              var i = 0
              while (i < n) { sh(b * n + i) = data(i * es + b); i += 1 }
              b += 1
            }
            data = sh
          }
        case 1 =>
          val level = f.clientValues.headOption.getOrElse(4)
          val defl = new Deflater(level)
          defl.setInput(data); defl.finish()
          val cbuf = new java.io.ByteArrayOutputStream(data.length)
          val tmp = new Array[Byte](65536)
          while (!defl.finished()) cbuf.write(tmp, 0, defl.deflate(tmp))
          defl.end()
          data = cbuf.toByteArray
        case 32015 =>
          data = com.github.luben.zstd.Zstd.compress(data,
            f.clientValues.headOption.getOrElse(3))
        case other => throw new IllegalArgumentException(
          s"append cannot re-apply filter $other (supported: shuffle + " +
            "deflate/zstd) — rewrite the table instead")
      }
    }
    data
  }

  /** IN-PLACE append onto a chunked compound table — the PyTables
    * `table.append()` shape: extend the record dimension of an existing
    * 1-D compound dataset. Operates on the full FILE IMAGE (an HDF5 file
    * is a single-assembly sink in this library — the create collects
    * driver-side too; tables are bounded result exports, not the 100 TB
    * cube path) and returns the patched image:
    *
    *  1. the straddled partial edge chunk (if the old row count is not a
    *     chunk multiple) is defiltered at its FULL stored geometry,
    *     overlaid with the first new records, refiltered, and lands at
    *     the old EOF — its previous bytes become dead space, exactly as
    *     libhdf5 leaves free space on chunk reallocation;
    *  2. the remaining records land as new full-geometry chunks;
    *  3. a NEW v1 B-tree leaf (old entries + replacements + additions,
    *     key-ordered) lands after them, and the layout message's B-tree
    *     address, the dataspace's dims[0], and the superblock EOF are
    *     patched in place — all fixed-width fields.
    *
    * Old chunk bytes are never re-encoded; a reader of the pre-append
    * image sees the exact old table (the metadata patch is last in the
    * byte stream, though the caller's file swap is what makes it atomic).
    *
    * @param rows one Seq[Any] per appended record, positionally aligned
    *             with the stored compound members */
  def appendCompoundTable(file: Array[Byte], varName: String,
      rows: Seq[Seq[Any]]): Array[Byte] = {
    require(rows.nonEmpty, "appendCompoundTable: no rows to append")
    val src = new ArraySource(file)
    // the fixed-width EOF patch below lands at byte 40, which is the EOF
    // field of a VERSION-0 superblock ONLY — v1 straddles free-space/EOF
    // at 36/44 and v2/v3 keep a checksummed root-OH address there, so
    // patching those would silently corrupt the image. readSuperblock
    // accepts v0–v3; appends must not.
    require((file(8) & 0xff) == 0,
      s"$varName lives in a superblock-v${file(8) & 0xff} file — appends " +
        "patch the v0 superblock EOF field (the PyTables/h5py default); " +
        "rewrite the table to make it appendable")
    val (rootOh, _) = readSuperblock(src)
    val ohAddr = listDatasets(src, rootOh).find(_._1 == varName)
      .getOrElse(throw new IllegalArgumentException(
        s"no dataset $varName to append to"))._2
    val ds = readDataset(src, varName, ohAddr)
    val ct = ds.dtype match {
      case c: CompoundType => c
      case o => throw new IllegalArgumentException(
        s"$varName is not a compound table ($o)")
    }
    require(ds.dims.length == 1, s"$varName: compound tables are 1-D")
    val layout = ds.layout match {
      case c: Chunked if c.index == BTreeV1 => c
      case c: Chunked => throw new IllegalArgumentException(
        s"$varName uses chunk index ${c.index} — appends support the v1 " +
          "B-tree index (the PyTables/netCDF-4 default)")
      case o => throw new IllegalArgumentException(
        s"$varName is $o — only CHUNKED tables can grow; rewrite with " +
          ".option(\"chunkRows\", …) to make it appendable")
    }
    val cn = layout.chunkDims.head
    val fullChunkBytes = cn * ct.size
    val nOld = ds.dims.head
    val k = rows.length
    val recBytes = encodeCompoundRecords(ct, rows)
    val fillRec = rawFillBytes(src, ohAddr).filter(_.length == ct.size)

    val out = new java.io.ByteArrayOutputStream(file.length + recBytes.length * 2)
    out.write(file, 0, file.length)
    def pos: Long = out.size().toLong

    // entry map: chunk origin -> (nbytes, filterMask, addr)
    val entries = scala.collection.mutable.SortedMap[Long, (Int, Int, Long)]()
    btreeV1Chunks(src, layout).foreach { c =>
      entries(c.offsets.head) = (c.size, c.filterMask, c.addr)
    }
    val firstOrg = nOld / cn * cn // chunk holding the first appended row
    var org = firstOrg
    while (org < nOld + k) {
      val raw = new Array[Byte](fullChunkBytes)
      if (org < nOld) entries.get(org) match {
        case Some((sz, mask, addr)) =>
          // defilter at the FULL stored geometry (stored chunks are always
          // full-size, the dataspace edge notwithstanding)
          val old = defilter(src.read(addr, sz), ds.filters, mask, fullChunkBytes)
          System.arraycopy(old, 0, raw, 0, math.min(old.length, fullChunkBytes))
        case None =>
          fillRec.foreach { fr =>
            var i = 0
            while (i < cn) { System.arraycopy(fr, 0, raw, i * ct.size, ct.size); i += 1 }
          }
      }
      val lo = math.max(org, nOld)
      val hi = math.min(org + cn, nOld + k)
      var r = lo
      while (r < hi) {
        System.arraycopy(recBytes, ((r - nOld) * ct.size).toInt,
          raw, ((r - org) * ct.size).toInt, ct.size)
        r += 1
      }
      val enc = refilter(raw, ds.filters)
      entries(org) = (enc.length, 0, pos)
      out.write(enc, 0, enc.length)
      org += cn
    }

    // new v1 chunk B-tree with every entry, key-ordered. libhdf5 caps v1
    // B-tree node children at 2*K, and a v0 superblock carries no
    // indexed-storage-K field, so h5py/PyTables — the interop target this
    // append claims — assume K=32: ≤64 entries regrow the classic single
    // leaf; past that a LEVEL-1 root over ≤64 leaves (the same two-level
    // layout `assemble` emits, and the one libhdf5 itself grows into).
    def u16b(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def u32b(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def u64b(v: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    val groupsA = entries.toSeq.grouped(64).toSeq
    val nLeavesA = groupsA.length
    require(nLeavesA <= 64,
      s"appended table holds ${entries.size} chunks — beyond the " +
        "4096-entry two-level v1 B-tree this append emits (64×64 at " +
        "libhdf5's K=32 default); rewrite with larger chunkRows")
    val btAddr2 = pos
    val keySizeA = 24 // u32 size + u32 mask + (record dim + pseudo-dim) × u64
    def nodeSizeA(n: Int): Long = 24L + n * (keySizeA + 8) + keySizeA
    val leafAddrsA =
      if (nLeavesA == 1) Seq(btAddr2)
      else {
        var a = btAddr2 + nodeSizeA(nLeavesA)
        groupsA.map { g => val r = a; a += nodeSizeA(g.length); r }
      }
    def keyA(o: Long, sz: Int, mask: Int): Unit = {
      out.write(u32b(sz), 0, 4); out.write(u32b(mask), 0, 4)
      out.write(u64b(o), 0, 8); out.write(u64b(0L), 0, 8)
    }
    def endKeyA(): Unit = {
      out.write(u32b(0), 0, 4); out.write(u32b(0), 0, 4)
      out.write(u64b(nOld + k), 0, 8)
      out.write(u64b(ct.size.toLong), 0, 8)
    }
    if (nLeavesA > 1) {
      out.write("TREE".getBytes); out.write(Array[Byte](1, 1))
      out.write(u16b(nLeavesA), 0, 2)
      out.write(u64b(Undef), 0, 8); out.write(u64b(Undef), 0, 8)
      groupsA.zipWithIndex.foreach { case (g, i) =>
        val (o, (sz, mask, _)) = g.head
        keyA(o, sz, mask)
        out.write(u64b(leafAddrsA(i)), 0, 8)
      }
      endKeyA()
    }
    groupsA.zipWithIndex.foreach { case (g, i) =>
      require(pos == leafAddrsA(i), s"append B-tree layout drift at leaf $i")
      out.write("TREE".getBytes); out.write(Array[Byte](1, 0))
      out.write(u16b(g.length), 0, 2)
      out.write(u64b(if (i == 0) Undef else leafAddrsA(i - 1)), 0, 8)
      out.write(u64b(if (i == nLeavesA - 1) Undef else leafAddrsA(i + 1)), 0, 8)
      g.foreach { case (o, (sz, mask, addr)) =>
        keyA(o, sz, mask)
        out.write(u64b(addr), 0, 8)
      }
      if (i == nLeavesA - 1) endKeyA()
      else { val (o, (sz, mask, _)) = groupsA(i + 1).head; keyA(o, sz, mask) }
    }

    // fixed-width in-place patches: dataspace dims[0], layout B-tree
    // address, superblock EOF
    val patched = out.toByteArray
    def patch(at: Long, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, patched, at.toInt, bytes.length)
    val offs = v1MessageOffsets(src, ohAddr)
    val dsOff = offs.find(_._1 == 0x0001).getOrElse(
      throw new IllegalStateException(s"$varName: no dataspace message"))._2
    require((patched(dsOff.toInt) & 0xff) == 1 && (patched(dsOff.toInt + 2) & 0xff) == 0,
      s"$varName: append patches v1 dataspaces without maxdims " +
        s"(version ${patched(dsOff.toInt)}, flags ${patched(dsOff.toInt + 2)})")
    patch(dsOff + 8, u64b(nOld + k))
    val loOff = offs.find(_._1 == 0x0008).getOrElse(
      throw new IllegalStateException(s"$varName: no layout message"))._2
    require((patched(loOff.toInt) & 0xff) == 3 && (patched(loOff.toInt + 1) & 0xff) == 2,
      s"$varName: append patches v3 chunked layout messages only")
    patch(loOff + 2 + 1, u64b(btAddr2)) // version, class, rank, then address
    patch(40L, u64b(patched.length.toLong)) // superblock v0 EOF
    patched
  }

  def assemble(vars: Seq[WriteVar], denseRoot: Boolean = false): Array[Byte] = {
    require(vars.nonEmpty && vars.map(_.name).distinct.size == vars.size)
    val sorted = vars.sortBy(_.name) // symbol tables are name-ordered
    val out = new java.io.ByteArrayOutputStream(1 << 20)
    def pos: Long = out.size().toLong
    def pad8(): Unit = while (out.size() % 8 != 0) out.write(0)
    def u16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def u32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def u64(v: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

    // ── plan the layout: fixed-size prefix, then per-var blocks ──
    // 0    superblock (96)
    // 96   root object header (16 prelude + symtab msg 8+16) = 40
    // 136  local heap header (32) + data segment
    // then B-tree node, SNOD, per-dataset headers + data
    val heapNames = new java.io.ByteArrayOutputStream()
    heapNames.write(new Array[Byte](8), 0, 8) // offset 0 reserved
    val nameOffsets = sorted.map { v =>
      val off = heapNames.size().toLong
      val b = v.name.getBytes("UTF-8")
      heapNames.write(b, 0, b.length)
      heapNames.write(0)
      off
    }
    while (heapNames.size() % 8 != 0) heapNames.write(0)
    val heapSeg = heapNames.toByteArray

    val sbAddr = 0L
    val rootOhAddr = 96L
    val heapHdrAddr = 136L
    val heapDataAddr = heapHdrAddr + 32
    val btreeAddr = heapDataAddr + heapSeg.length
    val btreeSize = 24 + 8 * (2 * 4 + 1) + 8 * (2 * 4) // full k=4 group node
    val snodAddr = btreeAddr + btreeSize
    val snodSize = 8 + 40 * math.max(8, sorted.size) // 2×symLeafK slots min
    // dense-root alternative prefix: root OH (Link Info) → fractal heap of
    // link messages → v2 B-tree name index; link message = ver+flags+len(3)
    // + name + OH address(8), heap IDs are 8 bytes, records hash(4)+ID(8)
    val linkBodySizes = sorted.map(v => 3 + v.name.getBytes("UTF-8").length + 8)
    val linkHeapAddr = 96L + 48 // root OH: 16 prelude + (8 + 24) Link Info
    val linkBtAddr = linkHeapAddr + heapTotal(linkBodySizes)
    val linkRecSize = 4 + 8
    var cursor =
      if (denseRoot) linkBtAddr + btreeTotal(sorted.size, linkRecSize)
      else snodAddr + snodSize

    // per-var: object header → [chunk index] → data
    final case class Plan(v: WriteVar, ohAddr: Long, dataAddr: Long,
        btAddr: Long, chunks: Seq[(Seq[Long], Array[Byte])],
        attrHeapAddr: Long = Undef, gcolAddr: Long = Undef)
    /** szip write parameters for a chunk grid: NN + EC over LE samples,
      * 16-pixel blocks, scanline = the fastest chunk dim (clamped). */
    def szipClientFor(cd: Seq[Int], elemSize: Int): Seq[Int] = {
      require(elemSize <= 4,
        s"szip write supports <=32-bit samples (got $elemSize-byte) — " +
          "pack to i16 first (PackedGridData)")
      val ppb = 16
      // clamp to szlib's SZ_MAX_PIXELS_PER_SCANLINE (2048), snapping the
      // clamped value to a pixels_per_block multiple exactly as
      // H5Z_set_local does — scanlines above 2048 round-trip through THIS
      // codec but real szip-linked readers (h5py/netCDF-4) reject them
      val pps = if (cd.last > 2048) 2048 / ppb * ppb
        else math.max(ppb, cd.last)
      Seq(Szip.NnMask | Szip.EcMask | Szip.LsbMask | Szip.AllowK13Mask,
        elemSize * 8, ppb, pps)
    }
    def shuffleDeflate(raw: Array[Byte], level: Int,
        compressor: String = "deflate", es: Int = 8): Array[Byte] = {
      val chunkN = raw.length / es
      val shuffled = new Array[Byte](raw.length)
      var b = 0
      while (b < es) {
        var j = 0
        while (j < chunkN) { shuffled(b * chunkN + j) = raw(j * es + b); j += 1 }
        b += 1
      }
      compressor match {
        case "deflate" =>
          val defl = new Deflater(level)
          defl.setInput(shuffled); defl.finish()
          val cbuf = new java.io.ByteArrayOutputStream(raw.length)
          val tmp = new Array[Byte](65536)
          while (!defl.finished()) cbuf.write(tmp, 0, defl.deflate(tmp))
          defl.end()
          cbuf.toByteArray
        case "zstd" => com.github.luben.zstd.Zstd.compress(shuffled, level)
        case o => throw new IllegalArgumentException(s"compressor $o (deflate/zstd)")
      }
    }
    // Fixed Array geometry (client 1, entry = addr 8 + size 8 + mask 4)
    val faEntry = 20
    def faPageBits(v4: String, n: Int): Int =
      if (v4 == "fa-paged") 2
      else { var pb = 4; while ((1 << pb) < n) pb += 1; pb }
    def fadbSize(pageBits: Int, n: Int): Int = {
      val pageElems = 1 << pageBits
      if (n <= pageElems) 14 + n * faEntry + 4
      else {
        val nPages = (n + pageElems - 1) / pageElems
        14 + (nPages + 7) / 8 + 4 +
          (0 until nPages).map(p => math.min(pageElems, n - p * pageElems) * faEntry + 4).sum
      }
    }
    // Extensible Array geometry (client 1, element = addr 8 + size 8 + mask
    // 4). "ea" keeps data-block addressing inside the index block for up to
    // 64 chunks; "ea-sblk" shrinks supMinPtrs to 2 so tests past 16 chunks
    // exercise the super-block indirection too; "ea-paged" also shrinks the
    // page size to 4 elements so data blocks past the first super-block
    // generation split into pages.
    final case class EaGeom(supMinPtrs: Int, n: Int, pageBits: Int = 10) {
      val elemSize = 20; val maxBits = 32; val idxBlkElmts = 4
      val minElmts = 4
      val arrOffSize: Int = (maxBits + 7) / 8
      private def log2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)
      val nsblks: Int = 1 + (maxBits - log2(minElmts))
      def ndblksOf(u: Int): Int = 1 << (u / 2)
      def dblkNelmtsOf(u: Int): Int = (1 << ((u + 1) / 2)) * minElmts
      val startIdx: Array[Long] = new Array[Long](nsblks)
      val startDblk: Array[Long] = new Array[Long](nsblks)
      locally { var si = 0L; var sd = 0L
        (0 until nsblks).foreach { u =>
          startIdx(u) = si; startDblk(u) = sd
          si += ndblksOf(u).toLong * dblkNelmtsOf(u); sd += ndblksOf(u) } }
      val nsblksIb: Int = 2 * log2(supMinPtrs)
      val ndblkAddrsIb: Int = (0 until nsblksIb).map(ndblksOf).sum
      val nsblkAddrs: Int = nsblks - nsblksIb
      /** (super block u, dblk index within u) for linear chunk k ≥ idxBlkElmts. */
      def locate(k: Int): (Int, Int, Int) = {
        val k1 = (k - idxBlkElmts).toLong
        val u = 63 - java.lang.Long.numberOfLeadingZeros(k1 / minElmts + 1)
        val within = k1 - startIdx(u)
        (u, (within / dblkNelmtsOf(u)).toInt, (within % dblkNelmtsOf(u)).toInt)
      }
      /** Data blocks actually used, in emission order. */
      val usedDblks: Seq[(Int, Int)] =
        (idxBlkElmts until n).map(locate).map(t => (t._1, t._2)).distinct.sorted
      val usedSblks: Seq[Int] = usedDblks.map(_._1).filter(_ >= nsblksIb).distinct.sorted
      val iblkSize: Int = 14 + idxBlkElmts * elemSize + (ndblkAddrsIb + nsblkAddrs) * 8 + 4
      val pageElems: Int = 1 << pageBits
      def paged(u: Int): Boolean = dblkNelmtsOf(u) > pageElems
      def dblkSize(u: Int): Int = {
        val dn = dblkNelmtsOf(u)
        if (!paged(u)) 14 + arrOffSize + dn * elemSize + 4
        else 14 + arrOffSize + 4 + (dn / pageElems) * (pageElems * elemSize + 4)
      }
      def sblkSize(u: Int): Int = 14 + arrOffSize + ndblksOf(u) * 8 + 4
      val totalSize: Int = 72 + iblkSize + usedDblks.map(t => dblkSize(t._1)).sum +
        usedSblks.map(sblkSize).sum
    }
    def eaGeom(v4: String, n: Int): EaGeom = v4 match {
      case "ea-paged" => EaGeom(2, n, pageBits = 2)
      case "ea-sblk" => EaGeom(2, n)
      case _ => EaGeom(4, n)
    }
    val plans = sorted.map { v =>
      val n = v.dims.map(_.toLong).product
      v.typed match {
        case Some(t) =>
          require(n == t.n, s"${v.name}: shape/data mismatch")
          t match {
            case _: CompoundData => // chunked compounds (PyTables' layout)
              // are supported through the default v1 B-tree index only
              require(v.v4Index.isEmpty,
                s"${v.name}: chunked compounds use the v1 B-tree index")
              require(v.chunkDims.isEmpty || v.dims.length == 1,
                s"${v.name}: chunked compound tables are 1-D")
            case _: PackedGridData => // packed grids chunk like f64 grids
              require(v.v4Index.isEmpty,
                s"${v.name}: chunked packed grids use the v1 B-tree index")
            case _ => require(v.chunkDims.isEmpty && v.v4Index.isEmpty,
              s"${v.name}: typed payloads are contiguous-only")
          }
        case None => require(n == v.values.length, s"${v.name}: shape/data mismatch")
      }
      require(v.v4Index.isEmpty || v.chunkDims.isDefined, s"${v.name}: v4Index needs chunkDims")
      val dtPadLen = v.typed.map(t => (typedDtBody(t).length + 7) / 8 * 8).getOrElse(24)
      val ohAddr = cursor
      val rank1 = v.dims.length + 1
      val filtered = v.chunkDims.isDefined && !v.v4Index.contains("implicit")
      val layoutBody = v.v4Index match {
        case None => if (v.chunkDims.isDefined) 32 else 24
        case Some("single") => 5 + rank1 * 8 + 1 + 12 + 8
        case Some("implicit") => 5 + rank1 * 8 + 1 + 8
        case Some("fa") | Some("fa-paged") => 5 + rank1 * 8 + 1 + 1 + 8
        case Some("ea") | Some("ea-sblk") | Some("ea-paged") => 5 + rank1 * 8 + 1 + 5 + 8
        case Some("bt2") => 5 + rank1 * 8 + 1 + 6 + 8
        case Some(o) => throw new IllegalArgumentException(s"v4Index $o")
      }
      val filterBody =
        if (!filtered) 0
        else if (v.compressor == "szip") 8 + 8 + 16 // one filter, 4 client ints
        else 8 + 16 + 16 // shuffle + deflate/zstd
      val attrBytes =
        if (v.denseAttrs) 8 + 24 // one Attribute Info message
        else v.attrs.map(a => 8 + attrMessage(a._1, a._2).length).sum
      val fillMsgLen = v.fillBytes.map(8 + _.length).getOrElse(8)
      val ohSize = 16 + (8 + 8 + v.dims.length * 8) + (8 + dtPadLen) + (8 + fillMsgLen) +
        (8 + layoutBody) + (if (filterBody > 0) 8 + filterBody else 0) + attrBytes
      cursor += ohSize
      // dense attributes: heap of attribute messages + type-8 name index,
      // placed right after the object header
      val attrHeapAddr =
        if (!v.denseAttrs) Undef
        else {
          val a = cursor
          val bodySizes = v.attrs.map(x => attrMessage(x._1, x._2).length)
          cursor += heapTotal(bodySizes) + btreeTotal(v.attrs.size, 17)
          a
        }
      val base = v.chunkDims match {
        case None =>
          val dataAddr = cursor
          cursor += n * v.typed.map(_.elemSize.toLong).getOrElse(8L)
          val gcolAddr = v.typed match {
            case Some(VlenStrData(vals)) =>
              val a = cursor
              cursor += gcolTotal(vals.map(_.getBytes("UTF-8").length))
              a
            case Some(VlenSeqData(vals)) =>
              val a = cursor
              cursor += gcolTotal(vals.map(_.length * 8))
              a
            case Some(VlenStrSeqData(vals, strSize)) =>
              val a = cursor
              cursor += gcolTotal(vals.map(_.length * strSize))
              a
            case Some(RegionRefData(targets)) =>
              val a = cursor
              cursor += gcolTotal(targets.flatten.map {
                case (_, sel) => 8 + serializeSelection(sel).length
              })
              a
            case _ => Undef
          }
          Plan(v, ohAddr, dataAddr, Undef, Seq.empty, gcolAddr = gcolAddr)
        case Some(cd) =>
          require(cd.length == v.dims.length)
          val elemSize = v.typed.map(_.elemSize).getOrElse(8)
          // enumerate chunk origins (row-major), slice [+ shuffle + deflate]
          def origins(d: Int): Seq[Seq[Long]] =
            if (d == v.dims.length) Seq(Seq.empty)
            else (0L until v.dims(d).toLong by cd(d).toLong)
              .flatMap(o => origins(d + 1).map(o +: _))
          val chunkN = cd.map(_.toLong).product.toInt
          // typed (compound) chunks slice the 1-D record bytes — except
          // packed GRIDS, which gather per cell like the f64 path; f64
          // chunks gather from the row-major value grid
          val typedBytes = v.typed.map(typedDataBytes(_, Undef))
          val gridGather = v.typed.exists(_.isInstanceOf[PackedGridData]) &&
            v.dims.length > 1
          val rawChunks = origins(0).map { org =>
            val raw = typedBytes match {
              case Some(all) if gridGather =>
                val out = new Array[Byte](chunkN * elemSize) // edge pad: zeros
                val idx = new Array[Int](v.dims.length)
                var i = 0
                while (i < chunkN) {
                  var rem = i; var d = cd.length - 1
                  while (d >= 0) { idx(d) = rem % cd(d); rem /= cd(d); d -= 1 }
                  if (idx.indices.forall(d => org(d) + idx(d) < v.dims(d))) {
                    var flat = 0L
                    idx.indices.foreach(d => flat = flat * v.dims(d) + org(d) + idx(d))
                    System.arraycopy(all, flat.toInt * elemSize, out, i * elemSize, elemSize)
                  }
                  i += 1
                }
                out
              case Some(all) =>
                // 1-D record table: [org, org+chunkN) zero-padded at the edge
                val start = org.head.toInt * elemSize
                val out = new Array[Byte](chunkN * elemSize)
                val len = math.min(all.length - start, out.length)
                if (len > 0) System.arraycopy(all, start, out, 0, len)
                out
              case None =>
                val buf = new Array[Double](chunkN) // edge chunks stay padded
                val idx = new Array[Int](v.dims.length)
                var i = 0
                while (i < chunkN) {
                  var rem = i; var d = cd.length - 1
                  while (d >= 0) { idx(d) = rem % cd(d); rem /= cd(d); d -= 1 }
                  val inRange = idx.indices.forall(d => org(d) + idx(d) < v.dims(d))
                  if (inRange) {
                    var flat = 0L
                    idx.indices.foreach(d => flat = flat * v.dims(d) + org(d) + idx(d))
                    buf(i) = v.values(flat.toInt)
                  } else buf(i) = Double.NaN
                  i += 1
                }
                val bytes = ByteBuffer.allocate(chunkN * 8).order(ByteOrder.LITTLE_ENDIAN)
                buf.foreach(bytes.putDouble)
                bytes.array()
            }
            (org, raw)
          }
          // HDF5 writers legitimately elide never-written/all-default
          // chunks from the index — opt in to exercise readers against it
          val kept =
            if (v.elideDefaultChunks) rawChunks.filter(_._2.exists(_ != 0))
            else rawChunks
          // shuffle (record/element size) then deflate/zstd — netCDF-4's
          // default — or headerless szip, which models samples itself (no
          // shuffle); skipped when the index type forbids filters (implicit)
          val szipClient =
            if (v.compressor == "szip") szipClientFor(cd, elemSize) else Seq.empty
          val chunks = kept.map { case (org, raw) =>
            (org, if (!filtered) raw
            else if (v.compressor == "szip") {
              // H5Z__filter_szip stores the uncompressed byte count ahead of
              // the Rice stream (UINT32ENCODE, little-endian)
              val body = Szip.compress(raw, szipClient)
              val out = new Array[Byte](body.length + 4)
              out(0) = raw.length.toByte
              out(1) = (raw.length >>> 8).toByte
              out(2) = (raw.length >>> 16).toByte
              out(3) = (raw.length >>> 24).toByte
              System.arraycopy(body, 0, out, 4, body.length)
              out
            } else shuffleDeflate(raw, v.deflateLevel, v.compressor, elemSize))
          }
          v.v4Index match {
            case None =>
              val btAddr = cursor
              val keySize = 8 + (v.dims.length + 1) * 8
              def nodeSize(n: Int): Long = 24L + n * (keySize + 8) + keySize
              // ≤64 chunks fit one leaf (libhdf5's 2×K bound at the v0
              // superblock's implied K=32); beyond that a LEVEL-1 root
              // points at ≤64 leaves of ≤64 entries — 4096 chunks max
              val nLeaves = (chunks.size + 63) / 64
              if (nLeaves <= 1) cursor += nodeSize(chunks.size)
              else {
                cursor += nodeSize(nLeaves)
                var rest = chunks.size
                while (rest > 0) { cursor += nodeSize(math.min(64, rest)); rest -= 64 }
              }
              chunks.foreach { case (_, bytes) => cursor += bytes.length }
              Plan(v, ohAddr, Undef, btAddr, chunks)
            case Some("single") =>
              require(chunks.size == 1, s"${v.name}: single-chunk index needs one chunk")
              val dataAddr = cursor
              cursor += chunks.head._2.length
              Plan(v, ohAddr, dataAddr, Undef, chunks)
            case Some("implicit") =>
              val dataAddr = cursor
              chunks.foreach { case (_, bytes) => cursor += bytes.length }
              Plan(v, ohAddr, dataAddr, Undef, chunks)
            case Some(v4 @ ("fa" | "fa-paged")) =>
              val faAddr = cursor
              cursor += 28 + fadbSize(faPageBits(v4, chunks.size), chunks.size)
              chunks.foreach { case (_, bytes) => cursor += bytes.length }
              Plan(v, ohAddr, Undef, faAddr, chunks)
            case Some(v4 @ ("ea" | "ea-sblk" | "ea-paged")) =>
              val eaAddr = cursor
              cursor += eaGeom(v4, chunks.size).totalSize
              chunks.foreach { case (_, bytes) => cursor += bytes.length }
              Plan(v, ohAddr, Undef, eaAddr, chunks)
            case Some("bt2") =>
              val btAddr = cursor
              val (recSize, _) = bt2ChunkGeom(chunks.size, v.dims.length, chunkN * 8L)
              cursor += 38 + 10 + chunks.size.toLong * recSize
              chunks.foreach { case (_, bytes) => cursor += bytes.length }
              Plan(v, ohAddr, Undef, btAddr, chunks)
            case Some(o) => throw new IllegalArgumentException(s"v4Index $o")
          }
      }
      base.copy(attrHeapAddr = attrHeapAddr)
    }

    // ── emit ──
    // superblock v0
    out.write(Signature)
    out.write(Array[Byte](0, 0, 0, 0, 0, 8, 8, 0)) // versions + sizes
    out.write(u16(4)); out.write(u16(16)) // group leaf / internal k
    out.write(u32(0)) // consistency flags
    out.write(u64(0)); out.write(u64(Undef)) // base, free-space
    val eofPatch = out.size() // EOF address patched at the end
    out.write(u64(0))
    out.write(u64(Undef)) // driver info
    if (denseRoot) {
      // root symbol table entry — nothing cached (the OH carries Link Info)
      out.write(u64(0)); out.write(u64(rootOhAddr)); out.write(u32(0)); out.write(u32(0))
      out.write(u64(0)); out.write(u64(0))
      require(pos == rootOhAddr)
      // root object header v1: one Link Info message → dense link storage
      out.write(Array[Byte](1, 0)); out.write(u16(1)); out.write(u32(1))
      out.write(u32(8 + 24)); out.write(u32(0))
      out.write(u16(0x0002)); out.write(u16(24)); out.write(u32(0))
      out.write(Array[Byte](0, 0)) // version, flags (no creation-order index)
      out.write(u64(linkHeapAddr)); out.write(u64(linkBtAddr))
      out.write(new Array[Byte](6), 0, 6) // pad to the declared body size
      require(pos == linkHeapAddr)
      val linkBodies = plans.map { p =>
        val nb = p.v.name.getBytes("UTF-8")
        require(nb.length < 256, s"${p.v.name}: name too long for a 1-byte length link")
        val lb = ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
        lb.put(1.toByte).put(0.toByte).put(nb.length.toByte).put(nb).putLong(p.ohAddr)
        lb.array()
      }
      val (heapBytes, ids) = buildFractalHeap(linkHeapAddr, linkBodies)
      out.write(heapBytes, 0, heapBytes.length)
      require(pos == linkBtAddr)
      val records = plans.zip(ids).map { case (p, id) =>
        val r = ByteBuffer.allocate(linkRecSize).order(ByteOrder.LITTLE_ENDIAN)
        r.putInt(lookup3(p.v.name.getBytes("UTF-8"))).put(id)
        r.array()
      }.sortBy(r => le(r).getInt(0) & 0xffffffffL) // name index is hash-ordered
      val btBytes = buildBtreeV2Leaf(linkBtAddr, 5, linkRecSize, records)
      out.write(btBytes, 0, btBytes.length)
    } else {
    // root symbol table entry
    out.write(u64(0)); out.write(u64(rootOhAddr)); out.write(u32(1)); out.write(u32(0))
    out.write(u64(btreeAddr)); out.write(u64(heapDataAddr - 32)) // scratch: btree+heap
    require(pos == rootOhAddr)
    // root object header v1: 1 message (symbol table)
    out.write(Array[Byte](1, 0)); out.write(u16(1)); out.write(u32(1))
    out.write(u32(8 + 16)); out.write(u32(0)) // header size, alignment pad
    out.write(u16(0x0011)); out.write(u16(16)); out.write(u32(0))
    out.write(u64(btreeAddr)); out.write(u64(heapDataAddr - 32))
    require(pos == heapHdrAddr)
    // local heap
    out.write("HEAP".getBytes); out.write(Array[Byte](0, 0, 0, 0))
    out.write(u64(heapSeg.length.toLong)); out.write(u64(Undef)); out.write(u64(heapDataAddr))
    out.write(heapSeg)
    require(pos == btreeAddr)
    // group B-tree: single leaf pointing at the one SNOD
    out.write("TREE".getBytes); out.write(Array[Byte](0, 0)); out.write(u16(1))
    out.write(u64(Undef)); out.write(u64(Undef))
    out.write(u64(0)) // key 0: before first name
    out.write(u64(snodAddr))
    out.write(u64(nameOffsets.last)) // key 1: last name in the node
    out.write(new Array[Byte](btreeSize - 24 - 24), 0, btreeSize - 24 - 24)
    require(pos == snodAddr)
    // SNOD
    out.write("SNOD".getBytes); out.write(Array[Byte](1, 0)); out.write(u16(sorted.size))
    plans.zip(nameOffsets).foreach { case (p, nameOff) =>
      out.write(u64(nameOff)); out.write(u64(p.ohAddr))
      out.write(u32(0)); out.write(u32(0)); out.write(new Array[Byte](16), 0, 16)
    }
    out.write(new Array[Byte]((snodAddr + snodSize - pos).toInt), 0,
      (snodAddr + snodSize - pos).toInt)
    }

    plans.foreach { p =>
      require(pos == p.ohAddr, s"layout drift at ${p.v.name}: $pos != ${p.ohAddr}")
      val v = p.v
      val chunked = v.chunkDims.isDefined
      val msgs = Seq.newBuilder[(Int, Array[Byte])]
      // dataspace v1
      val ds = ByteBuffer.allocate(8 + v.dims.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      ds.put(1.toByte).put(v.dims.length.toByte).put(0.toByte).put(0.toByte).putInt(0)
      v.dims.foreach(d => ds.putLong(d.toLong))
      msgs += 0x0001 -> ds.array()
      // datatype: IEEE f64 LE (class 1 v1; 12-byte properties, padded to
      // 24), or the typed payload's own message body
      msgs += 0x0003 -> (v.typed match {
        case Some(t) =>
          val dt = typedDtBody(t)
          java.util.Arrays.copyOf(dt, (dt.length + 7) / 8 * 8)
        case None => java.util.Arrays.copyOf(f64TypeBody, 24)
      })
      // fill value v2, undefined
      msgs += 0x0005 -> (v.fillBytes match {
        case Some(fb) => // fill value v2, DEFINED: size + raw value bytes
          val b = ByteBuffer.allocate(8 + fb.length).order(ByteOrder.LITTLE_ENDIAN)
          b.put(2.toByte).put(2.toByte).put(2.toByte).put(1.toByte)
          b.putInt(fb.length).put(fb)
          b.array()
        case None => Array[Byte](2, 2, 0, 0, 0, 0, 0, 0) // undefined
      })
      // layout message: v3 (default) or v4 (typed chunk index)
      val filtered = chunked && !v.v4Index.contains("implicit")
      if (!chunked) {
        val lb = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        lb.put(3.toByte).put(1.toByte).putLong(p.dataAddr)
        lb.putLong(v.dims.map(_.toLong).product * v.typed.map(_.elemSize.toLong).getOrElse(8L))
        msgs += 0x0008 -> lb.array()
      } else if (v.v4Index.isEmpty) {
        val cd = v.chunkDims.get
        val es = v.typed.map(_.elemSize).getOrElse(8)
        val lb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
        lb.put(3.toByte).put(2.toByte).put((cd.length + 1).toByte).putLong(p.btAddr)
        cd.foreach(lb.putInt); lb.putInt(es) // element-size pseudo-dim
        msgs += 0x0008 -> lb.array()
      } else {
        val cd = v.chunkDims.get
        val v4 = v.v4Index.get
        val rank1 = v.dims.length + 1
        val specific = v4 match {
          case "single" => 12
          case "implicit" => 0
          case "ea" | "ea-sblk" | "ea-paged" => 5
          case "bt2" => 6
          case _ => 1
        }
        val lb = ByteBuffer.allocate(5 + rank1 * 8 + 1 + specific + 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        val flags = if (v4 == "single") 0x02 else 0x00 // single chunk is filtered
        lb.put(4.toByte).put(2.toByte).put(flags.toByte).put(rank1.toByte).put(8.toByte)
        cd.foreach(d => lb.putLong(d.toLong)); lb.putLong(8L) // element-size pseudo-dim
        v4 match {
          case "single" =>
            lb.put(1.toByte)
            lb.putLong(p.chunks.head._2.length.toLong).putInt(0) // size + filter mask
            lb.putLong(p.dataAddr)
          case "implicit" =>
            lb.put(2.toByte).putLong(p.dataAddr)
          case "ea" | "ea-sblk" | "ea-paged" =>
            val g = eaGeom(v4, p.chunks.size)
            lb.put(4.toByte)
            lb.put(g.maxBits.toByte).put(g.idxBlkElmts.toByte)
              .put(g.supMinPtrs.toByte).put(g.minElmts.toByte).put(g.pageBits.toByte)
            lb.putLong(p.btAddr)
          case "bt2" =>
            val chunkN = cd.map(_.toLong).product
            val (_, nodeSize) = bt2ChunkGeom(p.chunks.size, v.dims.length, chunkN * 8)
            lb.put(5.toByte).putInt(nodeSize).put(100.toByte).put(40.toByte)
            lb.putLong(p.btAddr)
          case _ =>
            lb.put(3.toByte).put(faPageBits(v4, p.chunks.size).toByte).putLong(p.btAddr)
        }
        msgs += 0x0008 -> lb.array()
      }
      if (filtered) {
        val es = v.typed.map(_.elemSize).getOrElse(8)
        if (v.compressor == "szip") {
          // filter pipeline v1: szip(4) alone — it models samples itself
          val cv = szipClientFor(v.chunkDims.get, es)
          val pad = if (cv.length % 2 == 1) 4 else 0 // v1 pads odd counts
          val fp = ByteBuffer.allocate(8 + 8 + cv.length * 4 + pad)
            .order(ByteOrder.LITTLE_ENDIAN)
          fp.put(1.toByte).put(1.toByte).putShort(0).putInt(0)
          fp.putShort(4).putShort(0).putShort(0).putShort(cv.length.toShort)
          cv.foreach(fp.putInt)
          msgs += 0x000B -> fp.array()
        } else {
          // filter pipeline v1: shuffle(2) then deflate(1) or zstd(32015)
          val compId = v.compressor match {
            case "deflate" => 1
            case "zstd" => 32015
            case o => throw new IllegalArgumentException(s"compressor $o")
          }
          val fp = ByteBuffer.allocate(8 + 16 + 16).order(ByteOrder.LITTLE_ENDIAN)
          fp.put(1.toByte).put(2.toByte).putShort(0).putInt(0)
          fp.putShort(2).putShort(0).putShort(0).putShort(1).putInt(es).putInt(0) // shuffle
          fp.putShort(compId.toShort).putShort(0).putShort(0).putShort(1)
            .putInt(v.deflateLevel).putInt(0)
          msgs += 0x000B -> fp.array()
        }
      }
      if (v.denseAttrs) {
        // Attribute Info → heap + name index emitted right after this OH
        val bodySizes = v.attrs.map(a => attrMessage(a._1, a._2).length)
        val ab = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        ab.put(0.toByte).put(0.toByte)
        ab.putLong(p.attrHeapAddr).putLong(p.attrHeapAddr + heapTotal(bodySizes))
        msgs += 0x0015 -> ab.array()
      } else v.attrs.foreach { case (an, av) => msgs += 0x000C -> attrMessage(an, av) }
      val ms = msgs.result()
      val bodyBytes = ms.map(m => 8 + m._2.length).sum
      out.write(Array[Byte](1, 0)); out.write(u16(ms.size)); out.write(u32(1))
      out.write(u32(bodyBytes)); out.write(u32(0))
      ms.foreach { case (typ, body) =>
        out.write(u16(typ)); out.write(u16(body.length)); out.write(u32(0))
        out.write(body)
      }
      if (v.denseAttrs) {
        require(pos == p.attrHeapAddr, s"attr heap drift at ${v.name}")
        val bodies = v.attrs.map(a => attrMessage(a._1, a._2))
        val (heapBytes, ids) = buildFractalHeap(p.attrHeapAddr, bodies)
        out.write(heapBytes, 0, heapBytes.length)
        // type-8 record: heap ID (8) + message flags (1) + order (4) + hash (4)
        val records = v.attrs.zip(ids).zipWithIndex.map { case (((an, _), id), i) =>
          val r = ByteBuffer.allocate(17).order(ByteOrder.LITTLE_ENDIAN)
          r.put(id).put(0.toByte).putInt(i).putInt(lookup3(an.getBytes("UTF-8")))
          r.array()
        }.sortBy(r => le(r).getInt(13) & 0xffffffffL)
        val btBytes = buildBtreeV2Leaf(p.attrHeapAddr + heapBytes.length, 8, 17, records)
        out.write(btBytes, 0, btBytes.length)
      }
      if (!chunked) {
        require(pos == p.dataAddr)
        v.typed match {
          case Some(rd: RefData) =>
            out.write(refDataBytes(rd, name => plans.find(_.v.name == name)
              .getOrElse(throw new IllegalArgumentException(
                s"${v.name}: reference target '$name' is not a dataset in this file"))
              .ohAddr))
          case Some(t) =>
            out.write(typedDataBytes(t, p.gcolAddr))
            t match {
              case VlenStrData(vals) =>
                require(pos == p.gcolAddr, s"gcol drift at ${v.name}")
                out.write(buildGcol(vals.map(_.getBytes("UTF-8"))))
              case VlenSeqData(vals) =>
                require(pos == p.gcolAddr, s"gcol drift at ${v.name}")
                out.write(buildGcol(vals.map { a =>
                  val bb = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
                  a.foreach(bb.putDouble)
                  bb.array()
                }))
              case VlenStrSeqData(vals, strSize) =>
                require(pos == p.gcolAddr, s"gcol drift at ${v.name}")
                out.write(buildGcol(vals.map { seq =>
                  val cells = new Array[Byte](seq.length * strSize)
                  seq.zipWithIndex.foreach { case (str, k) =>
                    val sb = str.getBytes("UTF-8")
                    System.arraycopy(sb, 0, cells, k * strSize,
                      math.min(sb.length, strSize))
                  }
                  cells
                }))
              case RegionRefData(targets) =>
                require(pos == p.gcolAddr, s"gcol drift at ${v.name}")
                out.write(buildGcol(targets.flatten.map { case (name, sel) =>
                  val ohA = plans.find(_.v.name == name)
                    .getOrElse(throw new IllegalArgumentException(
                      s"${v.name}: region-reference target '$name' is not a " +
                        "dataset in this file")).ohAddr
                  val sb = serializeSelection(sel)
                  val o = ByteBuffer.allocate(8 + sb.length)
                    .order(ByteOrder.LITTLE_ENDIAN)
                  o.putLong(ohA).put(sb)
                  o.array()
                }))
              case _ => ()
            }
          case None =>
            val bb = ByteBuffer.allocate(v.values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
            v.values.foreach(bb.putDouble)
            out.write(bb.array())
        }
      } else v.v4Index match {
        case None =>
          require(pos == p.btAddr)
          val keySize = 8 + (v.dims.length + 1) * 8
          def nodeSize(n: Int): Long = 24L + n * (keySize + 8) + keySize
          // libhdf5 interop bound: a v1 B-tree node holds at most 2×K
          // entries, and the v0 superblock this writer emits carries no
          // indexed-storage-K field so h5py/PyTables assume K=32. ≤64
          // chunks emit the classic single leaf; past that a LEVEL-1 root
          // points at ≤64 leaves of ≤64 entries each — the layout libhdf5
          // itself grows into. Past 4096 chunks stays a named error.
          // ALL chunks elided (elideDefaultChunks over all-default data)
          // still emits one valid 0-entry leaf — the empty index readers
          // resolve to all-fill — matching the nodeSize(0) the planner
          // reserved
          val groups =
            if (p.chunks.isEmpty) Seq(Seq.empty[(Seq[Long], Array[Byte])])
            else p.chunks.grouped(64).toSeq
          val nLeaves = groups.length
          require(nLeaves <= 64,
            s"${v.name}: ${p.chunks.size} chunks exceed the 4096-entry " +
              "two-level v1 chunk B-tree this writer emits (64×64 at " +
              "libhdf5's K=32 default) — use larger chunks (chunkRows/timeChunk)")
          val leafAddrs =
            if (nLeaves == 1) Seq(p.btAddr)
            else {
              var a = p.btAddr + nodeSize(nLeaves)
              groups.map { g => val r = a; a += nodeSize(g.length); r }
            }
          var dataAddr = leafAddrs.last + nodeSize(groups.last.length)
          val chunkAddrs = p.chunks.map { case (_, bytes) =>
            val a = dataAddr; dataAddr += bytes.length; a
          }
          // a chunk ENTRY key: that chunk's stored size + origin (+ the
          // trailing 0 pseudo-dim); keys BETWEEN nodes are the right
          // neighbor's first key, exactly as libhdf5 splits them
          def writeKey(org: Seq[Long], bytes: Array[Byte]): Unit = {
            out.write(u32(bytes.length)); out.write(u32(0))
            org.foreach(o => out.write(u64(o))); out.write(u64(0))
          }
          // final key: one past the last chunk in every dimension
          def writeEndKey(): Unit = {
            out.write(u32(0)); out.write(u32(0))
            v.dims.indices.foreach(d => out.write(u64(v.dims(d).toLong)))
            out.write(u64(v.typed.map(_.elemSize.toLong).getOrElse(8L)))
          }
          if (nLeaves > 1) {
            out.write("TREE".getBytes); out.write(Array[Byte](1, 1)); out.write(u16(nLeaves))
            out.write(u64(Undef)); out.write(u64(Undef))
            groups.zipWithIndex.foreach { case (g, i) =>
              writeKey(g.head._1, g.head._2)
              out.write(u64(leafAddrs(i)))
            }
            writeEndKey()
          }
          var ci = 0
          groups.zipWithIndex.foreach { case (g, i) =>
            require(pos == leafAddrs(i))
            out.write("TREE".getBytes); out.write(Array[Byte](1, 0)); out.write(u16(g.length))
            out.write(u64(if (i == 0) Undef else leafAddrs(i - 1)))
            out.write(u64(if (i == nLeaves - 1) Undef else leafAddrs(i + 1)))
            g.foreach { case (org, bytes) =>
              writeKey(org, bytes)
              out.write(u64(chunkAddrs(ci))); ci += 1
            }
            if (i == nLeaves - 1) writeEndKey()
            else writeKey(groups(i + 1).head._1, groups(i + 1).head._2)
          }
          p.chunks.foreach { case (_, bytes) => out.write(bytes, 0, bytes.length) }
        case Some("single") | Some("implicit") =>
          require(pos == p.dataAddr)
          p.chunks.foreach { case (_, bytes) => out.write(bytes, 0, bytes.length) }
        case Some(v4 @ ("ea" | "ea-sblk" | "ea-paged")) =>
          // Extensible Array: EAHD, EAIB, data blocks, super blocks, chunks
          require(pos == p.btAddr)
          val g = eaGeom(v4, p.chunks.size)
          val n = p.chunks.size
          val iblkAddr = p.btAddr + 72
          // block addresses, in emission order after the index block
          var a = iblkAddr + g.iblkSize
          val dblkAddr = g.usedDblks.map { t => val r = t -> a; a += g.dblkSize(t._1); r }.toMap
          val sblkAddr = g.usedSblks.map { u => val r = u -> a; a += g.sblkSize(u); r }.toMap
          require(a == p.btAddr + g.totalSize)
          var dataAddr = a
          val chunkLoc = p.chunks.map { case (_, bytes) =>
            val r = (dataAddr, bytes.length); dataAddr += bytes.length; r
          }
          def elem(k: Int): Array[Byte] = {
            val eb = ByteBuffer.allocate(g.elemSize).order(ByteOrder.LITTLE_ENDIAN)
            if (k < n) eb.putLong(chunkLoc(k)._1).putLong(chunkLoc(k)._2.toLong).putInt(0)
            else { (0 until g.elemSize).foreach(_ => eb.put(0xff.toByte)) }
            eb.array()
          }
          // EAHD: params, stats, index-block address
          out.write("EAHD".getBytes)
          out.write(Array[Byte](0, 1)) // version, client 1 (filtered chunks)
          out.write(Array[Byte](g.elemSize.toByte, g.maxBits.toByte, g.idxBlkElmts.toByte,
            g.minElmts.toByte, g.supMinPtrs.toByte, g.pageBits.toByte))
          out.write(u64(g.usedSblks.size.toLong))
          out.write(u64(g.usedSblks.map(g.sblkSize(_).toLong).sum))
          out.write(u64(g.usedDblks.size.toLong))
          out.write(u64(g.usedDblks.map(t => g.dblkSize(t._1).toLong).sum))
          out.write(u64(math.max(0L, n.toLong - 1))); out.write(u64(n.toLong))
          out.write(u64(iblkAddr)); out.write(u32(0)) // checksum unverified
          // EAIB: inline elements, direct data-block addrs, super-block addrs
          require(pos == iblkAddr)
          out.write("EAIB".getBytes); out.write(Array[Byte](0, 1))
          out.write(u64(p.btAddr))
          (0 until g.idxBlkElmts).foreach(k => out.write(elem(k)))
          (0 until g.nsblksIb).foreach { u =>
            (0 until g.ndblksOf(u)).foreach { di =>
              out.write(u64(dblkAddr.getOrElse((u, di), Undef)))
            }
          }
          (g.nsblksIb until g.nsblks).foreach(u => out.write(u64(sblkAddr.getOrElse(u, Undef))))
          out.write(u32(0))
          // EADB data blocks
          g.usedDblks.foreach { case (u, di) =>
            require(pos == dblkAddr((u, di)))
            out.write("EADB".getBytes); out.write(Array[Byte](0, 1))
            out.write(u64(p.btAddr))
            out.write(u32((g.idxBlkElmts + g.startIdx(u) + di.toLong * g.dblkNelmtsOf(u)).toInt))
            val base = g.idxBlkElmts + g.startIdx(u).toInt + di * g.dblkNelmtsOf(u)
            if (!g.paged(u)) {
              (0 until g.dblkNelmtsOf(u)).foreach(e => out.write(elem(base + e)))
              out.write(u32(0))
            } else {
              // paged: prefix checksum, then full pages each with a checksum
              out.write(u32(0))
              (0 until g.dblkNelmtsOf(u)).grouped(g.pageElems).foreach { page =>
                page.foreach(e => out.write(elem(base + e)))
                out.write(u32(0))
              }
            }
            require(pos == dblkAddr((u, di)) + g.dblkSize(u))
          }
          // EASB super blocks
          g.usedSblks.foreach { u =>
            require(pos == sblkAddr(u))
            out.write("EASB".getBytes); out.write(Array[Byte](0, 1))
            out.write(u64(p.btAddr))
            out.write(u32((g.idxBlkElmts + g.startIdx(u)).toInt))
            (0 until g.ndblksOf(u)).foreach(di => out.write(u64(dblkAddr.getOrElse((u, di), Undef))))
            out.write(u32(0))
          }
          p.chunks.foreach { case (_, bytes) => out.write(bytes, 0, bytes.length) }
        case Some("bt2") =>
          // v2 B-tree chunk index: BTHD + one leaf of filtered records
          require(pos == p.btAddr)
          val rank = v.dims.length
          val chunkN = v.chunkDims.get.map(_.toLong).product
          val (recSize, _) = bt2ChunkGeom(p.chunks.size, rank, chunkN * 8)
          val szLen = recSize - 12 - rank * 8
          var dataAddr = p.btAddr + 38 + 10 + p.chunks.size.toLong * recSize
          // records sorted by scaled offsets = the row-major chunk order
          val records = p.chunks.map { case (org, bytes) =>
            val r = ByteBuffer.allocate(recSize).order(ByteOrder.LITTLE_ENDIAN)
            r.putLong(dataAddr)
            (0 until szLen).foreach(i => r.put(((bytes.length >> (8 * i)) & 0xff).toByte))
            r.putInt(0) // filter mask
            org.indices.foreach(d => r.putLong(org(d) / v.chunkDims.get(d)))
            dataAddr += bytes.length
            r.array()
          }
          val btBytes = buildBtreeV2Leaf(p.btAddr, 11, recSize, records)
          out.write(btBytes, 0, btBytes.length)
          p.chunks.foreach { case (_, bytes) => out.write(bytes, 0, bytes.length) }
        case Some(v4) =>
          // Fixed Array: FAHD, FADB (paged or not), then the chunk data
          require(pos == p.btAddr)
          val n = p.chunks.size
          val pageBits = faPageBits(v4, n)
          val dblkAddr = p.btAddr + 28
          out.write("FAHD".getBytes)
          out.write(Array[Byte](0, 1)) // version, client 1 (filtered chunks)
          out.write(Array[Byte](faEntry.toByte, pageBits.toByte))
          out.write(u64(n.toLong)); out.write(u64(dblkAddr)); out.write(u32(0))
          require(pos == dblkAddr)
          var dataAddr = dblkAddr + fadbSize(pageBits, n)
          val elements = p.chunks.map { case (_, bytes) =>
            val eb = ByteBuffer.allocate(faEntry).order(ByteOrder.LITTLE_ENDIAN)
            eb.putLong(dataAddr).putLong(bytes.length.toLong).putInt(0)
            dataAddr += bytes.length
            eb.array()
          }
          out.write("FADB".getBytes)
          out.write(Array[Byte](0, 1)) // version, client
          out.write(u64(p.btAddr))
          val pageElems = 1 << pageBits
          if (n <= pageElems) {
            elements.foreach(e => out.write(e, 0, e.length))
            out.write(u32(0)) // checksum (not verified by the reader)
          } else {
            val nPages = (n + pageElems - 1) / pageElems
            val bitmap = new Array[Byte]((nPages + 7) / 8)
            (0 until nPages).foreach(i => bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte)
            out.write(bitmap, 0, bitmap.length)
            out.write(u32(0)) // header-part checksum
            elements.grouped(pageElems).foreach { page =>
              page.foreach(e => out.write(e, 0, e.length))
              out.write(u32(0)) // per-page checksum
            }
          }
          p.chunks.foreach { case (_, bytes) => out.write(bytes, 0, bytes.length) }
      }
    }

    val bytes = out.toByteArray
    val eofBuf = ByteBuffer.wrap(bytes, eofPatch, 8).order(ByteOrder.LITTLE_ENDIAN)
    eofBuf.putLong(bytes.length.toLong)
    bytes
  }
}
