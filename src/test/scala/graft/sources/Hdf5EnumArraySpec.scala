package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Datatype classes 8 (enumeration) and 10 (array): netCDF-4 writes enums
  * for CF flag variables (reference entry `xr.open_dataset`,
  * detect.py:409) and PyTables tables carry fixed-shape vector columns.
  * Round-trips go through the writer duals ([[Hdf5.EnumGridData]],
  * [[Hdf5.ArrayCol]]); codes surface as their base integers with the
  * name map as column metadata, vector members as ArrayType columns. */
class Hdf5EnumArraySpec extends SparkSpec {

  private def src(bytes: Array[Byte]): Hdf5.ByteSource =
    (off: Long, len: Int) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)

  private def tmpH5(): String = {
    val f = java.io.File.createTempFile("graft_h5enum", ".h5")
    f.delete()
    f.getAbsolutePath
  }

  private val flagNames = Seq("clear", "cloudy", "ice")
  private val flagCodes = Seq(0L, 1L, 4L)

  test("an enum dataset round-trips: codes as base ints, map in the type") {
    val codes = Array(0, 1, 4, 4, 0, 1)
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("flags", Seq(2, 3), Array.empty,
      typed = Some(Hdf5.EnumGridData(codes, flagNames, flagCodes)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "flags").get._2
    val ds = Hdf5.readDataset(s, "flags", oh)
    val et = ds.dtype.asInstanceOf[Hdf5.EnumType]
    assert(et.names == flagNames && et.values == flagCodes)
    assert(et.base == Hdf5.NumType("int", 4, littleEndian = true))
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    assert(Hdf5.decode(s.read(addr, size.toInt), ds.dtype, 6).toSeq ==
      codes.map(_.toDouble).toSeq)
  }

  test("an enum variable ingests via format(\"netcdf\") with the map as metadata") {
    val path = tmpH5()
    val codes = Array(0, 1, 4, 1, 0, 4, 4, 1) // (time=4, cell=2)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      Hdf5.assemble(Seq(Hdf5.WriteVar("flags", Seq(4, 2), Array.empty,
        typed = Some(Hdf5.EnumGridData(codes, flagNames, flagCodes))))))
    val df = spark.read.format("netcdf").option("var", "flags").load(path)
    val meta = df.schema("value").metadata
    assert(meta.getStringArray("enum_names").toSeq == flagNames)
    assert(meta.getLongArray("enum_values").toSeq == flagCodes)
    val got = df.orderBy("t_idx", "cell")
      .select(col("value").cast("int")).collect().map(_.getInt(0))
    assert(got.toSeq == codes.toSeq,
      "enum cells must decode as their base integer codes")
  }

  test("an array (vector) compound member round-trips through decodeCompound") {
    val n = 3
    val members: Seq[(String, Hdf5.CompoundCol)] = Seq(
      "id" -> Hdf5.I64Col(Array(1L, 2L, 3L)),
      "vec" -> Hdf5.ArrayCol(Seq(
        Array(1.0, 2.0, 3.0, 4.0),
        Array(5.0, 6.0, 7.0, 8.0),
        Array(9.0, 10.0, 11.0, 12.0)), Seq(4)),
      "score" -> Hdf5.F64Col(Array(0.5, 1.5, 2.5)))
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("t", Seq(n), Array.empty,
      typed = Some(Hdf5.CompoundData(members)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "t").get._2
    val ds = Hdf5.readDataset(s, "t", oh)
    val ct = ds.dtype.asInstanceOf[Hdf5.CompoundType]
    assert(ct.members(1).dtype == Hdf5.ArrayMemberType(
      Hdf5.NumType("float", 8, littleEndian = true), Seq(4)))
    assert(ct.size == 8 + 32 + 8)
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val cols = Hdf5.decodeCompound(s.read(addr, size.toInt), ct, n, s).toMap
    val vec = cols("vec").asInstanceOf[Array[Array[Double]]]
    assert(vec.map(_.toSeq).toSeq ==
      Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(5.0, 6.0, 7.0, 8.0), Seq(9.0, 10.0, 11.0, 12.0)))
    assert(cols("score").asInstanceOf[Array[Double]].toSeq == Seq(0.5, 1.5, 2.5))
  }

  test("a vector column reads as ArrayType through format(\"hdf5table\")") {
    val path = tmpH5()
    val members: Seq[(String, Hdf5.CompoundCol)] = Seq(
      "name" -> Hdf5.StrCol(Seq("a", "b"), 4),
      "emb" -> Hdf5.ArrayCol(Seq(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)), Seq(3)))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      Hdf5.assemble(Seq(Hdf5.WriteVar("t", Seq(2), Array.empty,
        typed = Some(Hdf5.CompoundData(members))))))
    val df = spark.read.format("hdf5table").option("var", "t").load(path)
    assert(df.schema("emb").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
    val rows = df.orderBy("name")
      .select(col("name"), aggregate(col("emb"), lit(0.0), (a, x) => a + x).as("s"))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 6.0), ("b", 15.0)))
    // explode keeps per-element order
    val flat = df.select(col("name"), posexplode(col("emb")))
      .orderBy("name", "pos").select("col").collect().map(_.getDouble(0))
    assert(flat.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("a 2-D array member decodes flat C-order") {
    val members: Seq[(String, Hdf5.CompoundCol)] = Seq(
      "m" -> Hdf5.ArrayCol(Seq(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)), Seq(2, 3)))
    val bytes = Hdf5.assemble(Seq(Hdf5.WriteVar("t", Seq(1), Array.empty,
      typed = Some(Hdf5.CompoundData(members)))))
    val s = src(bytes)
    val (rootOh, _) = Hdf5.readSuperblock(s)
    val oh = Hdf5.listDatasets(s, rootOh).find(_._1 == "t").get._2
    val ds = Hdf5.readDataset(s, "t", oh)
    val ct = ds.dtype.asInstanceOf[Hdf5.CompoundType]
    assert(ct.members.head.dtype == Hdf5.ArrayMemberType(
      Hdf5.NumType("float", 8, littleEndian = true), Seq(2, 3)))
    val Hdf5.Contiguous(addr, size) = ds.layout: @unchecked
    val cols = Hdf5.decodeCompound(s.read(addr, size.toInt), ct, 1, s).toMap
    assert(cols("m").asInstanceOf[Array[Array[Double]]].head.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("ArrayType columns write + append as vector members through SQL") {
    import spark.implicits._
    val path = tmpH5()
    val mk = (from: Int, until: Int) => (from until until)
      .map(i => (i.toLong, Seq(i * 1.0, i * 2.0, i * 3.0))).toDF("id", "emb")
    mk(0, 5).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").mode("overwrite").save(path)
    mk(5, 9).write.format("hdf5table").option("var", "t")
      .mode("append").save(path)
    val got = spark.read.format("hdf5table").option("var", "t").load(path)
      .orderBy("id")
      .select(col("id"), col("emb").getItem(2)).collect()
    assert(got.map(r => (r.getDouble(0).toLong, r.getDouble(1))).toSeq ==
      (0 until 9).map(i => (i.toLong, i * 3.0)))
  }

  test("ragged vector cells and shape-mismatched appends fail by name") {
    import spark.implicits._
    val path = tmpH5()
    val e = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0)))
        .toDF("id", "emb").write.format("hdf5table").option("var", "t")
        .mode("overwrite").save(path)
    }
    assert(msgs(e).exists(_.contains("fixed length")), s"got: ${msgs(e)}")
    Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "emb")
      .write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").mode("overwrite").save(path)
    val e2 = intercept[Exception] {
      Seq((2L, Seq(1.0, 2.0))).toDF("id", "emb")
        .write.format("hdf5table").option("var", "t")
        .mode("append").save(path)
    }
    assert(msgs(e2).exists(_.contains("vector shape")), s"got: ${msgs(e2)}")
  }

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("remaining datatype classes stay named errors") {
    // class 2 (time) — dead in practice (no writer emits it); v1 header
    // byte 0x12, hand-built message
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x12.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(4)
    b.putShort(0).putShort(32)
    val e = intercept[IllegalArgumentException](Hdf5.parseDatatype(b.array()))
    assert(e.getMessage.contains("class 2") && e.getMessage.contains("time"))
    // enum over a FLOAT base is rejected by name
    val eb = ByteBuffer.allocate(8 + 20 + 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
    eb.put(0x18.toByte).put(1.toByte).put(0.toByte).put(0.toByte).putInt(8)
    eb.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte).putInt(8)
    eb.putShort(0).putShort(64).put(0.toByte).put(52.toByte).put(0.toByte)
      .put(11.toByte).putInt(1075)
    eb.put("x".getBytes).put(0.toByte)
    val e2 = intercept[IllegalArgumentException](Hdf5.parseDatatype(eb.array()))
    assert(e2.getMessage.contains("fixed-point"), e2.getMessage)
  }

  // ─── classes 4 (bitfield) and 5 (opaque) ──────────────────────────────────

  test("a bitfield datatype parses as its unsigned base integer") {
    // v1 header byte 0x14; property layout identical to fixed-point
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x14.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(2)
    b.putShort(0).putShort(16)
    assert(Hdf5.parseDatatype(b.array()) ==
      Hdf5.NumType("uint", 2, littleEndian = true))
    // exotic widths fail AT PARSE with the construct named, not later in
    // the cell-decode loop
    val b3 = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b3.put(0x14.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(3)
    b3.putShort(0).putShort(24)
    val e = intercept[IllegalArgumentException](Hdf5.parseDatatype(b3.array()))
    assert(e.getMessage.contains("bitfield"), e.getMessage)
  }

  test("a compound with bitfield + opaque members parses and decodes") {
    // hand-built v3 compound (spec grammar, independent of our writer):
    //   "px" OPAQUE size 4, tag "PNG" (tag field 8 B NUL-padded)
    //   "fl" BITFIELD u16 LE
    // record size 6 → v3 member offsets encode in 1 byte
    val dt = ByteBuffer.allocate(8 + (3 + 1 + 16) + (3 + 1 + 12))
      .order(ByteOrder.LITTLE_ENDIAN)
    dt.put(0x36.toByte).put(2.toByte).put(0.toByte).put(0.toByte).putInt(6)
    dt.put("px".getBytes).put(0.toByte).put(0.toByte) // name + NUL, offset 0
    dt.put(0x15.toByte).put(8.toByte).put(0.toByte).put(0.toByte).putInt(4)
    dt.put("PNG".getBytes).put(Array.fill[Byte](5)(0)) // tag, padded to 8
    dt.put("fl".getBytes).put(0.toByte).put(4.toByte) // name + NUL, offset 4
    dt.put(0x14.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(2)
    dt.putShort(0).putShort(16)
    val ct = Hdf5.parseDatatype(
      java.util.Arrays.copyOf(dt.array(), dt.position()))
      .asInstanceOf[Hdf5.CompoundType]
    assert(ct.members.map(_.name) == Seq("px", "fl"))
    assert(ct.members(0).dtype == Hdf5.OpaqueType(4, "PNG"))
    assert(ct.members(1).dtype == Hdf5.NumType("uint", 2, littleEndian = true))
    // two records: opaque bytes pass through raw; bitfield decodes
    // unsigned (0xFFFF must NOT sign-extend)
    val data = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    data.put(Array[Byte](1, 2, 3, 4)).putShort(0xFFFF.toShort)
    data.put(Array[Byte](9, 8, 7, 6)).putShort(5.toShort)
    val cols = Hdf5.decodeCompound(data.array(), ct, 2, src(Array.empty)).toMap
    assert(cols("px").asInstanceOf[Array[Array[Byte]]].map(_.toSeq).toSeq ==
      Seq(Seq[Byte](1, 2, 3, 4), Seq[Byte](9, 8, 7, 6)))
    assert(cols("fl").asInstanceOf[Array[Double]].toSeq == Seq(65535.0, 5.0))
    // hdf5table schema: opaque → BINARY with the tag as metadata
    val schema = Hdf5TableV2.schemaOf(ct)
    assert(schema("px").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(schema("px").metadata.getString("opaque_tag") == "PNG")
    assert(schema("fl").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("a bitfield member reads end-to-end through format(\"hdf5table\")") {
    // write a real compound table with an i64 member, then flip that
    // member's datatype class nibble 0 → 4 in the file: bitfield and
    // fixed-point have IDENTICAL property layouts, so the patched file is
    // exactly what a bitfield-writing producer emits
    import spark.implicits._
    val path = tmpH5()
    Seq((1L, 3.5), (250L, 4.5), (65535L, 5.5)).toDF("bits", "v")
      .write.format("hdf5table").option("var", "t")
      .mode("overwrite").save(path)
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // locate the member: the writer emits v1 compound members (name
    // NUL-padded to ×8 = 8 bytes for "bits", then a 32-byte offset/dim/
    // perm block), so the member datatype header sits 40 bytes after the
    // name start (v1 fixed-point header byte = 0x10)
    val pat = "bits".getBytes :+ 0.toByte
    var at = -1
    for (i <- 0 until raw.length - 48 if at < 0)
      if (pat.indices.forall(j => raw(i + j) == pat(j)) &&
          (raw(i + 40) & 0xff) == 0x10) at = i + 40
    assert(at > 0, "member datatype header not found")
    raw(at) = (raw(at) | 0x04).toByte // class 0 → class 4
    java.nio.file.Files.write(java.nio.file.Paths.get(path), raw)
    // drop the Hadoop local-FS checksum sidecar: the patch bypassed it
    val f = new java.io.File(path)
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    val df = spark.read.format("hdf5table").option("var", "t").load(path)
    assert(df.orderBy("v").select(col("bits").cast("long"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 250L, 65535L),
      "bitfield cells must decode as unsigned base integers")
  }
}
