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
    // class 4 (bitfield), v1 header byte 0x14, hand-built message
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x14.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(2)
    b.putShort(0).putShort(16)
    val e = intercept[IllegalArgumentException](Hdf5.parseDatatype(b.array()))
    assert(e.getMessage.contains("class 4") && e.getMessage.contains("bitfield"))
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
}
