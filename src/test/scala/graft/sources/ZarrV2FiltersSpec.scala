package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** zarr v2 pre-compression FILTER decode — the two numcodecs filters real
  * v2 archives actually carry: `delta` (consecutive differences; the
  * canonical payload is i8 nanosecond time axes) and `fixedscaleoffset`
  * (quantized floats). Everything else stays a named error. */
class ZarrV2FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zvf").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def put(dir: String, rel: String, bytes: Array[Byte]): Unit =
    ZarrSource.putBytes(fs, new org.apache.hadoop.fs.Path(dir, rel), bytes)

  private def zlib(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("delta filter on an i8 axis decodes by exact integer cumsum") {
    val dir = tmpDir()
    // nanosecond-scale values beyond 2^53 — a double-space cumsum would
    // corrupt the low bits
    val base = 1700000000000000000L
    val vals = (0 until 6).map(i => base + i.toLong * 86400000000000L)
    put(dir, ".zarray",
      """{"zarr_format": 2, "shape": [6], "chunks": [6], "dtype": "<i8",
          "compressor": {"id": "zlib", "level": 1}, "fill_value": 0,
          "order": "C",
          "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i8"}]}""".getBytes)
    val deltas = vals.head +: vals.sliding(2).map(p => p(1) - p(0)).toSeq
    val raw = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    deltas.foreach(raw.putLong)
    put(dir, "0", zlib(raw.array()))
    val (_, back) = ZarrSource.readLocalND(dir)
    assert(back.map(_.toLong).toSeq == vals,
      "i8 delta cumsum must be bit-exact past 2^53")
  }

  test("delta with a narrower astype decodes (i8 values, i4 diffs)") {
    val dir = tmpDir()
    val vals = Seq(1000L, 1010L, 1005L, 1105L)
    put(dir, ".zarray",
      """{"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<i8",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}]}""".getBytes)
    val deltas = vals.head +: vals.sliding(2).map(p => p(1) - p(0)).toSeq
    val raw = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    deltas.foreach(d => raw.putInt(d.toInt))
    put(dir, "0", raw.array())
    val (_, back) = ZarrSource.readLocalND(dir)
    assert(back.map(_.toLong).toSeq == vals)
  }

  test("fixedscaleoffset decodes quantized floats through the DSv2 scan") {
    val dir = tmpDir()
    // x = stored/scale + offset; scale 100, offset 20 → stored i2
    val phys = for (t <- 0 until 2; y <- 0 until 2; x <- 0 until 2)
      yield 20.0 + (t * 4 + y * 2 + x) * 0.25
    put(dir, ".zarray",
      """{"zarr_format": 2, "shape": [2, 2, 2], "chunks": [2, 2, 2],
          "dtype": "<f8", "compressor": null, "fill_value": "NaN",
          "order": "C",
          "filters": [{"id": "fixedscaleoffset", "scale": 100, "offset": 20,
                       "dtype": "<f8", "astype": "<i2"}]}""".getBytes)
    val raw = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    phys.foreach(v => raw.putShort(math.rint((v - 20.0) * 100).toShort))
    put(dir, "0.0.0", raw.array())
    val rows = spark.read.format("zarr").load(dir)
      .orderBy("t_idx", "y", "x").select("value").as[Double].collect()
    assert(rows.toSeq == phys, s"got ${rows.toSeq}")
  }

  test("an unknown filter id still fails by name") {
    val dir = tmpDir()
    put(dir, ".zarray",
      """{"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": [{"id": "bitround", "keepbits": 7}]}""".getBytes)
    val e = intercept[IllegalArgumentException] {
      ZarrSource.readLocalND(dir)
    }
    assert(e.getMessage.contains("bitround"))
  }

  test("appends onto a filtered store fail by name") {
    val dir = tmpDir()
    val cells = (for (t <- 0 until 2; y <- 0 until 2)
      yield (t, y, t * 1.0)).toDF("time_idx", "y_idx", "sst")
    ZarrGroup.writeDataset(cells, dir, Seq("time" -> 2, "y" -> 2),
      Seq(2, 2), Seq("sst"))
    // patch the member to declare a delta filter chain
    val za = scala.io.Source.fromFile(s"$dir/sst/.zarray").mkString
    put(dir, "sst/.zarray", za.replace("\"filters\": null",
      """"filters": [{"id": "delta", "dtype": "<f8"}]""").getBytes)
    fs.delete(new org.apache.hadoop.fs.Path(dir, ".zmetadata"), false)
    val e = intercept[Exception] {
      ZarrGroup.appendDataset(cells, dir, Seq("time" -> 2, "y" -> 2),
        Seq(2, 2), Seq("sst"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("filter")), s"got: ${msgs(e)}")
  }

  test("write3D delta encode round-trips through the DSv2 scan") {
    val dir = tmpDir()
    // DENSE data, chunk-aligned shape: the delta decode is a cumulative
    // sum, so the writer refuses holes (see the NaN test below)
    val in = (for (t <- 0 until 4; y <- 0 until 2; x <- 0 until 3)
      yield (t, y, x, t * 8.0 + y * 4.0 + x * 1.5)).toDF("t_idx", "y", "x", "value")
    ZarrSource.write3D(in, dir, shape = (4, 2, 3), chunks = (2, 2, 3),
      compressor = Some("blosc"), delta = true)
    // metadata declares the filter and parses back
    val meta = ZarrSource.readMetaAny(dir, spark.sparkContext.hadoopConfiguration)
    assert(meta.v2Filters == Seq(ZarrSource.DeltaF("<f8", "<f8")))
    val out = spark.read.format("zarr").load(dir)
    assert(out.count() == 24)
    assert(out.filter(col("value") =!=
      col("t_idx") * 8.0 + col("y") * 4.0 + col("x") * 1.5).count() == 0,
      "delta encode/decode must be the identity")
    // and the stored bytes really ARE differences: cell 1 of chunk 0
    // stores v[1]−v[0] = 1.5, not v[1] = 1.5+0 … pick cell 2: diff 1.5
    val rawEnc = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/0.0.0"))
    val raw = Blosc.decompress(rawEnc)
    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    assert(b.getDouble(0) == 0.0 && b.getDouble(8) == 1.5 && b.getDouble(16) == 1.5,
      "stored cells must be consecutive differences")
  }

  test("write3D delta refuses non-chunk-aligned shapes up front") {
    // edge chunks pad with NaN fill — rejected at the SHAPE with an
    // accurate message, not at flush time blaming dense data
    val in = (for (t <- 0 until 5; y <- 0 until 2; x <- 0 until 3)
      yield (t, y, x, 1.0)).toDF("t_idx", "y", "x", "value")
    val e = intercept[IllegalArgumentException] {
      ZarrSource.write3D(in, tmpDir(), shape = (5, 2, 3), chunks = (2, 2, 3),
        delta = true)
    }
    assert(e.getMessage.contains("chunk-aligned"), e.getMessage)
  }

  test("write3D delta refuses chunks with missing cells by name") {
    val in = (for (t <- 0 until 2; y <- 0 until 2; x <- 0 until 2
        if !(t == 1 && y == 0 && x == 1))
      yield (t, y, x, 1.0)).toDF("t_idx", "y", "x", "value")
    val e = intercept[Exception] {
      ZarrSource.write3D(in, tmpDir(), shape = (2, 2, 2), chunks = (2, 2, 2),
        delta = true)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("missing cells")), s"got: ${msgs(e)}")
  }
}
