package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** NESTED `sharding_indexed` (a shard whose inner chunks are themselves
  * shard objects) — read support to arbitrary depth; the writer stays
  * one-level. */
class ZarrNestedShardSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_znest").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def put(dir: String, rel: String, bytes: Array[Byte]): Unit =
    ZarrSource.putBytes(fs, new org.apache.hadoop.fs.Path(dir, rel), bytes)

  /** body parts + end index (offset,nbytes pairs, crc32c). */
  private def shardObject(parts: Seq[Array[Byte]]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    val idx = ByteBuffer.allocate(16 * parts.length + 4).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach { p =>
      idx.putLong(body.size().toLong).putLong(p.length.toLong)
      body.write(p)
    }
    val crc = new java.util.zip.CRC32C
    crc.update(idx.array(), 0, 16 * parts.length)
    idx.putInt(crc.getValue.toInt)
    body.write(idx.array())
    body.toByteArray
  }

  test("a two-level nested shard reads back cell-exact (readLocalND)") {
    val dir = tmpDir()
    // (4,4) array, one outer chunk (4,4); inner shards (2,4); nested (2,2)
    put(dir, "zarr.json",
      """{"zarr_format": 3, "node_type": "array", "shape": [4, 4],
          "data_type": "float64",
          "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4, 4]}},
          "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
          "fill_value": "NaN",
          "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [2, 4],
            "codecs": [{"name": "sharding_indexed", "configuration": {
              "chunk_shape": [2, 2],
              "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
                         {"name": "zstd", "configuration": {"level": 3}}],
              "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}],
              "index_location": "end"}}],
            "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}],
            "index_location": "end"}}],
          "attributes": {}}""".getBytes)
    def cell(i: Int, j: Int): Double = i * 10.0 + j
    // nested chunk (rows r0..r0+1, cols c0..c0+1), C-order within (2,2)
    def nested(r0: Int, c0: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until 2; j <- 0 until 2) b.putDouble(cell(r0 + i, c0 + j))
      ZarrSource.v3EncodeChain(b.array(), Seq(ZarrSource.ZstdC))
    }
    // inner shard object for rows [r0, r0+1]: nested chunks at cols 0 and 2
    def innerObj(r0: Int): Array[Byte] =
      shardObject(Seq(nested(r0, 0), nested(r0, 2)))
    put(dir, "c/0/0", shardObject(Seq(innerObj(0), innerObj(2))))
    val (shape, vals) = ZarrSource.readLocalND(dir)
    assert(shape == Seq(4, 4))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(vals(i * 4 + j) == cell(i, j), s"cell ($i,$j) = ${vals(i * 4 + j)}")
  }

  test("appends onto nested-sharded stores fail by name") {
    val dir = tmpDir()
    // reuse the fixture from the first test's layout but through the GROUP
    // append surface: wrap the array as a group member via a group zarr.json
    put(dir, "zarr.json",
      """{"zarr_format": 3, "node_type": "group", "attributes": {},
          "consolidated_metadata": {"kind": "inline", "must_understand": false,
            "metadata": {"sst": {"zarr_format": 3, "node_type": "array",
              "shape": [4, 4], "data_type": "float64",
              "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4, 4]}},
              "fill_value": "NaN",
              "codecs": [{"name": "sharding_indexed", "configuration": {
                "chunk_shape": [2, 4],
                "codecs": [{"name": "sharding_indexed", "configuration": {
                  "chunk_shape": [2, 2],
                  "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
                             {"name": "zstd", "configuration": {"level": 3}}],
                  "index_location": "end"}}],
                "index_location": "end"}}],
              "dimension_names": ["time", "y"]}}}}""".getBytes)
    import spark.implicits._
    val df = Seq((0, 0, 1.0)).toDF("time_idx", "y_idx", "sst")
    val e = intercept[Exception] {
      ZarrGroup.appendDataset(df, dir, Seq("time" -> 1, "y" -> 4),
        Seq(4, 4), Seq("sst"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("sharding")), s"got: ${msgs(e)}")
  }
}
