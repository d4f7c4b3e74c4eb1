package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GROUPED-by-dimension metadata aggregates: `groupBy(t_idx).count()`
  * (and min/max of dims) over dense grids is as metadata-answerable as
  * the ungrouped case — a per-day cell count over a 40-year archive must
  * not read a single chunk. Plan-asserted through the `MetadataAggScan`
  * marker (whose description carries `data reads=0`), value-asserted
  * against the real scan. */
class GroupedMetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("zarr: groupBy(t_idx).count() collapses to metadata, windows included") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zgagg").toFile.getAbsolutePath
    val in = (for (t <- 0 until 6; y <- 0 until 4; x <- 0 until 5)
      yield (t, y, x, t + y + x * 1.0)).toDF("t_idx", "y", "x", "value")
    ZarrSource.write3D(in, dir, shape = (6, 4, 5), chunks = (2, 4, 5))
    val table = spark.read.format("zarr").load(dir)

    val g = table.groupBy("t_idx").count()
    assert(planOf(g).contains("MetadataAggScan"), s"grouped count not metadata:\n${planOf(g)}")
    val rows = g.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows == (0 until 6).map(_ -> 20L).toMap)

    // dim-window filters compose: only in-window groups, windowed counts
    val win = table.filter(col("t_idx").between(2, 4) && col("x") >= 1)
      .groupBy("t_idx").count()
    assert(planOf(win).contains("MetadataAggScan"))
    assert(win.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(2 -> 16L, 3 -> 16L, 4 -> 16L))

    // grouped min/max of OTHER dims ride along; of the group dim it is
    // the group's own value
    val mm = table.filter(col("y") >= 1).groupBy("t_idx")
      .agg(count(lit(1)), min("y"), max("x"), max("t_idx"))
    assert(planOf(mm).contains("MetadataAggScan"))
    val r3 = mm.filter(col("t_idx") === 3).head
    assert((r3.getLong(1), r3.getInt(2), r3.getInt(3), r3.getInt(4)) == (15L, 1, 4, 3))

    // multi-dim grouping works too
    val gyx = table.groupBy("y", "x").count()
    assert(planOf(gyx).contains("MetadataAggScan"))
    assert(gyx.count() == 20 && gyx.head.getLong(2) == 6L)

    // a VALUE predicate or aggregate disqualifies the pushdown
    assert(!planOf(table.filter(!isnan(col("value"))).groupBy("t_idx").count())
      .contains("MetadataAggScan"))
    assert(!planOf(table.groupBy("t_idx").agg(sum("value")))
      .contains("MetadataAggScan"))
  }

  test("zarr: a grouping past the driver-side cap falls back to the real scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zgcap").toFile
    // metadata-only store, no chunk files: 1 × 1025 × 1025 cells of fill —
    // dense semantics make every cell real, and y×x grouping is 1,050,625
    // groups > MaxGroups (1<<20)
    val fs = new org.apache.hadoop.fs.Path(dir.getAbsolutePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ZarrSource.putBytes(fs,
      new org.apache.hadoop.fs.Path(dir.getAbsolutePath, ".zarray"),
      """{"zarr_format": 2, "shape": [1, 1025, 1025], "chunks": [1, 1025, 1025],
         "dtype": "<f8", "compressor": null, "fill_value": 0.0,
         "order": "C", "filters": null}""".getBytes)
    val table = spark.read.format("zarr").load(dir.getAbsolutePath)
    val over = table.groupBy("y", "x").count()
    assert(!planOf(over).contains("MetadataAggScan"),
      "1M+ groups must NOT materialize driver-side")
    assert(over.count() == 1025L * 1025)
    // grouping by t alone stays metadata
    val ok = table.groupBy("t_idx").count()
    assert(planOf(ok).contains("MetadataAggScan"))
    assert(ok.head.getLong(1) == 1025L * 1025)
  }

  test("netcdf multi-file: per-day counts span file boundaries without chunk reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ncgagg").toFile
    dir.mkdirs()
    (0 until 3).foreach { mth =>
      val local = (for (t <- 0 until 4; y <- 0 until 2; x <- 0 until 3)
        yield (t, y, x, (mth * 4 + t) * 10.0 + y + x * 0.5)).toDF("t_idx", "y", "x", "value")
      NetCDF4Source.write3D(local, f"${dir.getAbsolutePath}/sst_$mth%03d.nc",
        "sst", shape = (4, 2, 3), timeChunk = 2)
    }
    val table = spark.read.format("netcdf").option("var", "sst")
      .load(dir.getAbsolutePath)

    val g = table.groupBy("t_idx").count()
    assert(planOf(g).contains("MetadataAggScan"), s"not metadata:\n${planOf(g)}")
    assert(g.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      (0 until 12).map(_ -> 6L).toMap, "global t axis spans the 3 files")

    // grouping by a SPATIAL dim merges contributions across all files
    val gy = table.filter(col("t_idx").between(3, 8)).groupBy("y")
      .agg(count(lit(1)), min("t_idx"), max("t_idx"))
    assert(planOf(gy).contains("MetadataAggScan"))
    val byY = gy.collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(byY == Map(0 -> ((18L, 3, 8)), 1 -> ((18L, 3, 8))))
  }

  test("zarr group: per-slice counts over the dataset scan stay metadata-only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zggagg").toFile.getAbsolutePath
    val in = (for (t <- 0 until 4; y <- 0 until 3; x <- 0 until 2)
      yield (t, y, x, t * 1.0)).toDF("time_idx", "y_idx", "x_idx", "sst")
    ZarrGroup.writeDataset(in, dir, Seq("time" -> 4, "y" -> 3, "x" -> 2),
      Seq(2, 3, 2), Seq("sst"))
    val table = spark.read.format("zarr").load(dir)
    val g = table.filter(col("time_idx") >= 1).groupBy("time_idx").count()
    assert(planOf(g).contains("MetadataAggScan"), s"not metadata:\n${planOf(g)}")
    assert(g.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(1 -> 6L, 2 -> 6L, 3 -> 6L))
  }
}
