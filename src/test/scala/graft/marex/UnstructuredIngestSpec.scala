package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{NetCDF4Source, ZarrGroup}

/** SQL ingest of UNSTRUCTURED (time, ncells) archives: the 2-D netcdf/zarr
  * DataSourceV2 reads, the connectivity→edge-table projection, and the
  * end-to-end path into [[UnstructuredTracker]] — a user with a real ICON
  * archive reaches the tracker entirely through `spark.read`. */
class UnstructuredIngestSpec extends SparkSpec {
  import spark.implicits._

  // ── tiny deterministic mesh: a 6 × 8 cylinder triangulated as cell pairs ──
  // (enough structure for dilation/erosion + two separated blobs)
  private val NRows = 6; private val NCols = 8
  private val NC = NRows * NCols
  private val NT = 5

  /** 4-neighbour cylinder adjacency truncated to nv=3 (triangular format):
    * east, west, and north-or-south alternating — irregular on purpose. */
  private def nbr0(): Array[Array[Int]] = Array.tabulate(3, NC) { (k, i) =>
    val r = i / NCols; val c = i % NCols
    k match {
      case 0 => r * NCols + (c + 1) % NCols
      case 1 => r * NCols + (c + NCols - 1) % NCols
      case _ =>
        if ((r + c) % 2 == 0) { if (r + 1 < NRows) (r + 1) * NCols + c else -1 }
        else { if (r > 0) (r - 1) * NCols + c else -1 }
    }
  }

  private def events(t: Int, i: Int): Double = {
    val r = i / NCols; val c = i % NCols
    // blob A drifts east along row 1-2; blob B fixed in row 4
    val a = (r == 1 || r == 2) && ((c + NCols - t) % NCols) < 3
    val b = r == 4 && c >= 5 && t >= 1 && t <= 3
    if (a || b) 1.0 else 0.0
  }

  private def lat(i: Int): Double = -10.0 + 4.0 * (i / NCols)
  private def lon(i: Int): Double = 45.0 * (i % NCols)
  private def area(i: Int): Double = 1.0 + 0.01 * (i % 7)
  private def maskv(i: Int): Double = if (i / NCols == 0) 0.0 else 1.0

  /** Assemble the whole archive as ONE NetCDF-4 grid+data file. */
  private lazy val ncPath: String = {
    val path = java.nio.file.Files.createTempDirectory("graft_uingest")
      .resolve("icon.nc").toString
    val nbr = nbr0()
    NetCDF4Source.writeVars(spark, path, Seq(
      NetCDF4Source.VarSpec("extreme_events", Seq(NT, NC),
        Array.tabulate(NT * NC)(j => events(j / NC, j % NC)),
        chunkDims = Some(Seq(2, NC))),
      NetCDF4Source.VarSpec("neighbours", Seq(3, NC),
        Array.tabulate(3 * NC) { j =>
          val v = nbr(j / NC)(j % NC); if (v < 0) 0.0 else (v + 1).toDouble
        }),
      NetCDF4Source.VarSpec("lat", Seq(NC), Array.tabulate(NC)(lat)),
      NetCDF4Source.VarSpec("lon", Seq(NC), Array.tabulate(NC)(lon)),
      NetCDF4Source.VarSpec("cell_areas", Seq(NC), Array.tabulate(NC)(area)),
      NetCDF4Source.VarSpec("mask", Seq(NC), Array.tabulate(NC)(maskv))))
    path
  }

  test("2-D (time, cell) netcdf variable reads as (t_idx, cell, value)") {
    val df = spark.read.format("netcdf").option("var", "extreme_events").load(ncPath)
    assert(df.columns.toSeq == Seq("t_idx", "cell", "value"))
    assert(df.count() == NT * NC)
    val bad = df.collect().count { r =>
      r.getDouble(2) != events(r.getInt(0), r.getInt(1)) }
    assert(bad == 0, s"$bad cells diverge from the generator")
  }

  test("t_idx and cell predicates push down on the 2-D path") {
    val df = spark.read.format("netcdf").option("var", "extreme_events").load(ncPath)
      .filter(col("t_idx") === 3 && col("cell").between(8, 15))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("t_idx in [3, 3]") && scan.contains("cell in [8, 15]"),
      s"pushed dims missing from plan:\n$scan")
    val rows = df.collect()
    assert(rows.length == 8)
    assert(rows.forall(r => r.getInt(0) == 3 && r.getInt(1) >= 8 && r.getInt(1) <= 15))
    // metadata-only aggregates work on the cell axis too
    val cnt = spark.read.format("netcdf").option("var", "extreme_events").load(ncPath)
      .filter(col("cell") < 10).count()
    assert(cnt == NT * 10)
  }

  test("connectivityEdges matches Mesh.edgesDf exactly") {
    val nbrDf = spark.read.format("netcdf").option("var", "neighbours").load(ncPath)
    val got = UnstructuredIngest.connectivityEdges(nbrDf)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val mesh = UnstructuredIngest.meshFromNetcdf(spark, ncPath)
    val want = mesh.edgesDf(spark)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == want)
    assert(got.nonEmpty && got.forall { case (a, b) => a >= 0 && b >= 0 })
  }

  test("meshFromNetcdf round-trips geometry, connectivity, and mask") {
    val mesh = UnstructuredIngest.meshFromNetcdf(spark, ncPath)
    assert(mesh.nCells == NC)
    val n0 = nbr0()
    for (k <- 0 until 3; i <- 0 until NC)
      assert(mesh.nbr(k)(i) == n0(k)(i), s"nbr($k)($i)")
    (0 until NC).foreach { i =>
      assert(mesh.lat(i) == lat(i) && mesh.lon(i) == lon(i) &&
        mesh.area(i) == area(i) && mesh.valid(i) == (maskv(i) != 0.0))
    }
  }

  test("SQL-ingested archive tracks identically to the in-memory path") {
    val mesh0 = UnstructuredTracker.Mesh(nbr0(),
      Array.tabulate(NC)(lat), Array.tabulate(NC)(lon),
      Array.tabulate(NC)(area), Array.tabulate(NC)(i => maskv(i) != 0.0))
    val epoch = java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime
    val flags0 = (for {
      t <- 0 until NT; i <- 0 until NC if events(t, i) != 0.0
    } yield (new java.sql.Timestamp(epoch + t * 86400000L), i)).toDF("time", "cell")

    val cfg = TrackConfig(rFill = 1, tFill = 0, areaFilterQuartile = 0.0,
      allowMerging = false)
    val ref = UnstructuredTracker.track(flags0, mesh0, cfg)
    val sql = UnstructuredTracker.track(
      UnstructuredIngest.flagsFromNetcdf(spark, ncPath, "extreme_events"),
      UnstructuredIngest.meshFromNetcdf(spark, ncPath), cfg)
    assert(sql.stats == ref.stats, s"stats diverge: ${sql.stats} vs ${ref.stats}")
    val refId = ref.idField.collect().map(r => r.toSeq).toSet
    val sqlId = sql.idField.collect().map(r => r.toSeq).toSet
    assert(sqlId == refId, "ID fields diverge between SQL and in-memory ingest")
  }

  test("2-D zarr array reads as (t_idx, cell, value) with pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_uzarr").toString + "/g"
    val cells = (for (t <- 0 until NT; i <- 0 until NC)
      yield (t, i, events(t, i))).toDF("time_idx", "cell_idx", "ev")
    ZarrGroup.writeDataset(cells, dir,
      dims = Seq(("time", NT), ("cell", NC)), chunks = Seq(2, NC),
      valueCols = Seq("ev"), fill = 0.0)
    val df = spark.read.format("zarr").option("var", "ev").load(dir)
    assert(df.columns.toSeq == Seq("t_idx", "cell", "value"))
    assert(df.count() == NT * NC)
    val w = df.filter(col("t_idx") === 2 && col("cell").between(0, 7))
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("t_idx in [2, 2]") && plan.contains("cell in [0, 7]"),
      s"pushed dims missing:\n$plan")
    assert(w.collect().forall(r => r.getDouble(2) == events(2, r.getInt(1))))
  }
}
