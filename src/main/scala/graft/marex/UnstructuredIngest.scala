package graft.marex

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.NetCDF4Source

/** SQL ingest for UNSTRUCTURED (ICON-mesh) archives — the bridge from the
  * 2-D `(time, ncells)` DataSourceV2 reads to [[UnstructuredTracker]].
  *
  * The reference treats unstructured grids as first-class (detect.py:18
  * `extreme_events(time, ncells)`; track.py:1060–1089 consumes the
  * triangular `neighbours(nv=3, ncells)` connectivity, 1-based with
  * nonpositive = no neighbor). Here the same two inputs arrive through
  * `spark.read.format("netcdf"|"zarr")`:
  *
  *  - the flags cube reads as `(t_idx, cell, value)` — distributed, chunk
  *    pruned, the 100 TB-scale side;
  *  - `neighbours` reads as `(t_idx = k, cell = i, value = neighbour id)`
  *    (its leading nv axis rides the time machinery) and
  *    [[connectivityEdges]] turns it into the tracker's pull-oriented
  *    `(cell, nbr)` edge table in one zero-shuffle projection;
  *  - per-cell geometry (`lat`/`lon`/`cell_areas`/`mask`, 1-D over ncells)
  *    is metadata-sized next to the cube and loads driver-side into the
  *    [[UnstructuredTracker.Mesh]], exactly like the mesh broadcast the
  *    tracker already ships to executors.
  */
object UnstructuredIngest {

  /** Turn a `neighbours(nv, ncells)` connectivity read — rows
    * `(t_idx = k, cell = i, value = j₁ᵦₐₛₑ𝒹)` from the 2-D netcdf/zarr
    * scan — into the tracker's pull-oriented `(cell, nbr)` edge table:
    * one row `(j, i)` per valid neighbour j of cell i, matching
    * [[UnstructuredTracker.Mesh.edgesDf]] (the reference's dilation matrix
    * `M[i, neighbours[:, i]] = 1`, track.py:1085). A pure projection —
    * zero shuffles, scales with the mesh, not the archive.
    *
    * @param oneBased ids in the file are 1-based with nonpositive = no
    *                 neighbor (the ICON convention, track.py:1061);
    *                 `false` for 0-based with −1 invalid. */
  def connectivityEdges(nbr: DataFrame, oneBased: Boolean = true): DataFrame = {
    val j = (col("value").cast("int") - (if (oneBased) 1 else 0)).as("cell")
    nbr.select(j, col("cell").as("nbr"))
      .filter(col("cell") >= 0)
  }

  /** Load a full [[UnstructuredTracker.Mesh]] from a NetCDF grid file
    * holding `neighbours(nv, ncells)` plus 1-D `lat`, `lon`, `cell_areas`,
    * and `mask` — driver-side ([[NetCDF4Source.readLocal]]): mesh geometry
    * is ncells-sized, the same object the tracker broadcasts anyway.
    *
    * @param oneBased connectivity id convention (see [[connectivityEdges]]) */
  def meshFromNetcdf(spark: SparkSession, path: String,
      oneBased: Boolean = true): UnstructuredTracker.Mesh = {
    val (nbrDims, nbrFlat) = NetCDF4Source.readLocal(spark, path, "neighbours")
    require(nbrDims.length == 2,
      s"neighbours must be (nv, ncells), got ${nbrDims.mkString("x")} in $path")
    val Seq(nv, nCells) = nbrDims.map(_.toInt)
    require(nv == 3, s"triangular mesh expects nv=3, got $nv in $path")
    val base = if (oneBased) 1 else 0
    val nbr = Array.tabulate(nv, nCells)((k, i) => nbrFlat(k * nCells + i).toInt - base)
    def vec(name: String): Array[Double] = {
      val (d, a) = NetCDF4Source.readLocal(spark, path, name)
      require(d == Seq(nCells.toLong), s"$name must be 1-D over ncells in $path")
      a
    }
    UnstructuredTracker.Mesh(nbr, vec("lat"), vec("lon"), vec("cell_areas"),
      vec("mask").map(_ != 0.0))
  }

  /** Cell-keyed DETECT entry: run the full [[Detect.preprocess]] pipeline on
    * an UNSTRUCTURED `(time, cell, value)` field — the reference's
    * first-class mesh preprocessing (detect.py:2195–2205 handles the 2-D
    * `(time, ncells)` case; test_unstructured_preprocessing.py:23–40 drives
    * every anomaly×extreme combination through it with
    * `dimensions={"time": "time", "x": "ncells"}`, no `y`).
    *
    * The detect kernels are grid-shape-agnostic — pixels are just group
    * keys — so the mesh rides the gridded machinery as `(y = cell, x = 0)`
    * and the outputs rename back to `cell`. No kernel pools spatially under
    * a [[DetectConfig]] (hobday's spatial window is a separate D15
    * parameter), so the mapping is exact, not an approximation.
    *
    * @param windowSpatialHobday must stay 0: the reference REJECTS spatial
    *   hobday pooling on unstructured grids (detect.py:1362–1380 raises
    *   ConfigurationError "window_spatial_hobday is not supported for
    *   unstructured grids") — a cell id is not a spatial coordinate, so a
    *   ±w cell window would pool arbitrary mesh neighbours. Mirrored here
    *   as the same named error.
    * @return (anomaly, thresholds, extremes), each keyed by `cell` (and
    *   `doy` for hobday thresholds) instead of `(y, x)`. */
  def preprocessCells(field: DataFrame, cfg: DetectConfig,
      windowSpatialHobday: Int = 0): (DataFrame, DataFrame, DataFrame) = {
    if (windowSpatialHobday != 0)
      throw new ConfigurationError(
        "window_spatial_hobday is not supported for unstructured grids",
        "Remove the window_spatial_hobday parameter for unstructured grids " +
          "(detect.py:1362-1380)")
    val gridded = field
      .withColumnRenamed("cell", "y")
      .withColumn("x", lit(0))
    val (anom, thr, ext) = Detect.preprocess(gridded, cfg)
    def cellKeyed(df: DataFrame): DataFrame =
      df.drop("x").withColumnRenamed("y", "cell")
    (cellKeyed(anom), cellKeyed(thr), cellKeyed(ext))
  }

  /** Read a `(time, ncells)` extreme-event archive through the SQL source
    * into the tracker's `(time, cell)` flag rows: nonzero cells only, with
    * a daily timestamp axis from `epoch` (the unstructured fixtures carry
    * daily steps; only ordering matters to the tracker).
    *
    * `paths` may be a single file, a directory, or a glob — the multi-file
    * concat and the per-dimension chunk pruning are the DSv2's. */
  def flagsFromNetcdf(spark: SparkSession, paths: String, varName: String,
      epoch: String = "2000-01-01"): DataFrame = {
    val cube = spark.read.format("netcdf").option("var", varName).load(paths)
    val ep = Timestamp.valueOf(s"$epoch 00:00:00")
    cube.filter(col("value") =!= 0.0)
      .select(expr(s"timestampadd(DAY, t_idx, TIMESTAMP '$ep')").as("time"),
        col("cell"))
  }
}
