package graft.marex

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unstructured-mesh (ICON-style) variants: the raster is replaced by a
  * static edge table `(cell, nbr)` derived from the mesh's triangular
  * connectivity (reference neighbours(3, ncells), track.py:1060–1089).
  *
  * Morphological dilation of radius R is R rounds of a frontier join over
  * the edge table (≙ the reference's boolean sparse-matrix power with a
  * numba kernel, track.py:5422–5468); per-timestep CCL runs as a driver-free
  * per-slice union-find with the adjacency broadcast (the mesh is static and
  * small relative to the field — an ICON R2B8 mesh is ~84 MB of int pairs,
  * broadcastable; the *field* over time is the 100 TB part and is only ever
  * touched by joins/groupBys).
  */
object Unstructured {

  /** T6: boolean dilation — `rounds` hops over the mesh. Each round is one
    * shuffle (join on cell + groupBy nbr). */
  def dilate(flags: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    var cur = flags.select("time", "cell").distinct()
    for (_ <- 1 to rounds) {
      val grown = cur.join(edges, Seq("cell"))
        .select(col("time"), col("nbr").as("cell"))
      cur = cur.union(grown).distinct().localCheckpoint()
    }
    cur
  }

  /** Erosion: a flagged cell survives iff itself and every cell on its
    * OWN neighbour list is flagged (one round); R rounds for radius R.
    * On a SYMMETRIC neighbour table this equals `~dilate^R(~x)`; on an
    * asymmetric one (boundary truncation can make A list B without B
    * listing A) the two differ, and the reference resolves the ambiguity
    * this way — checking each cell's own row of the neighbour matrix —
    * which the pinned mesh-fixture golden counts (99/99/10/9,
    * GoldenTrackingSpec + q60) lock in. Cells with no outgoing edges
    * survive on their own flag (empty neighborhood), matching the sparse
    * matrix's identity diagonal. */
  def erode(flags: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    var cur = flags.select("time", "cell").distinct()
    for (_ <- 1 to rounds) {
      val degree = edges.groupBy("cell").agg(count(lit(1)).as("deg"))
      val flaggedNbrs = cur.join(edges, Seq("cell"))
        .select(col("time"), col("nbr"), col("cell").as("src"))
        .join(cur.select(col("time"), col("cell").as("nbr")), Seq("time", "nbr"), "left_semi")
        .groupBy(col("time"), col("src").as("cell")).agg(count(lit(1)).as("nflag"))
      cur = cur
        .join(flaggedNbrs, Seq("time", "cell"), "left")
        .join(degree, Seq("cell"), "left")
        .filter(coalesce(col("nflag"), lit(0L)) === coalesce(col("deg"), lit(0L)))
        .select("time", "cell").localCheckpoint()
    }
    cur
  }

  /** T5 (unstructured): closing then opening via hop-based dilate/erode,
    * with the reference's land-fill trick (track.py:1566–1577): land cells
    * are set True before each erosion so shores are not artificially
    * eroded. Output may contain land cells (exactly like the reference —
    * the mask is applied at labeling time, not here).
    *
    * COST NOTE (the densification the land-fill implies): each of the two
    * erosions first UNIONs `|timesteps| × |land cells|` rows into the
    * sparse flag set — on a 30%-land mesh that is ~10–20× the flag volume
    * per erosion at typical extreme densities. This is the reference's own
    * cost (its execution is dense everywhere, so the trick is free there;
    * here it re-densifies a sparse frame). Measured at the 10⁷-cell /
    * 3-day probe (30% land = 9.0M injected rows, 2 hops, local[32]):
    * fillHoles 78 s with land vs 44 s without — a ~1.8× constant, not a
    * scale-killer, because the injected rows join/aggregate in the same
    * shuffles the erosion already pays (PERF.md round 11). If mesh
    * morphology ever tops a profile, the
    * per-slice-kernel alternative (broadcast adjacency + local erosion,
    * the labelPerSlice shape) removes the per-hop shuffles entirely.
    * @param land invalid (land) cell set, as a (cell) DataFrame. */
  def fillHoles(flags: DataFrame, edges: DataFrame, r: Int,
      land: Option[DataFrame] = None): DataFrame = {
    if (r <= 0) return flags.select("time", "cell")
    val withLand: DataFrame => DataFrame = land match {
      case None => identity
      case Some(l) =>
        val times = flags.select("time").distinct()
        df => df.union(times.crossJoin(l.select("cell"))).distinct()
    }
    val closed = erode(withLand(dilate(flags, edges, r)), edges, r)
    dilate(erode(withLand(closed), edges, r), edges, r)
  }

  /** T9: per-timestep connected components over the mesh; labels restart at 1
    * per slice. Adjacency is broadcast; each timestep is one task. */
  def labelPerSlice(flags: DataFrame, edges: DataFrame): DataFrame = {
    val spark = flags.sparkSession
    import spark.implicits._
    val adj: Map[Int, Array[Int]] = edges
      .select(col("cell").cast("int"), col("nbr").cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
      .groupBy(_._1).map { case (c, a) => c -> a.map(_._2) }
    val adjB = spark.sparkContext.broadcast(adj)

    flags.select(col("time").cast("timestamp"), col("cell").cast("int"))
      .as[(Timestamp, Int)]
      .map(r => (r._1.getTime, r._2))
      .groupByKey(_._1)
      .flatMapGroups { (t, it) =>
        val cells = it.map(_._2).toArray
        val inSet = cells.toSet
        val parent = scala.collection.mutable.Map[Int, Int]()
        cells.foreach(c => parent(c) = c)
        def find(a: Int): Int = {
          var r = a
          while (parent(r) != r) r = parent(r)
          var c = a
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        val a = adjB.value
        cells.foreach { c =>
          a.getOrElse(c, Array.empty).foreach { n =>
            if (inSet(n)) {
              val rc = find(c); val rn = find(n)
              if (rc != rn) { if (rc < rn) parent(rn) = rc else parent(rc) = rn }
            }
          }
        }
        val roots = scala.collection.mutable.TreeMap[Int, Int]()
        cells.foreach(c => roots.getOrElseUpdate(find(c), 0))
        var lbl = 0
        roots.keys.toSeq.foreach { r => lbl += 1; roots(r) = lbl }
        cells.sorted.iterator.map(c => (t, c, roots(find(c))))
      }
      .map(r => (new Timestamp(r._1), r._2, r._3))
      .toDF("time", "cell", "label")
  }

  /** T2/T21: the ORIGINAL input's coordinate system, remembered across the
    * unify → process → remap round-trip (track.py:919–1021). `lonMin/lonMax`
    * are the raw input bounds — they decide whether outputs go back to a
    * [0,360) / [0,2π) longitude range. */
  final case class CoordSystem(units: String, lonMin: Double, lonMax: Double) {
    require(units == "degrees" || units == "radians",
      s"coordinate_units must be 'degrees' or 'radians', got '$units'")
    /** Original longitudes started non-negative and exceeded the signed
      * half-range → outputs must shift back to [0, 360) / [0, 2π). */
    def lonShifted: Boolean =
      lonMin >= 0 && lonMax > (if (units == "radians") math.Pi else 180.0)
  }

  /** T2: unit auto-detection from the lon range (track.py:946–958): span
    * within ±1 of 360 → degrees, within ±0.02 of 2π → radians; anything else
    * needs `explicitUnits` (the reference's regional mode). ONE bounded agg
    * over the static geometry — never the field. */
  def detectCoordSystem(geom: DataFrame,
      explicitUnits: Option[String] = None): CoordSystem = {
    val r = geom.agg(min("lon"), max("lon")).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val units = explicitUnits.getOrElse {
      val span = hi - lo
      if (math.abs(span - 360.0) <= 1.0) "degrees"
      else if (math.abs(span - 2 * math.Pi) <= 0.02) "radians"
      else throw new CoordinateError(
        f"Cannot auto-detect coordinate units from lon range $span%.3f",
        "expected ~360 (degrees) or ~6.283 (radians); pass explicitUnits for regional data")
    }
    CoordSystem(units, lo, hi)
  }

  /** T2: unit auto-detection — lon spanning ≈360 means degrees, ≈2π means
    * radians (track.py:919–976). Returns geometry in degrees. */
  def unifyCoordinates(geom: DataFrame): DataFrame = {
    val span = geom.agg(max("lon") - min("lon")).head().getDouble(0)
    if (span > 20) geom // already degrees
    else geom
      .withColumn("lat", degrees(col("lat")))
      .withColumn("lon", degrees(col("lon")))
  }

  /** T21: `_remap_coordinates` (track.py:978–1021) — convert centroid
    * columns (produced in degrees, lat [−90,90], lon [−180,180]) back to the
    * ORIGINAL input's units and longitude range: radians inputs get radian
    * centroids; inputs with lon in [0,360) / [0,2π) get non-negative
    * longitudes back. Pure projection — zero shuffles, applies to any
    * centroid-bearing table (eventProps, merges genealogy). */
  def remapCentroids(df: DataFrame, cs: CoordSystem,
      latCol: String = "cen_lat", lonCol: String = "cen_lon"): DataFrame = {
    val (lat0, lon0) = (col(latCol), col(lonCol))
    val (lat1, lon1) =
      if (cs.units == "radians") (radians(lat0), radians(lon0))
      else (lat0, lon0)
    val fullTurn = if (cs.units == "radians") 2 * math.Pi else 360.0
    val lon2 =
      if (cs.lonShifted) when(lon1 < 0, lon1 + fullTurn).otherwise(lon1)
      else lon1
    df.withColumn(latCol, lat1).withColumn(lonCol, lon2)
  }
}
