package graft.marex

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized invariants for the per-slice raster kernels, seeded and
  * deterministic. Two classes of property:
  *
  *  - CCL vs an independent BFS reference: `labelPerSlice`'s union-find
  *    labels (8-connectivity, optional x wrap, dense 1..k by min cell
  *    index) must match a breadth-first labeling written from the same
  *    spec — on arbitrary random grids, not hand-picked fixtures.
  *  - Morphology rotation equivariance: with `periodicX=true` the grid is a
  *    cylinder, so `fillHoles` must commute with any horizontal rotation.
  *    A seam bug (pad-mode or modulo error at x=0/x=nx−1) breaks this
  *    immediately while passing interior-only fixtures.
  */
class RasterPropertySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2020-01-01 00:00:00")

  private def flagsDf(cells: Set[(Int, Int)]): DataFrame =
    cells.toSeq.map { case (y, x) => (t0, y, x) }.toDF("time", "y", "x")

  private def randomCells(ny: Int, nx: Int, fill: Double, rnd: scala.util.Random): Set[(Int, Int)] =
    (for { y <- 0 until ny; x <- 0 until nx if rnd.nextDouble() < fill } yield (y, x)).toSet

  /** Independent BFS labeling: 8-connectivity, optional x wrap, labels
    * dense 1..k ordered by each component's minimum cell index. */
  private def bfsLabels(cells: Set[(Int, Int)], ny: Int, nx: Int,
      wrap: Boolean): Map[(Int, Int), Int] = {
    val remaining = scala.collection.mutable.Set[(Int, Int)]() ++ cells
    val comps = scala.collection.mutable.ArrayBuffer[Set[(Int, Int)]]()
    while (remaining.nonEmpty) {
      val seed = remaining.head
      val queue = scala.collection.mutable.Queue(seed)
      val comp = scala.collection.mutable.Set(seed)
      remaining -= seed
      while (queue.nonEmpty) {
        val (y, x) = queue.dequeue()
        for (dy <- -1 to 1; dx <- -1 to 1 if dy != 0 || dx != 0) {
          val yy = y + dy
          val xx0 = x + dx
          val xx = if (wrap) ((xx0 % nx) + nx) % nx else xx0
          val n = (yy, xx)
          if (yy >= 0 && yy < ny && xx >= 0 && xx < nx && remaining.contains(n)) {
            remaining -= n; comp += n; queue.enqueue(n)
          }
        }
      }
      comps += comp.toSet
    }
    comps.toSeq
      .sortBy(_.map { case (y, x) => y * nx + x }.min)
      .zipWithIndex
      .flatMap { case (comp, i) => comp.map(_ -> (i + 1)) }
      .toMap
  }

  test("labelPerSlice matches BFS reference labels on random grids (wrap and regional)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 12) {
      val ny = 3 + rnd.nextInt(10)
      val nx = 3 + rnd.nextInt(12)
      val wrap = trial % 2 == 0
      val cells = randomCells(ny, nx, 0.15 + rnd.nextDouble() * 0.35, rnd)
      if (cells.nonEmpty) {
        val spec = GridSpec(ny = ny, nx = nx, periodicX = wrap)
        val got = Raster.labelPerSlice(flagsDf(cells), spec)
          .select("y", "x", "label").collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
        val want = bfsLabels(cells, ny, nx, wrap)
        assert(got == want,
          s"trial=$trial ny=$ny nx=$nx wrap=$wrap: CCL diverged from BFS reference")
      }
    }
  }

  test("fillHoles commutes with horizontal rotation on the periodic grid") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val ny = 6 + rnd.nextInt(8)
      val nx = 6 + rnd.nextInt(10)
      val rot = 1 + rnd.nextInt(nx - 1)
      val rFill = 1 + rnd.nextInt(2)
      val cells = randomCells(ny, nx, 0.25 + rnd.nextDouble() * 0.3, rnd)
      val spec = GridSpec(ny = ny, nx = nx, periodicX = true)
      def run(cs: Set[(Int, Int)]): Set[(Int, Int)] =
        Raster.fillHoles(flagsDf(cs), rFill, spec).select("y", "x").collect()
          .map(r => (r.getInt(0), r.getInt(1))).toSet
      val direct = run(cells)
      val rotated = run(cells.map { case (y, x) => (y, (x + rot) % nx) })
        .map { case (y, x) => (y, ((x - rot) % nx + nx) % nx) }
      assert(direct == rotated,
        s"trial=$trial ny=$ny nx=$nx rot=$rot rFill=$rFill: morphology is not rotation-equivariant")
    }
  }

  test("fillHoles removes isolated pixels and preserves solid disks") {
    val spec = GridSpec(ny = 20, nx = 24, periodicX = true)
    // a lone pixel is erased by the opening at any rFill >= 1
    assert(Raster.fillHoles(flagsDf(Set((10, 12))), 1, spec).count() == 0L)
    // a solid disk of radius rFill survives closing+opening unchanged
    val disk = (for {
      dy <- -2 to 2; dx <- -2 to 2 if dy * dy + dx * dx <= 4
    } yield (10 + dy, 12 + dx)).toSet
    val out = Raster.fillHoles(flagsDf(disk), 2, spec).select("y", "x").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == disk, s"solid disk changed: ${out.diff(disk)} / ${disk.diff(out)}")
  }
}
