package graft.sources

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized lifecycle property: a CF-packed zarr store grown by a
  * seeded random sequence of APPENDS and REGION CORRECTIONS must read
  * back exactly equal to an in-memory model of the same operations —
  * quantized once per write, committed codes never drifting. Exercises
  * the raw-space merge across edge-chunk straddles, hole patterns, and
  * region/append interleavings the handwritten cases can't enumerate.
  * Runs the same script over the PLAIN and the SHARDED packed layout. */
class ZarrPackedLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val ny = 3
  private val nx = 5
  private val scale = 0.01

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zplc").toFile
    d.delete()
    d.getAbsolutePath
  }

  /** Quantize like the writer so the model compares exactly. */
  private def q(v: Double): Double =
    if (v.isNaN) Double.NaN else math.rint(v / scale) * scale

  private def runScript(seed: Long, sharded: Boolean): Unit = {
    val rnd = new Random(seed)
    val dir = tmpDir()
    // model(t)(y*nx+x) = physical value or NaN
    val model = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]

    def block(nt: Int, dense: Boolean): Seq[(Int, Int, Int, Double)] =
      for {
        t <- 0 until nt; y <- 0 until ny; x <- 0 until nx
        if dense || rnd.nextDouble() > 0.3 // ~30% holes
      } yield (t, y, x, math.rint(rnd.between(-50.0, 50.0) * 100) / 100.0)

    def df(cells: Seq[(Int, Int, Int, Double)]) =
      cells.toDF("time_idx", "y_idx", "x_idx", "sst")

    // create: 1..5 slices
    val nt0 = 1 + rnd.nextInt(5)
    val created = block(nt0, dense = false)
    val w0 = df(created).write.format("zarr")
      .option("dims", s"time:$nt0,y:$ny,x:$nx").option("chunks", s"2,$ny,$nx")
      .option("cols", "sst").option("pack", scale.toString)
    (if (sharded) w0.option("shard", s"1,$ny,$nx").option("v3", "true") else w0)
      .mode("overwrite").save(dir)
    (0 until nt0).foreach(_ => model += Array.fill(ny * nx)(Double.NaN))
    created.foreach { case (t, y, x, v) => model(t)(y * nx + x) = q(v) }

    // 4 random ops: append (grow 1..4) or region-correct a window
    (0 until 4).foreach { _ =>
      if (rnd.nextBoolean() || model.length < 2) {
        val k = 1 + rnd.nextInt(4)
        val cells = block(k, dense = false)
        df(cells).write.format("zarr")
          .option("dims", s"time:$k,y:$ny,x:$nx").option("chunks", s"2,$ny,$nx")
          .option("cols", "sst")
          .mode("append").save(dir)
        val base = model.length
        (0 until k).foreach(_ => model += Array.fill(ny * nx)(Double.NaN))
        cells.foreach { case (t, y, x, v) => model(base + t)(y * nx + x) = q(v) }
      } else {
        val start = rnd.nextInt(model.length)
        val len = 1 + rnd.nextInt(model.length - start)
        val cells = block(len, dense = false)
        df(cells).write.format("zarr")
          .option("dims", s"time:$len,y:$ny,x:$nx").option("chunks", s"2,$ny,$nx")
          .option("cols", "sst").option("region", start.toString)
          .mode("append").save(dir)
        // region semantics: an UPSERT — absent cells keep stored values
        cells.foreach { case (t, y, x, v) => model(start + t)(y * nx + x) = q(v) }
      }
    }

    // full read-back vs the model, cell-exact (both sides quantized once)
    val got = spark.read.format("zarr").load(dir)
      .select("time_idx", "y_idx", "x_idx", "sst").collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got.size == model.length * ny * nx,
      s"seed $seed sharded=$sharded: expected ${model.length * ny * nx} cells, got ${got.size}")
    for (t <- model.indices; y <- 0 until ny; x <- 0 until nx) {
      val want = model(t)(y * nx + x)
      val have = got((t, y, x))
      assert((want.isNaN && have.isNaN) || want == have,
        s"seed $seed sharded=$sharded cell ($t,$y,$x): model $want, store $have")
    }
  }

  test("random append/region scripts on a packed PLAIN store ≡ model") {
    Seq(11L, 12L, 13L).foreach(runScript(_, sharded = false))
  }

  test("random append/region scripts on a packed SHARDED store ≡ model") {
    Seq(21L, 22L, 23L).foreach(runScript(_, sharded = true))
  }
}
