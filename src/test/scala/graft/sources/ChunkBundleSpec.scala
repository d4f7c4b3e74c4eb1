package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

import graft.SparkSpec

/** Pins the r12 DSv2 chunk-bundling internals: partition packing respects
  * both the width target and the byte bound, and the concatenating reader
  * yields exactly the member chunks' rows, constructing sub-readers
  * lazily. The end-to-end duals live in the source specs (the v2-vs-utility
  * equality tests now run bundled whenever chunks > cores). */
object ChunkBundleSpec {
  /** Chunk count of a DSv2 scan, unwrapped through r12 bundles — for plan
    * assertions that pin the PRUNED CHUNK SET, not the task packing. */
  def plannedChunks(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.map {
          case BundledPartition(ps) => ps.length
          case _ => 1
        }.sum
    }.sum
}

class ChunkBundleSpec extends SparkSpec {

  private case class P(id: Int) extends InputPartition

  private def parts(n: Int): Array[InputPartition] =
    (0 until n).map(P(_): InputPartition).toArray

  test("bundle: under width stays per-chunk") {
    spark.sparkContext.setJobDescription(null) // touch session → SparkSession.active
    val in = parts(3)
    assert(ChunkBundles.bundle(in, 1024) eq in)
  }

  test("bundle: packs to ~width tasks when chunks are small") {
    val w = spark.sparkContext.defaultParallelism
    val out = ChunkBundles.bundle(parts(10 * w), 1024)
    assert(out.length == w)
    assert(out.forall(_.isInstanceOf[BundledPartition]))
    val sizes = out.map(_.asInstanceOf[BundledPartition].parts.length)
    assert(sizes.sum == 10 * w)
    assert(sizes.max == 10)
  }

  test("bundle: byte bound caps the bundle factor for fat chunks") {
    val w = spark.sparkContext.defaultParallelism
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    // chunks of maxBytes/2: at most 2 per bundle no matter the width math
    val out = ChunkBundles.bundle(parts(10 * w), maxBytes / 2)
    val sizes = out.map {
      case b: BundledPartition => b.parts.length
      case _ => 1
    }
    assert(sizes.max <= 2)
    assert(sizes.sum == 10 * w)
  }

  test("bundle: chunk at/over maxPartitionBytes stays per-chunk") {
    val w = spark.sparkContext.defaultParallelism
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val in = parts(10 * w)
    assert(ChunkBundles.bundle(in, maxBytes) eq in)
  }

  test("reader: concatenates members in order, builds sub-readers lazily") {
    val built = scala.collection.mutable.ArrayBuffer[Int]()
    def mk(p: InputPartition): PartitionReader[InternalRow] = {
      val id = p.asInstanceOf[P].id
      built += id
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < 2 }
        override def get(): InternalRow = InternalRow(id * 10 + i)
        override def close(): Unit = ()
      }
    }
    val r = ChunkBundles.reader(Seq(P(0), P(1), P(2)), mk)
    assert(built.isEmpty) // nothing constructed before the first next()
    val got = scala.collection.mutable.ArrayBuffer[Int]()
    while (r.next()) got += r.get().getInt(0)
    r.close()
    assert(got.toSeq == Seq(0, 1, 10, 11, 20, 21))
    assert(built.toSeq == Seq(0, 1, 2))
  }
}
