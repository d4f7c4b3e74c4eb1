package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

/** A task-sized bundle of chunk partitions: the reader concatenates the
  * member chunks sequentially inside ONE task. */
private[sources] case class BundledPartition(parts: Seq[InputPartition])
    extends InputPartition

/** k-chunks-per-task bundling for the DSv2 batch scans (guide §2.2 "fewer,
  * larger tasks", §6 input split sizing).
  *
  * All four sources plan one `InputPartition` per stored chunk so that
  * parallelism tracks the chunk grid. At archive scale chunks are MB-sized
  * and that is the right granularity; on a small store it schedules one
  * tiny task per chunk (a 96-chunk regional read = 96 tasks on 32 cores,
  * ~0.2–0.5 s of pure scheduling). Bundling packs chunks into
  * ~`defaultParallelism` tasks, bounded so one task never covers more than
  * `spark.sql.files.maxPartitionBytes` of estimated decoded bytes — the
  * same budget a parquet scan's split packing uses. Both inputs are
  * data/cluster-derived, so the bundle factor is scale-adaptive: whenever
  * chunks are big (any real deployment) the byte bound forces k = 1 and
  * planning is unchanged.
  *
  * Row-order within a task becomes the concatenation of its member chunks;
  * no declared query depends on scan order (they aggregate or sort), and
  * Spark gives no cross-partition order guarantee anyway. Streaming scans
  * are NOT bundled — micro-batch planning stays per-chunk. */
private[sources] object ChunkBundles {

  /** Bundle `parts` into ~width tasks of ≤ maxPartitionBytes each.
    * @param bytesPerChunk estimated DECODED bytes of one full chunk */
  def bundle(parts: Array[InputPartition], bytesPerChunk: Long)
      : Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val width = math.max(1, spark.sparkContext.defaultParallelism)
    if (parts.length <= width) return parts
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val byCount = (parts.length + width - 1) / width
    val byBytes = math.max(1L,
      maxBytes / math.max(1L, bytesPerChunk)).min(Int.MaxValue.toLong).toInt
    val k = math.min(byCount, byBytes)
    if (k <= 1) parts
    else parts.grouped(k).map(g => BundledPartition(g.toSeq): InputPartition)
      .toArray
  }

  /** Sequential concatenation of lazily-constructed per-chunk readers —
    * lazy so a bundle holds at most ONE chunk's decode buffer at a time
    * (the per-task memory bound is unchanged from the unbundled plan). */
  def reader(parts: Seq[InputPartition],
      mk: InputPartition => PartitionReader[InternalRow])
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var idx = 0
      private var cur: PartitionReader[InternalRow] = null

      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            if (idx >= parts.length) return false
            cur = mk(parts(idx))
            idx += 1
          }
          if (cur.next()) return true
          cur.close()
          cur = null
        }
        false // unreachable
      }

      override def get(): InternalRow = cur.get()

      override def close(): Unit = {
        if (cur != null) cur.close()
        cur = null
      }
    }
}
