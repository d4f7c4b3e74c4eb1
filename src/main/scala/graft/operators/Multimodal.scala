package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): it derives deterministic pseudo-pixels from the payload
  * bytes. Everything around it — the schema, the batch iteration shape, the
  * partitioning, and the feature outputs — is the real Spark plumbing a
  * production pipeline would keep while swapping the stub for a codec.
  *
  * Scale notes: payloads stay opaque binary end-to-end (never exploded to
  * rows), `mapPartitions` processes one partition per task with O(batch)
  * memory, and feature extraction emits fixed-width rows so downstream
  * operators are ordinary columnar aggregations. On a real cluster the
  * media table would be written with a small `maxRecordsPerFile` so tasks
  * stay payload-bound, not row-bound.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Long,
      mean_byte: Double,
      hist8: Array[Long])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media table derived from `documents` (payload =
    * UTF-8 bytes of the text; metadata from doc stats). Stands in for a real
    * binary ingest (e.g. parquet BYTE_ARRAY columns of encoded images). */
  def synthesize(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "utf-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
      (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("n_frames"))
      .as[MediaItem]
  }

  /** STUB decode: pretends payload bytes are pixel/sample values.
    * Replace with a real codec (JPEG/PNG/PCM) in production — the signature
    * (bytes in, numeric array out) is what the pipeline contracts on. */
  private def decodeStub(payload: Array[Byte]): Array[Int] =
    payload.map(b => (b & 0xff))

  /** Batch feature extraction over partitions: byte length, mean value, and
    * an 8-bucket value histogram per item. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val px = decodeStub(m.payload)
        val hist = new Array[Long](8)
        var sum = 0L
        px.foreach { v => hist(v / 32) += 1; sum += v }
        MediaFeatures(m.media_id, m.modality, px.length.toLong,
          if (px.isEmpty) 0.0 else sum.toDouble / px.length, hist)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th chunk of
    * `frameLen` bytes, emitted as rows (flat table of frames for downstream
    * per-frame feature extraction). */
  def sampleFrames(media: Dataset[MediaItem], frameLen: Int, stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = m.payload.length / frameLen
      (0 until n by stride).map { i =>
        Frame(m.media_id, i, m.payload.slice(i * frameLen, (i + 1) * frameLen))
      }
    }
  }
}
