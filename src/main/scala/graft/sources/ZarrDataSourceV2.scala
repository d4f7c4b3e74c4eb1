package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Zarr v2/v3 as a first-class Spark DataSourceV2: `spark.read.format("zarr")
  * .load(dir)` yields `(t_idx INT, y INT, x INT, value DOUBLE)` for a 3-D
  * (time, y, x) array (v2 `.zarray` or v3 `zarr.json` auto-detected), with
  *
  *  - **filter pushdown**: `t_idx` range predicates prune whole chunk FILES
  *    at planning time — the Zarr analogue of Parquet row-group pruning —
  *    and the pushed range is visible in `explain()` via the scan
  *    description;
  *  - **column pruning**: the reader materializes only the requested
  *    columns into each `InternalRow`;
  *  - **one `InputPartition` per chunk file**, so parallelism tracks the
  *    chunk grid exactly like the reference's Dask graph, on any Hadoop
  *    filesystem; absent chunk files synthesize `fill_value` cells (Zarr
  *    writers elide all-fill chunks).
  *
  * A GROUP directory (v2 `.zgroup`/`.zmetadata` or v3 group `zarr.json`)
  * loads with `.option("var", name)` selecting the member array — the same
  * UX as the netcdf source — so `spark.read.format("zarr").option("var",
  * "extreme_events").load(store)` opens an xarray-written dataset member
  * directly. [[ZarrSource.read3D]] remains as the utility-call form; both
  * share the same chunk decoding ([[Blosc]], zlib, raw).
  */
class ZarrDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrTableV2.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "zarr source requires a path: spark.read.format(\"zarr\").load(dir)"))
    new ZarrTableV2(ZarrTableV2.resolveVar(path, Option(properties.get("var"))))
  }
}

private[sources] object ZarrTableV2 {
  val fullSchema: StructType = StructType(Seq(
    StructField("t_idx", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Resolve a load path that may point at a GROUP: with `var`, descend to
    * that member (validated against the group's metadata for a listing
    * error); without, require the path to be an array directory. */
  def resolveVar(path: String, varName: Option[String]): String = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(path)
    val fs = d.getFileSystem(conf)
    def isGroup: Boolean = {
      val v3 = new org.apache.hadoop.fs.Path(path, "zarr.json")
      if (fs.exists(v3)) {
        val in = fs.open(v3)
        val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        val j = org.json4s.jackson.JsonMethods.parse(s)
        (j \ "node_type") == org.json4s.JString("group")
      } else fs.exists(new org.apache.hadoop.fs.Path(path, ".zgroup")) ||
        fs.exists(new org.apache.hadoop.fs.Path(path, ".zmetadata"))
    }
    varName match {
      case Some(v) =>
        val g = ZarrGroup.open(path, conf) // also errors clearly on non-group
        require(g.members.contains(v),
          s"no variable '$v' in zarr group $path " +
            s"(have: ${g.members.keys.toSeq.sorted.mkString(", ")})")
        s"$path/$v"
      case None =>
        require(!isGroup,
          s"$path is a zarr GROUP — pick a member with .option(\"var\", <name>)")
        path
    }
  }
}

private[sources] class ZarrTableV2(path: String) extends Table with SupportsRead {
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = ZarrTableV2.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path)
}

private[sources] class ZarrScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var tLo = Int.MinValue
  private var tHi = Int.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ZarrTableV2.fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case EqualTo("t_idx", v: Int) => tLo = math.max(tLo, v); tHi = math.min(tHi, v); true
      case GreaterThan("t_idx", v: Int) => tLo = math.max(tLo, v + 1); true
      case GreaterThanOrEqual("t_idx", v: Int) => tLo = math.max(tLo, v); true
      case LessThan("t_idx", v: Int) => tHi = math.min(tHi, v - 1); true
      case LessThanOrEqual("t_idx", v: Int) => tHi = math.min(tHi, v); true
      case _ => false
    }
    pushed = accepted
    // conservatively keep every filter as a post-scan predicate too — the
    // pushdown is a chunk-level prune, not an exact row filter
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ZarrScan(path, tLo, tHi, required)
}

private[sources] case class ZarrChunkPartition(
    ci: Int, cj: Int, ck: Int, filePath: String) extends InputPartition // filePath "" → missing chunk

private[sources] class ZarrScan(path: String, tLo: Int, tHi: Int,
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String = {
    val range =
      if (tLo == Int.MinValue && tHi == Int.MaxValue) "none"
      else s"t_idx in [$tLo, $tHi]"
    s"ZarrScan(path=$path, pushed=$range, columns=${required.fieldNames.mkString(",")})"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val meta = readDirMeta(spark)
    val Seq(nt, _, _) = meta.shape
    val Seq(ct, cy, cx) = meta.chunks
    val nyC = (meta.shape(1) + cy - 1) / cy
    val nxC = (meta.shape(2) + cx - 1) / cx
    val t0 = math.max(tLo, 0); val t1 = math.min(tHi, nt - 1)
    def keepT(ci: Int): Boolean = ci * ct <= t1 && ci * ct + ct - 1 >= t0

    val glob = ZarrSource.chunkGlob(meta, path, 3)
    val gp = new org.apache.hadoop.fs.Path(glob)
    val fs = gp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val present = Option(fs.globStatus(gp)).map(_.toSeq).getOrElse(Seq.empty)
      .flatMap { st =>
        ZarrSource.parseChunkKey(meta, st.getPath.toString, 3)
          .map { ci => (ci(0), ci(1), ci(2)) -> st.getPath.toString }
      }.toMap

    (for {
      ci <- 0 until (nt + ct - 1) / ct if keepT(ci)
      cj <- 0 until nyC
      ck <- 0 until nxC
    } yield ZarrChunkPartition(ci, cj, ck,
      present.getOrElse((ci, cj, ck), ""))).toArray[InputPartition]
  }

  private def readDirMeta(spark: org.apache.spark.sql.SparkSession): ZarrSource.ZarrMeta = {
    val meta = ZarrSource.readMetaAny(path, spark.sparkContext.hadoopConfiguration)
    require(meta.shape.length == 3, s"zarr DSv2 expects a 3-D array, got ${meta.shape}")
    require(meta.order == "C", "only C-order zarr supported")
    meta
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val meta = readDirMeta(spark)
    new ZarrReaderFactory(meta, tLo, tHi, required.fieldNames,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
  }
}

private[sources] class ZarrReaderFactory(meta: ZarrSource.ZarrMeta,
    tLo: Int, tHi: Int, columns: Array[String],
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[ZarrChunkPartition]
    new PartitionReader[InternalRow] {
      private val Seq(nt, ny, nx) = meta.shape
      private val Seq(ct, cy, cx) = meta.chunks
      private val bp = ZarrSource.bytesPer(meta.dtype)
      private val t0 = math.max(tLo, 0); private val t1 = math.min(tHi, nt - 1)

      private val raw: Array[Byte] =
        if (part.filePath.isEmpty) null
        else {
          val p = new org.apache.hadoop.fs.Path(part.filePath)
          val fs = p.getFileSystem(conf.value)
          val in = fs.open(p)
          val bytes = try {
            val st = fs.getFileStatus(p)
            val b = new Array[Byte](st.getLen.toInt)
            in.readFully(0, b, 0, b.length)
            b
          } finally in.close()
          ZarrSource.decodeChunk(bytes, meta, ct * cy * cx * bp)
        }
      private val buf =
        if (raw == null) null
        else ByteBuffer.wrap(raw).order(ZarrSource.byteOrderOf(meta.dtype))

      private var i = -1
      private var t = 0; private var yy = 0; private var xx = 0; private var v = 0.0
      private val n = ct * cy * cx

      override def next(): Boolean = {
        while ({ i += 1; i < n }) {
          t = part.ci * ct + i / (cy * cx)
          yy = part.cj * cy + (i / cx) % cy
          xx = part.ck * cx + i % cx
          if (t < nt && yy < ny && xx < nx && t >= t0 && t <= t1) {
            v =
              if (raw == null) meta.fillValue
              else ZarrSource.cellValue(raw, buf, meta.dtype, i, bp)
            return true
          }
        }
        false
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(columns.toSeq.map {
          case "t_idx" => t
          case "y" => yy
          case "x" => xx
          case "value" => v
        })

      override def close(): Unit = ()
    }
  }
}
