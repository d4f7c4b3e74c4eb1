package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** HDF5 1-D COMPOUND datasets (the PyTables / `pandas.to_hdf` record
  * shape) as a Spark DataSourceV2:
  * `spark.read.format("hdf5table").option("var", "stats").load(path)`.
  *
  * The schema is inferred from the compound member list (numeric members →
  * DOUBLE, string members → STRING). Spark-first details:
  *
  *  - **member-level column pruning**: a compound record stores members at
  *    fixed offsets, so pruning is done INSIDE the record — only the
  *    requested members' bytes are decoded; a `select(one_col)` over a
  *    20-member table decodes 1/20th of the cells (the HDF5 analogue of
  *    Parquet column pruning, except within a row-major record);
  *  - **limit pushdown**: `LIMIT n` stops planning partitions once the
  *    cumulative row count covers n — a `df.show()` against a billion-row
  *    table opens one chunk;
  *  - **one `InputPartition` per stored chunk** (chunked tables) or per
  *    fixed row range (contiguous), so parallelism tracks the file layout
  *    on any Hadoop filesystem, like the netcdf/zarr sources.
  *
  * Reference entry point: marEx opens archives via `xr.open_dataset`
  * (detect.py:409); compound variables are the table-valued corner of that
  * surface. Utility twin: [[NetCDF4Source.readCompoundTable]].
  */
class Hdf5TableDataSourceV2 extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "hdf5table"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (path, varName) = Hdf5TableV2.pathVar(options.asCaseSensitiveMap())
    // a missing file is WRITE intent (`df.write.format("hdf5table")` onto a
    // fresh path): the table ACCEPT_ANY_SCHEMAs the incoming frame, so the
    // inferred schema is moot — reads of a missing file still fail loudly,
    // at scan time
    try Hdf5TableV2.schemaOf(Hdf5TableV2.compoundOf(path, varName)._2)
    catch { case _: java.io.FileNotFoundException => new StructType() }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val (path, varName) = Hdf5TableV2.pathVar(properties)
    new Hdf5TableV2(path, varName)
  }
}

private[sources] object Hdf5TableV2 {
  def pathVar(props: java.util.Map[String, String]): (String, String) = {
    val path = Option(props.get("path")).getOrElse(throw new IllegalArgumentException(
      "hdf5table source requires a path: spark.read.format(\"hdf5table\").load(file)"))
    val varName = Option(props.get("var")).getOrElse(throw new IllegalArgumentException(
      "hdf5table source requires .option(\"var\", <dataset name>)"))
    (path, varName)
  }

  /** (dataset, compound type, raw DEFINED fill record if any). */
  def compoundOf(path: String,
      varName: String): (Hdf5.Dataset, Hdf5.CompoundType, Option[Array[Byte]]) = {
    val spark = org.apache.spark.sql.SparkSession.active
    val src = new NetCDF4Source.HadoopSource(
      spark.sparkContext.hadoopConfiguration, path)
    val (rootOh, _) = Hdf5.readSuperblock(src)
    val oh = Hdf5.listDatasets(src, rootOh).find(_._1 == varName)
      .getOrElse(throw new IllegalArgumentException(s"no dataset $varName in $path"))._2
    val ds = Hdf5.readDataset(src, varName, oh)
    val ct = ds.dtype match {
      case c: Hdf5.CompoundType => c
      case o => throw new IllegalArgumentException(
        s"$varName is not a compound dataset ($o) — use format(\"netcdf\") for numeric grids")
    }
    require(ds.dims.length == 1, s"$varName: compound tables are 1-D (got ${ds.dims})")
    (ds, ct, Hdf5.rawFillBytes(src, oh).filter(_.length == ct.size))
  }

  def schemaOf(ct: Hdf5.CompoundType): StructType = StructType(ct.members.map(fieldOf))

  /** Numeric → DOUBLE, string/reference → STRING, nested compound →
    * STRUCT (recursively the same mapping). */
  private def fieldOf(m: Hdf5.CompoundMember): StructField = m.dtype match {
    case _: Hdf5.NumType => StructField(m.name, DoubleType, nullable = false)
    case e: Hdf5.EnumType =>
      // codes surface as DOUBLE like every numeric member; the name map
      // rides the column metadata (the enum analogue of CF flag_meanings)
      StructField(m.name, DoubleType, nullable = false,
        NetCDF4Source.enumMetadata(e))
    case _: Hdf5.ArrayMemberType =>
      // PyTables vector column: fixed-shape per record, flat C-order
      StructField(m.name, ArrayType(DoubleType, containsNull = false),
        nullable = false)
    case nc: Hdf5.CompoundType =>
      StructField(m.name, StructType(nc.members.map(fieldOf)), nullable = false)
    case ot: Hdf5.OpaqueType =>
      // opaque bytes → BINARY, the H5Tset_tag string as column metadata
      // (the same opaque-payload-plus-typed-metadata shape as the
      // multimodal columns)
      StructField(m.name, BinaryType, nullable = false,
        new MetadataBuilder().putString("opaque_tag", ot.tag).build())
    case _ => StructField(m.name, StringType, nullable = false)
  }
}

private[sources] class Hdf5TableV2(path: String, varName: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.write._

  override def name(): String = s"hdf5table:$path#$varName"
  override def schema(): StructType =
    try Hdf5TableV2.schemaOf(Hdf5TableV2.compoundOf(path, varName)._2)
    catch { case _: java.io.FileNotFoundException => new StructType() }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Hdf5TableScanBuilder(path, varName)

  /** `df.write.format("hdf5table").option("var", name)` — SQL symmetry for
    * the compound-table read (the q84/q85 dual for the tabular format),
    * wrapping [[NetCDF4Source.writeCompoundTable]]: numerics → f64, LONG →
    * i64, STRING → fixed-length sized to the data (or
    * `.option("stringSizes", "name:bytes,…")`, dotted paths for nested
    * members), STRUCT → nested compound. `overwrite` replaces the file;
    * `append` creates it when absent and otherwise EXTENDS the chunked
    * table along the record dimension — PyTables' `append=True`
    * ([[NetCDF4Source.appendCompoundTable]]): columns match stored members
    * by name, old chunk bytes are untouched, the edge chunk merges, and a
    * contiguous (unchunked) table rejects the append by name. Optional
    * `.option("chunkRows", n)` chunks + deflates the table (and makes it
    * appendable). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
            val opts = info.options
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(
              data.sparkSession.sparkContext.hadoopConfiguration)
            if (!overwrite && fs.exists(p)) {
              // creation-time layout options would be silently dropped on
              // an append — reject them by name (mirrors the zarr sink)
              Seq("stringSizes", "chunkRows", "elideDefaultChunks").foreach { k =>
                require(!opts.containsKey(k),
                  s""".option("$k", …) applies at table CREATION — appends """ +
                    "reuse the stored layout; drop the option")
              }
              NetCDF4Source.appendCompoundTable(data, path, varName)
            } else {
              val stringSizes = Option(opts.get("stringSizes")).map(_.split(",")
                .map { part =>
                  part.split(":") match {
                    case Array(n, sz) => n.trim -> sz.trim.toInt
                    case _ => throw new IllegalArgumentException(
                      s"malformed stringSizes entry '$part' (want name:bytes)")
                  }
                }.toMap).getOrElse(Map.empty[String, Int])
              NetCDF4Source.writeCompoundTable(data, path, varName,
                stringSizes = stringSizes,
                chunkRows = Option(opts.get("chunkRows")).map(_.toInt),
                elideDefaultChunks = opts.getBoolean("elideDefaultChunks", false))
            }
          }
      }
    }
}

private[sources] class Hdf5TableScanBuilder(path: String, varName: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.aggregate.Aggregation

  private var required: Option[StructType] = None
  private var limit: Option[Int] = None
  private var pushedAgg: Option[Seq[MetaAgg]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  // chunk boundaries over-deliver rows, so Spark must still apply the limit
  override def isPartiallyPushed: Boolean = true

  /** Ungrouped `count(*)` = the dataspace cardinality — answered from the
    * header without decoding a record (members carry data, so only
    * CountStar is metadata-answerable here). */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    MetaAgg.parse(agg, Seq.empty).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    pushedAgg = MetaAgg.parse(agg, Seq.empty)
    pushedAgg.isDefined
  }

  override def build(): Scan =
    pushedAgg match {
      case Some(aggs) =>
        val lim = limit
        new MetadataAggScan(s"hdf5table:$path#$varName", Seq.empty, aggs, () => {
          val rows = math.min(Hdf5TableV2.compoundOf(path, varName)._1.dims.head,
            lim.map(_.toLong).getOrElse(Long.MaxValue))
          Seq(aggs.map { case MetaCount => rows: Any; case _ => null }.toArray)
        })
      case None => new Hdf5TableScan(path, varName, required, limit)
    }
}

/** One stored chunk (`addr >= 0`) or a contiguous/compact row range.
  * `chunkRows` is the FULL chunk geometry — stored chunks are always
  * full-size even when the dataspace edge clamps `rows`, and filters
  * (szip in particular) validate against the stored geometry. */
private[sources] case class Hdf5TableChunkPartition(orgRow: Long, rows: Int,
    chunkRows: Int, addr: Long, size: Int, filterMask: Int) extends InputPartition
private[sources] case class Hdf5TableRangePartition(addr: Long, orgRow: Long,
    rows: Int) extends InputPartition
private[sources] case class Hdf5TableInlinePartition(data: Array[Byte],
    rows: Int) extends InputPartition
/** A chunk HDF5 legitimately elided (never written / all default): its rows
  * decode from zero bytes — numeric members 0.0, strings "" — the format's
  * default fill when no fill-value message overrides it. */
private[sources] case class Hdf5TableFillPartition(orgRow: Long, rows: Int)
    extends InputPartition

private[sources] class Hdf5TableScan(path: String, varName: String,
    requiredOpt: Option[StructType], limit: Option[Int])
    extends Scan with Batch with SupportsReportStatistics {

  private def spark = org.apache.spark.sql.SparkSession.active

  private lazy val meta: (Hdf5.Dataset, Hdf5.CompoundType, Option[Array[Byte]]) =
    Hdf5TableV2.compoundOf(path, varName)

  private lazy val required: StructType =
    requiredOpt.getOrElse(Hdf5TableV2.schemaOf(meta._2))

  /** The compound type narrowed to the required members, in OUTPUT order —
    * offsets are absolute within the stored record, so dropping members IS
    * the column pruning (unrequested bytes are never decoded). */
  private lazy val prunedCt: Hdf5.CompoundType = {
    val byName = meta._2.members.map(m => m.name -> m).toMap
    Hdf5.CompoundType(meta._2.size, required.fieldNames.toIndexedSeq.map(byName(_)))
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"Hdf5TableScan(path=$path, var=$varName, " +
      s"columns=${required.fieldNames.mkString(",")}${
        limit.map(l => s", limit=$l").getOrElse("")})"

  override def toBatch: Batch = this

  /** Accurate row count (the dataspace stores it) + a projected-width size
    * estimate, so Catalyst can broadcast a small table on its own. */
  override def estimateStatistics(): Statistics = {
    val rows = math.min(meta._1.dims.head,
      limit.map(_.toLong).getOrElse(Long.MaxValue))
    val bytes = math.max(1L, rows * math.max(required.defaultSize, 1))
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (ds, ct, _) = meta
    val n = ds.dims.head
    val cap = limit.map(_.toLong).getOrElse(Long.MaxValue)
    val parts = ds.layout match {
      case Hdf5.Chunked(_, chunkDims, _) =>
        val cn = chunkDims.head.toLong
        val src = new NetCDF4Source.HadoopSource(
          spark.sparkContext.hadoopConfiguration, path)
        // enumerate EVERY chunk origin, not just stored ones — HDF5 elides
        // never-written/all-fill chunks, but those rows still exist in the
        // dataspace (and in estimateStatistics' exact count): absent chunks
        // synthesize default-fill records, mirroring NetCdfScan
        val present = Hdf5.listChunks(src, ds).map(c => c.offsets.head -> c).toMap
        (0L until n by cn).iterator.map { org =>
          val rows = math.min(cn, n - org).toInt
          present.get(org) match {
            case Some(c) => Hdf5TableChunkPartition(org, rows, cn.toInt,
              c.addr, c.size, c.filterMask)
            case None => Hdf5TableFillPartition(org, rows)
          }
        }
      case Hdf5.Contiguous(addr, _) =>
        val batch = 65536L
        (0L until n by batch).iterator.map(start =>
          Hdf5TableRangePartition(addr + start * ct.size, start,
            math.min(batch, n - start).toInt))
      case Hdf5.Compact(data) =>
        Iterator.single(Hdf5TableInlinePartition(data, n.toInt))
    }
    // limit pushdown: stop planning once the cumulative rows cover it
    val out = Seq.newBuilder[InputPartition]
    var covered = 0L
    while (parts.hasNext && covered < cap) {
      val p = parts.next()
      out += p
      covered += (p match {
        case c: Hdf5TableChunkPartition => c.rows.toLong
        case r: Hdf5TableRangePartition => r.rows.toLong
        case i: Hdf5TableInlinePartition => i.rows.toLong
        case f: Hdf5TableFillPartition => f.rows.toLong
      })
    }
    val rowsPerPart = ds.layout match {
      case Hdf5.Chunked(_, chunkDims, _) => chunkDims.head.toLong
      case _ => 65536L
    }
    ChunkBundles.bundle(out.result().toArray, rowsPerPart * ct.size)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Hdf5TableReaderFactory(path, prunedCt, meta._1.filters, meta._3,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
}

private[sources] class Hdf5TableReaderFactory(path: String,
    ct: Hdf5.CompoundType, filters: Seq[Hdf5.Filter],
    fillRecord: Option[Array[Byte]],
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    partition match {
      case BundledPartition(ps) => return ChunkBundles.reader(ps, createReader)
      case _ =>
    }
    lazy val src = new NetCDF4Source.HadoopSource(conf.value, path)
    val (data, rows) = partition match {
      case c: Hdf5TableChunkPartition =>
        // defilter at the FULL chunk geometry — stored chunks are always
        // full-size; only c.rows records are decoded below
        (Hdf5.defilter(src.read(c.addr, c.size), filters, c.filterMask,
          c.chunkRows * ct.size), c.rows)
      case r: Hdf5TableRangePartition =>
        (src.read(r.addr, r.rows * ct.size), r.rows)
      case i: Hdf5TableInlinePartition => (i.data, i.rows)
      case f: Hdf5TableFillPartition =>
        // a DEFINED fill-value record replicates per row; without one the
        // format's default fill is all-zero bytes (0.0 / "")
        val data = new Array[Byte](f.rows * ct.size)
        fillRecord.foreach { fr =>
          var i = 0
          while (i < f.rows) { System.arraycopy(fr, 0, data, i * ct.size, ct.size); i += 1 }
        }
        (data, f.rows)
    }
    val cols: Seq[Array[_]] = Hdf5.decodeCompound(data, ct, rows, src).map(_._2)
    // nested compound members arrive as Seq[Any] per record → nested
    // InternalRows (strings as UTF8String at every depth)
    def toInternal(v: Any): Any = v match {
      case s: String => UTF8String.fromString(s)
      case arr: Array[Double] => // array member cell → ArrayData
        new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
      case seq: scala.collection.Seq[_] => InternalRow.fromSeq(seq.toSeq.map(toInternal))
      case o => o
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.map {
          case ds: Array[Double] => ds(i)
          case ss: Array[String] => UTF8String.fromString(ss(i))
          case o: Array[_] => toInternal(o(i))
        })
      override def close(): Unit = ()
    }
  }
}
