package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Single-pass histogram quantile as a native Catalyst aggregate — the
  * `TypedImperativeAggregate` form of [[graft.operators.HistogramQuantile]]
  * (marEx D13, detect.py:2737–2865).
  *
  * The relational form shuffles (group, bin) rows; this one shuffles a
  * single fixed-size count buffer per group (nBins+1 longs), which wins when
  * groups are few and wide — the classic sketch trade-off. The evaluation
  * logic (CDF over *present* bins, linear interpolation between bin
  * centers, clamp to `lo` when all mass is below range) is kept literally
  * identical to the relational operator so the two are interchangeable.
  */
case class HistogramQuantileAgg(
    child: Expression,
    q: Double,
    lo: Double,
    width: Double,
    nBins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins + 1)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) {
        val bin = if (d < lo) 0
        else math.min(math.floor((d - lo) / width).toInt + 1, nBins)
        buf(bin) += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val total = buf.sum
    if (total == 0L) null
    else {
      def center(b: Int): Double = if (b >= 1) lo + (b - 0.5) * width else lo
      var cum = 0L
      var prevBin = -1
      var prevCdf = 0.0
      var i = 0
      var result: Any = null
      while (i < buf.length && result == null) {
        if (buf(i) > 0) {
          cum += buf(i)
          val cdf = cum.toDouble / total.toDouble
          if (cdf >= q) {
            result =
              if (i == 0) lo
              else {
                val cPrev = if (prevBin < 0) lo else center(prevBin)
                cPrev + (q - prevCdf) / (cdf - prevCdf) * (center(i) - cPrev)
              }
          } else { prevBin = i; prevCdf = cdf }
        }
        i += 1
      }
      result
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistogramQuantileAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "histogram_quantile"
}

object HistogramQuantileAgg {
  /** Column-API entry point: `df.groupBy(...).agg(histogramQuantile($"v", 0.95, 0, 25, 200))`. */
  def histogramQuantile(c: Column, q: Double, lo: Double, width: Double, nBins: Int): Column = {
    val e = GraftColumnBridge.expr(c)
    val d = if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    GraftColumnBridge.column(
      HistogramQuantileAgg(d, q, lo, width, nBins).toAggregateExpression())
  }
}
