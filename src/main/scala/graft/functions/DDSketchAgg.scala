package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** DDSketch build as a `TypedImperativeAggregate` — the execution form
  * Spark's own complex-state aggregates (approx_percentile, HLL++) use:
  * the buffer is a PLAIN JVM OBJECT mutated in place per row and
  * serialized ONLY at partial/final boundaries, where the
  * `Aggregator`-via-`udaf` form ([[graft.sketch.Quantiles.Agg]]) pays an
  * encoder round-trip of the whole bucket map on EVERY input row (~6x
  * slower on a 600k-row build at sf0.1). Same state, same merge, same
  * result struct `(pos map<int,bigint>, neg map<int,bigint>, zero
  * bigint)` — SketchSpec proves all three build paths identical; the
  * bucket mapping is the shared [[graft.sketch.Quantiles.bucketOf]].
  */
object DDSketchAgg {

  /** Mutable aggregation state: bucket -> count (keys widened to Long
    * for `LongMap`'s boxing-free updates), plus the zero count.
    */
  final class Buf(val pos: mutable.LongMap[Long],
                  val neg: mutable.LongMap[Long],
                  var zero: Long) {
    /** Lowest retained positive bucket once a per-row collapse has run
      * (Long.MinValue = not established). Sub-floor inserts fold into
      * this bucket directly — without it, a descending or wide-range
      * stream at the bin cap pays a full key-array sort PER ROW. Not
      * serialized: merge() re-establishes or disables it, and a fresh
      * deserialized buffer starts disabled, so the fast path never
      * fires when lower keys might legitimately exist in the map.
      */
    var posFloor: Long = Long.MinValue
  }

  val OutType: StructType = StructType(Seq(
    StructField("pos", MapType(IntegerType, LongType, valueContainsNull = false), nullable = false),
    StructField("neg", MapType(IntegerType, LongType, valueContainsNull = false), nullable = false),
    StructField("zero", LongType, nullable = false)))

  /** `sketch(v, gamma)` — aggregate Column over a double value column. */
  def sketch(v: Column, gamma: Double, maxBins: Int = 4096): Column =
    GraftSqlBridge.column(
      Sketch(GraftSqlBridge.expression(v), gamma, maxBins)
        .toAggregateExpression(isDistinct = false))

  case class Sketch(child: Expression, gamma: Double,
                    maxBins: Int = 4096,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {

    // no ExpectsInputTypes (AbstractDataType is private[sql]): the child
    // must already be DoubleType — checked at analysis, not implicit-cast
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_sketch needs a double input, got ${child.dataType.simpleString}")
    override def dataType: DataType = OutType
    override def nullable: Boolean = false
    override def prettyName: String = "dd_sketch"

    override def children: Seq[Expression] = child :: Nil
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Sketch =
      copy(child = newChildren.head)
    override def withNewMutableAggBufferOffset(n: Int): Sketch =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): Sketch =
      copy(inputAggBufferOffset = n)

    override def createAggregationBuffer(): Buf =
      new Buf(mutable.LongMap.empty, mutable.LongMap.empty, 0L)

    /** [[graft.sketch.Quantiles.Sketch.collapsed]]'s policy on the
      * mutable store: when the positive store exceeds `maxBins`, fold
      * the LOWEST buckets into the lowest kept one — upper quantiles
      * keep their gamma guarantee, state stays O(maxBins) on
      * unbounded-range inputs. A no-op below the cap, so the
      * spec-proven identity with `Quantiles.Agg` holds exactly (same
      * cap, same policy, same default).
      */
    /** Sort-based multi-bucket collapse (merge boundaries, where the
      * combined map can exceed the cap by many keys). Returns the new
      * floor bucket, or Long.MinValue if no collapse was needed.
      */
    private def collapse(m: mutable.LongMap[Long]): Long =
      if (m.size > maxBins) {
        val keys = m.keys.toArray
        java.util.Arrays.sort(keys)
        val nLow = keys.length - maxBins
        val floorIdx = keys(nLow)
        var folded = 0L
        var i = 0
        while (i < nLow) { folded += m(keys(i)); m -= keys(i); i += 1 }
        m(floorIdx) = m(floorIdx) + folded
        floorIdx
      } else Long.MinValue

    /** Single-overflow collapse for the update path (size is exactly
      * maxBins+1 there): fold the smallest key into the second
      * smallest — one O(bins) scan, no sort, no array allocation.
      * State-identical to collapse() with nLow = 1.
      */
    private def collapseOne(b: Buf): Unit = {
      var lo = Long.MaxValue; var lo2 = Long.MaxValue
      val it = b.pos.keysIterator
      while (it.hasNext) {
        val k = it.next()
        if (k < lo) { lo2 = lo; lo = k } else if (k < lo2) lo2 = k
      }
      val folded = b.pos(lo)
      b.pos -= lo
      b.pos(lo2) = b.pos(lo2) + folded
      b.posFloor = lo2
    }

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        val d = v.asInstanceOf[Double]
        if (d == 0.0) b.zero += 1
        else if (d > 0) {
          val i = graft.sketch.Quantiles.bucketOf(d, gamma).toLong
          if (b.posFloor != Long.MinValue && i <= b.posFloor)
            // at-cap fast path: identical end state to insert-then-
            // collapse (which folds the new lone sub-floor key straight
            // into the floor bucket), minus the per-row sort
            b.pos(b.posFloor) = b.pos(b.posFloor) + 1
          else {
            b.pos(i) = b.pos.getOrElse(i, 0L) + 1
            if (b.pos.size > maxBins) collapseOne(b)
          }
        } else {
          val i = graft.sketch.Quantiles.bucketOf(-d, gamma).toLong
          b.neg(i) = b.neg.getOrElse(i, 0L) + 1
        }
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      b.pos.foreach { case (k, v) => a.pos(k) = a.pos.getOrElse(k, 0L) + v }
      b.neg.foreach { case (k, v) => a.neg(k) = a.neg.getOrElse(k, 0L) + v }
      a.zero += b.zero
      // the merged map may contain keys below either side's old floor;
      // only a fresh collapse may re-arm the fast path
      a.posFloor = collapse(a.pos)
      a
    }

    private def toMapData(m: mutable.LongMap[Long]): ArrayBasedMapData = {
      val ks = new Array[Any](m.size)
      val vs = new Array[Any](m.size)
      var i = 0
      m.foreach { case (k, v) => ks(i) = k.toInt; vs(i) = v; i += 1 }
      new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
    }

    override def eval(b: Buf): Any =
      InternalRow(toMapData(b.pos), toMapData(b.neg), b.zero)

    override def serialize(b: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 4 * 2 + 12 * (b.pos.size + b.neg.size))
      bb.putLong(b.zero)
      bb.putInt(b.pos.size)
      b.pos.foreach { case (k, v) => bb.putInt(k.toInt); bb.putLong(v) }
      bb.putInt(b.neg.size)
      b.neg.foreach { case (k, v) => bb.putInt(k.toInt); bb.putLong(v) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val b = createAggregationBuffer()
      b.zero = bb.getLong
      var n = bb.getInt
      while (n > 0) { b.pos(bb.getInt.toLong) = bb.getLong; n -= 1 }
      n = bb.getInt
      while (n > 0) { b.neg(bb.getInt.toLong) = bb.getLong; n -= 1 }
      b
    }
  }
}
