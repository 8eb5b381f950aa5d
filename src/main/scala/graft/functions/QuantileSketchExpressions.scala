package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Mergeable quantile sketches — the percentile analog of the HLL family
 * (C16): keep the SKETCH, not the number, so per-partition/per-day
 * summaries roll up to any coarser grouping without rescanning raw data.
 * Spark's `approx_percentile` uses exactly this Greenwald-Khanna summary
 * internally but never exposes the state; these aggregates persist it as
 * a binary column (a few KB per group at ε rank error), `merge` unions
 * previously-built sketches, and `query` reads any quantile out.
 */
object QuantileSketchCodec {
  /** (compressThreshold, relativeError, count, n, [value, g, delta]*) */
  def encode(s0: QuantileSummaries): Array[Byte] = {
    val s = s0.compress()
    val st = s.sampled
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + st.length * 24)
    bb.putInt(s.compressThreshold)
    bb.putDouble(s.relativeError)
    bb.putLong(s.count)
    bb.putInt(st.length)
    st.foreach { x => bb.putDouble(x.value); bb.putLong(x.g); bb.putLong(x.delta) }
    bb.array()
  }

  def decode(bytes: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ct = bb.getInt
    val re = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    val st = Array.tabulate(n)(_ =>
      QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(ct, re, st, count, true)
  }

  def empty(relativeError: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)
}

/** Build a quantile sketch of a double column (binary, persistable). */
case class QuantileSketchAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1, "relativeError must be in (0, 1)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): QuantileSummaries =
    QuantileSketchCodec.empty(relativeError)

  override def update(b: QuantileSummaries, row: InternalRow): QuantileSummaries = {
    val v = child.eval(row)
    if (v == null) b else b.insert(v.asInstanceOf[Double])
  }

  override def merge(b: QuantileSummaries, o: QuantileSummaries): QuantileSummaries =
    b.compress().merge(o.compress())

  override def eval(b: QuantileSummaries): Any = QuantileSketchCodec.encode(b)

  override def serialize(b: QuantileSummaries): Array[Byte] = QuantileSketchCodec.encode(b)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.decode(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}

/** Union previously-built sketches (the rescan-free rollup path). */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_merge"

  // ε is carried inside each incoming sketch; the empty buffer's own ε is
  // irrelevant (merge with an empty side returns the other side).
  override def createAggregationBuffer(): QuantileSummaries =
    QuantileSketchCodec.empty(QuantileSummaries.defaultRelativeError)

  // Invariant: the buffer is always compressed (head buffer empty) — it is
  // only ever an empty summary or a merge() result, and insert() is never
  // called on it. So merging needs NO per-row compress: decoded inputs are
  // encoded compressed, and merge() of two compressed summaries returns a
  // compressed summary. (The build agg above DOES compress in merge —
  // its buffer accumulates raw insert()s.)
  override def update(b: QuantileSummaries, row: InternalRow): QuantileSummaries = {
    val v = child.eval(row)
    if (v == null) b
    else b.merge(QuantileSketchCodec.decode(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b: QuantileSummaries, o: QuantileSummaries): QuantileSummaries =
    b.merge(o)

  override def eval(b: QuantileSummaries): Any = QuantileSketchCodec.encode(b)

  override def serialize(b: QuantileSummaries): Array[Byte] = QuantileSketchCodec.encode(b)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.decode(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchMergeAgg =
    copy(child = c)
}

/** Read one quantile out of a sketch binary. Evaluated once per GROUP row
  * (not per input row), so CodegenFallback costs nothing measurable. */
case class QuantileSketchQuery(child: Expression, q: Double)
    extends UnaryExpression with CodegenFallback {

  require(q >= 0 && q <= 1, "quantile must be in [0, 1]")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty sketch → null quantile
  override def prettyName: String = "quantile_sketch_query"

  override def nullSafeEval(input: Any): Any = {
    val s = QuantileSketchCodec.decode(input.asInstanceOf[Array[Byte]])
    if (s.count == 0) null else s.query(q).map(Double.box).orNull
  }

  override protected def withNewChildInternal(c: Expression): QuantileSketchQuery =
    copy(child = c)
}

/** Column-level entry points. */
object QuantileSketchFunctions {
  def quantileSketch(value: Column, relativeError: Double = 0.01): Column =
    bridge.column(QuantileSketchAgg(bridge.expression(value), relativeError)
      .toAggregateExpression())

  def quantileSketchMerge(sketch: Column): Column =
    bridge.column(QuantileSketchMergeAgg(bridge.expression(sketch))
      .toAggregateExpression())

  def sketchQuantile(sketch: Column, q: Double): Column =
    bridge.column(QuantileSketchQuery(bridge.expression(sketch), q))
}
