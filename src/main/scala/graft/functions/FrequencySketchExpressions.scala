package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Mergeable COUNT-MIN frequency sketches — the per-item-count analog of
 * the HLL (distinct), GK (quantile) and frequent-items (top-k) families:
 * a fixed depth×width counter grid answering "how often did THIS item
 * occur?" in O(depth) with a +εN overestimate bound and zero
 * underestimation. Spark ships the data structure
 * (`org.apache.spark.util.sketch.CountMinSketch`, also used by its own
 * `count_min_sketch` SQL aggregate) but exposes no SQL-level merge or
 * point query; these aggregates persist the grid as a binary column,
 * union previously-built sketches, and read any item's estimate out.
 *
 * CMS counters are plain sums, so merge is EXACTLY associative and
 * commutative: a rollup of fine-group sketches lands on the identical
 * grid a one-shot build produces — estimates are equal, not merely
 * close. q97 pins that merge law (plus the no-underestimate bound)
 * against the DuckDB oracle.
 */
object CountMinCodec {
  def encode(s: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }
  def decode(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Spark's CMS dispatches on runtime item type; normalize Catalyst
    * internal values to the JVM types it hashes (UTF8String → String). */
  def item(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case other => other
  }

  def itemTypeCheck(dt: DataType, who: String): TypeCheckResult =
    if (dt == StringType || dt == LongType || dt == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$who supports string/long/int items, got $dt")
}

/** Build a count-min sketch of an item column (binary, persistable). */
case class CountMinAgg(child: Expression, depth: Int, width: Int, seed: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  require(depth >= 1 && width >= 1, "depth and width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    CountMinCodec.itemTypeCheck(child.dataType, prettyName)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_build"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(b: CountMinSketch, row: InternalRow): CountMinSketch = {
    val v = child.eval(row)
    if (v != null) b.add(CountMinCodec.item(v))
    b
  }

  override def merge(b: CountMinSketch, o: CountMinSketch): CountMinSketch = {
    b.mergeInPlace(o); b
  }

  override def eval(b: CountMinSketch): Any = CountMinCodec.encode(b)
  override def serialize(b: CountMinSketch): Array[Byte] = CountMinCodec.encode(b)
  override def deserialize(bytes: Array[Byte]): CountMinSketch = CountMinCodec.decode(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

/** Union previously-built count-min sketches (the rescan-free rollup).
  * All inputs must share depth/width/seed (mergeInPlace enforces it). */
case class CountMinMergeAgg(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[CountMinSketch]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // no input sketches → null
  override def prettyName: String = "count_min_merge"

  // The empty buffer carries no grid geometry of its own (it can't know the
  // incoming depth/width/seed), so it is None until the first sketch lands.
  override def createAggregationBuffer(): Option[CountMinSketch] = None

  private def mergeOpt(b: Option[CountMinSketch],
                       o: Option[CountMinSketch]): Option[CountMinSketch] = (b, o) match {
    case (Some(x), Some(y)) => x.mergeInPlace(y); Some(x)
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }

  override def update(b: Option[CountMinSketch], row: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(row)
    if (v == null) b
    else mergeOpt(b, Some(CountMinCodec.decode(v.asInstanceOf[Array[Byte]])))
  }

  override def merge(b: Option[CountMinSketch],
                     o: Option[CountMinSketch]): Option[CountMinSketch] = mergeOpt(b, o)

  override def eval(b: Option[CountMinSketch]): Any =
    b.map(CountMinCodec.encode).orNull

  override def serialize(b: Option[CountMinSketch]): Array[Byte] =
    b.map(CountMinCodec.encode).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CountMinSketch] =
    if (bytes.isEmpty) None else Some(CountMinCodec.decode(bytes))

  override def withNewMutableAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinMergeAgg =
    copy(child = c)
}

/** Point-query an item's estimated count out of a sketch binary.
  *
  * Evaluated once per READ-OUT row (a (group, item) vocabulary frame —
  * sketch-table-sized, never corpus-sized), so CodegenFallback is fine;
  * but each eval decodes the binary (depth×width longs), so don't drive
  * it with a vocabulary of millions — slice the vocab and reuse decoded
  * sketches via mapPartitions if that day comes. */
case class CountMinQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a binary sketch, got ${left.dataType}")
    else CountMinCodec.itemTypeCheck(right.dataType, prettyName)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "count_min_query"

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CountMinCodec.decode(sketch.asInstanceOf[Array[Byte]])
      .estimateCount(CountMinCodec.item(item))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinQuery =
    copy(left = l, right = r)
}

/** Column-level entry points. */
object CountMinFunctions {
  def countMinSketchOf(item: Column, depth: Int = 5, width: Int = 2048,
                       seed: Int = 42): Column =
    bridge.column(CountMinAgg(bridge.expression(item), depth, width, seed)
      .toAggregateExpression())

  def countMinMerge(sketch: Column): Column =
    bridge.column(CountMinMergeAgg(bridge.expression(sketch))
      .toAggregateExpression())

  def countMinEstimate(sketch: Column, item: Column): Column =
    bridge.column(CountMinQuery(bridge.expression(sketch), bridge.expression(item)))
}
