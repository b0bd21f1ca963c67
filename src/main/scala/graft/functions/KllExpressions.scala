package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketches as first-class columns — the quantile
  * analog of Spark's built-in `hll_sketch_agg`/`hll_union` family (which
  * Spark 4 ships for distinct counts but not for quantiles). Sketches are
  * Apache DataSketches `KllDoublesSketch` serialized to BINARY, so a
  * 100 TB warehouse can pre-aggregate one small sketch per ingest
  * partition (a narrow pass over raw values) and serve any coarser
  * percentile rollup by merging O(groups) few-KB blobs — the raw values
  * are never re-shuffled. KLL rank error at k=200 is ≈1.65% (99% conf.),
  * and merges never degrade the guarantee below the smallest k involved.
  *
  * The aggregation is a [[TypedImperativeAggregate]] — the live heap
  * sketch is the aggregation buffer (serialized only at shuffle
  * boundaries), the same machinery as Spark's own HLL/percentile
  * aggregates, not a per-row UDF.
  */
object KllExpressions {
  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `kll_sketch_agg(value, k)`: aggregate raw DOUBLE values into one
  * serialized KLL sketch per group.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k must be in [8, 65535], got $k")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllExpressions.heapify(bytes)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a DOUBLE input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch, k)`: union serialized KLL sketches into one.
  * The target buffer uses `k`; merging sketches built with a smaller k
  * lowers the merged guarantee to that k (DataSketches merge semantics) —
  * pass the k the sketches were built with.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_merge_agg: k must be in [8, 65535], got $k")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllExpressions.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllExpressions.heapify(bytes)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires a BINARY sketch input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_merge(a, b)`: pairwise scalar union of two serialized sketches —
  * the KLL analog of Spark's `hll_union`, for advancing a stored sketch
  * column by a delta sketch row-by-row (the incremental sketch-table
  * shape). NULL if either side is NULL.
  */
case class KllMerge(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge requires (BINARY, BINARY), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sk = KllExpressions.heapify(a.asInstanceOf[Array[Byte]])
    sk.merge(KllExpressions.heapify(b.asInstanceOf[Array[Byte]]))
    sk.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllMerge =
    copy(left = newLeft, right = newRight)
}

/** `kll_quantile(sketch, rank)`: the estimated `rank`-quantile value of a
  * serialized sketch (INCLUSIVE search, the DataSketches default). NULL
  * for a NULL or empty sketch. Scalar extraction runs over O(groups)
  * already-aggregated rows, so CodegenFallback costs nothing measurable.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (BINARY, DOUBLE), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val sk = KllExpressions.heapify(sketchBytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Column API for the KLL family (SQL names register via
  * [[graft.functions.Registry]]).
  */
object KllFunctions {
  def kllSketchAgg(value: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(value.cast("double")), k).toAggregateExpression())

  def kllMergeAgg(sketch: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(sketch), k).toAggregateExpression())

  def kllMerge(a: Column, b: Column): Column =
    ColumnBridge.column(KllMerge(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def kllQuantile(sketch: Column, rank: Double): Column =
    ColumnBridge.column(
      KllQuantile(ColumnBridge.expression(sketch),
        org.apache.spark.sql.catalyst.expressions.Literal(rank)))
}
