package graft.expr

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Re-aggregatable quantile sketches (DataSketches KLL) as native
  * Catalyst aggregates — the quantile twin of Spark's built-in
  * `hll_sketch_agg`/`hll_union_agg` distinct-count pair, which Spark
  * does not ship for quantiles.
  *
  * Why `TypedImperativeAggregate` and not a typed `Aggregator`: the
  * object buffer lives on the heap across `update` calls and is
  * serialized ONLY at partial-aggregation shuffle boundaries; an
  * `Aggregator[.., Array[Byte], ..]` would deserialize + reserialize
  * the sketch on every input row — O(rows) codec work vs O(partitions).
  * That distinction is the whole 100 TB story: sketch each partition
  * once, ship k-bounded bytes (~2 KB at k=200), merge forever after —
  * per-day quantile sketches roll up to monthly/yearly percentiles
  * without ever rescanning the raw column.
  *
  * Note KLL compaction is randomized (coin-flip offset selection), so
  * estimates carry the published rank-error bound (~1.65% at k=200)
  * but are not bit-stable across runs — queries built on these are
  * rows-only checks; FeatureSpec pins the error bound and the
  * merge-equals-direct contract instead. */
object KllSketch {

  /** `kll_sketch_agg(x, k)` as a Column (input cast to double). */
  def sketchAgg(c: Column, k: Int = 200): Column =
    CatalystBridge.column(
      KllSketchAgg(CatalystBridge.expression(c.cast("double")), k)
        .toAggregateExpression())

  /** `kll_merge_agg(sketchBytes, k)` as a Column. */
  def mergeAgg(c: Column, k: Int = 200): Column =
    CatalystBridge.column(
      KllMergeAgg(CatalystBridge.expression(c), k).toAggregateExpression())

  /** `kll_quantile(sketchBytes, rank)` as a Column. */
  def quantile(c: Column, rank: Double): Column =
    CatalystBridge.column(KllQuantile(
      CatalystBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(rank)))

  private[expr] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Shared TypedImperativeAggregate plumbing for the two KLL aggregates:
  * buffer = heap sketch, storage format = DataSketches' own portable
  * byte layout. */
trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.heapify(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Builds a KLL quantile sketch over a double column; returns the
  * serialized sketch (re-aggregatable via [[KllMergeAgg]]). */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.simpleString}")

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Unions serialized KLL sketches — the roll-up step: per-partition
  * sketch bytes in, one merged sketch out, raw data never rescanned. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires serialized sketch bytes (binary), got " +
        child.dataType.simpleString)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `kll_quantile(sketchBytes, rank)` — scalar estimate read-out.
  * Runs once per GROUP result row, not per input row, so interpreted
  * (CodegenFallback) evaluation is off the hot path by construction. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def nullSafeEval(sk: Any, rank: Any): Any = {
    val sketch = KllSketch.heapify(sk.asInstanceOf[Array[Byte]])
    if (sketch.isEmpty) null
    else sketch.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}
