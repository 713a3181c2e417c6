package graft.expr

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch => DsSketch, Sketches, UpdateSketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (DataSketches) as native Catalyst aggregates: the
  * distinct-count sketch with SET ALGEBRA. HLL answers |A| only; theta
  * sketches additionally answer |A ∩ B| and |A ∖ B| from the sketches
  * alone — the audience-overlap / cross-corpus-contamination question
  * ("how many users clicked AND viewed", "how many training docs also
  * appear in the eval set") computed from per-partition sketch bytes
  * without ever co-shuffling the raw keys.
  *
  * Same buffer discipline as [[KllSketchAgg]]: heap object across
  * `update` calls, serialized only at partial-aggregation shuffle
  * boundaries. Below the nominal-entries threshold (default 4096) a
  * theta sketch is EXACT (no sampling has started), so fixture-scale
  * results are deterministic and oracle-checkable; above it, estimates
  * carry the published relative-error bound — the query contract
  * documents which regime it relies on. */
object ThetaSketch {

  val DefaultNominal = 4096

  /** `theta_sketch_agg(x)` as a Column. */
  def sketchAgg(c: Column): Column =
    CatalystBridge.column(
      ThetaSketchAgg(CatalystBridge.expression(c)).toAggregateExpression())

  /** `theta_union_agg(sketchBytes)` as a Column. */
  def unionAgg(c: Column): Column =
    CatalystBridge.column(
      ThetaUnionAgg(CatalystBridge.expression(c)).toAggregateExpression())

  def estimate(c: Column): Column =
    CatalystBridge.column(ThetaEstimate(CatalystBridge.expression(c)))

  def intersect(a: Column, b: Column): Column =
    CatalystBridge.column(ThetaIntersect(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  def aNotB(a: Column, b: Column): Column =
    CatalystBridge.column(ThetaANotB(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  private[expr] def heapify(bytes: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))
}

/** Aggregation buffer: raw updates go to a local UpdateSketch; merged
  * partial results accumulate in a lazily-created Union. `result` folds
  * both — called exactly once, at serialize/eval time. */
final class ThetaBuf(nominal: Int) {
  val upd: UpdateSketch =
    UpdateSketch.builder().setNominalEntries(nominal).build()
  var merged: Union = null
  def ensureUnion(): Union = {
    if (merged == null)
      merged = SetOperation.builder().setNominalEntries(nominal).buildUnion()
    merged
  }
  def result: CompactSketch =
    if (merged == null) upd.compact(true, null)
    else { merged.union(upd.compact(true, null)); merged.getResult }
}

trait ThetaAggBase extends TypedImperativeAggregate[ThetaBuf] {
  def nominal: Int
  override def createAggregationBuffer(): ThetaBuf = new ThetaBuf(nominal)
  override def merge(b: ThetaBuf, o: ThetaBuf): ThetaBuf = {
    b.ensureUnion().union(o.result); b
  }
  override def eval(b: ThetaBuf): Any = b.result.toByteArray
  override def serialize(b: ThetaBuf): Array[Byte] = b.result.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaBuf = {
    val buf = new ThetaBuf(nominal)
    buf.ensureUnion().union(ThetaSketch.heapify(bytes))
    buf
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Builds a theta sketch over a long/int/string key column. */
case class ThetaSketchAgg(
    child: Expression,
    nominal: Int = ThetaSketch.DefaultNominal,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int/string key, got ${dt.simpleString}")
  }

  override def update(b: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long    => b.upd.update(l.longValue())
      case i: java.lang.Integer => b.upd.update(i.longValue())
      case s: UTF8String        => b.upd.update(s.toString)
      case other => throw new IllegalStateException(
        s"theta_sketch_agg: unexpected input ${other.getClass}")
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Unions serialized theta sketches — the roll-up aggregate. */
case class ThetaUnionAgg(
    child: Expression,
    nominal: Int = ThetaSketch.DefaultNominal,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase with UnaryLike[Expression] {

  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires serialized sketch bytes (binary), got " +
        child.dataType.simpleString)

  override def update(b: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = child.eval(input)
    if (v != null)
      b.ensureUnion().union(ThetaSketch.heapify(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** `theta_estimate(sketchBytes)` — distinct-count estimate read-out.
  * Group-result cardinality, not row cardinality → CodegenFallback is
  * off the hot path by construction (same stance as [[KllQuantile]]). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires sketch bytes (binary), got ${child.dataType.simpleString}")
  override protected def nullSafeEval(v: Any): Any =
    ThetaSketch.heapify(v.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Shared shape for the pairwise sketch set operations. */
trait ThetaSetOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two sketch-bytes (binary) arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  protected def apply(a: DsSketch, b: DsSketch): CompactSketch
  override protected def nullSafeEval(a: Any, b: Any): Any =
    apply(ThetaSketch.heapify(a.asInstanceOf[Array[Byte]]),
      ThetaSketch.heapify(b.asInstanceOf[Array[Byte]])).toByteArray
}

/** `theta_intersect(a, b)` → sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaSetOp {
  override def prettyName: String = "theta_intersect"
  override protected def apply(a: DsSketch, b: DsSketch): CompactSketch =
    SetOperation.builder().buildIntersection().intersect(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

/** `theta_a_not_b(a, b)` → sketch of A ∖ B. */
case class ThetaANotB(left: Expression, right: Expression) extends ThetaSetOp {
  override def prettyName: String = "theta_a_not_b"
  override protected def apply(a: DsSketch, b: DsSketch): CompactSketch = {
    val op = SetOperation.builder().buildANotB()
    op.setA(a); op.notB(b); op.getResult(true)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB =
    copy(left = l, right = r)
}
