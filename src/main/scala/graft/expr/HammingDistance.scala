package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen'd Catalyst expression: Hamming distance between two
  * 64-bit fingerprints (`popcount(a ^ b)`) — the hot inner comparison of
  * SimHash near-dup detection. A custom Expression (vs a Scala UDF)
  * keeps the comparison inside whole-stage codegen: no boxing, no
  * closure call per row — the SURVEY §4 preference-order (b) path.
  * Inputs must be LongType (both call sites produce 64-bit signatures). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Column-level entry point. */
  def hamming(a: Column, b: Column): Column =
    CatalystBridge.column(
      HammingDistance(CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
