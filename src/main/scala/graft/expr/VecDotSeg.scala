package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Segment dot product: Σ left[lstart+i] · right[rstart+i] for
  * i < length, accumulated in double with the same strict sequential
  * left-to-right fold as [[VecDot]] (bit-identical to a dot over
  * materialized `slice(...)` copies and to DuckDB's list_reduce over a
  * sliced list). Exists so per-row folds over product-quantization
  * subspaces can index straight into the stored embedding instead of
  * allocating a subvector copy per (codeword × reference) — inside an
  * interpreted higher-order-function lambda those copies dominated the
  * profile (hundreds of slice evaluations per row). Offsets are
  * 0-based and may be non-foldable (a lambda variable). */
case class VecDotSeg(left: Expression, right: Expression,
    leftStart: Expression, rightStart: Expression, length: Expression)
  extends QuinaryExpression {

  override def children: Seq[Expression] =
    Seq(left, right, leftStart, rightStart, length)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_seg"
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (arr(left.dataType) && arr(right.dataType) &&
        Seq(leftStart, rightStart, length).forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>, int, int, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(a: Any, b: Any, ls: Any, rs: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lo = ls.asInstanceOf[Int]
    val ro = rs.asInstanceOf[Int]
    val len = math.min(n.asInstanceOf[Int],
      math.min(x.numElements() - lo, y.numElements() - ro))
    var acc = 0.0
    var i = 0
    while (i < len) {
      acc += x.getFloat(lo + i).toDouble * y.getFloat(ro + i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, ls, rs, n) => {
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $len = java.lang.Math.min($n,
         |  java.lang.Math.min($a.numElements() - $ls, $b.numElements() - $rs));
         |double $acc = 0.0;
         |for (int $i = 0; $i < $len; $i++) {
         |  $acc += ((double) $a.getFloat($ls + $i)) * ((double) $b.getFloat($rs + $i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(left = c(0), right = c(1), leftStart = c(2), rightStart = c(3), length = c(4))
}

object VecDotSeg {
  def vecDotSeg(a: Column, b: Column, aStart: Column, bStart: Column, len: Column): Column =
    CatalystBridge.column(VecDotSeg(
      CatalystBridge.expression(a), CatalystBridge.expression(b),
      CatalystBridge.expression(aStart), CatalystBridge.expression(bStart),
      CatalystBridge.expression(len)))
}
