package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY §2B "As-of join", §4 preference-order (c)):
  * for every left row (k, t), attach the right row with the greatest
  * t' <= t among rows with the same key (left outer semantics — no match
  * → nulls). DuckDB's `ASOF LEFT JOIN` is the oracle.
  *
  * Physicals: both sides hash-clustered on the key and sorted by
  * (key, time) — Spark inserts the exchanges/sorts — then a single
  * two-pointer merge per partition: O(|L| + |R|) with O(1) state (one
  * buffered right row), no window buffering, no self-join blow-up. At
  * 100 TB this is one co-partitioned shuffle per side and a streaming
  * scan, the same cost shape as a sort-merge join.
  *
  * The window-based composition (join_asof) computes the same result via
  * last(ignoreNulls) over an unbounded-preceding frame — correct, but it
  * carries every left row through the window machinery and can only
  * attach ONE value column; the native operator attaches the whole
  * matched right row.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None)
  extends BinaryNode {

  /** Right columns come back nullable (no-match rows). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

/** Directions, all left-outer, all O(|L|+|R|) over the same
  * co-partitioned (key, time)-sorted children:
  *   - backward: greatest rt <= t (the classic as-of);
  *   - forward: least rt >= t — smaller right rows are DROPPED (safe:
  *     left times ascend within a key, so a right row below this left
  *     time is below every later one) and the match is PEEKED, never
  *     consumed, since the same right row may serve many left rows;
  *   - nearest: backward candidate buffered as usual, forward
  *     candidate peeked at the head, closer exact-integer gap wins,
  *     ties to backward (pandas merge_asof rule). Gap arithmetic needs
  *     an integral-backed time (timestamp/date/integer — enforced by
  *     the [[graft.ops.AsOf]] API at plan time). */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    // Catalyst interpreted orderings: correct for every orderable type
    // (string, decimal, date, timestamp, struct, array) — a hand-rolled
    // Long/Int ladder would MatchError on anything else.
    val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftKey.dataType)
    val timeOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val schema = output

    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children must be co-partitioned " +
        s"(left=${lRdd.getNumPartitions}, right=${rRdd.getNumPartitions}); " +
        "EnsureRequirements/AQE should have aligned them")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      // ordering within a partition: (key asc, time asc) on both sides.
      // Two-pointer merge with one buffered right row per current key.
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema, schema)
      val rBuf = rIter.buffered

      // integral view of a time value for nearest's gap arithmetic
      // (timestamp = Long µs, date = Int days, integers as themselves)
      def toL(v: Any): Long = v match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case s: java.lang.Short => s.toLong
        case b: java.lang.Byte => b.toLong
        case other => throw new IllegalStateException(
          s"nearest as-of needs an integral-backed time, got $other")
      }

      new Iterator[InternalRow] {
        private var curKey: Any = _
        private var haveKey = false
        private var lastMatch: InternalRow = _ // copied right row, time <= left time

        private def headSameKey: Boolean = rBuf.hasNext && {
          val rk = rKey.eval(rBuf.head)
          rk != null && keyOrd.equiv(rk, curKey)
        }

        /** Emit the joined row, nulling the match when it falls
          * outside the staleness tolerance (pandas merge_asof
          * tolerance; the gap is exact integer time units, so the
          * bound is deterministic). */
        private def emit(l: InternalRow, t: Any, m: InternalRow): InternalRow = {
          val ok = m != null && (tolerance match {
            case Some(tol) => math.abs(toL(t) - toL(rTime.eval(m))) <= tol
            case None => true
          })
          project(joined(l, if (ok) m else nullRight))
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKey.eval(l)
          val t = lTime.eval(l)
          if (k == null || t == null) {
            // SQL join semantics: null keys/times never match (an
            // unboxed null would silently read as epoch 0)
            return project(joined(l, nullRight))
          }
          if (!haveKey || !keyOrd.equiv(curKey, k)) {
            // COPY the evaluated key: for string/binary/struct keys the
            // eval result is a view into a reused UnsafeRow buffer that
            // the next iterator advance silently overwrites
            curKey = InternalRow.copyValue(k)
            haveKey = true
            lastMatch = null
            // drop right rows with null key (sorted first, never match)
            // or key < current left key
            var dropping = true
            while (dropping && rBuf.hasNext) {
              val rk = rKey.eval(rBuf.head)
              if (rk == null || keyOrd.lt(rk, curKey)) rBuf.next()
              else dropping = false
            }
          }
          direction match {
            case "forward" =>
              // drop same-key rows strictly below t (they can never
              // match this or any later left row of this key); the
              // match is the head, PEEKED not consumed — it may serve
              // later left rows too
              var advance = true
              while (advance && headSameKey) {
                val rt = rTime.eval(rBuf.head)
                if (rt == null || timeOrd.lt(rt, t)) rBuf.next()
                else advance = false
              }
              emit(l, t, if (headSameKey) rBuf.head else null)
            case "nearest" =>
              // backward candidate: consume rows with rt <= t as usual
              var advance = true
              while (advance && headSameKey) {
                val rt = rTime.eval(rBuf.head)
                if (rt == null) rBuf.next()
                else if (timeOrd.lteq(rt, t)) lastMatch = rBuf.next().copy()
                else advance = false
              }
              // forward candidate: the head (rt > t by construction)
              val fwd = if (headSameKey) rBuf.head else null
              val m =
                if (lastMatch == null) fwd
                else if (fwd == null) lastMatch
                else {
                  val tl = toL(t)
                  val bGap = tl - toL(rTime.eval(lastMatch))
                  val fGap = toL(rTime.eval(fwd)) - tl
                  if (bGap <= fGap) lastMatch else fwd
                }
              emit(l, t, m)
            case _ => // backward
              // consume right rows with same key and time <= t; null
              // right times sort first (asc) and must never match
              var advance = true
              while (advance && headSameKey) {
                val rt = rTime.eval(rBuf.head)
                if (rt == null) rBuf.next() // skip, never buffer
                else if (timeOrd.lteq(rt, t)) lastMatch = rBuf.next().copy()
                else advance = false
              }
              emit(l, t, lastMatch)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
