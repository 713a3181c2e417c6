package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a token array: k permutation minima of
  * h_i(t) = (a_i · xxh64(t) + b_i) mod p in one compiled pass per row —
  * the third "custom Expression where it pays" (SURVEY §4): the HOF
  * formulation (transform over seeds × transform over tokens) is
  * interpreted per element, this is one tight loop hashing each token
  * ONCE and updating k minima (O(tokens · k) multiplies, O(tokens)
  * hashes).
  *
  * Coefficients derive deterministically from `seed`; multipliers stay
  * < 2^21 and the token hash is reduced mod p < 2^32, so a·h + b < 2^53
  * — no long overflow under ANSI mode. */
case class MinHashSig(child: Expression, numHashes: Int = 32, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.expr.MinHashSig.compute($arr, $numHashes, ${seed}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  final val P: Long = 4294967291L // largest prime < 2^32

  /** (a_i, b_i) streams for a seed — same derivation on every executor. */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), (Array[Long], Array[Long])]()

  private def coeffs(seed: Long, k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((seed, k), { _ =>
      val rng = new scala.util.Random(seed)
      val as = Array.fill(k)((rng.nextInt(1 << 20).toLong << 1) | 1L)
      // floorMod, not .abs % P: Long.MinValue.abs is still negative and
      // would yield a negative b_i corrupting the min-tracking
      val bs = Array.fill(k)(java.lang.Math.floorMod(rng.nextLong(), P))
      (as, bs)
    })

  /** One pass: hash each token once, update all k minima. Called from
    * both interpreted eval and generated code. */
  def compute(tokens: ArrayData, k: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffs(seed, k)
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = java.lang.Math.floorMod(
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L), P)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSig(tokens: Column, numHashes: Int = 32, seed: Long = 42L): Column =
    CatalystBridge.column(MinHashSig(CatalystBridge.expression(tokens), numHashes, seed))
}
