package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the
  * native codegen'd [[VecDot]] expression (a HOF composition
  * `aggregate(zip_with(...))` computes the same value ~100× slower —
  * higher-order lambdas are interpreted per element).
  *
  * Determinism: every element is widened to double BEFORE multiplying,
  * and the fold is a left-to-right sequential accumulation starting at
  * 0.0 — the exact sequence DuckDB's `list_reduce` produces — so dot
  * products and cosines are bit-identical between engine and oracle. */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision, sequential left fold. */
  def dot(a: Column, b: Column): Column = VecDot.vecDot(a, b)

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** DuckDB SQL fragment computing the same double-precision dot
    * product with the same fold order, for oracle queries.
    * `dim` must match the fixed embedding dimension. */
  def duckDot(a: String, b: String, dim: Int = 64): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       | i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
       | (x, y) -> x + y)""".stripMargin.replaceAll("\n", "")

  def duckCosine(a: String, b: String, dim: Int = 64): String =
    s"(${duckDot(a, b, dim)}) / (sqrt(${duckDot(a, a, dim)}) * sqrt(${duckDot(b, b, dim)}))"
}
