package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with + aggregate) — no UDFs.
  *
  * Determinism: every element is cast to double BEFORE multiplying, and
  * the fold is a left-to-right sequential accumulation starting at 0.0 —
  * the exact sequence DuckDB's `list_reduce` produces — so dot products
  * and cosines are bit-identical between engine and oracle. */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision, sequential left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, p) => acc + p)

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
