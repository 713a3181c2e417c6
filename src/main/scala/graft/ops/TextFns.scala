package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Shared text-column builders used across the dedup/text/hygiene
  * modules — one implementation so the shingle definition can't drift
  * between candidate generation, counting, and decontamination. */
object TextFns {

  /** Word k-grams as a codegen'd HOF over a pre-split token array,
    * guarded for docs shorter than k. `words` must be a materialized
    * array column — passing `split(...)` directly would re-split the
    * text per element access inside the lambda (O(words²) per doc). */
  def wordGrams(words: Column, k: Int): Column =
    when(size(words) < k, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(words) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(words, i + o)): _*)))

  /** Adjacent element pairs of an array as (l, r) structs, guarded for
    * single-element arrays (BPE pair counting). */
  def adjacentPairs(units: Column): Column =
    when(size(units) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(
        sequence(lit(1), size(units) - 1),
        i => struct(element_at(units, i).as("l"), element_at(units, i + 1).as("r"))))
}
