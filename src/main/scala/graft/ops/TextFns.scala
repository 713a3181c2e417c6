package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Shared text-column builders used across the dedup/text/hygiene
  * modules — one implementation so the shingle definition can't drift
  * between candidate generation, counting, and decontamination. */
object TextFns {

  /** One greedy left-to-right BPE merge pass: every adjacent (l, r)
    * pair in `units` collapses to the merged symbol, scanning once
    * (so "a a a" under (a,a) gives ["aa","a"], never ["a","aa"]).
    * The fold the trainer applies per learned rule and the encoder
    * applies per table entry — pure array/string ops, replayed exactly
    * by DuckDB's list_reduce over singleton lists. */
  def applyMerge(units: Column, l: String, r: String): Column =
    aggregate(units, array().cast("array<string>"),
      (acc, u) => when(
        size(acc) > 0 && element_at(acc, -1) === l && u === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(u))))

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
