package graft

import org.apache.spark.sql.functions._

/** Feature-engineering invariants (ops.Features). */
class FeatureSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("sketch_countmin: never underestimates, and exact where no collision") {
    val out = q("sketch_countmin").cache()
    // The defining count-min property: estimate >= true count, always.
    assert(out.filter(col("cm_est") < col("exact_n")).count() === 0)
    // w=16 over a 31-token vocabulary forces collisions: some
    // overestimate must exist, or the sketch degenerated to exact.
    assert(out.filter(col("cm_est") > col("exact_n")).count() > 0)
    out.unpersist()
  }

  test("feat_standardize: z-scores center per brand, minmax bounded to [0,1]") {
    val out = q("feat_standardize").cache()
    val drift = out.groupBy("p_brand").agg(avg("z").as("mz"))
      .filter(abs(col("mz")) > 1e-4).count()
    assert(drift === 0, "per-brand z mean must be ~0")
    assert(out.filter(col("minmax") < 0 || col("minmax") > 1).count() === 0)
    out.unpersist()
  }

  test("feat_hash_bucket: buckets land in [0, 32) and docs keep their token mass") {
    val out = q("feat_hash_bucket").cache()
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 32).count() === 0)
    // Sum of bucket counts per doc == token count of the doc: hashing
    // redistributes, never drops.
    val toks = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val bad = out.groupBy("doc_id").agg(sum("n").as("n_hashed"))
      .join(toks, "doc_id")
      .filter(col("n_hashed") =!= col("n_tok"))
    assert(bad.count() === 0)
    out.unpersist()
  }

  test("feat_onehot: exactly one indicator set per row, matching lang") {
    val out = q("feat_onehot")
    val bad = out.filter(
      col("lang_de") + col("lang_en") + col("lang_es") +
        col("lang_fr") + col("lang_zh") =!= 1)
    assert(bad.count() === 0)
  }

  test("agg_mode: one deterministic winner per size, count is the max") {
    val out = q("agg_mode").cache()
    val dup = out.groupBy("p_size").count().filter(col("count") > 1)
    assert(dup.count() === 0)
    // The winner's count must be the per-size max.
    val counts = Tables.t(spark, sfDir, "part")
      .groupBy("p_size", "p_brand").agg(count(lit(1)).as("n"))
    val mx = counts.groupBy("p_size").agg(max("n").as("mx"))
    val bad = out.join(mx, "p_size").filter(col("n_rows") =!= col("mx"))
    assert(bad.count() === 0)
    out.unpersist()
  }

  test("feat_quantile_bins: deciles partition each priority, sizes within 1") {
    val out = q("feat_quantile_bins").cache()
    assert(out.groupBy("o_orderpriority").count()
      .filter(col("count") =!= 10).count() === 0)
    // ntile balance: bin sizes differ by at most 1 within a priority.
    val spread = out.groupBy("o_orderpriority")
      .agg((max("n") - min("n")).as("d")).filter(col("d") > 1)
    assert(spread.count() === 0)
    // Bin edges are monotone: lo of decile k+1 >= hi of decile k.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy("decile")
    val edges = out.withColumn("prev_hi", lag("hi", 1).over(w))
      .filter(col("prev_hi").isNotNull && col("lo") < col("prev_hi"))
    assert(edges.count() === 0)
    out.unpersist()
  }
}
