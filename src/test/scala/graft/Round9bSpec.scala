package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-9 continuation batch: binary-
  * quantized retrieval, clustering coefficient, preference pairs,
  * annotation agreement, Kneser-Ney smoothing, compaction planning,
  * robust scaling. */
class Round9bSpec extends SparkSpec {

  test("sim_hamming_topk: 10 results, bounded distances, descending cosine, query excluded") {
    val out = SparkEntry.queries("sim_hamming_topk")(spark, sfDir).collect()
    assert(out.length === 10)
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 64), "hamming of 64 bits")
    assert(out.forall(_.getLong(0) != 0L), "query vector not returned")
    val cs = out.map(_.getDouble(2)).toSeq
    assert(cs == cs.sorted.reverse, "re-ranked by cosine descending")
  }

  test("graph_clustering_coeff: coefficient in [0,1], triangle counts match the triangle query") {
    val cc = SparkEntry.queries("graph_clustering_coeff")(spark, sfDir).cache()
    assert(cc.filter(col("coeff") < 0.0 || col("coeff") > 1.0).count() === 0)
    val tri = SparkEntry.queries("graph_triangle_count")(spark, sfDir)
      .withColumnRenamed("n_triangles", "nt")
    val joined = cc.join(tri, Seq("node"), "left")
      .filter(col("n_tri") =!= coalesce(col("nt"), lit(0L)))
    assert(joined.count() === 0, "per-node triangle counts agree across queries")
    cc.unpersist()
  }

  test("pipeline_pref_pairs: positive margin, distinct ids, one pair per multi-doc bucket") {
    val out = SparkEntry.queries("pipeline_pref_pairs")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("margin") < 0).count() === 0, "chosen outscores rejected")
    assert(out.filter(col("chosen_id") === col("rejected_id")).count() === 0)
    val buckets = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang", "source").count().filter(col("count") >= 2).count()
    assert(out.count() === buckets, "exactly one pair per bucket with >= 2 docs")
    out.unpersist()
  }

  test("pipeline_annotation_vote: rates in [0,1], doc counts conserved") {
    val out = SparkEntry.queries("pipeline_annotation_vote")(spark, sfDir).cache()
    for (c <- Seq("majority_good", "agree_ab", "agree_ac", "agree_bc"))
      assert(out.filter(col(c) < 0.0 || col(c) > 1.0).count() === 0, s"$c in [0,1]")
    val total = out.agg(sum("n_docs")).head().getLong(0)
    assert(total === spark.read.parquet(s"$sfDir/documents.parquet").count())
    out.unpersist()
  }

  test("text_kn_bigram: probabilities in (0,1], sorted descending, discounted below MLE") {
    val out = SparkEntry.queries("text_kn_bigram")(spark, sfDir).collect()
    assert(out.length === 20)
    val ps = out.map(_.getDouble(3)).toSeq
    assert(ps.forall(p => p > 0.0 && p <= 1.0))
    assert(ps == ps.sorted.reverse)
  }

  test("etl_compaction_plan: bins nondecreasing within a year, bytes account for every row") {
    val out = SparkEntry.queries("etl_compaction_plan")(spark, sfDir).cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("yr").orderBy("mon")
    val regress = out.withColumn("pb", lag("bin", 1).over(w))
      .filter(col("pb").isNotNull && col("bin") < col("pb"))
    assert(regress.count() === 0, "cumulative fill never decreases a bin id")
    val totalBytes = out.agg(sum("bytes")).head().getLong(0)
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(totalBytes === rows * 96L)
    out.unpersist()
  }

  test("feat_robust_scale: IQR nonnegative and outliers a strict minority") {
    val out = SparkEntry.queries("feat_robust_scale")(spark, sfDir).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0, "iqr >= 0")
      assert(r.getLong(4) * 4 < r.getLong(1), "Tukey fence flags < 25% by construction")
    }
  }
}
