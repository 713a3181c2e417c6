package graft

import org.apache.spark.sql.functions._

/** PageRank invariants (ops.Graph) + the new join/time-series queries. */
class GraphSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("graph_jaccard_neighbors: scores are valid Jaccards over canonical pairs") {
    val out = q("graph_jaccard_neighbors").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      val (common, du, dv) = (r.getAs[Long]("common"), r.getAs[Long]("du"), r.getAs[Long]("dv"))
      assert(u < v, "pairs are canonical u < v")
      assert(common >= 1 && common <= math.min(du, dv),
        s"($u,$v): common $common vs degrees $du/$dv")
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("graph_pagerank: probability mass conserved, all nodes present, ranks positive") {
    val out = q("graph_pagerank").cache()
    assert(out.count() === 25)
    val total = out.agg(sum("pagerank")).head.getDouble(0)
    // Damped + dangling-redistributed iteration conserves the mass.
    assert(math.abs(total - 1.0) < 1e-3, s"mass drifted: $total")
    assert(out.filter(col("pagerank") <= 0).count() === 0)
    // The graph is non-uniform: ranks must actually differentiate.
    assert(out.select("pagerank").distinct().count() > 5)
    out.unpersist()
  }

  test("join_interval_overlap: every pair genuinely overlaps and shares the key") {
    val out = q("join_interval_overlap")
    // Re-check the predicate row-by-row from the emitted columns.
    val bad = out.filter(
      !(col("a_start") <= date_add(col("b_start"), 14) &&
        col("b_start") <= date_add(col("a_start"), 14)))
    assert(bad.count() === 0)
    assert(out.count() > 0)
  }

  test("join_interval_overlap: plan is a keyed join, not a nested loop") {
    val plan = q("join_interval_overlap").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      "interval overlap must hash/merge on the customer key")
  }

  test("join_bloom_prefilter: equals the exact semi-join (false positives scrubbed)") {
    val dir = sfDir
    val o = Tables.t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
      .select("o_orderkey")
    val li = Tables.t(spark, dir, "lineitem")
    val exact = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("l_returnflag")
    val got = q("join_bloom_prefilter")
    assert(got.collect().toSeq === exact.collect().toSeq)
  }

  test("ts_ewma: closed form matches a sequential fold on one user") {
    val rows = Tables.t(spark, sfDir, "events")
      .filter(col("user_id") === 1)
      .groupBy(to_date(col("ts")).as("day")).agg(sum("value").as("x"))
      .orderBy("day").collect().map(_.getDouble(1))
    assert(rows.length > 1)
    // adjust=true EWMA: weighted sum with weights (1-α)^k, α=0.3.
    val decay = 0.7
    val n = rows.length
    val num = rows.zipWithIndex.map { case (x, i) => x * math.pow(decay, n - 1 - i) }.sum
    val den = (0 until n).map(i => math.pow(decay, i)).sum
    val expected = BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = q("ts_ewma").filter(col("user_id") === 1).head.getDouble(2)
    assert(math.abs(got - expected.toDouble) < 1e-6)
  }

  test("ts_anomaly_zscore: strictly causal — no flagged day uses its own value in the baseline") {
    val out = q("ts_anomaly_zscore")
    // |z| > 2 for every emitted row (the filter is part of the contract).
    assert(out.filter(abs(col("z")) <= 2).count() === 0)
  }

  test("triangleCounts: K4 has four triangles, three per corner; pendant edges none") {
    import spark.implicits._
    // K4 on {0,1,2,3} (6 canonical edges) plus a pendant edge 3-9.
    val und = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 9L)).toDF("a", "b")
    val got = ops.Graph.triangleCounts(und).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Each K4 corner sits in C(3,2) = 3 triangles; node 9 in none.
    assert(got.toSeq === Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
    // Total triangle count = Σ per-node / 3 = 4.
    assert(got.map(_._2).sum / 3 === 4)
  }

}
