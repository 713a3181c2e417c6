package graft

import org.apache.spark.sql.functions._

/** Semantic invariants + plan pins for the round-10 operator batches
  * (statistical tests, time-series diagnostics, corpus linguistics,
  * link prediction, concentration/ablation sweeps). The DuckDB oracle
  * checks value equality; these pin the properties the oracle can't
  * see — bounds, conservation laws, and physical plan shapes. */
class Round10Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def planOf(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("stats_spearman and ts_cross_corr stay inside [-1, 1]") {
    val rhos = run("stats_spearman").collect().map(_.getAs[Double]("rho"))
    assert(rhos.nonEmpty && rhos.forall(r => r >= -1.0 && r <= 1.0))
    val rs = run("ts_cross_corr").collect().map(_.getAs[Double]("r"))
    assert(rs.nonEmpty && rs.forall(r => r >= -1.0 && r <= 1.0))
  }

  test("stats_kendall tau-b bounded; concordant+discordant <= pairs") {
    val r = run("stats_kendall").head()
    val (n, c, d) = (r.getAs[Long]("n_pairs"),
      r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
    assert(n == 25L * 24 / 2, s"dimension-sized pair count, got $n")
    assert(c + d <= n)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("stats_anova F and eta-squared are non-negative and consistent") {
    val r = run("stats_anova").head()
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
  }

  test("ts_value_runs conserves days; streak bounds hold") {
    val days = run("ts_value_runs").collect()
    assert(days.nonEmpty)
    days.foreach { r =>
      val (nRuns, la, lb) = (r.getAs[Long]("n_runs"),
        r.getAs[Long]("longest_above"), r.getAs[Long]("longest_below"))
      assert(nRuns >= 2, "a median split must produce both sides")
      assert(la >= 1 && lb >= 1 && la + lb <= 31)
    }
  }

  test("ts_winsorize clamps into [lo, hi] and flags exactly the clamped days") {
    val rows = run("ts_winsorize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, yw, cl) = (r.getAs[Double]("y"), r.getAs[Double]("y_wins"),
        r.getAs[Boolean]("clamped"))
      assert(cl == (math.abs(y - yw) > 1e-9),
        s"clamped flag inconsistent: y=$y y_wins=$yw clamped=$cl")
    }
  }

  test("profile_sequence_gaps: runs disjoint/ordered, conserve keys, avoid the carved holes") {
    val runs = run("profile_sequence_gaps")
      .collect().map(r => (r.getAs[Long]("run_start"),
        r.getAs[Long]("run_end"), r.getAs[Long]("run_len")))
    assert(runs.nonEmpty)
    // each run is a dense closed interval
    runs.foreach { case (s0, e0, l0) => assert(e0 - s0 + 1 == l0) }
    // strictly ordered, separated by at least one missing key
    runs.sliding(2).foreach {
      case Array((_, e1, _), (s2, _, _)) => assert(s2 > e1 + 1)
      case _ =>
    }
    // no run intersects the carved 7000-7049 hole or a 977-multiple
    runs.foreach { case (s0, e0, _) =>
      assert(e0 < 7000 || s0 > 7049, s"run [$s0,$e0] crosses the carved block")
      assert((s0 to e0).forall(_ % 977 != 0), s"run [$s0,$e0] contains a 977-multiple")
    }
    // total length == filtered key count (conservation)
    val expect = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") % 977 =!= 0
        && !col("o_orderkey").between(7000, 7049)).count()
    assert(runs.map(_._3).sum == expect)
  }

  test("analytics_lorenz: shares sum to 1, top decile dominates") {
    val rows = run("analytics_lorenz").collect()
    assert(rows.length == 10)
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    val shares = sorted.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-2, s"shares sum ${shares.sum}")
    // ascending sort ⇒ per-user mean spend is non-decreasing by decile
    // (share itself can dip where ntile hands an early decile an extra
    // user, so compare means, not totals)
    val means = sorted.map(r =>
      r.getAs[Double]("revenue") / r.getAs[Long]("n_users"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"per-user decile means must be monotone: ${means.mkString(",")}")
  }

  test("text_gopher_rules: per-rule passes bounded by n_docs; ALL <= every rule") {
    val rows = run("text_gopher_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val ps = Seq("p_count", "p_meanlen", "p_stop", "p_dom").map(r.getAs[Long])
      val all = r.getAs[Long]("n_pass_all")
      assert(ps.forall(p => p >= 0 && p <= n))
      assert(all <= ps.min)
    }
  }

  test("text_llr_bigrams and text_burstiness produce positive, sorted scores") {
    val llr = run("text_llr_bigrams").collect().map(_.getAs[Double]("llr"))
    assert(llr.length == 20 && llr.forall(_ >= 0.0))
    assert(llr.sameElements(llr.sorted.reverse))
    val vmr = run("text_burstiness").collect().map(_.getAs[Double]("vmr"))
    assert(vmr.length == 20 && vmr.forall(_ > 0.0))
    assert(vmr.sameElements(vmr.sorted.reverse))
  }

  test("sim_ivf_balance: imbalance >= 1, lists conserve the corpus") {
    val r = run("sim_ivf_balance").head()
    assert(r.getAs[Long]("k") == 8)
    assert(r.getAs[Double]("imbalance") >= 1.0)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(r.getAs[Long]("n_vectors") == n)
  }

  test("sql_market_share: share in [0,1]; star dims broadcast") {
    val rows = run("sql_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s0 = r.getAs[Double]("mkt_share")
      assert(s0 >= 0.0 && s0 <= 1.0)
    }
    val plan = planOf("sql_market_share")
    // nation (twice), region, supplier ride broadcast joins; only the
    // fact-fact joins (lineitem-orders-customer) may shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(1500))
  }

  test("pipeline_quality_sweep: retention monotone non-increasing in threshold") {
    val rows = run("pipeline_quality_sweep").collect()
      .sortBy(_.getAs[Int]("threshold"))
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n_retained"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"retention must shrink as the gate tightens: ${ns.mkString(",")}")
  }

  test("etl_incremental_watermark: new batch strictly after day 19, no overlap") {
    val rows = run("etl_incremental_watermark").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("first_day") >= 19, "watermark must exclude loaded days")
      assert(r.getAs[Int]("last_day") <= 31)
    }
  }

  test("graph_adamic_adar: AA positive, bounded by common/ln(2)") {
    val rows = run("graph_adamic_adar").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, aa) = (r.getAs[Long]("common"), r.getAs[Double]("adamic_adar"))
      assert(aa > 0.0 && aa <= c / math.log(2.0) + 1e-9)
    }
  }

  test("stats_levene median-deviation F is finite and non-negative") {
    val r = run("stats_levene").head()
    val f = r.getAs[Double]("f_stat")
    assert(!f.isNaN && !f.isInfinite && f >= 0.0)
  }

  test("ts_drawdown trough never precedes the running peak (dd >= 0 by construction)") {
    val rows = run("ts_drawdown").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("max_drawdown") >= 0.0))
  }
}
