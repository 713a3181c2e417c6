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

  test("stats_mann_whitney: U matches the brute-force tie-averaged rank sum") {
    val r = SparkEntry.queries("stats_mann_whitney")(spark, sfDir).head()
    val (u, na, nb) = (r.getDouble(0), r.getLong(2), r.getLong(3))
    assert(u >= 0.0 && u <= na.toDouble * nb, "U in [0, na*nb]")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        (col("o_orderpriority") === "1-URGENT").as("isA"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = o.sortBy(_._1)
    // tie-averaged ranks
    val ranks = scala.collection.mutable.Map[Long, Double]()
    var idx = 0
    for ((v, grp) <- sorted.groupBy(_._1).toSeq.sortBy(_._1)) {
      val k = grp.length
      ranks(v) = (idx + 1 + idx + k).toDouble / 2
      idx += k
    }
    val rsA = o.filter(_._2).map(t => ranks(t._1)).sum
    val nA = o.count(_._2)
    val uBrute = rsA - nA.toDouble * (nA + 1) / 2
    assert(math.abs(u - uBrute) < 1e-6, s"got $u, brute $uBrute")
    assert(na === nA.toLong && nb === (o.length - nA).toLong)
  }

  test("ts_autocorr: 5 lags per type, lag-0 normalization implies bounded values") {
    val out = SparkEntry.queries("ts_autocorr")(spark, sfDir).collect()
    assert(out.length === 25, "5 event types x 5 lags")
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.5),
      "ACF magnitudes bounded (num over full-series denominator)")
  }

  test("profile_fd_violations: part->supplier genuinely multi-valued, rates in [0,1]") {
    val out = SparkEntry.queries("profile_fd_violations")(spark, sfDir).collect()
    assert(out.length === 2)
    val bySrc = out.map(r => r.getString(0) -> r).toMap
    assert(bySrc("l_partkey->l_suppkey").getLong(2) > 0, "TPC-H parts have multiple suppliers")
    out.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "violating <= total keys")
    }
  }

  test("mm_phash_dedup: nonempty, canonical pair order, Hamming within threshold") {
    val out = SparkEntry.queries("mm_phash_dedup")(spark, sfDir).collect()
    assert(out.nonEmpty, "fixture corpus has near-duplicate payloads")
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "d1 < d2 canonical order")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 10)
    }
  }

  test("graph_hits: scores nonnegative and L1-normalized per phase") {
    val out = SparkEntry.queries("graph_hits")(spark, sfDir).collect()
    assert(out.length === 25)
    val (hubs, auths) = (out.map(_.getDouble(1)), out.map(_.getDouble(2)))
    assert(hubs.forall(_ >= 0.0) && auths.forall(_ >= 0.0))
    assert(math.abs(hubs.sum - 1.0) < 1e-3, s"hub mass ${hubs.sum}")
    assert(math.abs(auths.sum - 1.0) < 1e-3, s"auth mass ${auths.sum}")
  }

  test("ts_rolling_regression: full 7-day windows only, finite slopes") {
    val out = SparkEntry.queries("ts_rolling_regression")(spark, sfDir).collect()
    assert(out.length === 120, "5 types x 24 complete windows (days 7..30)")
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    assert(out.forall(r => r.getInt(1) >= 7 && r.getInt(1) <= 30))
  }

  test("stats_two_proportion_z: cohorts partition the users, rates in (0,1)") {
    val r = SparkEntry.queries("stats_two_proportion_z")(spark, sfDir).head()
    val users = Tables.t(spark, sfDir, "events").select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) === users, "cohorts partition the user base")
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    for (i <- Seq(4, 5)) {
      val p = r.getDouble(i)
      assert(p > 0.0 && p < 1.0, s"conversion neither zero nor saturated ($p)")
    }
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  test("stats_welch_t: means match brute force, df between min(n)-1 and n1+n2-2") {
    val r = SparkEntry.queries("stats_welch_t")(spark, sfDir).head()
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val df = r.getDouble(5)
    assert(df >= math.min(n1, n2).toDouble - 1 && df <= (n1 + n2).toDouble - 2,
      s"Welch-Satterthwaite df $df within its theoretical bounds")
    val brute = Tables.t(spark, sfDir, "orders")
      .join(Tables.t(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .agg(avg(round(col("o_totalprice") * 100) / 100.0)).head().getDouble(0)
    assert(math.abs(r.getDouble(2) - brute) < 0.02, s"mean1 ${r.getDouble(2)} vs $brute")
  }

  test("sim_nearest_centroid: assignments conserved and better than chance") {
    val out = SparkEntry.queries("sim_nearest_centroid")(spark, sfDir).cache()
    val total = out.agg(sum("n")).head().getLong(0)
    assert(total === Tables.t(spark, sfDir, "embeddings").count(),
      "every vector assigned exactly once")
    val correct = out.filter(col("label") === col("pred_label"))
      .agg(sum("n")).head().getLong(0)
    assert(correct.toDouble / total > 0.25,
      s"accuracy ${correct.toDouble / total} beats the 0.2 random baseline")
    out.unpersist()
  }

  test("sample_systematic: ranks form the exact arithmetic progression 1, 101, 201, ...") {
    val out = SparkEntry.queries("sample_systematic")(spark, sfDir).collect()
    val n = Tables.t(spark, sfDir, "orders").count()
    assert(out.length === ((n - 1) / 100 + 1).toInt)
    assert(out.map(_.getLong(1)).toSeq == out.indices.map(i => i * 100L + 1))
    // keys themselves are in ascending order (rank follows the sort key)
    val keys = out.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted)
  }

  test("ts_rolling_median: robust to a spike the mean would follow") {
    val out = SparkEntry.queries("ts_rolling_median")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("med_cents") < 0).count() === 0)
    // medians (exact cents — see the query's rounding note) are
    // bounded by the min/max daily cent totals per type
    val daily = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), dayofmonth(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type", "d").agg(sum("c").cast("double").as("y"))
      .groupBy("event_type").agg(min("y").as("lo"), max("y").as("hi"))
    val bad = out.join(daily, "event_type")
      .filter(col("med_cents") < col("lo") - 1 || col("med_cents") > col("hi") + 1)
    assert(bad.count() === 0)
    out.unpersist()
  }

  test("text_bpe_fertility: fertility between 1 and max word length, merges reduce units") {
    val out = SparkEntry.queries("text_bpe_fertility")(spark, sfDir).collect()
    assert(out.length === 5, "one row per language")
    out.foreach { r =>
      val fert = r.getDouble(3)
      assert(fert >= 1.0, "at least one unit per word")
      assert(r.getDouble(4) > 1.0, "merges compress below one char per unit")
      assert(r.getLong(2) >= r.getLong(1), "at least one unit per word (counts)")
    }
  }

  test("pipeline_dpo_prep: one pair per language, gated, split reproducible") {
    val out = SparkEntry.queries("pipeline_dpo_prep")(spark, sfDir).cache()
    assert(out.count() === 5, "one preference pair per language bucket")
    assert(out.filter(col("margin") <= 0).count() === 0)
    assert(out.filter(!col("split").isin("train", "val")).count() === 0)
    // chosen documents all passed the length gate
    val gated = out.join(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("chosen_id"), col("n_chars")), "chosen_id")
    assert(gated.filter(col("n_chars") < 150).count() === 0)
    out.unpersist()
  }

  test("analytics_streaks: streak arithmetic conserved against distinct active days") {
    val out = SparkEntry.queries("analytics_streaks")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("max_streak") > col("active_days")).count() === 0)
    assert(out.filter(col("max_streak") < 1 || col("n_streaks") < 1).count() === 0)
    val totalActive = out.agg(sum("active_days")).head().getLong(0)
    val brute = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(totalActive === brute, "islands partition the distinct (user, day) set")
    out.unpersist()
  }

  test("ts_backtest_snaive: MAEs nonnegative, day alignment leaves 23 scored days max") {
    val out = SparkEntry.queries("ts_backtest_snaive")(spark, sfDir).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getLong(1) <= 23, "days 8..30 at most")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
      if (math.abs(r.getDouble(2) - r.getDouble(3)) >= 0.011)
        assert(r.getBoolean(4) === (r.getDouble(2) < r.getDouble(3)),
          "winner flag consistent with clearly-separated rounded MAEs")
    }
  }

  test("text_vocab_divergence: JS in [0,1] bits over exactly 50 vocab terms") {
    val r = SparkEntry.queries("text_vocab_divergence")(spark, sfDir).head()
    val js = r.getDouble(0)
    assert(js >= 0.0 && js <= 1.0, s"JS divergence $js within its log2 bound")
    assert(r.getLong(1) > 10 && r.getLong(1) <= 50,
      "vocab capped at 50 (the fixture corpus has a bounded token set)")
    assert(r.getLong(2) > 0 && r.getLong(3) > 0)
  }

  test("agg_to_map: canonical JSON with keys sorted, counts conserved") {
    val out = SparkEntry.queries("agg_to_map")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val total = out.map { r =>
      val m = r.getString(1)
      assert(m.startsWith("{") && m.endsWith("}"))
      // keys appear in sorted order in the serialized form
      val keys = """"([^"]+)":""".r.findAllMatchIn(m).map(_.group(1)).toSeq
      assert(keys == keys.sorted, s"map keys ordered in $m")
      """:(\d+)""".r.findAllMatchIn(m).map(_.group(1).toLong).sum
    }.sum
    assert(total === Tables.t(spark, sfDir, "lineitem").count())
  }

  test("analytics_market_basket: rule metrics internally consistent") {
    val out = SparkEntry.queries("analytics_market_basket")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical pair order")
      assert(r.getLong(2) >= 2, "support floor applied")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(2) <= r.getLong(4),
        "pair support bounded by item supports")
      val conf = r.getDouble(5)
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getDouble(6) > 0.0)
    }
    val lifts = out.map(_.getDouble(6)).toSeq
    assert(lifts == lifts.sorted.reverse, "ranked by lift descending")
  }

  test("analytics_cohort_revenue: cumulative curve monotone per cohort") {
    val out = SparkEntry.queries("analytics_cohort_revenue")(spark, sfDir).cache()
    assert(out.count() > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cohort_wk").orderBy("weeks_since")
    val regress = out.withColumn("prev", lag("cum_rev_per_user", 1).over(w))
      .filter(col("prev").isNotNull && col("cum_rev_per_user") < col("prev"))
    assert(regress.count() === 0, "cumulative revenue never decreases")
    assert(out.filter(col("n_active") > col("cohort_size")).count() === 0)
    out.unpersist()
  }

  test("ts_theil_sen: pair counts C(n,2)-consistent and slope within pairwise extremes") {
    val out = SparkEntry.queries("ts_theil_sen")(spark, sfDir).collect()
    assert(out.length === 5)
    val daysPerType = Tables.t(spark, sfDir, "events")
      .groupBy(col("event_type"), dayofmonth(col("ts"))).count()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val n = daysPerType(r.getString(0))
      assert(r.getInt(1) === (n * (n - 1) / 2).toInt, "all day pairs contribute")
    }
  }

  test("dedup_minhash_accuracy: estimator calibrated against exact Jaccard") {
    val out = SparkEntry.queries("dedup_minhash_accuracy")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1).count() === 0)
    assert(out.filter(col("abs_err") > 1).count() === 0)
    val mae = out.agg(avg("abs_err")).head().getDouble(0)
    assert(mae < 0.25, s"32-permutation MinHash MAE $mae within the expected band")
    out.unpersist()
  }

  test("etl_table_checksum: row counts exact, checksum flips when a row is removed") {
    val out = SparkEntry.queries("etl_table_checksum")(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("customer", "lineitem", "orders"))
    val counts = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("customer", "orders", "lineitem"))
      assert(counts(t) === Tables.t(spark, sfDir, t).count(), s"$t row count")
    assert(out.forall(_.getLong(2) > 0))
    // sensitivity: dropping one customer row must change the checksum
    import graft.ops.PortableHash.hexHash
    val full = out.find(_.getString(0) == "customer").get.getLong(2)
    val dropped = Tables.t(spark, sfDir, "customer")
      .filter(col("c_custkey") =!= 1)
      .agg(sum(pmod(hexHash(concat_ws("|", col("c_custkey"), col("c_name"),
        col("c_mktsegment"))), lit(1000000007L)))).head().getLong(0)
    assert(dropped !== full, "checksum detects a missing row")
  }

  test("profile_join_explosion: prediction equals the materialized self-join size") {
    val r = SparkEntry.queries("profile_join_explosion")(spark, sfDir).head()
    val li = Tables.t(spark, sfDir, "lineitem").select(col("l_partkey"))
    val ordered = li.as("a").join(li.as("b"),
      col("a.l_partkey") === col("b.l_partkey")).count()
    val n = li.count()
    // ordered pairs = Σc²; unordered distinct-row pairs = (Σc² − n)/2
    assert(r.getLong(2) === (ordered - n) / 2,
      s"predicted ${r.getLong(2)} vs joined ${(ordered - n) / 2}")
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("window_running_distinct: monotone per user, ends at the exact distinct count") {
    val out = SparkEntry.queries("window_running_distinct")(spark, sfDir).cache()
    assert(out.count() > 0)
    val finals = out.join(
        Tables.t(spark, sfDir, "events").filter(col("user_id") < 40)
          .groupBy("user_id").agg(countDistinct("event_type").as("truth")),
        "user_id")
      .groupBy("user_id", "truth").agg(max("n_types_seen").as("got"))
    assert(finals.filter(col("got") =!= col("truth")).count() === 0,
      "running distinct converges to the exact count-distinct per user")
    assert(out.filter(col("n_types_seen") < 1 || col("n_types_seen") > 5).count() === 0)
    out.unpersist()
  }

  test("etl_surrogate_keys: UUID shape and full-table collision freedom") {
    val out = SparkEntry.queries("etl_surrogate_keys")(spark, sfDir).collect()
    val shape = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    out.foreach(r => assert(shape.matches(r.getString(1)), r.getString(1)))
    // collision audit over the FULL table, not just the sampled output
    val full = Tables.t(spark, sfDir, "customer")
      .select(md5(concat(lit("cust:"), col("c_custkey"))).as("h"))
    assert(full.distinct().count() === full.count(), "surrogate keys collide")
  }

  test("ts_interval_union: coverage bounded by span and by summed durations") {
    val out = SparkEntry.queries("ts_interval_union")(spark, sfDir).cache()
    assert(out.count() > 0)
    val iv = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase" && col("user_id") < 60)
      .groupBy("user_id")
      .agg((sum(round(col("value") * 1000000).cast("long")) / 1000000.0).as("sum_dur"),
        ((max(Tables.epochUs(col("ts")) + round(col("value") * 1000000).cast("long"))
          - min(Tables.epochUs(col("ts")))) / 1000000.0).as("span"))
    val j = out.join(iv, "user_id")
    assert(j.filter(col("covered_sec") > col("sum_dur") + 0.01).count() === 0,
      "union cannot exceed the sum of interval lengths")
    assert(j.filter(col("covered_sec") > col("span") + 0.01).count() === 0,
      "union cannot exceed the first-start to last-end span")
    out.unpersist()
  }

  test("text_cross_lingual_overlap: all 10 pairs, Jaccard in (0,1], symmetric-free") {
    val out = SparkEntry.queries("text_cross_lingual_overlap")(spark, sfDir).collect()
    assert(out.length === 10, "C(5,2) language pairs")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      assert(r.getLong(2) <= r.getLong(3), "intersection <= union")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("graph_reciprocity: fraction in [0,1] and consistent with its own counts") {
    val r = SparkEntry.queries("graph_reciprocity")(spark, sfDir).head()
    assert(r.getLong(1) <= r.getLong(0))
    assert(math.abs(r.getDouble(2) - r.getLong(1).toDouble / r.getLong(0)) < 1e-6)
  }

  test("scalar_binary_encode: round-trips hold for every row") {
    val out = SparkEntry.queries("scalar_binary_encode")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(!col("b64_roundtrip") || !col("hex_roundtrip")).count() === 0)
    assert(out.filter(col("b64").rlike("[\\r\\n]")).count() === 0,
      "canonical single-line base64")
    out.unpersist()
  }

  test("window_pareto_skyline: no frontier point dominates another") {
    val out = SparkEntry.queries("window_pareto_skyline")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byGrp = out.groupBy(_.getString(0))
    for ((_, pts) <- byGrp; a <- pts; b <- pts if a != b) {
      val dominated = a.getDouble(3) <= b.getDouble(3) && a.getLong(4) <= b.getLong(4) &&
        (a.getDouble(3) < b.getDouble(3) || a.getLong(4) < b.getLong(4))
      assert(!dominated, s"frontier point $a dominated by $b")
    }
  }

  test("graph_assortativity: correlation within [-1, 1] on the sparsified graph") {
    val r = SparkEntry.queries("graph_assortativity")(spark, sfDir).head()
    assert(r.getLong(0) > 0)
    assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
  }

  test("etl_quarantine_split: routes partition the table, shares sum to 1") {
    val out = SparkEntry.queries("etl_quarantine_split")(spark, sfDir).collect()
    assert(out.length >= 2, "at least one rule fires on the fixture")
    assert(out.map(_.getLong(1)).sum === Tables.t(spark, sfDir, "orders").count())
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-3)
  }

  test("profile_candidate_keys: primary key detected, foreign key rejected") {
    val out = SparkEntry.queries("profile_candidate_keys")(spark, sfDir).collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    assert(byName("o_orderkey").getBoolean(4), "o_orderkey is the grain")
    assert(!byName("o_custkey").getBoolean(4), "o_custkey repeats")
    out.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("sql_pivot: wide totals equal the grouped longs") {
    val out = SparkEntry.queries("sql_pivot")(spark, sfDir).collect()
    val brute = Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").cast("long").as("q")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val rf = r.getString(0)
      assert(Option(r.get(1)).map(_.asInstanceOf[Long]) === brute.get((rf, "F")))
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) === brute.get((rf, "O")))
    }
  }

  test("sql_unpivot: two rows per input row, facets complete") {
    val out = SparkEntry.queries("sql_unpivot")(spark, sfDir).cache()
    val n = Tables.t(spark, sfDir, "customer").filter(col("c_custkey") < 100).count()
    assert(out.count() === n * 2)
    assert(out.select("facet").distinct().count() === 2)
    out.unpersist()
  }

  test("analytics_audience_overlap: all pairs, intersection bounded by audiences") {
    val out = SparkEntry.queries("analytics_audience_overlap")(spark, sfDir).collect()
    assert(out.length === 10, "C(5,2) event-type pairs")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("ts_bollinger_bands: band ordering holds and breaches match the envelope") {
    val out = SparkEntry.queries("ts_bollinger_bands")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("lower") > col("mid") || col("mid") > col("upper")).count() === 0)
    // a breach must sit outside the (rounded) envelope, with rounding slack
    val bad = out.filter(col("breach")
      && col("y") <= col("upper") + 0.011 && col("y") >= col("lower") - 0.011)
    assert(bad.count() === 0, "breach flag consistent with the band edges")
    out.unpersist()
  }

  test("text_pmi_bigrams: count floor respected, PMI sorted descending") {
    val out = SparkEntry.queries("text_pmi_bigrams")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getLong(2) >= 5))
    val pmis = out.map(_.getDouble(3)).toSeq
    assert(pmis == pmis.sorted.reverse)
  }

  test("feat_rare_collapse: kept categories all clear the floor, docs conserved") {
    val out = SparkEntry.queries("feat_rare_collapse")(spark, sfDir).collect()
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(out.map(_.getLong(1)).sum === total)
    out.filter(_.getString(0) != "__other__")
      .foreach(r => assert(r.getLong(1) * 50 >= total, s"${r.getString(0)} below floor"))
  }

  test("profile_referential_integrity: fixture star schema is orphan-free") {
    val out = SparkEntry.queries("profile_referential_integrity")(spark, sfDir).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)} has orphans in the fixture")
      assert(r.getLong(1) > 0)
    }
  }

  test("stats_corr_matrix: values in [-1,1], price-quantity strongly positive") {
    val r = SparkEntry.queries("stats_corr_matrix")(spark, sfDir).head()
    (0 until 6).foreach(i => assert(math.abs(r.getDouble(i)) <= 1.0 + 1e-9))
    // cross-check one pair against Spark's builtin corr on the same
    // fixed-point encoding
    val builtin = Tables.t(spark, sfDir, "lineitem")
      .agg(corr(round(col("l_extendedprice") * 100),
        round(col("l_quantity")))).head().getDouble(0)
    assert(math.abs(r.getAs[Double]("corr_p_q") - builtin) < 1e-4,
      s"power-sum corr ${r.getAs[Double]("corr_p_q")} vs builtin $builtin")
  }

  test("analytics_new_vs_returning: day-1 all new, user-days conserved") {
    val out = SparkEntry.queries("analytics_new_vs_returning")(spark, sfDir).collect()
    assert(out.head.getLong(2) === 0L, "nobody returns on the first day")
    val totalDays = out.map(r => r.getLong(1) + r.getLong(2)).sum
    val brute = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(totalDays === brute, "new + returning partitions active user-days")
  }

  test("text_heaps_law: growth monotone, sublinear exponent in (0,1)") {
    val out = SparkEntry.queries("text_heaps_law")(spark, sfDir).collect()
    assert(out.length === 5)
    val vocabs = out.map(_.getLong(2)).toSeq
    val tokens = out.map(_.getLong(1)).toSeq
    assert(vocabs == vocabs.sorted && tokens == tokens.sorted,
      "vocabulary and token counts both grow with the corpus")
    assert(vocabs.zip(tokens).forall { case (v, n) => v <= n })
    val beta = out.head.getDouble(3)
    assert(beta >= 0.0 && beta < 1.0, s"Heaps exponent $beta sublinear")
    // strictly positive only when the vocabulary actually grew
    // (the fixture token set is bounded and saturates early)
    if (vocabs.distinct.length > 1) assert(beta > 0.0)
  }

  test("dedup_lsh_plan: S-curves monotone in J, ordered by banding aggressiveness") {
    val out = SparkEntry.queries("dedup_lsh_plan")(spark, sfDir).collect()
    assert(out.length === 54, "6 factorizations x 9 Jaccard grid points")
    // within each (b, r), probability is nondecreasing in J
    out.groupBy(r => (r.getInt(0), r.getInt(1))).foreach { case (_, rows) =>
      val ps = rows.sortBy(_.getDouble(2)).map(_.getDouble(3)).toSeq
      assert(ps == ps.sorted, "P(candidate) monotone in J")
      ps.foreach(p => assert(p >= 0.0 && p <= 1.0))
    }
    // more bands = more aggressive at low J: b=32,r=1 dominates b=1,r=32 at J=0.5
    val at = out.filter(_.getDouble(2) == 0.5).map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(at(32) > at(8) && at(8) > at(1))
  }

  test("text_case_profile: shares in [0,1] and jointly below unity") {
    val out = SparkEntry.queries("text_case_profile")(spark, sfDir).collect()
    assert(out.length === 20, "one row per source")
    out.foreach { r =>
      val shares = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))
      shares.foreach(x => assert(x >= 0.0 && x <= 1.0))
      assert(shares.sum <= 1.0 + 1e-6, "disjoint character classes")
    }
  }

  test("ts_hourly_profile: hour domain complete, counts conserved") {
    val out = SparkEntry.queries("ts_hourly_profile")(spark, sfDir).cache()
    assert(out.filter(col("h") < 0 || col("h") > 23).count() === 0)
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.t(spark, sfDir, "events").count())
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
