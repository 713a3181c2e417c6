package graft

import org.apache.spark.sql.SparkSession

/** Bench runner (driver contract): per-query wall seconds over all
  * declared queries at SPARK_GRAFT_SF_DIR, one JSON line to stdout.
  * A single untimed warmup query first hydrates the JVM (codegen,
  * parquet reader, shuffle machinery) so per-query numbers measure the
  * queries, not first-job infrastructure spin-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned joins for key-grouped docstore scans: set
      // from process start so plan shapes never depend on which query
      // was constructed first (etl_connector_copartition also sets it
      // for foreign sessions)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // recursive-CTE working sets scale with the table (the sf1 audit
      // tripped the 1M default on a log2(N)-depth walk over 50k docs);
      // the limit is a runaway guard, not a capacity plan - size it for
      // the data like any production session would
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Steady-state measurement: best of two runs per query. This VM
    // shows sporadic multi-second stalls unrelated to the plans (same
    // query 1.7s vs 27s across runs); min-of-2 reports the engine, not
    // the noise.
    // Local-iteration filter (builder only; the driver sets no filter →
    // full run): comma/space-separated name substrings.
    val filters = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split("[,\\s]+").filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      filters.isEmpty || filters.exists(n.contains) }
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
          case e: Throwable =>
            // a failed query must be visible, not a plausible timing
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            Double.NaN
        }
      }
      // Stall hardening (r13 verdict #5): min-of-2 has twice manufactured
      // phantom regressions when the VM stalled through BOTH runs (r12
      // ngram 9.19 s, r13 markov 8.13 s vs ~1.2 s real). When min-of-2
      // still exceeds the query's cross-round baseline (BenchBaseline,
      // min over recent rounds — stalls only inflate) by 4× AND by an
      // absolute 1.5 s margin, take up to two more runs; queries with
      // no baseline yet (new this round) rerun only above an absolute
      // 4 s floor. Runs-taken is recorded in the detail line so a
      // rerun-heavy round is visible to the driver.
      // SPARK_GRAFT_BENCH_RUNS=1: single-run mode for the full-registry
      // scale audits, where magnitude (is this superlinear?) matters
      // and halving a multi-hour sweep beats min-of-2 noise damping
      val singleRun = sys.env.get("SPARK_GRAFT_BENCH_RUNS").contains("1")
      val a = once()
      val b = if (singleRun) a else once()
      var best = math.min(a, b)
      var runs = if (singleRun) 1 else 2
      // SPARK_GRAFT_BENCH_NO_RERUN disables the stall retries for runs
      // at a DIFFERENT scale factor than the baselines (the sf1 scale
      // audit would otherwise retry every query 4x against sf0.1 times)
      val rerun = !sys.env.contains("SPARK_GRAFT_BENCH_NO_RERUN")
      while (rerun && stallSuspect(name, best, runs)) {
        val c = once()
        if (!c.isNaN) best = math.min(best, c)
        runs += 1
      }
      // The iterative builders (components, PCA, BPE, IVF/PQ) leave
      // localCheckpoint blocks behind that only the async ContextCleaner
      // would reclaim; drop them eagerly so query N's storage pressure
      // never shows up in query N+1's time (r4 showed exactly that
      // cross-query contamination in the sim cluster).
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // -1 sentinel: a failed query must never read as a fast engine
      name -> ((if (a.isNaN || b.isNaN) -1.0 else best), runs)
    }
    val runsTaken = results.collect { case (n, (_, r)) if r > 2 => n -> r }
    val times = results.map { case (n, (t, _)) => n -> t }
    val ok = times.filter(_._2 >= 0)
    val failed = times.size - ok.size
    val total = ok.values.sum
    val qs = times.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val rt = runsTaken.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Two lines: the FULL per-query map first (for humans and BENCHLOG),
    // then the compact machine line LAST. The driver tail-captures
    // stdout with a bounded window — round 1 and 2 both lost the bench
    // signal because the single ~3.5 KB line had its FRONT truncated,
    // leaving unparseable JSON. The final line therefore carries only a
    // fixed headline subset and stays well under the capture window
    // (pinned by BenchLineSpec).
    println(s"""{"detail":"per_query","queries":$qs,"stall_reruns":$rt}""")
    System.out.flush()
    println(machineLine(times, total, failed, sfDir))
    spark.stop()
  }

  private def f3(v: Double) = f"$v%.3f"

  /** Does this min-of-`runs` time look stall-polluted (rerun-worthy)?
    * True when it exceeds the query's cross-round baseline by 4× AND
    * by an absolute 1.5 s (so sub-second queries don't rerun on noise);
    * queries without a baseline rerun only above an absolute 4 s
    * floor. Capped at 4 total runs. */
  private[graft] def stallSuspect(name: String, m: Double, runs: Int): Boolean = {
    if (m.isNaN || runs >= 4) return false
    BenchBaseline.seconds.get(name) match {
      case Some(base) => m > 4.0 * base && m > base + 1.5
      case None => m > 4.0
    }
  }

  /** Representative queries across every family: the compact machine
    * line reports these (plus total/failed/n_queries); the full map is
    * on the previous stdout line. */
  val headline: Seq[String] = Seq(
    "agg_q1", "sql_revenue_by_nation", "join_inner_chain",
    "join_asof_native", "join_range_band", "window_rank", "sort_topk",
    "dedup_exact_key", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_embedding_lsh", "sim_topk_cosine", "sim_ann_ivf",
    "text_tfidf", "text_bm25_search", "stream_session_gap",
    "etl_date_filter_derive", "graph_pagerank",
    "pipeline_canonical_dedup", "pipeline_semantic_dedup", "sim_pca_power",
    "pipeline_pretrain", "dedup_chunk_exact", "text_hybrid_rrf",
    // round-11 iterative heavies, surfaced for regression tracking
    "graph_mst_boruvka", "pipeline_bradley_terry",
    "analytics_markov_attribution", "ts_dtw")

  /** Final stdout line: complete JSON, bounded size (tail-capture-safe). */
  def machineLine(results: Map[String, Double], total: Double,
      failed: Int, sfDir: String): String = {
    // A renamed query must not silently vanish from the headline map.
    headline.filterNot(results.contains).foreach(n =>
      System.err.println(s"[bench] headline query '$n' not in results — rename headline too"))
    val hq = headline.flatMap(n => results.get(n).map(v => "\"" + n + "\":" + f3(v)))
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$hq,"failed":$failed,"n_queries":${results.size},"sf":"$sfDir"}"""
  }
}
