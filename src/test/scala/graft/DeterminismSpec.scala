package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Round, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, CollectList, Sum}
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Float-determinism contract (SURVEY §5): oracle-checked queries must
  * hash identically under ANY partial-aggregation order, because the
  * driver's DuckDB compare is exact. Two teeth:
  *
  *   1. Re-run the queries that fold floats under a different
  *      `spark.sql.shuffle.partitions` (different partial-agg merge
  *      tree) and assert bit-identical results.
  *   2. A plan lint that fails if a NEW oracle query reintroduces the
  *      class that bit `text_entropy` in round 4: a float/double
  *      Sum/Average feeding `round(…, ≥4)` — sub-ulp summation-order
  *      noise flips the last rounded digit. The sanctioned pattern is a
  *      sorted sequential fold (`aggregate(sort_array(collect_list(…)))`
  *      ≡ DuckDB `list_sort` + `list_reduce`); coarse money rounding
  *      (scale ≤ 2 over ~1e4-magnitude sums) is tolerated and listed.
  */
class DeterminismSpec extends SparkSpec {

  /** Queries whose result embeds an order-sensitive float fold made
    * deterministic by sorting — re-run under a different shuffle fan-out
    * must be bit-identical. */
  private val foldQueries =
    Seq("text_entropy", "text_unigram_logprob", "text_bigram_logprob",
      "dedup_embedding_cosine", "ts_ewma", "text_bm25_search",
      // sorted folds over likelihood addends; perplexity_buckets also
      // pins that the tercile cut is stable when the fold input varies
      "text_dsir_weights", "text_perplexity_buckets",
      // gate→dedup→perplexity chain: the tercile cut (and so the kept
      // set) must not move across fan-outs; domain mix's √-sum
      // normalizer is a sorted fold over the per-source table
      "pipeline_curation", "pipeline_domain_mix",
      // per-row VecDot sequential fold feeding a rank — the prune set
      // must not flip across fan-outs
      "sim_cluster_prune",
      // per-row ln, no fold — pins that the quantized race key is
      // stable across fan-outs (ordering feeds a limit)
      "sample_weighted",
      // RRF arms rank ROUNDED scores; fusion must be fan-out stable
      "text_hybrid_rrf",
      // moment-buffer regression over (ln rank, ln freq): reorder noise
      // must stay under the 4/6-decimal rounds (agg_regression class)
      "text_zipf_fit")

  test("float-fold queries are bit-identical under a different shuffle fan-out") {
    // An isolated session over the same context with a different
    // partition count: partial aggregates merge in a different tree.
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    for (name <- foldQueries) {
      val a = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
      val b = SparkEntry.queries(name)(alt, sfDir).collect().map(_.toString).toSeq
      assert(a === b, s"$name differs across shuffle fan-outs")
    }
  }

  /** Oracle queries audited as acceptable despite a round-over-float-agg:
    * agg_q1's per-group cardinality is unbounded (a sorted collect_list
    * fold would not survive 100 TB), and its avg(double) at scale 4 has
    * reorder noise ~1e-9 against a 1e-4 grid on ~3e4 magnitudes — five
    * driver rounds of exact hash-compares green. Adding a NEW query here
    * requires the same audit (bounded noise ≫ margin + unbounded group). */
  private val auditedCoarseRounding = Set("agg_q1", "agg_filtered")

  private def fragileRounds(e: Expression): Seq[Round] =
    e.collect {
      case r: Round if r.scale.foldable && evalScale(r) >= 4 && hasUnsortedFloatAgg(r.child) => r
    }

  private def evalScale(r: Round): Int =
    r.scale.eval() match { case i: Int => i; case other => other.toString.toInt }

  /** The sanctioned sorted-fold shape: sort_array DIRECTLY over a
    * collect_list aggregate. Only that shape is shielded — an unrelated
    * sort_array elsewhere in the tree must not hide an unsorted float
    * Sum/Average beneath it (r5 advice). */
  private def isSortedFold(sa: SortArray): Boolean = sa.base match {
    case agg: AggregateExpression => agg.aggregateFunction.isInstanceOf[CollectList]
    case _ => false
  }

  /** True if the subtree holds a float/double Sum/Average NOT shielded by
    * a sorted fold (SortArray ancestor ⇒ the fold input was sorted). */
  private def hasUnsortedFloatAgg(e: Expression): Boolean = e match {
    case sa: SortArray if isSortedFold(sa) => false
    case agg: AggregateExpression =>
      agg.aggregateFunction match {
        case s: Sum if s.child.dataType == DoubleType || s.child.dataType == FloatType => true
        case a: Average if a.child.dataType == DoubleType || a.child.dataType == FloatType => true
        case f => f.children.exists(hasUnsortedFloatAgg)
      }
    case other => other.children.exists(hasUnsortedFloatAgg)
  }

  test("plan lint: no oracle query rounds an unsorted float aggregate at scale >= 4") {
    val offenders = SparkEntry.all
      .filter(q => q.oracle.isDefined && !auditedCoarseRounding.contains(q.name))
      .flatMap { q =>
        val plan = q.fn(spark, sfDir).queryExecution.analyzed
        val hits = plan.collect { case n => n }.flatMap(_.expressions.flatMap(fragileRounds))
        if (hits.nonEmpty) Seq(q.name) else Nil
      }
      .distinct
    assert(offenders.isEmpty,
      s"fragile round-over-float-sum in oracle queries: ${offenders.mkString(", ")} — " +
        "use a sorted fold (sort_array+aggregate ≡ list_sort+list_reduce) or coarser rounding")
  }

  test("plan lint: collect_list aggregates only over bounded inputs") {
    // The sorted-fold determinism pattern (sfold = aggregate over
    // sort_array(collect_list(...))) materializes each group as an
    // in-memory array — safe over bounded groups (per-doc tokens,
    // per-dimension stats, per-partition totals), an OOM at 100 TB if a
    // future operator ever points it at an unbounded one. Structural
    // floor: a GLOBAL collect_list (no grouping) must sit above another
    // aggregate or a limit, so its input row count is bounded by a
    // group-key cardinality (the numPartitions-row prefix-sum spines,
    // 1-row packed broadcasts) rather than the corpus. Grouped collects
    // are per-group bounded by their key (doc_id / dimension) — the
    // audit VERDICT r10 walked; new global collects over raw scans fail
    // here.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, LogicalPlan}
    // Audited exceptions: these pack the ≤K-row IVF/prune centroid book,
    // selected by a key-range filter (vec_id < K on a unique key) the
    // structural check can't prove bounded. Exact set — a new query
    // landing here must be audited and listed, not silently accepted.
    val auditedBoundedCollects = Set(
      "sim_ann_ivf", "sim_ivf_assign", "sim_cluster_prune", "sim_ivf_balance",
      // the persisted-index pair packs the ≤8-row centroid book loaded
      // back from its parquet artifact — bounded by construction of the
      // store (written from a vec_id < 8 key-range), invisible to the
      // structural check across the write/read boundary
      "sim_index_serve", "sim_index_incremental", "sim_index_rebuild_plan")
    def hasBoundedSource(p: LogicalPlan): Boolean =
      p.isInstanceOf[Aggregate] || p.isInstanceOf[GlobalLimit] ||
        p.isInstanceOf[Deduplicate] || p.children.exists(hasBoundedSource)
    def collectsList(a: Aggregate): Boolean =
      a.aggregateExpressions.exists(_.exists {
        case ae: AggregateExpression => ae.aggregateFunction.isInstanceOf[CollectList]
        case _ => false
      })
    val offenders = SparkEntry.all
      .filterNot(q => auditedBoundedCollects.contains(q.name))
      .flatMap { q =>
        val plan = q.fn(spark, sfDir).queryExecution.analyzed
        val bad = plan.collect {
          case a: Aggregate if a.groupingExpressions.isEmpty && collectsList(a) &&
            !a.children.exists(hasBoundedSource) => a
        }
        if (bad.nonEmpty) Seq(q.name) else Nil
      }.distinct
    assert(offenders.isEmpty,
      s"global collect_list over an unbounded input in: ${offenders.mkString(", ")} — " +
        "aggregate/limit the input first (prefix-sum spine, packed broadcast) or group by a bounded key")
  }

  /** Identifiers known to be DOUBLE in the test tables / oracle CTEs —
    * DuckDB sum(DOUBLE) stays DOUBLE, no widening. */
  private val doubleSumIdents = Set(
    "l_quantity", "l_extendedprice", "o_totalprice", "c_acctbal", "value",
    // ts_seasonality's per-hour sum-of-value CTE column (DOUBLE)
    "sv",
    // feat_yeo_johnson's transformed value and signed-log columns (DOUBLE)
    "z", "sl")

  /** Bare-identifier sum(...) not wrapped in CAST and not a window sum.
    * DuckDB widens sum(BIGINT/INT) to HUGEINT while Spark emits BIGINT,
    * and the driver's hash compare is type-sensitive — this bit the four
    * text LM oracles in round 5. Window sums are skipped because their
    * result is always consumed (the dtype parity gate in tools/check.py
    * catches an emitted one). */
  private val bareSum =
    raw"(?i)(?<!cast\()\bsum\(\s*([a-z_][a-z0-9_]*)\s*\)(?!\s*over\b)".r

  test("oracle lint: integer sum() columns are CAST to BIGINT (DuckDB HUGEINT widening)") {
    val offenders = SparkEntry.all.flatMap { q =>
      q.oracle.toSeq.flatMap { sql =>
        bareSum.findAllMatchIn(sql)
          .map(_.group(1).toLowerCase)
          .filterNot(doubleSumIdents)
          .map(id => s"${q.name}: sum($id)")
      }
    }
    assert(offenders.isEmpty,
      s"bare integer sum() in oracle SQL widens to HUGEINT in DuckDB and fails the " +
        s"driver's type-sensitive hash — wrap as CAST(sum(x) AS BIGINT): " +
        offenders.mkString(", "))
  }
}
