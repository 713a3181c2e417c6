package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregate + ordered-analytics surface (SURVEY.md §2B
  * completions): moment aggregates (corr/covariance/stddev/variance/
  * skewness/kurtosis/median), the SQL-standard linear-regression family
  * (regr_*), IGNORE NULLS window navigation, and a time-series
  * gap-fill with last-observation-carried-forward — the resample/fill
  * shape every metrics pipeline needs.
  *
  * All stock codegen'd aggregates — one partial+final hash aggregation,
  * shuffle carries only the fixed-size moment buffers, never rows.
  * Skewness/kurtosis are population moments in Spark; the DuckDB oracle
  * computes the same g1/g2 from explicit central moments (its builtins
  * are the bias-corrected sample versions). */
object Stats {

  def defs: Seq[Q] = Seq(

    Q(
      "agg_weighted_median",
      "Exact weighted median per group (price weighted by quantity): " +
        "pre-aggregate to (group, value) with summed weights — a " +
        "map-side-combinable hash agg that shrinks the window input " +
        "to distinct values per group — then one cumulative-sum " +
        "window over the reduced table picks the smallest value whose " +
        "cumulative weight reaches half the total. Weights are " +
        "integer-valued doubles, so the running sums are exact and " +
        "the threshold comparison is deterministic in both engines. " +
        "For groups whose distinct-value set is itself huge at 100 TB, " +
        "the in-repo KLL sketch (agg_kll_quantiles) is the approximate " +
        "path; this is the exact one.",
      (s, dir) => {
        val w = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"),
            col("l_extendedprice").as("price"))
          .agg(sum("l_quantity").as("wt"))
        val cum = Window.partitionBy("l_returnflag", "l_linestatus")
          .orderBy("price")
        val tot = Window.partitionBy("l_returnflag", "l_linestatus")
        w.withColumn("cw", sum("wt").over(cum))
          .withColumn("tw", sum("wt").over(tot))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(min("price").as("w_median"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""WITH w AS (SELECT l_returnflag, l_linestatus,
            l_extendedprice AS price, sum(l_quantity) AS wt
          FROM lineitem GROUP BY 1, 2, 3),
        c AS (SELECT l_returnflag, l_linestatus, price,
            sum(wt) OVER (PARTITION BY l_returnflag, l_linestatus
              ORDER BY price) AS cw,
            sum(wt) OVER (PARTITION BY l_returnflag, l_linestatus) AS tw
          FROM w)
        SELECT l_returnflag, l_linestatus, min(price) AS w_median
        FROM c WHERE cw * 2 >= tw
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q(
      "agg_decimal_money",
      "Exact-decimal money aggregation: prices cast to DECIMAL(18,2) " +
        "at the scan and summed in decimal — cent-exact at ANY " +
        "aggregation order and ANY scale, the arithmetic a financial " +
        "ledger requires where float summation is unacceptable. Spark " +
        "widens the sum to DECIMAL(28,2) and DuckDB to DECIMAL(38,2); " +
        "both cast back to DECIMAL(18,2) for bit-identical output. " +
        "Same one-shuffle two-phase hash agg as any sum; the decimal " +
        "buffers stay in Tungsten's codegen'd unsafe rows.",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            col("l_extendedprice").cast("decimal(18,2)").as("p"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum("p").cast("decimal(18,2)").as("sum_price"),
            min("p").as("min_price"),
            max("p").as("max_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
          min(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price,
          max(CAST(l_extendedprice AS DECIMAL(18,2))) AS max_price
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    Q(
      "agg_hour_bitmap",
      "Bitmap presence rollup: each user's active hours-of-day packed " +
        "into one 24-bit mask via bit_or(1 << hour) — a constant-size " +
        "aggregation buffer no matter how many events the user has, " +
        "the cheapest possible presence encoding (the roaring-bitmap " +
        "idea at word width). popcount gives hours-active; the " +
        "histogram of that is the engagement-breadth profile. Two " +
        "map-side-combinable integer aggs, zero floats.",
      (s, dir) => {
        Tables.t(s, dir, "events")
          .select(col("user_id"),
            hour(col("ts").cast("timestamp")).as("hod"))
          .groupBy("user_id")
          .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), hod)")).as("bm"))
          .select(expr("CAST(bit_count(bm) AS INT)").as("n_active_hours"))
          .groupBy("n_active_hours")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("n_active_hours")
      },
      Some("""WITH b AS (SELECT user_id,
            bit_or(CAST(1 AS BIGINT) << CAST(hour(CAST(ts AS TIMESTAMP)) AS INT)) AS bm
          FROM events GROUP BY 1)
        SELECT CAST(bit_count(bm) AS INT) AS n_active_hours,
          count(*) AS n_users
        FROM b GROUP BY 1 ORDER BY 1""")),

    Q(
      "agg_stats_family",
      "Moment aggregates per group: corr, covar_samp/pop, " +
        "stddev_samp/pop, var_samp, exact interpolated median, " +
        "population skewness/kurtosis. Single two-phase hash agg — the " +
        "shuffle moves constant-size moment buffers per group (median " +
        "adds a sort-based buffer; at 100 TB prefer approx_percentile).",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        li.groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_s"),
            round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cov_p"),
            round(stddev_samp(col("l_extendedprice")), 4).as("sd_s"),
            round(stddev_pop(col("l_extendedprice")), 4).as("sd_p"),
            round(var_samp(col("l_extendedprice")), 2).as("var_s"),
            round(median(col("l_discount")), 6).as("med_disc"),
            round(skewness(col("l_discount")), 5).as("skew_d"),
            round(kurtosis(col("l_discount")), 5).as("kurt_d"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (SELECT l_returnflag AS rf, avg(l_discount) AS m,
            stddev_pop(l_discount) AS sd, count(*) AS cnt
          FROM lineitem GROUP BY 1)
        SELECT l.l_returnflag,
          count(*) AS n,
          round(corr(l.l_quantity, l.l_extendedprice), 6) AS corr_qp,
          round(covar_samp(l.l_quantity, l.l_extendedprice), 2) AS cov_s,
          round(covar_pop(l.l_quantity, l.l_extendedprice), 2) AS cov_p,
          round(stddev_samp(l.l_extendedprice), 4) AS sd_s,
          round(stddev_pop(l.l_extendedprice), 4) AS sd_p,
          round(var_samp(l.l_extendedprice), 2) AS var_s,
          round(median(l.l_discount), 6) AS med_disc,
          round(sum(pow(l.l_discount - g.m, 3)) / (g.cnt * pow(g.sd, 3)), 5) AS skew_d,
          round(sum(pow(l.l_discount - g.m, 4)) / (g.cnt * pow(g.sd, 4)) - 3, 5) AS kurt_d
        FROM lineitem l JOIN g ON l.l_returnflag = g.rf
        GROUP BY l.l_returnflag, g.m, g.sd, g.cnt
        ORDER BY l.l_returnflag""")),

    Q(
      "agg_regression",
      "SQL-standard linear-regression aggregates per group: slope, " +
        "intercept, R², count, mean-x/mean-y of the fitted pairs. Same " +
        "constant-size-buffer shuffle shape as the moment family.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        li.groupBy("l_linestatus")
          .agg(
            round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
            round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
            round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
            regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"),
            round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("avg_x"),
            round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("avg_y"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
        round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
        round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    Q(
      "agg_bool_bitwise",
      "Boolean and bitwise aggregates per group: bool_and/bool_or " +
        "predicates, bit_and/bit_or/bit_xor over the line number. " +
        "Constant-size buffers — the cheapest possible shuffle shape.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        li.groupBy("l_returnflag")
          .agg(
            bool_and(col("l_quantity") > 0).as("all_pos_qty"),
            bool_or(col("l_discount") > 0.09).as("any_big_disc"),
            bit_and(col("l_linenumber")).as("ln_and"),
            bit_or(col("l_linenumber")).as("ln_or"),
            bit_xor(col("l_linenumber")).as("ln_xor"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        bool_and(l_quantity > 0) AS all_pos_qty,
        bool_or(l_discount > 0.09) AS any_big_disc,
        CAST(bit_and(l_linenumber) AS INT) AS ln_and,
        CAST(bit_or(l_linenumber) AS INT) AS ln_or,
        CAST(bit_xor(l_linenumber) AS INT) AS ln_xor
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q(
      "profile_table_stats",
      "One-pass table profiling: row count, per-column null counts, " +
        "distinct cardinalities, numeric and temporal min/max — the " +
        "data-quality summary every ingest job should emit. A single " +
        "aggregation; at 100 TB swap the exact distincts for " +
        "approx_count_distinct (declared separately) and nothing else " +
        "changes.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.agg(
            count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col("o_totalprice"))).as("nulls_price"),
            countDistinct(col("o_orderstatus")).as("n_status"),
            countDistinct(col("o_custkey")).as("n_cust"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            min(to_date(col("o_orderdate"))).as("min_date"),
            max(to_date(col("o_orderdate"))).as("max_date"))
      },
      Some("""SELECT count(*) AS n_rows,
        count(*) - count(o_totalprice) AS nulls_price,
        count(DISTINCT o_orderstatus) AS n_status,
        count(DISTINCT o_custkey) AS n_cust,
        min(o_totalprice) AS min_price,
        max(o_totalprice) AS max_price,
        CAST(min(o_orderdate) AS DATE) AS min_date,
        CAST(max(o_orderdate) AS DATE) AS max_date
        FROM orders""")),

    Q(
      "profile_psi_drift",
      "Distribution-drift audit by Population Stability Index: events " +
        "split into reference/current halves at the exact integer-µs " +
        "timestamp midpoint, `value` binned into 10 equal-width " +
        "buckets over the global range, and each bucket reporting its " +
        "PSI term (pᴬ−pᴮ)·ln(pᴬ/pᴮ) with add-half smoothing (Σ terms " +
        "> 0.2 is the classic retrain trigger). Range and midpoint " +
        "are two 1-row broadcasts; the bucket/segment counts are one " +
        "map-side-combinable agg; probabilities are exact integer " +
        "ratios, and the single per-bucket ln rounds at 4 — libm vs " +
        "DuckDB ln agree far beyond that.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(Tables.epochUs(col("ts")).as("us"), col("value"))
        val stats = e.agg(min("us").as("mn"), max("us").as("mx"),
          min("value").as("vmn"), max("value").as("vmx"))
        val counts = e.crossJoin(broadcast(stats))
          .withColumn("seg",
            when(col("us") * 2 <= col("mn") + col("mx"), lit("ref"))
              .otherwise(lit("cur")))
          .withColumn("bucket", least(lit(9L), floor(
            (col("value") - col("vmn")) * 10.0 / (col("vmx") - col("vmn")))
            .cast("long")))
          .groupBy("bucket")
          .agg(
            sum(when(col("seg") === "ref", 1L).otherwise(0L)).as("n_ref"),
            sum(when(col("seg") === "cur", 1L).otherwise(0L)).as("n_cur"))
        val tot = counts.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
        counts.crossJoin(broadcast(tot))
          .withColumn("pa", (col("n_ref") + 0.5) / (col("tr") + 5.0))
          .withColumn("pb", (col("n_cur") + 0.5) / (col("tc") + 5.0))
          .select(col("bucket"), col("n_ref"), col("n_cur"),
            round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 4)
              .as("psi_term"))
          .orderBy("bucket")
      },
      Some("""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
            FROM events),
        st AS (SELECT min(us) AS mn, max(us) AS mx,
            min(value) AS vmn, max(value) AS vmx FROM e),
        b AS (SELECT
            CASE WHEN us * 2 <= mn + mx THEN 'ref' ELSE 'cur' END AS seg,
            least(9, CAST(floor((value - vmn) * 10.0 / (vmx - vmn)) AS BIGINT)) AS bucket
          FROM e, st),
        c AS (SELECT bucket,
            CAST(sum(CASE WHEN seg = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
            CAST(sum(CASE WHEN seg = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
          FROM b GROUP BY 1),
        t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
            CAST(sum(n_cur) AS BIGINT) AS tc FROM c),
        p AS (SELECT bucket, n_ref, n_cur,
            (n_ref + 0.5) / (tr + 5.0) AS pa,
            (n_cur + 0.5) / (tc + 5.0) AS pb
          FROM c, t)
        SELECT bucket, n_ref, n_cur,
          round((pa - pb) * ln(pa / pb), 4) AS psi_term
        FROM p ORDER BY bucket""")),

    Q(
      "profile_key_skew",
      "Shuffle-key skew profiler — the diagnostic run BEFORE deciding " +
        "to salt a join or aggregation (Skew.saltedJoinHot's input): " +
        "for the candidate key, the heaviest 10 keys with their share " +
        "of total rows, plus the max/mean hot ratio. One map-side-" +
        "combinable count per key, a 1-row broadcast of the totals, " +
        "TakeOrderedAndProject for the top-10 — the profiler itself " +
        "never global-sorts. Shares are exact integer ratios rounded " +
        "once.",
      (s, dir) => {
        val k = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_suppkey").as("key"))
          .agg(count(lit(1)).as("n"))
        val tot = k.agg(sum("n").as("t"), count(lit(1)).as("nk"))
        k.crossJoin(broadcast(tot))
          .select(col("key"), col("n"),
            round(col("n").cast("double") / col("t"), 6).as("share"),
            round(col("n").cast("double") * col("nk") / col("t"), 4)
              .as("hot_ratio"))
          .orderBy(col("n").desc, col("key"))
          .limit(10)
      },
      Some("""WITH k AS (SELECT l_suppkey AS key, count(*) AS n
            FROM lineitem GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS nk FROM k)
        SELECT key, n,
          round(CAST(n AS DOUBLE) / t, 6) AS share,
          round(CAST(n AS DOUBLE) * nk / t, 4) AS hot_ratio
        FROM k, t ORDER BY n DESC, key LIMIT 10""")),

    Q(
      "profile_constraints",
      "Declarative data-validation constraints (the Deequ shape — the " +
        "quality gate an ingest or training pipeline evaluates before " +
        "shipping a corpus): completeness, key uniqueness, a value " +
        "range, and domain membership, each reported as (constraint, " +
        "metric, pass). ALL metrics come out of ONE aggregation pass " +
        "over the table (constant-size buffers, map-side combined); " +
        "the per-constraint rows are a stack() over that single " +
        "broadcastable row — adding a constraint never adds a scan. " +
        "Metrics are exact integer ratios rounded once at the end.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val m = d.agg(
          count(lit(1)).as("n"),
          count(col("text")).as("n_text"),
          countDistinct(col("doc_id")).as("n_ids"),
          sum(when(col("n_chars") >= 0, lit(1L)).otherwise(lit(0L))).as("n_chars_ok"),
          sum(when(col("lang").isin("en", "fr", "de", "es"), lit(1L))
            .otherwise(lit(0L))).as("n_lang_ok"))
        m.select(expr(
            "stack(4," +
              "'completeness_text', n_text, " +
              "'uniqueness_doc_id', n_ids, " +
              "'range_n_chars_nonneg', n_chars_ok, " +
              "'membership_lang', n_lang_ok) AS (check_name, hits)"),
            col("n"))
          .select(col("check_name"),
            round(col("hits").cast("double") / col("n"), 6).as("metric"),
            (col("hits") === col("n")).as("pass"))
          .orderBy("check_name")
      },
      Some("""WITH m AS (SELECT count(*) AS n,
            count(text) AS n_text,
            count(DISTINCT doc_id) AS n_ids,
            CAST(sum(CASE WHEN n_chars >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_ok,
            CAST(sum(CASE WHEN lang IN ('en','fr','de','es') THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok
          FROM documents),
        s AS (
          SELECT 'completeness_text' AS check_name, n_text AS hits, n FROM m
          UNION ALL SELECT 'uniqueness_doc_id', n_ids, n FROM m
          UNION ALL SELECT 'range_n_chars_nonneg', n_chars_ok, n FROM m
          UNION ALL SELECT 'membership_lang', n_lang_ok, n FROM m)
        SELECT check_name, round(CAST(hits AS DOUBLE) / n, 6) AS metric,
          hits = n AS pass
        FROM s ORDER BY check_name""")),

    Q(
      "profile_k_anonymity",
      "k-anonymity audit over quasi-identifiers (nation × market " +
        "segment) — the re-identification risk check a privacy review " +
        "runs before a dataset ships, complementing text_pii_redact's " +
        "content-level scrub: the minimum equivalence-class size, " +
        "class count, and how many classes/rows fall below k=5. Two " +
        "chained aggregations (keyed group-by, then a 1-row reduce) — " +
        "the shuffle carries one row per equivalence class, never the " +
        "table.",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        c.groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("k"))
          .agg(
            min("k").as("k_min"),
            count(lit(1)).as("n_classes"),
            sum(when(col("k") < 5, lit(1L)).otherwise(lit(0L))).as("n_small_classes"),
            sum(when(col("k") < 5, col("k")).otherwise(lit(0L))).as("n_rows_at_risk"))
      },
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS k
          FROM customer GROUP BY 1, 2)
        SELECT CAST(min(k) AS BIGINT) AS k_min,
          count(*) AS n_classes,
          CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
          CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS n_rows_at_risk
        FROM g""")),

    Q(
      "agg_hll_sketch",
      "Re-aggregatable distinct-count sketches (DataSketches HLL): " +
        "per-group hll_sketch_agg → estimate, plus the roll-up " +
        "hll_union_agg over the per-group sketches. The union estimate " +
        "tracks sketching the raw data directly — THE pattern for " +
        "distinct counts over 100 TB partitioned by day: sketch once " +
        "per partition, merge bytes forever after, never rescan. " +
        "Sketch internals are implementation-specific → rows-only " +
        "(StatsSpec pins accuracy and merge-equals-direct).",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        val perGroup = li.groupBy("l_returnflag")
          .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
        val rolled = perGroup
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .select(lit("ALL").as("l_returnflag"), col("est"))
        perGroup
          .select(col("l_returnflag"), hll_sketch_estimate(col("sk")).as("est"))
          .unionByName(rolled)
          .orderBy("l_returnflag")
      },
      None),

    Q(
      "agg_kll_quantiles",
      "Re-aggregatable QUANTILE sketches (DataSketches KLL via the " +
        "native graft.expr.KllSketchAgg TypedImperativeAggregate — " +
        "Spark ships no built-in): per-group price sketch → p50/p90/p99 " +
        "estimates, plus the kll_merge_agg roll-up over the per-group " +
        "sketch bytes. Same 100 TB pattern as agg_hll_sketch but for " +
        "percentiles: sketch per partition once (~2 KB at k=200), merge " +
        "bytes forever, never rescan. KLL compaction is randomized → " +
        "rows-only; FeatureSpec pins the rank-error bound and " +
        "merge-vs-direct agreement.",
      (s, dir) => {
        import graft.expr.KllSketch
        val li = Tables.t(s, dir, "lineitem")
        val perGroup = li.groupBy("l_returnflag")
          .agg(KllSketch.sketchAgg(col("l_extendedprice")).as("sk"))
        val rolled = perGroup
          .agg(KllSketch.mergeAgg(col("sk")).as("sk"))
          .select(lit("ALL").as("l_returnflag"), col("sk"))
        perGroup.unionByName(rolled)
          .select(col("l_returnflag"),
            round(KllSketch.quantile(col("sk"), 0.5), 2).as("p50"),
            round(KllSketch.quantile(col("sk"), 0.9), 2).as("p90"),
            round(KllSketch.quantile(col("sk"), 0.99), 2).as("p99"))
          .orderBy("l_returnflag")
      },
      None),

    Q(
      "agg_theta_sketch",
      "Theta-sketch SET ALGEBRA (native graft.expr.ThetaSketchAgg " +
        "TypedImperativeAggregates): distinct clickers, viewers, the " +
        "INTERSECTION and DIFFERENCE of the two audiences, and the " +
        "theta_union_agg roll-up — all derived from two per-group " +
        "sketches, never co-shuffling the raw user ids. HLL cannot " +
        "answer the overlap questions; theta can, from sketch bytes " +
        "alone. Below nominal_entries=4096 the sketch is exact (no " +
        "sampling has begun), so at fixture scale (≤1500 users at " +
        "sf0.1) results equal the exact set counts and the DuckDB " +
        "oracle applies; beyond that the same plan degrades gracefully " +
        "to bounded-error estimates.",
      (s, dir) => {
        import graft.expr.ThetaSketch
        val sks = Tables.t(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
          .groupBy("event_type")
          .agg(ThetaSketch.sketchAgg(col("user_id")).as("sk"))
        val a = sks.filter(col("event_type") === "click").select(col("sk").as("ska"))
        val b = sks.filter(col("event_type") === "view").select(col("sk").as("skb"))
        val u = sks.agg(ThetaSketch.unionAgg(col("sk")).as("sku"))
        a.crossJoin(b).crossJoin(u) // three 1-row inputs
          .select(
            round(ThetaSketch.estimate(col("ska"))).cast("long").as("n_click"),
            round(ThetaSketch.estimate(col("skb"))).cast("long").as("n_view"),
            round(ThetaSketch.estimate(
              ThetaSketch.intersect(col("ska"), col("skb")))).cast("long").as("n_both"),
            round(ThetaSketch.estimate(
              ThetaSketch.aNotB(col("ska"), col("skb")))).cast("long").as("n_click_only"),
            round(ThetaSketch.estimate(col("sku"))).cast("long").as("n_either"))
      },
      Some("""WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
          v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
        SELECT (SELECT count(*) FROM c) AS n_click,
          (SELECT count(*) FROM v) AS n_view,
          (SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM v)) AS n_both,
          (SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM v)) AS n_click_only,
          (SELECT count(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM v)) AS n_either""")),

    Q(
      "agg_argmax",
      "Argmax/argmin aggregates: max_by/min_by pick a companion column " +
        "at the group's extreme (deterministic here because the ordering " +
        "key o_orderkey is unique). One hash agg, constant-size buffers.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.groupBy("o_orderpriority")
          .agg(
            max_by(col("o_totalprice"), col("o_orderkey")).as("price_of_last"),
            min_by(col("o_totalprice"), col("o_orderkey")).as("price_of_first"),
            max(col("o_orderkey")).as("last_key"),
            min(col("o_orderkey")).as("first_key"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        arg_max(o_totalprice, o_orderkey) AS price_of_last,
        arg_min(o_totalprice, o_orderkey) AS price_of_first,
        max(o_orderkey) AS last_key,
        min(o_orderkey) AS first_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    Q(
      "set_union_byname",
      "unionByName with allowMissingColumns: schema-mismatched frames " +
        "align by column NAME (not position), absent columns null-fill — " +
        "the schema-drift-tolerant append every long-lived pipeline " +
        "needs (reference freezes the first-seen schema instead; " +
        "SURVEY §1.2 documents the upgrade).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val a = d.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
        val b = d.filter(col("doc_id") % 2 === 1)
          .select(col("lang"), col("doc_id"), col("source"))
        a.unionByName(b, allowMissingColumns = true)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, NULL AS source FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 1
        ORDER BY doc_id""")),

    Q(
      "scalar_interval",
      "Interval arithmetic: timestamp ± INTERVAL, unit-truncating " +
        "timestampdiff/timestampadd — emitted as epoch-µs bigints (the " +
        "only portable sub-second encoding; see the ns-timestamp note " +
        "on the events source).",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        e.select(
            col("event_id"),
            Tables.epochUs(col("ts") + expr("INTERVAL 3 HOURS")).as("plus3h_us"),
            Tables.epochUs(col("ts") - expr("INTERVAL 90 MINUTES")).as("minus90m_us"),
            expr("timestampdiff(MINUTE, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)").as("mins_since"),
            Tables.epochUs(expr("timestampadd(DAY, 7, ts)")).as("plus7d_us"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 3 HOUR) AS plus3h_us,
        epoch_us(CAST(ts AS TIMESTAMP) - INTERVAL 90 MINUTE) AS minus90m_us,
        date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', CAST(ts AS TIMESTAMP)) AS mins_since,
        epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 7 DAY) AS plus7d_us
        FROM events ORDER BY event_id""")),

    Q(
      "window_ignore_nulls",
      "IGNORE NULLS window navigation over a sparse (null-bearing) " +
        "measure: lag skipping nulls, nth_value from frame start, and " +
        "last-non-null over a running frame (the LOCF primitive). " +
        "Per-user partitions shuffle once; frames are ROWS-bounded so " +
        "state per partition is O(1).",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val v = when(col("event_type") === "purchase", col("value"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.select(
            col("event_id"), col("user_id"), v.as("purchase_v"),
            lag(v, 1, null, ignoreNulls = true).over(w).as("prev_purchase"),
            nth_value(v, 2, ignoreNulls = true).over(wRun).as("second_purchase"),
            last(v, ignoreNulls = true).over(wRun).as("locf_purchase"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, ts,
            CASE WHEN event_type = 'purchase' THEN value END AS v FROM events)
        SELECT event_id, user_id, v AS purchase_v,
          lag(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase,
          nth_value(v, 2 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_purchase,
          last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_purchase
        FROM e ORDER BY event_id""")),

    Q(
      "ts_gapfill_locf",
      "Time-series gap-fill: per-user daily revenue joined onto a " +
        "generated date spine (explode(sequence) — distributed, never a " +
        "driver loop), missing days filled by last-observation-carried-" +
        "forward with a leading-zero default. The spine is |users|×|days| " +
        "— at 100 TB generate it per user-partition (as here) so the " +
        "join stays co-partitioned on user_id.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events").filter(col("user_id") < 40)
        val daily = e
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(round(sum("value"), 2).as("day_value"))
        val spine = e.select("user_id").distinct()
          .select(col("user_id"),
            explode(sequence(
              lit(java.sql.Date.valueOf("2024-01-01")),
              lit(java.sql.Date.valueOf("2024-01-30")))).as("day"))
        val wRun = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "day"), "left")
          .select(
            col("user_id"), col("day"), col("day_value"),
            coalesce(last(col("day_value"), ignoreNulls = true).over(wRun), lit(0.0)).as("filled"))
          .orderBy("user_id", "day")
      },
      Some("""WITH f AS (SELECT user_id, CAST(ts AS DATE) AS day, value
            FROM events WHERE user_id < 40),
        daily AS (SELECT user_id, day, round(sum(value), 2) AS day_value
            FROM f GROUP BY 1, 2),
        users AS (SELECT DISTINCT user_id FROM f),
        days AS (SELECT CAST(unnest(range(DATE '2024-01-01', DATE '2024-01-31',
            INTERVAL 1 DAY)) AS DATE) AS day),
        spine AS (SELECT user_id, day FROM users, days)
        SELECT s.user_id, s.day, d.day_value,
          coalesce(last_value(d.day_value IGNORE NULLS) OVER (
            PARTITION BY s.user_id ORDER BY s.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled
        FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        ORDER BY s.user_id, s.day""")),

    Q(
      "ts_ewma",
      "Exponentially-weighted moving average (α=0.3, adjust form) of " +
        "each user's daily value series, final smoothed value per " +
        "user. The recursive definition is rewritten to its closed " +
        "weighted-sum form — ewma = Σ xᵢ(1-α)^(n-i) / Σ (1-α)^(n-i) — " +
        "so it is one window (row_number + per-key count) and one hash " +
        "aggregation instead of a sequential fold: fully parallel per " +
        "key, exponents bounded by series length so no overflow. The " +
        "two double sums are sorted sequential folds (series length is " +
        "calendar-bounded, so collecting per key is safe) — bit-" +
        "identical under any partial-aggregation order.",
      (s, dir) => {
        val decay = 0.7 // 1 - α
        def foldSum(c: Column): Column =
          aggregate(sort_array(collect_list(c)), lit(0.0), (acc, x) => acc + x)
        // the per-day sum is ALSO a double aggregate — fold it sorted
        // too, or partial-agg order noise in x defeats the downstream
        // sorted fold
        val daily = Tables.t(s, dir, "events")
          .filter(col("user_id") < 60)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(foldSum(col("value")).as("x"))
        val wSeq = Window.partitionBy("user_id").orderBy("day")
        val wAll = Window.partitionBy("user_id")
        daily
          .withColumn("rn", row_number().over(wSeq))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("w", pow(lit(decay), col("n") - col("rn")))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_days"),
            round(foldSum(col("x") * col("w")) / foldSum(col("w")), 6).as("ewma"))
          .orderBy("user_id")
      },
      Some("""WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
            list_reduce(list_sort(list(value)), (a, b) -> a + b) AS x
          FROM events WHERE user_id < 60 GROUP BY 1, 2),
        seq AS (
          SELECT user_id, x,
            row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn,
            count(*) OVER (PARTITION BY user_id) AS n
          FROM daily),
        terms AS (SELECT user_id, x, pow(0.7, n - rn) AS w FROM seq)
        SELECT user_id, count(*) AS n_days,
          round(list_reduce(list_sort(list(x * w)), (a, b) -> a + b) /
                list_reduce(list_sort(list(w)), (a, b) -> a + b), 6) AS ewma
        FROM terms GROUP BY user_id
        ORDER BY user_id""")),

    Q(
      "ts_seasonality",
      "Hour-of-day seasonality profile: event volume and mean value " +
        "per hour slot, plus each slot's deviation from the global " +
        "mean — the seasonal-naive baseline every forecasting and " +
        "anomaly pipeline starts from. One map-side-combinable hash " +
        "agg to 24 rows, then a 1-row broadcast for the global mean; " +
        "no sorted fold needed because outputs round at scale 2, " +
        "which absorbs partial-aggregation ulp noise (the audited " +
        "coarse-round class — see DeterminismSpec).",
      (s, dir) => {
        val prof = Tables.t(s, dir, "events")
          .groupBy(hour(col("ts").cast("timestamp")).as("hod"))
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        val glob = prof.agg(sum("n").as("gn"), sum("sv").as("gs"))
        prof.crossJoin(broadcast(glob))
          .select(col("hod"), col("n"),
            round(col("sv") / col("n"), 2).as("hod_avg"),
            round(col("sv") / col("n") - col("gs") / col("gn"), 2)
              .as("dev_from_mean"))
          .orderBy("hod")
      },
      Some("""WITH prof AS (SELECT
            CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
            count(*) AS n, sum(value) AS sv
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS gn, sum(sv) AS gs FROM prof)
        SELECT hod, n, round(sv / n, 2) AS hod_avg,
          round(sv / n - gs / gn, 2) AS dev_from_mean
        FROM prof, tot ORDER BY hod""")),

    Q(
      "ts_period_over_period",
      "Month-over-month growth per nation: monthly order revenue " +
        "(rounded at the aggregate, the audited coarse class), the " +
        "MoM percent change via lag, and a 3-month trailing moving " +
        "average — the period-comparison dashboard primitive. One " +
        "hash agg to nation×month rows, then both window passes ride " +
        "a single exchange+sort on the nation key; the pct-change " +
        "ratio and the 3-row frame average run over already-rounded " +
        "exact inputs, so fine rounding downstream is order-safe.",
      (s, dir) => {
        val m = Tables.t(s, dir, "orders")
          .join(Tables.t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            to_date(date_trunc("MONTH", col("o_orderdate"))).as("month"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        val w = Window.partitionBy("n_name").orderBy("month")
        val f = w.rowsBetween(-2, 0)
        // the moving average is a floor-average in exact integer cents:
        // float summation (DuckDB compensates, Spark folds) and the
        // round() of a frame average sitting exactly on a .005
        // boundary (Spark rounds the shortest decimal repr HALF_UP,
        // DuckDB rounds the binary value) both flip the last digit —
        // integer DIV then /100.0 involves neither
        m.withColumn("prev", lag("rev", 1).over(w))
          .withColumn("cents", round(col("rev") * 100).cast("long"))
          .withColumn("sc", sum("cents").over(f))
          .withColumn("nc", count(lit(1)).over(f))
          .select(col("n_name"), col("month"), col("rev"),
            round((col("rev") - col("prev")) / col("prev"), 4).as("mom_pct"),
            (expr("sc DIV nc").cast("double") / lit(100.0)).as("ma3"))
          .orderBy("n_name", "month")
      },
      Some("""WITH m AS (SELECT n_name,
            CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS month,
            round(sum(o_totalprice), 2) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        c AS (SELECT n_name, month, rev,
            CAST(round(rev * 100) AS BIGINT) AS cents FROM m)
        SELECT n_name, month, rev,
          round((rev - lag(rev) OVER w) / lag(rev) OVER w, 4) AS mom_pct,
          (CAST(sum(cents) OVER f AS BIGINT) // (count(*) OVER f)) / 100.0 AS ma3
        FROM c
        WINDOW w AS (PARTITION BY n_name ORDER BY month),
          f AS (PARTITION BY n_name ORDER BY month
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY n_name, month""")),

    Q(
      "ts_anomaly_zscore",
      "Trailing-window anomaly detection: each user-day's value scored " +
        "against the mean/stddev of its own previous 7 days (ROWS " +
        "7 PRECEDING..1 PRECEDING — strictly causal, no leakage); " +
        "emit days with |z| > 2 and ≥4 prior observations. One window " +
        "pass per key — the standard streaming-compatible outlier " +
        "screen for metrics pipelines.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .filter(col("user_id") < 80)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum("value").as("x"))
        val trail = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(-7, -1)
        daily
          .withColumn("mu", avg("x").over(trail))
          .withColumn("sd", stddev_samp(col("x")).over(trail))
          .withColumn("n_prior", count(lit(1)).over(trail))
          // Membership thresholds compare ROUNDED values: Spark and the
          // oracle may sum the trailing window in different orders, so a
          // raw |z| or sd within float noise of the threshold could be
          // admitted by one engine and not the other (determinism
          // contract: round before compare).
          .filter(col("n_prior") >= 4 && round(col("sd"), 6) > 0)
          .withColumn("z", round((col("x") - col("mu")) / col("sd"), 6))
          .filter(abs(col("z")) > 2)
          .select(col("user_id"), col("day"),
            round(col("x"), 3).as("x"), round(col("z"), 3).as("z"))
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS x
          FROM events WHERE user_id < 80 GROUP BY 1, 2),
        scored AS (
          SELECT user_id, day, x,
            avg(x) OVER w AS mu,
            stddev_samp(x) OVER w AS sd,
            count(*) OVER w AS n_prior
          FROM daily
          WINDOW w AS (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT user_id, day, round(x, 3) AS x, round(zr, 3) AS z
        FROM (SELECT user_id, day, x, round((x - mu) / sd, 6) AS zr
              FROM scored
              WHERE n_prior >= 4 AND round(sd, 6) > 0)
        WHERE abs(zr) > 2
        ORDER BY user_id, day""")),

    Q(
      "ts_resample_ohlc",
      "Downsample the event stream to per-type daily OHLC bars: open/" +
        "close by deterministic (ts, event_id) ordering via first/last " +
        "window navigation, high/low/volume as plain aggregates. One " +
        "window pass + one hash aggregation, both partitioned on " +
        "(event_type, day) — the resample key — so at 100 TB the " +
        "shuffle is one exchange on the bar key and bars stream out " +
        "per partition. The financial-bar shape of time-series " +
        "downsampling (candles, metric rollups, sensor decimation).",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("event_type"),
            to_date(col("ts")).as("day"),
            col("ts"), col("event_id"), col("value"))
        val wBar = Window.partitionBy("event_type", "day")
          .orderBy(col("ts"), col("event_id"))
        val wAll = wBar.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        e.withColumn("open", first("value").over(wBar))
          .withColumn("close", last("value").over(wAll))
          .groupBy("event_type", "day")
          .agg(
            round(max("open"), 3).as("open"),
            round(max("value"), 3).as("high"),
            round(min("value"), 3).as("low"),
            round(max("close"), 3).as("close"),
            count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("volume"))
          .orderBy("event_type", "day")
      },
      Some("""WITH e AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(ts AS TIMESTAMP) AS tsv, event_id, value
          FROM events),
        nav AS (
          SELECT event_type, day, value,
            first_value(value) OVER w AS open,
            last_value(value) OVER (PARTITION BY event_type, day
              ORDER BY tsv, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
          FROM e
          WINDOW w AS (PARTITION BY event_type, day ORDER BY tsv, event_id))
        SELECT event_type, day,
          round(max(open), 3) AS open,
          round(max(value), 3) AS high,
          round(min(value), 3) AS low,
          round(max(close), 3) AS close,
          count(*) AS n_events,
          round(sum(value), 2) AS volume
        FROM nav GROUP BY event_type, day
        ORDER BY event_type, day"""))
  )
}
