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

  /** Order-pinned double sum over a BOUNDED group (collect, sort, fold)
    * — the float-determinism idiom for small per-group summations whose
    * partial-aggregation order would otherwise wobble in the last ulp.
    * DuckDB twin: list_reduce(list_sort(list(x)), (a, b) -> a + b). */
  /** Standard normal CDF via the Abramowitz–Stegun 26.2.17
    * polynomial (|error| < 7.5e-8) — an engine-portable fixed-shape
    * float formula (exp/sqrt/fma chains evaluate identically in Spark
    * and DuckDB), giving deterministic p-values without either engine
    * needing an erf builtin. Mirrored textually by [[normCdfSql]]. */
  private[ops] def normCdf(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * ax)
    val poly = ((((lit(1.330274429) * t - lit(1.821255978)) * t
      + lit(1.781477937)) * t - lit(0.356563782)) * t
      + lit(0.319381530)) * t
    val pdf = exp(ax * ax * -0.5) * lit(0.3989422804014327)
    val upper = lit(1.0) - pdf * poly
    when(x >= 0, upper).otherwise(lit(1.0) - upper)
  }

  /** DuckDB spelling of [[normCdf]] over the SQL expression `e` —
    * the same association order, so the doubles match bit for bit. */
  private[ops] def normCdfSql(e: String): String =
    s"""(CASE WHEN ($e) >= 0
        THEN 1.0 - exp(abs($e) * abs($e) * -0.5) * 0.3989422804014327
          * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs($e)))
            - 1.821255978) * (1.0 / (1.0 + 0.2316419 * abs($e)))
            + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs($e)))
            - 0.356563782) * (1.0 / (1.0 + 0.2316419 * abs($e)))
            + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs($e))))
        ELSE 1.0 - (1.0 - exp(abs($e) * abs($e) * -0.5) * 0.3989422804014327
          * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs($e)))
            - 1.821255978) * (1.0 / (1.0 + 0.2316419 * abs($e)))
            + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs($e)))
            - 0.356563782) * (1.0 / (1.0 + 0.2316419 * abs($e)))
            + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs($e)))))
        END)"""

  private[ops] def sfold(c: Column): Column =
    aggregate(sort_array(collect_list(c)), lit(0.0), (acc, x) => acc + x)

  /** Exclusive per-bucket prefix offsets of two count columns — the
    * scalable spine of a global cumulative sum: within-bucket running
    * sums stay in a window PARTITIONED by bucket, and this helper turns
    * the (tiny, one-row-per-bucket) totals into broadcast-joinable
    * offsets via a single 1-row sorted-array prefix fold, so no
    * unpartitioned window ever materializes (the Skew.globalRank trick
    * generalized to prefix sums). Input: (bucketCol, aCol, bCol) totals
    * per bucket; output: (bucketCol, oa, ob). */
  private def bucketPrefixOffsets(
      totals: org.apache.spark.sql.DataFrame,
      bucketCol: String): org.apache.spark.sql.DataFrame =
    totals
      .agg(sort_array(collect_list(struct(col(bucketCol), col("sa"), col("sb")))).as("arr"))
      .select(explode(expr(
        s"transform(arr, (x, i) -> struct(x.$bucketCol AS $bucketCol, " +
          "aggregate(slice(arr, 1, i), CAST(0 AS BIGINT), (acc, y) -> acc + y.sa) AS oa, " +
          "aggregate(slice(arr, 1, i), CAST(0 AS BIGINT), (acc, y) -> acc + y.sb) AS ob))")).as("o"))
      .select(col(s"o.$bucketCol").as(bucketCol), col("o.oa").as("oa"), col("o.ob").as("ob"))

  def defs: Seq[Q] = Seq(

    Q(
      "stats_kruskal_wallis",
      "Kruskal–Wallis H test across the five event types' purchase " +
        "values — the k-sample generalization of stats_mann_whitney " +
        "(one-way ANOVA on ranks, no normality assumption). Same " +
        "scalable rank spine: per-value counts, bucket-partitioned " +
        "cumulative windows + broadcast prefix offsets, mid-ranks in " +
        "doubled-integer form c·(2·below + ties + 1) so every rank " +
        "sum is exact decimal; the per-group R²/n terms fold in group " +
        "order (bounded k), and the tie correction Σ(t³−t)/(N³−N) is " +
        "exact integer arithmetic until the final division.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select(round(col("value") * 100).cast("long").as("v"),
            col("event_type").as("g"))
        val vc = ev.groupBy("v", "g").agg(count(lit(1)).as("c"))
        val tv = vc.groupBy("v").agg(sum("c").as("t"))
        val bkt = tv.withColumn("b", floor(col("v") / 1048576L).cast("long"))
        val wIn = Window.partitionBy("b").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bkt.withColumn("it", sum("t").over(wIn))
        val offs = bucketPrefixOffsets(
          bkt.groupBy("b").agg(sum("t").as("sa"), sum("t").as("sb")), "b")
        val ranked = cum.join(broadcast(offs), Seq("b"))
          .select(col("v"), col("t"), (col("oa") + col("it") - col("t")).as("below"))
        val grp = vc.join(ranked, Seq("v"))
          .groupBy("g").agg(
            sum(col("c").cast("decimal(38,0)")
              * (col("below") * 2 + col("t") + 1)).as("r2"),
            sum("c").as("n"))
        val ties = ranked.agg(
          sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t")).as("tt"),
          sum("t").as("nn"))
        val sTerm = grp.agg(aggregate(
            sort_array(collect_list(struct(col("g"),
              ((col("r2") * col("r2")).cast("double")
                / col("n").cast("double")).as("d")))),
            lit(0.0), (acc, x) => acc + x.getField("d")).as("ss"),
          count(lit(1)).as("k"))
        sTerm.crossJoin(broadcast(ties))
          .select(
            col("nn").as("n"), col("k"),
            round(lit(3.0) / (col("nn").cast("double") * (col("nn") + 1))
              * col("ss") - lit(3.0) * (col("nn").cast("double") + 1), 6).as("h_stat"),
            round((lit(3.0) / (col("nn").cast("double") * (col("nn") + 1))
              * col("ss") - lit(3.0) * (col("nn").cast("double") + 1))
              / (lit(1.0) - col("tt").cast("double")
                / (col("nn").cast("double") * col("nn") * col("nn") - col("nn"))),
              6).as("h_corrected"))
      },
      Some("""WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
            event_type AS g FROM events),
        vc AS (SELECT v, g, count(*) AS c FROM ev GROUP BY 1, 2),
        tv AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM vc GROUP BY v),
        rk AS (SELECT v, t,
            CAST(sum(t) OVER (ORDER BY v) AS BIGINT) - t AS below FROM tv),
        grp AS (SELECT g,
            sum(CAST(c AS HUGEINT) * (below * 2 + t + 1)) AS r2,
            CAST(sum(c) AS BIGINT) AS n
          FROM vc JOIN rk USING (v) GROUP BY g),
        ties AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tt,
            CAST(sum(t) AS BIGINT) AS nn FROM rk),
        s AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list(CAST(r2 * r2 AS DOUBLE) / n ORDER BY g)),
            (a, b) -> a + b) AS ss, count(*) AS k FROM grp)
        SELECT nn AS n, k,
          round(3.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * ss
            - 3.0 * (CAST(nn AS DOUBLE) + 1), 6) AS h_stat,
          round((3.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * ss
              - 3.0 * (CAST(nn AS DOUBLE) + 1))
            / (1.0 - CAST(tt AS DOUBLE)
              / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6) AS h_corrected
        FROM s, ties""")),

    Q(
      "ts_stl_lite",
      "STL-style seasonal/trend decomposition of the daily revenue " +
        "series per event type: trend = centered 7-day moving average " +
        "(full windows only), seasonal = per-day-of-week mean of the " +
        "detrended series, residual = remainder. All intermediate " +
        "state is exact integers — the trend rides as the 7-day SUM " +
        "of cents, the detrended series as 7·y − trend7 — so the only " +
        "float ops are the final divisions, identical in both " +
        "engines. Day-of-week is epoch-day mod 7 (engine-portable; " +
        "no locale-dependent dayofweek). Windows partition by event " +
        "type, seasonal means are a 35-row broadcast: nothing " +
        "unpartitioned, nothing corpus-sized on the driver.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val w = Window.partitionBy("g").orderBy("day").rowsBetween(-3, 3)
        val tr = daily
          .withColumn("t7", sum("y").over(w))
          .withColumn("c7", count(lit(1)).over(w))
          .filter(col("c7") === 7)
          .withColumn("dow",
            pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)))
          .withColumn("detr7", col("y") * 7 - col("t7"))
        val seas = tr.groupBy("g", "dow")
          .agg(sum("detr7").as("s7"), count(lit(1)).as("sc"))
        tr.join(broadcast(seas), Seq("g", "dow"))
          .select(col("g").as("event_type"), col("day"),
            round(col("y").cast("double") / 100.0, 2).as("y_val"),
            round(col("t7").cast("double") / 700.0, 6).as("trend"),
            round(col("s7").cast("double")
              / (lit(700.0) * col("sc").cast("double")), 6).as("seasonal"),
            round(col("y").cast("double") / 100.0
              - col("t7").cast("double") / 700.0
              - col("s7").cast("double")
                / (lit(700.0) * col("sc").cast("double")), 6).as("resid"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        tr AS (
          SELECT g, day, y,
            CAST(sum(y) OVER w AS BIGINT) AS t7,
            count(*) OVER w AS c7,
            datediff('day', DATE '1970-01-01', day) % 7 AS dow
          FROM daily
          WINDOW w AS (PARTITION BY g ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        full7 AS (SELECT *, y * 7 - t7 AS detr7 FROM tr WHERE c7 = 7),
        seas AS (SELECT g, dow, CAST(sum(detr7) AS BIGINT) AS s7,
            CAST(count(*) AS BIGINT) AS sc
          FROM full7 GROUP BY 1, 2)
        SELECT f.g AS event_type, f.day,
          round(CAST(f.y AS DOUBLE) / 100.0, 2) AS y_val,
          round(CAST(f.t7 AS DOUBLE) / 700.0, 6) AS trend,
          round(CAST(s.s7 AS DOUBLE) / (700.0 * CAST(s.sc AS DOUBLE)), 6)
            AS seasonal,
          round(CAST(f.y AS DOUBLE) / 100.0
            - CAST(f.t7 AS DOUBLE) / 700.0
            - CAST(s.s7 AS DOUBLE) / (700.0 * CAST(s.sc AS DOUBLE)), 6)
            AS resid
        FROM full7 f JOIN seas s ON f.g = s.g AND f.dow = s.dow
        ORDER BY event_type, day""")),

    Q(
      "ts_holt_linear",
      "Holt double-exponential smoothing (α=0.3, β=0.1) of each event " +
        "type's daily revenue series, with a 7-day-ahead forecast — " +
        "the trend-aware successor to ts_ewma's level-only smoothing. " +
        "The recurrence is genuinely sequential, so it runs as ONE " +
        "sorted fold per series over (level, trend) struct state — " +
        "series are calendar-bounded (the sfold contract), state is " +
        "two doubles, and the fold replays in DuckDB element for " +
        "element. Oracle-side traps discovered here: DuckDB 1.0 " +
        "list_reduce updates STRUCT accumulators field-by-field in " +
        "place (a later field reads the new level), so the oracle's " +
        "state is a 2-list which evaluates against the old state like " +
        "Spark does; and every literal is CAST to DOUBLE because " +
        "DuckDB bare decimals would switch the arithmetic to DECIMAL. " +
        "Inputs ride as exact integer cents so both engines fold " +
        "identical doubles.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val folded = daily.groupBy("g").agg(
          count(lit(1)).as("n_days"),
          aggregate(
            transform(sort_array(collect_list(struct(col("day"), col("y")))),
              e => struct(e.getField("y").cast("double").as("l"),
                lit(0.0).as("b"), lit(-1L).as("i"))),
            struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0L).as("i")),
            (acc, e) => when(acc.getField("i") === 0,
                struct(e.getField("l").as("l"), lit(0.0).as("b"), lit(1L).as("i")))
              .otherwise(struct(
                (lit(0.3) * e.getField("l")
                  + lit(0.7) * (acc.getField("l") + acc.getField("b"))).as("l"),
                (lit(0.1) * ((lit(0.3) * e.getField("l")
                    + lit(0.7) * (acc.getField("l") + acc.getField("b")))
                  - acc.getField("l"))
                  + lit(0.9) * acc.getField("b")).as("b"),
                (acc.getField("i") + 1).as("i")))).as("st"))
        folded.select(col("g").as("event_type"), col("n_days"),
            round(col("st.l") / 100.0, 6).as("level"),
            round(col("st.b") / 100.0, 6).as("trend"),
            round((col("st.l") + lit(7.0) * col("st.b")) / 100.0, 6)
              .as("forecast_7d"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        folded AS (
          SELECT g, count(*) AS n_days,
            list_reduce(list([CAST(y AS DOUBLE), CAST(0 AS DOUBLE)]
                ORDER BY day),
              (acc, e) -> [
                CAST(0.3 AS DOUBLE) * e[1]
                  + CAST(0.7 AS DOUBLE) * (acc[1] + acc[2]),
                CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * e[1]
                    + CAST(0.7 AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
                  + CAST(0.9 AS DOUBLE) * acc[2]]) AS st
          FROM daily GROUP BY g)
        SELECT g AS event_type, n_days,
          round(st[1] / 100.0, 6) AS level,
          round(st[2] / 100.0, 6) AS trend,
          round((st[1] + CAST(7 AS DOUBLE) * st[2]) / 100.0, 6) AS forecast_7d
        FROM folded ORDER BY event_type""")),

    Q(
      "stats_fisher_exact",
      "Fisher's exact test (two-sided) on the English × src0 " +
        "contingency table of the document corpus — the small-cell " +
        "test chi² can't honestly run. Everything derives from the " +
        "four counts of ONE aggregate scan: log-factorials are " +
        "ascending sequential folds over sequence(1, m) (identical " +
        "fold order in DuckDB, so bit-identical doubles — no lgamma, " +
        "which the two engines implement differently), the " +
        "hypergeometric tail walks k via the log-space recurrence " +
        "P(k+1)/P(k) = (r1−k)(c1−k)/((k+1)(n2+k+1)) in one bounded " +
        "fold (≤ min(r1,c1) steps), and the two-sided rule sums " +
        "every table with P(k) ≤ P(obs)·(1+1e-7). The fold state is " +
        "a 2-list on the oracle side (DuckDB struct-accumulator " +
        "in-place bug, see ts_holt_linear). O(n) work on one row — " +
        "margins at 100 TB still produce a one-row test.",
      (s, dir) => {
        def lf(m: Column): Column = when(m > 0,
          aggregate(sequence(lit(1L), m.cast("long")), lit(0.0),
            (acc, i) => acc + log(i.cast("double")))).otherwise(lit(0.0))
        def lnC(m: Column, j: Column): Column = lf(m) - lf(j) - lf(m - j)
        val eps = lit(1e-7)
        val cells = Tables.t(s, dir, "documents").agg(
          count(lit(1)).as("n"),
          count(when(col("lang") === "en", 1)).as("r1"),
          count(when(col("source") === "src0", 1)).as("c1"),
          count(when(col("lang") === "en" && col("source") === "src0", 1)).as("a"))
        val b = cells
          .withColumn("kmin", greatest(lit(0L), col("r1") + col("c1") - col("n")))
          .withColumn("kmax", least(col("r1"), col("c1")))
          .withColumn("n2", col("n") - col("r1") - col("c1"))
          .withColumn("lpa", lnC(col("c1"), col("a"))
            + lnC(col("n") - col("c1"), col("r1") - col("a"))
            - lnC(col("n"), col("r1")))
          .withColumn("lpmin", lnC(col("c1"), col("kmin"))
            + lnC(col("n") - col("c1"), col("r1") - col("kmin"))
            - lnC(col("n"), col("r1")))
        val folded = b.withColumn("st", aggregate(
          when(col("kmax") > col("kmin"),
            sequence(col("kmin") + 1, col("kmax")))
            .otherwise(expr("CAST(array() AS array<bigint>)")),
          array(col("lpmin"),
            when(col("lpmin") <= col("lpa") + eps, exp(col("lpmin")))
              .otherwise(lit(0.0))),
          (acc, k) => {
            val lp = element_at(acc, 1)
              .plus(log(((col("r1") - (k - 1)) * (col("c1") - (k - 1))).cast("double")))
              .minus(log((k * (col("n2") + k)).cast("double")))
            array(lp, element_at(acc, 2)
              + when(lp <= col("lpa") + eps, exp(lp)).otherwise(lit(0.0)))
          }))
        folded.select(col("a"), col("r1"), col("c1"), col("n"),
          round(least(element_at(col("st"), 2), lit(1.0)), 6).as("p_two_sided"),
          when((col("r1") - col("a")) * (col("c1") - col("a")) === 0, lit(null).cast("double"))
            .otherwise(round((col("a") * (col("n2") + col("a"))).cast("double")
              / ((col("r1") - col("a")) * (col("c1") - col("a"))).cast("double"), 6))
            .as("odds_ratio"))
      },
      Some {
        def dlf(m: String) =
          s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
            s"list_transform(range(1, ($m) + 1), i -> ln(CAST(i AS DOUBLE)))), " +
            "(x, y) -> x + y)"
        def dlnC(m: String, j: String) =
          s"(${dlf(m)} - ${dlf(j)} - ${dlf(s"($m) - ($j)")})"
        s"""WITH cells AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS r1,
            CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
            CAST(count(*) FILTER (WHERE lang = 'en' AND source = 'src0')
              AS BIGINT) AS a
          FROM documents),
        b AS (SELECT *,
            greatest(CAST(0 AS BIGINT), r1 + c1 - n) AS kmin,
            least(r1, c1) AS kmax, n - r1 - c1 AS n2,
            ${dlnC("c1", "a")} + ${dlnC("n - c1", "r1 - a")}
              - ${dlnC("n", "r1")} AS lpa
          FROM cells),
        b2 AS (SELECT *,
            ${dlnC("c1", "kmin")} + ${dlnC("n - c1", "r1 - kmin")}
              - ${dlnC("n", "r1")} AS lpmin
          FROM b),
        folded AS (SELECT *,
            list_reduce(list_prepend(
              [lpmin, CASE WHEN lpmin <= lpa + 1e-7
                THEN exp(lpmin) ELSE CAST(0 AS DOUBLE) END],
              list_transform(range(kmin + 1, kmax + 1),
                k -> [CAST(k AS DOUBLE), CAST(0 AS DOUBLE)])),
              (acc, e) -> [
                acc[1] + ln(CAST((r1 - (CAST(e[1] AS BIGINT) - 1))
                    * (c1 - (CAST(e[1] AS BIGINT) - 1)) AS DOUBLE))
                  - ln(CAST(CAST(e[1] AS BIGINT)
                    * (n2 + CAST(e[1] AS BIGINT)) AS DOUBLE)),
                acc[2] + CASE WHEN acc[1]
                    + ln(CAST((r1 - (CAST(e[1] AS BIGINT) - 1))
                      * (c1 - (CAST(e[1] AS BIGINT) - 1)) AS DOUBLE))
                    - ln(CAST(CAST(e[1] AS BIGINT)
                      * (n2 + CAST(e[1] AS BIGINT)) AS DOUBLE))
                    <= lpa + 1e-7
                  THEN exp(acc[1]
                    + ln(CAST((r1 - (CAST(e[1] AS BIGINT) - 1))
                      * (c1 - (CAST(e[1] AS BIGINT) - 1)) AS DOUBLE))
                    - ln(CAST(CAST(e[1] AS BIGINT)
                      * (n2 + CAST(e[1] AS BIGINT)) AS DOUBLE)))
                  ELSE CAST(0 AS DOUBLE) END]) AS st
          FROM b2)
        SELECT a, r1, c1, n,
          round(least(st[2], CAST(1 AS DOUBLE)), 6) AS p_two_sided,
          CASE WHEN (r1 - a) * (c1 - a) = 0 THEN NULL
            ELSE round(CAST(a * (n2 + a) AS DOUBLE)
              / CAST((r1 - a) * (c1 - a) AS DOUBLE), 6) END AS odds_ratio
        FROM folded"""
      }),

    Q(
      "stats_runs_test",
      "Wald–Wolfowitz runs test on the SIGNS of day-over-day revenue " +
        "changes per event type — is the series' up/down pattern " +
        "random, or does it trend/oscillate? (the independence check " +
        "to run before trusting ts_holt_linear's smoothing). Signs " +
        "come from an exact integer lag diff (zeros dropped), runs " +
        "are counted as sign-change boundaries in a second lag pass, " +
        "and the z-score is the closed form over the three integer " +
        "counts — the only doubles are the final μ/σ arithmetic, " +
        "identical in both engines. Two key-partitioned windows, " +
        "one hash agg.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val w = Window.partitionBy("g").orderBy("day")
        val signs = daily
          .withColumn("d", col("y") - lag("y", 1).over(w))
          .filter(col("d").isNotNull && col("d") =!= 0)
          .withColumn("s", when(col("d") > 0, 1).otherwise(-1))
        val runs = signs
          .withColumn("prev", lag("s", 1).over(w))
          .withColumn("nr",
            when(col("prev").isNull || col("prev") =!= col("s"), 1).otherwise(0))
          .groupBy("g").agg(
            sum(when(col("s") === 1, 1).otherwise(0)).as("n1"),
            sum(when(col("s") === -1, 1).otherwise(0)).as("n2"),
            sum("nr").as("runs"))
        val n1 = col("n1").cast("double")
        val n2 = col("n2").cast("double")
        val nn = n1 + n2
        val mu = lit(2.0) * n1 * n2 / nn + lit(1.0)
        val v = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn))
          .divide(nn * nn * (nn - lit(1.0)))
        runs.select(col("g").as("event_type"), col("n1"), col("n2"), col("runs"),
            round((col("runs").cast("double") - mu) / sqrt(v), 6).as("z_score"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        diffs AS (
          SELECT g, day, y - lag(y) OVER (PARTITION BY g ORDER BY day) AS d
          FROM daily),
        signs AS (
          SELECT g, day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
          FROM diffs WHERE d IS NOT NULL AND d != 0),
        marked AS (
          SELECT g, s,
            lag(s) OVER (PARTITION BY g ORDER BY day) AS prev
          FROM signs),
        agg AS (
          SELECT g,
            CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN prev IS NULL OR prev != s THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
          FROM marked GROUP BY g)
        SELECT g AS event_type, n1, n2, runs,
          round((CAST(runs AS DOUBLE)
            - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
            / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
              / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0))),
            6) AS z_score
        FROM agg ORDER BY event_type""")),

    Q(
      "stats_cochran_armitage",
      "Cochran–Armitage trend test: does the share of FINISHED " +
        "orders trend monotonically across the five order priorities " +
        "(scored 1..5)? The ordered-category companion to stats_chi2 " +
        "— chi² only detects association, this detects DIRECTION. " +
        "The statistic is assembled from five per-category integer " +
        "pairs (n_i, successes a_i): Σ s·a, Σ s·n, Σ s²·n and the " +
        "margins stay exact integers; the z and the portable-" +
        "polynomial normal p-value are the only float steps, " +
        "bit-identical in both engines. One hash agg over the " +
        "orders scan + a 5-row fold.",
      (s, dir) => {
        val grp = Tables.t(s, dir, "orders")
          .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("sc"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("f"))
          .groupBy("sc").agg(count(lit(1)).as("ni"), sum("f").as("ai"))
        val tot = grp.agg(
          sum("ni").as("n"), sum("ai").as("r1"),
          sum(col("sc") * col("ai")).as("sa"),
          sum(col("sc") * col("ni")).as("sn"),
          sum(col("sc") * col("sc") * col("ni")).as("ssn"))
        val nD = col("n").cast("double")
        val p = col("r1").cast("double") / nD
        val num = col("sa").cast("double") - p * col("sn").cast("double")
        val den = sqrt(p * (lit(1.0) - p)
          * (col("ssn").cast("double")
            - col("sn").cast("double") * col("sn").cast("double") / nD))
        tot.select(col("n"), col("r1"),
            round(num / den, 6).as("z_trend"),
            round((lit(1.0) - normCdf(abs(num / den))) * 2.0, 6).as("p_value"))
      },
      Some(s"""WITH grp AS (
          SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc,
            CAST(count(*) AS BIGINT) AS ni,
            CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS ai
          FROM orders GROUP BY 1),
        tot AS (
          SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(ai) AS BIGINT) AS r1,
            CAST(sum(sc * ai) AS BIGINT) AS sa,
            CAST(sum(sc * ni) AS BIGINT) AS sn,
            CAST(sum(sc * sc * ni) AS BIGINT) AS ssn
          FROM grp),
        z AS (
          SELECT n, r1,
            (CAST(sa AS DOUBLE) - (CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
              * CAST(sn AS DOUBLE))
            / sqrt((CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(ssn AS DOUBLE)
                - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                  / CAST(n AS DOUBLE))) AS zt
          FROM tot)
        SELECT n, r1, round(zt, 6) AS z_trend,
          round((1.0 - ${normCdfSql("abs(zt)")}) * 2.0, 6) AS p_value
        FROM z""")),

    Q(
      "stats_bayes_ab",
      "Exact Bayesian A/B test: P(conversion_A > conversion_B) under " +
        "independent Beta(1+s, 1+n−s) posteriors, for finished-order " +
        "rates of URGENT vs LOW priority — via the closed-form sum " +
        "P(B>A) = Σᵢ B(αA+i, βA+βB)/((βB+i)·B(1+i, βB)·B(αA, βA)) " +
        "(complemented; the posteriors are continuous) computed " +
        "WITHOUT lgamma (engine-divergent): all four i-varying " +
        "log-gammas advance by ln(x+i) inside one bounded fold " +
        "(αB steps) whose state is a 5-list of doubles, seeded by " +
        "ascending log-factorial folds — every float op identical in " +
        "both engines (see ts_holt_linear for why the oracle state " +
        "is a list, not a struct). Margins come from one aggregate " +
        "scan; the test itself is O(αB) work on a single row.",
      (s, dir) => {
        def lfS(m: Column): Column = when(m > 0,
          aggregate(sequence(lit(1L), m.cast("long")), lit(0.0),
            (acc, i) => acc + log(i.cast("double")))).otherwise(lit(0.0))
        val cells = Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .agg(
            count(when(col("o_orderpriority") === "1-URGENT", 1)).as("na"),
            count(when(col("o_orderpriority") === "1-URGENT"
              && col("o_orderstatus") === "F", 1)).as("sa"),
            count(when(col("o_orderpriority") === "5-LOW", 1)).as("nb"),
            count(when(col("o_orderpriority") === "5-LOW"
              && col("o_orderstatus") === "F", 1)).as("sb"))
        val b = cells
          .withColumn("aa", col("sa") + 1).withColumn("ba", col("na") - col("sa") + 1)
          .withColumn("ab", col("sb") + 1).withColumn("bb", col("nb") - col("sb") + 1)
        val withC = b.withColumn("cc",
          lfS(col("ba") + col("bb") - 1) - lfS(col("bb") - 1)
            - (lfS(col("aa") - 1) + lfS(col("ba") - 1)
              - lfS(col("aa") + col("ba") - 1)))
        // cc rides the fold STATE (6th element), not a captured column:
        // a captured reference would be CollapseProject-INLINED into the
        // lambda body and re-evaluated on EVERY step — and cc is itself
        // an O(n) log-factorial fold, so the test would be O(n·αB) ≈
        // quadratic in the table (the r15 full-registry sf1 sweep caught
        // exactly that: 30+ min single-core at 10× data). Seed
        // expressions evaluate ONCE per row in both engines; the exp()'s
        // float-op order is unchanged, so results stay bit-identical.
        val folded = withC.withColumn("st", aggregate(
          sequence(lit(0L), col("ab") - 1),
          array(
            lfS(col("aa") - 1),
            lfS(col("aa") + col("ba") + col("bb") - 1),
            lit(0.0),
            lfS(col("bb")),
            lit(0.0),
            col("cc")),
          (acc, i) => array(
            element_at(acc, 1) + log((col("aa") + i).cast("double")),
            element_at(acc, 2) + log((col("aa") + col("ba") + col("bb") + i).cast("double")),
            element_at(acc, 3) + log((lit(1L) + i).cast("double")),
            element_at(acc, 4) + log((lit(1L) + col("bb") + i).cast("double")),
            element_at(acc, 5) + exp(
              element_at(acc, 1) - element_at(acc, 2) - element_at(acc, 3)
                + element_at(acc, 4) + element_at(acc, 6)
                - log((col("bb") + i).cast("double"))),
            element_at(acc, 6))))
        folded.select(col("na"), col("sa"), col("nb"), col("sb"),
          round(col("sa").cast("double") / col("na").cast("double"), 6).as("rate_a"),
          round(col("sb").cast("double") / col("nb").cast("double"), 6).as("rate_b"),
          round(greatest(lit(1.0) - least(element_at(col("st"), 5), lit(1.0)),
            lit(0.0)), 6).as("p_a_gt_b"))
      },
      Some {
        def dlf(m: String) =
          s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
            s"list_transform(range(1, ($m) + 1), i -> ln(CAST(i AS DOUBLE)))), " +
            "(x, y) -> x + y)"
        s"""WITH cells AS (
          SELECT
            CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
              AS BIGINT) AS na,
            CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
              AND o_orderstatus = 'F') AS BIGINT) AS sa,
            CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW')
              AS BIGINT) AS nb,
            CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW'
              AND o_orderstatus = 'F') AS BIGINT) AS sb
          FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        b AS (SELECT *, sa + 1 AS aa, na - sa + 1 AS ba,
            sb + 1 AS ab, nb - sb + 1 AS bb FROM cells),
        c AS (SELECT *,
            ${dlf("ba + bb - 1")} - ${dlf("bb - 1")}
              - (${dlf("aa - 1")} + ${dlf("ba - 1")}
                - ${dlf("aa + ba - 1")}) AS cc
          FROM b),
        folded AS (SELECT *,
            list_reduce(list_prepend(
              [${dlf("aa - 1")}, ${dlf("aa + ba + bb - 1")},
               CAST(0 AS DOUBLE), ${dlf("bb")}, CAST(0 AS DOUBLE), cc],
              list_transform(range(0, ab),
                k -> [CAST(k AS DOUBLE), CAST(0 AS DOUBLE),
                  CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                  CAST(0 AS DOUBLE)])),
              (acc, e) -> [
                acc[1] + ln(CAST(aa + CAST(e[1] AS BIGINT) AS DOUBLE)),
                acc[2] + ln(CAST(aa + ba + bb + CAST(e[1] AS BIGINT) AS DOUBLE)),
                acc[3] + ln(CAST(1 + CAST(e[1] AS BIGINT) AS DOUBLE)),
                acc[4] + ln(CAST(1 + bb + CAST(e[1] AS BIGINT) AS DOUBLE)),
                acc[5] + exp(acc[1] - acc[2] - acc[3] + acc[4] + acc[6]
                  - ln(CAST(bb + CAST(e[1] AS BIGINT) AS DOUBLE))),
                acc[6]]) AS st
          FROM c)
        SELECT na, sa, nb, sb,
          round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 6) AS rate_a,
          round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS rate_b,
          round(greatest(1.0 - least(st[5], CAST(1 AS DOUBLE)),
            CAST(0 AS DOUBLE)), 6) AS p_a_gt_b
        FROM folded"""
      }),

    Q(
      "analytics_diff_in_diff",
      "Difference-in-differences: the causal-inference workhorse for " +
        "a rollout without randomization — treatment cohort (even " +
        "user ids) vs control, purchase values before vs after a " +
        "cutoff date; DiD = (T_post − T_pre) − (C_post − C_pre) with " +
        "a Welch-style SE from the four cells' variances. Each cell " +
        "reduces to three exact integer sums (n, Σcents, Σcents²) in " +
        "ONE map-side-combinable aggregate over the events scan; " +
        "mean/variance/SE/t are closed-form single divisions on the " +
        "1-row result — deterministic at any parallelism and the " +
        "same plan at 100 TB.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(
            (col("user_id") % 2 === 0).as("treat"),
            (col("ts") >= lit("2024-01-16").cast("timestamp")).as("post"),
            round(col("value") * 100).cast("long").as("v"))
        def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
          count(when(col("treat") === t && col("post") === p, 1)).as(s"n_$suffix"),
          sum(when(col("treat") === t && col("post") === p, col("v"))
            .otherwise(0L)).as(s"s_$suffix"),
          sum(when(col("treat") === t && col("post") === p, col("v") * col("v"))
            .otherwise(0L)).as(s"ss_$suffix"))
        val aggs = cell(true, false, "tpre") ++ cell(true, true, "tpost") ++
          cell(false, false, "cpre") ++ cell(false, true, "cpost")
        val cells = ev.agg(aggs.head, aggs.tail: _*)
        def m(sfx: String) = col(s"s_$sfx").cast("double") / col(s"n_$sfx").cast("double") / 100.0
        def va(sfx: String) =
          (col(s"ss_$sfx").cast("double")
            - col(s"s_$sfx").cast("double") * col(s"s_$sfx").cast("double")
              / col(s"n_$sfx").cast("double"))
            .divide((col(s"n_$sfx") - 1).cast("double")) / 10000.0
        def se2(sfx: String) = va(sfx) / col(s"n_$sfx").cast("double")
        val did = (m("tpost") - m("tpre")) - (m("cpost") - m("cpre"))
        val se = sqrt(se2("tpost") + se2("tpre") + se2("cpost") + se2("cpre"))
        cells.select(
          col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
          round(m("tpre"), 6).as("mean_t_pre"), round(m("tpost"), 6).as("mean_t_post"),
          round(m("cpre"), 6).as("mean_c_pre"), round(m("cpost"), 6).as("mean_c_post"),
          round(did, 6).as("did_estimate"),
          round(did / se, 6).as("t_stat"))
      },
      Some("""WITH ev AS (
          SELECT (user_id % 2 = 0) AS treat,
            (ts >= TIMESTAMP '2024-01-16') AS post,
            CAST(round(value * 100) AS BIGINT) AS v
          FROM events WHERE event_type = 'purchase'),
        cells AS (SELECT
            CAST(count(*) FILTER (WHERE treat AND NOT post) AS BIGINT) AS n_tpre,
            CAST(sum(CASE WHEN treat AND NOT post THEN v ELSE 0 END) AS BIGINT) AS s_tpre,
            CAST(sum(CASE WHEN treat AND NOT post THEN v * v ELSE 0 END) AS BIGINT) AS ss_tpre,
            CAST(count(*) FILTER (WHERE treat AND post) AS BIGINT) AS n_tpost,
            CAST(sum(CASE WHEN treat AND post THEN v ELSE 0 END) AS BIGINT) AS s_tpost,
            CAST(sum(CASE WHEN treat AND post THEN v * v ELSE 0 END) AS BIGINT) AS ss_tpost,
            CAST(count(*) FILTER (WHERE NOT treat AND NOT post) AS BIGINT) AS n_cpre,
            CAST(sum(CASE WHEN NOT treat AND NOT post THEN v ELSE 0 END) AS BIGINT) AS s_cpre,
            CAST(sum(CASE WHEN NOT treat AND NOT post THEN v * v ELSE 0 END) AS BIGINT) AS ss_cpre,
            CAST(count(*) FILTER (WHERE NOT treat AND post) AS BIGINT) AS n_cpost,
            CAST(sum(CASE WHEN NOT treat AND post THEN v ELSE 0 END) AS BIGINT) AS s_cpost,
            CAST(sum(CASE WHEN NOT treat AND post THEN v * v ELSE 0 END) AS BIGINT) AS ss_cpost
          FROM ev)
        SELECT n_tpre, n_tpost, n_cpre, n_cpost,
          round(CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE) / 100.0, 6) AS mean_t_pre,
          round(CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE) / 100.0, 6) AS mean_t_post,
          round(CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE) / 100.0, 6) AS mean_c_pre,
          round(CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE) / 100.0, 6) AS mean_c_post,
          round((CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE) / 100.0
              - CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE) / 100.0)
            - (CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE) / 100.0
              - CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE) / 100.0), 6)
            AS did_estimate,
          round(((CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE) / 100.0
              - CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE) / 100.0)
            - (CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE) / 100.0
              - CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE) / 100.0))
            / sqrt(
              ((CAST(ss_tpost AS DOUBLE) - CAST(s_tpost AS DOUBLE) * CAST(s_tpost AS DOUBLE)
                / CAST(n_tpost AS DOUBLE)) / CAST(n_tpost - 1 AS DOUBLE) / 10000.0) / CAST(n_tpost AS DOUBLE)
              + ((CAST(ss_tpre AS DOUBLE) - CAST(s_tpre AS DOUBLE) * CAST(s_tpre AS DOUBLE)
                / CAST(n_tpre AS DOUBLE)) / CAST(n_tpre - 1 AS DOUBLE) / 10000.0) / CAST(n_tpre AS DOUBLE)
              + ((CAST(ss_cpost AS DOUBLE) - CAST(s_cpost AS DOUBLE) * CAST(s_cpost AS DOUBLE)
                / CAST(n_cpost AS DOUBLE)) / CAST(n_cpost - 1 AS DOUBLE) / 10000.0) / CAST(n_cpost AS DOUBLE)
              + ((CAST(ss_cpre AS DOUBLE) - CAST(s_cpre AS DOUBLE) * CAST(s_cpre AS DOUBLE)
                / CAST(n_cpre AS DOUBLE)) / CAST(n_cpre - 1 AS DOUBLE) / 10000.0) / CAST(n_cpre AS DOUBLE)),
            6) AS t_stat
        FROM cells""")),

    Q(
      "ts_sax_symbols",
      "SAX symbolization (PAA-7 + 4-letter Gaussian-breakpoint " +
        "alphabet) of each event type's daily revenue series — the " +
        "discretization behind time-series indexing, motif search, " +
        "and anomaly grammars at scale (a 2500-day series becomes a " +
        "~360-char string with cheap Hamming-style comparison). " +
        "z-normalization parameters come from the series' exact " +
        "integer (n, Σ, Σ²); each PAA segment value derives from the " +
        "exact 7-day cent sum, so the only doubles are the final " +
        "(paa − μ)/σ per segment, identical in both engines; symbols " +
        "cut at the N(0,1) quartile breakpoints ±0.6745. Output is " +
        "the per-series SAX string plus symbol histogram.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val w = Window.partitionBy("g").orderBy("day")
        val idx = daily.withColumn("i", row_number().over(w) - 1)
          .withColumn("seg", Skew.idiv(col("i").cast("long"), lit(7L)))
        val stats7 = idx.groupBy("g").agg(
          count(lit(1)).as("n"), sum("y").as("sy"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
        val segs = idx.groupBy("g", "seg")
          .agg(count(lit(1)).as("cnt"), sum("y").as("t7"))
          .filter(col("cnt") === 7)
        val mu = col("sy").cast("double") / col("n").cast("double")
        val sd = sqrt((col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double")
            / col("n").cast("double"))
          .divide((col("n") - 1).cast("double")))
        val paa = (col("t7").cast("double") / 7.0 - mu) / sd
        val sym = when(paa < -0.6745, lit("a"))
          .when(paa < 0.0, lit("b"))
          .when(paa < 0.6745, lit("c")).otherwise(lit("d"))
        segs.join(broadcast(stats7), Seq("g"))
          .select(col("g"), col("seg"), sym.as("sym"))
          .groupBy("g").agg(
            count(lit(1)).as("n_segments"),
            array_join(transform(
              sort_array(collect_list(struct(col("seg"), col("sym")))),
              e => e.getField("sym")), "").as("sax"),
            count(when(col("sym") === "a", 1)).as("n_a"),
            count(when(col("sym") === "b", 1)).as("n_b"),
            count(when(col("sym") === "c", 1)).as("n_c"),
            count(when(col("sym") === "d", 1)).as("n_d"))
          .withColumnRenamed("g", "event_type")
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT g, y,
            (row_number() OVER (PARTITION BY g ORDER BY day) - 1) // 7 AS seg
          FROM daily),
        stats7 AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(y) AS BIGINT) AS sy,
            sum(CAST(y AS HUGEINT) * y) AS syy
          FROM idx GROUP BY g),
        segs AS (
          SELECT g, seg, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS t7
          FROM idx GROUP BY 1, 2),
        syms AS (
          SELECT s.g, s.seg,
            CASE
              WHEN (CAST(s.t7 AS DOUBLE) / 7.0
                  - CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE))
                / sqrt((CAST(st.syy AS DOUBLE)
                  - CAST(st.sy AS DOUBLE) * CAST(st.sy AS DOUBLE)
                    / CAST(st.n AS DOUBLE)) / CAST(st.n - 1 AS DOUBLE))
                < -0.6745 THEN 'a'
              WHEN (CAST(s.t7 AS DOUBLE) / 7.0
                  - CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE))
                / sqrt((CAST(st.syy AS DOUBLE)
                  - CAST(st.sy AS DOUBLE) * CAST(st.sy AS DOUBLE)
                    / CAST(st.n AS DOUBLE)) / CAST(st.n - 1 AS DOUBLE))
                < 0.0 THEN 'b'
              WHEN (CAST(s.t7 AS DOUBLE) / 7.0
                  - CAST(st.sy AS DOUBLE) / CAST(st.n AS DOUBLE))
                / sqrt((CAST(st.syy AS DOUBLE)
                  - CAST(st.sy AS DOUBLE) * CAST(st.sy AS DOUBLE)
                    / CAST(st.n AS DOUBLE)) / CAST(st.n - 1 AS DOUBLE))
                < 0.6745 THEN 'c'
              ELSE 'd' END AS sym
          FROM segs s JOIN stats7 st USING (g) WHERE s.cnt = 7)
        SELECT g AS event_type, count(*) AS n_segments,
          string_agg(sym, '' ORDER BY seg) AS sax,
          CAST(count(*) FILTER (WHERE sym = 'a') AS BIGINT) AS n_a,
          CAST(count(*) FILTER (WHERE sym = 'b') AS BIGINT) AS n_b,
          CAST(count(*) FILTER (WHERE sym = 'c') AS BIGINT) AS n_c,
          CAST(count(*) FILTER (WHERE sym = 'd') AS BIGINT) AS n_d
        FROM syms GROUP BY g ORDER BY event_type""")),

    Q(
      "analytics_survival_km",
      "Kaplan–Meier survival curve over user lifetimes (distinct " +
        "active days; users active on the corpus' final day are " +
        "right-censored) — churn analysis done properly, where naive " +
        "retention curves mishandle still-active users. The entire " +
        "estimator runs inside ONE packed row: per-duration " +
        "(t, deaths, at-risk-leavers) is a bounded calendar-sized " +
        "table, sorted into an array, and each S(t) is a prefix fold " +
        "carrying (leavers-so-far, running product) — no " +
        "unpartitioned window (the threshold-sweep idiom), identical " +
        "float sequence in DuckDB's list_reduce (2-list state, see " +
        "ts_holt_linear).",
      (s, dir) => {
        val users = Tables.t(s, dir, "events")
          .groupBy("user_id")
          .agg(countDistinct(to_date(col("ts"))).as("t"),
            to_date(max(col("ts"))).as("d1"))
        val maxDay = Tables.t(s, dir, "events")
          .agg(to_date(max(col("ts"))).as("dmax"))
        val durs = users.crossJoin(broadcast(maxDay))
          .select(col("t"), (col("d1") === col("dmax")).as("cens"))
        val byT = durs.groupBy("t").agg(
          count(when(!col("cens"), 1)).as("d"),
          count(lit(1)).as("c"))
        val packed = byT.agg(
          sort_array(collect_list(struct(col("t"), col("d"), col("c")))).as("a"),
          sum("c").as("total"))
        packed.select(explode(expr(
            """transform(a, (x, i) -> named_struct(
              't', x.t, 'd', x.d,
              'n_risk', total - aggregate(slice(a, 1, i), CAST(0 AS BIGINT),
                (acc, y) -> acc + y.c),
              's', aggregate(slice(a, 1, i + 1),
                named_struct('rc', CAST(0 AS BIGINT), 'pr', CAST(1.0 AS DOUBLE)),
                (acc, y) -> named_struct('rc', acc.rc + y.c,
                  'pr', acc.pr * (CAST(1.0 AS DOUBLE)
                    - CAST(y.d AS DOUBLE) / CAST(total - acc.rc AS DOUBLE))),
                st -> st.pr)))""")).as("r"))
          .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
            col("r.d").as("deaths"), round(col("r.s"), 6).as("s_km"))
          .filter(col("deaths") > 0)
          .orderBy("t")
      },
      Some("""WITH users AS (
          SELECT user_id,
            CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS t,
            CAST(max(ts) AS DATE) AS d1
          FROM events GROUP BY 1),
        mx AS (SELECT CAST(max(ts) AS DATE) AS dmax FROM events),
        durs AS (
          SELECT t, (d1 = dmax) AS cens
          FROM users, mx),
        by_t AS (
          SELECT t, CAST(count(*) FILTER (WHERE NOT cens) AS BIGINT) AS d,
            CAST(count(*) AS BIGINT) AS c
          FROM durs GROUP BY t),
        packed AS (
          SELECT list(struct_pack(t := t, d := d, c := c) ORDER BY t) AS a,
            CAST(sum(c) AS BIGINT) AS total
          FROM by_t),
        rows_out AS (
          SELECT unnest(list_transform(a, (x, i) -> struct_pack(
            t := x.t, d := x.d,
            n_risk := total - CAST(list_reduce(
              list_prepend(CAST(0 AS DOUBLE),
                list_transform(a[1:i-1], y -> CAST(y.c AS DOUBLE))),
              (p, q) -> p + q) AS BIGINT),
            s := list_reduce(
              list_prepend([CAST(0 AS DOUBLE), CAST(1.0 AS DOUBLE)],
                list_transform(a[1:i],
                  y -> [CAST(y.c AS DOUBLE), CAST(y.d AS DOUBLE)])),
              (acc, e) -> [acc[1] + e[1],
                acc[2] * (CAST(1.0 AS DOUBLE)
                  - e[2] / (CAST(total AS DOUBLE) - acc[1]))])[2]))) AS r
          FROM packed)
        SELECT r.t AS t, r.n_risk AS n_risk, r.d AS deaths,
          round(r.s, 6) AS s_km
        FROM rows_out WHERE r.d > 0 ORDER BY t""")),

    Q(
      "analytics_cuped",
      "CUPED variance reduction (Deng et al.): the post-period " +
        "purchase metric adjusted by each user's PRE-period metric as " +
        "control variate — the standard trick that shrinks A/B " +
        "confidence intervals by the pre/post correlation ρ² without " +
        "touching the estimate's expectation. θ = cov(X,Y)/var(X) " +
        "pooled, adjusted lift = (Ȳt − θX̄t) − (Ȳc − θX̄c) (the μx " +
        "terms cancel). Every moment (n, Σx, Σy, Σxy, Σx², Σy² per " +
        "arm) is an exact integer from ONE hash agg over per-user " +
        "integer totals; θ, lifts, and the variance-reduction share " +
        "are closed-form single divisions — deterministic and " +
        "scan-shaped at any scale.",
      (s, dir) => {
        val cutoff = lit("2024-01-16").cast("timestamp")
        val perUser = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(
            sum(when(col("ts") < cutoff, round(col("value") * 100).cast("long"))
              .otherwise(0L)).as("x"),
            sum(when(col("ts") >= cutoff, round(col("value") * 100).cast("long"))
              .otherwise(0L)).as("y"))
          .withColumn("treat", col("user_id") % 2 === 0)
        val m = perUser.agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
          count(when(col("treat"), 1)).as("nt"),
          sum(when(col("treat"), col("x")).otherwise(0L)).as("sxt"),
          sum(when(col("treat"), col("y")).otherwise(0L)).as("syt"))
        def d(c: Column) = c.cast("double")
        val covxy = d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))
        val varx = d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))
        val vary = d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n"))
        val theta = covxy / varx
        val nc = col("n") - col("nt")
        val sxc = col("sx") - col("sxt")
        val syc = col("sy") - col("syt")
        val rawDiff = (d(col("syt")) / d(col("nt")) - d(syc) / d(nc)) / 100.0
        val cupedDiff = ((d(col("syt")) / d(col("nt"))
          - theta * d(col("sxt")) / d(col("nt")))
          - (d(syc) / d(nc) - theta * d(sxc) / d(nc))) / 100.0
        m.select(col("nt"), nc.as("n_c"),
          round(theta, 6).as("theta"),
          round(rawDiff, 6).as("raw_diff"),
          round(cupedDiff, 6).as("cuped_diff"),
          round(covxy * covxy / (varx * vary), 6).as("var_reduction"))
      },
      Some("""WITH pu AS (
          SELECT user_id,
            CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
            CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
            (user_id % 2 = 0) AS treat
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        m AS (SELECT
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(x AS HUGEINT) * x) AS sxx,
            sum(CAST(y AS HUGEINT) * y) AS syy,
            CAST(count(*) FILTER (WHERE treat) AS BIGINT) AS nt,
            CAST(sum(CASE WHEN treat THEN x ELSE 0 END) AS BIGINT) AS sxt,
            CAST(sum(CASE WHEN treat THEN y ELSE 0 END) AS BIGINT) AS syt
          FROM pu)
        SELECT nt, n - nt AS n_c,
          round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)),
            6) AS theta,
          round((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
            - CAST(sy - syt AS DOUBLE) / CAST(n - nt AS DOUBLE)) / 100.0, 6) AS raw_diff,
          round(((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
              - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                * CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE))
            - (CAST(sy - syt AS DOUBLE) / CAST(n - nt AS DOUBLE)
              - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                * CAST(sx - sxt AS DOUBLE) / CAST(n - nt AS DOUBLE))) / 100.0, 6)
            AS cuped_diff,
          round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
            6) AS var_reduction
        FROM m""")),

    Q(
      "stats_mcnemar",
      "McNemar's paired test: did individual users' HIGH-VALUE " +
        "(≥$150) purchasing flip between the pre and post halves of " +
        "the window? Paired pre/post conversion flags per user; only the DISCORDANT " +
        "cells b (pre-only) and c (post-only) matter. Reports the " +
        "χ² = (b−c)²/(b+c) approximation AND the exact two-sided " +
        "binomial p — Σ C(n,k)/2ⁿ over the lighter tail, doubled — " +
        "via the same log-space incremental fold as " +
        "stats_fisher_exact (no lgamma, identical doubles both " +
        "engines). One hash agg + an O(min(b,c)) one-row fold.",
      (s, dir) => {
        val cutoff = lit("2024-01-16").cast("timestamp")
        val flags = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(
            max(when(col("ts") < cutoff && col("value") >= 150, 1L)
              .otherwise(0L)).as("pre"),
            max(when(col("ts") >= cutoff && col("value") >= 150, 1L)
              .otherwise(0L)).as("post"))
        val cells = flags.agg(
          count(when(col("pre") === 1 && col("post") === 0, 1)).as("b"),
          count(when(col("pre") === 0 && col("post") === 1, 1)).as("c"))
        val b2 = cells
          .withColumn("nn", col("b") + col("c"))
          .withColumn("kmin", least(col("b"), col("c")))
        // p0 = 2^-n in log space; p_{k+1} = p_k + ln(n-k) - ln(k+1);
        // sum terms k = 0..kmin, double, clamp at 1
        val folded = b2.withColumn("st", aggregate(
          when(col("kmin") > 0, sequence(lit(1L), col("kmin")))
            .otherwise(expr("CAST(array() AS array<bigint>)")),
          array(-col("nn").cast("double") * log(lit(2.0)),
            exp(-col("nn").cast("double") * log(lit(2.0)))),
          (acc, k) => {
            val lp = element_at(acc, 1)
              .plus(log((col("nn") - k + 1).cast("double")))
              .minus(log(k.cast("double")))
            array(lp, element_at(acc, 2) + exp(lp))
          }))
        folded.select(col("b"), col("c"),
          round((col("b") - col("c")).cast("double")
            * (col("b") - col("c")).cast("double")
            / col("nn").cast("double"), 6).as("chi2"),
          round(least(element_at(col("st"), 2) * 2.0, lit(1.0)), 6)
            .as("p_exact"))
      },
      Some("""WITH flags AS (
          SELECT user_id,
            max(CASE WHEN ts < TIMESTAMP '2024-01-16' AND value >= 150
              THEN 1 ELSE 0 END) AS pre,
            max(CASE WHEN ts >= TIMESTAMP '2024-01-16' AND value >= 150
              THEN 1 ELSE 0 END) AS post
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        cells AS (SELECT
            CAST(count(*) FILTER (WHERE pre = 1 AND post = 0) AS BIGINT) AS b,
            CAST(count(*) FILTER (WHERE pre = 0 AND post = 1) AS BIGINT) AS c
          FROM flags),
        b2 AS (SELECT *, b + c AS nn, least(b, c) AS kmin FROM cells),
        folded AS (SELECT *,
            list_reduce(list_prepend(
              [-CAST(nn AS DOUBLE) * ln(CAST(2 AS DOUBLE)),
               exp(-CAST(nn AS DOUBLE) * ln(CAST(2 AS DOUBLE)))],
              list_transform(range(1, kmin + 1),
                k -> [CAST(k AS DOUBLE), CAST(0 AS DOUBLE)])),
              (acc, e) -> [
                acc[1] + ln(CAST(nn - CAST(e[1] AS BIGINT) + 1 AS DOUBLE))
                  - ln(CAST(CAST(e[1] AS BIGINT) AS DOUBLE)),
                acc[2] + exp(acc[1]
                  + ln(CAST(nn - CAST(e[1] AS BIGINT) + 1 AS DOUBLE))
                  - ln(CAST(CAST(e[1] AS BIGINT) AS DOUBLE)))]) AS st
          FROM b2)
        SELECT b, c,
          round(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
            / CAST(nn AS DOUBLE), 6) AS chi2,
          round(least(st[2] * 2.0, CAST(1 AS DOUBLE)), 6) AS p_exact
        FROM folded""")),

    Q(
      "ts_permutation_entropy",
      "Order-3 permutation entropy of each event type's daily revenue " +
        "series — the model-free complexity measure (Bandt–Pompe) " +
        "that separates trending, oscillating, and noisy series " +
        "where variance can't. Consecutive triples classify into one " +
        "of 6 ordinal patterns via three stable comparisons (ties " +
        "break to the earlier index), counted as integers; the " +
        "entropy is a ≤6-term sorted fold over exact count ratios, " +
        "normalized by ln 6. Two lead() windows partitioned by " +
        "series key + one hash agg — scan-shaped at any scale.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val w = Window.partitionBy("g").orderBy("day")
        val pats = daily
          .withColumn("y2", lead("y", 1).over(w))
          .withColumn("y3", lead("y", 2).over(w))
          .filter(col("y3").isNotNull)
          .withColumn("pat",
            when(col("y") <= col("y2"), 4).otherwise(0)
              + when(col("y") <= col("y3"), 2).otherwise(0)
              + when(col("y2") <= col("y3"), 1).otherwise(0))
        val counts = pats.groupBy("g", "pat").agg(count(lit(1)).as("c"))
          .withColumn("n", sum("c").over(Window.partitionBy("g")))
          .withColumn("term",
            -(col("c").cast("double") / col("n").cast("double"))
              * log(col("c").cast("double") / col("n").cast("double")))
        counts.groupBy("g").agg(
            count(lit(1)).as("n_patterns"), max("n").as("n"),
            aggregate(
              sort_array(collect_list(struct(col("pat"), col("term")))),
              lit(0.0), (a, e) => a + e.getField("term")).as("h"))
          .select(col("g").as("event_type"), col("n_patterns"), col("n"),
            round(col("h") / log(lit(6.0)), 6).as("pe_norm"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        tri AS (
          SELECT g, y,
            lead(y, 1) OVER (PARTITION BY g ORDER BY day) AS y2,
            lead(y, 2) OVER (PARTITION BY g ORDER BY day) AS y3
          FROM daily),
        pats AS (
          SELECT g,
            (CASE WHEN y <= y2 THEN 4 ELSE 0 END
              + CASE WHEN y <= y3 THEN 2 ELSE 0 END
              + CASE WHEN y2 <= y3 THEN 1 ELSE 0 END) AS pat
          FROM tri WHERE y3 IS NOT NULL),
        counts AS (SELECT g, pat, CAST(count(*) AS BIGINT) AS c
          FROM pats GROUP BY 1, 2),
        terms AS (
          SELECT g, pat, c,
            CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
            -(CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY g) AS DOUBLE))
              * ln(CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY g) AS DOUBLE))
              AS term
          FROM counts),
        agg AS (
          SELECT g, count(*) AS n_patterns, max(n) AS n,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list(term ORDER BY pat)), (a, b) -> a + b) AS h
          FROM terms GROUP BY g)
        SELECT g AS event_type, n_patterns, n,
          round(h / ln(CAST(6 AS DOUBLE)), 6) AS pe_norm
        FROM agg ORDER BY event_type""")),

    Q(
      "ts_pacf",
      "Partial autocorrelation (lags 1–5) of each event type's daily " +
        "revenue series via Durbin–Levinson — the AR-order " +
        "diagnostic ts_autocorr's raw ACF can't give (ACF of an " +
        "AR(1) decays forever; PACF cuts off). Autocovariances " +
        "assemble from EXACT integer lag-product sums (Σy·y₊ₖ in " +
        "decimal, head/tail sums, n) in one 5-lead window pass + one " +
        "hash agg; the D–L recursion is unrolled into closed-form " +
        "column arithmetic over ρ₁..ρ₅ with the identical expression " +
        "tree in both engines — every float op sequence matches, so " +
        "the oracle is bit-exact.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val w = Window.partitionBy("g").orderBy("day")
        val withLeads = (1 to 5).foldLeft(daily) { (d, k) =>
          d.withColumn(s"y$k", lead("y", k).over(w))
        }
        val aggs = Seq(
          count(lit(1)).as("n"), sum("y").as("s"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("p0")) ++
          (1 to 5).flatMap { k => Seq(
            sum(when(col(s"y$k").isNotNull,
              col("y").cast("decimal(38,0)") * col(s"y$k")).otherwise(lit(0)))
              .as(s"p$k"),
            sum(when(col(s"y$k").isNotNull, col("y")).otherwise(0L)).as(s"h$k"),
            sum(when(col(s"y$k").isNotNull, col(s"y$k")).otherwise(0L)).as(s"t$k"),
            count(when(col(s"y$k").isNotNull, 1)).as(s"n$k"))
          }
        val m = withLeads.groupBy("g").agg(aggs.head, aggs.tail: _*)
        def d(c: Column) = c.cast("double")
        val mu = d(col("s")) / d(col("n"))
        val c0 = d(col("p0")) - d(col("s")) * d(col("s")) / d(col("n"))
        def rho(k: Int): Column =
          (d(col(s"p$k")) - mu * (d(col(s"h$k")) + d(col(s"t$k")))
            + d(col(s"n$k")) * mu * mu) / c0
        // Durbin-Levinson over NAMED intermediate columns (f{m}_{j}),
        // one withColumn per assignment, mirrored 1:1 by the oracle's
        // CTE chain so every float op sequence matches
        var df = (1 to 5).foldLeft(m)((acc, k) => acc.withColumn(s"r$k", rho(k)))
        df = df.withColumn("f1_1", col("r1"))
        for (m2 <- 2 to 5) {
          val num = col(s"r$m2") - (1 until m2).map(j =>
            col(s"f${m2 - 1}_$j") * col(s"r${m2 - j}")).reduce(_ + _)
          val den = lit(1.0) - (1 until m2).map(j =>
            col(s"f${m2 - 1}_$j") * col(s"r$j")).reduce(_ + _)
          df = df.withColumn(s"f${m2}_$m2", num / den)
          for (j <- 1 until m2)
            df = df.withColumn(s"f${m2}_$j",
              col(s"f${m2 - 1}_$j") - col(s"f${m2}_$m2") * col(s"f${m2 - 1}_${m2 - j}"))
        }
        df.select(col("g").as("event_type"),
            round(col("f1_1"), 6).as("pacf_1"), round(col("f2_2"), 6).as("pacf_2"),
            round(col("f3_3"), 6).as("pacf_3"), round(col("f4_4"), 6).as("pacf_4"),
            round(col("f5_5"), 6).as("pacf_5"))
          .orderBy("event_type")
      },
      Some {
        def d(c: String) = s"CAST($c AS DOUBLE)"
        val mu = s"(${d("s")} / ${d("n")})"
        val c0 = s"(${d("p0")} - ${d("s")} * ${d("s")} / ${d("n")})"
        def rho(k: Int) =
          s"((${d(s"p$k")} - $mu * (${d(s"h$k")} + ${d(s"t$k")})" +
            s" + ${d(s"n$k")} * $mu * $mu) / $c0)"
        val rhoCols = (1 to 5).map(k => s"${rho(k)} AS r$k").mkString(", ")
        val lvls = new scala.collection.mutable.ArrayBuffer[String]
        lvls += "lvl1 AS (SELECT *, r1 AS f1_1 FROM acf)"
        var prev = "lvl1"
        for (m2 <- 2 to 5) {
          val num = s"r$m2 - (${(1 until m2).map(j =>
            s"f${m2 - 1}_$j * r${m2 - j}").mkString(" + ")})"
          val den = s"1.0 - (${(1 until m2).map(j =>
            s"f${m2 - 1}_$j * r$j").mkString(" + ")})"
          lvls += s"lvl${m2}a AS (SELECT *, ($num) / ($den) AS f${m2}_$m2 FROM $prev)"
          prev = s"lvl${m2}a"
          if (m2 < 5) {
            val cols = (1 until m2).map(j =>
              s"f${m2 - 1}_$j - f${m2}_$m2 * f${m2 - 1}_${m2 - j} AS f${m2}_$j").mkString(", ")
            lvls += s"lvl${m2}b AS (SELECT *, $cols FROM $prev)"
            prev = s"lvl${m2}b"
          }
        }
        val lagSums = (1 to 5).map { k =>
          s"""sum(CASE WHEN y$k IS NOT NULL THEN CAST(y AS HUGEINT) * y$k
              ELSE 0 END) AS p$k,
            CAST(sum(CASE WHEN y$k IS NOT NULL THEN y ELSE 0 END) AS BIGINT) AS h$k,
            CAST(sum(CASE WHEN y$k IS NOT NULL THEN y$k ELSE 0 END) AS BIGINT) AS t$k,
            CAST(count(CASE WHEN y$k IS NOT NULL THEN 1 END) AS BIGINT) AS n$k"""
        }.mkString(",\n")
        val leads = (1 to 5).map(k =>
          s"lead(y, $k) OVER (PARTITION BY g ORDER BY day) AS y$k").mkString(", ")
        s"""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        led AS (SELECT g, y, $leads FROM daily),
        m AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
            sum(CAST(y AS HUGEINT) * y) AS p0,
            $lagSums
          FROM led GROUP BY g),
        acf AS (SELECT *, $rhoCols FROM m),
        ${lvls.mkString(",\n")}
        SELECT g AS event_type,
          round(f1_1, 6) AS pacf_1, round(f2_2, 6) AS pacf_2,
          round(f3_3, 6) AS pacf_3, round(f4_4, 6) AS pacf_4,
          round(f5_5, 6) AS pacf_5
        FROM $prev ORDER BY event_type"""
      }),

    Q(
      "analytics_shapley_attribution",
      "Exact Shapley-value marketing attribution over the four " +
        "pre-purchase touchpoint channels — the game-theoretic credit " +
        "split (unlike last-touch, order-free and efficient: the four " +
        "values sum to exactly the explained conversions). Coalition " +
        "value v(S) = conversions whose touched-channel set ⊆ S, " +
        "from a 16-mask × 16-subset bounded grid; Shapley weights " +
        "|S|!(3−|S|)!/4! ride as INTEGER numerators (×24), so " +
        "φ·24 = Σ w·(v(S∪i) − v(S)) is exact integer arithmetic with " +
        "one final division. Everything past the per-user mask " +
        "aggregate is dimension-sized.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val firstP = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("pts"))
        val masks0 = ev.join(firstP, "user_id")
          .filter(col("ts") < col("pts"))
          .groupBy("user_id").agg(
            (max(when(col("event_type") === "view", 1).otherwise(0))
              + max(when(col("event_type") === "click", 2).otherwise(0))
              + max(when(col("event_type") === "signup", 4).otherwise(0))
              + max(when(col("event_type") === "error", 8).otherwise(0))).as("m"))
        val masks = firstP.join(masks0, Seq("user_id"), "left")
          .select(coalesce(col("m"), lit(0)).as("m"))
          .groupBy("m").agg(count(lit(1)).as("c"))
        val subsets = s.range(16).select(col("id").cast("int").as("ss"))
        val v = subsets.join(masks,
            masks("m").bitwiseAND(lit(15).bitwiseXOR(subsets("ss"))) === 0, "left")
          .groupBy("ss").agg(coalesce(sum("c"), lit(0L)).as("v"))
        val channels = Seq("view" -> 1, "click" -> 2, "signup" -> 4, "error" -> 8)
          .map { case (name, bit) =>
            s.range(1).select(lit(name).as("channel"), lit(bit).as("bit"))
          }.reduce(_.unionByName(_))
        val grid = channels.crossJoin(subsets)
          .filter(col("ss").bitwiseAND(col("bit")) === 0)
          .withColumn("w24",
            when(expr("bit_count(ss)") === 0, 6L)
              .when(expr("bit_count(ss)") === 1, 2L)
              .when(expr("bit_count(ss)") === 2, 2L).otherwise(6L))
        grid
          .join(v.select(col("ss"), col("v").as("vs")), "ss")
          .join(v.select((col("ss")).as("ssi"), col("v").as("vsi")),
            col("ssi") === col("ss") + col("bit"))
          .groupBy("channel")
          .agg(sum(col("w24") * (col("vsi") - col("vs"))).as("phi24"))
          .select(col("channel"),
            round(col("phi24").cast("double") / 24.0, 6).as("shapley"))
          .orderBy("channel")
      },
      Some("""WITH firstp AS (
          SELECT user_id, min(ts) AS pts FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
        masks0 AS (
          SELECT e.user_id,
            max(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
              + max(CASE WHEN e.event_type = 'click' THEN 2 ELSE 0 END)
              + max(CASE WHEN e.event_type = 'signup' THEN 4 ELSE 0 END)
              + max(CASE WHEN e.event_type = 'error' THEN 8 ELSE 0 END) AS m
          FROM events e JOIN firstp f USING (user_id)
          WHERE e.ts < f.pts GROUP BY 1),
        masks AS (
          SELECT coalesce(m0.m, 0) AS m, CAST(count(*) AS BIGINT) AS c
          FROM firstp f LEFT JOIN masks0 m0 USING (user_id) GROUP BY 1),
        subsets AS (SELECT CAST(unnest(range(16)) AS INT) AS ss),
        v AS (
          SELECT ss, coalesce(CAST(sum(c) AS BIGINT), 0) AS v
          FROM subsets LEFT JOIN masks ON (m & xor(15, ss)) = 0
          GROUP BY ss),
        channels AS (
          SELECT 'view' AS channel, 1 AS bit UNION ALL
          SELECT 'click', 2 UNION ALL
          SELECT 'signup', 4 UNION ALL
          SELECT 'error', 8),
        grid AS (
          SELECT channel, bit, ss,
            CASE bit_count(ss) WHEN 0 THEN 6 WHEN 1 THEN 2
              WHEN 2 THEN 2 ELSE 6 END AS w24
          FROM channels, subsets WHERE (ss & bit) = 0)
        SELECT channel,
          round(CAST(sum(w24 * (vsi.v - vs.v)) AS DOUBLE) / 24.0, 6) AS shapley
        FROM grid
        JOIN v vs ON vs.ss = grid.ss
        JOIN v vsi ON vsi.ss = grid.ss + grid.bit
        GROUP BY channel ORDER BY channel""")),

    Q(
      "ts_matrix_profile",
      "Matrix profile (window 7, exclusion zone ±3) of each event " +
        "type's daily revenue series: for every subsequence, the " +
        "squared euclidean distance to its nearest non-trivial " +
        "neighbor — the motif/discord primitive behind time-series " +
        "anomaly mining. Distances stay EXACT INTEGERS (cents²): " +
        "window pairs expand through a 7-offset grid joined back to " +
        "the series twice on (key, position), so d(i,j) is one " +
        "map-side-combinable integer SUM and the per-window argmin " +
        "is a (d, j)-lexicographic MIN — no floats anywhere, no " +
        "window-vector materialization. Join-shaped at any series " +
        "count; a discord is the row with the largest nn_dist2.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        val w = Window.partitionBy("g").orderBy("day")
        val series = daily.withColumn("i", (row_number().over(w) - 1).cast("long"))
          .select("g", "i", "y")
          .transform(Skew.cut)
        val nPos = series.groupBy("g").agg((max("i") - 5).as("np"))
        val positions = series.join(nPos, "g").filter(col("i") < col("np"))
          .select(col("g"), col("i"))
        val pairs = positions.as("a")
          .join(positions.select(col("g"), col("i").as("j")), Seq("g"))
          .filter(abs(col("i") - col("j")) >= 4)
        val grid = pairs.select(col("g"), col("i"), col("j"),
          explode(sequence(lit(0L), lit(6L))).as("k"))
        val dists = grid
          .join(series.select(col("g").as("g1"), col("i").as("pi"), col("y").as("ya")),
            col("g") === col("g1") && col("i") + col("k") === col("pi"))
          .join(series.select(col("g").as("g2"), col("i").as("pj"), col("y").as("yb")),
            col("g") === col("g2") && col("j") + col("k") === col("pj"))
          .groupBy("g", "i", "j")
          .agg(sum((col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
        dists.groupBy("g", "i")
          .agg(min(struct(col("d2"), col("j"))).as("nn"))
          .select(col("g").as("event_type"), col("i").as("pos"),
            col("nn.j").as("nn_pos"), col("nn.d2").as("nn_dist2"))
          .orderBy("event_type", "pos")
      },
      Some("""WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT g,
            CAST(row_number() OVER (PARTITION BY g ORDER BY day) - 1
              AS BIGINT) AS i, y
          FROM daily),
        np AS (SELECT g, max(i) - 5 AS np FROM series GROUP BY g),
        positions AS (
          SELECT s.g, s.i FROM series s JOIN np USING (g) WHERE s.i < np.np),
        pairs AS (
          SELECT a.g, a.i, b.i AS j
          FROM positions a JOIN positions b ON a.g = b.g
          WHERE abs(a.i - b.i) >= 4),
        grid AS (
          SELECT g, i, j, unnest(range(0, 7)) AS k FROM pairs),
        dists AS (
          SELECT gr.g, gr.i, gr.j,
            CAST(sum((sa.y - sb.y) * (sa.y - sb.y)) AS BIGINT) AS d2
          FROM grid gr
          JOIN series sa ON sa.g = gr.g AND sa.i = gr.i + gr.k
          JOIN series sb ON sb.g = gr.g AND sb.i = gr.j + gr.k
          GROUP BY 1, 2, 3),
        nn AS (
          SELECT g, i, j, d2,
            row_number() OVER (PARTITION BY g, i ORDER BY d2, j) AS rk
          FROM dists)
        SELECT g AS event_type, i AS pos, j AS nn_pos, d2 AS nn_dist2
        FROM nn WHERE rk = 1 ORDER BY event_type, pos""")),

    Q(
      "profile_entropy_per_column",
      "Shannon entropy profile of every low-cardinality categorical " +
        "column across four tables — the single number that flags a " +
        "near-constant column (entropy ≈ 0: drop it) or a " +
        "uniformly-spread key (entropy ≈ ln k: join-skew-safe) " +
        "before any modeling. Each column is one hash agg to " +
        "(value, count); entropies fold over value-sorted exact " +
        "count ratios, normalized by ln(distinct). A union of five " +
        "bounded profiles — at 100 TB each leg is still one " +
        "map-side-combinable pass.",
      (s, dir) => {
        def leg(df: org.apache.spark.sql.DataFrame, c: String, label: String) = {
          val counts = df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
            .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
          counts
            .withColumn("term",
              -(col("cnt").cast("double") / col("n").cast("double"))
                * log(col("cnt").cast("double") / col("n").cast("double")))
            .groupBy(lit(label).as("column_name"))
            .agg(count(lit(1)).as("n_distinct"), max("n").as("n_rows"),
              aggregate(sort_array(collect_list(struct(col("v"), col("term")))),
                lit(0.0), (a, e) => a + e.getField("term")).as("h"))
        }
        val docs = Tables.t(s, dir, "documents")
        val legs = Seq(
          leg(docs, "lang", "documents.lang"),
          leg(docs, "source", "documents.source"),
          leg(Tables.t(s, dir, "events"), "event_type", "events.event_type"),
          leg(Tables.t(s, dir, "orders"), "o_orderpriority", "orders.o_orderpriority"),
          leg(Tables.t(s, dir, "orders"), "o_orderstatus", "orders.o_orderstatus"))
        legs.reduce(_.unionByName(_))
          .select(col("column_name"), col("n_distinct"), col("n_rows"),
            round(col("h"), 6).as("entropy"),
            round(col("h") / log(col("n_distinct").cast("double")), 6)
              .as("norm_entropy"))
          .orderBy("column_name")
      },
      Some {
        def leg(table: String, c: String, label: String) =
          s"""SELECT '$label' AS column_name, count(*) AS n_distinct,
            max(n) AS n_rows,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY v)),
              (a, b) -> a + b) AS h
          FROM (SELECT $c AS v, CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(count(*)) OVER () AS BIGINT) AS n
            FROM $table GROUP BY 1)"""
        s"""WITH legs AS (
          ${Seq(leg("documents", "lang", "documents.lang"),
            leg("documents", "source", "documents.source"),
            leg("events", "event_type", "events.event_type"),
            leg("orders", "o_orderpriority", "orders.o_orderpriority"),
            leg("orders", "o_orderstatus", "orders.o_orderstatus"))
            .mkString("\nUNION ALL\n")})
        SELECT column_name, n_distinct, n_rows, round(h, 6) AS entropy,
          round(h / ln(CAST(n_distinct AS DOUBLE)), 6) AS norm_entropy
        FROM legs ORDER BY column_name"""
      }),

    Q(
      "analytics_touch_model_compare",
      "First-touch vs last-touch vs linear attribution side by side " +
        "per channel — the heuristic models practitioners actually " +
        "run, set against analytics_shapley_attribution's " +
        "game-theoretic split to expose how position-biased each is. " +
        "First/last = min/max-timestamp pre-purchase event per " +
        "converter ((ts, event_id)-lexicographic MIN for exact " +
        "tie-breaks); linear credit = exact per-user rationals " +
        "(1/touches) summed in cents-free integer form via a " +
        "common-denominator trick over ≤4 channels. One events scan, " +
        "three dimension-sized aggregates.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val firstP = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("pts"))
        val pre = ev.join(firstP, "user_id")
          .filter(col("ts") < col("pts") && col("event_type") =!= "purchase")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val ft = pre.groupBy("user_id")
          .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"),
            max(struct(col("ts"), col("event_id"), col("event_type"))).as("l"))
        val firstCounts = ft.groupBy(col("f.event_type").as("channel"))
          .agg(count(lit(1)).as("first_touch"))
        val lastCounts = ft.groupBy(col("l.event_type").as("channel"))
          .agg(count(lit(1)).as("last_touch"))
        // linear: each converter splits 1 across its DISTINCT channels;
        // 12 = lcm(1..4) keeps the credit integral: credit12 = 12/k
        val touches = pre.select("user_id", "event_type").distinct()
        val k = touches.groupBy("user_id").agg(count(lit(1)).as("k"))
        val linear = touches.join(k, "user_id")
          .groupBy(col("event_type").as("channel"))
          .agg(sum(Skew.idiv(lit(12L), col("k"))).as("linear12"))
        firstCounts.join(lastCounts, Seq("channel"), "full_outer")
          .join(linear, Seq("channel"), "full_outer")
          .select(col("channel"),
            coalesce(col("first_touch"), lit(0L)).as("first_touch"),
            coalesce(col("last_touch"), lit(0L)).as("last_touch"),
            round(coalesce(col("linear12"), lit(0L)).cast("double") / 12.0, 6)
              .as("linear"))
          .orderBy("channel")
      },
      Some("""WITH firstp AS (
          SELECT user_id, min(ts) AS pts FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
        pre AS (
          SELECT e.user_id, e.event_type, e.ts, e.event_id
          FROM events e JOIN firstp f USING (user_id)
          WHERE e.ts < f.pts AND e.event_type != 'purchase'),
        ft AS (
          SELECT user_id,
            min(struct_pack(ts := ts, event_id := event_id,
              event_type := event_type)) AS f,
            max(struct_pack(ts := ts, event_id := event_id,
              event_type := event_type)) AS l
          FROM pre GROUP BY user_id),
        fc AS (SELECT f.event_type AS channel,
            CAST(count(*) AS BIGINT) AS first_touch FROM ft GROUP BY 1),
        lc AS (SELECT l.event_type AS channel,
            CAST(count(*) AS BIGINT) AS last_touch FROM ft GROUP BY 1),
        touches AS (SELECT DISTINCT user_id, event_type FROM pre),
        kk AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
          FROM touches GROUP BY 1),
        lin AS (
          SELECT t.event_type AS channel,
            CAST(sum(12 // k) AS BIGINT) AS linear12
          FROM touches t JOIN kk USING (user_id) GROUP BY 1)
        SELECT channel,
          coalesce(first_touch, 0) AS first_touch,
          coalesce(last_touch, 0) AS last_touch,
          round(CAST(coalesce(linear12, 0) AS DOUBLE) / 12.0, 6) AS linear
        FROM fc
        FULL OUTER JOIN lc USING (channel)
        FULL OUTER JOIN lin USING (channel)
        ORDER BY channel""")),

    Q(
      "agg_weighted_median",
      "Exact weighted median per group (price weighted by quantity): " +
        "pre-aggregate to (group, value) with summed weights — a " +
        "map-side-combinable hash agg that shrinks the cumsum input " +
        "to distinct values per group — then a cluster-width " +
        "Skew.groupedRunningSum spine (range-partitioned local " +
        "cumsums + broadcast prefix offsets) picks the smallest value " +
        "whose cumulative weight reaches half the total. A plain " +
        "grouped window here would cap the stage at |groups| tasks " +
        "(6 on this fixture — 1/6th of the table on ONE task at " +
        "100 TB); the spine is bit-identical (weights are integer-" +
        "valued, sums exact at any partitioning) and runs at " +
        "thousands of tasks. Per-group totals re-derive from the " +
        "spine's checkpointed input and broadcast back. For groups " +
        "whose distinct-value set is itself huge at 100 TB, the " +
        "in-repo KLL sketch (agg_kll_quantiles) is the approximate " +
        "path; this is the exact one.",
      (s, dir) => {
        val w = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"),
            col("l_extendedprice").as("price"))
          .agg(sum("l_quantity").cast("long").as("wt"))
        // price is unique within (flag, status) after the pre-agg, so
        // the ROWS-frame spine cumsum equals the old RANGE-frame
        // window exactly; weights are integer-valued, so regrouped
        // sums are exact at any partition boundaries.
        val cum = Skew.groupedRunningSum(w,
          Seq("l_returnflag", "l_linestatus"), Seq(col("price")), "wt",
          outCol = "cw")
        val tot = cum.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("wt").as("tw"))
        cum.join(broadcast(tot), Seq("l_returnflag", "l_linestatus"))
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
        ORDER BY event_type, day""")),

    Q(
      "stats_chi2",
      "Chi-squared test of independence between market segment and " +
        "region over the customer dimension: the contingency table is " +
        "one hash aggregation (the only pass over the fact-sized " +
        "input); margins and the grand total are re-aggregations of " +
        "that tiny table, joined back by broadcast — no window, no " +
        "second scan. The final sum over |segments|×|regions| cells " +
        "is a sorted fold (bounded cell count), so the double " +
        "summation order is pinned in both engines.",
      (s, dir) => {
        val cu = Tables.t(s, dir, "customer")
        val na = broadcast(Tables.t(s, dir, "nation"))
        val re = broadcast(Tables.t(s, dir, "region"))
        val obs = cu
          .join(na, col("c_nationkey") === col("n_nationkey"))
          .join(re, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("r_name").as("reg"))
          .agg(count(lit(1)).as("o"))
        val rm = obs.groupBy("seg").agg(sum("o").as("rn"))
        val cm = obs.groupBy("reg").agg(sum("o").as("cn"))
        val tm = obs.agg(sum("o").as("tn"),
          countDistinct("seg").as("nr"), countDistinct("reg").as("nc"))
        obs.join(broadcast(rm), Seq("seg")).join(broadcast(cm), Seq("reg"))
          .crossJoin(broadcast(tm))
          .withColumn("e", col("rn").cast("double") * col("cn") / col("tn"))
          .withColumn("term", pow(col("o") - col("e"), 2) / col("e"))
          .agg(round(sfold(col("term")), 6).as("chi2"),
            max((col("nr") - 1) * (col("nc") - 1)).as("dof"),
            max("tn").as("n_obs"))
      },
      Some("""WITH obs AS (SELECT c_mktsegment AS seg, r_name AS reg,
            count(*) AS o
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        rm AS (SELECT seg, CAST(sum(o) AS BIGINT) AS rn FROM obs GROUP BY 1),
        cm AS (SELECT reg, CAST(sum(o) AS BIGINT) AS cn FROM obs GROUP BY 1),
        tm AS (SELECT CAST(sum(o) AS BIGINT) AS tn,
            CAST(count(DISTINCT seg) AS BIGINT) AS nr,
            CAST(count(DISTINCT reg) AS BIGINT) AS nc FROM obs),
        terms AS (SELECT
            pow(o - CAST(rn AS DOUBLE) * cn / tn, 2)
              / (CAST(rn AS DOUBLE) * cn / tn) AS term,
            nr, nc, tn
          FROM obs JOIN rm USING (seg) JOIN cm USING (reg), tm)
        SELECT round(list_reduce(list_sort(list(term)), (a, b) -> a + b), 6) AS chi2,
          max((nr - 1) * (nc - 1)) AS dof, max(tn) AS n_obs
        FROM terms""")),

    Q(
      "stats_ks_test",
      "Two-sample Kolmogorov–Smirnov statistic between the English and " +
        "non-English document-length distributions (the drift test a " +
        "corpus-monitoring pipeline runs between sources). Exact and " +
        "scale-safe: lengths reduce to per-value group counts (one " +
        "hash agg), cumulative counts are two-level — a window " +
        "partitioned by a value-range bucket for the within-bucket " +
        "running sum, plus exclusive bucket offsets computed by a " +
        "1-row sorted-array prefix fold and broadcast back (the " +
        "globalRank pattern from Skew, generalized to prefix sums) — " +
        "so no unpartitioned window anywhere. The sup statistic " +
        "stays in integer cross-multiplied form |ca·nb − cb·na| " +
        "(decimal-exact, summation-order-free) and is divided to a " +
        "double exactly once.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("n_chars").cast("long").as("v"),
            when(col("lang") === "en", lit("a")).otherwise(lit("b")).as("g"))
        val vc = d.groupBy("v").agg(
          count(when(col("g") === "a", 1)).as("ca"),
          count(when(col("g") === "b", 1)).as("cb"))
        val bkt = vc.withColumn("b", floor(col("v") / 256L).cast("long"))
        val wIn = Window.partitionBy("b").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bkt
          .withColumn("ia", sum("ca").over(wIn))
          .withColumn("ib", sum("cb").over(wIn))
        val offs = bucketPrefixOffsets(
          bkt.groupBy("b").agg(sum("ca").as("sa"), sum("cb").as("sb")), "b")
        val tot = vc.agg(sum("ca").as("na"), sum("cb").as("nb"))
        cum.join(broadcast(offs), Seq("b"))
          .crossJoin(broadcast(tot))
          .withColumn("dnum", abs(
            (col("oa") + col("ia")).cast("decimal(38,0)") * col("nb")
              - (col("ob") + col("ib")).cast("decimal(38,0)") * col("na")))
          .agg(
            round(max("dnum").cast("double")
              / (max("na").cast("double") * max("nb")), 6).as("ks_stat"),
            max("na").as("na"), max("nb").as("nb"))
      },
      Some("""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v,
            CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS g FROM documents),
        vc AS (SELECT v, count(*) FILTER (WHERE g = 'a') AS ca,
            count(*) FILTER (WHERE g = 'b') AS cb FROM d GROUP BY 1),
        c AS (SELECT v,
            sum(ca) OVER (ORDER BY v) AS cca,
            sum(cb) OVER (ORDER BY v) AS ccb FROM vc),
        t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
            CAST(sum(cb) AS BIGINT) AS nb FROM vc)
        SELECT round(CAST(max(abs(CAST(cca AS DECIMAL(38,0)) * nb
              - CAST(ccb AS DECIMAL(38,0)) * na)) AS DOUBLE)
            / (CAST(max(na) AS DOUBLE) * max(nb)), 6) AS ks_stat,
          max(na) AS na, max(nb) AS nb
        FROM c, t""")),

    Q(
      "stats_mann_whitney",
      "Mann–Whitney U rank-sum test between urgent and low-priority " +
        "order values — the nonparametric did-the-distribution-shift " +
        "test that pairs with stats_ks_test. Same scalable spine: " +
        "per-value group counts, bucket-partitioned cumulative " +
        "windows + broadcast prefix offsets (shared helper, no " +
        "unpartitioned window). Tie handling is exact: rank sums are " +
        "kept in doubled-integer form Σ ca·(2·below + ties + 1) and " +
        "the tie-corrected variance uses Σ(t³−t), all in decimal " +
        "until the final z — deterministic at any parallelism.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(round(col("o_totalprice") * 100).cast("long").as("v"),
            when(col("o_orderpriority") === "1-URGENT", lit("a")).otherwise(lit("b")).as("g"))
        val vc = o.groupBy("v").agg(
          count(when(col("g") === "a", 1)).as("ca"),
          count(when(col("g") === "b", 1)).as("cb"))
        val bkt = vc.withColumn("b", floor(col("v") / 1048576L).cast("long"))
        val wIn = Window.partitionBy("b").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bkt
          .withColumn("ia", sum("ca").over(wIn))
          .withColumn("ib", sum("cb").over(wIn))
        val offs = bucketPrefixOffsets(
          bkt.groupBy("b").agg(sum("ca").as("sa"), sum("cb").as("sb")), "b")
        val tot = vc.agg(sum("ca").as("na0"), sum("cb").as("nb0"))
        val agg = cum.join(broadcast(offs), Seq("b"))
          .withColumn("cl", col("oa") + col("ia") - col("ca")
            + col("ob") + col("ib") - col("cb"))
          .withColumn("ct", col("ca") + col("cb"))
          .agg(
            sum(col("ca").cast("decimal(38,0)")
              * (col("cl") * 2 + col("ct") + 1)).as("rs2"),
            sum(col("ct").cast("decimal(38,0)") * col("ct") * col("ct")
              - col("ct")).as("tt"))
        val u = (col("rs2") - col("na0").cast("decimal(38,0)") * (col("na0") + 1))
          .cast("double") / 2.0
        val nAll = col("na0") + col("nb0")
        val mu = col("na0").cast("double") * col("nb0") / 2.0
        val vr = col("na0").cast("double") * col("nb0") / 12.0 *
          ((nAll + 1).cast("double") - col("tt").cast("double")
            / (nAll.cast("double") * (nAll - 1)))
        agg.crossJoin(broadcast(tot))
          .select(round(u, 2).as("u_stat"),
            round((u - mu) / sqrt(vr), 6).as("z_score"),
            col("na0").as("na"), col("nb0").as("nb"))
      },
      Some("""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
            CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS g
          FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        vc AS (SELECT v, count(*) FILTER (WHERE g = 'a') AS ca,
            count(*) FILTER (WHERE g = 'b') AS cb FROM o GROUP BY 1),
        c AS (SELECT v, ca, cb,
            CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
            CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb FROM vc),
        t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
            CAST(sum(cb) AS BIGINT) AS nb FROM vc),
        terms AS (SELECT ca, cuma - ca + cumb - cb AS cl, ca + cb AS ct FROM c),
        agg AS (SELECT
            sum(CAST(ca AS HUGEINT) * (cl * 2 + ct + 1)) AS rs2,
            sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS tt FROM terms)
        SELECT
          round(CAST(rs2 - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2.0, 2) AS u_stat,
          round((CAST(rs2 - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2.0
              - CAST(na AS DOUBLE) * nb / 2.0)
            / sqrt(CAST(na AS DOUBLE) * nb / 12.0
              * (CAST(na + nb + 1 AS DOUBLE) - CAST(tt AS DOUBLE)
                / (CAST(na + nb AS DOUBLE) * (na + nb - 1)))), 6) AS z_score,
          na, nb
        FROM agg, t""")),

    Q(
      "stats_cliffs_delta",
      "Cliff's delta nonparametric effect size between English and " +
        "French document lengths — the magnitude companion to " +
        "stats_mann_whitney's significance: \u03b4 = (#(a>b) \u2212 " +
        "#(a<b)) / (n_a\u00b7n_b), read off the SAME scalable " +
        "rank spine (per-value group counts, bucket-partitioned " +
        "cumulative windows + broadcast prefix offsets — no " +
        "unpartitioned window, no O(n\u00b2) pair join): for each " +
        "distinct value, B's count there multiplies A's exact " +
        "below/above cumulative counts. Everything is integer until " +
        "the single final division; the conventional " +
        "negligible/small/medium/large label rides along.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .filter(col("lang").isin("en", "fr"))
          .select(col("n_chars").as("v"),
            when(col("lang") === "en", lit("a")).otherwise(lit("b")).as("g"))
        val vc = d.groupBy("v").agg(
          count(when(col("g") === "a", 1)).as("ca"),
          count(when(col("g") === "b", 1)).as("cb"))
        val bkt = vc.withColumn("b", floor(col("v") / 1024L).cast("long"))
        val wIn = Window.partitionBy("b").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bkt.withColumn("ia", sum("ca").over(wIn))
        val offs = bucketPrefixOffsets(
          bkt.groupBy("b").agg(sum("ca").as("sa"), sum("cb").as("sb")), "b")
        val tot = vc.agg(sum("ca").as("na0"), sum("cb").as("nb0"))
        val agg = cum.join(broadcast(offs), Seq("b"))
          .crossJoin(broadcast(tot))
          .withColumn("belowA", col("oa") + col("ia") - col("ca"))
          .withColumn("aboveA", col("na0") - col("oa") - col("ia"))
          .agg(
            sum(col("cb").cast("decimal(38,0)") * col("aboveA")).as("gt"),
            sum(col("cb").cast("decimal(38,0)") * col("belowA")).as("lt"),
            sum(col("cb").cast("decimal(38,0)") * col("ca")).as("eq"))
        val delta = (col("gt") - col("lt")).cast("double") /
          (col("na0").cast("double") * col("nb0"))
        agg.crossJoin(broadcast(tot))
          .select(col("na0").as("na"), col("nb0").as("nb"),
            col("gt").cast("long").as("n_gt"),
            col("lt").cast("long").as("n_lt"),
            col("eq").cast("long").as("n_ties"),
            round(delta, 6).as("cliffs_delta"),
            when(abs(delta) < 0.147, "negligible")
              .when(abs(delta) < 0.33, "small")
              .when(abs(delta) < 0.474, "medium")
              .otherwise("large").as("magnitude"))
      },
      Some("""WITH d AS (SELECT n_chars AS v,
            CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS g
          FROM documents WHERE lang IN ('en', 'fr')),
        vc AS (SELECT v, count(*) FILTER (WHERE g = 'a') AS ca,
            count(*) FILTER (WHERE g = 'b') AS cb FROM d GROUP BY 1),
        c AS (SELECT v, ca, cb,
            CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma FROM vc),
        t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
            CAST(sum(cb) AS BIGINT) AS nb FROM vc),
        agg AS (SELECT
            sum(CAST(cb AS HUGEINT) * (na - cuma)) AS gt,
            sum(CAST(cb AS HUGEINT) * (cuma - ca)) AS lt,
            sum(CAST(cb AS HUGEINT) * ca) AS eq
          FROM c, t)
        SELECT na, nb,
          CAST(gt AS BIGINT) AS n_gt, CAST(lt AS BIGINT) AS n_lt,
          CAST(eq AS BIGINT) AS n_ties,
          round(CAST(gt - lt AS DOUBLE) / (CAST(na AS DOUBLE) * nb), 6)
            AS cliffs_delta,
          CASE WHEN abs(CAST(gt - lt AS DOUBLE) / (CAST(na AS DOUBLE) * nb)) < 0.147
              THEN 'negligible'
            WHEN abs(CAST(gt - lt AS DOUBLE) / (CAST(na AS DOUBLE) * nb)) < 0.33
              THEN 'small'
            WHEN abs(CAST(gt - lt AS DOUBLE) / (CAST(na AS DOUBLE) * nb)) < 0.474
              THEN 'medium'
            ELSE 'large' END AS magnitude
        FROM agg, t""")),

    Q(
      "stats_anderson_darling",
      "Anderson–Darling normality test of order values per " +
        "market segment — the tail-sensitive upgrade to " +
        "stats_ks_test's uniform-band statistic, on the SAME " +
        "bucketed rank spine as stats_cliffs_delta (per-value " +
        "counts, bucket-partitioned cumulative windows + broadcast " +
        "per-segment prefix offsets) — NOT a window partitioned by " +
        "the 5-value segment column, which at 100× would sort " +
        "a fifth of orders⋈customer on one task. The classic " +
        "rank form Σ(2i−1)·lnΦ(z_i) + " +
        "(2n−2i+1)·ln(1−Φ(z_i)) regroups " +
        "exactly over tied values: a run of k ties starting above " +
        "a strictly-smaller rows contributes weights " +
        "w₁ = k(2a+k) and w₂ = k(2n−2a−k) " +
        "(Σ of the per-row coefficients in closed form), so " +
        "each DISTINCT value is one row of the spine. Moments come " +
        "from exact integer-cent power sums, Φ is the engine-" +
        "portable polynomial, and the per-segment reduction is a " +
        "sorted fold — bit-identical in DuckDB at any parallelism.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .join(broadcast(Tables.t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("seg"),
            round(col("o_totalprice") * 100).cast("long").as("c"))
        // value spine: one row per distinct (seg, cents); buckets are
        // value-range-bounded (~width/2^18), so every window partition
        // is (seg, bucket) — thousands of tasks at any data scale.
        // r18: the spine is cut ONCE and the moments derive FROM it
        // (n = Σk, s1 = Σ c·k, s2 = Σ c²·k — identical exact
        // decimal/integer sums, just regrouped over ties); the r17
        // form aggregated the orders⋈customer join separately for
        // moments, spine, and offsets — the plan audit showed the
        // join subtree replicated into 12 scans (guide §1.2)
        val vc = o.groupBy("seg", "c").agg(count(lit(1)).as("k"))
          .transform(graft.ops.Skew.cut)
        val mom = vc.groupBy("seg").agg(
          sum(col("k")).as("n"),
          sum(col("c").cast("decimal(38,0)") * col("k")).as("s1"),
          sum(col("c").cast("decimal(38,0)") * col("c") * col("k")).as("s2"))
        val bkt = vc.withColumn("b", floor(col("c") / 262144L).cast("long"))
        val wIn = Window.partitionBy("seg", "b").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bkt.withColumn("ik", sum("k").over(wIn))
        // per-(seg, bucket) totals -> prefix offsets within each segment
        // (bounded rows: segments x buckets), broadcast back
        val offs = bkt.groupBy("seg", "b").agg(sum("k").as("sk"))
          .groupBy("seg")
          .agg(sort_array(collect_list(struct(col("b"), col("sk")))).as("arr"))
          .select(col("seg"), explode(expr(
            "transform(arr, (x, i) -> struct(x.b AS b, " +
              "aggregate(slice(arr, 1, i), CAST(0 AS BIGINT), " +
              "(acc, y) -> acc + y.sk) AS off))")).as("o"))
          .select(col("seg"), col("o.b").as("b"), col("o.off").as("off"))
        val terms = cum.join(broadcast(offs), Seq("seg", "b"))
          .join(broadcast(mom), Seq("seg"))
          .withColumn("a", col("off") + col("ik") - col("k"))
          .withColumn("mu", col("s1").cast("double") / col("n"))
          .withColumn("sd", sqrt(
            (col("s2").cast("double") - col("s1").cast("double")
              * col("s1").cast("double") / col("n"))
              / (col("n").cast("double") - 1)))
          .withColumn("phi", normCdf((col("c").cast("double") - col("mu")) / col("sd")))
          .withColumn("term",
            col("k").cast("double")
                * (col("a").cast("double") * 2 + col("k").cast("double"))
                * log(greatest(col("phi"), lit(1e-300))) +
              col("k").cast("double")
                * (col("n").cast("double") * 2
                  - col("a").cast("double") * 2 - col("k").cast("double"))
                * log(greatest(lit(1.0) - col("phi"), lit(1e-300))))
        terms.groupBy("seg", "n")
          .agg(sfold(col("term")).as("s"))
          .select(col("seg"), col("n"),
            round(-col("n").cast("double") - col("s") / col("n"), 6).as("a2"),
            round((-col("n").cast("double") - col("s") / col("n"))
              * (lit(1.0) + lit(0.75) / col("n")
                + lit(2.25) / (col("n").cast("double") * col("n"))), 6)
              .as("a2_star"))
          .orderBy("seg")
      },
      Some(s"""WITH o AS (SELECT c_mktsegment AS seg,
            CAST(round(o_totalprice * 100) AS BIGINT) AS c
          FROM orders JOIN customer ON o_custkey = c_custkey),
        mom AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(c AS HUGEINT)) AS s1,
            sum(CAST(c AS HUGEINT) * c) AS s2
          FROM o GROUP BY 1),
        vc AS (SELECT seg, c, CAST(count(*) AS BIGINT) AS k
          FROM o GROUP BY 1, 2),
        cum AS (SELECT seg, c, k,
            CAST(sum(k) OVER (PARTITION BY seg ORDER BY c) AS BIGINT) AS ik
          FROM vc),
        z AS (SELECT cum.seg, n, k, ik - k AS a,
            (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
              / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                  * CAST(s1 AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1)) AS zz
          FROM cum JOIN mom ON cum.seg = mom.seg),
        terms AS (SELECT seg, n,
            CAST(k AS DOUBLE)
                * (CAST(a AS DOUBLE) * 2 + CAST(k AS DOUBLE))
                * ln(greatest(${normCdfSql("zz")}, 1e-300)) +
              CAST(k AS DOUBLE)
                * (CAST(n AS DOUBLE) * 2
                  - CAST(a AS DOUBLE) * 2 - CAST(k AS DOUBLE))
                * ln(greatest(1.0 - ${normCdfSql("zz")}, 1e-300)) AS term
          FROM z),
        agg AS (SELECT seg, n,
            list_reduce(list_sort(list(term)), (a, b) -> a + b) AS s
          FROM terms GROUP BY 1, 2)
        SELECT seg, n,
          round(-CAST(n AS DOUBLE) - s / n, 6) AS a2,
          round((-CAST(n AS DOUBLE) - s / n)
            * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)), 6) AS a2_star
        FROM agg ORDER BY seg""")),

    Q(
      "stats_brier_decomposition",
      "Murphy decomposition of the Brier score for a length-based " +
        "is-this-English classifier (p = \u03c3((n_chars\u2212\u03bc)/" +
        "\u03c3_x), the same z-scored logistic shape " +
        "text_quality_logistic fits): Brier = reliability \u2212 " +
        "resolution + uncertainty + within-bin variance, over 10 " +
        "fixed-width probability bins. Moments come from exact " +
        "integer character sums; every float mean (per-bin p\u0304, " +
        "the Brier sum, both decomposition sums) is a sorted fold; " +
        "outcome rates are exact integer ratios — the whole " +
        "decomposition replays bit-identically in DuckDB. The " +
        "calibration companion to stats_calibration_ece, adding the " +
        "resolution/uncertainty split ECE can't see.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("n_chars").cast("long").as("x"),
            (col("lang") === "en").cast("long").as("y"))
        val mom = d.agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("s1"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"),
          sum(col("y")).as("sy"))
        val scored = d.crossJoin(broadcast(mom))
          .withColumn("mu", col("s1").cast("double") / col("n"))
          .withColumn("sd", sqrt(
            (col("s2").cast("double") - col("s1").cast("double")
              * col("s1").cast("double") / col("n"))
              / (col("n").cast("double") - 1)))
          .withColumn("p", lit(1.0) /
            (lit(1.0) + exp((col("mu") - col("x")) / col("sd"))))
          .withColumn("k", least(floor(col("p") * 10), lit(9L)))
        val bins = scored.groupBy("k").agg(
          count(lit(1)).as("nk"),
          (sfold(col("p")) / count(lit(1))).as("pbar"),
          sum(col("y")).as("syk"))
        val brier = scored.agg(
          (sfold((col("p") - col("y")) * (col("p") - col("y")))
            / first(col("n"))).as("brier"))
        val decomp = bins.crossJoin(broadcast(mom))
          .withColumn("ybar_k", col("syk").cast("double") / col("nk"))
          .withColumn("ybar", col("sy").cast("double") / col("n"))
          .agg(
            (sfold(col("nk") * (col("pbar") - col("ybar_k"))
              * (col("pbar") - col("ybar_k"))) / first(col("n"))).as("reliability"),
            (sfold(col("nk") * (col("ybar_k") - col("ybar"))
              * (col("ybar_k") - col("ybar"))) / first(col("n"))).as("resolution"),
            first(col("ybar") * (lit(1.0) - col("ybar"))).as("uncertainty"))
        brier.crossJoin(broadcast(decomp)).crossJoin(broadcast(mom))
          .select(col("n"),
            round(col("brier"), 6).as("brier"),
            round(col("reliability"), 6).as("reliability"),
            round(col("resolution"), 6).as("resolution"),
            round(col("uncertainty"), 6).as("uncertainty"),
            round(col("brier") - (col("reliability") - col("resolution")
              + col("uncertainty")), 6).as("within_bin_var"))
      },
      Some("""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
            sum(CAST(x AS HUGEINT)) AS s1,
            sum(CAST(x AS HUGEINT) * x) AS s2,
            CAST(sum(y) AS BIGINT) AS sy
          FROM d),
        scored AS (SELECT x, y,
            1.0 / (1.0 + exp(((CAST(s1 AS DOUBLE) / n) - x)
              / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                  * CAST(s1 AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1)))) AS p
          FROM d, mom),
        binned AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS k, p, y
          FROM scored),
        bins AS (SELECT k, CAST(count(*) AS BIGINT) AS nk,
            list_reduce(list_sort(list(p)), (a, b) -> a + b) / count(*) AS pbar,
            CAST(sum(y) AS BIGINT) AS syk
          FROM binned GROUP BY 1),
        brier AS (SELECT
            list_reduce(list_sort(list((p - y) * (p - y))), (a, b) -> a + b)
              / (SELECT n FROM mom) AS brier
          FROM scored),
        decomp AS (SELECT
            list_reduce(list_sort(list(nk * (pbar - CAST(syk AS DOUBLE) / nk)
              * (pbar - CAST(syk AS DOUBLE) / nk))), (a, b) -> a + b)
              / (SELECT n FROM mom) AS reliability,
            list_reduce(list_sort(list(nk * (CAST(syk AS DOUBLE) / nk
                - CAST(sy AS DOUBLE) / n)
              * (CAST(syk AS DOUBLE) / nk - CAST(sy AS DOUBLE) / n))),
              (a, b) -> a + b) / (SELECT n FROM mom) AS resolution,
            any_value(CAST(sy AS DOUBLE) / n
              * (1.0 - CAST(sy AS DOUBLE) / n)) AS uncertainty
          FROM bins, mom)
        SELECT n, round(brier, 6) AS brier,
          round(reliability, 6) AS reliability,
          round(resolution, 6) AS resolution,
          round(uncertainty, 6) AS uncertainty,
          round(brier - (reliability - resolution + uncertainty), 6)
            AS within_bin_var
        FROM brier, decomp, mom""")),

    Q(
      "stats_permutation_test",
      "Paired sign-flip permutation test on the daily purchase\u2212" +
        "click mean-value gap: the exact-replay alternative to " +
        "stats_welch_t's normality assumption. The day series packs " +
        "into ONE row (calendar-bounded); the observed statistic and " +
        "all 200 sign-flipped replicates are sorted folds inside a " +
        "single expression, with each day's sign drawn from the " +
        "engine-portable md5 hash of (replicate, date) — so DuckDB " +
        "replays every one of the 200 permutation sums bit for bit " +
        "and the p-value (add-one convention) is exact, not " +
        "seeded-RNG rows-only. At scale the daily reduction is the " +
        "only corpus pass; the permutation sweep touches a " +
        "days-long array 200 times.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(to_date(col("ts").cast("timestamp")).as("d"),
            col("event_type").as("t"), col("value"))
        val daily = e.groupBy("d", "t")
          .agg((sfold(col("value")) / count(lit(1))).as("m"))
        val diffs = daily.filter(col("t") === "purchase")
          .select(col("d"), col("m").as("mp"))
          .join(daily.filter(col("t") === "click")
            .select(col("d"), col("m").as("mc")), Seq("d"))
          .select(col("d"), (col("mp") - col("mc")).as("diff"))
        val tFold = "aggregate(array_sort(transform(ds, x -> x.diff)), " +
          "CAST(0.0 AS DOUBLE), (a, y) -> a + y)"
        val permFold = "aggregate(array_sort(transform(ds, x -> " +
          "IF(pmod(CAST(conv(substring(md5(concat('perm:', " +
          "CAST(b AS STRING), ':', CAST(x.d AS STRING))), 1, 8), 16, 10) " +
          "AS BIGINT), 2) = 0, x.diff, -x.diff))), " +
          "CAST(0.0 AS DOUBLE), (a, y) -> a + y)"
        // t_obs and the 200 replicate sums materialize ONCE in a prior
        // projection, each referenced more than once downstream so
        // CollapseProject cannot inline the O(days·log days) folds back
        // into the filter lambda (the fold-inline hazard QueriesSpec
        // lints: an invariant re-evaluated per replicate)
        diffs
          .agg(sort_array(collect_list(struct(col("d"), col("diff")))).as("ds"))
          .select(col("ds"),
            expr(tFold).as("t_raw"),
            expr(s"transform(sequence(1, 200), b -> $permFold)").as("sbs"))
          .select(
            size(col("ds")).cast("long").as("n_days"),
            round(col("t_raw"), 6).as("t_obs"),
            expr("size(filter(sbs, sb -> abs(sb) >= abs(t_raw)))")
              .cast("long").as("n_extreme"),
            expr("""round((1.0D + size(filter(sbs,
                sb -> abs(sb) >= abs(t_raw)))) / 201.0D, 6)""").as("p_value"))
      },
      Some(s"""WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
            event_type AS t, value
          FROM events WHERE event_type IN ('purchase', 'click')),
        daily AS (SELECT d, t,
            list_reduce(list_sort(list(value)), (a, b) -> a + b) / count(*) AS m
          FROM e GROUP BY 1, 2),
        diffs AS (SELECT p.d, p.m - c.m AS diff
          FROM (SELECT d, m FROM daily WHERE t = 'purchase') p
          JOIN (SELECT d, m FROM daily WHERE t = 'click') c USING (d)),
        pk AS (SELECT list(struct_pack(d := d, diff := diff) ORDER BY d) AS ds
          FROM diffs),
        obs AS (SELECT ds,
            list_reduce(list_sort(list_transform(ds, x -> x.diff)),
              (a, b) -> a + b) AS t_obs
          FROM pk),
        perms AS (SELECT t_obs,
            list_transform(range(1, 201), b ->
              list_reduce(list_sort(list_transform(ds, x ->
                CASE WHEN ${PortableHash.hexHashSql(
                  "'perm:' || CAST(b AS VARCHAR) || ':' || CAST(x.d AS VARCHAR)")}
                    % 2 = 0 THEN x.diff ELSE -x.diff END)),
                (a, y) -> a + y)) AS sbs
          FROM obs),
        cnt AS (SELECT t_obs,
            len(list_filter(sbs, sb -> abs(sb) >= abs(t_obs))) AS n_extreme
          FROM perms)
        SELECT (SELECT count(*) FROM diffs) AS n_days,
          round(t_obs, 6) AS t_obs,
          CAST(n_extreme AS BIGINT) AS n_extreme,
          round((1.0 + n_extreme) / 201.0, 6) AS p_value
        FROM cnt""")),

    Q(
      "ts_autocorr",
      "Autocorrelation function of each event type's daily-mean " +
        "series at lags 1–5 (seasonality/memory detection — the " +
        "diagnostic behind ts_seasonality's fixed-period assumption): " +
        "r_ℓ = Σ(x_t−μ)(x_{t+ℓ}−μ) / Σ(x_t−μ)². Lagged pairs via one " +
        "lead window per lag over the per-type partition; every " +
        "double sum (daily means, series mean, numerator, " +
        "denominator) is a sorted fold over the calendar-bounded " +
        "series, so the ACF is bit-stable at any parallelism.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
          .agg((sfold(col("value")) / count(lit(1))).as("x"))
        val mu = daily.groupBy("event_type")
          .agg((sfold(col("x")) / count(lit(1))).as("mu"))
        val dm = daily.join(broadcast(mu), Seq("event_type"))
        val wSeq = Window.partitionBy("event_type").orderBy("d")
        val den = dm
          .groupBy("event_type")
          .agg(sfold((col("x") - col("mu")) * (col("x") - col("mu"))).as("den"))
        val lags = dm
          .select(col("event_type"), col("d"), col("x"), col("mu"),
            explode(sequence(lit(1), lit(5))).as("lag"))
          .withColumn("dl", col("d") + col("lag"))
        // calendar-shifted copy joined back on (type, day+lag) — an
        // equi-join, so variable lags never need a non-constant window
        // offset and gap days pair only with real calendar neighbors
        val shifted = dm.select(col("event_type"), col("d").as("dl"),
          col("x").as("xl"))
        val num = lags.join(shifted, Seq("event_type", "dl"))
          .groupBy("event_type", "lag")
          .agg(sfold((col("x") - col("mu")) * (col("xl") - col("mu"))).as("num"))
        num.join(broadcast(den), Seq("event_type"))
          .select(col("event_type"), col("lag"),
            round(col("num") / col("den"), 4).as("acf"))
          .orderBy("event_type", "lag")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            list_reduce(list_sort(list(value)), (a, b) -> a + b) / count(*) AS x
          FROM events GROUP BY 1, 2),
        mu AS (SELECT event_type,
            list_reduce(list_sort(list(x)), (a, b) -> a + b) / count(*) AS mu
          FROM daily GROUP BY 1),
        dm AS (SELECT daily.event_type, d, x, mu
          FROM daily JOIN mu USING (event_type)),
        den AS (SELECT event_type,
            list_reduce(list_sort(list((x - mu) * (x - mu))), (a, b) -> a + b) AS den
          FROM dm GROUP BY 1),
        lagged AS (SELECT dm.event_type, d, x, mu, lag, d + lag AS dl
          FROM dm CROSS JOIN (SELECT CAST(unnest(range(1, 6)) AS INT) AS lag)),
        num AS (SELECT l.event_type, lag,
            list_reduce(list_sort(list((l.x - l.mu) * (s.x - l.mu))),
              (a, b) -> a + b) AS num
          FROM lagged l JOIN dm s
            ON s.event_type = l.event_type AND s.d = l.dl
          GROUP BY 1, 2)
        SELECT num.event_type, lag, round(num / den, 4) AS acf
        FROM num JOIN den USING (event_type)
        ORDER BY event_type, lag""")),

    Q(
      "ts_rolling_regression",
      "Rolling 7-day OLS trend per event type: the windowed " +
        "least-squares slope of daily volume over day index — " +
        "slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) — with every sum " +
        "taken over a 7-row sliding frame in EXACT integer cents and " +
        "day units, so the regression arithmetic has no float " +
        "accumulation at all: one window pass, four integer frame " +
        "sums, one final division. The trend-detection feature a " +
        "monitoring pipeline computes per series at any scale.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val w = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-6, Window.currentRow)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("d")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sxy", sum(col("d") * col("y")).over(w))
          .withColumn("sxx", sum(col("d").cast("long") * col("d")).over(w))
          .filter(col("n") === 7)
          .select(col("event_type"), col("d").as("day"),
            round((col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
              / (col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
              / 100.0, 6).as("slope"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, d,
            count(*) OVER w AS n,
            CAST(sum(d) OVER w AS BIGINT) AS sx,
            CAST(sum(y) OVER w AS BIGINT) AS sy,
            CAST(sum(d * y) OVER w AS BIGINT) AS sxy,
            CAST(sum(CAST(d AS BIGINT) * d) OVER w AS BIGINT) AS sxx
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT event_type, d AS day,
          round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            / 100.0, 6) AS slope
        FROM r WHERE n = 7 ORDER BY event_type, day""")),

    Q(
      "ts_rolling_median",
      "Rolling 7-day median of daily volume per event type — the " +
        "robust smoother (spikes don't drag it the way a moving mean " +
        "moves). Daily totals are exact integer cents; the frame is " +
        "collected and sorted per row (bounded at 7 elements — this " +
        "is the rare case where collect-in-a-window is exactly " +
        "right), the median read by explicit middle-element " +
        "arithmetic identical to DuckDB's interpolation on the same " +
        "sorted list. Emitted in CENTS: an even frame's median is a " +
        "half-integer — exact in binary — while dividing by 100 makes " +
        "it inexact and round(,2) then splits between Spark's " +
        "string-repr HALF_UP and DuckDB's binary rounding (the r15 " +
        "sf0.1 sweep caught 33917.755 rounding .76 vs .75). " +
        "Partitioned window only.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val w = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-6, Window.currentRow)
        val n = size(col("arr"))
        daily
          .withColumn("arr", sort_array(collect_list(col("y")).over(w)))
          .select(col("event_type"), col("d").as("day"),
            when(n % 2 === 1,
              element_at(col("arr"), ((n + 1) / 2).cast("int")).cast("double"))
              .otherwise((element_at(col("arr"), (n / 2).cast("int"))
                + element_at(col("arr"), (n / 2 + 1).cast("int"))) / 2.0)
              .as("med_cents"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, d,
            list_sort(list(y) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
          FROM daily)
        SELECT event_type, d AS day,
          CASE WHEN len(arr) % 2 = 1
              THEN CAST(arr[CAST((len(arr) + 1) / 2 AS INT)] AS DOUBLE)
              ELSE (arr[CAST(len(arr) / 2 AS INT)]
                + arr[CAST(len(arr) / 2 + 1 AS INT)]) / 2.0 END AS med_cents
        FROM r ORDER BY event_type, day""")),

    Q(
      "ts_interval_union",
      "Union length of overlapping intervals per user — the coverage " +
        "sweep behind uptime, session-coverage, and billing-overlap " +
        "questions: each purchase opens an interval [ts, ts+value " +
        "seconds]; a per-user sweep detects islands (start beyond the " +
        "running max of prior ends opens a new one) and sums island " +
        "extents. All integer microseconds — running max, island ids, " +
        "and extents are exact — and every window is partitioned by " +
        "user, so the sweep parallelizes per key.",
      (s, dir) => {
        val iv = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("user_id") < 60)
          .select(col("user_id"), col("event_id"),
            Tables.epochUs(col("ts")).as("s0"),
            (Tables.epochUs(col("ts"))
              + round(col("value") * 1000000).cast("long")).as("e0"))
        val wOrd = Window.partitionBy("user_id").orderBy("s0", "event_id")
        val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        iv
          .withColumn("pmax", max("e0").over(wPrev))
          .withColumn("flag",
            when(col("pmax").isNull || col("s0") > col("pmax"), 1L).otherwise(0L))
          .withColumn("island", sum("flag").over(wRun))
          .groupBy("user_id", "island")
          .agg(min("s0").as("is0"), max("e0").as("ie0"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            round((sum(col("ie0") - col("is0")) / 1000000.0), 2).as("covered_sec"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (SELECT user_id, event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS s0,
            epoch_us(CAST(ts AS TIMESTAMP))
              + CAST(round(value * 1000000) AS BIGINT) AS e0
          FROM events WHERE event_type = 'purchase' AND user_id < 60),
        sw AS (SELECT user_id, event_id, s0, e0,
            max(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM iv),
        fl AS (SELECT user_id, event_id, s0, e0,
            CASE WHEN pmax IS NULL OR s0 > pmax THEN 1 ELSE 0 END AS flag
          FROM sw),
        isl AS (SELECT user_id, s0, e0,
            sum(flag) OVER (PARTITION BY user_id ORDER BY s0, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM fl),
        ext AS (SELECT user_id, island, min(s0) AS is0, max(e0) AS ie0
          FROM isl GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_islands,
          round(CAST(sum(ie0 - is0) AS BIGINT) / 1000000.0, 2) AS covered_sec
        FROM ext GROUP BY user_id ORDER BY user_id""")),

    Q(
      "ts_hourly_profile",
      "Hour-of-day load profile per event type — event counts and " +
        "mean value across the 24-hour clock (the diurnal curve " +
        "behind capacity planning and anomaly baselines; " +
        "agg_hour_bitmap tracks presence, this tracks load). One " +
        "hash aggregation to at most 24×|types| rows; means from " +
        "exact integer cent sums with a single division.",
      (s, dir) => {
        Tables.t(s, dir, "events")
          .select(col("event_type"), hour(col("ts")).as("h"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "h")
          .agg(count(lit(1)).as("n_events"),
            round(sum("cents").cast("double") / count(lit(1)) / 100.0, 2)
              .as("mean_value"))
          .orderBy("event_type", "h")
      },
      Some("""SELECT event_type,
          CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h,
          count(*) AS n_events,
          round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
            / count(*) / 100.0, 2) AS mean_value
        FROM events GROUP BY 1, 2 ORDER BY event_type, h""")),

    Q(
      "ts_bollinger_bands",
      "Bollinger bands — 7-day rolling mean ± 2σ envelope with " +
        "breach flags per event type: both moments come from exact " +
        "integer frame sums (Σx, Σx² in cents over ROWS BETWEEN 6 " +
        "PRECEDING), so the band edges are fixed-shape float " +
        "formulas over exact integers — no running float state, " +
        "deterministic at any parallelism. The volatility-envelope " +
        "monitor for any metric stream.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val w = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-6, Window.currentRow)
        val n = col("n").cast("double")
        val mean = col("sx").cast("double") / n
        val variance = (col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double") / n) / n
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum("y").over(w))
          .withColumn("sxx", sum(col("y").cast("decimal(38,0)") * col("y")).over(w))
          .filter(col("n") === 7)
          .select(col("event_type"), col("d").as("day"),
            round(col("y") / 100.0, 2).as("y"),
            round(mean / 100.0, 2).as("mid"),
            round((mean - sqrt(variance) * 2.0) / 100.0, 2).as("lower"),
            round((mean + sqrt(variance) * 2.0) / 100.0, 2).as("upper"),
            (col("y") > (mean + sqrt(variance) * 2.0)
              || col("y") < (mean - sqrt(variance) * 2.0)).as("breach"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, d, y,
            count(*) OVER w AS n,
            CAST(sum(y) OVER w AS BIGINT) AS sx,
            CAST(sum(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS sxx
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        f AS (SELECT event_type, d, y,
            CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
            (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS variance
          FROM r WHERE n = 7)
        SELECT event_type, d AS day,
          round(y / 100.0, 2) AS y,
          round(mean / 100.0, 2) AS mid,
          round((mean - sqrt(variance) * 2.0) / 100.0, 2) AS lower,
          round((mean + sqrt(variance) * 2.0) / 100.0, 2) AS upper,
          y > (mean + sqrt(variance) * 2.0)
            OR y < (mean - sqrt(variance) * 2.0) AS breach
        FROM f ORDER BY event_type, day""")),

    Q(
      "ts_theil_sen",
      "Theil–Sen robust trend per event type — the median of all " +
        "pairwise day-slopes (y_j−y_i)/(d_j−d_i): immune to the " +
        "outlier days that drag OLS (ts_rolling_regression) around. " +
        "Pairs come from a per-type self-join on the calendar-bounded " +
        "daily series (≤ C(30,2) slopes per series — quadratic in " +
        "SERIES LENGTH, which the calendar bounds, never in row " +
        "count); slopes are exact-integer ratios evaluated once into " +
        "doubles, the median read from the sorted slope array with " +
        "the shared middle-element arithmetic.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") && col("a.d") < col("b.d"))
          .select(col("a.event_type").as("event_type"),
            ((col("b.y") - col("a.y")).cast("double")
              / (col("b.d") - col("a.d"))).as("slope"))
        val n = size(col("arr"))
        pairs.groupBy("event_type")
          .agg(sort_array(collect_list(col("slope"))).as("arr"))
          .select(col("event_type"), n.as("n_pairs"),
            round(
              when(n % 2 === 1,
                element_at(col("arr"), ((n + 1) / 2).cast("int")))
                .otherwise((element_at(col("arr"), (n / 2).cast("int"))
                  + element_at(col("arr"), (n / 2 + 1).cast("int"))) / 2.0)
                / 100.0, 4).as("slope_per_day"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        pairs AS (SELECT a.event_type,
            CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS slope
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d),
        agg AS (SELECT event_type, list_sort(list(slope)) AS arr
          FROM pairs GROUP BY 1)
        SELECT event_type, CAST(len(arr) AS INT) AS n_pairs,
          round((CASE WHEN len(arr) % 2 = 1
              THEN arr[CAST((len(arr) + 1) / 2 AS INT)]
              ELSE (arr[CAST(len(arr) / 2 AS INT)]
                + arr[CAST(len(arr) / 2 + 1 AS INT)]) / 2.0 END)
            / 100.0, 4) AS slope_per_day
        FROM agg ORDER BY event_type""")),

    Q(
      "ts_backtest_snaive",
      "Forecast backtest — seasonal-naive (ŷ_d = y_{d−7}) vs naive " +
        "(ŷ_d = y_{d−1}) per event type, scored by MAE over every day " +
        "where both forecasts exist: the is-there-weekly-structure " +
        "decision a forecasting pipeline makes before fitting " +
        "anything. Daily totals and absolute errors are exact integer " +
        "cents (order-free sums); lagged values come from calendar " +
        "equi-joins, not row-offset windows, so gap days can never " +
        "silently misalign the comparison.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val j7 = daily.select(col("event_type"), (col("d") + 7).as("d"),
          col("y").as("y7"))
        val j1 = daily.select(col("event_type"), (col("d") + 1).as("d"),
          col("y").as("y1"))
        daily.join(j7, Seq("event_type", "d")).join(j1, Seq("event_type", "d"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(abs(col("y") - col("y7"))).as("e7"),
            sum(abs(col("y") - col("y1"))).as("e1"))
          .select(col("event_type"), col("n_days"),
            round(col("e7").cast("double") / col("n_days") / 100.0, 2).as("mae_snaive"),
            round(col("e1").cast("double") / col("n_days") / 100.0, 2).as("mae_naive"),
            (col("e7") < col("e1")).as("weekly_structure"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        j AS (SELECT a.event_type, a.d, a.y, b.y AS y7, c.y AS y1
          FROM daily a
          JOIN daily b ON b.event_type = a.event_type AND b.d = a.d - 7
          JOIN daily c ON c.event_type = a.event_type AND c.d = a.d - 1)
        SELECT event_type, count(*) AS n_days,
          round(CAST(sum(abs(y - y7)) AS DOUBLE) / count(*) / 100.0, 2) AS mae_snaive,
          round(CAST(sum(abs(y - y1)) AS DOUBLE) / count(*) / 100.0, 2) AS mae_naive,
          sum(abs(y - y7)) < sum(abs(y - y1)) AS weekly_structure
        FROM j GROUP BY event_type ORDER BY event_type""")),

    Q(
      "stats_two_proportion_z",
      "Two-proportion z-test (the A/B-test primitive): high-value-" +
        "purchase conversion (a purchase over 150) between the even " +
        "and odd user-id cohorts — " +
        "x/n per cohort from one conditional aggregation, pooled " +
        "rate, z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2)). Counts are exact " +
        "integers; the z expression is a fixed-shape float formula " +
        "over four integers, so the statistic is deterministic at " +
        "any parallelism and replayed term-for-term by the oracle.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .groupBy((col("user_id") % 2 === 0).as("cohort_even"))
          .agg(countDistinct("user_id").as("n_users"),
            countDistinct(when(col("event_type") === "purchase" && col("value") > 150,
              col("user_id"))).as("n_converted"))
        val wide = e.agg(
          max(when(col("cohort_even"), col("n_users"))).as("n1"),
          max(when(col("cohort_even"), col("n_converted"))).as("x1"),
          max(when(!col("cohort_even"), col("n_users"))).as("n2"),
          max(when(!col("cohort_even"), col("n_converted"))).as("x2"))
        val p1 = col("x1").cast("double") / col("n1")
        val p2 = col("x2").cast("double") / col("n2")
        val pp = (col("x1") + col("x2")).cast("double") / (col("n1") + col("n2"))
        wide.select(
          col("n1"), col("x1"), col("n2"), col("x2"),
          round(p1, 6).as("rate_even"),
          round(p2, 6).as("rate_odd"),
          round((p1 - p2) / sqrt(pp * (lit(1.0) - pp)
            * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 6).as("z_score"))
      },
      Some("""WITH c AS (SELECT user_id % 2 = 0 AS cohort_even,
            count(DISTINCT user_id) AS n_users,
            count(DISTINCT CASE WHEN event_type = 'purchase'
              AND value > 150 THEN user_id END) AS n_converted
          FROM events GROUP BY 1),
        wide AS (SELECT
            CAST(max(CASE WHEN cohort_even THEN n_users END) AS BIGINT) AS n1,
            CAST(max(CASE WHEN cohort_even THEN n_converted END) AS BIGINT) AS x1,
            CAST(max(CASE WHEN NOT cohort_even THEN n_users END) AS BIGINT) AS n2,
            CAST(max(CASE WHEN NOT cohort_even THEN n_converted END) AS BIGINT) AS x2
          FROM c)
        SELECT n1, x1, n2, x2,
          round(CAST(x1 AS DOUBLE) / n1, 6) AS rate_even,
          round(CAST(x2 AS DOUBLE) / n2, 6) AS rate_odd,
          round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
            / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
              * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
              * (1.0 / n1 + 1.0 / n2)), 6) AS z_score
        FROM wide""")),

    Q(
      "stats_welch_t",
      "Welch's unequal-variance t-test on order values between the " +
        "BUILDING and MACHINERY customer segments: means and sample " +
        "variances from exact integer-cent power sums (Σx, Σx² in " +
        "decimal — no float accumulation, any aggregation order), " +
        "t = (m1−m2)/√(s1²/n1 + s2²/n2) plus the Welch–Satterthwaite " +
        "degrees of freedom, both computed as fixed-shape float " +
        "formulas over the exact sums. One broadcast-dim join, one " +
        "hash aggregation.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val c = broadcast(Tables.t(s, dir, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_custkey"), col("c_mktsegment").as("seg")))
        val sums = o.join(c, col("o_custkey") === col("c_custkey"))
          .select(col("seg"), round(col("o_totalprice") * 100).cast("long").as("v"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"),
            sum(col("v").cast("decimal(38,0)")).as("s1"),
            sum(col("v").cast("decimal(38,0)") * col("v")).as("s2"))
          .agg(
            max(when(col("seg") === "BUILDING", col("n"))).as("n1"),
            max(when(col("seg") === "BUILDING", col("s1"))).as("sa1"),
            max(when(col("seg") === "BUILDING", col("s2"))).as("sb1"),
            max(when(col("seg") === "MACHINERY", col("n"))).as("n2"),
            max(when(col("seg") === "MACHINERY", col("s1"))).as("sa2"),
            max(when(col("seg") === "MACHINERY", col("s2"))).as("sb2"))
        // sample variance from power sums: (Σx² − (Σx)²/n) / (n−1), in cents²
        def m(sa: Column, n: Column) = sa.cast("double") / n
        def vr(sb: Column, sa: Column, n: Column) =
          (sb.cast("double") - sa.cast("double") * sa.cast("double") / n) /
            (n.cast("double") - 1)
        val v1 = vr(col("sb1"), col("sa1"), col("n1")) / col("n1")
        val v2 = vr(col("sb2"), col("sa2"), col("n2")) / col("n2")
        sums.select(col("n1"), col("n2"),
          round(m(col("sa1"), col("n1")) / 100.0, 4).as("mean1"),
          round(m(col("sa2"), col("n2")) / 100.0, 4).as("mean2"),
          round((m(col("sa1"), col("n1")) - m(col("sa2"), col("n2")))
            / sqrt(v1 + v2), 6).as("t_stat"),
          round((v1 + v2) * (v1 + v2)
            / (v1 * v1 / (col("n1").cast("double") - 1)
              + v2 * v2 / (col("n2").cast("double") - 1)), 2).as("welch_df"))
      },
      Some("""WITH j AS (SELECT c_mktsegment AS seg,
            CAST(round(o_totalprice * 100) AS BIGINT) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(v AS HUGEINT)) AS s1,
            sum(CAST(v AS HUGEINT) * v) AS s2
          FROM j GROUP BY 1),
        wide AS (SELECT
            max(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
            max(CASE WHEN seg = 'BUILDING' THEN s1 END) AS sa1,
            max(CASE WHEN seg = 'BUILDING' THEN s2 END) AS sb1,
            max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n2,
            max(CASE WHEN seg = 'MACHINERY' THEN s1 END) AS sa2,
            max(CASE WHEN seg = 'MACHINERY' THEN s2 END) AS sb2
          FROM g),
        f AS (SELECT n1, n2,
            CAST(sa1 AS DOUBLE) / n1 AS m1, CAST(sa2 AS DOUBLE) / n2 AS m2,
            (CAST(sb1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / n1)
              / (CAST(n1 AS DOUBLE) - 1) / n1 AS v1,
            (CAST(sb2 AS DOUBLE) - CAST(sa2 AS DOUBLE) * CAST(sa2 AS DOUBLE) / n2)
              / (CAST(n2 AS DOUBLE) - 1) / n2 AS v2
          FROM wide)
        SELECT n1, n2,
          round(m1 / 100.0, 4) AS mean1,
          round(m2 / 100.0, 4) AS mean2,
          round((m1 - m2) / sqrt(v1 + v2), 6) AS t_stat,
          round((v1 + v2) * (v1 + v2)
            / (v1 * v1 / (CAST(n1 AS DOUBLE) - 1)
              + v2 * v2 / (CAST(n2 AS DOUBLE) - 1)), 2) AS welch_df
        FROM f""")),

    Q(
      "profile_referential_integrity",
      "Referential-integrity audit across the star schema — orphaned " +
        "foreign keys counted by LEFT ANTI joins (lineitem→orders, " +
        "lineitem→part, orders→customer, customer→nation), plus each " +
        "child's row count for the violation rate: the constraint " +
        "check a lakehouse runs because parquet can't enforce FKs. " +
        "Anti joins are key-hashed (broadcast for dimension parents); " +
        "all counts exact.",
      (s, dir) => {
        def audit(name: String, child: org.apache.spark.sql.DataFrame,
            parent: org.apache.spark.sql.DataFrame, ck: String, pk: String) = {
          val orphans = child.join(parent.select(col(pk)),
            col(ck) === col(pk), "left_anti")
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
            .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
              round(col("n_orphans").cast("double") / col("n_child"), 6)
                .as("orphan_rate"))
        }
        val li = Tables.t(s, dir, "lineitem")
        audit("lineitem->orders", li, Tables.t(s, dir, "orders"),
            "l_orderkey", "o_orderkey")
          .unionAll(audit("lineitem->part", li, Tables.t(s, dir, "part"),
            "l_partkey", "p_partkey"))
          .unionAll(audit("orders->customer", Tables.t(s, dir, "orders"),
            Tables.t(s, dir, "customer"), "o_custkey", "c_custkey"))
          .unionAll(audit("customer->nation", Tables.t(s, dir, "customer"),
            Tables.t(s, dir, "nation"), "c_nationkey", "n_nationkey"))
          .orderBy("fk")
      },
      Some("""WITH a AS (SELECT 'lineitem->orders' AS fk,
            (SELECT count(*) FROM lineitem) AS n_child,
            (SELECT count(*) FROM lineitem l ANTI JOIN orders o
              ON l.l_orderkey = o.o_orderkey) AS n_orphans),
        b AS (SELECT 'lineitem->part',
            (SELECT count(*) FROM lineitem),
            (SELECT count(*) FROM lineitem l ANTI JOIN part p
              ON l.l_partkey = p.p_partkey)),
        c AS (SELECT 'orders->customer',
            (SELECT count(*) FROM orders),
            (SELECT count(*) FROM orders o ANTI JOIN customer c2
              ON o.o_custkey = c2.c_custkey)),
        d AS (SELECT 'customer->nation',
            (SELECT count(*) FROM customer),
            (SELECT count(*) FROM customer c2 ANTI JOIN nation n
              ON c2.c_nationkey = n.n_nationkey)),
        u AS (SELECT * FROM a UNION ALL SELECT * FROM b
          UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d)
        SELECT fk, n_child, n_orphans,
          round(CAST(n_orphans AS DOUBLE) / n_child, 6) AS orphan_rate
        FROM u ORDER BY fk""")),

    Q(
      "stats_corr_matrix",
      "Pairwise Pearson correlation matrix over the lineitem numeric " +
        "columns (quantity, price, discount, tax) — the feature-" +
        "redundancy screen before any modeling: every Σx, Σx², Σxy " +
        "comes from ONE hash aggregation over exact integer " +
        "fixed-point encodings (cents / basis points), correlations " +
        "assembled as fixed-shape float formulas per pair. One scan, " +
        "six pairs, zero float accumulation.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem").select(
          round(col("l_quantity")).cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("p"),
          round(col("l_discount") * 100).cast("long").as("d"),
          round(col("l_tax") * 100).cast("long").as("t"))
        def d38(c: Column) = c.cast("decimal(38,0)")
        val cols = Seq("q", "p", "d", "t")
        val sums = li.agg(count(lit(1)).as("n"),
          cols.flatMap(c => Seq(
            sum(col(c)).as(s"s_$c"),
            sum(d38(col(c)) * col(c)).as(s"ss_$c"))) ++
            (for (a <- cols; b <- cols if a < b)
              yield sum(d38(col(a)) * col(b)).as(s"sp_${a}_$b")): _*)
        def corr(a: String, b: String): Column = {
          val n = col("n").cast("double")
          val num = n * col(s"sp_${a}_$b").cast("double") -
            col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
          val da = n * col(s"ss_$a").cast("double") -
            col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
          val db = n * col(s"ss_$b").cast("double") -
            col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
          round(num / sqrt(da * db), 6)
        }
        val pairs = for (a <- cols; b <- cols if a < b) yield (a, b)
        sums.select(
          pairs.map { case (a, b) => corr(a, b).as(s"corr_${a}_$b") }: _*)
      },
      Some("""WITH li AS (SELECT
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
            CAST(round(l_discount * 100) AS BIGINT) AS d,
            CAST(round(l_tax * 100) AS BIGINT) AS t
          FROM lineitem),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(q) AS BIGINT) AS s_q, sum(CAST(q AS HUGEINT) * q) AS ss_q,
            CAST(sum(p) AS BIGINT) AS s_p, sum(CAST(p AS HUGEINT) * p) AS ss_p,
            CAST(sum(d) AS BIGINT) AS s_d, sum(CAST(d AS HUGEINT) * d) AS ss_d,
            CAST(sum(t) AS BIGINT) AS s_t, sum(CAST(t AS HUGEINT) * t) AS ss_t,
            sum(CAST(d AS HUGEINT) * p) AS sp_d_p,
            sum(CAST(d AS HUGEINT) * q) AS sp_d_q,
            sum(CAST(d AS HUGEINT) * t) AS sp_d_t,
            sum(CAST(p AS HUGEINT) * q) AS sp_p_q,
            sum(CAST(p AS HUGEINT) * t) AS sp_p_t,
            sum(CAST(q AS HUGEINT) * t) AS sp_q_t
          FROM li)
        SELECT
          round((CAST(n AS DOUBLE) * CAST(sp_d_p AS DOUBLE)
              - CAST(s_d AS DOUBLE) * CAST(s_p AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE)
                - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE)
                - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))), 6) AS corr_d_p,
          round((CAST(n AS DOUBLE) * CAST(sp_d_q AS DOUBLE)
              - CAST(s_d AS DOUBLE) * CAST(s_q AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE)
                - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE)
                - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))), 6) AS corr_d_q,
          round((CAST(n AS DOUBLE) * CAST(sp_d_t AS DOUBLE)
              - CAST(s_d AS DOUBLE) * CAST(s_t AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE)
                - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_t AS DOUBLE)
                - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE))), 6) AS corr_d_t,
          round((CAST(n AS DOUBLE) * CAST(sp_p_q AS DOUBLE)
              - CAST(s_p AS DOUBLE) * CAST(s_q AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE)
                - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE)
                - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))), 6) AS corr_p_q,
          round((CAST(n AS DOUBLE) * CAST(sp_p_t AS DOUBLE)
              - CAST(s_p AS DOUBLE) * CAST(s_t AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE)
                - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_t AS DOUBLE)
                - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE))), 6) AS corr_p_t,
          round((CAST(n AS DOUBLE) * CAST(sp_q_t AS DOUBLE)
              - CAST(s_q AS DOUBLE) * CAST(s_t AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE)
                - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_t AS DOUBLE)
                - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE))), 6) AS corr_q_t
        FROM s""")),

    Q(
      "profile_fd_violations",
      "Approximate functional-dependency audit — does X determine Y, " +
        "and how badly is it violated: for each candidate FD the " +
        "query counts determinant values with more than one distinct " +
        "dependent (one hash agg per FD; the countDistinct is exact, " +
        "keyed on the determinant so it scales as a plain group-by). " +
        "Candidates: part→supplier on lineitem (genuinely multi-" +
        "valued) and customer→priority on orders (behavioral, " +
        "partially violated). The schema-discovery pass a lakehouse " +
        "catalog runs before declaring constraints.",
      (s, dir) => {
        def fd(df: org.apache.spark.sql.DataFrame,
            name: String, lhs: String, rhs: String) =
          df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("k"))
            .agg(count(lit(1)).as("n_keys"),
              count(when(col("k") > 1, 1)).as("n_violating"))
            .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
              round(col("n_violating").cast("double") / col("n_keys"), 6)
                .as("violation_rate"))
        fd(Tables.t(s, dir, "lineitem"), "l_partkey->l_suppkey",
            "l_partkey", "l_suppkey")
          .unionAll(fd(Tables.t(s, dir, "orders"), "o_custkey->o_orderpriority",
            "o_custkey", "o_orderpriority"))
          .orderBy("fd")
      },
      Some("""WITH a AS (SELECT l_partkey, count(DISTINCT l_suppkey) AS k
          FROM lineitem GROUP BY 1),
        b AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS k
          FROM orders GROUP BY 1),
        ra AS (SELECT 'l_partkey->l_suppkey' AS fd,
            count(*) AS n_keys,
            count(CASE WHEN k > 1 THEN 1 END) AS n_violating FROM a),
        rb AS (SELECT 'o_custkey->o_orderpriority' AS fd,
            count(*) AS n_keys,
            count(CASE WHEN k > 1 THEN 1 END) AS n_violating FROM b)
        SELECT fd, n_keys, n_violating,
          round(CAST(n_violating AS DOUBLE) / n_keys, 6) AS violation_rate
        FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
        ORDER BY fd""")),

    Q(
      "profile_join_explosion",
      "Join-blowup estimator — predict a self-join's output size from " +
        "the key histogram BEFORE running it (Σ c·(c−1)/2 pairs over " +
        "per-key counts): the planning diagnostic that decides " +
        "between a straight join, salting, or a rethink, computed " +
        "with one hash aggregation over the join column only. " +
        "Reports the total predicted pairs, the hottest key's " +
        "contribution, and its share — all exact integers except the " +
        "final share division.",
      (s, dir) => {
        val cnt = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
          .withColumn("pairs", (col("c").cast("decimal(38,0)") * (col("c") - 1) / 2)
            .cast("decimal(38,0)"))
        val top = cnt.orderBy(col("pairs").desc, col("l_partkey")).limit(1)
          .select(col("l_partkey").as("top_key"), col("pairs").as("top_pairs"))
        val tot = cnt.agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          sum("pairs").as("predicted_pairs"))
        tot.crossJoin(broadcast(top))
          .select(col("n_keys"), col("n_rows"),
            col("predicted_pairs").cast("long").as("predicted_pairs"),
            col("top_key"), col("top_pairs").cast("long").as("top_pairs"),
            round(col("top_pairs").cast("double")
              / col("predicted_pairs").cast("double"), 6).as("top_share"))
      },
      Some("""WITH cnt AS (SELECT l_partkey, count(*) AS c
          FROM lineitem GROUP BY 1),
        p AS (SELECT l_partkey, c,
            CAST(CAST(c AS HUGEINT) * (c - 1) / 2 AS HUGEINT) AS pairs
          FROM cnt),
        top AS (SELECT l_partkey AS top_key, pairs AS top_pairs
          FROM p ORDER BY pairs DESC, l_partkey LIMIT 1),
        tot AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
            CAST(sum(pairs) AS HUGEINT) AS predicted_pairs FROM p)
        SELECT n_keys, n_rows,
          CAST(predicted_pairs AS BIGINT) AS predicted_pairs,
          top_key, CAST(top_pairs AS BIGINT) AS top_pairs,
          round(CAST(top_pairs AS DOUBLE) / CAST(predicted_pairs AS DOUBLE), 6)
            AS top_share
        FROM tot CROSS JOIN top""")),

    Q(
      "window_running_distinct",
      "Running count-distinct per key — how many distinct event types " +
        "each user has touched as of every event, via the first-" +
        "occurrence-flag trick: row_number over (user, type) marks " +
        "the first sighting, a running sum over event time counts " +
        "them — two partitioned windows, no set state, which is why " +
        "it scales where a naive collect_set-per-frame cannot. The " +
        "breadth-of-engagement signal at any point in time.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events").filter(col("user_id") < 40)
          .select(col("event_id"), col("user_id"), col("event_type"),
            Tables.epochUs(col("ts")).as("eus"))
        val wFirst = Window.partitionBy("user_id", "event_type")
          .orderBy("eus", "event_id")
        val wRun = Window.partitionBy("user_id").orderBy("eus", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("first_seen",
            when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
          .withColumn("n_types_seen", sum("first_seen").over(wRun))
          .select(col("event_id"), col("user_id"), col("n_types_seen"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS eus
          FROM events WHERE user_id < 40),
        f AS (SELECT event_id, user_id, eus,
            CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY eus, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
          FROM e)
        SELECT event_id, user_id,
          CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY eus, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_types_seen
        FROM f ORDER BY event_id""")),

    Q(
      "stats_gini",
      "Gini coefficient of order value per order priority (the " +
        "inequality/concentration measure for spend, token, or " +
        "traffic distributions). Prices are fixed to exact integer " +
        "cents at the scan, ranked per group by a partitioned window " +
        "(ties broken by key — the Σ i·xᵢ sum is invariant under " +
        "tie order anyway), and both sums run in decimal — the whole " +
        "computation is exact integer arithmetic until the single " +
        "final division, so it is deterministic at any parallelism.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select(col("o_orderpriority").as("prio"),
            round(col("o_totalprice") * 100).cast("long").as("cents"),
            col("o_orderkey"))
        val w = Window.partitionBy("prio").orderBy(col("cents"), col("o_orderkey"))
        o.withColumn("i", row_number().over(w).cast("long"))
          .groupBy("prio")
          .agg(count(lit(1)).as("n"),
            sum(col("cents").cast("decimal(38,0)") * col("i")).as("s"),
            sum(col("cents").cast("decimal(38,0)")).as("t"))
          .select(col("prio"), col("n"),
            round(lit(2.0) * col("s").cast("double")
                / (col("n").cast("double") * col("t").cast("double"))
              - (col("n") + 1).cast("double") / col("n").cast("double"),
              6).as("gini"))
          .orderBy("prio")
      },
      Some("""WITH o AS (SELECT o_orderpriority AS prio,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
          FROM orders),
        r AS (SELECT prio, cents,
            CAST(row_number() OVER (PARTITION BY prio
              ORDER BY cents, o_orderkey) AS BIGINT) AS i FROM o)
        SELECT prio, CAST(count(*) AS BIGINT) AS n,
          round(2.0 * CAST(sum(CAST(cents AS DECIMAL(38,0)) * i) AS DOUBLE)
              / (CAST(count(*) AS DOUBLE)
                * CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE))
            - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE),
            6) AS gini
        FROM r GROUP BY prio ORDER BY prio""")),

    Q(
      "profile_benford",
      "Benford's-law audit of line-item prices: observed first-" +
        "significant-digit distribution vs the expected log10(1+1/d) " +
        "— the fraud/corruption screen for any monetary or count " +
        "column. The digit is taken from the decimal string of the " +
        "exact integer cents (identical formatting in both engines — " +
        "no float log10 edge cases at powers of ten); one hash " +
        "aggregation to 9 rows, total joined back by broadcast.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
          .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
          .filter(col("cents") > 0)
        val obs = li
          .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val tot = obs.agg(sum("n").as("total"))
        obs.crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            round(col("n").cast("double") / col("total"), 6).as("obs_pct"),
            round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6).as("benford_pct"))
          .orderBy("digit")
      },
      Some("""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem WHERE round(l_extendedprice * 100) > 0),
        obs AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
            count(*) AS n FROM c GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs)
        SELECT digit, n,
          round(CAST(n AS DOUBLE) / total, 6) AS obs_pct,
          round(log10(1.0 + 1.0 / digit), 6) AS benford_pct
        FROM obs, t ORDER BY digit""")),

    Q(
      "ts_interpolate_linear",
      "Linear interpolation of a sparse daily series onto a dense " +
        "spine (the gap-fill upgrade of ts_gapfill_locf): per event " +
        "type, days with no high-value activity are filled by the " +
        "line between the nearest known neighbors — prev/next value " +
        "and day via IGNORE NULLS window navigation, edges falling " +
        "back to nearest-known. Spine generated per type partition " +
        "(explode(sequence)), windows partitioned by type; the known " +
        "daily mean is a sorted fold so the interpolation inputs are " +
        "bit-reproducible.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events").filter(col("value") > 200)
        val daily = e
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
          .agg((sfold(col("value")) / count(lit(1))).as("known"))
        val spine = e.select("event_type").distinct()
          .select(col("event_type"), explode(sequence(lit(1), lit(30))).as("d"))
        val wPrev = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine.join(daily, Seq("event_type", "d"), "left")
          .withColumn("pv", last(col("known"), ignoreNulls = true).over(wPrev))
          .withColumn("pd", last(when(col("known").isNotNull, col("d")), ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("known"), ignoreNulls = true).over(wNext))
          .withColumn("nd", first(when(col("known").isNotNull, col("d")), ignoreNulls = true).over(wNext))
          .select(col("event_type"), col("d").as("day"),
            round(col("known"), 4).as("known"),
            round(
              when(col("known").isNotNull, col("known"))
                .when(col("pv").isNull, col("nv"))
                .when(col("nv").isNull, col("pv"))
                .otherwise(col("pv") + (col("nv") - col("pv"))
                  * (col("d") - col("pd")) / (col("nd") - col("pd"))),
              4).as("interp"))
          .orderBy("event_type", "day")
      },
      Some("""WITH e AS (SELECT event_type,
            day(CAST(ts AS TIMESTAMP)) AS d, value
          FROM events WHERE value > 200),
        daily AS (SELECT event_type, d,
            list_reduce(list_sort(list(value)), (a, b) -> a + b) / count(*) AS known
          FROM e GROUP BY 1, 2),
        types AS (SELECT DISTINCT event_type FROM e),
        spine AS (SELECT event_type, CAST(unnest(range(1, 31)) AS INT) AS d FROM types),
        nav AS (SELECT s.event_type, s.d, daily.known,
            last_value(known IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            last_value(CASE WHEN known IS NOT NULL THEN s.d END IGNORE NULLS)
              OVER (PARTITION BY s.event_type ORDER BY s.d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
            first_value(known IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.d
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN known IS NOT NULL THEN s.d END IGNORE NULLS)
              OVER (PARTITION BY s.event_type ORDER BY s.d
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM spine s LEFT JOIN daily ON s.event_type = daily.event_type AND s.d = daily.d)
        SELECT event_type, d AS day, round(known, 4) AS known,
          round(CASE WHEN known IS NOT NULL THEN known
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv) * (d - pd) / (nd - pd) END, 4) AS interp
        FROM nav ORDER BY event_type, day""")),

    Q(
      "ts_cusum_changepoint",
      "CUSUM change-point detection per event type: the day where the " +
        "cumulative deviation of daily volume from the series mean " +
        "peaks. Daily totals are exact integer cents (order-free " +
        "sums); the deviation is kept in cross-multiplied integer " +
        "form |n·S_t − t·T| (no float mean subtraction, no running " +
        "double sum), so the argmax is exact and deterministic — the " +
        "single division to a reportable double happens after the " +
        "pick. Windows partitioned by type; series totals join back " +
        "by broadcast. At 100 TB the longs upgrade to decimal(38,0) " +
        "(the in-repo agg_decimal_money pattern).",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
        val daily = e.groupBy("event_type", "d").agg(sum("cents").as("dc"))
        val tot = daily.groupBy("event_type")
          .agg(sum("dc").as("tc"), count(lit(1)).as("nd"))
        val wSeq = Window.partitionBy("event_type").orderBy("d")
        val wCum = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPick = Window.partitionBy("event_type").orderBy(col("dev").desc, col("d"))
        daily.join(broadcast(tot), Seq("event_type"))
          .withColumn("t", row_number().over(wSeq).cast("long"))
          .withColumn("sc", sum("dc").over(wCum))
          .withColumn("dev", abs(col("nd") * col("sc") - col("t") * col("tc")))
          .withColumn("rk", row_number().over(wPick))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("d").as("cp_day"),
            round(col("dev").cast("double")
              / (col("nd").cast("double") * 100.0), 4).as("max_dev"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        daily AS (SELECT event_type, d, CAST(sum(cents) AS BIGINT) AS dc
          FROM e GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(sum(dc) AS BIGINT) AS tc,
            CAST(count(*) AS BIGINT) AS nd FROM daily GROUP BY 1),
        cum AS (SELECT daily.event_type, d, nd, tc,
            CAST(row_number() OVER (PARTITION BY daily.event_type ORDER BY d) AS BIGINT) AS t,
            CAST(sum(dc) OVER (PARTITION BY daily.event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sc
          FROM daily JOIN tot USING (event_type)),
        dev AS (SELECT event_type, d, nd, abs(nd * sc - t * tc) AS dev FROM cum),
        pick AS (SELECT event_type, d, nd, dev,
            row_number() OVER (PARTITION BY event_type ORDER BY dev DESC, d) AS rk
          FROM dev)
        SELECT event_type, d AS cp_day,
          round(CAST(dev AS DOUBLE) / (CAST(nd AS DOUBLE) * 100.0), 4) AS max_dev
        FROM pick WHERE rk = 1 ORDER BY event_type""")),

    Q(
      "ts_downsample_lttb",
      "Largest-Triangle-Three-Buckets downsampling (the dashboard/" +
        "preview decimator) of each event type's daily series, " +
        "parallel variant: buckets of 5 days, neighbor anchors are " +
        "the adjacent BUCKET AVERAGES (not the sequentially-selected " +
        "point, which would serialize the scan), each bucket keeps " +
        "the point maximizing the triangle area against its anchors; " +
        "first/last buckets keep the first/last point, as in the " +
        "original algorithm. Everything is per-(type,bucket) " +
        "partitioned — no sequential dependency, so the same plan " +
        "decimates a billion-point series. Bucket/daily means are " +
        "sorted folds for bit-stable areas.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
          .agg((sfold(col("value")) / count(lit(1))).as("y"))
        val bk = daily.withColumn("b", floor((col("d") - 1) / 5.0).cast("int"))
        val wB = Window.partitionBy("event_type").orderBy("b")
        val an = bk.groupBy("event_type", "b")
          .agg((sum(col("d")).cast("double") / count(lit(1))).as("bxv"),
            (sfold(col("y")) / count(lit(1))).as("byv"))
          .withColumn("lbx", lag("bxv", 1).over(wB))
          .withColumn("lby", lag("byv", 1).over(wB))
          .withColumn("nbx", lead("bxv", 1).over(wB))
          .withColumn("nby", lead("byv", 1).over(wB))
          .select("event_type", "b", "lbx", "lby", "nbx", "nby")
        val wT = Window.partitionBy("event_type")
        val wPick = Window.partitionBy("event_type", "b").orderBy(col("ord"), col("d"))
        bk.join(broadcast(an), Seq("event_type", "b"))
          .withColumn("maxb", max("b").over(wT))
          .withColumn("area", abs((col("lbx") - col("nbx")) * (col("y") - col("lby"))
            - (col("lbx") - col("d")) * (col("nby") - col("lby"))))
          .withColumn("ord",
            when(col("b") === 0, col("d").cast("double"))
              .when(col("b") === col("maxb"), col("d") * -1.0)
              .otherwise(col("area") * -1.0))
          .withColumn("rk", row_number().over(wPick))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("d").as("day"), round(col("y"), 4).as("y"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            list_reduce(list_sort(list(value)), (a, b) -> a + b) / count(*) AS y
          FROM events GROUP BY 1, 2),
        bk AS (SELECT *, CAST(floor((d - 1) / 5.0) AS INT) AS b FROM daily),
        av AS (SELECT event_type, b, CAST(sum(d) AS DOUBLE) / count(*) AS bxv,
            list_reduce(list_sort(list(y)), (a, b) -> a + b) / count(*) AS byv
          FROM bk GROUP BY 1, 2),
        an AS (SELECT event_type, b,
            lag(bxv) OVER w AS lbx, lag(byv) OVER w AS lby,
            lead(bxv) OVER w AS nbx, lead(byv) OVER w AS nby
          FROM av WINDOW w AS (PARTITION BY event_type ORDER BY b)),
        pts AS (SELECT k.event_type, k.d, k.y, k.b, lbx, lby, nbx, nby,
            max(k.b) OVER (PARTITION BY k.event_type) AS maxb,
            abs((lbx - nbx) * (k.y - lby) - (lbx - k.d) * (nby - lby)) AS area
          FROM bk k JOIN an ON k.event_type = an.event_type AND k.b = an.b),
        pick AS (SELECT *, row_number() OVER (PARTITION BY event_type, b ORDER BY
            CASE WHEN b = 0 THEN CAST(d AS DOUBLE)
              WHEN b = maxb THEN d * -1.0
              ELSE area * -1.0 END, d) AS rk FROM pts)
        SELECT event_type, d AS day, round(y, 4) AS y
        FROM pick WHERE rk = 1 ORDER BY event_type, day""")),

    Q(
      "stats_spearman",
      "Spearman rank correlation per event type between daily volume " +
        "(event count) and daily load (cent-exact value sum) — the " +
        "monotone-association test that survives the outliers Pearson " +
        "chokes on. Average ranks with the tie-midpoint rule are kept " +
        "in INTEGERS by doubling (2·rank + ties − 1); the correlation " +
        "is then Pearson over those integer ranks, assembled from six " +
        "exact integer power sums per type and evaluated into a " +
        "double exactly once — no float accumulation anywhere. The " +
        "ranking windows partition by event_type over a " +
        "calendar-bounded series (≤31 rows per type), so no " +
        "unpartitioned window and no unbounded per-group state.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d")
          .agg(count(lit(1)).as("nv"), sum("cents").as("cv"))
        // doubled average rank (integer): 2*min_rank + ties - 1
        def drank(cn: String): Column =
          (rank().over(Window.partitionBy("event_type").orderBy(col(cn))) * 2
            + count(lit(1)).over(Window.partitionBy("event_type", cn)) - 1)
        val ranked = daily
          .withColumn("rx", drank("nv").cast("long"))
          .withColumn("ry", drank("cv").cast("long"))
        val n = col("n").cast("double")
        val num = n * col("s12") - col("s1").cast("double") * col("s2")
        val den = sqrt(n * col("s11") - col("s1").cast("double") * col("s1"))
          .multiply(sqrt(n * col("s22") - col("s2").cast("double") * col("s2")))
        ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("rx").as("s1"), sum("ry").as("s2"),
            sum(col("rx") * col("rx")).as("s11"),
            sum(col("ry") * col("ry")).as("s22"),
            sum(col("rx") * col("ry")).as("s12"))
          .select(col("event_type"), col("n").as("n_days"),
            round(num / den, 4).as("rho"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            count(*) AS nv,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cv
          FROM events GROUP BY 1, 2),
        rk AS (SELECT event_type, d, nv, cv,
            CAST(rank() OVER (PARTITION BY event_type ORDER BY nv) * 2
              + count(*) OVER (PARTITION BY event_type, nv) - 1 AS BIGINT) AS rx,
            CAST(rank() OVER (PARTITION BY event_type ORDER BY cv) * 2
              + count(*) OVER (PARTITION BY event_type, cv) - 1 AS BIGINT) AS ry
          FROM daily),
        ps AS (SELECT event_type, count(*) AS n,
            CAST(sum(rx) AS BIGINT) AS s1, CAST(sum(ry) AS BIGINT) AS s2,
            sum(rx * rx) AS s11, sum(ry * ry) AS s22,
            sum(rx * ry) AS s12
          FROM rk GROUP BY 1)
        SELECT event_type, n AS n_days,
          round((CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
            / (sqrt(CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
               * sqrt(CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)),
            4) AS rho
        FROM ps ORDER BY event_type""")),

    Q(
      "stats_anova",
      "One-way ANOVA across event types on event value — the k-group " +
        "generalization of the Welch/t pair tests already in the " +
        "roster: between/within sums of squares from per-group exact " +
        "cent sums (n, Σx, Σx² with the square sum in DECIMAL so " +
        "100 TB of cents cannot overflow), F and effect size η² " +
        "evaluated once in double. One map-side-combinable hash " +
        "aggregation to k rows, then a k-row reduction whose only " +
        "float summation (Σ s_g²/n_g) runs through the shared " +
        "sorted-fold so partial-aggregation order can never wobble " +
        "the last ulp.",
      (s, dir) => {
        val g = Tables.t(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("s"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("ss"))
        val t = g.agg(
          count(lit(1)).as("k"), sum("n").as("nn"), sum("s").as("st"),
          sum("ss").as("sst"),
          sfold(col("s").cast("double") * col("s") / col("n")).as("sg"))
        val nD = col("nn").cast("double")
        val ssb = col("sg") - col("st").cast("double") * col("st") / nD
        val ssw = col("sst").cast("double") - col("sg")
        val sstot = (col("sst").cast("double")
          - col("st").cast("double") * col("st") / nD)
        val f = (ssb / (col("k") - 1)) / (ssw / (col("nn") - col("k")))
        t.select(col("k"), col("nn").as("n"),
            round(f, 4).as("f_stat"), round(ssb / sstot, 6).as("eta_sq"))
          .orderBy("k")
      },
      Some("""WITH g AS (SELECT event_type, count(*) AS n,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
            CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
              * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS ss
          FROM events GROUP BY 1),
        t AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
            CAST(sum(s) AS BIGINT) AS st,
            CAST(sum(ss) AS HUGEINT) AS sst,
            list_reduce(list_sort(list(CAST(s AS DOUBLE) * s / n)),
              (a, b) -> a + b) AS sg
          FROM g)
        SELECT k, CAST(nn AS BIGINT) AS n,
          round(((sg - CAST(st AS DOUBLE) * st / nn) / (k - 1))
            / ((CAST(sst AS DOUBLE) - sg) / (nn - k)), 4) AS f_stat,
          round((sg - CAST(st AS DOUBLE) * st / nn)
            / (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / nn),
            6) AS eta_sq
        FROM t ORDER BY k""")),

    Q(
      "stats_cramers_v",
      "Cramér's V association strength for the event-type × ISO-" +
        "weekday contingency table — the bounded [0,1] companion to " +
        "stats_chi2 that stays comparable across table shapes. Cell/" +
        "margin counts are exact integers from one hash aggregation " +
        "(≤ |types|·7 cells); expected counts and the χ² cell terms " +
        "are fixed-shape float formulas summed through the sorted " +
        "fold, so the only float accumulation is order-pinned. " +
        "Margins ride back onto cells via broadcast-sized joins.",
      (s, dir) => {
        val cells = Tables.t(s, dir, "events")
          .select(col("event_type"), (weekday(col("ts")) + 1).as("dow"))
          .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
        val rt = cells.groupBy("event_type").agg(sum("n").as("rn"))
        val ct = cells.groupBy("dow").agg(sum("n").as("cn"))
        val tot = cells.agg(sum("n").as("nn"),
          countDistinct("event_type").as("r"), countDistinct("dow").as("c"))
        val e = col("rn").cast("double") * col("cn") / col("nn")
        val joined = cells
          .join(broadcast(rt), "event_type")
          .join(broadcast(ct), "dow")
          .crossJoin(broadcast(tot))
        joined
          .select(col("r"), col("c"), col("nn"),
            ((col("n") - e) * (col("n") - e) / e).as("term"))
          .groupBy("r", "c", "nn")
          .agg(sfold(col("term")).as("chi2"))
          .select(((col("r") - 1) * (col("c") - 1)).as("dof"),
            round(col("chi2"), 4).as("chi2"),
            round(sqrt(col("chi2") / (col("nn")
              * least(col("r") - 1, col("c") - 1))), 4).as("v"))
          .orderBy("dof")
      },
      Some("""WITH cells AS (SELECT event_type,
            CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
            count(*) AS n
          FROM events GROUP BY 1, 2),
        rt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rn
          FROM cells GROUP BY 1),
        ct AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cn
          FROM cells GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
            count(DISTINCT event_type) AS r,
            count(DISTINCT dow) AS c FROM cells),
        terms AS (SELECT tot.r, tot.c, tot.nn,
            (cells.n - CAST(rt.rn AS DOUBLE) * ct.cn / tot.nn)
              * (cells.n - CAST(rt.rn AS DOUBLE) * ct.cn / tot.nn)
              / (CAST(rt.rn AS DOUBLE) * ct.cn / tot.nn) AS term
          FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
            CROSS JOIN tot),
        agg AS (SELECT r, c, nn,
            list_reduce(list_sort(list(term)), (a, b) -> a + b) AS chi2
          FROM terms GROUP BY 1, 2, 3)
        SELECT (r - 1) * (c - 1) AS dof, round(chi2, 4) AS chi2,
          round(sqrt(chi2 / (nn * least(r - 1, c - 1))), 4) AS v
        FROM agg ORDER BY dof""")),

    Q(
      "stats_cohens_d",
      "Cohen's d effect size between purchase and click event values " +
        "— the practical-significance companion to stats_welch_t " +
        "(a tiny p-value on 100 TB of rows says nothing about " +
        "magnitude). Both groups reduce in ONE conditional hash " +
        "aggregation (no second scan, no join): n/Σx/Σx² per arm in " +
        "exact cents with DECIMAL square sums, pooled variance and d " +
        "evaluated once in double.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
        def side(t: String, c: Column): Column =
          sum(when(col("event_type") === t, c).otherwise(lit(0)))
        val a = e.agg(
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n1"),
          side("purchase", col("c")).as("s1"),
          side("purchase", col("c").cast("decimal(38,0)") * col("c")).as("ss1"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n2"),
          side("click", col("c")).as("s2"),
          side("click", col("c").cast("decimal(38,0)") * col("c")).as("ss2"))
        def v(n: Column, sc: Column, ss: Column): Column =
          (ss.cast("double") - sc.cast("double") * sc / n) / (n - 1)
        val n1 = col("n1"); val n2 = col("n2")
        val sp2 = ((n1 - 1) * v(n1, col("s1"), col("ss1"))
          + (n2 - 1) * v(n2, col("s2"), col("ss2"))) / (n1 + n2 - 2)
        val d = (col("s1").cast("double") / n1 - col("s2").cast("double") / n2) /
          sqrt(sp2)
        a.select(n1, n2, round(d, 4).as("cohens_d")).orderBy("n1")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE event_type IN ('purchase', 'click')),
        a AS (SELECT
            sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
            sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS s1,
            sum(CASE WHEN event_type = 'purchase'
              THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ss1,
            sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2,
            sum(CASE WHEN event_type = 'click' THEN c ELSE 0 END) AS s2,
            sum(CASE WHEN event_type = 'click'
              THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ss2
          FROM e)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
            / sqrt((
              (n1 - 1) * ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                / (n1 - 1))
              + (n2 - 1) * ((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                / (n2 - 1))) / (n1 + n2 - 2)), 4) AS cohens_d
        FROM a ORDER BY n1""")),

    Q(
      "stats_levene",
      "Brown–Forsythe (median-centered Levene) test for variance " +
        "homogeneity across event types — the gate before trusting " +
        "pooled-variance tests like stats_anova. Per-group medians " +
        "come from the weighted-median idiom: counts per DISTINCT " +
        "cent value (bounded by the value domain, not row count), a " +
        "cumulative window per type over those distinct values, " +
        "smallest value reaching half. Absolute deviations from the " +
        "broadcast medians stay integer cents; the F statistic on " +
        "them reuses the exact-power-sum ANOVA spine.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
        val vc = e.groupBy("event_type", "c").agg(count(lit(1)).as("w"))
        val cum = Window.partitionBy("event_type").orderBy("c")
        val med = vc
          .withColumn("cw", sum("w").over(cum))
          .withColumn("tw", sum("w").over(Window.partitionBy("event_type")))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy("event_type").agg(min("c").as("med"))
        val dev = e.join(broadcast(med), "event_type")
          .select(col("event_type"), abs(col("c") - col("med")).as("z"))
        val g = dev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("z").as("s"),
            sum(col("z").cast("decimal(38,0)") * col("z")).as("ss"))
        val t = g.agg(count(lit(1)).as("k"), sum("n").as("nn"),
          sum("s").as("st"), sum("ss").as("sst"),
          sfold(col("s").cast("double") * col("s") / col("n")).as("sg"))
        val nD = col("nn").cast("double")
        val ssb = col("sg") - col("st").cast("double") * col("st") / nD
        val ssw = col("sst").cast("double") - col("sg")
        val f = (ssb / (col("k") - 1)) / (ssw / (col("nn") - col("k")))
        t.select(col("k"), col("nn").as("n"), round(f, 4).as("f_stat"))
          .orderBy("k")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c FROM events),
        vc AS (SELECT event_type, c, count(*) AS w FROM e GROUP BY 1, 2),
        cm AS (SELECT event_type, c,
            sum(w) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
            sum(w) OVER (PARTITION BY event_type) AS tw
          FROM vc),
        med AS (SELECT event_type, min(c) AS med FROM cm
          WHERE cw * 2 >= tw GROUP BY 1),
        dev AS (SELECT e.event_type, abs(e.c - med.med) AS z
          FROM e JOIN med USING (event_type)),
        g AS (SELECT event_type, count(*) AS n,
            CAST(sum(z) AS BIGINT) AS s,
            sum(CAST(z AS HUGEINT) * z) AS ss
          FROM dev GROUP BY 1),
        t AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
            CAST(sum(s) AS BIGINT) AS st,
            CAST(sum(ss) AS HUGEINT) AS sst,
            list_reduce(list_sort(list(CAST(s AS DOUBLE) * s / n)),
              (a, b) -> a + b) AS sg
          FROM g)
        SELECT k, CAST(nn AS BIGINT) AS n,
          round(((sg - CAST(st AS DOUBLE) * st / nn) / (k - 1))
            / ((CAST(sst AS DOUBLE) - sg) / (nn - k)), 4) AS f_stat
        FROM t ORDER BY k""")),

    Q(
      "stats_kendall",
      "Kendall τ-b between per-nation customer count and per-nation " +
        "mean order value — rank agreement over a DIMENSION-sized " +
        "table (the pairwise stage is quadratic in |nation| ≈ 25, " +
        "never in fact-row count; the fact scans reduce to one row " +
        "per nation first). Mean-order ties are decided by exact " +
        "cross-multiplication (s_a·n_b vs s_b·n_a in DECIMAL), so no " +
        "float-equality wobble can flip a concordance; τ-b's tie " +
        "corrections use the standard n0/n1/n2 pair counts.",
      (s, dir) => {
        val cust = Tables.t(s, dir, "customer")
          .groupBy("c_nationkey").agg(count(lit(1)).as("x"))
        val ords = Tables.t(s, dir, "orders")
          .join(Tables.t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("sy"),
            count(lit(1)).as("ny"))
        val na = cust.join(ords, "c_nationkey")
        val p = na.as("a").join(broadcast(na.as("b")),
          col("a.c_nationkey") < col("b.c_nationkey"))
        val dx = col("a.x") - col("b.x")
        val dy = (col("a.sy").cast("decimal(38,0)") * col("b.ny")
          - col("b.sy").cast("decimal(38,0)") * col("a.ny"))
        val cls = p.select(
          when(dx === 0, lit("tx")).when(dy === 0, lit("ty"))
            .when((dx > 0 && dy > 0) || (dx < 0 && dy < 0), lit("c"))
            .otherwise(lit("d")).as("cl"))
        val agg = cls.agg(
          sum(when(col("cl") === "c", 1).otherwise(0)).as("cc"),
          sum(when(col("cl") === "d", 1).otherwise(0)).as("dd"),
          sum(when(col("cl") === "tx", 1).otherwise(0)).as("tx"),
          sum(when(col("cl") === "ty", 1).otherwise(0)).as("ty"),
          count(lit(1)).as("n0"))
        val tau = (col("cc") - col("dd")).cast("double") /
          sqrt((col("n0") - col("tx")).cast("double")
            * (col("n0") - col("ty")))
        agg.select(col("n0").as("n_pairs"), col("cc").as("concordant"),
            col("dd").as("discordant"), round(tau, 4).as("tau_b"))
          .orderBy("n_pairs")
      },
      Some("""WITH cust AS (SELECT c_nationkey, count(*) AS x
          FROM customer GROUP BY 1),
        ords AS (SELECT c_nationkey,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS sy,
            count(*) AS ny
          FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        na AS (SELECT cust.c_nationkey, x, sy, ny
          FROM cust JOIN ords USING (c_nationkey)),
        p AS (SELECT a.x - b.x AS dx,
            CAST(a.sy AS HUGEINT) * b.ny - CAST(b.sy AS HUGEINT) * a.ny AS dy
          FROM na a JOIN na b ON a.c_nationkey < b.c_nationkey),
        cls AS (SELECT CASE WHEN dx = 0 THEN 'tx' WHEN dy = 0 THEN 'ty'
            WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0) THEN 'c'
            ELSE 'd' END AS cl FROM p),
        agg AS (SELECT
            sum(CASE WHEN cl = 'c' THEN 1 ELSE 0 END) AS cc,
            sum(CASE WHEN cl = 'd' THEN 1 ELSE 0 END) AS dd,
            sum(CASE WHEN cl = 'tx' THEN 1 ELSE 0 END) AS tx,
            sum(CASE WHEN cl = 'ty' THEN 1 ELSE 0 END) AS ty,
            count(*) AS n0
          FROM cls)
        SELECT n0 AS n_pairs, CAST(cc AS BIGINT) AS concordant,
          CAST(dd AS BIGINT) AS discordant,
          round(CAST(cc - dd AS DOUBLE)
            / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty)), 4) AS tau_b
        FROM agg ORDER BY n_pairs""")),

    Q(
      "ts_drawdown",
      "Maximum drawdown per event type — the largest peak-to-trough " +
        "drop of the cumulative daily value curve (the risk metric " +
        "behind circuit-breakers and budget alarms). Cumulative sum " +
        "and running peak are integer-cent windows PARTITIONED by " +
        "event type over a calendar-bounded series; drawdown stays " +
        "integer; the per-type argmax (earliest trough day wins " +
        "ties) is a WindowGroupLimit-able row_number pick.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val w = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dd = daily
          .withColumn("cum", sum("y").over(w))
          .withColumn("peak", max("cum").over(w))
          .withColumn("dd", col("peak") - col("cum"))
        dd.withColumn("rk", row_number().over(
            Window.partitionBy("event_type")
              .orderBy(col("dd").desc, col("d"))))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("d").as("trough_day"),
            round(col("dd") / 100.0, 2).as("max_drawdown"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        c0 AS (SELECT event_type, d, sum(y) OVER w AS cum
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        c AS (SELECT event_type, d, cum, max(cum) OVER w AS peak
          FROM c0
          WINDOW w AS (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        dd AS (SELECT event_type, d, peak - cum AS dd,
            row_number() OVER (PARTITION BY event_type
              ORDER BY peak - cum DESC, d) AS rk
          FROM c)
        SELECT event_type, d AS trough_day,
          round(dd / 100.0, 2) AS max_drawdown
        FROM dd WHERE rk = 1 ORDER BY event_type""")),

    Q(
      "ts_sma_crossover",
      "Moving-average crossover signals per event type — the days " +
        "where the 3-day SMA of daily value crosses the 7-day SMA " +
        "(golden/death cross trading-desk idiom, here as a trend-" +
        "shift detector for any metric stream). Both SMAs are exact " +
        "integer frame sums; the crossing test compares 7·S3 with " +
        "3·S7 — pure integer cross-multiplication, so no float " +
        "threshold can wobble a signal. Full frames only (day ≥ 7).",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val ord = Window.partitionBy("event_type").orderBy("d")
        val s3 = sum("y").over(ord.rowsBetween(-2, Window.currentRow))
        val s7 = sum("y").over(ord.rowsBetween(-6, Window.currentRow))
        val n7 = count(lit(1)).over(ord.rowsBetween(-6, Window.currentRow))
        val g = daily
          .withColumn("s3", s3).withColumn("s7", s7).withColumn("n7", n7)
          .filter(col("n7") === 7)
          .withColumn("diff", col("s3") * 7 - col("s7") * 3)
          .withColumn("pdiff", lag("diff", 1).over(ord))
        g.filter(col("pdiff").isNotNull &&
            ((col("diff") > 0 && col("pdiff") <= 0)
              || (col("diff") < 0 && col("pdiff") >= 0)))
          .select(col("event_type"), col("d").as("day"),
            when(col("diff") > 0, lit("golden")).otherwise(lit("death"))
              .as("signal"),
            round(col("s3") / 3.0 / 100.0, 2).as("sma3"),
            round(col("s7") / 7.0 / 100.0, 2).as("sma7"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, d,
            sum(y) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
            sum(y) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
            count(*) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7
          FROM daily),
        f AS (SELECT event_type, d, s3, s7, s3 * 7 - s7 * 3 AS diff,
            lag(s3 * 7 - s7 * 3) OVER (PARTITION BY event_type ORDER BY d)
              AS pdiff
          FROM m WHERE n7 = 7)
        SELECT event_type, d AS day,
          CASE WHEN diff > 0 THEN 'golden' ELSE 'death' END AS signal,
          round(s3 / 3.0 / 100.0, 2) AS sma3,
          round(s7 / 7.0 / 100.0, 2) AS sma7
        FROM f
        WHERE pdiff IS NOT NULL AND ((diff > 0 AND pdiff <= 0)
          OR (diff < 0 AND pdiff >= 0))
        ORDER BY event_type, day""")),

    Q(
      "ts_mad_outliers",
      "Median-absolute-deviation outlier days per event type — the " +
        "robust alternative to ts_anomaly_zscore's mean/σ gate (one " +
        "fat-finger day inflates σ and hides itself; the MAD gate it " +
        "cannot). Median and MAD come from sorted integer-cent " +
        "arrays over the calendar-bounded daily series, kept DOUBLED " +
        "(2·median, 4·MAD) so every comparison — |x−med| > 3·MAD ⇔ " +
        "2·d2 > 3·mad4 — is exact integer arithmetic; the robust " +
        "z-score is a fixed-shape float formula evaluated once per " +
        "flagged day.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        def mid2(arr: Column): Column = {
          val n = size(arr)
          element_at(arr, floor((n + 1) / 2).cast("int"))
            .plus(element_at(arr, (floor(n / 2) + 1).cast("int")))
        }
        val med = daily.groupBy("event_type")
          .agg(sort_array(collect_list("y")).as("arr"))
          .select(col("event_type"), mid2(col("arr")).as("m2"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("d2", abs(col("y") * 2 - col("m2")))
        val mad = dev.groupBy("event_type")
          .agg(sort_array(collect_list("d2")).as("arr"))
          .select(col("event_type"), mid2(col("arr")).as("mad4"))
        dev.join(broadcast(mad), "event_type")
          .filter(col("d2") * 2 > col("mad4") * 3)
          .select(col("event_type"), col("d").as("day"),
            round(col("y") / 100.0, 2).as("y"),
            round((col("d2") / 2.0) / (col("mad4") / 4.0 * 1.4826), 2)
              .as("robust_z"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        med AS (SELECT event_type, list_sort(list(y)) AS arr
          FROM daily GROUP BY 1),
        m2 AS (SELECT event_type,
            arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS m2
          FROM med),
        dev AS (SELECT daily.event_type, d, y, abs(y * 2 - m2) AS d2
          FROM daily JOIN m2 USING (event_type)),
        madl AS (SELECT event_type, list_sort(list(d2)) AS arr
          FROM dev GROUP BY 1),
        mad4 AS (SELECT event_type,
            arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS mad4
          FROM madl)
        SELECT dev.event_type, d AS day, round(y / 100.0, 2) AS y,
          round((d2 / 2.0) / (mad4 / 4.0 * 1.4826), 2) AS robust_z
        FROM dev JOIN mad4 USING (event_type)
        WHERE d2 * 2 > mad4 * 3
        ORDER BY event_type, day""")),

    Q(
      "ts_peak_detect",
      "Local-maximum days per event type — strict peaks of the daily " +
        "value curve (y above BOTH neighbors; series boundaries " +
        "excluded), the primitive under seasonality eyeballing and " +
        "alert de-bouncing. One lag/lead window per type over the " +
        "calendar-bounded series, integer-cent comparisons only.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val w = Window.partitionBy("event_type").orderBy("d")
        daily
          .withColumn("py", lag("y", 1).over(w))
          .withColumn("ny", lead("y", 1).over(w))
          .filter(col("py").isNotNull && col("ny").isNotNull
            && col("y") > col("py") && col("y") > col("ny"))
          .select(col("event_type"), col("d").as("day"),
            round(col("y") / 100.0, 2).as("y"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        n AS (SELECT event_type, d, y,
            lag(y) OVER (PARTITION BY event_type ORDER BY d) AS py,
            lead(y) OVER (PARTITION BY event_type ORDER BY d) AS ny
          FROM daily)
        SELECT event_type, d AS day, round(y / 100.0, 2) AS y
        FROM n
        WHERE py IS NOT NULL AND ny IS NOT NULL AND y > py AND y > ny
        ORDER BY event_type, day""")),

    Q(
      "ts_value_runs",
      "Run-length structure of above/below-median days per event " +
        "type — longest winning/losing streaks and run count of the " +
        "daily value curve vs the type's own median (the Wald–" +
        "Wolfowitz-flavored randomness diagnostic: too few runs = " +
        "trending, too many = oscillating). Median via the doubled " +
        "sorted-middle (integer), membership by exact 2·y vs m2 " +
        "comparison, runs by the gaps-and-islands flag+cumsum idiom " +
        "in type-partitioned windows.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        def mid2(arr: Column): Column = {
          val n = size(arr)
          element_at(arr, floor((n + 1) / 2).cast("int"))
            .plus(element_at(arr, (floor(n / 2) + 1).cast("int")))
        }
        val med = daily.groupBy("event_type")
          .agg(sort_array(collect_list("y")).as("arr"))
          .select(col("event_type"), mid2(col("arr")).as("m2"))
        val w = Window.partitionBy("event_type").orderBy("d")
        val lab = daily.join(broadcast(med), "event_type")
          .withColumn("above", (col("y") * 2 > col("m2")).cast("int"))
          .withColumn("flip",
            when(lag("above", 1).over(w).isNull
              || lag("above", 1).over(w) =!= col("above"), 1).otherwise(0))
          .withColumn("run", sum("flip").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        lab.groupBy("event_type", "run", "above")
          .agg(count(lit(1)).as("len"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_runs"),
            max(when(col("above") === 1, col("len")).otherwise(0))
              .as("longest_above"),
            max(when(col("above") === 0, col("len")).otherwise(0))
              .as("longest_below"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        med AS (SELECT event_type, list_sort(list(y)) AS arr
          FROM daily GROUP BY 1),
        m2 AS (SELECT event_type,
            arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS m2
          FROM med),
        lab AS (SELECT daily.event_type, d,
            CASE WHEN y * 2 > m2 THEN 1 ELSE 0 END AS above
          FROM daily JOIN m2 USING (event_type)),
        fl AS (SELECT event_type, d, above,
            CASE WHEN lag(above) OVER w IS NULL
              OR lag(above) OVER w <> above THEN 1 ELSE 0 END AS flip
          FROM lab WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        rn AS (SELECT event_type, d, above,
            sum(flip) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM fl),
        runs AS (SELECT event_type, run, above, count(*) AS len
          FROM rn GROUP BY 1, 2, 3)
        SELECT event_type, count(*) AS n_runs,
          max(CASE WHEN above = 1 THEN len ELSE 0 END) AS longest_above,
          max(CASE WHEN above = 0 THEN len ELSE 0 END) AS longest_below
        FROM runs GROUP BY 1 ORDER BY event_type""")),

    Q(
      "ts_winsorize",
      "Winsorized daily series per event type — clamp each day's " +
        "value to the type's own [p05, p95] band (the standard " +
        "robust pre-treatment before means/regressions meet fat " +
        "tails). Exact order-statistic cutoffs from the sorted " +
        "integer-cent array (ceil-rank indices over the calendar-" +
        "bounded series — no interpolation, so both engines read " +
        "the same element), broadcast back; clamping is " +
        "greatest/least on integers.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val cut = daily.groupBy("event_type")
          .agg(sort_array(collect_list("y")).as("arr"), count(lit(1)).as("n"))
          .select(col("event_type"),
            element_at(col("arr"),
              greatest(lit(1), ceil(col("n") * 0.05)).cast("int")).as("lo"),
            element_at(col("arr"),
              least(col("n"), ceil(col("n") * 0.95)).cast("int")).as("hi"))
        daily.join(broadcast(cut), "event_type")
          .select(col("event_type"), col("d").as("day"),
            round(col("y") / 100.0, 2).as("y"),
            round(greatest(col("lo"), least(col("hi"), col("y"))) / 100.0, 2)
              .as("y_wins"),
            (col("y") < col("lo") || col("y") > col("hi")).as("clamped"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        cut AS (SELECT event_type, list_sort(list(y)) AS arr, count(*) AS n
          FROM daily GROUP BY 1),
        c2 AS (SELECT event_type,
            arr[CAST(greatest(1, ceil(n * 0.05)) AS INT)] AS lo,
            arr[CAST(least(n, ceil(n * 0.95)) AS INT)] AS hi
          FROM cut)
        SELECT daily.event_type, d AS day, round(y / 100.0, 2) AS y,
          round(greatest(lo, least(hi, y)) / 100.0, 2) AS y_wins,
          y < lo OR y > hi AS clamped
        FROM daily JOIN c2 USING (event_type)
        ORDER BY event_type, day""")),

    Q(
      "ts_cross_corr",
      "Lead–lag cross-correlation between the purchase and click " +
        "hourly count series at lags −3…+3 hours — the does-X-drive-Y " +
        "diagnostic (ad-spend→signup, deploy→error). Hour buckets by " +
        "exact integer division of epoch-µs (no float floor at 10¹⁵ " +
        "magnitudes); each lag is an equi-join of the two bucketed " +
        "series on h = h′+lag (a broadcast-able handful of rows per " +
        "series at any scale since the series length is calendar-" +
        "bounded); Pearson per lag from exact integer power sums " +
        "evaluated once.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        def series(t: String, hn: String, cn: String) = ev
          .filter(col("event_type") === t)
          .select(Tables.epochUs(col("ts")).as("us"))
          .select(expr("us div 3600000000").as(hn))
          .groupBy(hn).agg(count(lit(1)).as(cn))
        val a = series("purchase", "h", "xa")
        val b = series("click", "hb", "xb")
        val lags = ev.sparkSession.range(-3, 4).select(col("id").as("lag"))
        val joined = a.crossJoin(broadcast(lags))
          .join(b, col("h") === col("lag") + col("hb")) // h_a = h_b + lag
        val n = col("n").cast("double")
        val num = n * col("s12") - col("s1").cast("double") * col("s2")
        val den = sqrt(n * col("s11") - col("s1").cast("double") * col("s1"))
          .multiply(sqrt(n * col("s22") - col("s2").cast("double") * col("s2")))
        joined.groupBy("lag")
          .agg(count(lit(1)).as("n"),
            sum("xa").as("s1"), sum("xb").as("s2"),
            sum(col("xa") * col("xa")).as("s11"),
            sum(col("xb") * col("xb")).as("s22"),
            sum(col("xa") * col("xb")).as("s12"))
          .select(col("lag"), col("n").as("n_hours"),
            round(num / den, 4).as("r"))
          .orderBy("lag")
      },
      Some("""WITH a AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
              AS h, count(*) AS xa
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        b AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
              AS hb, count(*) AS xb
          FROM events WHERE event_type = 'click' GROUP BY 1),
        lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-3, 4)),
        j AS (SELECT lag, xa, xb
          FROM a CROSS JOIN lags JOIN b ON a.h = lags.lag + b.hb),
        ps AS (SELECT lag, count(*) AS n,
            CAST(sum(xa) AS BIGINT) AS s1, CAST(sum(xb) AS BIGINT) AS s2,
            sum(xa * xa) AS s11, sum(xb * xb) AS s22, sum(xa * xb) AS s12
          FROM j GROUP BY 1)
        SELECT lag, n AS n_hours,
          round((CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
            / (sqrt(CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
               * sqrt(CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)),
            4) AS r
        FROM ps ORDER BY lag""")),

    Q(
      "ts_dow_seasonal",
      "Detrended ISO-weekday seasonal indices per event type — fit " +
        "the linear trend of the daily value series from exact " +
        "integer power sums (the regr_* spine), then average the " +
        "residuals by weekday. The only float summation (per-weekday " +
        "residual mean over ≤5 values) runs through the sorted fold; " +
        "the trend coefficients are evaluated once per type and ride " +
        "a broadcast join back onto the days.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            (weekday(col("ts")) + 1).as("dow"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d", "dow").agg(sum("cents").as("y"))
        val fit = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("d").as("sx"), sum("y").as("sy"),
            sum(col("d") * col("d")).as("sxx"),
            sum(col("d") * col("y")).as("sxy"))
          .select(col("event_type"),
            ((col("n") * col("sxy") - col("sx").cast("double") * col("sy"))
              / (col("n") * col("sxx") - col("sx").cast("double") * col("sx")))
              .as("slope"),
            col("sy").cast("double").as("syd"), col("sx").cast("double").as("sxd"),
            col("n").cast("double").as("nd"))
          .select(col("event_type"), col("slope"),
            ((col("syd") - col("slope") * col("sxd")) / col("nd"))
              .as("intercept"))
        daily.join(broadcast(fit), "event_type")
          .withColumn("resid",
            col("y") - (col("intercept") + col("slope") * col("d")))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n_days"),
            round(sfold(col("resid")) / count(lit(1)) / 100.0, 2)
              .as("seasonal"))
          .orderBy("event_type", "dow")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2, 3),
        fit0 AS (SELECT event_type, count(*) AS n,
            CAST(sum(d) AS BIGINT) AS sx,
            CAST(sum(y) AS BIGINT) AS sy,
            sum(d * d) AS sxx, sum(d * y) AS sxy
          FROM daily GROUP BY 1),
        fit AS (SELECT event_type,
            (n * sxy - CAST(sx AS DOUBLE) * sy)
              / (n * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
            (CAST(sy AS DOUBLE) - ((n * sxy - CAST(sx AS DOUBLE) * sy)
              / (n * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n AS intercept
          FROM fit0)
        SELECT daily.event_type, dow, count(*) AS n_days,
          round(list_reduce(list_sort(
              list(y - (intercept + slope * d))), (a, b) -> a + b)
            / count(*) / 100.0, 2) AS seasonal
        FROM daily JOIN fit USING (event_type)
        GROUP BY 1, 2 ORDER BY event_type, dow""")),

    Q(
      "profile_sequence_gaps",
      "Contiguous-run inventory of an expected-dense key sequence — " +
        "the completeness audit for ingestion IDs (missing ranges = " +
        "dropped batches). The fixture carves deterministic holes " +
        "(every 977th key and the 7000–7049 block) to exercise the " +
        "detector; the output is each contiguous present run " +
        "(start/end/length), whose complement is the gap list. " +
        "Scale path: the classic key−row_number drift trick, with " +
        "the global row number from Skew.globalRank (range " +
        "repartition + per-partition offsets — NO single-task " +
        "window), then one hash aggregation per drift island.",
      (s, dir) => {
        val present = Tables.t(s, dir, "orders")
          .select(col("o_orderkey").as("k"))
          .filter(col("k") % 977 =!= 0
            && !col("k").between(7000, 7049))
        Skew.globalRank(present, Seq(col("k")), rankCol = "r")
          .groupBy((col("k") - col("r")).as("drift"))
          .agg(min("k").as("run_start"), max("k").as("run_end"),
            count(lit(1)).as("run_len"))
          .select("run_start", "run_end", "run_len")
          .orderBy("run_start")
      },
      Some("""WITH present AS (SELECT o_orderkey AS k FROM orders
          WHERE k % 977 <> 0 AND k NOT BETWEEN 7000 AND 7049),
        r AS (SELECT k, row_number() OVER (ORDER BY k) AS rn FROM present)
        SELECT min(k) AS run_start, max(k) AS run_end,
          count(*) AS run_len
        FROM r GROUP BY k - rn ORDER BY run_start""")),

    Q(
      "profile_freshness",
      "Per-stream freshness audit — each event type's last-seen " +
        "timestamp lag behind the corpus high-watermark, in whole " +
        "seconds (the is-my-upstream-stuck pager check). Per-type " +
        "max and the global max are exact epoch-µs integers; the " +
        "global watermark rides a 1-row broadcast; the lag division " +
        "is integer µs→s. One aggregation each — no window, no sort " +
        "beyond the |types|-row output.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type"), Tables.epochUs(col("ts")).as("us"))
        val perType = ev.groupBy("event_type").agg(max("us").as("last_us"))
        val global = ev.agg(max("us").as("hw"))
        perType.crossJoin(broadcast(global))
          .select(col("event_type"),
            expr("(hw - last_us) div 1000000").as("staleness_sec"),
            expr("last_us div 86400000000").as("last_epoch_day"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        pt AS (SELECT event_type, max(us) AS last_us FROM ev GROUP BY 1),
        g AS (SELECT max(us) AS hw FROM ev)
        SELECT event_type,
          (hw - last_us) // 1000000 AS staleness_sec,
          last_us // 86400000000 AS last_epoch_day
        FROM pt CROSS JOIN g ORDER BY event_type""")),

    Q(
      "stats_jackknife",
      "Jackknife standard error of the grand mean of per-nation " +
        "order values — the resampling-free uncertainty estimate for " +
        "a statistic over GROUPS (each leave-one-group-out replicate " +
        "is closed-form, so the whole jackknife is three tiny " +
        "aggregations over the 25-row group-mean table; nothing " +
        "random, nothing iterative). Group means come from exact " +
        "cent sums; every float summation over the group table runs " +
        "through the sorted fold.",
      (s, dir) => {
        val g = Tables.t(s, dir, "orders")
          .join(Tables.t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("sc"),
            count(lit(1)).as("nc"))
          .select(col("c_nationkey"),
            (col("sc").cast("double") / col("nc")).as("m"))
        val t1 = g.agg(count(lit(1)).as("n"), sfold(col("m")).as("sm"))
        val loo = g.crossJoin(broadcast(t1))
          .select(col("n"),
            ((col("sm") - col("m")) / (col("n") - 1)).as("loo"))
        val t2 = loo.groupBy("n")
          .agg(sfold(col("loo")).as("sl"),
            sfold(col("loo") * col("loo")).as("sll"))
        val nD = col("n").cast("double")
        val jkVar = (nD - 1) / nD * (col("sll") - col("sl") * col("sl") / nD)
        t2.crossJoin(broadcast(t1.select(col("sm"))))
          .select(col("n").as("n_groups"),
            round(col("sm") / nD / 100.0, 2).as("grand_mean"),
            round(sqrt(jkVar) / 100.0, 4).as("jk_se"))
          .orderBy("n_groups")
      },
      Some("""WITH g AS (SELECT c_nationkey,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
              / count(*) AS m
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        t1 AS (SELECT count(*) AS n,
            list_reduce(list_sort(list(m)), (a, b) -> a + b) AS sm
          FROM g),
        loo AS (SELECT n, (sm - m) / (n - 1) AS loo
          FROM g CROSS JOIN t1),
        t2 AS (SELECT n,
            list_reduce(list_sort(list(loo)), (a, b) -> a + b) AS sl,
            list_reduce(list_sort(list(loo * loo)), (a, b) -> a + b) AS sll
          FROM loo GROUP BY n)
        SELECT n AS n_groups,
          round(sm / n / 100.0, 2) AS grand_mean,
          round(sqrt((CAST(n AS DOUBLE) - 1) / n
            * (sll - sl * sl / n)) / 100.0, 4) AS jk_se
        FROM t2 CROSS JOIN (SELECT sm FROM t1) s
        ORDER BY n_groups""")),

    Q(
      "profile_histogram",
      "Exact equi-width histogram of order values — 20 bins between " +
        "the observed min/max (the shape-of-the-column diagnostic " +
        "feat_quantile_bins' equal-mass cut can't give). Bin " +
        "assignment is pure integer arithmetic over cents — " +
        "(x−min)·20 div (max−min+1) — so no value can straddle a " +
        "float bin edge in either engine; min/max ride a 1-row " +
        "broadcast; one hash aggregation to ≤20 rows. Empty bins " +
        "are simply absent (their zero is implied), keeping the " +
        "output proportional to occupied bins, not bin count.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("c"))
        val mm = o.agg(min("c").as("mn"), max("c").as("mx"),
          count(lit(1)).as("n"))
        val span = col("mx") - col("mn") + 1
        o.crossJoin(broadcast(mm))
          .select(Skew.idiv((col("c") - col("mn")) * 20, span).as("bin"),
            col("mn"), col("mx"), col("n"))
          .groupBy("bin", "mn", "mx", "n")
          .agg(count(lit(1)).as("n_rows"))
          .select(col("bin").cast("int").as("bin"),
            round((col("mn") + col("bin") * (col("mx") - col("mn") + 1)
              / 20.0) / 100.0, 2).as("bin_lo"),
            col("n_rows"),
            round(col("n_rows").cast("double") / col("n"), 4).as("share"))
          .orderBy("bin")
      },
      Some("""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
            AS c FROM orders),
        mm AS (SELECT min(c) AS mn, max(c) AS mx,
            CAST(count(*) AS BIGINT) AS n FROM o),
        b AS (SELECT ((c - mn) * 20) // (mx - mn + 1) AS bin, mn, mx, n
          FROM o CROSS JOIN mm)
        SELECT CAST(bin AS INT) AS bin,
          round((mn + bin * (mx - mn + 1) / 20.0) / 100.0, 2) AS bin_lo,
          count(*) AS n_rows,
          round(CAST(count(*) AS DOUBLE) / max(n), 4) AS share
        FROM b GROUP BY bin, mn, mx, n ORDER BY bin""")),

    Q(
      "stats_sample_size",
      "A/B sample-size calculator — the n-per-arm needed to detect a " +
        "2% relative lift over the OBSERVED daily purchase-" +
        "conversion baseline — purchase user-days over active " +
        "user-days — at α=0.05 / 80% power (the experiment-design " +
        "companion to stats_two_proportion_z: run it BEFORE the " +
        "test; the minimum-detectable-effect framing is the standard " +
        "one because the treatment rate is unknown by definition). " +
        "The baseline comes from exact distinct-user counts in one " +
        "pass; the closed-form (z_{α/2}+z_β)²·(p₁q₁+p₂q₂)/Δ² is a " +
        "single float expression with the z constants as literals; " +
        "ceil to whole users.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            dayofmonth(col("ts")).as("d"))
        val a = ev.agg(
          countDistinct(struct(col("user_id"), col("d"))).as("nu"),
          countDistinct(when(col("event_type") === "purchase",
            struct(col("user_id"), col("d")))).as("np"))
        val p1 = col("np").cast("double") / col("nu")
        val p2 = p1 * lit(1.02)
        val zsum = lit(1.959963985) + lit(0.8416212336)
        val need = (zsum * zsum
          * (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
          / ((p1 - p2) * (p1 - p2)))
        a.select(round(p1, 4).as("p1"), round(p2, 4).as("p2"),
            round(p1 - p2, 4).as("delta"),
            ceil(need).cast("long").as("n_per_arm"))
          .orderBy("p1")
      },
      Some("""WITH ev AS (SELECT event_type, user_id,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d FROM events),
        a AS (SELECT count(DISTINCT (user_id, d)) AS nu,
            count(DISTINCT CASE WHEN event_type = 'purchase'
              THEN (user_id, d) END) AS np
          FROM ev),
        p AS (SELECT CAST(np AS DOUBLE) / nu AS p1,
            CAST(np AS DOUBLE) / nu * 1.02 AS p2 FROM a)
        SELECT round(p1, 4) AS p1, round(p2, 4) AS p2,
          round(p1 - p2, 4) AS delta,
          CAST(ceil((1.959963985 + 0.8416212336)
            * (1.959963985 + 0.8416212336)
            * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
            / ((p1 - p2) * (p1 - p2))) AS BIGINT) AS n_per_arm
        FROM p ORDER BY p1""")),

    Q(
      "stats_qq",
      "Q–Q points of purchase vs click event values — exact order-" +
        "statistic quantiles at 5%…95% for both distributions, the " +
        "diagnostic picture behind stats_ks_test's single number " +
        "(WHERE the distributions diverge, not just whether). Exact " +
        "quantiles via the bounded distinct-value spine: counts per " +
        "distinct cent value, a cumulative window per type over " +
        "distinct values (bounded by the value domain, never row " +
        "count), and ceil-rank thresholds from a 19-row literal " +
        "broadcast — the smallest value whose cumulative count " +
        "reaches ⌈q·n/100⌉, all in integers.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
        val vc = e.groupBy("event_type", "c").agg(count(lit(1)).as("w"))
        val cum = vc
          .withColumn("cw", sum("w").over(
            Window.partitionBy("event_type").orderBy("c")))
          .withColumn("tw", sum("w").over(Window.partitionBy("event_type")))
        val qs = e.sparkSession.range(1, 20)
          .select((col("id") * 5).cast("int").as("q"))
        val hit = cum.crossJoin(broadcast(qs))
          .filter(col("cw") * 100 >= col("q") * col("tw"))
          .groupBy("event_type", "q").agg(min("c").as("v"))
        hit.groupBy("q")
          .agg(
            max(when(col("event_type") === "purchase", col("v"))).as("vp"),
            max(when(col("event_type") === "click", col("v"))).as("vc"))
          .select(col("q"), round(col("vp") / 100.0, 2).as("purchase_q"),
            round(col("vc") / 100.0, 2).as("click_q"))
          .orderBy("q")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE event_type IN ('purchase', 'click')),
        vc AS (SELECT event_type, c, count(*) AS w FROM e GROUP BY 1, 2),
        cum AS (SELECT event_type, c,
            sum(w) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
            sum(w) OVER (PARTITION BY event_type) AS tw
          FROM vc),
        qs AS (SELECT CAST(range * 5 AS INT) AS q FROM range(1, 20)),
        hit AS (SELECT event_type, q, min(c) AS v
          FROM cum CROSS JOIN qs
          WHERE cw * 100 >= q * tw
          GROUP BY 1, 2)
        SELECT q,
          round(max(CASE WHEN event_type = 'purchase' THEN v END)
            / 100.0, 2) AS purchase_q,
          round(max(CASE WHEN event_type = 'click' THEN v END)
            / 100.0, 2) AS click_q
        FROM hit GROUP BY q ORDER BY q""")),

    Q(
      "stats_mutual_info",
      "Mutual information between event type and ISO weekday — the " +
        "information-theoretic companion to stats_cramers_v on the " +
        "same contingency table (bits shared between the two " +
        "variables, plus normalized MI against the smaller marginal " +
        "entropy). Cell and marginal counts are exact from one " +
        "aggregation; every Σp·log₂ term is fixed-shape and summed " +
        "through the sorted fold (≤ |types|·7 cells, ≤ max(|types|," +
        "7) marginal terms).",
      (s, dir) => {
        val cells = Tables.t(s, dir, "events")
          .select(col("event_type"), (weekday(col("ts")) + 1).as("dow"))
          .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
        val rt = cells.groupBy("event_type").agg(sum("n").as("rn"))
        val ct = cells.groupBy("dow").agg(sum("n").as("cn"))
        val tot = cells.agg(sum("n").as("nn"))
        val pxy = col("n").cast("double") / col("nn")
        val mi = cells
          .join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
          .crossJoin(broadcast(tot))
          .select((pxy * log2(pxy * col("nn") / col("rn") * col("nn")
            / col("cn"))).as("term"))
          .agg(sfold(col("term")).as("mi"))
        def hOf(m: org.apache.spark.sql.DataFrame, cnt: String) = m
          .crossJoin(broadcast(tot))
          .select((col(cnt).cast("double") / col("nn")
            * log2(col(cnt).cast("double") / col("nn")) * -1.0).as("t"))
          .agg(sfold(col("t")).as(s"h_$cnt"))
        mi.crossJoin(broadcast(hOf(rt, "rn"))).crossJoin(broadcast(hOf(ct, "cn")))
          .select(round(col("mi"), 6).as("mi_bits"),
            round(col("h_rn"), 4).as("h_type"),
            round(col("h_cn"), 4).as("h_dow"),
            round(col("mi") / least(col("h_rn"), col("h_cn")), 4).as("nmi"))
          .orderBy("mi_bits")
      },
      Some("""WITH cells AS (SELECT event_type,
            CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
            count(*) AS n
          FROM events GROUP BY 1, 2),
        rt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rn
          FROM cells GROUP BY 1),
        ct AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cn
          FROM cells GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        mi AS (SELECT list_reduce(list_sort(list(
            (CAST(n AS DOUBLE) / nn)
              * log2((CAST(n AS DOUBLE) / nn) * nn / rn * nn / cn))),
            (a, b) -> a + b) AS mi
          FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
            CROSS JOIN t),
        hx AS (SELECT list_reduce(list_sort(list(
            -(CAST(rn AS DOUBLE) / nn) * log2(CAST(rn AS DOUBLE) / nn))),
            (a, b) -> a + b) AS h_type FROM rt CROSS JOIN t),
        hy AS (SELECT list_reduce(list_sort(list(
            -(CAST(cn AS DOUBLE) / nn) * log2(CAST(cn AS DOUBLE) / nn))),
            (a, b) -> a + b) AS h_dow FROM ct CROSS JOIN t)
        SELECT round(mi, 6) AS mi_bits, round(h_type, 4) AS h_type,
          round(h_dow, 4) AS h_dow,
          round(mi / least(h_type, h_dow), 4) AS nmi
        FROM mi CROSS JOIN hx CROSS JOIN hy ORDER BY mi_bits""")),

    Q(
      "ts_mann_kendall",
      "Mann–Kendall trend test per event type — S = Σ sign(y_j−y_i) " +
        "over all day pairs of the daily value series, with the " +
        "tie-corrected variance and the normal approximation z " +
        "(the nonparametric is-there-a-trend gate that pairs with " +
        "ts_theil_sen's how-steep answer). The pair stage is " +
        "quadratic in SERIES LENGTH (calendar-bounded, like " +
        "theil_sen), never row count; S and every tie count are " +
        "exact integers; z is one float formula with the ±1.96 " +
        "verdict thresholds on it.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val sAgg = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type")
              && col("a.d") < col("b.d"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(sum(signum(col("b.y") - col("a.y")).cast("long")).as("s"))
        val ties = daily.groupBy("event_type", "y")
          .agg(count(lit(1)).as("t"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("nv"), sum("t").as("n"),
            sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tadj"))
        val nD = col("n").cast("double")
        val varS = (nD * (nD - 1) * (nD * 2 + 5) - col("tadj")) / 18.0
        val z = when(col("s") > 0, (col("s") - 1) / sqrt(varS))
          .when(col("s") < 0, (col("s") + 1) / sqrt(varS))
          .otherwise(lit(0.0))
        sAgg.join(ties, "event_type")
          .select(col("event_type"), col("n").as("n_days"), col("s"),
            round(z, 4).as("z"),
            when(z > 1.96, lit("increasing"))
              .when(z < -1.96, lit("decreasing"))
              .otherwise(lit("none")).as("trend"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        sa AS (SELECT a.event_type,
            CAST(sum(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d
          GROUP BY 1),
        ties AS (SELECT event_type, count(*) AS nv,
            CAST(sum(t) AS BIGINT) AS n,
            CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tadj
          FROM (SELECT event_type, y, count(*) AS t FROM daily
            GROUP BY 1, 2)
          GROUP BY 1),
        f AS (SELECT sa.event_type, n, s,
            (CAST(n AS DOUBLE) * (n - 1) * (n * 2 + 5) - tadj) / 18.0
              AS vars
          FROM sa JOIN ties USING (event_type)),
        zc AS (SELECT event_type, n, s,
            CASE WHEN s > 0 THEN (s - 1) / sqrt(vars)
              WHEN s < 0 THEN (s + 1) / sqrt(vars)
              ELSE 0.0 END AS z
          FROM f)
        SELECT event_type, n AS n_days, s, round(z, 4) AS z,
          CASE WHEN z > 1.96 THEN 'increasing'
            WHEN z < -1.96 THEN 'decreasing' ELSE 'none' END AS trend
        FROM zc ORDER BY event_type""")),

    Q(
      "ts_control_chart",
      "Western-Electric control chart per event type — the four " +
        "classic SPC rules over the daily value series against the " +
        "in-control mean ± kσ zones (the alerting grammar between " +
        "single-point z-scores and full changepoint detection): " +
        "R1 a point beyond 3σ; R2 two of three consecutive beyond " +
        "2σ same side; R3 four of five beyond 1σ same side; R4 " +
        "eight consecutive on one side of the mean. Mean and σ come " +
        "from exact integer power sums; each zone flag is one fixed-" +
        "shape float comparison, and the rules are integer counts " +
        "over small ROWS frames in type-partitioned windows. " +
        "Emits the full chart — every day with its four rule flags " +
        "(the fixture is statistically in control, so all-false " +
        "flags ARE the finding; a violation day lights up its rule).",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val st = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("y").as("sx"),
            sum(col("y").cast("decimal(38,0)") * col("y")).as("sxx"))
          .select(col("event_type"),
            (col("sx").cast("double") / col("n")).as("mu"),
            sqrt((col("sxx").cast("double")
              - col("sx").cast("double") * col("sx") / col("n"))
              / col("n")).as("sig"))
        val z = daily.join(broadcast(st), "event_type")
          .withColumn("up1", (col("y") > col("mu") + col("sig")).cast("int"))
          .withColumn("dn1", (col("y") < col("mu") - col("sig")).cast("int"))
          .withColumn("up2", (col("y") > col("mu") + col("sig") * 2).cast("int"))
          .withColumn("dn2", (col("y") < col("mu") - col("sig") * 2).cast("int"))
          .withColumn("up0", (col("y") > col("mu")).cast("int"))
          .withColumn("dn0", (col("y") < col("mu")).cast("int"))
        val ord = Window.partitionBy("event_type").orderBy("d")
        def last(c: String, k: Int) =
          sum(c).over(ord.rowsBetween(-(k - 1), Window.currentRow))
        val flagged = z
          .withColumn("r1", col("y") > col("mu") + col("sig") * 3
            || col("y") < col("mu") - col("sig") * 3)
          .withColumn("r2", last("up2", 3) >= 2 || last("dn2", 3) >= 2)
          .withColumn("r3", last("up1", 5) >= 4 || last("dn1", 5) >= 4)
          .withColumn("r4", last("up0", 8) >= 8 || last("dn0", 8) >= 8)
        flagged
          .select(col("event_type"), col("d").as("day"),
            round(col("y") / 100.0, 2).as("y"),
            col("r1"), col("r2"), col("r3"), col("r4"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        st AS (SELECT event_type,
            CAST(sum(y) AS DOUBLE) / count(*) AS mu,
            sqrt((CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE)
              - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS BIGINT) / count(*))
              / count(*)) AS sig
          FROM daily GROUP BY 1),
        z AS (SELECT daily.event_type, d, y, mu, sig,
            CASE WHEN y > mu + sig THEN 1 ELSE 0 END AS up1,
            CASE WHEN y < mu - sig THEN 1 ELSE 0 END AS dn1,
            CASE WHEN y > mu + sig * 2 THEN 1 ELSE 0 END AS up2,
            CASE WHEN y < mu - sig * 2 THEN 1 ELSE 0 END AS dn2,
            CASE WHEN y > mu THEN 1 ELSE 0 END AS up0,
            CASE WHEN y < mu THEN 1 ELSE 0 END AS dn0
          FROM daily JOIN st USING (event_type)),
        fl AS (SELECT event_type, d, y,
            y > mu + sig * 3 OR y < mu - sig * 3 AS r1,
            sum(up2) OVER w3 >= 2 OR sum(dn2) OVER w3 >= 2 AS r2,
            sum(up1) OVER w5 >= 4 OR sum(dn1) OVER w5 >= 4 AS r3,
            sum(up0) OVER w8 >= 8 OR sum(dn0) OVER w8 >= 8 AS r4
          FROM z
          WINDOW w3 AS (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
            w5 AS (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
            w8 AS (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        SELECT event_type, d AS day, round(y / 100.0, 2) AS y,
          r1, r2, r3, r4
        FROM fl ORDER BY event_type, day""")),

    Q(
      "stats_wilson_ci",
      "Wilson score intervals for each event type's traffic share — " +
        "the binomial CI that stays honest near 0 and 1 where the " +
        "naive ±z√(pq/n) collapses (the per-variant readout behind " +
        "stats_two_proportion_z's comparison). Counts are exact from " +
        "one aggregation; the Wilson bounds are fixed-shape float " +
        "formulas with z=1.96 as a literal, evaluated once per type.",
      (s, dir) => {
        val c = Tables.t(s, dir, "events")
          .groupBy("event_type").agg(count(lit(1)).as("x"))
        val t = c.agg(sum("x").as("n"))
        val zc = lit(1.959963985)
        val p = col("x").cast("double") / col("n")
        val nD = col("n").cast("double")
        val denom = lit(1.0) + zc * zc / nD
        val center = p + zc * zc / (nD * 2)
        val spread = zc * sqrt(p * (lit(1.0) - p) / nD
          + zc * zc / (nD * nD * 4))
        c.crossJoin(broadcast(t))
          .select(col("event_type"), col("x"), col("n"),
            round(p, 4).as("share"),
            round((center - spread) / denom, 4).as("wilson_lo"),
            round((center + spread) / denom, 4).as("wilson_hi"))
          .orderBy("event_type")
      },
      Some("""WITH c AS (SELECT event_type, count(*) AS x
          FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(x) AS BIGINT) AS n FROM c),
        f AS (SELECT event_type, x, n,
            CAST(x AS DOUBLE) / n AS p, CAST(n AS DOUBLE) AS nd
          FROM c CROSS JOIN t)
        SELECT event_type, x, n, round(p, 4) AS share,
          round((p + 1.959963985 * 1.959963985 / (nd * 2)
            - 1.959963985 * sqrt(p * (1.0 - p) / nd
              + 1.959963985 * 1.959963985 / (nd * nd * 4)))
            / (1.0 + 1.959963985 * 1.959963985 / nd), 4) AS wilson_lo,
          round((p + 1.959963985 * 1.959963985 / (nd * 2)
            + 1.959963985 * sqrt(p * (1.0 - p) / nd
              + 1.959963985 * 1.959963985 / (nd * nd * 4)))
            / (1.0 + 1.959963985 * 1.959963985 / nd), 4) AS wilson_hi
        FROM f ORDER BY event_type""")),

    Q(
      "stats_pairwise_welch",
      "All-pairs Welch tests with Bonferroni control — every pair of " +
        "event types compared on mean value, flagged at the raw " +
        "z≈1.96 threshold AND at the Bonferroni-adjusted 2.807 " +
        "(α=0.05 over 10 comparisons) — the multiple-comparisons " +
        "discipline stats_welch_t alone doesn't give (run 10 tests " +
        "at raw α and ~40% of null batches flag something). Group " +
        "moments are exact cent power sums reduced once; the pair " +
        "stage is a broadcast self-join over |types| rows; t and " +
        "the Welch–Satterthwaite df are fixed-shape floats per pair.",
      (s, dir) => {
        val g = Tables.t(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sx"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("sxx"))
          .select(col("event_type"), col("n"),
            (col("sx").cast("double") / col("n")).as("m"),
            ((col("sxx").cast("double")
              - col("sx").cast("double") * col("sx") / col("n"))
              / (col("n") - 1)).as("v"))
        val p = g.as("a").join(broadcast(g.as("b")),
          col("a.event_type") < col("b.event_type"))
        val se2 = col("a.v") / col("a.n") + col("b.v") / col("b.n")
        val t = (col("a.m") - col("b.m")) / sqrt(se2)
        val df = se2 * se2 /
          ((col("a.v") / col("a.n")) * (col("a.v") / col("a.n"))
            / (col("a.n") - 1)
            + (col("b.v") / col("b.n")) * (col("b.v") / col("b.n"))
            / (col("b.n") - 1))
        p.select(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"),
            round((col("a.m") - col("b.m")) / 100.0, 2).as("mean_diff"),
            round(t, 4).as("t"), round(df, 1).as("df"),
            (abs(t) > 1.959963985).as("sig_raw"),
            (abs(t) > 2.807033768).as("sig_bonferroni"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH g AS (SELECT event_type, count(*) AS n,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
            CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
              * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sxx
          FROM events GROUP BY 1),
        m AS (SELECT event_type, n,
            CAST(sx AS DOUBLE) / n AS m,
            (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
              AS v
          FROM g),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            a.m AS ma, b.m AS mb,
            a.v / a.n + b.v / b.n AS se2,
            (a.v / a.n) * (a.v / a.n) / (a.n - 1)
              + (b.v / b.n) * (b.v / b.n) / (b.n - 1) AS dfden
          FROM m a JOIN m b ON a.event_type < b.event_type)
        SELECT type_a, type_b,
          round((ma - mb) / 100.0, 2) AS mean_diff,
          round((ma - mb) / sqrt(se2), 4) AS t,
          round(se2 * se2 / dfden, 1) AS df,
          abs((ma - mb) / sqrt(se2)) > 1.959963985 AS sig_raw,
          abs((ma - mb) / sqrt(se2)) > 2.807033768 AS sig_bonferroni
        FROM p ORDER BY type_a, type_b""")),

    Q(
      "ts_missing_hours",
      "Ingestion-outage detection in the TIME domain — for each " +
        "event type, the expected hour grid (min→max epoch hour, " +
        "generated with sequence(), never materialized from data) " +
        "anti-joined against observed hours: count of silent hours " +
        "and the LONGEST contiguous outage (islands over the missing " +
        "set in a type-partitioned, calendar-bounded window). The " +
        "time-domain twin of profile_sequence_gaps' key-domain " +
        "audit; hour arithmetic is exact integer epoch-µs division.",
      (s, dir) => {
        val obs = Tables.t(s, dir, "events")
          .select(col("event_type"), Tables.epochUs(col("ts")).as("us"))
          .select(col("event_type"), expr("us div 3600000000").as("h"))
          .distinct()
        val span = obs.groupBy("event_type")
          .agg(min("h").as("h0"), max("h").as("h1"))
        val grid = span.select(col("event_type"), col("h0"), col("h1"),
            explode(sequence(col("h0"), col("h1"))).as("h"))
        val missing = grid.join(obs, Seq("event_type", "h"), "left_anti")
        val w = Window.partitionBy("event_type").orderBy("h")
        val runs = missing
          .withColumn("grp", col("h") - row_number().over(w))
          .groupBy("event_type", "grp").agg(count(lit(1)).as("len"))
        val stats = span
          .select(col("event_type"), (col("h1") - col("h0") + 1).as("n_expected"))
          .join(obs.groupBy("event_type").agg(count(lit(1)).as("n_present")),
            "event_type")
          .join(runs.groupBy("event_type")
            .agg(count(lit(1)).as("n_outages"), max("len").as("longest_outage")),
            Seq("event_type"), "left")
        stats.select(col("event_type"), col("n_expected"), col("n_present"),
            (col("n_expected") - col("n_present")).as("n_missing"),
            coalesce(col("n_outages"), lit(0L)).as("n_outages"),
            coalesce(col("longest_outage"), lit(0L)).as("longest_outage"))
          .orderBy("event_type")
      },
      Some("""WITH obs AS (SELECT DISTINCT event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
          FROM events),
        span AS (SELECT event_type, min(h) AS h0, max(h) AS h1
          FROM obs GROUP BY 1),
        grid AS (SELECT event_type,
            unnest(range(h0, h1 + 1)) AS h
          FROM span),
        miss AS (SELECT g.event_type, g.h
          FROM grid g LEFT JOIN obs ON obs.event_type = g.event_type
            AND obs.h = g.h
          WHERE obs.h IS NULL),
        runs0 AS (SELECT event_type,
            h - row_number() OVER (PARTITION BY event_type ORDER BY h)
              AS grp
          FROM miss),
        runs AS (SELECT event_type, grp, count(*) AS len
          FROM runs0 GROUP BY 1, 2),
        rl AS (SELECT event_type, count(*) AS n_outages,
            max(len) AS longest_outage
          FROM runs GROUP BY 1),
        np AS (SELECT event_type, count(*) AS n_present FROM obs GROUP BY 1)
        SELECT span.event_type,
          CAST(h1 - h0 + 1 AS BIGINT) AS n_expected,
          np.n_present,
          CAST(h1 - h0 + 1 - np.n_present AS BIGINT) AS n_missing,
          CAST(coalesce(rl.n_outages, 0) AS BIGINT) AS n_outages,
          CAST(coalesce(rl.longest_outage, 0) AS BIGINT) AS longest_outage
        FROM span
        JOIN np USING (event_type)
        LEFT JOIN rl USING (event_type)
        ORDER BY event_type""")),

    Q(
      "profile_sort_locality",
      "Physical-layout diagnostic — Spearman rank correlation " +
        "between a table's storage order (o_orderkey) and a query " +
        "column (o_orderdate): near 1.0 means date predicates prune " +
        "row groups via zone maps for free; near 0 means " +
        "etl_zorder_layout-style re-clustering pays for itself. Both " +
        "global ranks come from Skew.globalRank (range repartition + " +
        "broadcast offsets — NO single-task window anywhere); the " +
        "correlation reduces six exact integer power sums, evaluated " +
        "once. Ranks are tie-free by keyed tie-breaks, so Spearman " +
        "needs no tie correction.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderdate").as("dt"))
        val r1 = Skew.globalRank(o, Seq(col("k")), rankCol = "r1")
        val r2 = Skew.globalRank(o, Seq(col("dt"), col("k")), rankCol = "r2")
        val j = r1.select("k", "r1").join(r2.select("k", "r2"), "k")
        val n = col("n").cast("double")
        val num = n * col("s12") - col("s1").cast("double") * col("s2")
        val den = sqrt(n * col("s11") - col("s1").cast("double") * col("s1"))
          .multiply(sqrt(n * col("s22") - col("s2").cast("double") * col("s2")))
        j.agg(count(lit(1)).as("n"),
            sum("r1").as("s1"), sum("r2").as("s2"),
            sum(col("r1").cast("decimal(38,0)") * col("r1")).as("s11"),
            sum(col("r2").cast("decimal(38,0)") * col("r2")).as("s22"),
            sum(col("r1").cast("decimal(38,0)") * col("r2")).as("s12"))
          .select(col("n").cast("long").as("n_rows"),
            round(num / den, 4).as("sort_locality"),
            (num / den > 0.8).as("zone_map_friendly"))
          .orderBy("n_rows")
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderdate AS dt
          FROM orders),
        r AS (SELECT k,
            CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS r1,
            CAST(row_number() OVER (ORDER BY dt, k) AS BIGINT) AS r2
          FROM o),
        ps AS (SELECT count(*) AS n,
            CAST(sum(r1) AS BIGINT) AS s1, CAST(sum(r2) AS BIGINT) AS s2,
            sum(CAST(r1 AS HUGEINT) * r1) AS s11,
            sum(CAST(r2 AS HUGEINT) * r2) AS s22,
            sum(CAST(r1 AS HUGEINT) * r2) AS s12
          FROM r)
        SELECT CAST(n AS BIGINT) AS n_rows,
          round((CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
            / (sqrt(CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
               * sqrt(CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)),
            4) AS sort_locality,
          (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
            / (sqrt(CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
               * sqrt(CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2))
            > 0.8 AS zone_map_friendly
        FROM ps ORDER BY n_rows""")),

    Q(
      "profile_value_patterns",
      "Value-pattern profiling (the Deequ/Great-Expectations shape " +
        "inference): every string masked to its character-class " +
        "skeleton (digits→9, letters→A, everything else verbatim), " +
        "then a pattern histogram per column — one glance shows " +
        "whether c_name really is 'Customer#000000000' everywhere " +
        "and which rows broke the contract. Two regexp_replace " +
        "passes per value (codegen'd), one hash aggregation; output " +
        "is bounded by distinct PATTERNS, not values.",
      (s, dir) => {
        def mask(c: Column): Column =
          regexp_replace(regexp_replace(c, "[0-9]", "9"), "[A-Za-z]", "A")
        val c = Tables.t(s, dir, "customer")
          .select(lit("c_name").as("col_name"),
            mask(col("c_name")).as("pattern"))
        val m = Tables.t(s, dir, "customer")
          .select(lit("c_mktsegment").as("col_name"),
            mask(col("c_mktsegment")).as("pattern"))
        val e = Tables.t(s, dir, "events")
          .select(lit("event_type").as("col_name"),
            mask(col("event_type")).as("pattern"))
        c.unionAll(m).unionAll(e)
          .groupBy("col_name", "pattern").agg(count(lit(1)).as("n"))
          .orderBy(col("col_name"), col("n").desc, col("pattern"))
      },
      Some("""WITH u AS (
          SELECT 'c_name' AS col_name,
            regexp_replace(regexp_replace(c_name, '[0-9]', '9', 'g'),
              '[A-Za-z]', 'A', 'g') AS pattern
          FROM customer
          UNION ALL
          SELECT 'c_mktsegment',
            regexp_replace(regexp_replace(c_mktsegment, '[0-9]', '9', 'g'),
              '[A-Za-z]', 'A', 'g')
          FROM customer
          UNION ALL
          SELECT 'event_type',
            regexp_replace(regexp_replace(event_type, '[0-9]', '9', 'g'),
              '[A-Za-z]', 'A', 'g')
          FROM events)
        SELECT col_name, pattern, count(*) AS n
        FROM u GROUP BY 1, 2
        ORDER BY col_name, n DESC, pattern""")),

    Q(
      "ts_ess",
      "Effective sample size of each event type's daily series — " +
        "n/(1+2Σρ_ℓ) over lags 1–5 (autocorrelated observations " +
        "carry less information; EVERY confidence interval computed " +
        "on a time series without this correction is too narrow). " +
        "Reuses ts_autocorr's exact spine: sorted-fold daily means, " +
        "lead windows per lag over the calendar-bounded per-type " +
        "partition, sorted-fold numerators; the ESS division " +
        "happens once, with the Σρ floored at 0 (the standard " +
        "positive-sequence truncation).",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
          .agg((sfold(col("value")) / count(lit(1))).as("x"))
        val mu = daily.groupBy("event_type")
          .agg((sfold(col("x")) / count(lit(1))).as("mu"),
            count(lit(1)).as("n"))
        val dm = daily.join(broadcast(mu), Seq("event_type"))
        val wSeq = Window.partitionBy("event_type").orderBy("d")
        val den = dm.groupBy("event_type")
          .agg(sfold((col("x") - col("mu")) * (col("x") - col("mu")))
            .as("den"))
        val nums = (1 to 5).map { l =>
          dm.withColumn("xl", lead("x", l).over(wSeq))
            .filter(col("xl").isNotNull)
            .groupBy("event_type")
            .agg(sfold((col("x") - col("mu")) * (col("xl") - col("mu")))
              .as(s"num$l"))
        }
        val joined = nums.foldLeft(den)((a, b) => a.join(b, "event_type"))
          .join(mu.select("event_type", "n"), "event_type")
        val rhoSum = (1 to 5).map(l => col(s"num$l") / col("den"))
          .reduce(_ + _)
        joined.select(col("event_type"), col("n").as("n_days"),
            round(greatest(rhoSum, lit(0.0)), 4).as("rho_sum"),
            round(col("n") / (lit(1.0) + greatest(rhoSum, lit(0.0)) * 2), 2)
              .as("ess"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            list_reduce(list_sort(list(value)), (a, b) -> a + b)
              / count(*) AS x
          FROM events GROUP BY 1, 2),
        mu AS (SELECT event_type,
            list_reduce(list_sort(list(x)), (a, b) -> a + b) / count(*)
              AS mu,
            count(*) AS n
          FROM daily GROUP BY 1),
        dm AS (SELECT daily.event_type, d, x, mu, n
          FROM daily JOIN mu USING (event_type)),
        den AS (SELECT event_type,
            list_reduce(list_sort(list((x - mu) * (x - mu))),
              (a, b) -> a + b) AS den
          FROM dm GROUP BY 1),
        lagged AS (SELECT event_type, mu,
            x, lead(x, 1) OVER w AS x1, lead(x, 2) OVER w AS x2,
            lead(x, 3) OVER w AS x3, lead(x, 4) OVER w AS x4,
            lead(x, 5) OVER w AS x5
          FROM dm WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        nums AS (SELECT event_type,
            list_reduce(list_sort(list((x - mu) * (x1 - mu))
              FILTER (WHERE x1 IS NOT NULL)), (a, b) -> a + b) AS num1,
            list_reduce(list_sort(list((x - mu) * (x2 - mu))
              FILTER (WHERE x2 IS NOT NULL)), (a, b) -> a + b) AS num2,
            list_reduce(list_sort(list((x - mu) * (x3 - mu))
              FILTER (WHERE x3 IS NOT NULL)), (a, b) -> a + b) AS num3,
            list_reduce(list_sort(list((x - mu) * (x4 - mu))
              FILTER (WHERE x4 IS NOT NULL)), (a, b) -> a + b) AS num4,
            list_reduce(list_sort(list((x - mu) * (x5 - mu))
              FILTER (WHERE x5 IS NOT NULL)), (a, b) -> a + b) AS num5
          FROM lagged GROUP BY 1)
        SELECT mu.event_type, mu.n AS n_days,
          round(greatest((num1 + num2 + num3 + num4 + num5) / den, 0.0),
            4) AS rho_sum,
          round(mu.n / (1.0 + greatest(
            (num1 + num2 + num3 + num4 + num5) / den, 0.0) * 2), 2)
            AS ess
        FROM mu JOIN den USING (event_type) JOIN nums USING (event_type)
        ORDER BY event_type""")),

    Q(
      "stats_tost",
      "Equivalence test (TOST) — are click and view event values " +
        "equivalent within a ±5% margin of the pooled mean? Two " +
        "one-sided z-tests against the margins: equivalence is " +
        "declared only when BOTH reject (min(t_lower, t_upper) > " +
        "1.645) — the non-inferiority discipline that 'p > 0.05 so " +
        "they're the same' gets wrong. Moments are exact cent power " +
        "sums in one conditional pass; margins, SEs and both t's " +
        "are fixed-shape floats evaluated once.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
        def side(t: String, c: Column): Column =
          sum(when(col("event_type") === t, c).otherwise(lit(0)))
        val a = e.agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n1"),
          side("click", col("c")).as("s1"),
          side("click", col("c").cast("decimal(38,0)") * col("c")).as("ss1"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n2"),
          side("view", col("c")).as("s2"),
          side("view", col("c").cast("decimal(38,0)") * col("c")).as("ss2"))
        def v(n: Column, sc: Column, ss: Column): Column =
          (ss.cast("double") - sc.cast("double") * sc / n) / (n - 1)
        val n1 = col("n1"); val n2 = col("n2")
        val m1 = col("s1").cast("double") / n1
        val m2 = col("s2").cast("double") / n2
        val diff = m1 - m2
        val margin = (col("s1") + col("s2")).cast("double")
          ./(n1 + n2) * 0.05
        val se = sqrt(v(n1, col("s1"), col("ss1")) / n1
          + v(n2, col("s2"), col("ss2")) / n2)
        val tLo = (diff + margin) / se
        val tHi = (margin - diff) / se
        a.select(round(diff / 100.0, 2).as("mean_diff"),
            round(margin / 100.0, 2).as("margin"),
            round(tLo, 4).as("t_lower"), round(tHi, 4).as("t_upper"),
            (least(tLo, tHi) > 1.644853627).as("equivalent"))
          .orderBy("margin")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE event_type IN ('click', 'view')),
        a AS (SELECT
            sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
            sum(CASE WHEN event_type = 'click' THEN c ELSE 0 END) AS s1,
            sum(CASE WHEN event_type = 'click'
              THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ss1,
            sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n2,
            sum(CASE WHEN event_type = 'view' THEN c ELSE 0 END) AS s2,
            sum(CASE WHEN event_type = 'view'
              THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ss2
          FROM e),
        f AS (SELECT
            CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS diff,
            CAST(s1 + s2 AS DOUBLE) / (n1 + n2) * 0.05 AS margin,
            sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                / (n1 - 1)) / n1
              + ((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                / (n2 - 1)) / n2) AS se
          FROM a)
        SELECT round(diff / 100.0, 2) AS mean_diff,
          round(margin / 100.0, 2) AS margin,
          round((diff + margin) / se, 4) AS t_lower,
          round((margin - diff) / se, 4) AS t_upper,
          least((diff + margin) / se, (margin - diff) / se)
            > 1.644853627 AS equivalent
        FROM f ORDER BY margin""")),

    Q(
      "ts_peak_concurrency",
      "Peak concurrent sessions \u2014 the classic +1/\u22121 boundary sweep " +
        "over purchase 'sessions' (start = ts, end = ts + value " +
        "seconds, the ts_interval_union construction): the maximum " +
        "of the running boundary sum IS the peak concurrency, the " +
        "number capacity planning actually needs. The running sum " +
        "over the global boundary order reuses the mm_shard_manifest " +
        "prefix-sum spine \u2014 range repartition on the boundary key, a " +
        "window PARTITIONED by physical partition id, per-partition " +
        "offsets from one sorted-array fold \u2014 NO single-task window; " +
        "the argmax is TakeOrderedAndProject over the summed " +
        "boundaries. Ends sort before starts at identical " +
        "timestamps (delta ASC), the no-touch-overlap convention.",
      (s, dir) => {
        val iv = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), Tables.epochUs(col("ts")).as("s0"),
            (Tables.epochUs(col("ts"))
              + (round(col("value") * 1000000)).cast("long")).as("e0"))
        val bounds = iv.select(col("s0").as("t"), lit(1).as("delta"),
            col("event_id"))
          .unionAll(iv.select(col("e0").as("t"), lit(-1).as("delta"),
            col("event_id")))
        // cut = correctness: see Skew.globalRank — boundaries re-sample
        // per execution and both subtrees consume this exchange
        val parted = Skew.cut(
          bounds.repartitionByRange(Skew.spineParts(bounds),
              col("t"), col("delta"), col("event_id"))
            .withColumn("pid", spark_partition_id().cast("long")))
        val w = Window.partitionBy("pid")
          .orderBy("t", "delta", "event_id")
        val local = parted.withColumn("lc", sum("delta").over(w))
        val offs = parted.groupBy("pid").agg(sum("delta").as("pb"))
          .agg(sort_array(collect_list(struct(col("pid"), col("pb"))))
            .as("a"))
          .select(explode(expr(
            "transform(a, (x, i) -> struct(x.pid AS pid, " +
              "aggregate(slice(a, 1, i), CAST(0 AS BIGINT), " +
              "(acc, y) -> acc + y.pb) AS off))")).as("o"))
          .select(col("o.pid").as("pid"), col("o.off").as("off"))
        val cum = local.join(broadcast(offs), "pid")
          .withColumn("conc", col("off") + col("lc"))
        cum
          .orderBy(col("conc").desc, col("t"), col("delta"),
            col("event_id"))
          .limit(1)
          .select(col("conc").as("peak_concurrency"),
            expr("t div 3600000000").as("peak_epoch_hour"))
      },
      Some("""WITH iv AS (SELECT event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS s0,
            epoch_us(CAST(ts AS TIMESTAMP))
              + CAST(round(value * 1000000) AS BIGINT) AS e0
          FROM events WHERE event_type = 'purchase'),
        b AS (SELECT s0 AS t, 1 AS delta, event_id FROM iv
          UNION ALL SELECT e0, -1, event_id FROM iv),
        c AS (SELECT t, delta, event_id,
            sum(delta) OVER (ORDER BY t, delta, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
          FROM b),
        rk AS (SELECT conc, t,
            row_number() OVER (ORDER BY conc DESC, t, delta, event_id)
              AS rk
          FROM c)
        SELECT CAST(conc AS BIGINT) AS peak_concurrency,
          t // 3600000000 AS peak_epoch_hour
        FROM rk WHERE rk = 1 ORDER BY peak_concurrency""")),

    Q(
      "stats_bh_fdr",
      "Benjamini\u2013Hochberg FDR control over the all-pairs Welch " +
        "family \u2014 the step-up procedure stats_pairwise_welch's fixed " +
        "Bonferroni threshold approximates: p-values from the " +
        "engine-portable Abramowitz\u2013Stegun normal CDF (a fixed-shape " +
        "float polynomial \u2014 no erf builtin needed in either engine, " +
        "doubles match bit for bit), ranks from a sorted-array fold " +
        "over the 10-row bounded family (no unpartitioned window), " +
        "and the largest rank with p \u2264 rank\u00b7\u03b1/m riding a 1-row " +
        "broadcast back as the significance cut.",
      (s, dir) => {
        val g = Tables.t(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sx"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("sxx"))
          .select(col("event_type"), col("n"),
            (col("sx").cast("double") / col("n")).as("m"),
            ((col("sxx").cast("double")
              - col("sx").cast("double") * col("sx") / col("n"))
              / (col("n") - 1)).as("v"))
        val pr = g.as("a").join(broadcast(g.as("b")),
            col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("ta"),
            col("b.event_type").as("tb"),
            ((col("a.m") - col("b.m"))
              / sqrt(col("a.v") / col("a.n") + col("b.v") / col("b.n")))
              .as("t"))
          .withColumn("pv", (lit(1.0) - normCdf(abs(col("t")))) * 2.0)
        val ranked = pr
          .agg(sort_array(collect_list(struct(col("pv"), col("ta"),
            col("tb"), col("t")))).as("arr"))
          .select(posexplode(col("arr")))
          .select((col("pos") + 1).as("rank"), col("col.ta").as("type_a"),
            col("col.tb").as("type_b"), col("col.t").as("t"),
            col("col.pv").as("pv"))
        val kmax = ranked
          .agg(max(when(col("pv") * 200 <= col("rank"), col("rank")))
            .as("kmax"))
        ranked.crossJoin(broadcast(kmax))
          .select(col("type_a"), col("type_b"), col("rank").cast("int")
              .as("rank"),
            round(col("t"), 4).as("t"), round(col("pv"), 6).as("p_value"),
            coalesce(col("rank") <= col("kmax"), lit(false)).as("sig_bh"))
          .orderBy("rank")
      },
      Some(s"""WITH g AS (SELECT event_type, count(*) AS n,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
            CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
              * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sxx
          FROM events GROUP BY 1),
        m AS (SELECT event_type, n, CAST(sx AS DOUBLE) / n AS m,
            (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
              AS v
          FROM g),
        pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
            (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS t
          FROM m a JOIN m b ON a.event_type < b.event_type),
        pv AS (SELECT ta, tb, t,
            (1.0 - ${normCdfSql("abs(t)")}) * 2.0 AS pv
          FROM pr),
        rk AS (SELECT ta, tb, t, pv,
            row_number() OVER (ORDER BY pv, ta, tb) AS rank
          FROM pv),
        km AS (SELECT max(CASE WHEN pv * 200 <= rank THEN rank END)
            AS kmax
          FROM rk)
        SELECT ta AS type_a, tb AS type_b, CAST(rank AS INT) AS rank,
          round(t, 4) AS t, round(pv, 6) AS p_value,
          coalesce(rank <= kmax, false) AS sig_bh
        FROM rk CROSS JOIN km ORDER BY rank""")),

    Q(
      "stats_power_curve",
      "Statistical power vs sample size \u2014 for the observed daily-" +
        "conversion baseline and the 2% relative lift " +
        "stats_sample_size targets, the detection probability at " +
        "n \u2208 {10k, 50k, 100k, 500k} per arm: power = " +
        "\u03a6(\u221an\u00b7\u0394/\u221a(p\u2081q\u2081+p\u2082q\u2082) \u2212 z_{\u03b1/2}) on the same portable " +
        "normal-CDF polynomial as stats_bh_fdr. One distinct-count " +
        "pass; the n grid explodes from a literal array; every " +
        "float is a fixed-shape formula evaluated once per row.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            dayofmonth(col("ts")).as("d"))
        val a = ev.agg(
          countDistinct(struct(col("user_id"), col("d"))).as("nu"),
          countDistinct(when(col("event_type") === "purchase",
            struct(col("user_id"), col("d")))).as("np"))
        val p1 = col("np").cast("double") / col("nu")
        val p2 = p1 * lit(1.02)
        val sig = sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
        val base = a.select(p1.as("p1"), p2.as("p2"), sig.as("sig"))
          .select(col("p1"), col("p2"), col("sig"),
            explode(array(lit(10000), lit(50000), lit(100000),
              lit(500000))).as("n"))
        val z = (sqrt(col("n").cast("double")) * (col("p2") - col("p1"))
          / col("sig")) - lit(1.959963985)
        base.select(col("n"), round(col("p1"), 4).as("baseline"),
            round(normCdf(z), 4).as("power"))
          .orderBy("n")
      },
      Some(s"""WITH ev AS (SELECT event_type, user_id,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d FROM events),
        a AS (SELECT count(DISTINCT (user_id, d)) AS nu,
            count(DISTINCT CASE WHEN event_type = 'purchase'
              THEN (user_id, d) END) AS np
          FROM ev),
        b AS (SELECT CAST(np AS DOUBLE) / nu AS p1,
            CAST(np AS DOUBLE) / nu * 1.02 AS p2 FROM a),
        c AS (SELECT p1, p2,
            sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS sig,
            unnest([10000, 50000, 100000, 500000]) AS n
          FROM b),
        zc AS (SELECT n, p1,
            sqrt(CAST(n AS DOUBLE)) * (p2 - p1) / sig - 1.959963985 AS z
          FROM c)
        SELECT CAST(n AS INT) AS n, round(p1, 4) AS baseline,
          round(${normCdfSql("z")}, 4) AS power
        FROM zc ORDER BY n""")),

    Q(
      "stats_median_ci",
      "Distribution-free confidence interval for the median \u2014 the " +
        "binomial order-statistic bracket (ranks (n \u00b1 z\u221an)/2 of the " +
        "sorted sample contain the true median with ~95% coverage, " +
        "NO normality assumption \u2014 the robust companion to the " +
        "mean-based intervals everywhere else in the stats family). " +
        "Per event type over the calendar-bounded daily series: " +
        "sorted integer-cent arrays, rank arithmetic in identical " +
        "float floor/ceil in both engines, doubled-middle median.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d").agg(sum("cents").as("y"))
        val zc = lit(1.959963985)
        val agg = daily.groupBy("event_type")
          .agg(sort_array(collect_list("y")).as("arr"),
            count(lit(1)).as("n"))
        val nD = col("n").cast("double")
        val loR = greatest(lit(1),
          floor((nD - zc * sqrt(nD)) / 2).cast("int"))
        val hiR = least(col("n").cast("int"),
          (ceil((nD + zc * sqrt(nD)) / 2) + 1).cast("int"))
        val m2 = element_at(col("arr"), floor((col("n") + 1) / 2).cast("int"))
          .plus(element_at(col("arr"), (floor(col("n") / 2) + 1).cast("int")))
        agg.select(col("event_type"), col("n").as("n_days"),
            round(m2 / 2.0 / 100.0, 2).as("median"),
            round(element_at(col("arr"), loR) / 100.0, 2).as("ci_lo"),
            round(element_at(col("arr"), hiR) / 100.0, 2).as("ci_hi"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        a AS (SELECT event_type, list_sort(list(y)) AS arr,
            count(*) AS n
          FROM daily GROUP BY 1),
        r AS (SELECT event_type, arr, n, CAST(n AS DOUBLE) AS nd
          FROM a)
        SELECT event_type, n AS n_days,
          round((arr[(n + 1) // 2] + arr[n // 2 + 1]) / 2.0 / 100.0, 2)
            AS median,
          round(arr[CAST(greatest(1,
            floor((nd - 1.959963985 * sqrt(nd)) / 2)) AS INT)]
            / 100.0, 2) AS ci_lo,
          round(arr[CAST(least(CAST(n AS INT),
            ceil((nd + 1.959963985 * sqrt(nd)) / 2) + 1) AS INT)]
            / 100.0, 2) AS ci_hi
        FROM r ORDER BY event_type""")),

    Q(
      "ts_seasonal_strength",
      "Seasonal-strength score per event type \u2014 the share of " +
        "detrended variance explained by the ISO-weekday pattern, " +
        "max(0, 1 \u2212 Var(deseasonalized)/Var(detrended)) (the STL-" +
        "style F_s statistic that says whether ts_dow_seasonal's " +
        "indices are signal or noise). Reuses the exact-power-sum " +
        "linear fit; residuals, weekday means, and both variances " +
        "run through sorted folds over the calendar-bounded series " +
        "\u2014 bit-stable at any parallelism.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"),
            (weekday(col("ts")) + 1).as("dow"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("event_type", "d", "dow").agg(sum("cents").as("y"))
        val fit = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("d").as("sx"), sum("y").as("sy"),
            sum(col("d") * col("d")).as("sxx"),
            sum(col("d") * col("y")).as("sxy"))
          .select(col("event_type"),
            ((col("n") * col("sxy") - col("sx").cast("double") * col("sy"))
              / (col("n") * col("sxx")
                - col("sx").cast("double") * col("sx"))).as("slope"),
            col("sy").cast("double").as("syd"),
            col("sx").cast("double").as("sxd"),
            col("n").cast("double").as("nd"))
          .select(col("event_type"), col("slope"),
            ((col("syd") - col("slope") * col("sxd")) / col("nd"))
              .as("icept"))
        val resid = daily.join(broadcast(fit), "event_type")
          .withColumn("r",
            col("y") - (col("icept") + col("slope") * col("d")))
        val seas = resid.groupBy("event_type", "dow")
          .agg((sfold(col("r")) / count(lit(1))).as("sdow"))
        val e = resid.join(broadcast(seas), Seq("event_type", "dow"))
          .withColumn("e", col("r") - col("sdow"))
        val vr = e.groupBy("event_type")
          .agg(sfold(col("r") * col("r")).as("ssr"),
            sfold(col("e") * col("e")).as("sse"),
            count(lit(1)).as("n"))
        vr.select(col("event_type"), col("n").as("n_days"),
            round(greatest(lit(0.0),
              lit(1.0) - col("sse") / col("ssr")), 4).as("seasonal_strength"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d,
            CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2, 3),
        fit0 AS (SELECT event_type, count(*) AS n,
            CAST(sum(d) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            sum(d * d) AS sxx, sum(d * y) AS sxy
          FROM daily GROUP BY 1),
        fit AS (SELECT event_type,
            (n * sxy - CAST(sx AS DOUBLE) * sy)
              / (n * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
            (CAST(sy AS DOUBLE) - ((n * sxy - CAST(sx AS DOUBLE) * sy)
              / (n * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n AS icept
          FROM fit0),
        resid AS (SELECT daily.event_type, d, dow,
            y - (icept + slope * d) AS r
          FROM daily JOIN fit USING (event_type)),
        seas AS (SELECT event_type, dow,
            list_reduce(list_sort(list(r)), (a, b) -> a + b) / count(*)
              AS sdow
          FROM resid GROUP BY 1, 2),
        e AS (SELECT resid.event_type, r, r - sdow AS e
          FROM resid JOIN seas USING (event_type, dow)),
        vr AS (SELECT event_type,
            list_reduce(list_sort(list(r * r)), (a, b) -> a + b) AS ssr,
            list_reduce(list_sort(list(e * e)), (a, b) -> a + b) AS sse,
            count(*) AS n
          FROM e GROUP BY 1)
        SELECT event_type, n AS n_days,
          round(greatest(0.0, 1.0 - sse / ssr), 4) AS seasonal_strength
        FROM vr ORDER BY event_type""")),

    Q(
      "stats_cohens_kappa",
      "Cohen's kappa between two deterministic labelers (char-count " +
        "floor vs alphabetic-ratio floor) per source — the chance-" +
        "corrected inter-annotator agreement a labeling pipeline " +
        "reports instead of raw percent agreement (two raters who " +
        "both say 'good' 95% of the time agree 90.5% by luck alone). " +
        "One scan, one hash aggregation; every cell of the 2×2 " +
        "confusion table is an exact integer count, kappa = " +
        "(po−pe)/(1−pe) is float math AFTER aggregation, so the " +
        "result is bit-identical across engines and partitionings.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("source"),
            (col("n_chars") >= 300).cast("int").as("ra"),
            (length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
              length(regexp_replace(col("text"), " ", "")) >= 0.8).cast("int").as("rb"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum((col("ra") === 1 && col("rb") === 1).cast("long")).as("n11"),
            sum((col("ra") === 0 && col("rb") === 0).cast("long")).as("n00"),
            sum(col("ra").cast("long")).as("a1"),
            sum(col("rb").cast("long")).as("b1"))
          .select(col("source"), col("n_docs"),
            round((col("n11") + col("n00")).cast("double") / col("n_docs"), 4).as("po"),
            round((col("a1") * col("b1") +
              (col("n_docs") - col("a1")) * (col("n_docs") - col("b1"))).cast("double") /
              (col("n_docs") * col("n_docs")), 4).as("pe"),
            round(
              when(lit(1.0) - (col("a1") * col("b1") +
                  (col("n_docs") - col("a1")) * (col("n_docs") - col("b1"))).cast("double") /
                  (col("n_docs") * col("n_docs")) === 0.0, lit(0.0))
                .otherwise(
                  ((col("n11") + col("n00")).cast("double") / col("n_docs") -
                    (col("a1") * col("b1") +
                      (col("n_docs") - col("a1")) * (col("n_docs") - col("b1"))).cast("double") /
                      (col("n_docs") * col("n_docs"))) /
                  (lit(1.0) - (col("a1") * col("b1") +
                    (col("n_docs") - col("a1")) * (col("n_docs") - col("b1"))).cast("double") /
                    (col("n_docs") * col("n_docs")))), 4).as("kappa"))
          .orderBy("source")
      },
      Some("""WITH v AS (SELECT source,
            CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
            CASE WHEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
              / length(replace(text, ' ', '')) >= 0.8 THEN 1 ELSE 0 END AS rb
          FROM documents),
        c AS (SELECT source, count(*) AS n_docs,
            CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
            CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
            CAST(sum(ra) AS BIGINT) AS a1, CAST(sum(rb) AS BIGINT) AS b1
          FROM v GROUP BY 1)
        SELECT source, n_docs,
          round(CAST(n11 + n00 AS DOUBLE) / n_docs, 4) AS po,
          round(CAST(a1 * b1 + (n_docs - a1) * (n_docs - b1) AS DOUBLE)
            / (n_docs * n_docs), 4) AS pe,
          round(CASE WHEN 1.0 - CAST(a1 * b1 + (n_docs - a1) * (n_docs - b1) AS DOUBLE)
              / (n_docs * n_docs) = 0.0 THEN 0.0
            ELSE (CAST(n11 + n00 AS DOUBLE) / n_docs
                - CAST(a1 * b1 + (n_docs - a1) * (n_docs - b1) AS DOUBLE)
                  / (n_docs * n_docs))
              / (1.0 - CAST(a1 * b1 + (n_docs - a1) * (n_docs - b1) AS DOUBLE)
                  / (n_docs * n_docs)) END, 4) AS kappa
        FROM c ORDER BY source""")),

    Q(
      "stats_fleiss_kappa",
      "Fleiss' kappa across THREE deterministic labelers (char floor, " +
        "alpha ratio, mean word length) over the whole corpus — the " +
        "multi-rater generalization Cohen's pairwise kappa can't " +
        "express, the standard agreement gate before pooling crowd or " +
        "model annotations into training labels. Per item the " +
        "agreement numerator n1²+n0²−3 is a small integer (6 when " +
        "unanimous, 2 when split), so the corpus aggregate is one " +
        "exact integer sum; P̄, Pe and kappa are float divisions after " +
        "the aggregation — bit-identical across engines.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            ((col("n_chars") >= 300).cast("int") +
              (length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
                length(regexp_replace(col("text"), " ", "")) >= 0.8).cast("int") +
              (length(regexp_replace(col("text"), " ", "")).cast("double") /
                size(split(col("text"), " ")) >= 4.0).cast("int")).as("n1"))
        d.agg(count(lit(1)).as("n_items"),
            sum((col("n1") * col("n1") + (lit(3) - col("n1")) * (lit(3) - col("n1")) -
              lit(3)).cast("long")).as("num"),
            sum(col("n1").cast("long")).as("s1"))
          .select(col("n_items"),
            round(col("num").cast("double") / (col("n_items") * 6), 6).as("p_bar"),
            round(pow(col("s1").cast("double") / (col("n_items") * 3), 2) +
              pow(lit(1.0) - col("s1").cast("double") / (col("n_items") * 3), 2), 6)
              .as("p_e"),
            round((col("num").cast("double") / (col("n_items") * 6) -
              (pow(col("s1").cast("double") / (col("n_items") * 3), 2) +
                pow(lit(1.0) - col("s1").cast("double") / (col("n_items") * 3), 2))) /
              (lit(1.0) -
                (pow(col("s1").cast("double") / (col("n_items") * 3), 2) +
                  pow(lit(1.0) - col("s1").cast("double") / (col("n_items") * 3), 2))), 6)
              .as("kappa"))
      },
      Some("""WITH v AS (SELECT
            (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
             + CASE WHEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                 / length(replace(text, ' ', '')) >= 0.8 THEN 1 ELSE 0 END
             + CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) >= 4.0 THEN 1 ELSE 0 END) AS n1
          FROM documents),
        c AS (SELECT count(*) AS n_items,
            CAST(sum(n1 * n1 + (3 - n1) * (3 - n1) - 3) AS BIGINT) AS num,
            CAST(sum(n1) AS BIGINT) AS s1
          FROM v)
        SELECT n_items,
          round(CAST(num AS DOUBLE) / (n_items * 6), 6) AS p_bar,
          round(pow(CAST(s1 AS DOUBLE) / (n_items * 3), 2)
            + pow(1.0 - CAST(s1 AS DOUBLE) / (n_items * 3), 2), 6) AS p_e,
          round((CAST(num AS DOUBLE) / (n_items * 6)
              - (pow(CAST(s1 AS DOUBLE) / (n_items * 3), 2)
                + pow(1.0 - CAST(s1 AS DOUBLE) / (n_items * 3), 2)))
            / (1.0 - (pow(CAST(s1 AS DOUBLE) / (n_items * 3), 2)
                + pow(1.0 - CAST(s1 AS DOUBLE) / (n_items * 3), 2))), 6) AS kappa
        FROM c""")),

    Q(
      "stats_calibration_ece",
      "Reliability diagram + expected calibration error of a " +
        "deterministic quality scorer: a fixed logistic over the char " +
        "count plays the classifier, the alphabetic-ratio gate plays " +
        "ground truth, scores bucket into 10 confidence bins " +
        "(midpoint convention, so per-bin confidence is exact, not a " +
        "float average — the binned-ECE estimator every model-quality " +
        "dashboard uses). Per-bin counts are exact integers from one " +
        "hash aggregation; the 10-row ECE weighted sum rides a sorted " +
        "fold, so the headline number is bit-identical across engines " +
        "and never touches an unsorted float aggregation.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(
            (lit(1.0) / (lit(1.0) +
              exp((lit(300.0) - col("n_chars")) / 120.0))).as("score"),
            (length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
              length(regexp_replace(col("text"), " ", "")) >= 0.75).cast("int").as("y"))
          .select(least(floor(col("score") * 10).cast("int"), lit(9)).as("bin"), col("y"))
        val bins = d.groupBy("bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("y").cast("long")).as("n_pos"))
          .select(col("bin"), col("n_docs"), col("n_pos"),
            ((col("bin") + lit(0.5)) / 10.0).as("conf"),
            (col("n_pos").cast("double") / col("n_docs")).as("acc"))
          .withColumn("gap", abs(col("acc") - col("conf")))
        val tot = bins
          .agg(sfold(col("n_docs") * col("gap")).as("wgap"),
            sum(col("n_docs")).as("n"))
          .select(round(col("wgap") / col("n"), 6).as("ece"))
        bins.crossJoin(broadcast(tot))
          .select(col("bin"), col("n_docs"), col("n_pos"),
            round(col("conf"), 2).as("conf"), round(col("acc"), 4).as("acc"),
            round(col("gap"), 4).as("gap"), col("ece"))
          .orderBy("bin")
      },
      Some("""WITH d AS (SELECT
            CAST(least(floor((1.0 / (1.0 + exp((300.0 - n_chars) / 120.0))) * 10),
              9) AS INT) AS bin,
            CASE WHEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
              / length(replace(text, ' ', '')) >= 0.75 THEN 1 ELSE 0 END AS y
          FROM documents),
        bins AS (SELECT bin, count(*) AS n_docs,
            CAST(sum(y) AS BIGINT) AS n_pos,
            (bin + 0.5) / 10.0 AS conf,
            CAST(sum(y) AS BIGINT) / CAST(count(*) AS DOUBLE) AS acc
          FROM d GROUP BY bin),
        g AS (SELECT *, abs(acc - conf) AS gap FROM bins),
        tot AS (SELECT
            round(list_reduce(list_sort(list(n_docs * gap)), (a, b) -> a + b)
              / CAST(sum(n_docs) AS DOUBLE), 6) AS ece
          FROM g)
        SELECT bin, n_docs, n_pos, round(conf, 2) AS conf,
          round(acc, 4) AS acc, round(gap, 4) AS gap, ece
        FROM g CROSS JOIN tot ORDER BY bin""")),

    Q(
      "ts_periodogram",
      "Discrete-Fourier periodogram of the daily event-count series " +
        "per event type at harmonics k=1..8 — the spectral-density " +
        "screen for hidden cycles (weekly seasonality shows as power " +
        "at k ≈ n_days/7) that complements the autocorrelation view " +
        "(ts_autocorr finds lags, the periodogram finds frequencies). " +
        "The scan aggregates to calendar-bounded daily rows first, so " +
        "the trig stage touches ≤ |days|×8 rows regardless of corpus " +
        "size; every float sum (a_k, b_k, the variance normalizer) " +
        "rides a sorted fold over that bounded group — bit-identical " +
        "across engines and partitionings.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts").cast("timestamp")).as("d"))
          .agg(count(lit(1)).as("y"))
        val base = daily.groupBy("event_type")
          .agg(min(col("d")).as("d0"), count(lit(1)).as("n"),
            sum(col("y")).as("sy"))
        val dev = daily.join(base, "event_type")
          .select(col("event_type"), col("n"),
            datediff(col("d"), col("d0")).as("t"),
            (col("y") - col("sy") / col("n")).as("dev"))
        val terms = dev
          .crossJoin(broadcast(
            s.range(1, 9).select(col("id").cast("int").as("k"))))
          .select(col("event_type"), col("k"), col("n"), col("dev"),
            (col("dev") * cos(lit(6.283185307179586) * col("k") * col("t") / col("n"))).as("c"),
            (col("dev") * sin(lit(6.283185307179586) * col("k") * col("t") / col("n"))).as("s"))
        terms.groupBy(col("event_type"), col("k"))
          .agg(max(col("n")).as("n"), sfold(col("c")).as("a"),
            sfold(col("s")).as("b"), sfold(col("dev") * col("dev")).as("ss"))
          .select(col("event_type"), col("k"), col("n").as("n_days"),
            round((col("a") * col("a") + col("b") * col("b")) / col("n"), 4).as("power"),
            round((col("a") * col("a") + col("b") * col("b")) / col("ss"), 6).as("var_frac"))
          .orderBy("event_type", "k")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
            count(*) AS y
          FROM events GROUP BY 1, 2),
        base AS (SELECT event_type, min(d) AS d0, count(*) AS n,
            CAST(sum(y) AS BIGINT) AS sy
          FROM daily GROUP BY 1),
        dev AS (SELECT daily.event_type, n,
            CAST(date_diff('day', d0, d) AS INT) AS t,
            y - sy / n AS dev
          FROM daily JOIN base USING (event_type)),
        terms AS (SELECT event_type, CAST(ks.k AS INT) AS k, n, dev,
            dev * cos(CAST(6.283185307179586 AS DOUBLE) * CAST(ks.k AS INT) * t / n) AS c,
            dev * sin(CAST(6.283185307179586 AS DOUBLE) * CAST(ks.k AS INT) * t / n) AS s
          FROM dev CROSS JOIN (SELECT unnest(range(1, 9)) AS k) ks),
        agg AS (SELECT event_type, k, max(n) AS n,
            list_reduce(list_sort(list(c)), (x, y) -> x + y) AS a,
            list_reduce(list_sort(list(s)), (x, y) -> x + y) AS b,
            list_reduce(list_sort(list(dev * dev)), (x, y) -> x + y) AS ss
          FROM terms GROUP BY 1, 2)
        SELECT event_type, k, n AS n_days,
          round((a * a + b * b) / n, 4) AS power,
          round((a * a + b * b) / ss, 6) AS var_frac
        FROM agg ORDER BY event_type, k""")),

    Q(
      "ts_hurst",
      "Hurst exponent of the hourly event-count series by rescaled-" +
        "range (R/S) analysis over block sizes 8/16/32/64 — the " +
        "long-memory diagnostic (H≈0.5 random walk, H>0.5 trending, " +
        "H<0.5 mean-reverting) a capacity-planning pipeline runs on " +
        "its load series. Days are indexed positionally on the " +
        "scalable rank spine (the daily series has calendar gaps that " +
        "would starve wide blocks); blocks are calendar-bounded; the " +
        "in-block " +
        "cumulative deviation rides an ORDER BY t running window " +
        "(sequential, so both engines add in the same order), the " +
        "per-block and per-size reductions ride sorted folds, and the " +
        "final log-log slope is a closed-form 4-point regression — " +
        "no unsorted float aggregation anywhere.",
      (s, dir) => {
        val hourly = Tables.t(s, dir, "events")
          .groupBy(date_trunc("HOUR", col("ts").cast("timestamp")).as("d"))
          .agg(count(lit(1)).as("y"))
        // positional hour index (not calendar arithmetic): the series
        // has gaps, and a gapped block would never reach its full
        // width — rank the hours on the scalable rank spine instead
        val t = Skew.globalRank(hourly, Seq(col("d")), rankCol = "__rank")
          .select((col("__rank") - 1).cast("int").as("t"), col("y"))
        val sized = t.crossJoin(broadcast(
            s.range(3, 7).select(pow(lit(2.0), col("id")).cast("int").as("w"))))
          .select(col("w"), floor(col("t") / col("w")).cast("long").as("blk"),
            col("t"), col("y"))
        val withStats = sized
          .withColumn("nb", count(lit(1)).over(Window.partitionBy("w", "blk")))
          .filter(col("nb") === col("w"))
          .withColumn("mean",
            sum(col("y")).over(Window.partitionBy("w", "blk")).cast("double") / col("w"))
          .withColumn("dev", col("y") - col("mean"))
          .withColumn("cum", sum(col("dev")).over(
            Window.partitionBy("w", "blk").orderBy("t")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val rs = withStats.groupBy("w", "blk")
          .agg(max(col("cum")).as("mx"), min(col("cum")).as("mn"),
            sfold(col("dev") * col("dev")).as("ssd"))
          .filter(col("ssd") > 0)
          .select(col("w"),
            ((col("mx") - col("mn")) / sqrt(col("ssd") / col("w"))).as("rs"))
        val perW = rs.groupBy("w")
          .agg(count(lit(1)).as("n_blocks"), sfold(col("rs")).as("srs"))
          .select(col("w"), col("n_blocks"),
            (col("srs") / col("n_blocks")).as("mean_rs"))
        val fit = perW
          .agg(count(lit(1)).as("np"),
            sfold(log(col("w").cast("double"))).as("sx"),
            sfold(log(col("mean_rs"))).as("sy"),
            sfold(log(col("w").cast("double")) * log(col("w").cast("double"))).as("sxx"),
            sfold(log(col("w").cast("double")) * log(col("mean_rs"))).as("sxy"))
          .select(round((col("np") * col("sxy") - col("sx") * col("sy")) /
            (col("np") * col("sxx") - col("sx") * col("sx")), 4).as("hurst"))
        perW.crossJoin(broadcast(fit))
          .select(col("w"), col("n_blocks"), round(col("mean_rs"), 4).as("mean_rs"),
            col("hurst"))
          .orderBy("w")
      },
      Some("""WITH hourly AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS d, count(*) AS y
          FROM events GROUP BY 1),
        t AS (SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS INT) AS t, y
          FROM hourly),
        sized AS (SELECT CAST(ws.w AS INT) AS w, t // CAST(ws.w AS INT) AS blk, t, y
          FROM t CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS w) ws),
        ws AS (SELECT w, blk, t, y,
            count(*) OVER (PARTITION BY w, blk) AS nb,
            CAST(CAST(sum(y) OVER (PARTITION BY w, blk) AS BIGINT) AS DOUBLE) / w
              AS mean
          FROM sized),
        cums AS (SELECT w, blk, y - mean AS dev,
            sum(y - mean) OVER (PARTITION BY w, blk ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM ws WHERE nb = w),
        rs AS (SELECT w,
            (max(cum) - min(cum))
              / sqrt(list_reduce(list_sort(list(dev * dev)), (a, b) -> a + b) / w)
              AS rs
          FROM cums GROUP BY w, blk
          HAVING list_reduce(list_sort(list(dev * dev)), (a, b) -> a + b) > 0),
        perw AS (SELECT w, count(*) AS n_blocks,
            list_reduce(list_sort(list(rs)), (a, b) -> a + b) / count(*) AS mean_rs
          FROM rs GROUP BY w),
        fit AS (SELECT
            round((count(*) * list_reduce(list_sort(list(ln(CAST(w AS DOUBLE)) * ln(mean_rs))), (a, b) -> a + b)
                - list_reduce(list_sort(list(ln(CAST(w AS DOUBLE)))), (a, b) -> a + b)
                  * list_reduce(list_sort(list(ln(mean_rs))), (a, b) -> a + b))
              / (count(*) * list_reduce(list_sort(list(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE)))), (a, b) -> a + b)
                - list_reduce(list_sort(list(ln(CAST(w AS DOUBLE)))), (a, b) -> a + b)
                  * list_reduce(list_sort(list(ln(CAST(w AS DOUBLE)))), (a, b) -> a + b)), 4)
              AS hurst
          FROM perw)
        SELECT w, n_blocks, round(mean_rs, 4) AS mean_rs, hurst
        FROM perw CROSS JOIN fit ORDER BY w""")),

    Q(
      "stats_hodges_lehmann",
      "Hodges–Lehmann shift estimator between the view and click " +
        "daily-count series: the median of all cross-pair differences " +
        "— the robust location-shift measure behind the Mann-Whitney " +
        "test (stats_mann_whitney reports the rank p-value; this " +
        "reports the SIZE of the shift, which the test alone can't). " +
        "Both inputs aggregate to calendar-bounded daily rows before " +
        "the |days|² pair fan-out, differences are exact integers, " +
        "and the median reads two positions of one sorted array — " +
        "no float accumulation anywhere.",
      (s, dir) => {
        def daily(t: String) = Tables.t(s, dir, "events")
          .filter(col("event_type") === t)
          .groupBy(to_date(col("ts").cast("timestamp")).as("d"))
          .agg(count(lit(1)).as("y"))
        val x = daily("view").select(col("y").as("x"))
        val yv = daily("click").select(col("y").as("y"))
        val diffs = x.crossJoin(yv).select((col("x") - col("y")).as("diff"))
        diffs.agg(count(lit(1)).as("n_pairs"),
            sort_array(collect_list(col("diff"))).as("sd"),
            sum(col("diff")).as("sdiff"))
          .select(col("n_pairs"),
            (when(col("n_pairs") % 2 === 1,
              element_at(col("sd"), ((col("n_pairs") + 1) / 2).cast("int"))
                .cast("double"))
              .otherwise((element_at(col("sd"), (col("n_pairs") / 2).cast("int")) +
                element_at(col("sd"), (col("n_pairs") / 2 + 1).cast("int")))
                .cast("double") / 2.0)).as("hl_shift"),
            round(col("sdiff").cast("double") / col("n_pairs"), 4)
              .as("mean_shift"))
          .orderBy("n_pairs")
      },
      Some("""WITH dv AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
            count(*) AS y
          FROM events WHERE event_type = 'view' GROUP BY 1),
        dc AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
            count(*) AS y
          FROM events WHERE event_type = 'click' GROUP BY 1),
        diffs AS (SELECT CAST(a.y - b.y AS BIGINT) AS diff
          FROM dv a CROSS JOIN dc b),
        agg AS (SELECT count(*) AS n_pairs,
            list_sort(list(diff)) AS sd,
            CAST(sum(diff) AS BIGINT) AS sdiff
          FROM diffs)
        SELECT n_pairs,
          CASE WHEN n_pairs % 2 = 1
            THEN CAST(sd[CAST((n_pairs + 1) // 2 AS INT)] AS DOUBLE)
            ELSE CAST(sd[CAST(n_pairs // 2 AS INT)]
              + sd[CAST(n_pairs // 2 + 1 AS INT)] AS DOUBLE) / 2.0 END
            AS hl_shift,
          round(CAST(sdiff AS DOUBLE) / n_pairs, 4) AS mean_shift
        FROM agg ORDER BY n_pairs""")),

    Q(
      "stats_durbin_watson",
      "Durbin–Watson serial-correlation statistic on the residuals of " +
        "each event type's daily linear trend — the autocorrelated-" +
        "errors diagnostic that tells a forecaster whether an OLS " +
        "trend's standard errors can be believed (DW≈2 independent, " +
        "→0 positive, →4 negative serial correlation). The trend fit " +
        "is closed-form from exact integer moments; residual terms " +
        "ride sorted folds over the calendar-bounded daily rows; the " +
        "lag difference runs in one ordered window per type.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts").cast("timestamp")).as("d"))
          .agg(count(lit(1)).as("y"))
          .withColumn("t", datediff(col("d"), lit("2024-01-01").cast("date")))
        val fit = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("t").cast("long")).as("sx"),
            sum(col("y")).as("sy"), sum((col("t") * col("t")).cast("long")).as("sxx"),
            sum((col("t") * col("y")).cast("long")).as("sxy"))
          .select(col("event_type"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
            col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"))
          .select(col("event_type"), col("slope"),
            ((col("sy").cast("double") - col("slope") * col("sx")) / col("n"))
              .as("icept"))
        val resid = daily.join(fit, "event_type")
          .select(col("event_type"), col("t"),
            (col("y") - (col("icept") + col("slope") * col("t"))).as("e"))
        val lagged = resid.withColumn("ep",
          lag(col("e"), 1).over(Window.partitionBy("event_type").orderBy("t")))
        lagged.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sfold(when(col("ep").isNotNull,
              (col("e") - col("ep")) * (col("e") - col("ep"))).otherwise(lit(0.0)))
              .as("num"),
            sfold(col("e") * col("e")).as("den"))
          .select(col("event_type"), col("n_days"),
            round(col("num") / col("den"), 4).as("dw"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        td AS (SELECT event_type,
            CAST(date_diff('day', DATE '2024-01-01', d) AS INT) AS t, y
          FROM daily),
        fit0 AS (SELECT event_type, count(*) AS n,
            CAST(sum(t) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(t * t) AS BIGINT) AS sxx,
            CAST(sum(t * y) AS BIGINT) AS sxy
          FROM td GROUP BY 1),
        fit AS (SELECT event_type,
            CAST(n * sxy - sx * sy AS DOUBLE)
              / (n * sxx - sx * sx) AS slope,
            n, sx, sy
          FROM fit0),
        f2 AS (SELECT event_type, slope,
            (CAST(sy AS DOUBLE) - slope * sx) / n AS icept
          FROM fit),
        resid AS (SELECT td.event_type, t,
            y - (icept + slope * t) AS e
          FROM td JOIN f2 USING (event_type)),
        lagged AS (SELECT event_type, e,
            lag(e) OVER (PARTITION BY event_type ORDER BY t) AS ep
          FROM resid)
        SELECT event_type, count(*) AS n_days,
          round(list_reduce(list_sort(list(
              CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep)
                ELSE 0.0 END)), (a, b) -> a + b)
            / list_reduce(list_sort(list(e * e)), (a, b) -> a + b), 4)
            AS dw
        FROM lagged GROUP BY event_type ORDER BY event_type""")),

    Q(
      "ts_dtw",
      "Dynamic-time-warping distance between every pair of event " +
        "types' 24-hour activity profiles — the elastic similarity " +
        "measure that matches shifted diurnal shapes where Euclidean/" +
        "L1 can't (a profile 2 hours ahead of another is DTW-close " +
        "but L1-far). The DP runs entirely in exact integers (|Δ| " +
        "costs over hourly counts): row 1 is seeded directly as its " +
        "prefix-cost array D(1,j) = C_j (so the zero origin is " +
        "reachable only at k = 1), then each of the 23 unrolled row " +
        "updates uses the prefix-min reformulation D(i,j) = C_j + " +
        "min_k(m_k − C_{k−1}) so the within-row sequential dependency " +
        "becomes a data-parallel O(24²) array expression — no driver " +
        "loop, no float, and DTW ≤ L1 (the diagonal path) by " +
        "construction, pinned in Round11bSpec. Profiles are 24-int " +
        "packed rows, so the whole DP touches |types|² tiny rows " +
        "regardless of corpus size.",
      (s, dir) => {
        val hourly = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts").cast("timestamp")).as("h"))
          .agg(count(lit(1)).as("y"))
        val grid = Tables.t(s, dir, "events").select("event_type").distinct()
          .crossJoin(broadcast(s.range(0, 24).select(col("id").cast("int").as("h"))))
          .join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"), coalesce(col("y"), lit(0L)).as("y"))
        val prof = grid.groupBy("event_type")
          .agg(expr("transform(sort_array(collect_list(struct(h, y))), x -> x.y)")
            .as("p"))
        // row 1 of the DP is its own prefix-cost array D(1,j) = C_j —
        // seeding it directly (instead of a [0, BIG, ...] sentinel row)
        // keeps the zero origin reachable ONLY at k = 1, so no path can
        // enter row 1 past column 1 with a -C_{k-1} credit and skip the
        // first-cell cost
        var pairs = prof.select(col("event_type").as("ta"), col("p").as("pa"))
          .join(prof.select(col("event_type").as("tb"), col("p").as("pb")),
            col("ta") < col("tb"))
          .withColumn("r", expr(
            "transform(sequence(1, 24), j -> aggregate(transform(sequence(1, j), " +
              "t -> abs(element_at(pa, 1) - element_at(pb, t))), 0L, (a, x) -> a + x))"))
          .transform(Skew.cut)
        for (i <- 2 to 24) {
          pairs = pairs
            .withColumn("cc", expr(
              s"transform(sequence(1, 24), j -> aggregate(transform(sequence(1, j), " +
                s"t -> abs(element_at(pa, $i) - element_at(pb, t))), 0L, (a, x) -> a + x))"))
            .withColumn("mm", expr(
              "transform(sequence(1, 24), j -> IF(j = 1, element_at(r, 1), " +
                "least(element_at(r, j), element_at(r, j - 1))))"))
            .withColumn("r", expr(
              "transform(sequence(1, 24), j -> element_at(cc, j) + " +
                "array_min(transform(sequence(1, j), k -> element_at(mm, k) - " +
                "IF(k = 1, CAST(0 AS BIGINT), element_at(cc, k - 1)))))"))
            .drop("cc", "mm")
            // each row references the previous row once (a LINEAR chain),
            // so an exchange barrier is enough to stop CollapseProject
            // from inlining 24 levels of array expressions — one job,
            // no per-step checkpoint
            .repartition(col("ta"))
        }
        pairs.select(col("ta").as("type_a"), col("tb").as("type_b"),
            element_at(col("r"), 24).as("dtw"),
            expr("aggregate(zip_with(pa, pb, (a, b) -> abs(a - b)), 0L, (a, x) -> a + x)")
              .as("l1"),
            round(element_at(col("r"), 24) / 48.0, 4).as("dtw_per_step"))
          .orderBy("type_a", "type_b")
      },
      Some(dtwSql)),

    Q(
      "ts_changepoint_binseg",
      "Binary-segmentation changepoint detection (depth 2) on the " +
        "daily event-count series: find the split minimizing total " +
        "within-segment SSE, then re-split each half — the top-down " +
        "complement to ts_cusum_changepoint's single-shift statistic, " +
        "recovering up to three level/shift breaks. The series packs " +
        "into ONE calendar-bounded array row; integer prefix sums " +
        "make every candidate's SSE a closed-form expression, so the " +
        "whole search is O(n²) array math with no window, no " +
        "iteration, and no float accumulation (SSE = S2 − S1²/len " +
        "over exact longs). Ties break to the earliest split in both " +
        "engines by list_position semantics.",
      (s, dir) => {
        // dialect-paired expression fragments (Spark spelling)
        def sse(a: String, b: String): String =
          s"((element_at(p2, CAST($b AS INT)) - IF(($a) = 0, 0L, element_at(p2, CAST($a AS INT)))) - " +
            s"CAST((element_at(p1, CAST($b AS INT)) - IF(($a) = 0, 0L, element_at(p1, CAST($a AS INT)))) AS DOUBLE) * " +
            s"(element_at(p1, CAST($b AS INT)) - IF(($a) = 0, 0L, element_at(p1, CAST($a AS INT)))) / (($b) - ($a)))"
        def costs(a: String, b: String): String =
          s"transform(sequence(($a) + 1, ($b) - 1), s -> ${sse(a, "s")} + ${sse("s", b)})"
        def split(a: String, b: String): String =
          s"($a) + array_position(${costs(a, b)}, array_min(${costs(a, b)}))"
        def drop(a: String, b: String): String =
          s"(${sse(a, b)} - array_min(${costs(a, b)}))"
        val daily = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts").cast("timestamp")).as("d"))
          .agg(count(lit(1)).as("y"))
        val packed = daily
          .agg(expr("transform(sort_array(collect_list(struct(d, y))), x -> x.y)")
            .as("ys"))
          .withColumn("n", size(col("ys")).cast("long"))
          .withColumn("p1", expr(
            "transform(sequence(1, CAST(n AS INT)), i -> " +
              "aggregate(slice(ys, 1, i), 0L, (a, x) -> a + x))"))
          .withColumn("p2", expr(
            "transform(sequence(1, CAST(n AS INT)), i -> " +
              "aggregate(slice(ys, 1, i), 0L, (a, x) -> a + x * x))"))
          .withColumn("s1", expr(split("0L", "n")))
          .withColumn("d1", expr(drop("0L", "n")))
          .withColumn("s2a", expr(s"IF(s1 >= 4, ${split("0L", "s1")}, NULL)"))
          .withColumn("d2a", expr(s"IF(s1 >= 4, ${drop("0L", "s1")}, NULL)"))
          .withColumn("s2b", expr(s"IF(n - s1 >= 4, ${split("s1", "n")}, NULL)"))
          .withColumn("d2b", expr(s"IF(n - s1 >= 4, ${drop("s1", "n")}, NULL)"))
        packed.select(explode(expr(
            """filter(array(
                 struct(1 AS level, 0L AS seg_lo, n AS seg_hi, s1 AS split_t, d1 AS sse_drop),
                 struct(2 AS level, 0L AS seg_lo, s1 AS seg_hi, s2a AS split_t, d2a AS sse_drop),
                 struct(2 AS level, s1 AS seg_lo, n AS seg_hi, s2b AS split_t, d2b AS sse_drop)),
               x -> x.split_t IS NOT NULL)""")).as("c"))
          .select(col("c.level"), col("c.seg_lo"), col("c.seg_hi"),
            col("c.split_t"), round(col("c.sse_drop"), 4).as("sse_drop"))
          .orderBy("level", "seg_lo")
      },
      Some {
        def sse(a: String, b: String): String =
          s"((p2[CAST($b AS INT)] - CASE WHEN ($a) = 0 THEN 0 ELSE p2[CAST($a AS INT)] END) - " +
            s"CAST((p1[CAST($b AS INT)] - CASE WHEN ($a) = 0 THEN 0 ELSE p1[CAST($a AS INT)] END) AS DOUBLE) * " +
            s"(p1[CAST($b AS INT)] - CASE WHEN ($a) = 0 THEN 0 ELSE p1[CAST($a AS INT)] END) / (($b) - ($a)))"
        def costs(a: String, b: String): String =
          s"list_transform(range(($a) + 1, $b), s -> ${sse(a, "s")} + ${sse("s", b)})"
        def split(a: String, b: String): String =
          s"($a) + list_position(${costs(a, b)}, list_min(${costs(a, b)}))"
        def drop(a: String, b: String): String =
          s"(${sse(a, b)} - list_min(${costs(a, b)}))"
        s"""WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
              count(*) AS y
            FROM events GROUP BY 1),
          packed AS (SELECT list(y ORDER BY d) AS ys,
              CAST(count(*) AS BIGINT) AS n
            FROM daily),
          pref AS MATERIALIZED (SELECT ys, n,
              list_transform(range(1, CAST(n + 1 AS BIGINT)), i ->
                CAST(list_sum(ys[1:CAST(i AS INT)]) AS BIGINT)) AS p1,
              list_transform(range(1, CAST(n + 1 AS BIGINT)), i ->
                CAST(list_sum(list_transform(ys[1:CAST(i AS INT)],
                  x -> x * x)) AS BIGINT)) AS p2
            FROM packed),
          lvl AS MATERIALIZED (SELECT n, p1, p2,
              ${split("0", "n")} AS s1, ${drop("0", "n")} AS d1
            FROM pref),
          lvl2 AS MATERIALIZED (SELECT n, s1, d1,
              CASE WHEN s1 >= 4 THEN ${split("0", "s1")} END AS s2a,
              CASE WHEN s1 >= 4 THEN ${drop("0", "s1")} END AS d2a,
              CASE WHEN n - s1 >= 4 THEN ${split("s1", "n")} END AS s2b,
              CASE WHEN n - s1 >= 4 THEN ${drop("s1", "n")} END AS d2b
            FROM lvl),
          rows_ AS (
            SELECT 1 AS level, CAST(0 AS BIGINT) AS seg_lo, n AS seg_hi,
              s1 AS split_t, d1 AS sse_drop FROM lvl2
            UNION ALL
            SELECT 2, CAST(0 AS BIGINT), s1, s2a, d2a FROM lvl2
              WHERE s2a IS NOT NULL
            UNION ALL
            SELECT 2, s1, n, s2b, d2b FROM lvl2 WHERE s2b IS NOT NULL)
          SELECT CAST(level AS INT) AS level, seg_lo,
            CAST(seg_hi AS BIGINT) AS seg_hi,
            CAST(split_t AS BIGINT) AS split_t,
            round(sse_drop, 4) AS sse_drop
          FROM rows_ ORDER BY level, seg_lo"""
      }),

    Q(
      "stats_friedman",
      "Friedman test across the five event types blocked by day — " +
        "the repeated-measures nonparametric ANOVA that completes " +
        "the k-sample family (Kruskal–Wallis assumes independent " +
        "groups; Friedman ranks WITHIN each day, removing the " +
        "day-level volume effect). Ranks use midrank ties via " +
        "rank() + (ties−1)/2, every rank is an exact .5-rational, " +
        "the tie-corrected χ²_F is a closed-form ratio of exact " +
        "sums, and the p-value rides the Wilson–Hilferty cube-root " +
        "normal approximation through the shared engine-portable " +
        "normal-CDF polynomial.",
      (s, dir) => {
        val k = 5.0
        val daily = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts").cast("timestamp")).as("d"), col("event_type"))
          .agg(count(lit(1)).as("y"))
        val wD = Window.partitionBy("d").orderBy("y")
        val wT = Window.partitionBy("d", "y")
        val ranked = daily
          .withColumn("rk", rank().over(wD) +
            (count(lit(1)).over(wT) - 1).cast("double") / 2.0)
        val perType = ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sfold(col("rk")).as("rj"))
        val blocks = ranked.agg(count(lit(1)).as("nk"),
          sfold(col("rk") * col("rk")).as("srr"))
        val stat = perType
          .crossJoin(broadcast(blocks))
          .agg(max(col("n")).as("n"), max(col("nk")).as("nk"),
            max(col("srr")).as("srr"),
            sfold((col("rj") - col("n") * (k + 1) / 2.0) *
              (col("rj") - col("n") * (k + 1) / 2.0)).as("sdev"))
          .select(col("n"),
            (lit(k - 1) * col("sdev") /
              (col("srr") - col("n") * k * (k + 1) * (k + 1) / 4.0)).as("chi2"))
        val d = k - 1
        stat.select(col("n").as("n_blocks"), round(col("chi2"), 4).as("chi2_f"),
            round(lit(1.0) - normCdf(
              (pow(col("chi2") / d, 1.0 / 3.0) - (lit(1.0) - 2.0 / (9 * d))) *
                sqrt(lit(9 * d / 2.0))), 6).as("p_approx"))
          .orderBy("n_blocks")
      },
      Some(s"""WITH daily AS (SELECT
            CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type,
            count(*) AS y
          FROM events GROUP BY 1, 2),
        ranked AS (SELECT event_type,
            rank() OVER (PARTITION BY d ORDER BY y)
              + CAST(count(*) OVER (PARTITION BY d, y) - 1 AS DOUBLE) / 2.0
              AS rk
          FROM daily),
        pertype AS (SELECT event_type, count(*) AS n,
            list_reduce(list_sort(list(rk)), (a, b) -> a + b) AS rj
          FROM ranked GROUP BY 1),
        blocks AS (SELECT count(*) AS nk,
            list_reduce(list_sort(list(rk * rk)), (a, b) -> a + b) AS srr
          FROM ranked),
        stat AS (SELECT max(n) AS n, max(srr) AS srr,
            list_reduce(list_sort(list(
              (rj - n * 6.0 / 2.0) * (rj - n * 6.0 / 2.0))),
              (a, b) -> a + b) AS sdev
          FROM pertype CROSS JOIN blocks),
        s2 AS (SELECT n,
            4.0 * sdev / (srr - n * 5.0 * 6.0 * 6.0 / 4.0) AS chi2
          FROM stat)
        SELECT n AS n_blocks, round(chi2, 4) AS chi2_f,
          round(1.0 - ${normCdfSql(
            "(pow(chi2 / 4.0, CAST(1.0 AS DOUBLE) / 3.0) - " +
              "(1.0 - CAST(2.0 AS DOUBLE) / 36.0)) * sqrt(CAST(18.0 AS DOUBLE))")},
            6) AS p_approx
        FROM s2 ORDER BY n_blocks""")),

    Q(
      "pipeline_reward_normalize",
      "Group-relative reward normalization (the GRPO/RLOO advantage " +
        "prep): within each language group, a document's advantage is " +
        "its reward standardized against the GROUP's mean and std — " +
        "the per-prompt baseline trick that replaces a learned value " +
        "model. Rewards are exact integers (char counts), so group " +
        "mean/std come from one integer-moment aggregation (no float " +
        "accumulation), and the top/bottom advantage docs per group " +
        "surface through partitioned rank windows — every piece " +
        "shuffles on the group key only.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars").as("r"))
        val g = d.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
            sum(col("r") * col("r")).as("srr"))
          .select(col("lang"), col("n"),
            (col("sr").cast("double") / col("n")).as("mu"),
            sqrt((col("srr").cast("double") -
              col("sr").cast("double") * col("sr") / col("n")) / col("n"))
              .as("sd"))
        val adv = d.join(g, "lang")
          .select(col("lang"), col("doc_id"), col("r"), col("n"),
            ((col("r") - col("mu")) / col("sd")).as("adv"))
        val wUp = Window.partitionBy("lang").orderBy(col("adv").desc, col("doc_id"))
        val wDn = Window.partitionBy("lang").orderBy(col("adv").asc, col("doc_id"))
        adv
          .withColumn("rb", row_number().over(wUp))
          .withColumn("rw", row_number().over(wDn))
          .filter(col("rb") <= 2 || col("rw") <= 2)
          .select(col("lang"), col("doc_id"), col("r").as("reward"),
            col("n").as("group_n"), round(col("adv"), 4).as("advantage"),
            when(col("rb") <= 2, lit("top")).otherwise(lit("bottom")).as("tail"))
          .orderBy(col("lang"), col("advantage").desc, col("doc_id"))
      },
      Some("""WITH d AS (SELECT lang, doc_id, n_chars AS r FROM documents),
        g AS (SELECT lang, count(*) AS n, CAST(sum(r) AS BIGINT) AS sr,
            CAST(sum(r * r) AS BIGINT) AS srr
          FROM d GROUP BY 1),
        m AS (SELECT lang, n, CAST(sr AS DOUBLE) / n AS mu,
            sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n) / n)
              AS sd
          FROM g),
        adv AS (SELECT d.lang, doc_id, r, n,
            (r - mu) / sd AS adv
          FROM d JOIN m USING (lang)),
        rk AS (SELECT lang, doc_id, r, n, adv,
            row_number() OVER (PARTITION BY lang ORDER BY adv DESC, doc_id)
              AS rb,
            row_number() OVER (PARTITION BY lang ORDER BY adv ASC, doc_id)
              AS rw
          FROM adv)
        SELECT lang, doc_id, r AS reward, n AS group_n,
          round(adv, 4) AS advantage,
          CASE WHEN rb <= 2 THEN 'top' ELSE 'bottom' END AS tail
        FROM rk WHERE rb <= 2 OR rw <= 2
        ORDER BY lang, advantage DESC, doc_id""")),

    Q(
      "stats_cronbach_alpha",
      "Cronbach's alpha over the four lineitem numeric columns as a " +
        "4-item scale (quantity, price, discount, tax in exact " +
        "fixed-point units) — the internal-consistency coefficient " +
        "survey and labeling pipelines report before averaging item " +
        "scores into one construct: α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total). " +
        "Every item and total variance comes from ONE hash " +
        "aggregation of exact decimal(38) integer moments (the " +
        "stats_corr_matrix idiom), so α is a fixed-shape float " +
        "formula over exact sums — bit-identical across engines.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem").select(
          round(col("l_quantity")).cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("p"),
          round(col("l_discount") * 100).cast("long").as("d"),
          round(col("l_tax") * 100).cast("long").as("t"))
          .withColumn("tot", col("q") + col("p") + col("d") + col("t"))
        def d38(c: Column) = c.cast("decimal(38,0)")
        val cols = Seq("q", "p", "d", "t", "tot")
        val sums = li.agg(count(lit(1)).as("n"),
          cols.flatMap(c => Seq(
            sum(col(c)).as(s"s_$c"),
            sum(d38(col(c)) * col(c)).as(s"ss_$c"))): _*)
        def variance(c: String): Column =
          (col(s"ss_$c").cast("double") -
            col(s"s_$c").cast("double") * col(s"s_$c") / col("n")) / col("n")
        val sumItemVar = Seq("q", "p", "d", "t").map(variance)
          .reduce(_ + _)
        sums.select(col("n").as("n_rows"), lit(4).as("k_items"),
            round(lit(4.0 / 3.0) * (lit(1.0) - sumItemVar / variance("tot")), 6)
              .as("alpha"),
            round(sumItemVar, 2).as("sum_item_var"),
            round(variance("tot"), 2).as("total_var"))
          .orderBy("n_rows")
      },
      Some("""WITH li AS (SELECT
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
            CAST(round(l_discount * 100) AS BIGINT) AS d,
            CAST(round(l_tax * 100) AS BIGINT) AS t
          FROM lineitem),
        li2 AS (SELECT *, q + p + d + t AS tot FROM li),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(q) AS BIGINT) AS s_q, sum(CAST(q AS HUGEINT) * q) AS ss_q,
            CAST(sum(p) AS BIGINT) AS s_p, sum(CAST(p AS HUGEINT) * p) AS ss_p,
            CAST(sum(d) AS BIGINT) AS s_d, sum(CAST(d AS HUGEINT) * d) AS ss_d,
            CAST(sum(t) AS BIGINT) AS s_t, sum(CAST(t AS HUGEINT) * t) AS ss_t,
            CAST(sum(tot) AS BIGINT) AS s_tot,
            sum(CAST(tot AS HUGEINT) * tot) AS ss_tot
          FROM li2),
        v AS (SELECT n,
            (CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * s_q / n) / n AS vq,
            (CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * s_p / n) / n AS vp,
            (CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * s_d / n) / n AS vd,
            (CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * s_t / n) / n AS vt,
            (CAST(ss_tot AS DOUBLE) - CAST(s_tot AS DOUBLE) * s_tot / n) / n
              AS vtot
          FROM s)
        SELECT n AS n_rows, CAST(4 AS INT) AS k_items,
          round(CAST(4.0 AS DOUBLE) / 3.0
            * (1.0 - (vq + vp + vd + vt) / vtot), 6) AS alpha,
          round(vq + vp + vd + vt, 2) AS sum_item_var,
          round(vtot, 2) AS total_var
        FROM v ORDER BY n_rows""")),

    Q(
      "stats_sprt_monitor",
      "Sequential probability-ratio test (Wald SPRT) monitor over the " +
        "daily purchase-conversion series: cumulative trials and " +
        "conversions per day feed the running log-likelihood ratio " +
        "for H1: p=0.07 vs H0: p=0.05, with ±ln(19) decision bounds " +
        "(α=β=0.05) — the always-valid alternative to the fixed-" +
        "horizon tests (stats_two_proportion_z, stats_power_curve) " +
        "that an experimentation platform polls daily. Daily cells " +
        "are exact integers; the cumulative pass rides a packed " +
        "sorted-array prefix fold (no unpartitioned window in the " +
        "Spark plan); both log terms are computed in-engine so the " +
        "doubles match bit for bit.",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts").cast("timestamp")).as("d"))
          .agg(count_distinct(col("user_id")).as("n"),
            count_distinct(when(col("event_type") === "purchase",
              col("user_id"))).as("c"))
        val packed = daily
          .agg(sort_array(collect_list(struct(col("d"), col("n"), col("c")))).as("a"))
          .select(explode(expr(
            """transform(a, (x, i) -> struct(
                 x.d AS d,
                 aggregate(slice(a, 1, i + 1), 0L, (s, e) -> s + e.n) AS cn,
                 aggregate(slice(a, 1, i + 1), 0L, (s, e) -> s + e.c) AS cc))"""))
            .as("r"))
          .select(col("r.d").as("d"), col("r.cn").as("cum_trials"),
            col("r.cc").as("cum_conv"))
        val llr = packed.withColumn("llr",
          col("cum_conv") * log(lit(0.07) / lit(0.05)) +
            (col("cum_trials") - col("cum_conv")) *
              log(lit(0.93) / lit(0.95)))
        llr.select(col("d").as("day"), col("cum_trials"), col("cum_conv"),
            round(col("llr"), 4).as("llr"),
            when(col("llr") >= log(lit(19.0)), lit("accept_h1"))
              .when(col("llr") <= -log(lit(19.0)), lit("accept_h0"))
              .otherwise(lit("continue")).as("decision"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT
            CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n,
            CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
              THEN user_id END) AS BIGINT) AS c
          FROM events GROUP BY 1),
        cum AS (SELECT d,
            CAST(sum(n) OVER w AS BIGINT) AS cum_trials,
            CAST(sum(c) OVER w AS BIGINT) AS cum_conv
          FROM daily
          WINDOW w AS (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        llr AS (SELECT d, cum_trials, cum_conv,
            cum_conv * ln(CAST(0.07 AS DOUBLE) / 0.05)
              + (cum_trials - cum_conv) * ln(CAST(0.93 AS DOUBLE) / 0.95)
              AS llr
          FROM cum)
        SELECT d AS day, cum_trials, cum_conv, round(llr, 4) AS llr,
          CASE WHEN llr >= ln(CAST(19.0 AS DOUBLE)) THEN 'accept_h1'
            WHEN llr <= -ln(CAST(19.0 AS DOUBLE)) THEN 'accept_h0'
            ELSE 'continue' END AS decision
        FROM llr ORDER BY day""")),

    Q(
      "stats_bootstrap_ci",
      "Poisson-bootstrap confidence interval for the mean order value " +
        "— the resampling CI jackknife can't give for non-smooth " +
        "statistics, made FULLY deterministic and engine-replayable: " +
        "each of 40 resamples draws every row's multiplicity from an " +
        "inverse-CDF Poisson(1) over the portable md5 hash of " +
        "(resample, orderkey) — the classic streaming bootstrap " +
        "(each row processed once per resample, no sampling with " +
        "replacement over a shuffled corpus). Every resample mean is " +
        "a ratio of exact integer sums (cents × multiplicity), the " +
        "CI reads order statistics of the 40 sorted means, so there " +
        "is zero float accumulation anywhere.",
      (s, dir) => {
        val m = 4294967296.0 // 2^32
        val o = Tables.t(s, dir, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val fan = o.crossJoin(broadcast(
            s.range(0, 40).select(col("id").cast("int").as("b"))))
          .withColumn("u", graft.ops.PortableHash.hexHash(
            concat(lit("bs"), col("b").cast("string"), lit(":"),
              col("o_orderkey").cast("string"))) / m)
          .withColumn("mult",
            when(col("u") < 0.36787944117144233, lit(0L))
              .when(col("u") < 0.7357588823428847, lit(1L))
              .when(col("u") < 0.9196986029286058, lit(2L))
              .when(col("u") < 0.9810118431238462, lit(3L))
              .otherwise(lit(4L)))
        val per = fan.groupBy("b")
          .agg(sum(col("mult") * col("cents")).as("sc"),
            sum(col("mult")).as("sn"))
          .select(col("b"), (col("sc").cast("double") / col("sn")).as("mean_c"))
        val base = o.agg((sum(col("cents")).cast("double") /
          count(lit(1))).as("full_mean"))
        per.agg(count(lit(1)).as("n_resamples"),
            sort_array(collect_list(col("mean_c"))).as("sm"))
          .crossJoin(broadcast(base))
          .select(col("n_resamples"),
            round(col("full_mean") / 100.0, 2).as("mean_value"),
            round(element_at(col("sm"), 2) / 100.0, 2).as("ci_lo"),
            round(element_at(col("sm"), 39) / 100.0, 2).as("ci_hi"))
          .orderBy("n_resamples")
      },
      Some(s"""WITH o AS (SELECT o_orderkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
        fan AS (SELECT o_orderkey, cents, CAST(b AS INT) AS b,
            ${PortableHash.hexHashSql(
              "'bs' || CAST(CAST(b AS INT) AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)")}
              / CAST(4294967296.0 AS DOUBLE) AS u
          FROM o CROSS JOIN (SELECT unnest(range(0, 40)) AS b)),
        mults AS (SELECT b, cents,
            CASE WHEN u < 0.36787944117144233 THEN 0
              WHEN u < 0.7357588823428847 THEN 1
              WHEN u < 0.9196986029286058 THEN 2
              WHEN u < 0.9810118431238462 THEN 3
              ELSE 4 END AS mult
          FROM fan),
        per AS (SELECT b,
            CAST(sum(mult * cents) AS DOUBLE)
              / CAST(sum(mult) AS BIGINT) AS mean_c
          FROM mults GROUP BY 1),
        agg AS (SELECT count(*) AS n_resamples,
            list_sort(list(mean_c)) AS sm
          FROM per),
        base AS (SELECT CAST(sum(cents) AS BIGINT)
            / CAST(count(*) AS DOUBLE) AS full_mean
          FROM o)
        SELECT n_resamples,
          round(full_mean / 100.0, 2) AS mean_value,
          round(sm[2] / 100.0, 2) AS ci_lo,
          round(sm[39] / 100.0, 2) AS ci_hi
        FROM agg CROSS JOIN base ORDER BY n_resamples""")),

    Q(
      "stats_ljung_box",
      "Ljung–Box portmanteau test on each event type's daily-count " +
        "series: Q = n(n+2)·Σ_{k≤6} r_k²/(n−k) — the MULTI-lag " +
        "whiteness test that complements stats_durbin_watson's lag-1 " +
        "view (a series can pass DW and still fail Ljung–Box on a " +
        "weekly echo). Autocorrelations reuse the calendar-equi-join " +
        "lag shape of ts_autocorr with every double sum on a sorted " +
        "fold; the χ²(6) p-value rides the Wilson–Hilferty cube-root " +
        "normal approximation through the shared portable CDF " +
        "polynomial.",
      (s, dir) => {
        val m = 6
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts").cast("timestamp")).as("d"))
          .agg(count(lit(1)).as("y"))
        val mu = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            (sum(col("y")).cast("double") / count(lit(1))).as("mu"))
        val dm = daily.join(broadcast(mu), Seq("event_type"))
        val den = dm.groupBy("event_type")
          .agg(sfold((col("y") - col("mu")) * (col("y") - col("mu"))).as("den"))
        val lags = dm
          .select(col("event_type"), col("d"), col("y"), col("mu"),
            explode(sequence(lit(1), lit(m))).as("lag"))
          .withColumn("dl", col("d") + col("lag"))
        val shifted = dm.select(col("event_type"), col("d").as("dl"),
          col("y").as("yl"))
        val rk = lags.join(shifted, Seq("event_type", "dl"))
          .groupBy("event_type", "lag")
          .agg(sfold((col("y") - col("mu")) * (col("yl") - col("mu"))).as("num"))
          .join(broadcast(den), Seq("event_type"))
          .join(broadcast(mu.select(col("event_type"), col("n"))), Seq("event_type"))
          .select(col("event_type"), col("lag"), col("n"),
            (col("num") / col("den")).as("r"))
        val q = rk.groupBy("event_type")
          .agg(max(col("n")).as("n"),
            sfold(col("r") * col("r") / (col("n") - col("lag"))).as("srq"))
          .select(col("event_type"), col("n").as("n_days"),
            (col("n") * (col("n") + 2) * col("srq")).as("q"))
        val d = m.toDouble
        q.select(col("event_type"), col("n_days"), round(col("q"), 4).as("q_stat"),
            round(lit(1.0) - normCdf(
              (pow(col("q") / d, 1.0 / 3.0) - (lit(1.0) - 2.0 / (9 * d))) *
                sqrt(lit(9 * d / 2.0))), 6).as("p_approx"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (SELECT event_type,
            CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        mu AS (SELECT event_type, count(*) AS n,
            CAST(sum(y) AS BIGINT) / CAST(count(*) AS DOUBLE) AS mu
          FROM daily GROUP BY 1),
        dm AS (SELECT daily.event_type, d, y, mu FROM daily
          JOIN mu USING (event_type)),
        den AS (SELECT event_type,
            list_reduce(list_sort(list((y - mu) * (y - mu))), (a, b) -> a + b)
              AS den
          FROM dm GROUP BY 1),
        lags AS (SELECT event_type, d, y, mu, CAST(ks.lag AS INT) AS lag,
            d + CAST(ks.lag AS INT) AS dl
          FROM dm CROSS JOIN (SELECT unnest(range(1, 7)) AS lag) ks),
        rk AS (SELECT l.event_type, l.lag, mu2.n,
            list_reduce(list_sort(list((l.y - l.mu) * (s.y - l.mu))),
              (a, b) -> a + b) / max(den.den) AS r
          FROM lags l
          JOIN dm s ON s.event_type = l.event_type AND s.d = l.dl
          JOIN den ON den.event_type = l.event_type
          JOIN mu mu2 ON mu2.event_type = l.event_type
          GROUP BY 1, 2, 3),
        q AS (SELECT event_type, max(n) AS n,
            list_reduce(list_sort(list(r * r / (n - lag))), (a, b) -> a + b)
              AS srq
          FROM rk GROUP BY 1),
        q2 AS (SELECT event_type, n AS n_days,
            n * (n + 2) * srq AS q FROM q)
        SELECT event_type, n_days, round(q, 4) AS q_stat,
          round(1.0 - ${normCdfSql(
            "(pow(q / 6.0, CAST(1.0 AS DOUBLE) / 3.0) - " +
              "(1.0 - CAST(2.0 AS DOUBLE) / 54.0)) * sqrt(CAST(27.0 AS DOUBLE))")},
            6) AS p_approx
        FROM q2 ORDER BY event_type""")),

    Q(
      "stats_page_trend",
      "Page's L test for an ORDERED alternative across the five event " +
        "types blocked by day — where Friedman only asks 'do the " +
        "treatments differ', Page asks 'do they differ IN THIS " +
        "order' (hypothesis: alphabetical type order), which is the " +
        "right test for dose-response or severity-graded comparisons. " +
        "Reuses the midrank day-ranking of stats_friedman; L = " +
        "Σ_j c_j·R_j over exact .5-rational rank sums, the normal " +
        "approximation z = (L−μ_L)/σ_L uses closed-form integer " +
        "moments, and the one-sided p rides the shared portable " +
        "normal CDF.",
      (s, dir) => {
        val k = 5.0
        val daily = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts").cast("timestamp")).as("d"), col("event_type"))
          .agg(count(lit(1)).as("y"))
        val wD = Window.partitionBy("d").orderBy("y")
        val wT = Window.partitionBy("d", "y")
        val ranked = daily
          .withColumn("rk", rank().over(wD) +
            (count(lit(1)).over(wT) - 1).cast("double") / 2.0)
        val perType = ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sfold(col("rk")).as("rj"))
        // hypothesized order = alphabetical type order: c_j = 1..k —
        // assigned by a packed sorted-array transform (the k-row frame
        // is an aggregate output; no window, so the unpartitioned-
        // window lint stays vacuous)
        val withC = perType
          .agg(sort_array(collect_list(struct(col("event_type"), col("n"),
            col("rj")))).as("a"))
          .select(explode(expr(
            "transform(a, (x, i) -> struct(x.event_type AS event_type, " +
              "x.n AS n, x.rj AS rj, CAST(i + 1 AS DOUBLE) AS cj))")).as("r"))
          .select(col("r.event_type"), col("r.n"), col("r.rj"), col("r.cj"))
        val l = withC.groupBy(lit(1).as("g"))
          .agg(max(col("n")).as("b"), sfold(col("cj") * col("rj")).as("l"))
        l.select(col("b").as("n_blocks"), round(col("l"), 1).as("page_l"),
            round((col("l") - col("b") * k * (k + 1) * (k + 1) / 4.0) /
              sqrt(col("b") * k * k * (k + 1) * (k * k - 1) / 144.0), 4)
              .as("z_score"),
            round(lit(1.0) - normCdf(
              (col("l") - col("b") * k * (k + 1) * (k + 1) / 4.0) /
                sqrt(col("b") * k * k * (k + 1) * (k * k - 1) / 144.0)), 6)
              .as("p_one_sided"))
          .orderBy("n_blocks")
      },
      Some(s"""WITH daily AS (SELECT
            CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type,
            count(*) AS y
          FROM events GROUP BY 1, 2),
        ranked AS (SELECT event_type,
            rank() OVER (PARTITION BY d ORDER BY y)
              + CAST(count(*) OVER (PARTITION BY d, y) - 1 AS DOUBLE) / 2.0
              AS rk
          FROM daily),
        pertype AS (SELECT event_type, count(*) AS n,
            list_reduce(list_sort(list(rk)), (a, b) -> a + b) AS rj
          FROM ranked GROUP BY 1),
        withc AS (SELECT event_type, n, rj,
            CAST(row_number() OVER (ORDER BY event_type) AS DOUBLE) AS cj
          FROM pertype),
        l AS (SELECT max(n) AS b,
            list_reduce(list_sort(list(cj * rj)), (a, b) -> a + b) AS l
          FROM withc),
        z AS (SELECT b, l,
            (l - b * 5.0 * 6.0 * 6.0 / 4.0)
              / sqrt(b * 5.0 * 5.0 * 6.0 * (5.0 * 5.0 - 1) / 144.0) AS z
          FROM l)
        SELECT b AS n_blocks, round(l, 1) AS page_l,
          round(z, 4) AS z_score,
          round(1.0 - ${normCdfSql("z")}, 6) AS p_one_sided
        FROM z ORDER BY n_blocks"""))
  )

  /** Unrolled DTW oracle for [[ts_dtw]]: one MATERIALIZED CTE per DP
    * row, same prefix-min integer recurrence (DuckDB's list_sum over
    * integer slices equals the Spark fold exactly — no float order). */
  private def dtwSql: String = {
    val steps = (2 to 24).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS MATERIALIZED (
        SELECT ta, tb, pa, pb,
          list_transform(range(1, 25), j ->
            cc[j] + list_min(list_transform(range(1, j + 1), k ->
              mm[k] - CASE WHEN k = 1 THEN 0 ELSE cc[k - 1] END))) AS r
        FROM (
          SELECT ta, tb, pa, pb,
            list_transform(range(1, 25), j ->
              list_sum(list_transform(range(1, j + 1), t ->
                abs(pa[$i] - pb[t])))) AS cc,
            list_transform(range(1, 25), j ->
              CASE WHEN j = 1 THEN r[1]
                ELSE least(r[j], r[j - 1]) END) AS mm
          FROM $prev))"""
    }.mkString(",\n")
    s"""WITH hourly AS (SELECT event_type,
          CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h, count(*) AS y
        FROM events GROUP BY 1, 2),
      grid AS (SELECT t.event_type, u.h, CAST(coalesce(y, 0) AS BIGINT) AS y
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT CAST(h AS INT) AS h
          FROM (SELECT unnest(range(0, 24)) AS h)) u
        LEFT JOIN hourly USING (event_type, h)),
      prof AS (SELECT event_type, list(y ORDER BY h) AS p
        FROM grid GROUP BY 1),
      d1 AS MATERIALIZED (SELECT a.event_type AS ta, b.event_type AS tb,
          a.p AS pa, b.p AS pb,
          list_transform(range(1, 25), j ->
            CAST(list_sum(list_transform(range(1, j + 1), t ->
              abs(a.p[1] - b.p[t]))) AS BIGINT)) AS r
        FROM prof a JOIN prof b ON a.event_type < b.event_type),
      $steps
      SELECT ta AS type_a, tb AS type_b,
        CAST(r[24] AS BIGINT) AS dtw,
        CAST(list_sum(list_transform(range(1, 25), t ->
          abs(pa[t] - pb[t]))) AS BIGINT) AS l1,
        round(CAST(r[24] AS BIGINT) / CAST(48.0 AS DOUBLE), 4)
          AS dtw_per_step
      FROM d24 ORDER BY type_a, type_b"""
  }
}
