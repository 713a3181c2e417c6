package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics compositions over the event stream: funnel
  * progression and cohort retention — the two queries every
  * events-warehouse user runs weekly. Both are conditional-aggregation
  * + join shapes: the event table is scanned a bounded number of
  * times, everything aggregates per user_id (one shuffle key), and the
  * final outputs are tiny (stages × cohorts), so the plans scale to
  * arbitrary event volumes. */
object Analytics {

  def defs: Seq[Q] = Seq(

    Q(
      "analytics_transitions",
      "First-order Markov transition matrix over each user's event " +
        "sequence: lag window partitioned by user_id (high-cardinality " +
        "key — every partition is one user's bounded history, never a " +
        "global sort), (from, to) pair counts reduced map-side, then " +
        "row-normalized transition probabilities via a window over the " +
        "tiny (types × types) count table. The behavioral-model input " +
        "every session-analysis pipeline derives; ties within a " +
        "timestamp break on event_id so the sequence is total.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val pairs = e
          .select(col("user_id"), col("event_type").as("to_type"),
            lag("event_type", 1).over(seq).as("from_type"))
          .filter(col("from_type").isNotNull)
          .groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
        pairs
          .withColumn("p", round(col("n").cast("double") /
            sum("n").over(Window.partitionBy("from_type")), 4))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH p AS (SELECT
            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
            event_type AS to_type
          FROM events),
        c AS (SELECT from_type, to_type, count(*) AS n
          FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
        FROM c ORDER BY from_type, to_type""")),

    Q(
      "analytics_time_to_convert",
      "View→purchase conversion latency histogram: per user the " +
        "earliest view and earliest purchase as conditional MINs over " +
        "epoch-µs — one map-side-combinable hash agg on the user key, " +
        "constant state per user regardless of history length — then " +
        "converting users bucket into whole hours with integer " +
        "division. Timestamps never leave as raw ns/µs values; both " +
        "engines compare the same integer microseconds.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        e.groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view",
              Tables.epochUs(col("ts")))).as("fv"),
            min(when(col("event_type") === "purchase",
              Tables.epochUs(col("ts")))).as("fp"))
          .filter(col("fv").isNotNull && col("fp").isNotNull &&
            col("fp") > col("fv"))
          .select(expr("(fp - fv) DIV 3600000000").as("hours_to_convert"))
          .groupBy("hours_to_convert")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("hours_to_convert")
      },
      Some("""WITH a AS (SELECT user_id,
            min(CASE WHEN event_type = 'view'
              THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS fv,
            min(CASE WHEN event_type = 'purchase'
              THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS fp
          FROM events GROUP BY 1)
        SELECT (fp - fv) // 3600000000 AS hours_to_convert,
          count(*) AS n_users
        FROM a WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp > fv
        GROUP BY 1 ORDER BY 1""")),

    Q(
      "analytics_dau_mau",
      "Monthly engagement: MAU (distinct users), average DAU, and the " +
        "DAU/MAU stickiness ratio per calendar month — the retention " +
        "headline every product dashboard opens with. Daily distincts " +
        "come from one (day, user) dedup agg rolled up per day, the " +
        "monthly rollup is integer arithmetic over at most 31 rows " +
        "per month, and MAU is an exact distinct on the month key; " +
        "ratios are exact integer divisions rounded once.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(to_date(col("ts").cast("timestamp")).as("day"),
            to_date(date_trunc("MONTH", col("ts").cast("timestamp")))
              .as("month"),
            col("user_id"))
        val dau = e.select("day", "month", "user_id").distinct()
          .groupBy("month", "day").agg(count(lit(1)).as("dau"))
          .groupBy("month")
          .agg(sum("dau").as("dau_sum"), count(lit(1)).as("n_days"))
        val mau = e.groupBy("month")
          .agg(countDistinct("user_id").as("mau"))
        dau.join(mau, "month")
          .select(col("month"), col("mau"),
            round(col("dau_sum").cast("double") / col("n_days"), 2)
              .as("avg_dau"),
            round(col("dau_sum").cast("double") /
              (col("n_days") * col("mau")), 4).as("stickiness"))
          .orderBy("month")
      },
      Some("""WITH e AS (SELECT CAST(ts AS DATE) AS day,
            CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS month,
            user_id FROM events),
        d AS (SELECT month, day, count(*) AS dau
          FROM (SELECT DISTINCT day, month, user_id FROM e)
          GROUP BY 1, 2),
        ds AS (SELECT month, CAST(sum(dau) AS BIGINT) AS dau_sum,
            count(*) AS n_days FROM d GROUP BY 1),
        m AS (SELECT month, count(DISTINCT user_id) AS mau FROM e GROUP BY 1)
        SELECT ds.month, mau,
          round(CAST(dau_sum AS DOUBLE) / n_days, 2) AS avg_dau,
          round(CAST(dau_sum AS DOUBLE) / (n_days * mau), 4) AS stickiness
        FROM ds JOIN m ON ds.month = m.month
        ORDER BY ds.month""")),

    Q(
      "analytics_windowed_funnel",
      "Time-bound conversion: of users whose FIRST view fell in a " +
        "given month, how many purchased within 7 days of it — the " +
        "windowed funnel that measures the product, where the " +
        "unbounded funnel measures the archive. First-view is a " +
        "map-side-combinable conditional MIN per user; the 7-day test " +
        "is one user-keyed left join against purchases with the bound " +
        "as a residual on exact integer µs, collapsed by max() so a " +
        "user converts at most once; rates are exact integer ratios.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(Tables.epochUs(col("ts"))).as("fv"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), Tables.epochUs(col("ts")).as("pu"))
        val conv = v.join(p, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("fv"))
          .agg(max(when(col("pu") >= col("fv") &&
            col("pu") <= col("fv") + lit(604800000000L), 1L)
            .otherwise(0L)).as("converted"))
        conv
          .groupBy(to_date(date_trunc("MONTH", timestamp_micros(col("fv"))))
            .as("cohort_month"))
          .agg(count(lit(1)).as("n_users"),
            sum("converted").as("n_converted"))
          .withColumn("conv_rate",
            round(col("n_converted").cast("double") / col("n_users"), 4))
          .orderBy("cohort_month")
      },
      Some("""WITH v AS (SELECT user_id,
            min(epoch_us(CAST(ts AS TIMESTAMP))) AS fv
          FROM events WHERE event_type = 'view' GROUP BY 1),
        p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pu
          FROM events WHERE event_type = 'purchase'),
        conv AS (SELECT v.user_id, v.fv,
            max(CASE WHEN p.pu >= v.fv AND p.pu <= v.fv + 604800000000
              THEN 1 ELSE 0 END) AS converted
          FROM v LEFT JOIN p ON p.user_id = v.user_id
          GROUP BY 1, 2)
        SELECT CAST(date_trunc('month', make_timestamp(fv)) AS DATE)
            AS cohort_month,
          count(*) AS n_users,
          CAST(sum(converted) AS BIGINT) AS n_converted,
          round(CAST(sum(converted) AS DOUBLE) / count(*), 4) AS conv_rate
        FROM conv GROUP BY 1 ORDER BY 1""")),

    Q(
      "analytics_funnel",
      "Ordered funnel view → click → purchase per user: each stage is " +
        "the earliest qualifying event STRICTLY AFTER the previous " +
        "stage (conditional min-aggregates, one per pass), then users " +
        "roll up by furthest stage reached. Three passes over events, " +
        "all keyed on user_id; output is 4 rows. The two-day analysis " +
        "slice keeps every stage populated on the fixture (over the " +
        "full month everyone converts).",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .filter(col("ts") < lit("2024-01-03").cast("timestamp_ntz"))
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
        val c = e.join(v, "user_id")
          .filter(col("event_type") === "click" && col("ts") > col("v_ts"))
          .groupBy("user_id").agg(min("ts").as("c_ts"))
        val p = e.join(c, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("c_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("p_ts").isNotNull, 3)
              .when(col("c_ts").isNotNull, 2)
              .when(col("v_ts").isNotNull, 1)
              .otherwise(0).as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some("""WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'),
        v AS (SELECT user_id,
            min(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
          FROM ev GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS c_ts
          FROM ev e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts
          GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS p_ts
          FROM ev e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          GROUP BY e.user_id)
        SELECT CASE WHEN p.p_ts IS NOT NULL THEN 3
                    WHEN c.c_ts IS NOT NULL THEN 2
                    WHEN v.v_ts IS NOT NULL THEN 1
                    ELSE 0 END AS stage,
          count(*) AS n_users
        FROM v LEFT JOIN c ON v.user_id = c.user_id
          LEFT JOIN p ON v.user_id = p.user_id
        GROUP BY 1 ORDER BY stage""")),

    Q(
      "analytics_paths",
      "Top user journeys: each user's first three events (sequence-" +
        "ordered, tie-broken on event_id) joined into a path string, " +
        "counted and ranked. Ranking windows + ordered string-agg; the " +
        "per-user state is a bounded 3-element list regardless of " +
        "history length.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val r = e.select(col("user_id"), col("event_type"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
        r.groupBy("user_id")
          .agg(concat_ws(">",
            transform(
              sort_array(collect_list(struct(col("rn"), col("event_type")))),
              s => s.getField("event_type"))).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(10)
      },
      Some("""WITH r AS (SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY user_id)
        SELECT path, count(*) AS n_users FROM p GROUP BY path
        ORDER BY n_users DESC, path LIMIT 10""")),

    Q(
      "analytics_retention",
      "Cohort retention: users grouped by first-seen week; for each " +
        "(cohort, weeks-since-cohort) cell, the count of cohort members " +
        "active that week. Two aggregations keyed on user_id + one " +
        "distinct-(user, week) reduction — the output is a |cohorts| × " +
        "|weeks| matrix regardless of event volume.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val firstDay = e.groupBy("user_id").agg(min("d").as("first_d"))
        val active = e.select(col("user_id"),
            date_trunc("week", col("d")).cast("date").as("w")).distinct()
        active.join(firstDay, "user_id")
          .select(col("user_id"),
            date_trunc("week", col("first_d")).cast("date").as("cohort_week"),
            col("w"))
          .select(col("user_id"), col("cohort_week"),
            (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("week_n"))
          .groupBy("cohort_week", "week_n")
          .agg(countDistinct("user_id").as("n_active"))
          .orderBy("cohort_week", "week_n")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        f AS (SELECT user_id, CAST(date_trunc('week', min(d)) AS DATE) AS cohort_week
          FROM e GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', d) AS DATE) AS w FROM e)
        SELECT f.cohort_week,
          CAST(date_diff('day', f.cohort_week, a.w) // 7 AS INT) AS week_n,
          count(DISTINCT a.user_id) AS n_active
        FROM a JOIN f ON a.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY cohort_week, week_n""")),

    Q(
      "analytics_attribution",
      "Last-touch attribution: every purchase is credited to the most " +
        "recent preceding view/click by the same user within 24h " +
        "(else 'none'); revenue and counts roll up by attributed " +
        "channel. ONE window pass — last(touch, ignoreNulls) over a " +
        "strictly-preceding frame keyed on user_id — instead of a " +
        "purchases×touches self-join: at 100 TB that is one shuffle on " +
        "the user key and no join blow-up on busy users.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .withColumn("eus", Tables.epochUs(col("ts")))
        val isTouch = col("event_type").isin("view", "click")
        val w = Window.partitionBy("user_id").orderBy(col("eus"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("t_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
          .withColumn("t_eus", last(when(isTouch, col("eus")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            when(col("t_eus").isNotNull && col("eus") - col("t_eus") <= 86400L * 1000000L,
              col("t_type")).otherwise("none").as("channel"),
            col("value"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("revenue"))
          .orderBy("channel")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
          epoch_us(CAST(ts AS TIMESTAMP)) AS eus FROM events),
        nav AS (SELECT *,
            last_value(CASE WHEN event_type IN ('view', 'click')
              THEN event_type END IGNORE NULLS) OVER w AS t_type,
            last_value(CASE WHEN event_type IN ('view', 'click')
              THEN eus END IGNORE NULLS) OVER w AS t_eus
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT CASE WHEN t_eus IS NOT NULL AND eus - t_eus <= 86400000000
                 THEN t_type ELSE 'none' END AS channel,
          count(*) AS n_purchases, round(sum(value), 2) AS revenue
        FROM nav WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY channel""")),

    Q(
      "analytics_rfm",
      "RFM user segmentation — recency (days since last purchase, " +
        "exact integer µs arithmetic against the corpus max), " +
        "frequency (purchase count), monetary (2-decimal revenue sum), " +
        "each scored into quartiles via the scale-safe Skew.globalNtile " +
        "(range exchange + broadcast offsets; three rank passes over " +
        "the per-user frame, never a single-task window) and " +
        "concatenated into the segment code. The per-user frame is one " +
        "keyed aggregation of the event stream; the reference ts rides " +
        "a 1-row broadcast. Quartile ranks sort on the ROUNDED " +
        "monetary with user_id tie-breaks, so the scores are " +
        "deterministic under any fan-out.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .withColumn("eus", Tables.epochUs(col("ts")))
        val refTs = e.agg(max("eus").as("ref_eus"))
        val per = e.groupBy("user_id")
          .agg(max("eus").as("last_eus"),
            count(lit(1)).as("frequency"),
            round(sum("value"), 2).as("monetary"))
          .crossJoin(broadcast(refTs))
          .select(col("user_id"),
            Skew.idiv(col("ref_eus") - col("last_eus"), lit(86400000000L))
              .as("recency_days"),
            col("frequency"), col("monetary"))
        val r = Skew.globalNtile(per,
          Seq(col("recency_days"), col("user_id")), 4, "r_score")
        val rf = Skew.globalNtile(r,
          Seq(col("frequency").desc, col("user_id")), 4, "f_score")
        val rfm = Skew.globalNtile(rf,
          Seq(col("monetary").desc, col("user_id")), 4, "m_score")
        rfm.select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary"),
            col("r_score").cast("int").as("r_score"),
            col("f_score").cast("int").as("f_score"),
            col("m_score").cast("int").as("m_score"),
            concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
          .orderBy("user_id")
      },
      Some("""WITH p AS (SELECT user_id, value,
            epoch_us(CAST(ts AS TIMESTAMP)) AS eus
          FROM events WHERE event_type = 'purchase'),
        ref AS (SELECT max(eus) AS ref_eus FROM p),
        per AS (SELECT user_id,
            CAST((ref_eus - max(eus)) // 86400000000 AS BIGINT) AS recency_days,
            count(*) AS frequency,
            round(sum(value), 2) AS monetary
          FROM p CROSS JOIN ref GROUP BY user_id, ref_eus),
        sc AS (SELECT *,
            ntile(4) OVER (ORDER BY recency_days, user_id) AS r_score,
            ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
            ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
          FROM per)
        SELECT user_id, recency_days, frequency, monetary,
          CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
          CAST(m_score AS INT) AS m_score,
          CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
            CAST(m_score AS VARCHAR) AS segment
        FROM sc ORDER BY user_id""")),

    Q(
      "analytics_streaks",
      "Longest consecutive-day purchase streak per user — the gaps-" +
        "and-islands engagement metric: distinct active days, island " +
        "key = day − row_number (consecutive days share it), longest " +
        "island per user. Two partitioned windows + two hash aggs, " +
        "all integer/date arithmetic — the same plan sweeps a billion " +
        "users because everything is keyed on user_id.",
      (s, dir) => {
        val days = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        days
          .withColumn("grp", expr("date_sub(day, row_number() OVER " +
            "(PARTITION BY user_id ORDER BY day))"))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("max_streak"), count(lit(1)).as("n_streaks"),
            sum("len").as("active_days"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          FROM events WHERE event_type = 'purchase'),
        isl AS (SELECT user_id,
            day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
              AS INT) AS grp
          FROM days),
        st AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
        SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks,
          CAST(sum(len) AS BIGINT) AS active_days
        FROM st GROUP BY user_id ORDER BY user_id""")),

    Q(
      "analytics_market_basket",
      "Association-rule mining over order baskets — support / " +
        "confidence / lift for co-purchased part pairs (the " +
        "recommender/affinity primitive): distinct (order, part) " +
        "baskets, pair candidates by order-keyed self-join (never " +
        "all-pairs — co-occurrence only), item supports re-aggregated " +
        "and joined back by part key, basket total a 1-row broadcast. " +
        "Counts are exact integers; confidence and lift are two final " +
        "divisions; top-20 rules by lift via TakeOrderedAndProject. " +
        "A support floor (≥ 2 baskets) prunes the singleton tail " +
        "before the metric join — the same cut a production run " +
        "makes, and the reason the pair table stays bounded.",
      (s, dir) => {
        // r18 (guide §2.3/§2.4): every downstream quantity flows from
        // ONE grouped basket table — each order's sorted distinct item
        // array (collect_set dedupes map-side, replacing the
        // standalone distinct). The r17 form referenced the distinct
        // (order, part) table five ways (pair join ×2, item supports
        // via the p1/p2 joins, basket total) and the plan audit showed
        // five full scan+distinct passes over lineitem; now baskets
        // are materialized once (bounded arrays — order size caps at
        // 7 lines in TPC-H), pairs explode per-row from the sorted
        // array (the (i < j) combinations ARE the x.pkey < y.pkey
        // join condition), and supports/totals re-derive from the
        // same cut table with map-side-combinable counts
        val baskets = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("okey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .transform(Skew.cut)
        val nB = baskets.agg(count(lit(1)).as("n_baskets"))
        val item = baskets.select(explode(col("ps")).as("pkey"))
          .groupBy(col("pkey")).agg(count(lit(1)).as("supp"))
          .transform(Skew.cut)
        val pairs = baskets
          .select(explode(expr(
            "flatten(transform(ps, (x, i) -> " +
              "transform(slice(ps, i + 2, size(ps)), " +
              "y -> struct(x AS p1, y AS p2))))")).as("p"))
          .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
          .agg(count(lit(1)).as("n_both"))
          .filter(col("n_both") >= 2)
        pairs
          .join(item.select(col("pkey").as("p1"), col("supp").as("s1")), Seq("p1"))
          .join(item.select(col("pkey").as("p2"), col("supp").as("s2")), Seq("p2"))
          .crossJoin(broadcast(nB))
          .select(col("p1"), col("p2"), col("n_both"), col("s1"), col("s2"),
            round(col("n_both").cast("double") / col("s1"), 4).as("confidence"),
            round(col("n_both").cast("double") * col("n_baskets")
              / (col("s1").cast("double") * col("s2")), 4).as("lift"))
          .orderBy(col("lift").desc, col("p1"), col("p2"))
          .limit(20)
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
          FROM lineitem),
        nb AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_baskets FROM b),
        item AS (SELECT pkey, count(*) AS supp FROM b GROUP BY 1),
        pairs AS (SELECT x.pkey AS p1, y.pkey AS p2, count(*) AS n_both
          FROM b x JOIN b y ON x.okey = y.okey AND x.pkey < y.pkey
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p1, p2, n_both,
          i1.supp AS s1, i2.supp AS s2,
          round(CAST(n_both AS DOUBLE) / i1.supp, 4) AS confidence,
          round(CAST(n_both AS DOUBLE) * n_baskets
            / (CAST(i1.supp AS DOUBLE) * i2.supp), 4) AS lift
        FROM pairs
        JOIN item i1 ON i1.pkey = p1
        JOIN item i2 ON i2.pkey = p2
        CROSS JOIN nb
        ORDER BY lift DESC, p1, p2 LIMIT 20""")),

    Q(
      "analytics_cohort_revenue",
      "Cohort lifetime-value curve: users grouped by first-activity " +
        "week, cumulative per-user purchase revenue tracked over " +
        "weeks-since-signup — the LTV curve growth teams read. " +
        "Cohort assignment is one min-aggregation; the cumulative sum " +
        "runs in a window partitioned by cohort; revenue stays exact " +
        "integer cents until the final per-user division.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("user_id"), col("ts"),
            weekofyear(col("ts")).as("wk"),
            when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
        val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        val weekly = e.join(broadcast(cohort), Seq("user_id"))
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("weeks_since"))
          .agg(sum("cents").as("rev"), countDistinct("user_id").as("n_active"))
        val sizes = cohort.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_size"))
        val w = Window.partitionBy("cohort_wk").orderBy("weeks_since")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        weekly.join(broadcast(sizes), Seq("cohort_wk"))
          .withColumn("cum_rev", sum("rev").over(w))
          .select(col("cohort_wk"), col("weeks_since"), col("cohort_size"),
            col("n_active"),
            round(col("cum_rev").cast("double") / col("cohort_size") / 100.0, 2)
              .as("cum_rev_per_user"))
          .orderBy("cohort_wk", "weeks_since")
      },
      Some("""WITH e AS (SELECT user_id,
            CAST(weekofyear(CAST(ts AS TIMESTAMP)) AS INT) AS wk,
            CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
          FROM events),
        cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
        weekly AS (SELECT cohort_wk, e.wk - cohort_wk AS weeks_since,
            CAST(sum(cents) AS BIGINT) AS rev,
            count(DISTINCT e.user_id) AS n_active
          FROM e JOIN cohort ON e.user_id = cohort.user_id
          GROUP BY 1, 2),
        sizes AS (SELECT cohort_wk, count(*) AS cohort_size
          FROM cohort GROUP BY 1),
        c AS (SELECT weekly.cohort_wk, weeks_since, cohort_size, n_active,
            CAST(sum(rev) OVER (PARTITION BY weekly.cohort_wk ORDER BY weeks_since
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev
          FROM weekly JOIN sizes ON weekly.cohort_wk = sizes.cohort_wk)
        SELECT cohort_wk, weeks_since, cohort_size, n_active,
          round(CAST(cum_rev AS DOUBLE) / cohort_size / 100.0, 2)
            AS cum_rev_per_user
        FROM c ORDER BY cohort_wk, weeks_since""")),

    Q(
      "analytics_audience_overlap",
      "Audience overlap between every event-type pair — how many " +
        "users do BOTH, as count and Jaccard (the cross-feature " +
        "adoption matrix growth teams segment by): distinct " +
        "(user, type) audiences, intersections via a user-keyed " +
        "self-join (co-occurrence only, never audiences×audiences), " +
        "sizes re-aggregated and joined back. Exact set arithmetic.",
      (s, dir) => {
        val aud = Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_type")).distinct()
        val sizes = aud.groupBy("event_type").agg(count(lit(1)).as("n"))
        val inter = aud.as("a").join(aud.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
        inter
          .join(sizes.select(col("event_type").as("type_a"), col("n").as("na")), Seq("type_a"))
          .join(sizes.select(col("event_type").as("type_b"), col("n").as("nb")), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("n_both"),
            round(col("n_both").cast("double")
              / (col("na") + col("nb") - col("n_both")), 6).as("jaccard"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH aud AS (SELECT DISTINCT user_id, event_type FROM events),
        sizes AS (SELECT event_type, count(*) AS n FROM aud GROUP BY 1),
        inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            count(*) AS n_both
          FROM aud a JOIN aud b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, n_both,
          round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.event_type = type_a
        JOIN sizes sb ON sb.event_type = type_b
        ORDER BY type_a, type_b""")),

    Q(
      "analytics_new_vs_returning",
      "Daily new-vs-returning user split — the acquisition/retention " +
        "decomposition on every growth dashboard: distinct active " +
        "(user, day) pairs, each user's first-ever day from one min-" +
        "aggregation joined back on the user key, daily conditional " +
        "counts. All integer set arithmetic; the user-keyed join is " +
        "the only shuffle beyond the final per-day rollup.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val first = e.groupBy("user_id").agg(min("day").as("fday"))
        e.join(first, Seq("user_id"))
          .groupBy("day")
          .agg(count(when(col("day") === col("fday"), 1)).as("new_users"),
            count(when(col("day") =!= col("fday"), 1)).as("returning_users"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          FROM events),
        f AS (SELECT user_id, min(day) AS fday FROM e GROUP BY 1)
        SELECT day,
          count(CASE WHEN day = fday THEN 1 END) AS new_users,
          count(CASE WHEN day <> fday THEN 1 END) AS returning_users
        FROM e JOIN f USING (user_id)
        GROUP BY day ORDER BY day""")),

    Q(
      "analytics_churn",
      "Week-over-week churn — for each calendar week of the event " +
        "month, the fraction of that week's active users who do NOT " +
        "appear in the following week (the complement of " +
        "analytics_retention's cohort view, sliced by adjacent " +
        "periods). Active user-weeks dedupe in one hash aggregation; " +
        "the did-they-return probe is a LEFT join of user-weeks onto " +
        "themselves shifted by one week — an equi-join on " +
        "(user, week+1), hash-partitionable at any scale. The final " +
        "week has no successor and is excluded.",
      (s, dir) => {
        val uw = Tables.t(s, dir, "events")
          .select(col("user_id"),
            floor((dayofmonth(col("ts")) - 1) / 7).cast("int").as("wk"))
          .distinct()
        val nxt = uw.select(col("user_id"), (col("wk") - 1).as("wk"),
          lit(1).as("ret"))
        val maxWk = uw.agg(max("wk").as("mw"))
        uw.join(nxt, Seq("user_id", "wk"), "left")
          .crossJoin(broadcast(maxWk))
          .filter(col("wk") < col("mw"))
          .groupBy("wk")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("ret").isNull, 1).otherwise(0)).as("n_churned"))
          .select(col("wk").as("week"), col("n_active"), col("n_churned"),
            round(col("n_churned").cast("double") / col("n_active"), 4)
              .as("churn_rate"))
          .orderBy("week")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            CAST(floor((day(CAST(ts AS TIMESTAMP)) - 1) / 7) AS INT) AS wk
          FROM events),
        nxt AS (SELECT user_id, wk - 1 AS wk, 1 AS ret FROM uw),
        mw AS (SELECT max(wk) AS mw FROM uw)
        SELECT uw.wk AS week, count(*) AS n_active,
          CAST(sum(CASE WHEN nxt.ret IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_churned,
          round(CAST(sum(CASE WHEN nxt.ret IS NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*), 4) AS churn_rate
        FROM uw
        LEFT JOIN nxt ON uw.user_id = nxt.user_id AND uw.wk = nxt.wk
        CROSS JOIN mw
        WHERE uw.wk < mw.mw
        GROUP BY uw.wk ORDER BY week""")),

    Q(
      "analytics_lorenz",
      "Revenue-concentration (Lorenz) deciles — each user-spend " +
        "decile's share of total purchase value, the curve behind " +
        "stats_gini's single number (decile 10 holding 40% of " +
        "revenue is the whale-dependence readout). Per-user totals " +
        "are exact cents; the decile assignment uses Skew." +
        "globalNtile (range-repartitioned rank + broadcast offsets " +
        "— bit-identical to the SQL ntile(10) the oracle runs, with " +
        "NO single-task window); shares divide exact integer sums " +
        "against a 1-row broadcast total.",
      (s, dir) => {
        val spend = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val tot = spend.agg(sum("cents").as("tc"))
        Skew.globalNtile(spend, Seq(col("cents"), col("user_id")), 10, "decile")
          .groupBy("decile")
          .agg(count(lit(1)).as("n_users"), sum("cents").as("dc"))
          .crossJoin(broadcast(tot))
          .select(col("decile"), col("n_users"),
            round(col("dc") / 100.0, 2).as("revenue"),
            round(col("dc").cast("double") / col("tc"), 4).as("share"))
          .orderBy("decile")
      },
      Some("""WITH spend AS (SELECT user_id,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        t AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM spend),
        d AS (SELECT user_id, cents,
            CAST(ntile(10) OVER (ORDER BY cents, user_id) AS BIGINT)
              AS decile
          FROM spend)
        SELECT decile, count(*) AS n_users,
          round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS revenue,
          round(CAST(sum(cents) AS DOUBLE) / max(tc), 4) AS share
        FROM d CROSS JOIN t
        GROUP BY decile ORDER BY decile""")),

    Q(
      "analytics_inter_event_gaps",
      "Inter-event gap histogram — the distribution of time between " +
        "a user's consecutive events in decade buckets (<1 s, 1–10 s, " +
        "10–100 s, 100–1000 s, ≥1000 s): THE diagnostic that " +
        "justifies a session timeout (stream_session_gap's 30-minute " +
        "gap should sit in the histogram's valley, not on a mode). " +
        "One lag window per user on exact epoch-µs integers; bucket " +
        "edges are integer thresholds; one hash aggregation to 5 " +
        "rows.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val gaps = Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            Tables.epochUs(col("ts")).as("us"))
          .withColumn("gap", col("us") - lag("us", 1).over(w))
          .filter(col("gap").isNotNull)
        val b = when(col("gap") < 1000000L, 0)
          .when(col("gap") < 10000000L, 1)
          .when(col("gap") < 100000000L, 2)
          .when(col("gap") < 1000000000L, 3)
          .otherwise(4)
        val tot = gaps.agg(count(lit(1)).as("ng"))
        gaps.select(b.as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_gaps"))
          .crossJoin(broadcast(tot))
          .select(col("bucket"),
            element_at(array(lit("<1s"), lit("1-10s"), lit("10-100s"),
              lit("100-1000s"), lit(">=1000s")), col("bucket") + 1)
              .as("label"),
            col("n_gaps"),
            round(col("n_gaps").cast("double") / col("ng"), 4).as("share"))
          .orderBy("bucket")
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        g AS (SELECT us - lag(us) OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS gap
          FROM ev QUALIFY gap IS NOT NULL),
        b AS (SELECT CASE WHEN gap < 1000000 THEN 0
            WHEN gap < 10000000 THEN 1
            WHEN gap < 100000000 THEN 2
            WHEN gap < 1000000000 THEN 3 ELSE 4 END AS bucket
          FROM g),
        t AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM b)
        SELECT bucket,
          (['<1s', '1-10s', '10-100s', '100-1000s', '>=1000s'])[bucket + 1]
            AS label,
          count(*) AS n_gaps,
          round(CAST(count(*) AS DOUBLE) / max(ng), 4) AS share
        FROM b CROSS JOIN t
        GROUP BY bucket ORDER BY bucket""")),

    Q(
      "analytics_markov_attribution",
      s"Markov-chain (removal-effect) attribution — the data-driven " +
        "alternative to the heuristic first/last-touch models of " +
        "analytics_touch_model_compare and the Shapley game of " +
        "analytics_shapley_attribution: user journeys up to the first " +
        "purchase become a start→channels→{conv,null} transition " +
        "matrix; each channel's credit is how much the start→conv " +
        s"absorption probability (a fixed $MarkovIterations-step " +
        "truncated power iteration — both engines run the identical " +
        "trajectory) drops when that channel's inbound edges are " +
        "redirected to the drop state. All five scenarios (base + 4 " +
        "removals) ride ONE tagged frame, and the whole K-step value " +
        "iteration runs as ONE packed fold per scenario row (the " +
        "transition list is |scenarios|·|states|²-bounded — a " +
        "dimension, so packing it is scale-correct), one job with " +
        "zero per-step exchanges — transition probabilities are " +
        "exact count ratios and every per-state reduction " +
        "array_sorts its terms (Stats.sfold's exact summation " +
        "order), so the whole trajectory replays bit-identically " +
        "in DuckDB.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select(col("user_id"), Tables.epochUs(col("ts")).as("tu"),
            col("event_id"),
            when(col("event_type") === "purchase", lit("conv"))
              .otherwise(col("event_type")).as("state"))
        val wP = Window.partitionBy("user_id").orderBy("tu", "event_id")
        val fp = ev.filter(col("state") === "conv")
          .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
          .select(col("user_id"), col("tu").as("fu"), col("event_id").as("fid"))
        val kept = ev.join(fp, Seq("user_id"), "left")
          .filter(col("fu").isNull || col("tu") < col("fu") ||
            (col("tu") === col("fu") && col("event_id") <= col("fid")))
        val transitions = kept
          .withColumn("prev", lag(col("state"), 1, "start").over(wP))
          .select(col("prev").as("src"), col("state").as("dst"))
        val terminal = kept.filter(col("fu").isNull)
          .withColumn("rn", row_number().over(Window.partitionBy("user_id")
            .orderBy(col("tu").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("state").as("src"), lit("null").as("dst"))
        val counts = transitions.union(terminal)
          .groupBy("src", "dst").agg(count(lit(1)).as("c"))
          .transform(Skew.cut)
        val scTags = ("base" +: MarkovChannels).map(lit)
        val remapped = counts
          .select(explode(array(scTags: _*)).as("sc"),
            col("src"), col("dst"), col("c"))
          .filter(col("sc") === "base" || col("src") =!= col("sc"))
          .select(col("sc"), col("src"),
            when(col("sc") =!= "base" && col("dst") === col("sc"), lit("null"))
              .otherwise(col("dst")).as("dst"),
            col("c"))
          .groupBy("sc", "src", "dst").agg(sum(col("c")).as("c"))
        val tots = remapped.groupBy("sc", "src").agg(sum(col("c")).as("tot"))
        val probs = remapped.join(tots, Seq("sc", "src"))
          .select(col("sc"), col("src"), col("dst"), (col("c") / col("tot")).as("p"))
          .transform(Skew.cut)
        val allStates = Seq("start", "view", "click", "signup", "error", "conv", "null")
        val states = probs.select("sc").distinct()
          .select(col("sc"), explode(array(allStates.map(lit): _*)).as("st"))
          .filter(col("sc") === "base" || col("st") =!= col("sc"))
        // The whole K-step absorption runs as ONE packed fold per
        // scenario row: each scenario's transition list (≤ |states|²
        // rows — dimension-bounded, never corpus-bounded) and state
        // spine pack into arrays, and the 20 value-iteration steps are
        // an aggregate() over sequence(1, K) — one job, zero
        // per-iteration exchanges or checkpoints, where the loop form
        // paid 2 exchanges × K steps plus periodic eager cuts. The
        // trajectory is BIT-identical to the loop (and to the oracle's
        // unrolled CTEs): each state's incoming terms p·v[dst] are
        // array_sort'ed before the left fold — exactly Stats.sfold's
        // sort_array(collect_list(...)) summation order.
        val packed = states.groupBy("sc")
          .agg(sort_array(collect_list(col("st"))).as("sts"))
          .join(probs.groupBy("sc")
            .agg(collect_list(struct(col("src"), col("dst"), col("p"))).as("edges")),
            Seq("sc"))
        val vFinal = packed.select(col("sc"), col("sts"), expr(
          s"""aggregate(sequence(1, $MarkovIterations),
               transform(sts, st -> IF(st = 'conv',
                 CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))),
               (v, i) -> transform(sts, st ->
                 CASE WHEN st = 'conv' THEN CAST(1.0 AS DOUBLE)
                      WHEN st = 'null' THEN CAST(0.0 AS DOUBLE)
                      ELSE aggregate(
                        array_sort(transform(filter(edges, e -> e.src = st),
                          e -> e.p * element_at(v, CAST(array_position(sts, e.dst) AS INT)))),
                        CAST(0.0 AS DOUBLE), (a, x) -> a + x) END))""").as("v"))
        val vstart = vFinal.select(col("sc"),
          expr("element_at(v, CAST(array_position(sts, 'start') AS INT))").as("v"))
        val base = vstart.filter(col("sc") === "base").select(col("v").as("vb"))
        val rem = vstart.filter(col("sc") =!= "base")
          .crossJoin(broadcast(base))
          .select(col("sc").as("channel"), col("vb"), col("v").as("vc"),
            ((col("vb") - col("v")) / col("vb")).as("re"))
        // limit(8) is a no-op on the 4-channel frame but gives the
        // bounded-collect lint its structural GlobalLimit proof
        val sre = rem.limit(8).agg(Stats.sfold(col("re")).as("sre"))
        rem.crossJoin(broadcast(sre))
          .select(col("channel"), round(col("vb"), 6).as("conv_base"),
            round(col("vc"), 6).as("conv_removed"),
            round(col("re"), 6).as("removal_effect"),
            round(when(col("sre") =!= 0, col("re") / col("sre"))
              .otherwise(lit(0.0)), 6).as("attribution_share"))
          .orderBy("channel")
      },
      Some(markovSql))
  ) ++ qiniDefs

  private val MarkovIterations = 20
  private val MarkovChannels = Seq("view", "click", "signup", "error")

  /** Unrolled truncated-power-iteration oracle for
    * [[analytics_markov_attribution]]: the identical journey → counts
    * → tagged-scenario remap → K absorption steps, one MATERIALIZED
    * CTE per iteration (DuckDB inlines plain CTEs per reference — the
    * chain would otherwise re-expand the whole upstream per step). */
  private def markovSql: String = {
    val steps = (1 to MarkovIterations).map { k =>
      val prev = s"v${k - 1}"
      s"""v$k AS MATERIALIZED (
        SELECT st.sc, st.st,
          CASE WHEN st.st = 'conv' THEN 1.0
            WHEN st.st = 'null' THEN 0.0
            ELSE coalesce(t.sv, 0.0) END AS v
        FROM states st LEFT JOIN (
          SELECT p.sc, p.src AS st,
            list_reduce(list_sort(list(p.p * pv.v)), (x, y) -> x + y) AS sv
          FROM probs p JOIN $prev pv ON pv.sc = p.sc AND pv.st = p.dst
          GROUP BY 1, 2) t
        ON t.sc = st.sc AND t.st = st.st)"""
    }.mkString(",\n")
    s"""WITH ev AS MATERIALIZED (SELECT user_id,
          epoch_us(CAST(ts AS TIMESTAMP)) AS tu, event_id,
          CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END
            AS state
        FROM events),
      fp AS MATERIALIZED (SELECT user_id, tu AS fu, event_id AS fid
        FROM (SELECT user_id, tu, event_id, row_number()
            OVER (PARTITION BY user_id ORDER BY tu, event_id) AS rn
          FROM ev WHERE state = 'conv')
        WHERE rn = 1),
      kept AS MATERIALIZED (SELECT e.user_id, e.tu, e.event_id, e.state, f.fu
        FROM ev e LEFT JOIN fp f USING (user_id)
        WHERE f.fu IS NULL OR e.tu < f.fu
          OR (e.tu = f.fu AND e.event_id <= f.fid)),
      trans AS (SELECT
          lag(state, 1, 'start') OVER (PARTITION BY user_id
            ORDER BY tu, event_id) AS src,
          state AS dst
        FROM kept),
      term AS (SELECT state AS src, 'null' AS dst
        FROM (SELECT state, row_number() OVER (PARTITION BY user_id
            ORDER BY tu DESC, event_id DESC) AS rn
          FROM kept WHERE fu IS NULL)
        WHERE rn = 1),
      counts AS MATERIALIZED (SELECT src, dst, count(*) AS c
        FROM (SELECT src, dst FROM trans UNION ALL SELECT src, dst FROM term)
        GROUP BY 1, 2),
      scen AS (SELECT unnest(['base', 'view', 'click', 'signup', 'error'])
        AS sc),
      remapped AS MATERIALIZED (SELECT sc, src,
          CASE WHEN sc <> 'base' AND dst = sc THEN 'null' ELSE dst END AS dst,
          CAST(sum(cc) AS BIGINT) AS c
        FROM (SELECT s.sc, c.src, c.dst, c.c AS cc
          FROM counts c CROSS JOIN scen s
          WHERE s.sc = 'base' OR c.src <> s.sc)
        GROUP BY 1, 2, 3),
      tots AS (SELECT sc, src, CAST(sum(c) AS BIGINT) AS tot
        FROM remapped GROUP BY 1, 2),
      probs AS MATERIALIZED (SELECT r.sc, r.src, r.dst, r.c / t.tot AS p
        FROM remapped r JOIN tots t ON t.sc = r.sc AND t.src = r.src),
      states AS MATERIALIZED (SELECT s.sc, u.st
        FROM scen s CROSS JOIN (SELECT unnest(
          ['start', 'view', 'click', 'signup', 'error', 'conv', 'null'])
          AS st) u
        WHERE s.sc = 'base' OR u.st <> s.sc),
      v0 AS MATERIALIZED (SELECT sc, st,
        CASE WHEN st = 'conv' THEN 1.0 ELSE 0.0 END AS v FROM states),
      $steps,
      vstart AS (SELECT sc, v FROM v$MarkovIterations WHERE st = 'start'),
      vb AS (SELECT v AS vb FROM vstart WHERE sc = 'base'),
      rem AS MATERIALIZED (SELECT sc AS channel, vb, v AS vc,
          (vb - v) / vb AS re
        FROM vstart CROSS JOIN vb WHERE sc <> 'base'),
      sre AS (SELECT list_reduce(list_sort(list(re)), (x, y) -> x + y)
        AS sre FROM rem)
      SELECT channel, round(vb, 6) AS conv_base, round(vc, 6) AS conv_removed,
        round(re, 6) AS removal_effect,
        round(CASE WHEN sre <> 0 THEN re / sre ELSE 0.0 END, 6)
          AS attribution_share
      FROM rem CROSS JOIN sre ORDER BY channel"""
  }

  /** Deterministic 50/50 assignment by portable hash — the qini
    * query's stand-in for a real experiment flag column. */
  private def qiniDefs: Seq[Q] = Seq(
    Q(
      "analytics_qini_uplift",
      "Qini uplift curve by activity decile: users split 50/50 by a " +
        "deterministic portable hash (standing in for the experiment " +
        "flag), outcome = converted to purchase, score = event " +
        "volume; per score decile the treatment-minus-control " +
        "conversion lift, plus the cumulative Qini coefficient the " +
        "targeting curve is ranked by — the standard diagnostic for " +
        "WHO an intervention works on, completing the experiment " +
        "family (CUPED variance reduction, diff-in-diff, two-" +
        "proportion z). Deciles ride the scalable global-ntile spine " +
        "(no unpartitioned window); every cell is an exact integer " +
        "count; the 10-row cumulative pass is a sorted-array prefix " +
        "fold.",
      (s, dir) => {
        val users = Tables.t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("score"),
            max((col("event_type") === "purchase").cast("int")).as("y"))
          .withColumn("trt",
            (graft.ops.PortableHash.hexHash(
              concat(lit("qini:"), col("user_id").cast("string"))) % 2).cast("int"))
        val dec = Skew.globalNtile(users,
          Seq(col("score").desc, col("user_id")), 10, "decile")
        val cells = dec.groupBy("decile")
          .agg(sum(col("trt").cast("long")).as("nt"),
            sum((lit(1) - col("trt")).cast("long")).as("nc"),
            sum((col("trt") * col("y")).cast("long")).as("ct"),
            sum(((lit(1) - col("trt")) * col("y")).cast("long")).as("cc"))
        val packed = cells
          .agg(sort_array(collect_list(struct(col("decile"), col("nt"),
            col("nc"), col("ct"), col("cc")))).as("a"))
          .select(explode(expr(
            """transform(a, (x, i) -> struct(
                 x.decile AS decile, x.nt AS nt, x.nc AS nc,
                 x.ct AS ct, x.cc AS cc,
                 aggregate(slice(a, 1, i + 1), 0L, (s, e) -> s + e.nt) AS cnt,
                 aggregate(slice(a, 1, i + 1), 0L, (s, e) -> s + e.nc) AS cnc,
                 aggregate(slice(a, 1, i + 1), 0L, (s, e) -> s + e.ct) AS cct,
                 aggregate(slice(a, 1, i + 1), 0L, (s, e) -> s + e.cc) AS ccc))"""))
            .as("r"))
          .select(col("r.*"))
        packed.select(col("decile").cast("int").as("decile"),
            col("nt"), col("nc"), col("ct"), col("cc"),
            when(col("nt") > 0 && col("nc") > 0,
              round(col("ct").cast("double") / col("nt") -
                col("cc").cast("double") / col("nc"), 4)).as("uplift"),
            when(col("cnc") > 0,
              round(col("cct").cast("double") -
                col("ccc").cast("double") * col("cnt") / col("cnc"), 4))
              .as("qini"))
          .orderBy("decile")
      },
      Some(s"""WITH users AS (SELECT user_id, count(*) AS score,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
          FROM events GROUP BY 1),
        flagged AS (SELECT user_id, score, y,
            CAST(${PortableHash.hexHashSql("'qini:' || CAST(user_id AS VARCHAR)")} % 2
              AS INT) AS trt
          FROM users),
        dec AS (SELECT *, CAST(ntile(10) OVER (
            ORDER BY score DESC, user_id) AS BIGINT) AS decile
          FROM flagged),
        cells AS (SELECT decile,
            CAST(sum(trt) AS BIGINT) AS nt,
            CAST(sum(1 - trt) AS BIGINT) AS nc,
            CAST(sum(trt * y) AS BIGINT) AS ct,
            CAST(sum((1 - trt) * y) AS BIGINT) AS cc
          FROM dec GROUP BY 1),
        cum AS (SELECT decile, nt, nc, ct, cc,
            CAST(sum(nt) OVER w AS BIGINT) AS cnt,
            CAST(sum(nc) OVER w AS BIGINT) AS cnc,
            CAST(sum(ct) OVER w AS BIGINT) AS cct,
            CAST(sum(cc) OVER w AS BIGINT) AS ccc
          FROM cells
          WINDOW w AS (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT CAST(decile AS INT) AS decile, nt, nc, ct, cc,
          CASE WHEN nt > 0 AND nc > 0 THEN
            round(CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc, 4)
          END AS uplift,
          CASE WHEN cnc > 0 THEN
            round(CAST(cct AS DOUBLE) - CAST(ccc AS DOUBLE) * cnt / cnc, 4)
          END AS qini
        FROM cum ORDER BY decile"""))
  )
}
