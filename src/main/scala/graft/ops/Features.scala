package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators for training-data preparation: column
  * standardization, categorical one-hot encoding, the hashing trick,
  * quantile binning, a deterministic mode aggregate, and a count-min
  * frequency sketch.
  *
  * Scale posture: every per-group statistic is an aggregate joined back
  * (group stats broadcast — they are dimension-sized), never an
  * unpartitioned window; the hashing trick and the count-min sketch use
  * md5-derived bucket ids so the SAME hash is computable in any engine
  * (the DuckDB oracle replays it exactly — no engine-private hash in
  * the data path). The sketch itself is d×w cells, a broadcastable
  * 1-job aggregate regardless of input size — the standard way to get
  * heavy-hitter frequencies out of a 100 TB corpus without a full
  * groupBy shuffle of the raw keys.
  */
object Features {

  /** First 8 hex chars of md5(s) as a long (0..2^32-1, ANSI-safe) —
    * the portable hash both engines compute identically. */
  import PortableHash.{hexHash, hexHashSql}

  def defs: Seq[Q] = Seq(

    Q(
      "feat_rank_uniform",
      "Quantile (rank-uniform) feature transform: each part's retail " +
        "price mapped to (rank − 1)/(n − 1) ∈ [0, 1] under the total " +
        "order (price, partkey) — the outlier-immune alternative to " +
        "min-max scaling (feat_standardize) whose output distribution " +
        "is uniform by construction. Rides Skew.globalRank: range " +
        "exchange + partition-local window + broadcast prefix " +
        "offsets, with n carried on the same pass — no unpartitioned " +
        "window, no second scan for the count, stage width tracking " +
        "the cluster.",
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
          .select(col("p_partkey"), col("p_retailprice"))
        Skew.globalRank(p, Seq(col("p_retailprice"), col("p_partkey")),
            rankCol = "rk", totalCol = Some("n"))
          .select(col("p_partkey"), col("p_retailprice"),
            round((col("rk") - 1).cast("double")
              / (col("n") - 1).cast("double"), 6).as("u"))
          .orderBy("p_partkey")
      },
      Some("""WITH r AS (
          SELECT p_partkey, p_retailprice,
            row_number() OVER (ORDER BY p_retailprice, p_partkey) AS rk,
            count(*) OVER () AS n
          FROM part)
        SELECT p_partkey, p_retailprice,
          round(CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6) AS u
        FROM r ORDER BY p_partkey""")),

    Q(
      "feat_iv_summary",
      "Information value of candidate features against the " +
        "finished-order target — the feature-selection screen a " +
        "credit/churn modeler runs before training (IV < 0.02 " +
        "useless, > 0.3 strong): IV = Σ_bins (p_good − p_bad)·WoE " +
        "with 0.5 Laplace smoothing so empty cells stay finite. Two " +
        "features (priority category, fixed price bands) profiled in " +
        "one union; counts are exact integers from two hash aggs, " +
        "the per-feature sum folds over ≤5 bins sorted by bin label. " +
        "Completes feat_woe_encode (per-bin WoE) with the per-" +
        "feature ranking number.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .withColumn("target", (col("o_orderstatus") === "F").cast("int"))
        def binned(feat: Column, name: String) = o
          .select(lit(name).as("feature"), feat.as("bin"), col("target"))
        val bins = binned(col("o_orderpriority"), "priority")
          .unionByName(binned(
            when(col("o_totalprice") < 100000, "p0_lo")
              .when(col("o_totalprice") < 200000, "p1_mid")
              .when(col("o_totalprice") < 300000, "p2_hi")
              .otherwise("p3_top"), "price_band"))
        val cells = bins.groupBy("feature", "bin").agg(
          sum("target").cast("long").as("g"),
          (count(lit(1)) - sum("target")).cast("long").as("b"))
        val tots = cells.groupBy("feature").agg(
          sum("g").as("gt"), sum("b").as("bt"))
        val woe = cells.join(tots, "feature")
          .withColumn("pg",
            (col("g").cast("double") + 0.5) / (col("gt").cast("double") + 0.5))
          .withColumn("pb",
            (col("b").cast("double") + 0.5) / (col("bt").cast("double") + 0.5))
          .withColumn("term", (col("pg") - col("pb")) * log(col("pg") / col("pb")))
        woe.groupBy("feature").agg(
            count(lit(1)).as("n_bins"),
            aggregate(sort_array(collect_list(struct(col("bin"), col("term")))),
              lit(0.0), (a, e) => a + e.getField("term")).as("iv"))
          .select(col("feature"), col("n_bins"), round(col("iv"), 6).as("iv"))
          .orderBy("feature")
      },
      Some("""WITH o AS (
          SELECT o_orderpriority, o_totalprice,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS target
          FROM orders),
        bins AS (
          SELECT 'priority' AS feature, o_orderpriority AS bin, target FROM o
          UNION ALL
          SELECT 'price_band' AS feature,
            CASE WHEN o_totalprice < 100000 THEN 'p0_lo'
              WHEN o_totalprice < 200000 THEN 'p1_mid'
              WHEN o_totalprice < 300000 THEN 'p2_hi'
              ELSE 'p3_top' END AS bin, target
          FROM o),
        cells AS (
          SELECT feature, bin, CAST(sum(target) AS BIGINT) AS g,
            CAST(count(*) AS BIGINT) - CAST(sum(target) AS BIGINT) AS b
          FROM bins GROUP BY 1, 2),
        tots AS (SELECT feature, CAST(sum(g) AS BIGINT) AS gt,
            CAST(sum(b) AS BIGINT) AS bt
          FROM cells GROUP BY 1),
        woe AS (
          SELECT c.feature, c.bin,
            ((CAST(c.g AS DOUBLE) + 0.5) / (CAST(t.gt AS DOUBLE) + 0.5)
              - (CAST(c.b AS DOUBLE) + 0.5) / (CAST(t.bt AS DOUBLE) + 0.5))
            * ln(((CAST(c.g AS DOUBLE) + 0.5) / (CAST(t.gt AS DOUBLE) + 0.5))
              / ((CAST(c.b AS DOUBLE) + 0.5) / (CAST(t.bt AS DOUBLE) + 0.5)))
              AS term
          FROM cells c JOIN tots t USING (feature))
        SELECT feature, count(*) AS n_bins,
          round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list(term ORDER BY bin)), (a, b) -> a + b), 6) AS iv
        FROM woe GROUP BY feature ORDER BY feature""")),

    Q(
      "feat_standardize",
      "Per-brand z-score + global min-max scaling of part retail price. " +
        "Group stats computed as a 25-row aggregate and broadcast-joined " +
        "back (never an unpartitioned window); global lo/hi is a 1-row " +
        "cross join. The standard numeric-feature normalization pass.",
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
        val brandStats = p.groupBy("p_brand").agg(
          avg("p_retailprice").as("mu"),
          stddev_samp(col("p_retailprice")).as("sd"))
        val globalStats = p.agg(
          min("p_retailprice").as("lo"), max("p_retailprice").as("hi"))
        p.join(broadcast(brandStats), "p_brand")
          .crossJoin(broadcast(globalStats))
          .select(col("p_partkey"), col("p_brand"),
            round((col("p_retailprice") - col("mu")) / col("sd"), 6).as("z"),
            round((col("p_retailprice") - col("lo")) / (col("hi") - col("lo")), 6)
              .as("minmax"))
          .orderBy("p_partkey")
      },
      Some("""WITH bs AS (
          SELECT p_brand, avg(p_retailprice) AS mu,
                 stddev_samp(p_retailprice) AS sd
          FROM part GROUP BY 1),
        gs AS (SELECT min(p_retailprice) AS lo, max(p_retailprice) AS hi FROM part)
        SELECT p.p_partkey, p.p_brand,
          round((p.p_retailprice - bs.mu) / bs.sd, 6) AS z,
          round((p.p_retailprice - gs.lo) / (gs.hi - gs.lo), 6) AS minmax
        FROM part p JOIN bs USING (p_brand) CROSS JOIN gs
        ORDER BY p_partkey""")),

    Q(
      "feat_onehot",
      "One-hot encoding of the language categorical (fixed, enumerated " +
        "vocabulary — the only scalable form: a data-driven pivot would " +
        "need a schema-defining extra pass) plus a scaled length feature.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val langs = Seq("de", "en", "es", "fr", "zh")
        d.select(
          col("doc_id") +: col("lang") +:
            langs.map(l => (col("lang") === l).cast("int").as(s"lang_$l")) :+
            round(col("n_chars") / lit(1000.0), 6).as("len_kchars"): _*)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
          CAST(lang = 'de' AS INT) AS lang_de,
          CAST(lang = 'en' AS INT) AS lang_en,
          CAST(lang = 'es' AS INT) AS lang_es,
          CAST(lang = 'fr' AS INT) AS lang_fr,
          CAST(lang = 'zh' AS INT) AS lang_zh,
          round(n_chars / 1000.0, 6) AS len_kchars
        FROM documents ORDER BY doc_id""")),

    Q(
      "feat_hash_bucket",
      "Hashing trick: tokens hashed into 32 buckets (md5-derived, " +
        "engine-portable), per-doc bucket counts — fixed-width " +
        "bag-of-words features with no vocabulary pass. Explode → " +
        "groupBy(doc, bucket): one shuffle on the doc key.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .withColumn("bucket", hexHash(col("token")) % 32)
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
          .orderBy("doc_id", "bucket")
      },
      Some(s"""SELECT doc_id, ${hexHashSql("token")} % 32 AS bucket,
          count(*) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE doc_id < 50)
        GROUP BY 1, 2 ORDER BY doc_id, bucket""")),

    Q(
      "feat_target_encode",
      "Smoothed target (mean) encoding of the source categorical " +
        "against the n_chars target, m-estimate smoothing (m=10): " +
        "encoded = (Σ target + m·prior) / (n + m), prior = global " +
        "mean. Rare categories shrink toward the prior — the leakage-" +
        "bounded categorical encoder of tabular feature pipelines. Two " +
        "integer-sum aggregations (exact in any order, so no float-" +
        "determinism caveat) + a 1-row broadcast; the encode itself is " +
        "arithmetic both engines evaluate identically.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val g = d.agg(sum(col("n_chars")).as("gs"), count(lit(1)).as("gc"))
        d.groupBy("source")
          .agg(sum(col("n_chars")).as("ss"), count(lit(1)).as("sc"))
          .crossJoin(broadcast(g))
          .select(col("source"), col("sc").as("n_docs"),
            round(col("gs").cast("double") / col("gc"), 6).as("prior"),
            round((col("ss") + lit(10.0) * (col("gs").cast("double") / col("gc")))
              / (col("sc") + lit(10.0)), 6).as("encoded"))
          .orderBy("source")
      },
      Some("""WITH g AS (SELECT CAST(sum(n_chars) AS BIGINT) AS gs, count(*) AS gc FROM documents),
        s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS ss, count(*) AS sc
          FROM documents GROUP BY 1)
        SELECT source, sc AS n_docs,
          round(CAST(gs AS DOUBLE) / gc, 6) AS prior,
          round((ss + 10.0 * (CAST(gs AS DOUBLE) / gc)) / (sc + 10.0), 6) AS encoded
        FROM s CROSS JOIN g ORDER BY source""")),

    Q(
      "feat_woe_encode",
      "Weight-of-evidence encoding of the source categorical against " +
        "a binary target (doc length at or above the global mean): " +
        "WOE = ln((good_s/G)/(bad_s/B)) with add-half smoothing, plus " +
        "each category's information-value term — the scorecard-" +
        "standard encoder for monotone categorical risk features. The " +
        "global mean and the good/bad totals are 1-row broadcasts; " +
        "per-category counts are one map-side-combinable agg; all " +
        "ratios are exact integer arithmetic into a single ln that " +
        "rounds at 4.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val g = d.agg((sum("n_chars") / count(lit(1))).as("mu"))
        val flagged = d.crossJoin(broadcast(g))
          .withColumn("good", (col("n_chars") >= col("mu")).cast("long"))
        val cat = flagged.groupBy("source")
          .agg(sum("good").as("n_good"),
            sum(lit(1L) - col("good")).as("n_bad"))
        val tot = cat.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
        cat.crossJoin(broadcast(tot))
          .withColumn("pg", (col("n_good") + 0.5) / (col("tg") + 1.0))
          .withColumn("pb", (col("n_bad") + 0.5) / (col("tb") + 1.0))
          .select(col("source"), col("n_good"), col("n_bad"),
            round(log(col("pg") / col("pb")), 4).as("woe"),
            round((col("pg") - col("pb")) * log(col("pg") / col("pb")), 4)
              .as("iv_term"))
          .orderBy("source")
      },
      Some("""WITH g AS (SELECT CAST(sum(n_chars) AS BIGINT)
              / CAST(count(*) AS DOUBLE) AS mu FROM documents),
        f AS (SELECT source,
            CASE WHEN n_chars >= mu THEN 1 ELSE 0 END AS good
          FROM documents, g),
        c AS (SELECT source, CAST(sum(good) AS BIGINT) AS n_good,
            CAST(sum(1 - good) AS BIGINT) AS n_bad
          FROM f GROUP BY 1),
        t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
            CAST(sum(n_bad) AS BIGINT) AS tb FROM c),
        p AS (SELECT source, n_good, n_bad,
            (n_good + 0.5) / (tg + 1.0) AS pg,
            (n_bad + 0.5) / (tb + 1.0) AS pb
          FROM c, t)
        SELECT source, n_good, n_bad,
          round(ln(pg / pb), 4) AS woe,
          round((pg - pb) * ln(pg / pb), 4) AS iv_term
        FROM p ORDER BY source""")),

    Q(
      "sketch_countmin",
      "Count-min sketch (d=3, w=16) over the token stream, estimates " +
        "joined against exact counts. The sketch is a 3×16-cell " +
        "aggregate — constant size however large the corpus — and the " +
        "estimate is min over the 3 salted-hash cells (never " +
        "underestimates; DedupSpec-style property in FeatureSpec). " +
        "md5-derived salted hashes keep it engine-portable; the oracle " +
        "replays the identical sketch.",
      (s, dir) => {
        // r18 (guide §1.2/§2.3): ONE corpus pass. The r17 form
        // exploded the raw token stream twice (cells + exact subtrees
        // = two scans) and md5-hashed every raw token ×3 salts; but a
        // cell's count is just the sum of the exact counts of the
        // tokens hashing into it, so the sketch now derives FROM the
        // exact table — md5 runs 3× per DISTINCT token, the corpus is
        // scanned and exploded once, and the salted frame is cut so
        // the cells aggregate and the probe join read the same rows.
        // Cell integers are identical (sum of per-token counts =
        // count of raw occurrences).
        val salts = array(lit(0), lit(1), lit(2))
        def bucket(c: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
          hexHash(concat_ws(":", j, c)) % 16
        val salted = Tables.t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("exact_n"))
          .select(col("token"), col("exact_n"), explode(salts).as("j"))
          .withColumn("bucket", bucket(col("token"), col("j")))
          .transform(graft.ops.Skew.cut)
        val cells = salted.groupBy("j", "bucket").agg(sum("exact_n").as("c"))
        salted
          .join(broadcast(cells), Seq("j", "bucket"))
          .groupBy("token", "exact_n").agg(min("c").as("cm_est"))
          .orderBy("token")
      },
      Some(s"""WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        salted AS (
          SELECT token, j,
            ${hexHashSql("CAST(j AS VARCHAR) || ':' || token")} % 16 AS bucket
          FROM tok CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
        cells AS (SELECT j, bucket, count(*) AS c FROM salted GROUP BY 1, 2),
        exact AS (SELECT token, count(*) AS exact_n FROM tok GROUP BY 1),
        probes AS (
          SELECT e.token, e.exact_n, s.j,
            ${hexHashSql("CAST(s.j AS VARCHAR) || ':' || e.token")} % 16 AS bucket
          FROM exact e CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) s)
        SELECT p.token, p.exact_n, min(c.c) AS cm_est
        FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
        GROUP BY 1, 2 ORDER BY token""")),

    Q(
      "sample_mixture_weighted",
      "Deterministic data-mixture sampling: per-language acceptance " +
        "rates applied via an md5-derived uniform fraction of the doc " +
        "id — the corpus re-weighting step of training-data prep " +
        "(up/down-sample sources to a target mix). Pure per-row filter, " +
        "no shuffle, reproducible across engines and runs (the salt " +
        "string pins the sample).",
      (s, dir) => {
        val rates = map(
          lit("en"), lit(0.9), lit("de"), lit(0.5), lit("es"), lit(0.25),
          lit("fr"), lit(0.1), lit("zh"), lit(0.05))
        Tables.t(s, dir, "documents")
          .withColumn("frac",
            hexHash(concat(lit("mix:"), col("doc_id").cast("string"))) / 4294967296.0)
          .filter(col("frac") < element_at(rates, col("lang")))
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, source
        FROM (SELECT doc_id, lang, source,
            ${hexHashSql("'mix:' || CAST(doc_id AS VARCHAR)")} / 4294967296.0 AS frac
          FROM documents)
        WHERE frac < CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5
          WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.1 WHEN 'zh' THEN 0.05 END
        ORDER BY doc_id""")),

    Q(
      "sample_temperature",
      "Temperature-resampled language mix (α = 0.7): unlike " +
        "sample_mixture_weighted's GIVEN rates, the acceptance rates " +
        "here are DERIVED from corpus statistics — target share ∝ " +
        "n_lang^α, the multilingual-LM rebalancing that upsamples " +
        "low-resource languages relative to their natural share — with " +
        "a half-corpus budget. Rates quantize to 6dp via the floor " +
        "form floor(r·1e6)/1e6 — the same IEEE multiply/floor/divide " +
        "sequence in BOTH engines (round() implementations differ " +
        "between Spark's decimal-string HALF_UP and DuckDB's scaled " +
        "std round, so round() here could disagree at a boundary) — " +
        "before the md5-uniform acceptance compare. Residual cross-" +
        "engine dependency (shared with sample_weighted's ln): " +
        "JVM Math.pow and DuckDB's libm pow agreeing to the last ulp " +
        "on these inputs — a 1-ulp divergence only flips a rate if " +
        "the true value sits within it of a 1e-6 grid line AND a " +
        "doc's 32-bit hash lands in that sliver; accepted and pinned " +
        "here rather than widened away. One 5-row stats " +
        "aggregation (sorted-fold Σ n^α) broadcast back + a per-row " +
        "hash predicate — embarrassingly parallel at any corpus size.",
      (s, dir) => {
        val alpha = 0.7
        val d = Tables.t(s, dir, "documents")
        val sizes = d.groupBy("lang").agg(count(lit(1)).as("n"))
          .withColumn("w", pow(col("n").cast("double"), alpha))
        val tot = sizes.agg(
          sum("n").as("nt"),
          aggregate(sort_array(collect_list(col("w"))), lit(0.0),
            (a, x) => a + x).as("wt"))
        val rates = sizes.crossJoin(broadcast(tot))
          .select(col("lang"),
            (floor(least(lit(1.0),
              (col("nt") / lit(2.0)) * (col("w") / col("wt")) / col("n")) * 1e6) /
              1e6).as("rate"))
        d.join(broadcast(rates), "lang")
          .filter((hexHash(concat(lit("temp:"), col("doc_id").cast("string"))) /
            4294967296.0) < col("rate"))
          .select(col("doc_id"), col("lang"), col("rate"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sizes AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        sw AS (SELECT lang, n, pow(CAST(n AS DOUBLE), 0.7) AS w FROM sizes),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
            list_reduce(list_sort(list(w)), (a, b) -> a + b) AS wt FROM sw),
        rates AS (SELECT lang,
            floor(least(1.0, (nt / 2.0) * (w / wt) / n) * 1e6) / 1e6 AS rate
          FROM sw CROSS JOIN tot)
        SELECT d.doc_id, d.lang, r.rate
        FROM documents d JOIN rates r USING (lang)
        WHERE ${hexHashSql("'temp:' || CAST(d.doc_id AS VARCHAR)")} / 4294967296.0 < r.rate
        ORDER BY d.doc_id""")),

    Q(
      "agg_mode",
      "Deterministic mode: most frequent brand per part size, ties " +
        "broken by brand name (a bare mode() leaves tie order " +
        "engine-defined — unacceptable under the determinism contract). " +
        "groupBy + per-group top-1 window: WindowGroupLimit prunes to " +
        "one row per group before the final sort.",
      (s, dir) => {
        val counts = Tables.t(s, dir, "part")
          .groupBy("p_size", "p_brand").agg(count(lit(1)).as("n_rows"))
        val w = Window.partitionBy("p_size")
          .orderBy(col("n_rows").desc, col("p_brand"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("p_size"), col("p_brand").as("mode_brand"), col("n_rows"))
          .orderBy("p_size")
      },
      Some("""SELECT p_size, p_brand AS mode_brand, n_rows FROM (
          SELECT p_size, p_brand, count(*) AS n_rows,
            row_number() OVER (PARTITION BY p_size
              ORDER BY count(*) DESC, p_brand) AS rn
          FROM part GROUP BY p_size, p_brand)
        WHERE rn = 1 ORDER BY p_size""")),

    Q(
      "feat_quantile_bins",
      "Quantile binning: order totals cut into per-priority deciles " +
        "(ntile over a totally-ordered partitioned window — orderkey " +
        "tie-break), then per-bin count/avg/edges. The discretization " +
        "pass that turns a numeric column into a categorical feature.",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.t(s, dir, "orders")
          .withColumn("decile", ntile(10).over(w))
          .groupBy("o_orderpriority", "decile")
          .agg(count(lit(1)).as("n"),
            round(avg("o_totalprice"), 2).as("avg_price"),
            round(min("o_totalprice"), 2).as("lo"),
            round(max("o_totalprice"), 2).as("hi"))
          .orderBy("o_orderpriority", "decile")
      },
      Some("""SELECT o_orderpriority, decile, count(*) AS n,
          round(avg(o_totalprice), 2) AS avg_price,
          round(min(o_totalprice), 2) AS lo,
          round(max(o_totalprice), 2) AS hi
        FROM (SELECT o_orderpriority, o_totalprice,
            CAST(ntile(10) OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
          FROM orders)
        GROUP BY 1, 2 ORDER BY o_orderpriority, decile""")),

    Q(
      "feat_robust_scale",
      "Robust (median/IQR) scaling summary per event type — the " +
        "outlier-insensitive alternative to feat_standardize's " +
        "mean/stddev, plus a Tukey-fence outlier count (value outside " +
        "q1−1.5·IQR .. q3+1.5·IQR). Quartiles are Spark's exact " +
        "interpolated `percentile` ≡ DuckDB's quantile_cont — same " +
        "(n−1)·p interpolation rule, so the cuts agree bit-for-bit; " +
        "the per-type stats are a tiny broadcast joined back for one " +
        "counting pass. At 100 TB the exact percentile swaps for the " +
        "in-repo KLL sketch with identical plumbing.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val stats = e.groupBy("event_type").agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.5)").as("med"),
          expr("percentile(value, 0.75)").as("q3"),
          count(lit(1)).as("n"))
        e.join(broadcast(stats), Seq("event_type"))
          .withColumn("iqr", col("q3") - col("q1"))
          .groupBy("event_type")
          .agg(max("n").as("n"),
            round(max("med"), 4).as("med"),
            round(max("iqr"), 4).as("iqr"),
            count(when(col("value") < col("q1") - col("iqr") * 1.5
              || col("value") > col("q3") + col("iqr") * 1.5, 1)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type,
            quantile_cont(value, 0.25) AS q1,
            quantile_cont(value, 0.5) AS med,
            quantile_cont(value, 0.75) AS q3,
            count(*) AS n
          FROM events GROUP BY 1)
        SELECT e.event_type, max(n) AS n,
          round(max(med), 4) AS med,
          round(max(q3 - q1), 4) AS iqr,
          count(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
            OR e.value > q3 + 1.5 * (q3 - q1) THEN 1 END) AS n_outliers
        FROM events e JOIN s ON e.event_type = s.event_type
        GROUP BY 1 ORDER BY e.event_type""")),

    Q(
      "sample_systematic",
      "Systematic (every k-th) sampling under a total order — the " +
        "deterministic audit-sample pattern: rows are globally ranked " +
        "by Skew.globalRank (range repartition + per-partition " +
        "row_number + broadcast offsets — NO single-task window, the " +
        "scalable spelling of row_number() OVER (ORDER BY ...)), then " +
        "every 100th rank is kept. The oracle writes the same thing " +
        "as the unpartitioned-window form DuckDB can afford — " +
        "pinning that globalRank is bit-identical to the SQL-standard " +
        "global row_number.",
      (s, dir) => {
        Skew.globalRank(Tables.t(s, dir, "orders"),
            Seq(col("o_orderkey")), rankCol = "rank")
          .filter(pmod(col("rank"), lit(100L)) === 1)
          .select(col("o_orderkey"), col("rank"))
          .orderBy("rank")
      },
      Some("""SELECT o_orderkey, rank FROM (
          SELECT o_orderkey,
            CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rank
          FROM orders)
        WHERE rank % 100 = 1 ORDER BY rank""")),

    Q(
      "feat_rare_collapse",
      "Rare-category collapse — sources with fewer documents than " +
        "the support floor (2% of the corpus) fold into '__other__' " +
        "before encoding, the long-tail hygiene step that keeps " +
        "one-hot/target encoders from memorizing singletons: " +
        "category counts in one agg, the keeper set broadcast back, " +
        "final distribution re-aggregated. Integer counts, " +
        "threshold exact (count·50 ≥ total avoids the float " +
        "percentage entirely).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val cnt = d.groupBy("source").agg(count(lit(1)).as("n"))
        val tot = cnt.agg(sum("n").as("total"))
        val mapped = d
          .join(broadcast(cnt), Seq("source"))
          .crossJoin(broadcast(tot))
          .select(when(col("n") * 50 >= col("total"), col("source"))
            .otherwise("__other__").as("category"))
        mapped.groupBy("category").agg(count(lit(1)).as("n_docs"))
          .orderBy("category")
      },
      Some("""WITH cnt AS (SELECT source, count(*) AS n
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
        mapped AS (SELECT CASE WHEN n * 50 >= total THEN d.source
            ELSE '__other__' END AS category
          FROM documents d JOIN cnt ON d.source = cnt.source
          CROSS JOIN t)
        SELECT category, count(*) AS n_docs
        FROM mapped GROUP BY 1 ORDER BY category""")),

    Q(
      "sketch_bloom",
      "Bloom-filter membership sketch, fully oracle-replayed — build " +
        "a 4096-bit / 3-hash Bloom filter over nation-0 customer " +
        "keys with the engine-portable md5 hash (the countmin/" +
        "SimHash witness idiom; the 100 TB hot path is Spark's " +
        "native bloom_filter_agg / Join-side bloom pruning, already " +
        "pinned by join_bloom_prefilter — THIS query is the " +
        "correctness witness those native paths can't give). The " +
        "bit set reduces to ≤4096 distinct rows and broadcasts to " +
        "the probe side; a probe is positive iff all 3 of its bit " +
        "positions hit, and the false-positive rate is measured " +
        "exactly against ground truth in the same pass.",
      (s, dir) => {
        val m = 4096
        val cust = Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        def pos(i: Int, key: Column): Column =
          pmod(PortableHash.hexHash(
            concat(lit(s"bl$i:"), key.cast("string"))), lit(m))
        val members = cust.filter(col("c_nationkey") === 0)
        val bits = (0 until 3).map(i =>
            members.select(pos(i, col("c_custkey")).as("bit")))
          .reduce(_ union _).distinct()
        val probes = cust.select(col("c_custkey"), col("c_nationkey"),
            explode(array((0 until 3).map(i =>
              pos(i, col("c_custkey"))): _*)).as("bit"))
        val hits = probes.join(broadcast(bits), "bit")
          .groupBy("c_custkey", "c_nationkey")
          .agg(count(lit(1)).as("nhit"))
          .filter(col("nhit") === 3)
        val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
        val tot = cust.agg(count(lit(1)).as("n_tested"),
          sum(when(col("c_nationkey") === 0, 1).otherwise(0)).as("n_members"))
        hits.agg(count(lit(1)).as("n_positive"),
            sum(when(col("c_nationkey") =!= 0, 1).otherwise(0)).as("n_fp"))
          .crossJoin(broadcast(nBits)).crossJoin(broadcast(tot))
          .select(col("n_members"), col("n_bits_set"), col("n_tested"),
            col("n_positive"), col("n_fp"),
            round(col("n_fp").cast("double")
              / (col("n_tested") - col("n_members")), 4).as("fp_rate"))
          .orderBy("n_members")
      },
      Some(s"""WITH cust AS (SELECT c_custkey, c_nationkey FROM customer),
        members AS (SELECT c_custkey FROM cust WHERE c_nationkey = 0),
        bits AS (SELECT DISTINCT bit FROM (
          SELECT ${PortableHash.hexHashSql("'bl0:' || CAST(c_custkey AS VARCHAR)")} % 4096 AS bit FROM members
          UNION ALL
          SELECT ${PortableHash.hexHashSql("'bl1:' || CAST(c_custkey AS VARCHAR)")} % 4096 FROM members
          UNION ALL
          SELECT ${PortableHash.hexHashSql("'bl2:' || CAST(c_custkey AS VARCHAR)")} % 4096 FROM members)),
        probes AS (SELECT c_custkey, c_nationkey, unnest([
            ${PortableHash.hexHashSql("'bl0:' || CAST(c_custkey AS VARCHAR)")} % 4096,
            ${PortableHash.hexHashSql("'bl1:' || CAST(c_custkey AS VARCHAR)")} % 4096,
            ${PortableHash.hexHashSql("'bl2:' || CAST(c_custkey AS VARCHAR)")} % 4096]) AS bit
          FROM cust),
        hits AS (SELECT c_custkey, c_nationkey
          FROM probes JOIN bits USING (bit)
          GROUP BY 1, 2 HAVING count(*) = 3),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n_tested,
            CAST(sum(CASE WHEN c_nationkey = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_members
          FROM cust)
        SELECT n_members, n_bits_set, n_tested,
          CAST(count(*) AS BIGINT) AS n_positive,
          CAST(sum(CASE WHEN c_nationkey <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fp,
          round(CAST(sum(CASE WHEN c_nationkey <> 0 THEN 1 ELSE 0 END)
            AS DOUBLE) / (n_tested - n_members), 4) AS fp_rate
        FROM hits CROSS JOIN nb CROSS JOIN t
        GROUP BY n_members, n_bits_set, n_tested
        ORDER BY n_members""")),

    Q(
      "sketch_kmv",
      "K-minimum-values distinct sketch, fully oracle-replayed: hash " +
        "every event's user id with the engine-portable md5 hash, " +
        "keep the 64 smallest distinct hash values, and estimate the " +
        "user cardinality as (k−1)/frac(h_k) — the mergeable distinct " +
        "sketch whose state is 64 longs no matter how many billions " +
        "of rows flow through (the deterministic correctness witness " +
        "beside the native HLL of agg_approx_distinct, exactly like " +
        "sketch_bloom witnesses the native bloom path). The k-smallest " +
        "selection plans as TakeOrderedAndProject over per-partition " +
        "heaps — never a global sort — and the exact count rides the " +
        "same pass for the measured relative error.",
      (s, dir) => {
        val m = 4294967296L // 2^32: the portable hash's value space
        val hashes = Tables.t(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(PortableHash.hexHash(
            concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
          .distinct()
        val kmin = hashes.orderBy("h").limit(64)
        val exact = Tables.t(s, dir, "events")
          .agg(count_distinct(col("user_id")).as("exact_users"))
        kmin.agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
          .crossJoin(broadcast(exact))
          .select(col("k"), col("hk"), col("exact_users"),
            round((col("k") - 1).cast("double") * m / col("hk"), 2).as("est_users"),
            round(abs((col("k") - 1).cast("double") * m / col("hk") -
              col("exact_users")) / col("exact_users") * 100, 2).as("err_pct"))
          .orderBy("k")
      },
      Some(s"""WITH hashes AS (
          SELECT DISTINCT ${PortableHash.hexHashSql("'kmv:' || CAST(user_id AS VARCHAR)")} AS h
          FROM (SELECT DISTINCT user_id FROM events)),
        kmin AS (SELECT h FROM hashes ORDER BY h LIMIT 64),
        ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
          FROM events)
        SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS hk, exact_users,
          round(CAST(count(*) - 1 AS DOUBLE) * 4294967296 / max(h), 2)
            AS est_users,
          round(abs(CAST(count(*) - 1 AS DOUBLE) * 4294967296 / max(h)
            - exact_users) / exact_users * 100, 2) AS err_pct
        FROM kmin CROSS JOIN ex
        GROUP BY exact_users ORDER BY k""")),

    Q(
      "feat_vif",
      "Variance-inflation factors for the per-customer feature triple " +
        "(account balance, order count, total spend) — the " +
        "multicollinearity screen run before any linear model: " +
        "VIF_x = 1/(1−R²) where R² regresses x on the other two, " +
        "closed-form from the pairwise correlations (R²_x|yz = " +
        "(r_xy² + r_xz² − 2·r_xy·r_xz·r_yz)/(1 − r_yz²)). Every Σx, " +
        "Σx², Σxy is an exact integer moment in cents (decimal(38) " +
        "against ANSI overflow — the stats_corr_matrix idiom), so the " +
        "correlations and VIFs are bit-identical float formulas over " +
        "exact sums. One join + two hash aggregations total.",
      (s, dir) => {
        val per = Tables.t(s, dir, "customer")
          .join(Tables.t(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("a"))
          .agg(count(col("o_orderkey")).as("o"),
            coalesce(sum(round(col("o_totalprice") * 100).cast("long")), lit(0L))
              .as("sp"))
        def d38(c: Column) = c.cast("decimal(38,0)")
        val cols = Seq("a", "o", "sp")
        val sums = per.agg(count(lit(1)).as("n"),
          cols.flatMap(c => Seq(
            sum(col(c)).as(s"s_$c"),
            sum(d38(col(c)) * col(c)).as(s"ss_$c"))) ++
            (for (x <- cols; y <- cols if cols.indexOf(x) < cols.indexOf(y))
              yield sum(d38(col(x)) * col(y)).as(s"sp_${x}_$y")): _*)
        def r(x: String, y: String): Column = {
          val (a, b) = if (cols.indexOf(x) < cols.indexOf(y)) (x, y) else (y, x)
          val n = col("n").cast("double")
          val num = n * col(s"sp_${a}_$b").cast("double") -
            col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
          val da = n * col(s"ss_$a").cast("double") -
            col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
          val db = n * col(s"ss_$b").cast("double") -
            col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
          num / sqrt(da * db)
        }
        def r2(x: String, y: String, z: String): Column = {
          val (rxy, rxz, ryz) = (r(x, y), r(x, z), r(y, z))
          (rxy * rxy + rxz * rxz - lit(2.0) * rxy * rxz * ryz) /
            (lit(1.0) - ryz * ryz)
        }
        val named = Map("a" -> "acctbal", "o" -> "order_count", "sp" -> "spend")
        val rows = cols.map { x =>
          val others = cols.filterNot(_ == x)
          struct(lit(named(x)).as("feature"),
            round(r2(x, others(0), others(1)), 6).as("r2"),
            round(lit(1.0) / (lit(1.0) - r2(x, others(0), others(1))), 6)
              .as("vif"))
        }
        sums.select(explode(array(rows: _*)).as("f"))
          .select(col("f.feature").as("feature"), col("f.r2").as("r2"),
            col("f.vif").as("vif"))
          .orderBy("feature")
      },
      Some("""WITH per AS (SELECT c.c_custkey,
            CAST(round(c.c_acctbal * 100) AS BIGINT) AS a,
            CAST(count(o.o_orderkey) AS BIGINT) AS o,
            CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
              AS BIGINT) AS sp
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(a) AS BIGINT) AS s_a, sum(CAST(a AS HUGEINT) * a) AS ss_a,
            CAST(sum(o) AS BIGINT) AS s_o, sum(CAST(o AS HUGEINT) * o) AS ss_o,
            CAST(sum(sp) AS BIGINT) AS s_sp,
            sum(CAST(sp AS HUGEINT) * sp) AS ss_sp,
            sum(CAST(a AS HUGEINT) * o) AS sp_a_o,
            sum(CAST(a AS HUGEINT) * sp) AS sp_a_sp,
            sum(CAST(o AS HUGEINT) * sp) AS sp_o_sp
          FROM per),
        rr AS (SELECT
            (CAST(n AS DOUBLE) * CAST(sp_a_o AS DOUBLE)
              - CAST(s_a AS DOUBLE) * CAST(s_o AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_a AS DOUBLE)
                - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_o AS DOUBLE)
                - CAST(s_o AS DOUBLE) * CAST(s_o AS DOUBLE))) AS r_ao,
            (CAST(n AS DOUBLE) * CAST(sp_a_sp AS DOUBLE)
              - CAST(s_a AS DOUBLE) * CAST(s_sp AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_a AS DOUBLE)
                - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_sp AS DOUBLE)
                - CAST(s_sp AS DOUBLE) * CAST(s_sp AS DOUBLE))) AS r_asp,
            (CAST(n AS DOUBLE) * CAST(sp_o_sp AS DOUBLE)
              - CAST(s_o AS DOUBLE) * CAST(s_sp AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(ss_o AS DOUBLE)
                - CAST(s_o AS DOUBLE) * CAST(s_o AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(ss_sp AS DOUBLE)
                - CAST(s_sp AS DOUBLE) * CAST(s_sp AS DOUBLE))) AS r_osp
          FROM s),
        v AS (SELECT * FROM (
          SELECT 'acctbal' AS feature,
            (r_ao * r_ao + r_asp * r_asp - 2.0 * r_ao * r_asp * r_osp)
              / (1.0 - r_osp * r_osp) AS r2 FROM rr
          UNION ALL
          SELECT 'order_count',
            (r_ao * r_ao + r_osp * r_osp - 2.0 * r_ao * r_osp * r_asp)
              / (1.0 - r_asp * r_asp) FROM rr
          UNION ALL
          SELECT 'spend',
            (r_asp * r_asp + r_osp * r_osp - 2.0 * r_asp * r_osp * r_ao)
              / (1.0 - r_ao * r_ao) FROM rr))
        SELECT feature, round(r2, 6) AS r2,
          round(1.0 / (1.0 - r2), 6) AS vif
        FROM v ORDER BY feature""")),

    Q(
      "feat_yeo_johnson",
      "Yeo–Johnson power-transform profile over the (negative-valued) " +
        "customer balances: the per-λ Gaussianizing log-likelihood " +
        "−n/2·ln(σ²_z) + (λ−1)·Σ sgn(x)·ln(|x|+1) across a fixed 7-" +
        "point λ grid — how a feature pipeline picks the variance-" +
        "stabilizing transform when the feature has both signs (where " +
        "plain Box–Cox is undefined). One fan-out to |grid| tagged " +
        "rows per input and one hash aggregation; the per-λ sums are " +
        "plain float aggregations rounded at the audited " +
        "coarse-noise margin (per-row magnitudes O(10), reorder noise " +
        "~1e-12 against a 1e-4 grid — the agg_q1 audit class).",
      (s, dir) => {
        val grid = Seq(-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)
        val x = Tables.t(s, dir, "customer")
          .select((col("c_acctbal") / 1000.0).as("x"))
          .crossJoin(broadcast(
            s.createDataset(grid)(org.apache.spark.sql.Encoders.scalaDouble)
              .toDF("lam")))
        val z = when(col("x") >= 0,
            when(col("lam") === 0.0, log(col("x") + 1))
              .otherwise((pow(col("x") + 1, col("lam")) - 1) / col("lam")))
          .otherwise(
            when(col("lam") === 2.0, -log(-col("x") + 1))
              .otherwise(-(pow(-col("x") + 1, lit(2.0) - col("lam")) - 1) /
                (lit(2.0) - col("lam"))))
        val sgnlog = when(col("x") >= 0, log(col("x") + 1))
          .otherwise(-log(-col("x") + 1))
        val agg = x.select(col("lam"), z.as("z"), sgnlog.as("sl"))
          .groupBy("lam")
          .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
            sum(col("z") * col("z")).as("szz"), sum(col("sl")).as("ssl"))
        agg.select(col("lam"),
            ((col("szz") - col("sz") * col("sz") / col("n")) / col("n")).as("varz"),
            col("n"), col("ssl"))
          .select(col("lam"),
            round(lit(-0.5) * log(col("varz")) +
              (col("lam") - 1) * col("ssl") / col("n"), 4).as("ll_per_row"),
            round(col("varz"), 4).as("var_z"))
          .orderBy("lam")
      },
      Some("""WITH g AS (SELECT CAST(lam AS DOUBLE) AS lam FROM (
            SELECT unnest([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0]) AS lam)),
        x AS (SELECT c_acctbal / 1000.0 AS x, lam FROM customer CROSS JOIN g),
        t AS (SELECT lam,
            CASE WHEN x >= 0 THEN
                CASE WHEN lam = 0.0 THEN ln(x + 1)
                  ELSE (pow(x + 1, lam) - 1) / lam END
              ELSE
                CASE WHEN lam = 2.0 THEN -ln(-x + 1)
                  ELSE -(pow(-x + 1, 2.0 - lam) - 1) / (2.0 - lam) END
              END AS z,
            CASE WHEN x >= 0 THEN ln(x + 1) ELSE -ln(-x + 1) END AS sl
          FROM x),
        a AS (SELECT lam, count(*) AS n, sum(z) AS sz, sum(z * z) AS szz,
            sum(sl) AS ssl
          FROM t GROUP BY 1),
        v AS (SELECT lam, (szz - sz * sz / n) / n AS varz, n, ssl FROM a)
        SELECT lam,
          round(-0.5 * ln(varz) + (lam - 1) * ssl / n, 4) AS ll_per_row,
          round(varz, 4) AS var_z
        FROM v ORDER BY lam""")),

    Q(
      "sketch_hll_portable",
      "HyperLogLog on the engine-portable md5 hash, fully " +
        "oracle-replayed: 64 registers, bucket = low 6 hash bits, " +
        "register = leading-zero rank of the remaining 26 bits via a " +
        "generated exact-integer threshold CASE (no float log2 — both " +
        "engines run the identical comparison ladder), the standard " +
        "alpha·m²/Σ2^(−M) estimator with the linear-counting " +
        "small-range correction. The deterministic correctness " +
        "witness beside the native HLL++ of agg_approx_distinct / " +
        "agg_hll_sketch (rows-only there — randomized sketch " +
        "internals), completing the sketch-witness family " +
        "(bloom/count-min/KMV): register state is 64 small ints no " +
        "matter the corpus, mergeable by max.",
      (s, dir) => {
        val m = 64
        // exact leading-zero rank of the 26-bit remainder: rho = 1 for a
        // set top bit, …, 27 for an all-zero remainder
        val rhoCase = "CASE " + (1 to 26).map(r =>
          s"WHEN rem >= ${1L << (26 - r)} THEN $r").mkString(" ") +
          " ELSE 27 END"
        val hashes = Tables.t(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(graft.ops.PortableHash.hexHash(
            concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
          .distinct()
          .select((col("h") % m).as("bucket"),
            ((col("h") - col("h") % m) / m).cast("long").as("rem"))
          .select(col("bucket"), expr(rhoCase).as("rho"))
        val regs = s.range(0, m).select(col("id").as("bucket"))
          .join(hashes.groupBy("bucket").agg(max(col("rho")).as("mr")),
            Seq("bucket"), "left")
          .select(col("bucket"), coalesce(col("mr"), lit(0)).as("reg"))
        val est = regs.agg(
            Stats.sfold(pow(lit(2.0), -col("reg"))).as("z"),
            sum((col("reg") === 0).cast("long")).as("v"))
          .select(
            ((lit(0.7213) / (lit(1.0) + lit(1.079) / m)) * m * m / col("z")).as("raw"),
            col("v"))
          .select(col("raw"), col("v"),
            when(col("raw") <= 2.5 * m && col("v") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
              .otherwise(col("raw")).as("est"))
        val exact = Tables.t(s, dir, "events")
          .agg(count_distinct(col("user_id")).as("exact_users"))
        est.crossJoin(broadcast(exact))
          .select(lit(m).as("m"), col("v").as("n_zero_regs"),
            round(col("raw"), 2).as("raw_est"),
            round(col("est"), 2).as("est_users"), col("exact_users"),
            round(abs(col("est") - col("exact_users")) / col("exact_users")
              * 100, 2).as("err_pct"))
          .orderBy("m")
      },
      Some {
        val m = 64
        val rhoCase = "CASE " + (1 to 26).map(r =>
          s"WHEN rem >= ${1L << (26 - r)} THEN $r").mkString(" ") +
          " ELSE 27 END"
        s"""WITH hashes AS (
            SELECT DISTINCT ${PortableHash.hexHashSql("'hll:' || CAST(user_id AS VARCHAR)")} AS h
            FROM (SELECT DISTINCT user_id FROM events)),
          parts AS (SELECT h % $m AS bucket,
              CAST((h - h % $m) // $m AS BIGINT) AS rem
            FROM hashes),
          rho AS (SELECT bucket, $rhoCase AS rho FROM parts),
          regs AS (SELECT b.bucket,
              CAST(coalesce(max(r.rho), 0) AS INT) AS reg
            FROM (SELECT unnest(range(0, $m)) AS bucket) b
            LEFT JOIN rho r ON r.bucket = b.bucket
            GROUP BY b.bucket),
          est0 AS (SELECT
              list_reduce(list_sort(list(pow(2.0, -reg))), (x, y) -> x + y)
                AS z,
              CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
            FROM regs),
          est1 AS (SELECT
              (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / $m))
                * $m * $m / z AS raw, v
            FROM est0),
          est AS (SELECT raw, v,
              CASE WHEN raw <= 2.5 * $m AND v > 0
                THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / v)
                ELSE raw END AS est
            FROM est1),
          ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
              AS exact_users FROM events)
          SELECT CAST($m AS INT) AS m, v AS n_zero_regs,
            round(raw, 2) AS raw_est, round(est, 2) AS est_users,
            exact_users,
            round(abs(est - exact_users) / exact_users * 100, 2) AS err_pct
          FROM est CROSS JOIN ex ORDER BY m"""
      }),

    Q(
      "sample_negative_downsample",
      "Negative downsampling with importance-correction weights — the " +
        "class-imbalance prep every CTR/conversion trainer runs: keep " +
        "every positive (purchase) event, keep negatives at 10% by " +
        "the portable hash, and attach weight 1/rate to survivors so " +
        "downstream statistics stay unbiased. The report proves the " +
        "correction ON the data: the naive sampled base rate is ~10× " +
        "inflated, the weighted rate matches the full-data rate from " +
        "exact integer sums (weights are exact integers — no float " +
        "accumulation). One scan, one pushable hash predicate, one " +
        "aggregation.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"),
            (col("event_type") === "purchase").cast("long").as("y"))
          .withColumn("keep",
            (col("y") === 1) ||
              PortableHash.hexHash(concat(lit("nds:"),
                col("event_id").cast("string"))) % 100 < 10)
          .withColumn("w", when(col("y") === 1, lit(1L)).otherwise(lit(10L)))
        val full = ev.agg(count(lit(1)).as("n_orig"),
          sum(col("y")).as("n_pos"))
        val kept = ev.filter(col("keep"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("w") * col("y")).as("wy"), sum(col("w")).as("wsum"),
            sum(col("y")).as("kept_pos"))
        kept.crossJoin(broadcast(full))
          .select(col("n_orig"), col("n_kept"), col("n_pos"),
            round(col("n_pos").cast("double") / col("n_orig"), 6)
              .as("rate_true"),
            round(col("kept_pos").cast("double") / col("n_kept"), 6)
              .as("rate_naive"),
            round(col("wy").cast("double") / col("wsum"), 6)
              .as("rate_corrected"))
          .orderBy("n_orig")
      },
      Some(s"""WITH ev AS (SELECT event_id,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
            CASE WHEN event_type = 'purchase' THEN 1
              WHEN ${PortableHash.hexHashSql(
                "'nds:' || CAST(event_id AS VARCHAR)")} % 100 < 10 THEN 1
              ELSE 0 END AS keep,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 10 END AS w
          FROM events),
        full_ AS (SELECT count(*) AS n_orig, CAST(sum(y) AS BIGINT) AS n_pos
          FROM ev),
        kept AS (SELECT count(*) AS n_kept,
            CAST(sum(w * y) AS BIGINT) AS wy,
            CAST(sum(w) AS BIGINT) AS wsum,
            CAST(sum(y) AS BIGINT) AS kept_pos
          FROM ev WHERE keep = 1)
        SELECT n_orig, n_kept, n_pos,
          round(CAST(n_pos AS DOUBLE) / n_orig, 6) AS rate_true,
          round(CAST(kept_pos AS DOUBLE) / n_kept, 6) AS rate_naive,
          round(CAST(wy AS DOUBLE) / wsum, 6) AS rate_corrected
        FROM kept CROSS JOIN full_ ORDER BY n_orig"""))
  )
}
