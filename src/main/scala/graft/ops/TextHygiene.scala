package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Corpus-hygiene operators for the training-data pipeline (the
  * pre-training cleanup pass): benchmark decontamination, PII
  * redaction, within-document repetition metrics (Gopher-style), and a
  * rule-based quality gate with machine-readable reasons.
  *
  * All are explode/groupBy/regexp compositions — token streams shuffle
  * on the shingle key (the same scale shape as the near-dup family);
  * regex work is per-row codegen'd `regexp_replace`/`regexp_extract_all`
  * with no UDFs. */
object TextHygiene {

  private def wordGrams(w: org.apache.spark.sql.Column, k: Int) =
    TextFns.wordGrams(w, k)

  def defs: Seq[Q] = Seq(

    Q(
      "text_decontaminate",
      "Benchmark decontamination: corpus docs sharing word-3-grams with " +
        "a held-out benchmark set (doc_id%10==0 stands in for the eval " +
        "suite). Distinct shingles explode → equi-join on the shingle → " +
        "per-doc distinct-overlap count; contaminated = ≥5 shared " +
        "3-grams; the anti-join of this result is the clean corpus. At " +
        "100 TB the join shuffles on the shingle key (never all-pairs); " +
        "a hot shingle salts exactly like the near-dup path.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        val tri = d
          .select(col("doc_id"), explode(wordGrams(col("w"), 3)).as("sh"))
          .distinct()
        val bench = tri.filter(col("doc_id") % 10 === 0).select("sh").distinct()
        val corp = tri.filter(col("doc_id") % 10 =!= 0)
        corp.join(bench, "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .select(col("doc_id"), col("n_shared"),
            (col("n_shared") >= 5).as("contaminated"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        g AS (SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
          FROM d),
        bench AS (SELECT DISTINCT sh FROM g WHERE doc_id % 10 = 0),
        corp AS (SELECT doc_id, sh FROM g WHERE doc_id % 10 != 0)
        SELECT c.doc_id, count(*) AS n_shared, count(*) >= 5 AS contaminated
        FROM corp c JOIN bench b ON c.sh = b.sh
        GROUP BY c.doc_id ORDER BY c.doc_id""")),

    Q(
      "text_pii_redact",
      "PII redaction: deterministic synthetic emails/phones are " +
        "appended per doc (the fixture corpus carries none), then " +
        "redacted by global regexp_replace with per-doc match counts " +
        "from regexp_extract_all. Pure per-row codegen'd regex — " +
        "embarrassingly parallel at any scale.",
      (s, dir) => {
        val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
        val phoneRe = "\\+1-555-[0-9]{3}-[0-9]{4}"
        val d = Tables.t(s, dir, "documents")
        val t = concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com or call +1-555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        val red = regexp_replace(
          regexp_replace(t, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
        d.select(
            col("doc_id"),
            size(regexp_extract_all(t, lit(emailRe), lit(0))).as("n_emails"),
            size(regexp_extract_all(t, lit(phoneRe), lit(0))).as("n_phones"),
            length(red).as("red_len"),
            md5(red).as("red_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call +1-555-' ||
            lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
          FROM documents),
        r AS (SELECT doc_id, t,
          regexp_replace(regexp_replace(t,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\+1-555-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
          FROM p)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', 0)) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{3}-[0-9]{4}', 0)) AS INT) AS n_phones,
          CAST(length(red) AS INT) AS red_len,
          md5(red) AS red_md5
        FROM r ORDER BY doc_id""")),

    Q(
      "text_repetition",
      "Within-document repetition metrics (Gopher-style): duplicate-" +
        "word fraction and most-frequent-bigram fraction. Per-doc " +
        "bigram counts aggregate inside the doc_id partition — the " +
        "shuffle key is (doc_id, bigram), so skew is bounded by " +
        "single-document size, not corpus size.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        val stats = d.select(
          col("doc_id"), size(col("w")).as("n_words"),
          size(array_distinct(col("w"))).as("n_uniq"))
        val rep = d
          .select(col("doc_id"), explode(wordGrams(col("w"), 2)).as("bg"))
          .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max("c").as("top_bigram_n"), sum("c").as("n_bigrams"))
        stats.join(rep, "doc_id")
          .select(
            col("doc_id"), col("n_words"), col("n_uniq"),
            round(lit(1) - col("n_uniq") / col("n_words"), 6).as("dup_word_frac"),
            col("top_bigram_n"), col("n_bigrams"),
            round(col("top_bigram_n") / col("n_bigrams"), 6).as("top_bigram_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        s AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_uniq FROM d),
        bg AS (SELECT doc_id,
            unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
          FROM d),
        bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        rep AS (SELECT doc_id, max(c) AS top_bigram_n, CAST(sum(c) AS BIGINT) AS n_bigrams
          FROM bc GROUP BY 1)
        SELECT s.doc_id, CAST(s.n_words AS INT) AS n_words, CAST(s.n_uniq AS INT) AS n_uniq,
          round(1 - s.n_uniq / s.n_words, 6) AS dup_word_frac,
          rep.top_bigram_n, rep.n_bigrams,
          round(rep.top_bigram_n / rep.n_bigrams, 6) AS top_bigram_frac
        FROM s JOIN rep ON s.doc_id = rep.doc_id ORDER BY s.doc_id""")),

    Q(
      "text_quality_gate",
      "Rule-based quality gate (C4/Gopher-style) with machine-readable " +
        "failure reasons: word-count band, mean-chars-per-word band, " +
        "duplicate-word-fraction cap. All exact integer-derived doubles " +
        "so both engines branch identically; reasons concat_ws-joined " +
        "(nulls drop out in both engines).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("w"))
        val n = size(col("w"))
        val dupFrac = lit(1) - size(array_distinct(col("w"))) / n
        val meanLen = col("n_chars") / n
        val reasons = concat_ws("|",
          when(n < 20, "too_short"), when(n > 80, "too_long"),
          when(meanLen < 3.0 || meanLen > 8.0, "word_len"),
          when(dupFrac > 0.3, "repetitive"))
        d.select(
            col("doc_id"),
            col("n_chars"),
            n.as("n_words"),
            round(meanLen, 6).as("mean_word_len"),
            round(dupFrac, 6).as("dup_word_frac"),
            (reasons === "").as("passed"),
            reasons.as("reasons"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents),
        m AS (SELECT doc_id, n_chars, len(w) AS n,
            1 - len(list_distinct(w)) / len(w) AS dup_frac,
            n_chars / len(w) AS mean_len
          FROM d),
        r AS (SELECT *, concat_ws('|',
            CASE WHEN n < 20 THEN 'too_short' END,
            CASE WHEN n > 80 THEN 'too_long' END,
            CASE WHEN mean_len < 3.0 OR mean_len > 8.0 THEN 'word_len' END,
            CASE WHEN dup_frac > 0.3 THEN 'repetitive' END) AS reasons
          FROM m)
        SELECT doc_id, n_chars, CAST(n AS INT) AS n_words,
          round(mean_len, 6) AS mean_word_len,
          round(dup_frac, 6) AS dup_word_frac,
          reasons = '' AS passed, reasons
        FROM r ORDER BY doc_id""")),

    Q(
      "text_substring_dupes",
      "Exact substring duplication detection — the primitive behind " +
        "exact-substring train-set dedup (find every 8-token window " +
        "that occurs more than once anywhere in the corpus, with its " +
        "document spread): one generator pass explodes sliding windows, " +
        "one count-aggregated shuffle keyed by the window. Map-side " +
        "combine absorbs the boilerplate-window hot keys (counting " +
        "commutes), so the plan is explode → partial-agg → one exchange " +
        "at any corpus size. Downstream, a cutter joins these windows " +
        "back to drop or split the repeated spans.",
      (s, dir) => {
        val win = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), explode(TextFns.wordGrams(col("w"), 8)).as("win"))
        win.groupBy("win")
          .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
          .filter(col("n_occ") > 1)
          .orderBy(col("n_occ").desc, col("win"))
      },
      Some("""WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        wins AS (
          SELECT doc_id, unnest(list_transform(range(1, len(words) - 6),
            i -> array_to_string(words[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))) AS win
          FROM w)
        SELECT win, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        FROM wins GROUP BY win HAVING count(*) > 1
        ORDER BY n_occ DESC, win""")),

    Q(
      "text_boilerplate",
      "Per-document boilerplate fraction — the line-dedup filtering " +
        "signal of web-corpus pipelines (CCNet/RefinedWeb drop or " +
        "strip content repeated across many pages), spelled over " +
        "3-token windows since the fixture has no line structure: a " +
        "window is boilerplate when it appears in ≥ 5 distinct docs; " +
        "each doc reports its window positions, how many sit inside a " +
        "boilerplate window, and the fraction. Dataflow: one window " +
        "explode feeds BOTH the df table ((window, doc) distinct → " +
        "window count) and per-(doc, window) position counts; the " +
        "flag join is window-keyed — boilerplate keys are hot by " +
        "definition, but each carries exactly ONE df row, so the join " +
        "fans nothing out and AQE's skew split covers the partition " +
        "imbalance. All-integer until the final division.",
      (s, dir) => {
        val win = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), explode(TextFns.wordGrams(col("w"), 3)).as("win"))
        val cnt = win.groupBy("doc_id", "win").agg(count(lit(1)).as("c"))
        val boiler = cnt.groupBy("win")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") >= 5)
          .select(col("win"), lit(1).as("bp"))
        cnt.join(boiler, Seq("win"), "left")
          .groupBy("doc_id")
          .agg(sum("c").as("n_windows"),
            sum(when(col("bp").isNotNull, col("c")).otherwise(lit(0L))).as("n_boiler"))
          .select(col("doc_id"), col("n_windows"), col("n_boiler"),
            round(col("n_boiler").cast("double") / col("n_windows"), 6).as("boiler_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        wins AS (
          SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
            i -> array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' '))) AS win
          FROM w),
        cnt AS (SELECT doc_id, win, count(*) AS c FROM wins GROUP BY 1, 2),
        boiler AS (SELECT win FROM cnt GROUP BY win HAVING count(*) >= 5),
        agg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_windows,
            CAST(sum(CASE WHEN win IN (SELECT win FROM boiler) THEN c ELSE 0 END) AS BIGINT)
              AS n_boiler
          FROM cnt GROUP BY doc_id)
        SELECT doc_id, n_windows, n_boiler,
          round(CAST(n_boiler AS DOUBLE) / n_windows, 6) AS boiler_frac
        FROM agg ORDER BY doc_id""")),

    Q(
      "text_quality_logistic",
      "Model-based quality scoring (the fastText-classifier shape used " +
        "by GPT-3/LLaMA-style curation): a fixed-weight linear scorer " +
        "over per-document features — unique-word ratio, stopword " +
        "fraction, digit fraction, mean word length — squashed through " +
        "a sigmoid; keep = score above 0.5. The weights here are " +
        "fixture constants standing in for trained parameters; the " +
        "operator IS the scorer dataflow (one scan, no shuffle, no " +
        "UDFs — every feature a codegen'd expression). Every feature " +
        "is a quotient of exact integers and z is a FIXED left-to-" +
        "right sum of their products with double literals, so z is " +
        "bit-identical across engines; the final sigmoid is one libm " +
        "exp() quantized to 4dp (the coarse grid makes a last-ulp " +
        "exp() difference unobservable), and keep branches on the " +
        "exact z sign, not the rounded score.",
      (s, dir) => {
        val stops = Seq("the", "of", "and", "to", "in", "a", "is", "that")
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), col("text"),
            split(col("text"), " ").as("w"))
        val n = size(col("w"))
        val uniq = size(array_distinct(col("w"))).cast("double") / n
        val stopFrac = size(filter(col("w"),
          t => t.isInCollection(stops))).cast("double") / n
        val digitFrac = length(regexp_replace(col("text"), "[^0-9]", ""))
          .cast("double") / col("n_chars")
        val meanLen = col("n_chars").cast("double") / n
        val z = lit(-3.0) + lit(1.5) * uniq + lit(8.0) * stopFrac -
          lit(10.0) * digitFrac + lit(0.4) * meanLen
        d.select(
            col("doc_id"),
            round(uniq, 6).as("uniq_ratio"),
            round(stopFrac, 6).as("stop_frac"),
            round(digitFrac, 6).as("digit_frac"),
            round(meanLen, 6).as("mean_word_len"),
            round(z, 6).as("z"),
            round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score"),
            (z > 0).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars, text,
          string_split(text, ' ') AS w FROM documents),
        f AS (SELECT doc_id,
            CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq,
            CAST(len(list_filter(w, t -> t IN
              ('the', 'of', 'and', 'to', 'in', 'a', 'is', 'that'))) AS DOUBLE)
              / len(w) AS stop_frac,
            CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
              / n_chars AS digit_frac,
            CAST(n_chars AS DOUBLE) / len(w) AS mean_len
          FROM d),
        sc AS (SELECT doc_id, uniq, stop_frac, digit_frac, mean_len,
            -3.0 + 1.5 * uniq + 8.0 * stop_frac - 10.0 * digit_frac
              + 0.4 * mean_len AS z
          FROM f)
        SELECT doc_id,
          round(uniq, 6) AS uniq_ratio,
          round(stop_frac, 6) AS stop_frac,
          round(digit_frac, 6) AS digit_frac,
          round(mean_len, 6) AS mean_word_len,
          round(z, 6) AS z,
          round(1.0 / (1.0 + exp(-z)), 4) AS score,
          z > 0 AS keep
        FROM sc ORDER BY doc_id""")),

    Q(
      "text_gopher_rules",
      "Gopher-style quality rule battery (Rae et al. 2021's published " +
        "heuristics, restated for this fixture's tokenization) — per-" +
        "document pass/fail on four rules, rolled up to per-source " +
        "pass rates: word count in [50, 100000]; mean word length in " +
        "[3, 10]; ≥ 2 distinct stopwords present; no single token " +
        "above 20% of the document (the dominance/repetition gate). " +
        "Every threshold is evaluated in cross-multiplied integers " +
        "(3·n ≤ Σlen ≤ 10·n, 5·max ≤ n), so no float can straddle a " +
        "rule edge. One tokenize pass feeds all rules; the rollup is " +
        "one hash aggregation per source.",
      (s, dir) => {
        val stop = Seq("the", "a", "an", "and", "of", "to", "in", "is")
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("w"))
        val perTok = tok.groupBy("doc_id", "source", "w")
          .agg(count(lit(1)).as("k"))
        val d = perTok.groupBy("doc_id", "source")
          .agg(sum("k").as("n"),
            sum(length(col("w")) * col("k")).as("sl"),
            max("k").as("maxk"),
            sum(when(col("w").isin(stop: _*), 1).otherwise(0)).as("nstop"))
        val flags = d
          .withColumn("r_count", col("n") >= 50 && col("n") <= 100000)
          .withColumn("r_meanlen",
            col("sl") >= col("n") * 3 && col("sl") <= col("n") * 10)
          .withColumn("r_stop", col("nstop") >= 2)
          .withColumn("r_dom", col("maxk") * 5 <= col("n"))
        flags.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("r_count").cast("int")).as("p_count"),
            sum(col("r_meanlen").cast("int")).as("p_meanlen"),
            sum(col("r_stop").cast("int")).as("p_stop"),
            sum(col("r_dom").cast("int")).as("p_dom"),
            sum((col("r_count") && col("r_meanlen") && col("r_stop")
              && col("r_dom")).cast("int")).as("n_pass_all"))
          .orderBy("source")
      },
      Some("""WITH tok AS (SELECT doc_id, source,
            unnest(string_split(text, ' ')) AS w
          FROM documents),
        pertok AS (SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS k
          FROM tok GROUP BY 1, 2, 3),
        d AS (SELECT doc_id, source, CAST(sum(k) AS BIGINT) AS n,
            CAST(sum(length(w) * k) AS BIGINT) AS sl,
            CAST(max(k) AS BIGINT) AS maxk,
            CAST(sum(CASE WHEN w IN ('the','a','an','and','of','to',
              'in','is') THEN 1 ELSE 0 END) AS BIGINT) AS nstop
          FROM pertok GROUP BY 1, 2),
        fl AS (SELECT source,
            n >= 50 AND n <= 100000 AS r_count,
            sl >= n * 3 AND sl <= n * 10 AS r_meanlen,
            nstop >= 2 AS r_stop,
            maxk * 5 <= n AS r_dom
          FROM d)
        SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN r_count THEN 1 ELSE 0 END) AS BIGINT)
            AS p_count,
          CAST(sum(CASE WHEN r_meanlen THEN 1 ELSE 0 END) AS BIGINT)
            AS p_meanlen,
          CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS p_stop,
          CAST(sum(CASE WHEN r_dom THEN 1 ELSE 0 END) AS BIGINT) AS p_dom,
          CAST(sum(CASE WHEN r_count AND r_meanlen AND r_stop AND r_dom
            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
        FROM fl GROUP BY source ORDER BY source"""))
  )
}
