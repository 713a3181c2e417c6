package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis operators (LLM-pipeline mandate): token statistics,
  * n-grams, TF-IDF, language-ID features, quality scoring, and document
  * fingerprinting. All explode/groupBy/HOF compositions — the token
  * streams shuffle on the token key, which is exactly the shape that
  * scales (no per-doc driver loops, no collect). */
object Text {

  /** DSIR model-vocabulary cap: the frequency table text_dsir_weights
    * broadcasts is at most this many rows regardless of corpus size
    * (25 keeps the OOV/tail path exercised on the tiny fixture vocab;
    * a production run freezes 10⁵–10⁶). */
  private[ops] val DsirVocabK = 25

  def defs: Seq[Q] = Seq(

    Q(
      "text_readability",
      "Readability profile per language: Flesch reading ease and " +
        "Gunning-fog-style complex-word rate from corpus totals. " +
        "Syllables are vowel-group counts ([aeiouy]+ runs — the " +
        "standard deterministic heuristic), complex words have ≥3 " +
        "groups, and sentences fall back to ceil(words/15) per doc " +
        "when the text carries no sentence punctuation (this corpus " +
        "does not — the [.!?]+ count is taken when present). All " +
        "per-doc counts are exact integers summed per language, so " +
        "the formula evaluates once per group from integer totals — " +
        "no float folds, deterministic at any parallelism; the whole " +
        "pass is one scan with per-row regexes inside codegen.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("w"),
            size(expr("regexp_extract_all(text, '[aeiouy]+', 0)"))
              .cast("long").as("y"),
            size(filter(split(col("text"), " "),
              t => size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))) >= 3))
              .cast("long").as("cw"),
            size(expr("regexp_extract_all(text, '[.!?]+', 0)"))
              .cast("long").as("pg"))
          .withColumn("sen",
            when(col("pg") > 0, col("pg"))
              .otherwise(ceil(col("w").cast("double") / 15.0).cast("long")))
        d.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("w").as("words"), sum("sen").as("sentences"),
            sum("y").as("syllables"), sum("cw").as("complex_words"))
          .select(col("lang"), col("n_docs"), col("words"),
            col("sentences"), col("syllables"), col("complex_words"),
            round(lit(206.835)
              - lit(1.015) * col("words").cast("double") / col("sentences").cast("double")
              - lit(84.6) * col("syllables").cast("double") / col("words").cast("double"),
              4).as("flesch"),
            round(lit(0.4) * (col("words").cast("double") / col("sentences").cast("double")
              + lit(100.0) * col("complex_words").cast("double") / col("words").cast("double")),
              4).as("fog"))
          .orderBy("lang")
      },
      Some("""WITH d AS (
          SELECT lang,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
            CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS y,
            CAST(len(list_filter(string_split(text, ' '),
              t -> len(regexp_extract_all(t, '[aeiouy]+')) >= 3)) AS BIGINT) AS cw,
            CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS pg
          FROM documents),
        s AS (SELECT *, CASE WHEN pg > 0 THEN pg
            ELSE CAST(ceil(CAST(w AS DOUBLE) / 15.0) AS BIGINT) END AS sen FROM d)
        SELECT lang, count(*) AS n_docs,
          CAST(sum(w) AS BIGINT) AS words,
          CAST(sum(sen) AS BIGINT) AS sentences,
          CAST(sum(y) AS BIGINT) AS syllables,
          CAST(sum(cw) AS BIGINT) AS complex_words,
          round(206.835
            - 1.015 * CAST(sum(w) AS DOUBLE) / CAST(sum(sen) AS DOUBLE)
            - 84.6 * CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 4) AS flesch,
          round(0.4 * (CAST(sum(w) AS DOUBLE) / CAST(sum(sen) AS DOUBLE)
            + 100.0 * CAST(sum(cw) AS DOUBLE) / CAST(sum(w) AS DOUBLE)), 4) AS fog
        FROM s GROUP BY lang ORDER BY lang""")),

    Q(
      "text_rake_keywords",
      "RAKE keyword extraction (Rose et al.): candidate phrases are " +
        "maximal stopword-free token runs, each word scored " +
        "degree/frequency over the phrase co-occurrence graph, each " +
        "phrase scored by the sum of its word scores — corpus top 15. " +
        "The stopword set is the frozen top-5 corpus tokens (count " +
        "desc, token tie-break — the bounded-broadcast trick from " +
        "text_oov_rate, O(K) at any corpus size). Phrase segmentation " +
        "is relational, not regex: a running stopword count inside a " +
        "doc-partitioned window is the phrase id, so the whole " +
        "pipeline is explode → window → three hash aggs, and the " +
        "per-phrase score folds (token-sorted) over exact " +
        "integer-ratio word scores — deterministic end to end.",
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        val stop = toks.groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token")).limit(5)
          .select(col("token").as("stoken"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // NOTE (r18): flagged feeds three joins and the plan audit
        // shows the window subtree replicated into six scans, but the
        // measured checkpoint variant (cut flagged + phrases) ran
        // SLOWER at sf0.1 (2.12 s vs 1.97 s A/B) — the eager
        // materializations cost more than the recomputes here; left
        // uncut deliberately (guide §1.1: measure, don't assume)
        val flagged = toks
          .join(broadcast(stop), toks("token") === stop("stoken"), "left")
          .withColumn("pid",
            sum(when(col("stoken").isNotNull, 1).otherwise(0)).over(w))
          .filter(col("stoken").isNull)
          .select("doc_id", "pid", "pos", "token")
        val phrases = flagged.groupBy("doc_id", "pid")
          .agg(array_join(transform(
              sort_array(collect_list(struct(col("pos"), col("token")))),
              e => e.getField("token")), " ").as("phrase"),
            count(lit(1)).as("plen"))
        val wordStats = flagged.join(phrases, Seq("doc_id", "pid"))
          .groupBy("token")
          .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        flagged.join(phrases, Seq("doc_id", "pid"))
          .join(wordStats, Seq("token"))
          .groupBy("doc_id", "pid", "phrase")
          .agg(aggregate(
            sort_array(collect_list(struct(col("token"),
              (col("deg").cast("double") / col("freq").cast("double")).as("sw")))),
            lit(0.0), (a, x) => a + x.getField("sw")).as("sc"))
          .groupBy("phrase")
          .agg(count(lit(1)).as("n_occur"), round(min("sc"), 6).as("score"))
          .orderBy(col("score").desc, col("phrase"))
          .limit(15)
      },
      Some("""WITH toks AS (
          SELECT doc_id, u.pos, u.token FROM (
            SELECT doc_id, unnest(list_transform(string_split(text, ' '),
              (t, i) -> struct_pack(pos := i, token := t))) AS u
            FROM documents)),
        stop AS (SELECT token AS stoken FROM toks
          GROUP BY 1 ORDER BY count(*) DESC, token LIMIT 5),
        flagged AS (
          SELECT doc_id, pos, token,
            CAST(sum(CASE WHEN token IN (SELECT stoken FROM stop)
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pid,
            token IN (SELECT stoken FROM stop) AS is_stop
          FROM toks),
        members AS (SELECT doc_id, pid, pos, token FROM flagged WHERE NOT is_stop),
        phrases AS (
          SELECT doc_id, pid,
            string_agg(token, ' ' ORDER BY pos) AS phrase,
            CAST(count(*) AS BIGINT) AS plen
          FROM members GROUP BY 1, 2),
        word_stats AS (
          SELECT token, CAST(count(*) AS BIGINT) AS freq,
            CAST(sum(plen) AS BIGINT) AS deg
          FROM members JOIN phrases USING (doc_id, pid) GROUP BY token),
        scored AS (
          SELECT m.doc_id, m.pid, p.phrase,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list(CAST(ws.deg AS DOUBLE) / CAST(ws.freq AS DOUBLE)
                ORDER BY m.token)),
              (a, b) -> a + b) AS sc
          FROM members m
          JOIN phrases p USING (doc_id, pid)
          JOIN word_stats ws ON ws.token = m.token
          GROUP BY 1, 2, 3)
        SELECT phrase, count(*) AS n_occur, round(min(sc), 6) AS score
        FROM scored GROUP BY phrase
        ORDER BY score DESC, phrase LIMIT 15""")),

    Q(
      "text_msttr",
      "Mean segmental type-token ratio per language (MSTTR-25): " +
        "tokens are cut into non-overlapping 25-token segments, TTR " +
        "= distinct/25 per full segment, and the language score is " +
        "the segment-weighted mean — the length-robust lexical-" +
        "diversity measure (raw TTR shrinks with doc length, which " +
        "is why it can't compare corpora). Everything is integer " +
        "counts (segment distinct sums over 25-token groups) until " +
        "ONE final division — deterministic at any parallelism, one " +
        "explode + two hash aggs.",
      (s, dir) => {
        val segs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
          .withColumn("seg", Skew.idiv(col("pos").cast("long"), lit(25L)))
          .groupBy("doc_id", "lang", "seg")
          .agg(count(lit(1)).as("n_tok"), countDistinct("token").as("n_types"))
          .filter(col("n_tok") === 25)
        segs.groupBy("lang")
          .agg(count(lit(1)).as("n_segments"),
            countDistinct("doc_id").as("n_docs"),
            sum("n_types").as("tt"))
          .select(col("lang"), col("n_docs"), col("n_segments"),
            round(col("tt").cast("double")
              / (lit(25.0) * col("n_segments").cast("double")), 6).as("msttr"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (
          SELECT doc_id, lang, u.pos, u.token FROM (
            SELECT doc_id, lang,
              unnest(list_transform(string_split(text, ' '),
                (t, i) -> struct_pack(pos := i, token := t))) AS u
            FROM documents)),
        segs AS (
          SELECT doc_id, lang, (pos - 1) // 25 AS seg,
            count(*) AS n_tok,
            CAST(count(DISTINCT token) AS BIGINT) AS n_types
          FROM toks GROUP BY 1, 2, 3),
        full_segs AS (SELECT * FROM segs WHERE n_tok = 25)
        SELECT lang,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          count(*) AS n_segments,
          round(CAST(sum(n_types) AS DOUBLE)
            / (25.0 * CAST(count(*) AS DOUBLE)), 6) AS msttr
        FROM full_segs GROUP BY lang ORDER BY lang""")),

    Q(
      "text_heldout_perplexity",
      "Held-out perplexity: an add-1-smoothed unigram LM is TRAINED " +
        "on sources src0–src4 and EVALUATED on the remaining sources " +
        "per language — the train/eval split text_unigram_logprob's " +
        "in-corpus scoring doesn't have, and the number that actually " +
        "ranks data sources for LM training (in-corpus perplexity " +
        "rewards memorization). Unseen eval tokens get the smoothing " +
        "floor 1/(N+V); the per-language bit sum folds over the " +
        "(lang, token) count table sorted by token — integer counts " +
        "everywhere except the per-type bit weights, deterministic " +
        "at any parallelism. Train vocab is a bounded broadcast.",
      (s, dir) => {
        val hist = Seq("src0", "src1", "src2", "src3", "src4")
        val toks = Tables.t(s, dir, "documents")
          .select(col("lang"), col("source"),
            explode(split(col("text"), " ")).as("w"))
        val train = toks.filter(col("source").isInCollection(hist))
        val vocab = train.groupBy("w").agg(count(lit(1)).as("nw"))
        val stats = vocab.agg(sum("nw").as("nn"), count(lit(1)).as("v"))
        val evalCounts = toks.filter(!col("source").isInCollection(hist))
          .groupBy("lang", "w").agg(count(lit(1)).as("c"))
          .join(broadcast(vocab), Seq("w"), "left")
          .crossJoin(broadcast(stats))
          .select(col("lang"), col("w"), col("c"), col("nw"),
            (col("c").cast("double") * -log2(
              (coalesce(col("nw"), lit(0L)) + 1).cast("double")
                / (col("nn") + col("v") + 1).cast("double"))).as("x"),
            when(col("nw").isNull, col("c")).otherwise(0L).as("oov"))
        evalCounts.groupBy("lang")
          .agg(sum("c").as("n_tokens"), sum("oov").as("n_oov"),
            aggregate(sort_array(collect_list(struct(col("w"), col("x")))),
              lit(0.0), (a, e) => a + e.getField("x")).as("bits"))
          .select(col("lang"), col("n_tokens"),
            round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
              .as("oov_rate"),
            round(pow(lit(2.0), col("bits") / col("n_tokens").cast("double")), 4)
              .as("perplexity"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (
          SELECT lang, source, unnest(string_split(text, ' ')) AS w
          FROM documents),
        vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM toks
          WHERE source IN ('src0','src1','src2','src3','src4') GROUP BY w),
        stats AS (SELECT CAST(sum(nw) AS BIGINT) AS nn,
            CAST(count(*) AS BIGINT) AS v FROM vocab),
        ec AS (
          SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM toks
          WHERE source NOT IN ('src0','src1','src2','src3','src4')
          GROUP BY 1, 2),
        terms AS (
          SELECT ec.lang, ec.w, ec.c,
            CAST(ec.c AS DOUBLE) * -log2(
              CAST(coalesce(v2.nw, 0) + 1 AS DOUBLE)
                / CAST(s.nn + s.v + 1 AS DOUBLE)) AS x,
            CASE WHEN v2.nw IS NULL THEN ec.c ELSE 0 END AS oov
          FROM ec LEFT JOIN vocab v2 ON ec.w = v2.w, stats s),
        agg AS (
          SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(sum(oov) AS BIGINT) AS n_oov,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list(x ORDER BY w)), (a, b) -> a + b) AS bits
          FROM terms GROUP BY lang)
        SELECT lang, n_tokens,
          round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS oov_rate,
          round(pow(CAST(2 AS DOUBLE), bits / CAST(n_tokens AS DOUBLE)), 4)
            AS perplexity
        FROM agg ORDER BY lang""")),

    Q(
      "pipeline_mlm_masking",
      "Masked-LM training-data preparation (BERT 80/10/10): 15% of " +
        "token positions are selected by the engine-portable md5 " +
        "hash of (doc_id:pos) — of those, 80% become [MASK], 10% a " +
        "hash-selected replacement from the frozen top-32 vocabulary " +
        "(bounded broadcast), 10% stay — with the (pos, original) " +
        "label stream emitted alongside. Zero RNG: every masking " +
        "decision replays hash-for-hash in DuckDB, which is exactly " +
        "what a reproducible data pipeline wants (re-runs produce " +
        "byte-identical corpora). One tokenize pass, doc-bounded " +
        "reassembly folds.",
      (s, dir) => {
        import PortableHash.hexHash
        val toks = Tables.t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        // ordinal assignment via the bounded sorted-fold idiom, not an
        // unpartitioned window (the 32-row frame still plans WindowExec)
        val vocab = toks.groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token")).limit(32)
          .agg(sort_array(collect_list(struct((-col("c")).as("nc"), col("token"))))
            .as("arr"))
          .select(posexplode(col("arr")).as(Seq("vidx", "s")))
          .select(col("vidx").cast("long").as("vidx"), col("s.token").as("vtoken"))
        val hashed = toks
          .withColumn("h", hexHash(concat(col("doc_id"), lit(":"), col("pos"))))
          .withColumn("masked", pmod(col("h"), lit(100L)) < 15)
          .withColumn("mode", pmod(Skew.idiv(col("h"), lit(100L)), lit(10L)))
          .withColumn("vidx",
            when(col("masked") && col("mode") === 8,
              pmod(Skew.idiv(col("h"), lit(1000L)), lit(32L))))
        val out = hashed.join(broadcast(vocab), Seq("vidx"), "left")
          .withColumn("otok",
            when(!col("masked"), col("token"))
              .when(col("mode") <= 7, lit("[MASK]"))
              .when(col("mode") === 8, col("vtoken"))
              .otherwise(col("token")))
        out.groupBy("doc_id").agg(
            count(lit(1)).as("n_tokens"),
            sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
            array_join(transform(
              sort_array(collect_list(struct(col("pos"), col("otok")))),
              e => e.getField("otok")), " ").as("masked_text"),
            array_join(transform(
              sort_array(collect_list(when(col("masked"),
                struct(col("pos"), col("token"))))),
              e => concat(e.getField("pos").cast("string"), lit(":"),
                e.getField("token"))), " ").as("labels"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, u.pos - 1 AS pos, u.token FROM (
            SELECT doc_id, unnest(list_transform(string_split(text, ' '),
              (t, i) -> struct_pack(pos := i, token := t))) AS u
            FROM documents WHERE doc_id < 200)),
        vocab AS (
          SELECT token AS vtoken,
            CAST(row_number() OVER (ORDER BY count(*) DESC, token) - 1
              AS BIGINT) AS vidx
          FROM toks GROUP BY token ORDER BY count(*) DESC, token LIMIT 32),
        hashed AS (
          SELECT doc_id, pos, token,
            ${PortableHash.hexHashSql("CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")} AS h
          FROM toks),
        flags AS (
          SELECT *, (h % 100 < 15) AS masked, ((h // 100) % 10) AS mode,
            CASE WHEN (h % 100 < 15) AND ((h // 100) % 10) = 8
              THEN ((h // 1000) % 32) END AS vidx
          FROM hashed),
        out AS (
          SELECT f.doc_id, f.pos, f.token, f.masked,
            CASE WHEN NOT f.masked THEN f.token
              WHEN f.mode <= 7 THEN '[MASK]'
              WHEN f.mode = 8 THEN v.vtoken
              ELSE f.token END AS otok
          FROM flags f LEFT JOIN vocab v ON f.vidx = v.vidx)
        SELECT doc_id, count(*) AS n_tokens,
          CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
          string_agg(otok, ' ' ORDER BY pos) AS masked_text,
          coalesce(string_agg(CASE WHEN masked
            THEN CAST(pos AS VARCHAR) || ':' || token END, ' ' ORDER BY pos),
            '') AS labels
        FROM out GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "pipeline_span_corruption",
      "T5-style span corruption: hash-marked token positions " +
        "coalesce into maximal contiguous spans (gap-island " +
        "detection in a doc-partitioned window), each span is " +
        "replaced by a numbered sentinel <extra_id_k> in the input " +
        "while the target emits sentinel + original span — the " +
        "seq2seq denoising objective's data prep, deterministic " +
        "end-to-end on the portable md5 hash (like " +
        "pipeline_mlm_masking, re-runs and the oracle replay " +
        "byte-identically). Sentinel numbering is a doc-bounded " +
        "window rank; input/target reassembly is the usual " +
        "doc-bounded sorted fold.",
      (s, dir) => {
        import PortableHash.hexHash
        val toks = Tables.t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
          .withColumn("marked",
            pmod(hexHash(concat(col("doc_id"), lit(":"), col("pos"))),
              lit(100L)) < 15)
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val flagged = toks
          .withColumn("pm", lag("marked", 1, false).over(w))
          .withColumn("st",
            when(col("marked") && !col("pm"), 1).otherwise(0))
          .withColumn("sid", sum("st").over(
            Window.partitionBy("doc_id").orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val spans = flagged.filter(col("marked"))
          .groupBy("doc_id", "sid")
          .agg(min("pos").as("span_start"), count(lit(1)).as("len"),
            array_join(transform(
              sort_array(collect_list(struct(col("pos"), col("token")))),
              e => e.getField("token")), " ").as("span_text"))
          .withColumn("k", row_number().over(
            Window.partitionBy("doc_id").orderBy("span_start")) - 1)
        val inputPieces = flagged.filter(!col("marked"))
          .select(col("doc_id"), col("pos"), col("token").as("piece"))
          .unionByName(spans.select(col("doc_id"),
            col("span_start").as("pos"),
            concat(lit("<extra_id_"), col("k"), lit(">")).as("piece")))
        val inputs = inputPieces.groupBy("doc_id")
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("pos"), col("piece")))),
            e => e.getField("piece")), " ").as("input_text"))
        val targets = spans.groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"), sum("len").as("n_masked"),
            array_join(transform(
              sort_array(collect_list(struct(col("k"),
                concat(lit("<extra_id_"), col("k"), lit("> "),
                  col("span_text")).as("tp")))),
              e => e.getField("tp")), " ").as("target_text"))
        inputs.join(targets, Seq("doc_id"), "left")
          .select(col("doc_id"), col("input_text"),
            coalesce(col("target_text"), lit("")).as("target_text"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("n_masked"), lit(0L)).as("n_masked"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, u.pos - 1 AS pos, u.token,
            (${PortableHash.hexHashSql(
              "CAST(doc_id AS VARCHAR) || ':' || CAST(u.pos - 1 AS VARCHAR)")}
              % 100 < 15) AS marked
          FROM (
            SELECT doc_id, unnest(list_transform(string_split(text, ' '),
              (t, i) -> struct_pack(pos := i, token := t))) AS u
            FROM documents WHERE doc_id < 200)),
        lagged AS (
          SELECT *, coalesce(
            lag(marked) OVER (PARTITION BY doc_id ORDER BY pos), false) AS pm
          FROM toks),
        flagged AS (
          SELECT *,
            CAST(sum(CASE WHEN marked AND NOT pm THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS sid
          FROM lagged),
        spans AS (
          SELECT doc_id, sid, min(pos) AS span_start,
            CAST(count(*) AS BIGINT) AS len,
            string_agg(token, ' ' ORDER BY pos) AS span_text
          FROM flagged WHERE marked GROUP BY 1, 2),
        spans_k AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY span_start) - 1 AS k
          FROM spans),
        input_pieces AS (
          SELECT doc_id, pos, token AS piece FROM flagged WHERE NOT marked
          UNION ALL
          SELECT doc_id, span_start AS pos,
            '<extra_id_' || CAST(k AS VARCHAR) || '>' AS piece
          FROM spans_k),
        inputs AS (
          SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_text
          FROM input_pieces GROUP BY doc_id),
        targets AS (
          SELECT doc_id, count(*) AS n_spans, CAST(sum(len) AS BIGINT) AS n_masked,
            string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> ' || span_text,
              ' ' ORDER BY k) AS target_text
          FROM spans_k GROUP BY doc_id)
        SELECT i.doc_id, i.input_text,
          coalesce(t.target_text, '') AS target_text,
          coalesce(t.n_spans, 0) AS n_spans,
          coalesce(t.n_masked, 0) AS n_masked
        FROM inputs i LEFT JOIN targets t USING (doc_id)
        ORDER BY doc_id""")),

    Q(
      "pipeline_sft_formatting",
      "Supervised-fine-tuning example formatting: each document " +
        "becomes a chat-template string (<|user|> head <|assistant|> " +
        "tail) with the LOSS-MASK boundary carried as exact token " +
        "offsets — the assistant span is what the trainer computes " +
        "loss on, and an off-by-one here silently trains on the " +
        "prompt, so the boundary is first-class oracle-checked " +
        "output. Pure per-row array slicing in one scan; short docs " +
        "(≤ prompt length) are routed out as rejected rows with a " +
        "reason, the manifest shape a real SFT pipeline emits.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 300)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("n", size(col("w")).cast("long"))
        d.select(col("doc_id"), col("n").as("n_tokens"),
            when(col("n") > 10,
              concat(lit("<|user|> "),
                array_join(slice(col("w"), 1, 10), " "),
                lit(" <|assistant|> "),
                array_join(slice(col("w"), 11, 1000000), " ")))
              .as("formatted"),
            when(col("n") > 10, lit(10L)).as("prompt_tokens"),
            when(col("n") > 10, col("n") - 10).as("loss_tokens"),
            when(col("n") <= 10, lit("too_short")).as("reject_reason"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS w,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents WHERE doc_id < 300)
        SELECT doc_id, n AS n_tokens,
          CASE WHEN n > 10 THEN
            '<|user|> ' || array_to_string(w[1:10], ' ')
              || ' <|assistant|> ' || array_to_string(w[11:], ' ')
          END AS formatted,
          CASE WHEN n > 10 THEN CAST(10 AS BIGINT) END AS prompt_tokens,
          CASE WHEN n > 10 THEN n - 10 END AS loss_tokens,
          CASE WHEN n <= 10 THEN 'too_short' END AS reject_reason
        FROM d ORDER BY doc_id""")),

    Q(
      "text_token_counts",
      "Corpus token frequencies, top 30 (count desc, token tie-break).",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(30)
      },
      Some("""SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 30""")),

    Q(
      "text_ngram_counts",
      "Bigram frequencies, top 20; n-grams built with a HOF over the " +
        "token sequence (guarded for 1-token docs).",
      (s, dir) => {
        // materialize the token array ONCE per row before the HOF — an
        // element_at(split(...), i) inside the lambda would re-split the
        // text per element (O(words²) per doc)
        val d = Tables.t(s, dir, "documents").select(split(col("text"), " ").as("words"))
        val w = col("words")
        d.select(explode(TextFns.wordGrams(w, 2)).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""SELECT bigram, count(*) AS n FROM (
          SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
            i -> string_split(text, ' ')[CAST(i AS INT)] || ' ' ||
                 string_split(text, ' ')[CAST(i + 1 AS INT)])) AS bigram
          FROM documents)
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")),

    Q(
      "text_tfidf",
      "TF-IDF with a pinned formula (idf = ln((N+1)/(df+1))), top 100 " +
        "terms. Two aggregations + a token join; doc count joined in as " +
        "a 1-row broadcast, never collected. Ordered by the rounded " +
        "score so last-ulp ln() skew cannot reorder rows.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        // df derives from tf — one row per (doc, token), so count(*)
        // per token IS the distinct doc count. The r18 form re-exploded
        // the corpus a second time and ran a two-phase countDistinct
        // over the raw token stream (guide §1.2: don't compute things
        // twice); tf's (doc_id, token) exchange is shared by both
        // consumers, so the corpus is tokenized once.
        val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val n = Tables.t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        tf.join(df_, "token")
          .crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1).cast("double")), 6))
          .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
          .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
          .limit(100)
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.token, tf.tf AS tf, df.df AS df,
          round(tf.tf * ln((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
        ORDER BY tfidf DESC, doc_id, token LIMIT 100""")),

    Q(
      "text_keyword_extract",
      "Per-document keyword extraction: top-3 terms by the same pinned " +
        "TF-IDF formula as text_tfidf, ranked inside each doc with a " +
        "rounded-score window (WindowGroupLimit-prunable). The " +
        "tag-every-document step of corpus curation — tf/df/N " +
        "aggregations + token join, one window on the doc key, nothing " +
        "collected.",
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val tf = tok.filter(col("doc_id") < 50)
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df_ = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("token"))
        tf.join(df_, "token")
          .crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1).cast("double")), 6))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("token"), col("tfidf"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE doc_id < 50 GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (SELECT tf.doc_id, tf.token,
            round(tf.tf * ln((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)), 6) AS tfidf
          FROM tf JOIN df USING (token) CROSS JOIN n),
        rk AS (SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rk
          FROM scored)
        SELECT doc_id, rk, token, tfidf FROM rk
        WHERE rk <= 3 ORDER BY doc_id, rk""")),

    Q(
      "text_token_regex",
      "Regex (BPE-pre-tokenizer-style) token counting next to the " +
        "whitespace path: runs of letters / digits / single other chars " +
        "— the split every subword tokenizer applies before merges. " +
        "Same counts from DuckDB's RE2 (pattern stays in the common " +
        "dialect subset).",
      (s, dir) => {
        val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), regexp_extract_all(col("text"), lit(pat), lit(0)).as("toks"))
        d.select(
            col("doc_id"),
            size(col("toks")).as("n_tokens"),
            size(array_distinct(col("toks"))).as("n_uniq"),
            element_at(col("toks"), 1).as("first_tok"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
          regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS toks
        FROM documents)
        SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
          CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
          toks[1] AS first_tok
        FROM d ORDER BY doc_id""")),

    Q(
      "text_langid_features",
      "Language-ID heuristic features: stopword hits/ratio from a fixed " +
        "marker lexicon (the n-gram-profile approach reduced to its " +
        "feature extraction — deterministic and oracle-checkable).",
      (s, dir) => {
        val stop = typedlit(Seq("the", "a", "of", "and", "to"))
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("words"))
        val w = col("words")
        val nStop = size(filter(w, t => array_contains(stop, t)))
        d.select(
            col("doc_id"), col("lang"),
            nStop.as("n_stop"),
            round(nStop.cast("double") / size(w), 4).as("stop_ratio"),
            array_contains(w, "the").as("has_the"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id, lang,
          CAST(len(list_filter(words, w -> list_contains(['the','a','of','and','to'], w))) AS INT) AS n_stop,
          round(CAST(len(list_filter(words, w -> list_contains(['the','a','of','and','to'], w))) AS DOUBLE)
            / len(words), 4) AS stop_ratio,
          list_contains(words, 'the') AS has_the
        FROM d ORDER BY doc_id""")),

    Q(
      "text_bpe_merges",
      "BPE tokenizer TRAINING: learn 10 merge rules from the corpus by " +
        "repeatedly fusing the most frequent adjacent symbol pair. " +
        "Runs on the frequency-weighted VOCABULARY table (the standard " +
        "trick — at 100 TB the corpus is huge but its distinct-word " +
        "table is small, so each round is an explode→groupBy over " +
        "vocab-sized data): state = (word, freq, symbol array), one " +
        "pair-count aggregation + a greedy left-to-right fold (HOF) " +
        "per round, 1-row winner broadcast, checkpointed. Fully " +
        "deterministic (count desc, pair asc tie-break) AND fully " +
        "oracle-checked: the oracle unrolls all 10 training rounds as " +
        "CTE stages — pair counts, ORDER BY/LIMIT argmax, and the " +
        "same greedy merge fold referencing each round's winner row — " +
        "so every learned rule and its frequency is replayed exactly. " +
        "QueriesSpec additionally pins determinism, monotone " +
        "non-increasing pair frequency, and rule well-formedness.",
      (s, dir) => {
        val nMerges = 10
        // Vocabulary with corpus frequency; symbols start as characters.
        var vocab = Tables.t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
          .select(col("word"), col("freq"),
            // Spark's split keeps trailing empties (limit = -1); drop them.
            filter(split(col("word"), ""), u => length(u) > 0).as("units"))
          .transform(Skew.cut)
        var rules: DataFrame = null
        for (step <- 1 to nMerges) {
          // Adjacent-pair counts, weighted by word frequency.
          val top = vocab
            .select(col("freq"), explode(TextFns.adjacentPairs(col("units"))).as("p"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum("freq").as("pair_freq"))
            .orderBy(col("pair_freq").desc, col("l"), col("r"))
            .limit(1)
            .select(lit(step).as("step"), col("l"), col("r"), col("pair_freq"))
            .transform(Skew.cut)
          rules = if (rules == null) top else rules.unionByName(top)
          // Greedy left-to-right merge of the winning pair in every word.
          vocab = vocab.crossJoin(broadcast(top.select("l", "r")))
            .select(col("word"), col("freq"),
              TextFns.applyMerge(col("units"), col("l"), col("r")).as("units"))
            .transform(Skew.cut)
        }
        rules.orderBy("step")
      },
      Some(bpeMergesOracle(10))),

    Q(
      "text_bpe_encode",
      "BPE tokenizer APPLICATION, oracle-checked — the other half of " +
        "text_bpe_merges: every word is split to characters and a fixed " +
        "merge table is applied in rule order with the same greedy " +
        "left-to-right scan the trainer uses (each rule is one " +
        "`aggregate` fold over the unit array ≡ DuckDB list_reduce over " +
        "singleton-lists — pure string/array ops, bit-identical across " +
        "engines). The merge table is inline so DuckDB can replay the " +
        "encode exactly; swapping in trained rules is the same unrolled " +
        "plan. Per-row array work only — no shuffle until the final " +
        "sort, so encoding parallelizes embarrassingly at corpus scale.",
      (s, dir) => {
        val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"))
        val words = Tables.t(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "word")
          .select(col("doc_id"), col("pos").cast("int").as("pos"), col("word"),
            filter(split(col("word"), ""), u => length(u) > 0).as("units"))
        val encoded = merges.foldLeft(words) { case (df, (l, r)) =>
          df.withColumn("units", TextFns.applyMerge(col("units"), l, r))
        }
        encoded.select(col("doc_id"), col("pos"), col("word"),
            concat_ws("|", col("units")).as("tokens"),
            size(col("units")).as("n_units"))
          .orderBy("doc_id", "pos")
      },
      Some {
        val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"))
        val folds = merges.zipWithIndex.map { case ((l, r), i) =>
          s"""u${i + 1} AS (SELECT doc_id, pos, word,
             | ${TextFns.applyMergeSql("units", s"'$l'", s"'$r'")} AS units
             | FROM u$i)""".stripMargin.replaceAll("\n", "")
        }
        s"""WITH w AS (
            SELECT doc_id,
              unnest(string_split(text, ' ')) AS word,
              CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos
            FROM documents WHERE doc_id < 100),
          u0 AS (SELECT doc_id, pos, word,
            list_filter(string_split(word, ''), u -> len(u) > 0) AS units FROM w),
          ${folds.mkString(", ")}
          SELECT doc_id, pos, word,
            array_to_string(units, '|') AS tokens,
            CAST(len(units) AS INT) AS n_units
          FROM u${merges.size} ORDER BY doc_id, pos"""
      }),

    Q(
      "text_unigram_logprob",
      "Unigram language-model scoring: corpus token distribution → " +
        "per-doc mean negative log-probability in bits (the perplexity " +
        "proxy used for LM-based quality filtering — low = typical, " +
        "high = outlier). Token join against the (vocabulary-sized, " +
        "broadcast) frequency table, corpus total as a 1-row cross " +
        "join. The per-doc double sum is a sorted sequential fold " +
        "(sort_array + aggregate ≡ DuckDB list_sort + list_reduce) so " +
        "the result is bit-identical regardless of partial-aggregation " +
        "order — integer sums are order-safe, float sums are not.",
      (s, dir) => unigramBits(s, dir).orderBy("doc_id"),
      Some(s"""WITH $unigramBitsCtes
        SELECT doc_id, n_tok, bits_per_token FROM ub ORDER BY doc_id""")),

    Q(
      "text_bigram_logprob",
      "Bigram language-model scoring: in-corpus conditional " +
        "cross-entropy −mean log2 n(prev,w)/n(prev) per document — the " +
        "context-sensitive upgrade of text_unigram_logprob (repetitive " +
        "boilerplate scores near 0 bits, incoherent token salad scores " +
        "high even when its unigrams are common). Bigrams via one lag " +
        "window per doc; corpus tables joined back (unigram table " +
        "broadcast, bigram join keyed — one shuffle at any scale); the " +
        "per-doc double sum is the sorted sequential fold ≡ DuckDB " +
        "list_sort + list_reduce, bit-identical under any " +
        "partial-aggregation order.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "w")
        val wn = Window.partitionBy("doc_id").orderBy("pos")
        val pairs = tok
          .withColumn("prev", lag(col("w"), 1).over(wn))
          .filter(col("prev").isNotNull)
          .select(col("doc_id"), col("prev"), col("w"))
        val uni = tok.groupBy("w").agg(count(lit(1)).as("nw"))
          .select(col("w").as("prev"), col("nw"))
        val big = pairs.groupBy("prev", "w").agg(count(lit(1)).as("n2"))
        pairs.groupBy("doc_id", "prev", "w").agg(count(lit(1)).as("c"))
          .join(big, Seq("prev", "w"))
          .join(broadcast(uni), "prev")
          .select(col("doc_id"), col("c"),
            (col("c").cast("double") *
              log2(col("n2") / col("nw").cast("double"))).as("x"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_bigrams"), sort_array(collect_list(col("x"))).as("xs"))
          .select(col("doc_id"), col("n_bigrams"),
            round(-aggregate(col("xs"), lit(0.0), (acc, x) => acc + x) /
              col("n_bigrams"), 6).as("bits_per_bigram"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w,
            CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
          FROM documents),
        pairs AS (
          SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
          FROM tok QUALIFY prev IS NOT NULL),
        uni AS (SELECT w AS prev, count(*) AS nw FROM tok GROUP BY 1),
        big AS (SELECT prev, w, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        cd AS (SELECT doc_id, prev, w, count(*) AS c FROM pairs GROUP BY 1, 2, 3),
        terms AS (
          SELECT doc_id, c,
            CAST(c AS DOUBLE) * log2(b.n2 / CAST(u.nw AS DOUBLE)) AS x
          FROM cd JOIN big b USING (prev, w) JOIN uni u USING (prev)),
        agg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
            list_reduce(list_sort(list(x)), (a, b) -> a + b) AS sx
          FROM terms GROUP BY 1)
        SELECT doc_id, n_bigrams, round(-sx / n_bigrams, 6) AS bits_per_bigram
        FROM agg ORDER BY doc_id""")),

    Q(
      "text_quality",
      "Quality-scoring features: char/word counts, average word length, " +
        "vocabulary (type/token) ratio.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), col("text"), split(col("text"), " ").as("words"))
        val w = col("words")
        d.select(
            col("doc_id"), col("n_chars"),
            length(col("text")).as("len"),
            size(w).as("n_words"),
            round(length(regexp_replace(col("text"), " ", "")).cast("double") / size(w), 4)
              .as("avg_word_len"),
            round(size(array_distinct(w)).cast("double") / size(w), 4).as("uniq_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars, text, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id, n_chars,
          CAST(length(text) AS INT) AS len,
          CAST(len(words) AS INT) AS n_words,
          round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(words), 4) AS avg_word_len,
          round(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 4) AS uniq_ratio
        FROM d ORDER BY doc_id""")),

    Q(
      "text_oov_rate",
      "Out-of-vocabulary rate per document against a fixed-size " +
        "corpus vocabulary (top-25 tokens by total occurrences, ties " +
        "broken by token — the deterministic stand-in for a frozen " +
        "tokenizer vocab): the coverage signal that decides whether a " +
        "tokenizer fits a corpus and flags encoding-junk documents. " +
        "Per-(doc, token) counts feed BOTH the vocab (token-keyed " +
        "re-aggregation, corpus-vocabulary-sized) and the per-doc " +
        "rate (broadcast vocab left join, null ⇒ OOV) — one corpus " +
        "tokenize pass, integer arithmetic end to end except the " +
        "final division.",
      (s, dir) => {
        val cnt = Tables.t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val vocab = cnt.groupBy("w").agg(sum("c").as("freq"))
          .orderBy(col("freq").desc, col("w")).limit(25)
          .select(col("w"), lit(1).as("iv"))
        cnt.join(broadcast(vocab), Seq("w"), "left")
          .groupBy("doc_id")
          .agg(sum("c").as("n_tokens"),
            sum(when(col("iv").isNull, col("c")).otherwise(lit(0L))).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        vocab AS (SELECT w FROM (
            SELECT w, row_number() OVER (
              ORDER BY CAST(sum(c) AS BIGINT) DESC, w) AS rk
            FROM cnt GROUP BY w) WHERE rk <= 25),
        agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE c END) AS BIGINT) AS n_oov
          FROM cnt GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_oov,
          round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate
        FROM agg ORDER BY doc_id""")),

    Q(
      "text_bm25_search",
      "BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed query " +
        "{'spark','merge','batch'}: tf/df/doclen aggregations + join — " +
        "the keyword-search half of a training-data curation stack. " +
        "Ordered by the rounded score (ln ulp-safe), top 20. The per-doc " +
        "score sum (≤3 addends) is a sorted sequential fold so partial-" +
        "aggregation order cannot flip the 6th decimal.",
      (s, dir) => {
        val k1 = 1.2
        val b = 0.75
        val docs = Tables.t(s, dir, "documents")
        // doc length = token count = size of the split array, computed
        // per row with NO explode and NO shuffle (guide §2.4): the r18
        // form exploded the whole corpus and re-aggregated it back to
        // one row per doc just to count — identical integers, since
        // explode emits exactly one row per array element.
        val dl = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"))
        val stats = docs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(dl.agg(round(avg("dl"), 6).as("avgdl")))
        val qterms = Seq("spark", "merge", "batch")
        // generate only the matching tokens: the array filter runs
        // per input row inside the fused generator, so non-matching
        // tokens are never emitted as rows (same rows as
        // explode-then-filter — filter(explode(xs)) ≡ explode(filter(xs)))
        val tf = docs.select(col("doc_id"),
            explode(filter(split(col("text"), " "),
              t => t.isin(qterms: _*))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        // tf is one row per (doc, token), so the distinct doc count per
        // token is a plain count — no two-phase distinct aggregation
        val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val scored = tf.join(df_, "token").join(dl, "doc_id").crossJoin(broadcast(stats))
          .withColumn("idf",
            log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("contrib",
            col("idf") * (col("tf") * (k1 + 1)) /
              (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        scored.groupBy("doc_id")
          .agg(
            round(aggregate(sort_array(collect_list(col("contrib"))), lit(0.0),
              (acc, x) => acc + x), 6).as("bm25"),
            count(lit(1)).as("n_terms"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                         (SELECT round(avg(dl), 6) FROM dl) AS avgdl),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token IN ('spark', 'merge', 'batch') GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        scored AS (SELECT tf.doc_id,
            ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) /
              (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl)) AS contrib
          FROM tf JOIN df USING (token) JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats)
        SELECT doc_id,
          round(list_reduce(list_sort(list(contrib)), (a, b) -> a + b), 6) AS bm25,
          count(*) AS n_terms
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20""")),

    Q(
      "text_hybrid_rrf",
      "Hybrid retrieval via reciprocal-rank fusion (k=60): the BM25 " +
        "lexical ranking of text_bm25_search fused with the dense " +
        "cosine ranking against a query embedding (vec_id 0, embeddings " +
        "joined to documents by id) — the standard two-tower retrieval " +
        "stack for curation and RAG. Each arm is a bounded top-50 via " +
        "TakeOrderedAndProject on the ROUNDED score (doc_id tie-break); " +
        "ranks are then assigned WITHOUT any window — the 50-row list " +
        "collapses to one sorted array (sort_array ∘ collect_list on " +
        "(-score, doc_id)) and posexplode re-emits (rank, doc) — the " +
        "repo's bounded sorted-fold idiom, so the QueriesSpec " +
        "unpartitioned-window ban holds by construction. Fusion is a " +
        "full-outer join of two ≤50-row frames (absent rank → 0, " +
        "contributing nothing); 1/(60+r) sums in fixed written order, " +
        "so the 6-decimal round is stable. At 100 TB each arm's " +
        "ranking is the already-scaled operator (BM25 token shuffle / " +
        "ANN candidates); fusion cost never grows past 2·k rows.",
      (s, dir) => {
        val k1 = 1.2
        val b = 0.75
        val docs = Tables.t(s, dir, "documents")
        // same three rewrites as text_bm25_search (shared BM25 arm):
        // per-row size() doc lengths (no corpus explode+shuffle), the
        // fused array filter so only query-term tokens are generated,
        // and plain count for df over the already-(doc,token)-distinct
        // tf table.
        val dl = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"))
        val stats = docs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(dl.agg(round(avg("dl"), 6).as("avgdl")))
        val qterms = Seq("spark", "merge", "batch")
        val tf = docs.select(col("doc_id"),
            explode(filter(split(col("text"), " "),
              t => t.isin(qterms: _*))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val bmTop = tf.join(df_, "token").join(dl, "doc_id").crossJoin(broadcast(stats))
          .withColumn("idf",
            log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("contrib",
            col("idf") * (col("tf") * (k1 + 1)) /
              (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .groupBy("doc_id")
          .agg(round(aggregate(sort_array(collect_list(col("contrib"))), lit(0.0),
            (acc, x) => acc + x), 6).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(50)
        def rankOf(top: DataFrame, scoreCol: String, rankName: String): DataFrame =
          top.agg(sort_array(collect_list(
              struct((-col(scoreCol)).as("ns"), col("doc_id")))).as("a"))
            .select(posexplode(col("a")).as(Seq("p", "x")))
            .select(col("x.doc_id").as("doc_id"),
              (col("p") + 1).cast("int").as(rankName))
        val e = Tables.t(s, dir, "embeddings")
        val qe = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        val cosTop = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qe))
          .select(col("vec_id").as("doc_id"),
            round(graft.expr.VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos"))
          .orderBy(col("cos").desc, col("doc_id"))
          .limit(50)
        rankOf(bmTop, "bm25", "r_bm")
          .join(rankOf(cosTop, "cos", "r_cos"), Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("r_bm"), lit(0)).as("r_bm"),
            coalesce(col("r_cos"), lit(0)).as("r_cos"))
          .withColumn("rrf", round(
            when(col("r_bm") > 0, lit(1.0) / (lit(60) + col("r_bm"))).otherwise(lit(0.0)) +
              when(col("r_cos") > 0, lit(1.0) / (lit(60) + col("r_cos"))).otherwise(lit(0.0)),
            6))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                         (SELECT round(avg(dl), 6) FROM dl) AS avgdl),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token IN ('spark', 'merge', 'batch') GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        scored AS (SELECT tf.doc_id,
            ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) /
              (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl)) AS contrib
          FROM tf JOIN df USING (token) JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats),
        bm AS (SELECT doc_id,
            round(list_reduce(list_sort(list(contrib)), (a, b) -> a + b), 6) AS bm25
          FROM scored GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
        bmr AS (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS r_bm FROM bm),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        cs AS (SELECT vec_id AS doc_id,
            round(${graft.expr.VectorOps.duckCosine("embedding", "qe")}, 6) AS cos
          FROM embeddings, q WHERE vec_id != 0
          ORDER BY cos DESC, doc_id LIMIT 50),
        csr AS (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS r_cos FROM cs),
        f AS (SELECT coalesce(bmr.doc_id, csr.doc_id) AS doc_id,
            coalesce(r_bm, 0) AS r_bm, coalesce(r_cos, 0) AS r_cos
          FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.doc_id)
        SELECT doc_id, r_bm, r_cos,
          round(CASE WHEN r_bm > 0 THEN CAST(1 AS DOUBLE) / (60 + r_bm)
                     ELSE CAST(0 AS DOUBLE) END +
                CASE WHEN r_cos > 0 THEN CAST(1 AS DOUBLE) / (60 + r_cos)
                     ELSE CAST(0 AS DOUBLE) END, 6) AS rrf
        FROM f ORDER BY rrf DESC, doc_id LIMIT 20""")),

    Q(
      "text_chunking",
      "Document chunking into overlapping token windows (size 8, " +
        "stride 6 — the context-window preparation step of a training " +
        "pipeline): chunk starts via sequence(1, n, stride), slice per " +
        "start, one row per chunk. All generator + array ops — the " +
        "explode parallelizes chunks across tasks at corpus scale.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), split(col("text"), " ").as("words"))
        d.select(col("doc_id"), col("words"),
            explode(sequence(lit(1), size(col("words")), lit(6))).as("st"))
          .select(
            col("doc_id"),
            (((col("st") - 1) / 6) + 1).cast("int").as("chunk_id"),
            concat_ws(" ", slice(col("words"), col("st"), lit(8))).as("chunk"),
            size(slice(col("words"), col("st"), lit(8))).as("n_tokens"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 100),
        x AS (SELECT doc_id, words, unnest(range(1, len(words) + 1, 6)) AS st FROM d)
        SELECT doc_id,
          CAST((st - 1) // 6 + 1 AS INT) AS chunk_id,
          array_to_string(words[CAST(st AS INT):CAST(st + 7 AS INT)], ' ') AS chunk,
          CAST(len(words[CAST(st AS INT):CAST(st + 7 AS INT)]) AS INT) AS n_tokens
        FROM x ORDER BY doc_id, chunk_id""")),

    Q(
      "text_pack_batches",
      "Token-budget batch packing (500 tokens, per source): running " +
        "token cumsum over a per-source window, batch id = prefix-start " +
        "div budget — the deterministic streaming approximation of bin " +
        "packing every pretraining data loader uses. The per-source " +
        "cumsum rides [[Skew.groupedRunningSum]] (range-partitioned " +
        "per-group prefix sums + broadcast offsets), so a 20-value " +
        "source dimension never caps the packing at 20 tasks — at " +
        "scale the spine width IS the cluster.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Skew.groupedRunningSum(d, Seq("source"), Seq(col("doc_id")),
            "n_tokens", outCol = "cum")
          .select(col("doc_id"), col("source"),
            col("n_tokens").cast("int").as("n_tokens"),
            floor((col("cum") - col("n_tokens")) / 500).cast("int").as("batch_id"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS INT) AS n_tokens FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
            sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d)
        SELECT doc_id, source, n_tokens,
          CAST((cum - n_tokens) // 500 AS INT) AS batch_id
        FROM c ORDER BY doc_id""")),

    Q(
      "sample_seeded",
      "Seeded Bernoulli sampling (corpus subsampling). Sampler RNGs " +
        "differ across engines → rows-only; the spec pins determinism " +
        "(same seed ⇒ same rows) and fraction bounds.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .sample(withReplacement = false, fraction = 0.2, seed = 42L)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      None),

    Q(
      "sample_stratified",
      "Stratified sampling by language (per-class fractions via " +
        "sampleBy) — class rebalancing for training mixes. Rows-only + " +
        "spec on per-stratum bounds.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .stat.sampleBy("lang",
            Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2), 42L)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      None),

    Q(
      "sample_seeded_hash",
      "Hash-Bernoulli sampling, the deterministic twin of " +
        "sample_seeded: keep a document iff portable-hash('sb:'||id) " +
        "mod 2^20 < floor(0.2·2^20). Unlike the native RNG sampler " +
        "this is FULLY oracle-checked (both engines compute the same " +
        "md5), reproducible across engines/partitionings/reruns, and " +
        "is the sampling a production pipeline should prefer: " +
        "membership is a pure function of the key, so a re-run, a " +
        "backfill, or a different cluster layout selects the SAME " +
        "subsample — no shuffle, one scan, filter fully parallel.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .filter(pmod(PortableHash.hexHash(
              concat(lit("sb:"), col("doc_id").cast("string"))),
            lit(1048576L)) < lit(209715L))
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, source FROM documents
        WHERE ${PortableHash.hexHashSql("'sb:' || CAST(doc_id AS VARCHAR)")} % 1048576 < 209715
        ORDER BY doc_id""")),

    Q(
      "sample_stratified_hash",
      "Per-stratum hash-Bernoulli sampling, the deterministic twin of " +
        "sample_stratified: per-language keep-thresholds (en 0.5, " +
        "others 0.2, unlisted 0) applied to portable-hash('st:'||lang" +
        "||':'||id) mod 2^20 — the lang salt makes strata independent. " +
        "Fully oracle-checked, reproducible, one scan, no shuffle; " +
        "the class-rebalancing sampler a training-mix pipeline should " +
        "prefer over the RNG form for exactly-once dataset freezes.",
      (s, dir) => {
        val thresh = when(col("lang") === "en", lit(524288L))
          .when(col("lang").isin("es", "de", "fr", "zh"), lit(209715L))
          .otherwise(lit(0L))
        Tables.t(s, dir, "documents")
          .filter(pmod(PortableHash.hexHash(
              concat(lit("st:"), col("lang"), lit(":"),
                col("doc_id").cast("string"))),
            lit(1048576L)) < thresh)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE ${PortableHash.hexHashSql("'st:' || lang || ':' || CAST(doc_id AS VARCHAR)")} % 1048576
          < (CASE WHEN lang = 'en' THEN 524288
                  WHEN lang IN ('es','de','fr','zh') THEN 209715
                  ELSE 0 END)
        ORDER BY doc_id""")),

    Q(
      "sample_reservoir_group",
      "Deterministic k-per-group reservoir sample: 5 documents per " +
        "language, selection order = md5 of the doc id (a fixed pseudo-" +
        "random permutation both engines compute identically, so unlike " +
        "the RNG samplers this one is fully oracle-checked). One " +
        "window pass partitioned by the group key, WindowGroupLimit-" +
        "prunable — the per-class quota shape (balanced eval sets, " +
        "per-source caps) at any corpus size.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
        d.withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("rk"), col("doc_id"), col("source"))
          .orderBy("lang", "rk")
      },
      Some("""WITH h AS (SELECT doc_id, lang, source,
          md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        rk AS (SELECT *, CAST(row_number() OVER (
            PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rk FROM h)
        SELECT lang, rk, doc_id, source FROM rk
        WHERE rk <= 5 ORDER BY lang, rk""")),

    Q(
      "sample_weighted",
      "Weighted sampling without replacement, top 100 by the " +
        "Efraimidis–Spirakis exponential race: per-row u in (0,1] from " +
        "the portable md5 hash, key = -ln(u)/w with w = n_chars, keep " +
        "the k smallest keys — one scan + TakeOrderedAndProject, no " +
        "shuffle of the corpus. Unlike the RNG samplers this one is " +
        "FULLY oracle-checked: u is an exact dyadic rational both " +
        "engines derive from the same md5 bytes, and the key is a " +
        "single per-row ln + division (no accumulation), quantized to " +
        "12 decimals before ordering so a last-ulp libm difference " +
        "cannot reorder the race. The probability-proportional-to-size " +
        "selection every mixture/curation pipeline needs, at any scale.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val u = (PortableHash.hexHash(concat(lit("ws:"), col("doc_id").cast("string"))) + 1)
          .cast("double") / lit(4294967296.0)
        d.select(col("doc_id"), col("lang"), col("n_chars"),
            round(-log(u) / col("n_chars"), 12).as("es_key"))
          .orderBy(col("es_key"), col("doc_id"))
          .limit(100)
      },
      Some(s"""WITH u AS (SELECT doc_id, lang, n_chars,
          (${PortableHash.hexHashSql("'ws:' || CAST(doc_id AS VARCHAR)")} + 1)
            / 4294967296.0 AS u
          FROM documents)
        SELECT doc_id, lang, n_chars, round(-ln(u) / n_chars, 12) AS es_key
        FROM u ORDER BY es_key, doc_id LIMIT 100""")),

    Q(
      "text_length_histogram",
      "Corpus profiling: fixed-width histogram of document lengths " +
        "(floor bucketing — exact integer arithmetic both engines). The " +
        "distribution pass every curation pipeline runs before choosing " +
        "length filters.",
      (s, dir) => {
        val width = 50
        Tables.t(s, dir, "documents")
          .select((floor(col("n_chars") / width) * width).cast("long").as("bucket_lo"))
          .groupBy("bucket_lo").agg(count(lit(1)).as("n"))
          .orderBy("bucket_lo")
      },
      Some("""SELECT CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket_lo, count(*) AS n
        FROM documents GROUP BY 1 ORDER BY bucket_lo""")),

    Q(
      "text_zipf_fit",
      "Zipf-law fit over the corpus token-frequency distribution — the " +
        "data-card diagnostic that flags synthetic or template-heavy " +
        "corpora (natural text has log(freq) ≈ a + s·log(rank) with " +
        "s ≈ -1): one token-count aggregation, frequency ranks via the " +
        "scale-safe Skew.globalRank (range exchange + broadcast " +
        "offsets — the vocabulary never funnels through one task), " +
        "then the SQL-standard regression aggregates over (ln rank, " +
        "ln freq) — constant-size moment buffers, map-side combined, " +
        "same determinism class as agg_regression (coarse 4/6-decimal " +
        "rounds over bounded reorder noise).",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
        val freq = tok.groupBy("token").agg(count(lit(1)).as("n"))
        val ranked = Skew.globalRank(freq,
          Seq(col("n").desc, col("token")), rankCol = "rank")
        val y = log(col("n").cast("double"))
        val x = log(col("rank").cast("double"))
        ranked.agg(
          count(lit(1)).as("vocab_size"),
          round(regr_slope(y, x), 4).as("zipf_slope"),
          round(regr_intercept(y, x), 4).as("zipf_intercept"),
          round(regr_r2(y, x), 6).as("r2"))
      },
      Some("""WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        freq AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
        rk AS (SELECT n,
            row_number() OVER (ORDER BY n DESC, token) AS rank FROM freq)
        SELECT CAST(count(*) AS BIGINT) AS vocab_size,
          round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4)
            AS zipf_slope,
          round(regr_intercept(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4)
            AS zipf_intercept,
          round(regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS r2
        FROM rk""")),

    Q(
      "text_fingerprint",
      "Document fingerprinting: content hash (md5/sha256) plus a " +
        "canonical fingerprint over the sorted distinct token set " +
        "(identical token multisets in any order collide — the " +
        "fingerprint-dedup primitive).",
      (s, dir) => {
        val canonical = concat_ws(" ", sort_array(array_distinct(split(col("text"), " "))))
        Tables.t(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text").cast("binary")).as("md5_text"),
            sha2(col("text").cast("binary"), 256).as("sha256_text"),
            md5(canonical.cast("binary")).as("fingerprint"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS md5_text, sha256(text) AS sha256_text,
        md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
        FROM documents ORDER BY doc_id""")),

    Q(
      "text_ngram_novelty",
      "Per-document n-gram novelty: the fraction of a doc's DISTINCT " +
        "word 3-grams that occur in no other document (corpus doc-" +
        "frequency 1) — the memorization/templating risk signal " +
        "(low novelty = boilerplate or near-dup; high = unique " +
        "content). NO join-back on the gram key: the per-doc distinct " +
        "gram count is a per-row scalar (size ∘ array_distinct — zero " +
        "shuffle), and a uniquely-occurring gram credits its one " +
        "document through min(doc_id) carried on the doc-frequency " +
        "aggregation itself — so the heavy gram-keyed shuffle happens " +
        "exactly once and nothing re-joins the full gram stream " +
        "(measured 2× over the join-back form at sf0.1). The counts " +
        "subtree deliberately RE-derives the gram arrays from the " +
        "scan rather than checkpointing them once: r18 measured the " +
        "checkpoint variant at 6.3 s vs 3.4 s — materializing the " +
        "corpus-sized string arrays costs more than the second " +
        "generation pass (guide §5: caching only pays when recompute " +
        "is dearer than the memory traffic). All counts are " +
        "integers; the ratio is exact at any aggregation order.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), array_distinct(
            TextFns.wordGrams(split(col("text"), " "), 3)).as("gs"))
          .filter(size(col("gs")) > 0)
        val counts = d.select(col("doc_id"),
          size(col("gs")).cast("long").as("n_grams"))
        val uniq = d.select(col("doc_id"), explode(col("gs")).as("gram"))
          .groupBy("gram")
          .agg(count(lit(1)).as("df"), min("doc_id").as("doc_id"))
          .filter(col("df") === 1)
          .groupBy("doc_id").agg(count(lit(1)).as("n_unique"))
        counts.join(uniq, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_unique"), lit(0L)).as("n_unique"),
            round(coalesce(col("n_unique"), lit(0L)).cast("double")
              / col("n_grams"), 4).as("novelty"))
          .orderBy("doc_id")
      },
      Some("""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents),
        d AS MATERIALIZED (SELECT doc_id,
            list_distinct(list_transform(range(1, len(ws) - 1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
          FROM d0 WHERE len(ws) >= 3),
        counts AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams FROM d),
        g AS (SELECT doc_id, unnest(gs) AS gram FROM d),
        fr AS (SELECT gram, count(*) AS df, min(doc_id) AS doc_id
          FROM g GROUP BY 1),
        uniq AS (SELECT doc_id, count(*) AS n_unique
          FROM fr WHERE df = 1 GROUP BY 1)
        SELECT c.doc_id, c.n_grams,
          coalesce(u.n_unique, 0) AS n_unique,
          round(CAST(coalesce(u.n_unique, 0) AS DOUBLE) / c.n_grams, 4)
            AS novelty
        FROM counts c LEFT JOIN uniq u ON u.doc_id = c.doc_id
        ORDER BY c.doc_id""")),

    Q(
      "text_langid_confusion",
      "Language-ID EVALUATION: predict each doc's language by marker-" +
        "lexicon hits (argmin over (-score, lang) structs — ties to " +
        "the alphabetically first language, so the argmax is total) " +
        "and cross-tabulate against the labeled language. The " +
        "confusion matrix is THE quality gate for any classifier " +
        "feeding a training-mix decision; zh has no lexicon here, so " +
        "its row shows exactly where unknown languages land. Pure " +
        "per-row scalar scoring (codegen'd array HOFs, zero shuffle) " +
        "into one tiny matrix aggregation.",
      (s, dir) => {
        val marks = Seq(
          "de" -> Seq("der", "und", "die", "das", "ist"),
          "en" -> Seq("the", "and", "of", "to", "is"),
          "es" -> Seq("el", "la", "de", "que", "es"),
          "fr" -> Seq("le", "les", "et", "une", "des"))
        val d = Tables.t(s, dir, "documents")
          .select(col("lang"), split(col("text"), " ").as("ws"))
        val scored = marks.foldLeft(d) { case (df, (l, m)) =>
          df.withColumn(s"s_$l",
            size(filter(col("ws"), w => array_contains(typedlit(m), w))))
        }
        val pred = least(marks.map { case (l, _) =>
          struct((-col(s"s_$l")).as("ns"), lit(l).as("plang")) }: _*)
          .getField("plang")
        scored
          .select(col("lang").as("true_lang"), pred.as("pred_lang"))
          .groupBy("true_lang", "pred_lang")
          .agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred_lang")
      },
      Some("""WITH d AS (SELECT lang, string_split(text, ' ') AS ws
            FROM documents),
        sc AS (SELECT lang,
            CAST(len(list_filter(ws, w -> list_contains(['der','und','die','das','ist'], w))) AS INT) AS s_de,
            CAST(len(list_filter(ws, w -> list_contains(['the','and','of','to','is'], w))) AS INT) AS s_en,
            CAST(len(list_filter(ws, w -> list_contains(['el','la','de','que','es'], w))) AS INT) AS s_es,
            CAST(len(list_filter(ws, w -> list_contains(['le','les','et','une','des'], w))) AS INT) AS s_fr
          FROM d),
        p AS (SELECT lang AS true_lang,
            (list_sort([
              {'ns': -s_de, 'plang': 'de'},
              {'ns': -s_en, 'plang': 'en'},
              {'ns': -s_es, 'plang': 'es'},
              {'ns': -s_fr, 'plang': 'fr'}])[1]).plang AS pred_lang
          FROM sc)
        SELECT true_lang, pred_lang, count(*) AS n
        FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q(
      "text_winnowing",
      "Winnowing fingerprints (Schleimer et al., the MOSS algorithm, " +
        "robust variant): word 3-gram portable hashes per document, a " +
        "sliding window of 4 consecutive hashes selects its MIN, and " +
        "the distinct selected hashes form the document's fingerprint " +
        "set — guaranteed to share members for any sufficiently long " +
        "common substring, the locality property plain k-gram " +
        "sampling lacks. The whole fingerprint is PER-ROW array math " +
        "(hash the gram array, slide the min with a 4-slice transform, " +
        "array_distinct + sort) — the document is the natural unit of " +
        "winnowing, so nothing ever leaves its row: zero exchanges " +
        "where the round-17 form exploded every gram, shuffled the " +
        "corpus by doc key, and window-sorted it back together " +
        "(optimization r18, guide §2.4 — the shuffle was " +
        "reconstructing locality the scan already had). Emits the set " +
        "size and an order-canonical md5 digest of the sorted set; " +
        "bit-identical: array_min over a 4-slice ≡ the rowsBetween" +
        "(-3, 0) window min at pos ≥ 3, on the same integer hashes.",
      (s, dir) => {
        val hs = transform(
          TextFns.wordGrams(split(col("text"), " "), 3),
          g => PortableHash.hexHash(g))
        Tables.t(s, dir, "documents")
          .select(col("doc_id"), hs.as("hs"))
          // docs with < 4 grams have no full window — same rows the
          // old pos >= 3 filter dropped
          .filter(size(col("hs")) >= 4)
          .select(col("doc_id"),
            sort_array(array_distinct(transform(
              sequence(lit(1), size(col("hs")) - 3),
              st => array_min(slice(col("hs"), st, lit(4)))))).as("fps"))
          .select(col("doc_id"),
            size(col("fps")).cast("long").as("n_fp"),
            md5(concat_ws(",", col("fps")).cast("binary")).as("fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
            ${PortableHash.hexHashSql("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")} AS h
          FROM d, unnest(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3),
        s AS (SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id
            ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
          FROM g),
        sel AS (SELECT DISTINCT doc_id, wmin FROM s WHERE pos >= 3)
        SELECT doc_id, count(*) AS n_fp,
          md5(array_to_string(list_sort(list(wmin)), ',')) AS fp
        FROM sel GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "text_entropy",
      "Per-document unigram (word) Shannon entropy — the information-" +
        "density quality signal that separates natural text from " +
        "boilerplate/spam (low-entropy repetition) and noise (entropy " +
        "near log2 of vocabulary). H = log2(n) - Σ c·log2(c) / n over " +
        "within-doc token frequencies: explode → two hash aggregations, " +
        "both keyed by doc_id, so the shuffle is one exchange on the " +
        "doc key at any corpus size. The Σ c·log2(c) double sum is a " +
        "sorted sequential fold (sort_array + aggregate ≡ DuckDB " +
        "list_sort + list_reduce), so the value is bit-identical under " +
        "any partial-aggregation order; integer sums (n, distinct) are " +
        "order-safe as-is. Also emits the normalized form " +
        "H / log2(distinct) (1.0 = uniform usage).",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(
            sum("c").as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sort_array(collect_list(col("c"))).as("cs"))
          .select(
            col("doc_id"), col("n_tokens"), col("n_distinct"),
            (log2(col("n_tokens")) -
              aggregate(col("cs"), lit(0.0),
                (acc, c) => acc + c.cast("double") * log2(c)) /
              col("n_tokens")).as("h"))
          .select(
            col("doc_id"), col("n_tokens"), col("n_distinct"),
            round(col("h"), 6).as("entropy_bits"),
            when(col("n_distinct") === 1, lit(0.0))
              .otherwise(round(col("h") / log2(col("n_distinct")), 6)).as("entropy_norm"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        ent AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
            log2(CAST(sum(c) AS BIGINT)) -
              list_reduce(list_transform(list_sort(list(c)),
                c -> CAST(c AS DOUBLE) * log2(c)), (a, b) -> a + b)
              / CAST(sum(c) AS BIGINT) AS h
          FROM cnt GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_distinct,
          round(h, 6) AS entropy_bits,
          CASE WHEN n_distinct = 1 THEN 0.0
               ELSE round(h / log2(n_distinct), 6) END AS entropy_norm
        FROM ent ORDER BY doc_id""")),

    Q(
      "text_perplexity_buckets",
      "CCNet-style perplexity bucketing: every document is assigned to " +
        "the head / middle / tail tercile of the corpus by its unigram " +
        "bits-per-token (the [[unigramBits]] score text_unigram_logprob " +
        "emits — low = typical text, kept; tail = outliers, reviewed or " +
        "dropped). Ties broken by doc_id so the tercile is total-order " +
        "deterministic. The tercile is computed by [[Skew.globalNtile]] " +
        "— range-repartition + partitioned local rank + broadcast " +
        "per-partition offsets — so NO task ever sorts the whole score " +
        "table (the unpartitioned-window ntile this query shipped with " +
        "in round 6 funnels every row through one reducer at 100 TB; " +
        "the rank reconstruction is bit-identical, so the DuckDB " +
        "ntile oracle replays unchanged).",
      (s, dir) => {
        Skew.globalNtile(unigramBits(s, dir),
            Seq(col("bits_per_token"), col("doc_id")), 3, "tercile")
          .select(col("doc_id"), col("n_tok"), col("bits_per_token"),
            when(col("tercile") === 1, "head")
              .when(col("tercile") === 2, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $unigramBitsCtes,
          t AS (SELECT doc_id, n_tok, bits_per_token,
            ntile(3) OVER (ORDER BY bits_per_token, doc_id) AS tercile FROM ub)
        SELECT doc_id, n_tok, bits_per_token,
          CASE WHEN tercile = 1 THEN 'head'
               WHEN tercile = 2 THEN 'middle'
               ELSE 'tail' END AS bucket
        FROM t ORDER BY doc_id""")),

    Q(
      "text_dsir_weights",
      "DSIR-style importance weights (data selection via importance " +
        "resampling): per-document mean log-likelihood ratio between a " +
        "target corpus (the `en` slice stands in for the high-quality " +
        "target) and the raw rest, under add-1-smoothed unigram models " +
        "over the shared vocabulary. Docs scoring high look like the " +
        "target and get upsampled by a downstream weighted sampler " +
        "(sample_weighted is the companion operator). The models are " +
        "fit on a deterministic FIXED-SIZE vocabulary — the top-K " +
        "tokens by total occurrences, ties broken by token (K=25 here, " +
        "matching text_oov_rate; production would freeze 10⁵–10⁶) — so " +
        "the broadcast frequency table is O(K) however large the " +
        "corpus vocabulary grows (a web-scale unigram vocab is 10⁸+; " +
        "broadcasting it unbounded was round 6's scale watch-item). " +
        "Out-of-vocabulary tokens fall to the add-1 floor on both " +
        "sides, i.e. a constant per-token log ratio — the smoothing " +
        "absorbs the tail, no per-token state needed. Dataflow: one " +
        "tokenize pass; ONE token-keyed aggregation yields both slice " +
        "counts and the vocab ranking (top-K via per-partition heaps, " +
        "TakeOrderedAndProject — never a vocab-wide sort); smoothing " +
        "constants ride a 1-row cross join; the per-doc double sum is " +
        "the sorted sequential fold ≡ DuckDB list_sort + list_reduce, " +
        "so the score is bit-identical under any partial-aggregation " +
        "order. One keyed shuffle at any corpus size.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("token"))
        val vocab = tok.groupBy("token").agg(
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
            sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("nr"))
          .orderBy((col("nt") + col("nr")).desc, col("token"))
          .limit(DsirVocabK)
        val consts = tok.agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"),
          sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("tr"),
          countDistinct(col("token")).as("v"))
        tok.groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("c"))
          .join(broadcast(vocab), Seq("token"), "left")
          .crossJoin(broadcast(consts))
          .select(col("doc_id"), col("lang"), col("c"),
            (col("c").cast("double") *
              (log((coalesce(col("nt"), lit(0L)) + 1) /
                   (col("tt") + col("v")).cast("double")) -
               log((coalesce(col("nr"), lit(0L)) + 1) /
                   (col("tr") + col("v")).cast("double")))).as("x"))
          .groupBy("doc_id", "lang")
          .agg(sum("c").as("n_tok"), sort_array(collect_list(col("x"))).as("xs"))
          .select(col("doc_id"), col("lang"), col("n_tok"),
            round(aggregate(col("xs"), lit(0.0), (a, x) => a + x) /
              col("n_tok"), 6).as("log_ratio_per_token"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
          FROM documents),
        tcnt AS (SELECT token,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
            CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nr
          FROM tok GROUP BY 1),
        vocab AS (SELECT token, nt, nr FROM (
            SELECT token, nt, nr,
              row_number() OVER (ORDER BY nt + nr DESC, token) AS rk
            FROM tcnt) WHERE rk <= $DsirVocabK),
        consts AS (SELECT
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt,
            sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS tr,
            count(DISTINCT token) AS v
          FROM tok),
        cnt AS (SELECT doc_id, lang, token, count(*) AS c FROM tok GROUP BY 1, 2, 3),
        terms AS (
          SELECT doc_id, lang, c,
            CAST(c AS DOUBLE) * (
              ln((coalesce(vb.nt, 0) + 1) / CAST(consts.tt + consts.v AS DOUBLE)) -
              ln((coalesce(vb.nr, 0) + 1) / CAST(consts.tr + consts.v AS DOUBLE))) AS x
          FROM cnt LEFT JOIN vocab vb USING (token)
          CROSS JOIN consts),
        agg AS (
          SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tok,
            list_reduce(list_sort(list(x)), (a, b) -> a + b) AS sx
          FROM terms GROUP BY 1, 2)
        SELECT doc_id, lang, n_tok, round(sx / n_tok, 6) AS log_ratio_per_token
        FROM agg ORDER BY doc_id""")),

    Q(
      "text_kn_bigram",
      "Interpolated Kneser-Ney bigram probabilities (D = 0.75) — the " +
        "smoothing every production n-gram LM uses, and the quality " +
        "upgrade over raw-count bigram models whose unseen-pair " +
        "probability is zero: P(w|prev) = max(c−D,0)/c(prev) + " +
        "D·N₁₊(prev·)/c(prev) · N₁₊(·w)/|bigram types|, where the " +
        "continuation counts N₁₊ are distinct-neighbor counts. One " +
        "corpus tokenize pass feeds bigram counts; prefix and " +
        "continuation tables are re-aggregations of that counted " +
        "table (prefix totals = sums, distinct-neighbor counts = row " +
        "counts — no second distinct pass); the type total is a " +
        "1-row broadcast. Everything is integer until the final " +
        "probability expression; top-20 by TakeOrderedAndProject.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "w")
        val wn = Window.partitionBy("doc_id").orderBy("pos")
        val pairs = tok
          .withColumn("prev", lag(col("w"), 1).over(wn))
          .filter(col("prev").isNotNull)
          .select(col("prev"), col("w"))
        val big = pairs.groupBy("prev", "w").agg(count(lit(1)).as("c12"))
        val pre = big.groupBy("prev")
          .agg(sum("c12").as("c1"), count(lit(1)).as("n1p"))
        val cont = big.groupBy("w").agg(count(lit(1)).as("nc"))
        val types = big.agg(count(lit(1)).as("tt"))
        big.join(pre, Seq("prev"))
          .join(cont, Seq("w"))
          .crossJoin(broadcast(types))
          .withColumn("p_kn",
            greatest(col("c12") - 0.75, lit(0.0)) / col("c1")
              + lit(0.75) * col("n1p") / col("c1") * (col("nc") / col("tt").cast("double")))
          .orderBy(col("p_kn").desc, col("prev"), col("w"))
          .limit(20)
          .select(col("prev"), col("w"), col("c12"), round(col("p_kn"), 6).as("p_kn"))
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w,
            CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
          FROM documents),
        pairs AS (
          SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
          FROM tok QUALIFY prev IS NOT NULL),
        big AS (SELECT prev, w, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        pre AS (SELECT prev, CAST(sum(c12) AS BIGINT) AS c1,
            count(*) AS n1p FROM big GROUP BY 1),
        cont AS (SELECT w, count(*) AS nc FROM big GROUP BY 1),
        types AS (SELECT count(*) AS tt FROM big),
        p AS (SELECT big.prev, big.w, c12,
            greatest(c12 - 0.75, 0.0) / c1
              + 0.75 * n1p / c1 * (nc / CAST(tt AS DOUBLE)) AS p_kn
          FROM big JOIN pre USING (prev) JOIN cont USING (w), types)
        SELECT prev, w, c12, round(p_kn, 6) AS p_kn
        FROM p ORDER BY p_kn DESC, prev, w LIMIT 20""")),

    Q(
      "text_bpe_fertility",
      "Tokenizer fertility by language — units per word and chars per " +
        "unit after applying the fixed BPE merge table (same greedy " +
        "fold as text_bpe_encode, reused rule-for-rule): the metric " +
        "that decides whether a tokenizer is fair to a language " +
        "(high fertility = more sequence length per word = higher " +
        "compute cost for that language). Per-row array folds only, " +
        "one hash aggregation to |languages| rows — integer counts, " +
        "two final divisions.",
      (s, dir) => {
        val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"))
        val words = Tables.t(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .withColumn("units", filter(split(col("word"), ""), u => length(u) > 0))
        val enc = merges.foldLeft(words) { case (df, (l, r)) =>
          df.withColumn("units", TextFns.applyMerge(col("units"), l, r))
        }
        enc.groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            sum(size(col("units")).cast("long")).as("n_units"),
            sum(length(col("word")).cast("long")).as("n_chars"))
          .select(col("lang"), col("n_words"), col("n_units"),
            round(col("n_units").cast("double") / col("n_words"), 4).as("fertility"),
            round(col("n_chars").cast("double") / col("n_units"), 4).as("chars_per_unit"))
          .orderBy("lang")
      },
      Some {
        val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"))
        val folds = merges.zipWithIndex.map { case ((l, r), i) =>
          s"""u${i + 1} AS (SELECT lang, word,
             | ${TextFns.applyMergeSql("units", s"'$l'", s"'$r'")} AS units
             | FROM u$i)""".stripMargin.replaceAll("\n", "")
        }
        s"""WITH w AS (
            SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents),
          u0 AS (SELECT lang, word,
            list_filter(string_split(word, ''), u -> len(u) > 0) AS units FROM w),
          ${folds.mkString(", ")}
          SELECT lang, count(*) AS n_words,
            CAST(sum(len(units)) AS BIGINT) AS n_units,
            round(CAST(sum(len(units)) AS BIGINT)
              / CAST(count(*) AS DOUBLE), 4) AS fertility,
            round(CAST(sum(length(word)) AS BIGINT)
              / CAST(sum(len(units)) AS DOUBLE), 4) AS chars_per_unit
          FROM u${merges.size} GROUP BY lang ORDER BY lang"""
      }),

    Q(
      "text_vocab_divergence",
      "Jensen–Shannon divergence between the English and non-English " +
        "token distributions over a deterministic top-50 shared " +
        "vocabulary (count-desc, token tie-break — the frozen-vocab " +
        "trick from text_oov_rate, which also bounds the broadcast at " +
        "any corpus size): the corpus-drift monitor for vocabulary " +
        "shift between sources or snapshots. Probabilities are " +
        "renormalized within the vocab from exact integer counts; " +
        "the ≤50 divergence terms sum in one sorted fold. " +
        "JS ∈ [0,1] in log2.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(when(col("lang") === "en", lit("a")).otherwise(lit("b")).as("g"),
            explode(split(col("text"), " ")).as("w"))
          .groupBy("w")
          .agg(count(when(col("g") === "a", 1)).as("ca"),
            count(when(col("g") === "b", 1)).as("cb"))
        val vocab = tok.withColumn("tot", col("ca") + col("cb"))
          .orderBy(col("tot").desc, col("w")).limit(50)
        val tot = vocab.agg(sum("ca").as("na"), sum("cb").as("nb"))
        val terms = vocab.crossJoin(broadcast(tot))
          .withColumn("pa", col("ca").cast("double") / col("na"))
          .withColumn("pb", col("cb").cast("double") / col("nb"))
          .withColumn("m", (col("pa") + col("pb")) / 2.0)
          .withColumn("term",
            when(col("pa") > 0, col("pa") * log2(col("pa") / col("m")) / 2.0).otherwise(0.0)
              + when(col("pb") > 0, col("pb") * log2(col("pb") / col("m")) / 2.0).otherwise(0.0))
        terms.agg(
          round(Stats.sfold(col("term")), 6).as("js_divergence"),
          count(lit(1)).as("n_vocab"),
          max("na").as("na"), max("nb").as("nb"))
      },
      Some("""WITH tok AS (SELECT
            CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS g,
            unnest(string_split(text, ' ')) AS w
          FROM documents),
        cnt AS (SELECT w,
            count(*) FILTER (WHERE g = 'a') AS ca,
            count(*) FILTER (WHERE g = 'b') AS cb
          FROM tok GROUP BY 1),
        vocab AS (SELECT w, ca, cb FROM cnt
          ORDER BY ca + cb DESC, w LIMIT 50),
        t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
            CAST(sum(cb) AS BIGINT) AS nb FROM vocab),
        terms AS (SELECT
            CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / na)
              * log2((CAST(ca AS DOUBLE) / na)
                / (((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)) / 2.0)) / 2.0
              ELSE 0.0 END
            + CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / nb)
              * log2((CAST(cb AS DOUBLE) / nb)
                / (((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)) / 2.0)) / 2.0
              ELSE 0.0 END AS term,
            na, nb
          FROM vocab, t)
        SELECT round(list_reduce(list_sort(list(term)), (a, b) -> a + b), 6)
            AS js_divergence,
          count(*) AS n_vocab, max(na) AS na, max(nb) AS nb
        FROM terms""")),

    Q(
      "text_cross_lingual_overlap",
      "Pairwise vocabulary Jaccard between every language pair — the " +
        "cross-lingual-contamination screen (shared tokens across " +
        "supposedly-separate language slices signal leaked " +
        "boilerplate or mislabeled documents). Per-language distinct " +
        "vocabularies, intersections by a token-keyed self-join " +
        "(never vocab×vocab), sizes re-aggregated and joined back — " +
        "all exact integer set arithmetic.",
      (s, dir) => {
        val vocab = Tables.t(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .distinct()
        val sizes = vocab.groupBy("lang").agg(count(lit(1)).as("vs"))
        val inter = vocab.as("a").join(vocab.as("b"),
            col("a.w") === col("b.w") && col("a.lang") < col("b.lang"))
          .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("lang").as("lang_a"), col("vs").as("sa")), Seq("lang_a"))
          .join(sizes.select(col("lang").as("lang_b"), col("vs").as("sb")), Seq("lang_b"))
          .select(col("lang_a"), col("lang_b"), col("inter"),
            (col("sa") + col("sb") - col("inter")).as("union_size"),
            round(col("inter").cast("double")
              / (col("sa") + col("sb") - col("inter")), 6).as("jaccard"))
          .orderBy("lang_a", "lang_b")
      },
      Some("""WITH vocab AS (SELECT DISTINCT lang,
            unnest(string_split(text, ' ')) AS w
          FROM documents),
        sizes AS (SELECT lang, count(*) AS vs FROM vocab GROUP BY 1),
        inter AS (SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS inter
          FROM vocab a JOIN vocab b ON a.w = b.w AND a.lang < b.lang
          GROUP BY 1, 2)
        SELECT lang_a, lang_b, inter,
          sa.vs + sb.vs - inter AS union_size,
          round(CAST(inter AS DOUBLE) / (sa.vs + sb.vs - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.lang = lang_a
        JOIN sizes sb ON sb.lang = lang_b
        ORDER BY lang_a, lang_b""")),

    Q(
      "text_pmi_bigrams",
      "Pointwise mutual information of adjacent token pairs — the " +
        "collocation detector (PMI finds 'machine learning', raw " +
        "counts find 'of the'): log2(N·c(a,b) / (c(a)·c(b))) over the " +
        "corpus bigram and unigram tables, with a count floor (≥ 5) " +
        "so rare-pair noise can't top the list. One tokenize pass " +
        "feeds both tables; integer counts until the single log; " +
        "top-20 by PMI via TakeOrderedAndProject.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "w")
        val wn = Window.partitionBy("doc_id").orderBy("pos")
        val pairs = tok
          .withColumn("prev", lag(col("w"), 1).over(wn))
          .filter(col("prev").isNotNull)
        val uni = tok.groupBy("w").agg(count(lit(1)).as("cw"))
        val big = pairs.groupBy("prev", "w").agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 5)
        val nTot = pairs.agg(count(lit(1)).as("nb"))
        big
          .join(uni.select(col("w").as("prev"), col("cw").as("ca")), Seq("prev"))
          .join(uni.select(col("w"), col("cw").as("cb")), Seq("w"))
          .crossJoin(broadcast(nTot))
          .withColumn("pmi",
            log2(col("nb").cast("double") * col("cab")
              / (col("ca").cast("double") * col("cb"))))
          .orderBy(col("pmi").desc, col("prev"), col("w"))
          .limit(20)
          .select(col("prev"), col("w"), col("cab"), round(col("pmi"), 6).as("pmi"))
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w,
            CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
          FROM documents),
        pairs AS (
          SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
          FROM tok QUALIFY prev IS NOT NULL),
        uni AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
        big AS (SELECT prev, w, count(*) AS cab FROM pairs GROUP BY 1, 2
          HAVING count(*) >= 5),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM pairs),
        p AS (SELECT big.prev, big.w, cab,
            log2(CAST(nb AS DOUBLE) * cab
              / (CAST(ua.cw AS DOUBLE) * ub.cw)) AS pmi
          FROM big
          JOIN uni ua ON ua.w = big.prev
          JOIN uni ub ON ub.w = big.w
          CROSS JOIN nt)
        SELECT prev, w, cab, round(pmi, 6) AS pmi
        FROM p ORDER BY pmi DESC, prev, w LIMIT 20""")),

    Q(
      "text_heaps_law",
      "Vocabulary-growth curve (Heaps' law V = K·nᵝ) — distinct " +
        "vocabulary at five corpus checkpoints (20%..100% of the " +
        "doc-id range) plus the fitted log-log slope β: the " +
        "projection that answers 'how much new vocabulary will 10× " +
        "more corpus bring', which sizes tokenizers and OOV budgets. " +
        "One tokenize pass feeds five conditional exact distincts in " +
        "ONE aggregation; β is a 5-point OLS over log values with " +
        "sorted-fold sums, so the whole fit is deterministic.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val mx = tok.agg(max("doc_id").as("mx"))
        val cp = tok.crossJoin(broadcast(mx))
        val aggCols = (1 to 5).flatMap(i => Seq(
          countDistinct(when(col("doc_id") * 5 <= col("mx") * i, col("w")))
            .as(s"v$i"),
          count(when(col("doc_id") * 5 <= col("mx") * i, 1)).as(s"n$i")))
        val agg = cp.agg(aggCols.head, aggCols.tail: _*)
        val pts = agg.select(explode(array(
          (1 to 5).map(i => struct(lit(i).as("checkpoint"),
            col(s"n$i").as("n_tokens"), col(s"v$i").as("vocab"))): _*)).as("p"))
          .select(col("p.checkpoint"), col("p.n_tokens"), col("p.vocab"))
          .withColumn("lx", log(col("n_tokens").cast("double")))
          .withColumn("ly", log(col("vocab").cast("double")))
        val fit = pts.agg(count(lit(1)).as("k"),
          graft.ops.Stats.sfold(col("lx")).as("sx"),
          graft.ops.Stats.sfold(col("ly")).as("sy"),
          graft.ops.Stats.sfold(col("lx") * col("ly")).as("sxy"),
          graft.ops.Stats.sfold(col("lx") * col("lx")).as("sxx"))
          .select(round((col("k").cast("double") * col("sxy") - col("sx") * col("sy"))
            / (col("k").cast("double") * col("sxx") - col("sx") * col("sx")), 4)
            .as("heaps_beta"))
        pts.crossJoin(broadcast(fit))
          .select(col("checkpoint"), col("n_tokens"), col("vocab"), col("heaps_beta"))
          .orderBy("checkpoint")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
        mx AS (SELECT max(doc_id) AS mx FROM tok),
        agg AS (SELECT
            count(DISTINCT CASE WHEN doc_id * 5 <= mx * 1 THEN w END) AS v1,
            CAST(count(CASE WHEN doc_id * 5 <= mx * 1 THEN 1 END) AS BIGINT) AS n1,
            count(DISTINCT CASE WHEN doc_id * 5 <= mx * 2 THEN w END) AS v2,
            CAST(count(CASE WHEN doc_id * 5 <= mx * 2 THEN 1 END) AS BIGINT) AS n2,
            count(DISTINCT CASE WHEN doc_id * 5 <= mx * 3 THEN w END) AS v3,
            CAST(count(CASE WHEN doc_id * 5 <= mx * 3 THEN 1 END) AS BIGINT) AS n3,
            count(DISTINCT CASE WHEN doc_id * 5 <= mx * 4 THEN w END) AS v4,
            CAST(count(CASE WHEN doc_id * 5 <= mx * 4 THEN 1 END) AS BIGINT) AS n4,
            count(DISTINCT CASE WHEN doc_id * 5 <= mx * 5 THEN w END) AS v5,
            CAST(count(CASE WHEN doc_id * 5 <= mx * 5 THEN 1 END) AS BIGINT) AS n5
          FROM tok, mx),
        pts AS (
          SELECT 1 AS checkpoint, n1 AS n_tokens, v1 AS vocab FROM agg
          UNION ALL SELECT 2, n2, v2 FROM agg
          UNION ALL SELECT 3, n3, v3 FROM agg
          UNION ALL SELECT 4, n4, v4 FROM agg
          UNION ALL SELECT 5, n5, v5 FROM agg),
        lg AS (SELECT checkpoint, n_tokens, vocab,
            ln(CAST(n_tokens AS DOUBLE)) AS lx,
            ln(CAST(vocab AS DOUBLE)) AS ly
          FROM pts),
        fit AS (SELECT CAST(count(*) AS BIGINT) AS k,
            list_reduce(list_sort(list(lx)), (a, b) -> a + b) AS sx,
            list_reduce(list_sort(list(ly)), (a, b) -> a + b) AS sy,
            list_reduce(list_sort(list(lx * ly)), (a, b) -> a + b) AS sxy,
            list_reduce(list_sort(list(lx * lx)), (a, b) -> a + b) AS sxx
          FROM lg),
        beta AS (SELECT round((CAST(k AS DOUBLE) * sxy - sx * sy)
            / (CAST(k AS DOUBLE) * sxx - sx * sx), 4) AS heaps_beta FROM fit)
        SELECT checkpoint, n_tokens, vocab, heaps_beta
        FROM lg CROSS JOIN beta ORDER BY checkpoint""")),

    Q(
      "text_case_profile",
      "Character-class composition per source — upper/digit/" +
        "whitespace/other shares from exact integer character counts " +
        "(length of the class-stripped string, the same regex in " +
        "both engines): the corpus-composition fingerprint that " +
        "flags shouting boilerplate, number dumps, and " +
        "whitespace-padded spam per source before any modeling. One " +
        "scan, one hash aggregation, four final divisions.",
      (s, dir) => {
        def cls(re: String) =
          length(col("text")) - length(regexp_replace(col("text"), re, ""))
        val d = Tables.t(s, dir, "documents")
          .select(col("source"),
            length(col("text")).cast("long").as("n_chars"),
            cls("[A-Z]").cast("long").as("n_upper"),
            cls("[0-9]").cast("long").as("n_digit"),
            cls("[ ]").cast("long").as("n_space"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            sum("n_upper").as("u"), sum("n_digit").as("g"), sum("n_space").as("sp"))
          .select(col("source"), col("n_docs"),
            round(col("u").cast("double") / col("chars"), 6).as("upper_share"),
            round(col("g").cast("double") / col("chars"), 6).as("digit_share"),
            round(col("sp").cast("double") / col("chars"), 6).as("space_share"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source,
            CAST(length(text) AS BIGINT) AS n_chars,
            CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
              AS BIGINT) AS n_upper,
            CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digit,
            CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
              AS BIGINT) AS n_space
          FROM documents)
        SELECT source, count(*) AS n_docs,
          round(CAST(sum(n_upper) AS BIGINT) / CAST(sum(n_chars) AS DOUBLE), 6)
            AS upper_share,
          round(CAST(sum(n_digit) AS BIGINT) / CAST(sum(n_chars) AS DOUBLE), 6)
            AS digit_share,
          round(CAST(sum(n_space) AS BIGINT) / CAST(sum(n_chars) AS DOUBLE), 6)
            AS space_share
        FROM d GROUP BY source ORDER BY source""")),

    Q(
      "text_llr_bigrams",
      "Dunning log-likelihood-ratio collocations — the significance-" +
        "backed companion to text_pmi_bigrams (PMI over-rewards rare " +
        "pairs; LLR scores the full 2×2 contingency of bigram vs " +
        "marginals, so high-frequency collocations rank honestly). " +
        "All four cell counts are exact integers from one tokenize " +
        "pass; each x·ln(x) term is a fixed-shape float evaluated " +
        "once per candidate; top-20 by LLR via TakeOrderedAndProject " +
        "with total tie-breaks.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "w")
        val wn = Window.partitionBy("doc_id").orderBy("pos")
        val pairs = tok
          .withColumn("prev", lag(col("w"), 1).over(wn))
          .filter(col("prev").isNotNull)
          .select("prev", "w")
        val big = pairs.groupBy("prev", "w").agg(count(lit(1)).as("k11"))
          .filter(col("k11") >= 5)
        val ca = pairs.groupBy("prev").agg(count(lit(1)).as("ca"))
        val cb = pairs.groupBy("w").agg(count(lit(1)).as("cb"))
        val nTot = pairs.agg(count(lit(1)).as("nn"))
        def xlx(c: Column): Column =
          when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(0.0)
        val k11 = col("k11"); val k12 = col("ca") - col("k11")
        val k21 = col("cb") - col("k11")
        val k22 = col("nn") - col("ca") - col("cb") + col("k11")
        val llr = (xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
          - xlx(col("ca")) - xlx(col("nn") - col("ca"))
          - xlx(col("cb")) - xlx(col("nn") - col("cb"))
          + xlx(col("nn"))) * 2.0
        big.join(ca, "prev").join(cb, "w")
          .crossJoin(broadcast(nTot))
          .withColumn("llr", llr)
          .orderBy(col("llr").desc, col("prev"), col("w"))
          .limit(20)
          .select(col("prev"), col("w"), col("k11").as("n_pair"),
            round(col("llr"), 4).as("llr"))
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w,
            CAST(generate_subscripts(string_split(text, ' '), 1) AS INT)
              AS pos
          FROM documents),
        pairs AS (
          SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
          FROM tok QUALIFY prev IS NOT NULL),
        big AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS k11
          FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5),
        ca AS (SELECT prev, CAST(count(*) AS BIGINT) AS ca
          FROM pairs GROUP BY 1),
        cb AS (SELECT w, CAST(count(*) AS BIGINT) AS cb
          FROM pairs GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pairs),
        f AS (SELECT big.prev, big.w, k11, ca, cb, nn,
            ca - k11 AS k12, cb - k11 AS k21, nn - ca - cb + k11 AS k22
          FROM big JOIN ca USING (prev) JOIN cb USING (w) CROSS JOIN nt),
        sc AS (SELECT prev, w, k11,
            2.0 * ((CASE WHEN k11 > 0 THEN k11 * ln(CAST(k11 AS DOUBLE))
                ELSE 0 END)
              + (CASE WHEN k12 > 0 THEN k12 * ln(CAST(k12 AS DOUBLE))
                ELSE 0 END)
              + (CASE WHEN k21 > 0 THEN k21 * ln(CAST(k21 AS DOUBLE))
                ELSE 0 END)
              + (CASE WHEN k22 > 0 THEN k22 * ln(CAST(k22 AS DOUBLE))
                ELSE 0 END)
              - (CASE WHEN ca > 0 THEN ca * ln(CAST(ca AS DOUBLE))
                ELSE 0 END)
              - (CASE WHEN nn - ca > 0 THEN (nn - ca)
                * ln(CAST(nn - ca AS DOUBLE)) ELSE 0 END)
              - (CASE WHEN cb > 0 THEN cb * ln(CAST(cb AS DOUBLE))
                ELSE 0 END)
              - (CASE WHEN nn - cb > 0 THEN (nn - cb)
                * ln(CAST(nn - cb AS DOUBLE)) ELSE 0 END)
              + nn * ln(CAST(nn AS DOUBLE))) AS llr
          FROM f)
        SELECT prev, w, k11 AS n_pair, round(llr, 4) AS llr
        FROM sc ORDER BY llr DESC, prev, w LIMIT 20""")),

    Q(
      "text_chi2_keywords",
      "Class-discriminative vocabulary — χ² of token document-" +
        "frequency against language over the presence/absence " +
        "contingency (the fastText-era feature-selection primitive: " +
        "which words identify a class). Document frequencies are " +
        "exact integers from one distinct-token pass; the per-" +
        "language χ² cell terms are fixed-shape floats summed " +
        "through the sorted fold; top-15 tokens by χ² with total " +
        "tie-breaks. A count floor (df ≥ 10) keeps rare-token noise " +
        "out, mirroring the PMI/LLR floors.",
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val dw = docs
          .select(col("doc_id"), col("lang"),
            explode(array_distinct(split(col("text"), " "))).as("w"))
        val df = dw.groupBy("lang", "w").agg(count(lit(1)).as("o"))
        val nl = docs.groupBy("lang").agg(count(lit(1)).as("ndl"))
        val nTot = docs.agg(count(lit(1)).as("nd"))
        val dfw = df.groupBy("w").agg(sum("o").as("dfw"))
          .filter(col("dfw") >= 10)
        // complete the (lang × token) grid so absent cells score too
        val grid = nl.crossJoin(dfw)
          .join(df, Seq("lang", "w"), "left")
          .withColumn("o", coalesce(col("o"), lit(0L)))
          .crossJoin(broadcast(nTot))
        val e = col("ndl").cast("double") * col("dfw") / col("nd")
        val ePrime = col("ndl").cast("double").minus(e)
        val cell = ((col("o") - e) * (col("o") - e) / e)
          .plus(((col("ndl") - col("o")) - ePrime)
            * ((col("ndl") - col("o")) - ePrime) / ePrime)
        grid
          .select(col("w"), col("dfw"), cell.as("cell"))
          .groupBy("w", "dfw")
          .agg(Stats.sfold(col("cell")).as("chi2"))
          .orderBy(col("chi2").desc, col("w"))
          .limit(15)
          .select(col("w"), col("dfw").as("df"), round(col("chi2"), 4).as("chi2"))
      },
      Some("""WITH dw AS (SELECT DISTINCT doc_id, lang,
            unnest(list_distinct(string_split(text, ' '))) AS w
          FROM documents),
        df AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS o
          FROM dw GROUP BY 1, 2),
        nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS ndl
          FROM documents GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        dfw AS (SELECT w, CAST(sum(o) AS BIGINT) AS dfw FROM df
          GROUP BY 1 HAVING CAST(sum(o) AS BIGINT) >= 10),
        grid AS (SELECT nl.lang, dfw.w, dfw.dfw, nl.ndl,
            coalesce(df.o, 0) AS o, nt.nd
          FROM nl CROSS JOIN dfw
          LEFT JOIN df ON df.lang = nl.lang AND df.w = dfw.w
          CROSS JOIN nt),
        cells AS (SELECT w, dfw,
            (o - CAST(ndl AS DOUBLE) * dfw / nd)
              * (o - CAST(ndl AS DOUBLE) * dfw / nd)
              / (CAST(ndl AS DOUBLE) * dfw / nd)
            + ((ndl - o) - (CAST(ndl AS DOUBLE)
                - CAST(ndl AS DOUBLE) * dfw / nd))
              * ((ndl - o) - (CAST(ndl AS DOUBLE)
                - CAST(ndl AS DOUBLE) * dfw / nd))
              / (CAST(ndl AS DOUBLE) - CAST(ndl AS DOUBLE) * dfw / nd)
              AS cell
          FROM grid),
        sc AS (SELECT w, dfw,
            list_reduce(list_sort(list(cell)), (a, b) -> a + b) AS chi2
          FROM cells GROUP BY 1, 2)
        SELECT w, dfw AS df, round(chi2, 4) AS chi2
        FROM sc ORDER BY chi2 DESC, w LIMIT 15""")),

    Q(
      "text_hapax_ratio",
      "Hapax legomena share per source — the fraction of each " +
        "source's vocabulary occurring exactly once (the lexical-" +
        "richness / OCR-noise indicator: clean prose sits near " +
        "Zipf's ~50%, templated spam far below, garbled text far " +
        "above). One tokenize pass → per-(source, token) counts → " +
        "per-source vocabulary and hapax counts; all integers until " +
        "the final ratio.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("c") === 1, 1).otherwise(0)).as("hapax"))
          .select(col("source"), col("vocab"), col("hapax"),
            round(col("hapax").cast("double") / col("vocab"), 6)
              .as("hapax_ratio"))
          .orderBy("source")
      },
      Some("""WITH tok AS (SELECT source,
            unnest(string_split(text, ' ')) AS w
          FROM documents),
        c AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2)
        SELECT source, CAST(count(*) AS BIGINT) AS vocab,
          CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
          round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS hapax_ratio
        FROM c GROUP BY source ORDER BY source""")),

    Q(
      "text_burstiness",
      "Token burstiness — variance-to-mean ratio of per-document " +
        "counts over the WHOLE corpus (zeros included): content " +
        "words cluster in the few documents about their topic " +
        "(VMR ≫ 1), function words spread Poisson-like (VMR ≈ 1). " +
        "The classic IR term-weighting diagnostic. Σk and Σk² are " +
        "exact integers over present docs only; the zero-count mass " +
        "needs no rows — it enters through the corpus doc count " +
        "riding a 1-row broadcast. Frequency floor ≥ 20; top-20 by " +
        "VMR with total tie-breaks.",
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val perDoc = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("k"))
        val nTot = docs.agg(count(lit(1)).as("nd"))
        val stats = perDoc.groupBy("w")
          .agg(sum("k").as("sk"), sum(col("k") * col("k")).as("skk"))
          .filter(col("sk") >= 20)
          .crossJoin(broadcast(nTot))
        val mean = col("sk").cast("double") / col("nd")
        val vmr = (col("skk").cast("double") / col("nd") - mean * mean) / mean
        stats
          .withColumn("vmr", vmr)
          .orderBy(col("vmr").desc, col("w"))
          .limit(20)
          .select(col("w"), col("sk").as("n_occ"), round(col("vmr"), 6).as("vmr"))
      },
      Some("""WITH perdoc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
          GROUP BY 1, 2),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        st AS (SELECT w, CAST(sum(k) AS BIGINT) AS sk,
            CAST(sum(k * k) AS BIGINT) AS skk
          FROM perdoc GROUP BY 1 HAVING CAST(sum(k) AS BIGINT) >= 20),
        sc AS (SELECT w, sk,
            (CAST(skk AS DOUBLE) / nd
              - (CAST(sk AS DOUBLE) / nd) * (CAST(sk AS DOUBLE) / nd))
              / (CAST(sk AS DOUBLE) / nd) AS vmr
          FROM st CROSS JOIN nt)
        SELECT w, sk AS n_occ, round(vmr, 6) AS vmr
        FROM sc ORDER BY vmr DESC, w LIMIT 20""")),

    Q(
      "text_lang_entropy",
      "Language-mix entropy per source — Shannon H over each " +
        "source's language shares (the corpus-diversity dial a " +
        "multilingual data mix is tuned against: H=0 is monolingual, " +
        "log2(k) is uniform). Counts are exact from one hash " +
        "aggregation; the −Σp·log2(p) terms are fixed-shape floats " +
        "summed through the sorted fold over ≤|langs| values.",
      (s, dir) => {
        val c = Tables.t(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        val t = c.groupBy("source").agg(sum("n").as("tot"),
          count(lit(1)).as("n_langs"))
        val p = col("n").cast("double") / col("tot")
        c.join(broadcast(t), "source")
          .select(col("source"), col("n_langs"),
            (p * log2(p) * -1.0).as("term"))
          .groupBy("source", "n_langs")
          .agg(graft.ops.Stats.sfold(col("term")).as("h"))
          .select(col("source"), col("n_langs"), round(col("h"), 4)
            .as("entropy_bits"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, lang, count(*) AS n
          FROM documents GROUP BY 1, 2),
        t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot,
            count(*) AS n_langs FROM c GROUP BY 1),
        terms AS (SELECT c.source, t.n_langs,
            -(CAST(c.n AS DOUBLE) / t.tot)
              * log2(CAST(c.n AS DOUBLE) / t.tot) AS term
          FROM c JOIN t USING (source))
        SELECT source, n_langs,
          round(list_reduce(list_sort(list(term)), (a, b) -> a + b), 4)
            AS entropy_bits
        FROM terms GROUP BY source, n_langs ORDER BY source""")),

    Q(
      "text_tfidf_pairs",
      "Lexical near-duplicate pairs by tf-idf cosine in the RARE-" +
        "token subspace — document pairs are candidates only if they " +
        "share a token appearing in ≤10% of documents AND in at most " +
        "200 documents absolute. The ABSOLUTE cap is the load-bearing " +
        "scale bound (added after the r14 full-registry sf1 audit " +
        "measured the relative-only gate at 438× cost for 10× data): " +
        "a fixed fraction of N is still O(N²) pair fan-out, while " +
        "df ≤ cap bounds per-token pair work at cap² and total work " +
        "at cap × corpus tokens — linear in the corpus, the same " +
        "posture as the LSH bucket join. Tokens above the cap are " +
        "useless near-dup discriminators anyway (they're boilerplate " +
        "by definition) and are exactly the hot keys a salted join " +
        "would otherwise have to absorb. Weights are tf·ln(N/df), " +
        "and both the pair dot product and the per-doc norms fold in " +
        "sorted order so no float summation depends on partitioning. " +
        "Top-10 pairs by cosine. Complements dedup_embedding_cosine " +
        "(semantic space) with the lexical-overlap space.",
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val tok = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val nTot = docs.agg(count(lit(1)).as("nd"))
        val df = tok.groupBy("w").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nTot))
          .filter(col("df") >= 2 && col("df") * 10 <= col("nd") &&
            col("df") <= 200)
          .select("w", "df")
        val wt = tok.join(df, "w").crossJoin(broadcast(nTot))
          .select(col("doc_id"), col("w"),
            (col("tf").cast("double")
              * log(col("nd").cast("double") / col("df"))).as("wt"))
        val norms = wt.groupBy("doc_id")
          .agg(sqrt(graft.ops.Stats.sfold(col("wt") * col("wt"))).as("nn"))
        val dots = wt.as("a").join(wt.as("b"),
            col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            (col("a.wt") * col("b.wt")).as("p"))
          .groupBy("d1", "d2")
          .agg(graft.ops.Stats.sfold(col("p")).as("dot"),
            count(lit(1)).as("n_shared"))
        dots
          .join(norms.select(col("doc_id").as("d1"), col("nn").as("n1")), "d1")
          .join(norms.select(col("doc_id").as("d2"), col("nn").as("n2")), "d2")
          .select(col("d1"), col("d2"), col("n_shared"),
            round(col("dot") / (col("n1") * col("n2")), 6).as("cos"))
          .orderBy(col("cos").desc, col("d1"), col("d2"))
          .limit(10)
      },
      Some("""WITH tok AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
          GROUP BY 1, 2),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        df AS (SELECT w, count(*) AS df FROM tok CROSS JOIN nt GROUP BY 1, nd
          HAVING count(*) >= 2 AND count(*) * 10 <= nd AND count(*) <= 200),
        wt AS (SELECT doc_id, tok.w,
            CAST(tf AS DOUBLE) * ln(CAST(nd AS DOUBLE) / df.df) AS wt
          FROM tok JOIN df ON tok.w = df.w CROSS JOIN nt),
        norms AS (SELECT doc_id,
            sqrt(list_reduce(list_sort(list(wt * wt)), (x, y) -> x + y))
              AS nn
          FROM wt GROUP BY 1),
        dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
            list_reduce(list_sort(list(a.wt * b.wt)), (x, y) -> x + y)
              AS dot,
            count(*) AS n_shared
          FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT d1, d2, n_shared,
          round(dot / (na.nn * nb.nn), 6) AS cos
        FROM dots
        JOIN norms na ON na.doc_id = d1
        JOIN norms nb ON nb.doc_id = d2
        ORDER BY cos DESC, d1, d2 LIMIT 10""")),

    Q(
      "sample_balanced",
      "Class-balanced downsampling — every language keeps exactly " +
        "min-class-size documents, chosen by deterministic hash " +
        "order (the rebalancing step before training a classifier on " +
        "skewed classes; sample_stratified keeps proportions, THIS " +
        "equalizes them). The floor is a 1-row broadcast; the " +
        "keep-set is a per-class rank over the engine-portable md5 " +
        "race key — ridden on [[Skew.groupedRank]] (range-partitioned " +
        "per-group rank + broadcast offsets, not a 5-way class " +
        "window) — so the same documents win in any engine at " +
        "any parallelism. Output: per-class before/after (after is " +
        "constant by construction — that IS the property).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            PortableHash.hexHash(
              concat(lit("bal:"), col("doc_id").cast("string"))).as("hk"))
        val m = d.groupBy("lang").agg(count(lit(1)).as("n"))
          .agg(min("n").as("m"))
        Skew.groupedRank(d, Seq("lang"), Seq(col("hk"), col("doc_id")),
            rankCol = "rk")
          .crossJoin(broadcast(m))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_orig"),
            sum(when(col("rk") <= col("m"), 1).otherwise(0)).as("n_kept"))
          .orderBy("lang")
      },
      Some("""WITH d AS (SELECT doc_id, lang,
            CAST(('0x' || substring(md5('bal:' || CAST(doc_id AS VARCHAR)),
              1, 8)) AS BIGINT) AS hk
          FROM documents),
        m AS (SELECT min(n) AS m FROM
          (SELECT lang, count(*) AS n FROM d GROUP BY 1)),
        rk AS (SELECT lang,
            row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id)
              AS rk
          FROM d)
        SELECT lang, count(*) AS n_orig,
          CAST(sum(CASE WHEN rk <= m THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept
        FROM rk CROSS JOIN m
        GROUP BY lang ORDER BY lang""")),

    Q(
      "text_topk_coverage",
      "Vocabulary concentration — the share of total token mass " +
        "covered by the top-10/25/50 tokens (the tokenizer-sizing " +
        "curve between text_zipf_fit's exponent and text_heaps_law's " +
        "growth: how small a vocab still covers the stream). The " +
        "top-50 head comes from TakeOrderedAndProject (never a " +
        "global sort of the vocabulary); its cumulative masses fold " +
        "over one bounded sorted array; the total mass is a 1-row " +
        "broadcast. All integer counts until the three final shares.",
      (s, dir) => {
        val cnt = Tables.t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val tot = cnt.agg(sum("c").as("tc"))
        val top = cnt.orderBy(col("c").desc, col("w")).limit(50)
          .agg(sort_array(collect_list(struct(
            (col("c") * -1).as("nc"), col("w"))))
            .as("arr"))
        def mass(k: Int): Column =
          expr(s"aggregate(slice(arr, 1, $k), CAST(0 AS BIGINT), " +
            "(acc, x) -> acc - x.nc)")
        top.crossJoin(broadcast(tot))
          .select(explode(array(
            struct(lit(10).as("k"), (mass(10).cast("double") / col("tc")).as("cov")),
            struct(lit(25).as("k"), (mass(25).cast("double") / col("tc")).as("cov")),
            struct(lit(50).as("k"), (mass(50).cast("double") / col("tc")).as("cov"))))
            .as("s"))
          .select(col("s.k").as("k"), round(col("s.cov"), 6).as("coverage"))
          .orderBy("k")
      },
      Some("""WITH cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM cnt),
        top AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk
          FROM cnt ORDER BY c DESC, w LIMIT 50),
        ks AS (SELECT unnest([10, 25, 50]) AS k)
        SELECT CAST(k AS INT) AS k,
          round(CAST((SELECT CAST(sum(c) AS BIGINT) FROM top
              WHERE rk <= k) AS DOUBLE)
            / tc, 6) AS coverage
        FROM ks CROSS JOIN tot ORDER BY k""")),

    Q(
      "text_cond_entropy",
      "Conditional word entropy H(w|prev) = H(bigram) \u2212 H(prev-" +
        "marginal) \u2014 the bits a first-order word LM still needs " +
        "after seeing one token of context (the corpus-level " +
        "compressibility/memorization dial; its gap below the " +
        "unigram entropy is exactly text_pmi_bigrams' average " +
        "mutual information). All three entropies reduce exact " +
        "integer counts through sorted folds; one tokenize pass " +
        "feeds every table; perplexity = 2^H rides along.",
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "w")
        val wn = Window.partitionBy("doc_id").orderBy("pos")
        val pairs = tok
          .withColumn("prev", lag(col("w"), 1).over(wn))
          .filter(col("prev").isNotNull)
          .select("prev", "w")
        def ent(df: org.apache.spark.sql.DataFrame,
            keys: Seq[String], outName: String) = {
          val c = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
          val t = c.agg(sum("c").as("tc"))
          val pcol = col("c").cast("double") / col("tc")
          c.crossJoin(broadcast(t))
            .select((pcol * log2(pcol) * -1.0).as("term"))
            .agg(graft.ops.Stats.sfold(col("term")).as(outName))
        }
        val h2 = ent(pairs, Seq("prev", "w"), "h2")
        val hp = ent(pairs.select("prev"), Seq("prev"), "hp")
        val h1 = ent(tok.select("w"), Seq("w"), "h1")
        h2.crossJoin(broadcast(hp)).crossJoin(broadcast(h1))
          .select(round(col("h1"), 4).as("h_unigram"),
            round(col("h2"), 4).as("h_bigram"),
            round(col("h2") - col("hp"), 4).as("h_cond"),
            round(pow(lit(2.0), col("h2") - col("hp")), 2)
              .as("perplexity"))
          .orderBy("h_unigram")
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w,
            CAST(generate_subscripts(string_split(text, ' '), 1) AS INT)
              AS pos
          FROM documents),
        pairs AS (
          SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
          FROM tok QUALIFY prev IS NOT NULL),
        c2 AS (SELECT prev, w, count(*) AS c FROM pairs GROUP BY 1, 2),
        t2 AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM c2),
        h2 AS (SELECT list_reduce(list_sort(list(
            -(CAST(c AS DOUBLE) / tc) * log2(CAST(c AS DOUBLE) / tc))),
            (a, b) -> a + b) AS h2
          FROM c2 CROSS JOIN t2),
        cp AS (SELECT prev, count(*) AS c FROM pairs GROUP BY 1),
        tp AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM cp),
        hp AS (SELECT list_reduce(list_sort(list(
            -(CAST(c AS DOUBLE) / tc) * log2(CAST(c AS DOUBLE) / tc))),
            (a, b) -> a + b) AS hp
          FROM cp CROSS JOIN tp),
        c1 AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
        t1 AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM c1),
        h1 AS (SELECT list_reduce(list_sort(list(
            -(CAST(c AS DOUBLE) / tc) * log2(CAST(c AS DOUBLE) / tc))),
            (a, b) -> a + b) AS h1
          FROM c1 CROSS JOIN t1)
        SELECT round(h1, 4) AS h_unigram, round(h2, 4) AS h_bigram,
          round(h2 - hp, 4) AS h_cond,
          round(pow(2.0, h2 - hp), 2) AS perplexity
        FROM h2 CROSS JOIN hp CROSS JOIN h1
        ORDER BY h_unigram""")),

    Q(
      "text_textrank_keywords",
      s"TextRank keyword extraction — PageRank ($TrIterations " +
        "damped iterations) over the adjacency co-occurrence graph of " +
        "the frozen top-$TrVocab vocabulary (count-desc, token " +
        "tie-break — the text_oov_rate trick that bounds the graph at " +
        "any corpus size): the graph-centrality alternative to the " +
        "frequency heuristics of text_rake_keywords / " +
        "text_chi2_keywords, surfacing words that sit on many " +
        "co-occurrence paths rather than merely occurring often. " +
        "Edges are adjacent-token pairs with both ends in vocab " +
        "(weight = pair count, symmetrized); each iteration is one " +
        "co-partitioned join + per-node sorted fold (≤|vocab| terms, " +
        "bit-deterministic); the oracle unrolls the identical " +
        "weighted power iteration. Top-20 by final score.",
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
        val vocab = toks.select(explode(col("ws")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("w")).limit(TrVocab)
          .select("w")
        val pairsRaw = toks.filter(size(col("ws")) >= 2).select(explode(expr(
            "transform(sequence(1, size(ws) - 1), i -> " +
              "struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .filter(col("a") =!= col("b"))
        val und = pairsRaw
          .join(broadcast(vocab.select(col("w").as("a"))), Seq("a"), "left_semi")
          .join(broadcast(vocab.select(col("w").as("b"))), Seq("b"), "left_semi")
          .select(least(col("a"), col("b")).as("x"),
            greatest(col("a"), col("b")).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("wt"))
        val edges = und.select(col("x").as("src"), col("y").as("dst"), col("wt"))
          .union(und.select(col("y").as("src"), col("x").as("dst"), col("wt")))
        val outw = edges.groupBy("src").agg(sum(col("wt")).as("ow"))
        val norm = edges.join(outw, "src")
          .select(col("src"), col("dst"), (col("wt").cast("double") / col("ow")).as("p"))
          .transform(Skew.cut)
        val nodes = norm.select(col("src").as("word")).distinct()
          .transform(Skew.cut)
        val nN = nodes.agg(count(lit(1)).as("nn"))
        var ranks = nodes.crossJoin(broadcast(nN))
          .select(col("word"), (lit(1.0) / col("nn")).as("score"))
        for (_ <- 1 to TrIterations) {
          val contrib = ranks.join(norm, ranks("word") === norm("src"))
            .groupBy(col("dst").as("word"))
            .agg(Stats.sfold(col("score") * col("p")).as("cs"))
          ranks = nodes.join(contrib, Seq("word"), "left")
            .crossJoin(broadcast(nN))
            .select(col("word"),
              (lit(0.15) / col("nn") +
                lit(0.85) * coalesce(col("cs"), lit(0.0))).as("score"))
            .transform(Skew.cut)
        }
        ranks.orderBy(col("score").desc, col("word")).limit(20)
          .select(col("word"), round(col("score"), 6).as("textrank"))
      },
      Some(textrankSql))
  )

  private val TrIterations = 5
  private val TrVocab = 100

  /** Unrolled weighted-PageRank oracle for [[text_textrank_keywords]]:
    * same frozen vocab, same symmetrized adjacency edges, same damped
    * iteration with sorted-fold contributions. */
  private def textrankSql: String = {
    val steps = (1 to TrIterations).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
        SELECT n.word,
          CAST(0.15 AS DOUBLE) / (SELECT nn FROM nn)
            + 0.85 * coalesce(c.cs, 0.0) AS score
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS word,
            list_reduce(list_sort(list(r.score * e.p)), (x, y) -> x + y)
              AS cs
          FROM $prev r JOIN norm e ON e.src = r.word GROUP BY 1) c
        USING (word))"""
    }.mkString(",\n")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents),
      vocab AS MATERIALIZED (SELECT w FROM (
          SELECT w, row_number() OVER (
            ORDER BY CAST(sum(c) AS BIGINT) DESC, w) AS rk
          FROM (SELECT unnest(ws) AS w, 1 AS c FROM toks) GROUP BY w)
        WHERE rk <= $TrVocab),
      pairs AS (SELECT u.p.a AS a, u.p.b AS b
        FROM toks, unnest(list_transform(range(1, len(ws)), i ->
          struct_pack(a := ws[CAST(i AS INT)],
            b := ws[CAST(i + 1 AS INT)]))) u(p)
        WHERE u.p.a <> u.p.b),
      und AS MATERIALIZED (SELECT least(a, b) AS x, greatest(a, b) AS y,
          count(*) AS wt
        FROM pairs
        WHERE a IN (SELECT w FROM vocab) AND b IN (SELECT w FROM vocab)
        GROUP BY 1, 2),
      edges AS (SELECT x AS src, y AS dst, wt FROM und
        UNION ALL SELECT y, x, wt FROM und),
      outw AS (SELECT src, CAST(sum(wt) AS BIGINT) AS ow
        FROM edges GROUP BY 1),
      norm AS MATERIALIZED (SELECT e.src, e.dst,
          CAST(e.wt AS DOUBLE) / o.ow AS p
        FROM edges e JOIN outw o USING (src)),
      nodes AS MATERIALIZED (SELECT DISTINCT src AS word FROM norm),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
      r0 AS (SELECT word,
        CAST(1.0 AS DOUBLE) / (SELECT nn FROM nn) AS score FROM nodes),
      $steps
      SELECT word, round(score, 6) AS textrank
      FROM r$TrIterations
      ORDER BY score DESC, word LIMIT 20"""
  }

  /** Per-document unigram LM bits-per-token — (doc_id, n_tok,
    * bits_per_token), unordered. The dataflow behind
    * text_unigram_logprob, factored out so text_perplexity_buckets can
    * bucket the same scores without re-stating it: token join against
    * the (vocabulary-sized, broadcast) frequency table, corpus total as
    * a 1-row cross join, per-doc double sum as a sorted sequential fold
    * (sort_array + aggregate ≡ DuckDB list_sort + list_reduce) so the
    * value is bit-identical under any partial-aggregation order. */
  private[ops] def unigramBits(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("n"))
    val total = tok.agg(count(lit(1)).as("t"))
    // one addend per (doc, token-type): c·ln(n/t); folding per
    // token type (vocab-bounded per doc) instead of per occurrence
    // also shrinks the collected array
    tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .join(broadcast(freq), "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("c"),
        (col("c").cast("double") *
          log(col("n") / col("t").cast("double"))).as("x"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"), sort_array(collect_list(col("x"))).as("xs"))
      .select(col("doc_id"), col("n_tok"),
        round(-aggregate(col("xs"), lit(0.0), (acc, x) => acc + x) /
          col("n_tok") / math.log(2.0), 6).as("bits_per_token"))
  }

  /** DuckDB CTE chain ending in `ub(doc_id, n_tok, bits_per_token)` ≡
    * [[unigramBits]] (same sorted fold, same BIGINT cast). */
  private[ops] val unigramBitsCtes: String =
    """tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        freq AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
        tot AS (SELECT count(*) AS t FROM tok),
        cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        terms AS (
          SELECT doc_id, c,
            CAST(c AS DOUBLE) * ln(freq.n / CAST(tot.t AS DOUBLE)) AS x
          FROM cnt JOIN freq USING (token) CROSS JOIN tot),
        uagg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
            list_reduce(list_sort(list(x)), (a, b) -> a + b) AS sx
          FROM terms GROUP BY doc_id),
        ub AS (
          SELECT doc_id, n_tok, round(-sx / n_tok / ln(2), 6) AS bits_per_token
          FROM uagg)"""

  /** DuckDB replay of the full BPE training loop, one CTE stage per
    * merge round: pair counts from the evolving vocabulary, the
    * ORDER BY freq DESC, l, r LIMIT 1 argmax (the same total
    * tie-break the trainer uses), and the greedy left-to-right merge
    * fold applied with the round's winner row in scope. Pure
    * integer/string/array ops — the whole training trajectory is
    * bit-replayable. */
  private def bpeMergesOracle(nMerges: Int): String = {
    val stages = (1 to nMerges).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS (
         SELECT u.l AS l, u.r AS r, CAST(sum(freq) AS BIGINT) AS pair_freq FROM (
           SELECT freq, unnest(list_transform(range(1, len(units)),
             i -> struct_pack(l := units[CAST(i AS INT)],
                              r := units[CAST(i + 1 AS INT)]))) AS u
           FROM $prev) GROUP BY 1, 2),
       w$k AS (SELECT l, r, pair_freq FROM p$k
         ORDER BY pair_freq DESC, l, r LIMIT 1),
       v$k AS (SELECT word, freq,
           ${TextFns.applyMergeSql("units", "w.l", "w.r")} AS units
         FROM $prev CROSS JOIN w$k w)"""
    }
    val finals = (1 to nMerges).map(k =>
      s"SELECT CAST($k AS INT) AS step, l, r, pair_freq FROM w$k")
    s"""WITH v0 AS (
        SELECT word, count(*) AS freq,
          list_filter(string_split(word, ''), u -> len(u) > 0) AS units
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word),
      ${stages.mkString(", ")}
      ${finals.mkString(" UNION ALL ")} ORDER BY step"""
  }
}
