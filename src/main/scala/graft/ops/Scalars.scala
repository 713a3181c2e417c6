package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scalar expression families (SURVEY.md §2B): string, date/time, math,
  * conditional, array + higher-order functions, JSON, and the generator
  * (explode) surface. All built-in `functions._` — every expression stays
  * inside whole-stage codegen; no UDFs anywhere. */
object Scalars {

  def defs: Seq[Q] = Seq(

    Q(
      "scalar_string",
      "String family: case, substring, length, concat_ws, split/element " +
        "access, regexp_replace, regexp_extract.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.select(
            col("doc_id"),
            upper(col("lang")).as("lang_u"),
            substring(col("text"), 1, 12).as("prefix"),
            length(col("text")).as("len"),
            concat_ws("-", col("lang"), col("source")).as("tag"),
            element_at(split(col("text"), " "), 1).as("first_tok"),
            regexp_replace(col("source"), "src", "S").as("src_s"),
            regexp_extract(col("text"), "(ta[a-z]+)", 1).as("first_ta"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, upper(lang) AS lang_u,
        substring(text, 1, 12) AS prefix,
        CAST(length(text) AS INT) AS len,
        concat_ws('-', lang, source) AS tag,
        string_split(text, ' ')[1] AS first_tok,
        regexp_replace(source, 'src', 'S') AS src_s,
        coalesce(regexp_extract(text, '(ta[a-z]+)', 1), '') AS first_ta
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_datetime",
      "Date/time family: extract parts, truncation, date arithmetic, " +
        "epoch conversion. dayofweek aligned (Spark is 1=Sunday, DuckDB " +
        "0=Sunday). All UTC both engines.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"),
            month(col("o_orderdate")).as("mo"),
            dayofweek(col("o_orderdate")).as("dow"),
            date_trunc("month", col("o_orderdate")).as("mon_start"),
            to_date(col("o_orderdate")).as("d"),
            date_add(to_date(col("o_orderdate")), 30).as("d30"),
            datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"),
            Tables.epochUs(col("o_orderdate")).as("eus"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y,
        CAST(quarter(o_orderdate) AS INT) AS q,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        CAST(o_orderdate AS DATE) AS d,
        CAST(o_orderdate AS DATE) + 30 AS d30,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        epoch_us(o_orderdate) AS eus
        FROM orders ORDER BY o_orderkey""")),

    Q(
      "scalar_math",
      "Math family: abs, floor/ceil, sqrt (IEEE-exact), modulo, exact " +
        "integer arithmetic, greatest/least, ln rounded to 6 (applied to " +
        "the final value, so last-ulp libm skew cannot flip it).",
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
        p.select(
            col("p_partkey"),
            abs(col("p_size") - 25).as("size_dev"),
            floor(col("p_retailprice")).as("floor_p"),
            ceil(col("p_retailprice")).as("ceil_p"),
            sqrt(col("p_retailprice")).as("sqrt_p"),
            pmod(col("p_size"), lit(7)).as("size_mod"),
            (col("p_size").cast("long") * col("p_size")).as("size_sq"),
            greatest(col("p_size"), lit(10)).as("size_min10"),
            round(log(col("p_retailprice")), 6).as("ln_p"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
        abs(p_size - 25) AS size_dev,
        CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
        CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
        sqrt(p_retailprice) AS sqrt_p,
        p_size % 7 AS size_mod,
        CAST(p_size AS BIGINT) * p_size AS size_sq,
        CAST(greatest(p_size, 10) AS INT) AS size_min10,
        round(ln(p_retailprice), 6) AS ln_p
        FROM part ORDER BY p_partkey""")),

    Q(
      "scalar_case",
      "Conditional projection: CASE WHEN ladder + null-producing branch.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.select(
            col("o_orderkey"),
            when(col("o_orderpriority").startsWith("1") || col("o_orderpriority").startsWith("2"), "high")
              .when(col("o_orderpriority").startsWith("3"), "mid")
              .otherwise("low").as("prio_class"),
            when(col("o_orderstatus") === "F", col("o_totalprice")).as("f_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 'high'
             WHEN o_orderpriority LIKE '3%' THEN 'mid'
             ELSE 'low' END AS prio_class,
        CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price
        FROM orders ORDER BY o_orderkey""")),

    Q(
      "scalar_predicates",
      "Compound predicates: IN-list, IS NULL-safe logic, LIKE, rlike; " +
        "all pushed into the parquet scan where the source supports it.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.filter(
            col("o_orderstatus").isin("F", "P") &&
            col("o_orderpriority").like("%URGENT%") === false &&
            col("o_orderpriority").rlike("^[1-3]-") &&
            col("o_totalprice").isNotNull)
          .select("o_orderkey", "o_orderstatus", "o_orderpriority")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        WHERE o_orderstatus IN ('F', 'P')
          AND NOT (o_orderpriority LIKE '%URGENT%')
          AND regexp_matches(o_orderpriority, '^[1-3]-')
          AND o_totalprice IS NOT NULL
        ORDER BY o_orderkey""")),

    Q(
      "scalar_array_hof",
      "Array family + higher-order functions: size, distinct-size, " +
        "slice, transform, aggregate (fold), contains, sorted distinct. " +
        "Array-valued outputs are emitted through a canonical '|'-joined " +
        "encoding (concat_ws ≡ DuckDB array_to_string) — the harness " +
        "comparator sorts result frames and cannot order raw arrays; the " +
        "HOF computation itself is unchanged underneath the join.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("words"))
        val w = col("words")
        d.select(
            col("doc_id"),
            size(w).as("n_words"),
            size(array_distinct(w)).as("n_uniq"),
            concat_ws("|", slice(w, 1, 3)).as("first3"),
            concat_ws("|", transform(slice(w, 1, 3), t => upper(t))).as("first3_u"),
            aggregate(w, lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
            array_contains(w, "spark").as("has_spark"),
            concat_ws("|", sort_array(array_distinct(w))).as("vocab"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
          CAST(len(words) AS INT) AS n_words,
          CAST(len(list_distinct(words)) AS INT) AS n_uniq,
          coalesce(array_to_string(words[1:3], '|'), '') AS first3,
          coalesce(array_to_string(list_transform(words[1:3], w -> upper(w)), '|'), '') AS first3_u,
          list_reduce(list_transform(words, w -> CAST(length(w) AS BIGINT)), (a, b) -> a + b) AS total_chars,
          list_contains(words, 'spark') AS has_spark,
          coalesce(array_to_string(list_sort(list_distinct(words)), '|'), '') AS vocab
        FROM d ORDER BY doc_id""")),

    Q(
      "scalar_json",
      "JSON family over events.props: get_json_object path extraction, " +
        "schema-applied from_json, missing-path null.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        e.select(
            col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int"),
            from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
              .getField("k").as("k_typed"),
            get_json_object(col("props"), "$.missing").as("missing"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
        json_extract_string(props, '$.missing') AS missing
        FROM events ORDER BY event_id""")),

    Q(
      "scalar_string2",
      "Second string family: pad, reverse, repeat, translate, " +
        "contains/startsWith/endsWith predicates.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.select(
            col("doc_id"),
            lpad(col("lang"), 5, "*").as("lang_lpad"),
            rpad(col("source"), 8, "-").as("src_rpad"),
            reverse(col("lang")).as("lang_rev"),
            repeat(col("lang"), 3).as("lang_x3"),
            translate(col("source"), "src", "SRC").as("src_tr"),
            col("text").contains("table").as("has_table"),
            col("source").startsWith("src1").as("is_src1x"),
            col("lang").endsWith("n").as("ends_n"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        lpad(lang, 5, '*') AS lang_lpad,
        rpad(source, 8, '-') AS src_rpad,
        reverse(lang) AS lang_rev,
        repeat(lang, 3) AS lang_x3,
        translate(source, 'src', 'SRC') AS src_tr,
        contains(text, 'table') AS has_table,
        starts_with(source, 'src1') AS is_src1x,
        ends_with(lang, 'n') AS ends_n
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_struct",
      "Struct family: construction (named_struct), nested field access. " +
        "The struct column is emitted as canonical JSON (to_json ≡ " +
        "DuckDB to_json over struct_pack — both compact, key-ordered by " +
        "construction) so the harness comparator can sort it; the struct " +
        "construction and field access stay under test.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val st = struct(col("lang").as("lang"), col("n_chars").as("n"))
        d.select(
            col("doc_id"),
            to_json(st).as("meta"),
            st.getField("lang").as("meta_lang"),
            (st.getField("n") + 1).as("n_plus"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(to_json(struct_pack(lang := lang, n := n_chars)) AS VARCHAR) AS meta,
        lang AS meta_lang,
        n_chars + 1 AS n_plus
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_array_setops",
      "Array set operations between the two halves of each document's " +
        "token list: sorted intersect / union / except (sorting removes " +
        "the engines' differing element-order conventions).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("words"))
        val half = (size(col("words")) / 2).cast("int")
        val d2 = d.select(col("doc_id"),
          slice(col("words"), lit(1), half).as("w1"),
          slice(col("words"), half + 1, size(col("words"))).as("w2"))
        d2.select(
            col("doc_id"),
            concat_ws("|", sort_array(array_distinct(array_intersect(col("w1"), col("w2"))))).as("common"),
            concat_ws("|", sort_array(array_distinct(array_union(col("w1"), col("w2"))))).as("all_toks"),
            concat_ws("|", sort_array(array_distinct(array_except(col("w1"), col("w2"))))).as("only_first"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        h AS (SELECT doc_id,
            words[1:CAST(len(words) // 2 AS INT)] AS w1,
            words[CAST(len(words) // 2 AS INT) + 1:] AS w2
          FROM d)
        SELECT doc_id,
          coalesce(array_to_string(list_sort(list_distinct(list_intersect(w1, w2))), '|'), '') AS common,
          coalesce(array_to_string(list_sort(list_distinct(w1 || w2)), '|'), '') AS all_toks,
          coalesce(array_to_string(list_sort(list_distinct(list_filter(w1, x -> NOT list_contains(w2, x)))), '|'), '') AS only_first
        FROM h ORDER BY doc_id""")),

    Q(
      "scalar_map",
      "Map family: map construction, map_keys/map_values (insertion " +
        "order both engines), element_at lookups incl. a missing key.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val m = map_from_arrays(
          array(lit("lang"), lit("source")),
          array(col("lang"), col("source")))
        d.select(
            col("doc_id"),
            concat_ws("|", map_keys(m)).as("ks"),
            concat_ws("|", map_values(m)).as("vs"),
            element_at(m, "lang").as("lang_v"),
            element_at(m, "nope").as("missing_v"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, MAP(['lang','source'], [lang, source]) AS m
          FROM documents)
        SELECT doc_id,
          array_to_string(map_keys(m), '|') AS ks,
          array_to_string(map_values(m), '|') AS vs,
          m['lang'][1] AS lang_v, m['nope'][1] AS missing_v
        FROM d ORDER BY doc_id""")),

    Q(
      "scalar_array_flatten_zip",
      "flatten of nested arrays + zip_with fold: flatten recombines two " +
        "slices; zip_with pairs per-token lengths with 1-based positions " +
        "and aggregate folds the products (position-weighted length).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("words"))
        val w = col("words")
        d.select(
            col("doc_id"),
            concat_ws("|", flatten(array(slice(w, 1, 2), slice(w, 3, 2)))).as("first4_flat"),
            aggregate(
              zip_with(
                transform(w, t => length(t).cast("long")),
                sequence(lit(1L), size(w).cast("long")),
                (l, p) => l * p),
              lit(0L), (acc, x) => acc + x).as("pos_weighted_len"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
          coalesce(array_to_string(flatten([words[1:2], words[3:4]]), '|'), '') AS first4_flat,
          list_reduce(
            list_transform(
              list_zip(list_transform(words, w -> CAST(length(w) AS BIGINT)),
                       range(1, len(words) + 1)),
              x -> x[1] * x[2]),
            (a, b) -> a + b) AS pos_weighted_len
        FROM d ORDER BY doc_id""")),

    Q(
      "scalar_json_schema",
      "schema_of_json DDL inference (foldable sample — Catalyst " +
        "requirement) plus per-row json_object_keys and " +
        "json_array_length.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        e.select(
            col("event_id"),
            schema_of_json(lit("""{"k": 87}""")).as("props_schema"),
            concat_ws("|", json_object_keys(col("props"))).as("prop_keys"),
            json_array_length(lit("[1,2,3]")).as("arr_len"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        'STRUCT<k: BIGINT>' AS props_schema,
        array_to_string(json_keys(props), '|') AS prop_keys,
        CAST(json_array_length('[1,2,3]') AS INT) AS arr_len
        FROM events ORDER BY event_id""")),

    Q(
      "map_explode",
      "explode of a map column into (key, value) rows — the " +
        "map-generator surface completing the map family.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val m = map_from_arrays(
          array(lit("lang"), lit("source")),
          array(col("lang"), col("source")))
        d.select(col("doc_id"), explode(m))
          .select(col("doc_id"), col("key"), col("value"))
          .orderBy("doc_id", "key")
      },
      Some("""SELECT doc_id, 'lang' AS "key", lang AS "value" FROM documents
        UNION ALL SELECT doc_id, 'source' AS "key", source AS "value" FROM documents
        ORDER BY doc_id, "key"""")),

    Q(
      "scalar_hash",
      "Cryptographic digest family over the document text: md5, " +
        "sha2-256, lower-hex byte encoding, base64 — the content-" +
        "fingerprint primitives the exact-dedup path builds on. " +
        "(xxhash64/crc32 exist too but are Spark-specific seeds — " +
        "covered by spec, not oracle.)",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.select(
            col("doc_id"),
            md5(col("text")).as("text_md5"),
            sha2(col("text"), 256).as("text_sha256"),
            lower(hex(substring(col("text"), 1, 8))).as("prefix_hex"),
            base64(substring(col("text"), 1, 8).cast("binary")).as("prefix_b64"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        md5(text) AS text_md5,
        sha256(text) AS text_sha256,
        lower(hex(substring(text, 1, 8))) AS prefix_hex,
        to_base64(CAST(substring(text, 1, 8) AS BLOB)) AS prefix_b64
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_bitwise",
      "Bitwise scalar family: AND/OR/XOR/NOT, shifts, popcount — all " +
        "exact integer ops, codegen'd. The sort adds pk_not (a " +
        "bijection of l_partkey) because the fixture's (orderkey, " +
        "linenumber) is NOT unique — a two-key sort leaves tie order " +
        "engine-defined (the r15 sf1 sweep caught the swap), and with " +
        "the discriminator tied rows are identical rows.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        li.select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_partkey").bitwiseAND(255)).as("pk_and"),
            (col("l_partkey").bitwiseOR(16)).as("pk_or"),
            (col("l_partkey").bitwiseXOR(85)).as("pk_xor"),
            bitwise_not(col("l_partkey")).as("pk_not"),
            shiftleft(col("l_linenumber"), 3).as("ln_shl"),
            shiftright(col("l_partkey"), 2).as("pk_shr"),
            bit_count(col("l_partkey")).as("pk_bits"))
          .orderBy("l_orderkey", "l_linenumber", "pk_not")
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_partkey & 255 AS pk_and,
        l_partkey | 16 AS pk_or,
        xor(l_partkey, 85) AS pk_xor,
        ~l_partkey AS pk_not,
        CAST(l_linenumber << 3 AS INT) AS ln_shl,
        l_partkey >> 2 AS pk_shr,
        CAST(bit_count(l_partkey) AS INT) AS pk_bits
        FROM lineitem ORDER BY l_orderkey, l_linenumber, pk_not""")),

    Q(
      "scalar_string3",
      "Third string family: edit distance (levenshtein), position/" +
        "instr search, split_part field extraction, left/right slices, " +
        "ascii/chr codec.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.select(
            col("doc_id"),
            levenshtein(col("lang"), col("source")).as("lev_ls"),
            instr(col("text"), "table").as("pos_table"),
            split_part(col("source"), lit("c"), lit(2)).as("after_c"),
            expr("left(text, 6)").as("head6"),
            expr("right(text, 4)").as("tail4"),
            ascii(col("lang")).as("lang_ascii"),
            chr(col("doc_id") % 26 + 65).as("doc_chr"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(levenshtein(lang, source) AS INT) AS lev_ls,
        CAST(instr(text, 'table') AS INT) AS pos_table,
        split_part(source, 'c', 2) AS after_c,
        "left"(text, 6) AS head6,
        "right"(text, 4) AS tail4,
        CAST(ascii(lang) AS INT) AS lang_ascii,
        chr(CAST(doc_id % 26 + 65 AS INT)) AS doc_chr
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_regex_family",
      "Extended regex family: regexp_count, regexp_substr (null on " +
        "miss), capture-group backreference rewrite (Spark `$1` ≡ " +
        "DuckDB `\\1`), regexp_extract_all joined canonically.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.select(
            col("doc_id"),
            regexp_count(col("text"), lit("[aeiou]{2}")).as("n_vowel_pairs"),
            regexp_substr(col("text"), lit("s[a-z]{3}")).as("first_s4"),
            regexp_replace(col("source"), "([a-z]+)([0-9]+)", "$2_$1").as("src_flipped"),
            concat_ws("|", regexp_extract_all(col("text"), lit("\\b[a-z]{3}\\b"), lit(0))).as("three_letter_words"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[aeiou]{2}', 0)) AS INT) AS n_vowel_pairs,
        nullif(regexp_extract(text, 's[a-z]{3}', 0), '') AS first_s4,
        regexp_replace(source, '([a-z]+)([0-9]+)', '\2_\1', 'g') AS src_flipped,
        coalesce(array_to_string(regexp_extract_all(text, '\b[a-z]{3}\b', 0), '|'), '') AS three_letter_words
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_try_family",
      "ANSI-safe try_* family (Spark 4 runs ANSI mode ON, where raw " +
        "casts/arithmetic THROW): try_cast, try_divide, try_element_at, " +
        "try_to_timestamp, try_add on a would-overflow sum. The " +
        "null-instead-of-fail semantics is what keeps a 100 TB job from " +
        "dying on one malformed row.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.select(
            col("doc_id"),
            concat(col("doc_id").cast("string"), lit("x")).try_cast("int").as("bad_int"),
            col("doc_id").cast("string").try_cast("int").as("good_int"),
            try_divide(col("n_chars"), col("doc_id") % 3).as("div3"),
            try_element_at(split(col("text"), " "), lit(200)).as("tok200"),
            try_to_timestamp(lit("2024-13-01")).cast("timestamp_ntz").as("bad_ts"),
            try_to_timestamp(lit("2024-06-01 12:00:00")).cast("timestamp_ntz").as("good_ts"),
            try_add(col("doc_id"), lit(Long.MaxValue)).as("overflow_add"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        TRY_CAST(CAST(doc_id AS VARCHAR) || 'x' AS INT) AS bad_int,
        TRY_CAST(CAST(doc_id AS VARCHAR) AS INT) AS good_int,
        n_chars / (doc_id % 3) AS div3,
        (string_split(text, ' '))[200] AS tok200,
        TRY_CAST('2024-13-01' AS TIMESTAMP) AS bad_ts,
        TIMESTAMP '2024-06-01 12:00:00' AS good_ts,
        CASE WHEN doc_id = 0 THEN 9223372036854775807 END AS overflow_add
        FROM documents ORDER BY doc_id""")),

    Q(
      "scalar_variant",
      "Spark 4 VARIANT semi-structured type: parse_json → variant, " +
        "typed path extraction via try_variant_get (null — not an ANSI " +
        "throw — on a missing path or non-int value, so one malformed " +
        "row can't kill a 100 TB scan), and foldable schema_of_variant. " +
        "The variant " +
        "binary encoding scans ~8× faster than re-parsing JSON strings " +
        "per access at scale.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val v = parse_json(col("props"))
        e.select(
            col("event_id"),
            try_variant_get(v, "$.k", "int").as("k_int"),
            try_variant_get(v, "$.missing", "int").as("missing_int"),
            is_variant_null(v).as("is_null_variant"),
            schema_of_variant(parse_json(lit("""{"k": 87}"""))).as("v_schema"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        CAST(NULL AS INT) AS missing_int,
        false AS is_null_variant,
        'OBJECT<k: BIGINT>' AS v_schema
        FROM events ORDER BY event_id""")),

    Q(
      "scalar_map_hof",
      "Map higher-order functions: transform_values, map_filter, " +
        "map_entries projection, map_concat — outputs via the canonical " +
        "'|'-joined encoding (map value/key order is insertion order in " +
        "both engines).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val m = map_from_arrays(
          array(lit("lang"), lit("source")),
          array(col("lang"), col("source")))
        d.select(
            col("doc_id"),
            concat_ws("|", map_values(transform_values(m, (_, v) => upper(v)))).as("vals_u"),
            concat_ws("|", map_keys(map_filter(m, (k, _) => k =!= "lang"))).as("keys_nolang"),
            concat_ws("|", transform(map_entries(m),
              e => concat(e.getField("key"), lit("="), e.getField("value")))).as("kv_pairs"),
            concat_ws("|", map_keys(map_concat(m,
              map(lit("extra"), lit("v"))))).as("keys_extra"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, MAP(['lang','source'], [lang, source]) AS m
          FROM documents)
        SELECT doc_id,
          array_to_string(list_transform(map_values(m), v -> upper(v)), '|') AS vals_u,
          array_to_string(list_filter(map_keys(m), k -> k != 'lang'), '|') AS keys_nolang,
          array_to_string(list_transform(map_entries(m), e -> e.key || '=' || e.value), '|') AS kv_pairs,
          array_to_string(map_keys(map_concat(m, MAP(['extra'], ['v']))), '|') AS keys_extra
        FROM d ORDER BY doc_id""")),

    Q(
      "explode_outer_nulls",
      "explode_outer/posexplode_outer generator semantics: rows with an " +
        "EMPTY match set still emit one null row (inner explode would " +
        "drop the document entirely — the outer form is what keeps " +
        "per-doc joins total).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            filter(split(col("text"), " "), t => t.startsWith("sc")).as("zz"))
        d.select(col("doc_id"), posexplode_outer(col("zz")))
          .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("tok"))
          .orderBy("doc_id", "pos")
      },
      Some("""WITH d AS (SELECT doc_id,
            list_filter(string_split(text, ' '), t -> t LIKE 'sc%') AS zz
          FROM documents),
        x AS (SELECT doc_id,
            CASE WHEN len(zz) = 0 THEN [NULL] ELSE zz END AS zz2 FROM d),
        u AS (SELECT doc_id, unnest(zz2) AS tok,
            generate_subscripts(zz2, 1) AS i FROM x)
        SELECT doc_id,
          CASE WHEN tok IS NULL THEN NULL ELSE CAST(i - 1 AS INT) END AS pos, tok
        FROM u ORDER BY doc_id, pos""")),

    Q(
      "explode_tokens",
      "Generator surface: posexplode of a split column (the UDTF shape).",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        d.filter(col("doc_id") < 50)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("token"))
          .orderBy("doc_id", "pos")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 50),
        x AS (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM d)
        SELECT doc_id, CAST(i - 1 AS INT) AS pos, words[CAST(i AS INT)] AS token
        FROM x ORDER BY doc_id, pos""")),

    Q(
      "scalar_format_family",
      "Formatting family: printf-style templating (format_string ≡ " +
        "printf), fixed-width lpad/rpad report alignment, repeat, " +
        "reverse, character-class translate — the display/export " +
        "surface of the string stack.",
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
        p.select(
            col("p_partkey"),
            format_string("%s#%06d", col("p_brand"), col("p_partkey")).as("sku"),
            lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
            rpad(col("p_brand"), 12, ".").as("brand_cell"),
            repeat(lit("*"), (col("p_size") % 5 + 1).cast("int")).as("stars"),
            reverse(col("p_name")).as("name_rev"),
            translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
        printf('%s#%06d', p_brand, p_partkey) AS sku,
        lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        rpad(p_brand, 12, '.') AS brand_cell,
        repeat('*', CAST(p_size % 5 + 1 AS INT)) AS stars,
        reverse(p_name) AS name_rev,
        translate(p_name, 'aeiou', 'AEIOU') AS name_tr
        FROM part ORDER BY p_partkey""")),

    Q(
      "scalar_binary_encode",
      "Binary transport encodings — base64 and hex over the payload " +
        "bytes with round-trip proof columns (decode(unbase64/unhex) " +
        "recovers the original): the wire-format family every " +
        "ingest/egress boundary needs. Pure per-row codegen'd " +
        "expressions.",
      (s, dir) => {
        val bin = col("text").cast("binary")
        // Spark's base64 is the MIME variant (76-char lines); strip the
        // line breaks to the canonical single-line form DuckDB emits
        Tables.t(s, dir, "documents").filter(col("doc_id") < 50)
          .select(col("doc_id"),
            regexp_replace(base64(bin), "[\\r\\n]", "").as("b64"),
            hex(bin).as("hx"),
            (decode(unbase64(base64(bin)), "UTF-8") === col("text"))
              .as("b64_roundtrip"),
            (decode(unhex(hex(bin)), "UTF-8") === col("text"))
              .as("hex_roundtrip"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          to_base64(CAST(text AS BLOB)) AS b64,
          upper(to_hex(CAST(text AS BLOB))) AS hx,
          CAST(from_base64(to_base64(CAST(text AS BLOB))) AS VARCHAR) = text
            AS b64_roundtrip,
          CAST(from_hex(to_hex(CAST(text AS BLOB))) AS VARCHAR) = text
            AS hex_roundtrip
        FROM documents WHERE doc_id < 50 ORDER BY doc_id""")),

    Q(
      "window_pareto_skyline",
      "Pareto-frontier (skyline) extraction per group — the orders " +
        "no other order in the group dominates on (price, quantity): " +
        "sort each group by price desc, a row is on the frontier iff " +
        "its quantity strictly exceeds the running max of all " +
        "higher-priced rows. The running max rides " +
        "[[Skew.groupedPrefixMax]] (range-partitioned per-group " +
        "exclusive prefix max + broadcast offsets) instead of a " +
        "window partitioned by the 3-value returnflag — exact " +
        "integer cents/quantities either way. The multi-objective " +
        "shortlist operator (best trade-offs, not a single ranking) " +
        "that has no direct SQL builtin.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_returnflag").as("grp"),
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") * 100).cast("long").as("price_c"),
            round(col("l_quantity")).cast("long").as("qty"))
        Skew.groupedPrefixMax(li, Seq("grp"),
            Seq(col("price_c").desc, col("l_orderkey"), col("l_linenumber")),
            "qty", outCol = "qmax")
          .filter(col("qmax").isNull || col("qty") > col("qmax"))
          .select(col("grp"), col("l_orderkey"), col("l_linenumber"),
            round(col("price_c") / 100.0, 2).as("price"), col("qty"))
          .orderBy(col("grp"), col("price").desc, col("l_orderkey"))
      },
      Some("""WITH li AS (SELECT l_returnflag AS grp, l_orderkey, l_linenumber,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
            CAST(round(l_quantity) AS BIGINT) AS qty
          FROM lineitem),
        sky AS (SELECT *,
            max(qty) OVER (PARTITION BY grp
              ORDER BY price_c DESC, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS qmax
          FROM li)
        SELECT grp, l_orderkey, l_linenumber,
          round(price_c / 100.0, 2) AS price, qty
        FROM sky WHERE qmax IS NULL OR qty > qmax
        ORDER BY grp, price DESC, l_orderkey""")),

    Q(
      "scalar_haversine",
      "Great-circle (haversine) nearest-neighbor math — the geo " +
        "scalar surface (radians/sin/cos/asin/sqrt composed into " +
        "the standard 2R·asin(√…) formula) over deterministic " +
        "synthetic coordinates derived from the nation key (the " +
        "fixture carries no geo columns; the coordinates pin the " +
        "MATH, the top-3-per-origin join shape pins the geo-knn " +
        "plan: dimension-sized broadcast self-join, WindowGroupLimit " +
        "rank, never an all-pairs shuffle at fact scale). Identical " +
        "double formula in both engines, rounded once.",
      (s, dir) => {
        val n = Tables.t(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("id"),
            (col("n_nationkey") * 6.0 - 72.0).as("lat"),
            ((col("n_nationkey") * 53 % 360) - 180.0).as("lon"))
        val p = n.as("a").join(broadcast(n.as("b")),
          col("a.id") =!= col("b.id"))
        val dphi = radians(col("b.lat") - col("a.lat")) / 2
        val dlam = radians(col("b.lon") - col("a.lon")) / 2
        val cc = cos(radians(col("a.lat"))) * cos(radians(col("b.lat")))
        val h = (sin(dphi) * sin(dphi)) + (cc * sin(dlam) * sin(dlam))
        val dist = asin(sqrt(h)) * 2 * 6371.0088
        val ranked = p.select(col("a.id").as("origin"),
            col("b.id").as("neighbor"), dist.as("d"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("origin").orderBy(col("d"), col("neighbor"))))
          .filter(col("rk") <= 3)
        ranked.select(col("origin"), col("rk"), col("neighbor"),
            round(col("d"), 1).as("dist_km"))
          .orderBy("origin", "rk")
      },
      Some("""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS id,
            n_nationkey * 6.0 - 72.0 AS lat,
            (n_nationkey * 53 % 360) - 180.0 AS lon
          FROM nation),
        p AS (SELECT a.id AS origin, b.id AS neighbor,
            2 * 6371.0088 * asin(sqrt(
              sin(radians(b.lat - a.lat) / 2)
                * sin(radians(b.lat - a.lat) / 2)
              + cos(radians(a.lat)) * cos(radians(b.lat))
                * sin(radians(b.lon - a.lon) / 2)
                * sin(radians(b.lon - a.lon) / 2))) AS d
          FROM n a JOIN n b ON a.id <> b.id),
        rk AS (SELECT origin, neighbor, d,
            row_number() OVER (PARTITION BY origin ORDER BY d, neighbor)
              AS rk
          FROM p)
        SELECT origin, CAST(rk AS INT) AS rk, neighbor,
          round(d, 1) AS dist_km
        FROM rk WHERE rk <= 3 ORDER BY origin, rk"""))
  )
}
