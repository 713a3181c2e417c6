package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SQL entry point (`spark.sql`) as a first-class surface: the same
  * engine drives ANSI SQL over temp views — proving a reference user
  * can keep writing SQL instead of the Column DSL. Views are registered
  * per-call (cheap: a view is just a plan alias). */
object SqlApi {

  private def withViews(s: org.apache.spark.sql.SparkSession, dir: String, tables: String*)(
      sql: String) = {
    tables.foreach(t => Tables.t(s, dir, t).createOrReplaceTempView(t))
    s.sql(sql)
  }

  def defs: Seq[Q] = Seq(

    Q(
      "sql_revenue_by_nation",
      "spark.sql surface: TPC-H Q5-shaped revenue per nation through the " +
        "full star join, written as ANSI SQL over temp views. Catalyst " +
        "plans it identically to the DataFrame form (dims broadcast).",
      (s, dir) => withViews(s, dir, "lineitem", "orders", "customer", "nation", "region")(
        """SELECT n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           WHERE r_name IN ('ASIA', 'AMERICA', 'EUROPE', 'AFRICA', 'MIDDLE EAST')
           GROUP BY n_name
           ORDER BY n_name"""),
      Some("""SELECT n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'AMERICA', 'EUROPE', 'AFRICA', 'MIDDLE EAST')
        GROUP BY n_name
        ORDER BY n_name""")),

    Q(
      "sql_scalar_subquery",
      "spark.sql surface: correlated EXISTS + scalar subquery " +
        "(decorrelated by Catalyst into joins — subquery support the " +
        "Column DSL doesn't express directly).",
      (s, dir) => withViews(s, dir, "orders", "customer")(
        """SELECT c_custkey, c_name,
             (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
           FROM customer
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 450000)
           ORDER BY c_custkey"""),
      Some("""SELECT c_custkey, c_name,
        (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        ORDER BY c_custkey""")),

    Q(
      "sql_grouping_sets",
      "Explicit GROUPING SETS (the general form rollup/cube sugar " +
        "over): totals by returnflag, by linestatus, and grand total in " +
        "one Expand + aggregate pass.",
      (s, dir) => withViews(s, dir, "lineitem")(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "sql_lateral_topn",
      "LATERAL correlated subquery with ORDER BY + LIMIT: top-2 orders " +
        "per customer — the SQL spelling of per-group top-N (Catalyst " +
        "decorrelates the lateral limit into a ranked join; the Column " +
        "DSL twin is the window row_number form).",
      (s, dir) => withViews(s, dir, "customer", "orders")(
        """SELECT c_custkey, o.o_orderkey, o.o_totalprice
           FROM customer,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_custkey = c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
           WHERE c_custkey < 100
           ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""),
      Some("""SELECT c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c_custkey < 100
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")),

    Q(
      "sql_recursive_cte",
      "WITH RECURSIVE (Spark 4): ancestor-chain walk over the implicit " +
        "doc_id // 2 binary-tree hierarchy — each document's generation " +
        "count to the root. Recursion depth is log2(N) (~9 on the " +
        "fixture); each iteration is one self-join the engine unions " +
        "into the working set. The same surface DuckDB runs verbatim.",
      (s, dir) => withViews(s, dir, "documents")(
        """WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
             SELECT doc_id, doc_id, 0 FROM documents
             UNION ALL
             SELECT a.doc_id, CAST(FLOOR(a.anc_id / 2.0) AS BIGINT), a.depth + 1
             FROM anc a WHERE a.anc_id > 0)
           SELECT doc_id, CAST(max(depth) AS INT) AS generations
           FROM anc GROUP BY doc_id ORDER BY doc_id"""),
      Some("""WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
          SELECT doc_id, doc_id, 0 FROM documents
          UNION ALL
          SELECT a.doc_id, CAST(FLOOR(a.anc_id / 2.0) AS BIGINT), a.depth + 1
          FROM anc a WHERE a.anc_id > 0)
        SELECT doc_id, CAST(max(depth) AS INT) AS generations
        FROM anc GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "agg_approx_distinct",
      "HLL++ approximate distinct counts per group — the 100 TB path " +
        "where exact countDistinct's two-level expansion is too " +
        "expensive. Approximate → no hash oracle; the ScalaTest bounds " +
        "it within 5% of exact.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        li.groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_orderkey")).as("approx_orders"),
            approx_count_distinct(col("l_partkey")).as("approx_parts"))
          .orderBy("l_returnflag")
      },
      None),

    Q(
      "sql_pivot",
      "SQL-syntax PIVOT clause (the spark.sql twin of the DataFrame " +
        "agg_pivot): quantity totals per return flag fanned across " +
        "the line-status columns in one Expand+aggregate pass. The " +
        "oracle spells the same thing as portable conditional " +
        "aggregation, so the clause's semantics — not just its " +
        "parser — are pinned.",
      (s, dir) => withViews(s, dir, "lineitem")(
        """SELECT * FROM (
             SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
           PIVOT (CAST(sum(l_quantity) AS BIGINT)
             FOR l_linestatus IN ('F' AS f, 'O' AS o))
           ORDER BY l_returnflag"""),
      Some("""SELECT l_returnflag,
          CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS BIGINT) AS f,
          CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS BIGINT) AS o
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q(
      "sql_unpivot",
      "SQL-syntax UNPIVOT clause — wide-to-long without a UNION " +
        "rescan per column (one generate pass): the three customer " +
        "numeric facets melt into (facet, value) rows. Oracle as the " +
        "portable UNION ALL spelling.",
      (s, dir) => withViews(s, dir, "customer")(
        """SELECT c_custkey, facet, CAST(round(v * 100) AS BIGINT) AS cents
           FROM (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
                   CAST(c_nationkey AS DOUBLE) AS nationkey
                 FROM customer)
           UNPIVOT (v FOR facet IN (acctbal, nationkey))
           WHERE c_custkey < 100
           ORDER BY c_custkey, facet"""),
      Some("""SELECT c_custkey, facet, CAST(round(v * 100) AS BIGINT) AS cents
        FROM (
          SELECT c_custkey, 'acctbal' AS facet, CAST(c_acctbal AS DOUBLE) AS v
          FROM customer
          UNION ALL
          SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
          FROM customer)
        WHERE c_custkey < 100
        ORDER BY c_custkey, facet""")),

    Q(
      "sql_disjunctive_pricing",
      "TPC-H Q19-shaped disjunctive pricing — revenue over an OR of " +
        "three (brand/type, size-range, quantity-range) AND-branches " +
        "across the lineitem⋈part join. The shape that stresses an " +
        "optimizer's OR handling: the common p_partkey equi-key must " +
        "still drive the join (part stays the broadcast build side) " +
        "with the disjunction evaluated as a post-join filter, never " +
        "a fallback to a nested loop. Revenue in exact integer " +
        "cent·basis-point units (price-cents × (10000 − discount-bp)) " +
        "— one BIGINT sum, one final division.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(10000) - round(col("l_discount") * 10000).cast("long")))
              .as("rev_u"))
        val p = broadcast(Tables.t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size")))
        val branch =
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#17" && col("p_size").between(10, 30)
            && col("l_quantity").between(10, 20)) ||
          (col("p_type") === "ECONOMY" && col("p_size").between(20, 50)
            && col("l_quantity").between(20, 36))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .filter(branch)
          .agg(count(lit(1)).as("n_items"),
            round(sum("rev_u") / 1e6, 2).as("revenue"))
          .orderBy("n_items")
      },
      Some("""SELECT count(*) AS n_items,
          round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            / 1e6, 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 10 AND 20)
          OR (p_type = 'ECONOMY' AND p_size BETWEEN 20 AND 50
            AND l_quantity BETWEEN 20 AND 36)
        ORDER BY n_items""")),

    Q(
      "sql_market_share",
      "TPC-H Q8-shaped market share — NATION_0 suppliers' share of " +
        "ASIA-customer revenue by order year: the two-level " +
        "conditional-aggregation shape (total revenue and one " +
        "nation's slice in the SAME pass — no second scan, no self-" +
        "join) over the full 6-table star. Dimensions broadcast; " +
        "revenue in exact integer cent·basis-point units; the share " +
        "is one division per year row.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        val o = Tables.t(s, dir, "orders")
        val c = Tables.t(s, dir, "customer")
        val sup = broadcast(Tables.t(s, dir, "supplier"))
        val n = broadcast(Tables.t(s, dir, "nation"))
        val r = broadcast(Tables.t(s, dir, "region"))
        val revU = (round(col("l_extendedprice") * 100).cast("long")
          * (lit(10000) - round(col("l_discount") * 10000).cast("long")))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n.select(col("n_nationkey").as("cnk"),
            col("n_regionkey").as("crk")), col("c_nationkey") === col("cnk"))
          .join(r, col("crk") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(n.select(col("n_nationkey").as("snk"),
            col("n_name").as("sup_nation")), col("s_nationkey") === col("snk"))
          .groupBy(year(col("o_orderdate")).as("order_year"))
          .agg(sum(revU).as("tot"),
            sum(when(col("sup_nation") === "NATION_0", revU)
              .otherwise(lit(0L))).as("slice"))
          .select(col("order_year"),
            round(col("tot") / 1e6, 2).as("total_revenue"),
            round(col("slice").cast("double") / col("tot"), 4)
              .as("mkt_share"))
          .orderBy("order_year")
      },
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
          round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            / 1e6, 2) AS total_revenue,
          round(CAST(sum(CASE WHEN sn.n_name = 'NATION_0'
              THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
              ELSE 0 END) AS DOUBLE)
            / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l_discount * 10000) AS BIGINT))),
            4) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1 ORDER BY order_year""")),

    Q(
      "sql_rollup_share",
      "Share-of-parent over a ROLLUP hierarchy — region→nation " +
        "revenue where each nation row carries its share of the " +
        "region subtotal, each region row its share of the grand " +
        "total (the drill-down report shape: every level normalized " +
        "against its parent in ONE pass — no self-join of the cube " +
        "back onto itself). The window partitions by grouping_id + " +
        "parent key, so each rollup level normalizes within its own " +
        "stratum; revenue stays exact integer cents through the " +
        "rollup AND the window; names coalesce to 'ALL' only after " +
        "the shares are fixed.",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val c = Tables.t(s, dir, "customer")
        val n = broadcast(Tables.t(s, dir, "nation"))
        val r = broadcast(Tables.t(s, dir, "region"))
        val base = o.join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            grouping_id().as("gid"))
        val w = Window.partitionBy(col("gid"),
          when(col("gid") === 0, col("r_name")).otherwise(lit("__top__")))
        base
          .withColumn("share",
            round(col("cents").cast("double") / sum("cents").over(w), 4))
          .select(coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("gid").cast("int").as("lvl"),
            round(col("cents") / 100.0, 2).as("revenue"), col("share"))
          .orderBy("lvl", "region", "nation")
      },
      Some("""WITH base AS (SELECT r_name, n_name,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS cents,
            CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)),
        sh AS (SELECT r_name, n_name, gid, cents,
            round(CAST(cents AS DOUBLE) / sum(cents) OVER (
              PARTITION BY gid,
                CASE WHEN gid = 0 THEN r_name ELSE '__top__' END), 4)
              AS share
          FROM base)
        SELECT coalesce(r_name, 'ALL') AS region,
          coalesce(n_name, 'ALL') AS nation,
          CAST(gid AS INT) AS lvl,
          round(cents / 100.0, 2) AS revenue, share
        FROM sh ORDER BY lvl, region, nation""")),

    Q(
      "sql_named_window",
      "Named WINDOW clause \u2014 one window specification shared by " +
        "rank, running total, and previous-row delta in the same " +
        "SELECT (the ANSI surface that lets the optimizer compute " +
        "ONE Sort+Window pass instead of three). Per-(nation, date) " +
        "revenue is a unique key, so every shared-window function " +
        "is deterministic; revenue stays exact integer cents; the " +
        "IDENTICAL clause text runs verbatim as the DuckDB oracle.",
      (s, dir) => withViews(s, dir, "orders", "customer")(
        """SELECT c_nationkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(rank() OVER w AS INT) AS date_rank,
             round(CAST(sum(rev) OVER w2 AS BIGINT) / 1e2, 2)
               AS running_rev,
             round(coalesce(rev - lag(rev) OVER w, 0) / 1e2, 2)
               AS delta_prev
           FROM (SELECT c_nationkey, o_orderdate,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS rev
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_nationkey < 3
             GROUP BY c_nationkey, o_orderdate)
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY o_orderdate),
             w2 AS (PARTITION BY c_nationkey ORDER BY o_orderdate
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ORDER BY c_nationkey, o_orderdate"""),
      Some("""SELECT c_nationkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(rank() OVER w AS INT) AS date_rank,
             round(CAST(sum(rev) OVER w2 AS BIGINT) / 1e2, 2)
               AS running_rev,
             round(coalesce(rev - lag(rev) OVER w, 0) / 1e2, 2)
               AS delta_prev
           FROM (SELECT c_nationkey, o_orderdate,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS rev
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_nationkey < 3
             GROUP BY c_nationkey, o_orderdate)
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY o_orderdate),
             w2 AS (PARTITION BY c_nationkey ORDER BY o_orderdate
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ORDER BY c_nationkey, o_orderdate""")),

    Q(
      "sql_shipping_priority",
      "TPC-H Q3 (shipping priority): segment-filtered customer × " +
        "date-bracketed orders × lineitem, revenue per open order, " +
        "top 10 — the canonical 3-way join + top-k plan-audit shape. " +
        "Both date filters push to their scans, both dims broadcast, " +
        "and the LIMIT plans as TakeOrderedAndProject (per-partition " +
        "heaps), never a global sort. Revenue in exact cents so the " +
        "sum is order-independent and bit-identical across engines.",
      (s, dir) => withViews(s, dir, "customer", "orders", "lineitem")(
        """SELECT l_orderkey,
             round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue,
             o_orderdate, o_orderpriority
           FROM customer
           JOIN orders   ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < DATE '1998-03-15'
             AND l_shipdate > DATE '1998-03-15'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, o_orderdate, l_orderkey
           LIMIT 10"""),
      Some("""SELECT l_orderkey,
          round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
            AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue,
          o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1998-03-15'
          AND l_shipdate > DATE '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10""")),

    Q(
      "sql_local_supplier_volume",
      "TPC-H Q5 (local-supplier volume): the 6-way join whose " +
        "supplier⋈customer nation equality CLOSES A CYCLE in the join " +
        "graph — the join-order stress sql_revenue_by_nation's pure " +
        "star shape can't exercise. Catalyst must pick an order where " +
        "the cycle edge becomes a cheap residual on an already-joined " +
        "pair, with nation/region/supplier broadcast; revenue in exact " +
        "cents for engine-portable sums.",
      (s, dir) => withViews(s, dir,
        "customer", "orders", "lineitem", "supplier", "nation", "region")(
        """SELECT n_name,
             round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue
           FROM customer
           JOIN orders   ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           JOIN nation   ON s_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
             AND o_orderdate >= DATE '1996-01-01'
             AND o_orderdate < DATE '1998-01-01'
           GROUP BY n_name
           ORDER BY revenue DESC, n_name"""),
      Some("""SELECT n_name,
          round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
            AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    Q(
      "sql_waiting_suppliers",
      "TPC-H Q21 shape (waiting suppliers): the semi + anti DOUBLE " +
        "correlation on the same fact table — suppliers in ASIA whose " +
        "returned ('R') lineitem sits in a finished multi-supplier " +
        "order where EXISTS another supplier's line but NOT EXISTS " +
        "another supplier's returned line. (The fixtures carry no " +
        "commit/receipt dates, so l_returnflag = 'R' stands in for the " +
        "late-delivery predicate; the decorrelation stress — one " +
        "LeftSemi plus one LeftAnti against self-correlated lineitem — " +
        "is the point.) Top 20 blocked suppliers by wait count.",
      (s, dir) => withViews(s, dir,
        "supplier", "lineitem", "orders", "nation", "region")(
        """SELECT s_name, count(*) AS numwait
           FROM supplier
           JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
           JOIN orders   ON o_orderkey = l1.l_orderkey
           JOIN nation   ON s_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           WHERE o_orderstatus = 'F'
             AND l1.l_returnflag = 'R'
             AND r_name = 'ASIA'
             AND EXISTS (SELECT 1 FROM lineitem l2
               WHERE l2.l_orderkey = l1.l_orderkey
                 AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l3
               WHERE l3.l_orderkey = l1.l_orderkey
                 AND l3.l_suppkey <> l1.l_suppkey
                 AND l3.l_returnflag = 'R')
           GROUP BY s_name
           ORDER BY numwait DESC, s_name
           LIMIT 20"""),
      Some("""SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders   ON o_orderkey = l1.l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND r_name = 'ASIA'
          AND EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20""")),

    Q(
      "sql_min_cost_supplier",
      "TPC-H Q2 shape (minimum-cost supplier): for each small part, " +
        "keep only the supplier(s) whose unit cost equals the " +
        "per-part minimum. r17 spelled the minimum as a correlated " +
        "scalar subquery, whose decorrelation re-expanded the ps CTE " +
        "— two full lineitem aggregation passes; r18 computes the " +
        "same per-part MIN as a window over ps after the p_size " +
        "filter (the filter commutes: the correlation key is the " +
        "part), one pass, identical rows — the correlated spelling " +
        "lives on in the DuckDB oracle, which pins the equivalence. " +
        "Unit costs are rounded to integer cents before the MIN so " +
        "the equality predicate is exact in both engines. Ties keep " +
        "every minimal supplier, made deterministic by the total " +
        "ORDER BY.",
      (s, dir) => withViews(s, dir, "lineitem", "part", "supplier")(
        // r18 (guide §1.2): the correlated-MIN form expanded the ps
        // CTE twice (two full lineitem scan+agg passes — the
        // decorrelation joins ps against a second copy of itself);
        // the per-part MIN is the same quantity as a window over ps
        // computed ONCE, and because the correlation key is the part,
        // the p_size filter commutes in front of the window (a
        // dropped part's min was never consulted). Result rows are
        // identical; the DuckDB oracle keeps the original correlated
        // spelling and still hash-matches, pinning the equivalence.
        """WITH ps AS (
             SELECT l_partkey, l_suppkey,
               CAST(min(CAST(round(l_extendedprice * 100 / l_quantity)
                 AS BIGINT)) AS BIGINT) AS cost_c
             FROM lineitem GROUP BY 1, 2),
           pm AS (
             SELECT p_partkey, p_name, l_suppkey, cost_c,
               min(cost_c) OVER (PARTITION BY l_partkey) AS min_c
             FROM ps JOIN part ON p_partkey = l_partkey
             WHERE p_size <= 3)
           SELECT p_partkey, p_name, s_suppkey, s_name,
             round(cost_c / 1e2, 2) AS unit_cost
           FROM pm
           JOIN supplier ON s_suppkey = l_suppkey
           WHERE cost_c = min_c
           ORDER BY p_partkey, s_suppkey"""),
      Some("""WITH ps AS (
          SELECT l_partkey, l_suppkey,
            CAST(min(CAST(round(l_extendedprice * 100 / l_quantity)
              AS BIGINT)) AS BIGINT) AS cost_c
          FROM lineitem GROUP BY 1, 2)
        SELECT p_partkey, p_name, s_suppkey, s_name,
          round(cost_c / 1e2, 2) AS unit_cost
        FROM ps
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size <= 3
          AND cost_c = (SELECT min(cost_c) FROM ps ps2
                        WHERE ps2.l_partkey = ps.l_partkey)
        ORDER BY p_partkey, s_suppkey""")),

    Q(
      "sql_volume_shipping",
      "TPC-H Q7 shape (volume shipping): bilateral trade volume " +
        "between two nations by ship year — the SAME dimension table " +
        "(nation) joined TWICE under different aliases with a " +
        "disjunctive cross-alias predicate. The plan stress Q5's " +
        "single-alias cycle can't exercise: Catalyst must keep the two " +
        "broadcast copies distinct and evaluate the (n1=A AND n2=B) OR " +
        "(n1=B AND n2=A) residual after both joins. Revenue in exact " +
        "cents; ship year cast to INT on both engines.",
      (s, dir) => withViews(s, dir,
        "supplier", "lineitem", "orders", "customer", "nation")(
        """SELECT supp_nation, cust_nation, yr,
             round(CAST(sum(cents) AS BIGINT) / 1e2, 2) AS revenue,
             count(*) AS n_lines
           FROM (
             SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS yr,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT) AS cents
             FROM supplier
             JOIN lineitem  ON s_suppkey = l_suppkey
             JOIN orders    ON o_orderkey = l_orderkey
             JOIN customer  ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
                 OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
               AND l_shipdate >= DATE '1996-01-01'
               AND l_shipdate <  DATE '1999-01-01')
           GROUP BY supp_nation, cust_nation, yr
           ORDER BY supp_nation, cust_nation, yr"""),
      Some("""SELECT supp_nation, cust_nation, yr,
          round(CAST(sum(cents) AS BIGINT) / 1e2, 2) AS revenue,
          count(*) AS n_lines
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS INT) AS yr,
            CAST(round(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT) AS cents
          FROM supplier
          JOIN lineitem  ON s_suppkey = l_suppkey
          JOIN orders    ON o_orderkey = l_orderkey
          JOIN customer  ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
              OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
            AND l_shipdate >= DATE '1996-01-01'
            AND l_shipdate <  DATE '1999-01-01')
        GROUP BY supp_nation, cust_nation, yr
        ORDER BY supp_nation, cust_nation, yr""")),

    Q(
      "sql_product_profit",
      "TPC-H Q9 shape (product-type profit): per-nation per-year " +
        "profit over parts of one type, profit = revenue minus a cost " +
        "model (80% of retail price × quantity; the fixtures carry no " +
        "partsupp supplycost). The Q9 plan stress: the part filter must " +
        "push below the 5-way join and prune lineitem via the join, " +
        "and the two profit terms are each exact-cents BIGINTs so the " +
        "subtraction and sum are order-independent on both engines.",
      (s, dir) => withViews(s, dir,
        "lineitem", "part", "supplier", "orders", "nation")(
        """SELECT n_name AS nation, yr,
             round(CAST(sum(rev_c - cost_c) AS BIGINT) / 1e2, 2)
               AS profit
           FROM (
             SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT) AS rev_c,
               CAST(round(p_retailprice * 0.8 * l_quantity * 100)
                 AS BIGINT) AS cost_c
             FROM lineitem
             JOIN part     ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders   ON o_orderkey = l_orderkey
             JOIN nation   ON s_nationkey = n_nationkey
             WHERE p_type = 'PROMO')
           GROUP BY n_name, yr
           ORDER BY nation, yr"""),
      Some("""SELECT n_name AS nation, yr,
          round(CAST(sum(rev_c - cost_c) AS BIGINT) / 1e2, 2) AS profit
        FROM (
          SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
            CAST(round(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT) AS rev_c,
            CAST(round(p_retailprice * 0.8 * l_quantity * 100)
              AS BIGINT) AS cost_c
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_type = 'PROMO')
        GROUP BY n_name, yr
        ORDER BY nation, yr""")),

    Q(
      "sql_customer_distribution",
      "TPC-H Q13 (customer distribution): how many customers placed " +
        "exactly k non-urgent orders, INCLUDING the zero-order " +
        "customers — the left outer join with a filter INSIDE the ON " +
        "clause (not WHERE, which would turn it inner) followed by a " +
        "double aggregation: count per customer, then histogram of " +
        "those counts. The canonical outer-join-semantics audit shape.",
      (s, dir) => withViews(s, dir, "customer", "orders")(
        """SELECT c_count, count(*) AS custdist
           FROM (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
           GROUP BY c_count
           ORDER BY custdist DESC, c_count DESC"""),
      Some("""SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    Q(
      "sql_small_quantity_revenue",
      "TPC-H Q17 shape (small-quantity revenue): revenue from " +
        "lineitems of one brand whose quantity sits below half the " +
        "part's average quantity — the correlated AVG subquery " +
        "Catalyst decorrelates into a per-part aggregate joined back " +
        "on the correlation key (one hash agg + equi-join, never a " +
        "per-row rescan). Quantities are integral doubles, so the " +
        "average is an exact small-rational and the strict < at the " +
        "boundary is engine-portable; revenue summed in exact cents.",
      (s, dir) => withViews(s, dir, "lineitem", "part")(
        """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100)
               AS BIGINT)) AS BIGINT) / 1e2, 2) AS total_rev,
             count(*) AS n_lines
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#12'
             AND l_quantity < (
               SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
               WHERE l2.l_partkey = p_partkey)"""),
      Some("""SELECT round(CAST(sum(CAST(round(l_extendedprice * 100)
            AS BIGINT)) AS BIGINT) / 1e2, 2) AS total_rev,
          count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#12'
          AND l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)""")),

    Q(
      "sql_large_orders",
      "TPC-H Q18 (large-quantity orders): customers whose order " +
        "aggregates more than 150 units — GROUP BY + HAVING in a " +
        "derived table, joined back to orders and customer, top 20 by " +
        "price. The plan point: the HAVING prunes the fact table " +
        "BEFORE the dimension joins (aggregate-then-join, not " +
        "join-then-aggregate), and the LIMIT rides " +
        "TakeOrderedAndProject. Integral quantities keep the HAVING " +
        "boundary exact on both engines.",
      (s, dir) => withViews(s, dir, "customer", "orders", "lineitem")(
        """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             round(o_totalprice, 2) AS totalprice,
             CAST(qty AS BIGINT) AS total_qty
           FROM (
             SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(l_quantity) > 150) big
           JOIN orders   ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           ORDER BY totalprice DESC, o_orderkey
           LIMIT 20"""),
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
          round(o_totalprice, 2) AS totalprice,
          CAST(qty AS BIGINT) AS total_qty
        FROM (
          SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150) big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 20""")),

    Q(
      "sql_sales_opportunity",
      "TPC-H Q22 shape (global sales opportunity): customers with " +
        "above-average balances and no recent orders (lapsed since 1999), bucketed by nation " +
        "group — an UNCORRELATED scalar aggregate subquery (computed " +
        "once, broadcast as a 1-row filter input) plus a NOT EXISTS " +
        "anti-join against the fact table. Balances are compared and " +
        "summed as exact cents so the above-average cut is " +
        "engine-portable at the boundary.",
      (s, dir) => withViews(s, dir, "customer", "orders")(
        """WITH bal AS (
             SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
             FROM customer)
           SELECT CAST(c_nationkey % 5 AS INT) AS cntry_grp,
             count(*) AS numcust,
             round(CAST(sum(bal_c) AS BIGINT) / 1e2, 2) AS totacctbal
           FROM bal
           WHERE bal_c > (SELECT avg(bal_c) FROM bal WHERE bal_c > 0)
             AND NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey
                               AND o_orderdate >= DATE '1999-01-01')
           GROUP BY CAST(c_nationkey % 5 AS INT)
           ORDER BY cntry_grp"""),
      Some("""WITH bal AS (
          SELECT c_custkey, c_nationkey,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer)
        SELECT CAST(c_nationkey % 5 AS INT) AS cntry_grp,
          count(*) AS numcust,
          round(CAST(sum(bal_c) AS BIGINT) / 1e2, 2) AS totacctbal
        FROM bal
        WHERE bal_c > (SELECT avg(bal_c) FROM bal WHERE bal_c > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '1999-01-01')
        GROUP BY CAST(c_nationkey % 5 AS INT)
        ORDER BY cntry_grp""")),

    Q(
      "sql_priority_waiting",
      "TPC-H Q4 shape (order-priority checking): orders in a date " +
        "bracket counted per priority when EXISTS a lineitem shipped " +
        "more than 60 days after the order date (the fixtures carry " +
        "no commit date — ship lateness stands in). The Q4 plan " +
        "stress: a correlated EXISTS whose predicate references BOTH " +
        "tables' columns, decorrelated into one LeftSemi with a " +
        "non-equi residual; the date bracket pushes to the orders " +
        "scan.",
      (s, dir) => withViews(s, dir, "orders", "lineitem")(
        """SELECT o_orderpriority, count(*) AS order_count
           FROM orders
           WHERE o_orderdate >= DATE '1996-01-01'
             AND o_orderdate < DATE '1997-01-01'
             AND EXISTS (SELECT 1 FROM lineitem
               WHERE l_orderkey = o_orderkey
                 AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority"""),
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    Q(
      "sql_forecast_revenue",
      "TPC-H Q6 (forecasting revenue change): the pure scan-filter-" +
        "aggregate — one year of shipments in a discount band below a " +
        "quantity ceiling, summing price×discount in exact cents. The " +
        "plan-audit floor: every predicate must reach PushedFilters " +
        "on the parquet scan, the aggregate is map-side combinable, " +
        "and nothing shuffles but one 1-row partial-merge.",
      (s, dir) => withViews(s, dir, "lineitem")(
        """SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount
               * 100) AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue_delta,
             count(*) AS n_lines
           FROM lineitem
           WHERE l_shipdate >= DATE '1996-01-01'
             AND l_shipdate < DATE '1997-01-01'
             AND l_discount BETWEEN 0.05 AND 0.07
             AND l_quantity < 24"""),
      Some("""SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount
            * 100) AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue_delta,
          count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")),

    Q(
      "sql_returned_items",
      "TPC-H Q10 (returned-item reporting): top-20 customers by " +
        "revenue lost to returns in a half-year window — the 4-way " +
        "join with a HIGH-cardinality grouping key (customer, not " +
        "nation), so the aggregation shuffle carries real width and " +
        "the top-k must ride TakeOrderedAndProject above it. Nation " +
        "broadcasts; revenue in exact cents.",
      (s, dir) => withViews(s, dir,
        "customer", "orders", "lineitem", "nation")(
        """SELECT c_custkey, c_name,
             round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
               * 100) AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue,
             n_name
           FROM customer
           JOIN orders   ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN nation   ON c_nationkey = n_nationkey
           WHERE l_returnflag = 'R'
             AND o_orderdate >= DATE '1996-01-01'
             AND o_orderdate < DATE '1996-07-01'
           GROUP BY c_custkey, c_name, n_name
           ORDER BY revenue DESC, c_custkey
           LIMIT 20"""),
      Some("""SELECT c_custkey, c_name,
          round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
            * 100) AS BIGINT)) AS BIGINT) / 1e2, 2) AS revenue,
          n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    Q(
      "sql_shipping_delay_profile",
      "TPC-H Q12 shape (shipping-mode priority profile): per line " +
        "status (standing in for ship mode — the fixtures carry " +
        "none), how many severely-late lines (shipped >30 days after " +
        "order) belong to high- vs low-priority orders — the " +
        "conditional-aggregation-after-join shape with a non-equi " +
        "date residual on the join output.",
      (s, dir) => withViews(s, dir, "orders", "lineitem")(
        """SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
           FROM orders
           JOIN lineitem ON o_orderkey = l_orderkey
           WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
           GROUP BY l_linestatus
           ORDER BY l_linestatus"""),
      Some("""SELECT l_linestatus,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")),

    Q(
      "sql_promo_revenue",
      "TPC-H Q14 (promotion effect): the share of one month's " +
        "revenue that came from promo-type parts — a conditional " +
        "numerator over the same aggregated rows as the denominator, " +
        "in ONE pass (never two scans). Both sums are exact-cent " +
        "BIGINTs; the percentage is a single float division at the " +
        "end.",
      (s, dir) => withViews(s, dir, "lineitem", "part")(
        """SELECT round(CAST(100.0 AS DOUBLE)
               * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                 AS BIGINT)
               / CAST(sum(cents) AS BIGINT), 4) AS promo_revenue_pct,
             count(*) AS n_lines
           FROM (SELECT p_type,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT) AS cents
             FROM lineitem JOIN part ON p_partkey = l_partkey
             WHERE l_shipdate >= DATE '1996-09-01'
               AND l_shipdate < DATE '1996-10-01')"""),
      Some("""SELECT round(CAST(100.0 AS DOUBLE)
            * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
              AS BIGINT)
            / CAST(sum(cents) AS BIGINT), 4) AS promo_revenue_pct,
          count(*) AS n_lines
        FROM (SELECT p_type,
            CAST(round(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT) AS cents
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_shipdate >= DATE '1996-09-01'
            AND l_shipdate < DATE '1996-10-01')""")),

    Q(
      "sql_top_supplier",
      "TPC-H Q15 (top supplier): the supplier(s) whose quarterly " +
        "revenue equals the global maximum — the view + uncorrelated " +
        "MAX-subquery shape where the same derived aggregate is " +
        "consumed twice (join input and scalar filter); Catalyst " +
        "reuses the exchange instead of recomputing the view. Ties " +
        "keep every maximal supplier, deterministic under the key " +
        "ORDER BY; revenue in exact cents so the max-equality is " +
        "engine-portable.",
      (s, dir) => withViews(s, dir, "lineitem", "supplier")(
        """WITH rev AS (
             SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                 * 100) AS BIGINT)) AS BIGINT) AS total_c
             FROM lineitem
             WHERE l_shipdate >= DATE '1996-01-01'
               AND l_shipdate < DATE '1996-04-01'
             GROUP BY l_suppkey)
           SELECT s_suppkey, s_name, round(total_c / 1e2, 2) AS total_revenue
           FROM supplier JOIN rev ON s_suppkey = supplier_no
           WHERE total_c = (SELECT max(total_c) FROM rev)
           ORDER BY s_suppkey"""),
      Some("""WITH rev AS (
          SELECT l_suppkey AS supplier_no,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
              * 100) AS BIGINT)) AS BIGINT) AS total_c
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, round(total_c / 1e2, 2) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = supplier_no
        WHERE total_c = (SELECT max(total_c) FROM rev)
        ORDER BY s_suppkey"""))
  )
}
