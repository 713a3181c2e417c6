package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture / slowly-changing-dimension surface: the
  * mutation-shaped ETL a warehouse does on top of the reference's
  * append-only export (reference main.py:297-303 only ever appends;
  * these are the standard day-2 operations users layer on the same
  * parquet output).
  *
  * All three are pure DataFrame compositions — merge is a left join +
  * union, snapshot is an argmax window, z-order is a bit-interleave
  * projection — so Catalyst drives the physical plan and each scales
  * as its underlying join/window/sort does.
  */
object Cdc {

  private val ScdEffective = java.sql.Date.valueOf("2024-06-01")
  private val ScdGenesis = java.sql.Date.valueOf("2020-01-01")

  /** Interleave the low `bits` bits of x and y (Morton / Z-order curve):
    * z = Σ_b ((x>>b)&1)<<2b | ((y>>b)&1)<<(2b+1). Pure integer column
    * arithmetic — stays inside whole-stage codegen. */
  private def zInterleave(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map { b =>
      (shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))

  /** Same interleave as ANSI SQL for the DuckDB oracle (generated, not
    * hand-unrolled — one `|`-term per bit). */
  private def zInterleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " | ", ")")

  def defs: Seq[Q] = Seq(

    Q(
      "join_point_in_time",
      "Point-in-time-correct dimension lookup (the feature-store / " +
        "audit-correctness join): each order joins the SCD2 customer " +
        "segment version whose validity interval contains the order " +
        "date — never the current row, which silently leaks future " +
        "attributes into historical facts. The SCD2 dim is built " +
        "inline (every 7th customer migrates effective 1995-06-01, " +
        "genesis 1992-01-01, matching the order-date range); the join " +
        "is an equi-join on the customer key with the interval " +
        "containment as a residual predicate — ≤2 versions per key, " +
        "so the residual filters a bounded fan-out and the join " +
        "shuffles once on the key like any dimension join. Revenue " +
        "rounds at the aggregate (coarse class).",
      (s, dir) => {
        val genesis = java.sql.Date.valueOf("1992-01-01")
        val eff = java.sql.Date.valueOf("1995-06-01")
        val base = Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            (col("c_custkey") % 7 === 0).as("chg"))
        val dim = base.select(col("c_custkey"),
            col("c_mktsegment").as("segment"),
            lit(genesis).as("valid_from"),
            when(col("chg"), lit(eff)).otherwise(lit(null).cast("date"))
              .as("valid_to"))
          .unionByName(base.filter(col("chg")).select(col("c_custkey"),
            lit("MIGRATED").as("segment"),
            lit(eff).as("valid_from"),
            lit(null).cast("date").as("valid_to")))
        val o = Tables.t(s, dir, "orders")
          .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
            col("o_totalprice"))
        o.join(dim, col("o_custkey") === col("c_custkey") &&
            col("od") >= col("valid_from") &&
            (col("valid_to").isNull || col("od") < col("valid_to")))
          .groupBy(col("segment"), year(col("od")).as("order_year"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
          .orderBy("segment", "order_year")
      },
      Some("""WITH base AS (SELECT c_custkey, c_mktsegment,
            c_custkey % 7 = 0 AS chg FROM customer),
        dim AS (
          SELECT c_custkey, c_mktsegment AS segment,
            DATE '1992-01-01' AS valid_from,
            CASE WHEN chg THEN DATE '1995-06-01' END AS valid_to
          FROM base
          UNION ALL
          SELECT c_custkey, 'MIGRATED', DATE '1995-06-01', NULL
          FROM base WHERE chg),
        o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
            o_totalprice FROM orders)
        SELECT segment, CAST(year(od) AS INT) AS order_year,
          count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        FROM o JOIN dim ON o_custkey = c_custkey
          AND od >= valid_from AND (valid_to IS NULL OR od < valid_to)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q(
      "etl_scd2_merge",
      "Slowly-changing-dimension type 2 merge: apply a change batch " +
        "(every 7th customer migrates market segment, effective " +
        "2024-06-01) to the current dimension snapshot. Changed keys " +
        "get their open row closed (valid_to = effective date) plus a " +
        "new current row; unchanged keys pass through. One left join " +
        "against the change batch + a union — at 100 TB the change " +
        "batch is small relative to the dimension, so the join " +
        "broadcasts and the merge is a single scan of the dimension.",
      (s, dir) => {
        val dim = Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            lit(ScdGenesis).as("valid_from"))
        val changes = broadcast(
          Tables.t(s, dir, "customer")
            .filter(col("c_custkey") % 7 === 0)
            .select(col("c_custkey"), lit("MIGRATED").as("new_segment")))
        val merged = dim.join(changes, Seq("c_custkey"), "left")
        val closedOrKept = merged.select(
          col("c_custkey"),
          col("c_mktsegment").as("segment"),
          col("valid_from"),
          when(col("new_segment").isNotNull, lit(ScdEffective))
            .otherwise(lit(null).cast("date")).as("valid_to"),
          col("new_segment").isNull.as("is_current"))
        val fresh = merged.filter(col("new_segment").isNotNull).select(
          col("c_custkey"),
          col("new_segment").as("segment"),
          lit(ScdEffective).as("valid_from"),
          lit(null).cast("date").as("valid_to"),
          lit(true).as("is_current"))
        closedOrKept.unionByName(fresh)
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH changes AS (
          SELECT c_custkey, 'MIGRATED' AS new_segment
          FROM customer WHERE c_custkey % 7 = 0),
        merged AS (
          SELECT d.c_custkey, d.c_mktsegment, ch.new_segment
          FROM customer d LEFT JOIN changes ch USING (c_custkey))
        SELECT c_custkey, c_mktsegment AS segment,
          DATE '2020-01-01' AS valid_from,
          CASE WHEN new_segment IS NOT NULL THEN DATE '2024-06-01' END AS valid_to,
          new_segment IS NULL AS is_current
        FROM merged
        UNION ALL
        SELECT c_custkey, new_segment AS segment,
          DATE '2024-06-01' AS valid_from,
          CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
        FROM merged WHERE new_segment IS NOT NULL
        ORDER BY c_custkey, valid_from""")),

    Q(
      "etl_cdc_snapshot",
      "CDC changelog → latest-state snapshot: events are upserts of " +
        "`value` per user keyed by (ts, event_id); an 'error' event is " +
        "a delete marker. The snapshot keeps each user's latest op " +
        "(argmax window, deterministic event_id tie-break) and drops " +
        "users whose latest op is a delete. One shuffle on the key; " +
        "WindowGroupLimit keeps only the top row per key on the map " +
        "side, so state never exceeds one row per live key.",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .select(col("user_id"),
            col("event_type").as("last_op"),
            round(col("value"), 3).as("last_value"),
            to_date(col("ts")).as("last_day"))
          .orderBy("user_id")
      },
      Some("""WITH ranked AS (
          SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_type AS last_op,
          round(value, 3) AS last_value, CAST(ts AS DATE) AS last_day
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
        ORDER BY user_id""")),

    Q(
      "etl_zorder_layout",
      "Z-order (Morton curve) layout key over (l_partkey, l_suppkey): " +
        "interleave the low 10 bits of each dimension into one sort " +
        "key, so range-partitioning the write on it co-locates rows " +
        "that are close in BOTH dimensions — parquet min/max row-group " +
        "stats then skip files for selective filters on either column " +
        "(the multi-dimensional data-skipping layout; spec pins the " +
        "disjoint per-file ranges). Pure codegen'd bit arithmetic, no " +
        "shuffle beyond the final range sort.",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            zInterleave(col("l_partkey"), col("l_suppkey"), 10).as("zval"))
          .orderBy("zval", "l_orderkey", "l_linenumber")
      },
      Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          ${zInterleaveSql("l_partkey", "l_suppkey", 10)} AS zval
        FROM lineitem
        ORDER BY zval, l_orderkey, l_linenumber"""))
  )
}
