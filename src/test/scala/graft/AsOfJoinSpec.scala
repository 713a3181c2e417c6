package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Native as-of join operator: semantics vs hand-built expectation, vs
  * the window-based composition on the fixtures, null/no-match rows,
  * and the physical plan shape. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches latest right row <= left time per key, null when none") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"),
      (3L, ts("2024-01-01 10:00:10"), "t4")) // key with no quotes
      .toDF("sym", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (1L, ts("2024-01-01 10:00:30"), 102.0), // after both trades
      (2L, ts("2024-01-01 10:00:10"), 200.0)) // exactly equal → matches
      .toDF("q_sym", "q_ts", "price")
    val got = AsOf.join(trades, quotes, "sym", "q_sym", "t_ts", "q_ts")
      .select("trade", "price").orderBy("trade")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      ("t1", Some(100.0)), // 10:00:05 → quote at 10:00:00
      ("t2", Some(101.0)), // 10:00:20 → quote at 10:00:10
      ("t3", Some(200.0)), // equal timestamps included (<=)
      ("t4", None)))       // no quotes for key 3
  }

  test("equals the window-based composition on the events fixture") {
    val native = SparkEntry.queries("join_asof_native")(spark, sfDir).collect().toSeq
    val window = SparkEntry.queries("join_asof")(spark, sfDir).collect().toSeq
    assert(native == window)
  }

  test("physical plan is the custom exec over co-partitioned sorted children") {
    val e = Tables.t(spark, sfDir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val df = AsOf.join(e, p, "user_id", "p_user", "ts", "p_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert(plan.contains("Sort ["), "children should be sorted")
    assert(plan.contains("hashpartitioning"), "children should be hash-clustered")
  }

  test("null timestamps never match (not unboxed to epoch 0)") {
    import spark.implicits._
    val l = Seq(
      (1L, Some(ts("2024-01-01 00:10:00")), "normal"),
      (1L, None, "null-time")).toDF("k", "lt", "tag")
      .select(col("k"), col("lt").cast("timestamp").as("lt"), col("tag"))
    val r = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), 1.0),
      (1L, None, 99.0)) // null right time must never be buffered as a match
      .toDF("rk", "rt", "v")
      .select(col("rk"), col("rt").cast("timestamp").as("rt"), col("v"))
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt")
      .select("tag", "v").collect()
      .map(row => (row.getString(0), if (row.isNullAt(1)) None else Some(row.getDouble(1))))
      .toMap
    assert(got("normal") == Some(1.0), "real match picks the non-null-time row")
    assert(got("null-time") == None, "null left time gets no match")
  }

  test("string keys join correctly (evaluated keys copied, not buffer views)") {
    import spark.implicits._
    // Many distinct string keys across partitions: if the exec held a
    // UTF8String view into a reused UnsafeRow buffer instead of a copy,
    // key-change detection would corrupt and matches would cross keys.
    val l = (0 until 500).map(i => (s"sym${i % 50}", i.toLong + 1000L, i))
      .toDF("k", "lt", "tag")
    val r = (0 until 50).map(i => (s"sym$i", 500L, i * 10.0))
      .toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt")
      .select("k", "v").collect()
    assert(got.length == 500)
    got.foreach { row =>
      val expected = row.getString(0).stripPrefix("sym").toDouble * 10.0
      assert(!row.isNullAt(1) && row.getDouble(1) == expected,
        s"key ${row.getString(0)} matched wrong right row: $row")
    }
  }

  test("integer (date-typed) time columns work — no Long unboxing assumption") {
    import spark.implicits._
    val l = Seq((1L, java.sql.Date.valueOf("2024-03-10"), "L"))
      .toDF("k", "lt", "tag")
    val r = Seq(
      (1L, java.sql.Date.valueOf("2024-03-01"), "early"),
      (1L, java.sql.Date.valueOf("2024-03-15"), "late")).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt").select("v").collect()
    assert(got.length == 1 && got.head.getString(0) == "early")
  }

  test("mismatched key/time types fail fast at plan time") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "lt")
    val rStrKey = Seq(("1", 5L)).toDF("rk", "rt")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(l, rStrKey, "k", "rk", "lt", "rt")
    }
    assert(e1.getMessage.contains("key types differ"))
    val rTsTime = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("rk", "rt")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(l, rTsTime, "k", "rk", "lt", "rt")
    }
    assert(e2.getMessage.contains("time types differ"))
  }

  test("duplicate right times at the match boundary take the last in sort order") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:10"), "L")).toDF("k", "lt", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:10"), "a"),
      (1L, ts("2024-01-01 00:00:10"), "b")).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt").select("v").collect()
    assert(got.length == 1 && !got.head.isNullAt(0)) // one of the ties, non-null
  }

  test("forward direction: earliest right >= left time; one row serves many lefts") {
    import spark.implicits._
    val l = Seq(
      (1L, ts("2024-01-01 00:00:05"), "a"),
      (1L, ts("2024-01-01 00:00:08"), "b"),  // same forward match as a
      (1L, ts("2024-01-01 00:00:10"), "c"),  // equality is inclusive
      (1L, ts("2024-01-01 00:00:11"), "d"),  // nothing at-or-after → null
      (2L, ts("2024-01-01 00:00:01"), "e"))  // key with no right rows
      .toDF("k", "lt", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:02"), "early"),
      (1L, ts("2024-01-01 00:00:10"), "hit"))
      .toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt", direction = "forward")
      .select("tag", "v").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    assert(got === Map("a" -> "hit", "b" -> "hit", "c" -> "hit",
      "d" -> null, "e" -> null))
  }

  test("nearest direction: closer side wins, ties backward") {
    import spark.implicits._
    val l = Seq(
      (1L, ts("2024-01-01 00:00:06"), "nearBack"),   // 1s back vs 4s fwd
      (1L, ts("2024-01-01 00:00:09"), "nearFwd"),    // 4s back vs 1s fwd
      (1L, ts("2024-01-01 00:00:07.5"), "tie"))      // 2.5s both → backward
      .toDF("k", "lt", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:05"), "B"),
      (1L, ts("2024-01-01 00:00:10"), "F"))
      .toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt", direction = "nearest")
      .select("tag", "v").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(got === Map("nearBack" -> "B", "nearFwd" -> "F", "tie" -> "B"))
  }

  test("native forward/nearest equal the window-based registry queries") {
    for ((native, window) <- Seq(
        "join_asof_forward_native" -> "join_asof_forward",
        "join_asof_nearest_native" -> "join_asof_nearest")) {
      val a = SparkEntry.queries(native)(spark, sfDir).collect().map(_.toString)
      val b = SparkEntry.queries(window)(spark, sfDir).collect().map(_.toString)
      assert(a.toSeq === b.toSeq, s"$native != $window")
    }
  }

  test("tolerance nulls stale matches in every direction") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:10:00"), "L")).toDF("k", "lt", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:00"), "back10m"),
      (1L, ts("2024-01-01 00:30:00"), "fwd20m")).toDF("rk", "rt", "v")
    def run(dir: String, tolSec: Long) =
      AsOf.join(l, r, "k", "rk", "lt", "rt", direction = dir,
          tolerance = Some(tolSec * 1000000L))
        .select("v").head()
    assert(run("backward", 700).getString(0) == "back10m") // within ~11.7m
    assert(run("backward", 300).isNullAt(0))               // 5m < 10m gap
    assert(run("forward", 1500).getString(0) == "fwd20m")
    assert(run("forward", 600).isNullAt(0))
    assert(run("nearest", 700).getString(0) == "back10m")  // closer side in
    assert(run("nearest", 300).isNullAt(0))                // both outside
    // native tolerance query equals the window-based registry query
    val a = SparkEntry.queries("join_asof_tolerance_native")(spark, sfDir)
      .collect().map(_.toString)
    val b = SparkEntry.queries("join_asof_tolerance")(spark, sfDir)
      .collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("nearest rejects non-integral time types at plan time") {
    import spark.implicits._
    val l = Seq((1L, "x", "a")).toDF("k", "lt", "tag")
    val r = Seq((1L, "y", "v")).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "lt", "rt", direction = "nearest")
    }
    assert(e.getMessage.contains("integral-backed"))
  }
}
