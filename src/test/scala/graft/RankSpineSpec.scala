package graft

import org.apache.spark.sql.functions._

/** Regression pin for the round-11 rank-spine race: RangePartitioning
  * samples fresh boundaries on EVERY execution, so when the offsets
  * subtree and the ranked subtree of Skew.globalRank materialize the
  * exchange independently (observed under the Verify harness's
  * concurrent query execution), local ranks pair with offsets from a
  * different partitioning and the "global rank" silently gains
  * duplicates and gaps. globalRank now cuts the partitioned frame
  * once; this spec asserts the permutation property on the exact
  * input shape that exposed the race (raw scan + per-row jitter, no
  * upstream shuffle). */
class RankSpineSpec extends SparkSpec {
  test("globalRank over a jittered raw scan is an exact 1..N permutation") {
    val ev = Tables.t(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), Tables.epochUs(col("ts")).as("us"))
      .withColumn("arr", col("us") +
        pmod(graft.ops.PortableHash.hexHash(
          concat(lit("wmk:"), col("event_id").cast("string"))),
          lit(600000000L)))
    val ranked = graft.ops.Skew.globalRank(ev, Seq(col("arr"), col("event_id")),
      rankCol = "rk")
    val n = ranked.count()
    val distinct = ranked.select("rk").distinct().count()
    val mx = ranked.agg(max("rk")).head().getLong(0)
    assert(distinct == n, s"rk not unique: $distinct of $n")
    assert(mx == n, s"max rk $mx != $n")
  }

  test("globalRank stays a permutation under CONCURRENT execution") {
    // The r11 race was caught by accident (uneven watermark batches);
    // this drives it deliberately: N simultaneous globalRank queries on
    // a thread pool — the Verify harness's actual execution mode — so
    // any future "optimization" that lets the offsets and ranked
    // subtrees re-sample range boundaries independently fails here,
    // not in production. Each task uses its own jitter salt so the
    // concurrent plans don't share cached exchanges by accident.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (0 until 6).map { k =>
        pool.submit(new java.util.concurrent.Callable[(Long, Long, Long)] {
          def call(): (Long, Long, Long) = {
            val ev = Tables.t(spark, "/root/testdata/sf0.01", "events")
              .select(col("event_id"), Tables.epochUs(col("ts")).as("us"))
              .withColumn("arr", col("us") +
                pmod(graft.ops.PortableHash.hexHash(
                  concat(lit(s"conc$k:"), col("event_id").cast("string"))),
                  lit(600000000L)))
            val ranked = graft.ops.Skew.globalRank(
              ev, Seq(col("arr"), col("event_id")), rankCol = "rk")
            (ranked.count(),
              ranked.select("rk").distinct().count(),
              ranked.agg(max("rk")).head().getLong(0))
          }
        })
      }
      tasks.zipWithIndex.foreach { case (t, k) =>
        val (n, distinct, mx) = t.get()
        assert(distinct == n, s"task $k: rk not unique ($distinct of $n)")
        assert(mx == n, s"task $k: max rk $mx != $n")
      }
    } finally pool.shutdown()
  }
}
