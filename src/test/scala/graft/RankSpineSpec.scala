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
}
