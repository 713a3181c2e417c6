package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics pins for the stats/ordered-analytics module: the LOCF
  * fill, IGNORE NULLS navigation, and the moment aggregates' population
  * (not sample-corrected) definitions. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("last(ignoreNulls) over a running frame carries the last observation forward") {
    val df = Seq(
      (1, 1, Some(10.0)), (1, 2, None), (1, 3, None), (1, 4, Some(7.0)), (1, 5, None),
      (2, 1, None), (2, 2, Some(3.0))
    ).toDF("g", "seq", "v")
    val w = Window.partitionBy("g").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df
      .select(col("g"), col("seq"),
        coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0)).as("locf"))
      .orderBy("g", "seq")
      .as[(Int, Int, Double)].collect().toSeq
    assert(got == Seq(
      (1, 1, 10.0), (1, 2, 10.0), (1, 3, 10.0), (1, 4, 7.0), (1, 5, 7.0),
      (2, 1, 0.0), (2, 2, 3.0)))
  }

  test("lag ignoreNulls skips null rows, not just offsets past them") {
    val df = Seq(
      (1, 1, Some(1.0)), (1, 2, None), (1, 3, Some(3.0)), (1, 4, None), (1, 5, Some(5.0))
    ).toDF("g", "seq", "v")
    val w = Window.partitionBy("g").orderBy("seq")
    val got = df
      .select(col("seq"), lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev"))
      .orderBy("seq")
      .as[(Int, Option[Double])].collect().toSeq
    // row 4 (null itself) still sees the last non-null BEFORE it (3.0);
    // row 5 skips the null at 4 and sees 3.0.
    assert(got == Seq((1, None), (2, Some(1.0)), (3, Some(1.0)), (4, Some(3.0)), (5, Some(3.0))))
  }

  test("skewness/kurtosis are the population g1/g2 the oracle recomputes from moments") {
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 9.0)
    val df = xs.toDF("x")
    val Array(sk, ku) = df.select(skewness($"x"), kurtosis($"x"))
      .as[(Double, Double)].collect().map(t => Array(t._1, t._2)).head
    val n = xs.size.toDouble
    val m = xs.sum / n
    val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
    val g1 = (xs.map(x => math.pow(x - m, 3)).sum / n) / math.pow(m2, 1.5)
    val g2 = (xs.map(x => math.pow(x - m, 4)).sum / n) / (m2 * m2) - 3
    assert(math.abs(sk - g1) < 1e-9, s"skewness $sk != population g1 $g1")
    assert(math.abs(ku - g2) < 1e-9, s"kurtosis $ku != population g2 $g2")
  }

  test("HLL sketch estimates are accurate and merge-equals-direct") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head()
    // direct sketch over the raw column
    val direct = li.select(hll_sketch_estimate(hll_sketch_agg($"l_orderkey")))
      .as[Long].head()
    // partial sketches per group, merged — the partition-and-merge path
    val merged = li.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey").as("sk"))
      .select(hll_sketch_estimate(hll_union_agg($"sk")))
      .as[Long].head()
    // the union estimator path may differ from the direct sketch by a
    // hair (different target-HLL promotion), but both must stay tight
    assert(math.abs(merged - direct).toDouble / direct < 0.01,
      s"merged $merged vs direct $direct beyond 1%")
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
      s"estimate $direct vs exact $exact beyond 5%")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact beyond 5%")
  }

  test("ts_gapfill_locf emits a dense 30-day spine per user with no null fills") {
    val df = SparkEntry.queries("ts_gapfill_locf")(spark, sfDir)
    val rows = df.collect()
    val users = rows.map(_.getLong(0)).distinct
    assert(rows.length == users.length * 30, "every user gets all 30 spine days")
    assert(rows.forall(!_.isNullAt(3)), "filled column is never null")
    // day_value is null exactly on gap days, and filled carries values forward
    assert(rows.exists(_.isNullAt(2)), "fixture has at least one gap day")
  }

  test("ts_resample_ohlc: bar invariants — low <= open/close <= high, volume consistent") {
    val out = SparkEntry.queries("ts_resample_ohlc")(spark, sfDir).cache()
    assert(out.count() > 0)
    val bad = out.filter(
      col("low") > col("high") ||
        col("open") < col("low") || col("open") > col("high") ||
        col("close") < col("low") || col("close") > col("high") ||
        col("n_events") <= 0)
    assert(bad.count() === 0)
    out.unpersist()
  }
}
