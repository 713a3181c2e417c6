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

  test("stats_chi2: nonnegative statistic, dof = (R-1)(C-1), n equals |customer|") {
    val r = SparkEntry.queries("stats_chi2")(spark, sfDir).head()
    assert(r.getDouble(0) >= 0.0, "chi2 >= 0")
    assert(r.getLong(1) === 16L, "5 segments x 5 regions -> dof 16")
    val n = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(r.getLong(2) === n)
  }

  test("stats_ks_test: statistic in [0,1] and matches brute-force ECDF sup") {
    val r = SparkEntry.queries("stats_ks_test")(spark, sfDir).head()
    val ks = r.getDouble(0)
    assert(ks >= 0.0 && ks <= 1.0)
    // brute force on the collected column (fixture-sized only)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("n_chars"), col("lang")).collect()
    val a = docs.filter(_.getString(1) == "en").map(_.getLong(0)).sorted
    val b = docs.filter(_.getString(1) != "en").map(_.getLong(0)).sorted
    val sup = (a ++ b).distinct.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length - b.count(_ <= v).toDouble / b.length)
    }.max
    assert(math.abs(ks - sup) < 1e-6, s"got $ks, brute force $sup")
    assert(r.getLong(1) === a.length && r.getLong(2) === b.length)
  }

  test("stats_gini: in [0,1) per group and matches brute-force formula") {
    val out = SparkEntry.queries("stats_gini")(spark, sfDir).collect()
    assert(out.length === 5)
    out.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0))
    // brute-force one group
    val prio = out.head.getString(0)
    val xs = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === prio)
      .select(round(col("o_totalprice") * 100).cast("long")).as[Long].collect().sorted
    val n = xs.length.toDouble
    val g = 2.0 * xs.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum /
      (n * xs.map(_.toDouble).sum) - (n + 1) / n
    assert(math.abs(out.head.getDouble(2) - g) < 1e-4, s"got ${out.head.getDouble(2)}, brute $g")
  }

  test("profile_benford: 9 digits, observed and expected shares each sum to ~1") {
    val out = SparkEntry.queries("profile_benford")(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-3)
  }

  test("ts_interpolate_linear: known days pass through; interpolated values bounded by neighbors") {
    val out = SparkEntry.queries("ts_interpolate_linear")(spark, sfDir).cache()
    assert(out.filter(col("known").isNotNull && col("known") =!= col("interp")).count() === 0,
      "wherever a day is known the fill equals it")
    assert(out.filter(col("interp").isNull).count() === 0, "every spine day is filled")
    // interpolated values never exceed the series' known min/max per type
    val bounds = out.groupBy("event_type")
      .agg(min("known").as("lo"), max("known").as("hi"))
    val joined = out.join(bounds, "event_type")
    assert(joined.filter(col("interp") < col("lo") - 1e-9 || col("interp") > col("hi") + 1e-9)
      .count() === 0, "linear fill stays inside the known envelope")
    out.unpersist()
  }

  test("ts_cusum_changepoint: one row per type, day in range, deviation nonnegative") {
    val out = SparkEntry.queries("ts_cusum_changepoint")(spark, sfDir).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 31)
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("ts_downsample_lttb: one point per bucket; first and last day always kept") {
    val out = SparkEntry.queries("ts_downsample_lttb")(spark, sfDir).cache()
    val perBucket = out
      .withColumn("b", floor((col("day") - 1) / 5.0))
      .groupBy("event_type", "b").count()
    assert(perBucket.filter(col("count") =!= 1).count() === 0, "exactly one survivor per bucket")
    val daily = Tables.t(spark, sfDir, "events")
      .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
      .agg(count(lit(1)))
    val firstLast = daily.groupBy("event_type").agg(min("d").as("fd"), max("d").as("ld"))
    val kept = out.groupBy("event_type").agg(min("day").as("kf"), max("day").as("kl"))
    val bad = firstLast.join(kept, "event_type")
      .filter(col("fd") =!= col("kf") || col("ld") =!= col("kl"))
    assert(bad.count() === 0, "endpoint anchors preserved per series")
    out.unpersist()
  }
}
