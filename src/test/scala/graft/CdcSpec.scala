package graft

import org.apache.spark.sql.functions._

/** CDC/SCD surface (ops.Cdc) + the bench machine-line contract. */
class CdcSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("etl_scd2_merge: changed keys carry a closed row + one current row; unchanged keys one open row") {
    val out = q("etl_scd2_merge").cache()
    val perKey = out.groupBy("c_custkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
    // Exactly one current+open row per key, no exceptions.
    assert(perKey.filter(col("n_current") =!= 1 || col("n_open") =!= 1).count() === 0)
    // Changed keys (custkey % 7 == 0) have 2 versions, others 1.
    assert(perKey.filter(col("c_custkey") % 7 === 0 && col("n") =!= 2).count() === 0)
    assert(perKey.filter(col("c_custkey") % 7 =!= 0 && col("n") =!= 1).count() === 0)
    // A closed row's valid_to equals the successor's valid_from.
    val changed = out.filter(col("c_custkey") % 7 === 0)
    val closed = changed.filter(!col("is_current"))
      .select(col("c_custkey"), col("valid_to"))
    val opened = changed.filter(col("is_current"))
      .select(col("c_custkey"), col("valid_from"))
    assert(closed.join(opened, Seq("c_custkey"))
      .filter(col("valid_to") =!= col("valid_from")).count() === 0)
    out.unpersist()
  }

  test("etl_cdc_snapshot: one row per live user, none whose latest op is a delete") {
    val out = q("etl_cdc_snapshot").cache()
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    assert(out.filter(col("last_op") === "error").count() === 0)
    out.unpersist()
  }

  test("etl_zorder_layout: range-partitioned write on zval yields disjoint per-file ranges (data skipping)") {
    val out = q("etl_zorder_layout")
    val dir = tmpDir("zorder")
    out.repartitionByRange(4, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(dir)
    // Per-file min/max of zval must not overlap: that is what lets
    // parquet row-group stats skip whole files for a 2-D-selective scan.
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    // Strict <: RangePartitioner maps equal keys to ONE partition, so a
    // boundary zval shared by two files would mean overlap — exactly
    // what data skipping can't tolerate.
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo) }
    // Morton key locality: both dimensions of the low/high file are
    // separated (z-order clusters on BOTH columns, not just one).
    val zMax = (0 until 10).map(b => (1L << (2 * b)) | (1L << (2 * b + 1))).reduce(_ | _)
    assert(out.agg(max("zval")).head.getLong(0) <= zMax)
  }

  test("bench machine line: bounded for tail capture and complete JSON") {
    val results = SparkEntry.queries.keys.map(_ -> 123.456).toMap
    val line = Bench.machineLine(results, 99.9, 0, "/root/testdata/sf0.1")
    // The driver's tail window truncated the 3.5 KB full line in rounds
    // 1 and 2 — the machine line must stay well under it.
    assert(line.length < 1500, s"machine line too long: ${line.length}")
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"n_queries\":" + results.size))
    // Every headline name is a declared query (no dead keys).
    Bench.headline.foreach(h => assert(results.contains(h), s"headline $h not declared"))
  }

  test("bench stall detector: reruns only genuine outliers, bounded at 4 runs") {
    // r12 ngram (9.19 s vs 0.72 baseline) and r13 markov (8.13 s vs
    // 1.08) must both trigger; a legitimate 2x regression must NOT
    // (that's a real engine delta the bench must report, not retry
    // away), nor any sub-second jitter, and the rerun budget caps at 4
    val ngramBase = BenchBaseline.seconds("dedup_ngram_jaccard")
    assert(Bench.stallSuspect("dedup_ngram_jaccard", 9.19, 2))
    assert(Bench.stallSuspect("analytics_markov_attribution", 8.13, 2))
    assert(!Bench.stallSuspect("dedup_ngram_jaccard", 2 * ngramBase, 2))
    assert(!Bench.stallSuspect("agg_q1", 0.9, 2), "sub-second jitter rerun")
    assert(!Bench.stallSuspect("dedup_ngram_jaccard", 9.19, 4), "no rerun cap")
    // unknown queries (new this round) use the absolute floor
    assert(Bench.stallSuspect("brand_new_query", 6.0, 2))
    assert(!Bench.stallSuspect("brand_new_query", 3.0, 2))
    // a failed query (NaN) is never retried as a stall
    assert(!Bench.stallSuspect("agg_q1", Double.NaN, 2))
  }
}
