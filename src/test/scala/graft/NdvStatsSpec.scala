package graft

import graft.sources.DocStore
import org.apache.spark.sql.functions._

/** Writer-measured NDV + per-column bytes in `#stat` lines, surfaced
  * through `SupportsReportStatistics`: planning-grade statistics with
  * ZERO footer reads on stat-backed stores, per-column distinct/null
  * counts for Spark's cost rules, and the broadcast decision a
  * dimension table needs made from DATA, not conf defaults. */
class NdvStatsSpec extends SparkSpec {
  import spark.implicits._

  private def loggedFooters[A](body: => A): (A, Seq[String]) = {
    DocStore.footerConsultLog.clear()
    DocStore.footerLogEnabled = true
    try {
      val r = body
      (r, scala.jdk.CollectionConverters.IteratorHasAsScala(
        DocStore.footerConsultLog.iterator()).asScala.toSeq)
    } finally {
      DocStore.footerLogEnabled = false
      DocStore.footerConsultLog.clear()
    }
  }

  test("sink writes per-column NDV and bytes into #stat; estimates within HLL tolerance") {
    val store = tmpDir("ndv_store")
    // 10k rows: k unique (10000 distinct), grp (7), v strings (1000)
    (0L until 10000L).map(i => (i, i % 7, s"s${i % 1000}"))
      .toDF("k", "grp", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    val (v, rels) = DocStore.currentSnapshot(store).get
    val st = DocStore.readManifestStats(store, v)(rels.head)
    def ndv(c: String): Long = st.cols(c).ndv.get
    assert(math.abs(ndv("k") - 10000L) <= 500L, ndv("k").toString)   // ~2.3% err
    assert(ndv("grp") == 7L, ndv("grp").toString)                    // small-range exact
    assert(math.abs(ndv("v") - 1000L) <= 60L, ndv("v").toString)
    // v2 stat lines carry per-column bytes
    assert(st.cols.values.forall(_.bytes.exists(_ > 0L)))
  }

  test("estimateStatistics answers from the manifest: zero footers, column stats surfaced") {
    val store = tmpDir("ndv_est")
    (0L until 5000L).map(i => (i, s"n${i % 50}", if (i % 10 == 0) None else Some(i.toDouble)))
      .toDF("k", "name", "score").coalesce(2)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val df = spark.read.format("docstore").option("path", store).load()
    val (stats, consulted) = loggedFooters {
      val scan = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
      }.get
      scan
    }
    assert(consulted.isEmpty, s"stat-backed estimate consulted footers: $consulted")
    assert(stats.numRows().getAsLong == 5000L)
    assert(stats.sizeInBytes().getAsLong > 0L)
    val byName = scala.jdk.CollectionConverters.MapHasAsScala(stats.columnStats())
      .asScala.map { case (k, v) => k.describe() -> v }
    assert(byName("score").nullCount().getAsLong == 500L)
    // per-file NDVs SUM across files (capped at live rows): an upper
    // bound that double-counts values shared by files — here 2 files
    // × 50 shared names — which is the safe direction for planning
    // (overestimating distincts never picks a wrongly-small plan)
    val nameNdv = byName("name").distinctCount().getAsLong
    assert(nameNdv >= 47L && nameNdv <= 106L, nameNdv.toString)
    // disjoint key ranges across the 2 files: the sum is the truth
    assert(math.abs(byName("k").distinctCount().getAsLong - 5000L) <= 250L)
  }

  test("a dimension-sized docstore table auto-broadcasts in a join without a hint") {
    val dim = tmpDir("ndv_dim")
    val fact = tmpDir("ndv_fact")
    (0L until 100L).map(i => (i, s"region$i")).toDF("r_id", "r_name").coalesce(1)
      .write.format("docstore").option("path", dim)
      .option("snapshots", "true").mode("append").save()
    (0L until 200000L).map(i => (i, i % 100L)).toDF("o_id", "o_rid")
      .write.format("docstore").option("path", fact)
      .option("snapshots", "true").mode("append").save()
    val joined = spark.read.format("docstore").option("path", fact).load()
      .join(spark.read.format("docstore").option("path", dim).load(),
        col("o_rid") === col("r_id"))
      .groupBy("r_name").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension join did not broadcast:\n${plan.take(1500)}")
    assert(joined.agg(sum("n")).head.getLong(0) == 200000L)
  }
}
