package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: `runMain graft.Explain <sfDir> <query> [n]` — prints the
  * formatted physical plan of a declared query and times n count() runs
  * (first = cold, rest = warm). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned joins for key-grouped docstore scans: set
      // from process start so plan shapes never depend on which query
      // was constructed first (etl_connector_copartition also sets it
      // for foreign sessions)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // recursive-CTE working sets scale with the table (the sf1 audit
      // tripped the 1M default on a log2(N)-depth walk over 50k docs);
      // the limit is a runaway guard, not a capacity plan - size it for
      // the data like any production session would
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"[$name] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
      }
    }
    spark.stop()
  }
}
