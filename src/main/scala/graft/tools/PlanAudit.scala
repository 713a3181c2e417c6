package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch plan auditor: prints exchange/reuse/window counts for the
  * named queries so shuffle-shape regressions can be spotted without
  * reading whole plan dumps. Not part of the query registry; run via
  * `runMain graft.tools.PlanAudit <sfDir> <name substrings...>`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val subs = args.drop(1)
    SparkEntry.queries
      .filter { case (n, _) => subs.isEmpty || subs.exists(n.contains) }
      .foreach { case (name, fn) =>
        val df = fn(spark, dir)
        df.collect() // materialize THIS plan so AQE's final form (stage reuse) is visible
        val p = df.queryExecution.executedPlan.toString
        def c(s: String) = p.sliding(s.length).count(_ == s)
        println(f"$name%-28s exch=${c("Exchange ")}%2d " +
          f"range=${c("rangepartitioning")}%2d reuse=${c("ReusedExchange")}%2d " +
          f"stagereuse=${c("ReusedQueryStage") + c("reuses_operator_id")}%2d " +
          f"bhj=${c("BroadcastHashJoin")}%2d smj=${c("SortMergeJoin")}%2d " +
          f"win=${c("Window ")}%2d scans=${c("Scan parquet")}%2d")
        if (sys.env.contains("GRAFT_PLAN_FULL")) println(p)
      }
    spark.stop()
  }
}
