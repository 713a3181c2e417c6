package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ANN build/probe phases: prints per-phase
  * wall time and the Spark job count, so bench regressions can be
  * attributed to job latency vs compute. Not part of the query
  * registry; run via `runMain graft.tools.ProfAnn <sfDir>`. */
object ProfAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("prof-ann")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(e: SparkListenerJobEnd): Unit = ()
    })
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs; val t0 = System.nanoTime()
      val r = f
      val ms = (System.nanoTime() - t0) / 1e6
      System.err.println(f"[prof] $name%-28s ${ms}%8.0f ms  jobs=${jobs - j0}")
      r
    }
    for (round <- 1 to 2) {
      System.err.println(s"== round $round ==")
      phase("pq_full")(Similarity.annPq(spark, dir, 0, 10).collect())
      phase("ivf_full")(Similarity.annIvf(spark, dir, 0, 2, 10).collect())
      val e = Tables.t(spark, dir, "embeddings")
      phase("kmeans_seeds")(Similarity.kmeansSeeds(e, 8).collect())
      phase("kmeans_2iter")(Similarity.kmeansCentroids(e, 8, 2).collect())
      val subs = e.select(col("vec_id"),
          explode(transform(sequence(lit(0), lit(3)),
            k => struct(k.cast("int").as("sub"),
              slice(col("embedding"), k * lit(16) + 1, lit(16)).as("sv")))).as("s"))
        .select(col("vec_id"), col("s.sub").as("sub"), col("s.sv").as("sv"))
      phase("pq_seeds")(Similarity.pqSeeds(subs, 16).collect())
      phase("pq_books_2iter")(Similarity.pqCodebooks(subs, 16, 2).collect())
    }
    spark.stop()
  }
}
