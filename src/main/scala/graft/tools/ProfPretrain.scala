package graft.tools

import graft.Tables
import graft.ops.{Dedup, Skew}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage profiler for pipeline_pretrain: times each stage in
  * isolation (count-materialized) so the slow stage is attributable.
  * Run via `runMain graft.tools.ProfPretrain <sfDir>`. */
object ProfPretrain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("prof-pretrain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val d = Tables.t(spark, dir, "documents")
    val gated = d.filter(col("lang") === "en" && col("n_chars") >= 100)
      .select(col("doc_id"), col("text"), col("source"),
        split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 20)
    val wd = Window.partitionBy("fp").orderBy("doc_id")
    val exact = gated
      .withColumn("fp", md5(col("text").cast("binary")))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1)
      .select("doc_id", "text", "source")
      .localCheckpoint(true)
    t("gate+exact")(println("  n=" + exact.count()))
    import graft.ops.TextFns
    val shingles = t("shingle ckpt")(exact.select(col("doc_id"),
        explode(array_distinct(TextFns.wordGrams(
          split(col("text"), " "), 5))).as("shingle"))
      .localCheckpoint(true))
    val stats = Dedup.shingleJaccardStats(shingles, hotThreshold = 20)
    t("jaccard stats")(println("  pairs=" + stats.count()))
    val dropped = stats.filter(col("jaccard") >= 0.5)
      .select(col("d2").as("doc_id")).distinct()
    val kept = t("kept checkpoint")(
      exact.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint(true))
    val tok = kept.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("n"))
    val total = tok.agg(count(lit(1)).as("t"))
    val scored = tok.groupBy("doc_id", "source", "token")
      .agg(count(lit(1)).as("c"))
      .join(broadcast(freq), "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"), col("c"),
        (col("c").cast("double") *
          log(col("n") / col("t").cast("double"))).as("x"))
      .groupBy("doc_id", "source")
      .agg(sum("c").as("n_tok"),
        sort_array(collect_list(col("x"))).as("xs"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        round(-aggregate(col("xs"), lit(0.0), (a, x) => a + x) /
          col("n_tok") / math.log(2.0), 6).as("bits_per_token"))
    t("lm scoring")(scored.count())
    val keep2 = Skew.globalNtile(scored,
        Seq(col("bits_per_token"), col("doc_id")), 3, "tercile")
      .filter(col("tercile") <= 2)
    t("ntile+filter")(keep2.count())
    t("mix+sample")(keep2.groupBy("source").agg(sum("n_tok")).count())
    spark.stop()
  }
}
