package graft.tools

import graft.Tables
import graft.ops.{Skew, TextFns}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark: where does shingle-generation time go?
  * Run via `runMain graft.tools.ProfShingle <sfDir>`. */
object ProfShingle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("prof-shingle")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val d = Tables.t(spark, dir, "documents")
      .filter(col("lang") === "en" && col("n_chars") >= 100)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 20)
      .localCheckpoint(true)
    println("docs=" + d.count())
    // 1. plain count of words exploded (baseline explode cost)
    t("explode words")(println("  w=" + d.select(explode(col("words"))).count()))
    // 2. wordGrams k=5 (transform + element_at x5) then explode
    for (i <- 1 to 2)
      t(s"wordGrams5 explode #$i")(println("  s=" + d.select(
        explode(array_distinct(TextFns.wordGrams(col("words"), 5)))).count()))
    // 3. same without array_distinct
    t("wordGrams5 nodistinct")(println("  s=" + d.select(
      explode(TextFns.wordGrams(col("words"), 5))).count()))
    // 4. k=2 for comparison
    t("wordGrams2 explode")(println("  s=" + d.select(
      explode(array_distinct(TextFns.wordGrams(col("words"), 2)))).count()))
    // 5. posexplode words then self-join-free window reconstruction:
    //    explode FIRST, then concat via lead() — window per doc
    t("explode+lead window")({
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val r = d.select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "w")))
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", col("w"), lead("w", 1).over(w), lead("w", 2).over(w),
            lead("w", 3).over(w), lead("w", 4).over(w)).as("shingle"),
          lead("w", 4).over(w).as("ok"))
        .filter(col("ok").isNotNull).select("doc_id", "shingle").distinct()
      println("  s=" + r.count())
    })
    // 6. slice + array_join variant
    t("slice+array_join")(println("  s=" + d.select(explode(array_distinct(
      when(size(col("words")) < 5, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("words")) - 4),
          i => array_join(slice(col("words"), i, lit(5)), " ")))))).count()))
    // 7. the ProfPretrain input shape: md5-window dedup checkpoint,
    //    then split+wordGrams+distinct+explode (was 7.5s there)
    locally {
      import org.apache.spark.sql.expressions.Window
      val d2 = Tables.t(spark, dir, "documents")
        .filter(col("lang") === "en" && col("n_chars") >= 100)
        .select(col("doc_id"), col("text"), col("source"),
          split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 20)
      val wd = Window.partitionBy("fp").orderBy("doc_id")
      val exact = d2
        .withColumn("fp", md5(col("text").cast("binary")))
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") === 1)
        .select("doc_id", "text", "source")
        .localCheckpoint(true)
      println("  exact=" + exact.count())
      for (i <- 1 to 2)
        t(s"exact->wordGrams5 #$i")(println("  s=" + exact
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"),
            explode(array_distinct(TextFns.wordGrams(col("words"), 5))).as("sh"))
          .count()))
      val ex0 = exact
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"),
          explode(array_distinct(TextFns.wordGrams(col("words"), 5))).as("shingle"))
      val a0 = ex0.select(col("shingle"), col("doc_id").as("da"))
      val b0 = ex0.select(col("shingle"), col("doc_id").as("db"))
      t("plain self-join")(println("  j=" + a0.join(b0, "shingle").count()))
      t("hot-key agg")(println("  h=" + a0.groupBy("shingle")
        .agg(count(lit(1)).as("__df")).filter(col("__df") > 20).count()))
      t("salted join")(println("  j=" + Skew.saltedJoinHot(
        a0, b0, "shingle", spreadBy = col("da"), salts = 8,
        hotThreshold = 20).count()))
      t("salted join #2")(println("  j=" + Skew.saltedJoinHot(
        a0, b0, "shingle", spreadBy = col("da"), salts = 8,
        hotThreshold = 20).count()))
    }
    spark.stop()
  }
}
