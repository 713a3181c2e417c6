package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source abstraction (SURVEY §7.5): the engine's operators read tables
  * through this trait so the offline parquet harness and a production
  * MongoDB deployment are interchangeable — swap the source, keep every
  * query. */
trait TableSource {
  /** Read one logical table/collection as a DataFrame. Implementations
    * must normalize timestamps to µs (Spark's native precision). */
  def read(spark: SparkSession, table: String): DataFrame
  /** Tables this source can enumerate (reference A1 catalog scan). */
  def list(spark: SparkSession): Seq[String]
}

/** Directory of `<table>.parquet` files (the harness fixture layout).
  *
  * `nsTimestampCols` names columns stored as TIMESTAMP(NANOS) (which
  * Spark 4 can't read natively): they're read as raw ns via the legacy
  * nanosAsLong flag and integer-divided to µs — float division would
  * corrupt them (2024 epoch-ns > 2^53). Strictly opt-in: with the
  * default empty set no column is touched and no session flag is set,
  * so a plain long column that happens to be named `ts` passes through
  * verbatim (production would carry this annotation in the catalog). */
final case class ParquetDirSource(
    dir: String,
    nsTimestampCols: Set[String] = Set.empty) extends TableSource {
  override def read(spark: SparkSession, table: String): DataFrame = {
    if (nsTimestampCols.nonEmpty) ParquetDirSource.prepareSession(spark)
    val df = spark.read.parquet(s"$dir/$table.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (nsTimestampCols.contains(f.name) && f.dataType == org.apache.spark.sql.types.LongType)
        acc.withColumn(f.name,
          timestamp_micros(expr(s"${f.name} div 1000")).cast("timestamp_ntz"))
      else acc
    }
  }

  override def list(spark: SparkSession): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted
}

object ParquetDirSource {
  private val prepared =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]()

  /** One-time per-session setup for TIMESTAMP(NANOS) columns: the
    * legacy nanosAsLong flag is session-global, so it is set exactly
    * once under computeIfAbsent (concurrent first readers block until
    * the flag is visible instead of racing a scan past an unset flag).
    * Callers that build the session themselves can also pre-set the
    * flag at config time, which makes this a no-op check. */
  def prepareSession(spark: SparkSession): Unit =
    prepared.computeIfAbsent(spark, s => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      java.lang.Boolean.TRUE
    })
}

/** MongoDB source via the Spark MongoDB connector (the production path
  * of the reference, BASELINE.json `spark_approach`). Maps the
  * reference's knobs onto connector options: cursor `batch_size`
  * (main.py:31,301) → the connector's batch size; the single-cursor
  * scan (main.py:297-303) becomes a partitioned read
  * (`SamplePartitioner`), which is the whole reason to run on Spark.
  *
  * Not exercised in this zero-egress harness (no mongod, no connector
  * jar) — construction fails fast if the connector isn't on the
  * classpath; everything downstream of `read` is source-agnostic and IS
  * tested through [[ParquetDirSource]]. */
final case class MongoSource(
    connectionUri: String,
    database: String,
    batchSize: Int = 10000) extends TableSource {

  /** Connector options derived from the reference's knobs — exposed so
    * the mapping is unit-testable without a live mongod/connector jar
    * (reference main.py:31,301: cursor batch_size; single-cursor scan →
    * partitioned read). */
  def readerOptions(table: String): Map[String, String] = Map(
    "spark.mongodb.read.connection.uri" -> connectionUri,
    "spark.mongodb.read.database" -> database,
    "spark.mongodb.read.collection" -> table,
    "spark.mongodb.read.batchSize" -> batchSize.toString,
    "spark.mongodb.read.partitioner" ->
      "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner")

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read
      .format("mongodb")
      .options(readerOptions(table))
      .load()
      .drop("_id") // reference A6 (main.py:107)

  override def list(spark: SparkSession): Seq[String] =
    throw new UnsupportedOperationException(
      "collection listing requires a live MongoClient; wire via config in this harness")
}
