package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CHANGE DATA FEED over snapshot manifests: row-level changes between
  * two versions, derived entirely from what the store already records
  * — each commit's manifest diff says WHICH files appeared/retired,
  * and its `#op` header says WHY, which is the difference between
  * data change and byte shuffling:
  *
  *  - `append` commits emit their added files' rows as `insert`;
  *  - `delete` commits (metadata-only partition DELETE) emit their
  *    retired files' rows as `delete` — the files are retained for
  *    time travel, so the deleted ROWS are still readable;
  *  - `compact` commits emit NOTHING (bytes moved, no row changed —
  *    Delta's `dataChange=false` distinction, which is what keeps a
  *    downstream incremental consumer from reprocessing the whole
  *    table every time maintenance runs);
  *  - `merge`/`overwrite`/`unknown` (copy-on-write rewrites and
  *    pre-`#op` manifests) emit retired rows as `delete` and added
  *    rows as `insert` — an update appears as its delete+insert pair
  *    (row-matched pre/post images would need per-row lineage the
  *    format doesn't store; churn over silence, never silent loss).
  *
  * Each change row carries the table columns plus `_change_type`
  * (insert | delete) and `_commit_version`. Consumed as a BATCH read
  * (`changes(spark, path, from, to)`) — the incremental-ETL driver
  * pattern: checkpoint the last version you processed, feed the next
  * range through the same transformations as the full table.
  *
  * Reference anchor: the reference re-extracts full collections on a
  * date window (main.py:288-299); a change feed is what replaces the
  * re-extract once the store is the system of record. */
object DocStoreChanges {

  /** Changes committed in versions (fromVersion, toVersion] — the
    * half-open contract that makes ranges chainable:
    * changes(a,b) ∪ changes(b,c) = changes(a,c). Every version in the
    * range (and fromVersion itself, as the diff anchor, unless 0)
    * must still be retained; vacuum-expired history errors clearly. */
  def changes(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(DocStore.snapshotEnabled(path),
      s"docstore: change feed needs a snapshot store ($path has no ${DocStore.SnapshotDir}/)")
    require(0 <= fromVersion && fromVersion <= toVersion,
      s"docstore: bad change range ($fromVersion, $toVersion]")
    def manifest(v: Long): Seq[String] =
      if (v == 0L) Nil
      else DocStore.readManifest(path, v).getOrElse(
        throw new IllegalArgumentException(
          s"docstore: change feed needs snapshot v$v of $path but it is " +
            "not committed/retained (expired by vacuum?) — raise vacuum " +
            "keepVersions above the consumer's lag"))
    val legs = ((fromVersion + 1) to toVersion).flatMap { v =>
      val cur = manifest(v)
      val prev = manifest(v - 1).toSet
      val added = cur.filterNot(prev)
      val retired = (prev -- cur.toSet).toSeq.sorted
      DocStore.commitOp(path, v) match {
        case "append" => read(spark, path, added, "insert", v)
        case "delete" => read(spark, path, retired, "delete", v)
        case "compact" => Nil // bytes rewritten, no data changed
        case _ => // merge / overwrite / unknown: full rewrite semantics
          read(spark, path, retired, "delete", v) ++
            read(spark, path, added, "insert", v)
      }
    }
    legs.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse {
        val schema = StructType(DocStore.inferStoreSchema(path).fields.toSeq ++
          Seq(StructField("_change_type", StringType, nullable = false),
            StructField("_commit_version", LongType, nullable = false)))
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      }
  }

  /** One change leg: the rows of `rels` stamped with the change type
    * and commit version. Files group by their partition values so the
    * directory-encoded columns re-attach as EXACT literals (the
    * directory text, not re-parsed), matching the connector's read
    * semantics; per-group parquet reads merge schemas so evolved
    * stores feed one change stream. */
  private def read(spark: SparkSession, path: String, rels: Seq[String],
      tpe: String, v: Long): Seq[DataFrame] =
    DocStore.resolveRels(path, rels).groupBy(_._2).toSeq
      .sortBy(_._1.map(_._2).mkString("/"))
      .map { case (pv, files) =>
        val base = spark.read.option("mergeSchema", "true")
          .parquet(files.map(_._1): _*)
        val withPv = pv.foldLeft(base) { case (d, (k, value)) =>
          d.withColumn(k,
            if (value == DocStore.HiveDefaultPartition)
              lit(null).cast(StringType)
            else lit(value))
        }
        withPv
          .withColumn("_change_type", lit(tpe))
          .withColumn("_commit_version", lit(v))
      }
}
