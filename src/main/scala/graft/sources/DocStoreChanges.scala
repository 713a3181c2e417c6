package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
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
  *    format doesn't store; churn over silence, never silent loss);
  *  - `rowdelta` commits (merge-on-read DELETE/UPDATE/MERGE) emit
  *    exactly the rows their deletion-vector DELTA names as `delete`
  *    — no file-level churn, because no data file was rewritten —
  *    plus any new files' rows as `insert` and any fully-deleted
  *    (hence retired) files' surviving rows as `delete`.
  *
  * Deletion vectors thread through every leg: rows a version's DV had
  * already deleted never re-emit (an insert leg excludes the version's
  * own DV; a retired file's delete leg excludes the PREVIOUS version's
  * DV — those deletes were emitted when their rowdelta committed).
  *
  * Each change row carries the table columns plus `_change_type`
  * (insert | delete) and `_commit_version`. Consumed as a BATCH read
  * (`changes(spark, path, from, to)`) — the incremental-ETL driver
  * pattern: checkpoint the last version you processed, feed the next
  * range through the same transformations as the full table.
  *
  * PATH-level semantics: the feed reads files directly, so columns
  * surface under their PHYSICAL (as-written) names — a catalog table
  * renamed via column IDs emits pre-rename legs under the old name
  * (consumers that need current names read through the catalog or
  * apply the marker's mapping). Rename-free stores — the normal case
  * for CDC consumers — are unaffected.
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
    def dvPositions(v: Long): Map[String, Array[Long]] =
      DocStore.readManifestDvs(path, v).map { case (rel, dvRel) =>
        rel -> DocStore.readDv(new Path(path, dvRel).toString)
      }
    // A leg: (version, change type, files, per-file DV positions,
    // include?) — include=true emits ONLY the listed positions (a
    // rowdelta's delta), include=false skips them (already deleted).
    val legSpecs: Seq[(Long, String, Seq[String], Map[String, Array[Long]], Boolean)] =
      ((fromVersion + 1) to toVersion).flatMap { v =>
        val cur = manifest(v)
        val prev = manifest(v - 1).toSet
        val added = cur.filterNot(prev)
        val retired = (prev -- cur.toSet).toSeq.sorted
        lazy val dvPrev = dvPositions(v - 1)
        lazy val dvCur = dvPositions(v)
        DocStore.commitOp(path, v) match {
          case "append" => Seq((v, "insert", added, dvCur, false))
          case "delete" => Seq((v, "delete", retired, dvPrev, false))
          case "compact" => Nil // bytes rewritten, no data changed
          case "rowdelta" =>
            // still-present files whose DV grew: the delta IS the change
            val delta = dvCur.flatMap { case (rel, ps) =>
              if (!cur.contains(rel)) None
              else {
                val before = dvPrev.getOrElse(rel, Array.emptyLongArray).toSet
                val d = ps.filterNot(before)
                if (d.isEmpty) None else Some(rel -> d)
              }
            }
            Seq(
              (v, "delete", retired, dvPrev, false),
              (v, "delete", delta.keys.toSeq.sorted, delta, true),
              (v, "insert", added, Map.empty[String, Array[Long]], false))
          case _ => // merge / overwrite / unknown: full rewrite semantics
            Seq((v, "delete", retired, dvPrev, false),
              (v, "insert", added, dvCur, false))
        }
      }.filter(_._3.nonEmpty)
    // One reconciled schema (add-nullable + int→bigint widening) over
    // exactly the files the legs touch — NOT the current listing,
    // which an overwrite commit may have moved past columns the
    // historical legs still carry. Every leg aligns to it, so widened
    // stores feed one change stream. Data columns only: partition
    // columns are directory-encoded (never in footers) and re-attach
    // per group below.
    val dataSchema = DocStore.reconcileSchemas(
      DocStore.resolveRels(path, legSpecs.flatMap(_._3).distinct.sorted)
        .map { case (file, _) =>
          file -> DocStore.toStructType(DocStore.fileSchema(file)) })
    val legs = legSpecs.flatMap { case (v, tpe, rels, dvPos, include) =>
      read(spark, path, rels, tpe, v, dataSchema, dvPos, include)
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
    * semantics. Within a partition group, files sub-group by their
    * FOOTER schema and each uniform sub-group aligns to the store's
    * reconciled schema (null-fill added columns, cast under the
    * int→bigint widening) — Spark's builtin `mergeSchema` cannot merge
    * IntegerType with LongType, so a leg spanning a widening would
    * otherwise fail even though the docstore reader handles it. */
  private def read(spark: SparkSession, path: String, rels: Seq[String],
      tpe: String, v: Long, dataSchema: StructType,
      dvPos: Map[String, Array[Long]], include: Boolean): Seq[DataFrame] =
    DocStore.resolveRels(path, rels).groupBy(_._2).toSeq
      .sortBy(_._1.map(_._2).mkString("/"))
      .flatMap { case (pv, files) =>
        files.groupBy(f => DocStore.toStructType(DocStore.fileSchema(f._1)))
          .toSeq.sortBy(_._2.head._1)
          .map { case (fileSch, schemaFiles) =>
            val base = spark.read.schema(fileSch)
              .parquet(schemaFiles.map(_._1): _*)
            // deletion-vector application through the builtin reader:
            // join the hidden (_metadata.file_name, row_index) pair
            // against the driver-read positions — SEMI keeps exactly a
            // rowdelta's delta rows, ANTI drops already-deleted rows.
            // File names are UUID-unique within a store, so the name
            // (not the URI-scheme-sensitive full path) is the join key.
            val relsHere = schemaFiles.map(f => DocStore.relOf(path, f._1)).toSet
            val pairs = dvPos.toSeq
              .filter { case (rel, _) => relsHere(rel) }
              .flatMap { case (rel, ps) =>
                val name = rel.split("/").last
                ps.map(p => (name, p))
              }
            val dved =
              if (pairs.isEmpty && !include) base
              else {
                import spark.implicits._
                val posDf = pairs.toDF("__dv_name", "__dv_idx")
                base.join(posDf,
                  base("_metadata.file_name") === posDf("__dv_name") &&
                    base("_metadata.row_index") === posDf("__dv_idx"),
                  if (include) "left_semi" else "left_anti")
              }
            val aligned = dved.select(dataSchema.fields.toSeq.map { fld =>
              fileSch.find(_.name == fld.name) match {
                case Some(have) if have.dataType == fld.dataType =>
                  col(fld.name)
                case Some(_) => col(fld.name).cast(fld.dataType).as(fld.name)
                case None => lit(null).cast(fld.dataType).as(fld.name)
              }
            }: _*)
            val withPv = pv.foldLeft(aligned) { case (d, (k, value)) =>
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
}
