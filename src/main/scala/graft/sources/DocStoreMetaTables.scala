package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES — the table format's state readable AS TABLES, the
  * Iceberg `db.table.files` / Delta `DESCRIBE DETAIL` idiom:
  *
  * {{{
  *   SELECT * FROM docstore.sales.orders.files       -- live data files
  *   SELECT * FROM docstore.sales.orders.partitions  -- per-partition rollup
  *   SELECT * FROM docstore.sales.orders.history     -- commit log
  *   SELECT * FROM docstore.sales.orders.refs        -- branches + tags
  *   SELECT * FROM docstore.sales.orders.manifests   -- current chain
  * }}}
  *
  * The catalog resolves a THREE-level identifier whose first two
  * levels name a real table and whose last is a reserved kind (the
  * same trick Iceberg's SparkCatalog uses — `db.t.files` arrives as
  * namespace=[db,t], name=files).
  *
  * Scale posture: row content answers from the SAME manifest state the
  * planner already holds on the driver (entries + `#stat` + `#dv`
  * lines — zero parquet footers on a snapshot store; plain stores fall
  * back to footers, their only source of truth), and materialization
  * is DISTRIBUTED: rows ship to executors in chunked input partitions
  * so a million-file `files` query aggregates like any other table
  * instead of collapsing onto the driver. DV cardinalities read from
  * the 12-byte sidecar headers, never the vectors. */
case class DocStoreMetaTable(path: String, kind: String,
    versionAsOf: Option[Long] = None)
    extends Table with SupportsRead {

  override def name(): String =
    s"$path#$kind${versionAsOf.map(v => s"@v$v").getOrElse("")}"
  override def schema(): StructType = DocStoreMetaTable.schemaOf(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = schema()
        override def toBatch: Batch = this
        override def description(): String = s"docstore-meta $kind $path"
        override def planInputPartitions(): Array[InputPartition] = {
          val rows = DocStoreMetaTable.rowsOf(path, kind, versionAsOf)
          if (rows.isEmpty) Array(DocStoreMetaChunk(Array.empty))
          else rows.grouped(4096)
            .map(ch => DocStoreMetaChunk(ch.toArray): InputPartition).toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          DocStoreMetaReaderFactory()
      }
    }
}

/** One chunk of pre-computed metadata rows (plain JVM values — strings
  * stay `String` until the executor-side reader internalizes them). */
case class DocStoreMetaChunk(rows: Array[Array[Any]]) extends InputPartition

case class DocStoreMetaReaderFactory() extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[DocStoreMetaChunk].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        })
      override def close(): Unit = ()
    }
}

object DocStoreMetaTable {

  /** The reserved last-level names `db.t.<kind>` resolves. */
  val kinds: Set[String] = Set("files", "partitions", "history", "refs", "manifests")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("partition", StringType, nullable = true),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("dv_file", StringType, nullable = true),
      StructField("dv_rows", LongType, nullable = false)))
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = true),
      StructField("n_files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("dv_rows", LongType, nullable = false)))
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("commit_ts", TimestampType, nullable = true),
      StructField("op", StringType, nullable = false),
      StructField("n_added", LongType, nullable = false),
      StructField("n_retired", LongType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_dvs", LongType, nullable = false),
      StructField("dv_rows", LongType, nullable = false)))
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case "manifests" => StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("manifest", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"docstore: unknown metadata table '$other' — one of ${kinds.toSeq.sorted.mkString(", ")}")
  }

  /** `file` / `partition` / rows / bytes / dv per live file — stat
    * lines first, footers only where no stat exists (plain stores).
    * `asOf` pins the walk at a historical snapshot (time travel on
    * metadata: "what files did version 3 hold, and what DVs bound?"). */
  private def fileRows(path: String, asOf: Option[Long])
      : Seq[(String, String, Long, Long, Option[String], Long)] = {
    val listing = DocStore.listFilesWithPartitions(path, asOf)
    val snap =
      if (!DocStore.snapshotEnabled(path)) None
      else asOf.map(v => (v, Seq.empty[String])).orElse(DocStore.currentSnapshot(path))
    val stats = snap.map { case (v, _) => DocStore.readManifestStats(path, v) }
      .getOrElse(Map.empty)
    val dvs = DocStore.dvMap(path, asOf)
    listing.map { case (abs, parts) =>
      // single-file fixture stores have no rel form — the basename is
      // the display name and carries no stat/DV binding by definition
      val rel =
        if (snap.isDefined) DocStore.relOf(path, abs)
        else if (abs == path) new Path(abs).getName
        else abs.stripPrefix(path).stripPrefix("/")
      val partStr = parts.map { case (k, v) => s"$k=$v" }.mkString("/") match {
        case "" => null
        case s => s
      }
      val (rows, bytes) = stats.get(rel) match {
        case Some(st) => (st.rows, st.bytes)
        case None =>
          val bs = DocStore.footerBlocks(abs)
          (bs.map(_.getRowCount).sum, bs.map(_.getTotalByteSize).sum)
      }
      val dv = dvs.get(rel)
      val dvRows = dv.map(r =>
        DocStore.dvCardinality(new Path(path, r).toString)).getOrElse(0L)
      (rel, partStr, rows, bytes, dv, dvRows)
    }
  }

  def rowsOf(path: String, kind: String,
      asOf: Option[Long] = None): Seq[Array[Any]] = kind match {
    case "files" =>
      fileRows(path, asOf).map { case (f, p, r, b, dv, dr) =>
        Array[Any](f, p, r, b, dv.orNull, dr)
      }
    case "partitions" =>
      fileRows(path, asOf).groupBy(_._2).toSeq
        .sortBy(t => Option(t._1).getOrElse(""))
        .map { case (p, fs) =>
          Array[Any](p, fs.size.toLong, fs.map(_._3).sum, fs.map(_._4).sum,
            fs.map(_._6).sum)
        }
    case "history" =>
      if (!DocStore.snapshotEnabled(path)) Nil
      else DocStoreMaintenance.historyRows(path)
        .filter(row => asOf.forall(row._1 <= _)).map {
        case (v, ts, op, a, r, n, nd, dr) =>
          Array[Any](v, ts.map(ms => Long.box(ms * 1000L)).orNull, op, a, r, n, nd, dr)
      }
    case "refs" =>
      // refs are CURRENT state by definition — no historical ref log
      // exists to answer "what did the pointers say at version 3"
      require(asOf.isEmpty,
        "docstore: the refs metadata table is current-state only — " +
          "VERSION/TIMESTAMP AS OF does not apply to ref pointers")
      (DocStore.listRefs(path).toSeq.map { case (n, v) => (n, "branch", v) } ++
        DocStore.listTags(path).toSeq.map { case (n, v) => (n, "tag", v) })
        .sortBy(t => (t._1, t._2))
        .map { case (n, t, v) => Array[Any](n, t, v) }
    case "manifests" =>
      if (!DocStore.snapshotEnabled(path)) Nil
      else (for {
        v <- asOf.orElse(DocStore.currentSnapshot(path).map(_._1)).toSeq
        st <- DocStore.snapState(path, v).toSeq
        (m, i) <- st.chain.zipWithIndex
      } yield {
        val f = new Path(new Path(path, DocStore.SnapshotDir), m)
        val len =
          try f.getFileSystem(new org.apache.hadoop.conf.Configuration())
            .getFileStatus(f).getLen
          catch { case _: java.io.IOException => 0L }
        Array[Any](i, m, len)
      })
    case other => throw new IllegalArgumentException(
      s"docstore: unknown metadata table '$other'")
  }
}
