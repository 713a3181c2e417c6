package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-NATIVE maintenance surface — `CALL docstore.system.<proc>(…)`
  * through Spark's DSv2 procedure machinery (ProcedureCatalog /
  * UnboundProcedure / BoundProcedure, the API Iceberg's procedures
  * ride), so an operator schedules compaction, retention, and audits
  * without ever leaving SQL:
  *
  * {{{
  *   CALL docstore.system.compact(table => 'db.t')
  *   CALL docstore.system.vacuum(table => 'db.t', keep_versions => 3)
  *   CALL docstore.system.orphan_sweep(table => 'db.t')
  *   CALL docstore.system.history(table => 'db.t')
  *   CALL docstore.system.enable_snapshots(table => 'db.t')
  * }}}
  *
  * Each procedure resolves `table` ('db.table') under the catalog's
  * root and delegates to [[DocStoreMaintenance]] — the SQL face and
  * the Scala API share one implementation, so every maintenance spec
  * binds both. Results come back as rows (a [[LocalScan]]): a
  * maintenance run that reports nothing is a maintenance run nobody
  * can audit. */
object DocStoreProcedures {

  val names: Seq[String] = Seq(
    "compact", "vacuum", "orphan_sweep", "history", "enable_snapshots",
    "set_partition_spec", "create_branch", "fast_forward",
    "create_tag", "drop_tag")

  def load(root: String, name: String): Option[UnboundProcedure] = {
    def pathOf(table: String): String = {
      val parts = table.split("\\.", 2)
      require(parts.length == 2,
        s"docstore: procedure table argument must be 'db.table', got '$table'")
      val p = new Path(new Path(root, parts(0)), parts(1))
      require(p.getFileSystem(new org.apache.hadoop.conf.Configuration()).exists(p),
        s"docstore: no table at $p")
      p.toString
    }
    def in(n: String, t: DataType) = ProcedureParameter.in(n, t).build()
    def inDef(n: String, t: DataType, d: String) =
      ProcedureParameter.in(n, t).defaultValue(d).build()
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
    name match {
      case "compact" => Some(proc("compact",
        "bin-pack small files and materialize deletion vectors; one atomic " +
          "commit. dv_fraction > 0 rewrites only files whose DELETED " +
          "fraction exceeds it (the DV-debt heuristic)",
        Array(in("table", StringType),
          inDef("smaller_than", LongType, (128L << 20).toString),
          inDef("sort_by", StringType, "''"),
          inDef("dv_fraction", DoubleType, "0.0D")),
        StructType(Seq(
          StructField("partitions_compacted", IntegerType, nullable = false),
          StructField("files_in", IntegerType, nullable = false),
          StructField("files_out", IntegerType, nullable = false),
          StructField("version", LongType, nullable = true))),
        args => {
          val sortBy = str(args, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val st = DocStoreMaintenance.compact(SparkSession.active,
            pathOf(str(args, 0)), smallerThan = args.getLong(1), sortBy = sortBy,
            dvFraction = args.getDouble(3))
          Array[InternalRow](new GenericInternalRow(Array[Any](
            st.partitionsCompacted, st.filesIn, st.filesOut,
            st.version.map(Long.box).orNull)))
        }))
      case "vacuum" => Some(proc("vacuum",
        "expire old snapshots and reclaim unreferenced data files and DV sidecars",
        Array(in("table", StringType),
          inDef("keep_versions", IntegerType, "1"),
          inDef("grace_ms", LongType, (10L * 60 * 1000).toString)),
        StructType(Seq(StructField("files_deleted", IntegerType, nullable = false))),
        args => {
          val n = DocStoreMaintenance.vacuum(pathOf(str(args, 0)),
            keepVersions = args.getInt(1), graceMs = args.getLong(2))
          Array[InternalRow](new GenericInternalRow(Array[Any](n)))
        }))
      case "orphan_sweep" => Some(proc("orphan_sweep",
        "GC failed-commit litter without expiring any version",
        Array(in("table", StringType),
          inDef("grace_ms", LongType, (10L * 60 * 1000).toString)),
        StructType(Seq(StructField("items_removed", IntegerType, nullable = false))),
        args => {
          val n = DocStoreMaintenance.orphanSweep(pathOf(str(args, 0)),
            graceMs = args.getLong(1))
          Array[InternalRow](new GenericInternalRow(Array[Any](n)))
        }))
      case "history" => Some(proc("history",
        "commit history from the manifests: version, wall-clock, op, " +
          "file-count diffs, and merge-on-read debt (DV'd files + hidden rows)",
        Array(in("table", StringType)),
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("commit_ts", TimestampType, nullable = true),
          StructField("op", StringType, nullable = false),
          StructField("n_added", LongType, nullable = false),
          StructField("n_retired", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false),
          StructField("n_dvs", LongType, nullable = false),
          StructField("dv_rows", LongType, nullable = false))),
        args => DocStoreMaintenance.historyRows(pathOf(str(args, 0))).map {
          case (v, ts, op, added, retired, files, nDvs, dvRows) =>
            new GenericInternalRow(Array[Any](v,
              ts.map(ms => Long.box(ms * 1000L)).orNull,
              UTF8String.fromString(op), added, retired, files,
              nDvs, dvRows)): InternalRow
        }.toArray))
      case "set_partition_spec" => Some(proc("set_partition_spec",
        "partition evolution: re-point write routing (e.g. 'year' -> " +
          "'year,month') without rewriting existing files",
        Array(in("table", StringType), in("spec", StringType)),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        args => {
          val table = str(args, 0)
          val p = pathOf(table)
          val cols = str(args, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val v = DocStoreMaintenance.setPartitionSpec(p, cols)
          // catalog-managed tables keep their marker in step: routing
          // AND schema (new partition columns append as the directory
          // type, string — INSERTs provide them, the sink strips them
          // into the path)
          val dir = new Path(p)
          val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
          SchemaMarker.read(fs, dir).foreach { m0 =>
            var m = m0.withIds
            cols.filterNot(m.schema.fieldNames.contains).foreach { c =>
              m = m.copy(
                schema = m.schema.add(StructField(c, StringType, nullable = true)),
                nameMap = m.nameMap + (c -> m.nextId), nextId = m.nextId + 1)
            }
            SchemaMarker.write(fs, dir, m.copy(partitionBy = cols))
          }
          Array[InternalRow](new GenericInternalRow(Array[Any](v)))
        }))
      case "create_branch" => Some(proc("create_branch",
        "write-audit-publish: create a named branch ref at the current " +
          "published head (or from_version); branch writes stay invisible " +
          "to default readers until fast_forward",
        Array(in("table", StringType), in("branch", StringType),
          inDef("from_version", LongType, "-1L")),
        StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        args => {
          val from = args.getLong(2)
          val v = DocStoreMaintenance.createBranch(pathOf(str(args, 0)),
            str(args, 1), if (from < 0L) None else Some(from))
          Array[InternalRow](new GenericInternalRow(Array[Any](
            UTF8String.fromString(str(args, 1)), v)))
        }))
      case "fast_forward" => Some(proc("fast_forward",
        "publish a branch: move `to` (default main) to the branch's head " +
          "— refused unless the move is along lineage",
        Array(in("table", StringType), in("branch", StringType),
          inDef("to", StringType, s"'${DocStore.MainRef}'")),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        args => Array[InternalRow](new GenericInternalRow(Array[Any](
          DocStoreMaintenance.fastForward(pathOf(str(args, 0)),
            str(args, 1), str(args, 2)))))))
      case "create_tag" => Some(proc("create_tag",
        "pin a committed version under an IMMUTABLE name (audit/release " +
          "anchor): reads via the tag= option always see exactly that " +
          "snapshot, and vacuum keeps it alive until drop_tag",
        Array(in("table", StringType), in("tag", StringType),
          inDef("version", LongType, "-1L")),
        StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        args => {
          val p = pathOf(str(args, 0))
          val v0 = args.getLong(2)
          val v = if (v0 >= 0L) v0
            else DocStore.currentSnapshot(p).map(_._1).getOrElse(
              throw new IllegalArgumentException(
                s"docstore: $p has no committed snapshot to tag"))
          DocStore.createTag(p, str(args, 1), v)
          Array[InternalRow](new GenericInternalRow(Array[Any](
            UTF8String.fromString(str(args, 1)), v)))
        }))
      case "drop_tag" => Some(proc("drop_tag",
        "remove a tag — its pinned version becomes vacuum-expirable again",
        Array(in("table", StringType), in("tag", StringType)),
        StructType(Seq(StructField("dropped", BooleanType, nullable = false))),
        args => Array[InternalRow](new GenericInternalRow(Array[Any](
          DocStore.dropTag(pathOf(str(args, 0)), str(args, 1)))))))
      case "enable_snapshots" => Some(proc("enable_snapshots",
        "bootstrap snapshot mode: the current listing becomes version 1",
        Array(in("table", StringType)),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        args => Array[InternalRow](new GenericInternalRow(Array[Any](
          DocStoreMaintenance.enableSnapshots(pathOf(str(args, 0))))))))
      case _ => None
    }
  }

  private def proc(procName: String, doc: String,
      params: Array[ProcedureParameter], outSchema: StructType,
      run: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = doc
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            java.util.Collections.singletonList[Scan](
              DocStoreProcedureResult(outSchema, run(input))).iterator()
        }
    }
}

/** Driver-local procedure result rows. */
case class DocStoreProcedureResult(schema: StructType,
    out: Array[InternalRow]) extends LocalScan {
  override def rows(): Array[InternalRow] = out
  override def readSchema(): StructType = schema
}
