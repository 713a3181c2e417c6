package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over docstore roots — the reference's two-level
  * db→collection namespace (main.py:251,277-281 iterates databases and
  * collections off a client handle) mapped onto Spark's V2 catalog
  * plugin, so the same stores the `docstore` format reads by path
  * resolve by NAME:
  *
  * {{{
  *   spark.sql.catalog.docstore      = graft.sources.DocStoreCatalog
  *   spark.sql.catalog.docstore.root = /data/stores
  *   SELECT * FROM docstore.sales.orders        -- V2 relation
  *   CREATE TABLE docstore.sales.events (…) USING docstore
  *     PARTITIONED BY (year)                    -- declares sink routing
  *   DELETE FROM docstore.sales.orders WHERE …  -- row-level op (table)
  * }}}
  *
  * Layout contract: `<root>/<namespace>/<table>` — a table is either a
  * store DIRECTORY (possibly Hive-partitioned; the usual case) or, for
  * read-compatibility with the harness fixtures' one-file tables, a
  * bare `<table>.parquet` FILE. A namespace is a directory under the
  * root. Metadata lives entirely IN the filesystem layout (a catalog
  * over a real document store would hold a client handle instead —
  * same contract, swap the catalog entry): `CREATE TABLE` materializes
  * the directory plus a `_schema.json` marker carrying the declared
  * schema (an empty store is schemaless otherwise — ACCEPT_ANY_SCHEMA
  * means the first write brings the data schema) and the declared
  * partition columns; a populated store infers schema from footers
  * exactly like the path-based reads, so catalog and path reads can
  * never disagree. */
class DocStoreCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  @transient private lazy val fs =
    new Path(root).getFileSystem(new Configuration())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"docstore catalog '$name' needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def nsPath(ns: Array[String]): Path = {
    require(ns.length == 1,
      s"docstore catalog supports exactly one namespace level (db), got ${ns.mkString(".")}")
    new Path(root, ns(0))
  }

  /** Table dir, or the fixtures' `<name>.parquet` single-file spelling. */
  private def tablePath(ident: Identifier): Option[Path] = {
    val dir = new Path(nsPath(ident.namespace()), ident.name())
    val file = new Path(nsPath(ident.namespace()), ident.name() + ".parquet")
    if (fs.exists(dir)) Some(dir)
    else if (fs.exists(file)) Some(file)
    else None
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).toSeq
      .filter(s => !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .collect {
        case s if s.isDirectory => s.getPath.getName
        case s if s.isFile && s.getPath.getName.endsWith(".parquet") =>
          s.getPath.getName.stripSuffix(".parquet")
      }
      .sorted
      .map(n => Identifier.of(namespace, n))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = tablePath(ident) match {
    case None => throw new NoSuchTableException(ident)
    case Some(p) =>
      val marker = SchemaMarker.read(fs, p)
      val inferred = DocStore.inferStoreSchema(p.toString)
      // a populated store's footers win for DATA columns (catalog and
      // path reads must never disagree); the marker covers the
      // declared-but-still-empty window, remembers the partition
      // routing, supplies the declared TYPE of each partition
      // column — directory values are untyped text, and the reader
      // casts them back per the table schema (PARTITIONED BY (y INT)
      // reads as int through the catalog, as string via bare paths) —
      // and carries ALTER TABLE's declared evolution: columns ADDED
      // before any file holds them append at the end (files read them
      // as null), and a marker bigint over inferred int is the
      // declared WIDENING (old int pages widen at the reader)
      val schema =
        if (inferred.isEmpty) marker.map(_.schema).getOrElse(new StructType())
        else marker match {
          case Some(m) =>
            val merged = inferred.fields.map { f =>
              if (m.partitionBy.contains(f.name))
                m.schema.fields.find(_.name == f.name).getOrElse(f)
              else m.schema.fields.find(_.name == f.name) match {
                case Some(mf) if f.dataType == IntegerType &&
                  mf.dataType == LongType => mf
                case _ => f
              }
            }
            val extras = m.schema.fields.filterNot(mf =>
              inferred.fieldNames.contains(mf.name))
            StructType(merged ++ extras)
          case None => inferred
        }
      DocStoreTable(p.toString, schema,
        marker.map(_.partitionBy).getOrElse(Nil))
  }

  /** SQL time travel — `SELECT … FROM t VERSION AS OF 3`: load the
    * table pinned at snapshot v3 (snapshot-enabled stores only; the
    * scan lists that manifest). */
  override def loadTable(ident: Identifier, version: String): Table =
    loadTable(ident) match {
      case t: DocStoreTable =>
        require(DocStore.snapshotEnabled(t.path),
          s"docstore: ${ident.name()} is not snapshot-enabled — " +
            "VERSION AS OF needs a store written with snapshots=true")
        t.copy(versionAsOf = Some(version.trim.toLong))
      case other => other
    }

  /** SQL time travel — `… TIMESTAMP AS OF '…'` (micros since epoch):
    * resolves to the newest snapshot COMMITTED at or before the
    * instant, via the commit timestamp each manifest carries in its
    * `#ts` header — the same timestamp→version mapping every table
    * format keeps in its metadata log, and robust where file mtimes
    * are not (copy/rsync/restore resets mtimes; `#ts` travels with
    * the bytes). Pre-r16 manifests without the header fall back to
    * mtime; a version vacuumed between listing and read is skipped,
    * not a raw FileNotFoundException. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadTable(ident) match {
      case t: DocStoreTable =>
        require(DocStore.snapshotEnabled(t.path),
          s"docstore: ${ident.name()} is not snapshot-enabled — " +
            "TIMESTAMP AS OF needs a store written with snapshots=true")
        val v = DocStore.versionAtMillis(t.path, timestampMicros / 1000L)
          .getOrElse(throw new IllegalArgumentException(
            s"docstore: no snapshot of ${ident.name()} existed at " +
              s"timestamp $timestampMicros µs"))
        t.copy(versionAsOf = Some(v))
      case other => other
    }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    if (tablePath(ident).isDefined) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case t => throw new UnsupportedOperationException(
        s"docstore tables partition by identity transforms only, got $t")
    }
    partCols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"partition column '$c' not in the table schema")
      val dt = schema(c).dataType
      require(Seq("string", "int", "bigint", "boolean", "date")
        .contains(dt.simpleString),
        s"docstore partition column '$c' must be string/int/bigint/boolean/date, got $dt")
    }
    val dir = new Path(nsPath(ident.namespace()), ident.name())
    fs.mkdirs(dir)
    SchemaMarker.write(fs, dir, SchemaMarker(schema, partCols))
    DocStoreTable(dir.toString, schema, partCols)
  }

  /** SQL-native SAFE schema evolution — the DDL face of the store's
    * mergeSchema contract: `ALTER TABLE … ADD COLUMNS (c T)` (nullable,
    * top-level, appended — existing files read the column as null) and
    * `ALTER COLUMN c TYPE BIGINT` over int (old INT32 pages widen at
    * the reader). The change lands in the `_schema.json` marker;
    * loadTable merges it over the footers, so reads see the evolved
    * schema immediately and the next INSERT writes it. Populated PLAIN
    * stores refuse (new files would drift from old with no manifest to
    * reconcile through); anything beyond add-nullable / widen-int
    * refuses — same rules the write-side validation enforces. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident).getOrElse(throw new NoSuchTableException(ident))
    require(!p.getName.endsWith(".parquet"),
      s"docstore: ${ident.name()} is a single-file fixture table; ALTER needs a store directory")
    val cur = loadTable(ident).asInstanceOf[DocStoreTable]
    val populated = DocStore.listFiles(p.toString).nonEmpty
    require(!populated || DocStore.snapshotEnabled(p.toString),
      s"docstore: ALTER TABLE on a populated PLAIN store would strand " +
        "readers (post-ALTER files drift from pre-ALTER ones with no " +
        "manifest to reconcile through) — enable snapshots first " +
        "(DocStoreMaintenance.enableSnapshots)")
    var schema = cur.tableSchema
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "docstore: ADD COLUMNS supports top-level columns only, got " +
            add.fieldNames().mkString("."))
        val name = add.fieldNames()(0)
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"docstore: column '$name' already exists")
        require(add.isNullable,
          s"docstore: added column '$name' must be nullable — existing rows read it as null")
        schema = schema.add(StructField(name, add.dataType(), nullable = true))
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames().length == 1,
          "docstore: ALTER COLUMN TYPE supports top-level columns only")
        val name = upd.fieldNames()(0)
        val f = schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
          throw new IllegalArgumentException(s"docstore: no column '$name'"))
        require(f.dataType == IntegerType && upd.newDataType() == LongType,
          s"docstore: only int→bigint widening is a safe type change " +
            s"(got ${f.dataType.simpleString} → ${upd.newDataType().simpleString})")
        require(!cur.tablePartitionBy.contains(f.name),
          s"docstore: cannot widen partition column '$name' (directory values are text)")
        schema = StructType(schema.fields.map(x =>
          if (x.name == f.name) x.copy(dataType = LongType) else x))
      case other => throw new UnsupportedOperationException(
        s"docstore: unsupported ALTER TABLE change $other — safe evolution " +
          "is ADD COLUMNS (nullable) and ALTER COLUMN TYPE int→bigint")
    }
    SchemaMarker.write(fs, p, SchemaMarker(schema, cur.tablePartitionBy))
    DocStoreTable(p.toString, schema, cur.tablePartitionBy)
  }

  override def dropTable(ident: Identifier): Boolean = tablePath(ident) match {
    case Some(p) => fs.delete(p, true)
    case None => false
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tablePath(from).getOrElse(throw new NoSuchTableException(from))
    if (tablePath(to).isDefined) throw new TableAlreadyExistsException(to)
    val dstDir = nsPath(to.namespace())
    if (!fs.exists(dstDir)) throw new NoSuchNamespaceException(to.namespace())
    val dst = new Path(dstDir,
      if (src.getName.endsWith(".parquet")) to.name() + ".parquet" else to.name())
    require(fs.rename(src, dst), s"docstore: rename $src -> $dst failed")
  }

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    if (!fs.exists(r)) Array.empty
    else fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => Array(s.getPath.getName))
      .sortBy(_.head)
      .toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // one level only
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(
      namespace: Array[String], metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace)): Unit
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("docstore namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace(0)} is not empty")
    fs.delete(p, true)
  }
}

/** The `_schema.json` table marker: declared schema + partition
  * routing, written by CREATE TABLE so a declared-but-empty table has
  * a schema before its first write and a catalog write routes into
  * the declared partitions. Underscore-prefixed → invisible to every
  * listing. Serialized via StructType's own json round-trip. */
case class SchemaMarker(schema: StructType, partitionBy: Seq[String])

object SchemaMarker {
  private val FILE = "_schema.json"

  def write(fs: org.apache.hadoop.fs.FileSystem, dir: Path, m: SchemaMarker): Unit = {
    val out = fs.create(new Path(dir, FILE), true)
    try out.write(
      s"""{"partitionBy":${m.partitionBy.map(p => "\"" + p + "\"").mkString("[", ",", "]")},
         |"schema":${m.schema.json}}""".stripMargin.getBytes("UTF-8"))
    finally out.close()
  }

  def read(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Option[SchemaMarker] = {
    val p = new Path(dir, FILE)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // partitionBy is a flat string array; the schema is StructType json
    val pb = """"partitionBy"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    val cols = "\"([^\"]*)\"".r.findAllMatchIn(pb).map(_.group(1)).toSeq
    val schemaJson = text.substring(text.indexOf("\"schema\":") + 9).stripSuffix("}")
    Some(SchemaMarker(
      org.apache.spark.sql.types.DataType.fromJson(schemaJson).asInstanceOf[StructType],
      cols))
  }
}
