package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate, Operators}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `docstore` — an in-repo DataSource V2 connector with the scan
  * contract of a document-store connector (the reference's production
  * read path is the MongoDB Spark connector; reference
  * main.py:288-299 ships the per-collection date range to the server
  * as `$gte`/`$lte` so mongod — not the client — drops out-of-range
  * documents). This source exercises that exact contract against the
  * harness fixtures without a network:
  *
  *  - [[SupportsPushDownFilters]]: comparison/IN/IsNotNull predicates
  *    on flat columns cross the connector boundary and are evaluated
  *    by the "server" (parquet row-group statistics pruning + exact
  *    record-level filtering via `FilterApi`), never re-checked by
  *    Spark — `pushFilters` returns only genuinely unsupported
  *    predicates as residual, so a fully-pushed query plans with NO
  *    post-scan Filter node (ScaleSpec pins this).
  *  - [[SupportsPushDownRequiredColumns]]: the projected column set is
  *    handed to the reader, which materializes ONLY those parquet
  *    columns (plus any filter-only columns, which are read for
  *    evaluation but never returned) — the document-store analogue of
  *    a Mongo projection document.
  *  - Splits: one [[InputPartition]] per parquet row group per file
  *    (a directory of files fans out across files AND row groups), so
  *    a 1000-executor cluster reads a 100 TB store with one task per
  *    row group — the same shape the Mongo connector produces with
  *    its SamplePartitioner.
  *
  * Scope: flat (non-nested) columns of the fixture types — BOOLEAN,
  * INT32 (plain/DATE), INT64 (plain/TIMESTAMP micros/millis/nanos),
  * FLOAT, DOUBLE, BINARY (UTF8 string / plain). TIMESTAMP columns are
  * normalized to Spark's native µs at the reader (NANOS divides,
  * MILLIS multiplies — integer arithmetic, no float), so downstream
  * operators see one timestamp currency no matter what the store
  * holds, mirroring [[ParquetDirSource]]'s contract. Nested fields
  * are rejected at schema inference — the ETL layer flattens first
  * (reference A6). */
class DocStoreSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "docstore"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = DocStore.listFiles(DocStore.pathOf(options))
    require(files.nonEmpty, s"docstore: no parquet files under ${DocStore.pathOf(options)}")
    DocStore.toStructType(DocStore.fileSchema(files.head))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    DocStoreTable(DocStore.pathOf(new CaseInsensitiveStringMap(properties)), schema)
}

case class DocStoreTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"docstore($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocStoreScanBuilder(path, tableSchema)
}

/** Receives Spark's pushdown calls. `pushFilters` partitions the
  * predicate set into server-evaluable (kept, returned by
  * `pushedFilters`, applied exactly by the reader) and residual
  * (returned to Spark for post-scan evaluation). `pruneColumns`
  * records the projection. */
class DocStoreScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // a filter is pushable only if the server can evaluate it EXACTLY
    // (same null semantics, same comparison order) — anything else
    // stays Spark-side; never push "approximately"
    val (ok, residual) =
      filters.partition(f => DocStore.pushable(f, tableSchema))
    pushed = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = DocStoreScan(path, tableSchema, required, pushed)
}

/** The scan: fixed (path, projection, pushed predicates). Split
  * planning reads each file's footer once on the driver — the same
  * O(files) metadata pass every parquet-backed connector does — and
  * emits one partition per row group. */
case class DocStoreScan(
    path: String,
    tableSchema: StructType,
    required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"DocStoreScan path=$path, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = ArrayBuffer.empty[InputPartition]
    DocStore.listFiles(path).foreach { f =>
      DocStore.blocksOf(f).foreach { case (start, len) =>
        parts += DocStorePartition(f, start, len)
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the reader materializes required ∪ filter-only columns; the
    // projection string preserves the FILE's physical types so the
    // server-side predicate conversion is type-exact
    val filterCols = pushed.flatMap(_.references).distinct
      .filterNot(c => required.fieldNames.contains(c))
    DocStoreReaderFactory(
      required.fields.map(_.name) ++ filterCols,
      required,
      tableSchema,
      pushed)
  }
}

case class DocStorePartition(file: String, start: Long, length: Long)
    extends InputPartition

case class DocStoreReaderFactory(
    projectCols: Array[String],
    required: StructType,
    tableSchema: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DocStoreReader(partition.asInstanceOf[DocStorePartition],
      projectCols, required, tableSchema, pushed)
}

/** Executor-side reader for one row group: opens the file with the
  * projected schema and the converted predicate, then converts each
  * materialized Group to an InternalRow. The byte range selects
  * exactly this partition's row group (parquet assigns a row group to
  * the range containing its midpoint), so two partitions never read
  * the same row twice. */
class DocStoreReader(
    part: DocStorePartition,
    projectCols: Array[String],
    required: StructType,
    tableSchema: StructType,
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val fileSchema = DocStore.fileSchema(part.file)

  // projection in required-column order (filter-only columns appended),
  // carrying the file's own physical types
  private val projSchema: MessageType = {
    val kept =
      if (projectCols.isEmpty)
        // COUNT(*)-style scans prune to zero columns; parquet needs at
        // least one column to drive row materialization — read the
        // narrowest and emit empty rows
        Seq(DocStore.narrowest(fileSchema))
      else projectCols.toSeq.map(c => fileSchema.getType(Seq(c): _*))
    new MessageType(fileSchema.getName, kept.asJava)
  }

  private val reader: ParquetReader[Group] = {
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projSchema.toString)
    val b = ParquetReader
      .builder(new GroupReadSupport(), new Path(part.file))
      .withConf(conf)
      .withFileRange(part.start, part.start + part.length)
    DocStore.toPredicate(pushed, fileSchema) match {
      case Some(p) => b.withFilter(FilterCompat.get(p)).build()
      case None => b.build()
    }
  }

  // one converter per output column, bound to the projected position
  private val converters: Array[Group => Any] =
    required.fields.zipWithIndex.map { case (f, i) =>
      DocStore.converter(projSchema.getType(i).asPrimitiveType(), i)
    }

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < converters.length) {
      row.update(i,
        if (current.getFieldRepetitionCount(i) == 0) null
        else converters(i)(current))
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

/** Shared schema/predicate machinery for the docstore connector. */
object DocStore {

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "docstore: `path` option is required")
    p
  }

  /** `path` is one parquet file or a directory of them (non-recursive,
    * `_`-prefixed metadata files skipped) — resolved through the Hadoop
    * FileSystem API so any supported filesystem works. */
  def listFiles(path: String): Seq[String] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).sorted
    else Seq(path)
  }

  def fileSchema(file: String): MessageType = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** (startingPos, compressedSize) of each row group — the split
    * boundaries; each partition's byte range contains exactly its own
    * block's midpoint. */
  def blocksOf(file: String): Seq[(Long, Long)] = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try r.getFooter.getBlocks.asScala.toSeq
      .map(b => (b.getStartingPos, b.getCompressedSize))
    finally r.close()
  }

  /** Narrowest primitive column of a file schema — the cheapest column
    * to drive row counts when the projection is empty. */
  def narrowest(schema: MessageType): Type = {
    def width(t: Type): Int = t.asPrimitiveType().getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => 1
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.FLOAT => 4
      case PrimitiveTypeName.INT64 | PrimitiveTypeName.DOUBLE => 8
      case _ => 16
    }
    schema.getFields.asScala.filter(_.isPrimitive).minBy(width)
  }

  /** MessageType → StructType for the supported flat-primitive subset;
    * nested/repeated fields are an error (the connector's documented
    * contract — flatten upstream, reference A6). */
  def toStructType(schema: MessageType): StructType =
    StructType(schema.getFields.asScala.toSeq.map { t =>
      require(t.isPrimitive && !t.isRepetition(Type.Repetition.REPEATED),
        s"docstore: unsupported nested/repeated field ${t.getName}")
      StructField(t.getName, catalystType(t.asPrimitiveType()),
        nullable = !t.isRepetition(Type.Repetition.REQUIRED))
    })

  private def catalystType(p: PrimitiveType): DataType = {
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => BooleanType
      case PrimitiveTypeName.INT32 => ann match {
        case _: DateLogicalTypeAnnotation => DateType
        case _ => IntegerType
      }
      case PrimitiveTypeName.INT64 => ann match {
        case t: TimestampLogicalTypeAnnotation =>
          // µs is Spark's native precision whatever the store holds;
          // isAdjustedToUTC=false maps to NTZ exactly like Spark's own
          // parquet reader under inferTimestampNTZ
          if (t.isAdjustedToUTC) TimestampType else TimestampNTZType
        case _ => LongType
      }
      case PrimitiveTypeName.FLOAT => FloatType
      case PrimitiveTypeName.DOUBLE => DoubleType
      case PrimitiveTypeName.BINARY => ann match {
        case _: StringLogicalTypeAnnotation => StringType
        case _ => BinaryType
      }
      case other =>
        throw new IllegalArgumentException(
          s"docstore: unsupported parquet type $other for ${p.getName}")
    }
  }

  /** Converter from a materialized Group's field `i` to the catalyst
    * internal value, normalizing timestamps to µs. */
  def converter(p: PrimitiveType, i: Int): Group => Any = {
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => g => g.getBoolean(i, 0)
      case PrimitiveTypeName.INT32 => g => g.getInteger(i, 0)
      case PrimitiveTypeName.INT64 => ann match {
        case t: TimestampLogicalTypeAnnotation => t.getUnit match {
          case TimeUnit.NANOS => g => Math.floorDiv(g.getLong(i, 0), 1000L)
          case TimeUnit.MILLIS => g => Math.multiplyExact(g.getLong(i, 0), 1000L)
          case _ => g => g.getLong(i, 0)
        }
        case _ => g => g.getLong(i, 0)
      }
      case PrimitiveTypeName.FLOAT => g => g.getFloat(i, 0)
      case PrimitiveTypeName.DOUBLE => g => g.getDouble(i, 0)
      case PrimitiveTypeName.BINARY => ann match {
        case _: StringLogicalTypeAnnotation =>
          g => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        case _ => g => g.getBinary(i, 0).getBytes
      }
      case other =>
        throw new IllegalArgumentException(s"docstore: unreadable type $other")
    }
  }

  /** Can the server evaluate this filter exactly? Comparison/IN/
    * IsNotNull/IsNull on a flat column of a supported type with
    * non-null literal(s). */
  def pushable(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(c, v) => cmpOk(c, v, schema)
    case GreaterThan(c, v) => cmpOk(c, v, schema)
    case GreaterThanOrEqual(c, v) => cmpOk(c, v, schema)
    case LessThan(c, v) => cmpOk(c, v, schema)
    case LessThanOrEqual(c, v) => cmpOk(c, v, schema)
    case In(c, vs) => vs.nonEmpty && vs.forall(v => cmpOk(c, v, schema))
    case IsNotNull(c) => colOk(c, schema)
    case IsNull(c) => colOk(c, schema)
    case And(l, r) => pushable(l, schema) && pushable(r, schema)
    case Or(l, r) => pushable(l, schema) && pushable(r, schema)
    case Not(child) => pushable(child, schema) && notOk(child)
    case _ => false
  }

  /** NOT over nulls is where SQL and record-filters diverge:
    * `NOT (a = v)` must DROP rows where a IS NULL (SQL: NULL), but
    * parquet's notEq(a, v) KEEPS them. Only Not(IsNull)/Not(IsNotNull)
    * translate exactly; everything else under NOT stays residual. */
  private def notOk(f: Filter): Boolean = f match {
    case IsNull(_) | IsNotNull(_) => true
    case _ => false
  }

  private def colOk(c: String, schema: StructType): Boolean =
    !c.contains(".") && schema.fieldNames.contains(c) &&
      (schema(c).dataType match {
        case BooleanType | IntegerType | LongType | FloatType | DoubleType |
             StringType | DateType | TimestampType | TimestampNTZType => true
        case _ => false
      })

  private def cmpOk(c: String, v: Any, schema: StructType): Boolean =
    v != null && colOk(c, schema) && (schema(c).dataType match {
      case BooleanType => v.isInstanceOf[java.lang.Boolean]
      case _ => true
    })

  /** Spark filters → one parquet FilterPredicate, bound to the FILE's
    * physical types (a timestamp predicate on a NANOS column converts
    * the literal to nanos, etc.), so the server evaluates in its own
    * storage domain with zero precision loss. */
  def toPredicate(
      filters: Array[Filter],
      fileSchema: MessageType): Option[FilterPredicate] =
    filters.flatMap(f => one(f, fileSchema)).toSeq
      .reduceOption(FilterApi.and)

  private def one(f: Filter, fs: MessageType): Option[FilterPredicate] = {
    def prim(c: String): PrimitiveType = fs.getType(Seq(c): _*).asPrimitiveType()
    f match {
      case EqualTo(c, v) => Some(mk(prim(c), v, "eq"))
      case GreaterThan(c, v) => Some(mk(prim(c), v, "gt"))
      case GreaterThanOrEqual(c, v) => Some(mk(prim(c), v, "gtEq"))
      case LessThan(c, v) => Some(mk(prim(c), v, "lt"))
      case LessThanOrEqual(c, v) => Some(mk(prim(c), v, "ltEq"))
      case In(c, vs) =>
        Some(vs.map(v => mk(prim(c), v, "eq")).reduce(FilterApi.or))
      case IsNull(c) => Some(nullPred(prim(c), isNull = true))
      case IsNotNull(c) => Some(nullPred(prim(c), isNull = false))
      case And(l, r) =>
        for (a <- one(l, fs); b <- one(r, fs)) yield FilterApi.and(a, b)
      case Or(l, r) =>
        for (a <- one(l, fs); b <- one(r, fs)) yield FilterApi.or(a, b)
      case Not(IsNull(c)) => Some(nullPred(prim(c), isNull = false))
      case Not(IsNotNull(c)) => Some(nullPred(prim(c), isNull = true))
      case _ => None
    }
  }

  private def nullPred(p: PrimitiveType, isNull: Boolean): FilterPredicate = {
    val n = p.getName
    p.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN =>
        if (isNull) FilterApi.eq(FilterApi.booleanColumn(n), null.asInstanceOf[java.lang.Boolean])
        else FilterApi.notEq(FilterApi.booleanColumn(n), null.asInstanceOf[java.lang.Boolean])
      case PrimitiveTypeName.INT32 =>
        if (isNull) FilterApi.eq(FilterApi.intColumn(n), null.asInstanceOf[java.lang.Integer])
        else FilterApi.notEq(FilterApi.intColumn(n), null.asInstanceOf[java.lang.Integer])
      case PrimitiveTypeName.INT64 =>
        if (isNull) FilterApi.eq(FilterApi.longColumn(n), null.asInstanceOf[java.lang.Long])
        else FilterApi.notEq(FilterApi.longColumn(n), null.asInstanceOf[java.lang.Long])
      case PrimitiveTypeName.FLOAT =>
        if (isNull) FilterApi.eq(FilterApi.floatColumn(n), null.asInstanceOf[java.lang.Float])
        else FilterApi.notEq(FilterApi.floatColumn(n), null.asInstanceOf[java.lang.Float])
      case PrimitiveTypeName.DOUBLE =>
        if (isNull) FilterApi.eq(FilterApi.doubleColumn(n), null.asInstanceOf[java.lang.Double])
        else FilterApi.notEq(FilterApi.doubleColumn(n), null.asInstanceOf[java.lang.Double])
      case PrimitiveTypeName.BINARY =>
        if (isNull) FilterApi.eq(FilterApi.binaryColumn(n), null.asInstanceOf[Binary])
        else FilterApi.notEq(FilterApi.binaryColumn(n), null.asInstanceOf[Binary])
      case other =>
        throw new IllegalArgumentException(s"docstore: null check on $other")
    }
  }

  /** One comparison, with the literal converted to the column's
    * physical domain. `op` ∈ {eq, gt, gtEq, lt, ltEq}. */
  private def mk(p: PrimitiveType, v: Any, op: String): FilterPredicate = {
    val n = p.getName
    p.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN =>
        val c = FilterApi.booleanColumn(n)
        val b = java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
        op match {
          case "eq" => FilterApi.eq(c, b)
          case other => throw new IllegalArgumentException(s"bool $other")
        }
      case PrimitiveTypeName.INT32 =>
        cmp32(FilterApi.intColumn(n), int32Value(p, v), op)
      case PrimitiveTypeName.INT64 =>
        cmp64(FilterApi.longColumn(n), int64Value(p, v), op)
      case PrimitiveTypeName.FLOAT =>
        cmpF(FilterApi.floatColumn(n),
          java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue()), op)
      case PrimitiveTypeName.DOUBLE =>
        cmpD(FilterApi.doubleColumn(n),
          java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue()), op)
      case PrimitiveTypeName.BINARY =>
        cmpB(FilterApi.binaryColumn(n), Binary.fromString(v.toString), op)
      case other =>
        throw new IllegalArgumentException(s"docstore: comparison on $other")
    }
  }

  private def int32Value(p: PrimitiveType, v: Any): java.lang.Integer =
    p.getLogicalTypeAnnotation match {
      case _: DateLogicalTypeAnnotation => v match {
        case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
        case d: java.time.LocalDate => Int.box(d.toEpochDay.toInt)
        case n: Number => Int.box(n.intValue())
        case other => throw new IllegalArgumentException(s"date literal $other")
      }
      case _ => Int.box(v.asInstanceOf[Number].intValue())
    }

  private def int64Value(p: PrimitiveType, v: Any): java.lang.Long =
    p.getLogicalTypeAnnotation match {
      case t: TimestampLogicalTypeAnnotation =>
        val micros = tsMicros(v)
        Long.box(t.getUnit match {
          case TimeUnit.NANOS => Math.multiplyExact(micros, 1000L)
          case TimeUnit.MILLIS => Math.floorDiv(micros, 1000L)
          case _ => micros
        })
      case _ => Long.box(v.asInstanceOf[Number].longValue())
    }

  /** Timestamp literal → epoch µs; NTZ literals (LocalDateTime) pin to
    * UTC, matching the µs-since-epoch the fixtures store. */
  private def tsMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong)
    case l: java.time.LocalDateTime => tsMicros(l.toInstant(java.time.ZoneOffset.UTC))
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(s"timestamp literal $other")
  }

  private def cmp32(c: Operators.IntColumn, v: java.lang.Integer, op: String) =
    op match {
      case "eq" => FilterApi.eq(c, v)
      case "gt" => FilterApi.gt(c, v)
      case "gtEq" => FilterApi.gtEq(c, v)
      case "lt" => FilterApi.lt(c, v)
      case "ltEq" => FilterApi.ltEq(c, v)
    }
  private def cmp64(c: Operators.LongColumn, v: java.lang.Long, op: String) =
    op match {
      case "eq" => FilterApi.eq(c, v)
      case "gt" => FilterApi.gt(c, v)
      case "gtEq" => FilterApi.gtEq(c, v)
      case "lt" => FilterApi.lt(c, v)
      case "ltEq" => FilterApi.ltEq(c, v)
    }
  private def cmpF(c: Operators.FloatColumn, v: java.lang.Float, op: String) =
    op match {
      case "eq" => FilterApi.eq(c, v)
      case "gt" => FilterApi.gt(c, v)
      case "gtEq" => FilterApi.gtEq(c, v)
      case "lt" => FilterApi.lt(c, v)
      case "ltEq" => FilterApi.ltEq(c, v)
    }
  private def cmpD(c: Operators.DoubleColumn, v: java.lang.Double, op: String) =
    op match {
      case "eq" => FilterApi.eq(c, v)
      case "gt" => FilterApi.gt(c, v)
      case "gtEq" => FilterApi.gtEq(c, v)
      case "lt" => FilterApi.lt(c, v)
      case "ltEq" => FilterApi.ltEq(c, v)
    }
  private def cmpB(c: Operators.BinaryColumn, v: Binary, op: String) =
    op match {
      case "eq" => FilterApi.eq(c, v)
      case "gt" => FilterApi.gt(c, v)
      case "gtEq" => FilterApi.gtEq(c, v)
      case "lt" => FilterApi.lt(c, v)
      case "ltEq" => FilterApi.ltEq(c, v)
    }
}

/** [[TableSource]] routed through the docstore connector: the same
  * `<table>.parquet` fixture layout as [[ParquetDirSource]], but every
  * read crosses the DataSource V2 boundary — filters and projections
  * reach the connector's scan builder exactly as they would reach the
  * Mongo connector in production. Timestamp normalization (ns → µs)
  * happens inside the connector, so no session flag is needed. */
final case class DocStoreTableSource(dir: String) extends TableSource {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.format("docstore")
      .option("path", s"$dir/$table.parquet")
      .load()

  override def list(spark: SparkSession): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted
}
