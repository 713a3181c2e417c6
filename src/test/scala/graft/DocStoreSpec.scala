package graft

import graft.sources.{DocStore, DocStoreScan, DocStoreTableSource}
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, In, IsNotNull, LessThanOrEqual}

/** The docstore DSv2 connector: the reference's defining behavior is
  * shipping the per-collection date range server-side
  * (main.py:288-299, `$gte`/`$lte`); these specs prove the same
  * predicates and the projected column set cross OUR connector's scan
  * boundary — pushed into the scan, not re-evaluated post-scan — and
  * that what comes back is byte-identical to the native parquet read. */
class DocStoreSpec extends SparkSpec {

  /** Every physical node, traversing through AQE wrappers and query
    * stages (both are leaves to a plain collect). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }

  private def physical(df: org.apache.spark.sql.DataFrame) =
    allNodes(df.queryExecution.executedPlan)

  private def docStoreScanOf(df: org.apache.spark.sql.DataFrame): DocStoreScan =
    physical(df).collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[DocStoreScan]

  test("connector read equals the native parquet read, column for column") {
    val viaConnector = new DocStoreTableSource(sfDir).read(spark, "orders")
    val native = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(viaConnector.schema == native.schema,
      s"schema drift: ${viaConnector.schema} vs ${native.schema}")
    val a = viaConnector.orderBy("o_orderkey").collect().toSeq
    val b = native.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
  }

  test("date range and projection reach the DSv2 scan; no post-scan Filter") {
    val df = SparkEntry.queries("etl_connector_pushdown")(spark, sfDir)
    df.collect()
    val scan = docStoreScanOf(df)
    // the inclusive bounds (the reference's $gte/$lte wart) are INSIDE
    // the scan...
    assert(scan.pushed.exists {
      case GreaterThanOrEqual("o_orderdate", _) => true; case _ => false
    }, s"no $$gte in ${scan.pushed.mkString(", ")}")
    assert(scan.pushed.exists {
      case LessThanOrEqual("o_orderdate", _) => true; case _ => false
    }, s"no $$lte in ${scan.pushed.mkString(", ")}")
    // ...and the scan RETURNS only the aggregate's columns — with both
    // date bounds fully pushed, o_orderdate is not even in the output
    // projection; the reader materializes it as a filter-only column
    assert(scan.readSchema().fieldNames.toSet ==
      Set("o_orderstatus", "o_totalprice"))
    val rf = scan.createReaderFactory()
      .asInstanceOf[graft.sources.DocStoreReaderFactory]
    assert(rf.projectCols.contains("o_orderdate"),
      "filter-only column missing from the server-side projection")
    // every predicate pushed ⇒ Spark plans NO residual Filter at all
    val filters = physical(df).collect {
      case f: FilterExec => f }.toSeq
    assert(filters.isEmpty,
      s"residual post-scan Filter survived: ${filters.mkString("; ")}")
  }

  test("IN-list predicate pushes as a server-side disjunction") {
    val df = SparkEntry.queries("etl_connector_projection")(spark, sfDir)
    df.collect()
    val scan = docStoreScanOf(df)
    assert(scan.pushed.exists {
      case In("lang", vs) => vs.toSet == Set("en", "de", "fr"); case _ => false
    }, s"no IN in ${scan.pushed.mkString(", ")}")
    assert(scan.readSchema().fieldNames.toSet == Set("lang", "n_chars"))
  }

  test("unsupported predicates stay residual — never pushed approximately") {
    val df = new DocStoreTableSource(sfDir).read(spark, "documents")
      .filter(col("text").startsWith("a") && col("doc_id") >= 5)
    val scan = docStoreScanOf(df)
    // doc_id bound pushes; startsWith must NOT appear in the scan
    assert(scan.pushed.exists {
      case GreaterThanOrEqual("doc_id", v) => v == 5L; case _ => false })
    assert(!scan.pushed.exists(_.references.contains("text")) ||
      scan.pushed.forall {
        case IsNotNull("text") => true
        case f => !f.references.contains("text")
      }, s"approximate push of text predicate: ${scan.pushed.mkString(", ")}")
    // and the residual still applies: results match the native read
    val native = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").startsWith("a") && col("doc_id") >= 5)
    assert(df.orderBy("doc_id").collect().toSeq ==
      native.orderBy("doc_id").collect().toSeq)
  }

  test("splits: a multi-file store fans out one partition per row group") {
    val dir = tmpDir("docstore_split")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val df = spark.read.format("docstore").option("path", dir).load()
    val scan = docStoreScanOf(df.select("o_orderkey"))
    assert(scan.planInputPartitions().length >= 3,
      "3-file store planned fewer than 3 partitions")
    // split reads cover every row exactly once
    assert(df.count() == 1500)
    val viaConnector = df.orderBy("o_orderkey")
      .select("o_orderkey", "o_totalprice").collect().toSeq
    val native = spark.read.parquet(dir).orderBy("o_orderkey")
      .select("o_orderkey", "o_totalprice").collect().toSeq
    assert(viaConnector == native)
  }

  test("empty projection (count(*)) still counts every row") {
    val df = spark.read.format("docstore")
      .option("path", s"$sfDir/orders.parquet").load()
    assert(df.count() ==
      spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("pushed filters drop rows server-side with SQL null semantics") {
    // a fixture with nulls in both the filter and projected columns
    val dir = tmpDir("docstore_nulls")
    import spark.implicits._
    val src = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, null, "b"), (3L, 30.0, null),
      (null, 40.0, "d"), (5L, 50.0, "e"))
      .toDF("k", "v", "s")
    src.write.mode("overwrite").parquet(dir)
    val via = spark.read.format("docstore").option("path", dir).load()
    def both(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val a = f(via).orderBy("k").collect().toSeq
      val b = f(spark.read.parquet(dir)).orderBy("k").collect().toSeq
      assert(a == b, s"connector=$a native=$b")
    }
    both(_.filter(col("k") >= 2))            // null k drops
    both(_.filter(col("v") < 45.0))          // null v drops
    both(_.filter(col("s") === "b"))         // null s drops
    both(_.filter(col("s").isNull))
    both(_.filter(col("s").isNotNull))
    both(_.filter(col("k") >= 2 || col("v") < 15.0))
    both(_.filter(!col("s").isNull))
  }

  test("catalog listing through the connector-backed TableSource") {
    val ts = new DocStoreTableSource(sfDir)
    val tables = ts.list(spark)
    assert(tables.contains("orders") && tables.contains("documents"))
  }
}
