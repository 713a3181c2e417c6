package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The docstore SQL catalog (TableCatalog + SupportsNamespaces) and the
  * row-level operations it unlocks: DELETE (metadata-only for partition
  * predicates, copy-on-write otherwise), UPDATE and MERGE INTO — the
  * extract-AND-load half of the reference contract (a real docstore
  * sync upserts at the table; main.py only ever extracts). */
class DocStoreCatalogSpec extends SparkSpec {

  private def ensureCat(name: String, root: String): Unit = {
    if (spark.conf.getOption(s"spark.sql.catalog.$name").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.DocStoreCatalog")
      spark.conf.set(s"spark.sql.catalog.$name.root", root)
    }
  }

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }

  test("catalog lifecycle: namespace, create table, insert, typed partition read-back, list, rename, drop") {
    val root = tmpDir("dscat_root")
    ensureCat("dstest", root)
    spark.sql("CREATE NAMESPACE dstest.db1")
    spark.sql("""CREATE TABLE dstest.db1.events (k BIGINT, v STRING, yr INT)
      USING docstore PARTITIONED BY (yr)""")
    spark.sql("""INSERT INTO dstest.db1.events
      VALUES (1,'a',2020),(2,'b',2020),(3,'c',2021)""")
    // V2 relation resolution: the SELECT plans a BatchScan over OUR scan
    val q = spark.sql("SELECT k, v, yr FROM dstest.db1.events ORDER BY k")
    assert(allNodes(q.queryExecution.executedPlan).exists {
      case b: BatchScanExec => b.scan.isInstanceOf[graft.sources.DocStoreScan]
      case _ => false
    }, q.queryExecution.executedPlan.toString.take(1500))
    // the declared INT partition type survives the directory round-trip
    assert(q.schema("yr").dataType.typeName == "integer")
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021)))
    // Hive layout on disk under <root>/<ns>/<table>
    val dirs = new java.io.File(s"$root/db1/events").listFiles().map(_.getName).toSet
    assert(dirs.contains("yr=2020") && dirs.contains("yr=2021"), dirs.toString)
    // catalog listings
    assert(spark.sql("SHOW TABLES IN dstest.db1").collect()
      .map(_.getString(1)).toSeq == Seq("events"))
    assert(spark.sql("SHOW NAMESPACES IN dstest").collect()
      .map(_.getString(0)).toSeq == Seq("db1"))
    // rename + drop
    spark.sql("ALTER TABLE dstest.db1.events RENAME TO db1.events2")
    assert(spark.sql("SELECT count(*) FROM dstest.db1.events2").head.getLong(0) == 3)
    spark.sql("DROP TABLE dstest.db1.events2")
    assert(spark.sql("SHOW TABLES IN dstest.db1").collect().isEmpty)
  }

  test("ALTER TABLE: add nullable column and widen int->bigint via the marker; unsafe changes refuse") {
    val root = tmpDir("dscat_alter_root")
    ensureCat("dsalter", root)
    spark.sql("CREATE NAMESPACE dsalter.db")
    spark.sql("CREATE TABLE dsalter.db.t (k INT, v STRING) USING docstore")
    // populate as a SNAPSHOT store (ALTER on a populated plain store refuses)
    spark.sql("INSERT INTO dsalter.db.t VALUES (1, 'a'), (2, 'b')")
    val plainErr = intercept[Exception](
      spark.sql("ALTER TABLE dsalter.db.t ADD COLUMNS (score DOUBLE)"))
    assert(plainErr.getMessage.contains("enable snapshots"))
    graft.sources.DocStoreMaintenance.enableSnapshots(s"$root/db/t"): Unit
    // add a nullable column: existing rows read it as null immediately
    spark.sql("ALTER TABLE dsalter.db.t ADD COLUMNS (score DOUBLE)")
    assert(spark.sql("SELECT score FROM dsalter.db.t")
      .collect().forall(_.isNullAt(0)))
    // widen k to BIGINT: old INT32 pages read as long
    spark.sql("ALTER TABLE dsalter.db.t ALTER COLUMN k TYPE BIGINT")
    assert(spark.table("dsalter.db.t").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(spark.sql("SELECT sum(k) FROM dsalter.db.t").head.getLong(0) == 3L)
    // the next INSERT writes the evolved schema; mixed files reconcile
    spark.sql("INSERT INTO dsalter.db.t VALUES (3000000000, 'c', 1.5)")
    val rows = spark.sql(
      "SELECT k, v, score FROM dsalter.db.t ORDER BY k").collect()
    assert(rows.length == 3 && rows(2).getLong(0) == 3000000000L &&
      rows(2).getDouble(2) == 1.5)
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
    // unsafe changes refuse with clear errors: Spark's analyzer stops
    // non-up-cast changes itself (string->int), and the catalog stops
    // Spark-allowed up-casts that aren't safe for EXISTING files
    // (int->double would misread INT32 pages)
    val e0 = intercept[Exception](
      spark.sql("ALTER TABLE dsalter.db.t ALTER COLUMN v TYPE INT"))
    assert(e0.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    spark.sql("ALTER TABLE dsalter.db.t ADD COLUMNS (n INT)")
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE dsalter.db.t ALTER COLUMN n TYPE DOUBLE"))
    assert(e1.getMessage.contains("widening"))
    // DROP COLUMN is supported since r17 (column IDs — ColumnIdSpec);
    // a change OUTSIDE the supported evolution set still refuses
    spark.sql("ALTER TABLE dsalter.db.t DROP COLUMN n")
    assert(!spark.table("dsalter.db.t").schema.fieldNames.contains("n"))
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE dsalter.db.t ALTER COLUMN v COMMENT 'nope'"))
    assert(e2.getMessage.contains("unsupported ALTER"))
  }

  test("catalog resolves the harness fixtures' single-file tables by name") {
    ensureCat("dsfix", "/root/testdata")
    val viaCat = spark.sql("SELECT count(*) AS n FROM dsfix.`sf0.001`.orders")
      .head.getLong(0)
    val native = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(viaCat == native)
    assert(spark.sql("SHOW TABLES IN dsfix.`sf0.001`").collect()
      .map(_.getString(1)).toSet.contains("orders"))
  }

  test("DELETE with a partition predicate is metadata-only: files drop, nothing rewrites") {
    val root = tmpDir("dscat_del_root")
    ensureCat("dsdel", root)
    spark.sql("CREATE NAMESPACE dsdel.db")
    spark.sql("""CREATE TABLE dsdel.db.t (k BIGINT, yr INT)
      USING docstore PARTITIONED BY (yr)""")
    spark.sql("INSERT INTO dsdel.db.t VALUES (1,2020),(2,2020),(3,2021),(4,2022)")
    val before = graft.sources.DocStore.listFiles(s"$root/db/t").toSet
    spark.sql("DELETE FROM dsdel.db.t WHERE yr = 2021")
    val after = graft.sources.DocStore.listFiles(s"$root/db/t").toSet
    // surviving files are the SAME physical files — no rewrite happened
    assert(after.subsetOf(before), "metadata delete rewrote files")
    assert((before -- after).forall(_.contains("yr=2021")),
      s"dropped the wrong files: ${before -- after}")
    assert(spark.sql("SELECT k FROM dsdel.db.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // the emptied partition directory is reclaimed
    assert(!new java.io.File(s"$root/db/t/yr=2021").exists())
  }

  test("DELETE with a data predicate rewrites copy-on-write; untouched partitions keep their files") {
    val root = tmpDir("dscat_cow_root")
    ensureCat("dscow", root)
    spark.sql("CREATE NAMESPACE dscow.db")
    spark.sql("""CREATE TABLE dscow.db.t (k BIGINT, yr INT)
      USING docstore PARTITIONED BY (yr)""")
    spark.sql("INSERT INTO dscow.db.t VALUES (1,2020),(2,2020),(3,2021),(4,2021),(5,2022)")
    val before: Map[String, String] =
      graft.sources.DocStore.listFilesWithPartitions(s"$root/db/t")
        .map { case (f, pv) => (f, pv.toMap.apply("yr")) }.toMap
    spark.sql("DELETE FROM dscow.db.t WHERE k = 3") // lives in yr=2021 only
    val after = graft.sources.DocStore.listFiles(s"$root/db/t").toSet
    assert(spark.sql("SELECT k FROM dscow.db.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 5L))
    // runtime group filtering narrowed the rewrite to the affected
    // partition: files of other years are the SAME physical files
    val untouched = before.collect { case (f, yr) if yr != "2021" => f }.toSet
    assert(untouched.subsetOf(after),
      s"copy-on-write rewrote unaffected partitions: ${untouched -- after}")
    assert(before.collect { case (f, yr) if yr == "2021" => f }
      .forall(f => !after.contains(f)), "affected partition file not replaced")
  }

  test("UPDATE and MERGE INTO rewrite copy-on-write with exact results") {
    val root = tmpDir("dscat_merge_root")
    ensureCat("dsmrg", root)
    spark.sql("CREATE NAMESPACE dsmrg.db")
    spark.sql("CREATE TABLE dsmrg.db.t (k BIGINT, v STRING) USING docstore")
    spark.sql("INSERT INTO dsmrg.db.t VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("UPDATE dsmrg.db.t SET v = 'B' WHERE k = 2")
    assert(spark.sql("SELECT v FROM dsmrg.db.t ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("a", "B", "c"))
    import spark.implicits._
    Seq((2L, "b2"), (9L, "i")).toDF("k", "v").createOrReplaceTempView("updates")
    spark.sql("""MERGE INTO dsmrg.db.t t USING updates s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(spark.sql("SELECT k, v FROM dsmrg.db.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c"), (9L, "i")))
  }

  test("copy-on-write stages invisibly: a reader planned pre-commit sees the old store") {
    // the staged-commit protocol is the torn-read defense: everything a
    // row-level operation writes lives under _staging-<queryId> (an
    // underscore prefix every listing skips) until the single commit
    // step — so ANY scan planned before the commit sees the complete
    // old store, never a mix. Pin the invisibility mechanically.
    val root = tmpDir("dscat_atomic_root")
    ensureCat("dsatom", root)
    spark.sql("CREATE NAMESPACE dsatom.db")
    spark.sql("CREATE TABLE dsatom.db.t (k BIGINT, v STRING) USING docstore")
    spark.sql("INSERT INTO dsatom.db.t VALUES (1,'a'),(2,'b')")
    val table = s"$root/db/t"
    // simulate a mid-operation state: staged replacement present
    val staged = new java.io.File(s"$table/_staging-fakeop")
    staged.mkdirs()
    spark.read.parquet(s"$sfDir/orders.parquet").limit(1)
      .write.mode("overwrite").parquet(s"$table/_staging-fakeop/inner")
    assert(spark.sql("SELECT count(*) FROM dsatom.db.t").head.getLong(0) == 2,
      "a reader saw staged (uncommitted) files")
    assert(graft.sources.DocStore.listFiles(table).size ==
      graft.sources.DocStore.listFiles(table).count(!_.contains("_staging")),
      "listing surfaced staging paths")
  }

  test("retention: ordered partition DELETE is metadata-only, boundary-exact; typed years refuse to COW") {
    val root = tmpDir("dscat_retention")
    ensureCat("dsret", root)
    spark.sql("CREATE NAMESPACE dsret.db1")
    spark.sql("""CREATE TABLE dsret.db1.t (k BIGINT, yr STRING)
      USING docstore PARTITIONED BY (yr)""")
    spark.sql("""INSERT INTO dsret.db1.t
      VALUES (1,'1993'),(2,'1994'),(3,'1995'),(4,'1996')""")
    val dir = s"$root/db1/t"
    val surviving = graft.sources.DocStore.listFiles(dir)
      .filter(f => f.contains("yr=1995") || f.contains("yr=1996")).toSet
    spark.sql("DELETE FROM dsret.db1.t WHERE yr < '1995'")
    // metadata-only: the surviving files keep their EXACT paths (a
    // rewrite would rename them), the boundary partition survives,
    // expired directories are reclaimed
    assert(graft.sources.DocStore.listFiles(dir).toSet == surviving,
      "retention rewrote or over-deleted surviving files")
    assert(spark.sql("SELECT k FROM dsret.db1.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet == Set("yr=1995", "yr=1996"))
    // an INT-typed year column refuses the metadata path (directory
    // text would order '9' > '10') and takes the copy-on-write route —
    // slower, still exact
    spark.sql("""CREATE TABLE dsret.db1.ti (k BIGINT, yr INT)
      USING docstore PARTITIONED BY (yr)""")
    spark.sql("INSERT INTO dsret.db1.ti VALUES (1,9),(2,10)")
    val tbl = graft.sources.DocStoreTable(s"$root/db1/ti",
      spark.table("dsret.db1.ti").schema, Seq("yr"))
    assert(!tbl.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.LessThan("yr", 10))),
      "ordered delete on a typed partition column must refuse metadata-only")
    spark.sql("DELETE FROM dsret.db1.ti WHERE yr < 10")
    assert(spark.sql("SELECT k FROM dsret.db1.ti").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }
}
