package graft

import graft.sources.{DocStore, DocStoreMaintenance}
import org.apache.spark.sql.functions._

/** Snapshot TAGS (immutable named versions) and METADATA TABLES
  * (`docstore.db.t.{files,partitions,history,refs,manifests}`) — the
  * audit surface: pin a corpus under a name that can never move, and
  * read the table format's own state as tables. */
class TagsMetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private def loggedFooters[A](body: => A): (A, Seq[String]) = {
    DocStore.footerConsultLog.clear()
    DocStore.footerLogEnabled = true
    try {
      val r = body
      (r, scala.jdk.CollectionConverters.IteratorHasAsScala(
        DocStore.footerConsultLog.iterator()).asScala.toSeq)
    } finally {
      DocStore.footerLogEnabled = false
      DocStore.footerConsultLog.clear()
    }
  }

  test("tags pin a version immutably; vacuum keeps tag-reachable; drop releases") {
    val store = tmpDir("tag_store")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save() // v1
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save() // v2
    DocStore.createTag(store, "release-1", 1L)
    // tag= read sees exactly the pinned snapshot, current read moves on
    val tagged = spark.read.format("docstore").option("path", store)
      .option("tag", "release-1").load()
    assert(tagged.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(spark.read.format("docstore").option("path", store).load().count() == 3)
    // immutable: re-pointing refused
    val e1 = intercept[IllegalStateException](DocStore.createTag(store, "release-1", 2L))
    assert(e1.getMessage.contains("immutable"), e1.getMessage)
    // uncommitted version refused; bad name refused
    val e2 = intercept[IllegalArgumentException](DocStore.createTag(store, "t2", 99L))
    assert(e2.getMessage.contains("not a committed version"))
    intercept[IllegalArgumentException](DocStore.createTag(store, "no/pe", 1L)): Unit
    // vacuum at keepVersions=1 would expire v1 — the tag keeps it alive
    DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L): Unit
    assert(spark.read.format("docstore").option("path", store)
      .option("tag", "release-1").load().count() == 2)
    // dropping the tag releases the version to the next vacuum
    assert(DocStore.dropTag(store, "release-1"))
    assert(!DocStore.dropTag(store, "release-1")) // idempotent report
    DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L): Unit
    val e3 = intercept[Exception](spark.read.format("docstore")
      .option("path", store).option("tag", "release-1").load().count())
    assert(e3.getMessage.contains("no tag"), e3.getMessage)
  }

  test("SQL surface: CALL create_tag / drop_tag; refs metadata table lists branches and tags") {
    val root = tmpDir("tagmeta_root")
    if (spark.conf.getOption("spark.sql.catalog.tmc").isEmpty) {
      spark.conf.set("spark.sql.catalog.tmc", "graft.sources.DocStoreCatalog")
      spark.conf.set("spark.sql.catalog.tmc.root", root)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tmc.db")
    spark.sql("CREATE TABLE tmc.db.t (k BIGINT, v STRING) USING docstore")
    spark.sql("INSERT INTO tmc.db.t VALUES (1,'a'), (2,'b')")
    spark.sql("CALL tmc.system.enable_snapshots(table => 'db.t')"): Unit
    val r = spark.sql("CALL tmc.system.create_tag(table => 'db.t', tag => 'gold')").head
    assert(r.getString(0) == "gold" && r.getLong(1) == 1L)
    spark.sql("CALL tmc.system.create_branch(table => 'db.t', branch => 'stage')"): Unit
    val refs = spark.sql("SELECT name, type, version FROM tmc.db.t.refs ORDER BY name")
      .as[(String, String, Long)].collect().toSeq
    assert(refs == Seq(("gold", "tag", 1L), ("main", "branch", 1L),
      ("stage", "branch", 1L)), refs.toString)
    assert(spark.sql("CALL tmc.system.drop_tag(table => 'db.t', tag => 'gold')")
      .head.getBoolean(0))
    assert(spark.sql("SELECT * FROM tmc.db.t.refs WHERE type = 'tag'").count() == 0L)
  }

  test("files/partitions/history/manifests metadata tables; zero footers when stat-backed") {
    val root = tmpDir("meta_root")
    if (spark.conf.getOption("spark.sql.catalog.mtc").isEmpty) {
      spark.conf.set("spark.sql.catalog.mtc", "graft.sources.DocStoreCatalog")
      spark.conf.set("spark.sql.catalog.mtc.root", root)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mtc.db")
    spark.sql("CREATE TABLE mtc.db.ev (k BIGINT, grp STRING, v DOUBLE) USING docstore " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('rowlevel' = 'mor')")
    spark.createDataset((0L until 300L).map(i => (i, s"g${i % 3}", i * 0.5)))
      .toDF("k", "grp", "v").coalesce(1)
      .write.format("docstore").option("path", s"$root/db/ev")
      .option("partitionBy", "grp").mode("append").save()
    // MoR delete: 50 rows of g0 die via a deletion vector, no rewrite
    spark.sql("DELETE FROM mtc.db.ev WHERE k < 150 AND k % 3 = 0")
    val (parts, consulted) = loggedFooters {
      spark.sql("SELECT partition, n_files, rows, dv_rows FROM mtc.db.ev.partitions " +
        "ORDER BY partition").as[(String, Long, Long, Long)].collect().toSeq
    }
    assert(parts == Seq(("grp=g0", 1L, 100L, 50L), ("grp=g1", 1L, 100L, 0L),
      ("grp=g2", 1L, 100L, 0L)), parts.toString)
    assert(consulted.isEmpty, s"stat-backed metadata read consulted footers: $consulted")
    // files: one file per partition, its DV binding visible on g0 only
    val files = spark.sql(
      "SELECT partition, dv_file IS NOT NULL, dv_rows FROM mtc.db.ev.files ORDER BY partition")
      .as[(String, Boolean, Long)].collect().toSeq
    assert(files == Seq(("grp=g0", true, 50L), ("grp=g1", false, 0L),
      ("grp=g2", false, 0L)), files.toString)
    // live rows = rows - dv_rows, agreeing with the data read
    assert(spark.sql("SELECT sum(rows) - sum(dv_rows) FROM mtc.db.ev.files")
      .head.getLong(0) == spark.table("mtc.db.ev").count())
    // history: v1 = the MoR table's CREATE-time snapshot bootstrap
    // (empty), v2 = the write, v3 = the delete's rowdelta
    val hist = spark.sql("SELECT version, op, n_dvs, dv_rows FROM mtc.db.ev.history " +
      "ORDER BY version").as[(Long, String, Long, Long)].collect().toSeq
    assert(hist.map(_._2) == Seq("append", "append", "rowdelta"), hist.toString)
    assert(hist.last._3 == 1L && hist.last._4 == 50L, hist.toString)
    // manifests: the current chain is non-empty on a chain-format store
    val mans = spark.sql("SELECT pos, manifest, bytes FROM mtc.db.ev.manifests ORDER BY pos")
      .as[(Int, String, Long)].collect().toSeq
    assert(mans.nonEmpty && mans.forall(m => m._2.startsWith("m-") && m._3 > 0L),
      mans.toString)
    // unknown metadata kind refuses with the table error, not a crash
    intercept[Exception](spark.sql("SELECT * FROM mtc.db.ev.nonsense").collect()): Unit
    // METADATA TIME TRAVEL: at v2 (pre-delete) no DV is bound and all
    // 300 rows are live — the files table answers for THAT snapshot
    val v2 = spark.sql("SELECT sum(rows), sum(dv_rows), count(*) " +
      "FROM mtc.db.ev.files VERSION AS OF 2").head
    assert((v2.getLong(0), v2.getLong(1), v2.getLong(2)) == ((300L, 0L, 3L)), v2.toString)
    assert(spark.sql("SELECT count(*) FROM mtc.db.ev.history VERSION AS OF 2")
      .head.getLong(0) == 2L)
    // refs are current-state pointers — time travel refuses loudly
    val e = intercept[Exception](
      spark.sql("SELECT * FROM mtc.db.ev.refs VERSION AS OF 2").collect())
    assert(e.getMessage.contains("current-state"), e.getMessage)
    // an uncommitted version refuses at resolution, not mid-scan
    intercept[Exception](
      spark.sql("SELECT * FROM mtc.db.ev.files VERSION AS OF 99").collect()): Unit
  }

  test("metadata tables on plain and single-file stores (no snapshots, no rel form)") {
    val root = tmpDir("meta_plain_root")
    if (spark.conf.getOption("spark.sql.catalog.mpc").isEmpty) {
      spark.conf.set("spark.sql.catalog.mpc", "graft.sources.DocStoreCatalog")
      spark.conf.set("spark.sql.catalog.mpc.root", root)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mpc.db")
    // plain directory store: files/partitions answer from footers
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", s"$root/db/plain").mode("append").save()
    val f = spark.sql("SELECT rows, bytes, dv_rows FROM mpc.db.plain.files")
      .as[(Long, Long, Long)].collect().toSeq
    assert(f == Seq((2L, f.head._2, 0L)) && f.head._2 > 0L, f.toString)
    assert(spark.sql("SELECT * FROM mpc.db.plain.history").count() == 0L)
    assert(spark.sql("SELECT * FROM mpc.db.plain.refs").count() == 0L)
    // single-file fixture table (db/<name>.parquet): basename, no rel trap
    spark.range(5).toDF("k").coalesce(1).write.parquet(s"$root/db/_tmp_one")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/db/_tmp_one"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/db/one.parquet"))
    val one = spark.sql("SELECT file, rows FROM mpc.db.one.files")
      .as[(String, Long)].collect().toSeq
    assert(one == Seq(("one.parquet", 5L)), one.toString)
  }
}
