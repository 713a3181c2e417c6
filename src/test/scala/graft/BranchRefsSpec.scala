package graft

import graft.sources.{DocStore, DocStoreMaintenance}
import org.apache.spark.sql.functions._

/** Branch refs + write-audit-publish: named refs
  * (`_snapshots/refs/<name>.<seq>`) point at committed versions;
  * branch commits land in the global version chain but move only
  * their ref, `main` pins the default view, and a fast-forward —
  * refused across divergence — is the publish step. The Iceberg
  * WAP / Delta branch pattern on this manifest format. */
class BranchRefsSpec extends SparkSpec {
  import spark.implicits._

  private def readStore(path: String, branch: Option[String] = None) = {
    val r = spark.read.format("docstore").option("path", path)
    branch.fold(r)(b => r.option("branch", b)).load()
  }

  test("write-audit-publish: branch writes invisible to main until fast-forward") {
    val store = tmpDir("wap_store")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save() // v1
    val at = DocStoreMaintenance.createBranch(store, "audit")
    assert(at == 1L)
    // write to the branch
    Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("branch", "audit").mode("append").save()
    // default read = main: pinned at the branch point
    assert(readStore(store).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    // audit read sees the staged work
    assert(readStore(store, Some("audit")).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // a second branch write chains on the first (ref advanced)
    Seq((5L, "e")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("branch", "audit").mode("append").save()
    assert(readStore(store, Some("audit")).count() == 5)
    assert(readStore(store).count() == 2)
    // publish
    val pub = DocStoreMaintenance.fastForward(store, "audit")
    assert(pub == DocStore.refVersion(store, "audit"))
    assert(readStore(store).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // commits carry #parent lineage: audit's head descends from v1
    assert(DocStore.isAncestor(store, 1L, pub))
  }

  test("fast-forward across divergence refuses; vacuum keeps ref-reachable versions") {
    val store = tmpDir("wap_diverge")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save() // v1
    DocStoreMaintenance.createBranch(store, "audit"): Unit
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("branch", "audit").mode("append").save() // audit → v2
    // main ALSO advances (default write goes to main once refs exist)
    Seq((9L, "z")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .mode("append").save() // main → v3, parent v1
    assert(readStore(store).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 9L))
    assert(readStore(store, Some("audit")).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    // lineages diverged at v1 — publishing audit over main would drop 9
    val e = intercept[IllegalArgumentException](
      DocStoreMaintenance.fastForward(store, "audit"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // vacuum keeps every ref head even at keepVersions=1
    DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L): Unit
    assert(readStore(store).count() == 2)
    assert(readStore(store, Some("audit")).count() == 2)
  }

  test("SQL surface: CALL create_branch / fast_forward; branch read option through the session") {
    val root = tmpDir("wap_root")
    if (spark.conf.getOption("spark.sql.catalog.wap").isEmpty) {
      spark.conf.set("spark.sql.catalog.wap", "graft.sources.DocStoreCatalog")
      spark.conf.set("spark.sql.catalog.wap.root", root)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wap.db")
    spark.sql("CREATE TABLE wap.db.t (k BIGINT, v STRING) USING docstore")
    spark.sql("INSERT INTO wap.db.t VALUES (1,'a')")
    spark.sql("CALL wap.system.enable_snapshots(table => 'db.t')"): Unit
    val path = s"$root/db/t"
    val created = spark.sql(
      "CALL wap.system.create_branch(table => 'db.t', branch => 'stage')").head
    assert(created.getString(0) == "stage" && created.getLong(1) >= 1L)
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", path)
      .option("branch", "stage").mode("append").save()
    assert(spark.table("wap.db.t").count() == 1) // main unmoved
    val pub = spark.sql(
      "CALL wap.system.fast_forward(table => 'db.t', branch => 'stage')")
      .head.getLong(0)
    assert(pub == DocStore.refVersion(path, "stage"))
    assert(spark.table("wap.db.t").count() == 2)
    // bad branch name and unknown branch error clearly
    val e1 = intercept[Exception](DocStoreMaintenance.createBranch(path, "no/pe"))
    assert(e1.getMessage.contains("invalid branch name"))
    val e2 = intercept[Exception](readStore(path, Some("ghost")).count())
    assert(e2.getMessage.contains("no branch"), e2.getMessage)
  }
}
