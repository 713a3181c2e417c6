package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.{DocStore, DocStoreMaintenance, DocStoreTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

/** Snapshot manifests on the docstore: atomic multi-file commits,
  * time travel (`versionAsOf`), optimistic concurrency, compaction as
  * one manifest swap, and vacuum-scoped disk reclaim. These pin the
  * durable-atomicity contract the directory commits' scaladoc defers
  * to a metadata log — this IS that metadata log. */
class SnapshotSpec extends SparkSpec {

  private def seedDf = {
    import spark.implicits._
    // p is independent of k % 4, so every append slice (k % 4 == s)
    // spans every partition — each append adds one file per partition
    (0 until 40).map(i => (i.toLong, s"p${(i / 4) % 4}", i * 1.5))
      .toDF("k", "p", "v")
  }

  /** Append `df` rows where k % 4 == slice, partitioned by p. */
  private def appendSlice(path: String, slice: Int, snapshots: Boolean = false): Unit = {
    val w = seedDf.filter(pmod(col("k"), lit(4)) === slice)
      .write.format("docstore").option("path", path)
      .option("partitionBy", "p").mode("append")
    (if (snapshots) w.option("snapshots", "true") else w).save()
  }

  private def readStore(path: String, version: Option[Long] = None) = {
    val r = spark.read.format("docstore").option("path", path)
    version.fold(r)(v => r.option("versionAsOf", v.toString)).load()
  }

  test("snapshot store lists by manifest: unreferenced files are invisible, plain stores see them") {
    val snap = tmpDir("snapstore")
    val plain = tmpDir("plainstore")
    appendSlice(snap, 0, snapshots = true)
    appendSlice(plain, 0)
    assert(readStore(snap).count() == 10)
    assert(readStore(plain).count() == 10)
    // drop a visible-NAMED copy of an existing data file into each
    // store — the simulated "crashed between publish and manifest
    // swap" leftover
    def stray(store: String): Unit = {
      val f = DocStore.listFiles(store).head.stripPrefix("file:")
      Files.copy(Paths.get(f), Paths.get(f).resolveSibling("stray.parquet"),
        StandardCopyOption.REPLACE_EXISTING): Unit
    }
    stray(snap); stray(plain)
    // the manifest is the snapshot store's listing — the stray never
    // entered a commit, so it does not exist to readers
    assert(readStore(snap).count() == 10)
    // the plain store's listing is the directory walk — it sees it
    assert(readStore(plain).count() > 10)
  }

  test("every commit is a version; versionAsOf reads any retained one; overwrite retains the old files") {
    val store = tmpDir("snapver")
    appendSlice(store, 0, snapshots = true) // v1
    appendSlice(store, 1)                   // v2 (mode stays on)
    assert(DocStore.currentSnapshot(store).map(_._1).contains(2L))
    assert(readStore(store, Some(1L)).count() == 10)
    assert(readStore(store).count() == 20)
    // truncate-overwrite = one manifest whose content is just the new
    // files; the old versions' files stay on disk and stay readable
    seedDf.filter(col("k") >= 38).write.format("docstore")
      .option("path", store).option("partitionBy", "p")
      .mode("overwrite").save() // v3
    assert(readStore(store).count() == 2)
    assert(readStore(store, Some(2L)).count() == 20)
    assert(readStore(store, Some(1L))
      .agg(sum("k")).head.getLong(0) == (0 until 40 by 4).sum)
    // a version that was never committed errors with the retained list
    val e = intercept[Exception](readStore(store, Some(9L)).count())
    assert(e.getMessage.contains("no committed snapshot"))
  }

  test("compaction: one atomic swap replaces the small files; the pre-compaction version is intact") {
    val store = tmpDir("snapcompact")
    (0 until 4).foreach(appendSlice(store, _, snapshots = true)) // v1..v4
    val before = readStore(store).orderBy("k").collect().toSeq
    assert(DocStore.listFiles(store).size == 16) // 4 appends × 4 partitions
    val stats = DocStoreMaintenance.compact(spark, store,
      smallerThan = Long.MaxValue, sortBy = Seq("k"))
    assert(stats.version.contains(5L))
    assert(stats.partitionsCompacted == 4 && stats.filesIn == 16 && stats.filesOut == 4)
    // data byte-identical, layout bin-packed to one file per partition
    assert(readStore(store).orderBy("k").collect().toSeq == before)
    assert(DocStore.listFiles(store).size == 4)
    val filesPerPart = readStore(store).select(col("p"), col("_file"))
      .groupBy("p").agg(countDistinct("_file").as("n"))
      .collect().map(_.getLong(1)).toSeq
    assert(filesPerPart.forall(_ == 1L))
    // time travel to the pre-compaction version still reads the OLD
    // file set — 16 files, same rows
    val v4 = readStore(store, Some(4L))
    assert(v4.orderBy("k").collect().toSeq == before)
    assert(v4.select(countDistinct("_file")).head.getLong(0) == 16)
    // a second compaction is a no-op (nothing left to bin)
    assert(DocStoreMaintenance.compact(spark, store,
      smallerThan = Long.MaxValue).partitionsCompacted == 0)
  }

  test("deleteWhere on a snapshot store is a manifest swap: files stay for time travel") {
    val store = tmpDir("snapdelete")
    appendSlice(store, 0, snapshots = true)
    appendSlice(store, 1)
    val table = DocStoreTable(store, readStore(store).schema, Seq("p"))
    val del: Array[org.apache.spark.sql.sources.Filter] = Array(EqualTo("p", "p0"))
    assert(table.canDeleteWhere(del))
    table.deleteWhere(del)
    assert(readStore(store).filter(col("p") === "p0").count() == 0)
    assert(readStore(store).count() == 14)
    // physically still there (older versions reference them)…
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$store/p=p0")))
    // …and the pre-delete version still reads them
    assert(readStore(store, Some(2L)).filter(col("p") === "p0").count() == 6)
  }

  test("optimistic concurrency: claims serialize; a dead in-flight claim is swept, not wedged") {
    val store = tmpDir("snapclaims")
    appendSlice(store, 0, snapshots = true) // v1
    DocStore.commitSnapshot(store)(identity) // v2, no-change commit
    assert(DocStore.currentSnapshot(store).map(_._1).contains(2L))
    // a claimed-but-incomplete manifest (writer died mid-write): no
    // #end sentinel → readers fall back to v2
    val dead = Paths.get(store, DocStore.SnapshotDir, "v3")
    Files.write(dead,
      "# docstore snapshot v3\nsome/file.parquet\n".getBytes("UTF-8")): Unit
    assert(DocStore.currentSnapshot(store).map(_._1).contains(2L))
    // a contender must NOT claim past the in-flight head (that's the
    // lost-update window) — it waits out the mtime-age grace window,
    // then sweeps. Age the dead claim past the grace so the test
    // doesn't sit through real wall-clock.
    Files.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L)): Unit
    val v = DocStore.commitSnapshot(store)(base => base)
    assert(v >= 3L)
    assert(DocStore.readManifest(store, v).isDefined)
    assert(readStore(store).count() == 10)
  }

  test("vacuum reclaims only what no kept version references; expired versions then error") {
    val store = tmpDir("snapvacuum")
    (0 until 3).foreach(appendSlice(store, _, snapshots = true)) // v1..v3
    DocStoreMaintenance.compact(spark, store, smallerThan = Long.MaxValue) // v4
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val physicalBefore = DocStore.listFilesWithPartitions(store).size // manifest view: 4
    assert(physicalBefore == 4)
    val current = readStore(store).orderBy("k").collect().toSeq
    // default grace: freshly-written files are NOT reaped (safe beside
    // concurrent writers); graceMs = 0 is the quiesced maintenance path
    assert(DocStoreMaintenance.vacuum(store, keepVersions = 1) == 0)
    val deleted = DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L)
    assert(deleted == 12) // the 3 appends × 4 partitions, all retired by compaction
    // current version untouched, byte for byte
    assert(readStore(store).orderBy("k").collect().toSeq == current)
    // expired versions are gone — clear error, not wrong data
    val e = intercept[Exception](readStore(store, Some(3L)).count())
    assert(e.getMessage.contains("no committed snapshot"))
    // the store now holds exactly the referenced files
    assert(DocStore.snapshotVersions(store) == Seq(4L))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).count(_.startsWith("p=")) == 4)
  }

  test("vacuum beside a slow commit: the grace window protects renamed-in-but-unswapped files") {
    val store = tmpDir("snapgrace")
    appendSlice(store, 0, snapshots = true) // v1
    // a slow concurrent commit mid-window: data file renamed in,
    // manifest swap not yet done — referenced by NOTHING right now
    val inflight = Paths.get(store, "p=p0", "inflight-commit.parquet")
    val donor = Paths.get(DocStore.listFiles(store).head.stripPrefix("file:"))
    Files.copy(donor, inflight, StandardCopyOption.REPLACE_EXISTING): Unit
    // default-grace vacuum AND orphanSweep both skip the young file
    assert(DocStoreMaintenance.vacuum(store, keepVersions = 1) == 0)
    assert(DocStoreMaintenance.orphanSweep(store) == 0)
    assert(Files.exists(inflight))
    // the slow commit completes its swap — the file is now referenced
    // and survives even a zero-grace vacuum
    DocStore.commitSnapshot(store)(base =>
      base :+ "p=p0/inflight-commit.parquet") // v2
    DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L): Unit
    assert(Files.exists(inflight))
    // 10 original rows + the donor file's rows duplicated into p=p0
    val donorRows = spark.read.parquet(donor.toString).count()
    assert(readStore(store).count() == 10 + donorRows)
  }

  test("orphanSweep reclaims aged failed-commit litter without expiring any version") {
    val store = tmpDir("snaporphan")
    appendSlice(store, 0, snapshots = true) // v1
    appendSlice(store, 1) // v2
    val old = java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 3600000L)
    // failed-commit litter: an unreferenced data file and a crashed
    // write's staging dir, both past the grace
    val litter = Paths.get(store, "p=p0", "dead-commit.parquet")
    Files.copy(Paths.get(DocStore.listFiles(store).head.stripPrefix("file:")),
      litter, StandardCopyOption.REPLACE_EXISTING): Unit
    Files.setLastModifiedTime(litter, old): Unit
    val staging = Paths.get(store, "_staging-deadbeef")
    Files.createDirectories(staging): Unit
    Files.setLastModifiedTime(staging, old): Unit
    assert(DocStoreMaintenance.orphanSweep(store) == 2)
    assert(!Files.exists(litter) && !Files.exists(staging))
    // every version still reads — nothing expired
    assert(readStore(store, Some(1L)).count() == 10)
    assert(readStore(store).count() == 20)
  }

  test("write-write conflict: a swap retiring files a concurrent commit already dropped aborts") {
    val store = tmpDir("snapconflict")
    appendSlice(store, 0, snapshots = true)
    appendSlice(store, 1)
    val victim = DocStore.listFiles(store).head
    val victimRel = DocStore.relOf(store, victim)
    // a "concurrent" commit retires the victim first (a DELETE, another
    // MERGE, a compactor)…
    DocStore.commitSnapshot(store)(_.filterNot(_ == victimRel))
    // …then a copy-on-write commit that computed its replacement rows
    // FROM the victim tries to retire it: filtering silently would
    // resurrect the concurrent commit's outcome, so the swap must abort
    val stale = graft.sources.DocStoreBatchWrite(
      store, readStore(store).schema, Seq("p"), "conflict-test",
      truncateFirst = false, replaceFiles = Some(() => Seq(victim)))
    val e = intercept[IllegalStateException](stale.commit(Array.empty))
    assert(e.getMessage.contains("write-write conflict"))
    // the store is untouched: current snapshot still serves the winner's
    // state and the victim stays retired
    assert(!DocStore.currentSnapshot(store).get._2.contains(victimRel))
  }

  test("SQL time travel through the catalog: VERSION AS OF and TIMESTAMP AS OF") {
    val root = tmpDir("snapcat_root")
    if (spark.conf.getOption("spark.sql.catalog.snapcat").isEmpty) {
      spark.conf.set("spark.sql.catalog.snapcat", "graft.sources.DocStoreCatalog")
      spark.conf.set("spark.sql.catalog.snapcat.root", root)
    }
    spark.sql("CREATE NAMESPACE snapcat.db")
    spark.sql("CREATE TABLE snapcat.db.t (k BIGINT, p STRING) USING docstore")
    val path = s"$root/db/t"
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "p")
      .write.format("docstore").option("path", path)
      .option("snapshots", "true").mode("append").save() // v1
    Seq((3L, "c")).toDF("k", "p")
      .write.format("docstore").option("path", path)
      .mode("append").save() // v2
    assert(spark.sql("SELECT count(*) FROM snapcat.db.t").head.getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM snapcat.db.t VERSION AS OF 1")
      .head.getLong(0) == 2)
    assert(spark.sql("SELECT sum(k) FROM snapcat.db.t VERSION AS OF 2")
      .head.getLong(0) == 6)
    // TIMESTAMP AS OF far in the future resolves to the newest snapshot
    assert(spark.sql(
      "SELECT count(*) FROM snapcat.db.t TIMESTAMP AS OF '2999-01-01'")
      .head.getLong(0) == 3)
    // …and before the first commit is a clear error, not wrong data
    val e = intercept[Exception](spark.sql(
      "SELECT count(*) FROM snapcat.db.t TIMESTAMP AS OF '1990-01-01'").collect())
    assert(e.getMessage.contains("no snapshot"))
    // a plain (non-snapshot) table refuses time travel outright
    spark.sql("CREATE TABLE snapcat.db.plain (k BIGINT) USING docstore")
    spark.sql("INSERT INTO snapcat.db.plain VALUES (1)")
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM snapcat.db.plain VERSION AS OF 1").collect())
    assert(e2.getMessage.contains("not snapshot-enabled"))
  }

  test("a contender never claims past an uncommitted head: the slow writer's commit stays in lineage") {
    val store = tmpDir("snapslow")
    appendSlice(store, 0, snapshots = true) // v1
    val v1 = DocStore.readManifest(store, 1L).get
    // simulate a LIVE writer mid-write: v2 claimed, sentinel not yet
    // written (GC pause / slow storage)
    val claim = Paths.get(store, DocStore.SnapshotDir, "v2")
    Files.write(claim, "# docstore snapshot v2\n".getBytes("UTF-8")): Unit
    // the contender must WAIT behind the young in-flight claim — not
    // base on v1 and claim v3, which would drop v2 from all lineage
    val contender = new Thread(() =>
      DocStore.commitSnapshot(store, staleClaimGraceMs = 5000L)(
        base => base :+ "marker/from-contender.parquet"): Unit)
    contender.start()
    Thread.sleep(300) // contender is now in its wait loop
    // the slow writer completes v2 with its own added file
    val v2entries = (v1 :+ "slow/writer.parquet").distinct.sorted
    Files.write(claim, (s"# docstore snapshot v2\n" +
      v2entries.map(_ + "\n").mkString +
      s"#end ${v2entries.length}\n").getBytes("UTF-8")): Unit
    contender.join(15000)
    assert(!contender.isAlive)
    // contender landed v3 BASED ON v2: both updates survive
    val v3 = DocStore.readManifest(store, 3L)
    assert(v3.exists(_.contains("slow/writer.parquet")))
    assert(v3.exists(_.contains("marker/from-contender.parquet")))
  }

  test("commit protocol under real contention: 8 writers x 5 commits, nobody's update lost") {
    val store = tmpDir("snapcontend")
    appendSlice(store, 0, snapshots = true) // v1
    val writers = 8
    val each = 5
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() =>
        try (0 until each).foreach { i =>
          DocStore.commitSnapshot(store, staleClaimGraceMs = 10000L)(
            base => base :+ s"marker/w$w-$i.parquet"): Unit
        } catch { case t: Throwable => errs.add(t): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.getMessage)}")
    // every commit serialized to its own version: v1 + 40 commits
    val versions = DocStore.snapshotVersions(store)
      .filter(DocStore.readManifest(store, _).isDefined)
    assert(versions == (1L to (1 + writers * each)).toSeq,
      s"non-contiguous committed versions: $versions")
    // and the FINAL lineage contains every writer's every marker —
    // the 'nobody's update is lost' contract under real interleaving
    val last = DocStore.currentSnapshot(store).get._2.toSet
    val missing = for {
      w <- 0 until writers; i <- 0 until each
      m = s"marker/w$w-$i.parquet" if !last.contains(m)
    } yield m
    assert(missing.isEmpty, s"lost updates: $missing")
  }

  test("TIMESTAMP AS OF survives mtime resets: commit time lives inside the manifest") {
    val root = tmpDir("snapts_root")
    if (spark.conf.getOption("spark.sql.catalog.snapts").isEmpty) {
      spark.conf.set("spark.sql.catalog.snapts", "graft.sources.DocStoreCatalog")
      spark.conf.set("spark.sql.catalog.snapts.root", root)
    }
    spark.sql("CREATE NAMESPACE snapts.db")
    val path = s"$root/db/t"
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "p").write.format("docstore")
      .option("path", path).option("snapshots", "true").mode("append").save() // v1
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    Seq((2L, "b")).toDF("k", "p").write.format("docstore")
      .option("path", path).mode("append").save() // v2
    // a copy/rsync/restore resets every mtime — simulate the worst case
    val snapDir = Paths.get(path, DocStore.SnapshotDir)
    Files.list(snapDir).forEach(p => Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(0L)): Unit)
    val midLit = java.time.Instant.ofEpochMilli(mid)
      .atZone(java.time.ZoneId.systemDefault())
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
      s"SELECT count(*) FROM snapts.db.t TIMESTAMP AS OF '$midLit'")
      .head.getLong(0) == 1)
    assert(spark.sql(
      "SELECT count(*) FROM snapts.db.t TIMESTAMP AS OF '2999-01-01'")
      .head.getLong(0) == 2)
    // the PATH API resolves the same instants via the timestampAsOf
    // read option (epoch millis / SQL timestamp / bare date)
    assert(spark.read.format("docstore").option("path", path)
      .option("timestampAsOf", mid.toString).load().count() == 1)
    assert(spark.read.format("docstore").option("path", path)
      .option("timestampAsOf", "2999-01-01").load().count() == 2)
    val e = intercept[Exception](spark.read.format("docstore")
      .option("path", path).option("timestampAsOf", "1990-01-01").load().count())
    assert(e.getMessage.contains("no snapshot"))
  }

  test("schema evolution on snapshot stores: add nullable column, widen int to bigint; unsafe changes rejected") {
    import spark.implicits._
    val store = tmpDir("snapevolve")
    // generation 1: (k int, v string)
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    // generation 2 EVOLVES: k widened to bigint, nullable column added
    Seq((3L, "c", 1.5), (4L, "d", 2.5)).toDF("k", "v", "score")
      .write.format("docstore").option("path", store)
      .option("mergeSchema", "true").mode("append").save()
    val df = spark.read.format("docstore").option("path", store).load()
    // reconciled schema: k is bigint, score exists and is nullable
    assert(df.schema("k").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("score").nullable)
    // old files read score as null, widened k as long
    val rows = df.orderBy("k")
      .select(col("k"), col("v"), col("score")).collect().toSeq
    assert(rows.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))) ==
      Seq((1L, "a", None), (2L, "b", None),
        (3L, "c", Some(1.5)), (4L, "d", Some(2.5))))
    // filters on the evolved column apply exactly (null never passes >)
    assert(df.filter(col("score") > 2.0).select("k").as[Long].collect().toSeq == Seq(4L))
    assert(df.filter(col("score").isNull).count() == 2)
    // projecting ONLY the new column over an old file yields nulls
    assert(df.select("score").collect().count(_.isNullAt(0)) == 2)
    // aggregate pushdown refuses evolved columns per-file (stats absent
    // from old files) but still answers correctly through the data scan
    assert(df.agg(sum("k")).head.getLong(0) == 10L)
    // UNSAFE: a type change that isn't int->bigint fails the WRITE, at
    // plan time, with both sides named
    val e = intercept[Exception] {
      Seq(("x", "y", 1.0)).toDF("k", "v", "score")
        .write.format("docstore").option("path", store)
        .option("mergeSchema", "true").mode("append").save()
    }
    assert(e.getMessage.contains("UNSAFE schema change"))
    // …and a mergeSchema write to a PLAIN store is refused outright
    val plain = tmpDir("plainevolve")
    Seq((1, "a")).toDF("k", "v")
      .write.format("docstore").option("path", plain).mode("append").save()
    val e2 = intercept[Exception] {
      Seq((2, "b", 1.0)).toDF("k", "v", "score")
        .write.format("docstore").option("path", plain)
        .option("mergeSchema", "true").mode("append").save()
    }
    assert(e2.getMessage.contains("snapshot store"))
  }

  test("aggregate pushdown across an int->bigint widening: old INT32 files feed the LongType agg slot") {
    import spark.implicits._
    val store = tmpDir("snapwideagg")
    Seq((1, "a"), (2, "b")).toDF("k", "v") // gen 1: k is int
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    Seq((30L, "c"), (40L, "d")).toDF("k", "v") // gen 2: k widened to bigint
      .write.format("docstore").option("path", store)
      .option("mergeSchema", "true").mode("append").save()
    val df = spark.read.format("docstore").option("path", store).load()
    val agg = df.agg(min("k").as("lo"), max("k").as("hi"),
      count("k").as("n"))
    // the aggregate must actually push (footer stats carry k in every
    // file), and the per-file partial rows must box Long even for the
    // INT32 gen-1 file — the pre-fix behavior threw CCE at the merge
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregation"),
      agg.queryExecution.executedPlan.toString.take(1500))
    val r = agg.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 40L, 4L)))
  }

  test("change feed across an int->bigint widening: one commit's legs span both physical schemas") {
    import graft.sources.DocStoreChanges
    import spark.implicits._
    val store = tmpDir("snapwidecdf")
    Seq((1, "a"), (2, "b")).toDF("k", "v") // v1: k int
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    Seq((30L, "c")).toDF("k", "v") // v2: k widened
      .write.format("docstore").option("path", store)
      .option("mergeSchema", "true").mode("append").save()
    // v3: a single rewrite commit retiring files of BOTH widths —
    // builtin mergeSchema cannot merge int with bigint, so the
    // pre-fix leg read failed here even though the store reads fine
    DocStore.commitSnapshot(store, op = "overwrite")(_ => Nil): Unit
    val all = DocStoreChanges.changes(spark, store, 0, 3)
    assert(all.schema("k").dataType == org.apache.spark.sql.types.LongType)
    val byType = all.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 3L, "delete" -> 3L), s"got $byType")
    // the delete leg carries the retired rows with k read as long
    assert(all.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 30L))
  }

  test("change feed: appends insert, deletes delete, compaction is invisible, ranges chain") {
    import graft.sources.DocStoreChanges
    import spark.implicits._
    val store = tmpDir("snapcdf")
    appendSlice(store, 0, snapshots = true) // v1: 10 rows across 4 partitions
    appendSlice(store, 1) // v2: 10 more
    // v3: metadata-only partition DELETE of p=p0
    val table = DocStoreTable(store, readStore(store).schema, Seq("p"))
    val del: Array[org.apache.spark.sql.sources.Filter] = Array(EqualTo("p", "p0"))
    table.deleteWhere(del)
    val deleted = 20 - readStore(store).count() // rows the delete dropped
    assert(deleted > 0)
    // v4: compaction — bytes move, no data changes
    DocStoreMaintenance.compact(spark, store, smallerThan = Long.MaxValue): Unit
    assert(DocStore.currentSnapshot(store).map(_._1).contains(4L))
    assert(DocStore.commitOp(store, 3) == "delete")
    assert(DocStore.commitOp(store, 4) == "compact")
    val all = DocStoreChanges.changes(spark, store, 0, 4)
    // 20 inserts (v1+v2), `deleted` deletes (v3), nothing from v4
    val byType = all.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 20L, "delete" -> deleted),
      s"change feed mismatch: $byType")
    // partition values re-attach exactly; deletes carry the dropped rows
    assert(all.filter(col("_change_type") === "delete")
      .select("p").distinct().as[String].collect().toSeq == Seq("p0"))
    // versions stamp correctly and ranges CHAIN: (0,2] ∪ (2,4] = (0,4]
    val first = DocStoreChanges.changes(spark, store, 0, 2)
    val second = DocStoreChanges.changes(spark, store, 2, 4)
    assert(first.count() + second.count() == all.count())
    assert(second.filter(col("_change_type") === "insert").count() == 0)
    assert(DocStore.commitOp(store, 1) == "append")
    // a rewrite commit (here: op=merge retiring one file, adding a
    // copy under a new name) surfaces as delete+insert churn of the
    // rewritten group — the documented copy-on-write semantics
    val victim = DocStore.currentSnapshot(store).get._2.head
    val twinRel = victim.replaceAll("[^/]+$", "rewrite-twin.parquet")
    Files.copy(Paths.get(store, victim), Paths.get(store, twinRel),
      StandardCopyOption.REPLACE_EXISTING): Unit
    DocStore.commitSnapshot(store, op = "merge")(
      base => base.filterNot(_ == victim) :+ twinRel): Unit // v5
    val cow = DocStoreChanges.changes(spark, store, 4, 5)
    val cowTypes = cow.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(cowTypes.getOrElse("delete", 0L) == cowTypes.getOrElse("insert", 0L) &&
      cowTypes.getOrElse("delete", 0L) > 0L,
      s"rewrite commit should emit matched delete+insert churn: $cowTypes")
  }

  test("streaming sink into a snapshot store: epochs become visible at the manifest swap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("snapstream")
    val in = MemoryStream[Long]
    in.addData(1L to 20L: _*)
    val q = in.toDF().withColumnRenamed("value", "k")
      .writeStream.format("docstore")
      .option("path", store).option("snapshots", "true")
      .option("checkpointLocation", tmpDir("snapstream_cp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(DocStore.snapshotEnabled(store))
    assert(DocStore.currentSnapshot(store).exists(_._2.nonEmpty))
    assert(readStore(store).count() == 20)
  }
}
