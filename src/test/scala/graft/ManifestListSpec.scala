package graft

import graft.sources.{DocStore, DocStoreMaintenance}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** O(delta) commit metadata: a snapshot commit writes ONE immutable
  * delta manifest holding only its added/retired entries (+ stats/DV
  * bindings) and a small version file referencing the manifest CHAIN —
  * the Iceberg manifest-list / Delta log-segment+checkpoint split.
  * Before this, every commit rewrote the full live-file listing with
  * `#stat` lines: O(live files) metadata write AND read per commit —
  * hundreds of MB per commit at the millions of files a 100 TB store
  * holds. These specs pin the commit-cost property itself (bytes
  * written by commit N+1 independent of live-file count), the
  * consolidation cadence that bounds chain length, legacy inline
  * manifest interop, and manifest GC. */
class ManifestListSpec extends SparkSpec {
  import spark.implicits._

  /** Total bytes of `_snapshots/` files created by `body`. */
  private def snapBytesWritten(store: String)(body: => Unit): Long = {
    val dir = Paths.get(store, DocStore.SnapshotDir)
    def snap(): Map[String, Long] =
      if (!Files.exists(dir)) Map.empty
      else Files.list(dir).iterator().asScala
        .map(p => p.getFileName.toString -> Files.size(p)).toMap
    val before = snap()
    body
    snap().collect { case (n, sz) if !before.contains(n) => sz }.sum
  }

  private def appendOne(store: String, base: Long): Unit =
    Seq((base, s"v$base")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()

  test("commit metadata is O(changes): append bytes independent of live-file count") {
    // store A: 4 live files; store B: 64 live files (one commit each,
    // so neither is near the consolidation cadence)
    val a = tmpDir("mlist_small")
    val b = tmpDir("mlist_big")
    (0L until 4L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4)
      .write.format("docstore").option("path", a)
      .option("snapshots", "true").mode("append").save()
    (0L until 64L).map(i => (i, s"v$i")).toDF("k", "v").repartition(64)
      .write.format("docstore").option("path", b)
      .option("snapshots", "true").mode("append").save()
    // empty shuffle partitions write no file — compare actual counts
    val liveA = DocStore.currentSnapshot(a).get._2.size
    val liveB = DocStore.currentSnapshot(b).get._2.size
    assert(liveA >= 2 && liveB >= liveA * 8, s"$liveA vs $liveB live files")
    val bytesA = snapBytesWritten(a)(appendOne(a, 100L))
    val bytesB = snapBytesWritten(b)(appendOne(b, 100L))
    assert(bytesA > 0 && bytesB > 0)
    // 16× the live files, same commit cost (±256 bytes of noise —
    // the delta manifest holds ONE add either way)
    assert(math.abs(bytesB - bytesA) < 256,
      s"append to 64-file store wrote $bytesB bytes vs $bytesA on 4-file store")
    // both stores resolve exactly
    assert(spark.read.format("docstore").option("path", a).load().count() == 5)
    assert(spark.read.format("docstore").option("path", b).load().count() == 65)
  }

  test("chain consolidation: length stays bounded, every version resolves, stats survive") {
    val store = tmpDir("mlist_consolidate")
    val commits = DocStore.ConsolidateChainLen * 2 + 3 // crosses 2 consolidations
    (0 until commits).foreach(i => appendOne(store, i.toLong))
    val (v, rels) = DocStore.currentSnapshot(store).get
    assert(v == commits.toLong && rels.size == commits)
    val chain = DocStore.snapState(store, v).get.chain
    assert(chain.nonEmpty && chain.size <= DocStore.ConsolidateChainLen,
      s"chain length ${chain.size} exceeds bound")
    // every historical version still resolves to exactly its prefix
    (1 to commits).foreach { i =>
      assert(DocStore.readManifest(store, i.toLong).get.size == i, s"v$i")
    }
    // stats carried through consolidations: all files described
    val stats = DocStore.readManifestStats(store, v)
    assert(stats.size == commits)
    assert(stats.values.map(_.rows).sum == commits.toLong)
    // and the data reads whole
    assert(spark.read.format("docstore").option("path", store).load()
      .count() == commits.toLong)
  }

  test("legacy inline-entry manifests interoperate: reads resolve, the next commit consolidates") {
    val store = tmpDir("mlist_legacy")
    appendOne(store, 0L) // v1, chain format
    val rels = DocStore.currentSnapshot(store).get._2
    // hand-write a LEGACY v2: inline entries + #stat + #dv-less, the
    // pre-manifest-list format an external tool might still produce
    val legacy = Paths.get(store, DocStore.SnapshotDir, "v2")
    Files.write(legacy, (s"# docstore snapshot v2\n#ts ${System.currentTimeMillis()}\n" +
      "#op append\n" + rels.map(_ + "\n").mkString +
      s"#end ${rels.length}\n").getBytes("UTF-8")): Unit
    assert(DocStore.readManifest(store, 2L).contains(rels))
    assert(DocStore.snapState(store, 2L).get.chain.isEmpty)
    // a commit on the legacy base works and lands a consolidated chain
    appendOne(store, 1L) // v3
    val s3 = DocStore.snapState(store, 3L).get
    assert(s3.chain.size == 1, s3.chain.toString)
    assert(s3.entries.size == 2)
    assert(spark.read.format("docstore").option("path", store).load().count() == 2)
    // consolidation BACKFILLED stats for the legacy base's entries
    assert(DocStore.readManifestStats(store, 3L).size == 2)
  }

  test("manifest GC: vacuum reaps manifests only expired versions referenced; orphan sweep reaps failed-commit litter") {
    val store = tmpDir("mlist_gc")
    (0 until 5).foreach(i => appendOne(store, i.toLong)) // v1..v5
    val snapDir = Paths.get(store, DocStore.SnapshotDir)
    def manifests(): Set[String] = Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("m-")).toSet
    val keptChain = DocStore.snapState(store, 5L).get.chain.toSet
    assert(manifests().size == 5)
    // orphan litter: a manifest written by a commit that lost its race
    val orphan = snapDir.resolve("m-deadbeef-orphan")
    Files.write(orphan, "# docstore delta manifest\n#mend 0\n".getBytes("UTF-8")): Unit
    Files.setLastModifiedTime(orphan, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 3600000L)): Unit
    assert(DocStoreMaintenance.orphanSweep(store) == 1)
    assert(!Files.exists(orphan))
    assert(manifests().size == 5, "live chain manifests must survive orphan sweep")
    // vacuum to 1 version: v1..v4 drop; their chain prefixes stay
    // EXACTLY as far as v5's chain references them
    DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L): Unit
    assert(DocStore.snapshotVersions(store) == Seq(5L))
    assert(manifests() == keptChain,
      s"expected exactly v5's chain to survive: ${manifests()} vs $keptChain")
    assert(spark.read.format("docstore").option("path", store).load().count() == 5)
  }
}
