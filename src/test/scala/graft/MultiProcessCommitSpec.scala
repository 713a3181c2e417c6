package graft

import graft.sources.DocStore

/** SEPARATE-PROCESS commit contention: the 8-writer in-JVM spec
  * (SnapshotSpec) exercises the optimistic retry loop, but the
  * O_CREAT|O_EXCL local-claim fix specifically targets CROSS-PROCESS
  * atomicity — Hadoop's local exclusive-create is an exists-check
  * then open, a check-then-act race only real processes can hit. This
  * forks real JVMs (plain java, no Spark — the commit protocol is
  * hadoop-client + our classes) hammering one store and asserts the
  * serialized truth: dense version lineage, every writer's every
  * commit present exactly once, no lost update. */
class MultiProcessCommitSpec extends SparkSpec {

  private val Writers = 5
  private val CommitsEach = 6

  test("forked JVMs hammering commitSnapshot: dense lineage, no lost update") {
    val store = tmpDir("mpcommit")
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val procs = (0 until Writers).map { w =>
      new ProcessBuilder(java, "-cp", cp,
        "graft.CommitHammer", store, w.toString, CommitsEach.toString)
        .redirectErrorStream(true)
        .start()
    }
    val outputs = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val code = p.waitFor()
      (code, out)
    }
    outputs.foreach { case (code, out) =>
      assert(code == 0, s"hammer JVM failed (exit $code):\n${out.takeRight(2000)}")
    }
    // dense committed lineage: exactly Writers*CommitsEach versions,
    // every one sentinel-complete
    val versions = DocStore.snapshotVersions(store)
    assert(versions == (1L to (Writers * CommitsEach)),
      s"lineage not dense: $versions")
    versions.foreach { v =>
      assert(DocStore.readManifest(store, v).isDefined, s"v$v not committed")
    }
    // the final snapshot holds every writer's every entry exactly once
    val finalEntries = DocStore.currentSnapshot(store).get._2
    val expected = (for {
      w <- 0 until Writers
      c <- 0 until CommitsEach
    } yield f"w$w-c$c%03d.parquet").sorted
    assert(finalEntries.sorted == expected,
      s"lost/duplicated update: ${finalEntries.size} entries vs ${expected.size}")
    // each version adds EXACTLY one entry over its predecessor — the
    // serialized history is a chain of single appends, interleaved
    // across processes
    versions.foreach { v =>
      val cur = DocStore.readManifest(store, v).get.toSet
      val prev = if (v == 1) Set.empty[String]
        else DocStore.readManifest(store, v - 1).get.toSet
      assert(prev.subsetOf(cur) && (cur -- prev).size == 1,
        s"v$v is not a single append over v${v - 1}")
    }
  }
}
