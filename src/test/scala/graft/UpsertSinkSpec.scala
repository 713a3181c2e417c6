package graft

import graft.sources.{DocStore, DocStoreUpsertStreamingWrite}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming UPSERT sink: each micro-batch applies as a merge-on-read
  * commit against the target (the CDC loop closed natively). Pins the
  * plain key-upsert semantics, delete handling from a change feed,
  * exactly-once across epoch re-commits (the crash-replay the marker
  * protocol exists for), and the no-positions-through-the-driver
  * contract (fragments are executor-written; only bindings return). */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def readStore(path: String) =
    spark.read.format("docstore").option("path", path).load()

  test("plain upsert by key: later batches replace matching rows, new keys insert, one rowdelta per epoch") {
    val target = tmpDir("ups_plain")
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("k", "v")
      .writeStream.format("docstore").option("path", target)
      .option("mode", "upsert").option("keys", "k")
      .option("checkpointLocation", tmpDir("ups_plain_cp"))
      .trigger(Trigger.AvailableNow())
    in.addData((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    q.start().awaitTermination()
    assert(readStore(target).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // second epoch: update 2 and 4, insert 5 — old rows die as DVs or
    // retired files, never duplicates
    in.addData((2L, "B"), (4L, "D"), (5L, "e"))
    q.start().awaitTermination()
    assert(readStore(target).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D"), (5L, "e")))
    val v = DocStore.currentSnapshot(target).get._1
    assert(DocStore.commitOp(target, v) == "rowdelta")
    // within-epoch duplicate keys without a version column refuse
    in.addData((7L, "x"), (7L, "y"))
    val e = intercept[Exception](q.start().awaitTermination())
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_: Any)).mkString(" | ")
    assert(msg.contains("multiple surviving rows"), msg)
  }

  test("change-feed batches: _commit_version picks the final action, delete rows remove") {
    val target = tmpDir("ups_cdc")
    val in = MemoryStream[(Long, String, String, Long)](spark)
    val q = in.toDF().toDF("k", "v", "_change_type", "_commit_version")
      .writeStream.format("docstore").option("path", target)
      .option("mode", "upsert").option("keys", "k")
      .option("checkpointLocation", tmpDir("ups_cdc_cp"))
      .trigger(Trigger.AvailableNow())
    // one batch replaying a version RANGE: k=1 inserted then updated
    // (delete+insert at v2), k=2 inserted then deleted, k=3 inserted
    in.addData(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 1L),
      (1L, "a", "delete", 2L), (1L, "A", "insert", 2L),
      (2L, "b", "delete", 3L))
    q.start().awaitTermination()
    assert(readStore(target).select("k", "v").as[(Long, String)]
      .collect().sorted.toSeq == Seq((1L, "A"), (3L, "c")))
    // a later batch deleting k=3 against existing state
    in.addData((3L, "c", "delete", 4L))
    q.start().awaitTermination()
    assert(readStore(target).select("k", "v").as[(Long, String)]
      .collect().toSeq == Seq((1L, "A")))
  }

  test("epoch re-commit is exactly-once: the marker makes a replayed commit a no-op") {
    val target = tmpDir("ups_replay")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", target)
      .option("snapshots", "true").mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val write = DocStoreUpsertStreamingWrite(target, schema, Nil, "replayq", Seq("k"))
    def stageEpoch(epoch: Long): org.apache.spark.sql.connector.write.WriterCommitMessage = {
      val w = write.createStreamingWriterFactory(null).createWriter(0, 0L, epoch)
      w.write(org.apache.spark.sql.catalyst.InternalRow(2L,
        org.apache.spark.unsafe.types.UTF8String.fromString("B")))
      w.commit()
    }
    val msg = stageEpoch(7L)
    write.commit(7L, Array(msg))
    val after = readStore(target).as[(Long, String)].collect().sorted.toSeq
    assert(after == Seq((1L, "a"), (2L, "B")))
    val vAfter = DocStore.currentSnapshot(target).get._1
    // crash-replay: the epoch re-executes (restaged) and re-commits —
    // the marker short-circuits it; no new version, no state change
    val msg2 = stageEpoch(7L)
    write.commit(7L, Array(msg2))
    assert(DocStore.currentSnapshot(target).get._1 == vAfter)
    assert(readStore(target).as[(Long, String)].collect().sorted.toSeq == after)
  }

  test("upsert deletes ship as executor-written fragments: rowdelta binds DVs, files not rewritten") {
    val target = tmpDir("ups_frag")
    // a multi-file target so deletes scatter
    (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4)
      .write.format("docstore").option("path", target)
      .option("snapshots", "true").mode("append").save()
    val before = DocStore.currentSnapshot(target).get._2.toSet
    val in = MemoryStream[(Long, String)](spark)
    in.addData((0L until 100L by 3L).map(i => (i, "upd")): _*)
    in.toDF().toDF("k", "v")
      .writeStream.format("docstore").option("path", target)
      .option("mode", "upsert").option("keys", "k")
      .option("checkpointLocation", tmpDir("ups_frag_cp"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val (v, rels) = DocStore.currentSnapshot(target).get
    // pre-existing files all still present (deletes were DVs)…
    assert(before.subsetOf(rels.toSet))
    // …with bindings covering exactly the updated keys' old rows
    val dvs = DocStore.readManifestDvs(target, v)
    assert(dvs.nonEmpty)
    val hidden = dvs.values.map(r => DocStore.dvCardinality(
      new org.apache.hadoop.fs.Path(target, r).toString)).sum
    assert(hidden == (0L until 100L by 3L).size.toLong, hidden.toString)
    val got = readStore(target).as[(Long, String)].collect().toMap
    assert(got.size == 100)
    assert((0L until 100L).forall(i =>
      got(i) == (if (i % 3 == 0) "upd" else s"v$i")))
  }
}
