package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-only semantics (SURVEY §2B "Streaming", ✖-oracle rows):
  * watermark late-data drop, stream dedup, session windows, arbitrary
  * state, streaming parquet sink — driven synchronously by MemoryStream. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling window agg with watermark drops late data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val agg = StreamOps.tumblingCounts(in.toDS())
    val q = agg.writeStream.format("memory").queryName("tumble").outputMode("append").start()
    // batch 1: two events in hour 10
    in.addData(
      Event(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "view", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 10:20:00"), 1, "view", 2.0))
    q.processAllAvailable()
    // batch 2: advance watermark far past hour 10 (wm = max - 1h)
    in.addData(Event(3, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "view", 3.0))
    q.processAllAvailable()
    // batch 3: a LATE event back in hour 10 — must be dropped
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 10:30:00"), 1, "view", 100.0))
    q.processAllAvailable()
    // batch 4: advance again so hour-13 window also closes
    in.addData(Event(5, Timestamp.valueOf("2024-01-01 15:00:00"), 1, "view", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumble").collect()
    val hour10 = rows.find(_.getAs[Timestamp]("w_start") == Timestamp.valueOf("2024-01-01 10:00:00")).get
    assert(hour10.getAs[Long]("n") == 2, "late event must not be counted")
    assert(hour10.getAs[Double]("sum_val") == 3.0)
  }

  test("windowed top-k: stream-finalized windows rank identically to batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the stream_windowed_topk contract: the streaming windowed agg
    // finalizes exactly the windows batch computes; the rank is then a
    // per-finalized-window batch step (foreachBatch in production)
    val events = Seq(
      Event(1, ts(2), 1, "view", 1.0), Event(2, ts(3), 1, "view", 1.0),
      Event(3, ts(4), 2, "click", 1.0), Event(4, ts(5), 3, "error", 1.0),
      Event(5, ts(6), 1, "error", 1.0), Event(6, ts(7), 2, "error", 1.0),
      Event(7, ts(12), 1, "click", 1.0), Event(8, ts(13), 2, "click", 1.0),
      Event(9, ts(14), 1, "view", 1.0))
    val in = MemoryStream[Event]
    val counts = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName("wtopk")
      .outputMode("append").start()
    in.addData(events: _*)
    q.processAllAvailable()
    // advance event time far enough that both windows finalize
    in.addData(Event(99, Timestamp.valueOf("2024-01-01 11:00:00"), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    def rank(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("w_start").orderBy(col("n").desc, col("event_type"))
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
        .orderBy("w_start", "rk")
        .collect().map(r => (r.getAs[Timestamp]("w_start").toString,
          r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    }
    val streamSide = rank(spark.table("wtopk"))
    val batchSide = rank(events.toDF()
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n")))
    assert(streamSide.nonEmpty)
    assert(streamSide === batchSide,
      "finalized stream windows must rank exactly like the batch query")
  }

  test("dropDuplicatesWithinWatermark removes dups, keeps state bounded") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.dedupWithinWatermark(in.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(1, ts(1), 1, "view", 1.0), // dup id within watermark
      Event(2, ts(2), 1, "click", 2.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(3), 1, "view", 1.0)) // still within watermark → dropped
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("session_window (stream) matches gap-and-island batch computation") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val events = Seq(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(5), 1, "view", 1.0),   // same session (gap 5m < 10m)
      Event(3, ts(30), 1, "view", 1.0),  // new session (gap 25m)
      Event(4, ts(2), 2, "view", 1.0))   // other user
    val in = MemoryStream[Event]
    val q = StreamOps.sessionWindows(in.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    in.addData(events: _*)
    q.processAllAvailable()
    // close sessions by advancing the watermark
    in.addData(Event(99, Timestamp.valueOf("2024-01-01 23:00:00"), 99, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess")
      .filter(col("user_id") < 10)
      .select("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)).sortBy(identity))
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(spark, in.toDS())
      .writeStream.format("memory").queryName("fmgs").outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(5), 1, "view", 1.0),
      Event(3, ts(30), 1, "view", 1.0)) // closes session 1 in-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fmgs").select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.contains((1L, 2L)), s"first session (2 events) should have closed, got $got")
  }

  test("transformWithState keeps running totals across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = StreamOps.runningTotals(spark, in.toDS())
        .writeStream.format("memory").queryName("tws").outputMode("update").start()
      in.addData(Event(1, ts(0), 1, "view", 1.5), Event(2, ts(1), 1, "view", 2.5))
      q.processAllAvailable()
      in.addData(Event(3, ts(2), 1, "view", 4.0)) // second batch, same user
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows.contains((1L, 2L, 4.0)), s"batch-1 totals missing: $rows")
      assert(rows.contains((1L, 3L, 8.0)), s"state not carried to batch 2: $rows")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState survives a kill-and-restart from checkpoint exactly-once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the failure mode a real pipeline meets weekly: the driver dies
    // mid-stream and the query restarts from its checkpoint — RocksDB
    // state (running totals) must be recovered, committed batches must
    // not re-emit, and the next batch must fold into the OLD state
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val cp = tmpDir("graft-tws-cp")
      val in = MemoryStream[Event]
      def start(sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]) =
        StreamOps.runningTotals(spark, in.toDS())
          .writeStream.option("checkpointLocation", cp).outputMode("update")
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[StreamOps.UserTotals], _: Long) =>
              batch.collect().foreach(t => sink.add((t.user_id, t.n_events, t.total_value)))
          }.start()
      val run1 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
      val q1 = start(run1)
      in.addData(Event(1, ts(0), 1, "view", 1.5), Event(2, ts(1), 1, "view", 2.5))
      q1.processAllAvailable()
      q1.stop() // kill
      assert(run1.contains((1L, 2L, 4.0)), s"pre-kill totals wrong: $run1")
      val run2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
      val q2 = start(run2)
      in.addData(Event(3, ts(2), 1, "view", 4.0))
      q2.processAllAvailable()
      q2.stop()
      val resumed = run2.toArray(Array.empty[(Long, Long, Double)]).toSeq
      assert(resumed.contains((1L, 3L, 8.0)),
        s"restart lost the pre-kill RocksDB state: $resumed")
      assert(resumed.size == 1,
        s"restart re-emitted committed batches (not exactly-once): $resumed")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState event-time timers close idle sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = StreamOps.idleSessionCloses(spark, in.toDS(), gapMinutes = 10)
        .writeStream.format("memory").queryName("timers").outputMode("append").start()
      // batch 1: user 1 active at 10:00/10:05 → timer armed at 10:15
      in.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(5), 1, "view", 1.0))
      q.processAllAvailable()
      // batch 2: user 2 at 11:00 pushes the watermark to 10:50 > 10:15
      in.addData(Event(3, ts(60), 2, "view", 1.0))
      q.processAllAvailable()
      // batch 3: timers fire against the watermark computed in batch 2
      in.addData(Event(4, ts(65), 2, "view", 1.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("timers").select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.contains((1L, 2L)),
        s"idle user 1 (2 events) should have been closed by its timer, got $got")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-stream join matches purchases to preceding clicks in range") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.purchaseClickJoin(spark, in.toDS())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "click", 1.0),     // 10:00 click
      Event(2, ts(20), 1, "purchase", 5.0), // 10:20 purchase → joins click@10:00
      Event(3, ts(2), 2, "click", 1.0),     // other user
      Event(4, ts(55), 1, "purchase", 5.0)) // 10:55 → click@10:00 is 55m old, out of range
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj").select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 1L)), s"got $got")
  }

  test("update output mode re-emits only the changed aggregate rows per batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = in.toDS().groupBy("event_type").count()
      .writeStream.format("memory").queryName("updmode").outputMode("update").start()
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(1), 1, "view", 1.0),
      Event(3, ts(2), 2, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(4, ts(3), 1, "view", 1.0)) // only `view` changes
    q.processAllAvailable()
    q.stop()
    // the memory sink keeps every emitted update: view is re-emitted
    // with its new count, click is NOT repeated
    val hist = spark.table("updmode").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(hist.filter(_._1 == "view").map(_._2).sorted == Seq(2L, 3L), s"got $hist")
    assert(hist.filter(_._1 == "click").map(_._2) == Seq(1L), s"got $hist")
  }

  test("file-source stream ingests newly landed files incrementally") {
    import spark.implicits._
    val src = tmpDir("graft-ingest-src")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src)
    val q = StreamOps.fileIngest(spark, src, schema)
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("ingest").count() == 2, "initial files ingested")
    // land another file AFTER the stream started — only the delta flows
    Seq((3L, "c")).toDF("id", "v").coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ingest").select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L), s"late-landed file must be picked up: $got")
  }

  test("checkpointed AvailableNow restart resumes exactly-once, no reprocessing") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = tmpDir("graft-cp-src")
    val out = tmpDir("graft-cp-out")
    val cp = tmpDir("graft-cp-cp")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    def runOnce(): Unit = {
      val q = StreamOps.fileIngest(spark, src, schema)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Seq(1L, 2L).toDF("id").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    Seq(3L).toDF("id").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L),
      s"restart must process ONLY the new file (no dups, no loss): $ids")
  }

  test("stream-static join enriches events with broadcast dimension rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = StreamOps.enrichWithDim(in.toDS(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(1), 2, "view", 1.0),
      Event(3, ts(2), 99, "view", 1.0)) // no dim row → left join keeps it
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich").select("event_id", "tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)), s"got $got")
  }

  test("stream-stream LEFT OUTER join emits unmatched purchases after watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.purchaseClickLeftJoin(spark, in.toDS())
      .writeStream.format("memory").queryName("ssloj").outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "click", 1.0),     // 10:00 click
      Event(2, ts(20), 1, "purchase", 5.0), // 10:20 purchase → joins click@10:00
      Event(3, ts(25), 2, "purchase", 7.0)) // user 2 never clicks
    q.processAllAvailable()
    // advance BOTH watermarks (multi-watermark policy = min) well past
    // 10:25 so the unmatched purchase's state can be finalized...
    in.addData(
      Event(9, Timestamp.valueOf("2024-01-01 13:00:00"), 9, "click", 0.0),
      Event(10, Timestamp.valueOf("2024-01-01 13:00:00"), 9, "purchase", 0.0))
    q.processAllAvailable()
    // ...and one more micro-batch so eviction (which runs on the batch
    // AFTER the watermark update) actually fires.
    in.addData(
      Event(20, Timestamp.valueOf("2024-01-01 13:30:00"), 8, "click", 0.0),
      Event(21, Timestamp.valueOf("2024-01-01 13:30:00"), 8, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssloj").select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got.contains((2L, Some(1L))), s"matched purchase must join its click: $got")
    assert(got.contains((3L, None)), s"unmatched purchase must emit with null click: $got")
  }

  test("foreachBatch sink receives batch DataFrames with batch ids") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = StreamOps.foreachBatchSink(in.toDS().toDF(), tmpDir("graft-feb-cp")) {
      (batch, id) => seen.add(id -> batch.count())
    }
    in.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(1), 1, "view", 1.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = seen.toArray(Array.empty[(Long, Long)]).toSeq.sortBy(_._1)
    assert(rows.map(_._2).sum == 3, s"all events must pass through: $rows")
    assert(rows.map(_._1).distinct.size == rows.size, "distinct batch ids")
  }

  test("streaming parquet sink with checkpoint writes append-mode files") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val out = tmpDir("graft-stream-sink")
    val cp = tmpDir("graft-stream-cp")
    val q = StreamOps.parquetSink(in.toDS().toDF(), out, cp)
    in.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(1), 2, "click", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() == 2)
  }

  test("stream_sink_roundtrip: same source resumes; regenerated source gets a fresh sink") {
    import spark.implicits._
    val dir = tmpDir("graft-sinkrt-src")
    // the fixture layout is a single FILE named events.parquet (the
    // pathGlobFilter matches file names); stage a directory write and
    // copy the part file into place
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = tmpDir("graft-sinkrt-stage")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val ns = 1700000000L * 1000000000L // fixture-style epoch nanos
    val day = 86400L * 1000000000L
    write(Seq((1L, ns, 1L, "purchase", 10.0, "{}"), (2L, ns, 2L, "click", 1.0, "{}")))
    val q = SparkEntry.queries("stream_sink_roundtrip")
    val r1 = q(spark, dir).collect().map(_.toString).toSeq
    assert(r1.length == 1, s"one purchase day expected: $r1")
    // identical source: the checkpoint resumes, nothing reprocessed,
    // identical read-back
    val r2 = q(spark, dir).collect().map(_.toString).toSeq
    assert(r1 === r2)
    // the fixture regenerated IN PLACE (same path, new content): a
    // stale checkpoint would silently skip the new file — the
    // fingerprinted sink location must yield fresh results instead
    write(Seq((1L, ns, 1L, "purchase", 10.0, "{}"),
      (3L, ns + day, 3L, "purchase", 5.0, "{}")))
    val r3 = q(spark, dir).collect()
    assert(r3.length == 2, s"regenerated fixture must produce a fresh sink: ${r3.toSeq}")
  }

  test("AvailableNow backfill writes the same partitioned output as the batch A12 sink") {
    // the reference's job is incremental export; this pins that the
    // streaming sink in batch-backfill mode (Trigger.AvailableNow over
    // the orders fixture, same A4-A7 transform, same partitionBy) lands
    // CONTENT-identical rows under the IDENTICAL hive partition layout
    // as the batch exporter — so a deployment can switch the A12 sink
    // between batch and streaming ingestion without a migration
    import org.apache.spark.sql.streaming.Trigger
    import graft.etl.{Export, ExportConfig}
    val batchOut = tmpDir("bf_batch")
    val streamBase = tmpDir("bf_stream")
    val (streamOut, cp) = (s"$streamBase/out", s"$streamBase/cp")
    val cfg = ExportConfig(
      inputDir = sfDir, outputDir = batchOut,
      startDate = Some("1996-01-01"), endDate = Some("1997-12-31"),
      dateColumns = Map("orders" -> Some("o_orderdate")))
    assert(Export.run(spark, cfg).forall(_.isRight))
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "orders.parquet").parquet(sfDir)
    val q = Export.transform(stream, Some("o_orderdate"),
        Some("1996-01-01"), Some("1997-12-31"))
      .writeStream.format("parquet")
      .partitionBy("part_year")
      .option("path", streamOut).option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // identical hive layout...
    def partDirs(root: String) =
      new java.io.File(root).listFiles().filter(_.isDirectory)
        .map(_.getName).filterNot(_ == "_spark_metadata").toSet
    assert(partDirs(s"$batchOut/orders") == partDirs(streamOut),
      s"${partDirs(s"$batchOut/orders")} vs ${partDirs(streamOut)}")
    // ...and identical content, row for row, partition value included
    val a = spark.read.parquet(s"$batchOut/orders")
      .orderBy("o_orderkey").collect().toSeq
    val b = spark.read.parquet(streamOut)
      .selectExpr(a.head.schema.fieldNames.map(n => s"`$n`"): _*)
      .orderBy("o_orderkey").collect().toSeq
    assert(a == b, s"backfill diverged: batch=${a.take(1)} stream=${b.take(1)}")
  }
}
