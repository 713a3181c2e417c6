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

  // ---- nested columns (r13) ----

  test("nested array column reads identically to the native parquet read") {
    val via = new DocStoreTableSource(sfDir).read(spark, "embeddings")
    val native = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(via.schema == native.schema,
      s"schema drift: ${via.schema} vs ${native.schema}")
    assert(via.orderBy("vec_id").collect().toSeq ==
      native.orderBy("vec_id").collect().toSeq)
  }

  test("nested struct/map columns round-trip and prune to required subfields") {
    val dir = tmpDir("docstore_nested")
    import spark.implicits._
    val src = Seq((1L, 10, "x", 1.5, Seq("a", "b")), (2L, 20, "y", 2.5, Seq("c")))
      .toDF("id", "a", "b", "c", "tags")
      .select(col("id"),
        struct(col("a"), col("b"), struct(col("c")).as("inner")).as("s"),
        col("tags"),
        map(lit("k"), col("a")).as("m"))
    src.write.mode("overwrite").parquet(dir)
    val via = spark.read.format("docstore").option("path", dir).load()
    val native = spark.read.parquet(dir)
    assert(via.schema == native.schema)
    assert(via.orderBy("id").collect().toSeq ==
      native.orderBy("id").collect().toSeq)
    // nested-pruned projection: only s.a crosses the boundary
    val pruned = via.select(col("id"), col("s.a"))
    pruned.collect()
    val scan = docStoreScanOf(pruned)
    val sField = scan.readSchema()("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sField.fieldNames.toSeq == Seq("a"),
      s"struct not pruned: ${scan.readSchema().catalogString}")
    assert(pruned.orderBy("id").collect().toSeq ==
      native.select(col("id"), col("s.a")).orderBy("id").collect().toSeq)
  }

  test("filters on nested paths stay residual and still apply exactly") {
    val via = new DocStoreTableSource(sfDir).read(spark, "embeddings")
      .filter(element_at(col("embedding"), 1) > 0 && col("vec_id") < 100)
    val scan = docStoreScanOf(via)
    assert(!scan.pushed.exists(_.references.exists(_.contains("embedding"))),
      s"nested predicate pushed approximately: ${scan.pushed.mkString(", ")}")
    val native = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(element_at(col("embedding"), 1) > 0 && col("vec_id") < 100)
    assert(via.orderBy("vec_id").collect().toSeq ==
      native.orderBy("vec_id").collect().toSeq)
  }

  // ---- MILLIS-unit pushdown exactness (r13, ADVICE fix) ----

  test("sub-millisecond literals against a MILLIS store push exactly per-op") {
    val dir = tmpDir("docstore_millis")
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try Seq(0L, 1L, 2L, 3L).map(ms => (ms, new java.sql.Timestamp(ms)))
      .toDF("id", "ts").write.mode("overwrite").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val via = spark.read.format("docstore").option("path", dir).load()
    // the semantic truth comes from the native read with parquet
    // record-level pushdown DISABLED: this Spark version's own parquet
    // filter floor-rounds a sub-ms literal to millis for every op, so
    // its pushed lt(1ms) drops the ts=1ms row that `ts < 1.5ms` keeps —
    // exactly the silent-wrong-answer the connector's op-aware ceiling/
    // floor rounding avoids; with pushdown on, native Spark returns the
    // WRONG set here and is no oracle
    val native = spark.read.parquet(dir)
    def both(c: org.apache.spark.sql.Column, expectIds: Set[Long]): Unit = {
      val v = via.filter(c).select("id").as[Long].collect().toSet
      val prev2 = spark.conf.get("spark.sql.parquet.filterPushdown")
      spark.conf.set("spark.sql.parquet.filterPushdown", "false")
      val n = try native.filter(c).select("id").as[Long].collect().toSet
        finally spark.conf.set("spark.sql.parquet.filterPushdown", prev2)
      assert(v == n, s"connector=$v native(no-pushdown)=$n for $c")
      assert(v == expectIds, s"got $v expected $expectIds for $c")
      // the predicate really is pushed (no residual Filter) — exactness
      // comes from op-aware ms rounding, not a Spark-side re-check
      assert(physical(via.filter(c)).collect { case f: FilterExec => f }.isEmpty,
        s"residual filter for $c")
    }
    def ts(s: String) = to_timestamp(lit(s))
    both(col("ts") >= ts("1970-01-01 00:00:00.0005"), Set(1L, 2L, 3L))
    both(col("ts") > ts("1970-01-01 00:00:00.0005"), Set(1L, 2L, 3L))
    both(col("ts") < ts("1970-01-01 00:00:00.0015"), Set(0L, 1L))
    both(col("ts") <= ts("1970-01-01 00:00:00.0005"), Set(0L))
    both(col("ts") === ts("1970-01-01 00:00:00.0005"), Set.empty)
    both(col("ts") === ts("1970-01-01 00:00:00.001"), Set(1L))
    both(col("ts") >= ts("1970-01-01 00:00:00.001"), Set(1L, 2L, 3L))
  }

  test("boolean ordered comparisons stay residual (FilterApi has no bool gt)") {
    val dir = tmpDir("docstore_bool")
    import spark.implicits._
    Seq((1L, true), (2L, false), (3L, true)).toDF("id", "flag")
      .write.mode("overwrite").parquet(dir)
    val via = spark.read.format("docstore").option("path", dir).load()
      .filter(col("flag") > false)
    val scan = docStoreScanOf(via)
    assert(!scan.pushed.exists {
      case GreaterThanOrEqual("flag", _) => true
      case org.apache.spark.sql.sources.GreaterThan("flag", _) => true
      case _ => false
    }, s"bool ordered cmp pushed: ${scan.pushed.mkString(", ")}")
    assert(via.select("id").as[Long].collect().toSet == Set(1L, 3L))
    // equality on booleans still pushes
    val eq = spark.read.format("docstore").option("path", dir).load()
      .filter(col("flag") === true)
    assert(docStoreScanOf(eq).pushed.exists {
      case org.apache.spark.sql.sources.EqualTo("flag", true) => true
      case _ => false
    })
    assert(eq.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("schema drift across a multi-file store is rejected at inference") {
    val dir = tmpDir("docstore_drift")
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "s").write.mode("overwrite").parquet(s"$dir/f1")
    Seq((1L, 2.0)).toDF("k", "d").write.mode("overwrite").parquet(s"$dir/f2")
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    // flatten the two files into one store dir
    Seq("f1", "f2").foreach { sub =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$sub"))
        .filter(st => st.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(s"$dir/${sub}_${st.getPath.getName}"))
        }
    }
    val e = intercept[IllegalArgumentException] {
      spark.read.format("docstore").option("path", dir).load()
    }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
  }

  test("mixed partition layouts across a store are rejected at listing") {
    // partitionBy is a per-write sink option, so one unpartitioned
    // append into a Hive-partitioned store is physically possible —
    // and would silently drop the partition column from the inferred
    // schema (or from pruning) for ALL files depending on which entry
    // sorts first. The listing choke point must fail loudly instead.
    val dir = tmpDir("docstore_mixed_layout")
    import spark.implicits._
    Seq((1L, "x", 2020)).toDF("k", "s", "yr")
      .write.format("docstore").option("path", dir)
      .option("partitionBy", "yr").mode("overwrite").save()
    Seq((2L, "y", 2021)).toDF("k", "s", "yr")
      .write.format("docstore").option("path", dir).mode("append").save()
    val e = intercept[IllegalArgumentException] {
      spark.read.format("docstore").option("path", dir).load().count()
    }
    assert(e.getMessage.contains("mixed partition layouts"), e.getMessage)
  }

  // ---- write path (r13) ----

  test("clustered sink: one file per partition per commit; sortBy gives disjoint row-group stats") {
    val dir = tmpDir("docstore_sink_clustered")
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .select("o_orderkey", "o_orderdate", "o_totalprice", "o_year")
      .repartition(8) // without the required distribution this layout would write 8 files per partition
    src.write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year").option("sortBy", "o_orderdate")
      .option("rowGroupBytes", "4096")
      .mode("overwrite").save()
    val listing = graft.sources.DocStore.listFilesWithPartitions(dir)
    // RequiresDistributionAndOrdering: clustering by the partition
    // column routes every row of a partition value to ONE task — one
    // data file per partition per commit, not files-per-task
    val perPart = listing.groupBy(_._2).view.mapValues(_.size)
    assert(perPart.nonEmpty && perPart.values.forall(_ == 1),
      s"files per partition: ${perPart.toMap}")
    // the within-task sort by o_orderdate + bounded rowGroupBytes:
    // row groups inside each file carry DISJOINT ascending date
    // ranges, so a read-back range predicate prunes at row-group
    // granularity through the same FilterApi statistics path
    var multiGroupFiles = 0
    listing.foreach { case (f, _) =>
      val blocks = graft.sources.DocStore.footerBlocks(f)
      if (blocks.size > 1) multiGroupFiles += 1
      import scala.jdk.CollectionConverters._
      val ranges: Seq[(Long, Long)] = blocks.map { b =>
        val s = b.getColumns.asScala
          .find(_.getPath.toDotString == "o_orderdate").get.getStatistics
        (s.genericGetMin.asInstanceOf[Number].longValue,
          s.genericGetMax.asInstanceOf[Number].longValue)
      }
      ranges.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"overlapping row-group ranges in $f: $ranges")
        case _ =>
      }
    }
    assert(multiGroupFiles > 0,
      "rowGroupBytes produced no multi-row-group file — the disjointness assertion is vacuous")
    // layout is pure layout: read-back equals the source rows exactly
    val back = spark.read.format("docstore").option("path", dir).load()
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        col("o_year").cast("int").as("o_year"))
      .orderBy("o_orderkey").collect().toSeq
    val want = src.orderBy("o_orderkey").collect().toSeq
    assert(back == want)
  }

  test("limit pushdown plans only the row groups that can contribute; filters refuse it") {
    val dir = tmpDir("docstore_limit")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.format("docstore").option("path", dir)
      .option("rowGroupBytes", "4096").mode("overwrite").save()
    val total = graft.sources.DocStore
      .listFiles(dir).map(f => graft.sources.DocStore.footerBlocks(f).size).sum
    assert(total > 3, s"fixture produced only $total row groups — vacuous")
    // bare LIMIT: covered row count bounds the planned partitions
    val limited = spark.read.format("docstore").option("path", dir).load().limit(7)
    val scan = docStoreScanOf(limited)
    assert(scan.limitHint.contains(7), "limit not pushed")
    val planned = scan.planInputPartitions().length
    assert(planned < total && planned >= 1, s"$planned of $total planned")
    assert(limited.count() == 7, "partial limit changed the result")
    // a pushed DATA filter invalidates footer counts: limit refused,
    // every surviving row group planned, result exact
    val filtered = spark.read.format("docstore").option("path", dir).load()
      .filter(col("o_orderkey") > 100L).limit(7)
    assert(filtered.count() == 7)
    val fscan = docStoreScanOf(filtered)
    assert(fscan.limitHint.isEmpty || fscan.planInputPartitions().length == total,
      "limit truncated a data-filtered scan — rows could go missing")
  }

  test("top-N pushdown prunes row groups on a sort-clustered store; filters and float keys refuse") {
    val dir = tmpDir("docstore_topn")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.format("docstore").option("path", dir)
      .option("sortBy", "o_orderkey")
      .option("rowGroupBytes", "4096").mode("overwrite").save()
    val total = graft.sources.DocStore
      .listFiles(dir).map(f => graft.sources.DocStore.footerBlocks(f).size).sum
    assert(total > 3, s"fixture produced only $total row groups — vacuous")
    def load() = spark.read.format("docstore").option("path", dir).load()
    val want = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").orderBy(col("o_orderkey").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    // DESC NULLS LAST (Spark default): footer extrema bound the top-k
    val q = load().orderBy(col("o_orderkey").desc).limit(5)
    val scan = docStoreScanOf(q)
    assert(scan.topNHint.contains((Seq("o_orderkey"), true, 5)), "top-N not pushed")
    val planned = scan.planInputPartitions().length
    assert(planned < total && planned >= 1, s"$planned of $total planned")
    assert(q.collect().map(_.getLong(0)).toSeq == want,
      "top-N pruning changed the result")
    // ASC NULLS FIRST prunes from the other end
    val asc = load().orderBy(col("o_orderkey")).limit(5)
    val ascScan = docStoreScanOf(asc)
    assert(ascScan.topNHint.contains((Seq("o_orderkey"), false, 5)))
    assert(ascScan.planInputPartitions().length < total)
    val wantAsc = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").orderBy("o_orderkey").limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(asc.collect().map(_.getLong(0)).toSeq == wantAsc,
      "ASC top-N pruning changed the result")
    // a float/double sort key refuses (NaN makes writer stats unreliable)
    val dbl = load().orderBy(col("o_totalprice").desc).limit(5)
    assert(docStoreScanOf(dbl).topNHint.isEmpty, "double key must refuse")
    assert(dbl.collect().length == 5)
    // a pushed DATA filter re-ranks survivors: top-N refused, result exact
    val filt = load().filter(col("o_totalprice") > 1000.0)
      .orderBy(col("o_orderkey").desc).limit(5)
    assert(docStoreScanOf(filt).topNHint.isEmpty, "data filter must refuse")
    val wantFilt = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 1000.0)
      .orderBy(col("o_orderkey").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(filt.collect().map(_.getLong(0)).toSeq == wantFilt)
  }

  test("multi-column top-N pushes lexicographic bounds; mixed directions and nullable keys refuse") {
    import spark.implicits._
    val dir = tmpDir("docstore_topn_multi")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .write.format("docstore").option("path", dir)
      .option("sortBy", "o_custkey,o_orderkey")
      .option("rowGroupBytes", "4096").mode("overwrite").save()
    val total = graft.sources.DocStore
      .listFiles(dir).map(f => graft.sources.DocStore.footerBlocks(f).size).sum
    assert(total > 3, s"fixture produced only $total row groups — vacuous")
    def load() = spark.read.format("docstore").option("path", dir).load()
    def want(q: org.apache.spark.sql.DataFrame) =
      q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderkey")
    // DESC on the sink's sortBy prefix: per-column extrema bound every
    // row's tuple lexicographically
    val q = load().orderBy(col("o_custkey").desc, col("o_orderkey").desc)
      .limit(5).select("o_custkey", "o_orderkey")
    val scan = docStoreScanOf(q)
    assert(scan.topNHint.contains((Seq("o_custkey", "o_orderkey"), true, 5)),
      "multi-column top-N not pushed")
    val planned = scan.planInputPartitions().length
    assert(planned < total && planned >= 1, s"$planned of $total planned")
    assert(want(q) == want(
      ref.orderBy(col("o_custkey").desc, col("o_orderkey").desc).limit(5)),
      "multi-column top-N pruning changed the result")
    // ASC prunes from the other end
    val asc = load().orderBy(col("o_custkey"), col("o_orderkey"))
      .limit(5).select("o_custkey", "o_orderkey")
    assert(docStoreScanOf(asc).topNHint
      .contains((Seq("o_custkey", "o_orderkey"), false, 5)))
    assert(docStoreScanOf(asc).planInputPartitions().length < total)
    assert(want(asc) == want(
      ref.orderBy(col("o_custkey"), col("o_orderkey")).limit(5)))
    // MIXED directions break the tuple bound: refused, result exact
    val mixed = load().orderBy(col("o_custkey").desc, col("o_orderkey").asc)
      .limit(5).select("o_custkey", "o_orderkey")
    assert(docStoreScanOf(mixed).topNHint.isEmpty, "mixed directions must refuse")
    assert(want(mixed) == want(
      ref.orderBy(col("o_custkey").desc, col("o_orderkey").asc).limit(5)))
    // a NULLABLE key refuses the multi-key bound (footers can't order
    // null tuples) but the same column alone still pushes
    val nd = tmpDir("docstore_topn_nulls")
    Seq((Some(5L), 1L), (None, 2L), (Some(3L), 3L), (Some(7L), 4L))
      .toDF("a", "b").coalesce(1)
      .write.format("docstore").option("path", nd).mode("overwrite").save()
    def loadNd() = spark.read.format("docstore").option("path", nd).load()
    val multiNull = loadNd().orderBy(col("a").desc, col("b").desc).limit(2)
    assert(docStoreScanOf(multiNull).topNHint.isEmpty, "nullable multi-key must refuse")
    assert(multiNull.select("b").as[Long].collect().toSeq == Seq(4L, 1L))
    val singleNull = loadNd().orderBy(col("a").desc).limit(2)
    assert(docStoreScanOf(singleNull).topNHint.contains((Seq("a"), true, 2)))
  }

  test("metadata columns _file/_pos: exact lineage, no cost unselected, filter-safe positions") {
    val dir = tmpDir("docstore_meta")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .select("o_orderkey", "o_totalprice", "o_year")
      .write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year")
      .option("rowGroupBytes", "8192").mode("overwrite").save()
    def load() = spark.read.format("docstore").option("path", dir).load()
    // unselected → the scan never reads or emits them (no-cost pin)
    assert(!docStoreScanOf(load().select("o_orderkey"))
      .readSchema().fieldNames.exists(Set("_file", "_pos")),
      "metadata columns leaked into an unadorned projection")
    // _file names real store files; _pos is a dense 0-based per-file index
    val lineage = load().select(col("_file"), col("_pos"), col("o_orderkey"))
    val perFile = lineage.groupBy("_file")
      .agg(count(lit(1)).as("n"), min("_pos").as("lo"), max("_pos").as("hi"),
        countDistinct("_pos").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(perFile.nonEmpty)
    val storeFiles = graft.sources.DocStore.listFiles(dir).toSet
    perFile.foreach { case (f, n, lo, hi, d) =>
      assert(storeFiles.contains(f), s"_file '$f' is not a store file")
      assert(lo == 0L && hi == n - 1 && d == n,
        s"_pos not a dense 0-based index in $f: n=$n lo=$lo hi=$hi distinct=$d")
    }
    // positions survive a pushed data filter: the reader counts every
    // row it materializes even when the predicate drops it
    val key = load().select(max("o_orderkey")).head.getLong(0) / 2
    val withFilter = load().filter(col("o_orderkey") > key)
      .select(col("o_orderkey"), col("_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val noFilter = load().select(col("o_orderkey"), col("_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(withFilter.nonEmpty && withFilter.size < noFilter.size)
    withFilter.foreach { case (k, p) =>
      assert(noFilter(k) == p,
        s"_pos drifted under a pushed filter for key $k: $p vs ${noFilter(k)}")
    }
    // the filter itself stayed exact through the self-filtering path
    assert(withFilter.keySet == noFilter.keySet.filter(_ > key))
  }

  test("grouped aggregate pushdown: GROUP BY partition column answers from footers") {
    val dir = tmpDir("docstore_group_pushdown")
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .select("o_orderkey", "o_custkey", "o_year")
    src.write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year").mode("overwrite").save()
    val grouped = spark.read.format("docstore").option("path", dir).load()
      .groupBy("o_year")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("lo"),
        max("o_orderkey").as("hi"))
    val scan = physical(grouped).collectFirst { case b: BatchScanExec => b.scan }.get
    assert(scan.isInstanceOf[graft.sources.DocStoreAggScan],
      s"grouped aggregate did not push: ${scan.getClass}")
    assert(scan.description().contains("PushedGroupBy: [o_year]"),
      scan.description())
    // metadata-only: the scan's schema is group key + footer aggregates
    assert(scan.readSchema().fieldNames.toSeq ==
      Seq("o_year", "count(*)", "min(o_orderkey)", "max(o_orderkey)"),
      scan.readSchema().fieldNames.toSeq.toString)
    // values match the data-page recomputation exactly
    val got = grouped.select(col("o_year").cast("int").as("y"),
        col("n"), col("lo"), col("hi"))
      .orderBy("y").collect().toSeq
    val want = src.groupBy(col("o_year").as("y"))
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("lo"),
        max("o_orderkey").as("hi"))
      .orderBy("y").collect().toSeq
    assert(got == want)
    // a grouped aggregate over an EMPTY store yields no rows (the
    // ungrouped count-over-empty synthetic-partition path must not
    // leak); the schema comes from the caller — an empty schemaless
    // store has none to infer
    val empty = tmpDir("docstore_group_empty")
    src.limit(0).write.format("docstore").option("path", empty)
      .option("partitionBy", "o_year").mode("overwrite").save()
    assert(spark.read.format("docstore")
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_year STRING")
      .option("path", empty).load()
      .groupBy("o_year").agg(count(lit(1)).as("n")).count() == 0)
  }

  test("staged-commit sink: partitioned zstd write, list, read back") {
    val dir = tmpDir("docstore_sink")
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .select("o_orderkey", "o_totalprice", "o_year")
    src.write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year").mode("overwrite").save()
    // Hive layout on disk, no staging residue
    val children = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(children.exists(_.startsWith("o_year=")), s"no partition dirs: $children")
    assert(!children.exists(_.startsWith("_staging")), s"staging residue: $children")
    // read back through the connector: partition column recovered
    val back = spark.read.format("docstore").option("path", dir).load()
    assert(back.schema.fieldNames.contains("o_year"))
    assert(back.count() == src.count())
    val a = back.select(col("o_orderkey"), col("o_totalprice"),
        col("o_year").cast("int").as("o_year"))
      .orderBy("o_orderkey").collect().toSeq
    val b = src.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
    // partition-column equality prunes splits at PLANNING time
    val oneYear = back.filter(col("o_year") === "1996")
    val scan = docStoreScanOf(oneYear.select("o_orderkey", "o_year"))
    val planned = scan.planInputPartitions().length
    val all = docStoreScanOf(back.select("o_orderkey", "o_year"))
      .planInputPartitions().length
    assert(planned < all, s"partition pruning planned $planned of $all splits")
    assert(oneYear.count() ==
      src.filter(col("o_year") === 1996).count())
    // overwrite truncates at COMMIT: same store, half the rows
    src.filter(col("o_orderkey") % 2 === 0)
      .write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year").mode("overwrite").save()
    assert(spark.read.format("docstore").option("path", dir).load().count() ==
      src.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("append mode adds documents without touching existing ones") {
    val dir = tmpDir("docstore_append")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("docstore").option("path", dir).mode("overwrite").save()
    Seq((3L, "c")).toDF("k", "v")
      .write.format("docstore").option("path", dir).mode("append").save()
    val back = spark.read.format("docstore").option("path", dir).load()
    assert(back.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("concurrent writers stage independently and both commit") {
    val dir = tmpDir("docstore_concurrent")
    import spark.implicits._
    // seed the store so both concurrent writes are appends
    Seq((0L, "seed")).toDF("k", "v")
      .write.format("docstore").option("path", dir).mode("overwrite").save()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = Seq(1L, 2L).map { base =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          (1 to 50).map(i => (base * 1000 + i, s"w$base"))
            .toDF("k", "v")
            .write.format("docstore").option("path", dir).mode("append").save()
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val back = spark.read.format("docstore").option("path", dir).load()
    assert(back.count() == 101)
    assert(back.groupBy("v").count().orderBy("v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("seed", 1L), ("w1", 50L), ("w2", 50L)))
    // no staging residue after both commits
    val children = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!children.exists(_.startsWith("_staging")), s"residue: $children")
  }

  test("footer statistics drive broadcast decisions through the connector") {
    // exact post-pruning row counts
    val cust = spark.read.format("docstore")
      .option("path", s"$sfDir/customer.parquet").load()
    val pruned = cust.select("c_custkey", "c_mktsegment")
    pruned.collect()
    val scan = docStoreScanOf(pruned)
    val stats = scan.estimateStatistics()
    assert(stats.numRows().getAsLong ==
      spark.read.parquet(s"$sfDir/customer.parquet").count())
    assert(stats.sizeInBytes().getAsLong > 0)
    // narrower projections report proportionally fewer bytes
    val one = cust.select("c_custkey")
    one.collect()
    assert(docStoreScanOf(one).estimateStatistics().sizeInBytes().getAsLong <
      stats.sizeInBytes().getAsLong)
    // the declared join picks BroadcastHashJoin with NO hint — purely
    // from the connector-reported statistics
    val df = SparkEntry.queries("etl_connector_join")(spark, sfDir)
    df.collect()
    val bhj = physical(df).collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "connector stats did not drive a broadcast join:\n" +
      df.queryExecution.executedPlan)
  }

  test("runtime filters prune partitions and rows at execution time") {
    val dir = tmpDir("docstore_runtime")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .select("o_orderkey", "o_custkey", "o_year")
      .write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year").mode("overwrite").save()
    val fact = spark.read.format("docstore").option("path", dir).load()
    val q = fact.select("o_orderkey", "o_year")
    q.collect()
    val scan = docStoreScanOf(q)
    // the contract Spark's DPP drives: filterAttributes advertises the
    // partition column; filter() with a join-key set re-plans splits
    assert(scan.filterAttributes().map(_.describe()).contains("o_year"))
    val all = scan.planInputPartitions().length
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("o_year", "1996")))
    val prunedN = scan.planInputPartitions().length
    assert(prunedN < all, s"runtime filter kept $prunedN of $all splits")
    // data-column runtime IN-sets apply exactly; oversized ones are
    // refused (they would inflate every row-group read)
    val dataScan = docStoreScanOf(fact.select("o_orderkey", "o_year"))
    dataScan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("o_orderkey", Array(1L, 2L, 3L))))
    assert(dataScan.planInputPartitions().nonEmpty)
    val big = (1L to 5000L).map(_.asInstanceOf[Any]).toArray
    val wide = docStoreScanOf(fact.select("o_orderkey", "o_year"))
    wide.filter(Array[org.apache.spark.sql.sources.Filter](In("o_orderkey", big)))
    assert(wide.planInputPartitions().length ==
      docStoreScanOf(fact.select("o_orderkey", "o_year")).planInputPartitions().length)
    // end-to-end: a join over the partition column stays correct under
    // AQE whether or not the optimizer chooses to inject DPP here
    import spark.implicits._
    val dim = Seq(("1996", "pick")).toDF("o_year", "tag")
    val joined = fact.join(dim, Seq("o_year")).agg(count(lit(1)).as("n"))
    assert(joined.collect().head.getLong(0) ==
      spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(year(col("o_orderdate")) === 1996).count())
  }

  test("micro-batch stream: append after a drained run replays ONLY the new files") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_stream")
    val base = tmpDir("docstore_stream_sink")
    val (out, cp) = (s"$base/out", s"$base/cp")
    def drain(): Unit =
      spark.readStream.format("docstore").option("path", store).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("docstore").option("path", store).mode("append").save()
    drain()
    assert(spark.read.parquet(out).count() == 2)
    // second generation lands; restart from the checkpoint picks it up
    // WITHOUT reprocessing generation one (offsets are file sets)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("docstore").option("path", store).mode("append").save()
    drain()
    val rows = spark.read.parquet(out).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"stream replayed or dropped rows: $rows")
    // a third drain with nothing new writes nothing
    drain()
    assert(spark.read.parquet(out).count() == 3)
    // offsets round-trip through their JSON form
    val off = graft.sources.DocStoreOffset(Seq("/x/part-1.parquet", "/y/k=1/p.parquet"))
    assert(graft.sources.DocStore.parseOffsetJson(off.json()) ==
      off.files.sorted)
  }

  test("admission control: maxFilesPerTrigger bounds each micro-batch; kill-and-restart keeps the frontier") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_admission")
    val base = tmpDir("docstore_admission_sink")
    val (out, cp) = (s"$base/out", s"$base/cp")
    // three files (single-task commits) of 2, 2 and 3 rows — a 7-row backlog
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    Seq((5L, "e"), (6L, "f"), (7L, "g")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    assert(graft.sources.DocStore.listFiles(store).size == 3)
    def reader = spark.readStream.format("docstore").option("path", store)
      .option("maxFilesPerTrigger", "1").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
    // kill mid-backlog: admit one file per batch on a clock trigger,
    // stop as soon as the first batch commits
    // a 10 s interval: batch 1 fires immediately, batch 2 waits for the
    // next boundary — the stop() below lands between them
    val q = reader.trigger(Trigger.ProcessingTime(10000)).start()
    val deadline = System.currentTimeMillis + 120000
    while (!q.recentProgress.exists(_.numInputRows > 0) &&
      System.currentTimeMillis < deadline) Thread.sleep(50)
    q.stop(); q.awaitTermination()
    assert(q.recentProgress.exists(_.numInputRows > 0), "no batch committed before the kill")
    // file sizes {2,2,3} make every partial row count identify its
    // file count uniquely: 2→1, 4→2, 5→2, 7→3
    val rowsAfterKill = spark.read.parquet(out).count()
    val filesDone = Map(2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2, 7L -> 3)(rowsAfterKill)
    // restart from the checkpoint: the file-set offset resumes after
    // exactly the committed files — AvailableNow drains the REMAINDER
    // in one-file batches, never one giant catch-up batch
    val q2 = reader.trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val batches2 = q2.recentProgress.filter(_.numInputRows > 0)
    assert(batches2.forall(_.numInputRows <= 3),
      s"a catch-up batch exceeded one file: ${batches2.map(_.numInputRows).toSeq}")
    assert(batches2.length == 3 - filesDone,
      s"remainder of ${3 - filesDone} file(s) drained in ${batches2.length} " +
        s"batch(es) — admission control not honored across the restart")
    // exactly-once across the kill: all 7 rows, no duplicates
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(rows.length == 7 && rows.map(_._1).distinct.length == 7,
      s"rows after restart: ${rows.sorted}")
  }

  test("snapshot stream across a mid-stream compaction: rewrite commits skipped, zero duplicates") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_snapstream")
    val base = tmpDir("docstore_snapstream_sink")
    val (out, cp) = (s"$base/out", s"$base/cp")
    def drain(): Unit =
      spark.readStream.format("docstore").option("path", store).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // two appended generations on a snapshot store
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save() // v1
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save() // v2
    drain()
    assert(spark.read.parquet(out).count() == 3)
    // a compaction rewrites every emitted row under NEW file names —
    // the exact commit that used to re-ingest everything
    val st = graft.sources.DocStoreMaintenance.compact(
      spark, store, smallerThan = Long.MaxValue) // v3 (rewrite)
    assert(st.filesIn == 2 && st.filesOut >= 1)
    // …then a genuine append lands (v4)
    Seq((4L, "d")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    drain()
    // total emitted rows == appended rows, exactly: the rewrite commit
    // contributed NOTHING, the append streamed
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq.sorted
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      s"stream duplicated or lost rows across the compaction: $rows")
    // nothing-new drain stays empty
    drain()
    assert(spark.read.parquet(out).count() == 4)
  }

  test("snapshot stream kill-and-recover across a compaction: recovery reads the pinned snapshot") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_snaprecover")
    val base = tmpDir("docstore_snaprecover_sink")
    val (out, cp) = (s"$base/out", s"$base/cp")
    // a 3-file backlog on a snapshot store: 2+2+3 rows (v1..v3)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    Seq((5L, "e"), (6L, "f"), (7L, "g")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    def reader = spark.readStream.format("docstore").option("path", store)
      .option("maxFilesPerTrigger", "1").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
    // kill mid-backlog after the first one-file batch commits
    val q = reader.trigger(Trigger.ProcessingTime(10000)).start()
    val deadline = System.currentTimeMillis + 120000
    while (!q.recentProgress.exists(_.numInputRows > 0) &&
      System.currentTimeMillis < deadline) Thread.sleep(50)
    q.stop(); q.awaitTermination()
    val rowsAfterKill = spark.read.parquet(out).count()
    assert(rowsAfterKill < 7, "the kill landed after the whole backlog drained")
    // between crash and restart, a compaction retires every input file
    // (the recovery-loss scenario: the files the offset names are no
    // longer in the live listing — but the pinned manifests still
    // reference them and they are still on disk)
    graft.sources.DocStoreMaintenance.compact(
      spark, store, smallerThan = Long.MaxValue)
    // restart: the replanned + remaining batches read from the
    // offset's snapshot — all 7 rows exactly once
    val q2 = reader.trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(rows.length == 7 && rows.map(_._1).distinct.length == 7,
      s"recovery across the compaction lost or duplicated rows: ${rows.sorted}")
    // retention that expires a snapshot the checkpoint still needs is a
    // CLEAR error on the next restart, not silent row loss
    graft.sources.DocStoreMaintenance.vacuum(store, keepVersions = 1, graceMs = 0L): Unit
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q3 = reader.trigger(Trigger.AvailableNow()).start()
      q3.awaitTermination()
    }
    assert(e.getMessage.contains("retention") || Option(e.getCause).exists(
      c => String.valueOf(c.getMessage).contains("retention")),
      s"expected a retention-lag error, got: ${e.getMessage}")
  }

  test("startingVersion tails append deltas from a historical snapshot; byte-cap admission bounds batches") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_startver")
    val base = tmpDir("docstore_startver_sink")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save() // v1
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save() // v2
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save() // v3
    // startingVersion=2: v1's content is NOT replayed — only the
    // deltas of v2 and v3 stream (Delta's startingVersion semantics)
    val q = spark.readStream.format("docstore").option("path", store)
      .option("startingVersion", "2").load()
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$base/out").select("k")
      .as[Long].collect().toSeq.sorted == Seq(2L, 3L))
    // a plain store refuses startingVersion with a clear error
    val plain = tmpDir("docstore_startver_plain")
    Seq((1L, "a")).toDF("k", "v")
      .write.format("docstore").option("path", plain).mode("append").save()
    val e = intercept[Exception] {
      spark.readStream.format("docstore").option("path", plain)
        .option("startingVersion", "1").load()
        .writeStream.format("noop").start().awaitTermination()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("snapshot store"))
    // maxBytesPerTrigger: a tiny byte cap admits one whole file per
    // batch across the same 3-commit backlog (files are ~KB each)
    val base2 = tmpDir("docstore_bytecap_sink")
    val q2 = spark.readStream.format("docstore").option("path", store)
      .option("maxBytesPerTrigger", "1").load()
      .writeStream.format("parquet")
      .option("path", s"$base2/out").option("checkpointLocation", s"$base2/cp")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val batches = q2.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3 && batches.forall(_.numInputRows == 1),
      s"byte cap should admit one file per batch, got " +
        batches.map(_.numInputRows).toSeq)
    assert(spark.read.parquet(s"$base2/out").count() == 3)
  }

  test("streaming change feed: inserts+deletes with metadata lineage; compaction invisible; plain refuses") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_cdfstream")
    val base = tmpDir("docstore_cdfstream_sink")
    def drain(): Unit =
      spark.readStream.format("docstore").option("path", store)
        .option("changeFeed", "true").load()
        .select(col("k"), col("v"), col("p"),
          col("_change_type"), col("_commit_version"))
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // v1+v2: two appends into partitions p0/p1
    Seq((1L, "a", "p0"), (2L, "b", "p1")).toDF("k", "v", "p")
      .write.format("docstore").option("path", store)
      .option("partitionBy", "p").option("snapshots", "true")
      .mode("append").save()
    Seq((3L, "c", "p0"), (4L, "d", "p1")).toDF("k", "v", "p")
      .write.format("docstore").option("path", store)
      .option("partitionBy", "p").mode("append").save()
    drain()
    val afterAppends = spark.read.parquet(s"$base/out")
    assert(afterAppends.count() == 4 &&
      afterAppends.filter(col("_change_type") =!= "insert").count() == 0)
    // v3: metadata-only partition DELETE of p0 — the stream emits the
    // retired rows as deletes; v4: compaction — emits NOTHING
    val table = graft.sources.DocStoreTable(store,
      spark.read.format("docstore").option("path", store).load().schema, Seq("p"))
    val del: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("p", "p0"))
    table.deleteWhere(del)
    val cst = graft.sources.DocStoreMaintenance.compact(
      spark, store, smallerThan = Long.MaxValue)
    assert(cst.version.contains(4L) && cst.filesIn == 2,
      s"compaction must really commit v4 over p1's two files: $cst")
    drain()
    val all = spark.read.parquet(s"$base/out")
    val deletes = all.filter(col("_change_type") === "delete")
    assert(all.count() == 6, s"expected 4 inserts + 2 deletes, got ${all.count()}")
    assert(deletes.select("k").as[Long].collect().toSeq.sorted == Seq(1L, 3L))
    assert(deletes.select("p").distinct().as[String].collect().toSeq == Seq("p0"))
    assert(deletes.select("_commit_version").distinct().as[Long]
      .collect().toSeq == Seq(3L))
    // nothing-new drain stays empty (the compaction never surfaces)
    drain()
    assert(spark.read.parquet(s"$base/out").count() == 6)
    // BATCH reads expose the same lineage via metadata columns: every
    // surviving row's file was committed by the v4 compaction, and a
    // batch row is by definition an insert
    val batch = spark.read.format("docstore").option("path", store).load()
      .select(col("k"), col("_change_type"), col("_commit_version"))
    assert(batch.select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))
    assert(batch.select("_commit_version").distinct()
      .as[Long].collect().toSeq == Seq(4L))
    // plain stores refuse changeFeed with a clear error
    val plain = tmpDir("docstore_cdfstream_plain")
    Seq((1L, "a")).toDF("k", "v")
      .write.format("docstore").option("path", plain).mode("append").save()
    val e = intercept[Exception] {
      spark.readStream.format("docstore").option("path", plain)
        .option("changeFeed", "true").load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("cdfplain_cp"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("snapshot store"))
  }

  test("changeFeed composes with startingVersion: changes-since-N streaming") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_cdf_since")
    val base = tmpDir("docstore_cdf_since_sink")
    Seq((1L, "a", "p0")).toDF("k", "v", "p")
      .write.format("docstore").option("path", store)
      .option("partitionBy", "p").option("snapshots", "true")
      .mode("append").save() // v1
    Seq((2L, "b", "p1")).toDF("k", "v", "p")
      .write.format("docstore").option("path", store)
      .option("partitionBy", "p").mode("append").save() // v2
    val table = graft.sources.DocStoreTable(store,
      spark.read.format("docstore").option("path", store).load().schema, Seq("p"))
    val del: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("p", "p0"))
    table.deleteWhere(del) // v3: deletes k=1
    // changes SINCE v2: v1's insert is history, v2's insert and v3's
    // delete stream — the incremental consumer that already processed
    // through v1 and resumes without replaying it
    spark.readStream.format("docstore").option("path", store)
      .option("changeFeed", "true").option("startingVersion", "2").load()
      .select(col("k"), col("_change_type"), col("_commit_version"))
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val rows = spark.read.parquet(s"$base/out")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(rows == Seq((1L, "delete", 3L), (2L, "insert", 2L)),
      s"changes-since-v2 mismatch: $rows")
  }

  test("schema evolution across stream restarts: the restart adopts the evolved schema, no rows lost") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_evolve_stream")
    val base = tmpDir("docstore_evolve_stream_sink")
    def drain(): Unit =
      spark.readStream.format("docstore").option("path", store).load()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    Seq((1L, "a")).toDF("k", "v")
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save() // v1: (k, v)
    drain()
    // the store evolves: a column is added by a mergeSchema append.
    // The restarted stream (new query run, same checkpoint) re-infers
    // the reconciled schema and resumes from the offset — only the NEW
    // file replays, carrying the evolved shape; the sink dir then
    // holds both generations' shapes (mergeSchema unions them)
    Seq((2L, "b", 1.5)).toDF("k", "v", "score")
      .write.format("docstore").option("path", store)
      .option("mergeSchema", "true").mode("append").save() // v2: (k, v, score)
    drain()
    val rows = spark.read.option("mergeSchema", "true").parquet(s"$base/out")
      .select("k", "v").as[(Long, String)].collect().toSeq.sorted
    assert(rows == Seq((1L, "a"), (2L, "b")),
      s"restart across the evolution lost or duplicated rows: $rows")
    // a FRESH stream replays everything under the evolved schema, the
    // pre-evolution file null-filled by the connector
    val base2 = tmpDir("docstore_evolve_stream_sink2")
    spark.readStream.format("docstore").option("path", store).load()
      .writeStream.format("parquet")
      .option("path", s"$base2/out").option("checkpointLocation", s"$base2/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val fresh = spark.read.parquet(s"$base2/out")
      .select("k", "v", "score").orderBy("k").collect()
    assert(fresh.length == 2 && fresh(0).isNullAt(2) && fresh(1).getDouble(2) == 1.5)
  }

  test("snapshot stream onRewrite=fail stops at a rewrite commit with a clear error") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_snapfail")
    val base = tmpDir("docstore_snapfail_sink")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store)
      .option("snapshots", "true").mode("append").save()
    def drain(cpSuffix: String): Unit =
      spark.readStream.format("docstore").option("path", store)
        .option("onRewrite", "fail").load()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/$cpSuffix")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    drain("cp")
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    graft.sources.DocStoreMaintenance.compact(
      spark, store, smallerThan = Long.MaxValue)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain("cp"))
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("REWRITE"), s"expected a rewrite-commit error, got: $msg")
  }

  test("plain-store stream fails loudly when committed files vanish (append-only contract)") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val store = tmpDir("docstore_plainvanish")
    val base = tmpDir("docstore_plainvanish_sink")
    def drain(): Unit =
      spark.readStream.format("docstore").option("path", store).load()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", store).mode("append").save()
    drain()
    assert(spark.read.parquet(s"$base/out").count() == 3)
    // a plain-store compaction DELETES the inputs and republishes their
    // rows under new names — silent re-ingestion before; loud now
    graft.sources.DocStoreMaintenance.compact(
      spark, store, smallerThan = Long.MaxValue)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("append-only"), s"expected the append-only error, got: $msg")
  }

  test("streaming sink: docstore-to-docstore pipeline with epoch-idempotent commits") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val a = tmpDir("docstore_pipe_src")
    val b = tmpDir("docstore_pipe_dst")
    val cp = tmpDir("docstore_pipe_cp")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", a).mode("append").save()
    Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", a).mode("append").save()
    def drain(): Unit =
      spark.readStream.format("docstore").option("path", a)
        .option("maxFilesPerTrigger", "1").load()
        .writeStream.format("docstore").option("path", b)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    drain()
    val rows = spark.read.format("docstore").option("path", b).load()
      .as[(Long, String)].collect().toSeq.sorted
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")),
      s"pipeline drifted: $rows")
    // one commit marker per epoch, invisible to listings
    val markers = new java.io.File(b).listFiles()
      .map(_.getName).filter(_.startsWith("_committed-"))
    assert(markers.length >= 2, s"epoch markers missing: ${markers.toSeq}")
    // incremental: a new source file flows through without replay
    Seq((6L, "f")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", a).mode("append").save()
    drain()
    assert(spark.read.format("docstore").option("path", b).load().count() == 6)
    // epoch RE-commit is a no-op once the marker exists: a retried
    // micro-batch (driver crash between publish and checkpoint) must
    // not double-publish its files
    val w = graft.sources.DocStoreStreamingWrite(b,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))), Nil, "retryq")
    val staging = new java.io.File(s"$b/_staging-retryq-epoch-99")
    def stageOne(): Unit = {
      staging.mkdirs()
      // same (k, v) structure as the pipeline's files — a committed
      // retry file must not trip the store's schema-drift check
      Seq((99L, "r")).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/tmp")
      val f = new java.io.File(s"$staging/tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        new java.io.File(staging, "retry.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    stageOne()
    val msg = Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      graft.sources.DocStoreCommitMessage(Seq("retry.parquet")))
    w.commit(99L, msg)
    val after1 = spark.read.format("docstore").option("path", b).load().count()
    stageOne() // the retry stages again…
    w.commit(99L, msg) // …but the marker blocks a second publish
    assert(!new java.io.File(s"$b/_staging-retryq-epoch-99").exists(),
      "retried epoch staging not reclaimed")
    assert(spark.read.format("docstore").option("path", b).load().count() == after1,
      "epoch re-commit double-published")
    // the REAL writers stage deterministic epoch-stamped names (no
    // UUID drift): a retried epoch can only rename onto itself
    val published = new java.io.File(b).listFiles().map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
    assert(published.exists(_.matches("part-\\d{5}-e\\d+\\.parquet")),
      s"streaming sink files not deterministically named: ${published.toSeq}")
    // crash AFTER a partial publish but BEFORE the marker: the files
    // are already in the store, no marker, and the retried epoch
    // re-stages the SAME deterministic name — commit must rename ONTO
    // the partially-published twin, not add a duplicate beside it
    val staging100 = new java.io.File(s"$b/_staging-retryq-epoch-100")
    def stage100(): Unit = {
      staging100.mkdirs()
      Seq((100L, "s")).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging100/tmp")
      val f = new java.io.File(s"$staging100/tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      // epoch-stamped deterministic name, like the real writers
      java.nio.file.Files.move(f.toPath,
        new java.io.File(staging100, "part-00000-e100.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val msg100 = Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      graft.sources.DocStoreCommitMessage(Seq("part-00000-e100.parquet")))
    val before = spark.read.format("docstore").option("path", b).load().count()
    stage100()
    w.commit(100L, msg100) // publish epoch 100 fully (1 extra row)
    val afterFull = spark.read.format("docstore").option("path", b).load().count()
    assert(afterFull == before + 1)
    // simulate the crash: marker gone, file still published
    assert(new java.io.File(b, "_committed-retryq-100").delete())
    stage100() // the re-executed epoch stages the same name again…
    w.commit(100L, msg100) // …and republishing replaces, never duplicates
    assert(spark.read.format("docstore").option("path", b).load().count() == afterFull,
      "partial-publish retry duplicated rows")
    assert(new java.io.File(b, "_committed-retryq-100").exists())
  }

  test("stateful streaming: watermarked windowed agg recovers state across a mid-backlog kill, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpDir("docstore_state_src")
    val dst = tmpDir("docstore_state_dst")
    val cp = tmpDir("docstore_state_cp")
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    def writeRows(rows: Seq[(java.sql.Timestamp, String)]): Unit =
      rows.toDF("ts", "k").coalesce(1)
        .write.format("docstore").option("path", src).mode("append").save()
    // a 3-file backlog spanning three event days
    writeRows(Seq((ts(1, 1), "a"), (ts(1, 2), "a"), (ts(1, 3), "b")))
    writeRows(Seq((ts(2, 1), "a"), (ts(2, 2), "b")))
    writeRows(Seq((ts(3, 1), "b")))
    // the watermark exceeds the corpus span, so NO file admission
    // order can late-drop a row; windows finalize only via the
    // sentinel below — emission is all-at-once, exactly once
    def reader = spark.readStream.format("docstore").option("path", src)
      .option("maxFilesPerTrigger", "1").load()
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 days")
      .groupBy(window(col("ts"), "1 day").as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("timestamp").as("day"), col("k"), col("n"))
      .writeStream.format("docstore").option("path", dst)
      .option("checkpointLocation", cp)
    // kill after the FIRST micro-batch commits: state is built and
    // checkpointed, nothing has been emitted yet
    val q = reader.trigger(Trigger.ProcessingTime(10000)).start()
    val deadline = System.currentTimeMillis + 120000
    while (!q.recentProgress.exists(_.numInputRows > 0) &&
      System.currentTimeMillis < deadline) Thread.sleep(50)
    q.stop(); q.awaitTermination()
    assert(q.recentProgress.exists(_.numInputRows > 0), "no batch before the kill")
    // restart from the checkpoint: remaining backlog folds into the
    // RECOVERED state (a lost store would undercount; a replayed
    // batch would overcount)
    val q2 = reader.trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // sentinel advances the watermark past every real window
    writeRows(Seq((java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), "zz")))
    val q3 = reader.trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val out = spark.read.format("docstore").option("path", dst).load()
      .select(date_format(col("day"), "yyyy-MM-dd").as("d"), col("k"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.length == out.distinct.length, s"duplicate emissions: ${out.toSeq.sorted}")
    assert(out.toSet == Set(
      ("2024-01-01", "a", 2L), ("2024-01-01", "b", 1L),
      ("2024-01-02", "a", 1L), ("2024-01-02", "b", 1L),
      ("2024-01-03", "b", 1L)),
      s"state drifted across the kill: ${out.toSeq.sorted}")
  }

  test("storage-partitioned join: co-partitioned stores join with zero shuffles") {
    val a = tmpDir("docstore_spj_a")
    val b = tmpDir("docstore_spj_b")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
    o.select("o_orderkey", "o_totalprice", "o_year")
      .write.format("docstore").option("path", a)
      .option("partitionBy", "o_year").mode("overwrite").save()
    o.select("o_orderkey", "o_custkey", "o_year")
      .write.format("docstore").option("path", b)
      .option("partitionBy", "o_year").mode("overwrite").save()
    val prev = spark.conf.get("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // sum() is not footer-answerable, so this aggregation stays a
      // real scan and keeps its KeyGroupedPartitioning — a count-only
      // aggregate would instead take the (better at scale) grouped
      // footer pushdown, whose pre-aggregated output schema no longer
      // carries the base relation's attributes and therefore sheds the
      // key-grouped property (Spark resolves a scan's reported
      // partitioning against the ORIGINAL relation output)
      val fa = spark.read.format("docstore").option("path", a).load()
        .groupBy("o_year")
        .agg(count(lit(1)).as("n_a"),
          sum("o_totalprice").as("rev"))
      val fb = spark.read.format("docstore").option("path", b).load()
        .groupBy("o_year")
        .agg(countDistinct("o_custkey").as("n_custs"))
      val joined = fa.join(fb.hint("merge"), Seq("o_year"))
      val rows = joined.select("o_year", "n_a", "n_custs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // the whole plan — two scans, two aggregations, one join — runs
      // on the directory partitioning: ZERO exchanges anywhere
      val shuffles = physical(joined).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"co-partitioned join still shuffled:\n${joined.queryExecution.executedPlan}")
      val expected = spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("o_year", year(col("o_orderdate")).cast("int"))
        .groupBy("o_year")
        .agg(count(lit(1)).as("n_a"), countDistinct("o_custkey").as("n_custs"))
        .collect().map(r => (r.getInt(0).toString, r.getLong(1), r.getLong(2))).toSet
      assert(rows == expected, s"SPJ result drifted: $rows vs $expected")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prev)
  }

  test("mixed-writer stores, path-char partition values, and map writes round-trip") {
    import spark.implicits._
    // root-message-name differences across writers are NOT schema
    // drift: Spark's sink names the root 'spark_schema', ours
    // 'docstore_schema' — drift is structural
    val dir = tmpDir("docstore_mixed")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    Seq((2L, "b")).toDF("k", "v")
      .write.format("docstore").option("path", dir).mode("append").save()
    val back = spark.read.format("docstore").option("path", dir).load()
    assert(back.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // a partition value containing '/' and '=' survives the directory
    // round trip (escaped on write, unescaped at listing) instead of
    // silently splitting into nested directories
    val pdir = tmpDir("docstore_escape")
    Seq(("a/b=c", 1L), ("plain", 2L)).toDF("k", "n")
      .write.format("docstore").option("path", pdir)
      .option("partitionBy", "k").mode("overwrite").save()
    val pback = spark.read.format("docstore").option("path", pdir).load()
    assert(pback.select("k", "n").as[(String, Long)].collect().toSet ==
      Set(("a/b=c", 1L), ("plain", 2L)))
    assert(pback.filter(col("k") === "a/b=c").count() == 1)
    // a map column writes through the sink and reads back equal
    val mdir = tmpDir("docstore_map")
    val src = Seq((1L, Map("x" -> 1, "y" -> 2)), (2L, Map("z" -> 3))).toDF("k", "m")
    src.write.format("docstore").option("path", mdir).mode("overwrite").save()
    assert(spark.read.format("docstore").option("path", mdir).load()
      .orderBy("k").collect().toSeq == src.orderBy("k").collect().toSeq)
  }

  test("bloomFor writes per-row-group bloom filters; point lookups skip groups zone maps can't") {
    import spark.implicits._
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    // UNSORTED high-cardinality key with tight row groups: every
    // group's min/max straddles any probe, so zone maps prune nothing
    // — the exact case bloom filters exist for
    val store = tmpDir("docstore_bloom")
    val keys = (0L until 4000L).map(k => (k * 2654435761L) % 100000L)
    keys.map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1)
      .write.format("docstore").option("path", store)
      .option("rowGroupBytes", "4096").option("bloomFor", "k")
      .mode("overwrite").save()
    val f = DocStore.listFiles(store).head
    val blocks = DocStore.footerBlocks(f)
    assert(blocks.size > 1, "tight rowGroupBytes must yield several groups")
    import scala.jdk.CollectionConverters._
    assert(blocks.forall(_.getColumns.asScala
      .find(_.getPath.toDotString == "k").get.getBloomFilterOffset >= 0),
      "every row group carries a bloom filter for k")
    // control store without the option: no bloom
    val plain = tmpDir("docstore_nobloom")
    keys.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format("docstore").option("path", plain)
      .option("rowGroupBytes", "4096").mode("overwrite").save()
    assert(DocStore.footerBlocks(DocStore.listFiles(plain).head)
      .forall(_.getColumns.asScala
        .find(_.getPath.toDotString == "k").get.getBloomFilterOffset < 0))
    // A/B proof the READ path's row-group skip comes from the bloom
    // bitset alone: stats/dictionary/record-level filtering all off,
    // probe a value inside every group's min/max but absent from the
    // data — bloom on: zero rows materialize; bloom off: every row does
    val absent = 1L // odd, never hits (k*2654435761 % 100000 is even)
    assert(keys.forall(_ != absent))
    def rowsWithBloom(enabled: Boolean): Long = {
      val conf = new org.apache.hadoop.conf.Configuration()
      conf.setBoolean("parquet.filter.stats.enabled", false)
      conf.setBoolean("parquet.filter.dictionary.enabled", false)
      conf.setBoolean("parquet.filter.record-level.enabled", false)
      conf.setBoolean("parquet.filter.columnindex.enabled", false)
      conf.setBoolean("parquet.filter.bloom.enabled", enabled)
      val r = ParquetReader.builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(f)).withConf(conf)
        .withFilter(FilterCompat.get(
          FilterApi.eq(FilterApi.longColumn("k"),
            java.lang.Long.valueOf(absent))))
        .build()
      var n = 0L
      while (r.read() != null) n += 1
      r.close(); n
    }
    assert(rowsWithBloom(enabled = true) == 0L, "bloom skips every group")
    assert(rowsWithBloom(enabled = false) == 4000L, "without bloom nothing prunes")
    // and the connector read stays exact either way
    val hit = keys.head
    assert(spark.read.format("docstore").option("path", store).load()
      .filter(col("k") === hit).count() == keys.count(_ == hit))
  }

  // ---- aggregate pushdown (r13) ----

  test("ungrouped count/min/max answer from footer statistics only") {
    val via = spark.read.format("docstore")
      .option("path", s"$sfDir/orders.parquet").load()
    val agg = via.agg(count(lit(1)).as("n"),
      min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
    val scan = physical(agg).collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.isInstanceOf[graft.sources.DocStoreAggScan],
      s"aggregate not pushed: ${scan.description()}")
    // the scan's output IS the aggregate — zero data columns cross
    assert(scan.readSchema().fieldNames.toSet ==
      Set("count(*)", "min(o_orderkey)", "max(o_orderkey)"))
    val native = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"))
      .collect().head
    assert(agg.collect().head == native)
  }

  test("min/max on timestamps normalize units; floats/strings refuse pushdown") {
    val via = spark.read.format("docstore")
      .option("path", s"$sfDir/orders.parquet").load()
    val tsAgg = via.agg(min("o_orderdate").as("mn"), max("o_orderdate").as("mx"))
    assert(physical(tsAgg).collectFirst { case b: BatchScanExec => b.scan }
      .get.isInstanceOf[graft.sources.DocStoreAggScan])
    val native = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(min("o_orderdate"), max("o_orderdate")).collect().head
    assert(tsAgg.collect().head == native)
    // double min/max: NaN makes writer stats unreliable — stays in Spark
    val dblAgg = via.agg(min("o_totalprice"))
    assert(!physical(dblAgg).collectFirst { case b: BatchScanExec => b.scan }
      .get.isInstanceOf[graft.sources.DocStoreAggScan])
    assert(dblAgg.collect().head ==
      spark.read.parquet(s"$sfDir/orders.parquet").agg(min("o_totalprice")).collect().head)
  }

  test("data filters refuse aggregate pushdown; partition filters compose") {
    val via = spark.read.format("docstore")
      .option("path", s"$sfDir/orders.parquet").load()
    // a pushed DATA filter invalidates row-group counts → no agg push
    val filtered = via.filter(col("o_orderkey") > 100).agg(count(lit(1)).as("n"))
    assert(!physical(filtered).collectFirst { case b: BatchScanExec => b.scan }
      .get.isInstanceOf[graft.sources.DocStoreAggScan])
    assert(filtered.collect().head.getLong(0) ==
      spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderkey") > 100).count())
    // partition filters prune whole FILES before footers are read, so
    // count(*) composes with them exactly
    val dir = tmpDir("docstore_agg_part")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .select("o_orderkey", "o_year")
      .write.format("docstore").option("path", dir)
      .option("partitionBy", "o_year").mode("overwrite").save()
    val perPart = spark.read.format("docstore").option("path", dir).load()
      .filter(col("o_year") === "1996").agg(count(lit(1)).as("n"))
    val scan = physical(perPart).collectFirst { case b: BatchScanExec => b.scan }.get
    assert(scan.isInstanceOf[graft.sources.DocStoreAggScan],
      s"partition filter blocked agg pushdown: ${scan.description()}")
    assert(perPart.collect().head.getLong(0) ==
      spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(year(col("o_orderdate")) === 1996).count())
  }
}
