package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-9 operator batch, beyond the
  * DuckDB hash-compare: brute-force recomputation where the fixture is
  * small enough (weighted median, k-core fixpoint), and structural
  * bounds everywhere else. All at sf0.001. */
class Round9Spec extends SparkSpec {

  test("agg_weighted_median matches a brute-force weighted median") {
    val got = SparkEntry.queries("agg_weighted_median")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2), r.getDouble(3)))
    for ((grp, g) <- rows.groupBy(_._1)) {
      val sorted = g.map(t => (t._2, t._3)).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val total = sorted.map(_._2).sum
      var cum = 0.0
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      assert(got(grp) === med, s"group $grp")
    }
  }

  test("graph_kcore reaches the true peeling fixpoint on the fixture") {
    val out = SparkEntry.queries("graph_kcore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force: same strong-edge derivation, peel to fixpoint
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .filter(col("src") =!= col("dst"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getDouble(2)))
    val mean = e.map(_._3).sum / e.length
    var und = e.filter(_._3 >= mean)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct.toSet
    var changed = true
    while (changed) {
      val deg = und.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      val nxt = und.filter(p => keep(p._1) && keep(p._2))
      changed = nxt != und
      und = nxt
    }
    val expect = und.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out === expect,
      "4 unrolled rounds must reach the fixpoint on the fixture graph")
  }

  test("graph_shortest_path satisfies the relaxation invariants") {
    val dist = SparkEntry.queries("graph_shortest_path")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist(0L) === 0L)
    assert(dist.values.forall(d => d >= 0 && d <= 4))
  }

  test("pipeline_token_budget respects supply, budget, and near-exhaustion") {
    val rows = SparkEntry.queries("pipeline_token_budget")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val supply = rows.map(_._2).sum
    val budget = supply * 3 / 5
    val alloc = rows.map(_._3).sum
    assert(rows.forall { case (_, tok, a) => a >= 0 && a <= tok },
      "allocation within supply")
    assert(alloc <= budget, s"alloc $alloc over budget $budget")
    // each DIV drops < 1 token per source per pass (2 passes)
    assert(alloc >= budget - 2L * rows.length,
      s"water-filling must nearly exhaust the budget: $alloc vs $budget")
  }

  test("pipeline_kfold folds are disjoint and exhaustive") {
    val rows = SparkEntry.queries("pipeline_kfold")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_._1).toSet.subsetOf((1L to 5L).toSet))
    assert(rows.map(_._2).sum === total)
  }

  test("pipeline_curriculum phases are balanced and cover each doc once") {
    val rows = SparkEntry.queries("pipeline_curriculum")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length.toLong === n)
    assert(rows.map(_._1).distinct.length.toLong === n, "each doc once")
    val perPhase = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perPhase.keySet === Set(1, 2, 3))
    assert(perPhase.values.max - perPhase.values.min <= 1,
      s"ntile balance: $perPhase")
  }

  test("text_winnowing fingerprints are a subset of the doc's gram hashes") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    val out = SparkEntry.queries("text_winnowing")(spark, sfDir).collect()
    // recompute each doc's full gram-hash set with the same portable hash
    def hash(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
        16)
    for (r <- out.take(50)) {
      val (id, nFp) = (r.getLong(0), r.getLong(1))
      val ws = docs(id)
      val grams = ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val hashes = grams.map(hash).toSet
      assert(nFp >= 1 && nFp <= hashes.size, s"doc $id")
      // winnowing density: each selected value is the min of some
      // 4-window, so the set cannot exceed the number of full windows
      assert(nFp <= math.max(1, grams.size - 3), s"doc $id window bound")
    }
  }

  test("sim_recall_eval and sim_centroid_drift stay in range") {
    val r = SparkEntry.queries("sim_recall_eval")(spark, sfDir).head()
    assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    val d = SparkEntry.queries("sim_centroid_drift")(spark, sfDir).collect()
    assert(d.nonEmpty)
    assert(d.forall(x => math.abs(x.getDouble(1)) <= 1.0 + 1e-9))
  }

  test("profile_psi_drift terms are finite over valid buckets") {
    val rows = SparkEntry.queries("profile_psi_drift")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("agg_hour_bitmap popcounts bound by 24 and users add up") {
    val rows = SparkEntry.queries("agg_hour_bitmap")(spark, sfDir).collect()
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 24))
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum === users)
  }

  test("etl_snapshot_diff conserves the event total") {
    val rows = SparkEntry.queries("etl_snapshot_diff")(spark, sfDir).collect()
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === total)
    val statuses = rows.map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("added", "removed", "changed", "same")))
  }

  test("graph_modularity q terms are bounded and consistent with labels") {
    val rows = SparkEntry.queries("graph_modularity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val q = rows.map(_.getDouble(3)).sum
    assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9, s"modularity $q out of range")
    val nNodes = rows.map(_.getLong(1)).sum
    assert(nNodes === 25L, "every nation in exactly one community")
  }
}
