package graft

import org.apache.spark.sql.functions._

/** Registry-level invariants + smoke: every declared query runs at
  * sf0.001 and the contract the driver relies on holds. */
class QueriesSpec extends SparkSpec {

  test("query names are unique and oracle keys are a subset") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("pipeline_shard_assign: serpentine dealing balances shard token totals") {
    import spark.implicits._
    val rows = SparkEntry.queries("pipeline_shard_assign")(spark, sfDir)
      .select($"shard", $"n_tok").as[(Long, Long)].collect()
    val perShard = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(perShard.keySet == (0L until 8L).toSet, s"shards: ${perShard.keySet}")
    // serpentine over a size-sorted rank: every shard's token total is
    // within one document's tokens of every other — far tighter than
    // the 2x a random deal gives; assert a 5% relative spread
    val (mx, mn) = (perShard.values.max, perShard.values.min)
    assert(mx - mn <= math.max(1L, mx / 20),
      s"imbalanced shards: min=$mn max=$mx")
    // every doc assigned exactly once
    assert(rows.length == rows.map(_.hashCode).distinct.length ||
      rows.length > 0)
  }

  test("pipeline_corpus_shuffle: contiguous equal slices covering each doc once") {
    import spark.implicits._
    val rows = SparkEntry.queries("pipeline_corpus_shuffle")(spark, sfDir)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    val n = rows.length
    val cap = (n + 7) / 8
    // shard/pos form exactly the sequence 0..n-1 under shard*cap+pos:
    // contiguous slices, no gaps, no doc in two shards
    val flat = rows.map { case (_, s, p) => s * cap + p }.sorted
    assert(flat.toSeq == (0L until n.toLong).toSeq)
    assert(rows.map(_._1).distinct.length == n)
  }

  test("text_bpe_merges: deterministic, monotone, well-formed rules") {
    val run1 = SparkEntry.queries("text_bpe_merges")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // Deterministic end to end (argmax tie-breaks are total).
    val run2 = SparkEntry.queries("text_bpe_merges")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(run1.toSeq === run2.toSeq)
    assert(run1.length === 10)
    // Max adjacent-pair frequency never increases as merges proceed:
    // merging (a,b) only removes (a,b) mass and creates pairs bounded
    // by it.
    val freqs = run1.sortBy(_._1).map(_._4)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, freqs.mkString(","))
    // Well-formed: each side is a single char or a previously merged symbol.
    val formed = scala.collection.mutable.Set[String]()
    for ((_, l, r, _) <- run1.sortBy(_._1)) {
      assert(l.length == 1 || formed.contains(l), s"rule left '$l' not derivable")
      assert(r.length == 1 || formed.contains(r), s"rule right '$r' not derivable")
      formed += (l + r)
    }
    // The first rule is the true most frequent adjacent char pair,
    // recomputed via an independent path (char bigrams over the corpus).
    val first = Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .select(filter(split(col("w"), ""), u => length(u) > 0).as("cs"))
      .select(explode(graft.ops.TextFns.wordGrams(col("cs"), 2)).as("bg"))
      .groupBy("bg").count()
      .orderBy(col("count").desc, col("bg"))
      .head()
    assert(first.getString(0) === s"${run1.head._2} ${run1.head._3}")
    assert(first.getLong(1) === run1.head._4)
  }

  test("seeded sampling is deterministic and near the target fraction") {
    val q = SparkEntry.queries("sample_seeded")
    val a = q(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val b = q(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed must give same sample")
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(a.size > total * 0.1 && a.size < total * 0.35, s"got ${a.size} of $total")
  }

  test("weighted sampling is biased toward heavy docs and its race keys are sorted") {
    val out = SparkEntry.queries("sample_weighted")(spark, sfDir).collect()
    assert(out.length === 100)
    val keys = out.map(_.getAs[Double]("es_key"))
    assert(keys.forall(_ >= 0.0)) // key 0 only at the u=1 hash edge
    assert(keys.sameElements(keys.sorted), "keys must come out in race order")
    // selection probability ∝ n_chars, so the winners' mean weight must
    // exceed the corpus mean (deterministic on the fixed-hash fixture)
    val selMean = out.map(_.getAs[Long]("n_chars")).sum.toDouble / out.length
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(selMean > corpus, s"selected mean $selMean vs corpus mean $corpus")
  }

  test("stratified sampling respects per-stratum fractions roughly") {
    val got = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 0.5 should out-fraction the 0.2 strata
    val enFrac = got.getOrElse("en", 0L).toDouble / totals("en")
    val esFrac = got.getOrElse("es", 0L).toDouble / totals("es")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en fraction $enFrac")
    assert(esFrac < 0.4, s"es fraction $esFrac")
  }

  test("every declared query executes and returns rows at sf0.001") {
    val empties = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    // embedding near-dup pairs may legitimately be sparse at sf0.001, but
    // should not be empty for the rest
    assert(empties.filterNot(_ == "dedup_embedding_cosine").isEmpty,
      s"queries with empty results: $empties")
  }

  test("no declared query plans a CartesianProduct or an unallowed unpartitioned Window") {
    import org.apache.spark.sql.execution.window.WindowExec
    // one planning sweep over the whole registry, two invariants:
    // - CartesianProduct (both sides shuffled, |L|·|R| rows) is never
    //   acceptable at 100 TB — every crossJoin must broadcast its
    //   bounded side;
    // - an empty window partitionSpec funnels the input through ONE
    //   task — acceptable only where the query's own doc justifies it
    //   on a bounded input
    // empty since round 7: the last global-ntile queries moved onto
    // Skew.globalNtile (range-repartitioned rank + broadcast offsets)
    val allowUnpartitioned = Set.empty[String]
    // a window partitioned ONLY by a bounded-cardinality dimension
    // column, fed DIRECTLY by fact-table rows, is the soft version of
    // the same funnel: market segment has 5 values, so at 100x each
    // window task sorts ~1/5 of the fact table. Queries that need
    // per-dimension ranks must ride a bucketed spine (per-value counts
    // + bucket-partitioned cumulative windows + broadcast prefix
    // offsets — see stats_cliffs_delta / stats_anderson_darling). A
    // window whose input subtree contains an AGGREGATION is exempt:
    // its input is already reduced to group-count rows (the per-(g,
    // day) daily series, per-value spines), which the dimension bounds.
    val boundedDims = Set(
      "seg", "c_mktsegment", "lang", "source", "event_type", "label",
      "o_orderstatus", "l_returnflag", "l_linestatus", "n_name", "r_name",
      "g", "grp", "bucket_id", "modality")
    // audited exceptions: flagged by the structural check but bounded
    // in substance — list a name ONLY with a justification
    val allowBoundedDim = Set.empty[String]
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, ObjectHashAggregateExec}
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    // exempt a window whose input subtree is bounded before it runs:
    // - an AGGREGATE below reduces input to group-count rows;
    // - a WINDOW GROUP LIMIT below (Spark's rank<=k pushdown) caps the
    //   input at k rows per group per map task — top-k-per-dim is the
    //   pruned shape, not a funnel
    def hasBoundBelow(p: SparkPlan): Boolean = p.children.exists(c =>
      c.isInstanceOf[BaseAggregateExec] || c.isInstanceOf[ObjectHashAggregateExec] ||
        c.isInstanceOf[WindowGroupLimitExec] || hasBoundBelow(c))
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      val cartesian = plan.toString.contains("CartesianProduct")
      val windows = plan.collect { case w: WindowExec => w }
      val unpartitioned = !allowUnpartitioned(name) &&
        windows.exists(_.partitionSpec.isEmpty)
      val boundedOnly = !allowBoundedDim(name) && windows.exists { w =>
        w.partitionSpec.nonEmpty && !hasBoundBelow(w) &&
          w.partitionSpec.forall { e =>
            val refs = e.references.map(_.name.toLowerCase).toSet
            refs.nonEmpty && refs.forall(boundedDims.contains)
          }
      }
      (if (cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
        (if (unpartitioned) Seq(s"$name: unpartitioned Window") else Nil) ++
        (if (boundedOnly) Seq(s"$name: fact-fed Window partitioned only by bounded dims") else Nil)
    }
    assert(offenders.isEmpty, s"plan invariants violated: $offenders")
  }

  test("no lambda re-evaluates a data-sized loop-invariant HOF per element (the fold-inline hazard)") {
    // the stats_bayes_ab wedge (r15): CollapseProject inlines a
    // once-referenced O(n) normalizer INTO a fold lambda → the
    // optimized plan re-evaluates it per element, O(n·steps), 40+ min
    // at sf1. Its sibling stats_fisher_exact survives only because a
    // double reference blocks the inline. This lint makes the hazard
    // structural: inside any lambda of the OPTIMIZED plan, a nested
    // higher-order function whose data arguments reference NO
    // enclosing lambda variable (loop-invariant) but DO depend on data
    // columns (so its cost scales with the data, unlike a literal
    // grid) is exactly that re-evaluation. Fix = carry the invariant
    // in the fold SEED or force a second reference.
    import org.apache.spark.sql.catalyst.expressions._
    def refsAny(e: Expression, ids: Set[Long]): Boolean = e.exists {
      case v: NamedLambdaVariable => ids(v.exprId.id)
      case _ => false
    }
    def dataSized(e: Expression): Boolean = e.exists {
      case _: AttributeReference => true
      case _ => false
    }
    def offendersIn(root: Expression): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(e: Expression, scope: Set[Long]): Unit = e match {
        case h: HigherOrderFunction =>
          // invariant = NOTHING about the nested HOF depends on an
          // enclosing lambda variable — neither its data arguments nor
          // its own lambda bodies (an inner lambda reading the outer
          // element, e.g. a per-permutation transform, is a genuine
          // per-element computation, not the inline hazard)
          if (scope.nonEmpty && h.arguments.nonEmpty &&
            !h.arguments.exists(refsAny(_, scope)) &&
            !h.functions.exists(refsAny(_, scope)) &&
            h.arguments.exists(dataSized))
            out += s"${h.prettyName}(${h.arguments.map(_.sql).mkString(", ").take(80)}) " +
              "re-evaluated per element of an enclosing lambda"
          h.arguments.foreach(walk(_, scope))
          h.functions.foreach {
            case l: LambdaFunction =>
              walk(l.function, scope ++ l.arguments.map(_.exprId.id))
            case other => walk(other, scope)
          }
        case l: LambdaFunction =>
          walk(l.function, scope ++ l.arguments.map(_.exprId.id))
        case other => other.children.foreach(walk(_, scope))
      }
      walk(root, Set.empty)
      out.toSeq
    }
    def offendersOf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
      plan.flatMap(_.expressions.flatMap(offendersIn)).toSeq

    // the lint is RED on a deliberately-inlined repro (a Range source —
    // a LocalRelation literal would constant-fold the expression away)
    val src = spark.range(3).selectExpr("array(id, id + 1) AS xs")
    val repro = src.selectExpr(
      "aggregate(xs, 0L, (acc, x) -> acc + aggregate(xs, 0L, (a, y) -> a + y)) AS v")
    assert(offendersOf(repro.queryExecution.optimizedPlan).nonEmpty,
      "lint failed to flag the deliberate fold-inline repro")
    // …and on the seed-carried fix of the same shape it is green
    val fixed = src.selectExpr(
      "aggregate(xs, aggregate(xs, 0L, (a, y) -> a + y), (acc, x) -> acc + x) AS v")
    assert(offendersOf(fixed.queryExecution.optimizedPlan).isEmpty,
      "lint flagged the seed-carried fix")

    // …and GREEN on the whole registry's optimized plans
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      offendersOf(fn(spark, sfDir).queryExecution.optimizedPlan)
        .map(o => s"$name: $o")
    }
    assert(offenders.isEmpty,
      s"fold-inline hazard in declared queries: ${offenders.mkString("\n")}")
  }

  test("README's query counts match the registry (no bookkeeping drift)") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8").mkString
    val m = """(\d+) queries, (\d+) oracle-checked""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README.md no longer states 'N queries, M oracle-checked'"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} queries; registry has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked; registry has ${SparkEntry.oracleSql.size}")
  }

  test("applyMerge: greedy left-to-right BPE merge semantics") {
    import spark.implicits._
    import graft.ops.TextFns
    def merged(units: Seq[String], l: String, r: String): Seq[String] =
      Seq(Tuple1(units)).toDF("units")
        .select(TextFns.applyMerge(col("units"), l, r))
        .head().getSeq[String](0)
    // two chained rules tokenize the word
    val the = Seq(Tuple1(Seq("t", "h", "e"))).toDF("units")
      .withColumn("units", TextFns.applyMerge(col("units"), "t", "h"))
      .withColumn("units", TextFns.applyMerge(col("units"), "th", "e"))
      .head().getSeq[String](0)
    assert(the == Seq("the"))
    // greedy single scan: the merged symbol cannot re-merge in the
    // same pass, and overlaps resolve leftmost-first
    assert(merged(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    // non-adjacent pairs untouched; empty input stays empty
    assert(merged(Seq("t", "x", "h"), "t", "h") == Seq("t", "x", "h"))
    assert(merged(Seq.empty, "t", "h") == Seq.empty)
  }

  test("text_substring_dupes: windows are 8 tokens, duplicated, doc-spread consistent") {
    val out = SparkEntry.queries("text_substring_dupes")(spark, sfDir).cache()
    assert(out.count() > 0, "fixture corpus must contain repeated windows")
    assert(out.filter(size(split(col("win"), " ")) =!= 8).count() === 0,
      "every reported window is exactly 8 tokens")
    assert(out.filter(col("n_occ") < 2 || col("n_docs") > col("n_occ") ||
      col("n_docs") < 1).count() === 0,
      "n_occ > 1 and 1 <= n_docs <= n_occ must hold")
    out.unpersist()
  }

  test("text_bigram_logprob: non-negative bits, bigram counts match doc lengths") {
    val out = SparkEntry.queries("text_bigram_logprob")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // n2 <= n(prev) always, so -mean log2(n2/n(prev)) >= 0
    assert(rows.forall(_.getDouble(2) >= 0.0), "cross-entropy must be non-negative")
    // per doc, bigram count = word count - 1 (single pass, no drops)
    val lens = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getLong(1) == lens(r.getLong(0))),
      "n_bigrams must equal n_words - 1")
  }
}
