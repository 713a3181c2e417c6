package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) splits
  * oversized partitions at runtime for sort-merge joins; explicit
  * salting is the deterministic fallback when a handful of keys dominate
  * (the classic power-law user_id / null-key cases at 100 TB).
  *
  * Shape: the large side spreads each hot key over `salts` sub-keys via
  * a content hash; the smaller side replicates each row `salts` times.
  * Join runs on (key, salt) — the hot key's rows now land on `salts`
  * tasks instead of one. */
object Skew {

  /** Stage width for the global-rank / prefix-sum spines. A hardcoded
    * constant here would cap the ranking stage of every globalRank-based
    * query at that many tasks regardless of cluster size (~3 TB/task at
    * 100 TB on a 10k-core cluster), so the width tracks the cluster:
    * `defaultParallelism` (total executor cores in cluster mode, local
    * thread count on local[N]) with 32 as the local floor. Rank output
    * is partition-count-invariant — range boundaries only move rows
    * between ordered ranges, never change a row's global rank — so
    * results (and every DuckDB oracle) are identical at any width;
    * ScaleSpec pins that invariance at two explicit widths. */
  def spineParts(df: DataFrame): Int =
    math.max(32, df.sparkSession.sparkContext.defaultParallelism)

  /** Lineage cut for iterative operators (pagerank/components/IVF/PQ/PCA
    * rounds, multi-stage dedup): without it round k replans rounds
    * 1..k-1 and the plan grows quadratically. Two modes behind one
    * switch:
    *
    *  - default: eager `localCheckpoint` — blocks stored on executors,
    *    zero external storage, right for local / interactive runs;
    *  - `graft.checkpoint.dir` set (runtime conf): eager reliable
    *    `checkpoint` to that directory — survives executor loss, the
    *    durability a 1000-executor job needs (losing one executor
    *    mid-pagerank must not kill the query). The session's
    *    checkpoint dir is set on first use if unset.
    *
    * Either way the returned plan is a bare scan of the materialized
    * blocks — downstream plan shape is identical, so every oracle and
    * plan-lint result is mode-invariant (ScaleSpec pins this).
    *
    * Checkpoint hygiene: a SparkContext-level checkpoint dir that was
    * already set (by the operator of the cluster) is respected, never
    * overridden — `graft.checkpoint.dir` only seeds it when unset. With
    * ~75 iterative cut sites each materializing multiple rounds, a long
    * reliable-mode run accumulates RDD checkpoint data under that dir;
    * deploys should either start the session with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the
    * ContextCleaner then deletes each round's files once its RDD is
    * garbage-collected — a context-build-time conf, which this repo's
    * Bench/Verify/Explain mains all set) or point the dir at storage
    * with a TTL/lifecycle rule. Local default mode has neither
    * concern: localCheckpoint blocks die with the executors. */
  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("graft.checkpoint.dir") match {
      case Some(dir) if dir.nonEmpty =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }

  /** Salt fan-out when the caller passes `salts = 0` (the default): a
    * fixed constant caps a hot key at that many tasks no matter how wide
    * the cluster is (8 tasks for a 10⁶×-median shingle on a 10k-core
    * cluster would still funnel), so the default tracks
    * `defaultParallelism` — every task slot can take a slice of the hot
    * key — with 8 as the floor so toy-local runs still demonstrably
    * spread. Results are salt-count-invariant by construction (the join
    * key set is unchanged; salts only route rows), pinned by ScaleSpec
    * at two explicit widths, so tuning the fan-out can never change an
    * oracle. Replication cost guard: only [[saltedJoinHot]] replicates
    * per-salt, and only for the (few) hot keys, so a wider fan-out
    * costs O(hotKeys × salts) tiny rows, not a full small-side copy. */
  def adaptiveSalts(df: DataFrame): Int =
    math.max(8, df.sparkSession.sparkContext.defaultParallelism)

  /** Inner equi-join of `big` and `small` on `key`, salted `salts` ways
    * (0 → [[adaptiveSalts]]). `spreadBy` drives the salt for the big
    * side — any column(s) that vary within a key (a row id, a
    * timestamp); kept deterministic so results are reproducible. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      spreadBy: Column,
      salts: Int = 0): DataFrame = {
    val n = if (salts > 0) salts else adaptiveSalts(big)
    val b = big.withColumn("__salt", pmod(xxhash64(spreadBy), lit(n.toLong)))
    val s = small.withColumn("__salt", explode(typedlit((0L until n.toLong).toSeq)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key-only salting: blanket salting replicates the whole small
    * side `salts`×, but in the power-law reality only a handful of keys
    * are hot. Single-pass formulation: each side gets a broadcast
    * hot-key flag; the big side salts hot rows (cold rows take salt 0),
    * the small side replicates ONLY hot rows across all salts (cold
    * rows take the one-element salt list) — then one equi-join on
    * (key, salt). No semi/anti split, no union, each input read once.
    * The hot-key set is exact (one aggregated pass over the big side's
    * keys, map-side combined, broadcast back); at extreme scale the
    * same set can come from a sample instead. Results are identical to
    * `big.join(small, key)` for any threshold. */
  def saltedJoinHot(
      big: DataFrame,
      small: DataFrame,
      key: String,
      spreadBy: Column,
      salts: Int = 0,
      hotThreshold: Long = 1000000L): DataFrame = {
    val n = if (salts > 0) salts else adaptiveSalts(big)
    val hot = big.groupBy(key).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotThreshold)
      .select(col(key), lit(true).as("__hot"))
    val b = big.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(xxhash64(spreadBy), lit(n.toLong))).otherwise(0L))
      .drop("__hot")
    val s = small.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), typedlit((0L until n.toLong).toSeq))
          .otherwise(typedlit(Seq(0L)))))
      .drop("__hot")
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact integer division a div b for non-negative longs, expressed so
    * the double division is always exact: the remainder is subtracted
    * first, so the quotient is integral and correctly-rounded division
    * returns it bit-exactly (no 3.9999… → 4 truncation hazards). */
  private[ops] def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Scalable global rank: a total-order 1-based row number WITHOUT an
    * unpartitioned Window (which funnels every row through one task —
    * the classic 100 TB scale-killer this repo's QueriesSpec lint bans).
    *
    * Dataflow: range-repartition on the sort key (contiguous, ordered
    * key ranges per partition; no single task ever sees the whole
    * input), rank locally with a Window PARTITIONED by the physical
    * partition id, and add each partition's global offset — the prefix
    * sum of per-partition counts, computed as a numPartitions-row
    * aggregate (sort_array + higher-order prefix fold, no window at
    * all) and broadcast back. Three narrow exchanges of the input, all
    * parallel; the only driver-sized state is the numPartitions-row
    * offset table. The result is deterministic for a total sort key
    * even though the range boundaries are sampled: boundaries only move
    * rows between ordered ranges, never change any row's global rank —
    * PROVIDED offsets and local ranks see the SAME boundaries, which
    * the cut below guarantees (see comment). */
  def globalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      numParts: Int = 0,
      rankCol: String = "__rank",
      totalCol: Option[String] = None): DataFrame = {
    val width = if (numParts > 0) numParts else spineParts(df)
    // The cut is LOAD-BEARING for correctness, not an optimization:
    // RangePartitioning samples fresh boundaries on every execution
    // (observed: the same plan yields different per-partition counts
    // across runs), and the offsets subtree + the ranked subtree both
    // consume this exchange. Exchange/stage reuse usually dedupes them,
    // but under concurrent query execution the two materializations can
    // race, each sampling DIFFERENT boundaries — local ranks then pair
    // with offsets from a different partitioning and the "global rank"
    // silently gains duplicates and gaps (caught by
    // stream_watermark_progression's uneven batches). Materializing the
    // partitioned frame once makes both subtrees read the same blocks,
    // restoring the determinism argument above unconditionally.
    val parted = cut(df.repartitionByRange(width, sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long")))
    // per-partition counts → (offset, grand total) in ONE tiny aggregate;
    // the total rides along so callers never re-scan the input for n
    val offsets = parted.groupBy("__pid").agg(count(lit(1)).as("__pc"))
      .agg(sort_array(collect_list(struct(col("__pid"), col("__pc")))).as("a"))
      .select(explode(expr(
        "transform(a, (x, i) -> struct(x.__pid AS __pid, " +
          "aggregate(slice(a, 1, i), CAST(0 AS BIGINT), " +
          "(acc, y) -> acc + y.__pc) AS __off))")).as("o"),
        expr("aggregate(a, CAST(0 AS BIGINT), (acc, y) -> acc + y.__pc)")
          .as("__n"))
      .select(col("o.__pid").as("__pid"), col("o.__off").as("__off"),
        col("__n"))
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val ranked = parted
      .withColumn("__lr", row_number().over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
    totalCol match {
      case Some(t) => ranked.withColumnRenamed("__n", t)
      case None => ranked.drop("__n")
    }
  }

  /** ntile(k) reconstructed from a global rank: SQL-standard semantics
    * (first n mod k tiles get floor(n/k)+1 rows, the rest floor(n/k)),
    * in pure integer Column arithmetic — bit-identical to
    * ntile(k).over(Window.orderBy(...)) for any total sort order. */
  private[ops] def ntileFromRank(r: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val s = pmod(n, kL) // number of oversized (q+1)-row tiles
    val q = idiv(n, kL) // base tile size
    val big = (q + lit(1L)) * s // rows covered by the oversized tiles
    when(r <= big, idiv(r - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(s + idiv(r - big - lit(1L), greatest(q, lit(1L))) + lit(1L))
  }

  /** Global ntile(k) at scale: [[globalRank]] + [[ntileFromRank]], with
    * the total row count riding a 1-row broadcast. Output is
    * bit-identical to the unpartitioned-window ntile, so oracles
    * written as `ntile(k) OVER (ORDER BY ...)` replay unchanged. */
  def globalNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      k: Int,
      outCol: String,
      numParts: Int = 0): DataFrame =
    globalRank(df, sortCols, numParts, rankCol = "__r",
        totalCol = Some("__n"))
      .withColumn(outCol, ntileFromRank(col("__r"), col("__n"), k))
      .drop("__r", "__n")
}
