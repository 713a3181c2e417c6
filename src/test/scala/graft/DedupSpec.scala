package graft

import graft.expr.HammingDistance
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("connectedComponents: chains, cycles, and pairs converge to min labels") {
    import spark.implicits._
    // chain 1-2-3-4-5 (needs 4 propagation rounds), triangle 10-11-12
    // with a tail to 13, isolated pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L),
      (20L, 21L)).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val comp = got.map(t => t._1 -> t._2).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comp(_) == 1L), s"chain: $comp")
    assert(Seq(10L, 11L, 12L, 13L).forall(comp(_) == 10L), s"triangle+tail: $comp")
    assert(Seq(20L, 21L).forall(comp(_) == 20L), s"pair: $comp")
    assert(got.filter(_._3).map(_._1).toSeq == Seq(1L, 10L, 20L),
      "exactly one survivor per component, the min node")
  }

  test("connectedComponentsStar: matches label propagation on chains, cycles, random graphs") {
    import spark.implicits._
    def run(pairs: Seq[(Long, Long)], propIters: Int = 80): Unit = {
      val edges = pairs.toDF("src", "dst")
      val star = Dedup.connectedComponentsStar(edges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      val prop = Dedup.connectedComponents(edges, maxIters = propIters).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      assert(star.toSeq === prop.toSeq, s"divergence on ${pairs.take(8)}…")
    }
    // triangle + tail, isolated pair, short chain
    run(Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (12L, 13L), (20L, 21L)))
    // self-loops: node 5 exists ONLY via a self-loop and must still be
    // emitted (component 5, keep) by both algorithms; 7's self-loop is
    // redundant with its real edge
    run(Seq((5L, 5L), (1L, 2L), (7L, 7L), (2L, 7L)))
    // cycle of 9
    run((0L until 9L).map(i => (i, (i + 1) % 9)))
    // seeded random graphs: 60 nodes, varying density
    val rnd = new scala.util.Random(42)
    for (m <- Seq(25, 60, 120)) {
      run(Seq.fill(m)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2))
    }
  }

  test("connectedComponentsStar: diameter-29 chain converges in logarithmic rounds") {
    import spark.implicits._
    // min-label propagation needs 29 rounds here; the alternating
    // algorithm's round count is O(log^2 n) — well under 16.
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponentsStar(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 29L).forall(got(_) == 0L), s"chain must collapse to 0: $got")
  }

  test("hamming_distance expression: eval + codegen paths agree with popcount") {
    import spark.implicits._
    val df = Seq((0L, 0L), (-1L, 0L), (0xFFL, 0x0FL), (123456789L, 987654321L))
      .toDF("a", "b")
    val got = df.select(HammingDistance.hamming(col("a"), col("b")).as("h"))
      .collect().map(_.getInt(0)).toSeq
    val exp = Seq((0L, 0L), (-1L, 0L), (0xFFL, 0x0FL), (123456789L, 987654321L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(got == exp)
  }

  test("minhash_sig expression: deterministic, order-insensitive, length k") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"),
      Seq("c", "b", "a"), // same set, different order → same signature
      Seq("x", "y", "z")).toDF("tokens")
    val sigs = df.select(graft.expr.MinHashSig.minhashSig(col("tokens")).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 32)
    assert(sigs(0) == sigs(1), "minhash must be set-order insensitive")
    assert(sigs(0) != sigs(2))
    // interpreted eval path (post-filter defeats codegen fallback checks
    // rarely; compare via a second run for determinism instead)
    val again = df.select(graft.expr.MinHashSig.minhashSig(col("tokens")).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.toSeq == again.toSeq)
  }

  test("minhash-LSH: identical docs always collide with jaccard 1.0") {
    val df = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now yes")))
    val pairs = Dedup.minhashLsh(df).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined, "identical docs must be LSH candidates")
    assert(p12.get.getAs[Double]("jaccard") == 1.0)
  }

  test("minhash-LSH: highly similar docs collide, dissimilar ones don't pair with jaccard 1") {
    // 19/21 shared tokens → jaccard ~0.90; with 8 bands × 4 rows the
    // candidate probability is ~1 - (1 - 0.9^4)^8 ≈ 0.996
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val similar = base + " extra"
    val df = docsDf(Seq((1L, base), (2L, similar), (3L, "x y z q w e r t")))
    val pairs = Dedup.minhashLsh(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("minhash signature equality probability grows with jaccard (property)") {
    // property on the pipeline output: verified jaccard of emitted pairs
    // is exact set jaccard
    val df = docsDf(Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x")))
    val out = Dedup.minhashLsh(df).collect()
    out.foreach { r =>
      // tokens: 8 each, 7 shared, union 9 → 7/9
      assert(math.abs(r.getAs[Double]("jaccard") - 7.0 / 9.0) < 1e-6)
    }
  }

  test("simhash via declared query: identical prefix docs at hamming 0") {
    // run the declared query on the fixture dir and sanity-check shape:
    // pairs are ordered, hamming within threshold, d1 < d2
    val out = SparkEntry.queries("dedup_simhash")(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 16)
    }
  }

  test("containment flags a subset doc that Jaccard misses") {
    // doc 1's shingles are a strict subset of doc 2's: containment of
    // 1-in-2 is exactly 1.0 while Jaccard dilutes toward |A|/|B|
    val short = "a b c d e"
    val long = "a b c d e " + (1 to 40).map(i => s"w$i").mkString(" ")
    val stats = Dedup.ngramJaccardStats(docsDf(Seq((1L, short), (2L, long)))).collect()
    assert(stats.length === 1)
    val r = stats.head
    val (inter, na, nb) = (r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Long]("nb"))
    assert(inter === na, "every shingle of the short doc appears in the long one")
    assert(inter.toDouble / na === 1.0)
    assert(r.getAs[Double]("jaccard") < 0.1, "Jaccard misses the subset pair")
    assert(nb > na)
  }

  test("exact dedup survivor is the minimum doc_id per (lang, source)") {
    val out = SparkEntry.queries("dedup_exact_key")(spark, sfDir)
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val expected = docs.groupBy("lang", "source").agg(min("doc_id").as("doc_id"))
    assert(out.select("lang", "source", "doc_id").except(expected).count() == 0)
    assert(out.count() == expected.count())
  }

  test("chunkDedup: unique corpus is untouched; duplicates strip; chunks stay globally unique") {
    // all-unique corpus → reconstruction is the identity
    val uniq = docsDf(Seq(
      (1L, (1 to 25).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 13).map(i => s"b$i").mkString(" "))))
    val u = Dedup.chunkDedup(uniq, 10).collect()
    assert(u.forall(r => r.getAs[Long]("n_chunks") == r.getAs[Long]("n_kept")))
    val uniqText = uniq.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(u.forall(r => r.getAs[String]("cleaned") == uniqText(r.getAs[Long]("doc_id"))))

    // an identical later doc strips to empty; the first survives whole
    val twin = docsDf(Seq(
      (1L, (1 to 20).map(i => s"c$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"c$i").mkString(" "))))
    val t = Dedup.chunkDedup(twin, 10).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(t(1L).getAs[Long]("n_kept") == 2 && t(2L).getAs[Long]("n_kept") == 0)
    assert(t(2L).getAs[String]("cleaned") == "")

    // fixture corpus: every distinct chunk survives exactly once
    // globally (sum of kept == distinct chunk strings), and kept never
    // exceeds total
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Dedup.chunkDedup(docs, 10)
    val kept = out.agg(sum("n_kept")).collect().head.getLong(0)
    val distinctChunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        "transform(sequence(1, size(w), 10), st -> " +
          "concat_ws(' ', slice(w, st, 10)))")).as("chunk"))
      .distinct().count()
    assert(kept == distinctChunks,
      s"kept=$kept distinct=$distinctChunks — a chunk was kept twice or lost")
    assert(out.filter(col("n_kept") > col("n_chunks")).isEmpty)
  }

  test("incremental minhash: band index survives a parquet round-trip; dups rejected, novel kept") {
    import spark.implicits._
    // historical corpus → persisted (band, key) index → new batch joined
    // against the RE-READ index: the continuous-ingestion cycle
    val hist = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs before noon today")))
    val storePath = tmpDir("graft-mh-store")
    Dedup.portableBandIndex(hist).select("band", "key").distinct()
      .write.mode("overwrite").parquet(storePath)
    val store = spark.read.parquet(storePath)
    val batch = docsDf(Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // = doc 1
      (11L, "completely unrelated text about spark catalyst optimizer rules"),
      (12L, "completely unrelated text about spark catalyst optimizer rules"), // = 11
      (13L, "zebras graze quietly near the river delta at dawn every morning")))
      .withColumn("source", lit("batch"))
    val banded = Dedup.portableBandIndex(batch.select("doc_id", "text"))
      .join(batch.select("doc_id", "source"), "doc_id")
    val kept = Dedup.incrementalMinhash(banded, store)
      .select("doc_id").as[Long].collect().toSet
    // 10 hits the store (exact dup of doc 1 → every band collides);
    // 12 loses to earlier batch twin 11; 11 and 13 are novel
    assert(kept == Set(11L, 13L), s"got $kept")
  }
}
