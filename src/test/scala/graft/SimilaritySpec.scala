package graft

import graft.expr.{VectorMean, VectorOps}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("VectorOps.dot/cosine match a driver-side double computation") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(4.0f, -5.0f, 6.0f)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val got = df.select(
      VectorOps.dot(col("a"), col("b")).as("dot"),
      VectorOps.cosine(col("a"), col("b")).as("cos")).head()
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(got.getDouble(0) - dot) < 1e-12)
    assert(math.abs(got.getDouble(1) - dot / (na * nb)) < 1e-12)
  }

  test("sim_pca_power: unit norm, fixpoint, and variance dominance") {
    val out = SparkEntry.queries("sim_pca_power")(spark, sfDir).cache()
    assert(out.count() === 64)
    // Unit norm (loadings rounded to 4dp → generous tolerance).
    val n2 = out.agg(sum(col("loading") * col("loading"))).head().getDouble(0)
    assert(math.abs(n2 - 1.0) < 0.01, s"norm² = $n2")
    // Fixpoint: one more power step barely rotates v.
    val vArr = out.orderBy("dim").collect().map(_.getAs[Double]("loading").toFloat)
    import spark.implicits._
    val vDf = Seq(Tuple1(vArr.toSeq)).toDF("v")
    val vm = udaf(VectorMean)
    val e = Tables.t(spark, sfDir, "embeddings")
    val mu = e.agg(vm(col("embedding")).as("mud"))
      .select(transform(col("mud"), d => d.cast("float")).as("mu"))
    val xc = e.crossJoin(broadcast(mu))
      .select(zip_with(col("embedding"), col("mu"), (a, b) => (a - b).cast("float")).as("x"))
    val w = xc.crossJoin(broadcast(vDf))
      .withColumn("s", VectorOps.dot(col("x"), col("v")))
      .select(transform(col("x"), e2 => (e2 * col("s")).cast("float")).as("y"))
      .agg(vm(col("y")).as("w"))
      .select(transform(col("w"), d => d.cast("float")).as("w"))
    val cosVW = w.crossJoin(broadcast(vDf))
      .select(abs(VectorOps.cosine(col("w"), col("v")))).head().getDouble(0)
    assert(cosVW > 0.998, s"|cos(v, Av)| = $cosVW — not a fixpoint")
    // Dominance: variance along v >= variance along every basis axis.
    val eig = out.head().getAs[Double]("eigenvalue")
    val maxDimVar = e
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(var_pop(col("x")).as("v")).agg(max("v"))
      .head().getDouble(0)
    assert(eig >= maxDimVar * 0.999, s"eigenvalue $eig < max axis variance $maxDimVar")
    out.unpersist()
  }

  test("VectorMean aggregator equals per-dimension avg") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)),
      (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f))).toDF("label", "embedding")
    val vm = udaf(VectorMean)
    val got = df.groupBy("label").agg(vm(col("embedding")).as("m"))
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(got(0)._2 == Seq(2.0, 3.0))
    assert(got(1)._2 == Seq(10.0, 20.0))
  }

  test("IVF ANN achieves recall >= 0.5 vs brute force at sf0.001") {
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.annIvf(spark, sfDir, queryVecId = 0, nProbe = 2, topK = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low (exact=$exact approx=$approx)")
  }

  test("hyperplane-LSH near-dup: precision 1, recall above chance") {
    // full all-pairs exact reference built inline: O(N²) is the point of
    // a bounded spec fixture (N=500); the declared exact query is
    // intentionally probe-bounded and can't serve as reference here
    val e = Tables.t(spark, sfDir, "embeddings")
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("eb"))
    val exact = a.join(b, col("v1") < col("v2"))
      .withColumn("cos", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.4)
      .select("v1", "v2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_embedding_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verify step must make every emitted pair exact")
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.2, s"recall $recall (exact=${exact.size}, lsh=${lsh.size})")
    }
  }

  test("k-means-built centroids keep IVF recall at least at seed-centroid level") {
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    def recall(iters: Int): Double = {
      val approx = Similarity
        .annIvf(spark, sfDir, queryVecId = 0, nProbe = 2, topK = 10, buildIters = iters)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val (seeded, iterated) = (recall(0), recall(2))
    assert(iterated >= seeded, s"k-means build hurt recall: $seeded -> $iterated")
  }

  test("IVF ANN with all centroids probed equals brute force over same k") {
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val full = Similarity.annIvf(spark, sfDir, queryVecId = 0, nProbe = 8, topK = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, "probing every partition must reduce to exact search")
  }

  test("PQ ANN: recall >= 0.6 vs brute force, exact re-rank scores, deterministic") {
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pq = Similarity.annPq(spark, sfDir, queryVecId = 0, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val recall = pq.map(_._1).count(exact.contains) / 10.0
    assert(recall >= 0.6, s"PQ recall $recall too low (pq=${pq.map(_._1).toSeq})")
    // Survivors carry the EXACT cosine (re-rank), not the ADC estimate.
    pq.filter(p => exact.contains(p._1)).foreach { case (id, cos) =>
      assert(math.abs(cos - exact(id)) < 1e-9, s"vec $id score drifted")
    }
    val again = Similarity.annPq(spark, sfDir, queryVecId = 0, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(pq.toSeq === again.toSeq, "PQ pipeline must be deterministic")
  }

  test("PQ ANN with candidate set >= corpus reduces to exact search") {
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val n = Tables.t(spark, sfDir, "embeddings").count().toInt
    val full = Similarity.annPq(spark, sfDir, queryVecId = 0, topK = 10,
        nCandidates = n)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, "re-ranking every vector must reduce to exact search")
  }
}
