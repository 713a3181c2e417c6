package graft.ops

import graft.{Q, Tables}
import graft.expr.{VectorMean, VectorOps, VectorWeightedSum}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, kNN join
  * per group, a centroid aggregate, and an IVF-bucketed approximate
  * variant as the 100 TB path (probe a subset of partitions instead of
  * scanning all vectors). */
object Similarity {

  def defs: Seq[Q] = Seq(

    Q(
      "sim_mmr_rerank",
      "Maximal-marginal-relevance diversification: the top-20 cosine " +
        "candidates for query vec 0 are greedily re-ranked so each of " +
        "the 5 picks maximizes 0.7·relevance − 0.3·max-similarity-to-" +
        "already-picked — the result-diversification pass retrieval " +
        "stacks run after ANN. The greedy is UNROLLED into 5 " +
        "relational rounds (the graph_shortest_path trick): each " +
        "round is a left-anti against the picked set, a max-sim " +
        "equi-join over the bounded 20×20 similarity table, and a " +
        "TakeOrderedAndProject argmax — no driver loop over data, no " +
        "fold state, and the 400-row sim table rides one broadcast. " +
        "Cosines replay in DuckDB via the same sequential fold, so " +
        "every greedy comparison is over identical doubles.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        val cands = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
          .withColumn("rel", VectorOps.cosine(col("embedding"), col("qe")))
          .orderBy(col("rel").desc, col("vec_id")).limit(20)
          .select(col("vec_id").as("id"), col("embedding").as("emb"), col("rel"))
          .transform(Skew.cut)
        val sims = cands.as("x").join(cands.as("y"), col("x.id") =!= col("y.id"))
          .select(col("x.id").as("i"), col("y.id").as("j"),
            VectorOps.cosine(col("x.emb"), col("y.emb")).as("sim"))
          .transform(Skew.cut)
        var sel = cands.orderBy(col("rel").desc, col("id")).limit(1)
          .select(lit(1).as("rank"), col("id"), col("rel"),
            (lit(0.7) * col("rel")).as("score"))
        for (r <- 2 to 5) {
          val selIds = sel.select(col("id").as("sid"))
          val ms = sims.join(broadcast(selIds), col("j") === col("sid"))
            .groupBy("i").agg(max("sim").as("msim"))
          val pick = cands
            .join(broadcast(selIds), cands("id") === selIds("sid"), "left_anti")
            .join(broadcast(ms), cands("id") === ms("i"), "left")
            .withColumn("score",
              lit(0.7) * col("rel") - lit(0.3) * coalesce(col("msim"), lit(0.0)))
            .orderBy(col("score").desc, col("id")).limit(1)
            .select(lit(r).as("rank"), col("id"), col("rel"), col("score"))
          // r18: cut the ≤5-row selection each round — sel feeds two
          // consumers per round (anti-join + max-sim), so the uncut
          // union chain expanded the final plan into 322 scans of the
          // cands/sims checkpoints (plans/r18/sim_mmr_rerank_before
          // .txt); four tiny materializations collapse it to linear
          sel = Skew.cut(sel.unionByName(pick))
        }
        sel.select(col("rank"), col("id").as("vec_id"),
            round(col("rel"), 6).as("rel"), round(col("score"), 6).as("mmr_score"))
          .orderBy("rank")
      },
      Some {
        val rounds = (2 to 5).map { r =>
          val prevSel = (1 until r).map(k => s"SELECT id FROM p$k").mkString(" UNION ALL ")
          s"""p$r AS (SELECT $r AS rank, c.id, c.rel,
              CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE)
                * coalesce(m.msim, CAST(0 AS DOUBLE)) AS score
            FROM cands c
            LEFT JOIN (SELECT i, max(sim) AS msim FROM sims
              WHERE j IN ($prevSel) GROUP BY i) m ON m.i = c.id
            WHERE c.id NOT IN ($prevSel)
            ORDER BY score DESC, c.id LIMIT 1)"""
        }.mkString(",\n")
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          cands AS (SELECT vec_id AS id, embedding AS emb,
              ${VectorOps.duckCosine("embedding", "qe")} AS rel
            FROM embeddings, q WHERE vec_id != 0
            ORDER BY rel DESC, vec_id LIMIT 20),
          sims AS (SELECT x.id AS i, y.id AS j,
              ${VectorOps.duckCosine("x.emb", "y.emb")} AS sim
            FROM cands x JOIN cands y ON x.id != y.id),
          p1 AS (SELECT 1 AS rank, id, rel,
              CAST(0.7 AS DOUBLE) * rel AS score
            FROM cands ORDER BY rel DESC, id LIMIT 1),
          $rounds
          SELECT rank, id AS vec_id, round(rel, 6) AS rel,
            round(score, 6) AS mmr_score
          FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
            UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
            UNION ALL SELECT * FROM p5)
          ORDER BY rank"""
      }),

    Q(
      "sim_triplet_mining",
      "Triplet mining for metric learning: for each of 10 anchors, " +
        "the nearest SAME-label vector (positive) and the hardest " +
        "DIFFERENT-label vector (negative), with the triplet margin " +
        "cos_pos − cos_neg — the (a, p, n) batches a contrastive " +
        "trainer consumes, completing sim_hard_negatives with the " +
        "positive side. Two label-predicated broadcast joins, each " +
        "ranked rank-1 inside WindowGroupLimit, stitched on the " +
        "anchor key; at corpus scale the candidate sides come " +
        "pre-bucketed from ANN, same dataflow.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val anchors = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("embedding").as("qe"))
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
        def rank1(joinCond: Column, outId: String, outCos: String) =
          e.join(broadcast(anchors), joinCond)
            .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1)
            .select(col("qid"), col("vec_id").as(outId),
              col("cos").as(outCos))
        val pos = rank1(col("label") === col("qlabel")
          && col("vec_id") =!= col("qid"), "pos_id", "cos_pos")
        val neg = rank1(col("label") =!= col("qlabel"), "neg_id", "cos_neg")
        pos.join(neg, "qid")
          .select(col("qid").as("anchor"), col("pos_id"), col("neg_id"),
            round(col("cos_pos"), 6).as("cos_pos"),
            round(col("cos_neg"), 6).as("cos_neg"),
            round(col("cos_pos") - col("cos_neg"), 6).as("margin"))
          .orderBy("anchor")
      },
      Some(s"""WITH anchors AS (SELECT vec_id AS qid, label AS qlabel,
            embedding AS qe FROM embeddings WHERE vec_id < 10),
        pos AS (SELECT qid, vec_id AS pos_id, cos AS cos_pos FROM (
          SELECT a.qid, e.vec_id,
            ${VectorOps.duckCosine("e.embedding", "a.qe")} AS cos,
            row_number() OVER (PARTITION BY a.qid
              ORDER BY ${VectorOps.duckCosine("e.embedding", "a.qe")} DESC,
                e.vec_id) AS rk
          FROM embeddings e JOIN anchors a
            ON e.label = a.qlabel AND e.vec_id != a.qid) WHERE rk = 1),
        neg AS (SELECT qid, vec_id AS neg_id, cos AS cos_neg FROM (
          SELECT a.qid, e.vec_id,
            ${VectorOps.duckCosine("e.embedding", "a.qe")} AS cos,
            row_number() OVER (PARTITION BY a.qid
              ORDER BY ${VectorOps.duckCosine("e.embedding", "a.qe")} DESC,
                e.vec_id) AS rk
          FROM embeddings e JOIN anchors a
            ON e.label != a.qlabel) WHERE rk = 1)
        SELECT qid AS anchor, pos_id, neg_id,
          round(cos_pos, 6) AS cos_pos, round(cos_neg, 6) AS cos_neg,
          round(cos_pos - cos_neg, 6) AS margin
        FROM pos JOIN neg USING (qid) ORDER BY anchor""")),

    Q(
      "sim_multiprobe_lsh",
      "Multi-probe hyperplane LSH: each of 5 query vectors probes its " +
        "own band bucket PLUS the four Hamming-1 neighbor buckets per " +
        "band (one sign-bit flip each) — the recall lever that avoids " +
        "adding more hash tables (Lv et al.): a near neighbor that " +
        "fell one bit away in every band is still found. 20 probe " +
        "keys per query explode from the signature (no re-hash), " +
        "candidates come from the same (band, bucket) equi-join as " +
        "dedup_embedding_lsh, dedupe on ids via max(cos) of " +
        "bit-identical scores, top-3 per query under " +
        "WindowGroupLimit. Fixed-seed planes → the oracle replays " +
        "every projection, flip, probe, and score.",
      (s, dir) => {
        val banded = Dedup.hyperplaneBanded(Tables.t(s, dir, "embeddings"))
        val probes = banded.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("band"),
            explode(array(col("bucket"), col("bucket").bitwiseXOR(1),
              col("bucket").bitwiseXOR(2), col("bucket").bitwiseXOR(4),
              col("bucket").bitwiseXOR(8))).as("bucket"))
        val scored = probes.join(banded, Seq("band", "bucket"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosine(col("embedding"), col("qe")).as("cos"))
          .groupBy("qid", "vec_id").agg(max("cos").as("cos"))
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
        val wc = Window.partitionBy("qid")
        scored
          .withColumn("n_cand", count(lit(1)).over(wc))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("rk"), col("vec_id"),
            round(col("cos"), 6).as("cos_sim"), col("n_cand"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH ${Dedup.hyperplaneBandedCtes},
        probes AS (
          SELECT b.vec_id AS qid, b.embedding AS qe, b.band,
            unnest([b.bucket, xor(b.bucket, 1), xor(b.bucket, 2),
              xor(b.bucket, 4), xor(b.bucket, 8)]) AS bucket
          FROM banded b WHERE b.vec_id < 5),
        scored AS (
          SELECT qid, vec_id, max(cos) AS cos FROM (
            SELECT p.qid, c.vec_id,
              ${VectorOps.duckCosine("c.embedding", "p.qe")} AS cos
            FROM probes p JOIN banded c
              ON c.band = p.band AND c.bucket = p.bucket
            WHERE c.vec_id != p.qid)
          GROUP BY 1, 2),
        ranked AS (
          SELECT qid, vec_id, cos,
            CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS n_cand,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, vec_id) AS INT) AS rk
          FROM scored)
        SELECT qid, rk, vec_id, round(cos, 6) AS cos_sim, n_cand
        FROM ranked WHERE rk <= 3 ORDER BY qid, rk""")),

    Q(
      "sim_sq8_rerank",
      "Scalar-quantization (int8) retrieval with exact rerank — the " +
        "FAISS-SQ8 shape: per-dimension [min, max] over the corpus " +
        "(a 64-row aggregate packed into ONE broadcast row), each " +
        "float mapped to round(255·(x−lo)/(hi−lo)), candidates " +
        "ranked by the dot product of DEQUANTIZED codes (4× smaller " +
        "scan at serving time), top-20 reranked by exact cosine for " +
        "the final 10. Quantization, dequantization, and both score " +
        "folds replay in DuckDB over identical doubles — the " +
        "compression error itself is oracle-checked, not just the " +
        "pipeline.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val dimStats = e
          .select(posexplode(col("embedding")).as(Seq("d", "x")))
          .groupBy("d").agg(min(col("x").cast("double")).as("lo"),
            max(col("x").cast("double")).as("hi"))
          .agg(sort_array(collect_list(struct(col("d"), col("lo"), col("hi"))))
            .as("st"))
        val withQ = e.crossJoin(broadcast(dimStats))
          .withColumn("dq", expr(
            """transform(embedding, (x, i) ->
              st[i].lo + CASE WHEN st[i].hi = st[i].lo THEN CAST(0.0 AS DOUBLE)
                ELSE round(255.0 * (CAST(x AS DOUBLE) - st[i].lo)
                  / (st[i].hi - st[i].lo))
                  * (st[i].hi - st[i].lo) / 255.0 END)"""))
          .select(col("vec_id"), col("embedding"), col("dq"))
        val q = withQ.filter(col("vec_id") === 0)
          .select(col("dq").as("qdq"), col("embedding").as("qe"))
        val approx = withQ.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("adot", expr(
            """aggregate(zip_with(dq, qdq, (a, b) -> a * b),
              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""))
          .orderBy(col("adot").desc, col("vec_id")).limit(20)
        approx
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), round(col("adot"), 4).as("approx_dot"),
            round(col("cos"), 6).as("cos_sim"))
      },
      Some(s"""WITH ds AS (
          SELECT u.d AS d, min(CAST(u.x AS DOUBLE)) AS lo,
            max(CAST(u.x AS DOUBLE)) AS hi
          FROM (SELECT unnest(list_transform(embedding,
              (x, i) -> struct_pack(d := i, x := x))) AS u
            FROM embeddings)
          GROUP BY u.d),
        st AS (SELECT list(struct_pack(d := d, lo := lo, hi := hi)
            ORDER BY d) AS st FROM ds),
        withq AS (
          SELECT vec_id, embedding,
            list_transform(embedding, (x, i) ->
              st[i].lo + CASE WHEN st[i].hi = st[i].lo THEN CAST(0.0 AS DOUBLE)
                ELSE round(255.0 * (CAST(x AS DOUBLE) - st[i].lo)
                  / (st[i].hi - st[i].lo))
                  * (st[i].hi - st[i].lo) / 255.0 END) AS dq
          FROM embeddings, st),
        q AS (SELECT dq AS qdq, embedding AS qe FROM withq WHERE vec_id = 0),
        approx AS (
          SELECT w.vec_id, w.embedding, q.qe,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(1, 65),
                i -> w.dq[CAST(i AS INT)] * q.qdq[CAST(i AS INT)])),
              (acc, v) -> acc + v) AS adot
          FROM withq w, q WHERE w.vec_id != 0
          ORDER BY adot DESC, w.vec_id LIMIT 20)
        SELECT vec_id, round(adot, 4) AS approx_dot,
          round(${VectorOps.duckCosine("embedding", "qe")}, 6) AS cos_sim
        FROM approx
        ORDER BY ${VectorOps.duckCosine("embedding", "qe")} DESC, vec_id
        LIMIT 10""")),

    Q(
      "sim_prefix_rerank",
      "Two-stage retrieval with a truncated-dimension coarse pass " +
        "(the Matryoshka-embedding serving pattern): stage 1 scores " +
        "every corpus vector by the 8-dim PREFIX dot product — 1/8th " +
        "the FLOPs and memory traffic of the full vector — and keeps " +
        "the top-20 via TakeOrderedAndProject; stage 2 reranks only " +
        "those 20 candidates by exact full-dim cosine for the final " +
        "top-5. Both scores are sequential double folds (VecDot ≡ " +
        "list_reduce), so ordering is bit-identical to the oracle; " +
        "ties break on vec_id. At scale stage 1 is the only corpus " +
        "scan, and a prefix-dim index (or IVF over prefixes) drops it " +
        "below linear.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        val cand = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("coarse",
            VectorOps.dot(slice(col("embedding"), 1, 8), slice(col("qe"), 1, 8)))
          .orderBy(col("coarse").desc, col("vec_id"))
          .limit(20)
        cand
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(5)
          .select(col("vec_id"), round(col("coarse"), 6).as("coarse_dot"),
            round(col("cos"), 6).as("cos_sim"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        sc AS (SELECT vec_id, embedding, qe,
            ${VectorOps.duckDot("embedding", "qe", 8)} AS coarse
          FROM embeddings, q WHERE vec_id != 0),
        cand AS (SELECT * FROM sc ORDER BY coarse DESC, vec_id LIMIT 20),
        r AS (SELECT vec_id, coarse,
            ${VectorOps.duckCosine("embedding", "qe")} AS cos
          FROM cand)
        SELECT vec_id, round(coarse, 6) AS coarse_dot, round(cos, 6) AS cos_sim
        FROM r ORDER BY cos DESC, vec_id LIMIT 5""")),

    Q(
      "sim_recall_eval",
      "Retrieval-quality evaluation: recall@10 of the 8-dim prefix " +
        "coarse ranking against exact full-dim cosine for query 0 — " +
        "the measure-your-ANN harness every similarity deployment " +
        "needs before trusting an approximate index. Two " +
        "TakeOrderedAndProject top-10s off one broadcast corpus scan, " +
        "a left-semi join of the two 10-row id sets, and an exact " +
        "integer overlap count.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        val base = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        val exact = base
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id")).limit(10).select("vec_id")
        val approx = base
          .withColumn("coarse",
            VectorOps.dot(slice(col("embedding"), 1, 8), slice(col("qe"), 1, 8)))
          .orderBy(col("coarse").desc, col("vec_id")).limit(10).select("vec_id")
        exact.join(approx, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_overlap"))
          .select(col("n_overlap"),
            round(col("n_overlap") / lit(10.0), 2).as("recall_at_10"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        ex AS (SELECT vec_id FROM (
            SELECT vec_id, ${VectorOps.duckCosine("embedding", "qe")} AS cos
            FROM embeddings, q WHERE vec_id != 0)
          ORDER BY cos DESC, vec_id LIMIT 10),
        ap AS (SELECT vec_id FROM (
            SELECT vec_id, ${VectorOps.duckDot("embedding", "qe", 8)} AS coarse
            FROM embeddings, q WHERE vec_id != 0)
          ORDER BY coarse DESC, vec_id LIMIT 10)
        SELECT CAST(count(*) AS BIGINT) AS n_overlap,
          round(count(*) / 10.0, 2) AS recall_at_10
        FROM ex JOIN ap USING (vec_id)""")),

    Q(
      "sim_centroid_drift",
      "Embedding-distribution drift monitor: per label, the cosine " +
        "between the centroid of the reference half and the current " +
        "half of the corpus (deterministic halves by vec_id parity " +
        "here; snapshot ids in production). Cosine is scale-invariant, " +
        "so per-dimension SUMS stand in for means — one explode to " +
        "(label, half, dim), a per-cell sorted-fold sum, a self-join " +
        "on (label, dim), and three more 64-element sorted folds for " +
        "dot and norms, keeping every float sum bit-identical under " +
        "any partial-aggregation order. A centroid_cos well below 1 " +
        "means the embedding distribution moved — retrain or " +
        "re-index. (At 100 TB swap the per-cell collect for plain " +
        "sums and an approximate-tolerance compare.)",
      (s, dir) => {
        def foldSum(c: Column): Column =
          aggregate(sort_array(collect_list(c)), lit(0.0), (a, x) => a + x)
        val x = Tables.t(s, dir, "embeddings")
          .select(col("label"), (col("vec_id") % 2 === 0).as("ref"),
            posexplode(col("embedding")))
          .select(col("label"), col("ref"), col("pos"),
            col("col").cast("double").as("v"))
        val sums = x.groupBy("label", "ref", "pos").agg(foldSum(col("v")).as("sv"))
        val a = sums.filter(col("ref"))
          .select(col("label"), col("pos"), col("sv").as("av"))
        val b = sums.filter(!col("ref"))
          .select(col("label"), col("pos"), col("sv").as("bv"))
        a.join(b, Seq("label", "pos"))
          .groupBy("label")
          .agg(foldSum(col("av") * col("bv")).as("dot"),
            foldSum(col("av") * col("av")).as("na"),
            foldSum(col("bv") * col("bv")).as("nb"))
          .select(col("label"),
            round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 4)
              .as("centroid_cos"))
          .orderBy("label")
      },
      Some("""WITH x AS (SELECT label, vec_id % 2 = 0 AS ref, i - 1 AS pos,
            CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, unnest(range(1, 65)) AS t(i)),
        s AS (SELECT label, ref, pos,
            list_reduce(list_sort(list(v)), (a, b) -> a + b) AS sv
          FROM x GROUP BY 1, 2, 3),
        j AS (SELECT a.label, a.pos, a.sv AS av, b.sv AS bv
          FROM s a JOIN s b ON a.label = b.label AND a.pos = b.pos
            AND a.ref AND NOT b.ref)
        SELECT label,
          round(list_reduce(list_sort(list(av * bv)), (a, b) -> a + b) /
            (sqrt(list_reduce(list_sort(list(av * av)), (a, b) -> a + b)) *
             sqrt(list_reduce(list_sort(list(bv * bv)), (a, b) -> a + b))), 4)
            AS centroid_cos
        FROM j GROUP BY label ORDER BY label""")),

    Q(
      "sim_topk_cosine",
      "Brute-force cosine top-k against a query vector (vec_id 0): " +
        "broadcast the 1-row query side, HOF double-precision dot per " +
        "row, TakeOrderedAndProject for the top 10. Ordering is on the " +
        "raw cosine, which is bit-identical to the oracle's (same fold).",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        sc AS (SELECT vec_id, ${VectorOps.duckCosine("embedding", "qe")} AS cos
          FROM embeddings, q WHERE vec_id != 0)
        SELECT vec_id, round(cos, 6) AS cos_sim FROM sc
        ORDER BY cos DESC, vec_id LIMIT 10""")),

    Q(
      "sim_knn_per_label",
      "kNN join per group: top-3 same-label neighbors for each of 5 " +
        "query vectors — broadcast queries, label equi-join prunes the " +
        "candidate space (the blocked-join shape; at scale the block key " +
        "comes from LSH/IVF instead of a given label).",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("embedding").as("qe"))
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
        e.join(broadcast(qs), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos_sim"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH qs AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
        sc AS (SELECT qid, vec_id, ${VectorOps.duckCosine("embedding", "qe")} AS cos
          FROM embeddings JOIN qs ON label = qlabel AND vec_id != qid),
        rk AS (SELECT qid, vec_id, cos,
            CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rk
          FROM sc)
        SELECT qid, rk, vec_id, round(cos, 6) AS cos_sim FROM rk
        WHERE rk <= 3 ORDER BY qid, rk""")),

    Q(
      "sim_hard_negatives",
      "Hard-negative mining for contrastive training (the retrieval-" +
        "training counterpart of sim_knn_per_label): for each of 5 " +
        "anchor vectors, the top-5 most-similar vectors with a " +
        "DIFFERENT label — the negatives that sit closest to the " +
        "decision boundary and carry the most gradient signal. " +
        "Broadcast anchors, different-label predicate on the join, " +
        "exact cosine, per-anchor row_number ≤ 5 (WindowGroupLimit — " +
        "no global sort). At corpus scale the candidate side would be " +
        "pre-bucketed by ANN (sim_ann_ivf) instead of scanned; the " +
        "ranking dataflow is identical.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("embedding").as("qe"))
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
        e.join(broadcast(qs), col("label") =!= col("qlabel"))
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("rk"), col("vec_id"), col("label"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH qs AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
        sc AS (SELECT qid, vec_id, label, ${VectorOps.duckCosine("embedding", "qe")} AS cos
          FROM embeddings JOIN qs ON label != qlabel),
        rk AS (SELECT qid, vec_id, label, cos,
            CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rk
          FROM sc)
        SELECT qid, rk, vec_id, label, round(cos, 6) AS cos_sim FROM rk
        WHERE rk <= 5 ORDER BY qid, rk""")),

    Q(
      "sim_knn_graph",
      "Full kNN-graph construction: every vector's top-3 cosine " +
        "neighbors, candidates restricted to LSH bucket co-occupants " +
        "(the shared Dedup.embeddingLshScored stage — 4 bands of " +
        "ADAPTIVE-width fixed-seed hyperplane bits, clamp(ceil(log2(" +
        "N/125)), 4, 8) per band, never all-pairs). Scored v1<v2 " +
        "pairs are symmetrized (an edge serves both endpoints) and " +
        "ranked per node with row_number ≤ 3 — the WindowGroupLimit " +
        "top-k-per-group shape, so the full-sort never happens. This " +
        "graph is the input to graph-based curation (SemDeDup-style " +
        "cluster pruning, kNN-classifier quality scoring). FULLY " +
        "oracle-checked: the oracle inlines the identical hyperplane " +
        "literals and replays bucketing, pairing, the exact cosine " +
        "fold, and the (cos DESC, dst) rank. A node whose buckets " +
        "yield <3 candidates contributes fewer rows (recall is the " +
        "LSH tradeoff; the bound is spec-pinned for dedup_embedding_" +
        "lsh and shared here).",
      (s, dir) => {
        val scored = Dedup.embeddingLshScored(Tables.t(s, dir, "embeddings"))
        // both edge directions from ONE generator over the scored
        // pairs — a self-union would execute the whole bucket-join
        // candidate stage twice
        val sym = scored.select(explode(array(
            struct(col("v1").as("src"), col("v2").as("dst"), col("cos")),
            struct(col("v2").as("src"), col("v1").as("dst"), col("cos")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.cos").as("cos"))
        val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
        sym.withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select(col("src"), col("rk"), col("dst"), round(col("cos"), 6).as("cos_sim"))
          .orderBy("src", "rk")
      },
      Some(s"""WITH ${Dedup.embeddingLshScoredCtes},
        sym AS (
          SELECT v1 AS src, v2 AS dst, cos FROM scored
          UNION ALL
          SELECT v2 AS src, v1 AS dst, cos FROM scored),
        rk AS (
          SELECT src, dst, cos,
            CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS INT) AS rk
          FROM sym)
        SELECT src, rk, dst, round(cos, 6) AS cos_sim FROM rk
        WHERE rk <= 3 ORDER BY src, rk""")),

    Q(
      "sim_vector_mean",
      "Per-label centroid via the custom typed Aggregator (double " +
        "accumulator, map-side partial aggregation); flattened to " +
        "(label, dim, mean) rows and rounded post-aggregate.",
      (s, dir) => {
        val vm = udaf(VectorMean)
        val e = Tables.t(s, dir, "embeddings")
        e.groupBy("label")
          .agg(vm(col("embedding")).as("mean_vec"))
          .select(col("label"), posexplode(col("mean_vec")))
          .select(col("label"), col("pos").cast("int").as("dim"), round(col("col"), 4).as("mean_val"))
          .orderBy("label", "dim")
      },
      Some("""WITH x AS (SELECT label, CAST(i AS INT) - 1 AS dim,
          CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        FROM embeddings, range(1, 65) r(i))
        SELECT label, dim, round(avg(v), 4) AS mean_val FROM x
        GROUP BY label, dim ORDER BY label, dim""")),

    Q(
      "sim_quantized_topk",
      "Scalar-quantized (int8-range) top-k with exact re-ranking: " +
        "per-vector symmetric quantization floor(x·127/max|x| + 0.5) — " +
        "floor form so both engines round identically — integer dot " +
        "through the codegen'd VecDot (values ≤127 are exact in " +
        "float32), top-30 candidates by approximate score, exact-cosine " +
        "re-rank to top-10. The 100 TB story: 4× smaller vectors in the " +
        "scan and a cheap integer hot loop, exactness restored by the " +
        "re-rank; integer dots are bit-exact in both engines so the " +
        "candidate cut is oracle-deterministic.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val maxAbs = aggregate(col("embedding"), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double"))))
        val quant = e
          .select(col("vec_id"), col("embedding"), (lit(127.0) / maxAbs).as("sc"))
          .withColumn("qv", transform(col("embedding"),
            x => floor(x.cast("double") * col("sc") + 0.5).cast("float")))
        val q = quant.filter(col("vec_id") === 0)
          .select(col("qv").as("qqv"), col("sc").as("qsc"), col("embedding").as("qe"))
        val cand = quant.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("approx",
            graft.expr.VecDot.vecDot(col("qv"), col("qqv")) / (col("sc") * col("qsc")))
          .orderBy(col("approx").desc, col("vec_id"))
          .limit(30)
        cand
          .withColumn("cos_sim", round(VectorOps.cosine(col("embedding"), col("qe")), 6))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("cos_sim"))
      },
      Some(s"""WITH s AS (SELECT vec_id, embedding,
          127.0 / list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), (a, b) -> greatest(a, b)) AS sc
        FROM embeddings),
        qz AS (SELECT vec_id, embedding, sc,
          list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * sc + 0.5)) AS qv FROM s),
        q0 AS (SELECT qv AS qqv, sc AS qsc, embedding AS qe FROM qz WHERE vec_id = 0),
        appr AS (SELECT vec_id, embedding, qe,
            list_reduce(list_transform(range(1, 65), i -> qv[CAST(i AS INT)] * qqv[CAST(i AS INT)]), (x, y) -> x + y) / (sc * qsc) AS approx
          FROM qz, q0 WHERE vec_id != 0),
        cand AS (SELECT vec_id, embedding, qe FROM appr ORDER BY approx DESC, vec_id LIMIT 30)
        SELECT vec_id, round(${VectorOps.duckCosine("embedding", "qe")}, 6) AS cos_sim
        FROM cand ORDER BY cos_sim DESC, vec_id LIMIT 10""")),

    Q(
      "sim_ann_ivf",
      "IVF approximate nearest neighbor: centroids built by 2 Lloyd " +
        "k-means iterations (all DataFrame ops — per-row packed-" +
        "centroid assignment fold + VectorMean update, nothing " +
        "collected, zero corpus shuffle); every vector is assigned to " +
        "its nearest centroid in the scan; the query probes its 2 " +
        "closest centroids and ranks only those buckets — at 100 TB " +
        "this reads a fraction of the corpus instead of all of it. " +
        "Approximate → no SQL oracle; ScalaTest checks recall vs " +
        "sim_topk_cosine; the assignment dataflow is oracle-checked " +
        "by sim_ivf_assign.",
      (s, dir) => annIvf(s, dir, queryVecId = 0, nProbe = 2, topK = 10),
      None),

    Q(
      "sim_ivf_assign",
      "The IVF ASSIGN operator, oracle-checked end to end: every " +
        "vector gets the id of its nearest centroid by exact double-" +
        "precision cosine (the same sequential VecDot fold as the " +
        "oracle's list_reduce — bit-identical) with (cos DESC, cid) " +
        "tie-breaks. The centroid set here is the deterministic " +
        "first-8-vectors book, so DuckDB can replay the whole " +
        "assignment — this pins the deterministic half of sim_ann_ivf " +
        "(assignment + argmax + tie-breaks), leaving only the float " +
        "Lloyd training loop rows-only; the shuffle-free packed-" +
        "centroid fold is the exact shape annIvf and every Lloyd " +
        "iteration use at any scale.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val packed = packCentroids(
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce")))
        e.crossJoin(broadcast(packed))
          .select(col("vec_id"),
            nearestByCosine(col("embedding"), col("cs")).as("best"))
          .select(col("vec_id"),
            col("best.c.cid").as("cid"),
            round(col("best.d"), 6).as("cos_sim"))
          .orderBy("vec_id")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        sc AS (
          SELECT e.vec_id, c.cid,
            ${VectorOps.duckCosine("e.embedding", "c.ce")} AS cos
          FROM embeddings e CROSS JOIN cents c),
        rk AS (
          SELECT vec_id, cid, cos,
            row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
          FROM sc)
        SELECT vec_id, cid, round(cos, 6) AS cos_sim
        FROM rk WHERE rn = 1 ORDER BY vec_id""")),

    Q(
      "sim_index_serve",
      "Persisted-index SERVING — the train-once/serve-many lifecycle a " +
        "production ANN deployment runs, where sim_ann_ivf rebuilds " +
        "its index per query: the centroid book (deterministic " +
        "first-8-vectors book, so DuckDB replays everything) is " +
        "written ONCE as a parquet artifact, and the serving path " +
        "reads the PERSISTED book — corpus assignment, per-query " +
        "2-probe selection, and in-bucket exact-cosine top-3 all hang " +
        "off the loaded artifact, never the build lineage (SimSpec " +
        "pins serve-twice equality off one store). At 100 TB the " +
        "store is the catalog-managed index table; probes broadcast " +
        "the k-row book, assignment is the shuffle-free packed-" +
        "centroid fold, candidates come from a broadcast semi-join " +
        "on cid — one corpus scan per serve batch.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        // BUILD once per process: the book is the persisted index artifact
        val idx = graft.Scratch.once(s"sim_index_book:$dir") { p =>
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce"))
            .write.mode("overwrite").parquet(p)
        }
        // SERVE: everything below reads the persisted artifact
        val book = s.read.parquet(idx)
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val wp = Window.partitionBy("qid").orderBy(col("qcos").desc, col("cid"))
        val probes = queries.crossJoin(broadcast(book))
          .withColumn("qcos", VectorOps.cosine(col("ce"), col("qe")))
          .withColumn("rn", row_number().over(wp))
          .filter(col("rn") <= 2)
          .select(col("qid"), col("cid"))
        val assigned = e.crossJoin(broadcast(packCentroids(book)))
          .select(col("vec_id"), col("embedding"),
            nearestByCosine(col("embedding"), col("cs"))
              .getField("c").getField("cid").as("cid"))
        val wr = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
        assigned.join(broadcast(probes), "cid")
          .join(broadcast(queries), "qid")
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
          .withColumn("rank", row_number().over(wr).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank"), col("vec_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("qid", "rank")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        queries AS (SELECT vec_id AS qid, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
        probes AS (
          SELECT qid, cid FROM (
            SELECT q.qid, c.cid,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${VectorOps.duckCosine("c.ce", "q.qe")} DESC, c.cid) AS rn
            FROM queries q CROSS JOIN cents c)
          WHERE rn <= 2),
        assigned AS (
          SELECT vec_id, embedding, cid FROM (
            SELECT e.vec_id, e.embedding, c.cid,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${VectorOps.duckCosine("e.embedding", "c.ce")} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1),
        cands AS (
          SELECT q.qid, a.vec_id,
            ${VectorOps.duckCosine("a.embedding", "q.qe")} AS cos
          FROM probes p
          JOIN assigned a ON a.cid = p.cid
          JOIN queries q ON q.qid = p.qid
          WHERE a.vec_id <> q.qid),
        ranked AS (
          SELECT qid, vec_id, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
          FROM cands)
        SELECT qid, rank, vec_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 3 ORDER BY qid, rank""")),

    Q(
      "sim_index_incremental",
      "Persisted-index INCREMENTAL ingestion — the second half of the " +
        "lifecycle: a NEW embedding batch (vec_id % 10 ∈ {8,9}, the " +
        "continuous-ingestion 20%) is assigned to the centroids loaded " +
        "from the SAME parquet artifact sim_index_serve persists, " +
        "WITHOUT retraining — the embedding-space mirror of " +
        "dedup_incremental_minhash's persisted band store. Assignment " +
        "is the per-row packed-centroid fold over the broadcast book " +
        "(exact double cosine, (cos DESC, cid) tie-breaks — the same " +
        "rank-1 argmax the oracle replays), so ingesting a batch " +
        "costs one scan of the BATCH, zero touches of the historical " +
        "corpus.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        // the SAME artifact sim_index_serve persists (shared memo key)
        val idx = graft.Scratch.once(s"sim_index_book:$dir") { p =>
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce"))
            .write.mode("overwrite").parquet(p)
        }
        val book = s.read.parquet(idx)
        val batch = e.filter(pmod(col("vec_id"), lit(10)) >= 8)
        batch.crossJoin(broadcast(packCentroids(book)))
          .select(col("vec_id"),
            nearestByCosine(col("embedding"), col("cs")).as("best"))
          .select(col("vec_id"),
            col("best.c.cid").as("cid"),
            round(col("best.d"), 6).as("cos_sim"))
          .orderBy("vec_id")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        sc AS (
          SELECT e.vec_id, c.cid,
            ${VectorOps.duckCosine("e.embedding", "c.ce")} AS cos
          FROM embeddings e CROSS JOIN cents c
          WHERE e.vec_id % 10 >= 8),
        rk AS (
          SELECT vec_id, cid, cos,
            row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
          FROM sc)
        SELECT vec_id, cid, round(cos, 6) AS cos_sim
        FROM rk WHERE rn = 1 ORDER BY vec_id""")),

    Q(
      "sim_index_rebuild_plan",
      "Index MAINTENANCE decision — the third act of the persisted-" +
        "index lifecycle (train → serve → decide rebuild vs keep): " +
        "the corpus is assigned against the PERSISTED centroid book " +
        "(same parquet artifact sim_index_serve writes), and each " +
        "list's health is scored by (a) centroid drift — cosine " +
        "between the stored centroid and its current members' mean " +
        "(scale-invariant, so per-dimension member SUMS suffice; " +
        "8×64 cells, every float sum a sorted fold) — and (b) " +
        "imbalance k·size/n, the probe-fan-out bound sim_ivf_balance " +
        "monitors. Verdict per list: drift below 0.98 → 'retrain', " +
        "fan-out above 2× even → 'split', else 'keep' — the plan a " +
        "production pipeline turns into rebuild jobs instead of " +
        "blindly retraining the whole 100 TB index. One corpus scan " +
        "(shuffle-free packed-centroid fold), k-row everything after.",
      (s, dir) => {
        def foldSum(c: Column): Column =
          aggregate(sort_array(collect_list(c)), lit(0.0), (a, x) => a + x)
        val e = Tables.t(s, dir, "embeddings")
        val idx = graft.Scratch.once(s"sim_index_book:$dir") { p =>
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce"))
            .write.mode("overwrite").parquet(p)
        }
        val book = s.read.parquet(idx)
        val assigned = e.crossJoin(broadcast(packCentroids(book)))
          .select(col("vec_id"), col("embedding"),
            nearestByCosine(col("embedding"), col("cs"))
              .getField("c").getField("cid").as("cid"))
        val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("sz"))
        val tot = sizes.agg(sum("sz").as("n"), count(lit(1)).as("k"))
        val cells = assigned
          .select(col("cid"), posexplode(col("embedding")))
          .select(col("cid"), col("pos"), col("col").cast("double").as("v"))
          .groupBy("cid", "pos").agg(foldSum(col("v")).as("mv"))
        val bookCells = book
          .select(col("cid"), posexplode(col("ce")))
          .select(col("cid"), col("pos"), col("col").cast("double").as("cv"))
        val drift = cells.join(bookCells, Seq("cid", "pos"))
          .groupBy("cid")
          .agg(foldSum(col("mv") * col("cv")).as("dot"),
            foldSum(col("mv") * col("mv")).as("nm"),
            foldSum(col("cv") * col("cv")).as("nc"))
          .select(col("cid"),
            (col("dot") / (sqrt(col("nm")) * sqrt(col("nc")))).as("ccos"))
        sizes.join(drift, Seq("cid")).crossJoin(broadcast(tot))
          .withColumn("fanout",
            col("k").cast("double") * col("sz") / col("n").cast("double"))
          .select(col("cid"), col("sz").as("list_size"),
            round(col("ccos"), 4).as("centroid_cos"),
            round(col("fanout"), 4).as("imbalance"),
            when(col("ccos") < 0.98, "retrain")
              .when(col("fanout") > 2.0, "split")
              .otherwise("keep").as("action"))
          .orderBy("cid")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        sc AS (
          SELECT e.vec_id, e.embedding, c.cid,
            ${VectorOps.duckCosine("e.embedding", "c.ce")} AS cos
          FROM embeddings e CROSS JOIN cents c),
        assigned AS (
          SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
            FROM sc)
          WHERE rn = 1),
        sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
          FROM assigned GROUP BY 1),
        tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n, count(*) AS k FROM sizes),
        cells AS (SELECT cid, i - 1 AS pos,
            list_reduce(list_sort(list(CAST(embedding[CAST(i AS INT)] AS DOUBLE))),
              (a, b) -> a + b) AS mv
          FROM assigned, unnest(range(1, 65)) AS t(i)
          GROUP BY 1, 2),
        bk AS (SELECT cid, i - 1 AS pos,
            CAST(ce[CAST(i AS INT)] AS DOUBLE) AS cv
          FROM cents, unnest(range(1, 65)) AS t(i)),
        drift AS (SELECT cells.cid,
            list_reduce(list_sort(list(mv * cv)), (a, b) -> a + b) /
              (sqrt(list_reduce(list_sort(list(mv * mv)), (a, b) -> a + b)) *
               sqrt(list_reduce(list_sort(list(cv * cv)), (a, b) -> a + b))) AS ccos
          FROM cells JOIN bk ON cells.cid = bk.cid AND cells.pos = bk.pos
          GROUP BY 1)
        SELECT sizes.cid AS cid, sz AS list_size,
          round(ccos, 4) AS centroid_cos,
          round(CAST(k AS DOUBLE) * sz / n, 4) AS imbalance,
          CASE WHEN ccos < 0.98 THEN 'retrain'
            WHEN CAST(k AS DOUBLE) * sz / n > 2.0 THEN 'split'
            ELSE 'keep' END AS action
        FROM sizes JOIN drift ON sizes.cid = drift.cid, tot
        ORDER BY 1""")),

    Q(
      "sim_ann_pq",
      "Product-quantization ANN: the 64-dim space is split into 4 " +
        "subspaces of 16 dims; each subspace gets a 16-codeword L2 " +
        "codebook (2 Lloyd iterations, all DataFrame ops); every vector " +
        "is encoded as 4 small code ids. Query-time asymmetric distance " +
        "(ADC): the 64-row (subspace, code) → distance table is packed " +
        "into ONE broadcast row and the encode + lookup run as a " +
        "per-row fold — candidate distances are Σ of 4 table lookups " +
        "computed in the scan, no row blow-up, no per-vector shuffle — " +
        "then the top-96 candidates are exactly re-ranked. The 100 TB " +
        "story: candidate generation is scan + TakeOrdered, and " +
        "exactness is restored by the re-rank. Codebooks are " +
        "float-iterated → rows-only; ScalaTest " +
        "pins recall vs the exact baseline and encode determinism; the " +
        "encode step itself is oracle-checked by sim_pq_codes.",
      (s, dir) => annPq(s, dir, queryVecId = 0, topK = 10),
      None),

    Q(
      "sim_pq_codes",
      "The PQ ENCODE operator, oracle-checked end to end: every vector " +
        "is assigned, per 16-dim subspace, the id of its nearest " +
        "codeword by exact double-precision L2² (same codegen'd VecDot " +
        "fold as the oracle's list_reduce — bit-identical distances) " +
        "with (distance, id) floor-form tie-breaks. The codebook here " +
        "is the deterministic first-16-subvectors book, so DuckDB can " +
        "replay the whole assignment — this pins the deterministic " +
        "half of sim_ann_pq (encode + argmin + tie-breaks), leaving " +
        "only the float Lloyd training loop rows-only. Same " +
        "WindowGroupLimit argmin shape the encoder uses at any scale.",
      (s, dir) => {
        val subs = pqSubvectors(Tables.t(s, dir, "embeddings"), m = 4, subDim = 16)
        val packed = subs.filter(col("vec_id") < 16)
          .select(col("sub"), col("vec_id").cast("int").as("cid"), col("sv").as("ce"))
          .groupBy("sub")
          .agg(collect_list(struct(col("cid"), col("ce"))).as("cs"))
        // argmin as the per-row nearestByL2 fold over the packed
        // broadcast codebook — the (d, cid) comparison IS the
        // floor-form tie-break the oracle's row_number-rank-1
        // expresses, with no ×k row blow-up and no per-vector shuffle
        subs.join(broadcast(packed), "sub")
          .select(col("vec_id"), col("sub"),
            nearestByL2(col("sv"), col("cs"))
              .getField("c").getField("cid").as("code"))
          .orderBy("vec_id", "sub")
      },
      Some(s"""WITH subs AS (
          SELECT vec_id, s.sub AS sub,
            embedding[(s.sub * 16 + 1):(s.sub * 16 + 16)] AS sv
          FROM embeddings CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS sub) s),
        books AS (
          SELECT sub, CAST(vec_id AS INT) AS code, sv AS ce
          FROM subs WHERE vec_id < 16),
        enc AS (
          SELECT a.vec_id, a.sub, b.code,
            (${VectorOps.duckDot("a.sv", "a.sv", 16)})
              - 2.0 * (${VectorOps.duckDot("a.sv", "b.ce", 16)})
              + (${VectorOps.duckDot("b.ce", "b.ce", 16)}) AS d
          FROM subs a JOIN books b USING (sub)),
        ranked AS (
          SELECT vec_id, sub, code,
            row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
          FROM enc)
        SELECT vec_id, sub, code FROM ranked WHERE rn = 1
        ORDER BY vec_id, sub""")),

    Q(
      "sim_pca_power",
      "Top principal component of the embedding corpus by power " +
        "iteration, entirely as DataFrame ops: center via the " +
        "VectorMean aggregate, then up to 24 rounds (convergence-" +
        "exited on the observed block drift) of v ← normalize(Σᵢ " +
        "(xᵢ·v) xᵢ) — each round one broadcast of the 64-float " +
        "candidate vector and ONE weighted-sum typed aggregate over " +
        "the corpus (VectorWeightedSum folds the xᵢ·v scale into its " +
        "reduce loop — no scaled per-row array copies). Nothing is " +
        "collected; the per-round state is a 1-row DataFrame, " +
        "checkpointed per 4-round block. At 100 TB each round is a " +
        "single scan+agg — the dataflow of distributed Oja/power " +
        "methods. Sign-canonicalized (dominant loading positive); " +
        "float-sum ulp noise → rows-only; spec pins unit norm, " +
        "fixpoint, and variance dominance, and the matmul step " +
        "dataflow is oracle-checked end to end by sim_pca_step.",
      (s, dir) => {
        val vm = udaf(VectorMean)
        val vws = udaf(VectorWeightedSum)
        val e = Tables.t(s, dir, "embeddings")
        val mu = e.agg(vm(col("embedding")).as("mud"))
          .select(transform(col("mud"), d => d.cast("float")).as("mu"))
        val xc = e.crossJoin(broadcast(mu))
          .select(col("vec_id"),
            zip_with(col("embedding"), col("mu"),
              (a, b) => (a - b).cast("float")).as("x"))
          .transform(Skew.cut)
        // Deterministic init: the centered row with the smallest id.
        var v = xc.orderBy("vec_id").limit(1).select(col("x").as("v"))
          .transform(Skew.cut)
        // Convergence-bounded power iteration, max 24 rounds: rounds run
        // in fused 4-round blocks (the broadcast of v forces the whole
        // chain as ONE job, cutting the sequential job count 4×), and
        // each block's checkpoint carries an observe(first(v)) metric —
        // the 64-float state lands on the driver as a job metric (no
        // collect, no extra action). The loop exits once a block's
        // drift ‖v_k − v_{k−4}‖ < 0.12, which maps to a one-step
        // rotation |cos(v, Av)| ≳ 0.9995 — 2.5× inside the spec's 0.998
        // fixpoint tolerance. Convergence goes as (λ2/λ1)^k: the
        // synthetic corpus is near-isotropic (measured drift contracts
        // only ~0.7×/block), so the exit saves one block here; on a
        // real corpus with a dominant direction it fires blocks
        // earlier. Tightening further buys no accuracy the 4dp-rounded
        // output can express.
        var block = 0
        var drift = Double.MaxValue
        var prev: Option[IndexedSeq[Double]] = None
        while (drift >= 0.12 && block < 6) {
          block += 1
          for (_ <- 1 to 4) {
            // y = Σ x(x·v) in ONE typed aggregate (sum ∝ mean: direction
            // identical); the weight folds into the reduce loop instead
            // of materializing a scaled array per row
            v = xc.crossJoin(broadcast(v))
              .agg(vws(col("x"), VectorOps.dot(col("x"), col("v"))).as("vd"))
              .select(col("vd"),
                sqrt(aggregate(col("vd"), lit(0.0), (acc, d) => acc + d * d)).as("nrm"))
              .select(transform(col("vd"), d => (d / col("nrm")).cast("float")).as("v"))
          }
          val obs = new org.apache.spark.sql.Observation(s"pca_block_$block")
          v = v.observe(obs, first(col("v")).as("v")).transform(Skew.cut)
          val cur = obs.get("v").asInstanceOf[Seq[Any]]
            .map(x => x.asInstanceOf[Float].toDouble).toIndexedSeq
          drift = prev.map(p => math.sqrt(
            p.zip(cur).map { case (a, b) => (a - b) * (a - b) }.sum)).getOrElse(Double.MaxValue)
          prev = Some(cur)
          if (sys.env.contains("GRAFT_PCA_DEBUG"))
            System.err.println(f"[pca] block $block drift=$drift%.3e")
        }
        // Canonical sign: the dominant |loading| is positive.
        val canon = v.select(
          when(abs(array_max(col("v"))) >= abs(array_min(col("v"))), col("v"))
            .otherwise(transform(col("v"), x => (-x).cast("float"))).as("v"))
        val eig = xc.crossJoin(broadcast(canon))
          .agg(round(avg(pow(VectorOps.dot(col("x"), col("v")), 2)), 4)
            .as("eigenvalue"))
        canon.crossJoin(broadcast(eig))
          .select(posexplode(col("v")), col("eigenvalue"))
          .select(col("pos").cast("int").as("dim"),
            round(col("col").cast("double"), 4).as("loading"), col("eigenvalue"))
          .orderBy("dim")
      },
      None),

    Q(
      "sim_pca_step",
      "One POWER-ITERATION STEP, oracle-checked end to end: " +
        "y = X'Xv₀ for the deterministic start vector v₀ (the vec_id-0 " +
        "embedding, read from the table by both engines — the " +
        "sim_ivf_assign trick), then unit-normalize. This pins the " +
        "matmul dataflow of sim_pca_power — per-row scale w = x·v (the " +
        "same codegen'd VecDot sequential fold as the oracle's " +
        "list_reduce, bit-identical), then per-dimension accumulation " +
        "— without the float Lloyd-style training loop, which stays " +
        "rows-only. Determinism at scale WITHOUT a sorted corpus-sized " +
        "fold: each term x_j·w is quantized to fixed-point longs " +
        "(scale 2²⁰), so the per-dimension sum is exact integer " +
        "arithmetic — associative, map-side combined, 64 reduce keys " +
        "of combiner-sized traffic (the budget holds to ~2²⁹ rows per " +
        "scale unit: |term| ≤ 2²⁴ · 2²⁰ keeps Σ under 2⁵³; a 100 TB " +
        "run re-blocks the sum hierarchically). The 64-value " +
        "normalization fold runs in dimension order on ONE packed row " +
        "— bit-identical to the oracle's ORDER BY j list_reduce.",
      (s, dir) => {
        val sc = 1048576.0 // 2^20 fixed-point scale for exact sums
        val e = Tables.t(s, dir, "embeddings")
        val v0 = e.filter(col("vec_id") === 0).select(col("embedding").as("v0"))
        val ys = e.crossJoin(broadcast(v0))
          .select(posexplode(col("embedding")).as(Seq("j", "x")),
            VectorOps.dot(col("embedding"), col("v0")).as("w"))
          .select(col("j"),
            floor(col("x").cast("double") * col("w") * sc + 0.5)
              .cast("long").as("t"))
          .groupBy("j").agg(sum("t").as("ts"))
        ys.agg(sort_array(collect_list(struct(col("j"), col("ts")))).as("a"))
          .select(col("a"), sqrt(aggregate(col("a"), lit(0.0),
            (acc, st) => acc + (st("ts") / sc) * (st("ts") / sc))).as("nrm"))
          .select(explode(col("a")).as("e"), col("nrm"))
          .select(col("e.j").cast("int").as("dim"),
            round((col("e.ts") / sc) / col("nrm"), 6).as("loading"))
          .orderBy("dim")
      },
      Some(s"""WITH v0 AS (
          SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
        w AS (SELECT e.vec_id, e.embedding,
            ${VectorOps.duckDot("e.embedding", "v0.v")} AS w
          FROM embeddings e CROSS JOIN v0),
        dims AS (SELECT unnest(range(0, 64)) AS j),
        terms AS (SELECT d.j,
            CAST(floor(CAST(w.embedding[CAST(d.j + 1 AS INT)] AS DOUBLE)
              * w.w * 1048576.0 + 0.5) AS BIGINT) AS t
          FROM w CROSS JOIN dims d),
        ys AS (SELECT j, CAST(sum(t) AS BIGINT) AS ts FROM terms GROUP BY 1),
        nrm AS (SELECT sqrt(list_reduce(
            list((ts / 1048576.0) * (ts / 1048576.0) ORDER BY j),
            (a, b) -> a + b)) AS nrm FROM ys)
        SELECT CAST(j AS INT) AS dim,
          round((ts / 1048576.0) / nrm.nrm, 6) AS loading
        FROM ys CROSS JOIN nrm ORDER BY dim""")),

    Q(
      "sim_cluster_prune",
      "SemDeDup/SSL-prototypes-style cluster pruning: assign every " +
        "vector to its nearest centroid (the same shuffle-free packed-" +
        "centroid cosine fold sim_ivf_assign pins), rank vectors " +
        "within each cluster by prototypicality (cosine to the " +
        "centroid, DESC, vec_id tie-break), and mark the most-" +
        "prototypical fifth of each cluster pruned — the semantic-" +
        "redundancy removal pass that shrinks a training corpus with " +
        "near-zero quality loss. The prune rule rk*5 <= cnt is pure " +
        "integer arithmetic on a rank that orders by the bit-identical " +
        "unrounded cosine, so both engines prune the same rows. The " +
        "within-cluster window partitions on cid (bounded partitions " +
        "at any corpus size — no global sort); the centroid book here " +
        "is the deterministic first-8 set so DuckDB can replay " +
        "assignment end-to-end; at 100 TB it comes from " +
        "kmeansCentroids and the dataflow is unchanged.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val packed = packCentroids(
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce")))
        val assigned = e.crossJoin(broadcast(packed))
          .select(col("vec_id"),
            nearestByCosine(col("embedding"), col("cs")).as("best"))
          .select(col("vec_id"), col("best.c.cid").as("cid"), col("best.d").as("cos"))
        val w = Window.partitionBy("cid").orderBy(col("cos").desc, col("vec_id"))
        assigned
          .withColumn("rk", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("cid")))
          .select(col("vec_id"), col("cid"), round(col("cos"), 6).as("cos_sim"),
            (col("rk") * 5 <= col("cnt")).as("pruned"))
          .orderBy("vec_id")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        sc AS (
          SELECT e.vec_id, c.cid,
            ${VectorOps.duckCosine("e.embedding", "c.ce")} AS cos
          FROM embeddings e CROSS JOIN cents c),
        asg AS (
          SELECT vec_id, cid, cos,
            row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
          FROM sc),
        a AS (SELECT vec_id, cid, cos FROM asg WHERE rn = 1),
        rk AS (SELECT vec_id, cid, cos,
            row_number() OVER (PARTITION BY cid ORDER BY cos DESC, vec_id) AS rk,
            count(*) OVER (PARTITION BY cid) AS cnt
          FROM a)
        SELECT vec_id, cid, round(cos, 6) AS cos_sim, rk * 5 <= cnt AS pruned
        FROM rk ORDER BY vec_id""")),

    Q(
      "sim_hamming_topk",
      "Binary-quantized retrieval: each 64-dim float vector collapses " +
        "to its sign bits packed into two 32-bit words (16 bytes vs " +
        "256 — the scan reads 16× less at 100 TB), candidates ranked " +
        "by Hamming distance via bit_count(xor), exact-cosine re-rank " +
        "of the top-30 to the final 10. The packing is an integer " +
        "fold (acc·2 + bit — identical seed semantics to DuckDB's " +
        "list_reduce), so signatures, distances, and the candidate " +
        "cut are all integer-exact in both engines; floats appear " +
        "only in the oracle-shared cosine re-rank.",
      (s, dir) => {
        def pack(lo: Int): Column =
          aggregate(slice(col("embedding"), lo, 32), lit(0L),
            (acc, x) => acc * 2 + when(x > 0f, 1L).otherwise(0L))
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            pack(1).as("h1"), pack(33).as("h2"))
        val q = e.filter(col("vec_id") === 0)
          .select(col("h1").as("q1"), col("h2").as("q2"), col("embedding").as("qe"))
        val cand = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("hamming",
            bit_count(col("h1").bitwiseXOR(col("q1")))
              + bit_count(col("h2").bitwiseXOR(col("q2"))))
          .orderBy(col("hamming"), col("vec_id"))
          .limit(30)
        cand
          .withColumn("cos_sim", round(VectorOps.cosine(col("embedding"), col("qe")), 6))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("hamming"), col("cos_sim"))
      },
      Some(s"""WITH sig AS (SELECT vec_id, embedding,
          list_reduce(list_transform(list_slice(embedding, 1, 32),
            x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
            (a, b) -> a * 2 + b) AS h1,
          list_reduce(list_transform(list_slice(embedding, 33, 64),
            x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
            (a, b) -> a * 2 + b) AS h2
        FROM embeddings),
        q AS (SELECT h1 AS q1, h2 AS q2, embedding AS qe FROM sig WHERE vec_id = 0),
        cand AS (SELECT vec_id, embedding, qe,
            CAST(bit_count(xor(h1, q1)) + bit_count(xor(h2, q2)) AS INT) AS hamming
          FROM sig, q WHERE vec_id != 0
          ORDER BY hamming, vec_id LIMIT 30)
        SELECT vec_id, hamming,
          round(${VectorOps.duckCosine("embedding", "qe")}, 6) AS cos_sim
        FROM cand ORDER BY cos_sim DESC, vec_id LIMIT 10""")),

    Q(
      "sim_nearest_centroid",
      "Nearest-centroid classification eval — the confusion matrix of " +
        "assigning every vector to its closest per-label centroid (the " +
        "embedding-quality probe run after any training round): " +
        "centroids from exact per-dimension sorted-fold means (bit-" +
        "stable, then frozen to float32 in BOTH engines so the scoring " +
        "inputs are identical), scored against the corpus through the " +
        "codegen'd VecDot cosine with a 5-row broadcast — one corpus " +
        "pass, no shuffle beyond the confusion-matrix aggregation. " +
        "Argmax ties break by label, so the assignment is total.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val cents = e.select(col("label"), posexplode(col("embedding")))
          .groupBy(col("label"), col("pos"))
          .agg((Stats.sfold(col("col").cast("double")) / count(lit(1))).as("m"))
          .groupBy("label")
          .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("a"))
          .select(col("label").as("clabel"),
            expr("transform(a, x -> CAST(x.m AS FLOAT))").as("cv"))
        val wPick = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("clabel"))
        e.crossJoin(broadcast(cents))
          .withColumn("cos", VectorOps.cosine(col("embedding"), col("cv")))
          .withColumn("rk", row_number().over(wPick))
          .filter(col("rk") === 1)
          .groupBy(col("label"), col("clabel").as("pred_label"))
          .agg(count(lit(1)).as("n"))
          .orderBy("label", "pred_label")
      },
      Some(s"""WITH px AS (SELECT label, CAST(i AS INT) - 1 AS pos,
            CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) r(i)),
        cm AS (SELECT label, pos,
            list_reduce(list_sort(list(v)), (a, b) -> a + b) / count(*) AS m
          FROM px GROUP BY 1, 2),
        ce AS (SELECT label AS clabel,
            list(CAST(m AS FLOAT) ORDER BY pos) AS cv FROM cm GROUP BY 1),
        sc AS (SELECT e.vec_id, e.label, c.clabel,
            ${VectorOps.duckCosine("e.embedding", "c.cv")} AS cos
          FROM embeddings e CROSS JOIN ce c),
        pick AS (SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, clabel) AS rk FROM sc)
        SELECT label, clabel AS pred_label, count(*) AS n
        FROM pick WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""")),

    Q(
      "sim_ivf_balance",
      "IVF index-health audit — the list-size balance of the " +
        "inverted file under the oracle-checked assignment " +
        "(sim_ivf_assign's deterministic first-8 centroid book): " +
        "max/min list sizes, the imbalance factor k·max/n that " +
        "bounds worst-case probe fan-out (a 1.0-imbalance index " +
        "probes evenly; a hot list serializes queries exactly like " +
        "a hot shuffle key), and the coefficient of variation. " +
        "Assignment is the shuffle-free packed-centroid per-row " +
        "fold; sizes reduce to k rows; every moment is an exact " +
        "integer sum with the floats evaluated once at the end.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val packed = packCentroids(
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").cast("int").as("cid"),
              col("embedding").as("ce")))
        val sizes = e.crossJoin(broadcast(packed))
          .select(nearestByCosine(col("embedding"), col("cs"))
            .getField("c").getField("cid").as("cid"))
          .groupBy("cid").agg(count(lit(1)).as("sz"))
        val k = col("k").cast("double")
        val n = col("n").cast("double")
        val mean = n / k
        val variance = col("ss").cast("double") / k - mean * mean
        sizes.agg(count(lit(1)).as("k"), sum("sz").as("n"),
            min("sz").as("min_list"), max("sz").as("max_list"),
            sum(col("sz") * col("sz")).as("ss"))
          .select(col("k"), col("n").as("n_vectors"),
            col("min_list"), col("max_list"),
            round(k * col("max_list") / n, 4).as("imbalance"),
            round(sqrt(variance) / mean, 4).as("cv"))
          .orderBy("k")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        sc AS (
          SELECT e.vec_id, c.cid,
            ${VectorOps.duckCosine("e.embedding", "c.ce")} AS cos
          FROM embeddings e CROSS JOIN cents c),
        rk AS (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid)
              AS rn
          FROM sc),
        sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
          FROM rk WHERE rn = 1 GROUP BY 1),
        a AS (SELECT count(*) AS k, CAST(sum(sz) AS BIGINT) AS n,
            min(sz) AS min_list,
            max(sz) AS max_list, sum(sz * sz) AS ss
          FROM sz)
        SELECT k, CAST(n AS BIGINT) AS n_vectors, min_list, max_list,
          round(CAST(k AS DOUBLE) * max_list / n, 4) AS imbalance,
          round(sqrt(CAST(ss AS DOUBLE) / k
              - (CAST(n AS DOUBLE) / k) * (CAST(n AS DOUBLE) / k))
            / (CAST(n AS DOUBLE) / k), 4) AS cv
        FROM a ORDER BY k""")),

    Q(
      "sim_norm_stats",
      "Embedding-norm audit per label — n, mean/min/max of ‖x‖² " +
        "(the is-my-encoder-healthy check: collapsed classes and " +
        "un-normalized batches show up as norm outliers before any " +
        "similarity search does). The squared norm is the codegen'd " +
        "VecDot sequential fold (bit-identical to the oracle's " +
        "list_reduce), quantized to integer 10⁻⁶ units at the row — " +
        "so the per-label moments are exact integer sums at any " +
        "parallelism, one hash aggregation total.",
      (s, dir) => {
        Tables.t(s, dir, "embeddings")
          .select(col("label"),
            round(VectorOps.normSq(col("embedding")) * 1e6)
              .cast("long").as("nu"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("nu").as("s"),
            min("nu").as("mn"), max("nu").as("mx"))
          .select(col("label"), col("n"),
            round(col("s").cast("double") / col("n") / 1e6, 4)
              .as("mean_norm2"),
            round(col("mn") / 1e6, 4).as("min_norm2"),
            round(col("mx") / 1e6, 4).as("max_norm2"))
          .orderBy("label")
      },
      Some(s"""WITH q AS (SELECT label,
            CAST(round((${VectorOps.duckDot("embedding", "embedding")})
              * 1e6) AS BIGINT) AS nu
          FROM embeddings)
        SELECT label, count(*) AS n,
          round(CAST(sum(nu) AS DOUBLE) / count(*) / 1e6, 4) AS mean_norm2,
          round(min(nu) / 1e6, 4) AS min_norm2,
          round(max(nu) / 1e6, 4) AS max_norm2
        FROM q GROUP BY label ORDER BY label""")),

    Q(
      "sim_query_batch",
      "Batched top-k vector serving — ten query vectors answered in " +
        "ONE corpus pass: the query block rides a broadcast (the " +
        "online-serving shape: queries are always the small side), " +
        "scoring is the codegen'd VecDot cosine in the scan, and the " +
        "per-query top-5 is a row_number filter directly above its " +
        "window — the WindowGroupLimit shape, so each partition " +
        "keeps 5-row heaps per query instead of sorting candidates. " +
        "Self-hits excluded. Amortizing the scan across the batch " +
        "is THE throughput lever for brute-force serving at scale.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val w = Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosine(col("embedding"), col("qe")).as("cos"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("rk"), col("vec_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
          FROM embeddings WHERE vec_id < 10),
        sc AS (SELECT q.qid, e.vec_id,
            ${VectorOps.duckCosine("e.embedding", "q.qe")} AS cos
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.qid),
        rk AS (SELECT qid, vec_id, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id)
              AS rk
          FROM sc)
        SELECT qid, CAST(rk AS INT) AS rk, vec_id,
          round(cos, 6) AS cos_sim
        FROM rk WHERE rk <= 5 ORDER BY qid, rk""")),

    Q(
      "sim_centroid_sep",
      "Class-separation matrix — pairwise Euclidean distance " +
        "between label centroids (the embedding-space health check " +
        "behind sim_nearest_centroid's confusion counts: classes " +
        "whose centroids nearly coincide will confuse ANY nearest-" +
        "centroid rule). Centroids reduce per (label, dim) and are " +
        "QUANTIZED to 4 decimals before any distance math, and the " +
        "per-dimension sums run over integer micro-units (each " +
        "element rounds to 10\u207b\u2076 grid at the row), so the centroid " +
        "means are EXACT integer ratios — no float accumulation " +
        "anywhere; the pairwise stage works on fixed-point values; the " +
        "64-term distance sums ride the sorted fold; the pair count " +
        "is label², dimension-bounded.",
      (s, dir) => {
        val m = Tables.t(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), col("pos"),
            round(col("col").cast("double") * 1e6).cast("long").as("vu"))
          .groupBy("label", "pos")
          .agg(round(sum("vu").cast("double") / count(lit(1)) / 1e6, 4)
            .as("m"))
        val p = m.as("a").join(m.as("b"),
            col("a.pos") === col("b.pos")
              && col("a.label") < col("b.label"))
          .select(col("a.label").as("la"), col("b.label").as("lb"),
            ((col("a.m") - col("b.m")) * (col("a.m") - col("b.m")))
              .as("t"))
        p.groupBy("la", "lb")
          .agg(graft.ops.Stats.sfold(col("t")).as("d2"))
          .select(col("la"), col("lb"), round(sqrt(col("d2")), 4).as("dist"))
          .orderBy("la", "lb")
      },
      Some("""WITH x AS (SELECT label, CAST(i AS INT) - 1 AS pos,
            CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) r(i)),
        m AS (SELECT label, pos,
            round(CAST(CAST(sum(CAST(round(v * 1e6) AS BIGINT)) AS BIGINT)
              AS DOUBLE) / count(*) / 1e6, 4) AS m
          FROM x GROUP BY 1, 2),
        p AS (SELECT a.label AS la, b.label AS lb,
            (a.m - b.m) * (a.m - b.m) AS t
          FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label)
        SELECT la, lb,
          round(sqrt(list_reduce(list_sort(list(t)), (x, y) -> x + y)), 4)
            AS dist
        FROM p GROUP BY 1, 2 ORDER BY la, lb""")),

    Q(
      "sim_range_count",
      "Radius (range) search — for each of ten query vectors, how " +
        "many corpus neighbors sit at cosine ≥ 0.8 (the density " +
        "probe behind radius-based dedup thresholds and ANN recall " +
        "targets; top-k asks 'who', range asks 'how crowded'). Same " +
        "broadcast-query-block + codegen'd VecDot scan as " +
        "sim_query_batch, but the reduction is a COUNT per query — " +
        "no window at all, one hash aggregation, so the whole " +
        "answer is scan + tiny shuffle at any scale. Cosine " +
        "compares are the identical double formula in both engines.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"),
            VectorOps.cosine(col("embedding"), col("qe")).as("cos"))
          .groupBy("qid")
          .agg(count(lit(1)).as("n_scored"),
            sum(when(col("cos") >= 0.8, 1).otherwise(0)).as("n_within"))
          .orderBy("qid")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
          FROM embeddings WHERE vec_id < 10),
        sc AS (SELECT q.qid,
            ${VectorOps.duckCosine("e.embedding", "q.qe")} AS cos
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.qid)
        SELECT qid, count(*) AS n_scored,
          CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_within
        FROM sc GROUP BY qid ORDER BY qid""")),

    Q(
      "sim_kcenter_coreset",
      s"Greedy farthest-first k-center coreset (k=$KcK) over the " +
        "embedding corpus — the diversity-selection primitive behind " +
        "coreset distillation and eval-set curation: start from the " +
        "lowest-id vector, then repeatedly admit the point FARTHEST " +
        "(max-min cosine distance) from everything selected so far. " +
        "Each round is one broadcast of the last center + a codegen'd " +
        "running-min update + a 1-row TakeOrdered argmax — O(k·N) " +
        "total with no pairwise materialization, the classic 2-approx " +
        "of the optimal k-center cover. sel_dist is the coverage " +
        "radius at admission (non-increasing by the greedy invariant, " +
        "pinned in Round11Spec); the oracle unrolls the identical " +
        "trajectory as MATERIALIZED CTE pairs.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        var cur = e.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"),
            lit(null).cast("double").as("rad"))
        var selected = cur.select(col("cid"), lit(1).as("step"), col("rad"))
        var state = e.crossJoin(broadcast(cur.select(col("ce"))))
          .select(col("vec_id"), col("embedding"),
            (lit(1.0) - VectorOps.cosine(col("embedding"), col("ce"))).as("mind"))
          .transform(Skew.cut)
        for (i <- 2 to KcK) {
          val nc = state.orderBy(col("mind").desc, col("vec_id")).limit(1)
            .select(col("vec_id").as("cid"), col("embedding").as("ce"),
              col("mind").as("rad"))
          selected = selected.union(nc.select(col("cid"), lit(i).as("step"), col("rad")))
          state = state.crossJoin(broadcast(nc.select(col("ce"))))
            .select(col("vec_id"), col("embedding"),
              least(col("mind"),
                lit(1.0) - VectorOps.cosine(col("embedding"), col("ce"))).as("mind"))
            .transform(Skew.cut)
        }
        selected
          .select(col("step"), col("cid").as("vec_id"),
            round(col("rad"), 6).as("sel_dist"))
          .orderBy("step")
      },
      Some(kcenterSql)),

    Q(
      "sim_silhouette",
      "Simplified silhouette score per IVF cluster — the clustering-" +
        "quality gate that closes the IVF eval loop (sim_ivf_balance " +
        "audits SIZES, sim_centroid_sep audits the codebook, this " +
        "audits the ASSIGNMENT): per vector a = cosine distance to " +
        "its own centroid, b = distance to the nearest other " +
        "centroid, s = (b−a)/max(a,b) ∈ [−1,1]. Uses the same " +
        "deterministic first-8 centroid book as sim_ivf_assign so " +
        "DuckDB replays every distance; the per-vector work is one " +
        "broadcast × 8 ranked distances (never pairwise between " +
        "vectors), per-cluster means round at the coarse scale.",
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce"))
        val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))
        val ranked = e.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            col("cid"), VectorOps.cosine(col("embedding"), col("ce")).as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
        val per = ranked.groupBy("vec_id")
          .agg(max(when(col("rn") === 1, col("cid"))).as("cid"),
            max(when(col("rn") === 1, lit(1.0) - col("cos"))).as("a"),
            max(when(col("rn") === 2, lit(1.0) - col("cos"))).as("b"))
          .withColumn("sil", (col("b") - col("a")) / greatest(col("a"), col("b")))
        per.groupBy("cid")
          .agg(count(lit(1)).as("n_vectors"),
            round(avg(col("sil")), 3).as("mean_silhouette"),
            round(avg(col("a")), 3).as("mean_intra"),
            round(avg(col("b")), 3).as("mean_nearest_other"))
          .orderBy("cid")
      },
      Some(s"""WITH cents AS (
          SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
          FROM embeddings WHERE vec_id < 8),
        sc AS (SELECT e.vec_id, c.cid,
            ${VectorOps.duckCosine("e.embedding", "c.ce")} AS cos
          FROM embeddings e CROSS JOIN cents c),
        rk AS (SELECT vec_id, cid, cos,
            row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid)
              AS rn
          FROM sc),
        per AS (SELECT vec_id,
            max(CASE WHEN rn = 1 THEN cid END) AS cid,
            max(CASE WHEN rn = 1 THEN 1.0 - cos END) AS a,
            max(CASE WHEN rn = 2 THEN 1.0 - cos END) AS b
          FROM rk WHERE rn <= 2 GROUP BY 1),
        sil AS (SELECT cid, (b - a) / greatest(a, b) AS sil, a, b FROM per)
        SELECT cid, count(*) AS n_vectors,
          round(avg(sil), 3) AS mean_silhouette,
          round(avg(a), 3) AS mean_intra,
          round(avg(b), 3) AS mean_nearest_other
        FROM sil GROUP BY cid ORDER BY cid"""))
  )

  private val KcK = 8

  /** Unrolled greedy k-center oracle for [[sim_kcenter_coreset]]: one
    * (center, minds) MATERIALIZED CTE pair per round — the identical
    * argmax/update trajectory, same fold-order cosine. */
  private def kcenterSql: String = {
    val cos = VectorOps.duckCosine("m.embedding", "c.ce")
    val cos0 = VectorOps.duckCosine("e.embedding", "c.ce")
    val steps = (2 to KcK).map { i =>
      val prev = s"m${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce,
          mind AS rad
        FROM $prev ORDER BY mind DESC, vec_id LIMIT 1),
      m$i AS MATERIALIZED (SELECT m.vec_id, m.embedding,
          least(m.mind, 1.0 - $cos) AS mind
        FROM $prev m CROSS JOIN c$i c)"""
    }.mkString(",\n")
    val rows = (2 to KcK).map { i =>
      s"UNION ALL SELECT $i, cid, round(rad, 6) FROM c$i"
    }.mkString("\n")
    s"""WITH c1 AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce,
          CAST(NULL AS DOUBLE) AS rad
        FROM embeddings ORDER BY vec_id LIMIT 1),
      m1 AS MATERIALIZED (SELECT e.vec_id, e.embedding,
          1.0 - $cos0 AS mind
        FROM embeddings e CROSS JOIN c1 c),
      $steps
      SELECT CAST(1 AS INT) AS step, cid AS vec_id,
        round(rad, 6) AS sel_dist FROM c1
      $rows
      ORDER BY step"""
  }

  /** Deterministic distance-weighted, bucket-diversified seeding (the
    * one-pass spirit of k-means‖/scalable k-means++): seed 0 is the
    * first vector by id RANK (gapped or offset ids are fine); every
    * other vector gets an Efraimidis–Spirakis key d²(x, seed0)/(−ln u)
    * — u a uniform derived from xxhash64(vec_id) — AND a 5-bit
    * hyperplane sign bucket (fixed-seed planes, codegen'd VecDot).
    * Seeds 1..k−1 are the top-keyed WINNER of each bucket (at most one
    * seed per direction bucket, ordered by key): a one-shot weighted
    * sample alone can drop all k seeds into one far cluster, while the
    * one-per-bucket rule forces spread — a skewed corpus whose first k
    * rows share one cluster still seeds every major direction
    * (spec-pinned); if fewer than k−1 buckets are populated the seed
    * set shrinks rather than doubling up in a direction. Fully
    * engine-replayable: same ids ⇒ same seeds, no RNG state. Cost: one
    * scan for seed 0 + one scan + tiny top-k — two jobs regardless of
    * corpus size. (Weight is L2²; for the spherical assignment below
    * the ordering matches angular distance on near-unit vectors.) */
  def kmeansSeeds(e: DataFrame, k: Int, dim: Int = 64): DataFrame = {
    val s0 = e.orderBy("vec_id").limit(1).select(col("embedding").as("s0"))
    val rest = seedBucketWinners(e.crossJoin(broadcast(s0)), col("embedding"),
        l2sq(col("embedding"), col("s0")), xxhash64(col("vec_id")), Nil, dim)
      .orderBy(col("wkey").desc, col("vec_id"))
      .limit(k - 1)
      .select(row_number().over(
          Window.orderBy(col("wkey").desc, col("vec_id"))).cast("int").as("cid"),
        col("ce"))
    s0.select(lit(0).as("cid"), col("s0").as("ce")).unionByName(rest)
  }

  /** Shared candidate stage for [[kmeansSeeds]]/[[pqSeeds]]: the top
    * key per (grp, sign-bucket) via ONE map-side-combined max_by
    * aggregation — the only full-corpus pass; callers rank the tiny
    * (≤ 32 × |grp|-row) winner frame. Two candidates can't share a
    * bucket, which is what forces seed spread. If fewer than k−1
    * buckets are populated the seed set SHRINKS instead of doubling up
    * within a direction — matching the documented Lloyd shrinkage
    * semantics. `grp` carries extra grouping columns (the PQ subspace
    * id). */
  private def seedBucketWinners(in: DataFrame, vec: Column, d2: Column,
      hash: Column, grp: Seq[String], dim: Int): DataFrame = {
    val rng = new scala.util.Random(11)
    // planes sized to the INPUT dimension — VecDot would silently
    // truncate a longer literal, making the bucket a projection onto a
    // prefix nothing documents
    val planes = Seq.fill(5)(Seq.fill(dim)(rng.nextGaussian().toFloat))
    val bucket = planes.map(p =>
        when(graft.expr.VecDot.vecDot(vec, typedlit(p)) >= 0, 1L).otherwise(0L))
      .reduce((acc, b) => acc * 2 + b)
    val u = (pmod(hash, lit(1000000007L)).cast("double") + 1.0) / 1000000008.0
    // wkey > 0 drops seed 0 itself and its exact duplicates — a
    // zero-distance row can only be a redundant seed
    in.withColumn("bkt", bucket)
      .withColumn("wkey", d2 / -log(u))
      .filter(col("wkey") > 0)
      .groupBy((grp :+ "bkt").map(col): _*)
      .agg(max_by(struct(col("vec_id"), vec.as("ce"), col("wkey")),
        struct(col("wkey"), -col("vec_id"))).as("win"))
      .select(grp.map(col) ++
        Seq(col("win.vec_id").as("vec_id"), col("win.ce").as("ce"),
          col("win.wkey").as("wkey")): _*)
  }

  /** Lloyd k-means over the embedding column, entirely as DataFrame
    * ops: assignment = a per-row [[nearestByCosine]] fold over the
    * packed broadcast centroids (ZERO corpus shuffle — the former
    * crossJoin×k + groupBy(vec_id) argmax exchanged the whole corpus
    * once per iteration); update = the VectorMean typed aggregate
    * (map-side combined, so shuffle traffic is O(k), not O(rows)).
    * Centroids stay a k-row DataFrame end-to-end — nothing is
    * collected to the driver; each iteration costs one tiny broadcast
    * + one k-group shuffle, the cheapest distributed k-means shape.
    * Seeds default to [[kmeansSeeds]] (deterministic
    * distance-weighted); pass `seeds` to inject another (cid, ce)
    * frame. A cluster that loses every member drops out of the
    * returned frame rather than going NaN — callers needing exactly k
    * centroids must re-seed the difference. */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int,
      seeds: Option[DataFrame] = None): DataFrame = {
    val vm = udaf(VectorMean)
    // Checkpoint the k-row state every SECOND step (and after the last):
    // an unbroken lineage would re-execute every earlier assignment pass
    // inside each broadcast — iters² full-corpus passes — while a
    // per-step checkpoint pays one materialization job per iteration.
    // Two-step blocks fuse a pair of iterations into ONE job (the
    // un-checkpointed middle state rides along as a nested broadcast
    // stage), halving the sequential job count — the same blocking the
    // PCA power loop uses.
    var cents = seeds.getOrElse(kmeansSeeds(e, k)).transform(Skew.cut)
    for (i <- 1 to iters) {
      cents = e.crossJoin(broadcast(packCentroids(cents)))
        .select(col("embedding"),
          nearestByCosine(col("embedding"), col("cs"))
            .getField("c").getField("cid").as("cid"))
        .groupBy("cid")
        .agg(vm(col("embedding")).as("cm"))
        // cosine assignment is scale-invariant, so the unnormalized mean
        // is a valid spherical-k-means centroid; float cast re-enters
        // the codegen'd VecDot path
        .select(col("cid"), col("cm").cast("array<float>").as("ce"))
      if (i % 2 == 0 || i == iters) cents = cents.transform(Skew.cut)
    }
    cents
  }

  /** Squared L2 distance via three codegen'd VecDot evaluations:
    * |a-b|² = a·a − 2 a·b + b·b (double precision throughout). */
  private def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    VectorOps.normSq(a) - lit(2.0) * VectorOps.dot(a, b) + VectorOps.normSq(b)

  /** The k-row centroid frame packed into ONE row holding an array of
    * (cid, ce) structs — broadcast to [[nearestByCosine]]/[[nearestByL2]]
    * so nearest-centroid assignment runs per row with ZERO corpus
    * shuffle. The former shape (crossJoin×k then groupBy(vec_id)
    * argmax) shuffled the whole corpus once per Lloyd iteration — the
    * kind of exchange that dominates at 100 TB; packing moves the
    * argmax into the scan. */
  private def packCentroids(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(col("cid"), col("ce"))).as("cs"))

  /** Per-row nearest centroid by cosine over a packed (cid, ce, …)
    * array: an order-independent fold keeping the element that
    * maximizes (d, then min cid) — the exact argmax a
    * row_number-over-(cos DESC, cid) rank-1 filter selects, with no
    * join, no shuffle, no per-group sort. Initialized from element 1
    * (re-compared against itself harmlessly), so no sentinel values
    * and the element struct may carry extra payload fields. Returns
    * struct(d, c = the winning element). */
  private def nearestByCosine(vec: Column, cs: Column): Column = {
    // nanvl: a zero-norm input yields NaN cosine, under which every
    // comparison is false and the fold's result would depend on the
    // (nondeterministic) packed-centroid order — pinned to -2, below
    // any real cosine, so such rows deterministically take the lowest
    // cid and the fold stays order-independent unconditionally
    def dist(a: Column, b: Column) = nanvl(VectorOps.cosine(a, b), lit(-2.0))
    val c0 = element_at(cs, 1)
    aggregate(cs,
      struct(dist(vec, c0.getField("ce")).as("d"), c0.as("c")),
      (acc, c) => {
        val d = dist(vec, c.getField("ce"))
        when(d > acc.getField("d") ||
            (d === acc.getField("d") &&
              c.getField("cid") < acc.getField("c").getField("cid")),
          struct(d.as("d"), c.as("c"))).otherwise(acc)
      })
  }

  /** [[nearestByL2]] over a SEGMENT of `vec` ([off, off+len)) without
    * materializing the subvector: inside an interpreted HOF lambda a
    * `slice(...)` input is re-evaluated (and re-allocated) once per
    * codeword × reference — the VecDotSeg offset dots read the stored
    * embedding in place, so the per-subspace argmin costs three tight
    * 16-element loops per codeword and zero allocation. Values are
    * bit-identical to the slice form (same elements, same fold order). */
  private def nearestByL2Seg(vec: Column, off: Column, cs: Column, len: Column): Column = {
    import graft.expr.VecDotSeg.vecDotSeg
    // nanvl as in nearestByL2: keeps the fold order-independent when
    // an input element is NaN
    def d(ce: Column) =
      nanvl(
        vecDotSeg(vec, vec, off, off, len) -
          lit(2.0) * vecDotSeg(vec, ce, off, lit(0), len) +
          VectorOps.normSq(ce),
        lit(Double.MaxValue))
    val c0 = element_at(cs, 1)
    aggregate(cs,
      struct(d(c0.getField("ce")).as("d"), c0.as("c")),
      (acc, c) => {
        val dd = d(c.getField("ce"))
        when(dd < acc.getField("d") ||
            (dd === acc.getField("d") &&
              c.getField("cid") < acc.getField("c").getField("cid")),
          struct(dd.as("d"), c.as("c"))).otherwise(acc)
      })
  }

  /** [[nearestByCosine]]'s L2 twin: minimizes (d, then cid) — the
    * row_number-over-(d, cid) rank-1 argmin as a shuffle-free fold. */
  private def nearestByL2(sv: Column, cs: Column): Column = {
    // nanvl: NaN input elements would make every comparison false and
    // leave the result order-dependent — pinned to MaxValue so such
    // rows deterministically take the lowest cid (see nearestByCosine)
    def dist(a: Column, b: Column) = nanvl(l2sq(a, b), lit(Double.MaxValue))
    val c0 = element_at(cs, 1)
    aggregate(cs,
      struct(dist(sv, c0.getField("ce")).as("d"), c0.as("c")),
      (acc, c) => {
        val d = dist(sv, c.getField("ce"))
        when(d < acc.getField("d") ||
            (d === acc.getField("d") &&
              c.getField("cid") < acc.getField("c").getField("cid")),
          struct(d.as("d"), c.as("c"))).otherwise(acc)
      })
  }

  /** (vec_id, sub, sv): each embedding split into m contiguous
    * subvectors of subDim floats. One generator pass, no shuffle. */
  private def pqSubvectors(e: DataFrame, m: Int, subDim: Int): DataFrame =
    e.select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(m - 1)),
          k => struct(k.cast("int").as("sub"),
            slice(col("embedding"), k * lit(subDim) + 1, lit(subDim)).as("sv")))).as("s"))
      .select(col("vec_id"), col("s.sub").as("sub"), col("s.sv").as("sv"))

  /** Per-subspace analogue of [[kmeansSeeds]], all m subspaces in one
    * dataflow: per sub, seed 0 = the first subvector by id rank and
    * seeds 1..k−1 = the top Efraimidis–Spirakis keys
    * d²(sv, seed0)/(−ln u), taken round-robin across hyperplane sign
    * buckets — deterministic, rank-based (no dense-id precondition),
    * and spread across a skewed corpus. */
  def pqSeeds(subs: DataFrame, k: Int, subDim: Int = 16): DataFrame = {
    // seed 0 per subspace = the subvectors of the min vec_id — ONE
    // max_by aggregation, no full-corpus window
    val first = subs.groupBy("sub")
      .agg(min_by(col("sv"), col("vec_id")).as("s0"))
    val winners = seedBucketWinners(subs.join(broadcast(first), "sub"), col("sv"),
      l2sq(col("sv"), col("s0")), xxhash64(col("vec_id"), col("sub")), Seq("sub"), subDim)
    val wSel = Window.partitionBy("sub").orderBy(col("wkey").desc, col("vec_id"))
    winners.withColumn("sel", row_number().over(wSel))
      .filter(col("sel") < k)
      .select(col("sub"), col("sel").cast("int").as("cid"), col("ce"))
      .unionByName(first.select(col("sub"), lit(0).as("cid"), col("s0").as("ce")))
  }

  /** Per-subspace L2 Lloyd k-means codebooks: (sub, cid, ce). All m
    * subspaces train in ONE dataflow — the subspace id is just another
    * grouping key, so adding subspaces adds no stages. Assignment is a
    * per-row [[nearestByL2]] fold over the subspace's packed codewords
    * (broadcast join on `sub`, m rows — no corpus shuffle, no ×k row
    * blow-up); the update shuffles O(k·m) partial sums. Seeds default
    * to [[pqSeeds]] (deterministic distance-weighted, rank-based); pass
    * `seeds` to inject another (sub, cid, ce) frame. A codeword that
    * loses every member during a Lloyd iteration drops out of the
    * returned frame (codebook shrinkage) rather than going NaN. */
  def pqCodebooks(subs: DataFrame, k: Int, iters: Int,
      seeds: Option[DataFrame] = None, subDim: Int = 16): DataFrame = {
    val vm = udaf(VectorMean)
    // k·m-row state checkpointed every SECOND step (and after the last)
    // — two Lloyd iterations fuse into one job, the middle state riding
    // as a nested broadcast stage; see kmeansCentroids for the tradeoff
    var books = seeds.getOrElse(pqSeeds(subs, k, subDim)).transform(Skew.cut)
    for (i <- 1 to iters) {
      val packed = books.groupBy("sub")
        .agg(collect_list(struct(col("cid"), col("ce"))).as("cs"))
      books = subs.join(broadcast(packed), "sub")
        .select(col("sub"), col("sv"),
          nearestByL2(col("sv"), col("cs"))
            .getField("c").getField("cid").as("cid"))
        .groupBy("sub", "cid")
        .agg(vm(col("sv")).as("cm"))
        .select(col("sub"), col("cid"), col("cm").cast("array<float>").as("ce"))
      if (i % 2 == 0 || i == iters) books = books.transform(Skew.cut)
    }
    books
  }

  /** PQ encode + asymmetric-distance probe + exact re-rank. */
  def annPq(s: org.apache.spark.sql.SparkSession, dir: String,
      queryVecId: Long, topK: Int, m: Int = 4, subDim: Int = 16,
      k: Int = 16, buildIters: Int = 2, nCandidates: Int = 96): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    val subs = pqSubvectors(e, m, subDim)
    // trained once; pqCodebooks already checkpoints its final state —
    // re-checkpointing here would just add a materialization job
    val books = pqCodebooks(subs, k, buildIters, subDim = subDim)
    // ADC table: distance from the query's subvectors to every codeword
    // (k·m rows), carried alongside the codewords and packed into ONE
    // broadcast row — an array over subspaces (sorted by sub) of
    // (cid, ce, dq) arrays
    val qsubs = pqSubvectors(e.filter(col("vec_id") === queryVecId), m, subDim)
      .select(col("sub"), col("sv").as("qsv"))
    val packedAdc = books.join(qsubs, "sub")
      .select(col("sub"), col("cid"), col("ce"), l2sq(col("ce"), col("qsv")).as("dq"))
      .groupBy("sub")
      .agg(collect_list(struct(col("cid"), col("ce"), col("dq"))).as("cs"))
      .agg(sort_array(collect_list(struct(col("sub"), col("cs")))).as("tabs"))
    // encode + ADC lookup fused into one per-row fold: for each
    // subspace, the nearestByL2 winner's dq is the table lookup for
    // that vector's code — approximate distance = Σ over the (sorted)
    // subspaces, computed in the SCAN. No ×k row blow-up, no
    // per-vector shuffle — candidate generation is scan + TakeOrdered
    // at any scale.
    val cand = e.crossJoin(broadcast(packedAdc))
      .select(col("vec_id"),
        aggregate(col("tabs"), lit(0.0), (acc, t) =>
          acc + nearestByL2Seg(col("embedding"),
              t.getField("sub") * lit(subDim), t.getField("cs"), lit(subDim))
            .getField("c").getField("dq")).as("adist"))
      .filter(col("vec_id") =!= queryVecId)
      .orderBy(col("adist"), col("vec_id"))
      .limit(nCandidates)
    // exact re-rank of the tiny candidate set against the true vectors
    val q = e.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    e.join(broadcast(cand.select("vec_id")), "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topK)
      .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF assignment + probe over k-means-built centroids. */
  def annIvf(s: org.apache.spark.sql.SparkSession, dir: String,
      queryVecId: Long, nProbe: Int, topK: Int, nCentroids: Int = 8,
      buildIters: Int = 2): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    // the k-row centroid build feeds both the assignment and the probe
    // selection; kmeansCentroids already checkpoints its final state,
    // so both consumers read the materialized rows, no rebuild
    val cents = kmeansCentroids(e, nCentroids, buildIters)
    // probe the nProbe centroids closest to the query
    val q = e.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    val probes = cents.crossJoin(broadcast(q))
      .withColumn("qdist", VectorOps.cosine(col("ce"), col("qe")))
      .orderBy(col("qdist").desc, col("cid"))
      .limit(nProbe)
      .select(col("cid"))
    // assignment = per-row nearestByCosine fold over the packed
    // broadcast centroids (no corpus shuffle); the probe filter is a
    // broadcast semi-join on cid, so the whole query is scan +
    // TakeOrderedAndProject
    e.crossJoin(broadcast(packCentroids(cents)))
      .select(col("vec_id"), col("embedding"),
        nearestByCosine(col("embedding"), col("cs"))
          .getField("c").getField("cid").as("cid"))
      .join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("qe")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topK)
      .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
  }
}
