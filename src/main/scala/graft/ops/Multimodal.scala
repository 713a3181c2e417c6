package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-pipeline mandate): media payloads as
  * opaque `binary` columns with typed metadata alongside text/scalar/
  * embedding columns. The decode step is STUBBED (no image/audio libs in
  * this container) with a deterministic fake — the Spark-side plumbing
  * (schema, typed Dataset map, partition-parallel execution, metadata
  * join) is real. A production decoder drops into [[MediaDecode.decode]]
  * unchanged. */
object Multimodal {

  /** Typed metadata a real decoder would emit. */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int, n_frames: Int, codec: String)

  object MediaDecode {
    /** STUB decoder: deterministic fake metadata derived from payload
      * bytes. Replace the body with a real codec call (e.g. JNI/ImageIO)
      * — the signature (bytes in, typed meta out, executed per-partition
      * on executors) is the production shape. */
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length
      MediaMeta(
        doc_id = docId,
        width = 64 + len % 577,
        height = 64 + (len * 31) % 353,
        n_frames = 1 + len % 25,
        codec = if (len % 2 == 0) "fake/rgb" else "fake/yuv")
    }
  }

  def defs: Seq[Q] = Seq(

    Q(
      "mm_meta_join",
      "Multimodal row assembly: text document ⋈ embedding vector on id " +
        "— one DataFrame carrying scalar + text + vector columns.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
        val e = Tables.t(s, dir, "embeddings")
        d.join(e, col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("lang"), col("label"),
            size(col("embedding")).as("dim"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, label, CAST(len(embedding) AS INT) AS dim, n_chars
        FROM documents JOIN embeddings ON doc_id = vec_id
        ORDER BY doc_id""")),

    Q(
      "mm_binary_stats",
      "Opaque binary payload handling: byte length, content hashes, " +
        "magic-bytes sniff — the metadata pass that runs before any " +
        "decode at scale (prunes corrupt/dup payloads without decoding).",
      (s, dir) => {
        val bin = col("text").cast("binary")
        Tables.t(s, dir, "documents")
          .select(
            col("doc_id"),
            length(bin).as("byte_len"),
            md5(bin).as("md5_hex"),
            sha2(bin, 256).as("sha256_hex"),
            substring(col("text"), 1, 4).as("magic"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(strlen(text) AS INT) AS byte_len,
        md5(text) AS md5_hex, sha256(text) AS sha256_hex,
        substring(text, 1, 4) AS magic
        FROM documents ORDER BY doc_id""")),

    Q(
      "mm_frame_sample",
      "Frame sampling over the decoded (stubbed) video metadata: every " +
        "5th frame index exploded to rows with a deterministic fake " +
        "per-frame feature — the decode→sample→featurize dataflow shape " +
        "(rows fan out on executors, never the driver). A real " +
        "frame-grab drops into the feature expression.",
      (s, dir) => {
        import s.implicits._
        val meta = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) => MediaDecode.decode(id, bytes) }
          .toDF()
        meta
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
          .withColumn("frame_feature",
            pmod(col("doc_id") * 31 + col("frame_idx") * 7, lit(997)).cast("int"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH meta AS (SELECT doc_id,
          CAST(1 + strlen(text) % 25 AS INT) AS n_frames FROM documents),
        fr AS (SELECT doc_id, n_frames, unnest(range(0, n_frames, 5)) AS fi FROM meta)
        SELECT doc_id, n_frames, CAST(fi AS INT) AS frame_idx,
          CAST((doc_id * 31 + fi * 7) % 997 AS INT) AS frame_feature
        FROM fr ORDER BY doc_id, frame_idx""")),

    Q(
      "mm_decode_stub",
      "Typed per-partition decode pipeline: binary payload → case-class " +
        "metadata via Dataset.map (executor-parallel, codegen'd " +
        "serialization at the boundary). Decoder body is a deterministic " +
        "stub; the oracle replays its arithmetic.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) => MediaDecode.decode(id, bytes) }
          .toDF()
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(64 + strlen(text) % 577 AS INT) AS width,
        CAST(64 + (strlen(text) * 31) % 353 AS INT) AS height,
        CAST(1 + strlen(text) % 25 AS INT) AS n_frames,
        CASE WHEN strlen(text) % 2 = 0 THEN 'fake/rgb' ELSE 'fake/yuv' END AS codec
        FROM documents ORDER BY doc_id""")),

    Q(
      "mm_phash_dedup",
      "Perceptual-hash near-duplicate detection over media payloads — " +
        "the image-dedup dataflow: decode to a tiny luminance grid " +
        "(STUB: 64 bytes strided across the payload — locality-" +
        "preserving, so near-identical payloads yield near-identical " +
        "grids; a real thumbnail decoder drops in unchanged), " +
        "average-hash it (bit = pixel·64 > sum, integer-exact mean " +
        "threshold), pack sign bits into two 32-bit words, generate " +
        "candidates by 8×8-bit band buckets (equi-join, never " +
        "all-pairs), verify by Hamming ≤ 10. Identical banding/" +
        "verify shape to dedup_simhash — this is that operator for " +
        "the multimodal column, end-to-end integer and fully " +
        "oracle-replayed.",
      (s, dir) => {
        val d = Tables.t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        val px = d
          .select(col("doc_id"), explode(sequence(lit(0), lit(63))).as("i"),
            col("text"), col("len"))
          .select(col("doc_id"), col("i"),
            ascii(expr("substring(text, CAST(floor(i * len / 64.0) AS INT) + 1, 1)"))
              .as("p"))
        val sm = px.groupBy("doc_id").agg(sum("p").as("sp"))
        val sig = px.join(sm, Seq("doc_id"))
          .withColumn("bit", (col("p") * 64 > col("sp")).cast("long"))
          .groupBy("doc_id")
          .agg(
            sum(when(col("i") < 32 && col("bit") === 1,
              expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))")).otherwise(0L)).as("h1"),
            sum(when(col("i") >= 32 && col("bit") === 1,
              expr("shiftleft(CAST(1 AS BIGINT), CAST(i - 32 AS INT))")).otherwise(0L)).as("h2"))
        val banded = sig
          .select(col("doc_id"), col("h1"), col("h2"),
            explode(sequence(lit(0), lit(7))).as("band"))
          .withColumn("key", expr(
            "CASE WHEN band < 4 THEN shiftright(h1, CAST(band * 8 AS INT)) & 255 " +
              "ELSE shiftright(h2, CAST((band - 4) * 8 AS INT)) & 255 END"))
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            (bit_count(col("a.h1").bitwiseXOR(col("b.h1")))
              + bit_count(col("a.h2").bitwiseXOR(col("b.h2")))).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 10)
          .orderBy(col("hamming"), col("d1"), col("d2"))
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len
          FROM documents WHERE doc_id < 200),
        px AS (SELECT doc_id, i,
            ascii(substr(text, CAST(floor(i * len / 64.0) AS INT) + 1, 1)) AS p
          FROM d CROSS JOIN (SELECT CAST(unnest(range(64)) AS INT) AS i)),
        sm AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS sp FROM px GROUP BY 1),
        bits AS (SELECT px.doc_id, i,
            CASE WHEN p * 64 > sp THEN 1 ELSE 0 END AS bit
          FROM px JOIN sm USING (doc_id)),
        sig AS (SELECT doc_id,
            CAST(sum(CASE WHEN i < 32 AND bit = 1
              THEN CAST(1 AS BIGINT) << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS h1,
            CAST(sum(CASE WHEN i >= 32 AND bit = 1
              THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INT) ELSE 0 END) AS BIGINT) AS h2
          FROM bits GROUP BY 1),
        banded AS (SELECT doc_id, h1, h2, band,
            CASE WHEN band < 4 THEN (h1 >> CAST(band * 8 AS INT)) & 255
              ELSE (h2 >> CAST((band - 4) * 8 AS INT)) & 255 END AS key
          FROM sig CROSS JOIN (SELECT CAST(unnest(range(8)) AS INT) AS band)),
        pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
            CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS INT) AS hamming
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT d1, d2, hamming FROM pairs WHERE hamming <= 10
        ORDER BY hamming, d1, d2""")),

    Q(
      "mm_shard_manifest",
      "WebDataset-style shard manifest — binary payloads packed into " +
        "~2 KB shards by byte-offset splitting in deterministic " +
        "doc_id order (training loaders want equal-byte shards with " +
        "a manifest of what landed where). The global byte prefix " +
        "sum uses the globalRank pattern generalized to SUMS: range-" +
        "repartition on the order key, a cumulative window " +
        "PARTITIONED by the physical partition id, and per-partition " +
        "byte offsets from one sorted-array fold broadcast back — " +
        "NO single-task window, and the offsets are invariant to " +
        "where the sampled range boundaries fall. Shard id is one " +
        "integer division of the exact start offset.",
      (s, dir) => {
        val target = 2048L
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            length(col("text").cast("binary")).cast("long").as("bytes"))
        // cut = correctness: range boundaries are re-sampled per
        // execution, and `local` + `offs` both consume this exchange —
        // see the Skew.globalRank comment (the same race corrupts the
        // prefix sums if the two materializations diverge)
        val parted = Skew.cut(
          d.repartitionByRange(Skew.spineParts(d), col("doc_id"))
            .withColumn("pid", spark_partition_id().cast("long")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("pid").orderBy("doc_id")
        val local = parted.withColumn("lc", sum("bytes").over(w))
        val offs = parted.groupBy("pid").agg(sum("bytes").as("pb"))
          .agg(sort_array(collect_list(struct(col("pid"), col("pb"))))
            .as("a"))
          .select(explode(expr(
            "transform(a, (x, i) -> struct(x.pid AS pid, " +
              "aggregate(slice(a, 1, i), CAST(0 AS BIGINT), " +
              "(acc, y) -> acc + y.pb) AS off))")).as("o"))
          .select(col("o.pid").as("pid"), col("o.off").as("off"))
        local.join(broadcast(offs), "pid")
          .withColumn("start", col("off") + col("lc") - col("bytes"))
          .withColumn("shard", Skew.idiv(col("start"), lit(target)))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_items"), sum("bytes").as("bytes"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .orderBy("shard")
      },
      Some("""WITH d AS (SELECT doc_id,
            CAST(strlen(text) AS BIGINT) AS bytes FROM documents),
        c AS (SELECT doc_id, bytes,
            sum(bytes) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - bytes AS start
          FROM d)
        SELECT CAST(start // 2048 AS BIGINT) AS shard, count(*) AS n_items,
          CAST(sum(bytes) AS BIGINT) AS bytes,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1 ORDER BY shard""")),

    Q(
      "mm_aspect_bucket",
      "Aspect-ratio bucketing over the (stub-)decoded image metadata — " +
        "the batching prep every resolution-aware vision/diffusion " +
        "trainer runs: images group into the nearest of five canonical " +
        "aspect buckets (each with a fixed target resolution) so a " +
        "training batch never mixes shapes, and the report measures " +
        "how much distortion the bucket assignment costs (mean " +
        "relative aspect error = crop/pad waste). Nearest-bucket " +
        "assignment is a per-row argmin over a 5-literal ladder in " +
        "log-aspect space — pure codegen'd scalar math, no shuffle " +
        "before the 5-row aggregation; a real decoder would only " +
        "replace the width/height stub.",
      (s, dir) => {
        val ladder = "array(0.5D, 0.75D, 1.0D, 4.0D/3.0D, 2.0D)"
        val tw = Seq(512, 640, 768, 896, 1024)
        val th = Seq(1024, 853, 768, 672, 512)
        val m = Tables.t(s, dir, "documents")
          .select(col("doc_id"), length(col("text").cast("binary")).as("len"))
          .select(col("doc_id"),
            (lit(64) + col("len") % 577).as("w"),
            (lit(64) + (col("len") * 31) % 353).as("h"))
          .withColumn("aspect", col("w").cast("double") / col("h"))
          .withColumn("idx", expr(
            s"CAST(array_position(transform($ladder, b -> abs(ln(aspect) - ln(b))), " +
              s"array_min(transform($ladder, b -> abs(ln(aspect) - ln(b))))) AS INT)"))
          .withColumn("bucket_aspect", expr(s"element_at($ladder, idx)"))
        m.groupBy("idx", "bucket_aspect")
          .agg(count(lit(1)).as("n_images"),
            round(avg(col("aspect")), 3).as("mean_aspect"),
            round(avg(abs(col("aspect") - col("bucket_aspect")) / col("bucket_aspect")), 3)
              .as("mean_waste"))
          .select(col("idx").as("bucket"),
            round(col("bucket_aspect"), 4).as("bucket_aspect"),
            element_at(typedlit(tw), col("idx")).as("target_w"),
            element_at(typedlit(th), col("idx")).as("target_h"),
            col("n_images"), col("mean_aspect"), col("mean_waste"))
          .orderBy("bucket")
      },
      Some("""WITH m AS (SELECT doc_id,
            64 + strlen(text) % 577 AS w,
            64 + (strlen(text) * 31) % 353 AS h
          FROM documents),
        a AS (SELECT doc_id, CAST(w AS DOUBLE) / h AS aspect FROM m),
        lad AS (SELECT [0.5, 0.75, 1.0, 4.0/3.0, 2.0] AS ladder,
          [512, 640, 768, 896, 1024] AS tw, [1024, 853, 768, 672, 512] AS th),
        assigned AS (SELECT doc_id, aspect,
            CAST(list_position(
              list_transform(ladder, b -> abs(ln(aspect) - ln(b))),
              list_min(list_transform(ladder, b -> abs(ln(aspect) - ln(b)))))
              AS INT) AS idx,
            ladder, tw, th
          FROM a CROSS JOIN lad)
        SELECT idx AS bucket,
          round(ladder[idx], 4) AS bucket_aspect,
          CAST(tw[idx] AS INT) AS target_w, CAST(th[idx] AS INT) AS target_h,
          count(*) AS n_images,
          round(avg(aspect), 3) AS mean_aspect,
          round(avg(abs(aspect - ladder[idx]) / ladder[idx]), 3) AS mean_waste
        FROM assigned
        GROUP BY idx, ladder[idx], tw[idx], th[idx]
        ORDER BY bucket""")),

    Q(
      "mm_modality_mix",
      "Modality/codec mix report over the (stub-)decoded corpus: per " +
        "source, how many items decode as single-frame images vs " +
        "multi-frame video, under which codec, carrying how many " +
        "payload bytes and what share of the source's storage — the " +
        "capacity-planning breakdown a multimodal data platform " +
        "publishes per ingest source. One scan, exact integer " +
        "byte/count aggregation, the per-source totals ride a second " +
        "tiny aggregation joined back (map-side combinable " +
        "throughout); only the stub decode separates this from the " +
        "production job.",
      (s, dir) => {
        val m = Tables.t(s, dir, "documents")
          .select(col("source"), length(col("text").cast("binary")).as("len"))
          .select(col("source"), col("len"),
            when(col("len") % 25 === 0, lit("image")).otherwise(lit("video")).as("modality"),
            when(col("len") % 2 === 0, lit("fake/rgb")).otherwise(lit("fake/yuv")).as("codec"))
        val cells = m.groupBy("source", "modality", "codec")
          .agg(count(lit(1)).as("n_items"), sum(col("len").cast("long")).as("bytes"))
        val tots = cells.groupBy("source").agg(sum(col("bytes")).as("tb"))
        cells.join(tots, Seq("source"))
          .select(col("source"), col("modality"), col("codec"),
            col("n_items"), col("bytes"),
            round(col("bytes").cast("double") / col("tb"), 4).as("byte_share"))
          .orderBy("source", "modality", "codec")
      },
      Some("""WITH m AS (SELECT source, strlen(text) AS len,
            CASE WHEN strlen(text) % 25 = 0 THEN 'image' ELSE 'video' END
              AS modality,
            CASE WHEN strlen(text) % 2 = 0 THEN 'fake/rgb' ELSE 'fake/yuv' END
              AS codec
          FROM documents),
        cells AS (SELECT source, modality, codec, count(*) AS n_items,
            CAST(sum(len) AS BIGINT) AS bytes
          FROM m GROUP BY 1, 2, 3),
        tots AS (SELECT source, CAST(sum(bytes) AS BIGINT) AS tb
          FROM cells GROUP BY 1)
        SELECT source, modality, codec, n_items, bytes,
          round(CAST(bytes AS DOUBLE) / tb, 4) AS byte_share
        FROM cells JOIN tots USING (source)
        ORDER BY source, modality, codec"""))
  )
}
