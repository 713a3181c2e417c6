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
        FROM documents ORDER BY doc_id"""))
  )
}
