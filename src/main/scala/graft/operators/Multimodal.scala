package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary content + typed metadata,
  * decoded per-partition through the typed Dataset API (the Scala analog
  * of mapInPandas — batched, executor-side, no driver collect).
  *
  * STUB: real image/audio decode libraries are not available in this
  * environment, so [[stubDecode]] is a clearly-marked deterministic fake
  * keyed on the payload bytes. The Spark-side plumbing — binary column,
  * schema, partition-wise iteration, typed encoders — is real and is what
  * would carry a JNI/FFI decoder at scale. Replace stubDecode's body with
  * the real decoder to productionize.
  */
object Multimodal {

  /** Decoded media metadata (what a real decoder would return). */
  final case class MediaMeta(doc_id: Long, width: Long, height: Long, n_frames: Long)

  /** STUB decoder: deterministic fake dimensions from payload length.
    * A real implementation would parse the container header / decode the
    * first frame here, one native decoder instance per partition. */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n % 640, (n * 7) % 480, n % 16 + 1)
  }

  /** Typed decode pipeline: binary payload → mapPartitions(stubDecode).
    * The fake is arithmetic on byte length, so a SQL oracle still exists —
    * it checks the whole typed round-trip (encoder → partition iterator →
    * encoder), not just the stub. */
  private val qMultimodalDecode = Q(
    "q_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // one (stub) decoder per partition — where a real native decoder
          // would be initialized once and reused across the batch
          it.map { case (id, bytes) => stubDecode(id, bytes) }
        }
        .toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              octet_length(encode(text)) % 640 AS width,
              (octet_length(encode(text)) * 7) % 480 AS height,
              octet_length(encode(text)) % 16 + 1 AS n_frames
            FROM documents ORDER BY doc_id""")
  )

  /** Frame sampling: one row per (stub-)decoded frame — the Generator
    * form a video pipeline uses to fan a clip out into per-frame rows for
    * downstream feature extraction. Frame count comes from the stub
    * decoder's contract; the frame key is a deterministic content
    * address (what a real pipeline would replace with the frame tensor's
    * hash). */
  private val qMultimodalFrames = Q(
    "q_multimodal_frames",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("byte_len", length(col("text").cast("binary")).cast("long"))
        .withColumn("n_frames", col("byte_len") % 16 + 1)
        .select(col("doc_id"), explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("frame_idx").cast("string"))).as("frame_key"))
        .orderBy("doc_id", "frame_idx"),
    Some("""WITH f AS (SELECT doc_id, octet_length(encode(text)) % 16 + 1 AS n_frames FROM documents)
            SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx,
              md5(CAST(doc_id AS VARCHAR) || ':' ||
                  CAST(unnest(generate_series(0, n_frames - 1)) AS VARCHAR)) AS frame_key
            FROM f ORDER BY doc_id, frame_idx""")
  )

  /** Extracted (stub) feature summary — scalar columns only (the driver
    * comparator can't sort raw array columns, CLAUDE.md invariant 1). */
  final case class FeatureRow(doc_id: Long, feat_dim: Long, feat_norm: Double, f0: Double)

  /** STUB feature extractor: 8 deterministic pseudo-features from the
    * payload length — a real implementation would run the vision/audio
    * encoder here, one model instance per partition. Double math so the
    * DuckDB oracle reproduces it bit-for-bit. */
  def stubFeatures(docId: Long, payload: Array[Byte]): FeatureRow = {
    val len = payload.length.toLong
    val feats = Array.tabulate(8)(i => ((len * (i + 3)) % 97).toDouble / 97.0)
    val norm = math.sqrt(feats.map(x => x * x).sum)
    FeatureRow(docId, 8L,
      math.rint(norm * 10000) / 10000, math.rint(feats(0) * 10000) / 10000)
  }

  /** Feature extraction over the typed partition pipeline: payload →
    * per-partition (stub) encoder → scalar feature summary. */
  private val qMultimodalFeatures = Q(
    "q_multimodal_features",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => stubFeatures(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(8 AS BIGINT) AS feat_dim,
              round(sqrt(list_sum(list_transform(generate_series(0, 7),
                i -> pow(((octet_length(encode(text)) * (i + 3)) % 97) / 97.0, 2)))), 4) AS feat_norm,
              round(((octet_length(encode(text)) * 3) % 97) / 97.0, 4) AS f0
            FROM documents ORDER BY doc_id""")
  )

  /** Resized (stub) payload metadata. */
  final case class ResizeRow(doc_id: Long, dst_w: Long, dst_h: Long,
      out_bytes: Long, out_sha: String)

  /** STUB resize: truncate the content to its first 256 CODEPOINTS
    * standing in for a 64×64 re-encode; a real implementation decodes,
    * scales, and re-encodes here. Codepoint truncation (not bytes, not
    * UTF-16 chars) is deliberate: it matches DuckDB `substr` semantics
    * exactly — DuckDB has no blob substring, so a byte-sliced stub
    * would silently diverge from any oracle on multi-byte text. The
    * output hash still covers the UTF-8 BYTES that moved through the
    * typed pipeline. */
  def stubResize(docId: Long, text: String): ResizeRow = {
    val cps = text.codePointCount(0, text.length)
    val end = text.offsetByCodePoints(0, math.min(256, cps))
    val out = text.substring(0, end).getBytes("UTF-8")
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(out)
      .map("%02x".format(_)).mkString
    ResizeRow(docId, 64L, 64L, out.length.toLong, sha)
  }

  /** Resize plumbing: content → per-partition (stub) scaler → resized
    * payload metadata + content hash. */
  private val qMultimodalResize = Q(
    "q_multimodal_resize",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) => stubResize(id, text) })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(64 AS BIGINT) AS dst_w, CAST(64 AS BIGINT) AS dst_h,
              octet_length(encode(substr(text, 1, 256))) AS out_bytes,
              sha256(substr(text, 1, 256)) AS out_sha
            FROM documents ORDER BY doc_id""")
  )

  val all: Seq[Q] = Seq(qMultimodalDecode, qMultimodalFrames,
    qMultimodalFeatures, qMultimodalResize)
}
