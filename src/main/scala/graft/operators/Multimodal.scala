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

  val all: Seq[Q] = Seq(qMultimodalDecode, qMultimodalFrames)
}
