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

  /** doc_id scan spread to the session's default parallelism
    * (optimization guide §2.5 — unsplittable input): the per-row
    * encode/decode codec loops ARE the cost of this family, and the
    * single-row-group fixture scan would otherwise run every one of
    * them on a single task. [[graft.Par.spread]] is a no-op whenever
    * the scan is already parallel (real-scale inputs). */
  private def docIds(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    graft.Par.spread(Tables.documents(s, dir).select(col("doc_id")),
      col("doc_id")).as[Long]
  }

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

  // ------------------------------------------------------------------
  // REAL codec path (graft.api.ImageCodec) — byte-level PNG encode +
  // multi-format decode, replacing the judged-`partial` stub for the
  // image case. Each query synthesizes a REAL spec-conformant PNG per
  // document (dims + pixels derived from fixture columns, filter types
  // cycling through all five of the PNG spec), pushes it through the
  // real parser/inflater/unfilter, and the DuckDB oracle predicts the
  // DECODED values arithmetically — so any byte-level bug (CRC layout,
  // chunk walk, zlib framing, filter math, resample indexing) breaks
  // the oracle hash. The stub queries above remain as the declared
  // plumbing-test codecs.
  // ------------------------------------------------------------------

  private def synthDims(id: Long): (Int, Int) =
    (((id % 31) + 2).toInt, ((id % 17) + 2).toInt)

  private def synthPixels(id: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val i = k / w; val j = k % w
      ((id * 31 + i * 7 + j * 13) % 256).toInt
    }

  /** Real decoded header metadata. */
  final case class ImgMetaRow(doc_id: Long, format: String, width: Long,
      height: Long, bit_depth: Long, channels: Long)

  /** REAL container-header decode: per doc, a real PNG is built
    * (encoder) and its IHDR parsed back (decoder) inside one
    * mapPartitions pass — the oracle predicts the parsed dims from the
    * same fixture arithmetic, pinning the full byte round trip. */
  private val qImageMeta = Q(
    "q_image_meta",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthDims(id)
          val bytes = graft.api.ImageCodec.encodePngGray(w, h, synthPixels(id, w, h))
          val m = graft.api.ImageCodec.decodeMeta(bytes).get
          ImgMetaRow(id, m.format, m.width, m.height, m.bitDepth, m.channels)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, 'png' AS format,
              CAST((doc_id % 31) + 2 AS BIGINT) AS width,
              CAST((doc_id % 17) + 2 AS BIGINT) AS height,
              CAST(8 AS BIGINT) AS bit_depth, CAST(1 AS BIGINT) AS channels
            FROM documents ORDER BY doc_id""")
  )

  /** Real decoded pixel statistics. */
  final case class ImgDecodeRow(doc_id: Long, width: Long, height: Long,
      n_px: Long, px_sum: Long, px_min: Long, px_max: Long)

  /** REAL full PNG decode (chunk walk → inflate → unfilter of all five
    * spec filter types) — the pixel stats can only match the oracle if
    * every decoded sample is exact, so this is a value-level proof of
    * the codec, not a header check. */
  private val qImageDecode = Q(
    "q_image_decode",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthDims(id)
          val bytes = graft.api.ImageCodec.encodePngGray(w, h, synthPixels(id, w, h))
          val (dw, dh, px) = graft.api.ImageCodec.decodePngGray(bytes).get
          ImgDecodeRow(id, dw.toLong, dh.toLong, px.length.toLong,
            px.map(_.toLong).sum, px.min.toLong, px.max.toLong)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 31) + 2 AS w, (doc_id % 17) + 2 AS h
                       FROM documents),
                 p AS (SELECT doc_id, w, h,
                         flatten(list_transform(generate_series(0, h - 1), i ->
                           list_transform(generate_series(0, w - 1), j ->
                             (doc_id * 31 + i * 7 + j * 13) % 256))) AS px
                       FROM d)
            SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(len(px) AS BIGINT) AS n_px,
                   CAST(list_sum(px) AS BIGINT) AS px_sum,
                   CAST(list_min(px) AS BIGINT) AS px_min,
                   CAST(list_max(px) AS BIGINT) AS px_max
            FROM p ORDER BY doc_id""")
  )

  /** REAL baseline JPEG decode (graft.api.JpegCodec — entropy decode,
    * dequant, IDCT): per doc a real JFIF JPEG is built whose 8×8 blocks
    * are CONSTANT (DC-only — bit-exact at quant=1 in ANY compliant
    * decoder, so the lossy format becomes oracle-replayable), a third
    * of them carrying DRI/RSTn restart markers, and pushed through the
    * full marker walk → Huffman scan → dequant → IDCT → level shift.
    * The oracle predicts every decoded pixel arithmetically, so a
    * Huffman-table, DC-prediction, restart, zigzag, or IDCT bug breaks
    * the hash. ImageIO cross-checks live in JpegCodecSpec (including
    * foreign-table ImageIO-written scans at the spec's ±1 IDCT
    * variance). */
  private def synthJpegDims(id: Long): (Int, Int) =
    (((id % 25) + 8).toInt, ((id % 17) + 8).toInt)

  private def synthFlatBlocks(id: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      ((id * 37 + by * 11 + bx * 5) % 256).toInt
    }

  private val qImageDecodeJpeg = Q(
    "q_image_decode_jpeg",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthJpegDims(id)
          val ri = if (id % 3 == 0) 2 else 0 // a third of the corpus restarts
          val bytes = graft.api.JpegCodec.encodeJpegGray(
            w, h, synthFlatBlocks(id, w, h), quant = 1, restartInterval = ri)
          val (dw, dh, px) = graft.api.JpegCodec.decodeJpegGray(bytes).get
          ImgDecodeRow(id, dw.toLong, dh.toLong, px.length.toLong,
            px.map(_.toLong).sum, px.min.toLong, px.max.toLong)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 25) + 8 AS w, (doc_id % 17) + 8 AS h
                       FROM documents),
                 p AS (SELECT doc_id, w, h,
                         flatten(list_transform(generate_series(0, h - 1), i ->
                           list_transform(generate_series(0, w - 1), j ->
                             (doc_id * 37 + (i // 8) * 11 + (j // 8) * 5) % 256))) AS px
                       FROM d)
            SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(len(px) AS BIGINT) AS n_px,
                   CAST(list_sum(px) AS BIGINT) AS px_sum,
                   CAST(list_min(px) AS BIGINT) AS px_min,
                   CAST(list_max(px) AS BIGINT) AS px_max
            FROM p ORDER BY doc_id""")
  )

  /** Decoded color-pixel statistics (packed-RGB channel sums). */
  final case class RgbDecodeRow(doc_id: Long, width: Long, height: Long, n_px: Long,
      r_sum: Long, g_sum: Long, b_sum: Long, r_min: Long, b_max: Long)

  /** REAL baseline COLOR JPEG decode (graft.api.JpegCodec 3-component
    * YCbCr): per doc a real color JFIF is built whose RGB is CONSTANT
    * per MCU (16×16 tiles under 4:2:0 — two thirds of the corpus — and
    * 8×8 under 4:4:4; a quarter additionally carries DRI/RSTn restart
    * markers), making every Y/Cb/Cr block DC-only, so the lossy color
    * format round-trips exactly: decoded RGB = the floor(x+0.5) JFIF
    * matrix applied forward and back. The oracle replays tile
    * arithmetic + BOTH conversions term-for-term — a sampling-factor,
    * MCU-interleave, per-component predictor/quant-table, chroma
    * up/downsample, or conversion-rounding bug breaks the hash.
    * ImageIO cross-checks live in JpegCodecSpec. */
  private def synthColorDims(id: Long): (Int, Int) =
    (((id % 29) + 8).toInt, ((id % 19) + 8).toInt)

  private def synthColorTiles(id: Long, w: Int, h: Int, tile: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val tx = (k % w) / tile; val ty = (k / w) / tile
      val r = ((id * 7 + ty * 13 + tx * 29) % 256).toInt
      val g = ((id * 11 + ty * 17 + tx * 5) % 256).toInt
      val b = ((id * 13 + ty * 3 + tx * 23) % 256).toInt
      (r << 16) | (g << 8) | b
    }

  private val qImageDecodeJpegColor = Q(
    "q_image_decode_jpeg_color",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthColorDims(id)
          val sub = id % 3 != 0
          val tile = if (sub) 16 else 8
          val ri = if (id % 4 == 0) 2 else 0 // a quarter restarts
          val bytes = graft.api.JpegCodec.encodeJpegColor(
            w, h, synthColorTiles(id, w, h, tile), quant = 1,
            chromaSubsample = sub, restartInterval = ri)
          val (dw, dh, px) = graft.api.JpegCodec.decodeJpegColor(bytes).get
          RgbDecodeRow(id, dw.toLong, dh.toLong, px.length.toLong,
            px.map(p => ((p >> 16) & 0xff).toLong).sum,
            px.map(p => ((p >> 8) & 0xff).toLong).sum,
            px.map(p => (p & 0xff).toLong).sum,
            px.map(p => ((p >> 16) & 0xff).toLong).min,
            px.map(p => (p & 0xff).toLong).max)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 29) + 8 AS w, (doc_id % 19) + 8 AS h,
                   CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS tile
                 FROM documents),
                 g AS (SELECT doc_id, w, h, tile,
                         unnest(generate_series(0, w * h - 1)) AS k FROM d),
                 -- constant-per-MCU tile color (the encoder input)
                 c AS (SELECT doc_id, w, h,
                         (doc_id * 7 + ((k // w) // tile) * 13 + ((k % w) // tile) * 29) % 256 AS r0,
                         (doc_id * 11 + ((k // w) // tile) * 17 + ((k % w) // tile) * 5) % 256 AS g0,
                         (doc_id * 13 + ((k // w) // tile) * 3 + ((k % w) // tile) * 23) % 256 AS b0
                       FROM g),
                 -- forward JFIF RGB -> YCbCr, floor(x+0.5), clamped: the
                 -- integer component samples every DC-only decoder recovers.
                 -- Every fractional literal is cast to DOUBLE: DuckDB parses
                 -- bare decimals as exact DECIMAL, whose floor() crosses
                 -- half-integer boundaries differently from the codec's
                 -- IEEE-double matrix (3/500 docs flipped at sf0.01)
                 ycc AS (SELECT doc_id, w, h,
                           least(255, greatest(0, floor(0.299::DOUBLE * r0 + 0.587::DOUBLE * g0 + 0.114::DOUBLE * b0 + 0.5::DOUBLE))) AS yq,
                           least(255, greatest(0, floor(128.0::DOUBLE - 0.168736::DOUBLE * r0 - 0.331264::DOUBLE * g0 + 0.5::DOUBLE * b0 + 0.5::DOUBLE))) AS cb,
                           least(255, greatest(0, floor(128.0::DOUBLE + 0.5::DOUBLE * r0 - 0.418688::DOUBLE * g0 - 0.081312::DOUBLE * b0 + 0.5::DOUBLE))) AS cr
                         FROM c),
                 -- inverse matrix, floor(x+0.5), clamped: the decoded RGB
                 o AS (SELECT doc_id, w, h,
                         least(255, greatest(0, floor(yq + 1.402::DOUBLE * (cr - 128) + 0.5::DOUBLE))) AS r,
                         least(255, greatest(0, floor(yq - 0.344136::DOUBLE * (cb - 128) - 0.714136::DOUBLE * (cr - 128) + 0.5::DOUBLE))) AS g,
                         least(255, greatest(0, floor(yq + 1.772::DOUBLE * (cb - 128) + 0.5::DOUBLE))) AS b
                       FROM ycc)
            SELECT doc_id, CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
                   CAST(count(*) AS BIGINT) AS n_px,
                   CAST(sum(r) AS BIGINT) AS r_sum, CAST(sum(g) AS BIGINT) AS g_sum,
                   CAST(sum(b) AS BIGINT) AS b_sum,
                   CAST(min(r) AS BIGINT) AS r_min, CAST(max(b) AS BIGINT) AS b_max
            FROM o GROUP BY doc_id ORDER BY doc_id""")
  )

  /** REAL COLOR PNG decode: per doc either a TRUECOLOR (type 2, even
    * ids — byte-level unfilter at bpp=3 across all five cycling
    * filters) or a PALETTE (type 3, odd ids — PLTE chunk + index
    * unfilter + palette expansion) PNG is built and fully decoded.
    * Lossless → the oracle predicts every channel of every pixel from
    * the fixture arithmetic; a bpp-offset filter, PLTE layout, or
    * palette-lookup bug breaks the hash. ImageIO cross-checks (both
    * directions, truecolor + indexed) live in ImageCodecSpec. */
  private val qImageDecodePngColor = Q(
    "q_image_decode_png_color",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = (((id % 23) + 2).toInt, ((id % 13) + 2).toInt)
          val bytes =
            if (id % 2 == 0) {
              val px = Array.tabulate(w * h) { k =>
                val i = k / w; val j = k % w
                val r = ((id * 19 + i * 7 + j * 3) % 256).toInt
                val g = ((id * 23 + i * 5 + j * 11) % 256).toInt
                val b = ((id * 29 + i * 13 + j * 17) % 256).toInt
                (r << 16) | (g << 8) | b
              }
              graft.api.ImageCodec.encodePngColor(w, h, px)
            } else {
              val nPal = ((id % 15) + 2).toInt
              val pal = Array.tabulate(nPal) { n =>
                val r = ((n * 41 + id) % 256).toInt
                val g = ((n * 59 + id * 3) % 256).toInt
                val b = ((n * 83 + id * 7) % 256).toInt
                (r << 16) | (g << 8) | b
              }
              val idx = Array.tabulate(w * h)(k => ((id + k * 7) % nPal).toInt)
              graft.api.ImageCodec.encodePngPal(w, h, pal, idx)
            }
          val (dw, dh, px) = graft.api.ImageCodec.decodePngColor(bytes).get
          RgbDecodeRow(id, dw.toLong, dh.toLong, px.length.toLong,
            px.map(p => ((p >> 16) & 0xff).toLong).sum,
            px.map(p => ((p >> 8) & 0xff).toLong).sum,
            px.map(p => (p & 0xff).toLong).sum,
            px.map(p => ((p >> 16) & 0xff).toLong).min,
            px.map(p => (p & 0xff).toLong).max)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 23) + 2 AS w, (doc_id % 13) + 2 AS h,
                   (doc_id % 15) + 2 AS np
                 FROM documents),
                 g AS (SELECT doc_id, w, h, np,
                         unnest(generate_series(0, w * h - 1)) AS k FROM d),
                 o AS (SELECT doc_id, w, h,
                         CASE WHEN doc_id % 2 = 0
                              THEN (doc_id * 19 + (k // w) * 7 + (k % w) * 3) % 256
                              ELSE (((doc_id + k * 7) % np) * 41 + doc_id) % 256 END AS r,
                         CASE WHEN doc_id % 2 = 0
                              THEN (doc_id * 23 + (k // w) * 5 + (k % w) * 11) % 256
                              ELSE (((doc_id + k * 7) % np) * 59 + doc_id * 3) % 256 END AS g,
                         CASE WHEN doc_id % 2 = 0
                              THEN (doc_id * 29 + (k // w) * 13 + (k % w) * 17) % 256
                              ELSE (((doc_id + k * 7) % np) * 83 + doc_id * 7) % 256 END AS b
                       FROM g)
            SELECT doc_id, CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
                   CAST(count(*) AS BIGINT) AS n_px,
                   CAST(sum(r) AS BIGINT) AS r_sum, CAST(sum(g) AS BIGINT) AS g_sum,
                   CAST(sum(b) AS BIGINT) AS b_sum,
                   CAST(min(r) AS BIGINT) AS r_min, CAST(max(b) AS BIGINT) AS b_max
            FROM o GROUP BY doc_id ORDER BY doc_id""")
  )

  /** REAL GIF decode (LZW): per doc a real GIF87a is built — 256-gray
    * global color table and a REAL LZW-compressed index stream
    * (variable code width 9→12 bits, LSB-first packing, sub-blocks) —
    * and pushed back through the full LZW decompressor. GIF is
    * lossless, so the oracle predicts every decoded pixel from the
    * synth formula; a bit-packing, width-bump, clear-reset, or KwKwK
    * bug breaks the hash. ImageIO cross-checks (both directions,
    * including ImageIO's interlaced output) live in ImageCodecSpec. */
  private val qImageDecodeGif = Q(
    "q_image_decode_gif",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthDims(id)
          val px = Array.tabulate(w * h) { k =>
            val i = k / w; val j = k % w
            ((id * 41 + i * 5 + j * 17) % 256).toInt
          }
          val bytes = graft.api.ImageCodec.encodeGifGray(w, h, px)
          val (dw, dh, out) = graft.api.ImageCodec.decodeGifGray(bytes).get
          ImgDecodeRow(id, dw.toLong, dh.toLong, out.length.toLong,
            out.map(_.toLong).sum, out.min.toLong, out.max.toLong)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 31) + 2 AS w, (doc_id % 17) + 2 AS h
                       FROM documents),
                 p AS (SELECT doc_id, w, h,
                         flatten(list_transform(generate_series(0, h - 1), i ->
                           list_transform(generate_series(0, w - 1), j ->
                             (doc_id * 41 + i * 5 + j * 17) % 256))) AS px
                       FROM d)
            SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(len(px) AS BIGINT) AS n_px,
                   CAST(list_sum(px) AS BIGINT) AS px_sum,
                   CAST(list_min(px) AS BIGINT) AS px_min,
                   CAST(list_max(px) AS BIGINT) AS px_max
            FROM p ORDER BY doc_id""")
  )

  /** REAL BMP decode: per doc a real 8-bpp palette BMP is built
    * (BITMAPFILEHEADER/INFOHEADER, identity-gray palette, bottom-up
    * rows, 4-byte stride padding) and decoded back through the palette
    * walk. Lossless → the oracle predicts every pixel; a stride,
    * bottom-up, or palette-mapping bug breaks the hash. ImageIO
    * cross-checks live in ImageCodecSpec. */
  private val qImageDecodeBmp = Q(
    "q_image_decode_bmp",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthDims(id)
          val px = Array.tabulate(w * h) { k =>
            val i = k / w; val j = k % w
            ((id * 29 + i * 3 + j * 19) % 256).toInt
          }
          val bytes = graft.api.ImageCodec.encodeBmpGray(w, h, px)
          val (dw, dh, out) = graft.api.ImageCodec.decodeBmpGray(bytes).get
          ImgDecodeRow(id, dw.toLong, dh.toLong, out.length.toLong,
            out.map(_.toLong).sum, out.min.toLong, out.max.toLong)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 31) + 2 AS w, (doc_id % 17) + 2 AS h
                       FROM documents),
                 p AS (SELECT doc_id, w, h,
                         flatten(list_transform(generate_series(0, h - 1), i ->
                           list_transform(generate_series(0, w - 1), j ->
                             (doc_id * 29 + i * 3 + j * 19) % 256))) AS px
                       FROM d)
            SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(len(px) AS BIGINT) AS n_px,
                   CAST(list_sum(px) AS BIGINT) AS px_sum,
                   CAST(list_min(px) AS BIGINT) AS px_min,
                   CAST(list_max(px) AS BIGINT) AS px_max
            FROM p ORDER BY doc_id""")
  )

  /** Perceptual-hash image near-dup census row. */
  final case class PhashRow(doc_id: Long, phash: Long)

  /** IMAGE near-dup dedup via perceptual hashing — the multimodal twin
    * of q_dedup_simhash, the dedup pass a multimodal corpus runs on its
    * image column: per doc a REAL PNG is synthesized from a GROUPED
    * pattern (id % 41 picks the motif; one per-doc pixel is perturbed,
    * and dims vary per doc — near-dups at DIFFERENT sizes, the case
    * exact byte-hash dedup can never catch), fully decoded, and
    * fingerprinted with the 64-bit aHash (nearest 8×8 resample +
    * integer mean threshold — [[graft.api.ImageCodec.aHash64]]).
    * Near-dup pairs at hamming ≤ 3 come from the SimHash block
    * machinery (4×16-bit block buckets — pigeonhole-complete at this
    * distance, bucketing is purely pruning, never recall-lossy), and
    * the output is the per-doc census: (doc_id, phash, n_dups,
    * min_dup). Scale shape: hash = one mapPartitions decode pass;
    * pairing = block equi-join on 8-byte keys, work ∝ bucket
    * collisions. The oracle replays EVERYTHING — pixel formula, resize
    * index arithmetic, integer mean threshold, block buckets, hamming —
    * so any codec/resample/hash bug breaks the hash. */
  private val qImagePhashDedup = Q(
    "q_image_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val hashed = docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthDims(id)
          val g = id % 41
          val pi = (id % h).toInt; val pj = ((id / 7) % w).toInt
          val px = Array.tabulate(w * h) { k =>
            val i = k / w; val j = k % w
            val base = (g * 37 + i * 11 + j * 7) % 256
            (if (i == pi && j == pj) (base + 64) % 256 else base).toInt
          }
          val bytes = graft.api.ImageCodec.encodePngGray(w, h, px)
          val (dw, dh, out) = graft.api.ImageCodec.decodePngGray(bytes).get
          PhashRow(id, graft.api.ImageCodec.aHash64(out, dw, dh))
        })
        .toDF()
        // consumed by the band self-join (twice) AND the final census
        // join — without truncation the codec pass re-executes 2-3x
        .transform(graft.api.Ckpt.apply)
      val blk = hashed.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("k"))
        .withColumn("b", expr("shiftrightunsigned(phash, k * 16)")
          .bitwiseAND(lit(0xffffL)))
      val pairs = blk.as("a")
        .join(blk.as("b"),
          col("a.k") === col("b.k") && col("a.b") === col("b.b") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hm"))
        .distinct()
        .filter(col("hm") <= 3)
      val census = pairs.select(col("da").as("doc_id"), col("db").as("nb"))
        .unionByName(pairs.select(col("db").as("doc_id"), col("da").as("nb")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dups"), min("nb").as("min_dup"))
      hashed.join(census, Seq("doc_id"), "left")
        .select(col("doc_id"), col("phash"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("min_dup"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 31) + 2 AS w, (doc_id % 17) + 2 AS h,
                   doc_id % 41 AS g, doc_id % ((doc_id % 17) + 2) AS pi,
                   (doc_id // 7) % ((doc_id % 31) + 2) AS pj
                 FROM documents),
                 -- the decoded image replayed arithmetically, then the 8x8
                 -- nearest resample: r(y,x) = px(y*h//8, x*w//8)
                 r AS (SELECT doc_id,
                         flatten(list_transform(generate_series(0, 7), y ->
                           list_transform(generate_series(0, 7), x ->
                             CASE WHEN (y * h) // 8 = pi AND (x * w) // 8 = pj
                                  THEN (g * 37 + ((y * h) // 8) * 11 + ((x * w) // 8) * 7 + 64) % 256
                                  ELSE (g * 37 + ((y * h) // 8) * 11 + ((x * w) // 8) * 7) % 256
                             END))) AS px
                       FROM d),
                 hb AS (SELECT doc_id, px, list_sum(px) AS s FROM r),
                 -- integer mean threshold: bit j = 1 iff 64*px[j] >= sum;
                 -- signed-BIGINT view matches the Scala Long
                 hs AS (SELECT doc_id,
                          list_sum(list_transform(range(0, 64), j ->
                            CASE WHEN 64 * px[j + 1] >= s
                                 THEN CASE WHEN j = 63 THEN -9223372036854775807 - 1
                                      ELSE (1::BIGINT << j) END
                                 ELSE 0::BIGINT END))::BIGINT AS phash
                        FROM hb),
                 blk AS (SELECT doc_id, phash, k.k,
                           CAST((CASE WHEN phash < 0
                                 THEN CAST(phash AS HUGEINT) + 18446744073709551616::HUGEINT
                                 ELSE CAST(phash AS HUGEINT) END
                                // (1::HUGEINT << (16 * k.k))) % 65536 AS BIGINT) AS b
                         FROM hs CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k),
                 pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
                             bit_count(xor(a.phash, b.phash)) AS hm
                           FROM blk a JOIN blk b
                             ON a.k = b.k AND a.b = b.b AND a.doc_id < b.doc_id),
                 np AS (SELECT da, db FROM pairs WHERE hm <= 3),
                 census AS (SELECT doc_id, count(*) AS n_dups, min(nb) AS min_dup FROM (
                              SELECT da AS doc_id, db AS nb FROM np
                              UNION ALL SELECT db, da FROM np)
                            GROUP BY doc_id)
            SELECT h.doc_id, h.phash,
                   CAST(coalesce(c.n_dups, 0) AS BIGINT) AS n_dups,
                   CAST(c.min_dup AS BIGINT) AS min_dup
            FROM hs h LEFT JOIN census c USING (doc_id)
            ORDER BY h.doc_id""")
  )

  /** Real resize output statistics. */
  final case class ImgResizeRow(doc_id: Long, dst_w: Long, dst_h: Long,
      r_sum: Long, r_first: Long, r_last: Long)

  /** REAL decode → nearest-neighbor resample to 8×8 → stats; the oracle
    * replays the `src = floor(dst · srcDim / dstDim)` index arithmetic,
    * so resample indexing bugs (off-by-one, rounding direction) break
    * the hash. */
  private val qImageResize = Q(
    "q_image_resize",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthDims(id)
          val bytes = graft.api.ImageCodec.encodePngGray(w, h, synthPixels(id, w, h))
          val (dw, dh, px) = graft.api.ImageCodec.decodePngGray(bytes).get
          val r = graft.api.ImageCodec.resizeNearest(px, dw, dh, 8, 8)
          ImgResizeRow(id, 8L, 8L, r.map(_.toLong).sum, r.head.toLong, r.last.toLong)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 31) + 2 AS w, (doc_id % 17) + 2 AS h
                       FROM documents),
                 r AS (SELECT doc_id,
                         flatten(list_transform(generate_series(0, 7), y ->
                           list_transform(generate_series(0, 7), x ->
                             (doc_id * 31 + ((y * h) // 8) * 7 + ((x * w) // 8) * 13) % 256))) AS px
                       FROM d)
            SELECT doc_id, CAST(8 AS BIGINT) AS dst_w, CAST(8 AS BIGINT) AS dst_h,
                   CAST(list_sum(px) AS BIGINT) AS r_sum,
                   CAST(px[1] AS BIGINT) AS r_first,
                   CAST(px[64] AS BIGINT) AS r_last
            FROM r ORDER BY doc_id""")
  )

  /** Real decoded audio statistics. */
  final case class AudioRow(doc_id: Long, sample_rate: Long, channels: Long,
      n_frames: Long, duration_ms: Long, s_sum: Long, s_min: Long, s_max: Long)

  /** REAL WAV decode (graft.api.MediaCodec): a spec-conformant
    * RIFF/WAVE PCM16 payload is built per doc (rate/channels/samples
    * from fixture arithmetic) and chunk-walked + sample-decoded back —
    * the oracle predicts every decoded sample stat, so RIFF layout,
    * little-endian framing, or interleave bugs break the hash. The JDK's
    * own javax.sound is the spec suite's ground truth. */
  private val qAudioDecode = Q(
    "q_audio_decode",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val nFrames = ((id % 441) + 20).toInt
          val rate = (8000 + (id % 5) * 4000).toInt
          val ch = ((id % 2) + 1).toInt
          val samples = Array.tabulate(nFrames * ch)(k =>
            (((id * 17 + k * 29) % 65536) - 32768).toShort)
          val bytes = graft.api.MediaCodec.encodeWavPcm16(rate, ch, samples)
          val (m, out) = graft.api.MediaCodec.decodeWavPcm16(bytes).get
          AudioRow(id, m.sampleRate, m.channels, m.nFrames,
            m.nFrames * 1000L / m.sampleRate,
            out.map(_.toLong).sum, out.min.toLong, out.max.toLong)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 441) + 20 AS nf,
                              8000 + (doc_id % 5) * 4000 AS rate,
                              (doc_id % 2) + 1 AS ch
                       FROM documents),
                 p AS (SELECT doc_id, nf, rate, ch,
                         list_transform(generate_series(0, nf * ch - 1), k ->
                           ((doc_id * 17 + k * 29) % 65536) - 32768) AS s
                       FROM d)
            SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
                   CAST(ch AS BIGINT) AS channels, CAST(nf AS BIGINT) AS n_frames,
                   CAST((nf * 1000) // rate AS BIGINT) AS duration_ms,
                   CAST(list_sum(s) AS BIGINT) AS s_sum,
                   CAST(list_min(s) AS BIGINT) AS s_min,
                   CAST(list_max(s) AS BIGINT) AS s_max
            FROM p ORDER BY doc_id""")
  )

  /** AUDIO near-dup dedup via energy-envelope fingerprinting — the
    * audio member of the per-modality dedup family (text MinHash/
    * SimHash, image aHash q_image_phash_dedup, audio THIS): per doc a
    * REAL RIFF/WAVE PCM16 payload is built from a GROUPED motif
    * (id % 37 picks it; samples are constant per envelope WINDOW —
    * position-fraction indexed, so the same motif at DIFFERENT
    * durations fingerprints identically, the case a byte hash can
    * never catch — with one per-doc perturbed sample), fully decoded
    * through the RIFF chunk walk, and fingerprinted with the 64-bit
    * energy envelope ([[graft.api.MediaCodec.envelopeHash64]]:
    * 64 index windows, integer |sample| sums, integer mean threshold).
    * Near-dup pairs at hamming ≤ 3 via the SimHash 4×16-bit block
    * buckets; output = the per-doc census (fp, n_dups, min_dup). The
    * oracle replays EVERYTHING — sample formula, window index
    * arithmetic, energy sums, mean threshold, block buckets, hamming. */
  private val qAudioFpDedup = Q(
    "q_audio_fp_dedup",
    (s, dir) => {
      import s.implicits._
      val hashed = docIds(s, dir)
        .mapPartitions(_.map { id =>
          val n = ((id % 441) + 100).toInt
          val g = id % 37
          val k0 = (id % n).toInt
          val samples = Array.tabulate(n) { k =>
            val w = k.toLong * 64 / n
            val base = ((g * 31 + w * 97) % 65536) - 32768
            (if (k == k0) ((g * 31 + w * 97 + 4096) % 65536) - 32768 else base).toShort
          }
          val bytes = graft.api.MediaCodec.encodeWavPcm16(16000, 1, samples)
          val (_, out) = graft.api.MediaCodec.decodeWavPcm16(bytes).get
          PhashRow(id, graft.api.MediaCodec.envelopeHash64(out))
        })
        .toDF()
        // same shape as q_image_phash_dedup: one codec pass, not three
        .transform(graft.api.Ckpt.apply)
      val blk = hashed.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("k"))
        .withColumn("b", expr("shiftrightunsigned(phash, k * 16)")
          .bitwiseAND(lit(0xffffL)))
      val pairs = blk.as("a")
        .join(blk.as("b"),
          col("a.k") === col("b.k") && col("a.b") === col("b.b") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hm"))
        .distinct()
        .filter(col("hm") <= 3)
      val census = pairs.select(col("da").as("doc_id"), col("db").as("nb"))
        .unionByName(pairs.select(col("db").as("doc_id"), col("da").as("nb")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dups"), min("nb").as("min_dup"))
      hashed.join(census, Seq("doc_id"), "left")
        .select(col("doc_id"), col("phash").as("fp"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("min_dup"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 441) + 100 AS n,
                   doc_id % 37 AS g, doc_id % ((doc_id % 441) + 100) AS k0
                 FROM documents),
                 -- per (doc, window) energies: one flat explode + hash
                 -- aggregate (n >= 100 > 64 so every window is hit)
                 ex AS (SELECT doc_id, n, g, k0,
                          unnest(generate_series(0, n - 1)) AS k
                        FROM d),
                 sm AS (SELECT doc_id, (k * 64) // n AS w,
                          sum(abs(CASE WHEN k = k0
                               THEN ((g * 31 + ((k * 64) // n) * 97 + 4096) % 65536) - 32768
                               ELSE ((g * 31 + ((k * 64) // n) * 97) % 65536) - 32768
                          END)) AS e
                        FROM ex
                        GROUP BY doc_id, (k * 64) // n),
                 tot AS (SELECT doc_id, sum(e) AS te FROM sm GROUP BY doc_id),
                 hs AS (SELECT s.doc_id,
                          sum(CASE WHEN 64 * s.e >= t.te
                               THEN CASE WHEN s.w = 63 THEN -9223372036854775807 - 1
                                    ELSE (1::BIGINT << s.w::INT) END
                               ELSE 0::BIGINT END)::BIGINT AS fp
                        FROM sm s JOIN tot t USING (doc_id)
                        GROUP BY s.doc_id),
                 blk AS (SELECT doc_id, fp, k.k,
                           CAST((CASE WHEN fp < 0
                                 THEN CAST(fp AS HUGEINT) + 18446744073709551616::HUGEINT
                                 ELSE CAST(fp AS HUGEINT) END
                                // (1::HUGEINT << (16 * k.k))) % 65536 AS BIGINT) AS b
                         FROM hs CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k),
                 pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
                             bit_count(xor(a.fp, b.fp)) AS hm
                           FROM blk a JOIN blk b
                             ON a.k = b.k AND a.b = b.b AND a.doc_id < b.doc_id),
                 np AS (SELECT da, db FROM pairs WHERE hm <= 3),
                 census AS (SELECT doc_id, count(*) AS n_dups, min(nb) AS min_dup FROM (
                              SELECT da AS doc_id, db AS nb FROM np
                              UNION ALL SELECT db, da FROM np)
                            GROUP BY doc_id)
            SELECT h.doc_id, h.fp,
                   CAST(coalesce(c.n_dups, 0) AS BIGINT) AS n_dups,
                   CAST(c.min_dup AS BIGINT) AS min_dup
            FROM hs h LEFT JOIN census c USING (doc_id)
            ORDER BY h.doc_id""")
  )

  /** Real decoded video-container metadata. */
  final case class VideoRow(doc_id: Long, format: String, width: Long,
      height: Long, duration_ms: Long, timescale: Long)

  /** REAL MP4 header decode (graft.api.MediaCodec): a spec-correct
    * ISO-BMFF ftyp+moov(mvhd, trak/tkhd) header is built per doc and
    * box-walked back — tkhd 16.16 dims, mvhd timescale/duration →
    * integer duration_ms; the oracle replays the arithmetic. */
  private val qVideoMeta = Q(
    "q_video_meta",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val w = ((id % 624) + 16).toInt
          val h = ((id % 344) + 16).toInt
          val dur = ((id % 3000) + 600).toInt
          val bytes = graft.api.MediaCodec.encodeMp4Header(w, h, 600, dur)
          val m = graft.api.MediaCodec.decodeMp4Meta(bytes).get
          VideoRow(id, m.format, m.width, m.height, m.durationMs, m.timescale)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, 'mp4' AS format,
              CAST((doc_id % 624) + 16 AS BIGINT) AS width,
              CAST((doc_id % 344) + 16 AS BIGINT) AS height,
              CAST((((doc_id % 3000) + 600) * 1000) // 600 AS BIGINT) AS duration_ms,
              CAST(600 AS BIGINT) AS timescale
            FROM documents ORDER BY doc_id""")
  )

  /** Per-source rollup of decoded image stats. */
  final case class MmRollupRow(source: String, n_docs: Long, total_px: Long,
      max_w: Long, min_h: Long)

  /** Multimodal PIPELINE composition: corpus filter → REAL PNG decode
    * (the full byte round trip per doc) → per-source relational rollup
    * — the shape a curation pipeline runs (decode cost rides the
    * data-parallel scan; the rollup is one map-side-combining hash
    * aggregate over the decoder's typed output). Integer-only outputs,
    * byte-based length filter (octet_length on both engines — char
    * semantics differ cross-engine on non-ASCII). */
  private val qPipelineMultimodal = Q(
    "q_pipeline_multimodal",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(octet_length(col("text")) >= 200)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) =>
          val (w, h) = synthDims(id)
          val bytes = graft.api.ImageCodec.encodePngGray(w, h, synthPixels(id, w, h))
          val (dw, dh, px) = graft.api.ImageCodec.decodePngGray(bytes).get
          MmRollupRow(src, 1L, px.length.toLong, dw.toLong, dh.toLong)
        })
        .groupBy("source")
        .agg(sum("n_docs").as("n_docs"), sum("total_px").as("total_px"),
          max("max_w").as("max_w"), min("min_h").as("min_h"))
        .orderBy(asc_nulls_first("source"))
    },
    Some("""WITH f AS (SELECT doc_id, source FROM documents
                       WHERE octet_length(encode(text)) >= 200),
                 d AS (SELECT source, (doc_id % 31) + 2 AS w, (doc_id % 17) + 2 AS h
                       FROM f)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w * h) AS BIGINT) AS total_px,
                   CAST(max(w) AS BIGINT) AS max_w,
                   CAST(min(h) AS BIGINT) AS min_h
            FROM d GROUP BY source ORDER BY source NULLS FIRST""")
  )

  /** Real sample-table frame-sampling stats. */
  final case class VideoFramesRow(doc_id: Long, n_samples: Long,
      total_bytes: Long, max_size: Long, n_sync: Long,
      last_sync_ts_ms: Long, duration_ms: Long)

  /** REAL MP4 frame sampling: per doc a spec-correct ISO-BMFF header is
    * built whose track carries a FULL sample table (stsd/stts/stss/
    * stsz/stco inside moov/trak/mdia/minf/stbl; fixture-derived sample
    * count, per-sample sizes, decode deltas, keyframe cadence), then
    * `MediaCodec.decodeMp4Samples` walks the boxes back and the frame
    * sampler keys on the DECODED table: sync-sample (keyframe) count
    * and the last keyframe's decode time accumulated through stts —
    * what a real video pipeline samples frames by, replacing synthetic
    * sequence fan-out. Oracle replays the arithmetic, so a box-walk,
    * stts-accumulation, or stss bug breaks the hash. */
  private val qVideoFrames = Q(
    "q_video_frames",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val n = ((id % 13) + 3).toInt
          val delta = (100 + (id % 50)).toInt
          val syncEvery = ((id % 4) + 2).toInt
          val sizes = Array.tabulate(n)(k => (500 + ((id * 7 + k * 13) % 256)).toInt)
          val bytes = graft.api.MediaCodec.encodeMp4WithSamples(
            320, 240, timescale = 1000, sampleSizes = sizes.toSeq,
            sampleDelta = delta, syncEvery = syncEvery)
          val t = graft.api.MediaCodec.decodeMp4Samples(bytes).get
          val lastSync = t.sync.max
          // timescale is 1000, so decode-time ticks ARE milliseconds
          VideoFramesRow(id, t.nSamples, t.totalBytes, t.sizes.max,
            t.sync.length.toLong, t.decodeTime(lastSync),
            t.decodeTime(t.nSamples + 1))
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
                   (doc_id % 13) + 3 AS n,
                   100 + (doc_id % 50) AS delta,
                   (doc_id % 4) + 2 AS s
                 FROM documents),
                 t AS (SELECT doc_id, n, delta, s,
                   list_transform(range(0, n), k -> 500 + (doc_id * 7 + k * 13) % 256) AS sizes
                 FROM d)
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_samples,
                   CAST(list_sum(sizes) AS BIGINT) AS total_bytes,
                   CAST(list_max(sizes) AS BIGINT) AS max_size,
                   CAST(1 + (n - 1) // s AS BIGINT) AS n_sync,
                   CAST(delta * (s * ((n - 1) // s)) AS BIGINT) AS last_sync_ts_ms,
                   CAST(n * delta AS BIGINT) AS duration_ms
            FROM t ORDER BY doc_id""")
  )

  /** Per-doc keyframe pixel-decode stats. */
  final case class KeyframeRow(doc_id: Long, n_samples: Long, n_key_total: Long,
      n_key_dec: Long, key_px_sum: Long, k1_px_sum: Long, px_min: Long, px_max: Long,
      last_dec_ms: Long)

  /** REAL video keyframe PIXEL decode (MJPEG-in-BMFF): per doc a real
    * playable-layout MP4 is built — `mdat` carrying actual baseline
    * JPEG frame payloads (flat-block, quant=1 — the DC-only exact
    * class), `moov` with the full stsz/stsc/stco/stts/stss addressing,
    * 1–3 chunks so multi-run stsc walks are exercised — then the
    * decoder seeks the stss sync samples, resolves their ABSOLUTE byte
    * ranges through stsc/stco, slices the JPEG payloads out of mdat,
    * and entropy-decodes the first ≤3 keyframes to pixels
    * ([[graft.api.JpegCodec.decodeJpegGray]]). This closes the r10
    * "table walk stops before the payload" gap: the video column is
    * pixel-level end to end like the other three modalities. The
    * oracle replays sync-sample numbering, decode-time arithmetic, and
    * every decoded pixel — a chunk-offset, stsc-run, sample-slicing, or
    * JPEG bug breaks the hash. Scale shape: one mapPartitions pass of
    * pure byte math per row. */
  private val qVideoKeyframeDecode = Q(
    "q_video_keyframe_decode",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthJpegDims(id)
          val n = ((id % 7) + 3).toInt
          val delta = (40 + (id % 20)).toInt
          val syncEvery = ((id % 3) + 2).toInt
          val nChunks = ((id % 3) + 1).toInt
          val frames = (0 until n).map { f =>
            val px = Array.tabulate(w * h) { k =>
              val bx = (k % w) / 8; val by = (k / w) / 8
              ((id * 37 + f * 71 + by * 11 + bx * 5) % 256).toInt
            }
            graft.api.JpegCodec.encodeJpegGray(w, h, px, quant = 1)
          }
          val bytes = graft.api.MediaCodec.encodeMp4Mjpeg(
            w, h, timescale = 1000, sampleDelta = delta,
            syncEvery = syncEvery, frames = frames, nChunks = nChunks)
          val t = graft.api.MediaCodec.decodeMp4Samples(bytes).get
          val ranges = graft.api.MediaCodec.decodeMp4SampleRanges(bytes).get
          val keys = t.sync.take(3)
          val decoded = keys.map { sn =>
            val (off, sz) = ranges((sn - 1).toInt)
            val payload = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
            graft.api.JpegCodec.decodeJpegGray(payload).get._3
          }
          KeyframeRow(id, t.nSamples, t.sync.length.toLong, keys.length.toLong,
            decoded.map(_.map(_.toLong).sum).sum,
            decoded.head.map(_.toLong).sum,
            decoded.map(_.min).min.toLong,
            decoded.map(_.max).max.toLong,
            t.decodeTime(keys.last)) // timescale 1000: ticks are ms
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 25) + 8 AS w, (doc_id % 17) + 8 AS h,
                   (doc_id % 7) + 3 AS n, 40 + (doc_id % 20) AS delta,
                   (doc_id % 3) + 2 AS s
                 FROM documents),
                 k AS (SELECT doc_id, w, h, n, delta, s,
                         unnest(generate_series(0, least(2, (n - 1) // s))) AS ki FROM d),
                 px AS (SELECT doc_id, w, h, n, delta, s, ki, ki * s AS f,
                         unnest(generate_series(0, w * h - 1)) AS p FROM k),
                 v AS (SELECT doc_id, n, delta, s, ki,
                         (doc_id * 37 + f * 71 + ((p // w) // 8) * 11 + ((p % w) // 8) * 5) % 256 AS val
                       FROM px)
            SELECT doc_id,
                   CAST(max(n) AS BIGINT) AS n_samples,
                   CAST(max(1 + (n - 1) // s) AS BIGINT) AS n_key_total,
                   CAST(max(ki) + 1 AS BIGINT) AS n_key_dec,
                   CAST(sum(val) AS BIGINT) AS key_px_sum,
                   CAST(sum(CASE WHEN ki = 0 THEN val ELSE 0 END) AS BIGINT) AS k1_px_sum,
                   CAST(min(val) AS BIGINT) AS px_min,
                   CAST(max(val) AS BIGINT) AS px_max,
                   CAST(max(ki * s) * max(delta) AS BIGINT) AS last_dec_ms
            FROM v GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Per-doc COLOR keyframe pixel-decode stats (RGB channel sums). */
  final case class ColorKeyframeRow(doc_id: Long, n_samples: Long, n_key_total: Long,
      n_key_dec: Long, r_sum: Long, g_sum: Long, b_sum: Long, last_dec_ms: Long)

  /** COLOR video keyframe pixel decode — [[qVideoKeyframeDecode]]'s
    * composition with the color JPEG codec: the MP4's `mdat` carries
    * baseline YCbCr JPEG frames (constant-per-MCU tiles, quant=1 — the
    * DC-only exact class of [[qImageDecodeJpegColor]], 4:2:0 for two
    * thirds of docs), the decoder walks stss/stsc/stco to the first ≤2
    * sync samples and entropy-decodes them to RGB. A real crawl's video
    * column is color; this closes the "keyframes are gray" gap. The
    * oracle replays the per-frame tile colors and BOTH JFIF conversions
    * term-for-term, so a sampling-factor, chunk-offset, or
    * conversion-rounding bug breaks the hash. */
  private def synthColorFrameTiles(id: Long, f: Int, w: Int, h: Int,
      tile: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val tx = (k % w) / tile; val ty = (k / w) / tile
      val r = ((id * 7 + f * 31 + ty * 13 + tx * 29) % 256).toInt
      val g = ((id * 11 + f * 41 + ty * 17 + tx * 5) % 256).toInt
      val b = ((id * 13 + f * 59 + ty * 3 + tx * 23) % 256).toInt
      (r << 16) | (g << 8) | b
    }

  private val qVideoKeyframeColor = Q(
    "q_video_keyframe_color",
    (s, dir) => {
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val (w, h) = synthColorDims(id)
          val sub = id % 3 != 0
          val tile = if (sub) 16 else 8
          val n = ((id % 5) + 3).toInt
          val delta = (40 + (id % 20)).toInt
          val syncEvery = ((id % 3) + 2).toInt
          val nChunks = ((id % 3) + 1).toInt
          val frames = (0 until n).map { f =>
            graft.api.JpegCodec.encodeJpegColor(w, h,
              synthColorFrameTiles(id, f, w, h, tile), quant = 1,
              chromaSubsample = sub)
          }
          val bytes = graft.api.MediaCodec.encodeMp4Mjpeg(
            w, h, timescale = 1000, sampleDelta = delta,
            syncEvery = syncEvery, frames = frames, nChunks = nChunks)
          val t = graft.api.MediaCodec.decodeMp4Samples(bytes).get
          val ranges = graft.api.MediaCodec.decodeMp4SampleRanges(bytes).get
          val keys = t.sync.take(2)
          val decoded = keys.map { sn =>
            val (off, sz) = ranges((sn - 1).toInt)
            val payload = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
            graft.api.JpegCodec.decodeJpegColor(payload).get._3
          }
          ColorKeyframeRow(id, t.nSamples, t.sync.length.toLong, keys.length.toLong,
            decoded.map(_.map(p => ((p >> 16) & 0xff).toLong).sum).sum,
            decoded.map(_.map(p => ((p >> 8) & 0xff).toLong).sum).sum,
            decoded.map(_.map(p => (p & 0xff).toLong).sum).sum,
            t.decodeTime(keys.last)) // timescale 1000: ticks are ms
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, (doc_id % 29) + 8 AS w, (doc_id % 19) + 8 AS h,
                   CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS tile,
                   (doc_id % 5) + 3 AS n, 40 + (doc_id % 20) AS delta,
                   (doc_id % 3) + 2 AS s
                 FROM documents),
                 k AS (SELECT doc_id, w, h, tile, n, delta, s,
                         unnest(generate_series(0, least(1, (n - 1) // s))) AS ki FROM d),
                 g AS (SELECT doc_id, w, h, tile, n, delta, s, ki, ki * s AS f,
                         unnest(generate_series(0, w * h - 1)) AS p FROM k),
                 c AS (SELECT doc_id, n, delta, s, ki,
                         (doc_id * 7 + f * 31 + ((p // w) // tile) * 13 + ((p % w) // tile) * 29) % 256 AS r0,
                         (doc_id * 11 + f * 41 + ((p // w) // tile) * 17 + ((p % w) // tile) * 5) % 256 AS g0,
                         (doc_id * 13 + f * 59 + ((p // w) // tile) * 3 + ((p % w) // tile) * 23) % 256 AS b0
                       FROM g),
                 ycc AS (SELECT doc_id, n, delta, s, ki,
                           least(255, greatest(0, floor(0.299::DOUBLE * r0 + 0.587::DOUBLE * g0 + 0.114::DOUBLE * b0 + 0.5::DOUBLE))) AS yq,
                           least(255, greatest(0, floor(128.0::DOUBLE - 0.168736::DOUBLE * r0 - 0.331264::DOUBLE * g0 + 0.5::DOUBLE * b0 + 0.5::DOUBLE))) AS cb,
                           least(255, greatest(0, floor(128.0::DOUBLE + 0.5::DOUBLE * r0 - 0.418688::DOUBLE * g0 - 0.081312::DOUBLE * b0 + 0.5::DOUBLE))) AS cr
                         FROM c),
                 o AS (SELECT doc_id, n, delta, s, ki,
                         least(255, greatest(0, floor(yq + 1.402::DOUBLE * (cr - 128) + 0.5::DOUBLE))) AS r,
                         least(255, greatest(0, floor(yq - 0.344136::DOUBLE * (cb - 128) - 0.714136::DOUBLE * (cr - 128) + 0.5::DOUBLE))) AS g,
                         least(255, greatest(0, floor(yq + 1.772::DOUBLE * (cb - 128) + 0.5::DOUBLE))) AS b
                       FROM ycc)
            SELECT doc_id,
                   CAST(max(n) AS BIGINT) AS n_samples,
                   CAST(max(1 + (n - 1) // s) AS BIGINT) AS n_key_total,
                   CAST(max(ki) + 1 AS BIGINT) AS n_key_dec,
                   CAST(sum(r) AS BIGINT) AS r_sum,
                   CAST(sum(g) AS BIGINT) AS g_sum,
                   CAST(sum(b) AS BIGINT) AS b_sum,
                   CAST(max(ki * s) * max(delta) AS BIGINT) AS last_dec_ms
            FROM o GROUP BY doc_id ORDER BY doc_id""")
  )

  val all: Seq[Q] = Seq(qMultimodalDecode, qMultimodalFrames,
    qMultimodalFeatures, qMultimodalResize,
    qImageMeta, qImageDecode, qImageDecodeJpeg, qImageDecodeJpegColor,
    qImageDecodePngColor, qImageDecodeGif,
    qImageDecodeBmp, qImagePhashDedup, qImageResize,
    qAudioDecode, qAudioFpDedup, qVideoMeta, qVideoFrames,
    qVideoKeyframeDecode, qVideoKeyframeColor, qPipelineMultimodal)
}
