package graft.streaming

import graft.api.Drift.PsiReference
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming form of the drift gate ([[graft.api.Drift]]): score each
  * event-time tumbling window of a live stream against a FITTED
  * reference distribution ([[graft.api.Drift.fitPsiReference]]) and
  * emit one PSI row per finalized window — the monitor that pages when
  * a crawler / feed starts shipping a different distribution than the
  * corpus it was validated on.
  *
  * This is a plain watermarked windowed aggregation — no custom state:
  * the reference model rides the plan as LITERALS (nBins−1 cut doubles
  * + nBins reference probabilities), bucket assignment is map-side
  * arithmetic, and per-window state is the nBins count cells. The PSI
  * projection folds the cells AFTER the aggregate, so state per open
  * window is nBins longs regardless of traffic. Append mode + watermark
  * = exactly one final row per window, identical on replay (batch
  * parity property-tested in StreamingSemanticsSpec).
  */
object DriftStream {

  /** Per-window bin-count aggregation + PSI projection, shared verbatim
    * by the streaming query and its batch-parity replay (the parity
    * proof is that the SAME plan runs both ways). */
  private[streaming] def windowedPsi(bucketed: DataFrame, tsCol: String,
      width: String, ref: PsiReference, alpha: Double): DataFrame = {
    val nBins = ref.nBins
    val cells = (1 to nBins).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"c$b"))
    val agged = bucketed
      .groupBy(window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("n"), cells: _*)
    val terms: Seq[Column] = (1 to nBins).map { b =>
      val pr = (ref.binCounts(b - 1) + alpha) / (ref.n + alpha * nBins)
      val pc = (col(s"c$b") + alpha) / (col("n") + alpha * nBins)
      (pc - pr) * log(pc / lit(pr))
    }
    agged.select(
      // unix_millis, not cast-to-long×1000: the cast truncates to whole
      // seconds, so a sub-second window width would alias window-start
      // keys (r8 ADVICE)
      unix_millis(col("w.start")).as("window_start_ms"),
      col("n"),
      terms.reduce(_ + _).as("psi"))
  }

  /** Bucket `valueCol` against the reference cuts (strict `>`, ties to
    * the lower bin — the batch [[graft.api.Drift.psi]] convention). */
  private[streaming] def bucketize(df: DataFrame, valueCol: String,
      ref: PsiReference): DataFrame = {
    // Column-built cut array + col() reference (not string-interpolated
    // SQL text): a column name needing backticks or a non-finite cut
    // can't produce a parse error / invalid literal at runtime (r8
    // ADVICE); fitPsiReference additionally requires finite cuts
    require(ref.cuts.forall(java.lang.Double.isFinite),
      s"non-finite reference cuts: ${ref.cuts}")
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket",
        (aggregate(typedLit(ref.cuts), lit(0),
          (a, c) => a + when(col(valueCol) > c, 1).otherwise(0)) + 1)
          .cast("long"))
  }

  /** Score a streaming frame: one `(window_start_ms, n, psi)` row per
    * finalized `width` tumbling window of `tsCol` (event time,
    * TimestampType), watermarked by `delay`. Run with append output
    * mode; rows arrive once the watermark passes the window end.
    *
    * `valueCol` must be numeric and is compared against `ref.cuts`
    * as double. Rule of thumb: PSI ≥ 0.2 = significant shift. */
  def psiStream(stream: DataFrame, tsCol: String, valueCol: String,
      ref: PsiReference, width: String, delay: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val bucketed = bucketize(
      stream.withWatermark(tsCol, delay)
        .select(col(tsCol), col(valueCol).cast("double").as(valueCol)),
      valueCol, ref)
    windowedPsi(bucketed, tsCol, width, ref, alpha)
  }

  /** The batch replay of [[psiStream]] on a bounded frame — same
    * bucketing, same aggregation, same projection (no watermark). The
    * parity spec runs this against the streamed output. */
  def psiBatch(df: DataFrame, tsCol: String, valueCol: String,
      ref: PsiReference, width: String, alpha: Double = 0.5): DataFrame = {
    val bucketed = bucketize(
      df.select(col(tsCol), col(valueCol).cast("double").as(valueCol)),
      valueCol, ref)
    windowedPsi(bucketed, tsCol, width, ref, alpha)
  }

  // ---- token-distribution drift (the q_drift_js monitor at ingest) ----

  /** Tokenize and map each token to its reference bucket: 1..k for the
    * fitted vocabulary (a LITERAL map in the plan — the model is
    * kilobytes), 0 for OOV. The explode preserves the upstream
    * watermark. */
  private[streaming] def bucketizeTokens(df: DataFrame, tsCol: String,
      textCol: String, ref: graft.api.Drift.TokenReference): DataFrame = {
    val idx: Map[String, Int] =
      ref.tokens.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    df.filter(col(textCol).isNotNull)
      .select(col(tsCol), explode(split(col(textCol), " ")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(tsCol),
        coalesce(element_at(typedLit(idx), col("__tok")), lit(0))
          .cast("long").as("bucket"))
  }

  /** Per-window bucket counts + smoothed Jensen–Shannon projection vs
    * the reference, shared by stream and batch replay (the parity proof
    * is the shared plan, as with [[windowedPsi]]). State per open window
    * is k+1 longs. */
  private[streaming] def windowedJs(bucketed: DataFrame, tsCol: String,
      width: String, ref: graft.api.Drift.TokenReference,
      alpha: Double): DataFrame = {
    val k = ref.k
    val cells = (0 to k).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"c$b"))
    val agged = bucketed
      .groupBy(window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("n"), cells: _*)
    val denomR = ref.n + alpha * (k + 1)
    val terms: Seq[Column] = (0 to k).map { b =>
      val refCount = if (b == 0) ref.oov else ref.counts(b - 1)
      val pr = (refCount + alpha) / denomR
      val pc = (col(s"c$b") + alpha) / (col("n") + lit(alpha) * (k + 1))
      val m = (pc + lit(pr)) / 2.0
      lit(0.5) * pc * log(pc / m) + lit(0.5) * lit(pr) * log(lit(pr) / m)
    }
    agged.select(
      unix_millis(col("w.start")).as("window_start_ms"),
      col("n").as("n_tokens"),
      terms.reduce(_ + _).as("js"))
  }

  /** Streaming token-distribution drift: one
    * `(window_start_ms, n_tokens, js)` row per finalized `width`
    * tumbling window of a live TEXT stream, scored as smoothed
    * Jensen–Shannon divergence against a fitted
    * [[graft.api.Drift.TokenReference]] — the q_drift_js monitor at
    * ingest ("the feed started speaking a different language /
    * template"). Plain watermarked windowed aggregation, no custom
    * state: the vocabulary rides as a literal map, per-window state is
    * k+1 longs. JS is bounded by ln 2; ≥0.1 is a large vocabulary
    * shift. Append mode; rows finalize when the watermark passes the
    * window end. */
  def jsTokenStream(stream: DataFrame, tsCol: String, textCol: String,
      ref: graft.api.Drift.TokenReference, width: String, delay: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    windowedJs(
      bucketizeTokens(stream.withWatermark(tsCol, delay), tsCol, textCol, ref),
      tsCol, width, ref, alpha)
  }

  /** The batch replay of [[jsTokenStream]] on a bounded frame — same
    * bucketing, aggregation, and projection (no watermark). */
  def jsTokenBatch(df: DataFrame, tsCol: String, textCol: String,
      ref: graft.api.Drift.TokenReference, width: String,
      alpha: Double = 0.5): DataFrame =
    windowedJs(bucketizeTokens(df, tsCol, textCol, ref), tsCol, width, ref, alpha)
}
