package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable text-analysis operators for training-data pipelines — the
  * library surface behind the `q_lang_id` / `q_quality_score` /
  * `q_token_count` / `q_text_stats` queries. Everything is a narrow
  * map-side transform except the token-frequency aggregate.
  */
object TextAnalysis {

  /** Top-k token frequencies: (token, cnt) by cnt desc, token asc. */
  def tokenFrequencies(df: DataFrame, textCol: String, topK: Int = 20): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token"))
      .limit(topK)

  /** Default stopword dictionaries for the language-ID heuristic. */
  val defaultStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "un"))

  /** Dictionary-hit language ID: argmax of per-language stopword hits
    * with first-listed-language priority on ties; no hits → "und".
    * Adds `pred_lang` to the frame. */
  def languageId(df: DataFrame, textCol: String,
      dicts: Seq[(String, Seq[String])] = defaultStopwords): DataFrame = {
    val toks = array_distinct(split(col(textCol), " "))
    val scored = dicts.zipWithIndex.foldLeft(df.withColumn("__toks", toks)) {
      case (acc, ((_, words), i)) =>
        // typedLit, not SQL interpolation: words with quotes (l', dell')
        // are legal dictionary entries
        acc.withColumn(s"__s$i", size(array_intersect(col("__toks"), typedLit(words))))
    }
    val langs = dicts.map(_._1)
    val allZero = langs.indices.map(i => s"__s$i = 0").mkString(" AND ")
    val cases = langs.indices.map { i =>
      val geRest = (i + 1 until langs.length).map(j => s"__s$i >= __s$j")
      val cond = if (geRest.isEmpty) "TRUE" else geRest.mkString(" AND ")
      s"WHEN $cond THEN '${langs(i)}'"
    }.mkString(" ")
    scored
      .withColumn("pred_lang", expr(s"CASE WHEN $allZero THEN 'und' $cases END"))
      .drop("__toks" +: langs.indices.map(i => s"__s$i"): _*)
  }

  /** Quality score in [0,1]: length saturation (40%), type-token ratio
    * (40%), average token length saturation (20%). Adds n_tok, ttr,
    * quality columns. */
  def qualityScore(df: DataFrame, textCol: String,
      lengthSat: Double = 50.0, tokenLenSat: Double = 8.0): DataFrame =
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("n_tok", size(col("__toks")).cast("long"))
      .withColumn("ttr", size(array_distinct(col("__toks"))).cast("double") / col("n_tok"))
      .withColumn("__avg_len",
        (length(col(textCol)).cast("double") - (col("n_tok") - 1)) / col("n_tok"))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tok") / lengthSat) * 0.4
          + col("ttr") * 0.4
          + least(lit(1.0), col("__avg_len") / tokenLenSat) * 0.2, 4))
      .withColumn("ttr", round(col("ttr"), 4))
      .drop("__toks", "__avg_len")

  /** Whitespace token count and BPE-ish regex token count (letter runs |
    * digit runs | single punctuation). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(col(textCol),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long"))
}
