package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (record linkage / catalog near-duplicate
  * detection, absent in reference): score candidate pairs with
  * Jaro-Winkler — the name-matching staple — generating candidates with a
  * BLOCKING key instead of the quadratic all-pairs cross.
  *
  * Scale design: the corpus first collapses to its DISTINCT-name frame
  * (scoring is a pure function of the strings, so duplicates ride along
  * for free), then candidates come from an equi self-join on the caller's
  * blocking key — cost Σ_b |block_b|², never |corpus|². The blocking key
  * IS the recall/cost dial: a first-character block catches
  * substitutions/suffixes but misses first-char typos; production
  * linkage runs several keys (first char, soundex-ish, length band) and
  * unions the pair sets — each one an equi-join this same shape. A hot
  * block (all names starting 'S') is the skew risk: cap it upstream or
  * salt the self-join with [[Skew.saltedJoin]]. The scoring kernel is
  * the native [[graft.functions.TextExprs.JaroWinkler]] expression.
  */
object Fuzzy {

  /** All unordered distinct-name pairs sharing `blockKey(name)` with
    * `jaro_winkler(a, b) >= threshold`. Output: `name_a`, `name_b`
    * (name_a < name_b), `jw` (raw double — callers round for display).
    *
    * `blockKey` receives a column holding the name and must be
    * deterministic. */
  def jaroWinklerPairs(df: DataFrame, nameCol: String,
      blockKey: Column => Column, threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0,1], got $threshold")
    graft.functions.VectorExprs.register(df.sparkSession)
    val names = df.select(col(nameCol).as("__name")).filter(col("__name").isNotNull)
      .distinct()
      .withColumn("__block", blockKey(col("__name")))
    val right = names.select(col("__name").as("__name2"), col("__block").as("__block2"))
    names.join(right,
        col("__block") === col("__block2") && col("__name") < col("__name2"))
      .select(col("__name").as("name_a"), col("__name2").as("name_b"),
        expr("graft_jaro_winkler(__name, __name2)").as("jw"))
      .filter(col("jw") >= threshold)
  }
}
