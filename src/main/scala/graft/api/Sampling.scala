package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible alternative to
  * `df.sample()` for corpus construction. `rand()`-based sampling gives a
  * different corpus every run (and per retry of a failed task!); hashing
  * the CONTENT pins each row's fate: the same document always lands in
  * the same bucket across runs, clusters, and engines, so train/eval
  * splits are stable and any engine that can md5 can reproduce the
  * split (the DuckDB oracle runs the identical formula).
  *
  * The bucket is the first 8 hex chars of md5 (32 bits, uniform) mod
  * 100 — pure map-side, codegen'd, no shuffle.
  */
object Sampling {

  /** Stable bucket in [0, 100) from a column's content. */
  def hashBucket(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 100

  /** Keep rows whose content-hash bucket < pct (≈ pct% deterministic
    * sample). */
  def sample(df: DataFrame, onCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(onCol)) < pct)

  /** Per-stratum rates (stratum value → pct), `defaultPct` for strata
    * not in the map — e.g. downsample dominant languages, keep all of
    * rare ones. */
  def stratifiedSample(df: DataFrame, onCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame =
    df.filter(hashBucket(col(onCol)) <
      coalesce(element_at(typedLit(rates), col(strataCol)), lit(defaultPct)))
}
