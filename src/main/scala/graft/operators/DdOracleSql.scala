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
}
