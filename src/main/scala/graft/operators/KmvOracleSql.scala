package graft.operators

/** DuckDB oracle SQL for `q_kmv_overlap`, built programmatically.
  *
  * A KMV sketch is a DETERMINISTIC function of the input set — the k
  * smallest distinct 63-bit values of xxhash64(gram) — so despite being
  * an "approximate" estimator the query output is exactly replayable:
  * [[XxhashSqlChain]] re-runs XXH64(seed 42) over the distinct 3-word
  * shingles (the q_dedup_minhash chain with the fixed seed), the sign
  * bit is cleared (`h & Long.MaxValue` ≡ mod 2⁶³), each source keeps
  * its 256 smallest distinct values (row_number), and the theta-cut
  * intersection estimator is plain arithmetic: θ = min of the two
  * 256-th minima (Long.MaxValue sentinel when un-full), samples cut at
  * θ, est_shared = |∩|·2⁶³/θ, jaccard = |∩|/|∪|. The one double
  * division (2⁶³/θ) and multiply are correctly-rounded IEEE ops on both
  * engines, so even the "estimate" matches bit-for-bit.
  *
  * Validated by `tools/gen_kmv_sql.py` (the same generator in Python,
  * checked against the Spark dumps at sf0.001/0.01/0.1: 190 pair rows
  * each, zero mismatches).
  */
object KmvOracleSql {
  import XxhashSqlChain.word64

  private val MaxL = "9223372036854775807" // Long.MaxValue sentinel (un-full theta)
  private val T63 = "9223372036854775808" // 2^63

  lazy val sql: String = {
    val (ctes, fin, last) = XxhashSqlChain.emit("42::HUGEINT", "tok")
    s"""WITH
sg AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
       FROM (SELECT source, string_split(text, ' ') AS t
             FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
       WHERE len(t) >= 3),
tok0 AS (SELECT DISTINCT tok FROM sg),
tokb AS (SELECT tok, octet_length(encode(tok)) AS n,
           ${XxhashSqlChain.byteList} AS bl
         FROM tok0),
toww AS (SELECT tok, n, bl,
           list_transform(range(0, n//8), k -> $word64) AS w
         FROM tokb),
$ctes,
hsh AS (SELECT tok, (($fin) % $T63::HUGEINT)::BIGINT AS v FROM $last),
sv AS (SELECT DISTINCT s.source, h.v FROM sg s JOIN hsh h USING (tok)),
rk AS (SELECT source, v,
         row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
       FROM sv),
sk AS (SELECT source, v, rn, cnt FROM rk WHERE rn <= 256),
th AS (SELECT source,
         CASE WHEN max(cnt) < 256 THEN $MaxL
              ELSE max(CASE WHEN rn = 256 THEN v END) END AS theta
       FROM sk GROUP BY source),
pr AS (SELECT a.source AS group_a, b.source AS group_b,
         least(a.theta, b.theta) AS th
       FROM th a JOIN th b ON a.source < b.source),
ia AS (SELECT p.group_a, p.group_b, p.th, s.v
       FROM pr p JOIN sk s ON s.source = p.group_a
       WHERE s.v < p.th OR p.th = $MaxL),
ib AS (SELECT p.group_a, p.group_b, s.v
       FROM pr p JOIN sk s ON s.source = p.group_b
       WHERE s.v < p.th OR p.th = $MaxL),
cnts AS (SELECT p.group_a, p.group_b, any_value(p.th) AS th,
           (SELECT count(*) FROM ia WHERE ia.group_a = p.group_a AND ia.group_b = p.group_b) AS na,
           (SELECT count(*) FROM ib WHERE ib.group_a = p.group_a AND ib.group_b = p.group_b) AS nb,
           (SELECT count(*) FROM ia JOIN ib ON ia.group_a = ib.group_a
              AND ia.group_b = ib.group_b AND ia.v = ib.v
            WHERE ia.group_a = p.group_a AND ia.group_b = p.group_b) AS i
         FROM pr p GROUP BY p.group_a, p.group_b)
SELECT group_a, group_b,
       round(i * (CASE WHEN th = $MaxL THEN 1.0
                       ELSE $T63.0 / CAST(th AS DOUBLE) END), 2) AS est_shared,
       round(CASE WHEN na + nb - i = 0 THEN 0.0
                  ELSE i * 1.0 / (na + nb - i) END, 4) AS jaccard
FROM cnts
ORDER BY group_a, group_b"""
  }
}
