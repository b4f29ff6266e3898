package graft.operators

/** DuckDB oracle SQL for `q_dedup_minhash` and `q_dedup_incremental`,
  * built programmatically.
  *
  * The MinHash hash family is XXH64 with per-function seed j (0..31) —
  * `graft_minhash` in [[graft.functions.VectorExprs]] — so the oracle
  * replays it in pure SQL via [[XxhashSqlChain]] with the SEED AS A
  * COLUMN: distinct 3-word shingles × 32 seeds flow through ONE
  * unrolled <32-byte pipeline (fixture max shingle is 26 bytes; a
  * ≥32-byte shingle fails the gate loudly). Signatures are per-(doc,
  * seed) SIGNED minima (the Scala expression compares `Long`s), band
  * keys replay the `concat_ws(',', band_id, sig[4b..4b+3])` string —
  * grouping by the (band_id, 4-tuple) directly, which is the same
  * equivalence the xxhash64 bucket key induces — and candidates are
  * verified with EXACT Jaccard over distinct shingle sets, precisely
  * the batch operator's precision-1.0 verify.
  *
  * Batch ([[sql]]): the `maxBucketDocs = 256` hot-bucket guard drops
  * buckets with more than 256 docs (kept buckets are provably
  * untruncated, mirroring CappedSetAgg + the `size ≤ cap` filter).
  * Incremental ([[incrementalSql]]): NO cap (index equi-joins are
  * uncapped by design) and candidates restricted to pairs touching a
  * new doc (`doc_id % 7 = 0`, the query's batch split) — exactly
  * `minhashPairsIncremental`'s candidate space.
  *
  * Validated by `tools/gen_minhash_sql.py` (the same generator in
  * Python, checked against the Spark dumps at sf0.001/0.01/0.1: 28/25/
  * 256 batch rows, 7/9/61 incremental rows, zero mismatches) and by
  * [[graft.SimhashOracleSpec]]'s per-seed MinHash cross-check.
  */
object MinhashOracleSql {
  import XxhashSqlChain.{M64, word64}

  /** Shared prefix body: distinct per-doc shingles, the hashed
    * (shingle × seed) frame, signed minima, signatures, and band keys —
    * over `docsRel` (the documents table, or the eval census's bounded
    * hash-sample CTE). */
  private def prefixBody(docsRel: String): String = {
    val (ctes, fin, last) = XxhashSqlChain.emit("sd::HUGEINT", "tok, sd")
    s"""dsh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS t
              FROM $docsRel WHERE text IS NOT NULL)
        WHERE len(t) >= 3),
tok0 AS (SELECT DISTINCT tok FROM dsh),
tokb AS (SELECT tok, sd, octet_length(encode(tok)) AS n,
           ${XxhashSqlChain.byteList} AS bl
         FROM tok0 CROSS JOIN (SELECT unnest(range(0, 32)) AS sd) seeds),
toww AS (SELECT tok, sd, n, bl,
           list_transform(range(0, n//8), k -> $word64) AS w
         FROM tokb),
$ctes,
hsh AS (SELECT tok, sd,
          (CASE WHEN $fin >= 9223372036854775808::HUGEINT
                THEN $fin - $M64 ELSE $fin END)::BIGINT AS h
        FROM $last),
mins AS (SELECT d.doc_id, t.sd, min(t.h) AS m
         FROM dsh d JOIN hsh t USING (tok)
         GROUP BY d.doc_id, t.sd),
sig AS (SELECT doc_id, list(m ORDER BY sd) AS sig FROM mins GROUP BY doc_id),
bk AS (SELECT doc_id, b.b AS band_id,
         b.b::VARCHAR || ',' || sig[4*b.b+1]::VARCHAR || ',' || sig[4*b.b+2]::VARCHAR
           || ',' || sig[4*b.b+3]::VARCHAR || ',' || sig[4*b.b+4]::VARCHAR AS key
       FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b)"""
  }

  /** The unbounded prefix (batch + incremental queries). */
  private lazy val prefix: String = s"WITH\n${prefixBody("documents")}"

  /** Shared suffix: exact-Jaccard verify of the `cand` pair frame
    * against the distinct shingle sets, threshold 0.5, round 4. */
  private val verify: String =
    s"""sz AS (SELECT doc_id, count(*) AS nsh FROM dsh GROUP BY doc_id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS i
          FROM cand c JOIN dsh a ON a.doc_id = c.id_a
          JOIN dsh b ON b.doc_id = c.id_b AND b.tok = a.tok
          GROUP BY c.id_a, c.id_b)
SELECT CAST(id_a AS BIGINT) AS doc_a, CAST(id_b AS BIGINT) AS doc_b,
       round(i * 1.0 / (x.nsh + y.nsh - i), 4) AS jaccard
FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
WHERE i * 1.0 / (x.nsh + y.nsh - i) >= 0.5
ORDER BY doc_a, doc_b"""

  /** Batch `q_dedup_minhash`: capped buckets (maxBucketDocs = 256). */
  lazy val sql: String =
    s"""$prefix,
kept AS (SELECT band_id, key FROM bk GROUP BY band_id, key
         HAVING count(*) BETWEEN 2 AND 256),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bk a JOIN kept USING (band_id, key)
         JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
                   AND a.doc_id < b.doc_id),
$verify"""

  /** `q_dedup_eval`: the LSH-vs-exact recall census — the minhash pair
    * chain (capped buckets, exact-Jaccard verify ≥ 0.5) LEFT-joined
    * into the UNGUARDED exact ≥ 0.5 pair frame (same dsh shingle sets
    * and sizes as minhash's own verify, so mh ⊆ exact by construction
    * and the census is pure recall), with mean caught/missed Jaccard
    * diagnostics (DECIMAL sums of the 4dp-rounded values).
    *
    * r13: the census runs over the BOUNDED deterministic sample
    * `TextDedup.lshRecallCensus` elects — the maxDocs=2000
    * smallest-xxhash64(doc_id) documents (hash-ordered LIMIT, the
    * fitIvf seed replay via [[XxhashSqlChain.emitLongHash]] with
    * e-prefixed CTE names so the doc-sample chain coexists with the
    * shingle chain) — a NO-OP at the ≤2000-doc gate fixtures, the
    * wedge-proof bound at sf1.0. */
  lazy val evalSql: String = {
    val (dctes, dfin, dlast) =
      XxhashSqlChain.emitLongHash("doc_id", src = "edocn", namePrefix = "e")
    s"""WITH
edocn AS (SELECT doc_id,
            ((CAST(doc_id AS HUGEINT) % $M64) + $M64) % $M64 AS w
          FROM documents),
$dctes,
esamp AS (SELECT doc_id FROM $dlast ORDER BY $dfin, doc_id LIMIT 2000),
edocs AS (SELECT d.* FROM documents d JOIN esamp USING (doc_id)),
${prefixBody("edocs")},
kept AS (SELECT band_id, key FROM bk GROUP BY band_id, key
         HAVING count(*) BETWEEN 2 AND 256),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bk a JOIN kept USING (band_id, key)
         JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
                   AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS nsh FROM dsh GROUP BY doc_id),
minter AS (SELECT c.id_a, c.id_b, count(*) AS i
           FROM cand c JOIN dsh a ON a.doc_id = c.id_a
           JOIN dsh b ON b.doc_id = c.id_b AND b.tok = a.tok
           GROUP BY c.id_a, c.id_b),
mh AS (SELECT id_a, id_b FROM minter
       JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       WHERE i * 1.0 / (x.nsh + y.nsh - i) >= 0.5),
einter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           FROM dsh a JOIN dsh b ON b.tok = a.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
ex AS (SELECT id_a, id_b, round(i * 1.0 / (x.nsh + y.nsh - i), 4) AS j
       FROM einter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       WHERE i * 1.0 / (x.nsh + y.nsh - i) >= 0.5),
jn AS (SELECT e.j, (m.id_a IS NOT NULL) AS hit
       FROM ex e LEFT JOIN mh m ON m.id_a = e.id_a AND m.id_b = e.id_b),
ag AS (SELECT CAST(count(*) AS BIGINT) AS n_exact,
              CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
              CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_missed,
              sum(CASE WHEN hit THEN CAST(j AS DECIMAL(30,10)) ELSE 0 END) AS sc,
              sum(CASE WHEN hit THEN 0 ELSE CAST(j AS DECIMAL(30,10)) END) AS sm
       FROM jn)
SELECT n_exact, n_caught, n_missed,
       CASE WHEN n_exact > 0
            THEN floor(CAST(n_caught AS DOUBLE) / n_exact * 10000) / 10000
            ELSE 0.0 END AS recall,
       CASE WHEN n_caught > 0
            THEN floor(CAST(sc AS DOUBLE) / n_caught * 10000) / 10000
            ELSE 0.0 END AS jacc_caught_mean,
       CASE WHEN n_missed > 0
            THEN floor(CAST(sm AS DOUBLE) / n_missed * 10000) / 10000
            ELSE 0.0 END AS jacc_missed_mean
FROM ag"""
  }

  /** Incremental `q_dedup_incremental`: uncapped index joins, pairs
    * restricted to those touching a new doc (doc_id % 7 = 0). */
  lazy val incrementalSql: String =
    s"""$prefix,
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bk a JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
                   AND a.doc_id < b.doc_id
         WHERE a.doc_id % 7 = 0 OR b.doc_id % 7 = 0),
$verify"""
}
