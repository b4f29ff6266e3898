package graft.operators

/** DuckDB oracle SQL for `q_dedup_simhash`, built programmatically.
  *
  * The oracle replays the PUBLIC XXH64 spec (seed 42 — the exact hash
  * `graft_simhash` votes with) in pure SQL via [[XxhashSqlChain]]
  * (HUGEINT mod-2⁶⁴ arithmetic, split multiplies, the unrolled <32-byte
  * path with its loud ≥32-byte guard). Tokens are words (fixture max
  * 8 bytes); per-bit votes, block-bucket join, and hamming verify are
  * then plain SQL over the hashed token frame.
  *
  * Validated two ways: `tools/gen_xxh64_sql.py` is the same generator
  * in Python (developed against Spark's own xxhash64 outputs for
  * strings of every tail-length class), and [[graft.SimhashOracleSpec]]
  * pins this Scala emission structurally against a reference XXH64.
  */
object SimhashOracleSql {
  import XxhashSqlChain.{M64, word64}

  lazy val sql: String = {
    val (ctes, fin, last) = XxhashSqlChain.emit("42::HUGEINT", "tok")
    val bitw = (0 until 64)
      .map(j => s"WHEN $j THEN ${BigInt(1) << j}::HUGEINT")
      .mkString(" ")

    s"""WITH
tok0 AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE text IS NOT NULL),
tokb AS (SELECT tok, octet_length(encode(tok)) AS n,
           ${XxhashSqlChain.byteList} AS bl
         FROM tok0),
toww AS (SELECT tok, n, bl,
           list_transform(range(0, n//8), k -> $word64) AS w
         FROM tokb),
$ctes,
hsh AS (SELECT tok, $fin AS h FROM $last),
dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE text IS NOT NULL),
votes AS (SELECT d.doc_id, j.j,
            sum(CASE WHEN (t.h // (CASE j.j $bitw END)) % 2 = 1
                     THEN 1 ELSE -1 END) AS v
          FROM dtok d JOIN hsh t USING (tok)
          CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
          GROUP BY d.doc_id, j.j),
sig AS (SELECT doc_id,
          sum(CASE WHEN v >= 0 THEN (CASE j $bitw END) ELSE 0::HUGEINT END) AS u
        FROM votes GROUP BY doc_id),
sigs AS (SELECT doc_id, u,
           (CASE WHEN u >= 9223372036854775808::HUGEINT
                 THEN u - $M64 ELSE u END)::BIGINT AS s
         FROM sig),
blk AS (SELECT doc_id, u, s, k.k,
          (u // (CASE k.k WHEN 0 THEN 1::HUGEINT WHEN 1 THEN 65536::HUGEINT
                 WHEN 2 THEN 4294967296::HUGEINT ELSE 281474976710656::HUGEINT END)) % 65536 AS b
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k),
-- hot-bucket guard mirror: the Spark side drops any (block, value)
-- bucket holding more than maxBucketDocs=256 documents (TextDedup
-- .simhashPairs via bandBucketCandidates) — kept buckets untruncated
hot AS (SELECT k, b FROM blk GROUP BY k, b HAVING count(*) > 256),
blkk AS (SELECT blk.* FROM blk
         WHERE NOT EXISTS (SELECT 1 FROM hot
                           WHERE hot.k = blk.k AND hot.b = blk.b)),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            bit_count(xor(a.s, b.s)) AS hamming
          FROM blkk a JOIN blkk b ON a.k = b.k AND a.b = b.b AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= 3
ORDER BY doc_a, doc_b"""
  }
}
