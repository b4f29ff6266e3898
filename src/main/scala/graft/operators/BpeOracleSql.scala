package graft.operators

/** DuckDB oracle SQL for `q_bpe_learn` and `q_bpe_encode`, built
  * programmatically.
  *
  * BPE is iterative but DETERMINISTIC (count-desc, pair-asc tiebreak),
  * so the 12 merge rounds unroll into a CTE chain: each round counts
  * weighted adjacent symbol pairs over the vocab frame, picks the top
  * pair (a 1-row CTE), and applies the merge. The greedy left-to-right
  * fold is replayed with PLAIN STRING REPLACE on a sentinel rendering —
  * every symbol is `chr(2) || sym || chr(3)`, so `replace(s,
  * [a][b], [ab])` is boundary-safe (a pattern can never match across a
  * symbol's interior) and overlap-correct (matches share no characters,
  * and leftmost non-overlapping replacement IS the fold's semantics:
  * a freshly merged tail can't re-merge in the same round on either
  * side). CTEs are `MATERIALIZED`: each round's vocab is referenced
  * twice (pair count + merge application), and without the hint the
  * 12-deep chain inlines exponentially.
  *
  * `encodeSql` continues from the final vocab state: parse the symbol
  * strings back to lists, explode weighted by word count, top-30 —
  * exactly the learn→apply round trip q_bpe_encode runs (encoding is a
  * pure function of the word, so the vocab frame IS the corpus state).
  *
  * Validated by `tools/gen_bpe_sql.py` against the Spark dumps at
  * sf0.001/0.01/0.1 (12 learn rows + 30 encode rows each, zero
  * mismatches); the merge semantics themselves are pinned against a
  * plain-Scala reference in OperatorPropertiesSpec.
  */
object BpeOracleSql {
  private val Rounds = 12 // mirrors q_bpe_learn/q_bpe_encode

  /** symstr → symbol list: strip the outer sentinels, split on the
    * end+start sentinel pair. */
  private def symParse(col: String): String =
    s"string_split(substr($col, 2, length($col) - 2), chr(3) || chr(2))"

  private lazy val chain: String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""w0 AS (SELECT w, count(*) AS cnt FROM (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents
           WHERE text IS NOT NULL) WHERE length(w) > 0 GROUP BY w),
v1 AS MATERIALIZED (SELECT list_aggregate(
           list_transform(range(1, length(w) + 1),
             i -> chr(2) || substr(w, i, 1) || chr(3)), 'string_agg', '')
         || chr(2) || '</w>' || chr(3) AS s, cnt
       FROM w0)"""
    for (r <- 1 to Rounds) {
      ctes += s"""p$r AS MATERIALIZED (SELECT pr.a, pr.b, sum(cnt) AS c FROM (
          SELECT unnest(list_transform(range(1, len(sy)),
                   i -> struct_pack(a := sy[i], b := sy[i+1]))) AS pr, cnt
          FROM (SELECT ${symParse("s")} AS sy, cnt FROM v$r)
          WHERE len(sy) >= 2) AS t(pr, cnt)
        GROUP BY pr.a, pr.b)"""
      ctes += s"""m$r AS MATERIALIZED (SELECT a, b, c FROM p$r
        ORDER BY c DESC, a ASC, b ASC LIMIT 1)"""
      ctes += s"""v${r + 1} AS MATERIALIZED (SELECT replace(v.s,
            chr(2) || m.a || chr(3) || chr(2) || m.b || chr(3),
            chr(2) || m.a || m.b || chr(3)) AS s, v.cnt
        FROM v$r v CROSS JOIN m$r m)"""
    }
    ctes.mkString(",\n")
  }

  lazy val learnSql: String = {
    val sel = (1 to Rounds).map(r =>
      s"SELECT $r::BIGINT AS round, a AS left, b AS right, a || b AS merged, CAST(c AS BIGINT) AS cnt FROM m$r")
    s"WITH\n$chain\n${sel.mkString("\nUNION ALL ")}\nORDER BY round"
  }

  lazy val encodeSql: String =
    s"""WITH
$chain,
subs AS (SELECT unnest(${symParse("s")}) AS subword, cnt FROM v${Rounds + 1})
SELECT subword, CAST(sum(cnt) AS BIGINT) AS cnt FROM subs
GROUP BY subword ORDER BY cnt DESC, subword ASC LIMIT 30"""
}
