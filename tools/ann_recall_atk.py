#!/usr/bin/env python3
"""recall@k of an ANN top-k join dump against the exact top-k, computed
in DuckDB (the Spark quadratic baseline is needless here: DuckDB's
vectorized all-pairs cosine over the 64-dim lists finishes the 20k-vector
sf1.0 fixture in tens of seconds, where a driver-side Spark window over
the 400M-pair crossJoin ran >25 CPU-minutes).

Usage: ann_recall_atk.py <sfDir> <annDumpDir> [k]
  <annDumpDir> = a graft.Verify output dir containing q_ann_join/ (the
  parquet dump whose (vec_id, neighbor_id) pairs are scored).

The exact side mirrors the engine's tie-break: sim DESC, neighbor id ASC,
cosine rounded AFTER ranking is NOT applied (raw-double ranking, like
Similarity.annJoin's re-rank before its 4dp output rounding) — for
recall@k the roundings cancel since both sides rank the same doubles.
"""
import sys, glob
import duckdb

sf_dir = sys.argv[1]
dump_dir = sys.argv[2]
k = int(sys.argv[3]) if len(sys.argv) > 3 else 5

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
ann_files = glob.glob(f"{dump_dir}/q_ann_join/*.parquet")
assert ann_files, f"no q_ann_join dump under {dump_dir}"
con.execute(f"CREATE VIEW ann AS SELECT * FROM read_parquet('{ann_files[0]}')")

row = con.execute(f"""
WITH base AS (SELECT vec_id, embedding AS e FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) > 0),
pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_sum(list_transform(list_zip(a.e, b.e),
           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
       FROM base a JOIN base b ON a.vec_id <> b.vec_id),
topk AS (SELECT ia, ib FROM (
           SELECT ia, ib, row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn
           FROM pr) WHERE rn <= {k}),
annp AS (SELECT DISTINCT vec_id AS ia, neighbor_id AS ib FROM ann)
SELECT (SELECT count(*) FROM topk) AS exact_n,
       (SELECT count(*) FROM annp) AS ann_n,
       (SELECT count(*) FROM topk JOIN annp USING (ia, ib)) AS hit
""").fetchone()
exact_n, ann_n, hit = row
print(f'{{"sf":"{sf_dir}","metric":"recall@{k}","exact_pairs":{exact_n},'
      f'"ann_pairs":{ann_n},"hit":{hit},"recall":{hit/exact_n if exact_n else 1.0}}}')
