#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for the LSH ANN family: q_ann_lsh,
q_ann_join, q_ann_pairs, q_embed_clusters_ann, q_knn_eval_ann.

LSH-with-exact-verify is approximate in RECALL but deterministic as a
FUNCTION: planeSign is integer arithmetic, the per-plane dots are
sequential list_sums (bit-equal to the vec_dot fold — pinned by the
exact-cosine oracles), the occupancy derivation replays from the same
corpus count (log1p(-0.8) emitted as the Java constant; ln(1-p) for the
dynamic leg), and everything downstream (packed keys, hamming-1
multi-probe XOR, 256-cap guard, distinct candidates, exact-cosine
re-rank / threshold / recursive CC closure / majority-vote confusion)
is plain SQL.

Run: python3 tools/gen_ann_sql.py [sf_dir [verify_out_dir]]; the Scala
emission lives in operators/AnnOracleSql.scala. Validated against Spark
dumps at sf0.001/0.01/0.1 — zero mismatches on all five queries."""
import sys, time

# planeSign(p, d): ((p*1000003 + d*7919 + 12345) * 2654435761) bit 17 -> ±1
SIGN = ("(CASE WHEN ((({p}) * 1000003 + ({d}) * 7919 + 12345) * 2654435761 // 131072) % 2 = 0 "
        "THEN -1.0 ELSE 1.0 END)")

def sign_expr(p, d):
    return SIGN.format(p=p, d=d)

DOT_PLANE = ("list_sum(list_transform(range(0, 64), i -> "
             "CAST(e[i + 1] AS DOUBLE) * " + SIGN.format(p="{p}", d="i") + "))")

COS = ("list_sum(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
       " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
       " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))")

def gen_lsh():
    n_planes, bands, w, k = 16, 4, 4, 10
    # sig: per vector, list of 16 bits
    dot = DOT_PLANE.replace("{p}", "p")
    return f"""WITH
base AS (SELECT vec_id, embedding AS e FROM embeddings),
sig AS (SELECT vec_id, e,
          list_transform(range(0, {n_planes}), p ->
            CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) AS sg
        FROM base),
corpus AS (SELECT vec_id AS id, e,
             b.b::VARCHAR || ':' || sg[b.b*{w}+1]::VARCHAR || ':' || sg[b.b*{w}+2]::VARCHAR
               || ':' || sg[b.b*{w}+3]::VARCHAR || ':' || sg[b.b*{w}+4]::VARCHAR AS band
           FROM sig CROSS JOIN (SELECT unnest(range(0, {bands})) AS b) b
           WHERE vec_id <> 0),
probe AS (SELECT s.e AS pe,
            b.b::VARCHAR
              || ':' || (CASE WHEN f.fl = 0 THEN 1 - sg[b.b*{w}+1] ELSE sg[b.b*{w}+1] END)::VARCHAR
              || ':' || (CASE WHEN f.fl = 1 THEN 1 - sg[b.b*{w}+2] ELSE sg[b.b*{w}+2] END)::VARCHAR
              || ':' || (CASE WHEN f.fl = 2 THEN 1 - sg[b.b*{w}+3] ELSE sg[b.b*{w}+3] END)::VARCHAR
              || ':' || (CASE WHEN f.fl = 3 THEN 1 - sg[b.b*{w}+4] ELSE sg[b.b*{w}+4] END)::VARCHAR AS band
          FROM sig s CROSS JOIN (SELECT unnest(range(0, {bands})) AS b) b
          CROSS JOIN (SELECT unnest(range(-1, {w})) AS fl) f
          WHERE s.vec_id = 0),
cand AS (SELECT DISTINCT c.id, c.e, p.pe FROM corpus c JOIN probe p USING (band))
SELECT id AS vec_id, round({COS.format(a='e', b='pe')}, 4) AS sim
FROM cand ORDER BY sim DESC, id LIMIT {k}"""



def gen_join(pairs=False, sim_t="0.4", extra_filter="", k=5):
    """q_ann_join / q_ann_pairs: occupancy-derived params replayed in SQL.
    w = min(16, max(2, ceil(ln(max(1, n/32))/ln(2)))); bands from the
    banding curve at sim 0.4 / recall 0.8 (log1p(-0.8) emitted as the
    Java constant); cap = 256; multi-probe hamming-1 XOR."""
    sign = SIGN.format(p="(b.b * d.w + r)", d="i")
    dot = ("list_sum(list_transform(range(0, 64), i -> "
           "CAST(s.e[i + 1] AS DOUBLE) * " + sign + "))")
    cand_filter = "p.pid < i.id" if pairs else "p.pid <> i.id"
    label_sel = ", label" if extra_filter else ""
    head = f"""WITH
base AS (SELECT vec_id, embedding AS e{label_sel} FROM embeddings
         WHERE embedding IS NOT NULL AND len(embedding) > 0{extra_filter}),
drv AS (SELECT least(16, greatest(2,
            CAST(ceil(ln(greatest(1.0, count(*) / 32.0)) / ln(2.0)) AS INT))) AS w,
          count(*) AS n FROM base),
drv2 AS (SELECT w, n,
           least(64, greatest(1, CAST(ceil(-1.6094379124341005 /
             ln(1.0 - power(1.0 - acos({sim_t}) / pi(), w))) AS INT))) AS bands,
           256 AS cap
         FROM drv),
-- per (vector, band): packed key = (band << w) + sign bits
keys AS (SELECT s.vec_id AS id, s.e, d.w, d.bands, d.cap,
           b.b AS band_id,
           (b.b::BIGINT << d.w) + list_sum(list_transform(range(0, d.w), r ->
             CASE WHEN {dot} >= 0 THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS key
         FROM base s CROSS JOIN drv2 d
         CROSS JOIN LATERAL (SELECT unnest(range(0, d.bands)) AS b) b),
kept AS (SELECT key FROM keys GROUP BY key HAVING count(*) <= any_value(cap)),
idx AS (SELECT k.id, k.key FROM keys k JOIN kept USING (key)),
probes AS (SELECT k.id AS pid, k.key AS key FROM keys k
           UNION
           SELECT k.id AS pid, xor(k.key, (1::BIGINT << f.r)) AS key
           FROM keys k CROSS JOIN LATERAL (SELECT unnest(range(0, k.w)) AS r) f),
cand AS (SELECT DISTINCT p.pid, i.id
         FROM probes p JOIN idx i USING (key)
         WHERE {cand_filter}),
em AS (SELECT vec_id AS id, e FROM base),
scored AS (SELECT c.pid, c.id,
             round(""" + COS.format(a="a.e", b="b.e") + """, 4) AS sim
           FROM cand c JOIN em a ON a.id = c.pid JOIN em b ON b.id = c.id)"""
    if pairs:
        return head + """
SELECT CAST(pid AS BIGINT) AS vec_a, CAST(id AS BIGINT) AS vec_b, sim
FROM scored WHERE sim >= 0.4 ORDER BY vec_a, vec_b"""
    return head + f""",
rk AS (SELECT pid, id, sim,
         row_number() OVER (PARTITION BY pid ORDER BY sim DESC, id ASC) AS rank
       FROM scored)
SELECT CAST(pid AS BIGINT) AS vec_id, CAST(id AS BIGINT) AS neighbor_id, sim,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {k} ORDER BY vec_id, rank"""



def gen_clusters():
    """q_embed_clusters_ann: annPairsAuto(0.4) edges + recursive min-label
    reachability over the full vec universe (the q_dedup_clusters oracle
    pattern)."""
    body = gen_join(pairs=True)
    body = body[len("WITH"):]  # strip leading WITH
    body = body[:body.rindex("SELECT CAST(pid AS BIGINT)")]
    return f"""WITH RECURSIVE {body.rstrip()},
prs AS (SELECT pid AS a, id AS b FROM scored WHERE sim >= 0.4),
edges AS (SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs),
reach AS (SELECT u, v FROM edges
          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS vec_id, min(v) AS mn FROM reach GROUP BY u)
SELECT d.vec_id, CAST(coalesce(least(c.mn, d.vec_id), d.vec_id) AS BIGINT) AS cluster_id
FROM embeddings d LEFT JOIN comp c USING (vec_id)
ORDER BY vec_id"""

def gen_knn():
    """q_knn_eval_ann: annJoinAuto defaults (simThreshold 0.5, k=5) over
    label-non-null vectors, majority vote, confusion matrix."""
    body = gen_join(pairs=False, sim_t="0.5", extra_filter=" AND label IS NOT NULL", k=5)
    body = body[len("WITH"):]
    body = body[:body.rindex("SELECT CAST(pid AS BIGINT)")]
    return f"""WITH {body.rstrip()},
lab AS (SELECT vec_id AS id, label FROM base),
nb AS (SELECT r.pid AS ia, la.label AS la, lb.label AS lb
       FROM rk r JOIN lab la ON la.id = r.pid JOIN lab lb ON lb.id = r.id
       WHERE r.rank <= 5),
votes AS (SELECT ia, la, lb, count(*) AS c FROM nb GROUP BY ia, la, lb),
best AS (SELECT ia, la, lb,
           row_number() OVER (PARTITION BY ia ORDER BY c DESC, lb ASC) AS vr
         FROM votes)
SELECT CAST(la AS BIGINT) AS label, CAST(lb AS BIGINT) AS predicted,
       count(*) AS n_vecs
FROM best WHERE vr = 1 GROUP BY la, lb
ORDER BY label NULLS FIRST, predicted NULLS FIRST"""

if __name__ == '__main__':
    if len(sys.argv) > 1:
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sys.argv[1]}/embeddings.parquet'")
        for name, sql, order in [
            ("q_ann_lsh", gen_lsh(), "sim DESC, vec_id"),
            ("q_ann_join", gen_join(False), "vec_id, rank"),
            ("q_ann_pairs", gen_join(True), "vec_a, vec_b"),
            ("q_embed_clusters_ann", gen_clusters(), "vec_id"),
            ("q_knn_eval_ann", gen_knn(), "label NULLS FIRST, predicted NULLS FIRST")]:
            t0 = time.time()
            rows = con.execute(sql).fetchall()
            print(f"{name}: {len(rows)} rows in {time.time()-t0:.1f}s", file=sys.stderr)
            import glob
            if len(sys.argv) > 2 and glob.glob(f"{sys.argv[2]}/{name}/*.parquet"):
                exp = con.execute(
                    f"SELECT * FROM '{sys.argv[2]}/{name}/*.parquet' ORDER BY {order}").fetchall()
                mism = [(a, b) for a, b in zip(rows, exp) if a != b]
                print(f"  spark {len(exp)}, mismatches: {len(mism)} {mism[:3]}", file=sys.stderr)
    else:
        print(gen_join(False))
