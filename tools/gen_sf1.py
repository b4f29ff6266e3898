#!/usr/bin/env python3
"""Generate the sf1.0 scale-stress fixture: 10 key-shifted copies of
/root/testdata/sf0.1 written to a target dir (default /tmp/sf1.0).

Purpose (r10 verdict item 5): one measured decade of scale-up evidence
for the 100x judgment — run the oracle gate + bench against ~6M-row
lineitem / 1M events / 50k documents / 20k embeddings.

Construction:
  - region/nation stay fixed (TPC-H dimension semantics);
  - every other table is replicated 10x with ALL key columns shifted by
    copy * stride, stride = (max_key - min_key + 1) of the key's domain
    table — foreign keys stay consistent because referencing and
    referenced columns shift by the same stride;
  - non-key values are copied verbatim (10 identical copies = a
    dup-heavy corpus, exactly the shape the dedup family exists for);
  - embeddings additionally get a deterministic per-copy jitter
    (+/- <=3e-3 per element, a pure function of (copy, position)) so the
    ANN/IVF bucket structure sees near-duplicates across copies rather
    than degenerate exactly-equal vectors; copy 0 is bit-identical to
    sf0.1.

Deterministic: no RNG anywhere — re-running reproduces byte-identical
values (parquet layout may differ).
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()
import os
os.makedirs(DST, exist_ok=True)


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def stride(t, key):
    lo, hi = con.sql(f"SELECT min({key}), max({key}) FROM {src(t)}").fetchone()
    return hi - lo + 1


def write(t, select):
    con.sql(f"COPY ({select}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


# fixed dimensions
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

sc = stride("customer", "c_custkey")
ss = stride("supplier", "s_suppkey")
sp = stride("part", "p_partkey")
so = stride("orders", "o_orderkey")
se = stride("events", "event_id")
su = stride("events", "user_id")
sd = stride("documents", "doc_id")
sv = stride("embeddings", "vec_id")

copies = f"(SELECT unnest(range(0, {COPIES})) AS k)"

write("customer", f"""
  SELECT c_custkey + k*{sc} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {src('customer')} CROSS JOIN {copies} ORDER BY c_custkey""")

write("supplier", f"""
  SELECT s_suppkey + k*{ss} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN {copies} ORDER BY s_suppkey""")

write("part", f"""
  SELECT p_partkey + k*{sp} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {src('part')} CROSS JOIN {copies} ORDER BY p_partkey""")

write("orders", f"""
  SELECT o_orderkey + k*{so} AS o_orderkey, o_custkey + k*{sc} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN {copies} ORDER BY o_orderkey""")

write("lineitem", f"""
  SELECT l_orderkey + k*{so} AS l_orderkey, l_partkey + k*{sp} AS l_partkey,
         l_suppkey + k*{ss} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src('lineitem')} CROSS JOIN {copies} ORDER BY l_orderkey, l_linenumber""")

write("events", f"""
  SELECT event_id + k*{se} AS event_id, ts, user_id + k*{su} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN {copies} ORDER BY event_id""")

write("documents", f"""
  SELECT doc_id + k*{sd} AS doc_id, text, lang, source, n_chars
  FROM {src('documents')} CROSS JOIN {copies} ORDER BY doc_id""")

# jitter: +/- <=3e-3, zero for copy 0, pure function of (k, position)
write("embeddings", f"""
  SELECT vec_id + k*{sv} AS vec_id,
         CAST(list_transform(embedding, x ->
           CAST(x + ((((k*31 + 7) % 7) - 3) * 0.001) *
                (CASE WHEN k = 0 THEN 0 ELSE 1 END) AS FLOAT)) AS FLOAT[])
           AS embedding,
         label
  FROM {src('embeddings')} CROSS JOIN {copies} ORDER BY vec_id""")

print("done ->", DST)
