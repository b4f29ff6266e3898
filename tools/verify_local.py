#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify's
parquet dumps against DuckDB running SparkEntry.oracleSql on the same
tables. Usage: verify_local.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)."""
import sys, os, json, glob, time, threading
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# scale-stress knobs (defaults replicate the driver gate exactly):
#   GRAFT_VERIFY_TIMEOUT_S — interrupt a DuckDB oracle after N seconds
#     (reported as TIMEOUT, counted as failed — the sf1.0 run uses this
#     to bound the declared-quadratic exact baselines);
#   GRAFT_VERIFY_SKIP — comma list of query names to skip entirely;
#   GRAFT_VERIFY_TIMING=1 — print per-query oracle seconds.
timeout_s = float(os.environ.get("GRAFT_VERIFY_TIMEOUT_S", "0") or 0)
skip = set(x for x in os.environ.get("GRAFT_VERIFY_SKIP", "").split(",") if x)
timing = os.environ.get("GRAFT_VERIFY_TIMING", "") == "1"
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = ok = 0
skipped = []
for name, sql in sorted(oracle.items()):
    if name in skip:
        skipped.append(name)
        print(f"SKIPPED {name} (GRAFT_VERIFY_SKIP)")
        continue
    spark_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"MISSING spark output: {name}")
        fail += 1
        continue
    sdf = pq.read_table(files[0]).to_pandas()
    t0 = time.time()
    timer = None
    if timeout_s > 0:
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        el = time.time() - t0
        if timeout_s > 0 and el >= timeout_s - 0.5:
            print(f"TIMEOUT {name}: oracle exceeded {timeout_s:.0f}s")
        else:
            print(f"ORACLE ERROR {name}: {e}")
        fail += 1
        continue
    finally:
        if timer is not None:
            timer.cancel()
    if timing:
        print(f"  [{name} oracle {time.time()-t0:.2f}s]")
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"COLUMN MISMATCH {name}: spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fail += 1
        continue
    if len(sdf) != len(ddf):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(sdf)} duck={len(ddf)}")
        fail += 1
        continue
    bad = False
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        try:
            eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
        except Exception:
            eq = a.astype(str).values == b.astype(str).values
        if not eq.all():
            idx = (~eq).nonzero()[0][:3]
            print(f"VALUE MISMATCH {name}.{c} at rows {list(idx)}: "
                  f"spark={[a.iloc[i] for i in idx]} duck={[b.iloc[i] for i in idx]} "
                  f"dtypes spark={a.dtype} duck={b.dtype}")
            bad = True
    if bad:
        fail += 1
    else:
        ok += 1
        print(f"OK {name} ({len(sdf)} rows)")

# No-oracle queries: graft.Verify records rows>0 + a two-run
# order-independent content hash in self_check.json — count them in the
# gate so "no oracle" is distinguishable from broken.
self_path = f"{out_dir}/self_check.json"
if os.path.exists(self_path):
    for name, rec in sorted(json.load(open(self_path)).items()):
        if rec.get("self_consistent") and rec.get("rows", 0) > 0:
            ok += 1
            print(f"OK {name} (self-consistent, {rec['rows']} rows)")
        else:
            fail += 1
            print(f"SELF-CHECK FAILED {name}: {rec}")

# Queries that THREW inside graft.Verify land in errors.json with no
# parquet dir and no self_check entry. Oracle-backed ones already fail
# above as MISSING output; count the rest here — without this, a crashed
# no-oracle query would be invisible to the gate and it would still
# exit 0.
err_path = f"{out_dir}/errors.json"
if os.path.exists(err_path):
    for name, msg in sorted(json.load(open(err_path)).items()):
        if name not in oracle:
            fail += 1
            print(f"QUERY FAILED {name}: {msg}")
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
