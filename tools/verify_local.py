#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle in oracle_sql.json over the same sf dir.

Usage: python3 tools/verify_local.py [sfdir] [outdir]
(Expects graft.Verify to have been run already:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout")
"""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return out

fails = []
import os
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_cols = [c.lower() for c in got.columns]
        got_rows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        fails.append(name); continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows-only check) — rows={len(got_rows)}")
        if len(got_rows) == 0:
            print(f"  WARN {name}: zero rows")
        continue
    try:
        exp = con.sql(oracle[name])
        exp_cols = [c.lower() for c in exp.columns]
        exp_rows = exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails.append(name); continue
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: column mismatch spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
        fails.append(name); continue
    g = norm_rows(got_rows, got_cols)
    e = norm_rows(exp_rows, exp_cols)
    if len(g) != len(e):
        print(f"FAIL {name}: row count spark={len(g)} oracle={len(e)}")
        fails.append(name); continue
    bad = 0
    first = None
    for i, (gr, er) in enumerate(zip(g, e)):
        if gr != er:
            # tolerate nothing, but report magnitude for floats
            ok = True
            for gv, ev in zip(gr, er):
                if gv == ev:
                    continue
                if isinstance(gv, float) and isinstance(ev, float):
                    if gv != ev:
                        ok = False
                else:
                    ok = False
            if not ok:
                bad += 1
                if first is None:
                    first = (i, gr, er)
    if bad:
        print(f"FAIL {name}: {bad}/{len(g)} rows differ; first at {first[0]}:")
        print(f"  spark : {first[1]}")
        print(f"  oracle: {first[2]}")
        fails.append(name)
    else:
        print(f"PASS {name} ({len(g)} rows)")

print()
print(f"{len(names) - len(fails)}/{len(names)} pass; fails: {fails}")
# Tail-survivable marker (the BENCH_RESULT treatment): one compact line
# a tail-capturing parser can recover even if the parsed artifact lands
# empty (it did in r17 and r19).
print("CORRECTNESS_RESULT " + json.dumps(
    {"phase": "compare", "pass": len(names) - len(fails),
     "total": len(names), "fails": fails}, separators=(",", ":")))

# Optional third arg: write a committable JSON artifact of this gate run
# (the builder's own correctness evidence — r17 verdict item #6: the
# round's headline claim must not depend on the driver-side artifact
# alone).
if len(sys.argv) > 3:
    import time
    with open(sys.argv[3], "w") as f:
        json.dump({
            "gate": "tools/verify_local.py",
            "sfdir": sfdir,
            "captured_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "queries_total": len(names),
            "queries_pass": len(names) - len(fails),
            "fails": fails,
        }, f, indent=1)
        f.write("\n")
sys.exit(1 if fails else 0)
