#!/usr/bin/env python3
"""Dev-only sf1.0 oracle sweep: tools/check.py semantics with a
per-query wall-clock budget.

At sf1.0 a handful of oracles cannot finish in sane time — the
embedding all-pairs CTEs (d5/d7, quadratic by design) and the
sequential recursive-CTE replays (x8's packing recurrence, x34's
unrolled PageRank, x25's full-pipeline statement); the measured round-7
sweep (BASELINE.md) confirmed exactly that set, while d2/d2b's shingle
pair CTEs DO finish (~2-3 min). The driver's gate never runs oracles
at this scale.
Each oracle query therefore runs in its own subprocess with a
timeout; exceeded budgets are recorded as SKIP(timeout) — an honest
"oracle infeasible at this scale", distinct from a mismatch.

Usage: check_timeout.py <sfDir> <outDir> [timeoutSec]
"""
import json
import subprocess
import sys
from pathlib import Path

WORKER = r'''
import json, math, sys
import duckdb
sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, "%(tools)s")
from check import canon, TABLES
from pathlib import Path
con = duckdb.connect()
import os
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table = a directory of parts
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
sql = oracle[name]
spark = canon(con.from_parquet(str(Path(out_dir) / name / "*.parquet")))
duck = canon(con.sql(sql))
if spark[0] != [c.lower() for c in duck[0]] and spark[0] != duck[0]:
    print(f"SCHEMA {spark[0]} vs {duck[0]}"); sys.exit(2)
if spark[1] != duck[1]:
    so = [r for r in spark[1] if r not in set(duck[1])][:2]
    do = [r for r in duck[1] if r not in set(spark[1])][:2]
    print(f"ROWS spark={len(spark[1])} duck={len(duck[1])} "
          f"spark_only={so} duck_only={do}"); sys.exit(2)
print(f"OK {len(spark[1])} rows")
'''


def main():
    sf_dir = sys.argv[1]
    out_dir = Path(sys.argv[2])
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    tools = str(Path(__file__).resolve().parent)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if not (out_dir / name).exists():
            print(f"FAIL {name}: NO SPARK OUTPUT"); n_fail += 1
            continue
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER % {"tools": tools},
                 sf_dir, str(out_dir), name],
                capture_output=True, text=True, timeout=budget)
        except subprocess.TimeoutExpired:
            print(f"SKIP {name}: oracle exceeded {budget}s budget")
            n_skip += 1
            continue
        msg = (r.stdout or r.stderr).strip().splitlines()
        msg = msg[-1] if msg else ""
        if r.returncode == 0:
            print(f"PASS {name} ({msg})"); n_pass += 1
        else:
            print(f"FAIL {name}: {msg}"); n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{n_skip} skipped (oracle over budget)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
