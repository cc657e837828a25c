#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
query's parquet dump, runs the matching oracle SQL in DuckDB against
the same testdata, canonicalizes both sides (columns sorted by name,
rows sorted, values hashed) and reports per-query match/mismatch.

NOT part of the shipped library — tooling only (the real gate is
driver-side).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    """DuckDB relation -> (schema, sorted row tuples)."""
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            elif v is None or v != v:  # None / pandas NaT/nan
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    failures = []
    passed = set()
    for name in sorted(oracle):
        sql = oracle[name]
        pq = out_dir / name
        if not pq.exists():
            failures.append((name, "NO SPARK OUTPUT"))
            n_fail += 1
            continue
        try:
            got_cols, got = canon(con.sql(
                f"SELECT * FROM '{pq}/*.parquet'"))
            want_cols, want = canon(con.sql(sql))
        except Exception as e:
            failures.append((name, f"ERROR {e}"))
            n_fail += 1
            continue
        if got_cols != want_cols:
            failures.append(
                (name, f"SCHEMA spark={got_cols} duck={want_cols}"))
            n_fail += 1
        elif got != want:
            want_set, got_set = set(want), set(got)
            diff_g = [r for r in got if r not in want_set][:3]
            diff_w = [r for r in want if r not in got_set][:3]
            failures.append((name,
                f"ROWS spark={len(got)} duck={len(want)} "
                f"spark_only={diff_g} duck_only={diff_w}"))
            n_fail += 1
        else:
            n_pass += 1
            passed.add(name)
            print(f"PASS {name} ({len(got)} rows)")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    # queries with no oracle: rows-only presence check
    rows_only = set()
    for pq in sorted(out_dir.iterdir()):
        if pq.is_dir() and pq.name not in oracle:
            rows_only.add(pq.name)
            try:
                n = con.sql(f"SELECT count(*) FROM '{pq}/*.parquet'"
                            ).fetchone()[0]
                print(f"ROWS-ONLY {pq.name}: {n} rows "
                      + ("OK" if n > 0 else "EMPTY!"))
            except Exception as e:
                print(f"ROWS-ONLY {pq.name}: ERROR {e}")
    # the no-oracle→twin invariant (SparkEntry.twins): every rows-only
    # key declares an oracle-gated twin, the declaration is not stale,
    # and the twin is GREEN in this run. Enforced only on FULL dumps —
    # a dev-loop subset run (Verify's 3rd arg) has missing dirs by
    # design, detectable because some oracle-keyed dir is absent.
    twins_path = out_dir / "twins.json"
    # prefer the explicit marker Verify writes (r12 ADVICE: inferring
    # completeness from oracle dirs misreads an all-oracle subset as
    # full and flags every twin stale); fall back to inference for
    # dumps from older builds
    manifest = out_dir / "manifest.json"
    if manifest.exists():
        full_dump = bool(json.loads(manifest.read_text()).get("full"))
    else:
        full_dump = all((out_dir / name).exists() for name in oracle)
    if twins_path.exists() and full_dump:
        twins = json.loads(twins_path.read_text())
        twin_fails = []
        for k in sorted(rows_only - set(twins)):
            twin_fails.append(f"{k}: rows-only with no declared twin")
        for k in sorted(set(twins) - rows_only):
            twin_fails.append(f"{k}: declared twin entry is stale "
                              "(key is not rows-only in this dump)")
        for k, t in sorted(twins.items()):
            if k not in rows_only:
                continue
            if t not in oracle:
                twin_fails.append(f"{k}: twin {t} has no oracle SQL")
            elif t not in passed:
                twin_fails.append(f"{k}: twin {t} did not pass")
        for msg in twin_fails:
            print(f"TWIN-FAIL {msg}")
            n_fail += 1
        if not twin_fails:
            print(f"TWINS OK: {len(twins)} rows-only keys, "
                  "every twin oracle-green")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
