#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
  1. (caller runs) sbt "runMain graft.Verify <sfDir> <outDir>" first
  2. this script loads every <outDir>/<name> parquet, runs the matching
     oracle_sql.json entry in DuckDB with the sf tables registered as
     views, and compares row count, column names, and sorted values.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, colnames):
    # sort columns by name (driver behavior), then sort rows
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def compare_one(con, out_dir, name, sql):
    """One query's full compare (missing output, oracle error, dtype
    warning, cols/rows/values). Prints its own PASS/FAIL/WARN lines and
    returns True iff the query passed — shared with verify_subset.py so
    a subset run can never silently skip a check this gate performs.
    """
    pq = Path(out_dir) / name
    if not pq.exists():
        print(f"FAIL {name}: spark output missing")
        return False
    got = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
    g_rows, g_cols = got.fetchall(), [d[0] for d in got.description]
    try:
        want = con.sql(sql)
        w_rows, w_cols = want.fetchall(), [d[0] for d in want.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        return False
    # DuckDB HUGEINT (sum of ints) and DECIMAL results convert to
    # float64 on some client paths while Spark's parquet ints and
    # decimals do not — a hash-divergence class the round-1 driver
    # flagged on 4 queries. Keep oracle outputs BIGINT/DOUBLE/
    # VARCHAR/TIMESTAMP/BOOLEAN.
    risky = [(c, str(t)) for c, t in zip(w_cols, want.types)
             if "HUGEINT" in str(t) or "DECIMAL" in str(t)]
    if risky:
        print(f"WARN {name}: oracle emits risky dtypes {risky} — "
              "cast to BIGINT/DOUBLE in the oracle SQL")
    if sorted(g_cols) != sorted(w_cols):
        print(f"FAIL {name}: cols {sorted(g_cols)} != {sorted(w_cols)}")
        return False
    if len(g_rows) != len(w_rows):
        print(f"FAIL {name}: rows {len(g_rows)} != {len(w_rows)}")
        return False
    cg, cw = canon(g_rows, g_cols), canon(w_rows, w_cols)
    if cg != cw:
        bad = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at sorted rows {bad}")
        for i in bad:
            print(f"   spark: {cg[i]}\n   duck : {cw[i]}")
        return False
    print(f"PASS {name} ({len(g_rows)} rows)")
    return True


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if compare_one(con, out_dir, name, sql):
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
