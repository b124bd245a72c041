#!/usr/bin/env python3
"""Selective oracle replay for large scale factors.

Usage: python3 tools/verify_subset.py <sfDir> <outDir> <q1,q2,...>

Same compare as verify_local.py but only for the named queries — used
to re-check the float-determinism-sensitive oracles at sf0.1, where
the quadratic pair oracles (dedup_*, curate) are infeasible in DuckDB
but the linear ones run fine.
"""
import json
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent))
from verify_local import TABLES, canon  # noqa: E402


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in names:
        sql = oracle[name]
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        g_rows, g_cols = got.fetchall(), [d[0] for d in got.description]
        want = con.sql(sql)
        w_rows, w_cols = want.fetchall(), [d[0] for d in want.description]
        ok = (sorted(g_cols) == sorted(w_cols)
              and len(g_rows) == len(w_rows)
              and canon(g_rows, g_cols) == canon(w_rows, w_cols))
        print(("PASS" if ok else "FAIL"), name, f"({len(g_rows)} rows)")
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
