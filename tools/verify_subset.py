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

sys.path.insert(0, str(Path(__file__).parent))
from verify_local import compare_one, connect  # noqa: E402


def main(sf_dir, out_dir, names):
    con = connect(sf_dir)
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in names:
        if name not in oracle:
            print(f"FAIL {name}: no such oracle query "
                  "(check the comma-separated list for typos)")
            n_fail += 1
            continue
        if compare_one(con, out_dir, name, oracle[name]):
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
