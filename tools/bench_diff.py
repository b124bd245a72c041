#!/usr/bin/env python3
"""Adjudicate two bench sidecars (BENCH_QUERIES.jsonl) in one line.

Usage: python3 tools/bench_diff.py OLD.jsonl NEW.jsonl [ratio]

For every query present in both files, compares `plan_sha` and wall
time. The contract the fingerprints buy: a timing swing with an
UNCHANGED sha is shared-host noise by construction (same executed
plan, same data); a CHANGED sha marks a genuine plan change to
investigate (dump both plans with SPARK_GRAFT_DUMP_PLANS and diff).

Prints: sha drifts, queries slower than `ratio` (default 1.5x, only
when the slower side exceeds 0.5 s), queries faster than 1/ratio,
added/removed queries, and the totals line of each file.
Exit code 1 iff any sha drifted (timing alone never fails the diff).
"""
import json
import sys


def load(path):
    rows, total = {}, None
    for line in open(path):
        o = json.loads(line)
        if "query" in o:
            rows[o["query"]] = o
        elif o.get("metric") == "total":
            total = o
    return rows, total


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, old_total = load(sys.argv[1])
    new, new_total = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    drift = [q for q in sorted(set(old) & set(new))
             if old[q].get("plan_sha") != new[q].get("plan_sha")]
    slower, faster = [], []
    for q in set(old) & set(new):
        a, b = old[q].get("sec"), new[q].get("sec")
        if a is None or b is None:
            continue
        # a trivial query can round to 0.0s in a sidecar; guard the
        # ratio (the 0.5s floors already keep such pairs out of the
        # report unless the other side is material)
        a = max(a, 1e-9)
        b = max(b, 1e-9)
        if b > a * ratio and b > 0.5:
            slower.append((b / a, q, a, b))
        elif a > b * ratio and a > 0.5:
            faster.append((b / a, q, a, b))

    print(f"common: {len(set(old) & set(new))}  "
          f"added: {sorted(set(new) - set(old))}  "
          f"removed: {sorted(set(old) - set(new))}")
    print(f"sha drift: {len(drift)}")
    for q in drift:
        print(f"  DRIFT {q}: {old[q].get('plan_sha')} -> "
              f"{new[q].get('plan_sha')}  "
              f"({old[q].get('sec', 0):.2f}s -> {new[q].get('sec', 0):.2f}s)")
    for title, moves in (("slower (same plan => host noise)", slower),
                         ("faster", faster)):
        moves.sort(key=lambda m: -m[0] if title.startswith("slower")
                   else m[0])
        print(f"{title}: {len(moves)}")
        for r, q, a, b in moves[:15]:
            sha = " [SHA CHANGED]" if q in drift else ""
            print(f"  {r:5.2f}x {q}: {a:.2f}s -> {b:.2f}s{sha}")
    if old_total and new_total:
        print(f"totals: {old_total['value']:.1f}s "
              f"({old_total['n_queries']} q) -> "
              f"{new_total['value']:.1f}s ({new_total['n_queries']} q)")
    sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
