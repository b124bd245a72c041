#!/usr/bin/env python3
"""Single source of truth for round-closing statistics.

The r13 verdict caught the survey and commit messages hand-transcribing
numbers that disagreed with the committed artifacts (167.1 vs 168.7 s
total; "8"/"12" vs 10 noise-adjudicated rows). This script derives every
closing number FROM the artifacts, so SURVEY §-closing stats and commit
messages can quote its output verbatim.

Usage: python3 tools/closing_numbers.py [round]
  round defaults to the highest N with a BENCH_r{N}.json present.
Reads: BENCH_r{N}.json (driver bench) or BENCH_QUERIES.jsonl (local
dump, with its trailing total line), CORRECTNESS_r{N}.json, SCALE_r{N}
.json when present.
"""
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def latest_round():
    rounds = []
    for p in ROOT.glob("BENCH_r*.json"):
        try:
            rounds.append(int(p.stem.split("_r")[1]))
        except ValueError:
            pass
    return max(rounds) if rounds else None


def artifact(prefix, n):
    """Resolve the artifact path for round n regardless of zero-padding.

    latest_round() discovers rounds from an unpadded glob; readers must
    open the SAME file it matched, not re-derive a padded name that may
    not exist (a single-digit round would otherwise silently fall back
    or report None).
    """
    for name in (f"{prefix}_r{n:02d}.json", f"{prefix}_r{n}.json"):
        p = ROOT / name
        if p.exists():
            return p
    return ROOT / f"{prefix}_r{n:02d}.json"


def warn_if_sidecar_dirty():
    """Closing numbers must describe what the judge reads: the COMMITTED
    sidecar. A bench rerun (driver or local) rewrites the working-tree
    BENCH_QUERIES.jsonl in place; quoting a dirty file reproduces the
    r14 drift (180.41 committed vs 180.94 official)."""
    try:
        head = subprocess.run(
            ["git", "-C", str(ROOT), "show", "HEAD:BENCH_QUERIES.jsonl"],
            capture_output=True, text=True, timeout=10)
        if head.returncode != 0:
            return
        work = (ROOT / "BENCH_QUERIES.jsonl").read_text()
        if head.stdout != work:
            print("WARNING: working-tree BENCH_QUERIES.jsonl differs from "
                  "HEAD — these numbers describe an uncommitted bench run; "
                  "commit it (or reset) before quoting them",
                  file=sys.stderr)
    except Exception:
        pass


def bench_stats(n):
    """Totals from the driver artifact if present, else the local dump."""
    drv = artifact("BENCH", n)
    if drv.exists():
        # driver artifact: {"n", "rc", "cpus", "sf", "tail" (per-query
        # jsonl lines), "parsed" (the final total line)}
        d = json.loads(drv.read_text())
        total = d.get("parsed", {})
        rows = []
        for line in d.get("tail", "").splitlines():
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "query" in r:
                rows.append(r)
        # the driver tail is truncated to ~2KB — the committed sidecar
        # (BENCH_QUERIES.jsonl) carries the full per-query rows, so
        # noise adjudication AND the slowest list always come from
        # there (the r15 verdict caught `slowest` quoting the tail:
        # zorder_probe 1.37s "slowest" while profile_scale_cert ran
        # 4.39s outside the truncation window)
        sidecar = ROOT / "BENCH_QUERIES.jsonl"
        noise, side_rows = [], []
        if sidecar.exists():
            for line in sidecar.read_text().splitlines():
                r = json.loads(line)
                if "query" in r:
                    side_rows.append(r)
                    if "noise" in r:
                        noise.append(r)
        if side_rows:
            rows = side_rows
        cs = {}
        for r in side_rows:
            if "cross_session" in r:
                cs.setdefault(r["cross_session"], []).append(r["query"])
        return {
            "source": drv.name,
            "rc": d.get("rc"),
            "total_sec": round(total.get("value", 0.0), 2),
            "n_queries": total.get("n_queries"),
            "n_failed": total.get("n_failed"),
            "failed": total.get("failed", []),
            "noise_rows": {r["query"]: r["noise"] for r in noise},
            "n_noise_false": sum(1 for r in noise if r["noise"] is False),
            "cross_session": {k: sorted(v) for k, v in sorted(cs.items())},
            "slowest": sorted(((r["query"], r["sec"]) for r in rows
                               if "sec" in r), key=lambda kv: -kv[1])[:5],
        }
    rows, total = [], None
    for line in (ROOT / "BENCH_QUERIES.jsonl").read_text().splitlines():
        d = json.loads(line)
        if "query" in d:
            rows.append(d)
        else:
            total = d
    noise = [r for r in rows if "noise" in r]
    return {
        "source": "BENCH_QUERIES.jsonl",
        "total_sec": round(total["value"], 2) if total else
            round(sum(r["sec"] for r in rows), 2),
        "n_queries": total["n_queries"] if total else len(rows),
        "n_failed": total.get("n_failed") if total else None,
        "n_query_rows": len(rows),
        "noise_rows": {r["query"]: r["noise"] for r in noise},
        "n_noise_false": sum(1 for r in noise if r["noise"] is False),
        "slowest": sorted(((r["query"], r["sec"]) for r in rows),
                          key=lambda kv: -kv[1])[:5],
    }


def correctness_stats(n):
    p = artifact("CORRECTNESS", n)
    if not p.exists():
        return None
    d = json.loads(p.read_text())
    green = [q for q, r in d.items() if r.get("hash_match") is True]
    rows_only = [q for q, r in d.items() if r.get("err") == "no_oracle"]
    failed = [q for q, r in d.items()
              if r.get("err") not in (None, "no_oracle")
              or r.get("hash_match") is False]
    return {
        "source": p.name,
        "n_total": len(d),
        "n_hash_green": len(green),
        "n_rows_only": len(rows_only),
        "n_failed": len(failed),
        "failed": sorted(failed),
        "rows_only": sorted(rows_only),
    }


def scale_stats(n):
    p = artifact("SCALE", n)
    if not p.exists():
        return None
    rows = json.loads(p.read_text())
    over = [r for r in rows if not r.get("within_bound", True)]
    return {
        "source": p.name,
        "n_rows": len(rows),
        "n_over_bound": len(over),
        "over_bound": {r["query"]: r["ratio"] for r in over},
    }


def closing_markdown(n, out):
    """Emit the §-closing markdown skeleton (paste into SURVEY verbatim).

    The r13 AND r15 closing sections were hand-transcribed against a
    stale record (178.2 s quoted vs 186.3 s official); generating the
    skeleton makes the artifact the only possible source."""
    b, c, s = out["bench"], out["correctness"], out["scale"]
    lines = [f"### Round-{n} closing state (generated)", ""]
    lines.append(
        f"Generated by `tools/closing_numbers.py {n} --md` over the "
        "committed artifacts; do not edit the numbers by hand.")
    lines.append("")
    if c:
        lines.append(
            f"**{c['n_total']} graded queries** — {c['n_hash_green']} "
            f"hash-oracled, {c['n_rows_only']} rows-only, "
            f"{c['n_failed']} failed"
            + (f" ({', '.join(c['failed'])})" if c["failed"] else "")
            + f" (`{c['source']}`).")
    if b:
        lines.append(
            f"Bench **{b.get('n_queries')} queries, "
            f"{b.get('n_failed')} failed, {b['total_sec']} s summed "
            f"at sf0.1 on local[32]** (`{b['source']}`, rc="
            f"{b.get('rc')}).")
        cs = b.get("cross_session") or {}
        if cs or b.get("noise_rows"):
            parts = [f"{len(v)} \"{k}\"" for k, v in cs.items()]
            persistent = cs.get("persistent", [])
            lines.append(
                "Sidecar self-adjudication: "
                + (", ".join(parts) if parts else "no cross-session rows")
                + f"; {b['n_noise_false']} noise:false rows awaiting "
                  "next-session comparison"
                + ("" if persistent else " — 0 persistent") + ".")
    if s:
        ob = (", ".join(f"{q} ×{r}" for q, r in s["over_bound"].items())
              if s["over_bound"] else "none")
        lines.append(
            f"`{s['source']}`: {s['n_rows']} rows, "
            f"{s['n_over_bound']} over bound (over: {ob}).")
    if b and b.get("slowest"):
        tops = ", ".join(f"`{q}` {sec:.2f} s" for q, sec in b["slowest"])
        lines.append(f"Slowest (full sidecar): {tops}.")
    return "\n".join(lines) + "\n"


def main():
    argv = [a for a in sys.argv[1:] if a != "--md"]
    md = "--md" in sys.argv[1:]
    n = int(argv[0]) if argv else latest_round()
    warn_if_sidecar_dirty()
    out = {
        "round": n,
        "bench": bench_stats(n),
        "correctness": correctness_stats(n),
        "scale": scale_stats(n),
    }
    if md:
        print(closing_markdown(n, out))
    else:
        print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
