#!/usr/bin/env bash
# Plan-fingerprint rebuild-invariance check.
#
# Rewrites every sf0.01 table with a DIFFERENT parquet byte layout
# (zstd, 1000-row groups — logically identical rows), runs the bench's
# plan dump against both copies, and diffs the canonicalized plan
# texts. Any diff means Bench.planNorm is hashing a storage-layout
# token and cross-round noise adjudication would go blind at the next
# testdata rebuild (the r9->r10 failure: 155/163 carried shas drifted
# on byte-identical operator code).
#
# Usage: tools/plan_drift_check.sh [q1,q2,...]   (default: a 12-query
# sample covering scans, joins, windows, self-written layouts)
set -euo pipefail
cd "$(dirname "$0")/.."

QS="${1:-q1_agg,q9_profit,events_sessions,text_tfidf,dedup_minhash_lsh,mix_sources,window_running,ivm_maintain,bm25_topk,zorder_probe,zone_probe,profile_numeric}"
SRC=/root/testdata/sf0.01
PERT=/tmp/graft_sf0.01_perturbed

python3 - "$SRC" "$PERT" <<'EOF'
import pyarrow.parquet as pq, os, glob, sys
src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
for p in sorted(glob.glob(f'{src}/*.parquet')):
    pq.write_table(pq.read_table(p), f'{dst}/{os.path.basename(p)}',
                   row_group_size=1000, compression='zstd')
EOF

run() {  # run <sfdir> <dumpdir>
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_ONLY="$QS" \
    SPARK_GRAFT_DUMP_PLANS="$2" SPARK_GRAFT_NO_REPLAY=1 \
    SPARK_GRAFT_SIDECAR="$2/sidecar.jsonl" \
    sbt -batch 'runMain graft.Bench' >/dev/null 2>&1
}
run "$SRC" /tmp/graft_plans_orig
run "$PERT" /tmp/graft_plans_pert

fail=0
for f in /tmp/graft_plans_orig/*.txt; do
  n=$(basename "$f")
  if ! cmp -s "$f" "/tmp/graft_plans_pert/$n"; then
    echo "DRIFT: $n"
    diff "$f" "/tmp/graft_plans_pert/$n" | head -6
    fail=1
  fi
done
[ "$fail" = 0 ] && echo "OK: all plans byte-identical across parquet rebuild"
exit $fail
