#!/bin/bash
# Sharded stretch-SF correctness gate: the heaviest DuckDB oracles (50k-doc
# closure CTEs, 8k-vector pair CTEs) are single-threaded-ish and serialize a
# single-process run into hours — run N shards (round-robin over registry
# order so heavy families spread), each with its own Spark+DuckDB, then merge.
# Usage: tools/run_sf1_gate.sh [SF_DIR] [N_SHARDS] [ORACLE_TIMEOUT_S]
set -u
SF_DIR="${1:-/root/repo/var/sf1}"
N="${2:-3}"
TMO="${3:-1200}"
cd "$(dirname "$0")/.."
mapfile -t QUERIES < <(python3 -c "
import sys; sys.path.insert(0, '.')
import __spark_entry__ as e
print('\n'.join(e.queries()))")
PIDS=()
for i in $(seq 0 $((N-1))); do
  NAMES=$(for j in "${!QUERIES[@]}"; do
    if [ $((j % N)) -eq "$i" ]; then echo "${QUERIES[$j]}"; fi
  done | tr '\n' ' ')
  SPARK_GRAFT_CHECK_SF_DIR="$SF_DIR" SPARK_GRAFT_ORACLE_TIMEOUT="$TMO" \
    python tools/check_correctness.py --json "/tmp/sf1_shard$i.json" $NAMES \
    > "/tmp/sf1_shard$i.log" 2>&1 &
  PIDS+=($!)
done
rc=0
for p in "${PIDS[@]}"; do wait "$p" || rc=$?; done
python3 - <<'PY'
import glob, json
merged = {}
for f in sorted(glob.glob("/tmp/sf1_shard*.json")):
    merged.update(json.load(open(f)))
out = "CORRECTNESS_local_r13_sf1.json"
json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
st = [v["status"] for v in merged.values()]
print(f"merged {len(merged)} entries -> {out}: "
      f"{st.count('pass')} pass, {st.count('weak')} weak, "
      f"{st.count('excluded')} excluded, {st.count('fail')} fail")
PY
exit $rc
