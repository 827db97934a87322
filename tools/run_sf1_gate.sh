#!/bin/bash
# Sharded stretch-SF correctness gate: the heaviest DuckDB oracles (50k-doc
# closure CTEs, 8k-vector pair CTEs) are single-threaded-ish and serialize a
# single-process run into hours — run N shards (round-robin over registry
# order so heavy families spread), each with its own Spark+DuckDB, then merge.
# Usage: tools/run_sf1_gate.sh [SF_DIR] [N_SHARDS] [ORACLE_TIMEOUT_S] [OUT.json] [NAMES...]
#   NAMES (optional): restrict to these query names (selective family gates).
# Stale-shard hygiene (ADVICE r13): every run gets a FRESH mktemp shard dir
# (two concurrent gates can never share paths) and the merge HARD-FAILS if
# any expected shard record is missing or predates the run start — a crashed
# shard can no longer be papered over by a previous run's leftovers.
set -u
SF_DIR="${1:-/root/repo/var/sf1}"
N="${2:-3}"
TMO="${3:-1200}"
OUT="${4:-CORRECTNESS_local_sf_gate.json}"
shift $(( $# < 4 ? $# : 4 ))
ONLY=("$@")
cd "$(dirname "$0")/.."
# per-run shard dir: two concurrent gates (e.g. sf1 + sf3) must never share
# shard paths — a second launch would wipe the first's in-flight records
SHARD_DIR=$(mktemp -d /tmp/sf_gate_run.XXXXXX)
T_START=$(date +%s)
if [ "${#ONLY[@]}" -gt 0 ]; then
  QUERIES=("${ONLY[@]}")
else
  mapfile -t QUERIES < <(python3 -c "
import sys; sys.path.insert(0, '.')
import __spark_entry__ as e
print('\n'.join(e.queries()))")
fi
PIDS=()
for i in $(seq 0 $((N-1))); do
  NAMES=$(for j in "${!QUERIES[@]}"; do
    if [ $((j % N)) -eq "$i" ]; then echo "${QUERIES[$j]}"; fi
  done | tr '\n' ' ')
  if [ -z "${NAMES// }" ]; then continue; fi
  SPARK_GRAFT_CHECK_SF_DIR="$SF_DIR" SPARK_GRAFT_ORACLE_TIMEOUT="$TMO" \
    SPARK_GRAFT_ORACLE_MEM="${SPARK_GRAFT_ORACLE_MEM:-24GB}" \
    python tools/check_correctness.py --json "$SHARD_DIR/shard$i.json" $NAMES \
    > "$SHARD_DIR/shard$i.log" 2>&1 &
  PIDS+=($! "$i")
done
rc=0
set -- "${PIDS[@]}"
EXPECT=()
while [ $# -gt 0 ]; do
  wait "$1" || rc=$?
  EXPECT+=("$2")
  shift 2
done
T_START="$T_START" OUT="$OUT" SF_DIR="$SF_DIR" EXPECT="${EXPECT[*]}" SHARD_DIR="$SHARD_DIR" python3 - <<'PY'
import json, os, sys
t_start = int(os.environ["T_START"])
out = os.environ["OUT"]
entries, totals = {}, {"pass": 0, "weak_rows_only": 0, "fail": 0, "excluded": 0}
memo_setup = {}
capacity = {}
missing = []
for i in os.environ["EXPECT"].split():
    f = os.path.join(os.environ["SHARD_DIR"], f"shard{i}.json")
    if not os.path.exists(f) or os.path.getmtime(f) < t_start:
        missing.append(f)
        continue
    rec = json.load(open(f))
    entries.update(rec["entries"])
    for k in totals:
        totals[k] += rec.get(k, 0)
    for t, s in rec.get("memo_setup_sec", {}).items():
        memo_setup[f"shard{i}:{t}"] = s
    # host parallel capacity bracketing each shard (VERDICT r16 #8):
    # a watchdog trip on a shard whose probe reads >2.5 is host
    # contention, self-evident from the merged record alone
    capacity[f"shard{i}"] = {
        "start": rec.get("parallel32_over_single_at_start"),
        "end": rec.get("parallel32_over_single_at_end"),
    }
if missing:
    print(f"MERGE FAILED: shard record(s) missing or stale: {missing}")
    sys.exit(2)
merged = {"sf_dir": os.environ["SF_DIR"], "total": len(entries),
          "memo_setup_sec": memo_setup,
          "parallel32_over_single_by_shard": capacity,
          "entries": entries, **totals}
json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
print(f"merged {len(entries)} entries -> {out}: "
      f"{totals['pass']} pass, {totals['weak_rows_only']} weak, "
      f"{totals['excluded']} excluded, {totals['fail']} fail")
sys.exit(0 if not (totals["fail"] or totals["excluded"]) else 3)
PY
mrc=$?
[ "$mrc" -ne 0 ] && rc=$mrc
exit $rc
