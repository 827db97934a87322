#!/usr/bin/env python
"""The committed bench record protocol (VERDICT r15 #1 / r16 #1, memory note
'bench-regression-adjudication'): N sequential calibration-gated bench.py
runs, per-query MIN merge, cross-round common-set ratio computed on the
MERGED mins against the previous committed record — like-for-like
(min-of-N vs min-of-N), never single-run vs record.

r17 capacity rule (VERDICT r16 #1c): a run counts toward the min-merge
ONLY if its start gate was capacity-clean (gate status == 'ok', which now
also certifies parallel32_over_single <= the gate band). If no run is
clean the merge falls back to all runs and the record is stamped
capacity_clean=false so it is self-labelled as unfit to baseline against.

Adjudication baseline (ADVICE r16): r15/r16 records were taken on a
parallel-degraded host, so in addition to PREV (highest-numbered record)
the verdict carries common_set_ratio_vs_r14 — the last healthy-host
min-of-5 — whenever BENCH_local_r14.json exists.

Usage: python tools/bench_minofn.py [N] [OUT] [PREV]
Defaults: N=5, OUT=BENCH_local_r17.json, PREV=highest BENCH_local_r*.json.

Writes per-run fulls to var/bench_minofn_run<i>.json, the merged record to
OUT, and prints a one-line JSON verdict (totals, ratio, regressions,
calib ratios per run).
"""
import glob
import json
import os
import re
import subprocess
import sys

if __name__ != "__main__":
    # top-to-bottom script: an import would LAUNCH a multi-hour bench
    # session as a side effect — refuse loudly instead
    raise ImportError("tools/bench_minofn.py is a script, not a library")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "BENCH_local_r17.json")
if len(sys.argv) > 3:
    PREV = sys.argv[3]
else:
    cands = []
    for p in glob.glob(os.path.join(HERE, "BENCH_local_r*.json")):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
        if m and os.path.abspath(p) != os.path.abspath(OUT):
            cands.append((int(m.group(1)), p))
    PREV = max(cands)[1] if cands else None
HEALTHY = os.path.join(HERE, "BENCH_local_r14.json")

CALIB_CPU_BAND = 0.070  # bench.py _CALIB_REF

runs = []
calib_ratios = []
for i in range(N):
    full = os.path.join(HERE, "var", f"bench_minofn_run{i}.json")
    env = dict(os.environ, SPARK_GRAFT_BENCH_FULL=full,
               SPARK_GRAFT_CALIB_WAIT=os.environ.get("SPARK_GRAFT_CALIB_WAIT", "900"))
    print(f"== run {i + 1}/{N}", file=sys.stderr)
    r = subprocess.run([sys.executable, os.path.join(HERE, "bench.py")],
                       env=env, cwd=HERE, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        sys.exit(f"bench run {i} failed rc={r.returncode}")
    rec = json.load(open(full))
    runs.append(rec)
    ratio = round(rec["extras"]["calib_cpu_sha256_sec_at_start"] / CALIB_CPU_BAND, 3)
    calib_ratios.append(ratio)
    gate = rec["extras"]["calib_gate"]
    print(f"   total={rec['value']} calib_cpu_ratio={ratio} "
          f"gate={gate.get('status')} "
          f"par32/single={gate.get('parallel32_over_single')}", file=sys.stderr)

# capacity rule: only capacity-clean runs feed the record; all-hot falls
# back to everything (still a record, but self-labelled unfit-to-baseline)
clean_runs = [rec for rec in runs
              if rec["extras"]["calib_gate"].get("status") == "ok"]
capacity_clean = bool(clean_runs)
counted = clean_runs if capacity_clean else runs
if not capacity_clean:
    print("!! no capacity-clean run — merging ALL runs, record stamped "
          "capacity_clean=false", file=sys.stderr)

# per-query min merge over the intersection-of-all (a query missing from a
# run would silently skew the total otherwise — hard-fail instead)
names = set(counted[0]["queries"])
for rec in counted[1:]:
    if set(rec["queries"]) != names:
        sys.exit(f"query sets differ across runs: "
                 f"{names ^ set(rec['queries'])}")
merged_q = {q: round(min(rec["queries"][q] for rec in counted), 4)
            for q in sorted(names)}
total = round(sum(merged_q.values()), 4)

extras = dict(counted[-1]["extras"])
extras["min_of_n"] = {
    # ADVICE r17 (pre-register N): N is fixed at invocation, before any
    # result is observed. If runs are later ADDED via merge_bench_runs.py,
    # that merge must stamp n_extended_after_observation=true in its notes —
    # more runs can only lower mins, so an extended-N ratio reads low.
    "preregistered_n": N,
    "n_runs": N,
    "n_counted_runs": len(counted),
    "capacity_clean": capacity_clean,
    "per_run_totals": [rec["value"] for rec in runs],
    "per_run_gate_status": [rec["extras"]["calib_gate"].get("status")
                            for rec in runs],
    "calib_cpu_ratios_at_start": calib_ratios,
    # host PARALLEL capacity per run, fixed shared-blob probe (healthy
    # ~1-1.5, gate band <=2.5 — see bench.py _CALIB_PAR_MAX; the old
    # ">3 = degraded" band belonged to the GIL-inflated probe)
    # index-aligned with per_run_totals: a run missing the probe emits None
    # instead of silently shrinking the array (ADVICE r17)
    "parallel32_over_single_at_start": [
        round(rec["extras"]["calib_cpu_parallel32_sec_at_start"]
              / rec["extras"]["calib_cpu_sha256_sec_at_start"], 2)
        if "calib_cpu_parallel32_sec_at_start" in rec["extras"] else None
        for rec in runs
    ],
}


def _common_ratio(prev_path, merged_q, names, sf):
    """(ratio, common_n, regressions) of merged mins vs a prior record."""
    prev = json.load(open(prev_path))
    if prev.get("sf") != sf:
        return None, 0, []
    common = set(prev["queries"]) & names
    cur_sum = sum(merged_q[q] for q in common)
    prev_sum = sum(prev["queries"][q] for q in common)
    ratio = round(cur_sum / prev_sum, 4) if prev_sum else None
    regs = []
    for q in sorted(common):
        pq = prev["queries"][q]
        if pq >= 0.5 and merged_q[q] / pq >= 1.25:
            regs.append({"query": q, "prev": pq, "now": merged_q[q],
                         "ratio": round(merged_q[q] / pq, 3)})
    return ratio, len(common), regs


regressions = []
ratio = None
common_n = 0
sf = counted[-1].get("sf")
if PREV:
    ratio, common_n, regressions = _common_ratio(PREV, merged_q, names, sf)
    extras["common_set_ratio_vs_prev"] = ratio
    extras["common_set_n"] = common_n
    extras["prev_record"] = os.path.basename(PREV)
    extras["per_query_regressions_ge_1_25x"] = regressions
ratio_r14 = None
if os.path.exists(HEALTHY) and os.path.abspath(HEALTHY) != os.path.abspath(OUT):
    ratio_r14, n14, regs14 = _common_ratio(HEALTHY, merged_q, names, sf)
    extras["common_set_ratio_vs_r14"] = ratio_r14
    extras["common_set_n_vs_r14"] = n14
    extras["per_query_regressions_ge_1_25x_vs_r14"] = regs14

record = {"metric": "headline_queries_total", "value": total, "unit": "sec",
          "queries": merged_q, "sf": sf, "extras": extras}
json.dump(record, open(OUT, "w"))
print(json.dumps({
    "out": os.path.basename(OUT), "n_runs": N, "n_counted": len(counted),
    "capacity_clean": capacity_clean, "total_min_of_n": total,
    "per_run_totals": [rec["value"] for rec in runs],
    "calib_cpu_ratios": calib_ratios,
    "common_set_ratio_vs_prev": ratio, "common_set_n": common_n,
    "common_set_ratio_vs_r14": ratio_r14,
    "regressions_ge_1_25x": regressions,
}))
