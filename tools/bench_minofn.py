#!/usr/bin/env python
"""The committed bench record protocol (VERDICT r15 #1, memory note
'bench-regression-adjudication'): N sequential calibration-gated bench.py
runs, per-query MIN merge, cross-round common-set ratio computed on the
MERGED mins against the previous committed record — like-for-like
(min-of-N vs min-of-N), never single-run vs record.

Usage: python tools/bench_minofn.py [N] [OUT] [PREV]
Defaults: N=5, OUT=BENCH_local_r16.json, PREV=highest BENCH_local_r*.json.

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

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "BENCH_local_r16.json")
if len(sys.argv) > 3:
    PREV = sys.argv[3]
else:
    cands = []
    for p in glob.glob(os.path.join(HERE, "BENCH_local_r*.json")):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
        if m and os.path.abspath(p) != os.path.abspath(OUT):
            cands.append((int(m.group(1)), p))
    PREV = max(cands)[1] if cands else None

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
    print(f"   total={rec['value']} calib_cpu_ratio={ratio} "
          f"gate={rec['extras']['calib_gate'].get('status')}", file=sys.stderr)

# per-query min merge over the intersection-of-all (a query missing from a
# run would silently skew the total otherwise — hard-fail instead)
names = set(runs[0]["queries"])
for rec in runs[1:]:
    if set(rec["queries"]) != names:
        sys.exit(f"query sets differ across runs: "
                 f"{names ^ set(rec['queries'])}")
merged_q = {q: round(min(rec["queries"][q] for rec in runs), 4)
            for q in sorted(names)}
total = round(sum(merged_q.values()), 4)

extras = dict(runs[-1]["extras"])
extras["min_of_n"] = {
    "n_runs": N,
    "per_run_totals": [rec["value"] for rec in runs],
    "calib_cpu_ratios_at_start": calib_ratios,
    # host PARALLEL capacity per run (≈1-2 healthy; >3 = degraded — see
    # BENCH_NOTES_r16.md): the single-core gate can read ~1.0 while these
    # read 5-10x, which inflates every multi-core query 1.4-2x
    "parallel32_over_single_at_start": [
        round(rec["extras"]["calib_cpu_parallel32_sec_at_start"]
              / rec["extras"]["calib_cpu_sha256_sec_at_start"], 2)
        for rec in runs
        if "calib_cpu_parallel32_sec_at_start" in rec["extras"]
    ],
}

regressions = []
ratio = None
common_n = 0
if PREV:
    prev = json.load(open(PREV))
    if prev.get("sf") == runs[-1].get("sf"):
        common = set(prev["queries"]) & names
        common_n = len(common)
        cur_sum = sum(merged_q[q] for q in common)
        prev_sum = sum(prev["queries"][q] for q in common)
        ratio = round(cur_sum / prev_sum, 4) if prev_sum else None
        for q in sorted(common):
            pq = prev["queries"][q]
            if pq >= 0.5 and merged_q[q] / pq >= 1.25:
                regressions.append(
                    {"query": q, "prev": pq, "now": merged_q[q],
                     "ratio": round(merged_q[q] / pq, 3)})
    extras["common_set_ratio_vs_prev"] = ratio
    extras["common_set_n"] = common_n
    extras["prev_record"] = os.path.basename(PREV)
    extras["per_query_regressions_ge_1_25x"] = regressions

record = {"metric": "headline_queries_total", "value": total, "unit": "sec",
          "queries": merged_q, "sf": runs[-1].get("sf"), "extras": extras}
json.dump(record, open(OUT, "w"))
print(json.dumps({
    "out": os.path.basename(OUT), "n_runs": N, "total_min_of_n": total,
    "per_run_totals": [rec["value"] for rec in runs],
    "calib_cpu_ratios": calib_ratios,
    "common_set_ratio_vs_prev": ratio, "common_set_n": common_n,
    "regressions_ge_1_25x": regressions,
}))
