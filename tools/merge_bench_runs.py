#!/usr/bin/env python
"""Merge per-run bench fulls (the files tools/bench_minofn.py writes) into a
min-of-N record — the SAME merge logic as bench_minofn.py, factored so a
record can be assembled from runs taken across several invocations/host
windows (r17: the six-then-nine-run cdc_resume adjudication, see
BENCH_NOTES_r17.md). Counting rule is unchanged: a run feeds the merge ONLY
if its start gate was capacity-clean (status == 'ok'); if none is, all runs
merge and the record is stamped capacity_clean=false.

Usage: python tools/merge_bench_runs.py OUT PREV run1.json run2.json ...

Input validation (ADVICE r17): inputs must be SINGLE-run fulls of the SAME
sf — a duplicate path, an already-merged min-of-N record (its per-query
values are themselves mins, so re-merging double-mins), or a cross-sf run
would silently produce a bogus record; all three hard-fail here.
"""
import json
import os
import sys

if __name__ != "__main__":
    raise ImportError("tools/merge_bench_runs.py is a script, not a library")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT, PREV = sys.argv[1], sys.argv[2]
RUN_PATHS = sys.argv[3:]
HEALTHY = os.path.join(HERE, "BENCH_local_r14.json")
CALIB_CPU_BAND = 0.070  # bench.py _CALIB_REF

seen_paths = set()
for p in RUN_PATHS:
    ap = os.path.realpath(p)
    if ap in seen_paths:
        sys.exit(f"duplicate input run: {p} (each run may feed the min once)")
    seen_paths.add(ap)
runs = [json.load(open(p)) for p in RUN_PATHS]
for p, r in zip(RUN_PATHS, runs):
    mo = r.get("extras", {}).get("min_of_n")
    if mo and mo.get("n_runs", 1) > 1:
        sys.exit(f"{p} is an already-merged min-of-{mo['n_runs']} record, "
                 "not a single-run full — merging it would double-min")
sfs = {r.get("sf") for r in runs}
if len(sfs) > 1:
    sys.exit(f"runs span multiple scale factors: {sorted(sfs)}")
clean_runs = [r for r in runs
              if r["extras"]["calib_gate"].get("status") == "ok"]
capacity_clean = bool(clean_runs)
counted = clean_runs if capacity_clean else runs

names = set(counted[0]["queries"])
for rec in counted[1:]:
    if set(rec["queries"]) != names:
        sys.exit(f"query sets differ across runs: {names ^ set(rec['queries'])}")
merged_q = {q: round(min(rec["queries"][q] for rec in counted), 4)
            for q in sorted(names)}
total = round(sum(merged_q.values()), 4)

extras = dict(counted[-1]["extras"])
extras["min_of_n"] = {
    # this tool assembles records across invocations, so N was not
    # necessarily fixed before results were observed — stamp it so readers
    # discount cross-record ratios accordingly (ADVICE r17: more runs can
    # only lower mins)
    "merged_across_invocations": True,
    "n_runs": len(runs),
    "n_counted_runs": len(counted),
    "capacity_clean": capacity_clean,
    "per_run_totals": [r["value"] for r in runs],
    "per_run_gate_status": [r["extras"]["calib_gate"].get("status")
                            for r in runs],
    "calib_cpu_ratios_at_start": [
        round(r["extras"]["calib_cpu_sha256_sec_at_start"] / CALIB_CPU_BAND, 3)
        for r in runs],
    # index-aligned with per_run_totals: a run missing the probe emits None
    # instead of silently shrinking the array (ADVICE r17)
    "parallel32_over_single_at_start": [
        round(r["extras"]["calib_cpu_parallel32_sec_at_start"]
              / r["extras"]["calib_cpu_sha256_sec_at_start"], 2)
        if "calib_cpu_parallel32_sec_at_start" in r["extras"] else None
        for r in runs],
}


def _common_ratio(prev_path, merged_q, names, sf):
    prev = json.load(open(prev_path))
    if prev.get("sf") != sf:
        return None, 0, []
    common = set(prev["queries"]) & names
    cur_sum = sum(merged_q[q] for q in common)
    prev_sum = sum(prev["queries"][q] for q in common)
    ratio = round(cur_sum / prev_sum, 4) if prev_sum else None
    regs = [{"query": q, "prev": prev["queries"][q], "now": merged_q[q],
             "ratio": round(merged_q[q] / prev["queries"][q], 3)}
            for q in sorted(common)
            if prev["queries"][q] >= 0.5
            and merged_q[q] / prev["queries"][q] >= 1.25]
    return ratio, len(common), regs


sf = counted[-1].get("sf")
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
    "out": os.path.basename(OUT), "n_runs": len(runs),
    "n_counted": len(counted), "capacity_clean": capacity_clean,
    "total_min_of_n": total,
    "per_run_totals": [r["value"] for r in runs],
    "common_set_ratio_vs_prev": ratio, "common_set_n": common_n,
    "common_set_ratio_vs_r14": ratio_r14,
    "regressions_ge_1_25x": regressions,
}))
