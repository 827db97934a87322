"""Per-query timing + plan capture harness for the optimization rounds.

Times individual registry queries with the SAME methodology as bench.py
(wall seconds around ``fn(spark, sf_dir).collect()``, warm session) so the
numbers are comparable to the committed bench records, and optionally dumps
``.explain("formatted")`` for each query to ``plans/<tag>/<query>_<suffix>.txt``.

Usage:
    python tools/qtime.py [-n REPS] [--plans TAG --suffix before] name1 name2 ...
    python tools/qtime.py --all-plans TAG --suffix before   # plans only, no timing

The per-corpus build/pair memos behave exactly as in bench.py: the first
timed repeat of an index-backed query pays its build, later repeats serve
from the memoized layout. Repeat 0 is reported separately for that reason.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("-n", "--reps", type=int, default=1)
    ap.add_argument("--plans", default=None, help="plans/<TAG>/ dir to write explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all-plans", default=None, help="dump plans for ALL queries to plans/<TAG>/")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vector_store_spark.registry import all_queries
    from vector_store_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    plans_tag = args.all_plans or args.plans
    plans_dir = None
    if plans_tag:
        plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                 "plans", plans_tag)
        os.makedirs(plans_dir, exist_ok=True)

    def dump_plan(name: str) -> None:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(txt)

    if args.all_plans:
        # warm the session so builds/memos don't dominate
        specs["ann_cosine_topk"].fn(spark, sf_dir).collect()
        for name in sorted(specs):
            try:
                dump_plan(name)
            except Exception as ex:  # noqa: BLE001
                print(f"plan {name}: {type(ex).__name__}: {ex}", file=sys.stderr)
        print(f"plans written to {plans_dir}")
    else:
        names = args.names or sorted(specs)
        # same warmup as bench.py
        specs["ann_cosine_topk"].fn(spark, sf_dir).collect()
        results: dict[str, list[float]] = {}
        for name in names:
            if name not in specs:
                print(f"unknown query: {name}", file=sys.stderr)
                continue
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            lats = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).collect()
                lats.append(round(time.perf_counter() - t0, 4))
            results[name] = lats
            spark.sparkContext.setJobDescription(None)
            print(f"{name}: {lats}")
            if plans_dir:
                try:
                    dump_plan(name)
                except Exception as ex:  # noqa: BLE001
                    print(f"plan {name}: {type(ex).__name__}: {ex}", file=sys.stderr)
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(results, fh, indent=1)

    # bounded teardown (same rationale as bench.py)
    import threading

    stopper = threading.Thread(target=spark.stop, daemon=True)
    stopper.start()
    stopper.join(timeout=60)
    return 0


if __name__ == "__main__":
    os._exit(main())
