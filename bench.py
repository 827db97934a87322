"""Benchmark harness (driver protocol): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall seconds.

Metric definitions follow BASELINE.md: query latency for filtered/unfiltered
top-k, batch kNN, and (as they land) BM25 / dedup / text-analysis pipelines.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_store_spark.registry import all_queries
    from vector_store_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("vector-store-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    # warmup: JVM/codegen/arrow spin-up so per-query numbers measure the query
    specs["ann_cosine_topk"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as ex:  # a failing query must not kill the bench line
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
