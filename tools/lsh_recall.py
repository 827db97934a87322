#!/usr/bin/env python
"""Empirical pair-recall audit of the AUTO-SCALED embedding-LSH dedup
(operators/dedup.auto_lsh_params) at any SF.

Ground truth: exhaustive cosine pairs at tau via a blocked numpy GEMM over
the raw parquet (no Spark — this is the offline audit side, quadratic by
definition, which is exactly why the ENGINE must not be). LSH side: the
real operator with num_bits=None/probes=None (corpus-derived banding).

Usage: python tools/lsh_recall.py [SF_DIR] [TAU]
Prints one JSON line: {"sf_dir", "n", "num_bits", "probes", "exact_pairs",
"lsh_pairs", "recall", "precision"}.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
tau = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45

tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                    columns=["vec_id", "embedding"])
ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
m = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
n = len(ids)
norms = np.linalg.norm(m, axis=1)
mn = m / norms[:, None]

exact = set()
BLOCK = 2048
for i0 in range(0, n, BLOCK):
    sims = mn[i0:i0 + BLOCK] @ mn.T  # (block, n)
    bi, bj = np.nonzero(sims >= tau)
    gi = bi + i0
    keep = gi < bj  # upper triangle, id order below
    for a, b in zip(gi[keep], bj[keep]):
        ia, ib = int(ids[a]), int(ids[b])
        exact.add((ia, ib) if ia < ib else (ib, ia))

from pyspark.sql import SparkSession  # noqa: E402

from vector_store_spark.operators.dedup import (  # noqa: E402
    auto_lsh_params,
    embedding_neardup_pairs_lsh,
)

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
num_bits, probes = auto_lsh_params(n)
lsh = {(r.id_a, r.id_b) for r in embedding_neardup_pairs_lsh(
    emb, "vec_id", "embedding", threshold=tau,
    num_bits=None, probes=None, dims=m.shape[1]).collect()}

rec = {
    "sf_dir": sf_dir, "n": n, "num_bits": num_bits, "probes": probes,
    "exact_pairs": len(exact), "lsh_pairs": len(lsh),
    "recall": round(len(lsh & exact) / len(exact), 6) if exact else 1.0,
    "precision": round(len(lsh & exact) / len(lsh), 6) if lsh else 1.0,
}
print(json.dumps(rec))

# bounded teardown (see verify skill: a wedged JVM shutdown thread once
# idled 40+ min after the record was complete)
import threading  # noqa: E402

t = threading.Thread(target=spark.stop, daemon=True)
t.start()
t.join(timeout=60)
sys.stdout.flush()
os._exit(0)
