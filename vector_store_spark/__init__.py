"""vector_store_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of scylladb/vector-store.

The reference (read at /root/reference, cited per-module as file:line) is a Rust
sidecar that maintains ANN vector indexes and BM25 full-text indexes over ScyllaDB
tables and answers filtered top-k queries. This package re-expresses those
semantics Spark-first:

- ``functions``  — distance / similarity / quantization / text / hashing column
  expressions (JVM-side Catalyst expressions wherever possible).
- ``operators``  — top-k ANN, batch kNN join, BM25, LWW merge, deduplication,
  near-duplicate detection, text analysis.
- ``plans``      — restriction algebra, index routing/scoring planner, catalog.
- ``sources``    — parquet index storage, Alternator-style binary vector decode,
  multimodal binary-column plumbing.
- ``streaming``  — Structured Streaming CDC apply (LWW maintenance).

Design stance: declare logical plans with the DataFrame API and let Catalyst +
Tungsten choose physical strategies; Python touches data only through Arrow-batched
pandas UDFs (never row-at-a-time), and only where built-in expressions genuinely
cannot express the semantics (binary decode, batched GEMM kNN).
"""

__version__ = "0.1.0"
