"""SQL surface: the engine's scalar functions as Spark SQL UDFs.

The reference exposes its query surface through CQL (`SELECT ... ORDER BY v
ANN OF [...] LIMIT k`, docs/examples/quick-start.cql:26-28). The Spark-native
equivalent of that user experience is plain Spark SQL over the same tables:
``register_sql_functions`` installs `vs_*` scalar functions (Spark 4 SQL UDFs,
`CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>`), after which the
reference's flagship query is literally

    SELECT * FROM embeddings
    ORDER BY vs_cosine_distance(embedding, array(...)) LIMIT 10

SQL UDFs are macros, not black boxes: the body is inlined into the plan at
analysis time, so Catalyst folds constants, pushes filters, and the top-k
still compiles to TakeOrderedAndProject — unlike a Python UDF, which would be
an optimization fence. Definitions mirror functions/distance.py (the
executable spec) exactly; tests cross-validate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). Bodies are pure Spark SQL exprs so
# the analyzer inlines them (no Python boundary, full codegen except HOFs).
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "vs_dot": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)",
    ),
    "vs_norm": (
        "a ARRAY<DOUBLE>", "DOUBLE",
        "sqrt(vs_dot(a, a))",
    ),
    "vs_l2sq_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)",
    ),
    "vs_cosine_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "CASE WHEN vs_norm(a) * vs_norm(b) = 0D THEN 1D "
        "ELSE 1D - vs_dot(a, b) / (vs_norm(a) * vs_norm(b)) END",
    ),
    "vs_ip_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "1D - vs_dot(a, b)",
    ),
    "vs_hamming_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> CASE WHEN (x > 0D) <> (y > 0D) "
        "THEN 1D ELSE 0D END), 0D, (acc, x) -> acc + x)",
    ),
    # similarity mappings (similarity.rs:26-37)
    "vs_cosine_similarity": ("d DOUBLE", "DOUBLE", "(2D - d) / 2D"),
    "vs_l2_similarity": ("d DOUBLE", "DOUBLE", "1D / (1D + d)"),
    "vs_hamming_similarity": ("d DOUBLE, dims INT", "DOUBLE", "1D - d / CAST(dims AS DOUBLE)"),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the vs_* SQL functions into the session; returns the names.
    Idempotent (CREATE OR REPLACE)."""
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) RETURNS {ret} RETURN {body}"
        )
    return list(_FUNCTIONS)


def register_fts_sql(spark: SparkSession, index, prefix: str = "fts") -> None:
    """The BM25 half of the SQL experience: expose a built FtsIndex as temp
    views (`{prefix}_postings`, `{prefix}_doclens`, `{prefix}_dfreq`) plus a
    `{prefix}_bm25_score(tf, dl, df)` SQL macro closed over the corpus stats
    (N, avgdl are build-time scalars, folded at analysis). After this, the
    reference's `/bm25` query is plain Spark SQL:

        SELECT p.doc_id, {prefix}_bm25_score(p.tf, d.dl, f.df) AS score
        FROM {prefix}_postings p
        JOIN {prefix}_doclens d USING (doc_id)
        JOIN {prefix}_dfreq  f USING (term)
        WHERE p.term = 'spark'
        ORDER BY score DESC, doc_id LIMIT 10

    The macro inlines (no Python boundary); joins keep the index's doc_id
    co-partitioning. Idempotent per prefix."""
    index.postings.drop("term_bucket").createOrReplaceTempView(f"{prefix}_postings")
    index.doclens.createOrReplaceTempView(f"{prefix}_doclens")
    index.df_by_term.createOrReplaceTempView(f"{prefix}_dfreq")
    n, avgdl = float(index.n_docs), float(index.avgdl)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}_bm25_score"
        "(tf DOUBLE, dl DOUBLE, df DOUBLE) RETURNS DOUBLE RETURN "
        f"ln(1D + ({n!r}D - df + 0.5D) / (df + 0.5D)) * "
        f"(tf * 2.2D) / (tf + 1.2D * (1D - 0.75D + 0.75D * dl / {avgdl!r}D))"
    )
