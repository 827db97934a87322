"""SQL surface (sql.py): vs_* SQL UDFs match the Column-expression spec
bit-for-bit, and a pure-SQL ANN query still compiles to TakeOrderedAndProject
(SQL UDFs are inlined macros, not optimization fences).
"""

from pyspark.sql import functions as F

from vector_store_spark.functions.distance import (
    cosine_distance,
    dot_product_distance,
    hamming_distance,
    l2sq_distance,
    vector_lit,
)
from vector_store_spark.registry import det_query_vector
from vector_store_spark.sql import register_sql_functions


def test_sql_functions_match_column_spec(spark, sf_dir):
    register_sql_functions(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.createOrReplaceTempView("emb_sql_test")
    q = det_query_vector(7, 64)
    qsql = "array(" + ", ".join(repr(float(v)) + "D" for v in q) + ")"
    got = spark.sql(f"""
        SELECT vec_id,
               vs_cosine_distance(CAST(embedding AS ARRAY<DOUBLE>), {qsql}) AS cos_d,
               vs_l2sq_distance(CAST(embedding AS ARRAY<DOUBLE>), {qsql}) AS l2_d,
               vs_ip_distance(CAST(embedding AS ARRAY<DOUBLE>), {qsql}) AS ip_d,
               vs_hamming_distance(CAST(embedding AS ARRAY<DOUBLE>), {qsql}) AS ham_d
        FROM emb_sql_test
    """)
    qlit = vector_lit(q)
    want = emb.select(
        "vec_id",
        cosine_distance("embedding", qlit).alias("cos_d"),
        l2sq_distance("embedding", qlit).alias("l2_d"),
        dot_product_distance("embedding", qlit).alias("ip_d"),
        hamming_distance("embedding", qlit).alias("ham_d"),
    )
    joined = got.alias("g").join(want.alias("w"), "vec_id")
    bad = joined.where(
        (F.col("g.cos_d") != F.col("w.cos_d"))
        | (F.col("g.l2_d") != F.col("w.l2_d"))
        | (F.col("g.ip_d") != F.col("w.ip_d"))
        | (F.col("g.ham_d") != F.col("w.ham_d"))
    )
    assert bad.count() == 0


def test_sql_ann_query_plan_is_top_k(spark, sf_dir):
    register_sql_functions(spark)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView("emb_sql_test")
    df = spark.sql("""
        SELECT vec_id,
               vs_cosine_distance(CAST(embedding AS ARRAY<DOUBLE>),
                                  CAST(array_repeat(0.1D, 64) AS ARRAY<DOUBLE>)) AS d
        FROM emb_sql_test ORDER BY d LIMIT 5
    """)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "PythonUDF" not in plan  # SQL UDFs inline; no Python boundary
    assert len(df.collect()) == 5


def test_sql_similarity_mappings(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT vs_cosine_similarity(0.5D) AS c, vs_l2_similarity(3D) AS l, "
        "vs_hamming_similarity(16D, 64) AS h"
    ).first()
    assert row.c == 0.75 and row.l == 0.25 and row.h == 0.75


def test_sql_bm25_matches_executor(spark, sf_dir):
    """register_fts_sql: the SQL macro + views compute the same scores as the
    DataFrame executor, bit-for-bit, for a single-term query."""
    from pyspark.sql import functions as F

    from vector_store_spark.operators.bm25 import bm25_search, build_fts_index
    from vector_store_spark.sql import register_fts_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ix = build_fts_index(docs, "doc_id", "text")
    register_fts_sql(spark, ix, prefix="ftst")
    got = spark.sql("""
        SELECT p.doc_id, round(ftst_bm25_score(
                 CAST(p.tf AS DOUBLE), CAST(d.dl AS DOUBLE), CAST(f.df AS DOUBLE)
               ), 9) AS score
        FROM ftst_postings p
        JOIN ftst_doclens d USING (doc_id)
        JOIN ftst_dfreq  f USING (term)
        WHERE p.term = 'table'
        ORDER BY score DESC, doc_id LIMIT 10
    """).collect()
    mem = bm25_search(ix, "table", 10, round_to=9).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in mem]
