"""Filtered-ANN registry entries (SURVEY.md §2.2 P1–P3, §2.5 T2, §2.10 R4)
over lineitem with the F9 synthetic embedding.

Each query builds its predicate through the Restriction algebra (the same path
the engine's planner uses), then runs exact top-k. Filters are pushed below the
distance computation — at scale they reach the Parquet scan as PushedFilters.
"""

from __future__ import annotations

import datetime

from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.plans.restrictions import restrictions_to_column
from vector_store_spark.registry import ROUND, det_query_vector, load, register, sql_vec
from vector_store_spark.sources.synthetic import (
    LINEITEM_DIMS,
    lineitem_vec_sql,
    with_lineitem_vec,
)
from vector_store_spark.types import Restriction, RestrictionOp, SpaceType

QV = det_query_vector(3, LINEITEM_DIMS)

_SCORED = f"""
(SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_shipdate,
        CAST({lineitem_vec_sql()} AS DOUBLE[]) AS e
 FROM lineitem)
"""

_COS = (
    f"1.0 - list_inner_product(e, {sql_vec(QV)}) / "
    f"(sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(QV)}, {sql_vec(QV)})))"
)


def _oracle(where: str, k: int) -> str:
    return f"""
WITH scored AS (
  SELECT l_orderkey, l_linenumber, round({_COS}, {ROUND}) AS distance
  FROM {_SCORED}
  WHERE {where}
)
SELECT l_orderkey, l_linenumber, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored
ORDER BY distance, l_orderkey, l_linenumber
LIMIT {k}
"""


def _run(spark, sf_dir, restrictions, k):
    df = with_lineitem_vec(load(spark, sf_dir, "lineitem"))
    pred = restrictions_to_column(restrictions, df.schema)
    return ann_topk(
        df, "v", QV, k, space=SpaceType.COSINE, predicate=pred,
        tie_break=["l_orderkey", "l_linenumber"],
        select_cols=["l_orderkey", "l_linenumber"], round_to=ROUND,
    )


@register(
    "filter_eq_in_topk",
    _oracle("l_returnflag = 'R' AND l_linenumber IN (1, 2)", 10),
    "P1 Eq+In restrictions with filtered top-k (vs_index.rs:721-1643 matrix)",
)
def filter_eq_in_topk(spark, sf_dir):
    return _run(
        spark, sf_dir,
        [Restriction.eq("l_returnflag", "R"), Restriction.isin("l_linenumber", [1, 2])],
        10,
    )


@register(
    "filter_range_topk",
    _oracle("l_quantity >= 30.0 AND l_shipdate < TIMESTAMP '1996-06-01'", 10),
    "P1 range restrictions (numeric + timestamp) with filtered top-k",
)
def filter_range_topk(spark, sf_dir):
    return _run(
        spark, sf_dir,
        [
            Restriction.gte("l_quantity", 30.0),
            Restriction.lt("l_shipdate", datetime.datetime(1996, 6, 1)),
        ],
        10,
    )


@register(
    "filter_tuple_topk",
    _oracle(
        "(l_orderkey, l_linenumber) > (3000, 3) AND l_orderkey <= 3100",
        10,
    ),
    "P1 tuple (lexicographic) range restriction — struct compare matches row compare",
)
def filter_tuple_topk(spark, sf_dir):
    return _run(
        spark, sf_dir,
        [
            Restriction.tuple_op(RestrictionOp.GT_TUPLE, ("l_orderkey", "l_linenumber"), (3000, 3)),
            Restriction.lte("l_orderkey", 3100),
        ],
        10,
    )


@register(
    "local_partition_ann",
    _oracle("l_returnflag = 'A' AND l_quantity < 10.0", 5),
    "R4: local-index routing — partition Eq consumed as pruning, residual filtered",
)
def local_partition_ann(spark, sf_dir):
    """Local (per-partition) index analog: the l_returnflag Eq restriction is
    consumed as a partition filter (on partitioned storage Catalyst turns it
    into partition pruning); l_quantity stays as the residual predicate."""
    return _run(
        spark, sf_dir,
        [Restriction.eq("l_returnflag", "A"), Restriction.lt("l_quantity", 10.0)],
        5,
    )
