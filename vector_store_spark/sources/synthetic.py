"""Deterministic synthetic embeddings grafted onto the driver's star schema
(FIXTURES.md F9): lineitem gains an 8-dim vector derived from its keys with
exact integer arithmetic, so the *identical* expression can be evaluated by
Spark and by the DuckDB oracle with bit-equal results.

v_i = (((l_orderkey·31 + l_partkey·17 + l_suppkey·13 + i·7) mod 97) − 48) / 48
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINEITEM_DIMS = 8


def lineitem_vec_col() -> Column:
    """array<double> expression over lineitem key columns."""
    base = F.col("l_orderkey") * 31 + F.col("l_partkey") * 17 + F.col("l_suppkey") * 13
    return F.array(
        *[((base + F.lit(i * 7)) % 97 - 48) / F.lit(48.0) for i in range(LINEITEM_DIMS)]
    )


def lineitem_vec_sql() -> str:
    """The same expression as a DuckDB DOUBLE[] literal-expression."""
    base = "(l_orderkey*31 + l_partkey*17 + l_suppkey*13"
    elems = ", ".join(f"({base} + {i * 7}) % 97 - 48) / 48.0" for i in range(LINEITEM_DIMS))
    return f"[{elems}]"


def with_lineitem_vec(df: DataFrame, col_name: str = "v") -> DataFrame:
    return df.withColumn(col_name, lineitem_vec_col())
