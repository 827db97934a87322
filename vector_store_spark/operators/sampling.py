"""Data-mixing operators: deterministic sampling and token-budget selection.

The two selection primitives a pretraining data pipeline runs after curation:

- ``hash_sample``: reproducible Bernoulli sampling keyed on a hash of the row
  id — the standard trick for resumable/auditable pipelines (the same row is
  always in or out, independent of partitioning, unlike ``df.sample``).
  Pure narrow filter: no shuffle, pushes to the scan.
- ``token_budget_take``: per-group (language/source/domain) greedy selection
  of the best rows until a token budget is exhausted — how data mixes are
  assembled ("50B tokens of code, 10B of math..."). One window (single
  shuffle on the group key); the running sum is integer arithmetic, so
  results are deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hashing constant (2^32 / phi); the modulus keeps the
# product within 2^63 so the identical integer arithmetic runs on any engine
# (DuckDB BIGINT overflow would error rather than wrap).
_KNUTH = 2654435761
_MOD = 100_003  # prime


def hash_bucket(id_col: Column | str, buckets: int = 1000, salt: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id:
    ``((id % MOD + salt) * KNUTH) % buckets``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c % _MOD + F.lit(salt)) * F.lit(_KNUTH)) % F.lit(buckets)


def hash_bucket_sql(id_expr: str, buckets: int = 1000, salt: int = 0) -> str:
    return f"((({id_expr}) % {_MOD} + {salt}) * {_KNUTH}) % {buckets}"


def hash_sample(
    df: DataFrame, id_col: str, rate_permille: int, salt: int = 0
) -> DataFrame:
    """Keep rows whose hash bucket < rate_permille (deterministic ≈0.1%-granular
    Bernoulli sample)."""
    return df.where(hash_bucket(id_col, 1000, salt) < rate_permille)


def token_budget_take(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[Column | str],
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Greedy per-group selection: walk rows in ``order_cols`` order and keep
    each row whose predecessors' total ``weight_col`` is still under
    ``budget`` (a row may overshoot the budget; the next one stops). Adds
    ``running_total`` (inclusive). Ordering must be total (include a unique
    id) for deterministic results."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("running_total", F.sum(weight_col).over(w))
    return out.where(F.col("running_total") - F.col(weight_col) < budget)
