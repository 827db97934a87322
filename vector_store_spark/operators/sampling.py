"""Data-mixing operators: deterministic sampling and token-budget selection.

The two selection primitives a pretraining data pipeline runs after curation:

- ``hash_sample``: reproducible Bernoulli sampling keyed on a hash of the row
  id — the standard trick for resumable/auditable pipelines (the same row is
  always in or out, independent of partitioning, unlike ``df.sample``).
  Pure narrow filter: no shuffle, pushes to the scan.
- ``token_budget_take``: per-group (language/source/domain) greedy selection
  of the best rows until a token budget is exhausted — how data mixes are
  assembled ("50B tokens of code, 10B of math...").

  Scale shape (the skew problem): a running-sum window partitioned by group
  alone sends EVERY row of a language through one task — on an
  English-dominated 100 TB corpus that is the classic single-reducer
  scale-killer. ``token_budget_take`` therefore runs a histogram-threshold
  two-pass: (1) aggregate per-(group, score-bucket) token mass — a normal
  parallel hash aggregate; (2) driver-side, compute each bucket's
  cumulative-before mass (KB-sized: groups × buckets); (3) broadcast-join the
  per-bucket base back and drop whole buckets already past budget (a narrow
  filter — rows past the threshold never reach a shuffle); (4) resolve exact
  per-row running totals with a window partitioned by (group, bucket) — max
  task size is one bucket, ~N/num_buckets, not N. Identical output (incl.
  ``running_total``) to the single-window spec ``token_budget_take_window``,
  cross-validated in tests; the running sum is integer arithmetic, so results
  are deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

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


def global_shuffle(df: DataFrame, id_col: str, salt: int = 0) -> DataFrame:
    """Deterministic global shuffle for training order: a total sort on a
    multiplicative-hash key of the row id (ties broken by id, so the order
    is a permutation, not bucket-grouped).  Reproducible under ANY input
    partitioning or epoch re-run — the key depends only on the id and the
    salt (bump the salt per epoch for a fresh order).  At scale Spark plans
    this as a range-partitioned sort (sampled boundaries), producing ordered
    non-overlapping output files — the standard shuffle-before-packing step
    of a training-data pipeline, with no RNG state to coordinate across
    executors."""
    key = hash_bucket(id_col, _MOD, salt).alias("shuffle_key")
    return df.select("*", key).orderBy(
        F.col("shuffle_key").asc(),
        F.col(id_col) if isinstance(id_col, str) else id_col,
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: int = 0,
    num_buckets: int = 1024,
) -> DataFrame:
    """Deterministic per-group row cap in pseudorandom (hash) order — domain
    balancing: "at most N documents per source". A thin reuse of the
    histogram-threshold machinery with weight = 1 and score = a hash of the
    id mapped into [0, 1): the kept set is the ``cap`` hash-first rows of
    each group, reproducible under any partitioning, with no whole-group
    window. Drops the helper columns; adds nothing to the schema."""
    score = hash_bucket(id_col, 100_000, salt).cast("double") / F.lit(100_000.0)
    tagged = df.withColumn("_cap_score", score).withColumn("_cap_w", F.lit(1).cast("long"))
    out = token_budget_take(
        tagged, group_col, "_cap_score", id_col, "_cap_w", cap,
        num_buckets=num_buckets,
    )
    return out.drop("_cap_score", "_cap_w", "running_total")


def token_budget_take_window(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[Column | str],
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Single-window executable spec of the greedy take (NOT the scale path:
    the window is partitioned by group alone, so one task sorts a whole
    group). Kept as the semantics oracle ``token_budget_take`` is
    cross-validated against; use it only for small/debug data."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("running_total", F.sum(weight_col).over(w))
    return out.where(F.col("running_total") - F.col(weight_col) < budget)


def token_budget_take(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    num_buckets: int = 1024,
    score_range: tuple[float, float] = (0.0, 1.0),
    cache_input: bool = False,
) -> DataFrame:
    """Greedy per-group selection, scale-safe: walk rows in
    (``score_col`` DESC, ``id_col`` ASC) order and keep each row whose
    predecessors' total ``weight_col`` is still under ``budget`` (a row may
    overshoot; the next one stops). Adds ``running_total`` (inclusive).

    Histogram-threshold two-pass (see module docstring): the score is
    quantized into ``num_buckets`` monotone buckets over ``score_range``
    (scores outside the range clamp into the edge buckets — ordering within
    a bucket is still exact, by raw score). Equal scores share a bucket, so
    bucket order + in-bucket (score DESC, id ASC) order == the global greedy
    order; per-row running totals come out identical to the single-window
    spec. Worst case (every row one score) degrades to one bucket = the old
    single-task sort; real quality scores spread across buckets."""
    lo, hi = float(score_range[0]), float(score_range[1])
    span = (hi - lo) or 1.0
    raw = F.floor(
        (F.lit(hi) - F.col(score_col).cast("double")) / F.lit(span) * num_buckets
    ).cast("long")
    bucket = F.least(F.lit(num_buckets - 1), F.greatest(F.lit(0), raw))
    # Both passes read the input. By default rely on Catalyst column pruning
    # (the histogram pass reads only group/score/weight — project the input
    # narrow before calling for best effect); pass cache_input=True only when
    # the upstream pipeline is expensive AND already narrow — caching a wide
    # row forces materializing every column and can cost more than the
    # recompute it saves.
    tagged = df.withColumn("_tb_bucket", bucket)
    if cache_input:
        tagged = tagged.cache()

    # pass 1: per-(group, bucket) mass — parallel hash aggregate, KB-sized out
    hist = (
        tagged.groupBy(group_col, "_tb_bucket")
        .agg(F.sum(weight_col).alias("_mass"))
        .collect()
    )
    per_group: dict = {}
    for r in hist:
        per_group.setdefault(r[group_col], []).append((r["_tb_bucket"], r["_mass"]))
    # pass 2 (driver): cumulative-before per bucket; buckets whose base is
    # already >= budget cannot contribute kept rows and are dropped entirely
    base_rows = []
    for g, lst in per_group.items():
        lst.sort()
        cum = 0
        for b, m in lst:
            if cum < budget:
                base_rows.append((g, b, cum))
            cum += m
    gfield = df.schema[group_col]
    base_schema = StructType([
        StructField(group_col, gfield.dataType, gfield.nullable),
        StructField("_tb_bucket", LongType(), False),
        StructField("_tb_base", LongType(), False),
    ])
    base = df.sparkSession.createDataFrame(base_rows, base_schema)

    # pass 3: narrow filter via broadcast inner join, then a window whose
    # partitions are single buckets — max task size N/num_buckets
    kept_buckets = tagged.join(F.broadcast(base), [group_col, "_tb_bucket"])
    w = (
        Window.partitionBy(group_col, "_tb_bucket")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = kept_buckets.withColumn(
        "running_total", F.col("_tb_base") + F.sum(weight_col).over(w)
    )
    return (
        out.where(F.col("running_total") - F.col(weight_col) < budget)
        .drop("_tb_bucket", "_tb_base")
    )


def global_prefix_offsets(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Exclusive global prefix sum of ``weight_col`` in ``id_col`` order —
    the distributed scan, without a whole-table window: (1) per-id-range
    bucket sums (parallel aggregate, KB-sized result), (2) driver-side
    cumulative base per bucket, (3) broadcast the base back and resolve
    within-bucket offsets with a window partitioned by bucket (max task =
    one id-range). Adds ``offset`` (exclusive prefix). Requires integer ids;
    ordering is strictly by id."""
    bucket = F.floor(F.col(id_col) / bucket_size).cast("long")
    tagged = df.withColumn("_ps_bucket", bucket)
    hist = (
        tagged.groupBy("_ps_bucket").agg(F.sum(weight_col).alias("_mass")).collect()
    )
    base_rows, cum = [], 0
    for b, m in sorted((r["_ps_bucket"], r["_mass"]) for r in hist):
        base_rows.append((b, cum))
        cum += m
    base = df.sparkSession.createDataFrame(
        base_rows,
        StructType([
            StructField("_ps_bucket", LongType(), False),
            StructField("_ps_base", LongType(), False),
        ]),
    )
    w = (
        Window.partitionBy("_ps_bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.join(F.broadcast(base), "_ps_bucket").withColumn(
        "offset",
        (F.col("_ps_base") + F.sum(weight_col).over(w) - F.col(weight_col)).cast("long"),
    )
    return out.drop("_ps_bucket", "_ps_base")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    seq_len: int,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Concat-and-chunk sequence packing index (the GPT-style packing: docs
    concatenated in deterministic id order, the token stream cut into
    ``seq_len`` windows). Emits per doc: ``offset`` (global token offset),
    ``seq_id`` (sequence containing the doc's first token), ``seq_end_id``
    (sequence containing its last), ``spans_boundary`` (doc crosses a cut).
    Built on :func:`global_prefix_offsets` — no whole-table window."""
    out = global_prefix_offsets(df, id_col, weight_col, bucket_size)
    start = F.col("offset")
    end = F.col("offset") + F.col(weight_col) - 1
    return (
        out.withColumn("seq_id", F.floor(start / seq_len).cast("long"))
        .withColumn("seq_end_id", F.floor(end / seq_len).cast("long"))
        .withColumn("spans_boundary", F.col("seq_end_id") != F.col("seq_id"))
    )


def temperature_sample_rates(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_budget: int,
) -> DataFrame:
    """Per-group keep rates (ppm) for **temperature-weighted mixing** — the
    standard multilingual/multi-source rebalancing step (sample source s
    with probability ∝ n_s^α, α = 1/2 here): low-resource groups are
    up-weighted relative to their mass, heavy groups down-weighted, and the
    expected kept mass sums to ``total_budget``.

    All arithmetic after the mass aggregate is INTEGER (floor-sqrt weights,
    BIGINT sums, truncating division), so the rates — and therefore the
    kept set — are bit-identical across engines (float pow/sum ordering
    never enters; IEEE sqrt is exactly rounded, so floor(sqrt(x)) agrees
    everywhere). Returns one row per group: (group, _n mass, rate_ppm).

    Exactness bound: the sqrt argument n·1e6 is formed in double, exact only
    while n·1e6 ≤ 2^53, i.e. per-group mass n ≲ 9.0e9 (9 billion tokens in a
    group — beyond it the last of the 3 fractional sqrt digits can differ by
    1 ulp across engines). Rates are clamped to ≤ 1e6 ppm either way.

    Scale shape: one map-side-combined aggregate to group-dimension size;
    everything downstream of it is dimension-sized arithmetic."""
    mass = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_n")
    )
    # integer sqrt-weight: floor(sqrt(n · 1e6)) keeps 3 fractional digits of
    # sqrt(n) without leaving BIGINT space
    weights = mass.withColumn(
        "_w", F.floor(F.sqrt(F.col("_n").cast("double") * F.lit(1_000_000.0))).cast("long")
    )
    z = weights.agg(F.sum("_w")).first()[0] or 1  # group-dimension collect
    return weights.select(
        group_col,
        "_n",
        F.expr(
            f"least(CAST(1000000 AS BIGINT), "
            f"(((CAST({int(total_budget)} AS BIGINT) * _w) div CAST({int(z)} AS BIGINT))"
            f" * CAST(1000000 AS BIGINT)) div _n)"
        ).alias("rate_ppm"),
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    total_budget: int,
    salt: int = 0,
) -> DataFrame:
    """Keep a deterministic hash sample of each group at its temperature
    rate (see :func:`temperature_sample_rates`): the per-group rates are a
    group-dimension frame broadcast onto the fact scan, the kept set is a
    pure narrow filter — reproducible under any partitioning, no shuffle of
    the fact table."""
    rates = temperature_sample_rates(df, group_col, weight_col, total_budget)
    return (
        df.join(F.broadcast(rates.select(group_col, "rate_ppm")), group_col)
        .where(hash_bucket(id_col, 1_000_000, salt) < F.col("rate_ppm"))
    )


def epoch_repeat_plan(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    targets: DataFrame,
    target_col: str = "target",
) -> DataFrame:
    """Per-group **repetition plan** for mixture targets that exceed a
    group's mass — the upsampling half of data mixing (published LLM
    mixtures quote exactly this: "epochs per source"): a group with target
    3.2× its mass contributes 3 full copies plus a 0.2 hash-sampled
    partial copy. ``targets`` is a group-dimension frame (group, target
    mass). Integer arithmetic throughout (truncating division), so the
    plan — and any engine re-deriving it — is bit-identical.

    Returns (group, _n mass, full_copies, frac_ppm): ``full_copies``
    whole passes over the group plus a partial pass keeping ``frac_ppm``
    of ids. Downstream expansion is :func:`epoch_repeat`."""
    mass = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_n")
    )
    j = mass.join(F.broadcast(targets), group_col)
    t = F.col(target_col).cast("long")
    return j.select(
        group_col,
        "_n",
        F.expr(f"CAST({target_col} AS BIGINT) div _n").alias("full_copies"),
        (
            (t % F.col("_n")) * F.lit(1_000_000)
        ).cast("long").alias("_rem6"),
    ).select(
        group_col, "_n", "full_copies",
        F.expr("_rem6 div _n").alias("frac_ppm"),
    )


def epoch_repeat(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    targets: DataFrame,
    target_col: str = "target",
    salt: int = 0,
) -> DataFrame:
    """Materialize the repetition plan: each row is emitted once per full
    copy (``copy_id`` 0..full_copies−1) plus once more in the partial copy
    when its (salted) hash clears ``frac_ppm`` — the partial copy is the
    deterministic hash-lowest stratum of the group. The plan frame is
    group-dimension-sized and broadcast; expansion is a narrow
    explode-and-filter over the fact scan — row multiplication is the
    intended output (the materialized mixture), not overhead."""
    plan = epoch_repeat_plan(df, group_col, weight_col, targets, target_col)
    out = df.join(
        F.broadcast(plan.select(group_col, "full_copies", "frac_ppm")), group_col
    ).withColumn(
        "copy_id", F.explode(F.sequence(F.lit(0).cast("long"), F.col("full_copies")))
    )
    keep = (F.col("copy_id") < F.col("full_copies")) | (
        hash_bucket(id_col, 1_000_000, salt) < F.col("frac_ppm")
    )
    return out.where(keep).drop("full_copies", "frac_ppm")


def export_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_shards: int,
    salt: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic training-export sharding: every row gets a ``shard``
    (multiplicative-hash bucket of its id — reproducible under any
    partitioning, no shuffle of the fact table to ASSIGN) and a ``pos``
    (0-based rank within its shard by ascending id — the within-file write
    order), plus a shard MANIFEST (rows, total weight) — the sidecar a
    training loader needs to plan epochs without scanning the shards.

    Returns (sharded rows, manifest). Scale shape: assignment is a narrow
    projection; ``pos`` is one rank window partitioned by shard (each
    shard ≈ N/n_shards rows — pick n_shards so a shard fits a task, the
    same knob as any writer's file sizing); the manifest is a
    shard-dimension aggregate with map-side partial combine."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    tagged = df.withColumn(
        "shard", hash_bucket(id_col, n_shards, salt).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc())
    rows = tagged.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    )
    manifest = tagged.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col(weight_col).cast("long")).alias("total_weight"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )
    return rows, manifest
