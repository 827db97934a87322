"""End-to-end training-data curation: exact dedup → quality gate → language ID.

Composes the dedup (operators/dedup.py) and text-analysis
(operators/textstats.py) primitives into the single pass a large-scale
pretraining pipeline runs over a raw corpus: drop exact duplicates (keep the
lowest id per normalized content), compute Gopher/C4-style quality signals,
keep documents inside a token-length band with a minimum composite quality
score, and tag each kept document with its predicted language.

Scale notes (100 TB posture):
- Dedup is ONE aggregation: ``groupBy(content_fingerprint)`` +
  ``min_by(struct(row), id)`` — partial aggregation collapses duplicates
  map-side so only one row per (task, content) crosses the exchange; there is
  no window (which would shuffle every row) and no self-join. The grouping
  key is the 128-bit MD5 of the normalized text, so the key's shuffle bytes
  are constant per row (the kept row's text still travels as the aggregation
  value — it is the payload downstream stages need). The struct buffer makes
  it a SortAggregate rather than HashAggregate — acceptable because the
  partial combine dominates at scale.
- Quality features + language ID are pure per-row projections (one scan,
  whole-stage codegen); the quality filter runs before the aggregate so only
  kept rows reach any downstream shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_store_spark.operators.dedup import content_fingerprint
from vector_store_spark.operators.textstats import quality_features


def curate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: Sequence[str] = (),
    min_tokens: int = 20,
    max_tokens: int = 1000,
    min_quality: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Curated corpus: one row per kept document with quality features and
    ``pred_lang``. Keeps the minimum-``id_col`` row per exact-duplicate group,
    then documents with ``min_tokens <= n_tokens <= max_tokens`` and
    ``round(quality_score, round_digits) >= min_quality``."""
    row_cols = [id_col, *extra_cols, text_col]
    uniq = (
        docs.groupBy(content_fingerprint(text_col).alias("_fp"))
        .agg(F.min_by(F.struct(*row_cols), F.col(id_col)).alias("_row"))
        .select("_row.*")
    )
    # one fused Arrow pass computes token stats AND language ID (one
    # tokenization, one Python boundary), then the filter is native
    feats = quality_features(
        uniq, id_col, text_col, extra_cols=extra_cols, include_lang=True
    ).withColumn("quality_score", F.round("quality_score", round_digits))
    return feats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality_score") >= min_quality)
    )


def quantile_thresholds(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    position_num: int = 1,
    position_den: int = 2,
) -> DataFrame:
    """Per-group score threshold at rank position ceil(n·num/den) — the
    exact quantile a rank-window would produce, computed WITHOUT a
    corpus-wide window: aggregate a (group, score) histogram (bounded by
    groups × distinct scores — scores arrive pre-rounded, so this is
    metadata-sized at any corpus size), then a cumulative window over the
    HISTOGRAM finds the smallest score whose cumulative count reaches the
    position. Equivalent to ordering each group by (score, id) and reading
    the score at that rank: tie order within a score value cannot change
    the score at any rank.

    Returns (group, n_docs, threshold)."""
    hist = scored.groupBy(group_col, score_col).agg(
        F.count("*").alias("_c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(group_col)
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(wn)
    )
    pos = F.expr(f"CAST((_n * {int(position_num)} + {int(position_den)} - 1) "
                 f"div {int(position_den)} AS BIGINT)")
    return (
        cum.where(F.col("_cum") >= pos)
        .groupBy(group_col)
        .agg(
            F.min(score_col).alias("threshold"),
            F.max("_n").cast("long").alias("n_docs"),
        )
        .select(group_col, "n_docs", "threshold")
    )
