"""Default-tier smoke subset of the plan bans (ADVICE r17).

The full suite-wide plan audit (tests/test_plans.py) explains ALL 187
registry queries — its session fixture eagerly builds real indexes, which
is why it lives in the slow tier since the r17 rebalance. This module keeps
a CHEAP representative subset in the default `pytest -q` gate so a plan
regression (CartesianProduct / BroadcastNestedLoopJoin / un-bucketed
SortMergeJoin) in a headline family cannot ship past the default tier and
wait for the pre-snapshot full-tier run to be noticed.

Subset rule: one LAZY query per policy-sensitive family (no eager index
builds in any fn below — planning them is seconds, not minutes).
"""

import pytest

from test_plans import _assert_no_unscalable_joins
from vector_store_spark.registry import all_queries

# one per family whose join policy the full suite audits: exact top-k
# (k-heap), batch kNN (mapInPandas + window), inverted-index self-join,
# hash-groupBy dedup, star fact-fact join, text pipeline, temporal window,
# LWW merge, packing window
_SMOKE = (
    "ann_cosine_topk",
    "ann_filtered_topk",
    "knn_batch",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "events_funnel",
    "text_quality",
    "mix_pack_sequences",
    "lww_snapshot",
)


@pytest.fixture(scope="module")
def smoke_plans(spark, sf_dir):
    specs = all_queries()
    return {
        name: specs[name].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
        for name in _SMOKE
    }


def test_smoke_set_still_registered():
    missing = [n for n in _SMOKE if n not in all_queries()]
    assert not missing, f"smoke queries dropped from the registry: {missing}"


def test_no_unscalable_joins_smoke(smoke_plans):
    _assert_no_unscalable_joins(smoke_plans)


def test_topk_uses_k_heaps_smoke(smoke_plans):
    for name in ("ann_cosine_topk", "ann_filtered_topk"):
        assert "TakeOrderedAndProject" in smoke_plans[name], (
            f"{name} lost its partition-local k-heap (TakeOrderedAndProject)"
        )
