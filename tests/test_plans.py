"""Suite-wide physical-plan regression: the scale posture the README claims,
asserted over EVERY registry query (planned at sf0.001; planning is cheap and
identical in shape at any SF).

- No SortMergeJoin: every join in the suite broadcasts a metadata-sized side
  (inverted lists, candidate sets, dimensions) or avoids the join entirely.
- No CartesianProduct / BroadcastNestedLoopJoin: dedup candidate generation
  is inverted-index / LSH-band / chunk-blocked, never all-pairs.
- Every ann_*/top-k query plans as TakeOrderedAndProject (partition-local
  k-heaps, no global sort).

A new query that regresses any of these fails here before it ships.
"""

import pytest

from vector_store_spark.registry import all_queries

_FORBIDDEN = ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin")


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, spec in sorted(all_queries().items()):
        out[name] = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_unscalable_joins_anywhere(plans):
    bad = {
        name: [m for m in _FORBIDDEN if m in plan]
        for name, plan in plans.items()
        if any(m in plan for m in _FORBIDDEN)
    }
    assert not bad, f"unscalable join operators crept in: {bad}"


def test_token_budget_has_no_whole_group_window(plans):
    """Skew regression: mix_token_budget's running-sum window must partition
    by (group, score-bucket), never the group alone — a per-group window is a
    single-reducer sort on an English-dominated corpus."""
    plan = plans["mix_token_budget"]
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "_tb_bucket" in line, f"whole-group window: {line.strip()[:160]}"


def test_every_topk_query_uses_k_heaps(plans):
    topk_queries = [n for n in plans if n.startswith(("ann_", "filter_", "bm25_"))]
    topk_queries += ["local_partition_ann", "alternator_ann_topk", "curation_kept_topk"]
    # per-group top-k is a window (one shuffle on the group key), not a
    # global k-heap — the right plan for that shape
    topk_queries.remove("ann_topk_per_partition")
    missing = [n for n in topk_queries if "TakeOrderedAndProject" not in plans[n]]
    assert not missing, f"top-k queries without TakeOrderedAndProject: {missing}"
