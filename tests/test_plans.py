"""Suite-wide physical-plan regression: the scale posture the README claims,
asserted over EVERY registry query (planned at sf0.001; planning is cheap and
identical in shape at any SF).

Per-query join policy (not one global rule):
- CartesianProduct / BroadcastNestedLoopJoin banned EVERYWHERE: dedup
  candidate generation is inverted-index / LSH-band / chunk-blocked, never
  all-pairs.
- Broadcast joins are only for dimension-classed sides (constant or
  metadata-sized: nation/region, centroids, per-query-term rows, candidate
  sets). Fact-fact equi-joins use shuffle-hash (or a bucketed co-located
  SortMergeJoin, which plans with zero Exchange/Sort — see
  tests/test_bucketed.py).
- SortMergeJoin is otherwise banned: an un-bucketed SMJ means an unplanned
  full shuffle+sort of both sides.
- Every ann_*/top-k query plans as TakeOrderedAndProject (partition-local
  k-heaps, no global sort).

A new query that regresses any of these fails here before it ships.
"""

import re

import pytest

from vector_store_spark.registry import all_queries

_BANNED_EVERYWHERE = ("CartesianProduct", "BroadcastNestedLoopJoin")
# Queries allowed to plan SortMergeJoin — ONLY for bucketed co-located joins
# (bucket-to-bucket, no Exchange under the join). Empty today; a query goes
# here only with a companion no-Exchange assertion like test_bucketed.py's.
_BUCKETED_SMJ_OK: frozenset = frozenset()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, spec in sorted(all_queries().items()):
        out[name] = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.fixture(scope="module")
def internal_plans(spark, sf_dir):
    """Plans of the registered internal probes: entries whose RESULT frame is
    eager-localized (memory-sink table, driver-greedy createDataFrame, cached
    collect) expose their distributed pipeline via
    QuerySpec.internal_plan_fn so the suite-wide bans still audit it."""
    out = {}
    for name, spec in sorted(all_queries().items()):
        if spec.internal_plan_fn is None:
            continue
        dfs = spec.internal_plan_fn(spark, sf_dir)
        if not isinstance(dfs, (list, tuple)):
            dfs = [dfs]
        for i, df in enumerate(dfs):
            out[f"{name}#internal{i}"] = (
                df._jdf.queryExecution().executedPlan().toString()
            )
    return out


def _eager_localized(plan: str) -> bool:
    """An executed plan with NO file scan that reads a local/driver-side
    relation: the entry's real work happened somewhere the plan can't show
    (memory sink, internal collect)."""
    return "FileScan" not in plan and (
        "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    )


def test_eager_localized_entries_register_internal_probe(plans):
    """Registry-wide closure of the plan audit (VERDICT r13 #8): every entry
    whose returned frame is eager-localized MUST register an internal-plan
    probe; otherwise a future localization silently exempts itself from the
    suite-wide bans."""
    specs = all_queries()
    missing = [
        n for n, p in plans.items()
        if _eager_localized(p) and specs[n].internal_plan_fn is None
    ]
    assert not missing, (
        f"eager-localized entries without internal_plan_fn probes: {missing}"
    )


def _assert_no_unscalable_joins(named_plans):
    bad = {}
    for name, plan in named_plans.items():
        hits = [m for m in _BANNED_EVERYWHERE if m in plan]
        base = name.split("#")[0]
        if "SortMergeJoin" in plan and base not in _BUCKETED_SMJ_OK:
            hits.append("SortMergeJoin (un-bucketed)")
        if hits:
            bad[name] = hits
    assert not bad, f"unscalable join operators crept in: {bad}"


def test_no_unscalable_joins_anywhere(plans):
    _assert_no_unscalable_joins(plans)


def test_no_unscalable_joins_in_internal_probes(internal_plans):
    _assert_no_unscalable_joins(internal_plans)


def test_star_fact_fact_joins_never_broadcast(plans):
    """100 TB posture for the star queries: orders/customer/lineitem-derived
    sides grow linearly with SF and must never be broadcast. The only
    broadcasts allowed are the constant-size dimensions (nation, region)."""
    plan = plans["star_revenue_by_nation"]
    assert plan.count("ShuffledHashJoin") >= 2, (
        "lineitem-orders and orders-customer must be shuffle-hash joins"
    )
    assert plan.count("BroadcastHashJoin") == 2, (
        "exactly nation+region may broadcast in star_revenue_by_nation"
    )

    plan = plans["star_order_priority_fulfillment"]
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastExchange" not in plan, (
        "the fact-derived semi-join side must not be broadcast"
    )


def test_token_budget_has_no_whole_group_window(plans):
    """Skew regression: mix_token_budget's running-sum window must partition
    by (group, score-bucket), never the group alone — a per-group window is a
    single-reducer sort on an English-dominated corpus."""
    plan = plans["mix_token_budget"]
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "_tb_bucket" in line, f"whole-group window: {line.strip()[:160]}"


def test_bm25_never_broadcasts_posting_lists(plans):
    """A term's inverted list is O(df(term)) — corpus-scaled for common terms
    — so every postings⋈doclens / clause⋈clause scoring join must be a
    co-partitioned shuffle-hash join. The only broadcasts allowed are
    metadata-sized: the per-query-term df rows and the one-row Σidf aggregate
    (both one BroadcastHashJoin per query term / per phrase)."""
    max_broadcasts = {
        # number of query terms (df-row joins) + phrase Σidf one-row joins
        "bm25_term": 1,
        "bm25_and": 3,
        "bm25_or_not": 3,
        "bm25_phrase": 1,
        # 1 df row + the update_fts_index maintenance lineage: changed-doc-id
        # broadcasts into the postings/doclens removal anti-joins — all
        # O(changed docs), which IS metadata-sized for incremental CRUD
        "bm25_incremental_term": 5,
        "bm25_persisted_term": 1,
    }
    for name, allowed in max_broadcasts.items():
        plan = plans[name]
        assert plan.count("ShuffledHashJoin") >= 1, f"{name}: scoring join not SHJ"
        got = plan.count("BroadcastHashJoin")
        assert got <= allowed, (
            f"{name}: {got} broadcast joins (> {allowed} metadata-sized ones) "
            "— a posting list or clause result is being broadcast"
        )


def test_every_topk_query_uses_k_heaps(plans):
    topk_queries = [n for n in plans if n.startswith(("ann_", "filter_", "bm25_"))]
    topk_queries += [
        "local_partition_ann", "local_partition_ann_ivf",
        "alternator_ann_topk", "curation_kept_topk",
    ]
    # per-group top-k is a window (one shuffle on the group key), not a
    # global k-heap — the right plan for that shape
    topk_queries.remove("ann_topk_per_partition")
    # MMR's returned frame is the driver-side greedy's result (result-sized
    # createDataFrame); the k-heap ran inside its shortlist ann_topk collect,
    # which this plan snapshot can't see
    topk_queries.remove("ann_mmr_topk")
    # the OpenSearch backend's top-k runs SERVER-side (the adapter only
    # parses hits); its returned frame is the result-sized hits pivot, and
    # its distributed leg (bulk-body construction) is audited via the
    # internal probe
    topk_queries.remove("ann_opensearch_topk")
    # the HTTP entry's returned frame is the parsed wire response; the
    # k-heap ran inside the route (its internal probe pins the engine plan,
    # which the TakeOrderedAndProject assertion below covers via
    # internal_plans)
    topk_queries.remove("ann_http_topk")
    # same wire-response shape for the serving-cache variant: the top-k ran
    # in the RAM snapshot (numpy argsort over the armed index — no Spark
    # plan by design; the reference's usearch serve path likewise never
    # touches the query engine); ranking + values are pinned by the DuckDB
    # oracle at every gate SF and the Spark-side engine plan by the same
    # internal probe as ann_http_topk
    topk_queries.remove("ann_http_cached_topk")
    # the graph-snapshot variant: the top-k ran in the cached beam search
    # (HnswServingCache — no Spark plan by design, the usearch RAM
    # posture); its internal probe pins the Spark hnsw path's k-heap below
    topk_queries.remove("ann_http_cached_hnsw_topk")
    # filtered variant through the same RAM snapshot — same wire-response
    # shape, same internal probe
    topk_queries.remove("ann_http_cached_filtered_topk")
    missing = [n for n in topk_queries if "TakeOrderedAndProject" not in plans[n]]
    assert not missing, f"top-k queries without TakeOrderedAndProject: {missing}"


def test_http_entries_internal_probe_uses_k_heap(internal_plans):
    """The HTTP entries' returned frames are parsed wire responses
    (LocalTableScan), so the k-heap exemptions above lean on the shared
    internal probe (_http_internal_probe) pinning the engine plan under the
    route. Assert it here so the exemption comments' claim is actually
    enforced (ADVICE r16): the distributed leg under /ann must be a global
    k-heap, not a full sort."""
    for key in ("ann_http_topk#internal0", "ann_http_cached_topk#internal0",
                "ann_http_cached_hnsw_topk#internal0",
                "ann_http_cached_filtered_topk#internal0"):
        assert "TakeOrderedAndProject" in internal_plans[key], (
            f"engine plan under the /ann route ({key}) lost its k-heap"
        )


def test_dedup_drop_list_never_broadcasts_the_keepset(plans):
    """100 TB posture for the dedup keep-set: the drop list scales with the
    duplicate count (30 % dup rate on 100 TB = tens of billions of ids), so
    it is fact-classed — applied via shuffle-hash semi-join, never broadcast.
    (Pair generation sits behind the label-propagation localCheckpoint, so
    the visible plan IS the drop-list application.)"""
    plan = plans["dedup_drop_list"]
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan, (
        "drop-list apply must be a shuffle-hash semi-join"
    )
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan, (
        "the drop list (fact-sized) is being broadcast"
    )


def test_dedup_groups_row_form_no_broadcast_no_fat_agg(plans):
    """dedup_groups_minhash emits (group_id, member_id, group_size) rows —
    no collect_list over an unbounded component, no broadcast of the member
    set."""
    plan = plans["dedup_groups_minhash"]
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
    assert "collect_list" not in plan


def test_memorization_frequent_set_never_broadcasts(plans):
    """text_ngram_memorization's frequent-gram set is data-sized (boilerplate
    volume grows with the corpus) — it must apply as a shuffle-hash LEFT SEMI,
    never a broadcast (same fact-classing as the dedup drop list)."""
    plan = plans["text_ngram_memorization"]
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan
    # the ONLY broadcast allowed is none: gram stream joins are all SHJ
    assert "BroadcastHashJoin" not in plan, (
        "a gram-keyed side is being broadcast in text_ngram_memorization"
    )


def test_keep_best_members_never_broadcast(plans):
    """dedup_keep_best joins the duplicate-membership frame (fact-classed:
    scales with duplicate volume) to per-doc quality — shuffle-hash, with
    broadcasts reserved for the label-propagation loop's bounded frames."""
    plan = plans["dedup_keep_best"]
    assert "ShuffledHashJoin" in plan


def test_substring_spans_never_broadcasts_gram_keys(plans):
    """dedup_substring_spans joins the duplicated-n-gram key set back onto the
    position frame; both sides are fact-sized, so the semi-join must be
    shuffle-hash — zero broadcasts anywhere in the plan."""
    assert plans["dedup_substring_spans"].count("BroadcastHashJoin") == 0, (
        "the duplicated-gram key set (fact-sized) is being broadcast"
    )


def test_source_overlap_broadcasts_only_the_size_frame(plans):
    """text_source_overlap's gram self-join is fact-fact (SHUFFLE_HASH); the
    only broadcasts allowed are the two source-count-bounded size joins."""
    got = plans["text_source_overlap"].count("BroadcastHashJoin")
    assert got == 2, (
        f"{got} broadcast joins (expected exactly the 2 per-source size "
        "frames) — a gram-keyed side is being broadcast"
    )



def _unpartitioned_window_specs(line: str) -> list:
    """Return the windowspecdefinition(...) arg strings on this plan line
    that define NO partition columns. In plan text the spec prints as
    windowspecdefinition(part..., order ASC/DESC NULLS ..., specifiedwindowframe(...));
    order args carry an ASC/DESC NULLS marker, partition args never do —
    a spec whose every non-frame arg is a sort-spec (or that has none) is
    unpartitioned."""
    out = []
    for m in re.finditer(r"windowspecdefinition\(", line):
        depth, i = 1, m.end()
        while i < len(line) and depth:
            if line[i] == "(":
                depth += 1
            elif line[i] == ")":
                depth -= 1
            i += 1
        body = line[m.end():i - 1]
        # split top-level commas
        args, buf, d = [], [], 0
        for ch in body:
            if ch == "," and d == 0:
                args.append("".join(buf).strip())
                buf = []
                continue
            if ch in "([":
                d += 1
            elif ch in ")]":
                d -= 1
            buf.append(ch)
        if buf:
            args.append("".join(buf).strip())
        pre_frame = [a for a in args if not a.startswith("specifiedwindowframe(")]
        if all(" ASC NULLS " in a or " DESC NULLS " in a for a in pre_frame):
            out.append(body[:120])
    return out


# Unpartitioned windows force the WHOLE input frame through one task
# (Exchange SinglePartition + single sorted partition). Allowed only where
# the window input is RESULT-sized by construction (documented per entry);
# anything fed by a frame that grows with the corpus must use either a
# partitioned window or the two-pass bucketed prefix sum
# (operators/sampling.py global_prefix_offsets).
_UNPARTITIONED_WINDOW_OK = {
    # ranked_top_n (operators/topk.py): ranks the ALREADY-REDUCED global
    # top-k output (<= k rows) to emit dense ranks — result-sized.
    "ann_ranked_topk",
    # rrf_fuse (operators/hybrid.py): per-leg rank windows run over each
    # leg's ALREADY-TRUNCATED top-k candidate list (pool <= legs x k rows,
    # result-sized by construction) before the fusion join.
    "hybrid_rrf_topk",
}


def _assert_no_unpartitioned_windows(named_plans):
    bad = {}
    for name, plan in named_plans.items():
        if name.split("#")[0] in _UNPARTITIONED_WINDOW_OK:
            continue
        hits = []
        for line in plan.splitlines():
            s = line.strip().lstrip("+-: *")
            if not s.startswith("Window "):
                continue
            hits.extend(_unpartitioned_window_specs(line))
        if hits:
            bad[name] = hits
    assert not bad, f"unpartitioned Window over a growable frame: {bad}"


def test_no_unpartitioned_window_over_growable_frames(plans):
    """A windowspecdefinition with no partition columns is a single-reducer
    scan of its entire input (Exchange SinglePartition). text_vocab_growth
    shipped one in r11 (bucket frame = corpus/50 rows through ONE task at
    scale); this pins the fix suite-wide. Partition-only windows (unbounded
    frame within a key) are fine and not flagged."""
    _assert_no_unpartitioned_windows(plans)


def test_no_unpartitioned_window_in_internal_probes(internal_plans):
    _assert_no_unpartitioned_windows(internal_plans)


def test_routed_coexisting_scans_only_chosen_index(plans):
    """R1–R4 end-to-end: with two coexisting indexes over the same (table,
    target), a partition-Eq-restricted query must serve from the CHOSEN
    local sub-index's storage only — the plan scans the persisted local-IVF
    layout (label + cluster partition pruning) and never touches the losing
    global index's source table."""
    plan = plans["ann_routed_coexisting_topk"]
    assert "ivf_local_ix_" in plan, "chosen local-IVF layout is not scanned"
    assert "embeddings.parquet" not in plan, (
        "the losing global index's source scan leaked into the routed plan"
    )
    scan = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    pf = scan.split("PartitionFilters")[1].split("]")[0]
    assert "label" in pf and "cluster" in pf, (
        f"both pruning levels must be partition filters, got {pf!r}"
    )


def test_semantic_dedup_cluster_bounded_plan(internal_plans):
    """dedup_semantic_clusters' registry entry returns an eagerly-localized
    frame (dup-member-sized) — the richer shape asserts over its registered
    internal probes: the pair search is the cluster-grid cogrouped GEMM
    (never a cartesian/all-pairs join), the only broadcast is the
    metadata-sized grid-cell map, and the member-metadata join is
    shuffle-hash (the member frame is fact-classed: dup counts grow with the
    corpus). The generic ban tests above already cover the cartesian/SMJ/
    window rules for these plans."""
    pairs_plan = internal_plans["dedup_semantic_clusters#internal0"]
    assert "FlatMapGroupsInPandas" in pairs_plan, (
        "pair search must be the grouped Arrow GEMM, not a pair join"
    )
    # exactly one broadcast: the (cluster, chunk) -> grid-cell map, which is
    # k·chunks² rows of ints (metadata), never the vector frame
    assert pairs_plan.count("BroadcastExchange") <= 1

    jplan = internal_plans["dedup_semantic_clusters#internal1"]
    assert "ShuffledHashJoin" in jplan, "member-metadata join must be SHJ"
