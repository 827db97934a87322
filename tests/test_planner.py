"""R1–R4 + P5 routing tests (indexes.rs:203-431, httproutes.rs:751-777) and the
engine lifecycle over F1/F4 fixtures."""

import pytest

from vector_store_spark.engine import VectorStoreEngine
from vector_store_spark.plans.planner import (
    NeedsFiltering,
    best_index,
    check_allow_filtering,
    classify_restrictions,
    consume_partition_restrictions,
    score_index,
)
from vector_store_spark.plans.restrictions import FilterError
from vector_store_spark.types import (
    Filter,
    IndexMetadata,
    IndexState,
    IndexStatus,
    Restriction,
    RestrictionOp,
)


def meta(name="idx", local=None, fcols=(), version="1"):
    return IndexMetadata(
        keyspace="ks", index=name, table="t", primary_key_columns=("pk", "ck"),
        partition_key_count=1, target_column="v", partitioning=local,
        filtering_columns=tuple(fcols), version=version, dimensions=3,
    )


def flt(*rs, allow=False):
    return Filter(restrictions=tuple(rs), allow_filtering=allow)


def test_classify():
    f = flt(Restriction.eq("pk", 1), Restriction.lt("ck", 3),
            Restriction.tuple_op(RestrictionOp.IN_TUPLE, ("a", "b"), [(1, 2)]))
    eq, rng = classify_restrictions(f)
    assert eq == {"pk", "a", "b"} and rng == {"ck"}


def test_score_global():
    m = meta()
    assert score_index(m, set(), set()).needs_filtering == NeedsFiltering.NO
    s = score_index(m, {"pk"}, {"ck"})
    assert s.needs_filtering == NeedsFiltering.YES and s.uncovered == 2
    # uncovered restriction column ⇒ cannot serve
    assert score_index(m, {"other"}, set()) is None
    # filtering columns are covered
    s = score_index(meta(fcols=("price",)), set(), {"price"})
    assert s.uncovered == 1


def test_score_local():
    m = meta(local=("pk",))
    # partition key consumed ⇒ not counted as uncovered
    s = score_index(m, {"pk"}, set())
    assert s.needs_filtering == NeedsFiltering.NO
    s = score_index(m, {"pk"}, {"ck"})
    assert s.uncovered == 1
    # partition key not equality-restricted ⇒ cannot serve
    assert score_index(m, set(), {"pk"}) is None
    assert score_index(m, set(), set()) is None


def test_best_index_prefers_covering_then_newest():
    older = IndexState(meta("a", version="1"), IndexStatus.SERVING)
    newer = IndexState(meta("b", version="2"), IndexStatus.SERVING)
    local = IndexState(meta("c", local=("pk",), version="3"), IndexStatus.SERVING)
    f = flt(Restriction.eq("pk", 1))
    # local consumes pk ⇒ NeedsFiltering.NO beats global YES
    state, score = best_index([older, newer, local], f)
    assert state.metadata.index == "c" and score.needs_filtering == NeedsFiltering.NO
    # without the local candidate: newest version wins the tie
    state, _ = best_index([older, newer], f)
    assert state.metadata.index == "b"


def test_best_index_not_serving():
    boot = IndexState(meta("a"), IndexStatus.FULL_SCANNING, scan_progress_pct=40.0)
    with pytest.raises(FilterError, match="INDEX_BUILDING"):
        best_index([boot], flt())


def test_best_index_local_only_without_pk():
    local = IndexState(meta("c", local=("pk",)), IndexStatus.SERVING)
    with pytest.raises(FilterError, match="no global index"):
        best_index([local], flt(Restriction.lt("ck", 3)))


def test_allow_filtering_gate():
    s = score_index(meta(), {"pk"}, set())
    with pytest.raises(FilterError, match="ALLOW FILTERING"):
        check_allow_filtering(s, flt(Restriction.eq("pk", 1)))
    check_allow_filtering(s, flt(Restriction.eq("pk", 1), allow=True))  # ok


def test_consume_partition_restrictions():
    m = meta(local=("pk",))
    f = flt(Restriction.eq("pk", 1), Restriction.lt("ck", 3))
    consumed, residual = consume_partition_restrictions(m, f)
    assert [r.columns for r in consumed] == [("pk",)]
    assert [r.columns for r in residual] == [("ck",)]
    with pytest.raises(FilterError, match="all partition-key columns"):
        consume_partition_restrictions(m, flt(Restriction.lt("ck", 3)))


# --- engine end-to-end (lifecycle §3.1) -----------------------------------


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(pk, ck, [float(pk), float(ck), 0.0]) for pk in range(5) for ck in range(6)]
    df = spark.createDataFrame(rows, "pk int, ck int, v array<float>").cache()
    eng = VectorStoreEngine()
    eng.register(df, meta("global_idx", version="1"))
    eng.register(df, meta("local_idx", local=("pk",), version="2"))
    return eng


def test_engine_ann_basic(engine):
    resp = engine.ann("ks", "t", "v", [2.0, 3.0, 0.0], limit=1)
    assert resp.primary_keys == {"pk": [2], "ck": [3]}
    assert resp.distances[0] == pytest.approx(0.0)
    assert resp.similarity_scores[0] == pytest.approx(1.0)


def test_engine_filtered_ann_routes_local(engine):
    f = flt(Restriction.eq("pk", 1), Restriction.lt("ck", 3), allow=True)
    topk, routed = engine.ann_df("ks", "t", "v", [1.0, 5.0, 0.0], limit=2, flt=f)
    assert routed.index == "local_idx"  # NeedsFiltering beats global
    rows = topk.collect()
    assert all(r.pk == 1 and r.ck < 3 for r in rows)
    assert [r.ck for r in rows] == [2, 1]  # nearest to ck=5 within ck<3


def test_engine_requires_allow_filtering(engine):
    f = flt(Restriction.lt("ck", 3))
    with pytest.raises(FilterError, match="ALLOW FILTERING"):
        engine.ann("ks", "t", "v", [1.0, 1.0, 0.0], limit=1, flt=f)


def test_engine_wrong_dimensions(engine):
    with pytest.raises(FilterError, match="dimensions"):
        engine.ann("ks", "t", "v", [1.0, 1.0], limit=1)


def test_engine_count(engine):
    assert engine.count("global_idx") == 30
