"""P1–P6 restriction semantics over the F1 fixture (pk 0..4 × ck 0..5,
v=[pk,ck,0]), mirroring tests/integration/vs_index.rs:721-1643."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.plans.restrictions import (
    FilterError,
    restriction_to_column,
    restrictions_to_column,
    validate_filter,
)
from vector_store_spark.types import Filter, Restriction, RestrictionOp


@pytest.fixture(scope="module")
def f1(spark):
    rows = [(pk, ck, [float(pk), float(ck), 0.0]) for pk in range(5) for ck in range(6)]
    return spark.createDataFrame(rows, "pk int, ck int, v array<float>").cache()


def keys(df):
    return sorted((r.pk, r.ck) for r in df.collect())


def test_eq_in_range(spark, f1):
    assert keys(f1.where(restriction_to_column(Restriction.eq("pk", 1)))) == [(1, ck) for ck in range(6)]
    got = keys(f1.where(restriction_to_column(Restriction.isin("pk", [0, 2]))))
    assert got == sorted([(p, c) for p in (0, 2) for c in range(6)])
    assert keys(f1.where(restriction_to_column(Restriction.lt("ck", 2)))) == sorted(
        (p, c) for p in range(5) for c in (0, 1)
    )
    both = restrictions_to_column([Restriction.gte("ck", 1), Restriction.lte("ck", 3)])
    assert keys(f1.where(both)) == sorted((p, c) for p in range(5) for c in (1, 2, 3))


def test_in_empty_matches_nothing(spark, f1):
    assert f1.where(restriction_to_column(Restriction.isin("pk", []))).count() == 0


def test_tuple_lexicographic(spark, f1):
    # (pk,ck) < (1,2) — lexicographic (table/mod.rs:1378-1391)
    lt = Restriction.tuple_op(RestrictionOp.LT_TUPLE, ("pk", "ck"), (1, 2))
    expect = sorted([(0, c) for c in range(6)] + [(1, 0), (1, 1)])
    assert keys(f1.where(restriction_to_column(lt))) == expect

    eq = Restriction.tuple_op(RestrictionOp.EQ_TUPLE, ("pk", "ck"), (2, 3))
    assert keys(f1.where(restriction_to_column(eq))) == [(2, 3)]

    isin = Restriction.tuple_op(RestrictionOp.IN_TUPLE, ("pk", "ck"), [(0, 0), (4, 5)])
    assert keys(f1.where(restriction_to_column(isin))) == [(0, 0), (4, 5)]

    gte = Restriction.tuple_op(RestrictionOp.GTE_TUPLE, ("pk", "ck"), (4, 4))
    assert keys(f1.where(restriction_to_column(gte))) == [(4, 4), (4, 5)]


def test_null_excluded(spark):
    # missing value ⇒ excluded (is_valid_for None→false, table/mod.rs:1249-1276)
    df = spark.createDataFrame([(1, 5), (2, None)], "pk int, f int")
    for r in [Restriction.lt("f", 100), Restriction.gt("f", 0), Restriction.eq("f", None)]:
        got = df.where(restriction_to_column(r)).collect()
        assert all(row.pk == 1 for row in got)


def test_nan_excluded(spark):
    # NaN ⇒ cql_cmp None ⇒ excluded (table/mod.rs:1336-1340); Spark would
    # otherwise sort NaN above all floats
    df = spark.createDataFrame([(1, 0.5), (2, float("nan"))], "pk int, f double")
    got = df.where(restriction_to_column(Restriction.gt("f", 0.0), df.schema)).collect()
    assert [r.pk for r in got] == [1]


def test_validate_unknown_and_unallowed_column(spark, f1):
    flt = Filter(restrictions=(Restriction.eq("nope", 1),))
    with pytest.raises(FilterError, match="unknown column"):
        validate_filter(f1.schema, flt, {"pk", "ck"})
    flt = Filter(restrictions=(Restriction.eq("v", 1),))
    with pytest.raises(FilterError, match="not filterable"):
        validate_filter(f1.schema, flt, {"pk", "ck"})


def test_validate_cross_type(spark, f1):
    flt = Filter(restrictions=(Restriction.eq("pk", "one"),))
    with pytest.raises(FilterError, match="cannot compare"):
        validate_filter(f1.schema, flt, {"pk", "ck"})
    # int → float coercion allowed on float columns
    df = spark.createDataFrame([(1.0,)], "price double")
    validate_filter(df.schema, Filter(restrictions=(Restriction.gte("price", 5),)), {"price"})


def test_validate_tuple_arity(spark, f1):
    bad = Restriction.tuple_op(RestrictionOp.EQ_TUPLE, ("pk", "ck"), (1,))
    with pytest.raises(FilterError, match="arity"):
        validate_filter(f1.schema, Filter(restrictions=(bad,)), {"pk", "ck"})


def test_python_evaluator_matches_catalyst(spark):
    """Parity contract for the RAM serving caches (engine.ServingCache /
    HnswServingCache answer restricted requests without Spark): the Python
    row evaluator (restrictions_match) must select EXACTLY the rows the
    Column path selects, across every op family and the tricky operands —
    None, NaN, tuple-lexicographic nulls, float/int coercion, decimals."""
    import math
    from decimal import Decimal

    from vector_store_spark.plans.restrictions import restrictions_match

    rows = [
        {"a": 1, "b": 1.5, "s": "x", "d": Decimal("1.10")},
        {"a": 2, "b": float("nan"), "s": "y", "d": Decimal("2.20")},
        {"a": None, "b": 0.5, "s": None, "d": None},
        {"a": 3, "b": None, "s": "z", "d": Decimal("3.00")},
        {"a": 4, "b": 4.0, "s": "x", "d": Decimal("0.50")},
        {"a": 5, "b": -1.0, "s": "w", "d": Decimal("1.10")},
    ]
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["s"], r["d"]) for r in rows],
        "a int, b double, s string, d decimal(10,2)",
    )
    cases = [
        Restriction.eq("a", 2),
        Restriction(RestrictionOp.IN, ("a",), (1, 3)),
        Restriction(RestrictionOp.LT, ("b",), 2.0),
        Restriction(RestrictionOp.GTE, ("b",), 0.5),
        Restriction(RestrictionOp.GT, ("a",), 1),
        Restriction(RestrictionOp.LTE, ("s",), "x"),
        Restriction(RestrictionOp.EQ, ("d",), Decimal("1.1")),
        Restriction(RestrictionOp.GT, ("d",), 1),  # int vs decimal coercion
        Restriction(RestrictionOp.EQ, ("b",), 4),  # int vs double coercion
        Restriction(RestrictionOp.LT_TUPLE, ("a", "b",), (3, 1.0)),
        Restriction(RestrictionOp.LTE_TUPLE, ("a", "b",), (1, 1.5)),
        Restriction(RestrictionOp.GT_TUPLE, ("a", "b",), (2, 0.0)),
        Restriction(RestrictionOp.GTE_TUPLE, ("a", "b",), (4, 4.0)),
        Restriction(RestrictionOp.EQ_TUPLE, ("a", "b",), (1, 1.5)),
        Restriction(RestrictionOp.IN_TUPLE, ("a", "b",), ((1, 1.5), (5, -1.0))),
        Restriction(RestrictionOp.IN, ("a",), ()),
    ]
    def norm(t):
        # NaN != NaN breaks tuple-set compares; normalize to a sentinel
        return tuple("NaN" if isinstance(v, float) and math.isnan(v) else v
                     for v in t)

    for r in cases:
        pred = restriction_to_column(r, df.schema)
        want = {norm(tuple(row)) for row in df.where(pred).collect()}
        got = {
            norm((row["a"], row["b"], row["s"], row["d"]))
            for row in rows if restrictions_match([r], row)
        }
        assert got == want, f"evaluator/Catalyst divergence for {r}"
