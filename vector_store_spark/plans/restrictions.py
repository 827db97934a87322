"""Restriction algebra → Catalyst predicates (SURVEY.md §2.2 P1–P4).

The reference evaluates 12 restriction forms per-candidate inside HNSW traversal
(lib.rs:509-558, table/mod.rs:1183-1276). Here each restriction compiles to a
Column predicate and the conjunction is pushed in front of top-k — Catalyst then
pushes it further, down to the Parquet scan.

Semantics pinned to the reference:
- Conjunction only; no OR/NOT (lib.rs:509 ``restrictions: Vec<_>`` ⇒ AND).
- Tuple comparisons are lexicographic (table/mod.rs:1378-1391) — Spark struct
  comparison is lexicographic, so ``struct(c1,c2) < struct(v1,v2)`` matches.
- Incomparable / missing / NaN ⇒ row excluded (table/mod.rs:1318-1361: cql_cmp
  returns None ⇒ is_valid_for false). SQL NULL comparison already excludes;
  NaN needs an explicit guard because Spark orders NaN as largest-float rather
  than excluding it.
- Cross-type comparisons are rejected at *plan time* (the reference rejects them
  at filter-compile time, httproutes.rs:1056-1216) — see ``validate_filter``.
"""

from __future__ import annotations

import datetime
import decimal
import functools
from typing import Any, Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_store_spark.types import Filter, Restriction, RestrictionOp


class FilterError(ValueError):
    """Plan-time filter rejection (the reference's HTTP 400 path)."""


_FLOATY = (T.FloatType, T.DoubleType)


def _nan_guard(schema: T.StructType | None, col_name: str) -> Column | None:
    """NaN operand ⇒ excluded (cql_cmp float rule, table/mod.rs:1336-1340)."""
    if schema is None:
        return None
    try:
        dt = schema[col_name].dataType
    except KeyError:
        return None
    if isinstance(dt, _FLOATY):
        return ~F.isnan(F.col(col_name))
    return None


def _tuple_struct(columns: Sequence[str]) -> Column:
    return F.struct(*[F.col(c) for c in columns])


def _tuple_lit(values: Sequence[Any], columns: Sequence[str], schema: T.StructType | None) -> Column:
    """Literal struct with each field cast to its column's type — struct
    comparison requires exactly matching field types."""
    fields = []
    for v, c in zip(values, columns):
        lit = F.lit(v)
        if schema is not None and c in schema.names:
            lit = lit.cast(schema[c].dataType)
        fields.append(lit)
    return F.struct(*fields)


def _tuple_lex(r: Restriction, schema: T.StructType | None) -> Column:
    """Lexicographic tuple range comparison with cql_cmp_tuple null/NaN
    semantics: cmp(i) = strict_i OR (eq_i AND cmp(i+1)); base = False for
    strict ops, True for inclusive ops. A null OR NaN component yields NULL
    at ITS level (cql_cmp returns None for both, table/mod.rs:1336-1340),
    which only escapes (excluding the row) if no earlier pair decided — a
    NaN in a later component must not veto a row the first pair already
    ordered. NaN floats are nullified per component (Spark would otherwise
    order NaN above every float, silently deciding the level)."""
    strict = r.op in (RestrictionOp.LT_TUPLE, RestrictionOp.GT_TUPLE)
    less = r.op in (RestrictionOp.LT_TUPLE, RestrictionOp.LTE_TUPLE)
    pred: Column = F.lit(not strict)
    for name, v in zip(reversed(r.columns), reversed(list(r.values))):
        c = F.col(name)
        if schema is not None:
            try:
                if isinstance(schema[name].dataType, _FLOATY):
                    c = F.when(~F.isnan(F.col(name)), F.col(name))
            except KeyError:
                pass
        lit = F.lit(v)
        if schema is not None and name in schema.names:
            lit = lit.cast(schema[name].dataType)
        strict_cmp = (c < lit) if less else (c > lit)
        pred = strict_cmp | ((c == lit) & pred)
    return pred


def restriction_to_column(r: Restriction, schema: T.StructType | None = None) -> Column:
    """Compile one restriction to a boolean Column."""
    op = r.op
    if not op.is_tuple:
        (name,) = r.columns
        c = F.col(name)
        if op == RestrictionOp.EQ:
            pred = c == F.lit(r.values)
        elif op == RestrictionOp.IN:
            vals = list(r.values)
            pred = F.lit(False) if not vals else c.isin(vals)
        elif op == RestrictionOp.LT:
            pred = c < F.lit(r.values)
        elif op == RestrictionOp.LTE:
            pred = c <= F.lit(r.values)
        elif op == RestrictionOp.GT:
            pred = c > F.lit(r.values)
        elif op == RestrictionOp.GTE:
            pred = c >= F.lit(r.values)
        else:  # pragma: no cover
            raise FilterError(f"unknown op {op}")
        guard = _nan_guard(schema, name)
        return pred & guard if guard is not None else pred

    lhs = _tuple_struct(r.columns)
    if op == RestrictionOp.EQ_TUPLE:
        pred = lhs == _tuple_lit(r.values, r.columns, schema)
    elif op == RestrictionOp.IN_TUPLE:
        tuples = list(r.values)
        if not tuples:
            pred = F.lit(False)
        else:
            # tuple-IN = any rhs tuple fully equal (table/mod.rs:1234-1246)
            pred = functools.reduce(lambda a, b: a | b, [lhs == _tuple_lit(t, r.columns, schema) for t in tuples])
    elif op in (RestrictionOp.LT_TUPLE, RestrictionOp.LTE_TUPLE,
                RestrictionOp.GT_TUPLE, RestrictionOp.GTE_TUPLE):
        # NOT a struct comparison: Spark struct ordering sorts null fields
        # (nulls-first) whereas cql_cmp_tuple (table/mod.rs:1378-1391) walks
        # pairs in order — the first non-equal pair decides, and a null hit
        # before a decision makes the row incomparable (excluded). The
        # explicit lexicographic expression below reproduces that exactly
        # through SQL three-valued logic: null propagates to the top (row
        # excluded) unless an earlier strict comparison already decided.
        # NaN handling lives INSIDE _tuple_lex (per-component nullify) — a
        # blanket guard here would over-exclude rows whose first pair
        # already decided before the NaN component.
        return _tuple_lex(r, schema)
    else:  # pragma: no cover
        raise FilterError(f"unknown op {op}")
    guards = [g for g in (_nan_guard(schema, c) for c in r.columns) if g is not None]
    for g in guards:
        pred = pred & g
    return pred


def restrictions_to_column(
    restrictions: Iterable[Restriction], schema: T.StructType | None = None
) -> Column | None:
    """AND-conjunction of all restrictions; None when the list is empty
    (filter downgrade, usearch.rs:844-862)."""
    preds = [restriction_to_column(r, schema) for r in restrictions]
    if not preds:
        return None
    return functools.reduce(lambda a, b: a & b, preds)


# ---------------------------------------------------------------------------
# Plan-time validation (P4, httproutes.rs:1056-1216)

_TYPE_FAMILY: dict[type, str] = {
    T.ByteType: "int", T.ShortType: "int", T.IntegerType: "int", T.LongType: "int",
    T.FloatType: "float", T.DoubleType: "float",
    T.StringType: "str", T.BooleanType: "bool", T.BinaryType: "bytes",
    T.DateType: "date", T.TimestampType: "timestamp", T.DecimalType: "decimal",
}

_VALUE_FAMILY: list[tuple[type, str]] = [
    (bool, "bool"),  # before int: bool is an int subclass
    (int, "int"),
    (float, "float"),
    (str, "str"),
    (bytes, "bytes"),
    (decimal.Decimal, "decimal"),
    (datetime.datetime, "timestamp"),
    (datetime.date, "date"),
]

# accepted coercions beyond exact family match (httproutes.rs range-checked
# number→float/decimal conversions)
_COERCIBLE = {("int", "float"), ("int", "decimal"), ("float", "decimal"), ("str", "timestamp"), ("str", "date")}


def _value_family(v: Any) -> str:
    for py_t, fam in _VALUE_FAMILY:
        if isinstance(v, py_t):
            return fam
    raise FilterError(f"unsupported filter value type: {type(v).__name__}")


def _check_value(schema: T.StructType, col_name: str, v: Any) -> None:
    dt = schema[col_name].dataType
    col_fam = _TYPE_FAMILY.get(type(dt))
    if col_fam is None:
        raise FilterError(f"column {col_name}: type {dt.simpleString()} not filterable")
    val_fam = _value_family(v)
    if val_fam != col_fam and (val_fam, col_fam) not in _COERCIBLE:
        raise FilterError(
            f"column {col_name}: cannot compare {dt.simpleString()} with {type(v).__name__}"
        )


def validate_filter(schema: T.StructType, flt: Filter, allowed_columns: set[str]) -> None:
    """Reject unknown columns, non-allowed columns, tuple arity mismatches, and
    cross-type values — mirroring the reference's 400 paths."""
    names = set(schema.names)
    for r in flt.restrictions:
        for c in r.columns:
            if c not in names:
                raise FilterError(f"unknown column: {c}")
            if c not in allowed_columns:
                # restriction columns must be in pk ∪ partition ∪ filtering cols
                raise FilterError(f"column {c} is not filterable for this index")
        if r.op.is_tuple:
            tuples = list(r.values) if r.op == RestrictionOp.IN_TUPLE else [r.values]
            for t in tuples:
                if len(t) != len(r.columns):
                    raise FilterError(
                        f"tuple arity mismatch: {len(r.columns)} columns vs {len(t)} values"
                    )
                for c, v in zip(r.columns, t):
                    _check_value(schema, c, v)
        else:
            vals = list(r.values) if r.op == RestrictionOp.IN else [r.values]
            for v in vals:
                _check_value(schema, r.columns[0], v)


# ---------------------------------------------------------------------------
# Python row-level evaluation (P2 semantics for the RAM serving caches)
#
# The serving caches (engine.ServingCache / HnswServingCache) answer
# requests without touching Spark, so restricted requests need the SAME
# predicate semantics evaluated over plain Python values — the direct
# re-expression of the reference's per-candidate is_valid_for
# (table/mod.rs:1183-1276, evaluated inside usearch traversal). Parity with
# the Column path is pinned by tests/test_restrictions.py's evaluator-vs-
# Catalyst property test. Semantics (identical to the Column path above):
# conjunction; None/NaN operand ⇒ row excluded; tuple comparisons
# lexicographic with cql_cmp_tuple's undecided-null rule; cross-type values
# are rejected earlier by validate_filter (never reach evaluation).

def _cmp3(a: Any, b: Any) -> int | None:
    """cql_cmp (table/mod.rs:1318-1361): three-valued comparison — None when
    either operand is missing/NaN or the pair is incomparable."""
    if a is None or b is None:
        return None
    if isinstance(a, float) and a != a:  # NaN
        return None
    if isinstance(b, float) and b != b:
        return None
    if isinstance(a, (datetime.date, datetime.datetime)) and isinstance(b, str):
        # the Column path casts str literals to date/timestamp implicitly
        b = _parse_temporal(b, type(a))
        if b is None:
            return None
    try:
        if a == b:
            return 0
        if a < b:
            return -1
        if a > b:
            return 1
    except TypeError:
        return None
    return None  # incomparable (e.g. NaN-like orderings)


def _parse_temporal(s: str, want: type):
    try:
        if want is datetime.datetime or issubclass(want, datetime.datetime):
            return datetime.datetime.fromisoformat(s)
        return datetime.date.fromisoformat(s)
    except ValueError:
        return None


def _and3(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or3(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _tuple_lex_py(r: Restriction, row) -> bool | None:
    strict = r.op in (RestrictionOp.LT_TUPLE, RestrictionOp.GT_TUPLE)
    less = r.op in (RestrictionOp.LT_TUPLE, RestrictionOp.LTE_TUPLE)
    pred: bool | None = not strict
    for name, v in zip(reversed(r.columns), reversed(list(r.values))):
        c = row.get(name)
        cmp = _cmp3(c, v)
        if cmp is None:
            strict_cmp = eq = None
        else:
            strict_cmp = (cmp < 0) if less else (cmp > 0)
            eq = cmp == 0
        pred = _or3(strict_cmp, _and3(eq, pred))
    return pred


def restriction_matches(r: Restriction, row) -> bool:
    """Evaluate ONE restriction against a row mapping (column -> value).
    Returns True only when the row definitively satisfies it — None/NaN/
    incomparable evaluate to excluded, like the Column path."""
    op = r.op
    if not op.is_tuple:
        (name,) = r.columns
        c = row.get(name)
        if op == RestrictionOp.EQ:
            return _cmp3(c, r.values) == 0
        if op == RestrictionOp.IN:
            return any(_cmp3(c, v) == 0 for v in r.values)
        cmp = _cmp3(c, r.values)
        if cmp is None:
            return False
        if op == RestrictionOp.LT:
            return cmp < 0
        if op == RestrictionOp.LTE:
            return cmp <= 0
        if op == RestrictionOp.GT:
            return cmp > 0
        if op == RestrictionOp.GTE:
            return cmp >= 0
        raise FilterError(f"unknown op {op}")  # pragma: no cover
    if op == RestrictionOp.EQ_TUPLE:
        return all(_cmp3(row.get(c), v) == 0
                   for c, v in zip(r.columns, r.values))
    if op == RestrictionOp.IN_TUPLE:
        return any(
            all(_cmp3(row.get(c), v) == 0 for c, v in zip(r.columns, t))
            for t in r.values
        )
    if op in (RestrictionOp.LT_TUPLE, RestrictionOp.LTE_TUPLE,
              RestrictionOp.GT_TUPLE, RestrictionOp.GTE_TUPLE):
        return _tuple_lex_py(r, row) is True
    raise FilterError(f"unknown op {op}")  # pragma: no cover


def restrictions_match(restrictions: Iterable[Restriction], row) -> bool:
    """AND-conjunction over a row mapping; empty list matches everything
    (filter downgrade, same convention as restrictions_to_column)."""
    return all(restriction_matches(r, row) for r in restrictions)
