"""F5 typed-column matrix (FIXTURES.md): Eq/range restrictions across every
comparable CQL-mapped type, decimal semantic key equality, text byte-order
range, date/timestamp comparisons (table/column.rs:30-50, cql_cmp
table/mod.rs:1318-1361)."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_store_spark.plans.restrictions import restriction_to_column
from vector_store_spark.types import Restriction, RestrictionOp

SCHEMA = T.StructType([
    T.StructField("pk", T.IntegerType()),
    T.StructField("c_text", T.StringType()),
    T.StructField("c_tiny", T.ByteType()),
    T.StructField("c_small", T.ShortType()),
    T.StructField("c_int", T.IntegerType()),
    T.StructField("c_big", T.LongType()),
    T.StructField("c_float", T.FloatType()),
    T.StructField("c_double", T.DoubleType()),
    T.StructField("c_bool", T.BooleanType()),
    T.StructField("c_date", T.DateType()),
    T.StructField("c_ts", T.TimestampType()),
    T.StructField("c_decimal", T.DecimalType(20, 6)),
])


def row(pk, txt, n, flag):
    base = datetime.datetime(2024, 1, 1)
    return (
        pk, txt, n, n * 10, n * 100, n * 1000, float(n) / 2, float(n) / 4, flag,
        (base + datetime.timedelta(days=n)).date(),
        base + datetime.timedelta(hours=n),
        Decimal(n) / Decimal(8),
    )


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [row(1, "apple", 1, True), row(2, "mango", 5, False), row(3, "zebra", 9, True)],
        SCHEMA,
    )


def _ids(df, r):
    return sorted(x.pk for x in df.where(restriction_to_column(r, df.schema)).collect())


@pytest.mark.parametrize(
    "col,lo_val,hi_val",
    [
        ("c_tiny", 5, 9), ("c_small", 50, 90), ("c_int", 500, 900),
        ("c_big", 5000, 9000), ("c_float", 2.5, 4.5), ("c_double", 1.25, 2.25),
        ("c_date", datetime.date(2024, 1, 6), datetime.date(2024, 1, 10)),
        ("c_ts", datetime.datetime(2024, 1, 1, 5), datetime.datetime(2024, 1, 1, 9)),
        ("c_decimal", Decimal("0.625"), Decimal("1.125")),
    ],
)
def test_eq_and_range_every_comparable_type(df, col, lo_val, hi_val):
    assert _ids(df, Restriction.eq(col, lo_val)) == [2]
    assert _ids(df, Restriction.gte(col, lo_val)) == [2, 3]
    assert _ids(df, Restriction.lt(col, hi_val)) == [1, 2]


def test_text_byte_order_range(df):
    # text filter > 'm' (vs_index.rs:1529 text_gt)
    assert _ids(df, Restriction.gt("c_text", "m")) == [2, 3]
    assert _ids(df, Restriction.lte("c_text", "apple")) == [1]


def test_bool_eq(df):
    assert _ids(df, Restriction.eq("c_bool", True)) == [1, 3]


def test_decimal_semantic_equality(df):
    # 1.0 == 1.00 (primary_key.rs:51-63 normalization is native in DecimalType)
    assert _ids(df, Restriction.eq("c_decimal", Decimal("0.625000"))) == [2]
    assert _ids(df, Restriction.eq("c_decimal", Decimal("0.625"))) == [2]


def test_in_across_types(df):
    assert _ids(df, Restriction.isin("c_int", [100, 900])) == [1, 3]
    assert _ids(df, Restriction.isin("c_text", ["zebra", "none"])) == [3]
