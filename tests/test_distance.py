"""F1/F2 golden tests — semantics pinned to the reference's unit tests
(distance.rs:118-196, similarity.rs:40-133)."""

import math

import pytest
from pyspark.sql import functions as F

from vector_store_spark.functions.distance import (
    cosine_distance,
    distance_expr,
    dot_product,
    dot_product_distance,
    hamming_distance,
    l2sq_distance,
    similarity_expr,
    validate_distance_domain,
    vector_lit,
)
from vector_store_spark.types import SpaceType


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_dot_product(spark):
    a, b = vector_lit([1.0, 2.0, 3.0]), vector_lit([4.0, 5.0, 6.0])
    assert _eval(spark, dot_product(a, b)) == pytest.approx(32.0)


def test_l2sq_is_squared(spark):
    # reference "euclidean" is L2 *squared* (usearch.rs:483)
    a, b = vector_lit([0.0, 0.0]), vector_lit([3.0, 4.0])
    assert _eval(spark, l2sq_distance(a, b)) == pytest.approx(25.0)


def test_cosine_orthogonal_and_identical(spark):
    a, b = vector_lit([1.0, 0.0]), vector_lit([0.0, 1.0])
    assert _eval(spark, cosine_distance(a, b)) == pytest.approx(1.0)
    assert _eval(spark, cosine_distance(a, a)) == pytest.approx(0.0)
    opp = vector_lit([-1.0, 0.0])
    assert _eval(spark, cosine_distance(a, opp)) == pytest.approx(2.0)


def test_cosine_zero_norm(spark):
    a, z = vector_lit([1.0, 0.0]), vector_lit([0.0, 0.0])
    assert _eval(spark, cosine_distance(a, z)) == pytest.approx(1.0)


def test_dot_distance(spark):
    a, b = vector_lit([1.0, 2.0]), vector_lit([3.0, 4.0])
    assert _eval(spark, dot_product_distance(a, b)) == pytest.approx(1.0 - 11.0)


def test_hamming_sign_bits(spark):
    a = vector_lit([1.0, -1.0, 0.5, -0.5])
    b = vector_lit([1.0, 1.0, -0.5, -0.5])
    # differing sign(>0) bits at positions 1 and 2
    assert _eval(spark, hamming_distance(a, b)) == pytest.approx(2.0)


def test_similarity_mapping(spark):
    # similarity.rs:26-37 — cosine/dot (2-d)/2, euclidean 1/(1+d), hamming 1-d/n
    assert _eval(spark, similarity_expr(SpaceType.COSINE, F.lit(0.5))) == pytest.approx(0.75)
    assert _eval(spark, similarity_expr(SpaceType.DOT_PRODUCT, F.lit(-2.0))) == pytest.approx(2.0)
    assert _eval(spark, similarity_expr(SpaceType.EUCLIDEAN, F.lit(3.0))) == pytest.approx(0.25)
    assert _eval(spark, similarity_expr(SpaceType.HAMMING, F.lit(2.0), dims=8)) == pytest.approx(0.75)


def test_distance_domains():
    # distance.rs:58-105
    assert validate_distance_domain(SpaceType.COSINE, 2.0)
    assert not validate_distance_domain(SpaceType.COSINE, 2.5)
    assert not validate_distance_domain(SpaceType.COSINE, float("nan"))
    assert validate_distance_domain(SpaceType.EUCLIDEAN, 0.0)
    assert not validate_distance_domain(SpaceType.EUCLIDEAN, -1.0)
    assert validate_distance_domain(SpaceType.DOT_PRODUCT, -1e9)
    assert validate_distance_domain(SpaceType.HAMMING, 3.0, dims=4)
    assert not validate_distance_domain(SpaceType.HAMMING, 5.0, dims=4)
    assert not validate_distance_domain(SpaceType.HAMMING, 1.5, dims=4)


def test_distance_expr_dispatch(spark):
    a, b = vector_lit([1.0, 0.0]), vector_lit([0.0, 1.0])
    assert _eval(spark, distance_expr(SpaceType.EUCLIDEAN, a, b)) == pytest.approx(2.0)
    assert math.isclose(_eval(spark, distance_expr(SpaceType.COSINE, a, b)), 1.0)
