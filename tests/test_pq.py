"""Product quantization (operators/pq.py): codebook determinism, encode
semantics, ADC reconstruction bounds, and recall sanity."""

import numpy as np
from pyspark.sql import functions as F

from vector_store_spark.operators.pq import (
    pq_adc_lut,
    pq_codebook,
    pq_encode,
    pq_topk,
)
from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.registry import det_query_vector
from vector_store_spark.types import SpaceType


def test_codebook_shape_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb1 = pq_codebook(emb, "vec_id", "embedding", 8, 16)
    cb2 = pq_codebook(emb.repartition(8), "vec_id", "embedding", 8, 16)
    assert cb1.shape == (8, 16, 8)
    assert np.array_equal(cb1, cb2)  # partition-independent


def test_encode_codebook_rows_encode_to_themselves(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebook(emb, "vec_id", "embedding", 8, 16)
    first16 = emb.orderBy("vec_id").limit(16)
    got = pq_encode(first16, "embedding", cb).orderBy("vec_id").collect()
    for j, row in enumerate(got):
        # row j's subvectors ARE code j in every subspace (distance 0)
        assert list(row.pq_code) == [j] * 8


def test_adc_distance_of_codebook_row_matches_lut(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebook(emb, "vec_id", "embedding", 8, 16)
    q = det_query_vector(31, 64)
    lut = pq_adc_lut(cb, q)
    assert lut.shape == (8, 16)
    # ADC of codebook row j == sum of its LUT column == true L2sq(q, row j)
    row0 = emb.orderBy("vec_id").first()
    true_l2sq = float(((np.array(q) - np.array(row0.embedding, dtype=np.float64)) ** 2).sum())
    assert abs(lut[:, 0].sum() - true_l2sq) < 1e-9


def test_pq_recall_reasonable(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = det_query_vector(31, 64)
    truth = {r.vec_id for r in ann_topk(
        emb, "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()}
    got = {r.vec_id for r in pq_topk(emb, "vec_id", "embedding", q, 10).collect()}
    # 16 codes x 8 subspaces on near-uniform data: coarse, but far above chance
    assert len(got & truth) >= 2
