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


def test_ivfpq_residual_persisted_roundtrip(spark, tmp_path):
    """The persisted residual-IVFADC layout serves the same answer as the
    in-memory ivfpq_residual_topk at the same config, and the adaptive
    guard's exact tier works on it."""
    from pyspark.sql import functions as F

    from vector_store_spark.operators.ivfpq import (
        ivfpq_build,
        ivfpq_residual_topk,
        ivfpq_search,
    )
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.registry import det_query_vector
    from vector_store_spark.types import SpaceType

    rows = [(i, [float((i * 7 + j * 3) % 19 - 9) / 9.0 for j in range(16)], i % 4)
            for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = det_query_vector(5, 16)
    path = str(tmp_path / "ivfpq_res")
    ivfpq_build(emb, "vec_id", "embedding", path, k_centroids=8, m_sub=4,
                k_codes=16, residual=True, filtering_cols=["label"])
    got = [(r.vec_id, r.distance) for r in ivfpq_search(
        spark, path, emb, "vec_id", "embedding", q, 10, nprobe=4,
        select_cols=["vec_id"], round_to=6,
    ).collect()]
    mem = [(r.vec_id, r.distance) for r in ivfpq_residual_topk(
        emb, "vec_id", "embedding", q, 10, k_centroids=8, nprobe=4,
        m_sub=4, k_codes=16, select_cols=["vec_id"], round_to=6,
    ).collect()]
    assert got == mem
    # adaptive exact tier over the stored filtering column
    pred = F.col("vec_id") % 13 == 0
    truth = {r.vec_id for r in ann_topk(
        emb.where(pred), "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()}
    guard = {r.vec_id for r in ivfpq_search(
        spark, path, emb, "vec_id", "embedding", q, 10, nprobe=2,
        predicate=pred, min_candidates=100, select_cols=["vec_id"],
    ).collect()}
    assert guard == truth


def test_ivfpq_residual_multiassign_survivor_is_min_adc(spark, tmp_path):
    """Residual layout + n_assign>1: replica pq_codes differ per assigned
    cluster, so the persisted search must keep the MIN-ADC replica per id
    deterministically (ADVICE r10: a bare dropDuplicates kept whichever
    replica the hash-agg saw first, making top-k run-dependent). Verified
    against a numpy recomputation of every id's per-replica ADC."""
    import json
    import os

    import numpy as np

    from vector_store_spark.operators.ivfpq import ivfpq_build, ivfpq_search
    from vector_store_spark.operators.pq import pq_adc_lut
    from vector_store_spark.registry import det_query_vector

    rows = [(i, [float((i * 7 + j * 3) % 19 - 9) / 9.0 for j in range(16)])
            for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = det_query_vector(9, 16)
    path = str(tmp_path / "ivfpq_res_ma2")
    ivfpq_build(emb, "vec_id", "embedding", path, k_centroids=8, m_sub=4,
                k_codes=16, residual=True, n_assign=2)

    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    cmap = {int(c): np.asarray(v, dtype=np.float64) for c, v in meta["centroids"]}
    cb = np.asarray(meta["codebook"], dtype=np.float64)
    qv = np.asarray(q, dtype=np.float64)
    # nprobe=8 probes every cluster, so each id has BOTH replicas in scope
    stored = spark.read.parquet(path).collect()
    luts = {c: pq_adc_lut(cb, (qv - cmap[c]).tolist()) for c in cmap}
    best: dict[int, float] = {}
    for r in stored:
        lut = luts[int(r["cluster"])]
        adc = float(sum(lut[j, r["pq_code"][j]] for j in range(lut.shape[0])))
        vid = int(r["vec_id"])
        if vid not in best or adc < best[vid]:
            best[vid] = adc
    got = ivfpq_search(spark, path, emb, "vec_id", "embedding", q, 10,
                       nprobe=8, select_cols=["vec_id"]).collect()
    for r in got:
        assert abs(r.distance - best[int(r.vec_id)]) < 1e-9
    expect_ids = [vid for vid, _ in sorted(best.items(),
                                           key=lambda kv: (kv[1], kv[0]))[:10]]
    assert [int(r.vec_id) for r in got] == expect_ids
    # stable across repeated execution (fresh plan each time)
    again = ivfpq_search(spark, path, emb, "vec_id", "embedding", q, 10,
                         nprobe=8, select_cols=["vec_id"]).collect()
    assert [(r.vec_id, r.distance) for r in got] == \
           [(r.vec_id, r.distance) for r in again]
