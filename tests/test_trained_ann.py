"""Trained (data-adaptive) ANN builds: MLlib-KMeans IVF centroids and
sampled-Lloyd PQ codebooks — determinism under a pinned seed + fixed input,
space threading, and the rescoring stage's exactness bound.

Reference parity: the default engine trains its graph on the data
(crates/vector-store/src/vs_index/usearch.rs:74-92); rescoring mirrors
crates/validator/src/quantization_and_rescoring.rs:117-256.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.ivf import (
    ivf_centroids_trained,
    ivf_topk,
)
from vector_store_spark.operators.pq import (
    pq_codebook_trained,
    pq_encode,
    pq_topk,
)
from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.registry import det_query_vector
from vector_store_spark.types import SpaceType


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_trained_centroids_deterministic(emb):
    a = ivf_centroids_trained(emb, "embedding", 8, seed=42)
    b = ivf_centroids_trained(emb, "embedding", 8, seed=42)
    assert [c for c, _ in a] == list(range(8))
    assert len(a[0][1]) == 64
    for (_, va), (_, vb) in zip(a, b):
        assert va == vb  # pinned seed + same input (incl. partitioning) ⇒ identical


def test_trained_centroids_reject_unsupported_space(emb):
    with pytest.raises(ValueError):
        ivf_centroids_trained(emb, "embedding", 4, space=SpaceType.HAMMING)


def test_trained_ivf_full_probe_equals_brute_force(emb):
    """With nprobe = K the candidate set is the whole table regardless of
    where KMeans put the centroids — trained IVF must equal exact top-k."""
    q = det_query_vector(7, 64)
    cents = ivf_centroids_trained(emb, "embedding", 8, seed=42)
    got = ivf_topk(
        emb, "vec_id", "embedding", q, 10, nprobe=8, centroids=cents,
        select_cols=["vec_id"], round_to=9,
    )
    brute = ann_topk(
        emb, "embedding", q, 10, tie_break=["vec_id"], select_cols=["vec_id"],
        round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]


def test_trained_ma2_ivf_recall_beats_untrained(emb):
    """The recall-bearing config (trained centroids + 2× multiple assignment)
    must beat the untrained single-assignment build at the same nprobe, and
    clear a recall floor (deterministic setup, averaged over 4 queries)."""
    hits_tr = hits_untr = 0
    cents = ivf_centroids_trained(emb, "embedding", 16, seed=42)
    for seed in (7, 13, 21, 33):
        q = det_query_vector(seed, 64)
        truth = {r.vec_id for r in ann_topk(
            emb, "embedding", q, 10, tie_break=["vec_id"], select_cols=["vec_id"]
        ).collect()}
        tr = {r.vec_id for r in ivf_topk(
            emb, "vec_id", "embedding", q, 10, nprobe=8, centroids=cents,
            n_assign=2, select_cols=["vec_id"],
        ).collect()}
        untr = {r.vec_id for r in ivf_topk(
            emb, "vec_id", "embedding", q, 10, k_centroids=16, nprobe=8,
            select_cols=["vec_id"],
        ).collect()}
        hits_tr += len(tr & truth)
        hits_untr += len(untr & truth)
    assert hits_tr >= hits_untr
    assert hits_tr / 40 >= 0.8  # recall@10 across 4 queries


def test_multi_assign_no_duplicate_ids(emb):
    """A vector whose two assigned clusters are both probed must appear once."""
    q = det_query_vector(7, 64)
    got = ivf_topk(
        emb, "vec_id", "embedding", q, 20, k_centroids=8, nprobe=8,
        n_assign=2, select_cols=["vec_id"],
    ).collect()
    ids = [r.vec_id for r in got]
    assert len(ids) == len(set(ids)) == 20


def test_euclidean_ivf_assignment_space_threaded(emb):
    """engine.py passes meta.space_type; assignment/probe must follow it:
    L2 IVF with full probe equals brute-force L2 ranking."""
    q = det_query_vector(13, 64)
    got = ivf_topk(
        emb, "vec_id", "embedding", q, 10, k_centroids=8, nprobe=8,
        space=SpaceType.EUCLIDEAN, select_cols=["vec_id"], round_to=9,
    )
    brute = ann_topk(
        emb, "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]


def test_trained_pq_codebook_deterministic_and_shaped(emb):
    a = pq_codebook_trained(emb, "vec_id", "embedding", 8, 16, seed=42)
    b = pq_codebook_trained(emb, "vec_id", "embedding", 8, 16, seed=42)
    assert a.shape == (8, 16, 8)
    np.testing.assert_array_equal(a, b)


def test_trained_pq_encode_valid_codes(emb):
    cb = pq_codebook_trained(emb, "vec_id", "embedding", 8, 16, seed=42)
    enc = pq_encode(emb, "embedding", cb)
    stats = enc.select(
        F.min(F.array_min("pq_code")).alias("lo"),
        F.max(F.array_max("pq_code")).alias("hi"),
        F.min(F.size("pq_code")).alias("m"),
    ).first()
    assert stats.lo >= 0 and stats.hi < 16 and stats.m == 8


def test_pq_rescore_saturates_to_exact(emb):
    """rescore·k ≥ N ⇒ the rescoring stage re-ranks the whole table exactly:
    trained-PQ + rescore must equal brute-force L2 top-k (emb is 500 rows;
    rescore=50, k=10)."""
    q = det_query_vector(21, 64)
    cb = pq_codebook_trained(emb, "vec_id", "embedding", 8, 16, seed=42)
    got = pq_topk(
        emb, "vec_id", "embedding", q, 10, m_sub=8, codebook=cb, rescore=50,
        round_to=9,
    )
    brute = ann_topk(
        emb, "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]


def test_trained_pq_recall_beats_untrained(emb):
    hits_tr = hits_untr = 0
    cb = pq_codebook_trained(emb, "vec_id", "embedding", 8, 16, seed=42)
    for seed in (7, 13, 21, 33):
        q = det_query_vector(seed, 64)
        truth = {r.vec_id for r in ann_topk(
            emb, "embedding", q, 10, space=SpaceType.EUCLIDEAN,
            tie_break=["vec_id"], select_cols=["vec_id"],
        ).collect()}
        tr = {r.vec_id for r in pq_topk(
            emb, "vec_id", "embedding", q, 10, m_sub=8, codebook=cb
        ).collect()}
        untr = {r.vec_id for r in pq_topk(
            emb, "vec_id", "embedding", q, 10, m_sub=8, k_codes=16
        ).collect()}
        hits_tr += len(tr & truth)
        hits_untr += len(untr & truth)
    assert hits_tr >= hits_untr


def test_persisted_ivf_round_trip_and_pruning(spark, emb, tmp_path):
    """Build (trained + ma2) -> partitionBy(cluster) parquet -> search: same
    results as the in-memory path, and the probe scan carries cluster
    PartitionFilters (only nprobe directories are read)."""
    from vector_store_spark.operators.ivf import (
        ivf_build,
        ivf_search,
    )
    from vector_store_spark.sources.index_store import prune_report

    q = det_query_vector(7, 64)
    path = str(tmp_path / "ivf_ix")
    cents = ivf_build(
        emb, "vec_id", "embedding", path, k_centroids=8,
        trained=True, n_assign=2,
    )
    got = ivf_search(
        spark, path, "vec_id", "embedding", q, 10, nprobe=4,
        select_cols=["vec_id"], round_to=9,
    )
    mem = ivf_topk(
        emb, "vec_id", "embedding", q, 10, nprobe=4, centroids=cents,
        n_assign=2, select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    rep = prune_report(spark.read.parquet(path).where(F.col("cluster").isin([0, 1])))
    assert any("cluster" in p for p in rep["partition_filters"])


def test_local_ivf_sub_indexes_round_trip_and_pruning(spark, emb, tmp_path):
    """One IVF sub-index per partition (lib.rs:677-680 analogue): searching a
    partition equals running IVF over that partition alone with its own
    centroids, and BOTH the partition Eq and the cluster probe reach the scan
    as PartitionFilters."""
    from vector_store_spark.operators.ivf import (
        ivf_build_local,
        ivf_centroids,
        ivf_search_local,
        ivf_topk,
    )
    from vector_store_spark.sources.index_store import prune_report

    q = det_query_vector(7, 64)
    path = str(tmp_path / "ivf_local_ix")
    parts = ivf_build_local(emb, "label", "vec_id", "embedding", path, k_centroids=4)
    assert len(parts) > 1  # genuinely multiple sub-indexes
    got = ivf_search_local(
        spark, path, 3, "vec_id", "embedding", q, 10, nprobe=2,
        select_cols=["vec_id"], round_to=9,
    )
    sub = emb.where(F.col("label") == 3)
    mem = ivf_topk(
        sub, "vec_id", "embedding", q, 10, nprobe=2,
        centroids=ivf_centroids(sub, "vec_id", "embedding", 4),
        select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    rep = prune_report(got)
    joined = " ".join(rep["partition_filters"])
    assert "label" in joined and "cluster" in joined


def test_persisted_lsh_round_trip_and_pruning(spark, emb, tmp_path):
    """Build -> partitionBy(band, bucket) parquet -> search: same results as
    the in-memory lsh_topk path, and the probe scan carries band/bucket
    PartitionFilters (only the matching directories are read)."""
    from vector_store_spark.operators.lsh import lsh_build, lsh_search, lsh_topk
    from vector_store_spark.sources.index_store import prune_report

    q = det_query_vector(7, 64)
    path = str(tmp_path / "lsh_ix")
    lsh_build(emb, "vec_id", "embedding", path, num_bits=16, bands=4)
    got = lsh_search(
        spark, path, "vec_id", "embedding", q, 10,
        select_cols=["vec_id"], round_to=9,
    )
    mem = lsh_topk(
        emb, "vec_id", "embedding", q, 10, num_bits=16, bands=4,
        select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    rep = prune_report(got)
    assert any("band" in p and "bucket" in p for p in rep["partition_filters"])


def test_engine_serves_trained_ivf_via_strategy_opts(spark, emb):
    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.types import IndexKind, IndexMetadata

    cents = ivf_centroids_trained(emb, "embedding", 8, seed=42)
    meta = IndexMetadata(
        keyspace="ks", index="ix_tr", table="t",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64, kind=IndexKind.VECTOR,
        space_type=SpaceType.COSINE,
    )
    eng = VectorStoreEngine()
    eng.register(
        emb, meta, strategy="ivf",
        strategy_opts={"centroids": cents, "nprobe": 8, "n_assign": 2},
    )
    out = eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)
    assert len(out.primary_keys["vec_id"]) == 5
    assert out.distances == sorted(out.distances)


def test_ivfpq_residual_full_probe_full_rescore_is_exact(emb):
    from vector_store_spark.operators.ivfpq import ivfpq_residual_topk

    q = det_query_vector(31, 64)
    got = ivfpq_residual_topk(
        emb, "vec_id", "embedding", q, 10, k_centroids=8, nprobe=8,
        rescore=50, select_cols=["vec_id"], round_to=9,
    )
    brute = ann_topk(
        emb, "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]


def test_residual_codebooks_deterministic(emb):
    from vector_store_spark.operators.ivf import ivf_centroids
    from vector_store_spark.operators.ivfpq import (
        ivfpq_residual_codebook,
        ivfpq_residual_codebook_trained,
    )

    cents = ivf_centroids(emb, "vec_id", "embedding", 8)
    a = ivfpq_residual_codebook(emb, "vec_id", "embedding", cents, 8, 16)
    b = ivfpq_residual_codebook(emb, "vec_id", "embedding", cents, 8, 16)
    np.testing.assert_array_equal(a, b)
    ta = ivfpq_residual_codebook_trained(emb, "vec_id", "embedding", cents, 8, 16, seed=1)
    tb = ivfpq_residual_codebook_trained(emb, "vec_id", "embedding", cents, 8, 16, seed=1)
    assert ta.shape == (8, 16, 8)
    np.testing.assert_array_equal(ta, tb)


def test_ivf_knn_join_matches_per_query_ivf_topk(emb):
    """Each query's batched result must equal its single-query IVF search
    (same centroids, same nprobe)."""
    from vector_store_spark.operators.ivf import ivf_knn_join

    queries = [("a", det_query_vector(7, 64)), ("b", det_query_vector(13, 64))]
    got = ivf_knn_join(
        emb, "vec_id", "embedding", queries, 5,
        k_centroids=8, nprobe=3, round_to=9,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.distance))
    for qid, qv in queries:
        single = ivf_topk(
            emb, "vec_id", "embedding", qv, 5, k_centroids=8, nprobe=3,
            select_cols=["vec_id"], round_to=9,
        ).collect()
        assert by_q[qid] == [(r.vec_id, r.distance) for r in single]


def test_ivf_update_crud_equals_fixed_centroid_state(spark, emb, tmp_path):
    """Build -> remove + add -> search equals assigning the FINAL row set
    against the build-time centroids (CRUD never re-trains, like USearch);
    only touched cluster directories are rewritten, and a fully-emptied
    cluster's directory is deleted (W4 partition lifecycle)."""
    import os

    from vector_store_spark.operators.ivf import (
        ivf_assign,
        ivf_build,
        ivf_centroids,
        ivf_search,
        ivf_topk,
        ivf_update,
    )

    q = det_query_vector(7, 64)
    path = str(tmp_path / "ivf_crud")
    base = emb.where(F.col("vec_id") < 400)
    cents = ivf_build(base, "vec_id", "embedding", path, k_centroids=8)

    # step 1: a PURE-REMOVAL update of two members of one known cluster —
    # exactly one directory may be rewritten
    asg = ivf_assign(base, "vec_id", "embedding", cents)
    some = asg.groupBy("cluster").count().orderBy(F.col("count").desc()).first().cluster
    victims = [r.vec_id for r in
               asg.where(F.col("cluster") == some).limit(2).collect()]
    before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("cluster=")
    }
    ivf_update(spark, path, "vec_id", "embedding", ids_removed=victims)
    after = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("cluster=")
    }
    changed = {d for d in before if after[d] != before[d]}
    assert changed == {f"cluster={some}"}

    # step 2: adds compose with removals; end state equals assigning the
    # FINAL row set against the build-time centroids
    added = emb.where((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    ivf_update(spark, path, "vec_id", "embedding", items_added=added)

    got = ivf_search(spark, path, "vec_id", "embedding", q, 10, nprobe=4,
                     select_cols=["vec_id"], round_to=9)
    final = emb.where(
        (F.col("vec_id") < 450) & ~F.col("vec_id").isin(victims)
    )
    mem = ivf_topk(final, "vec_id", "embedding", q, 10, nprobe=4,
                   centroids=cents, select_cols=["vec_id"], round_to=9)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]


def test_ivf_update_empties_cluster_directory(spark, emb, tmp_path):
    import os

    from vector_store_spark.operators.ivf import ivf_assign, ivf_build, ivf_update

    path = str(tmp_path / "ivf_empty")
    base = emb.where(F.col("vec_id") < 200)
    cents = ivf_build(base, "vec_id", "embedding", path, k_centroids=4)
    asg = ivf_assign(base, "vec_id", "embedding", cents)
    # remove EVERY member of one cluster
    target = asg.groupBy("cluster").count().orderBy("count", "cluster").first().cluster
    victims = [r.vec_id for r in asg.where(F.col("cluster") == target).collect()]
    ivf_update(spark, path, "vec_id", "embedding", ids_removed=victims)
    assert not os.path.isdir(os.path.join(path, f"cluster={target}"))
    left = spark.read.parquet(path)
    assert left.where(F.col("vec_id").isin(victims)).count() == 0


def test_ivf_update_local_isolates_partitions(spark, emb, tmp_path):
    """CRUD on one partition's sub-index: equivalence vs that partition's
    fixed centroids over its final row set, and EVERY other partition's
    directory tree untouched (per-partition index isolation)."""
    import os

    from vector_store_spark.operators.ivf import (
        ivf_build_local,
        ivf_search_local,
        ivf_topk,
        ivf_update_local,
    )

    q = det_query_vector(7, 64)
    path = str(tmp_path / "ivf_local_crud")
    base = emb.where(F.col("vec_id") < 400)
    parts = ivf_build_local(base, "label", "vec_id", "embedding", path, k_centroids=4)
    target = 3
    assert target in parts

    def mtimes(exclude_part):
        out = {}
        for d in os.listdir(path):
            if d.startswith("label=") and d != f"label={exclude_part}":
                pdir = os.path.join(path, d)
                for c in os.listdir(pdir):
                    out[f"{d}/{c}"] = os.path.getmtime(os.path.join(pdir, c))
        return out

    before = mtimes(target)
    in_part = emb.where((F.col("label") == target) & (F.col("vec_id") >= 400))
    victims = [r.vec_id for r in
               base.where(F.col("label") == target).limit(3).collect()]
    ivf_update_local(spark, path, target, "vec_id", "embedding",
                     items_added=in_part, ids_removed=victims)
    assert mtimes(target) == before  # other partitions untouched

    got = ivf_search_local(spark, path, target, "vec_id", "embedding", q, 10,
                           nprobe=2, select_cols=["vec_id"], round_to=9)
    final = emb.where(
        (F.col("label") == target)
        & ((F.col("vec_id") < 400) | (F.col("vec_id") >= 400))
        & ~F.col("vec_id").isin(victims)
    )
    mem = ivf_topk(final, "vec_id", "embedding", q, 10, nprobe=2,
                   centroids=parts[target], select_cols=["vec_id"], round_to=9)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]


def test_ivf_update_with_multiple_assignment(spark, emb, tmp_path):
    """CRUD on an ma2 build: a removed vector's BOTH cluster copies must go,
    and added vectors get both their copies — end state equals in-memory ma2
    IVF over the final row set with the build's centroids."""
    from vector_store_spark.operators.ivf import ivf_build, ivf_search, ivf_topk, ivf_update

    q = det_query_vector(7, 64)
    path = str(tmp_path / "ivf_ma_crud")
    base = emb.where(F.col("vec_id") < 400)
    cents = ivf_build(base, "vec_id", "embedding", path, k_centroids=8, n_assign=2)
    ivf_update(
        spark, path, "vec_id", "embedding",
        items_added=emb.where((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)),
        ids_removed=list(range(10)),
    )
    got = ivf_search(spark, path, "vec_id", "embedding", q, 10, nprobe=4,
                     select_cols=["vec_id"], round_to=9)
    final = emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 450))
    mem = ivf_topk(final, "vec_id", "embedding", q, 10, nprobe=4,
                   centroids=cents, n_assign=2, select_cols=["vec_id"], round_to=9)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    # no removed id anywhere in the index (both ma copies purged)
    left = spark.read.parquet(path)
    assert left.where(F.col("vec_id") < 10).count() == 0


def test_persisted_ivfpq_codes_only_layout(spark, emb, tmp_path):
    """The persisted IVF-PQ layout stores ONLY (id, pq_code) per cluster —
    no full-precision vectors on the candidate path — yet the probe-pruned
    ADC search (and the rescored variant) matches the in-memory composition."""
    from vector_store_spark.operators.ivfpq import (
        ivfpq_build,
        ivfpq_search,
        ivfpq_topk,
    )
    from vector_store_spark.sources.index_store import prune_report

    q = det_query_vector(31, 64)
    path = str(tmp_path / "ivfpq_ix")
    cents, cb = ivfpq_build(
        emb, "vec_id", "embedding", path, k_centroids=8, m_sub=8, k_codes=16
    )
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "pq_code", "cluster"}

    got = ivfpq_search(spark, path, emb, "vec_id", "embedding", q, 10,
                       nprobe=4, select_cols=["vec_id"], round_to=9)
    mem = ivfpq_topk(emb, "vec_id", "embedding", q, 10, nprobe=4,
                     centroids=cents, codebook=cb,
                     select_cols=["vec_id"], round_to=9)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    rep = prune_report(got)
    assert any("cluster" in p for p in rep["partition_filters"])

    got_r = ivfpq_search(spark, path, emb, "vec_id", "embedding", q, 10,
                         nprobe=4, rescore=4, select_cols=["vec_id"], round_to=9)
    mem_r = ivfpq_topk(emb, "vec_id", "embedding", q, 10, nprobe=4,
                       centroids=cents, codebook=cb, rescore=4,
                       select_cols=["vec_id"], round_to=9)
    assert [r.vec_id for r in got_r.collect()] == [r.vec_id for r in mem_r.collect()]


def test_local_lsh_sub_indexes_round_trip_and_pruning(spark, emb, tmp_path):
    """One LSH sub-index per partition (lib.rs:677-680 engine-agnostic local
    tier): searching a partition equals in-memory lsh_topk over that
    partition alone; the partition Eq and band probe reach the scan as
    PartitionFilters while the bucket probe is a pushed data filter over
    the bucket-sorted files (row-group skipping)."""
    from vector_store_spark.operators.lsh import (
        lsh_build_local,
        lsh_search_local,
        lsh_topk,
    )
    from vector_store_spark.sources.index_store import prune_report

    q = det_query_vector(7, 64)
    path = str(tmp_path / "lsh_local_ix")
    lsh_build_local(emb, "label", "vec_id", "embedding", path, num_bits=16, bands=4)
    got = lsh_search_local(
        spark, path, 3, "vec_id", "embedding", q, 10,
        select_cols=["vec_id"], round_to=9,
    )
    mem = lsh_topk(
        emb.where(F.col("label") == 3), "vec_id", "embedding", q, 10,
        num_bits=16, bands=4, select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    rep = prune_report(got)
    joined = " ".join(rep["partition_filters"])
    assert "label" in joined and "band" in joined
    assert "bucket" in " ".join(rep["pushed_filters"])
    # residual predicate composes as a pushed filter on the pruned scan
    filt = lsh_search_local(
        spark, path, 3, "vec_id", "embedding", q, 5,
        select_cols=["vec_id"], round_to=9,
        predicate=F.col("vec_id") >= 100,
    )
    assert all(r.vec_id >= 100 for r in filt.collect())


def test_local_pq_sub_indexes_round_trip_and_pruning(spark, emb, tmp_path):
    """One PQ sub-index per partition: ADC against THAT partition's own
    codebook equals in-memory pq_topk over the partition alone, the scan
    prunes to the partition directory, and rescore recovers exact ranking."""
    from vector_store_spark.operators.pq import pq_build_local, pq_search_local, pq_topk
    from vector_store_spark.sources.index_store import prune_report

    q = det_query_vector(31, 64)
    path = str(tmp_path / "pq_local_ix")
    books = pq_build_local(emb, "label", "vec_id", "embedding", path, m_sub=8, k_codes=16)
    assert len(books) > 1
    got = pq_search_local(
        spark, path, 3, emb, "vec_id", "embedding", q, 10,
        select_cols=["vec_id"], round_to=9,
    )
    mem = pq_topk(
        emb.where(F.col("label") == 3), "vec_id", "embedding", q, 10,
        m_sub=8, k_codes=16, select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]
    rep = prune_report(got)
    assert any("label" in f for f in rep["partition_filters"])
    # exact rescore on the shortlist recovers the true nearest neighbor
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.types import SpaceType

    res = pq_search_local(
        spark, path, 3, emb, "vec_id", "embedding", q, 1, rescore=10,
        select_cols=["vec_id"], round_to=9,
    ).collect()
    brute = ann_topk(
        emb.where(F.col("label") == 3), "embedding", q, 1,
        space=SpaceType.EUCLIDEAN, tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()
    assert res[0].vec_id == brute[0].vec_id


def test_lsh_update_rewrites_only_touched_leaves(spark, emb, tmp_path):
    """CRUD on the persisted LSH layout: the updated index equals a clean
    build over the final row set (hyperplanes are data-independent), and
    (band, bucket) leaves not holding changed rows keep their files
    untouched (mtime check — O(touched) rewrites, not O(index))."""
    import os

    from vector_store_spark.operators.lsh import lsh_build, lsh_search, lsh_update

    q = det_query_vector(7, 64)
    path = str(tmp_path / "lsh_crud_ix")
    lsh_build(emb.where(F.col("vec_id") < 900), "vec_id", "embedding", path,
              num_bits=16, bands=4)

    def leaf_mtimes():
        out = {}
        for band in os.listdir(path):
            if not band.startswith("band="):
                continue
            for bucket in os.listdir(os.path.join(path, band)):
                d = os.path.join(path, band, bucket)
                if os.path.isdir(d):
                    out[(band, bucket)] = max(
                        os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
                    )
        return out

    before = leaf_mtimes()
    added = emb.where(F.col("vec_id") >= 900)
    lsh_update(spark, path, "vec_id", "embedding",
               items_added=added, ids_removed=list(range(25)))

    # equivalence vs clean rebuild over the final set
    clean = str(tmp_path / "lsh_clean_ix")
    lsh_build(emb.where(F.col("vec_id") >= 25), "vec_id", "embedding", clean,
              num_bits=16, bands=4)
    got = lsh_search(spark, path, "vec_id", "embedding", q, 10,
                     select_cols=["vec_id"], round_to=9).collect()
    want = lsh_search(spark, clean, "vec_id", "embedding", q, 10,
                      select_cols=["vec_id"], round_to=9).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]

    # leaves whose rows did not change were not rewritten
    after = leaf_mtimes()
    changed_rows = emb.where((F.col("vec_id") >= 900) | (F.col("vec_id") < 25))
    from vector_store_spark.operators.lsh import lsh_bucket_cols, lsh_hyperplanes

    planes = lsh_hyperplanes(64, 16)
    buckets = lsh_bucket_cols(F.col("embedding").cast("array<double>"), planes, 4)
    touched = {
        (f"band={r.band}", f"bucket={r.bucket}")
        for r in changed_rows.select(
            F.posexplode(F.array(*buckets)).alias("band", "bucket")
        ).distinct().collect()
    }
    untouched = set(before) - touched
    assert untouched, "test needs at least one untouched leaf"
    for leaf in untouched:
        assert after[leaf] == before[leaf], f"untouched leaf rewritten: {leaf}"


def test_adaptive_nprobe_arithmetic():
    from vector_store_spark.operators.ivf import adaptive_nprobe

    # tiny filtered set → exact fallback
    assert adaptive_nprobe(100, 16, 8, 320) is None
    assert adaptive_nprobe(320, 16, 8, 320) is None
    # escalation: expected pool n·np/kc must reach min_candidates
    assert adaptive_nprobe(400, 16, 8, 320) == 13   # ceil(320·16/400)
    assert adaptive_nprobe(640, 16, 8, 320) == 8    # floor at the base nprobe
    assert adaptive_nprobe(321, 16, 8, 320) == 16   # clamped to k_centroids
    assert adaptive_nprobe(10_000, 16, 8, 320) == 8  # large set: unchanged


def test_ivf_filtered_recall_by_selectivity(emb):
    """The reference guarantees top-k OF the filtered set (usearch.rs:224-248);
    the adaptive probe must hold recall@10 ≥ 0.9 at EVERY selectivity bucket,
    including ones where a fixed nprobe starves the candidate pool."""
    from vector_store_spark.operators.ivf import adaptive_nprobe

    k = 10
    q = det_query_vector(7, 64)
    for pct in (50, 20, 10, 5, 2):
        sub = emb.where((F.col("vec_id") % 1000) < pct * 10)
        n = sub.count()
        if n < k:
            continue
        truth = {r.vec_id for r in ann_topk(
            sub, "embedding", q, k, tie_break=["vec_id"], select_cols=["vec_id"]
        ).collect()}
        cents = ivf_centroids_trained(sub, "embedding", min(16, n), seed=42,
                                      space=SpaceType.COSINE)
        got = {r.vec_id for r in ivf_topk(
            sub, "vec_id", "embedding", q, k, nprobe=2,
            centroids=cents, n_assign=2, select_cols=["vec_id"],
            min_candidates=32 * k,
        ).collect()}
        recall = len(got & truth) / k
        assert recall >= 0.9, (pct, n, recall)
        # and the highly selective buckets are answered exactly
        if n <= 32 * k:
            assert got == truth, (pct, n)


def test_ivf_persisted_filtered_adaptive(spark, emb, tmp_path):
    """Persisted-index twin: a selective predicate over ivf_search with
    min_candidates set must return the exact filtered top-k."""
    from vector_store_spark.operators.ivf import ivf_build, ivf_search

    path = str(tmp_path / "ivf_adaptive")
    ivf_build(emb, "vec_id", "embedding", path, k_centroids=8)
    q = det_query_vector(13, 64)
    pred = F.col("vec_id") % 17 == 0  # ~6 % of rows
    truth = {r.vec_id for r in ann_topk(
        emb.where(pred), "embedding", q, 10,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()}
    got = {r.vec_id for r in ivf_search(
        spark, path, "vec_id", "embedding", q, 10, nprobe=2,
        predicate=pred, min_candidates=100, select_cols=["vec_id"],
    ).collect()}
    assert got == truth


def test_lsh_filtered_adaptive_exact_fallback(emb):
    """LSH twin of the adaptive filtered-search guard: a selective subset at
    or under min_candidates is ranked exactly (bucket probing at 2 %
    selectivity recalled only ~0.5 before)."""
    from vector_store_spark.operators.lsh import lsh_topk

    q = det_query_vector(19, 64)
    sub = emb.where((F.col("vec_id") % 1000) < 20)  # 2 pct stratum
    n = sub.count()
    if n < 10:
        return
    truth = {r.vec_id for r in ann_topk(
        sub, "embedding", q, 10, tie_break=["vec_id"], select_cols=["vec_id"]
    ).collect()}
    got = {r.vec_id for r in lsh_topk(
        sub, "vec_id", "embedding", q, 10, num_bits=16, bands=4,
        select_cols=["vec_id"], min_candidates=320,
    ).collect()}
    assert got == truth


def test_lsh_persisted_filtered_adaptive(spark, emb, tmp_path):
    """Persisted-LSH twin of the adaptive guard: exact tier under
    min_candidates, escalated multiprobe above it (count-then-tier as in
    ivf_search)."""
    from vector_store_spark.operators.lsh import lsh_build, lsh_search

    path = str(tmp_path / "lsh_adaptive")
    lsh_build(emb, "vec_id", "embedding", path, num_bits=16, bands=4)
    q = det_query_vector(13, 64)
    pred = F.col("vec_id") % 17 == 0  # ~6 % of rows: under min_candidates
    truth = {r.vec_id for r in ann_topk(
        emb.where(pred), "embedding", q, 10,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()}
    got = {r.vec_id for r in lsh_search(
        spark, path, "vec_id", "embedding", q, 10,
        predicate=pred, min_candidates=100, select_cols=["vec_id"],
    ).collect()}
    assert got == truth
    # escalation tier: filtered set above the floor -> multiprobe widens,
    # candidates are a superset of the unguarded probe's
    pred_wide = F.col("vec_id") % 2 == 0
    plain = {r.vec_id for r in lsh_search(
        spark, path, "vec_id", "embedding", q, 10,
        predicate=pred_wide, select_cols=["vec_id"],
    ).collect()}
    wide_truth = {r.vec_id for r in ann_topk(
        emb.where(pred_wide), "embedding", q, 10,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()}
    guarded = {r.vec_id for r in lsh_search(
        spark, path, "vec_id", "embedding", q, 10,
        predicate=pred_wide, min_candidates=64, select_cols=["vec_id"],
    ).collect()}
    assert len(guarded & wide_truth) >= len(plain & wide_truth)


def test_ivfpq_persisted_filtered_adaptive(spark, emb, tmp_path):
    """IVF-PQ twin: the exact tier back-joins filtered ids to the source
    vectors and ranks by TRUE L2 (no ADC error in the result)."""
    from vector_store_spark.operators.ivfpq import ivfpq_build, ivfpq_search

    path = str(tmp_path / "ivfpq_adaptive")
    ivfpq_build(emb, "vec_id", "embedding", path, k_centroids=8,
                filtering_cols=["label"])
    q = det_query_vector(13, 64)
    pred = F.col("vec_id") % 17 == 0
    truth = {r.vec_id for r in ann_topk(
        emb.where(pred), "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()}
    got = {r.vec_id for r in ivfpq_search(
        spark, path, emb, "vec_id", "embedding", q, 10, nprobe=2,
        predicate=pred, min_candidates=100, select_cols=["vec_id"],
    ).collect()}
    assert got == truth


def test_local_filtered_adaptive(spark, emb, tmp_path):
    """Local sub-index twins: the partition Eq composes into the count scan
    and the exact fallback for both the IVF and LSH local layouts."""
    from vector_store_spark.operators.ivf import ivf_build_local, ivf_search_local
    from vector_store_spark.operators.lsh import lsh_build_local, lsh_search_local

    q = det_query_vector(13, 64)
    part = 3
    pred = F.col("vec_id") % 3 == 0
    sub = emb.where((F.col("label") == part) & pred)
    truth = {r.vec_id for r in ann_topk(
        sub, "embedding", q, 10, tie_break=["vec_id"], select_cols=["vec_id"]
    ).collect()}

    ipath = str(tmp_path / "ivf_local_adaptive")
    ivf_build_local(emb, "label", "vec_id", "embedding", ipath, k_centroids=4)
    got_ivf = {r.vec_id for r in ivf_search_local(
        spark, ipath, part, "vec_id", "embedding", q, 10, nprobe=2,
        predicate=pred, min_candidates=320, select_cols=["vec_id"],
    ).collect()}
    assert got_ivf == truth

    lpath = str(tmp_path / "lsh_local_adaptive")
    lsh_build_local(emb, "label", "vec_id", "embedding", lpath,
                    num_bits=16, bands=4)
    got_lsh = {r.vec_id for r in lsh_search_local(
        spark, lpath, part, "vec_id", "embedding", q, 10,
        predicate=pred, min_candidates=320, select_cols=["vec_id"],
    ).collect()}
    assert got_lsh == truth


def test_lsh_gemm_banding_matches_expression_path(spark, emb):
    """r17: lsh_build/lsh_update/lsh_topk band on the Arrow GEMM path
    (with_lsh_buckets) instead of per-row interpreted aggregates. The
    (id, band, bucket) rows must be IDENTICAL to the expression path —
    the persisted layout's directory structure and every probe's pruning
    depend on it."""
    from vector_store_spark.operators.lsh import (
        _banded,
        lsh_bucket_cols,
        lsh_hyperplanes,
    )

    planes = lsh_hyperplanes(64, 16)
    got = {(r.vec_id, r.band, r.bucket) for r in
           _banded(emb, "embedding", planes, 4)
           .select("vec_id", "band", "bucket").collect()}
    buckets = lsh_bucket_cols(F.col("embedding").cast("array<double>"), planes, 4)
    want = {(r.vec_id, r.band, r.bucket) for r in
            emb.select("vec_id", F.posexplode(F.array(*buckets))
                       .alias("band", "bucket")).collect()}
    assert got == want
