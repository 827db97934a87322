"""Sampling/data-mixing operators: determinism and budget semantics."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_store_spark.operators.sampling import hash_sample, token_budget_take


def test_hash_sample_is_deterministic_and_partition_independent(spark):
    df1 = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    df8 = df1.repartition(8)
    got1 = {r.doc_id for r in hash_sample(df1, "doc_id", 250).collect()}
    got8 = {r.doc_id for r in hash_sample(df8, "doc_id", 250).collect()}
    assert got1 == got8
    assert 0.2 < len(got1) / 10_000 < 0.3  # ~25%
    # different salt -> different (but still deterministic) sample
    salted = {r.doc_id for r in hash_sample(df1, "doc_id", 250, salt=7).collect()}
    assert salted != got1


def test_hash_sample_is_narrow(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_sample(df, "doc_id", 100)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter, no shuffle


def test_token_budget_take(spark):
    rows = [
        # group a: weights 10,20,30 in quality order -> budget 30 keeps 10,20
        ("a", 1, 10, 0.9), ("a", 2, 20, 0.8), ("a", 3, 30, 0.7),
        # group b: first row overshoots alone -> still kept (predecessors=0)
        ("b", 4, 100, 0.9), ("b", 5, 1, 0.8),
    ]
    df = spark.createDataFrame(rows, ["g", "doc_id", "tok", "q"])
    took = token_budget_take(df, "g", "q", "doc_id", "tok", 30)
    got = {(r.g, r.doc_id): r.running_total for r in took.collect()}
    assert set(got) == {("a", 1), ("a", 2), ("b", 4)}
    assert got[("a", 2)] == 30 and got[("b", 4)] == 100


def test_token_budget_histogram_matches_window_spec(spark):
    """The scale path must be value-identical (kept set AND running totals)
    to the single-window spec, including equal-score ties and edge buckets."""
    import random

    from vector_store_spark.operators.sampling import token_budget_take_window

    rnd = random.Random(7)
    rows = [
        (f"g{i % 3}", i, rnd.randint(1, 50), round(rnd.random(), 2))
        for i in range(500)
    ]
    # force score ties and out-of-range scores into the mix
    rows += [("g0", 1000 + j, 10, 0.5) for j in range(20)]
    rows += [("g1", 2000, 5, 1.5), ("g2", 3000, 5, -0.5)]
    df = spark.createDataFrame(rows, ["g", "doc_id", "tok", "q"])
    fast = token_budget_take(df, "g", "q", "doc_id", "tok", 300, num_buckets=16)
    spec = token_budget_take_window(
        df, "g", [F.desc("q"), F.asc("doc_id")], "tok", 300
    )
    k = lambda r: (r.g, r.doc_id)
    assert {k(r): r.running_total for r in fast.collect()} == \
           {k(r): r.running_total for r in spec.collect()}


def test_token_budget_window_is_per_bucket_not_per_group(spark):
    """Skew guard: the running-sum window must partition by (group, bucket),
    never by the group alone (single-reducer sort at scale)."""
    df = spark.createDataFrame(
        [("a", i, 10, i / 100.0) for i in range(100)], ["g", "doc_id", "tok", "q"]
    )
    out = token_budget_take(df, "g", "q", "doc_id", "tok", 100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_tb_bucket" in plan.split("Window")[1].split("\n")[0]


def test_cap_per_group_deterministic_and_partition_independent(spark):
    from vector_store_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(f"s{i % 4}", i, i * 3) for i in range(400)], ["src", "doc_id", "w"]
    )
    got1 = {(r.src, r.doc_id) for r in cap_per_group(df, "src", "doc_id", 25).collect()}
    got8 = {(r.src, r.doc_id) for r in
            cap_per_group(df.repartition(8), "src", "doc_id", 25).collect()}
    assert got1 == got8
    from collections import Counter

    per = Counter(s for s, _ in got1)
    assert all(v == 25 for v in per.values())
    # schema untouched (helper columns dropped)
    assert cap_per_group(df, "src", "doc_id", 25).columns == df.columns
    # different salt -> different (still capped) selection
    salted = {(r.src, r.doc_id) for r in
              cap_per_group(df, "src", "doc_id", 25, salt=7).collect()}
    assert salted != got1


def test_global_prefix_offsets_match_window(spark):
    from vector_store_spark.operators.sampling import global_prefix_offsets

    df = spark.createDataFrame(
        [(i * 7 % 1000, (i % 13) + 1) for i in range(500)], ["doc_id", "w"]
    ).dropDuplicates(["doc_id"])
    got = {r.doc_id: r.offset for r in
           global_prefix_offsets(df, "doc_id", "w", bucket_size=50).collect()}
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spec = {r.doc_id: r.off for r in df.withColumn(
        "off", F.sum("w").over(w) - F.col("w")
    ).collect()}
    assert got == spec
    # plan guard: the prefix-scan window partitions by the id-range bucket
    plan = global_prefix_offsets(df, "doc_id", "w", bucket_size=50) \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "_ps_bucket" in line


def test_pack_sequences_boundaries(spark):
    from vector_store_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 5), (2, 4), (3, 8), (4, 2)], ["doc_id", "w"]
    )
    got = {r.doc_id: (r.offset, r.seq_id, r.seq_end_id, r.spans_boundary)
           for r in pack_sequences(df, "doc_id", "w", 8, bucket_size=2).collect()}
    # stream: doc1 [0,5) doc2 [5,9) doc3 [9,17) doc4 [17,19); seq_len 8
    assert got[1] == (0, 0, 0, False)
    assert got[2] == (5, 0, 1, True)    # crosses the 8-token cut
    assert got[3] == (9, 1, 2, True)    # crosses the 16-token cut
    assert got[4] == (17, 2, 2, False)


def test_global_shuffle_is_deterministic_permutation(spark):
    from vector_store_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)],
                               "doc_id long, text string")
    a = [r["doc_id"] for r in global_shuffle(df, "doc_id").collect()]
    b = [r["doc_id"] for r in
         global_shuffle(df.repartition(7), "doc_id").collect()]
    assert a == b  # reproducible under any input partitioning
    assert sorted(a) == list(range(200))  # a permutation, nothing lost
    assert a != list(range(200))  # and actually shuffled
    # a different salt gives a different epoch order over the same rows
    c = [r["doc_id"] for r in global_shuffle(df, "doc_id", salt=1).collect()]
    assert sorted(c) == list(range(200)) and c != a


def test_temperature_sample_rebalances_sources(spark):
    """Temperature mixing (keep ∝ n^(1/2)/n): a 100× heavier source gets a
    ~10× LOWER keep rate, expected kept mass tracks the budget, and the
    kept set is a deterministic function of (id, salt)."""
    from vector_store_spark.operators.sampling import (
        temperature_sample,
        temperature_sample_rates,
    )

    rows = [(i, "heavy", 100) for i in range(10_000)]
    rows += [(100_000 + i, "light", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")

    budget = 200_000  # 1/5 of the 1.01M total mass
    rates = {r["source"]: r["rate_ppm"]
             for r in temperature_sample_rates(df, "source", "n_chars", budget).collect()}
    # sqrt weighting: heavy/light mass ratio 100 ⇒ weight ratio 10 ⇒ the
    # light source's uncapped keep rate is ~10× the heavy source's — which
    # exceeds 100%, so it clamps at 1M ppm (keep everything)
    assert rates["light"] == 1_000_000, rates
    assert 150_000 <= rates["heavy"] <= 220_000, rates
    kept = temperature_sample(df, "source", "doc_id", "n_chars", budget)
    got = {r["source"]: (r["n"], r["mass"]) for r in kept.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("mass")).collect()}
    total_kept = sum(m for _, m in got.values())
    # hash sampling: expected mass = budget (±20% tolerance at this n)
    assert abs(total_kept - budget) / budget < 0.2, got
    # determinism: same inputs ⇒ same kept set
    again = temperature_sample(df, "source", "doc_id", "n_chars", budget)
    assert kept.select("doc_id").subtract(again.select("doc_id")).count() == 0
    assert again.select("doc_id").subtract(kept.select("doc_id")).count() == 0


def test_epoch_repeat_emits_target_mass(spark):
    """Upsampling by repetition: target 3.2× mass ⇒ 3 full copies + ~0.2
    partial; emitted mass tracks the target, full copies are exact."""
    from vector_store_spark.operators.sampling import epoch_repeat, epoch_repeat_plan

    rows = [(i, "s", 10) for i in range(1_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    targets = spark.createDataFrame([("s", 32_000)], "source string, target long")

    plan = epoch_repeat_plan(df, "source", "n_chars", targets).collect()[0]
    assert plan["full_copies"] == 3 and plan["frac_ppm"] == 200_000

    out = epoch_repeat(df, "source", "doc_id", "n_chars", targets)
    agg = out.groupBy("copy_id").count().collect()
    by_copy = {r["copy_id"]: r["count"] for r in agg}
    assert by_copy[0] == by_copy[1] == by_copy[2] == 1_000  # full copies exact
    assert 100 <= by_copy[3] <= 320  # ~20% hash stratum
    emitted = out.agg(F.sum("n_chars")).collect()[0][0]
    assert abs(emitted - 32_000) / 32_000 < 0.1
    # determinism
    again = epoch_repeat(df, "source", "doc_id", "n_chars", targets)
    assert out.select("doc_id", "copy_id").subtract(
        again.select("doc_id", "copy_id")).count() == 0


def test_export_shards_manifest_and_order(spark):
    from vector_store_spark.operators.sampling import export_shards, hash_bucket

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(50)], "doc_id long, n_chars long"
    )
    rows, manifest = export_shards(df, "doc_id", "n_chars", n_shards=4)
    got = rows.collect()
    # shard assignment matches the cross-engine hash; pos is the 0-based
    # id-ascending rank within the shard
    expect_shard = {r["doc_id"]: r["shard"] for r in df.select(
        "doc_id", hash_bucket("doc_id", 4).cast("int").alias("shard")).collect()}
    by_shard = {}
    for r in sorted(got, key=lambda r: (r["shard"], r["doc_id"])):
        assert r["shard"] == expect_shard[r["doc_id"]]
        assert r["pos"] == by_shard.get(r["shard"], 0)
        by_shard[r["shard"]] = r["pos"] + 1
    m = {r["shard"]: r for r in manifest.collect()}
    assert sum(r["n_rows"] for r in m.values()) == 50
    assert sum(r["total_weight"] for r in m.values()) == sum(10 * (i + 1) for i in range(50))
    for sh, r in m.items():
        members = [d for d, s in expect_shard.items() if s == sh]
        assert (r["min_id"], r["max_id"], r["n_rows"]) == (
            min(members), max(members), len(members))
    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        export_shards(df, "doc_id", "n_chars", n_shards=0)
