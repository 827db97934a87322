"""Engine-invariant stress gate for the minhash-closure dedup families
(VERDICT r16 #6): the sf10 correctness gate dropped dedup_minhash_lsh /
dedup_groups_minhash / dedup_keep_best / dedup_drop_list because their
DuckDB oracles are corpus-superlinear (the recursive closure over 500k-doc
shingle sets), NOT because the engine can't run there. This gate checks the
ENGINE at those scales with no full oracle: algebraic invariants that any
correct run must satisfy, plus one exact sub-corpus oracle bounded by a
deterministic sample.

Invariants (each must hold exactly):

1. pairs_wellformed       — id_a < id_b, no duplicate pair, jaccard >= the
                            threshold on every emitted row (linear scan).
2. subsample_oracle_equal — the full MinHash pipeline's DuckDB oracle
                            (queries_dedup.MINHASH_PAIRS_SQL, verbatim) run
                            on the doc_id < S CONTIGUOUS-RANGE sub-corpus
                            must emit EXACTLY the engine pairs with both
                            ends in the sample. Valid because the pair
                            predicate (shares a band bucket AND exact
                            J >= t) is per-pair deterministic — corpus
                            membership cannot add or remove a pair between
                            two fixed docs — so pairs(X) ∩ S² = pairs(S).
                            Range (not modulo) sampling because synthesized
                            corpora concentrate near-dup pairs at id-local
                            distances: a mod-M sample keeps a pair only
                            with probability ~1/M and reads vacuously
                            green (0 == 0) at stretch SFs.
3. idempotence            — dedup(dedup(X)) = dedup(X): re-running the
                            pipeline on the kept corpus (component minima +
                            singletons) emits ZERO pairs. Exact, not
                            heuristic: banding is deterministic, so a
                            surviving near-dup pair would have been merged
                            into one component in round one.
4. component_partition    — members form a partition: each member_id
                            appears exactly once, group_id = min(member_id)
                            of its group, and the group_id row exists.
5. edges_within_components— every verified pair joins two members of the
                            SAME component (no edge crosses groups).
6. keep_best_argmax       — dedup_keep_best emits exactly one row per
                            group, whose (quality, id) is the group's
                            arg-max under (q DESC, id ASC), with the true
                            group_size.
7. drop_volume_conserved  — dedup_drop_list's total n_dropped equals
                            |members| - |groups| (each group keeps exactly
                            one doc), and no kept doc is dropped.

Usage:
  SPARK_GRAFT_CHECK_SF_DIR=var/sf10 python tools/check_invariants.py \
      [--json INVARIANTS_local_rN_sf10.json] [--sample-range S]

The sample range defaults to 2,500 docs (DuckDB side stays minutes even
though its closure is superlinear in the SAMPLE).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")


def main(json_out=None, sample_range=None):
    import duckdb
    from pyspark.sql import functions as F

    from tools.check_correctness import _parallel_capacity_probe
    from vector_store_spark.operators.dedup import (
        dedup_component_members,
        minhash_lsh_pairs,
    )
    from vector_store_spark.queries_dedup import (
        MINHASH_PAIRS_SQL,
        _BANDS,
        _NH,
        dedup_drop_list,
        dedup_keep_best,
    )
    from vector_store_spark.registry import load
    from vector_store_spark.session import get_spark

    t_start = time.time()
    cap_start = _parallel_capacity_probe()
    spark = get_spark("invariants-check")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {}

    def record(name, violations: int, detail: str = ""):
        ok = violations == 0
        results[name] = {"status": "pass" if ok else "fail",
                         "violations": int(violations), "detail": detail}
        print(("PASS  " if ok else "FAIL  ") + f"{name}"
              + (f": {detail}" if detail else ""), flush=True)

    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    if sample_range is None:
        sample_range = min(n_docs, 2500)
    print(f"invariants: {SF_DIR} n_docs={n_docs} sample_range={sample_range}",
          flush=True)

    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=_NH, bands=_BANDS,
        threshold=0.8, max_bucket_width=None,
    ).localCheckpoint()  # consumed by five checks — compute once
    n_pairs = pairs.count()

    # 1. well-formed pair rows
    bad_order = pairs.where(F.col("id_a") >= F.col("id_b")).count()
    dup_pairs = n_pairs - pairs.select("id_a", "id_b").distinct().count()
    low_j = pairs.where(F.col("jaccard") < 0.8).count()
    record("pairs_wellformed", bad_order + dup_pairs + low_j,
           f"n_pairs={n_pairs} bad_order={bad_order} dup={dup_pairs} "
           f"below_threshold={low_j}")

    # 2. exact sub-corpus oracle equality (both sides restricted to the
    # deterministic sample; jaccard compared at the entry's 6-dp rounding)
    eng_sample = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in pairs.where(
            (F.col("id_a") < sample_range)
            & (F.col("id_b") < sample_range)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id < {sample_range}")
    osample = {(r[0], r[1], round(float(r[2]), 6))
               for r in con.execute(MINHASH_PAIRS_SQL).fetchall()}
    sym = eng_sample ^ osample
    record("subsample_oracle_equal", len(sym),
           f"sampled_docs={sample_range} engine_pairs={len(eng_sample)} "
           f"oracle_pairs={len(osample)}"
           + (f" first_diffs={sorted(sym)[:3]}" if sym else ""))

    # components consumed by 3/4/5/6/7
    members = dedup_component_members(pairs).localCheckpoint()
    n_members = members.count()
    n_groups = members.select("group_id").distinct().count()

    # 3. idempotence: kept corpus = group minima + out-of-component docs
    dropped = members.where(F.col("member_id") != F.col("group_id")).select(
        F.col("member_id").alias("doc_id"))
    kept = docs.join(dropped.hint("SHUFFLE_HASH"), "doc_id", "left_anti")
    pairs2 = minhash_lsh_pairs(
        kept, "doc_id", "text", n=3, num_hashes=_NH, bands=_BANDS,
        threshold=0.8, max_bucket_width=None,
    )
    n_second = pairs2.count()
    record("idempotence", n_second,
           f"second_pass_pairs={n_second} kept_docs={n_docs - (n_members - n_groups)}")

    # 4. members form a partition with min-id labels
    dup_members = n_members - members.select("member_id").distinct().count()
    minima = members.groupBy("group_id").agg(
        F.min("member_id").alias("true_min"))
    bad_min = minima.where(F.col("group_id") != F.col("true_min")).count()
    missing_rep = n_groups - members.where(
        F.col("member_id") == F.col("group_id")).count()
    record("component_partition", dup_members + bad_min + missing_rep,
           f"n_members={n_members} n_groups={n_groups} dup_members={dup_members} "
           f"bad_min_label={bad_min} missing_rep={missing_rep}")

    # 5. every edge stays inside one component
    ga = members.select(F.col("member_id").alias("id_a"),
                        F.col("group_id").alias("ga"))
    gb = members.select(F.col("member_id").alias("id_b"),
                        F.col("group_id").alias("gb"))
    cross = (pairs.join(ga.hint("SHUFFLE_HASH"), "id_a")
             .join(gb.hint("SHUFFLE_HASH"), "id_b")
             .where(F.col("ga") != F.col("gb")).count())
    unmapped = (n_pairs
                - pairs.join(ga.hint("SHUFFLE_HASH"), "id_a", "left_semi").count())
    record("edges_within_components", cross + unmapped,
           f"cross_group_edges={cross} unmapped_endpoints={unmapped}")

    # 6. keep-best is the per-group arg-max under (q DESC, id ASC)
    from vector_store_spark.operators.textstats import quality_features
    from vector_store_spark.registry import ROUND

    kb = dedup_keep_best(spark, SF_DIR).localCheckpoint()
    n_kb = kb.count()
    q = quality_features(docs, "doc_id", "text").select(
        F.col("doc_id").alias("member_id"),
        F.round("quality_score", ROUND).alias("q"))
    mq = members.hint("SHUFFLE_HASH").join(q, "member_id")
    # a keep-best row is beaten if some member of its group has strictly
    # better (q, -id); count beaten rows + size mismatches + count mismatch
    beaten = (kb.join(mq, "group_id")
              .where((F.col("q") > F.col("keep_quality"))
                     | ((F.col("q") == F.col("keep_quality"))
                        & (F.col("member_id") < F.col("keep_id"))))
              .select("group_id").distinct().count())
    sizes = members.groupBy("group_id").agg(
        F.count("*").cast("long").alias("true_size"))
    bad_size = kb.join(sizes, "group_id").where(
        F.col("group_size") != F.col("true_size")).count()
    record("keep_best_argmax", beaten + bad_size + abs(n_kb - n_groups),
           f"kb_rows={n_kb} beaten_groups={beaten} bad_group_size={bad_size}")

    # 7. drop volume conservation: one keeper per group
    dl = dedup_drop_list(spark, SF_DIR)
    total_dropped = dl.agg(F.sum("n_dropped")).first()[0] or 0
    expect = n_members - n_groups
    record("drop_volume_conserved", abs(int(total_dropped) - expect),
           f"dropped={total_dropped} expected={expect}")

    n_fail = sum(1 for r in results.values() if r["status"] != "pass")
    print(f"\n{len(results) - n_fail} pass, {n_fail} fail", flush=True)
    if json_out:
        import json

        cap_end = _parallel_capacity_probe()
        with open(json_out, "w") as f:
            json.dump({
                "sf_dir": SF_DIR,
                "n_docs": n_docs,
                "sample_range": sample_range,
                "n_pairs": n_pairs,
                "n_members": n_members,
                "n_groups": n_groups,
                "pass": len(results) - n_fail,
                "fail": n_fail,
                "wall_sec": round(time.time() - t_start, 1),
                "parallel32_over_single_at_start": cap_start["parallel_over_single"],
                "parallel32_over_single_at_end": cap_end["parallel_over_single"],
                "invariants": results,
            }, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.stdout.flush()
    import threading

    stopper = threading.Thread(target=spark.stop, daemon=True)
    stopper.start()
    stopper.join(timeout=60)
    if stopper.is_alive():
        import bench

        bench._reap_spark_scratch(t_start)
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    mod = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--sample-range" in argv:
        i = argv.index("--sample-range")
        mod = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    _rc = main(json_out=json_out, sample_range=mod)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_rc)  # see bench.py: never let interpreter teardown outlive the record
