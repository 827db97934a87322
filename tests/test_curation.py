"""Curation pipeline (operators/curation.py): exact dedup keeps the min-id row,
the quality gate drops junk and out-of-band lengths, language ID tags survivors.
"""

from pyspark.sql import functions as F

from vector_store_spark.operators.curation import curate

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and then the dog chases a "
    "ball in the park with other dogs while the sun is shining on the grass "
    "and birds are singing in the trees near the river bank"
)
GOOD_DE = (
    "der schnelle braune fuchs springt und der hund ist nicht langsam aber "
    "die katze schlaeft auf dem sofa mit einer decke und das wetter ist "
    "heute schoen weil die sonne scheint und der wind nicht weht"
)


def test_curate_dedup_quality_and_lang(spark):
    rows = [
        (1, "a", GOOD_EN),
        (2, "a", GOOD_EN + "!"),           # same normalized text -> dup of 1
        (3, "b", GOOD_DE),
        (4, "b", "@@ ## $$ %% ^^ && ** (( )) !! ?? :: ;; ,, .. // \\\\ || "
                 "@@ ## $$ %% ^^ && ** (( )) !! ?? :: ;; ,, .."),  # punct soup
        (5, "b", "short text only"),       # under min_tokens
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = curate(docs, "doc_id", "text", extra_cols=("source",),
                 min_tokens=10, max_tokens=100, min_quality=0.5)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 3}              # 2 deduped, 4 low quality, 5 short
    assert got[1].pred_lang == "en"
    assert got[3].pred_lang == "de"
    assert got[1].source == "a"
    assert all(0.5 <= r.quality_score <= 1.0 for r in got.values())
    assert "text" not in out.columns


def test_curate_keeps_min_id_per_group(spark):
    rows = [(10, "x", GOOD_EN), (7, "y", GOOD_EN), (9, "z", GOOD_EN)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = curate(docs, "doc_id", "text", extra_cols=("source",),
                 min_tokens=10, max_tokens=100, min_quality=0.0)
    rows_out = out.collect()
    assert len(rows_out) == 1
    assert rows_out[0].doc_id == 7 and rows_out[0].source == "y"


def test_curate_plan_is_single_combining_aggregate(spark):
    docs = spark.createDataFrame([(1, "s", GOOD_EN)], ["doc_id", "source", "text"])
    out = curate(docs, "doc_id", "text", extra_cols=("source",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # dedup must be one aggregation with map-side partial combine (duplicates
    # collapse before the exchange), not a window sort or a self-join
    assert "Window" not in plan
    assert "Join" not in plan
    assert "partial_min_by" in plan
    assert plan.count("Exchange") == 1


def test_quantile_thresholds_matches_rank_definition(spark):
    """Histogram-cumulative threshold == the score at rank ceil(n*p) under
    (score, id) ordering, including heavy ties and the odd/even cases."""
    from vector_store_spark.operators.curation import quantile_thresholds
    from pyspark.sql import functions as F

    rows = [("a", i, s) for i, s in enumerate([0.1, 0.1, 0.2, 0.5, 0.9])]   # odd n
    rows += [("b", i, s) for i, s in enumerate([0.3, 0.3, 0.3, 0.7])]       # even n, ties at median
    rows += [("c", 0, 0.42)]                                                # n = 1
    df = spark.createDataFrame(rows, "g string, id int, s double")
    got = {r["g"]: (r["n_docs"], r["threshold"]) for r in
           quantile_thresholds(df, "g", "s").collect()}
    # python reference: sorted scores, element at ceil(n/2) - 1
    import math
    for g in ("a", "b", "c"):
        scores = sorted(s for gg, _, s in rows if gg == g)
        pos = math.ceil(len(scores) / 2)
        assert got[g] == (len(scores), scores[pos - 1])
    # upper-quartile position: ceil(n * 3/4)
    got75 = {r["g"]: r["threshold"] for r in
             quantile_thresholds(df, "g", "s", 3, 4).collect()}
    for g in ("a", "b", "c"):
        scores = sorted(s for gg, _, s in rows if gg == g)
        assert got75[g] == scores[math.ceil(len(scores) * 3 / 4) - 1]


def test_jsonl_quarantine_forks(spark, tmp_path):
    """PERMISSIVE ingestion: well-formed rows parse, malformed lines land
    raw in the quarantine fork, type drift quarantines too."""
    import os

    from vector_store_spark.sources.ingest import read_jsonl_quarantine

    lines = [
        '{"doc_id": 1, "text": "hello", "source": "web"}',
        '{"doc_id": 2, "text": "world", "source": "book"}',
        '{"doc_id": 3, "text": "truncat',            # malformed JSON
        '{"doc_id": "not-a-number", "text": "x", "source": "web"}',  # type drift
        "not json at all",
    ]
    src = str(tmp_path / "corpus")
    os.makedirs(src)
    with open(os.path.join(src, "part-0.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    parsed, quarantined, handle = read_jsonl_quarantine(
        spark, src, "doc_id bigint, text string, source string"
    )
    assert {(r.doc_id, r.text) for r in parsed.collect()} == {(1, "hello"), (2, "world")}
    raw = {r.raw_line for r in quarantined.collect()}
    assert raw == set(lines[2:])  # bad bytes preserved verbatim for replay
    handle.unpersist()
