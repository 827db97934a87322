"""Text-analysis operator tests: langid argmax/tie-break, quality-feature
math on hand-computable docs, token-count estimators, fingerprint identity."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.textstats import (
    fingerprints,
    langid,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was flat"),
            (2, "el perro corre por la calle y no se detiene"),
            (3, "der Hund und die Katze sind nicht da"),
            (4, "xyzzy plugh qwerty"),  # no profile words
            (5, ""),
        ],
        ["doc_id", "text"],
    )


def test_tokens_udf_matches_tokenize_expr(spark, sf_dir):
    from vector_store_spark.functions.text import tokenize, tokens_udf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select(
        tokenize("text").alias("expr_toks"),
        tokens_udf()(F.col("text")).alias("udf_toks"),
    ).collect()
    assert all(r.expr_toks == r.udf_toks for r in rows)


def test_langid(spark, docs):
    got = {r.doc_id: r.lang for r in docs.select("doc_id", langid("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "und"
    assert got[5] == "und"


def test_langid_tie_break_name_asc(spark):
    # "la" is in both es and fr profiles -> tie at 1 -> es wins (name asc)
    df = spark.createDataFrame([(1, "la zzz")], ["doc_id", "text"])
    assert df.select(langid("text").alias("l")).first().l == "es"


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42 ok")], ["doc_id", "text"])
    r = quality_features(df, "doc_id", "text").first()
    # chars=19: alpha=12, digits=2, punct(,!)=2
    assert r.n_chars == 19.0
    assert r.n_tokens == 4.0  # hello, world, 42, ok
    assert abs(r.alpha_ratio - 12 / 19) < 1e-9
    assert abs(r.digit_ratio - 2 / 19) < 1e-9
    assert abs(r.punct_ratio - 2 / 19) < 1e-9
    assert 0.0 <= r.quality_score <= 1.0


def test_quality_empty_doc_guards(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    r = quality_features(df, "doc_id", "text").first()
    assert r.n_tokens == 0.0 and r.alpha_ratio == 0.0 and r.stopword_ratio == 0.0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "don't stop, 123 go!")], ["doc_id", "text"])
    r = token_counts(df, "doc_id", "text").first()
    assert r.ws_tokens == 4
    # don ' t stop , 1 2 3 go !  (letters-runs, single digits, single symbols)
    assert r.bpe_tokens == 10


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps!"), (2, "the quick BROWN fox jumps"), (3, "ab")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in fingerprints(df, "doc_id", "text", n=3).collect()}
    # normalization makes 1 and 2 identical -> same content hash
    assert rows[1].content_hash == rows[2].content_hash
    assert rows[1].min_shingle_hash == rows[2].min_shingle_hash
    assert rows[3].min_shingle_hash is None  # < n tokens -> no shingles


def test_langid_udf_matches_expr_on_corpus(spark, sf_dir):
    from vector_store_spark.operators.textstats import langid_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    both = docs.select(
        langid("text").alias("udf_lang"), langid_expr("text").alias("expr_lang")
    )
    assert both.where(F.col("udf_lang") != F.col("expr_lang")).count() == 0


def test_quality_features_udf_matches_expr_on_corpus(spark, sf_dir):
    from vector_store_spark.operators.textstats import quality_features_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hot = quality_features(docs, "doc_id", "text").orderBy("doc_id").collect()
    spec = quality_features_expr(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert [tuple(r) for r in hot] == [tuple(r) for r in spec]  # bit-identical


def test_quality_features_byte_mask_char_counts_edge_cases(spark):
    """r18: the char-class ratios moved from three JVM regexp_replace passes
    to a vectorized UTF-8 byte-mask pass inside the Arrow UDF — pin the
    byte-level counting against the expression twin on exactly the inputs
    where byte and char arithmetic could diverge: multi-byte UTF-8 (length()
    counts code points, the ASCII classes must not match continuation
    bytes), the negated class [^a-zA-Z0-9 ] matching non-ASCII chars, null
    text (length(NULL) is NULL), empty text, and class-boundary bytes."""
    from vector_store_spark.operators.textstats import quality_features_expr

    rows = [
        (1, "héllo wörld"),            # 2-byte chars inside words
        (2, "日本語テキスト 123 abc"),  # 3-byte chars + digits + ascii
        (3, "emoji \U0001f600 mix!"),   # 4-byte char
        (4, None),                      # null text
        (5, ""),                        # empty text
        (6, "   "),                     # spaces only (kept class, no tokens)
        (7, "@[`{/:Z a z 0 9"),         # bytes adjacent to class boundaries
        (8, "ASCII only text 42, fine."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hot = quality_features(df, "doc_id", "text").orderBy("doc_id").collect()
    spec = quality_features_expr(df, "doc_id", "text").orderBy("doc_id").collect()
    # bit-identical everywhere the two paths were ever equal. (On NULL text
    # they diverge PRE-r18 in the token fields — the UDF maps null to "",
    # size(NULL) in the spec is NULL — so pin the hot path's historical null
    # row explicitly instead: null n_chars, zero ratios.)
    assert [tuple(r) for r in hot if r.doc_id != 4] == \
           [tuple(r) for r in spec if r.doc_id != 4]
    null_row = [r for r in hot if r.doc_id == 4][0]
    assert null_row.n_chars is None
    assert (null_row.alpha_ratio, null_row.punct_ratio, null_row.digit_ratio,
            null_row.n_tokens) == (0.0, 0.0, 0.0, 0.0)


def test_repetition_features_known_values(spark):
    from vector_store_spark.operators.textstats import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # grams: 'a b'x3, 'b a'x2 -> top 3/5, dup 5/5
            (2, "w x y z"),          # all distinct -> top 1/3, dup 0
            (3, "solo"),             # < 2 tokens -> dropped
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_features(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    assert got[1].distinct_token_ratio == round(2 / 6, 6)
    assert got[1].top_2gram_frac == 0.6
    assert got[1].dup_2gram_frac == 1.0
    assert got[2].distinct_token_ratio == 1.0
    assert got[2].top_2gram_frac == round(1 / 3, 6)
    assert got[2].dup_2gram_frac == 0.0


def test_chunk_documents_windows(spark):
    from vector_store_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.chunk_id): r for r in
           chunk_documents(df, "doc_id", "text", 4, 1).collect()}
    # doc 1: 10 tokens, step 3 -> starts 0,3,6,9
    assert {(d, c) for d, c in got if d == 1} == {(1, 0), (1, 1), (1, 2), (1, 3)}
    assert got[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert got[(1, 1)].chunk_text == "t3 t4 t5 t6"   # 1-token overlap
    assert got[(1, 3)].chunk_text == "t9" and got[(1, 3)].n_chunk_tokens == 1
    assert got[(2, 0)].n_chunk_tokens == 2           # short doc: one chunk
    assert not any(d == 3 for d, _ in got)           # empty doc: no chunks


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from vector_store_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, 4)


def test_unigram_logprob_orders_gibberish_below_modal_text(spark):
    from vector_store_spark.operators.textstats import unigram_logprob

    # doc 1/2 reuse the corpus's modal words; doc 3 is one-off gibberish —
    # its terms have tf=1, so its mean logprob must be the lowest
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),
            (2, "the cat sat on the mat once more today"),
            (3, "zxqv wopr fnord blarg quux"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(docs, "doc_id", "text").collect()}
    assert rows[3]["mean_logprob"] < rows[1]["mean_logprob"]
    assert rows[3]["mean_logprob"] < rows[2]["mean_logprob"]
    assert rows[1]["n_tokens"] == 10 and rows[3]["n_tokens"] == 5
    # MLE sanity: a doc of one repeated term w has mean_logprob = ln(tf_w/N)
    import math
    one = spark.createDataFrame([(1, "a a a"), (2, "b")], "doc_id long, text string")
    got = {r["doc_id"]: r["mean_logprob"]
           for r in unigram_logprob(one, "doc_id", "text").collect()}
    assert abs(got[1] - math.log(3 / 4)) < 1e-12
    assert abs(got[2] - math.log(1 / 4)) < 1e-12


def test_bigram_logprob_conditional_mle(spark):
    from vector_store_spark.operators.textstats import bigram_logprob

    import math

    # corpus bigrams: "a b" x2, "b a" x1, "a c" x1  ->  c(a .) = 3, c(b .) = 1
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(docs, "doc_id", "text").collect()}
    # doc 1: bigrams (a b), (b a), (a b): mean = (2*ln(2/3) + ln(1/1)) / 3
    assert rows[1]["n_bigrams"] == 3
    assert abs(rows[1]["mean_logprob"] - (2 * math.log(2 / 3)) / 3) < 1e-12
    # doc 2: one bigram (a c): ln(1/3)
    assert rows[2]["n_bigrams"] == 1
    assert abs(rows[2]["mean_logprob"] - math.log(1 / 3)) < 1e-12
    # a single-token doc has no bigrams and is absent
    single = spark.createDataFrame([(9, "word")], "doc_id long, text string")
    assert bigram_logprob(single, "doc_id", "text").count() == 0


def test_bigram_logprob_penalizes_shuffled_transitions(spark):
    """The order-sensitivity the unigram scorer lacks: a token-shuffled doc
    keeps its unigram profile but loses its bigram one."""
    from vector_store_spark.operators.textstats import bigram_logprob

    fluent = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat the and rug cat the on sat the"
    corpus = [(i, fluent) for i in range(1, 9)] + [(9, shuffled)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r["doc_id"]: r["mean_logprob"]
            for r in bigram_logprob(docs, "doc_id", "text").collect()}
    assert rows[9] < rows[1]


def test_winnowing_reference_and_guarantee(spark):
    """Winnowing vs a direct per-doc reference (rightmost-min tie rule), the
    2/(w+1) density ballpark, and the matching guarantee: docs sharing a
    long token run share >= 1 fingerprint."""
    from vector_store_spark.functions.hashing import _py_poly_hash, _py_tokens
    from vector_store_spark.operators.textstats import winnowing_fingerprints

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            (1, f"unique lead {shared} unique tail"),
            (2, f"different prefix words {shared} and different suffix"),
            (3, "totally unrelated content with its own running words here"),
        ],
        "doc_id long, text string",
    )
    n, w = 3, 4
    got = {r["id"]: r for r in winnowing_fingerprints(
        docs, "doc_id", "text", n=n, window=w).collect()}

    def ref_fps(text):
        toks = _py_tokens(text)
        hs = [_py_poly_hash(" ".join(toks[i:i + n]))
              for i in range(len(toks) - n + 1)]
        ww = min(w, len(hs))
        sel = set()
        for s in range(len(hs) - ww + 1):
            win = hs[s:s + ww]
            m = min(win)
            # rightmost occurrence of the min
            sel.add(win[len(win) - 1 - win[::-1].index(m)])
        return sorted(sel)

    for did, text in [(1, f"unique lead {shared} unique tail"),
                      (2, f"different prefix words {shared} and different suffix"),
                      (3, "totally unrelated content with its own running words here")]:
        fps = ref_fps(text)
        r = got[did]
        assert (r["n_fingerprints"], r["fp_checksum"], r["fp_min"], r["fp_max"]) == (
            len(fps), sum(fps), fps[0], fps[-1])
    # matching guarantee: 1 and 2 share the 10-token run -> overlap certain
    assert set(ref_fps(f"unique lead {shared} unique tail")) & set(
        ref_fps(f"different prefix words {shared} and different suffix"))


def test_frequent_ngram_ratio(spark):
    from vector_store_spark.operators.textstats import frequent_ngram_ratio

    boiler = "click here to subscribe now"
    docs = spark.createDataFrame(
        [(i, f"{boiler} article number {i} body text") for i in range(5)]
        + [(9, "completely original essay about something rare indeed")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in frequent_ngram_ratio(
        docs, "doc_id", "text", n=3, min_count=5).collect()}
    # the shared prefix "click here to subscribe now article number" yields
    # 5 corpus-frequent 3-grams (each appears 5x); the doc-specific tail
    # grams ("article number 0" ...) are unique and do not count
    assert out[0]["n_frequent"] == 5
    assert out[0]["frequent_ratio"] > 0
    assert out[9]["n_frequent"] == 0 and out[9]["frequent_ratio"] == 0.0


def test_bpe_pair_counts(spark):
    from vector_store_spark.operators.textstats import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low")], "doc_id long, text string"
    )
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(docs, "text").collect()}
    # 'low' x3, 'lower' x1: l-o 4, o-w 4, w-</w> 3, w-e 1, e-r 1, r-</w> 1
    assert got == {"l o": 4, "o w": 4, "w </w>": 3, "w e": 1,
                   "e r": 1, "r </w>": 1}


def test_tfidf_topterms_math_and_topn(spark):
    import math

    from vector_store_spark.operators.textstats import tfidf_topterms

    # 3 docs; "cat" in 2 docs, "dog"/"fish" in 1, "the" in all 3
    docs = spark.createDataFrame(
        [
            (1, "the cat cat dog"),
            (2, "the cat"),
            (3, "the fish"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_topterms(docs, "doc_id", "text", top_n=2, round_to=6)
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["tfidf"]) for r in out.collect()}

    def idf(df):
        return math.log((3 + 1.0) / (df + 1.0)) + 1.0

    # doc 1 top-2: cat tf=2 (df=2), dog tf=1 (df=1) beat the tf=1 (df=3)
    assert rows[(1, "cat")] == (2, round(2 * idf(2), 6))
    assert rows[(1, "dog")] == (1, round(1 * idf(1), 6))
    assert (1, "the") not in rows
    # doc 2: cat (higher idf) ranks above the corpus-wide "the"
    assert rows[(2, "cat")][1] > rows[(2, "the")][1]
    # exactly top_n rows per doc
    counts = {d: sum(1 for (dd, _) in rows if dd == d) for d in (1, 2, 3)}
    assert counts == {1: 2, 2: 2, 3: 2}


def test_tfidf_topterms_tie_breaks_on_term_asc(spark):
    from vector_store_spark.operators.textstats import tfidf_topterms

    # two terms with identical tf and df in the same doc -> identical score;
    # the kept singleton must be the lexicographically smaller term
    docs = spark.createDataFrame(
        [(1, "zebra apple"), (2, "zebra apple")], ["doc_id", "text"]
    )
    out = tfidf_topterms(docs, "doc_id", "text", top_n=1, round_to=6)
    assert {r["term"] for r in out.collect()} == {"apple"}
