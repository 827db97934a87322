"""Text-analysis operators for training-data pipelines: language-ID, quality
scoring, token counting, and document fingerprinting.

Everything except the rolling-hash fingerprint is built-in Catalyst
expressions (regex, length arithmetic, array set ops) — JVM-side and
codegen-friendly; the fingerprint reuses the Arrow-batched polynomial hash
from functions/hashing (same integers as the oracle SQL).

Scale notes: all four operators are embarrassingly parallel per-row maps with
no shuffle; the per-source aggregations shuffle once on the group key. At
100 TB they pipeline behind the parquet scan and the only cost is the scan.
"""

from __future__ import annotations

import re as _re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_store_spark.functions.text import ENGLISH_STOPWORDS, TOKEN_SPLIT_RE, tokenize

# Function-word profiles for the n-gram/stopword language-ID heuristic.
# Small, public, high-frequency word lists per language; zh uses single
# characters (its "words" after CJK segmentation-by-character).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "von", "zu", "den", "auf", "sich", "auch", "ich", "es", "sie"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "was", "on", "with", "as", "at", "by", "this", "are"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "es", "no", "por", "con", "para", "su", "se", "del"),
    "fr": ("le", "la", "les", "et", "de", "des", "un", "une", "est", "dans",
           "que", "qui", "pour", "pas", "sur", "au", "ce", "il"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "他", "这", "中",
           "大", "来", "上", "国", "个", "到", "说", "们"),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def langid_scores(text: Column | str) -> list[tuple[str, Column]]:
    """Per-language score = # tokens (with multiplicity) found in the language
    profile. Tokens keep stopwords (they ARE the signal here)."""
    toks = tokenize(text, remove_stopwords=False)
    out = []
    for lang, words in sorted(LANG_PROFILES.items()):
        profile = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(profile, t)))
        out.append((lang, score))
    return out


def langid_expr(text: Column | str) -> Column:
    """Predicted language as a Column expression: argmax profile score, ties
    broken by language name ascending; all-zero scores ⇒ 'und' (undetermined,
    BCP-47). Executable spec — interpreted (higher-order functions are
    CodegenFallback); the hot path is the Arrow twin ``langid``."""
    scores = langid_scores(text)
    # struct comparison: (score, reversed-name) max ⇒ highest score, then
    # lexicographically smallest language name.
    best = F.greatest(*[
        F.struct(s.alias("s"), F.lit(-ord(lang[0]) * 256 - ord(lang[1])).alias("nk"),
                 F.lit(lang).alias("lang"))
        for lang, s in scores
    ])
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def langid(text: Column | str) -> Column:
    """Arrow-batched language ID computing exactly ``langid_expr`` (one pass
    over the token stream per row instead of 5 interpreted array filters);
    cross-validated against the expression in tests."""
    import pandas as pd
    from pyspark.sql.types import StringType

    profiles = [(lang, frozenset(words)) for lang, words in sorted(LANG_PROFILES.items())]

    def batch(texts):
        out = []
        for text in texts:
            toks = [
                t for t in _re.split(TOKEN_SPLIT_RE, (text or "").lower()) if t
            ]
            best_lang, best_s = "und", 0
            for lang, words in profiles:
                s = sum(1 for t in toks if t in words)
                if s > best_s:  # profiles iterate name-asc ⇒ first max wins ties
                    best_s, best_lang = s, lang
            out.append(best_lang)
        return pd.Series(out)

    return F.pandas_udf(batch, StringType()).asNondeterministic()(_col(text))


_FEATURE_DOC = """Per-document quality signals (the classic Gopher/C4-style rule inputs):

    - n_chars, n_tokens, mean_token_len
    - alpha_ratio: alphabetic chars / chars
    - punct_ratio: non-alphanumeric-non-space chars / chars
    - stopword_ratio: stopword tokens / tokens (English list)
    - digit_ratio: digit chars / chars
    - uniq_token_ratio: distinct tokens / tokens
    and a composite [0,1] quality_score.
    """


def quality_score_int_expr(
    intdiv: str = "DIV",
    n_chars: str = "n_chars",
    n_tokens: str = "n_tokens",
    alpha: str = "alpha_ratio",
    punct: str = "punct_ratio",
    stop: str = "stopword_ratio",
    uniq: str = "uniq_token_ratio",
) -> str:
    """SQL text for the composite quality score, computed EXACTLY in BIGINT.

    score = 0.3·min(T/50,1) + 0.25·alpha + 0.2·min(4·stop,1) + 0.25·uniq
            − 0.5·punct, clamped to [0,1], at a 1e-6 grid.

    The float form of this sum is a halfway-rounding trap: the sf1 stretch
    gate caught one document (of 50k) whose composite lands so close to a
    round(·,6) boundary that Spark's BigDecimal HALF_UP and DuckDB's
    x·1e6-then-nearbyint disagree by 1e-6. Every input is an exact integer
    count (chars, tokens, stopwords, …) and every coefficient an exact
    multiple of 1/100, so the score is a rational with denominator
    D = 500·C·T — compute the numerator in BIGINT, half-up-round to the
    1e-6 grid with INTEGER division, and divide once (both engines IEEE-
    divide the same integers → bit-identical doubles).

    The ratio inputs recover their counts exactly: round((s/n)·n) == s
    because the single-division ratio is within 1 ulp of the rational.

    ``intdiv``: 'DIV' (Spark SQL) or '//' (DuckDB). Overflow bound: the
    pre-division product is ≤ D·(2e6+2) — int64-safe for any document with
    chars·tokens < 4.6e9 (a 100 MB document; per-doc text stats never get
    near it).
    """
    C = f"CAST({n_chars} AS BIGINT)"
    T = f"CAST({n_tokens} AS BIGINT)"
    a = f"CAST(ROUND({alpha} * {n_chars}) AS BIGINT)"
    p = f"CAST(ROUND({punct} * {n_chars}) AS BIGINT)"
    s = f"CAST(ROUND({stop} * {n_tokens}) AS BIGINT)"
    u = f"CAST(ROUND({uniq} * {n_tokens}) AS BIGINT)"
    Ce = f"GREATEST({C}, CAST(1 AS BIGINT))"
    Te = f"GREATEST({T}, CAST(1 AS BIGINT))"
    # numerator over D = 500·Ce·Te: 0.3·min(T,50)/50 → 3·Ce·Te·min(T,50);
    # 0.25·a/C → 125·Te·a; 0.2·min(4s,T)/T → 100·Ce·min(4s,T);
    # 0.25·u/T → 125·Ce·u; 0.5·p/C → 250·Te·p. Zero counts make their own
    # terms vanish, so the Ce/Te floor guards never change a defined value.
    N = (
        f"(3 * {Ce} * {Te} * LEAST({T}, CAST(50 AS BIGINT)) + 125 * {Te} * {a}"
        f" + 100 * {Ce} * LEAST(4 * {s}, {T}) + 125 * {Ce} * {u}"
        f" - 250 * {Te} * {p})"
    )
    D = f"(500 * {Ce} * {Te})"
    ncl = f"GREATEST(CAST(0 AS BIGINT), LEAST({N}, {D}))"
    q6 = f"((2 * {ncl} * 1000000 + {D}) {intdiv} (2 * {D}))"
    return f"(CAST({q6} AS DOUBLE) / 1000000.0)"


def _with_quality_score(feats: DataFrame) -> DataFrame:
    # composite: reward alpha-heavy, stopword-bearing, lexically diverse text
    # of reasonable length; penalize punctuation soup. Clamped to [0,1].
    # Exact-integer form (see quality_score_int_expr): the value is already
    # on the 1e-6 grid, no further rounding — cross-engine-stable by
    # construction.
    return feats.withColumn(
        "quality_score", F.expr(quality_score_int_expr(intdiv="DIV"))
    )


def quality_features_expr(
    docs: DataFrame, id_col: str, text_col: str, extra_cols: Sequence[str] = ()
) -> DataFrame:
    text = _col(text_col)
    toks = tokenize(text_col, remove_stopwords=False)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    strip = lambda pat: n_chars - F.length(F.regexp_replace(text, pat, "")).cast("double")
    alpha = strip("[a-zA-Z]")
    digit = strip("[0-9]")
    punct = strip("[^a-zA-Z0-9 ]")
    stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    guard = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))

    feats = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        guard(F.aggregate(F.transform(toks, lambda t: F.length(t).cast("double")),
                          F.lit(0.0), lambda a, x: a + x), n_tokens).alias("mean_token_len"),
        guard(alpha, n_chars).alias("alpha_ratio"),
        guard(punct, n_chars).alias("punct_ratio"),
        guard(digit, n_chars).alias("digit_ratio"),
        guard(n_stop, n_tokens).alias("stopword_ratio"),
        guard(n_uniq, n_tokens).alias("uniq_token_ratio"),
    )
    return _with_quality_score(feats)


quality_features_expr.__doc__ = _FEATURE_DOC + """
    Executable spec: pure Column expressions, but the four token-derived
    signals are higher-order functions (CodegenFallback, interpreted). The hot
    path is the Arrow twin ``quality_features``; tests cross-validate them.
    """


def _char_class_counts(texts):
    """Vectorized per-row character-class counts over a whole Arrow batch
    (guide §4.2: one numpy pass instead of three JVM regexp_replace passes,
    which profiled as the dominant per-task cost of the text family).

    Exact twin of the expression path's counting idiom
    ``length(text) - length(regexp_replace(text, CLASS, ''))``:

    - the matched classes ([a-zA-Z], [0-9], [a-zA-Z0-9 ]) are pure-ASCII,
      and in valid UTF-8 an ASCII byte never occurs inside a multi-byte
      sequence, so counting class-member BYTES == counting matched CHARS;
    - ``length()`` counts code points == total bytes minus continuation
      bytes (0b10xxxxxx);
    - the [^a-zA-Z0-9 ] count (which DOES match non-ASCII chars) is
      recovered as n_chars - count([a-zA-Z0-9 ]).

    Returns (n_chars, alpha, digit, keep) int64 arrays plus the null mask —
    all exact integers, so downstream double divisions are bit-identical to
    the expression path's."""
    import numpy as np
    import pyarrow as pa

    arr = pa.array(texts, type=pa.string())
    null_mask = np.asarray(arr.is_null())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[: len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))

    def seg_count(mask):
        cs = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
        return cs[offsets[1:]] - cs[offsets[:-1]]

    n_bytes = offsets[1:] - offsets[:-1]
    n_chars = n_bytes - seg_count((data & 0xC0) == 0x80)
    alpha = seg_count(((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122)))
    digit = seg_count((data >= 48) & (data <= 57))
    keep = seg_count(
        ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
        | ((data >= 48) & (data <= 57)) | (data == 32)
    )
    return n_chars, alpha, digit, keep, null_mask


def _token_stats_udf(include_lang: bool = False):
    """Arrow twin of the quality signals: the char-class ratios come from one
    vectorized numpy pass per batch (:func:`_char_class_counts`) and the
    token-derived signals from one pass over the token stream per row — all
    bit-identical to the expression versions (same tokenizer regex, same
    left-to-right double accumulation for mean_token_len, same exact-integer
    counts feeding the same double divisions). ``include_lang`` fuses
    language ID into the same pass (one tokenization, one Arrow boundary,
    for pipelines needing both)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    stop = frozenset(ENGLISH_STOPWORDS)
    profiles = [(lang, frozenset(ws)) for lang, ws in sorted(LANG_PROFILES.items())]
    fields = ["n_chars", "alpha_ratio", "punct_ratio", "digit_ratio",
              "n_tokens", "mean_token_len", "stopword_ratio", "uniq_token_ratio"]
    schema = StructType([StructField(c, DoubleType()) for c in fields])
    if include_lang:
        fields = fields + ["pred_lang"]
        schema = schema.add(StructField("pred_lang", StringType()))

    def batch(texts):
        n_chars, alpha, digit, keep, null_mask = _char_class_counts(texts)
        rows = []
        for i, text in enumerate(texts):
            c = float(n_chars[i])
            if null_mask[i]:
                # expression twin: length(NULL) is NULL; the guarded ratios
                # fall through when(NULL > 0, ...) to 0.0
                char_row = (None, 0.0, 0.0, 0.0)
            elif c > 0:
                char_row = (c, float(alpha[i]) / c,
                            float(n_chars[i] - keep[i]) / c, float(digit[i]) / c)
            else:
                char_row = (0.0, 0.0, 0.0, 0.0)
            toks = [t for t in _re.split(TOKEN_SPLIT_RE, (text or "").lower()) if t]
            if toks:
                n = float(len(toks))
                s = 0.0
                for t in toks:
                    s += float(len(t))
                row = char_row + (
                    n,
                    s / n,
                    float(sum(1 for t in toks if t in stop)) / n,
                    float(len(set(toks))) / n,
                )
            else:
                row = char_row + (0.0, 0.0, 0.0, 0.0)
            if include_lang:
                best_lang, best_s = "und", 0
                for lang, words in profiles:
                    sc = sum(1 for t in toks if t in words)
                    if sc > best_s:  # name-asc iteration ⇒ first max wins ties
                        best_s, best_lang = sc, lang
                row = row + (best_lang,)
            rows.append(row)
        return pd.DataFrame(rows, columns=fields)

    return F.pandas_udf(batch, schema).asNondeterministic()


def quality_features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: Sequence[str] = (),
    include_lang: bool = False,
) -> DataFrame:
    text = _col(text_col)

    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        # asNondeterministic stops Catalyst's CollapseProject/filter-pushdown
        # from DUPLICATING the Arrow pass (a downstream filter on a derived
        # column would otherwise re-evaluate the UDF once for the predicate
        # and again for the projection — 2x the Python cost in the curation
        # hot path). The UDF is pure; the marker only pins one evaluation.
        _token_stats_udf(include_lang).asNondeterministic()(text).alias("_ts"),
    )
    feats = base.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col("_ts.n_chars").alias("n_chars"),
        F.col("_ts.n_tokens").alias("n_tokens"),
        F.col("_ts.mean_token_len").alias("mean_token_len"),
        F.col("_ts.alpha_ratio").alias("alpha_ratio"),
        F.col("_ts.punct_ratio").alias("punct_ratio"),
        F.col("_ts.digit_ratio").alias("digit_ratio"),
        F.col("_ts.stopword_ratio").alias("stopword_ratio"),
        F.col("_ts.uniq_token_ratio").alias("uniq_token_ratio"),
        *([F.col("_ts.pred_lang").alias("pred_lang")] if include_lang else []),
    )
    return _with_quality_score(feats)


quality_features.__doc__ = _FEATURE_DOC + """
    Hot path: ONE Arrow-batched pass computes everything — char-class ratios
    via a vectorized numpy byte-mask pass per batch (r18: the three JVM
    regexp_replace passes profiled as the family's dominant per-task cost,
    ~2.4 s serial per 50k docs vs ~0.02 s vectorized) and the token-derived
    signals via one token-stream pass per row (vs four interpreted
    higher-order functions). Cross-validated against
    ``quality_features_expr`` in tests.
    """


# BPE-ish pre-tokenization: word pieces OR single non-space symbols — the
# GPT-2/tiktoken-style pretoken split, a good proxy for LLM token counts.
BPE_PRETOKEN_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish pretoken count per document (the two
    standard 'how big is this corpus in tokens' estimators)."""
    text = _col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(text, r"\s+"), lambda t: t != "")).alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_PRETOKEN_RE)).alias("bpe_tokens"),
    )


def unigram_logprob(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's OWN
    unigram LM (MLE, no smoothing needed — every scored term is in the
    vocabulary by construction): the standard model-free fluency/quality
    proxy; gibberish, boilerplate, and SEO keyword-stuffing land far from
    the corpus mode, so thresholding mean_logprob is a cheap quality gate.

    Two passes: (1) corpus term frequencies — a vocabulary-sized aggregate
    with map-side partial combine; (2) explode + broadcast-join the term
    log-probs + per-doc mean (one shuffle on the doc key).  At 100 TB the
    vocab table stays broadcastable (natural-language vocabulary, not
    corpus-scale) and the token stream never materializes to the driver.

    Returns (id, n_tokens, mean_logprob)."""
    from vector_store_spark.functions.text import tokens_udf

    toks = docs.select(
        F.col(id_col),
        F.explode(tokens_udf(remove_stopwords=False)(_col(text_col))).alias("term"),
    )
    # the vocab table is broadcast into the scoring join, which already pulls
    # it through the driver — collect it once (one job, no lingering cache)
    # and derive the corpus total driver-side from the same rows. Arrow on
    # both hops: toPandas out, createDataFrame(pandas) back in — a
    # vocabulary-sized numpy log, not a py4j row loop.
    import numpy as np

    tf_pdf = toks.groupBy("term").agg(F.count("*").alias("tf")).toPandas()
    tf_arr = tf_pdf["tf"].to_numpy(dtype="float64")
    tf_pdf["logp"] = np.log(tf_arr) - np.log(tf_arr.sum())
    lp = docs.sparkSession.createDataFrame(
        tf_pdf[["term", "logp"]], "term string, logp double"
    )
    out = (
        toks.join(F.broadcast(lp), "term")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg("logp").alias("mean_logprob"),
        )
    )
    return out


def bigram_logprob(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram CONDITIONAL log-probability ln P(w2|w1) =
    ln c(w1 w2) − ln c(w1 ·) under the corpus's own bigram LM — one order up
    from :func:`unigram_logprob`: fluency now penalizes improbable token
    *transitions* (shuffled/templated text keeps its unigram profile but
    loses its bigram one), the mechanism KenLM-style quality gates rely on.
    MLE without smoothing is total because every scored bigram is in the
    corpus by construction.

    Same two-pass shape as the unigram scorer: (1) bigram + left-context
    frequencies — one aggregate to bigram-vocabulary size (larger than the
    unigram vocab but still vocabulary-scale, not corpus-scale: natural
    language bigram types grow ~Heaps-sublinearly); (2) broadcast the
    log-prob table onto the exploded bigram stream, per-doc mean.

    Returns (id, n_bigrams, mean_logprob); docs with < 2 tokens are absent.
    """
    import numpy as np

    from vector_store_spark.functions.text import tokens_udf

    toked = docs.select(
        F.col(id_col), tokens_udf(remove_stopwords=False)(_col(text_col)).alias("_toks")
    )
    bg = toked.select(
        id_col,
        F.explode(
            F.expr(
                "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
                "(x, i) -> struct(x AS w1, concat(x, ' ', _toks[i + 1]) AS bigram))"
            )
        ).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.bigram").alias("bigram"))
    cnt = bg.groupBy("w1", "bigram").agg(F.count("*").alias("n2")).toPandas()
    n1 = cnt.groupby("w1")["n2"].transform("sum").to_numpy(dtype="float64")
    cnt["logp"] = np.log(cnt["n2"].to_numpy(dtype="float64")) - np.log(n1)
    lp = docs.sparkSession.createDataFrame(
        cnt[["bigram", "logp"]], "bigram string, logp double"
    )
    return (
        bg.join(F.broadcast(lp), "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("logp").alias("mean_logprob"),
        )
    )


def fingerprints(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Document fingerprints: full-content rolling hash (exact-dup key) and
    the min shingle hash (a 1-wide MinHash, the winnowing primitive)."""
    from vector_store_spark.functions.hashing import shingle_hashes_udf
    from vector_store_spark.operators.dedup import normalized_text

    from pyspark.sql.types import LongType
    import pandas as pd

    from vector_store_spark.functions.hashing import _py_poly_hash

    def content_hash(texts):
        return pd.Series([_py_poly_hash(t or "") for t in texts], dtype="int64")

    content_udf = F.pandas_udf(content_hash, LongType()).asNondeterministic()
    hs = shingle_hashes_udf(n)(F.col(text_col))
    return docs.select(
        F.col(id_col),
        content_udf(normalized_text(text_col)).alias("content_hash"),
        F.array_min(hs).alias("min_shingle_hash"),
    )


def repetition_udf():
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: repetitious
    documents are low-quality), one Arrow-batched pass per doc:

    - ``distinct_token_ratio``: |set(tokens)| / |tokens|
    - ``top_2gram_frac``: occurrences of the most frequent 2-gram / all 2-grams
    - ``dup_2gram_frac``: fraction of 2-gram occurrences whose gram appears
      more than once (the "duplicate n-gram fraction" filter)

    Tokenization matches functions.text.tokenize(remove_stopwords=False)
    exactly (oracle parity). Docs with < 2 tokens yield nulls."""
    import re

    import pandas as pd

    from vector_store_spark.functions.text import TOKEN_SPLIT_RE

    pat = re.compile(TOKEN_SPLIT_RE)

    def batch(texts):
        from collections import Counter

        rows = []
        for x in texts:
            toks = [t for t in pat.split((x or "").lower()) if t]
            if len(toks) < 2:
                rows.append((None, None, None))
                continue
            grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            counts = Counter(grams)
            n_g = len(grams)
            rows.append((
                len(set(toks)) / len(toks),
                max(counts.values()) / n_g,
                sum(c for c in counts.values() if c > 1) / n_g,
            ))
        return pd.DataFrame(
            rows, columns=["distinct_token_ratio", "top_2gram_frac", "dup_2gram_frac"]
        )

    from pyspark.sql.types import DoubleType, StructField, StructType

    return F.pandas_udf(
        batch,
        StructType([
            StructField("distinct_token_ratio", DoubleType()),
            StructField("top_2gram_frac", DoubleType()),
            StructField("dup_2gram_frac", DoubleType()),
        ]),
    ).asNondeterministic()


def repetition_features(
    docs: DataFrame, id_col: str, text_col: str, round_digits: int = 6
) -> DataFrame:
    """(id, distinct_token_ratio, top_2gram_frac, dup_2gram_frac) for docs
    with ≥ 2 tokens — a narrow per-row map (no shuffle); filter on these to
    drop repetitious documents before any aggregation."""
    rep = docs.select(
        F.col(id_col), repetition_udf()(F.col(text_col)).alias("_rep")
    ).select(id_col, "_rep.*")
    out = rep.where(F.col("distinct_token_ratio").isNotNull())
    for c in ("distinct_token_ratio", "top_2gram_frac", "dup_2gram_frac"):
        out = out.withColumn(c, F.round(F.col(c), round_digits))
    return out


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size token windows — the
    context-window chunking step every embedding/pretraining pipeline runs
    before encoding. Emits (id, chunk_id, chunk_start, n_chunk_tokens,
    chunk_text); windows advance by ``chunk_tokens - overlap``; the final
    window may be short; empty docs produce no chunks.

    Pure Catalyst: tokenize once, explode an index sequence, slice — a
    narrow per-row flatMap (no shuffle, no Python)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokenize(text_col, remove_stopwords=False)
    n = F.size(toks)
    # chunk starts: 0, step, 2*step, ... < n
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / step) + 1
    ).cast("int")
    out = (
        docs.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                    n_chunks.alias("_nc"))
        .where(F.col("_nc") > 0)
        .select(
            id_col, "_toks", "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
    )
    start = F.col("chunk_id") * step
    out = out.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("_n") - start).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), start + 1, chunk_tokens)
        ).alias("chunk_text"),
    )
    return out


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word n-gram in POSITION
    order, slide a ``window``-gram window, and select each window's minimum
    hash with the RIGHTMOST-occurrence tie rule; the distinct selected
    hashes are the document's fingerprint set. Guarantees: any shared run
    of ≥ window+n−1 tokens between two documents shares ≥ 1 fingerprint,
    and ~2/(window+1) of grams are selected — a bounded-size sketch with a
    matching guarantee, which a bare min-hash lacks.

    One Arrow-batched pass per document (position-ordered grams, numpy
    sliding-min); output is integer-summary form — (id, n_grams,
    n_fingerprints, fp_checksum Σdistinct, fp_min, fp_max) — exact BIGINT
    arithmetic, order-insensitive, so the gate hash-compares it directly.
    Docs with fewer than ``n`` tokens have no grams and are absent; docs
    with fewer grams than ``window`` use one all-gram window."""
    import numpy as np
    import pandas as pd

    from vector_store_spark.functions.hashing import _py_poly_hash, _py_tokens

    if n <= 0 or window <= 0:
        raise ValueError("n and window must be positive")

    def batch(it):
        for pdf in it:
            out = {"id": [], "n_grams": [], "n_fingerprints": [],
                   "fp_checksum": [], "fp_min": [], "fp_max": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = _py_tokens(text)
                if len(toks) < n:
                    continue
                hs = np.array(
                    [_py_poly_hash(" ".join(toks[i:i + n]))
                     for i in range(len(toks) - n + 1)],
                    dtype=np.int64,
                )
                g = len(hs)
                w = min(window, g)
                # rightmost-min encoding: minimising h*2^20 + (2^20-1-j)
                # picks the smallest hash and, among ties, the LARGEST j
                enc = hs * (1 << 20) + ((1 << 20) - 1 - np.arange(g))
                sel = set()
                if g >= w:
                    from numpy.lib.stride_tricks import sliding_window_view

                    mins = sliding_window_view(enc, w).min(axis=1)
                    sel = set((mins >> 20).tolist())
                fps = sorted(sel)
                out["id"].append(did)
                out["n_grams"].append(g)
                out["n_fingerprints"].append(len(fps))
                out["fp_checksum"].append(int(sum(fps)))
                out["fp_min"].append(fps[0])
                out["fp_max"].append(fps[-1])
            yield pd.DataFrame(out)

    id_type = dict(docs.dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        batch,
        f"id {id_type}, n_grams long, n_fingerprints long, "
        "fp_checksum long, fp_min long, fp_max long",
    )


def frequent_ngram_ratio(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Memorization-risk profile (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): per document, the fraction of its
    word n-gram OCCURRENCES whose n-gram appears ≥ ``min_count`` times
    corpus-wide — boilerplate/template passages score high even when no
    whole document duplicates, and are exactly the spans models memorize.

    Plan shape: explode the ordered gram stream (multiplicity kept), one
    map-side-combined aggregate to gram-type counts, filter to the frequent
    set (heavy hitters), and count each doc's hits with a shuffle-hash
    LEFT SEMI join — the frequent-gram set is data-sized, never broadcast.
    Returns (id, n_grams, n_frequent, frequent_ratio)."""
    from vector_store_spark.functions.text import tokens_udf

    toked = docs.select(
        F.col(id_col).alias("id"),
        tokens_udf(remove_stopwords=False)(_col(text_col)).alias("_toks"),
    )
    parts = " , ' ', ".join(f"_toks[i + {j}]" for j in range(n)).join(["", ""])
    gram_expr = (
        f"transform(slice(_toks, 1, greatest(size(_toks) - {n - 1}, 0)), "
        f"(x, i) -> concat({parts}))"
    )
    bg = toked.select("id", F.explode(F.expr(gram_expr)).alias("gram"))
    totals = bg.groupBy("id").agg(F.count("*").cast("long").alias("n_grams"))
    frequent = (
        bg.groupBy("gram").agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("gram")
    )
    hits = (
        bg.join(frequent.hint("SHUFFLE_HASH"), "gram", "left_semi")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_frequent"))
    )
    # totals ⋈ hits is doc-keyed fact-fact (BOTH sides are one row per doc
    # — corpus-row-count-sized at 100 TB), so it must shuffle-hash; Catalyst
    # would happily broadcast the hits side at test SF
    return (
        totals.join(hits.hint("SHUFFLE_HASH"), "id", "left")
        .withColumn("n_frequent", F.coalesce("n_frequent", F.lit(0).cast("long")))
        .withColumn(
            "frequent_ratio", F.col("n_frequent") / F.col("n_grams")
        )
    )


def bpe_pair_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus-wide within-word adjacent symbol-pair counts with the ``</w>``
    end-of-word marker — the seed iteration of BPE training (Sennrich et
    al. '16). One Arrow pass does tokenize + pair counting + PARTIAL
    aggregation per batch (a Counter, emitting one row per distinct pair
    per batch — the map-side combine), so the exchange carries
    pair-vocabulary-sized partials, never the symbol stream. Returns
    (pair, n) unaggregated-ordered; callers sort/limit."""
    import re

    from vector_store_spark.functions.text import TOKEN_SPLIT_RE

    pat_src = TOKEN_SPLIT_RE

    def batch(it):
        from collections import Counter

        import pandas as pd

        pat = re.compile(pat_src)
        for pdf in it:
            c: Counter = Counter()
            for text in pdf[text_col]:
                for tok in pat.split((text or "").lower()):
                    if not tok:
                        continue
                    cs = list(tok) + ["</w>"]
                    for a, b in zip(cs, cs[1:]):
                        c[a + " " + b] += 1
            yield pd.DataFrame(
                {"pair": list(c.keys()),
                 "n": pd.array(list(c.values()), dtype="int64")}
            )

    partial = docs.select(text_col).mapInPandas(batch, "pair string, n long")
    return partial.groupBy("pair").agg(F.sum("n").cast("long").alias("n"))


def tfidf_topterms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the top-``top_n`` terms of
    every document under the corpus's own smoothed IDF
    (``idf = ln((N+1)/(df+1)) + 1``, the sklearn ``smooth_idf`` form) — the
    standard model-free tagging/routing signal a training pipeline attaches
    to documents before mixing (keywords drive topic caps and dedup-cluster
    naming).

    Shape mirrors :func:`unigram_logprob`: (1) one shuffle builds the
    (doc, term) tf frame with map-side combine; (2) the document-frequency
    table is vocabulary-sized (natural-language vocabulary, not
    corpus-scale), so it rides the same collect-once → numpy-log →
    broadcast-join hop as the unigram LM; (3) the per-doc top-n window
    partitions on the doc key over per-doc-distinct-term-sized groups —
    bounded by document length, never corpus-wide. Ranking is over the
    ROUNDED score with a term-asc tie-break so the kept set is
    engine-stable.

    Returns (id, term, tf, tfidf) — ``top_n`` rows per non-empty document.
    """
    import numpy as np

    from vector_store_spark.functions.text import tokens_udf

    n_docs = float(docs.count())
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens_udf(remove_stopwords=False)(_col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    df_pdf = tf.groupBy("term").agg(F.count("*").alias("df")).toPandas()
    df_arr = df_pdf["df"].to_numpy(dtype="float64")
    df_pdf["idf"] = np.log((n_docs + 1.0) / (df_arr + 1.0)) + 1.0
    idf = docs.sparkSession.createDataFrame(
        df_pdf[["term", "idf"]], "term string, idf double"
    )
    scored = tf.join(F.broadcast(idf), "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), round_to)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_n)
        .select(id_col, "term", "tf", "tfidf")
    )
