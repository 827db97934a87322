"""Text-analysis registry entries: language-ID, quality scoring, token
counting, fingerprinting — each over the documents table with a full DuckDB
re-derivation as the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.functions.hashing import P31, POLY_MULT, poly_hash_sql
from vector_store_spark.functions.text import (
    ENGLISH_STOPWORDS,
    split_ngram_hashes,
    split_ngrams_sql,
    tokenize_sql,
)
from vector_store_spark.operators.textstats import (
    BPE_PRETOKEN_RE,
    LANG_PROFILES,
    fingerprints,
    langid,
    quality_features,
    quality_score_int_expr,
    token_counts,
)
from vector_store_spark.registry import ROUND, load, register

_TOKS_KEEP_STOP = tokenize_sql("text", remove_stopwords=False)


def _profile_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return f"len(list_filter({_TOKS_KEEP_STOP}, t -> list_contains([{words}], t)))"


_LANGS = sorted(LANG_PROFILES)
_SCORES = ", ".join(f"{_profile_sql(lang)} AS s_{lang}" for lang in _LANGS)
_MX = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANGS) + ")"
_PRED = (
    "CASE WHEN " + _MX + " = 0 THEN 'und' "
    + " ".join(f"WHEN s_{lang} = {_MX} THEN '{lang}'" for lang in _LANGS)
    + " END"
)


@register(
    "text_langid_dist",
    f"""
WITH scored AS (SELECT doc_id, {_SCORES} FROM documents),
pred AS (SELECT doc_id, {_PRED} AS pred_lang FROM scored)
SELECT pred_lang, count(*) AS n_docs FROM pred GROUP BY pred_lang
""",
    "Language-ID (function-word profile argmax, name-asc tie-break) distribution",
)
def text_langid_dist(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(langid("text").alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)


@register(
    "text_quality",
    f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS_KEEP_STOP} AS toks,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents
), f AS (
  SELECT doc_id, n_chars,
    CAST(len(toks) AS DOUBLE) AS n_tokens,
    CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks) ELSE 0.0 END AS mean_token_len,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) / n_chars ELSE 0.0 END AS alpha_ratio,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) / n_chars ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[0-9]', '', 'g'))) / n_chars ELSE 0.0 END AS digit_ratio,
    CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> list_contains([{_STOP_LIST}], t))) AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
    CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS uniq_token_ratio
  FROM t
)
SELECT doc_id, n_chars, n_tokens,
       round(mean_token_len, {ROUND}) AS mean_token_len,
       round(alpha_ratio, {ROUND}) AS alpha_ratio,
       round(punct_ratio, {ROUND}) AS punct_ratio,
       round(digit_ratio, {ROUND}) AS digit_ratio,
       round(stopword_ratio, {ROUND}) AS stopword_ratio,
       round(uniq_token_ratio, {ROUND}) AS uniq_token_ratio,
       {quality_score_int_expr(intdiv="//")} AS quality_score
FROM f
""",
    "Per-document quality features + composite score (Gopher/C4-style "
    "signals); the composite is exact-BIGINT arithmetic (see "
    "quality_score_int_expr) so no float-sum rounding boundary can split "
    "the engines",
)
def text_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    feats = quality_features(docs, "doc_id", "text")
    # quality_score is already exact (1e-6 grid by integer construction) —
    # re-rounding it is at best a no-op and at worst the halfway trap again
    ratio_cols = [c for c in feats.columns if c.endswith(("_ratio", "_len"))]
    out = feats
    for c in ratio_cols:
        out = out.withColumn(c, F.round(c, ROUND))
    return out


def quality_score_sql(round_to: int = ROUND) -> str:
    """(doc_id, q) subquery: the text_quality composite score, same
    exact-BIGINT arithmetic as the text_quality oracle above — importable by
    other query families that rank or pick canonicals by quality (e.g. dedup
    keep-best, where a 1-ulp float divergence would flip the kept row).
    ``round_to`` is retained for signature compatibility; the integer form
    is inherently on the 1e-6 grid."""
    return f"""
SELECT doc_id, {quality_score_int_expr(intdiv="//")} AS q
FROM (
  SELECT doc_id, n_chars,
    CAST(len(toks) AS DOUBLE) AS n_tokens,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) / n_chars ELSE 0.0 END AS alpha_ratio,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) / n_chars ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> list_contains([{_STOP_LIST}], t))) AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
    CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS uniq_token_ratio
  FROM (SELECT doc_id, text, {_TOKS_KEEP_STOP} AS toks, CAST(length(text) AS DOUBLE) AS n_chars FROM documents)
)
"""


@register(
    "text_token_counts",
    f"""
SELECT source,
       CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '{BPE_PRETOKEN_RE}'))) AS BIGINT) AS bpe_tokens,
       count(*) AS n_docs
FROM documents GROUP BY source
""",
    "Corpus token counting per source: whitespace + BPE-ish pretoken estimators",
)
def text_token_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    counts = token_counts(docs, "doc_id", "text")
    return (
        counts.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("ws_tokens").alias("ws_tokens"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.count("*").alias("n_docs"),
        )
    )


_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = tokenize_sql("text")
_GRAMS3 = (
    "list_transform(range(1, greatest(len(toks) - 2, 0) + 1), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"
)


@register(
    "text_fingerprint",
    f"""
WITH t AS (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, norm, {_GRAMS3} AS grams FROM t)
SELECT doc_id,
       {poly_hash_sql('norm')} AS content_hash,
       list_min(list_transform(grams, g -> {poly_hash_sql('g')})) AS min_shingle_hash
FROM g
""",
    "Document fingerprints: rolling content hash + min shingle hash (winnowing primitive)",
)
def text_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return fingerprints(docs, "doc_id", "text", n=3)


@register(
    "text_repetition",
    f"""
WITH t AS (
  SELECT doc_id, {_TOKS_KEEP_STOP} AS toks FROM documents
),
g AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS grams
  FROM t WHERE len(toks) >= 2
)
SELECT doc_id,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), {ROUND}) AS distinct_token_ratio,
       round(CAST(list_max(list_transform(list_distinct(grams),
             x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE) / len(grams), {ROUND}) AS top_2gram_frac,
       round(CAST(list_sum(list_transform(grams,
             x -> CASE WHEN len(list_filter(grams, y -> y = x)) > 1 THEN 1 ELSE 0 END)) AS DOUBLE) / len(grams), {ROUND}) AS dup_2gram_frac
FROM g
""",
    "Gopher repetition filters: distinct-token ratio, top-2gram mass, "
    "duplicate-2gram fraction per document (one Arrow pass, no shuffle)",
)
def text_repetition(spark, sf_dir):
    from vector_store_spark.operators.textstats import repetition_features

    docs = load(spark, sf_dir, "documents")
    return repetition_features(docs, "doc_id", "text", round_digits=ROUND)


_CHUNK, _OVERLAP = 32, 8
_STEP = _CHUNK - _OVERLAP


@register(
    "text_chunking",
    f"""
WITH t AS (
  SELECT doc_id, {_TOKS_KEEP_STOP} AS toks FROM documents
),
c AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, CAST(floor((len(toks) - 1) / {_STEP}) AS BIGINT) + 1)) AS chunk_id
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {_STEP} AS BIGINT) AS chunk_start,
       CAST(least({_CHUNK}, n - chunk_id * {_STEP}) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[chunk_id * {_STEP} + 1 : chunk_id * {_STEP} + {_CHUNK}], ' ') AS chunk_text
FROM c
""",
    f"Context-window chunking ({_CHUNK}-token windows, {_OVERLAP} overlap): "
    "tokenize once, explode index sequence, slice - narrow flatMap, no shuffle",
)
def text_chunking(spark, sf_dir):
    from vector_store_spark.operators.textstats import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", _CHUNK, _OVERLAP)


@register(
    "text_length_profile",
    f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       round(quantile_cont(n_chars, 0.5), {ROUND}) AS p50_chars,
       round(quantile_cont(n_chars, 0.95), {ROUND}) AS p95_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source
""",
    "Corpus profiling: per-source doc-length distribution (count/min/p50/p95/"
    "max; exact interpolated percentiles - swap in approx_percentile for the "
    "sketch-based 100 TB variant, same query shape)",
)
def text_length_profile(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.round(F.percentile("n_chars", 0.5), ROUND).alias("p50_chars"),
        F.round(F.percentile("n_chars", 0.95), ROUND).alias("p95_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@register(
    "text_langid_confusion",
    f"""
WITH scored AS (SELECT doc_id, lang, {_SCORES} FROM documents),
pred AS (SELECT doc_id, lang, {_PRED} AS pred_lang FROM scored)
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, pred_lang
""",
    "Language-ID confusion matrix vs the ground-truth lang column: the "
    "evaluation a pipeline runs before trusting a classifier gate",
)
def text_langid_confusion(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", langid("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


@register(
    "text_top_terms",
    f"""
WITH t AS (SELECT doc_id, {_TOKS_KEEP_STOP} AS toks FROM documents),
flat AS (SELECT doc_id, unnest(toks) AS term FROM t),
counts AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM flat GROUP BY term
)
SELECT term, n_occurrences, n_docs
FROM counts ORDER BY n_occurrences DESC, term LIMIT 25
""",
    "Vocabulary head (Zipf top-25 by occurrences, tie-break by term): "
    "explode -> count per term -> TakeOrderedAndProject",
)
def text_top_terms(spark, sf_dir):
    from vector_store_spark.functions.text import tokens_udf

    docs = load(spark, sf_dir, "documents")
    flat = docs.select(
        "doc_id", F.explode(tokens_udf(remove_stopwords=False)(F.col("text"))).alias("term")
    )
    counts = flat.groupBy("term").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        counts.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(25)
        .select("term", "n_occurrences", "n_docs")
    )


# --- PII scan / redaction -------------------------------------------------
# documents are synthetic word-salad with no natural PII, so both sides
# inject the SAME deterministic PII spans first (emails for doc_id%7,
# phones for %11, dotted quads for %13) — the gate then checks the actual
# regex scan/redact machinery end-to-end on nonzero counts.
_PII_INJECT_SQL = (
    "text"
    " || (CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)"
    " || (CASE WHEN doc_id % 11 = 0 THEN ' call +1 555-867-5309' ELSE '' END)"
    " || (CASE WHEN doc_id % 13 = 0 THEN ' from host 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END)"
)


def _pii_inject_col():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(did % 7 == 0,
               F.concat(F.lit(" reach me at user"), did.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(" call +1 555-867-5309")).otherwise(F.lit("")),
        F.when(did % 13 == 0,
               F.concat(F.lit(" from host 192.168."),
                        (did % 256).cast("string"), F.lit(".17"))).otherwise(F.lit("")),
    )


def _pii_scan_sql() -> str:
    from vector_store_spark.operators.pii import pii_count_sql

    return f"""
WITH injected AS (SELECT doc_id, lang, {_PII_INJECT_SQL} AS text FROM documents),
scanned AS (
  SELECT lang,
         {pii_count_sql("text", "email")} AS n_email,
         {pii_count_sql("text", "phone")} AS n_phone,
         {pii_count_sql("text", "ipv4")} AS n_ipv4
  FROM injected
)
SELECT lang,
       CAST(sum(n_email) AS BIGINT) AS emails,
       CAST(sum(n_phone) AS BIGINT) AS phones,
       CAST(sum(n_ipv4) AS BIGINT) AS ipv4s,
       CAST(count_if(n_email + n_phone + n_ipv4 > 0) AS BIGINT) AS docs_with_pii
FROM scanned GROUP BY lang
"""


@register(
    "text_pii_scan",
    _pii_scan_sql(),
    "PII scan (training-pipeline op, beyond the reference): conservative "
    "format-anchored email/phone/IPv4 regexes via built-in regexp_count — "
    "whole-stage codegen, zero UDF, no shuffle until the per-lang rollup",
)
def text_pii_scan(spark, sf_dir):
    from vector_store_spark.operators.pii import pii_count_cols

    # counts inline next to the group key — a per-row map then ONE rollup
    # shuffle; joining a pii_counts profile back on doc_id would be a
    # needless fact-fact self-join
    docs = load(spark, sf_dir, "documents").select(
        "lang", _pii_inject_col().alias("text"))
    scanned = docs.select(
        "lang", *[cnt.alias(f"n_{kind}") for kind, cnt in pii_count_cols("text")])
    return scanned.groupBy("lang").agg(
        F.sum("n_email").cast("long").alias("emails"),
        F.sum("n_phone").cast("long").alias("phones"),
        F.sum("n_ipv4").cast("long").alias("ipv4s"),
        F.count_if(
            F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") > 0
        ).cast("long").alias("docs_with_pii"),
    )


def _pii_redact_sql() -> str:
    from vector_store_spark.operators.pii import pii_redact_sql

    return f"""
WITH injected AS (SELECT doc_id, {_PII_INJECT_SQL} AS text FROM documents WHERE doc_id < 100),
red AS (SELECT doc_id, {pii_redact_sql("text")} AS redacted FROM injected)
SELECT doc_id, redacted FROM red
WHERE redacted LIKE '%<EMAIL>%' OR redacted LIKE '%<PHONE>%' OR redacted LIKE '%<IP>%'
"""


@register(
    "text_pii_redacted",
    _pii_redact_sql(),
    "PII redaction: every match replaced with a typed placeholder "
    "(<EMAIL>/<PHONE>/<IP>), most specific pattern first; the gate "
    "hash-compares the redacted strings themselves",
)
def text_pii_redacted(spark, sf_dir):
    from vector_store_spark.operators.pii import pii_redact

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100).select(
        "doc_id", _pii_inject_col().alias("text"))
    red = docs.select("doc_id", pii_redact("text").alias("redacted"))
    return red.where(
        F.col("redacted").contains("<EMAIL>")
        | F.col("redacted").contains("<PHONE>")
        | F.col("redacted").contains("<IP>")
    )


@register(
    "text_unigram_logprob",
    # the corpus's own unigram LM re-derived in SQL: term freqs -> ln(tf/N)
    # -> per-doc mean; lowest-probability docs are the quality-gate outliers
    f"""
WITH t AS (SELECT doc_id, unnest({_TOKS_KEEP_STOP}) AS term FROM documents),
tf AS (SELECT term, count(*) AS tf FROM t GROUP BY term),
n AS (SELECT sum(tf) AS total FROM tf),
lp AS (SELECT term, ln(CAST(tf AS DOUBLE)) - ln(CAST((SELECT total FROM n) AS DOUBLE)) AS logp FROM tf),
doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, avg(logp) AS mean_logprob
  FROM t JOIN lp USING (term) GROUP BY doc_id
)
SELECT doc_id, n_tokens, round(mean_logprob, {ROUND}) AS mean_logprob
FROM doc ORDER BY round(mean_logprob, {ROUND}), doc_id LIMIT 15
""",
    "Unigram log-probability quality proxy (training-pipeline op, beyond the "
    "reference): score every doc under the corpus's own unigram LM — "
    "vocabulary-sized frequency aggregate, broadcast term-logprob join, "
    "per-doc mean; the 15 lowest-probability docs are the gate outliers",
)
def text_unigram_logprob(spark, sf_dir):
    from vector_store_spark.operators.textstats import unigram_logprob

    docs = load(spark, sf_dir, "documents")
    scored = unigram_logprob(docs, "doc_id", "text")
    scored = scored.withColumn("mean_logprob", F.round("mean_logprob", ROUND))
    return (
        scored.orderBy(F.col("mean_logprob").asc(), F.col("doc_id").asc())
        .limit(15)
        .select("doc_id", "n_tokens", "mean_logprob")
    )


@register(
    "text_bigram_logprob",
    # the corpus's own bigram LM re-derived in SQL: ln P(w2|w1) =
    # ln c(w1 w2) - ln c(w1 .) over the bigram stream, per-doc mean
    f"""
WITH t AS (SELECT doc_id, {_TOKS_KEEP_STOP} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
),
c2 AS (SELECT w1, bigram, count(*) AS n2 FROM bg GROUP BY w1, bigram),
c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
lp AS (
  SELECT bigram, ln(CAST(n2 AS DOUBLE)) - ln(CAST(n1 AS DOUBLE)) AS logp
  FROM c2 JOIN c1 USING (w1)
),
doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, avg(logp) AS mean_logprob
  FROM bg JOIN lp USING (bigram) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, round(mean_logprob, {ROUND}) AS mean_logprob
FROM doc ORDER BY round(mean_logprob, {ROUND}), doc_id LIMIT 15
""",
    "Bigram conditional log-probability quality proxy (KenLM-style fluency "
    "gate, one order above text_unigram_logprob): improbable token "
    "TRANSITIONS sink a doc even when its unigram profile is normal; the 15 "
    "lowest-probability docs are the gate outliers",
)
def text_bigram_logprob(spark, sf_dir):
    from vector_store_spark.operators.textstats import bigram_logprob

    docs = load(spark, sf_dir, "documents")
    scored = bigram_logprob(docs, "doc_id", "text")
    scored = scored.withColumn("mean_logprob", F.round("mean_logprob", ROUND))
    return (
        scored.orderBy(F.col("mean_logprob").asc(), F.col("doc_id").asc())
        .limit(15)
        .select("doc_id", "n_bigrams", "mean_logprob")
    )


_WIN_N, _WIN_W = 3, 4
_WIN_ENC = 1 << 20  # h * 2^20 + (2^20-1-pos): min picks (min h, rightmost pos)
_WIN_GRAM_EXPR = "toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]"
_WIN_GRAM = (
    f"list_transform(range(1, greatest(len(toks) - {_WIN_N - 1}, 0) + 1), "
    f"i -> {poly_hash_sql(_WIN_GRAM_EXPR)})"
)


@register(
    "text_winnowing",
    # winnowing (Schleimer et al., SIGMOD'03): per-window rightmost-min
    # selection re-derived with ONE window frame — the (hash, position)
    # pair is packed into a single BIGINT so `min` implements the tie rule
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, len(toks) - {_WIN_N - 1} AS n_grams,
         unnest({_WIN_GRAM}) AS h,
         unnest(range(0, greatest(len(toks) - {_WIN_N - 1}, 0))) AS pos
  FROM t WHERE len(toks) >= {_WIN_N}
),
enc AS (
  SELECT doc_id, n_grams, pos,
         min(h * {_WIN_ENC} + ({_WIN_ENC} - 1 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING
         ) AS sel_enc
  FROM g
),
sel AS (
  SELECT doc_id, n_grams, sel_enc // {_WIN_ENC} AS fp
  FROM enc WHERE pos <= greatest(n_grams - {_WIN_W}, 0)
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_fingerprints,
       CAST(sum(DISTINCT fp) AS BIGINT) AS fp_checksum,
       min(fp) AS fp_min, max(fp) AS fp_max
FROM sel GROUP BY doc_id, n_grams
""",
    "Winnowing fingerprints (MOSS, Schleimer et al. '03): sliding-window "
    "rightmost-min over position-ordered 3-gram hashes — a bounded sketch "
    "with the shared-run matching guarantee plain min-hash lacks; integer "
    "summary (count / checksum / min / max) hash-compared exactly",
)
def text_winnowing(spark, sf_dir):
    from vector_store_spark.operators.textstats import winnowing_fingerprints

    docs = load(spark, sf_dir, "documents")
    return winnowing_fingerprints(
        docs, "doc_id", "text", n=_WIN_N, window=_WIN_W
    ).withColumnRenamed("id", "doc_id")


_MEM_N, _MEM_MIN = 3, 5


@register(
    "text_ngram_memorization",
    # memorization-risk profile (Lee et al. '22): per-doc fraction of gram
    # OCCURRENCES whose gram is corpus-frequent (>= MIN occurrences) — the
    # boilerplate spans models memorize; top-15 riskiest docs
    f"""
WITH t AS (SELECT doc_id, {_TOKS_KEEP_STOP} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - {_MEM_N - 1}, 0) + 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS gram
  FROM t WHERE len(toks) >= {_MEM_N}
),
freq AS (SELECT gram FROM bg GROUP BY gram HAVING count(*) >= {_MEM_MIN}),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM bg GROUP BY doc_id),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frequent
  FROM bg JOIN freq USING (gram) GROUP BY doc_id
)
SELECT t.doc_id, t.n_grams,
       coalesce(h.n_frequent, 0) AS n_frequent,
       round(CAST(coalesce(h.n_frequent, 0) AS DOUBLE) / t.n_grams, {ROUND}) AS frequent_ratio
FROM totals t LEFT JOIN hits h USING (doc_id)
ORDER BY frequent_ratio DESC, t.doc_id LIMIT 15
""",
    "Memorization-risk profile (Lee et al. '22 dedup rationale): per-doc "
    "fraction of 3-gram occurrences that are corpus-frequent (>= 5x) — "
    "boilerplate/template spans score high without any whole-doc duplicate; "
    "frequent-gram set applied as a shuffle-hash semi-join, never broadcast",
)
def text_ngram_memorization(spark, sf_dir):
    from vector_store_spark.operators.textstats import frequent_ngram_ratio

    docs = load(spark, sf_dir, "documents")
    out = frequent_ngram_ratio(docs, "doc_id", "text", n=_MEM_N, min_count=_MEM_MIN)
    return (
        out.withColumn("frequent_ratio", F.round("frequent_ratio", ROUND))
        .orderBy(F.col("frequent_ratio").desc(), F.col("id").asc())
        .limit(15)
        .select(
            F.col("id").alias("doc_id"), "n_grams", "n_frequent", "frequent_ratio"
        )
    )


@register(
    "text_bpe_merge_pairs",
    # the seed iteration of BPE training (Sennrich et al. '16): within-word
    # adjacent symbol-pair frequencies over the corpus token stream (with
    # the </w> end-of-word marker), highest-count pair = the first merge
    f"""
WITH toks AS (SELECT unnest({_TOKS_KEEP_STOP}) AS tok FROM documents),
ch AS (SELECT list_append(string_split(tok, ''), '</w>') AS cs FROM toks),
pairs AS (
  SELECT unnest(list_transform(range(1, len(cs)), i -> cs[i] || ' ' || cs[i + 1])) AS pair
  FROM ch
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20
""",
    "BPE merge-pair statistics (Sennrich et al. '16 seed iteration): "
    "corpus-wide within-word adjacent symbol-pair counts with the "
    "end-of-word marker — the top pair is the tokenizer's first merge; "
    "one map-side-combined aggregate over the exploded symbol stream",
)
def text_bpe_merge_pairs(spark, sf_dir):
    from vector_store_spark.operators.textstats import bpe_pair_counts

    docs = load(spark, sf_dir, "documents")
    return (
        bpe_pair_counts(docs, "text")
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


@register(
    "text_tfidf_topterms",
    # the corpus's own smoothed IDF (sklearn smooth_idf form) re-derived in
    # SQL; the per-doc top-3 window ranks the ROUNDED score (term-asc ties)
    # so the kept set is engine-stable
    f"""
WITH t AS (SELECT doc_id, unnest({_TOKS_KEEP_STOP}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * (ln(((SELECT n_docs FROM n) + 1.0)
                           / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0),
               {ROUND}) AS tfidf
  FROM tf JOIN df USING (term)
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 3
""",
    "Per-doc TF-IDF keywords (training-pipeline op, beyond the reference): "
    "top-3 terms per document under the corpus's smoothed IDF — tf shuffle "
    "with map-side combine, vocabulary-sized broadcast IDF join, per-doc "
    "window bounded by document length",
)
def text_tfidf_topterms(spark, sf_dir):
    from vector_store_spark.operators.textstats import tfidf_topterms

    docs = load(spark, sf_dir, "documents")
    return tfidf_topterms(docs, "doc_id", "text", top_n=3, round_to=ROUND)


_OVL_N = 3  # overlap n-gram width: 3-grams are discriminative on the corpus
# vocabulary while still giving every source pair a measurable intersection


@register(
    "text_source_overlap",
    # cross-source contamination matrix: Jaccard between the DISTINCT word
    # 3-gram sets of every source pair. The oracle intersects n-gram STRINGS;
    # the engine keys the distinct/join on xxhash64(ngram) so only 64-bit
    # rows shuffle (collision odds ~2^-64 per pair — immaterial to counts).
    f"""
WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
g0 AS (
  SELECT source,
         unnest({split_ngrams_sql("toks", _OVL_N)}) AS ng
  FROM t WHERE len(toks) >= {_OVL_N}
),
g AS (SELECT DISTINCT source, ng FROM g0),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM g a JOIN g b USING (ng)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared,
       round(CAST(n_shared AS DOUBLE) / (x.n_grams + y.n_grams - n_shared), {ROUND}) AS jaccard
FROM inter
JOIN sz x ON x.source = src_a
JOIN sz y ON y.source = src_b
""",
    "Inter-source n-gram contamination matrix: pairwise Jaccard between each "
    "source's distinct word-3-gram set — the corpus-level dual of per-doc "
    "dedup (which sources are copying from each other). Distinct + self-join "
    "shuffle 64-bit n-gram keys (SHUFFLE_HASH, both sides fact-sized); the "
    "per-source size frame is source-count-bounded and broadcast",
)
def text_source_overlap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n = _OVL_N
    toks = docs.select("source", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= n
    )
    grams = toks.select(
        "source",
        F.explode(split_ngram_hashes("toks", n)).alias("h"),
    ).distinct()
    sizes = grams.groupBy("source").agg(F.count("*").cast("long").alias("n_grams"))
    a = grams.select(F.col("source").alias("src_a"), "h")
    b = grams.select(F.col("source").alias("src_b"), "h")
    inter = (
        a.join(b.hint("SHUFFLE_HASH"), "h")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sz_a = sizes.select(F.col("source").alias("src_a"), F.col("n_grams").alias("_na"))
    sz_b = sizes.select(F.col("source").alias("src_b"), F.col("n_grams").alias("_nb"))
    return (
        inter.join(F.broadcast(sz_a), "src_a")
        .join(F.broadcast(sz_b), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n_shared")),
                ROUND,
            ).alias("jaccard"),
        )
    )


_VOCAB_BUCKET = 50  # docs per growth bucket (10 points at sf0.01, 100 at sf0.1)


def _vocab_growth_rollup(spark, sf_dir):
    """(bucket, new_grams) rollup — bucket-count-sized (corpus/50 rows)."""
    docs = load(spark, sf_dir, "documents")
    n = 3
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= n
    )
    grams = toks.select(
        "doc_id",
        F.explode(split_ngram_hashes("toks", n)).alias("h"),
    )
    first = grams.groupBy("h").agg(F.min("doc_id").alias("fd"))
    return (
        first.groupBy((F.col("fd") / _VOCAB_BUCKET).cast("long").alias("bucket"))
        .agg(F.count("*").cast("long").alias("new_grams"))
    )


def _vocab_growth_pipeline(spark, sf_dir, rollup=None):
    """Lazy (bucket, new_grams, vocab_size) frame. Doubles as the
    internal-plan probe the eager-localized registry entry registers: the
    suite-wide plan bans audit THIS plan, since the entry's returned frame is
    a LocalTableScan (tests/test_plans.py)."""
    from vector_store_spark.operators.sampling import global_prefix_offsets

    # the bucket frame grows LINEARLY with the corpus (buckets = docs/50), so
    # an unpartitioned Window.orderBy("bucket") would drag every bucket row
    # through one task at scale. The two-pass bucketed prefix sum caps the
    # largest task at one prefix-bucket range; inclusive cumulative =
    # exclusive offset + own mass.
    if rollup is None:
        rollup = _vocab_growth_rollup(spark, sf_dir)
    pref = global_prefix_offsets(rollup, "bucket", "new_grams", bucket_size=100_000)
    return pref.select(
        "bucket",
        "new_grams",
        (F.col("offset") + F.col("new_grams")).cast("long").alias("vocab_size"),
    )


@register(
    "text_vocab_growth",
    # Heaps-law growth diagnostic over the word-3-GRAM vocabulary (the
    # unigram vocab of this corpus saturates inside the first bucket, so
    # n-grams are the signal-bearing lexicon). First-occurrence is a
    # gram-keyed min aggregate — the engine shuffles xxhash64 keys like the
    # other gram pipelines; the running sum is a window over the
    # BUCKET-count-bounded rollup, never the corpus.
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest({split_ngrams_sql("toks", 3)}) AS ng
  FROM t WHERE len(toks) >= 3
),
first AS (SELECT ng, min(doc_id) AS fd FROM g GROUP BY ng),
b AS (SELECT fd // {_VOCAB_BUCKET} AS bucket, count(*) AS new_grams FROM first GROUP BY 1)
SELECT bucket,
       CAST(new_grams AS BIGINT) AS new_grams,
       CAST(sum(new_grams) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size
FROM b
""",
    "Vocabulary-growth (Heaps-law) curve: never-seen word-3-gram count and "
    "cumulative lexicon size per 50-document bucket in ingestion order — the "
    "corpus diagnostic behind dedup/mixing decisions (a flat tail means new "
    "docs add no lexical novelty)",
    internal_plan_fn=lambda spark, sf_dir: _vocab_growth_pipeline(spark, sf_dir),
)
def text_vocab_growth(spark, sf_dir):
    # The rollup is CACHED first: the prefix pass consumes it twice
    # (histogram collect + offset resolution), and without the cache each
    # pass would replay the full gram pipeline — the cached frame is
    # bucket-count-sized (corpus/50 rows, 2 columns).
    b = _vocab_growth_rollup(spark, sf_dir).cache()
    try:
        result = _vocab_growth_pipeline(spark, sf_dir, rollup=b)
        # bucket-count-sized (corpus/50 rows): materialize eagerly so the
        # rollup cache is released HERE instead of leaking one entry per call
        # (bench reps invoke registry queries repeatedly)
        rows = result.collect()
        schema = result.schema
    finally:
        b.unpersist()
    return spark.createDataFrame(rows, schema)
