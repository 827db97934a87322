"""Deterministic hashing primitives for dedup/fingerprinting, with DuckDB SQL
twins for oracle parity.

Everything is exact 64-bit integer arithmetic (no engine-specific hash
functions): a polynomial rolling hash over characters (mod P = 2³¹−1, so
``h·31 + c`` never overflows int64), and the classic universal-hash family
``(a·x + b) mod P`` for MinHash. The same constants are emitted into oracle
SQL, so Spark and DuckDB agree bit-for-bit.

At 100 TB the polynomial hash stays the right tool: it is computed inside
whole-stage codegen per token (no Python), and unlike xxhash64 it is portable
across engines for validation. Swap in ``F.xxhash64`` via ``fast=True`` knobs
when cross-engine checkability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
POLY_MULT = 31


def poly_hash(s: Column | str) -> Column:
    """Polynomial rolling hash of a string: h = Σ h·31 + ascii(c) (mod 2³¹−1).
    Runs as a Catalyst ``aggregate`` over the character array — JVM-side."""
    col = F.col(s) if isinstance(s, str) else s
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_MULT + F.ascii(c)) % F.lit(P31),
    )


def poly_hash_sql(expr: str) -> str:
    """The identical hash in DuckDB (list_reduce seeds with the first element,
    so prepend a zero-char sentinel... simpler: fold via list_aggregate is not
    ordered — use list_reduce over codes with explicit seed emulation)."""
    # DuckDB list_reduce(list, lambda(acc, x)) uses the first element as seed;
    # prepend 0 so the fold matches Spark's zero-seeded aggregate.
    codes = f"list_prepend(CAST(0 AS BIGINT), list_transform(string_split({expr}, ''), c -> CAST(ord(c) AS BIGINT)))"
    return f"list_reduce({codes}, (acc, c) -> (acc * {POLY_MULT} + c) % {P31})"


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family — same values
    emitted into oracle SQL."""
    return [((2 * j + 1) * 104_729 % P31, (j * 7_919 + 1) % P31) for j in range(num_hashes)]


def minhash_expr(hash_set: Column, a: int, b: int) -> Column:
    """min over the set of (a·x + b) mod P. ``hash_set`` is array<long> of
    element hashes."""
    return F.array_min(F.transform(hash_set, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(P31)))


def minhash_sql(hash_set_expr: str, a: int, b: int) -> str:
    return f"list_min(list_transform({hash_set_expr}, x -> ({a} * x + {b}) % {P31}))"


SIMHASH_BITS = 30  # poly_hash yields 31 usable bits; use 30 for clean banding


def simhash_expr(token_hashes: Column) -> Column:
    """SimHash over an array of element hashes (weights = occurrence counts are
    implicit: duplicate tokens appear multiple times in the array). For each
    bit i: sum ±1 over elements by bit value; simhash bit = 1 iff sum > 0."""
    def vote(i: int):
        # NB: a `i=i` default param would change the lambda's arity and break
        # Spark's higher-order-function binding — close over i instead
        return lambda acc, x: acc + F.when(F.shiftright(x, i) % 2 == 1, 1).otherwise(-1)

    bit_votes = [
        F.aggregate(token_hashes, F.lit(0).cast("long"), vote(i)) for i in range(SIMHASH_BITS)
    ]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_sql(token_hashes_expr: str) -> str:
    terms = []
    for i in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform({token_hashes_expr}, "
            f"x -> CASE WHEN (x >> {i}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Arrow-batched twins of the Column-expression hashes.
#
# Catalyst higher-order functions (transform/aggregate) are CodegenFallback —
# evaluated interpreted, ~6 ms/doc for the shingle pipeline (measured at
# sf0.1). The pandas UDFs below compute the IDENTICAL integers (same oracle
# SQL) ~50× faster and parallelize per Arrow batch, so they are the hot-path
# implementation; the Column versions remain as the executable spec and are
# cross-validated against these in tests.
# ---------------------------------------------------------------------------

import re as _re

from pyspark.sql.types import ArrayType, LongType


def _py_poly_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * POLY_MULT + ord(c)) % P31
    return h


def _py_tokens(text: str) -> list[str]:
    from vector_store_spark.functions.text import ENGLISH_STOPWORDS, TOKEN_SPLIT_RE

    stop = set(ENGLISH_STOPWORDS)
    return [
        t for t in _re.split(TOKEN_SPLIT_RE, (text or "").lower()) if t and t not in stop
    ]


def shingle_hashes_udf(n: int):
    """pandas UDF: text -> distinct word-n-gram poly hashes (array<long>),
    order-preserving first occurrence (matches array_distinct semantics)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def batch(texts):
        out = []
        for text in texts:
            toks = _py_tokens(text)
            grams = (" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
            out.append(list(dict.fromkeys(_py_poly_hash(g) for g in grams)))
        return pd.Series(out)

    return F.pandas_udf(batch, ArrayType(LongType())).asNondeterministic()


def simhash_udf(ngram: int = 1):
    """pandas UDF: text -> SimHash fingerprint (long) over poly-hashes of
    word n-gram features (``ngram=1`` = token features), identical to
    simhash_expr over the same feature hashes. N-gram features (Manku et al.,
    near-duplicate web crawl detection) keep fingerprints discriminative on
    small vocabularies where unigram bit-votes saturate."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    weights = (np.int64(1) << shifts)

    def batch(texts):
        out = np.zeros(len(texts), dtype=np.int64)
        for row, text in enumerate(texts):
            toks = _py_tokens(text)
            if ngram > 1:
                feats = (" ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1))
            else:
                feats = toks
            hs = [_py_poly_hash(f) for f in feats]
            if hs:
                bits = (np.asarray(hs, dtype=np.int64)[:, None] >> shifts) & 1
                votes = (2 * bits - 1).sum(axis=0)
                out[row] = int(weights[votes > 0].sum())
        return pd.Series(out)

    return F.pandas_udf(batch, LongType()).asNondeterministic()


def hamming64_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two integer hashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def hamming64_sql(a: str, b: str) -> str:
    return f"bit_count(xor({a}, {b}))"


# ---------------------------------------------------------------------------
# Driver-side twin of Spark's ``xxhash64`` expression.
#
# Spark's ``F.xxhash64(col)`` is standard XXH64 (Cyan4973/xxHash) with seed 42
# over the value's byte representation — for strings, the UTF-8 bytes
# (org.apache.spark.sql.catalyst.expressions.XxHash64 /
# org.apache.spark.unsafe.hash.XXH64). Persisted FTS layouts partition
# postings by ``pmod(xxhash64(term), num_buckets)``; resolving a query term's
# bucket therefore needs this hash at PLAN time. Computing it here keeps
# ``Bm25Executor`` plan construction free of Spark actions (no scheduler
# round-trip per query term). Bit-exactness with the JVM expression is
# asserted in tests/test_fts.py::test_py_xxhash64_matches_spark across ASCII,
# multi-byte UTF-8, and length edge cases (0..40 bytes covers every tail
# path).
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF  # 64-bit wrap


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 of ``data``, returned as Spark's SIGNED 64-bit long."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            lane = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + lane * _P2) & _M, 31) * _P1) & _M
            lane = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + lane * _P2) & _M, 31) * _P1) & _M
            lane = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + lane * _P2) & _M, 31) * _P1) & _M
            lane = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + lane * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        k1 = (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((lane * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    """``F.xxhash64(string_col)`` twin: XXH64 over the UTF-8 bytes."""
    return xxhash64_bytes(s.encode("utf-8"), seed)


def term_bucket(term: str, num_buckets: int) -> int:
    """``pmod(xxhash64(term), num_buckets)`` — the persisted-postings layout
    key (operators/bm25.write_fts_index), resolved without a Spark job."""
    return xxhash64_str(term) % num_buckets
