"""PII detection and redaction for training-data curation.

Not a reference feature — part of the large-scale training-pipeline surface
this engine adds on top of the reference's query set (like dedup/quality/
langid): before text reaches a tokenizer, pipelines scan for and strip
personally-identifying strings.  Detection is pure built-in regex
(JVM-side `regexp_count` / `regexp_replace`, whole-stage codegen, no UDF),
so at 100 TB the cost is the parquet scan — embarrassingly parallel
per-row maps with no shuffle.

The patterns are deliberately conservative, format-anchored matchers (the
high-precision tier of a production PII pass); they use only syntax with
identical semantics in Java regex (Spark) and RE2 (DuckDB), so the oracle
re-derives the same matches character-for-character.

Semantics notes (count vs redact):
- Counts are per-pattern and independent: a span that matches two kinds
  (a phone-shaped email local part) counts once under EACH kind in
  ``pii_counts``, while ``pii_redact`` replaces it once — with the first
  (most specific) pattern in ``PII_PATTERNS`` order.  ``pii_total`` is
  therefore an upper bound on distinct PII spans, not an exact span count.
- The phone matcher is word-boundary guarded on both ends (``\\b`` is the
  strongest guard RE2 supports — no lookarounds in DuckDB), so it no longer
  fires inside unbroken digit runs (16-digit account numbers) or grabs a
  4-digit window of a longer final group.  A *dash-separated* longer code
  (``12345-123-456-7890``) can still match its phone-shaped tail: ``-`` is
  a non-word char, so ``\\b`` cannot see across it; excluding that needs
  lookbehind, which RE2 lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: detection order matters for redaction: an email's host can look like a
#: dotted quad and a phone can embed in longer digit runs — redact the most
#: specific shape first so later patterns never match inside a placeholder.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # (\b|\+): a boundary before the first digit, OR a literal '+' (space→'+'
    # is not a \b transition, so plus-prefixed numbers need the alternation);
    # trailing \b rejects a 4-digit window cut out of a longer digit run
    "phone": r"(\b|\+)\d?[ -]?\d{3}[ -]\d{3}[ -]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count_cols(text: Column | str) -> list[tuple[str, Column]]:
    """One match-count Column per PII kind — built-in regexp_count, so the
    scan stays inside whole-stage codegen."""
    t = _col(text)
    return [(kind, F.regexp_count(t, F.lit(pat)))
            for kind, pat in PII_PATTERNS.items()]


def pii_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII profile: (id, n_email, n_phone, n_ipv4, pii_total)."""
    cols = [cnt.alias(f"n_{kind}") for kind, cnt in pii_count_cols(text_col)]
    out = docs.select(F.col(id_col), *cols)
    total = sum((F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0))
    return out.withColumn("pii_total", total)


def pii_redact(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, in PII_PATTERNS
    order (most specific first — see the module note)."""
    t = _col(text)
    for kind, pat in PII_PATTERNS.items():
        t = F.regexp_replace(t, pat, PII_PLACEHOLDERS[kind])
    return t


def pii_count_sql(text_expr: str, kind: str) -> str:
    """DuckDB twin of one pii_count_cols entry."""
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"len(regexp_extract_all({text_expr}, '{pat}'))"


def pii_redact_sql(text_expr: str) -> str:
    """DuckDB twin of pii_redact (same pattern order, global flag)."""
    out = text_expr
    for kind, pat in PII_PATTERNS.items():
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{PII_PLACEHOLDERS[kind]}', 'g')"
    return out
