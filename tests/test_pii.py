"""PII scan/redact: crafted strings with known matches, plus the
Java-regex/RE2 agreement the oracle relies on."""

import duckdb
import pytest

from pyspark.sql import functions as F

from vector_store_spark.operators.pii import (
    PII_PATTERNS,
    pii_count_cols,
    pii_count_sql,
    pii_counts,
    pii_redact,
    pii_redact_sql,
)

CASES = [
    # (text, n_email, n_phone, n_ipv4)
    ("mail me at alice.smith+spam@sub.example.co.uk today", 1, 0, 0),
    ("call +1 555-867-5309 or 555 123 4567", 0, 2, 0),
    ("server at 10.0.0.1 and 192.168.255.17", 0, 0, 2),
    ("bob@x.io pinged 127.0.0.1 from +44 123-456-7890", 1, 1, 1),
    ("no pii here, just words and 12345 numbers", 0, 0, 0),
    ("two mails a@b.org c@d.net one line", 2, 0, 0),
    # \b guards: a 3-3-4 window inside a longer final digit group or an
    # unbroken digit run must NOT match (was a partial redact before r9)
    ("acct +44 123-456-78901 ok", 0, 0, 0),
    ("card 1234567890123456 on file", 0, 0, 0),
    ("id 555-123-45678 here", 0, 0, 0),
    # documented RE2 limitation: \b cannot see across '-', so the
    # phone-shaped tail of a longer dash-separated code still matches
    ("ext 12345-123-456-7890", 0, 1, 0),
]


def test_pii_counts_known_strings(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    rows = {r["id"]: r for r in pii_counts(df, "id", "text").collect()}
    for i, (_, ne, np_, ni) in enumerate(CASES):
        assert rows[i]["n_email"] == ne, CASES[i]
        assert rows[i]["n_phone"] == np_, CASES[i]
        assert rows[i]["n_ipv4"] == ni, CASES[i]
        assert rows[i]["pii_total"] == ne + np_ + ni


def test_pii_redact_replaces_every_match(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    red = df.select("id", pii_redact("text").alias("r"))
    out = pii_counts(red, "id", "r")
    assert out.where(F.col("pii_total") > 0).count() == 0
    joined = {r["id"]: r["r"] for r in red.collect()}
    assert "<EMAIL>" in joined[0]
    assert joined[1].count("<PHONE>") == 2
    assert joined[2].count("<IP>") == 2
    assert joined[4] == CASES[4][0]  # clean text untouched


@pytest.mark.parametrize("kind", sorted(PII_PATTERNS))
def test_spark_duckdb_regex_agreement(spark, kind):
    """The oracle contract: Java regex (Spark) and RE2 (DuckDB) must count
    and redact identically on every crafted case."""
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    spark_counts = {
        r["id"]: r[f"n_{kind}"] for r in pii_counts(df, "id", "text").collect()
    }
    for i, (t, *_) in enumerate(CASES):
        duck = con.sql(
            f"SELECT {pii_count_sql('t', kind)} FROM (SELECT ? AS t)", params=[t]
        ).fetchone()[0]
        assert duck == spark_counts[i], (kind, t)


def test_spark_duckdb_redact_agreement(spark):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    spark_red = {r["id"]: r["r"]
                 for r in df.select("id", pii_redact("text").alias("r")).collect()}
    for i, (t, *_) in enumerate(CASES):
        duck = con.sql(
            f"SELECT {pii_redact_sql('t')} FROM (SELECT ? AS t)", params=[t]
        ).fetchone()[0]
        assert duck == spark_red[i], t


def test_spark_duckdb_agreement_on_random_strings(spark):
    """Fuzz the oracle contract: 300 deterministic random strings over a
    PII-adjacent alphabet (digits, @, dots, dashes, plus signs) must count
    and redact identically under Java regex and RE2."""
    import random

    rng = random.Random(20260814)
    alphabet = list("abcXYZ0123456789@.-+ ()_%") + ["  ", "..", "@@"]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    out_cols = [cnt.alias(f"n_{kind}") for kind, cnt in pii_count_cols("text")]
    spark_rows = {r["id"]: r for r in
                  df.select("id", *out_cols, pii_redact("text").alias("r")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        row = con.sql(
            f"""SELECT {pii_count_sql('t', 'email')},
                       {pii_count_sql('t', 'phone')},
                       {pii_count_sql('t', 'ipv4')},
                       {pii_redact_sql('t')}
                FROM (SELECT ? AS t)""",
            params=[t],
        ).fetchone()
        sr = spark_rows[i]
        assert (row[0], row[1], row[2]) == (
            sr["n_email"], sr["n_phone"], sr["n_ipv4"]), (i, t)
        assert row[3] == sr["r"], (i, t)
