"""F9 — CQL quoting + scan-statement construction, mirroring the reference's
own statement tests (db_index_backend.rs:195-377) case for case."""

from vector_store_spark.functions.cql import (
    build_columns_list,
    cql_identifier,
    cql_literal,
    identifier_list,
    is_alternator_keyspace,
    range_scan_query,
    request_query,
)


def test_literal_quoting():
    # lib.rs:94-113: single quotes, ' doubled
    assert cql_literal("v") == "'v'"
    assert cql_literal("it's") == "'it''s'"
    assert cql_literal("it's a \"test\"") == "'it''s a \"test\"'"


def test_identifier_quoting():
    assert cql_identifier("id") == '"id"'
    assert cql_identifier("UserId") == '"UserId"'
    assert cql_identifier('we"ird') == '"we""ird"'


def test_alternator_keyspace_detection():
    # lib.rs:124-131
    assert is_alternator_keyspace("alternator_my-app")
    assert not is_alternator_keyspace("ks")


def test_range_scan_query_quotes_lowercase_identifiers():
    # db_index_backend.rs:201-217
    query = range_scan_query(
        "ks", "tbl", ["embedding"],
        cql_identifier("id"), cql_identifier("id"),
    )
    assert '"embedding"' in query
    assert 'FROM "ks"."tbl"' in query
    assert 'token("id")' in query
    assert "BYPASS CACHE" in query
    assert query.count("?") == 2


def test_range_scan_query_quotes_mixed_case_identifiers():
    # db_index_backend.rs:219-241
    pk_list = identifier_list(["UserId", "CreatedAt"])
    query = range_scan_query(
        "MyKeyspace", "MyTable", ["EmbeddingCol"],
        pk_list, cql_identifier("UserId"),
    )
    assert '"EmbeddingCol"' in query
    assert 'FROM "MyKeyspace"."MyTable"' in query
    assert '"UserId", "CreatedAt"' in query


def test_range_scan_query_quotes_special_character_identifiers():
    # db_index_backend.rs:263-291
    pk_list = identifier_list([":pk", ":sk"])
    query = range_scan_query(
        "my-app", "my-table:v1", ["my-vector"], pk_list, cql_identifier(":pk")
    )
    assert '"my-vector"' in query
    assert 'FROM "my-app"."my-table:v1"' in query
    assert 'token(":pk")' in query


def test_alternator_range_scan_query_basic():
    # db_index_backend.rs:293-323
    pk_list = identifier_list([":pk", ":sk"])
    query = range_scan_query(
        "alternator_my-app", "my-table", ["v"], pk_list, cql_identifier(":pk")
    )
    assert "\":attrs\"['v']" in query
    assert "writetime(\":attrs\"['v'])" in query
    assert 'FROM "alternator_my-app"."my-table"' in query
    assert 'token(":pk")' in query


def test_alternator_range_scan_query_special_attribute_name():
    # db_index_backend.rs:325-341
    pk = cql_identifier(":pk")
    query = range_scan_query("alternator_ks", "tbl", ["my-vector:v1"], pk, pk)
    assert "\":attrs\"['my-vector:v1']" in query
    assert "writetime(\":attrs\"['my-vector:v1'])" in query


def test_alternator_range_scan_query_mixed_case_attribute():
    # db_index_backend.rs:343-358
    pk = cql_identifier("pk")
    query = range_scan_query("alternator_Ks", "Tbl", ["EmbeddingCol"], pk, pk)
    assert "\":attrs\"['EmbeddingCol']" in query
    assert 'FROM "alternator_Ks"."Tbl"' in query


def test_alternator_range_scan_query_attribute_with_quotes():
    # db_index_backend.rs:360-377: ' doubles inside the literal, " stays
    pk = cql_identifier(":pk")
    query = range_scan_query("alternator_ks", "tbl", ["it's a \"test\""], pk, pk)
    assert "\":attrs\"['it''s a \"test\"']" in query
    assert "writetime(\":attrs\"['it''s a \"test\"'])" in query


def test_columns_list_pairs_value_with_writetime():
    # db_index_backend.rs:37-63: every payload column rides with writetime
    cols = build_columns_list("ks", ["a", "B"])
    assert cols == '"a", writetime("a"), "B", writetime("B")'


def test_request_query_full_primary_key_restrictions():
    # db_index_backend.rs:89-115 (the J2 read-back statement)
    query = request_query("ks", "tbl", ["embedding"], ["pk", "ck"])
    assert 'WHERE "pk" = ? AND "ck" = ?' in query
    assert 'FROM "ks"."tbl"' in query
    assert '"embedding", writetime("embedding")' in query


def test_request_query_alternator_uses_attrs_access():
    query = request_query("alternator_ks", "tbl", ["v"], [":pk"])
    assert "\":attrs\"['v'], writetime(\":attrs\"['v'])" in query
    assert 'WHERE ":pk" = ?' in query
