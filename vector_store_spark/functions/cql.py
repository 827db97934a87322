"""F9 — CQL identifier/literal quoting and the scan-statement builders.

The reference talks to ScyllaDB over CQL and must quote every user-supplied
name safely (SURVEY.md §2 F9):

- ``CqlLiteral`` (lib.rs:87-113): string constants are single-quoted with
  embedded ``'`` escaped by doubling (``'`` -> ``''``), per the CQL grammar.
- ``CqlIdentifier`` (scylla_cdc, used at lib.rs:116-151): identifiers —
  keyspaces, tables, columns — are ALWAYS double-quoted, preserving case and
  special characters verbatim; the reference's own statement tests pin
  ``"ks"``, ``token("id")`` even for plain lowercase names
  (db_index_backend.rs tests 201-377). Embedded ``"`` doubles.
- Alternator keyspaces (names starting ``alternator_``, lib.rs:115-131) store
  every attribute in one ``map<utf8, blob>`` column ``:attrs``
  (db_index_backend.rs:22-29): column access becomes ``":attrs"['name']``
  with the attribute name as a CQL LITERAL (so ``'`` doubles but ``"`` stays
  verbatim — db_index_backend.rs test 360-377).

The statement builders reproduce ``range_scan_query`` /
``request_query`` (db_index_backend.rs:66-115): the token-range full scan
(S1) every index bootstrap issues, and the primary-key read-back the CDC
consumer issues (J2). In this engine parquet snapshots stand in for the live
cluster, so these strings are the CONNECTOR CONTRACT — what a production
deployment prepares against ScyllaDB — and are pinned by tests exactly like
the reference pins them.
"""

from __future__ import annotations

ALTERNATOR_ATTRS_COLUMN = ":attrs"  # db_index_backend.rs:29
ALTERNATOR_PREFIX = "alternator_"  # lib.rs:124-131


def cql_literal(value: str) -> str:
    """Single-quoted CQL string constant, ``'`` doubled (lib.rs:94-113)."""
    return "'" + str(value).replace("'", "''") + "'"


def cql_identifier(name: str) -> str:
    """Double-quoted CQL identifier, case and special characters preserved,
    ``"`` doubled — the always-quote policy the reference inherits from
    scylla_cdc::CqlIdentifier (pinned at db_index_backend.rs:201-262)."""
    return '"' + str(name).replace('"', '""') + '"'


def is_alternator_keyspace(keyspace: str) -> bool:
    """Alternator keyspaces are name-prefixed (lib.rs:124-131)."""
    return keyspace.startswith(ALTERNATOR_PREFIX)


def _column_access(keyspace: str, column: str) -> str:
    if is_alternator_keyspace(keyspace):
        attrs = cql_identifier(ALTERNATOR_ATTRS_COLUMN)
        return f"{attrs}[{cql_literal(column)}]"
    return cql_identifier(column)


def build_columns_list(keyspace: str, columns: list[str]) -> str:
    """Each payload column is selected alongside its writetime — the LWW
    merge (A5) needs both (db_index_backend.rs:37-63). Alternator columns go
    through the ``:attrs`` map access."""
    parts = []
    for column in columns:
        access = _column_access(keyspace, column)
        parts.append(access)
        parts.append(f"writetime({access})")
    return ", ".join(parts)


def identifier_list(names: list[str]) -> str:
    """Comma-joined quoted identifier list (the pk_list the reference builds
    with itertools::join over CqlIdentifier)."""
    return ", ".join(cql_identifier(n) for n in names)


def range_scan_query(
    keyspace: str,
    table: str,
    columns: list[str],
    primary_key_list: str,
    partition_key_list: str,
) -> str:
    """The token-range full scan statement (db_index_backend.rs:66-87): one
    prepared statement per scan worker, bound with [token_lo, token_hi] — the
    reference shards the ring across workers exactly like this engine shards
    parquet row-groups across tasks. BYPASS CACHE keeps the bulk scan out of
    the row cache (a full-scan politeness the reference ships)."""
    columns_sql = build_columns_list(keyspace, columns)
    return (
        f"\n        SELECT {primary_key_list}, {columns_sql}"
        f"\n        FROM {cql_identifier(keyspace)}.{cql_identifier(table)}"
        f"\n        WHERE"
        f"\n            token({partition_key_list}) >= ?"
        f"\n            AND token({partition_key_list}) <= ?"
        f"\n        BYPASS CACHE\n        "
    )


def request_query(
    keyspace: str,
    table: str,
    columns: list[str],
    primary_key_columns: list[str],
) -> str:
    """The CDC read-back statement (db_index_backend.rs:89-115): after a CDC
    row arrives, the consumer re-reads the current row by full primary key to
    pick up the authoritative value + writetime (J2)."""
    columns_sql = build_columns_list(keyspace, columns)
    restrictions = " AND ".join(
        f"{cql_identifier(c)} = ?" for c in primary_key_columns
    )
    return (
        f"\n            SELECT {columns_sql}"
        f"\n            FROM {cql_identifier(keyspace)}.{cql_identifier(table)}"
        f"\n            WHERE {restrictions}\n            "
    )
