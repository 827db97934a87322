"""Timestamp conversions — SURVEY.md §2.7 F10 (reference timestamp.rs:34-111).

The reference's canonical write-timestamp unit is **100 ns ticks since epoch**
(``Timestamped<T>``, timestamp.rs:13-19) with saturating constructors from
seconds / millis / micros, plus TimeUUID (UUID v1) → timestamp extraction for
index-version ordering (lib.rs:580-590).

Column expressions are exact integer arithmetic; saturation mirrors the
reference's ``saturating_mul`` semantics at i64 bounds.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

I64_MAX = (1 << 63) - 1

TICKS_PER_MICRO = 10
TICKS_PER_MILLI = 10_000
TICKS_PER_SECOND = 10_000_000

# UUID v1 timestamps count 100ns ticks since 1582-10-15; offset to Unix epoch.
GREGORIAN_OFFSET_TICKS = 122_192_928_000_000_000


def _col(c):
    return F.col(c) if isinstance(c, str) else c


def _saturating_ticks(v: Column, factor: int) -> Column:
    limit = I64_MAX // factor
    v = v.cast("long")
    return (
        F.when(v > limit, F.lit(I64_MAX))
        .when(v < -limit, F.lit(-I64_MAX - 1))
        .otherwise(v * factor)
    )


def ticks_from_seconds(c: Column | str) -> Column:
    return _saturating_ticks(_col(c), TICKS_PER_SECOND)


def ticks_from_millis(c: Column | str) -> Column:
    return _saturating_ticks(_col(c), TICKS_PER_MILLI)


def ticks_from_micros(c: Column | str) -> Column:
    return _saturating_ticks(_col(c), TICKS_PER_MICRO)


def ticks_to_timestamp(c: Column | str) -> Column:
    """100ns ticks → TimestampType (µs precision: floor division, matching the
    reference's wire conversion which emits ms/µs)."""
    return F.timestamp_micros((_col(c) / TICKS_PER_MICRO).cast("long"))


def timestamp_to_ticks(c: Column | str) -> Column:
    return F.unix_micros(_col(c)) * TICKS_PER_MICRO


def py_timeuuid_ticks(u: str | _uuid.UUID) -> int:
    """TimeUUID (v1) → 100ns ticks since Unix epoch — the index-version
    ordering key (lib.rs:580-590). Python-side: versions are catalog metadata."""
    u = _uuid.UUID(str(u))
    if u.version != 1:
        raise ValueError(f"not a TimeUUID (version {u.version})")
    return u.time - GREGORIAN_OFFSET_TICKS


def timeuuid_ticks(c: Column | str) -> Column:
    """Column form: extract the v1 timestamp from a canonical UUID string.
    Layout (RFC 4122): time_low(8) - time_mid(4) - [ver]time_high(3)."""
    s = F.replace(_col(c), F.lit("-"), F.lit(""))
    hi = F.conv(F.substring(s, 14, 3), 16, 10).cast("long")
    mid = F.conv(F.substring(s, 9, 4), 16, 10).cast("long")
    low = F.conv(F.substring(s, 1, 8), 16, 10).cast("long")
    ticks = (hi * F.lit(1 << 48) + mid * F.lit(1 << 32) + low)
    return ticks - F.lit(GREGORIAN_OFFSET_TICKS)
