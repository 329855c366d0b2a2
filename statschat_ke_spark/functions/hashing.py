"""Pure-Python XXH64 — must agree bit-for-bit with Spark's ``F.xxhash64``.

Spark's ``xxhash64`` expression hashes the UTF-8 bytes of a string with the
standard XXH64 algorithm, seed 42 (org.apache.spark.sql.catalyst.expressions.XXH64).
The single-node oracle (index/oracle.py) needs the same doc_id/term_id values
as the Spark engine so that rank/tie-break comparisons are exact; this module
provides that without any non-baked-in dependency.

Replaces the reference's nondeterministic random 7-digit document id
(/root/reference/statschat/pdf_processing/pdf_to_json.py:452) with
``doc_id = xxhash64(url)`` per SURVEY.md §2.7 F12.

Parity with Spark is asserted in tests/test_hashing.py.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME1) + PRIME4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 over *data*, returned as unsigned 64-bit int."""
    n = len(data)
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        i = 0
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
        i = 0

    h = (h + n) & MASK64

    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8

    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4

    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1

    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """xxhash64 of a string's UTF-8 bytes as a SIGNED int64 — Spark semantics.

    ``xxhash64_str(s) == spark F.xxhash64(lit(s))`` (asserted in tests).
    """
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def to_unsigned(v: int) -> int:
    """Signed int64 → unsigned ordering key (posting lists sort on this)."""
    return v & MASK64
