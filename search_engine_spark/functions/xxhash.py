"""Pure-Python XXH64, bit-compatible with Spark's ``xxhash64`` expression.

Used only by the fixture generator and the single-node oracle so that
``doc_id = xxhash64(repo, path, commit)`` is computable without a JVM;
the engine itself always uses the built-in Spark expression. Parity is
asserted by ``tests/test_hash_parity.py`` against Spark directly.

XXH64 is the public xxHash algorithm (Yann Collet, BSD); Spark chains
multi-column hashes by feeding the previous column's hash in as the
seed, starting from seed 42, and hashes string columns as UTF-8 bytes.
"""

from __future__ import annotations

MASK = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed``; returns unsigned 64-bit int."""
    seed &= MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(*cols: str, seed: int = 42) -> int:
    """Replicates Spark's ``xxhash64(col1, col2, ...)`` over string columns.

    Spark folds left: ``h = seed; for c in cols: h = xxh64(utf8(c), h)``
    and returns the signed 64-bit value.
    """
    h = seed
    for c in cols:
        h = xxh64(c.encode("utf-8"), h)
    return _to_signed(h)


def doc_id_of(repo: str, path: str, commit: str) -> int:
    """The engine's document identity: xxhash64(repo, path, commit).

    Replaces the reference's UUID page ids (`migration/schema.sql:9-17`)
    with a deterministic, sortable, shuffle-friendly BIGINT.
    """
    return spark_xxhash64_str(repo, path, commit)
