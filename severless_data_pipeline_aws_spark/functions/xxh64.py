"""Bit-exact pure-Python twin of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(c1, c2, ...)`` is XXH64 with seed 42, folded left
to right: the hash of column *i* becomes the seed for column *i+1*, and
NULL columns are skipped (seed passes through).  Per-type layout
(spark/common/unsafe XXH64.java + sql XxHash64 expression):

* byte/short/int/date  -> ``hash_int``  (4-byte little-endian word)
* long/timestamp       -> ``hash_long`` (8-byte little-endian word)
* string/binary        -> ``hash_bytes`` over UTF-8 bytes
* boolean              -> ``hash_int(1 or 0)``

This module exists so the DuckDB oracle harness can verify the
xxhash64-tier operators (MinHash-LSH, SimHash, hashed decontamination,
count-min) EXACTLY instead of by recall bounds: ``tests/oracle.py``
registers :func:`spark_xxhash64_str` / ``_long`` as DuckDB Python UDFs,
and :mod:`.xxh64_sql` emits the same arithmetic as pure single-statement
DuckDB SQL for the driver's vanilla connection.  Validated bit-for-bit
against ``F.xxhash64`` in ``tests/test_xxh64.py``.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _u64(v: int) -> int:
    return v & _M


def _signed(v: int) -> int:
    v &= _M
    return v - (1 << 64) if v >= (1 << 63) else v


def hash_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashLong — Spark's path for LONG/TIMESTAMP columns."""
    h = (_u64(seed) + P5 + 8) & _M
    h ^= (_rotl((_u64(value) * P2) & _M, 31) * P1) & _M
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _signed(_fmix(h))


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashInt — Spark's path for INT/SHORT/BYTE/DATE/BOOLEAN."""
    h = (_u64(seed) + P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _signed(_fmix(h))


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64.hashUnsafeBytes — Spark's path for STRING/BINARY columns."""
    length = len(data)
    end = length
    off = 0
    seed = _u64(seed)
    if length >= 32:
        limit = end - 32
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while off <= limit:
            for _ in range(4):
                k = int.from_bytes(data[off : off + 8], "little")
                if _ == 0:
                    v1 = (_rotl((v1 + k * P2) & _M, 31) * P1) & _M
                elif _ == 1:
                    v2 = (_rotl((v2 + k * P2) & _M, 31) * P1) & _M
                elif _ == 2:
                    v3 = (_rotl((v3 + k * P2) & _M, 31) * P1) & _M
                else:
                    v4 = (_rotl((v4 + k * P2) & _M, 31) * P1) & _M
                off += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
            h = (h * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + length) & _M
    while off + 8 <= end:
        k = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((k * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        off += 8
    if off + 4 <= end:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        off += 4
    while off < end:
        h ^= (data[off] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        off += 1
    return _signed(_fmix(h))


def hash_str(s: str, seed: int = SPARK_SEED) -> int:
    return hash_bytes(s.encode("utf-8"), seed)


def xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Fold like Spark's multi-column ``xxhash64``: the running hash is
    the seed of the next column; None (NULL) columns pass the seed
    through unchanged.  str -> UTF-8 bytes, int -> 8-byte long, bytes
    -> raw.  Python ints are hashed as Spark LONGs — pass
    ``("int", v)`` tuples for 4-byte INT columns."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "int":
            h = hash_int(v[1], h)
        elif isinstance(v, bool):
            h = hash_int(1 if v else 0, h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        elif isinstance(v, bytes):
            h = hash_bytes(v, h)
        elif isinstance(v, str):
            h = hash_str(v, h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(v)}")
    return h


# ---------------------------------------------------------------------------
# Murmur3 x86_32 (Spark's F.hash / HashPartitioning hash, seed 42)
# ---------------------------------------------------------------------------

_M32 = (1 << 32) - 1
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix32(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def murmur3_long(value: int, seed: int = SPARK_SEED) -> int:
    """Spark ``Murmur3Hash`` (= ``F.hash``) of a LONG column — the hash
    behind ``repartition(n, col)``'s HashPartitioning, needed to
    replicate partition ids in oracles (e.g. the batch packer's
    per-partition namespaces)."""
    v = value & _M
    low = v & 0xFFFFFFFF
    high = (v >> 32) & 0xFFFFFFFF
    h1 = _mix_h1(seed & _M32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix32(h1 & _M32, 8)
