"""Pure-Python XXH64 — an INDEPENDENT implementation of the public
xxHash64 algorithm (https://github.com/Cyan4973/xxHash — public spec),
parameterized with Spark's default seed 42 so outputs match Spark SQL's
``xxhash64`` over string columns bit-for-bit.

Purpose: the simhash oracle. The driver's DuckDB gate cannot express
Spark's xxhash64 natively, so without this module ``simhash_dedup``
could only be checked by row count, not by value; this module
recomputes each document's simhash from scratch (own tokenizer, own hash,
own bit-vote logic — sharing no code with the Spark operators), letting
the oracle embed independently-derived simhashes as SQL literals and the
gate verify the full pipeline end-to-end. Correctness of THIS module is
itself pinned against Spark in tests/test_pipeline_ops.py
(test_xxh64_matches_spark, test_simhash_py_matches_spark).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31)
             * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_string(s: str, seed: int = SPARK_SEED) -> int:
    """Spark-compatible ``xxhash64(string_col)``: XXH64 over the UTF-8
    bytes, returned as a SIGNED 64-bit value like Spark's LongType."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """Spark-compatible ``xxhash64(long_col)``: the 8-byte little-endian
    fixed-width path (Spark hashes LongType inputs as one 8-byte block,
    equivalent to XXH64 of the value's little-endian bytes)."""
    return _signed(xxh64((value & _M).to_bytes(8, "little"), seed))


def tokens_spark(text: str) -> list[str]:
    """Replicates the Spark operators' tokenizer
    ``split(trim(lower(text)), r"\\s+")`` with Java semantics:
    - ``trim`` strips SPACE characters only (not tabs/newlines),
    - Java regex ``\\s`` is ASCII-only ``[ \\t\\n\\x0b\\f\\r]``,
    - Java ``split`` with limit -1 keeps leading/trailing empty fields
      produced by a leading/trailing separator."""
    import re
    s = text.lower().strip(" ")
    return re.split(r"[ \t\n\x0b\f\r]+", s)


from functools import lru_cache


@lru_cache(maxsize=1 << 20)
def _tok_hash(tok: str) -> int:
    return xxh64(tok.encode("utf-8"))


def simhash64_py(text: str) -> int:
    """Independent recomputation of ``dedup.simhash64`` for one document:
    tokenize, xxhash64 each token occurrence, vote per bit (+1 if set,
    -1 if clear), bit j of the result is 1 iff the vote is positive.
    Returns a signed 64-bit value identical to the Spark column. Token
    hashes are memoized across documents and the per-bit vote runs in
    numpy, so oracle generation stays fast at larger SFs."""
    import numpy as np
    toks = tokens_spark(text)
    hs = np.array([_tok_hash(t) for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
        np.int64)
    sums = (2 * bits - 1).sum(axis=0)
    v = 0
    for j in range(63):
        if sums[j] > 0:
            v |= 1 << j
    if sums[63] > 0:
        v -= 1 << 63
    return v
