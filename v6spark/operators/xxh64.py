"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression exactly.

Why this exists: the committed-corpus shard layout is keyed on
``pmod(xxhash64(lit(seed), key), n_shards)`` (a Catalyst expression),
and the pubcorpus DataSource plans in a plain Python worker with no
JVM — point-lookup shard pruning there needs the SAME hash, computed
locally.  Getting it wrong silently returns empty lookups (the exact
bug class ADVICE r6 found in the probe-frame types), so parity with
Spark is pinned by a property test over ints and strings
(``tests/test_xxh64_parity.py``).

Implementation follows the public xxHash (XXH64) specification by
Yann Collet (github.com/Cyan4973/xxHash, BSD-2; algorithm spec is
public domain).  Spark specifics reproduced here
(spark/sql/catalyst — ``XxHash64`` / ``XXH64``):

- the expression's starting seed is 42;
- multiple arguments CHAIN: ``hash = xxh64(arg_i, seed=hash)``;
- every integral type (byte/short/int/long, and bool as 0/1) hashes
  through ``hashLong`` — one 8-byte lane, equivalent to hashing the
  value's 8-byte two's-complement little-endian encoding;
- strings hash their UTF-8 bytes; float/double hash their IEEE bits
  as int/long (with -0.0 normalized to 0.0).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` (unsigned 64-bit result)."""
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte lane — Spark's ``hashLong`` fast path,
    equal to ``hash_bytes(value.to_bytes(8, 'little', signed), seed)``
    but without building the bytes."""
    seed &= _MASK
    value &= _MASK
    h = (seed + _P5 + 8) & _MASK
    h ^= _round(0, value)
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte lane — Spark's ``hashInt`` path, used for
    boolean/byte/short/int (and float bits).  NOT equal to hashing
    the widened long: int vs bigint columns hash differently, which
    is exactly why the shard probe must match the column's type."""
    seed &= _MASK
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


#: SQL type -> hash lane for spark_xxhash64 typed values
_INT_TYPES = {"boolean", "tinyint", "smallint", "int"}
_LONG_TYPES = {"bigint", "long"}


def spark_xxhash64(typed_values: list, seed: int = 42) -> int:
    """Spark's ``xxhash64(...)`` as a SIGNED 64-bit int: chain the
    per-argument hashes starting from the expression seed (42).
    ``typed_values`` is ``[(value, sql_type), ...]`` — the SQL type
    decides the lane (int-family -> 4-byte ``hashInt``, bigint ->
    8-byte ``hashLong``, string -> UTF-8 bytes, float/double -> IEEE
    bits through their lane), because Spark's hash is type-sensitive.
    NULLs are skipped (Spark leaves the running hash unchanged)."""
    import struct

    h = seed & _MASK
    for v, t in typed_values:
        if v is None:
            continue
        t = (t or "").lower()
        if t in _INT_TYPES:
            h = hash_int(int(v), h)
        elif t in _LONG_TYPES:
            h = hash_long(int(v), h)
        elif t == "string":
            h = hash_bytes(str(v).encode("utf-8"), h)
        elif t == "float":
            if v == 0.0:
                v = 0.0  # normalize -0.0
            h = hash_int(
                int.from_bytes(struct.pack("<f", v), "little"), h
            )
        elif t == "double":
            if v == 0.0:
                v = 0.0
            h = hash_long(
                int.from_bytes(struct.pack("<d", v), "little"), h
            )
        else:
            raise TypeError(f"spark_xxhash64: unsupported SQL type {t!r}")
    return _to_signed(h)


def _lit_type(v: int) -> str:
    """pyspark ``F.lit(int)`` maps to IntegerType inside int32 range,
    LongType beyond — the rule the shard seed literal follows."""
    return "int" if -(1 << 31) <= v < (1 << 31) else "bigint"


def shard_of(key, key_type: str, n_shards: int, seed: int = 0) -> int:
    """The corpus shard of ``key`` — EXACTLY
    ``pmod(xxhash64(lit(seed), key), n_shards)`` as the publish-time
    ``assign_shards`` computes it, with ``key_type`` the manifest's
    recorded SQL type for the key column."""
    h = spark_xxhash64([(seed, _lit_type(seed)), (key, key_type)])
    return h % n_shards  # Python % IS pmod for positive modulus


def shards_of_numpy(values, key_type: str, n_shards: int,
                    seed: int = 0):
    """Vectorized :func:`shard_of` for integer key columns — one
    numpy pass instead of a per-row Python loop (the SQL writer's
    shard routing hashes EVERY row; ~50x).  All ops are uint64
    modular arithmetic, which numpy wraps exactly like the scalar
    path; parity with :func:`shard_of` is property-tested.  Returns
    an int64 array of shards; raises on NULL keys (a published key
    can never be NULL) and falls back unsupported for non-integer
    lanes (strings keep the scalar path — byte-length-dependent)."""
    import numpy as np

    t = (key_type or "").lower()
    if t not in _INT_TYPES and t not in _LONG_TYPES:
        raise TypeError(
            f"shards_of_numpy supports integer key lanes, not {t!r}"
        )
    arr = np.asarray(values)
    if arr.dtype == object:
        if any(v is None for v in values):
            raise ValueError("NULL key: published keys are non-null")
        arr = arr.astype(np.int64)
    # chain start: xxhash64(lit(seed)) from the expression seed 42
    h0 = (
        hash_int(seed, 42) if _lit_type(seed) == "int"
        else hash_long(seed, 42)
    )
    P1, P2, P3, P4 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4))
    u64 = np.uint64

    def rotl(x, r):
        return (x << u64(r)) | (x >> u64(64 - r))

    def fmix(h):
        h = h ^ (h >> u64(33))
        h = h * P2
        h = h ^ (h >> u64(29))
        h = h * P3
        return h ^ (h >> u64(32))

    with np.errstate(over="ignore"):
        if t in _LONG_TYPES:
            v = arr.astype(np.int64).view(np.uint64)
            h = np.full(v.shape, u64((h0 + _P5 + 8) & _MASK))
            acc = rotl(v * P2, 31) * P1          # _round(0, v)
            h = h ^ acc
            h = rotl(h, 27) * P1 + P4
        else:
            v = arr.astype(np.int32).view(np.uint32).astype(np.uint64)
            h = np.full(v.shape, u64((h0 + _P5 + 4) & _MASK))
            h = h ^ (v * P1)
            h = rotl(h, 23) * P2 + np.uint64(_P3)
        h = fmix(h)
    signed = h.view(np.int64)
    return np.mod(signed, np.int64(n_shards))  # numpy % IS pmod
