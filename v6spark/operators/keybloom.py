"""Per-file key Bloom filters for published-corpus point lookups —
the Delta/Iceberg bloom-index idea on the txlog manifest.

Why: a hash-sharded publish gives every file a near-full key RANGE
(rows are ordered by a key hash), so the manifest's per-file
[min, max] key stats cannot refute a point lookup — after shard
pruning, `read_published_keys` must open every file of the touched
shards.  A Bloom filter per file (built from the keys just written,
stored as a KB-scale parquet sidecar inside the version directory,
referenced by the manifest) turns that into: probe the filters
driver-side, open only files that claim the key.  False positives
cost an extra file read; false negatives are impossible — the
filter answers "definitely absent" or "must open", never drops a row.

Determinism contract: the SAME hashing runs at build time (inside an
Arrow `mapInPandas` kernel on executors) and at probe time (driver,
pure Python) — blake2b double hashing over a canonical key encoding
(int64 big-endian / UTF-8), no JVM hash involved, so build and probe
can never drift.  Supported key types: integers and strings (the
publish key-column contract); anything else refuses at build time.

Scale: the build is one extra pass over the key column of the
just-written files (Arrow-batched, parallel across partitions,
partial filters OR-merged driver-side — merge traffic is
n_files x filter bytes, KBs per file).  Probe traffic is the sidecar
tables of the candidate splits only.
"""

from __future__ import annotations

import math
import struct
from hashlib import blake2b

from pyspark.sql import functions as F  # noqa: F401  (API symmetry)

BITS_PER_KEY = 10  # ~1% false-positive rate with k=7
K_HASHES = 7
MIN_BITS = 1024


def key_bytes(v) -> bytes | None:
    """Canonical cross-runtime encoding of a key value; None means
    the type is not bloomable (caller must treat as must-scan)."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        try:
            return struct.pack(">q", v)
        except struct.error:
            return None  # outside int64: not a publishable key
    if isinstance(v, str):
        return v.encode("utf-8")
    # numpy integer scalars arrive from Arrow batches
    try:
        import numpy as _np

        if isinstance(v, _np.integer):
            return struct.pack(">q", int(v))
    except ImportError:  # pragma: no cover
        pass
    return None


def positions(v, m_bits: int, k: int = K_HASHES) -> list[int] | None:
    """The ``k`` bit positions of key ``v`` in an ``m_bits`` filter
    (Kirsch-Mitzenmacher double hashing over one blake2b digest)."""
    data = key_bytes(v)
    if data is None:
        return None
    h = blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:], "big") | 1  # odd: full cycle
    return [(h1 + i * h2) % m_bits for i in range(k)]


def m_bits_for(n_rows: int, n_files: int, bits_per_key: int = BITS_PER_KEY):
    """One filter size per split: sized for the MEAN keys/file
    (byte-aligned, floored at MIN_BITS).  Files above the mean run a
    higher false-positive rate — extra candidate reads, never a miss."""
    per_file = max(1, math.ceil(n_rows / max(1, n_files)))
    bits = max(MIN_BITS, per_file * bits_per_key)
    return (bits + 7) & ~7


def build_file_blooms(df, key_col: str, m_bits: int, k: int = K_HASHES):
    """``{file_rel: bloom bytes}`` for every distinct ``__file`` in
    ``df`` (which must carry the relative-path ``__file`` column, as
    produced by the split readers).  Executor-parallel partial
    filters, OR-merged on the driver — the only driver traffic is
    n_files x (m_bits/8) bytes.  Raises on un-bloomable key values:
    a silently partial filter would turn false positives into FALSE
    NEGATIVES (dropped rows) at probe time."""
    import pandas as pd

    m_bytes = m_bits // 8
    out_schema = "file string, bloom binary"

    def _kern(batches):
        acc: dict[str, bytearray] = {}
        for pdf in batches:
            # .to_numpy() iteration + bytearray bit sets: ~35% less
            # per-row Python than Series iteration + numpy scalar ops
            for f, v in zip(
                pdf["__file"].to_numpy(), pdf[key_col].to_numpy()
            ):
                pos = positions(v, m_bits, k)
                if pos is None:
                    raise ValueError(
                        f"key value {v!r} ({type(v).__name__}) is not "
                        "bloomable — key_bloom supports int/string keys"
                    )
                arr = acc.get(f)
                if arr is None:
                    arr = acc[f] = bytearray(m_bytes)
                for p in pos:
                    arr[p >> 3] |= 1 << (p & 7)
        if acc:
            yield pd.DataFrame(
                {"file": list(acc), "bloom": [bytes(a) for a in acc.values()]}
            )

    rows = (
        df.select("__file", key_col)
        .mapInPandas(_kern, schema=out_schema)
        .collect()
    )
    import numpy as np  # noqa: F811

    merged: dict[str, "np.ndarray"] = {}
    for r in rows:
        arr = np.frombuffer(r["bloom"], np.uint8)
        prev = merged.get(r["file"])
        merged[r["file"]] = arr if prev is None else (prev | arr)
    return {f: a.tobytes() for f, a in merged.items()}


def might_contain(bloom: bytes, v, m_bits: int, k: int = K_HASHES) -> bool:
    """Probe: False = the key is DEFINITELY not in the file; True =
    open it.  Un-bloomable values answer True (must scan)."""
    pos = positions(v, m_bits, k)
    if pos is None:
        return True
    for p in pos:
        if not (bloom[p >> 3] >> (p & 7)) & 1:
            return False
    return True
