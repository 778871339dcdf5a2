"""Zarr v3 store reading (r12) — hand-built spec-shaped fixtures.

Fixtures are assembled straight from the public zarr-specs v3.0
document (zarr.json metadata, ``c``-prefixed chunk keys, encode-order
codec lists), NOT from our own writer, so the reader is tested
against the spec rather than against itself.  The blosc frames reuse
the independent greedy-LZ4 builder from the v2 tests.
"""
from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pytest

import v6spark.sources.zarr_store as zs
from tests.test_zarr_bitshuffle import _bitshuf_lz4_frame


def _put_v3(store, name, meta, chunks):
    os.makedirs(os.path.join(store, name), exist_ok=True)
    with open(os.path.join(store, name, "zarr.json"), "w") as fh:
        json.dump({"zarr_format": 3, "node_type": "array", **meta}, fh)
    for key, raw in chunks.items():
        path = os.path.join(store, name, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(raw)


def _meta(shape, chunk_shape, data_type, codecs, **kw):
    return {
        "shape": shape,
        "data_type": data_type,
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": chunk_shape},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": "/"},
        },
        "fill_value": kw.pop("fill_value", 0),
        "codecs": codecs,
        **kw,
    }


BYTES_LE = {"name": "bytes", "configuration": {"endian": "little"}}


def test_v3_raw_bytes_roundtrip(tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(20, dtype="<i4").reshape(4, 5)
    chunks = {}
    for ci in range(2):
        block = np.zeros((2, 5), dtype="<i4")
        block[:] = arr[ci * 2 : ci * 2 + 2]
        chunks[f"c/{ci}/0"] = block.tobytes()
    _put_v3(store, "a", _meta([4, 5], [2, 5], "int32", [BYTES_LE]), chunks)
    assert np.array_equal(zs.read_zarr_array(store, "a"), arr)


def test_v3_gzip_crc32c_and_fill(tmp_path):
    store = str(tmp_path / "s")
    vec = np.array([1.5, -2.25, float("nan"), 8.0], dtype="<f8")
    body = gzip.compress(vec.tobytes())
    body += zs._crc32c(body).to_bytes(4, "little")
    meta = _meta(
        [8], [4], "float64",
        [BYTES_LE, {"name": "gzip", "configuration": {"level": 5}},
         {"name": "crc32c"}],
        fill_value="NaN",
    )
    # second chunk missing -> NaN fill
    _put_v3(store, "f", meta, {"c/0": body})
    got = zs.read_zarr_array(store, "f")
    assert np.array_equal(got[:2], vec[:2])
    assert np.isnan(got[2]) and got[3] == 8.0
    assert np.isnan(got[4:]).all()
    # corrupt checksum must refuse, not mis-decode
    bad = body[:-4] + b"\x00\x00\x00\x01"
    _put_v3(store, "g", meta, {"c/0": bad})
    with pytest.raises(ValueError, match="crc32c"):
        zs.read_zarr_array(store, "g")


def test_v3_blosc_bitshuffle_chunk(tmp_path):
    """v3 blosc codec payloads are blosc1 frames — incl. the r12
    bit-shuffle filter — decoded by the same frame reader as v2."""
    store = str(tmp_path / "s")
    vec = np.arange(-64, 64, dtype="<i2")
    frame = _bitshuf_lz4_frame(vec.tobytes(), 2, True)
    meta = _meta(
        [128], [128], "int16",
        [BYTES_LE, {"name": "blosc",
                    "configuration": {"cname": "lz4", "clevel": 5,
                                      "shuffle": "bitshuffle",
                                      "typesize": 2}}],
    )
    _put_v3(store, "b", meta, {"c/0": frame})
    assert np.array_equal(zs.read_zarr_array(store, "b"), vec)


def test_v3_transpose_and_v2_keys(tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(12, dtype="<i4").reshape(3, 4)
    # encoder stores axes permuted by order=[1, 0]
    stored = np.ascontiguousarray(arr.T)
    meta = _meta(
        [3, 4], [3, 4], "int32",
        [{"name": "transpose", "configuration": {"order": [1, 0]}},
         BYTES_LE],
    )
    meta["chunk_key_encoding"] = {"name": "v2"}
    _put_v3(store, "t", meta, {"0.0": stored.tobytes()})
    assert np.array_equal(zs.read_zarr_array(store, "t"), arr)


def test_v3_vlen_utf8_strings(tmp_path):
    store = str(tmp_path / "s")
    vals = ["chr1", "chr2", "", "chr10"]
    payload = len(vals).to_bytes(4, "little")
    for v in vals:
        b = v.encode()
        payload += len(b).to_bytes(4, "little") + b
    meta = _meta(
        [4], [4], "string", [{"name": "vlen-utf8"}], fill_value=""
    )
    _put_v3(store, "sm", meta, {"c/0": payload})
    got = zs.read_zarr_array(store, "sm")
    assert list(got) == vals


def _shard_blob(inner_bodies, index_location="end", with_crc=True,
                drop=()):
    """Assemble a sharding_indexed blob from already-encoded inner
    chunk bodies; ``drop`` marks inner grid slots as missing."""
    blob = bytearray()
    entries = []
    for i, body in enumerate(inner_bodies):
        if i in drop:
            entries.append((0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF))
            continue
        entries.append((len(blob), len(body)))
        blob += body
    idx = b"".join(
        o.to_bytes(8, "little") + n.to_bytes(8, "little")
        for o, n in entries
    )
    if with_crc:
        idx += zs._crc32c(idx).to_bytes(4, "little")
    if index_location == "end":
        return bytes(blob) + idx
    # start-located index: inner offsets are absolute within the blob
    shifted = []
    for o, n in entries:
        if o == 0xFFFFFFFFFFFFFFFF:
            shifted.append((o, n))
        else:
            shifted.append((o + len(idx), n))
    idx2 = b"".join(
        o.to_bytes(8, "little") + n.to_bytes(8, "little")
        for o, n in shifted
    )
    if with_crc:
        idx2 += zs._crc32c(idx2).to_bytes(4, "little")
    return idx2 + bytes(blob)


def test_v3_sharding_indexed_roundtrip(tmp_path):
    """sharding_indexed shards decode: indexed inner chunks (gzip
    inner pipeline), a missing inner chunk -> fill, index at end with
    crc32c (the zarr-python default) and at start without."""
    store = str(tmp_path / "s")
    arr = np.arange(16, dtype="<i4")
    inner = [
        gzip.compress(arr[i * 4 : (i + 1) * 4].tobytes())
        for i in range(4)
    ]
    shard_cfg = {
        "chunk_shape": [4],
        "codecs": [BYTES_LE,
                   {"name": "gzip", "configuration": {"level": 5}}],
        "index_codecs": [BYTES_LE, {"name": "crc32c"}],
        "index_location": "end",
    }
    meta = _meta(
        [16], [16], "int32",
        [{"name": "sharding_indexed", "configuration": shard_cfg}],
        fill_value=-1,
    )
    _put_v3(store, "sh", meta, {"c/0": _shard_blob(inner)})
    assert np.array_equal(zs.read_zarr_array(store, "sh"), arr)
    # missing inner chunk 2 -> fill slice
    _put_v3(store, "shm", meta, {"c/0": _shard_blob(inner, drop={2})})
    got = zs.read_zarr_array(store, "shm")
    want = arr.copy()
    want[8:12] = -1
    assert np.array_equal(got, want)
    # index at start, no checksum
    cfg2 = dict(shard_cfg)
    cfg2["index_codecs"] = [BYTES_LE]
    cfg2["index_location"] = "start"
    meta2 = _meta(
        [16], [16], "int32",
        [{"name": "sharding_indexed", "configuration": cfg2}],
    )
    _put_v3(store, "sh2", meta2,
            {"c/0": _shard_blob(inner, "start", with_crc=False)})
    assert np.array_equal(zs.read_zarr_array(store, "sh2"), arr)
    # corrupt index checksum refuses
    blob = bytearray(_shard_blob(inner))
    blob[-1] ^= 0xFF
    _put_v3(store, "shc", meta, {"c/0": bytes(blob)})
    with pytest.raises(ValueError, match="index crc32c"):
        zs.read_zarr_array(store, "shc")


def test_v3_honest_refusals(tmp_path):
    store = str(tmp_path / "s")
    base = _meta([4], [4], "int32", [BYTES_LE])
    # a variable-size shard index encoding is unlocatable
    shard = _meta(
        [4], [4], "int32",
        [{"name": "sharding_indexed",
          "configuration": {"chunk_shape": [2],
                            "index_codecs": [BYTES_LE,
                                             {"name": "gzip"}]}}],
    )
    _put_v3(store, "sh", shard, {})
    with pytest.raises(NotImplementedError, match="index_codecs"):
        zs.read_zarr_array(store, "sh")
    odd = dict(base)
    odd["data_type"] = "r16"
    _put_v3(store, "r", odd, {})
    with pytest.raises(NotImplementedError, match="data_type"):
        zs.read_zarr_array(store, "r")
    mism = _meta([4], [4], "int32", [{"name": "vlen-utf8"}])
    _put_v3(store, "m", mism, {})
    with pytest.raises(NotImplementedError, match="vlen-utf8"):
        zs.read_zarr_array(store, "m")


def test_v3_genomics_store_loads_end_to_end(spark, tmp_path):
    """A v3 store with the scikit-allel field layout drives load_zarr
    (distributed mapInPandas read) exactly like a v2 store: numeric
    calldata as v3 blosc/gzip chunks, string variant fields as
    vlen-utf8."""
    store = str(tmp_path / "v3.zarr")

    def put_str(name, vals, chunk):
        n = len(vals)
        chunks = {}
        for ci in range((n + chunk - 1) // chunk):
            part = vals[ci * chunk : (ci + 1) * chunk]
            part = part + [""] * (chunk - len(part))
            payload = len(part).to_bytes(4, "little")
            for v in part:
                b = v.encode()
                payload += len(b).to_bytes(4, "little") + b
            chunks[f"c/{ci}"] = payload
        _put_v3(
            store, name,
            _meta([n], [chunk], "string", [{"name": "vlen-utf8"}],
                  fill_value=""),
            chunks,
        )

    def put_num(name, arr, chunk0, dt):
        shape = list(arr.shape)
        cshape = [chunk0, *shape[1:]]
        grid0 = (shape[0] + chunk0 - 1) // chunk0
        chunks = {}
        for ci in range(grid0):
            block = np.zeros(cshape, dtype=arr.dtype)
            part = arr[ci * chunk0 : (ci + 1) * chunk0]
            block[: part.shape[0]] = part
            key = "c/" + "/".join([str(ci)] + ["0"] * (len(shape) - 1))
            chunks[key] = gzip.compress(block.tobytes())
        _put_v3(
            store, name,
            _meta(shape, cshape, dt,
                  [BYTES_LE, {"name": "gzip",
                              "configuration": {"level": 1}}]),
            chunks,
        )

    n = 5
    put_str("variants/CHROM", ["chr1", "chr1", "chr2", "chr2", "chr2"], 2)
    put_num("variants/POS", np.array([100, 200, 50, 60, 70], "<i4"), 2,
            "int32")
    put_str("variants/REF", ["A", "C", "G", "T", "A"], 2)
    put_str("samples", ["NA1", "NA2"], 2)
    gt = np.arange(n * 2 * 2, dtype="<i1").reshape(n, 2, 2) % 2
    put_num("calldata/GT", gt, 2, "int8")
    variants, calls = zs.load_zarr(spark, store)
    vr = {r["variant_id"]: r for r in variants.collect()}
    assert len(vr) == n
    assert vr["chr1:100:A:"]["chrom"] == "chr1"
    cr = calls.collect()
    assert len(cr) == n * 2
    got_gt = {
        (r["variant_id"], r["sample_id"]): tuple(r["gt"]) for r in cr
    }
    assert got_gt[("chr1:100:A:", "NA1")] == (0, 1)


def test_v3_transpose_vlen_refuses(tmp_path):
    """transpose + vlen-utf8 would need an object-array inverse
    permutation the decode path does not implement — refuse at parse
    time rather than silently mis-place elements."""
    store = str(tmp_path / "s")
    meta = _meta(
        [2, 2], [2, 2], "string",
        [{"name": "transpose", "configuration": {"order": [1, 0]}},
         {"name": "vlen-utf8"}],
    )
    _put_v3(store, "tv", meta, {})
    with pytest.raises(NotImplementedError, match="transpose"):
        zs.read_zarr_array(store, "tv")


def test_v3_nested_sharding_recurses(tmp_path):
    """A shard whose inner codec pipeline is itself sharding_indexed
    (legal per the spec) decodes recursively."""
    store = str(tmp_path / "s")
    arr = np.arange(16, dtype="<i4")
    # inner shards: each holds 2 chunks of 4 elements, raw bytes
    inner_shards = []
    for si in range(2):
        bodies = [
            arr[si * 8 + ci * 4 : si * 8 + (ci + 1) * 4].tobytes()
            for ci in range(2)
        ]
        inner_shards.append(_shard_blob(bodies))
    outer = _shard_blob(inner_shards)
    inner_cfg = {
        "chunk_shape": [4],
        "codecs": [BYTES_LE],
        "index_codecs": [BYTES_LE, {"name": "crc32c"}],
        "index_location": "end",
    }
    outer_cfg = {
        "chunk_shape": [8],
        "codecs": [{"name": "sharding_indexed",
                    "configuration": inner_cfg}],
        "index_codecs": [BYTES_LE, {"name": "crc32c"}],
        "index_location": "end",
    }
    meta = _meta(
        [16], [16], "int32",
        [{"name": "sharding_indexed", "configuration": outer_cfg}],
    )
    _put_v3(store, "nest", meta, {"c/0": outer})
    assert np.array_equal(zs.read_zarr_array(store, "nest"), arr)


def test_v3_shard_roundtrip_property(tmp_path):
    """Property: random 1-D/2-D shard geometries (outer chunk shape,
    inner chunk shape, random missing inner chunks, gzip or raw inner
    pipelines, both index locations) round-trip bit-exact with fill
    in the missing slots."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    counter = [0]

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def check(data):
        rng = np.random.default_rng(counter[0])
        counter[0] += 1
        ndim = data.draw(st.integers(1, 2))
        inner = [data.draw(st.integers(1, 4)) for _ in range(ndim)]
        mults = [data.draw(st.integers(1, 3)) for _ in range(ndim)]
        chunk = [i * m for i, m in zip(inner, mults)]
        arr = rng.integers(-1000, 1000, chunk, dtype=np.int64)
        n_inner = int(np.prod(mults))
        drop = {
            i for i in range(n_inner)
            if data.draw(st.booleans(), label=f"drop{i}")
        }
        use_gzip = data.draw(st.booleans())
        loc = data.draw(st.sampled_from(["end", "start"]))
        bodies = []
        for nd in np.ndindex(*mults):
            sl = tuple(
                slice(g * i, (g + 1) * i) for g, i in zip(nd, inner)
            )
            raw = np.ascontiguousarray(arr[sl]).tobytes()
            bodies.append(gzip.compress(raw) if use_gzip else raw)
        blob = _shard_blob(bodies, loc, with_crc=(loc == "end"),
                           drop=drop)
        cfg = {
            "chunk_shape": inner,
            "codecs": [BYTES_LE] + (
                [{"name": "gzip", "configuration": {"level": 1}}]
                if use_gzip else []
            ),
            "index_codecs": [BYTES_LE] + (
                [{"name": "crc32c"}] if loc == "end" else []
            ),
            "index_location": loc,
        }
        meta = _meta(
            chunk, chunk, "int64",
            [{"name": "sharding_indexed", "configuration": cfg}],
            fill_value=-7,
        )
        store = str(tmp_path / f"p{counter[0]}")
        _put_v3(store, "x", meta, {"c/" + "/".join("0" * ndim): blob})
        got = zs.read_zarr_array(store, "x")
        want = arr.copy()
        for flat, nd in enumerate(np.ndindex(*mults)):
            if flat in drop:
                sl = tuple(
                    slice(g * i, (g + 1) * i)
                    for g, i in zip(nd, inner)
                )
                want[sl] = -7
        assert np.array_equal(got, want)

    check()
