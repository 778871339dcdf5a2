"""Native-codec adapter seam (operators/codec_adapter.py).

The sandbox has no Pillow/PyAV/ffmpeg, so these tests verify the SEAM
with a deterministic fake codec (tests/fake_codec.py) that implements
the identical hook protocol:

- driver-side routing: each built-in decoder consults the adapter
  exactly when its own honest raise would fire, and never otherwise;
- probe tolerance: a hook failing during the unknown-format probe
  falls through instead of poisoning the row;
- the PRODUCTION mechanism end-to-end: ``$V6SPARK_CODEC_MODULE`` set
  before session launch routes mapInPandas kernels on EXECUTORS
  through the adapter (subprocess, because worker env is frozen at
  JVM start);
- the poison-row policy is unchanged on the adapter path.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from tests import fake_codec
from v6spark.operators import codec_adapter
from v6spark.operators.multimodal import (
    _decoded_or_raw,
    _real_dims,
    decode_image_array,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def with_fake_codec():
    codec_adapter.set_codec(fake_codec)
    yield fake_codec
    codec_adapter.reset_codec()


@pytest.fixture
def without_codec():
    codec_adapter.set_codec(None)
    yield
    codec_adapter.reset_codec()


def test_image_routes_through_adapter(with_fake_codec):
    payload = fake_codec.make_image_payload(5, 4, 3)
    w, h, c, arr = decode_image_array(payload)
    assert (w, h, c) == (5, 4, 3)
    assert arr.shape == (4, 5, 3)
    # dims probe: same payload, headers-only contract still satisfied
    assert _real_dims(payload) == (5, 4, 3)


def test_audio_probe_falls_through_image_hook(with_fake_codec):
    """_real_dims probes decode_image FIRST; on a fake-audio payload
    that hook raises — the probe must fall through to decode_audio,
    not poison the row (the Pillow-fed-a-WAV scenario)."""
    payload = fake_codec.make_audio_payload(16000, 320, 2)
    n_frames, rate, ch = _real_dims(payload)
    assert (n_frames, rate, ch) == (320, 16000, 2)


def test_builtin_formats_never_consult_adapter(with_fake_codec):
    """A PNG must decode via the built-in path even with an adapter
    present — the adapter extends coverage, it never shadows."""
    from v6spark.operators.multimodal import encode_png
    import numpy as np

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    png = encode_png(img)
    w, h, c, arr = decode_image_array(png)
    assert (w, h) == (4, 2)
    assert (arr == img).all()


def test_without_adapter_raises_honestly(without_codec):
    with pytest.raises(NotImplementedError, match="V6SPARK_CODEC_MODULE"):
        decode_image_array(b"mystery-format-payload-xyz")
    with pytest.raises(NotImplementedError, match="V6SPARK_CODEC_MODULE"):
        _real_dims(b"mystery-format-payload-xyz")


def test_video_slice_decodes_to_png_with_adapter(with_fake_codec):
    from v6spark.operators.multimodal import decode_image_array as dia

    out = _decoded_or_raw(b"\x42access-unit-bytes", "mp4")
    # adapter present: PNG pixels (decodable by our own decoder)
    w, h, c, arr = dia(out)
    assert (w, h, c) == (2, 2, 3)
    assert (arr == 0x42).all()


def test_video_slice_passthrough_without_adapter(without_codec):
    sl = b"\x42access-unit-bytes"
    assert _decoded_or_raw(sl, "mp4") == sl


def test_adapter_corrupt_data_errors_propagate(with_fake_codec):
    """Known-domain decode failures keep their real class so on_error
    policies can account for them (here: an empty access unit)."""
    with pytest.raises(ValueError, match="empty access unit"):
        _decoded_or_raw(b"", "mp4")


def test_env_detection_order(monkeypatch):
    codec_adapter.reset_codec()
    monkeypatch.setenv("V6SPARK_CODEC_MODULE", "tests.fake_codec")
    try:
        assert codec_adapter.detect_codec() is fake_codec
        monkeypatch.setenv("V6SPARK_CODEC_MODULE", "tests.no_such_module")
        with pytest.raises(ImportError):
            codec_adapter.detect_codec()
        monkeypatch.delenv("V6SPARK_CODEC_MODULE")
        # no Pillow in the sandbox -> None (built-ins only)
        assert codec_adapter.detect_codec() is None
    finally:
        codec_adapter.reset_codec()


_EXEC_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "@REPO@")
    from pyspark.sql import SparkSession
    from tests import fake_codec
    from v6spark.operators.multimodal import (
        audio_features, decode_media, frame_sample,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (1, "image", bytearray(fake_codec.make_image_payload(8, 6, 3))),
        (2, "audio", bytearray(fake_codec.make_audio_payload(8000, 400, 1))),
        (3, "image", bytearray(b"utterly unknown garbage payload")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")

    # decode_media: adapter probes both fake formats ON THE EXECUTOR;
    # the garbage row exercises the unchanged poison policy
    got = {
        r["media_id"]: (r["format"], r["width"], r["height"], r["n_channels"])
        for r in decode_media(df, on_error="null").collect()
    }
    assert got[1][1:] == (8, 6, 3), got
    assert got[2][1:] == (400, 8000, 1), got
    assert got[3][0].startswith("error:"), got

    # audio_features through the adapter's decode_audio
    feats = audio_features(df.filter("media_id = 2")).collect()
    assert len(feats) == 1
    assert feats[0]["sample_rate"] == 8000
    assert feats[0]["n_frames"] == 400
    assert feats[0]["rms"] > 0.0

    print("EXECUTOR-ADAPTER-OK")
    spark.stop()
    """
).replace("@REPO@", REPO)


def test_executor_side_adapter_via_env(tmp_path):
    """The production mechanism: $V6SPARK_CODEC_MODULE set before the
    session launches; mapInPandas kernels resolve the adapter inside
    the Python WORKERS.  Subprocess because worker env is inherited
    from the JVM at launch — exactly how a real deployment sets it."""
    env = dict(os.environ)
    env["V6SPARK_CODEC_MODULE"] = "tests.fake_codec"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _EXEC_SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "EXECUTOR-ADAPTER-OK" in proc.stdout


def test_extract_features_routes_through_adapter(with_fake_codec, spark):
    from v6spark.operators.multimodal import FEATURE_DIM, extract_features

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x00\xff\x80payload"))],
        "media_id long, kind string, payload binary",
    )
    import os, subprocess, sys, textwrap
    # driver-side seam already proven for other hooks; here drive the
    # executor path via the same env-injection subprocess mechanism
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "@REPO@")
        from pyspark.sql import SparkSession
        from v6spark.operators.multimodal import FEATURE_DIM, extract_features
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        df = spark.createDataFrame(
            [(1, "image", bytearray(b"\\x00\\xffpayload"))],
            "media_id long, kind string, payload binary")
        row = extract_features(df).collect()[0]
        feat = row["feature"]
        assert len(feat) == FEATURE_DIM, len(feat)
        assert abs(feat[0] - (-1.0)) < 1e-6, feat[0]
        assert abs(feat[1] - 1.0) < 1e-6, feat[1]
        assert feat[10] == 0.0  # padded beyond the fake's 8 dims
        print("EMBED-ADAPTER-OK")
        spark.stop()
        """
    ).replace("@REPO@", REPO)
    env = dict(os.environ)
    env["V6SPARK_CODEC_MODULE"] = "tests.fake_codec"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "EMBED-ADAPTER-OK" in proc.stdout


def test_extract_features_without_adapter_raises(without_codec, spark):
    from v6spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"xyz"))],
        "media_id long, kind string, payload binary",
    )
    import pytest as _pytest
    with _pytest.raises(Exception):  # PythonException wrapping the raise
        extract_features(df).collect()


def test_probe_dims_hook_preferred_over_full_decode(with_fake_codec):
    """The metadata pass must use the headers-only probe_dims hook,
    never a full decode, when the codec offers one."""
    calls = []
    orig_img = fake_codec.decode_image
    orig_aud = fake_codec.decode_audio
    try:
        fake_codec.decode_image = lambda p: calls.append("img") or orig_img(p)
        fake_codec.decode_audio = lambda p: calls.append("aud") or orig_aud(p)
        assert _real_dims(fake_codec.make_image_payload(9, 7, 3)) == (9, 7, 3)
        assert _real_dims(fake_codec.make_audio_payload(22050, 99, 1)) == (99, 22050, 1)
        assert calls == []  # full decoders never invoked
    finally:
        fake_codec.decode_image = orig_img
        fake_codec.decode_audio = orig_aud
