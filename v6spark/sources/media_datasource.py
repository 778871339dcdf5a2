"""``spark.read.format("mediadir")`` — media-directory ingest as a
Python DataSource V2 connector.

The raw edge of the multimodal tier: a directory tree of media files
becomes the engine's canonical media frame

    media_id long, kind string, payload binary, uri string, meta string

with kinds inferred from MAGIC BYTES (the first KB — never trust
extensions on a crawl corpus) via the same ``sniff_format`` the
decode operators use, so a file the connector labels "image" is a
file ``decode_media`` will accept.

Scale shape:
- The driver plans partitions by LISTING files only (names + sizes,
  no payload reads) and greedy-balancing them into byte-even bins —
  one oversized video cannot serialize a whole partition of images
  behind it.
- ``kind``/``uri`` pruning is OPT-IN via ``.option("pushdown",
  "true")``: executors sniff the first KB and skip payload reads
  for excluded kinds, and uri filters skip at the listing.  It is
  not on by default because PySpark may serve MULTIPLE scans of one
  loaded DataFrame with a single pickled reader (measured: a union
  of an image-filtered and an audio-filtered branch executed every
  partition with the audio branch's reader, returning zero rows) —
  with pruning off the reader is stateless and any scan's reader is
  interchangeable; with it on, reuse the loaded frame in ONE branch
  only.  Filters are ALWAYS yielded back to Spark either way, so a
  wrongly-pruned scan can lose rows but never emit wrong ones —
  and the default never prunes.
- ``media_id`` is a content-independent keyed hash of the
  RELATIVE path — stable across reruns, mounts, and listing order.

GIF files are "video" when animated (frame count from the block
walk — no LZW decode), else "image".  SRT/WebVTT subtitle files
ingest as kind "caption" — the text half of a video-text pair,
consumed by ``media_metadata.caption_table`` /
``align_captions_to_frames``.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)

MEDIA_SCHEMA = "media_id long, kind string, payload binary, uri string, meta string"

_KIND = {
    "pnm": "image", "bmp": "image", "png": "image", "jpeg": "image",
    "wav": "audio", "mp3": "audio",
    "mp4": "video", "webm": "video", "avi": "video",
    "srt": "caption", "vtt": "caption",
}


def media_id_for(rel_path: str) -> int:
    """Stable signed-int64 id from the relative path (content- and
    listing-order-independent)."""
    h = int.from_bytes(
        hashlib.sha256(rel_path.encode()).digest()[:8], "big"
    )
    return h - (1 << 64) if h >= 1 << 63 else h


def sniff_kind(head: bytes) -> str | None:
    """Media kind from the leading bytes; None when unrecognized."""
    from v6spark.operators.multimodal import sniff_format

    fmt = sniff_format(head)
    if fmt == "gif":
        return None  # decided by frame count, needs the full payload
    return _KIND.get(fmt)


class _FileBin(InputPartition):
    def __init__(self, files: list):
        self.files = files  # [(rel_path, size)]


class MediaDirReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("mediadir source requires a path: .load('/dir')")
        self.n_partitions = int(options.get("n_partitions", "8"))
        self.do_pushdown = str(options.get("pushdown", "false")).lower() == "true"
        self.pushed_kinds: set | None = None
        self.pushed_uris: set | None = None

    def pushFilters(self, filters):
        """ADVISORY pruning, opt-in (module docstring has the whole
        story): every filter is ALWAYS yielded back so Spark
        re-applies it post-scan; when ``pushdown=true`` the kind/uri
        sets additionally skip payload reads, unioned across calls
        (a consumed-and-intersected design measurably lost rows when
        one pickled reader served two differently-filtered scans).
        """
        if not self.do_pushdown:
            yield from filters
            return

        def widen(current: set | None, accepted: set) -> set:
            return accepted if current is None else current | accepted

        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "kind" and isinstance(f, EqualTo):
                self.pushed_kinds = widen(self.pushed_kinds, {f.value})
            elif col == "kind" and isinstance(f, In):
                self.pushed_kinds = widen(self.pushed_kinds, set(f.value))
            elif col == "uri" and isinstance(f, EqualTo):
                self.pushed_uris = widen(self.pushed_uris, {f.value})
            elif col == "uri" and isinstance(f, In):
                self.pushed_uris = widen(self.pushed_uris, set(f.value))
            yield f

    def _listing(self) -> list:
        out = []
        for dirpath, _dirs, names in sorted(os.walk(self.root)):
            for name in sorted(names):
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.root)
                if self.pushed_uris is not None and rel not in self.pushed_uris:
                    continue
                out.append((rel, os.path.getsize(full)))
        return out

    def partitions(self):
        files = self._listing()
        n = max(1, min(self.n_partitions, len(files) or 1))
        bins: list[list] = [[] for _ in range(n)]
        loads = [0] * n
        # greedy byte-balanced binning: biggest file to lightest bin
        for rel, size in sorted(files, key=lambda fs: (-fs[1], fs[0])):
            i = loads.index(min(loads))
            bins[i].append((rel, size))
            loads[i] += size + 4096  # open/seek overhead floor per file
        # never return zero partitions: pyspark substitutes [None] for
        # an empty list and read(None) would crash — an empty corpus
        # must yield an empty frame
        return [_FileBin(b) for b in bins if b] or [_FileBin([])]

    def read(self, partition: _FileBin):
        want = self.pushed_kinds
        for rel, size in partition.files:
            full = os.path.join(self.root, rel)
            with open(full, "rb") as fh:
                head = fh.read(1024)
                kind = sniff_kind(head)
                if kind is None and head[:6] in (b"GIF87a", b"GIF89a"):
                    payload = head + fh.read()
                    kind = "video" if _gif_animated(payload) else "image"
                    if want is not None and kind not in want:
                        continue
                    yield self._row(rel, kind, payload, size)
                    continue
                if kind is None:
                    continue  # unrecognized file: not media, skip
                if want is not None and kind not in want:
                    continue  # pushdown win: payload never read
                payload = head + fh.read()
            yield self._row(rel, kind, payload, size)

    def _row(self, rel: str, kind: str, payload: bytes, size: int):
        meta = json.dumps({"size": size, "ext": os.path.splitext(rel)[1].lstrip(".")},
                          sort_keys=True)
        return (media_id_for(rel), kind, payload, rel, meta)


def _gif_animated(payload: bytes) -> bool:
    from v6spark.operators.gif import gif_frame_index

    try:
        return len(gif_frame_index(payload)) > 1
    except Exception:
        return False


class MediaDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mediadir"

    def schema(self) -> str:
        return MEDIA_SCHEMA

    def reader(self, schema) -> MediaDirReader:
        return MediaDirReader(self.options)


def register_media_source(spark) -> None:
    from v6spark.sources import register_idempotent

    register_idempotent(spark, MediaDirDataSource)
