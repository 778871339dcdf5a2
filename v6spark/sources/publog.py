"""Publish commit log as a Spark DataSource — batch audit + streaming.

The committed-corpus DML surface (``pipeline.publish_corpus_committed``
/ retract / upsert / compact / evolve) appends versioned manifests to
``<root>/_commits`` (``txlog``).  This module exposes that log to
Spark two ways:

- ``spark.read.format("publog").load(root)`` — the full commit
  history as a DataFrame (version, kind, txn ids, split counts, raw
  manifest JSON): the audit/debug view of a table's lifecycle.
- ``spark.readStream.format("publog").load(root)`` — an UNBOUNDED
  stream of newly committed versions (one row per manifest), the
  Delta-style "table changes" trigger.  Offsets are manifest version
  numbers, so restarts resume exactly where they left off and
  ``readBetweenOffsets`` replays any window deterministically.

Architecture note (the 100 TB shape): the Python source carries ONLY
manifest rows — bytes per version, not per document.  Row-level
change data never flows through the Python reader; consumers compose
:func:`changes_foreach_batch`, which turns each micro-batch of log
rows into ONE :func:`v6spark.pipeline.published_corpus_changes` call
— a proper Catalyst parquet scan over just the manifest-diffed files.
The slow path streams offsets; the fast path stays JVM-side.

Filesystem access is ``pyarrow.fs`` (resolved from the path URI:
local, HDFS, S3) because the stream reader runs driver-side in plain
Python with no JVM handle.  Completeness checking reuses
``txlog._decode`` — torn put-mode manifests are invisible here
exactly as they are to committed readers.

Put-mode caveat (documented, inherent): on a store whose
conditional-put is NOT atomic (no real S3), a manifest that becomes
complete only AFTER a later version was already emitted would be
skipped — the offset has passed it.  On real S3 (atomic put) and in
rename mode (rename is the commit point) this cannot happen.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

from v6spark.txlog import MANIFEST_PREFIX, _decode

LOG_SCHEMA = (
    "version long, kind string, key_col string, txn_id string, "
    "rows_total long, splits string, manifest string"
)

_COMMITS = "_commits"


def _fs_for(path: str):
    """(pyarrow FileSystem, fs-local path) for a root URI/path."""
    from pyarrow import fs as pafs

    if "://" in path or path.startswith("file:"):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


_INTENT_OK_PA: set[str] = set()


def _intent_done(intent_path: str) -> bool:
    """pyarrow twin of ``txlog.intent_committed``: a manifest carrying
    an unresolved multi-table intent is invisible (commit_pair)."""
    if intent_path in _INTENT_OK_PA:
        return True
    fs, local = _fs_for(intent_path)
    try:
        with fs.open_input_stream(f"{local}.committed") as f:
            ok = _decode(f.read()) is not None
    except FileNotFoundError:
        # only not-found means "never sealed"; a transient IO error
        # must raise — False here would hide a COMMITTED pair
        return False
    if ok:
        _INTENT_OK_PA.add(intent_path)
    return ok


def _kind_of(doc: dict) -> str:
    """Manifest kind from its marker keys (newest-operation wins)."""
    if "noop_txn" in doc:
        return "noop_txn"
    if "merged_from" in doc:
        # checked before the DML markers: the adopted temp-branch
        # head carries its last applied verb's marker too
        return "merge"
    if "appended" in doc:
        return "append"
    if "fast_forwarded_from" in doc:
        return "fast_forward"
    if "branched_from" in doc:
        return "branch_seed"
    if "schema_evolution" in doc:
        return "evolve"
    if "compacted_from" in doc:
        return "compact"
    if "resharded_from" in doc:
        return "reshard"
    if "upsert" in doc:
        return "upsert"
    if "retraction" in doc:
        return "retract"
    if "live" in doc or "files" in doc or "manifest_ref" in doc:
        # manifest_ref: a big promotion's file list rides in the
        # offloaded sidecar, leaving neither "live" nor "files" inline
        return "publish"
    return "unknown"


def _scan_log(path: str, after: int, upto: int | None = None) -> list[tuple]:
    """(version, row) for every COMPLETE manifest with ``after <
    version [<= upto]``, sorted.  The version window is applied to the
    FILENAME before any byte of the manifest body is opened — commit
    docs outside it are never parsed, which is what keeps a tailing
    consumer's per-batch cost proportional to the delta, not the
    table's history.  Torn manifests are skipped (same contract as
    committed readers); version gaps are normal (crashed claims)."""
    from pyarrow import fs as pafs

    filesystem, local = _fs_for(path)
    log_dir = f"{local.rstrip('/')}/{_COMMITS}"
    try:
        infos = filesystem.get_file_info(
            pafs.FileSelector(log_dir, recursive=False)
        )
    except FileNotFoundError:
        return []
    out = []
    for info in infos:
        name = info.base_name
        if not name.startswith(MANIFEST_PREFIX):
            continue
        try:
            version = int(name[len(MANIFEST_PREFIX):])
        except ValueError:
            continue
        if version <= after or (upto is not None and version > upto):
            continue
        with filesystem.open_input_stream(info.path) as f:
            doc = _decode(f.read())
        if doc is None:
            continue  # torn write: not committed
        if doc.get("intent") and not _intent_done(doc["intent"]):
            continue  # pending/aborted commit_pair half: invisible
        splits = doc.get("splits") or {}
        txn_ids = doc.get("txn_ids") or []
        out.append((
            version,
            _kind_of(doc),
            doc.get("key_col"),
            txn_ids[-1] if txn_ids else None,
            sum(splits.values()) if splits else None,
            json.dumps(splits, sort_keys=True),
            json.dumps(doc, sort_keys=True),
        ))
    out.sort()
    return out


class PublishLogBatchReader(DataSourceReader):
    """``minVersion``/``maxVersion`` options narrow the FILENAME
    window before any manifest body is opened — an audit query over a
    long-lived table's recent commits parses exactly those commits.
    Options rather than pushFilters: Spark 4.1 caches pushdown-planned
    state on shared relations (see sources/pubcorpus.py), while
    option-keyed windows are relation identity and can never leak
    across queries."""

    def __init__(self, path: str, after: int = -1,
                 upto: int | None = None):
        self.path = path
        self.after = after
        self.upto = upto

    def read(self, partition):
        # the log is manifest-sized (KBs/version): one driver
        # partition is the correct plan, not a limitation
        return iter(_scan_log(self.path, self.after, self.upto))


class PublishLogStreamReader(SimpleDataSourceStreamReader):
    """Offsets are manifest versions: {"version": last_emitted}."""

    def __init__(self, path: str, starting_version: int):
        self.path = path
        self.starting_version = starting_version

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def read(self, start: dict):
        rows = _scan_log(self.path, start["version"])
        if not rows:
            return iter([]), dict(start)
        return iter(rows), {"version": rows[-1][0]}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            r for r in _scan_log(self.path, start["version"])
            if r[0] <= end["version"]
        )


class PublishLogDataSource(DataSource):
    """``format("publog")`` — options: ``path`` (the publish root),
    ``startingVersion`` (stream only; default 0 = from the first
    commit; pass the current version to tail only new commits),
    ``minVersion``/``maxVersion`` (batch only; filename-level window —
    commit docs outside it are never parsed)."""

    @classmethod
    def name(cls) -> str:
        return "publog"

    def schema(self) -> str:
        return LOG_SCHEMA

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "publog needs a path: spark.read.format('publog')"
                ".load(<publish root>)"
            )
        return path

    def reader(self, schema) -> PublishLogBatchReader:
        mn = self.options.get("minversion")
        mx = self.options.get("maxversion")
        return PublishLogBatchReader(
            self._path(),
            after=int(mn) - 1 if mn is not None else -1,
            upto=int(mx) if mx is not None else None,
        )

    def simpleStreamReader(self, schema) -> PublishLogStreamReader:
        return PublishLogStreamReader(
            self._path(), int(self.options.get("startingVersion", 0))
        )


def register_publog_source(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of ``publog``."""
    from v6spark.sources import register_idempotent

    register_idempotent(spark, PublishLogDataSource)


def stream_published_log(spark, path: str, starting_version: int = 0):
    """Unbounded DataFrame of commits to ``path`` after
    ``starting_version`` (one row per committed manifest)."""
    register_publog_source(spark)
    return (
        spark.readStream.format("publog")
        .option("path", path)
        .option("startingVersion", starting_version)
        .load()
    )


def changes_foreach_batch(path: str, handle, key_col: str | None = None):
    """``foreachBatch`` adapter turning the publish-log stream into a
    ROW-LEVEL change stream: each micro-batch of committed versions
    [lo..hi] becomes one net
    :func:`~v6spark.pipeline.published_corpus_changes` frame (scan
    cost proportional to the files those versions touched), passed to
    ``handle(changes_df, batch_id)``.  The first batch from a
    cold start (lo == first commit) delivers the initial snapshot as
    ``insert`` rows.  Batches with no data change (evolve, no-op txn)
    call ``handle(None, batch_id)``.

    Retention contract: versions the stream has not consumed yet must
    be retained — run ``vacuum_published(keep_last=N)`` with N above
    the consumer's maximum lag, or hold a read lease.

    Usage::

        q = (stream_published_log(spark, root, starting_version=cur)
             .writeStream.foreachBatch(changes_foreach_batch(root, apply))
             .option("checkpointLocation", ckpt).start())
    """

    def fn(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from v6spark.pipeline import (
            published_corpus_changes,
            read_published_corpus,
        )

        spark = batch_df.sparkSession
        versions = [
            r["version"] for r in batch_df.select("version").collect()
        ]
        if not versions:
            return
        lo, hi = min(versions), max(versions)
        base = lo - 1
        if lo > 1:
            # the predecessor manifest may be a permanent GAP (an
            # aborted commit_pair half, a crashed claim) or retired by
            # retention.  Diff against the NEAREST retained version
            # BELOW lo — the wider window's net diff is identical for
            # gaps and correctly replays a lost window's deletions (a
            # snapshot-as-inserts fallback here would silently drop
            # them on an already-bootstrapped consumer).  Only when
            # NOTHING below lo survives does the bootstrap-snapshot
            # path apply.
            from v6spark import txlog
            from v6spark.pipeline import _log_dir

            log = _log_dir(path, None)
            if txlog.read_version(spark, log, base) is None:
                base = 0
                for v in sorted(
                    (x for x in txlog.list_versions(spark, log)
                     if x < lo),
                    reverse=True,
                ):
                    if txlog.read_version(spark, log, v) is not None:
                        base = v
                        break
        if lo <= 1 or base == 0:
            snap = read_published_corpus(spark, path, version=hi)
            if snap is None:
                handle(None, batch_id)
                return
            handle(
                snap.select(
                    # same shape as a real change window: the manifest
                    # schema + split + markers (the recovered `shard`
                    # partition column is storage layout, not content)
                    *[c for c in snap.columns if c != "shard"],
                    F.lit("insert").alias("_change_type"),
                    F.lit(hi).cast("long").alias("_commit_version"),
                ),
                batch_id,
            )
            return
        handle(
            published_corpus_changes(
                spark, path, base, hi, key_col=key_col
            ),
            batch_id,
        )

    return fn
