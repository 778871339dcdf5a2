"""``df.write.format("pubcorpus").mode("append")`` — the committed
publish through the SQL front door.

Completes the pubcorpus DataSource's DML story: SQL-side producers
(or anyone without the Python verbs on their path) append to a
published corpus with the SAME commit guarantees as
:func:`v6spark.pipeline.publish_corpus_committed` — data files land
in a nonce-named version-private directory and become visible only
when ONE checksummed manifest commits them, so a crash anywhere
before the manifest leaves every reader at the pre-write version and
an orphan directory the vacuum sweeps.

Semantics (documented, not inferred):

- ``mode("append")`` on an empty root = the initial publish
  (version 1, ``publish``-kind manifest with files/col_stats/
  file_stats sections — pruning and point lookups work on day one);
- ``mode("append")`` on an existing table = an append-only commit:
  the new files JOIN the current file list (one manifest, one commit
  point; the change feed sees pure inserts).  Blind append, Delta
  semantics: key uniqueness is the writer's contract — de-duplicating
  merges are :func:`~v6spark.pipeline.upsert_into_published`'s job;
- ``mode("overwrite")`` is REFUSED: the DML verbs have no
  "replace the table silently" semantics and neither does this
  writer (retract/compact/republish are explicit, audited verbs);
- schema drift vs the current manifest is refused (evolve through
  :func:`~v6spark.pipeline.evolve_published_schema`); shard posture
  (n_shards/seed/key_col) is adopted from the table;
- ``option("txnId", id)``: exactly-once — an id already in the
  manifest's ``txn_ids`` makes the commit an idempotent no-op
  (the staged files orphan; vacuum sweeps), the same contract as the
  DML verbs under streaming epoch replay.

Architecture: executor tasks receive Arrow batches, route each row
to its ``split=<s>/shard=<k>`` directory with the SAME Spark-exact
xxhash64 the publish verbs use (:mod:`v6spark.operators.xxh64` —
parity property-tested), and write one parquet file per (split,
shard) per task.  The driver-side commit then reuses the pipeline's
own pure-pyarrow collectors (``_collect_file_stats`` /
``_collect_col_stats`` / ``_offload_manifest`` with ``spark=None``)
so the manifest sections are bit-compatible by construction, and
commits put-mode style: exclusive-create (``O_EXCL``) of the final
manifest name + the txlog checksum footer — a torn manifest fails
the checksum and is invisible, a lost race recomputes against the
winner's state and claims the next version (the ``_occ_dml``
posture).  Local filesystems only (the Python DataSource commit hook
runs without a JVM; object stores go through the DML verbs).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    WriterCommitMessage,
)

from v6spark.sources.pubcorpus import _read_latest
from v6spark.txlog import MANIFEST_PREFIX, _encode

_COMMITS = "_commits"


def _local_path(root: str) -> str:
    if root.startswith("file:"):
        root = root[len("file:"):]
    if "://" in root:
        raise ValueError(
            "the pubcorpus writer commits without a JVM and supports "
            "local filesystems only — publish to object stores through "
            "the DML verbs (pipeline.publish_corpus_committed)"
        )
    return root


@dataclass
class _TaskFiles(WriterCommitMessage):
    #: (split, shard, rel_path, n_rows) per file this task wrote
    files: tuple = ()


class PublishedCorpusWriter(DataSourceArrowWriter):
    def __init__(self, root: str, spark_schema, *, key_col: str,
                 n_shards: int, seed: int, vdir: str,
                 txn_id: str | None, base_version: int,
                 fail_before_commit: bool = False,
                 fail_mid_manifest: bool = False):
        self.root = _local_path(root)
        self.spark_schema = spark_schema
        self.key_col = key_col
        self.n_shards = n_shards
        self.seed = seed
        self.vdir = vdir
        self.txn_id = txn_id
        self.base_version = base_version
        self.fail_before_commit = fail_before_commit
        self.fail_mid_manifest = fail_mid_manifest
        self.key_type = dict(
            (f.name, f.dataType.simpleString())
            for f in spark_schema.fields
        )[key_col]

    # ---------------- executor side ---------------- #

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from v6spark.operators.xxh64 import shard_of, shards_of_numpy

        target = to_arrow_schema(self.spark_schema)
        content = pa.schema(
            [f for f in target if f.name != "split"]
        )
        int_lane = self.key_type in (
            "boolean", "tinyint", "smallint", "int", "bigint", "long"
        )
        groups: dict = {}
        for batch in iterator:
            splits = batch.column("split").to_pylist()
            kcol = batch.column(self.key_col)
            if kcol.null_count:
                raise ValueError(
                    "pubcorpus append: the key column must be "
                    "non-null on every row"
                )
            if int_lane:
                # one vectorized numpy pass (parity-pinned) instead
                # of a per-row Python hash — the routing touches
                # EVERY written row
                shards = shards_of_numpy(
                    kcol.to_numpy(zero_copy_only=False),
                    self.key_type, self.n_shards, seed=self.seed,
                ).tolist()
            else:
                shards = [
                    shard_of(k, self.key_type, self.n_shards,
                             seed=self.seed)
                    for k in kcol.to_pylist()
                ]
            by_group: dict = {}
            for i, (s, sh) in enumerate(zip(splits, shards)):
                if s is None:
                    raise ValueError(
                        "pubcorpus append: the split column must be "
                        "non-null on every row"
                    )
                by_group.setdefault((s, sh), []).append(i)
            for (s, sh), idx in by_group.items():
                sub = batch.take(pa.array(idx, type=pa.int64()))
                arrays = [
                    sub.column(f.name).cast(f.type) for f in content
                ]
                groups.setdefault((s, sh), []).append(
                    pa.RecordBatch.from_arrays(arrays, schema=content)
                )
        out = []
        for (s, sh), batches in sorted(groups.items()):
            rel = (
                f"{self.vdir}/split={s}/shard={sh}/"
                f"part-{uuid.uuid4().hex}.parquet"
            )
            dest = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            table = pa.Table.from_batches(batches, schema=content)
            pq.write_table(table, dest)
            out.append((s, sh, rel, table.num_rows))
        return _TaskFiles(files=tuple(out))

    # ---------------- driver side ---------------- #

    def _schema_list(self) -> list:
        return [
            [f.name, f.dataType.simpleString()]
            for f in self.spark_schema.fields
            if f.name != "split"
        ]

    def commit(self, messages) -> None:
        from v6spark.pipeline import (
            _collect_col_stats,
            _collect_file_stats,
            _doc_col_stats,
            _doc_file_stats,
            _doc_files,
            _dv_live_dirs,
            _offload_manifest,
            _txn_forward,
        )
        from v6spark.sources.pubcorpus import _split_files

        if self.fail_before_commit:
            raise RuntimeError(
                "injected crash before the manifest commit"
            )
        new_by_split: dict[str, list] = {}
        counts: dict[str, int] = {}
        for m in messages:
            for s, _sh, rel, n in (m.files if m else ()):
                new_by_split.setdefault(s, []).append(rel)
                counts[s] = counts.get(s, 0) + n
        for fl in new_by_split.values():
            fl.sort()
        schema = self._schema_list()
        new_file_stats = {
            s: _collect_file_stats(None, self.root, s, fl, self.key_col)
            for s, fl in new_by_split.items()
        }
        new_col_stats = {
            s: _collect_col_stats(None, self.root, s, fl)
            for s, fl in new_by_split.items()
        }

        log = f"{self.root.rstrip('/')}/{_COMMITS}"
        os.makedirs(log, exist_ok=True)
        claim = 0
        for _attempt in range(8):
            version, doc = _read_latest(log)
            if (
                self.txn_id is not None and doc is not None
                and self.txn_id in (doc.get("txn_ids") or [])
            ):
                return  # idempotent replay: staged files orphan
            if doc is None:
                payload = {
                    # file-level manifests record EVERY referenced
                    # version dir: the directory vacuum spares exactly
                    # the listed dirs (_dv_live_dirs, the DML posture)
                    "live": _dv_live_dirs(
                        {s: fl for s, fl in new_by_split.items()}, None
                    ),
                    "fmt": "parquet",
                    "splits": dict(counts),
                    "schema": schema,
                    "schema_changed": False,
                    "n_shards": self.n_shards,
                    "seed": self.seed,
                    "key_col": self.key_col,
                    "txn_ids": _txn_forward(None, self.txn_id),
                    "files": {s: list(fl)
                              for s, fl in sorted(new_by_split.items())},
                    "file_stats": new_file_stats,
                    "col_stats": new_col_stats,
                }
            else:
                self._validate_against(doc)
                # materializes offloaded sections (incl. dv) in place;
                # directory-level manifests list through pyarrow
                old_files = _doc_files(None, self.root, doc)
                if old_files is None:
                    old_files = _split_files(self.root, doc)
                old_fs = _doc_file_stats(None, self.root, doc)
                old_cs = _doc_col_stats(None, self.root, doc)
                files = {
                    s: sorted(
                        list(old_files.get(s, []))
                        + new_by_split.get(s, [])
                    )
                    for s in set(old_files) | set(new_by_split)
                }
                payload = {
                    # every version dir a referenced data or DV file
                    # lives in — the OLD doc's live alone would let a
                    # vacuum delete THIS append's fresh directory
                    "live": _dv_live_dirs(files, doc.get("dv")),
                    "fmt": "parquet",
                    "splits": {
                        s: (doc.get("splits") or {}).get(s, 0)
                        + counts.get(s, 0)
                        for s in set(doc.get("splits") or {})
                        | set(counts)
                    },
                    "schema": doc["schema"],
                    "schema_changed": False,
                    "n_shards": self.n_shards,
                    "seed": self.seed,
                    "key_col": self.key_col,
                    "txn_ids": _txn_forward(doc, self.txn_id),
                    "files": files,
                    "file_stats": {
                        s: {**old_fs.get(s, {}),
                            **new_file_stats.get(s, {})}
                        for s in set(old_fs) | set(new_file_stats)
                    },
                    "col_stats": {
                        s: {**old_cs.get(s, {}),
                            **new_col_stats.get(s, {})}
                        for s in set(old_cs) | set(new_col_stats)
                    },
                    "appended": {
                        "from_version": version,
                        "files": sum(len(f) for f in
                                     new_by_split.values()),
                        "rows": sum(counts.values()),
                    },
                }
                for carried in ("dv", "key_bloom"):
                    if doc.get(carried):
                        # old-file sections ride verbatim: DV-marked
                        # rows stay deleted, blooms keep pruning (new
                        # files without entries simply must-scan)
                        payload[carried] = doc[carried]
            payload = _offload_manifest(
                None, self.root, self.vdir, payload
            )
            nxt = max(claim, version + 1, self._max_claimed(log) + 1)
            data = _encode(nxt, payload)
            path = f"{log}/{MANIFEST_PREFIX}{nxt:012d}"
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                claim = nxt + 1  # collision: recompute vs the winner
                continue
            with os.fdopen(fd, "wb") as f:
                if self.fail_mid_manifest:
                    f.write(data[: len(data) // 2])
                    f.flush()
                    raise RuntimeError(
                        "injected crash mid-manifest write"
                    )
                f.write(data)
            with open(path, "rb") as f:
                if f.read() != data:
                    raise IOError(
                        f"manifest {path} failed read-back verify"
                    )
            return
        raise IOError(
            f"pubcorpus append lost 8 consecutive commit races under "
            f"{self.root} — pathological contention, coordinate writers"
        )

    def _max_claimed(self, log: str) -> int:
        """Highest version NUMBER present (complete or torn): torn and
        pending manifests occupy their number forever — claim past."""
        out = 0
        try:
            names = os.listdir(log)
        except FileNotFoundError:
            return 0
        for name in names:
            if name.startswith(MANIFEST_PREFIX):
                try:
                    out = max(out, int(name[len(MANIFEST_PREFIX):]))
                except ValueError:
                    continue
        return out

    def _validate_against(self, doc: dict) -> None:
        if doc.get("fmt") != "parquet":
            raise ValueError(
                f"pubcorpus append targets parquet publishes; this "
                f"table is {doc.get('fmt')!r}"
            )
        if doc.get("schema") != self._schema_list():
            raise ValueError(
                f"append schema drift vs the committed table: "
                f"{doc.get('schema')} != {self._schema_list()} — "
                "evolve through evolve_published_schema, then append"
            )
        posture = (
            doc.get("n_shards") or 32, doc.get("seed") or 0,
            doc.get("key_col"),
        )
        if posture != (self.n_shards, self.seed, self.key_col):
            raise ValueError(
                f"table shard posture {posture} changed since this "
                "write was planned (concurrent reshard?) — the staged "
                "files are mis-sharded and were NOT committed; retry"
            )

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(
            os.path.join(self.root, self.vdir), ignore_errors=True
        )


def make_writer(root: str, spark_schema, options, overwrite: bool):
    """Build the writer for ``PublishedCorpusDataSource.writer`` —
    validates up front (driver-side, before any task runs) and adopts
    the existing table's shard posture."""
    if overwrite:
        raise ValueError(
            "pubcorpus refuses mode('overwrite'): replacing a "
            "published table is an explicit, audited operation — "
            "retract/compact/republish through the DML verbs"
        )
    local = _local_path(root)
    names = [f.name for f in spark_schema.fields]
    if "split" not in names:
        raise ValueError(
            "pubcorpus append needs a 'split' column (it becomes the "
            "split=<s> directory, exactly like the DML verbs)"
        )
    if "shard" in names:
        raise ValueError(
            "'shard' is storage layout (derived from the key hash), "
            "not a writable column — drop it"
        )
    version, doc = _read_latest(f"{local.rstrip('/')}/{_COMMITS}")
    key_col = options.get("keycol") or options.get("keyCol") or (
        (doc or {}).get("key_col") or "doc_id"
    )
    if key_col not in names:
        raise ValueError(
            f"key column {key_col!r} is not in the written columns "
            f"{names} — pass option('keyCol', ...)"
        )
    if doc is not None:
        n_shards = doc.get("n_shards") or 32
        seed = doc.get("seed") or 0
        key_col = doc.get("key_col") or key_col
    else:
        n_shards = int(options.get("nshards")
                       or options.get("nShards") or 32)
        seed = int(options.get("seed") or 0)
    vdir = f"v={version + 1:06d}-{uuid.uuid4().hex[:8]}"
    w = PublishedCorpusWriter(
        root, spark_schema, key_col=key_col, n_shards=n_shards,
        seed=seed, vdir=vdir,
        txn_id=options.get("txnid") or options.get("txnId"),
        base_version=version,
        fail_before_commit=bool(options.get("_failbeforecommit")),
        fail_mid_manifest=bool(options.get("_failmidmanifest")),
    )
    if doc is not None:
        w._validate_against(doc)  # fail fast, before any task runs
    return w


__all__ = ["PublishedCorpusWriter", "make_writer"]
