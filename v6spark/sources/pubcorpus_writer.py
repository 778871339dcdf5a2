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
  semantics: key uniqueness is the CALLER's contract — de-duplicating
  merges are :func:`~v6spark.pipeline.upsert_into_published`'s job.
  A violated contract (appending an already-published key) is NOT
  detected here or by the CDC feed's per-window guard until a later
  rewrite co-locates both copies in one diff endpoint (checking every
  append against the full key set would cost a corpus scan per
  commit) — the duplicate then fails the stream loudly rather than
  misclassifying;
- ``mode("overwrite")`` is REFUSED: the DML verbs have no
  "replace the table silently" semantics and neither does this
  writer (retract/compact/republish are explicit, audited verbs);
- schema drift vs the current manifest is refused (evolve through
  :func:`~v6spark.pipeline.evolve_published_schema`) — UNLESS
  ``option("mergeSchema", "true")``, which accepts ADDITIVE drift and
  commits the evolve and the append as ONE manifest version (Delta's
  mergeSchema): the committed schema gains the new columns, files
  written before it serve them as typed NULLs, and renames/drops/
  type changes are still refused; shard posture (n_shards/seed/
  key_col) is adopted from the table;
- ``option("txnId", id)``: exactly-once — an id already in the
  manifest's ``txn_ids`` makes the commit an idempotent no-op
  (the staged files orphan; vacuum sweeps), the same contract as the
  DML verbs under streaming epoch replay.

Architecture: executor tasks receive Arrow batches, route each row
to its ``split=<s>/shard=<k>`` directory with the SAME Spark-exact
xxhash64 the publish verbs use (:mod:`v6spark.operators.xxh64` —
parity property-tested), and stream one parquet file per (split,
shard) per task through incremental ``ParquetWriter`` handles (rows
flush past a buffered-row threshold, so peak task memory is the
flush buffer, not the whole input partition).  The driver-side
commit then reuses the pipeline's own pure-pyarrow collectors
(``_collect_file_stats`` / ``_collect_col_stats`` /
``_offload_manifest`` with ``spark=None``) so the manifest sections
are bit-compatible by construction.

Commit kernel, chosen by filesystem (the Python DataSource commit
hook runs without a JVM):

- plain local roots: exclusive-create (``O_EXCL``) of the final
  manifest name + the txlog checksum footer — a torn manifest fails
  the checksum and is invisible, a lost race recomputes against the
  winner's state and claims the next version (the ``_occ_dml``
  posture);
- everything else resolves through ``pyarrow.fs`` (``s3://`` etc.,
  or ``option("useArrowFs", "true")`` to force it on a local root)
  and commits with the EMULATED conditional put (:func:`_put_manifest`:
  exists-check, write, double read-back verify).  txlog's put-mode
  caveat applies verbatim: on stores without a true atomic
  write-if-absent, two writers racing the SAME version number have a
  window between exists-check and write — the read-back verify turns
  a clobber into a hard error for the loser it catches, and the
  checksum footer keeps torn results invisible, but concurrent
  SQL-append writers on such stores should be externally serialized
  (single-writer streams with ``txnId`` replay are the designed use).

Mixed-committer caveat (local roots): the JVM DML verbs commit via
POSIX rename (which OVERWRITES) while this writer uses ``O_EXCL``
create; a JVM committer that passed its exists-check before this
writer's create can clobber the just-committed append.  The second
read-back verify below narrows that window to microseconds but
cannot close it — mixed JVM-verb + SQL-append writers sharing a
LOCAL root must be externally serialized (HDFS rename and S3
conditional put are exclusive primitives; the window is local-only).
"""

from __future__ import annotations

import os
import re
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

from v6spark.sources.pubcorpus import _read_latest
from v6spark.txlog import MANIFEST_PREFIX, _encode

_COMMITS = "_commits"

#: per-(split,shard) buffered rows that trigger a parquet row-group
#: flush, and the all-groups cap that bounds peak task memory even
#: when rows spread thin across many groups
_FLUSH_GROUP_ROWS = 65536
_FLUSH_TOTAL_ROWS = 262144


def _resolve_root(root: str, force_arrow: bool = False):
    """``(fs, base, helper_root)`` for a writer target.

    ``fs`` is None for plain local roots (os-level ``O_EXCL`` commit)
    or a ``pyarrow.fs.FileSystem`` otherwise; ``base`` is the
    fs-local path; ``helper_root`` is the string handed to the
    pipeline collectors / manifest readers (always resolvable by
    their own ``_fs_for``).  Relative local paths normalize to
    absolute so the pure-pyarrow collectors always take their local
    branch."""
    if root.startswith("file:"):
        root = re.sub(r"^file:/*", "/", root)
    if "://" not in root:
        base = os.path.abspath(root)
        if force_arrow:
            from pyarrow import fs as pafs

            return pafs.LocalFileSystem(), base, base
        return None, base, base
    from pyarrow import fs as pafs

    try:
        fs, base = pafs.FileSystem.from_uri(root)
    except Exception as exc:
        raise ValueError(
            f"the pubcorpus writer commits without a JVM and {root!r} "
            "is not pyarrow-resolvable — publish through the DML verbs "
            "(pipeline.publish_corpus_committed)"
        ) from exc
    return fs, base, root


def _put_manifest(fs, path: str, data: bytes) -> str:
    """Emulated conditional put of a manifest through ``pyarrow.fs``:
    returns ``"committed"`` (including byte-identical idempotent
    replays) or ``"collision"`` (a different COMPLETE manifest, or a
    torn occupant burning the version number — the OCC loop claims
    past both); raises ``IOError`` when the read-back verify catches
    a concurrent clobber of our own write."""
    from pyarrow.fs import FileType

    if fs.get_file_info(path).type != FileType.NotFound:
        with fs.open_input_stream(path) as f:
            existing = f.read()
        if existing == data:
            return "committed"  # idempotent replay
        # complete-and-different = concurrent writer won the number;
        # torn = some writer died mid-put (or is mid-flight on an
        # emulated store) — either way the number is burned: claim
        # past it rather than deleting under a possibly-live writer
        return "collision"
    with fs.open_output_stream(path) as f:
        f.write(data)
    for _ in range(2):  # double verify narrows the emulated-put window
        with fs.open_input_stream(path) as f:
            if f.read() != data:
                raise IOError(
                    f"manifest {path} clobbered by a concurrent writer "
                    "(store without atomic conditional put — serialize "
                    "writers externally)"
                )
    return "committed"


def _check_batch_constraints(con, batch, constraints: dict) -> None:
    """Fail the task on the first Arrow batch row violating a CHECK
    constraint — SQL three-valued semantics (violation = the
    expression IS FALSE; NULL passes), matching the Spark-side
    enforcement in :mod:`v6spark.pipeline`.

    ONE DuckDB execute per batch, not one per constraint: all
    expressions fold into a single disjunctive count (violations are
    the rare path, so naming the specific constraint and offending
    row only runs after the cheap combined pass trips).  Measured on
    AB_CONSTRAINTS' 20k-row appends: the per-constraint loop paid 3x
    the SQL parse/plan per batch and put enforcement at ~28% of the
    append wall; combined, enforcement is a single vectorized scan."""
    import pyarrow as pa

    tbl = pa.Table.from_batches([batch])
    con.register("_pub_batch", tbl)
    names = sorted(constraints)
    combined = " OR ".join(
        f"NOT coalesce(({constraints[n]}), TRUE)" for n in names
    )
    try:
        bad = con.execute(
            f"SELECT count(*) FROM _pub_batch WHERE {combined}"
        ).fetchone()[0]
    except Exception as exc:
        raise ValueError(
            f"CHECK constraints {names} could not be evaluated on "
            "the append batch — an expression predates the "
            "portable-subset gate, or the schema drifted; append "
            "through the DML verbs instead"
        ) from exc
    if not bad:
        return
    # rare path: name the first violated constraint + offending row
    for name in names:
        expr = constraints[name]
        n_bad = con.execute(
            "SELECT count(*) FROM _pub_batch "
            f"WHERE NOT coalesce(({expr}), TRUE)"
        ).fetchone()[0]
        if n_bad:
            row = con.execute(
                "SELECT * FROM _pub_batch "
                f"WHERE NOT coalesce(({expr}), TRUE) LIMIT 1"
            ).fetchone()
            cols = [f.name for f in tbl.schema]
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) violated by "
                f"{n_bad} row(s) in the append — first offending row: "
                f"{dict(zip(cols, row))}; nothing was committed"
            )


@dataclass
class _TaskFiles(WriterCommitMessage):
    #: (split, shard, rel_path, n_rows) per file this task wrote
    files: tuple = ()


class PublishedCorpusWriter(DataSourceArrowWriter):
    def __init__(self, root: str, spark_schema, *, key_col: str,
                 n_shards: int, seed: int, vdir: str,
                 txn_id: str | None, base_version: int,
                 fail_before_commit: bool = False,
                 fail_mid_manifest: bool = False,
                 use_arrow_fs: bool = False,
                 flush_group_rows: int = _FLUSH_GROUP_ROWS,
                 flush_total_rows: int = _FLUSH_TOTAL_ROWS,
                 merge_schema: bool = False,
                 constraints: dict | None = None):
        self.fs, self.root, self.helper_root = _resolve_root(
            root, force_arrow=use_arrow_fs
        )
        self.flush_group_rows = flush_group_rows
        self.flush_total_rows = flush_total_rows
        self.merge_schema = merge_schema
        self.constraints = dict(constraints or {})
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
        # streaming sinks: one parquet file per (split, shard) for the
        # task, written INCREMENTALLY — buffered batches flush into the
        # open ParquetWriter past _FLUSH_GROUP_ROWS (decent row groups)
        # and the task-wide _FLUSH_TOTAL_ROWS cap bounds peak memory at
        # the buffer size, not the input partition size
        groups: dict = {}          # (split, shard) -> [RecordBatch]
        group_rows: dict = {}      # (split, shard) -> buffered rows
        writers: dict = {}         # (split, shard) -> (ParquetWriter, rel)
        written_rows: dict = {}    # (split, shard) -> rows flushed
        total_buffered = 0

        def _flush(key):
            nonlocal total_buffered
            batches = groups.pop(key, ())
            if not batches:
                return
            s, sh = key
            if key not in writers:
                rel = (
                    f"{self.vdir}/split={s}/shard={sh}/"
                    f"part-{uuid.uuid4().hex}.parquet"
                )
                if self.fs is None:
                    dest = os.path.join(self.root, rel)
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    w = pq.ParquetWriter(dest, content)
                else:
                    dest = f"{self.root.rstrip('/')}/{rel}"
                    self.fs.create_dir(
                        dest.rsplit("/", 1)[0], recursive=True
                    )
                    w = pq.ParquetWriter(
                        dest, content, filesystem=self.fs
                    )
                writers[key] = (w, rel)
            table = pa.Table.from_batches(batches, schema=content)
            writers[key][0].write_table(table)
            written_rows[key] = written_rows.get(key, 0) + table.num_rows
            total_buffered -= group_rows.pop(key, 0)

        check_con = None
        if self.constraints:
            # CHECK constraints ride the write path (the Delta
            # enforcement shape): each Arrow batch is validated
            # executor-side by DuckDB — this path commits without a
            # JVM, and set_published_constraint gated every
            # expression on DuckDB evaluability at set time
            import duckdb

            check_con = duckdb.connect()

        for batch in iterator:
            if check_con is not None:
                _check_batch_constraints(
                    check_con, batch, self.constraints
                )
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
                rb = pa.RecordBatch.from_arrays(arrays, schema=content)
                key = (s, sh)
                groups.setdefault(key, []).append(rb)
                group_rows[key] = group_rows.get(key, 0) + rb.num_rows
                total_buffered += rb.num_rows
                if group_rows[key] >= self.flush_group_rows:
                    _flush(key)
            if total_buffered >= self.flush_total_rows:
                # spread-thin pressure: flush the largest buffers first
                for key in sorted(group_rows, key=group_rows.get,
                                  reverse=True):
                    _flush(key)
                    if total_buffered < self.flush_total_rows // 2:
                        break
        if check_con is not None:
            check_con.close()
        for key in sorted(groups):
            _flush(key)
        out = []
        for key in sorted(writers):
            w, rel = writers[key]
            w.close()
            out.append((key[0], key[1], rel, written_rows[key]))
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
            s: _collect_file_stats(
                None, self.helper_root, s, fl, self.key_col
            )
            for s, fl in new_by_split.items()
        }
        new_col_stats = {
            s: _collect_col_stats(None, self.helper_root, s, fl)
            for s, fl in new_by_split.items()
        }

        log = f"{self.root.rstrip('/')}/{_COMMITS}"
        log_helper = f"{self.helper_root.rstrip('/')}/{_COMMITS}"
        if self.fs is None:
            os.makedirs(log, exist_ok=True)
        else:
            self.fs.create_dir(log, recursive=True)
        claim = 0
        for _attempt in range(8):
            version, doc = _read_latest(log_helper)
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
                schema_out, evolution = doc["schema"], None
                if self.merge_schema and doc["schema"] != schema:
                    # evolve+append as ONE committed version: the
                    # merged schema lands with the new files; files
                    # written before it serve the added columns as
                    # typed NULLs (the evolve_published_schema read
                    # contract, same manifest shape)
                    schema_out, added = self._merged_schema(doc)
                    evolution = {"added": added,
                                 "from_version": version}
                # materializes offloaded sections (incl. dv) in place;
                # directory-level manifests list through pyarrow
                old_files = _doc_files(None, self.helper_root, doc)
                if old_files is None:
                    old_files = _split_files(self.helper_root, doc)
                old_fs = _doc_file_stats(None, self.helper_root, doc)
                old_cs = _doc_col_stats(None, self.helper_root, doc)
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
                    "schema": schema_out,
                    "schema_changed": evolution is not None,
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
                if evolution is not None:
                    payload["schema_evolution"] = evolution
                for carried in ("dv", "key_bloom", "clustered_by",
                                "constraints", "retention"):
                    if doc.get(carried):
                        # old-file sections ride verbatim: DV-marked
                        # rows stay deleted, blooms keep pruning (new
                        # files without entries simply must-scan);
                        # table properties (clustering hint, CHECK
                        # constraints) persist through the append
                        payload[carried] = doc[carried]
            payload = _offload_manifest(
                None, self.helper_root, self.vdir, payload
            )
            nxt = max(claim, version + 1, self._max_claimed(log) + 1)
            data = _encode(nxt, payload)
            path = f"{log}/{MANIFEST_PREFIX}{nxt:012d}"
            if self.fs is not None:
                if self.fail_mid_manifest:
                    with self.fs.open_output_stream(path) as f:
                        f.write(data[: len(data) // 2])
                    raise RuntimeError(
                        "injected crash mid-manifest write"
                    )
                if _put_manifest(self.fs, path, data) == "collision":
                    claim = nxt + 1  # recompute vs the winner
                    continue
                return
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
            for _verify in range(2):
                # double read-back: catches (and narrows to
                # microseconds) the mixed JVM-rename/O_EXCL local
                # clobber window documented in the module docstring
                with open(path, "rb") as f:
                    if f.read() != data:
                        raise IOError(
                            f"manifest {path} failed read-back verify "
                            "(concurrent JVM rename-mode committer on "
                            "a shared local root? serialize writers)"
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
        if self.fs is not None:
            from pyarrow.fs import FileSelector

            try:
                names = [
                    i.base_name
                    for i in self.fs.get_file_info(
                        FileSelector(log, recursive=False)
                    )
                ]
            except FileNotFoundError:
                return 0
        else:
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

    def _merged_schema(self, doc: dict) -> tuple[list, list]:
        """``(merged schema list, added columns)`` for a mergeSchema
        append: the written schema must carry every committed column
        with its exact type (evolution is ADDITIVE — renames, drops,
        and type changes stay a guarded full republish, the
        evolve_published_schema contract) and may append new ones."""
        written = self._schema_list()
        written_types = {n: t for n, t in written}
        table = [list(c) for c in (doc.get("schema") or [])]
        for n, t in table:
            if n not in written_types:
                raise ValueError(
                    f"mergeSchema append drops committed column {n!r} "
                    "— evolution is additive only (write every "
                    "committed column; old readers depend on it)"
                )
            if written_types[n] != t:
                raise ValueError(
                    f"mergeSchema append changes column {n!r} type "
                    f"{t!r} -> {written_types[n]!r} — type changes "
                    "are a guarded full republish, not an append"
                )
        table_names = {n for n, _t in table}
        added = [[n, t] for n, t in written if n not in table_names]
        return table + added, added

    def _validate_against(self, doc: dict) -> None:
        if doc.get("fmt") != "parquet":
            raise ValueError(
                f"pubcorpus append targets parquet publishes; this "
                f"table is {doc.get('fmt')!r}"
            )
        if doc.get("schema") != self._schema_list():
            if self.merge_schema:
                self._merged_schema(doc)  # raises unless additive
            else:
                raise ValueError(
                    f"append schema drift vs the committed table: "
                    f"{doc.get('schema')} != {self._schema_list()} — "
                    "evolve through evolve_published_schema (or "
                    "option('mergeSchema', 'true') for an additive "
                    "evolve+append in one commit), then append"
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
        if (doc.get("constraints") or {}) != self.constraints:
            raise ValueError(
                "the table's CHECK constraints changed since this "
                "write was planned (concurrent "
                "set/drop_published_constraint) — the staged rows "
                "were validated against the OLD set and were NOT "
                "committed; retry"
            )

    def abort(self, messages) -> None:
        if self.fs is not None:
            try:
                self.fs.delete_dir(
                    f"{self.root.rstrip('/')}/{self.vdir}"
                )
            except FileNotFoundError:
                pass
            return
        import shutil

        shutil.rmtree(
            os.path.join(self.root, self.vdir), ignore_errors=True
        )


class PublishedCorpusStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("pubcorpus")`` — the committed append
    as a streaming SINK: every microbatch is ONE manifest commit with
    a per-epoch transaction id, so epoch replays (crash between
    Spark's checkpoint write and our manifest, query restarts from
    the same checkpoint) are idempotent no-ops — exactly once, the
    same contract as :func:`v6spark.pipeline.upsert_foreach_batch`
    but without leaving Python DataFrame land.

    ``option("txnPrefix", <stable id>)`` is REQUIRED: the per-epoch
    transaction id is ``<prefix>:<batchId>``, and only a prefix that
    survives query restarts (e.g. derived from the checkpoint
    location) makes the replay dedupe hold across them — the Kafka
    ``transactional.id`` posture, made explicit.

    Staging: all epochs of one query run share a ``v=stream-<nonce>``
    directory (the microbatch id is unknown on executors); each
    manifest references only its own epoch's files, ``abort`` deletes
    the files it staged, and a crash orphans at most one epoch's
    unreferenced files inside a still-live directory — invisible to
    every reader, reclaimed when the directory ages out of the live
    set.  Appends-only: ``outputMode("complete")`` is refused, and a
    schema/posture drift committed mid-stream fails the query at the
    next commit rather than writing mis-shaped files (restart after
    evolving, matching the CDC reader's fail-on-drift posture).

    Blocked-upstream note: Spark 4.1 cannot resolve Python DataSource
    BATCH writes off the main thread
    (scripts/spark_threaded_datasource_repro.py), but the streaming
    sink path resolves at ``start()`` on the main thread and commits
    through the engine's own machinery — re-tested working on the
    installed Spark this round.
    """

    def __init__(self, root: str, spark_schema, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "pubcorpus streaming is append-only: "
                "outputMode('complete')/truncate is refused — "
                "retract/compact through the DML verbs"
            )
        if options.get("branch") is not None:
            raise ValueError(
                "the pubcorpus sink targets main — branch DML goes "
                "through the Python verbs (branch=...)"
            )
        prefix = options.get("txnprefix") or options.get("txnPrefix")
        if not prefix:
            raise ValueError(
                "pubcorpus streaming sink needs option('txnPrefix', "
                "<id stable across restarts>): the per-epoch "
                "transaction id <prefix>:<batchId> is what makes "
                "epoch replays exactly-once"
            )
        self.txn_prefix = str(prefix)
        opts = dict(options)
        opts.pop("txnid", None)
        opts.pop("txnId", None)  # per-epoch ids only, never a fixed one
        self._writer = make_writer(root, spark_schema, opts,
                                   overwrite=False)
        self._run_vdir = f"v=stream-{uuid.uuid4().hex[:12]}"
        self._writer.vdir = self._run_vdir

    # -------------- executor side -------------- #

    def write(self, iterator):
        """Rows (the stream writer API is row-based) re-batched into
        Arrow and fed to the batch writer's streaming-flush kernel —
        same shard routing, same parquet layout, bounded memory."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._writer.spark_schema)

        def _batches(chunk_rows=8192):
            buf = []
            for row in iterator:
                buf.append(tuple(row))
                if len(buf) >= chunk_rows:
                    yield _rows_to_batch(buf, target, pa)
                    buf = []
            if buf:
                yield _rows_to_batch(buf, target, pa)

        return self._writer.write(_batches())

    # -------------- driver side -------------- #

    def commit(self, messages, batchId: int) -> None:
        staged = sum(
            len(m.files) for m in messages if m is not None
        )
        if staged == 0:
            return  # empty window: no version churn, replay-safe
        self._writer.txn_id = f"{self.txn_prefix}:{int(batchId)}"
        # per-EPOCH offload directory: _offload_manifest writes its
        # sidecar under a fixed name inside vdir, and the run dir is
        # shared across epochs — committing every epoch under the run
        # dir itself would overwrite the sidecar a PREVIOUS committed
        # manifest still references (breaking time travel and CDC
        # diffs once the table crosses the offload threshold).  The
        # data files keep their run-dir paths (recorded at write
        # time); only the commit's sidecar moves per epoch.
        self._writer.vdir = (
            f"{self._run_vdir}/epoch-{int(batchId):09d}"
        )
        self._writer.commit(messages)

    def abort(self, messages, batchId: int) -> None:
        """Delete the files THIS epoch staged (the run directory is
        shared across epochs, so no rmtree)."""
        w = self._writer
        for m in messages:
            for _s, _sh, rel, _n in (m.files if m else ()):
                try:
                    if w.fs is None:
                        os.unlink(os.path.join(w.root, rel))
                    else:
                        w.fs.delete_file(f"{w.root.rstrip('/')}/{rel}")
                except FileNotFoundError:
                    pass


def _rows_to_batch(rows: list, target, pa):
    """One Arrow RecordBatch from buffered Row tuples (column order ==
    the write schema's — Spark hands rows in plan order)."""
    cols = list(zip(*rows)) if rows else [[] for _ in target]
    arrays = [
        pa.array(list(cols[i]), type=f.type)
        for i, f in enumerate(target)
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=target)


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
    if options.get("branch") is not None:
        # the refusal must live HERE, not only on the front doors: a
        # direct make_writer caller passing branch= would otherwise
        # commit to MAIN silently — data on the wrong ref, no error
        raise ValueError(
            "the pubcorpus writer targets main — branch DML goes "
            "through the Python verbs (branch=...)"
        )
    use_arrow_fs = str(
        options.get("usearrowfs") or options.get("useArrowFs") or ""
    ).lower() in ("true", "1", "yes")
    merge_schema = str(
        options.get("mergeschema") or options.get("mergeSchema") or ""
    ).lower() in ("true", "1", "yes")
    _fs, _base, helper_root = _resolve_root(root, force_arrow=use_arrow_fs)
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
    version, doc = _read_latest(f"{helper_root.rstrip('/')}/{_COMMITS}")
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
        use_arrow_fs=use_arrow_fs,
        flush_group_rows=int(
            options.get("_flushgrouprows") or _FLUSH_GROUP_ROWS
        ),
        flush_total_rows=int(
            options.get("_flushtotalrows") or _FLUSH_TOTAL_ROWS
        ),
        merge_schema=merge_schema,
        constraints=(doc or {}).get("constraints"),
    )
    if doc is not None:
        w._validate_against(doc)  # fail fast, before any task runs
    return w


__all__ = [
    "PublishedCorpusStreamWriter",
    "PublishedCorpusWriter",
    "make_writer",
]
