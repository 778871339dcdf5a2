"""The committed published corpus as a Spark DataSource —
``spark.read.format("pubcorpus").load(root)``.

Round 6 built the committed-corpus table format (ACID publish, DML,
deletion vectors, manifest stats, tags, branches) behind Python API
calls (:func:`v6spark.pipeline.read_published_corpus` /
``read_published_where`` / ``read_published_keys``).  This module is
the SQL front door: a plain ``spark.read`` (hence ``spark.sql`` over
a temp view) gets the same committed-only semantics —

- **exactly-once reads**: only COMPLETE manifests are visible; a torn
  commit or in-flight publish does not exist;
- **time travel**: ``option("version", n)`` / ``option("tag", name)``
  / ``option("branch", name)``;
- **schema evolution**: files written before an additive
  ``evolve_published_schema`` read the unified schema with typed
  NULLs for the added columns;
- **deletion vectors**: merge-on-read — DV-marked rows never surface;
- **manifest data skipping**: ``option("where", <sql>)`` prunes
  FILES from the scan via the manifest's ``col_stats`` / key
  ``file_stats`` / split pseudo-stat through
  :func:`v6spark.operators.pruning.file_can_match_any` — zero parquet
  footer reads — then skips ROW GROUPS inside surviving files via the
  same matcher against footer stats, and applies the same predicate
  ROW-exactly (pyarrow compute), i.e. ``read_published_where``
  semantics.  ``option("columns", "a,b")`` narrows the decode to the
  projection (+ filter columns, dropped before yield).
  Deliberately NOT ``pushFilters``: Spark 4.1 caches pushdown-planned
  partitions on the shared relation node, so a later query on the
  same DataFrame/temp view WITHOUT pushable filters silently reuses a
  previous query's pruned scan (reproduced:
  ``df.filter(...).count(); df.count() -> 0``).  Options are part of
  the relation identity, so option-keyed pruning can never leak
  across queries;
- **split as a column**: ``split`` rides every row; ``split = 'x'``
  predicates prune whole splits at plan time.

Architecture (the 100 TB shape): planning is manifest-sized — the
driver-side Python worker reads ONE commit doc (KBs; offloaded
sidecars through pyarrow) and emits one InputPartition per surviving
data file.  Each partition is read executor-side by pyarrow in
RECORD-BATCH units (Arrow end to end, zero per-row Python), deletion
vectors applied as a positional mask from the partition's own
(KB-scale) position list.  This is a *second reader* for the same
bytes, not a fork of the format: the manifest layer
(:mod:`v6spark.txlog`, pipeline ``_doc_*`` accessors) is shared, and
`tests/test_pubcorpus_source.py` pins bit-identity against
``read_published_corpus`` across the whole DML lifecycle.

When to use which: the Python readers compile to JVM parquet scans
(whole-stage codegen — the fastest bulk path and the one bench.py
measures); the DataSource trades that for a stable
``spark.read``/SQL surface that JVM-side consumers and plain-SQL
users can target without importing v6spark.  Semantics are identical.

Streaming: ``spark.readStream.format("pubcorpus")
.option("startingVersion", n)`` is the ROW-LEVEL change feed
(:mod:`v6spark.sources.pubcdc`); the version-level publish-LOG stream
lives in :mod:`v6spark.sources.publog`.  Writing:
``df.write.format("pubcorpus").mode("append")`` is the committed
publish/append (:mod:`v6spark.sources.pubcorpus_writer`); overwrite
and the destructive verbs stay Python-API-only, by design.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from v6spark.sources.publog import _fs_for
from v6spark.txlog import MANIFEST_PREFIX, TAG_PREFIX, _decode

_COMMITS = "_commits"
_BRANCHES = "_branches"


# ------------------------------------------------------------------ #
# JVM-free manifest access (planning runs in a plain Python worker)  #
# ------------------------------------------------------------------ #


def _log_dir(root: str, branch: str | None) -> str:
    if branch is None:
        return f"{root.rstrip('/')}/{_COMMITS}"
    if "/" in branch or branch.startswith((".", "_")):
        raise ValueError(f"invalid branch name {branch!r}")
    return f"{root.rstrip('/')}/{_BRANCHES}/{branch}"


def _read_doc(log_dir: str, version: int) -> dict | None:
    from v6spark.sources.publog import _intent_done

    fs, local = _fs_for(log_dir)
    p = f"{local}/{MANIFEST_PREFIX}{version:012d}"
    try:
        with fs.open_input_stream(p) as f:
            doc = _decode(f.read())
    except FileNotFoundError:
        # ONLY not-found means "no such version"; a transient IO /
        # permission error must raise — swallowing it would silently
        # fall back to an OLDER committed version (stale reads)
        return None
    if doc is not None and doc.get("intent") \
            and not _intent_done(doc["intent"]):
        return None  # pending/aborted commit_pair half: invisible
    return doc


def _list_log(log_dir: str, prefix: str) -> list[str]:
    from pyarrow import fs as pafs

    fs, local = _fs_for(log_dir)
    try:
        infos = fs.get_file_info(pafs.FileSelector(local, recursive=False))
    except FileNotFoundError:
        return []
    return [i.base_name for i in infos if i.base_name.startswith(prefix)]


def _read_latest(log_dir: str) -> tuple[int, dict | None]:
    versions = []
    for name in _list_log(log_dir, MANIFEST_PREFIX):
        try:
            versions.append(int(name[len(MANIFEST_PREFIX):]))
        except ValueError:
            continue
    for v in sorted(versions, reverse=True):
        doc = _read_doc(log_dir, v)
        if doc is not None:
            return v, doc
    return 0, None


def _parse_as_of(value) -> float:
    """``asOf`` option -> epoch seconds (UTC).  Accepts epoch seconds
    (int/float/numeric string) or an ISO-8601 timestamp; a naive ISO
    string is taken as UTC (the engine session posture)."""
    from datetime import datetime, timezone

    s = str(value).strip()
    try:
        return float(s)
    except ValueError:
        pass
    try:
        dt = datetime.fromisoformat(s)
    except ValueError as exc:
        raise ValueError(
            f"asOf must be epoch seconds or an ISO-8601 timestamp, "
            f"got {value!r}"
        ) from exc
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def _manifest_times(log_dir: str) -> list[tuple[int, float]]:
    """``[(version, commit_epoch)]`` sorted by version — delegates to
    :func:`v6spark.txlog.manifest_commit_times` (THE single
    monotone-mtime rule shared with keep_since retention and the
    history surfaces) on the JVM-free pyarrow path this module
    requires."""
    from v6spark.txlog import manifest_commit_times

    return manifest_commit_times(log_dir)


def _resolve_as_of(log_dir: str, ts_epoch: float,
                   strict: bool = False) -> int:
    """TIMESTAMP AS OF -> version: the newest COMPLETE manifest whose
    commit time is <= the timestamp (``strict=True``: strictly
    before — the LOWER-bound form, so a change window started AT a
    commit's timestamp includes that commit, Delta's at-or-after
    ``startingTimestamp``).  Scans newest-first and reads manifests
    only until the first complete candidate — typically ONE doc read
    regardless of log length."""
    pick = None
    for v, ts in reversed(_manifest_times(log_dir)):
        if (ts < ts_epoch if strict else ts <= ts_epoch) \
                and _read_doc(log_dir, v) is not None:
            pick = v
            break
    if pick is None:
        raise ValueError(
            f"no committed version at or before asOf={ts_epoch} under "
            f"{log_dir} (earliest commit is newer, or the log is "
            "empty/vacuumed)"
        )
    return pick


def _resolve_tag(log_dir: str, tag: str) -> int:
    fs, local = _fs_for(log_dir)
    try:
        with fs.open_input_stream(f"{local}/{TAG_PREFIX}{tag}") as f:
            doc = _decode(f.read())
    except FileNotFoundError:
        doc = None
    if doc is None or "v" not in doc:
        raise ValueError(f"no tag {tag!r} under {log_dir}")
    return int(doc["v"])


def _split_files(root: str, doc: dict) -> dict[str, list[str]]:
    """Relative data files per split — the pyarrow twin of
    ``pipeline._published_split_files`` (file-level manifests through
    the shared ``_doc_files`` accessor with ``spark=None``;
    directory-level via a recursive pyarrow listing)."""
    from pyarrow import fs as pafs

    from v6spark.pipeline import _doc_files

    files = _doc_files(None, root, doc)
    if files is not None:
        return {s: list(fl) for s, fl in files.items()}
    fs, local = _fs_for(root)
    out: dict[str, list[str]] = {}
    for s in sorted(doc["splits"]):
        split_dir = f"{local}/{doc['live']}/split={s}"
        try:
            infos = fs.get_file_info(
                pafs.FileSelector(split_dir, recursive=True)
            )
        except FileNotFoundError:
            out[s] = []
            continue
        rels = []
        for i in infos:
            if i.is_file and not i.base_name.startswith(("_", ".")):
                rels.append(i.path[len(local) + 1:])
        out[s] = sorted(rels)
    return out


def _dv_positions(root: str, doc: dict) -> dict[tuple, list]:
    """{(split, rel_file): [deleted positions]} from the manifest's
    deletion-vector sidecars (KB-scale; explicit file list, so a torn
    DV write from a crashed retraction is invisible)."""
    import pyarrow.parquet as pq

    dv = doc.get("dv")
    if not dv or not dv.get("data"):
        return {}
    fs, local = _fs_for(root)
    out: dict[tuple, list] = {}
    for rel in dv["data"]:
        t = pq.read_table(f"{local}/{rel}", filesystem=fs)
        for s, f, p in zip(
            t.column("split").to_pylist(),
            t.column("file").to_pylist(),
            t.column("pos").to_pylist(),
        ):
            out.setdefault((s, f), []).append(p)
    for v in out.values():
        v.sort()
    return out


# ------------------------------------------------------------------ #
# The `where` option: manifest pruning + exact row filtering         #
# ------------------------------------------------------------------ #
#
# WHY AN OPTION AND NOT pushFilters: Spark 4.1's Python-source filter
# pushdown caches the pushdown-planned partitions on the shared
# relation node, and a later query on the same DataFrame / temp view
# WITHOUT pushable filters reuses them — a plain count() after a
# filtered count() silently returns the filtered result (reproduced:
# df.filter(...).count(); df.count() -> 0).  Until that is fixed
# upstream, any pushFilters-based pruning can poison shared
# relations, so the scan restriction is an OPTION instead: options
# are part of the relation identity, making reuse always safe.
# option("where", sql) prunes FILES from manifest col_stats AND
# applies the same predicate row-exactly (pyarrow compute), so its
# semantics match read_published_where.


def _group_mask(batch_cols: dict, groups, n: int):
    """Boolean numpy mask: OR over conjunct groups, AND within —
    SQL three-valued semantics (NULL comparisons never match)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def scal(val, typ):
        # type-coerce the literal to the COLUMN's type so predicates
        # Spark evaluates with implicit casts (day = '3' on a bigint)
        # behave identically here instead of crashing the kernel; an
        # uncastable literal fails loudly, matching ANSI Spark
        sc = pa.scalar(val)
        if sc.type.equals(typ):
            return sc
        try:
            return sc.cast(typ)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as exc:
            raise ValueError(
                f"where literal {val!r} is not castable to the "
                f"column type {typ} — rewrite the predicate with a "
                "type-matching literal"
            ) from exc

    def conj_mask(col, op, val):
        arr = batch_cols.get(col)
        if arr is None:
            raise ValueError(f"where references unknown column {col!r}")
        if pa.types.is_null(arr.type):
            # a pre-evolution file read with the predicate column
            # outside the projection: every value is NULL, so only
            # IS NULL matches (comparisons on NULL are never true)
            if op == "isnull":
                return pc.is_null(arr)
            return pa.array(np.zeros(len(arr), dtype=bool))
        if op == "isnull":
            return pc.is_null(arr)
        if op == "notnull":
            return pc.is_valid(arr)
        if op == "prefix":
            if not pa.types.is_string(arr.type) and not (
                pa.types.is_large_string(arr.type)
            ):
                arr = arr.cast(pa.string())  # LIKE casts the column
            m = pc.starts_with(arr, pattern=val)
        elif op == "in":
            vs = pa.array(val)
            if not vs.type.equals(arr.type):
                vs = vs.cast(arr.type)
            m = pc.is_in(arr, value_set=vs)
        elif op == "between":
            m = pc.and_(
                pc.greater_equal(arr, scal(val[0], arr.type)),
                pc.less_equal(arr, scal(val[1], arr.type)),
            )
        else:
            fn = {"=": pc.equal, "<": pc.less, "<=": pc.less_equal,
                  ">": pc.greater, ">=": pc.greater_equal}[op]
            m = fn(arr, scal(val, arr.type))
        return pc.fill_null(m, False)

    total = np.zeros(n, dtype=bool)
    for g in groups:
        gm = np.ones(n, dtype=bool)
        for col, op, val in g:
            gm &= conj_mask(col, op, val).to_numpy(zero_copy_only=False)
        total |= gm
    return total


def _rg_stats(md, rg_idx: int, split: str, shard) -> dict:
    """``{col: [min, max, null_count]}`` for one parquet row group,
    shaped for :func:`v6spark.operators.pruning.file_can_match_any`.
    Advisory-negative by construction: columns without footer stats
    are simply absent (the matcher can't refute → scan), truncated
    string bounds stay valid bounds per the parquet spec, and
    cross-type comparisons degrade to scan inside the matcher."""
    rg = md.row_group(rg_idx)
    stats: dict = {"split": [split, split, 0]}
    if shard is not None:
        stats["shard"] = [shard, shard, 0]
    for j in range(rg.num_columns):
        col = rg.column(j)
        name = col.path_in_schema
        if "." in name:
            continue  # nested leaf: no top-level column to prune on
        st = col.statistics
        if st is None:
            continue
        nc = st.null_count if st.has_null_count else None
        if st.has_min_max:
            stats[name] = [st.min, st.max, nc]
        elif nc is not None and nc == rg.num_rows:
            stats[name] = [None, None, nc]  # entirely-NULL group
    return stats


@dataclass
class CorpusPartition(InputPartition):
    #: (rel_path, split, shard, dv_positions) per file — one partition
    #: covers ~maxBytesPerPartition of data (Spark's maxPartitionBytes
    #: idea), so a 480-small-file publish doesn't pay 480 Python task
    #: setups while a 100 TB table still fans out by bytes
    files: tuple


def _shard_of(rel: str) -> str | None:
    for part in rel.split("/"):
        if part.startswith("shard="):
            return part.split("=", 1)[1]
    return None


class PublishedCorpusReader(DataSourceReader):
    def __init__(self, root: str, doc: dict, spark_schema, split_opt,
                 where: str | None, keys_json: str | None,
                 observer_path: str | None,
                 max_partition_bytes: int = 128 * 1024 * 1024,
                 decode_observer_dir: str | None = None):
        from v6spark.operators.pruning import parse_disjuncts_strict

        self.root = root
        self.spark_schema = spark_schema
        self.split_opt = split_opt
        self.observer_path = observer_path
        self.max_partition_bytes = max_partition_bytes
        self._decode_dir = decode_observer_dir
        if where is not None:
            self.groups = parse_disjuncts_strict(where)
            if self.groups is None:
                raise ValueError(
                    f"where option {where!r} does not parse into the "
                    "prunable predicate grammar (comparisons, IN, "
                    "BETWEEN, LIKE 'prefix%', IS [NOT] NULL, AND/OR) — "
                    "apply arbitrary predicates with .filter()/SQL "
                    "WHERE instead"
                )
        else:
            self.groups = []
        # planning state, all manifest-sized
        self._files = _split_files(root, doc)
        if split_opt is not None:
            self._files = {split_opt: self._files.get(split_opt, [])}
        from v6spark.pipeline import _doc_col_stats, _doc_file_stats

        self._col_stats = _doc_col_stats(None, root, doc)
        self._file_stats = _doc_file_stats(None, root, doc)
        self._key_col = doc.get("key_col")
        self._dv = _dv_positions(root, doc)
        self._keys = None
        self._keys_by_shard: dict[int, list] = {}
        self._kb = None
        if keys_json is not None:
            if self._key_col is None:
                raise ValueError(
                    "keys option needs a manifest-recorded key_col "
                    "(pre-stats publish) — use the where option instead"
                )
            try:
                raw = json.loads(keys_json)
            except ValueError:
                raw = None
            # explicit check, not assert: asserts vanish under
            # ``python -O`` and a JSON object/string would then flow
            # into the key-set comprehension (a dict iterates its
            # keys) — silent wrong point lookups
            if not isinstance(raw, list) or not raw:
                raise ValueError(
                    'keys must be a non-empty JSON array, e.g. '
                    'option("keys", "[1, 2, 3]")'
                )
            from v6spark.operators.xxh64 import shard_of

            ktype = dict(doc.get("schema") or {}).get(self._key_col)
            cast = (
                str if ktype == "string"
                else int if ktype in ("tinyint", "smallint", "int",
                                      "bigint")
                else None
            )
            if cast is None:
                raise ValueError(
                    f"keys option supports int/string key columns; "
                    f"{self._key_col!r} is {ktype!r}"
                )
            self._keys = sorted({cast(k) for k in raw})
            ns = doc.get("n_shards") or 32
            sd = doc.get("seed") or 0
            for k in self._keys:
                sh = shard_of(k, ktype, ns, seed=sd)
                self._keys_by_shard.setdefault(sh, []).append(k)
            self._kb = doc.get("key_bloom")
            # fold the IN-restriction into the row filter: AND it onto
            # every where-disjunct (distributing over the OR)
            in_conj = (self._key_col, "in", list(self._keys))
            self.groups = (
                [g + [in_conj] for g in self.groups]
                if self.groups else [[in_conj]]
            )
        # columns the row filter needs but the projection may not
        # carry (option("columns") narrows spark_schema): validated at
        # PLANNING time against the manifest schema, decoded alongside
        # the projection executor-side, dropped before yield
        self._mask_cols = sorted({c for g in self.groups for c, _o, _v in g})
        known = {n for n, _t in (doc.get("schema") or [])}
        known |= {"split", "shard"}
        unknown = [c for c in self._mask_cols if c not in known]
        if unknown:
            raise ValueError(
                f"where/keys reference unknown column(s) {unknown}; "
                f"published columns are {sorted(known)}"
            )

    def _bloom_map(self, candidates: list) -> dict:
        """{rel: (bloom bytes, m_bits)} for candidate files, from the
        manifest-referenced sidecar tables (pyarrow; a vacuumed table
        is skipped — files without an entry must scan)."""
        import pyarrow.parquet as pq

        out: dict[str, tuple] = {}
        if not self._kb or not candidates:
            return out
        fs, local = _fs_for(self.root)
        for t in self._kb.get("tables") or []:
            pre = t.get("file_prefix", "")
            wanted = {
                rel[len(pre):] for rel in candidates
                if rel.startswith(pre)
            }
            if not wanted:
                continue
            try:
                tab = pq.read_table(
                    f"{local}/{t['path']}", filesystem=fs
                )
            except Exception:
                continue  # vacuumed sidecar: those files must scan
            cols = tab.column_names
            for i in range(tab.num_rows):
                f = tab.column("file")[i].as_py()
                if f in wanted:
                    m = (
                        tab.column("m_bits")[i].as_py()
                        if "m_bits" in cols else t["m_bits"]
                    )
                    out[pre + f] = (
                        tab.column("bloom")[i].as_py(), m or t["m_bits"]
                    )
        return out

    def _key_candidates(self, s: str, rels: list) -> list:
        """Shard + key-range manifest pruning for the keys option —
        the same decisions read_published_keys makes."""
        import bisect

        touched = set(self._keys_by_shard)
        ks = self._file_stats.get(s) or {}
        kept = []
        for rel in rels:
            sh = _shard_of(rel)
            shard = int(sh) if sh is not None and sh.isdigit() else None
            if shard not in touched:
                continue
            st = ks.get(rel)
            if st is not None and st[0] is not None:
                # unknown-bounds entries ([None, None, n]) fall through
                # to must-scan: bisecting None against int would crash
                # planning with TypeError instead of degrading
                lo, hi = st[0], st[1]
                kl = self._keys_by_shard.get(shard, [])
                i = bisect.bisect_left(kl, lo)
                if not (i < len(kl) and kl[i] <= hi):
                    continue
            kept.append(rel)
        return kept

    def partitions(self):
        from v6spark.operators.pruning import file_can_match_any

        parts = []
        kept_log: dict[str, list] = {}
        bloom_cache: dict | None = None
        cand_by_split: dict[str, list] = {}
        if self._keys is not None:
            cand_by_split = {
                s: self._key_candidates(s, self._files[s])
                for s in sorted(self._files)
            }
            bloom_cache = self._bloom_map(
                [rel for fl in cand_by_split.values() for rel in fl]
            )
        for s in sorted(self._files):
            cs = self._col_stats.get(s) or {}
            ks = self._file_stats.get(s) or {}
            rels = self._files[s]
            if self._keys is not None:
                rels = cand_by_split.get(s, [])
                if bloom_cache:
                    from v6spark.operators.keybloom import (
                        K_HASHES,
                        might_contain,
                    )

                    khash = (self._kb or {}).get("k", K_HASHES)
                    rels = [
                        rel for rel in rels
                        if (ent := bloom_cache.get(rel)) is None
                        or any(
                            might_contain(
                                bytes(ent[0]), key, ent[1], khash
                            )
                            for key in self._keys_by_shard.get(
                                int(_shard_of(rel) or -1), []
                            )
                        )
                    ]
            kept = []
            for rel in rels:
                stats = dict(cs.get(rel) or {})
                if self._key_col and self._key_col not in stats \
                        and rel in ks:
                    stats[self._key_col] = ks[rel][:2]
                stats.setdefault("split", [s, s, 0])
                if file_can_match_any(self.groups, stats):
                    kept.append(rel)
            kept_log[s] = kept
            entries = [
                (rel, s, _shard_of(rel),
                 tuple(self._dv.get((s, rel), ())))
                for rel in kept
            ]
            parts.extend(self._bin_by_bytes(entries))
        if self.observer_path:
            with open(self.observer_path, "w") as f:
                json.dump(kept_log, f)
        if not parts:
            # one empty marker partition: a fully pruned read still
            # returns a typed empty frame
            parts.append(CorpusPartition(files=()))
        return parts

    def _bin_by_bytes(self, entries: list) -> list:
        """First-fit file groups of ~max_partition_bytes each (sizes
        from ONE batched filesystem stat call): a publish of many
        small files reads in few Python tasks, a 100 TB table still
        fans out one task per large file — Spark's maxPartitionBytes
        posture for the Python scan path."""
        if not entries:
            return []
        fs, local = _fs_for(self.root)
        infos = fs.get_file_info(
            [f"{local}/{rel}" for rel, _s, _sh, _dv in entries]
        )
        bins: list[list] = []
        bin_bytes = 0
        cur: list = []
        for ent, info in zip(entries, infos):
            size = info.size or 0
            if cur and bin_bytes + size > self.max_partition_bytes:
                bins.append(cur)
                cur, bin_bytes = [], 0
            cur.append(ent)
            bin_bytes += size
        if cur:
            bins.append(cur)
        return [CorpusPartition(files=tuple(b)) for b in bins]

    def _log_decode(self, md, rel: str, keep: list, read_cols: list):
        """Executor-side test/stress hook (``_decodeObserverDir``):
        one JSON file per data file decoded, recording how much of
        the file the projection + row-group skipping actually
        selected.  Local-filesystem only — never on by default."""
        import os
        import uuid

        sel = set(read_cols)
        kept = set(keep)
        b_sel = b_tot = 0
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                col = rg.column(j)
                b_tot += col.total_compressed_size
                if i in kept and (
                    col.path_in_schema in sel
                    or col.path_in_schema.split(".", 1)[0] in sel
                ):
                    b_sel += col.total_compressed_size
        rec = {
            "file": rel,
            "row_groups_total": md.num_row_groups,
            "row_groups_read": len(keep),
            "columns_read": sorted(read_cols),
            "bytes_selected": b_sel,
            "bytes_total": b_tot,
        }
        name = f"{os.getpid()}_{uuid.uuid4().hex}.json"
        with open(os.path.join(self._decode_dir, name), "w") as f:
            json.dump(rec, f)

    def read(self, part: CorpusPartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from v6spark.operators.pruning import file_can_match_any

        target = to_arrow_schema(self.spark_schema)
        proj = [f.name for f in target]
        # decode ONLY the projection + the filter's columns: with
        # option("columns") the SQL front door stops paying full-width
        # decode (Spark 4.1's Python source has no column-pruning
        # hook, so narrowing rides the declared schema)
        want = list(dict.fromkeys(
            proj + [c for c in self._mask_cols if c not in proj]
        ))
        fs, local = _fs_for(self.root)
        for rel, split, shard, dv_tuple in part.files:
            handle = fs.open_input_file(f"{local}/{rel}")
            try:
                pf = pq.ParquetFile(handle)
                phys = set(pf.schema_arrow.names)
                read_cols = [
                    c for c in want if c in phys and c != "split"
                ]
                if not read_cols:
                    # pure-virtual projection (split/shard only): one
                    # cheapest physical column drives the row counts
                    read_cols = [pf.schema_arrow.names[0]]
                md = pf.metadata
                starts, acc = [], 0
                for i in range(md.num_row_groups):
                    starts.append(acc)
                    acc += md.row_group(i).num_rows
                keep = list(range(md.num_row_groups))
                if self.groups and len(keep) > 1:
                    # row-group skipping: the SAME advisory matcher
                    # that pruned files, now against footer stats —
                    # groups the predicate refutes never decode
                    keep = [
                        i for i in keep
                        if file_can_match_any(
                            self.groups, _rg_stats(md, i, split, shard)
                        )
                    ]
                if self._decode_dir:
                    self._log_decode(md, rel, keep, read_cols)
                if not keep:
                    continue
                dv = np.asarray(dv_tuple, dtype=np.int64)
                if dv.size:
                    # DV positions are file row ordinals, so each kept
                    # group carries its own start offset
                    spans = [([g], starts[g]) for g in keep]
                else:
                    spans = [(keep, 0)]
                for row_groups, offset in spans:
                    for batch in pf.iter_batches(
                        row_groups=row_groups, columns=read_cols
                    ):
                        n = batch.num_rows
                        if dv.size:
                            # position = row ordinal within the file
                            # (the address _metadata.row_index gives
                            # JVM readers)
                            mask = ~np.isin(
                                np.arange(offset, offset + n), dv
                            )
                            offset += n
                            if not mask.all():
                                batch = batch.filter(pa.array(mask))
                                n = batch.num_rows
                        else:
                            offset += n
                        names = set(batch.schema.names)

                        def col_for(name, n=n, batch=batch,
                                    names=names):
                            if name == "split":
                                return pa.array([split] * n)
                            if name == "shard" and name not in names:
                                # directory-recovered partition value,
                                # matching read_published_corpus's
                                # basePath recovery
                                return pa.array([shard] * n)
                            if name in names:
                                return batch.column(name)
                            # pre-evolution file: the added column is
                            # all-NULL (typed at projection time)
                            return pa.nulls(n)

                        if self.groups:
                            # the where option filters ROWS exactly
                            # (the same predicate that pruned files
                            # and row groups), SQL NULL semantics —
                            # BEFORE the cast, so dropped rows never
                            # pay projection work
                            mask = _group_mask(
                                {c: col_for(c) for c in self._mask_cols},
                                self.groups, n,
                            )
                            if not mask.all():
                                batch = batch.filter(pa.array(mask))
                                n = batch.num_rows
                                names = set(batch.schema.names)
                        arrays = []
                        for field in target:
                            col = col_for(field.name, n, batch, names)
                            if pa.types.is_null(col.type):
                                arrays.append(pa.nulls(n, field.type))
                            else:
                                arrays.append(col.cast(field.type))
                        yield pa.RecordBatch.from_arrays(
                            arrays, schema=target
                        )
            finally:
                # one leaked native handle per file per task adds up
                # in long-running executors
                handle.close()


#: option("meta", ...) modes: the Delta DESCRIBE HISTORY / Iceberg
#: metadata-table surfaces through plain spark.read
_META_HISTORY_DDL = (
    "version long, timestamp double, operation string, "
    "details string, schema_changed boolean, txn_id string"
)
_META_FILES_DDL = (
    "split string, shard int, file string, rows long, "
    "key_min string, key_max string, dv_deleted long"
)


def _history_rows(root: str, branch: str | None) -> list[tuple]:
    """JVM-free twin of :func:`v6spark.pipeline.published_history`
    (parity-pinned in tests): newest first, manifest-sized work."""
    from v6spark.pipeline import _classify_operation

    log = _log_dir(root, branch)
    times = dict(_manifest_times(log))
    rows: list[tuple] = []
    docs: dict[int, dict | None] = {}

    def _doc_at(v: int):
        if v not in docs:
            docs[v] = _read_doc(log, v) if v >= 1 else None
        return docs[v]

    from v6spark.pipeline import _commit_txn

    for v in sorted(times, reverse=True):
        doc = _doc_at(v)
        if doc is None:
            continue  # torn / pending-intent
        op, details = _classify_operation(doc)
        rows.append((
            v,
            float(times.get(v, 0.0)),
            op,
            json.dumps(details, default=str, sort_keys=True),
            bool(doc.get("schema_changed")),
            _commit_txn(doc, _doc_at(v - 1), v),
        ))
    return rows


def _files_rows(root: str, doc: dict) -> list[tuple]:
    """JVM-free twin of :func:`v6spark.pipeline.published_file_census`
    (the Iceberg ``files`` metadata table) for a resolved manifest."""
    from v6spark.pipeline import _doc_file_stats, _doc_files

    files = _doc_files(None, root, doc)
    if files is None:
        files = _split_files(root, doc)
    stats = _doc_file_stats(None, root, doc)
    dv_files = (doc.get("dv") or {}).get("files") or {}

    rows: list[tuple] = []
    for s in sorted(files):
        for rel in files[s]:
            st = (stats.get(s) or {}).get(rel)
            sh = _shard_of(rel)
            rows.append((
                s,
                int(sh) if sh is not None else None,
                rel,
                int(st[2]) if st and len(st) > 2 and st[2] is not None
                else None,
                str(st[0]) if st and st[0] is not None else None,
                str(st[1]) if st and st[1] is not None else None,
                int((dv_files.get(s) or {}).get(rel, 0)),
            ))
    return rows


_META_DETAIL_DDL = (
    "version long, committed_at double, fmt string, "
    "table_schema string, splits string, rows_total long, "
    "n_shards int, seed long, key_col string, n_files long, "
    "live_version_dirs int, dv_files int, dv_deleted_rows long, "
    "key_bloom boolean, sketches string, clustered_by string, "
    "constraints string, retention string, "
    "manifest_offloaded_entries long"
)


def _detail_rows(root: str, doc: dict, version: int,
                 branch: str | None = None) -> list[tuple]:
    """JVM-free one-row twin of
    :func:`v6spark.pipeline.describe_published` (shared field
    assembly; nested values land as JSON strings for a flat SQL
    schema)."""
    from v6spark.pipeline import (
        _describe_fields,
        _doc_files,
    )

    manifest_ref = doc.get("manifest_ref") or {}
    files = _doc_files(None, root, doc)
    if files is None:
        files = _split_files(root, doc)
    n_files = sum(len(fl) for fl in files.values())
    times = dict(_manifest_times(_log_dir(root, branch)))
    d = _describe_fields(
        version, doc, times.get(version), n_files, manifest_ref
    )
    return [(
        d["version"],
        d["committed_at"],
        d["fmt"],
        json.dumps(d["schema"]),
        json.dumps(d["splits"], sort_keys=True),
        d["rows_total"],
        d["n_shards"],
        d["seed"],
        d["key_col"],
        d["n_files"],
        d["live_version_dirs"],
        d["dv_files"],
        d["dv_deleted_rows"],
        d["key_bloom"],
        json.dumps(d["sketches"]),
        json.dumps(d["clustered_by"]),
        json.dumps(d["constraints"], sort_keys=True),
        json.dumps(d["retention"], sort_keys=True),
        d["manifest_offloaded_entries"],
    )]


@dataclass
class _MetaPartition(InputPartition):
    rows: tuple = ()


class PublishedMetaReader(DataSourceReader):
    """Reader for the ``meta`` option: the rows are derived from the
    MANIFESTS alone at plan time (driver-side, manifest-sized — the
    same posture as CDC window planning) and shipped in one
    partition; no data file is touched at any corpus size."""

    def __init__(self, rows: list[tuple]):
        self._rows = tuple(rows)

    def partitions(self):
        return [_MetaPartition(rows=self._rows)]

    def read(self, part):
        yield from part.rows


class PublishedCorpusDataSource(DataSource):
    """``format("pubcorpus")`` — options:

    - ``path`` (or ``.load(root)``): the publish root;
    - ``version`` / ``tag`` / ``branch`` / ``asOf``: time travel —
      ``asOf`` is TIMESTAMP AS OF (epoch seconds or ISO-8601; naive =
      UTC), resolved to the newest committed version whose manifest
      commit time (file mtime, monotonically adjusted Delta-style) is
      at or before it; composes with ``branch`` (mutually
      exclusive the same way the Python readers enforce);
    - ``split``: restrict to one split (the column still rides);
    - ``keys``: a JSON array of key values — POINT LOOKUPS through
      SQL: shard-directory pruning via a Spark-exact pure-Python
      xxhash64 (:mod:`v6spark.operators.xxh64`), per-file key-range
      stats, and the per-file Bloom sidecars, i.e.
      ``read_published_keys`` semantics (rows restricted to the
      keys); composes with ``where`` (AND);
    - ``where``: a SQL predicate in the prunable grammar
      (comparisons, IN, BETWEEN, LIKE 'prefix%', IS [NOT] NULL,
      AND/OR over the published columns + split) — prunes FILES from
      the manifest's col_stats AND filters rows exactly, i.e.
      ``read_published_where`` semantics through spark.read.  This is
      an OPTION rather than pushFilters because Spark 4.1 caches
      pushdown-planned partitions on shared relations (see the module
      section above) — options are relation identity, always safe;
    - ``columns``: comma-separated projection — the column pruning
      for this source (Spark 4.1's Python DataSource has no pruning
      hook, so ``.select()`` alone cannot narrow the decode): the
      declared schema shrinks to these columns and the reader decodes
      only them plus any ``where``/``keys`` filter columns (dropped
      before yield).  ``split``/``shard`` may be projected;
    - ``changesFrom`` / ``changesTo``: a BATCH change window — the
      rows the CDC stream emits for ``(changesFrom, changesTo]``
      (``changesTo`` defaults to latest), i.e. Delta's
      ``table_changes(a, b)`` through plain spark.read; switches the
      schema to the change shape like ``startingVersion`` does for
      streams (see :mod:`v6spark.sources.pubcdc`).  The
      ``changesFromTimestamp`` / ``changesToTimestamp`` twins take
      timestamps instead (same accepted forms as ``asOf``); a lower
      bound predating the log means "everything" (bootstrap), and
      ``option("startingTimestamp", ts)`` is the streaming
      equivalent (Delta CDF parity);
    - ``meta``: metadata tables through plain spark.read —
      ``"history"`` (the commit log: DESCRIBE HISTORY; composes with
      ``branch``), ``"files"`` (the per-file census: the Iceberg
      ``files`` metadata table), or ``"detail"`` (the one-row table
      summary: DESCRIBE DETAIL) — the latter two compose with
      version/tag/asOf/branch.  Manifest-only: zero data reads at
      any corpus size; parity-pinned against
      ``pipeline.published_history`` / ``published_file_census`` /
      ``describe_published``;
    - ``maxBytesPerPartition`` (default 128 MB): surviving files
      group into read tasks of about this size — many small files
      share one Python task, large files fan out;
    - ``_scanObserverPath``: test hook — planning writes the
      {split: [files kept]} decision as JSON to this local path.
    """

    @classmethod
    def name(cls) -> str:
        return "pubcorpus"

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "pubcorpus needs a path: spark.read.format('pubcorpus')"
                ".load(<publish root>)"
            )
        return path

    def _doc(self) -> dict:
        if getattr(self, "_doc_cache", None) is not None:
            return self._doc_cache
        root = self._root()
        version = self.options.get("version")
        tag = self.options.get("tag")
        branch = self.options.get("branch")
        as_of = self.options.get("asof", self.options.get("asOf"))
        if tag is not None and (version is not None or branch is not None):
            raise ValueError("pass version=, tag=, or branch= — tag is "
                             "exclusive with the others")
        if as_of is not None and (version is not None or tag is not None):
            raise ValueError(
                "pass asOf=, version=, or tag= — one time-travel "
                "reference at a time"
            )
        log = _log_dir(root, branch)
        if tag is not None:
            version = _resolve_tag(_log_dir(root, None), tag)
        if as_of is not None:
            # TIMESTAMP AS OF (Delta parity): composes with branch=
            # (resolved against that branch's log)
            version = _resolve_as_of(log, _parse_as_of(as_of))
        if version is None:
            v, doc = _read_latest(log)
        else:
            v, doc = int(version), _read_doc(log, int(version))
        self._doc_version = v
        if doc is None:
            raise ValueError(
                f"{root} has no committed publish at that reference "
                f"(version={version}, tag={tag}, branch={branch})"
            )
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "pubcorpus reads parquet publishes; this one is "
                f"{doc.get('fmt')!r}"
            )
        if not doc.get("schema"):
            raise ValueError(
                "pubcorpus needs a manifest-recorded schema (pre-stats "
                "publishes: use read_published_corpus)"
            )
        self._doc_cache = doc
        return doc

    def _version_floor(self, ts_value, *, missing_means_zero: bool):
        """Timestamp -> version for the change-window options.  As a
        LOWER bound (changes-since semantics): the newest committed
        version STRICTLY before the timestamp, so a commit made
        exactly AT the timestamp is inside the window — Delta CDF's
        at-or-after ``startingTimestamp``; predating the log floors
        to 0 ("everything").  As an UPPER bound: at-or-before
        inclusive, and predating the log is an error (the window
        would be vacuously empty)."""
        ts = _parse_as_of(ts_value)  # parse errors must propagate
        # schema() and reader() both evaluate the window options:
        # memoize so planning lists/reads the log once per bound
        key = (ts, missing_means_zero)
        cache = getattr(self, "_floor_cache", None)
        if cache is None:
            cache = self._floor_cache = {}
        if key in cache:
            return cache[key]
        log = _log_dir(self._root(), self.options.get("branch"))
        try:
            out = _resolve_as_of(log, ts, strict=missing_means_zero)
        except ValueError:
            if not missing_means_zero:
                raise
            out = 0
        cache[key] = out
        return out

    def _starting_version(self):
        sv = self.options.get(
            "startingversion", self.options.get("startingVersion")
        )
        st = self.options.get(
            "startingtimestamp", self.options.get("startingTimestamp")
        )
        if st is not None:
            if sv is not None:
                raise ValueError(
                    "startingVersion and startingTimestamp are "
                    "exclusive"
                )
            # changes committed AFTER the timestamp (Delta CDF
            # startingTimestamp): offsets begin at the snapshot at or
            # before it; predating the log = bootstrap from 0
            return self._version_floor(st, missing_means_zero=True)
        return sv

    def _changes_from(self):
        cf = self.options.get(
            "changesfrom", self.options.get("changesFrom")
        )
        cft = self.options.get(
            "changesfromtimestamp",
            self.options.get("changesFromTimestamp"),
        )
        if cft is not None:
            if cf is not None:
                raise ValueError(
                    "changesFrom and changesFromTimestamp are "
                    "exclusive"
                )
            return self._version_floor(cft, missing_means_zero=True)
        return cf

    def _changes_to(self):
        ct = self.options.get(
            "changesto", self.options.get("changesTo")
        )
        ctt = self.options.get(
            "changestotimestamp",
            self.options.get("changesToTimestamp"),
        )
        if ctt is not None:
            if ct is not None:
                raise ValueError(
                    "changesTo and changesToTimestamp are exclusive"
                )
            return self._version_floor(ctt, missing_means_zero=False)
        return ct

    def _meta(self) -> str | None:
        mode = self.options.get("meta")
        if mode is None:
            return None
        mode = str(mode).lower()
        if mode not in ("history", "files", "detail"):
            raise ValueError(
                f"meta must be 'history' (the commit log — DESCRIBE "
                f"HISTORY), 'files' (the per-file census), or "
                f"'detail' (the one-row table summary — DESCRIBE "
                f"DETAIL), got {mode!r}"
            )
        for opt in ("columns", "where", "keys", "split",
                    "changesFrom", "changesfrom", "changesTo",
                    "changesto", "startingVersion", "startingversion"):
            if self.options.get(opt) is not None:
                raise ValueError(
                    f"{opt} does not apply to meta reads"
                )
        if mode == "history":
            for opt in ("version", "tag", "asOf", "asof"):
                if self.options.get(opt) is not None:
                    raise ValueError(
                        "history IS the whole retained log — "
                        f"{opt} does not apply (filter on the "
                        "version column instead)"
                    )
        return mode

    def schema(self) -> str:
        meta = self._meta()
        if meta == "history":
            # a typo'd path must raise like every other read surface,
            # not return a plausible empty history
            log = _log_dir(self._root(), self.options.get("branch"))
            if _read_latest(log)[1] is None:
                raise ValueError(
                    f"{self._root()} has no committed publish "
                    "(branch="
                    f"{self.options.get('branch')!r}) — nothing to "
                    "list history for"
                )
            return _META_HISTORY_DDL
        if meta == "files":
            self._doc()  # existence + fmt validation, fail at plan
            return _META_FILES_DDL
        if meta == "detail":
            self._doc()
            return _META_DETAIL_DDL
        doc = self._doc()
        if (
            self._starting_version() is not None
            and self._changes_from() is not None
        ):
            raise ValueError(
                "startingVersion (stream) and changesFrom (batch "
                "window) are exclusive"
            )
        if (
            self._starting_version() is not None
            or self._changes_from() is not None
        ):
            # the stream-only option doubles as the schema switch:
            # Spark's Python DataSource shares one schema() between
            # batch and stream, and the CDC row shape differs (see
            # v6spark.sources.pubcdc)
            from v6spark.sources.pubcdc import change_schema_ddl

            for opt in ("columns", "where", "keys", "split", "tag",
                        "version", "asOf", "asof"):
                if self.options.get(opt) is not None:
                    raise ValueError(
                        f"{opt} does not apply to change reads "
                        "(startingVersion/changesFrom) — consume the "
                        "full change rows and filter downstream"
                    )
            return change_schema_ddl(doc)
        # the two storage-derived columns read_published_corpus
        # carries: shard (directory-recovered partition value; string
        # — the project session posture pins
        # partitionColumnTypeInference off) then split
        known = dict(doc["schema"])
        known["shard"] = "string"
        known["split"] = "string"
        cols = self.options.get("columns")
        if cols is None:
            return ", ".join(f"`{n}` {t}" for n, t in known.items())
        # option("columns", "a,b") IS the column pruning for this
        # source: Spark 4.1's Python DataSource has no pruning hook,
        # so the projection rides the declared schema and the reader
        # decodes only these columns (+ any filter columns, dropped
        # before yield)
        names = [c.strip() for c in cols.split(",") if c.strip()]
        if not names:
            raise ValueError(
                'columns must name at least one column, e.g. '
                'option("columns", "doc_id,text")'
            )
        if len(set(names)) != len(names):
            raise ValueError(f"columns lists a column twice: {cols!r}")
        unknown = [c for c in names if c not in known]
        if unknown:
            raise ValueError(
                f"columns references unknown column(s) {unknown}; "
                f"published columns are {sorted(known)}"
            )
        return ", ".join(f"`{n}` {known[n]}" for n in names)

    def streamReader(self, schema):
        """``readStream.format("pubcorpus")`` is the ROW-LEVEL change
        feed (insert/delete/update_preimage/update_postimage rows per
        committed version window) — see :mod:`v6spark.sources.pubcdc`.
        Requires ``startingVersion`` (0 bootstraps with the current
        snapshot as inserts; the current version tails new commits)."""
        if self.options.get("meta") is not None:
            raise ValueError(
                "meta is a batch read option (metadata tables don't "
                "stream)"
            )
        sv = self._starting_version()
        if sv is None:
            raise ValueError(
                "pubcorpus streaming is the row-level change feed: "
                "set option('startingVersion', n) — 0 replays from "
                "the first commit (bootstrap snapshot), the current "
                "version tails only new commits.  The option also "
                "keys the stream's schema."
            )
        from v6spark.sources.pubcdc import PublishedChangesStreamReader

        return PublishedChangesStreamReader(
            self._root(), schema, int(sv), self.options.get("branch")
        )

    def streamWriter(self, schema, overwrite: bool):
        """``df.writeStream.format("pubcorpus")`` — the committed
        append as a streaming sink: one manifest commit per
        microbatch, exactly-once under epoch replay via
        ``option("txnPrefix", ...)`` (see
        :class:`v6spark.sources.pubcorpus_writer.PublishedCorpusStreamWriter`)."""
        from v6spark.sources.pubcorpus_writer import (
            PublishedCorpusStreamWriter,
        )

        return PublishedCorpusStreamWriter(
            self._root(), schema, self.options, overwrite
        )

    def writer(self, schema, overwrite: bool):
        """``df.write.format("pubcorpus").mode("append")`` — the
        committed publish/append through SQL (see
        :mod:`v6spark.sources.pubcorpus_writer`).  Overwrite is
        refused; schema drift is refused; torn writes are invisible."""
        from v6spark.sources.pubcorpus_writer import make_writer

        if self.options.get("meta") is not None:
            raise ValueError("meta is a read option (metadata tables "
                             "are not writable)")
        if self.options.get("branch") is not None:
            raise ValueError(
                "the pubcorpus writer targets main — branch DML goes "
                "through the Python verbs (branch=...)"
            )
        return make_writer(self._root(), schema, self.options, overwrite)

    def reader(self, schema):
        meta = self._meta()
        if meta == "history":
            return PublishedMetaReader(
                _history_rows(self._root(), self.options.get("branch"))
            )
        if meta == "files":
            return PublishedMetaReader(
                _files_rows(self._root(), self._doc())
            )
        if meta == "detail":
            doc = self._doc()
            return PublishedMetaReader(
                _detail_rows(
                    self._root(), doc, self._doc_version,
                    self.options.get("branch"),
                )
            )
        if self._changes_from() is not None:
            # batch change window: the Delta table_changes(a, b)
            # shape over the stream's planner (see sources/pubcdc)
            from v6spark.sources.pubcdc import (
                PublishedChangesBatchReader,
            )

            hi = self._changes_to()
            return PublishedChangesBatchReader(
                self._root(), schema, int(self._changes_from()),
                None if hi is None else int(hi),
                self.options.get("branch"),
            )
        if self._starting_version() is not None:
            raise ValueError(
                "startingVersion is a readStream option (the change "
                "feed); batch change windows: option('changesFrom', "
                "a) [+ 'changesTo'] or "
                "pipeline.published_corpus_changes"
            )
        return PublishedCorpusReader(
            self._root(),
            self._doc(),
            schema,
            self.options.get("split"),
            self.options.get("where"),
            self.options.get("keys"),
            self.options.get("_scanobserverpath")
            or self.options.get("_scanObserverPath"),
            max_partition_bytes=int(self.options.get(
                "maxbytesperpartition",
                self.options.get("maxBytesPerPartition",
                                 128 * 1024 * 1024),
            )),
            decode_observer_dir=self.options.get("_decodeobserverdir")
            or self.options.get("_decodeObserverDir"),
        )


def register_pubcorpus_source(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of ``pubcorpus``."""
    from v6spark.sources import register_idempotent

    register_idempotent(spark, PublishedCorpusDataSource)


def read_pubcorpus(spark, root: str, *, where: str | None = None,
                   columns=None, keys=None, version=None,
                   tag: str | None = None, branch: str | None = None,
                   split: str | None = None, as_of=None,
                   max_bytes_per_partition: int | None = None):
    """One-call front door over ``format("pubcorpus")`` so callers
    don't hand-assemble option strings.

    The pruning/projection knobs are OPTIONS rather than inferred
    from ``.filter()``/``.select()`` because Spark 4.1's Python
    DataSource pushdown poisons shared relations (pushFilters-planned
    partitions are cached on the relation node and reused by
    filterless queries — minimal repro:
    ``scripts/spark_pushdown_bug_repro.py``) and has no
    column-pruning hook at all.  When upstream fixes land, this
    helper is the seam where real pushdown replaces the options
    without touching call sites.

    ``columns`` and ``keys`` accept Python lists (or the raw option
    strings); results are identical to hand-set options — pinned by
    ``tests/test_pubcorpus_source.py``.
    """
    register_pubcorpus_source(spark)
    r = spark.read.format("pubcorpus")
    if where is not None:
        r = r.option("where", where)
    if columns is not None:
        if not isinstance(columns, str):
            columns = ",".join(columns)
        r = r.option("columns", columns)
    if keys is not None:
        if not isinstance(keys, str):
            keys = json.dumps(list(keys))
        r = r.option("keys", keys)
    if version is not None:
        r = r.option("version", int(version))
    if tag is not None:
        r = r.option("tag", tag)
    if as_of is not None:
        r = r.option("asOf", str(as_of))
    if branch is not None:
        r = r.option("branch", branch)
    if split is not None:
        r = r.option("split", split)
    if max_bytes_per_partition is not None:
        r = r.option("maxBytesPerPartition", int(max_bytes_per_partition))
    return r.load(root)


__all__ = [
    "PublishedCorpusDataSource",
    "read_pubcorpus",
    "register_pubcorpus_source",
]
