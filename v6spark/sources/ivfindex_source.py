"""The persistent IVF index as a Spark DataSource —
``spark.read.format("ivfindex").option("query", "[...]").load(root)``.

:mod:`v6spark.sources.ivf_index` built the serving substrate: vectors
partitioned by quantizer cell (``cell=K/`` directories), committed
generations (``gen=*/``) behind a txlog so crashed appends are
invisible, and query helpers whose probe predicate lands in
PartitionFilters.  This module is its SQL front door — the third
option-keyed source after ``pubcorpus``/``publog``, same discipline:

- ``option("query", json_vector)`` ranks cells DRIVER-side against
  the centroid sidecar and plans ONLY the probed cells' files —
  ``nProbe`` of ``nCells`` directories, zero data reads at planning
  (the file-skip twin of the JVM path's partition pruning, asserted
  via ``_scanObserverPath``);
- executors score candidates vectorized (numpy dot over the Arrow
  buffer) and emit each FILE's top-k only, so rows shipped are
  bounded by ``k × files_probed``, never corpus size;
- the final global order is the consumer's ``ORDER BY cosine DESC
  NULLS LAST, <id> LIMIT k`` — TakeOrderedAndProject over an
  already-tiny input (:func:`read_ivf_index_topk` wraps it).

Committed indexes read ONLY live generations (the manifest resolves
through the same JVM-free txlog readers as pubcorpus); a plain
:func:`~v6spark.sources.ivf_index.build_ivf_index` layout (no
``_commits``) reads directly.  Scores match the JVM helpers:
``round(dot/(|v||q|), 6)``, NULL for zero-norm vectors (never NaN —
Spark sorts NaN largest), ties broken by id.
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
from v6spark.sources.pubcorpus import _read_latest

_CENTROIDS_FILE = "_centroids.json"
_COMMITS = "_commits"


def _read_centroids(root: str) -> list:
    fs, local = _fs_for(root)
    try:
        with fs.open_input_stream(f"{local}/{_CENTROIDS_FILE}") as f:
            return json.loads(f.read().decode())
    except FileNotFoundError:
        raise ValueError(
            f"{root} has no {_CENTROIDS_FILE} sidecar — not an IVF "
            "index root (build_ivf_index / build_ivf_index_committed)"
        ) from None


def _live_dirs(root: str) -> list[str]:
    """Generation dirs the committed manifest names, or the root
    itself for a plain (uncommitted) index layout."""
    v, doc = _read_latest(f"{root.rstrip('/')}/{_COMMITS}")
    if doc is None:
        return [""]
    live = doc.get("live") or []
    if not live:
        raise ValueError(f"{root} has an empty committed IVF index")
    return [f"{g}/" for g in live]


def _cell_files(root: str, gens: list[str], cells: set[int]) -> list:
    """(rel_path, cell) for every data file inside the probed cells —
    directory listings only, nothing opened."""
    from pyarrow import fs as pafs

    filesystem, local = _fs_for(root)
    out = []
    for g in gens:
        for c in sorted(cells):
            cdir = f"{local}/{g}cell={c}"
            try:
                infos = filesystem.get_file_info(
                    pafs.FileSelector(cdir, recursive=True)
                )
            except FileNotFoundError:
                continue  # a cell the quantizer never filled
            for i in infos:
                if i.is_file and not i.base_name.startswith(("_", ".")):
                    out.append((i.path[len(local) + 1:], c))
    return out


def _first_file(root: str, gens: list[str]) -> str | None:
    """First data file of the index — TWO directory listings (the
    generation dir, then its first cell dir), not O(nCells): the
    schema only needs one footer to type the id column."""
    from pyarrow import fs as pafs

    filesystem, local = _fs_for(root)
    for g in gens:
        base = f"{local}/{g}".rstrip("/")
        try:
            entries = filesystem.get_file_info(
                pafs.FileSelector(base, recursive=False)
            )
        except FileNotFoundError:
            continue
        for e in sorted(entries, key=lambda x: x.path):
            if not e.base_name.startswith("cell="):
                continue
            sub = filesystem.get_file_info(
                pafs.FileSelector(e.path, recursive=True)
            )
            for i in sorted(sub, key=lambda x: x.path):
                if i.is_file and not i.base_name.startswith(("_", ".")):
                    return i.path[len(local) + 1:]
    return None


@dataclass
class IvfPartition(InputPartition):
    #: (rel_path, cell) — one file per partition: cells are few files
    #: and per-file top-k keeps the emitted rows at k × files
    files: tuple = ()


class IvfIndexReader(DataSourceReader):
    def __init__(self, root: str, query: list, k: int, n_probe: int,
                 id_col: str, vec_col: str,
                 observer_path: str | None = None):
        from v6spark.sources.ivf_index import _probe_cells

        self.root = root
        self.query = [float(x) for x in query]
        self.k = int(k)
        self.id_col = id_col
        self.vec_col = vec_col
        centroids = _read_centroids(root)
        if len(self.query) != len(centroids[0]):
            raise ValueError(
                f"query dimension {len(self.query)} != index dimension "
                f"{len(centroids[0])}"
            )
        probe = _probe_cells(centroids, self.query, int(n_probe))
        gens = _live_dirs(root)
        self._files = _cell_files(root, gens, set(probe))
        if observer_path:
            total = _cell_files(root, gens, set(range(len(centroids))))
            with open(observer_path, "w") as f:
                json.dump({
                    "cells_total": len(centroids),
                    "cells_probed": sorted(probe),
                    "files_total": len(total),
                    "files_planned": sorted(r for r, _c in self._files),
                }, f)

    def partitions(self):
        parts = [IvfPartition(files=(ent,)) for ent in self._files]
        return parts or [IvfPartition()]

    def _batch(self, rows, pa):
        return pa.RecordBatch.from_arrays(
            [
                pa.array([r[1] for r in rows]),
                pa.array([r[0] for r in rows], type=pa.float64()),
                pa.array([r[2] for r in rows], type=pa.int32()),
            ],
            names=[self.id_col, "cosine", "cell"],
        )

    def read(self, part: IvfPartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        fs, local = _fs_for(self.root)
        q = np.asarray(self.query, dtype=np.float64)
        qn = float(np.sqrt((q * q).sum()))
        for rel, cell in part.files:
            t = pq.read_table(
                f"{local}/{rel}", columns=[self.id_col, self.vec_col],
                filesystem=fs,
            )
            ids = t.column(self.id_col).to_pylist()
            if not ids:
                continue
            arr = t.column(self.vec_col).combine_chunks()
            flat = np.asarray(arr.flatten(), dtype=np.float64)
            d = len(q)
            if pa.types.is_fixed_size_list(arr.type):
                ragged = arr.type.list_size != d
            else:
                ragged = not (
                    np.diff(np.asarray(arr.offsets)) == d
                ).all()
            if ragged or flat.size != len(ids) * d:
                raise ValueError(
                    f"{rel}: ragged {self.vec_col} vectors (expected "
                    f"dimension {d})"
                )
            mat = flat.reshape(-1, d)
            dots = mat @ q
            norms = np.sqrt((mat * mat).sum(axis=1))
            denom = norms * qn
            # zero-norm vectors score NULL (sorted last), matching
            # cosine_topk_query — NaN would sort LARGEST in Spark
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom > 0.0, dots / denom, np.nan)
            sims = np.round(sims, 6)
            rows = [
                (
                    None if np.isnan(s) else float(s),
                    ids[i],
                    int(cell),
                )
                for i, s in enumerate(sims)
            ]
            if len(rows) <= self.k:
                yield self._batch(rows, pa)
                continue
            # per-file top-k by (non-null first, score desc, id asc)
            # — the id tie-break uses the column's NATIVE ordering so
            # score ties (incl. NULL scores) at the k boundary keep
            # exactly the rows the JVM twin's
            # orderBy(cosine desc nulls last, id) keeps
            rows.sort(
                key=lambda r: (
                    r[0] is None, -(r[0] if r[0] is not None else 0.0),
                )
            )
            top = rows[: self.k]
            if rows[self.k][0] == rows[self.k - 1][0]:
                cut = rows[self.k - 1][0]
                tied = sorted(
                    (r for r in rows if r[0] == cut),
                    key=lambda r: r[1],
                )
                head = [r for r in top if r[0] != cut]
                top = head + tied[: self.k - len(head)]
            yield self._batch(top, pa)


class IvfIndexDataSource(DataSource):
    """``format("ivfindex")`` — options:

    - ``path``: the index root (plain or committed layout);
    - ``query`` (required): the query vector as a JSON array — ranks
      cells at plan time; only the probed cells' files are read;
    - ``nProbe`` (default 4): cells to probe;
    - ``k`` (default 10): per-file candidate count — the consumer's
      ``ORDER BY cosine DESC NULLS LAST LIMIT k`` finishes the query
      (:func:`read_ivf_index_topk` wraps it);
    - ``idCol`` / ``vecCol`` (defaults ``vec_id`` / ``embedding``);
    - ``_scanObserverPath``: test hook — records cells/files planned
      vs total (the file-skip evidence).
    """

    @classmethod
    def name(cls) -> str:
        return "ivfindex"

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "ivfindex needs a path: spark.read.format('ivfindex')"
                ".load(<index root>)"
            )
        return path

    def _id_col(self) -> str:
        return self.options.get("idcol") or self.options.get(
            "idCol"
        ) or "vec_id"

    def schema(self) -> str:
        """Id column typed from one parquet FOOTER of the index (KB
        metadata read at plan time)."""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type

        root = self._root()
        id_col = self._id_col()
        _read_centroids(root)  # fail fast on a non-index root
        first = _first_file(root, _live_dirs(root))
        if first is None:
            raise ValueError(f"{root} holds no index data files")
        fs, local = _fs_for(root)
        handle = fs.open_input_file(f"{local}/{first}")
        try:
            sch = pq.ParquetFile(handle).schema_arrow
        finally:
            handle.close()
        if id_col not in sch.names:
            raise ValueError(
                f"id column {id_col!r} is not in the index "
                f"({sch.names}) — pass option('idCol', ...)"
            )
        ddl = from_arrow_type(sch.field(id_col).type).simpleString()
        return f"`{id_col}` {ddl}, `cosine` double, `cell` int"

    def reader(self, schema) -> IvfIndexReader:
        raw = self.options.get("query")
        if raw is None:
            raise ValueError(
                'ivfindex needs the query vector: option("query", '
                '"[0.1, 0.2, ...]")'
            )
        try:
            vec = json.loads(raw)
        except ValueError:
            vec = None
        if not isinstance(vec, list) or not vec:
            raise ValueError(
                f"query must be a non-empty JSON array, got {raw!r}"
            )
        return IvfIndexReader(
            self._root(), vec,
            self.options.get("k", 10),
            self.options.get("nprobe", self.options.get("nProbe", 4)),
            self._id_col(),
            self.options.get("veccol") or self.options.get("vecCol")
            or "embedding",
            self.options.get("_scanobserverpath")
            or self.options.get("_scanObserverPath"),
        )


def register_ivfindex_source(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of ``ivfindex``."""
    from v6spark.sources import register_idempotent

    register_idempotent(spark, IvfIndexDataSource)


def read_ivf_index_topk(spark, root: str, query_vec, k: int = 10,
                        n_probe: int = 4, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """One-call parity twin of
    :func:`v6spark.sources.ivf_index.ivf_index_topk_committed`
    through the SQL source: the source emits per-file candidates,
    TakeOrderedAndProject finishes globally."""
    from pyspark.sql import functions as F

    register_ivfindex_source(spark)
    df = (
        spark.read.format("ivfindex")
        .option("query", json.dumps([float(x) for x in query_vec]))
        .option("k", int(k)).option("nProbe", int(n_probe))
        .option("idCol", id_col).option("vecCol", vec_col)
        .load(root)
    )
    return (
        df.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc_nulls_last(), id_col)
        .limit(int(k))
    )


__all__ = [
    "IvfIndexDataSource",
    "read_ivf_index_topk",
    "register_ivfindex_source",
]
