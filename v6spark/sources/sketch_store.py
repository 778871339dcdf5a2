"""Txlog-committed persisted sketch store: incremental corpus
monitoring without rescans.

The pattern the 100 TB pipeline needs: as each ingest slice (a crawl
day, a shard batch, a stream micro-batch) lands, sketch it ONCE —
map-side, a few KB of register state per slice — and commit the
registers under the same versioned-manifest transaction discipline as
every other store in this repo (txlog.py; same layout family as
sources/ivf_index.py).  Any later question — "distinct users over
March", "p99 doc length for slices 3..9", "frequency of this token
corpus-wide" — is answered by MERGING the relevant register rows:
kilobytes read, zero corpus scans, and the answers carry the
sketches' published error guarantees (operators/sketches.py).

Layout::

    {path}/gen=000001/{name}/part-*.parquet   -- one dir per sketch
    {path}/gen=a000007/{name}/...             -- appended slices
    {path}/_commits/manifest-XXXXXXXXXXXX     -- txlog manifests

Manifest payload: ``{"live": [gen...], "committed": [append ids],
"part_col": ..., "specs": {name: spec}}`` — the specs (sketch kind,
column, precision) are recorded AT BUILD TIME so every reader
estimates with the parameters the registers were built under;
readers never re-specify p/alpha/width.

Crash/replay contract (inherited from the IVF store): data writes go
to a generation directory named by the append id, the manifest
commit is the transaction, replays of committed ids skip, concurrent
appends with distinct ids serialize through optimistic
``commit_with_retry``.  ``compact`` folds generations (the
small-files fix for long-running streams), ``vacuum`` sweeps
orphans; both preserve the committed-id set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from v6spark.operators import sketches as _sk

_COMMITS = "_commits"

_KINDS = ("hll", "dds", "cm")


def _validate_specs(specs: dict) -> None:
    for name, spec in specs.items():
        kind = spec.get("kind")
        if kind not in _KINDS:
            raise ValueError(f"sketch {name!r}: kind must be one of {_KINDS}")
        if "col" not in spec:
            raise ValueError(f"sketch {name!r}: missing 'col'")


def _live(spark: SparkSession, path: str) -> tuple[int, list[str], set, dict]:
    from v6spark import txlog

    version, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    if doc is None:
        return 0, [], set(), {}
    return version, list(doc["live"]), set(doc["committed"]), doc


def _build_one(df: DataFrame, spec: dict, part_col: str) -> DataFrame:
    groups = [part_col, *spec.get("group_cols", [])]
    kind = spec["kind"]
    if kind == "hll":
        return _sk.hll_sketch(df, spec["col"], groups, p=spec.get("p", 12))
    if kind == "dds":
        return _sk.dds_sketch(
            df, spec["col"], groups, alpha=spec.get("alpha", 0.01)
        )
    return _sk.cm_sketch(
        df,
        spec["col"],
        groups,
        depth=spec.get("depth", 4),
        width=spec.get("width", 2048),
    )


def _write_generation(
    df: DataFrame, path: str, gen: str, specs: dict, part_col: str
) -> None:
    for name, spec in specs.items():
        _build_one(df, spec, part_col).write.mode("overwrite").parquet(
            f"{path}/{gen}/{name}"
        )


def build_sketch_store(
    df: DataFrame,
    path: str,
    specs: dict,
    part_col: str,
    commit_mode: str = "rename",
) -> None:
    """Sketch ``df`` under every spec into generation 1 and commit.

    ``specs``: ``{name: {"kind": "hll"|"dds"|"cm", "col": ...,
    "group_cols": [...], <kind params>}}``.  ``part_col`` is the
    slice key every register row is tagged with — the unit of
    incremental append and of estimate-time subsetting.
    """
    from v6spark import txlog

    _validate_specs(specs)
    spark = df.sparkSession
    version, _live_gens, _committed, _doc = _live(spark, path)
    if version:
        raise ValueError(
            f"{path} already holds a committed sketch store (version "
            f"{version}); append or build elsewhere"
        )
    gen = "gen=000001"
    _write_generation(df, path, gen, specs, part_col)
    txlog.publish(
        spark,
        f"{path}/{_COMMITS}",
        1,
        {"live": [gen], "committed": [], "part_col": part_col, "specs": specs},
        commit_mode=commit_mode,
    )


def append_sketch_store(
    df: DataFrame,
    path: str,
    append_id: int | None = None,
    commit_mode: str = "rename",
    _fail_after: str | None = None,
) -> None:
    """Sketch a NEW slice into a fresh generation and commit — the
    incremental path: the 100 TB corpus is touched only for the new
    rows; history stays as registers.

    Same transaction contract as the IVF append: ``append_id`` is
    the idempotency key (streaming callers pass the epoch/batch id —
    replays of a committed id return without writing), defaulting to
    max(committed)+1 for serial batch callers; distinct ids append
    concurrently through optimistic manifest commits.
    ``_fail_after="data"`` injects the crash window between the data
    write and the commit for the tests.
    """
    from v6spark import txlog

    spark = df.sparkSession
    version, _gens, committed, doc = _live(spark, path)
    if not version:
        raise ValueError(f"{path} has no committed sketch store to append to")
    if append_id is None:
        append_id = max(committed, default=-1) + 1
    elif append_id in committed:
        return  # replayed after commit
    specs, part_col = doc["specs"], doc["part_col"]
    gen = f"gen=a{append_id:06d}"
    _write_generation(df, path, gen, specs, part_col)
    if _fail_after == "data":
        raise RuntimeError("injected crash after sketch data write")

    def update(_version, cur):
        cur_live = list(cur["live"]) if cur else []
        cur_committed = set(cur["committed"]) if cur else set()
        if append_id in cur_committed:
            raise txlog.AbortCommit
        return {
            **doc,
            "live": sorted([*cur_live, gen]),
            "committed": sorted(cur_committed | {append_id}),
        }

    txlog.commit_with_retry(
        spark, f"{path}/{_COMMITS}", update, commit_mode=commit_mode
    )


def store_specs(spark: SparkSession, path: str) -> dict:
    """The committed manifest payload (specs, part_col, live set)."""
    version, _gens, _committed, doc = _live(spark, path)
    if not version:
        raise ValueError(f"{path} has no committed sketch store")
    return doc


def read_sketch(
    spark: SparkSession, path: str, name: str, partitions: list | None = None
) -> DataFrame:
    """Raw register rows for one sketch across every live generation,
    optionally filtered to a slice subset (partition values prune at
    the parquet scan — the register files per slice are KBs)."""
    version, live, _committed, doc = _live(spark, path)
    if not version:
        raise ValueError(f"{path} has no committed sketch store")
    if name not in doc["specs"]:
        raise KeyError(f"sketch {name!r} not in store (has {sorted(doc['specs'])})")
    df = spark.read.parquet(*[f"{path}/{g}/{name}" for g in live])
    if partitions is not None:
        df = df.filter(F.col(doc["part_col"]).isin(list(partitions)))
    return df


def _estimate_groups(doc: dict, name: str, by_partition: bool) -> list[str]:
    spec = doc["specs"][name]
    groups = list(spec.get("group_cols", []))
    return ([doc["part_col"], *groups] if by_partition else groups)


def sketch_distinct(
    spark: SparkSession,
    path: str,
    name: str,
    partitions: list | None = None,
    by_partition: bool = False,
) -> DataFrame:
    """Distinct-count estimate from a stored HLL sketch, over any
    slice subset; ``by_partition`` keeps per-slice estimates instead
    of merging across slices."""
    doc = store_specs(spark, path)
    spec = doc["specs"][name]
    if spec["kind"] != "hll":
        raise ValueError(f"sketch {name!r} is {spec['kind']}, not hll")
    regs = read_sketch(spark, path, name, partitions)
    return _sk.hll_estimate(
        regs, _estimate_groups(doc, name, by_partition), p=spec.get("p", 12)
    )


def sketch_quantiles(
    spark: SparkSession,
    path: str,
    name: str,
    qs: list[float],
    partitions: list | None = None,
    by_partition: bool = False,
) -> DataFrame:
    """Quantile estimates from a stored DDSketch (α-relative-error)."""
    doc = store_specs(spark, path)
    spec = doc["specs"][name]
    if spec["kind"] != "dds":
        raise ValueError(f"sketch {name!r} is {spec['kind']}, not dds")
    buckets = read_sketch(spark, path, name, partitions)
    return _sk.dds_quantiles(
        buckets,
        qs,
        _estimate_groups(doc, name, by_partition),
        alpha=spec.get("alpha", 0.01),
    )


def sketch_freq(
    spark: SparkSession,
    path: str,
    name: str,
    items: DataFrame,
    item_col: str,
    partitions: list | None = None,
    by_partition: bool = False,
) -> DataFrame:
    """Frequency estimates for ``items`` from a stored Count-Min
    sketch (never undercounts).  A spec built with ``group_cols``
    answers PER GROUP — ``items`` must then carry those columns
    (merging cells across groups would silently overcount, the same
    way sketch_distinct/sketch_quantiles never do)."""
    doc = store_specs(spark, path)
    spec = doc["specs"][name]
    if spec["kind"] != "cm":
        raise ValueError(f"sketch {name!r} is {spec['kind']}, not cm")
    groups = _estimate_groups(doc, name, by_partition)
    missing = [g for g in groups if g not in items.columns]
    if missing:
        raise ValueError(
            f"cm sketch {name!r} is grouped by {groups}; items must "
            f"carry {missing} to probe it (per-group cells are never "
            "merged across groups)"
        )
    cells = read_sketch(spark, path, name, partitions)
    return _sk.cm_estimate(
        cells,
        items,
        item_col,
        group_cols=groups,
        depth=spec.get("depth", 4),
        width=spec.get("width", 2048),
    )


def compact_sketch_store(
    spark: SparkSession, path: str, commit_mode: str = "rename"
) -> int | None:
    """Fold live generations into one — registers MERGE (max/sum per
    kind) rather than concatenate, so a year of daily appends
    compacts to one register set per slice with identical estimates.
    Committed ids carry forward (replays still skip)."""
    from v6spark import txlog

    version, live, committed, doc = _live(spark, path)
    if len(live) <= 1:
        return None
    specs, part_col = doc["specs"], doc["part_col"]
    gen = f"gen={version + 1:06d}"
    for name, spec in specs.items():
        rows = spark.read.parquet(*[f"{path}/{g}/{name}" for g in live])
        groups = [part_col, *spec.get("group_cols", [])]
        if spec["kind"] == "hll":
            merged = _sk.hll_merge(rows, groups)
        elif spec["kind"] == "dds":
            merged = _sk.dds_merge(rows, groups)
        else:
            merged = _sk.cm_merge(rows, groups)
        merged.write.mode("overwrite").parquet(f"{path}/{gen}/{name}")
    txlog.publish(
        spark,
        f"{path}/{_COMMITS}",
        version + 1,
        {**doc, "live": [gen], "committed": sorted(committed)},
        commit_mode=commit_mode,
    )
    return version + 1


def vacuum_sketch_store(spark: SparkSession, path: str, **kw) -> int:
    """Sweep generation directories no retained manifest references
    (crashed appends, compacted-away generations)."""
    from v6spark import txlog

    return txlog.vacuum_versions(
        spark, path, f"{path}/{_COMMITS}", "gen=", **kw
    )


def sketch_update_foreach_batch(path: str, commit_mode: str = "rename"):
    """A ``foreachBatch`` function maintaining a sketch store from a
    stream: each micro-batch appends under ``append_id=batch_id``, so
    epoch replays after a crash are idempotent — the store's
    committed-id skip IS the exactly-once guarantee, the same
    contract streaming/neardedup.py proves for the dedup index."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        append_sketch_store(
            batch_df, path, append_id=int(batch_id), commit_mode=commit_mode
        )

    return fn
