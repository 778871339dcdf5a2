"""Persistent IVF index: build once, query many, prune partitions.

``similarity.ann_ivf_topk`` computes cell assignments inline — right
for a one-shot query, wrong for a serving index: at 100 TB the
assignment pass (a full corpus scan) must be paid ONCE, and every
query after that must touch only the files of the cells it probes.

This module materializes exactly that:

- :func:`build_ivf_index` — train the deterministic k-means
  quantizer, assign cells, and write the index as parquet
  PARTITIONED BY cell (``cell=K/`` directories) with the centroid
  list in a JSON sidecar.  Rebuilds are byte-stable (deterministic
  init + assignment).
- :func:`ivf_index_topk` — rank cells driver-side (tiny), read the
  index with ``cell IN (probed)``: Catalyst turns that into
  PARTITION PRUNING, so the scan plans only ``n_probe`` of
  ``n_cells`` directories — asserted in tests via the scan's
  partitionFilters, not assumed.  Exact cosine + per-partition
  heap (TakeOrderedAndProject) inside the probed cells.

The index layout is also the right dedup/serving substrate:
``semantic_cell_pairs`` can read one cell directory at a time, and
incremental ingest appends new vectors to their cells' directories
(same assignment expression, append mode).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CENTROIDS_FILE = "_centroids.json"


def _sidecar_write(spark: SparkSession, path: str, obj) -> None:
    """Write the centroid sidecar through the Hadoop FileSystem API
    so the index works on hdfs://, s3a://, abfs:// — a driver-local
    ``open()`` would strand a data-only index on any remote store."""
    from v6spark.streaming.neardedup import _jfs

    fs, jpath, jvm = _jfs(spark, f"{path}/{_CENTROIDS_FILE}")
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(json.dumps(obj).encode() + b"\n"))
    finally:
        out.close()


def _sidecar_read(spark: SparkSession, path: str):
    from v6spark.streaming.neardedup import _jfs

    fs, jpath, jvm = _jfs(spark, f"{path}/{_CENTROIDS_FILE}")
    stream = fs.open(jpath)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(raw.decode())


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "error",
    sample_fraction: float = 1.0,
    seed: int = 7,
) -> list[list[float]]:
    """Assign + write the cell-partitioned index; returns centroids.

    The quantizer trains on a deterministic hash sample
    (``sample_fraction``) with k-means|| init; the full corpus then
    pays one narrow assignment pass and one shuffle-free partitioned
    write (``partitionBy`` splits files by the cell column computed
    in the same stage as the scan).
    """
    from v6spark.operators.sampling import hash_sample
    from v6spark.operators.similarity import ivf_assign_cells, kmeans_centroids

    train = df
    if sample_fraction < 1.0:
        train = hash_sample(df, id_col, sample_fraction, seed=seed)
    centroids = kmeans_centroids(
        train, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    assigned = ivf_assign_cells(df, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.mode(mode).partitionBy("cell").parquet(path)
    _sidecar_write(df.sparkSession, path, centroids)
    return centroids


def load_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, list[list[float]]]:
    """(lazy index frame, centroids) — no data read until queried."""
    centroids = _sidecar_read(spark, path)
    return spark.read.parquet(path), centroids


def _probe_cells(
    centroids: list[list[float]], query_vec: list[float], n_probe: int
) -> list[int]:
    """The ``n_probe`` nearest cells (squared euclidean to the
    centroid) — the ONE probe-selection rule both the plain and the
    committed query paths share."""
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: sum(
            (q - c) * (q - c) for q, c in zip(query_vec, centroids[i])
        ),
    )
    return [int(c) for c in ranked[:n_probe]]


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors of ``query_vec`` from the stored index,
    touching only the probed cells' files (partition pruning)."""
    from v6spark.operators.similarity import cosine_topk_query

    index, centroids = load_ivf_index(spark, path)
    probe = _probe_cells(centroids, query_vec, n_probe)
    pruned = index.filter(F.col("cell").isin(probe))
    return cosine_topk_query(pruned, query_vec, k, id_col, vec_col)


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental ingest: assign NEW vectors with the frozen stored
    quantizer and append to their cells' directories — queries see
    them on the next read, no rebuild.  (Quantizer drift is the
    retrain trigger; the sidecar centroids define the index's
    geometry and must not move between appends.)"""
    from v6spark.operators.similarity import ivf_assign_cells

    centroids = _sidecar_read(df.sparkSession, path)
    assigned = ivf_assign_cells(df, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("append").partitionBy("cell").parquet(path)


# ---------------------------------------------------------------------------
# Committed (txlog) variant: crash-safe incremental appends.
# ---------------------------------------------------------------------------
#
# ``append_to_ivf_index``'s plain parquet append is not crash-safe: a
# job that dies mid-commit can leave partial part-files inside cell
# directories that every later query reads.  The committed layout
# isolates each ingest into its own GENERATION directory
# (``gen=<v>/cell=<k>/``) made visible only by a txlog manifest —
# queries resolve the live generation list through the manifest, so a
# crashed append is invisible and its replay overwrites the orphan.
# Partition pruning is preserved: reads pass ``basePath`` so both
# ``gen`` and ``cell`` are partition columns and the probe predicate
# still lands in PartitionFilters (asserted in tests).

_IVF_COMMITS = "_commits"


def _ivf_live(spark: SparkSession, path: str) -> tuple[int, list[str], set]:
    from v6spark import txlog

    version, doc = txlog.read_latest(spark, f"{path}/{_IVF_COMMITS}")
    if doc is None:
        return 0, [], set()
    return version, list(doc["live"]), set(doc["committed"])


def build_ivf_index_committed(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 7,
    commit_mode: str = "rename",
) -> list[list[float]]:
    """:func:`build_ivf_index` into generation 1 of a txlog-committed
    index.  Returns centroids (also persisted in the sidecar)."""
    from v6spark import txlog
    from v6spark.operators.sampling import hash_sample
    from v6spark.operators.similarity import ivf_assign_cells, kmeans_centroids

    spark = df.sparkSession
    version, live, committed = _ivf_live(spark, path)
    if version:
        raise ValueError(
            f"{path} already holds a committed IVF index (version "
            f"{version}); append or build elsewhere"
        )
    train = df
    if sample_fraction < 1.0:
        train = hash_sample(df, id_col, sample_fraction, seed=seed)
    centroids = kmeans_centroids(
        train, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    assigned = ivf_assign_cells(df, centroids, id_col=id_col, vec_col=vec_col)
    gen = "gen=000001"
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/{gen}"
    )
    _sidecar_write(spark, path, centroids)
    # committed starts EMPTY: the build is not an append transaction,
    # and reserving id 0 here would silently swallow a user's
    # append_id=0 as an already-committed replay
    txlog.publish(
        spark, f"{path}/{_IVF_COMMITS}", 1,
        {"live": [gen], "committed": []}, commit_mode=commit_mode,
    )
    return centroids


def append_to_ivf_index_committed(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    append_id: int | None = None,
    commit_mode: str = "rename",
    _fail_after: str | None = None,
) -> None:
    """Crash-safe incremental ingest: assign NEW vectors with the
    frozen stored quantizer into a fresh generation directory, then
    commit.  ``append_id`` is the transaction id (idempotent replay —
    an id the manifest records as committed skips outright); omitted,
    it defaults to max(committed)+1 (deterministic only if appends
    are serial, like the near-dedup backfill contract).

    Concurrency contract: appends with DISTINCT ids run concurrently
    (disjoint generation dirs + optimistic manifest commits).  A
    replay of an id must not run while its ORIGINAL attempt is still
    alive — both would overwrite the same generation directory, and
    if one commits mid-overwrite readers can see a torn generation
    (the same rule Structured Streaming applies to epoch replays;
    orchestrate retries after the original is known dead).
    ``_fail_after="data"`` injects a crash between the data write and
    the commit (the partial-append window a plain parquet append
    exposes and this layout closes)."""
    from v6spark import txlog
    from v6spark.operators.similarity import ivf_assign_cells

    spark = df.sparkSession
    version, live, committed = _ivf_live(spark, path)
    if not version:
        raise ValueError(f"{path} has no committed IVF index to append to")
    if append_id is None:
        append_id = max(committed, default=-1) + 1
    elif append_id in committed:
        return  # replayed after commit
    centroids = _sidecar_read(spark, path)
    assigned = ivf_assign_cells(df, centroids, id_col=id_col, vec_col=vec_col)
    # generation named by APPEND ID, not manifest version: a replay of
    # the same ingest overwrites its own orphan whatever version the
    # log has reached, and CONCURRENT appends (distinct ids) write
    # disjoint directories — their commits then serialize through the
    # optimistic-concurrency loop below, each rebuilding its live
    # list from whatever state it re-reads.
    gen = f"gen=a{append_id:06d}"
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/{gen}"
    )
    if _fail_after == "data":
        raise RuntimeError("injected crash after append data write")

    def update(_version, doc):
        cur_live = list(doc["live"]) if doc else []
        cur_committed = set(doc["committed"]) if doc else set()
        if append_id in cur_committed:
            # a concurrent replay of THIS id won the race: abort
            # without publishing — the loop returns the committed view
            raise txlog.AbortCommit
        return {
            "live": sorted([*cur_live, gen]),
            "committed": sorted(cur_committed | {append_id}),
        }

    txlog.commit_with_retry(
        spark, f"{path}/{_IVF_COMMITS}", update, commit_mode=commit_mode
    )


def load_ivf_index_committed(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """(lazy frame over the LIVE generations only, centroids).  The
    ``gen`` partition column is retained in the frame (dropped by the
    query helpers) so pruning works on both levels."""
    _version, live, _committed = _ivf_live(spark, path)
    if not live:
        raise ValueError(f"{path} has no committed IVF index")
    centroids = _sidecar_read(spark, path)
    index = spark.read.option("basePath", path).parquet(
        *[f"{path}/{g}" for g in live]
    )
    return index, centroids


def ivf_index_topk_committed(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k from the committed index, probed cells only (partition
    pruning across every live generation)."""
    from v6spark.operators.similarity import cosine_topk_query

    index, centroids = load_ivf_index_committed(spark, path)
    probe = _probe_cells(centroids, query_vec, n_probe)
    pruned = index.filter(F.col("cell").isin(probe)).drop("gen")
    return cosine_topk_query(pruned, query_vec, k, id_col, vec_col)


def compact_ivf_index(
    spark: SparkSession, path: str, commit_mode: str = "rename"
) -> int | None:
    """Fold the live generations into one (the streaming-small-files
    fix for long-running ingest); ``committed`` ids carry forward so
    replayed appends still skip.  Returns the new manifest version,
    or None when there is nothing to fold.  Vacuum afterwards via
    :func:`vacuum_ivf_index`."""
    from v6spark import txlog

    version, live, committed = _ivf_live(spark, path)
    if len(live) <= 1:
        return None
    merged = spark.read.option("basePath", path).parquet(
        *[f"{path}/{g}" for g in live]
    ).drop("gen")
    gen = f"gen={version + 1:06d}"
    merged.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/{gen}")
    txlog.publish(
        spark, f"{path}/{_IVF_COMMITS}", version + 1,
        {"live": [gen], "committed": sorted(committed)},
        commit_mode=commit_mode,
    )
    return version + 1


def vacuum_ivf_index(spark: SparkSession, path: str) -> int:
    """Drop generation directories no retained manifest references
    (crashed appends, compacted-away generations)."""
    from v6spark import txlog

    return txlog.vacuum_versions(
        spark, path, f"{path}/{_IVF_COMMITS}", "gen="
    )
