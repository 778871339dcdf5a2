"""Incrementally-maintained corpus metrics from the change stream.

The materialized-view idea composed from this round's pieces: the
publish-log stream (``sources.publog``) triggers per-version-window
row-level change frames (``pipeline.published_corpus_changes``); each
frame folds into per-split metric TOTALS by adding post-image /
insert contributions and subtracting pre-image / delete contributions
— so the maintained totals equal a full recompute over the current
corpus at every commit, at the cost of scanning only the files the
DML touched.

State lives IN the metric log's manifests (``txlog``), not in data
files: per-split totals are KB-sized, so the manifest IS the table —
free versioned history (metrics time travel), OCC multi-writer
commits, and exactly-once under Structured Streaming epoch replay via
transaction ids (``metrics-<batch>-<lo>-<hi>``: a crash-replayed
epoch re-derives the same id and aborts; see ``txlog.AbortCommit``).

Contract notes:
- metric expressions must be SUM-DECOMPOSABLE over rows (counts,
  token/char sums, flag sums) — that is what makes +post −pre exact.
  Averages/quantiles are ratios of such sums or sketch territory
  (``publish_corpus_committed(sketch_specs=...)``).
- the streaming checkpoint and the metric log live or die together:
  resetting the checkpoint without resetting ``agg_root`` would
  re-deliver the initial snapshot into non-empty totals (the standard
  streaming-sink contract, stated rather than hidden).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark import txlog
from v6spark.sources.publog import changes_foreach_batch

_METRIC_LOG = "_commits"


def metrics_foreach_batch(
    corpus_root: str,
    agg_root: str,
    metrics: dict[str, str],
    key_col: str | None = None,
    commit_mode: str = "rename",
):
    """``foreachBatch`` function maintaining per-split totals of
    ``metrics`` (name -> sum-decomposable SQL expression over the
    corpus schema, e.g. ``{"docs": "1", "chars": "length(text)"}``)
    at ``agg_root``, exactly-once.  Wire it to the publish-log
    stream::

        q = (stream_published_log(spark, root)
             .writeStream
             .foreachBatch(metrics_foreach_batch(root, agg, METRICS))
             .option("checkpointLocation", ckpt).start())
    """
    if not metrics:
        raise ValueError("metrics must name at least one expression")

    def handle(ch, batch_id: int) -> None:
        if ch is None:
            return  # metadata-only window: totals unchanged
        spark = ch.sparkSession
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), 1
        ).otherwise(-1)
        # ONE job over the change frame: the CDC plan re-executes its
        # manifest-diff read per action, so folding the version window
        # into the same aggregation matters
        deltas = ch.groupBy("split").agg(
            *[
                F.sum(F.expr(expr).cast("double") * sign).alias(name)
                for name, expr in metrics.items()
            ],
            F.min("_commit_version").alias("_lo"),
            F.max("_commit_version").alias("_hi"),
        ).collect()
        if not deltas:
            return  # zero-row change window: totals unchanged,
            # and a replay recomputes the same zero — safe to skip
        lo = min(r["_lo"] for r in deltas)
        hi = max(r["_hi"] for r in deltas)
        txn = f"metrics-{batch_id}-{lo}-{hi}"

        def update(_version, doc):
            if doc is not None and txn in (doc.get("txn_ids") or []):
                raise txlog.AbortCommit(txn)
            totals = {
                s: dict(m) for s, m in ((doc or {}).get("metrics") or {}).items()
            }
            for r in deltas:
                row = totals.setdefault(
                    r["split"], {name: 0.0 for name in metrics}
                )
                for name in metrics:
                    row[name] = row.get(name, 0.0) + (r[name] or 0.0)
            ids = list((doc or {}).get("txn_ids") or [])
            ids.append(txn)
            return {
                "metrics": totals,
                "metric_exprs": dict(metrics),
                "txn_ids": ids[-10_000:],
            }

        txlog.commit_with_retry(
            spark, f"{agg_root}/{_METRIC_LOG}", update,
            commit_mode=commit_mode,
        )

    return changes_foreach_batch(corpus_root, handle, key_col=key_col)


def read_corpus_metrics(
    spark, agg_root: str, version: int | None = None
) -> dict | None:
    """{split: {metric: total}} at the latest (or pinned) metric-log
    version; None when nothing has been maintained yet."""
    log = f"{agg_root}/{_METRIC_LOG}"
    if version is None:
        _v, doc = txlog.read_latest(spark, log)
    else:
        doc = txlog.read_version(spark, log, version)
    if doc is None:
        return None
    return {s: dict(m) for s, m in (doc.get("metrics") or {}).items()}


def corpus_metrics_frame(spark, agg_root: str, version: int | None = None):
    """DataFrame view (split, metric, value) of the maintained
    totals — the shape dashboards join against."""
    totals = read_corpus_metrics(spark, agg_root, version)
    if totals is None:
        return None
    rows = [
        (s, name, float(v))
        for s, m in sorted(totals.items())
        for name, v in sorted(m.items())
    ]
    return spark.createDataFrame(
        rows, "split string, metric string, value double"
    )
