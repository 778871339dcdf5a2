"""Corpus replication: apply one table's change feed to another.

``mirror_foreach_batch`` composes the round's pieces into the
Delta-deep-clone-plus-CDF-apply pattern: the publish-log stream of a
SOURCE corpus drives batched ``published_corpus_changes`` windows,
and each window lands on the DESTINATION as at most two committed DML
transactions — a retract of the window's net deletes and an upsert of
its net inserts + post-images — each carrying a derived transaction
id, so a crash anywhere (including between the two commits) replays
to exactly the missing part.  The destination is a full committed
publish in its own right: its own txlog, its own shard layout
(``n_shards``/``seed`` may differ from the source), its own DML and
time travel.

Scale shape: per window, bytes moved = the source DML delta (the
change feed reads only manifest-diffed files; the upsert rewrites
only destination files holding affected keys).  Replicating a 100 TB
corpus's daily takedowns costs the takedowns, not the corpus.

Bootstrap: the cold-start window (the snapshot-as-inserts batch)
publishes the destination wholesale under the same derived
transaction id, so a crash-replayed bootstrap epoch skips exactly
like a DML window does.

Delete application uses IN-list predicates over the window's deleted
keys (driver-held, DML-delta-bounded — the same contract as the
upsert delta being the small side), SQL-escaped and CHUNKED so a
large takedown window becomes several bounded retract transactions
(each idempotent under its own derived txn id) instead of one
unbounded predicate string.

A SPLIT MOVE (the source's change feed emits update_preimage /
update_postimage with differing ``split``) cannot be applied as a
plain upsert — ``upsert_into_published`` updates matched keys in
place in their EXISTING split — so moved keys are applied as retract
(old split) + insert (new split): they join the delete phase and
their postimages flow through the upsert phase as fresh inserts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from v6spark.sources.publog import changes_foreach_batch

#: keys per retract IN-list — bounds the predicate string (and the
#: manifest entry recording it) regardless of window size
DELETE_CHUNK = 1000


def _sql_key_literal(k, escaped_literals: bool = False) -> str:
    """Render a key as a SQL literal usable inside an IN-list.

    Strings escape single quotes by doubling; backslashes escape
    according to the SESSION's parser mode (``escaped_literals`` =
    ``spark.sql.parser.escapedStringLiterals``: True means backslash
    is literal, False — the default — means it must double).  Reading
    the mode at render time means NO string key is a poison pill that
    wedges the mirror stream.  Ints pass through; other types raise —
    a silent repr() would produce invalid or, worse, wrong SQL.
    """
    if isinstance(k, bool):  # bool is an int subclass: reject first
        raise TypeError(f"unsupported key type for replication delete: {k!r}")
    if isinstance(k, int):
        return str(k)
    if isinstance(k, str):
        body = k if escaped_literals else k.replace("\\", "\\\\")
        return "'" + body.replace("'", "''") + "'"
    raise TypeError(
        f"unsupported key type for replication delete: {type(k).__name__}"
    )


def _escaped_literals_mode(spark) -> bool:
    try:
        return (
            spark.conf.get("spark.sql.parser.escapedStringLiterals")
            .lower() == "true"
        )
    except Exception:
        return False  # Spark default


def mirror_foreach_batch(
    src_root: str,
    dst_root: str,
    key_col: str = "doc_id",
    n_shards: int | None = None,
    seed: int | None = None,
    commit_mode: str = "rename",
):
    """``foreachBatch`` function replicating ``src_root`` into
    ``dst_root``.  Wire to the source's publish-log stream::

        q = (stream_published_log(spark, src)
             .writeStream
             .foreachBatch(mirror_foreach_batch(src, dst))
             .option("checkpointLocation", ckpt).start())
    """
    from v6spark.pipeline import (
        publish_corpus_committed,
        retract_from_published,
        upsert_into_published,
    )

    def handle(ch, batch_id: int) -> None:
        if ch is None:
            return  # metadata-only window
        spark = ch.sparkSession
        ch = ch.persist()
        try:
            w = ch.agg(
                F.min("_commit_version").alias("lo"),
                F.max("_commit_version").alias("hi"),
            ).collect()[0]
            if w["lo"] is None:
                return  # empty change window (e.g. pure compaction)
            txn = f"mirror-{batch_id}-{w['lo']}-{w['hi']}"
            from v6spark import txlog
            from v6spark.pipeline import _COMMITS

            _dv, dst_doc = txlog.read_latest(
                spark, f"{dst_root}/{_COMMITS}"
            )
            if (
                dst_doc is not None
                and f"{txn}-boot" in (dst_doc.get("txn_ids") or [])
            ):
                # replayed bootstrap epoch: the destination exists
                # BECAUSE this very window published it — without this
                # check the replay would fall through to the DML path
                # and re-apply the snapshot as an upsert
                return
            if dst_doc is None:
                # bootstrap: the window is the snapshot (all inserts)
                snap = ch.filter(F.col("_change_type") == "insert")
                prepared = snap.select(key_col, "split")
                content = snap.drop(
                    "split", "_change_type", "_commit_version"
                )
                kwargs = {}
                if n_shards is not None:
                    kwargs["n_shards"] = n_shards
                if seed is not None:
                    kwargs["seed"] = seed
                publish_corpus_committed(
                    prepared, content, dst_root, key_col=key_col,
                    commit_mode=commit_mode, txn_id=f"{txn}-boot",
                    **kwargs,
                )
                return
            deleted = [
                r[key_col]
                for r in ch.filter(F.col("_change_type") == "delete")
                .select(key_col).collect()
            ]
            # split moves: preimage.split != postimage.split — retract
            # the old-split row so the upsert phase re-inserts the
            # postimage into its NEW split (in-place upsert would pin
            # the key to the destination's existing split forever)
            pre = ch.filter(
                F.col("_change_type") == "update_preimage"
            ).select(key_col, F.col("split").alias("__old_split"))
            post = ch.filter(
                F.col("_change_type") == "update_postimage"
            ).select(key_col, "split")
            moved = [
                r[key_col]
                for r in post.join(pre, key_col)
                .filter(F.col("split") != F.col("__old_split"))
                .select(key_col).collect()
            ]
            to_retract = sorted(set(deleted) | set(moved), key=str)
            esc_mode = _escaped_literals_mode(spark)
            for i in range(0, len(to_retract), DELETE_CHUNK):
                chunk = to_retract[i:i + DELETE_CHUNK]
                vals = ", ".join(
                    _sql_key_literal(k, esc_mode) for k in chunk
                )
                retract_from_published(
                    spark, dst_root, f"{key_col} IN ({vals})",
                    commit_mode=commit_mode,
                    txn_id=f"{txn}-del-{i // DELETE_CHUNK}",
                )
            delta = ch.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).drop("_change_type", "_commit_version")
            if delta.limit(1).count():
                upsert_into_published(
                    spark, dst_root, delta, key_col=key_col,
                    commit_mode=commit_mode, txn_id=f"{txn}-ups",
                )
        finally:
            ch.unpersist()

    return changes_foreach_batch(src_root, handle, key_col=key_col)
