"""End-to-end training-corpus preparation (the north-star composition).

One declarative pipeline from a raw ``documents`` frame to packed,
split, deduplicated training bins — the flow a pretraining data team
runs at 100 TB, assembled entirely from the engine's operators:

    quality score -> language gate -> exact dedup -> token budget
    -> leakage-safe split -> per-split sequence packing

Every stage is lazy; the pipeline is ONE Catalyst plan up to the
split, so Catalyst pushes the quality and language predicates down to
the document scan.  The narrow survivor frame (ids + metrics, no
bodies) persists at the split point because three per-split packing
branches and the final join all consume it.  Shuffle census for the
default path: dedup's digest groupBy (32-byte keys), packing's
(doc_id, n_tokens) group scatter — document BODIES move at most once.

Stage choices, and why:
- dedup BEFORE split: a duplicate pair straddling train/test is
  evaluation leakage; deduping first makes the split's leakage-safety
  guarantee (hash of doc_id) meaningful.
- split BEFORE packing: bins must never mix splits, so packing runs
  per split label on the already-assigned frame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v6spark.operators import packing as _packing
from v6spark.operators import sampling as _sampling
from v6spark.operators import text as _text
from v6spark.operators.dedup import (
    connected_keepers,
    dedup_exact,
    near_dup_keepers,
)

DEFAULT_WEIGHTS = {"train": 0.98, "valid": 0.01, "test": 0.01}


def prepare_training_corpus(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    gopher_rules: bool = False,
    repetition_gate: bool = False,
    near_dedup: bool = False,
    min_jaccard: float = 0.8,
    max_tokens: int = 1024,
    split_weights: dict[str, float] | None = None,
    seed: int = 0,
    bpe_merges: list | None = None,
    span_dedup: bool = False,
    span_n: int = 8,
    span_min_docs: int = 5,
) -> DataFrame:
    """Raw documents -> (doc, tokens, quality, lang, split, bin_id).

    Returns one row per SURVIVING document with its packed bin
    assignment; filtered documents (low quality, wrong language,
    failed Gopher shape/repetition gates, duplicate losers) simply
    don't appear.  Deterministic end to end: reruns produce the
    identical frame.

    ``gopher_rules`` adds the shape gates (token count, mean word
    length, symbol ratio, stopword evidence) — a narrow map, free.
    ``repetition_gate`` adds the duplicate-line / n-gram coverage
    gates — this one shuffles (per-doc n-gram frequency is a posting
    aggregation), so it runs FIRST, before the narrow predicates are
    applied to its join output, and its extra shuffle carries only
    (id, n-gram) rows, never document bodies twice.
    ``near_dedup=True`` upgrades the dedup stage from exact-digest to
    the guarded near-dup composition (``dedup.near_dup_keepers``:
    exact collapse -> representative-only MinHash-LSH -> verified
    ``jaccard >= min_jaccard`` -> keeper clustering), so templated
    near-copies lose their duplicates too — the leakage-safety
    argument for dedup-before-split applies with near-dup force.
    ``bpe_merges`` (from :func:`~v6spark.operators.bpe.train_bpe`)
    swaps the regex token estimate for real broadcast-BPE counts, so
    packing budgets match what the trainer's tokenizer will see.
    ``span_dedup=True`` prepends SUBSTRING-level dedup
    (:func:`~v6spark.operators.spandedup.remove_hot_spans`):
    corpus-hot boilerplate spans are stripped FIRST so every later
    stage — quality scores, language ID, document dedup digests,
    token budgets — sees the de-boilerplated text (nav chrome would
    otherwise both inflate quality token counts and glue distinct
    pages into near-dup clusters).
    """
    weights = split_weights or DEFAULT_WEIGHTS

    gated = docs
    if span_dedup:
        from v6spark.operators.spandedup import remove_hot_spans

        gated = remove_hot_spans(
            gated, n=span_n, min_docs=span_min_docs,
            id_col=doc_col, text_col=text_col,
        ).drop("n_tokens_removed")
    if repetition_gate:
        gated = _text.repetition_signals(
            gated, text_col=text_col, id_col=doc_col
        ).filter(F.col("passes_repetition"))
    scored = _text.quality_features(gated, text_col=text_col).withColumn(
        "pred_lang", _text.lang_id(text_col)
    )
    if gopher_rules:
        scored = _text.gopher_quality_rules(scored, text_col=text_col).filter(
            F.col("passes_gopher")
        )
    kept = scored.filter(F.col("quality_score") >= min_quality)
    if langs is not None:
        kept = kept.filter(F.col("pred_lang").isin(*langs))

    if near_dedup:
        # Guarded near-dedup keeper map; survivors are their own
        # keepers, dup_count = cluster size (exact + near losers).
        keepers = (
            near_dup_keepers(
                kept, id_col=doc_col, text_col=text_col, min_jaccard=min_jaccard
            )
            .groupBy("keeper_id")
            .agg(F.count(F.lit(1)).alias("dup_count"))
            .select(F.col("keeper_id").alias(doc_col), "dup_count")
        )
    else:
        # Exact dedup on the content digest; keep each group's min-id row.
        keepers = dedup_exact(
            kept.withColumn("__digest", F.sha2(F.col(text_col), 256)),
            "__digest",
            doc_col,
        ).select(F.col("keeper_id").alias(doc_col), "dup_count")
    deduped = kept.join(keepers, doc_col)

    # Persist the NARROW survivor frame (ids + metrics, no bodies):
    # the per-split packing loop and the final join would otherwise
    # re-execute the quality/lang/dedup subtree once per consumer.
    # Lifecycle as elsewhere: session.clear_engine_caches().
    from pyspark import StorageLevel

    if bpe_merges is not None:
        # real tokenizer accounting: replace the regex token estimate
        # with broadcast-BPE counts.  The survivor frame feeds BOTH
        # the counts map and the join's left side — persist it
        # (disk-backed; it still carries bodies) or the whole
        # quality/lang/dedup subtree executes twice in one job.
        from v6spark.operators.bpe import bpe_token_counts

        deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK)
        bpe_counts = bpe_token_counts(
            deduped, bpe_merges, text_col=text_col, id_col=doc_col
        ).select(F.col("doc_id").alias(doc_col), F.col("n_tokens").alias("__bpe_n"))
        deduped = deduped.drop("n_tokens").join(bpe_counts, doc_col).withColumnRenamed(
            "__bpe_n", "n_tokens"
        )

    split = (
        _sampling.hash_split(deduped, doc_col, weights, seed=seed)
        .select(
            doc_col,
            "pred_lang",
            "quality_score",
            "dup_count",
            "split",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Pack each split independently so no bin mixes splits; packing
    # ids repeat across splits, so the bin key is (split, bin_id).
    parts = []
    for lbl in weights:
        sub = split.filter(F.col("split") == lbl).select(doc_col, "n_tokens")
        packed = _packing.pack_sequences(
            sub, max_tokens, doc_col=doc_col, tokens_col="n_tokens"
        )
        parts.append(packed.withColumn("split", F.lit(lbl)))
    bins = parts[0]
    for p in parts[1:]:
        bins = bins.unionByName(p)

    return (
        split.drop("n_tokens")
        .join(bins.drop("split"), doc_col)
        .select(
            doc_col,
            "pred_lang",
            "quality_score",
            "dup_count",
            "split",
            "n_tokens",
            "bin_id",
            "oversize",
        )
    )


def prepare_media_corpus(
    media: DataFrame,
    min_width: int = 32,
    min_height: int = 32,
    min_audio_frames: int = 1,
    min_sharpness: float | None = None,
    phash_radius: int = 6,
    audio_radius: int = 5,
    split_weights: dict[str, float] | None = None,
    seed: int = 0,
    n_shards: int = 32,
    on_error: str = "skip",
) -> DataFrame:
    """Raw media frame -> (media, kind, dims, dup_count, split, shard).

    The multimodal twin of :func:`prepare_training_corpus`, assembled
    from the same operator families:

        header-only metadata pass -> size/validity gates ->
        perceptual near-dedup (pHash for images, spectral fingerprint
        for audio, exact payload digest for video) -> leakage-safe
        split -> deterministic shard assignment

    Scale shape: the metadata pass reads HEADERS, not pixels
    (:func:`~v6spark.operators.multimodal.decode_media`); perceptual
    hashing decodes pixels/samples once, executor-side, and ships ONE
    int64 per row into the Hamming band join; video identity uses the
    payload sha2 digest (32 bytes/row shuffled).  Keeper selection
    for images+audio shares one :func:`~v6spark.operators.dedup.
    connected_keepers` call (image and audio id spaces never collide
    in pairs, so one union'd pair set is safe).  Split and shard are
    keyed hashes of ``media_id`` — reruns and repartitioning cannot
    move a row.  Returns one row per SURVIVING media id; duplicate
    losers and gate failures simply don't appear.

    ``on_error="skip"`` (default — a 100 TB crawl ALWAYS contains
    truncated payloads) drops rows that fail the header pass; a
    payload whose header parses but whose pixels are truncated
    skips fingerprinting (it survives dedup uncompared) and, when
    ``min_sharpness`` is set, is dropped by the blur gate (no score
    -> fails the threshold).  ``on_error="raise"`` restores
    fail-loud semantics for curated inputs.
    """
    from v6spark.operators import media_fingerprint as _mf
    from v6spark.operators import multimodal as _mm

    weights = split_weights or DEFAULT_WEIGHTS
    if on_error == "null":
        # 'null' only makes sense for the census pass; downstream
        # pixel consumers can only raise or skip
        raise ValueError("prepare_media_corpus: on_error must be raise/skip")

    meta = _mm.decode_media(media, on_error=on_error)
    ok = (
        (F.col("kind") == "image")
        & (F.col("width") >= min_width) & (F.col("height") >= min_height)
    ) | (
        # decode_media reads WAV (width, height) as (n_frames, rate)
        (F.col("kind") == "audio") & (F.col("width") >= min_audio_frames)
    ) | (F.col("kind") == "video")
    gated_meta = meta.filter(ok)
    kept = media.join(gated_meta.select("media_id", "width", "height", "n_bytes"), "media_id")
    if min_sharpness is not None:
        # blur gate: Laplacian-variance scores from real pixels; only
        # image rows are scored, others pass through untouched
        scores = _mf.image_quality_features(
            kept, on_error=on_error
        ).select("media_id", "sharpness")
        kept = kept.join(scores, "media_id", "left").filter(
            (F.col("kind") != "image")
            | (F.col("sharpness") >= min_sharpness)
        ).drop("sharpness")

    img_pairs = _mf.image_near_dup_pairs(kept, radius=phash_radius, on_error=on_error)
    aud_pairs = _mf.audio_near_dup_pairs(kept, radius=audio_radius, on_error=on_error)
    pair_union = img_pairs.select("id_a", "id_b").unionByName(
        aud_pairs.select("id_a", "id_b")
    )
    kmap = connected_keepers(pair_union).withColumnRenamed("doc_id", "media_id")

    videos = kept.filter(F.col("kind") == "video")
    vid_keepers = dedup_exact(
        videos.withColumn("__digest", F.sha2(F.col("payload"), 256)),
        "__digest", "media_id",
    ).select(F.col("keeper_id").alias("media_id"), F.col("dup_count").alias("__vdup"))

    with_keeper = (
        kept.join(kmap, "media_id", "left")
        .withColumn("keeper_id", F.coalesce("keeper_id", F.col("media_id")))
    )
    survivors = with_keeper.filter(F.col("keeper_id") == F.col("media_id"))
    # perceptual cluster sizes: every clustered id counts toward its keeper
    psizes = (
        with_keeper.groupBy("keeper_id")
        .agg(F.count(F.lit(1)).alias("__pdup"))
        .withColumnRenamed("keeper_id", "media_id")
    )
    survivors = (
        survivors.join(psizes, "media_id", "left")
        .join(vid_keepers, "media_id", "left")
        # video rows that lost the digest dedup vanish via the keeper
        # semi-join below; winners carry the digest-group size
        .withColumn(
            "dup_count",
            F.when(F.col("kind") == "video", F.coalesce("__vdup", F.lit(0)))
            .otherwise(F.coalesce("__pdup", F.lit(1))),
        )
        .filter((F.col("kind") != "video") | (F.col("dup_count") > 0))
        .drop("__pdup", "__vdup", "keeper_id")
    )

    from v6spark.operators.packing import assign_shards

    split = _sampling.hash_split(survivors, "media_id", weights, seed=seed)
    return assign_shards(split, "media_id", n_shards, seed=seed).select(
        "media_id", "kind", "width", "height", "n_bytes",
        "dup_count", "split", "shard",
    )


def publish_corpus(
    prepared: DataFrame,
    content: DataFrame,
    path: str,
    fmt: str = "parquet",
    key_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 0,
    compress: bool = False,
    _fail_after_split: str | None = None,
) -> dict:
    """Publish a prepared corpus (the survivor frame from
    :func:`prepare_training_corpus` / :func:`prepare_media_corpus`)
    joined back to its content, one directory per split:

        {path}/split=train/shard-00000.<ext> ...

    ``fmt``: ``"parquet"`` (ordered shard=K/ dirs via
    `packing.write_training_shards`), ``"webdataset"`` (tar shards,
    one member per cell), or ``"tfrecord"`` (Example records) —
    ``compress`` gzips the latter two.  Per-split directories mean a
    trainer mounts exactly one split; the survivor semi-join is the
    only interaction with the (wide) content frame, so bodies move
    once.  Returns {split: n_rows} for the publish manifest.

    ``_fail_after_split`` is the crash-injection hook
    :func:`publish_corpus_committed`'s tests use (raise after the
    named split's data lands, leaving later splits unwritten).
    """
    from v6spark.operators.packing import write_training_shards
    from v6spark.sources.trainshards import (
        write_tfrecord_shards,
        write_webdataset,
    )

    # per-split counts from the NARROW prepared frame — counting the
    # published subset would re-execute the wide content join once
    # more per split just to produce a number
    counts = {
        r["split"]: r["n"]
        for r in prepared.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    joined = content.join(prepared.select(key_col, "split"), key_col)
    for lbl in sorted(counts):
        sub = joined.filter(F.col("split") == lbl).drop("split")
        dest = f"{path}/split={lbl}"
        if fmt == "parquet":
            write_training_shards(sub, dest, key=key_col, n_shards=n_shards, seed=seed)
        elif fmt == "webdataset":
            write_webdataset(sub, dest, key_col=key_col, n_shards=n_shards,
                             seed=seed, compress=compress)
        elif fmt == "tfrecord":
            write_tfrecord_shards(sub, dest, key_col=key_col, n_shards=n_shards,
                                  seed=seed, compress=compress)
        else:
            raise ValueError(f"fmt must be parquet/webdataset/tfrecord, got {fmt!r}")
        if _fail_after_split == lbl:
            raise RuntimeError(f"injected crash after split={lbl} data write")
    return counts


# ---------------------------------------------------------------------------
# ACID batch publishing — the versioned-manifest commit for batch outputs.
# ---------------------------------------------------------------------------

_COMMITS = "_commits"


def publish_corpus_committed(
    prepared: DataFrame,
    content: DataFrame,
    path: str,
    fmt: str = "parquet",
    key_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 0,
    compress: bool = False,
    commit_mode: str = "rename",
    allow_schema_change: bool = False,
    sketch_specs: dict | None = None,
    _intent: str | None = None,
    key_bloom: bool = False,
    _fail_after_split: str | None = None,
    _fail_before_sketches: bool = False,
    max_retries: int = 8,
    txn_id: str | None = None,
) -> dict:
    """:func:`publish_corpus` wrapped in the versioned-manifest commit
    (:mod:`v6spark.txlog` — the machinery proven by the streaming
    near-dedup transaction, reused for batch).

    SCHEMA DRIFT GUARD: each manifest records the published column
    schema; a publish whose schema differs from the previous
    version's raises before writing anything, unless
    ``allow_schema_change=True`` (the change is then recorded in the
    manifest as ``schema_changed``).  A silently drifted column type
    is the classic way a nightly corpus publish breaks every trainer
    that mounts it next morning — fail at the publisher, where the
    diff is actionable, not at the consumers.

    Why: a plain :func:`publish_corpus` is rerun-byte-identical, but a
    crash mid-publish leaves PARTIAL split directories that a trainer
    listing ``{path}/split=train`` would happily read.  Here every
    publish writes into its own nonce-named version directory
    ``{path}/v=<n>-<nonce>/`` and becomes visible only when one
    manifest file commits it — committed readers
    (:func:`read_published_corpus`, :func:`published_path`) never see
    a partial publish; a crashed attempt's directory is an orphan
    that :func:`vacuum_published` sweeps.  MULTI-WRITER SAFE via the
    :func:`_occ_dml` optimistic loop (a lost commit race recomputes
    against the winner's state and retries).

    The manifest additionally records per-file key min/max stats
    (``file_stats``) so later retract/upsert candidate selection is
    manifest-only — no parquet reads outside the files that actually
    rewrite.

    ``commit_mode``: ``"rename"`` (HDFS/POSIX atomic rename) or
    ``"put"`` (S3 semantics — conditional put + checksum-verified
    manifests).  ``_fail_after_split`` is a crash-injection hook for
    tests: raise after the named split's data lands, leaving the
    remaining splits unwritten (the partial-publish window).

    ``sketch_specs`` attaches REGISTER-LEVEL monitoring to the same
    transaction: ``{name: {"kind": "hll"|"dds", "expr": <sql expr>,
    ...params}}`` — per-split HLL register / DDSketch bucket tables
    are computed from the JUST-WRITTEN bytes and land under
    ``<version dir>/_sketch/<name>`` BEFORE the manifest commits, so
    ONE commit covers data + sketches (a crash between them leaves
    neither visible — ``_fail_before_sketches`` injects that window).
    :func:`published_corpus_drift` then reports distinct/quantile
    drift between versions from registers alone, zero corpus rescans.

    Returns {split: n_rows} like :func:`publish_corpus`, plus the
    committed version under key ``"_version"``.
    """
    from v6spark import txlog

    spark = prepared.sparkSession
    if key_bloom and fmt != "parquet":
        raise ValueError(
            "key_bloom requires a parquet publish (filters are built "
            "from the written files' key column)"
        )
    # the published rows are the content columns (split is consumed
    # into the directory layout) — that is the schema trainers see
    schema = [
        [f.name, f.dataType.simpleString()] for f in content.schema.fields
    ]
    if key_bloom:
        # fail BEFORE any byte is written: an un-bloomable key type
        # would otherwise abort inside the executor-side build kernel
        # after the whole corpus landed
        ktype = dict(schema).get(key_col)
        if ktype not in ("tinyint", "smallint", "int", "bigint", "string"):
            raise ValueError(
                f"key_bloom requires an int/string key column; "
                f"{key_col!r} is {ktype!r}"
            )

    def _attempt(version, _doc, vdir, data_root):
        if (
            txn_id is not None
            and _doc is not None
            and txn_id in (_doc.get("txn_ids") or [])
        ):
            # exactly-once replay skip (see _txn_forward) — the
            # guard that makes a streaming bootstrap publish safe
            return None, {
                "_version": version,
                **{s: c for s, c in (_doc.get("splits") or {}).items()},
                "replayed": True,
            }
        prev_schema = _doc.get("schema") if _doc else None
        schema_changed = prev_schema is not None and prev_schema != schema
        if schema_changed and not allow_schema_change:
            raise ValueError(
                f"publish schema drift vs version {version}: "
                f"{prev_schema} -> {schema}; pass allow_schema_change=True "
                "to publish anyway (recorded in the manifest)"
            )
        cons = (_doc or {}).get("constraints") or {}
        if cons:
            # CHECK constraints gate the ingress BEFORE any byte is
            # written (one pass over the input; a violation after the
            # corpus landed would waste the whole publish)
            _enforce_constraints(content, cons, "the publish input")
        # nonce-named version dir: under concurrent writers, a
        # deterministic v=<n+1> name would let two racers write into
        # (and orphan-clear) the same directory — the nonce makes each
        # attempt's data private until its manifest commits
        fs, jroot, _jvm = txlog._jfs(spark, data_root)
        if fs.exists(jroot):
            fs.delete(jroot, True)

        counts = publish_corpus(
            prepared, content, data_root, fmt=fmt, key_col=key_col,
            n_shards=n_shards, seed=seed, compress=compress,
            _fail_after_split=_fail_after_split,
        )
        payload = {
            "live": vdir,
            "fmt": fmt,
            "splits": counts,
            "schema": schema,
            "schema_changed": schema_changed,
            "n_shards": n_shards,
            "seed": seed,
            "key_col": key_col,
            "txn_ids": _txn_forward(_doc, txn_id),
        }
        _carry_constraints(_doc, payload)
        if fmt == "parquet":
            # per-file key stats at publish time: later retract/upsert
            # candidate pruning becomes manifest-only (footer metadata
            # reads, no Spark job — see _collect_file_stats)
            split_files = _published_split_files(spark, path, {
                "live": vdir, "splits": counts,
            })
            payload["file_stats"] = {
                s: _collect_file_stats(spark, path, s, fl, key_col)
                if fl else {}
                for s, fl in split_files.items()
            }
            # ... and per-COLUMN min/max (same footers, one more walk)
            # so read_published_where can skip files manifest-only
            payload["col_stats"] = {
                s: _collect_col_stats(spark, path, s, fl) if fl else {}
                for s, fl in split_files.items()
            }
            if key_bloom:
                # per-file key Bloom sidecars: point lookups probe KB
                # filters driver-side instead of opening every file of
                # the touched shards (hash-sharded key RANGES are
                # near-full, so min/max stats can't refute a point key)
                tables = _build_key_bloom_table(
                    spark, path, vdir, split_files, key_col,
                    _bloom_m_bits(
                        None,
                        sum(counts.values()),
                        sum(len(fl) for fl in split_files.values()) or 1,
                    ),
                )
                payload["key_bloom"] = _carry_key_bloom(None, tables)
        if sketch_specs:
            if fmt != "parquet":
                raise ValueError(
                    "sketch_specs requires a parquet publish (registers "
                    "are computed from the written files)"
                )
            if _fail_before_sketches:
                raise RuntimeError(
                    "injected crash between data and sketch write"
                )
            payload["sketches"] = _write_publish_sketches(
                spark, data_root, vdir, sketch_specs, counts
            )
        return payload, dict(counts)

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
                    _intent=_intent)


def published_path(
    spark, path: str, version: int | None = None
) -> tuple[str, dict] | None:
    """(committed data root, manifest payload) of the latest committed
    publish — or of historical ``version`` (time travel: every
    publish keeps its manifest + data directory until
    :func:`vacuum_published` retires them, so an evaluation pinned to
    the corpus version it trained on stays reproducible).  None
    before the first commit / for a vacuumed or torn version.
    Trainers resolve their mount point through this — never by
    listing ``{path}`` directly, which may contain orphaned
    (crashed, uncommitted) version dirs."""
    from v6spark import txlog

    if version is None:
        _v, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    else:
        doc = txlog.read_version(spark, f"{path}/{_COMMITS}", version)
    if doc is None:
        return None
    if _doc_has_files(doc):
        # a retraction version spans several version directories;
        # there is no single mount root — readers must go through
        # read_published_corpus, which resolves the file list
        raise ValueError(
            "this committed version is a file-level retraction "
            "(data spans version directories); read it via "
            "read_published_corpus, not a mount path"
        )
    return f"{path}/{doc['live']}", doc


def read_published_corpus(
    spark, path: str, split: str | None = None,
    version: int | None = None, tag: str | None = None,
    branch: str | None = None, as_of=None,
):
    """Committed-only DataFrame view of a parquet-format publish
    (exactly-once read: partial publishes are invisible);
    ``version`` pins a historical publish (see
    :func:`published_path`), ``tag`` a named reference
    (:func:`tag_published`), ``branch`` a named branch head
    (:func:`create_published_branch`), ``as_of`` a TIMESTAMP AS OF
    (epoch seconds or ISO-8601 — resolved against monotonically
    adjusted manifest commit times, matching ``option("asOf")`` on
    the SQL reader)."""
    from v6spark import txlog

    log = _log_dir(path, branch)
    version = _resolve_version(spark, path, version, tag, branch, as_of)
    if version is None:
        _v, doc = txlog.read_latest(spark, log)
    else:
        doc = txlog.read_version(spark, log, version)
    if doc is None:
        return None
    if doc.get("fmt") != "parquet":
        raise ValueError(
            f"read_published_corpus reads parquet publishes; this one is "
            f"{doc.get('fmt')!r} — mount its published_path in the trainer "
            "instead"
        )
    # resolves both manifest shapes: directory-level publishes and
    # file-level retraction versions (explicit surviving-file lists)
    split_files = _published_split_files(spark, path, doc)
    splits = sorted(doc["splits"])
    if split is not None:
        files = split_files.get(split, [])
        if not files:
            return None
        return _read_split_mor(spark, path, split, files, doc)
    if not splits:
        # a committed EMPTY publish (every doc filtered out) is a
        # valid state distinct from "nothing committed yet"
        return None
    dfs = [
        _read_split_mor(spark, path, s, split_files[s], doc)
        .withColumn("split", F.lit(s))
        for s in splits
        if split_files.get(s)
    ]
    if not dfs:
        return None
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_published_keys(
    spark,
    path: str,
    keys: list,
    version: int | None = None,
    tag: str | None = None,
    branch: str | None = None,
    _scan_observer=None,
):
    """Point-lookup read: the published rows for ``keys`` touching
    ONLY the files that can contain them — shard-directory pruning
    (the manifest's recorded key hash: pmod(xxhash64(seed, key),
    n_shards)) then per-file key [min,max] stats from the manifest,
    no parquet footer reads.  The "serve these documents by id from a
    100 TB corpus" path: cost scales with len(keys), never corpus
    size.  Returns the unified-schema rows plus ``split`` (empty
    frame when nothing matches); ``version`` pins a historical
    publish.  ``_scan_observer(split, files)`` is the test hook
    recording what would be opened."""
    import bisect

    from v6spark import txlog
    from v6spark.operators.packing import assign_shards

    log = _log_dir(path, branch)
    version = _resolve_version(spark, path, version, tag, branch)
    if version is None:
        _v, doc = txlog.read_latest(spark, log)
    else:
        doc = txlog.read_version(spark, log, version)
    if doc is None:
        raise ValueError(f"{path} has no committed publish at that version")
    if doc.get("fmt") != "parquet":
        raise ValueError(
            "read_published_keys reads parquet publishes; this one is "
            f"{doc.get('fmt')!r}"
        )
    key_col = doc.get("key_col")
    if key_col is None:
        raise ValueError(
            "manifest records no key_col (pre-stats publish) — use "
            "read_published_corpus().filter(...) instead"
        )
    ns = doc.get("n_shards") or 32
    sd = doc.get("seed") or 0
    schema = doc.get("schema")
    keys = sorted(set(keys))
    if not keys:
        raise ValueError("keys must name at least one key")
    # the shard hash is a Catalyst expression (xxhash64): evaluate it
    # on a tiny literal frame — exact parity with the publish-time
    # assignment, no reimplementation drift.  xxhash64 is
    # type-sensitive (int vs bigint hash differently), so the probe
    # column must be cast to the manifest's RECORDED key type, not the
    # createDataFrame-inferred one (Python int always infers bigint).
    kdf = spark.createDataFrame([(k,) for k in keys], [key_col])
    key_type = dict(schema or {}).get(key_col)
    if key_type:
        kdf = kdf.withColumn(key_col, F.col(key_col).cast(key_type))
    shard_of_key = {
        r[key_col]: r["shard"]
        for r in assign_shards(kdf, key_col, ns, seed=sd)
        .select(key_col, "shard").collect()
    }
    touched = set(shard_of_key.values())
    keys_by_shard: dict[int, list] = {}
    for k, s in shard_of_key.items():
        keys_by_shard.setdefault(s, []).append(k)
    for ks in keys_by_shard.values():
        ks.sort()
    file_stats = _doc_file_stats(spark, path, doc)
    split_files = _published_split_files(spark, path, doc)

    def _shard_of(rel: str) -> int | None:
        for part in rel.split("/"):
            if part.startswith("shard="):
                return int(part.split("=", 1)[1])
        return None

    def _can_match(s, rel, shard):
        st = file_stats.get(s, {}).get(rel)
        if st is None or st[0] is None:
            # no stats / unknown-bounds ([None, None, n]): must scan —
            # bisecting None against int would crash planning
            return True
        lo, hi = st[0], st[1]
        ks = keys_by_shard.get(shard, [])
        i = bisect.bisect_left(ks, lo)
        return i < len(ks) and ks[i] <= hi

    # phase 1: shard + key-range candidates per split (manifest-only)
    cand_by_split = {
        s: [
            rel for rel in files
            if _shard_of(rel) in touched and _can_match(s, rel, _shard_of(rel))
        ]
        for s, files in sorted(split_files.items())
    }

    kb = doc.get("key_bloom")
    bmap: dict[str, tuple] = {}
    all_cand = [rel for fl in cand_by_split.values() for rel in fl]
    if kb and all_cand:
        # {file_rel: (bloom bytes, m_bits)} — loaded lazily (only when
        # candidates exist) with the candidate file set PUSHED into the
        # sidecar scan, and tables sharing a file_prefix read as ONE
        # job, so lookup latency does not grow with commit history.
        # A table whose version dir fell out of retention is skipped:
        # its files are gone from the manifest too; any file without
        # an entry must scan.
        by_prefix: dict[str, list[dict]] = {}
        for t in kb.get("tables") or []:
            by_prefix.setdefault(t.get("file_prefix", ""), []).append(t)
        for pre, tabs in by_prefix.items():
            wanted = [
                rel[len(pre):] for rel in all_cand if rel.startswith(pre)
            ]
            if not wanted:
                continue

            def _load(paths, m_fallback):
                rows = (
                    spark.read.parquet(*paths)
                    .filter(F.col("file").isin(wanted))
                    .collect()
                )
                for r in rows:
                    m = r.asDict().get("m_bits") or m_fallback
                    bmap[pre + r["file"]] = (bytes(r["bloom"]), m)

            try:
                _load([f"{path}/{t['path']}" for t in tabs],
                      tabs[0]["m_bits"])
            except Exception:
                # a vacuumed table poisons the grouped read: retry
                # table-by-table, skipping the dead ones
                for t in tabs:
                    try:
                        _load([f"{path}/{t['path']}"], t["m_bits"])
                    except Exception:
                        continue

    dfs = []
    for s, files in sorted(split_files.items()):
        candidates = cand_by_split.get(s) or []
        if kb and candidates:
            from v6spark.operators.keybloom import K_HASHES, might_contain

            khash = kb.get("k", K_HASHES)
            candidates = [
                rel for rel in candidates
                if (ent := bmap.get(rel)) is None
                or any(
                    might_contain(ent[0], key, ent[1], khash)
                    for key in keys_by_shard.get(_shard_of(rel), [])
                )
            ]
        if _scan_observer is not None:
            _scan_observer(s, list(candidates))
        if not candidates:
            continue
        dfs.append(
            _read_split_mor(spark, path, s, candidates, doc)
            .filter(F.col(key_col).isin(keys))
            .withColumn("split", F.lit(s))
        )
    if not dfs:
        cols = (
            ", ".join(f"`{n}` {t}" for n, t in schema) + ", split string"
            if schema
            else f"`{key_col}` string, split string"
        )
        return spark.createDataFrame([], cols)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_published_where(
    spark,
    path: str,
    predicate: str,
    split: str | None = None,
    version: int | None = None,
    tag: str | None = None,
    branch: str | None = None,
    _scan_observer=None,
):
    """SELECTIVE committed read: the published rows satisfying a SQL
    ``predicate``, opening ONLY the files whose manifest-recorded
    per-column min/max ranges (``col_stats``, written at publish/DML
    time) can contain a matching row — Delta/Iceberg data skipping
    from the manifest alone, ZERO footer reads at query time.  On a
    100 TB publish a selective predicate over an ingestion-correlated
    column (event time, crawl date, monotone ids — each incremental
    upsert's files span only its own range) touches a handful of
    files instead of the corpus.

    Pruning is ADVISORY-NEGATIVE (:mod:`v6spark.operators.pruning`):
    unparseable predicates, NOT, columns without recorded stats,
    files published before stats recording — all degrade to scanning;
    a top-level OR of conjunct groups prunes per-disjunct (a file is
    skipped only when EVERY disjunct refutes it); the FULL predicate
    is re-applied by Spark on whatever survives, so results NEVER
    depend on the pruning, only the bytes read do.  Deletion vectors are honored (merge-on-read);
    ``version`` pins a historical publish; ``_scan_observer(split,
    files)`` is the test hook reporting which files were actually
    scanned.  Multi-split reads carry a ``split`` column, matching
    :func:`read_published_corpus`."""
    from v6spark import txlog
    from v6spark.operators.pruning import file_can_match_any, parse_disjuncts

    log = _log_dir(path, branch)
    version = _resolve_version(spark, path, version, tag, branch)
    if version is None:
        _v, doc = txlog.read_latest(spark, log)
    else:
        doc = txlog.read_version(spark, log, version)
    if doc is None:
        return None
    if doc.get("fmt") != "parquet":
        raise ValueError(
            f"read_published_where reads parquet publishes; this one is "
            f"{doc.get('fmt')!r}"
        )
    groups = parse_disjuncts(predicate)
    col_stats = _doc_col_stats(spark, path, doc)
    file_stats = _doc_file_stats(spark, path, doc)
    key_col = doc.get("key_col")
    schema = doc.get("schema")
    split_files = _published_split_files(spark, path, doc)
    if split is not None:
        split_files = {split: split_files.get(split, [])}
    pred = F.expr(predicate)
    single = split is not None
    dfs = []
    for s in sorted(split_files):
        cs, ks = col_stats.get(s) or {}, file_stats.get(s) or {}
        kept = []
        for rel in split_files[s]:
            stats = dict(cs.get(rel) or {})
            # fold the key-column [lo, hi, n] entry in as one more
            # range, and the directory-derived split label as a
            # constant pseudo-stat — `split = 'train'` prunes whole
            # splits through the same matcher
            if key_col and key_col not in stats and rel in ks:
                stats[key_col] = ks[rel][:2]
            stats.setdefault("split", [s, s, 0])
            if file_can_match_any(groups, stats):
                kept.append(rel)
        if _scan_observer is not None:
            _scan_observer(s, list(kept))
        if not kept:
            continue
        d = _read_split_mor(spark, path, s, kept, doc)
        if not single:
            # split attaches BEFORE the filter so predicates may
            # reference it (single-split reads have no split column —
            # use the `split=` argument there)
            d = d.withColumn("split", F.lit(s))
        dfs.append(d.filter(pred))
    if not dfs:
        parts = [f"`{n}` {t}" for n, t in (schema or [])]
        if not single:
            parts.append("split string")
        if not parts:
            # pre-schema manifest, single-split, nothing survived: the
            # result's columns are unknowable — None, like the other
            # degenerate committed-read cases, NOT an empty frame with
            # invented columns
            return None
        return spark.createDataFrame([], ", ".join(parts))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def published_file_census(
    spark, path: str, version: int | None = None,
    branch: str | None = None,
):
    """Per-file census of a committed publish FROM THE MANIFEST ALONE
    — (split, shard, file, rows, key_min, key_max) with zero file
    reads (the Iceberg ``files`` metadata-table idea): the operational
    view that drives compaction scheduling, skew checks, and DML
    cost estimates on a 100 TB table without touching storage.  Files
    published before stats recording carry NULL rows/bounds (readers
    treat them as must-scan; the census shows them as unknowns).
    Key bounds are stringified for a uniform schema across key
    types."""
    from v6spark import txlog

    log = _log_dir(path, branch)
    if version is None:
        _v, doc = txlog.read_latest(spark, log)
    else:
        doc = txlog.read_version(spark, log, version)
    if doc is None:
        return None
    split_files = _published_split_files(spark, path, doc)
    file_stats = _doc_file_stats(spark, path, doc)
    dv_files = (doc.get("dv") or {}).get("files") or {}

    def _shard_of(rel: str) -> int | None:
        for part in rel.split("/"):
            if part.startswith("shard="):
                return int(part.split("=", 1)[1])
        return None

    rows = []
    for s, files in sorted(split_files.items()):
        for rel in files:
            st = file_stats.get(s, {}).get(rel)
            rows.append((
                s,
                _shard_of(rel),
                rel,
                int(st[2]) if st and len(st) > 2 else None,
                str(st[0]) if st else None,
                str(st[1]) if st else None,
                int(dv_files.get(s, {}).get(rel, 0)),
            ))
    return spark.createDataFrame(
        rows,
        "split string, shard int, file string, rows long, "
        "key_min string, key_max string, dv_deleted long",
    )


def compaction_advice(
    spark,
    path: str,
    max_version_dirs: int = 8,
    max_files_per_shard: int = 4,
    min_rows_per_file: int | None = None,
    max_dv_deleted_rows: int | None = None,
    branch: str | None = None,
) -> dict:
    """Manifest-only answer to "should this publish be compacted?" —
    the OPTIMIZE scheduler's input, from :func:`published_file_census`
    with zero file reads.  Two fragmentation axes, because file-level
    DML fragments differently than appends: every retract/upsert
    REPLACES the affected shard files in a fresh version directory
    (per-shard file counts stay flat), so what accumulates is the
    number of VERSION DIRECTORIES the live file set spans — listing
    round-trips, vacuum pressure, and (after promotions) staged
    directories that cannot be reclaimed.  ``max_version_dirs`` flags
    that; ``max_files_per_shard`` / ``min_rows_per_file`` flag
    many-small-files layouts (big publishes write several part files
    per shard).  Returns {"needs_compaction", "version_dirs",
    "shards_over", "files_total", "files_unknown_stats"}; act with
    :func:`compact_published` (folds everything into one version
    dir)."""
    from v6spark import txlog

    census = published_file_census(spark, path, branch=branch)
    if census is None:
        raise ValueError(f"{path} has no committed publish")
    _v, doc = txlog.read_latest(spark, _log_dir(path, branch))
    rows = census.collect()
    vdirs = set()
    for r in rows:
        rel = r["file"]
        idx = rel.find("/split=")
        vdirs.add(rel[:idx] if idx >= 0 else rel.split("/", 1)[0])
    per_shard: dict[tuple, dict] = {}
    for r in rows:
        d = per_shard.setdefault(
            (r["split"], r["shard"]), {"n_files": 0, "rows": 0}
        )
        d["n_files"] += 1
        if r["rows"] is not None:
            d["rows"] += r["rows"]
    shards_over = []
    for (s, sh), d in per_shard.items():
        over = d["n_files"] > max_files_per_shard
        if (
            not over
            and min_rows_per_file is not None
            and d["n_files"] > 1
            and d["rows"] / d["n_files"] < min_rows_per_file
        ):
            over = True
        if over:
            shards_over.append({
                "split": s, "shard": sh,
                "n_files": d["n_files"], "rows": d["rows"],
            })
    # merge-on-read debt: deletion-vector'd rows cost a broadcast
    # anti-join on every read until a rewrite materializes them —
    # ``max_dv_deleted_rows`` turns that into a compaction trigger
    dv_deleted = sum(r["dv_deleted"] or 0 for r in rows)
    # a nominally clustered table that has accumulated file-level DML
    # holds unclustered fresh files: advise re-running the clustered
    # compact (OPTIMIZE ZORDER) rather than a plain one
    clustered_by = (doc or {}).get("clustered_by")
    recluster = bool(clustered_by) and doc is not None and _doc_has_files(doc)
    # a FRESH clustered layout legitimately holds one file per (curve
    # segment x shard): the plain files-per-shard threshold would flag
    # exactly what OPTIMIZE ZORDER just produced — that axis only
    # applies to unclustered tables and to clustered ones that have
    # since fragmented (recluster)
    cluster_fresh = bool(clustered_by) and not recluster
    # capture the ref BEFORE the stats accessor materializes (and
    # removes) it — ops wants to see that the table runs offloaded
    manifest_ref = (doc or {}).get("manifest_ref") or {}
    col_stats = _doc_col_stats(spark, path, doc)
    with_col_stats = sum(len(d) for d in col_stats.values())
    reasons = []
    if bool(shards_over) and not cluster_fresh:
        reasons.append("fragmented_shards")
    if len(vdirs) > max_version_dirs:
        reasons.append("version_dirs")
    if recluster:
        reasons.append("recluster")
    if (
        max_dv_deleted_rows is not None
        and dv_deleted > max_dv_deleted_rows
    ):
        reasons.append("dv_debt")
    return {
        "needs_compaction": bool(reasons),
        "reasons": reasons,
        "version_dirs": len(vdirs),
        "shards_over": sorted(
            shards_over, key=lambda d: (d["split"], d["shard"] or 0)
        ),
        "files_total": len(rows),
        "files_unknown_stats": sum(1 for r in rows if r["rows"] is None),
        "dv_deleted_rows": dv_deleted,
        "dv_files": sum(1 for r in rows if (r["dv_deleted"] or 0) > 0),
        "clustered_by": clustered_by,
        "recluster": recluster,
        "files_with_col_stats": with_col_stats,
        "bloom_tables": len(
            ((doc or {}).get("key_bloom") or {}).get("tables") or []
        ),
        "manifest_offloaded_entries": manifest_ref.get("entries") or 0,
    }


def maintain_published(
    spark,
    path: str,
    keep_last: int | None = None,
    vacuum: bool = True,
    commit_mode: str = "rename",
    incremental: bool = True,
    **advice_kwargs,
) -> dict:
    """One-call table maintenance — the scheduled OPTIMIZE job a
    production table runs nightly: read :func:`compaction_advice`
    (manifest-only, zero file reads), act on it, and optionally sweep
    retention.  The action matches the diagnosis (``advice["reasons"]``):

    - fragmentation ALONE on an unclustered table → the INCREMENTAL
      :func:`optimize_published` (folds only the fragmented groups —
      write cost tracks the fragmentation, not the corpus; pass
      ``incremental=False`` to force the full fold);
    - re-clustering debt, version-dir sprawl, or deletion-vector
      debt → the full :func:`compact_published` (ZORDER re-run with
      the recorded ``clustered_by`` where applicable);
    - healthy table → no-op beyond the (cheap) advice read.

    Vacuum honors tags and leases as always.  Multi-writer safe —
    both folds go through the OCC loop; a DML racing the maintenance
    wins or loses cleanly.  Returns the advice plus
    {"compacted": version|None, "optimized": result|None,
    "vacuumed_files": n}."""
    advice = compaction_advice(spark, path, **advice_kwargs)
    compacted = None
    optimized = None
    if advice["needs_compaction"]:
        if incremental and advice["reasons"] == ["fragmented_shards"]:
            # fold groups past the SAME threshold the advice flagged
            # (min_files_per_group=2 would fold every multi-file
            # group — a near-full rewrite on tables whose healthy
            # publish wrote several part files per shard)
            optimized = optimize_published(
                spark, path, commit_mode=commit_mode,
                min_files_per_group=int(
                    advice_kwargs.get("max_files_per_shard", 4)
                ) + 1,
            )
        else:
            compacted = compact_published(
                spark, path, commit_mode=commit_mode,
                cluster_by=advice.get("clustered_by") or None,
            )
    removed = (
        vacuum_published_files(spark, path, keep_last=keep_last)
        if vacuum
        else 0
    )
    return {**advice, "compacted": compacted, "optimized": optimized,
            "vacuumed_files": removed}


_STAGING = "_staging"


def stage_corpus_publish(
    prepared: DataFrame,
    content: DataFrame,
    path: str,
    name: str | None = None,
    **publish_kwargs,
) -> str:
    """WRITE step of write-audit-publish: commit a full corpus
    publish under ``<path>/_staging/<name>`` — its own transaction
    log, invisible to every reader of ``path`` — so quality gates can
    audit the EXACT committed bytes before any consumer sees them.
    Audit with :func:`read_staged_corpus` (plus anything else: judged
    queries, contamination checks, sketch drift); then
    :func:`promote_staged` makes it the corpus's next version by
    REFERENCE (zero data movement) or :func:`drop_staged` discards
    it.  The Iceberg WAP / Delta shallow-clone-gate pattern on the
    txlog.  ``publish_kwargs`` pass through to
    :func:`publish_corpus_committed` (n_shards, seed, key_col,
    sketch_specs, commit_mode, ...).  Returns the stage name."""
    import uuid

    name = name or uuid.uuid4().hex[:12]
    if "/" in name or name.startswith((".", "_")):
        raise ValueError(f"invalid stage name {name!r}")
    publish_corpus_committed(
        prepared, content, f"{path}/{_STAGING}/{name}", **publish_kwargs
    )
    return name


def read_staged_corpus(
    spark, path: str, name: str, split: str | None = None
):
    """Committed view of a staged publish — the audit surface."""
    return read_published_corpus(
        spark, f"{path}/{_STAGING}/{name}", split=split
    )


def list_staged(spark, path: str) -> list[str]:
    """Stage names currently present under ``<path>/_staging``."""
    from v6spark import txlog

    fs, jdir, _jvm = txlog._jfs(spark, f"{path}/{_STAGING}")
    if not fs.exists(jdir):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(jdir)
        if st.isDirectory()
    )


def promote_staged(
    spark,
    path: str,
    name: str,
    commit_mode: str = "rename",
    allow_schema_change: bool = False,
    txn_id: str | None = None,
    max_retries: int = 8,
) -> dict:
    """PUBLISH step of write-audit-publish: adopt the staged publish
    as the corpus's next committed version via a FILE-LEVEL manifest
    referencing the staged files in place — zero bytes move, so
    promotion is O(manifest) regardless of corpus size, and the bytes
    consumers read are bit-identical to the bytes the audit read.
    Carries the stage's schema, shard params, and per-file key stats,
    so post-promotion DML (retract/upsert/compact) and
    :func:`read_published_keys` prune exactly as on a direct publish;
    :func:`compact_published` later internalizes the files into a
    regular version dir, after which :func:`drop_staged` can reclaim
    the staging area.  Multi-writer safe (:func:`_occ_dml`);
    ``txn_id`` gives exactly-once promotion under replay.  The
    previous-publish schema drift guard applies
    (``allow_schema_change`` overrides, recorded).  Returns
    {"_version", "splits", "files"}."""
    from v6spark import txlog

    sroot = f"{path}/{_STAGING}/{name}"
    _sv, sdoc = txlog.read_latest(spark, f"{sroot}/{_COMMITS}")
    if sdoc is None:
        raise ValueError(f"no committed staged publish named {name!r}")
    if sdoc.get("fmt") != "parquet":
        raise ValueError(
            f"promote_staged requires a parquet stage; got "
            f"{sdoc.get('fmt')!r}"
        )
    split_files = _published_split_files(spark, sroot, sdoc)
    prefix = f"{_STAGING}/{name}/"
    files = {
        s: [prefix + rel for rel in fl] for s, fl in split_files.items()
    }
    stage_stats = _doc_file_stats(spark, sroot, sdoc)
    file_stats = {
        s: {prefix + rel: st for rel, st in d.items()}
        for s, d in stage_stats.items()
    }
    col_stats = {
        s: {prefix + rel: st for rel, st in d.items()}
        for s, d in _doc_col_stats(spark, sroot, sdoc).items()
    }
    key_bloom = sdoc.get("key_bloom")
    if key_bloom:
        # sidecar rows name files relative to the STAGE root;
        # file_prefix tells the probe how to translate them into
        # corpus-root rels (matching the prefixed manifest file lists)
        key_bloom = {
            **key_bloom,
            "tables": [
                {
                    **t,
                    "path": prefix + t["path"],
                    "file_prefix": prefix + t.get("file_prefix", ""),
                }
                for t in (key_bloom.get("tables") or [])
            ],
        }
    sketches = {
        sk_name: {**spec, "dir": f"{_STAGING}/{name}/{spec['dir']}"}
        for sk_name, spec in (sdoc.get("sketches") or {}).items()
    }

    def _attempt(version, doc, vdir, data_root):
        if (
            txn_id is not None
            and doc is not None
            and txn_id in (doc.get("txn_ids") or [])
        ):
            return None, {
                "_version": version,
                "splits": dict(doc["splits"]),
                "files": 0,
                "replayed": True,
            }
        schema = sdoc.get("schema")
        prev_schema = (doc or {}).get("schema")
        if (
            doc is not None
            and prev_schema is not None
            and schema != prev_schema
            and not allow_schema_change
        ):
            raise ValueError(
                f"staged schema differs from the published schema: "
                f"{prev_schema} -> {schema}; pass "
                "allow_schema_change=True to promote anyway"
            )
        cons = (doc or {}).get("constraints") or {}
        if cons:
            # promotion IS write-audit-publish's publish step: the
            # staged bytes were never seen by a constrained ingress,
            # so the CHECK audit runs here, on the exact files the
            # manifest is about to reference
            _enforce_constraints(
                read_staged_corpus(spark, path, name).drop("split"),
                cons, f"the staged publish {name!r}",
            )
        payload = {
            "fmt": "parquet",
            "splits": dict(sdoc["splits"]),
            "files": files,
            "schema": schema,
            "schema_changed": bool(
                doc is not None
                and prev_schema is not None
                and schema != prev_schema
            ),
            "n_shards": sdoc.get("n_shards"),
            "seed": sdoc.get("seed"),
            "key_col": sdoc.get("key_col"),
            "file_stats": file_stats,
            "col_stats": col_stats,
            "txn_ids": _txn_forward(doc, txn_id),
            "promoted_from_stage": name,
        }
        _carry_constraints(doc, payload)
        if key_bloom:
            payload["key_bloom"] = key_bloom
        if sketches:
            payload["sketches"] = sketches
        return payload, {
            "splits": dict(sdoc["splits"]),
            "files": sum(len(fl) for fl in files.values()),
        }

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries)


def drop_staged(spark, path: str, name: str) -> bool:
    """Discard a staged publish (failed audit, or reclaimed after
    :func:`compact_published` internalized a promotion).  REFUSES
    while any retained manifest of ``path`` still references files
    under the stage — dropping then would delete committed data out
    from under readers; compact first, or wait for retention."""
    from v6spark import txlog

    prefix = f"{_STAGING}/{name}/"
    manifests = txlog._complete_manifests(spark, f"{path}/{_COMMITS}")
    for v, doc in manifests.items():
        for fl in (_doc_files(spark, path, doc) or {}).values():
            if any(rel.startswith(prefix) for rel in fl):
                raise ValueError(
                    f"stage {name!r} is referenced by committed version "
                    f"{v} — compact_published + vacuum first"
                )
    fs, jdir, _jvm = txlog._jfs(spark, f"{path}/{_STAGING}/{name}")
    if not fs.exists(jdir):
        return False
    fs.delete(jdir, True)
    return True


def _write_publish_sketches(
    spark, data_root: str, vdir: str, sketch_specs: dict, counts: dict
) -> dict:
    """Compute per-split register tables from the just-written version
    directory and persist them INSIDE it (``_sketch/<name>``, skipped
    by data readers) — same transaction as the data because the
    manifest that names both commits last.  Registers are computed
    from the committed BYTES (a re-read of only the sketched columns,
    columnar), so they describe exactly what shipped, not an upstream
    frame that might differ.  Returns the manifest ``sketches`` doc.
    """
    from v6spark.operators import sketches as _sk

    recorded = {}
    for name, spec in sketch_specs.items():
        kind = spec.get("kind")
        expr = spec.get("expr")
        if kind not in ("hll", "dds") or not expr:
            raise ValueError(
                f"sketch spec {name!r} needs kind in ('hll','dds') and an "
                f"'expr'; got {spec!r}"
            )
        frames = []
        for s in sorted(counts):
            x = F.expr(expr)
            if kind == "hll":
                # the portable 60-bit hash is md5-based: string input
                x = x.cast("string")
            df = spark.read.parquet(f"{data_root}/split={s}").select(
                x.alias("_x")
            )
            if kind == "hll":
                sk = _sk.hll_sketch(df, "_x", p=spec.get("p", 12))
            else:
                sk = _sk.dds_sketch(df, "_x", alpha=spec.get("alpha", 0.01))
            frames.append(sk.withColumn("split", F.lit(s)))
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        out.write.mode("error").parquet(f"{data_root}/_sketch/{name}")
        doc = {"kind": kind, "expr": expr, "dir": f"{vdir}/_sketch/{name}"}
        if kind == "hll":
            doc["p"] = spec.get("p", 12)
        else:
            doc["alpha"] = spec.get("alpha", 0.01)
        recorded[name] = doc
    return recorded


def read_published_sketch(
    spark, path: str, name: str, version: int | None = None
):
    """Register/bucket table of a publish-time sketch (columns:
    registers..., split) — the monitoring state for ``version`` (or
    latest), readable without touching the corpus."""
    from v6spark import txlog

    if version is None:
        _v, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    else:
        doc = txlog.read_version(spark, f"{path}/{_COMMITS}", version)
    if doc is None:
        return None
    spec = (doc.get("sketches") or {}).get(name)
    if spec is None:
        raise ValueError(
            f"version has no sketch {name!r} (publish with sketch_specs; "
            "file-level DML versions carry no registers — the data "
            "changed, so pre-DML registers would lie)"
        )
    return spark.read.parquet(f"{path}/{spec['dir']}"), spec


def published_corpus_drift(
    spark,
    path: str,
    old_version: int,
    new_version: int | None = None,
    quantiles: tuple = (0.5, 0.95, 0.99),
):
    """Approximate drift report between two committed publishes FROM
    REGISTERS ALONE — zero corpus rescans (the r5 sketch-store idea,
    transactionally coupled to the publish): for every sketch both
    versions carry, HLL → approx-distinct old/new/delta, DDSketch →
    the requested quantiles old/new/delta.  Returns a DataFrame
    (sketch, metric, old, new, delta) — the drift columns a release
    gate reads next to :func:`published_corpus_diff`'s per-doc census.
    """
    from v6spark import txlog
    from v6spark.operators import sketches as _sk

    old_doc = txlog.read_version(spark, f"{path}/{_COMMITS}", old_version)
    if new_version is None:
        new_version, new_doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    else:
        new_doc = txlog.read_version(spark, f"{path}/{_COMMITS}", new_version)
    if old_doc is None or new_doc is None:
        raise ValueError(
            f"published_corpus_drift needs both manifests retained "
            f"(old={old_version}, new={new_version})"
        )
    old_sk = old_doc.get("sketches") or {}
    new_sk = new_doc.get("sketches") or {}
    common = sorted(set(old_sk) & set(new_sk))
    if not common:
        raise ValueError(
            "no sketch is present in BOTH versions — publish with the "
            "same sketch_specs to enable register-only drift"
        )
    rows = []
    for name in common:
        o_spec, n_spec = old_sk[name], new_sk[name]
        if o_spec["kind"] != n_spec["kind"]:
            continue
        o_regs = spark.read.parquet(f"{path}/{o_spec['dir']}")
        n_regs = spark.read.parquet(f"{path}/{n_spec['dir']}")
        if o_spec["kind"] == "hll":
            o = _sk.hll_estimate(o_regs, p=o_spec["p"]).collect()[0][0]
            n = _sk.hll_estimate(n_regs, p=n_spec["p"]).collect()[0][0]
            rows.append((name, "approx_distinct", float(o), float(n)))
        else:
            qs = list(quantiles)
            o = {
                r["q"]: r["value"]
                for r in _sk.dds_quantiles(
                    o_regs, qs, alpha=o_spec["alpha"]
                ).collect()
            }
            n = {
                r["q"]: r["value"]
                for r in _sk.dds_quantiles(
                    n_regs, qs, alpha=n_spec["alpha"]
                ).collect()
            }
            for q in qs:
                rows.append(
                    (name, f"p{int(q * 100)}", float(o[q]), float(n[q]))
                )
    return spark.createDataFrame(
        [(s, m, o, n, n - o) for s, m, o, n in rows],
        "sketch string, metric string, old double, new double, "
        "delta double",
    )


def published_corpus_diff(
    spark,
    path: str,
    old_version: int,
    new_version: int | None = None,
    key_col: str = "doc_id",
    content_col: str = "text",
):
    """Release-gate census between two COMMITTED corpus versions:
    per-document ``added`` / ``removed`` / ``changed`` / ``unchanged``
    (``operators.profile.corpus_diff`` over version-pinned reads —
    the "what did the new crawl/filters actually change?" report
    against the exact bytes each version shipped, not whatever is on
    disk today).  Requires both versions retained
    (``vacuum_published(keep_last=...)``)."""
    from v6spark.operators.profile import corpus_diff

    old = read_published_corpus(spark, path, version=old_version)
    new = read_published_corpus(spark, path, version=new_version)
    if old is None or new is None:
        raise ValueError(
            f"published_corpus_diff needs both versions committed and "
            f"retained under {path} (old={old_version}, "
            f"new={new_version if new_version is not None else 'latest'})"
        )
    return corpus_diff(
        old.drop("split"), new.drop("split"),
        id_col=key_col, content_col=content_col,
    )


def published_corpus_changes(
    spark,
    path: str,
    old_version: int,
    new_version: int | None = None,
    key_col: str | None = None,
    branch: str | None = None,
):
    """Row-level CHANGE FEED between two committed corpus versions —
    the Delta CDF / Iceberg changelog-scan idea reconstructed from
    the publish manifests alone: the two versions' file lists are
    diffed FIRST, and only files present in exactly one version are
    read, so the scan cost tracks what the intervening DML touched
    (retract/upsert rewrite 3 of 192 files → 3+3 files read here),
    never the corpus size.  A compaction — every file rewritten, no
    row changed — reads its rewritten files but emits ZERO rows: rows
    present on both sides with identical content (null-safe struct
    equality over the unified schema + split) are dropped as
    unchanged.

    Returns a DataFrame with the publish's unified schema (additive
    evolution applied to BOTH sides, old files reading typed NULLs)
    plus ``split``, ``_change_type`` in ``insert | delete |
    update_preimage | update_postimage`` (a split move surfaces as an
    update), and ``_commit_version`` = ``new_version``.  ``None`` when
    nothing changed.  Incremental consumers: feed each committed
    version transition to this and apply downstream — the streaming
    twin is :func:`v6spark.sources.publog` + ``foreachBatch``.
    Requires both manifests retained (``vacuum_published``)."""
    from v6spark import txlog

    log = _log_dir(path, branch)
    old_doc = txlog.read_version(spark, log, old_version)
    if new_version is None:
        new_version, new_doc = txlog.read_latest(spark, log)
    else:
        new_doc = txlog.read_version(spark, log, new_version)
    if old_doc is None or new_doc is None:
        raise ValueError(
            f"published_corpus_changes needs both manifests retained "
            f"(old={old_version}, new={new_version})"
        )
    for doc in (old_doc, new_doc):
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "published_corpus_changes reads parquet publishes; "
                f"found fmt={doc.get('fmt')!r}"
            )
    key = key_col or new_doc.get("key_col") or old_doc.get("key_col")
    if key is None:
        raise ValueError(
            "neither manifest records key_col — pass key_col explicitly"
        )
    # the newer schema is the unified read schema (evolution is
    # additive-only, so it is a superset of the old one)
    schema = new_doc.get("schema") or old_doc.get("schema")
    old_files = _published_split_files(spark, path, old_doc)
    new_files = _published_split_files(spark, path, new_doc)

    def _side(files_by_split, other, doc):
        # merge-on-read with the SIDE'S OWN deletion vectors (a row
        # dv-deleted in the old version must not resurface as a
        # pre-image; one dv-deleted before the new version must not
        # emit as an insert), but the UNIFIED schema for both sides
        dfs = []
        for s, fl in sorted(files_by_split.items()):
            only = sorted(set(fl) - set(other.get(s, [])))
            if only:
                dfs.append(
                    _read_split_mor(
                        spark, path, s, only, {**doc, "schema": schema}
                    ).withColumn("split", F.lit(s))
                )
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    old_side = _side(old_files, new_files, old_doc)
    new_side = _side(new_files, old_files, new_doc)

    # DELETION-VECTOR DELTA: a DV retraction changes no file list —
    # its deletes live in positions marked in new but not old, inside
    # files present in BOTH versions.  Read only those files, keep
    # only the newly-marked positions, and feed them in as old-side
    # pre-images (the join below classifies them: delete, or update
    # if an intervening upsert re-inserted the key elsewhere).
    old_dvf = (old_doc.get("dv") or {}).get("files") or {}
    new_dvf = (new_doc.get("dv") or {}).get("files") or {}
    delta_files: dict[str, list[str]] = {}
    for s, fl in new_files.items():
        both = set(fl) & set(old_files.get(s, []))
        rels = sorted(
            rel for rel in both
            if new_dvf.get(s, {}).get(rel, 0) > old_dvf.get(s, {}).get(rel, 0)
        )
        if rels:
            delta_files[s] = rels
    if delta_files:
        new_dv_frame = _read_dv(spark, path, new_doc)
        old_dv_frame = _read_dv(spark, path, old_doc)
        delta_pos = (
            new_dv_frame if old_dv_frame is None
            else new_dv_frame.exceptAll(old_dv_frame)
        )
        pre_frames = []
        for s, rels in sorted(delta_files.items()):
            df = _read_split_files(
                spark, path, s, rels, schema=schema, with_pos=True
            )
            dpos = delta_pos.filter(F.col("split") == s).select(
                F.col("file").alias("__file"), F.col("pos").alias("__pos")
            )
            pre_frames.append(
                df.join(F.broadcast(dpos), ["__file", "__pos"], "left_semi")
                .drop("__file", "__pos")
                .withColumn("split", F.lit(s))
            )
        dv_pre = pre_frames[0]
        for p in pre_frames[1:]:
            dv_pre = dv_pre.unionByName(p)
        old_side = (
            dv_pre if old_side is None else old_side.unionByName(dv_pre)
        )

    if old_side is None and new_side is None:
        return None  # identical file lists + vectors: metadata-only

    cols = (
        [n for n, _t in schema]
        if schema
        else [c for c in (old_side or new_side).columns if c != "split"]
    )
    if key not in cols:
        raise ValueError(f"key column {key!r} is not in the published schema")
    out_cols = cols + ["split"]

    def _tag(df, ctype):
        return df.select(
            *out_cols,
            F.lit(ctype).alias("_change_type"),
            F.lit(new_version).cast("long").alias("_commit_version"),
        )

    if old_side is None:
        return _tag(new_side, "insert")
    if new_side is None:
        return _tag(old_side, "delete")

    o = old_side.select(
        [F.col(c).alias(f"__o_{c}") for c in out_cols]
    )
    n = new_side.select(
        [F.col(c).alias(f"__n_{c}") for c in out_cols]
    )
    joined = o.join(
        n, o[f"__o_{key}"] == n[f"__n_{key}"], "full_outer"
    )
    # SINGLE-PASS classification: each joined row maps to an array of
    # 0..2 change structs, exploded once — a filter+union formulation
    # would re-run the join per change class (4x) and again per
    # consumer action over the returned frame
    o_cmp = F.struct(*[F.col(f"__o_{c}") for c in out_cols])
    n_cmp = F.struct(*[F.col(f"__n_{c}") for c in out_cols])

    def _mk(prefix, ctype):
        return F.struct(
            *[F.col(f"{prefix}{c}").alias(c) for c in out_cols],
            F.lit(ctype).alias("_change_type"),
        )

    # typed empty array of the same struct shape (unchanged rows
    # explode to nothing); split is compared too: a split move counts
    empty = F.slice(F.array(_mk("__o_", "unchanged")), 1, 0)
    changes_arr = (
        F.when(F.col(f"__n_{key}").isNull(), F.array(_mk("__o_", "delete")))
        .when(F.col(f"__o_{key}").isNull(), F.array(_mk("__n_", "insert")))
        .when(
            ~o_cmp.eqNullSafe(n_cmp),
            F.array(
                _mk("__o_", "update_preimage"),
                _mk("__n_", "update_postimage"),
            ),
        )
        .otherwise(empty)
    )
    return joined.select(F.explode(changes_arr).alias("_c")).select(
        *[F.col(f"_c.{c}").alias(c) for c in out_cols],
        F.col("_c._change_type").alias("_change_type"),
        F.lit(new_version).cast("long").alias("_commit_version"),
    )


def _branch_log_dirs(spark, path: str) -> list[str]:
    """Commit-log dirs of every live branch under ``path``."""
    from v6spark import txlog

    fs, jdir, _jvm = txlog._jfs(spark, f"{path}/{_BRANCHES}")
    if not fs.exists(jdir):
        return []
    return sorted(
        f"{path}/{_BRANCHES}/{st.getPath().getName()}"
        for st in fs.listStatus(jdir)
        if st.isDirectory()
    )


def vacuum_published(
    spark, path: str, keep_last: int | None = None,
    grace_seconds: float = 0.0,
    keep_since=None, dry_run: bool = False,
    _resolved: bool = False,
) -> int | dict:
    """Delete version directories no retained manifest references
    (crashed orphans, superseded publishes) and retired manifests.
    ``keep_last`` retains the newest N complete versions for
    version-pinned (time-travel) readers; every live branch's
    manifests are retained wholesale (branches share main's data
    pool).  ``grace_seconds`` spares recently-modified directories —
    set it above the longest write wherever DML writers run
    concurrently (see :func:`v6spark.txlog.vacuum_versions`).
    Returns directories removed.

    ``dry_run=True`` deletes NOTHING and returns the audit instead —
    ``{"directories": [names], "manifests": [log files]}`` that the
    same call without the flag would remove (the Delta ``VACUUM ...
    DRY RUN`` shape: retention mistakes are found by reading the
    plan, not by losing the data).

    ``keep_last=None`` (the default) reads the table's recorded
    retention policy (:func:`set_published_retention`), falling back
    to 1; an explicit argument always wins."""
    from v6spark import txlog

    if not _resolved:
        if keep_since is not None:
            from v6spark.sources.pubcorpus import _parse_as_of

            keep_since = _parse_as_of(keep_since)
        keep_last, keep_since = _resolve_retention(
            spark, path, keep_last, keep_since
        )
    return txlog.vacuum_versions(
        spark, path, f"{path}/{_COMMITS}", "v=", keep_last=keep_last,
        grace_seconds=grace_seconds,
        extra_log_dirs=tuple(_branch_log_dirs(spark, path)),
        keep_since=keep_since, dry_run=dry_run,
    )


def acquire_read_lease(
    spark, path: str, version: int | None = None,
    ttl_seconds: float = 3600.0, owner: str = "",
) -> tuple[str, int]:
    """Protect a published version from vacuum while a long read runs:
    registers a TTL'd lease in the commit log that every vacuum
    (:func:`vacuum_published`, :func:`vacuum_published_files`) honors
    as retained, beyond ``keep_last``.  ``version=None`` leases the
    current latest.  Pattern::

        lease, v = acquire_read_lease(spark, root, ttl_seconds=4*3600)
        try:
            df = read_published_corpus(spark, root, version=v)
            ...long evaluation...
        finally:
            release_read_lease(spark, root, lease)

    The TTL bounds a crashed reader's hold; refresh with a new lease
    for reads longer than the ttl.  Returns (lease_id, version)."""
    from v6spark import txlog

    if version is None:
        version, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
        if doc is None:
            raise ValueError(f"{path} has no committed publish to lease")
    lease_id = txlog.acquire_lease(
        spark, f"{path}/{_COMMITS}", version, ttl_seconds, owner=owner
    )
    return lease_id, version


def release_read_lease(spark, path: str, lease_id: str) -> bool:
    """Release a lease from :func:`acquire_read_lease`."""
    from v6spark import txlog

    return txlog.release_lease(spark, f"{path}/{_COMMITS}", lease_id)


def tag_published(
    spark, path: str, name: str, version: int | None = None,
    replace: bool = False,
) -> int:
    """Pin a NAMED, vacuum-proof reference to a published version —
    the Iceberg tag on the corpus commit log.  ``tag_published(spark,
    root, "eval-baseline")`` makes that exact snapshot reproducible
    months later on a table with daily ``keep_last=1`` retention:
    both vacuums treat the tagged version as retained until
    :func:`delete_published_tag`.  Unlike a read lease, a tag has no
    TTL — it is corpus METADATA (which bytes 'prod' means), not a
    reader's liveness claim.  Returns the pinned version."""
    from v6spark import txlog

    return txlog.create_tag(
        spark, f"{path}/{_COMMITS}", name, version=version, replace=replace
    )


def delete_published_tag(spark, path: str, name: str) -> bool:
    """Drop a named reference; its version re-enters normal retention
    at the next vacuum.  True if the tag existed."""
    from v6spark import txlog

    return txlog.delete_tag(spark, f"{path}/{_COMMITS}", name)


def list_published_tags(spark, path: str) -> dict[str, int]:
    """{tag: version} for the corpus's named references."""
    from v6spark import txlog

    return txlog.list_tags(spark, f"{path}/{_COMMITS}")


def _missing_published_files(spark, path: str, doc: dict) -> list[str]:
    """Referenced-but-absent data/DV files for a manifest — grouped
    per live version dir so the check is one recursive listing per
    directory, not one existence RPC per file (a restored manifest
    can reference hundreds of thousands of files; per-file
    ``fs.exists`` would be the py4j round-trip wall
    :func:`_list_data_files` exists to avoid)."""
    # capture sidecar-tree refs BEFORE the file census: materializing
    # an offloaded manifest (inside _doc_files) removes manifest_ref
    # from the doc in place
    tree_rels = [
        t["path"]
        for t in (doc.get("key_bloom") or {}).get("tables") or []
    ]
    tree_rels += [
        spec["dir"] for spec in (doc.get("sketches") or {}).values()
    ]
    ref = doc.get("manifest_ref")
    if ref and ref.get("dir"):
        tree_rels.append(str(ref["dir"]))
    referenced = {
        rel
        for fl in _published_split_files(spark, path, doc).values()
        for rel in fl
    }
    referenced.update((doc.get("dv") or {}).get("data", []) or [])
    # directory-level publish manifests list their files by walking
    # the directory NOW, so a file lost out-of-band would self-heal
    # out of the census above — the per-file stats sections recorded
    # at write time are the durable reference set (best-effort: files
    # whose key stats were unusable are omitted there)
    for section in ("file_stats", "col_stats"):
        stats = _doc_col_stats(spark, path, doc) if section == "col_stats" \
            else _doc_file_stats(spark, path, doc)
        for per_split in (stats or {}).values():
            referenced.update((per_split or {}).keys())
    by_dir: dict[str, set] = {}
    for rel in referenced:
        by_dir.setdefault(rel.split("/", 1)[0], set()).add(rel)
    missing: list[str] = []
    for vdir, rels in sorted(by_dir.items()):
        present = {
            _rel_path(p, path)
            for p in _list_data_files(spark, f"{path}/{vdir}")
        }
        missing.extend(sorted(rels - present))
    # sidecar TREES the manifest points at (Bloom tables, sketches,
    # an offloaded-manifest dir, captured above): a carried reference
    # to a vacuumed sidecar would fail READERS of the committed
    # result — the exact outcome this check exists to catch for data
    # files.  Few entries (O(commits)), one exists-probe each
    # (listing skips "_"-prefixed names, so probe the raw FS).
    if tree_rels:
        from v6spark import txlog

        fs, jroot, jvm = txlog._jfs(spark, path)
        for rel in sorted(set(tree_rels)):
            p = jvm.org.apache.hadoop.fs.Path(jroot, rel)
            if not fs.exists(p):
                missing.append(rel)
    return missing


def restore_published(
    spark,
    path: str,
    version: int | None = None,
    tag: str | None = None,
    as_of=None,
    branch: str | None = None,
    commit_mode: str = "rename",
    txn_id: str | None = None,
    max_retries: int = 8,
) -> dict:
    """Roll the published corpus BACK to an earlier committed version
    as a NEW commit — the Delta ``RESTORE TABLE ... TO VERSION AS OF``
    verb.  Bad upsert landed at v7?  ``restore_published(spark, root,
    version=6)`` commits v8 whose manifest re-references v6's exact
    files: readers see v6's bytes again, nothing is rewritten, and
    the mistake stays inspectable at v7 (time travel still serves
    it) — rollback is an audited forward step in the log, never a
    log rewrite.

    The target is any one time-travel reference: ``version=``,
    ``tag=``, or ``as_of=`` (epoch/ISO timestamp, resolved like the
    readers' ``asOf`` option).  Restoring the current head is a
    no-op (returns ``{"noop": True}``, commits nothing).

    Scale shape: METADATA-ONLY — the new manifest copies the target's
    file references (including an offloaded ``manifest_ref`` pointer,
    which both vacuums already retain by the ref rule), so the commit
    is O(manifest), zero data bytes move at any corpus size.  Before
    committing, every referenced data/DV file is verified present
    with one recursive listing per live version dir:
    :func:`vacuum_published_files` may have swept superseded
    originals past retention, and silently committing a manifest
    with holes would fail *readers* instead of the restorer.  The
    error names the missing files; ``tag_published`` on versions you
    may need to restore to is the prevention.

    CDC composes for free: the restore window's
    :func:`published_corpus_changes` / ``readStream`` diff is an
    ordinary manifest diff, so consumers see the net
    deletes/inserts/updates that un-did the rolled-back commits.
    MULTI-WRITER SAFE via :func:`_occ_dml`; ``txn_id`` gives
    exactly-once replay like every other verb.

    Returns {"_version", "restored_from", "previous_version",
    "splits"}.
    """
    from v6spark import txlog

    log = _log_dir(path, branch)
    target = _resolve_version(
        spark, path, version, tag, branch=branch, as_of=as_of
    )
    if target is None:
        raise ValueError(
            "restore_published needs a target: pass version=, tag=, "
            "or as_of="
        )
    target = int(target)

    def _attempt(cur_version, cur_doc, vdir, data_root):
        if cur_doc is None:
            raise ValueError(
                f"{path} has no committed publish to restore"
            )
        if txn_id is not None and txn_id in (cur_doc.get("txn_ids") or []):
            return None, {
                "_version": cur_version,
                "restored_from": target,
                "previous_version": cur_version,
                "splits": dict(cur_doc.get("splits") or {}),
                "replayed": True,
            }
        if target == cur_version:
            return None, {
                "_version": cur_version,
                "restored_from": target,
                "previous_version": cur_version,
                "splits": dict(cur_doc.get("splits") or {}),
                "noop": True,
            }
        if target > cur_version:
            raise ValueError(
                f"cannot restore {path} forward: target version "
                f"{target} is past the current head {cur_version}"
            )
        tdoc = txlog.read_version(spark, log, target)
        if tdoc is None:
            raise ValueError(
                f"cannot restore {path} to version {target}: that "
                "manifest is not retained (vacuumed, or never "
                "committed) — tag_published pins versions you may "
                "need to restore to"
            )
        missing = _missing_published_files(spark, path, tdoc)
        if missing:
            shown = ", ".join(missing[:5])
            raise ValueError(
                f"cannot restore {path} to version {target}: "
                f"{len(missing)} referenced data file(s) were "
                f"vacuumed (first: {shown}) — file-level retention "
                "(vacuum_published_files) outlived the manifest; "
                "restore targets must be tagged or within retention"
            )
        payload = {
            k: v
            for k, v in tdoc.items()
            if k not in ("txn_ids", "intent") and k not in _OP_MARKERS
        }
        payload["txn_ids"] = _txn_forward(cur_doc, txn_id)
        payload["schema_changed"] = (
            cur_doc.get("schema") != tdoc.get("schema")
        )
        payload["restore_of"] = {
            "version": target,
            "from_version": cur_version,
        }
        return payload, {
            "restored_from": target,
            "previous_version": cur_version,
            "splits": dict(tdoc.get("splits") or {}),
        }

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
                    log_dir=log)


# ------------------------------------------------------------------ #
# CHECK constraints — data-quality contracts enforced at every write  #
# ------------------------------------------------------------------ #
#
# Delta's ALTER TABLE ADD CONSTRAINT (CHECK ...) for the published
# corpus: a named SQL boolean stored in the manifest that every
# ingress surface must satisfy before its commit lands.  SQL CHECK
# three-valued semantics: a row violates only when the expression IS
# FALSE — NULL passes (so `day < 7` admits NULL days; spell
# `day IS NOT NULL AND day < 7` to also ban them).
#
# Enforcement points (each documented at its site):
# - publish_corpus_committed / promote_staged: the incoming frame
# - upsert_into_published: the delta (kept files already passed)
# - the SQL writer + streaming sink: per Arrow batch on executors,
#   evaluated by DuckDB (no JVM in that path) — which is why
#   set_published_constraint gates expressions on BOTH engines
# - retract/compact/reshard/restore only remove or move rows that
#   already passed: they carry the constraints, nothing to re-check


#: Per-commit OPERATION markers the verbs record (what happened at
#: that version).  Verbs that COPY the previous doc wholesale
#: (restore, set/drop constraint, evolve, merge adoption) strip these
#: before adding their own, so a manifest describes ITS commit, not a
#: stale ancestor's; published_history classifies on them.
_OP_MARKERS = (
    "restore_of", "merged_into", "merged_from", "fast_forwarded_from",
    "constraint_change", "retention_change", "cloned_from",
    "noop_txn", "appended", "upsert", "retraction", "compacted_from",
    "resharded_from", "optimized", "promoted_from_stage",
    "schema_evolution",
)


def _carry_constraints(doc: dict | None, payload: dict) -> dict:
    """Forward the table's persistent properties (CHECK constraints,
    retention policy) through a DML commit."""
    for k in ("constraints", "retention"):
        if doc and doc.get(k) and k not in payload:
            payload[k] = doc[k]
    return payload


def _first_constraint_violation(df, constraints: dict):
    """``(name, row_dict)`` for the first row failing a CHECK
    constraint, else None — ONE job over ``df`` regardless of the
    constraint count (all flags computed in a single pass; filters
    stay JVM-side so Catalyst pushes what it can into the scan)."""
    if not constraints:
        return None
    names = sorted(constraints)
    flags = [
        (~F.coalesce(F.expr(constraints[n]), F.lit(True)))
        .alias(f"__viol_{i}")
        for i, n in enumerate(names)
    ]
    cond = F.lit(False)
    for i in range(len(names)):
        cond = cond | F.col(f"__viol_{i}")
    rows = df.select("*", *flags).where(cond).limit(1).collect()
    if not rows:
        return None
    r = rows[0].asDict()
    for i, n in enumerate(names):
        if r.get(f"__viol_{i}"):
            return n, {
                k: v for k, v in r.items()
                if not k.startswith("__viol_")
            }
    return None  # unreachable: cond selected the row


def _enforce_constraints(df, constraints: dict, surface: str) -> None:
    hit = _first_constraint_violation(df, constraints)
    if hit is not None:
        name, row = hit
        raise ValueError(
            f"CHECK constraint {name!r} ({constraints[name]}) "
            f"violated by {surface} — first offending row: {row}; "
            "nothing was committed"
        )


def _duckdb_constraint_gate(df, expr: str) -> None:
    """Refuse a constraint the SQL writer could not enforce: that
    path commits without a JVM, so expressions are evaluated by
    DuckDB per Arrow batch — the constraint must parse and type-check
    there too (the common SQL subset: comparisons, arithmetic,
    length/substr/lower/upper, IN, BETWEEN, AND/OR/NOT...)."""
    import duckdb

    empty = df.limit(0).toArrow()
    con = duckdb.connect()
    try:
        con.register("_published", empty)
        con.execute(
            "SELECT count(*) FROM _published "
            f"WHERE NOT coalesce(({expr}), TRUE)"
        ).fetchone()
    except Exception as exc:
        raise ValueError(
            f"CHECK constraint expression {expr!r} is not in the "
            "portable SQL subset (it must evaluate identically under "
            "Spark SQL and DuckDB, because the pubcorpus SQL writer "
            f"enforces it without a JVM): {exc}"
        ) from exc
    finally:
        con.close()


def set_published_constraint(
    spark,
    path: str,
    name: str,
    expr: str,
    branch: str | None = None,
    commit_mode: str = "rename",
    max_retries: int = 8,
) -> dict:
    """Add (or replace) a named CHECK constraint on the published
    corpus as a metadata-only commit — Delta's ``ALTER TABLE ADD
    CONSTRAINT``.  The EXISTING rows are validated first (one scan at
    the attempt's version, inside the OCC loop, so a concurrent
    append of a violating row forces revalidation rather than racing
    past the check); every later write surface then enforces the
    constraint before its commit.  Violating rows fail with the
    constraint name and the first offending row.  Returns
    {"_version", "constraints"}.
    """
    if not name or not str(name).strip():
        raise ValueError("constraint name must be non-empty")
    if not expr or not isinstance(expr, str):
        raise ValueError("constraint expression must be a SQL string")
    log = _log_dir(path, branch)

    def _attempt(cur_version, cur_doc, vdir, data_root):
        if cur_doc is None:
            raise ValueError(
                f"{path} has no committed publish to constrain"
            )
        # constraints range over the published CONTENT columns only
        # (split is directory layout, not data — the publish input
        # and the SQL writer's parquet rows don't carry it)
        table = read_published_corpus(
            spark, path, version=cur_version, branch=branch
        ).drop("split")
        _enforce_constraints(
            table, {name: expr},
            f"existing rows of version {cur_version}",
        )
        _duckdb_constraint_gate(table, expr)
        cons = dict(cur_doc.get("constraints") or {})
        cons[str(name)] = expr
        payload = {
            k: v
            for k, v in cur_doc.items()
            if k != "intent" and k not in _OP_MARKERS
        }
        payload["constraints"] = cons
        payload["constraint_change"] = {"set": str(name), "expr": expr}
        payload["txn_ids"] = _txn_forward(cur_doc, None)
        return payload, {"constraints": dict(cons)}

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
                    log_dir=log)


def drop_published_constraint(
    spark,
    path: str,
    name: str,
    branch: str | None = None,
    commit_mode: str = "rename",
    max_retries: int = 8,
) -> dict:
    """Remove a named CHECK constraint (metadata-only commit).
    Unknown names are refused — a typo'd drop silently succeeding
    would leave the caller believing enforcement stopped."""
    log = _log_dir(path, branch)

    def _attempt(cur_version, cur_doc, vdir, data_root):
        if cur_doc is None:
            raise ValueError(f"{path} has no committed publish")
        cons = dict(cur_doc.get("constraints") or {})
        if name not in cons:
            raise ValueError(
                f"{path} has no CHECK constraint named {name!r} "
                f"(present: {sorted(cons) or 'none'})"
            )
        del cons[name]
        payload = {
            k: v
            for k, v in cur_doc.items()
            if k not in ("intent", "constraints")
            and k not in _OP_MARKERS
        }
        if cons:
            payload["constraints"] = cons
        payload["constraint_change"] = {"dropped": str(name)}
        payload["txn_ids"] = _txn_forward(cur_doc, None)
        return payload, {"constraints": dict(cons)}

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
                    log_dir=log)


def list_published_constraints(
    spark, path: str, branch: str | None = None
) -> dict[str, str]:
    """{name: SQL expression} for the corpus's CHECK constraints."""
    from v6spark import txlog

    _v, doc = txlog.read_latest(spark, _log_dir(path, branch))
    return dict((doc or {}).get("constraints") or {})


def clone_published(
    spark,
    src: str,
    dest: str,
    version: int | None = None,
    tag: str | None = None,
    as_of=None,
    mode: str = "link",
    commit_mode: str = "rename",
) -> dict:
    """CLONE the published corpus at a snapshot into a NEW,
    INDEPENDENT table — Delta's ``CREATE TABLE ... CLONE``: the
    destination gets its own commit log (starting at v1) over a
    faithful reproduction of the snapshot's exact files, and the two
    tables then diverge freely (DML on either never touches the
    other; tags/branches/retention are per-table).

    ``mode="link"`` (default) reproduces every referenced file as a
    HARD LINK at the same root-relative path — ZERO data bytes move,
    the clone costs one metadata op per file, and (unlike a
    manifest-reference shallow clone) the SOURCE's vacuum can never
    break the clone: a deleted original just drops one name on the
    shared inode.  Sharing inodes is SOUND here because the table
    format is strictly copy-on-write — no verb ever mutates a
    committed data file in place (rewrites land in fresh version
    dirs; deletes are manifests or DV sidecars), so a linked byte
    can never change under either table.  ``mode="copy"`` copies
    bytes (cross-filesystem roots, or when physical isolation is
    wanted).  Because the rel
    paths are preserved verbatim, the cloned manifest is the
    snapshot's manifest copied as-is — readers, point lookups,
    deletion vectors, Bloom sidecars, sketches, offloaded manifest
    sections, CHECK constraints, and the retention policy all work
    on the clone with zero special-casing.

    Local-filesystem roots only (hard links are a same-filesystem
    operation; object-store clones belong to the store's server-side
    copy — route through ``mode="copy"`` semantics there once
    needed).  The destination must not already hold a committed
    table.  Scale shape: O(referenced files) driver-side metadata
    ops (~µs each on a local FS), zero data reads.

    Returns {"dest_version": 1, "cloned_from", "files_linked"}.
    """
    import os as _os
    import shutil as _shutil

    from v6spark import txlog

    if mode not in ("link", "copy"):
        raise ValueError(f"mode must be 'link' or 'copy', got {mode!r}")
    src_root = _local_root(src)
    dest_root = _local_root(dest)
    if src_root is None or dest_root is None:
        raise ValueError(
            "clone_published is a local-filesystem operation (hard "
            "links / file copies); clone object-store tables with "
            "the store's server-side copy, then attach a fresh log"
        )
    target = _resolve_version(spark, src, version, tag, as_of=as_of)
    log = _log_dir(src)
    if target is None:
        target, tdoc = txlog.read_latest(spark, log)
    else:
        target, tdoc = int(target), txlog.read_version(
            spark, log, int(target)
        )
    if tdoc is None:
        raise ValueError(
            f"{src} has no committed publish at that reference"
        )
    dest_log = _log_dir(dest)
    if txlog.read_latest(spark, dest_log)[1] is not None:
        raise ValueError(
            f"{dest} already holds a committed table — clone targets "
            "a fresh root (drop or choose another path)"
        )
    # the missing-files check below MATERIALIZES an offloaded
    # manifest in place (removing manifest_ref): snapshot the
    # pristine doc first so the dest commit keeps the pointer — the
    # sidecar dir is linked like any other rel, and the clone stays
    # O(1)-manifest at any file count
    import copy as _copy

    pristine = _copy.deepcopy(tdoc)
    missing = _missing_published_files(spark, src, tdoc)
    if missing:
        raise ValueError(
            f"cannot clone {src}@v{target}: {len(missing)} referenced "
            f"file(s) are gone (first: {missing[0]}) — pick a "
            "retained snapshot"
        )

    # every root-relative path the manifest references: data files,
    # DV sidecars, Bloom tables, sketch dirs, offloaded manifest dir
    rels: set[str] = {
        rel
        for fl in _published_split_files(spark, src, tdoc).values()
        for rel in fl
    }
    rels.update((tdoc.get("dv") or {}).get("data", []) or [])
    tree_rels: set[str] = set()
    for t in (pristine.get("key_bloom") or {}).get("tables") or []:
        tree_rels.add(t["path"])
    for spec in (pristine.get("sketches") or {}).values():
        tree_rels.add(spec["dir"])
    ref = pristine.get("manifest_ref")
    if ref and ref.get("dir"):
        tree_rels.add(str(ref["dir"]))

    def _reproduce(rel: str) -> int:
        s = _os.path.join(src_root, rel)
        d = _os.path.join(dest_root, rel)
        if _os.path.isdir(s):
            n = 0
            for base, _dirs, files in _os.walk(s):
                for f in files:
                    sub = _os.path.relpath(
                        _os.path.join(base, f), src_root
                    )
                    n += _reproduce(sub)
            return n
        if _os.path.exists(d):
            # idempotent resume after a crash mid-clone (dest log is
            # still empty, so rerunning is the recovery path): an
            # already-reproduced file is done — anything else at the
            # path is a loud error, never a silent overwrite
            if _os.path.samefile(s, d) or (
                mode == "copy"
                and _os.path.getsize(d) == _os.path.getsize(s)
            ):
                return 1
            raise FileExistsError(
                f"clone destination already holds a DIFFERENT file "
                f"at {d} — clear the partial clone and rerun"
            )
        _os.makedirs(_os.path.dirname(d), exist_ok=True)
        if mode == "link":
            try:
                _os.link(s, d)
                return 1
            except OSError as exc:
                import errno as _errno

                if exc.errno not in (_errno.EXDEV, _errno.EPERM,
                                     _errno.EOPNOTSUPP, _errno.EMLINK):
                    raise  # only capability errors fall back to copy
        _shutil.copy2(s, d)
        return 1

    n_linked = 0
    for rel in sorted(rels | tree_rels):
        n_linked += _reproduce(rel)

    payload = {
        k: v
        for k, v in pristine.items()
        if k not in ("txn_ids", "intent") and k not in _OP_MARKERS
    }
    payload["txn_ids"] = []
    payload["cloned_from"] = {
        "path": src, "version": target, "mode": mode,
    }
    txlog.publish(spark, dest_log, 1, payload, commit_mode=commit_mode)
    return {
        "dest_version": 1,
        "cloned_from": {"path": src, "version": target},
        "files_linked": n_linked,
    }


def set_published_retention(
    spark,
    path: str,
    keep_last: int | None = None,
    keep_hours: float | None = None,
    commit_mode: str = "rename",
    max_retries: int = 8,
) -> dict:
    """Attach the RETENTION POLICY to the table itself (the Delta
    ``delta.deletedFileRetentionDuration`` table-property shape):
    a metadata-only commit recording ``{"keep_last": n,
    "keep_hours": h}`` that every vacuum and
    :func:`maintain_published` uses when the caller does not pass
    explicit retention — so the policy travels with the table, not
    with whichever cron job happens to sweep it.  Explicit arguments
    always win over the recorded policy; an absent policy keeps
    today's defaults (``keep_last=1``).  Pass both None to CLEAR the
    policy.  Returns {"_version", "retention"}.
    """
    if keep_last is not None and int(keep_last) < 1:
        raise ValueError("keep_last must be >= 1")
    if keep_hours is not None and float(keep_hours) < 0:
        raise ValueError("keep_hours must be >= 0")
    policy = {}
    if keep_last is not None:
        policy["keep_last"] = int(keep_last)
    if keep_hours is not None:
        policy["keep_hours"] = float(keep_hours)
    log = _log_dir(path, None)

    def _attempt(cur_version, cur_doc, vdir, data_root):
        if cur_doc is None:
            raise ValueError(f"{path} has no committed publish")
        payload = {
            k: v
            for k, v in cur_doc.items()
            if k not in ("intent", "retention") and k not in _OP_MARKERS
        }
        if policy:
            payload["retention"] = policy
        payload["retention_change"] = dict(policy) or {"cleared": True}
        payload["txn_ids"] = _txn_forward(cur_doc, None)
        return payload, {"retention": dict(policy)}

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
                    log_dir=log)


def _resolve_retention(
    spark, path: str, keep_last, keep_since,
) -> tuple[int, float | None]:
    """(keep_last, keep_since) with the table's recorded policy
    filling whatever the caller left as None — explicit always wins."""
    if keep_last is not None and keep_since is not None:
        return keep_last, keep_since
    from v6spark import txlog

    _v, doc = txlog.read_latest(spark, _log_dir(path, None))
    policy = (doc or {}).get("retention") or {}
    if keep_last is None:
        keep_last = int(policy.get("keep_last", 1))
    if keep_since is None and policy.get("keep_hours") is not None:
        import time as _time

        keep_since = _time.time() - float(policy["keep_hours"]) * 3600.0
    return keep_last, keep_since


def _classify_operation(doc: dict) -> tuple[str, dict]:
    """``(operation, details)`` for one commit manifest — precedence
    over the recorded markers (copy-doc verbs strip ancestors'
    markers, so at most one family is present; ``noop_txn`` wins
    because the no-op paths copy the previous doc verbatim)."""
    order = (
        ("noop_txn", "NOOP TXN"),
        ("restore_of", "RESTORE"),
        ("merged_into", "MERGE"),
        ("merged_from", "MERGE BRANCH"),
        ("fast_forwarded_from", "FAST-FORWARD"),
        ("constraint_change", "ALTER CONSTRAINT"),
        ("retention_change", "SET RETENTION"),
        ("cloned_from", "CLONE"),
        ("appended", "APPEND"),
        ("upsert", "UPSERT"),
        ("retraction", "DELETE"),
        ("compacted_from", "OPTIMIZE"),
        ("optimized", "OPTIMIZE"),
        ("resharded_from", "RESHARD"),
        ("promoted_from_stage", "PROMOTE"),
        ("schema_evolution", "ADD COLUMNS"),
        ("branched_from", "BRANCH CUT"),
    )
    for key, op in order:
        if key in doc:
            d = doc[key]
            return op, d if isinstance(d, dict) else {key: d}
    return "PUBLISH", {
        "splits": dict(doc.get("splits") or {}),
        "schema_changed": bool(doc.get("schema_changed")),
    }


def describe_published(
    spark, path: str, branch: str | None = None,
    version: int | None = None, tag: str | None = None, as_of=None,
) -> dict:
    """One-shot table summary — Delta's ``DESCRIBE DETAIL`` from the
    manifest alone (zero data reads): head version and commit time,
    schema, splits with logical row counts, shard posture, file
    count, live version dirs, deletion-vector debt, index/property
    presence (Bloom, sketches, clustered_by, constraints, retention),
    and whether the manifest runs offloaded.  Time-travel references
    describe a historical snapshot.  SQL twin:
    ``option("meta", "detail")`` on ``format("pubcorpus")``.
    """
    from v6spark import txlog
    from v6spark.sources.pubcorpus import _manifest_times

    log = _log_dir(path, branch)
    v = _resolve_version(spark, path, version, tag, branch, as_of)
    if v is None:
        v, doc = txlog.read_latest(spark, log)
    else:
        v, doc = int(v), txlog.read_version(spark, log, int(v))
    if doc is None:
        raise ValueError(
            f"{path} has no committed publish at that reference"
        )
    manifest_ref = doc.get("manifest_ref") or {}
    files = _doc_files(spark, path, doc)
    if files is None:
        n_files = sum(
            len(fl)
            for fl in _published_split_files(spark, path, doc).values()
        )
    else:
        n_files = sum(len(fl) for fl in files.values())
    times = dict(_manifest_times(log))
    return _describe_fields(v, doc, times.get(v), n_files,
                            manifest_ref)


def _describe_fields(v: int, doc: dict, committed_at, n_files: int,
                     manifest_ref: dict) -> dict:
    """Shared field assembly for :func:`describe_published` and the
    SQL ``option("meta", "detail")`` twin (parity by construction).
    ``manifest_ref`` is captured by the caller BEFORE any accessor
    materializes (and removes) it."""
    dvf = (doc.get("dv") or {}).get("files") or {}
    live = doc.get("live")
    live = [live] if isinstance(live, str) else list(live or [])
    return {
        "version": v,
        "committed_at": committed_at,
        "fmt": doc.get("fmt"),
        "schema": [list(c) for c in (doc.get("schema") or [])],
        "splits": dict(doc.get("splits") or {}),
        "rows_total": sum((doc.get("splits") or {}).values()),
        "n_shards": doc.get("n_shards"),
        "seed": doc.get("seed"),
        "key_col": doc.get("key_col"),
        "n_files": n_files,
        "live_version_dirs": len(live),
        "dv_files": sum(len(d) for d in dvf.values()),
        "dv_deleted_rows": sum(
            (len(pos) if isinstance(pos, (list, tuple)) else int(pos))
            for d in dvf.values()
            for pos in d.values()
        ),
        "key_bloom": bool(doc.get("key_bloom")),
        "sketches": sorted((doc.get("sketches") or {}).keys()),
        "clustered_by": doc.get("clustered_by"),
        "constraints": dict(doc.get("constraints") or {}),
        "retention": dict(doc.get("retention") or {}),
        "manifest_offloaded_entries": manifest_ref.get("entries") or 0,
    }


def _commit_txn(doc: dict, prev: dict | None, v: int) -> str | None:
    """THIS commit's replay token for the history surface — the id
    its ``txn_ids`` added over the previous version's.  When the
    previous manifest is gone (vacuumed, or a burned version number)
    the diff is unknowable for v > 1: report None rather than
    misattribute the oldest surviving id of the rolling window; the
    same rule reports None when several ids appear at once."""
    txns = doc.get("txn_ids") or []
    if v > 1 and prev is None:
        return None
    prev_txns = set((prev or {}).get("txn_ids") or [])
    new = [t for t in txns if t not in prev_txns]
    return str(new[0]) if len(new) == 1 else None


def published_history(
    spark, path: str, branch: str | None = None,
    limit: int | None = None,
):
    """Commit history of the published corpus as a DataFrame — the
    Delta ``DESCRIBE HISTORY`` surface, reconstructed from the
    manifests alone (no data reads; driver work is manifest-sized):

    ``version`` (bigint), ``timestamp`` (double epoch seconds —
    manifest mtimes, monotonically adjusted exactly like the readers'
    ``asOf`` resolution, so ``as_of=row.timestamp`` time-travels to
    ``row.version``), ``operation`` (PUBLISH / APPEND / UPSERT /
    DELETE / MERGE / OPTIMIZE / RESHARD / RESTORE / PROMOTE /
    ADD COLUMNS / ALTER CONSTRAINT / MERGE BRANCH / FAST-FORWARD /
    NOOP TXN), ``details`` (the verb's recorded metrics as a JSON
    string: rows touched, files rewritten/kept, predicates, source
    versions), ``schema_changed``, ``txn_id`` (the commit's replay
    token, if one was attached).

    Newest first; ``limit`` caps the rows.  Vacuumed (retired)
    versions are absent — history is exactly what time travel can
    still serve.  ``branch`` lists a branch's chain.
    """
    import json as _json

    from v6spark import txlog
    from v6spark.sources.pubcorpus import _manifest_times

    log = _log_dir(path, branch)
    times = dict(_manifest_times(log))
    rows = []
    docs: dict[int, dict | None] = {}

    def _doc_at(v: int):
        if v not in docs:
            docs[v] = (
                txlog.read_version(spark, log, v) if v >= 1 else None
            )
        return docs[v]

    versions = sorted(txlog.list_versions(spark, log), reverse=True)
    for v in versions:
        if limit is not None and len(rows) >= limit:
            break
        doc = _doc_at(v)
        if doc is None:
            continue  # torn / pending-intent: never was a commit
        op, details = _classify_operation(doc)
        rows.append((
            v,
            float(times.get(v, 0.0)),
            op,
            _json.dumps(details, default=str, sort_keys=True),
            bool(doc.get("schema_changed")),
            _commit_txn(doc, _doc_at(v - 1), v),
        ))
    return spark.createDataFrame(
        rows,
        "version long, timestamp double, operation string, "
        "details string, schema_changed boolean, txn_id string",
    )


def merge_into_published(
    spark,
    path: str,
    source: DataFrame,
    key_col: str = "doc_id",
    when_matched_update=None,
    when_matched_delete=None,
    when_not_matched_insert=None,
    matched_condition: str | None = None,
    not_matched_condition: str | None = None,
    commit_mode: str = "rename",
    txn_id: str | None = None,
    max_retries: int = 4,
) -> dict:
    """Conditional MERGE of a source frame into the published corpus
    as ONE committed version — Delta's ``MERGE INTO`` with
    WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED
    INSERT clauses, completing the DML verb set (plain
    :func:`upsert_into_published` is the unconditional
    update-or-insert special case).

    Clauses (at least one; DELETE takes precedence over UPDATE on a
    matched row, so an unconditional ``when_matched_delete=True``
    next to an update clause is refused as unreachable):

    - ``when_matched_update``: ``"*"`` (replace the row with the
      source row) or ``{col: sql_expr}`` — a PARTIAL update: listed
      columns take the expression, unlisted columns keep the
      published value.  ``matched_condition`` gates it.
    - ``when_matched_delete``: ``True`` or a SQL condition.
    - ``when_not_matched_insert``: ``"*"`` (insert the source row —
      the source must then carry a ``split`` column) or
      ``{col: sql_expr}`` covering every published column plus
      ``split``.  ``not_matched_condition`` gates it.

    Conditions and expressions are SQL over two row aliases:
    ``s.<col>`` (the source row) and ``t.<col>`` (the current
    published row; NULL-row for not-matched).  A NULL-evaluating
    condition selects nothing (SQL WHERE semantics).

    Scale shape: the source is the SMALL side by contract (same as
    the upsert delta).  Matched rows come from
    :func:`read_published_keys` — shard-directory + manifest-stats
    pruned point lookups, cost tracks ``len(source)``, never corpus
    size, and ALL clauses classify in ONE collected select over that
    join.  The apply reuses the branch-merge protocol: a nonce-named
    temp branch is cut from the pinned main head, deletes + updates +
    inserts land there INVISIBLY as ONE combined transaction
    (``upsert_into_published(delete_keys=...)`` — one hits scan, one
    write job), and the temp head is adopted as main's next version
    with an OCC commit that refuses if main moved — the whole merge
    then re-classifies against the fresh state and retries
    (serializable).  Readers see pre-merge or the complete merge,
    never a half-apply; a crash leaves main untouched and the temp
    branch as sweepable ``mergetmp-*`` debris
    (:func:`cleanup_merge_debris`).  CHECK constraints are enforced
    by the underlying upsert.  ``txn_id`` gives exactly-once replay.

    Returns {"_version", "rows_updated", "rows_inserted",
    "rows_deleted"}.
    """
    import uuid as _uuid

    from v6spark import txlog

    if not any((when_matched_update, when_matched_delete,
                when_not_matched_insert)):
        raise ValueError(
            "merge needs at least one clause: when_matched_update, "
            "when_matched_delete, or when_not_matched_insert"
        )
    if when_matched_delete is True and when_matched_update:
        raise ValueError(
            "when_matched_delete=True deletes EVERY matched row — the "
            "update clause is unreachable; give the delete a condition"
        )
    if matched_condition and not when_matched_update:
        raise ValueError(
            "matched_condition gates when_matched_update — pass both"
        )
    if not_matched_condition and not when_not_matched_insert:
        raise ValueError(
            "not_matched_condition gates when_not_matched_insert — "
            "pass both"
        )
    if key_col not in source.columns:
        raise ValueError(
            f"source must carry the key column {key_col!r}"
        )
    key_rows = source.select(key_col).collect()
    skeys = [r[key_col] for r in key_rows]
    if len(skeys) != len(set(skeys)):
        raise ValueError(
            "source carries duplicate keys — a merge must be keyed "
            "uniquely (collapse the source first)"
        )
    if not skeys:
        from v6spark import txlog as _txlog

        return {
            "_version": _txlog.read_latest(
                spark, f"{path}/{_COMMITS}"
            )[0],
            "rows_updated": 0,
            "rows_inserted": 0,
            "rows_deleted": 0,
            "noop": True,
        }

    def _value_struct(cols, mapping, fallback, split_expr):
        """Struct of the merged row (+ its ``split``): mapping exprs
        win, then ``fallback(col)`` for the rest ('*' = every column
        from the source alias)."""
        out = []
        for c in cols:
            if mapping == "*":
                out.append(F.expr(f"s.{c}").alias(c))
            elif c in mapping:
                out.append(F.expr(mapping[c]).alias(c))
            else:
                out.append(fallback(c).alias(c))
        out.append(split_expr.alias("split"))
        return F.struct(*out)

    last_race = None
    for _ in range(max_retries):
        main_v, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
        if doc is None:
            raise ValueError(
                f"{path} has no committed publish to merge into"
            )
        if txn_id is not None and txn_id in (doc.get("txn_ids") or []):
            return {
                "_version": main_v,
                "rows_updated": 0,
                "rows_inserted": 0,
                "rows_deleted": 0,
                "replayed": True,
            }
        content_cols = [n for n, _t in (doc.get("schema") or [])]
        tgt = read_published_keys(
            spark, path, skeys, version=main_v
        )
        joined = source.alias("s").join(
            tgt.alias("t"),
            F.expr(f"s.{key_col} = t.{key_col}"),
            "left",
        )
        matched = F.expr(f"t.{key_col} IS NOT NULL")

        # the WHOLE classification is ONE Spark job: every clause's
        # flag and the merged row values evaluate in a single select
        # over the (source x matched-rows) join, collected once — the
        # result is source-sized by contract.  The r9 shape paid a
        # separate job per clause (delete-key collect, update count,
        # insert count), each re-running the point-lookup join.
        del_cond = F.lit(False)
        if when_matched_delete is not None:
            # coalesce(NULL, false): a NULL-evaluating delete
            # condition must not delete (SQL WHERE semantics) AND
            # must not poison the update clause's ~del_cond below —
            # matched & ~NULL is NULL, which would silently drop the
            # row from BOTH clauses
            del_cond = matched & F.coalesce(
                F.lit(True) if when_matched_delete is True
                else F.expr(str(when_matched_delete)),
                F.lit(False),
            )
        sel = [
            F.expr(f"s.{key_col}").alias("_key"),
            del_cond.alias("_del"),
            F.lit(False).alias("_upd"),
            F.lit(False).alias("_ins"),
        ]
        if when_matched_update is not None:
            sel[2] = (
                matched & ~del_cond
                & (F.expr(matched_condition)
                   if matched_condition else F.lit(True))
            ).alias("_upd")
            sel.append(_value_struct(
                content_cols, when_matched_update,
                lambda c: F.expr(f"t.{c}"), F.expr("t.split"),
            ).alias("_u"))
        if when_not_matched_insert is not None:
            if when_not_matched_insert == "*":
                if "split" not in source.columns:
                    raise ValueError(
                        "when_not_matched_insert='*' needs a 'split' "
                        "column on the source (inserts need a "
                        "destination split)"
                    )
                ins_map: dict | str = "*"
                split_expr = F.expr("s.split")
            else:
                ins_map = dict(when_not_matched_insert)
                if "split" not in ins_map:
                    raise ValueError(
                        "when_not_matched_insert must map 'split' — "
                        "inserts need a destination split"
                    )
                split_expr = F.expr(ins_map.pop("split"))
                missing = [c for c in content_cols if c not in ins_map]
                if missing:
                    raise ValueError(
                        f"when_not_matched_insert must map every "
                        f"published column; missing {missing}"
                    )
            sel[3] = (
                ~matched
                & (F.expr(not_matched_condition)
                   if not_matched_condition else F.lit(True))
            ).alias("_ins")
            sel.append(_value_struct(
                content_cols, ins_map,
                lambda c: F.lit(None), split_expr,
            ).alias("_i"))
        cls_df = joined.select(*sel).filter("_del OR _upd OR _ins")
        cls_rows = cls_df.collect()
        delete_keys = sorted(
            (r["_key"] for r in cls_rows if r["_del"]), key=str
        )
        upd_structs = [r["_u"] for r in cls_rows if r["_upd"]]
        ins_structs = [r["_i"] for r in cls_rows if r["_ins"]]
        rows_updated = len(upd_structs)
        rows_inserted = len(ins_structs)

        if not delete_keys and not upd_structs and not ins_structs:
            return {
                "_version": main_v,
                "rows_updated": 0,
                "rows_inserted": 0,
                "rows_deleted": 0,
                "noop": True,
            }

        # the delta is LOCAL rows (source-sized): building it as
        # createDataFrame severs the lineage back through the
        # point-lookup join, so the apply's own actions don't re-run
        # the classification scan
        parts = []
        if upd_structs:
            parts.append(_local_df(
                spark, upd_structs, cls_df.schema["_u"].dataType
            ))
        if ins_structs:
            parts.append(_local_df(
                spark, ins_structs, cls_df.schema["_i"].dataType
            ))
        if parts:
            delta = parts[0]
            for p in parts[1:]:
                delta = delta.unionByName(p)
        else:
            # delete-only merge: the combined apply still wants a
            # schema-true (empty) delta for its column validation
            doc_schema = doc.get("schema") or []
            if not doc_schema:
                raise ValueError(
                    "published manifest records no column schema — "
                    "cannot build the empty delta for a delete-only "
                    "MERGE (republish with a schema-bearing writer "
                    "or pass explicit updates)"
                )
            ddl = ", ".join(
                f"`{n}` {t}" for n, t in doc_schema
            ) + ", `split` string"
            delta = spark.createDataFrame([], ddl)

        tmp = f"mergetmp-{_uuid.uuid4().hex[:8]}"
        try:
            cut_v = create_published_branch(spark, path, tmp)
            if cut_v != main_v:
                raise _MergeRace(f"main moved to v{cut_v}")
            # ONE combined transaction on the branch: deletes,
            # updates, and inserts land as a single commit (one hits
            # scan, one write job) instead of chunked retracts plus a
            # separate upsert
            upsert_into_published(
                spark, path, delta, key_col=key_col,
                branch=tmp, commit_mode=commit_mode,
                delete_keys=delete_keys,
            )
            tmp_head_v, tmp_head = txlog.read_latest(
                spark, _log_dir(path, tmp)
            )

            def _attempt(version, _doc, vdir, data_root,
                         _tmp_head=tmp_head, _cut=cut_v):
                if version != _cut:
                    raise IOError(
                        f"main advanced to v{version} during the "
                        "merge apply"
                    )
                payload = {
                    k: v for k, v in _tmp_head.items()
                    if k not in ("v", "branched_from")
                    and k not in _OP_MARKERS
                }
                payload["txn_ids"] = _txn_forward(_tmp_head, txn_id)
                payload["merged_into"] = {
                    "applied_on": _cut,
                    "deletes": len(delete_keys),
                    "updates": rows_updated,
                    "inserts": rows_inserted,
                }
                return payload, {}

            try:
                out = _occ_dml(
                    spark, path, _attempt, commit_mode, max_retries=2,
                )
            except IOError as exc:
                raise _MergeRace(str(exc)) from exc
            drop_published_branch(spark, path, tmp)
            return {
                **out,
                "rows_updated": rows_updated,
                "rows_inserted": rows_inserted,
                "rows_deleted": len(delete_keys),
            }
        except _MergeRace as race:
            last_race = race
            drop_published_branch(spark, path, tmp)
            continue
        except Exception:
            # refusal inside the branch apply (CHECK constraint, bad
            # expression): the branch DML was invisible — drop the
            # debris, main is untouched
            drop_published_branch(spark, path, tmp)
            raise
    raise IOError(
        f"merge into {path} lost {max_retries} consecutive races "
        f"against concurrent writers — coordinate or retry "
        f"({last_race})"
    )


def create_published_branch(spark, path: str, name: str) -> int:
    """Branch the published corpus: a WRITABLE alternate manifest
    chain over the SAME data pool (the Iceberg branch / Delta "WAP on
    DML" idea).  The branch log starts with a verbatim copy of main's
    current manifest, so the branch reads byte-identically to main at
    creation; ``retract_from_published`` / ``upsert_into_published`` /
    ``evolve_published_schema`` / ``compact_published`` then take
    ``branch=name`` and commit to the branch chain, INVISIBLE to main
    readers — audit a whole batch of takedowns/corrections with the
    committed readers (``branch=`` on all of them), then
    :func:`fast_forward_published` adopts the branch head as main's
    next version (a manifest copy — zero bytes move, because branch
    writes landed under ``path`` all along), or
    :func:`drop_published_branch` discards the chain.

    Scale shape: branching a 100 TB corpus writes ONE manifest (the
    seed is a pointer copy — directory references, stats, Bloom
    tables, even an offloaded ``manifest_ref`` stay valid verbatim
    since branch and main share the address space).  Both vacuums
    treat every branch manifest as retained, so branch-referenced
    files survive main-side retention while the branch lives.

    Returns the base version the branch was cut at."""
    from v6spark import txlog

    log = _log_dir(path, name)  # validates the name
    version, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    if doc is None:
        raise ValueError(f"{path} has no committed publish to branch")
    fs, jdir, _jvm = txlog._jfs(spark, log)
    if fs.exists(jdir):
        raise ValueError(f"branch {name!r} already exists under {path}")
    # the seed copy describes the CUT, not main's last DML: strip
    # main's operation markers (published_history classifies on them)
    seed = {
        k: v for k, v in doc.items()
        if k != "v" and k not in _OP_MARKERS
    }
    seed["branched_from"] = version
    txlog.publish(spark, log, version, seed)
    return version


def list_published_branches(spark, path: str) -> dict[str, int]:
    """{branch: head version} for the corpus's live branches."""
    from v6spark import txlog

    fs, jdir, _jvm = txlog._jfs(spark, f"{path}/{_BRANCHES}")
    if not fs.exists(jdir):
        return {}
    out = {}
    for st in fs.listStatus(jdir):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        v, doc = txlog.read_latest(spark, _log_dir(path, name))
        if doc is not None:
            out[name] = v
    return out


def drop_published_branch(spark, path: str, name: str) -> bool:
    """Discard a branch: delete its manifest chain.  ALWAYS safe —
    branch data files live under ``path`` like main's, so anything
    main adopted via fast-forward stays referenced by main's own
    manifests, and anything main never adopted becomes an
    unreferenced orphan the next vacuum sweeps."""
    from v6spark import txlog

    fs, jdir, _jvm = txlog._jfs(spark, _log_dir(path, name))
    if not fs.exists(jdir):
        return False
    fs.delete(jdir, True)
    return True


def fast_forward_published(
    spark, path: str, name: str, commit_mode: str = "rename",
    max_retries: int = 8, drop_branch: bool = True,
) -> dict:
    """PUBLISH step of branch-audited DML: adopt the branch head as
    main's next committed version.  A TRUE fast-forward — refused
    unless main still sits at the version the branch was cut from, so
    the adopted manifest's file list is exactly what the audit read
    (no silent merge semantics; on refusal, re-cut the branch from
    current main and replay).  O(manifest): the branch's data files
    were written under ``path`` from the start.  Returns
    {"_version", "branch_head", "base_version"}."""
    from v6spark import txlog

    blog = _log_dir(path, name)
    head_v, head = txlog.read_latest(spark, blog)
    if head is None:
        raise ValueError(f"no branch {name!r} under {path}")
    versions = txlog.list_versions(spark, blog)
    seed = txlog.read_version(spark, blog, versions[0])
    base = (seed or {}).get("branched_from", versions[0])
    if head_v == versions[0]:
        raise ValueError(
            f"branch {name!r} has no commits beyond its base — nothing "
            "to fast-forward"
        )

    def _attempt(version, doc, vdir, data_root):
        if version != base:
            raise ValueError(
                f"main advanced to v{version} since branch {name!r} was "
                f"cut at v{base} — fast-forward refused; re-branch from "
                "current main and replay the DML"
            )
        payload = {k: v for k, v in head.items() if k != "v"}
        payload.pop("branched_from", None)
        payload["fast_forwarded_from"] = {
            "branch": name, "branch_version": head_v, "base_version": base,
        }
        return payload, {"branch_head": head_v, "base_version": base}

    out = _occ_dml(spark, path, _attempt, commit_mode, max_retries)
    if drop_branch:
        drop_published_branch(spark, path, name)
    return out


def cleanup_merge_debris(
    spark, path: str, grace_seconds: float = 86400.0
) -> list[str]:
    """Drop ``mergetmp-*`` branches older than ``grace_seconds`` —
    the temp chains a CRASHED :func:`merge_published_branch` leaves
    behind.  They are pure debris (never adopted; main never saw
    them) but every live branch pins vacuum retention, so a leaked
    one quietly blocks file reclamation forever.  The grace window
    (default one day) spares merges still in flight; age is the
    branch log's newest-manifest mtime.  Returns the dropped names.
    Run it wherever :func:`vacuum_published` runs."""
    import time

    from v6spark import txlog

    dropped = []
    for name in list_published_branches(spark, path):
        if not name.startswith("mergetmp-"):
            continue
        fs, jdir, _jvm = txlog._jfs(spark, _log_dir(path, name))
        if not fs.exists(jdir):
            continue
        newest = max(
            (st.getModificationTime() for st in fs.listStatus(jdir)),
            default=0,
        )
        if newest and time.time() * 1000 - newest > grace_seconds * 1000:
            if drop_published_branch(spark, path, name):
                dropped.append(name)
    return sorted(dropped)


class _MergeRace(Exception):
    """Internal: main advanced under a merge attempt — retry."""


def merge_published_branch(
    spark, path: str, name: str, on_conflict: str = "fail",
    commit_mode: str = "rename", max_retries: int = 4,
    drop_branch: bool = True, _fail_mid_apply: bool = False,
    _fail_before_adopt: bool = False,
) -> dict:
    """TRUE MERGE of a branch into main — the case
    :func:`fast_forward_published` refuses: main advanced since the
    branch was cut, and the branch's audited DML must replay onto
    CURRENT main with ONE commit point (WAP end to end).

    Protocol (every step reuses audited machinery):

    1. the branch's NET row changes since its base come from
       :func:`published_corpus_changes` over the branch log — scan
       cost is the branch's DML delta, never the corpus;
    2. conflict check: keys changed on BOTH sides since the base.
       ``on_conflict``: ``"fail"`` (default — raise with a sample),
       ``"branch"`` (branch wins), ``"main"`` (conflicting branch
       changes are skipped);
    3. a nonce-named TEMP branch is cut from current main and the
       branch changes apply to it through the normal verbs (chunked
       SQL-escaped retract of deletes + split-move keys, one upsert
       of inserts/post-images — the replication apply shape), all
       INVISIBLE to main;
    4. the temp head is adopted as main's next version via the OCC
       commit, refused if main moved again (the whole merge retries
       against the fresh state).  THE one commit point: pinned or
       concurrent main readers see either the pre-merge version or
       the complete merge, never a half-apply.

    A crash anywhere before step 4's manifest leaves main untouched;
    the temp branch is droppable debris (it pins vacuum retention
    until dropped — :func:`list_published_branches` shows it as
    ``mergetmp-*``; :func:`cleanup_merge_debris` sweeps stale ones
    wherever the vacuum runs).  Requires the base manifest retained
    on BOTH
    logs and the branch schema equal to CURRENT main's (evolve main
    first, then re-cut or merge).

    Driver-held state is the two sides' changed-key sets and the
    delete key lists — DML-delta-bounded, the same contract as
    :mod:`v6spark.streaming.replication`.

    Returns ``{"_version", "conflicts", "merged_deletes",
    "merged_upserts", "base_version", "branch_head"}``.
    """
    import uuid as _uuid

    from v6spark import txlog
    from v6spark.streaming.replication import (
        DELETE_CHUNK,
        _escaped_literals_mode,
        _sql_key_literal,
    )

    if on_conflict not in ("fail", "branch", "main"):
        raise ValueError(
            f"on_conflict must be fail/branch/main, got {on_conflict!r}"
        )
    blog = _log_dir(path, name)
    head_v, head = txlog.read_latest(spark, blog)
    if head is None:
        raise ValueError(f"no branch {name!r} under {path}")
    versions = txlog.list_versions(spark, blog)
    seed_doc = txlog.read_version(spark, blog, versions[0])
    base = (seed_doc or {}).get("branched_from", versions[0])
    key_col = head.get("key_col") or "doc_id"

    main_v, main_doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    if main_doc is None:
        raise ValueError(f"{path} has no committed publish to merge into")
    if main_v == base:
        # nothing advanced: the merge IS a fast-forward
        out = fast_forward_published(
            spark, path, name, commit_mode=commit_mode,
            drop_branch=drop_branch,
        )
        return {**out, "conflicts": 0, "merged_deletes": 0,
                "merged_upserts": 0}
    if (main_doc.get("schema") or []) != (head.get("schema") or []):
        raise ValueError(
            f"branch {name!r} schema diverged from current main — "
            "evolve main to match (evolve_published_schema), then merge"
        )
    try:
        bch = published_corpus_changes(
            spark, path, base, head_v, key_col=key_col, branch=name
        )
    except ValueError as exc:
        raise ValueError(
            f"merge needs the branch base manifest (v{base}) retained "
            f"on the branch log — {exc}"
        ) from exc
    if bch is None:
        if drop_branch:
            drop_published_branch(spark, path, name)
        return {"_version": main_v, "conflicts": 0, "merged_deletes": 0,
                "merged_upserts": 0, "base_version": base,
                "branch_head": head_v}
    bch = bch.persist()
    try:
        ct = F.col("_change_type")
        deleted = [
            r[key_col]
            for r in bch.filter(ct == "delete").select(key_col).collect()
        ]
        pre = bch.filter(ct == "update_preimage").select(
            key_col, F.col("split").alias("__old_split")
        )
        post = bch.filter(ct == "update_postimage").select(
            key_col, "split"
        )
        moved = [
            r[key_col]
            for r in post.join(pre, key_col)
            .filter(F.col("split") != F.col("__old_split"))
            .select(key_col).collect()
        ]
        upsert_keys = {
            r[key_col]
            for r in bch.filter(
                ct.isin("insert", "update_postimage")
            ).select(key_col).distinct().collect()
        }
        bkeys = set(deleted) | upsert_keys
        last_race = None
        for _ in range(max_retries):
            main_v, main_doc = txlog.read_latest(
                spark, f"{path}/{_COMMITS}"
            )
            try:
                mch = published_corpus_changes(
                    spark, path, base, main_v, key_col=key_col
                )
            except ValueError as exc:
                raise ValueError(
                    f"merge needs the base manifest (v{base}) retained "
                    f"on MAIN to detect conflicts — {exc}"
                ) from exc
            mkeys = (
                set() if mch is None
                else {
                    r[key_col]
                    for r in mch.select(key_col).distinct().collect()
                }
            )
            conflicts = bkeys & mkeys
            if conflicts and on_conflict == "fail":
                sample = sorted(conflicts, key=str)[:10]
                raise ValueError(
                    f"merge conflict: {len(conflicts)} key(s) changed "
                    f"on both main and branch {name!r} since v{base} "
                    f"(sample: {sample}) — pass on_conflict='branch' "
                    "(branch wins) or 'main' (skip them)"
                )
            skip = conflicts if on_conflict == "main" else set()
            tmp = f"mergetmp-{_uuid.uuid4().hex[:8]}"
            try:
                cut_v = create_published_branch(spark, path, tmp)
                if cut_v != main_v:
                    raise _MergeRace(f"main moved to v{cut_v}")
                to_retract = sorted(
                    (set(deleted) | set(moved)) - skip, key=str
                )
                esc = _escaped_literals_mode(spark)
                for i in range(0, len(to_retract), DELETE_CHUNK):
                    vals = ", ".join(
                        _sql_key_literal(k, esc)
                        for k in to_retract[i:i + DELETE_CHUNK]
                    )
                    retract_from_published(
                        spark, path, f"{key_col} IN ({vals})",
                        branch=tmp, commit_mode=commit_mode,
                    )
                if _fail_mid_apply:
                    raise RuntimeError(
                        "injected crash mid-apply (between merge phases)"
                    )
                delta = bch.filter(
                    ct.isin("insert", "update_postimage")
                ).drop("_change_type", "_commit_version")
                if skip:
                    skipdf = spark.createDataFrame(
                        [(k,) for k in sorted(skip, key=str)], [key_col]
                    )
                    delta = delta.join(
                        F.broadcast(skipdf), key_col, "left_anti"
                    )
                if delta.limit(1).count():
                    upsert_into_published(
                        spark, path, delta, key_col=key_col,
                        branch=tmp, commit_mode=commit_mode,
                    )
                if _fail_before_adopt:
                    raise RuntimeError(
                        "injected crash before merge adoption"
                    )
                tmp_head_v, tmp_head = txlog.read_latest(
                    spark, _log_dir(path, tmp)
                )

                def _attempt(version, doc, vdir, data_root,
                             _tmp_head=tmp_head, _cut=cut_v):
                    if version != _cut:
                        raise IOError(
                            f"main advanced to v{version} during the "
                            "merge apply"
                        )
                    payload = {
                        k: v for k, v in _tmp_head.items() if k != "v"
                    }
                    payload.pop("branched_from", None)
                    payload["merged_from"] = {
                        "branch": name, "branch_head": head_v,
                        "base_version": base, "applied_on": _cut,
                    }
                    return payload, {}

                try:
                    out = _occ_dml(
                        spark, path, _attempt, commit_mode,
                        max_retries=2,
                    )
                except IOError as exc:
                    raise _MergeRace(str(exc)) from exc
                drop_published_branch(spark, path, tmp)
                if drop_branch:
                    drop_published_branch(spark, path, name)
                return {
                    **out,
                    "conflicts": len(conflicts),
                    "merged_deletes": len(to_retract),
                    "merged_upserts": len(upsert_keys - skip),
                    "base_version": base,
                    "branch_head": head_v,
                }
            except _MergeRace as race:
                last_race = race
                drop_published_branch(spark, path, tmp)
                continue
        raise IOError(
            f"merge of branch {name!r} lost {max_retries} consecutive "
            f"races against concurrent main writers — coordinate or "
            f"retry ({last_race})"
        )
    finally:
        bch.unpersist()


_BRANCHES = "_branches"


def _log_dir(path: str, branch: str | None = None) -> str:
    """Commit-log directory for the main table or a named branch.

    A branch is an ALTERNATE MANIFEST CHAIN over the SAME data pool
    (the Iceberg ref model): its log lives under
    ``<path>/_branches/<name>`` while every data file, stats sidecar,
    and Bloom table it writes or references sits under ``<path>``
    exactly like main's — one address space, so no path rebasing
    anywhere, ``__file`` row addresses stay valid across branches,
    and fast-forward is a manifest copy."""
    if branch is None:
        return f"{path}/{_COMMITS}"
    if "/" in branch or branch.startswith((".", "_")):
        raise ValueError(f"invalid branch name {branch!r}")
    return f"{path}/{_BRANCHES}/{branch}"


def _resolve_version(spark, path: str, version, tag, branch=None,
                     as_of=None):
    """One rule for every reader taking (version=, tag= [, as_of=])."""
    if as_of is not None:
        if version is not None or tag is not None:
            raise ValueError(
                "pass ONE time-travel reference: version=, tag=, or "
                "as_of="
            )
        from v6spark.sources.pubcorpus import (
            _log_dir as _pa_log_dir,
            _parse_as_of,
            _resolve_as_of,
        )

        return _resolve_as_of(
            _pa_log_dir(path, branch), _parse_as_of(as_of)
        )
    if tag is None:
        return version
    if branch is not None:
        raise ValueError(
            "tags name MAIN versions; pass version= to pin a branch read"
        )
    if version is not None:
        raise ValueError("pass version= or tag=, not both")
    from v6spark import txlog

    v = txlog.resolve_tag(spark, f"{path}/{_COMMITS}", tag)
    if v is None:
        raise ValueError(f"{path} has no tag {tag!r}")
    return v


def _local_root(path: str) -> str | None:
    """Local-filesystem root for ``path`` or None (remote store)."""
    if path.startswith("/"):
        return path
    if path.startswith("file:"):
        return path[len("file:"):]
    return None


def _list_data_files(spark, dir_path: str) -> list[str]:
    """Recursive data-file listing (skips _/. names).  Local paths go
    through os.walk — the Hadoop listFiles iterator costs ~10 ms/file
    in py4j round-trips, which dominated ACID publish overhead at
    small scale; remote stores use the FileSystem API as before."""
    local = _local_root(dir_path)
    if local is not None:
        import os as _os

        out = []
        for base, _dirs, files in _os.walk(local):
            for name in files:
                if not name.startswith(("_", ".")):
                    out.append(_os.path.join(base, name))
        return out
    from v6spark import txlog

    fs, jdir, _jvm = txlog._jfs(spark, dir_path)
    out = []
    if fs.exists(jdir):
        it = fs.listFiles(jdir, True)
        while it.hasNext():
            fst = it.next()
            name = fst.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append(fst.getPath().toString())
    return out


def _published_split_files(spark, path: str, doc: dict) -> dict[str, list[str]]:
    """Relative data-file paths per split for a committed parquet
    publish — directory-level (recursive listing of the version dir,
    shard subdirectories included) or file-level (a retraction
    manifest's explicit ``files`` list)."""
    from v6spark import txlog

    files = _doc_files(spark, path, doc)
    if files is not None:
        return {s: list(fl) for s, fl in files.items()}
    out: dict[str, list[str]] = {}
    for s in sorted(doc["splits"]):
        split_dir = f"{path}/{doc['live']}/split={s}"
        out[s] = sorted(
            _rel_path(p, path) for p in _list_data_files(spark, split_dir)
        )
    return out


# ---------------------------------------------------------------------------
# Manifest offload — O(1) commit documents at any corpus file count.
#
# The commit JSON is parsed by EVERY committed read (read_latest /
# read_version), so sections that grow with the corpus's file count
# (the DML ``files`` lists, ``col_stats``, ``file_stats``) must not
# live inline past a point: at ~1M data files they are hundreds of MB
# of JSON, decoded per read.  Above ``_MANIFEST_INLINE_MAX`` total
# entries the committing verb moves them into a parquet sidecar under
# its own version directory (``<vdir>/_manifest``) and the doc keeps a
# ``manifest_ref`` pointer — the Iceberg manifest-file / Delta
# checkpoint-sidecar idea.  Readers that need per-file detail
# (pruning, census, DML candidate selection, vacuum) materialize the
# sections back with ONE columnar read via the ``_doc_*`` accessors;
# plain data reads of directory-level publishes never touch it.
# Below the threshold nothing changes — small tables stay zero-extra-
# read, and every existing manifest remains readable (inline fields
# always win; ``manifest_ref`` is only consulted when they are absent).
# ---------------------------------------------------------------------------

_MANIFEST_INLINE_MAX = 4096
_MANIFEST_DIR = "_manifest"
_MANIFEST_SECTIONS = ("files", "col_stats", "file_stats")


def _manifest_entry_count(payload: dict) -> int:
    """Total per-file entries across the offloadable sections."""
    n = sum(
        len(d)
        for field in _MANIFEST_SECTIONS
        for d in (payload.get(field) or {}).values()
    )
    dv = payload.get("dv") or {}
    n += len(dv.get("data") or [])
    n += sum(len(m) for m in (dv.get("files") or {}).values())
    return n


def _sidecar_table(rows: list[tuple]):
    """The sidecar's arrow table (section, split, file, seq, doc) —
    ONE construction shared by the local and pyarrow-fs write paths
    so a schema tweak cannot silently diverge between them."""
    import pyarrow as _pa

    cols = list(zip(*rows)) if rows else [[], [], [], [], []]
    return _pa.table({
        "section": _pa.array(cols[0], _pa.string()),
        "split": _pa.array(cols[1], _pa.string()),
        "file": _pa.array(cols[2], _pa.string()),
        "seq": _pa.array(cols[3], _pa.int64()),
        "doc": _pa.array(cols[4], _pa.string()),
    })


def _write_manifest_sidecar(spark, dest: str, rows: list[tuple]) -> None:
    """Write sidecar rows (section, split, file, seq, doc) as parquet.
    Local stores go through pyarrow on the driver (the rows are
    already driver-side dicts — a Spark job would round-trip them for
    nothing); JVM-free callers (the pubcorpus SQL writer on an object
    store) through pyarrow's filesystem layer; remote stores with a
    session through a 1-partition Spark write."""
    local = _local_root(dest)
    if local is not None:
        import os as _os

        import pyarrow.parquet as _pq

        _os.makedirs(local, exist_ok=True)
        _pq.write_table(
            _sidecar_table(rows), _os.path.join(local, "stats-0.parquet")
        )
        return
    if spark is None:
        import pyarrow.parquet as _pq

        from v6spark.sources.publog import _fs_for

        fs, local_dest = _fs_for(dest)
        fs.create_dir(local_dest, recursive=True)
        _pq.write_table(
            _sidecar_table(rows),
            f"{local_dest.rstrip('/')}/stats-0.parquet",
            filesystem=fs,
        )
        return
    spark.createDataFrame(
        rows,
        "section string, split string, file string, seq long, doc string",
    ).coalesce(1).write.mode("overwrite").parquet(dest)


def _read_manifest_sidecar(spark, dest: str) -> tuple[list, ...]:
    """Five parallel column lists (section, split, file, seq, doc) —
    columnar all the way down; callers zip lazily instead of paying a
    per-row tuple allocation at 100k+ files."""
    local = _local_root(dest)
    if local is not None:
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        tabs = [
            _pq.read_table(_os.path.join(local, name))
            for name in sorted(_os.listdir(local))
            if name.endswith(".parquet") and not name.startswith(("_", "."))
        ]
        if not tabs:
            return [], [], [], [], []
        t = _pa.concat_tables(tabs)
        return tuple(
            t.column(c).to_pylist()
            for c in ("section", "split", "file", "seq", "doc")
        )
    if spark is None:
        # JVM-free caller (the pubcorpus DataSource plans in a plain
        # Python worker): read the sidecar through pyarrow's own
        # filesystem layer instead of Hadoop's
        import pyarrow.parquet as _pq

        from v6spark.sources.publog import _fs_for

        fs, local_dest = _fs_for(dest)
        t = _pq.ParquetDataset(local_dest, filesystem=fs).read()
        return tuple(
            t.column(c).to_pylist()
            for c in ("section", "split", "file", "seq", "doc")
        )
    rows = spark.read.parquet(dest).collect()
    return tuple(
        [r[c] for r in rows]
        for c in ("section", "split", "file", "seq", "doc")
    )


def _offload_manifest(spark, path: str, vdir: str, payload: dict) -> dict:
    """Manifest-size governor applied to every corpus DML commit (see
    the block comment above).  Returns the payload to commit: inline
    and unchanged under the threshold, slimmed to a ``manifest_ref``
    above it.  A payload copied from a prior doc may carry that doc's
    ref (cross-version pointer, e.g. schema evolution): kept verbatim
    when the sections are not inline — both vacuums retain referenced
    sidecar directories — and replaced when they are (a rematerialized
    no-op replay re-offloads under its own vdir)."""
    import json as _json

    present = [f for f in _MANIFEST_SECTIONS if f in payload]
    if not present:
        return payload
    n = _manifest_entry_count(payload)
    if n <= _MANIFEST_INLINE_MAX:
        if "manifest_ref" in payload:
            # inline sections supersede a copied ref only when they
            # cover everything the ref holds; a partial overlap cannot
            # occur (materialization is all-sections + ref removal)
            ref_sections = set(
                (payload["manifest_ref"] or {}).get("sections") or ()
            )
            inline = set(present) | (
                {"dv"} if "dv" in payload else set()
            )
            if ref_sections <= inline:
                payload = {
                    k: v for k, v in payload.items() if k != "manifest_ref"
                }
        return payload
    rows: list[tuple] = []
    for s, fl in (payload.get("files") or {}).items():
        if not fl:
            # empty-split marker: the split must survive the round
            # trip (a retract can drain a split without dropping it)
            rows.append(("files", s, None, -1, None))
        rows.extend(("files", s, rel, i, None) for i, rel in enumerate(fl))
    for field in ("col_stats", "file_stats"):
        for s, d in (payload.get(field) or {}).items():
            rows.extend(
                (field, s, rel, 0, _json.dumps(st)) for rel, st in d.items()
            )
    # the deletion-vector map also scales with touched files (a long
    # merge-on-read chain).  dv implies a file-level manifest, and
    # every dv reader runs after _published_split_files has
    # materialized the doc — so it rides the same sidecar with no
    # reader changes.  Offloaded only alongside "files" (invariant the
    # readers rely on); a dv without a files list stays inline.
    dv = payload.get("dv")
    offload_dv = bool(dv) and "files" in payload
    if offload_dv:
        rows.extend(
            ("dv_data", None, rel, i, None)
            for i, rel in enumerate(dv.get("data") or [])
        )
        rows.extend(
            ("dv_files", s, rel, 0, _json.dumps(cnt))
            for s, m in (dv.get("files") or {}).items()
            for rel, cnt in m.items()
        )
        present = present + ["dv"]
    rel_dir = f"{vdir}/{_MANIFEST_DIR}"
    _write_manifest_sidecar(spark, f"{path}/{rel_dir}", rows)
    out = {
        k: v
        for k, v in payload.items()
        if k not in _MANIFEST_SECTIONS and k != "manifest_ref"
        and not (k == "dv" and offload_dv)
    }
    out["manifest_ref"] = {"dir": rel_dir, "sections": present, "entries": n}
    return out


def _materialize_manifest(spark, path: str, doc: dict) -> dict:
    """Load an offloaded manifest's per-file sections back into the
    doc IN PLACE (one sidecar read) and remove ``manifest_ref`` —
    after this the doc is indistinguishable from an inline manifest.
    No-op without a ref."""
    ref = doc.get("manifest_ref")
    if not ref:
        return doc
    import json as _json

    try:
        secs, spls, rels, seqs, docs = _read_manifest_sidecar(
            spark, f"{path}/{ref['dir']}"
        )
    except Exception as exc:
        raise IOError(
            f"manifest sidecar {ref['dir']!r} under {path} is unreadable "
            "— was it vacuumed out from under a retained manifest?"
        ) from exc
    forder: dict[str, list] = {}
    loaded: dict[str, dict] = {
        "col_stats": {}, "file_stats": {}, "dv_files": {},
    }
    files: dict[str, list] = {}
    dv_data: list[tuple] = []
    stat_keys: list[tuple] = []
    stat_docs: list[str] = []
    for i, section in enumerate(secs):
        if section == "files":
            rel = rels[i]
            if rel is None:
                files.setdefault(spls[i], [])
            else:
                forder.setdefault(spls[i], []).append((seqs[i], rel))
        elif section == "dv_data":
            dv_data.append((seqs[i], rels[i]))
        else:
            stat_keys.append((section, spls[i], rels[i]))
            stat_docs.append(docs[i])
    # ONE C-level parse for all stat entries instead of a Python-loop
    # json.loads per file — ~3x faster at 100k+ files
    if stat_docs:
        for (section, s, rel), st in zip(
            stat_keys, _json.loads("[" + ",".join(stat_docs) + "]")
        ):
            loaded[section].setdefault(s, {})[rel] = st
    for s, pairs in forder.items():
        pairs.sort()
        files.setdefault(s, []).extend(rel for _seq, rel in pairs)
    sections = ref.get("sections") or ()
    if "files" in sections:
        doc["files"] = files
    for field in ("col_stats", "file_stats"):
        if field in sections:
            doc[field] = loaded[field]
    if "dv" in sections:
        dv_data.sort()
        doc["dv"] = {
            "data": [rel for _seq, rel in dv_data],
            "files": loaded["dv_files"],
        }
    del doc["manifest_ref"]
    return doc


def _doc_has_files(doc: dict) -> bool:
    """Whether this manifest is FILE-LEVEL (explicit file list, inline
    or offloaded) as opposed to directory-level."""
    return "files" in doc or "files" in (
        (doc.get("manifest_ref") or {}).get("sections") or ()
    )


def _doc_files(spark, path: str, doc: dict) -> dict | None:
    """The manifest's explicit file list, materializing an offloaded
    one; None for directory-level manifests (list the live dirs)."""
    if "files" in doc:
        return doc["files"]
    if _doc_has_files(doc):
        _materialize_manifest(spark, path, doc)
        return doc.get("files")
    return None


def _doc_col_stats(spark, path: str, doc: dict | None) -> dict:
    if not doc:
        return {}
    if "col_stats" not in doc and "manifest_ref" in doc:
        _materialize_manifest(spark, path, doc)
    return doc.get("col_stats") or {}


def _doc_file_stats(spark, path: str, doc: dict | None) -> dict:
    if not doc:
        return {}
    if "file_stats" not in doc and "manifest_ref" in doc:
        _materialize_manifest(spark, path, doc)
    return doc.get("file_stats") or {}


def _read_split_files(
    spark, path: str, split: str, files: list[str],
    schema: list | None = None, with_pos: bool = False,
):
    """One DataFrame over a split's file list, with the ``shard``
    partition column RECOVERED: files are grouped by the version dir
    they live in and each group reads under its own basePath (the
    split dir), so directory-derived partition values survive
    file-level reads — chained retractions span version dirs, hence
    the grouping.

    ``schema`` (the manifest's ``[[name, type], ...]`` list) aligns
    every group to the CURRENT published schema: files written before
    an additive :func:`evolve_published_schema` lack the added
    columns, which read as typed NULLs — the Iceberg/Delta
    read-with-unified-schema contract, with zero data rewritten.

    ``with_pos`` appends ``__file`` (publish-root-relative data file)
    and ``__pos`` (row ordinal within that file, from the parquet
    reader's ``_metadata.row_index``) — the stable row address that
    deletion vectors (:func:`retract_from_published`
    ``strategy="dv"``) and the merge-on-read path key on.  Unlike
    ``input_file_name()``, these survive joins with other file
    sources (they are materialized per-scan), so DML hits scans over
    DV-carrying publishes group on ``__file``."""
    by_vdir: dict[str, list[str]] = {}
    for rel in files:
        # the "version dir" is everything before /split= — one path
        # component for in-root versions (v=000002-ab12cd34), several
        # for promoted staging dirs (_staging/<name>/v=...)
        idx = rel.find("/split=")
        key = rel[:idx] if idx >= 0 else rel.split("/", 1)[0]
        by_vdir.setdefault(key, []).append(rel)
    dfs = []
    for vdir, group in sorted(by_vdir.items()):
        base = f"{path}/{vdir}/split={split}"
        df = spark.read.option("basePath", base).parquet(
            *[f"{path}/{rel}" for rel in sorted(group)]
        )
        if with_pos:
            fp = F.col("_metadata.file_path")
            df = df.withColumn(
                "__file", F.substring_index(fp, path + "/", -1)
            ).withColumn("__pos", F.col("_metadata.row_index"))
        if schema is not None:
            for name, typ in schema:
                if name not in df.columns:
                    df = df.withColumn(name, F.lit(None).cast(typ))
            order = [n for n, _t in schema] + [
                c for c in df.columns if c not in {n for n, _t in schema}
            ]
            df = df.select(*order)
        dfs.append(df)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _read_dv(spark, path: str, doc: dict):
    """The committed deletion-vector frame ``(split, file, pos)`` of a
    manifest — read from the EXPLICIT file list the manifest records
    (``dv.data``), never a directory listing, so a torn DV write from
    a crashed retraction is invisible.  None when the manifest carries
    no deletion vectors."""
    dv = doc.get("dv")
    if not dv or not dv.get("data"):
        return None
    return spark.read.parquet(*[f"{path}/{rel}" for rel in dv["data"]])


def _local_df(spark, rows, schema):
    """Driver rows → DataFrame via the Arrow LOCAL path, one
    partition.  The default ``createDataFrame(list)`` parallelizes
    into ``defaultParallelism`` pickled Python partitions whose
    workers re-launch on EVERY downstream job (measured 0.39 s/job
    for a 40-row frame — and 4.7 s/job after a ``coalesce(1)``, which
    makes ONE task pay all 32 worker round-trips sequentially); the
    pandas/Arrow conversion lands as a pure-JVM local table
    (0.03 s/job) and ``coalesce(1)`` on it is free.  Falls back to
    the pickle path when Arrow refuses the types — slower, never
    wrong.  For the DRIVER-SIZED frames the DML verbs build (key
    probes, merge deltas); not for data-sized input."""
    try:
        import pandas as pd

        cols = [f.name for f in schema.fields]
        pdf = pd.DataFrame(
            [tuple(r) for r in rows], columns=cols, dtype=object
        )
        return spark.createDataFrame(pdf, schema=schema).coalesce(1)
    except Exception:
        return spark.createDataFrame(rows, schema)


def _read_split_mor(
    spark, path: str, split: str, files: list[str], doc: dict,
    keep_pos: bool = False,
):
    """MERGE-ON-READ view of a split's file list under ``doc``: files
    with no deletion-vector entries read plainly (zero overhead — the
    common case stays a bare parquet scan); files the manifest marks
    in ``dv.files[split]`` read with row positions and drop their
    deleted rows via a BROADCAST anti-join against the (KB-scale) DV
    frame — the Delta deletion-vector / Iceberg positional-delete
    read path, costing one broadcast probe per row of the DIRTY files
    only, never a shuffle.  ``keep_pos`` retains ``__file``/``__pos``
    on the output (DML hits scans need them); None when ``files`` is
    empty."""
    if not files:
        return None
    schema = doc.get("schema")
    dv_marked = set((doc.get("dv") or {}).get("files", {}).get(split, {}))
    dirty = [rel for rel in files if rel in dv_marked]
    clean = [rel for rel in files if rel not in dv_marked]
    parts = []
    if clean:
        parts.append(
            _read_split_files(
                spark, path, split, clean, schema=schema, with_pos=keep_pos
            )
        )
    if dirty:
        d = _read_split_files(
            spark, path, split, dirty, schema=schema, with_pos=True
        )
        dv_s = (
            _read_dv(spark, path, doc)
            .filter(F.col("split") == split)
            .select(
                F.col("file").alias("__file"), F.col("pos").alias("__pos")
            )
        )
        d = d.join(F.broadcast(dv_s), ["__file", "__pos"], "left_anti")
        if not keep_pos:
            d = d.drop("__file", "__pos")
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dv_live_dirs(new_files: dict, dv: dict | None, extra=()) -> list[str]:
    """``live`` directory list for a file-level manifest: every
    version dir a referenced data file OR deletion-vector file lives
    in (the directory-level vacuum spares exactly these), plus
    ``extra`` (e.g. the new version dir when it hosts fresh bytes)."""

    def _dir_of(rel: str) -> str:
        idx = rel.find("/split=")
        if idx >= 0:
            return rel[:idx]
        idx = rel.find("/_dv/")
        if idx >= 0:
            return rel[:idx]
        return rel.split("/", 1)[0]

    dirs = {_dir_of(rel) for fl in new_files.values() for rel in fl}
    for rel in (dv or {}).get("data", []) or []:
        dirs.add(_dir_of(rel))
    dirs.update(extra)
    return sorted(dirs)


def _rel_path(uri: str, path: str) -> str:
    """input_file_name() URI -> path-relative file path."""
    idx = uri.find(path)
    if idx < 0:
        raise ValueError(f"file {uri} is outside the publish root {path}")
    return uri[idx + len(path) + 1 :]


def _collect_file_stats(
    spark, path: str, split: str, rels: list[str], key_col: str
) -> dict[str, list]:
    """``{rel_path: [min_key, max_key, n_rows]}`` for freshly written
    data files, recorded in the manifest at write time so later
    retract/upsert candidate selection is MANIFEST-ONLY (the
    Iceberg/Delta per-file stats pattern; no file reads at DML time).

    Sourced from the parquet FOOTERS the writers just produced — KB
    metadata reads, NO Spark job.  Local paths read via pyarrow
    (~1 ms/file; a py4j ParquetFileReader loop costs seconds in
    driver round-trips, and a key-column Spark scan added ~90% to the
    ACID publish wall — both measured and rejected).  Non-local
    stores fall back to one Spark key-column scan per split.  A file
    without usable key statistics is OMITTED — readers treat a
    missing entry as "must scan": extra work, never a wrong answer.
    String bounds compare correctly against Python keys because
    UTF-8 byte order preserves code-point order.

    JVM-free callers (``spark=None``, the pubcorpus SQL writer's
    commit hook) cannot take the Spark fallback: non-local roots
    resolve through pyarrow's own filesystem layer instead (footers
    are KB reads on object stores too), and an unresolvable scheme
    raises a clear error rather than crashing into the fallback.
    """
    import json as _json

    local_root = None
    pa_fs = None
    if path.startswith("/"):
        local_root = path
    elif path.startswith("file:"):
        local_root = path[len("file:"):]
    elif spark is None:
        from v6spark.sources.publog import _fs_for

        try:
            pa_fs, local_root = _fs_for(path)
        except Exception as exc:
            raise ValueError(
                f"cannot collect file stats for {path!r} without a "
                "JVM: the scheme is not pyarrow-resolvable — publish "
                "through the DML verbs instead"
            ) from exc
    if local_root is not None:
        import os as _os

        import pyarrow.parquet as _pq

        out: dict[str, list] = {}
        for rel in rels:
            fpath = (
                _os.path.join(local_root, rel) if pa_fs is None
                else f"{local_root.rstrip('/')}/{rel}"
            )
            try:
                md = _pq.ParquetFile(fpath, filesystem=pa_fs).metadata
                names = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                ci = names.get(key_col)
                if ci is None:
                    continue
                lo = hi = None
                ok = True
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if (
                        st is None
                        or not st.has_min_max
                        or (st.null_count or 0) != 0
                    ):
                        ok = False
                        break
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        mn, mx = mn.decode(), mx.decode()
                    if lo is None or mn < lo:
                        lo = mn
                    if hi is None or mx > hi:
                        hi = mx
                if not ok or lo is None:
                    continue
                stat = [lo, hi, md.num_rows]
                _json.dumps(stat)
                out[rel] = stat
            except Exception:
                continue
        return out

    # non-local store: one columnar key-column scan for the split
    df = _read_split_files(spark, path, split, rels)
    rows = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    out = {}
    for r in rows:
        stat = [r["lo"], r["hi"], r["n"]]
        try:
            _json.dumps(stat)
        except (TypeError, ValueError):
            return {}
        out[_rel_path(r["f"], path)] = stat
    return out


_STR_STAT_MAX = 64  # string bounds longer than this truncate (Iceberg-style)
_MAX_STAT_COLS = 32  # stats for the first N schema columns (Delta's
# dataSkippingNumIndexedCols default) — bounds manifest growth on very
# wide tables; columns past the cap are simply must-scan


def _trunc_lower(s: str) -> str:
    """Prefix-truncate a string MIN bound: a prefix is <= the original
    in code-point order (== Spark's UTF8String byte order), so it stays
    a valid lower bound."""
    return s if len(s) <= _STR_STAT_MAX else s[:_STR_STAT_MAX]


def _trunc_upper(s: str) -> str | None:
    """Truncate a string MAX bound to a value STRICTLY ABOVE every
    string sharing the kept prefix (the Iceberg/Delta increment-last-
    char trick), reusing the probe side's increment
    (:func:`v6spark.operators.pruning._next_prefix`) so the write and
    probe ordering rules can never drift.  None when nothing is
    incrementable (all chars at U+10FFFF) — caller skips the stat
    entirely: must-scan, never a wrong bound."""
    if len(s) <= _STR_STAT_MAX:
        return s
    from v6spark.operators.pruning import _next_prefix

    return _next_prefix(s[:_STR_STAT_MAX])


def _collect_col_stats(
    spark, path: str, split: str, rels: list[str]
) -> dict[str, dict[str, list]]:
    """``{rel_path: {column: [min, max]}}`` for freshly written data
    files — the per-COLUMN generalization of :func:`_collect_file_stats`
    (which records only the publish key), recorded in the manifest so
    :func:`read_published_where` can skip files from the manifest alone
    (Delta/Iceberg data skipping; zero footer reads at query time).

    Sourced from the parquet footers the writers just produced — KB
    metadata reads, no Spark job; non-local stores return ``{}``
    (readers treat a missing entry as must-scan — a full-column Spark
    scan at publish time would double the publish wall, the wrong
    trade).  Soundness rules, each degrading to "omit the stat":

    - nulls are fine (min/max over non-null values can never wrongly
      refute a comparison — NULL rows satisfy no comparison);
    - only JSON-safe scalar types (int/float/str/bool); date, time,
      decimal, and binary columns are skipped — their Python/SQL
      literal orderings don't reliably agree with the stored form;
    - NaN bounds are skipped (unordered);
    - long string bounds truncate via :func:`_trunc_lower` /
      :func:`_trunc_upper`, keeping them conservative, so a wide text
      column still prunes on its leading 64 chars.

    String order soundness: parquet footer min/max for UTF8 columns are
    byte-order bounds; UTF-8 byte order equals code-point order, which
    is both Python's ``str`` order (used by the pruning matcher) and
    Spark's ``UTF8String`` binary comparison order — all three agree,
    so string pruning is exact.
    """
    import json as _json

    pa_fs = None
    local_root = _local_root(path)
    if local_root is None:
        if spark is not None:
            return {}
        # JVM-free caller (the pubcorpus SQL writer): footer reads
        # through pyarrow's filesystem layer; an unresolvable scheme
        # degrades to {} — readers treat missing stats as must-scan
        from v6spark.sources.publog import _fs_for

        try:
            pa_fs, local_root = _fs_for(path)
        except Exception:
            return {}
    import os as _os

    import pyarrow.parquet as _pq

    out: dict[str, dict[str, list]] = {}
    for rel in rels:
        fpath = (
            _os.path.join(local_root, rel) if pa_fs is None
            else f"{local_root.rstrip('/')}/{rel}"
        )
        try:
            md = _pq.ParquetFile(fpath, filesystem=pa_fs).metadata
        except Exception:
            continue
        # per column: running [lo, hi], summed null count (None once
        # any row group reports it unknown), and whether any non-null
        # values were seen (an all-False column records the
        # entirely-NULL marker [None, None, nulls])
        acc: dict[str, dict] = {}
        bad: set[str] = set()
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                cmeta = rg.column(i)
                name = cmeta.path_in_schema
                if "." in name or name in bad:
                    continue  # nested leaf: not a top-level scalar
                if name not in acc and len(acc) >= _MAX_STAT_COLS:
                    continue  # indexed-column cap: must-scan past it
                ent = acc.setdefault(
                    name, {"lo": None, "hi": None, "nc": 0, "vals": False}
                )
                st = cmeta.statistics
                nc = st.null_count if st is not None else None
                if nc is None:
                    ent["nc"] = None
                elif ent["nc"] is not None:
                    ent["nc"] += nc
                if st is None or not st.has_min_max:
                    # an all-NULL row group has no min/max and is fine;
                    # anything else means unusable stats for this column
                    if st is None or nc is None or nc != rg.num_rows:
                        bad.add(name)
                        acc.pop(name, None)
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bool) != isinstance(mx, bool):
                    bad.add(name)
                    acc.pop(name, None)
                    continue
                if isinstance(mn, float) and (mn != mn or mx != mx):
                    bad.add(name)  # NaN bound: unordered
                    acc.pop(name, None)
                    continue
                if isinstance(mn, str):
                    mn, mx = _trunc_lower(mn), _trunc_upper(mx)
                    if mx is None:
                        bad.add(name)
                        acc.pop(name, None)
                        continue
                elif not isinstance(mn, (bool, int, float)) or not isinstance(
                    mx, (bool, int, float)
                ):
                    bad.add(name)  # bytes/date/decimal/...: skip
                    acc.pop(name, None)
                    continue
                try:
                    if not ent["vals"] or mn < ent["lo"]:
                        ent["lo"] = mn
                    if not ent["vals"] or mx > ent["hi"]:
                        ent["hi"] = mx
                except TypeError:
                    bad.add(name)
                    acc.pop(name, None)
                    continue
                ent["vals"] = True
        cols: dict[str, list] = {}
        for name, ent in acc.items():
            if ent["vals"]:
                stat = [ent["lo"], ent["hi"]]
                if ent["nc"] is not None:
                    stat.append(ent["nc"])
            elif ent["nc"] is not None and ent["nc"] > 0:
                stat = [None, None, ent["nc"]]  # entirely-NULL column
            else:
                continue
            cols[name] = stat
        if not cols:
            continue
        try:
            _json.dumps(cols)
        except (TypeError, ValueError):
            continue
        out[rel] = cols
    return out


def _carry_col_stats(
    spark, path: str, prior_doc: dict | None, new_files: dict[str, list[str]]
) -> dict:
    """Column stats for a DML result's file manifest: entries for files
    CARRIED from the prior version copy forward verbatim (a kept file's
    bytes didn't change; a DV'd file's recorded ranges are a superset
    of its live rows — over-wide bounds over-scan, never miss), and
    freshly written files get a footer walk.  Missing entries stay
    missing: must-scan, never a wrong skip."""
    prior = _doc_col_stats(spark, path, prior_doc)
    out: dict[str, dict] = {}
    for s, rels in new_files.items():
        have = prior.get(s) or {}
        carried = {rel: have[rel] for rel in rels if rel in have}
        fresh = [rel for rel in rels if rel not in have]
        if fresh:
            carried.update(_collect_col_stats(spark, path, s, sorted(fresh)))
        out[s] = carried
    return out


def _build_key_bloom_table(
    spark,
    path: str,
    vdir: str,
    fresh_files: dict[str, list[str]],
    key_col: str,
    m_bits: int,
) -> list[dict]:
    """Build + write ONE Bloom sidecar table covering every FRESH
    file of this commit (``{split: [rels]}``), under the committing
    version's own directory (``<vdir>/_bloom`` — wiped with the
    attempt on OCC retry, vacuumed with the version).  The per-split
    key frames union into a single ``mapInPandas`` job + one write —
    the build cost is one pass over the fresh files' key column, not
    a job per split.  Returns the manifest ``tables`` fragment
    ``[{"path": rel, "m_bits": M}]``.  See
    :mod:`v6spark.operators.keybloom` for the probe contract."""
    from v6spark.operators.keybloom import build_file_blooms

    parts = []
    for s, rels in sorted(fresh_files.items()):
        if rels:
            parts.append(
                _read_split_files(
                    spark, path, s, sorted(rels), with_pos=True
                ).select("__file", key_col)
            )
    if not parts:
        return []
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    blooms = build_file_blooms(df, key_col, m_bits)
    if not blooms:
        return []
    rel_dir = f"{vdir}/_bloom"
    # m_bits rides in the rows too, so grouped probe reads spanning
    # tables of different sizes stay a single job
    bdf = spark.createDataFrame(
        [(f, bytearray(b), m_bits) for f, b in sorted(blooms.items())],
        "file string, bloom binary, m_bits long",
    )
    bdf.coalesce(1).write.mode("error").parquet(f"{path}/{rel_dir}")
    return [{"path": rel_dir, "m_bits": m_bits}]


def _carry_key_bloom(
    prior_doc: dict | None, fresh_tables: list[dict]
) -> dict | None:
    """Key-bloom manifest fragment for a DML result: prior sidecar
    tables carry forward (kept files' filters stay valid; a DV'd
    file's filter is a SUPERSET — extra candidate reads, never a
    missed row; tables whose version dir later falls out of retention
    are skipped by the fault-tolerant probe), fresh tables append.
    None when the table has no bloom index."""
    prior = (prior_doc or {}).get("key_bloom")
    if prior is None and not fresh_tables:
        return None
    from v6spark.operators.keybloom import BITS_PER_KEY, K_HASHES

    return {
        "k": (prior or {}).get("k", K_HASHES),
        "bits_per_key": (prior or {}).get("bits_per_key", BITS_PER_KEY),
        "tables": list((prior or {}).get("tables") or []) + fresh_tables,
    }


def _bloom_m_bits(prior_doc: dict | None, rows: int, n_files: int) -> int:
    """Filter size for a commit's fresh table: reuse the index's
    existing size when one exists (sizing barely moves within one
    table's lifetime; full rebuilds pass ``prior_doc=None`` to
    re-derive), else size for the mean keys/file."""
    from v6spark.operators.keybloom import BITS_PER_KEY, m_bits_for

    prior = (prior_doc or {}).get("key_bloom") or {}
    for t in prior.get("tables") or []:
        return t["m_bits"]
    return m_bits_for(rows, n_files, prior.get("bits_per_key", BITS_PER_KEY))


def _txn_forward(doc: dict | None, txn_id: str | None) -> list:
    """Committed-DML transaction ids carried forward through every
    manifest (the Delta ``txnAppId/version`` idea at txlog size):
    ``retract_from_published`` / ``upsert_into_published`` called with
    a ``txn_id`` already in the list SKIP as an idempotent replay —
    the exactly-once contract a Structured Streaming ``foreachBatch``
    sink needs under epoch replay (see :func:`upsert_foreach_batch`).
    Ids survive republish/compact/evolve because the table identity
    does.  Bounded at the newest ``_TXN_KEEP`` — a replay older than
    that window re-applies, so keep the window above the streaming
    engine's replay horizon (a handful of batches; 10k is generous).
    """
    ids = list((doc or {}).get("txn_ids") or [])
    if txn_id is not None:
        ids.append(txn_id)
    return ids[-_TXN_KEEP:]


_TXN_KEEP = 10_000


def upsert_foreach_batch(
    path: str, key_col: str = "doc_id", commit_mode: str = "rename"
):
    """``foreachBatch`` sink maintaining a committed publish from a
    stream of CDC-style deltas: each micro-batch MERGEs via
    :func:`upsert_into_published` under ``txn_id=f"stream-{batch_id}"``
    — a crash-replayed epoch skips (the manifest's committed txn-id
    list IS the exactly-once guarantee, the same contract the
    streaming near-dedup and sketch-store sinks prove).  Batches must
    carry the published content columns plus ``split`` for inserts.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        upsert_into_published(
            batch_df.sparkSession, path, batch_df, key_col=key_col,
            commit_mode=commit_mode, txn_id=f"stream-{batch_id}",
        )

    return fn


def _occ_dml(spark, path: str, attempt_fn, commit_mode: str,
             max_retries: int = 8, log_dir: str | None = None,
             _intent: str | None = None) -> dict | None:
    """Optimistic-concurrency loop for the corpus DML verbs
    (publish / retract / upsert / compact) — the Delta/Iceberg commit
    protocol at manifest size, built on :func:`txlog.publish`'s
    version-collision detection (the kernel already proven by the
    IVF 4-writer race test).

    Each attempt: read the latest committed state, let
    ``attempt_fn(version, doc, vdir, data_root) -> (payload, result)``
    compute AND write its data files under the ATTEMPT-UNIQUE
    directory ``data_root`` (``v=<n+1>-<nonce>``), then try to commit
    the manifest at ``version + 1``.  Losing the race (another writer
    committed ``version + 1`` first) deletes this attempt's data
    directory and re-runs ``attempt_fn`` against the fresh state —
    full serializability: the loser's rewrite plan is recomputed over
    the winner's file list, never over the stale one.

    The unique data-directory nonce is what makes concurrent writers
    safe below the manifest layer: with deterministic ``v=<n+1>``
    names, two racers would write into (and orphan-clear!) the SAME
    directory, and the commit winner could reference files the loser
    deleted.  Readers resolve directories only through the manifest,
    so the name is opaque to them; a lost attempt's directory is an
    unreferenced orphan that :func:`vacuum_published` /
    :func:`vacuum_published_files` sweeps (``grace_seconds`` spares
    in-flight attempts, as documented on ``txlog.vacuum_versions``).

    ``attempt_fn`` returns ``(None, result)`` for a no-op (nothing to
    commit; ``result`` is returned as-is).  Put-mode caveat matches
    ``txlog.commit_with_retry``: concurrent put-mode commits need a
    store whose conditional put is truly atomic (S3 If-None-Match);
    the local-FS emulation serializes same-process threads only.
    """
    from v6spark import txlog
    import uuid

    log = log_dir or f"{path}/{_COMMITS}"
    last_err = None
    claim = 0
    for _ in range(max_retries):
        version, doc = txlog.read_latest(spark, log)
        # collision bump (see txlog.commit_with_retry): an INVISIBLE
        # pending/aborted commit_pair half occupies its version number
        # forever — claim past it instead of re-colliding to death
        new_version = max(claim, version + 1)
        vdir = f"v={new_version:06d}-{uuid.uuid4().hex[:8]}"
        data_root = f"{path}/{vdir}"
        payload, result = attempt_fn(version, doc, vdir, data_root)
        if payload is None:
            return result
        # manifest-size governor: per-file sections past the inline
        # threshold move to a parquet sidecar under this attempt's own
        # vdir (private until the commit below; orphan-swept with the
        # directory on a lost race), so the commit JSON stays O(1) in
        # corpus file count — see _offload_manifest
        payload = _offload_manifest(spark, path, vdir, payload)
        if _intent is not None:
            # one half of an atomic multi-table pair: invisible until
            # the coordinator's intent marker lands (txlog.commit_pair)
            payload = {**payload, "intent": _intent}
        try:
            txlog.publish(
                spark, log, new_version, payload,
                commit_mode=commit_mode,
            )
            return {**result, "_version": new_version}
        except IOError as exc:
            last_err = exc
            claim = new_version + 1
            fs, jroot, _jvm = txlog._jfs(spark, data_root)
            fs.delete(jroot, True)
            continue
    raise IOError(
        f"corpus DML lost {max_retries} consecutive commit races under "
        f"{path} — pathological contention, coordinate writers"
    ) from last_err


def retract_from_published(
    spark,
    path: str,
    predicate: str,
    commit_mode: str = "rename",
    _fail_after: str | None = None,
    max_retries: int = 8,
    txn_id: str | None = None,
    strategy: str = "rewrite",
    branch: str | None = None,
    _intent: str | None = None,
) -> dict:
    """Row-level DELETE from a committed parquet publish as a NEW
    committed version — the takedown/right-to-be-forgotten operation
    a 100 TB published corpus needs, where "republish everything
    minus the rows" is a full-corpus write and a full-corpus read.
    Two strategies, the Delta/Iceberg copy-on-write vs merge-on-read
    trade:

    ``strategy="rewrite"`` (copy-on-write, the default): rewrite ONLY
    the files that contain matching rows, minus those rows.  Read
    cost stays zero afterwards; write cost is the affected files'
    full size — right when deletes are rare or reads dominate.

    ``strategy="dv"`` (DELETION VECTORS, merge-on-read): rewrite
    NOTHING — record the matching rows' ``(file, position)``
    addresses in a KB-scale parquet sidecar named by the manifest
    (``dv``), leaving every data file byte-identical.  A takedown of
    3 documents from a corpus of multi-GB files writes kilobytes
    instead of re-encoding gigabytes.  Readers
    (:func:`read_published_corpus`, point lookups, DML scans) apply
    the vectors as a BROADCAST anti-join on the dirty files only
    (:func:`_read_split_mor`); clean files keep their bare-scan
    plan.  Chained DV retractions union positions; any later rewrite
    of a file (copy-on-write retract, upsert, compact, reshard)
    MATERIALIZES its vector and drops the entry.  Note the
    merge-on-read caveat: the deleted bytes remain on storage until
    a rewrite + :func:`vacuum_published_files` — a privacy-grade
    forget should follow DV retractions with :func:`compact_published`
    once enough accumulate (``compaction_advice`` counts them).

    ``predicate`` is a SQL boolean over the published columns
    selecting the rows to REMOVE; it is recorded in the manifest.

    Scale shape (both strategies start the same): ONE
    predicate-pushdown scan per split finds the affected rows
    (parquet row-group stats skip clean files, and only predicate
    columns are read).  With Z-ordered or key-sorted layout
    (sources/layout.py) the affected set is a handful of files.
    Rewrite then re-reads and rewrites only those files; DV writes
    just the position sidecar.  The new manifest lists surviving
    files EXPLICITLY; ``live`` lists every referenced version dir so
    the directory-level vacuum spares them, and
    :func:`vacuum_published_files` sweeps superseded originals
    file-granularly once retention passes.

    Committed readers resolve every manifest shape transparently.  A
    crash before the manifest commit leaves the current version
    untouched (``_fail_after="data"`` injects that window).
    MULTI-WRITER SAFE: the whole retraction runs under the
    :func:`_occ_dml` optimistic loop — a concurrent DML commit makes
    this writer recompute its plan against the winner's state and
    retry (serializable, like a Delta/Iceberg commit conflict).

    Returns {"_version", "rows_removed", "files_rewritten",
    "files_kept", "splits"} — rows_removed == 0 commits nothing and
    returns the current version.
    """
    from v6spark import txlog

    if strategy not in ("rewrite", "dv"):
        raise ValueError(
            f"strategy must be 'rewrite' (copy-on-write) or 'dv' "
            f"(deletion vectors), got {strategy!r}"
        )
    pred = F.expr(predicate)

    def _attempt(version, doc, vdir, data_root):
        if doc is None:
            raise ValueError(
                f"{path} has no committed publish to retract from"
            )
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "retract_from_published operates on parquet publishes; "
                f"this one is {doc.get('fmt')!r}"
            )
        if txn_id is not None and txn_id in (doc.get("txn_ids") or []):
            # exactly-once replay skip (see _txn_forward)
            return None, {
                "_version": version,
                "rows_removed": 0,
                "files_rewritten": 0,
                "files_kept": 0,
                "splits": dict(doc["splits"]),
                "replayed": True,
            }
        split_files = _published_split_files(spark, path, doc)
        fs, jroot, _jvm = txlog._jfs(spark, data_root)
        if fs.exists(jroot):
            fs.delete(jroot, True)  # impossible (nonce name) but cheap

        prior_dv = doc.get("dv") or {}

        if strategy == "dv":
            # one pushed-down MOR scan per split: already-deleted rows
            # are excluded (a predicate matching them must not re-count
            # or double-record positions); __file/__pos address the hits
            hit_frames = []
            n_files_total = 0
            for s, files in sorted(split_files.items()):
                n_files_total += len(files)
                mor = _read_split_mor(
                    spark, path, s, files, doc, keep_pos=True
                )
                if mor is None:
                    continue
                hit_frames.append(
                    mor.filter(pred).select(
                        F.lit(s).alias("split"),
                        F.col("__file").alias("file"),
                        F.col("__pos").alias("pos"),
                    )
                )
            rows_removed = 0
            counts = []
            new_hits = None
            if hit_frames:
                new_hits = hit_frames[0]
                for h in hit_frames[1:]:
                    new_hits = new_hits.unionByName(h)
                new_hits = new_hits.persist()
                counts = (
                    new_hits.groupBy("split", "file")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                )
                rows_removed = sum(r["n"] for r in counts)
            if rows_removed == 0:
                if new_hits is not None:
                    new_hits.unpersist()
                fs.delete(jroot, True)
                if txn_id is not None:
                    payload = {k: v for k, v in doc.items() if k != "v"}
                    payload["txn_ids"] = _txn_forward(doc, txn_id)
                    payload["noop_txn"] = txn_id
                    return payload, {
                        "rows_removed": 0,
                        "files_rewritten": 0,
                        "files_kept": n_files_total,
                        "splits": dict(doc["splits"]),
                    }
                return None, {
                    "_version": version,
                    "rows_removed": 0,
                    "files_rewritten": 0,
                    "files_kept": n_files_total,
                    "splits": dict(doc["splits"]),
                }
            # the new version's DV sidecar is the COMPLETE union (prior
            # vectors + new hits): one self-contained file set per
            # manifest, so readers never chain across versions and
            # vacuum can retire old sidecars with their manifests
            prior_frame = _read_dv(spark, path, doc)
            all_dv = (
                new_hits if prior_frame is None
                else prior_frame.unionByName(new_hits)
            )
            all_dv.write.mode("error").parquet(f"{data_root}/_dv")
            new_hits.unpersist()
            if _fail_after == "data":
                raise RuntimeError(
                    "injected crash after deletion-vector write"
                )
            dv_rels = sorted(
                _rel_path(p, path)
                for p in _list_data_files(spark, f"{data_root}/_dv")
            )
            merged: dict[str, dict] = {
                s: dict(m) for s, m in (prior_dv.get("files") or {}).items()
            }
            removed_by_split: dict[str, int] = {}
            for r in counts:
                merged.setdefault(r["split"], {})
                merged[r["split"]][r["file"]] = (
                    merged[r["split"]].get(r["file"], 0) + r["n"]
                )
                removed_by_split[r["split"]] = (
                    removed_by_split.get(r["split"], 0) + r["n"]
                )
            new_files = {s: sorted(fl) for s, fl in split_files.items()}
            new_counts = {
                s: doc["splits"].get(s, 0) - removed_by_split.get(s, 0)
                for s in doc["splits"]
            }
            dv_doc = {"data": dv_rels, "files": merged}
            payload = {
                "live": _dv_live_dirs(new_files, dv_doc),
                "primary": vdir,
                "files": new_files,
                "fmt": "parquet",
                "splits": new_counts,
                "schema": doc.get("schema"),
                "schema_changed": False,
                "n_shards": doc.get("n_shards"),
                "seed": doc.get("seed"),
                "key_col": doc.get("key_col"),
                "txn_ids": _txn_forward(doc, txn_id),
                "dv": dv_doc,
                "retraction": {
                    "predicate": predicate,
                    "rows_removed": rows_removed,
                    "files_rewritten": 0,
                    "files_kept": n_files_total,
                    "from_version": version,
                    "strategy": "dv",
                },
            }
            fstats = _doc_file_stats(spark, path, doc)
            if fstats:
                payload["file_stats"] = fstats
            cstats = _doc_col_stats(spark, path, doc)
            if cstats:
                # DV'd files keep their recorded ranges: a superset of
                # the live rows — over-wide bounds over-scan, never miss
                payload["col_stats"] = cstats
            if doc.get("key_bloom"):
                # same superset argument for the Bloom sidecars
                payload["key_bloom"] = doc["key_bloom"]
            if doc.get("clustered_by"):
                payload["clustered_by"] = doc["clustered_by"]
            _carry_constraints(doc, payload)
            return payload, {
                "rows_removed": rows_removed,
                "files_rewritten": 0,
                "files_kept": n_files_total,
                "splits": new_counts,
            }

        new_files: dict[str, list[str]] = {}
        new_counts: dict[str, int] = {}
        new_stats: dict[str, dict] = {}
        new_dv_files: dict[str, dict] = {}
        fresh_by_split: dict[str, list[str]] = {}
        old_stats = _doc_file_stats(spark, path, doc)
        rows_removed = 0
        files_rewritten = 0
        files_kept = 0
        for s, files in sorted(split_files.items()):
            if not files:
                new_files[s] = []
                new_counts[s] = doc["splits"].get(s, 0)
                new_stats[s] = {}
                continue
            df = _read_split_mor(spark, path, s, files, doc, keep_pos=True)
            # one pushed-down MOR scan: affected files + their match
            # counts.  __file (not input_file_name()) because the MOR
            # anti-join puts a second file source in the plan; rows
            # already deleted by a vector are excluded from the count.
            hits = (
                df.filter(pred)
                .groupBy(F.col("__file").alias("f"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            affected_rel = {r["f"] for r in hits}
            removed_s = sum(r["n"] for r in hits)
            rows_removed += removed_s
            kept = [rel for rel in files if rel not in affected_rel]
            files_kept += len(kept)
            split_stats = {
                rel: old_stats[s][rel]
                for rel in kept
                if s in old_stats and rel in old_stats[s]
            }
            # deletion vectors carry forward for KEPT files only — a
            # rewritten file materializes its vector (the MOR read
            # below already drops those rows) and sheds the entry
            kept_dv = {
                rel: n
                for rel, n in (prior_dv.get("files", {}).get(s, {})).items()
                if rel in set(kept)
            }
            if kept_dv:
                new_dv_files[s] = kept_dv
            out_rel: list[str] = []
            if affected_rel:
                files_rewritten += len(affected_rel)
                # basePath-grouped read keeps the shard partition column,
                # and partitionBy writes it back — the rewritten rows stay
                # in their shard for per-shard consumers
                # DELETE semantics: remove only rows where the predicate is
                # TRUE.  A bare ~pred would also drop NULL-pred rows (e.g.
                # `text LIKE '%x%'` over a nullable column) that the hits
                # scan above never counted — survivors must be the exact
                # complement of the counted hits (Delta keeps non-TRUE rows).
                rewritten = _read_split_mor(
                    spark, path, s, sorted(affected_rel), doc,
                ).filter(~F.coalesce(pred, F.lit(False)))
                out_dir = f"{data_root}/split={s}"
                writer = rewritten.write.mode("error")
                if "shard" in rewritten.columns:
                    writer = writer.partitionBy("shard")
                writer.parquet(out_dir)
                out_rel.extend(
                    _rel_path(p, path)
                    for p in _list_data_files(spark, out_dir)
                )
                if out_rel and doc.get("key_col"):
                    split_stats.update(
                        _collect_file_stats(
                            spark, path, s, sorted(out_rel),
                            doc["key_col"],
                        )
                    )
            new_files[s] = sorted(kept + out_rel)
            new_counts[s] = doc["splits"].get(s, 0) - removed_s
            new_stats[s] = split_stats
            if out_rel:
                fresh_by_split[s] = sorted(out_rel)

        if rows_removed == 0:
            fs.delete(jroot, True)
            if txn_id is not None:
                # a txn-id'd no-op must still RECORD its txn: if rows
                # matching the predicate arrive later, a crash-replay
                # of this txn would otherwise delete them — the txn
                # "happened", the log must say so.  Metadata-only
                # manifest: same files/splits, txn registered.
                payload = {
                    k: v for k, v in doc.items() if k != "v"
                }
                payload["txn_ids"] = _txn_forward(doc, txn_id)
                payload["noop_txn"] = txn_id
                return payload, {
                    "rows_removed": 0,
                    "files_rewritten": 0,
                    "files_kept": files_kept,
                    "splits": dict(doc["splits"]),
                }
            return None, {
                "_version": version,
                "rows_removed": 0,
                "files_rewritten": 0,
                "files_kept": files_kept,
                "splits": dict(doc["splits"]),
            }
        if _fail_after == "data":
            raise RuntimeError("injected crash after retraction data write")

        dv_doc = (
            {"data": prior_dv.get("data") or [], "files": new_dv_files}
            if new_dv_files
            else None
        )
        payload = {
            "live": _dv_live_dirs(new_files, dv_doc),
            "primary": vdir,
            "files": new_files,
            "fmt": "parquet",
            "splits": new_counts,
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": doc.get("n_shards"),
            "seed": doc.get("seed"),
            "key_col": doc.get("key_col"),
            "txn_ids": _txn_forward(doc, txn_id),
            "retraction": {
                "predicate": predicate,
                "rows_removed": rows_removed,
                "files_rewritten": files_rewritten,
                "files_kept": files_kept,
                "from_version": version,
            },
        }
        if dv_doc is not None:
            payload["dv"] = dv_doc
        if doc.get("key_col"):
            payload["file_stats"] = new_stats
        payload["col_stats"] = _carry_col_stats(spark, path, doc, new_files)
        if doc.get("clustered_by"):
            # the table remains NOMINALLY clustered (kept files keep
            # their curve layout); compaction_advice uses this to
            # recommend re-clustering once DML accumulates
            payload["clustered_by"] = doc["clustered_by"]
        _carry_constraints(doc, payload)
        if doc.get("key_bloom") and doc.get("key_col"):
            tables = _build_key_bloom_table(
                spark, path, vdir, fresh_by_split, doc["key_col"],
                _bloom_m_bits(
                    doc,
                    sum(new_counts.values()),
                    sum(len(fl) for fl in new_files.values()) or 1,
                ),
            )
            payload["key_bloom"] = _carry_key_bloom(doc, tables)
        return payload, {
            "rows_removed": rows_removed,
            "files_rewritten": files_rewritten,
            "files_kept": files_kept,
            "splits": new_counts,
        }

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
        log_dir=_log_dir(path, branch), _intent=_intent)


def atomic_published_pair(
    spark,
    ops: list,
    commit_mode: str = "rename",
    _fail_between: int | None = None,
    _fail_before_marker: bool = False,
    _between_hook=None,
) -> list[dict]:
    """ONE atomic commit spanning MULTIPLE published tables — the
    data+metrics-pair / mirror-window primitive (txlog
    ``commit_pair`` protocol: each table's manifest commits carrying a
    shared intent pointer and stays INVISIBLE until the single
    ``<intent>.committed`` marker lands; a crash anywhere before the
    marker leaves EVERY table at its pre-pair version, permanently).

    ``ops`` is ``[(path, spec), ...]`` over DISTINCT roots, where
    ``spec`` is a dict naming the verb and its arguments:

    - ``{"op": "publish", "prepared": df, "content": df, ...}``
      (extra keys pass through to :func:`publish_corpus_committed`);
    - ``{"op": "upsert", "updates": df, ...}``
      (:func:`upsert_into_published`);
    - ``{"op": "retract", "predicate": sql, ...}``
      (:func:`retract_from_published`).

    Returns each verb's result dict (with ``_version``).  Concurrency
    caveat: a writer landing on one of the tables between the
    overtake re-check and the marker write is a documented race
    window (txlog.commit_pair) — coordinate cross-table writers as
    you would for any multi-table transaction."""
    import uuid as _uuid

    from v6spark import txlog

    roots = [p for p, _s in ops]
    if len(ops) < 2 or len(set(roots)) != len(roots):
        raise ValueError(
            "atomic_published_pair spans MULTIPLE DISTINCT roots; "
            "same-table multi-verb atomicity is not expressible here"
        )
    intent = (
        f"{roots[0].rstrip('/')}/{_COMMITS}/"
        f"{txlog.INTENT_PREFIX}{_uuid.uuid4().hex}"
    )
    results = []
    committed = []
    for i, (path, spec) in enumerate(ops):
        kind = spec.get("op")
        kw = {k: v for k, v in spec.items() if k != "op"}
        kw.setdefault("commit_mode", commit_mode)
        if kind == "publish":
            res = publish_corpus_committed(
                kw.pop("prepared"), kw.pop("content"), path,
                _intent=intent, **kw,
            )
        elif kind == "upsert":
            res = upsert_into_published(
                spark, path, kw.pop("updates"), _intent=intent, **kw
            )
        elif kind == "retract":
            res = retract_from_published(
                spark, path, kw.pop("predicate"), _intent=intent, **kw
            )
        else:
            raise ValueError(
                f"unknown pair op {kind!r} (publish | upsert | retract)"
            )
        if not res or "_version" not in res:
            raise IOError(
                f"pair half {i} on {path} produced no commit — pair "
                "aborted (nothing became visible)"
            )
        results.append(res)
        # the half's ACTUAL log: a branch-targeted verb commits to the
        # branch chain, and the marker's `logs` list + seal_pair's
        # overtake check must reference that chain, not main's
        committed.append(
            (_log_dir(path, spec.get("branch")), res["_version"])
        )
        if _fail_between is not None and i == _fail_between:
            raise RuntimeError(
                f"injected crash after pair half {i} committed (pending)"
            )
        if _between_hook is not None and i == 0:
            _between_hook()  # race-test injection: a concurrent writer
    txlog.seal_pair(
        spark, intent, committed, _fail_before_marker=_fail_before_marker
    )
    return results


def vacuum_published_files(
    spark,
    path: str,
    keep_last: int | None = None,
    grace_seconds: float = 0.0,
    keep_since=None,
    _pause_before_sweep=None,
    dry_run: bool = False,
) -> int | dict:
    """File-granular retention sweep — the piece that makes a
    retraction actually FORGET: after :func:`vacuum_published`'s
    directory-level pass, version directories referenced by a
    retained file-level (retraction) manifest survive WHOLESALE,
    including the superseded originals of rewritten files (the bytes
    the retraction removed).  This sweep deletes, inside every
    referenced-but-not-wholly-live version directory, the data files
    NO retained manifest's file list references.  Returns files
    removed (directories fully drained are removed too).

    Run it after retention passes:
    ``retract_from_published(...); vacuum_published_files(path)``
    leaves no copy of the retracted rows on storage.

    CONCURRENT-DML safety: immediately before deleting, the sweep
    re-lists the commit log and treats every version committed since
    the pre-scan as retained (OCC re-check — a racing upsert/retract's
    brand-new files are never "orphans").  Files an IN-FLIGHT,
    not-yet-committed writer has just written are protected only by
    ``grace_seconds``: anything modified within the window is spared,
    so set it above the longest write wherever writers run
    concurrently (default 0 = single-writer behavior).
    ``_pause_before_sweep`` is the race-test injection hook, called
    between the pre-scan and the OCC re-check.

    ``dry_run=True`` deletes NOTHING and returns
    ``{"directories", "manifests", "files"}`` — the full audit of
    what the same call would remove (Delta ``VACUUM ... DRY RUN``)."""
    import time as _time

    from v6spark import txlog

    if keep_since is not None:
        from v6spark.sources.pubcorpus import _parse_as_of

        keep_since = _parse_as_of(keep_since)
    keep_last, keep_since = _resolve_retention(
        spark, path, keep_last, keep_since
    )
    removed = vacuum_published(
        spark, path, keep_last=keep_last, grace_seconds=grace_seconds,
        keep_since=keep_since, dry_run=dry_run, _resolved=True,
    )
    manifests = txlog._complete_manifests(spark, f"{path}/{_COMMITS}")
    # retention = newest keep_last UNION read-leased versions — same
    # rule the directory-level vacuum applies (txlog._retained_versions)
    retained = [
        manifests[v]
        for v in sorted(
            txlog._retained_versions(
                spark, f"{path}/{_COMMITS}", keep_last,
                keep_since=keep_since,
            )
        )
    ]
    # ... UNION every live branch's manifests: branch file lists name
    # files under THIS root (shared address space), so the per-file
    # sweep must treat them as referenced while the branch lives
    for blog in _branch_log_dirs(spark, path):
        retained.extend(txlog._complete_manifests(spark, blog).values())
    whole_dirs: set[str] = set()
    keep_files: set[str] = set()
    keep_prefixes: set[str] = set()

    def _add_doc_keeps(d) -> None:
        # key-bloom sidecar TABLES a retained manifest references must
        # survive regardless of manifest shape — their version dir may
        # hold no live data file while the index still probes them
        for t in (d.get("key_bloom") or {}).get("tables") or []:
            keep_prefixes.add(t["path"].rstrip("/") + "/")
        # ... and so must an offloaded manifest's stats sidecar —
        # possibly in ANOTHER version's directory (schema evolution
        # copies the pointer).  Capture BEFORE _doc_files materializes
        # (and removes) the ref.
        ref = d.get("manifest_ref")
        if ref:
            keep_prefixes.add(str(ref.get("dir", "")).rstrip("/") + "/")
        files = _doc_files(spark, path, d)
        if files is not None:
            for fl in files.values():
                keep_files.update(fl)
            # deletion-vector sidecars are data too: a retained DV
            # manifest's reads depend on them
            keep_files.update((d.get("dv") or {}).get("data") or [])
        else:
            live = d.get("live")
            whole_dirs.update(live if isinstance(live, list) else [live])

    for d in retained:
        _add_doc_keeps(d)
    if _pause_before_sweep is not None:
        _pause_before_sweep()
    # OCC re-check: a DML transaction that committed while the
    # pre-scan ran references files the snapshot has never seen —
    # every version newer than the snapshot is retained by definition
    # (it IS the newest), so fold its file lists into the keep set
    # before anything is deleted.  BRANCH chains share the same data
    # pool, so their logs re-list too (including branches created
    # during the pre-scan).
    fresh = txlog._complete_manifests(spark, f"{path}/{_COMMITS}")
    for v in sorted(set(fresh) - set(manifests)):
        _add_doc_keeps(fresh[v])
    for blog in _branch_log_dirs(spark, path):
        for _v, d in sorted(
            txlog._complete_manifests(spark, blog).items()
        ):
            _add_doc_keeps(d)  # idempotent set updates: re-adding the
            # pre-scan's branch docs is free, and fresh commits join
    cutoff_ms = (_time.time() - grace_seconds) * 1000.0
    n_files = 0
    would_files: list[str] = []

    # LOCAL fast path: the JVM iterator pays a py4j round trip per
    # listed file (hasNext/next/getName/getModificationTime ×
    # thousands of files is what made the 10x stress's vacuum wall
    # grow 1.46x with file count).  A local root lists, stats, and
    # deletes through the OS directly; non-local stores keep the
    # FileSystem loop.  Same semantics: v= dirs only, wholly-live
    # dirs skipped, underscore/dot FILE names spared, grace-window
    # mtimes spared, emptied dirs dropped.
    local_root = None
    if path.startswith("file:"):
        local_root = path[len("file:"):]
    elif path.startswith("/") and "://" not in path:
        # a scheme-less absolute path resolves against the session's
        # Hadoop defaultFS — on an HDFS/S3 deployment the OS sweep
        # would silently no-op (nothing at that local path) and leave
        # orphans unreclaimed, so take the fast path only when the
        # default filesystem really is the local one
        default_fs = spark._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///"
        )
        if default_fs.startswith("file:"):
            local_root = path
    if local_root is not None:
        import shutil as _shutil

        if not os.path.isdir(local_root):
            return {**removed, "files": []} if dry_run else removed
        for entry in sorted(os.scandir(local_root), key=lambda e: e.name):
            name = entry.name
            if not (entry.is_dir() and name.startswith("v=")):
                continue
            if name in whole_dirs:
                continue
            if dry_run and name in (removed.get("directories") or []):
                continue
            still = False
            for dirpath, _dirs, files in os.walk(entry.path):
                for fname in files:
                    if fname.startswith(("_", ".")):
                        continue
                    fp = os.path.join(dirpath, fname)
                    try:
                        mtime_ms = os.stat(fp).st_mtime * 1000.0
                    except FileNotFoundError:
                        continue  # racing writer/vacuum: already gone
                    if mtime_ms > cutoff_ms:
                        still = True
                        continue  # grace window: possibly in flight
                    rel = os.path.relpath(fp, local_root)
                    if rel not in keep_files and not any(
                        rel.startswith(p) for p in keep_prefixes
                    ):
                        if dry_run:
                            would_files.append(rel)
                            continue
                        os.remove(fp)
                        n_files += 1
                    else:
                        still = True
            if not dry_run and not still:
                _shutil.rmtree(entry.path, ignore_errors=True)
        if dry_run:
            return {**removed, "files": sorted(would_files)}
        return removed + n_files

    fs, jroot, jvm = txlog._jfs(spark, path)
    if not fs.exists(jroot):
        return {**removed, "files": []} if dry_run else removed
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v=")):
            continue
        if name in whole_dirs:
            continue
        if dry_run and name in (removed.get("directories") or []):
            # the directory-level pass would already have taken it
            continue
        it = fs.listFiles(st.getPath(), True)
        while it.hasNext():
            fst = it.next()
            fname = fst.getPath().getName()
            if fname.startswith(("_", ".")):
                continue
            if fst.getModificationTime() > cutoff_ms:
                continue  # inside the grace window: possibly in flight
            rel = _rel_path(fst.getPath().toString(), path)
            if rel not in keep_files and not any(
                rel.startswith(p) for p in keep_prefixes
            ):
                if dry_run:
                    would_files.append(rel)
                    continue
                fs.delete(fst.getPath(), False)
                n_files += 1
        if dry_run:
            continue
        # drop the dir if nothing referenced remains under it
        still = False
        it2 = fs.listFiles(st.getPath(), True)
        while it2.hasNext():
            f2 = it2.next().getPath().getName()
            if not f2.startswith(("_", ".")):
                still = True
                break
        if not still:
            fs.delete(st.getPath(), True)
    if dry_run:
        return {**removed, "files": sorted(would_files)}
    return removed + n_files


def upsert_into_published(
    spark,
    path: str,
    updates: DataFrame,
    key_col: str = "doc_id",
    commit_mode: str = "rename",
    n_shards: int | None = None,
    seed: int | None = None,
    _fail_after: str | None = None,
    max_retries: int = 8,
    _scan_observer=None,
    txn_id: str | None = None,
    branch: str | None = None,
    _intent: str | None = None,
    delete_keys: list | None = None,
) -> dict:
    """MERGE a delta into a committed parquet publish as a NEW
    committed version — UPDATE rows whose key is already published
    (content replaced in place, same split and shard), INSERT rows
    with new keys (into the split named by the delta's ``split``
    column) — completing the publish/retract/upsert DML triad on the
    same file-level copy-on-write manifest.

    ``updates`` carries the published content columns, plus a
    ``split`` column consumed by inserts (ignored for updates — an
    already-published document stays in its split; moving splits is a
    retract + insert, stated explicitly, because silently migrating a
    train document into test is how leakage audits get lied to).

    Scale shape: the shard is a pure key hash
    (``packing.assign_shards``: pmod(xxhash64(seed, key), n_shards) —
    the params travel in the manifest), so candidate files are pruned
    BY DIRECTORY NAME to the shards the delta's keys hash into before
    anything is read; within candidates, one key-column scan
    (min/max-key prefilter for row-group stats + broadcast semi-join)
    finds the files that actually hold matched rows.  Only those
    rewrite; kept files are referenced, zero bytes copied.  Rewritten
    shards re-sort by the publish's deterministic ``_order`` hash, so
    trainers' per-shard reading order survives the merge.

    ``delete_keys`` folds a key-addressed DELETE into the SAME
    transaction (the MERGE INTO apply): the delete keys join the
    candidate selection and the single hits scan, affected files
    rewrite once with deleted rows dropped and updated rows replaced
    — retract+upsert as ONE commit, one scan pass, one write job.  A
    key may be updated or deleted, never both (refused).

    Crash before the manifest commit leaves the current version
    untouched (``_fail_after="data"``).  MULTI-WRITER SAFE via the
    :func:`_occ_dml` optimistic loop: a concurrent DML commit makes
    this writer recompute its matched-file plan against the winner's
    file list and retry.  When the manifest carries per-file key
    min/max stats (``file_stats``, recorded at publish/DML time),
    candidate selection is MANIFEST-ONLY: only files whose recorded
    key range can contain a delta key are scanned — the
    Iceberg/Delta stats-pruning pattern (``_scan_observer``, test
    hook, receives the per-split list of files actually scanned).
    Returns {"_version", "rows_updated", "rows_inserted",
    "files_rewritten", "files_kept", "splits"}.
    """
    from v6spark import txlog
    from v6spark.operators.packing import assign_shards

    def _attempt(version, doc, vdir, data_root):
        if doc is None:
            raise ValueError(
                f"{path} has no committed publish to upsert into"
            )
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "upsert_into_published operates on parquet publishes; "
                f"this one is {doc.get('fmt')!r}"
            )
        if txn_id is not None and txn_id in (doc.get("txn_ids") or []):
            # exactly-once replay skip (see _txn_forward)
            return None, {
                "_version": version,
                "rows_updated": 0,
                "rows_inserted": 0,
                "files_rewritten": 0,
                "files_kept": 0,
                "splits": dict(doc["splits"]),
                "replayed": True,
            }
        # shard-hash params and the key column are PUBLISH properties —
        # an override disagreeing with the manifest would make the
        # directory-name pruning miss every existing row (all deltas
        # treated as inserts: silent duplicate keys).  Explicit params
        # are validated, not trusted; they remain only as a fallback for
        # manifests written before these fields were recorded.
        for pname, given, recorded in (
            ("n_shards", n_shards, doc.get("n_shards")),
            ("seed", seed, doc.get("seed")),
        ):
            if (
                given is not None
                and recorded is not None
                and given != recorded
            ):
                raise ValueError(
                    f"upsert {pname}={given} disagrees with the publish "
                    f"manifest's {pname}={recorded}; the shard hash is "
                    "fixed at publish time"
                )
        if doc.get("key_col") is not None and key_col != doc["key_col"]:
            raise ValueError(
                f"upsert key_col={key_col!r} disagrees with the publish "
                f"manifest's key_col={doc['key_col']!r}"
            )
        ns = n_shards if n_shards is not None else (doc.get("n_shards") or 32)
        sd = seed if seed is not None else (doc.get("seed") or 0)
        content_cols = [c for c in updates.columns if c != "split"]
        published_cols = [name for name, _t in (doc.get("schema") or [])]
        if published_cols and sorted(content_cols) != sorted(published_cols):
            raise ValueError(
                f"upsert columns {sorted(content_cols)} != published schema "
                f"{sorted(published_cols)} (plus an optional 'split' for "
                "inserts)"
            )
        if key_col not in updates.columns:
            raise ValueError(f"updates must carry the key column {key_col!r}")
        cons = doc.get("constraints") or {}
        if cons:
            # only the DELTA needs checking: kept files' rows passed
            # when they were committed (the Delta enforcement shape)
            _enforce_constraints(
                updates.drop("split") if "split" in updates.columns
                else updates,
                cons, "the upsert delta",
            )

        upd = assign_shards(updates, key_col, ns, seed=sd).drop("_order")
        # ONE collect of (key, shard) serves the shard set, the stats
        # bisect, the DUPLICATE-KEY check (local — no extra Spark
        # job), AND a lineage-free local probe frame: the hits scan
        # groups by input_file_name(), which Spark rejects when any
        # OTHER file source appears in the same plan — a delta derived
        # from parquet (a corrections table, a change feed) would
        # poison it, so the broadcast probe must carry no file lineage.
        # Driver-side keys are fine: the delta is the small side by
        # contract.
        key_schema = upd.select(key_col, "shard").schema
        key_rows = upd.select(key_col, "shard").collect()
        seen_keys = set()
        for r in key_rows:
            if r[key_col] in seen_keys:
                raise ValueError(
                    f"updates carry duplicate key {r[key_col]!r} — an "
                    "upsert must be keyed uniquely (collapse the delta "
                    "first)"
                )
            seen_keys.add(r[key_col])
        # folded DELETEs (the MERGE INTO apply): the delete keys join
        # the same candidate selection / scan / rewrite pass, so a
        # retract+upsert lands as ONE commit with one hits scan and
        # one write job instead of two full DML verbs
        dels = list(delete_keys or [])
        del_set = set(dels)
        if len(dels) != len(del_set):
            raise ValueError("delete_keys carries duplicates")
        overlap = del_set & seen_keys
        if overlap:
            raise ValueError(
                f"keys {sorted(overlap, key=str)[:5]} appear in BOTH "
                "the delta and delete_keys — a key is updated or "
                "deleted, never both"
            )
        del_rows = []
        if dels:
            dk_df = _local_df(
                spark, [(k,) for k in dels],
                updates.select(key_col).schema,
            )
            del_rows = (
                assign_shards(dk_df, key_col, ns, seed=sd)
                .select(key_col, "shard").collect()
            )
        probe_rows = key_rows + del_rows
        # driver-sized frames coalesce to ONE partition: the default
        # parallelize() slices a 40-row probe into 32 mostly-empty
        # partitions, and every union/join over them drags the empty
        # tasks into the write stage (measured: a 275-task write input
        # for a 40-row merge source)
        probe_keys = _local_df(spark, probe_rows, key_schema)
        keys_all = sorted(r[key_col] for r in probe_rows)
        bounds = (
            {"lo": keys_all[0], "hi": keys_all[-1]}
            if keys_all else {"lo": None, "hi": None}
        )
        touched_shards = {r["shard"] for r in probe_rows}
        # manifest-only candidate pruning: with per-file key stats in
        # the manifest, a sorted delta-key probe against each file's
        # recorded [lo, hi] decides candidacy WITHOUT opening the file
        # — by-shard delta keys, bisect per file
        file_stats = _doc_file_stats(spark, path, doc)
        keys_by_shard: dict[int, list] = {}
        if file_stats:
            import bisect

            for r in probe_rows:
                keys_by_shard.setdefault(r["shard"], []).append(r[key_col])
            for ks in keys_by_shard.values():
                ks.sort()

            def _stats_can_match(s, rel, shard):
                st = file_stats.get(s, {}).get(rel)
                if st is None or st[0] is None:
                    # no stats / unknown-bounds ([None, None, n]):
                    # must scan — bisecting None would crash planning
                    return True
                lo, hi = st[0], st[1]
                ks = keys_by_shard.get(shard, [])
                i = bisect.bisect_left(ks, lo)
                return i < len(ks) and ks[i] <= hi

        split_files = _published_split_files(spark, path, doc)
        fs, jroot, _jvm = txlog._jfs(spark, data_root)
        if fs.exists(jroot):
            fs.delete(jroot, True)  # impossible (nonce name) but cheap

        def _shard_of(rel: str) -> int | None:
            for part in rel.split("/"):
                if part.startswith("shard="):
                    return int(part.split("=", 1)[1])
            return None

        prior_dv = doc.get("dv") or {}
        new_files: dict[str, list[str]] = {}
        new_counts: dict[str, int] = {}
        new_stats: dict[str, dict] = {}
        new_dv_files: dict[str, dict] = {}
        fresh_by_split: dict[str, list[str]] = {}
        files_rewritten = 0
        files_kept = 0
        # ONE hits job across every split: each split's candidate MOR
        # scan contributes (split, file, key) rows for probe-key
        # matches; the union collects once (bounded by the probe size
        # — the delta is the small side by contract), and every
        # downstream decision (affected files, matched update keys,
        # found delete keys, per-split delete counts, the insert key
        # set) is derived LOCALLY.  The r9 shape paid one Spark job
        # per split for the hits, one for the global insert count,
        # one per split for insert counts — each ~0.5-0.9 s of job
        # overhead on a source of 40 rows.
        split_candidates: dict[str, list[str]] = {}
        hit_frames = []
        for s, files in sorted(split_files.items()):
            # directory-name pruning: only files in shards the probe
            # hashes into can hold a matched key; file-stats pruning
            # then drops candidates whose key range holds no probe key
            candidates = [
                rel for rel in files if _shard_of(rel) in touched_shards
            ]
            if file_stats:
                candidates = [
                    rel for rel in candidates
                    if _stats_can_match(s, rel, _shard_of(rel))
                ]
            if _scan_observer is not None:
                _scan_observer(s, list(candidates))
            split_candidates[s] = candidates
            if candidates:
                # merge-on-read scan: rows a deletion vector already
                # removed must not count as matches (their key would be
                # an INSERT, not an update); __file not
                # input_file_name() — the MOR anti-join adds a second
                # file source to the plan
                cand_df = _read_split_mor(
                    spark, path, s, candidates, doc, keep_pos=True
                )
                hit_frames.append(
                    cand_df.filter(
                        F.col(key_col).between(bounds["lo"], bounds["hi"])
                    )
                    .join(
                        F.broadcast(probe_keys.select(key_col)),
                        key_col, "left_semi",
                    )
                    .select(
                        F.lit(s).alias("_split"),
                        F.col("__file").alias("_file"),
                        F.col(key_col).alias("_key"),
                    )
                )
        hit_rows = []
        if hit_frames:
            hits_df = hit_frames[0]
            for h in hit_frames[1:]:
                hits_df = hits_df.unionByName(h)
            hit_rows = hits_df.collect()

        affected_by_split: dict[str, set] = {}
        matched_upd_by_split: dict[str, set] = {}
        deleted_by_split: dict[str, int] = {}
        matched_upd_all: set = set()
        rows_updated = 0
        rows_deleted = 0
        for r in hit_rows:
            s, rel, k = r["_split"], r["_file"], r["_key"]
            affected_by_split.setdefault(s, set()).add(rel)
            if k in del_set:
                deleted_by_split[s] = deleted_by_split.get(s, 0) + 1
                rows_deleted += 1
            else:
                matched_upd_by_split.setdefault(s, set()).add(k)
                matched_upd_all.add(k)
                rows_updated += 1

        rewrites: dict[str, DataFrame] = {}
        for s, files in sorted(split_files.items()):
            affected_rel = affected_by_split.get(s, set())
            kept = [rel for rel in files if rel not in affected_rel]
            files_kept += len(kept)
            new_files[s] = sorted(kept)
            new_counts[s] = (
                doc["splits"].get(s, 0) - deleted_by_split.get(s, 0)
            )
            new_stats[s] = {
                rel: file_stats[s][rel]
                for rel in kept
                if s in file_stats and rel in file_stats[s]
            }
            # deletion vectors carry forward for kept files; rewritten
            # files materialize theirs (the MOR read below drops the
            # dv'd rows) and shed the entry
            kept_dv = {
                rel: n
                for rel, n in (prior_dv.get("files", {}).get(s, {})).items()
                if rel in set(kept)
            }
            if kept_dv:
                new_dv_files[s] = kept_dv
            if affected_rel:
                files_rewritten += len(affected_rel)
                aff = _read_split_mor(
                    spark, path, s, sorted(affected_rel), doc,
                )
                # drop BOTH updated and deleted rows, re-add the
                # updated ones from the delta (deletes simply vanish)
                kept_rows = aff.join(
                    F.broadcast(probe_keys.select(key_col)), key_col,
                    "left_anti",
                )
                upd_s = matched_upd_by_split.get(s, set())
                if upd_s:
                    matched = _local_df(
                        spark, [(k,) for k in sorted(upd_s, key=str)],
                        updates.select(key_col).schema,
                    )
                    updated_rows = upd.drop("split").join(
                        F.broadcast(matched), key_col, "left_semi"
                    )
                    rewrites[s] = kept_rows.unionByName(
                        updated_rows.select(*kept_rows.columns)
                    )
                else:
                    rewrites[s] = kept_rows

        # inserts: delta keys not published anywhere — derived locally
        # from the collected hits, no Spark job
        insert_keys = seen_keys - matched_upd_all
        rows_inserted = len(insert_keys)
        if insert_keys and len(insert_keys) < len(seen_keys):
            ins_probe = _local_df(
                spark, [(k,) for k in sorted(insert_keys, key=str)],
                updates.select(key_col).schema,
            )
            inserts = upd.join(F.broadcast(ins_probe), key_col, "left_semi")
        else:
            inserts = upd
        if rows_inserted and "split" not in updates.columns:
            raise ValueError(
                f"{rows_inserted} delta rows have unpublished keys; inserts "
                "need a 'split' column naming their destination split"
            )
        insert_counts: dict = {}
        if rows_inserted:
            # ONE job: per-split insert counts (feeds new_counts AND
            # the NULL-split refusal below — a delta row intended as
            # an UPDATE whose key is not published is an INSERT with
            # no destination, e.g. the key was retracted)
            insert_counts = {
                r["split"]: r["_n"]
                for r in inserts.groupBy("split")
                .agg(F.count(F.lit(1)).alias("_n")).collect()
            }
            if None in insert_counts:
                ks = [
                    r[key_col]
                    for r in inserts.filter(F.col("split").isNull())
                    .select(key_col).limit(5).collect()
                ]
                raise ValueError(
                    f"delta keys {ks} are not published (retracted, or "
                    "never existed) and carry a NULL 'split' — an insert "
                    "needs a destination split; re-key the update or set "
                    "'split' for these rows"
                )

        if rows_updated == 0 and rows_inserted == 0 and rows_deleted == 0:
            fs.delete(jroot, True)
            if txn_id is not None:
                # record the no-op txn (see the retract twin's note)
                payload = {
                    k: v for k, v in doc.items() if k != "v"
                }
                payload["txn_ids"] = _txn_forward(doc, txn_id)
                payload["noop_txn"] = txn_id
                return payload, {
                    "rows_updated": 0,
                    "rows_inserted": 0,
                    "rows_deleted": 0,
                    "files_rewritten": 0,
                    "files_kept": files_kept,
                    "splits": dict(doc["splits"]),
                }
            return None, {
                "_version": version,
                "rows_updated": 0,
                "rows_inserted": 0,
                "rows_deleted": 0,
                "files_rewritten": 0,
                "files_kept": files_kept,
                "splits": dict(doc["splits"]),
            }

        # ONE write job across every touched split: each per-split
        # frame gains its split as a literal column and the writer
        # partitions by (split, shard) — identical directory layout
        # and per-file row order to the old one-job-per-split loop
        # (rows of one (split, shard) land in one task, sorted by the
        # publish's deterministic _order hash), at a fraction of the
        # job-scheduling overhead
        insert_splits = set(insert_counts)
        out_frames = []
        for s in sorted(set(rewrites) | insert_splits):
            out_df = rewrites.get(s)
            if s in insert_splits:
                ins_s = inserts.filter(F.col("split") == s).drop("split")
                new_counts[s] = new_counts.get(s, 0) + insert_counts[s]
                out_df = ins_s if out_df is None else out_df.unionByName(
                    ins_s.select(*out_df.columns)
                )
            out_frames.append(out_df.withColumn("split", F.lit(s)))
        if out_frames:
            combined = out_frames[0]
            for f in out_frames[1:]:
                combined = combined.unionByName(f)
            # deterministic per-shard training order, as at publish time
            ordered = combined.withColumn(
                "_order", F.xxhash64(F.lit(sd + 1), F.col(key_col))
            )
            (
                ordered.repartition(ns, F.col("shard"))
                .sortWithinPartitions("split", "shard", "_order", key_col)
                .drop("_order")
                .write.mode("error")
                .partitionBy("split", "shard")
                .parquet(data_root)
            )
            added_by_split: dict[str, list[str]] = {}
            for p in _list_data_files(spark, data_root):
                rel = _rel_path(p, path)
                s_val = None
                for part in rel.split("/"):
                    if part.startswith("split="):
                        from urllib.parse import unquote as _unquote

                        s_val = _unquote(part.split("=", 1)[1])
                        break
                added_by_split.setdefault(s_val, []).append(rel)
            for s, added in sorted(added_by_split.items()):
                new_files[s] = sorted(new_files.get(s, []) + added)
                new_stats.setdefault(s, {}).update(
                    _collect_file_stats(spark, path, s, sorted(added), key_col)
                )
                fresh_by_split[s] = sorted(added)
        if _fail_after == "data":
            raise RuntimeError("injected crash after upsert data write")

        dv_doc = (
            {"data": prior_dv.get("data") or [], "files": new_dv_files}
            if new_dv_files
            else None
        )
        payload = {
            "live": _dv_live_dirs(new_files, dv_doc),
            "primary": vdir,
            "files": new_files,
            "fmt": "parquet",
            "splits": new_counts,
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": ns,
            "seed": sd,
            "key_col": doc.get("key_col") or key_col,
            "file_stats": new_stats,
            "col_stats": _carry_col_stats(spark, path, doc, new_files),
            "txn_ids": _txn_forward(doc, txn_id),
            "upsert": {
                "rows_updated": rows_updated,
                "rows_inserted": rows_inserted,
                "rows_deleted": rows_deleted,
                "files_rewritten": files_rewritten,
                "files_kept": files_kept,
                "from_version": version,
            },
        }
        if dv_doc is not None:
            payload["dv"] = dv_doc
        if doc.get("clustered_by"):
            payload["clustered_by"] = doc["clustered_by"]
        _carry_constraints(doc, payload)
        if doc.get("key_bloom"):
            tables = _build_key_bloom_table(
                spark, path, vdir, fresh_by_split,
                doc.get("key_col") or key_col,
                _bloom_m_bits(
                    doc,
                    sum(new_counts.values()),
                    sum(len(fl) for fl in new_files.values()) or 1,
                ),
            )
            payload["key_bloom"] = _carry_key_bloom(doc, tables)
        return payload, {
            "rows_updated": rows_updated,
            "rows_inserted": rows_inserted,
            "rows_deleted": rows_deleted,
            "files_rewritten": files_rewritten,
            "files_kept": files_kept,
            "splits": new_counts,
        }

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
        log_dir=_log_dir(path, branch), _intent=_intent)


def evolve_published_schema(
    spark,
    path: str,
    add_columns: list[tuple[str, str]],
    commit_mode: str = "rename",
    max_retries: int = 8,
    _fail_before_commit: bool = False,
    branch: str | None = None,
) -> dict:
    """ADDITIVE schema evolution on a committed publish: append
    nullable columns to the published schema as a new manifest
    version, rewriting ZERO data files — the Iceberg/Delta
    ADD-COLUMN path.  The r5 drift guard refuses any changed publish
    schema (the right default); this is the sanctioned way a corpus
    gains metadata columns over its lifetime without a full
    republish.

    Semantics after the commit:
    - committed reads (:func:`read_published_corpus`) return the
      UNIFIED schema — files written before the evolution read the
      added columns as typed NULLs (``_read_split_files`` aligns each
      version-dir group to the manifest schema);
    - time-travel reads (``version=``) return each version's OWN
      schema — an evaluation pinned to the pre-evolution version
      still sees exactly the columns it trained on;
    - subsequent :func:`upsert_into_published` deltas must carry the
      evolved schema (the column-set validation now checks against
      the new manifest), and their rewritten files materialize the
      added columns;
    - :func:`publish_corpus_committed` reruns with the evolved schema
      pass the drift guard.

    ``add_columns``: ``[(name, spark_type_simple_string), ...]`` —
    e.g. ``[("license", "string"), ("toxicity", "double")]``.  Only
    ADDING columns is supported; renames/drops/type changes remain a
    guarded full republish (``allow_schema_change=True``), because
    they change what existing bytes MEAN, not just what exists.

    Manifest-only, so the only crash window is the txlog commit
    itself (atomic); ``_fail_before_commit`` injects a crash right
    before it for the test.  MULTI-WRITER SAFE via :func:`_occ_dml`.
    Returns {"_version", "schema"}.
    """
    from v6spark import txlog

    if not add_columns:
        raise ValueError("add_columns must name at least one column")
    for name, typ in add_columns:
        # validate the type string eagerly — a typo must fail at the
        # evolve call, not at the first post-evolution read
        try:
            F.lit(None).cast(typ)
        except Exception as exc:
            raise ValueError(
                f"add_columns type {typ!r} for {name!r} is not a valid "
                "Spark type"
            ) from exc

    def _attempt(version, doc, vdir, data_root):
        if doc is None:
            raise ValueError(f"{path} has no committed publish to evolve")
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "evolve_published_schema operates on parquet publishes; "
                f"this one is {doc.get('fmt')!r}"
            )
        schema = [list(c) for c in (doc.get("schema") or [])]
        existing = {n for n, _t in schema}
        for name, typ in add_columns:
            if name in existing:
                raise ValueError(
                    f"column {name!r} already exists in the published "
                    "schema — evolution is additive only"
                )
            schema.append([name, typ])
        if _fail_before_commit:
            raise RuntimeError("injected crash before schema-evolve commit")
        payload = {
            **{k: v for k, v in doc.items()
               if k != "intent" and k not in _OP_MARKERS},
            "schema": schema,
            "schema_changed": True,
            "schema_evolution": {
                "added": [list(c) for c in add_columns],
                "from_version": version,
            },
        }
        return payload, {"schema": schema}

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
        log_dir=_log_dir(path, branch))


def optimize_published(
    spark, path: str,
    min_files_per_group: int = 2,
    max_file_rows: int | None = None,
    commit_mode: str = "rename",
    max_retries: int = 8,
    branch: str | None = None,
) -> dict:
    """INCREMENTAL bin-packing OPTIMIZE: fold only the FRAGMENTED
    (split, shard) groups — those holding ``min_files_per_group`` or
    more data files — into one fresh file each, referencing every
    other file untouched.  The Delta ``OPTIMIZE`` (without ZORDER)
    shape, and the piece :func:`compact_published` is too big a
    hammer for at 100 TB: after a week of small upserts a corpus has
    a few hundred fragmented shards out of hundreds of thousands,
    and a full re-pack rewrites the whole corpus to fix 0.1% of it.
    This verb's write cost tracks the FRAGMENTED bytes alone.

    Per fragmented group the rewrite is exactly the upsert kernel's:
    merge-on-read scan (deletion vectors materialize and shed their
    entries; pre-evolution files land re-encoded on the unified
    schema), re-sorted by the publish's deterministic ``_order``
    hash so trainers' per-shard reading order is restored, one file
    per shard.  Kept files carry their stats/DV/Bloom entries
    verbatim; fresh files get footer-walk stats and Bloom tables, so
    every pruning surface stays exact.  Logical row counts are
    unchanged (a pure layout operation).  No-op (commits nothing)
    when nothing is fragmented.  MULTI-WRITER SAFE via
    :func:`_occ_dml`.

    ``max_file_rows`` is the Delta ``optimize.minFileSize`` dial,
    expressed in the manifest's row counts: files at or above it are
    ALREADY PACKED and never rewritten — only a group's small files
    (appends, upsert slivers) fold together, so on a mature corpus
    the write cost tracks the APPENDED bytes alone, independent of
    how big the packed files underneath have grown (AB_OPTIMIZE
    measures exactly this).  The trade: a group then holds the packed
    file(s) plus one folded file, and cross-FILE training order
    within the shard is not restored — each file stays
    ``_order``-sorted, but only the default full-group fold
    (``max_file_rows=None``), or :func:`compact_published`, restores
    the exact publish reading order.  Files without recorded row
    stats are treated as small (fold them: never strand an unknown).

    Returns {"_version", "groups_rewritten", "files_folded",
    "files_kept", "splits"} ("_version" absent on a no-op).
    """
    from v6spark import txlog

    if min_files_per_group < 2:
        raise ValueError(
            "min_files_per_group must be >= 2 (a 1-file group is "
            "already packed)"
        )

    def _shard_of(rel: str) -> int | None:
        for part in rel.split("/"):
            if part.startswith("shard="):
                return int(part.split("=", 1)[1])
        return None

    def _attempt(version, doc, vdir, data_root):
        if doc is None:
            raise ValueError(
                f"{path} has no committed publish to optimize"
            )
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "optimize_published operates on parquet publishes; "
                f"this one is {doc.get('fmt')!r}"
            )
        ns = doc.get("n_shards") or 32
        sd = doc.get("seed") or 0
        key_col = doc.get("key_col") or "doc_id"
        split_files = _published_split_files(spark, path, doc)
        prior_dv = doc.get("dv") or {}
        file_stats = _doc_file_stats(spark, path, doc)

        def _is_small(s: str, rel: str) -> bool:
            if max_file_rows is None:
                return True
            st = (file_stats.get(s) or {}).get(rel)
            rows = st[2] if st and len(st) > 2 else None
            return rows is None or rows < max_file_rows

        plan: dict[str, list[str]] = {}   # split -> fragmented rels
        kept_files: dict[str, list[str]] = {}
        groups_rewritten = 0
        for s, files in sorted(split_files.items()):
            by_shard: dict[int | None, list[str]] = {}
            for rel in files:
                by_shard.setdefault(_shard_of(rel), []).append(rel)
            frag: list[str] = []
            kept: list[str] = []
            for sh, rels in sorted(
                by_shard.items(), key=lambda kv: (kv[0] is None, kv[0])
            ):
                # unsharded rels (no shard= component) have no group
                # identity to pack under: keep them; compact_published
                # is the verb that internalizes those layouts
                small = (
                    [r for r in rels if _is_small(s, r)]
                    if sh is not None else []
                )
                if len(small) >= min_files_per_group:
                    frag.extend(small)
                    kept.extend(r for r in rels if r not in set(small))
                    groups_rewritten += 1
                else:
                    kept.extend(rels)
            plan[s] = sorted(frag)
            kept_files[s] = sorted(kept)

        files_folded = sum(len(fl) for fl in plan.values())
        if files_folded == 0:
            return None, {
                "_version": version,
                "groups_rewritten": 0,
                "files_folded": 0,
                "files_kept": sum(len(f) for f in split_files.values()),
                "splits": dict(doc["splits"]),
            }

        fs, jroot, _jvm = txlog._jfs(spark, data_root)
        if fs.exists(jroot):
            fs.delete(jroot, True)

        new_files: dict[str, list[str]] = {}
        new_stats: dict[str, dict] = {}
        new_dv_files: dict[str, dict] = {}
        fresh_by_split: dict[str, list[str]] = {}
        for s, files in sorted(split_files.items()):
            kept = kept_files[s]
            new_files[s] = list(kept)
            new_stats[s] = {
                rel: file_stats[s][rel]
                for rel in kept
                if s in file_stats and rel in file_stats[s]
            }
            kept_dv = {
                rel: n
                for rel, n in (prior_dv.get("files", {}).get(s, {})).items()
                if rel in set(kept)
            }
            if kept_dv:
                new_dv_files[s] = kept_dv
            frag = plan[s]
            if not frag:
                continue
            # merge-on-read: rewritten groups materialize their DVs
            # and re-encode pre-evolution files on the unified schema
            df = _read_split_mor(spark, path, s, frag, doc)
            kc = key_col if key_col in df.columns else df.columns[0]
            ordered = df.withColumn(
                "_order", F.xxhash64(F.lit(sd + 1), F.col(kc))
            )
            out_dir = f"{data_root}/split={s}"
            (
                ordered.repartition(ns, F.col("shard"))
                .sortWithinPartitions("shard", "_order", kc)
                .drop("_order")
                .write.mode("error")
                .partitionBy("shard")
                .parquet(out_dir)
            )
            added = sorted(
                _rel_path(p, path)
                for p in _list_data_files(spark, out_dir)
            )
            fresh_by_split[s] = added
            new_files[s] = sorted(new_files[s] + added)
            if added:
                new_stats[s].update(
                    _collect_file_stats(spark, path, s, added, kc)
                )

        dv_doc = None
        if new_dv_files:
            dv_doc = {
                "files": new_dv_files,
                "data": [
                    rel for rel in (prior_dv.get("data") or [])
                ],
            }
        payload = {
            "live": _dv_live_dirs(new_files, dv_doc),
            "fmt": "parquet",
            "splits": dict(doc["splits"]),
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": ns,
            "seed": sd,
            "key_col": doc.get("key_col"),
            "txn_ids": _txn_forward(doc, None),
            "files": {s: list(fl) for s, fl in sorted(new_files.items())},
            "file_stats": new_stats,
            "col_stats": _carry_col_stats(spark, path, doc, new_files),
            "optimized": {
                "from_version": version,
                "groups_rewritten": groups_rewritten,
                "files_folded": files_folded,
                "files_kept": sum(len(f) for f in kept_files.values()),
                "min_files_per_group": min_files_per_group,
            },
        }
        if dv_doc is not None:
            payload["dv"] = dv_doc
        if doc.get("clustered_by"):
            # nominally clustered: merged groups widen their curve
            # rectangles (recomputed col_stats stay EXACT, pruning
            # sound); compaction_advice still recommends a full
            # re-cluster when DML fragmentation accumulates
            payload["clustered_by"] = doc["clustered_by"]
        _carry_constraints(doc, payload)
        if doc.get("key_bloom") and doc.get("key_col") and fresh_by_split:
            tables = _build_key_bloom_table(
                spark, path, vdir, fresh_by_split, doc["key_col"],
                _bloom_m_bits(
                    doc,
                    sum(doc["splits"].values()),
                    sum(len(fl) for fl in new_files.values()) or 1,
                ),
            )
            payload["key_bloom"] = _carry_key_bloom(doc, tables)
        elif doc.get("key_bloom"):
            payload["key_bloom"] = doc["key_bloom"]
        return payload, {
            "groups_rewritten": groups_rewritten,
            "files_folded": files_folded,
            "files_kept": sum(len(f) for f in kept_files.values()),
            "splits": dict(doc["splits"]),
        }

    return _occ_dml(spark, path, _attempt, commit_mode, max_retries,
                    log_dir=_log_dir(path, branch))


def compact_published(
    spark, path: str, commit_mode: str = "rename",
    max_retries: int = 8, cluster_by: list[str] | None = None,
    n_cluster_files: int | None = None, zorder_bits: int = 12,
    branch: str | None = None,
) -> int | None:
    """Fold the current (file-level, DML-accumulated) committed
    version back into one fresh DIRECTORY-level version — the
    OPTIMIZE step after a run of retractions/upserts: restores a
    single mountable version root (``published_path`` works again),
    collapses cross-version file references, and re-packs each shard
    into one file in the deterministic training order.  A no-op
    (returns None) when the current version is already
    directory-level and no re-clustering was asked for.  Retired
    versions' bytes go when :func:`vacuum_published_files` runs after
    retention.  MULTI-WRITER SAFE via :func:`_occ_dml`: a DML commit
    racing the compaction wins or loses cleanly; the loser recomputes.

    ``cluster_by`` is the OPTIMIZE ZORDER BY option: lay the rewrite
    out along the Z-order curve of the named columns
    (:func:`v6spark.sources.layout.zorder_key`) — numeric columns
    min/max-normalized (one agg, no global window), date/timestamp
    cast to order-preserving doubles, and STRING columns
    dictionary-rank-normalized (sorted distinct values broadcast back
    as dense ranks; see :func:`~v6spark.sources.layout.
    cluster_surrogates`) — so every data file covers a tight
    rectangle in those columns and :func:`read_published_where`
    prunes ARBITRARY range (and string equality/prefix) predicates
    over them from the manifest's ``col_stats`` — the cure for what
    compaction otherwise does to skipping (re-packing by shard hash
    smears ingestion-correlated ranges across every file; AB_PRUNE
    shows both effects).  Layout:
    ``repartitionByRange`` into ``n_cluster_files`` curve segments
    per split, still written ``partitionBy("shard")`` — files are
    (curve segment × shard) so key-hash DML pruning, point lookups,
    and resharding keep working unchanged on a clustered publish.
    The trade, recorded in the manifest as ``clustered_by``: rows
    inside a shard are curve-ordered, not training-ordered — a later
    plain ``compact_published()`` restores the deterministic
    training order.
    """
    from v6spark import txlog
    from v6spark.sources.layout import cluster_surrogates, zorder_key

    def _attempt(version, doc, vdir, data_root):
        if doc is None:
            raise ValueError(f"{path} has no committed publish to compact")
        if (
            not _doc_has_files(doc)
            and not cluster_by
            and not doc.get("clustered_by")
        ):
            return None, None
        if cluster_by:
            types = dict(doc.get("schema") or [])
            for c in cluster_by:
                if c not in types:
                    raise ValueError(
                        f"cluster_by column {c!r} is not in the published "
                        f"schema {sorted(types)}"
                    )
                # type support (numeric/string/date/timestamp) is
                # validated by layout.cluster_surrogates below
        ns = doc.get("n_shards") or 32
        sd = doc.get("seed") or 0
        # training order is keyed on the PUBLISH's key column (recorded
        # in the manifest since r6); the doc_id/first-column guess is
        # only a fallback for pre-r6 manifests
        key_col = doc.get("key_col")
        fs, jroot, _jvm = txlog._jfs(spark, data_root)
        if fs.exists(jroot):
            fs.delete(jroot, True)
        split_files = _published_split_files(spark, path, doc)
        stats_key = None
        for s, files in sorted(split_files.items()):
            if not files:
                continue
            # merge-on-read: compaction MATERIALIZES any deletion
            # vectors (rewritten files shed their dv'd rows; the fresh
            # directory-level manifest carries no dv key)
            df = _read_split_mor(spark, path, s, files, doc)
            kc = key_col if key_col in df.columns else (
                "doc_id" if "doc_id" in df.columns else df.columns[0]
            )
            stats_key = kc
            if cluster_by:
                # mixed-type normalization: strings become dictionary
                # ranks (broadcast join, bounds known), dates/
                # timestamps become doubles — see cluster_surrogates
                types = dict(doc.get("schema") or [])
                df, surro, bounds, drop_cols = cluster_surrogates(
                    df, cluster_by, types
                )
                # scalable bounds for the rest: ONE min/max agg per
                # split, linear bucketing — no global window
                need = [c for c in surro if c not in bounds]
                if need:
                    aggs = []
                    for c in need:
                        aggs += [
                            F.min(c).alias(f"__lo_{c}"),
                            F.max(c).alias(f"__hi_{c}"),
                        ]
                    row = df.agg(*aggs).collect()[0]
                    for c in need:
                        bounds[c] = (
                            row[f"__lo_{c}"] or 0, row[f"__hi_{c}"] or 0
                        )
                keyed = df.withColumn(
                    "__z", zorder_key(surro, zorder_bits, bounds=bounds)
                )
                (
                    keyed.repartitionByRange(n_cluster_files or ns, "__z")
                    .sortWithinPartitions("shard", "__z")
                    .drop("__z", *drop_cols)
                    .write.mode("error")
                    .partitionBy("shard")
                    .parquet(f"{data_root}/split={s}")
                )
                continue
            ordered = df.withColumn(
                "_order", F.xxhash64(F.lit(sd + 1), F.col(kc))
            )
            (
                ordered.repartition(ns, F.col("shard"))
                .sortWithinPartitions("shard", "_order")
                .drop("_order")
                .write.mode("error")
                .partitionBy("shard")
                .parquet(f"{data_root}/split={s}")
            )
        payload = {
            "live": vdir,
            "fmt": "parquet",
            "splits": dict(doc["splits"]),
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": ns,
            "seed": sd,
            "key_col": key_col,
            "txn_ids": _txn_forward(doc, None),
            "compacted_from": version,
        }
        if cluster_by:
            payload["clustered_by"] = list(cluster_by)
        _carry_constraints(doc, payload)
        fresh = _published_split_files(
            spark, path, {"live": vdir, "splits": doc["splits"]}
        )
        if stats_key is not None:
            payload["file_stats"] = {
                s: _collect_file_stats(spark, path, s, fl, stats_key)
                if fl else {}
                for s, fl in fresh.items()
            }
        payload["col_stats"] = {
            s: _collect_col_stats(spark, path, s, fl) if fl else {}
            for s, fl in fresh.items()
        }
        if doc.get("key_bloom") and stats_key is not None:
            # full rewrite: rebuild the bloom index from scratch (the
            # fresh single-table state also prunes the DML-accumulated
            # sidecar list)
            tables = _build_key_bloom_table(
                spark, path, vdir, fresh, stats_key,
                _bloom_m_bits(
                    None, sum(doc["splits"].values()),
                    sum(len(fl) for fl in fresh.values()) or 1,
                ),
            )
            payload["key_bloom"] = _carry_key_bloom(None, tables)
        return payload, {}

    out = _occ_dml(spark, path, _attempt, commit_mode, max_retries,
        log_dir=_log_dir(path, branch))
    return out["_version"] if out else None


def reshard_published(
    spark,
    path: str,
    n_shards: int,
    seed: int | None = None,
    commit_mode: str = "rename",
    max_retries: int = 8,
) -> int:
    """SHARD-COUNT EVOLUTION: rewrite a committed publish under a new
    shard hash (``pmod(xxhash64(seed, key), n_shards)``) as a new
    committed version — the partition-evolution step a growing corpus
    needs when the shard count chosen at first publish stops matching
    the data (too few shards → giant files and no write parallelism;
    DML pruning fan-out stuck at the old modulus).  A full rewrite by
    construction (every key's shard assignment changes), so schedule
    it like a compaction, not like DML; content is bit-identical row
    for row — :func:`published_corpus_changes` across the reshard
    returns ZERO rows, and point lookups / upserts prune with the NEW
    params immediately (they read the manifest).  Versioned readers
    pinned to the old layout are untouched.  MULTI-WRITER SAFE via
    :func:`_occ_dml`.  Returns the committed version."""
    from v6spark import txlog
    from v6spark.operators.packing import assign_shards

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    def _attempt(version, doc, vdir, data_root):
        if doc is None:
            raise ValueError(f"{path} has no committed publish to reshard")
        if doc.get("fmt") != "parquet":
            raise ValueError(
                "reshard_published operates on parquet publishes; this "
                f"one is {doc.get('fmt')!r}"
            )
        sd = seed if seed is not None else (doc.get("seed") or 0)
        key_col = doc.get("key_col") or "doc_id"
        fs, jroot, _jvm = txlog._jfs(spark, data_root)
        if fs.exists(jroot):
            fs.delete(jroot, True)
        split_files = _published_split_files(spark, path, doc)
        for s, files in sorted(split_files.items()):
            if not files:
                continue
            # merge-on-read: a reshard is a full rewrite, so it also
            # materializes any deletion vectors
            df = _read_split_mor(spark, path, s, files, doc).drop("shard")
            sharded = assign_shards(df, key_col, n_shards, seed=sd)
            (
                sharded.repartition(n_shards, F.col("shard"))
                .sortWithinPartitions("shard", "_order")
                .drop("_order")
                .write.mode("error")
                .partitionBy("shard")
                .parquet(f"{data_root}/split={s}")
            )
        payload = {
            "live": vdir,
            "fmt": "parquet",
            "splits": dict(doc["splits"]),
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": n_shards,
            "seed": sd,
            "key_col": key_col,
            "txn_ids": _txn_forward(doc, None),
            "resharded_from": version,
        }
        _carry_constraints(doc, payload)
        fresh = _published_split_files(
            spark, path, {"live": vdir, "splits": doc["splits"]}
        )
        payload["file_stats"] = {
            s: _collect_file_stats(spark, path, s, fl, key_col)
            if fl else {}
            for s, fl in fresh.items()
        }
        payload["col_stats"] = {
            s: _collect_col_stats(spark, path, s, fl) if fl else {}
            for s, fl in fresh.items()
        }
        if doc.get("key_bloom"):
            tables = _build_key_bloom_table(
                spark, path, vdir, fresh, key_col,
                _bloom_m_bits(
                    None, sum(doc["splits"].values()),
                    sum(len(fl) for fl in fresh.values()) or 1,
                ),
            )
            payload["key_bloom"] = _carry_key_bloom(None, tables)
        return payload, {}

    out = _occ_dml(spark, path, _attempt, commit_mode, max_retries)
    return out["_version"]
