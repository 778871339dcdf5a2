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
    _fail_after_split: str | None = None,
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
    publish writes into its own version directory ``{path}/v=<n>/``
    and becomes visible only when one manifest file commits it —
    committed readers (:func:`read_published_corpus`,
    :func:`published_path`) never see a partial publish, and a rerun
    after a crash overwrites the orphaned version directory before
    committing.

    ``commit_mode``: ``"rename"`` (HDFS/POSIX atomic rename) or
    ``"put"`` (S3 semantics — conditional put + checksum-verified
    manifests).  ``_fail_after_split`` is a crash-injection hook for
    tests: raise after the named split's data lands, leaving the
    remaining splits unwritten (the partial-publish window).

    Returns {split: n_rows} like :func:`publish_corpus`, plus the
    committed version under key ``"_version"``.
    """
    from v6spark import txlog

    spark = prepared.sparkSession
    version, _doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    # the published rows are the content columns (split is consumed
    # into the directory layout) — that is the schema trainers see
    schema = [
        [f.name, f.dataType.simpleString()] for f in content.schema.fields
    ]
    prev_schema = _doc.get("schema") if _doc else None
    schema_changed = prev_schema is not None and prev_schema != schema
    if schema_changed and not allow_schema_change:
        raise ValueError(
            f"publish schema drift vs version {version}: "
            f"{prev_schema} -> {schema}; pass allow_schema_change=True "
            "to publish anyway (recorded in the manifest)"
        )
    new_version = version + 1
    vdir = f"v={new_version:06d}"
    data_root = f"{path}/{vdir}"

    # An existing target dir is an orphan of OUR OWN crashed previous
    # attempt (the log is single-writer; committed versions are never
    # recomputed) — clear it so the shard writers' mode="error"
    # freshness guarantee holds on the rerun.
    fs, jroot, _jvm = txlog._jfs(spark, data_root)
    if fs.exists(jroot):
        fs.delete(jroot, True)

    counts = publish_corpus(
        prepared, content, data_root, fmt=fmt, key_col=key_col,
        n_shards=n_shards, seed=seed, compress=compress,
        _fail_after_split=_fail_after_split,
    )
    txlog.publish(
        spark,
        f"{path}/{_COMMITS}",
        new_version,
        {
            "live": vdir,
            "fmt": fmt,
            "splits": counts,
            "schema": schema,
            "schema_changed": schema_changed,
            "n_shards": n_shards,
            "seed": seed,
            "key_col": key_col,
        },
        commit_mode=commit_mode,
    )
    return {**counts, "_version": new_version}


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
    if "files" in doc:
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
    spark, path: str, split: str | None = None, version: int | None = None
):
    """Committed-only DataFrame view of a parquet-format publish
    (exactly-once read: partial publishes are invisible);
    ``version`` pins a historical publish (see
    :func:`published_path`).  Resolves directory-level publish
    manifests AND file-level retraction manifests
    (:func:`retract_from_published`) transparently."""
    from v6spark import txlog

    if version is None:
        _v, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    else:
        doc = txlog.read_version(spark, f"{path}/{_COMMITS}", version)
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
        return _read_split_files(spark, path, split, files)
    if not splits:
        # a committed EMPTY publish (every doc filtered out) is a
        # valid state distinct from "nothing committed yet"
        return None
    dfs = [
        _read_split_files(spark, path, s, split_files[s]).withColumn(
            "split", F.lit(s)
        )
        for s in splits
        if split_files.get(s)
    ]
    if not dfs:
        return None
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


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


def vacuum_published(spark, path: str, keep_last: int = 1) -> int:
    """Delete version directories no retained manifest references
    (crashed orphans, superseded publishes) and retired manifests.
    ``keep_last`` retains the newest N complete versions for
    version-pinned (time-travel) readers.  Returns directories
    removed."""
    from v6spark import txlog

    return txlog.vacuum_versions(
        spark, path, f"{path}/{_COMMITS}", "v=", keep_last=keep_last
    )


def _published_split_files(spark, path: str, doc: dict) -> dict[str, list[str]]:
    """Relative data-file paths per split for a committed parquet
    publish — directory-level (recursive listing of the version dir,
    shard subdirectories included) or file-level (a retraction
    manifest's explicit ``files`` list)."""
    from v6spark import txlog

    if "files" in doc:
        return {s: list(fl) for s, fl in doc["files"].items()}
    out: dict[str, list[str]] = {}
    for s in sorted(doc["splits"]):
        split_dir = f"{path}/{doc['live']}/split={s}"
        fs, jdir, _jvm = txlog._jfs(spark, split_dir)
        files = []
        if fs.exists(jdir):
            it = fs.listFiles(jdir, True)
            while it.hasNext():
                fst = it.next()
                name = fst.getPath().getName()
                if not name.startswith(("_", ".")):
                    files.append(_rel_path(fst.getPath().toString(), path))
        out[s] = sorted(files)
    return out


def _read_split_files(spark, path: str, split: str, files: list[str]):
    """One DataFrame over a split's file list, with the ``shard``
    partition column RECOVERED: files are grouped by the version dir
    they live in and each group reads under its own basePath (the
    split dir), so directory-derived partition values survive
    file-level reads — chained retractions span version dirs, hence
    the grouping."""
    by_vdir: dict[str, list[str]] = {}
    for rel in files:
        by_vdir.setdefault(rel.split("/", 1)[0], []).append(rel)
    dfs = []
    for vdir, group in sorted(by_vdir.items()):
        base = f"{path}/{vdir}/split={split}"
        dfs.append(
            spark.read.option("basePath", base).parquet(
                *[f"{path}/{rel}" for rel in sorted(group)]
            )
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _rel_path(uri: str, path: str) -> str:
    """input_file_name() URI -> path-relative file path."""
    idx = uri.find(path)
    if idx < 0:
        raise ValueError(f"file {uri} is outside the publish root {path}")
    return uri[idx + len(path) + 1 :]


def retract_from_published(
    spark,
    path: str,
    predicate: str,
    commit_mode: str = "rename",
    _fail_after: str | None = None,
) -> dict:
    """Row-level DELETE from a committed parquet publish as a NEW
    committed version, rewriting ONLY the files that contain matching
    rows (file-level copy-on-write) — the takedown/right-to-be-
    forgotten operation a 100 TB published corpus needs, where
    "republish everything minus the rows" is a full-corpus write and
    a full-corpus read.

    ``predicate`` is a SQL boolean over the published columns
    selecting the rows to REMOVE; it is recorded in the manifest.

    Scale shape, in order:
    1. ONE predicate-pushdown scan per split finds the affected files
       (``input_file_name()`` + the pushed predicate: parquet
       row-group stats skip clean files, and only predicate columns
       are read — ``.explain`` shows PushedFilters when the predicate
       is stats-friendly).  With Z-ordered or key-sorted layout
       (sources/layout.py) the affected set is a handful of files.
    2. Only affected files are re-read and rewritten (minus matching
       rows) into the new version directory.
    3. The new manifest lists the surviving files EXPLICITLY (kept
       files stay in their original version directories — zero bytes
       copied for them); ``live`` lists every referenced version dir
       so the directory-level vacuum spares them, and
       :func:`vacuum_published_files` sweeps the superseded originals
       file-granularly once retention passes (the actual "forgotten"
       guarantee — see its docstring).

    Committed readers (:func:`read_published_corpus`) resolve either
    manifest shape transparently.  A crash before the manifest commit
    leaves the current version untouched (``_fail_after="data"``
    injects that window); the retraction is single-writer, like
    publishes.

    Returns {"_version", "rows_removed", "files_rewritten",
    "files_kept", "splits"} — rows_removed == 0 commits nothing and
    returns the current version.
    """
    from v6spark import txlog

    version, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    if doc is None:
        raise ValueError(f"{path} has no committed publish to retract from")
    if doc.get("fmt") != "parquet":
        raise ValueError(
            "retract_from_published operates on parquet publishes; "
            f"this one is {doc.get('fmt')!r}"
        )
    split_files = _published_split_files(spark, path, doc)
    pred = F.expr(predicate)

    new_version = version + 1
    vdir = f"v={new_version:06d}"
    data_root = f"{path}/{vdir}"
    fs, jroot, _jvm = txlog._jfs(spark, data_root)
    if fs.exists(jroot):
        fs.delete(jroot, True)  # orphan of our own crashed attempt

    new_files: dict[str, list[str]] = {}
    new_counts: dict[str, int] = {}
    rows_removed = 0
    files_rewritten = 0
    files_kept = 0
    for s, files in sorted(split_files.items()):
        if not files:
            new_files[s] = []
            new_counts[s] = doc["splits"].get(s, 0)
            continue
        df = _read_split_files(spark, path, s, files)
        # one pushed-down scan: affected files + their match counts
        hits = (
            df.filter(pred)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        affected_rel = {_rel_path(r["f"], path) for r in hits}
        removed_s = sum(r["n"] for r in hits)
        rows_removed += removed_s
        kept = [rel for rel in files if rel not in affected_rel]
        files_kept += len(kept)
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
            rewritten = _read_split_files(
                spark, path, s, sorted(affected_rel)
            ).filter(~F.coalesce(pred, F.lit(False)))
            out_dir = f"{data_root}/split={s}"
            writer = rewritten.write.mode("error")
            if "shard" in rewritten.columns:
                writer = writer.partitionBy("shard")
            writer.parquet(out_dir)
            fs2, jdir2, _ = txlog._jfs(spark, out_dir)
            it = fs2.listFiles(jdir2, True)
            while it.hasNext():
                fst = it.next()
                name = fst.getPath().getName()
                if not name.startswith(("_", ".")):
                    out_rel.append(_rel_path(fst.getPath().toString(), path))
        new_files[s] = sorted(kept + out_rel)
        new_counts[s] = doc["splits"].get(s, 0) - removed_s

    if rows_removed == 0:
        fs.delete(jroot, True)
        return {
            "_version": version,
            "rows_removed": 0,
            "files_rewritten": 0,
            "files_kept": files_kept,
            "splits": dict(doc["splits"]),
        }
    if _fail_after == "data":
        raise RuntimeError("injected crash after retraction data write")

    live_dirs = sorted(
        {rel.split("/", 1)[0] for fl in new_files.values() for rel in fl}
    )
    txlog.publish(
        spark,
        f"{path}/{_COMMITS}",
        new_version,
        {
            "live": live_dirs,
            "primary": vdir,
            "files": new_files,
            "fmt": "parquet",
            "splits": new_counts,
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": doc.get("n_shards"),
            "seed": doc.get("seed"),
            "key_col": doc.get("key_col"),
            "retraction": {
                "predicate": predicate,
                "rows_removed": rows_removed,
                "files_rewritten": files_rewritten,
                "files_kept": files_kept,
                "from_version": version,
            },
        },
        commit_mode=commit_mode,
    )
    return {
        "_version": new_version,
        "rows_removed": rows_removed,
        "files_rewritten": files_rewritten,
        "files_kept": files_kept,
        "splits": new_counts,
    }


def vacuum_published_files(spark, path: str, keep_last: int = 1) -> int:
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
    """
    from v6spark import txlog

    removed = vacuum_published(spark, path, keep_last=keep_last)
    manifests = txlog._complete_manifests(spark, f"{path}/{_COMMITS}")
    retained = [manifests[v] for v in sorted(manifests)[-keep_last:]]
    whole_dirs: set[str] = set()
    keep_files: set[str] = set()
    for d in retained:
        if "files" in d:
            for fl in d["files"].values():
                keep_files.update(fl)
        else:
            live = d.get("live")
            whole_dirs.update(live if isinstance(live, list) else [live])
    n_files = 0
    fs, jroot, jvm = txlog._jfs(spark, path)
    if not fs.exists(jroot):
        return removed
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v=")):
            continue
        if name in whole_dirs:
            continue
        it = fs.listFiles(st.getPath(), True)
        while it.hasNext():
            fst = it.next()
            fname = fst.getPath().getName()
            if fname.startswith(("_", ".")):
                continue
            rel = _rel_path(fst.getPath().toString(), path)
            if rel not in keep_files:
                fs.delete(fst.getPath(), False)
                n_files += 1
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

    Crash before the manifest commit leaves the current version
    untouched (``_fail_after="data"``).  Single-writer, like
    publishes.  Returns {"_version", "rows_updated", "rows_inserted",
    "files_rewritten", "files_kept", "splits"}.
    """
    from v6spark import txlog
    from v6spark.operators.packing import assign_shards

    version, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    if doc is None:
        raise ValueError(f"{path} has no committed publish to upsert into")
    if doc.get("fmt") != "parquet":
        raise ValueError(
            "upsert_into_published operates on parquet publishes; "
            f"this one is {doc.get('fmt')!r}"
        )
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
        if given is not None and recorded is not None and given != recorded:
            raise ValueError(
                f"upsert {pname}={given} disagrees with the publish "
                f"manifest's {pname}={recorded}; the shard hash is fixed "
                "at publish time"
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
            f"{sorted(published_cols)} (plus an optional 'split' for inserts)"
        )
    if key_col not in updates.columns:
        raise ValueError(f"updates must carry the key column {key_col!r}")

    # the delta is the small side by contract: broadcast it everywhere
    dup = (
        updates.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 1").limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"updates carry duplicate key {dup[0][key_col]!r} — an upsert "
            "must be keyed uniquely (collapse the delta first)"
        )
    upd = assign_shards(updates, key_col, ns, seed=sd).drop("_order")
    upd_keys = upd.select(key_col, "shard")
    bounds = updates.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    touched_shards = {r["shard"] for r in upd_keys.select("shard").distinct().collect()}

    split_files = _published_split_files(spark, path, doc)
    new_version = version + 1
    vdir = f"v={new_version:06d}"
    data_root = f"{path}/{vdir}"
    fs, jroot, _jvm = txlog._jfs(spark, data_root)
    if fs.exists(jroot):
        fs.delete(jroot, True)  # orphan of our own crashed attempt

    def _shard_of(rel: str) -> int | None:
        for part in rel.split("/"):
            if part.startswith("shard="):
                return int(part.split("=", 1)[1])
        return None

    new_files: dict[str, list[str]] = {}
    new_counts: dict[str, int] = {}
    rows_updated = 0
    files_rewritten = 0
    files_kept = 0
    matched_keys_frames = []
    rewrites: dict[str, DataFrame] = {}
    for s, files in sorted(split_files.items()):
        # directory-name pruning: only files in shards the delta
        # hashes into can hold a matched key
        candidates = [
            rel for rel in files if _shard_of(rel) in touched_shards
        ]
        affected_rel: set[str] = set()
        matched_s = 0
        if candidates:
            cand_df = _read_split_files(spark, path, s, candidates)
            hits = (
                cand_df.filter(F.col(key_col).between(bounds["lo"], bounds["hi"]))
                .join(F.broadcast(upd_keys.select(key_col)), key_col, "left_semi")
                .groupBy(F.input_file_name().alias("f"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            affected_rel = {_rel_path(r["f"], path) for r in hits}
            matched_s = sum(r["n"] for r in hits)
        rows_updated += matched_s
        kept = [rel for rel in files if rel not in affected_rel]
        files_kept += len(kept)
        new_files[s] = sorted(kept)
        new_counts[s] = doc["splits"].get(s, 0)
        if affected_rel:
            files_rewritten += len(affected_rel)
            aff = _read_split_files(spark, path, s, sorted(affected_rel))
            kept_rows = aff.join(
                F.broadcast(upd_keys.select(key_col)), key_col, "left_anti"
            )
            matched = aff.select(key_col).join(
                F.broadcast(upd_keys.select(key_col)), key_col, "left_semi"
            )
            matched_keys_frames.append(matched)
            updated_rows = upd.drop("split").join(
                matched, key_col, "left_semi"
            )
            rewrites[s] = kept_rows.unionByName(
                updated_rows.select(*kept_rows.columns)
            )

    # inserts: delta keys not published anywhere
    if matched_keys_frames:
        all_matched = matched_keys_frames[0]
        for m in matched_keys_frames[1:]:
            all_matched = all_matched.unionByName(m)
        inserts = upd.join(all_matched, key_col, "left_anti")
    else:
        inserts = upd
    rows_inserted = inserts.count()
    if rows_inserted and "split" not in updates.columns:
        raise ValueError(
            f"{rows_inserted} delta rows have unpublished keys; inserts "
            "need a 'split' column naming their destination split"
        )

    if rows_updated == 0 and rows_inserted == 0:
        fs.delete(jroot, True)
        return {
            "_version": version,
            "rows_updated": 0,
            "rows_inserted": 0,
            "files_rewritten": 0,
            "files_kept": files_kept,
            "splits": dict(doc["splits"]),
        }

    insert_splits = (
        {r["split"] for r in inserts.select("split").distinct().collect()}
        if rows_inserted
        else set()
    )
    for s in sorted(set(rewrites) | insert_splits):
        out_df = rewrites.get(s)
        if s in insert_splits:
            ins_s = inserts.filter(F.col("split") == s).drop("split")
            new_counts[s] = new_counts.get(s, 0) + ins_s.count()
            out_df = ins_s if out_df is None else out_df.unionByName(
                ins_s.select(*out_df.columns)
            )
        # deterministic per-shard training order, as at publish time
        ordered = out_df.withColumn(
            "_order", F.xxhash64(F.lit(sd + 1), F.col(key_col))
        )
        out_dir = f"{data_root}/split={s}"
        (
            ordered.repartition(ns, F.col("shard"))
            .sortWithinPartitions("shard", "_order", key_col)
            .drop("_order")
            .write.mode("error")
            .partitionBy("shard")
            .parquet(out_dir)
        )
        fs2, jdir2, _ = txlog._jfs(spark, out_dir)
        it = fs2.listFiles(jdir2, True)
        added = []
        while it.hasNext():
            fst = it.next()
            name = fst.getPath().getName()
            if not name.startswith(("_", ".")):
                added.append(_rel_path(fst.getPath().toString(), path))
        new_files[s] = sorted(new_files.get(s, []) + added)
    if _fail_after == "data":
        raise RuntimeError("injected crash after upsert data write")

    live_dirs = sorted(
        {rel.split("/", 1)[0] for fl in new_files.values() for rel in fl}
    )
    txlog.publish(
        spark,
        f"{path}/{_COMMITS}",
        new_version,
        {
            "live": live_dirs,
            "primary": vdir,
            "files": new_files,
            "fmt": "parquet",
            "splits": new_counts,
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": ns,
            "seed": sd,
            "key_col": doc.get("key_col") or key_col,
            "upsert": {
                "rows_updated": rows_updated,
                "rows_inserted": rows_inserted,
                "files_rewritten": files_rewritten,
                "files_kept": files_kept,
                "from_version": version,
            },
        },
        commit_mode=commit_mode,
    )
    return {
        "_version": new_version,
        "rows_updated": rows_updated,
        "rows_inserted": rows_inserted,
        "files_rewritten": files_rewritten,
        "files_kept": files_kept,
        "splits": new_counts,
    }


def compact_published(
    spark, path: str, commit_mode: str = "rename"
) -> int | None:
    """Fold the current (file-level, DML-accumulated) committed
    version back into one fresh DIRECTORY-level version — the
    OPTIMIZE step after a run of retractions/upserts: restores a
    single mountable version root (``published_path`` works again),
    collapses cross-version file references, and re-packs each shard
    into one file in the deterministic training order.  A no-op
    (returns None) when the current version is already
    directory-level.  Retired versions' bytes go when
    :func:`vacuum_published_files` runs after retention.
    """
    from v6spark import txlog

    version, doc = txlog.read_latest(spark, f"{path}/{_COMMITS}")
    if doc is None:
        raise ValueError(f"{path} has no committed publish to compact")
    if "files" not in doc:
        return None
    ns = doc.get("n_shards") or 32
    sd = doc.get("seed") or 0
    # training order is keyed on the PUBLISH's key column (recorded in
    # the manifest since r6); the doc_id/first-column guess is only a
    # fallback for pre-r6 manifests
    key_col = doc.get("key_col")
    new_version = version + 1
    vdir = f"v={new_version:06d}"
    data_root = f"{path}/{vdir}"
    fs, jroot, _jvm = txlog._jfs(spark, data_root)
    if fs.exists(jroot):
        fs.delete(jroot, True)
    split_files = _published_split_files(spark, path, doc)
    for s, files in sorted(split_files.items()):
        if not files:
            continue
        df = _read_split_files(spark, path, s, files)
        kc = key_col if key_col in df.columns else (
            "doc_id" if "doc_id" in df.columns else df.columns[0]
        )
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
    txlog.publish(
        spark,
        f"{path}/{_COMMITS}",
        new_version,
        {
            "live": vdir,
            "fmt": "parquet",
            "splits": dict(doc["splits"]),
            "schema": doc.get("schema"),
            "schema_changed": False,
            "n_shards": ns,
            "seed": sd,
            "key_col": key_col,
            "compacted_from": version,
        },
        commit_mode=commit_mode,
    )
    return new_version
