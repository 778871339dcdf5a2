"""Versioned-manifest transaction log — the shared commit kernel.

One tiny log format serves every exactly-once publish surface in the
repo: streaming near-dedup (streaming/neardedup.py), streaming media
dedup, and batch corpus publishing (pipeline.publish_corpus_committed).
The design is the Delta-log idea at minimum viable size: data files are
written first into version-private directories, then ONE manifest file
``<log_dir>/manifest-<v>`` is published; the highest COMPLETE manifest
is the atomic commit point.  Readers only ever consult directories a
complete manifest names, so a crash anywhere before the commit leaves
orphans that committed readers never see and a rerun overwrites.

Two commit modes (``commit_mode``), chosen per deployment filesystem:

``"rename"`` (default)
    Write ``.manifest-<v>.tmp``, then rename to the (new, never
    overwritten) final name.  Rename-to-new-name is atomic on HDFS and
    POSIX — the classic commit protocol.

``"put"`` (S3 semantics)
    Object stores have no atomic rename (S3A "rename" is copy+delete,
    and a crashed copy leaves a PARTIAL object under the final name).
    Instead the manifest is created directly under its final name with
    ``overwrite=False`` — the conditional-put / write-if-absent
    primitive (S3 supports this natively via If-None-Match; HDFS via
    CreateFlag semantics) — and the PAYLOAD carries its own
    completeness proof: a trailing line with the SHA-256 of the body.
    Readers verify the footer and simply skip incomplete manifests, so
    the commit point becomes "highest manifest whose checksum
    verifies".  A torn write under the final name is therefore
    harmless: it is unreadable-as-committed, and the rerun publishes
    the next version rather than retrying the torn name (version
    numbers are cheap; the torn file is vacuumable).

Both modes write the checksum footer and the reader always verifies
it, so logs are mode-portable: a log written on HDFS in rename mode
reads correctly through the put-mode reader and vice versa.

File format (version-independent)::

    {"v": <version>, ...payload...}\n
    sha256:<hex of everything before this line>\n

All filesystem access goes through the Hadoop FileSystem API of the
SparkSession — the same filesystem Spark writes (HDFS/S3/local) —
never driver-local ``os.path``, which would silently miss remote
stores.
"""

from __future__ import annotations

import hashlib
import json
import re
import threading

from pyspark.sql import SparkSession

MANIFEST_PREFIX = "manifest-"
COMMIT_MODES = ("rename", "put")

# Serializes same-process commits (concurrent driver threads).  POSIX
# rename OVERWRITES an existing destination (HDFS's fails, S3's
# conditional put fails) — so on a local filesystem two in-process
# racers could silently clobber each other's commit without this.
# Cross-process local races additionally rely on the read-back verify
# in publish(); true multi-writer deployments run on HDFS/S3 where
# the primitive itself is exclusive.
_COMMIT_LOCK = threading.Lock()


def _jfs(spark: SparkSession, path_str: str):
    """(Hadoop FileSystem, Path, jvm) for ``path_str``."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, jpath, sc._jvm


def _encode(version: int, payload: dict) -> bytes:
    # payload last-writer-wins would let a re-spread stale "v" (e.g. a
    # decoded manifest doc passed back through append/compact) override
    # the true version — the filename and body must always agree.
    body = json.dumps({**payload, "v": version}, sort_keys=True).encode()
    digest = hashlib.sha256(body).hexdigest()
    return body + b"\nsha256:" + digest.encode() + b"\n"


def _decode(raw: bytes) -> dict | None:
    """Parse + completeness-verify a manifest file; None if torn.

    Accepts the checksummed format and (for back-compat with logs
    written before the footer existed) a bare JSON document.  A file
    that fails BOTH is an incomplete write and is skipped — that is
    the put-mode torn-write defence, and it also protects rename-mode
    logs against non-atomic rename emulations (S3A copy+delete).
    """
    try:
        text = raw.decode()
    except UnicodeDecodeError:
        return None
    lines = text.rstrip("\n").rsplit("\n", 1)
    if len(lines) == 2 and lines[1].startswith("sha256:"):
        body, footer = lines[0].encode(), lines[1][len("sha256:"):]
        if hashlib.sha256(body).hexdigest() != footer:
            return None
        try:
            return json.loads(body.decode())
        except ValueError:
            return None
    try:
        doc = json.loads(text)
    except ValueError:
        return None
    return doc if isinstance(doc, dict) else None


def list_versions(spark: SparkSession, log_dir: str) -> list[int]:
    """Manifest version numbers present in the log, ascending
    (complete AND torn — use :func:`read_version` to verify one)."""
    fs, jdir, _jvm = _jfs(spark, log_dir)
    if not fs.exists(jdir):
        return []
    versions = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.startswith(MANIFEST_PREFIX):
            try:
                versions.append(int(name[len(MANIFEST_PREFIX):]))
            except ValueError:
                continue
    return sorted(versions)


def read_version(
    spark: SparkSession, log_dir: str, version: int
) -> dict | None:
    """Payload of manifest ``version`` if present AND complete, else
    None — the time-travel primitive (a historical version is
    readable until :func:`vacuum_manifests`/``vacuum_versions``
    retires it).  A manifest carrying an ``intent`` pointer (one half
    of a :func:`commit_pair`) is complete only once its intent MARKER
    exists — until then (and forever, if the pair crashed) it is
    invisible, exactly like a torn write."""
    fs, jdir, jvm = _jfs(spark, log_dir)
    path = jvm.org.apache.hadoop.fs.Path(
        jdir, f"{MANIFEST_PREFIX}{version:012d}"
    )
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    doc = _decode(raw)
    if doc is not None and "intent" in doc:
        if not intent_committed(spark, doc["intent"]):
            return None
    return doc


def read_latest(
    spark: SparkSession, log_dir: str
) -> tuple[int, dict | None]:
    """(version, payload) of the highest COMPLETE manifest.

    (0, None) before the first commit.  Higher-numbered manifests
    that fail the completeness check (torn conditional put, crashed
    non-atomic rename) are skipped — the log falls back to the
    highest verifiable commit, which is exactly the pre-crash state.
    """
    for v in reversed(list_versions(spark, log_dir)):
        doc = read_version(spark, log_dir, v)
        if doc is not None:
            return v, doc
    return 0, None


#: Post-commit observers: ``fn(log_dir, version)`` called on the
#: driver after :func:`publish` returns successfully (including the
#: idempotent-replay exits).  Observers run AFTER the commit is
#: durable, so they must never raise to signal a commit problem —
#: exceptions are swallowed into a warning (the commit already
#: happened; failing the caller would misreport it).  Used by
#: :mod:`v6spark.catalog` to refresh follow-latest session views when
#: their table's log advances.
_ON_COMMIT: list = []


def add_commit_observer(fn) -> None:
    """Register ``fn(log_dir, version)`` to run after every commit."""
    if fn not in _ON_COMMIT:
        _ON_COMMIT.append(fn)


def remove_commit_observer(fn) -> None:
    """Unregister a :func:`add_commit_observer` callback (no-op if
    absent)."""
    try:
        _ON_COMMIT.remove(fn)
    except ValueError:
        pass


def _notify_commit(log_dir: str, version: int) -> None:
    import warnings

    for fn in list(_ON_COMMIT):
        try:
            fn(log_dir, version)
        except Exception as exc:  # pragma: no cover - observer bug
            warnings.warn(
                f"txlog commit observer {fn!r} raised {exc!r} for "
                f"{log_dir} v{version} (commit already durable)"
            )


def publish(
    spark: SparkSession,
    log_dir: str,
    version: int,
    payload: dict,
    commit_mode: str = "rename",
) -> None:
    """Publish manifest ``version``; the call returning IS the commit.

    ``rename``: tmp-write + rename-to-new-name (atomic on HDFS/POSIX).
    ``put``: create the final name with overwrite=False (conditional
    put); completeness comes from the checksum footer, which readers
    verify.  Both refuse to clobber an existing COMPLETE version —
    a version collision is either an idempotent replay (identical
    bytes: success) or a concurrent writer (IOError; wrap the commit
    in :func:`commit_with_retry` to serialize optimistically).

    Post-commit observers (:func:`add_commit_observer`) fire after
    every successful return, idempotent replays included.
    """
    _publish_inner(spark, log_dir, version, payload, commit_mode)
    _notify_commit(log_dir, version)


def _publish_inner(
    spark: SparkSession,
    log_dir: str,
    version: int,
    payload: dict,
    commit_mode: str = "rename",
) -> None:
    if commit_mode not in COMMIT_MODES:
        raise ValueError(f"commit_mode must be one of {COMMIT_MODES}")
    fs, jdir, jvm = _jfs(spark, log_dir)
    fs.mkdirs(jdir)
    data = _encode(version, payload)
    final = jvm.org.apache.hadoop.fs.Path(jdir, f"{MANIFEST_PREFIX}{version:012d}")
    if commit_mode == "rename":
        # unique tmp per ATTEMPT: with a shared tmp name, two racing
        # writers could interleave (one overwrites the other's tmp
        # before its rename), committing one payload under the other
        # writer's version — per-attempt names make the rename the
        # only contended step, and rename-onto-existing fails cleanly
        import uuid

        tmp = jvm.org.apache.hadoop.fs.Path(
            jdir, f".{MANIFEST_PREFIX}{version:012d}.{uuid.uuid4().hex}.tmp"
        )
        out = fs.create(tmp, True)
        try:
            out.write(data)
        finally:
            out.close()
        # POSIX rename OVERWRITES an existing destination (HDFS's
        # returns false instead), so exists-check + rename + read-back
        # verify run under the process commit lock: same-process
        # racers serialize fully; a cross-process local racer is
        # caught by the verify (HDFS/S3 primitives are exclusive on
        # their own and don't need this).
        with _COMMIT_LOCK:
            if fs.exists(final):
                # same triage as put mode: a COMPLETE object is a
                # committed version (identical -> idempotent replay,
                # different -> collision); a TORN object (non-atomic
                # rename emulation, tampering) is debris to clear
                stream = fs.open(final)
                try:
                    existing = bytes(
                        jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                    )
                finally:
                    stream.close()
                if _decode(existing) is not None:
                    fs.delete(tmp, False)
                    if existing == data:
                        return  # idempotent replay
                    raise IOError(
                        f"manifest version {version} already exists under "
                        f"{jdir} — concurrent writer (use commit_with_retry)"
                    )
                fs.delete(final, False)
            if not fs.rename(tmp, final):
                raise IOError(
                    f"manifest rename failed for version {version} under "
                    f"{jdir} (concurrent writer? use commit_with_retry)"
                )
            stream = fs.open(final)
            try:
                readback = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            finally:
                stream.close()
            if readback != data:
                raise IOError(
                    f"manifest version {version} clobbered by a concurrent "
                    f"writer under {jdir} (non-exclusive local rename)"
                )
    else:
        # write-if-absent: fs.create(path, overwrite=False) raises if
        # the name exists — the conditional-put primitive.  A crash
        # mid-write leaves a torn object under the final name that
        # read_latest() skips via the checksum footer; a REPLAY of the
        # crashed publish then finds that torn object here.  The log
        # is single-writer, so an existing-but-torn object under this
        # version is our own crashed attempt — delete and retry.  An
        # existing COMPLETE object means the commit already happened:
        # byte-identical is an idempotent replay (success), different
        # bytes is a second writer (hard error).
        # the emulated conditional put (exists-check inside create)
        # is not atomic on a local FS — the process lock serializes
        # in-process racers; real object stores supply atomic
        # If-None-Match and never enter the torn-delete branch for a
        # live writer
        with _COMMIT_LOCK:
            try:
                out = fs.create(final, False)
            except Exception:
                # only the already-exists case is handled below; any
                # other create failure (permissions, transient store
                # error) must surface as itself, not as a confusing
                # secondary open() failure
                if not fs.exists(final):
                    raise
                stream = fs.open(final)
                try:
                    existing = bytes(
                        jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                    )
                finally:
                    stream.close()
                if _decode(existing) is not None:
                    if existing == data:
                        return  # idempotent replay of an already-done commit
                    raise IOError(
                        f"manifest version {version} already committed "
                        f"with different content under {jdir} — concurrent "
                        "writer (use commit_with_retry)"
                    )
                fs.delete(final, False)  # our own torn previous attempt
                out = fs.create(final, False)
            try:
                out.write(data)
            finally:
                out.close()


class AbortCommit(Exception):
    """Raised by a ``commit_with_retry`` update_fn to stop WITHOUT
    publishing — e.g. a replayed transaction that discovers its id
    already committed; the loop then returns the current committed
    state instead of burning a spurious duplicate manifest version."""


def _complete_manifests(
    spark: SparkSession, log_dir: str
) -> dict[int, dict]:
    """{version: payload} for every COMPLETE manifest — single
    read+decode pass (vacuum previously decoded retained manifests
    twice)."""
    out = {}
    for v in list_versions(spark, log_dir):
        doc = read_version(spark, log_dir, v)
        if doc is not None:
            out[v] = doc
    return out


def commit_with_retry(
    spark: SparkSession,
    log_dir: str,
    update_fn,
    commit_mode: str = "rename",
    max_retries: int = 8,
) -> tuple[int, dict]:
    """Optimistic-concurrency commit: read the latest manifest, let
    ``update_fn(version, payload_or_None) -> new_payload`` derive the
    next state, attempt to publish it at ``version + 1``; on a
    version COLLISION (another writer committed first) re-read and
    retry with the fresh state — the Delta/Iceberg commit loop at
    txlog size.  Returns (committed version, committed payload).

    This upgrades the plain :func:`publish` single-writer contract to
    safe concurrent appends for logs whose updates COMMUTE through
    ``update_fn`` (e.g. two IVF ingest jobs appending disjoint
    generations: each derives ``live + [its own gen]`` from whatever
    state it re-reads).  Writers whose updates conflict semantically
    still need external coordination — this loop serializes commits,
    it does not merge intents.

    Collision detection: in ``rename`` mode a rename onto an existing
    name fails; in ``put`` mode the conditional create fails and the
    existing object is COMPLETE with different content.  Put-mode
    caveat: :func:`publish` treats a TORN object under the target
    name as our own crashed attempt (delete + retry) — under the
    EMULATED conditional put a concurrent writer mid-write is
    indistinguishable from that crash, so concurrent put-mode commits
    need a store with a true atomic conditional put (S3
    If-None-Match), where an in-flight write is never observable as
    torn.  Rename mode has no such window (per-attempt tmp names;
    the rename is atomic).

    ``update_fn`` may raise :class:`AbortCommit` to stop WITHOUT
    publishing (e.g. a replay that discovers its transaction id
    already committed); the loop then returns the current committed
    state — no spurious duplicate manifest version.
    """
    claim = 0
    for _ in range(max_retries):
        version, doc = read_latest(spark, log_dir)
        # claim normally lands at latest+1; after a collision with a
        # COMPLETE occupant it bumps past it — the occupant may be a
        # committed version (re-read sees it; same number either way)
        # or an INVISIBLE pending/aborted commit_pair half, which
        # read_latest skips forever and would otherwise deadlock the
        # log on its version number
        claim = max(claim, version + 1)
        try:
            payload = update_fn(version, doc)
        except AbortCommit:
            return version, doc
        try:
            publish(
                spark, log_dir, claim, payload,
                commit_mode=commit_mode,
            )
            return claim, payload
        except IOError:
            claim += 1
            continue  # lost the race; re-read and retry
    raise IOError(
        f"commit_with_retry: lost {max_retries} consecutive races under "
        f"{log_dir} — pathological contention, coordinate writers"
    )


INTENT_PREFIX = "intent-"

#: positive cache: a committed intent marker is immutable, so one
#: successful verification per process is enough
_INTENT_OK: set[str] = set()


def intent_committed(spark: SparkSession, intent_path: str) -> bool:
    """Whether the MULTI-TABLE COMMIT MARKER for ``intent_path``
    exists and is complete.  The marker file ``<intent>.committed`` is
    the single commit point of a :func:`commit_pair`: manifests
    referencing the intent are invisible until it lands (and forever,
    if the coordinator crashed first)."""
    if intent_path in _INTENT_OK:
        return True
    fs, jp, jvm = _jfs(spark, f"{intent_path}.committed")
    if not fs.exists(jp):
        return False
    stream = fs.open(jp)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    if _decode(raw) is None:
        return False  # torn marker write: the pair never committed
    _INTENT_OK.add(intent_path)
    return True


def commit_multi(
    spark: SparkSession,
    parts: list,
    commit_mode: str = "rename",
    max_retries: int = 8,
    _fail_between=None,
    _fail_before_marker: bool = False,
) -> list:
    """ONE atomic commit spanning MULTIPLE txlogs (distinct tables) —
    the mirror-window / data+metrics(+index) primitive.  ``parts`` is
    ``[(log_dir, update_fn), ...]`` with :func:`commit_with_retry`
    semantics per log, over two or MORE distinct log dirs (N-ary:
    three-table commits — data + metrics + IVF index — are one
    commit point too; ``commit_pair`` remains as an alias from when
    the name undersold it).

    Protocol (single-commit-point intent marker):

    1. pick an intent name under the first log dir (nothing written);
    2. commit each log's manifest normally, each carrying
       ``{"intent": <name>}`` — these manifests are INVISIBLE to every
       reader until the marker exists (:func:`read_version` treats an
       unresolved intent like a torn write);
    3. re-verify no other writer committed ABOVE any half (overtaken
       pairs abort: completing them would let a successor manifest
       silently drop this pair's changes);
    4. write ``<intent>.committed`` (checksummed; a torn marker is an
       abort) — THE commit point: both halves become visible together.

    A crash anywhere before step 4 leaves every table at its
    pre-pair version, permanently (abort semantics): the pending
    manifests are version-number gaps that the next writers skip
    (collision bump in :func:`commit_with_retry`) and
    :func:`vacuum_manifests` eventually sweeps.  Concurrency caveat,
    same class as the commit-lock notes above: a writer landing above
    a half between step 3's check and step 4's marker write is a
    documented race window — run pairs under the same external
    coordination any cross-table scheduler already has.

    Returns ``[(log_dir, committed_version), ...]``.
    """
    import uuid as _uuid

    dirs = [d for d, _fn in parts]
    if len(parts) < 2 or len(set(dirs)) != len(dirs):
        raise ValueError(
            "commit_multi spans MULTIPLE DISTINCT log dirs (same-table "
            "multi-verb atomicity needs chained pending reads — compose "
            "the verbs into one update_fn instead)"
        )
    intent = f"{dirs[0].rstrip('/')}/{INTENT_PREFIX}{_uuid.uuid4().hex}"
    committed = []
    for i, (log_dir, fn) in enumerate(parts):
        def wrapped(version, doc, _fn=fn):
            payload = _fn(version, doc)
            return {**payload, "intent": intent}

        v, _payload = commit_with_retry(
            spark, log_dir, wrapped, commit_mode=commit_mode,
            max_retries=max_retries,
        )
        committed.append((log_dir, v))
        if _fail_between is not None and i == _fail_between:
            raise RuntimeError(
                f"injected crash after pair half {i} committed (pending)"
            )
    seal_multi(
        spark, intent, committed, _fail_before_marker=_fail_before_marker
    )
    return committed


def seal_multi(
    spark: SparkSession,
    intent: str,
    committed: list,
    _fail_before_marker: bool = False,
) -> None:
    """Steps 3+4 of the :func:`commit_multi` protocol for callers that
    committed their pending halves through other machinery (the
    pipeline's DML verbs): overtake re-check, then the atomic
    ``<intent>.committed`` marker — THE commit point."""
    for log_dir, v in committed:
        newest = max(list_versions(spark, log_dir), default=0)
        if newest > v:
            raise IOError(
                f"commit_multi overtaken under {log_dir} (version "
                f"{newest} > our pending {v}): commit aborted, every "
                "table remains at its pre-commit version — retry"
            )
    if _fail_before_marker:
        raise RuntimeError("injected crash before the intent marker")
    data = _encode(0, {"intent": intent, "logs": committed})
    fs, jp, jvm = _jfs(spark, f"{intent}.committed")
    out = fs.create(jp, False)
    try:
        out.write(data)
    finally:
        out.close()
    stream = fs.open(jp)
    try:
        readback = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    if readback != data:
        raise IOError(f"intent marker {intent} failed read-back verify")
    _INTENT_OK.add(intent)
    # the SEAL is when the halves become visible: the per-half publish
    # notifications fired while the manifests were still intent-hidden
    # (observers re-reading latest saw the old version), so fire again
    # now that readers can see them
    for log_dir, v in committed:
        _notify_commit(log_dir, v)


#: r7 names — the protocol was N-ary from day one, the names weren't
commit_pair = commit_multi
seal_pair = seal_multi


LEASE_PREFIX = "lease-"


def acquire_lease(
    spark: SparkSession,
    log_dir: str,
    version: int,
    ttl_seconds: float,
    owner: str = "",
) -> str:
    """Register a READ LEASE on manifest ``version``: until it
    expires (or is released), every vacuum treats that version as
    retained — its manifest AND the data files/directories it
    references survive ``keep_last``.  This closes the r5 gap where a
    long-running version-pinned read could lose files to a concurrent
    ``vacuum(keep_last=1)``: the reader declares itself in the log,
    the vacuum honors it — the same contract as Iceberg's
    snapshot-reference retention.

    The lease is a checksummed file ``lease-<id>`` beside the
    manifests (same torn-write defence: a torn lease is ignored,
    which fails SAFE for the vacuum only if readers re-acquire; hence
    acquire returns only after a read-back verify).  TTL bounds the
    damage of a crashed reader — no reader heartbeat required, just a
    ttl comfortably above the read's duration (refresh by acquiring
    a fresh lease for long jobs).  Returns the lease id.
    """
    import time as _time
    import uuid as _uuid

    if ttl_seconds <= 0:
        raise ValueError("ttl_seconds must be positive")
    if read_version(spark, log_dir, version) is None:
        raise ValueError(
            f"cannot lease version {version}: no complete manifest under "
            f"{log_dir} (already vacuumed, or never committed)"
        )
    lease_id = _uuid.uuid4().hex
    payload = {
        "lease": lease_id,
        "expires_ms": (_time.time() + ttl_seconds) * 1000.0,
        "owner": owner,
    }
    data = _encode(version, payload)
    fs, jdir, jvm = _jfs(spark, log_dir)
    p = jvm.org.apache.hadoop.fs.Path(jdir, f"{LEASE_PREFIX}{lease_id}")
    out = fs.create(p, False)
    try:
        out.write(data)
    finally:
        out.close()
    # read-back verify: the lease only protects once durably visible
    stream = fs.open(p)
    try:
        readback = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    if readback != data:
        raise IOError(f"lease {lease_id} failed read-back verify")
    # TOCTOU guard vs a concurrent vacuum: the version was validated
    # BEFORE the lease write, but a vacuum that snapshotted the lease
    # set in between may already have retired it.  Re-verify AFTER the
    # lease is durably visible — if the manifest is gone, the lease
    # never protected anything: clean up and fail so the reader
    # re-targets a retained version.  Combined with the vacuum's own
    # pre-delete re-check of the lease set this closes the practical
    # window; the residual race (lease write + both verifies landing
    # entirely between the vacuum's re-check and its first delete) is
    # bounded by ``grace_seconds`` — run vacuums with a grace window
    # above lease-acquisition latency where leased readers run
    # concurrently.
    if read_version(spark, log_dir, version) is None:
        release_lease(spark, log_dir, lease_id)
        raise ValueError(
            f"cannot lease version {version}: vacuumed concurrently "
            "with acquisition — retry on a retained version"
        )
    return lease_id


def release_lease(spark: SparkSession, log_dir: str, lease_id: str) -> bool:
    """Delete a lease (the reader finished).  True if it existed."""
    fs, jdir, jvm = _jfs(spark, log_dir)
    p = jvm.org.apache.hadoop.fs.Path(jdir, f"{LEASE_PREFIX}{lease_id}")
    return bool(fs.exists(p) and fs.delete(p, False))


TAG_PREFIX = "tag-"
_TAG_NAME = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,99}$")


def create_tag(
    spark: SparkSession,
    log_dir: str,
    name: str,
    version: int | None = None,
    replace: bool = False,
) -> int:
    """Pin a NAMED REFERENCE to manifest ``version`` (default: the
    latest) — the Iceberg tag / Delta named-snapshot idea on the
    txlog: until deleted, every vacuum treats the tagged version as
    retained, so its manifest AND the data it references survive
    ``keep_last`` indefinitely.  That is what makes "eval-baseline"
    or "prod-2026-08" reproducible months later on a table with daily
    retention.  A lease with no expiry, keyed by name: the tag file
    is checksummed (torn writes are ignored — and the read-back
    verify below means a torn tag never belonged to a completed
    create), creation is exclusive unless ``replace=True`` (retarget).
    Returns the pinned version."""
    if not _TAG_NAME.match(name):
        raise ValueError(
            f"invalid tag name {name!r} (letters/digits/._- only, "
            "must start alphanumeric, <=100 chars)"
        )
    if version is None:
        version, doc = read_latest(spark, log_dir)
        if doc is None:
            raise ValueError(f"{log_dir} has no committed version to tag")
    elif read_version(spark, log_dir, version) is None:
        raise ValueError(
            f"cannot tag version {version}: no complete manifest under "
            f"{log_dir} (already vacuumed, or never committed)"
        )
    data = _encode(version, {"tag": name})
    fs, jdir, jvm = _jfs(spark, log_dir)
    p = jvm.org.apache.hadoop.fs.Path(jdir, f"{TAG_PREFIX}{name}")
    if not replace and fs.exists(p):
        raise ValueError(
            f"tag {name!r} already exists (points at version "
            f"{resolve_tag(spark, log_dir, name)}); pass replace=True "
            "to retarget"
        )
    out = fs.create(p, replace)
    try:
        out.write(data)
    finally:
        out.close()
    stream = fs.open(p)
    try:
        readback = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    if readback != data:
        raise IOError(f"tag {name!r} failed read-back verify")
    return version


def delete_tag(spark: SparkSession, log_dir: str, name: str) -> bool:
    """Remove a named reference (its version re-enters normal
    retention at the next vacuum).  True if it existed."""
    fs, jdir, jvm = _jfs(spark, log_dir)
    p = jvm.org.apache.hadoop.fs.Path(jdir, f"{TAG_PREFIX}{name}")
    return bool(fs.exists(p) and fs.delete(p, False))


def list_tags(spark: SparkSession, log_dir: str) -> dict[str, int]:
    """{tag name: version} for every valid tag; torn files skipped."""
    fs, jdir, jvm = _jfs(spark, log_dir)
    if not fs.exists(jdir):
        return {}
    out: dict[str, int] = {}
    for st in fs.listStatus(jdir):
        fname = st.getPath().getName()
        if not fname.startswith(TAG_PREFIX):
            continue
        stream = fs.open(st.getPath())
        try:
            raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        doc = _decode(raw)
        if doc is None or "tag" not in doc:
            continue
        out[doc["tag"]] = int(doc["v"])
    return out


def resolve_tag(spark: SparkSession, log_dir: str, name: str) -> int | None:
    """The version a tag points at, or None if absent/torn."""
    return list_tags(spark, log_dir).get(name)


def leased_versions(
    spark: SparkSession, log_dir: str, now_ms: float | None = None
) -> set[int]:
    """Versions protected by an UNEXPIRED lease.  Expired lease files
    are swept opportunistically; torn lease files are ignored (the
    acquire read-back means a torn lease never belonged to a live
    reader)."""
    import time as _time

    if now_ms is None:
        now_ms = _time.time() * 1000.0
    fs, jdir, jvm = _jfs(spark, log_dir)
    if not fs.exists(jdir):
        return set()
    out: set[int] = set()
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if not name.startswith(LEASE_PREFIX):
            continue
        stream = fs.open(st.getPath())
        try:
            raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        doc = _decode(raw)
        if doc is None:
            continue  # torn: never a live reader's lease
        if doc.get("expires_ms", 0) <= now_ms:
            fs.delete(st.getPath(), False)  # expired: sweep
            continue
        out.add(int(doc["v"]))
    return out


def manifest_commit_times(
    log_dir: str, spark: SparkSession | None = None
) -> list[tuple[int, float]]:
    """``[(version, commit_epoch)]`` sorted by version — manifest
    file mtimes, monotonically adjusted in version order so clock
    skew or a log copy can never invert history.  THE single mtime
    rule: asOf resolution, timestamp change windows, keep_since
    retention, and the history surfaces all consume this one scan,
    so "keep everything a reader can still asOf" holds by
    construction.  Resolution is pyarrow (JVM-free, for the SQL
    source's planners); when pyarrow cannot resolve the scheme
    (s3a://, abfs://) and a ``spark`` session is given, the listing
    falls back to the session's Hadoop filesystem."""
    stamped: list[tuple[int, float]] = []
    try:
        from pyarrow import fs as pafs

        if "://" in log_dir or log_dir.startswith("file:"):
            fs, local = pafs.FileSystem.from_uri(log_dir)
        else:
            fs, local = pafs.LocalFileSystem(), log_dir
        try:
            infos = fs.get_file_info(
                pafs.FileSelector(local, recursive=False)
            )
        except FileNotFoundError:
            infos = []
        for i in infos:
            name = i.base_name
            if not name.startswith(MANIFEST_PREFIX):
                continue
            try:
                v = int(name[len(MANIFEST_PREFIX):])
            except ValueError:
                continue
            stamped.append(
                (v, i.mtime.timestamp() if i.mtime else 0.0)
            )
    except FileNotFoundError:
        pass
    except Exception:
        if spark is None:
            raise
        # Hadoop-only scheme: list through the session's JVM fs
        fs, jdir, _jvm = _jfs(spark, log_dir)
        if fs.exists(jdir):
            for st in fs.listStatus(jdir):
                name = st.getPath().getName()
                if not name.startswith(MANIFEST_PREFIX):
                    continue
                try:
                    v = int(name[len(MANIFEST_PREFIX):])
                except ValueError:
                    continue
                stamped.append(
                    (v, st.getModificationTime() / 1000.0)
                )
    stamped.sort()
    mono = 0.0
    out: list[tuple[int, float]] = []
    for v, ts in stamped:
        mono = max(mono, ts)
        out.append((v, mono))
    return out


def _versions_at_or_after(
    log_dir: str, ts_epoch: float,
    spark: SparkSession | None = None,
) -> set[int]:
    """Versions whose commit time (see :func:`manifest_commit_times`)
    is at or after ``ts_epoch`` — always a SUFFIX of the version
    sequence, so time-based retention keeps a contiguous window."""
    return {
        v
        for v, ts in manifest_commit_times(log_dir, spark)
        if ts >= ts_epoch
    }


def _retained_versions(
    spark: SparkSession, log_dir: str, keep_last: int,
    keep_since: float | None = None,
) -> set[int]:
    """keep_last newest complete versions UNION unexpired-leased
    versions UNION tagged versions UNION (``keep_since``) every
    version committed at or after that epoch timestamp — the single
    retention rule every vacuum applies (a named reference pins its
    snapshot for as long as the tag exists; ``keep_since`` is the
    Delta retention-hours shape: "keep everything newer than N
    hours", commit times from monotonically adjusted manifest
    mtimes)."""
    manifests = _complete_manifests(spark, log_dir)
    retained = set(sorted(manifests)[-keep_last:])
    retained |= leased_versions(spark, log_dir) & set(manifests)
    retained |= set(list_tags(spark, log_dir).values()) & set(manifests)
    if keep_since is not None:
        retained |= _versions_at_or_after(
            log_dir, float(keep_since), spark
        ) & set(manifests)
    return retained


def vacuum_versions(
    spark: SparkSession,
    root: str,
    log_dir: str,
    prefix: str,
    keep_last: int = 1,
    grace_seconds: float = 0.0,
    extra_log_dirs: tuple = (),
    keep_since: float | None = None,
    dry_run: bool = False,
) -> int | dict:
    """Shared retention sweep for version-directory layouts
    (``v=<n>``, ``gen=<n>``): delete every ``prefix``-named directory
    under ``root`` that no RETAINED manifest's ``live`` entry
    references (crashed orphans, superseded versions), plus the
    manifests of retired versions.  ``keep_last`` is the time-travel
    retention: the newest N complete versions stay readable via
    ``read_version``/version-pinned readers (default 1 — latest
    only, the pre-retention behavior).  Returns directories removed.

    ``grace_seconds``: with CONCURRENT writers, an unreferenced
    directory may be an IN-FLIGHT append that has not committed yet —
    deleting it would commit a manifest pointing at deleted data.
    Directories (and in-flight commit tmp files) modified within the
    grace window are spared, exactly the retention rule every
    log-structured table's vacuum uses; set it comfortably above the
    longest write (e.g. hours) wherever ``commit_with_retry`` writers
    run concurrently.  Default 0 keeps the single-writer behavior
    (everything unreferenced is a dead orphan).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    manifests = _complete_manifests(spark, log_dir)
    retained = sorted(
        _retained_versions(spark, log_dir, keep_last,
                           keep_since=keep_since)
    )
    keep: set[str] = set()
    for v in retained:
        live = manifests[v].get("live")
        if live:
            keep.update(live if isinstance(live, list) else [live])
        # a retained manifest's offloaded stats sidecar
        # (pipeline._offload_manifest) lives under a version directory
        # that may hold no live data — keep the directory anyway, and
        # note the ref may point into ANOTHER version's dir (a schema
        # evolution copies the pointer verbatim)
        ref = manifests[v].get("manifest_ref")
        if ref and ref.get("dir"):
            keep.add(str(ref["dir"]).split("/", 1)[0])
    # extra logs (corpus branches): EVERY complete manifest of an
    # alternate chain is retained — branches are short-lived working
    # state sharing main's data pool, and a branch reader may pin any
    # of its versions; a dropped branch's directories become ordinary
    # orphans on the next sweep
    for xlog in extra_log_dirs:
        for doc in _complete_manifests(spark, xlog).values():
            live = doc.get("live")
            if live:
                keep.update(live if isinstance(live, list) else [live])
            ref = doc.get("manifest_ref")
            if ref and ref.get("dir"):
                keep.add(str(ref["dir"]).split("/", 1)[0])
    import time as _time

    # TOCTOU guard: re-read the lease/tag set NOW, immediately before
    # deletion — a lease acquired while the pre-scan above ran (manifest
    # listing can be slow on object stores) must still be honored.  Its
    # manifest's live dirs join the keep set; the manifest itself is
    # spared because vacuum_manifests below recomputes retention fresh.
    late = (
        leased_versions(spark, log_dir)
        | set(list_tags(spark, log_dir).values())
    ) & set(manifests)
    for v in sorted(late - set(retained)):
        live = manifests[v].get("live")
        if live:
            keep.update(live if isinstance(live, list) else [live])
        ref = manifests[v].get("manifest_ref")
        if ref and ref.get("dir"):
            keep.add(str(ref["dir"]).split("/", 1)[0])

    cutoff_ms = (_time.time() - grace_seconds) * 1000.0
    fs, jroot, _jvm = _jfs(spark, root)
    removed = 0
    would: list[str] = []
    if fs.exists(jroot):
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name.startswith(prefix)
                and name not in keep
                and st.getModificationTime() <= cutoff_ms
            ):
                if dry_run:
                    would.append(name)
                    continue
                fs.delete(st.getPath(), True)
                removed += 1
    m = vacuum_manifests(
        spark, log_dir, keep_last=keep_last,
        grace_seconds=grace_seconds, keep_since=keep_since,
        dry_run=dry_run,
    )
    if dry_run:
        return {"directories": sorted(would), "manifests": m}
    return removed


def vacuum_manifests(
    spark: SparkSession,
    log_dir: str,
    keep_last: int = 1,
    grace_seconds: float = 0.0,
    keep_since: float | None = None,
    dry_run: bool = False,
) -> int | list:
    """Delete manifests of retired versions (all but the newest
    ``keep_last`` COMPLETE ones) plus torn manifests and orphaned
    commit tmp files — sparing anything modified within
    ``grace_seconds`` (an in-flight rename-mode commit's tmp, a
    concurrent put-mode write; see :func:`vacuum_versions`).
    Returns files removed (``dry_run=True``: the file NAMES that
    would be removed, nothing deleted)."""
    retained = _retained_versions(spark, log_dir, keep_last,
                                   keep_since=keep_since)
    if not retained:
        return [] if dry_run else 0
    import time as _time

    would: list[str] = []

    def _delete(fs, st, recursive=False) -> None:
        if dry_run:
            would.append(st.getPath().getName())
        else:
            fs.delete(st.getPath(), recursive)

    cutoff_ms = (_time.time() - grace_seconds) * 1000.0
    fs, jdir, jvm = _jfs(spark, log_dir)
    removed = 0
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if st.getModificationTime() > cutoff_ms:
            continue  # inside the grace window: possibly in flight
        if name.startswith(f".{MANIFEST_PREFIX}") and name.endswith(".tmp"):
            # orphaned tmp of a crashed rename-mode attempt
            _delete(fs, st)
            removed += 1
            continue
        if name.startswith(INTENT_PREFIX):
            # a COMMITTED pair marker may be referenced by manifests
            # in OTHER tables' logs (the marker lists them): it may be
            # deleted only once EVERY listed half is itself gone —
            # deleting a still-referenced marker would make that
            # table's manifest invisible.  The reference check is
            # deliberately circular (read_version consults the
            # marker): while a half survives, the marker survives.
            if name.endswith(".committed"):
                stream = fs.open(st.getPath())
                try:
                    raw = bytes(
                        jvm.org.apache.commons.io.IOUtils
                        .toByteArray(stream)
                    )
                finally:
                    stream.close()
                mdoc = _decode(raw)
                if mdoc is not None and any(
                    read_version(spark, ld, v) is not None
                    for ld, v in (mdoc.get("logs") or [])
                ):
                    continue  # a half still lives: keep the marker
            _delete(fs, st)
            removed += 1
            continue
        if not name.startswith(MANIFEST_PREFIX):
            continue
        try:
            v = int(name[len(MANIFEST_PREFIX):])
        except ValueError:
            continue
        if v not in retained:
            _delete(fs, st)
            removed += 1
    return sorted(would) if dry_run else removed
