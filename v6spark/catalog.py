"""Named pubcorpus tables — the catalog/DDL front door.

A SQL consumer should name a published table ONCE and then query it by
name (``spark.table("corpus")``, plain ``SELECT``/joins), instead of
re-typing ``format("pubcorpus").option("path", ...)`` per query.  The
obvious vehicle — ``CREATE TABLE corpus USING pubcorpus OPTIONS
(path ...)`` — does not survive Spark 4.1's Python DataSource catalog
integration:

- a PERSISTENT catalog table's scan constructs the Python DataSource
  with EMPTY options (the stored table properties, including the
  path, are dropped), so the reader cannot find the publish root;
- a TEMPORARY VIEW passes options intact, but the relation (reader
  object and its planned partitions) is baked at DDL time and never
  re-planned — a second query, and even ``REFRESH TABLE``, reuse the
  first plan, so an unpinned view silently freezes at the version
  current when it was created.

Both behaviors are pinned by a standalone repro
(``scripts/spark_catalog_table_options_repro.py``), mirroring how the
repo pins the threaded-write and pushFilters hazards.

So the catalog is built on what IS reliable:

- ``CREATE OR REPLACE TEMPORARY VIEW <name> USING pubcorpus OPTIONS
  (...)`` with an EXPLICITLY BAKED version — every view is a
  deterministic snapshot whose version is visible in its definition
  (the freeze becomes a feature: snapshot isolation by construction);
- a :func:`v6spark.txlog.add_commit_observer` hook — when a DML verb
  commits a new version to a registered table's log, the catalog
  re-issues the view DDL at the new latest, so same-process SQL
  consumers see committed changes immediately (Delta-like liveness;
  cross-process writers need :func:`refresh_pubcorpus_table`);
- a JSON catalog file so names survive sessions:
  :func:`attach_pubcorpus_catalog` replays the saved definitions into
  a fresh SparkSession (follow-latest tables re-resolve to the
  current latest at attach time).

Time travel stays one-liner SQL: ``create_pubcorpus_table(spark,
"corpus_v7", root, version=7)`` or raw DDL ``CREATE TEMPORARY VIEW
corpus_v7 USING pubcorpus OPTIONS (path '...', version '7')``.

Scale note: the catalog itself is manifest-sized metadata (one small
JSON read per create/refresh; the observer fires per COMMIT, not per
row), so nothing here grows with data volume.
"""
from __future__ import annotations

import json
import os
import threading
import weakref

from v6spark import txlog
from v6spark.sources.pubcorpus import (
    _log_dir,
    _read_latest,
    _resolve_tag,
    register_pubcorpus_source,
)

__all__ = [
    "create_pubcorpus_table",
    "refresh_pubcorpus_table",
    "drop_pubcorpus_table",
    "list_pubcorpus_tables",
    "save_pubcorpus_catalog",
    "attach_pubcorpus_catalog",
]

#: per-application registry: appId -> {view name (as given) -> def}
_REGISTRY: dict[str, dict[str, dict]] = {}
#: appId -> weakref to the SparkSession the views live in (temp views
#: are session-scoped, so the observer must use the owning session)
_SESSIONS: dict[str, "weakref.ref"] = {}
_LOCK = threading.RLock()
_OBSERVER_INSTALLED = False

#: reader options a table definition may carry besides the identity
#: ones (path/version/tag/branch are handled explicitly)
_PASSTHROUGH_OPTS = (
    "split", "where", "columns", "maxBytesPerPartition",
)


def _norm_dir(p: str) -> str:
    """Comparable form of a log dir: local paths absolute (with the
    ``file:``/``file://`` spellings STRIPPED first — a DML verb
    called with a file-scheme path must still match a table
    registered with the bare path, or the follow-latest view silently
    goes stale), others (scheme-qualified) taken verbatim; trailing
    slashes dropped."""
    p = p.rstrip("/")
    if p.startswith("file://"):
        p = p[len("file://"):]
    elif p.startswith("file:"):
        p = p[len("file:"):]
    if "://" not in p:
        p = os.path.abspath(p)
    return p


def _q_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _q_lit(value: str) -> str:
    return "'" + str(value).replace("'", "''") + "'"


def _app_id(spark) -> str:
    """Registry key for ONE SparkSession.  Temp views are
    session-scoped and ``spark.newSession()`` shares the
    applicationId, so the key combines it with the JVM session
    object's identity hash — otherwise two sessions would merge
    registries and the observer could issue a view DDL into the
    wrong session."""
    app = spark.sparkContext.applicationId
    try:
        return f"{app}:{spark._jsparkSession.hashCode()}"
    except Exception:  # connect-mode session: no JVM handle
        return f"{app}:{id(spark)}"


def _issue_view_ddl(spark, name: str, options: dict) -> None:
    register_pubcorpus_source(spark)
    opts_sql = ", ".join(
        f"{_q_ident(k)} {_q_lit(v)}" for k, v in sorted(options.items())
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {_q_ident(name)} "
        f"USING pubcorpus OPTIONS ({opts_sql})"
    )


def _build_options(tdef: dict) -> tuple[dict, int | None]:
    """The OPTIONS map for a table def, resolving follow-latest tables
    to the CURRENT latest version (baked explicitly so the snapshot is
    visible in the view definition).  Returns (options, version)."""
    opts = {"path": tdef["root"]}
    if tdef.get("branch") is not None:
        opts["branch"] = tdef["branch"]
    for k in _PASSTHROUGH_OPTS:
        if tdef.get(k) is not None:
            opts[k] = str(tdef[k])
    if tdef.get("keys") is not None:
        keys = tdef["keys"]
        opts["keys"] = keys if isinstance(keys, str) else json.dumps(keys)
    log = _log_dir(tdef["root"], tdef.get("branch"))
    if tdef.get("tag") is not None:
        # a tag is a stable name for a version — resolve for the
        # return value but keep the TAG in the definition (retagging
        # + refresh moves the view, which is the point of tags)
        opts["tag"] = tdef["tag"]
        return opts, _resolve_tag(_log_dir(tdef["root"], None), tdef["tag"])
    if tdef.get("version") is not None:
        opts["version"] = str(int(tdef["version"]))
        return opts, int(tdef["version"])
    v, doc = _read_latest(log)
    if doc is None:
        raise ValueError(
            f"{tdef['root']} has no committed publish"
            + (f" on branch {tdef['branch']}" if tdef.get("branch") else "")
        )
    opts["version"] = str(v)
    return opts, v


def _observer(log_dir: str, version: int) -> None:
    """txlog post-commit hook: refresh follow-latest views whose log
    just advanced.  Runs driver-side per COMMIT; never raises (txlog
    guards observers, and a dead session just unregisters)."""
    target = _norm_dir(log_dir)
    with _LOCK:
        items = [
            (app, name, dict(tdef))
            for app, tables in _REGISTRY.items()
            for name, tdef in tables.items()
            if not tdef["pinned"] and tdef["_norm_log"] == target
        ]
    for app, name, tdef in items:
        ref = _SESSIONS.get(app)
        spark = ref() if ref is not None else None
        if spark is None:
            # dead session: prune its registry instead of walking its
            # tables on every future commit forever
            with _LOCK:
                _REGISTRY.pop(app, None)
                _SESSIONS.pop(app, None)
            continue
        try:
            options, v = _build_options(tdef)
            _issue_view_ddl(spark, name, options)
            with _LOCK:
                if name in _REGISTRY.get(app, {}):
                    _REGISTRY[app][name]["_served_version"] = v
        except Exception:
            # session torn down mid-commit or log vacuumed; the view
            # keeps serving its previous snapshot — refresh explicitly
            pass


def _ensure_observer() -> None:
    global _OBSERVER_INSTALLED
    with _LOCK:
        if not _OBSERVER_INSTALLED:
            txlog.add_commit_observer(_observer)
            _OBSERVER_INSTALLED = True


def create_pubcorpus_table(
    spark,
    name: str,
    root: str,
    *,
    version: int | None = None,
    tag: str | None = None,
    as_of=None,
    branch: str | None = None,
    split: str | None = None,
    where: str | None = None,
    columns: str | None = None,
    keys=None,
    max_bytes_per_partition: int | None = None,
    catalog_path: str | None = None,
) -> int:
    """Register ``name`` as a session table over the publish at
    ``root``; returns the version the view serves.

    Without ``version=``/``tag=``/``as_of=`` the table FOLLOWS LATEST: it serves
    the newest committed version now, and any DML verb committed from
    this process re-points it automatically (txlog post-commit hook).
    With a pin it is a stable time-travel view (``as_of`` is
    TIMESTAMP AS OF: epoch seconds or ISO-8601, resolved to a
    concrete version at create time).  ``catalog_path``
    additionally records the definition in a JSON catalog file that
    :func:`attach_pubcorpus_catalog` replays into future sessions.
    """
    if sum(x is not None for x in (version, tag, as_of)) > 1:
        raise ValueError(
            "pass ONE time-travel reference: version=, tag=, or as_of="
        )
    if tag is not None and branch is not None:
        raise ValueError(
            "pass tag= or branch=, not both — tags name MAIN-log "
            "versions (pin the branch view with version= instead)"
        )
    if as_of is not None:
        # TIMESTAMP AS OF resolves to a concrete version NOW and pins
        # it (a timestamp is a stable reference by definition)
        from v6spark.sources.pubcorpus import _parse_as_of, _resolve_as_of

        version = _resolve_as_of(
            _log_dir(root, branch), _parse_as_of(as_of)
        )
    tdef = {
        "root": root,
        "version": None if version is None else int(version),
        "tag": tag,
        "branch": branch,
        "split": split,
        "where": where,
        "columns": columns,
        "keys": keys,
        "maxBytesPerPartition": max_bytes_per_partition,
        "pinned": version is not None or tag is not None,
        "_norm_log": _norm_dir(_log_dir(root, branch)),
    }
    options, v = _build_options(tdef)
    _issue_view_ddl(spark, name, options)
    tdef["_served_version"] = v
    app = _app_id(spark)
    with _LOCK:
        _REGISTRY.setdefault(app, {})[name] = tdef
        _SESSIONS[app] = weakref.ref(spark)
    _ensure_observer()
    if catalog_path is not None:
        save_pubcorpus_catalog(spark, catalog_path)
    return v


def refresh_pubcorpus_table(spark, name: str) -> int:
    """Re-issue the view DDL for ``name``: follow-latest tables move
    to the current latest version (the cross-process refresh path —
    same-process commits refresh automatically); pinned tables
    re-resolve their pin (a retagged tag moves).  Returns the version
    now served."""
    app = _app_id(spark)
    with _LOCK:
        tdef = _REGISTRY.get(app, {}).get(name)
    if tdef is None:
        raise ValueError(
            f"no pubcorpus table {name!r} in this session — "
            "create_pubcorpus_table or attach_pubcorpus_catalog first"
        )
    options, v = _build_options(tdef)
    _issue_view_ddl(spark, name, options)
    with _LOCK:
        _REGISTRY[app][name]["_served_version"] = v
    return v


def stale_pubcorpus_tables(spark) -> dict[str, dict]:
    """``{name: {"served": v, "latest": v'}}`` for FOLLOW-LATEST
    tables whose served snapshot is behind the commit log — the
    CROSS-PROCESS staleness probe.  Same-process commits auto-refresh
    views through the commit observer, but a commit made by another
    process touches only the log on disk, so this session's
    baked-version views keep serving their snapshot (by design: a
    view never moves mid-query).  Wire this before cross-process
    reads::

        for name in stale_pubcorpus_tables(spark):
            refresh_pubcorpus_table(spark, name)

    Cost: one ``read_latest`` per DISTINCT log dir (newest-manifest
    filename + one manifest read — KB-scale, no data touched), cached
    across tables sharing a log.  Pinned tables (version= / tag=) are
    never stale by definition and are skipped."""
    app = _app_id(spark)
    with _LOCK:
        items = {
            name: dict(t)
            for name, t in _REGISTRY.get(app, {}).items()
            if not t["pinned"]
        }
    out: dict[str, dict] = {}
    latest_by_log: dict[str, int] = {}
    for name, t in sorted(items.items()):
        log = _log_dir(t["root"], t.get("branch"))
        key = _norm_dir(log)
        if key not in latest_by_log:
            v, doc = _read_latest(log)
            if doc is None:
                continue  # log vacuumed/unreadable: nothing to report
            latest_by_log[key] = v
        served = t.get("_served_version")
        if served is None or latest_by_log[key] > served:
            out[name] = {"served": served, "latest": latest_by_log[key]}
    return out


def drop_pubcorpus_table(
    spark, name: str, *, catalog_path: str | None = None
) -> None:
    """Drop the session view and forget the definition (and remove it
    from ``catalog_path``'s file if given)."""
    app = _app_id(spark)
    with _LOCK:
        _REGISTRY.get(app, {}).pop(name, None)
    spark.catalog.dropTempView(name)
    if catalog_path is not None:
        save_pubcorpus_catalog(spark, catalog_path)


def list_pubcorpus_tables(spark) -> dict[str, dict]:
    """The session's registered tables: name -> {root, version served,
    pinned, branch, options}."""
    app = _app_id(spark)
    with _LOCK:
        return {
            name: {
                "root": t["root"],
                "version": t.get("_served_version"),
                "pinned": t["pinned"],
                "branch": t.get("branch"),
                "tag": t.get("tag"),
            }
            for name, t in _REGISTRY.get(app, {}).items()
        }


def _persistable(tdef: dict) -> dict:
    return {
        k: tdef.get(k)
        for k in (
            "root", "version", "tag", "branch", "split", "where",
            "columns", "keys", "maxBytesPerPartition", "pinned",
        )
    }


def save_pubcorpus_catalog(spark, catalog_path: str) -> None:
    """Write this session's table definitions as a JSON catalog file
    (atomic: tmp + rename).  Follow-latest tables are saved WITHOUT a
    version — attach re-resolves latest, matching their semantics."""
    app = _app_id(spark)
    with _LOCK:
        tables = {
            name: _persistable(t)
            for name, t in _REGISTRY.get(app, {}).items()
        }
    doc = {"format_version": 1, "tables": tables}
    tmp = f"{catalog_path}.{os.getpid()}.tmp"
    os.makedirs(os.path.dirname(os.path.abspath(catalog_path)),
                exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, catalog_path)


def attach_pubcorpus_catalog(spark, catalog_path: str) -> dict[str, int]:
    """Replay a saved catalog file into this session: every table is
    (re-)registered as a temp view; follow-latest tables resolve to
    the CURRENT latest.  Returns {name: version served}."""
    with open(catalog_path) as f:
        doc = json.load(f)
    if doc.get("format_version") != 1:
        raise ValueError(
            f"unsupported catalog format {doc.get('format_version')!r} "
            f"in {catalog_path}"
        )
    served = {}
    for name, t in sorted(doc.get("tables", {}).items()):
        served[name] = create_pubcorpus_table(
            spark, name, t["root"],
            version=t.get("version"), tag=t.get("tag"),
            branch=t.get("branch"), split=t.get("split"),
            where=t.get("where"), columns=t.get("columns"),
            keys=t.get("keys"),
            max_bytes_per_partition=t.get("maxBytesPerPartition"),
        )
    return served
