"""Minimal repro: Spark 4.1 Python DataSource vs catalog DDL.

Two behaviors this repo's catalog layer (v6spark/catalog.py) works
around, pinned here the same way scripts/
spark_threaded_datasource_repro.py pins the threaded-write bug:

1. PERSISTENT ``CREATE TABLE t USING <pythonds> OPTIONS (path ...)``
   succeeds at DDL time (the DataSource sees path/location/option.*
   keys), but the SCAN constructs a fresh DataSource instance with
   EMPTY options — the stored table properties are dropped, so a
   path-addressed source cannot locate its data.

2. ``CREATE TEMPORARY VIEW t USING <pythonds> OPTIONS (...)`` passes
   options intact, but the relation is fully baked at DDL time:
   ``reader()`` runs ONCE (first scan) and later queries — and even
   ``REFRESH TABLE t`` — reuse the cached plan, so the view freezes
   at DDL-time state.

3. A sibling ``spark.newSession()`` can neither REGISTER the Python
   source (its ``dataSource().registerPython`` raises
   DATA_SOURCE_ALREADY_EXISTS for a name the first session
   registered) nor RESOLVE it (``CREATE TEMPORARY VIEW ... USING``
   fails DATA_SOURCE_NOT_FOUND) — Python DataSources are effectively
   single-session per name on 4.1, which is why
   v6spark.catalog keys registries per session but only the owning
   session can serve the views.

Run: python scripts/spark_catalog_table_options_repro.py
Expected on Spark 4.1.2: all three FAIL lines print (bugs present).
"""
import json
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader

LOG = tempfile.mktemp(prefix="pyds_opts_")


def _log(tag, opts):
    with open(LOG, "a") as f:
        f.write(json.dumps({"tag": tag, "opts": dict(opts)}) + "\n")


class OptsProbe(DataSource):
    @classmethod
    def name(cls):
        return "optsprobe"

    def __init__(self, options):
        super().__init__(options)
        _log("init", options)

    def schema(self):
        _log("schema", self.options)
        return "k string, v string"

    def reader(self, schema):
        _log("reader", self.options)
        opts = dict(self.options)

        class R(DataSourceReader):
            def read(self, part):
                for k, v in sorted(opts.items()):
                    yield (str(k), str(v))

        return R()


def main():
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp())
        .getOrCreate()
    )
    spark.dataSource.register(OptsProbe)
    open(LOG, "w").close()

    # 1: persistent table drops options at scan
    spark.sql(
        "CREATE TABLE t_opts USING optsprobe "
        "OPTIONS (path '/some/root', version '7')"
    )
    rows = spark.table("t_opts").collect()
    scan_opts = {r.k: r.v for r in rows}
    if "path" not in scan_opts:
        print(
            "FAIL(1): persistent catalog scan got EMPTY options "
            f"(DDL-time schema() saw the path; scan rows = {rows})"
        )
    else:
        print(f"OK(1): scan options propagated: {scan_opts}")

    # 2: temp view relation baked at DDL; REFRESH TABLE is a no-op
    spark.sql(
        "CREATE TEMPORARY VIEW v_opts USING optsprobe "
        "OPTIONS (path '/r')"
    )
    spark.table("v_opts").collect()
    spark.sql("REFRESH TABLE v_opts")
    spark.table("v_opts").collect()
    n_readers = open(LOG).read().count('"tag": "reader"')
    # one reader() from the persistent-table scan + at most one from
    # the view; live semantics would need one per view query (3 total)
    if n_readers <= 2:
        print(
            "FAIL(2): temp view reader() ran once and was cached "
            f"across queries + REFRESH TABLE (reader calls: {n_readers})"
        )
    else:
        print(f"OK(2): reader() re-planned per query ({n_readers})")

    # 3: sibling sessions can neither register nor resolve the source
    sibling = spark.newSession()
    reg_err = resolve_err = None
    try:
        sibling.dataSource.register(OptsProbe)
    except Exception as exc:
        reg_err = str(exc)[:80]
    try:
        sibling.sql(
            "CREATE TEMPORARY VIEW sib_v USING optsprobe "
            "OPTIONS (path '/r')"
        )
        sibling.table("sib_v").collect()
    except Exception as exc:
        resolve_err = str(exc)[:80]
    if reg_err or resolve_err:
        print(
            "FAIL(3): newSession cannot use the Python source "
            f"(register: {reg_err!r}; resolve: {resolve_err!r})"
        )
    else:
        print("OK(3): sibling sessions share Python sources")
    spark.stop()


if __name__ == "__main__":
    main()
